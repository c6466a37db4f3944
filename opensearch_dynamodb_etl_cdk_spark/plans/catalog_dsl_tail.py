"""Round-4 DSL long-tail catalog: positional/full-text queries
(match_phrase_prefix, intervals, span_first, combined_fields), scoring
queries (pinned, rank_feature, distance_feature) and the remaining
aggregation families (auto_date_histogram, diversified_sampler,
string_stats, median_absolute_deviation, boxplot, matrix_stats,
scripted_metric, global, nested/reverse_nested) — each as a
(Spark, DuckDB-oracle) pair over the shared parquet tables.

Query entries go through the REAL interpreter (compile_query /
execute_search), so the driver's oracle compare exercises the engine
path a reference user hits, not a hand-written twin. Aggregation
entries whose interpreter output is a plain dict are re-surfaced as
one-row frames from the interpreter's own numbers (exact decimal sums
→ double, so values are partition-order independent and cross-engine
comparable).

Cross-engine gotchas honored (see catalog.py / catalog_ext.py):
identical aliases both sides, decimal-sum aggregates, transcendental
outputs rounded to 9 decimals on BOTH sides, unique-key tie-breaks on
every LIMIT.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import register, _t
from .catalog_ext import TOK


# ------------------------------------------------------------- queries


@register(
    "match_phrase_prefix_search",
    oracle=f"""
    WITH tk AS (SELECT doc_id, lang, {TOK} AS t FROM documents)
    SELECT doc_id, lang FROM tk
    WHERE len(list_filter(generate_series(1, len(t) - 1),
                          i -> t[i] = 'value' AND starts_with(t[i+1], 'fa'))) > 0
    """,
    doc="DSL `match_phrase_prefix` (search-as-you-type): adjacent phrase "
    "'value fa*' — all-but-last analyzed terms as an exact phrase, the "
    "last as a token prefix at the next position. Pure positional "
    "codegen (operators/search.py match_phrase_prefix branch): one "
    "analyzed pass bound to a lambda variable, no explode, no shuffle.",
    tags=("dsl", "fulltext"),
)
def match_phrase_prefix_search(spark, sf_dir):
    from ..operators.search import compile_query

    d = _t(spark, sf_dir, "documents")["documents"]
    q = {"match_phrase_prefix": {"text": "value fa"}}
    return d.filter(compile_query(q)).select("doc_id", "lang")


@register(
    "intervals_search",
    oracle=f"""
    WITH tk AS (SELECT doc_id, n_chars, {TOK} AS t FROM documents)
    SELECT doc_id, n_chars FROM tk
    WHERE len(list_filter(
            list_filter(generate_series(1, len(t)), i -> t[i] = 'spark'),
            i -> len(list_filter(
                   list_filter(generate_series(1, len(t)), j -> t[j] = 'merge'),
                   j -> j > i AND j - i - 1 <= 2)) > 0)) > 0
    """,
    doc="DSL `intervals` query: match rule {query: 'spark merge', "
    "ordered, max_gaps: 2} — ordered occurrence with a bounded token "
    "gap, compiled through the same two-level lambda-binding span "
    "quantifier as span_near (gaps = span width − n).",
    tags=("dsl", "fulltext"),
)
def intervals_search(spark, sf_dir):
    from ..operators.search import compile_query

    d = _t(spark, sf_dir, "documents")["documents"]
    q = {"intervals": {"text": {"match": {
        "query": "spark merge", "ordered": True, "max_gaps": 2}}}}
    return d.filter(compile_query(q)).select("doc_id", "n_chars")


@register(
    "span_first_search",
    oracle=f"""
    WITH tk AS (SELECT doc_id, lang, {TOK} AS t FROM documents)
    SELECT doc_id, lang FROM tk
    WHERE list_contains(list_slice(t, 1, 3), 'spark')
    """,
    doc="DSL `span_first`: the wrapped span ('spark') must end within "
    "the first 3 token positions — a position-array existential over "
    "one analyzed pass, no explode.",
    tags=("dsl", "fulltext"),
)
def span_first_search(spark, sf_dir):
    from ..operators.search import compile_query

    d = _t(spark, sf_dir, "documents")["documents"]
    q = {"span_first": {"match": {"span_term": {"text": "spark"}}, "end": 3}}
    return d.filter(compile_query(q)).select("doc_id", "lang")


@register(
    "combined_fields_search",
    oracle="""
    WITH tk AS (
      SELECT p_partkey, p_name, p_type,
             list_filter(string_split_regex(lower(p_name), '[^\\pL\\p{Nd}]+'), x -> x != '') AS tn,
             list_filter(string_split_regex(lower(p_type), '[^\\pL\\p{Nd}]+'), x -> x != '') AS tt
      FROM part)
    SELECT p_partkey, p_name, p_type FROM tk
    WHERE (list_contains(tn, 'red') OR list_contains(tt, 'red'))
      AND (list_contains(tn, 'economy') OR list_contains(tt, 'economy'))
    """,
    doc="DSL `combined_fields`: term-centric multi-field match — each "
    "analyzed query term must appear in ANY of the fields (operator: "
    "and), unlike multi_match's per-field OR. One predicate per term "
    "over per-field analyzed arrays, all codegen.",
    tags=("dsl", "fulltext"),
)
def combined_fields_search(spark, sf_dir):
    from ..operators.search import compile_query

    p = _t(spark, sf_dir, "part")["part"]
    q = {"combined_fields": {
        "query": "red economy", "fields": ["p_name", "p_type"],
        "operator": "and"}}
    return p.filter(compile_query(q)).select("p_partkey", "p_name", "p_type")


@register(
    "pinned_search",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {TOK} AS t FROM documents)
    SELECT doc_id,
           CASE CAST(doc_id AS VARCHAR) WHEN '11' THEN 2.0
                WHEN '7' THEN 1.0 ELSE 0.0 END AS _score
    FROM tk
    WHERE CAST(doc_id AS VARCHAR) IN ('11', '7') OR list_contains(t, 'spark')
    ORDER BY _score DESC, doc_id ASC LIMIT 10
    """,
    doc="DSL `pinned` query: promoted ids rank first in LIST order "
    "(synthetic descending score ladder via array_position against a "
    "literal array — no join), organic `match` hits follow; explicit "
    "(_score, doc_id) sort for a deterministic page.",
    tags=("dsl", "relevance"),
)
def pinned_search(spark, sf_dir):
    from ..operators.search import execute_search

    d = _t(spark, sf_dir, "documents")["documents"].withColumn(
        "_id", F.col("doc_id").cast("string")
    )
    res = execute_search(d, {
        "query": {"pinned": {"ids": ["11", "7"],
                             "organic": {"match": {"text": "spark"}}}},
        "sort": [{"_score": {"order": "desc"}}, {"doc_id": {"order": "asc"}}],
        "size": 10,
    })
    return res["hits"].select("doc_id", "_score")


@register(
    "rank_feature_ranked",
    oracle="""
    SELECT doc_id,
           CAST(n_chars AS DOUBLE) / (CAST(n_chars AS DOUBLE) + 500.0) AS _score
    FROM documents
    WHERE n_chars IS NOT NULL
    ORDER BY _score DESC, doc_id ASC LIMIT 10
    """,
    doc="DSL `rank_feature` query (saturation pivot=500 over n_chars): "
    "score = x/(x+pivot) as one codegen projection; filter face = the "
    "document has the feature. boost=1 multiplication is IEEE-exact so "
    "the oracle divides directly.",
    tags=("dsl", "relevance"),
)
def rank_feature_ranked(spark, sf_dir):
    from ..operators.search import execute_search

    d = _t(spark, sf_dir, "documents")["documents"]
    res = execute_search(d, {
        "query": {"rank_feature": {"field": "n_chars",
                                   "saturation": {"pivot": 500.0}}},
        "sort": [{"_score": {"order": "desc"}}, {"doc_id": {"order": "asc"}}],
        "size": 10,
    })
    return res["hits"].select("doc_id", "_score")


@register(
    "distance_feature_ranked",
    oracle="""
    SELECT event_id,
           604800000000.0 / (604800000000.0 +
             CAST(ABS(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-15 00:00:00'))
                  AS DOUBLE)) AS _score
    FROM events
    WHERE ts IS NOT NULL
    ORDER BY _score DESC, event_id ASC LIMIT 20
    """,
    doc="DSL `distance_feature` query over a timestamp field: score = "
    "pivot/(pivot + |Δt|) in epoch micros (pivot '7d'), decaying with "
    "distance from the origin — codegen arithmetic, top-k via "
    "TakeOrdered under the explicit (_score, event_id) sort.",
    tags=("dsl", "relevance"),
)
def distance_feature_ranked(spark, sf_dir):
    from ..operators.search import execute_search

    e = _t(spark, sf_dir, "events")["events"]
    res = execute_search(e, {
        "query": {"distance_feature": {
            "field": "ts", "origin": "2024-01-15 00:00:00", "pivot": "7d"}},
        "sort": [{"_score": {"order": "desc"}}, {"event_id": {"order": "asc"}}],
        "size": 20,
    })
    return res["hits"].select("event_id", "_score")


# ---------------------------------------------------------------- aggs


@register(
    "date_histogram_zero_fill_agg",
    oracle="""
    WITH agg AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS key,
             COUNT(*) AS doc_count,
             CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1),
    bounds AS (
      SELECT LEAST(TIMESTAMP '2022-07-01', MIN(key)) AS lo,
             GREATEST(TIMESTAMP '2025-06-30', MAX(key)) AS hi FROM agg),
    grid AS (
      SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS key
      FROM bounds)
    SELECT g.key, COALESCE(a.doc_count, 0) AS doc_count, a.sum_value
    FROM grid g LEFT JOIN agg a USING (key) ORDER BY g.key
    """,
    doc="DSL date_histogram with `min_doc_count: 0` + `extended_bounds` "
    "spanning three years at day interval (~1460 buckets, the events "
    "data covers ~30): the zero-fill grid is synthesized DISTRIBUTEDLY "
    "— a one-row bounds aggregate feeds sequence()/explode, left-joined "
    "back to the day aggregate (operators/search.py::"
    "_zero_fill_date_grid). No driver-side bucket loop; the 100k guard "
    "is request validation only.",
    tags=("agg", "dsl", "time"),
)
def date_histogram_zero_fill_agg(spark, sf_dir):
    from ..operators.search import execute_search

    e = _t(spark, sf_dir, "events")["events"]
    res = execute_search(e, {"aggs": {"by_day": {
        "date_histogram": {
            "field": "ts", "calendar_interval": "day",
            "min_doc_count": 0,
            "extended_bounds": {"min": "2022-07-01T00:00:00",
                                "max": "2025-06-30T00:00:00"},
        },
        "aggs": {"sum_value": {"sum": {"field": "value"}}},
    }}})
    buckets = res["aggregations"]["by_day"]["buckets"]
    return spark.createDataFrame(
        [(b["key"], b["doc_count"], b["sum_value"]["value"])
         for b in buckets],
        "key timestamp, doc_count bigint, sum_value double",
    )


@register(
    "auto_date_histogram_agg",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS key, COUNT(*) AS doc_count
    FROM events GROUP BY 1 ORDER BY key
    """,
    doc="DSL `auto_date_histogram` (target 40 buckets): the interval is "
    "picked from the public rounding ladder using ONLY the (min, max) "
    "timestamp aggregate — the 30-day events span rejects the 12h rung "
    "(60 buckets) and lands on calendar 'day' (30 ≤ 40) at every SF — "
    "then one ordinary date_trunc groupBy pass.",
    tags=("agg", "dsl"),
)
def auto_date_histogram_agg(spark, sf_dir):
    from ..operators.search import _auto_dh_interval

    e = _t(spark, sf_dir, "events")["events"]
    mm = e.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    choice = _auto_dh_interval(mm["lo"], mm["hi"], 40)
    # the fixture span always selects a calendar rung ≥ day; guard so a
    # data change that flips to a fixed rung fails loudly, not silently
    assert not choice[0].isdigit(), choice
    return (
        e.groupBy(F.date_trunc(choice, "ts").alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy("key")
    )


@register(
    "diversified_sampler_agg",
    oracle="""
    SELECT CAST(SUM(LEAST(3, n)) AS BIGINT) AS doc_count
    FROM (SELECT COUNT(*) AS n FROM documents GROUP BY lang)
    """,
    doc="DSL `diversified_sampler` (max_docs_per_value=3 on lang, "
    "unbounded shard_size): the de-biased sample keeps ≤3 docs per key "
    "via a per-key window rank (bounded state per key, no global "
    "window), so its size is Σ min(3, n_lang) — deterministic even "
    "though WHICH rows survive follows the stable row-hash order.",
    tags=("agg", "dsl"),
)
def diversified_sampler_agg(spark, sf_dir):
    from ..operators.search import execute_search

    d = _t(spark, sf_dir, "documents")["documents"]
    res = execute_search(d, {"aggs": {"sample": {"diversified_sampler": {
        "shard_size": 1 << 40, "field": "lang", "max_docs_per_value": 3}}}})
    n = res["aggregations"]["sample"]["doc_count"]
    return spark.createDataFrame([(n,)], "doc_count bigint")


@register(
    "string_stats_agg",
    oracle="""
    WITH ch AS (
      SELECT c, COUNT(*) AS n
      FROM (SELECT unnest(string_split(source, '')) AS c FROM documents)
      WHERE c != '' GROUP BY c),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM ch)
    SELECT (SELECT COUNT(source) FROM documents) AS count,
           (SELECT MIN(length(source)) FROM documents) AS min_length,
           (SELECT MAX(length(source)) FROM documents) AS max_length,
           (SELECT CAST(SUM(CAST(length(source) AS DECIMAL(28,6))) AS DOUBLE)
                   / COUNT(source) FROM documents) AS avg_length,
           ROUND(-SUM((n / t) * log2(n / t)), 9) AS entropy
    FROM ch, tot
    """,
    doc="DSL `string_stats` over documents.source: count/min/max/avg "
    "length in one pass (exact decimal length sum) + base-2 Shannon "
    "entropy from per-character counts — explode+groupBy whose key "
    "space is the character alphabet (bounded, map-side combined); the "
    "transcendental entropy is rounded to 9 decimals on both sides.",
    tags=("agg", "dsl"),
)
def string_stats_agg(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    col = F.col("source")
    base = d.agg(
        F.count(col).alias("count"),
        F.min(F.length(col)).alias("min_length"),
        F.max(F.length(col)).alias("max_length"),
        (
            F.sum(F.length(col).cast("decimal(28,6)")).cast("double")
            / F.count(col)
        ).alias("avg_length"),
    )
    chars = (
        d.select(F.explode(F.split(col, "")).alias("c"))
        .filter(F.col("c") != "")
        .groupBy("c").agg(F.count("*").alias("n"))
    )
    tot = chars.agg(F.sum("n").cast("double").alias("t"))
    ent = (
        chars.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                -F.sum((F.col("n") / F.col("t")) * F.log2(F.col("n") / F.col("t"))),
                9,
            ).alias("entropy")
        )
    )
    return base.crossJoin(F.broadcast(ent))


@register(
    "median_absolute_deviation_agg",
    oracle="""
    WITH m AS (SELECT quantile_cont(l_extendedprice, 0.5) AS med FROM lineitem)
    SELECT ROUND(quantile_cont(ABS(l_extendedprice - med), 0.5), 6) AS mad
    FROM lineitem, m
    """,
    doc="DSL `median_absolute_deviation` (exact variant; the public agg "
    "is TDigest-approximate): median of |x − median(x)| — two exact "
    "percentile passes, the scalar median broadcast into the second "
    "projection; interpolated midpoints rounded to 6 decimals on both "
    "sides.",
    tags=("agg", "dsl"),
)
def median_absolute_deviation_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    med = li.agg(
        F.percentile(F.col("l_extendedprice"), F.lit(0.5)).alias("med")
    )
    return (
        li.crossJoin(F.broadcast(med))
        .agg(
            F.round(
                F.percentile(
                    F.abs(F.col("l_extendedprice") - F.col("med")), F.lit(0.5)
                ),
                6,
            ).alias("mad")
        )
    )


@register(
    "boxplot_agg",
    oracle="""
    SELECT MIN(value) AS min, MAX(value) AS max,
           ROUND(quantile_cont(value, 0.25), 6) AS q1,
           ROUND(quantile_cont(value, 0.5), 6) AS q2,
           ROUND(quantile_cont(value, 0.75), 6) AS q3
    FROM events
    """,
    doc="DSL `boxplot`: exact five-number summary in ONE aggregate pass "
    "(the public agg is TDigest-approximate; exact percentiles are "
    "deterministic and cross-engine comparable, rounded to 6 decimals "
    "for the interpolated quartiles).",
    tags=("agg", "dsl"),
)
def boxplot_agg(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    v = F.col("value")
    return e.agg(
        F.min(v).alias("min"),
        F.max(v).alias("max"),
        F.round(F.percentile(v, F.lit(0.25)), 6).alias("q1"),
        F.round(F.percentile(v, F.lit(0.5)), 6).alias("q2"),
        F.round(F.percentile(v, F.lit(0.75)), 6).alias("q3"),
    )


@register(
    "matrix_stats_agg",
    oracle="""
    WITH s AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sq,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sqq,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sp,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS spp,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sx
      FROM lineitem)
    SELECT n,
           sq / n AS mean_qty,
           sp / n AS mean_price,
           (sqq - sq * sq / n) / n AS var_qty,
           (spp - sp * sp / n) / n AS var_price,
           (sx - sq * sp / n) / n AS cov,
           ((sx - sq * sp / n) / n)
             / sqrt(((sqq - sq * sq / n) / n) * ((spp - sp * sp / n) / n)) AS corr
    FROM s
    """,
    doc="DSL `matrix_stats` over (l_quantity, l_extendedprice): "
    "count/means/variances + covariance/correlation from exact decimal "
    "Σx/Σx²/Σxy accumulated in ONE aggregation pass — population "
    "formulas applied to the same doubles in the same order on both "
    "sides, so no rounding is needed (IEEE-deterministic).",
    tags=("agg", "dsl"),
)
def matrix_stats_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    q, p = F.col("l_quantity"), F.col("l_extendedprice")

    def dsum38(c):
        return F.sum(c.cast("decimal(38,6)")).cast("double")

    s = li.agg(
        F.count("*").alias("n"),
        dsum38(q).alias("sq"),
        dsum38(q * q).alias("sqq"),
        dsum38(p).alias("sp"),
        dsum38(p * p).alias("spp"),
        dsum38(q * p).alias("sx"),
    )
    n, sq, sqq, sp, spp, sx = (F.col(c) for c in ("n", "sq", "sqq", "sp", "spp", "sx"))
    var_q = (sqq - sq * sq / n) / n
    var_p = (spp - sp * sp / n) / n
    cov = (sx - sq * sp / n) / n
    return s.select(
        n.alias("n"),
        (sq / n).alias("mean_qty"),
        (sp / n).alias("mean_price"),
        var_q.alias("var_qty"),
        var_p.alias("var_price"),
        cov.alias("cov"),
        (cov / F.sqrt(var_q * var_p)).alias("corr"),
    )


@register(
    "scripted_metric_agg",
    oracle="""
    SELECT CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
           / COUNT(*) AS value
    FROM lineitem
    """,
    doc="DSL `scripted_metric` (restricted dialect): map_script "
    "'l_quantity * l_extendedprice' compiles to a guarded Spark SQL "
    "column (codegen, never Python-per-row), combine = exact decimal "
    "sum + count, reduce_script 'params.states_sum / "
    "params.states_count' evaluated by the safe-AST walker.",
    tags=("agg", "dsl"),
)
def scripted_metric_agg(spark, sf_dir):
    from ..operators.search import execute_search

    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    res = execute_search(li, {"aggs": {"sm": {"scripted_metric": {
        "map_script": "l_quantity * l_extendedprice",
        "reduce_script": "params.states_sum / params.states_count"}}}})
    v = res["aggregations"]["sm"]["value"]
    return spark.createDataFrame([(float(v),)], "value double")


@register(
    "global_agg_escape",
    oracle="""
    SELECT (SELECT COUNT(*) FROM documents WHERE lang = 'en') AS matched,
           (SELECT COUNT(*) FROM documents) AS global_count,
           (SELECT MAX(n_chars) FROM documents) AS max_chars
    """,
    doc="DSL `global` aggregation: escapes the query context — the "
    "sub-agg max runs over the FULL index frame while the hits honor "
    "the `term` query (one extra count over the background frame, no "
    "re-scan per sub-agg).",
    tags=("agg", "dsl"),
)
def global_agg_escape(spark, sf_dir):
    from ..operators.search import execute_search

    d = _t(spark, sf_dir, "documents")["documents"]
    res = execute_search(d, {
        "query": {"term": {"lang": "en"}},
        "aggs": {"all_docs": {"global": {}, "aggs": {
            "mx": {"max": {"field": "n_chars"}}}}},
    })
    matched = res["hits"].count()
    g = res["aggregations"]["all_docs"]
    return spark.createDataFrame(
        [(matched, g["doc_count"], g["mx"]["value"])],
        "matched bigint, global_count bigint, max_chars bigint",
    )


@register(
    "nested_reverse_nested_agg",
    oracle="""
    SELECT (SELECT COUNT(*) FROM lineitem WHERE l_orderkey <= 2000) AS elements,
           (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
            FROM lineitem WHERE l_orderkey <= 2000) AS sum_qty,
           (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem
            WHERE l_orderkey <= 2000) AS parents,
           (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
            FROM orders WHERE o_orderkey <= 2000
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey)) AS parent_price
    """,
    doc="DSL `nested` + `reverse_nested` aggregations over an "
    "array<struct> items column (orders with their lineitems collected "
    "per order): nested descends with ONE explode (generator, no "
    "shuffle), element sums via exact decimal aggregates; "
    "reverse_nested climbs back to DISTINCT parent documents via the "
    "synthetic parent id and aggregates parent fields.",
    tags=("agg", "dsl"),
)
def nested_reverse_nested_agg(spark, sf_dir):
    from ..operators.search import execute_search

    t = _t(spark, sf_dir, "lineitem", "orders")
    li = t["lineitem"].filter(F.col("l_orderkey") <= 2000)
    o = t["orders"].filter(F.col("o_orderkey") <= 2000)
    items = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(F.col("l_quantity").alias("qty"))
        ).alias("items")
    )
    parent = o.join(
        items, o["o_orderkey"] == items["l_orderkey"], "left"
    ).select("o_orderkey", "o_totalprice", "items")
    res = execute_search(parent, {"aggs": {"per_item": {
        "nested": {"path": "items"},
        "aggs": {
            "sum_qty": {"sum": {"field": "items.qty"}},
            "back": {"reverse_nested": {},
                     "aggs": {"parent_price": {"sum": {"field": "o_totalprice"}}}},
        },
    }}})
    a = res["aggregations"]["per_item"]
    return spark.createDataFrame(
        [(a["doc_count"], float(a["sum_qty"]["value"]),
          a["back"]["doc_count"], float(a["back"]["parent_price"]["value"]))],
        "elements bigint, sum_qty double, parents bigint, parent_price double",
    )


@register(
    "top_metrics_agg",
    oracle="""
    SELECT MAX(event_id) AS sort_event_id,
           arg_max(value, event_id) AS value,
           arg_max(event_type, event_id) AS event_type
    FROM events
    """,
    doc="DSL `top_metrics` (size=1): metric values of the top-sorted "
    "document via max_by/min_by — ONE aggregate pass, no sort, no row "
    "fetch (the public agg's common size=1 case is exactly the argmax "
    "aggregate). Sorted by the unique event_id so the pick is "
    "deterministic in both engines.",
    tags=("agg", "dsl"),
)
def top_metrics_agg(spark, sf_dir):
    from ..operators.search import execute_search

    e = _t(spark, sf_dir, "events")["events"]
    res = execute_search(e, {"aggs": {"latest": {"top_metrics": {
        "metrics": [{"field": "value"}, {"field": "event_type"}],
        "sort": [{"event_id": {"order": "desc"}}],
    }}}})
    top = res["aggregations"]["latest"]["top"][0]
    return spark.createDataFrame(
        [(top["sort"][0], float(top["metrics"]["value"]),
          top["metrics"]["event_type"])],
        "sort_event_id bigint, value double, event_type string",
    )


@register(
    "geo_bounds_centroid_agg",
    oracle="""
    WITH pts AS (
      SELECT ((c_custkey * 7919) % 18000) / 100.0 - 90.0 AS lat,
             ((c_custkey * 104729) % 36000) / 100.0 - 180.0 AS lon
      FROM customer)
    SELECT MAX(lat) AS top, MIN(lat) AS bottom,
           MIN(lon) AS "left", MAX(lon) AS "right",
           CAST(SUM(CAST(lat AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*) AS c_lat,
           CAST(SUM(CAST(lon AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*) AS c_lon,
           COUNT(*) AS n
    FROM pts
    """,
    doc="DSL `geo_bounds` + `geo_centroid` over the synthesized customer "
    "geo_points: bounding box = four min/max aggregates, centroid = "
    "exact decimal coordinate sums → deterministic double means — both "
    "in one pass each through the interpreter's agg branches.",
    tags=("agg", "dsl", "geo"),
)
def geo_bounds_centroid_agg(spark, sf_dir):
    from ..operators.search import execute_search
    from .catalog_ext import _geo_points

    pts = _geo_points(spark, sf_dir)
    res = execute_search(pts, {"aggs": {
        "box": {"geo_bounds": {"field": "location"}},
        "mid": {"geo_centroid": {"field": "location"}},
    }})
    box = res["aggregations"]["box"]["bounds"]
    mid = res["aggregations"]["mid"]
    return spark.createDataFrame(
        [(box["top_left"]["lat"], box["bottom_right"]["lat"],
          box["top_left"]["lon"], box["bottom_right"]["lon"],
          mid["location"]["lat"], mid["location"]["lon"], mid["count"])],
        "top double, bottom double, left double, right double, "
        "c_lat double, c_lon double, n bigint",
    )


@register(
    "cumulative_cardinality_agg",
    oracle="""
    WITH fs AS (
      SELECT user_id, MIN(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS key
      FROM events GROUP BY user_id),
    pb AS (SELECT key, COUNT(*) AS nf FROM fs GROUP BY key),
    days AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS key,
             COUNT(*) AS doc_count
      FROM events GROUP BY 1)
    SELECT d.key, d.doc_count,
           CAST(SUM(COALESCE(p.nf, 0)) OVER (ORDER BY d.key) AS BIGINT)
             AS cum_users
    FROM days d LEFT JOIN pb p ON d.key = p.key ORDER BY d.key
    """,
    doc="DSL `cumulative_cardinality` pipeline agg under date_histogram "
    "— EXACT distinct-users-so-far per day via the first-seen rewrite: "
    "cum_card(b) = Σ first-seen counts up to b. One keyed aggregate "
    "(min day per user) + a per-day count; never a distinct over a "
    "growing prefix (quadratic) and never an HLL merge (approximate — "
    "the public agg's path).",
    tags=("agg", "dsl", "pipeline"),
)
def cumulative_cardinality_agg(spark, sf_dir):
    from ..operators.search import execute_search

    e = _t(spark, sf_dir, "events")["events"]
    res = execute_search(e, {"aggs": {"by_day": {
        "date_histogram": {"field": "ts", "calendar_interval": "day"},
        "aggs": {"cum_users": {
            "cumulative_cardinality": {"field": "user_id"}}},
    }}})
    buckets = res["aggregations"]["by_day"]["buckets"]
    return spark.createDataFrame(
        [(b["key"], b["doc_count"], b["cum_users"]["value"])
         for b in buckets],
        "key timestamp, doc_count bigint, cum_users bigint",
    )


@register(
    "terms_order_by_metric_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS doc_count,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total
    FROM events GROUP BY event_type
    ORDER BY total DESC, event_type ASC LIMIT 3
    """,
    doc="DSL `terms` agg ordered by a metric sub-aggregation (`order`: "
    "{total: desc}) — the real-world 'top categories by revenue' shape. "
    "Still ONE groupBy + TakeOrderedAndProject; ordering by the metric "
    "only changes the top-k sort key, never adds a pass (interpreter "
    "branch, exercised end-to-end).",
    tags=("agg", "dsl"),
)
def terms_order_by_metric_agg(spark, sf_dir):
    from ..operators.search import execute_search

    e = _t(spark, sf_dir, "events")["events"]
    res = execute_search(e, {"aggs": {"by_type": {
        "terms": {"field": "event_type", "size": 3,
                  "order": {"total": "desc"}},
        "aggs": {"total": {"sum": {"field": "value"}}},
    }}})
    buckets = res["aggregations"]["by_type"]["buckets"]
    return spark.createDataFrame(
        [(b["key"], b["doc_count"], b["total"]["value"]) for b in buckets],
        "event_type string, doc_count bigint, total double",
    )


@register(
    "hybrid_rrf_search",
    oracle="""
    WITH s1 AS (
      SELECT event_id,
             604800000000.0 / (604800000000.0 +
               CAST(ABS(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-15 00:00:00'))
                    AS DOUBLE)) AS _score
      FROM events WHERE ts IS NOT NULL),
    r1 AS (
      SELECT event_id,
             ROW_NUMBER() OVER (ORDER BY _score DESC, event_id ASC) AS rk
      FROM s1 QUALIFY rk <= 100),
    s2 AS (
      SELECT event_id, value / (value + 50.0) AS _score
      FROM events WHERE value IS NOT NULL),
    r2 AS (
      SELECT event_id,
             ROW_NUMBER() OVER (ORDER BY _score DESC, event_id ASC) AS rk
      FROM s2 QUALIFY rk <= 100),
    fused AS (
      SELECT event_id, 1.0 / (60.0 + rk) AS c FROM r1
      UNION ALL
      SELECT event_id, 1.0 / (60.0 + rk) AS c FROM r2)
    SELECT event_id, ROUND(SUM(c), 9) AS _score,
           COUNT(*) AS matched_subqueries
    FROM fused GROUP BY event_id
    ORDER BY _score DESC, event_id ASC LIMIT 10
    """,
    doc="Hybrid search via reciprocal-rank fusion (operators/relevance."
    "py::rrf_fuse — the public hybrid query's RRF processor): a recency "
    "ranking (distance_feature decay) fused with a magnitude ranking "
    "(rank_feature saturation), 1/(60+rank) contributions over "
    "rank_window_size=100. Rank windows are TakeOrdered-bounded BEFORE "
    "the single-task rank window, so state is ≤ window rows by "
    "construction; the fusion is one tiny keyed groupBy.",
    tags=("dsl", "relevance"),
)
def hybrid_rrf_search(spark, sf_dir):
    from ..operators.relevance import rrf_fuse
    from ..operators.search import execute_search

    e = _t(spark, sf_dir, "events")["events"]
    recency = execute_search(e, {"query": {"distance_feature": {
        "field": "ts", "origin": "2024-01-15 00:00:00", "pivot": "7d"}}},
    )["hits"]
    magnitude = execute_search(e, {"query": {"rank_feature": {
        "field": "value", "saturation": {"pivot": 50.0}}}},
    )["hits"]
    return rrf_fuse(
        [recency, magnitude], ["event_id"], k=60, window=100, size=10
    )


@register(
    "completion_suggester",
    oracle="""
    SELECT source AS text, COUNT(*) AS freq FROM documents
    WHERE starts_with(source, 'src1')
    GROUP BY source ORDER BY freq DESC, source ASC LIMIT 5
    """,
    doc="`completion` suggester (search-as-you-type over whole field "
    "values): top-k values carrying the typed prefix ranked by corpus "
    "frequency (the FST-weight analog) — a pushable startswith filter "
    "+ one groupBy + TakeOrdered, through execute_suggest.",
    tags=("dsl", "suggest"),
)
def completion_suggester(spark, sf_dir):
    from ..operators.search import execute_search

    d = _t(spark, sf_dir, "documents")["documents"]
    res = execute_search(d, {"suggest": {"c": {
        "prefix": "src1", "completion": {"field": "source", "size": 5}}}})
    opts = res["suggest"]["c"][0]["options"]
    return spark.createDataFrame(
        [(o["text"], o["freq"]) for o in opts], "text string, freq bigint"
    )


# --- product quantization (ADC) ANN tier --------------------------------

_PQ_CACHE: dict = {}


def _pq_artifacts(spark, sf_dir):
    """Train-once-per-(session, sf) codebooks + encoded codes — the PQ
    index is a narrow (id, m codes, recon_norm) frame, built off the
    query path exactly like the LSH/IVF index tables. The catalog rows
    run a SMALL parameterization (m=4, k=8, 1 Lloyd round) for the
    same reason the ivfpq row does: at the 500-row sweep fixture the
    build cost is Catalyst analysis of the m×k literal-codebook
    expressions — constant per query and amortized at scale, but a
    third of a minute of sweep wall time at the production m=16.
    Recall/exactness at real parameters is the property tests' job
    (test_pq_adc_equals_reconstruction_cosine,
    test_pq_rerank_recall_on_embeddings)."""
    from ..operators import similarity as S

    key = sf_dir
    if key not in _PQ_CACHE:
        e = _t(spark, sf_dir, "embeddings")["embeddings"]
        books = S.train_pq(e, m=4, k=8, iters=1)
        codes = S.pq_encode(e, books).persist()
        codes.count()
        _PQ_CACHE[key] = (books, codes)
    return _PQ_CACHE[key]


@register(
    "ann_pq_topk",
    property_test="tests/test_dedup_similarity.py::test_pq_adc_equals_reconstruction_cosine",
    oracle=None,  # approximate by design — rows-only; ADC-vs-reconstruction
    # exactness and rerank recall are pytest properties
    doc="Product-quantization ANN top-10 (Jégou et al. 2011; m=16 "
    "subspaces × 16 codewords = 16 bytes/vector, 16× compression): "
    "asymmetric distance — a per-query m×k inner-product lookup table, "
    "score = Σ LUT[j][code_j] / (‖q‖·recon_norm), the EXACT cosine to "
    "each vector's reconstruction — evaluated as m array lookups per "
    "row over the narrow code frame; the raw vectors are never "
    "touched. operators/similarity.py::train_pq/pq_encode/query_pq_topk.",
    tags=("similarity", "topk", "pq"),
)
def ann_pq_topk(spark, sf_dir):
    from ..operators import similarity as S

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    books, codes = _pq_artifacts(spark, sf_dir)
    qvec = [float(x) for x in
            e.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    return S.query_pq_topk(codes, books, qvec, k=10)


@register(
    "ann_pq_rerank_topk",
    property_test="tests/test_dedup_similarity.py::test_pq_rerank_recall_on_embeddings",
    oracle=None,  # approximate by design — rows-only; recall ≥ 0.8 pytest
    doc="Two-stage PQ search: ADC shortlists 50 candidates from the "
    "compressed codes, exact cosine re-ranks only those (broadcast "
    "semi-join — the corpus is touched for 50 rows, not scanned). "
    "Recall 10/10 vs brute force on the fixture at these parameters "
    "(tests/test_dedup_similarity.py::test_pq_rerank_recall_on_embeddings).",
    tags=("similarity", "topk", "pq"),
)
def ann_pq_rerank_topk(spark, sf_dir):
    from ..operators import similarity as S

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    books, codes = _pq_artifacts(spark, sf_dir)
    qvec = [float(x) for x in
            e.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    return S.pq_rerank_topk(e, codes, books, qvec, k=10, pool=50)


_IVFPQ_CACHE: dict = {}


@register(
    "ann_ivfpq_rerank_topk",
    property_test="tests/test_dedup_similarity.py::test_ivfpq_rerank_recall_on_clusters",
    oracle=None,  # approximate by design — rows-only; exactness at full
    # probe/pool and clustered recall are pytest properties
    doc="IVF-PQ ANN (FAISS IVFPQ layout): coarse IVF cells + "
    "product-quantized RESIDUALS (residuals concentrate near zero, so "
    "the codebook budget quantizes them far better than raw vectors); "
    "query = driver-side cell probe (pushable IN on the cluster "
    "column) + ADC over cellIP/LUT lookups + exact re-rank of a "
    "50-candidate pool. Degenerates bit-exactly to brute force at full "
    "probe/full pool (tests/test_dedup_similarity.py::"
    "test_ivfpq_full_probe_full_pool_is_exact). The catalog row runs "
    "a SMALL parameterization (8 cells, m=4, k=8, 1 Lloyd round): the "
    "build cost at the 500-row sweep fixture is Catalyst analysis of "
    "the literal-codebook expressions — constant per query, amortized "
    "at scale, but 14%% of sweep wall time at the production m=16 — "
    "and quality at real parameters is the property tests' job.",
    tags=("similarity", "topk", "pq", "ivf"),
)
def ann_ivfpq_rerank_topk(spark, sf_dir):
    from ..operators import similarity as S

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    if sf_dir not in _IVFPQ_CACHE:
        idx, cents, books = S.build_ivfpq(e, n_centroids=8, m=4, k=8,
                                          iters=1)
        idx = idx.persist()
        idx.count()
        _IVFPQ_CACHE[sf_dir] = (idx, cents, books)
    idx, cents, books = _IVFPQ_CACHE[sf_dir]
    qvec = [float(x) for x in
            e.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    return S.ivfpq_rerank_topk(e, idx, cents, books, qvec, k=10,
                               nprobe=4, pool=50)


# ------------------------------------------------- join-field queries

_JF_SPEC = {"type_field": "rel", "parent_type": "order",
            "key": "jkey", "child_key": "jkey"}


def _join_field_corpus(spark, sf_dir):
    """orders (parents) + lineitem (children) as ONE join-field frame —
    the public parent/child model: one index, a relation discriminator,
    children carrying the parent key."""
    t = _t(spark, sf_dir, "orders", "lineitem")
    parents = t["orders"].select(
        F.col("o_orderkey").alias("jkey"),
        F.lit("order").alias("rel"),
        F.col("o_orderpriority"),
        F.lit(None).cast("double").alias("l_quantity"),
        F.lit(None).cast("int").alias("l_linenumber"),
    )
    children = t["lineitem"].select(
        F.col("l_orderkey").alias("jkey"),
        F.lit("item").alias("rel"),
        F.lit(None).cast("string").alias("o_orderpriority"),
        F.col("l_quantity"),
        F.col("l_linenumber"),
    )
    return parents.unionByName(children)


@register(
    "has_child_search",
    oracle="""
    SELECT o_orderkey AS jkey, o_orderpriority
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_quantity >= 50)
    """,
    doc="DSL has_child (operators/search.py::_execute_join_field): "
    "parents whose children match the inner query — the inner range "
    "pushes into the child side's scan, then ONE left-semi join on the "
    "join key (the distributed analog of the public same-shard "
    "parent/child join; bucket both sides on the key for the "
    "zero-exchange layout).",
    tags=("dsl", "join"),
)
def has_child_search(spark, sf_dir):
    from ..operators.search import execute_search

    corpus = _join_field_corpus(spark, sf_dir)
    res = execute_search(corpus, {"query": {"has_child": {
        "type": "item",
        "query": {"range": {"l_quantity": {"gte": 50}}},
        "join_field": _JF_SPEC,
    }}})
    return res["hits"].select("jkey", "o_orderpriority")


@register(
    "has_parent_search",
    oracle="""
    SELECT l_orderkey AS jkey, l_quantity
    FROM lineitem l
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = l.l_orderkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
    doc="DSL has_parent: children whose parent matches — the parent "
    "predicate pushes into the parent scan, qualifying keys semi-join "
    "back onto the child side.",
    tags=("dsl", "join"),
)
def has_parent_search(spark, sf_dir):
    from ..operators.search import execute_search

    corpus = _join_field_corpus(spark, sf_dir)
    res = execute_search(corpus, {"query": {"has_parent": {
        "parent_type": "order",
        "query": {"term": {"o_orderpriority": "1-URGENT"}},
        "join_field": _JF_SPEC,
    }}})
    return res["hits"].select("jkey", "l_quantity")


@register(
    "has_child_inner_hits",
    oracle="""
    SELECT jkey, l_quantity, l_linenumber FROM (
      SELECT l.l_orderkey AS jkey, l.l_quantity, l.l_linenumber,
             ROW_NUMBER() OVER (PARTITION BY l.l_orderkey
                                ORDER BY l.l_quantity DESC,
                                         l.l_linenumber ASC) AS rn
      FROM lineitem l WHERE l.l_quantity >= 49) t
    WHERE rn <= 2
    """,
    doc="has_child inner_hits (operators/search.py::_execute_join_field"
    " inner_sink): each surviving parent's matching children, top-2 "
    "per parent under the inner sort — the matched-children semi-join "
    "plus ONE bounded per-key window; the frame stays distributed. "
    "l_linenumber tie-breaks (quantity ties are ubiquitous), keeping "
    "the window deterministic in both engines.",
    tags=("dsl", "join"),
)
def has_child_inner_hits(spark, sf_dir):
    from ..operators.search import execute_search

    corpus = _join_field_corpus(spark, sf_dir)
    res = execute_search(corpus, {"query": {"has_child": {
        "type": "item",
        "query": {"range": {"l_quantity": {"gte": 49}}},
        "join_field": _JF_SPEC,
        "inner_hits": {"name": "big_items", "size": 2,
                       "sort": [{"l_quantity": "desc"},
                                {"l_linenumber": "asc"}]},
    }}})
    return res["inner_hits"]["big_items"].select(
        "jkey", "l_quantity", "l_linenumber"
    )


@register(
    "children_agg",
    oracle="""
    SELECT COUNT(*) AS doc_count,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
             AS total_qty,
           MAX(l_quantity) AS max_qty
    FROM lineitem l
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = l.l_orderkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
    doc="`children` bucket aggregation (operators/search.py::_run_agg):"
    " switch from the parent doc set to the child docs whose FK "
    "matches a parent in context — ONE left-semi join on the key, "
    "metric sub-aggs over the switched frame. The `parent` twin climbs "
    "the other way (distinct parents of the children in context).",
    tags=("agg", "dsl", "join"),
)
def children_agg(spark, sf_dir):
    from ..operators.search import execute_search

    corpus = _join_field_corpus(spark, sf_dir)
    res = execute_search(corpus, {
        "size": 0,
        "query": {"term": {"o_orderpriority": "1-URGENT"}},
        "aggs": {"to_items": {
            "children": {"type": "item", "join_field": _JF_SPEC},
            "aggs": {"total_qty": {"sum": {"field": "l_quantity"}},
                     "max_qty": {"max": {"field": "l_quantity"}}},
        }},
    })
    agg = res["aggregations"]["to_items"]
    return spark.createDataFrame(
        [(agg["doc_count"], agg["total_qty"]["value"],
          agg["max_qty"]["value"])],
        "doc_count long, total_qty double, max_qty double",
    )


@register(
    "match_english_analyzer",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, lang,
             list_transform(
               list_filter({TOK}, t -> t NOT IN
                 ('a','an','and','are','as','at','be','but','by','for',
                  'if','in','into','is','it','no','not','of','on','or',
                  'such','that','the','their','then','there','these',
                  'they','this','to','was','will','with')),
               t -> CASE WHEN len(t) >= 4 AND t LIKE '%s'
                          AND NOT (t LIKE '%ss' OR t LIKE '%us'
                                   OR t LIKE '%is')
                         THEN t[1:len(t)-1] ELSE t END
             ) AS toks
      FROM documents)
    SELECT doc_id, lang FROM tk
    WHERE list_contains(toks, 'value') AND list_contains(toks, 'table')
    """,
    doc="DSL match with the english_light query-time analyzer "
    "(operators/search.py::_analyze_en): standard tokenize → Lucene "
    "stopword drop → minimal plural stem (strip one trailing 's', "
    "never after s/u/i), applied to BOTH query text and field tokens "
    "in pure Column algebra. The query 'values tables' stems to "
    "value+table and matches the singular corpus; the DuckDB twin "
    "mirrors the stem as a CASE (RE2 has no lookbehind).",
    tags=("dsl", "text"),
)
def match_english_analyzer(spark, sf_dir):
    from ..operators.search import compile_query

    d = _t(spark, sf_dir, "documents")["documents"]
    return d.filter(compile_query({"match": {"text": {
        "query": "values tables", "operator": "and",
        "analyzer": "english_light",
    }}})).select("doc_id", "lang")


@register(
    "range_date_math",
    oracle="""
    SELECT event_id, ts FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts <  TIMESTAMP '2024-01-26 00:00:00'
    """,
    doc="DSL range with date math (operators/search.py::"
    "_resolve_date_math): gte now-20d/d + lte now/d with the request "
    "`now` pinned to 2024-01-25T13:45:00 — offsets are calendar-aware "
    "(stdlib month/year arithmetic, day clamping) and rounding follows "
    "the public rule (lower-bound ops floor, upper-bound ops become "
    "next-unit-start exclusive, exact on microsecond timestamps). The "
    "resolved literals push into the parquet scan like any range.",
    tags=("dsl", "time"),
)
def range_date_math(spark, sf_dir):
    from ..operators.search import compile_query

    e = _t(spark, sf_dir, "events")["events"]
    return e.filter(compile_query({"range": {"ts": {
        "gte": "now-20d/d", "lte": "now/d",
        "now": "2024-01-25T13:45:00",
    }}})).select("event_id", "ts")


@register(
    "rate_per_day_agg",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS key, value
      FROM events)
    SELECT key, COUNT(*) AS doc_count,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
             / date_diff('day', key, key + INTERVAL 1 MONTH) AS per_day
    FROM m GROUP BY key
    """,
    doc="`rate` sub-agg under a monthly date_histogram: value sum per "
    "DAY — the raw decimal sum aggregates distributed, the "
    "normalization divides by each bucket's actual calendar length "
    "(31 for January) in response shaping. The DuckDB twin derives "
    "the same divisor from date arithmetic.",
    tags=("agg", "dsl", "time"),
)
def rate_per_day_agg(spark, sf_dir):
    from ..operators.search import execute_search

    e = _t(spark, sf_dir, "events")["events"]
    res = execute_search(e, {"size": 0, "aggs": {"h": {
        "date_histogram": {"field": "ts", "calendar_interval": "month"},
        "aggs": {"per_day": {"rate": {"field": "value", "unit": "day"}}},
    }}})
    rows = [(b["key"], b["doc_count"], b["per_day"]["value"])
            for b in res["aggregations"]["h"]["buckets"]]
    return spark.createDataFrame(
        rows, "key timestamp, doc_count bigint, per_day double"
    )


@register(
    "hybrid_search_normalized",
    oracle="""
    WITH s AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS _id, o_orderpriority,
             CAST(o_totalprice AS DOUBLE)
               / (CAST(o_totalprice AS DOUBLE) + 100000.0) AS a
      FROM orders),
    m AS (SELECT MIN(a) AS lo, MAX(a) AS hi FROM s)
    SELECT _id,
           (2.0 * ((a - lo) / (hi - lo))
            + CASE WHEN o_orderpriority = '1-URGENT'
                   THEN 1.0 ELSE 0.0 END) / 3.0 AS score
    FROM s, m
    ORDER BY score DESC, _id ASC LIMIT 20
    """,
    doc="OpenSearch 2.x hybrid query + normalization processor "
    "(operators/search.py::_execute_hybrid): a rank_feature scorer and "
    "a filter clause, each min-max normalized over its OWN score "
    "distribution (one-row aggregate broadcast back, no driver "
    "collect), combined with a weighted arithmetic mean (weights 2:1). "
    "Only (id, score) pairs shuffle; documents re-join by id at the "
    "end. min/max and the normalization arithmetic are IEEE-identical "
    "in both engines, so scores hash-match exactly.",
    tags=("dsl", "ranking", "hybrid"),
)
def hybrid_search_normalized(spark, sf_dir):
    from ..operators.search import execute_search

    o = _t(spark, sf_dir, "orders")["orders"].select(
        F.col("o_orderkey").cast("string").alias("_id"),
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    res = execute_search(o, {
        "query": {"hybrid": {"queries": [
            {"rank_feature": {"field": "o_totalprice",
                              "saturation": {"pivot": 100000.0}}},
            {"term": {"o_orderpriority": "1-URGENT"}},
        ]}},
        "size": 20,
        "search_pipeline": {"phase_results_processors": [
            {"normalization-processor": {
                "normalization": {"technique": "min_max"},
                "combination": {"technique": "arithmetic_mean",
                                "parameters": {"weights": [2.0, 1.0]}},
            }}]},
    })
    return res["hits"].select("_id", F.col("_score").alias("score"))


@register(
    "function_score_random",
    oracle="""
    SELECT o_orderkey,
           CAST(concat('0x',
                substr(md5('42|' || CAST(o_orderkey AS VARCHAR)), 1, 13))
                AS BIGINT) / 4503599627370496.0 AS score
    FROM orders
    ORDER BY score DESC, o_orderkey ASC LIMIT 15
    """,
    doc="function_score random_score (operators/search.py::"
    "_fs_function_value): reproducible per-document uniform [0,1) from "
    "md5(seed|field) — 13 hex chars = 52 mantissa bits, exact in a "
    "double and bit-identical across engines (the repo-wide md5-uniform "
    "recipe). The public use: stable random sampling / score jitter "
    "that survives reruns and resumes.",
    tags=("dsl", "ranking", "sampling"),
)
def function_score_random(spark, sf_dir):
    from ..operators.search import execute_search

    o = _t(spark, sf_dir, "orders")["orders"]
    res = execute_search(o, {
        "query": {"function_score": {
            "query": {"match_all": {}},
            "random_score": {"seed": 42, "field": "o_orderkey"},
            "boost_mode": "replace",
        }},
        "sort": [{"_score": {"order": "desc"}},
                 {"o_orderkey": {"order": "asc"}}],
        "size": 15,
    })
    return res["hits"].select("o_orderkey", F.col("_score").alias("score"))


_GS_OUTER = [(30.0, 0.0), (0.0, 60.0), (-30.0, 0.0), (0.0, -60.0)]
_GS_HOLE = [(10.0, 0.0), (0.0, 20.0), (-10.0, 0.0), (0.0, -20.0)]


def _gs_ring(poly):
    # GeoJSON ring: [lon, lat] pairs, closed (first == last)
    ring = [[lo, la] for la, lo in poly]
    return ring + [ring[0]]


def _geo_shape_oracle() -> str:
    from .catalog_ext import _GEO_LAT, _GEO_LON, _poly_crossing_sql

    outer = _poly_crossing_sql(_GS_OUTER)
    hole = _poly_crossing_sql(_GS_HOLE)
    return f"""
    WITH pts AS (
      SELECT c_custkey, {_GEO_LAT} AS lat, {_GEO_LON} AS lon FROM customer)
    SELECT c_custkey, lat, lon FROM pts
    WHERE ({outer}) % 2 = 1 AND NOT (({hole}) % 2 = 1)
    """


@register(
    "geo_shape_polygon_hole",
    oracle=_geo_shape_oracle(),
    doc="geo_shape DSL query, polygon-with-hole against the geo_point "
    "tier (operators/search.py geo_shape kind + functions/geo.py::"
    "shape_contains_point_pred): inside the outer ring AND NOT inside "
    "the hole ring, each ring an even-odd ray cast compiled to a FIXED "
    "request-constant comparison chain — whole-stage codegen, no "
    "geometry library, pipelines into the scan at any scale. Oracle "
    "runs the identical edge arithmetic (same Python-precomputed "
    "slopes in both texts → IEEE-identical crossing counts).",
    tags=("dsl", "geo"),
)
def geo_shape_polygon_hole(spark, sf_dir):
    from ..operators.search import execute_search
    from .catalog_ext import _geo_points

    pts = _geo_points(spark, sf_dir)
    hits = execute_search(pts, {"query": {"geo_shape": {"location": {
        "shape": {
            "type": "polygon",
            "coordinates": [_gs_ring(_GS_OUTER), _gs_ring(_GS_HOLE)],
        },
        "relation": "intersects",
    }}}})["hits"]
    return hits.select(
        "c_custkey",
        F.col("location.lat").alias("lat"),
        F.col("location.lon").alias("lon"),
    )


def _geo_shape_disjoint_oracle() -> str:
    from .catalog_ext import _GEO_DIST_SQL, _GEO_LAT, _GEO_LON

    return f"""
    WITH pts AS (
      SELECT c_custkey, {_GEO_LAT} AS lat, {_GEO_LON} AS lon FROM customer)
    SELECT COUNT(*) AS outside_count FROM pts
    WHERE NOT ((lat <= 60.0 AND lat >= 10.0
                AND lon >= -120.0 AND lon <= -60.0)
               OR {_GEO_DIST_SQL} <= 3000.0)
    """


@register(
    "geo_shape_collection_disjoint",
    oracle=_geo_shape_disjoint_oracle(),
    doc="geo_shape with a geometrycollection (envelope + circle) and "
    "relation=disjoint: documents outside BOTH members — the collection "
    "ORs its members' containment predicates and disjoint negates the "
    "union (tri-valued NOT drops null points, matching the public "
    "unmapped-field behavior). Envelope = 4 pushable comparisons; "
    "circle = the same haversine expression the geo_distance query "
    "compiles, so both engines evaluate the identical IEEE tree.",
    tags=("dsl", "geo"),
)
def geo_shape_collection_disjoint(spark, sf_dir):
    from ..operators.search import execute_search
    from .catalog_ext import _geo_points

    pts = _geo_points(spark, sf_dir)
    hits = execute_search(pts, {"query": {"geo_shape": {"location": {
        "shape": {"type": "geometrycollection", "geometries": [
            {"type": "envelope",
             "coordinates": [[-120.0, 60.0], [-60.0, 10.0]]},
            {"type": "circle", "coordinates": [-74.006, 40.7128],
             "radius": "3000km"},
        ]},
        "relation": "disjoint",
    }}}})["hits"]
    return hits.agg(F.count("*").alias("outside_count"))


@register(
    "t_test_welch_agg",
    oracle="""
    WITH s AS (
      SELECT COUNT(CASE WHEN o_orderpriority = '1-URGENT'
                        THEN o_totalprice END) AS na,
             CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                  THEN CAST(o_totalprice AS DECIMAL(38,9)) END)
                  AS DOUBLE) AS sa,
             CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                  THEN CAST(o_totalprice * o_totalprice AS DECIMAL(38,9)) END)
                  AS DOUBLE) AS ssa,
             COUNT(CASE WHEN o_orderpriority = '5-LOW'
                        THEN o_totalprice END) AS nb,
             CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
                  THEN CAST(o_totalprice AS DECIMAL(38,9)) END)
                  AS DOUBLE) AS sb,
             CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
                  THEN CAST(o_totalprice * o_totalprice AS DECIMAL(38,9)) END)
                  AS DOUBLE) AS ssb
      FROM orders),
    m AS (
      SELECT na, nb,
             (ssa - sa * sa / na) / (na - 1) / na AS sea,
             (ssb - sb * sb / nb) / (nb - 1) / nb AS seb,
             sa / na - sb / nb AS dm
      FROM s)
    SELECT na, nb,
           ROUND(dm / SQRT(sea + seb), 9) AS t_stat,
           ROUND((sea + seb) * (sea + seb)
                 / (sea * sea / (na - 1) + seb * seb / (nb - 1)), 6)
             AS welch_dof
    FROM m
    """,
    doc="DSL `t_test` aggregation, heteroscedastic (Welch — the public "
    "default): URGENT vs LOW order totals from ONE conditional-"
    "aggregation pass (exact decimal Σ/Σ² per side — no second scan, "
    "no shuffle beyond the map-side partial agg). The reduced six "
    "scalars become t and the Welch–Satterthwaite dof driver-side; "
    "the p-value (exact incomplete-beta tail, functions/stats.py) "
    "rides the same scalars and is pinned by pytest against published "
    "critical values — this row oracles the distributed part.",
    tags=("agg", "dsl", "stats"),
)
def t_test_welch_agg(spark, sf_dir):
    from ..operators.search import execute_search

    o = _t(spark, sf_dir, "orders")["orders"]
    res = execute_search(o, {"size": 0, "aggs": {"tt": {"t_test": {
        "a": {"field": "o_totalprice",
              "filter": {"term": {"o_orderpriority": "1-URGENT"}}},
        "b": {"field": "o_totalprice",
              "filter": {"term": {"o_orderpriority": "5-LOW"}}},
        "type": "heteroscedastic",
    }}}})
    tt = res["aggregations"]["tt"]
    return spark.createDataFrame(
        [(tt["na"], tt["nb"],
          round(tt["t_statistic"], 9),
          round(tt["degrees_of_freedom"], 6))],
        "na bigint, nb bigint, t_stat double, welch_dof double",
    )


@register(
    "t_test_paired_agg",
    oracle="""
    WITH s AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity - l_linenumber AS DECIMAL(38,9)))
                  AS DOUBLE) AS sd,
             CAST(SUM(CAST((l_quantity - l_linenumber)
                           * (l_quantity - l_linenumber)
                           AS DECIMAL(38,9))) AS DOUBLE) AS ssd
      FROM lineitem)
    SELECT n,
           ROUND((sd / n) / SQRT(((ssd - sd * sd / n) / (n - 1)) / n), 9)
             AS t_stat,
           n - 1 AS dof
    FROM s
    """,
    doc="DSL `t_test` aggregation, paired: per-document differences "
    "(l_quantity − l_linenumber) reduced in one exact-decimal pass; "
    "t = mean(d)/sqrt(var_s(d)/n) with dof = n−1 computed driver-side "
    "on the single reduced row — identical IEEE expression tree on "
    "both engines, t rounded to 9.",
    tags=("agg", "dsl", "stats"),
)
def t_test_paired_agg(spark, sf_dir):
    from ..operators.search import execute_search

    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    res = execute_search(li, {"size": 0, "aggs": {"tt": {"t_test": {
        "a": {"field": "l_quantity"},
        "b": {"field": "l_linenumber"},
        "type": "paired",
    }}}})
    tt = res["aggregations"]["tt"]
    return spark.createDataFrame(
        [(tt["n"], round(tt["t_statistic"], 9),
          int(tt["degrees_of_freedom"]))],
        "n bigint, t_stat double, dof bigint",
    )


@register(
    "variable_width_histogram_agg",
    oracle="""
    WITH cuts AS (
      SELECT ROUND(quantile_cont(l_quantity, 0.2), 6) AS c1,
             ROUND(quantile_cont(l_quantity, 0.4), 6) AS c2,
             ROUND(quantile_cont(l_quantity, 0.6), 6) AS c3,
             ROUND(quantile_cont(l_quantity, 0.8), 6) AS c4
      FROM lineitem),
    b AS (
      SELECT l_quantity AS v,
             (CASE WHEN l_quantity > c1 THEN 1 ELSE 0 END
              + CASE WHEN l_quantity > c2 THEN 1 ELSE 0 END
              + CASE WHEN l_quantity > c3 THEN 1 ELSE 0 END
              + CASE WHEN l_quantity > c4 THEN 1 ELSE 0 END) AS bk
      FROM lineitem, cuts)
    SELECT MIN(v) AS vmin,
           CAST(SUM(CAST(v AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*) AS key,
           MAX(v) AS vmax,
           COUNT(*) AS doc_count
    FROM b GROUP BY bk ORDER BY bk
    """,
    doc="DSL `variable_width_histogram` (deterministic dialect): the "
    "public agg clusters per shard and merges (approximate, shard-"
    "count dependent); this engine cuts at exact equal-depth "
    "percentile boundaries instead — same adaptive-bucket shape, "
    "reproducible anywhere. Two passes: one percentile reduce for the "
    "k−1 boundary scalars (swap to approx_percentile at 100 TB via "
    "\"exact\": false), then ONE groupBy over ≤k synthesized bucket "
    "ids whose assignment is a fixed comparison chain over rounded-"
    "to-6 boundary literals — both engines cut on identical "
    "constants, so membership is bit-identical.",
    tags=("agg", "dsl"),
)
def variable_width_histogram_agg(spark, sf_dir):
    from ..operators.search import execute_search

    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    res = execute_search(li, {"size": 0, "aggs": {"vwh": {
        "variable_width_histogram": {"field": "l_quantity", "buckets": 5},
    }}})
    rows = [(b["min"], b["key"], b["max"], b["doc_count"])
            for b in res["aggregations"]["vwh"]["buckets"]]
    return spark.createDataFrame(
        rows, "vmin double, key double, vmax double, doc_count bigint"
    )


@register(
    "post_filter_search",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_acctbal >= 1000.0 AND c_mktsegment = 'BUILDING'
    """,
    doc="DSL `post_filter` (faceted navigation): the query narrows the "
    "aggregation frame, the post_filter narrows ONLY the returned hits "
    "— facet counts keep ignoring the facet the user clicked "
    "(operators/search.py execute_search post_filter branch; the "
    "agg-independence half is pytest-asserted in "
    "tests/test_search_dsl_tail.py). Both predicates are plain "
    "pushable filters: the scan sees query AND post_filter for the "
    "hits job, query alone for the agg job.",
    tags=("dsl",),
)
def post_filter_search(spark, sf_dir):
    from ..operators.search import execute_search

    c = _t(spark, sf_dir, "customer")["customer"]
    res = execute_search(c, {
        "query": {"range": {"c_acctbal": {"gte": 1000.0}}},
        "post_filter": {"term": {"c_mktsegment": "BUILDING"}},
        "aggs": {"segments": {"terms": {"field": "c_mktsegment"}}},
    })
    return res["hits"].select("c_custkey", "c_mktsegment", "c_acctbal")


@register(
    "categorize_text_agg",
    oracle="""
    WITH keys AS (
      SELECT array_to_string(
               list_filter(str_split_regex(text, '[^A-Za-z]+'),
                           x -> x <> ''), ' ') AS key
      FROM documents WHERE text IS NOT NULL)
    SELECT key, COUNT(*) AS doc_count
    FROM keys WHERE key <> ''
    GROUP BY key ORDER BY doc_count DESC, key LIMIT 10
    """,
    doc="DSL `categorize_text` aggregation (deterministic dialect): the "
    "public agg clusters log messages with an approximate drain-tree; "
    "this engine keys each doc by its maximal-letter-run token "
    "sequence — numbers/ids/punctuation (the per-instance variation in "
    "a templated log line) become separators — so the common case "
    "(log templates differing only in numerics) reproduces exactly and "
    "the whole agg is one codegen projection + ONE groupBy shuffling "
    "|patterns| keys, never |docs| (operators/search.py "
    "categorize_text branch).",
    tags=("agg", "dsl", "text"),
)
def categorize_text_agg(spark, sf_dir):
    from ..operators.search import execute_search

    d = _t(spark, sf_dir, "documents")["documents"]
    res = execute_search(d, {"size": 0, "aggs": {
        "cats": {"categorize_text": {"field": "text", "size": 10}},
    }})
    rows = [(b["key"], b["doc_count"])
            for b in res["aggregations"]["cats"]["buckets"]]
    return spark.createDataFrame(rows, "key string, doc_count bigint")


@register(
    "geo_line_agg",
    oracle="""
    WITH pts AS (
      SELECT ts,
             ((user_id * 104729) % 36000) / 100.0 - 180.0 AS lon,
             ((user_id * 7919) % 18000) / 100.0 - 90.0 AS lat
      FROM events WHERE event_type = 'click')
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY ts, lon, lat) AS BIGINT) AS seq,
           lon, lat
    FROM pts ORDER BY ts, lon, lat LIMIT 50
    """,
    doc="DSL `geo_line` aggregation: click events as a trajectory — the "
    "first 50 points by timestamp as a GeoJSON LineString "
    "(operators/search.py geo_line branch). Scale shape: orderBy+limit "
    "compiles to ONE distributed TakeOrdered (each task keeps a local "
    "size-bounded heap, the driver merges heaps), so only ≤ size+1 "
    "points ever leave the executors regardless of corpus size. "
    "Deterministic under timestamp ties via (lon, lat) tie-breaks; "
    "coordinates are the closed-form synthesized geo_points (exact "
    "double arithmetic both engines).",
    tags=("agg", "dsl", "geo"),
)
def geo_line_agg(spark, sf_dir):
    from ..operators.search import execute_search

    e = _t(spark, sf_dir, "events")["events"]
    lat = ((F.col("user_id") * 7919) % 18000) / 100.0 - 90.0
    lon = ((F.col("user_id") * 104729) % 36000) / 100.0 - 180.0
    pts = e.filter(F.col("event_type") == "click").select(
        "ts", F.struct(lat.alias("lat"), lon.alias("lon")).alias("location"),
    )
    res = execute_search(pts, {"size": 0, "aggs": {"line": {"geo_line": {
        "point": {"field": "location"},
        "sort": {"field": "ts"},
        "size": 50,
    }}}})
    coords = res["aggregations"]["line"]["geometry"]["coordinates"]
    rows = [(i + 1, c[0], c[1]) for i, c in enumerate(coords)]
    return spark.createDataFrame(rows, "seq bigint, lon double, lat double")


def _hexgrid_key_sql(p: int, lat_expr: str, lon_expr: str) -> str:
    """Identical-arithmetic DuckDB twin of
    ``operators.search.hexgrid_cell``: same Python-computed literals
    (edge, pi/4, pi/180, sqrt(3)/3, 2/3), same association order, same
    FLOOR(v+0.5) rounding — so both engines assign every point the
    same hex cell bit-for-bit (1-ulp libm tan/ln differences could in
    principle flip a point sitting ON a cell boundary; the synthesized
    0.01-degree grid never does)."""
    import math

    earth_r = 6378137.0
    edge = (2 * math.pi * earth_r) / (6.0 * (1 << p))
    rad, pi4 = math.pi / 180.0, math.pi / 4.0
    s33, tt = math.sqrt(3.0) / 3.0, 2.0 / 3.0
    clat = f"LEAST(GREATEST({lat_expr}, -85.05112878), 85.05112878)"
    x = f"({lon_expr} * {rad!r} * {earth_r!r})"
    y = f"(LN(TAN({pi4!r} + {clat} * {rad!r} / 2.0)) * {earth_r!r})"
    qf = f"(({s33!r} * {x} - {y} / 3.0) / {edge!r})"
    rf = f"(({y} * {tt!r}) / {edge!r})"
    sf = f"(-{qf} - {rf})"
    rq, rr, rs = (f"FLOOR({c} + 0.5)" for c in (qf, rf, sf))
    dq = f"ABS({rq} - {qf})"
    dr = f"ABS({rr} - {rf})"
    ds = f"ABS({rs} - {sf})"
    qfix = f"(CASE WHEN {dq} > {dr} AND {dq} > {ds} " \
           f"THEN -{rr} - {rs} ELSE {rq} END)"
    rfix = f"(CASE WHEN NOT ({dq} > {dr} AND {dq} > {ds}) " \
           f"AND {dr} > {ds} THEN -{rq} - {rs} ELSE {rr} END)"
    return (f"concat('{p}', '/', CAST(CAST({qfix} AS BIGINT) AS VARCHAR),"
            f" '/', CAST(CAST({rfix} AS BIGINT) AS VARCHAR))")


@register(
    "geohex_grid_agg",
    oracle=f"""
    WITH pts AS (
      SELECT ((c_custkey * 7919) % 18000) / 100.0 - 90.0 AS lat,
             ((c_custkey * 104729) % 36000) / 100.0 - 180.0 AS lon
      FROM customer)
    SELECT {_hexgrid_key_sql(3, 'lat', 'lon')} AS key,
           COUNT(*) AS doc_count
    FROM pts GROUP BY 1 ORDER BY doc_count DESC, key LIMIT 20
    """,
    doc="DSL `geohex_grid` aggregation (deterministic dialect): the "
    "public agg keys on H3's icosahedral hex grid; this engine keeps "
    "the agg's shape — uniform hexagon cells, a resolution ladder "
    "(edge halves per level), top-size buckets — on a regular "
    "pointy-top hex grid in Web-Mercator meters "
    "(operators/search.py::hexgrid_cell: project, scale to axial "
    "fractional coordinates, cube-round — ONE codegen projection, no "
    "UDF, no geo library) + one groupBy + TakeOrdered. Oracle is the "
    "identical-arithmetic DuckDB twin.",
    tags=("agg", "dsl", "geo"),
)
def geohex_grid_agg(spark, sf_dir):
    from ..operators.search import execute_search

    c = _t(spark, sf_dir, "customer")["customer"]
    lat = ((F.col("c_custkey") * 7919) % 18000) / 100.0 - 90.0
    lon = ((F.col("c_custkey") * 104729) % 36000) / 100.0 - 180.0
    pts = c.select(
        F.struct(lat.alias("lat"), lon.alias("lon")).alias("location"))
    res = execute_search(pts, {"size": 0, "aggs": {"grid": {
        "geohex_grid": {"field": "location", "precision": 3, "size": 20},
    }}})
    rows = [(b["key"], b["doc_count"])
            for b in res["aggregations"]["grid"]["buckets"]]
    return spark.createDataFrame(rows, "key string, doc_count bigint")


@register(
    "script_score_search",
    oracle="""
    SELECT c_custkey,
           ROUND(c_acctbal / 1000.0 + length(c_name) * 0.1, 9) AS score
    FROM customer
    WHERE c_mktsegment = 'BUILDING'
    ORDER BY score DESC, c_custkey ASC LIMIT 15
    """,
    doc="Standalone `script_score` query (operators/search.py "
    "execute_search branch): the guarded-expression script REPLACES "
    "the score over the wrapped query's matches — one codegen "
    "projection + TakeOrdered, no shuffle. Distinct from the "
    "function_score function of the same name (which composes with "
    "the base score). Score rounded to 9 decimals both sides.",
    tags=("dsl", "scoring"),
)
def script_score_search(spark, sf_dir):
    from ..operators.search import execute_search

    c = _t(spark, sf_dir, "customer")["customer"]
    res = execute_search(c, {
        "query": {"script_score": {
            "query": {"term": {"c_mktsegment": "BUILDING"}},
            "script": {"source":
                       "round(c_acctbal / 1000.0 + length(c_name) * 0.1, 9)"},
        }},
        "size": 15,
    })
    return res["hits"].select(
        "c_custkey", F.col("_score").alias("score"))
