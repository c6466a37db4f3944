"""PPL (Piped Processing Language) catalog: each entry is a literal PPL
pipeline string compiled by the REAL compiler
(:mod:`..operators.ppl`) paired with a hand-written DuckDB oracle —
the driver's compare exercises the exact surface a reference-stack
user types into the OpenSearch SQL/PPL plugin.

Cross-engine rules honored: identical output aliases both sides,
decimal-sum accumulate for sum/avg (partition-order independent),
unique-key tie-breaks on every head/LIMIT, UTC day-floor spans mirrored
with ``date_trunc('day', ...)``.
"""

from __future__ import annotations

from ..operators.ppl import ppl_query
from .catalog import register, _t


def _run(spark, sf_dir: str, query: str, *tables: str):
    loaded = _t(spark, sf_dir, *tables)
    return ppl_query(query, lambda n: loaded[n])


@register(
    "ppl_where_sort_head",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag = 'A'
    ORDER BY l_quantity DESC, l_orderkey, l_linenumber
    LIMIT 50
    """,
    doc="PPL search/where/fields/sort/head pipeline: the filter stages "
    "reach the parquet scan as pushed filters, the fields stage prunes "
    "ReadSchema, sort+head fuses to TakeOrdered (no global sort).",
    tags=("ppl",),
)
def ppl_where_sort_head(spark, sf_dir):
    return _run(
        spark, sf_dir,
        "search source=lineitem l_quantity > 45 "
        "| where l_returnflag = 'A' "
        "| fields l_orderkey, l_linenumber, l_quantity "
        "| sort -l_quantity, l_orderkey, l_linenumber | head 50",
        "lineitem",
    )


@register(
    "ppl_stats_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
             / COUNT(o_totalprice) AS avg_price
    FROM orders GROUP BY o_orderpriority
    """,
    doc="PPL stats..by: count/sum/avg per group — one partial/final "
    "hash-aggregate shuffle, exact decimal accumulate (bit-identical "
    "to the oracle's same-cast SQL regardless of partition order).",
    tags=("ppl", "agg"),
)
def ppl_stats_by_priority(spark, sf_dir):
    return _run(
        spark, sf_dir,
        "source=orders | stats count() as cnt, sum(o_totalprice) as total, "
        "avg(o_totalprice) as avg_price by o_orderpriority",
        "orders",
    )


@register(
    "ppl_span_daily",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_span,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total
    FROM events GROUP BY 1
    """,
    doc="PPL stats by span(ts, 1d): UTC epoch-floor day buckets in "
    "codegen (no UDF) — the PPL twin of date_histogram.",
    tags=("ppl", "agg", "time"),
)
def ppl_span_daily(spark, sf_dir):
    return _run(
        spark, sf_dir,
        "source=events | stats count() as cnt, sum(value) as total "
        "by span(ts, 1d)",
        "events",
    )


@register(
    "ppl_eventstats_above_mean",
    oracle="""
    WITH w AS (
      SELECT o_orderpriority, o_totalprice,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
                  OVER (PARTITION BY o_orderpriority) AS DOUBLE)
               / COUNT(o_totalprice) OVER (PARTITION BY o_orderpriority)
               AS mean_price
      FROM orders)
    SELECT o_orderpriority, COUNT(*) AS cnt
    FROM w WHERE o_totalprice > mean_price
    GROUP BY o_orderpriority
    """,
    doc="PPL eventstats: per-group mean appended WITHOUT collapsing "
    "(window aggregate), then filtered and re-aggregated — the "
    "standard above-group-average pipeline in one pass over the scan.",
    tags=("ppl", "agg", "window"),
)
def ppl_eventstats_above_mean(spark, sf_dir):
    return _run(
        spark, sf_dir,
        "source=orders "
        "| eventstats avg(o_totalprice) as mean_price by o_orderpriority "
        "| where o_totalprice > mean_price "
        "| stats count() as cnt by o_orderpriority",
        "orders",
    )


@register(
    "ppl_dedup_latest_event",
    oracle="""
    SELECT user_id, event_id, event_type FROM (
      SELECT user_id, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id) AS rn
      FROM events) WHERE rn = 1
    """,
    doc="PPL sort + dedup: latest event per user — dedup keeps the "
    "first row per key under the pipeline's current sort order "
    "(row_number window, partition-parallel; ties broken by event_id "
    "so the answer is deterministic).",
    tags=("ppl", "window"),
)
def ppl_dedup_latest_event(spark, sf_dir):
    return _run(
        spark, sf_dir,
        "source=events | sort -ts, event_id | dedup user_id "
        "| fields user_id, event_id, event_type",
        "events",
    )


@register(
    "ppl_top_event_types",
    oracle="""
    SELECT event_type, COUNT(*) AS count FROM events
    GROUP BY event_type ORDER BY count DESC, event_type LIMIT 3
    """,
    doc="PPL top N field: most common values — groupBy count + "
    "TakeOrdered with a value-ascending tie-break.",
    tags=("ppl", "agg"),
)
def ppl_top_event_types(spark, sf_dir):
    return _run(spark, sf_dir, "source=events | top 3 event_type", "events")


@register(
    "ppl_parse_props",
    oracle="""
    SELECT regexp_extract(props, '"k": ([0-9]+)', 1) AS kval,
           COUNT(*) AS cnt
    FROM events
    GROUP BY 1 HAVING COUNT(*) >= 100 ORDER BY kval
    """,
    doc="PPL parse: named-group regex extraction ((?<kval>...) → "
    "regexp_extract by group index, codegen) feeding a stats stage.",
    tags=("ppl", "text"),
)
def ppl_parse_props(spark, sf_dir):
    return _run(
        spark, sf_dir,
        'source=events | parse props \'"k": (?<kval>[0-9]+)\' '
        "| stats count() as cnt by kval | where cnt >= 100 | sort kval",
        "events",
    )


@register(
    "ppl_lookup_nation",
    oracle="""
    SELECT n.n_name, COUNT(*) AS cnt,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS bal
    FROM customer c LEFT JOIN nation n
      ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="PPL lookup: dimension enrich via BROADCAST left join (the "
    "customer side never shuffles for the join; only the final "
    "25-group aggregate exchanges).",
    tags=("ppl", "join"),
)
def ppl_lookup_nation(spark, sf_dir):
    return _run(
        spark, sf_dir,
        "source=customer | lookup nation n_nationkey as c_nationkey "
        "| stats count() as cnt, sum(c_acctbal) as bal by n_name",
        "customer", "nation",
    )


@register(
    "ppl_grok_typed",
    oracle="""
    SELECT CAST(regexp_extract(props, '"k": ([+-]?\\d+)', 1) AS BIGINT)
             AS kv,
           COUNT(*) AS cnt
    FROM events
    GROUP BY 1 HAVING COUNT(*) >= 100 ORDER BY kv
    """,
    doc="PPL grok: %{INT:kv:int} expands from the built-in pattern "
    "library to a typed extraction (regexp_extract + try_cast, "
    "codegen) feeding a stats stage — the log-wrangling twin of parse.",
    tags=("ppl", "text"),
)
def ppl_grok_typed(spark, sf_dir):
    return _run(
        spark, sf_dir,
        "source=events | grok props '\"k\": %{INT:kv:int}' "
        "| stats count() as cnt by kv | where cnt >= 100 | sort kv",
        "events",
    )


@register(
    "ppl_percentile_stats",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.95), 6) AS p95,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
             / COUNT(value) AS mean
    FROM events GROUP BY event_type
    """,
    doc="PPL stats percentile(field, p): exact interpolated percentile "
    "(both engines' exact quantile; rounded to 6 decimals for the "
    "interpolation arithmetic) alongside the decimal-exact mean, one "
    "hash aggregate per group.",
    tags=("ppl", "agg"),
)
def ppl_percentile_stats(spark, sf_dir):
    from pyspark.sql import functions as FF

    df = _run(
        spark, sf_dir,
        "source=events | stats percentile(value, 50) as p50, "
        "percentile(value, 95) as p95, avg(value) as mean by event_type",
        "events",
    )
    return df.select(
        "event_type",
        FF.round("p50", 6).alias("p50"),
        FF.round("p95", 6).alias("p95"),
        "mean",
    )


@register(
    "ppl_join_revenue_by_nation",
    oracle="""
    SELECT n_name, COUNT(*) AS cnt,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="PPL `join` command (operators/ppl.py join stage — the PPL 3.x "
    "equality-key join): customer enriched with its nation, aggregated "
    "per nation name. The join shuffles on the key (AQE broadcasts the "
    "25-row nation side on its own); overlapping non-key right columns "
    "drop, the lookup rule.",
    tags=("ppl", "join"),
)
def ppl_join_revenue_by_nation(spark, sf_dir):
    return _run(
        spark, sf_dir,
        "source=customer | join type=inner nation on c_nationkey = "
        "n_nationkey | stats count() as cnt, sum(c_acctbal) as bal "
        "by n_name",
        "customer", "nation",
    )


@register(
    "ppl_appendcol_vs_mean",
    oracle="""
    WITH m AS (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(o_totalprice) AS mean_price
      FROM orders)
    SELECT o_orderkey, o_totalprice, mean_price
    FROM orders, m
    WHERE o_totalprice > 1.8 * mean_price
    ORDER BY o_orderkey
    """,
    doc="PPL `appendcol` (single-row sub-pipeline subset): a stats "
    "aggregate over the SAME source attaches as broadcast constant "
    "columns — the compare-each-row-to-the-global-mean shape, one "
    "corpus pass + a 1-row crossJoin, no window.",
    tags=("ppl",),
)
def ppl_appendcol_vs_mean(spark, sf_dir):
    return _run(
        spark, sf_dir,
        "source=orders | appendcol [ stats avg(o_totalprice) as "
        "mean_price ] | where o_totalprice > 1.8 * mean_price "
        "| fields o_orderkey, o_totalprice, mean_price | sort o_orderkey",
        "orders",
    )


@register(
    "ppl_patterns_templates",
    oracle="""
    SELECT regexp_replace(o_orderpriority, '[a-zA-Z0-9]+', '', 'g')
             AS patterns_field,
           COUNT(*) AS cnt
    FROM orders GROUP BY 1
    """,
    doc="PPL `patterns` command: strip the variable (alphanumeric) "
    "runs, group by the remaining punctuation skeleton — the "
    "log-template extraction move, pure codegen regexp_replace.",
    tags=("ppl",),
)
def ppl_patterns_templates(spark, sf_dir):
    return _run(
        spark, sf_dir,
        "source=orders | patterns o_orderpriority "
        "| stats count() as cnt by patterns_field",
        "orders",
    )


@register(
    "ppl_fieldsummary_orders",
    oracle="""
    SELECT 'o_totalprice' AS field, 'double' AS type,
           COUNT(o_totalprice) AS count,
           COUNT(DISTINCT o_totalprice) AS distinct,
           CAST(MIN(o_totalprice) AS VARCHAR) AS min,
           CAST(MAX(o_totalprice) AS VARCHAR) AS max,
           ROUND(AVG(o_totalprice), 9) AS avg,
           ROUND(STDDEV_SAMP(o_totalprice), 9) AS stddev,
           COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END) AS nulls
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', 'string',
           COUNT(o_orderpriority), COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority),
           NULL, NULL,
           COUNT(CASE WHEN o_orderpriority IS NULL THEN 1 END)
    FROM orders
    """,
    doc="PPL `fieldsummary`: per-field count/distinct/min/max/avg/"
    "stddev/nulls in ONE aggregate pass (schema-bounded melt "
    "driver-side). avg/stddev rounded to 9 decimals on both sides "
    "(float-sum accumulation order).",
    tags=("ppl", "agg"),
)
def ppl_fieldsummary_orders(spark, sf_dir):
    from pyspark.sql import functions as F

    out = _run(
        spark, sf_dir,
        "source=orders | fieldsummary includefields=o_totalprice, "
        "o_orderpriority",
        "orders",
    )
    return out.withColumn("avg", F.round("avg", 9)) \
              .withColumn("stddev", F.round("stddev", 9))


@register(
    "ppl_ad_anomalies",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS m
      FROM events GROUP BY event_type),
    mad AS (
      SELECT e.event_type, quantile_cont(abs(e.value - med.m), 0.5) AS d
      FROM events e JOIN med USING (event_type)
      GROUP BY e.event_type),
    scored AS (
      SELECT e.event_id, e.event_type,
             ROUND(abs(e.value - med.m) / (mad.d * 1.4826), 9) AS score
      FROM events e
      JOIN med USING (event_type) JOIN mad USING (event_type)
      WHERE mad.d > 0)
    SELECT event_id, event_type, score
    FROM scored WHERE score > 3.0
    ORDER BY score DESC, event_id LIMIT 100
    """,
    doc="PPL `ad` command (anomaly detection, deterministic dialect): "
    "the public command scores with a random-cut forest (per-node RNG, "
    "not reproducible); this engine scores the robust z-score "
    "|x − median| / (1.4826·MAD) per category — two exact-percentile "
    "aggregates whose per-group scalars broadcast-join back (swap to "
    "approx_percentile at 100 TB, same plan shape); the frame stays "
    "lazy. Pipeline: ad by event_type | where | eval round | sort | "
    "head — compiled by the real PPL compiler.",
    tags=("ppl", "ml"),
)
def ppl_ad_anomalies(spark, sf_dir):
    return _run(
        spark, sf_dir,
        "search source=events "
        "| ad field=value by event_type "
        "| eval score = round(anomaly_score, 9) "
        "| where score > 3.0 "
        "| fields event_id, event_type, score "
        "| sort -score, event_id | head 100",
        "events",
    )


@register(
    "ppl_ad_anomalies_approx",
    property_test="tests/test_ppl.py::test_ad_mode_approx_matches_exact_at_small_scale",
    oracle=None,  # approximate by construction: the sketch answers
    # nearest-rank (uninterpolated) percentiles, so even-sized groups
    # differ from the exact twin by design. Defining invariant —
    # accuracy 10000 retains every value at test scale, making the
    # answer the exact nearest-rank percentile, which COINCIDES with
    # mode=exact on odd-sized groups — is property-tested in
    # tests/test_ppl.py::test_ad_mode_approx_matches_exact_at_small_scale
    doc="PPL `ad` in mode=approx — the 100 TB selector the exact twin "
    "(ppl_ad_anomalies) documents: per-group median and MAD come from "
    "bounded-memory approx_percentile sketches instead of exact "
    "full-value-per-group percentile buffers; identical plan shape "
    "(two hash aggregates broadcast-joined back), no per-group sort. "
    "Plan-audited: the compiled plan contains approx_percentile and "
    "no exact percentile aggregate.",
    tags=("ppl", "ml", "approx"),
)
def ppl_ad_anomalies_approx(spark, sf_dir):
    return _run(
        spark, sf_dir,
        "search source=events "
        "| ad field=value by event_type mode=approx "
        "| eval score = round(anomaly_score, 9) "
        "| where score > 3.0 "
        "| fields event_id, event_type, score "
        "| sort -score, event_id | head 100",
        "events",
    )


@register(
    "ppl_trendline_wma",
    oracle="""
    WITH s AS (
      SELECT event_id, value,
             lag(value, 2) OVER (ORDER BY event_id) AS l2,
             lag(value, 1) OVER (ORDER BY event_id) AS l1
      FROM events)
    SELECT event_id, ROUND((l2 * 1.0 + l1 * 2.0 + value * 3.0) / 6.0, 9) AS w
    FROM s ORDER BY event_id LIMIT 100
    """,
    doc="PPL `trendline wma(3, value)`: linearly-weighted moving average "
    "(newest weight 3 ... oldest 1, triangular-number normalized) over "
    "the event_id-ordered stream, null until the window fills. The "
    "oracle states the same weights through lag() — identical left-"
    "fold association, so values match to the 9-decimal round both "
    "engines apply.",
    tags=("ppl",),
)
def ppl_trendline_wma(spark, sf_dir):
    return _run(
        spark, sf_dir,
        "search source=events "
        "| sort +event_id "
        "| trendline wma(3, value) as wraw "
        "| eval w = round(wraw, 9) "
        "| head 100 "
        "| fields event_id, w",
        "events",
    )
