"""Analytics-catalog extension: subquery shapes (EXISTS / IN / scalar),
wider TPC-H join trees, event-funnel and cohort-retention analytics,
stratified sampling, quantile bucketing, and near-dup cluster labeling
(connected components).

These widen SURVEY §2.9 ("operators the reference does NOT implement,
provided Spark-first") beyond the first catalog: the reference's search
indexes (custom_resource.py:343-383) exist to serve exactly this class
of analytical read — the engine provides them as declarative Spark
plans with DuckDB oracle twins.

Oracle discipline follows plans/catalog.py: money aggregates via
associative decimal sums surfaced as double; thresholds compared on
decimals (never order-dependent double sums); every computed column
aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators.graph import connected_components
from ..operators.sampling import stratified_sample
from .catalog import _t, dsum, register
from .catalog_ext import JACCARD, SHINGLE_CTE

# sweep-cost containment for the two cluster rows (the ivfpq recipe):
# the DuckDB oracle's exact all-pairs Jaccard + recursive closure is
# quadratic in the slice, ~32 s/row at the full 500-doc fixture and
# ~5 s at 350 — the CLUSTERING semantics under test are unchanged, and
# full-corpus pair GENERATION stays pinned by minhash_near_dup_pairs
# (unsliced) and the recall property tests
_DUP_SLICE = 350
SHINGLE_CTE_SLICED = SHINGLE_CTE.replace(
    "FROM documents)", f"FROM documents WHERE doc_id < {_DUP_SLICE})")

# ---------------------------------------------------------------------------
# TPC-H shapes: correlated EXISTS (Q4), 6-way join tree (Q5), conditional
# aggregation ratio (Q14), HAVING-IN subquery (Q18), scalar subquery.
# ---------------------------------------------------------------------------


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1996-07-01'
      AND o.o_orderdate <  DATE '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 60)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS decorrelated to a left-semi "
    "join with a non-equi residual (shipdate > orderdate+60), then "
    "groupBy. Catalyst plans the semi join hash-partitioned on orderkey; "
    "the quarter filter pushes to the orders scan.",
    tags=("tpch", "join", "subquery"),
)
def q4_order_priority(spark, sf_dir):
    t = _t(spark, sf_dir, "orders", "lineitem")
    o, li = t["orders"], t["lineitem"]
    cond = (li["l_orderkey"] == o["o_orderkey"]) & (
        li["l_shipdate"].cast("date")
        > F.date_add(o["o_orderdate"].cast("date"), 60)
    )
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-07-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1996-10-01").cast("date"))
        )
        .join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4)))
                AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: 6-way join tree (fact-fact lineitem⋈orders plus "
    "four dimension hops) with the same-nation customer/supplier "
    "correlation. region and nation are broadcast; the fact join is "
    "hash-partitioned on orderkey; Catalyst reorders the dimension "
    "joins after pushdown.",
    tags=("tpch", "join", "agg"),
)
def q5_local_supplier_volume(spark, sf_dir):
    t = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier",
        "nation", "region",
    )
    r = t["region"].filter(F.col("r_name") == "ASIA")
    n = t["nation"].join(
        F.broadcast(r), t["nation"]["n_regionkey"] == r["r_regionkey"]
    )
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    s = t["supplier"].join(
        F.broadcast(n), t["supplier"]["s_nationkey"] == n["n_nationkey"]
    )
    li = t["lineitem"]
    c = t["customer"]
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(
            c,
            (c["c_custkey"] == o["o_custkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy("n_name").agg(dsum(disc_price, 4).alias("revenue"))


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))
                    ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4)))
                  AS DOUBLE) AS promo_revenue_pct
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'
    """,
    doc="TPC-H Q14 shape: conditional-aggregation ratio (promo revenue "
    "share) over a fact⋈dimension join. part is broadcast; both sums are "
    "associative decimal folds so the double division is bit-identical "
    "across engines.",
    tags=("tpch", "join", "agg"),
)
def q14_promo_revenue(spark, sf_dir):
    t = _t(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    j = li.join(F.broadcast(t["part"]), li["l_partkey"] == t["part"]["p_partkey"])
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc.cast("decimal(28,4)")).otherwise(
        F.lit(0).cast("decimal(28,4)")
    )
    return j.agg(
        (
            F.lit(100.0) * F.sum(promo).cast("double")
            / F.sum(disc.cast("decimal(28,4)")).cast("double")
        ).alias("promo_revenue_pct")
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_name, o_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(28,2))) > 250)
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
    GROUP BY c_name, o_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    doc="TPC-H Q18 shape: HAVING-filtered IN-subquery (large-volume "
    "orders) driving a 3-way join + re-aggregation. The IN becomes a "
    "left-semi join against the aggregated key set; the quantity "
    "threshold compares decimals, never an order-dependent double sum.",
    tags=("tpch", "join", "subquery", "agg"),
)
def q18_large_volume_customer(spark, sf_dir):
    t = _t(spark, sf_dir, "customer", "orders", "lineitem")
    li, o, c = t["lineitem"], t["orders"], t["customer"]
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,2)")).alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"], "left_semi")
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("c_name", "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
    )


@register(
    "scalar_subquery_above_avg",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0)
    """,
    doc="Scalar-subquery shape (TPC-H Q22 fragment): rows above a "
    "global aggregate threshold. Spark broadcasts the 1-row aggregate "
    "and filters in place — no second scan shuffle. The mean is an "
    "associative decimal sum / count, so the threshold double is "
    "bit-identical across engines.",
    tags=("subquery", "filter"),
)
def scalar_subquery_above_avg(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")["customer"]
    thresh = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", "c_name", "c_acctbal")
    )


# ---------------------------------------------------------------------------
# Event analytics: ordered funnel + weekly cohort retention over `events`.
# ---------------------------------------------------------------------------


@register(
    "funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_buy
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id)
    SELECT '1_view' AS stage, COUNT(*) AS users FROM v
    UNION ALL SELECT '2_click', COUNT(*) FROM c
    UNION ALL SELECT '3_purchase', COUNT(*) FROM p
    """,
    doc="Ordered event funnel (view → click after the first view → "
    "purchase after that click): three aggregations all keyed on "
    "user_id, so every join/groupBy reuses one hash partitioning — "
    "the whole funnel is a single shuffle family at 100 TB.",
    tags=("events", "join", "agg"),
)
def funnel_conversion(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )

    def stage(df, name):
        return df.agg(F.count("*").alias("users")).select(
            F.lit(name).alias("stage"), "users"
        )

    return stage(v, "1_view").union(stage(c, "2_click")).union(
        stage(p, "3_purchase")
    )


@register(
    "cohort_retention",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id),
    a AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
      FROM events)
    SELECT u.cohort_week,
           CAST(floor(datediff('day', u.cohort_week, a.active_week) / 7.0)
                AS BIGINT) AS week_offset,
           COUNT(*) AS active_users
    FROM a JOIN u ON a.user_id = u.user_id
    GROUP BY u.cohort_week, week_offset
    """,
    doc="Weekly cohort retention: cohort = ISO week of a user's first "
    "event; one row per (cohort, week offset) with active-user counts. "
    "Both aggregations key on user_id then a low-cardinality pair — "
    "map-side partial aggs keep the final shuffle tiny at scale.",
    tags=("events", "agg", "window"),
)
def cohort_retention(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    u = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    a = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("active_week")
    ).distinct()
    return (
        a.join(u, "user_id")
        .select(
            "cohort_week",
            F.floor(
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7.0
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("active_users"))
    )


# ---------------------------------------------------------------------------
# Stratified sampling + quantile bucketing.
# ---------------------------------------------------------------------------

_STRATA = {"en": 25, "fr": 50, "es": 50, "de": 80, "zh": 80}

_BUCKET_SQL = (
    "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
)

_PCT_SQL = (
    "CASE lang WHEN 'en' THEN 25 WHEN 'fr' THEN 50 WHEN 'es' THEN 50 "
    "WHEN 'de' THEN 80 WHEN 'zh' THEN 80 ELSE 0 END"
)


@register(
    "stratified_sample_counts",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_total,
           SUM(CASE WHEN {_BUCKET_SQL} < {_PCT_SQL} THEN 1 ELSE 0 END) AS n_sampled
    FROM documents GROUP BY lang
    """,
    doc="Deterministic stratified sampling: per-language keep fractions "
    "(downsample over-represented en, keep more of the long tail) via "
    "hash-bucket membership — per-row expression, no shuffle, rows never "
    "migrate between samples as the corpus grows.",
    tags=("sampling",),
)
def stratified_sample_counts(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    sampled = stratified_sample(d, _STRATA, "lang").select(
        "lang", F.lit(1).alias("one")
    )
    return (
        d.select("lang", "doc_id")
        .groupBy("lang")
        .agg(F.count("*").alias("n_total"))
        .join(
            sampled.groupBy("lang").agg(F.count("*").alias("n_sampled")),
            "lang",
            "left",
        )
        .select(
            "lang", "n_total", F.coalesce("n_sampled", F.lit(0)).alias("n_sampled")
        )
    )


@register(
    "ntile_quartiles",
    oracle="""
    SELECT quartile, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS sum_bal
    FROM (
      SELECT NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile, c_acctbal
      FROM customer)
    GROUP BY quartile
    """,
    doc="ntile quantile bucketing (equal-count quartiles of account "
    "balance) with a unique-key tie-break so bucket membership is "
    "deterministic. Computed WITHOUT a global window: range-partitioned "
    "two-phase global rank (operators/ranking.py) + the NTILE split as "
    "arithmetic — bit-identical to SQL NTILE, parallel at any scale.",
    tags=("window", "agg"),
)
def ntile_quartiles(spark, sf_dir):
    from ..operators.ranking import ntile_ranked

    c = _t(spark, sf_dir, "customer")["customer"]
    tiled = ntile_ranked(
        c.select("c_acctbal", "c_custkey"),
        4,
        ["c_acctbal", "c_custkey"],
        bucket_col="quartile",
    )
    return tiled.groupBy("quartile").agg(
        F.count("*").alias("n"), dsum(F.col("c_acctbal")).alias("sum_bal")
    )


# ---------------------------------------------------------------------------
# Search-DSL additions: multi_match and bool.minimum_should_match.
# ---------------------------------------------------------------------------


def _tokc(col: str) -> str:
    """DuckDB analyzer fragment for an arbitrary column (same tokenizer
    as the Spark side: lowercase, split on non-alphanumeric)."""
    return (
        f"list_filter(string_split_regex(lower({col}), '[^\\pL\\p{{Nd}}]+'),"
        " x -> x != '')"
    )


@register(
    "multi_match_fulltext",
    oracle=f"""
    SELECT p_partkey, p_name, p_type FROM part
    WHERE len(list_intersect(list_distinct({_tokc('p_name')}), ['blue','promo'])) >= 1
       OR len(list_intersect(list_distinct({_tokc('p_type')}), ['blue','promo'])) >= 1
    """,
    doc="DSL `multi_match` (best_fields, operator=or): the analyzed "
    "match predicate evaluated over several fields and OR-combined — "
    "one scan, all per-field predicates in a single codegen stage.",
    tags=("dsl", "fulltext"),
)
def multi_match_fulltext(spark, sf_dir):
    from ..operators.search import compile_query

    p = _t(spark, sf_dir, "part")["part"]
    return p.filter(
        compile_query(
            {"multi_match": {"query": "blue PROMO", "fields": ["p_name", "p_type"]}}
        )
    ).select("p_partkey", "p_name", "p_type")


@register(
    "bool_min_should_match",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer
    WHERE (CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
         + CASE WHEN c_acctbal >= 5000 THEN 1 ELSE 0 END
         + CASE WHEN c_name LIKE '%1' THEN 1 ELSE 0 END) >= 2
    """,
    doc="DSL `bool` with minimum_should_match=N: satisfied-clause "
    "counting compiled to a sum of null-safe int casts — stays a "
    "single-pass pushdown-friendly predicate, no join or subquery.",
    tags=("dsl", "filter"),
)
def bool_min_should_match(spark, sf_dir):
    from ..operators.search import compile_query

    c = _t(spark, sf_dir, "customer")["customer"]
    q = {
        "bool": {
            "should": [
                {"term": {"c_mktsegment": "BUILDING"}},
                {"range": {"c_acctbal": {"gte": 5000}}},
                {"wildcard": {"c_name": "*1"}},
            ],
            "minimum_should_match": 2,
        }
    }
    return c.filter(compile_query(q)).select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )


# ---------------------------------------------------------------------------
# Near-dup cluster labeling: connected components over MinHash pairs.
# ---------------------------------------------------------------------------


@register(
    "near_dup_components",
    oracle=f"""
    WITH RECURSIVE {SHINGLE_CTE_SLICED},
    pairs AS MATERIALIZED (
      SELECT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, {JACCARD} AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      ) WHERE jaccard >= 0.7),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
    reach(src, dst) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
    SELECT src AS node, MIN(dst) AS component_id
    FROM reach GROUP BY src
    """,
    doc="Duplicate-cluster labeling: connected components (iterative "
    "min-label propagation, operators/graph.py) over the exact-verified "
    "MinHash pair list — turns pairwise near-dups into per-cluster "
    "labels so curation keeps one survivor per cluster, not per pair. "
    "Oracle = recursive transitive closure over the same exact-Jaccard "
    "edges. Each Spark round is one join+groupBy keyed on node id; "
    "round count = cluster diameter (shallow for dup clusters).",
    tags=("dedup", "graph", "iterative"),
)
def near_dup_components(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < _DUP_SLICE)
    pairs = D.minhash_lsh_pairs(d, num_hashes=64, bands=32, threshold=0.7)
    return connected_components(pairs.select("id_a", "id_b"))


@register(
    "nested_terms_agg",
    oracle="""
    WITH p AS (
      SELECT o_orderpriority AS parent_key, COUNT(*) AS pn
      FROM orders GROUP BY 1 ORDER BY pn DESC, parent_key LIMIT 3),
    c AS (
      SELECT o.o_orderpriority AS parent_key, o.o_orderstatus AS child_key,
             COUNT(*) AS doc_count,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
      FROM orders o JOIN p ON o.o_orderpriority = p.parent_key
      GROUP BY 1, 2),
    r AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY parent_key ORDER BY doc_count DESC, child_key) AS rn
      FROM c)
    SELECT parent_key, child_key, doc_count, sum_price FROM r WHERE rn <= 2
    """,
    doc="DSL nested terms→terms→metric aggregation, flattened to rows "
    "(operators/search.py _run_agg builds the same plan into the "
    "OpenSearch response shape): top-3 parent buckets by doc_count, "
    "top-2 child buckets per parent, one (parent, child) groupBy + "
    "per-parent window — a single plan, never a query per bucket.",
    tags=("dsl", "agg", "window"),
)
def nested_terms_agg(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")["orders"]
    parents = (
        o.groupBy(F.col("o_orderpriority").alias("parent_key"))
        .agg(F.count("*").alias("pn"))
        .orderBy(F.col("pn").desc(), F.col("parent_key").asc())
        .limit(3)
        .select("parent_key")
    )
    child = (
        o.join(
            F.broadcast(parents),
            o["o_orderpriority"] == parents["parent_key"],
            "inner",
        )
        .groupBy("parent_key", F.col("o_orderstatus").alias("child_key"))
        .agg(
            F.count("*").alias("doc_count"),
            dsum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )
    w = W.partitionBy("parent_key").orderBy(
        F.col("doc_count").desc(), F.col("child_key").asc()
    )
    return (
        child.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("parent_key", "child_key", "doc_count", "sum_price")
    )


@register(
    "dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {SHINGLE_CTE_SLICED},
    pairs AS MATERIALIZED (
      SELECT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, {JACCARD} AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      ) WHERE jaccard >= 0.7),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
    reach(src, dst) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
    comp AS (SELECT src AS node, MIN(dst) AS cid FROM reach GROUP BY src),
    lab AS (
      SELECT d.doc_id, d.lang, d.n_chars,
             COALESCE(c.cid, d.doc_id) AS cluster
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
      WHERE d.doc_id < {_DUP_SLICE})
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY cluster
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM lab) WHERE rn = 1
    """,
    doc="Near-dup curation APPLY step (operators/dedup.py::"
    "keep_best_per_cluster): cluster the verified MinHash pairs "
    "(components iterate on the edge list, never the corpus), keep the "
    "longest member per cluster (ties → smallest id), pass everything "
    "unclustered through. One LEFT join of corpus × node labels + one "
    "cluster-partitioned row_number window.",
    tags=("dedup", "graph", "pipeline"),
)
def dedup_keep_best(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < _DUP_SLICE)
    pairs = D.minhash_lsh_pairs(d, num_hashes=64, bands=32, threshold=0.7)
    return D.keep_best_per_cluster(d, pairs, "n_chars").select(
        "doc_id", "lang", "n_chars"
    )
