"""Unit tests for the analytics-catalog additions: connected
components, stratified sampling, and funnel shape invariants.

(The value-level correctness of every catalog entry is covered by the
DuckDB oracle harness in test_catalog_oracle.py; these tests pin the
operator semantics on constructed inputs where the answer is known by
hand.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from opensearch_dynamodb_etl_cdk_spark.operators.graph import (
    component_sizes,
    connected_components,
)
from opensearch_dynamodb_etl_cdk_spark.operators.sampling import (
    hash_bucket,
    stratified_sample,
)
from opensearch_dynamodb_etl_cdk_spark.plans.catalog import CATALOG


def test_connected_components_chain_and_island(spark):
    # chain 1-2-3-4 (diameter 3, needs >1 propagation round) + pair 10-11
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    got = {
        r["node"]: r["component_id"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    sizes = {
        r["component_id"]: r["n_members"]
        for r in component_sizes(connected_components(edges)).collect()
    }
    assert sizes == {1: 4, 10: 2}


def test_connected_components_merges_via_shared_node(spark):
    # two stars sharing node 5 → single component labeled by min id
    edges = spark.createDataFrame(
        [(5, 100), (5, 200), (7, 5), (300, 7)], ["id_a", "id_b"]
    )
    labels = connected_components(edges).collect()
    assert {r["component_id"] for r in labels} == {5}
    assert len(labels) == 5


def test_connected_components_long_chain_few_rounds(spark):
    """Adversarial diameter: a 256-node chain. Star contraction must
    converge within ~2·log2(n) alternating rounds (max_iter=12 here) —
    naive min-label propagation would need 255."""
    n = 256
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
    )
    got = {
        r["node"]: r["component_id"]
        for r in connected_components(edges, max_iter=12).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_connected_components_matches_union_find_on_random_graph(spark):
    import random

    rng = random.Random(7)
    n, m = 200, 150
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    seen = {x for ab in pairs for x in ab}
    # ground truth: min node id per component, over nodes in the edge list
    comp_min: dict[int, int] = {}
    for x in seen:
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    want = {x: comp_min[find(x)] for x in seen}

    edges = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {
        r["node"]: r["component_id"]
        for r in connected_components(edges).collect()
    }
    assert got == want


def test_connected_components_self_loops_and_isolated_pairs(spark):
    edges = spark.createDataFrame([(1, 1), (2, 3)], ["id_a", "id_b"])
    got = {
        r["node"]: r["component_id"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 2, 3: 2}


def test_stratified_sample_is_deterministic_and_respects_strata(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    strata = {"en": 25, "fr": 50}
    s1 = stratified_sample(d, strata, "lang")
    # deterministic: same rows on a different partitioning
    s2 = stratified_sample(d.repartition(7), strata, "lang")
    assert sorted(r["doc_id"] for r in s1.collect()) == sorted(
        r["doc_id"] for r in s2.collect()
    )
    # strata not in the map are dropped entirely (default_pct=0)
    assert s1.filter(~F.col("lang").isin(*strata)).count() == 0
    # every sampled row satisfies its stratum's bucket bound
    bad = s1.filter(
        ~(
            ((F.col("lang") == "en") & (hash_bucket(F.col("doc_id")) < 25))
            | ((F.col("lang") == "fr") & (hash_bucket(F.col("doc_id")) < 50))
        )
    )
    assert bad.count() == 0


def test_funnel_stages_monotonically_shrink(spark, sf_dir):
    rows = CATALOG["funnel_conversion"].fn(spark, sf_dir).collect()
    by_stage = {r["stage"]: r["users"] for r in rows}
    assert set(by_stage) == {"1_view", "2_click", "3_purchase"}
    assert by_stage["1_view"] >= by_stage["2_click"] >= by_stage["3_purchase"]
    assert by_stage["1_view"] > 0


def test_global_rank_and_ntile_match_window_functions(spark):
    """Two-phase range-partitioned rank/ntile ≡ the global-window SQL
    functions, including non-divisible totals and tie-break keys — and
    the physical plan contains no unpartitioned window."""
    import random

    from pyspark.sql import Window as W

    from opensearch_dynamodb_etl_cdk_spark.operators.ranking import (
        global_rank,
        ntile_ranked,
    )

    rng = random.Random(23)
    rows = [(i, rng.randint(0, 50) * 1.0) for i in range(1003)]  # 1003 % 4 != 0, ties
    df = spark.createDataFrame(rows, "id long, v double")

    w = W.orderBy("v", "id")
    want = {
        (r.id, r.rn, r.q)
        for r in df.select(
            "id",
            F.row_number().over(w).alias("rn"),
            F.ntile(4).over(w).alias("q"),
        ).collect()
    }
    ranked = global_rank(df, ["v", "id"], n_partitions=8, rank_col="rn")
    tiled = ntile_ranked(df, 4, ["v", "id"], n_partitions=8, bucket_col="q")
    got = {
        (a.id, a.rn, b.q)
        for a, b in zip(
            sorted(ranked.collect(), key=lambda r: r.id),
            sorted(tiled.collect(), key=lambda r: r.id),
        )
    }
    assert got == want

    plan = tiled._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "partitionBy" not in line:
            # Spark prints window specs as [... windowspecdefinition(pid, ...)]
            assert "__range_pid" in line or "windowspecdefinition" not in line


def test_ntile_fewer_rows_than_buckets(spark):
    from pyspark.sql import Window as W

    from opensearch_dynamodb_etl_cdk_spark.operators.ranking import ntile_ranked

    df = spark.createDataFrame([(1, 5.0), (2, 1.0)], "id long, v double")
    got = {
        (r.id, r.q)
        for r in ntile_ranked(df, 4, ["v", "id"], bucket_col="q").collect()
    }
    w = W.orderBy("v", "id")
    want = {
        (r.id, r.q)
        for r in df.select("id", F.ntile(4).over(w).alias("q")).collect()
    }
    assert got == want
