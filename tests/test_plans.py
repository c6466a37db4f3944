"""Physical-plan audits: the properties that make these queries viable
at 100 TB must be visible in the plan, not assumed — filter pushdown to
the parquet scan, column pruning, broadcast joins for dimensions,
TakeOrderedAndProject for top-k (no global sort), and whole-stage
codegen on the hot paths."""

from __future__ import annotations

import contextlib
import io

import pytest

from opensearch_dynamodb_etl_cdk_spark.plans.catalog import CATALOG


def plan_of(spark, sf_dir, name: str, mode: str = "formatted") -> str:
    df = CATALOG[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_term_filter_pushes_predicate_to_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "term_filter")
    assert "PushedFilters" in plan
    assert "c_mktsegment" in plan.split("PushedFilters")[1].splitlines()[0]


def test_q1_pushes_date_filter_and_prunes_columns(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    pushed = plan.split("PushedFilters")[1].splitlines()[0]
    assert "l_shipdate" in pushed
    # column pruning: the scan schema must not include unused columns
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_comment" not in read_schema and "l_shipmode" not in read_schema
    # partial aggregation: map-side partial + final after shuffle
    assert plan.count("HashAggregate") >= 2


def test_broadcast_dims_join_never_shuffles_fact(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_broadcast_dims")
    assert "BroadcastHashJoin" in plan
    # the only exchanges should be broadcast + the final agg shuffle —
    # no hash-partitioning of customer for the join itself
    join_section = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" not in plan


def test_sort_limit_is_topk_not_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "sort_limit_topk")
    assert "TakeOrderedAndProject" in plan


def test_q1_stays_in_wholestage_codegen(spark, sf_dir):
    # AQE prints isFinalPlan=false without codegen markers in simple
    # mode; the codegen explain enumerates the generated subtrees
    plan = plan_of(spark, sf_dir, "q1_pricing_summary", mode="codegen")
    assert "WholeStageCodegen" in plan


def test_semi_join_is_left_semi(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "semi_join_exists")
    assert "LeftSemi" in plan


def test_anti_join_is_left_anti(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "anti_join_not_exists")
    assert "LeftAnti" in plan


def test_no_cartesian_products_anywhere(spark, sf_dir):
    """CartesianProduct = unbounded row blowup at scale. The only
    intentional cross join (ann multiquery) must be broadcast-nested-loop
    with the tiny query side broadcast."""
    for name in CATALOG:
        plan = plan_of(spark, sf_dir, name, mode="simple")
        assert "CartesianProduct" not in plan, f"{name} has a cartesian product"


def test_ann_multiquery_broadcasts_queries(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "ann_multiquery_topk", mode="simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_windows_partition_by_key(spark, sf_dir):
    """No window in the catalog may run without a partition key (a
    global window serializes the whole dataset through one task)."""
    for name in ("top_hits_per_bucket", "window_rank_per_group",
                 "window_running_sum", "keyed_upsert_latest"):
        plan = plan_of(spark, sf_dir, name, mode="formatted")
        for line in plan.splitlines():
            if "partitionBy" in line.lower():
                continue
        # formatted explain prints Arguments for Window nodes; ensure
        # none declares an empty partition spec
        assert "windowspecdefinition()" not in plan.lower().replace(" ", "")


def test_exact_dedup_shuffles_hashes_not_documents(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "exact_dedup_groups", mode="formatted")
    # group key is the md5, and partial aggregation runs before the
    # exchange so full text never crosses the shuffle un-reduced
    assert plan.count("HashAggregate") >= 2
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "lang" not in read_schema  # pruned: only text + doc_id read


def test_ntile_has_no_global_window(spark, sf_dir):
    """The quartile plan's only Window operator is partitioned by the
    range-partition id — never an empty-partition (single-task) window."""
    plan = plan_of(spark, sf_dir, "ntile_quartiles")
    assert "Window" in plan
    for chunk in plan.split("Arguments")[1:]:
        head = chunk.splitlines()[0]
        if "windowspecdefinition" in head:
            assert "__range_pid" in head


def test_indexed_lsh_pushes_bucket_predicates_and_broadcasts(spark, sf_dir):
    """Materialized-index ANN: (table, bucket) equality pairs reach the
    index scan as pushed filters; candidate ids join the corpus via a
    broadcast join, never a corpus shuffle."""
    plan = plan_of(spark, sf_dir, "ann_lsh_indexed_topk")
    pushed = [
        seg.splitlines()[0] for seg in plan.split("PushedFilters")[1:]
    ]
    assert any("bucket" in p for p in pushed)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_indexed_ivf_prunes_cluster_partitions(spark, sf_dir):
    """IVF index is parquet partitioned by _cluster: probing 4 of 16
    cells must show as a partition filter (pruned scan), and candidates
    broadcast-join the corpus."""
    plan = plan_of(spark, sf_dir, "ann_ivf_indexed_topk")
    part = [seg.splitlines()[0] for seg in plan.split("PartitionFilters")[1:]]
    assert any("_cluster" in p for p in part)
    assert "BroadcastHashJoin" in plan


def test_nested_terms_agg_single_plan_partial_aggs(spark, sf_dir):
    """Nested terms→terms→metric: one plan with map-side partial
    aggregation and a broadcast semi-join on the selected parent keys —
    no per-bucket scans."""
    plan = plan_of(spark, sf_dir, "nested_terms_agg")
    assert plan.count("HashAggregate") >= 2
    assert "BroadcastHashJoin" in plan


def test_q10_topk_and_returnflag_pushdown(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q10_returned_items")
    assert "TakeOrderedAndProject" in plan  # LIMIT 20 is top-k, no global sort
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("l_returnflag" in l for l in pushed)  # filter reaches the scan


def test_q2_decorrelated_min_broadcasts_dims(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q2_min_cost_supplier", mode="simple")
    # region/nation/part ride broadcast joins; the correlated MIN is an
    # aggregate joined back, never a per-row subquery re-execution
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q17_threshold_is_broadcast_not_subquery(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q17_small_quantity_revenue", mode="simple")
    # the per-part 0.2×avg threshold joins in as a broadcast frame
    assert "BroadcastHashJoin" in plan
    pushed = [l for l in plan_of(spark, sf_dir, "q17_small_quantity_revenue").splitlines()
              if "PushedFilters" in l]
    assert any("p_brand" in l for l in pushed)  # part filter at the scan


def test_q21_exists_pair_pushes_status_filter(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q21_waiting_supplier")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    # the finished-orders filter reaches every orders scan
    assert any("o_orderstatus" in l for l in pushed)
    # EXISTS/NOT EXISTS decorrelation: aggregates + joins, no per-row
    # subquery nodes survive in the physical plan
    assert "Subquery" not in plan or "SubqueryBroadcast" in plan


def test_decontamination_broadcasts_benchmark_grams(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "decontamination_report")
    # the benchmark gram set must broadcast: the corpus side never
    # shuffles for the membership probe
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # the only shuffles are the per-doc count groupBys + benchmark distinct
    assert "CartesianProduct" not in plan


def test_composite_page_filters_after_groupby(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "composite_agg_page", mode="extended")
    # keyset cursor applies to the aggregated buckets (post-groupBy HAVING
    # shape), and the page is a top-k, never a global sort + offset
    assert "TakeOrderedAndProject" in plan
    assert "Offset" not in plan


def test_extended_stats_single_aggregation_pass(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "extended_stats_agg")
    # one partial + one final aggregate — all eight metrics in a single
    # pass, no per-metric scans (formatted mode prints each node twice:
    # once in the tree, once in the detail section)
    assert plan.count("Scan parquet") == 2
    assert plan.count("HashAggregate") == 4


def test_rare_terms_is_ascending_topk(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "rare_terms_agg")
    assert "TakeOrderedAndProject" in plan


def test_pii_report_is_single_pass_no_join(spark, sf_dir):
    # the scrub is a projection + one aggregation: no joins, no extra
    # scans — a 100 TB corpus pays exactly one pass
    plan = plan_of(spark, sf_dir, "pii_scrub_report")
    assert "Join" not in plan
    # exactly one scan in the plan tree (formatted mode repeats each
    # node once in the tree and once in the detail section)
    assert plan.split("(1)")[0].count("Scan parquet") == 1
    assert plan.count("HashAggregate") >= 2  # map-side partial + final


def test_mixture_resample_broadcasts_thresholds(spark, sf_dir):
    # per-group thresholds (tiny) broadcast onto the corpus; the corpus
    # itself must not be hash-partitioned for the membership join
    plan = plan_of(spark, sf_dir, "mixture_resample_counts")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sequence_packing_single_stream_window(spark, sf_dir):
    # one window keyed by the stream column computes the running offset;
    # no unpartitioned window anywhere in the plan
    plan = plan_of(spark, sf_dir, "sequence_packing_report")
    assert "partitionBy" not in plan  # formatted mode spells windows as
    # Window [..], [lang], [doc_id ASC ...] — assert the stream key is
    # the window partition spec instead
    assert "[lang#" in plan or "[lang]" in plan


def test_moving_fn_windows_over_reduced_histogram(spark, sf_dir):
    # the unpartitioned window is fed by the per-day aggregate (one row
    # per day), never the raw events: the aggregate must appear BELOW
    # the window in the plan tree
    plan = plan_of(spark, sf_dir, "moving_fn_serial_diff_agg", mode="simple")
    win_pos = plan.index("Window")
    agg_pos = plan.rindex("HashAggregate")
    assert agg_pos > win_pos  # explain prints leaves last: agg below window


def test_bm25_broadcasts_stats_and_takes_ordered(spark, sf_dir):
    """BM25: the one-row corpus-stats aggregate joins back as a
    broadcast; top-k is TakeOrderedAndProject, never a corpus sort."""
    plan = plan_of(spark, sf_dir, "bm25_ranked_search", mode="simple")
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan
    # no full Sort node anywhere (top-k must stay TakeOrderedAndProject;
    # 'Sort [' is how a real sort renders in simple mode)
    assert "Sort [" not in plan


def test_knn_dsl_pushes_prefilter_no_shuffle(spark, sf_dir):
    """knn: the efficient pre-filter reaches the parquet scan; the
    corpus never shuffles; top-k is TakeOrderedAndProject."""
    plan = plan_of(spark, sf_dir, "knn_search_dsl")
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(label,1)" in plan.split("PushedFilters")[1].splitlines()[0]
    assert "TakeOrderedAndProject" in plan
    # no shuffle of any kind ('hashpartitioning' renders in the formatted
    # details section; simple mode double-checked below)
    assert "hashpartitioning" not in plan
    assert "Exchange hashpartitioning" not in plan_of(
        spark, sf_dir, "knn_search_dsl", mode="simple")


def test_term_suggester_partial_aggregates_vocab(spark, sf_dir):
    """Term suggester: vocabulary counts partial-aggregate map-side
    (two HashAggregates around one exchange); candidate ranking is a
    bounded top-k."""
    plan = plan_of(spark, sf_dir, "term_suggester")
    assert plan.count("HashAggregate") >= 2
    assert "TakeOrderedAndProject" in plan


def test_percolate_single_pass_no_join(spark, sf_dir):
    """Percolator: the whole stored-query registry evaluates in one
    projection — no joins of any kind in the plan."""
    plan = plan_of(spark, sf_dir, "percolate_counts")
    for op in ("Join", "CartesianProduct"):
        assert op not in plan


def test_repeated_ngram_shuffles_hashes_only(spark, sf_dir):
    """Repeated n-gram report: the gram shuffle carries xxhash64 keys,
    never document text (no 'text' column past the first projection)."""
    plan = plan_of(spark, sf_dir, "repeated_ngram_report", mode="simple")
    assert "xxhash64" in plan
    exchanges = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert exchanges, "expected gram/doc shuffles"
    assert all("text" not in l for l in exchanges)


def test_span_near_no_shuffle_no_explode(spark, sf_dir):
    """span_near: positional quantifiers stay row-local expressions —
    no Exchange, no Generate (explode) anywhere in the filter plan."""
    plan = plan_of(spark, sf_dir, "span_near_search", mode="simple")
    before_agg = plan.split("HashAggregate")[-1]  # below the count agg
    assert "Generate" not in before_agg
    # only the parallelizing round-robin repartition may appear — the
    # span predicate itself must never induce a key shuffle
    exchanges = [l for l in before_agg.splitlines() if "Exchange" in l]
    assert all("RoundRobinPartitioning" in l for l in exchanges)


def test_weighted_sample_is_topk_not_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "weighted_sample_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan  # no corpus shuffle


def test_geo_queries_are_single_pass_no_shuffle(spark, sf_dir):
    # geo_distance / bbox compile to filters over one projection: the
    # only exchange allowed is the final TakeOrdered/agg, never a join
    plan = plan_of(spark, sf_dir, "geo_distance_search")
    assert "Join" not in plan and "CartesianProduct" not in plan
    plan = plan_of(spark, sf_dir, "geo_bbox_nearest")
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan


def test_function_score_is_one_projection_no_join(spark, sf_dir):
    # functions fold as an array-of-structs expression: no join, no
    # extra scan — a single Filter+Project over orders plus the final
    # round projection
    plan = plan_of(spark, sf_dir, "function_score_dsl_search")
    assert "Join" not in plan
    assert plan_of(spark, sf_dir, "function_score_dsl_search",
                   mode="simple").count("FileScan") == 1
    pushed = plan.split("PushedFilters")[1].splitlines()[0]
    assert "o_totalprice" in pushed  # inner query still pushes


def test_nested_query_never_explodes(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "nested_query_search")
    assert "Generate" not in plan  # explode would appear as Generate
    assert "Join" not in plan


def test_match_phrase_prefix_no_shuffle_no_explode(spark, sf_dir):
    """The positional phrase-prefix predicate is one codegen filter over
    the scan — no Exchange, no Generate (explode), pushable column read."""
    plan = plan_of(spark, sf_dir, "match_phrase_prefix_search")
    assert "Generate" not in plan
    assert "Exchange" not in plan


def test_intervals_no_shuffle_no_explode(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "intervals_search")
    assert "Generate" not in plan
    assert "Exchange" not in plan


def test_distance_feature_is_topk_no_shuffle_scan(spark, sf_dir):
    """Scoring projection + TakeOrderedAndProject: the decay score never
    forces a global sort or an aggregation pass over the events table."""
    plan = plan_of(spark, sf_dir, "distance_feature_ranked")
    assert "TakeOrderedAndProject" in plan
    assert "HashAggregate" not in plan


def test_rank_feature_is_topk_with_pruned_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "rank_feature_ranked")
    assert "TakeOrderedAndProject" in plan
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "text" not in read_schema  # only doc_id + n_chars are read


def test_matrix_stats_single_aggregation_pass(spark, sf_dir):
    """All Σx/Σx²/Σxy moments in ONE two-phase aggregate — exactly one
    shuffle (partial → final), never a pass per moment or field pair."""
    plan = plan_of(spark, sf_dir, "matrix_stats_agg")
    # formatted mode names each node twice (tree + detail): count headers
    assert plan.count("Exchange (") == 1
    assert plan.count("HashAggregate (") == 2


def test_docvalue_fields_prune_to_scan(spark, sf_dir):
    """docvalue_fields response shaping must reach the parquet scan as
    column pruning: requesting 2 fields from documents reads 2 columns."""
    import contextlib
    import io

    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        execute_search,
    )
    from opensearch_dynamodb_etl_cdk_spark.session import load_tables

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    hits = execute_search(d, {
        "query": {"term": {"lang": "en"}},
        "docvalue_fields": ["doc_id", "lang"],
    })["hits"]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        hits.explain(mode="formatted")
    plan = buf.getvalue()
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "text" not in read_schema and "n_chars" not in read_schema


def test_temperature_resample_broadcasts_thresholds(spark, sf_dir):
    # same contract as mixture_resample: per-group keep-rate thresholds
    # (25 rows) broadcast onto the corpus — the corpus never shuffles
    # for membership
    plan = plan_of(spark, sf_dir, "temperature_mixture_counts")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ppl_stats_partial_aggregation(spark, sf_dir):
    # PPL stats..by compiles to the standard two-phase hash aggregate
    # (map-side partial before the exchange), same as a hand-written
    # groupBy — the pipe syntax must not cost a plan shape
    plan = plan_of(spark, sf_dir, "ppl_stats_by_priority")
    assert plan.count("HashAggregate") >= 2
    assert "Scan parquet" in plan


def test_ppl_lookup_is_broadcast(spark, sf_dir):
    # the lookup command is an enrich join: dimension side broadcast,
    # fact side never exchange-partitioned for the join
    plan = plan_of(spark, sf_dir, "ppl_lookup_nation")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_document_chunks_map_only(spark, sf_dir):
    # chunking is tokenize→window→explode: a single map-only stage,
    # NO Exchange anywhere in the plan
    plan = plan_of(spark, sf_dir, "document_chunks")
    assert "Exchange" not in plan
    assert "Generate" in plan  # the explode


def test_bpe_word_counts_partial_aggregation(spark, sf_dir):
    # the trainer's corpus pass: explode + two-phase hash aggregate
    # (map-side combine shrinks the shuffle to distinct pretokens)
    plan = plan_of(spark, sf_dir, "bpe_word_counts")
    assert plan.count("HashAggregate") >= 2
    assert "Generate" in plan


def test_has_child_semi_join_pushdown(spark, sf_dir):
    # the inner child query must push into the scan; the parent/child
    # correlation is ONE left-semi join
    plan = plan_of(spark, sf_dir, "has_child_search")
    assert "LeftSemi" in plan
    assert "GreaterThanOrEqual(l_quantity,50" in plan


def test_post_filter_pushes_both_predicates(spark, sf_dir):
    # hits job: query AND post_filter reach the scan; no shuffle at all
    plan = plan_of(spark, sf_dir, "post_filter_search")
    pushed = plan.split("PushedFilters")[1].splitlines()[0]
    assert "c_acctbal" in pushed and "c_mktsegment" in pushed
    assert "Exchange" not in plan


def test_quality_classifier_scoring_is_map_only(spark, sf_dir):
    # sigmoid(margin) over the feature triple: one projection, zero
    # shuffle — the corpus-quality filter costs a column scan at 100 TB
    plan = plan_of(spark, sf_dir, "quality_classifier_scores")
    assert "Exchange" not in plan
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "source" not in read_schema  # unused columns pruned


def test_categorize_text_single_shuffle_partial_agg(spark, sf_dir):
    # the pattern-key groupBy must shuffle |patterns| keys once, with a
    # map-side partial aggregate — never documents
    import contextlib
    import io

    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    key = F.array_join(
        F.filter(F.split(F.col("text"), r"[^A-Za-z]+"), lambda t: t != ""),
        " ",
    )
    agg = d.groupBy(key.alias("key")).agg(F.count("*").alias("n"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        agg.explain(mode="formatted")
    plan = buf.getvalue()
    # tree occurrence only ("Exchange (n)"); the node-detail section
    # prints each operator a second time
    assert plan.count("Exchange (") == 1
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_grid_cells_aggregate_with_one_exchange(spark, sf_dir):
    import contextlib
    import io

    from pyspark.sql import functions as F

    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        geotile_cell,
        hexgrid_cell,
    )

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    lat = ((F.col("c_custkey") * 7919) % 18000) / 100.0 - 90.0
    lon = ((F.col("c_custkey") * 104729) % 36000) / 100.0 - 180.0
    pts = c.select(F.struct(lat.alias("lat"), lon.alias("lon"))
                   .alias("location"))
    for cell in (geotile_cell("location", 5), hexgrid_cell("location", 5)):
        agg = pts.groupBy(cell.alias("key")).agg(F.count("*").alias("n"))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            agg.explain(mode="formatted")
        plan = buf.getvalue()
        assert plan.count("Exchange (") == 1  # |cells| keys, one shuffle
        assert plan.count("HashAggregate") >= 2


def test_geo_line_is_take_ordered(spark, sf_dir):
    # the geo_line collect is orderBy+limit = TakeOrderedAndProject:
    # per-task bounded heaps, never a global sort
    import contextlib
    import io

    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = e.select("ts", "value").orderBy(
        F.col("ts").asc(), F.col("value").asc()).limit(51)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pts.explain(mode="formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan  # no global sort operator


def test_binary_hamming_is_take_ordered_no_shuffle(spark, sf_dir):
    # both phases are TakeOrdered (shortlist by hamming, re-rank by
    # cosine over ≤ candidates rows); no Exchange anywhere
    plan = plan_of(spark, sf_dir, "ann_binary_hamming_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange (" not in plan


def test_approx_cardinality_error_bound_and_determinism(spark, sf_dir):
    """Defining invariant of the rows-only approx_cardinality_agg
    entry: the HLL++ estimate is deterministic for a given dataset and
    lands within the configured 2% relative-error band (generous 3x
    slack: the rsd is a standard deviation, not a hard bound)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    both = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    )
    rows = {r["l_returnflag"]: r for r in both.collect()}
    assert rows
    for r in rows.values():
        assert abs(r["approx"] - r["exact"]) <= max(1, 0.06 * r["exact"])
    again = {
        r["l_returnflag"]: r["approx"]
        for r in li.groupBy("l_returnflag").agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx")
        ).collect()
    }
    assert again == {k: r["approx"] for k, r in rows.items()}


def test_approx_percentile_rank_bound_and_determinism(spark, sf_dir):
    """Defining invariant of the rows-only approx_percentile_agg entry:
    with accuracy 10000 and per-group sizes below it, the sketch
    answer IS the exact nearest-rank percentile — an element of the
    group, no farther than one rank from the interpolated exact value
    — and re-running is bit-identical."""
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    sizes = {r["event_type"]: r["n"] for r in
             e.groupBy("event_type").count().withColumnRenamed(
                 "count", "n").collect()}
    assert all(n < 10000 for n in sizes.values())

    def run():
        return {
            r["event_type"]: (r["p50"], r["p95"])
            for r in e.groupBy("event_type").agg(
                F.percentile_approx("value", 0.5, 10000).alias("p50"),
                F.percentile_approx("value", 0.95, 10000).alias("p95"),
            ).collect()
        }

    got = run()
    assert got == run()  # deterministic
    # membership + rank check per group, driver-side over modest groups
    for et, (p50, p95) in got.items():
        grp = sorted(
            r["value"] for r in
            e.filter(F.col("event_type") == et).select("value").collect()
        )
        assert p50 in grp and p95 in grp  # nearest-rank: real elements
        import bisect

        n = len(grp)
        for p, v in ((0.5, p50), (0.95, p95)):
            lo = bisect.bisect_left(grp, v)
            hi = bisect.bisect_right(grp, v) - 1
            target = p * (n - 1)
            assert lo - 1 <= target <= hi + 1  # within one rank
