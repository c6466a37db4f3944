"""Round-4 DSL long-tail tests: positional queries (span_or/first/not,
intervals, match_phrase_prefix), term-centric multi-field matching
(combined_fields), scoring queries (pinned, distance_feature,
rank_feature), and the remaining aggregation families
(auto_date_histogram, sampler/diversified_sampler, string_stats,
median_absolute_deviation, boxplot, matrix_stats, scripted_metric,
global, nested/reverse_nested).

Every assertion is a DataFrame recomputation or hand-computed closed
form over a small in-memory frame — the same strategy as
tests/test_search_dsl.py (SURVEY §5)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opensearch_dynamodb_etl_cdk_spark.operators.search import (
    compile_query,
    execute_search,
)


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.createDataFrame(
        [
            (1, "spark merge batch window sort", 10.0, "2024-01-01 00:00:10"),
            (2, "merge spark window batch", 3.0, "2024-01-01 05:00:00"),
            (3, "table scan only", 0.5, "2024-01-03 00:00:00"),
            (4, "spa cial prefix spar", 7.0, "2024-02-01 00:00:00"),
        ],
        "id long, text string, feat double, ts string",
    ).withColumn("_id", F.col("id").cast("string")).withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def nested_docs(spark):
    df = spark.createDataFrame(
        [
            (1, 1.0, [{"k": "x", "v": 1.0}, {"k": "y", "v": 3.0}]),
            (2, 2.0, [{"k": "x", "v": 5.0}]),
            (3, 3.0, []),
            (4, 4.0, [{"k": "z", "v": 2.0}]),
        ],
        "id long, x double, items array<struct<k:string,v:double>>",
    ).cache()
    df.count()
    return df


def _ids(df, q):
    return sorted(r.id for r in df.filter(compile_query(q)).collect())


# ---------------------------------------------------------------- queries


def test_match_phrase_prefix(docs):
    assert _ids(docs, {"match_phrase_prefix": {"text": "spark mer"}}) == [1]
    # single-term form: any token carrying the prefix
    assert _ids(docs, {"match_phrase_prefix": {"text": "spar"}}) == [1, 2, 4]
    # phrase longer than the document never matches (sequence guard)
    assert _ids(
        docs,
        {"match_phrase_prefix": {"text": "table scan only and much more"}},
    ) == []


def test_combined_fields_term_centric(docs):
    # OR (default): any term in any field
    assert _ids(
        docs, {"combined_fields": {"query": "spark scan", "fields": ["text"]}}
    ) == [1, 2, 3]
    # AND: every term must appear in at least one field
    assert _ids(
        docs,
        {"combined_fields": {
            "query": "spark scan", "fields": ["text"], "operator": "and"
        }},
    ) == []
    # minimum_should_match with multiple fields and boost suffix
    assert _ids(
        docs,
        {"combined_fields": {
            "query": "spark scan window",
            "fields": ["text^2"],
            "minimum_should_match": 2,
        }},
    ) == [1, 2]


def test_intervals_match_ordered_gaps(docs):
    q = {"intervals": {"text": {"match": {
        "query": "spark batch", "ordered": True, "max_gaps": 1}}}}
    assert _ids(docs, q) == [1, 2]
    # order violated in both docs containing the terms
    assert _ids(docs, {"intervals": {"text": {"match": {
        "query": "batch spark", "ordered": True}}}}) == []
    # unbounded gaps, unordered → any positions
    assert _ids(docs, {"intervals": {"text": {"match": {
        "query": "sort spark"}}}}) == [1]


def test_intervals_any_of_all_of(docs):
    assert _ids(docs, {"intervals": {"text": {"any_of": {"intervals": [
        {"match": {"query": "sort"}}, {"match": {"query": "only"}},
    ]}}}}) == [1, 3]
    assert _ids(docs, {"intervals": {"text": {"all_of": {"intervals": [
        {"match": {"query": "spark"}}, {"match": {"query": "sort"}},
    ]}}}}) == [1]
    # constrained all_of over single-term sub-intervals = span_near
    assert _ids(docs, {"intervals": {"text": {"all_of": {
        "ordered": True, "max_gaps": 0,
        "intervals": [{"match": {"query": "spark"}},
                      {"match": {"query": "merge"}}],
    }}}}) == [1]
    # constrained all_of over multi-term sub-intervals is rejected
    with pytest.raises(ValueError):
        compile_query({"intervals": {"text": {"all_of": {
            "ordered": True,
            "intervals": [{"match": {"query": "spark merge"}}],
        }}}})


def test_span_or_first_not(docs):
    assert _ids(docs, {"span_or": {"clauses": [
        {"span_term": {"text": "sort"}}, {"span_term": {"text": "only"}},
    ]}}) == [1, 3]
    # merge at position 1 only in doc 2
    assert _ids(docs, {"span_first": {
        "match": {"span_term": {"text": "merge"}}, "end": 1}}) == [2]
    # span_near wrapped in span_first: spark..window span ends ≤ 3
    assert _ids(docs, {"span_first": {
        "match": {"span_near": {
            "clauses": [{"span_term": {"text": "spark"}},
                        {"span_term": {"text": "window"}}],
            "slop": 5, "in_order": True}},
        "end": 3}}) == [2]
    # span_not: include positions minus exclude positions
    assert _ids(docs, {"span_not": {
        "include": {"span_term": {"text": "spark"}},
        "exclude": {"span_term": {"text": "spark"}}}}) == []
    assert _ids(docs, {"span_not": {
        "include": {"span_or": {"clauses": [
            {"span_term": {"text": "merge"}},
            {"span_term": {"text": "only"}}]}},
        "exclude": {"span_term": {"text": "table"}}}}) == [1, 2, 3]


def test_pinned_ranking(docs):
    # filter face: union of ids and organic matches
    assert _ids(docs, {"pinned": {
        "ids": ["3"], "organic": {"match": {"text": "spark"}}}}) == [1, 2, 3]
    # ranking: pinned ids first, in list order, then organic
    res = execute_search(docs, {"query": {"pinned": {
        "ids": ["3", "2"], "organic": {"match": {"text": "spark"}}}},
        "size": 3})
    got = [r.id for r in res["hits"].collect()]
    assert got[:2] == [3, 2]
    assert set(got) == {3, 2, 1}


def test_rank_feature_scoring(docs):
    res = execute_search(docs, {"query": {"rank_feature": {
        "field": "feat", "saturation": {"pivot": 5.0}}}, "size": 2})
    rows = res["hits"].select("id", "_score").collect()
    assert [r.id for r in rows] == [1, 4]
    assert abs(rows[0]["_score"] - 10.0 / 15.0) < 1e-12
    # log and sigmoid variants
    res = execute_search(docs, {"query": {"rank_feature": {
        "field": "feat", "log": {"scaling_factor": 1.0}}}, "size": 1})
    assert abs(res["hits"].collect()[0]["_score"] - math.log(11.0)) < 1e-12
    res = execute_search(docs, {"query": {"rank_feature": {
        "field": "feat", "sigmoid": {"pivot": 5.0, "exponent": 2.0}}},
        "size": 1})
    assert abs(res["hits"].collect()[0]["_score"] - 100.0 / 125.0) < 1e-12
    with pytest.raises(ValueError):
        execute_search(docs, {"query": {"rank_feature": {"field": "feat"}}})


def test_distance_feature_scoring(docs):
    res = execute_search(docs, {"query": {"distance_feature": {
        "field": "ts", "origin": "2024-01-01 00:00:10", "pivot": "7d"}},
        "size": 4})
    rows = res["hits"].select("id", "_score").collect()
    assert [r.id for r in rows] == [1, 2, 3, 4]
    assert abs(rows[0]["_score"] - 1.0) < 1e-12  # zero distance
    # 2024-01-03: distance = 2d − 10s from origin
    pivot_us = 7 * 86400e6
    dist_us = (2 * 86400 - 10) * 1e6
    assert abs(rows[2]["_score"] - pivot_us / (pivot_us + dist_us)) < 1e-12


def test_distance_feature_geo(spark):
    pts = spark.createDataFrame(
        [(1, (0.0, 0.0)), (2, (0.0, 90.0)), (3, None)],
        "id long, loc struct<lat:double,lon:double>",
    )
    res = execute_search(pts, {"query": {"distance_feature": {
        "field": "loc", "origin": {"lat": 0.0, "lon": 0.0},
        "pivot": "1000km"}}})
    rows = {r.id: r["_score"] for r in res["hits"].collect()}
    assert 3 not in rows  # null field filtered
    assert abs(rows[1] - 1.0) < 1e-12
    assert rows[2] < 0.1  # quarter of the equator away


# ------------------------------------------------------------------ aggs


def _agg(df, name, spec, query=None):
    body = {"aggs": {name: spec}}
    if query:
        body["query"] = query
    return execute_search(df, body)["aggregations"][name]


def test_global_agg_escapes_query(docs):
    r = _agg(docs, "g", {"global": {}, "aggs": {
        "mx": {"max": {"field": "feat"}}}}, query={"term": {"id": 1}})
    assert r["doc_count"] == 4
    assert r["mx"]["value"] == 10.0


def test_auto_date_histogram_ladder(docs):
    # 31-day span: hour rungs overshoot until the target admits them
    assert _agg(docs, "a", {"auto_date_histogram": {
        "field": "ts", "buckets": 800}})["interval"] == "1h"
    r = _agg(docs, "a", {"auto_date_histogram": {
        "field": "ts", "buckets": 35}})
    assert r["interval"] == "day"
    assert [b["doc_count"] for b in r["buckets"]] == [2, 1, 1]
    assert _agg(docs, "a", {"auto_date_histogram": {
        "field": "ts", "buckets": 2}})["interval"] == "month"


def test_sampler_and_diversified(docs):
    r = _agg(docs, "s", {"sampler": {"shard_size": 2},
                         "aggs": {"mx": {"max": {"field": "feat"}}}})
    assert r["doc_count"] == 2 and "mx" in r
    # per-value cap of 1 over a unique field keeps everything
    r = _agg(docs, "d", {"diversified_sampler": {
        "shard_size": 10, "field": "text", "max_docs_per_value": 1}})
    assert r["doc_count"] == 4
    # cap of 1 over a constant field keeps exactly one
    one = docs.withColumn("k", F.lit("same"))
    r = _agg(one, "d", {"diversified_sampler": {
        "shard_size": 10, "field": "k", "max_docs_per_value": 1}})
    assert r["doc_count"] == 1


def test_string_stats_entropy(spark):
    df = spark.createDataFrame(
        [("aa",), ("bbbb",), ("cc",), ("d",)], "s string"
    )
    r = _agg(df, "ss", {"string_stats": {"field": "s"}})
    assert r["count"] == 4
    assert r["min_length"] == 1 and r["max_length"] == 4
    assert abs(r["avg_length"] - 9 / 4) < 1e-12
    expected = -sum((n / 9) * math.log2(n / 9) for n in (2, 4, 2, 1))
    assert abs(r["entropy"] - expected) < 1e-12


def test_median_absolute_deviation_exact(docs):
    # feat = 0.5, 3, 7, 10 → median 5, |x−5| = 4.5, 2, 2, 5 → MAD 3.25
    r = _agg(docs, "mad", {"median_absolute_deviation": {"field": "feat"}})
    assert abs(r["value"] - 3.25) < 1e-12


def test_boxplot_exact_quartiles(docs):
    r = _agg(docs, "bp", {"boxplot": {"field": "feat"}})
    assert r["min"] == 0.5 and r["max"] == 10.0
    assert abs(r["q2"] - 5.0) < 1e-12
    assert abs(r["q1"] - (0.5 + 0.75 * 2.5)) < 1e-12


def test_percentile_family_approx_mode(spark):
    """`"approx": true` selects the bounded-memory sketch path for
    percentiles / median_absolute_deviation / boxplot. The sketch is
    nearest-rank, so pin values where interpolation is a no-op (odd
    count, quartiles on elements): 1..5."""
    df = spark.createDataFrame([(float(i),) for i in range(1, 6)],
                               "v double")
    r = _agg(df, "bp", {"boxplot": {"field": "v", "approx": True}})
    assert (r["q1"], r["q2"], r["q3"]) == (2.0, 3.0, 4.0)
    assert r["min"] == 1.0 and r["max"] == 5.0
    # MAD of 1..5: median 3, |x-3| = 2,1,0,1,2 → median 1 (odd again)
    r = _agg(df, "mad", {"median_absolute_deviation": {
        "field": "v", "approx": True}})
    assert r["value"] == 1.0
    r = _agg(df, "p", {"percentiles": {
        "field": "v", "percents": [25, 50, 75], "approx": True}})
    assert list(r["value"]) == [2.0, 3.0, 4.0]


def test_percentiles_approx_plan_is_sketch_only(spark):
    """Plan audit for the scale selector: the grouped approx
    percentiles agg compiles to approx_percentile with NO exact
    (full-value-per-group) percentile aggregate anywhere."""
    import re as _re

    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        _metric_agg,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0)], "k string, v double"
    )
    col = _metric_agg("p", {"percentiles": {"field": "v",
                                            "percents": [50],
                                            "approx": True}})
    out = df.groupBy("k").agg(col)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert _re.search(r"approx_percentile|percentile_approx", plan)
    assert not _re.search(r"(?<!approx_)percentile\(", plan)


def test_matrix_stats_moments(spark):
    xs, ys = [1.0, 2.0, 3.0, 4.0], [2.0, 4.0, 6.5, 7.5]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    r = _agg(df, "ms", {"matrix_stats": {"fields": ["x", "y"]}})
    n = 4
    mx, my = sum(xs) / n, sum(ys) / n
    vx = sum((a - mx) ** 2 for a in xs) / n
    vy = sum((a - my) ** 2 for a in ys) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(xs, ys)) / n
    assert r["doc_count"] == n
    assert abs(r["fields"]["x"]["variance"] - vx) < 1e-9
    assert abs(r["fields"]["x"]["covariance"]["y"] - cov) < 1e-9
    assert abs(
        r["fields"]["y"]["correlation"]["x"] - cov / (vx * vy) ** 0.5
    ) < 1e-9
    # symmetric lookups resolve regardless of field order
    assert abs(
        r["fields"]["x"]["covariance"]["y"] - r["fields"]["y"]["covariance"]["x"]
    ) < 1e-12


def test_scripted_metric_restricted(docs):
    r = _agg(docs, "sm", {"scripted_metric": {
        "map_script": "feat * 2",
        "reduce_script": "params.states_sum / params.states_count"}})
    assert abs(r["value"] - (0.5 + 3 + 7 + 10) * 2 / 4) < 1e-12
    # JVM escape hatches stay rejected in map_script
    with pytest.raises(PermissionError):
        _agg(docs, "sm", {"scripted_metric": {
            "map_script": "reflect('java.lang.System', 'exit', 0)"}})


def test_nested_and_reverse_nested(nested_docs):
    r = _agg(nested_docs, "n", {"nested": {"path": "items"}, "aggs": {
        "sv": {"sum": {"field": "items.v"}},
        "back": {"reverse_nested": {},
                 "aggs": {"sx": {"sum": {"field": "x"}}}},
    }})
    assert r["doc_count"] == 4  # total elements across docs
    assert abs(r["sv"]["value"] - 11.0) < 1e-12
    # three docs have ≥1 element; their x sum = 1+2+4
    assert r["back"]["doc_count"] == 3
    assert abs(r["back"]["sx"]["value"] - 7.0) < 1e-12
    with pytest.raises(ValueError):
        _agg(nested_docs, "r", {"reverse_nested": {}})


def test_top_metrics_argmax_and_topk(docs):
    r = _agg(docs, "t", {"top_metrics": {
        "metrics": {"field": "feat"},
        "sort": [{"ts": {"order": "desc"}}]}})
    assert r["top"][0]["metrics"]["feat"] == 7.0  # latest ts is doc 4
    r = _agg(docs, "t", {"top_metrics": {
        "metrics": [{"field": "feat"}],
        "sort": {"feat": {"order": "asc"}}, "size": 2}})
    assert [x["metrics"]["feat"] for x in r["top"]] == [0.5, 3.0]


def test_geo_bounds_and_centroid(spark):
    pts = spark.createDataFrame(
        [(1, (10.0, 20.0)), (2, (-5.0, 40.0)), (3, (2.5, -30.0)), (4, None)],
        "id long, loc struct<lat:double,lon:double>",
    )
    r = _agg(pts, "b", {"geo_bounds": {"field": "loc"}})
    assert r["bounds"]["top_left"] == {"lat": 10.0, "lon": -30.0}
    assert r["bounds"]["bottom_right"] == {"lat": -5.0, "lon": 40.0}
    r = _agg(pts, "c", {"geo_centroid": {"field": "loc"}})
    assert r["count"] == 3
    assert abs(r["location"]["lat"] - 7.5 / 3) < 1e-12
    assert abs(r["location"]["lon"] - 10.0) < 1e-12
    empty = pts.filter("id > 99")
    assert _agg(empty, "b", {"geo_bounds": {"field": "loc"}})["bounds"] is None
    assert _agg(empty, "c", {"geo_centroid": {"field": "loc"}})["count"] == 0


def test_cumulative_cardinality_first_seen(spark):
    e = spark.createDataFrame(
        [("2024-01-01 01:00:00", 1), ("2024-01-01 02:00:00", 2),
         ("2024-01-02 01:00:00", 1),  # returning user: not re-counted
         ("2024-01-02 02:00:00", 3), ("2024-01-03 01:00:00", 1)],
        "ts string, uid long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = _agg(e, "d", {
        "date_histogram": {"field": "ts", "calendar_interval": "day"},
        "aggs": {"cu": {"cumulative_cardinality": {"field": "uid"}}},
    })
    assert [b["cu"]["value"] for b in r["buckets"]] == [2, 3, 3]
    assert [b["doc_count"] for b in r["buckets"]] == [2, 2, 1]


def test_terms_agg_order_include_missing_min_doc_count(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0), ("c", 1.0), (None, 5.0)],
        "k string, v double",
    )
    # order by metric desc: b (10) before a (3) before c/missing
    r = _agg(df, "t", {
        "terms": {"field": "k", "order": {"s": "desc"}, "missing": "unk"},
        "aggs": {"s": {"sum": {"field": "v"}}}})
    assert [b["key"] for b in r["buckets"]] == ["b", "unk", "a", "c"]
    # _key ascending
    r = _agg(df, "t", {"terms": {"field": "k", "order": {"_key": "asc"}}})
    assert [b["key"] for b in r["buckets"]][:2] == ["a", "b"]
    # include regex + min_doc_count
    r = _agg(df, "t", {"terms": {"field": "k", "include": "a|b",
                                 "min_doc_count": 2}})
    assert [b["key"] for b in r["buckets"]] == ["a"]
    # exclude list
    r = _agg(df, "t", {"terms": {"field": "k", "exclude": ["a"]}})
    assert "a" not in [b["key"] for b in r["buckets"]]
    with pytest.raises(ValueError):
        _agg(df, "t", {"terms": {"field": "k", "order": {"nope": "desc"}}})


def test_completion_suggester(docs):
    res = execute_search(docs, {"suggest": {"c": {
        "prefix": "sp",
        "completion": {"field": "text", "size": 3},
    }}})
    # whole-value completion: only doc 4's text starts with 'sp'... no —
    # docs 1 and 4 both start with 'sp'
    opts = res["suggest"]["c"][0]["options"]
    assert [o["text"] for o in opts] == [
        "spa cial prefix spar", "spark merge batch window sort"
    ]
    assert all(o["freq"] == 1 for o in opts)
    # empty prefix → most frequent values, size-bounded
    res = execute_search(docs, {"suggest": {"c": {
        "prefix": "", "completion": {"field": "text", "size": 2}}}})
    assert len(res["suggest"]["c"][0]["options"]) == 2


def test_case_insensitive_term_prefix_wildcard_regexp(spark):
    df = spark.createDataFrame(
        [(1, "Spark"), (2, "SPARK"), (3, "spar"), (4, "other")],
        "id long, s string",
    )
    assert _ids(df, {"term": {"s": {"value": "spark",
                                    "case_insensitive": True}}}) == [1, 2]
    assert _ids(df, {"term": {"s": {"value": "spark"}}}) == []
    assert _ids(df, {"prefix": {"s": {"value": "sp",
                                      "case_insensitive": True}}}) == [1, 2, 3]
    assert _ids(df, {"wildcard": {"s": {"value": "s*k",
                                        "case_insensitive": True}}}) == [1, 2]
    assert _ids(df, {"regexp": {"s": {"value": "spar.?",
                                      "case_insensitive": True}}}) == [1, 2, 3]
    assert _ids(df, {"regexp": {"s": {"value": "spar.?"}}}) == [3]


def test_fields_response_option(docs):
    res = execute_search(docs, {
        "query": {"term": {"id": 1}},
        "fields": ["text", {"field": "feat"}],
    })
    assert set(res["hits"].columns) == {"text", "feat", "_id"}


def test_match_with_fuzziness(docs):
    # "spak" within 1 edit of "spark"; "windov" within 1 of "window"
    assert _ids(docs, {"match": {"text": {
        "query": "spak windov", "operator": "and",
        "fuzziness": 1}}}) == [1, 2]
    # AUTO: "spak" (4 chars → budget 1) matches; short "sp" (budget 0) not
    assert _ids(docs, {"match": {"text": {
        "query": "spak", "fuzziness": "AUTO"}}}) == [1, 2, 4]
    assert _ids(docs, {"match": {"text": {
        "query": "sp", "fuzziness": "AUTO"}}}) == []
    # fuzziness 0 behaves exactly like plain match
    assert _ids(docs, {"match": {"text": {
        "query": "spark", "fuzziness": 0}}}) == _ids(
        docs, {"match": {"text": "spark"}})


def test_multi_match_types(spark):
    df = spark.createDataFrame(
        [(1, "spark merge engine", "other"),
         (2, "other", "spark merge engine"),
         (3, "merge spark", "nothing"),
         (4, "spar king", "nothing")],
        "id long, a string, b string",
    )
    # phrase: adjacent in ANY field
    assert _ids(df, {"multi_match": {
        "query": "spark merge", "fields": ["a", "b"],
        "type": "phrase"}}) == [1, 2]
    # phrase_prefix: last term a prefix
    assert _ids(df, {"multi_match": {
        "query": "spar", "fields": ["a", "b"],
        "type": "phrase_prefix"}}) == [1, 2, 3, 4]
    # cross_fields + and: each term in any field
    assert _ids(df, {"multi_match": {
        "query": "spark nothing", "fields": ["a", "b"],
        "type": "cross_fields", "operator": "and"}}) == [3]
    with pytest.raises(ValueError):
        compile_query({"multi_match": {
            "query": "x", "fields": ["a"], "type": "bool_prefix_wrong"}})


def test_matrix_stats_listwise_deletion(spark):
    """Documents missing ANY listed field are excluded entirely (the
    public matrix_stats contract) — moments never mix per-field null
    subsets."""
    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, None), (None, 6.0), (3.0, 4.0)],
        "x double, y double",
    )
    r = _agg(df, "ms", {"matrix_stats": {"fields": ["x", "y"]}})
    # only (1,2) and (3,4) are complete → n=2, perfectly correlated
    assert r["doc_count"] == 2
    assert r["fields"]["x"]["count"] == 2
    assert abs(r["fields"]["x"]["mean"] - 2.0) < 1e-12
    assert abs(r["fields"]["y"]["mean"] - 3.0) < 1e-12
    assert abs(r["fields"]["x"]["variance"] - 1.0) < 1e-12
    assert abs(r["fields"]["x"]["covariance"]["y"] - 1.0) < 1e-12
    assert abs(r["fields"]["x"]["correlation"]["y"] - 1.0) < 1e-12


def test_multi_match_forwards_fuzziness(spark):
    df = spark.createDataFrame(
        [(1, "spark mergw", "other"), (2, "other", "nothing spark"),
         (3, "zzz", "yyy")],
        "id long, a string, b string",
    )
    # fuzziness reaches the per-field match: "merge" ~1~ "mergw"
    assert _ids(df, {"multi_match": {
        "query": "spark merge", "fields": ["a", "b"],
        "operator": "and", "fuzziness": 1}}) == [1]
    # without fuzziness the misspelling does NOT match
    assert _ids(df, {"multi_match": {
        "query": "spark merge", "fields": ["a", "b"],
        "operator": "and"}}) == []
    # unsupported options raise instead of silently degrading
    # (tie_breaker moved to the known set in r6 — score-only, inert in
    # filter context; the scored track_scores path honors it)
    with pytest.raises(ValueError):
        compile_query({"multi_match": {
            "query": "x", "fields": ["a"], "zero_terms_query": "all"}})
    # fuzziness is invalid with phrase types (public API rejects it)
    with pytest.raises(ValueError):
        compile_query({"multi_match": {
            "query": "x y", "fields": ["a"], "type": "phrase",
            "fuzziness": 1}})


def test_match_english_light_analyzer(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        _analyze_text_en,
    )

    df = spark.createDataFrame(
        [(1, "the dogs bark loudly"), (2, "a dog barks"),
         (3, "glass classes"), (4, "cactus status")],
        "id long, text string",
    )
    # plural stem unifies dogs/dog and bark/barks
    assert _ids(df, {"match": {"text": {
        "query": "dog bark", "operator": "and",
        "analyzer": "english_light"}}}) == [1, 2]
    # standard analyzer does NOT
    assert _ids(df, {"match": {"text": {
        "query": "dog bark", "operator": "and"}}}) == []
    # stopwords are dropped from the query: "the dog" matches doc 2
    assert _ids(df, {"match": {"text": {
        "query": "the dog", "analyzer": "english_light"}}}) == [1, 2]
    # ss/us endings never stripped
    assert _analyze_text_en("glass cactus classes dogs") == [
        "glass", "cactus", "classe", "dog"]
    assert _ids(df, {"match": {"text": {
        "query": "glass", "analyzer": "english_light"}}}) == [3]
    assert _ids(df, {"match": {"text": {
        "query": "cactus", "analyzer": "english_light"}}}) == [4]
    # a stopword-only query degrades to match-all, like the public
    # analyzer chain emitting zero tokens
    assert _ids(df, {"match": {"text": {
        "query": "the an of", "analyzer": "english_light"}}}) == [1, 2, 3, 4]
    with pytest.raises(ValueError):
        compile_query({"match": {"text": {
            "query": "x", "analyzer": "icu_fancy"}}})


def test_range_date_math(spark):
    import datetime as dt

    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        _resolve_date_math,
    )

    now = dt.datetime(2024, 3, 15, 13, 45, 30)
    # offsets without rounding keep the operator
    assert _resolve_date_math("now-7d", "gte", now) == (
        "gte", dt.datetime(2024, 3, 8, 13, 45, 30))
    assert _resolve_date_math("now+2h", "lt", now) == (
        "lt", dt.datetime(2024, 3, 15, 15, 45, 30))
    # calendar month arithmetic clamps the day
    assert _resolve_date_math("2024-01-31||+1M", "gte", now) == (
        "gte", dt.datetime(2024, 2, 29))
    # rounding: gte/lt floor; gt/lte become next-unit-start exclusive
    assert _resolve_date_math("now/d", "gte", now) == (
        "gte", dt.datetime(2024, 3, 15))
    assert _resolve_date_math("now/d", "lt", now) == (
        "lt", dt.datetime(2024, 3, 15))
    assert _resolve_date_math("now/d", "lte", now) == (
        "lt", dt.datetime(2024, 3, 16))
    assert _resolve_date_math("now/d", "gt", now) == (
        "gte", dt.datetime(2024, 3, 16))
    assert _resolve_date_math("now/M", "gte", now) == (
        "gte", dt.datetime(2024, 3, 1))
    assert _resolve_date_math("now-1y/y", "lte", now) == (
        "lt", dt.datetime(2024, 1, 1))
    # week floors to Monday (2024-03-15 is a Friday)
    assert _resolve_date_math("now/w", "gte", now) == (
        "gte", dt.datetime(2024, 3, 11))
    with pytest.raises(ValueError):
        _resolve_date_math("nowish-1d", "gte", now)

    # end-to-end: predicate over a timestamp frame
    df = spark.createDataFrame(
        [(1, "2024-03-10 12:00:00"), (2, "2024-03-14 00:00:00"),
         (3, "2024-03-15 23:59:59"), (4, "2024-03-16 00:00:00")],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    hits = df.filter(compile_query({"range": {"ts": {
        "gte": "now-2d/d", "lte": "now/d",
        "now": "2024-03-15T13:45:30",
    }}}))
    assert sorted(r["id"] for r in hits.collect()) == [2, 3]


def test_sort_missing_and_fuzzy_prefix_length(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        execute_search,
    )

    df = spark.createDataFrame(
        [(1, 5.0, "spark"), (2, None, "spavk"), (3, 1.0, "quark")],
        "id long, v double, w string",
    )
    # default missing=_last for BOTH directions (public contract)
    hits = execute_search(df, {"sort": [{"v": {"order": "asc"}}]})["hits"]
    assert [r["id"] for r in hits.collect()] == [3, 1, 2]
    hits = execute_search(df, {"sort": [{"v": {"order": "desc"}}]})["hits"]
    assert [r["id"] for r in hits.collect()] == [1, 3, 2]
    # missing=_first overrides
    hits = execute_search(df, {"sort": [
        {"v": {"order": "asc", "missing": "_first"}}]})["hits"]
    assert [r["id"] for r in hits.collect()] == [2, 3, 1]

    # fuzzy prefix_length: spavk ~1~ spark shares 'spa'; quark does not
    assert sorted(r["id"] for r in df.filter(compile_query(
        {"fuzzy": {"w": {"value": "spark", "fuzziness": 1}}}
    )).collect()) == [1, 2]
    assert sorted(r["id"] for r in df.filter(compile_query(
        {"fuzzy": {"w": {"value": "spark", "fuzziness": 1,
                         "prefix_length": 3}}}
    )).collect()) == [1, 2]
    # quark is 1 edit away but fails prefix_length=1 ('q' != 's')
    assert sorted(r["id"] for r in df.filter(compile_query(
        {"fuzzy": {"w": {"value": "quark", "fuzziness": 1,
                         "prefix_length": 1}}}
    )).collect()) == [3]
    assert sorted(r["id"] for r in df.filter(compile_query(
        {"fuzzy": {"w": {"value": "quark", "fuzziness": 2}}}
    )).collect()) == [1, 3]  # spark ~2~ quark without the prefix gate
    assert sorted(r["id"] for r in df.filter(compile_query(
        {"fuzzy": {"w": {"value": "quark", "fuzziness": 2,
                         "prefix_length": 1}}}
    )).collect()) == [3]  # ...and the prefix gate still excludes it


def test_date_histogram_offset_and_time_zone(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        execute_search,
    )

    df = spark.createDataFrame(
        [(1, "2024-01-01 03:00:00"), (2, "2024-01-01 07:00:00"),
         (3, "2024-01-02 05:00:00"), (4, "2024-01-02 23:30:00")],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    def buckets(body):
        res = execute_search(df, {"size": 0, "aggs": {"h": body}})
        return [(str(b["key"]), b["doc_count"])
                for b in res["aggregations"]["h"]["buckets"]]

    # offset +6h: day buckets start at 06:00 — 03:00 belongs to the
    # PREVIOUS day's bucket (2023-12-31 06:00)
    got = buckets({"date_histogram": {
        "field": "ts", "calendar_interval": "day", "offset": "+6h"}})
    assert got == [
        ("2023-12-31 06:00:00", 1),
        ("2024-01-01 06:00:00", 2),
        ("2024-01-02 06:00:00", 1),
    ]
    # negative offset shifts the other way
    got = buckets({"date_histogram": {
        "field": "ts", "fixed_interval": "1d", "offset": "-4h"}})
    assert got[0][0] == "2023-12-31 20:00:00"
    # time_zone +05:30: 23:30 UTC rolls into the NEXT local day
    got = buckets({"date_histogram": {
        "field": "ts", "calendar_interval": "day",
        "time_zone": "+05:30"}})
    assert got == [
        ("2024-01-01 00:00:00", 2),
        ("2024-01-02 00:00:00", 1),
        ("2024-01-03 00:00:00", 1),
    ]
    # a named zone resolves through the JVM tz database
    got = buckets({"date_histogram": {
        "field": "ts", "calendar_interval": "day",
        "time_zone": "America/New_York"}})
    assert got == [
        ("2023-12-31 00:00:00", 1),
        ("2024-01-01 00:00:00", 1),
        ("2024-01-02 00:00:00", 2),
    ]


def test_retriever_envelope(docs):
    # standard retriever = plain query
    res = execute_search(docs, {"retriever": {"standard": {
        "query": {"match": {"text": "spark"}}}}, "size": 5})
    assert sorted(r.id for r in res["hits"].collect()) == [1, 2]
    # rrf retriever fuses two scored children
    res = execute_search(docs, {"retriever": {"rrf": {
        "retrievers": [
            {"standard": {"query": {"rank_feature": {
                "field": "feat", "saturation": {"pivot": 5.0}}}}},
            {"standard": {"query": {"distance_feature": {
                "field": "ts", "origin": "2024-01-01 00:00:10",
                "pivot": "7d"}}}},
        ],
        "rank_constant": 60, "rank_window_size": 10,
    }}, "size": 4})
    rows = res["hits"].select("id", "_score", "text").collect()
    assert len(rows) == 4
    # doc 1: rank 1 on feat (10.0) and rank 1 on recency → top fused
    assert rows[0]["id"] == 1
    assert abs(rows[0]["_score"] - 2 / 61) < 1e-9
    assert rows[0]["text"] is not None  # full documents joined back
    with pytest.raises(ValueError):
        execute_search(docs, {"retriever": {"rrf": {
            "retrievers": [{"standard": {"query": {"match_all": {}}}}]}}})
    with pytest.raises(ValueError):
        execute_search(docs, {"retriever": {"rrf": {"retrievers": [
            {"standard": {"query": {"match_all": {}}}},
            {"standard": {"query": {"term": {"text": "x"}}}},
        ]}}})  # unscored children rejected
    with pytest.raises(ValueError):
        execute_search(docs, {"retriever": {"splines": {}}})


def test_retriever_knn(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        execute_search,
    )

    df = spark.createDataFrame(
        [("1", [1.0, 0.0]), ("2", [0.9, 0.1]), ("3", [0.0, 1.0])],
        "_id string, embedding array<double>",
    )
    res = execute_search(df, {"retriever": {"knn": {
        "field": "embedding", "query_vector": [1.0, 0.0], "k": 2}}})
    got = [r["_id"] for r in res["hits"].collect()]
    assert got == ["1", "2"]
    assert "_score" in res["hits"].columns


def test_geo_polygon_ray_casting(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0),      # center: inside the diamond
         (2, 25.0, 0.1),     # near the top vertex: inside
         (3, 29.0, 40.0),    # upper-right, outside the slanted edge
         (4, -31.0, 0.0),    # below the bottom vertex
         (5, 0.0, 59.0)],    # just inside the right vertex
        "id long, lat double, lon double",
    ).select("id", F.struct("lat", "lon").alias("location"))
    q = {"geo_polygon": {"location": {"points": [
        {"lat": 30.0, "lon": 0.0}, {"lat": 0.0, "lon": 60.0},
        {"lat": -30.0, "lon": 0.0}, {"lat": 0.0, "lon": -60.0},
    ]}}}
    assert sorted(r.id for r in df.filter(compile_query(q)).collect()) \
        == [1, 2, 5]
    with pytest.raises(ValueError):
        compile_query({"geo_polygon": {"location": {"points": [
            {"lat": 0, "lon": 0}, {"lat": 1, "lon": 1}]}}})


def test_span_within_containing(docs):
    # doc1: "spark merge batch window sort" — 'batch' lies inside the
    # spark..sort span; doc2: "merge spark window batch" — 'batch' is
    # OUTSIDE the spark..window span
    within = {"span_within": {
        "little": {"span_term": {"text": "batch"}},
        "big": {"span_near": {
            "clauses": [{"span_term": {"text": "spark"}},
                        {"span_term": {"text": "sort"}}],
            "slop": 5, "in_order": True}},
    }}
    assert _ids(docs, within) == [1]
    # span_containing in filter context = same document predicate
    containing = {"span_containing": {
        "little": {"span_term": {"text": "batch"}},
        "big": within["span_within"]["big"]}}
    assert _ids(docs, containing) == [1]
    # big window that does not cover the little term
    assert _ids(docs, {"span_within": {
        "little": {"span_term": {"text": "batch"}},
        "big": {"span_near": {
            "clauses": [{"span_term": {"text": "merge"}},
                        {"span_term": {"text": "spark"}}],
            "slop": 0, "in_order": True}},
    }}) == []
    # span_term big: little must share the (width-1) position — i.e.
    # only when little == big term positions overlap
    assert _ids(docs, {"span_within": {
        "little": {"span_term": {"text": "spark"}},
        "big": {"span_term": {"text": "spark"}}}}) == [1, 2]
    with pytest.raises(ValueError):
        compile_query({"span_within": {
            "little": {"span_term": {"text": "x"}},
            "big": {"match": {"text": "y"}}}})


def test_span_multi(docs):
    # standalone: prefix over analyzed tokens — 'spar' hits spark/spar
    assert _ids(docs, {"span_multi": {"match": {
        "prefix": {"text": {"value": "spar"}}}}}) == [1, 2, 4]
    assert _ids(docs, {"span_multi": {"match": {
        "wildcard": {"text": "w*dow"}}}}) == [1, 2]
    assert _ids(docs, {"span_multi": {"match": {
        "fuzzy": {"text": {"value": "scam", "fuzziness": 1}}}}}) == [3]
    # inside span_near: prefix clause + exact clause with positions
    assert _ids(docs, {"span_near": {
        "clauses": [
            {"span_multi": {"match": {"prefix": {"text": {
                "value": "spar"}}}}},
            {"span_term": {"text": "merge"}},
        ],
        "slop": 0, "in_order": True}}) == [1]  # "spark merge" adjacent
    assert _ids(docs, {"span_near": {
        "clauses": [
            {"span_term": {"text": "merge"}},
            {"span_multi": {"match": {"wildcard": {"text": "sp?rk"}}}},
        ],
        "slop": 0, "in_order": True}}) == [2]  # "merge spark"
    with pytest.raises(ValueError):
        compile_query({"span_multi": {"match": {"term": {"text": "x"}}}})


def test_date_histogram_zero_fill(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        execute_search,
    )

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 5.0), (2, "2024-01-04 00:00:00", 7.0)],
        "id long, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    def buckets(body):
        res = execute_search(df, {"size": 0, "aggs": {"h": body}})
        return [(str(b["key"]), b["doc_count"],
                 b.get("s", {}).get("value"))
                for b in res["aggregations"]["h"]["buckets"]]

    # default: gaps are absent
    got = buckets({"date_histogram": {"field": "ts",
                                      "calendar_interval": "day"}})
    assert [g[0] for g in got] == ["2024-01-01 00:00:00",
                                   "2024-01-04 00:00:00"]
    # min_doc_count=0 zero-fills the Jan 2 and Jan 3 gap, null metrics
    got = buckets({
        "date_histogram": {"field": "ts", "calendar_interval": "day",
                           "min_doc_count": 0},
        "aggs": {"s": {"sum": {"field": "v"}}},
    })
    assert [(g[0], g[1]) for g in got] == [
        ("2024-01-01 00:00:00", 1), ("2024-01-02 00:00:00", 0),
        ("2024-01-03 00:00:00", 0), ("2024-01-04 00:00:00", 1)]
    assert got[0][2] == 5.0 and got[1][2] is None
    # extended_bounds widens beyond the data
    got = buckets({"date_histogram": {
        "field": "ts", "fixed_interval": "1d", "min_doc_count": 0,
        "extended_bounds": {"min": "2023-12-30T00:00:00",
                            "max": "2024-01-05T00:00:00"}}})
    assert got[0][0] == "2023-12-30 00:00:00"
    assert got[-1][0] == "2024-01-05 00:00:00"
    assert len(got) == 7
    assert sum(g[1] for g in got) == 2


def test_significant_terms_heuristics(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        significant_terms_frame,
    )

    fg = spark.createDataFrame(
        [("hot",)] * 8 + [("common",)] * 2, "k string")
    bg = spark.createDataFrame(
        [("hot",)] * 10 + [("common",)] * 90, "k string")
    for h in ("jlh", "chi_square", "mutual_information"):
        rows = significant_terms_frame(fg, bg, "k", heuristic=h).collect()
        # 'hot' is over-represented (80% fg vs 10% bg) under every
        # heuristic; 'common' (20% vs 90%) never surfaces
        assert rows[0]["key"] == "hot"
        assert all(r["key"] != "common" for r in rows)
        assert rows[0]["score"] > 0
    # hand-checked values
    jlh = significant_terms_frame(fg, bg, "k", heuristic="jlh").collect()[0]
    assert abs(jlh["score"] - (0.8 - 0.1) * (0.8 / 0.1)) < 1e-9
    chi = significant_terms_frame(
        fg, bg, "k", heuristic="chi_square").collect()[0]
    assert abs(chi["score"] - (0.7 * 0.7 / 0.1)) < 1e-9
    import math

    mi = significant_terms_frame(
        fg, bg, "k", heuristic="mutual_information").collect()[0]
    assert abs(mi["score"] - 0.8 * math.log(8.0)) < 1e-9
    with pytest.raises(ValueError):
        significant_terms_frame(fg, bg, "k", heuristic="gnd").collect()


def test_numeric_histogram_zero_fill(docs):
    res = execute_search(docs, {"size": 0, "aggs": {"h": {
        "histogram": {"field": "feat", "interval": 2.0,
                      "min_doc_count": 0}}}})
    got = [(b["key"], b["doc_count"])
           for b in res["aggregations"]["h"]["buckets"]]
    # feat values 10, 3, 0.5, 7 → buckets 0,2,6,10 with 4,8 zero-filled
    assert got == [(0.0, 1), (2.0, 1), (4.0, 0), (6.0, 1), (8.0, 0),
                   (10.0, 1)]
    res = execute_search(docs, {"size": 0, "aggs": {"h": {
        "histogram": {"field": "feat", "interval": 5.0,
                      "min_doc_count": 0,
                      "extended_bounds": {"min": -5, "max": 15}}}}})
    got = [(b["key"], b["doc_count"])
           for b in res["aggregations"]["h"]["buckets"]]
    assert got == [(-5.0, 0), (0.0, 2), (5.0, 1), (10.0, 1), (15.0, 0)]


def test_rate_agg_under_date_histogram(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        execute_search,
    )

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 24.0), (2, "2024-01-01 12:00:00", 24.0),
         (3, "2024-02-15 00:00:00", 29.0)],
        "id long, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    res = execute_search(df, {"size": 0, "aggs": {"h": {
        "date_histogram": {"field": "ts", "calendar_interval": "month"},
        "aggs": {
            "per_day": {"rate": {"field": "v", "unit": "day"}},
            "docs_per_day": {"rate": {"unit": "day"}},
            "raw": {"rate": {"field": "v"}},
        }}}})
    b = res["aggregations"]["h"]["buckets"]
    # January: Σv=48 over a 31-day bucket; February 2024: 29 days
    assert abs(b[0]["per_day"]["value"] - 48.0 / 31) < 1e-12
    assert abs(b[1]["per_day"]["value"] - 29.0 / 29) < 1e-12
    assert abs(b[0]["docs_per_day"]["value"] - 2.0 / 31) < 1e-12
    assert b[0]["raw"]["value"] == 48.0  # no unit → per bucket
    with pytest.raises(ValueError):
        execute_search(df, {"size": 0, "aggs": {"h": {
            "date_histogram": {"field": "ts",
                               "calendar_interval": "month"},
            "aggs": {"r": {"rate": {"unit": "fortnight"}}}}}})


def test_date_histogram_offset_with_zero_fill(spark):
    """offset shifts bucket boundaries; zero-fill must stride the SAME
    shifted grid (r5 advisor: keys were generated on the un-offset grid,
    so every real bucket was replaced by a doc_count-0 one)."""
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        execute_search,
    )

    df = spark.createDataFrame(
        [(1, "2024-01-01 07:00:00"), (2, "2024-01-01 05:00:00"),
         (3, "2024-01-03 12:00:00")],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    def buckets(body):
        res = execute_search(df, {"size": 0, "aggs": {"h": body}})
        return [(str(b["key"]), b["doc_count"])
                for b in res["aggregations"]["h"]["buckets"]]

    # fixed_interval + offset + min_doc_count:0 — the advisor's repro
    got = buckets({"date_histogram": {
        "field": "ts", "fixed_interval": "1d", "offset": "+6h",
        "min_doc_count": 0}})
    assert got == [
        ("2023-12-31 06:00:00", 1),   # 05:00 doc: before the 06:00 edge
        ("2024-01-01 06:00:00", 1),   # 07:00 doc
        ("2024-01-02 06:00:00", 0),   # zero-filled gap
        ("2024-01-03 06:00:00", 1),
    ]
    # calendar interval + negative offset + extended_bounds
    got = buckets({"date_histogram": {
        "field": "ts", "calendar_interval": "day", "offset": "-6h",
        "min_doc_count": 0,
        "extended_bounds": {"min": "2023-12-31T00:00:00",
                            "max": "2024-01-04T00:00:00"}}})
    assert [g[0] for g in got] == [
        "2023-12-30 18:00:00", "2023-12-31 18:00:00",
        "2024-01-01 18:00:00", "2024-01-02 18:00:00",
        "2024-01-03 18:00:00"]
    # both Jan 1 docs fall in [Dec 31 18:00, Jan 1 18:00); the Dec 30
    # 18:00 bucket exists only because extended_bounds.min floors to it
    assert [g[1] for g in got] == [0, 2, 0, 1, 0]
    assert sum(g[1] for g in got) == 3  # no real bucket dropped


def test_numeric_histogram_zero_fill_fractional_interval(docs):
    """Non-integer interval: bucket matching is by integer stride index,
    never float ==, so last-ulp drift can't swallow a real bucket."""
    res = execute_search(docs, {"size": 0, "aggs": {"h": {
        "histogram": {"field": "feat", "interval": 0.7,
                      "min_doc_count": 0}}}})
    got = [(b["key"], b["doc_count"])
           for b in res["aggregations"]["h"]["buckets"]]
    # feat 0.5, 3, 7, 10 → indices 0, 4, 10, 14 of the 0.7 stride
    assert sum(c for _, c in got) == 4          # every real doc kept
    assert len(got) == 15                       # indices 0..14 inclusive
    nonzero = [i for i, (_, c) in enumerate(got) if c]
    assert nonzero == [0, 4, 10, 14]


def test_range_string_bound_starting_with_now(spark):
    """A keyword bound that merely starts with 'now' ('nowhere') is a
    plain lexical comparison, not a date-math parse error."""
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        compile_query,
    )

    df = spark.createDataFrame(
        [("here",), ("nowhere",), ("zulu",)], "w string")
    pred = compile_query({"range": {"w": {"gte": "nowhere"}}})
    got = sorted(r["w"] for r in df.filter(pred).collect())
    assert got == ["nowhere", "zulu"]
    # genuine date math still resolves
    import datetime as dt

    op, val = __import__(
        "opensearch_dynamodb_etl_cdk_spark.operators.search",
        fromlist=["_resolve_date_math"],
    )._resolve_date_math("now-1d/d", "gte", dt.datetime(2024, 1, 15, 13))
    assert (op, val) == ("gte", dt.datetime(2024, 1, 14))


def test_significant_terms_predicate_single_scan(spark):
    """foreground-as-Column: the single-scan conditional-agg plan must
    return exactly the two-frame join's rows, for every heuristic."""
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        significant_terms_frame,
    )

    bg = spark.createDataFrame(
        [("hot", 1)] * 8 + [("common", 1)] * 2
        + [("hot", 0)] * 2 + [("common", 0)] * 88 + [(None, 1)],
        "k string, flag int",
    )
    pred = F.col("flag") == 1
    for h in ("jlh", "chi_square", "mutual_information"):
        two = significant_terms_frame(
            bg.filter(pred), bg, "k", heuristic=h).collect()
        one = significant_terms_frame(pred, bg, "k", heuristic=h).collect()
        assert [tuple(r) for r in one] == [tuple(r) for r in two]
    assert significant_terms_frame(pred, bg, "k").collect()[0]["key"] == "hot"


def test_nested_query_inner_hits(nested_docs):
    res = execute_search(nested_docs, {"query": {"nested": {
        "path": "items",
        "query": {"range": {"items.v": {"gte": 3.0}}},
        "inner_hits": {},
    }}})
    assert sorted(r.id for r in res["hits"].collect()) == [1, 2]
    inner = {r["id"]: r["items"] for r in
             res["inner_hits"]["items"].collect()}
    # only the elements that satisfied the inner query survive
    assert [(e["k"], e["v"]) for e in inner[1]] == [("y", 3.0)]
    assert [(e["k"], e["v"]) for e in inner[2]] == [("x", 5.0)]
    # size bounds the matched elements; custom name keys the frame
    res = execute_search(nested_docs, {"query": {"nested": {
        "path": "items",
        "query": {"exists": {"field": "items.k"}},
        "inner_hits": {"name": "els", "size": 1},
    }}})
    inner = {r["id"]: r["items"] for r in
             res["inner_hits"]["els"].collect()}
    assert all(len(v) == 1 for v in inner.values())
    # no inner_hits key unless requested
    res = execute_search(nested_docs, {"query": {"nested": {
        "path": "items", "query": {"exists": {"field": "items.k"}}}}})
    assert "inner_hits" not in res


def test_geohash_grid_agg(spark):
    df = spark.createDataFrame(
        [(1, 42.605, -5.603), (2, 57.64911, 10.40744), (3, 42.6, -5.6)],
        "id long, lat double, lon double",
    ).select("id", F.struct("lat", "lon").alias("loc"))
    res = execute_search(df, {"size": 0, "aggs": {"g": {
        "geohash_grid": {"field": "loc", "precision": 5}}}})
    got = sorted((b["key"], b["doc_count"])
                 for b in res["aggregations"]["g"]["buckets"])
    # canonical vectors: (42.605,-5.603)→ezs42, (57.64911,10.40744)→u4pru
    assert got == [("ezs42", 2), ("u4pru", 1)]
    res = execute_search(df, {"size": 0, "aggs": {"g": {
        "geohash_grid": {"field": "loc", "precision": 11}}}})
    keys = {b["key"] for b in res["aggregations"]["g"]["buckets"]}
    assert "u4pruydqqvj" in keys  # the textbook full-precision vector
    with pytest.raises(ValueError):
        execute_search(df, {"size": 0, "aggs": {"g": {
            "geohash_grid": {"field": "loc", "precision": 13}}}})


def test_ip_range_agg(spark):
    df = spark.createDataFrame(
        [("10.0.0.1", 1.0), ("10.0.0.5", 2.0), ("10.0.0.200", 4.0),
         ("192.168.1.1", 8.0)],
        "ip string, v double",
    )
    res = execute_search(df, {"size": 0, "aggs": {"r": {
        "ip_range": {"field": "ip", "ranges": [
            {"to": "10.0.0.5"},
            {"from": "10.0.0.5"},
            {"mask": "10.0.0.0/24", "key": "tennet"},
        ]},
        "aggs": {"sv": {"sum": {"field": "v"}}}}}})
    b = res["aggregations"]["r"]["buckets"]
    # from inclusive, to exclusive; mask spans the whole /24
    assert [(x["key"], x["doc_count"], x["sv"]["value"]) for x in b] == [
        ("*-10.0.0.5", 1, 1.0),
        ("10.0.0.5-*", 3, 14.0),
        ("tennet", 3, 7.0),
    ]
    assert b[0]["to"] == "10.0.0.5" and b[1]["from"] == "10.0.0.5"
    with pytest.raises(ValueError, match="IPv4"):
        execute_search(df, {"size": 0, "aggs": {"r": {
            "ip_range": {"field": "ip",
                         "ranges": [{"from": "::1"}]}}}})


def test_sibling_percentiles_and_extended_stats_bucket(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), ("c", 2.0)],
        "k string, v double",
    )
    res = execute_search(df, {"size": 0, "aggs": {
        "per_k": {"terms": {"field": "k", "size": 10,
                            "order": {"_key": "asc"}},
                  "aggs": {"sv": {"sum": {"field": "v"}}}},
        "pcts": {"percentiles_bucket": {"buckets_path": "per_k>sv",
                                        "percents": [0.0, 50.0, 100.0]}},
        "xs": {"extended_stats_bucket": {"buckets_path": "per_k>sv"}},
    }})
    # per-k sums: a=4, b=10, c=2 → sorted [2, 4, 10]
    p = res["aggregations"]["pcts"]["values"]
    assert p["0.0"] == 2.0 and p["50.0"] == 4.0 and p["100.0"] == 10.0
    xs = res["aggregations"]["xs"]
    assert xs["count"] == 3 and xs["sum"] == 16.0
    assert xs["avg"] == pytest.approx(16.0 / 3)
    assert xs["sum_of_squares"] == 4.0 + 100.0 + 16.0
    var = (120.0 / 3) - (16.0 / 3) ** 2
    assert xs["variance"] == pytest.approx(var)
    assert xs["std_deviation"] == pytest.approx(var ** 0.5)


def test_normalize_pipeline_agg(spark):
    df = spark.createDataFrame(
        [("a", 2.0), ("a", 2.0), ("b", 6.0), ("c", 12.0)],
        "k string, v double",
    )
    body = {"size": 0, "aggs": {"per_k": {
        "terms": {"field": "k", "size": 10, "order": {"_key": "asc"}},
        "aggs": {
            "sv": {"sum": {"field": "v"}},
            "pct": {"normalize": {"buckets_path": "sv",
                                  "method": "percent_of_sum"}},
            "r01": {"normalize": {"buckets_path": "sv",
                                  "method": "rescale_0_1"}},
            "z": {"normalize": {"buckets_path": "sv",
                                "method": "z-score"}},
        }}}}
    res = execute_search(df, body)
    b = res["aggregations"]["per_k"]["buckets"]
    # sums: a=4, b=6, c=12 (total 22)
    assert [x["pct"]["value"] for x in b] == pytest.approx(
        [4 / 22, 6 / 22, 12 / 22])
    assert [x["r01"]["value"] for x in b] == pytest.approx(
        [0.0, 2 / 8, 1.0])
    import statistics
    mean, sd = 22 / 3, statistics.pstdev([4.0, 6.0, 12.0])
    assert [x["z"]["value"] for x in b] == pytest.approx(
        [(4 - mean) / sd, (6 - mean) / sd, (12 - mean) / sd])
    # softmax sums to 1 across buckets
    res = execute_search(df, {"size": 0, "aggs": {"per_k": {
        "terms": {"field": "k", "size": 10},
        "aggs": {"sv": {"sum": {"field": "v"}},
                 "sm": {"normalize": {"buckets_path": "sv",
                                      "method": "softmax"}}}}}})
    sm = [x["sm"]["value"]
          for x in res["aggregations"]["per_k"]["buckets"]]
    assert sum(sm) == pytest.approx(1.0)
    with pytest.raises(ValueError, match="normalize method"):
        execute_search(df, {"size": 0, "aggs": {"per_k": {
            "terms": {"field": "k"},
            "aggs": {"sv": {"sum": {"field": "v"}},
                     "bad": {"normalize": {"buckets_path": "sv",
                                           "method": "minmax"}}}}}})


def test_hybrid_query_normalization_and_combination(spark):
    df = spark.createDataFrame(
        [("1", "spark merge", 10.0), ("2", "spark window", 5.0),
         ("3", "table scan", 20.0), ("4", "spark spark", 0.0)],
        "_id string, text string, feat double",
    ).cache()
    df.count()
    # sub-query A: rank_feature saturation pivot 10 → feat/(feat+10)
    # sub-query B: filter clause (constant 1.0 for docs 1,2,4; min_max
    # maps an all-equal distribution to 1.0)
    body = {"query": {"hybrid": {"queries": [
        {"rank_feature": {"field": "feat",
                          "saturation": {"pivot": 10.0}}},
        {"wildcard": {"text": "*spark*"}},
    ]}}, "size": 4}
    res = execute_search(df, body)
    rows = {r["_id"]: r["_score"] for r in res["hits"].collect()}
    # raw A: 1→.5, 2→1/3, 3→2/3, 4→0 ; min_max over [0, 2/3]:
    # 1→.75, 2→.5, 3→1, 4→0. raw B: const 1 for 1,2,4 → min_max all 1.
    # arithmetic_mean (missing=0): 1→.875, 2→.75, 3→.5, 4→.5
    assert rows["1"] == pytest.approx(0.875)
    assert rows["2"] == pytest.approx(0.75)
    assert rows["3"] == pytest.approx(0.5)
    assert rows["4"] == pytest.approx(0.5)

    # weighted arithmetic mean through a search pipeline config
    body["search_pipeline"] = {"phase_results_processors": [
        {"normalization-processor": {
            "normalization": {"technique": "min_max"},
            "combination": {"technique": "arithmetic_mean",
                            "parameters": {"weights": [3.0, 1.0]}}}}]}
    rows = {r["_id"]: r["_score"]
            for r in execute_search(df, body)["hits"].collect()}
    assert rows["1"] == pytest.approx((3 * 0.75 + 1 * 1.0) / 4)
    assert rows["3"] == pytest.approx((3 * 1.0 + 0.0) / 4)

    # geometric mean ignores non-matching sub-queries (public rule)
    body["search_pipeline"] = {"phase_results_processors": [
        {"normalization-processor": {
            "combination": {"technique": "geometric_mean"}}}]}
    rows = {r["_id"]: r["_score"]
            for r in execute_search(df, body)["hits"].collect()}
    assert rows["3"] == pytest.approx(1.0)   # only sub-query A matched
    assert rows["1"] == pytest.approx((0.75 * 1.0) ** 0.5)

    # l2 normalization: score / sqrt(sum of squares) per sub-query
    import math
    body["search_pipeline"] = {"phase_results_processors": [
        {"normalization-processor": {
            "normalization": {"technique": "l2"}}}]}
    rows = {r["_id"]: r["_score"]
            for r in execute_search(df, body)["hits"].collect()}
    a = {"1": 0.5, "2": 1 / 3, "3": 2 / 3, "4": 0.0}
    na = math.sqrt(sum(v * v for v in a.values()))
    nb = math.sqrt(3.0)
    assert rows["1"] == pytest.approx((a["1"] / na + 1 / nb) / 2)
    assert rows["3"] == pytest.approx((a["3"] / na + 0) / 2)

    with pytest.raises(ValueError, match="weights"):
        execute_search(df, {**body, "search_pipeline": {
            "phase_results_processors": [{"normalization-processor": {
                "combination": {"technique": "arithmetic_mean",
                                "parameters": {"weights": [1.0]}}}}]}})


def test_search_pipeline_request_and_response_processors(docs):
    pipeline = {
        "request_processors": [
            {"filter_query": {"query": {"range": {"feat": {"gte": 1.0}}}}},
        ],
        "response_processors": [
            {"rerank": {"by_field": {"target_field": "feat"}}},
            {"rename_field": {"field": "text", "target_field": "body"}},
            {"truncate_hits": {"target_size": 2}},
        ],
    }
    res = execute_search(docs, {
        "query": {"match": {"text": "spark"}},
        "search_pipeline": pipeline, "size": 10,
    })
    rows = res["hits"].collect()
    # 'spark' matches docs 1 and 2; filter_query keeps feat >= 1;
    # rerank by feat orders 1 (10) > 2 (3); truncate keeps 2
    assert [r["id"] for r in rows] == [1, 2]
    assert [r["_score"] for r in rows] == [10.0, 3.0]
    assert "body" in res["hits"].columns and "text" not in res["hits"].columns

    # collapse keeps the best-scored hit per key
    df2 = docs.withColumn("grp", F.col("id") % 2)
    res = execute_search(df2, {
        "query": {"match_all": {}},
        "search_pipeline": {"response_processors": [
            {"rerank": {"by_field": {"target_field": "feat",
                                     "remove_target_field": True}}},
            {"collapse": {"field": "grp"}},
        ]},
        "size": 10,
    })
    rows = {r["grp"]: r["id"] for r in res["hits"].collect()}
    # grp 0: ids 2(3.0),4(7.0) → 4 ; grp 1: ids 1(10.0),3(0.5) → 1
    assert rows == {0: 4, 1: 1}
    assert "feat" not in res["hits"].columns
    with pytest.raises(ValueError, match="response processor"):
        execute_search(docs, {"query": {"match_all": {}},
                              "search_pipeline": {"response_processors": [
                                  {"nope": {}}]}})


def test_slice_and_terminate_after(docs):
    # slices partition the id space disjointly and exhaustively
    parts = []
    for sid in range(3):
        res = execute_search(docs, {
            "query": {"match_all": {}},
            "slice": {"id": sid, "max": 3}, "size": 10})
        parts.append({r["id"] for r in res["hits"].collect()})
    assert set().union(*parts) == {1, 2, 3, 4}
    assert sum(len(p) for p in parts) == 4  # disjoint
    # same slice spec → same assignment (deterministic, resumable)
    res = execute_search(docs, {"query": {"match_all": {}},
                                "slice": {"id": 0, "max": 3}, "size": 10})
    assert {r["id"] for r in res["hits"].collect()} == parts[0]
    with pytest.raises(ValueError, match="slice id"):
        execute_search(docs, {"slice": {"id": 3, "max": 3}})
    # terminate_after bounds collection
    res = execute_search(docs, {"query": {"match_all": {}},
                                "terminate_after": 2, "size": 10})
    assert res["hits"].count() == 2


def test_knn_radial_search(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]),
            (3, [-1.0, 0.0]), (4, [0.7, 0.7])]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    # radius by min_score, NO k: every point inside the bound returns
    res = execute_search(df, {"query": {"knn": {"embedding": {
        "vector": [1.0, 0.0], "min_score": 0.7}}}, "size": 100})
    assert [r.vec_id for r in res["hits"].collect()] == [0, 1, 4]
    # radius by max_distance (cosine distance = 1 - cosine)
    res = execute_search(df, {"query": {"knn": {"embedding": {
        "vector": [1.0, 0.0], "max_distance": 0.3}}}, "size": 100})
    got = [r.vec_id for r in res["hits"].collect()]
    assert got == [0, 1, 4]  # cos .3 boundary: 1, .994, .707
    # k caps the radial set when both are given
    res = execute_search(df, {"query": {"knn": {"embedding": {
        "vector": [1.0, 0.0], "min_score": 0.7, "k": 2}}}, "size": 100})
    assert [r.vec_id for r in res["hits"].collect()] == [0, 1]


def test_terms_partition_and_moving_avg(spark):
    df = spark.createDataFrame(
        [(f"t{i % 7}", float(i)) for i in range(70)], "k string, v double")
    # partitions enumerate the term space disjointly and exhaustively
    seen: list[set] = []
    for pid in range(3):
        res = execute_search(df, {"size": 0, "aggs": {"t": {"terms": {
            "field": "k", "size": 10,
            "include": {"partition": pid, "num_partitions": 3}}}}})
        seen.append({b["key"]
                     for b in res["aggregations"]["t"]["buckets"]})
    assert set().union(*seen) == {f"t{i}" for i in range(7)}
    assert sum(len(s) for s in seen) == 7  # disjoint
    with pytest.raises(ValueError, match="partition"):
        execute_search(df, {"size": 0, "aggs": {"t": {"terms": {
            "field": "k",
            "include": {"partition": 3, "num_partitions": 3}}}}})

    # moving_avg (legacy, simple model): trailing window incl. current
    ts = spark.createDataFrame(
        [(f"2024-01-0{d} 00:00:00", float(d)) for d in range(1, 6)],
        "ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    res = execute_search(ts, {"size": 0, "aggs": {"h": {
        "date_histogram": {"field": "ts", "calendar_interval": "day"},
        "aggs": {"sv": {"sum": {"field": "v"}},
                 "ma": {"moving_avg": {"buckets_path": "sv",
                                       "window": 2}}}}}})
    got = [b["ma"]["value"] for b in res["aggregations"]["h"]["buckets"]]
    assert got == [1.0, 1.5, 2.5, 3.5, 4.5]
    with pytest.raises(ValueError, match="simple model"):
        execute_search(ts, {"size": 0, "aggs": {"h": {
            "date_histogram": {"field": "ts",
                               "calendar_interval": "day"},
            "aggs": {"sv": {"sum": {"field": "v"}},
                     "ma": {"moving_avg": {"buckets_path": "sv",
                                           "model": "holt"}}}}}})


def test_review_r6_regressions(spark, docs):
    """Round-6 review follow-ups: retriever+pipeline single-apply,
    hybrid+aggs explicit rejection, all-null normalize, malformed
    date-math raises."""
    # response processors apply ONCE under a retriever envelope — a
    # rerank that drops its source field would crash on a second pass
    res = execute_search(docs, {
        "retriever": {"standard": {"query": {"match_all": {}}}},
        "search_pipeline": {"response_processors": [
            {"rerank": {"by_field": {"target_field": "feat",
                                     "remove_target_field": True}}}]},
        "size": 4,
    })
    rows = res["hits"].collect()
    assert [r["id"] for r in rows] == [1, 4, 2, 3]  # feat desc
    assert "feat" not in res["hits"].columns

    # hybrid + aggs: loud rejection, not silent empty aggs
    with pytest.raises(ValueError, match="hybrid"):
        execute_search(docs, {
            "query": {"hybrid": {"queries": [{"match_all": {}}]}},
            "aggs": {"n": {"value_count": {"field": "id"}}}})

    # normalize over all-null metrics: null values, never a crash
    df = spark.createDataFrame([("a", None), ("b", None)],
                               "k string, v double")
    res = execute_search(df, {"size": 0, "aggs": {"t": {
        "terms": {"field": "k", "size": 10},
        "aggs": {"sv": {"sum": {"field": "v"}},
                 "z": {"normalize": {"buckets_path": "sv",
                                     "method": "z-score"}}}}}})
    assert all(b["z"]["value"] is None
               for b in res["aggregations"]["t"]["buckets"])

    # malformed date math raises; plain 'nowhere' stays lexical
    with pytest.raises(ValueError, match="unparseable date math"):
        docs.filter(compile_query(
            {"range": {"ts": {"gte": "now-1months"}}})).count()
    with pytest.raises(ValueError, match="unparseable date math"):
        docs.filter(compile_query(
            {"range": {"ts": {"gte": "now - 1d"}}})).count()
    w = spark.createDataFrame([("nowhere",), ("zz",)], "w string")
    assert w.filter(compile_query(
        {"range": {"w": {"gte": "nowhere"}}})).count() == 2


def test_knn_space_types(spark):
    rows = [(0, [1.0, 0.0]), (1, [2.0, 0.0]), (2, [0.0, 3.0]),
            (3, [-1.0, 0.0])]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    q = [1.0, 0.0]

    # l2: score = 1/(1+d^2); distances to q: 0, 1, sqrt(10), 2
    res = execute_search(df, {"query": {"knn": {"embedding": {
        "vector": q, "k": 4, "space_type": "l2"}}}})
    hits = res["hits"].collect()
    assert [r.vec_id for r in hits] == [0, 1, 3, 2]
    assert hits[0]._score == pytest.approx(1.0)
    assert hits[1]._score == pytest.approx(1.0 / 2.0)
    assert hits[2]._score == pytest.approx(1.0 / 5.0)
    assert hits[3]._score == pytest.approx(1.0 / 11.0)
    # l2 radial by euclidean distance
    res = execute_search(df, {"query": {"knn": {"embedding": {
        "vector": q, "space_type": "l2", "max_distance": 1.5}}}})
    assert [r.vec_id for r in res["hits"].collect()] == [0, 1]

    # innerproduct: dots 1, 2, 0, -1 → scores 2, 3, 1, 1/2
    res = execute_search(df, {"query": {"knn": {"embedding": {
        "vector": q, "k": 4, "space_type": "innerproduct"}}}})
    hits = res["hits"].collect()
    assert [r.vec_id for r in hits] == [1, 0, 2, 3]
    assert hits[0]._score == pytest.approx(3.0)
    assert hits[-1]._score == pytest.approx(0.5)
    # innerproduct radial: distance = -dot; max_distance 0 keeps dot>=0
    res = execute_search(df, {"query": {"knn": {"embedding": {
        "vector": q, "space_type": "innerproduct",
        "max_distance": 0.0}}}})
    assert sorted(r.vec_id for r in res["hits"].collect()) == [0, 1, 2]

    with pytest.raises(ValueError, match="space_type"):
        execute_search(df, {"query": {"knn": {"embedding": {
            "vector": q, "k": 2, "space_type": "hamming"}}}})


def test_neural_query_end_to_end(spark):
    """neural → knn rewrite: query text embeds through the registered
    model, documents score against their precomputed embedding column
    (indexed with the SAME embedder, as the plugin's ingest inference
    would leave them)."""
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        hashed_bow_embedder,
        register_text_embedder,
    )

    embed = hashed_bow_embedder(16)
    corpus = [
        (1, "spark shuffle merge join"),
        (2, "window sort aggregate"),
        (3, "cats and dogs outside"),
    ]
    df = spark.createDataFrame(
        [(i, t, embed(t)) for i, t in corpus],
        "id long, text string, embedding array<double>",
    )
    res = execute_search(df, {"query": {"neural": {"embedding": {
        "query_text": "spark shuffle merge join",
        "model_id": "hashed-bow-16", "k": 2}}}})
    hits = res["hits"].collect()
    assert hits[0]["id"] == 1 and hits[0]["_score"] == pytest.approx(1.0)

    # registered custom model wins over the built-in resolution
    register_text_embedder("my-model", hashed_bow_embedder(16))
    res2 = execute_search(df, {"query": {"neural": {"embedding": {
        "query_text": "cats dogs", "model_id": "my-model", "k": 1}}}})
    assert res2["hits"].collect()[0]["id"] == 3
    with pytest.raises(ValueError, match="no text embedder"):
        execute_search(df, {"query": {"neural": {"embedding": {
            "query_text": "x", "model_id": "bert-base", "k": 1}}}})

    # neural inside a hybrid query (the plugin's flagship combination)
    res3 = execute_search(df, {"query": {"hybrid": {"queries": [
        {"neural": {"embedding": {"query_text": "window sort aggregate",
                                  "model_id": "hashed-bow-16", "k": 3}}},
        {"match": {"text": "spark"}},
    ]}}, "size": 3})
    got = [r["id"] for r in res3["hits"].collect()]
    assert got[0] in (1, 2)  # both carry a full-strength signal
    assert set(got) >= {1, 2}


def test_geo_shape_relations_and_types(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0),      # inside outer diamond AND inside hole
         (2, 15.0, 0.0),     # inside outer, outside hole
         (3, 50.0, 0.0),     # outside everything
         (4, None, None)],   # unmapped point
        "id long, lat double, lon double",
    ).select("id", F.struct("lat", "lon").alias("location"))

    def ids(q):
        return sorted(r.id for r in df.filter(compile_query(q)).collect())

    ring = lambda poly: [[lo, la] for la, lo in poly] + [[poly[0][1], poly[0][0]]]
    outer = [(30.0, 0.0), (0.0, 60.0), (-30.0, 0.0), (0.0, -60.0)]
    hole = [(10.0, 0.0), (0.0, 20.0), (-10.0, 0.0), (0.0, -20.0)]
    poly_hole = {"type": "polygon",
                 "coordinates": [ring(outer), ring(hole)]}
    # polygon with hole: only the annulus point matches
    assert ids({"geo_shape": {"location": {"shape": poly_hole}}}) == [2]
    # within ≡ intersects for point docs
    assert ids({"geo_shape": {"location": {
        "shape": poly_hole, "relation": "within"}}}) == [2]
    # disjoint: negation, and the null point matches NEITHER side
    assert ids({"geo_shape": {"location": {
        "shape": poly_hole, "relation": "disjoint"}}}) == [1, 3]
    # envelope ([lon, lat] top-left / bottom-right corners)
    assert ids({"geo_shape": {"location": {"shape": {
        "type": "envelope", "coordinates": [[-1.0, 20.0], [1.0, 10.0]],
    }}}}) == [2]
    # circle with a radius string
    assert ids({"geo_shape": {"location": {"shape": {
        "type": "circle", "coordinates": [0.0, 0.0], "radius": "10km",
    }}}}) == [1]
    # multipolygon: OR of members (hole diamond ∪ a box around (50, 0))
    box = [(55.0, -5.0), (55.0, 5.0), (45.0, 5.0), (45.0, -5.0)]
    assert ids({"geo_shape": {"location": {"shape": {
        "type": "multipolygon",
        "coordinates": [[ring(hole)], [ring(box)]],
    }}}}) == [1, 3]
    # geometrycollection
    assert ids({"geo_shape": {"location": {"shape": {
        "type": "geometrycollection", "geometries": [
            {"type": "point", "coordinates": [0.0, 15.0]},
            {"type": "circle", "coordinates": [0.0, 50.0],
             "radius": "5km"},
        ]}}}}) == [2, 3]
    # contains: a point doc contains only a point shape equal to it
    assert ids({"geo_shape": {"location": {
        "shape": {"type": "point", "coordinates": [0.0, 15.0]},
        "relation": "contains"}}}) == [2]
    assert ids({"geo_shape": {"location": {
        "shape": poly_hole, "relation": "contains"}}}) == []
    # loud rejections: line types, unknown relation, indexed_shape
    with pytest.raises(ValueError, match="geo_shape type"):
        compile_query({"geo_shape": {"location": {"shape": {
            "type": "linestring",
            "coordinates": [[0.0, 0.0], [1.0, 1.0]]}}}})
    with pytest.raises(ValueError, match="relation"):
        compile_query({"geo_shape": {"location": {
            "shape": poly_hole, "relation": "touches"}}})
    with pytest.raises(ValueError, match="indexed_shape"):
        compile_query({"geo_shape": {"location": {
            "indexed_shape": {"index": "shapes", "id": "1"}}}})


def test_variable_width_histogram(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in [1, 1, 1, 1, 2, 3, 10, 11, 12, 100]]
        + [(None,)],
        "v double",
    )
    res = execute_search(df, {"size": 0, "aggs": {"vwh": {
        "variable_width_histogram": {"field": "v", "buckets": 3}}}})
    bks = res["aggregations"]["vwh"]["buckets"]
    # deterministic equal-depth dialect: cuts at the 1/3 and 2/3
    # percentiles; nulls never counted
    assert sum(b["doc_count"] for b in bks) == 10
    assert len(bks) <= 3
    assert [b["min"] for b in bks] == sorted(b["min"] for b in bks)
    for b in bks:
        assert b["min"] <= b["key"] <= b["max"]
    # a single bucket degenerates to the plain stats of the column
    one = execute_search(df, {"size": 0, "aggs": {"vwh": {
        "variable_width_histogram": {"field": "v", "buckets": 1}}}})
    (b0,) = one["aggregations"]["vwh"]["buckets"]
    assert b0 == {"key": pytest.approx(14.2), "min": 1.0, "max": 100.0,
                  "doc_count": 10}
    # heavy repeated value: collapsed duplicate cuts never mint empty
    # buckets
    heavy = spark.createDataFrame(
        [(5.0,)] * 20 + [(9.0,)], "v double")
    hb = execute_search(heavy, {"size": 0, "aggs": {"vwh": {
        "variable_width_histogram": {"field": "v", "buckets": 4}}}})
    hbk = hb["aggregations"]["vwh"]["buckets"]
    assert [b["doc_count"] for b in hbk] == [20, 1]
    # approximate boundary mode still buckets every row
    ap = execute_search(df, {"size": 0, "aggs": {"vwh": {
        "variable_width_histogram": {"field": "v", "buckets": 3,
                                     "exact": False}}}})
    assert sum(b["doc_count"]
               for b in ap["aggregations"]["vwh"]["buckets"]) == 10
    with pytest.raises(ValueError, match="buckets"):
        execute_search(df, {"size": 0, "aggs": {"vwh": {
            "variable_width_histogram": {"field": "v", "buckets": 0}}}})


def test_match_none_post_filter_track_total_hits(docs):
    # match_none matches nothing, alone or inside a bool
    assert docs.filter(compile_query({"match_none": {}})).count() == 0
    assert docs.filter(compile_query({"bool": {
        "should": [{"term": {"id": 1}}, {"match_none": {}}],
    }})).count() == 1

    # post_filter narrows hits but NOT aggregations
    res = execute_search(docs, {
        "query": {"range": {"feat": {"gte": 1.0}}},   # ids 1,2,4
        "post_filter": {"term": {"id": 1}},
        "aggs": {"n": {"value_count": {"field": "id"}}},
        "track_total_hits": True,
    })
    assert res["hits"].count() == 1
    assert res["aggregations"]["n"]["value"] == 3
    # total reflects post_filter (public), exact under `true`
    assert res["total"] == {"value": 1, "relation": "eq"}

    # bounded track_total_hits: under the bound → eq, over → gte
    res = execute_search(docs, {"query": {"match_all": {}},
                                "size": 1, "track_total_hits": 2})
    assert res["total"] == {"value": 2, "relation": "gte"}
    res = execute_search(docs, {"query": {"match_all": {}},
                                "size": 1, "track_total_hits": 100})
    assert res["total"] == {"value": 4, "relation": "eq"}
    # not requested → no count job, no key
    res = execute_search(docs, {"query": {"match_all": {}}})
    assert "total" not in res
    with pytest.raises(ValueError, match="track_total_hits"):
        execute_search(docs, {"query": {"match_all": {}},
                              "track_total_hits": -1})


def test_categorize_text_agg(spark):
    df = spark.createDataFrame(
        [(1, "Failed to connect to 10.0.0.1 after 3 retries"),
         (2, "Failed to connect to 10.9.3.77 after 11 retries"),
         (3, "User 1543 logged in"),
         (4, "User 99 logged in"),
         (5, "User 7 logged out"),
         (6, "12345 67"),          # no letters: no bucket
         (7, None)],
        "id long, msg string",
    )
    res = execute_search(df, {"size": 0, "aggs": {"c": {
        "categorize_text": {"field": "msg", "size": 10},
    }}})
    got = {b["key"]: b["doc_count"] for b in res["aggregations"]["c"]["buckets"]}
    assert got == {
        "Failed to connect to after retries": 2,
        "User logged in": 2,
        "User logged out": 1,
    }
    # ordering: doc_count desc then key asc; size caps buckets
    keys = [b["key"] for b in res["aggregations"]["c"]["buckets"]]
    assert keys == ["Failed to connect to after retries",
                    "User logged in", "User logged out"]
    res = execute_search(df, {"size": 0, "aggs": {"c": {
        "categorize_text": {"field": "msg", "size": 1},
    }}})
    assert len(res["aggregations"]["c"]["buckets"]) == 1
    # max_tokens bounds the pattern key (adversarial long messages)
    res = execute_search(df, {"size": 0, "aggs": {"c": {
        "categorize_text": {"field": "msg", "size": 10, "max_tokens": 2},
    }}})
    got = {b["key"]: b["doc_count"] for b in res["aggregations"]["c"]["buckets"]}
    assert got == {"Failed to": 2, "User logged": 3}
    # metric sub-agg rides the same single pass
    res = execute_search(df, {"size": 0, "aggs": {"c": {
        "categorize_text": {"field": "msg", "size": 10, "max_tokens": 2},
        "aggs": {"max_id": {"max": {"field": "id"}}},
    }}})
    got = {b["key"]: b["max_id"]["value"]
           for b in res["aggregations"]["c"]["buckets"]}
    assert got == {"Failed to": 2, "User logged": 5}


def test_geo_line_agg(spark):
    rows = [
        # (id, ts, lat, lon) — ts ties on id 3/4 break on (lon, lat)
        (1, "2024-01-01 00:00:01", 10.0, 100.0),
        (2, "2024-01-01 00:00:02", 11.0, 101.0),
        (3, "2024-01-01 00:00:03", 12.0, 103.0),
        (4, "2024-01-01 00:00:03", 12.0, 102.0),
        (5, "2024-01-01 00:00:04", 13.0, 104.0),
        (6, None, 99.0, 99.0),                     # null sort: excluded
    ]
    df = spark.createDataFrame(
        rows, "id long, ts string, lat double, lon double"
    ).select(
        "id", F.col("ts").cast("timestamp").alias("ts"),
        F.struct("lat", "lon").alias("location"),
    )
    body = {"point": {"field": "location"}, "sort": {"field": "ts"}}
    res = execute_search(df, {"size": 0, "aggs": {
        "l": {"geo_line": dict(body, size=10, include_sort=True)},
    }})["aggregations"]["l"]
    assert res["geometry"]["type"] == "LineString"
    assert res["geometry"]["coordinates"] == [
        [100.0, 10.0], [101.0, 11.0], [102.0, 12.0], [103.0, 12.0],
        [104.0, 13.0],
    ]
    assert res["properties"]["complete"] is True
    assert len(res["properties"]["sort_values"]) == 5
    # truncation: size smaller than the track → complete False
    res = execute_search(df, {"size": 0, "aggs": {
        "l": {"geo_line": dict(body, size=3)},
    }})["aggregations"]["l"]
    assert res["geometry"]["coordinates"] == [
        [100.0, 10.0], [101.0, 11.0], [102.0, 12.0]]
    assert res["properties"]["complete"] is False
    # sort_order desc walks the track backwards
    res = execute_search(df, {"size": 0, "aggs": {
        "l": {"geo_line": dict(body, size=10, sort_order="desc")},
    }})["aggregations"]["l"]
    assert res["geometry"]["coordinates"][0] == [104.0, 13.0]
    with pytest.raises(ValueError, match="size"):
        execute_search(df, {"size": 0, "aggs": {
            "l": {"geo_line": dict(body, size=0)}}})


def test_term_suggest_modes(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        term_suggest,
    )

    df = spark.createDataFrame(
        [(1, "delta delta delta"), (2, "delts"), (3, "delta belta")],
        "id long, text string",
    )
    # input term EXISTS in the corpus: missing mode suppresses
    assert term_suggest(df, "text", "delta").count() == 0
    # ... but still suggests for an absent term
    rows = term_suggest(df, "text", "deltaa").collect()
    assert rows and rows[0]["term"] == "delta"
    # popular: only candidates strictly more frequent than the input
    # (delta freq 4 > delts freq 1; belta freq 1 is not > 1)
    rows = term_suggest(df, "text", "delts",
                        suggest_mode="popular").collect()
    assert [r["term"] for r in rows] == ["delta"]
    # always: the input term's own frequency is irrelevant (belta is
    # pruned by the default prefix_length=1; prefix_length=0 admits it)
    rows = term_suggest(df, "text", "delta",
                        suggest_mode="always").collect()
    assert {r["term"] for r in rows} == {"delts"}
    rows = term_suggest(df, "text", "delta", prefix_length=0,
                        suggest_mode="always").collect()
    assert {r["term"] for r in rows} == {"delts", "belta"}
    with pytest.raises(ValueError, match="suggest_mode"):
        term_suggest(df, "text", "delta", suggest_mode="sometimes")
    # the search-body surface forwards the option
    res = execute_search(df, {"suggest": {
        "s": {"text": "delta", "term": {"field": "text",
                                        "suggest_mode": "always"}},
    }})
    assert len(res["suggest"]["s"][0]["options"]) == 1
    res = execute_search(df, {"suggest": {
        "s": {"text": "delta", "term": {"field": "text"}},
    }})
    assert res["suggest"]["s"][0]["options"] == []


def test_geohex_grid_agg(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        hexgrid_cell,
    )

    df = spark.createDataFrame(
        [(0.0, 0.0), (0.001, 0.001), (45.0, 90.0), (45.0, 90.2),
         (-30.0, -60.0), (89.9, 10.0)],
        "lat double, lon double",
    ).select(F.struct("lat", "lon").alias("location"))
    keys = [r[0] for r in df.select(hexgrid_cell("location", 3)).collect()]
    # the origin projects to (0, 0): axial cell 0/0 at every precision
    assert keys[0] == "3/0/0"
    # near-origin point shares the origin's cell; far points don't
    assert keys[1] == "3/0/0"
    assert keys[2] != keys[0] and keys[4] != keys[2]
    # nearby points (0.2 degrees apart at res 3, edge ~835 km) co-bucket
    assert keys[2] == keys[3]
    # out-of-mercator latitude clamps instead of blowing up ln(tan)
    assert keys[5].startswith("3/")
    # resolution ladder: finer precision separates what coarse merges
    fine = [r[0] for r in df.select(hexgrid_cell("location", 9)).collect()]
    assert fine[2] != fine[3]
    with pytest.raises(ValueError, match="precision"):
        df.select(hexgrid_cell("location", 16)).collect()
    # through the agg surface, with a metric sub-agg
    res = execute_search(df.withColumn("v", F.lit(2.0)), {
        "size": 0, "aggs": {"g": {
            "geohex_grid": {"field": "location", "precision": 3},
            "aggs": {"sv": {"sum": {"field": "v"}}},
        }}})
    buckets = res["aggregations"]["g"]["buckets"]
    assert sum(b["doc_count"] for b in buckets) == 6
    assert {b["key"] for b in buckets} == set(keys)
    top = buckets[0]
    assert top["doc_count"] == 2 and top["sv"]["value"] == 4.0


def test_field_masking_span(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma", "alpha delta"),
         (2, "alpha beta gamma", "gamma alpha"),
         (3, "beta beta beta", "alpha delta")],
        "id long, text string, title string",
    )
    # cross-field span_near: 'alpha' from text, 'delta' positions drawn
    # from title but masked AS text — doc 1: text alpha@1, title
    # delta@2 → in-order within slop 1; doc 3: text has no alpha
    q = {"span_near": {"clauses": [
        {"span_term": {"text": "alpha"}},
        {"field_masking_span": {
            "query": {"span_term": {"title": "delta"}}, "field": "text"}},
    ], "slop": 1, "in_order": True}}
    got = {r["id"] for r in df.filter(compile_query(q)).collect()}
    assert got == {1}
    # unordered: text gamma (@3) near masked title alpha (@1 in doc 1,
    # @2 in doc 2) — both within slop 2; doc 3 has no text gamma
    q2 = {"span_near": {"clauses": [
        {"span_term": {"text": "gamma"}},
        {"field_masking_span": {
            "query": {"span_term": {"title": "alpha"}}, "field": "text"}},
    ], "slop": 2, "in_order": False}}
    got = {r["id"] for r in df.filter(compile_query(q2)).collect()}
    assert got == {1, 2}
    # same-position cross-field pair violates the span non-overlap
    # rule: text alpha@1 vs masked title alpha@1 in doc 1
    q_overlap = {"span_near": {"clauses": [
        {"span_term": {"text": "alpha"}},
        {"field_masking_span": {
            "query": {"span_term": {"title": "alpha"}}, "field": "text"}},
    ], "slop": 5, "in_order": False}}
    got = {r["id"] for r in df.filter(compile_query(q_overlap)).collect()}
    assert got == {2}  # doc 2: text alpha@1, title alpha@2 — disjoint
    # unmasked cross-field clauses still refuse
    with pytest.raises(ValueError, match="one field"):
        compile_query({"span_near": {"clauses": [
            {"span_term": {"text": "alpha"}},
            {"span_term": {"title": "delta"}},
        ], "slop": 1}})
    # standalone mask = the inner span
    q3 = {"field_masking_span": {
        "query": {"span_term": {"title": "delta"}}, "field": "text"}}
    got = {r["id"] for r in df.filter(compile_query(q3)).collect()}
    assert got == {1, 3}


def test_composite_geotile_source_and_missing_bucket(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        composite_frame,
        geotile_cell,
    )

    df = spark.createDataFrame(
        [(1, "a", 10.0, 20.0), (2, "a", 10.0, 20.0), (3, "b", -40.0, 100.0),
         (4, None, 10.0, 20.0), (5, "c", None, None)],
        "id long, cat string, lat double, lon double",
    ).select("id", "cat", F.struct("lat", "lon").alias("loc"))

    # geotile source buckets by tile; null point dropped by default
    out = composite_frame(df, {"sources": [
        {"tile": {"geotile_grid": {"field": "loc", "precision": 4}}},
    ]}).collect()
    keys = {r["tile"]: r["doc_count"] for r in out}
    tile = df.filter(F.col("id") == 1).select(
        geotile_cell("loc", 4)).collect()[0][0]
    assert keys[tile] == 3  # ids 1,2,4 share the point
    assert None not in keys and sum(keys.values()) == 4

    # missing_bucket keeps the null under a null key (NOT an edge tile)
    out = composite_frame(df, {"sources": [
        {"tile": {"geotile_grid": {"field": "loc", "precision": 4,
                                   "missing_bucket": True}}},
    ]}).collect()
    keys = {r["tile"]: r["doc_count"] for r in out}
    assert keys.get(None) == 1

    # terms source drops missing by default, keeps under missing_bucket
    out = composite_frame(df, {"sources": [
        {"c": {"terms": {"field": "cat"}}}]}).collect()
    assert {r["c"] for r in out} == {"a", "b", "c"}
    out = composite_frame(df, {"sources": [
        {"c": {"terms": {"field": "cat", "missing_bucket": True}}},
    ]}).collect()
    assert {r["c"] for r in out} == {"a", "b", "c", None}


def test_explain_true_per_hit(docs):
    res = execute_search(docs, {
        "query": {"bool": {
            "filter": [{"range": {"feat": {"gte": 1.0}}}],
            "must": [{"exists": {"field": "text"}}],
        }},
        "explain": True,
        "_source": ["id"],
    })
    rows = res["hits"].collect()
    assert rows and all(r["_explanation"]["matched"] for r in rows)
    ex = rows[0]["_explanation"].asDict()
    assert ex["filter[0].range"] is True
    assert ex["must[0].exists"] is True
    # scored query: no boolean decomposition, matched-by-construction
    res = execute_search(docs, {
        "query": {"function_score": {
            "query": {"match_all": {}}, "weight": 2.0}},
        "explain": True, "size": 1,
    })
    r = res["hits"].collect()[0]
    assert r["_explanation"]["matched"] is True


def test_highlight_fragments(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        apply_highlight,
    )

    long_text = ("alpha " + "x" * 40 + " beta spark gamma " + "y" * 40
                 + " spark delta " + "z" * 40)
    df = spark.createDataFrame([(1, long_text)], "id long, text string")
    q = {"match": {"text": "spark"}}
    # whole-field default unchanged: one tagged string
    out = apply_highlight(df, q, {"fields": {"text": {}}})
    row = out.collect()[0]
    assert row["_highlight_text"].count("<em>spark</em>") == 2
    # fragment mode: array of snippets around each match, bounded size
    out = apply_highlight(df, q, {"fields": {"text": {
        "number_of_fragments": 2, "fragment_size": 30}}})
    frags = out.collect()[0]["_highlight_text"]
    assert isinstance(frags, list) and len(frags) == 2
    assert all("<em>spark</em>" in f for f in frags)
    assert all(len(f) <= 30 + len("<em></em>") + 1 for f in frags)
    # number_of_fragments caps the list; top-level knobs apply
    out = apply_highlight(df, q, {
        "number_of_fragments": 1, "fields": {"text": {}}})
    frags = out.collect()[0]["_highlight_text"]
    assert len(frags) == 1
    # custom tags survive fragment extraction
    out = apply_highlight(df, q, {
        "pre_tags": ["**"], "post_tags": ["**"],
        "fields": {"text": {"number_of_fragments": 2}}})
    frags = out.collect()[0]["_highlight_text"]
    assert all("**spark**" in f for f in frags)


def test_percolate_query_form(spark):
    """The public percolate QUERY: the frame is a percolator index of
    stored query bodies; the request carries the document(s)."""
    import json

    reg = spark.createDataFrame(
        [("q_spark", json.dumps({"match": {"text": "spark"}})),
         ("q_big", json.dumps({"range": {"n": {"gte": 100}}})),
         ("q_both", json.dumps({"bool": {"must": [
             {"match": {"text": "spark"}},
             {"range": {"n": {"gte": 100}}}]}})),
         ("q_other_field", json.dumps({"term": {"missing_col": "x"}}))],
        "_id string, query string",
    )
    res = execute_search(reg, {"query": {"percolate": {
        "document": {"text": "big spark job", "n": 500},
    }}})
    assert {r["_id"] for r in res["hits"].collect()} == {
        "q_spark", "q_big", "q_both"}
    # a doc matching neither: only field-compatible non-matches
    res = execute_search(reg, {"query": {"percolate": {
        "document": {"text": "plain words", "n": 1},
    }}})
    assert res["hits"].count() == 0
    # multi-document form: a query matches if ANY document matches
    res = execute_search(reg, {"query": {"percolate": {
        "documents": [{"text": "nothing", "n": 1},
                      {"text": "spark", "n": 1}],
    }}})
    assert {r["_id"] for r in res["hits"].collect()} == {"q_spark"}


def test_script_score_query(docs):
    res = execute_search(docs, {
        "query": {"script_score": {
            "query": {"range": {"feat": {"gte": 1.0}}},
            "script": {"source": "feat * 2 + id"},
        }},
        "size": 3,
    })
    rows = res["hits"].select("id", "_score").collect()
    got = {r["id"]: r["_score"] for r in rows}
    assert got == {1: 21.0, 4: 18.0, 2: 8.0}  # replaced, desc-ordered
    assert [r["id"] for r in rows] == [1, 4, 2]
    # min_score inside the query body floors
    res = execute_search(docs, {
        "query": {"script_score": {
            "query": {"match_all": {}},
            "script": {"source": "feat"},
            "min_score": 5.0,
        }},
    })
    assert {r["id"] for r in res["hits"].collect()} == {1, 4}
    # negative scores are rejected (the public contract)
    import pyspark

    with pytest.raises(Exception, match="negative score"):
        execute_search(docs, {
            "query": {"script_score": {
                "query": {"match_all": {}},
                "script": {"source": "-feat"},
            }},
        })["hits"].collect()


def test_percolate_union_schema_and_bad_bodies(spark):
    import json

    reg = spark.createDataFrame(
        [("q_n", json.dumps({"range": {"n": {"gte": 100}}})),
         ("q_bad", "{not json"),
         ("q_text", json.dumps({"match": {"text": "spark"}}))],
        "_id string, query string",
    )
    # the queried field appears only in the SECOND document: the frame
    # schema is the union of keys, so q_n still matches
    res = execute_search(reg, {"query": {"percolate": {
        "documents": [{"text": "spark"}, {"text": "x", "n": 500}],
    }}})
    assert {r["_id"] for r in res["hits"].collect()} == {"q_n", "q_text"}
    # a malformed stored body is a non-match, never a failed request
    res = execute_search(reg, {"query": {"percolate": {
        "document": {"text": "nothing", "n": 1},
    }}})
    assert res["hits"].count() == 0


def test_zero_fill_span_guard_fires_before_grid(spark):
    """r9 verdict item 1: data-driven zero-fill bounds (absent or
    one-sided extended_bounds) must be validated against the 100k
    bucket cap BEFORE the grid is synthesized — one doc in 1970 and
    one in 2026 at fixed_interval 1s is ~1.8B buckets and must raise
    from the one-row bounds aggregate, never materialize."""
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        execute_search,
    )

    df = spark.createDataFrame(
        [(1, "1970-01-02 00:00:00"), (2, "2026-01-01 00:00:00")],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # absent extended_bounds: bounds come entirely from the data
    with pytest.raises(ValueError, match="100k buckets"):
        execute_search(df, {"size": 0, "aggs": {"h": {
            "date_histogram": {"field": "ts", "fixed_interval": "1s",
                               "min_doc_count": 0}}}})
    # one-sided extended_bounds: the static both-present check cannot
    # fire; the resolved-span check must
    with pytest.raises(ValueError, match="100k buckets"):
        execute_search(df, {"size": 0, "aggs": {"h": {
            "date_histogram": {"field": "ts", "fixed_interval": "1s",
                               "min_doc_count": 0,
                               "extended_bounds": {
                                   "min": "1969-01-01T00:00:00"}}}}})
    # calendar intervals take the conservative-minimum step path
    with pytest.raises(ValueError, match="100k buckets"):
        execute_search(df, {"size": 0, "aggs": {"h": {
            "date_histogram": {"field": "ts",
                               "calendar_interval": "minute",
                               "min_doc_count": 0}}}})
    # numeric twin: stride span from the data alone
    wide = spark.createDataFrame(
        [(0.0,), (1.0e9,)], "feat double")
    with pytest.raises(ValueError, match="100k buckets"):
        execute_search(wide, {"size": 0, "aggs": {"h": {
            "histogram": {"field": "feat", "interval": 1.0,
                          "min_doc_count": 0}}}})
    # ...and with a one-sided bound
    with pytest.raises(ValueError, match="100k buckets"):
        execute_search(wide, {"size": 0, "aggs": {"h": {
            "histogram": {"field": "feat", "interval": 1.0,
                          "min_doc_count": 0,
                          "extended_bounds": {"min": -1.0e9}}}}})


def test_zero_fill_plan_is_distributed(spark):
    """Plan audit (r9 verdict item 8, style of
    test_percentiles_approx_plan_is_sketch_only): the zero-fill frame's
    executed plan synthesizes the grid with a Generate(explode) over
    sequence() and joins the aggregate back broadcast — no driver-side
    bucket loop can silently replace the distributed shape."""
    import re as _re

    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        _zero_fill_date_grid,
    )

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-04 00:00:00")],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    agg_df = df.groupBy(
        F.date_trunc("day", "ts").alias("key")
    ).agg(F.count("*").alias("doc_count"))
    frame = _zero_fill_date_grid(
        agg_df, {"field": "ts", "calendar_interval": "day",
                 "min_doc_count": 0})
    plan = frame._jdf.queryExecution().executedPlan().toString()
    # the sequence() over the validated literal bounds may be
    # constant-folded into a literal array (≤100k keys by the cap);
    # what must survive is the executor-side explode + broadcast join
    assert _re.search(r"Generate explode", plan)
    assert _re.search(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan)
    # 4 rows: Jan 1 .. Jan 4, gaps zero-filled
    assert frame.count() == 4


def test_zero_fill_cap_is_inclusive_of_the_boundary():
    """The inclusive grid emits span/step + 1 buckets: a span of
    exactly 100_000 steps is 100_001 buckets and must raise; one step
    under the line passes."""
    import datetime as dt

    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        _validate_grid_span,
    )

    body = {"field": "ts", "fixed_interval": "1s", "min_doc_count": 0}
    lo = dt.datetime(2020, 1, 1)
    with pytest.raises(ValueError):
        _validate_grid_span(lo, lo + dt.timedelta(seconds=100_000), body)
    _validate_grid_span(lo, lo + dt.timedelta(seconds=99_999), body)
