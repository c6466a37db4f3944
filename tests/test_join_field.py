"""Join-field DSL (has_child / has_parent / parent_id): semi-join
semantics over a one-frame parent+child corpus, recomputed with plain
DataFrame ops (SURVEY §5 strategy)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opensearch_dynamodb_etl_cdk_spark.operators.search import execute_search

JF = {"type_field": "rel", "parent_type": "order", "key": "okey",
      "child_key": "okey"}


@pytest.fixture(scope="module")
def corpus(spark):
    parents = spark.createDataFrame(
        [(1, "order", "URGENT", None), (2, "order", "LOW", None),
         (3, "order", "URGENT", None), (4, "order", "LOW", None)],
        "okey long, rel string, priority string, qty long",
    )
    children = spark.createDataFrame(
        [(1, "item", None, 5), (1, "item", None, 50),
         (2, "item", None, 7), (3, "item", None, 60),
         (3, "item", None, 61), (3, "item", None, 62)],
        "okey long, rel string, priority string, qty long",
    )
    df = parents.unionByName(children).cache()
    df.count()
    return df


def _keys(hits, rel):
    return sorted(
        r["okey"] for r in hits.filter(F.col("rel") == rel).collect()
    )


def test_has_child(corpus):
    res = execute_search(corpus, {"query": {"has_child": {
        "type": "item", "query": {"range": {"qty": {"gte": 50}}},
        "join_field": JF,
    }}})
    # orders with an item qty>=50: order 1 (50) and order 3 (60,61,62)
    assert _keys(res["hits"], "order") == [1, 3]
    assert res["hits"].filter(F.col("rel") == "item").count() == 0


def test_has_child_min_max_children(corpus):
    res = execute_search(corpus, {"query": {"has_child": {
        "type": "item", "query": {"match_all": {}},
        "min_children": 2, "join_field": JF,
    }}})
    assert _keys(res["hits"], "order") == [1, 3]
    res = execute_search(corpus, {"query": {"has_child": {
        "type": "item", "query": {"match_all": {}},
        "min_children": 2, "max_children": 2, "join_field": JF,
    }}})
    assert _keys(res["hits"], "order") == [1]  # order 3 has 3 children


def test_has_parent(corpus):
    res = execute_search(corpus, {"query": {"has_parent": {
        "parent_type": "order",
        "query": {"term": {"priority": "URGENT"}},
        "join_field": JF,
    }}})
    # items of urgent orders 1 and 3
    assert _keys(res["hits"], "item") == [1, 1, 3, 3, 3]
    assert res["hits"].filter(F.col("rel") == "order").count() == 0


def test_parent_id(corpus):
    res = execute_search(corpus, {"query": {"parent_id": {
        "type": "item", "id": "3", "join_field": JF,
    }}})
    assert _keys(res["hits"], "item") == [3, 3, 3]


def test_join_field_inside_bool_filter(corpus):
    res = execute_search(corpus, {"query": {"bool": {
        "filter": [
            {"has_child": {"type": "item",
                           "query": {"range": {"qty": {"gte": 50}}},
                           "join_field": JF}},
            {"term": {"priority": "URGENT"}},
        ],
    }}})
    # both big-item orders (1, 3) are URGENT → intersection keeps both
    assert _keys(res["hits"], "order") == [1, 3]
    res = execute_search(corpus, {"query": {"bool": {
        "filter": [
            {"has_child": {"type": "item",
                           "query": {"range": {"qty": {"gte": 50}}},
                           "join_field": JF}},
            {"term": {"priority": "LOW"}},
        ],
    }}})
    assert res["hits"].count() == 0


def test_join_field_rejected_in_should(corpus):
    with pytest.raises(ValueError):
        execute_search(corpus, {"query": {"bool": {"should": [
            {"has_child": {"type": "item", "query": {"match_all": {}},
                           "join_field": JF}},
        ]}}})


def test_has_child_plan_is_semi_join_with_pushdown(corpus):
    res = execute_search(corpus, {"query": {"has_child": {
        "type": "item", "query": {"range": {"qty": {"gte": 50}}},
        "join_field": JF,
    }}})
    plan = res["hits"]._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_has_child_inner_hits(corpus):
    res = execute_search(corpus, {"query": {"has_child": {
        "type": "item", "query": {"range": {"qty": {"gte": 50}}},
        "join_field": JF,
        "inner_hits": {"name": "big_items", "size": 2,
                       "sort": [{"qty": "desc"}]},
    }}})
    assert _keys(res["hits"], "order") == [1, 3]
    inner = res["inner_hits"]["big_items"]
    rows = sorted(
        ((r["okey"], r["qty"]) for r in inner.collect()),
    )
    # per surviving parent: its matching children, top-2 by qty desc —
    # order 1 contributes (1,50); order 3 keeps 62,61 and drops 60
    assert rows == [(1, 50), (3, 61), (3, 62)]


def test_has_child_inner_hits_default_name_and_size(corpus):
    res = execute_search(corpus, {"query": {"has_child": {
        "type": "item", "query": {"match_all": {}},
        "join_field": JF, "inner_hits": {},
    }}})
    inner = res["inner_hits"]["item"]  # default name = child type
    # default size 3 keeps every child here (max 3 per parent)
    assert inner.count() == 6
    # no inner_hits key at all when the query doesn't ask for it
    res2 = execute_search(corpus, {"query": {"has_child": {
        "type": "item", "query": {"match_all": {}}, "join_field": JF,
    }}})
    assert "inner_hits" not in res2


def test_has_parent_inner_hits(corpus):
    res = execute_search(corpus, {"query": {"has_parent": {
        "parent_type": "order",
        "query": {"term": {"priority": "URGENT"}},
        "join_field": JF, "inner_hits": {},
    }}})
    assert _keys(res["hits"], "item") == [1, 1, 3, 3, 3]
    inner = res["inner_hits"]["order"]  # default name = parent type
    assert sorted(r["okey"] for r in inner.collect()) == [1, 3]
    assert {r["priority"] for r in inner.collect()} == {"URGENT"}


def test_join_field_inner_hits_under_bool(corpus):
    res = execute_search(corpus, {"query": {"bool": {"filter": [
        {"has_child": {"type": "item",
                       "query": {"range": {"qty": {"gte": 50}}},
                       "join_field": JF, "inner_hits": {}}},
        {"term": {"priority": "URGENT"}},
    ]}}})
    assert _keys(res["hits"], "order") == [1, 3]
    # inner hits are bounded by the has_child clause alone (children of
    # parents the SEMI-JOIN kept), matching the public per-clause shape
    assert sorted(r["okey"] for r in res["inner_hits"]["item"].collect()) \
        == [1, 3, 3, 3]


def test_children_agg(corpus):
    res = execute_search(corpus, {
        "size": 0,
        "query": {"term": {"priority": "URGENT"}},
        "aggs": {"to_items": {
            "children": {"type": "item", "join_field": JF},
            "aggs": {"total_qty": {"sum": {"field": "qty"}},
                     "max_qty": {"max": {"field": "qty"}}},
        }},
    })
    agg = res["aggregations"]["to_items"]
    # children of urgent orders 1,3: qty 5,50,60,61,62
    assert agg["doc_count"] == 5
    assert agg["total_qty"]["value"] == 238.0
    assert agg["max_qty"]["value"] == 62


def test_parent_agg(corpus):
    res = execute_search(corpus, {
        "size": 0,
        "query": {"range": {"qty": {"gte": 50}}},
        "aggs": {"to_orders": {
            "parent": {"type": "item", "join_field": JF},
            "aggs": {"priorities": {
                "terms": {"field": "priority"}}},
        }},
    })
    agg = res["aggregations"]["to_orders"]
    # items with qty>=50 belong to orders 1 and 3 (2 distinct parents)
    assert agg["doc_count"] == 2
    assert {(b["key"], b["doc_count"])
            for b in agg["priorities"]["buckets"]} == {("URGENT", 2)}
