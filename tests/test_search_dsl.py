"""Search-DSL interpreter tests over the materialized flights corpus and
the documents table — the queries a reference user runs against
OpenSearch today (SURVEY §2.7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opensearch_dynamodb_etl_cdk_spark.operators.search import (
    compile_query,
    execute_search,
)
from opensearch_dynamodb_etl_cdk_spark.sources.fixture_gen import gen_corpus
from opensearch_dynamodb_etl_cdk_spark.sources.flights import unmarshal_items_df


@pytest.fixture(scope="module")
def items(spark):
    df = unmarshal_items_df(
        spark.createDataFrame([(s,) for s in gen_corpus()], "item_json string")
    ).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def fares(items):
    return items.filter(F.col("type") == "fare")


def test_term_and_terms(fares):
    res = execute_search(fares, {"query": {"term": {"fare_class": "nonstop"}}})
    assert res["hits"].count() == fares.filter(F.col("fare_class") == "nonstop").count()
    res = execute_search(fares, {"query": {"terms": {"pk": ["DEN", "SFO"]}}})
    assert res["hits"].count() == fares.filter(F.col("pk").isin("DEN", "SFO")).count()


def test_range_on_timestamp(fares):
    res = execute_search(
        fares,
        {"query": {"range": {"start_ts": {"gte": "2021-08-01", "lt": "2021-08-15"}}}},
    )
    expected = fares.filter(
        (F.col("start_ts") >= "2021-08-01") & (F.col("start_ts") < "2021-08-15")
    ).count()
    assert res["hits"].count() == expected


def test_bool_query(fares):
    body = {
        "query": {
            "bool": {
                "must": [{"term": {"fare_class": "nonstop"}}],
                "must_not": [{"term": {"pk": "DEN"}}],
                "filter": [{"exists": {"field": "dest"}}],
            }
        }
    }
    res = execute_search(fares, body)
    expected = fares.filter(
        (F.col("fare_class") == "nonstop") & (F.col("pk") != "DEN")
    ).count()
    assert res["hits"].count() == expected


def test_bool_should(fares):
    body = {
        "query": {
            "bool": {
                "should": [{"term": {"pk": "DEN"}}, {"term": {"pk": "SFO"}}],
            }
        }
    }
    assert (
        execute_search(fares, body)["hits"].count()
        == fares.filter(F.col("pk").isin("DEN", "SFO")).count()
    )


def test_prefix_wildcard_ids(fares):
    res = execute_search(fares, {"query": {"prefix": {"sk": "JFK#"}}})
    assert res["hits"].count() == fares.filter(F.col("sk").startswith("JFK#")).count()

    res = execute_search(fares, {"query": {"wildcard": {"sk": "*nonstop"}}})
    assert res["hits"].count() == fares.filter(F.col("sk").endswith("nonstop")).count()

    some_id = fares.select("_id").collect()[0]._id
    res = execute_search(fares, {"query": {"ids": {"values": [some_id]}}})
    assert res["hits"].count() == 1


def test_match_analyzed(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # 'spark' as an analyzed token, not substring: "sparkly" must not match
    res = execute_search(docs, {"query": {"match": {"text": "spark merge"}}})
    got = res["hits"].count()
    toks = F.split(F.lower(F.col("text")), r"[^\p{L}\p{Nd}]+")
    expected = docs.filter(
        F.array_contains(toks, "spark") | F.array_contains(toks, "merge")
    ).count()
    assert got == expected

    res_and = execute_search(
        docs, {"query": {"match": {"text": {"query": "spark merge", "operator": "and"}}}}
    )
    expected_and = docs.filter(
        F.array_contains(toks, "spark") & F.array_contains(toks, "merge")
    ).count()
    assert res_and["hits"].count() == expected_and
    assert res_and["hits"].count() <= got


def test_match_phrase(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    res = execute_search(docs, {"query": {"match_phrase": {"text": "batch stream"}}})
    assert res["hits"].count() == docs.filter(F.col("text").contains("batch stream")).count()


def test_sort_from_size(fares):
    body = {
        "query": {"match_all": {}},
        "sort": [{"sk": {"order": "desc"}}],
        "from": 2,
        "size": 3,
    }
    res = execute_search(fares, body)
    got = [r.sk for r in res["hits"].select("sk").collect()]
    expected = [r.sk for r in fares.orderBy(F.col("sk").desc()).select("sk").collect()][2:5]
    assert got == expected


def test_terms_agg_with_metrics_and_top_hits(fares):
    body = {
        "query": {"match_all": {}},
        "size": 0,
        "aggs": {
            "by_class": {
                "terms": {"field": "fare_class", "size": 5},
                "aggs": {
                    "n_dests": {"cardinality": {"field": "dest", "exact": True}},
                    "latest": {
                        "top_hits": {"size": 1, "sort": [{"start_ts": {"order": "desc"}}]}
                    },
                },
            }
        },
    }
    res = execute_search(fares, body)
    buckets = res["aggregations"]["by_class"]["buckets"]
    assert {b["key"] for b in buckets} == {"nonstop", "direct"}
    total = sum(b["doc_count"] for b in buckets)
    assert total == fares.count()
    for b in buckets:
        assert b["n_dests"]["value"] >= 1
        assert len(b["latest"]["hits"]) == 1


def test_date_histogram_agg(spark, sf_dir):
    from opensearch_dynamodb_etl_cdk_spark.session import load_tables

    events = load_tables(spark, sf_dir, ["events"])["events"]
    body = {
        "aggs": {
            "per_day": {
                "date_histogram": {"field": "ts", "calendar_interval": "day"},
                "aggs": {"v": {"sum": {"field": "value"}}},
            }
        }
    }
    res = execute_search(events, body)
    buckets = res["aggregations"]["per_day"]["buckets"]
    assert sum(b["doc_count"] for b in buckets) == events.count()
    assert all(b["v"]["value"] is not None for b in buckets)


def test_stats_and_percentiles(spark, sf_dir):
    from opensearch_dynamodb_etl_cdk_spark.session import load_tables

    events = load_tables(spark, sf_dir, ["events"])["events"]
    res = execute_search(
        events,
        {
            "query": {"term": {"event_type": "click"}},
            "aggs": {"s": {"stats": {"field": "value"}}},
        },
    )
    s = res["aggregations"]["s"]
    assert s["count"] == events.filter(F.col("event_type") == "click").count()
    assert s["min"] <= s["avg"] <= s["max"]


def test_nested_terms_terms_metric(fares):
    """terms→terms→metric: per fare_class, the top origins with their max
    start_ts — OpenSearch response shape, one Spark plan."""
    body = {
        "size": 0,
        "aggs": {
            "by_class": {
                "terms": {"field": "fare_class", "size": 5},
                "aggs": {
                    "by_origin": {
                        "terms": {"field": "origin", "size": 3},
                        "aggs": {"latest": {"max": {"field": "start_ts"}}},
                    }
                },
            }
        },
    }
    res = execute_search(fares, body)
    buckets = res["aggregations"]["by_class"]["buckets"]
    assert {b["key"] for b in buckets} == {"nonstop", "direct"}
    for b in buckets:
        inner = b["by_origin"]["buckets"]
        assert 1 <= len(inner) <= 3
        # ordered by doc_count desc
        counts = [ib["doc_count"] for ib in inner]
        assert counts == sorted(counts, reverse=True)
        for ib in inner:
            assert ib["latest"]["value"] is not None
        # child doc_counts sum to ≤ parent doc_count
        assert sum(counts) <= b["doc_count"]


def test_nested_terms_rejects_third_bucket_level(fares):
    body = {
        "aggs": {
            "a": {
                "terms": {"field": "fare_class"},
                "aggs": {
                    "b": {
                        "terms": {"field": "origin"},
                        "aggs": {"c": {"terms": {"field": "dest"}}},
                    }
                },
            }
        }
    }
    with pytest.raises(ValueError, match="metrics"):
        execute_search(fares, body)


def test_fixed_interval_histogram(spark, sf_dir):
    from opensearch_dynamodb_etl_cdk_spark.session import load_tables

    events = load_tables(spark, sf_dir, ["events"])["events"]
    body = {
        "aggs": {
            "per_12h": {
                "date_histogram": {"field": "ts", "fixed_interval": "12h"},
                "aggs": {"v": {"sum": {"field": "value"}}},
            }
        }
    }
    res = execute_search(events, body)
    buckets = res["aggregations"]["per_12h"]["buckets"]
    assert sum(b["doc_count"] for b in buckets) == events.count()
    # every bucket key is 12h-aligned
    for b in buckets:
        assert b["key"].hour in (0, 12)
        assert b["key"].minute == 0 and b["key"].second == 0
    with pytest.raises(ValueError, match="fixed_interval"):
        execute_search(
            events,
            {"aggs": {"x": {"date_histogram": {"field": "ts", "fixed_interval": "1q"}}}},
        )


def test_minimum_should_match_percentage(fares):
    clauses = [
        {"term": {"fare_class": "nonstop"}},
        {"prefix": {"sk": "JFK#"}},
        {"term": {"pk": "DEN"}},
    ]
    body_pct = {"query": {"bool": {"should": clauses, "minimum_should_match": "67%"}}}
    body_two = {"query": {"bool": {"should": clauses, "minimum_should_match": 2}}}
    n_pct = execute_search(fares, body_pct)["hits"].count()
    n_two = execute_search(fares, body_two)["hits"].count()
    assert n_pct == n_two  # floor(3 × 0.67) = 2
    body_neg = {"query": {"bool": {"should": clauses, "minimum_should_match": -1}}}
    assert execute_search(fares, body_neg)["hits"].count() == n_two


def test_top_hits_high_cardinality_bounded(spark):
    """top_hits under terms on a high-cardinality field: results cover
    exactly the selected top-`size` buckets (the collect is bounded to
    size × th_size rows via the bucket-key semi-join) and each bucket's
    hit is its true per-group maximum."""
    rows = [(i, f"g{i % 200:03d}", float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    body = {
        "size": 0,
        "aggs": {
            "g": {
                "terms": {"field": "grp", "size": 3},
                "aggs": {
                    "top": {"top_hits": {"size": 2, "sort": [{"v": {"order": "desc"}}]}}
                },
            }
        },
    }
    res = execute_search(df, body)
    buckets = res["aggregations"]["g"]["buckets"]
    assert len(buckets) == 3
    assert sum(len(b["top"]["hits"]) for b in buckets) <= 3 * 2
    for b in buckets:
        grp_max = max(v for _, g, v in rows if g == b["key"])
        assert b["top"]["hits"][0]["v"] == grp_max


def test_percentiles_special_char_field(spark):
    """Field names are identifiers, not SQL: a name that would break a
    string-interpolated expression must work (injection-safe path)."""
    df = spark.createDataFrame(
        [(float(i),) for i in range(101)], ["the value"]
    )
    res = execute_search(
        df,
        {"aggs": {"p": {"percentiles": {"field": "the value", "percents": [50.0]}}}},
    )
    assert res["aggregations"]["p"]["value"] == [50.0]


def test_range_agg_one_pass(spark, sf_dir):
    from opensearch_dynamodb_etl_cdk_spark.session import load_tables

    events = load_tables(spark, sf_dir, ["events"])["events"]
    body = {
        "aggs": {
            "v_ranges": {
                "range": {
                    "field": "value",
                    "ranges": [
                        {"to": 10.0},
                        {"from": 10.0, "to": 100.0, "key": "mid"},
                        {"from": 100.0},
                    ],
                },
                "aggs": {"m": {"max": {"field": "value"}}},
            }
        }
    }
    res = execute_search(events, body)
    buckets = res["aggregations"]["v_ranges"]["buckets"]
    assert [b["key"] for b in buckets] == ["*-10.0", "mid", "100.0-*"]
    n_null = events.filter(F.col("value").isNull()).count()
    assert sum(b["doc_count"] for b in buckets) == events.count() - n_null
    mid = buckets[1]
    want = events.filter(
        (F.col("value") >= 10.0) & (F.col("value") < 100.0)
    )
    assert mid["doc_count"] == want.count()
    assert mid["m"]["value"] == want.agg(F.max("value")).collect()[0][0]


def test_filters_and_filter_and_missing_aggs(fares):
    body = {
        "aggs": {
            "by_kind": {
                "filters": {
                    "filters": {
                        "nonstop": {"term": {"fare_class": "nonstop"}},
                        "from_den": {"term": {"pk": "DEN"}},
                    }
                },
                "aggs": {"dests": {"cardinality": {"field": "dest", "exact": True}}},
            },
            "only_nonstop": {
                "filter": {"term": {"fare_class": "nonstop"}},
                "aggs": {"dests": {"cardinality": {"field": "dest", "exact": True}}},
            },
            "no_seat": {"missing": {"field": "seat"}},
        }
    }
    res = execute_search(fares, body)
    fb = res["aggregations"]["by_kind"]["buckets"]
    n_nonstop = fares.filter(F.col("fare_class") == "nonstop").count()
    assert fb["nonstop"]["doc_count"] == n_nonstop
    assert fb["nonstop"]["dests"]["value"] >= 1
    assert res["aggregations"]["only_nonstop"]["doc_count"] == n_nonstop
    assert (
        res["aggregations"]["only_nonstop"]["dests"]["value"]
        == fb["nonstop"]["dests"]["value"]
    )
    assert res["aggregations"]["no_seat"]["doc_count"] == fares.filter(
        F.col("seat").isNull()
    ).count()


def test_unsupported_clause_raises():
    with pytest.raises(ValueError, match="unsupported query kind"):
        compile_query({"more_like_this": {"x": "y"}})


def test_fuzzy_clause(spark):
    df = spark.createDataFrame(
        [(1, "the quick spark engine"), (2, "nothing relevant here")],
        "doc_id long, text string",
    )
    hits = df.filter(
        compile_query({"fuzzy": {"text": {"value": "spak", "fuzziness": 1}}})
    ).collect()
    assert [r.doc_id for r in hits] == [1]


def test_regexp_clause(spark):
    df = spark.createDataFrame(
        [(1, "red rose"), (2, "dark red rose"), (3, "green leaf")],
        "doc_id long, text string",
    )
    hits = df.filter(compile_query({"regexp": {"text": "(red|green).*"}})).collect()
    assert sorted(r.doc_id for r in hits) == [1, 3]  # whole-value anchored


def test_multi_match_and_constant_score(spark, sf_dir):
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    hits = p.filter(
        compile_query(
            {"multi_match": {"query": "blue PROMO", "fields": ["p_name", "p_type"]}}
        )
    )
    def has(col, tok):
        return F.array_contains(F.split(F.lower(col), r"[^\p{L}\p{Nd}]+"), tok)

    expected = p.filter(
        has("p_name", "blue")
        | has("p_name", "promo")
        | has("p_type", "blue")
        | has("p_type", "promo")
    )
    assert hits.count() == expected.count() > 0
    # constant_score is a transparent wrapper around its filter
    cs = p.filter(
        compile_query({"constant_score": {"filter": {"term": {"p_type": "PROMO"}}}})
    )
    assert cs.count() == p.filter(F.col("p_type") == "PROMO").count()


def test_bool_minimum_should_match_counts(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
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
    got = c.filter(compile_query(q)).count()
    n_sat = (
        (F.col("c_mktsegment") == "BUILDING").cast("int")
        + (F.col("c_acctbal") >= 5000).cast("int")
        + F.col("c_name").endswith("1").cast("int")
    )
    expected = c.filter(n_sat >= 2).count()
    assert got == expected > 0


def test_numeric_histogram_agg(spark, sf_dir):
    from opensearch_dynamodb_etl_cdk_spark.session import load_tables

    events = load_tables(spark, sf_dir, ["events"])["events"]
    body = {
        "aggs": {
            "v_hist": {
                "histogram": {"field": "value", "interval": 50.0},
                "aggs": {"m": {"min": {"field": "value"}}},
            }
        }
    }
    res = execute_search(events, body)
    buckets = res["aggregations"]["v_hist"]["buckets"]
    n_notnull = events.filter(F.col("value").isNotNull()).count()
    assert sum(b["doc_count"] for b in buckets) == n_notnull
    for b in buckets:
        assert b["key"] % 50.0 == 0
        assert b["key"] <= b["m"]["value"] < b["key"] + 50.0


def test_search_after_keyset_pagination(spark, sf_dir):
    from opensearch_dynamodb_etl_cdk_spark.session import load_tables

    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    sort = [{"o_totalprice": "desc"}, {"o_orderkey": "asc"}]
    page1 = execute_search(o, {"sort": sort, "size": 5})["hits"].collect()
    cursor = [page1[-1]["o_totalprice"], page1[-1]["o_orderkey"]]
    page2 = execute_search(
        o, {"sort": sort, "search_after": cursor, "size": 5}
    )["hits"].collect()
    # keyset page 2 == offset page 2
    offset2 = execute_search(o, {"sort": sort, "from": 5, "size": 5})[
        "hits"
    ].collect()
    key = lambda r: (r["o_totalprice"], r["o_orderkey"])
    assert [key(r) for r in page2] == [key(r) for r in offset2]
    # no overlap with page 1, strictly after the cursor
    assert {r["o_orderkey"] for r in page1}.isdisjoint(
        {r["o_orderkey"] for r in page2}
    )
    # the cursor filter is a pushed-down predicate, not an offset:
    # the physical plan must contain no GlobalLimit-with-offset
    plan = execute_search(o, {"sort": sort, "search_after": cursor, "size": 5})[
        "hits"
    ]._jdf.queryExecution().executedPlan().toString()
    assert "offset" not in plan.lower()


def test_search_after_requires_sort_and_matching_arity(spark, sf_dir):
    from opensearch_dynamodb_etl_cdk_spark.session import load_tables

    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    with pytest.raises(ValueError, match="requires an explicit sort"):
        execute_search(o, {"search_after": [1]})
    with pytest.raises(ValueError, match="one per sort key"):
        execute_search(
            o, {"sort": [{"o_totalprice": "desc"}], "search_after": [1.0, 2]}
        )
    with pytest.raises(ValueError, match="mutually exclusive"):
        execute_search(
            o,
            {"sort": [{"o_totalprice": "desc"}], "search_after": [1.0], "from": 3},
        )


def test_collapse_one_hit_per_field_value(spark, sf_dir):
    from opensearch_dynamodb_etl_cdk_spark.session import load_tables

    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    res = execute_search(
        o,
        {
            "collapse": {"field": "o_custkey"},
            "sort": [{"o_totalprice": "desc"}, {"o_orderkey": "asc"}],
            "size": 10,
        },
    )
    rows = res["hits"].collect()
    assert len(rows) == 10
    # one hit per collapse key
    assert len({r["o_custkey"] for r in rows}) == 10
    # each survivor is its customer's best order under the sort
    from pyspark.sql import Window as W

    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    best = {
        r["o_custkey"]: r["o_orderkey"]
        for r in o.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .collect()
    }
    for r in rows:
        assert best[r["o_custkey"]] == r["o_orderkey"]


def test_significant_terms_keyword_field(spark, sf_dir):
    from opensearch_dynamodb_etl_cdk_spark.session import load_tables

    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    res = execute_search(
        o,
        {
            "query": {"range": {"o_totalprice": {"gte": 40000}}},
            "aggs": {
                "sig": {
                    "significant_terms": {"field": "o_orderpriority", "size": 3}
                }
            },
        },
    )
    buckets = res["aggregations"]["sig"]["buckets"]
    assert 0 < len(buckets) <= 3
    fg_total = o.filter(F.col("o_totalprice") >= 40000).count()
    bg_total = o.count()
    for b in buckets:
        # JLH score recomputed from the reported counts must agree
        fg_pct = b["doc_count"] / fg_total
        bg_pct = b["bg_count"] / bg_total
        assert fg_pct > bg_pct  # only over-represented terms
        assert b["score"] == pytest.approx((fg_pct - bg_pct) * (fg_pct / bg_pct))
    # descending score order
    scores = [b["score"] for b in buckets]
    assert scores == sorted(scores, reverse=True)


def test_significant_terms_analyzed_text(fares):
    res = execute_search(
        fares,
        {
            "query": {"term": {"pk": "DEN"}},
            "aggs": {
                "sig": {
                    "significant_terms": {
                        "field": "sk", "size": 5, "analyzed": True,
                    }
                }
            },
        },
    )
    buckets = res["aggregations"]["sig"]["buckets"]
    assert buckets, "DEN fares must surface at least one significant sk token"
    # sk is DEST#ts#class: DEN's dominant destination token (atl in the
    # fixture corpus) must rank first — it is the most over-represented
    # token of DEN's sort keys relative to the whole corpus
    assert buckets[0]["key"] == "atl"
    assert buckets[0]["doc_count"] == 3


def test_search_after_pred_matches_tuple_order(spark):
    """Property: the lexicographic cursor predicate selects exactly the
    rows strictly after the cursor under Python tuple ordering with the
    same per-field directions."""
    from hypothesis import given, settings, strategies as st
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        _search_after_pred,
    )

    rows = [(a, b, i) for i, (a, b) in enumerate(
        [(x, y) for x in range(4) for y in range(4)]
    )]
    df = spark.createDataFrame(rows, "a int, b int, id int").cache()
    sort = [{"a": "asc"}, {"b": "desc"}, {"id": "asc"}]

    def key(r):
        return (r[0], -r[1], r[2])

    @settings(max_examples=20, deadline=None)
    @given(st.integers(0, 3), st.integers(0, 3), st.integers(0, 15))
    def check(ca, cb, cid):
        cursor = (ca, cb, cid)
        got = {
            r["id"]
            for r in df.filter(
                _search_after_pred(sort, list(cursor))
            ).collect()
        }
        expected = {r[2] for r in rows if key(r) > (ca, -cb, cid)}
        assert got == expected

    check()


def test_composite_agg_pagination(spark, sf_dir):
    """composite: walk ALL (event_type, day) buckets in key order via the
    after-cursor; pages must tile the full bucket set without overlap."""
    from opensearch_dynamodb_etl_cdk_spark.session import load_tables

    events = load_tables(spark, sf_dir, ["events"])["events"]
    total = (
        events.groupBy("event_type", F.date_trunc("day", "ts")).count().count()
    )
    body = {
        "size": 0,
        "aggs": {
            "pages": {
                "composite": {
                    "sources": [
                        {"event_type": {"terms": {"field": "event_type"}}},
                        {"day": {"date_histogram": {"field": "ts",
                                                    "calendar_interval": "day"}}},
                    ],
                    "size": 7,
                }
            }
        },
    }
    seen = []
    for _ in range(100):
        res = execute_search(events, body)["aggregations"]["pages"]
        for b in res["buckets"]:
            seen.append((b["key"]["event_type"], b["key"]["day"]))
        if "after_key" not in res:
            break
        body["aggs"]["pages"]["composite"]["after"] = res["after_key"]
    assert len(seen) == total == len(set(seen))
    assert seen == sorted(seen)


def test_multi_terms_agg(spark, sf_dir):
    from opensearch_dynamodb_etl_cdk_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    res = execute_search(
        docs,
        {"size": 0, "aggs": {
            "pairs": {"multi_terms": {
                "terms": [{"field": "lang"}, {"field": "source"}], "size": 5}}}},
    )
    buckets = res["aggregations"]["pairs"]["buckets"]
    assert len(buckets) == 5
    counts = [b["doc_count"] for b in buckets]
    assert counts == sorted(counts, reverse=True)
    top = docs.groupBy("lang", "source").count().agg(F.max("count")).collect()[0][0]
    assert buckets[0]["doc_count"] == top


def test_extended_stats_agg(spark, sf_dir):
    from opensearch_dynamodb_etl_cdk_spark.session import load_tables

    events = load_tables(spark, sf_dir, ["events"])["events"]
    res = execute_search(
        events, {"size": 0, "aggs": {"es": {"extended_stats": {"field": "value"}}}}
    )
    es = res["aggregations"]["es"]
    assert es["count"] == events.count()
    assert es["variance"] >= 0
    assert abs(es["std_deviation"] ** 2 - es["variance"]) < 1e-9
    assert abs(es["avg"] - es["sum"] / es["count"]) < 1e-9


def test_pipeline_cumulative_sum_and_derivative(spark, sf_dir):
    from opensearch_dynamodb_etl_cdk_spark.session import load_tables

    events = load_tables(spark, sf_dir, ["events"])["events"]
    body = {
        "size": 0,
        "aggs": {
            "per_day": {
                "date_histogram": {"field": "ts", "calendar_interval": "day"},
                "aggs": {
                    "v": {"sum": {"field": "value"}},
                    "cum": {"cumulative_sum": {"buckets_path": "v"}},
                    "delta": {"derivative": {"buckets_path": "v"}},
                    "cum_n": {"cumulative_sum": {"buckets_path": "_count"}},
                },
            }
        },
    }
    buckets = execute_search(events, body)["aggregations"]["per_day"]["buckets"]
    assert buckets[0]["delta"]["value"] is None
    run = 0.0
    for i, b in enumerate(buckets):
        run += b["v"]["value"]
        assert abs(b["cum"]["value"] - run) < 1e-6
        if i:
            assert abs(
                b["delta"]["value"]
                - (b["v"]["value"] - buckets[i - 1]["v"]["value"])
            ) < 1e-9
    assert buckets[-1]["cum_n"]["value"] == sum(b["doc_count"] for b in buckets)


def test_rare_terms_agg(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 2 + [("c",), ("d",), (None,)],
        "k string",
    )
    res = execute_search(
        df,
        {"size": 0, "aggs": {
            "tail": {"rare_terms": {"field": "k", "max_doc_count": 2}}}},
    )
    buckets = res["aggregations"]["tail"]["buckets"]
    assert [(b["key"], b["doc_count"]) for b in buckets] == [
        ("c", 1), ("d", 1), ("b", 2)]


def test_weighted_avg_agg(spark):
    df = spark.createDataFrame(
        [(10.0, 1.0), (20.0, 3.0)], "v double, w double"
    )
    res = execute_search(
        df,
        {"size": 0, "aggs": {
            "wa": {"weighted_avg": {"value": {"field": "v"},
                                    "weight": {"field": "w"}}}}},
    )
    assert abs(res["aggregations"]["wa"]["value"] - 17.5) < 1e-9


def test_sibling_pipeline_bucket_aggs(spark, sf_dir):
    from opensearch_dynamodb_etl_cdk_spark.session import load_tables

    events = load_tables(spark, sf_dir, ["events"])["events"]
    body = {
        "size": 0,
        "aggs": {
            "per_day": {
                "date_histogram": {"field": "ts", "calendar_interval": "day"},
                "aggs": {"v": {"sum": {"field": "value"}}},
            },
            "avg_daily": {"avg_bucket": {"buckets_path": "per_day>v"}},
            "best_day": {"max_bucket": {"buckets_path": "per_day>v"}},
            "total": {"sum_bucket": {"buckets_path": "per_day>v"}},
            "day_stats": {"stats_bucket": {"buckets_path": "per_day>_count"}},
        },
    }
    aggs = execute_search(events, body)["aggregations"]
    vals = [b["v"]["value"] for b in aggs["per_day"]["buckets"]]
    assert abs(aggs["avg_daily"]["value"] - sum(vals) / len(vals)) < 1e-6
    assert aggs["best_day"]["value"] == max(vals)
    assert abs(aggs["total"]["value"] - sum(vals)) < 1e-6
    assert aggs["day_stats"]["count"] == len(vals)
    assert aggs["day_stats"]["sum"] == events.count()


def test_sibling_pipeline_requires_existing_source():
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        _run_sibling_pipeline,
    )

    with pytest.raises(ValueError, match="no sibling"):
        _run_sibling_pipeline({}, {"avg_bucket": {"buckets_path": "nope>v"}})


def test_percentile_ranks(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    res = execute_search(
        df,
        {"size": 0, "aggs": {
            "pr": {"percentile_ranks": {"field": "v", "values": [25, 50, 99.5]}}}},
    )
    ranks = res["aggregations"]["pr"]["values"]
    assert ranks["25"] == 25.0 and ranks["50"] == 50.0 and ranks["99.5"] == 99.0


def test_moving_fn_and_serial_diff(spark):
    # 5 daily buckets with known sums: 10, 20, 40, 30, 50
    rows = []
    for day, v in [(1, 10.0), (2, 20.0), (3, 40.0), (4, 30.0), (5, 50.0)]:
        rows.append((f"2024-01-0{day} 00:00:00", v))
    df = spark.createDataFrame(rows, "ts_s string, value double").select(
        F.to_timestamp("ts_s").alias("ts"), "value"
    )
    body = {
        "size": 0,
        "aggs": {
            "per_day": {
                "date_histogram": {"field": "ts", "calendar_interval": "day"},
                "aggs": {
                    "v": {"sum": {"field": "value"}},
                    "ma": {"moving_fn": {
                        "buckets_path": "v", "window": 2,
                        "script": "MovingFunctions.unweightedAvg(values)"}},
                    "mmax": {"moving_fn": {
                        "buckets_path": "v", "window": 2,
                        "script": "MovingFunctions.max(values)"}},
                    "d2": {"serial_diff": {"buckets_path": "v", "lag": 2}},
                },
            }
        },
    }
    b = execute_search(df, body)["aggregations"]["per_day"]["buckets"]
    # window = 2 PRECEDING buckets, excluding current (shift 0)
    assert b[0]["ma"]["value"] is None
    assert b[1]["ma"]["value"] == 10.0
    assert b[2]["ma"]["value"] == 15.0      # avg(10, 20)
    assert b[3]["ma"]["value"] == 30.0      # avg(20, 40)
    assert b[4]["mmax"]["value"] == 40.0    # max(40, 30)
    assert [x["d2"]["value"] for x in b] == [None, None, 30.0, 10.0, 10.0]


def test_bucket_script_selector_sort(spark):
    rows = (
        [("a", 10.0)] * 4 + [("b", 1.0)] * 2 + [("c", 100.0)] * 3
        + [("d", 5.0)] * 1
    )
    df = spark.createDataFrame(rows, "k string, value double")
    body = {
        "size": 0,
        "aggs": {
            "byk": {
                "terms": {"field": "k"},
                "aggs": {
                    "v": {"sum": {"field": "value"}},
                    "per_doc": {"bucket_script": {
                        "buckets_path": {"s": "v", "n": "_count"},
                        "script": "params.s / params.n"}},
                    "keep": {"bucket_selector": {
                        "buckets_path": {"n": "_count"},
                        "script": "params.n >= 2"}},
                    "order": {"bucket_sort": {
                        "sort": [{"per_doc": {"order": "desc"}}], "size": 2}},
                },
            }
        },
    }
    b = execute_search(df, body)["aggregations"]["byk"]["buckets"]
    # d (1 doc) dropped by the selector; remaining sorted by per-doc
    # value desc (c=100, a=10, b=1) and truncated to 2
    assert [x["key"] for x in b] == ["c", "a"]
    assert b[0]["per_doc"]["value"] == 100.0 and b[1]["per_doc"]["value"] == 10.0


def test_bucket_script_rejects_hostile_input(spark):
    df = spark.createDataFrame([("a", 1.0)], "k string, value double")
    body = {
        "size": 0,
        "aggs": {
            "byk": {
                "terms": {"field": "k"},
                "aggs": {
                    "v": {"sum": {"field": "value"}},
                    "x": {"bucket_script": {
                        "buckets_path": {"s": "v"},
                        "script": "__import__('os').system('true')"}},
                },
            }
        },
    }
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unsupported script construct"):
        execute_search(df, body)


def test_date_range_agg(spark, sf_dir):
    from opensearch_dynamodb_etl_cdk_spark.session import load_tables

    events = load_tables(spark, sf_dir, ["events"])["events"]
    body = {
        "size": 0,
        "aggs": {
            "eras": {
                "date_range": {
                    "field": "ts",
                    "ranges": [
                        {"key": "early", "to": "2024-01-11"},
                        {"key": "late", "from": "2024-01-11"},
                    ],
                },
                "aggs": {"v": {"sum": {"field": "value"}}},
            }
        },
    }
    b = execute_search(events, body)["aggregations"]["eras"]["buckets"]
    assert [x["key"] for x in b] == ["early", "late"]
    cutoff = F.to_timestamp(F.lit("2024-01-11"))
    assert b[0]["doc_count"] == events.filter(F.col("ts") < cutoff).count()
    assert b[1]["doc_count"] == events.filter(F.col("ts") >= cutoff).count()
    assert b[0]["doc_count"] + b[1]["doc_count"] == events.count()
    assert b[0]["v"]["value"] is not None


def test_adjacency_matrix_agg(spark):
    rows = [
        ("click", 5.0), ("click", 50.0), ("view", 50.0),
        ("view", 1.0), ("purchase", 99.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, value double")
    body = {
        "size": 0,
        "aggs": {
            "m": {
                "adjacency_matrix": {
                    "filters": {
                        "clicks": {"term": {"event_type": "click"}},
                        "big": {"range": {"value": {"gte": 40}}},
                    }
                }
            }
        },
    }
    b = {x["key"]: x["doc_count"] for x in
         execute_search(df, body)["aggregations"]["m"]["buckets"]}
    assert b == {"clicks": 2, "big": 3, "clicks&big": 1}


# --- query_string / simple_query_string ----------------------------------


@pytest.fixture(scope="module")
def qs_docs(spark):
    rows = [
        (0, "alpha bravo charlie", "en", 10),
        (1, "alpha delta", "en", 25),
        (2, "bravo echo", "de", 40),
        (3, "charlie delta echo", "en", 55),
        (4, "Foxtrot golf", "fr", 70),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n int"
    ).cache()
    df.count()
    return df


def _ids(df, clause):
    return {r.doc_id for r in df.filter(compile_query(clause)).collect()}


def test_query_string_fields_and_bool(qs_docs):
    q = {"query_string": {"query": "text:alpha AND lang:en"}}
    assert _ids(qs_docs, q) == {0, 1}
    q = {"query_string": {"query": "alpha OR echo", "default_field": "text"}}
    assert _ids(qs_docs, q) == {0, 1, 2, 3}
    q = {"query_string": {"query": "lang:en AND NOT delta",
                          "default_field": "text"}}
    assert _ids(qs_docs, q) == {0}


def test_query_string_ranges_and_comparisons(qs_docs):
    assert _ids(qs_docs, {"query_string": {"query": "n:[25 TO 55]"}}) == {1, 2, 3}
    assert _ids(qs_docs, {"query_string": {"query": "n:{25 TO 55}"}}) == {2}
    assert _ids(qs_docs, {"query_string": {"query": "n:>=55"}}) == {3, 4}
    assert _ids(qs_docs, {"query_string": {"query": "n:[40 TO *]"}}) == {2, 3, 4}


def test_query_string_signs_wildcard_phrase_group(qs_docs):
    q = {"query_string": {"query": "+alpha -delta", "default_field": "text"}}
    assert _ids(qs_docs, q) == {0}
    q = {"query_string": {"query": "text:Fox*"}}
    assert _ids(qs_docs, q) == {4}
    q = {"query_string": {"query": '"alpha bravo"', "default_field": "text"}}
    assert _ids(qs_docs, q) == {0}
    q = {"query_string": {"query": "text:(alpha OR echo)"}}
    assert _ids(qs_docs, q) == {0, 1, 2, 3}


def test_query_string_fields_list_and_default_and(qs_docs):
    q = {"query_string": {"query": "de", "fields": ["text", "lang"]}}
    assert _ids(qs_docs, q) == {2}
    q = {"query_string": {"query": "alpha charlie", "default_field": "text",
                          "default_operator": "and"}}
    assert _ids(qs_docs, q) == {0}
    q = {"query_string": {"query": "alpha charlie", "default_field": "text"}}
    assert _ids(qs_docs, q) == {0, 1, 3}


def test_query_string_errors():
    with pytest.raises(ValueError):
        compile_query({"query_string": {"query": "no_field_anywhere"}})
    with pytest.raises(ValueError):
        compile_query(
            {"query_string": {"query": "(a OR b", "default_field": "text"}}
        )


def test_simple_query_string(qs_docs):
    q = {"simple_query_string": {"query": "alpha | echo", "fields": ["text"]}}
    assert _ids(qs_docs, q) == {0, 1, 2, 3}
    q = {"simple_query_string": {"query": "alpha -delta", "fields": ["text"],
                                 "default_operator": "and"}}
    assert _ids(qs_docs, q) == {0}
    q = {"simple_query_string": {"query": "brav*", "fields": ["text"]}}
    assert _ids(qs_docs, q) == {2}
    q = {"simple_query_string": {"query": '"charlie delta"', "fields": ["text"]}}
    assert _ids(qs_docs, q) == {3}
    q = {"simple_query_string": {"query": "charlie + echo", "fields": ["text"]}}
    assert _ids(qs_docs, q) == {3}


def test_query_string_through_execute_search(qs_docs):
    body = {
        "query": {"query_string": {"query": "lang:en AND (alpha OR echo)",
                                   "default_field": "text"}},
        "sort": [{"doc_id": "asc"}],
        "size": 10,
    }
    res = execute_search(qs_docs, body)
    assert [r.doc_id for r in res["hits"].collect()] == [0, 1, 3]


# --- knn vector search ----------------------------------------------------


@pytest.fixture(scope="module")
def knn_docs(spark):
    # Unit-ish vectors with known cosine ordering vs the query [1, 0]:
    # doc 0 is identical, 1 is close, 2 orthogonal-ish, 3 opposite.
    rows = [
        (0, [1.0, 0.0], "en"),
        (1, [0.9, 0.1], "en"),
        (2, [0.1, 0.9], "de"),
        (3, [-1.0, 0.0], "en"),
        (4, [0.7, 0.3], "de"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, lang string"
    ).cache()
    df.count()
    return df


def test_knn_topk_order_and_score(knn_docs):
    body = {"query": {"knn": {"embedding": {"vector": [1.0, 0.0], "k": 3}}}}
    hits = execute_search(knn_docs, body)["hits"].collect()
    assert [r.vec_id for r in hits] == [0, 1, 4]
    assert hits[0]._score == pytest.approx(1.0)
    assert hits[0]._score >= hits[1]._score >= hits[2]._score


def test_knn_prefilter_and_min_score(knn_docs):
    body = {"query": {"knn": {"embedding": {
        "vector": [1.0, 0.0], "k": 5, "filter": {"term": {"lang": "de"}}}}}}
    hits = execute_search(knn_docs, body)["hits"].collect()
    assert [r.vec_id for r in hits] == [4, 2]  # pre-filter, then score order
    body["query"]["knn"]["embedding"]["min_score"] = 0.5
    hits = execute_search(knn_docs, body)["hits"].collect()
    assert [r.vec_id for r in hits] == [4]


def test_knn_k_defaults_to_size_and_aggs_over_knn_hits(knn_docs):
    body = {
        "query": {"knn": {"embedding": {"vector": [1.0, 0.0]}}},
        "size": 2,
        "aggs": {"langs": {"terms": {"field": "lang"}}},
    }
    res = execute_search(knn_docs, body)
    assert [r.vec_id for r in res["hits"].collect()] == [0, 1]
    # aggregations run over the k retrieved hits, not the whole corpus
    buckets = {b["key"]: b["doc_count"]
               for b in res["aggregations"]["langs"]["buckets"]}
    assert buckets == {"en": 2}


# --- term suggester -------------------------------------------------------


def test_term_suggest_ranks_by_distance_then_freq(qs_docs):
    from opensearch_dynamodb_etl_cdk_spark.operators.search import term_suggest

    # vocabulary: alpha(x2) bravo(x2) charlie(x2) delta(x2) echo(x2)
    # foxtrot golf; query 'deltaa' → delta (1 edit)
    rows = term_suggest(qs_docs, "text", "deltaa", size=3).collect()
    assert rows[0].term == "delta"
    assert rows[0].freq == 2
    assert rows[0].score == pytest.approx(1.0 - 1.0 / 6.0)


def test_term_suggest_prefix_pruning(qs_docs):
    from opensearch_dynamodb_etl_cdk_spark.operators.search import term_suggest

    # 'xcho' is 1 edit from 'echo' but prefix_length=1 prunes it
    assert term_suggest(qs_docs, "text", "xcho").count() == 0
    assert (
        term_suggest(qs_docs, "text", "xcho", prefix_length=0).collect()[0].term
        == "echo"
    )


def test_suggest_through_execute_search(qs_docs):
    body = {
        "query": {"match_all": {}},
        "size": 0,
        "suggest": {"fix": {"text": "alpa", "term": {"field": "text", "size": 2}}},
    }
    res = execute_search(qs_docs, body)
    opts = res["suggest"]["fix"][0]["options"]
    assert opts[0]["text"] == "alpha"
    assert opts[0]["freq"] == 2


# --- highlight ------------------------------------------------------------


def test_highlight_wraps_matched_terms(qs_docs):
    body = {
        "query": {"match": {"text": "alpha echo"}},
        "sort": [{"doc_id": "asc"}],
        "highlight": {"fields": {"text": {}}},
    }
    rows = execute_search(qs_docs, body)["hits"].collect()
    by_id = {r.doc_id: r._highlight_text for r in rows}
    assert by_id[0] == "<em>alpha</em> bravo charlie"
    assert by_id[3] == "charlie delta <em>echo</em>"


def test_highlight_custom_tags_and_case_preservation(qs_docs):
    body = {
        "query": {"match": {"text": "foxtrot"}},
        "highlight": {"fields": {"text": {}},
                      "pre_tags": ["<b>"], "post_tags": ["</b>"]},
    }
    rows = execute_search(qs_docs, body)["hits"].collect()
    # doc 4 text is "Foxtrot golf" — original case kept inside the tags
    assert rows[0]._highlight_text == "<b>Foxtrot</b> golf"


def test_highlight_skips_must_not_terms(qs_docs):
    body = {
        "query": {"bool": {"must": [{"match": {"text": "charlie"}}],
                           "must_not": [{"match": {"text": "alpha"}}]}},
        "sort": [{"doc_id": "asc"}],
        "highlight": {"fields": {"text": {}}},
    }
    rows = execute_search(qs_docs, body)["hits"].collect()
    assert [r.doc_id for r in rows] == [3]
    assert rows[0]._highlight_text == "<em>charlie</em> delta echo"


# --- percolator -----------------------------------------------------------


def test_percolate_attaches_matched_query_names(qs_docs):
    from opensearch_dynamodb_etl_cdk_spark.operators.search import percolate

    registry = {
        "has_alpha": {"match": {"text": "alpha"}},
        "big_n": {"range": {"n": {"gte": 50}}},
        "never": {"term": {"lang": "xx"}},
    }
    rows = {r.doc_id: set(r._matched_queries)
            for r in percolate(qs_docs, registry).collect()}
    assert rows[0] == {"has_alpha"}
    assert rows[1] == {"has_alpha"}
    assert rows[3] == {"big_n"}
    assert rows[4] == {"big_n"}
    assert rows[2] == set()


def test_percolate_only_matches_filter(qs_docs):
    from opensearch_dynamodb_etl_cdk_spark.operators.search import percolate

    registry = {"de_docs": {"term": {"lang": "de"}}}
    out = percolate(qs_docs, registry, only_matches=True).collect()
    assert [r.doc_id for r in out] == [2]


# --- phrase suggester -----------------------------------------------------


@pytest.fixture(scope="module")
def phrase_docs(spark):
    # bigram LM: "spark streaming" dominates; "spark query" rare;
    # "stream processing" present for the second position
    rows = [
        (0, "spark streaming guide"),
        (1, "spark streaming basics"),
        (2, "spark streaming internals"),
        (3, "spark query planner"),
        (4, "stream processing notes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").cache()
    df.count()
    return df


def test_phrase_suggest_corrects_both_terms(phrase_docs):
    from opensearch_dynamodb_etl_cdk_spark.operators.search import phrase_suggest

    opts = phrase_suggest(phrase_docs, "text", "spak streeming", size=3)
    assert opts[0]["text"] == "spark streaming"
    assert opts[0]["highlighted"] == "<em>spark</em> <em>streaming</em>"
    # scores are sorted descending
    scores = [o["score"] for o in opts]
    assert scores == sorted(scores, reverse=True)


def test_phrase_suggest_prefers_likely_bigram(phrase_docs):
    from opensearch_dynamodb_etl_cdk_spark.operators.search import phrase_suggest

    # 'spark streamin' could correct the 2nd term to 'streaming' (freq 3,
    # strong bigram) — must outrank any unigram-only alternative
    opts = phrase_suggest(phrase_docs, "text", "spark streamin", size=2)
    assert opts[0]["text"] == "spark streaming"
    # a known-correct phrase suggests itself first (identity candidate)
    opts = phrase_suggest(phrase_docs, "text", "spark query", size=1)
    assert opts[0]["text"] == "spark query"


def test_phrase_suggest_through_execute_search(phrase_docs):
    body = {
        "size": 0,
        "suggest": {"fix": {"text": "spak streeming",
                            "phrase": {"field": "text"}}},
    }
    res = execute_search(phrase_docs, body)
    assert res["suggest"]["fix"][0]["options"][0]["text"] == "spark streaming"


def test_phrase_suggest_candidate_collect_is_capped(spark):
    """A short input term matching a large vocabulary slice must not
    pull the whole slice to the driver: candidates are capped per term
    by corpus frequency — and the frequent true correction survives."""
    from opensearch_dynamodb_etl_cdk_spark.operators.search import phrase_suggest

    # 300 one-edit decoys of 'spark' (sparkN...) + the real term with
    # high frequency
    rows = [(i, f"spark{i:03d} noise") for i in range(300)]
    rows += [(1000 + i, "spark streaming") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    opts = phrase_suggest(df, "text", "spak streaming", size=1)
    assert opts[0]["text"] == "spark streaming"


def test_multiple_suggesters_share_one_vocabulary(phrase_docs):
    """Several suggesters over the same field in one request: results
    must match standalone runs (the vocabulary is computed once and
    shared — behavioral equivalence is the contract)."""
    body = {
        "size": 0,
        "suggest": {
            "t1": {"text": "spak", "term": {"field": "text"}},
            "t2": {"text": "streeming", "term": {"field": "text"}},
            "p1": {"text": "spak streeming", "phrase": {"field": "text"}},
        },
    }
    res = execute_search(phrase_docs, body)["suggest"]
    assert res["t1"][0]["options"][0]["text"] == "spark"
    assert res["t2"][0]["options"][0]["text"] == "streaming"
    assert res["p1"][0]["options"][0]["text"] == "spark streaming"


def test_suggest_accepts_persisted_vocab_frames(phrase_docs):
    """A standing corpus passes prebuilt vocab/bigram frames through
    execute_search; results must equal the per-request build."""
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        bigram_model,
        vocabulary,
    )

    v = vocabulary(phrase_docs, "text").persist()
    b = bigram_model(phrase_docs, "text").persist()
    try:
        body = {
            "size": 0,
            "suggest": {"fix": {"text": "spak streeming",
                                "phrase": {"field": "text"}}},
        }
        fresh = execute_search(phrase_docs, body)["suggest"]
        reused = execute_search(
            phrase_docs, body,
            suggest_vocabs={"text": v}, suggest_bigrams={"text": b},
        )["suggest"]
        assert fresh == reused
    finally:
        v.unpersist()
        b.unpersist()


def test_collapse_inner_hits_top_n_per_group(qs_docs):
    body = {
        "query": {"exists": {"field": "doc_id"}},
        "collapse": {"field": "lang", "inner_hits": {
            "name": "by_lang", "size": 2, "sort": [{"n": "desc"}]}},
        "sort": [{"lang": "asc"}],
    }
    res = execute_search(qs_docs, body)
    # collapsed hits: one per lang
    langs = [r.lang for r in res["hits"].collect()]
    assert langs == sorted(set(langs))
    # inner hits: top-2 per lang by n desc
    inner = res["inner_hits"]["by_lang"]
    rows = inner.collect()
    per_lang: dict[str, list[int]] = {}
    for r in sorted(rows, key=lambda r: (r.lang, -r.n)):
        per_lang.setdefault(r.lang, []).append(r.n)
    assert all(len(v) <= 2 for v in per_lang.values())
    full = {r.lang: sorted((x.n for x in qs_docs.collect()
                            if x.lang == r.lang), reverse=True)
            for r in rows}
    for lang, ns in per_lang.items():
        assert ns == full[lang][: len(ns)]


def test_profile_returns_physical_plan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    res = execute_search(
        docs,
        {"query": {"range": {"n_chars": {"gte": 100}}},
         "_source": ["doc_id"], "profile": True},
    )
    assert "profile" in res
    # the plan is the real executed plan: the pushed filter shows up
    assert "n_chars" in res["profile"]
    assert "FileScan" in res["profile"] or "Scan" in res["profile"]


def test_top_level_min_score_on_scored_queries(qs_docs):
    scored = execute_search(
        qs_docs,
        {"query": {"match": {"text": "alpha"}}, "track_scores": True,
         "_source": ["doc_id", "_score"]},
    )["hits"].collect()
    assert scored
    floor = sorted((r._score for r in scored), reverse=True)[0]
    kept = execute_search(
        qs_docs,
        {"query": {"match": {"text": "alpha"}}, "track_scores": True,
         "min_score": floor, "_source": ["doc_id", "_score"]},
    )["hits"].collect()
    assert all(r._score >= floor for r in kept) and len(kept) < len(scored) + 1
    # filter-context queries carry no _score: min_score is a no-op
    plain = execute_search(
        qs_docs, {"query": {"term": {"lang": "en"}}, "min_score": 99.0}
    )["hits"].count()
    assert plain == 3


def test_dis_max_and_boosting_filter_context(qs_docs):
    body = {"query": {"dis_max": {"queries": [
        {"term": {"lang": "de"}},
        {"range": {"n": {"gte": 50}}},
    ], "tie_breaker": 0.7}}}
    got = {r.doc_id for r in execute_search(qs_docs, body)["hits"].collect()}
    want = {r.doc_id for r in execute_search(
        qs_docs,
        {"query": {"bool": {"should": [
            {"term": {"lang": "de"}}, {"range": {"n": {"gte": 50}}}]}}},
    )["hits"].collect()}
    assert got == want and got
    # boosting matches exactly the positive set — negative never filters
    body = {"query": {"boosting": {
        "positive": {"term": {"lang": "en"}},
        "negative": {"range": {"n": {"gte": 50}}},
        "negative_boost": 0.2,
    }}}
    got = {r.doc_id for r in execute_search(qs_docs, body)["hits"].collect()}
    want = {r.doc_id for r in execute_search(
        qs_docs, {"query": {"term": {"lang": "en"}}})["hits"].collect()}
    assert got == want


# --- runtime mappings -----------------------------------------------------


def test_runtime_mappings_visible_to_query_sort_and_aggs(qs_docs):
    body = {
        "runtime_mappings": {
            "n_bucket": {"type": "keyword",
                         "script": "CASE WHEN n >= 30 THEN 'big' ELSE 'small' END"},
        },
        "query": {"term": {"n_bucket": "big"}},
        "sort": [{"doc_id": "asc"}],
        "_source": ["doc_id", "n_bucket"],
        "aggs": {"by_bucket": {"terms": {"field": "n_bucket"}}},
    }
    res = execute_search(qs_docs, body)
    rows = res["hits"].collect()
    assert [r.doc_id for r in rows] and all(r.n_bucket == "big" for r in rows)
    buckets = {b["key"]: b["doc_count"]
               for b in res["aggregations"]["by_bucket"]["buckets"]}
    assert set(buckets) == {"big"}
    # guarded like every script surface
    body["runtime_mappings"]["n_bucket"]["script"] = "reflect('a','b')"
    import pytest as _pytest

    with _pytest.raises(PermissionError):
        execute_search(qs_docs, body)


# --- nested query ---------------------------------------------------------


@pytest.fixture(scope="module")
def nested_docs(spark):
    rows = [
        (0, [(2, "book", 15.0), (1, "pen", 2.0)]),
        (1, [(5, "book", 40.0)]),
        (2, [(1, "lamp", 30.0), (3, "desk lamp", 99.0)]),
        (3, []),
    ]
    df = spark.createDataFrame(
        rows,
        "order_id long, items array<struct<qty: long, name: string, price: double>>",
    ).cache()
    df.count()
    return df


def test_nested_query_any_element_matches(nested_docs):
    body = {"query": {"nested": {
        "path": "items",
        "query": {"range": {"items.qty": {"gte": 3}}},
    }}}
    got = {r.order_id
           for r in execute_search(nested_docs, body)["hits"].collect()}
    assert got == {1, 2}
    # bare element-relative field names are accepted too
    body["query"]["nested"]["query"] = {"term": {"name": "pen"}}
    got = {r.order_id
           for r in execute_search(nested_docs, body)["hits"].collect()}
    assert got == {0}


def test_nested_bool_must_is_per_element(nested_docs):
    # BOTH conditions must hold on the SAME element — order 2 has a
    # cheap lamp and an expensive desk lamp, but no cheap desk lamp;
    # a flattened (non-nested) evaluation would wrongly match it.
    body = {"query": {"nested": {
        "path": "items",
        "query": {"bool": {"must": [
            {"match": {"items.name": "lamp"}},
            {"range": {"items.price": {"lte": 35.0}}},
        ]}},
    }}}
    got = {r.order_id
           for r in execute_search(nested_docs, body)["hits"].collect()}
    assert got == {2}  # the plain lamp at 30.0
    body["query"]["nested"]["query"]["bool"]["must"][0] = \
        {"match_phrase": {"items.name": "desk lamp"}}
    got = {r.order_id
           for r in execute_search(nested_docs, body)["hits"].collect()}
    assert got == set()  # desk lamp costs 99


def test_nested_composes_with_top_level_bool(nested_docs):
    body = {"query": {"bool": {
        "must": [{"range": {"order_id": {"lte": 1}}}],
        "filter": [{"nested": {
            "path": "items",
            "query": {"prefix": {"items.name": "bo"}},
        }}],
    }}}
    got = {r.order_id
           for r in execute_search(nested_docs, body)["hits"].collect()}
    assert got == {0, 1}
    # empty arrays never match; wildcard + should work per element
    body = {"query": {"nested": {
        "path": "items",
        "query": {"bool": {"should": [
            {"wildcard": {"items.name": "de?k*"}},
            {"term": {"items.qty": 5}},
        ]}},
    }}}
    got = {r.order_id
           for r in execute_search(nested_docs, body)["hits"].collect()}
    assert got == {1, 2}


def test_nested_rejects_unsupported_inner_clause(nested_docs):
    body = {"query": {"nested": {
        "path": "items",
        "query": {"fuzzy": {"items.name": "pen"}},
    }}}
    with pytest.raises(ValueError, match="nested"):
        execute_search(nested_docs, body)["hits"].collect()


# --- function_score query -------------------------------------------------


def test_function_score_filter_weight_and_fvf(qs_docs):
    # docs: lang en → n in {10, 25, 55}; boost via weight-on-filter +
    # field_value_factor, score_mode sum, primary filter-context (1.0)
    body = {"query": {"function_score": {
        "query": {"term": {"lang": "en"}},
        "functions": [
            {"filter": {"range": {"n": {"gte": 50}}}, "weight": 10},
            {"field_value_factor": {"field": "n", "factor": 0.1,
                                    "modifier": "none"}},
        ],
        "score_mode": "sum",
        "boost_mode": "replace",
    }}, "_source": ["doc_id", "_score"]}
    got = {r.doc_id: r._score
           for r in execute_search(qs_docs, body)["hits"].collect()}
    # n=10 → 1.0; n=25 → 2.5; n=55 → 10 + 5.5
    assert got == {0: pytest.approx(1.0), 1: pytest.approx(2.5),
                   3: pytest.approx(15.5)}


def test_function_score_modes_and_max_boost(qs_docs):
    base = {
        "query": {"term": {"lang": "en"}},
        "functions": [
            {"field_value_factor": {"field": "n", "factor": 0.1}},
            {"weight": 2},
        ],
        "boost_mode": "replace",
    }

    def score_of(fs, doc_id=3):  # n = 55 → fvf 5.5
        body = {"query": {"function_score": fs}, "_source": ["doc_id", "_score"]}
        return {r.doc_id: r._score
                for r in execute_search(qs_docs, body)["hits"].collect()}[doc_id]

    assert score_of({**base, "score_mode": "multiply"}) == pytest.approx(11.0)
    assert score_of({**base, "score_mode": "sum"}) == pytest.approx(7.5)
    # weighted avg: (1·5.5 + 2·1)/(1+2) — the bare weight entry's
    # value is 1, its weight 2
    assert score_of({**base, "score_mode": "avg"}) == pytest.approx(7.5 / 3)
    assert score_of({**base, "score_mode": "max"}) == pytest.approx(5.5)
    assert score_of({**base, "score_mode": "min"}) == pytest.approx(2.0)
    assert score_of({**base, "score_mode": "first"}) == pytest.approx(5.5)
    assert score_of(
        {**base, "score_mode": "multiply", "max_boost": 3.0}
    ) == pytest.approx(3.0)


def test_function_score_decay_and_min_score(qs_docs):
    body = {"query": {"function_score": {
        "query": {"match_all": {}},
        "functions": [{"linear": {"n": {
            "origin": 0, "scale": 50, "offset": 0, "decay": 0.5}}}],
        "boost_mode": "replace",
        "min_score": 0.5,
    }}, "_source": ["doc_id", "_score"]}
    got = {r.doc_id: r._score
           for r in execute_search(qs_docs, body)["hits"].collect()}
    # linear zero point = 100; score = (100 - n)/100; min_score 0.5 →
    # keeps n <= 50
    assert all(s >= 0.5 for s in got.values())
    assert 3 not in got  # n=55 → 0.45, pruned


def test_function_score_bm25_primary_multiplies(qs_docs):
    # inner match query carries a BM25 primary; boost_mode multiply
    fs = {
        "query": {"match": {"text": "alpha"}},
        "functions": [{"weight": 3}],
    }
    body = {"query": {"function_score": fs}, "_source": ["doc_id", "_score"]}
    boosted = {r.doc_id: r._score
               for r in execute_search(qs_docs, body)["hits"].collect()}
    plain = {r.doc_id: r._score for r in execute_search(
        qs_docs,
        {"query": {"match": {"text": "alpha"}}, "track_scores": True,
         "_source": ["doc_id", "_score"]},
    )["hits"].collect()}
    assert set(boosted) == set(plain) and len(boosted) > 0
    for d in boosted:
        assert boosted[d] == pytest.approx(plain[d] * 3.0)


def test_function_score_no_matching_function_scores_one(qs_docs):
    body = {"query": {"function_score": {
        "query": {"term": {"lang": "en"}},
        "functions": [{"filter": {"term": {"lang": "xx"}}, "weight": 9}],
        "boost_mode": "replace",
    }}, "_source": ["doc_id", "_score"]}
    got = {r.doc_id: r._score
           for r in execute_search(qs_docs, body)["hits"].collect()}
    assert set(got.values()) == {1.0}


def test_function_score_shorthand_and_script_score_guard(qs_docs):
    # single-function shorthand: the function sits directly in the body
    body = {"query": {"function_score": {
        "query": {"term": {"lang": "en"}},
        "field_value_factor": {"field": "n", "factor": 1.0},
        "boost_mode": "replace",
    }}, "_source": ["doc_id", "_score"]}
    got = {r.doc_id: r._score
           for r in execute_search(qs_docs, body)["hits"].collect()}
    assert got == {0: pytest.approx(10.0), 1: pytest.approx(25.0),
                   3: pytest.approx(55.0)}
    # script_score works and is guarded like every script surface
    body["query"]["function_score"] = {
        "query": {"term": {"lang": "en"}},
        "functions": [{"script_score": {"script": "n * 2.0"}}],
        "boost_mode": "replace",
    }
    got = {r.doc_id: r._score
           for r in execute_search(qs_docs, body)["hits"].collect()}
    assert got[3] == pytest.approx(110.0)
    body["query"]["function_score"]["functions"] = [
        {"script_score": {"script": "reflect('a','b')"}}]
    with pytest.raises(PermissionError):
        execute_search(qs_docs, body)


# --- geo tier -------------------------------------------------------------


@pytest.fixture(scope="module")
def geo_docs(spark):
    # (id, lat, lon): NYC, London, Boston, Sydney, null island
    rows = [
        (0, 40.7128, -74.0060),
        (1, 51.5074, -0.1278),
        (2, 42.3601, -71.0589),
        (3, -33.8688, 151.2093),
        (4, 0.0, 0.0),
    ]
    df = spark.createDataFrame(rows, "city_id long, lat double, lon double")
    df = df.select(
        "city_id",
        F.struct(F.col("lat"), F.col("lon")).alias("location"),
    ).cache()
    df.count()
    return df


def test_geo_distance_filters_by_haversine(geo_docs):
    # Boston is ~306 km from NYC; London ~5570 km; Sydney ~15990 km
    body = {"query": {"geo_distance": {
        "distance": "500km", "location": {"lat": 40.7128, "lon": -74.0060}}}}
    got = {r.city_id for r in execute_search(geo_docs, body)["hits"].collect()}
    assert got == {0, 2}
    body["query"]["geo_distance"]["distance"] = "6000km"
    got = {r.city_id for r in execute_search(geo_docs, body)["hits"].collect()}
    assert got == {0, 1, 2}


def test_geo_distance_point_formats_and_units(geo_docs):
    from opensearch_dynamodb_etl_cdk_spark.functions.geo import (
        parse_distance_km,
        parse_point,
    )

    # the three public point shapes agree
    for point in ({"lat": 40.7128, "lon": -74.006},
                  "40.7128,-74.006",
                  [-74.006, 40.7128]):  # GeoJSON order
        assert parse_point(point) == (40.7128, -74.006)
        body = {"query": {"geo_distance": {
            "distance": "500km", "location": point}}}
        got = {r.city_id
               for r in execute_search(geo_docs, body)["hits"].collect()}
        assert got == {0, 2}
    # unit grammar: bare numbers are meters (public default)
    assert parse_distance_km("500km") == 500.0
    assert parse_distance_km("500000") == pytest.approx(500.0)
    assert parse_distance_km(500000) == pytest.approx(500.0)
    assert parse_distance_km("310.7mi") == pytest.approx(500.0, rel=1e-3)
    with pytest.raises(ValueError):
        parse_distance_km("12parsecs")


def test_geo_bounding_box_corner_forms(geo_docs):
    # box around the US northeast: catches NYC + Boston only
    for box in (
        {"top_left": {"lat": 45.0, "lon": -80.0},
         "bottom_right": {"lat": 40.0, "lon": -70.0}},
        {"top_right": {"lat": 45.0, "lon": -70.0},
         "bottom_left": {"lat": 40.0, "lon": -80.0}},
        {"top": 45.0, "left": -80.0, "bottom": 40.0, "right": -70.0},
    ):
        body = {"query": {"geo_bounding_box": {"location": box}}}
        got = {r.city_id
               for r in execute_search(geo_docs, body)["hits"].collect()}
        assert got == {0, 2}, box


def test_geo_distance_sort_orders_nearest_first(geo_docs):
    body = {
        "query": {"match_all": {}},
        "sort": [{"_geo_distance": {
            "location": {"lat": 40.7128, "lon": -74.0060},
            "order": "asc", "unit": "km",
        }}],
    }
    got = [r.city_id for r in execute_search(geo_docs, body)["hits"].collect()]
    assert got == [0, 2, 1, 4, 3]  # NYC, Boston, London, null island, Sydney
    body["sort"][0]["_geo_distance"]["order"] = "desc"
    got = [r.city_id for r in execute_search(geo_docs, body)["hits"].collect()]
    assert got == [3, 4, 1, 2, 0]


def test_geo_distance_aggregation_rings(geo_docs):
    body = {
        "size": 0,
        "aggs": {"rings": {
            "geo_distance": {
                "field": "location",
                "origin": {"lat": 40.7128, "lon": -74.0060},
                "ranges": [
                    {"to": 500, "key": "local"},
                    {"from": 500, "to": 10000, "key": "regional"},
                    {"from": 10000},
                ],
            },
            "aggs": {"max_id": {"max": {"field": "city_id"}}},
        }},
    }
    res = execute_search(geo_docs, body)["aggregations"]["rings"]
    by_key = {b["key"]: b for b in res["buckets"]}
    # NYC+Boston local; London + null island regional; Sydney beyond
    assert by_key["local"]["doc_count"] == 2
    assert by_key["regional"]["doc_count"] == 2
    assert by_key["10000-*"]["doc_count"] == 1
    assert by_key["local"]["max_id"]["value"] == 2
    assert by_key["local"]["to"] == 500.0 and "from" not in by_key["local"]


def test_geotile_grid_buckets(geo_docs):
    body = {
        "size": 0,
        "aggs": {"tiles": {"geotile_grid": {
            "field": "location", "precision": 2,
        }}},
    }
    res = execute_search(geo_docs, body)["aggregations"]["tiles"]
    by_key = {b["key"]: b["doc_count"] for b in res["buckets"]}
    # precision 2 → 4×4 world grid. NYC+Boston share tile 2/1/1;
    # London 2/1/1? lon -0.13 → x=floor((179.87/360)*4)=1; lat 51.5 →
    # northern row y=1 as well — verify against hand math:
    # x = floor((lon+180)/360*4), y from mercator
    import math

    def tile(lat, lon, z=2):
        n = 1 << z
        x = min(max(math.floor((lon + 180.0) / 360.0 * n), 0), n - 1)
        lat = min(max(lat, -85.05112878), 85.05112878)
        phi = math.radians(lat)
        yf = (1.0 - math.log(math.tan(phi) + 1.0 / math.cos(phi)) / math.pi) / 2.0 * n
        y = min(max(math.floor(yf), 0), n - 1)
        return f"{z}/{x}/{y}"

    cities = [(40.7128, -74.0060), (51.5074, -0.1278), (42.3601, -71.0589),
              (-33.8688, 151.2093), (0.0, 0.0)]
    want: dict[str, int] = {}
    for la, lo in cities:
        k = tile(la, lo)
        want[k] = want.get(k, 0) + 1
    assert by_key == want


def test_haversine_known_distance(spark):
    from opensearch_dynamodb_etl_cdk_spark.functions.geo import haversine_km

    df = spark.range(1)
    # NYC ↔ London great-circle ≈ 5570 km; one degree on the equator
    # ≈ 111.19 km; identical points = 0
    row = df.select(
        haversine_km(F.lit(40.7128), F.lit(-74.0060),
                     F.lit(51.5074), F.lit(-0.1278)).alias("nyl"),
        haversine_km(F.lit(0.0), F.lit(0.0),
                     F.lit(0.0), F.lit(1.0)).alias("deg"),
        haversine_km(F.lit(12.34), F.lit(56.78),
                     F.lit(12.34), F.lit(56.78)).alias("zero"),
    ).head()
    assert row.nyl == pytest.approx(5570.2, abs=5.0)
    assert row.deg == pytest.approx(111.19, abs=0.05)
    assert row.zero == 0.0


def test_knn_zero_norm_vectors_excluded_not_crashing(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 0.0]),  # zero-norm: no cosine direction
        (2, [0.5, 0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    body = {"query": {"knn": {"embedding": {"vector": [1.0, 0.0], "k": 5}}}}
    hits = execute_search(df, body)["hits"].collect()
    assert [r.vec_id for r in hits] == [0, 2]  # doc 1 excluded, no error
    with pytest.raises(ValueError):
        execute_search(
            df, {"query": {"knn": {"embedding": {"vector": [0.0, 0.0]}}}}
        )


def test_knn_collapse_keeps_best_scored_per_group(knn_docs):
    body = {
        "query": {"knn": {"embedding": {"vector": [1.0, 0.0], "k": 5,
                                        "tie_break": "vec_id"}}},
        "collapse": {"field": "lang"},
    }
    hits = execute_search(knn_docs, body)["hits"].collect()
    best = {r.lang: r.vec_id for r in hits}
    # per lang, the top-cosine doc: en -> 0 (identical), de -> 4 (0.7,0.3)
    assert best == {"en": 0, "de": 4}


# --- _source filtering + script_fields ------------------------------------


def test_source_filtering_projects_columns(qs_docs):
    body = {"query": {"term": {"lang": "en"}}, "_source": ["doc_id", "lang"]}
    hits = execute_search(qs_docs, body)["hits"]
    assert hits.columns == ["doc_id", "lang"]
    body = {"_source": {"includes": ["*"], "excludes": ["text"]}}
    assert "text" not in execute_search(qs_docs, body)["hits"].columns
    body = {"_source": False, "query": {"knn": {
        "embedding": {"vector": [1.0], "k": 1}}}}
    # _source: false keeps only response-shaping columns (_score)
    df = qs_docs.select("doc_id", F.array(F.lit(1.0)).alias("embedding"))
    assert execute_search(df, body)["hits"].columns == ["_score"]


def test_source_filter_reaches_parquet_scan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    body = {"query": {"range": {"n_chars": {"gte": 100}}},
            "_source": ["doc_id", "lang"]}
    plan = execute_search(docs, body)["hits"]._jdf.queryExecution() \
        .executedPlan().toString()
    # column pruning: the scan must not read the wide text column
    assert "text" not in plan.split("ReadSchema")[-1]


def test_script_fields_evaluate_sql_expressions(qs_docs):
    body = {
        "query": {"term": {"lang": "en"}},
        "sort": [{"doc_id": "asc"}],
        "script_fields": {"n_doubled": {"script": "n * 2"}},
        "_source": ["doc_id", "n_doubled"],
    }
    rows = execute_search(qs_docs, body)["hits"].collect()
    assert [(r.doc_id, r.n_doubled) for r in rows] == [(0, 20), (1, 50), (3, 110)]


# --- script guard: JVM/UDF escape hatches blocked by default --------------


def test_script_surfaces_block_jvm_escape_hatches(qs_docs):
    import pytest as _pytest

    hostile = "reflect('java.lang.System', 'getProperty', 'user.dir') IS NOT NULL"
    # script query
    with _pytest.raises(PermissionError, match="reflect"):
        execute_search(qs_docs, {"query": {"script": {"script": hostile}}})
    # script_fields
    with _pytest.raises(PermissionError, match="blocked function"):
        execute_search(
            qs_docs,
            {"script_fields": {"x": {"script": "java_method('java.lang.Math', 'random')"}}},
        )
    # rescore script
    with _pytest.raises(PermissionError, match="blocked function"):
        execute_search(
            qs_docs,
            {"rescore": {"query": {"rescore_query": {
                "script": "CAST(`REFLECT`('a','b') AS DOUBLE)"}}}},
        )
    # smuggled through a base64 wrapper body
    import base64 as _b64
    import json as _json

    wrapped = _b64.b64encode(
        _json.dumps({"script": {"script": hostile}}).encode()
    ).decode()
    with _pytest.raises(PermissionError, match="blocked function"):
        execute_search(qs_docs, {"query": {"wrapper": {"query": wrapped}}})


def test_script_guard_opt_in_and_benign_pass(qs_docs):
    # benign scripts still work unchanged; a column name merely
    # containing a blocked substring is fine (word-boundary match)
    rows = execute_search(
        qs_docs,
        {"query": {"script": {"script": "n > 30"}},
         "_source": ["doc_id"], "sort": [{"doc_id": "asc"}]},
    )["hits"].collect()
    assert len(rows) > 0
    # explicit opt-in lifts the guard (trusted caller): reflect runs
    got = execute_search(
        qs_docs,
        {"query": {"script": {
            "script": "reflect('java.lang.Math', 'abs', -1) = '1'"}},
         "_source": ["doc_id"]},
        allow_unsafe_scripts=True,
    )["hits"]
    assert got.count() == qs_docs.count()


def test_update_by_query_blocks_hostile_set_fields(tmp_path, spark):
    from opensearch_dynamodb_etl_cdk_spark.functions.scripts import safe_expr
    import pytest as _pytest

    with _pytest.raises(PermissionError, match="blocked function"):
        safe_expr("reflect('java.lang.Runtime','getRuntime')")
    # call_udf is a registered-function trampoline — also blocked
    with _pytest.raises(PermissionError):
        safe_expr("call_udf('anything', col)")


# --- rescore --------------------------------------------------------------


def test_rescore_knn_reranks_window(knn_docs):
    # primary: knn toward [1,0]; rescore: knn toward [0,1] with heavy
    # weight — the ordering must flip toward the second vector
    body = {
        "query": {"knn": {"embedding": {"vector": [1.0, 0.0], "k": 3,
                                        "tie_break": "vec_id"}}},
        "rescore": {
            "query": {"rescore_query": {"knn": {"embedding": {
                "vector": [0.0, 1.0]}}},
            },
            "query_weight": 0.1,
            "rescore_query_weight": 10.0,
        },
    }
    hits = execute_search(knn_docs, body)["hits"].collect()
    assert len(hits) == 3  # window = primary k; rescore never widens it
    # among the window {0, 1, 4}, doc 4 ([0.7,0.3]) is closest to [0,1]
    assert hits[0].vec_id == 4
    assert [r._score for r in hits] == sorted(
        (r._score for r in hits), reverse=True)


def test_rescore_script_over_filter_primary(qs_docs):
    # filter-only primary (no _score): combination uses 0 + script
    body = {
        "query": {"term": {"lang": "en"}},
        "rescore": {"query": {"rescore_query": {"script": "CAST(n AS DOUBLE)"}}},
    }
    hits = execute_search(qs_docs, body)["hits"].collect()
    assert [r.doc_id for r in hits] == [3, 1, 0]  # n desc: 55, 25, 10


def test_rescore_pages_over_one_rescored_ordering(qs_docs):
    """Public contract: rescore the top window FIRST, then paginate —
    pages must partition one rescored ordering, not each be rescored
    independently (which reorders page contents for from > 0)."""
    base = {
        "query": {"exists": {"field": "doc_id"}},
        "sort": [{"doc_id": "asc"}],
        "rescore": {"query": {"rescore_query": {"script": "CAST(n AS DOUBLE)"}},
                    "window_size": 4},
    }
    whole = execute_search(qs_docs, dict(base, size=4))["hits"].collect()
    p0 = execute_search(qs_docs, dict(base, size=2))["hits"].collect()
    p1 = execute_search(qs_docs, {**base, "from": 2, "size": 2})["hits"].collect()
    assert [r.doc_id for r in p0] + [r.doc_id for r in p1] == \
        [r.doc_id for r in whole]


def test_track_scores_tiebreak_skips_nested_maps(spark):
    """A nested map (array<map<...>>) is unhashable too — the BM25
    tie-break hash must skip it, not fail analysis."""
    df = spark.createDataFrame(
        [(1, "spark engine", [{"k": "v"}]), (2, "spark core", [{"a": "b"}])],
        "doc_id long, text string, meta array<map<string,string>>",
    )
    hits = execute_search(
        df, {"query": {"match": {"text": "spark"}}, "track_scores": True}
    )["hits"].collect()
    assert len(hits) == 2 and all(r._score > 0 for r in hits)


def test_source_true_is_noop_and_false_keeps_metadata(items):
    fares = items.filter(F.col("type") == "fare")
    body = {"query": {"term": {"pk": "DEN"}}, "_source": True}
    assert execute_search(fares, body)["hits"].columns == fares.columns
    body = {"query": {"term": {"pk": "DEN"}}, "_source": False}
    # _id is index metadata: kept even with source disabled
    assert execute_search(fares, body)["hits"].columns == ["_id"]


def test_source_false_without_metadata_raises(qs_docs):
    with pytest.raises(ValueError):
        execute_search(qs_docs, {"_source": False})


def test_rescore_composes_with_source_filter(knn_docs):
    # _source drops the embedding column, but rescore (query phase)
    # runs before fetch-phase shaping — must not break
    body = {
        "query": {"knn": {"embedding": {"vector": [1.0, 0.0], "k": 3,
                                        "tie_break": "vec_id"}}},
        "rescore": {"query": {"rescore_query": {"knn": {"embedding": {
            "vector": [0.0, 1.0]}}},
            "query_weight": 0.1, "rescore_query_weight": 10.0,
            "tie_break": "vec_id"}},
        "_source": ["vec_id"],
    }
    hits = execute_search(knn_docs, body)["hits"].collect()
    assert [r.vec_id for r in hits][0] == 4
    assert set(execute_search(knn_docs, body)["hits"].columns) == \
        {"vec_id", "_score"}


def test_rescore_public_weight_nesting_and_list_form(knn_docs):
    # weights inside `query` (the public DSL shape) must take effect
    inner = {"query": {"rescore_query": {"knn": {"embedding": {
        "vector": [0.0, 1.0]}}},
        "query_weight": 0.1, "rescore_query_weight": 10.0,
        "tie_break": "vec_id"}}
    body = {"query": {"knn": {"embedding": {"vector": [1.0, 0.0], "k": 3,
                                            "tie_break": "vec_id"}}},
            "rescore": inner}
    assert execute_search(knn_docs, body)["hits"].collect()[0].vec_id == 4
    # list form: stages apply sequentially (second stage re-boosts [1,0])
    body["rescore"] = [inner,
                      {"query": {"rescore_query": {"knn": {"embedding": {
                          "vector": [1.0, 0.0]}}},
                          "query_weight": 0.0,
                          "rescore_query_weight": 1.0,
                          "tie_break": "vec_id"}}]
    assert execute_search(knn_docs, body)["hits"].collect()[0].vec_id == 0


# --- explain --------------------------------------------------------------


def test_explain_match_decomposes_bool_tree(qs_docs):
    from opensearch_dynamodb_etl_cdk_spark.operators.search import explain_match

    q = {"bool": {
        "must": [{"match": {"text": "alpha"}}],
        "filter": [{"range": {"n": {"lte": 30}}}],
        "must_not": [{"term": {"lang": "de"}}],
    }}
    ex = explain_match(qs_docs, q, 1, id_col="doc_id")
    assert ex["matched"] is True
    assert ex["clauses"] == {
        "must[0].match": True,
        "filter[0].range": True,
        "must_not[0].term": False,
    }
    ex = explain_match(qs_docs, q, 3, id_col="doc_id")  # n=55 fails range
    assert ex["matched"] is False
    assert ex["clauses"]["filter[0].range"] is False
    with pytest.raises(ValueError):
        explain_match(qs_docs, q, 999, id_col="doc_id")


# --- query_string parser properties ---------------------------------------


def test_query_string_parser_properties(qs_docs):
    """Property-ish sweep: random well-formed query strings over a tiny
    vocabulary never crash the parser, and the compiled predicate agrees
    with a driver-side reference evaluator on every doc."""
    import itertools
    import random

    rng = random.Random(7)
    vocab = ["alpha", "bravo", "charlie", "delta", "echo"]
    docs = {r.doc_id: set(r.text.lower().split()) for r in qs_docs.collect()}

    def ref_eval(tokens, doc):
        # mirror the parser's documented grammar: OR splits and-groups;
        # within a group, NOT marks prohibited terms and ANY explicit
        # AND promotes all non-prohibited terms to required (else the
        # group is any-of under default_operator=or)
        groups, cur = [], []
        for t in tokens:
            if t == "OR":
                groups.append(cur)
                cur = []
            else:
                cur.append(t)
        groups.append(cur)

        def group_match(g):
            terms, prohibited, explicit_and, neg = [], [], False, False
            for t in g:
                if t == "AND":
                    explicit_and = True
                elif t == "NOT":
                    neg = True
                else:
                    (prohibited if neg else terms).append(t)
                    neg = False
            if any(t in doc for t in prohibited):
                return False
            if not terms:
                return True  # only prohibitions, all absent
            if explicit_and:
                return all(t in doc for t in terms)
            return any(t in doc for t in terms)

        return any(group_match(g) for g in groups)

    from opensearch_dynamodb_etl_cdk_spark.operators.search import compile_query

    for _ in range(25):
        n = rng.randint(1, 4)
        toks, parts = [], []
        for i in range(n):
            if i:
                c = rng.choice(["AND", "OR", ""])
                if c:
                    toks.append(c)
                    parts.append(c)
            if rng.random() < 0.2:
                toks.append("NOT")
                parts.append("NOT")
            w = rng.choice(vocab)
            toks.append(w)
            parts.append(w)
        qs = " ".join(parts)
        pred = compile_query(
            {"query_string": {"query": qs, "default_field": "text"}})
        got = {r.doc_id for r in qs_docs.filter(pred).collect()}
        want = {d for d, words in docs.items() if ref_eval(toks, words)}
        assert got == want, f"query {qs!r}: spark={got} ref={want}"


# --- span queries ---------------------------------------------------------


@pytest.fixture(scope="module")
def span_docs(spark):
    rows = [
        (0, "quick brown fox jumps"),          # quick..fox gap 1
        (1, "quick fox"),                      # adjacent, in order
        (2, "fox quick"),                      # adjacent, reversed
        (3, "quick very very very brown fox"), # gap 4
        (4, "quick quick fox"),                # repeated first term
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").cache()
    df.count()
    return df


def _span_ids(df, slop, in_order, terms=("quick", "fox")):
    q = {"span_near": {
        "clauses": [{"span_term": {"text": t}} for t in terms],
        "slop": slop, "in_order": in_order}}
    return {r.doc_id for r in df.filter(compile_query(q)).collect()}


def test_span_near_in_order_slop(span_docs):
    assert _span_ids(span_docs, 0, True) == {1, 4}        # adjacent only
    assert _span_ids(span_docs, 1, True) == {0, 1, 4}     # one token between
    assert _span_ids(span_docs, 4, True) == {0, 1, 3, 4}  # wide window
    # reversed doc 2 never matches in_order
    assert 2 not in _span_ids(span_docs, 10, True)


def test_span_near_unordered_and_three_clauses(span_docs):
    assert _span_ids(span_docs, 0, False) == {1, 2, 4}  # either direction
    three = {"span_near": {
        "clauses": [{"span_term": {"text": t}}
                    for t in ("quick", "brown", "fox")],
        "slop": 0, "in_order": True}}
    got = {r.doc_id for r in span_docs.filter(compile_query(three)).collect()}
    assert got == {0}  # contiguous ordered triple only in doc 0
    with pytest.raises(ValueError):
        compile_query({"span_near": {"clauses": [
            {"span_term": {"text": "quick"}}]}})


def test_span_term_standalone(span_docs):
    q = {"span_term": {"text": "brown"}}
    assert {r.doc_id for r in span_docs.filter(compile_query(q)).collect()} \
        == {0, 3}


# --- terms_set / script / match_bool_prefix -------------------------------


def test_terms_set_per_doc_threshold(spark):
    rows = [
        (0, "red green blue", 2),
        (1, "red yellow pink", 2),
        (2, "red green blue", 3),
        (3, "cyan magenta", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, required int")
    q = {"terms_set": {"text": {
        "terms": ["red", "green", "blue"],
        "minimum_should_match_field": "required"}}}
    got = {r.doc_id for r in df.filter(compile_query(q)).collect()}
    # doc0: 3 matched >= 2 ok; doc1: 1 < 2; doc2: 3 >= 3 ok; doc3: 0 < 1
    assert got == {0, 2}


def test_script_query_predicate(qs_docs):
    q = {"script": {"script": "n > 30 AND lang = 'en'"}}
    got = {r.doc_id for r in qs_docs.filter(compile_query(q)).collect()}
    assert got == {3}
    q = {"script": {"source": "n % 2 = 0"}}  # flat one-level shape
    got = {r.doc_id for r in qs_docs.filter(compile_query(q)).collect()}
    assert got == {0, 2, 4}


def test_match_bool_prefix_search_as_you_type(qs_docs):
    # default OR: 'charlie' present OR a token starting 'del'
    q = {"match_bool_prefix": {"text": "charlie del"}}
    got = {r.doc_id for r in qs_docs.filter(compile_query(q)).collect()}
    assert got == {0, 1, 3}
    # operator and: both clauses required
    q = {"match_bool_prefix": {"text": {"query": "charlie del",
                                        "operator": "and"}}}
    got = {r.doc_id for r in qs_docs.filter(compile_query(q)).collect()}
    assert got == {3}
    q = {"match_bool_prefix": {"text": "fox"}}
    got = {r.doc_id for r in qs_docs.filter(compile_query(q)).collect()}
    assert got == {4}  # 'Foxtrot' prefix, analyzed lowercase


def test_track_scores_bm25_ranked_match(qs_docs):
    body = {
        "query": {"match": {"text": "delta echo"}},
        "track_scores": True,
        "size": 10,
    }
    hits = execute_search(qs_docs, body)["hits"].collect()
    assert "_score" in hits[0].asDict()
    # doc 3 contains both terms -> highest BM25; all hits carry scores desc
    assert hits[0].doc_id == 3
    scores = [r._score for r in hits]
    assert scores == sorted(scores, reverse=True)
    assert {r.doc_id for r in hits} == {1, 2, 3}  # OR-match semantics kept
    # without track_scores there is no _score column
    cols = execute_search(
        qs_docs, {"query": {"match": {"text": "delta echo"}}}
    )["hits"].columns
    assert "_score" not in cols


def test_wrapper_query_decodes_embedded_body(qs_docs):
    import base64
    import json

    inner = {"term": {"lang": "de"}}
    b64 = base64.b64encode(json.dumps(inner).encode()).decode()
    got = {r.doc_id for r in
           qs_docs.filter(compile_query({"wrapper": {"query": b64}})).collect()}
    assert got == {2}
