"""BM25 ranked retrieval (operators/relevance.py): Lucene-formula
properties on a hand-built corpus, plus function_score modifiers."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opensearch_dynamodb_etl_cdk_spark.operators.relevance import (
    corpus_stats,
    field_value_factor,
    score_match_bm25,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # 'rare' appears in 1 doc, 'common' in 4 of 5; doc 3 repeats 'common'.
    rows = [
        (0, "common alpha beta", 2.0),
        (1, "common gamma delta", 1.0),
        (2, "rare epsilon zeta", 4.0),
        (3, "common common eta theta", 1.0),
        (4, "common iota kappa", 3.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, boost double").cache()
    df.count()
    return df


def _scores(df, query, **kw):
    out = score_match_bm25(df, "text", query, **kw)
    return {r.doc_id: r._score for r in out.collect()}


def test_bm25_matches_closed_form(corpus):
    # Single-term query: check one score against the formula by hand.
    s = _scores(corpus, "rare")
    assert set(s) == {2}
    n, df_t, dl, avgdl = 5.0, 1.0, 3.0, (3 + 3 + 3 + 4 + 3) / 5.0
    idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
    tf = 1.0
    expected = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert s[2] == pytest.approx(expected, rel=1e-12)


def test_bm25_rare_term_outranks_common(corpus):
    s = _scores(corpus, "rare common")
    # every doc containing either term matches (OR semantics)
    assert set(s) == {0, 1, 2, 3, 4}
    # the rare-term doc scores above any common-term doc
    assert s[2] > max(s[0], s[1], s[3], s[4])


def test_bm25_tf_saturation_and_monotonicity(corpus):
    s = _scores(corpus, "common")
    # doc 3 has tf=2 → scores higher than tf=1 docs of similar length,
    # but less than 2x (BM25 saturation), despite being the longest doc.
    one_tf = s[0]
    assert s[3] > one_tf
    assert s[3] < 2 * one_tf


def test_bm25_precomputed_stats_path(corpus):
    stats = corpus_stats(corpus, "text", ["common"]).cache()
    via_stats = _scores(corpus, "common", stats=stats)
    direct = _scores(corpus, "common")
    assert via_stats == direct


def test_bm25_empty_query_raises(corpus):
    with pytest.raises(ValueError):
        score_match_bm25(corpus, "text", "...")


def test_decay_curves_match_public_contract(spark):
    """gauss/exp/linear each: 1 inside offset, exactly `decay` at
    distance scale, monotonically decreasing beyond."""
    from opensearch_dynamodb_etl_cdk_spark.operators.relevance import decay_score

    vals = [(float(v),) for v in (0, 50, 100, 1100, 2100, 3100, 5000)]
    df = spark.createDataFrame(vals, "v double")
    for kind in ("gauss", "exp", "linear"):
        out = {
            r.v: r.s
            for r in df.select(
                "v",
                decay_score(kind, F.col("v"), origin=0.0, scale=1000.0,
                            offset=100.0, decay=0.5).alias("s"),
            ).collect()
        }
        assert out[0.0] == out[50.0] == out[100.0] == 1.0  # inside offset
        assert out[1100.0] == pytest.approx(0.5, rel=1e-12)  # decay @ scale
        seq = [out[v] for v in (100.0, 1100.0, 2100.0, 3100.0, 5000.0)]
        assert all(a > b or (a == b == 0.0) for a, b in zip(seq, seq[1:]))
    # closed-form spot checks at dist=2000 (2x scale)
    g = {r.v: r.s for r in df.select("v", decay_score(
        "gauss", F.col("v"), 0.0, 1000.0, 100.0, 0.5).alias("s")).collect()}
    assert g[2100.0] == pytest.approx(0.5 ** 4, rel=1e-9)  # exp(-4σ²/2σ²)... = decay^(d/s)²
    e = {r.v: r.s for r in df.select("v", decay_score(
        "exp", F.col("v"), 0.0, 1000.0, 100.0, 0.5).alias("s")).collect()}
    assert e[2100.0] == pytest.approx(0.25, rel=1e-9)  # decay^(d/s)
    lin = {r.v: r.s for r in df.select("v", decay_score(
        "linear", F.col("v"), 0.0, 1000.0, 100.0, 0.5).alias("s")).collect()}
    assert lin[2100.0] == 0.0  # past the zero point s = 2000
    assert lin[1100.0] == 0.5


def test_apply_decay_multiplies_score_and_defaults_missing_to_one(corpus, spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.relevance import apply_decay

    scored = score_match_bm25(corpus, "text", "rare")
    base = {r.doc_id: r._score for r in scored.collect()}
    out = apply_decay(scored, "linear", "boost", origin=4.0, scale=1.0,
                      offset=0.0, decay=0.5)
    got = {r.doc_id: r._score for r in out.collect()}
    assert got[2] == pytest.approx(base[2])  # boost=4.0 == origin → decay 1
    # a NULL field keeps the primary score (missing → 1.0)
    with_null = spark.createDataFrame(
        [(9, None, 2.0)], "doc_id long, boost double, _score double"
    )
    kept = apply_decay(with_null, "gauss", "boost", 0.0, 1.0).collect()
    assert kept[0]._score == 2.0


def test_decay_rejects_bad_params(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.relevance import decay_score

    with pytest.raises(ValueError):
        decay_score("gauss", F.lit(1.0), 0.0, 1000.0, decay=1.0)
    with pytest.raises(ValueError):
        decay_score("gauss", F.lit(1.0), 0.0, -5.0)
    with pytest.raises(ValueError):
        decay_score("cosine", F.lit(1.0), 0.0, 1000.0)


def test_field_value_factor_modifiers(corpus):
    scored = score_match_bm25(corpus, "text", "rare")
    base = {r.doc_id: r._score for r in scored.collect()}
    boosted = field_value_factor(scored, "boost", factor=1.0, modifier="none")
    got = {r.doc_id: r._score for r in boosted.collect()}
    assert got[2] == pytest.approx(base[2] * 4.0)
    sq = field_value_factor(scored, "boost", modifier="square")
    assert {r.doc_id: r._score for r in sq.collect()}[2] == pytest.approx(
        base[2] * 16.0
    )
    with pytest.raises(ValueError):
        field_value_factor(scored, "boost", modifier="cube")


# --- more_like_this -------------------------------------------------------


@pytest.fixture(scope="module")
def mlt_corpus(spark):
    # doc 0 repeats 'spark' and 'merge' (tf>=2 candidates); 'spark'
    # appears in 4 docs, 'merge' in 3, 'unique' in 1 (drops at df>=2... )
    rows = [
        (0, "spark spark merge merge unique unique"),
        (1, "spark merge alpha"),
        (2, "spark merge beta"),
        (3, "spark gamma delta"),
        (4, "epsilon zeta eta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").cache()
    df.count()
    return df


def test_mlt_finds_similar_excludes_source(mlt_corpus):
    from opensearch_dynamodb_etl_cdk_spark.operators.relevance import (
        more_like_this,
    )

    out = more_like_this(
        mlt_corpus, "text", like_id=0,
        min_term_freq=2, min_doc_freq=2, max_query_terms=5,
        minimum_should_match=2,
    )
    got = sorted(r.doc_id for r in out.collect())
    # selected terms: spark, merge ('unique' drops at df>=2); docs
    # sharing both: 1, 2 — doc 0 itself excluded, 3 has only one, 4 none
    assert got == [1, 2]


def test_mlt_like_text_and_validation(mlt_corpus):
    from opensearch_dynamodb_etl_cdk_spark.operators.relevance import (
        more_like_this,
    )

    out = more_like_this(
        mlt_corpus, "text", like="spark spark gamma gamma",
        min_term_freq=2, min_doc_freq=1, max_query_terms=5,
        minimum_should_match=1,
    )
    assert sorted(r.doc_id for r in out.collect()) == [0, 1, 2, 3]
    with pytest.raises(ValueError):
        more_like_this(mlt_corpus, "text")  # neither like nor like_id
    with pytest.raises(ValueError):
        more_like_this(mlt_corpus, "text", like="all distinct words here")


def test_mlt_percentage_msm_clamps_to_one(mlt_corpus):
    """30% of 2 selected terms floors to 0 — MLT must still require at
    least one shared term, never degenerate to match-all."""
    from opensearch_dynamodb_etl_cdk_spark.operators.relevance import (
        more_like_this,
    )

    out = more_like_this(
        mlt_corpus, "text", like_id=0,
        min_term_freq=2, min_doc_freq=2, max_query_terms=5,
        minimum_should_match="30%",
    )
    got = sorted(r.doc_id for r in out.collect())
    # selected: spark, merge; docs sharing >= 1: 1, 2, 3 — doc 4 (zero
    # shared terms) must NOT match
    assert got == [1, 2, 3]


def test_bm25_stale_stats_frame_fails_fast(corpus):
    from opensearch_dynamodb_etl_cdk_spark.operators.relevance import (
        corpus_stats,
        score_match_bm25,
    )
    from pyspark.errors.exceptions.captured import AnalysisException

    stats = corpus_stats(corpus, "text", ["common"])
    with pytest.raises(AnalysisException):
        score_match_bm25(corpus, "text", "rare", stats=stats).collect()


def test_bm25_duplicate_query_terms_deduped(corpus):
    from opensearch_dynamodb_etl_cdk_spark.operators.relevance import (
        score_match_bm25,
    )

    once = {r.doc_id: r._score
            for r in score_match_bm25(corpus, "text", "rare").collect()}
    twice = {r.doc_id: r._score
             for r in score_match_bm25(corpus, "text", "rare rare").collect()}
    assert once == twice


def test_rrf_fuse_rank_contributions(spark):
    """Hand-computed reciprocal-rank fusion: contributions are 1/(k+rank)
    per sub-ranking; docs outside a ranking's window contribute nothing;
    ties break on the id so the fused order is deterministic."""
    from opensearch_dynamodb_etl_cdk_spark.operators.relevance import rrf_fuse

    a = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], "id long, _score double"
    )
    b = spark.createDataFrame(
        [(3, 0.99), (1, 0.5)], "id long, _score double"
    )
    out = {
        r["id"]: (r["_score"], r["matched_subqueries"])
        for r in rrf_fuse([a, b], ["id"], k=60, window=2, size=10).collect()
    }
    # window=2: doc 3 falls OUT of ranking a; doc 2 out of ranking b
    assert out[1] == (round(1 / 61 + 1 / 62, 9), 2)
    assert out[3] == (round(1 / 61, 9), 1)
    assert out[2] == (round(1 / 62, 9), 1)
    # fused order: doc1 (both rankings) first
    top = rrf_fuse([a, b], ["id"], k=60, window=2, size=1).collect()
    assert top[0]["id"] == 1


def test_scored_multi_match_tie_breaker_and_boosts(spark):
    """Scored multi_match: best_fields = dis_max + tie_breaker x others,
    most_fields = sum, per-field ^boost multiplies — recomputed from
    independent single-field BM25 runs."""
    from opensearch_dynamodb_etl_cdk_spark.operators.relevance import (
        score_match_bm25,
        score_multi_match_bm25,
    )
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        execute_search,
    )

    df = spark.createDataFrame(
        [(1, "spark shuffle merge", "spark overview notes"),
         (2, "window sort merge", "spark spark spark"),
         (3, "table scan", "filter pushdown")],
        "id long, title string, body string",
    ).cache()
    df.count()

    t = {r["id"]: r["_score"]
         for r in score_match_bm25(df, "title", "spark").collect()}
    b = {r["id"]: r["_score"]
         for r in score_match_bm25(df, "body", "spark").collect()}

    # best_fields with tie_breaker 0.3 and title^2
    got = {r["id"]: r["_score"] for r in score_multi_match_bm25(
        df, ["title^2", "body"], "spark",
        type_="best_fields", tie_breaker=0.3).collect()}
    for i in got:
        ft, fb = 2.0 * t.get(i, 0.0), b.get(i, 0.0)
        expect = max(ft, fb) + 0.3 * (ft + fb - max(ft, fb))
        assert got[i] == pytest.approx(expect, rel=1e-12)
    assert set(got) == {1, 2}  # doc 3 matches neither field

    # most_fields sums
    got = {r["id"]: r["_score"] for r in score_multi_match_bm25(
        df, ["title", "body"], "spark", type_="most_fields").collect()}
    for i in got:
        assert got[i] == pytest.approx(
            t.get(i, 0.0) + b.get(i, 0.0), rel=1e-12)

    # end-to-end through the DSL with track_scores
    res = execute_search(df, {
        "query": {"multi_match": {
            "query": "spark", "fields": ["title^2", "body"],
            "tie_breaker": 0.3}},
        "track_scores": True, "size": 3,
    })
    rows = res["hits"].select("id", "_score").collect()
    assert [r["id"] for r in rows] == sorted(
        got, key=lambda i: -max(2.0 * t.get(i, 0), b.get(i, 0))
        - 0.3 * min(2.0 * t.get(i, 0), b.get(i, 0)))
    # tie_breaker stays inert in pure filter context (no track_scores)
    res = execute_search(df, {"query": {"multi_match": {
        "query": "spark", "fields": ["title", "body"],
        "tie_breaker": 0.5}}})
    assert sorted(r["id"] for r in res["hits"].collect()) == [1, 2]
    # unknown options still raise
    with pytest.raises(ValueError, match="unsupported multi_match"):
        execute_search(df, {"query": {"multi_match": {
            "query": "spark", "fields": ["title"], "zero_terms_query":
            "all"}}})


def test_function_score_random_score(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.search import (
        execute_search,
    )

    df = spark.createDataFrame(
        [(str(i),) for i in range(200)], "_id string")
    body = {"query": {"function_score": {
        "query": {"match_all": {}},
        "random_score": {"seed": 42, "field": "_id"},
        "boost_mode": "replace"}}, "size": 200}
    s1 = {r["_id"]: r["_score"]
          for r in execute_search(df, body)["hits"].collect()}
    s2 = {r["_id"]: r["_score"]
          for r in execute_search(df, body)["hits"].collect()}
    assert s1 == s2                      # reproducible
    assert all(0.0 <= v < 1.0 for v in s1.values())
    assert len(set(s1.values())) == 200  # distinct per doc
    # roughly uniform: mean near .5 (loose bound, deterministic data)
    mean = sum(s1.values()) / len(s1)
    assert 0.4 < mean < 0.6
    # a different seed permutes the scores
    body2 = {"query": {"function_score": {
        "query": {"match_all": {}},
        "random_score": {"seed": 7, "field": "_id"},
        "boost_mode": "replace"}}, "size": 200}
    s3 = {r["_id"]: r["_score"]
          for r in execute_search(df, body2)["hits"].collect()}
    assert s3 != s1
