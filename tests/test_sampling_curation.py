"""Deterministic sampling/splitting and the curation pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from opensearch_dynamodb_etl_cdk_spark.operators.curate import (
    CurationConfig,
    curate,
)
from opensearch_dynamodb_etl_cdk_spark.operators.sampling import (
    deterministic_sample,
    shuffle_for_training,
    train_test_split,
)


def test_split_is_disjoint_exhaustive_and_stable(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train, test = train_test_split(d, test_pct=10)
    n, ntr, nte = d.count(), train.count(), test.count()
    assert ntr + nte == n
    assert train.join(test, "doc_id", "inner").count() == 0
    # repartitioning must not change membership (the df.sample() failure)
    train2, test2 = train_test_split(d.repartition(7), test_pct=10)
    assert {r.doc_id for r in test2.select("doc_id").collect()} == {
        r.doc_id for r in test.select("doc_id").collect()
    }
    # a grown corpus keeps old members in their split
    half = d.filter(F.col("doc_id") < 250)
    _, test_half = train_test_split(half, test_pct=10)
    old = {r.doc_id for r in test_half.select("doc_id").collect()}
    assert old <= {r.doc_id for r in test.select("doc_id").collect()}


def test_sample_fraction_is_roughly_right(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = d.count()
    s = deterministic_sample(d, 20).count()
    assert 0.10 * n < s < 0.30 * n  # hash buckets ≈ uniform


def test_shuffle_is_deterministic_and_complete(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    o1 = [r.doc_id for r in shuffle_for_training(d).select("doc_id").collect()]
    o2 = [r.doc_id for r in shuffle_for_training(d.repartition(5)).select("doc_id").collect()]
    assert o1 == o2
    assert sorted(o1) == [r.doc_id for r in d.select("doc_id").orderBy("doc_id").collect()]
    assert o1 != sorted(o1)  # actually shuffled


def test_curate_gates_and_dedups(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again today", "en"),
        (2, "the quick brown fox jumps over the lazy dog again and again today", "en"),  # dup
        (3, "short text", "en"),                     # fails min_tokens
        (4, "???!!! ,,,,, !!!", "en"),               # fails quality (all punct)
        (5, "el perro que corre en la casa por los campos con un gato feliz", "es"),
        (6, "some tokens in an unknown language flagged accordingly here okay", "xx"),  # lang gate
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = curate(df, CurationConfig(min_tokens=5))
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 5]  # dup 2 dropped (min id kept), 3/4/6 gated
    cols = out.columns
    assert cols == ["doc_id", "lang", "n_tokens", "quality", "text"]


def test_curate_predicted_lang_mode(spark):
    rows = [
        (1, "the cat sat of the mat and it is a good day for that thing", "MISLABELED"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = curate(df, CurationConfig(min_tokens=5, use_predicted_lang=True)).collect()
    assert len(out) == 1 and out[0].lang == "en"


def test_decontaminate_flags_planted_overlap(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.curate import decontaminate

    bench = spark.createDataFrame(
        [(100, "the secret benchmark answer is forty two exactly")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains a verbatim benchmark span -> contaminated
            (1, "we believe the secret benchmark answer is forty two exactly "
                "as printed in the eval set"),
            # clean document, no shared 3-gram
            (2, "a completely unrelated document about gardening and soil"),
            # partial 2-word overlap only -> no shared 3-gram
            (3, "benchmark answer sheets are sold separately"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in decontaminate(corpus, bench, k=3).collect()}
    assert set(out) == {1}
    r = out[1]
    assert r.n_hits == 6  # 6 of the benchmark's shingles appear verbatim
    assert 0 < r.contamination_ratio <= 1
    assert r.n_grams > r.n_hits
