"""Distributed BPE: the Spark trainer must reproduce the pure-Python
reference merge sequence EXACTLY (same pre-tokenizer, greedy-left
rewrite, count-then-lex tiebreak), and encoding must be lossless and
consistent with training."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opensearch_dynamodb_etl_cdk_spark.operators.bpe import (
    _PY_PRE_RE,
    bpe_encode,
    reference_bpe_merges,
    train_bpe,
    word_counts,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the dog barks and the fox runs away",
    "low lower lowest newer newest wider widest",
    "hugging faces hug hugs hugged hugging",
    "it's the fox's den, isn't it? yes it is!",
    "numbers 123 and 456 mix with words like fox7 sometimes",
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    df = spark.createDataFrame([(s,) for s in CORPUS], "text string")
    df.cache().count()
    return df


def test_python_pretokenizer_matches_spark(spark, corpus_df):
    """The stdlib-re twin of the Java BPE_ISH_RE must tokenize the test
    corpus identically — training (Spark regex) and encoding (Python
    regex) share one segmentation."""
    from opensearch_dynamodb_etl_cdk_spark.functions.text import (
        bpe_ish_tokens,
    )

    spark_toks = [
        r["t"] for r in corpus_df.select(
            bpe_ish_tokens(F.col("text")).alias("t")).collect()
    ]
    py_toks = [_PY_PRE_RE.findall(s) for s in CORPUS]
    assert spark_toks == py_toks


def test_train_matches_reference_exactly(corpus_df):
    got = train_bpe(corpus_df, num_merges=40, min_pair_count=2)
    want = reference_bpe_merges(CORPUS, num_merges=40, min_pair_count=2)
    assert got == want
    assert len(got) >= 20  # the corpus supports a real merge sequence
    # ranks are sequential and merged symbols concatenate left+right
    for i, m in enumerate(got):
        assert m["rank"] == i
        assert m["merged"] == m["left"] + m["right"]
    # counts are non-increasing in BPE only per-pair — but the top merge
    # must be the corpus's most frequent adjacent pair: 'th' or ' t'...
    assert got[0]["pair_count"] == max(m["pair_count"] for m in got)


def test_train_is_deterministic(corpus_df):
    a = train_bpe(corpus_df, num_merges=12)
    b = train_bpe(corpus_df, num_merges=12)
    assert a == b


def test_min_pair_count_stops_early(spark):
    df = spark.createDataFrame([("ab cd ef",)], "text string")
    merges = train_bpe(df, num_merges=50, min_pair_count=2)
    assert merges == []  # every adjacent pair occurs once


def test_encode_lossless_and_consistent(corpus_df):
    merges = train_bpe(corpus_df, num_merges=40)
    enc = bpe_encode(corpus_df, merges, "text", "toks")
    rows = enc.select("text", "toks").collect()
    for r in rows:
        # losslessness: tokens concatenate back to the pre-token stream
        assert "".join(r["toks"]) == "".join(_PY_PRE_RE.findall(r["text"]))
    # consistency: encoding the training corpus with ALL merges yields
    # exactly the trainer's final word symbols
    wc = word_counts(corpus_df, "text")
    final_words = {}
    from opensearch_dynamodb_etl_cdk_spark.operators.bpe import (
        _merge_fold,
    )
    syms_df = wc.withColumn("syms", F.split("word", ""))
    for m in merges:
        syms_df = syms_df.withColumn(
            "syms", _merge_fold(F.col("syms"), m["left"], m["right"])
        )
    trained = {r["word"]: r["syms"] for r in syms_df.collect()}
    ranks = {}
    enc1 = bpe_encode(
        corpus_df.sparkSession.createDataFrame(
            [(w,) for w in trained], "text string"
        ),
        merges, "text", "toks",
    )
    for r in enc1.collect():
        assert r["toks"] == trained[r["text"]], r["text"]


def test_encode_without_merges_is_chars(spark):
    df = spark.createDataFrame([("abc",)], "text string")
    out = bpe_encode(df, [], "text", "toks").collect()[0]["toks"]
    assert out == ["a", "b", "c"]
