"""Deterministic sampling/splitting and the curation pipeline."""

from __future__ import annotations

import pytest
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


def test_pii_counts_and_redaction(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.privacy import (
        pii_count,
        pii_report,
        redact_pii,
    )

    rows = [
        (1, "contact jane.doe+spam@mail.example.co.uk or +1 (303) 555 0142", "a"),
        (2, "server at 10.0.42.7 rebooted; admin@example.org paged", "a"),
        (3, "no identifiers in this document at all", "b"),
        (4, "twice: a@b.io then c.d@e-f.org and ip 192.168.1.1", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            pii_count(F.col("text"), "email").alias("e"),
            pii_count(F.col("text"), "phone").alias("p"),
            pii_count(F.col("text"), "ipv4").alias("i"),
            redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    assert (got[1].e, got[1].p, got[1].i) == (1, 1, 0)
    assert (got[2].e, got[2].p, got[2].i) == (1, 0, 1)
    assert (got[3].e, got[3].p, got[3].i) == (0, 0, 0)
    assert (got[4].e, got[4].p, got[4].i) == (2, 0, 1)
    assert "<EMAIL>" in got[1].red and "<PHONE>" in got[1].red
    assert "jane.doe" not in got[1].red and "303" not in got[1].red
    assert got[4].red.count("<EMAIL>") == 2 and "<IP>" in got[4].red
    assert got[3].red == rows[2][1]  # clean text untouched

    rep = {r.source: r for r in pii_report(df).collect()}
    assert rep["a"].docs_with_pii == 2 and rep["b"].docs_with_pii == 1
    assert rep["b"].n_emails == 2 and rep["b"].n_ipv4 == 1


def test_repetition_metrics_flags_looped_text(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.curate import (
        repetition_metrics,
    )

    rows = [
        (1, "buy now " * 50),                      # 2 tokens looped 50x
        (2, "a varied sentence with mostly unique words in it today"),
        (3, "solo"),                               # single token
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    m = {r.doc_id: r for r in repetition_metrics(df).collect()}
    # looped doc: 100 tokens, 2 distinct; every bigram stream slot is
    # 'buy now' or 'now buy' (99 bigrams, 50 of one kind)
    assert m[1].n_tokens == 100 and m[1].n_distinct_tokens == 2
    assert m[1].top_unigram_ratio == 0.5
    assert m[1].top_bigram_ratio == 50 / 99
    assert m[1].distinct_ratio == 0.02
    # varied doc: every token unique
    assert m[2].distinct_ratio == 1.0
    assert m[2].top_unigram_ratio == 0.1 and m[2].top_bigram_ratio == 1 / 9
    # single-token doc: bigram stream degenerates to the whole text
    assert m[3].n_tokens == 1 and m[3].top_bigram_ratio == 1.0


def test_pack_assignments_and_report(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.packing import (
        pack_assignments,
        packing_report,
    )

    # tokens per doc: 4, 3, 5 in one stream; budget 6 ->
    # offsets 0,4,7; doc1 spans [0,3] bin 0; doc2 [4,6] crosses 0->1;
    # doc3 [7,11] crosses 1->... floor(7/6)=1, floor(11/6)=1 -> stays
    rows = [
        (1, "w w w w", "en"),
        (2, "x x x", "en"),
        (3, "y y y y y", "en"),
        (4, "", "de"),  # empty doc occupies no tokens, never crosses
        (5, "z z", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    a = {r.doc_id: r for r in pack_assignments(df, budget=6).collect()}
    assert (a[1].token_offset, a[1].start_bin, a[1].end_bin, a[1].crosses) == (0, 0, 0, False)
    assert (a[2].token_offset, a[2].start_bin, a[2].end_bin, a[2].crosses) == (4, 0, 1, True)
    assert (a[3].token_offset, a[3].start_bin, a[3].end_bin, a[3].crosses) == (7, 1, 1, False)
    assert a[4].n_tokens == 0 and a[4].crosses is False
    r = {x.stream: x for x in packing_report(df, budget=6).collect()}
    assert r["en"].total_tokens == 12 and r["en"].n_bins == 2
    assert r["en"].n_crossing == 1 and r["en"].fill_frac == 1.0
    assert r["de"].total_tokens == 2 and r["de"].n_bins == 1


def test_mixture_resample_hits_targets(spark, sf_dir):
    from opensearch_dynamodb_etl_cdk_spark.operators.sampling import (
        mixture_resample,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    targets = {"en": 0.5, "es": 0.25, "zh": 0.25}
    kept = mixture_resample(d, targets, mix_col="lang")
    counts = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # only targeted groups survive
    assert set(counts) <= set(targets)
    total = sum(counts.values())
    # the limiting group is kept (nearly) intact and every achieved
    # share is within the md5-bucket quantization of its target
    orig = {r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    budget = min(orig[g] / w for g, w in targets.items())
    limiting = min(targets, key=lambda g: orig[g] / targets[g])
    assert counts[limiting] >= 0.95 * orig[limiting]
    for g, w in targets.items():
        assert abs(counts[g] / total - w) < 0.12
    # determinism: same rows regardless of partitioning
    kept2 = mixture_resample(d.repartition(13), targets, mix_col="lang")
    assert {r.doc_id for r in kept2.select("doc_id").collect()} == {
        r.doc_id for r in kept.select("doc_id").collect()
    }


def test_shuffle_seeded_epochs_differ_but_stable(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    e1 = [r.doc_id for r in shuffle_for_training(d, seed="epoch1", key="md5").collect()]
    e1b = [r.doc_id for r in shuffle_for_training(d, seed="epoch1", key="md5").collect()]
    e2 = [r.doc_id for r in shuffle_for_training(d, seed="epoch2", key="md5").collect()]
    assert e1 == e1b            # same seed → identical order
    assert e1 != e2             # different epoch → different order
    assert sorted(e1) == sorted(e2)  # same corpus, permuted


def test_select_until_token_budget_exact_prefix(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.sampling import (
        select_until_token_budget,
    )

    rows = [(i, 10) for i in range(100)]  # 100 docs x 10 tokens
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    kept = select_until_token_budget(
        df, budget=250, token_col="n_tokens",
        order_by=[F.col("doc_id").asc()], n_partitions=8,
    )
    got = sorted(r.doc_id for r in kept.collect())
    assert got == list(range(25))  # exactly the first 250/10 docs
    # budget smaller than one doc -> empty; huge budget -> everything
    assert select_until_token_budget(
        df, 5, "n_tokens", [F.col("doc_id")], n_partitions=8).count() == 0
    assert select_until_token_budget(
        df, 10**9, "n_tokens", [F.col("doc_id")], n_partitions=8).count() == 100


def test_select_until_token_budget_no_global_window(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.sampling import (
        select_until_token_budget,
    )
    import contextlib, io

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit(7).alias("n_tokens"))
    kept = select_until_token_budget(
        df, 700, "n_tokens", [F.col("doc_id")], n_partitions=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        kept.explain(mode="simple")
    plan = buf.getvalue()
    # every Window node must be partitioned by the range-partition id
    for line in plan.splitlines():
        if "Window [" in line:
            assert "__range_pid" in line


def test_mixture_upsample_repeat_factors(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.sampling import (
        mixture_upsample,
    )

    rows = [(i, "en" if i < 100 else "de") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    up = mixture_upsample(df, {"de": 2.5})
    counts = {r.lang: r.n for r in
              up.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["en"] == 100          # untouched domains keep one copy
    assert 230 <= counts["de"] <= 270   # ~2.5x of 100, hash-bucket exact
    # per-doc multiplicity is floor/ceil of r and _epoch enumerates copies
    per_doc = {r.doc_id: r.n for r in
               up.filter(F.col("lang") == "de").groupBy("doc_id")
               .agg(F.count("*").alias("n")).collect()}
    assert set(per_doc.values()) == {2, 3}
    assert up.filter(F.col("_epoch") < 1).count() == 0
    # determinism: identical output on re-run
    again = mixture_upsample(df, {"de": 2.5})
    assert sorted((r.doc_id, r._epoch) for r in again.collect()) == \
           sorted((r.doc_id, r._epoch) for r in up.collect())
    # r < 1 downsamples; negative rejected
    down = mixture_upsample(df, {"de": 0.5})
    assert down.filter(F.col("lang") == "de").count() < 100
    with pytest.raises(ValueError):
        mixture_upsample(df, {"de": -1.0})


def test_mixture_upsample_inexact_fraction_rounds_not_floors(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.sampling import (
        mixture_upsample,
    )

    # 2.3: IEEE (2.3-2)*100 = 29.999...98 — flooring would skew the
    # mixture to 2.29; the driver-side round keeps the full 30 buckets
    rows = [(i, "de") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    n = mixture_upsample(df, {"de": 2.3}).count()
    # 2000 base copies + ~30% of 1000 extras (hash-bucket exact ±noise)
    assert 2250 <= n <= 2350


def test_weighted_sample_properties(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.sampling import (
        weighted_sample,
    )

    # one heavy row among light ones: across many seeds the heavy row
    # must appear in nearly every k=5 sample (A-ES inclusion ∝ weight)
    rows = [(i, 1.0) for i in range(100)] + [(1000, 500.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    hits = 0
    for s in range(10):
        ids = {r.doc_id for r in weighted_sample(df, 5, "w", seed=str(s)).collect()}
        assert len(ids) == 5  # without replacement: k distinct rows
        hits += 1000 in ids
    assert hits >= 9

    # deterministic across partitionings, and seed changes the sample
    a = [r.doc_id for r in weighted_sample(df, 10, "w", seed="e1").collect()]
    b = [r.doc_id for r in
         weighted_sample(df.repartition(7), 10, "w", seed="e1").collect()]
    c = [r.doc_id for r in weighted_sample(df, 10, "w", seed="e2").collect()]
    assert a == b
    assert a != c

    # non-positive weights are never sampled
    rows = [(1, 0.0), (2, -3.0), (3, 1.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    assert [r.doc_id for r in weighted_sample(df, 10, "w").collect()] == [3]


def test_bigram_lm_stupid_backoff_arithmetic(spark):
    """Planted example: seen bigram uses C(prev,w)/C(prev); unseen bigram
    backs off to alpha·C(w)/T; unknown word gets the 0.5 pseudo-count."""
    import math

    from opensearch_dynamodb_etl_cdk_spark.functions.text import (
        bigram_logprob_scores,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b"),          # model doc: bigrams ab, ba, ab
            (2, "a b"),              # seen bigram
            (3, "b b"),              # unseen bigram, known word b
            (4, "a zz"),             # unknown word zz
        ],
        "doc_id long, text string",
    )
    model = docs.filter("doc_id = 1")
    out = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
        for r in bigram_logprob_scores(docs, model).collect()
    }
    # model counts: T=4 tokens (a b a b); C(a)=2, C(b)=2;
    # C(a,b)=2, C(b,a)=1; C(prev=a)=2, C(prev=b)=1
    assert out[2] == (1, round(math.log2(2 / 2), 6))          # P(b|a)=1
    assert out[3] == (1, round(math.log2(0.4 * 2 / 4), 6))    # backoff to C(b)/T
    assert out[4] == (1, round(math.log2(0.4 * 0.5 / 4), 6))  # unknown word
    # doc 1 scores itself: mean of log2 P(b|a)=0, log2 P(a|b)=0, 0 → 0
    assert out[1] == (3, 0.0)


def test_temperature_resample_alpha_half(spark, sf_dir):
    """alpha=0.5: keep-rate (n_min/n_i)^0.5 — the smallest group kept
    ~in full, larger groups shrunk toward uniform; realized shares
    within md5-bucket quantization of the closed form."""
    from opensearch_dynamodb_etl_cdk_spark.operators.sampling import (
        temperature_resample,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    before = {r["lang"]: r["count"] for r in
              d.groupBy("lang").count().collect()}
    kept = temperature_resample(d, mix_col="lang", alpha=0.5)
    after = {r["lang"]: r["count"] for r in
             kept.groupBy("lang").count().collect()}
    nmin = min(before.values())
    for lang, n in before.items():
        expect = (nmin / n) ** 0.5
        got = after.get(lang, 0) / n
        assert abs(got - expect) < 0.05, (lang, got, expect)
    # smallest group's keep-rate is the maximum (threshold 10000 = all)
    smallest = min(before, key=before.get)
    assert after[smallest] == before[smallest]
    # deterministic: same rows both runs
    again = temperature_resample(d, mix_col="lang", alpha=0.5)
    assert sorted(r["doc_id"] for r in kept.select("doc_id").collect()) \
        == sorted(r["doc_id"] for r in again.select("doc_id").collect())


def test_temperature_resample_alpha_one_keeps_everything(spark, sf_dir):
    from opensearch_dynamodb_etl_cdk_spark.operators.sampling import (
        temperature_resample,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = temperature_resample(d, mix_col="lang", alpha=1.0)
    # (n_min/n)^0 = 1 → threshold == resolution → every row kept
    assert kept.count() == d.count()
    with pytest.raises(ValueError):
        temperature_resample(d, alpha=1.5)


def test_chunk_documents_windows(spark):
    from opensearch_dynamodb_etl_cdk_spark.functions.text import (
        chunk_documents,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "x y"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=3, overlap=1)
    rows = [(r["id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
            for r in out.orderBy("id", "chunk_id").collect()]
    assert rows == [
        (1, 0, 3, "a b c"), (1, 1, 3, "c d e"), (1, 2, 3, "e f g"),
        (1, 3, 2, "g h"),  # trailing short window kept
        (2, 0, 2, "x y"),
    ]
    # every token covered: union of chunks reconstructs the doc when
    # overlap tokens are removed from continuation chunks
    body = "".join(
        t if i == 0 else " " + " ".join(t.split(" ")[1:])
        for i, t in enumerate(r[3] for r in rows if r[0] == 1)
    )
    assert body == "a b c d e f g h"
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_embedding_decontaminate_flags_planted(spark):
    from opensearch_dynamodb_etl_cdk_spark.operators.curate import (
        embedding_decontaminate,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.99, 0.14, 0.0]),
         (3, [0.0, 1.0, 0.0]), (4, [0.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = {r["vec_id"]: (r["contaminated"], r["max_benchmark_cosine"])
           for r in embedding_decontaminate(
               corpus, bench, threshold=0.95).collect()}
    assert out[1][0] is True and abs(out[1][1] - 1.0) < 1e-9
    assert out[2][0] is True  # near-paraphrase direction, cos ≈ .990
    assert out[3][0] is False and out[4][0] is False
    # plan: benchmark side is broadcast — no shuffle of the corpus
    plan = embedding_decontaminate(corpus, bench)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_three_way_split_disjoint_exhaustive(spark, sf_dir):
    from opensearch_dynamodb_etl_cdk_spark.operators.sampling import (
        three_way_split,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = three_way_split(d, val_pct=5, test_pct=5)
    counts = {r["split"]: r["count"]
              for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == d.count()  # exhaustive
    assert counts["train"] > counts["val"] + counts["test"]
    # deterministic: identical assignment on re-run
    again = three_way_split(d, val_pct=5, test_pct=5)
    a = {(r["doc_id"], r["split"]) for r in
         out.select("doc_id", "split").collect()}
    b = {(r["doc_id"], r["split"]) for r in
         again.select("doc_id", "split").collect()}
    assert a == b
    with pytest.raises(ValueError):
        three_way_split(d, val_pct=60, test_pct=40)


def test_canonical_url_rules(spark):
    from opensearch_dynamodb_etl_cdk_spark.functions.web import (
        canonical_url,
    )

    cases = [
        # (raw, canonical)
        ("http://WWW.Example.COM:80/a/?utm_source=x&b=2&a=1#frag",
         "http://example.com/a?a=1&b=2"),
        ("https://example.com:443/a/", "https://example.com/a"),
        ("https://example.com:8443/a", "https://example.com:8443/a"),
        ("http://example.com", "http://example.com/"),
        ("http://example.com/?fbclid=abc&gclid=1&ref=z",
         "http://example.com/"),
        ("http://example.com/a?z=1&y=2&utm_campaign=c",
         "http://example.com/a?y=2&z=1"),
        ("HTTP://example.com/KeepCase/Path",
         "http://example.com/KeepCase/Path"),   # path case preserved
        ("not a url at all", "not a url at all"),  # passthrough
        ("ftp://Example.com:80/x", "ftp://example.com:80/x"),  # non-http
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "u string")
    got = [r[0] for r in df.select(canonical_url("u")).collect()]
    assert got == [c for _, c in cases]


def test_canonical_url_fragment_question_mark(spark):
    from opensearch_dynamodb_etl_cdk_spark.functions.web import (
        canonical_url,
    )

    df = spark.createDataFrame(
        [("http://x.com/a#f?b=1",), ("http://x.com/a",),
         ("http://x.com/a?b=1#frag",)], "u string")
    got = [r[0] for r in df.select(canonical_url("u")).collect()]
    # a '?' inside the fragment is NOT a query: both fragment forms
    # canonicalize to the bare page, distinct from the real ?b=1 page
    assert got == ["http://x.com/a", "http://x.com/a",
                   "http://x.com/a?b=1"]
