"""End-to-end training-data curation: the composed pipeline a corpus
actually goes through before tokenization — language filter, quality
and length gates, exact dedup — as one declarative plan.

Every stage is a Column predicate or a hash-groupBy, so the whole
pipeline is a single Catalyst plan: filters collapse into the scan,
the only shuffle is the dedup groupBy on 16-byte hashes. Nothing here
is bespoke execution — that is the point: curation at 100 TB is a
query, not a job framework.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.text import (
    langid_from,
    normalize_text,
    quality_score_from,
    shingles_from_tokens,
    token_count_from,
    tokens,
)


@dataclass(frozen=True)
class CurationConfig:
    allowed_langs: tuple[str, ...] = ("en", "es", "de", "fr", "zh")
    min_quality: float = 0.5
    min_tokens: int = 10
    max_tokens: int = 100_000
    use_predicted_lang: bool = False  # True: gate on langid(), not the label


def curate(
    df: DataFrame,
    cfg: CurationConfig = CurationConfig(),
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Curated corpus: gated rows, exact-deduped by normalized text
    (min id survives), with the quality metrics attached."""
    tk = df.withColumn("_toks", tokens(F.col(text_col)))
    lang = (
        langid_from(F.col("_toks"))
        if cfg.use_predicted_lang
        else F.col(lang_col)
    )
    gated = (
        tk.withColumn("_lang", lang)
        .withColumn("_n_tokens", token_count_from(F.col("_toks")))
        .withColumn("_quality", quality_score_from(F.col(text_col), F.col("_toks")))
        .filter(
            F.col("_lang").isin(*cfg.allowed_langs)
            & (F.col("_quality") >= cfg.min_quality)
            & F.col("_n_tokens").between(cfg.min_tokens, cfg.max_tokens)
        )
    )
    # exact dedup on the normalized form: min-id row per hash survives
    w = W.partitionBy(F.md5(normalize_text(F.col(text_col)))).orderBy(F.col(id_col))
    return (
        gated.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            F.col("_lang").alias("lang"),
            F.col("_n_tokens").alias("n_tokens"),
            F.col("_quality").alias("quality"),
            F.col(text_col),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing word
    ``k``-grams with a held-out evaluation set — the standard pre-training
    hygiene step (eval answers leaking into training data inflate scores).

    Returns one row per contaminated document:
    ``(doc_id, n_grams, n_hits, contamination_ratio)`` where ``n_grams``
    counts the document's DISTINCT k-grams and ``n_hits`` how many of
    them appear anywhere in the benchmark. Thresholding (drop vs audit)
    is the caller's policy; this operator only measures.

    Scale shape (100 TB corpus vs MB-scale eval set): the benchmark gram
    set reduces to DISTINCT grams and BROADCASTS — the corpus side never
    shuffles for the membership probe; the only corpus shuffle is the
    per-doc count groupBy on ``doc_id`` (map-side partials). If the
    benchmark ever outgrows broadcast range, drop the hint and Spark
    falls back to a shuffle join on the gram — same plan semantics.
    Two-step token projection per shingles_from_tokens' CollapseProject
    note.
    """
    c_toks = corpus.select(id_col, tokens(F.col(text_col)).alias("__toks"))
    c_grams = c_toks.select(
        id_col,
        F.explode(
            F.array_distinct(shingles_from_tokens(F.col("__toks"), k))
        ).alias("gram"),
    )
    b_toks = benchmark.select(tokens(F.col(text_col)).alias("__toks"))
    b_grams = (
        b_toks.select(
            F.explode(shingles_from_tokens(F.col("__toks"), k)).alias("gram")
        )
        .distinct()
    )
    per_doc = c_grams.join(F.broadcast(b_grams), "gram", "left_semi")
    hits = per_doc.groupBy(id_col).agg(F.count("*").alias("n_hits"))
    totals = c_grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    return (
        totals.join(hits, id_col)
        .select(
            id_col,
            "n_grams",
            "n_hits",
            (F.col("n_hits").cast("double") / F.col("n_grams")).alias(
                "contamination_ratio"
            ),
        )
    )


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition statistics — the Gopher-style quality
    signals that catch boilerplate and degenerate generations exact
    dedup misses: a document that is one phrase looped 500 times is
    unique as a whole but useless as training data.

    Returns ``(doc_id, n_tokens, n_distinct_tokens, distinct_ratio,
    top_unigram_ratio, top_bigram_ratio)`` where the top-x ratios are
    the most frequent unigram's/bigram's share of the document's
    token/bigram stream. Filtering thresholds are caller policy.

    Shape: explode → count per (doc, gram) → per-doc max/sum — two
    groupBys keyed by doc_id whose partial aggregates combine map-side;
    the shuffled rows are (id, hash-sized gram, count), never document
    bodies. Documents with a single token define the bigram stream as
    the whole text (same convention as shingles_from_tokens k<n)."""
    tk = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    uni = tk.select(id_col, F.explode("__toks").alias("g"))
    big = tk.select(
        id_col, F.explode(shingles_from_tokens(F.col("__toks"), 2)).alias("g")
    )

    def top_share(grams: DataFrame, out: str) -> DataFrame:
        per = grams.groupBy(id_col, "g").agg(F.count("*").alias("c"))
        return per.groupBy(id_col).agg(
            (
                F.max("c").cast("double") / F.sum("c").cast("double")
            ).alias(out),
            F.sum("c").alias(f"__n_{out}"),
            F.count("*").alias(f"__d_{out}"),
        )
    u = top_share(uni, "top_unigram_ratio")
    b = top_share(big, "top_bigram_ratio").select(id_col, "top_bigram_ratio")
    return (
        u.join(b, id_col)
        .select(
            F.col(id_col),
            F.col("__n_top_unigram_ratio").alias("n_tokens"),
            F.col("__d_top_unigram_ratio").alias("n_distinct_tokens"),
            (
                F.col("__d_top_unigram_ratio").cast("double")
                / F.col("__n_top_unigram_ratio").cast("double")
            ).alias("distinct_ratio"),
            "top_unigram_ratio",
            "top_bigram_ratio",
        )
    )


def curation_report(curated: DataFrame) -> DataFrame:
    """Per-language summary of the curated corpus (the number a data
    lead actually reads: docs and token budget surviving curation)."""
    return curated.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.min("quality").alias("min_quality"),
    )


def embedding_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Semantic decontamination: flag corpus items whose embedding is
    near-identical (cosine ≥ threshold) to ANY benchmark item — the
    paraphrase-robust complement to n-gram decontamination (which
    misses reworded eval questions entirely).

    Shape mirrors the n-gram decontaminator: the benchmark is
    evaluation-set-sized (thousands, not billions) so it BROADCASTS and
    the corpus never shuffles — one broadcast nested-loop pass scoring
    |corpus| × |benchmark| cosines in codegen, then a per-item max.
    Returns (id, max_benchmark_cosine, contaminated).
    """
    bench = F.broadcast(
        benchmark.select(
            F.col(id_col).alias("__bid"), F.col(vec_col).alias("__bv")
        )
    )
    from ..functions.vectors import cosine

    scored = corpus.select(id_col, vec_col).crossJoin(bench).select(
        F.col(id_col),
        cosine(F.col(vec_col), F.col("__bv")).alias("__cos"),
    )
    return (
        scored.groupBy(id_col)
        .agg(F.max("__cos").alias("max_benchmark_cosine"))
        .select(
            id_col,
            F.round("max_benchmark_cosine", 9).alias("max_benchmark_cosine"),
            (F.col("max_benchmark_cosine") >= threshold).alias("contaminated"),
        )
    )
