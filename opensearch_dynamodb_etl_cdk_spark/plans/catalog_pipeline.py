"""Training-data pipeline catalog: PII scrubbing, repetition quality,
sequence packing, and mixture resampling over the ``documents`` table
(driver charter §2.10 extensions — the corpus-preparation stages
between raw crawl and tokenizer that exact dedup / quality scoring
alone don't cover).

Oracle discipline follows catalog_ext.py: identical tokenization
fragments, PII regexes restricted to the Java-regex ∩ RE2 dialect,
double arithmetic mirrored operation-for-operation (DuckDB bare
decimal literals parse as DECIMAL, so every fractional literal is
CAST(... AS DOUBLE) on the oracle side).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..operators.curate import repetition_metrics
from ..operators.packing import packing_report
from ..operators.privacy import EMAIL_RE, IPV4_RE, PHONE_RE, pii_report
from ..operators.sampling import mixture_resample
from .catalog import register, _t
from .catalog_ext import TOK

_PII_COUNTS = f"""
SELECT source,
       len(regexp_extract_all(text, '{EMAIL_RE}')) AS e,
       len(regexp_extract_all(text, '{PHONE_RE}')) AS p,
       len(regexp_extract_all(text, '{IPV4_RE}')) AS i
FROM documents
"""


@register(
    "pii_scrub_report",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN e + p + i > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_pii,
           CAST(SUM(e) AS BIGINT) AS n_emails,
           CAST(SUM(p) AS BIGINT) AS n_phones,
           CAST(SUM(i) AS BIGINT) AS n_ipv4
    FROM ({_PII_COUNTS})
    GROUP BY source
    """,
    doc="PII scrub audit (operators/privacy.py::pii_report): per-source "
    "document and match counts for the email/phone/IPv4 regex classes. "
    "Pure regexp_* projections folded into one aggregation pass — the "
    "scrub costs a 100 TB corpus exactly one scan, no shuffle beyond "
    "the tiny per-source rollup. Patterns live in the Java-regex ∩ RE2 "
    "dialect so engine match counts agree; planted-PII semantics are "
    "pytest-verified (the synthetic corpus itself is PII-free).",
    tags=("privacy", "pipeline", "text"),
)
def pii_scrub_report(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    return pii_report(d, group_col="source")


_BIGRAM = """
CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
     ELSE list_transform(generate_series(1, len(toks) - 1),
                         i -> array_to_string(list_slice(toks, i, i + 1), ' '))
END
"""


@register(
    "repetition_quality_report",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {TOK} AS toks FROM documents),
    uni AS (SELECT doc_id, unnest(toks) AS g FROM tk),
    big AS (SELECT doc_id, unnest({_BIGRAM}) AS g FROM tk),
    u1 AS (SELECT doc_id, g, COUNT(*) AS c FROM uni GROUP BY doc_id, g),
    b1 AS (SELECT doc_id, g, COUNT(*) AS c FROM big GROUP BY doc_id, g),
    u AS (SELECT doc_id,
                 CAST(SUM(c) AS BIGINT) AS n_tokens,
                 COUNT(*) AS n_distinct_tokens,
                 CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS distinct_ratio,
                 CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_unigram_ratio
          FROM u1 GROUP BY doc_id),
    b AS (SELECT doc_id,
                 CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_bigram_ratio
          FROM b1 GROUP BY doc_id)
    SELECT u.doc_id, u.n_tokens, u.n_distinct_tokens, u.distinct_ratio,
           u.top_unigram_ratio, b.top_bigram_ratio
    FROM u JOIN b USING (doc_id)
    """,
    doc="Gopher-style repetition quality (operators/curate.py::"
    "repetition_metrics): per-document distinct-token ratio and top "
    "unigram/bigram share — catches looped boilerplate that survives "
    "exact dedup. Shuffled rows are (id, gram, count) triples, never "
    "bodies; both groupBys combine map-side.",
    tags=("text", "quality", "pipeline"),
)
def repetition_quality_report(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    return repetition_metrics(d)


_PACK_BUDGET = 512


@register(
    "sequence_packing_report",
    oracle=f"""
    WITH tk AS (SELECT doc_id, lang, len({TOK}) AS n FROM documents),
    off AS (
      SELECT lang, n,
             COALESCE(SUM(n) OVER (PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
      FROM tk)
    SELECT lang AS stream,
           COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           CAST(FLOOR((CAST(SUM(n) AS DOUBLE) - 1) / {_PACK_BUDGET}) + 1 AS BIGINT)
             AS n_bins,
           CAST(SUM(CASE WHEN n > 0 AND
                         FLOOR(CAST(o AS DOUBLE) / {_PACK_BUDGET})
                         <> FLOOR((CAST(o AS DOUBLE) + GREATEST(n, 1) - 1) / {_PACK_BUDGET})
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_crossing,
           CAST(SUM(n) AS DOUBLE)
             / CAST(FLOOR((CAST(SUM(n) AS DOUBLE) - 1) / {_PACK_BUDGET}) + 1 AS DOUBLE)
             / CAST({_PACK_BUDGET} AS DOUBLE) AS fill_frac
    FROM off
    GROUP BY lang
    """,
    doc="Sequence packing layout (operators/packing.py): concat-and-chop "
    f"the per-language token stream into {_PACK_BUDGET}-token training "
    "sequences; reports bins produced, boundary-crossing documents, and "
    "fill fraction. The layout is a pure window expression over the "
    "exclusive running token sum — no sequential recurrence, one "
    "range-partitioned shuffle per stream (salt wide streams into "
    "shards at scale).",
    tags=("pipeline", "packing", "window"),
)
def sequence_packing_report(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    return packing_report(d, budget=_PACK_BUDGET)


_MIX_TARGETS = {"en": 0.4, "es": 0.2, "de": 0.2, "fr": 0.1, "zh": 0.1}
_MIX_CASE = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN CAST({v} AS DOUBLE)" for k, v in _MIX_TARGETS.items()
) + " END"


@register(
    "mixture_resample_counts",
    oracle=f"""
    WITH c AS (
      SELECT lang, COUNT(*) AS n, {_MIX_CASE} AS w
      FROM documents
      WHERE lang IN ({", ".join(repr(k) for k in _MIX_TARGETS)})
      GROUP BY lang),
    b AS (SELECT MIN(CAST(n AS DOUBLE) / w) AS budget FROM c),
    t AS (SELECT lang,
                 FLOOR(budget * w / CAST(n AS DOUBLE) * 10000) AS thr
          FROM c, b),
    kept AS (
      SELECT d.lang
      FROM documents d JOIN t USING (lang)
      WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
            % 10000 < thr)
    SELECT lang, COUNT(*) AS n_kept,
           CAST(COUNT(*) AS DOUBLE) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE)
             AS mix_share
    FROM kept GROUP BY lang
    """,
    doc="Domain-mixture resampling (operators/sampling.py::"
    "mixture_resample): downsample to target language weights "
    f"{_MIX_TARGETS} — achievable size set by the most over-demanded "
    "group, membership by the engine-portable md5 bucket. The corpus "
    "never shuffles: per-group thresholds derive from a tiny count "
    "aggregate and broadcast back as a per-row filter.",
    tags=("pipeline", "sampling"),
)
def mixture_resample_counts(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    kept = mixture_resample(d, _MIX_TARGETS, mix_col="lang")
    return (
        kept.groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
        .withColumn(
            "mix_share",
            F.col("n_kept").cast("double")
            / F.sum("n_kept").over(W.partitionBy()).cast("double"),
        )
    )


@register(
    "lm_quality_scores",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {TOK} AS t FROM documents),
    bg AS (
      SELECT doc_id, t[i] AS prev, t[i+1] AS w
      FROM tk, unnest(generate_series(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 2),
    mtok AS (SELECT unnest(t) AS w FROM tk WHERE doc_id % 2 = 0),
    uni AS (SELECT w, COUNT(*) AS cw FROM mtok GROUP BY w),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS T FROM mtok),
    mbg AS (SELECT prev, w, COUNT(*) AS cpw FROM bg
            WHERE doc_id % 2 = 0 GROUP BY prev, w),
    ctx AS (SELECT prev, SUM(cpw) AS cp FROM mbg GROUP BY prev),
    sc AS (
      SELECT b.doc_id,
             CASE WHEN m.cpw IS NOT NULL
                  THEN log2(CAST(m.cpw AS DOUBLE) / CAST(c.cp AS DOUBLE))
                  ELSE log2(0.4 * COALESCE(CAST(u.cw AS DOUBLE), 0.5) / t.T)
             END AS lp
      FROM bg b
      LEFT JOIN mbg m ON b.prev = m.prev AND b.w = m.w
      LEFT JOIN ctx c ON b.prev = c.prev
      LEFT JOIN uni u ON b.w = u.w, tot t)
    SELECT doc_id, COUNT(*) AS n_bigrams,
           ROUND(SUM(lp) / COUNT(*), 6) AS avg_logp
    FROM sc GROUP BY doc_id
    """,
    doc="Bigram stupid-backoff LM quality scores (functions/text.py::"
    "bigram_logprob_scores): the corpus is scored against a model built "
    "from the even-doc_id half (a train split — self-scoring would make "
    "every bigram 'seen' and the backoff path dead). Model = three keyed "
    "count aggregates; scoring = keyed joins on 1-2 token keys + one "
    "per-document mean — no unbounded broadcast, no window. The "
    "transcendental mean is rounded to 6 decimals on both sides.",
    tags=("pipeline", "quality", "text"),
)
def lm_quality_scores(spark, sf_dir):
    from ..functions.text import bigram_logprob_scores

    d = _t(spark, sf_dir, "documents")["documents"]
    model = d.filter(F.col("doc_id") % 2 == 0)
    return bigram_logprob_scores(d, model)


@register(
    "bpe_word_counts",
    oracle=r"""
    SELECT word, COUNT(*) AS count FROM (
      SELECT unnest(regexp_extract_all(
        text,
        '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'
      )) AS word FROM documents)
    GROUP BY word HAVING COUNT(*) >= 50
    """,
    doc="BPE training phase 1 (operators/bpe.py::word_counts): the ONE "
    "corpus pass that every merge iteration then reuses — explode the "
    "GPT-2-style pre-tokens, hash-aggregate to (word, count). At 100 TB "
    "the distinct-pretoken table this produces is the bounded structure "
    "(~10^7 rows) the whole trainer iterates on; the corpus is never "
    "re-read. Filtered to count>=50 for a stable cross-engine frame.",
    tags=("pipeline", "text", "bpe"),
)
def bpe_word_counts(spark, sf_dir):
    from ..operators.bpe import word_counts

    d = _t(spark, sf_dir, "documents")["documents"]
    return word_counts(d, "text").filter(F.col("count") >= 50)


@register(
    "bpe_train_merges",
    property_test="tests/test_bpe.py::test_train_matches_reference_exactly",
    oracle=None,  # iterative argmax+rewrite has no SQL twin — rows-only;
    # tests/test_bpe.py proves EXACT equality with a pure-Python
    # reference implementation (same tiebreak, same greedy-left rewrite)
    doc="Distributed BPE training (operators/bpe.py::train_bpe): 20 "
    "merges learned from the documents corpus. Each iteration = one "
    "2-symbol-key pair-count aggregate over the bounded word table + a "
    "1-row argmax collect + a codegen fold rewrite; localCheckpoint "
    "keeps plan depth O(1). Deterministic count-then-lex tiebreak.",
    tags=("pipeline", "text", "bpe"),
)
def bpe_train_merges(spark, sf_dir):
    from ..operators.bpe import train_bpe

    d = _t(spark, sf_dir, "documents")["documents"]
    merges = train_bpe(d, "text", num_merges=20)
    return spark.createDataFrame(
        [(m["rank"], m["left"], m["right"], m["merged"], m["pair_count"])
         for m in merges],
        "rank int, left string, right string, merged string, pair_count long",
    )


@register(
    "temperature_mixture_counts",
    oracle="""
    WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    m AS (SELECT MIN(n) AS nmin FROM c),
    t AS (SELECT lang,
                 FLOOR(sqrt(CAST(nmin AS DOUBLE) / CAST(n AS DOUBLE))
                       * 10000) AS thr
          FROM c, m),
    kept AS (
      SELECT d.lang FROM documents d JOIN t USING (lang)
      WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                 AS BIGINT) % 10000 < thr)
    SELECT lang, COUNT(*) AS n_kept FROM kept GROUP BY lang
    """,
    doc="Temperature mixture smoothing (operators/sampling.py::"
    "temperature_resample, alpha=0.5): per-language keep-rate "
    "(n_min/n_i)^0.5 realizes p_i ∝ sqrt(n_i) — the smallest language "
    "kept in full, the head downsampled by the power rule. Thresholds "
    "from one tiny aggregate broadcast back; sqrt is IEEE "
    "correctly-rounded on both engines so the FLOOR boundary matches "
    "bit-for-bit.",
    tags=("pipeline", "sampling"),
)
def temperature_mixture_counts(spark, sf_dir):
    from ..operators.sampling import temperature_resample

    d = _t(spark, sf_dir, "documents")["documents"]
    kept = temperature_resample(d, mix_col="lang", alpha=0.5)
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


@register(
    "pca_embedding_summary",
    property_test="tests/test_pca.py::test_fit_matches_numpy_reference",
    oracle=None,  # eigendecomposition has no DuckDB twin — rows-only;
    # tests/test_pca.py proves agreement with single-node numpy PCA
    # (eigenvalues rtol 1e-7), orthonormality, exact projection and
    # partition-count invariance
    doc="Distributed PCA fit over the embedding column (operators/"
    "pca.py): ONE Arrow-batched pass reduces the corpus to per-batch "
    "(n, Σx, XᵀX) moment rows — 100 TB of vectors collapse to "
    "#partitions × (d²+d+1) doubles — combined on the driver and "
    "factored with eigh (d is model-sized, never corpus-sized). "
    "Returns per-component explained variance, rounded to 6 decimals.",
    tags=("pipeline", "embedding"),
)
def pca_embedding_summary(spark, sf_dir):
    from ..operators.pca import pca_fit

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    model = pca_fit(e, "embedding", k=8)
    return spark.createDataFrame(
        [(i, round(v, 6), round(r, 6))
         for i, (v, r) in enumerate(
             zip(model["explained_variance"],
                 model["explained_variance_ratio"]))],
        "component int, variance double, ratio double",
    )


@register(
    "document_chunks",
    oracle=r"""
    WITH tk AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^\pL\p{Nd}]+'),
                         x -> x != '') AS toks
      FROM documents),
    w AS (SELECT doc_id, toks,
                 greatest(CAST(ceil((len(toks) - 16) / 8.0) AS BIGINT)
                            * 8 + 1, 1) AS last_start
          FROM tk),
    s AS (SELECT doc_id, toks,
                 unnest(range(1, last_start + 1, 8)) AS start
          FROM w)
    SELECT doc_id AS id,
           CAST((start - 1) / 8 AS INT) AS chunk_id,
           len(toks[start:start+15]) AS n_tokens,
           array_to_string(toks[start:start+15], ' ') AS chunk_text
    FROM s WHERE len(toks[start:start+15]) > 0
    """,
    doc="Document chunking (functions/text.py::chunk_documents): "
    "16-token windows, 8-token overlap — tokenize once, window starts "
    "from `sequence` (stride 8), slice + explode. Map-only (no "
    "shuffle, no UDF); the exploded rows ARE the training samples. "
    "Trailing short windows kept (dropping them loses corpus tail).",
    tags=("pipeline", "text"),
)
def document_chunks(spark, sf_dir):
    from ..functions.text import chunk_documents

    d = _t(spark, sf_dir, "documents")["documents"]
    return chunk_documents(d, chunk_tokens=16, overlap=8)


@register(
    "kmeans_cluster_sizes",
    property_test="tests/test_dedup_similarity.py::test_ivf_centroids_deterministic_across_partitionings",
    oracle=None,  # Lloyd iterations have no SQL twin — rows-only;
    # determinism and recall are pinned by tests/test_similarity
    # (bit-identical centroids across partitionings and re-runs)
    doc="Corpus clustering as a first-class operator (operators/"
    "similarity.py::ivf_centroids + ivf_assign reused as plain "
    "k-means): deterministic hash-sample init, 5 distributed Lloyd "
    "iterations (assignment = one codegen scan; re-estimation = "
    "n_clusters × dim decimal-mean partials — the shuffle never "
    "carries corpus rows), then ONE count aggregate per cluster. The "
    "standard corpus-exploration / domain-discovery step before "
    "mixture decisions.",
    tags=("pipeline", "embedding"),
)
def kmeans_cluster_sizes(spark, sf_dir):
    from ..operators.similarity import ivf_assign, ivf_centroids

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    cents = ivf_centroids(e, n_centroids=8, refine_iters=5)
    return (
        ivf_assign(e, cents, cluster_col="cluster")
        .groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "three_way_split_counts",
    oracle="""
    SELECT CASE
             WHEN b < 5 THEN 'test'
             WHEN b < 10 THEN 'val'
             ELSE 'train' END AS split,
           lang, COUNT(*) AS n
    FROM (
      SELECT lang,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 100 AS b
      FROM documents)
    GROUP BY 1, 2
    """,
    doc="Three-way train/val/test assignment (operators/sampling.py::"
    "three_way_split): the md5 bucket partitions [0,100) — disjoint, "
    "exhaustive, engine-portable and resumable (identical assignment "
    "every run). Per-split × language counts verify the stratification "
    "is hash-uniform, not accidentally correlated with language.",
    tags=("pipeline", "sampling"),
)
def three_way_split_counts(spark, sf_dir):
    from ..operators.sampling import three_way_split

    d = _t(spark, sf_dir, "documents")["documents"]
    return (
        three_way_split(d, val_pct=5, test_pct=5)
        .groupBy("split", "lang").agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "ingest_pipeline_transform",
    oracle="""
    SELECT doc_id, source AS origin, UPPER(lang) AS lang_uc,
           CAST(n_chars AS DOUBLE) AS n_chars_d,
           (CAST(n_chars AS DOUBLE) > 500) AS flag,
           LENGTH(REPLACE(REGEXP_REPLACE(text, '[0-9]+', '#', 'g'),
                          ' ', '|')) AS jlen
    FROM documents
    """,
    doc="An 8-processor ingest pipeline folded over the documents table "
    "(functions/ingest.py::apply_processors — set/copy_from, uppercase, "
    "gsub, split, join, convert, script, remove): the whole chain "
    "compiles into ONE Catalyst projection (whole-stage codegen per "
    "document, zero extra passes) — the transform half of a "
    "pipeline-parameterized _reindex, benchable as a lazy frame.",
    tags=("pipeline", "ingest", "bench"),
)
def ingest_pipeline_transform(spark, sf_dir):
    from ..functions.ingest import apply_processors

    d = _t(spark, sf_dir, "documents")["documents"]
    out = apply_processors(d, [
        {"set": {"field": "origin", "copy_from": "source"}},
        {"uppercase": {"field": "lang", "target_field": "lang_uc"}},
        {"gsub": {"field": "text", "pattern": "[0-9]+",
                  "replacement": "#", "target_field": "text_clean"}},
        {"split": {"field": "text_clean", "separator": " ",
                   "target_field": "toks"}},
        {"join": {"field": "toks", "separator": "|",
                  "target_field": "joined"}},
        {"convert": {"field": "n_chars", "type": "double",
                     "target_field": "n_chars_d"}},
        {"script": {"target_field": "flag", "source": "n_chars_d > 500"}},
        {"remove": {"field": ["toks", "text_clean"]}},
    ])
    return out.select(
        "doc_id", "origin", "lang_uc", "n_chars_d", "flag",
        F.length("joined").cast("long").alias("jlen"),
    )


@register(
    "sentence_dedup_docs",
    oracle=r"""
    WITH arr AS (
      SELECT doc_id,
             list_filter(
               list_transform(
                 string_split(regexp_replace(text, '([.!?])\s+',
                                             '\1' || chr(10), 'g'),
                              chr(10)),
                 s -> trim(s)),
               s -> s != '') AS a
      FROM documents),
    sents AS (
      SELECT doc_id, i AS pos, a[i] AS s
      FROM arr, unnest(generate_series(1, len(a))) AS u(i)),
    elig AS (
      SELECT doc_id, pos, s,
             len(string_split_regex(s, '\s+')) >= 3 AS e
      FROM sents),
    ranked AS (
      SELECT doc_id, pos, s, e,
             CASE WHEN e THEN ROW_NUMBER() OVER (
               PARTITION BY s ORDER BY doc_id, pos) ELSE 1 END AS rn
      FROM elig),
    rebuilt AS (
      SELECT doc_id,
             string_agg(s, ' ' ORDER BY pos) AS text,
             COUNT(*) AS n_sentences_kept
      FROM ranked WHERE rn = 1 GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(r.text, '') AS text,
           COALESCE(r.n_sentences_kept, 0) AS n_sentences_kept
    FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
    """,
    doc="Corpus-level sentence deduplication (operators/dedup.py::"
    "sentence_dedup — the C4/RefinedWeb boilerplate-sentence removal): "
    "every 3+-token sentence keeps only its globally-first (doc id, "
    "position) occurrence; shorter sentences always stay; documents "
    "reassemble in original order. ONE posexplode + one |sentences| "
    "keyed min-aggregate + one rebuild groupBy — linear shuffle, no "
    "corpus window, no driver collect. Lookbehind-free segmentation so "
    "the RE2 oracle splits byte-identically.",
    tags=("pipeline", "dedup"),
)
def sentence_dedup_docs(spark, sf_dir):
    from ..operators.dedup import sentence_dedup

    d = _t(spark, sf_dir, "documents")["documents"]
    return sentence_dedup(d).select("doc_id", "text", "n_sentences_kept")


@register(
    "bpe_encoded_token_stats",
    property_test="tests/test_bpe.py::test_encode_lossless_and_consistent",
    oracle=None,
    doc="Distributed BPE ENCODE with trained merges (operators/bpe.py::"
    "bpe_encode — Arrow-batched, per-batch word cache, merge table "
    "ships via closure): per-language document count, total and mean "
    "encoded tokens. No SQL oracle BY DESIGN (the rank-priority merge "
    "loop is data-dependent control flow); the trainer is proven "
    "bit-identical to a pure-Python reference in tests/test_bpe.py and "
    "the encoder's invariants (characters survive, merges only "
    "concatenate, zero merges = chars) hold in "
    "tests/test_dedup_similarity.py::test_bpe_encode_applies_merges.",
    tags=("pipeline", "llm", "rows-only"),
)
def bpe_encoded_token_stats(spark, sf_dir):
    from ..operators.bpe import bpe_encode, train_bpe

    d = _t(spark, sf_dir, "documents")["documents"]
    merges = train_bpe(d, "text", num_merges=30)
    enc = bpe_encode(d, merges)
    return (
        enc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size("bpe_tokens")).alias("total_tokens"),
            (F.sum(F.size("bpe_tokens")) / F.count(F.lit(1)))
            .alias("mean_tokens"),
        )
    )


def _langid_case_sql() -> str:
    from ..functions import text as _T

    def hits(lang: str) -> str:
        lst = ", ".join(f"'{w}'" for w in _T.STOPWORDS[lang])
        return f"len(list_intersect(toks, [{lst}]))"

    langs = ("en", "es", "de", "fr", "zh")
    best = "greatest(" + ", ".join(hits(lg) for lg in langs) + ")"
    whens = " ".join(f"WHEN {hits(lg)} = {best} THEN '{lg}'"
                     for lg in langs)
    return f"CASE WHEN {best} = 0 THEN 'und' {whens} ELSE 'und' END"


@register(
    "corpus_datacard",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, source, lang, text, {TOK} AS toks FROM documents),
    per AS (
      SELECT source, lang,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             (least(CAST(len(toks) AS DOUBLE) / 20.0, 1.0)
              + (1.0 - least(CAST(length(regexp_replace(text,
                    '[^.,!?;:]', '', 'g')) AS DOUBLE)
                  / CAST(length(text) AS DOUBLE) * 5.0, 1.0))
              + (1.0 - abs(CAST(len(list_filter(toks, t ->
                    list_contains(['the','and','of','to','in','is',
                                   'a','that','it','for'], t)))
                    AS DOUBLE) / CAST(len(toks) AS DOUBLE) - 0.4)))
             / 3.0 AS quality,
             CASE WHEN {_langid_case_sql()} = lang
                  THEN 1.0 ELSE 0.0 END AS agree,
             CASE WHEN len(regexp_extract_all(text, '{EMAIL_RE}'))
                       + len(regexp_extract_all(text, '{PHONE_RE}'))
                       + len(regexp_extract_all(text, '{IPV4_RE}')) > 0
                  THEN 1 ELSE 0 END AS haspii,
             array_to_string(toks, ' ') AS norm
      FROM tk),
    dupc AS (SELECT norm, COUNT(*) AS c FROM per GROUP BY norm)
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(SUM(quality) / COUNT(*), 9) AS mean_quality,
           SUM(agree) / COUNT(*) AS langid_agree_pct,
           SUM(CASE WHEN c > 1 THEN 1.0 ELSE 0.0 END) / COUNT(*)
             AS exact_dup_pct,
           CAST(SUM(haspii) AS BIGINT) AS docs_with_pii
    FROM per JOIN dupc USING (norm)
    GROUP BY source, lang
    """,
    doc="The corpus datacard: per (source, language) — document count, "
    "token volume, mean composite quality, language-ID agreement with "
    "the label, normalized-exact duplicate fraction, and PII-bearing "
    "document count. ONE projection computes every per-doc signal "
    "(tokens/quality/langid/PII are all codegen), one |distinct-norm| "
    "groupBy supplies the duplicate counts, one rollup aggregates — "
    "the whole profile costs a 100 TB corpus two keyed passes. This is "
    "the summary table a dataset release ships.",
    tags=("pipeline", "text", "report"),
)
def corpus_datacard(spark, sf_dir):
    from ..functions import text as _T
    from ..operators.privacy import pii_count

    d = _t(spark, sf_dir, "documents")["documents"]
    # materialize the token array once: this projection references it
    # five times (count, quality ×2, langid, normalized form), and an
    # inline tokens(text) would re-run the regex split per reference
    toks_df = d.select(
        "source", "lang", "text",
        _T.tokens(F.col("text")).alias("__toks"),
    )
    toks = F.col("__toks")
    per = toks_df.select(
        "source", "lang",
        _T.token_count_from(toks).alias("n_tokens"),
        _T.quality_score_from(F.col("text"), toks).alias("quality"),
        (_T.langid_from(toks) == F.col("lang"))
        .cast("double").alias("agree"),
        ((pii_count(F.col("text"), "email")
          + pii_count(F.col("text"), "phone")
          + pii_count(F.col("text"), "ipv4")) > 0)
        .cast("long").alias("haspii"),
        F.array_join(toks, " ").alias("norm"),  # ≡ normalize_text(text)
    )
    # duplicate counts via a window over the norm key: ONE |docs|
    # shuffle (bounded per-key state), instead of a groupBy + join that
    # moves the rows twice
    joined = per.withColumn(
        "c", F.count(F.lit(1)).over(W.partitionBy("norm"))
    )
    return joined.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.sum("quality") / F.count(F.lit(1)), 9)
        .alias("mean_quality"),
        (F.sum("agree") / F.count(F.lit(1))).alias("langid_agree_pct"),
        (F.sum((F.col("c") > 1).cast("double")) / F.count(F.lit(1)))
        .alias("exact_dup_pct"),
        F.sum("haspii").alias("docs_with_pii"),
    )


_QFEAT_SQL = f"""
  WITH tk AS (SELECT doc_id, lang, text, {TOK} AS toks FROM documents),
  feat AS (
    SELECT doc_id, lang,
      least(CAST(len(toks) AS DOUBLE) / 20.0, 1.0) AS x1,
      CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
        / CAST(length(text) AS DOUBLE) AS x2,
      CASE WHEN len(toks) > 0 THEN
        CAST(len(list_filter(toks, t -> list_contains(
          ['the','and','of','to','in','is','a','that','it','for'], t)))
          AS DOUBLE) / CAST(len(toks) AS DOUBLE)
      ELSE 0.0 END AS x3
    FROM tk)
"""


def _quality_features(d):
    """(doc_id, lang, features array<double>) — the shared length /
    punctuation / stopword quality features (same fragments as
    doc_quality_scores, proven cross-engine). The token array is
    materialized in its OWN select first: the feature expression
    references it twice, and handing `tokens(text)` to both would let
    the projection run the regex split per reference (the
    shingles_from_tokens caveat; ~1.5× slower measured here)."""
    from ..functions import text as _T

    toks_df = d.select(
        "doc_id", "lang", "text",
        _T.tokens(F.col("text")).alias("__toks"),
    )
    toks = F.col("__toks")
    n = _T.token_count_from(toks)
    return toks_df.select(
        "doc_id", "lang",
        F.array(
            F.least(n.cast("double") / F.lit(20.0), F.lit(1.0)),
            _T.punct_ratio(F.col("text")),
            _T.stopword_ratio_from(toks),
        ).alias("features"),
    )


@register(
    "quality_classifier_scores",
    oracle=f"""
    {_QFEAT_SQL}
    SELECT doc_id,
           ROUND(1.0 / (1.0 + EXP(-(-1.0 + 2.5 * x1 + -3.0 * x2
                                    + 1.0 * x3))), 9) AS quality_p
    FROM feat
    """,
    doc="Logistic quality-classifier SCORING (operators/classifier.py::"
    "logistic_score): fixed pretrained weights over the length/"
    "punctuation/stopword features, sigmoid margin as one whole-stage-"
    "codegen projection — the model-based corpus quality filter every "
    "LLM pipeline runs after training a lightweight classifier on "
    "labeled data. Map-only at any corpus size; margin folded "
    "left-to-right so the SQL oracle reproduces it bit-for-bit "
    "(sigmoid rounded to 9 decimals both sides for libm exp ulps).",
    tags=("pipeline", "text", "classifier"),
)
def quality_classifier_scores(spark, sf_dir):
    from ..operators.classifier import logistic_score

    d = _t(spark, sf_dir, "documents")["documents"]
    feats = _quality_features(d)
    return feats.select(
        "doc_id",
        F.round(
            logistic_score("features", -1.0, [2.5, -3.0, 1.0]), 9
        ).alias("quality_p"),
    )


@register(
    "logreg_train_weights",
    property_test="tests/test_classifier.py::test_partition_invariance_bit_exact",
    oracle=None,  # iterative gradient descent has no SQL twin —
    # rows-only; tests/test_classifier.py pins bit-exact partition
    # invariance (decimal-summed gradients), NumPy-reference agreement
    # (1e-9), and perfect separation on separable blobs
    doc="Distributed logistic-regression TRAINING (operators/"
    "classifier.py::train_logistic): label = (lang = 'en'), features = "
    "the shared quality triple. Each iteration is ONE aggregate scan "
    "producing d+2 scalars (per-dimension gradient + bias gradient + "
    "loss, decimal-cast so the reduce is exact and partition-"
    "invariant); the corpus never shuffles and nothing but the scalars "
    "reaches the driver — at 100 TB training costs `iters` column "
    "scans. Returned weights rounded to 9 decimals.",
    tags=("pipeline", "text", "classifier"),
)
def logreg_train_weights(spark, sf_dir):
    from ..operators.classifier import train_logistic

    d = _t(spark, sf_dir, "documents")["documents"]
    feats = _quality_features(d).withColumn(
        "label", (F.col("lang") == "en").cast("int")
    )
    m = train_logistic(feats, "features", "label", dim=3, iters=5, lr=1.0)
    rows = [("bias", round(m["bias"], 9)),
            ("w_len", round(m["weights"][0], 9)),
            ("w_punct", round(m["weights"][1], 9)),
            ("w_stopword", round(m["weights"][2], 9)),
            ("loss", round(m["loss"], 9))]
    return spark.createDataFrame(rows, "name string, value double")


def _canon_url_sql(u: str) -> str:
    """Identical-arithmetic DuckDB twin of functions/web.py::
    canonical_url (same regexes — RE2 ∩ Java dialect — same op
    order)."""
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    hostport = (f"lower(regexp_extract({u}, "
                f"'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))")
    host0 = f"regexp_replace({hostport}, '^www\\.', '')"
    host = (f"(CASE WHEN {scheme} = 'http' "
            f"THEN regexp_replace({host0}, ':80$', '') "
            f"WHEN {scheme} = 'https' "
            f"THEN regexp_replace({host0}, ':443$', '') "
            f"ELSE {host0} END)")
    path0 = (f"regexp_extract({u}, "
             f"'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)")
    path1 = f"(CASE WHEN {path0} = '' THEN '/' ELSE {path0} END)"
    path = (f"(CASE WHEN length({path1}) > 1 "
            f"THEN regexp_replace({path1}, '/$', '') ELSE {path1} END)")
    rawq = f"regexp_extract({u}, '^[^#?]*\\?([^#]*)', 1)"
    params = (f"list_sort(list_filter(string_split({rawq}, '&'), "
              f"p -> p <> '' AND NOT regexp_matches(p, "
              f"'^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)=')))")
    query = f"array_to_string({params}, '&')"
    canon = (f"concat({scheme}, '://', {host}, {path}, "
             f"CASE WHEN {query} <> '' THEN concat('?', {query}) "
             f"ELSE '' END)")
    return f"(CASE WHEN {scheme} <> '' THEN {canon} ELSE {u} END)"


_URL_SYNTH_SQL = """
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN concat('http://www.example', CAST(doc_id % 50 AS VARCHAR),
                         '.com:80/page/', CAST(doc_id % 10 AS VARCHAR),
                         '/?utm_source=x&b=2&a=1#top')
      WHEN 1 THEN concat('http://example', CAST(doc_id % 50 AS VARCHAR),
                         '.com/page/', CAST(doc_id % 10 AS VARCHAR),
                         '?a=1&b=2')
      WHEN 2 THEN concat('https://example', CAST(doc_id % 50 AS VARCHAR),
                         '.com:443/page/', CAST(doc_id % 10 AS VARCHAR), '/')
      ELSE concat('HTTPS://EXAMPLE', CAST(doc_id % 50 AS VARCHAR),
                  '.COM/page/', CAST(doc_id % 10 AS VARCHAR))
    END AS url
  FROM documents
"""


@register(
    "url_dedup_groups",
    oracle=f"""
    WITH urls AS ({_URL_SYNTH_SQL}),
    canon AS (SELECT {_canon_url_sql('url')} AS cu FROM urls)
    SELECT cu, COUNT(*) AS n
    FROM canon GROUP BY cu HAVING COUNT(*) > 1
    ORDER BY n DESC, cu LIMIT 50
    """,
    doc="Canonical-URL dedup (functions/web.py::canonical_url) — the "
    "FIRST dedup key of a web-crawl corpus, needing no document bytes: "
    "scheme/host lowercased, www. and default ports stripped, fragment "
    "and tracking params (utm_*/fbclid/gclid/msclkid/ref) dropped, "
    "remaining query params sorted, trailing slash normalized — all "
    "regexp/array codegen, no UDF; then ONE groupBy on the canonical "
    "key (16-byte-ish strings, never documents). Synthetic URL "
    "variants are closed-form in doc_id so the identical-regex DuckDB "
    "twin verifies every rule (case, ports, param order, tracking "
    "strip, trailing slash).",
    tags=("pipeline", "dedup", "web"),
)
def url_dedup_groups(spark, sf_dir):
    from ..functions.web import canonical_url

    d = _t(spark, sf_dir, "documents")["documents"]
    v = F.col("doc_id") % 4
    host = F.concat(F.lit("example"),
                    (F.col("doc_id") % 50).cast("string"), F.lit(".com"))
    page = (F.col("doc_id") % 10).cast("string")
    url = (
        F.when(v == 0, F.concat(
            F.lit("http://www."), host, F.lit(":80/page/"), page,
            F.lit("/?utm_source=x&b=2&a=1#top")))
        .when(v == 1, F.concat(
            F.lit("http://"), host, F.lit("/page/"), page,
            F.lit("?a=1&b=2")))
        .when(v == 2, F.concat(
            F.lit("https://"), host, F.lit(":443/page/"), page,
            F.lit("/")))
        .otherwise(F.concat(
            F.lit("HTTPS://EXAMPLE"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit(".COM/page/"), page))
    )
    canon = d.select(canonical_url(url).alias("cu"))
    return (
        canon.groupBy("cu").agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .orderBy(F.col("n").desc(), F.col("cu").asc())
        .limit(50)
    )


@register(
    "corpus_curation_pipeline",
    oracle=f"""
    WITH tk AS (SELECT doc_id, lang, text, {TOK} AS toks FROM documents),
    base AS (
      SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens,
             array_to_string(toks, ' ') AS norm,
             least(CAST(len(toks) AS DOUBLE) / 20.0, 1.0) AS x1,
             CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                  AS DOUBLE) / CAST(length(text) AS DOUBLE) AS x2,
             CASE WHEN len(toks) > 0 THEN
               CAST(len(list_filter(toks, t -> list_contains(
                 ['the','and','of','to','in','is','a','that','it','for'],
                 t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
             ELSE 0.0 END AS x3
      FROM tk),
    first AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY norm ORDER BY doc_id)
                AS rn
      FROM base),
    q AS (
      SELECT doc_id, lang, n_tokens,
             ROUND(1.0 / (1.0 + EXP(-(-1.0 + 2.5 * x1 + -3.0 * x2
                                      + 1.0 * x3))), 9) AS p
      FROM first WHERE rn = 1),
    f AS (SELECT * FROM q WHERE p >= 0.45),
    kept AS (
      SELECT *, SUM(n_tokens) OVER (
        ORDER BY p DESC, doc_id ASC ROWS UNBOUNDED PRECEDING) AS cum
      FROM f)
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM kept WHERE cum <= 15000 GROUP BY lang
    """,
    doc="END-TO-END corpus curation — the pipeline a release actually "
    "runs, composed from the engine's own stages in ONE lazy plan: "
    "(1) normalized-exact dedup keeps the first doc per analyzed key "
    "(per-key window, |docs| shuffle of 16-byte-ish norm keys); "
    "(2) the logistic quality classifier (fixed weights, map-only "
    "codegen sigmoid) floors at p >= 0.45; (3) budget-bounded "
    "selection takes the best docs quality-first until 15k tokens "
    "via the two-phase distributed cumsum (no global window — "
    "operators/sampling.py::select_until_token_budget); (4) per-lang "
    "release counts. Every stage is the SAME operator its standalone "
    "catalog row verifies; this row verifies the COMPOSITION.",
    tags=("pipeline", "dedup", "classifier", "sampling"),
)
def corpus_curation_pipeline(spark, sf_dir):
    from ..functions import text as _T
    from ..operators.classifier import logistic_score
    from ..operators.sampling import select_until_token_budget

    d = _t(spark, sf_dir, "documents")["documents"]
    # token array materialized once (referenced four times below —
    # count, length feature, stopword feature, normalized form)
    toks_df = d.select(
        "doc_id", "lang", "text",
        _T.tokens(F.col("text")).alias("__toks"),
    )
    toks = F.col("__toks")
    n = _T.token_count_from(toks)
    base = toks_df.select(
        "doc_id", "lang",
        n.cast("long").alias("n_tokens"),
        F.array_join(toks, " ").alias("norm"),  # ≡ normalize_text(text)
        F.array(
            F.least(n.cast("double") / F.lit(20.0), F.lit(1.0)),
            _T.punct_ratio(F.col("text")),
            _T.stopword_ratio_from(toks),
        ).alias("features"),
    )
    first = (
        base.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("norm").orderBy(F.col("doc_id").asc())
            ),
        )
        .filter(F.col("rn") == 1)
    )
    scored = first.select(
        "doc_id", "lang", "n_tokens",
        F.round(
            logistic_score("features", -1.0, [2.5, -3.0, 1.0]), 9
        ).alias("p"),
    ).filter(F.col("p") >= 0.45)
    kept = select_until_token_budget(
        scored, budget=15_000, token_col="n_tokens",
        order_by=[F.col("p").desc(), F.col("doc_id").asc()],
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
