"""Extension-operator catalog: LLM-training-data pipeline queries over the
``documents`` / ``embeddings`` tables (driver charter; SURVEY §2.10
E1–E5) — dedup (exact / MinHash-LSH / SimHash / blocked Jaccard),
similarity search (brute-force / multi-query / LSH-ANN), text analysis
(language-ID, quality, tokens, fingerprints), and multimodal binary
columns.

Oracle bit-exactness rules (empirically verified against DuckDB):

- Tokenization: Spark ``split(lower(text), '[^\\p{L}\\p{Nd}]+')`` ≡
  DuckDB ``string_split_regex`` with the same RE2-compatible class.
- Cosine: the query vector is sourced FROM THE TABLE in both engines.
  DuckDB parses bare decimal literals as DECIMAL first, which rounds
  the reconstructed double by 1 ulp — literals are banned in vector
  oracles. The dot/norm folds use ``list_reduce`` seeded with 0.0,
  matching ``F.aggregate``'s sequential left fold bit-for-bit
  (``list_sum`` pairwise-sums and drifts by 1 ulp).
- MinHash-LSH at 64 hashes / 32 bands (r=2) has per-pair miss
  probability (1-j²)³² ≈ 4e-10 at j=0.7, so the exact all-pairs
  Jaccard oracle is safe; verification is exact so no false positives.

Scale notes (100 TB): all candidate generation is groupBy/join on
bounded keys (hash, band bucket, label block) — never an unblocked
self-join; ANN materializes narrow bucket signatures; multimodal
payloads stay on executors with Arrow-batched UDFs.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..operators import dedup as D
from ..operators import hnsw as H
from ..operators import multimodal as M
from ..operators import archive as ARC
from ..operators import pdf as PDF
from ..operators import warc as WARC
from ..operators import similarity as S
from ..functions import text as T
from ..functions import vectors as V
from .catalog import register, _t

# --- shared DuckDB fragments (verified bit-exact vs the Spark twins) ----

TOK = r"list_filter(string_split_regex(lower(text), '[^\pL\p{Nd}]+'), x -> x != '')"

SHINGLE_CTE = f"""
tk AS (SELECT doc_id, lang, {TOK} AS toks FROM documents),
sh AS (
  SELECT doc_id, lang,
         list_distinct(
           CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                ELSE list_transform(generate_series(1, len(toks) - 2),
                                    i -> array_to_string(list_slice(toks, i, i + 2), ' '))
           END) AS s
  FROM tk)
"""

JACCARD = ("CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)"
           " / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE)")


def _fold(lst: str) -> str:
    return f"list_reduce(list_prepend(0.0, {lst}), (acc, x) -> acc + x)"


def _cos(a: str, b: str) -> str:
    dot = _fold(f"list_transform(generate_series(1, len({a})), "
                f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))")
    na = _fold(f"list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
    nb = _fold(f"list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
    return f"{dot} / (sqrt({na}) * sqrt({nb}))"


# ---------------------------------------------------------------------------
# Dedup family (E1/E2)
# ---------------------------------------------------------------------------

@register(
    "exact_dedup_groups",
    oracle="""
    SELECT md5(text) AS text_hash, MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
    FROM documents GROUP BY md5(text)
    """,
    doc="Exact dedup: one representative per md5(text); shuffle carries "
    "16-byte hashes, never document bodies.",
    tags=("dedup",),
)
def exact_dedup_groups(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    return D.exact_dedup(d)


@register(
    "normalized_dedup_groups",
    oracle=f"""
    SELECT md5(array_to_string({TOK}, ' ')) AS norm_hash,
           MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
    FROM documents GROUP BY 1
    """,
    doc="Exact dedup after analyzer normalization (case/punct/whitespace).",
    tags=("dedup",),
)
def normalized_dedup_groups(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    return D.normalized_dedup(d)


@register(
    "jaccard_near_dup_pairs",
    oracle=f"""
    WITH {SHINGLE_CTE}
    SELECT id_a, id_b, jaccard FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, {JACCARD} AS jaccard
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
    ) WHERE jaccard >= 0.7
    """,
    doc="Deterministic blocked near-dup pairs: exact 3-shingle Jaccard within "
    "language blocks (the SQL-expressible member of the dedup family).",
    tags=("dedup",),
)
def jaccard_near_dup_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    return D.blocked_jaccard_pairs(d, threshold=0.7, block_cols=("lang",))


@register(
    "minhash_near_dup_pairs",
    oracle=f"""
    WITH {SHINGLE_CTE}
    SELECT id_a, id_b, jaccard FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, {JACCARD} AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    ) WHERE jaccard >= 0.7
    """,
    doc="MinHash+LSH near-dup pairs (64 hashes, 32 bands → r=2) with exact "
    "Jaccard verification of candidates only. Oracle = exact all-pairs "
    "Jaccard: verification kills false positives and band recall at "
    "j≥0.7 is 1-(1-j²)³² ≈ 1-4e-10, so the sets coincide. At scale the "
    "banded (bucket, id) shuffle is linear in corpus size; the oracle's "
    "quadratic all-pairs join exists only for sf0.01 checking.",
    tags=("dedup", "lsh"),
)
def minhash_near_dup_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    return D.minhash_lsh_pairs(d, num_hashes=64, bands=32, threshold=0.7)


@register(
    "near_dup_survivor_count",
    oracle=f"""
    WITH {SHINGLE_CTE},
    pairs AS (
      SELECT id_b FROM (
        SELECT b.doc_id AS id_b, {JACCARD} AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      ) WHERE jaccard >= 0.7)
    SELECT COUNT(*) AS n_docs FROM documents
    WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM pairs)
    """,
    doc="Corpus size after near-dup removal (drop higher-id member of each "
    "MinHash pair; anti-join, single pass).",
    tags=("dedup", "lsh"),
)
def near_dup_survivor_count(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    pairs = D.minhash_lsh_pairs(d, num_hashes=64, bands=32, threshold=0.7)
    return D.dedup_by_pairs(d, pairs).agg(F.count("*").alias("n_docs"))


@register(
    "simhash_near_dup_pairs",
    property_test="tests/test_dedup_similarity.py::test_simhash_finds_exact_and_near_dups",
    oracle=None,  # xxhash64 has no DuckDB twin — rows-only check
    doc="SimHash near-dup pairs: 64-bit signature, pigeonhole blocking on "
    "16-bit chunks (hamming ≤ 3 ⇒ some chunk equal), exact hamming verify. "
    "Property-tested in tests/test_dedup_similarity.py.",
    tags=("dedup", "lsh"),
)
def simhash_near_dup_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    return D.simhash_pairs(d, max_hamming=3)


# ---------------------------------------------------------------------------
# Text-analysis family (E4)
# ---------------------------------------------------------------------------

@register(
    "text_stats_by_lang",
    oracle=f"""
    WITH tk AS (SELECT lang, CAST(len({TOK}) AS BIGINT) AS n FROM documents)
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS sum_tokens,
           CAST(CAST(SUM(n) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_tokens
    FROM tk GROUP BY lang
    """,
    doc="Token-count statistics per language (analyzer = lowercase + "
    "unicode-class split, shared with dedup shingling).",
    tags=("text",),
)
def text_stats_by_lang(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    tk = d.select("lang", T.token_count(F.col("text")).alias("n"))
    return tk.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n").alias("sum_tokens"),
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
    )


def _langid_sql() -> str:
    def hits(lang: str) -> str:
        lst = ", ".join(f"'{w}'" for w in T.STOPWORDS[lang])
        return f"len(list_intersect(toks, [{lst}]))"

    langs = ("en", "es", "de", "fr", "zh")
    best = "greatest(" + ", ".join(hits(lg) for lg in langs) + ")"
    whens = " ".join(f"WHEN {hits(lg)} = {best} THEN '{lg}'" for lg in langs)
    return f"CASE WHEN {best} = 0 THEN 'und' {whens} ELSE 'und' END"


@register(
    "langid_eval",
    oracle=f"""
    WITH tk AS (SELECT lang, {TOK} AS toks FROM documents)
    SELECT lang, {_langid_sql()} AS pred_lang, COUNT(*) AS n
    FROM tk GROUP BY 1, 2
    """,
    doc="Language-ID confusion counts: stopword-vote heuristic prediction vs "
    "the labeled lang column (first-wins deterministic tie-break).",
    tags=("text",),
)
def langid_eval(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    tk = d.select("lang", T.tokens(F.col("text")).alias("toks"))
    return tk.groupBy(
        "lang", T.langid_from(F.col("toks")).alias("pred_lang")
    ).agg(F.count("*").alias("n"))


@register(
    "doc_quality_scores",
    oracle=f"""
    WITH tk AS (SELECT doc_id, text, {TOK} AS toks FROM documents),
    m AS (
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
          / CAST(length(text) AS DOUBLE) AS pr,
        CAST(len(list_filter(toks, t -> list_contains(
            ['the','and','of','to','in','is','a','that','it','for'], t))) AS DOUBLE)
          / CAST(len(toks) AS DOUBLE) AS swr
      FROM tk)
    SELECT doc_id, n_tokens,
           (least(CAST(n_tokens AS DOUBLE) / 20.0, 1.0)
            + (1.0 - least(pr * 5.0, 1.0))
            + (1.0 - abs(swr - 0.4))) / 3.0 AS quality
    FROM m
    """,
    doc="Per-document quality score: length / punctuation / stopword-ratio "
    "composite, all JVM-side expressions (bit-exact vs the SQL oracle).",
    tags=("text",),
)
def doc_quality_scores(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    tk = d.select("doc_id", "text", T.tokens(F.col("text")).alias("toks"))
    return tk.select(
        "doc_id",
        T.token_count_from(F.col("toks")).alias("n_tokens"),
        T.quality_score_from(F.col("text"), F.col("toks")).alias("quality"),
    )


@register(
    "token_topk",
    oracle=f"""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest({TOK}) AS token FROM documents)
    GROUP BY token ORDER BY n DESC, token ASC LIMIT 20
    """,
    doc="Corpus-level token frequency top-k (explode → partial-agg groupBy → "
    "TakeOrdered; shuffle volume is |vocab|, not |tokens|).",
    tags=("text", "topk"),
)
def token_topk(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    return (
        d.select(F.explode(T.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


@register(
    "bpe_token_budget",
    oracle=r"""
    SELECT lang,
           CAST(SUM(len(regexp_extract_all(text,
             '''(?:s|t|re|ve|m|ll|d)| ?\pL+| ?\pN+| ?[^\s\pL\pN]+'))) AS BIGINT)
             AS sum_bpe_tokens,
           COUNT(*) AS n_docs
    FROM documents GROUP BY lang
    """,
    doc="Token-budget accounting with a BPE-ish pre-tokenizer (GPT-2-style "
    "split: contractions / letter runs / digit runs / punctuation runs, no "
    "lookaheads so Java regex and RE2 agree) — the unit LLM pipelines "
    "meter corpora by.",
    tags=("text",),
)
def bpe_token_budget(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    return d.groupBy("lang").agg(
        F.sum(T.bpe_ish_token_count(F.col("text"))).alias("sum_bpe_tokens"),
        F.count("*").alias("n_docs"),
    )


@register(
    "vocab_by_lang_pandas",
    oracle=f"""
    WITH v AS (
      SELECT lang, COUNT(DISTINCT token) AS vocab
      FROM (SELECT lang, unnest({TOK}) AS token FROM documents) GROUP BY lang
    ), c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang)
    SELECT v.lang, v.vocab, c.n_docs FROM v JOIN c USING (lang)
    """,
    doc="Per-language vocabulary via grouped-map applyInPandas: tokens "
    "are produced JVM-side (analyzer parity), Python only does the "
    "per-group set union over Arrow batches — the grouped-map UDF "
    "pattern with deterministic integer outputs.",
    tags=("text", "pandas-udf"),
)
def vocab_by_lang_pandas(spark, sf_dir):
    import pandas as pd

    d = _t(spark, sf_dir, "documents")["documents"]
    tk = d.select("lang", T.tokens(F.col("text")).alias("toks"))

    def vocab(pdf: "pd.DataFrame") -> "pd.DataFrame":
        vs = set()
        for arr in pdf["toks"]:
            vs.update(arr)
        return pd.DataFrame(
            {"lang": [pdf["lang"].iloc[0]], "vocab": [len(vs)], "n_docs": [len(pdf)]}
        )

    return tk.groupBy("lang").applyInPandas(
        vocab, "lang string, vocab bigint, n_docs bigint"
    )


@register(
    "doc_fingerprint_groups",
    oracle=f"""
    SELECT md5(array_to_string(list_slice({TOK}, 1, 8), ' ')) AS fp,
           COUNT(*) AS n_docs, MIN(doc_id) AS doc_id
    FROM documents GROUP BY 1
    """,
    doc="Document fingerprinting: md5 over the first 8 analyzed tokens "
    "(prefix fingerprint), grouped to find shared-head clusters.",
    tags=("text", "dedup"),
)
def doc_fingerprint_groups(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    return d.groupBy(T.fingerprint(F.col("text")).alias("fp")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("doc_id")
    )


@register(
    "histogram_agg",
    oracle="""
    SELECT floor(value / 50.0) * 50.0 AS bucket_lo, COUNT(*) AS doc_count,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
    """,
    doc="DSL `histogram` aggregation: fixed-interval numeric buckets "
    "(floor(value/step)*step — floor on doubles is bit-deterministic "
    "across engines, unlike round).",
    tags=("agg", "dsl"),
)
def histogram_agg(spark, sf_dir):
    from .catalog import dsum

    e = _t(spark, sf_dir, "events")["events"]
    return (
        e.groupBy((F.floor(F.col("value") / 50.0) * 50.0).alias("bucket_lo"))
        .agg(F.count("*").alias("doc_count"), dsum(F.col("value")).alias("sum_value"))
    )


@register(
    "approx_percentile_agg",
    property_test="tests/test_plans.py::test_approx_percentile_rank_bound_and_determinism",
    oracle=None,  # t-digest/GK sketches differ across engines by design
    doc="percentiles aggregation, approximate: the fixed-size-sketch path "
    "for 100 TB (exact percentile needs a per-group sort; the sketch "
    "merges map-side). Exact twin: percentile_agg.",
    tags=("agg", "approx"),
)
def approx_percentile_agg(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    return e.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("value", 0.95, 10000).alias("p95_approx"),
    )


@register(
    "rolling_hash_fingerprint",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, array_to_string({TOK}, ' ') AS s FROM documents
    )
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, length(s)),
                              i -> CAST(unicode(substr(s, i, 1)) AS BIGINT))),
             (acc, cp) -> (acc * 31 + cp) % 2147483647) AS rh
    FROM norm
    """,
    doc="Karp–Rabin rolling-hash document fingerprint over normalized "
    "text (charter: 'document fingerprinting (rolling hash)') — integer "
    "polynomial fold, bit-identical across engines.",
    tags=("text", "dedup"),
)
def rolling_hash_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    return d.select("doc_id", T.rolling_hash(F.col("text")).alias("rh"))


# ---------------------------------------------------------------------------
# Similarity-search family (E3)
# ---------------------------------------------------------------------------

@register(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, {_cos('e.embedding', 'q.qv')} AS score
    FROM embeddings e, q
    ORDER BY score DESC, e.vec_id ASC LIMIT 10
    """,
    doc="Exact cosine top-10 for one query vector (vec_id=0, sourced from "
    "the table — see module docstring on literal parsing). Physical plan "
    "is scan → project → TakeOrderedAndProject: no corpus shuffle.",
    tags=("similarity", "topk"),
)
def ann_bruteforce_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    qvec = [float(x) for x in
            e.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    return S.brute_force_topk(e, qvec, k=10)


@register(
    "ann_multiquery_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 5)
    SELECT q_id, vec_id, score FROM (
      SELECT q.q_id, e.vec_id, {_cos('e.embedding', 'q.qv')} AS score,
             ROW_NUMBER() OVER (
               PARTITION BY q.q_id
               ORDER BY {_cos('e.embedding', 'q.qv')} DESC, e.vec_id ASC) AS rn
      FROM embeddings e, q
    ) WHERE rn <= 5
    """,
    doc="Exact top-5 per query for a broadcast query set (5 vectors): "
    "corpus never shuffles; window partitions by query id.",
    tags=("similarity", "topk", "join"),
)
def ann_multiquery_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return S.topk_join(e, queries, k=5)


@register(
    "ann_lsh_topk",
    property_test="tests/test_dedup_similarity.py::test_lsh_ann_agrees_with_brute_force_on_clusters",
    oracle=None,  # approximate by design — rows-only; recall property-tested
    doc="LSH-bucketed ANN top-10 (8-bit random-hyperplane signatures × 8 "
    "tables, seeded/deterministic; exact re-rank of candidates only) — the "
    "100 TB path where signatures are precomputed narrow columns.",
    tags=("similarity", "topk", "lsh"),
)
def ann_lsh_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    qvec = [float(x) for x in
            e.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    return S.lsh_ann_topk(e, qvec, k=10)


# --- materialized ANN indexes (build once per session+sf, query many) ----
# Parquet under the repo's gitignored spark-warehouse/; partitioned by
# table / cluster and sorted by bucket so query predicates prune
# partitions and row groups (the reference's materialize-once design,
# custom_resource.py:343-383).

_ANN_IDX_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "spark-warehouse",
    "ann_idx",
)
_ANN_IDX_BUILT: set[str] = set()


def _idx_path(kind: str, sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(_ANN_IDX_ROOT, f"{kind}_{tag}")


def _publish_index(base: str, write) -> None:
    """Atomic publication: build into a UNIQUE version directory under
    ``base``, then flip a one-line ``_CURRENT`` pointer file with
    ``os.replace`` (atomic on POSIX). Concurrent sessions sharing the
    on-disk warehouse therefore never observe a half-written index and
    never clobber a version another session is mid-scan on — each
    writer lands its own version dir and the pointer flip is the only
    shared mutation. Superseded versions are pruned best-effort, but
    never the newest previous version and never anything younger than
    a grace period — back-to-back rebuilds must not delete a version a
    long-running reader resolved via ``_CURRENT`` moments earlier and
    is still scanning (the unbounded best-effort window was an r9
    ADVICE finding)."""
    import shutil
    import time
    import uuid

    grace_secs = 900.0
    os.makedirs(base, exist_ok=True)
    ver = f"v{uuid.uuid4().hex[:12]}"
    write(os.path.join(base, ver))
    tmp = os.path.join(base, f"_CURRENT.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        f.write(ver)
    os.replace(tmp, os.path.join(base, "_CURRENT"))
    vers = sorted(
        (d for d in os.listdir(base) if d.startswith("v") and d != ver),
        key=lambda d: os.path.getmtime(os.path.join(base, d)),
    )
    now = time.time()
    for d in vers[:-1]:
        if now - os.path.getmtime(os.path.join(base, d)) > grace_secs:
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)


def _resolve_index(base: str) -> str:
    with open(os.path.join(base, "_CURRENT")) as f:
        return os.path.join(base, f.read().strip())


def _lsh_index(spark, sf_dir, e):
    path = _idx_path("lsh", sf_dir)
    if path not in _ANN_IDX_BUILT:
        _publish_index(
            path,
            lambda d: (
                S.build_lsh_index(e)
                .sortWithinPartitions("bucket")
                .write.mode("overwrite")
                .partitionBy("table")
                .parquet(d)
            ),
        )
        _ANN_IDX_BUILT.add(path)
    return spark.read.parquet(_resolve_index(path))


def _ivf_index(spark, sf_dir, e, centroids):
    path = _idx_path("ivf", sf_dir)
    if path not in _ANN_IDX_BUILT:
        _publish_index(
            path,
            lambda d: (
                S.build_ivf_index(e, centroids)
                .write.mode("overwrite")
                .partitionBy("_cluster")
                .parquet(d)
            ),
        )
        _ANN_IDX_BUILT.add(path)
    return spark.read.parquet(_resolve_index(path))


@register(
    "ann_lsh_indexed_topk",
    property_test="tests/test_dedup_similarity.py::test_lsh_indexed_matches_oneshot_and_bounds_candidates",
    oracle=None,  # approximate by design — equals ann_lsh_topk, property-tested
    doc="ANN top-10 against a PERSISTED LSH signature table (id, table, "
    "bucket — parquet partitioned by table, sorted by bucket): bucket-key "
    "lookup with pushed (table, bucket) equality predicates, broadcast "
    "semi-join of candidate ids, exact re-rank of candidates only. "
    "Build-once/query-many — the corpus is never signature-folded per "
    "query (reference: materialized OpenSearch index, "
    "custom_resource.py:343-383).",
    tags=("similarity", "topk", "lsh", "index"),
)
def ann_lsh_indexed_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    qvec = [float(x) for x in
            e.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    idx = _lsh_index(spark, sf_dir, e)
    return S.query_lsh_topk(e, idx, qvec, k=10)


@register(
    "ann_ivf_indexed_topk",
    property_test="tests/test_dedup_similarity.py::test_ivf_indexed_matches_oneshot",
    oracle=None,  # approximate by design — equals ann_ivf_topk, property-tested
    doc="IVF ANN top-10 against a PERSISTED cell-assignment table "
    "(id, cluster — parquet partitioned by cluster): probing 4 of 16 "
    "cells is partition pruning on the index scan; candidates broadcast "
    "semi-join the corpus; exact re-rank of candidates only.",
    tags=("similarity", "topk", "ivf", "index"),
)
def ann_ivf_indexed_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    qvec = [float(x) for x in
            e.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    cents = S.ivf_centroids(e, 16)
    idx = _ivf_index(spark, sf_dir, e, cents)
    return S.query_ivf_topk(e, idx, cents, qvec, k=10, n_probe=4)


@register(
    "ann_hnsw_topk",
    property_test="tests/test_hnsw.py::test_hnsw_recall_on_clusters",
    oracle=None,  # approximate by design — recall ≥0.9 property-tested
    doc="HNSW ANN top-10, sharded the way OpenSearch's k-NN plugin "
    "(default method hnsw) runs it: vectors hash into 4 shards, one "
    "applyInPandas group per shard builds a deterministic HNSW graph "
    "(Malkov & Yashunin, arXiv:1603.09320 — levels drawn from "
    "splitmix64(id), insertion vec_id-sorted), the query scatter-"
    "gathers every shard's beam search and a global top-k merges — the "
    "coordinator step. Corpus never shuffles at query time.",
    tags=("similarity", "topk", "hnsw"),
)
def ann_hnsw_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    qvec = [float(x) for x in
            e.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    return H.hnsw_ann_topk(e, qvec, k=10, n_shards=4, ef_search=64)


def _hnsw_index(spark, sf_dir, e):
    path = _idx_path("hnsw", sf_dir)
    if path not in _ANN_IDX_BUILT:
        _publish_index(
            path,
            lambda d: (
                H.build_hnsw_index(e, n_shards=4)
                .write.mode("overwrite")
                .partitionBy("_shard")
                .parquet(d)
            ),
        )
        _ANN_IDX_BUILT.add(path)
    return spark.read.parquet(_resolve_index(path))


@register(
    "ann_hnsw_indexed_topk",
    property_test="tests/test_hnsw.py::test_hnsw_indexed_matches_oneshot",
    oracle=None,  # approximate by design — equals ann_hnsw_topk, property-tested
    doc="HNSW ANN top-10 against a PERSISTED graph (one row per node: "
    "shard, level, per-layer adjacency, normalized vector — parquet "
    "partitioned by shard, published atomically like the LSH/IVF "
    "indexes): each shard reconstructs its graph from its partition and "
    "beam-searches; k rows per shard reach the merge. Build-once/"
    "query-many; CDC deltas rebuild only touched shards "
    "(refresh_hnsw_index, bit-identical to a full rebuild).",
    tags=("similarity", "topk", "hnsw", "index"),
)
def ann_hnsw_indexed_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    qvec = [float(x) for x in
            e.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    idx = _hnsw_index(spark, sf_dir, e)
    return H.query_hnsw_topk(idx, qvec, k=10, ef_search=64)


# --- int8 quantization (E3: compressed-vector retrieval tier) ------------
# Symmetric per-vector max-abs/127 scaling; codes are ¼ the scan bytes of
# float32. Scales cancel inside cosine, so the int8 scoring pass reads only
# the narrow code column; the float column is touched for the short
# re-rank list alone. All double math — DuckDB mirrors it bit-for-bit.

_Q_SCALE = (
    "CASE WHEN list_max(list_transform({v}, x -> abs(CAST(x AS DOUBLE)))) > 0 "
    "THEN list_max(list_transform({v}, x -> abs(CAST(x AS DOUBLE)))) / 127.0 "
    "ELSE 1.0 END"
)

_QZ_CTE = f"""
sc AS (SELECT vec_id, label, embedding,
              {_Q_SCALE.format(v='embedding')} AS s
       FROM embeddings),
qz AS (SELECT vec_id, label, embedding, s,
              list_transform(embedding, x -> round(CAST(x AS DOUBLE) / s)) AS qv
       FROM sc)
"""


@register(
    "embedding_quantization_report",
    oracle=f"""
    WITH {_QZ_CTE},
    er AS (
      SELECT label, len(embedding) AS dim,
             list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE)/s)*s)) AS errs,
             list_transform(embedding,
               x -> round(CAST(x AS DOUBLE)/s)*s) AS deq,
             embedding
      FROM qz)
    SELECT label,
           COUNT(*) AS n_vecs,
           CAST(SUM(CAST(list_sum(list_transform(errs,
                e -> CAST(round(e * 1000000000.0) AS BIGINT))) AS BIGINT))
                AS BIGINT) AS sum_err_nano,
           CAST(SUM(dim) AS BIGINT) AS sum_dim,
           MAX(list_max(errs)) AS max_abs_err,
           MIN({_cos('embedding', 'deq')}) AS min_cos
    FROM er GROUP BY label
    """,
    doc="Per-label int8 quantization quality report: total reconstruction "
    "error (summed in exact integer nanounits so the cross-engine hash is "
    "order-independent), worst per-element error, and worst "
    "original-vs-dequantized cosine. max/min reductions are "
    "order-independent over doubles; no cross-row double sums.",
    tags=("similarity", "quantization"),
)
def embedding_quantization_report(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    v = F.col("embedding")
    xd = lambda x: x.cast("double")  # noqa: E731
    d = (
        e.withColumn("_s", V.int8_scale(v))
        .select(
            "label",
            F.size(v).cast("long").alias("dim"),
            F.transform(
                v,
                lambda x: F.abs(
                    xd(x) - F.round(xd(x) / F.col("_s")) * F.col("_s")
                ),
            ).alias("errs"),
            F.transform(
                v, lambda x: F.round(xd(x) / F.col("_s")) * F.col("_s")
            ).alias("deq"),
            v,
        )
    )
    d = d.select(
        "label",
        "dim",
        F.aggregate(
            F.transform(F.col("errs"), lambda t: F.round(t * F.lit(1e9)).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        ).alias("err_nano"),
        F.array_max(F.col("errs")).alias("row_max"),
        V.cosine(v, F.col("deq")).alias("row_cos"),
    )
    return d.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.sum("err_nano").alias("sum_err_nano"),
        F.sum("dim").alias("sum_dim"),
        F.max("row_max").alias("max_abs_err"),
        F.min("row_cos").alias("min_cos"),
    )


@register(
    "ann_int8_topk",
    oracle=f"""
    WITH {_QZ_CTE},
    q AS (SELECT qv AS qqv FROM qz WHERE vec_id = 0)
    SELECT qz.vec_id, {_cos('qz.qv', 'q.qqv')} AS score
    FROM qz, q
    ORDER BY score DESC, qz.vec_id ASC LIMIT 10
    """,
    doc="Cosine top-10 scored entirely on int8 codes (per-vector scales "
    "cancel inside cosine): the scan reads only the narrow code column — "
    "4× less I/O than float32 at 100 TB. Deterministic (HALF_UP codes on "
    "both engines), so fully oracle-checked despite being a compressed "
    "approximation of the float ranking.",
    tags=("similarity", "topk", "quantization"),
)
def ann_int8_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    qvec = [float(x) for x in
            e.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    return S.int8_topk(S.quantize_embeddings(e), qvec, k=10)


@register(
    "ann_int8_rerank_topk",
    oracle=f"""
    WITH {_QZ_CTE},
    q AS (SELECT qv AS qqv FROM qz WHERE vec_id = 0),
    pre AS (
      SELECT qz.vec_id FROM qz, q
      ORDER BY {_cos('qz.qv', 'q.qqv')} DESC, qz.vec_id ASC LIMIT 50
    ),
    qf AS (SELECT embedding AS fv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, {_cos('e.embedding', 'qf.fv')} AS score
    FROM embeddings e JOIN pre USING (vec_id), qf
    ORDER BY score DESC, e.vec_id ASC LIMIT 10
    """,
    doc="Two-stage retrieval: int8-code scan picks 50 candidates, float "
    "re-rank returns the exact-cosine top-10 over candidates only (the "
    "wide float column is read through a broadcast semi-join of ≤50 ids). "
    "The production shape for compressed-vector stores.",
    tags=("similarity", "topk", "quantization"),
)
def ann_int8_rerank_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    qvec = [float(x) for x in
            e.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    return S.int8_rerank_topk(S.quantize_embeddings(e), qvec, k=10, prefilter=50)


@register(
    "closest_pair_per_label",
    oracle=f"""
    SELECT label, id_a, id_b, score FROM (
      SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
             {_cos('a.embedding', 'b.embedding')} AS score,
             ROW_NUMBER() OVER (
               PARTITION BY a.label
               ORDER BY {_cos('a.embedding', 'b.embedding')} DESC,
                        a.vec_id ASC, b.vec_id ASC) AS rn
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
    ) WHERE rn = 1
    """,
    doc="Embedding-cosine near-dup probe: most-similar pair within each "
    "label block (deterministic blocked self-join — block key bounds the "
    "quadratic term; the unblocked variant is the LSH path).",
    tags=("similarity", "dedup"),
)
def closest_pair_per_label(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    from ..functions.vectors import cosine

    a = e.select(
        F.col("label"), F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    )
    b = e.select(
        F.col("label").alias("label_b"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
    )
    pairs = (
        a.join(b, (F.col("label") == F.col("label_b")) & (F.col("id_a") < F.col("id_b")))
        .select("label", "id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("score"))
    )
    w = W.partitionBy("label").orderBy(
        F.col("score").desc(), F.col("id_a").asc(), F.col("id_b").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("label", "id_a", "id_b", "score")
    )


# ---------------------------------------------------------------------------
# Advanced join + SQL families (SURVEY §2.9: absent in the reference,
# provided Spark-first): as-of join, broadcast range join, grouping sets.
# ---------------------------------------------------------------------------

@register(
    "asof_last_click",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT MAX(c.ts) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts <= p.ts) AS last_click_ts
    FROM events p WHERE p.event_type = 'purchase'
    """,
    doc="As-of join: each purchase matched to the user's most recent "
    "click at-or-before it. Implemented as union + running max over a "
    "(user, time) window — one shuffle on the key, no per-row probe; "
    "the oracle states the same semantics as a correlated subquery.",
    tags=("join", "asof", "time"),
)
def asof_last_click(spark, sf_dir):
    e = _t(spark, sf_dir, "events")["events"]
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("ets"),
        F.lit(0).alias("side"),
        F.col("ts").alias("click_ts"),
        F.lit(None).cast("long").alias("event_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ets"),
        F.lit(1).alias("side"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        "event_id",
    )
    # clicks sort before purchases at equal ts (side 0 < 1) so an
    # exactly-simultaneous click counts as "at-or-before"
    w = (
        W.partitionBy("user_id")
        .orderBy("ets", "side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("last_click_ts", F.max("click_ts").over(w))
        .filter(F.col("side") == 1)
        .select("event_id", "user_id", F.col("ets").alias("ts"), "last_click_ts")
    )


@register(
    "range_band_join",
    oracle="""
    SELECT band, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
    FROM orders
    JOIN (VALUES ('low', 0.0, 100000.0),
                 ('mid', 100000.0, 300000.0),
                 ('high', 300000.0, 1e18)) AS b(band, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
    doc="Range (interval) join against a tiny band dimension: broadcast "
    "nested-loop on the broadcast side only — the fact table never "
    "shuffles for the join.",
    tags=("join", "range"),
)
def range_band_join(spark, sf_dir):
    from .catalog import dsum

    o = _t(spark, sf_dir, "orders")["orders"]
    bands = spark.createDataFrame(
        [("low", 0.0, 100000.0), ("mid", 100000.0, 300000.0), ("high", 300000.0, 1e18)],
        "band string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("sum_price"),
        )
    )


_GROUPING_SETS_SQL = """
SELECT r_name, n_name, COUNT(*) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name), (n_name), ())
"""


@register(
    "grouping_sets_agg",
    oracle=_GROUPING_SETS_SQL,
    doc="Explicit GROUPING SETS (per-region, per-nation, grand total) via "
    "Spark SQL over the registered views — one Expand + partial agg pass, "
    "identical SQL runs on both engines.",
    tags=("agg", "groupingsets", "sql"),
)
def grouping_sets_agg(spark, sf_dir):
    _t(spark, sf_dir, "customer", "nation", "region")  # registers views
    return spark.sql(_GROUPING_SETS_SQL)


@register(
    "session_window_agg",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS ns
      FROM events
    ), sess AS (
      SELECT user_id, ts,
             SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    doc="Native session_window aggregation (batch twin of the streaming "
    "operator in streaming/windows.py). Boundary rule: an event at "
    "exactly start+gap opens a NEW session (half-open window), encoded "
    "as `>=` in the oracle's gap test.",
    tags=("agg", "time", "streaming", "window"),
)
def session_window_agg(spark, sf_dir):
    from ..streaming.windows import session_window_counts

    e = _t(spark, sf_dir, "events")["events"]
    return session_window_counts(e, gap="30 minutes")


# ---------------------------------------------------------------------------
# Full-text analyzed match + TF-IDF (E4; DSL `match` in analyzed mode —
# the inverted-index formulation, vs the LIKE containment in catalog.py)
# ---------------------------------------------------------------------------

def _analyzed_match(spark, sf_dir, min_terms: int):
    d = _t(spark, sf_dir, "documents")["documents"]
    tk = d.select("doc_id", "lang", F.array_distinct(T.tokens(F.col("text"))).alias("toks"))
    inv = tk.select("doc_id", "lang", F.explode("toks").alias("token")).filter(
        F.col("token").isin("fast", "spark")
    )
    matched = inv.groupBy("doc_id", "lang").agg(
        F.countDistinct("token").alias("nt")
    )
    return (
        matched.filter(F.col("nt") >= min_terms)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
    )


@register(
    "match_analyzed_or",
    oracle=f"""
    SELECT lang, COUNT(*) AS n FROM (
      SELECT lang, len(list_intersect(list_distinct({TOK}), ['fast', 'spark'])) AS nt
      FROM documents) WHERE nt >= 1 GROUP BY lang
    """,
    doc="DSL `match` (analyzed, OR of terms): tokenize → explode → "
    "inverted-index term filter → per-doc term count. The posting-list "
    "shuffle carries only matching (doc, term) rows.",
    tags=("fulltext", "text"),
)
def match_analyzed_or(spark, sf_dir):
    return _analyzed_match(spark, sf_dir, 1)


@register(
    "match_analyzed_and",
    oracle=f"""
    SELECT lang, COUNT(*) AS n FROM (
      SELECT lang, len(list_intersect(list_distinct({TOK}), ['fast', 'spark'])) AS nt
      FROM documents) WHERE nt = 2 GROUP BY lang
    """,
    doc="DSL `match` with operator=and: all query terms must appear.",
    tags=("fulltext", "text"),
)
def match_analyzed_and(spark, sf_dir):
    return _analyzed_match(spark, sf_dir, 2)


@register(
    "tfidf_top_term",
    oracle=f"""
    WITH tk AS (SELECT doc_id, unnest({TOK}) AS token FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tk GROUP BY doc_id, token),
    dfreq AS (SELECT token, COUNT(*) AS dfreq FROM tf GROUP BY token),
    n AS (SELECT COUNT(*) AS n FROM documents)
    SELECT doc_id, token, tfidf FROM (
      SELECT tf.doc_id, tf.token,
             CAST(tf.tf AS DOUBLE) * n.n / dfreq.dfreq AS tfidf,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY CAST(tf.tf AS DOUBLE) * n.n / dfreq.dfreq DESC,
                        tf.token ASC) AS rn
      FROM tf JOIN dfreq USING (token) CROSS JOIN n
    ) WHERE rn = 1 AND doc_id < 20
    """,
    doc="TF-IDF (rational idf = N/df, no log — bit-portable across "
    "engines): top term per document. Shuffles carry (doc, term, tf) "
    "aggregates, never raw text.",
    tags=("text", "window"),
)
def tfidf_top_term(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    # corpus size joins in as a broadcast single-row frame — one plan,
    # no separate driver-side count() action
    n = d.agg(F.count("*").alias("__n"))
    tk = d.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("token"))
    tf = tk.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("dfreq"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf", F.col("tf").cast("double") * F.col("__n") / F.col("dfreq")
        )
        .drop("__n")
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("doc_id") < 20))
        .select("doc_id", "token", "tfidf")
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped headline queries (join + filter + agg compositions)
# ---------------------------------------------------------------------------

@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-03-15'
      AND l_shipdate > DATE '1996-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: segment filter on the customer dim (semi-join "
    "reduction), two-fact join, grouped revenue, top-10. Filters push to "
    "all three scans before any join.",
    tags=("join", "agg", "topk", "flagship"),
)
def q3_shipping_priority(spark, sf_dir):
    from .catalog import dsum

    t = _t(spark, sf_dir, "customer", "orders", "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1996-03-15").cast("date"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(revenue, 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .select("l_orderkey", "revenue", "o_orderdate")
        .limit(10)
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure scan + conjunctive pushed filters + single "
    "agg — the query that measures raw scan/codegen throughput.",
    tags=("agg", "filter", "flagship"),
)
def q6_forecast_revenue(spark, sf_dir):
    from .catalog import dsum

    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# DSL long tail: regexp + fuzzy via the query-DSL interpreter
# ---------------------------------------------------------------------------

@register(
    "regexp_match",
    oracle="""
    SELECT p_brand, COUNT(*) AS n FROM part
    WHERE regexp_full_match(p_name, '(?:(red|green).*)') GROUP BY p_brand
    """,
    doc="DSL `regexp` query (whole-value anchored), compiled through the "
    "query-DSL interpreter (operators/search.py).",
    tags=("dsl", "filter"),
)
def regexp_match(spark, sf_dir):
    from ..operators.search import compile_query

    p = _t(spark, sf_dir, "part")["part"]
    return (
        p.filter(compile_query({"regexp": {"p_name": "(red|green).*"}}))
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"))
    )


@register(
    "fuzzy_match",
    oracle=f"""
    SELECT lang, COUNT(*) AS n FROM (
      SELECT lang,
             len(list_filter({TOK}, t -> levenshtein(t, 'spak') <= 1)) AS m
      FROM documents) WHERE m > 0 GROUP BY lang
    """,
    doc="DSL `fuzzy` query: any analyzed token within levenshtein 1 of "
    "the (misspelled) term, via the interpreter's fuzzy clause.",
    tags=("dsl", "fulltext"),
)
def fuzzy_match(spark, sf_dir):
    from ..operators.search import compile_query

    d = _t(spark, sf_dir, "documents")["documents"]
    return (
        d.filter(compile_query({"fuzzy": {"text": {"value": "spak", "fuzziness": 1}}}))
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
    )


@register(
    "query_string_search",
    oracle=f"""
    SELECT lang, COUNT(*) AS n, SUM(n_chars) AS total_chars FROM documents
    WHERE lang IN ('en', 'de')
      AND (list_contains({TOK}, 'spark') OR list_contains({TOK}, 'merge'))
      AND NOT list_contains({TOK}, 'batch')
      AND n_chars >= 200
    GROUP BY lang
    """,
    doc="Lucene-style `query_string` (field groups, AND/OR/NOT, open "
    "range) parsed driver-side to the DSL dict algebra, then compiled to "
    "one pushable Column predicate (operators/search.py::parse_query_string).",
    tags=("dsl", "fulltext"),
)
def query_string_search(spark, sf_dir):
    from ..operators.search import compile_query

    d = _t(spark, sf_dir, "documents")["documents"]
    q = {"query_string": {
        "query": "lang:(en OR de) AND (spark OR merge) AND NOT batch"
                 " AND n_chars:[200 TO *]",
        "default_field": "text",
    }}
    return (
        d.filter(compile_query(q))
        .groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("total_chars"))
    )


@register(
    "simple_query_string_search",
    oracle=f"""
    SELECT source, COUNT(*) AS n FROM documents
    WHERE (' ' || text || ' ') LIKE '% fast merge %'
       OR (list_contains({TOK}, 'spark') AND NOT list_contains({TOK}, 'batch'))
    GROUP BY source
    """,
    doc="`simple_query_string` (`|`=OR, `-`=NOT, quoted phrase) over the "
    "documents corpus; degrades-not-raises parse contract "
    "(operators/search.py::parse_simple_query_string).",
    tags=("dsl", "fulltext"),
)
def simple_query_string_search(spark, sf_dir):
    from ..operators.search import compile_query

    d = _t(spark, sf_dir, "documents")["documents"]
    q = {"simple_query_string": {
        "query": '"fast merge" | spark -batch',
        "fields": ["text"],
        "default_operator": "and",
    }}
    return (
        d.filter(compile_query(q))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
    )


@register(
    "knn_search_dsl",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7)
    SELECT e.vec_id, e.label, {_cos('e.embedding', 'q.qv')} AS _score
    FROM embeddings e, q WHERE e.label >= 1
    ORDER BY _score DESC, e.vec_id ASC LIMIT 10
    """,
    doc="Top-level `knn` DSL query (k-NN plugin search shape) through "
    "execute_search: efficient pre-filter (label >= 1) pushed below "
    "cosine scoring, exact top-10. Plan: scan → filter → project → "
    "TakeOrderedAndProject, no corpus shuffle.",
    tags=("dsl", "similarity", "topk"),
)
def knn_search_dsl(spark, sf_dir):
    from ..operators.search import execute_search

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    qvec = [float(x) for x in
            e.filter(F.col("vec_id") == 7).select("embedding").head()[0]]
    body = {"query": {"knn": {"embedding": {
        "vector": qvec, "k": 10,
        "filter": {"range": {"label": {"gte": 1}}},
        "tie_break": "vec_id",  # deterministic k-boundary under ties
    }}}}
    return execute_search(e, body)["hits"].select("vec_id", "label", "_score")


@register(
    "phrase_suggester",
    property_test="tests/test_search_dsl.py::test_phrase_suggest_corrects_both_terms",
    oracle=None,  # candidate-lattice walk is driver-side post-processing
    # of two Spark frames (vocabulary + bigram LM) — not SQL-expressible;
    # deterministic behavior is pinned by tests/test_search_dsl.py
    doc="Phrase suggester ('did you mean', whole phrase): per-term "
    "vocabulary candidates in ONE pass, bigram stupid-backoff LM scoring "
    "with lookups bounded to the candidate lattice "
    "(operators/search.py::phrase_suggest).",
    tags=("dsl", "suggest"),
)
def phrase_suggester(spark, sf_dir):
    from ..operators.search import phrase_suggest

    d = _t(spark, sf_dir, "documents")["documents"]
    opts = phrase_suggest(d, "text", "spak querry", size=3)
    return spark.createDataFrame(
        [(o["text"], float(o["score"]), o["highlighted"]) for o in opts],
        "suggestion string, score double, highlighted string",
    )


@register(
    "percolate_counts",
    oracle=f"""
    SELECT 'has_spark' AS query_name, COUNT(*) AS n FROM documents
    WHERE list_contains({TOK}, 'spark')
    UNION ALL
    SELECT 'long_doc', COUNT(*) FROM documents WHERE n_chars >= 400
    UNION ALL
    SELECT 'en_merge', COUNT(*) FROM documents
    WHERE lang = 'en' AND list_contains({TOK}, 'merge')
    """,
    doc="Percolator (reverse search): a registry of stored DSL queries "
    "evaluated against every document in ONE projection pass — no joins, "
    "no shuffle (operators/search.py::percolate). Output: per-stored-"
    "query match counts.",
    tags=("dsl", "percolate"),
)
def percolate_counts(spark, sf_dir):
    from ..operators.search import percolate

    d = _t(spark, sf_dir, "documents")["documents"]
    registry = {
        "has_spark": {"match": {"text": "spark"}},
        "long_doc": {"range": {"n_chars": {"gte": 400}}},
        "en_merge": {"bool": {"must": [{"term": {"lang": "en"}},
                                       {"match": {"text": "merge"}}]}},
    }
    return (
        percolate(d, registry, only_matches=True)
        .select(F.explode("_matched_queries").alias("query_name"))
        .groupBy("query_name")
        .agg(F.count("*").alias("n"))
    )


@register(
    "repeated_ngram_report",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {TOK} AS toks FROM documents),
    w AS (SELECT doc_id, array_to_string(list_slice(toks, i, i + 4), ' ') AS gram
          FROM tk, unnest(generate_series(1, len(toks) - 4)) AS u(i)
          WHERE len(toks) >= 5),
    c AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM w GROUP BY gram)
    SELECT w.doc_id, COUNT(*) AS n_windows,
           CAST(SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated,
           CAST(SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS repeated_frac
    FROM w JOIN c USING (gram) GROUP BY w.doc_id
    """,
    doc="Cross-document repeated 5-gram spans (exact-substring dedup "
    "signal, operators/dedup.py::repeated_ngram_report): sliding windows "
    "in a codegen projection, per-gram distinct-doc counts, per-doc "
    "repeated fraction. Catalog runs the at-scale xxhash64-keyed path; "
    "the oracle groups the raw gram strings — counts agree absent a "
    "~2^-64 hash collision.",
    tags=("dedup", "text"),
)
def repeated_ngram_report_q(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    return D.repeated_ngram_report(d, n=5, min_docs=2, key="hash")


@register(
    "terms_set_search",
    oracle=f"""
    SELECT lang, COUNT(*) AS n FROM documents
    WHERE (CASE WHEN list_contains({TOK}, 'spark') THEN 1 ELSE 0 END
         + CASE WHEN list_contains({TOK}, 'merge') THEN 1 ELSE 0 END
         + CASE WHEN list_contains({TOK}, 'stream') THEN 1 ELSE 0 END)
          >= CAST(floor(n_chars / 200) AS INT)
    GROUP BY lang
    """,
    doc="`terms_set`: per-document match threshold from a field "
    "(n_chars/200 via a script-ish derived column) — matched-term count "
    "compared row-wise, one pass, fully pushable.",
    tags=("dsl", "filter"),
)
def terms_set_search(spark, sf_dir):
    from ..operators.search import compile_query

    d = _t(spark, sf_dir, "documents")["documents"]
    d = d.withColumn("required", (F.col("n_chars") / 200).cast("int"))
    q = {"terms_set": {"text": {
        "terms": ["spark", "merge", "stream"],
        "minimum_should_match_field": "required"}}}
    return d.filter(compile_query(q)).groupBy("lang").agg(
        F.count("*").alias("n"))


@register(
    "span_near_search",
    oracle=f"""
    WITH tk AS (SELECT doc_id, lang, {TOK} AS toks FROM documents),
    p AS (SELECT doc_id, lang,
            list_filter(generate_series(1, len(toks)), i -> toks[i] = 'spark') AS p1,
            list_filter(generate_series(1, len(toks)), i -> toks[i] = 'merge') AS p2
          FROM tk)
    SELECT lang, COUNT(*) AS n FROM p
    WHERE len(list_filter(p1,
            a -> len(list_filter(p2, b -> b > a AND b - a <= 4)) > 0)) > 0
    GROUP BY lang
    """,
    doc="`span_near` (span_term 'spark' then 'merge', slop 3, in_order): "
    "Lucene span semantics via per-term position arrays + nested "
    "existential quantifiers — row-local expressions, no explode, no "
    "shuffle (operators/search.py::_compile_span_near). min_partitions "
    "parallelizes the interpreted array lambdas when the scan arrives "
    "as a single small file.",
    tags=("dsl", "fulltext", "span"),
)
def span_near_search(spark, sf_dir):
    from ..session import min_partitions
    from ..operators.search import compile_query

    d = min_partitions(_t(spark, sf_dir, "documents")["documents"])
    q = {"span_near": {
        "clauses": [{"span_term": {"text": "spark"}},
                    {"span_term": {"text": "merge"}}],
        "slop": 3, "in_order": True}}
    return d.filter(compile_query(q)).groupBy("lang").agg(
        F.count("*").alias("n"))


@register(
    "more_like_this_search",
    oracle=f"""
    WITH tk AS (SELECT doc_id, lang, {TOK} AS toks FROM documents),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tk),
    src AS (SELECT unnest(toks) AS t FROM tk WHERE doc_id = 0),
    tf AS (SELECT t, CAST(COUNT(*) AS DOUBLE) AS tf FROM src
           GROUP BY t HAVING COUNT(*) >= 2),
    dfq AS (SELECT tf.t, tf.tf,
                   CAST((SELECT COUNT(*) FROM tk
                         WHERE list_contains(tk.toks, tf.t)) AS DOUBLE) AS df
            FROM tf),
    sel AS (SELECT t FROM dfq, nn WHERE df >= 5.0
            ORDER BY tf * ln(1.0 + (n - df + 0.5)/(df + 0.5)) DESC, t ASC
            LIMIT 10),
    sl AS (SELECT list(t) AS ts,
                  GREATEST(1, CAST(floor((COUNT(*) * 60.0)/100.0) AS BIGINT)) AS msm
           FROM sel)
    SELECT lang, COUNT(*) AS n_similar
    FROM tk, sl WHERE doc_id != 0
      AND len(list_filter(sl.ts, s -> list_contains(tk.toks, s))) >= sl.msm
    GROUP BY lang
    """,
    doc="`more_like_this` (like_id=0): candidate terms tf>=2 within the "
    "like doc, corpus df>=5, top-10 by tf*idf, 30% minimum_should_match "
    "disjunction. Corpus stats reduce to ONE one-row aggregate; the "
    "oracle recomputes the identical term selection in SQL "
    "(operators/relevance.py::more_like_this).",
    tags=("dsl", "fulltext"),
)
def more_like_this_search(spark, sf_dir):
    from ..operators.relevance import more_like_this

    d = _t(spark, sf_dir, "documents")["documents"]
    sim = more_like_this(
        d, "text", like_id=0,
        min_term_freq=2, min_doc_freq=5, max_query_terms=10,
        minimum_should_match="60%",
    )
    return sim.groupBy("lang").agg(F.count("*").alias("n_similar"))


@register(
    "highlight_search",
    oracle=f"""
    SELECT doc_id,
           regexp_replace(text, '(?i)\\b(spark|merge)\\b', '<em>\\1</em>', 'g')
             AS _highlight_text
    FROM documents
    WHERE list_contains({TOK}, 'spark') OR list_contains({TOK}, 'merge')
    ORDER BY doc_id ASC LIMIT 50
    """,
    doc="DSL `highlight` (number_of_fragments=0 whole-field mode): query "
    "terms wrapped in pre/post tags via one JVM regexp_replace projection "
    "over the already-limited hits — no extra pass, no Python "
    "(operators/search.py::apply_highlight).",
    tags=("dsl", "fulltext"),
)
def highlight_search(spark, sf_dir):
    from ..operators.search import execute_search

    d = _t(spark, sf_dir, "documents")["documents"]
    body = {
        "query": {"match": {"text": "spark merge"}},
        "sort": [{"doc_id": "asc"}],
        "size": 50,
        "highlight": {"fields": {"text": {}}},
    }
    return execute_search(d, body)["hits"].select("doc_id", "_highlight_text")


@register(
    "term_suggester",
    oracle=f"""
    WITH v AS (SELECT t AS term, COUNT(*) AS freq
               FROM (SELECT unnest({TOK}) AS t FROM documents) GROUP BY t)
    SELECT term, freq,
           1.0 - CAST(levenshtein(term, 'spak') AS DOUBLE)
                 / CAST(GREATEST(len(term), 4) AS DOUBLE) AS score
    FROM v
    WHERE term != 'spak' AND starts_with(term, 's')
      AND levenshtein(term, 'spak') <= 2
    ORDER BY score DESC, freq DESC, term ASC LIMIT 5
    """,
    doc="Term suggester ('did you mean spak'): corpus vocabulary "
    "aggregate (token-only shuffle), Lucene-style first-char prefix "
    "pruning BEFORE edit distance, score = 1 - d/max(len), rank by "
    "(score, freq). operators/search.py::term_suggest.",
    tags=("dsl", "suggest"),
)
def term_suggester(spark, sf_dir):
    from ..operators.search import term_suggest

    d = _t(spark, sf_dir, "documents")["documents"]
    return term_suggest(d, "text", "spak", size=5)


_BM25_K1, _BM25_B = 1.2, 0.75
_BM25_NORM = (f"{_BM25_K1!r}*({1.0 - _BM25_B!r} + {_BM25_B!r}*dl/avgdl)")


def _bm25_term(i: int) -> str:
    return (
        f"CASE WHEN tf{i} > 0 THEN "
        f"ln(1.0 + (n - df{i} + 0.5)/(df{i} + 0.5))"
        f" * (tf{i} * {_BM25_K1 + 1.0!r} / (tf{i} + {_BM25_NORM}))"
        f" ELSE 0.0 END"
    )


@register(
    "bm25_ranked_search",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {TOK} AS toks FROM documents),
    st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(len(toks)) AS avgdl,
                  CAST(SUM(CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
                  CAST(SUM(CASE WHEN list_contains(toks, 'merge') THEN 1 ELSE 0 END) AS DOUBLE) AS df1
           FROM tk),
    sc AS (SELECT t.doc_id,
                  CAST(len(list_filter(t.toks, x -> x = 'spark')) AS DOUBLE) AS tf0,
                  CAST(len(list_filter(t.toks, x -> x = 'merge')) AS DOUBLE) AS tf1,
                  CAST(len(t.toks) AS DOUBLE) AS dl,
                  st.n, st.avgdl, st.df0, st.df1
           FROM tk t, st)
    SELECT doc_id, _score FROM (
      SELECT doc_id, ({_bm25_term(0)}) + ({_bm25_term(1)}) AS _score FROM sc)
    WHERE _score > 0
    ORDER BY _score DESC, doc_id ASC LIMIT 20
    """,
    doc="Lucene BM25 ranked retrieval for an analyzed OR-match "
    "(operators/relevance.py): corpus stats (N, avgdl, per-term df) in "
    "ONE map-side-combined aggregate broadcast back as a width-1 "
    "dimension; per-doc tf as codegen array expressions; top-20 via "
    "TakeOrderedAndProject — two corpus passes, zero body shuffles.",
    tags=("dsl", "fulltext", "ranking"),
)
def bm25_ranked_search(spark, sf_dir):
    from ..operators.relevance import score_match_bm25

    d = _t(spark, sf_dir, "documents")["documents"]
    s = score_match_bm25(d, "text", "spark merge")
    return (
        s.select("doc_id", "_score")
        .orderBy(F.col("_score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


# Deterministic synthetic geo_point per customer (coordinates quantized
# to 0.01°; closed-form in c_custkey so the DuckDB oracle recomputes
# them exactly). The flights fixture carries no geo fields, so the geo
# tier synthesizes its own — same pattern as the multimodal decode
# queries.
_GEO_LAT = "((c_custkey * 7919) % 18000) / 100.0 - 90.0"
_GEO_LON = "((c_custkey * 104729) % 36000) / 100.0 - 180.0"
_GEO_DIST_SQL = (
    "2 * 6371.0088 * ASIN(SQRT(LEAST("
    "SIN(RADIANS(40.7128 - lat) / 2) * SIN(RADIANS(40.7128 - lat) / 2)"
    " + COS(RADIANS(lat)) * COS(RADIANS(40.7128))"
    " * SIN(RADIANS(-74.006 - lon) / 2) * SIN(RADIANS(-74.006 - lon) / 2)"
    ", 1.0)))"
)


def _geo_points(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")["customer"]
    lat = ((F.col("c_custkey") * 7919) % 18000) / 100.0 - 90.0
    lon = ((F.col("c_custkey") * 104729) % 36000) / 100.0 - 180.0
    return c.select(
        "c_custkey",
        F.struct(lat.alias("lat"), lon.alias("lon")).alias("location"),
    )


@register(
    "geo_distance_search",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey, {_GEO_LAT} AS lat, {_GEO_LON} AS lon FROM customer)
    SELECT c_custkey, ROUND({_GEO_DIST_SQL}, 6) AS distance_km
    FROM pts WHERE {_GEO_DIST_SQL} <= 3000.0
    """,
    doc="geo_distance DSL query (operators/search.py + functions/geo.py): "
    "customers whose synthesized geo_point lies within 3000 km of NYC, "
    "exact haversine as codegen column arithmetic — no geo index tier; "
    "the scale shape is a pushable bounding-box pre-filter refining with "
    "the exact distance. Reported distances rounded to 6 decimals on "
    "both sides (libm last-ulp tolerance).",
    tags=("dsl", "geo"),
)
def geo_distance_search(spark, sf_dir):
    from ..functions.geo import haversine_km
    from ..operators.search import execute_search

    pts = _geo_points(spark, sf_dir)
    hits = execute_search(
        pts,
        {"query": {"geo_distance": {
            "distance": "3000km",
            "location": {"lat": 40.7128, "lon": -74.006},
        }}},
    )["hits"]
    return hits.select(
        "c_custkey",
        F.round(
            haversine_km(
                F.col("location.lat"), F.col("location.lon"),
                F.lit(40.7128), F.lit(-74.006),
            ),
            6,
        ).alias("distance_km"),
    )


@register(
    "geo_bbox_nearest",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey, {_GEO_LAT} AS lat, {_GEO_LON} AS lon FROM customer)
    SELECT c_custkey, lat, lon FROM pts
    WHERE lat <= 60.0 AND lat >= 10.0 AND lon >= -120.0 AND lon <= -60.0
    ORDER BY {_GEO_DIST_SQL} ASC, c_custkey ASC LIMIT 15
    """,
    doc="geo_bounding_box DSL filter (four pushable comparisons — the "
    "predicate reaches the scan) composed with a _geo_distance sort: "
    "the 15 in-box customers nearest NYC, tie-broken by key. "
    "TakeOrderedAndProject over the filtered scan — never a full sort.",
    tags=("dsl", "geo"),
)
def geo_bbox_nearest(spark, sf_dir):
    from ..operators.search import execute_search

    pts = _geo_points(spark, sf_dir)
    hits = execute_search(
        pts,
        {
            "query": {"geo_bounding_box": {"location": {
                "top_left": {"lat": 60.0, "lon": -120.0},
                "bottom_right": {"lat": 10.0, "lon": -60.0},
            }}},
            "sort": [
                {"_geo_distance": {
                    "location": {"lat": 40.7128, "lon": -74.006},
                    "order": "asc",
                }},
                {"c_custkey": "asc"},
            ],
            "size": 15,
        },
    )["hits"]
    return hits.select(
        "c_custkey",
        F.col("location.lat").alias("lat"),
        F.col("location.lon").alias("lon"),
    )


@register(
    "nested_query_search",
    oracle="""
    WITH t AS (
      SELECT c_custkey,
             [struct_pack(qty := c_custkey % 5,
                          price := (c_custkey % 7) * 10),
              struct_pack(qty := (c_custkey * 3) % 5,
                          price := ((c_custkey * 3) % 7) * 10)] AS items
      FROM customer)
    SELECT c_custkey FROM t
    WHERE len(list_filter(items,
              e -> e.qty >= 3 AND e.price <= 30)) > 0
    """,
    doc="nested DSL query (operators/search.py::_compile_nested_pred): "
    "documents whose array<struct> column contains an element satisfying "
    "a bool of range clauses — per-ELEMENT conjunction, the semantics a "
    "flattened evaluation gets wrong (qty and price must hold on the "
    "same item). Compiled to F.exists with a per-element predicate: the "
    "array is never exploded, the clause is one codegen expression. "
    "Items synthesized closed-form from c_custkey so the oracle mirrors "
    "with a DuckDB list_filter.",
    tags=("dsl", "nested"),
)
def nested_query_search(spark, sf_dir):
    from ..operators.search import execute_search

    c = _t(spark, sf_dir, "customer")["customer"]
    ck = F.col("c_custkey")
    item = lambda k: F.struct(
        ((ck * k) % 5).alias("qty"), (((ck * k) % 7) * 10).alias("price")
    )
    docs = c.select("c_custkey", F.array(item(1), item(3)).alias("items"))
    hits = execute_search(
        docs,
        {"query": {"nested": {
            "path": "items",
            "query": {"bool": {"must": [
                {"range": {"items.qty": {"gte": 3}}},
                {"range": {"items.price": {"lte": 30}}},
            ]}},
        }}},
    )["hits"]
    return hits.select("c_custkey")


@register(
    "geo_distance_rings_agg",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey, {_GEO_LAT} AS lat, {_GEO_LON} AS lon FROM customer),
    d AS (SELECT c_custkey, {_GEO_DIST_SQL} AS km FROM pts)
    SELECT CASE WHEN km < 2000.0 THEN 'near'
                WHEN km < 5000.0 THEN 'mid'
                ELSE 'far' END AS key,
           COUNT(*) AS doc_count,
           ROUND(MIN(km), 6) AS min_km,
           ROUND(MAX(km), 6) AS max_km
    FROM d GROUP BY 1
    """,
    doc="DSL `geo_distance` aggregation (distance rings around an "
    "origin): doc counts per ring in ONE pass — the interpreter branch "
    "(operators/search.py geo_distance agg) folds every ring into one "
    "conditional-agg row; this catalog twin expresses the same rings "
    "as a derived-label groupBy. Haversine computed once per row in "
    "the projection; min/max are order-independent so the only "
    "transcendental outputs are per-row (rounded 6).",
    tags=("agg", "dsl", "geo"),
)
def geo_distance_rings_agg(spark, sf_dir):
    from ..functions.geo import haversine_km

    pts = _geo_points(spark, sf_dir)
    km = haversine_km(
        F.col("location.lat"), F.col("location.lon"),
        F.lit(40.7128), F.lit(-74.006),
    )
    label = (
        F.when(km < 2000.0, "near").when(km < 5000.0, "mid").otherwise("far")
    )
    return (
        pts.select(label.alias("key"), km.alias("km"))
        .groupBy("key")
        .agg(
            F.count("*").alias("doc_count"),
            F.round(F.min("km"), 6).alias("min_km"),
            F.round(F.max("km"), 6).alias("max_km"),
        )
    )


@register(
    "geotile_grid_agg",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey, {_GEO_LAT} AS lat, {_GEO_LON} AS lon FROM customer),
    cl AS (
      SELECT c_custkey, lon,
             LEAST(GREATEST(lat, -85.05112878), 85.05112878) AS lat
      FROM pts),
    t AS (
      SELECT c_custkey,
             LEAST(GREATEST(FLOOR((lon + 180.0) / 360.0 * 128.0), 0), 127)
               AS x,
             LEAST(GREATEST(FLOOR((1.0 - LN(TAN(RADIANS(lat))
                                           + 1.0 / COS(RADIANS(lat))) / PI())
                                  / 2.0 * 128.0), 0), 127) AS y
      FROM cl)
    SELECT '7/' || CAST(CAST(x AS BIGINT) AS VARCHAR) || '/'
               || CAST(CAST(y AS BIGINT) AS VARCHAR) AS key,
           COUNT(*) AS doc_count
    FROM t GROUP BY 1
    ORDER BY doc_count DESC, key ASC LIMIT 20
    """,
    doc="DSL `geotile_grid` aggregation at precision 7: Web-Mercator "
    "z/x/y tile keys as pure column arithmetic (ln/tan per row, "
    "out-of-mercator latitudes clamped to edge tiles), one groupBy on "
    "the computed key + TakeOrdered top-20 — grid faceting with no geo "
    "index (operators/search.py geotile_grid branch).",
    tags=("agg", "dsl", "geo"),
)
def geotile_grid_agg(spark, sf_dir):
    import math

    pts = _geo_points(spark, sf_dir)
    z, n = 7, 128
    lon = F.col("location.lon")
    lat = F.least(
        F.greatest(F.col("location.lat"), F.lit(-85.05112878)),
        F.lit(85.05112878),
    )
    x = F.least(
        F.greatest(F.floor((lon + 180.0) / 360.0 * F.lit(float(n))), F.lit(0)),
        F.lit(n - 1),
    )
    phi = F.radians(lat)
    yf = (
        (F.lit(1.0) - F.log(F.tan(phi) + F.lit(1.0) / F.cos(phi)) / F.lit(math.pi))
        / 2.0
        * F.lit(float(n))
    )
    y = F.least(F.greatest(F.floor(yf), F.lit(0)), F.lit(n - 1))
    key = F.concat_ws("/", F.lit(str(z)), x, y)
    return (
        pts.groupBy(key.alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("key").asc())
        .limit(20)
    )


def _geohash_key_sql(p: int, lat_expr: str, lon_expr: str) -> str:
    """The DuckDB twin of operators/search.py::geohash_cell — the SAME
    floor-divide/mod bit extraction, rendered as SQL text, so the two
    engines agree character-for-character (floor and integer %2 are
    exact in doubles at these magnitudes)."""
    total = 5 * p
    lonb, latb = (total + 1) // 2, total // 2
    ix = (f"LEAST(FLOOR(({lon_expr} + 180.0) / 360.0 "
          f"* {float(1 << lonb)}), {(1 << lonb) - 1})")
    iy = (f"LEAST(FLOOR(({lat_expr} + 90.0) / 180.0 "
          f"* {float(1 << latb)}), {(1 << latb) - 1})")
    chars = []
    for j in range(p):
        terms = []
        for i in range(5):
            g = 5 * j + i
            src, m = (ix, lonb - 1 - g // 2) if g % 2 == 0 \
                else (iy, latb - 1 - g // 2)
            terms.append(
                f"(CAST(FLOOR({src} / {float(1 << m)}) AS BIGINT) % 2)"
                f" * {1 << (4 - i)}"
            )
        val = " + ".join(terms)
        chars.append(
            "SUBSTRING('0123456789bcdefghjkmnpqrstuvwxyz', "
            f"CAST({val} AS INTEGER) + 1, 1)"
        )
    return " || ".join(chars)


@register(
    "geohash_grid_agg",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey, {_GEO_LAT} AS lat, {_GEO_LON} AS lon FROM customer)
    SELECT {_geohash_key_sql(4, 'lat', 'lon')} AS key,
           COUNT(*) AS doc_count
    FROM pts GROUP BY 1
    ORDER BY doc_count DESC, key ASC LIMIT 20
    """,
    doc="DSL `geohash_grid` aggregation at precision 4: base-32 cell "
    "keys as pure column arithmetic (interleaved lon/lat bit encoding "
    "via floor-divide/mod, one codegen projection — operators/"
    "search.py::geohash_cell, canonical-vector verified), one groupBy "
    "+ TakeOrdered top-20 — grid faceting with no geo index, the "
    "geohash sibling of geotile_grid_agg.",
    tags=("agg", "dsl", "geo"),
)
def geohash_grid_agg(spark, sf_dir):
    from ..operators.search import geohash_cell

    pts = _geo_points(spark, sf_dir)
    return (
        pts.groupBy(geohash_cell("location", 4).alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("key").asc())
        .limit(20)
    )


_IP_EXPR_SQL = (
    "'10.' || CAST((c_custkey // 65536) % 256 AS VARCHAR) || '.' "
    "|| CAST((c_custkey // 256) % 256 AS VARCHAR) || '.' "
    "|| CAST(c_custkey % 256 AS VARCHAR)"
)


@register(
    "ip_range_agg",
    oracle=f"""
    WITH nums AS (
      SELECT CAST(SPLIT_PART(ip, '.', 1) AS BIGINT) * 16777216
             + CAST(SPLIT_PART(ip, '.', 2) AS BIGINT) * 65536
             + CAST(SPLIT_PART(ip, '.', 3) AS BIGINT) * 256
             + CAST(SPLIT_PART(ip, '.', 4) AS BIGINT) AS n,
             bal
      FROM (SELECT {_IP_EXPR_SQL} AS ip,
                   CAST(c_acctbal AS DECIMAL(28,6)) AS bal
            FROM customer))
    SELECT '*-10.0.4.0' AS key,
           COUNT(*) FILTER (WHERE n < 167773184) AS doc_count,
           CAST(SUM(bal) FILTER (WHERE n < 167773184) AS DOUBLE)
             AS bal_sum
    FROM nums
    UNION ALL
    SELECT '10.0.4.0-*',
           COUNT(*) FILTER (WHERE n >= 167773184),
           CAST(SUM(bal) FILTER (WHERE n >= 167773184) AS DOUBLE)
    FROM nums
    UNION ALL
    SELECT 'lownet',
           COUNT(*) FILTER (WHERE n >= 167772160 AND n < 167774208),
           CAST(SUM(bal) FILTER (WHERE n >= 167772160 AND n < 167774208)
                AS DOUBLE)
    FROM nums
    """,
    doc="DSL `ip_range` aggregation (operators/search.py ip_range "
    "branch): IPv4 strings map to one long (split + base-256 "
    "arithmetic, codegen), bounds and the CIDR mask (10.0.0.0/21) "
    "resolve driver-side via the stdlib, and ALL buckets + their sum "
    "sub-aggs evaluate in ONE conditional-agg pass — the single-scan "
    "shape of the numeric range agg. The ip column is synthesized "
    "from c_custkey with identical arithmetic in both engines.",
    tags=("agg", "dsl"),
)
def ip_range_agg(spark, sf_dir):
    from ..operators.search import execute_search

    c = _t(spark, sf_dir, "customer")["customer"]
    k = F.col("c_custkey")
    ips = c.select(
        F.concat_ws(
            ".", F.lit("10"),
            (F.floor(k / 65536) % 256).cast("long"),
            (F.floor(k / 256) % 256).cast("long"),
            (k % 256).cast("long"),
        ).alias("ip"),
        F.col("c_acctbal"),
    )
    res = execute_search(ips, {"size": 0, "aggs": {"r": {
        "ip_range": {"field": "ip", "ranges": [
            {"to": "10.0.4.0"},
            {"from": "10.0.4.0"},
            {"mask": "10.0.0.0/21", "key": "lownet"},
        ]},
        "aggs": {"bal_sum": {"sum": {"field": "c_acctbal"}}},
    }}})
    return spark.createDataFrame(
        [(b["key"], b["doc_count"], b["bal_sum"]["value"])
         for b in res["aggregations"]["r"]["buckets"]],
        "key string, doc_count long, bal_sum double",
    )


@register(
    "function_score_dsl_search",
    oracle="""
    SELECT o_orderkey,
           ROUND((CASE WHEN o_orderpriority = '1-URGENT'
                       THEN 3.0 ELSE 0.0 END)
                 + LN(1.0 + CAST(o_totalprice AS DOUBLE) * 0.00001)
                 + (10000.0 - LEAST(CAST(o_custkey AS DOUBLE) - 0.0,
                                    10000.0)) / 10000.0,
                 9) AS fscore
    FROM orders
    WHERE o_totalprice >= 250000.0
    """,
    doc="The function_score DSL query end-to-end (operators/search.py::"
    "_execute_function_score): inner range query, a weighted filter "
    "function (+3 for urgent orders), field_value_factor log1p over the "
    "price, and a linear decay over the customer key, combined with "
    "score_mode=sum / boost_mode=replace. Everything folds in ONE "
    "codegen projection (array of (applies, value) structs) — no extra "
    "pass, no shuffle. Scores rounded to 9 decimals on both sides.",
    tags=("dsl", "ranking", "function_score"),
)
def function_score_dsl_search(spark, sf_dir):
    from ..operators.search import execute_search

    o = _t(spark, sf_dir, "orders")["orders"]
    hits = execute_search(
        o,
        {"query": {"function_score": {
            "query": {"range": {"o_totalprice": {"gte": 250000.0}}},
            "functions": [
                {"filter": {"term": {"o_orderpriority": "1-URGENT"}},
                 "weight": 3},
                {"field_value_factor": {"field": "o_totalprice",
                                        "factor": 0.00001,
                                        "modifier": "log1p"}},
                {"linear": {"o_custkey": {"origin": 0, "scale": 5000,
                                          "offset": 0, "decay": 0.5}}},
            ],
            "score_mode": "sum",
            "boost_mode": "replace",
        }}},
    )["hits"]
    return hits.select(
        "o_orderkey", F.round(F.col("_score"), 9).alias("fscore")
    )


_GAUSS_SIGMA2 = -(2000.0**2) / (2.0 * __import__("math").log(0.5))
_EXP_LAMBDA = __import__("math").log(0.5) / 2000.0


@register(
    "function_score_decay_linear",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           (60.0 - GREATEST(CAST(ABS(datediff('day', DATE '1995-06-17',
                                              o_orderdate)) AS DOUBLE) - 7.0,
                            0.0)) / 60.0 AS decay_score
    FROM orders
    WHERE ABS(datediff('day', DATE '1995-06-17', o_orderdate)) <= 60
    """,
    doc="function_score LINEAR date decay (operators/relevance.py::"
    "decay_score): score 1 within offset=7 days of the origin, exactly "
    "decay=0.5 at scale=30 days, hitting 0 at scale/(1-decay)=60 — the "
    "public decay contract as pure column arithmetic over a datediff "
    "distance (bit-exact vs the oracle: no transcendental functions in "
    "the linear curve). No extra pass, no shuffle; the date band filter "
    "pushes into the scan.",
    tags=("dsl", "ranking", "function_score"),
)
def function_score_decay_linear(spark, sf_dir):
    from ..operators.relevance import decay_score

    o = _t(spark, sf_dir, "orders")["orders"]
    d = F.datediff(F.col("o_orderdate"), F.lit("1995-06-17").cast("date"))
    return (
        o.filter(F.abs(d) <= 60)
        .select(
            "o_orderkey",
            "o_orderdate",
            decay_score("linear", d, origin=0.0, scale=30.0,
                        offset=7.0, decay=0.5).alias("decay_score"),
        )
    )


@register(
    "function_score_decay_gauss_exp",
    oracle=f"""
    WITH d AS (
      SELECT c_custkey,
             GREATEST(ABS(CAST(c_acctbal AS DOUBLE) - 5000.0) - 100.0, 0.0)
               AS dist
      FROM customer)
    SELECT c_custkey,
           ROUND(EXP(-(dist * dist) / {2.0 * _GAUSS_SIGMA2!r}), 6)
             AS gauss_score,
           ROUND(EXP({_EXP_LAMBDA!r} * dist), 6) AS exp_score
    FROM d
    """,
    doc="function_score GAUSS and EXP numeric decay over customer "
    "account balance (origin 5000, offset 100, scale 2000, decay 0.5): "
    "the public curves — exp(-dist²/2σ²) with σ² = -scale²/(2·ln decay), "
    "and exp(ln(decay)/scale · dist). Scores rounded to 6 decimals on "
    "both sides (transcendental last-ulp differences between libm "
    "implementations are below that). Pure column arithmetic, zero "
    "extra passes.",
    tags=("dsl", "ranking", "function_score"),
)
def function_score_decay_gauss_exp(spark, sf_dir):
    from ..operators.relevance import decay_score

    c = _t(spark, sf_dir, "customer")["customer"]
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.round(
            decay_score("gauss", bal, origin=5000.0, scale=2000.0,
                        offset=100.0, decay=0.5),
            6,
        ).alias("gauss_score"),
        F.round(
            decay_score("exp", bal, origin=5000.0, scale=2000.0,
                        offset=100.0, decay=0.5),
            6,
        ).alias("exp_score"),
    )


# ---------------------------------------------------------------------------
# IVF ANN + salted skew aggregation
# ---------------------------------------------------------------------------

@register(
    "ann_ivf_topk",
    property_test="tests/test_dedup_similarity.py::test_ivf_ann_recall_on_clusters",
    oracle=None,  # approximate by design — recall property-tested
    doc="IVF approximate top-10: deterministic centroid sample, max-cosine "
    "cell assignment (materialize-once narrow column at scale), probe the "
    "4 nearest cells, exact re-rank of candidates only.",
    tags=("similarity", "topk", "ivf"),
)
def ann_ivf_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    qvec = [float(x) for x in
            e.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    return S.ivf_ann_topk(e, qvec, k=10, n_centroids=16, n_probe=4)


@register(
    "salted_skew_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Two-phase salted aggregation on a 3-key (maximally hot) group: "
    "phase 1 fans each hot key over 16 salt partitions, phase 2 combines "
    "16 partials per key — bit-identical to the direct groupBy (decimal "
    "partials), no reducer ever sees a full hot key.",
    tags=("agg", "skew"),
)
def salted_skew_agg(spark, sf_dir):
    from ..operators.skew import salted_sum_count

    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return salted_sum_count(
        li, ["l_returnflag"], "l_quantity", "l_orderkey",
        n_salt=16, sum_alias="sum_qty", count_alias="n",
    )


# ---------------------------------------------------------------------------
# Training-data pipeline: deterministic sampling, splits, curation
# ---------------------------------------------------------------------------

_BUCKET_SQL = (
    "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
)


@register(
    "weighted_sample_topk",
    oracle="""
    WITH u AS (
      SELECT doc_id, lang, n_chars,
             (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                   AS BIGINT) + 1) / 4503599627370496.0 AS u
      FROM documents WHERE n_chars > 0)
    SELECT doc_id, lang,
           ROUND(POWER(u, 1.0 / CAST(n_chars AS DOUBLE)), 12) AS sample_key
    FROM u
    ORDER BY POWER(u, 1.0 / CAST(n_chars AS DOUBLE)) DESC, doc_id ASC
    LIMIT 50
    """,
    doc="Seeded weighted sampling WITHOUT replacement (Efraimidis–"
    "Spirakis A-ES; operators/sampling.py::weighted_sample): rank every "
    "row by u^(1/weight) with u a deterministic md5 uniform (13 hex "
    "chars = 52 mantissa bits, exact in a double on both engines), keep "
    "the top-k — inclusion probability ∝ weight, identical sample on "
    "any partitioning/engine. Per-row expression + TakeOrdered: no "
    "corpus shuffle, no state. Keys rounded to 12 decimals for the "
    "cross-engine compare.",
    tags=("sampling", "pipeline"),
)
def weighted_sample_topk(spark, sf_dir):
    from ..operators.sampling import weighted_sample

    d = _t(spark, sf_dir, "documents")["documents"]
    s = weighted_sample(d, k=50, weight_col="n_chars")
    return s.select(
        "doc_id", "lang", F.round(F.col("_sample_key"), 12).alias("sample_key")
    )


@register(
    "deterministic_sample_stats",
    oracle=f"""
    SELECT lang, COUNT(*) AS n FROM documents
    WHERE {_BUCKET_SQL} < 10 GROUP BY lang
    """,
    doc="Exact repeatable 10% sample by hash bucket of the id — same rows "
    "on any partitioning, cluster, or engine (df.sample() is only "
    "seed-stable for a fixed plan). Membership is a per-row expression: "
    "no shuffle, no state.",
    tags=("sampling",),
)
def deterministic_sample_stats(spark, sf_dir):
    from ..operators.sampling import deterministic_sample

    d = _t(spark, sf_dir, "documents")["documents"]
    return deterministic_sample(d, 10).groupBy("lang").agg(F.count("*").alias("n"))


@register(
    "training_shuffle_order",
    oracle="""
    SELECT doc_id, md5('epoch1:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
    FROM documents
    ORDER BY shuffle_key, doc_id LIMIT 25
    """,
    doc="Seeded deterministic global shuffle for training order "
    "(operators/sampling.py::shuffle_for_training, md5 portable mode): "
    "one range-partitioned sort by hash(seed, id) — stable across runs "
    "and plans, re-seedable per epoch; first 25 rows shown.",
    tags=("sampling", "training"),
)
def training_shuffle_order(spark, sf_dir):
    from ..operators.sampling import shuffle_for_training

    d = _t(spark, sf_dir, "documents")["documents"]
    out = shuffle_for_training(d, seed="epoch1", key="md5")
    return out.select(
        "doc_id",
        F.md5(F.concat(F.lit("epoch1:"), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
    ).limit(25)


@register(
    "token_budget_selection",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, n_chars, len({TOK}) AS n_tokens
               FROM documents),
    c AS (SELECT *, SUM(n_tokens) OVER (
            ORDER BY n_chars DESC, doc_id ASC
            ROWS UNBOUNDED PRECEDING) AS cum FROM t)
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM c WHERE cum <= 20000 GROUP BY lang
    """,
    doc="Budget-bounded corpus selection (best docs until 20k tokens, "
    "longest-first order): global cumulative sum via the two-phase "
    "range-partition + driver-prefix-offset shape — never a single-task "
    "global window (operators/sampling.py::select_until_token_budget).",
    tags=("sampling", "training"),
)
def token_budget_selection(spark, sf_dir):
    from ..functions.text import tokens
    from ..operators.sampling import select_until_token_budget

    d = _t(spark, sf_dir, "documents")["documents"]
    d = d.withColumn("n_tokens", F.size(tokens(F.col("text"))))
    kept = select_until_token_budget(
        d, budget=20_000, token_col="n_tokens",
        order_by=[F.col("n_chars").desc(), F.col("doc_id").asc()],
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


@register(
    "mixture_upsample_counts",
    oracle=f"""
    SELECT lang, COUNT(*) AS n FROM (
      SELECT lang, unnest(generate_series(1,
        CASE lang
          WHEN 'de' THEN 2 + CASE WHEN {_BUCKET_SQL} < 50 THEN 1 ELSE 0 END
          WHEN 'fr' THEN 2
          WHEN 'zh' THEN CASE WHEN {_BUCKET_SQL} < 50 THEN 1 ELSE 0 END
          ELSE 1 END)) AS _epoch
      FROM documents)
    GROUP BY lang
    """,
    doc="Repeat-factor data mixing (epochs per source): de x2.5, fr x2, "
    "zh x0.5 via deterministic floor/ceil hash-bucket repeats — copies "
    "is a per-row expression + one explode, no shuffle, no join "
    "(operators/sampling.py::mixture_upsample).",
    tags=("sampling", "training"),
)
def mixture_upsample_counts(spark, sf_dir):
    from ..operators.sampling import mixture_upsample

    d = _t(spark, sf_dir, "documents")["documents"]
    up = mixture_upsample(d, {"de": 2.5, "fr": 2.0, "zh": 0.5})
    return up.groupBy("lang").agg(F.count("*").alias("n"))


@register(
    "train_test_split_counts",
    oracle=f"""
    SELECT CASE WHEN {_BUCKET_SQL} < 10 THEN 'test' ELSE 'train' END AS split,
           COUNT(*) AS n_docs
    FROM documents GROUP BY 1
    """,
    doc="Deterministic disjoint-exhaustive train/test split (hash-bucket "
    "membership; a document never migrates between splits as the corpus "
    "grows).",
    tags=("sampling",),
)
def train_test_split_counts(spark, sf_dir):
    from ..operators.sampling import train_test_split

    d = _t(spark, sf_dir, "documents")["documents"]
    train, test = train_test_split(d, test_pct=10)
    return train.select(F.lit("train").alias("split")).union(
        test.select(F.lit("test").alias("split"))
    ).groupBy("split").agg(F.count("*").alias("n_docs"))


@register(
    "curated_corpus_report",
    oracle=f"""
    WITH tk AS (SELECT doc_id, text, lang, {TOK} AS toks FROM documents),
    m AS (
      SELECT doc_id, lang,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        (least(CAST(len(toks) AS DOUBLE) / 20.0, 1.0)
         + (1.0 - least((CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
                         / CAST(length(text) AS DOUBLE)) * 5.0, 1.0))
         + (1.0 - abs(CAST(len(list_filter(toks, t -> list_contains(
               ['the','and','of','to','in','is','a','that','it','for'], t))) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE) - 0.4))) / 3.0 AS quality,
        md5(array_to_string(toks, ' ')) AS nh
      FROM tk),
    gated AS (
      SELECT * FROM m
      WHERE lang IN ('en','es','de','fr','zh')
        AND quality >= 0.5 AND n_tokens BETWEEN 10 AND 100000),
    dedup AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY nh ORDER BY doc_id) AS rn
      FROM gated)
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           MIN(quality) AS min_quality
    FROM dedup WHERE rn = 1 GROUP BY lang
    """,
    doc="The composed curation pipeline (operators/curate.py): language "
    "gate, quality gate, token-length gate, exact dedup on normalized "
    "text — one Catalyst plan whose only shuffle is the dedup window on "
    "16-byte hashes, reported per language.",
    tags=("text", "dedup", "pipeline"),
)
def curated_corpus_report(spark, sf_dir):
    from ..operators.curate import CurationConfig, curate, curation_report

    d = _t(spark, sf_dir, "documents")["documents"]
    return curation_report(curate(d, CurationConfig()))


@register(
    "decontamination_report",
    oracle=f"""
    WITH {SHINGLE_CTE},
    bench AS (
      SELECT DISTINCT gram FROM (
        SELECT unnest(s) AS gram FROM sh WHERE doc_id % 50 = 0)),
    corpus AS (
      SELECT doc_id, unnest(s) AS gram FROM sh WHERE doc_id % 50 <> 0),
    tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY doc_id),
    hit AS (
      SELECT c.doc_id, COUNT(*) AS n_hits
      FROM corpus c JOIN bench b USING (gram) GROUP BY c.doc_id)
    SELECT t.doc_id, t.n_grams, h.n_hits,
           CAST(h.n_hits AS DOUBLE) / t.n_grams AS contamination_ratio
    FROM tot t JOIN hit h USING (doc_id)
    """,
    doc="Benchmark decontamination (operators/curate.py::decontaminate): "
    "corpus documents sharing word 3-grams with a held-out eval set "
    "(doc_id % 50 == 0 plays the benchmark) — the pre-training hygiene "
    "step that keeps eval answers out of training data. The benchmark "
    "gram set reduces to DISTINCT grams and broadcasts; the corpus side "
    "never shuffles for the membership probe, only for the per-doc "
    "count groupBy.",
    tags=("text", "curation", "pipeline"),
)
def decontamination_report(spark, sf_dir):
    from ..operators.curate import decontaminate

    d = _t(spark, sf_dir, "documents")["documents"]
    bench = d.filter(F.col("doc_id") % 50 == 0)
    corpus = d.filter(F.col("doc_id") % 50 != 0)
    return decontaminate(corpus, bench, k=3)


# ---------------------------------------------------------------------------
# Multimodal family (E5)
# ---------------------------------------------------------------------------

@register(
    "multimodal_feature_stats",
    oracle="""
    SELECT source, COUNT(*) AS n_items,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS sum_bytes
    FROM documents GROUP BY source
    """,
    doc="Multimodal plumbing: binary payload column + metadata struct, "
    "Arrow-batched mapInPandas feature extraction (cheap checksum "
    "decoder; real BMP/WAV decode is exercised end-to-end by "
    "multimodal_bmp_decode_stats / multimodal_wav_decode_stats), "
    "aggregated per source.",
    tags=("multimodal",),
)
def multimodal_feature_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    feats = M.extract_features(M.attach_payload(d))
    return feats.groupBy("source").agg(
        F.count("*").alias("n_items"), F.sum("n_bytes").alias("sum_bytes")
    )


@register(
    "multimodal_frame_counts",
    oracle="""
    SELECT source,
           CAST(SUM((octet_length(encode(text)) + 255) // 256) AS BIGINT) AS n_frames,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS sum_frame_bytes
    FROM documents GROUP BY source
    """,
    doc="Frame-sampling fan-out (1 payload → N fixed-size frames inside the "
    "UDF, video frame-extraction shape) aggregated per source.",
    tags=("multimodal",),
)
def multimodal_frame_counts(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    frames = M.sample_frames(M.attach_payload(d), frame_size=256)
    return frames.groupBy("source").agg(
        F.count("*").alias("n_frames"),
        F.sum("frame_bytes").alias("sum_frame_bytes"),
    )


@register(
    "multimodal_bmp_decode_stats",
    oracle="""
    SELECT lang, COUNT(*) AS n_items,
           CAST(SUM((1 + doc_id % 13) * (1 + doc_id % 7)) AS BIGINT) AS sum_pixels,
           CAST(SUM(CAST(1 + doc_id % 13 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_width,
           CAST(SUM(CAST(1 + doc_id % 7 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_height,
           CAST(SUM(CAST(doc_id % 251 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_pixel,
           CAST(SUM(54 + (3 * (1 + doc_id % 13)
                          + (4 - (3 * (1 + doc_id % 13)) % 4) % 4)
                         * (1 + doc_id % 7)) AS BIGINT) AS sum_payload_bytes
    FROM documents GROUP BY lang
    """,
    doc="REAL image decode end-to-end: synthesize genuine uncompressed "
    "24-bit BMP bytes per document (operators/multimodal.py::encode_bmp, "
    "geometry and pixel value closed-form in doc_id), parse them back "
    "with the dependency-free BMP decoder (::decode_bmp — header, "
    "orientation, 4-byte row padding), aggregate per lang. The oracle "
    "recomputes width/height/pixel stats AND the padded file size from "
    "the doc_id formulas, so any header- or padding-level decode bug "
    "breaks the hash. Payload bytes never leave the executors.",
    tags=("multimodal",),
)
def multimodal_bmp_decode_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    media = M.synthesize_media(d, "image", keep=("lang",))
    feats = M.extract_media_features(media, keep=("lang",))
    exact = lambda c: F.sum(F.col(c).cast("decimal(28,6)")).cast("double") / F.count(
        F.lit(1)
    )
    return feats.groupBy("lang").agg(
        F.count("*").alias("n_items"),
        F.sum("n_units").alias("sum_pixels"),
        exact("width").alias("avg_width"),
        exact("height").alias("avg_height"),
        exact("mean_value").alias("avg_pixel"),
        F.sum("n_bytes").alias("sum_payload_bytes"),
    )


def _media_decode_stats(spark, sf_dir, kind):
    """Shared body of the synthesized-decode catalog rows (png/gif/
    jpeg): synthesize → registry decode → per-lang geometry/mean
    aggregate with the exact-decimal mean discipline."""
    d = _t(spark, sf_dir, "documents")["documents"]
    feats = M.extract_media_features(
        M.synthesize_media(d, kind, keep=("lang",)), keep=("lang",)
    )
    exact = lambda c: F.sum(F.col(c).cast("decimal(28,6)")).cast("double") / F.count(
        F.lit(1)
    )
    return feats.groupBy("lang").agg(
        F.count("*").alias("n_items"),
        F.sum("n_units").alias("sum_pixels"),
        exact("width").alias("avg_width"),
        exact("height").alias("avg_height"),
        exact("mean_value").alias("avg_pixel"),
    )


@register(
    "multimodal_rle_bmp_decode_stats",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             3 + doc_id % 13 AS w,
             1 + doc_id % 7 AS h,
             doc_id % 200 AS base
      FROM documents WHERE doc_id < 300),
    s AS (
      SELECT doc_id, w, h,
             ((h + 1) // 2) * w * base
             + (h // 2) * (w * base + (w - 1) * w // 2) AS total
      FROM p)
    SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(3 * total AS DOUBLE) / CAST(3 * w * h AS DOUBLE) AS mean_value
    FROM s
    """,
    doc="COMPRESSED BMP decoded for real (BI_RLE8, the public "
    "BITMAPINFOHEADER run-length spec): per document an 8-bit palette "
    "BMP whose even rows are encoded runs and odd rows absolute-mode "
    "gradient literals (plus the EOL/EOD escapes in every file, delta "
    "escapes pinned in tests), decoded through the shared pixel path "
    "(operators/multimodal.py::_bmp_rle8_pixels — so pixel access and "
    "resize work too), one row per doc with the palette-mapped mean "
    "replicated division-for-division. Any run/absolute/padding/"
    "bottom-up-order bug breaks the hash.",
    tags=("multimodal",),
)
def multimodal_rle_bmp_decode_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 300)
    feats = M.extract_media_features(M.synthesize_media(d, "rle-bmp"))
    return feats.select("doc_id", "width", "height", "mean_value")


@register(
    "multimodal_paletted_bmp_decode_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, doc_id % 3 AS k,
             CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 4 ELSE 1 END AS bpp,
             CASE doc_id % 3 WHEN 1 THEN 1 + doc_id % 6
                  ELSE 3 + doc_id % 13 END AS w,
             CASE doc_id % 3 WHEN 1 THEN 1 + doc_id % 5
                  ELSE 1 + doc_id % 7 END AS h,
             CASE doc_id % 3 WHEN 0 THEN doc_id % 32
                  WHEN 1 THEN doc_id % 6 ELSE doc_id % 2 END AS base
      FROM documents WHERE doc_id < 300)
    SELECT doc_id, CAST(bpp AS BIGINT) AS bit_depth,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CASE k
             WHEN 0 THEN base + 7.0 * (h - 1) / 2 + 13.0 * (w - 1) / 2
             WHEN 1 THEN 17.0 * (base + (w - 1) / 2.0 + (h - 1) / 2.0)
             ELSE 255.0 * (CASE WHEN base % 2 = 0
                  THEN w * h - (((w + 1) // 2) * ((h + 1) // 2)
                                + (w // 2) * (h // 2))
                  ELSE ((w + 1) // 2) * ((h + 1) // 2)
                       + (w // 2) * (h // 2) END) / (w * h)
           END AS mean_value
    FROM g
    """,
    doc="UNCOMPRESSED PALETTED BMP decoded for real — the most common "
    "BMP variants in the wild: depth cycles 8/4/1-bit by doc_id with "
    "both orientations (top-down odd ids), MSB-first sub-byte packing, "
    "grayscale palettes scaled 1/17/255, decoded through the shared "
    "pixel path (operators/multimodal.py::_bmp_paletted_pixels — so "
    "pixel access and resize work too). Per-depth index patterns keep "
    "the mean closed-form (8-bit GIF gradient, 4-bit x+y ramp, 1-bit "
    "checkerboard) so the oracle replicates palette mapping, packing, "
    "stride, and orientation arithmetic exactly.",
    tags=("multimodal",),
)
def multimodal_paletted_bmp_decode_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 300)
    feats = M.extract_media_features(M.synthesize_media(d, "pal-bmp"))
    return feats.select("doc_id", "bit_depth", "width", "height",
                        "mean_value")


@register(
    "multimodal_rle4_bmp_decode_stats",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             2 + doc_id % 10 AS w,
             1 + doc_id % 5 AS h,
             doc_id % 8 AS a,
             (doc_id + 3) % 8 AS b,
             doc_id % 5 AS base
      FROM documents WHERE doc_id < 300),
    s AS (
      SELECT doc_id, w, h,
             ((h + 1) // 2) * (((w + 1) // 2) * a + (w // 2) * b)
             + (h // 2) * (w * base + w * (w - 1) // 2) AS total
      FROM p)
    SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(17 * total AS DOUBLE) / CAST(w * h AS DOUBLE) AS mean_value
    FROM s
    """,
    doc="BI_RLE4 BMP decoded for real (the 16-color run-length "
    "layout, completing the BMP compression family): encoded packets "
    "paint pixels ALTERNATING the value byte's nibbles, absolute "
    "packets carry word-aligned literal nibbles, EOL/EOD escapes in "
    "every file (operators/multimodal.py::_bmp_rle4_pixels, shared "
    "pixel/resize path). Even rows are one alternating (a,b) run, odd "
    "rows the nibble gradient base+x — the oracle replicates the "
    "alternation parity, nibble packing, and palette scaling "
    "division-for-division.",
    tags=("multimodal",),
)
def multimodal_rle4_bmp_decode_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 300)
    feats = M.extract_media_features(M.synthesize_media(d, "rle4-bmp"))
    return feats.select("doc_id", "width", "height", "mean_value")


@register(
    "multimodal_bmp32_decode_stats",
    oracle="""
    SELECT doc_id,
           CAST(2 + doc_id % 9 AS BIGINT) AS width,
           CAST(1 + doc_id % 6 AS BIGINT) AS height,
           CAST(doc_id % 251 AS DOUBLE) AS mean_value,
           CAST(54 + (CASE WHEN doc_id % 2 = 1 THEN 12 ELSE 0 END)
                + (2 + doc_id % 9) * (1 + doc_id % 6) * 4
                AS BIGINT) AS n_bytes
    FROM documents WHERE doc_id < 300
    """,
    doc="32-BIT BMP decoded for real (BGRX — the screenshot/"
    "compositor layout): BI_RGB for even ids, BI_BITFIELDS with the "
    "canonical 8-8-8 masks for odd, top-down orientation every third "
    "id, and the unused X byte POISONED to 0xAA so a decoder that "
    "averaged all four channels (or mis-split BGRX) breaks the hash "
    "(operators/multimodal.py::_bmp32_pixels). The oracle replicates "
    "geometry, mean, and the exact file size incl. the appended mask "
    "block.",
    tags=("multimodal",),
)
def multimodal_bmp32_decode_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 300)
    feats = M.extract_media_features(M.synthesize_media(d, "bmp-32"))
    return feats.select("doc_id", "width", "height", "mean_value",
                        "n_bytes")


@register(
    "multimodal_mp3_stream_info",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             'doc ' || doc_id AS title,
             CAST(20 + doc_id % 30 AS BIGINT) AS n_frames,
             CAST(CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                  ELSE 32000 END AS BIGINT) AS sample_rate,
             CAST(CASE doc_id % 14
                  WHEN 0 THEN 32 WHEN 1 THEN 40 WHEN 2 THEN 48
                  WHEN 3 THEN 56 WHEN 4 THEN 64 WHEN 5 THEN 80
                  WHEN 6 THEN 96 WHEN 7 THEN 112 WHEN 8 THEN 128
                  WHEN 9 THEN 160 WHEN 10 THEN 192 WHEN 11 THEN 224
                  WHEN 12 THEN 256 ELSE 320 END AS DOUBLE) AS bitrate_kbps
      FROM documents WHERE doc_id < 300)
    SELECT doc_id, title, n_frames, sample_rate, bitrate_kbps,
           n_frames * 1152 * 1000.0 / sample_rate AS duration_ms
    FROM p
    """,
    doc="MP3 stream METADATA without decoding (the audio-inventory "
    "pass real corpus pipelines run): per document an MPEG-1 Layer "
    "III stream with a real ID3v2 tag (v2.3 even ids / v2.4 odd, "
    "text encodings cycling per version), CBR frame headers with "
    "cycling padding bits, and an ID3v1 trailer; the scanner "
    "(operators/multimodal.py::mp3_stream_info) walks EVERY frame via "
    "the public header layout (sync, version/layer, bitrate and "
    "sample-rate index tables, padding, 1152 samples/frame), skips "
    "both tag envelopes, and extracts the TIT2 title. The oracle "
    "recomputes title/frames/rate/bitrate/duration from the doc_id "
    "formulas (direct equality incl. strings). PCM decode remains the "
    "loud NotImplementedError — the Huffman/filterbank codec is not "
    "shipped, and mp3 payloads through decode_audio still raise.",
    tags=("multimodal",),
)
def multimodal_mp3_stream_info(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 300)
    return M.mp3_info_stats(M.synthesize_media(d, "mp3"))


@register(
    "multimodal_vorbis_stream_info",
    oracle="""
    SELECT doc_id,
           'doc ' || doc_id AS title,
           CAST(1 + doc_id % 2 AS INT) AS channels,
           CAST(CASE doc_id % 4 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                WHEN 2 THEN 32000 ELSE 22050 END AS BIGINT) AS sample_rate,
           CAST(64000 + (doc_id % 8) * 16000 AS BIGINT) AS bitrate_nominal,
           'spark-graft synthesizer' AS vendor
    FROM documents WHERE doc_id < 300
    """,
    doc="Ogg-Vorbis stream METADATA without decoding (the .ogg twin "
    "of the MP3 inventory row): per document a real Ogg transport "
    "stream (RFC 3533 pages, lacing, CRC-32) carrying a spec Vorbis "
    "identification header (version/channels/rate/nominal bitrate, "
    "framing bit) and comment header (length-prefixed vendor + "
    "TITLE/ARTIST user comments incl. non-ASCII UTF-8), scanned by "
    "operators/multimodal.py::vorbis_stream_info through the shared "
    "Ogg packet reassembly. The oracle recomputes title/channels/"
    "rate/bitrate/vendor from the doc_id formulas (direct equality "
    "incl. strings). PCM decode remains the loud NotImplementedError "
    "— the Vorbis codebook/MDCT codec is not shipped.",
    tags=("multimodal",),
)
def multimodal_vorbis_stream_info(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 300)
    return M.vorbis_info_stats(M.synthesize_media(d, "vorbis"))


@register(
    "multimodal_opus_stream_info",
    oracle="""
    SELECT doc_id,
           'doc ' || doc_id AS title,
           CAST(1 + doc_id % 2 AS INT) AS channels,
           CAST(CASE doc_id % 4 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                WHEN 2 THEN 32000 ELSE 22050 END AS BIGINT) AS sample_rate,
           CAST(312 + doc_id % 100 AS INT) AS pre_skip,
           CAST((doc_id % 13 - 6) * 64 AS DOUBLE) / 256.0 AS output_gain_db,
           'spark-graft synthesizer' AS vendor
    FROM documents WHERE doc_id < 300
    """,
    doc="Ogg-Opus stream METADATA without decoding (RFC 7845 — the "
    "third Ogg mapping, completing FLAC/Vorbis/Opus coverage): per "
    "document a real Ogg transport stream carrying OpusHead (version "
    "nibble gate, channels, pre-skip, input rate, Q7.8 output gain, "
    "mapping family 0) and OpusTags (Vorbis-layout vendor + TITLE), "
    "scanned by operators/multimodal.py::opus_stream_info through the "
    "shared packet reassembly. The oracle recomputes every field from "
    "the doc_id formulas (direct equality incl. strings and the "
    "gain_q8/256 double). PCM decode remains the loud "
    "NotImplementedError — the SILK/CELT codec is not shipped.",
    tags=("multimodal",),
)
def multimodal_opus_stream_info(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 300)
    return M.opus_info_stats(M.synthesize_media(d, "opus"))


@register(
    "multimodal_tiff_multipage_stats",
    oracle="""
    SELECT doc_id, CAST(k AS INT) AS page,
           CAST(1 + (doc_id + 31 * k) % 13 AS INT) AS width,
           CAST(1 + (doc_id + 31 * k) % 7 AS INT) AS height,
           (CASE WHEN (doc_id + 31 * k) % 5 = 3 THEN 257 ELSE 1 END)
           * ((doc_id + 31 * k) % 53
             + ((doc_id + 31 * k) % 13) / 2.0
             + (doc_id + 31 * k) % 7
             + (doc_id + 31 * k) % 2) AS mean_value
    FROM (SELECT doc_id, unnest(range(0, 1 + doc_id % 4)) AS k
          FROM documents WHERE doc_id < 300)
    """,
    doc="MULTI-PAGE TIFF fan-out (the fax/scan corpus shape): per "
    "document a real IFD-chained file of 1 + id % 4 pages, page k "
    "taking pseudo-id (id + 31k)'s single-page container variants — "
    "geometry, gray/RGB, none/PackBits/LZW/Deflate, predictor, the "
    "tiled slice, AND a 16-bit-depth slice (pid % 5 == 3 — real scan "
    "corpora mix sample depths within one file; those pages' means "
    "are 257x the 8-bit closed form) all cycle independently per "
    "page — decoded by walking the cycle-guarded next-IFD chain "
    "(operators/multimodal.py::decode_tiff_pages / ::tiff_page_stats, "
    "1 payload row → N page rows inside the Arrow batch). The oracle "
    "recomputes every page's geometry and gradient mean "
    "((base + (w-1)/2 + h-1 + rgb) with w-1 = pid%13 even-odd split "
    "folded into /2.0) from the id formulas — a chain-walk, "
    "relocation, or per-page codec bug breaks the hash.",
    tags=("multimodal",),
)
def multimodal_tiff_multipage_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 300)
    return M.tiff_page_stats(M.synthesize_media(d, "tiff-multipage"))


@register(
    "multimodal_gif_animation_stats",
    oracle="""
    WITH f AS (
      SELECT doc_id, unnest(range(0, 2 + doc_id % 3)) AS j
      FROM documents WHERE doc_id < 300),
    g AS (
      SELECT doc_id, j,
             (6 + 2 * (doc_id % 4)) * (4 + 2 * (doc_id % 3)) AS wh,
             doc_id % 200 AS c0,
             CASE WHEN j = 0 THEN 0
                  ELSE 4 * ((doc_id * 5 + j * 37) % 251) END AS addon
      FROM f),
    m AS (
      SELECT doc_id, j, wh, c0,
             SUM(addon) OVER (PARTITION BY doc_id ORDER BY j) AS cum
      FROM g)
    SELECT doc_id, CAST(j AS BIGINT) AS frame_index,
           CAST(3 + j AS BIGINT) AS delay_cs,
           CAST(3 * (c0 * (wh - 4 * j) + cum) AS DOUBLE)
               / CAST(3 * wh AS DOUBLE) AS frame_mean
    FROM m
    """,
    doc="ANIMATED GIF decoded with real composition: per document a "
    "GIF89a animation (NETSCAPE loop extension, per-frame Graphic "
    "Control Extensions, full-canvas base frame + non-overlapping "
    "2x2 LZW patches at drifting positions), each frame COMPOSED onto "
    "the logical canvas and its palette-mapped mean emitted as one "
    "row (operators/multimodal.py::decode_gif_frames / "
    "::gif_frame_stats). The oracle replicates the composed mean "
    "division-for-division ((3*(c0*(wh-4j) + sum 4*c_k)) / (3*wh), a "
    "cumulative window per doc) — any GCE, patch-placement, LZW, or "
    "composition bug breaks the hash. Disposal modes 2/3 and "
    "transparency are pinned in tests/test_multimodal_codecs.py.",
    tags=("multimodal",),
)
def multimodal_gif_animation_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 300)
    media = M.synthesize_media(d, "gif-anim")
    return M.gif_frame_stats(media)


@register(
    "archive_text_extract",
    oracle="""
    SELECT doc_id, 'manifest.txt' AS member, 'doc=' || doc_id AS text
    FROM documents WHERE doc_id < 300
    UNION ALL
    SELECT doc_id, 'doc_' || doc_id || '.txt' AS member, text
    FROM documents WHERE doc_id < 300
    """,
    doc="Corpus-as-archives ingestion end-to-end: one real archive per "
    "document holding a manifest member and the text member — zip "
    "(central directory, DEFLATE members, per-member CRC-32) for odd "
    "ids, compressed POSIX ustar (checksummed 512-byte headers, "
    "block padding, terminator) for even with the stream compressor "
    "walking gzip/bzip2/xz by id%6 — parsed back by the "
    "dependency-free readers (operators/archive.py, cross-validated "
    "against stdlib tarfile/zipfile both directions in tests) and "
    "fanned out one row per member. The oracle is DIRECT string "
    "equality per (doc, member) — any framing, checksum, deflate, or "
    "member-boundary bug corrupts a row and breaks the hash.",
    tags=("multimodal", "text"),
)
def archive_text_extract(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 300)
    members = ARC.extract_archive_members(
        ARC.synthesize_archives(d), with_bytes=True)
    return members.select(
        "doc_id", "member",
        F.decode(F.col("payload"), "UTF-8").alias("text"),
    )


@register(
    "archived_pdf_corpus_stats",
    oracle="""
    SELECT doc_id,
           CAST(greatest(1, ceil(length(text) / 100.0)) AS BIGINT) AS n_pages,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents WHERE doc_id < 300
    """,
    doc="The full ingestion chain as ONE lazy plan — 'the corpus "
    "arrives as archives of documents': corpus text → real PDFs "
    "(100-char pages, FlateDecode for odd ids) → wrapped into real "
    "archives (zip odd / gzip|bzip2|xz tarballs even) → member fan-out → "
    "PDF page extraction → per-document page/char rollup. Every layer "
    "is the spec parser (zip CRCs, tar checksums, xref-validated PDF "
    "objects, zlib inflate), and the oracle pins the end-to-end "
    "invariant: page count = ceil(len/100) and EXACT total characters "
    "— a byte lost in any layer breaks the hash. Payload bytes never "
    "leave the executors at any stage.",
    tags=("multimodal", "text"),
)
def archived_pdf_corpus_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 300)
    pdfs = PDF.synthesize_pdfs(d)
    archives = ARC.wrap_payloads_in_archives(pdfs, "doc_{id}.pdf")
    members = ARC.extract_archive_members(archives, with_bytes=True)
    pages = PDF.extract_document_text(members.select("doc_id", "payload"))
    return pages.groupBy("doc_id").agg(
        F.count("*").alias("n_pages"),
        F.sum(F.length("text")).alias("n_chars"),
    )


@register(
    "warc_text_extract",
    oracle="""
    SELECT doc_id,
           'http://example.com/doc/' || doc_id AS uri,
           '"' || text || '" & more' AS text
    FROM documents WHERE doc_id < 300
    """,
    doc="REAL web-corpus ingestion end-to-end (the Common Crawl "
    "reading pattern): write a genuine WARC file per document "
    "(operators/warc.py::synthesize_warcs — warcinfo + request + HTTP "
    "response records, spec CRLF framing, per-record gzip members for "
    "odd ids), then parse it back (::parse_warc — Content-Length-"
    "delimited record bodies, NEVER a delimiter scan; ::http_response_"
    "body; ::html_to_text — script/style/comment removal, tag strip, "
    "entity decode, whitespace collapse) and emit one row per response "
    "record. The HTML wraps the corpus text in entity-encoded quotes, "
    "so the oracle is DIRECT string equality on '\"' || text || "
    "'\" & more' — any framing, gzip-member, record-filtering, or "
    "entity bug corrupts the text and breaks the hash.",
    tags=("multimodal", "text"),
)
def warc_text_extract(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 300)
    return WARC.extract_warc_text(WARC.synthesize_warcs(d))


@register(
    "warc_text_extract_dlq",
    oracle="""
    SELECT doc_id,
           'http://example.com/doc/' || doc_id AS uri,
           '"' || text || '" & more' AS text,
           CAST(NULL AS VARCHAR) AS error
    FROM documents WHERE doc_id < 300
    UNION ALL
    SELECT doc_id,
           'http://example.com/doc/' || doc_id || '/br' AS uri,
           CAST(NULL AS VARCHAR) AS text,
           'WARC: content coding b''br'' not supported '
           || '(gzip/x-gzip/identity only)' AS error
    FROM documents WHERE doc_id < 300
    """,
    doc="The DLQ-style per-record side-output a 100 TB Common Crawl "
    "ingest needs: every synthesized WARC carries BOTH a good "
    "response (the full gzip-member/chunked/Content-Encoding cycle of "
    "warc_text_extract) and a brotli-coded response (no stdlib "
    "decoder exists — operators/warc.py::_decode_content_encoding "
    "keeps br a loud boundary). extract_warc_text(on_error='dlq') "
    "extracts the good record EXACTLY (same string-equality oracle) "
    "and routes the br record to an error column with the precise "
    "boundary message instead of failing the file — one brotli "
    "capture must not poison a batch. The oracle pins both row "
    "shapes, including the error text.",
    tags=("multimodal", "text"),
)
def warc_text_extract_dlq(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 300)
    return WARC.extract_warc_text(
        WARC.synthesize_warcs(d, with_br=True), on_error="dlq")


@register(
    "pdf_text_extract_dlq",
    oracle="""
    SELECT doc_id, CAST(i AS INT) AS page,
           substr(text, CAST(i * 100 + 1 AS BIGINT), 100) AS text,
           CAST(NULL AS VARCHAR) AS error
    FROM (SELECT doc_id, text,
                 unnest(range(0, CAST(greatest(1, ceil(length(text) / 100.0)) AS BIGINT))) AS i
          FROM documents WHERE doc_id < 300 AND doc_id % 31 <> 7)
    UNION ALL
    SELECT doc_id, -1 AS page, CAST(NULL AS VARCHAR) AS text,
           'not a PDF payload' AS error
    FROM documents WHERE doc_id < 300 AND doc_id % 31 = 7
    """,
    doc="PDF extraction with the DLQ side-output: the corpus PDFs of "
    "multimodal_pdf_text_extract, but ids %31==7 have their magic "
    "bytes stomped (a codegen binary splice — F.concat over "
    "substring(payload), no UDF) before extraction runs with "
    "on_error='dlq'. Damaged documents surface as ONE page=-1 row "
    "carrying the precise reader error instead of poisoning the Arrow "
    "batch — a 100 TB archive crawl always contains broken PDFs. The "
    "oracle pins BOTH row shapes, including the error text, so "
    "swallowed errors or dropped good pages both break the hash.",
    tags=("multimodal", "text"),
)
def pdf_text_extract_dlq(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 300)
    pdfs = PDF.synthesize_pdfs(d)
    corrupted = pdfs.withColumn(
        "payload",
        F.when(F.col("doc_id") % 31 == 7,
               F.concat(F.lit(b"XXXX"),
                        F.expr("substring(payload, 5, 2147483647)")))
        .otherwise(F.col("payload")))
    return PDF.extract_document_text(corrupted, on_error="dlq")


@register(
    "archive_extract_dlq",
    oracle="""
    SELECT doc_id, member, CAST(n_bytes AS BIGINT) AS n_bytes, error
    FROM (
      SELECT doc_id, 'manifest.txt' AS member,
             length('doc=' || doc_id) AS n_bytes,
             CAST(NULL AS VARCHAR) AS error
      FROM documents WHERE doc_id < 300 AND doc_id % 29 <> 3
      UNION ALL
      SELECT doc_id, 'doc_' || doc_id || '.txt' AS member,
             octet_length(CAST(text AS BLOB)) AS n_bytes,
             CAST(NULL AS VARCHAR) AS error
      FROM documents WHERE doc_id < 300 AND doc_id % 29 <> 3
      UNION ALL
      SELECT doc_id, CAST(NULL AS VARCHAR) AS member, 0 AS n_bytes,
             'unrecognized archive payload (zip/tar/tar.{gz,bz2,xz})'
                 AS error
      FROM documents WHERE doc_id < 300 AND doc_id % 29 = 3
    )
    """,
    doc="Archive member fan-out with the DLQ side-output: the "
    "archive_text_extract fixture, but ids %29==3 carry junk bytes "
    "instead of a container. With on_error='dlq' the damaged archives "
    "surface as ONE member=NULL row with the precise reader error; "
    "good archives keep their full member rows (n_bytes counts UTF-8 "
    "bytes, so the oracle measures the decoded member payloads too).",
    tags=("multimodal", "text"),
)
def archive_extract_dlq(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 300)
    archives = ARC.synthesize_archives(d).withColumn(
        "payload",
        F.when(F.col("doc_id") % 29 == 3,
               F.lit(b"not an archive at all, just junk bytes"))
        .otherwise(F.col("payload")))
    return ARC.extract_archive_members(archives, on_error="dlq")


@register(
    "wet_text_extract",
    oracle="""
    SELECT doc_id,
           'http://example.com/doc/' || doc_id AS uri,
           text
    FROM documents WHERE doc_id < 300
    """,
    doc="Common Crawl WET ingestion: WET files are WARC containers "
    "whose 'conversion' records carry already-extracted plain text — "
    "the *.warc.wet.gz corpus form most text pipelines actually "
    "ingest. One real WET file per document (warcinfo + conversion "
    "records, per-record gzip members for odd ids), read back by the "
    "same Content-Length-authoritative record walk as the WARC row "
    "(operators/warc.py::extract_wet_text) with non-conversion "
    "records skipped. The oracle is DIRECT string equality on the "
    "corpus text — no HTML layer, so any record-framing, gzip-member, "
    "or type-filtering bug corrupts the row.",
    tags=("multimodal", "text"),
)
def wet_text_extract(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 300)
    return WARC.extract_wet_text(WARC.synthesize_wets(d))


@register(
    "multimodal_pdf_text_extract",
    oracle="""
    SELECT doc_id, CAST(i AS INT) AS page,
           substr(text, CAST(i * 100 + 1 AS BIGINT), 100) AS text
    FROM (SELECT doc_id, text,
                 unnest(range(0, CAST(greatest(1, ceil(length(text) / 100.0)) AS BIGINT))) AS i
          FROM documents WHERE doc_id < 300)
    """,
    doc="REAL document extraction end-to-end: chunk each corpus text "
    "into 100-character pages, write a genuine PDF per document "
    "(operators/pdf.py::encode_pdf — catalog/pages-tree/page objects, "
    "per-page content streams with Tj text operators and full literal-"
    "string escaping, FlateDecode for odd ids and raw streams for "
    "even, and the cross-reference layout cycling id%4 through ALL "
    "FOUR real forms: classic 1.4 table, 1.5 xref STREAM (/W binary "
    "rows), ObjStm-packed with a PNG-predicted xref stream — the "
    "default post-2005 layout — and hybrid /XRefStm; id%13==4/8 "
    "additionally encrypt with the standard security handler at "
    "RC4-40/RC4-128 with an empty user password, the permissions-only "
    "form — ISO 32000-1 §7.6.3 key derivation, /U verification, and "
    "per-object RC4 run on the read side), then parse it "
    "back (::extract_pdf_pages — startxref → xref-chain walk with "
    "offset and ObjStm-pair-table cross-validation, reference-"
    "following Catalog→Pages→Kids→Contents, zlib inflate + predictor "
    "undo, Tj/TJ/'/\" tokenization) and emit one row per page. "
    "The oracle is DIRECT STRING EQUALITY against substr() of the "
    "source text — any escaping, inflate, page-order, or tokenizer "
    "bug corrupts the extracted text and breaks the hash. The "
    "doc_id < 300 probe filter pushes onto the parquet scan; payload "
    "bytes never leave the executors.",
    tags=("multimodal",),
)
def multimodal_pdf_text_extract(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 300)
    return PDF.extract_document_text(PDF.synthesize_pdfs(d))


@register(
    "multimodal_tiff_decode_stats",
    oracle="""
    SELECT lang, COUNT(*) AS n_items,
           CAST(SUM((1 + doc_id % 13) * (1 + doc_id % 7)) AS BIGINT) AS sum_pixels,
           CAST(SUM(CAST(1 + doc_id % 13 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_width,
           CAST(SUM(CAST(1 + doc_id % 7 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_height,
           CAST(SUM(CAST(doc_id % 53 + (doc_id % 13) / 2.0
                         + doc_id % 7 + doc_id % 2
                    AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_pixel
    FROM documents GROUP BY lang
    """,
    doc="REAL baseline-TIFF decode end-to-end: synthesize genuine TIFF "
    "6.0 files per document (operators/multimodal.py::"
    "encode_tiff_sample — IFD tag directory, 2-row strips addressed by "
    "StripOffsets/StripByteCounts, the container variants cycling per "
    "id: grayscale AND RGB photometrics, uncompressed AND PackBits AND "
    "LZW strips (the spec §13 MSB-first early-change codec, odd LZW "
    "ids adding the horizontal-differencing predictor), little- AND "
    "big-endian byte orders, and a TILED-organization slice — 16x16 "
    "edge-padded tiles, the GeoTIFF/large-file layout), parse them "
    "back through the registry "
    "decoder (::decode_tiff — byte-order dispatch, IFD walk, strip "
    "assembly, PackBits/LZW expansion, predictor undo), "
    "aggregate per lang. The oracle recomputes geometry and the "
    "gradient mean base + (w-1)/2 + (h-1) (+1 for RGB ids) from the "
    "doc_id formulas — any strip-order, RLE, endianness, or sample-"
    "layout bug breaks the hash.",
    tags=("multimodal",),
)
def multimodal_tiff_decode_stats(spark, sf_dir):
    return _media_decode_stats(spark, sf_dir, "tiff")


@register(
    "multimodal_tiff16_decode_stats",
    oracle="""
    SELECT lang, COUNT(*) AS n_items,
           CAST(SUM((1 + doc_id % 13) * (1 + doc_id % 7)) AS BIGINT) AS sum_pixels,
           CAST(SUM(CAST(16 AS BIGINT)) / COUNT(1) AS BIGINT) AS bit_depth,
           CAST(SUM(CAST(1 + doc_id % 13 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_width,
           CAST(SUM(CAST(1 + doc_id % 7 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_height,
           CAST(SUM(CAST(257 * (doc_id % 53 + (doc_id % 13) / 2.0
                         + doc_id % 7 + doc_id % 2)
                    AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_pixel
    FROM documents GROUP BY lang
    """,
    doc="16-BIT TIFF decoded for real (the scientific/GeoTIFF sample "
    "depth): the same container-variant cycle as the 8-bit row — "
    "gray/RGB photometrics, none/PackBits/LZW/Deflate strips, BOTH "
    "byte orders, the tiled slice — at BitsPerSample 16 with the "
    "SAMPLE-WIDE horizontal-differencing predictor (mod-65536 words "
    "in the file byte order, TIFF 6.0 §14) on the compressed slices "
    "(operators/multimodal.py::encode_tiff16_sample / ::_tiff_parse). "
    "Samples store v*257, so the oracle mean is exactly 257x the "
    "8-bit closed form — any word-order, predictor-width, or "
    "byte-vs-sample arithmetic bug breaks the hash.",
    tags=("multimodal",),
)
def multimodal_tiff16_decode_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    feats = M.extract_media_features(
        M.synthesize_media(d, "tiff-16", keep=("lang",)), keep=("lang",)
    )
    exact = lambda c: F.sum(F.col(c).cast("decimal(28,6)")).cast(
        "double") / F.count(F.lit(1))
    return feats.groupBy("lang").agg(
        F.count("*").alias("n_items"),
        F.sum("n_units").alias("sum_pixels"),
        (F.sum("bit_depth") / F.count(F.lit(1))).cast("long").alias(
            "bit_depth"),
        exact("width").alias("avg_width"),
        exact("height").alias("avg_height"),
        exact("mean_value").alias("avg_pixel"),
    )


@register(
    "multimodal_palette_tiff_decode_stats",
    oracle="""
    SELECT lang, COUNT(*) AS n_items,
           CAST(SUM((1 + doc_id % 13) * (1 + doc_id % 7)) AS BIGINT) AS sum_pixels,
           CAST(SUM(CAST(1 + doc_id % 13 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_width,
           CAST(SUM(CAST(1 + doc_id % 7 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_height,
           CAST(SUM(CAST(257 * (doc_id % 53 + (doc_id % 13) / 2.0
                         + doc_id % 7)
                    AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_pixel
    FROM documents GROUP BY lang
    """,
    doc="PALETTE-COLOR TIFF decoded for real (photometric 3 + "
    "ColorMap — the scanned-document layout): gradient pixel INDEXES "
    "expand through a 768-entry 16-bit ColorMap (red/green/blue "
    "blocks, grayscale entry i = i*257) inside the shared parse "
    "(operators/multimodal.py::_tiff_parse finish/::"
    "encode_tiff_palette_sample), with the full none/PackBits/LZW/"
    "Deflate + predictor + byte-order + tiled cycle on the index "
    "planes. The oracle mean is 257x the gray gradient closed form — "
    "a block-order, entry-width, or map-skip bug breaks the hash.",
    tags=("multimodal",),
)
def multimodal_palette_tiff_decode_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    feats = M.extract_media_features(
        M.synthesize_media(d, "tiff-palette", keep=("lang",)),
        keep=("lang",))
    exact = lambda c: F.sum(F.col(c).cast("decimal(28,6)")).cast(
        "double") / F.count(F.lit(1))
    return feats.groupBy("lang").agg(
        F.count("*").alias("n_items"),
        F.sum("n_units").alias("sum_pixels"),
        exact("width").alias("avg_width"),
        exact("height").alias("avg_height"),
        exact("mean_value").alias("avg_pixel"),
    )


@register(
    "multimodal_g4_tiff_decode_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, doc_id % 3 AS p,
             CASE doc_id % 3 WHEN 2 THEN 64 + (doc_id % 17) * 7
                  ELSE 3 + doc_id % 13 END AS w,
             CASE doc_id % 3 WHEN 2 THEN 1 + doc_id % 5
                  ELSE 1 + doc_id % 7 END AS h,
             CASE doc_id % 3 WHEN 0 THEN 1
                  WHEN 1 THEN 1 + doc_id % 3 ELSE 1 + doc_id % 2 END AS k,
             CASE doc_id % 3 WHEN 1 THEN 0 ELSE doc_id % 2 END AS base
      FROM documents WHERE doc_id < 300),
    ink AS (
      SELECT doc_id, w, h,
             CASE p
               WHEN 0 THEN CASE WHEN base = 0
                 THEN w * h - (((w + 1) // 2) * ((h + 1) // 2)
                               + (w // 2) * (h // 2))
                 ELSE ((w + 1) // 2) * ((h + 1) // 2)
                      + (w // 2) * (h // 2) END
               WHEN 1 THEN h * (k * (w // (2 * k))
                               + greatest(0, w % (2 * k) - k))
               ELSE w * (CASE WHEN base = 0
                 THEN k * (h // (2 * k)) + greatest(0, h % (2 * k) - k)
                 ELSE h - (k * (h // (2 * k))
                           + greatest(0, h % (2 * k) - k)) END)
             END AS n_ink
      FROM g)
    SELECT doc_id, CAST(1 AS BIGINT) AS bit_depth,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(w * h - n_ink AS DOUBLE) / (w * h) AS mean_value
    FROM ink
    """,
    doc="CCITT GROUP 4 (T.6) fax TIFF decoded for real — the "
    "scanned-document standard: 2-D MMR coding (pass/vertical/"
    "horizontal modes against the reference line) with horizontal-"
    "mode run lengths from the public ITU-T T.4 modified-Huffman "
    "tables (terminating + makeup + shared extended makeups), "
    "per-strip reference resets (TIFF 6.0 §11), BOTH photometric "
    "interpretations (the decoder maps coded white to the "
    "photometric's white sample) and BOTH FillOrders (tag 266, "
    "LSB-first bytes bit-reversed on read). Patterns cycle "
    "checkerboard (vertical-mode torture), vertical stripes (V0 "
    "steady state), and WIDE horizontal stripes whose runs exceed 64 "
    "pixels so makeup codes are load-bearing "
    "(operators/multimodal.py::g4_decode/g4_encode). The oracle "
    "recomputes each geometry and ink count closed-form from doc_id "
    "— a mode-selection, run-table, fill-order, or photometric "
    "mapping bug breaks the hash.",
    tags=("multimodal",),
)
def multimodal_g4_tiff_decode_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 300)
    feats = M.extract_media_features(M.synthesize_media(d, "tiff-g4"))
    return feats.select("doc_id", "bit_depth", "width", "height",
                        "mean_value")


@register(
    "multimodal_g3_tiff_decode_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, doc_id % 3 AS p,
             CASE doc_id % 3 WHEN 2 THEN 64 + (doc_id % 17) * 7
                  ELSE 3 + doc_id % 13 END AS w,
             CASE doc_id % 3 WHEN 2 THEN 1 + doc_id % 5
                  ELSE 1 + doc_id % 7 END AS h,
             CASE doc_id % 3 WHEN 0 THEN 1
                  WHEN 1 THEN 1 + doc_id % 3 ELSE 1 + doc_id % 2 END AS k,
             CASE doc_id % 3 WHEN 1 THEN 0 ELSE doc_id % 2 END AS base
      FROM documents WHERE doc_id < 300),
    ink AS (
      SELECT doc_id, w, h,
             CASE p
               WHEN 0 THEN CASE WHEN base = 0
                 THEN w * h - (((w + 1) // 2) * ((h + 1) // 2)
                               + (w // 2) * (h // 2))
                 ELSE ((w + 1) // 2) * ((h + 1) // 2)
                      + (w // 2) * (h // 2) END
               WHEN 1 THEN h * (k * (w // (2 * k))
                               + greatest(0, w % (2 * k) - k))
               ELSE w * (CASE WHEN base = 0
                 THEN k * (h // (2 * k)) + greatest(0, h % (2 * k) - k)
                 ELSE h - (k * (h // (2 * k))
                           + greatest(0, h % (2 * k) - k)) END)
             END AS n_ink
      FROM g)
    SELECT doc_id, CAST(1 AS BIGINT) AS bit_depth,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(w * h - n_ink AS DOUBLE) / (w * h) AS mean_value
    FROM ink
    """,
    doc="CCITT GROUP 3 + RLE fax TIFFs decoded for real — the other "
    "two fax compressions: Compression 2 (per-row modified-Huffman "
    "1-D, every row byte-aligned, no EOLs), Compression 3 G3 1-D "
    "(EOL-synchronized MH rows with fill-bit absorption), and G3 2-D "
    "(T4Options bit 0: a tag bit after each EOL picks 1-D or 2-D row "
    "coding, 2-D rows via the same mode coder as T.6, K-factor 1-D "
    "resync rows) — cycling by doc_id over the SAME patterns, "
    "photometrics, and FillOrders as the G4 row, so the identical "
    "closed-form oracle pins all three codecs "
    "(operators/multimodal.py::ccitt_rle_decode/g3_decode). T.4 "
    "uncompressed mode stays a loud boundary.",
    tags=("multimodal",),
)
def multimodal_g3_tiff_decode_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 300)
    feats = M.extract_media_features(M.synthesize_media(d, "tiff-g3"))
    return feats.select("doc_id", "bit_depth", "width", "height",
                        "mean_value")


@register(
    "multimodal_subbyte_tiff_decode_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, doc_id % 3 AS k,
             CASE doc_id % 3 WHEN 0 THEN 3 + doc_id % 13
                  ELSE 1 + doc_id % 6 END AS w,
             CASE doc_id % 3 WHEN 0 THEN 1 + doc_id % 7
                  ELSE 1 + doc_id % 5 END AS h,
             CASE doc_id % 3 WHEN 0 THEN doc_id % 2
                  ELSE doc_id % 6 END AS base,
             (doc_id // 2) % 2 AS photo
      FROM documents WHERE doc_id < 300),
    e AS (
      SELECT doc_id, k, w, h, base, photo,
             ((w + 1) // 2) * ((h + 1) // 2) + (w // 2) * (h // 2)
               AS n_even,
             w * h * base + w * (h * (h - 1) // 2)
               + h * (w * (w - 1) // 2) AS sum_i
      FROM g)
    SELECT doc_id,
           CAST(CASE k WHEN 0 THEN 1 WHEN 1 THEN 4 ELSE 16 END
                AS BIGINT) AS bit_depth,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CASE k
             WHEN 0 THEN CAST(CASE
                 WHEN (base = 0) = (photo = 0)
                 THEN n_even ELSE w * h - n_even END AS DOUBLE) / (w * h)
             WHEN 1 THEN CASE WHEN photo = 0
                 THEN 15 - (base + (w - 1) / 2.0 + (h - 1) / 2.0)
                 ELSE base + (w - 1) / 2.0 + (h - 1) / 2.0 END
             ELSE CAST(4369 * (15 * w * h + sum_i) AS DOUBLE)
                  / (3 * w * h)
           END AS mean_value
    FROM e
    """,
    doc="SUB-BYTE TIFF planes under the byte-stream codecs — the "
    "1-bit (uncompressed scans) and 4-bit (old grayscale/palette "
    "scans) layouts: MSB-first byte-padded rows decompressed with "
    "none/PackBits/LZW/Deflate cycling by doc_id, then unpacked with "
    "the shared vectorized bit gather; 4-bit PALETTE expands through "
    "a non-identity 16-bit ColorMap (i -> ((15-i)*4369, i*4369, "
    "i*4369)), both photometric senses for the gray kinds, both byte "
    "orders (operators/multimodal.py::encode_tiff_subbyte / "
    "_tiff_parse). The oracle recomputes geometry + closed-form mean "
    "per doc_id — an unpack, padding, codec-length, photometric, or "
    "ColorMap bug breaks the hash.",
    tags=("multimodal",),
)
def multimodal_subbyte_tiff_decode_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 300)
    feats = M.extract_media_features(
        M.synthesize_media(d, "tiff-subbyte"))
    return feats.select("doc_id", "bit_depth", "width", "height",
                        "mean_value")



@register(
    "multimodal_png_decode_stats",
    oracle="""
    SELECT lang, COUNT(*) AS n_items,
           CAST(SUM((1 + doc_id % 13) * (1 + doc_id % 7)) AS BIGINT) AS sum_pixels,
           CAST(SUM(CAST(1 + doc_id % 13 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_width,
           CAST(SUM(CAST(1 + doc_id % 7 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_height,
           CAST(SUM(CAST(doc_id % 53 + 7 * (doc_id % 7) / 2.0
                         + 13 * (doc_id % 13) / 2.0 + 1
                    AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_pixel
    FROM documents GROUP BY lang
    """,
    doc="REAL compressed-image decode end-to-end: synthesize genuine "
    "8-bit truecolor PNG bytes per document (operators/multimodal.py::"
    "encode_png — stdlib-zlib DEFLATE, row filter type cycling through "
    "all five spec filters None/Sub/Up/Average/Paeth, gradient pixels "
    "closed-form in doc_id), parse them back through the codec "
    "registry's built-in decoder (::decode_png — chunk walk with CRC32 "
    "verification, inflate, filter reconstruction), aggregate per "
    "lang. The oracle recomputes geometry AND the reconstructed-pixel "
    "mean (base + 7(h-1)/2 + 13(w-1)/2 + 1) from the doc_id formulas, "
    "so any unfilter-arithmetic or inflate-framing bug breaks the "
    "hash. Payload bytes never leave the executors.",
    tags=("multimodal",),
)
def multimodal_png_decode_stats(spark, sf_dir):
    return _media_decode_stats(spark, sf_dir, "png")


@register(
    "multimodal_gif_decode_stats",
    oracle="""
    SELECT lang, COUNT(*) AS n_items,
           CAST(SUM((1 + doc_id % 13) * (1 + doc_id % 7)) AS BIGINT) AS sum_pixels,
           CAST(SUM(CAST(1 + doc_id % 13 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_width,
           CAST(SUM(CAST(1 + doc_id % 7 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_height,
           CAST(SUM(CAST(doc_id % 53 + 7 * (doc_id % 7) / 2.0
                         + 13 * (doc_id % 13) / 2.0
                    AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_pixel
    FROM documents GROUP BY lang
    """,
    doc="REAL LZW decode end-to-end: synthesize genuine GIF89a bytes "
    "per document (operators/multimodal.py::encode_gif — real "
    "variable-width LZW compression, 256-entry grayscale palette, "
    "sub-block framing, gradient pixel indexes closed-form in doc_id), "
    "parse them back through the built-in decoder (::decode_gif — "
    "extension skipping, sub-block reassembly, LZW with dictionary "
    "growth and the KwKwK case, palette mapping), aggregate per lang. "
    "The oracle recomputes geometry AND the palette-mapped mean "
    "(base + 7(h-1)/2 + 13(w-1)/2) from the doc_id formulas, so any "
    "LZW or palette bug breaks the hash. Payloads never leave the "
    "executors.",
    tags=("multimodal",),
)
def multimodal_gif_decode_stats(spark, sf_dir):
    return _media_decode_stats(spark, sf_dir, "gif")


@register(
    "multimodal_jpeg_decode_stats",
    oracle="""
    SELECT lang, COUNT(*) AS n_items,
           CAST(SUM((1 + doc_id % 13) * (1 + doc_id % 7)) AS BIGINT) AS sum_pixels,
           CAST(SUM(CAST(1 + doc_id % 13 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_width,
           CAST(SUM(CAST(1 + doc_id % 7 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_height,
           CAST(SUM(CAST(doc_id % 251 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_pixel
    FROM documents GROUP BY lang
    """,
    doc="REAL DCT-codec decode end-to-end: synthesize genuine baseline "
    "grayscale JPEG bytes per document (operators/multimodal.py::"
    "encode_jpeg — FDCT, quantization, zigzag, differential-DC + "
    "run-length-AC Huffman entropy coding with byte stuffing; "
    "constant-tile content with the all-ones quant table is "
    "DISTORTION-FREE: a constant block is a lone integer DC "
    "coefficient), parse them back through the built-in decoder "
    "(::decode_jpeg — marker walk, DHT/DQT table build, Huffman "
    "decode, dequantize, IDCT, crop), aggregate per lang. The oracle "
    "recomputes geometry AND the reconstructed mean from the doc_id "
    "formulas, so any entropy- or IDCT-level bug breaks the hash.",
    tags=("multimodal",),
)
def multimodal_jpeg_decode_stats(spark, sf_dir):
    return _media_decode_stats(spark, sf_dir, "jpeg")


@register(
    "multimodal_palette_png_decode_stats",
    oracle="""
    SELECT lang, COUNT(*) AS n_items,
           CAST(SUM((1 + doc_id % 13) * (1 + doc_id % 7)) AS BIGINT) AS sum_pixels,
           CAST(SUM(CAST(1 + doc_id % 13 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_width,
           CAST(SUM(CAST(1 + doc_id % 7 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_height,
           CAST(SUM(CAST((255 + doc_id % 53 + 7 * (doc_id % 7) / 2.0
                          + 13 * (doc_id % 13) / 2.0) / 3.0
                    AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_pixel
    FROM documents GROUP BY lang
    """,
    doc="REAL indexed-PNG decode end-to-end: synthesize genuine 8-bit "
    "PALETTE (color type 3) PNG bytes per document (operators/"
    "multimodal.py::encode_png color_type=3 — gradient palette "
    "indexes through all five row filters, PLTE chunk with the "
    "non-identity mapping i→(255-i, i, i)), parse them back through "
    "the built-in decoder (::decode_png — CRC-verified chunk walk, "
    "inflate, unfilter, PLTE lookup per reconstructed index), "
    "aggregate per lang. Because the palette is non-identity, the "
    "mapped mean is (255 + E[index])/3 ≠ E[index]: a decoder that "
    "skips (or mis-indexes) the PLTE lookup breaks the hash, not "
    "just a filter bug.",
    tags=("multimodal",),
)
def multimodal_palette_png_decode_stats(spark, sf_dir):
    return _media_decode_stats(spark, sf_dir, "png-palette")


@register(
    "multimodal_lowbit_png_decode_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, doc_id % 3 AS k,
             CASE doc_id % 3 WHEN 0 THEN 4 WHEN 1 THEN 2 ELSE 8 END AS bd,
             CASE doc_id % 3 WHEN 0 THEN 1 + doc_id % 6
                  WHEN 1 THEN 4 * (1 + doc_id % 3)
                  ELSE 3 + doc_id % 13 END AS w,
             CASE doc_id % 3 WHEN 0 THEN 1 + doc_id % 5
                  ELSE 1 + doc_id % 7 END AS h,
             CASE doc_id % 3 WHEN 0 THEN doc_id % 6
                  WHEN 1 THEN doc_id % 4 ELSE doc_id % 2 END AS base
      FROM documents WHERE doc_id < 300)
    SELECT doc_id, CAST(bd AS BIGINT) AS bit_depth,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CASE k
             WHEN 0 THEN base + (w - 1) / 2.0 + (h - 1) / 2.0
             WHEN 1 THEN 1.5
             ELSE (255.0 * w * h + (CASE WHEN base = 0
                  THEN w * h - (((w + 1) // 2) * ((h + 1) // 2)
                                + (w // 2) * (h // 2))
                  ELSE ((w + 1) // 2) * ((h + 1) // 2)
                       + (w // 2) * (h // 2) END)) / (3.0 * w * h)
           END AS mean_value
    FROM g
    """,
    doc="SUB-BYTE PNG decode end-to-end — the 1/2/4-bit depths common "
    "in web-corpus icons/screenshots/charts: depth cycles 4/2/1 by "
    "doc_id (4-bit grayscale gradient, 2-bit modular gradient whose "
    "width is a multiple of 4 so the mean is exactly 1.5, 1-bit "
    "INDEXED checkerboard through the non-identity 2-entry palette "
    "i->(255-i,i,i)), every 5th id Adam7-interlaced with per-pass "
    "byte-padded sub-byte scanlines (operators/multimodal.py::"
    "_png_unpack_bits — MSB-first unpacking vectorized as a numpy "
    "shift/mask gather, filters running over PACKED bytes with bpp=1 "
    "per the spec). The oracle recomputes each geometry and "
    "closed-form mean from the doc_id formulas — an unpacking, "
    "row-padding, filter-stride, or palette bug breaks the hash.",
    tags=("multimodal",),
)
def multimodal_lowbit_png_decode_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 300)
    feats = M.extract_media_features(M.synthesize_media(d, "png-lowbit"))
    return feats.select("doc_id", "bit_depth", "width", "height",
                        "mean_value")


@register(
    "multimodal_png16_decode_stats",
    oracle="""
    SELECT lang, COUNT(*) AS n_items,
           CAST(SUM((1 + doc_id % 13) * (1 + doc_id % 7)) AS BIGINT) AS sum_pixels,
           CAST(SUM(CAST(1 + doc_id % 13 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_width,
           CAST(SUM(CAST(1 + doc_id % 7 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_height,
           CAST(SUM(CAST(257 * (doc_id % 53 + 7 * (doc_id % 7) / 2.0
                                + 13 * (doc_id % 13) / 2.0 + 1)
                    AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_sample
    FROM documents GROUP BY lang
    """,
    doc="REAL 16-bit PNG decode end-to-end: synthesize genuine 16-bit "
    "truecolor PNGs (operators/multimodal.py::encode_png bit_depth=16 "
    "— big-endian v*257 gradient samples, so the 16-bit mean is "
    "exactly 257x the 8-bit closed form; the spec's filters operate "
    "on BYTES with a 6-byte pixel, so the filter arithmetic is "
    "exercised at the doubled stride), decode through the registry "
    "(::decode_png reads samples big-endian), aggregate per lang. A "
    "stride/bpp bug at 16-bit shifts the sample mean and breaks the "
    "hash.",
    tags=("multimodal",),
)
def multimodal_png16_decode_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    feats = M.extract_media_features(
        M.synthesize_media(d, "png-16", keep=("lang",)), keep=("lang",)
    )
    exact = lambda c: F.sum(F.col(c).cast("decimal(28,6)")).cast(
        "double") / F.count(F.lit(1))
    return feats.groupBy("lang").agg(
        F.count("*").alias("n_items"),
        F.sum("n_units").alias("sum_pixels"),
        exact("width").alias("avg_width"),
        exact("height").alias("avg_height"),
        exact("mean_value").alias("avg_sample"),
    )


@register(
    "multimodal_interlaced_png_resize_stats",
    oracle="""
    WITH g AS (
      SELECT source, doc_id % 53 AS base,
             1 + doc_id % 13 AS w, 1 + doc_id % 7 AS h
      FROM documents)
    SELECT source, COUNT(*) AS n_items,
           CAST(COUNT(*) * 16 AS BIGINT) AS sum_pixels,
           CAST(SUM(CAST(
             base + 1
             + 7 * (FLOOR(0.0*h/4) + FLOOR(1.0*h/4)
                    + FLOOR(2.0*h/4) + FLOOR(3.0*h/4)) / 4.0
             + 13 * (FLOOR(0.0*w/4) + FLOOR(1.0*w/4)
                     + FLOOR(2.0*w/4) + FLOOR(3.0*w/4)) / 4.0
           AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_pixel
    FROM g GROUP BY source
    """,
    doc="Adam7 de-interlace verified POSITION-SENSITIVELY: the mean "
    "alone is permutation-blind (a scrambled scatter has the same "
    "pixel multiset), so this row synthesizes genuine interlaced PNGs "
    "(operators/multimodal.py::encode_png interlaced=True — seven "
    "independently-filtered passes), nearest-neighbor-resizes every "
    "payload to 4x4 (source index floor(i*src/4) — WHICH pixels "
    "survive depends on their position), decodes the resized bytes "
    "and aggregates. The oracle recomputes the sampled gradient "
    "positions in closed form: a scatter bug moves wrong values into "
    "the sampled cells and breaks the hash. Payloads never leave the "
    "executors.",
    tags=("multimodal",),
)
def multimodal_interlaced_png_resize_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    media = M.synthesize_media(d, "png-interlaced", keep=("source",))
    resized = M.resize_images(media, 4, 4)
    feats = M.extract_media_features(resized, keep=("source",))
    exact = lambda c: F.sum(F.col(c).cast("decimal(28,6)")).cast(
        "double") / F.count(F.lit(1))
    return feats.groupBy("source").agg(
        F.count("*").alias("n_items"),
        F.sum("n_units").alias("sum_pixels"),
        exact("mean_value").alias("avg_pixel"),
    )


_COLOR_JPEG_ORACLE = """
    WITH rgb AS (
      SELECT lang,
             CAST(doc_id % 251 AS DOUBLE) AS r,
             CAST((doc_id * 3) % 251 AS DOUBLE) AS g,
             CAST((doc_id * 7) % 251 AS DOUBLE) AS b,
             1 + doc_id % 13 AS w, 1 + doc_id % 7 AS h
      FROM documents),
    ycc AS (
      SELECT lang, w, h,
             FLOOR(0.299::DOUBLE * r + 0.587::DOUBLE * g
                   + 0.114::DOUBLE * b + 0.5::DOUBLE) AS y,
             FLOOR(128.0::DOUBLE - 0.168736::DOUBLE * r
                   - 0.331264::DOUBLE * g + 0.5::DOUBLE * b
                   + 0.5::DOUBLE) AS cb,
             FLOOR(128.0::DOUBLE + 0.5::DOUBLE * r
                   - 0.418688::DOUBLE * g - 0.081312::DOUBLE * b
                   + 0.5::DOUBLE) AS cr
      FROM rgb),
    back AS (
      SELECT lang, w, h,
             GREATEST(0.0::DOUBLE, LEAST(255.0::DOUBLE,
               FLOOR(y + 1.402::DOUBLE * (cr - 128.0::DOUBLE)
                     + 0.5::DOUBLE))) AS r2,
             GREATEST(0.0::DOUBLE, LEAST(255.0::DOUBLE,
               FLOOR(y - 0.344136::DOUBLE * (cb - 128.0::DOUBLE)
                     - 0.714136::DOUBLE * (cr - 128.0::DOUBLE)
                     + 0.5::DOUBLE))) AS g2,
             GREATEST(0.0::DOUBLE, LEAST(255.0::DOUBLE,
               FLOOR(y + 1.772::DOUBLE * (cb - 128.0::DOUBLE)
                     + 0.5::DOUBLE))) AS b2
      FROM ycc)
    SELECT lang, COUNT(*) AS n_items,
           CAST(SUM(w * h) AS BIGINT) AS sum_pixels,
           CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_width,
           CAST(SUM(CAST(h AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_height,
           CAST(SUM(CAST(r2 + g2 + b2 AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(1) AS avg_rgb_sum
    FROM back GROUP BY lang
    """


@register(
    "multimodal_color_jpeg_decode_stats",
    oracle=_COLOR_JPEG_ORACLE,
    doc="REAL color-JPEG decode end-to-end: synthesize genuine "
    "baseline YCbCr 4:4:4 JPEG bytes per document (operators/"
    "multimodal.py::encode_jpeg rgb=... — JFIF forward color "
    "conversion rounded half-up, three interleaved component scans "
    "per MCU, luma on table ids 0 and chroma on ids 1), parse them "
    "back through the built-in decoder (::_jpeg_decode_pixels — "
    "per-component quant/Huffman tables and DC predictors, IDCT, "
    "inverse color conversion), aggregate per lang. Constant tiles + "
    "all-ones quant keep the DCT path distortion-free, and both color "
    "conversions round with floor(x+0.5), so the oracle replicates "
    "the ENTIRE integer chain (RGB→YCbCr→RGB) in SQL — any "
    "table-selection, predictor, or conversion bug breaks the hash. "
    "mod-251 channels keep the forward conversion clip-free.",
    tags=("multimodal",),
)
def multimodal_color_jpeg_decode_stats(spark, sf_dir):
    return _color_jpeg_decode_stats(spark, sf_dir, "jpeg-color")


@register(
    "multimodal_ycbcr_tiff_decode_stats",
    oracle=_COLOR_JPEG_ORACLE,
    doc="TIFF PHOTOMETRIC 6 (YCbCr) decoded for real at 4:4:4 — the "
    "video-frame/scanner color layout: constant clip-free colors "
    "forward-converted with the full-range BT.601 JFIF chain "
    "(floor(x+0.5) half-up, shared with the JPEG codec), stored "
    "through the full compression/byte-order/tiled/PLANAR container "
    "cycle with an explicit 4:4:4 YCbCrSubSampling tag, inverse-"
    "converted on read (operators/multimodal.py::_tiff_parse "
    "photo==6). Chroma-subsampled cluster layouts and explicit "
    "ReferenceBlackWhite stay loud boundaries. The oracle is the SAME "
    "SQL double-conversion chain the color-JPEG row uses — identical "
    "params, identical integer chain, so a conversion or layout bug "
    "breaks the hash.",
    tags=("multimodal",),
)
def multimodal_ycbcr_tiff_decode_stats(spark, sf_dir):
    return _color_jpeg_decode_stats(spark, sf_dir, "tiff-ycbcr")


def _color_jpeg_decode_stats(spark, sf_dir, kind):
    d = _t(spark, sf_dir, "documents")["documents"]
    feats = M.extract_media_features(
        M.synthesize_media(d, kind, keep=("lang",)),
        keep=("lang",),
    )
    exact = lambda c: F.sum(F.col(c).cast("decimal(28,6)")).cast(
        "double") / F.count(F.lit(1))
    # mean_value is (r+g+b)/3 per constant tile — multiply back to the
    # exact integer sum so the decimal-cast discipline stays lossless
    feats = feats.withColumn(
        "rgb_sum", F.round(F.col("mean_value") * 3, 0))
    return feats.groupBy("lang").agg(
        F.count("*").alias("n_items"),
        F.sum("n_units").alias("sum_pixels"),
        exact("width").alias("avg_width"),
        exact("height").alias("avg_height"),
        exact("rgb_sum").alias("avg_rgb_sum"),
    )


_CMYK_JPEG_ORACLE = """
    WITH base AS (
      SELECT lang, doc_id % 2 AS odd,
             CAST(255 - (5 + doc_id % 246) AS DOUBLE) AS ic,
             CAST(255 - (5 + (doc_id * 3) % 246) AS DOUBLE) AS im,
             CAST(255 - (5 + (doc_id * 7) % 246) AS DOUBLE) AS iy,
             CAST(255 - (doc_id % 251) AS DOUBLE) AS ik,
             1 + doc_id % 13 AS w, 1 + doc_id % 7 AS h
      FROM documents),
    ycc AS (
      SELECT *,
             FLOOR(0.299::DOUBLE * ic + 0.587::DOUBLE * im
                   + 0.114::DOUBLE * iy + 0.5::DOUBLE) AS y,
             FLOOR(128.0::DOUBLE - 0.168736::DOUBLE * ic
                   - 0.331264::DOUBLE * im + 0.5::DOUBLE * iy
                   + 0.5::DOUBLE) AS cb,
             FLOOR(128.0::DOUBLE + 0.5::DOUBLE * ic
                   - 0.418688::DOUBLE * im - 0.081312::DOUBLE * iy
                   + 0.5::DOUBLE) AS cr
      FROM base),
    stored AS (
      SELECT lang, w, h, ik,
             CASE WHEN odd = 1 THEN GREATEST(0.0::DOUBLE,
               LEAST(255.0::DOUBLE, FLOOR(y + 1.402::DOUBLE
                     * (cr - 128.0::DOUBLE) + 0.5::DOUBLE)))
             ELSE ic END AS s0,
             CASE WHEN odd = 1 THEN GREATEST(0.0::DOUBLE,
               LEAST(255.0::DOUBLE, FLOOR(y - 0.344136::DOUBLE
                     * (cb - 128.0::DOUBLE) - 0.714136::DOUBLE
                     * (cr - 128.0::DOUBLE) + 0.5::DOUBLE)))
             ELSE im END AS s1,
             CASE WHEN odd = 1 THEN GREATEST(0.0::DOUBLE,
               LEAST(255.0::DOUBLE, FLOOR(y + 1.772::DOUBLE
                     * (cb - 128.0::DOUBLE) + 0.5::DOUBLE)))
             ELSE iy END AS s2
      FROM ycc),
    px AS (
      SELECT lang, w, h,
             FLOOR(s0 * ik / 255.0::DOUBLE + 0.5::DOUBLE)
             + FLOOR(s1 * ik / 255.0::DOUBLE + 0.5::DOUBLE)
             + FLOOR(s2 * ik / 255.0::DOUBLE + 0.5::DOUBLE) AS rgbsum
      FROM stored)
    SELECT lang, COUNT(*) AS n_items,
           CAST(SUM(w * h) AS BIGINT) AS sum_pixels,
           CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_width,
           CAST(SUM(CAST(h AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_height,
           CAST(SUM(CAST(rgbsum AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(1) AS avg_rgb_sum
    FROM px GROUP BY lang
    """


@register(
    "multimodal_jpeg_cmyk_decode_stats",
    oracle=_CMYK_JPEG_ORACLE,
    doc="Adobe 4-component (print-origin) JPEG decoded end-to-end: "
    "synthesize genuine CMYK files per document (operators/"
    "multimodal.py::encode_jpeg cmyk=... — four interleaved component "
    "scans, channels stored INVERTED per Adobe convention, an APP14 "
    "marker carrying the transform flag: plain CMYK (0) for even ids, "
    "YCCK (2) for odd — the forward YCbCr transform applied to the "
    "inverted CMY channels), decode through the shared machinery "
    "(::_jpeg_decode_pixels — per-component tables and predictors, "
    "APP14 dispatch, YCCK inverse, inverted-channel CMYK→RGB "
    "stored_c*stored_k/255 with floor(x+0.5)), aggregate per lang. "
    "Constant tiles + all-ones quant keep the DCT path "
    "distortion-free, so the oracle replicates the ENTIRE integer "
    "chain in SQL; a missing APP14 is a loud boundary (inversion "
    "would otherwise be a guess). CMY in 5..250 keeps the YCCK "
    "forward conversion clip-free.",
    tags=("multimodal",),
)
def multimodal_jpeg_cmyk_decode_stats(spark, sf_dir):
    return _color_jpeg_decode_stats(spark, sf_dir, "jpeg-cmyk")


@register(
    "multimodal_jpeg420_decode_stats",
    oracle=_COLOR_JPEG_ORACLE,
    doc="The dominant real-world JPEG layout decoded end-to-end: "
    "4:2:0 chroma subsampling (MCUs of four luma blocks + one block "
    "per chroma, 16x16-pixel tiles, replicate-upsample) PLUS restart "
    "intervals (DRI segment, spec-sequenced byte-aligned RSTn markers "
    "splitting the entropy stream, DC predictors reset per segment — "
    "interval varies per document, 1..3 MCUs). Constant color tiles "
    "subsample LOSSLESSLY (a block mean of a constant is the "
    "constant), so the ORACLE IS IDENTICAL to the 4:4:4 row: any "
    "interleave, upsample, restart-resync, or predictor-reset bug "
    "shifts the reconstructed values and breaks the shared hash.",
    tags=("multimodal",),
)
def multimodal_jpeg420_decode_stats(spark, sf_dir):
    return _color_jpeg_decode_stats(spark, sf_dir, "jpeg-420")


@register(
    "multimodal_progressive_jpeg_decode_stats",
    oracle=_COLOR_JPEG_ORACLE,
    doc="PROGRESSIVE (SOF2) JPEG decoded end-to-end: per-document "
    "color files whose coefficients arrive across a spectral-"
    "selection + successive-approximation scan script (interleaved "
    "DC scan at Al=1 plus refinement, per-component AC band scans at "
    "Al=2 refined twice, EOB-run folding; 4:2:0 chroma for odd ids; "
    "RESTART MARKERS threaded through every scan for ids % 3 != 0, "
    "with per-scan DC-predictor and EOB-run resets at each boundary) "
    "— operators/multimodal.py::_encode_jpeg_progressive / "
    "_jpeg_decode_scan. Progressive re-orders the SAME quantized "
    "coefficients baseline carries, and constant color tiles keep "
    "the DCT path distortion-free, so the ORACLE IS IDENTICAL to the "
    "baseline color row: any band/approximation/EOB-run/refinement/"
    "restart-resync bug shifts reconstructed values and breaks the "
    "shared hash.",
    tags=("multimodal",),
)
def multimodal_progressive_jpeg_decode_stats(spark, sf_dir):
    return _color_jpeg_decode_stats(spark, sf_dir, "jpeg-progressive")


@register(
    "multimodal_wav_decode_stats",
    oracle="""
    SELECT source, COUNT(*) AS n_items,
           CAST(SUM(50 + doc_id % 100) AS BIGINT) AS sum_frames,
           CAST(SUM(CAST(8000 + (doc_id % 5) * 1000 AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(1) AS avg_sample_rate,
           CAST(SUM(CAST(doc_id % 1000 - 500 AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(1) AS avg_amplitude,
           MIN((50 + doc_id % 100) * 1000.0 / (8000 + (doc_id % 5) * 1000))
               AS min_duration_ms,
           MAX((50 + doc_id % 100) * 1000.0 / (8000 + (doc_id % 5) * 1000))
               AS max_duration_ms
    FROM documents GROUP BY source
    """,
    doc="REAL audio decode end-to-end: synthesize genuine 16-bit PCM "
    "RIFF/WAVE bytes per document (operators/multimodal.py::encode_wav), "
    "parse them back with the chunk-walking WAV decoder (::decode_wav), "
    "aggregate per source. Duration is min/max (order-independent "
    "per-row doubles) and rate/amplitude averages use the exact-decimal "
    "sum so both engines agree bit-for-bit.",
    tags=("multimodal",),
)
def multimodal_wav_decode_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    media = M.synthesize_media(d, "audio", keep=("source",))
    feats = M.extract_media_features(media, keep=("source",))
    exact = lambda c: F.sum(F.col(c).cast("decimal(28,6)")).cast("double") / F.count(
        F.lit(1)
    )
    return feats.groupBy("source").agg(
        F.count("*").alias("n_items"),
        F.sum("n_units").alias("sum_frames"),
        exact("sample_rate").alias("avg_sample_rate"),
        exact("mean_value").alias("avg_amplitude"),
        F.min("duration_ms").alias("min_duration_ms"),
        F.max("duration_ms").alias("max_duration_ms"),
    )


@register(
    "multimodal_wav_ext_decode_stats",
    oracle="""
    WITH w AS (
      SELECT source, doc_id,
             doc_id % 8 AS fmt,
             40 + doc_id % 60 AS nf,
             1 + doc_id % 2 AS ch,
             8000 + (doc_id % 4) * 1000 AS rate,
             (40 + doc_id % 60) * (1 + doc_id % 2) AS n,
             255 - (doc_id // 8) % 256 AS g711u,
             xor((doc_id // 8) % 256, 85) AS g711x
      FROM documents),
    m AS (
      SELECT source, nf, rate,
             CASE fmt
               WHEN 0 THEN doc_id % 50 + (n - 1) / 2.0 - 128
               WHEN 1 THEN (doc_id % 1000 - 500) * 1000 + 17 * (n - 1) / 2.0
               WHEN 2 THEN doc_id % 200 - 100 + (n - 1) / 2.0
               WHEN 3 THEN doc_id % 1000 - 500 + (ch - 1) * 50
               WHEN 5 THEN doc_id % 800 - 400 + (ch - 1) * 38.5
               WHEN 6 THEN (CASE WHEN g711u >= 128 THEN -1 ELSE 1 END)
                 * ((g711u % 16) * 8 + 132) * POWER(2, (g711u % 128) // 16)
                 - (CASE WHEN g711u >= 128 THEN -132 ELSE 132 END)
               WHEN 7 THEN (CASE WHEN g711x >= 128 THEN 1 ELSE -1 END)
                 * (CASE WHEN (g711x % 128) // 16 = 0
                         THEN (g711x % 16) * 16 + 8
                         ELSE ((g711x % 16) * 16 + 264)
                              * POWER(2, (g711x % 128) // 16 - 1) END)
               ELSE doc_id % 400 - 200 + (n - 1) / 2.0
             END AS mean_v
      FROM w)
    SELECT source, COUNT(*) AS n_items,
           CAST(SUM(nf) AS BIGINT) AS sum_frames,
           CAST(SUM(CAST(rate AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1)
               AS avg_sample_rate,
           CAST(SUM(CAST(mean_v AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1)
               AS avg_amplitude,
           MIN(nf * 1000.0 / rate) AS min_duration_ms,
           MAX(nf * 1000.0 / rate) AS max_duration_ms
    FROM m GROUP BY source
    """,
    doc="Extended RIFF/WAVE decode across the real-corpus format axes "
    "the 16-bit row does not reach: docs cycle 8-bit unsigned PCM, "
    "24-bit PCM, IEEE float32, IMA ADPCM (format 0x11), "
    "WAVE_FORMAT_EXTENSIBLE-wrapped int16, MS ADPCM (format 2, "
    "decoded through the FILE's coefficient table), and G.711 "
    "mu-law/A-law (formats 7/6 — constant companded code bytes whose "
    "expansion the oracle recomputes with the ITU chord arithmetic, "
    "tables audioop-cross-validated) "
    "(operators/multimodal.py::encode_wav_ext / ::decode_wav). Each "
    "variant's mean amplitude has a closed form — the ADPCM rows use "
    "per-channel CONSTANT signals, which IMA reproduces EXACTLY from "
    "step index 0 (step 7 >> 3 == 0) and MS reproduces EXACTLY via "
    "coefficient pair (256, 0), so both lossy formats are pinned by "
    "lossless oracles; frame counts flow through the mandatory fact "
    "chunk, so block-padding bugs shift sum_frames. Stereo carries "
    "c/c+100 (IMA) and c/c+77 (MS) per channel, so nibble interleave "
    "bugs shift the mean.",
    tags=("multimodal",),
)
def multimodal_wav_ext_decode_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    media = M.synthesize_media(d, "wav-ext", keep=("source",))
    feats = M.extract_media_features(media, keep=("source",))
    exact = lambda c: F.sum(F.col(c).cast("decimal(28,6)")).cast("double") / F.count(
        F.lit(1)
    )
    return feats.groupBy("source").agg(
        F.count("*").alias("n_items"),
        F.sum("n_units").alias("sum_frames"),
        exact("sample_rate").alias("avg_sample_rate"),
        exact("mean_value").alias("avg_amplitude"),
        F.min("duration_ms").alias("min_duration_ms"),
        F.max("duration_ms").alias("max_duration_ms"),
    )


_FLAC_RAMP_ORACLE = """
    SELECT source, COUNT(*) AS n_items,
           CAST(SUM(64 + doc_id % 128) AS BIGINT) AS sum_frames,
           CAST(SUM(CAST(16000 + (doc_id % 4) * 4000 AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(1) AS avg_sample_rate,
           CAST(SUM(CAST((doc_id % 200 - 100)
               + (1 + doc_id % 3) * (63 + doc_id % 128) / 2.0
               AS DECIMAL(28,6))) AS DOUBLE) / COUNT(1) AS avg_amplitude,
           MIN((64 + doc_id % 128) * 1000.0 / (16000 + (doc_id % 4) * 4000))
               AS min_duration_ms,
           MAX((64 + doc_id % 128) * 1000.0 / (16000 + (doc_id % 4) * 4000))
               AS max_duration_ms
    FROM documents GROUP BY source
    """


@register(
    "multimodal_flac_decode_stats",
    oracle=_FLAC_RAMP_ORACLE,
    doc="REAL compressed-audio decode end-to-end: synthesize genuine "
    "FLAC streams per document (operators/multimodal.py::"
    "encode_flac_ramp — Rice-coded fixed/LPC subframes, mono/stereo "
    "with all three decorrelation modes cycling by id, partitioned "
    "residuals, CRC-8/16 + MD5 protected), decode them back with the "
    "spec FLAC decoder (::decode_flac / ::_flac_pcm), aggregate per "
    "source. The per-channel ramp's mean has the closed form "
    "base + slope*(n-1)/2, so any prediction/Rice/stereo-reconstruction "
    "bug shifts avg_amplitude and breaks the hash (the WAV-row oracle "
    "trick applied to a genuinely compressed codec).",
    tags=("multimodal",),
)
def multimodal_flac_decode_stats(spark, sf_dir):
    return _audio_ramp_decode_stats(spark, sf_dir, "flac")


def _audio_ramp_decode_stats(spark, sf_dir, kind):
    """Shared body of the FLAC-ramp rows (native flac / ogg-flac):
    they MUST aggregate identically — both are checked against the
    same _FLAC_RAMP_ORACLE by construction."""
    d = _t(spark, sf_dir, "documents")["documents"]
    media = M.synthesize_media(d, kind, keep=("source",))
    feats = M.extract_media_features(media, keep=("source",))
    exact = lambda c: F.sum(F.col(c).cast("decimal(28,6)")).cast("double") / F.count(
        F.lit(1)
    )
    return feats.groupBy("source").agg(
        F.count("*").alias("n_items"),
        F.sum("n_units").alias("sum_frames"),
        exact("sample_rate").alias("avg_sample_rate"),
        exact("mean_value").alias("avg_amplitude"),
        F.min("duration_ms").alias("min_duration_ms"),
        F.max("duration_ms").alias("max_duration_ms"),
    )


@register(
    "multimodal_ogg_flac_decode_stats",
    oracle=_FLAC_RAMP_ORACLE,
    doc="Ogg TRANSPORT decoded end-to-end (RFC 3533 + the Xiph "
    "FLAC-to-Ogg mapping): the same per-document FLAC ramps wrapped "
    "into real Ogg pages (operators/multimodal.py::encode_ogg_flac — "
    "lacing tables incl. the 255-multiple zero terminator, packets "
    "spanning pages with continuation flags, BOS/EOS, page CRC-32s; "
    "page and packet sizes cycle per doc so every transport shape "
    "occurs in-corpus), reassembled back to a byte-exact native "
    "stream (::_ogg_packets) and decoded by the spec FLAC decoder. "
    "The ORACLE IS IDENTICAL to the native-FLAC row by construction — "
    "any lacing/continuation/reassembly bug corrupts the stream and "
    "breaks the shared hash. Vorbis/Opus mappings remain precise "
    "loud boundaries.",
    tags=("multimodal",),
)
def multimodal_ogg_flac_decode_stats(spark, sf_dir):
    return _audio_ramp_decode_stats(spark, sf_dir, "ogg-flac")


_AVI_YCC_CHAIN = """
    ycc AS (
      SELECT * ,
             FLOOR(0.299::DOUBLE * r + 0.587::DOUBLE * g
                   + 0.114::DOUBLE * b + 0.5::DOUBLE) AS y,
             FLOOR(128.0::DOUBLE - 0.168736::DOUBLE * r
                   - 0.331264::DOUBLE * g + 0.5::DOUBLE * b
                   + 0.5::DOUBLE) AS cb,
             FLOOR(128.0::DOUBLE + 0.5::DOUBLE * r
                   - 0.418688::DOUBLE * g - 0.081312::DOUBLE * b
                   + 0.5::DOUBLE) AS cr
      FROM rgb),
    back AS (
      SELECT *,
             GREATEST(0.0::DOUBLE, LEAST(255.0::DOUBLE,
               FLOOR(y + 1.402::DOUBLE * (cr - 128.0::DOUBLE)
                     + 0.5::DOUBLE)))
             + GREATEST(0.0::DOUBLE, LEAST(255.0::DOUBLE,
               FLOOR(y - 0.344136::DOUBLE * (cb - 128.0::DOUBLE)
                     - 0.714136::DOUBLE * (cr - 128.0::DOUBLE)
                     + 0.5::DOUBLE)))
             + GREATEST(0.0::DOUBLE, LEAST(255.0::DOUBLE,
               FLOOR(y + 1.772::DOUBLE * (cb - 128.0::DOUBLE)
                     + 0.5::DOUBLE))) AS rgb_sum
      FROM ycc)
"""


@register(
    "multimodal_avi_decode_stats",
    oracle="""
    WITH f AS (
      SELECT source, doc_id,
             unnest(range(0, 2 + doc_id % 4)) AS i
      FROM documents),
    rgb AS (
      SELECT source, doc_id,
             CAST((doc_id * 7 + i * 31) % 251 AS DOUBLE) AS r,
             CAST((doc_id * 11 + i * 17) % 251 AS DOUBLE) AS g,
             CAST((doc_id * 13 + i * 23) % 251 AS DOUBLE) AS b
      FROM f),
    """ + _AVI_YCC_CHAIN + """,
    perdoc AS (
      SELECT source, doc_id, SUM(rgb_sum) AS rgb_sum, COUNT(*) AS nf
      FROM back GROUP BY source, doc_id)
    SELECT source, COUNT(*) AS n_items,
           CAST(SUM(nf) AS BIGINT) AS sum_frames,
           CAST(SUM(CAST(10 + doc_id % 15 AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(1) AS avg_fps,
           CAST(SUM(CAST(rgb_sum AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(1) AS avg_rgb_sum,
           MIN(nf * 1000.0 / (10 + doc_id % 15)) AS min_duration_ms,
           MAX(nf * 1000.0 / (10 + doc_id % 15)) AS max_duration_ms
    FROM perdoc GROUP BY source
    """,
    doc="REAL video decode end-to-end: synthesize genuine MJPEG AVI "
    "containers per document (operators/multimodal.py::"
    "encode_avi_sample — RIFF hdrl/strl headers, movi '00dc' chunks, "
    "idx1 index; every frame a complete constant-color baseline "
    "JPEG whose color drifts per frame index), decode them back "
    "(::decode_avi — container walk, header/idx1 cross-validation, "
    "per-frame JPEG decode), aggregate per source. Constant tiles "
    "keep the DCT path distortion-free, so the oracle replicates the "
    "RGB→YCbCr→RGB integer chain per (doc, frame) over an unnested "
    "frame series — a movi walk that drops, reorders, or double-"
    "counts chunks breaks the hash.",
    tags=("multimodal",),
)
def multimodal_avi_decode_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    media = M.synthesize_media(d, "video", keep=("source",))
    feats = M.extract_media_features(media, keep=("source",))
    exact = lambda c: F.sum(F.col(c).cast("decimal(28,6)")).cast("double") / F.count(
        F.lit(1)
    )
    # mean_value is (Σ_frames rgb_sum/3)/n — multiply back to the exact
    # integer total so the decimal-cast discipline stays lossless
    feats = feats.withColumn(
        "rgb_sum_total", F.round(F.col("mean_value") * 3 * F.col("n_units"), 0)
    )
    return feats.groupBy("source").agg(
        F.count("*").alias("n_items"),
        F.sum("n_units").alias("sum_frames"),
        exact("sample_rate").alias("avg_fps"),
        exact("rgb_sum_total").alias("avg_rgb_sum"),
        F.min("duration_ms").alias("min_duration_ms"),
        F.max("duration_ms").alias("max_duration_ms"),
    )


@register(
    "multimodal_video_frame_stats",
    oracle="""
    WITH f AS (
      SELECT doc_id, unnest(range(0, 2 + doc_id % 4)) AS i
      FROM documents WHERE doc_id < 200),
    rgb AS (
      SELECT doc_id, i,
             CAST((doc_id * 7 + i * 31) % 251 AS DOUBLE) AS r,
             CAST((doc_id * 11 + i * 17) % 251 AS DOUBLE) AS g,
             CAST((doc_id * 13 + i * 23) % 251 AS DOUBLE) AS b
      FROM f),
    """ + _AVI_YCC_CHAIN + """
    SELECT doc_id, i AS frame_index,
           8 * (1 + doc_id % 3) AS width,
           8 * (1 + doc_id % 2) AS height,
           rgb_sum
    FROM back
    """,
    doc="Frame-extraction fan-out with a REAL codec (the video analog "
    "of the frame-sampling shape): decode each AVI's movi chunks to "
    "one row PER FRAME (1 input row → n_frames rows, fan-out inside "
    "the Arrow batch — payload bytes never shuffle), reconstructed "
    "per-frame pixel stats exact against the per-(doc, frame) YCbCr "
    "round-trip. The doc_id < 200 probe filter is pushed below the "
    "synthesis/decode UDFs onto the parquet scan.",
    tags=("multimodal",),
)
def multimodal_video_frame_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"].filter(F.col("doc_id") < 200)
    media = M.synthesize_media(d, "video")
    frames = M.video_frame_stats(media)
    return frames.select(
        "doc_id", "frame_index", "width", "height",
        F.round(F.col("frame_mean") * 3, 0).alias("rgb_sum"),
    )


@register(
    "embedding_near_dup_pairs",
    property_test="tests/test_dedup_similarity.py::test_embedding_near_dup_pairs_finds_planted",
    oracle=None,  # LSH bucketing not SQL-expressible; planted-dup recall
    # and exact-cosine verification are property-tested in pytest
    doc="Embedding-cosine near-duplicate pairs via LSH bucket candidate "
    "generation + exact cosine verify (operators/dedup.py::"
    "embedding_near_dup_pairs — the E2 scale path: quadratic work only "
    "within capped buckets, verify touches candidates only). Threshold "
    "0.45 is calibrated to the synthetic embeddings table, whose max "
    "pairwise cosine is ~0.51 (no planted duplicates).",
    tags=("dedup", "similarity", "lsh"),
)
def embedding_near_dup_pairs(spark, sf_dir):
    from ..operators.dedup import embedding_near_dup_pairs as _pairs

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    idx = _lsh_index(spark, sf_dir, e)
    return _pairs(e, threshold=0.45, index=idx).orderBy("id_a", "id_b")


_POLY = [(30.0, 0.0), (0.0, 60.0), (-30.0, 0.0), (0.0, -60.0)]


def _poly_crossing_sql(poly: list[tuple[float, float]] = _POLY) -> str:
    terms = []
    n = len(poly)
    for i in range(n):
        y1, x1 = poly[i]
        y2, x2 = poly[(i + 1) % n]
        if y1 == y2:
            continue
        slope = (x2 - x1) / (y2 - y1)
        terms.append(
            f"CASE WHEN (({y1!r} > lat) <> ({y2!r} > lat)) AND "
            f"(lon < (lat - {y1!r}) * {slope!r} + {x1!r}) "
            "THEN 1 ELSE 0 END"
        )
    return " + ".join(terms)


@register(
    "geo_polygon_filter",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey, {_GEO_LAT} AS lat, {_GEO_LON} AS lon FROM customer)
    SELECT c_custkey, lat, lon FROM pts
    WHERE ({_poly_crossing_sql()}) % 2 = 1
    """,
    doc="geo_polygon DSL filter (functions/geo.py::point_in_polygon_"
    "pred): even-odd ray casting as a FIXED comparison chain over the "
    "request-constant vertices — whole-stage codegen, no geometry "
    "library; oracle runs the identical edge arithmetic (same Python-"
    "precomputed slopes in both SQL texts → IEEE-identical crossings).",
    tags=("dsl", "geo"),
)
def geo_polygon_filter(spark, sf_dir):
    from ..operators.search import execute_search

    pts = _geo_points(spark, sf_dir)
    hits = execute_search(pts, {"query": {"geo_polygon": {"location": {
        "points": [{"lat": la, "lon": lo} for la, lo in _POLY],
    }}}})["hits"]
    return hits.select(
        "c_custkey",
        F.col("location.lat").alias("lat"),
        F.col("location.lon").alias("lon"),
    )


@register(
    "embedding_decontamination",
    oracle=f"""
    WITH bench AS (
      SELECT embedding AS bv FROM embeddings WHERE vec_id % 50 = 0),
    scored AS (
      SELECT e.vec_id, MAX({_cos('e.embedding', 'b.bv')}) AS mc
      FROM embeddings e, bench b GROUP BY e.vec_id)
    SELECT vec_id, ROUND(mc, 9) AS max_benchmark_cosine,
           mc >= 0.95 AS contaminated
    FROM scored
    """,
    doc="Semantic decontamination (operators/curate.py::"
    "embedding_decontaminate): max cosine of every corpus embedding "
    "against a BROADCAST benchmark set (10 vectors here; eval sets are "
    "benchmark-sized, the corpus never shuffles) — flags paraphrased "
    "eval leakage the n-gram decontaminator cannot see. Cosine summed "
    "in array order on both engines; reported values rounded to 9.",
    tags=("pipeline", "embedding", "decontamination"),
)
def embedding_decontamination(spark, sf_dir):
    from ..operators.curate import embedding_decontaminate

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    bench = e.filter(F.col("vec_id") % 50 == 0)
    return embedding_decontaminate(e, bench, threshold=0.95)


@register(
    "knn_l2_search",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7)
    SELECT e.vec_id, e.label,
           1.0 / (1.0 + {_fold(
               "list_transform(generate_series(1, len(e.embedding)), "
               "i -> (CAST(e.embedding[i] AS DOUBLE)"
               " - CAST(q.qv[i] AS DOUBLE))"
               " * (CAST(e.embedding[i] AS DOUBLE)"
               " - CAST(q.qv[i] AS DOUBLE)))")}) AS _score
    FROM embeddings e, q
    ORDER BY _score DESC, e.vec_id ASC LIMIT 10
    """,
    doc="`knn` with space_type=l2 (operators/search.py::_execute_knn): "
    "the plugin's 1/(1+d²) score transform over exact squared "
    "euclidean distance — same scan → project → TakeOrdered plan as "
    "the cosine space, identical left-fold accumulation order in both "
    "engines so scores hash-match exactly.",
    tags=("dsl", "similarity", "topk"),
)
def knn_l2_search(spark, sf_dir):
    from ..operators.search import execute_search

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    qvec = [float(x) for x in
            e.filter(F.col("vec_id") == 7).select("embedding").head()[0]]
    body = {"query": {"knn": {"embedding": {
        "vector": qvec, "k": 10, "space_type": "l2",
        "tie_break": "vec_id",
    }}}}
    return execute_search(e, body)["hits"].select("vec_id", "label", "_score")


@register(
    "multimodal_resize_stats",
    oracle="""
    SELECT source, COUNT(*) AS n_items,
           CAST(COUNT(*) * 16 AS BIGINT) AS sum_pixels,
           CAST(SUM(CAST(doc_id % 251 AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(1) AS avg_pixel,
           CAST(COUNT(*) * 102 AS BIGINT) AS sum_payload_bytes
    FROM documents GROUP BY source
    """,
    doc="REAL image resize end-to-end: synthesize genuine 24-bit BMPs "
    "(geometry/pixel closed-form in doc_id), nearest-neighbor resample "
    "every payload to 4x4 (operators/multimodal.py::resize_images — "
    "numpy index gather over the decoded pixel grid), decode the "
    "RESIZED bytes back and aggregate per source. The oracle states "
    "the invariants a correct resize must satisfy: 16 pixels each, a "
    "102-byte file (54-byte headers + 4x4x3 rows, zero padding), and "
    "the uniform source pixel value surviving resampling exactly. "
    "Payload bytes never leave the executors.",
    tags=("multimodal",),
)
def multimodal_resize_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")["documents"]
    media = M.synthesize_media(d, "image", keep=("source",))
    resized = M.resize_images(media, 4, 4)
    feats = M.extract_media_features(resized, keep=("source",))
    exact = lambda c: F.sum(F.col(c).cast("decimal(28,6)")).cast(
        "double") / F.count(F.lit(1))
    return feats.groupBy("source").agg(
        F.count("*").alias("n_items"),
        F.sum("n_units").alias("sum_pixels"),
        exact("mean_value").alias("avg_pixel"),
        F.sum("n_bytes").alias("sum_payload_bytes"),
    )


def _binary_word_sql(vec: str, w: int, bits: int = 32) -> str:
    """Identical-arithmetic DuckDB twin of one signature word of
    ``operators.similarity.binary_signature`` (sum of distinct powers
    of two — exact integers, association-free)."""
    terms = " + ".join(
        f"(CASE WHEN {vec}[{w * bits + i + 1}] > 0 "
        f"THEN {1 << i}::BIGINT ELSE 0::BIGINT END)"
        for i in range(bits)
    )
    return f"({terms})"


@register(
    "ann_binary_hamming_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    sig AS (
      SELECT e.vec_id, e.embedding,
             bit_count(xor({_binary_word_sql('e.embedding', 0)},
                           {_binary_word_sql('q.qv', 0)}))
             + bit_count(xor({_binary_word_sql('e.embedding', 1)},
                             {_binary_word_sql('q.qv', 1)})) AS hamming
      FROM embeddings e, q),
    cand AS (
      SELECT vec_id, embedding, hamming
      FROM sig ORDER BY hamming ASC, vec_id ASC LIMIT 40)
    SELECT c.vec_id, c.hamming, {_cos('c.embedding', 'q.qv')} AS score
    FROM cand c, q
    ORDER BY score DESC, c.vec_id ASC LIMIT 10
    """,
    doc="Binary-quantized ANN (operators/similarity.py::"
    "binary_hamming_topk): sign-bit codes — 64 floats → two 32-bit "
    "words in longs — shortlist 40 candidates by Hamming distance "
    "(xor + popcount, pure codegen), exact cosine re-ranks the "
    "shortlist. The public kNN binary-vector space shape: at 100 TB "
    "the shortlist TakeOrdered shuffles 40 rows, and a persisted "
    "signature table shrinks the scan to 8 bytes/vector (32x). The "
    "oracle mirrors the packing word-for-word (distinct powers of "
    "two — exact integers) and the cosine fold term-for-term.",
    tags=("similarity", "topk"),
)
def ann_binary_hamming_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    qvec = [float(x) for x in
            e.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    return S.binary_hamming_topk(e, qvec, k=10, candidates=40)
