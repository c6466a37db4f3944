"""BM25 relevance scoring for analyzed match queries (SURVEY §2.7).

The reference's OpenSearch collection is a SEARCH-type collection
(lib/opensearch-dynamodb-etl-cdk-stack.ts:88-92): queries POSTed to it
are ranked by Lucene BM25, not just filtered. The DSL interpreter in
operators/search.py deliberately implements the filter algebra (scores
don't change which documents match); this module adds the scoring tier
— the same Lucene BM25 formula, expressed as ONE declarative Spark
plan:

    idf(t)  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    score   = Σ_t idf(t) · tf_t·(k1+1) / (tf_t + k1·(1 − b + b·dl/avgdl))

with k1 = 1.2, b = 0.75 (Lucene defaults).

Scale shape (100 TB): corpus statistics (N, avgdl, one df per query
term) reduce to a SINGLE one-row aggregate — a map-side-combined pass
over the corpus — which joins back in as a broadcast. Per-document
term frequencies are codegen array expressions over the analyzed
tokens; the final top-k is TakeOrderedAndProject. Two corpus passes
total (stats + score), zero shuffles of document bodies; the stats
pass reduces to one row per partition before the combine. For a
standing corpus the stats row can be persisted and reused across
queries — pass ``stats`` to skip the first pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .search import _analyze, _analyze_text

K1 = 1.2
B = 0.75


def corpus_stats(df: DataFrame, field: str, terms: list[str]) -> DataFrame:
    """One-row frame: corpus size ``_n``, average analyzed doc length
    ``_avgdl``, and document frequency ``_df_<term>`` per query term —
    everything BM25 needs from the corpus, in one aggregate pass.

    The df columns are named BY TERM (analyzed tokens are ``[a-z0-9_]``
    so they are valid column names), not positionally: reusing a
    persisted stats frame with a query it wasn't built for fails fast
    with an unresolved-column error instead of silently reading another
    term's document frequency. Only ``_n``/``_avgdl`` are
    query-independent."""
    toks = _analyze(F.col(field))
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.avg(F.size(toks)).alias("_avgdl"),
    ]
    for t in terms:
        aggs.append(
            F.sum(F.array_contains(toks, t).cast("long")).alias(f"_df_{t}")
        )
    return df.agg(*aggs)


def _idf(n: Column, df_t: Column) -> Column:
    return F.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))


def score_match_bm25(
    df: DataFrame,
    field: str,
    query: str,
    k1: float = K1,
    b: float = B,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Score every document matching ANY analyzed query term (OR match
    semantics) with Lucene BM25; returns the input columns plus
    ``_score``. Callers top-k with ``orderBy(desc("_score"), <id>)`` —
    which collapses to TakeOrderedAndProject, never a sort of the
    corpus."""
    # dedupe (order-preserving): each unique term scores once, and the
    # per-term _df_<term> stats columns must be unique
    terms = list(dict.fromkeys(_analyze_text(query)))
    if not terms:
        raise ValueError("score_match_bm25: query analyzed to zero terms")
    if stats is None:
        stats = corpus_stats(df, field, terms)

    toks = _analyze(F.col(field))
    scored = df.withColumn("_toks", toks).withColumn(
        "_dl", F.size("_toks").cast("double")
    )
    # broadcast the one-row stats frame — a dimension join of width 1
    scored = scored.crossJoin(F.broadcast(stats))

    n = F.col("_n").cast("double")
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl")
    )
    def _tf(term: str) -> Column:
        # NB: the lambda must take exactly one arg — a second parameter
        # (even defaulted) makes F.filter pass the element INDEX into it
        return F.size(F.filter(F.col("_toks"), lambda x: x == term)).cast(
            "double"
        )

    score = F.lit(0.0)
    for t in terms:
        tf = _tf(t)
        contrib = _idf(n, F.col(f"_df_{t}").cast("double")) * (
            tf * F.lit(k1 + 1.0) / (tf + norm)
        )
        score = score + F.when(tf > 0, contrib).otherwise(F.lit(0.0))

    drop = ["_toks", "_dl", "_n", "_avgdl"] + [f"_df_{t}" for t in terms]
    return (
        scored.withColumn("_score", score)
        .filter(F.col("_score") > 0)
        .drop(*drop)
    )


def score_multi_match_bm25(
    df: DataFrame,
    fields: list[str],
    query: str,
    type_: str = "best_fields",
    tie_breaker: float = 0.0,
    k1: float = K1,
    b: float = B,
    stats_frame: DataFrame | None = None,
) -> DataFrame:
    """Scored ``multi_match``: per-field Lucene BM25 combined with the
    public field-combination rules — ``best_fields`` takes the best
    field's score plus ``tie_breaker`` × the other fields' scores
    (dis_max semantics), ``most_fields`` sums them. Per-field boosts
    (``"title^2"``) multiply that field's score before combining.

    One aggregate pass computes corpus stats for ALL fields (shared N,
    per-field avgdl, per-(field, term) document frequency), broadcast
    as a 1-row frame; every per-field score is then pure codegen over
    the analyzed token arrays — one scan, no shuffle beyond the
    caller's top-k."""
    parsed = [
        (f.split("^")[0], float(f.split("^")[1]) if "^" in str(f) else 1.0)
        for f in (str(f) for f in fields)
    ]
    terms = list(dict.fromkeys(_analyze_text(query)))
    if not terms:
        raise ValueError("score_multi_match_bm25: query analyzed to "
                         "zero terms")
    if type_ not in ("best_fields", "most_fields"):
        raise ValueError(
            f"scored multi_match supports best_fields/most_fields, "
            f"got {type_!r}"
        )
    # positional aliases (_avgdl_0, _df_0_1): NAME-concatenated aliases
    # can collide across (field, term) pairs whose joined strings are
    # equal ('f'+'g_h' vs 'f_g'+'h') and blow up as ambiguous columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for fi, (fname, _) in enumerate(parsed):
        toks = _analyze(F.col(fname))
        aggs.append(F.avg(F.size(toks)).alias(f"_avgdl_{fi}"))
        for ti, t in enumerate(terms):
            aggs.append(
                F.sum(F.array_contains(toks, t).cast("long"))
                .alias(f"_df_{fi}_{ti}")
            )
    # idf must see the CORPUS, not a query-filtered subset — callers
    # scoring pre-filtered hits pass the full frame as stats_frame
    stats = (stats_frame if stats_frame is not None else df).agg(*aggs)
    scored = df.crossJoin(F.broadcast(stats))
    n = F.col("_n").cast("double")
    field_scores = []
    for fi, (fname, boost) in enumerate(parsed):
        toks = _analyze(F.col(fname))
        dl = F.size(toks).cast("double")
        norm = F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * dl / F.col(f"_avgdl_{fi}")
        )
        def _tf(term: str, _toks=toks) -> Column:
            # one-arg lambda only: a second (even defaulted) parameter
            # makes F.filter pass the element INDEX into it. The lambda
            # is invoked eagerly inside F.filter, so capturing `term`
            # from this helper's scope is safe.
            return F.size(
                F.filter(_toks, lambda x: x == term)
            ).cast("double")

        score = F.lit(0.0)
        for ti, t in enumerate(terms):
            tf = _tf(t)
            contrib = _idf(n, F.col(f"_df_{fi}_{ti}").cast("double")) * (
                tf * F.lit(k1 + 1.0) / (tf + norm)
            )
            score = score + F.when(tf > 0, contrib).otherwise(F.lit(0.0))
        field_scores.append(score * F.lit(float(boost)))
    if len(field_scores) == 1:
        combined = field_scores[0]
    elif type_ == "most_fields":
        combined = field_scores[0]
        for s in field_scores[1:]:
            combined = combined + s
    else:  # best_fields: max + tie_breaker * (sum - max)
        best = F.greatest(*field_scores)
        total = field_scores[0]
        for s in field_scores[1:]:
            total = total + s
        combined = best + F.lit(float(tie_breaker)) * (total - best)
    drop = ["_n"] + [f"_avgdl_{fi}" for fi in range(len(parsed))] + [
        f"_df_{fi}_{ti}"
        for fi in range(len(parsed)) for ti in range(len(terms))
    ]
    return (
        scored.withColumn("_score", combined)
        .filter(F.col("_score") > 0)
        .drop(*drop)
    )


def more_like_this(
    df: DataFrame,
    field: str,
    like: str | None = None,
    like_id=None,
    id_col: str = "doc_id",
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
    max_query_terms: int = 25,
    minimum_should_match: str | int = "30%",
) -> DataFrame:
    """OpenSearch ``more_like_this``: find documents similar to a given
    text (``like``) or document (``like_id``). Per the public MLT
    contract: candidate terms are the like-text's analyzed tokens with
    within-text tf ≥ ``min_term_freq``; candidates below ``min_doc_freq``
    corpus document frequency drop; the remaining terms rank by
    tf·idf (Lucene idf, ties broken by term) and the top
    ``max_query_terms`` become a ``should`` disjunction guarded by
    ``minimum_should_match`` — resolved against the SELECTED term count
    and clamped to at least 1, so a small selection under a percentage
    spec (e.g. 3 terms at "30%" → floor 0.9 = 0) still requires one
    shared term: MLT never degenerates to match-all.

    Corpus statistics (N + one df per candidate term) reduce to a
    SINGLE one-row aggregate whose collect is one row of ≤
    |candidates| + 1 integers — the driver-side term selection is the
    analog of similarity.py::query_signatures (microseconds of Python,
    never a corpus shuffle). The returned frame is the corpus filtered
    by the compiled disjunction — one more scan, predicate fully
    pushable."""
    import math

    from .search import _min_should_count, compile_query

    if (like is None) == (like_id is None):
        raise ValueError("more_like_this: pass exactly one of like / like_id")
    if like is None:
        row = df.filter(F.col(id_col) == like_id).select(field).head()
        if row is None:
            raise ValueError(f"more_like_this: no row with {id_col}={like_id!r}")
        like = row[0]

    toks = _analyze_text(str(like))
    tf = {t: toks.count(t) for t in set(toks)}
    cand = sorted(t for t, c in tf.items() if c >= min_term_freq)
    if not cand:
        raise ValueError(
            "more_like_this: no candidate term reaches min_term_freq"
        )

    atoks = _analyze(F.col(field))
    stats = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.array_contains(atoks, t).cast("long")).alias(f"_df_{t}")
            for t in cand
        ],
    ).head()
    n = float(stats["_n"])
    scored = []
    for t in cand:
        d = float(stats[f"_df_{t}"])
        if d >= min_doc_freq:
            idf = math.log(1.0 + (n - d + 0.5) / (d + 0.5))
            scored.append((tf[t] * idf, t))
    if not scored:
        raise ValueError("more_like_this: every candidate is below min_doc_freq")
    sel = [t for _, t in sorted(scored, key=lambda s: (-s[0], s[1]))[:max_query_terms]]

    msm = max(1, _min_should_count(minimum_should_match, len(sel)))
    clause = {"bool": {
        "should": [{"match": {field: t}} for t in sel],
        "minimum_should_match": msm,
    }}
    pred = compile_query(clause)
    if like_id is not None:
        pred = pred & (F.col(id_col) != F.lit(like_id))
    return df.filter(pred)


def decay_score(
    kind: str,
    value: Column,
    origin: float,
    scale: float,
    offset: float = 0.0,
    decay: float = 0.5,
) -> Column:
    """``function_score`` decay curve over a numeric distance — the
    public gauss/exp/linear contract:

        dist      = max(0, |value − origin| − offset)
        gauss     = exp(−dist² / 2σ²),  σ² = −scale² / (2·ln decay)
        exp       = exp(ln(decay)/scale · dist)
        linear    = max(0, (s − dist)/s),  s = scale / (1 − decay)

    so the curve is 1 inside ``offset`` of the origin and exactly
    ``decay`` at distance ``scale``. Dates decay by passing a day/ms
    distance column (e.g. ``F.datediff``) as ``value`` with a numeric
    origin — same shape as the public date variant. Pure column
    arithmetic: no extra pass, no shuffle, codegen-friendly. A NULL
    value yields NULL (callers treat missing as decay 1.0 — see
    :func:`apply_decay`)."""
    import math

    if not (0.0 < decay < 1.0):
        raise ValueError(f"decay must be in (0, 1), got {decay}")
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    dist = F.greatest(
        F.abs(value.cast("double") - F.lit(float(origin))) - F.lit(float(offset)),
        F.lit(0.0),
    )
    if kind == "gauss":
        sigma2 = -(float(scale) ** 2) / (2.0 * math.log(decay))
        return F.exp(-(dist * dist) / F.lit(2.0 * sigma2))
    if kind == "exp":
        lam = math.log(decay) / float(scale)
        return F.exp(F.lit(lam) * dist)
    if kind == "linear":
        s = float(scale) / (1.0 - decay)
        return F.greatest((F.lit(s) - dist) / F.lit(s), F.lit(0.0))
    raise ValueError(f"unsupported decay kind {kind!r} (gauss/exp/linear)")


def apply_decay(
    scored: DataFrame,
    kind: str,
    field: str | Column,
    origin: float,
    scale: float,
    offset: float = 0.0,
    decay: float = 0.5,
) -> DataFrame:
    """``function_score`` decay applied multiplicatively to ``_score``
    (multiply boost_mode, the public default). Documents missing the
    field keep their score (decay 1.0), per the public contract."""
    value = F.col(field) if isinstance(field, str) else field
    d = decay_score(kind, value, origin, scale, offset, decay)
    return scored.withColumn(
        "_score", F.col("_score") * F.coalesce(d, F.lit(1.0))
    )


def field_value_factor(
    scored: DataFrame,
    field: str,
    factor: float = 1.0,
    modifier: str = "none",
    missing: float = 1.0,
) -> DataFrame:
    """``function_score``'s field_value_factor over an already-scored
    frame: ``_score ×= modifier(factor · field)``. Modifiers: none,
    log1p, sqrt, square — pure column arithmetic, no extra pass."""
    v = F.coalesce(F.col(field).cast("double"), F.lit(missing)) * F.lit(factor)
    if modifier == "log1p":
        v = F.log(F.lit(1.0) + v)
    elif modifier == "sqrt":
        v = F.sqrt(v)
    elif modifier == "square":
        v = v * v
    elif modifier != "none":
        raise ValueError(f"unsupported field_value_factor modifier {modifier!r}")
    return scored.withColumn("_score", F.col("_score") * v)


def rrf_fuse(
    frames: list[DataFrame],
    id_cols: list[str],
    k: int = 60,
    window: int = 100,
    size: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion — the hybrid-search combiner (public
    hybrid query with an RRF processor): each sub-ranking contributes
    1/(k + rank) per document; documents missing from a sub-ranking's
    window contribute nothing there.

    Each input frame must carry ``_score``. Ranks are assigned over the
    top-``window`` rows only (the public rank_window_size contract):
    TakeOrdered bounds the frame to ``window`` rows FIRST, so the
    rank-assigning global window runs over ≤ window rows — bounded
    single-task state by design, never a global sort of the corpus. The
    fusion itself is a union + one groupBy on the id (shuffle =
    |subqueries| × window rows, trivially small), then TakeOrdered
    top-``size``. Ties break on the id columns at every step so the
    fused ranking is deterministic. The fused score is rounded to 9
    decimals: contributions are transcendental-free rationals but their
    sum order across subqueries is not fixed."""
    from pyspark.sql import Window as W

    order = lambda: [F.col("_score").desc()] + [  # noqa: E731
        F.col(c).asc() for c in id_cols
    ]
    parts = []
    for f in frames:
        top = f.select(*id_cols, "_score").orderBy(*order()).limit(window)
        ranked = top.withColumn(
            "__rank", F.row_number().over(W.orderBy(*order()))
        )
        parts.append(
            ranked.select(
                *id_cols,
                (1.0 / (F.lit(float(k)) + F.col("__rank"))).alias("__c"),
            )
        )
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    return (
        allc.groupBy(*id_cols)
        .agg(
            F.round(F.sum("__c"), 9).alias("_score"),
            F.count("*").alias("matched_subqueries"),
        )
        .orderBy(*order())
        .limit(size)
    )
