"""Deterministic sampling, train/test splitting, and corpus shuffling
for training-data pipelines.

``df.sample()`` is seed-deterministic only for a fixed partitioning —
a different split plan changes the sample, which breaks resumable
pipelines and oracle checks. Everything here derives membership from a
HASH OF THE ROW KEY instead: the same row lands in the same split on
any cluster, any partitioning, any engine (md5 is used for the
membership hash so the DuckDB oracle computes the identical sample).

Scale notes: membership is a per-row expression (no shuffle, no state);
the global shuffle for training order is one sort by a hash key —
Spark's range-partitioned sort, the only shuffle any of these ops do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(id_col: Column, n_buckets: int = 100) -> Column:
    """Engine-portable deterministic bucket in [0, n_buckets): first 8
    hex chars of md5(id) as an integer, mod n_buckets."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(n_buckets))


def deterministic_sample(
    df: DataFrame, fraction_pct: int, id_col: str = "doc_id"
) -> DataFrame:
    """Keep rows whose hash bucket < fraction_pct (an exact, repeatable
    fraction_pct% sample — same rows forever, independent of plan)."""
    return df.filter(hash_bucket(F.col(id_col)) < fraction_pct)


def train_test_split(
    df: DataFrame, test_pct: int = 10, id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, deterministic (train, test) split."""
    b = hash_bucket(F.col(id_col))
    return df.filter(b >= test_pct), df.filter(b < test_pct)


def stratified_sample(
    df: DataFrame,
    fractions_pct: dict[str, int],
    stratum_col: str,
    id_col: str = "doc_id",
    default_pct: int = 0,
) -> DataFrame:
    """Deterministic per-stratum sampling: each stratum keeps its own
    hash-bucket fraction (e.g. downsample over-represented languages).
    Membership is still a per-row expression — no shuffle, and a row's
    fate never changes as other strata grow."""
    pct = None
    for value, p in fractions_pct.items():
        cond = F.col(stratum_col) == F.lit(value)
        pct = F.when(cond, F.lit(p)) if pct is None else pct.when(cond, F.lit(p))
    pct = F.lit(default_pct) if pct is None else pct.otherwise(F.lit(default_pct))
    return df.filter(hash_bucket(F.col(id_col)) < pct)


def shuffle_for_training(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str | None = None,
    key: str = "xxhash64",
) -> DataFrame:
    """Global deterministic shuffle: sort by a hash of (seed, id). One
    range-partitioned sort; output order is stable across runs (unlike
    ``orderBy(rand())``) and re-seedable per epoch (``seed="epoch3"``
    gives a different but equally stable order). ``key="xxhash64"``
    (default, cheapest) or ``"md5"`` (engine-portable — the DuckDB
    oracle reproduces the identical order)."""
    if key not in ("xxhash64", "md5"):
        raise ValueError(f"shuffle_for_training: unknown key {key!r}")
    salted = (
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
        if seed is not None
        else F.col(id_col).cast("string")
    )
    h = F.xxhash64(salted) if key == "xxhash64" else F.md5(salted)
    return df.orderBy(h, F.col(id_col))


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str | None = None,
    key_col: str = "_sample_key",
) -> DataFrame:
    """Seeded weighted sampling WITHOUT replacement (the
    Efraimidis–Spirakis A-ES scheme): every row draws a deterministic
    uniform ``u ∈ (0, 1]`` from md5(seed:id) — 13 hex chars = 52
    mantissa bits, exact in a double on any engine — and ranks by
    ``key = u^(1/w)``; the top-k keys ARE a weighted sample without
    replacement (inclusion probability proportional to weight, the
    published A-ES result). Heavier rows draw keys nearer 1.

    Scale shape: the key is a per-row expression and the top-k is
    TakeOrderedAndProject — no shuffle of the corpus, no state, and the
    same sample on any partitioning/cluster/engine (unlike
    ``df.sample``/``rand()``). Re-seedable per epoch. Rows with
    non-positive weight are excluded (inclusion probability 0). The
    ranking key is kept in ``key_col`` for auditability.
    """
    salted = (
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
        if seed is not None
        else F.col(id_col).cast("string")
    )
    v = F.conv(F.substring(F.md5(salted), 1, 13), 16, 10).cast("long")
    u = (v + F.lit(1)).cast("double") / F.lit(float(1 << 52))
    w = F.col(weight_col).cast("double")
    return (
        df.filter(w > 0)
        .withColumn(key_col, F.pow(u, F.lit(1.0) / w))
        .orderBy(F.col(key_col).desc(), F.col(id_col).asc())
        .limit(k)
    )


def mixture_resample(
    df: DataFrame,
    targets: dict[str, float],
    mix_col: str = "lang",
    id_col: str = "doc_id",
    resolution: int = 10_000,
) -> DataFrame:
    """Downsample a corpus to a target domain/language mixture.

    Given target weights (e.g. ``{"en": .4, "es": .2, ...}``), the
    achievable corpus size is set by the most over-demanded group:
    ``budget = min(count_g / weight_g)``. Each group keeps
    ``budget * weight_g`` rows via the deterministic md5 bucket (so the
    kept set is stable across runs/engines) and the output realizes the
    target mixture as closely as ``resolution`` allows, keeping the
    limiting group intact.

    Shape: one count aggregation over the mixture column (tiny result),
    the scalar budget and per-group thresholds derived from it and
    BROADCAST back onto the corpus — the corpus itself never shuffles;
    membership stays a per-row filter. Groups absent from ``targets``
    are dropped (weight 0).
    """
    w_expr = None
    for value, w in targets.items():
        cond = F.col(mix_col) == F.lit(value)
        w_expr = F.when(cond, F.lit(float(w))) if w_expr is None else w_expr.when(
            cond, F.lit(float(w))
        )
    w_expr = w_expr.otherwise(F.lit(0.0))

    counts = (
        df.filter(w_expr > 0)
        .groupBy(mix_col)
        .agg(F.count("*").alias("__n"))
        .withColumn("__w", w_expr)
    )
    budget = counts.agg(
        F.min(F.col("__n").cast("double") / F.col("__w")).alias("__budget")
    )
    thresholds = (
        counts.crossJoin(F.broadcast(budget))
        .select(
            mix_col,
            F.floor(
                F.col("__budget") * F.col("__w") / F.col("__n").cast("double")
                * F.lit(resolution)
            ).alias("__thr"),
        )
    )
    return (
        df.join(F.broadcast(thresholds), mix_col)
        .filter(hash_bucket(F.col(id_col), resolution) < F.col("__thr"))
        .drop("__thr")
    )


def select_until_token_budget(
    df: DataFrame,
    budget: int,
    token_col: str,
    order_by: list,
    n_partitions: int | None = None,
) -> DataFrame:
    """Budget-bounded corpus selection: walk the corpus in ``order_by``
    order (e.g. quality descending) and keep documents while the
    cumulative ``token_col`` stays within ``budget`` — the "best N
    tokens" selection a training run starts from. Use a unique
    tie-break key in ``order_by`` for deterministic output.

    The global cumulative sum is computed the scale-safe way (same
    two-phase shape as operators/ranking.py): ``repartitionByRange`` on
    the ordering key, per-partition subtotals (one row per partition)
    prefix-summed on the driver and broadcast back as a literal map,
    then a window cumsum PARTITIONED by the range-partition id plus the
    partition's offset. Bounded per-task state; never a single-task
    global window. Cost: the range shuffle evaluates twice (subtotal
    job + select job) unless the caller persists the input.
    """
    from pyspark.sql import Window as W

    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if n_partitions is None:
        n_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    pid = "__range_pid"
    d = df.repartitionByRange(n_partitions, *cols).withColumn(
        pid, F.spark_partition_id()
    )
    subtotals = {
        r[pid]: r["s"]
        for r in d.groupBy(pid).agg(F.sum(token_col).alias("s")).collect()
    }
    offsets, acc = {}, 0
    for p in sorted(subtotals):
        offsets[p] = acc
        acc += subtotals[p] or 0
    off_map = F.create_map(
        *[F.lit(x) for p_off in offsets.items() for x in p_off]
    )
    w = (
        W.partitionBy(pid)
        .orderBy(*cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = (
        F.sum(F.col(token_col)).over(w).cast("long")
        + off_map[F.col(pid)].cast("long")
    )
    return (
        d.withColumn("__cum", cum)
        .filter(F.col("__cum") <= budget)
        .drop(pid, "__cum")
    )


def mixture_upsample(
    df: DataFrame,
    repeats: dict[str, float],
    mix_col: str = "lang",
    id_col: str = "doc_id",
    resolution: int = 100,
) -> DataFrame:
    """Repeat-factor data mixing (the upsampling half of
    :func:`mixture_resample`): each domain's documents appear
    ``floor(r)`` or ``ceil(r)`` times so realized multiplicity hits the
    target ``r`` exactly at ``resolution`` granularity — the "epochs
    per source" recipe of mixture-weighted training runs. Deterministic:
    the same md5 hash bucket of the id decides which rows carry the
    extra copy, so the materialized mixture is stable across runs,
    partitionings, and engines. ``r < 1`` degrades gracefully to
    downsampling (0-or-1 copies). Output adds ``_epoch`` (1-based copy
    number); domains absent from ``repeats`` keep one copy.

    Shape: copies is a per-row expression; the only row-count change is
    the explode of a ``sequence(1, copies)`` — no shuffle, no join; at
    100 TB the explode amplifies exactly the bytes the recipe asked
    for."""
    import math

    # base copies and the fractional-bucket threshold are driver-side
    # integers per value (round, not floor: IEEE doubles put e.g.
    # 0.3·100 at 29.999…98, and flooring would silently skew the
    # realized mixture by one bucket)
    base_expr, thr_expr = None, None
    for value, r in repeats.items():
        if r < 0:
            raise ValueError(f"mixture_upsample: negative repeat {r} for {value!r}")
        b = int(math.floor(r))
        thr = round((float(r) - b) * resolution)
        cond = F.col(mix_col) == F.lit(value)
        base_expr = F.when(cond, F.lit(b)) if base_expr is None \
            else base_expr.when(cond, F.lit(b))
        thr_expr = F.when(cond, F.lit(thr)) if thr_expr is None \
            else thr_expr.when(cond, F.lit(thr))
    base = (F.lit(1) if base_expr is None else base_expr.otherwise(F.lit(1)))
    frac_thr = (
        F.lit(0) if thr_expr is None else thr_expr.otherwise(F.lit(0))
    ).cast("long")
    extra = (hash_bucket(F.col(id_col), resolution) < frac_thr).cast("int")
    copies = base + extra
    # NB: Spark's sequence(1, 0) DESCENDS ([1, 0]) rather than being
    # empty — zero-copy rows must explode an explicit empty array
    epochs = F.when(
        copies >= 1, F.sequence(F.lit(1), copies)
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn("_epoch", F.explode(epochs))


def temperature_resample(
    df: DataFrame,
    mix_col: str = "lang",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    resolution: int = 10_000,
) -> DataFrame:
    """Temperature-based mixture smoothing: downsample so group shares
    realize ``p_i ∝ n_i^alpha`` (the standard multilingual-corpus
    exponent rule; ``alpha=1`` keeps the natural mixture, ``alpha→0``
    approaches uniform by downsampling the head).

    The target normalization cancels out of the thresholds: each
    group's keep-rate is exactly ``(n_min / n_i)^(1-alpha)`` — the
    SMALLEST group survives in full and larger groups shrink by the
    power rule, which is the most data anyone can keep while hitting
    the target proportions. Same shape as :func:`mixture_resample`:
    one tiny count aggregate, per-group thresholds broadcast back, the
    corpus itself never shuffles, membership stays the engine-portable
    md5-bucket filter.

    ``alpha=0.5`` routes through ``sqrt`` (IEEE correctly-rounded in
    both the JVM and C libm, so FLOOR boundaries match a DuckDB oracle
    bit-for-bit); other exponents use ``pow`` (within 1 ulp — fine in
    practice, noted for oracle authors).
    """
    if not (0.0 <= alpha <= 1.0):
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = df.groupBy(mix_col).agg(F.count(F.lit(1)).alias("__n"))
    nmin = counts.agg(F.min("__n").alias("__nmin"))
    ratio = F.col("__nmin").cast("double") / F.col("__n").cast("double")
    exponent = 1.0 - alpha
    factor = (
        F.sqrt(ratio) if abs(exponent - 0.5) < 1e-12
        else F.pow(ratio, F.lit(exponent))
    )
    thresholds = (
        counts.crossJoin(F.broadcast(nmin))
        .select(
            mix_col,
            F.floor(factor * F.lit(resolution)).alias("__thr"),
        )
    )
    return (
        df.join(F.broadcast(thresholds), mix_col)
        .filter(hash_bucket(F.col(id_col), resolution) < F.col("__thr"))
        .drop("__thr")
    )


def three_way_split(
    df: DataFrame,
    val_pct: int = 5,
    test_pct: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment as a COLUMN, not three
    frames: the md5 hash bucket partitions [0,100) into test
    [0, test), val [test, test+val) and train (the rest) — disjoint,
    exhaustive, stable across runs/engines, and resumable (a re-run
    assigns every id identically, the property random splits lose).
    One projection; downstream consumers filter on ``split`` and the
    predicate pushes like any literal comparison."""
    if val_pct < 0 or test_pct < 0 or val_pct + test_pct >= 100:
        raise ValueError("val_pct + test_pct must be in [0, 100)")
    b = hash_bucket(F.col(id_col))
    return df.withColumn(
        "split",
        F.when(b < test_pct, F.lit("test"))
        .when(b < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train")),
    )
