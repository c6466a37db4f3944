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


def shuffle_for_training(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Global deterministic shuffle: sort by a hash of the id. One
    range-partitioned sort; output order is stable across runs (unlike
    orderBy(rand()))."""
    return df.orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
