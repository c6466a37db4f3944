"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these explicit operators are for the cases AQE can't re-plan —
a groupBy whose hot key floods one reducer, or a shuffle join against
a replicable small-to-medium side — and they make the technique
testable and visible in the catalog.

Design: salt = pmod(xxhash64(row identity), n_salt). Phase 1 aggregates
on (key, salt) — hot keys fan out across n_salt reducers; phase 2
combines the n_salt partials per key. Shuffle volume in phase 2 is
|keys| × n_salt, negligible. Only algebraic aggregates (sum/count/min/
max) decompose this way; avg = sum/count downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, id_col: str, n_salt: int = 16) -> DataFrame:
    """Deterministic per-row salt in [0, n_salt) from a row-identity
    column (NOT rand(): retries/replays must re-derive the same salt)."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt)).cast("int")
    )


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    id_col: str,
    n_salt: int = 16,
    sum_alias: str = "sum_value",
    count_alias: str = "n",
) -> DataFrame:
    """Two-phase salted sum+count: identical result to a direct
    groupBy(key) — decimal-exact sums so the partial/final split is
    order-insensitive — but no single reducer ever sees a hot key's
    full row set."""
    phase1 = (
        with_salt(df, id_col, n_salt)
        .groupBy(*key_cols, "_salt")
        .agg(
            F.sum(F.col(value_col).cast("decimal(28,2)")).alias("_psum"),
            F.count("*").alias("_pcnt"),
        )
    )
    return (
        phase1.groupBy(*key_cols)
        .agg(
            F.sum("_psum").cast("double").alias(sum_alias),
            F.sum("_pcnt").alias(count_alias),
        )
    )


def replicate_for_salt(small: DataFrame, n_salt: int = 16) -> DataFrame:
    """Explode the small side once per salt value so a salted fact join
    on (key, _salt) finds every partner."""
    return small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    fact_id_col: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Shuffle join with hot fact keys spread over n_salt partitions;
    the dim side is replicated n_salt× (so keep it small-to-medium —
    for truly tiny dims just broadcast instead)."""
    f = with_salt(fact, fact_id_col, n_salt)
    d = replicate_for_salt(dim, n_salt)
    return f.join(d, on + ["_salt"], how).drop("_salt")
