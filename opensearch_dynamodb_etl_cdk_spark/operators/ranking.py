"""Distributed global ranking / NTILE without a single-partition window.

A global ``row_number()``/``ntile()`` window (no PARTITION BY) funnels
the whole table through ONE task — the classic scale-killer. The
two-phase formulation here keeps the exact same semantics with bounded
per-task state:

1. ``repartitionByRange`` on the sort key: partition i holds keys
   strictly below partition i+1's, so global order = (partition id,
   within-partition order).
2. per-partition counts → driver prefix-sum (one row per partition —
   tiny) → broadcast as a literal map.
3. ``row_number`` over a window PARTITIONED by the range-partition id
   (parallel, bounded state) + the partition's offset = exact global
   rank.

NTILE(n) is then pure arithmetic on the rank: with total rows N,
q = N div n, rem = N mod n, the first ``rem`` buckets take q+1 rows and
the rest take q — bit-identical to the SQL window function for a
deterministic (unique-key tie-break) ordering.

Cost: one range shuffle evaluated twice (counts job + rank job — Spark
does not reuse shuffle output across actions without caching; callers
on very hot paths can ``.persist()`` the input). Still linear and fully
parallel, versus a serial whole-table single task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

_PID = "__range_pid"


def _ranked_with_total(
    df: DataFrame,
    order_by: list[str | Column],
    n_partitions: int | None,
    rank_col: str,
) -> tuple[DataFrame, int]:
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if n_partitions is None:
        n_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    d = df.repartitionByRange(n_partitions, *cols).withColumn(
        _PID, F.spark_partition_id()
    )
    counts = {
        r[_PID]: r["cnt"]
        for r in d.groupBy(_PID).agg(F.count("*").alias("cnt")).collect()
    }
    total = sum(counts.values())
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_map = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    w = W.partitionBy(_PID).orderBy(*cols)
    ranked = d.withColumn(
        rank_col,
        (F.row_number().over(w).cast("long") + off_map[F.col(_PID)].cast("long")),
    ).drop(_PID)
    return ranked, total


def global_rank(
    df: DataFrame,
    order_by: list[str | Column],
    n_partitions: int | None = None,
    rank_col: str = "_rank",
) -> DataFrame:
    """Exact 1-based global row rank by ``order_by`` (use a unique
    tie-break key for deterministic output), computed with a
    range-partitioned parallel window — never a global one."""
    ranked, _ = _ranked_with_total(df, order_by, n_partitions, rank_col)
    return ranked


def ntile_ranked(
    df: DataFrame,
    n: int,
    order_by: list[str | Column],
    n_partitions: int | None = None,
    bucket_col: str = "_ntile",
) -> DataFrame:
    """Exact NTILE(n) over a global ordering, scalably: global rank via
    range partitioning, then the NTILE split as arithmetic — the first
    ``N mod n`` buckets take ``N div n + 1`` rows, the rest ``N div n``."""
    rank_col = "__gr"
    ranked, total = _ranked_with_total(df, order_by, n_partitions, rank_col)
    q, rem = divmod(total, n)
    r = F.col(rank_col)
    if q == 0:  # fewer rows than buckets: NTILE assigns bucket = rank
        bucket = r
    else:
        head = rem * (q + 1)
        in_head = F.floor((r - 1) / F.lit(q + 1)) + 1
        in_tail = F.lit(rem) + F.floor((r - 1 - head) / F.lit(q)) + 1
        bucket = F.when(r <= F.lit(head), in_head).otherwise(in_tail)
    return ranked.withColumn(bucket_col, bucket.cast("int")).drop(rank_col)
