"""Bucketed-table materialization for shuffle-free co-located joins.

At 100 TB the dominant cost of a fact⋈fact join is shuffling both sides
on the key. Bucketing writes each table pre-hash-partitioned (and
sorted) by the join key: two tables bucketed the same way join with NO
exchange on either side — the sort-merge join reads co-located buckets
directly. The write pays the shuffle once; every subsequent join reads
it back for free. (Delta/Iceberg clustering plays the same role on a
production lakehouse; the mechanism below is Spark's built-in
hive-format bucketing, dependency-free in this image.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def materialize_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Write df as a managed bucketed table (overwrites if present)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Spark
    plans a sort-merge join with zero Exchange nodes."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
