"""Batch source: DynamoDB full-table export (SURVEY §2.1 S1).

The reference bootstraps its index from a PITR export — gzipped files of
newline-delimited ``{"Item": {<DynamoDB-JSON>}}`` records in S3
(export config at custom_resource.py:333-336). Spark-first read:
``spark.read.text`` (gzip decompression is transparent; splittable
formats preferred at scale, but the export format is what it is — many
small-ish gz files parallelize by file) → extract the ``Item`` payload →
hand the wire-format string to the codec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_export(spark: SparkSession, path: str) -> DataFrame:
    """Export files → one wire-format DynamoDB-JSON item string per row
    (column ``item_json``), ready for unmarshal_items_df."""
    raw = spark.read.text(path)
    # {"Item": {...}} wrapper → inner object text; lines without the
    # wrapper (manifest files etc.) are dropped.
    item = F.get_json_object(F.col("value"), "$.Item")
    return raw.select(item.alias("item_json")).filter(F.col("item_json").isNotNull())


def read_jsonl_items(spark: SparkSession, path: str) -> DataFrame:
    """Loader-fixture form: newline-delimited bare DynamoDB-JSON items
    (reference loader reads a JSON array fixture, custom_resource.py:17-21;
    jsonl is the Spark-native equivalent)."""
    return spark.read.text(path).select(F.col("value").alias("item_json"))
