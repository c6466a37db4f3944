"""Flights single-table data model: superset schema + per-entity views.

Mirrors the reference's table layout (SURVEY §1.1; key schema at
/root/reference/assets/dynamodb-data/table-attributes.json:3-72) without
copying its fixture: a composite (PK, SK) primary key, two GSI
projections, four entity types discriminated by ``type``, overloaded
``#``-composite sort keys:

- fare:       PK=origin,    SK=dest#startTs#class
- flight:     PK=origin?,   SK=origin#departTs#number#segId (header segId=0,
              legs isSegment=true segId>=1)
- assignment: PK=passenger, SK=departTs#flight#segId#seat
- booking:    PK=passenger, SK=departTs#flight

A GSI is not a physical object here: it's a filter + re-sort on the base
frame (SURVEY §1.1), optionally materialized with
``repartition(gsi1pk).sortWithinPartitions(gsi1sk)`` for perf parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ddb import parse_item, unmarshal

# Superset of all attributes across the 4 entity types (FIXTURES.md F2).
# raw_string = type-inconsistent in the wire data (N on some entities,
# S on others) — string fidelity canonical, cast views downstream.
SUPERSET_ATTRS: dict[str, str] = {
    "PK": "string",
    "SK": "string",
    "type": "string",
    "origin": "string",
    "dest": "string",
    "start": "timestamp",
    "end": "timestamp",
    "depart": "timestamp",
    "arrive": "timestamp",
    "class": "string",
    "isSegment": "boolean",
    "segId": "bigint",
    "number": "raw_string",
    "segments": "raw_string",
    "seat": "string",
    "SSR": "string",
    "passenger": "string",
    "GSI1PK": "string",
    "GSI1SK": "string",
    "GSI2PK": "string",
    "GSI2SK": "string",
}

ALIASES = {
    "PK": "pk",
    "SK": "sk",
    "start": "start_ts",
    "end": "end_ts",
    "depart": "depart_ts",
    "arrive": "arrive_ts",
    "class": "fare_class",
    "isSegment": "is_segment",
    "segId": "seg_id",
    "number": "flight_number_raw",
    "segments": "segments_raw",
    "SSR": "ssr_raw",
    "GSI1PK": "gsi1pk",
    "GSI1SK": "gsi1sk",
    "GSI2PK": "gsi2pk",
    "GSI2SK": "gsi2sk",
}


def unmarshal_items_df(raw: DataFrame, item_col: str = "item_json") -> DataFrame:
    """Wire-format frame (one DynamoDB-JSON string per row) → typed superset.

    Document identity ``_id = pk|sk`` matches the reference's
    ``document_id: ${getMetadata("primary_key")}``
    (custom_resource.py:350,370).
    """
    parsed = parse_item(F.col(item_col))
    df = raw.select(*unmarshal(parsed, SUPERSET_ATTRS, aliases=ALIASES))
    return df.withColumn("_id", F.concat_ws("|", F.col("pk"), F.col("sk")))


def entity_view(df: DataFrame, entity: str) -> DataFrame:
    """Per-entity typed view = filter on the discriminator column."""
    return df.filter(F.col("type") == entity)


def typed_flight_view(df: DataFrame) -> DataFrame:
    """Flight view with best-effort numeric cast of the raw-fidelity column."""
    return entity_view(df, "flight").withColumn(
        "flight_number", F.col("flight_number_raw").cast("bigint")
    )


def register_views(spark: SparkSession, df: DataFrame) -> None:
    df.createOrReplaceTempView("items")
    for e in ("fare", "flight", "assignment", "booking"):
        entity_view(df, e).createOrReplaceTempView(f"{e}_items")
