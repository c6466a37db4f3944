"""Keyed upsert/delete — last-write-wins by primary key (SURVEY §2.4 K1).

The reference's sinks write each document under ``_id`` = table primary
key with action index/upsert/delete derived from the CDC event type
(custom_resource.py:350-351,370-371; NEW_IMAGE stream view). The
materialized index is therefore the per-key latest image. Spark-first:

- within a batch: window ``row_number() == 1`` over
  ``partitionBy(key).orderBy(desc(seq))`` — never rely on task order
  (SURVEY §7.3 known-hard #1);
- across batches: merge = current index anti-joined by superseded keys,
  unioned with the batch's surviving upserts (MERGE emulation without
  Delta, SURVEY §7.3 #3).

Scale notes: the window and the anti-join both shuffle on the key —
unavoidable for keyed semantics, and proportional to |batch| + |touched
index partitions|, not |index|, once the index is stored partitioned by
a stable hash of the key (see streaming/pipeline.py). AQE handles key
skew; the per-key latest reduction is also expressible as
``max_by(struct, seq)`` groupBy for map-side partial aggregation — used
here because it combines before the shuffle (less shuffle volume than
row_number over raw rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ACTION_COL = "_action"
SEQ_COL = "_seq"
DELETED_COL = "_deleted"


def derive_action(event_name: Column) -> Column:
    """CDC event type → sink action (SURVEY §2.2 T3; OSIS
    ``getMetadata("opensearch_action")`` semantics: INSERT→index,
    MODIFY→upsert, REMOVE→delete)."""
    return (
        F.when(event_name == "REMOVE", "delete")
        .when(event_name == "INSERT", "index")
        .otherwise("upsert")
    )


def latest_by_key(
    df: DataFrame, key: str = "_id", seq: str = SEQ_COL
) -> DataFrame:
    """Per-key latest row by sequence number.

    Implemented as ``max_by(struct(*), seq)`` — an aggregate, so Spark
    runs a map-side partial reduction before the shuffle: shuffle volume
    is one row per distinct key per input partition, not every event.
    Duplicate (key, seq) deliveries (at-least-once) collapse to one row
    because max_by picks a single struct.
    """
    cols = [c for c in df.columns]
    packed = df.select(
        F.col(key).alias("__k"),
        F.col(seq).alias("__s"),
        F.struct(*cols).alias("__row"),
    )
    latest = packed.groupBy("__k").agg(F.max_by("__row", "__s").alias("__row"))
    return latest.select("__row.*")


def apply_cdc_batch(
    index: DataFrame | None,
    batch: DataFrame,
    key: str = "_id",
    seq: str = SEQ_COL,
    action: str = ACTION_COL,
    keep_tombstones: bool = False,
) -> DataFrame:
    """MERGE a CDC micro-batch into the current index frame.

    Returns the new index: the per-key *highest-sequence* image across
    both the stored index and the batch, minus deletes. The returned
    frame (and therefore the stored index) KEEPS the ``seq`` column —
    that is what makes last-write-wins hold *across* micro-batches: a
    late re-delivered event with a lower sequence number than the stored
    image loses the ``max_by`` and cannot clobber it (the reference's
    per-key-latest semantic, custom_resource.py:350-351, is by sequence,
    not by arrival order). Idempotent under re-delivery of the same
    batch (exactly-once effect, SURVEY K2): a replayed (key, seq) ties
    with the stored row carrying an identical image.

    Default (matches the reference sink): deletes are not stored as
    tombstones, so an upsert with a lower seq re-delivered *after* the
    delete's batch re-creates the document — same behavior as an
    OpenSearch delete followed by a late index call without external
    versioning. Pass ``keep_tombstones=True`` for strictly stronger
    semantics: deletes persist as rows flagged ``_deleted`` (body NULL)
    carrying their sequence number, so the stale upsert loses the
    ``max_by`` and stays dead. Read paths must filter ``_deleted``;
    compaction can purge (see streaming/pipeline.py).
    """
    latest = latest_by_key(batch, key=key, seq=seq)
    prior = index
    if prior is not None:
        if seq not in prior.columns:  # legacy index written without seq
            prior = prior.withColumn(seq, F.lit(-1).cast("long"))
        if DELETED_COL in prior.columns:
            prior = prior.withColumn(
                action,
                F.when(F.col(DELETED_COL), "delete").otherwise("index"),
            ).drop(DELETED_COL)
        else:
            prior = prior.withColumn(action, F.lit("index"))
        merged = latest_by_key(prior.unionByName(latest), key=key, seq=seq)
    else:
        merged = latest
    if keep_tombstones:
        return merged.withColumn(
            DELETED_COL, F.col(action) == "delete"
        ).drop(action)
    return merged.filter(F.col(action) != "delete").drop(action)
