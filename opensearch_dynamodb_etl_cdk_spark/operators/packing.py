"""Sequence packing: lay a tokenized corpus out into fixed-size
training sequences (the step between curation and the trainer's data
loader).

Semantics implemented: **concat-and-chop** — per language stream,
documents are concatenated in deterministic (doc_id) order and the
token stream is chopped into bins of ``budget`` tokens; a document
whose span straddles a boundary is split across the adjacent
sequences. This is the standard pre-training packing scheme (no
padding waste, every bin except the stream's last is exactly full),
and unlike greedy first-fit it is a pure window expression: a
document's bin span depends only on the exclusive running token sum,
so the whole layout is one ``sum() OVER (PARTITION BY stream ORDER BY
doc_id)`` — no sequential recurrence, no UDF, SQL-expressible for the
oracle.

Scale notes (100 TB): the only shuffle is the range-partitioned window
per stream. Streams (here: language) are the parallelism unit; a corpus
with few huge streams should salt the stream key into shards (pack each
shard independently — packing quality is unaffected because bins never
span shards) to keep one stream from serializing onto one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.text import token_count


def pack_assignments(
    df: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    stream_col: str = "lang",
) -> DataFrame:
    """Per-document packed layout: exclusive running token offset and
    the first/last bin the document's tokens land in.

    ``crosses`` marks documents split across a sequence boundary (the
    fraction a data lead watches: high crossing rates at small budgets
    mean most examples start mid-document). Empty documents occupy no
    tokens and never cross."""
    w = (
        W.partitionBy(stream_col)
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    n = token_count(F.col(text_col))
    offset = F.coalesce(F.sum(n).over(w), F.lit(0)).cast("bigint")
    start_bin = F.floor(offset / budget)
    end_bin = F.floor((offset + F.greatest(n, F.lit(1)) - 1) / budget)
    return df.select(
        F.col(id_col),
        F.col(stream_col).alias("stream"),
        n.alias("n_tokens"),
        offset.alias("token_offset"),
        start_bin.alias("start_bin"),
        end_bin.alias("end_bin"),
        ((start_bin != end_bin) & (n > 0)).alias("crosses"),
    )


def packing_report(
    df: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    stream_col: str = "lang",
) -> DataFrame:
    """Per-stream packing summary: documents, total tokens, number of
    ``budget``-token sequences produced, boundary-crossing documents,
    and the fill fraction of the produced bins (1.0 except the last
    partial bin per stream)."""
    a = pack_assignments(df, budget, text_col, id_col, stream_col)
    n_bins = F.floor((F.sum("n_tokens") - 1) / budget) + 1
    return (
        a.groupBy("stream")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            n_bins.cast("bigint").alias("n_bins"),
            F.sum(F.col("crosses").cast("bigint")).alias("n_crossing"),
            (
                F.sum("n_tokens").cast("double")
                / (F.floor((F.sum("n_tokens") - 1) / budget) + 1).cast("double")
                / F.lit(float(budget))
            ).alias("fill_frac"),
        )
    )
