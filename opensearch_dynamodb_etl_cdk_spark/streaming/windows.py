"""Streaming windowed aggregation, session windows, watermarked late-data
handling, streaming dedup, and a custom stateful operator
(``applyInPandasWithState``) — SURVEY §2.8 ST3 marks these absent in the
reference; the driver charter requires them as first-class streaming
capabilities.

Every function here accepts either a batch DataFrame or a streaming one
(``spark.readStream``): the transformations are identical — that is the
point of Structured Streaming's unified model, and it is how the batch
twins in ``plans/catalog.py`` oracle-check the same logic DuckDB can see.

Scale notes: windowed aggs carry partial aggregates per (window, key) —
state size is |open windows| × |keys|, bounded by the watermark horizon;
session windows and the stateful operator partition state by key so it
shards across executors; nothing collects to the driver.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_counts(
    events: DataFrame,
    window_dur: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` given) event-time window counts
    with a watermark: late events beyond the horizon are dropped, state
    for closed windows is purged (bounded memory on unbounded streams)."""
    win = F.window(ts_col, window_dur, slide or window_dur)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win, key_col)
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n",
            "sum_value",
        )
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Native session windows: a session extends ``gap`` past each event;
    an event at exactly start+gap begins a NEW session (half-open
    interval). The batch twin's oracle encodes the same boundary rule."""
    events = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        events.groupBy(F.session_window(ts_col, gap), key_col)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon: duplicate
    deliveries of the same event id are dropped with bounded state
    (state per key is evicted once the watermark passes it)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Stream-stream inner join within a time horizon: every right event
    matched to same-key left events it follows within ``horizon``
    (click→purchase attribution shape). Both sides carry watermarks and
    the join condition bounds event-time distance, so Spark can expire
    buffered state — without the bound, stream-stream join state grows
    forever. Works identically on batch frames (the test twin)."""
    l = left
    r = right
    if left.isStreaming:
        l = l.withWatermark(ts_col, watermark)
    if right.isStreaming:
        r = r.withWatermark(ts_col, watermark)
    l = l.select(
        F.col(key),
        F.col(ts_col).alias("l_ts"),
        F.col("event_id").alias("l_id"),
    )
    r = r.select(
        F.col(key).alias("_rk"),
        F.col(ts_col).alias("r_ts"),
        F.col("event_id").alias("r_id"),
    )
    return l.join(
        r,
        (F.col(key) == F.col("_rk"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).drop("_rk")


RUNNING_TOTALS_OUTPUT = "user_id bigint, n_events bigint, sum_value double"
RUNNING_TOTALS_STATE = "n bigint, s double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (count, sum) maintained across micro-batches, emitted on
    every update. State is a 2-field tuple per key, sharded by the
    groupBy — the template for bespoke streaming state machines the
    built-in aggregates can't express."""

    def update(
        key, pdfs: Iterator, state: GroupState
    ) -> Iterator:
        import pandas as pd

        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            RUNNING_TOTALS_OUTPUT,
            RUNNING_TOTALS_STATE,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (re-read per batch) static dimension — the streaming analog of the
    route-level document enrichment a search pipeline does before
    indexing.

    Scale notes: the dimension is broadcast (no stream-side shuffle, no
    streaming state) — the stream stays partitioned as it arrives, and a
    100 TB/day stream pays only a map-side hash probe per row. For
    dimensions too large to broadcast, pass ``broadcast_dim=False`` and
    pre-bucket both sides on the key.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, key, "left")
