"""Multimodal column plumbing (driver charter; SURVEY §2.10 E5).

Image/audio/video payloads are opaque ``binary`` columns plus a typed
metadata struct. The Spark-side plumbing here — schema, Arrow batch
shape, ``mapInPandas`` UDF signatures, frame fan-out — is real and
tested; the actual media *decode* step is stubbed (the container ships
no image/audio libraries) behind ``decode_image``/``decode_audio``
which raise ``NotImplementedError``, with ``fake_decoder`` as the
deterministic test double.

Scale design: payloads never leave executors (no collect), features are
extracted per Arrow batch (one Python↔JVM transfer per ~10k rows, not
per row), and frame fan-out happens inside the UDF so the shuffle only
ever carries the small feature rows, not the payload bytes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..session import min_partitions
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal frame: opaque payload + typed metadata.
MULTIMODAL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("source", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = "doc_id long, source string, n_bytes long, checksum long"

FRAME_SCHEMA = "doc_id long, source string, frame_index long, frame_bytes long"


def attach_payload(
    df: DataFrame,
    payload_from: str = "text",
    id_col: str = "doc_id",
    media_type: str = "text/plain",
) -> DataFrame:
    """Materialize an opaque binary payload column + metadata struct.

    In production the payload arrives as raw bytes from the object
    store; here we derive it from a text column (UTF-8 encode) so the
    downstream plumbing is exercised on real data.
    """
    df = min_partitions(df)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(payload_from), "UTF-8").alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.col("source"),
        F.octet_length(F.col(payload_from)).cast("long").alias("n_bytes"),
    )


def fake_decoder(payload: bytes) -> dict:
    """Deterministic stand-in for a media decoder: byte length + a
    simple additive checksum. Replace with a real decoder (PIL /
    soundfile / av) in an environment that ships one."""
    return {"n_bytes": len(payload), "checksum": sum(payload) % (1 << 31)}


def decode_image(payload: bytes) -> dict:  # pragma: no cover - stub
    """Real image decode (dimensions, channels, resize). Requires PIL;
    not available in this container by design."""
    raise NotImplementedError(
        "image decode requires an imaging library (e.g. PIL); "
        "use fake_decoder for plumbing tests"
    )


def decode_audio(payload: bytes) -> dict:  # pragma: no cover - stub
    """Real audio decode (sample rate, duration, channels)."""
    raise NotImplementedError(
        "audio decode requires an audio library (e.g. soundfile); "
        "use fake_decoder for plumbing tests"
    )


def extract_features(
    df: DataFrame, decoder: Callable[[bytes], dict] = fake_decoder
) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` so each Python worker sees whole Arrow batches;
    the decoder runs per payload but data transfer is batched.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [decoder(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "checksum": [f["checksum"] for f in feats],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, frame_size: int = 256) -> DataFrame:
    """Frame-sampling fan-out: split each payload into fixed-size
    chunks ("frames"), one output row per frame — the video
    frame-extraction shape (1 input row → N output rows) without a
    real codec. Fan-out happens inside the UDF so only small frame
    descriptor rows hit the shuffle."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            n = pdf["payload"].map(len).to_numpy(dtype=np.int64)
            k = (n + frame_size - 1) // frame_size  # frames per payload
            if k.sum() == 0:
                yield pd.DataFrame(
                    {"doc_id": [], "source": [], "frame_index": [], "frame_bytes": []}
                )
                continue
            row = np.repeat(np.arange(len(pdf)), k)
            # concatenated 0..k_i ranges without a Python loop:
            # global arange minus each row's cumulative frame offset
            offsets = np.repeat(np.concatenate(([0], np.cumsum(k)[:-1])), k)
            fi = np.arange(k.sum()) - offsets
            fb = np.minimum(frame_size, n[row] - fi * frame_size)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[row],
                    "source": pdf["source"].to_numpy()[row],
                    "frame_index": fi,
                    "frame_bytes": fb,
                }
            )

    return df.mapInPandas(run, FRAME_SCHEMA)
