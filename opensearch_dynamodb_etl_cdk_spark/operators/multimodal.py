"""Multimodal column plumbing (driver charter; SURVEY §2.10 E5).

Image/audio/video payloads are opaque ``binary`` columns plus a typed
metadata struct. The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` UDF signatures, frame fan-out — is real and tested,
and so is the decode step for the two container-formats this module
implements from the public file-format specs with zero third-party
dependencies:

* uncompressed 24-bit BMP (``decode_bmp`` / ``encode_bmp``)
* RIFF/WAVE (``decode_wav`` / ``encode_wav`` / ``encode_wav_ext``):
  integer PCM at 8/16/24/32 bits, IEEE float32/float64 (format 3),
  IMA ADPCM (format 0x11) and MS ADPCM (format 2, the file's own
  coefficient table) — both block-structured with ``fact``-chunk
  frame counts — G.711 µ-law/A-law companded audio (formats 7/6,
  spec-generated expansion tables) and WAVE_FORMAT_EXTENSIBLE
  (0xFFFE) with SubFormat GUID resolution
* 8-bit PNG, color types 0/2/4/6 (``decode_png`` / ``encode_png``) —
  the first REAL compressed format: stdlib ``zlib`` inflate plus the
  five public filter reconstructions (None/Sub/Up/Average/Paeth),
  per-chunk CRC verification, no third-party imaging library
* GIF87a/89a (``decode_gif`` / ``encode_gif``) — the second: a full
  variable-width LZW codec (clear/end codes, dictionary growth,
  KwKwK case) with palette mapping and sub-block framing
* baseline grayscale JPEG (``decode_jpeg`` / ``encode_jpeg``) — the
  third: 8×8 FDCT/IDCT, quantization, zigzag, differential-DC +
  run-length-AC Huffman entropy coding with byte stuffing; tables
  read from DHT, so Annex-K-coded files decode too
* FLAC (``decode_flac`` / ``encode_flac``) — the first compressed
  AUDIO format: fixed/LPC prediction, partitioned Rice residuals,
  stereo decorrelation, CRC-8/16 + STREAMINFO-MD5 verification
  (RFC 9639), pure integer arithmetic with zero dependencies

``decode_image`` / ``decode_audio`` / ``decode_video`` dispatch on
magic bytes: every image format, WAV, FLAC, Ogg-FLAC and MJPEG AVI
decode for real; MP3 and the Vorbis/Opus Ogg mappings raise
``NotImplementedError`` because their codecs (MPEG audio / Vorbis /
Opus) need libraries the container does not ship — they stay
pluggable through ``register_decoder``.
``fake_decoder`` remains as a cheap deterministic double for
plumbing-only tests.

Scale design: payloads never leave executors (no collect), features are
extracted per Arrow batch (one Python↔JVM transfer per ~10k rows, not
per row), and frame fan-out happens inside the UDF so the shuffle only
ever carries the small feature rows, not the payload bytes.
"""

from __future__ import annotations

import bisect
import re
import struct
import sys
import zlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from . import pdf as _pdf
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

MEDIA_FEATURE_SCHEMA = (
    "doc_id long, media_kind string, width long, height long, "
    "bit_depth long, sample_rate long, channels long, n_units long, "
    "duration_ms double, mean_value double, n_bytes long"
)

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


# ---------------------------------------------------------------------------
# Real codecs: uncompressed 24-bit BMP and 16-bit PCM WAV, written from
# the public file-format specs (BITMAPINFOHEADER / RIFF-WAVE), no
# third-party libraries. These make the decode path honestly
# exercisable inside a dependency-free container.
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, pixel_value: int) -> bytes:
    """Build an uncompressed bottom-up 24-bit BMP whose every pixel
    byte (B, G and R) equals ``pixel_value``. Rows are padded to 4-byte
    boundaries with zero bytes, per the format."""
    if width <= 0 or height <= 0 or not (0 <= pixel_value <= 255):
        raise ValueError("width/height must be positive, pixel_value a byte")
    row_data = width * 3
    pad = (4 - row_data % 4) % 4
    pixel_bytes = (bytes([pixel_value]) * row_data + b"\x00" * pad) * height
    header_size = 14 + 40
    file_size = header_size + len(pixel_bytes)
    file_header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, header_size)
    # BITMAPINFOHEADER: size, w, h, planes, bpp, compression(BI_RGB=0),
    # image size, x/y pixels-per-meter, colors used, colors important.
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_bytes), 0, 0, 0, 0
    )
    return file_header + info_header + pixel_bytes


def decode_bmp(payload: bytes) -> dict:
    """Decode a BMP: uncompressed 24-bit files (header fields plus
    pixel statistics over the data bytes only — row padding is
    skipped, so a parser that naively averaged the whole pixel array
    would be caught by the oracle on any width where ``3*w % 4 != 0``)
    AND BI_RLE8 8-bit palette files (run-length decode through the
    shared pixel path, palette-mapped stats).

    Supports bottom-up (positive height) and top-down (negative height)
    orientations; other compression methods and bit depths raise
    explicitly.
    """
    if len(payload) < 54:
        raise ValueError("truncated BMP: shorter than headers")
    magic, _file_size, _r1, _r2, data_offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (dib_size, width, height, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if dib_size < 40:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    if compression in (1, 2):  # BI_RLE8/BI_RLE4 share the pixel path
        rle = _bmp_rle8_pixels if compression == 1 else _bmp_rle4_pixels
        w, h, bgr = rle(payload, dib_size, width, height,
                        data_offset, bpp)
        n = w * h
        return {
            "media_kind": "image",
            "width": w,
            "height": h,
            "bit_depth": 8 if compression == 1 else 4,
            "n_units": n,
            "mean_value": (float(bgr.sum()) / (3 * n)) if n else 0.0,
            "n_bytes": len(payload),
        }
    if bpp == 32 and compression in (0, 3):  # BGRX / BI_BITFIELDS
        w, h, bgr = _bmp32_pixels(payload, width, height, data_offset,
                                  compression, dib_size)
        n = w * h
        return {
            "media_kind": "image",
            "width": w,
            "height": h,
            "bit_depth": 32,
            "n_units": n,
            "mean_value": (float(bgr.sum()) / (3 * n)) if n else 0.0,
            "n_bytes": len(payload),
        }
    if compression != 0:
        raise NotImplementedError(f"compressed BMP (method {compression}) unsupported")
    if bpp in (1, 4, 8):  # uncompressed paletted: shared pixel path
        w, h, bgr = _bmp_paletted_pixels(payload, dib_size, width,
                                         height, data_offset, bpp)
        n = w * h
        return {
            "media_kind": "image",
            "width": w,
            "height": h,
            "bit_depth": bpp,
            "n_units": n,
            "mean_value": (float(bgr.sum()) / (3 * n)) if n else 0.0,
            "n_bytes": len(payload),
        }
    if bpp != 24:
        raise NotImplementedError(f"{bpp}-bit BMP unsupported (only 1/4/8/24-bit)")
    top_down = height < 0
    h = -height if top_down else height
    row_data = width * 3
    stride = row_data + (4 - row_data % 4) % 4
    if len(payload) < data_offset + stride * h:
        raise ValueError("truncated BMP: pixel array shorter than geometry")
    total = 0
    for r in range(h):
        start = data_offset + r * stride
        total += sum(payload[start : start + row_data])
    n_pixels = width * h
    n_data_bytes = n_pixels * 3
    return {
        "media_kind": "image",
        "width": width,
        "height": h,
        "bit_depth": 24,
        "n_units": n_pixels,
        "mean_value": (total / n_data_bytes) if n_data_bytes else 0.0,
        "n_bytes": len(payload),
    }


def encode_wav(
    sample_rate: int, channels: int, n_frames: int, sample_value: int
) -> bytes:
    """Build a 16-bit PCM RIFF/WAVE file where every sample equals
    ``sample_value`` (signed int16)."""
    if sample_rate <= 0 or channels <= 0 or n_frames < 0:
        raise ValueError("sample_rate/channels must be positive")
    if not (-32768 <= sample_value <= 32767):
        raise ValueError("sample_value must fit int16")
    block_align = channels * 2
    byte_rate = sample_rate * block_align
    data = struct.pack("<h", sample_value) * (n_frames * channels)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# IMA/DVI ADPCM step and index tables — public constants from the IMA
# Digital Audio Pack recommendation (also reproduced in RFC 3551 §4.5.1
# and the multimedia-wiki DVI/IMA page); shared by encoder and decoder.
_IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
)
_IMA_INDEX_ADJ = (-1, -1, -1, -1, 2, 4, 6, 8)


def _ima_decode_nibble(nibble: int, pred: int, index: int) -> tuple[int, int]:
    """One IMA ADPCM step: (new predictor, new step index). The exact
    shift-based ``vpdiff`` reconstruction (step>>3 plus step, step>>1,
    step>>2 per magnitude bit) — both ends must use this identical
    arithmetic or streams drift."""
    step = _IMA_STEPS[index]
    vpdiff = step >> 3
    if nibble & 4:
        vpdiff += step
    if nibble & 2:
        vpdiff += step >> 1
    if nibble & 1:
        vpdiff += step >> 2
    pred = pred - vpdiff if nibble & 8 else pred + vpdiff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX_ADJ[nibble & 7]))
    return pred, index


def _ima_encode_sample(sample: int, pred: int, index: int) -> tuple[int, int, int]:
    """Encode one sample against the decoder-tracked state: returns
    (nibble, new predictor, new index) where the new state is EXACTLY
    what a decoder reconstructs — the encoder is its own decoder, the
    property every spec-conforming IMA encoder needs to avoid drift."""
    step = _IMA_STEPS[index]
    diff = sample - pred
    nibble = 0
    if diff < 0:
        nibble = 8
        diff = -diff
    if diff >= step:
        nibble |= 4
        diff -= step
    if diff >= step >> 1:
        nibble |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nibble |= 1
    pred, index = _ima_decode_nibble(nibble, pred, index)
    return nibble, pred, index


def encode_ima_adpcm_wav(
    sample_rate: int, frames: list, data_bytes_per_channel: int = 32
) -> bytes:
    """Build an IMA ADPCM WAV (format 0x11) from int16 ``frames``
    (list of per-frame channel tuples/lists). Block layout per the
    public DVI/IMA-in-RIFF convention: a 4-byte per-channel header
    (int16 predictor = the block's first sample, step index, reserved
    byte), then 4-byte nibble groups interleaved per channel. A
    ``fact`` chunk records the true frame count (mandatory for
    compressed WAVE formats); the last block is zero-padded with
    repeats of its final frame, which ``fact`` then truncates away."""
    channels = len(frames[0]) if frames else 1
    n_frames = len(frames)
    spb = data_bytes_per_channel * 2 + 1  # samples per block per channel
    block_align = channels * (4 + data_bytes_per_channel)
    blocks = bytearray()
    for b0 in range(0, n_frames, spb):
        chunk = frames[b0 : b0 + spb]
        while len(chunk) < spb:  # pad the final partial block
            chunk = chunk + [chunk[-1]]
        preds, idxs = [], []
        for ch in range(channels):
            p = int(chunk[0][ch])
            preds.append(p)
            idxs.append(0)
            blocks += struct.pack("<hBB", p, 0, 0)
        # per-channel nibble streams (sample 0 lives in the header)
        nibs = [[] for _ in range(channels)]
        for fr in chunk[1:]:
            for ch in range(channels):
                nib, preds[ch], idxs[ch] = _ima_encode_sample(
                    int(fr[ch]), preds[ch], idxs[ch])
                nibs[ch].append(nib)
        # 4-byte groups (8 nibbles) alternating per channel
        for g in range(0, data_bytes_per_channel, 4):
            for ch in range(channels):
                for byte_i in range(4):
                    lo = nibs[ch][(g + byte_i) * 2]
                    hi = nibs[ch][(g + byte_i) * 2 + 1]
                    blocks.append(lo | (hi << 4))
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt = struct.pack("<HHIIHHHH", 0x11, channels, sample_rate, byte_rate,
                      block_align, 4, 2, spb)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<II", 4, n_frames)
            + b"data" + struct.pack("<I", len(blocks)) + bytes(blocks))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_ima_adpcm(data: bytes, channels: int, block_align: int,
                      spb: int, fact_frames: int) -> list:
    """Walk IMA ADPCM blocks back to int16 samples (interleaved frame
    order), truncated to the ``fact`` frame count."""
    if block_align < 4 * channels or (block_align - 4 * channels) % (
            4 * channels):
        raise ValueError(f"IMA ADPCM block_align {block_align} invalid "
                         f"for {channels} channel(s)")
    dbpc = (block_align - 4 * channels) // channels
    samples = []
    for off in range(0, len(data) - block_align + 1, block_align):
        preds, idxs = [], []
        for ch in range(channels):
            p, idx, _ = struct.unpack_from("<hBB", data, off + 4 * ch)
            if idx > 88:
                raise ValueError(f"IMA ADPCM step index {idx} out of range")
            preds.append(p)
            idxs.append(idx)
        chans = [[p] for p in preds]
        base = off + 4 * channels
        for g in range(0, dbpc, 4):
            for ch in range(channels):
                gpos = base + g * channels + 4 * ch
                for byte_i in range(4):
                    b = data[gpos + byte_i]
                    for nib in (b & 0xF, b >> 4):
                        preds[ch], idxs[ch] = _ima_decode_nibble(
                            nib, preds[ch], idxs[ch])
                        chans[ch].append(preds[ch])
        for i in range(min(spb, len(chans[0]))):
            for ch in range(channels):
                samples.append(chans[ch][i])
    return samples[: fact_frames * channels]


# MS ADPCM (WAVE format 2) — public constants from the Microsoft
# Multimedia Standards ADPCM reference (also in the libsndfile /
# multimedia-wiki documentation of the format).
_MS_ADAPT = (230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230)
_MS_COEFS = ((256, 0), (512, -256), (0, 64), (192, 64),
             (240, 0), (460, -208), (392, -232))


def encode_ms_adpcm_wav(sample_rate: int, frames: list,
                        data_bytes_per_channel: int = 16) -> bytes:
    """Build an MS ADPCM WAV (format 2) from int16 ``frames``. Block
    layout per the public spec: per-channel predictor index, initial
    delta, and the first TWO samples raw in the 7-byte-per-channel
    header, then 4-bit codes nibble-interleaved across channels. The
    encoder tracks the decoder's exact state (prediction via the
    chosen coefficient pair, delta adaptation table), so its output is
    what a conforming decoder reconstructs. A ``fact`` chunk records
    the true frame count; the padded final block truncates away."""
    channels = len(frames[0]) if frames else 1
    n_frames = len(frames)
    spb = 2 + data_bytes_per_channel * 2
    block_align = channels * (7 + data_bytes_per_channel)
    blocks = bytearray()
    for b0 in range(0, n_frames, spb):
        chunk = frames[b0: b0 + spb]
        while len(chunk) < spb:
            chunk = chunk + [chunk[-1]]
        preds = [0] * channels          # coefficient pair 0: (256, 0)
        deltas = [16] * channels
        s1 = [int(chunk[1][ch]) for ch in range(channels)]
        s2 = [int(chunk[0][ch]) for ch in range(channels)]
        for ch in range(channels):
            blocks += struct.pack("<B", 0)
        for arr in (deltas, s1, s2):
            for ch in range(channels):
                blocks += struct.pack("<h", arr[ch])
        nibs = []
        for fr in chunk[2:]:
            for ch in range(channels):
                c1, c2 = _MS_COEFS[preds[ch]]
                predicted = (s1[ch] * c1 + s2[ch] * c2) >> 8
                err = int(fr[ch]) - predicted
                code = max(-8, min(7, round(err / deltas[ch])
                                   if deltas[ch] else 0))
                recon = predicted + code * deltas[ch]
                recon = max(-32768, min(32767, recon))
                nibs.append(code & 0xF)
                s2[ch], s1[ch] = s1[ch], recon
                deltas[ch] = max(
                    16, (_MS_ADAPT[code & 0xF] * deltas[ch]) >> 8)
        for i in range(0, len(nibs), 2):
            blocks.append((nibs[i] << 4) | nibs[i + 1])
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    coefs = b"".join(struct.pack("<hh", a, b) for a, b in _MS_COEFS)
    fmt = struct.pack("<HHIIHHHHH", 2, channels, sample_rate, byte_rate,
                      block_align, 4, 4 + 28, spb, len(_MS_COEFS)) + coefs
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<II", 4, n_frames)
            + b"data" + struct.pack("<I", len(blocks)) + bytes(blocks))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_ms_adpcm(data: bytes, channels: int, block_align: int,
                     spb: int, coefs: list, fact_frames: int) -> list:
    """Walk MS ADPCM blocks back to int16 samples using the FILE's
    coefficient table (writers may extend the standard seven)."""
    if block_align < 7 * channels:
        raise ValueError(f"MS ADPCM block_align {block_align} invalid "
                         f"for {channels} channel(s)")
    samples = []
    for off in range(0, len(data) - block_align + 1, block_align):
        preds = list(data[off: off + channels])
        base = off + channels
        deltas = list(struct.unpack_from(f"<{channels}h", data, base))
        s1 = list(struct.unpack_from(f"<{channels}h", data,
                                     base + 2 * channels))
        s2 = list(struct.unpack_from(f"<{channels}h", data,
                                     base + 4 * channels))
        for ch in range(channels):
            if preds[ch] >= len(coefs):
                raise ValueError(
                    f"MS ADPCM predictor index {preds[ch]} exceeds the "
                    f"{len(coefs)}-entry coefficient table")
        chans = [[s2[ch], s1[ch]] for ch in range(channels)]
        nib_src = data[base + 6 * channels: off + block_align]
        ch = 0
        for b in nib_src:
            for code4 in (b >> 4, b & 0xF):
                code = code4 - 16 if code4 & 8 else code4
                c1, c2 = coefs[preds[ch]]
                predicted = (s1[ch] * c1 + s2[ch] * c2) >> 8
                recon = max(-32768, min(32767, predicted
                                        + code * deltas[ch]))
                chans[ch].append(recon)
                s2[ch], s1[ch] = s1[ch], recon
                deltas[ch] = max(16, (_MS_ADAPT[code4] * deltas[ch]) >> 8)
                ch = (ch + 1) % channels
        for i in range(min(spb, len(chans[0]))):
            for c in range(channels):
                samples.append(chans[c][i])
    return samples[: fact_frames * channels]


def _build_g711_tables() -> tuple[tuple, tuple]:
    """G.711 companding expansion tables, generated from the ITU spec
    formulas rather than transcribed (µ-law: complemented byte,
    ((mant*8+132) << exp) - 132; A-law: 0x55-toggled byte, chord/step
    expansion). Both are cross-validated byte-for-byte against CPython
    audioop in tests."""
    ulaw, alaw = [], []
    for code in range(256):
        u = ~code & 0xFF
        mant, exp, sign = u & 0xF, (u >> 4) & 7, u & 0x80
        mag = (((mant << 3) + 0x84) << exp) - 0x84
        ulaw.append(-mag if sign else mag)
        x = code ^ 0x55
        mant, exp, sign = x & 0xF, (x >> 4) & 7, x & 0x80
        mag = (mant << 4) + 8 if exp == 0 else \
            ((mant << 4) + 0x108) << (exp - 1)
        alaw.append(mag if sign else -mag)
    return tuple(ulaw), tuple(alaw)


_G711_ULAW, _G711_ALAW = _build_g711_tables()


def encode_g711_wav(sample_rate: int, codes: bytes, law: str) -> bytes:
    """Build a mono G.711 WAV (format 6 A-law / 7 µ-law) from raw
    companded code bytes — the telephony/voicemail capture format; one
    byte per sample, bits_per_sample 8."""
    fmt_code = {"alaw": 6, "ulaw": 7}[law]
    fmt = struct.pack("<HHIIHHH", fmt_code, 1, sample_rate, sample_rate,
                      1, 8, 0)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<II", 4, len(codes))
            + b"data" + struct.pack("<I", len(codes)) + codes)
    if len(codes) % 2:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


# KSDATAFORMAT_SUBTYPE GUID tail shared by PCM and IEEE-float SubFormats
# (the first two bytes are the little-endian format code).
_WAVE_EXT_GUID_TAIL = bytes.fromhex("000000000010800000aa00389b71")


def decode_wav(payload: bytes) -> dict:
    """Decode a RIFF/WAVE file by walking the chunk list (chunks are
    word-aligned; unknown chunks like LIST are skipped, per the spec —
    fixed-offset parsers break on files with metadata chunks).

    Formats: integer PCM (format 1) at 8 (unsigned), 16, 24 and 32
    bits; IEEE float (format 3) at 32/64 bits; IMA ADPCM (format 0x11)
    and MS ADPCM (format 2) with ``fact``-authoritative frame counts;
    G.711 A-law/µ-law (formats 6/7) through the spec-generated
    expansion tables; WAVE_FORMAT_EXTENSIBLE (0xFFFE) resolved through
    its SubFormat GUID. Returns sample rate,
    channel count, frame count, duration and the mean amplitude
    (8-bit means are re-centered by -128 so every format reports on
    the signed scale).
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    fmt_fields = None
    fmt_extra = b""
    data = None
    fact_frames = None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body_start = pos + 8
        if body_start + size > end:
            raise ValueError(f"truncated WAV chunk {cid!r}")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too small")
            fmt_fields = struct.unpack_from("<HHIIHH", payload, body_start)
            fmt_extra = payload[body_start + 16 : body_start + size]
        elif cid == b"data":
            data = payload[body_start : body_start + size]
        elif cid == b"fact" and size >= 4:
            (fact_frames,) = struct.unpack_from("<I", payload, body_start)
        pos = body_start + size + (size % 2)  # word alignment
    if fmt_fields is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, sample_rate, _byte_rate, block_align, bits = fmt_fields
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
        # cbSize(2) + wValidBitsPerSample(2) + dwChannelMask(4) + GUID(16)
        if len(fmt_extra) < 24:
            raise ValueError("WAVE_FORMAT_EXTENSIBLE fmt chunk too small")
        guid = fmt_extra[8:24]
        if guid[2:] != _WAVE_EXT_GUID_TAIL:
            raise NotImplementedError(
                f"WAVE_FORMAT_EXTENSIBLE SubFormat GUID {guid.hex()} "
                "unsupported (PCM/IEEE-float GUIDs only)")
        audio_format = struct.unpack_from("<H", guid, 0)[0]
    if audio_format == 2:  # MS ADPCM
        if channels <= 0:
            raise ValueError("MS ADPCM WAV with zero channels is malformed")
        if bits != 4:
            raise NotImplementedError(
                f"MS ADPCM with {bits} bits/sample unsupported (4 only)")
        if len(fmt_extra) < 6:
            raise ValueError("MS ADPCM fmt chunk missing samples/coefs")
        spb, ncoef = struct.unpack_from("<HH", fmt_extra, 2)
        if len(fmt_extra) < 6 + 4 * ncoef:
            raise ValueError("MS ADPCM coefficient table truncated")
        coefs = [struct.unpack_from("<hh", fmt_extra, 6 + 4 * i)
                 for i in range(ncoef)]
        if fact_frames is None:
            raise ValueError("MS ADPCM WAV missing the mandatory fact chunk")
        samples = _decode_ms_adpcm(data, channels, block_align, spb,
                                   coefs, fact_frames)
        bit_depth = 16  # decoded scale
        total = float(sum(samples))
        n_samples = len(samples)
    elif audio_format == 0x11:  # IMA ADPCM
        if channels <= 0:
            raise ValueError("IMA ADPCM WAV with zero channels is malformed")
        if bits != 4:
            raise NotImplementedError(
                f"IMA ADPCM with {bits} bits/sample unsupported (4 only)")
        if len(fmt_extra) < 4:
            raise ValueError("IMA ADPCM fmt chunk missing wSamplesPerBlock")
        spb = struct.unpack_from("<H", fmt_extra, 2)[0]
        if fact_frames is None:
            raise ValueError("IMA ADPCM WAV missing the mandatory fact chunk")
        samples = _decode_ima_adpcm(data, channels, block_align, spb,
                                    fact_frames)
        bit_depth = 16  # decoded scale
        total = float(sum(samples))
        n_samples = len(samples)
    elif audio_format in (6, 7):  # G.711 A-law / mu-law
        if bits != 8:
            raise NotImplementedError(
                f"G.711 with {bits} bits/sample unsupported (8 only)")
        import numpy as np
        tab = np.array(_G711_ALAW if audio_format == 6 else _G711_ULAW,
                       dtype=np.int64)
        vals = tab[np.frombuffer(data, dtype=np.uint8)]
        n_samples = len(data)
        total = float(vals.sum(dtype=np.int64))
        bit_depth = 16  # decoded scale
    elif audio_format == 1:
        if bits not in (8, 16, 24, 32):
            raise NotImplementedError(
                f"{bits}-bit integer PCM unsupported (8/16/24/32 only)")
        import numpy as np
        bw = bits // 8
        n_samples = len(data) // bw
        if bits == 8:  # unsigned storage; report on the signed scale
            total = float(sum(data[: n_samples]) - 128 * n_samples)
        elif bits == 24:
            a = np.frombuffer(data[: n_samples * 3], dtype=np.uint8)
            a = a.reshape(-1, 3).astype(np.int64)
            v = a[:, 0] | (a[:, 1] << 8) | (a[:, 2] << 16)
            v -= (v >> 23) << 24  # sign-extend
            total = float(v.sum(dtype=np.int64))
        else:
            dt = np.dtype("<i2") if bits == 16 else np.dtype("<i4")
            total = float(np.frombuffer(
                data[: n_samples * bw], dtype=dt).sum(dtype=np.int64))
        bit_depth = bits
    elif audio_format == 3:  # IEEE float
        if bits not in (32, 64):
            raise NotImplementedError(
                f"{bits}-bit IEEE-float PCM unsupported (32/64 only)")
        import numpy as np
        bw = bits // 8
        n_samples = len(data) // bw
        dt = np.dtype("<f4") if bits == 32 else np.dtype("<f8")
        total = float(np.frombuffer(
            data[: n_samples * bw], dtype=dt).sum(dtype=np.float64))
        bit_depth = bits
    else:
        raise NotImplementedError(
            f"WAV format {audio_format:#x} unsupported (PCM, IEEE float, "
            "IMA ADPCM and EXTENSIBLE-wrapped forms only)")
    n_frames = n_samples // channels if channels else 0
    return {
        "media_kind": "audio",
        "sample_rate": sample_rate,
        "channels": channels,
        "bit_depth": bit_depth,
        "n_units": n_frames,
        "duration_ms": (n_frames * 1000.0 / sample_rate) if sample_rate else 0.0,
        "mean_value": (total / n_samples) if n_samples else 0.0,
        "n_bytes": len(payload),
    }


# -------------------------------------------------------------- FLAC codec
#
# Dependency-free FLAC from the public spec (RFC 9639 / xiph.org):
# STREAMINFO metadata parse, frame-header walk (sync, blocking
# strategy, UTF-8-coded frame numbers, CRC-8), subframe decode for all
# four types (CONSTANT / VERBATIM / FIXED orders 0-4 / LPC with
# quantized coefficients and shift), Rice-coded residuals (both 4- and
# 5-bit parameter methods, partitioned, including the raw-bits escape),
# wasted-bits shifts, the three stereo decorrelation modes
# (left-side / right-side / mid-side, side channel at bps+1), CRC-16
# frame verification and the STREAMINFO MD5 check over the decoded
# PCM. The encoder emits real fixed-blocksize streams (constant
# detection, best fixed order by residual magnitude, optional LPC and
# stereo decorrelation, selectable Rice partition order) so round-trip
# tests drive every decoder path. MP3 and Ogg-Vorbis/Opus still raise
# — their codecs need libraries the container does not ship; FLAC is
# pure integer prediction + Rice coding, fully in-spec here (and the
# Ogg transport + FLAC mapping reuse it for .oga payloads).


class _FlacBitWriter:
    """MSB-first bit accumulator (FLAC is big-endian at every level)."""

    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits <= 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        # q zero bits terminated by a one bit (RFC 9639 §9.4.1)
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        return bytes(self.buf)


class _FlacBitReader:
    """MSB-first reader over a byte window; EOF raises ValueError so a
    truncated stream is structural damage, never a silent zero-fill.
    Byte-accumulator design: a read refills whole bytes into ``acc``
    and slices bits arithmetically — one Python operation per byte,
    not per bit (the per-sample hot path of the decoder)."""

    __slots__ = ("data", "pos", "bit", "acc", "nbits")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos   # byte index of the NEXT unconsumed byte
        self.bit = 0     # kept in sync for align()/position accounting
        self.acc = 0
        self.nbits = 0

    def read(self, nbits: int) -> int:
        while self.nbits < nbits:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= nbits
        v = (self.acc >> self.nbits) & ((1 << nbits) - 1)
        self.acc &= (1 << self.nbits) - 1
        self.bit = (8 - self.nbits % 8) % 8
        return v

    def read_signed(self, nbits: int) -> int:
        u = self.read(nbits)
        return u - (1 << nbits) if u >= (1 << (nbits - 1)) else u

    def read_unary(self) -> int:
        q = 0
        # scan whole buffered chunks: count leading zeros in acc, refill
        # by bytes when exhausted (unary runs are short in Rice data,
        # but a pathological run still costs one op per byte, not bit)
        while True:
            if self.nbits == 0:
                if self.pos >= len(self.data):
                    raise ValueError("truncated FLAC bitstream")
                self.acc = self.data[self.pos]
                self.pos += 1
                self.nbits = 8
            if self.acc == 0:
                q += self.nbits
                self.nbits = 0
                continue
            lead = self.nbits - self.acc.bit_length()
            q += lead
            self.nbits -= lead + 1  # consume the zeros and the 1 bit
            self.acc &= (1 << self.nbits) - 1
            self.bit = (8 - self.nbits % 8) % 8
            return q

    def align(self) -> None:
        # drop the partial byte in the accumulator
        drop = self.nbits % 8
        self.nbits -= drop
        self.acc &= (1 << self.nbits) - 1
        self.bit = 0

    @property
    def byte_pos(self) -> int:
        """Index of the next unconsumed byte, counting buffered whole
        bytes still in the accumulator (valid when byte-aligned)."""
        return self.pos - self.nbits // 8


def _crc_tables() -> tuple[list[int], list[int]]:
    """256-entry byte tables for the two FLAC CRCs, built once per
    process at import (2×256×8 shift steps — negligible). Each table
    entry is the bit-at-a-time fold of one input byte, so the
    table-driven loops below compute exactly the same remainders."""
    t8, t16 = [], []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        t8.append(c)
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
        t16.append(c)
    return t8, t16


_CRC8_TABLE, _CRC16_TABLE = _crc_tables()


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0 — frame headers.
    Table-driven (was bit-at-a-time: ~40 ops/byte → ~3)."""
    crc = 0
    table = _CRC8_TABLE
    for b in data:
        crc = table[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0 — frames.
    Table-driven byte-wise — this runs over every encoded AND decoded
    frame, the single hottest function in the FLAC path before this
    change (40% of decode CPU profiled at bit-at-a-time)."""
    crc = 0
    table = _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFF00) ^ table[(crc >> 8) ^ b]
    return crc


def _utf8_coded(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame/sample index, up to 36
    bits — one byte past standard UTF-8's 6-byte form)."""
    if n < 0x80:
        return bytes([n])
    out = []
    for lead_bits, lead in ((11, 0xC0), (16, 0xE0), (21, 0xF0),
                            (26, 0xF8), (31, 0xFC), (36, 0xFE)):
        if n < (1 << lead_bits):
            cont = (lead_bits - 6) // 5  # continuation byte count
            head_bits = lead_bits - 6 * cont
            out.append(lead | (n >> (6 * cont)) & ((1 << head_bits) - 1))
            for i in range(cont - 1, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number exceeds 36 bits")


def _read_utf8_coded(r: _FlacBitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    ones = 0
    while ones < 8 and b0 & (0x80 >> ones):
        ones += 1
    if not 2 <= ones <= 7:
        raise ValueError("invalid UTF-8-coded number in frame header")
    n = b0 & ((1 << (7 - ones)) - 1)
    for _ in range(ones - 1):
        nb = r.read(8)
        if nb & 0xC0 != 0x80:
            raise ValueError("invalid UTF-8-coded number continuation")
        n = (n << 6) | (nb & 0x3F)
    return n


_FIXED_COEFS = ([], [1], [2, -1], [3, -3, 1], [4, -6, 4, -1])


def _fixed_residual(samples: list[int], order: int) -> list[int]:
    coefs = _FIXED_COEFS[order]
    return [
        samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        for i in range(order, len(samples))
    ]


def _fixed_reconstruct_exact(warm: list[int], res: list[int],
                             order: int) -> list[int]:
    """Arbitrary-precision reference recurrence — the pre-vectorization
    sequential path, kept as the overflow fallback below."""
    vals = list(warm)
    coefs = _FIXED_COEFS[order]
    for v in res:
        vals.append(v + sum(c * vals[-1 - j] for j, c in enumerate(coefs)))
    return vals


def _fixed_reconstruct(warm: list[int], res: list[int],
                       order: int) -> list[int]:
    """Invert the order-k fixed predictor: the residual is the k-th
    finite difference of the samples, so reconstruction is k rounds of
    cumulative summation seeded by the warm-up samples' difference
    pyramid — exact integer arithmetic, identical to the sequential
    ``v + Σ c·vals[-1-j]`` recurrence it replaces. Adversarial streams
    can carry residuals near 2^60 (escape-coded partitions), where the
    int64 cumsum would wrap silently — those take the exact-arithmetic
    fallback instead (legit ≤24-bit audio never does: its magnitudes
    stay far below every guard)."""
    if order == 0:
        return list(res)
    import numpy as np

    # input guard: keep the warm-up difference pyramid (≤ 2^{order-1}
    # growth) and the conversion comfortably inside int64. The bound is
    # taken from the converted array (a per-element Python genexpr here
    # profiled at ~14% of decode); values ≥ 2^63 raise OverflowError in
    # the conversion itself, below that min/max are exact — negation
    # done in Python ints so -2^62-style minima can't wrap.
    try:
        v = np.asarray(res, dtype=np.int64)
        warm_arr = np.asarray(warm, dtype=np.int64)
    except OverflowError:
        return _fixed_reconstruct_exact(warm, res, order)
    bound = max(
        int(v.max(initial=0)), -int(v.min(initial=0)),
        int(warm_arr.max(initial=0)), -int(warm_arr.min(initial=0)),
    )
    if bound >= 1 << 58:
        return _fixed_reconstruct_exact(warm, res, order)
    n = int(v.size)
    for k in range(order, 0, -1):
        init = np.diff(warm_arr, n=k - 1)[-1] if k > 1 else warm_arr[-1]
        # per-round guard: every cumsum prefix is bounded by
        # n·max|v| + |init|; if that cannot fit int64 the round could
        # wrap silently — replay the exact recurrence instead
        if n and n * int(np.abs(v).max()) + abs(int(init)) >= 1 << 63:
            return _fixed_reconstruct_exact(warm, res, order)
        v = int(init) + np.cumsum(v)
    return warm + v.tolist()


def _rice_param_for(residual: list[int]) -> int:
    total = sum((v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
                for v in residual)  # zigzag magnitudes
    k = 0
    while k < 14 and (len(residual) << (k + 1)) < total:
        k += 1
    return k


def _write_residual(w: _FlacBitWriter, residual: list[int], order: int,
                    blocksize: int, partition_order: int,
                    force_escape: bool) -> None:
    if blocksize % (1 << partition_order) or \
            (blocksize >> partition_order) <= order:
        partition_order = 0
    w.write(0, 2)  # coding method 0: 4-bit Rice parameters
    w.write(partition_order, 4)
    pos = 0
    for p in range(1 << partition_order):
        n = (blocksize >> partition_order) - (order if p == 0 else 0)
        part = residual[pos:pos + n]
        pos += n
        if force_escape:
            raw_bits = max(
                (v.bit_length() + 1 for v in part), default=1)
            w.write(0b1111, 4)
            w.write(raw_bits, 5)
            for v in part:
                w.write(v & ((1 << raw_bits) - 1), raw_bits)
            continue
        k = _rice_param_for(part)
        w.write(k, 4)
        for v in part:
            u = (v << 1) if v >= 0 else (((-v) << 1) - 1)
            w.write_unary(u >> k)
            w.write(u & ((1 << k) - 1), k)


def _read_residual(r: _FlacBitReader, order: int, blocksize: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    partition_order = r.read(4)
    if blocksize % (1 << partition_order):
        raise ValueError("residual partition order does not divide blocksize")
    out: list[int] = []
    for p in range(1 << partition_order):
        n = (blocksize >> partition_order) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("predictor order exceeds first partition")
        k = r.read(param_bits)
        if k == escape:
            raw_bits = r.read(5)
            out.extend(r.read_signed(raw_bits) if raw_bits else 0
                       for _ in range(n))
            continue
        # Rice decode with the reader state in locals — the same
        # byte-refill arithmetic read_unary()/read() perform, without
        # two method calls + attribute traffic per sample (the
        # decoder's per-sample hot path); state is written back after
        # each partition
        data = r.data
        dlen = len(data)
        acc = r.acc
        nbits = r.nbits
        pos = r.pos
        append = out.append
        kmask = (1 << k) - 1
        for _ in range(n):
            q = 0
            while True:  # unary quotient: count zeros to the next 1
                if nbits == 0:
                    if pos >= dlen:
                        raise ValueError("truncated FLAC bitstream")
                    acc = data[pos]
                    pos += 1
                    nbits = 8
                if acc == 0:
                    q += nbits
                    nbits = 0
                    continue
                lead = nbits - acc.bit_length()
                q += lead
                nbits -= lead + 1
                acc &= (1 << nbits) - 1
                break
            while nbits < k:
                if pos >= dlen:
                    raise ValueError("truncated FLAC bitstream")
                acc = (acc << 8) | data[pos]
                pos += 1
                nbits += 8
            nbits -= k
            u = (q << k) | ((acc >> nbits) & kmask)
            acc &= (1 << nbits) - 1
            append((u >> 1) ^ -(u & 1))
        r.acc = acc
        r.nbits = nbits
        r.pos = pos
        r.bit = (8 - nbits % 8) % 8
    return out


def _write_subframe(w: _FlacBitWriter, samples: list[int], bps: int,
                    blocksize: int, use_lpc: bool, partition_order: int,
                    force_escape: bool) -> None:
    if all(s == samples[0] for s in samples):
        w.write(0, 1)
        w.write(0b000000, 6)  # CONSTANT
        w.write(0, 1)
        w.write(samples[0] & ((1 << bps) - 1), bps)
        return
    # wasted-bits auto-detection (RFC 9639 §9.2.2): when every sample
    # shares k low zero bits, code the subframe at bps-k and record k
    # as flag-bit 1 + unary(k-1); the decoder shifts back
    wasted = min((s & -s).bit_length() - 1 for s in samples if s) \
        if any(samples) else 0
    wasted = min(wasted, bps - 1)
    if wasted > 0:
        samples = [s >> wasted for s in samples]
        bps -= wasted

    def header(type_bits: int) -> None:
        w.write(0, 1)
        w.write(type_bits, 6)
        if wasted > 0:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)

    if use_lpc:
        # order-2 quantized-LPC with coefficients [2, -1], shift 0 —
        # numerically the order-2 fixed predictor, but carried through
        # the LPC subframe layout (precision/shift/coef fields)
        order, coefs, precision, shift = 2, (2, -1), 4, 0
        header(0b100000 | (order - 1))
        for shead in samples[:order]:
            w.write(shead & ((1 << bps) - 1), bps)
        w.write(precision - 1, 4)
        w.write(shift & 0x1F, 5)
        for c in coefs:
            w.write(c & ((1 << precision) - 1), precision)
        residual = [
            samples[i] - ((2 * samples[i - 1] - samples[i - 2]) >> shift)
            for i in range(order, len(samples))
        ]
    else:
        # order selection vectorized: _fixed_residual(s, o) IS the o-th
        # finite difference, so compute np.diff iteratively and keep
        # the winning residual (same |residual| sums exactly — integer
        # arithmetic; ties keep the lowest order, like min() did)
        import numpy as np

        arr = np.asarray(samples, dtype=np.int64)
        order = 0
        best_cost = None
        best_res = arr
        d = arr
        for o in range(5):
            if o >= len(samples):
                break
            if o > 0:
                d = d[1:] - d[:-1]
            cost = int(np.abs(d).sum())
            if best_cost is None or cost < best_cost:
                order, best_cost, best_res = o, cost, d
        header(0b001000 | order)  # FIXED
        for shead in samples[:order]:
            w.write(shead & ((1 << bps) - 1), bps)
        residual = best_res.tolist()
    _write_residual(w, residual, order, blocksize, partition_order,
                    force_escape)


def _flac_md5_update(md5, frames, nbytes: int) -> None:
    """MD5 over the interleaved little-endian PCM bytes (RFC 9639
    STREAMINFO digest) — one vectorized pass, not a per-sample loop."""
    import numpy as np

    if not frames:
        return
    flat = np.asarray(frames, dtype=np.int64).ravel()
    if nbytes in (1, 2, 4):
        md5.update(flat.astype(f"<i{nbytes}").tobytes())
    else:  # 3-byte samples: low three bytes of the 4-byte LE form
        u = (flat & 0xFFFFFFFF).astype("<u4")
        md5.update(np.ascontiguousarray(
            u.view(np.uint8).reshape(-1, 4)[:, :3]).tobytes())


def encode_flac(sample_rate: int, samples, bits_per_sample: int = 16,
                block_size: int = 256, stereo_mode: str = "independent",
                use_lpc: bool = False, partition_order: int = 0,
                force_escape: bool = False) -> bytes:
    """Encode interleaved PCM (``samples``: sequence of per-frame
    tuples/lists, or a flat sequence for mono) into a real
    fixed-blocksize FLAC stream. Every emitted construct is decodable
    by any spec-conforming decoder: STREAMINFO with the PCM MD5,
    framed Rice-coded fixed/LPC subframes, CRC-8/CRC-16 protected."""
    import hashlib

    if sample_rate <= 0 or not (4 <= bits_per_sample <= 32):
        raise ValueError("bad sample_rate/bits_per_sample")
    if block_size < 16 or block_size > 65535:
        raise ValueError("block_size must be in [16, 65535]")
    frames = [list(f) if isinstance(f, (tuple, list)) else [int(f)]
              for f in samples]
    channels = len(frames[0]) if frames else 1
    if not (1 <= channels <= 8):
        raise ValueError("1..8 channels")
    if any(len(f) != channels for f in frames):
        raise ValueError("ragged channel data")
    lim = 1 << (bits_per_sample - 1)
    if any(not (-lim <= s < lim) for f in frames for s in f):
        raise ValueError("sample exceeds bits_per_sample")
    if stereo_mode != "independent" and channels != 2:
        raise ValueError("stereo decorrelation requires 2 channels")
    n_total = len(frames)

    md5 = hashlib.md5()
    _flac_md5_update(md5, frames, (bits_per_sample + 7) // 8)

    out = bytearray(b"fLaC")
    si = _FlacBitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)  # min/max frame size unknown
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bits_per_sample - 1, 5)
    si.write(n_total, 36)
    info = si.getvalue() + md5.digest()
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + info  # last block

    chan_code = {"independent": channels - 1, "left_side": 0b1000,
                 "right_side": 0b1001, "mid_side": 0b1010}[stereo_mode]
    bps_code = {8: 0b001, 12: 0b010, 16: 0b100,
                20: 0b101, 24: 0b110, 32: 0b111}.get(bits_per_sample, 0b000)

    for fidx in range((n_total + block_size - 1) // block_size):
        block = frames[fidx * block_size:(fidx + 1) * block_size]
        bs = len(block)
        hw = _FlacBitWriter()
        hw.write(0b11111111111110, 14)
        hw.write(0, 1)   # reserved
        hw.write(0, 1)   # fixed blocksize strategy → frame number
        hw.write(0b0111, 4)  # blocksize: 16-bit value-1 at header end
        hw.write(0b0000, 4)  # sample rate: from STREAMINFO
        hw.write(chan_code, 4)
        hw.write(bps_code, 3)
        hw.write(0, 1)   # reserved
        header = hw.getvalue() + _utf8_coded(fidx) \
            + (bs - 1).to_bytes(2, "big")
        header += bytes([_crc8(header)])

        if stereo_mode == "independent":
            chans = [([f[c] for f in block], bits_per_sample)
                     for c in range(channels)]
        else:
            left = [f[0] for f in block]
            right = [f[1] for f in block]
            side = [a - b for a, b in zip(left, right)]
            if stereo_mode == "left_side":
                chans = [(left, bits_per_sample), (side, bits_per_sample + 1)]
            elif stereo_mode == "right_side":
                chans = [(side, bits_per_sample + 1), (right, bits_per_sample)]
            else:
                mid = [(a + b) >> 1 for a, b in zip(left, right)]
                chans = [(mid, bits_per_sample), (side, bits_per_sample + 1)]

        bw = _FlacBitWriter()
        for ch, ch_bps in chans:
            _write_subframe(bw, ch, ch_bps, bs, use_lpc, partition_order,
                            force_escape)
        bw.align()
        frame = header + bw.getvalue()
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
    return bytes(out)


_FLAC_BLOCKSIZE_TABLE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                         8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                         13: 8192, 14: 16384, 15: 32768}
_FLAC_RATE_TABLE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                    6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                    11: 96000}


def _flac_pcm(payload: bytes):
    """Full FLAC decode → (sample_rate, channels, bits_per_sample,
    list of per-frame sample lists). Verifies frame CRC-8/CRC-16 and
    the STREAMINFO MD5 of the decoded PCM."""
    import hashlib

    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        head = payload[pos]
        size = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + size]
        if len(body) != size:
            raise ValueError("truncated FLAC metadata block")
        if head & 0x7F == 0:
            if size != 34:
                raise ValueError("STREAMINFO must be 34 bytes")
            streaminfo = body
        elif head & 0x7F == 127:
            raise ValueError("invalid metadata block type 127")
        pos += 4 + size
        if head & 0x80:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    r = _FlacBitReader(streaminfo)
    r.read(16)  # min blocksize
    r.read(16)  # max blocksize
    r.read(24)
    r.read(24)
    sample_rate = r.read(20)
    channels = r.read(3) + 1
    bps = r.read(5) + 1
    n_total = r.read(36)
    md5_expect = streaminfo[18:34]

    frames: list[list[int]] = []
    # n_total == 0 is spec-legal "unknown" (live-capture encoders):
    # decode until the payload is exhausted instead of silently
    # returning zero frames for a file full of audio
    while (len(frames) < n_total) if n_total else (pos < len(payload)):
        r = _FlacBitReader(payload, pos)
        frame_start = pos
        if r.read(14) != 0b11111111111110:
            raise ValueError("lost FLAC frame sync")
        if r.read(1):
            raise ValueError("reserved frame-header bit set")
        r.read(1)  # blocking strategy (frame vs sample number — both ok)
        bs_code = r.read(4)
        rate_code = r.read(4)
        chan_code = r.read(4)
        bps_code = r.read(3)
        if r.read(1):
            raise ValueError("reserved frame-header bit set")
        _read_utf8_coded(r)
        if bs_code == 0:
            raise ValueError("reserved blocksize code 0")
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = _FLAC_BLOCKSIZE_TABLE[bs_code]
        if rate_code == 12:
            r.read(8)
        elif rate_code in (13, 14):
            r.read(16)
        elif rate_code == 15:
            raise ValueError("invalid sample-rate code 15")
        r.align()
        header_bytes = payload[frame_start:r.byte_pos]
        crc8 = payload[r.byte_pos] if r.byte_pos < len(payload) else None
        if crc8 is None or _crc8(header_bytes) != crc8:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        r.read(8)  # consume the CRC byte

        frame_bps = bps if bps_code == 0 else \
            {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(bps_code)
        if frame_bps is None:
            raise ValueError(f"reserved sample-size code {bps_code}")
        if chan_code <= 7:
            n_sub, mode = chan_code + 1, "independent"
        elif chan_code in (8, 9, 10):
            n_sub, mode = 2, {8: "left_side", 9: "right_side",
                              10: "mid_side"}[chan_code]
        else:
            raise ValueError(f"reserved channel assignment {chan_code}")

        subs = []
        for ci in range(n_sub):
            sub_bps = frame_bps
            if (mode == "left_side" and ci == 1) or \
               (mode == "right_side" and ci == 0) or \
               (mode == "mid_side" and ci == 1):
                sub_bps += 1
            if r.read(1):
                raise ValueError("subframe padding bit set")
            stype = r.read(6)
            wasted = 0
            if r.read(1):
                wasted = r.read_unary() + 1
                sub_bps -= wasted
            if stype == 0b000000:
                vals = [r.read_signed(sub_bps)] * bs
            elif stype == 0b000001:
                vals = [r.read_signed(sub_bps) for _ in range(bs)]
            elif 0b001000 <= stype <= 0b001100:
                order = stype & 0b000111
                warm = [r.read_signed(sub_bps) for _ in range(order)]
                res = _read_residual(r, order, bs)
                vals = _fixed_reconstruct(warm, res, order)
            elif stype >= 0b100000:
                order = (stype & 0b011111) + 1
                warm = [r.read_signed(sub_bps) for _ in range(order)]
                prec = r.read(4) + 1
                if prec == 16:
                    raise ValueError("invalid LPC precision code 1111")
                shift = r.read_signed(5)
                if shift < 0:
                    raise ValueError("negative LPC shift")
                coefs = [r.read_signed(prec) for _ in range(order)]
                res = _read_residual(r, order, bs)
                if shift == 0 and coefs == [2, -1]:
                    # this LPC parameterization IS the order-2 fixed
                    # predictor (>>0 is exact) — same cumsum inverse
                    vals = _fixed_reconstruct(warm, res, 2)
                else:
                    vals = list(warm)
                    for v in res:
                        pred = sum(c * vals[-1 - j]
                                   for j, c in enumerate(coefs)) >> shift
                        vals.append(v + pred)
            else:
                raise ValueError(f"reserved subframe type {stype:#08b}")
            if wasted:
                vals = [v << wasted for v in vals]
            subs.append(vals)
        r.align()
        bp = r.byte_pos
        crc_expect = int.from_bytes(payload[bp:bp + 2], "big")
        if len(payload) < bp + 2 or \
                _crc16(payload[frame_start:bp]) != crc_expect:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = bp + 2

        if mode == "independent":
            chans = subs
        elif mode == "left_side":
            left, side = subs
            chans = [left, [a - b for a, b in zip(left, side)]]
        elif mode == "right_side":
            side, right = subs
            chans = [[a + b for a, b in zip(side, right)], right]
        else:  # mid_side (the libFLAC reconstruction: the side channel's
            # low bit restores the precision the encoder's floor lost)
            mid, side = subs
            chans = [
                [(((m << 1) | (s & 1)) + s) >> 1 for m, s in zip(mid, side)],
                [(((m << 1) | (s & 1)) - s) >> 1 for m, s in zip(mid, side)],
            ]
        frames.extend(list(f) for f in zip(*chans))

    if n_total and len(frames) != n_total:
        raise ValueError("FLAC decoded sample count mismatch")
    md5 = hashlib.md5()
    _flac_md5_update(md5, frames, (bps + 7) // 8)
    if md5.digest() != md5_expect and md5_expect != b"\x00" * 16:
        raise ValueError("FLAC PCM MD5 mismatch (decoded audio differs)")
    return sample_rate, channels, bps, frames


def decode_flac(payload: bytes) -> dict:
    """Feature extraction over a REAL FLAC decode (prediction + Rice
    residuals reconstructed, CRCs and the STREAMINFO MD5 verified) —
    same key set as :func:`decode_wav`, so the audio tier treats both
    containers uniformly."""
    sample_rate, channels, bps, frames = _flac_pcm(payload)
    n_frames = len(frames)
    n_samples = n_frames * channels
    import numpy as _np

    total = int(_np.asarray(frames, dtype=_np.int64).sum()) if frames else 0
    return {
        "media_kind": "audio",
        "sample_rate": sample_rate,
        "channels": channels,
        "bit_depth": bps,
        "n_units": n_frames,
        "duration_ms": (n_frames * 1000.0 / sample_rate) if sample_rate
        else 0.0,
        "mean_value": (total / n_samples) if n_samples else 0.0,
        "n_bytes": len(payload),
    }


# --------------------------------------------------------------- PNG codec
#
# Dependency-free 8-bit PNG from the public spec (RFC 2083 / W3C
# PNG 1.2): stdlib zlib handles the DEFLATE stream, this module
# implements the chunk walk (with per-chunk CRC32 verification) and
# the five scanline filter reconstructions; indexed (color type 3)
# files map reconstructed indexes through the PLTE; Adam7-interlaced
# files reconstruct each of the seven independently-filtered passes
# and scatter them back; 16-bit (non-palette) files filter on bytes
# at the doubled stride and read samples big-endian. 1/2/4-bit files
# raise the documented NotImplementedError boundary; structural
# damage raises ValueError.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (greyscale, truecolor, grey+alpha, RGBA)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor, verbatim from the spec: the neighbor (left,
    up, upper-left) whose value is closest to a+b-c, ties breaking
    left → up → upper-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_filter_rows(
    samples: bytes, width_px: int, height: int, bpp: int
) -> bytearray:
    """Filter one (sub-)image's rows with type ``row % 5`` (fresh
    predictor chain), so every spec filter stays load-bearing in each
    Adam7 pass exactly as in the sequential layout. ``bpp`` is BYTES
    per pixel (the spec's filters work on bytes at any bit depth)."""
    stride = width_px * bpp
    out = bytearray()
    prev = bytes(stride)
    for r in range(height):
        line = samples[r * stride : (r + 1) * stride]
        ftype = r % 5
        filt = bytearray(stride)
        for i in range(stride):
            left = line[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:
                pred = _paeth(left, up, ul)
            filt[i] = (line[i] - pred) & 0xFF
        out += bytes([ftype]) + filt
        prev = line
    return out


def encode_png(
    width: int,
    height: int,
    base_value: int = 0,
    color_type: int = 2,
    samples: bytes | None = None,
    palette: bytes | None = None,
    interlaced: bool = False,
    bit_depth: int = 8,
) -> bytes:
    """Build a real 8-bit (or 16-bit non-palette) PNG. Each row is
    filtered with type
    ``row % 5`` so a round-trip exercises ALL five spec filters
    (None/Sub/Up/Average/Paeth) — a constant-pixel image would let
    several reconstruction bugs cancel out, so the default content is
    the gradient ``sample(r, c, ch) = base_value + 7r + 13c + ch``
    (validated not to wrap a byte), whose mean is closed-form in the
    geometry: ``base + 7(h-1)/2 + 13(w-1)/2 + (channels-1)/2``.
    ``samples`` overrides the gradient with raw sample bytes
    (row-major, channel-interleaved).

    ``color_type=3`` builds an indexed (palette) PNG: samples are
    8-bit palette indexes and ``palette`` supplies the PLTE RGB
    triples (default: the 256-entry identity grayscale).

    ``bit_depth=16``: samples are big-endian 16-bit (``samples`` is
    then ``w*h*channels*2`` raw bytes); the default gradient scales
    by 257 (``v*257`` has identical high/low bytes, so the spec's
    16→8 reduction — the high byte — recovers the 8-bit gradient
    exactly and the 16-bit mean is 257× the 8-bit closed form)."""
    import zlib

    channels = 1 if color_type == 3 else _PNG_CHANNELS.get(color_type)
    if channels is None:
        raise ValueError("color_type must be one of 0/2/3/4/6")
    allowed = {0: (1, 2, 4, 8, 16), 3: (1, 2, 4, 8)}.get(
        color_type, (8, 16))
    if bit_depth not in allowed:
        raise ValueError(
            f"bit_depth {bit_depth} invalid for color type {color_type}"
        )
    if palette is not None and color_type != 3:
        raise ValueError("palette only applies to color_type=3")
    if color_type == 3:
        if palette is None:
            palette = bytes(v for i in range(256) for v in (i, i, i))
        # type check FIRST: len() on an unsized argument (int,
        # generator) must surface as the intended ValueError, and a
        # list of ints must not slip past via len/%3 succeeding
        if (not isinstance(palette, (bytes, bytearray))
                or not 3 <= len(palette) <= 768 or len(palette) % 3):
            raise ValueError("palette must be 1..256 RGB byte triples")
    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")
    sub_byte = bit_depth < 8
    bpp = 1 if sub_byte else channels * (bit_depth // 8)
    stride = width * channels * (2 if bit_depth == 16 else 1)
    if sub_byte:
        if samples is None:
            raise ValueError(
                f"{bit_depth}-bit PNG needs explicit samples "
                "(one byte per sample, values < 2^depth)")
        if len(samples) != width * height:
            raise ValueError("samples length != width*height")
    elif samples is None:
        top = base_value + 7 * (height - 1) + 13 * (width - 1) + channels - 1
        if not (0 <= base_value and top <= 255):
            raise ValueError(
                f"gradient peak {top} exceeds a byte; lower base_value"
            )
        if bit_depth == 16:
            samples = bytes(
                v for r in range(height) for c in range(width)
                for ch in range(channels)
                for v in ((base_value + 7 * r + 13 * c + ch),) * 2
            )  # v*257 big-endian = (v, v)
        else:
            samples = bytes(
                base_value + 7 * r + 13 * c + ch
                for r in range(height)
                for c in range(width)
                for ch in range(channels)
            )
    elif len(samples) != stride * height:
        raise ValueError(
            "samples length != width*height*channels*(bit_depth//8)"
        )
    if color_type == 3 and max(samples) >= len(palette) // 3:
        raise ValueError(
            f"palette index {max(samples)} out of range for a "
            f"{len(palette) // 3}-entry palette"
        )
    unit = 1 if sub_byte else bpp
    if interlaced:
        # Adam7: extract each pass's sub-image and filter it with a
        # fresh predictor chain (the spec's per-pass independence);
        # sub-byte passes pack to their own byte-padded scanlines
        filtered = bytearray()
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub = bytearray()
            for r in range(ph):
                for c in range(pw):
                    src = ((y0 + r * dy) * width
                           + (x0 + c * dx)) * unit
                    sub += samples[src : src + unit]
            if sub_byte:
                sub = _png_pack_bits(bytes(sub), pw, ph, bit_depth)
                filtered += _png_filter_rows(
                    bytes(sub), _png_row_stride(pw, 1, bit_depth), ph, 1)
            else:
                filtered += _png_filter_rows(bytes(sub), pw, ph, bpp)
    elif sub_byte:
        packed = _png_pack_bits(samples, width, height, bit_depth)
        filtered = _png_filter_rows(
            packed, _png_row_stride(width, 1, bit_depth), height, 1)
    else:
        filtered = _png_filter_rows(samples, width, height, bpp)
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type,
                       0, 0, 1 if interlaced else 0)
    idat = zlib.compress(bytes(filtered), 6)
    plte = _png_chunk(b"PLTE", bytes(palette)) if color_type == 3 else b""
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + plte
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


# Adam7 pass grid: (x-start, y-start, x-step, y-step), spec order
_ADAM7_PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_row_stride(width_px: int, channels: int, depth: int) -> int:
    """Packed scanline bytes: sub-byte depths pack MSB-first with the
    row padded to a whole byte (PNG spec §7.2)."""
    return (width_px * channels * depth + 7) // 8


def _png_unpack_bits(packed: bytes, width: int, height: int,
                     depth: int) -> bytes:
    """Expand MSB-first 1/2/4-bit scanlines to one byte per sample,
    dropping each row's padding bits — vectorized (numpy shift/mask
    gather, no per-pixel Python)."""
    import numpy as np

    stride = _png_row_stride(width, 1, depth)
    arr = np.frombuffer(bytes(packed), np.uint8).reshape(height, stride)
    per = 8 // depth
    wide = np.zeros((height, stride * per), dtype=np.uint8)
    mask = (1 << depth) - 1
    for i in range(per):
        wide[:, i::per] = (arr >> (8 - depth * (i + 1))) & mask
    return wide[:, :width].tobytes()


def _png_pack_bits(samples: bytes, width: int, height: int,
                   depth: int) -> bytes:
    """Inverse of ``_png_unpack_bits`` for the encoder: one byte per
    sample → MSB-first packed rows, byte-padded."""
    stride = _png_row_stride(width, 1, depth)
    per = 8 // depth
    out = bytearray(stride * height)
    for r in range(height):
        for c in range(width):
            v = samples[r * width + c]
            if v >> depth:
                raise ValueError(
                    f"sample {v} exceeds {depth}-bit range")
            out[r * stride + c // per] |= v << (8 - depth * (c % per + 1))
    return bytes(out)


def _png_unfilter(
    raw: bytes, offset: int, width_px: int, height: int, bpp: int,
    stride: int | None = None
) -> tuple[bytearray, int]:
    """Reconstruct one (sub-)image's scanlines from ``raw`` starting at
    ``offset`` (filter-type byte + filtered samples per row, predictor
    chain starting fresh). ``bpp`` is BYTES per pixel (channels × the
    sample width — the spec's filters operate on bytes regardless of
    bit depth; sub-byte depths pass ``bpp=1`` with the packed
    ``stride``). Returns (samples, offset past the image) — shared by
    the sequential path and each Adam7 pass."""
    if stride is None:
        stride = width_px * bpp
    need = (stride + 1) * height
    if offset + need > len(raw):
        raise ValueError(
            f"PNG pixel data is {len(raw)} bytes, geometry needs "
            f"{offset + need}"
        )
    prev = bytearray(stride)
    recon = bytearray()
    for r in range(height):
        off = offset + r * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        recon += line
        prev = line
    return recon, offset + need


def _png_parse(payload: bytes) -> tuple[int, int, int, bytearray]:
    """Full PNG parse + filter reconstruction. Returns (width, height,
    channels, reconstructed samples row-major channel-interleaved) —
    shared by the stats decoder and the pixel path."""
    import zlib

    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, end = 8, len(payload)
    ihdr: bytes | None = None
    plte: bytes | None = None
    idat: list[bytes] = []
    seen_iend = False
    while pos + 12 <= end:
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body_start = pos + 8
        if body_start + length + 4 > end:
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        body = payload[body_start : body_start + length]
        (crc,) = struct.unpack_from(">I", payload, body_start + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            seen_iend = True
            break
        pos = body_start + length + 4
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT chunk")
    if not seen_iend:
        raise ValueError("truncated PNG: no IEND chunk")
    if len(ihdr) != 13:
        raise ValueError(f"bad IHDR length {len(ihdr)}")
    width, height, bit_depth, color_type, comp, filt_method, interlace = (
        struct.unpack(">IIBBBBB", ihdr)
    )
    if width <= 0 or height <= 0:
        raise ValueError(f"malformed PNG geometry {width}x{height}")
    if comp != 0 or filt_method != 0:
        raise ValueError(
            f"bad PNG compression/filter method {comp}/{filt_method}"
        )
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    channels = 1 if color_type == 3 else _PNG_CHANNELS.get(color_type)
    if channels is None:
        raise ValueError(f"bad PNG color type {color_type}")
    allowed = {0: (1, 2, 4, 8, 16), 3: (1, 2, 4, 8)}.get(
        color_type, (8, 16))
    if bit_depth not in allowed:
        raise ValueError(
            f"invalid PNG bit depth {bit_depth} for color type "
            f"{color_type} (spec allows {allowed})"
        )
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG is missing its PLTE chunk")
        if not 3 <= len(plte) <= 768 or len(plte) % 3:
            raise ValueError(f"bad PLTE length {len(plte)}")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG DEFLATE stream: {exc}") from exc
    sub_byte = bit_depth < 8
    bpp = 1 if sub_byte else channels * (bit_depth // 8)
    if interlace == 0:
        stride = _png_row_stride(width, channels, bit_depth)
        if len(raw) != (stride + 1) * height:
            raise ValueError(
                f"PNG pixel data is {len(raw)} bytes, geometry needs "
                f"{(stride + 1) * height}"
            )
        recon = _png_unfilter(raw, 0, width, height, bpp, stride)[0]
        if sub_byte:
            recon = bytearray(
                _png_unpack_bits(recon, width, height, bit_depth))
    else:
        # Adam7: seven independently-filtered sub-images (the filter
        # predictor chain resets per pass), scattered back to the
        # grid; sub-byte passes unpack BEFORE scattering — each
        # pass's scanlines are independently byte-padded (§8.2)
        unit = 1 if sub_byte else bpp
        recon = bytearray(width * height * unit)
        off = 0
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass contributes no scanlines
            pstride = _png_row_stride(pw, channels, bit_depth)
            sub, off = _png_unfilter(raw, off, pw, ph, bpp, pstride)
            if sub_byte:
                sub = _png_unpack_bits(sub, pw, ph, bit_depth)
            for r in range(ph):
                for c in range(pw):
                    src = (r * pw + c) * unit
                    dst = ((y0 + r * dy) * width + (x0 + c * dx)) * unit
                    recon[dst : dst + unit] = sub[src : src + unit]
        if off != len(raw):
            raise ValueError(
                f"PNG pixel data is {len(raw)} bytes, Adam7 geometry "
                f"needs {off}"
            )
    if color_type == 3:
        # indexed: map each reconstructed index through the PLTE —
        # callers see expanded RGB, so a palette-lookup bug shifts
        # the oracle's mean exactly like a filter bug would
        # (vectorized gather, no per-pixel Python)
        import numpy as np

        n_entries = len(plte) // 3
        idx = np.frombuffer(bytes(recon), np.uint8)
        if len(idx) and int(idx.max()) >= n_entries:
            raise ValueError(
                f"PNG palette index {int(idx.max())} out of range for "
                f"a {n_entries}-entry PLTE"
            )
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        return width, height, 3, bytearray(pal[idx].tobytes()), 8
    return width, height, channels, recon, bit_depth


def decode_png(payload: bytes) -> dict:
    """Decode an 8- or 16-bit PNG for real: chunk walk with CRC32
    verification, zlib inflate, and per-row filter reconstruction
    (None/Sub/Up/Average/Paeth). Statistics cover all reconstructed
    SAMPLE VALUES (16-bit samples read big-endian per the spec) — any
    filter-arithmetic bug shifts ``mean_value`` and breaks the oracle.
    Ancillary chunks (tEXt, gAMA, ...) are skipped per the spec;
    multiple IDAT chunks concatenate into one DEFLATE stream."""
    width, height, channels, recon, depth = _png_parse(payload)
    n_pixels = width * height
    n_samples = n_pixels * channels
    if depth == 16:
        total = sum((recon[i] << 8) | recon[i + 1]
                    for i in range(0, len(recon), 2))
    else:
        total = sum(recon)
    return {
        "media_kind": "image",
        "width": width,
        "height": height,
        "bit_depth": depth,
        "n_units": n_pixels,
        "mean_value": (total / n_samples) if n_samples else 0.0,
        "n_bytes": len(payload),
    }


# --------------------------------------------------------------- GIF codec
#
# Dependency-free GIF87a/89a from the public spec: variable-width LZW
# (the real compression algorithm, clear/end codes, dictionary growth
# synchronized with the decoder's one-code lag), palette mapping,
# sub-block framing, and four-pass interlace (rows scatter back per
# the descriptor flag). Structural damage raises ValueError.


def _gif_lzw_encode(min_code_size: int, pixels: bytes) -> bytes:
    """Real LZW (not the uncompressed-GIF trick): greedy longest-match
    dictionary build. Growth rule: the encoder widens after ADDING the
    entry whose code equals 2^code_size — one code earlier than the
    decoder widens, which is exactly the decoder's one-entry lag."""
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    acc = 0
    nacc = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += code_size
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    w = b""
    for px in pixels:
        wk = w + bytes([px])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:  # table full: reset, exactly as the spec allows
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([px])
    if w:
        emit(table[w])
    emit(end)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> bytearray:
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[int, bytes] = {i: bytes([i]) for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while True:
        if bitpos + code_size > total_bits:
            raise ValueError("truncated GIF LZW stream (no end code)")
        code = 0
        for i in range(code_size):
            code |= ((data[(bitpos + i) >> 3] >> ((bitpos + i) & 7)) & 1) << i
        bitpos += code_size
        if code == clear:
            table = {i: bytes([i]) for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError(f"bad GIF LZW code {code} after clear")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"bad GIF LZW code {code}")
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        out += entry
        if len(out) > max_pixels:
            raise ValueError("GIF LZW stream decodes past the image size")
        prev = entry


def _gif_interlace_rows(height: int) -> list[int]:
    """The GIF87a/89a four-pass interlace row order: every 8th row
    from 0, every 8th from 4, every 4th from 2, every 2nd from 1."""
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, height, step))
    return order


def encode_gif(width: int, height: int, base_value: int = 0,
               pixels: bytes | None = None,
               interlaced: bool = False) -> bytes:
    """Build a real GIF89a: 256-entry grayscale global color table
    (entry i = (i,i,i)), one image, REAL LZW-compressed data in
    ≤255-byte sub-blocks. Default pixel indexes are the gradient
    ``base + 7r + 13c`` (validated not to wrap), whose decoded RGB
    mean is closed-form: ``base + 7(h-1)/2 + 13(w-1)/2``.
    ``interlaced=True`` stores rows in the spec's four-pass order and
    sets the image-descriptor interlace flag."""
    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")
    if pixels is None:
        top = base_value + 7 * (height - 1) + 13 * (width - 1)
        if not (0 <= base_value and top <= 255):
            raise ValueError(
                f"gradient peak {top} exceeds a byte; lower base_value"
            )
        pixels = bytes(
            base_value + 7 * r + 13 * c
            for r in range(height) for c in range(width)
        )
    elif len(pixels) != width * height:
        raise ValueError("pixels length != width*height")
    if interlaced:
        pixels = b"".join(
            pixels[r * width : (r + 1) * width]
            for r in _gif_interlace_rows(height)
        )
    header = b"GIF89a"
    # screen descriptor: GCT present, 8 bits/pixel, 256-entry table
    screen = struct.pack("<HHBBB", width, height, 0b1111_0111, 0, 0)
    gct = bytes(v for i in range(256) for v in (i, i, i))
    img_desc = b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, width, height, 0x40 if interlaced else 0)
    lzw = _gif_lzw_encode(8, pixels)
    blocks = bytearray([8])  # LZW minimum code size
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks.append(0)  # block terminator
    return header + screen + gct + img_desc + bytes(blocks) + b"\x3b"


def _gif_parse(payload: bytes) -> tuple[int, int, bytes, bytearray]:
    """Full GIF parse of the first image frame. Returns (width, height,
    palette bytes, pixel indexes) — shared by the stats decoder and
    the pixel path."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(payload):
            raise ValueError("truncated GIF global color table")
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        intro = payload[pos]
        pos += 1
        if intro == 0x3B:  # trailer before any image
            raise ValueError("GIF has no image frame")
        if intro == 0x21:  # extension: label + sub-blocks
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated GIF extension")
                size = payload[pos]
                pos += 1
                if size == 0:
                    break
                pos += size
            continue
        if intro != 0x2C:
            raise ValueError(f"bad GIF block introducer 0x{intro:02x}")
        if pos + 9 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if w <= 0 or h <= 0:
            raise ValueError(f"malformed GIF geometry {w}x{h}")
        interlaced = bool(ipacked & 0x40)
        pal = gct
        if ipacked & 0x80:  # local color table overrides
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(payload):
                raise ValueError("truncated GIF local color table")
            pal = payload[pos : pos + 3 * n]
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image has no color table")
        if pos >= len(payload):
            raise ValueError("truncated GIF image data")
        min_code_size = payload[pos]
        pos += 1
        # 8 is GIF's real ceiling (a 256-entry palette) — larger values
        # are spec-invalid; fail at the header like the other
        # structural checks instead of later via palette bounds
        if not 2 <= min_code_size <= 8:
            raise ValueError(f"bad GIF LZW minimum code size {min_code_size}")
        data = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("truncated GIF data sub-blocks")
            size = payload[pos]
            pos += 1
            if size == 0:
                break
            if pos + size > len(payload):
                raise ValueError("truncated GIF data sub-block")
            data += payload[pos : pos + size]
            pos += size
        idx = _gif_lzw_decode(min_code_size, bytes(data), w * h)
        if len(idx) < w * h:
            raise ValueError(
                f"GIF pixel data is {len(idx)} indexes, geometry needs {w * h}"
            )
        n_colors = len(pal) // 3
        for i in idx[: w * h]:
            if i >= n_colors:
                raise ValueError(f"GIF pixel index {i} outside the palette")
        idx = idx[: w * h]
        if interlaced:
            # de-interlace: the decoded row sequence is the four-pass
            # order — scatter each row back to its true position
            out = bytearray(w * h)
            for seq, row in enumerate(_gif_interlace_rows(h)):
                out[row * w : (row + 1) * w] = idx[seq * w : (seq + 1) * w]
            idx = out
        return w, h, bytes(pal), idx
    raise ValueError("truncated GIF: no trailer, no image")


def encode_gif_animation(canvas_w: int, canvas_h: int,
                         frames: list[dict], loop: int = 0) -> bytes:
    """Build a real animated GIF89a: grayscale GCT, the NETSCAPE2.0
    looping application extension, and per frame a Graphic Control
    Extension (delay, disposal, optional transparency) + an image
    descriptor patch at (left, top) with real LZW data. Frame dicts:
    ``left top width height pixels delay_cs disposal transparent``."""
    if canvas_w <= 0 or canvas_h <= 0 or not frames:
        raise ValueError("canvas and frames must be non-empty")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", canvas_w, canvas_h, 0b1111_0111, 0, 0)
    out += bytes(v for i in range(256) for v in (i, i, i))
    out += (b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
            + struct.pack("<H", loop) + b"\x00")
    for f in frames:
        l, t = int(f.get("left", 0)), int(f.get("top", 0))
        w, h = int(f["width"]), int(f["height"])
        if l + w > canvas_w or t + h > canvas_h:
            raise ValueError("frame patch exceeds the canvas")
        px = f["pixels"]
        if len(px) != w * h:
            raise ValueError("frame pixels length != width*height")
        transparent = f.get("transparent")
        packed = (int(f.get("disposal", 1)) & 0x7) << 2
        if transparent is not None:
            packed |= 0x01
        out += (b"\x21\xf9\x04" + bytes([packed])
                + struct.pack("<H", int(f.get("delay_cs", 0)))
                + bytes([transparent or 0]) + b"\x00")
        lct = f.get("palette")
        if lct is not None:
            if len(lct) != 768:
                raise ValueError("local color table must be 256 entries")
            out += b"\x2c" + struct.pack("<HHHHB", l, t, w, h,
                                         0x80 | 0x07)
            out += bytes(lct)
        else:
            out += b"\x2c" + struct.pack("<HHHHB", l, t, w, h, 0)
        lzw = _gif_lzw_encode(8, bytes(px))
        out.append(8)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(payload: bytes) -> list[dict]:
    """Decode an animated GIF with REAL composition: each frame's
    patch draws onto the logical canvas (transparency skips pixels),
    per-frame stats cover the COMPOSED canvas, and the disposal modes
    run between frames (1/0 leave, 2 restore-to-background, 3
    restore-previous). One dict per frame: frame_index, delay_cs,
    mean_value (palette-mapped canvas mean), width/height (canvas)."""
    import numpy as np

    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos:pos + 3 * n]
        pos += 3 * n
    if gct is None:
        raise ValueError("animated GIF without a global color table")
    gpal = np.frombuffer(gct, dtype=np.uint8).reshape(-1, 3)
    # compose in RGB space so frames with LOCAL color tables mix with
    # global-table frames on one canvas
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:, :] = gpal[bg]
    out: list[dict] = []
    delay_cs, disposal, transparent = 0, 1, None
    while pos < len(payload):
        intro = payload[pos]
        pos += 1
        if intro == 0x3B:
            if not out:
                raise ValueError("GIF has no image frame")
            return out
        if intro == 0x21:
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                size = payload[pos]
                if size != 4:
                    raise ValueError("GIF: bad GCE block size")
                gpacked = payload[pos + 1]
                (delay_cs,) = struct.unpack_from("<H", payload, pos + 2)
                disposal = (gpacked >> 2) & 0x7
                transparent = payload[pos + 4] if gpacked & 0x01 else None
                pos += 5
                if payload[pos] != 0:
                    raise ValueError("GIF: unterminated GCE")
                pos += 1
            else:  # other extensions: skip sub-blocks
                while True:
                    size = payload[pos]
                    pos += 1
                    if size == 0:
                        break
                    pos += size
            continue
        if intro != 0x2C:
            raise ValueError(f"bad GIF block introducer 0x{intro:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if left + w > sw or top + h > sh:
            raise ValueError("GIF frame patch exceeds the logical screen")
        pal = gpal
        if ipacked & 0x80:  # local color table overrides for this frame
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(payload):
                raise ValueError("truncated GIF local color table")
            pal = np.frombuffer(
                payload[pos:pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
            pos += 3 * n
        min_code_size = payload[pos]
        pos += 1
        data = bytearray()
        while True:
            size = payload[pos]
            pos += 1
            if size == 0:
                break
            data += payload[pos:pos + size]
            pos += size
        idx = np.frombuffer(
            bytes(_gif_lzw_decode(min_code_size, bytes(data), w * h)),
            dtype=np.uint8).reshape(h, w)
        if ipacked & 0x40:  # interlaced frame: scatter the four passes
            deint = np.empty_like(idx)
            deint[_gif_interlace_rows(h)] = idx
            idx = deint
        region = canvas[top:top + h, left:left + w]
        before = region.copy() if disposal == 3 else None
        rgb = pal[idx]
        if transparent is None:
            region[:, :] = rgb
        else:
            mask = idx != transparent
            region[mask] = rgb[mask]
        out.append({
            "frame_index": len(out),
            "delay_cs": delay_cs,
            "width": sw,
            "height": sh,
            "mean_value": float(
                canvas.sum(dtype=np.int64)) / (3.0 * sw * sh),
        })
        if disposal == 2:
            region[:, :] = gpal[bg]
        elif disposal == 3:
            region[:, :] = before
        delay_cs, disposal, transparent = 0, 1, None
    raise ValueError("GIF stream ends without a trailer")


def decode_gif_animation(payload: bytes) -> dict:
    """Aggregate animation stats: n_units = frame count, duration from
    the GCE delays (centiseconds), mean over composed frame means."""
    frames = decode_gif_frames(payload)
    return {
        "media_kind": "image",
        "width": frames[0]["width"],
        "height": frames[0]["height"],
        "bit_depth": 8,
        "n_units": len(frames),
        "duration_ms": 10.0 * sum(f["delay_cs"] for f in frames),
        "mean_value": sum(f["mean_value"] for f in frames) / len(frames),
        "n_bytes": len(payload),
    }


def gif_anim_params(doc_id: int) -> tuple[int, int, int, int]:
    """Ground-truth (canvas_w, canvas_h, n_frames, base_color)."""
    return (
        6 + 2 * (doc_id % 4),
        4 + 2 * (doc_id % 3),
        2 + doc_id % 3,
        doc_id % 200,
    )


def encode_gif_animation_sample(doc_id: int) -> bytes:
    """Synthesized animation: frame 0 fills the canvas with the base
    color; each later frame draws a 2×2 patch at a DISTINCT position
    (disposal 1, no transparency), so the composed per-frame mean has
    the closed form (3·(c0·(wh − 4j) + Σ 4·c_k)) / (3·wh) a SQL twin
    can replicate division-for-division."""
    w, h, n, c0 = gif_anim_params(doc_id)
    frames = [{
        "left": 0, "top": 0, "width": w, "height": h,
        "pixels": bytes([c0]) * (w * h), "delay_cs": 3, "disposal": 1,
    }]
    for j in range(1, n):
        cj = (doc_id * 5 + j * 37) % 251
        frames.append({
            "left": 2 * (j - 1), "top": 0, "width": 2, "height": 2,
            "pixels": bytes([cj]) * 4, "delay_cs": 3 + j, "disposal": 1,
        })
    return encode_gif_animation(w, h, frames)


def gif_frame_stats(df: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Animated-GIF frame fan-out (the AVI row's GIF twin): one output
    row per COMPOSED frame, Arrow-batched; payload bytes never leave
    the UDF."""
    keep_schema = ", ".join(f"{c} string" for c in keep)
    schema = (
        "doc_id long, frame_index long, delay_cs long, frame_mean double"
        + (", " + keep_schema if keep else "")
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for j, p in enumerate(pdf["payload"]):
                for f in decode_gif_frames(bytes(p)):
                    rows.append((
                        pdf["doc_id"].iloc[j], f["frame_index"],
                        f["delay_cs"], f["mean_value"],
                        *[pdf[c].iloc[j] for c in keep],
                    ))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_index", "delay_cs",
                               "frame_mean", *keep])

    return df.mapInPandas(run, schema)


def decode_gif(payload: bytes) -> dict:
    """Decode a GIF for real: screen/image descriptors, extension-block
    skipping, sub-block reassembly, variable-width LZW, palette
    mapping, four-pass de-interlace when the descriptor flags it.
    Statistics cover the palette-mapped RGB bytes of the FIRST image
    frame — any LZW or palette bug shifts ``mean_value`` and breaks
    the oracle."""
    w, h, pal, idx = _gif_parse(payload)
    n_colors = len(pal) // 3
    total = 0
    for i in idx:
        off = 3 * i
        total += pal[off] + pal[off + 1] + pal[off + 2]
    n_pixels = w * h
    return {
        "media_kind": "image",
        "width": w,
        "height": h,
        "bit_depth": max(1, (n_colors - 1).bit_length()),
        "n_units": n_pixels,
        "mean_value": total / (3 * n_pixels),
        "n_bytes": len(payload),
    }


# -------------------------------------------------------------- JPEG codec
#
# Dependency-free BASELINE GRAYSCALE JPEG from the public spec
# (ITU T.81): 8×8 FDCT/IDCT (numpy float64), quantization, zigzag,
# differential-DC + run-length-AC Huffman entropy coding with byte
# stuffing. The encoder emits canonical Huffman tables in DHT and the
# decoder builds its tables FROM the DHT segments, so any valid
# baseline table decodes — including Annex K's optimized lengths.
# Color (3-component YCbCr 4:4:4) scans decode with per-component
# quant/Huffman tables and DC predictors plus the JFIF color
# conversion; chroma-subsampled (4:2:0/4:2:2), restart-marker (DRI/
# RSTn), progressive (SOF2), and Adobe CMYK/YCCK files decode too
# (added over rounds 8-12 — see the catalog rows). 12-bit precision
# and arithmetic coding raise the documented NotImplementedError
# boundary; structural damage raises ValueError.


def _jpeg_zigzag() -> list[int]:
    """The standard zigzag scan order, generated (anti-typo): walk the
    anti-diagonals, alternating direction."""
    order = []
    for s in range(15):
        ij = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            ij = ij[::-1]
        order.extend(i * 8 + j for i, j in ij)
    return order


_ZIGZAG = _jpeg_zigzag()

# Canonical Huffman tables the encoder emits (self-described in DHT):
# DC: the 12 size categories at 4 bits each; AC: all 162 run/size
# symbols at 8 bits each. Valid (incomplete) canonical codes — Annex
# K's frequency-optimized lengths are a drop-in, the decoder doesn't
# care because it reads DHT.
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_COUNTS = [0] * 7 + [len(_AC_SYMBOLS)] + [0] * 8

# progressive scans additionally use the EOBn symbols (0x10..0xE0 —
# EOB runs covering 2..2^15-1 blocks); still a valid incomplete
# canonical code with every symbol at 8 bits (176 < 256)
_AC_SYMBOLS_PROG = _AC_SYMBOLS + [r << 4 for r in range(1, 15)]
_AC_COUNTS_PROG = [0] * 7 + [len(_AC_SYMBOLS_PROG)] + [0] * 8


_HUFF_CODES_CACHE: dict[tuple, dict[int, tuple[int, int]]] = {}
# decode-side segment caches: real corpora (and the MJPEG fan-outs)
# repeat the same DQT/DHT bytes across thousands of files/frames, so
# the parsed tables are keyed by their raw segment bytes. Capped so
# adversarial inputs cannot grow them unboundedly; entries are
# read-only for every consumer.
_JPEG_DQT_CACHE: dict[bytes, object] = {}
_JPEG_DHT_CACHE: dict[bytes, dict[tuple[int, int], int]] = {}


def _huff_codes(counts: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, bit length), canonical JPEG assignment.
    Memoized per (counts, symbols): encoders call this once per file
    with the same module-constant tables, so the build amortises to
    once per worker process (callers only read the dict)."""
    key = (tuple(counts), tuple(symbols))
    out = _HUFF_CODES_CACHE.get(key)
    if out is not None:
        return out
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    if len(_HUFF_CODES_CACHE) < 64:
        _HUFF_CODES_CACHE[key] = out
    return out


_DCT_MATRIX = None


def _dct_matrix():
    """8×8 DCT-II basis matrix; computed once per process (read-only:
    every consumer only multiplies with it)."""
    global _DCT_MATRIX
    if _DCT_MATRIX is not None:
        return _DCT_MATRIX
    import math

    import numpy as np

    t = np.zeros((8, 8))
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            t[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    t.flags.writeable = False
    _DCT_MATRIX = t
    return t


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _size_cat(v: int) -> int:
    return abs(v).bit_length()


def _rgb_to_ycbcr(r, g, b):
    """JFIF (BT.601 full-range) forward conversion, rounded with
    ``floor(x + 0.5)`` — half-up, NOT banker's — so a SQL oracle can
    replicate the integer chain with FLOOR(x + 0.5) exactly."""
    import numpy as np

    y = np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
    cb = np.floor(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5)
    cr = np.floor(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5)
    clip = lambda a: np.clip(a, 0.0, 255.0)
    return clip(y), clip(cb), clip(cr)


def _ycbcr_to_rgb(y, cb, cr):
    """JFIF inverse conversion, same half-up rounding discipline."""
    import numpy as np

    r = np.floor(y + 1.402 * (cr - 128.0) + 0.5)
    g = np.floor(y - 0.344136 * (cb - 128.0)
                 - 0.714136 * (cr - 128.0) + 0.5)
    b = np.floor(y + 1.772 * (cb - 128.0) + 0.5)
    clip = lambda a: np.clip(a, 0.0, 255.0)
    return clip(r), clip(g), clip(b)


def _jpeg_block_coefs(plane, qt, t, np):
    """FDCT + quantize + zigzag every 8×8 block of a padded plane at
    once; returns (bh, bw, 64) int64 in zigzag order. Bit-identical to
    the former per-block ``t @ (block - 128.0) @ t.T`` / ``qt`` chain
    (numpy batched matmul computes the same per-slice products)."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    coeffs = t @ (blocks - 128.0) @ t.T
    return np.rint(coeffs / qt).astype(np.int64).reshape(
        bh, bw, 64)[:, :, _ZIGZAG]


def _encode_jpeg_block(w, zz, dc_codes, ac_codes, prev_dc) -> int:
    """Entropy-code ONE already-quantized zigzag block (a (64,) row of
    :func:`_jpeg_block_coefs` output); returns the new DC predictor
    for this component."""
    diff = int(zz[0]) - prev_dc
    new_dc = int(zz[0])
    s = _size_cat(diff)
    code, length = dc_codes[s]
    w.write(code, length)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = zz[1:].nonzero()[0]
    last_nz = int(nz[-1]) + 1 if nz.size else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        s = _size_cat(v)
        if s > 10:
            raise ValueError("AC coefficient out of baseline range")
        code, length = ac_codes[(run << 4) | s]
        w.write(code, length)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return new_dc


def _encode_jpeg_progressive(planes, factors, width, height, qt, q_zz,
                             color, np, restart_interval: int = 0) -> bytes:
    """Emit a PROGRESSIVE (SOF2) JPEG over the already-quantized
    coefficient plan: spectral selection (DC scan, AC 1-5, AC 6-63)
    with successive approximation (coefficients first at reduced
    precision Al, then refinement scans carrying the dropped bits) —
    the libjpeg-style simple progression. The entropy algorithms are
    T.81 G.1.2: differential DC on point-transformed values, AC
    first-scans with EOB-run folding, AC refinement with buffered
    correction bits. Coefficients are IDENTICAL to the baseline
    encoding of the same pixels — progressive only re-orders their
    transmission — which is what the round-trip equivalence test
    pins.

    ``restart_interval`` threads T.81 restart markers through EVERY
    scan of the progression: each scan's entropy stream is split by a
    spec-sequenced RSTn every N units (MCUs for the interleaved DC
    scans, component blocks for the per-component AC scans), with the
    per-scan state — DC predictors, EOB runs and their buffered
    correction bits — flushed and reset at each boundary, exactly the
    reset the decoder performs on resync."""
    t = _dct_matrix()
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = planes[0].shape[1] // (8 * hmax)
    mcus_y = planes[0].shape[0] // (8 * vmax)
    n = len(planes)
    # all FDCTs batched (same per-slice products as the former
    # per-block loop); everything below is entropy-only
    coefs = [_jpeg_block_coefs(plane, qt, t, np) for plane in planes]
    dc_codes = _huff_codes(_DC_COUNTS, _DC_SYMBOLS)
    ac_codes = _huff_codes(_AC_COUNTS_PROG, _AC_SYMBOLS_PROG)

    def ceil_blocks(ci):
        hi, vi = factors[ci]
        cw = (width * hi + hmax - 1) // hmax
        ch = (height * vi + vmax - 1) // vmax
        return (ch + 7) // 8, (cw + 7) // 8

    def dc_units(comp_idx):
        """Unit iteration for a DC scan — each yielded unit is the
        restart-boundary granule: one MCU's blocks when the scan is
        interleaved, a single block of the component's own ceil raster
        otherwise (T.81 A.2.2)."""
        if len(comp_idx) > 1:
            for mcu in range(mcus_x * mcus_y):
                myi, mxi = divmod(mcu, mcus_x)
                unit = []
                for c in comp_idx:
                    fh, fv = factors[c]
                    for by in range(fv):
                        for bx in range(fh):
                            unit.append((c, coefs[c][myi * fv + by,
                                                     mxi * fh + bx]))
                yield unit
        else:
            c = comp_idx[0]
            cbh, cbw = ceil_blocks(c)
            for by in range(cbh):
                for bx in range(cbw):
                    yield [(c, coefs[c][by, bx])]

    def emit_mag(w, v, s):
        w.write(v if v >= 0 else v + (1 << s) - 1, s)

    class _ScanWriter:
        """Per-scan segmentation: flush + spec-sequenced RSTn every
        ``restart_interval`` units, fresh bit writer per segment; the
        caller resets its own predictors/EOB state in ``on_restart``."""

        def __init__(self, on_restart=None):
            self.body = bytearray()
            self.w = _BitWriter()
            self.n_rst = 0
            self.on_restart = on_restart

        def boundary(self, unit_index: int) -> None:
            if restart_interval and unit_index \
                    and unit_index % restart_interval == 0:
                self.body += self.w.flush()
                self.body += bytes([0xFF, 0xD0 + (self.n_rst % 8)])
                self.n_rst += 1
                self.w = _BitWriter()
                if self.on_restart:
                    self.on_restart()

        def done(self) -> bytes:
            return bytes(self.body + self.w.flush())

    def dc_first(comp_idx, al):
        prev = {c: 0 for c in comp_idx}
        sw = _ScanWriter(lambda: prev.update({c: 0 for c in comp_idx}))
        for ui, unit in enumerate(dc_units(comp_idx)):
            sw.boundary(ui)
            w = sw.w
            for c, zz in unit:
                v = int(zz[0]) >> al  # arithmetic shift: the DC point
                diff = v - prev[c]    # transform
                prev[c] = v
                s = _size_cat(diff)
                code, ln = dc_codes[s]
                w.write(code, ln)
                if s:
                    emit_mag(w, diff, s)
        return sw.done()

    def dc_refine(comp_idx, al):
        sw = _ScanWriter()
        for ui, unit in enumerate(dc_units(comp_idx)):
            sw.boundary(ui)
            for _c, zz in unit:
                sw.w.write((int(zz[0]) >> al) & 1, 1)
        return sw.done()

    def ac_first(c, ss, se, al):
        eobrun = 0
        sw = _ScanWriter()

        def _flush():
            nonlocal eobrun
            if eobrun:
                nb = eobrun.bit_length() - 1
                code, ln = ac_codes[nb << 4]
                sw.w.write(code, ln)
                if nb:
                    sw.w.write(eobrun & ((1 << nb) - 1), nb)
                eobrun = 0

        cbh, cbw = ceil_blocks(c)
        for ui in range(cbh * cbw):
            if restart_interval and ui and ui % restart_interval == 0:
                _flush()  # an EOB run may not span a restart boundary
                sw.boundary(ui)
            by, bx = divmod(ui, cbw)
            zz = coefs[c][by, bx]
            r = 0
            for k in range(ss, se + 1):
                v = int(zz[k])
                t2 = abs(v) >> al
                if t2 == 0:
                    r += 1
                    continue
                _flush()
                while r > 15:
                    code, ln = ac_codes[0xF0]
                    sw.w.write(code, ln)
                    r -= 16
                s = t2.bit_length()
                if s > 10:
                    raise ValueError(
                        "AC coefficient out of baseline range")
                code, ln = ac_codes[(r << 4) | s]
                sw.w.write(code, ln)
                emit_mag(sw.w, t2 if v > 0 else -t2, s)
                r = 0
            if r:
                eobrun += 1
                if eobrun == 0x7FFF:
                    _flush()
        _flush()
        return sw.done()

    def ac_refine(c, ss, se, al):
        eobrun = 0
        pend: list[int] = []  # correction bits deferred with the EOB run
        sw = _ScanWriter()

        def flush_eob():
            nonlocal eobrun, pend
            if eobrun:
                nb = eobrun.bit_length() - 1
                code, ln = ac_codes[nb << 4]
                sw.w.write(code, ln)
                if nb:
                    sw.w.write(eobrun & ((1 << nb) - 1), nb)
                for b in pend:
                    sw.w.write(b, 1)
                eobrun, pend = 0, []

        cbh, cbw = ceil_blocks(c)
        for ui in range(cbh * cbw):
            if restart_interval and ui and ui % restart_interval == 0:
                flush_eob()  # EOB runs and their buffered correction
                sw.boundary(ui)  # bits may not span a restart boundary
            by, bx = divmod(ui, cbw)
            zz = coefs[c][by, bx]
            absv = [abs(int(zz[k])) >> al for k in range(64)]
            eob_idx = 0  # index of the last NEWLY-significant coef
            for k in range(ss, se + 1):
                if absv[k] == 1:
                    eob_idx = k
            r = 0
            br: list[int] = []
            for k in range(ss, se + 1):
                t2 = absv[k]
                if t2 == 0:
                    r += 1
                    continue
                # ZRLs only when they cannot fold into the EOB run
                while r > 15 and k <= eob_idx:
                    flush_eob()
                    code, ln = ac_codes[0xF0]
                    sw.w.write(code, ln)
                    r -= 16
                    for b in br:
                        sw.w.write(b, 1)
                    br = []
                if t2 > 1:  # already significant: correction bit
                    br.append(t2 & 1)
                    continue
                flush_eob()  # newly significant at this precision
                code, ln = ac_codes[(r << 4) | 1]
                sw.w.write(code, ln)
                sw.w.write(1 if int(zz[k]) > 0 else 0, 1)
                for b in br:
                    sw.w.write(b, 1)
                br = []
                r = 0
            if r or br:
                eobrun += 1
                pend.extend(br)
                if eobrun == 0x7FFF or len(pend) > 900:
                    flush_eob()
        flush_eob()
        return sw.done()

    def seg(marker: int, payload_: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload_) + 2) + payload_

    dqt = seg(0xFFDB, bytes([0x00]) + q_zz)
    dht = seg(0xFFC4, bytes([0x00]) + bytes(_DC_COUNTS)
              + bytes(_DC_SYMBOLS)) \
        + seg(0xFFC4, bytes([0x10]) + bytes(_AC_COUNTS_PROG)
              + bytes(_AC_SYMBOLS_PROG))
    if color:
        dqt += seg(0xFFDB, bytes([0x01]) + q_zz)
        dht += seg(0xFFC4, bytes([0x01]) + bytes(_DC_COUNTS)
                   + bytes(_DC_SYMBOLS)) \
            + seg(0xFFC4, bytes([0x11]) + bytes(_AC_COUNTS_PROG)
                  + bytes(_AC_SYMBOLS_PROG))
        hy, vy = factors[0]
        comps = bytes([1, (hy << 4) | vy, 0, 2, 0x11, 1, 3, 0x11, 1])
        sof = seg(0xFFC2, struct.pack(">BHHB", 8, height, width, 3)
                  + comps)
    else:
        sof = seg(0xFFC2, struct.pack(">BHHB", 8, height, width, 1)
                  + bytes([1, 0x11, 0]))

    def sos(comp_idx, ss, se, ah, al):
        spec = b"".join(
            bytes([c + 1, ((0 if c == 0 else 1) << 4)
                   | (0 if c == 0 else 1)])
            for c in comp_idx
        )
        return seg(0xFFDA, bytes([len(comp_idx)]) + spec
                   + bytes([ss, se, (ah << 4) | al]))

    all_idx = list(range(n))
    dri = (seg(0xFFDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    out = bytearray(b"\xff\xd8" + dqt + sof + dht + dri)
    out += sos(all_idx, 0, 0, 0, 1) + dc_first(all_idx, 1)
    for c in all_idx:
        out += sos([c], 1, 5, 0, 2) + ac_first(c, 1, 5, 2)
    for c in all_idx:
        out += sos([c], 6, 63, 0, 2) + ac_first(c, 6, 63, 2)
    for c in all_idx:
        out += sos([c], 1, 63, 2, 1) + ac_refine(c, 1, 63, 1)
    for c in all_idx:
        out += sos([c], 1, 63, 1, 0) + ac_refine(c, 1, 63, 0)
    out += sos(all_idx, 0, 0, 1, 0) + dc_refine(all_idx, 0)
    return bytes(out + b"\xff\xd9")


def encode_jpeg(width: int, height: int, pixel_value: int = 128,
                pixels: bytes | None = None,
                quant: list[int] | None = None,
                rgb: tuple[int, int, int] | None = None,
                rgb_pixels: bytes | None = None,
                subsampling: str = "444",
                restart_interval: int = 0,
                progressive: bool = False,
                cmyk: tuple[int, int, int, int] | None = None,
                adobe_transform: int = 0) -> bytes:
    """Build a real baseline JPEG (SOI/DQT/SOF0/DHT/SOS/EOI): FDCT per
    8×8 block (edge-replicated padding), quantization, zigzag,
    differential-DC + run-length-AC Huffman entropy coding.

    Grayscale by default (``pixel_value`` constant tile or ``pixels``
    raw bytes). ``rgb=(r,g,b)`` (constant color tile) or ``rgb_pixels``
    (w*h*3 interleaved bytes) produce a COLOR baseline JPEG: YCbCr,
    interleaved component scans per MCU, luma on quant/Huffman table
    ids 0 and chroma on ids 1 (so per-component table selection is
    load-bearing, like real encoders emit). ``subsampling`` picks the
    chroma layout — ``"444"`` (default), ``"422"`` (2x1 luma) or
    ``"420"`` (2x2 luma, the dominant real-world form); chroma
    downsamples by block mean rounded half-up, so constant tiles stay
    distortion-free. ``restart_interval`` emits a DRI segment and a
    spec-sequenced RSTn marker every N MCUs with DC predictors reset —
    the resync structure real camera files carry.

    ``progressive=True`` emits an SOF2 file instead: the same
    quantized coefficients re-ordered into a spectral-selection +
    successive-approximation scan script (DC at Al=1 then refined;
    AC bands 1-5 and 6-63 at Al=2, refined twice; EOB-run folding) —
    see :func:`_encode_jpeg_progressive`. Decoding a progressive
    encode is bit-identical to decoding the baseline encode of the
    same pixels, which the round-trip equivalence test pins.

    The default quantization table is all-ones — DISTORTION-FREE for
    constant-tile content (an all-constant block is a lone integer DC
    coefficient), which is what lets a SQL oracle verify the full
    entropy-decode + IDCT path exactly; arbitrary content is lossy
    like any JPEG. The RGB↔YCbCr conversions round half-up
    (floor(x+0.5)) so the color chain stays SQL-replicable."""
    import numpy as np

    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")
    color = rgb is not None or rgb_pixels is not None
    if color and pixels is not None:
        raise ValueError("pass gray pixels OR color rgb/rgb_pixels")
    if cmyk is not None:
        # Adobe 4-component file: an APP14 marker names the transform
        # (0 = CMYK stored as-is, 2 = YCCK), and per Adobe convention
        # every channel is stored INVERTED (255 - value)
        if color or pixels is not None:
            raise ValueError("cmyk excludes rgb/pixels")
        if adobe_transform not in (0, 2):
            raise ValueError("adobe_transform must be 0 (CMYK) or 2 (YCCK)")
        if subsampling != "444" or progressive:
            raise NotImplementedError(
                "CMYK JPEG encodes 4:4:4 baseline only")
        if not all(0 <= int(v) <= 255 for v in cmyk):
            raise ValueError("cmyk components must be bytes")
        inv = [np.full((height, width), 255.0 - float(v)) for v in cmyk]
        if adobe_transform == 2:
            yp, cbp, crp = _rgb_to_ycbcr(inv[0], inv[1], inv[2])
            planes = [yp, cbp, crp, inv[3]]
        else:
            planes = inv
    elif color:
        if rgb_pixels is not None:
            if len(rgb_pixels) != width * height * 3:
                raise ValueError("rgb_pixels length != width*height*3")
            arr = np.frombuffer(rgb_pixels, np.uint8).astype(
                np.float64).reshape(height, width, 3)
            r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        else:
            if not all(0 <= int(v) <= 255 for v in rgb):
                raise ValueError("rgb components must be bytes")
            r = np.full((height, width), float(rgb[0]))
            g = np.full((height, width), float(rgb[1]))
            b = np.full((height, width), float(rgb[2]))
        planes = list(_rgb_to_ycbcr(r, g, b))
    else:
        if pixels is None:
            if not 0 <= pixel_value <= 255:
                raise ValueError("pixel_value must be a byte")
            planes = [np.full((height, width), pixel_value,
                              dtype=np.float64)]
        else:
            if len(pixels) != width * height:
                raise ValueError("pixels length != width*height")
            planes = [np.frombuffer(pixels, np.uint8).astype(
                np.float64).reshape(height, width)]
    q = list(quant) if quant is not None else [1] * 64
    if len(q) != 64 or not all(1 <= int(v) <= 255 for v in q):
        raise ValueError("quant must be 64 values in 1..255")
    if restart_interval < 0 or restart_interval > 0xFFFF:
        raise ValueError("restart_interval must be in 0..65535")
    qt = np.array(q, dtype=np.float64).reshape(8, 8)
    if subsampling not in ("444", "422", "420"):
        raise ValueError("subsampling must be '444', '422' or '420'")
    if not color and subsampling != "444":
        raise ValueError("subsampling applies to color JPEGs only")
    hy, vy = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsampling]
    factors = [(hy, vy)] + [(1, 1)] * (len(planes) - 1)
    mcu_w, mcu_h = 8 * hy, 8 * vy
    # pad the FULL-RES planes to MCU multiples by edge replication
    # (the spec's recommendation), then block-mean-downsample chroma —
    # floor(x+0.5), so a constant tile stays distortion-free
    ph = (mcu_h - height % mcu_h) % mcu_h
    pw = (mcu_w - width % mcu_w) % mcu_w
    if ph or pw:
        planes = [np.pad(p, ((0, ph), (0, pw)), mode="edge")
                  for p in planes]
    if color and (hy, vy) != (1, 1):
        for ci in (1, 2):
            p = planes[ci]
            h0, w0 = p.shape
            p = p.reshape(h0 // vy, vy, w0 // hy, hy).mean(axis=(1, 3))
            planes[ci] = np.floor(p + 0.5)
    if progressive:
        q_flat_p = np.array(q, dtype=np.int64).ravel()
        q_zz_p = bytes(int(q_flat_p[_ZIGZAG[i]]) for i in range(64))
        return _encode_jpeg_progressive(
            planes, factors, width, height, qt, q_zz_p, color, np,
            restart_interval=restart_interval)
    t = _dct_matrix()
    dc_codes = _huff_codes(_DC_COUNTS, _DC_SYMBOLS)
    ac_codes = _huff_codes(_AC_COUNTS, _AC_SYMBOLS)
    # all FDCTs batched up front; the MCU loop below is entropy-only
    zz_planes = [_jpeg_block_coefs(p, qt, t, np) for p in planes]
    w = _BitWriter()
    body = bytearray()
    prev_dc = [0] * len(planes)
    mcus_y = planes[0].shape[0] // mcu_h
    mcus_x = planes[0].shape[1] // mcu_w
    n_rst = 0
    # MCU order: at each MCU the components interleave in frame order,
    # h×v luma blocks then one block per chroma component
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            body += w.flush()
            body += bytes([0xFF, 0xD0 + (n_rst % 8)])
            n_rst += 1
            w = _BitWriter()
            prev_dc = [0] * len(planes)
        myi, mxi = divmod(mcu, mcus_x)
        for ci, zzp in enumerate(zz_planes):
            fh, fv = factors[ci]
            for by in range(fv):
                for bx in range(fh):
                    prev_dc[ci] = _encode_jpeg_block(
                        w, zzp[myi * fv + by, mxi * fh + bx],
                        dc_codes, ac_codes, prev_dc[ci],
                    )
    body += w.flush()
    body = bytes(body)

    def seg(marker: int, payload_: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload_) + 2) + payload_

    # DQT: 8-bit precision; values emitted in ZIGZAG order per the
    # spec (q is natural row-major order). Color adds table 1 for
    # chroma (same values — the all-ones default keeps it lossless)
    q_flat = np.array(q, dtype=np.int64).ravel()
    q_zz = bytes(int(q_flat[_ZIGZAG[i]]) for i in range(64))
    dqt = seg(0xFFDB, bytes([0x00]) + q_zz)
    dht = seg(0xFFC4, bytes([0x00]) + bytes(_DC_COUNTS)
              + bytes(_DC_SYMBOLS)) \
        + seg(0xFFC4, bytes([0x10]) + bytes(_AC_COUNTS) + bytes(_AC_SYMBOLS))
    app14 = b""
    if color or cmyk is not None:
        dqt += seg(0xFFDB, bytes([0x01]) + q_zz)
        dht += seg(0xFFC4, bytes([0x01]) + bytes(_DC_COUNTS)
                   + bytes(_DC_SYMBOLS)) \
            + seg(0xFFC4, bytes([0x11]) + bytes(_AC_COUNTS)
                  + bytes(_AC_SYMBOLS))
    if cmyk is not None:
        # the Adobe APP14 marker real print-origin files carry:
        # "Adobe", version 100, two flag words, the transform byte
        app14 = seg(0xFFEE, b"Adobe"
                    + struct.pack(">HHHB", 100, 0, 0, adobe_transform))
        comps = bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1, 4, 0x11, 0])
        sof0 = seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 4)
                   + comps)
        sos = seg(0xFFDA, bytes([4, 1, 0x00, 2, 0x11, 3, 0x11,
                                 4, 0x00, 0, 63, 0]))
    elif color:
        comps = bytes([1, (hy << 4) | vy, 0, 2, 0x11, 1, 3, 0x11, 1])
        sof0 = seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 3)
                   + comps)
        sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11,
                                 0, 63, 0]))
    else:
        sof0 = seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1)
                   + bytes([1, 0x11, 0]))
        sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    dri = (seg(0xFFDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    return (b"\xff\xd8" + app14 + dqt + sof0 + dht + dri + sos + body
            + b"\xff\xd9")


class _BitReader:
    """JPEG entropy-stream bit reader. The constructor pre-scans the
    segment ONCE: the longest prefix in which every 0xFF is a stuffed
    0xFF00 pair is unstuffed into ``clean`` (one C-speed
    ``bytes.replace``), and the exact exception the former per-byte
    walk would raise at the first non-clean byte (end of data, lone
    trailing 0xFF, or a real marker) is precomputed. Refills then run
    stuffing-check-free off ``clean`` in multi-byte gulps. Error
    positions are unchanged: consuming bits inside the clean prefix
    can never raise, and the reader raises ``_err`` exactly when a bit
    past the prefix is actually needed — the same logical point the
    per-byte walk raised at (the walk consumed stuffed pairs silently
    and raised only when it had to load the marker/end byte)."""

    __slots__ = ("clean", "cpos", "acc", "nbits", "_err")

    def __init__(self, data: bytes):
        i = 0
        n = len(data)
        err = "truncated JPEG entropy stream"
        stop = n
        while True:
            j = data.find(0xFF, i)
            if j == -1:
                break
            if j + 1 >= n:
                # lone trailing 0xFF: the per-byte walk consumed it,
                # then raised truncation looking for the pair byte
                stop = j
                break
            nxt = data[j + 1]
            if nxt == 0x00:
                i = j + 2  # stuffed pair, stays in the clean prefix
                continue
            stop = j
            err = f"unexpected marker 0xff{nxt:02x} inside entropy data"
            break
        self.clean = data[:stop].replace(b"\xff\x00", b"\xff")
        self.cpos = 0
        self.acc = 0
        self.nbits = 0
        self._err = err

    def _fill(self) -> None:
        # gulp up to 6 bytes per fill (keeps acc ≤ 63 live bits —
        # small-int territory); masking to the live bits stops the
        # accumulator growing into an arbitrarily large int (which
        # would make entropy decode O(n²) in the scan length)
        cpos = self.cpos
        clean = self.clean
        avail = len(clean) - cpos
        if avail <= 0:
            raise ValueError(self._err)
        k = 6 if avail >= 6 else avail
        self.cpos = cpos + k
        kb = k << 3
        nb = self.nbits + kb
        self.acc = (
            (self.acc << kb) | int.from_bytes(clean[cpos:cpos + k], "big")
        ) & ((1 << nb) - 1)
        self.nbits = nb

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        # bulk form of n× bit(): same fills in the same order (so the
        # same truncation errors), one shift+mask instead of a loop
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)


# sentinel key carrying a table's 16-bit-prefix decode LUT inside the
# (length, code) dict — lengths are 1..16, so (0, -1) can never collide
_JPEG_LUT_KEY = (0, -1)


def _huff_decode_lut(table) -> list:
    """65536-entry lookup: 16-bit bitstream prefix → (symbol, length).
    Prefix-free codes make every extension of a code map to the same
    symbol, so decoding is one peek + one indexed load; entries not
    covered by any code stay None (the 'invalid Huffman code' case)."""
    lut: list = [None] * 65536
    for (ln, code), sym in table.items():
        if ln == 0:
            continue
        entry = (sym, ln)
        start = code << (16 - ln)
        for p in range(start, start + (1 << (16 - ln))):
            lut[p] = entry
    return lut


def _jpeg_read_symbol(r: _BitReader, table) -> int:
    lut = table.get(_JPEG_LUT_KEY)
    if lut is not None:
        # fast path: with 16 clean bits buffered, one lookup decodes
        # the symbol. The refill gulps straight off the pre-unstuffed
        # clean prefix — when it stops short (prefix exhausted) we fall
        # through with the reader in exactly the state the bit-by-bit
        # path expects, and _fill raises the precomputed error only if
        # a bit past the prefix is actually needed
        acc = r.acc
        nbits = r.nbits
        if nbits < 16:
            clean = r.clean
            cpos = r.cpos
            avail = len(clean) - cpos
            if avail > 0:
                k = 4 if avail >= 4 else avail
                kb = k << 3
                nbits += kb
                acc = (
                    (acc << kb) | int.from_bytes(clean[cpos:cpos + k], "big")
                ) & ((1 << nbits) - 1)
                r.cpos = cpos + k
                r.acc = acc
                r.nbits = nbits
        if nbits >= 16:
            hit = lut[(acc >> (nbits - 16)) & 0xFFFF]
            if hit is None:
                # same condition the loop below reaches after 16
                # unmatched bits
                raise ValueError("invalid JPEG Huffman code")
            r.nbits = nbits - hit[1]
            return hit[0]
    # tail / LUT-less path: bit-by-bit with the raising _fill — the
    # exact original semantics for truncation and stray markers
    code = 0
    get = table.get
    for ln in range(1, 17):
        if r.nbits == 0:
            r._fill()
        r.nbits -= 1
        code = (code << 1) | ((r.acc >> r.nbits) & 1)
        sym = get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _jpeg_entropy_end(payload: bytes, pos: int) -> int:
    """Index of the first real marker after ``pos``: 0xFF00 is stuffed
    data, 0xFFD0-D7 are restart markers (part of the scan), repeated
    0xFF bytes are fill."""
    i = pos
    while True:
        j = payload.find(b"\xff", i)
        if j == -1 or j + 1 >= len(payload):
            raise ValueError("truncated JPEG: unterminated entropy stream")
        nxt = payload[j + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            i = j + 2
        elif nxt == 0xFF:
            i = j + 1
        else:
            return j


def _jpeg_decode_scan(entropy, frame, scan, coef, huff,
                      restart_interval, progressive, np):
    """Entropy-decode ONE scan into the per-component quantized
    coefficient arrays (zigzag order). Sequential scans carry full
    blocks; progressive scans carry a (band, bit-precision) slice —
    DC first/refine (T.81 G.1.2.1) and AC first/refine with EOB runs
    (G.1.2.2/G.1.2.3, the libjpeg-documented successive-approximation
    algorithm)."""
    w_, h, comps = frame
    scan_comps, ss, se, ah, al = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w_ + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    interleaved = len(scan_comps) > 1

    if progressive:
        if ss == 0 and se != 0:
            raise ValueError(
                "progressive DC scan must have Se=0 (a full-band scan "
                "is a sequential shape)"
            )
        if ss > 0 and interleaved:
            raise ValueError(
                "progressive AC scans must be single-component"
            )
        if not 0 <= ss <= se <= 63:
            raise ValueError("bad JPEG spectral selection band")
        if ah and ah != al + 1:
            raise ValueError(
                "bad JPEG successive approximation (Ah must be Al+1)"
            )
        if al > 13:
            raise ValueError("bad JPEG successive approximation shift")
    else:
        ss, se, ah, al = 0, 63, 0, 0

    # resolve tables per scan component; DC refinement reads raw bits
    # (no Huffman), AC scans need only the AC table, DC-only scans
    # only the DC table
    tabs = []
    for ci, td, ta in scan_comps:
        need_dc = ss == 0 and ah == 0
        need_ac = se > 0
        dc_tab = huff.get((0, td)) if need_dc else None
        ac_tab = huff.get((1, ta)) if need_ac else None
        if (need_dc and dc_tab is None) or (need_ac and ac_tab is None):
            raise ValueError("JPEG references missing Huffman table")
        tabs.append((ci, dc_tab, ac_tab))

    # unit geometry: interleaved scans walk MCUs over the padded grid;
    # single-component scans walk the component's OWN ceil(dim/8)
    # block raster (T.81 A.2.2 — padded blocks beyond it are not coded)
    if interleaved:
        total_units = mcus_x * mcus_y
    else:
        ci = scan_comps[0][0]
        _cid, hi, vi, _tq = comps[ci]
        cbw = ((w_ * hi + hmax - 1) // hmax + 7) // 8
        cbh = ((h * vi + vmax - 1) // vmax + 7) // 8
        total_units = cbw * cbh

    segments = [entropy]
    if restart_interval:
        parts = re.split(b"\xff([\xd0-\xd7])", entropy)
        segments, markers = parts[0::2], parts[1::2]
        for k, m in enumerate(markers):
            if m[0] != 0xD0 + (k % 8):  # the spec's modulo-8 sequence
                raise ValueError(
                    f"JPEG restart marker out of order at boundary "
                    f"{k}: got 0xff{m[0]:02x}"
                )
        expect = (total_units + restart_interval - 1) // restart_interval
        if len(segments) != expect:
            raise ValueError(
                f"JPEG restart markers split the scan into "
                f"{len(segments)} segments; interval "
                f"{restart_interval} over {total_units} MCUs "
                f"needs {expect}"
            )

    r = _BitReader(segments[0])
    prev_dc = {ci: 0 for ci, _d, _a in tabs}
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)

    def seq_block(zz, dc_tab, ac_tab, ci):
        s = _jpeg_read_symbol(r, dc_tab)
        diff = _jpeg_extend(r.bits(s), s) if s else 0
        prev_dc[ci] += diff
        zz[0] = prev_dc[ci]
        i = 1
        while i < 64:
            sym = _jpeg_read_symbol(r, ac_tab)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                i += 16
                continue
            run, size = sym >> 4, sym & 0x0F
            i += run
            if i > 63 or size == 0:
                raise ValueError("corrupt JPEG AC run")
            zz[i] = _jpeg_extend(r.bits(size), size)
            i += 1

    def dc_first(zz, dc_tab, ci):
        s = _jpeg_read_symbol(r, dc_tab)
        diff = _jpeg_extend(r.bits(s), s) if s else 0
        prev_dc[ci] += diff
        zz[0] = prev_dc[ci] << al

    def dc_refine(zz):
        if r.bit():
            zz[0] = int(zz[0]) | p1

    def ac_first(zz, ac_tab):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            sym = _jpeg_read_symbol(r, ac_tab)
            rr, s = sym >> 4, sym & 0x0F
            if s == 0:
                if rr != 15:
                    eobrun = (1 << rr) - 1
                    if rr:
                        eobrun += r.bits(rr)
                    break
                k += 16  # ZRL
                continue
            k += rr
            if k > se:
                raise ValueError("corrupt JPEG AC run")
            zz[k] = _jpeg_extend(r.bits(s), s) << al
            k += 1

    def _correct(zz, k):
        cur = int(zz[k])
        if r.bit() and not (cur & p1):
            zz[k] = cur + (p1 if cur >= 0 else m1)

    def ac_refine(zz, ac_tab):
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                sym = _jpeg_read_symbol(r, ac_tab)
                rr, s = sym >> 4, sym & 0x0F
                val = 0
                if s == 0:
                    if rr != 15:
                        eobrun = 1 << rr
                        if rr:
                            eobrun += r.bits(rr)
                        break
                    # rr == 15: skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError(
                            "corrupt JPEG refinement scan (size != 1)"
                        )
                    val = p1 if r.bit() else m1
                # advance: corrections for already-nonzero positions,
                # count down rr over zero-history positions
                while k <= se:
                    if int(zz[k]) != 0:
                        _correct(zz, k)
                    else:
                        if rr == 0:
                            break
                        rr -= 1
                    k += 1
                if s:
                    if k > se:
                        raise ValueError(
                            "corrupt JPEG AC refinement run"
                        )
                    zz[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                if int(zz[k]) != 0:
                    _correct(zz, k)
                k += 1
            eobrun -= 1

    def decode_unit_blocks(unit):
        if interleaved:
            myi, mxi = divmod(unit, mcus_x)
            for (ci, dc_tab, ac_tab) in tabs:
                _cid, hi, vi, _tq = comps[ci]
                for by in range(vi):
                    for bx in range(hi):
                        yield (ci, dc_tab, ac_tab,
                               coef[ci][myi * vi + by, mxi * hi + bx])
        else:
            ci, dc_tab, ac_tab = tabs[0]
            _cid, hi, vi, _tq = comps[ci]
            cbw = ((w_ * hi + hmax - 1) // hmax + 7) // 8
            by, bx = divmod(unit, cbw)
            yield ci, dc_tab, ac_tab, coef[ci][by, bx]

    for unit in range(total_units):
        if restart_interval and unit and unit % restart_interval == 0:
            r = _BitReader(segments[unit // restart_interval])
            prev_dc = {ci: 0 for ci, _d, _a in tabs}
            eobrun = 0
        for ci, dc_tab, ac_tab, zz in decode_unit_blocks(unit):
            if not progressive:
                seq_block(zz, dc_tab, ac_tab, ci)
            elif ss == 0:
                if ah == 0:
                    dc_first(zz, dc_tab, ci)
                else:
                    dc_refine(zz)
            else:
                if ah == 0:
                    ac_first(zz, ac_tab)
                else:
                    ac_refine(zz, ac_tab)


def _jpeg_decode_pixels(payload: bytes):
    """Parse + entropy-decode a JPEG — baseline (SOF0, including
    non-interleaved per-component scans) and progressive (SOF2:
    spectral selection + successive approximation, DC and AC
    refinement passes, EOB runs). Returns (width, height, pixels
    ndarray uint8). Internal: decode_jpeg wraps it for stats; tests
    use it for per-pixel assertions."""
    import numpy as np

    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, "np.ndarray"] = {}
    restart_interval = 0
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    progressive = False
    coef = None
    covered: set[int] = set()
    scans_seen = 0
    adobe_transform = None
    while True:
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG: no EOI marker")
        if payload[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD8:
            continue
        if marker == 0xD9:
            break
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                      0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0) and progressive (SOF2) JPEG are "
                "supported"
            )
        if marker == 0xDD:  # DRI: MCUs between restart markers
            (length,) = struct.unpack_from(">H", payload, pos)
            if length != 4 or pos + 4 > len(payload):
                raise ValueError("bad DRI segment")
            (restart_interval,) = struct.unpack_from(
                ">H", payload, pos + 2)
            pos += length
            continue
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG segment")
        (length,) = struct.unpack_from(">H", payload, pos)
        if length < 2 or pos + length > len(payload):
            raise ValueError("truncated JPEG segment")
        body = payload[pos + 2 : pos + length]
        pos += length
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq != 0:
                    raise NotImplementedError("12-bit JPEG quant tables")
                if off + 65 > len(body):
                    raise ValueError("truncated DQT")
                raw = bytes(body[off + 1 : off + 65])
                cached = _JPEG_DQT_CACHE.get(raw)
                if cached is None:
                    zz = np.frombuffer(raw, np.uint8)
                    nat = np.zeros(64, dtype=np.float64)
                    nat[_ZIGZAG] = zz
                    cached = nat.reshape(8, 8)
                    cached.flags.writeable = False  # consumers multiply only
                    if len(_JPEG_DQT_CACHE) < 64:
                        _JPEG_DQT_CACHE[raw] = cached
                qtables[tq] = cached
                off += 65
        elif marker in (0xC0, 0xC2):  # SOF0 / SOF2
            if sof is not None:
                raise ValueError("JPEG has more than one frame header")
            progressive = marker == 0xC2
            if len(body) < 6:
                raise ValueError("truncated SOF0")
            prec, h, w_, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG unsupported")
            if ncomp not in (1, 3, 4):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG unsupported (grayscale, "
                    "YCbCr, or Adobe CMYK/YCCK)"
                )
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("truncated SOF0 component specs")
            comps = []
            for ci in range(ncomp):
                cid, sampling, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = sampling >> 4, sampling & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(
                        f"JPEG sampling factor {hi}x{vi} unsupported "
                        "(1 or 2 per axis: 4:4:4 / 4:2:2 / 4:2:0)"
                    )
                comps.append((cid, hi, vi, tq))
            if ncomp == 1 and comps[0][1:3] != (1, 1):
                # single-component scans are never interleaved; the
                # factors are meaningless — normalize rather than raise
                comps[0] = (comps[0][0], 1, 1, comps[0][3])
            sof = (w_, h, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = (w_ + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            coef = [np.zeros((mcus_y * vi, mcus_x * hi, 64),
                             dtype=np.int64)
                    for (_cid, hi, vi, _tq) in comps]
        elif marker == 0xC4:  # DHT (possibly several tables)
            off = 0
            while off < len(body):
                if off + 17 > len(body):
                    raise ValueError("truncated DHT")
                tc, th = body[off] >> 4, body[off] & 0x0F
                counts = list(body[off + 1 : off + 17])
                n = sum(counts)
                if len(body) < off + 17 + n:
                    raise ValueError("truncated DHT")
                raw = bytes(body[off + 1 : off + 17 + n])
                table = _JPEG_DHT_CACHE.get(raw)
                if table is None:
                    symbols = list(body[off + 17 : off + 17 + n])
                    table = {}
                    code = 0
                    k = 0
                    for ln in range(1, 17):
                        for _ in range(counts[ln - 1]):
                            table[(ln, code)] = symbols[k]
                            code += 1
                            k += 1
                        code <<= 1
                    table[_JPEG_LUT_KEY] = _huff_decode_lut(table)
                    if len(_JPEG_DHT_CACHE) < 64:
                        _JPEG_DHT_CACHE[raw] = table
                huff[(tc, th)] = table
                off += 17 + n
        elif marker == 0xDA:  # SOS — decode the scan, keep parsing
            if sof is None:
                raise ValueError("JPEG SOS before SOF0")
            if len(body) < 1 or len(body) < 1 + 2 * body[0] + 3:
                raise ValueError("truncated SOS")
            n_scan = body[0]
            id_to_idx = {cid: i for i, (cid, _h, _v, _t)
                         in enumerate(sof[2])}
            scan_comps = []
            for si in range(n_scan):
                cid, tt = body[1 + 2 * si], body[2 + 2 * si]
                if cid not in id_to_idx:
                    raise ValueError(
                        f"JPEG scan names unknown component {cid}")
                scan_comps.append((id_to_idx[cid], tt >> 4, tt & 0x0F))
                covered.add(id_to_idx[cid])
            ss, se = body[1 + 2 * n_scan], body[2 + 2 * n_scan]
            ahal = body[3 + 2 * n_scan]
            end = _jpeg_entropy_end(payload, pos)
            entropy = payload[pos:end]
            pos = end
            _jpeg_decode_scan(
                entropy, sof, (scan_comps, ss, se, ahal >> 4,
                               ahal & 0x0F),
                coef, huff, restart_interval, progressive, np,
            )
            scans_seen += 1
        elif marker == 0xEE and body[:5] == b"Adobe":
            # APP14: byte 11 is the color-transform flag (0 = stored
            # channels as-is, 1 = YCbCr, 2 = YCCK) — the ONLY signal
            # that a 4-component file's channels are inverted CMYK
            if len(body) >= 12:
                adobe_transform = body[11]
        # other APPn/COM/etc: skipped
    if sof is None or scans_seen == 0:
        raise ValueError("JPEG has no scan data")
    w_, h, comps = sof
    for ci, (cid, _hi, _vi, tq) in enumerate(comps):
        if tq not in qtables:
            raise ValueError(f"JPEG references missing quant table {tq}")
        if ci not in covered:
            raise ValueError(f"JPEG scan is missing component {cid}")
    per_comp = [(qtables[tq], None, None, hi, vi)
                for (cid, hi, vi, tq) in comps]
    hmax = max(c[3] for c in per_comp)
    vmax = max(c[4] for c in per_comp)
    t = _dct_matrix()
    mcus_x = (w_ + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    planes: list = [None] * len(per_comp)
    for ci, (qt, _d, _a, hi, vi) in enumerate(per_comp):
        bh, bw = coef[ci].shape[:2]
        # batched de-zigzag + dequant + IDCT over every block at once:
        # the same per-element scatter, multiply and 8×8 matmuls as the
        # former per-block loop (numpy batched matmul is bit-identical
        # per slice), without bh*bw Python iterations
        nat = np.zeros((bh, bw, 64), dtype=np.float64)
        nat[:, :, _ZIGZAG] = coef[ci]
        coeffs = nat.reshape(bh, bw, 8, 8) * qt
        blocks = t.T @ coeffs @ t + 128.0
        planes[ci] = blocks.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    # crop each plane to ITS resolution, then replicate-upsample the
    # subsampled ones back to full geometry (the standard fast JFIF
    # chroma upsampling; exact for the constant-tile oracle path)
    full = []
    for plane, (_q, _d, _a, hi, vi) in zip(planes, per_comp):
        cw = (w_ * hi + hmax - 1) // hmax
        ch = (h * vi + vmax - 1) // vmax
        p = np.clip(np.rint(plane[:ch, :cw]), 0, 255)
        if hi != hmax:
            p = np.repeat(p, hmax // hi, axis=1)
        if vi != vmax:
            p = np.repeat(p, vmax // vi, axis=0)
        full.append(p[:h, :w_])
    if len(full) == 1:
        return w_, h, full[0].astype(np.uint8)
    if len(full) == 4:
        # Adobe CMYK/YCCK: channels are stored INVERTED (255 - value)
        # per Adobe convention; the APP14 transform flag is the only
        # signal of that, so a 4-component file without one is a loud
        # boundary rather than a guessed inversion
        if adobe_transform is None:
            raise NotImplementedError(
                "4-component JPEG without an Adobe APP14 marker "
                "(CMYK channel inversion would be a guess)")
        if adobe_transform == 2:  # YCCK: first three planes are YCbCr
            c_, m_, y_ = _ycbcr_to_rgb(full[0], full[1], full[2])
        elif adobe_transform == 0:  # CMYK stored directly (inverted)
            c_, m_, y_ = full[0], full[1], full[2]
        else:
            raise NotImplementedError(
                f"APP14 transform {adobe_transform} with 4 components")
        k_ = full[3]
        # inverted-channel algebra: stored = 255-C, so the standard
        # CMYK→RGB (255-C)(255-K)/255 is stored_c*stored_k/255 —
        # floor(x+0.5) keeps the chain SQL-replicable
        rr = np.floor(c_ * k_ / 255.0 + 0.5)
        gg = np.floor(m_ * k_ / 255.0 + 0.5)
        bb = np.floor(y_ * k_ / 255.0 + 0.5)
        return w_, h, np.stack([rr, gg, bb], axis=2).astype(np.uint8)
    # color: planes are already rounded to their stored integers
    # (exact on the lossless constant-tile path); the JFIF inverse
    # conversion uses the same half-up rounding the encoder used, so
    # the whole color chain stays SQL-replicable
    rr, gg, bb = _ycbcr_to_rgb(*full)
    img = np.stack([rr, gg, bb], axis=2).astype(np.uint8)
    return w_, h, img


def decode_jpeg(payload: bytes) -> dict:
    """Decode a baseline grayscale JPEG for real: marker walk, DHT/DQT
    table build, Huffman entropy decode with byte unstuffing,
    dequantize, inverse zigzag, IDCT, crop. Statistics cover the
    reconstructed pixels — any entropy/IDCT bug shifts ``mean_value``
    and breaks the oracle (the constant-tile synthesis path is
    distortion-free by construction, see :func:`encode_jpeg`)."""
    w, h, img = _jpeg_decode_pixels(payload)
    n = w * h
    return {
        "media_kind": "image",
        "width": w,
        "height": h,
        "bit_depth": 8,
        "n_units": n,
        # grayscale: mean pixel; color: mean over all RGB samples
        "mean_value": (float(img.sum()) / img.size) if n else 0.0,
        "n_bytes": len(payload),
    }


# --------------------------------------------------------------- TIFF
#
# Baseline TIFF 6.0 (public Adobe spec): a byte-order header (II
# little / MM big endian), a linked IFD of 12-byte tag entries, image
# data in strips addressed by StripOffsets/StripByteCounts, optional
# PackBits (RLE) compression per strip. Grayscale (photometric 1) and
# RGB (photometric 2), 8 bits per sample.

_TIFF_TAGS = {
    256: "width", 257: "height", 258: "bits", 259: "compression",
    262: "photometric", 266: "fill_order", 273: "offsets", 277: "spp",
    278: "rows_per_strip", 284: "planar", 292: "t4_options",
    530: "ycbcr_subsampling", 532: "ref_black_white",
    279: "counts", 317: "predictor", 320: "colormap", 322: "tile_width",
    323: "tile_length", 324: "tile_offsets", 325: "tile_counts",
}


# ------------------------------------------------- CCITT Group 4 (T.6)
#
# The scanned-document/fax standard: 2-D MMR coding from the public
# ITU-T T.6 spec, with horizontal-mode run lengths drawn from the
# T.4 modified-Huffman tables. Bilevel only (BitsPerSample 1), both
# photometric interpretations and both FillOrders. The decoder emits
# ONE BYTE PER PIXEL (0 = white, 1 = black in coding terms), so the
# shared strip/tile assembly and stats paths work unchanged.
#
# Table data below is the public ITU-T Recommendation T.4 §2 code
# tables (terminating codes 0-63, makeup codes 64-1728, and the
# shared extended makeups 1792-2560), transcribed run: (length, code).

_T4_WHITE = {
    0: (8, 0b00110101), 1: (6, 0b000111), 2: (4, 0b0111), 3: (4, 0b1000),
    4: (4, 0b1011), 5: (4, 0b1100), 6: (4, 0b1110), 7: (4, 0b1111),
    8: (5, 0b10011), 9: (5, 0b10100), 10: (5, 0b00111), 11: (5, 0b01000),
    12: (6, 0b001000), 13: (6, 0b000011), 14: (6, 0b110100),
    15: (6, 0b110101), 16: (6, 0b101010), 17: (6, 0b101011),
    18: (7, 0b0100111), 19: (7, 0b0001100), 20: (7, 0b0001000),
    21: (7, 0b0010111), 22: (7, 0b0000011), 23: (7, 0b0000100),
    24: (7, 0b0101000), 25: (7, 0b0101011), 26: (7, 0b0010011),
    27: (7, 0b0100100), 28: (7, 0b0011000), 29: (8, 0b00000010),
    30: (8, 0b00000011), 31: (8, 0b00011010), 32: (8, 0b00011011),
    33: (8, 0b00010010), 34: (8, 0b00010011), 35: (8, 0b00010100),
    36: (8, 0b00010101), 37: (8, 0b00010110), 38: (8, 0b00010111),
    39: (8, 0b00101000), 40: (8, 0b00101001), 41: (8, 0b00101010),
    42: (8, 0b00101011), 43: (8, 0b00101100), 44: (8, 0b00101101),
    45: (8, 0b00000100), 46: (8, 0b00000101), 47: (8, 0b00001010),
    48: (8, 0b00001011), 49: (8, 0b01010010), 50: (8, 0b01010011),
    51: (8, 0b01010100), 52: (8, 0b01010101), 53: (8, 0b00100100),
    54: (8, 0b00100101), 55: (8, 0b01011000), 56: (8, 0b01011001),
    57: (8, 0b01011010), 58: (8, 0b01011011), 59: (8, 0b01001010),
    60: (8, 0b01001011), 61: (8, 0b00110010), 62: (8, 0b00110011),
    63: (8, 0b00110100),
    64: (5, 0b11011), 128: (5, 0b10010), 192: (6, 0b010111),
    256: (7, 0b0110111), 320: (8, 0b00110110), 384: (8, 0b00110111),
    448: (8, 0b01100100), 512: (8, 0b01100101), 576: (8, 0b01101000),
    640: (8, 0b01100111), 704: (9, 0b011001100), 768: (9, 0b011001101),
    832: (9, 0b011010010), 896: (9, 0b011010011), 960: (9, 0b011010100),
    1024: (9, 0b011010101), 1088: (9, 0b011010110),
    1152: (9, 0b011010111), 1216: (9, 0b011011000),
    1280: (9, 0b011011001), 1344: (9, 0b011011010),
    1408: (9, 0b011011011), 1472: (9, 0b010011000),
    1536: (9, 0b010011001), 1600: (9, 0b010011010),
    1664: (6, 0b011000), 1728: (9, 0b010011011),
}

_T4_BLACK = {
    0: (10, 0b0000110111), 1: (3, 0b010), 2: (2, 0b11), 3: (2, 0b10),
    4: (3, 0b011), 5: (4, 0b0011), 6: (4, 0b0010), 7: (5, 0b00011),
    8: (6, 0b000101), 9: (6, 0b000100), 10: (7, 0b0000100),
    11: (7, 0b0000101), 12: (7, 0b0000111), 13: (8, 0b00000100),
    14: (8, 0b00000111), 15: (9, 0b000011000), 16: (10, 0b0000010111),
    17: (10, 0b0000011000), 18: (10, 0b0000001000),
    19: (11, 0b00001100111), 20: (11, 0b00001101000),
    21: (11, 0b00001101100), 22: (11, 0b00000110111),
    23: (11, 0b00000101000), 24: (11, 0b00000010111),
    25: (11, 0b00000011000), 26: (12, 0b000011001010),
    27: (12, 0b000011001011), 28: (12, 0b000011001100),
    29: (12, 0b000011001101), 30: (12, 0b000001101000),
    31: (12, 0b000001101001), 32: (12, 0b000001101010),
    33: (12, 0b000001101011), 34: (12, 0b000011010010),
    35: (12, 0b000011010011), 36: (12, 0b000011010100),
    37: (12, 0b000011010101), 38: (12, 0b000011010110),
    39: (12, 0b000011010111), 40: (12, 0b000001101100),
    41: (12, 0b000001101101), 42: (12, 0b000011011010),
    43: (12, 0b000011011011), 44: (12, 0b000001010100),
    45: (12, 0b000001010101), 46: (12, 0b000001010110),
    47: (12, 0b000001010111), 48: (12, 0b000001100100),
    49: (12, 0b000001100101), 50: (12, 0b000001010010),
    51: (12, 0b000001010011), 52: (12, 0b000000100100),
    53: (12, 0b000000110111), 54: (12, 0b000000111000),
    55: (12, 0b000000100111), 56: (12, 0b000000101000),
    57: (12, 0b000001011000), 58: (12, 0b000001011001),
    59: (12, 0b000000101011), 60: (12, 0b000000101100),
    61: (12, 0b000001011010), 62: (12, 0b000001100110),
    63: (12, 0b000001100111),
    64: (10, 0b0000001111), 128: (12, 0b000011001000),
    192: (12, 0b000011001001), 256: (12, 0b000001011011),
    320: (12, 0b000000110011), 384: (12, 0b000000110100),
    448: (12, 0b000000110101), 512: (13, 0b0000001101100),
    576: (13, 0b0000001101101), 640: (13, 0b0000001001010),
    704: (13, 0b0000001001011), 768: (13, 0b0000001001100),
    832: (13, 0b0000001001101), 896: (13, 0b0000001110010),
    960: (13, 0b0000001110011), 1024: (13, 0b0000001110100),
    1088: (13, 0b0000001110101), 1152: (13, 0b0000001110110),
    1216: (13, 0b0000001110111), 1280: (13, 0b0000001010010),
    1344: (13, 0b0000001010011), 1408: (13, 0b0000001010100),
    1472: (13, 0b0000001010101), 1536: (13, 0b0000001011010),
    1600: (13, 0b0000001011011), 1664: (13, 0b0000001100100),
    1728: (13, 0b0000001100101),
}

# extended makeup codes 1792-2560 are shared by both colors (T.4 §2)
_T4_EXT = {
    1792: (11, 0b00000001000), 1856: (11, 0b00000001100),
    1920: (11, 0b00000001101), 1984: (12, 0b000000010010),
    2048: (12, 0b000000010011), 2112: (12, 0b000000010100),
    2176: (12, 0b000000010101), 2240: (12, 0b000000010110),
    2304: (12, 0b000000010111), 2368: (12, 0b000000011100),
    2432: (12, 0b000000011101), 2496: (12, 0b000000011110),
    2560: (12, 0b000000011111),
}


def _t4_decode_tables():
    """(len, code) → run lookup per color, makeups included."""
    white = {v: k for k, v in {**_T4_WHITE, **_T4_EXT}.items()}
    black = {v: k for k, v in {**_T4_BLACK, **_T4_EXT}.items()}
    return white, black


_T4_DEC_WHITE, _T4_DEC_BLACK = _t4_decode_tables()
_T4_MAX_LEN = 13

# byte bit-reversal table for FillOrder 2 (TIFF tag 266: LSB-first)
_BITREV = bytes(int(f"{i:08b}"[::-1], 2) for i in range(256))

# 0↔1 swap for photometric-1 bilevel samples (identity elsewhere)
_G4_INVERT = bytes(b ^ 1 if b < 2 else b for b in range(256))


class _G4BitWriter:
    """MSB-first bit accumulator for the G4 encoder."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, length: int, code: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.out)


class _G4BitReader:
    """MSB-first bit reader with prefix-code matching."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def take(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("G4: bit stream exhausted mid-code")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def peek(self, n: int) -> tuple[int, int]:
        """Up to n bits without consuming; returns (got, value)."""
        save = self.pos
        got, v = 0, 0
        try:
            for _ in range(n):
                v = (v << 1) | self.take(1)
                got += 1
        except ValueError:
            pass
        self.pos = save
        return got, v

    def exhausted(self) -> bool:
        return self.pos >= len(self.data) * 8


def _t4_read_run(br: _G4BitReader, black: bool) -> int:
    """One complete run length: zero or more makeup codes then a
    terminating code (< 64), per T.4 §2.2."""
    table = _T4_DEC_BLACK if black else _T4_DEC_WHITE
    total = 0
    while True:
        length, code = 0, 0
        run = None
        while length < _T4_MAX_LEN:
            code = (code << 1) | br.take(1)
            length += 1
            run = table.get((length, code))
            if run is not None:
                break
        if run is None:
            raise ValueError(
                f"G4: invalid {'black' if black else 'white'} run code")
        total += run
        if run < 64:
            return total


def _g4_changes(row: bytes) -> list[int]:
    """Positions where the pixel color changes (colors alternate
    starting white)."""
    changes = []
    prev = 0
    for i, v in enumerate(row):
        if v != prev:
            changes.append(i)
            prev = v
    return changes


def _g4_b1_b2(ref: list[int], a0: int, color: int,
              width: int) -> tuple[int, int]:
    """b1: first changing element on the reference line right of a0
    whose NEW color is opposite to the coding color; b2: the next one
    (T.6 §2.2.1). Change index parity gives the new color (even →
    to-black)."""
    i = bisect.bisect_right(ref, a0)
    if (i & 1) != color:  # need new-color != color → index parity==color
        i += 1
    b1 = ref[i] if i < len(ref) else width
    b2 = ref[i + 1] if i + 1 < len(ref) else width
    return b1, b2


_V_CODES = {0: (1, 0b1), 1: (3, 0b011), 2: (6, 0b000011),
            3: (7, 0b0000011), -1: (3, 0b010),
            -2: (6, 0b000010), -3: (7, 0b0000010)}


def _t4_put_run(bw: _G4BitWriter, run: int, is_black: bool) -> None:
    """Emit one modified-Huffman run: chained makeups then the
    terminating code (< 64)."""
    enc = _T4_BLACK if is_black else _T4_WHITE
    while run >= 64:
        # largest makeup ≤ run (makeups step by 64)
        mk = min(2560, (run // 64) * 64)
        tab = enc if mk <= 1728 else _T4_EXT
        bw.put(*tab[mk])
        run -= mk
    bw.put(*enc[run])


def _t6_encode_row(bw: _G4BitWriter, cur: list[int], ref: list[int],
                   width: int) -> None:
    """Code one row 2-D against the reference line — the shared T.6 /
    T.4-2-D row coder. Mode selection per spec: pass when b2 < a1,
    vertical when |a1-b1| ≤ 3, horizontal otherwise."""
    a0, color = -1, 0
    while a0 < width:
        b1, b2 = _g4_b1_b2(ref, a0, color, width)
        # a1: first change in CUR strictly right of a0 with new
        # color != color
        i = bisect.bisect_right(cur, a0)
        if (i & 1) != color:
            i += 1
        a1 = cur[i] if i < len(cur) else width
        if b2 < a1:
            bw.put(4, 0b0001)  # pass
            a0 = b2
            continue
        d = a1 - b1
        if -3 <= d <= 3:
            bw.put(*_V_CODES[d])
            a0, color = a1, 1 - color
            continue
        # horizontal: two runs from a0 (imaginary start counts 0)
        a2 = cur[i + 1] if i + 1 < len(cur) else width
        bw.put(3, 0b001)
        _t4_put_run(bw, a1 - a0 - (1 if a0 < 0 else 0), bool(color))
        _t4_put_run(bw, a2 - a1, not bool(color))
        a0 = a2


def g4_encode(rows: list[bytes], width: int) -> bytes:
    """T.6 2-D MMR encoder over unpacked rows (one byte per pixel,
    0 = white / 1 = black), EOFB-terminated."""
    bw = _G4BitWriter()
    ref: list[int] = []
    for row in rows:
        if len(row) != width:
            raise ValueError("G4: row width mismatch")
        cur = _g4_changes(row)
        _t6_encode_row(bw, cur, ref, width)
        ref = cur
    bw.put(12, 0b000000000001)  # EOFB = two EOLs
    bw.put(12, 0b000000000001)
    return bw.flush()


def g4_decode(data: bytes, width: int, height: int,
              fill_order: int = 1) -> bytes:
    """T.6 decoder → one byte per pixel (0 white / 1 black),
    row-major. FillOrder 2 bit-reverses every byte first (TIFF tag
    266). The 2-D extension escape (0000001...) is a loud boundary;
    structural damage (invalid codes, changes out of order, stream
    exhaustion) raises ValueError."""
    if fill_order == 2:
        data = bytes(_BITREV[b] for b in data)
    elif fill_order != 1:
        raise ValueError(f"G4: bad FillOrder {fill_order}")
    br = _G4BitReader(data)
    out = bytearray()
    ref: list[int] = []
    for _ in range(height):
        cur = _t6_decode_row(br, ref, width)
        out += _g4_row_bytes(cur, width)
        ref = cur
    return bytes(out)


def _t6_decode_row(br: _G4BitReader, ref: list[int],
                   width: int) -> list[int]:
    """Decode one 2-D-coded row against the reference line → the
    row's changing-element positions (the shared T.6 / T.4-2-D row
    decoder)."""
    cur: list[int] = []
    a0, color = -1, 0

    def vertical(a1: int) -> None:
        nonlocal a0, color
        # rightward-progress guard: a malformed stream whose
        # vertical moves stall would otherwise loop forever
        if a1 <= a0 or a1 < 0:
            raise ValueError("G4: vertical move not rightward")
        cur.append(a1)
        a0, color = a1, 1 - color

    while a0 < width:
        b1, b2 = _g4_b1_b2(ref, a0, color, width)
        if br.take(1):  # 1 → V0
            vertical(b1)
            continue
        if br.take(1):  # 01x → VR1/VL1
            vertical(b1 + (1 if br.take(1) else -1))
            continue
        if br.take(1):  # 001 horizontal
            r1 = _t4_read_run(br, black=bool(color))
            r2 = _t4_read_run(br, black=not bool(color))
            start = max(a0, 0)
            a1, a2 = start + r1, start + r1 + r2
            cur.extend((a1, a2))
            a0 = a2
            continue
        if br.take(1):  # 0001 pass
            if b2 <= a0:
                raise ValueError("G4: pass mode not rightward")
            a0 = b2
            continue
        if br.take(1):  # 00001 1x → VR2/VL2
            vertical(b1 + (2 if br.take(1) else -2))
            continue
        if br.take(1):  # 000001 1x → VR3/VL3
            vertical(b1 + (3 if br.take(1) else -3))
            continue
        # six zeros consumed: 0000001 escapes to the 2-D
        # extensions; more zeros can only be EOL/EOFB, which is
        # premature inside the image
        if br.take(1):
            raise NotImplementedError(
                "G4: 2-D extension codes are not supported")
        raise ValueError("G4: premature EOL/EOFB or invalid code "
                         "inside the image")
    return [c for c in cur if c < width]


def _g4_row_bytes(cur: list[int], width: int) -> bytearray:
    """Changing-element positions → one byte per pixel, validating
    monotone order."""
    if any(y <= x for x, y in zip(cur, cur[1:])):
        raise ValueError("G4: changing elements out of order")
    row = bytearray(width)
    v = 0
    prev = 0
    for c in cur:
        if v:
            for i in range(prev, c):
                row[i] = 1
        prev, v = c, 1 - v
    if v:
        for i in range(prev, width):
            row[i] = 1
    return row


# ---------------------------------------------- CCITT Group 3 (T.4) + MH
#
# The other two fax compressions TIFF carries: Compression 2
# ("CCITT RLE" — pure modified-Huffman 1-D, every row byte-aligned, no
# EOLs) and Compression 3 (T.4 Group 3: EOL-synchronized rows, 1-D MH
# or — with T4Options bit 0 — 2-D rows flagged by a tag bit after each
# EOL, coded with the same mode coder as T.6). Run tables shared with
# the G4 section above.


def _mh_encode_row(bw: _G4BitWriter, row: bytes) -> None:
    """One row as alternating white/black modified-Huffman runs
    (white first; a leading black pixel codes a zero-length white
    run)."""
    color = 0
    pos = 0
    width = len(row)
    while pos < width:
        run = 0
        while pos + run < width and row[pos + run] == color:
            run += 1
        _t4_put_run(bw, run, bool(color))  # first run may be 0 (white)
        pos += run
        color = 1 - color


def _mh_decode_row(br: _G4BitReader, width: int) -> bytearray:
    """Decode one modified-Huffman 1-D row (alternating runs, white
    first) to one byte per pixel."""
    row = bytearray(width)
    pos = 0
    color = 0
    while pos < width:
        run = _t4_read_run(br, black=bool(color))
        if pos + run > width:
            raise ValueError(
                f"G3: run overflows the row ({pos}+{run} > {width})")
        if color:
            for i in range(pos, pos + run):
                row[i] = 1
        pos += run
        color = 1 - color
    return row


def ccitt_rle_encode(rows: list[bytes], width: int) -> bytes:
    """TIFF Compression 2: per-row modified Huffman, each row starting
    on a byte boundary (TIFF 6.0 §10)."""
    bw = _G4BitWriter()
    for row in rows:
        if len(row) != width:
            raise ValueError("G3: row width mismatch")
        _mh_encode_row(bw, row)
        if bw.nbits:  # byte-align the next row
            bw.put(8 - bw.nbits, 0)
    return bw.flush()


def ccitt_rle_decode(data: bytes, width: int, height: int,
                     fill_order: int = 1) -> bytes:
    """TIFF Compression 2 decoder → one byte per pixel."""
    if fill_order == 2:
        data = bytes(_BITREV[b] for b in data)
    br = _G4BitReader(data)
    out = bytearray()
    for _ in range(height):
        out += _mh_decode_row(br, width)
        br.pos = (br.pos + 7) & ~7  # rows start byte-aligned
    return bytes(out)


_EOL_LEN, _EOL_CODE = 12, 0b000000000001


def _g3_read_eol(br: _G4BitReader) -> None:
    """Consume fill bits + one EOL: ≥ 11 zeros then a 1 (T.4 §4.1.2 —
    fill is zero bits, so the run just grows)."""
    zeros = 0
    while True:
        if br.take(1):
            break
        zeros += 1
        if zeros > 4096:
            raise ValueError("G3: runaway fill (no EOL terminator)")
    if zeros < 11:
        raise ValueError(f"G3: EOL with only {zeros} leading zeros")


def g3_encode(rows: list[bytes], width: int, two_d: bool = False,
              byte_align: bool = False, k: int = 2) -> bytes:
    """T.4 Group 3 encoder: an EOL before every row; with ``two_d``
    each EOL carries a tag bit (1 → the next row is 1-D, 0 → 2-D) and
    every ``k``-th row is coded 1-D (the spec's error-confinement
    K-factor), the rest 2-D against the previous row. ``byte_align``
    inserts fill so each EOL ends on a byte boundary (the T4Options
    bit 2 layout). Ends with RTC (six EOLs)."""
    bw = _G4BitWriter()
    ref: list[int] = []

    def eol(tag: int | None) -> None:
        if byte_align:
            total = _EOL_LEN + (1 if tag is not None else 0)
            fill = (8 - (bw.nbits + total) % 8) % 8
            if fill:
                bw.put(fill, 0)
        bw.put(_EOL_LEN, _EOL_CODE)
        if tag is not None:
            bw.put(1, tag)

    for n, row in enumerate(rows):
        if len(row) != width:
            raise ValueError("G3: row width mismatch")
        cur = _g4_changes(row)
        if not two_d:
            eol(None)
            _mh_encode_row(bw, row)
        elif n % k == 0:
            eol(1)
            _mh_encode_row(bw, row)
        else:
            eol(0)
            _t6_encode_row(bw, cur, ref, width)
        ref = cur
    for _ in range(6):  # RTC
        eol(1 if two_d else None)
    return bw.flush()


def g3_decode(data: bytes, width: int, height: int, two_d: bool = False,
              fill_order: int = 1) -> bytes:
    """T.4 Group 3 decoder → one byte per pixel. Every row is
    EOL-synchronized; in 2-D mode the post-EOL tag bit picks the row
    coding. Fill bits (zeros before an EOL, the byte-aligned layout)
    are absorbed by the EOL scan; trailing RTC is ignored."""
    if fill_order == 2:
        data = bytes(_BITREV[b] for b in data)
    elif fill_order != 1:
        raise ValueError(f"G3: bad FillOrder {fill_order}")
    br = _G4BitReader(data)
    out = bytearray()
    ref: list[int] = []
    for _ in range(height):
        _g3_read_eol(br)
        one_d = True if not two_d else bool(br.take(1))
        if one_d:
            row = _mh_decode_row(br, width)
            ref = _g4_changes(bytes(row))
        else:
            ref = _t6_decode_row(br, ref, width)
            row = _g4_row_bytes(ref, width)
        out += row
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF 6.0 §13 LZW: MSB-first bit packing (GIF packs LSB-first),
    fixed 8-bit symbols with clear=256/EOI=257, and the spec's EARLY
    code-width change (width bumps when the next free code reaches
    2^w - 1, one code sooner than vanilla LZW — the famous off-by-one
    every conforming writer shares); table clears at 4094."""
    out = bytearray()
    bitbuf = nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((bitbuf >> nbits) & 0xFF)

    table = {bytes([i]): i for i in range(256)}
    width, next_code = 9, 258
    put(256, width)  # clear
    w = b""
    for ch in data:
        wk = w + bytes([ch])
        if wk in table:
            w = wk
            continue
        put(table[w], width)
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        w = bytes([ch])
        if next_code >= 4094:
            put(table[w], width)
            put(256, width)  # clear and restart
            table = {bytes([i]): i for i in range(256)}
            width, next_code = 9, 258
            w = b""
    if w:
        put(table[w], width)
    put(257, width)  # EOI
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expect: int | None) -> bytes:
    """Inverse of ``_tiff_lzw_encode`` with the same MSB bit order and
    early width change; truncation, codes past the table, and length
    disagreements all raise. ``expect=None`` skips the length checks —
    the PDF LZWDecode filter shares this exact coding (ISO 32000
    §7.4.4 with the default /EarlyChange 1) but does not know the
    decoded length in advance."""
    out = bytearray()
    total = len(data) * 8
    bitpos, width = 0, 9

    def get() -> int:
        nonlocal bitpos
        end = bitpos + width
        if end > total:
            raise ValueError("TIFF: LZW stream truncated (no EOI)")
        v = int.from_bytes(data[bitpos // 8:(end + 7) // 8], "big")
        v = (v >> (((end + 7) // 8) * 8 - end)) & ((1 << width) - 1)
        bitpos = end
        return v

    table: list[bytes] | None = None
    prev = b""
    while True:
        code = get()
        if code == 257:  # EOI
            break
        if code == 256:  # clear
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            code = get()
            if code == 257:
                break
            if code > 255:
                raise ValueError(f"TIFF: bad LZW code {code} after clear")
            prev = table[code]
            out += prev
            continue
        if table is None:
            raise ValueError("TIFF: LZW stream must open with a clear code")
        if code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"TIFF: bad LZW code {code}")
        out += entry
        table.append(prev + entry[:1])
        # the decoder's table lags the writer's by one entry, so it
        # must widen at 2^w - 2 (510/1022/2046) for the writer's
        # early change at 2^w - 1 to line up — the resolution every
        # real reader (libtiff) uses for the spec's famous off-by-one
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        prev = entry
        if expect is not None and len(out) > expect:
            raise ValueError("TIFF: LZW decodes past the strip size")
    if expect is not None and len(out) != expect:
        raise ValueError(
            f"TIFF: strip decoded to {len(out)} bytes, expected {expect}")
    return bytes(out)


def _tiff_diff_rows(data: bytes, width: int, spp: int,
                    bps: int = 1, e: str = "<") -> bytes:
    """Apply horizontal differencing (predictor 2): per row, each
    sample stores its delta from the same component one pixel left.
    Differencing operates on whole SAMPLES — for 16-bit data that is
    mod-65536 arithmetic on words in the file byte order, not on
    bytes (TIFF 6.0 §14)."""
    if bps == 1:
        out = bytearray(data)
        row_len = width * spp
        for r in range(0, len(data), row_len):
            for x in range(row_len - 1, spp - 1, -1):
                out[r + x] = (data[r + x] - data[r + x - spp]) & 0xFF
        return bytes(out)
    from array import array

    vals = array("H")
    vals.frombytes(data)
    if (e == "<") != (sys.byteorder == "little"):
        vals.byteswap()
    row_len = width * spp
    out = array("H", vals)
    for r in range(0, len(vals), row_len):
        for x in range(row_len - 1, spp - 1, -1):
            out[r + x] = (vals[r + x] - vals[r + x - spp]) & 0xFFFF
    if (e == "<") != (sys.byteorder == "little"):
        out.byteswap()
    return out.tobytes()


def _tiff_undiff_rows(data: bytes, width: int, spp: int,
                      bps: int = 1, e: str = "<") -> bytes:
    """Undo predictor 2: cumulative sum along each row per component
    (sample-wide — mod-65536 words for 16-bit data)."""
    if bps == 1:
        out = bytearray(data)
        row_len = width * spp
        for r in range(0, len(data), row_len):
            for x in range(spp, row_len):
                out[r + x] = (out[r + x] + out[r + x - spp]) & 0xFF
        return bytes(out)
    from array import array

    out = array("H")
    out.frombytes(data)
    if (e == "<") != (sys.byteorder == "little"):
        out.byteswap()
    row_len = width * spp
    for r in range(0, len(out), row_len):
        for x in range(spp, row_len):
            out[r + x] = (out[r + x] + out[r + x - spp]) & 0xFFFF
    if (e == "<") != (sys.byteorder == "little"):
        out.byteswap()
    return out.tobytes()


def _packbits_encode(data: bytes) -> bytes:
    """PackBits: runs of ≥3 equal bytes → (257-n, byte); literals
    otherwise, both capped at 128 per packet."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        start = i
        i += run
        while i < n and i - start < 128:
            nxt = 1
            while i + nxt < n and nxt < 3 and data[i + nxt] == data[i]:
                nxt += 1
            if nxt >= 3:
                break
            i += 1
        out += bytes([i - start - 1]) + data[start:i]
    return bytes(out)


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        n = data[i]
        i += 1
        if n < 128:  # literal of n+1 bytes
            if i + n + 1 > len(data):
                raise ValueError("TIFF: PackBits literal overruns strip")
            out += data[i:i + n + 1]
            i += n + 1
        elif n == 128:  # spec no-op
            continue
        else:  # run of 257-n copies
            if i >= len(data):
                raise ValueError("TIFF: PackBits run missing its byte")
            out += bytes([data[i]]) * (257 - n)
            i += 1
    if len(out) != expect:
        raise ValueError(
            f"TIFF: strip decoded to {len(out)} bytes, expected {expect}")
    return bytes(out)


def encode_tiff(width: int, height: int, pixel_value: int | None = None,
                base: int = 0, rgb: bool = False,
                compression: str = "none", rows_per_strip: int = 2,
                big_endian: bool = False, predictor: int = 1,
                tiled: bool = False,
                tile: tuple[int, int] = (16, 16),
                bit_depth: int = 8,
                palette: bool = False,
                planar: bool = False,
                rgb_const: tuple[int, int, int] | None = None,
                ycbcr: bool = False,
                _origin: int = 8, _return_page: bool = False):
    """Build a real baseline TIFF. Content is the clip-free gradient
    v(x, y) = base + x + 2y (mean base + (w-1)/2 + (h-1)); ``rgb``
    stores channels (v, v+1, v+2) (mean +1); ``pixel_value`` overrides
    with a constant (the PackBits run-packet exerciser). Strips of
    ``rows_per_strip`` rows each — or the TILED organization (§15,
    the large-file/GeoTIFF layout: full-size edge-padded tiles,
    dimensions multiples of 16) when ``tiled`` — compressed with
    PackBits, the spec's LZW (the most common real-world TIFF
    compression, optionally with horizontal differencing —
    ``predictor=2``), or Adobe Deflate; either byte order.
    ``bit_depth=16`` (the scientific/GeoTIFF depth) stores each sample
    as the word v·257 in the file byte order, so the 16-bit mean is
    exactly 257× the 8-bit closed form and the high byte recovers v
    exactly for pixel access. ``palette=True`` writes PHOTOMETRIC 3
    (the scanned-document layout): the gradient values become 8-bit
    INDEXES through a grayscale ColorMap whose entry i is the 16-bit
    word i·257 per channel — decode expands through the map, so the
    mean is again 257× the 8-bit closed form."""
    e = ">" if big_endian else "<"
    spp = 3 if rgb else 1
    if bit_depth not in (8, 16):
        raise ValueError(f"TIFF: bit_depth {bit_depth} is not encodable")
    if palette and (rgb or bit_depth != 8):
        raise ValueError(
            "TIFF: palette requires grayscale gradient 8-bit indexes")
    bps = bit_depth // 8
    if predictor not in (1, 2):
        raise ValueError(f"TIFF: predictor {predictor} is not encodable")
    if predictor == 2 and compression not in ("lzw", "deflate"):
        raise ValueError("TIFF: predictor 2 pairs with LZW/Deflate here")
    if planar and (spp == 1 or tiled):
        raise ValueError(
            "TIFF: planar layout needs spp 3 and strips (no tiles)")
    if (rgb_const is not None or ycbcr) and (not rgb or bit_depth != 8):
        raise ValueError("TIFF: rgb_const/ycbcr need rgb=True, 8-bit")
    rows = []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            v = pixel_value if pixel_value is not None else base + x + 2 * y
            px = rgb_const if rgb_const is not None else (
                (v, v + 1, v + 2) if rgb else (v,))
            if any(not 0 <= c <= 255 for c in px):
                raise ValueError("pixel exceeds a byte")
            if bps == 1:
                row += bytes(px)
            else:
                row += struct.pack(f"{e}{spp}H", *(c * 257 for c in px))
        rows.append(bytes(row))
    if ycbcr:
        # forward full-range BT.601 per pixel (JFIF chain), stored as
        # photometric 6 with an explicit 4:4:4 subsampling tag
        import numpy as np

        conv = []
        for row in rows:
            a = np.frombuffer(row, np.uint8).astype(np.float64)
            a = a.reshape(-1, 3)
            yy, cb, cr = _rgb_to_ycbcr(a[:, 0], a[:, 1], a[:, 2])
            conv.append(np.stack([yy, cb, cr], axis=1)
                        .astype(np.uint8).reshape(-1).tobytes())
        rows = conv
    if tiled:
        tw, th = tile
        if tw % 16 or th % 16 or tw <= 0 or th <= 0:
            raise ValueError("TIFF: tile dims must be multiples of 16")
        strips = []
        seg_px = tw
        for ty in range(0, height, th):
            for tx in range(0, width, tw):
                t = bytearray()
                for r in range(th):
                    y = ty + r
                    line = rows[y][tx * spp * bps:(tx + tw) * spp * bps] \
                        if y < height else b""
                    t += line + b"\x00" * (tw * spp * bps - len(line))
                strips.append(bytes(t))
    elif planar:
        # tag 284 = 2: one run of strips PER SAMPLE — all red strips,
        # then green, then blue; each strip carries one sample's plane
        seg_px = width
        strips = []
        for p_i in range(spp):
            for y in range(0, height, rows_per_strip):
                t = bytearray()
                for r in range(y, min(y + rows_per_strip, height)):
                    row = rows[r]
                    for x in range(width):
                        at = (x * spp + p_i) * bps
                        t += row[at:at + bps]
                strips.append(bytes(t))
    else:
        seg_px = width
        strips = [
            b"".join(rows[y:y + rows_per_strip])
            for y in range(0, height, rows_per_strip)
        ] or [b""]
    comp_code = {"none": 1, "lzw": 5, "deflate": 8,
                 "packbits": 32773}[compression]
    strip_spp = 1 if planar else spp
    if predictor == 2:
        strips = [_tiff_diff_rows(s, seg_px, strip_spp, bps, e)
                  for s in strips]
    if compression == "packbits":
        strips = [_packbits_encode(s) for s in strips]
    elif compression == "lzw":
        strips = [_tiff_lzw_encode(s) for s in strips]
    elif compression == "deflate":
        strips = [zlib.compress(s) for s in strips]
    # layout: header(8) | strip data | BitsPerSample array (rgb only) |
    # strip offset/count arrays (if >2 entries... keep simple: always
    # out-of-line when count > 1) | IFD. ``_origin`` shifts every
    # absolute offset so encode_tiff_multipage can chain page blobs.
    pos = _origin
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    extra = bytearray()

    def arr_offset(values, typ):
        nonlocal pos
        off = pos
        fmt = "H" if typ == 3 else "I"
        extra.extend(struct.pack(f"{e}{len(values)}{fmt}", *values))
        pos += len(values) * (2 if typ == 3 else 4)
        return off

    entries = []  # (tag, type, count, packed value field)

    def inline(tag, typ, value):
        if typ == 3:
            entries.append((tag, 3, 1, struct.pack(f"{e}HH", value, 0)))
        else:
            entries.append((tag, 4, 1, struct.pack(f"{e}I", value)))

    inline(256, 4, width)
    inline(257, 4, height)
    if spp == 3:
        bits_off = arr_offset([bit_depth] * 3, 3)
        entries.append((258, 3, 3, struct.pack(f"{e}I", bits_off)))
    else:
        inline(258, 3, bit_depth)
    inline(259, 3, comp_code)
    inline(262, 3, 3 if palette else (6 if ycbcr else (2 if rgb else 1)))
    if ycbcr:
        entries.append((530, 3, 2, struct.pack(f"{e}HH", 1, 1)))
    if palette:
        cm_off = arr_offset(
            [i * 257 for i in range(256)] * 3, 3)
        entries.append((320, 3, 768, struct.pack(f"{e}I", cm_off)))
    counts = [len(s) for s in strips]
    if tiled:
        inline(322, 3, tile[0])
        inline(323, 3, tile[1])
        if len(strips) == 1:
            entries.append((324, 4, 1,
                            struct.pack(f"{e}I", strip_offsets[0])))
            entries.append((325, 4, 1, struct.pack(f"{e}I", counts[0])))
        else:
            so = arr_offset(strip_offsets, 4)
            sc = arr_offset(counts, 4)
            entries.append((324, 4, len(strips),
                            struct.pack(f"{e}I", so)))
            entries.append((325, 4, len(strips),
                            struct.pack(f"{e}I", sc)))
    elif len(strips) == 1:
        entries.append((273, 4, 1, struct.pack(f"{e}I", strip_offsets[0])))
        entries.append((279, 4, 1, struct.pack(f"{e}I", counts[0])))
    elif len(strips) == 2 and max(*strip_offsets, *counts) < 0x10000:
        # two SHORTs fit the 4-byte value field INLINE (spec rule) —
        # the layout a 2-strip real-world file commonly uses
        entries.append((273, 3, 2, struct.pack(f"{e}HH", *strip_offsets)))
        entries.append((279, 3, 2, struct.pack(f"{e}HH", *counts)))
    else:
        so = arr_offset(strip_offsets, 4)
        sc = arr_offset(counts, 4)
        entries.append((273, 4, len(strips), struct.pack(f"{e}I", so)))
        entries.append((279, 4, len(strips), struct.pack(f"{e}I", sc)))
    inline(277, 3, spp)
    if not tiled:
        inline(278, 4, rows_per_strip)
    if planar:
        inline(284, 3, 2)
    if predictor == 2:
        inline(317, 3, 2)
    entries.sort()  # the spec requires ascending tag order
    ifd_off = pos
    ifd = struct.pack(f"{e}H", len(entries))
    for tag, typ, cnt, val in entries:
        ifd += struct.pack(f"{e}HHI", tag, typ, cnt) + val
    ifd += struct.pack(f"{e}I", 0)  # no next IFD (patched when chained)
    if _return_page:
        return b"".join(strips) + bytes(extra) + ifd, ifd_off
    head = (b"MM" if big_endian else b"II") + struct.pack(f"{e}H", 42) \
        + struct.pack(f"{e}I", ifd_off)
    return head + b"".join(strips) + bytes(extra) + ifd


def encode_tiff_multipage(pages: list[dict],
                          big_endian: bool = False) -> bytes:
    """Write a MULTI-PAGE TIFF (the fax/scan corpus shape): one IFD
    per page chained through the trailing next-IFD pointers, each page
    an independent ``encode_tiff`` parameter dict (width/height/base/
    rgb/compression/predictor/tiled...)."""
    if not pages:
        raise ValueError("TIFF: at least one page required")
    e = ">" if big_endian else "<"
    origin = 8
    blobs: list[bytearray] = []
    ifds: list[int] = []
    for kw in pages:
        blob, ifd = encode_tiff(big_endian=big_endian, _origin=origin,
                                _return_page=True, **kw)
        blobs.append(bytearray(blob))
        ifds.append(ifd)
        origin += len(blob)
    for i in range(len(blobs) - 1):  # chain the next-IFD pointers
        struct.pack_into(f"{e}I", blobs[i], len(blobs[i]) - 4,
                         ifds[i + 1])
    head = (b"MM" if big_endian else b"II") + struct.pack(f"{e}H", 42) \
        + struct.pack(f"{e}I", ifds[0])
    return head + b"".join(bytes(b) for b in blobs)


def _tiff_ifd_chain(payload: bytes) -> list[int]:
    """The IFD offset chain (multi-page TIFFs — fax/scan corpora —
    link pages through each IFD's trailing next-IFD pointer), cycle-
    guarded."""
    if payload[:2] == b"II":
        e = "<"
    elif payload[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF payload")
    (off,) = struct.unpack_from(f"{e}I", payload, 4)
    chain: list[int] = []
    seen: set[int] = set()
    while off:
        if off in seen:
            raise ValueError("TIFF: cyclic IFD chain")
        seen.add(off)
        if off + 2 > len(payload):
            raise ValueError("TIFF: IFD offset out of range")
        chain.append(off)
        (n,) = struct.unpack_from(f"{e}H", payload, off)
        ptr_at = off + 2 + 12 * n
        if ptr_at + 4 > len(payload):
            raise ValueError("TIFF: truncated IFD")
        (off,) = struct.unpack_from(f"{e}I", payload, ptr_at)
    if not chain:
        raise ValueError("TIFF: no IFDs")
    return chain


def _tiff_parse(payload: bytes,
                ifd_off: int | None = None):
    """(width, height, samples_per_pixel, photometric, assembled
    samples, bit_depth) for one IFD (page) — the shared container
    walk under stats and pixel access. Default: the first page.
    ``samples`` is an ``array.array`` of native-order ints ('B' for
    8-bit, 'H' for 16-bit — byte-order normalization happens here, so
    callers never see the file's endianness)."""
    if payload[:2] == b"II":
        e = "<"
    elif payload[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF payload")
    if struct.unpack_from(f"{e}H", payload, 2)[0] != 42:
        raise ValueError("TIFF: bad magic")
    if ifd_off is None:
        (ifd_off,) = struct.unpack_from(f"{e}I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise ValueError("TIFF: IFD offset out of range")
    (n_entries,) = struct.unpack_from(f"{e}H", payload, ifd_off)
    tags: dict[str, tuple[int, int, int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(payload):
            raise ValueError("TIFF: truncated IFD")
        tag, typ, cnt = struct.unpack_from(f"{e}HHI", payload, off)
        name = _TIFF_TAGS.get(tag)
        if name:
            tags[name] = (typ, cnt, payload[off + 8:off + 12])

    def values(name, default=None):
        if name not in tags:
            if default is None:
                raise ValueError(f"TIFF: missing required tag {name}")
            return [default]
        typ, cnt, field = tags[name]
        fmt, size = ("H", 2) if typ == 3 else ("I", 4)
        # the spec packs values INLINE whenever they fit the 4-byte
        # value field: one LONG, or one OR TWO SHORTs (e.g. the strip
        # arrays of a 2-strip file) — only larger arrays are offsets
        if cnt * size <= 4:
            return list(struct.unpack_from(f"{e}{cnt}{fmt}", field))
        (at,) = struct.unpack_from(f"{e}I", field)
        end = at + cnt * size
        if end > len(payload):
            raise ValueError(f"TIFF: {name} array out of range")
        return list(struct.unpack_from(f"{e}{cnt}{fmt}", payload, at))

    width, height = values("width")[0], values("height")[0]
    comp = values("compression", 1)[0]
    photo = values("photometric")[0]
    spp = values("spp", 1)[0]
    fill_order = values("fill_order", 1)[0]
    bits = values("bits", 8)
    if set(bits) == {8}:
        bit_depth = 8
    elif set(bits) == {16}:
        bit_depth = 16
    elif set(bits) == {1}:
        bit_depth = 1
    elif set(bits) == {4}:
        bit_depth = 4
    else:
        raise NotImplementedError(
            f"TIFF: {sorted(set(bits))} bits per sample unsupported "
            "(only uniform 1, 4, 8, or 16)")
    bps = 2 if bit_depth == 16 else 1  # DECODED bytes per sample
    if comp not in (1, 2, 3, 4, 5, 8, 32773, 32946):
        raise NotImplementedError(
            f"TIFF: compression {comp} needs a codec (only none/"
            "CCITT RLE/G3/G4/LZW/Deflate/PackBits)")
    t4_opts = values("t4_options", 0)[0]
    if comp in (2, 3, 4):
        if bit_depth != 1 or (photo, spp) not in ((0, 1), (1, 1)):
            raise ValueError(
                "TIFF: CCITT compression requires bilevel data "
                f"(BitsPerSample 1, photometric 0/1; got {bit_depth}-"
                f"bit photometric {photo})")
        if comp == 3 and t4_opts & 2:
            raise NotImplementedError(
                "TIFF: T.4 uncompressed mode (T4Options bit 1) is not "
                "supported")
    elif fill_order == 2:
        raise NotImplementedError(
            "TIFF: FillOrder 2 is only supported for CCITT data")
    if bit_depth < 8:
        if spp != 1:
            raise NotImplementedError(
                f"TIFF: sub-byte samples with spp={spp} unsupported")
        if comp in (2, 3, 4) and bit_depth != 1:
            raise ValueError("TIFF: CCITT requires BitsPerSample 1")
    pred = values("predictor", 1)[0]
    if pred not in (1, 2):
        raise NotImplementedError(
            f"TIFF: predictor {pred} (floating-point differencing) "
            "is not supported")
    if (photo, spp) not in ((0, 1), (1, 1), (2, 3), (3, 1), (6, 3)):
        raise NotImplementedError(
            f"TIFF: photometric {photo} with {spp} samples unsupported")
    if photo == 6:
        if bit_depth != 8:
            raise NotImplementedError(
                "TIFF: YCbCr requires 8-bit samples here")
        sub = values("ycbcr_subsampling", 1)
        if sub not in ([1], [1, 1]):
            raise NotImplementedError(
                f"TIFF: YCbCr subsampling {sub} is not supported "
                "(4:4:4 only — chroma-subsampled cluster layouts are "
                "a loud boundary)")
        if "ref_black_white" in tags:
            raise NotImplementedError(
                "TIFF: explicit ReferenceBlackWhite is not supported "
                "(full-range JFIF mapping only)")
    if photo == 3 and bit_depth not in (4, 8):
        raise NotImplementedError(
            "TIFF: palette-color requires 4- or 8-bit indexes here "
            f"(got {bit_depth})")
    if pred == 2 and bit_depth < 8:
        raise NotImplementedError(
            "TIFF: predictor 2 over sub-byte samples is not supported")
    planar = values("planar", 1)[0]
    if planar not in (1, 2):
        raise ValueError(f"TIFF: bad PlanarConfiguration {planar}")
    if planar == 2 and "tile_offsets" in tags:
        raise NotImplementedError(
            "TIFF: PlanarConfiguration 2 with tiles is not supported")

    def segment(raw: bytes, n_rows: int, row_px: int,
                seg_spp: int | None = None) -> bytes:
        """Decompress one strip/tile to n_rows × row_px pixels and undo
        the predictor — per SEGMENT, with the segment's own row width:
        a tile's rows are tile-width, not image-width. ``seg_spp``
        overrides samples-per-pixel for PLANAR strips (each plane's
        strip carries ONE sample, TIFF 6.0 tag 284 = 2)."""
        sspp = spp if seg_spp is None else seg_spp
        expect = n_rows * row_px * sspp * bps
        if comp in (2, 3, 4):
            # CCITT: reference/row sync resets per strip/tile (TIFF
            # 6.0 §§10-11); decoders emit 0=white/1=black, which IS
            # the sample value under photometric 0 (WhiteIsZero);
            # photometric 1 inverts (its white samples are 1)
            if comp == 4:
                raw = g4_decode(raw, row_px, n_rows, fill_order)
            elif comp == 3:
                raw = g3_decode(raw, row_px, n_rows,
                                two_d=bool(t4_opts & 1),
                                fill_order=fill_order)
            else:
                raw = ccitt_rle_decode(raw, row_px, n_rows, fill_order)
            if photo == 1:
                raw = raw.translate(_G4_INVERT)
        elif bit_depth < 8:
            # sub-byte planes under the byte-stream codecs: rows pack
            # MSB-first and pad to a whole byte (TIFF 6.0 §"Bit and
            # byte order"), same layout PNG uses — decompress the
            # packed plane, then unpack one byte per sample
            stride = (row_px * sspp * bit_depth + 7) // 8
            packed = n_rows * stride
            if comp == 32773:
                raw = _packbits_decode(raw, packed)
            elif comp == 5:
                raw = _tiff_lzw_decode(raw, packed)
            elif comp in (8, 32946):
                try:
                    raw = zlib.decompress(raw)
                except zlib.error as exc:
                    raise ValueError(
                        f"TIFF: Deflate segment damaged: {exc}") from None
            if len(raw) != packed:
                raise ValueError(
                    f"TIFF: sub-byte segment decoded to {len(raw)} "
                    f"bytes, expected {packed} packed")
            raw = _png_unpack_bits(raw, row_px * sspp, n_rows, bit_depth)
        elif comp == 32773:
            raw = _packbits_decode(raw, expect)
        elif comp == 5:
            raw = _tiff_lzw_decode(raw, expect)
        elif comp in (8, 32946):  # Adobe Deflate + the legacy code
            try:
                raw = zlib.decompress(raw)
            except zlib.error as exc:
                raise ValueError(
                    f"TIFF: Deflate segment damaged: {exc}") from None
        if len(raw) != expect:
            raise ValueError(
                f"TIFF: segment decoded to {len(raw)} bytes, "
                f"expected {expect}")
        if pred == 2:
            raw = _tiff_undiff_rows(raw, row_px, sspp, bps, e)
        return raw

    def to_samples(data: bytes):
        """File bytes → native-order sample array ('B'/'H')."""
        from array import array

        if bps == 1:
            return array("B", data)
        a = array("H")
        a.frombytes(data)
        if (e == "<") != (sys.byteorder == "little"):
            a.byteswap()
        return a

    def finish(data: bytes):
        """Assembled sample bytes → the caller tuple; palette-color
        (photometric 3) expands indexes through the ColorMap's 16-bit
        RGB entries (TIFF 6.0 §5 — red block, green block, blue
        block), so downstream stats/pixel access see an RGB image at
        bit depth 16 with no palette special-casing."""
        samples = to_samples(data)
        if photo == 6:
            # full-range BT.601 inverse (the JFIF chain shared with
            # the JPEG decoder — same floor(x+0.5) discipline, so the
            # same SQL oracle replicates it)
            import numpy as np
            from array import array

            a = np.asarray(samples, dtype=np.float64).reshape(-1, 3)
            r, g, b = _ycbcr_to_rgb(a[:, 0], a[:, 1], a[:, 2])
            rgb = np.stack([r, g, b], axis=1).astype(np.uint8)
            return width, height, 3, photo, \
                array("B", rgb.reshape(-1).tobytes()), 8
        if photo != 3:
            return width, height, spp, photo, samples, bit_depth
        import numpy as np

        cm = values("colormap")  # missing tag raises in values()
        n = 1 << bit_depth
        if len(cm) != 3 * n:
            raise ValueError(
                f"TIFF: ColorMap has {len(cm)} entries, expected {3 * n}")
        # vectorized palette gather: (n, 3) table fancy-indexed by the
        # whole index plane at once — per-pixel work stays in numpy
        table = np.asarray(cm, dtype=np.uint16).reshape(3, n).T
        mapped = table[np.asarray(samples)].reshape(-1)
        return width, height, 3, photo, mapped, 16

    if "tile_offsets" in tags:
        # tiled organization (TIFF 6.0 §15) — the layout large
        # real-world files (GeoTIFF etc.) use; every tile is FULL
        # tile-size with edge padding the assembly crops
        tw = values("tile_width")[0]
        th = values("tile_length")[0]
        if tw % 16 or th % 16 or not tw or not th:
            raise ValueError(
                f"TIFF: tile size {tw}x{th} is not a multiple of 16")
        offsets, counts = values("tile_offsets"), values("tile_counts")
        if len(offsets) != len(counts):
            raise ValueError("TIFF: TileOffsets/TileByteCounts disagree")
        across = (width + tw - 1) // tw
        down = (height + th - 1) // th
        if len(offsets) != across * down:
            raise ValueError(
                f"TIFF: {len(offsets)} tiles for a {across}x{down} grid")
        img = bytearray(width * height * spp * bps)
        for idx, (o, c) in enumerate(zip(offsets, counts)):
            if o + c > len(payload):
                raise ValueError("TIFF: tile out of range")
            tile = segment(payload[o:o + c], th, tw)
            ty, tx = divmod(idx, across)
            n_rows = min(th, height - ty * th)
            n_cols = min(tw, width - tx * tw) * spp * bps
            for r in range(n_rows):
                dst = ((ty * th + r) * width + tx * tw) * spp * bps
                src = r * tw * spp * bps
                img[dst:dst + n_cols] = tile[src:src + n_cols]
        return finish(bytes(img))

    offsets, counts = values("offsets"), values("counts")
    if len(offsets) != len(counts):
        raise ValueError("TIFF: StripOffsets/StripByteCounts disagree")
    rps = values("rows_per_strip", height or 1)[0]
    if planar == 2 and spp > 1:
        # separate sample planes (tag 284 = 2): all of sample 0's
        # strips, then sample 1's, ... — decode each plane with spp=1,
        # then interleave back to chunky for the shared finish path
        import numpy as np

        per_plane = (height + rps - 1) // rps
        if len(offsets) != spp * per_plane:
            raise ValueError(
                f"TIFF: {len(offsets)} strips for {spp} planes x "
                f"{per_plane}")
        planes = []
        for p_i in range(spp):
            plane = bytearray()
            for j in range(per_plane):
                o, c = offsets[p_i * per_plane + j],                     counts[p_i * per_plane + j]
                if o + c > len(payload):
                    raise ValueError("TIFF: strip out of range")
                plane += segment(payload[o:o + c],
                                 min(rps, height - j * rps), width, 1)
            planes.append(bytes(plane))
        arr = np.frombuffer(b"".join(planes), np.uint8).reshape(
            spp, width * height, bps)
        data = bytearray(arr.transpose(1, 0, 2).tobytes())
    else:
        data = bytearray()
        for j, (o, c) in enumerate(zip(offsets, counts)):
            if o + c > len(payload):
                raise ValueError("TIFF: strip out of range")
            data += segment(payload[o:o + c], min(rps, height - j * rps),
                            width)
    if len(data) != width * height * spp * bps:
        raise ValueError(
            f"TIFF: {len(data)} sample bytes for {width}x{height}x{spp}")
    return finish(bytes(data))


def decode_tiff(payload: bytes) -> dict:
    """Decode a baseline TIFF for real: byte-order dispatch, IFD walk,
    strip assembly, PackBits expansion, gray/RGB sample layout.
    Statistics cover the assembled samples — any strip-order, RLE, or
    endianness bug shifts ``mean_value`` and breaks the oracle."""
    import numpy as np

    width, height, spp, photo, data, bit_depth = _tiff_parse(payload)
    maxv = (1 << bit_depth) - 1
    # explicit wide accumulator: builtin sum() over a uint16 ndarray wraps
    # under NumPy >=2 weak promotion (NEP 50)
    total = int(np.asarray(data).sum(dtype=np.int64)) if len(data) else 0
    if photo == 0:  # white-is-zero inverts
        total = maxv * len(data) - total
    return {
        "media_kind": "image",
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "n_units": width * height,
        "mean_value": (total / len(data)) if len(data) else 0.0,
        "n_bytes": len(payload),
    }


def decode_tiff_pages(payload: bytes) -> list[dict]:
    """Per-page stats for a (possibly multi-page) TIFF: walk the IFD
    chain and decode every page's samples — the fax/scan fan-out
    (1 file → N page rows)."""
    import numpy as np

    out = []
    for off in _tiff_ifd_chain(payload):
        w, h, spp, photo, data, bit_depth = _tiff_parse(payload, off)
        maxv = (1 << bit_depth) - 1
        total = int(np.asarray(data).sum(dtype=np.int64)) if len(data) else 0
        if photo == 0:
            total = maxv * len(data) - total
        out.append({
            "width": w, "height": h, "n_units": w * h,
            "mean_value": (total / len(data)) if len(data) else 0.0,
        })
    return out


def tiff_page_stats(df: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Arrow-batched multi-page fan-out: one row per TIFF page
    (doc_id, page, width, height, mean_value); payload bytes never
    leave the UDF."""
    keep_schema = ", ".join(f"{c} string" for c in keep)
    schema = ("doc_id long, page int, width int, height int, "
              "mean_value double" + (", " + keep_schema if keep else ""))

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for j, p in enumerate(pdf["payload"]):
                for k, d in enumerate(decode_tiff_pages(bytes(p))):
                    rows.append((pdf["doc_id"].iloc[j], k, d["width"],
                                 d["height"], d["mean_value"],
                                 *[pdf[c].iloc[j] for c in keep]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "page", "width", "height",
                               "mean_value", *keep])

    return df.mapInPandas(run, schema)


def encode_tiff_multipage_sample(doc_id: int) -> bytes:
    """Multi-page TIFF for ``doc_id``: 1 + id % 4 pages, page k taking
    the single-page sample parameters of pseudo-id (doc_id + 31k) so
    every page cycles geometry, gray/RGB, the compression family, the
    predictor, and the tiled slice independently — closed-form per
    page for the oracle."""
    pages = []
    for k in range(1 + doc_id % 4):
        pid = doc_id + 31 * k
        w, h, base = tiff_params(pid)
        comp = ("none", "packbits", "lzw", "deflate")[pid % 4]
        pages.append(dict(
            width=w, height=h, base=base, rgb=bool(pid % 2),
            compression=comp,
            predictor=2 if comp in ("lzw", "deflate")
            and (pid // 4) % 2 else 1,
            tiled=pid % 7 == 5,
            # a 16-bit page slice: real scan corpora mix depths WITHIN
            # one file; mean is 257x the page's 8-bit closed form
            bit_depth=16 if pid % 5 == 3 else 8,
        ))
    return encode_tiff_multipage(pages, big_endian=doc_id % 5 == 0)


def tiff_params(doc_id: int) -> tuple[int, int, int]:
    """Ground-truth (width, height, base) for a synthesized gradient
    TIFF: v = base + x + 2y peaks at 52 + 12 + 12 = 76 (+2 for RGB),
    clip-free; the closed-form mean is base + (w-1)/2 + (h-1)
    (+1 for RGB docs)."""
    return 1 + doc_id % 13, 1 + doc_id % 7, doc_id % 53


def encode_tiff_sample(doc_id: int) -> bytes:
    """Synthesized TIFF for ``doc_id``, cycling the container variants:
    RGB for odd ids (gray otherwise), compression walking
    none → PackBits → LZW → Deflate by id % 4 (the compressed slices
    alternate the horizontal-differencing predictor real writers pair
    with them), big-endian every 5th id, 2-row strips — except the
    id % 7 == 5 slice, which uses the TILED organization (16x16
    edge-padded tiles, the GeoTIFF/large-file layout). RGB ids with
    id % 11 == 7 (and no tiling) store SEPARATE SAMPLE PLANES
    (PlanarConfiguration 2 — the scanner layout): one strip run per
    sample, reinterleaved on read; the closed-form mean is layout-
    invariant, so the same oracle pins the planar path."""
    w, h, base = tiff_params(doc_id)
    comp = ("none", "packbits", "lzw", "deflate")[doc_id % 4]
    rgb = bool(doc_id % 2)
    tiled = doc_id % 7 == 5
    return encode_tiff(
        w, h, base=base, rgb=rgb,
        compression=comp,
        predictor=2 if comp in ("lzw", "deflate")
        and (doc_id // 4) % 2 else 1,
        big_endian=doc_id % 5 == 0,
        tiled=tiled,
        planar=rgb and not tiled and doc_id % 11 == 7,
    )


def encode_tiff_palette_sample(doc_id: int) -> bytes:
    """Palette-color twin of ``encode_tiff_sample``: photometric 3
    with the grayscale i*257 ColorMap, gradient INDEXES, the same
    compression/predictor/byte-order/tiled cycle (always grayscale —
    palette forbids spp 3). Mean = 257x the gray closed form."""
    w, h, base = tiff_params(doc_id)
    comp = ("none", "packbits", "lzw", "deflate")[doc_id % 4]
    return encode_tiff(
        w, h, base=base, compression=comp,
        predictor=2 if comp in ("lzw", "deflate")
        and (doc_id // 4) % 2 else 1,
        big_endian=doc_id % 5 == 0,
        tiled=doc_id % 7 == 5,
        palette=True,
    )


def encode_tiff_g4(width: int, height: int, ink_rows: list[bytes],
                   photometric: int = 0, fill_order: int = 1,
                   rows_per_strip: int = 2,
                   big_endian: bool = False,
                   compression: str = "g4") -> bytes:
    """Write a real CCITT bilevel fax TIFF — ``compression`` picks the
    family: ``g4`` (Compression 4, T.6 MMR), ``g3-1d``/``g3-2d``
    (Compression 3, T.4 with EOL sync; 2-D writes T4Options bit 0 and
    tag bits), or ``rle`` (Compression 2, byte-aligned per-row
    modified Huffman). ``ink_rows`` hold CODING colors (one byte per
    pixel, 0 = white background / 1 = black ink); the photometric tag
    controls only how readers map those to sample values, so the same
    image bytes pin both interpretations. Strips are independently
    coded (sync resets, TIFF 6.0 §§10-11); FillOrder 2 stores every
    byte bit-reversed (tag 266)."""
    if photometric not in (0, 1):
        raise ValueError("fax TIFF requires photometric 0/1")
    if fill_order not in (1, 2):
        raise ValueError("bad FillOrder")
    if compression not in ("g4", "g3-1d", "g3-2d", "rle"):
        raise ValueError(f"unknown fax compression {compression!r}")
    comp_code = {"g4": 4, "g3-1d": 3, "g3-2d": 3, "rle": 2}[compression]
    e = ">" if big_endian else "<"
    strips = []
    for y in range(0, height, rows_per_strip):
        chunk = ink_rows[y:y + rows_per_strip]
        if compression == "g4":
            data = g4_encode(chunk, width)
        elif compression == "rle":
            data = ccitt_rle_encode(chunk, width)
        else:
            data = g3_encode(chunk, width,
                             two_d=compression == "g3-2d",
                             byte_align=bool(y % 4))
        if fill_order == 2:
            data = bytes(_BITREV[b] for b in data)
        strips.append(data)
    pos = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    extra = bytearray()
    entries = []

    def inline(tag, typ, value):
        if typ == 3:
            entries.append((tag, 3, 1, struct.pack(f"{e}HH", value, 0)))
        else:
            entries.append((tag, 4, 1, struct.pack(f"{e}I", value)))

    inline(256, 4, width)
    inline(257, 4, height)
    inline(258, 3, 1)
    inline(259, 3, comp_code)
    inline(262, 3, photometric)
    if fill_order == 2:
        inline(266, 3, 2)
    if compression == "g3-2d":
        inline(292, 4, 1)  # T4Options bit 0: 2-D coding
    if len(strips) == 1:
        entries.append((273, 4, 1, struct.pack(f"{e}I", strip_offsets[0])))
        entries.append((279, 4, 1, struct.pack(f"{e}I", len(strips[0]))))
    else:
        counts = [len(s) for s in strips]
        so, sc = pos, pos + 4 * len(strips)
        extra.extend(struct.pack(f"{e}{len(strips)}I", *strip_offsets))
        extra.extend(struct.pack(f"{e}{len(strips)}I", *counts))
        pos = sc + 4 * len(strips)
        entries.append((273, 4, len(strips), struct.pack(f"{e}I", so)))
        entries.append((279, 4, len(strips), struct.pack(f"{e}I", sc)))
    inline(277, 3, 1)
    inline(278, 4, rows_per_strip)
    entries.sort()
    ifd = struct.pack(f"{e}H", len(entries))
    for tag, typ, cnt, val in entries:
        ifd += struct.pack(f"{e}HHI", tag, typ, cnt) + val
    ifd += struct.pack(f"{e}I", 0)
    head = (b"MM" if big_endian else b"II") + struct.pack(f"{e}H", 42) \
        + struct.pack(f"{e}I", pos)
    return head + b"".join(strips) + bytes(extra) + ifd


def g4_tiff_params(doc_id: int) -> tuple[int, int, int, int, int,
                                         int, int]:
    """Ground-truth (pattern, width, height, k, base, photometric,
    fill_order) for a synthesized G4 fax TIFF. Patterns by
    ``doc_id % 3``: 0 checkerboard (vertical-mode torture), 1 vertical
    stripes of width k (V0 steady state + horizontal starts), 2 WIDE
    horizontal stripes (row runs ≥ 64 → makeup codes load-bearing).
    Photometric alternates by ``(doc_id // 3) % 2`` and every 5th id
    stores FillOrder 2 — all with the same closed-form ink count."""
    p = doc_id % 3
    photo = (doc_id // 3) % 2
    fill = 2 if doc_id % 5 == 0 else 1
    if p == 0:
        return 0, 3 + doc_id % 13, 1 + doc_id % 7, 1, doc_id % 2, \
            photo, fill
    if p == 1:
        return 1, 3 + doc_id % 13, 1 + doc_id % 7, 1 + doc_id % 3, 0, \
            photo, fill
    return 2, 64 + (doc_id % 17) * 7, 1 + doc_id % 5, 1 + doc_id % 2, \
        doc_id % 2, photo, fill


def _fax_ink_rows(p: int, w: int, h: int, k: int,
                  base: int) -> list[bytes]:
    """The three fax test patterns (checkerboard / vertical stripes /
    wide horizontal stripes) as ink rows — shared by the G4 and G3
    sample encoders so both pin the same closed-form ink count."""
    if p == 0:
        return [bytes((r + c + base) % 2 for c in range(w))
                for r in range(h)]
    if p == 1:
        return [bytes((c // k) % 2 for c in range(w))] * h
    return [bytes([(r // k + base) % 2]) * w for r in range(h)]


def encode_tiff_g4_sample(doc_id: int) -> bytes:
    """One synthesized fax-style G4 TIFF per document id, per
    ``g4_tiff_params``."""
    p, w, h, k, base, photo, fill = g4_tiff_params(doc_id)
    rows = _fax_ink_rows(p, w, h, k, base)
    return encode_tiff_g4(w, h, rows, photometric=photo,
                          fill_order=fill)


def encode_tiff_subbyte(width: int, height: int, samples: bytes,
                        bit_depth: int = 4, photometric: int = 1,
                        compression: str = "none",
                        rows_per_strip: int = 2,
                        big_endian: bool = False,
                        colormap: list[int] | None = None) -> bytes:
    """Write a sub-byte (1- or 4-bit) TIFF under the byte-stream
    codecs: samples (one byte per pixel, values < 2^depth) pack
    MSB-first into byte-padded rows per TIFF 6.0, strip by strip,
    then compress with none/PackBits/LZW/Deflate. ``photometric=3``
    writes the 16-bit ColorMap (``colormap`` = 3·2^depth ints, red
    block then green then blue)."""
    if bit_depth not in (1, 4):
        raise ValueError("sub-byte TIFF is 1- or 4-bit here")
    if max(samples, default=0) >> bit_depth:
        raise ValueError("sample exceeds bit depth")
    if (photometric == 3) != (colormap is not None):
        raise ValueError("colormap exactly when photometric 3")
    e = ">" if big_endian else "<"
    comp_code = {"none": 1, "packbits": 32773, "lzw": 5,
                 "deflate": 8}[compression]
    strips = []
    for y in range(0, height, rows_per_strip):
        n = min(rows_per_strip, height - y)
        packed = _png_pack_bits(
            samples[y * width:(y + n) * width], width, n, bit_depth)
        if compression == "packbits":
            packed = _packbits_encode(packed)
        elif compression == "lzw":
            packed = _tiff_lzw_encode(packed)
        elif compression == "deflate":
            packed = zlib.compress(packed)
        strips.append(packed)
    pos = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    extra = bytearray()
    entries = []

    def inline(tag, typ, value):
        if typ == 3:
            entries.append((tag, 3, 1, struct.pack(f"{e}HH", value, 0)))
        else:
            entries.append((tag, 4, 1, struct.pack(f"{e}I", value)))

    inline(256, 4, width)
    inline(257, 4, height)
    inline(258, 3, bit_depth)
    inline(259, 3, comp_code)
    inline(262, 3, photometric)
    if colormap is not None:
        if len(colormap) != 3 * (1 << bit_depth):
            raise ValueError("bad colormap length")
        cm_off = pos
        extra.extend(struct.pack(f"{e}{len(colormap)}H", *colormap))
        pos += 2 * len(colormap)
        entries.append((320, 3, len(colormap),
                        struct.pack(f"{e}I", cm_off)))
    if len(strips) == 1:
        entries.append((273, 4, 1, struct.pack(f"{e}I", strip_offsets[0])))
        entries.append((279, 4, 1, struct.pack(f"{e}I", len(strips[0]))))
    else:
        counts = [len(s) for s in strips]
        so, sc = pos, pos + 4 * len(strips)
        extra.extend(struct.pack(f"{e}{len(strips)}I", *strip_offsets))
        extra.extend(struct.pack(f"{e}{len(strips)}I", *counts))
        pos = sc + 4 * len(strips)
        entries.append((273, 4, len(strips), struct.pack(f"{e}I", so)))
        entries.append((279, 4, len(strips), struct.pack(f"{e}I", sc)))
    inline(277, 3, 1)
    inline(278, 4, rows_per_strip)
    entries.sort()
    ifd = struct.pack(f"{e}H", len(entries))
    for tag, typ, cnt, val in entries:
        ifd += struct.pack(f"{e}HHI", tag, typ, cnt) + val
    ifd += struct.pack(f"{e}I", 0)
    head = (b"MM" if big_endian else b"II") + struct.pack(f"{e}H", 42) \
        + struct.pack(f"{e}I", pos)
    return head + b"".join(strips) + bytes(extra) + ifd


def subbyte_tiff_params(doc_id: int) -> tuple[int, int, int, int, int,
                                              int, str]:
    """Ground-truth (kind, bit_depth, width, height, base, photometric,
    compression) for a synthesized sub-byte TIFF: kind 0 = 1-bit
    checkerboard, 1 = 4-bit gray gradient, 2 = 4-bit palette gradient
    through a non-identity 16-bit ColorMap. Compression cycles the
    four byte-stream codecs; photometric alternates for gray kinds."""
    k = doc_id % 3
    comp = ("none", "packbits", "lzw", "deflate")[(doc_id // 3) % 4]
    photo = (doc_id // 2) % 2
    if k == 0:
        return 0, 1, 3 + doc_id % 13, 1 + doc_id % 7, doc_id % 2, \
            photo, comp
    if k == 1:
        return 1, 4, 1 + doc_id % 6, 1 + doc_id % 5, doc_id % 6, \
            photo, comp
    return 2, 4, 1 + doc_id % 6, 1 + doc_id % 5, doc_id % 6, 3, comp


# 4-bit oracle ColorMap: index i → ((15-i)·4369, i·4369, i·4369) —
# non-identity, so a gather that skips or mis-indexes the map shifts
# the mean (4369 = 65535/15, full-scale 16-bit)
_SUBBYTE_COLORMAP = ([(15 - i) * 4369 for i in range(16)]
                     + [i * 4369 for i in range(16)] * 2)


def encode_tiff_subbyte_sample(doc_id: int) -> bytes:
    """One synthesized sub-byte TIFF per document id, per
    ``subbyte_tiff_params``."""
    k, depth, w, h, base, photo, comp = subbyte_tiff_params(doc_id)
    if k == 0:
        samples = bytes((r + c + base) % 2
                        for r in range(h) for c in range(w))
    else:
        samples = bytes(base + r + c for r in range(h) for c in range(w))
    return encode_tiff_subbyte(
        w, h, samples, bit_depth=depth, photometric=photo,
        compression=comp, big_endian=doc_id % 7 == 0,
        colormap=_SUBBYTE_COLORMAP if photo == 3 else None)


def encode_tiff_g3_sample(doc_id: int) -> bytes:
    """Group 3 twin of ``encode_tiff_g4_sample``: the same geometry/
    pattern/photometric/fill-order cycle, with the compression family
    walking Compression 2 (byte-aligned MH rows) → G3 1-D (EOL sync) →
    G3 2-D (tag bits + T4Options) by ``doc_id // 2``."""
    p, w, h, k, base, photo, fill = g4_tiff_params(doc_id)
    rows = _fax_ink_rows(p, w, h, k, base)
    comp = ("rle", "g3-1d", "g3-2d")[(doc_id // 2) % 3]
    return encode_tiff_g4(w, h, rows, photometric=photo,
                          fill_order=fill, compression=comp)


def encode_tiff16_sample(doc_id: int) -> bytes:
    """16-bit twin of ``encode_tiff_sample`` — the same container
    variant cycle (gray/RGB, none/PackBits/LZW/Deflate, the SAMPLE-
    WIDE predictor on the compressed slices, both byte orders, the
    tiled slice) at BitsPerSample 16, samples stored as v·257 so the
    mean is exactly 257× the 8-bit closed form."""
    w, h, base = tiff_params(doc_id)
    comp = ("none", "packbits", "lzw", "deflate")[doc_id % 4]
    return encode_tiff(
        w, h, base=base, rgb=bool(doc_id % 2),
        compression=comp,
        predictor=2 if comp in ("lzw", "deflate")
        and (doc_id // 4) % 2 else 1,
        big_endian=doc_id % 5 == 0,
        tiled=doc_id % 7 == 5,
        bit_depth=16,
    )


# ---------------------------------------------------------------- MP3
#
# MPEG-1 Layer III STREAM METADATA from the public header layout:
# frame sync + version/layer bits, the bitrate/sample-rate index
# tables, padding, and the fixed 1152 samples/frame — enough to walk
# every frame and derive count/bitrate/duration, plus ID3v2 (syncsafe
# envelope, v2.3 AND v2.4 text frames — syncsafe frame sizes and all
# four text encodings in the latter) and trailing ID3v1 tags. PCM DECODE
# stays the loud NotImplementedError: the Layer III Huffman tables and
# hybrid filterbank are a codec this container does not ship, and a
# half-remembered table would be silently wrong — the one failure mode
# this module never accepts. Header-level duration/title extraction is
# exactly what corpus-metadata pipelines run without decoding.

_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                 224, 256, 320)  # MPEG-1 Layer III, kbit/s (idx 0 = free)
_MP3_RATES = (44100, 48000, 32000)


def _id3v2_size(payload: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if absent): 10-byte
    header + syncsafe 28-bit size."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    if any(b & 0x80 for b in payload[6:10]):
        raise ValueError("MP3: ID3v2 size bytes are not syncsafe")
    size = (payload[6] << 21) | (payload[7] << 14) \
        | (payload[8] << 7) | payload[9]
    total = 10 + size
    if payload[5] & 0x10:
        total += 10  # v2.4 footer (not counted in the size field)
    return total


def _id3_text(body: bytes) -> str:
    """Decode one text-frame body per its encoding byte: 0 Latin-1,
    1 UTF-16 with BOM, 2 UTF-16BE (v2.4), 3 UTF-8 (v2.4). An unknown
    encoding raises — a guessed decode would be a silently wrong
    title, the one failure mode this module never accepts."""
    enc, data = body[0], body[1:]
    if enc == 0:
        return data.split(b"\x00")[0].decode("latin-1")
    if enc == 1:
        return data.decode("utf-16").split("\x00")[0]
    if enc == 2:
        return data.decode("utf-16-be").split("\x00")[0]
    if enc == 3:
        return data.split(b"\x00")[0].decode("utf-8")
    raise ValueError(f"MP3: unknown ID3 text encoding {enc}")


def _id3v2_text_frames(payload: bytes) -> dict[str, str]:
    """ID3v2.3 AND v2.4 text frames (TIT2/TPE1/TALB...) → {frame id:
    text}; v2.4 frame sizes are SYNCSAFE where v2.3's are plain
    big-endian — walking one with the other's rule yields silently
    wrong titles, so the version dispatches explicitly. v2.2 (6-byte
    frame headers) and extended headers raise."""
    ver = payload[3]
    if ver not in (3, 4):
        raise NotImplementedError(
            f"MP3: ID3v2.{ver} tag parsing is not supported "
            "(only v2.3/v2.4)")
    if payload[5] & 0x40:
        raise NotImplementedError("MP3: ID3v2 extended headers")
    total = _id3v2_size(payload)
    out: dict[str, str] = {}
    pos = 10
    while pos + 10 <= total:
        fid = payload[pos:pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        raw = payload[pos + 4:pos + 8]
        if ver == 4:
            if any(b & 0x80 for b in raw):
                raise ValueError("MP3: ID3v2.4 frame size not syncsafe")
            size = (raw[0] << 21) | (raw[1] << 14) | (raw[2] << 7) \
                | raw[3]
        else:
            (size,) = struct.unpack(">I", raw)
        body = payload[pos + 10:pos + 10 + size]
        if fid.startswith(b"T") and body:
            out[fid.decode("ascii")] = _id3_text(body)
        pos += 10 + size
    return out


def mp3_stream_info(payload: bytes) -> dict:
    """Walk every MPEG-1 Layer III frame header: returns n_frames,
    sample_rate, bitrate_kbps (CBR value or the average for VBR),
    duration_ms (1152 samples/frame), and any ID3v2.3/v2.4 title. Broken
    sync mid-stream, free-format bitrate, and non-MPEG1-Layer-III
    frames raise precisely."""
    tags = _id3v2_text_frames(payload) if payload[:3] == b"ID3" else {}
    pos = _id3v2_size(payload)
    end = len(payload)
    # ID3v1 trailer: only when 128 bytes actually fit after the ID3v2
    # envelope — a short stream must not be probed with a negative
    # slice from the wrong offset
    if end - pos >= 128 and payload[end - 128:end - 125] == b"TAG":
        end -= 128
    n_frames = 0
    rate = None
    bit_sum = 0
    while pos < end:
        if pos + 4 > end:
            raise ValueError(f"MP3: truncated frame header at {pos}")
        b0, b1, b2, _b3 = payload[pos:pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"MP3: lost frame sync at offset {pos}")
        version = (b1 >> 3) & 0x3
        layer = (b1 >> 1) & 0x3
        if version != 3 or layer != 1:
            raise NotImplementedError(
                "MP3: only MPEG-1 Layer III streams are recognized")
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        padding = (b2 >> 1) & 0x1
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError(
                f"MP3: reserved/free bitrate or sample-rate index at {pos}")
        kbps = _MP3_BITRATES[br_idx]
        sr = _MP3_RATES[sr_idx]
        if rate is None:
            rate = sr
        elif sr != rate:
            raise ValueError("MP3: sample rate changes mid-stream")
        size = (144 * kbps * 1000) // sr + padding
        if pos + size > end:
            raise ValueError(f"MP3: frame at {pos} overruns the stream")
        n_frames += 1
        bit_sum += kbps
        pos += size
    if not n_frames:
        raise ValueError("MP3: no audio frames")
    return {
        "media_kind": "audio",
        "sample_rate": rate,
        "n_units": n_frames,
        "bitrate_kbps": bit_sum / n_frames,
        "duration_ms": n_frames * 1152 * 1000.0 / rate,
        "title": tags.get("TIT2"),
        "n_bytes": len(payload),
    }


def mp3_info_stats(df: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Arrow-batched MP3 metadata scan over the payload column: one
    row per stream (title, frame count, rate, bitrate, duration) —
    the no-decode audio-inventory pass a corpus pipeline runs."""
    keep_schema = ", ".join(f"{c} string" for c in keep)
    schema = (
        "doc_id long, title string, n_frames long, sample_rate long, "
        "bitrate_kbps double, duration_ms double"
        + (", " + keep_schema if keep else "")
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for j, p in enumerate(pdf["payload"]):
                i = mp3_stream_info(bytes(p))
                rows.append((
                    pdf["doc_id"].iloc[j], i["title"], i["n_units"],
                    i["sample_rate"], i["bitrate_kbps"], i["duration_ms"],
                    *[pdf[c].iloc[j] for c in keep],
                ))
            yield pd.DataFrame(
                rows, columns=["doc_id", "title", "n_frames",
                               "sample_rate", "bitrate_kbps",
                               "duration_ms", *keep])

    return df.mapInPandas(run, schema)


def mp3_params(doc_id: int) -> tuple[int, int, int]:
    """Ground-truth (sample_rate, bitrate_kbps, n_frames)."""
    return (
        _MP3_RATES[doc_id % 3],
        _MP3_BITRATES[1 + doc_id % 14],
        20 + doc_id % 30,
    )


def encode_mp3_stub(doc_id: int) -> bytes:
    """MP3-SHAPED stream for the metadata scanner: a real ID3v2 tag
    (TIT2 title; v2.3 for even ids, v2.4 with SYNCSAFE frame sizes for
    odd, text encodings cycling Latin-1/UTF-16/UTF-16BE/UTF-8 as each
    version allows), n valid MPEG-1 Layer III frame headers with
    padding bits cycling and zeroed audio payloads, and an ID3v1
    trailer. The payload is NOT decodable audio — it exists to drive
    the header walk, which never inspects payload bytes (exactly like
    real metadata scanners)."""
    rate, kbps, n = mp3_params(doc_id)
    ver = 3 if doc_id % 2 == 0 else 4
    enc = (doc_id // 2) % (2 if ver == 3 else 4)
    t = f"doc {doc_id}"
    body = bytes([enc]) + (
        t.encode("latin-1") if enc == 0 else
        t.encode("utf-16") if enc == 1 else
        t.encode("utf-16-be") if enc == 2 else
        t.encode("utf-8"))

    def syncsafe(v: int) -> bytes:
        return bytes([(v >> 21) & 0x7F, (v >> 14) & 0x7F,
                      (v >> 7) & 0x7F, v & 0x7F])

    size_field = syncsafe(len(body)) if ver == 4 \
        else struct.pack(">I", len(body))
    tit2 = b"TIT2" + size_field + b"\x00\x00" + body
    id3 = (b"ID3" + bytes([ver]) + b"\x00\x00" + syncsafe(len(tit2))
           + tit2)
    sr_idx = _MP3_RATES.index(rate)
    br_idx = _MP3_BITRATES.index(kbps)
    frames = bytearray()
    for i in range(n):
        padding = i % 2
        hdr = bytes([
            0xFF,
            0xE0 | (3 << 3) | (1 << 1) | 1,  # MPEG-1, Layer III, no CRC
            (br_idx << 4) | (sr_idx << 2) | (padding << 1),
            0b11000000,  # mono
        ])
        size = (144 * kbps * 1000) // rate + padding
        frames += hdr + b"\x00" * (size - 4)
    id3v1 = b"TAG" + b"\x00" * 125
    return bytes(id3) + bytes(frames) + id3v1


# ---------------------------------------------------------------- Ogg
#
# The Ogg transport layer (RFC 3533): 'OggS' pages carrying a lacing
# table of ≤255-byte segments; a segment shorter than 255 bytes ends a
# packet, so a packet an exact multiple of 255 needs a trailing zero
# lacing value, and packets longer than one page continue onto the
# next page with the continuation flag set. Pages are CRC-32 protected
# (poly 0x04C11DB7, unreflected, init/xorout 0, CRC field zeroed).
#
# On top of the page layer, the FLAC-in-Ogg mapping (Xiph "FLAC to Ogg
# mapping"): the first packet is 0x7F 'FLAC' <major minor> <nheaders BE16>
# followed by the native 'fLaC' signature + STREAMINFO; later header
# packets are native metadata blocks and audio packets are native
# frames — so concatenating every packet's native payload reconstructs
# a byte-exact native FLAC stream for the decoder already here.
# Vorbis/Opus mappings stay precise loud boundaries.

_OGG_CRC_TABLE = None


def _ogg_crc32(data: bytes) -> int:
    global _OGG_CRC_TABLE
    if _OGG_CRC_TABLE is None:
        tbl = []
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
            tbl.append(r & 0xFFFFFFFF)
        _OGG_CRC_TABLE = tbl
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[(crc >> 24) ^ b]
    return crc


def encode_ogg(packets: list[bytes], serial: int = 1,
               max_page_data: int = 4096) -> bytes:
    """Write packets into an Ogg stream: greedy page fill, correct
    lacing (incl. the 255-multiple trailing-zero case), continuation
    flags for packets spanning pages, BOS on the first page, EOS on
    the last, page CRCs."""
    # flatten packets into (segment, ends_packet, packet_idx) triples
    segs: list[tuple[bytes, bool, int]] = []
    for pidx, p in enumerate(packets):
        n = len(p)
        off = 0
        while True:
            take = min(255, n - off)
            last = off + take == n and take < 255
            segs.append((p[off:off + take], last, pidx))
            off += take
            if off == n:
                if take == 255:
                    segs.append((b"", True, pidx))  # exact-multiple terminator
                break
    pages: list[tuple[list[tuple[bytes, bool]], bool]] = []
    cur: list[tuple[bytes, bool]] = []
    cur_bytes = 0
    continued = False
    for seg, last, pidx in segs:
        # the BOS page carries the first packet ALONE (the Xiph
        # mapping's requirement), hence the forced break at pidx 1
        if cur and (len(cur) == 255 or cur_bytes + len(seg) > max_page_data
                    or (pidx == 1 and not pages)):
            pages.append((cur, continued))
            continued = not cur[-1][1]  # last segment didn't end a packet
            cur, cur_bytes = [], 0
        cur.append((seg, last))
        cur_bytes += len(seg)
    pages.append((cur, continued))
    out = bytearray()
    for i, (page, cont) in enumerate(pages):
        htype = (0x01 if cont else 0) | (0x02 if i == 0 else 0) \
            | (0x04 if i == len(pages) - 1 else 0)
        body = b"".join(s for s, _ in page)
        lacing = bytes(len(s) for s, _ in page)
        hdr = (b"OggS\x00" + bytes([htype])
               + struct.pack("<qIII", 0, serial, i, 0)
               + bytes([len(page)]) + lacing)
        crc = _ogg_crc32(hdr + body)
        hdr = hdr[:22] + struct.pack("<I", crc) + hdr[26:]
        out += hdr + body
    return bytes(out)


def _ogg_packets(payload: bytes) -> list[bytes]:
    """Parse an Ogg stream back to its packets, verifying capture
    patterns, version, CRCs, sequence numbers, and continuation-flag
    consistency. Multiplexed (multi-serial) streams are a precise
    boundary."""
    pos, expect_seq, serial = 0, 0, None
    packets: list[bytes] = []
    partial = bytearray()
    mid_packet = False
    saw_eos = False
    while pos < len(payload):
        if pos + 27 > len(payload):
            raise ValueError("OGG: truncated page header")
        if payload[pos:pos + 4] != b"OggS":
            raise ValueError("OGG: bad capture pattern")
        if payload[pos + 4] != 0:
            raise ValueError("OGG: unsupported stream structure version")
        htype = payload[pos + 5]
        (sn,) = struct.unpack_from("<I", payload, pos + 14)
        (seq,) = struct.unpack_from("<I", payload, pos + 18)
        (crc,) = struct.unpack_from("<I", payload, pos + 22)
        nsegs = payload[pos + 26]
        lacing = payload[pos + 27:pos + 27 + nsegs]
        if len(lacing) < nsegs:
            raise ValueError("OGG: truncated page header")
        body_len = sum(lacing)
        end = pos + 27 + nsegs + body_len
        if end > len(payload):
            raise ValueError("OGG: truncated page body")
        page = bytearray(payload[pos:end])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc32(bytes(page)) != crc:
            raise ValueError("OGG: page CRC mismatch")
        if serial is None:
            serial = sn
            if not htype & 0x02:
                raise ValueError("OGG: first page is not BOS")
        elif sn != serial:
            raise NotImplementedError(
                "OGG: multiplexed streams are not supported")
        if seq != expect_seq:
            raise ValueError("OGG: page sequence gap")
        expect_seq += 1
        if bool(htype & 0x01) != mid_packet:
            raise ValueError("OGG: continuation flag inconsistent")
        dpos = pos + 27 + nsegs
        for lace in lacing:
            partial += payload[dpos:dpos + lace]
            dpos += lace
            if lace < 255:
                packets.append(bytes(partial))
                partial.clear()
                mid_packet = False
            else:
                mid_packet = True
        saw_eos = bool(htype & 0x04)
        pos = end
    if mid_packet or not saw_eos:
        raise ValueError("OGG: stream ends mid-packet or without EOS")
    return packets


def encode_ogg_flac(flac_payload: bytes, max_page_data: int = 1000,
                    audio_packet_bytes: int = 600) -> bytes:
    """Wrap a native FLAC stream into Ogg per the Xiph mapping: first
    packet = 0x7F 'FLAC' 1.0 + nheaders + the native signature and
    STREAMINFO; remaining metadata blocks one packet each; audio bytes
    chunked into packets (reassembly concatenates, so chunk boundaries
    are free — small pages force real continuation/lacing cases)."""
    if flac_payload[:4] != b"fLaC":
        raise ValueError("not a native FLAC stream")
    # walk the metadata chain to find header/audio split
    pos, last = 4, False
    blocks: list[bytes] = []
    while not last:
        flags = flac_payload[pos]
        last = bool(flags & 0x80)
        (ln,) = struct.unpack(">I", b"\x00" + flac_payload[pos + 1:pos + 4])
        blocks.append(flac_payload[pos:pos + 4 + ln])
        pos += 4 + ln
    audio = flac_payload[pos:]
    first = (b"\x7fFLAC\x01\x00" + struct.pack(">H", len(blocks) - 1)
             + b"fLaC" + blocks[0])
    packets = [first] + blocks[1:]
    packets += [audio[i:i + audio_packet_bytes]
                for i in range(0, len(audio), audio_packet_bytes)] or [b""]
    return encode_ogg(packets, max_page_data=max_page_data)


def _ogg_flac_native(payload: bytes) -> bytes:
    """Reassemble an Ogg stream to the byte-exact native stream of its
    FLAC mapping (the single place the 9-byte mapping-header skip and
    packet concatenation live); Vorbis/Opus/unknown mappings raise."""
    packets = _ogg_packets(payload)
    if not packets:
        raise ValueError("OGG: no packets")
    head = packets[0]
    if head[:5] == b"\x7fFLAC":
        return head[9:] + b"".join(packets[1:])
    if head[1:7] == b"vorbis":
        raise NotImplementedError("OGG: Vorbis decode requires a Vorbis codec")
    if head[:8] == b"OpusHead":
        raise NotImplementedError("OGG: Opus decode requires an Opus codec")
    raise ValueError("OGG: unrecognized codec mapping")


def decode_ogg(payload: bytes) -> dict:
    """Decode an Ogg container: the FLAC mapping decodes for real
    (page reassembly → byte-exact native stream → the spec FLAC
    decoder); Vorbis and Opus mappings raise the precise boundary."""
    out = decode_flac(_ogg_flac_native(payload))
    out["n_bytes"] = len(payload)  # container bytes, not native
    return out


def vorbis_stream_info(payload: bytes) -> dict:
    """Ogg-Vorbis STREAM METADATA without decode (Vorbis I spec §4.2,
    the identification header, and §5, the comment header): version,
    channels, sample rate, nominal bitrate, vendor, and the user
    comments (TITLE etc., keys case-insensitive per spec). This is the
    audio-inventory pass corpus pipelines run over .ogg files — PCM
    decode stays the loud ``register_decoder`` boundary, exactly like
    MP3."""
    packets = _ogg_packets(payload)
    if not packets or packets[0][:7] != b"\x01vorbis":
        raise ValueError("OGG: not a Vorbis stream")
    ident = packets[0]
    if len(ident) < 30:
        raise ValueError("OGG: Vorbis identification header truncated")
    (version,) = struct.unpack_from("<I", ident, 7)
    if version != 0:
        raise NotImplementedError(
            f"OGG: Vorbis version {version} is not specified")
    channels = ident[11]
    (rate,) = struct.unpack_from("<I", ident, 12)
    _br_max, br_nom, _br_min = struct.unpack_from("<iii", ident, 16)
    if not ident[29] & 0x01:
        raise ValueError("OGG: Vorbis framing bit unset")
    if channels == 0 or rate == 0:
        raise ValueError("OGG: Vorbis channels/rate must be nonzero")
    if len(packets) < 2 or packets[1][:7] != b"\x03vorbis":
        raise ValueError("OGG: Vorbis comment header missing")
    c = packets[1]
    pos = 7

    def take_u32() -> int:
        nonlocal pos
        if pos + 4 > len(c):
            raise ValueError("OGG: Vorbis comment header truncated")
        (v,) = struct.unpack_from("<I", c, pos)
        pos += 4
        return v

    vlen = take_u32()
    if pos + vlen > len(c):
        raise ValueError("OGG: Vorbis vendor string truncated")
    vendor = c[pos:pos + vlen].decode("utf-8")
    pos += vlen
    comments: dict[str, str] = {}
    for _ in range(take_u32()):
        ln = take_u32()
        if pos + ln > len(c):
            raise ValueError("OGG: Vorbis comment truncated")
        key, eq, value = c[pos:pos + ln].decode("utf-8").partition("=")
        if not eq:
            raise ValueError("OGG: Vorbis comment missing '='")
        comments[key.upper()] = value
        pos += ln
    return {
        "media_kind": "audio",
        "channels": channels,
        "sample_rate": rate,
        "bitrate_nominal": br_nom,
        "vendor": vendor,
        "title": comments.get("TITLE", ""),
        "comments": comments,
        "n_bytes": len(payload),
    }


def opus_stream_info(payload: bytes) -> dict:
    """Ogg-Opus STREAM METADATA without decode (RFC 7845 §5): the
    OpusHead identification header (version, channels, pre-skip,
    input sample rate, output gain) and the OpusTags comment header
    (same length-prefixed vendor/user-comment layout as Vorbis).
    PCM decode stays the loud boundary — the SILK/CELT codec is not
    shipped."""
    packets = _ogg_packets(payload)
    if not packets or packets[0][:8] != b"OpusHead":
        raise ValueError("OGG: not an Opus stream")
    head = packets[0]
    if len(head) < 19:
        raise ValueError("OGG: OpusHead truncated")
    version = head[8]
    if version >> 4 != 0:  # RFC 7845: only the major nibble gates
        raise NotImplementedError(
            f"OGG: OpusHead version {version} is not specified")
    channels = head[9]
    (pre_skip,) = struct.unpack_from("<H", head, 10)
    (rate,) = struct.unpack_from("<I", head, 12)
    (gain_q8,) = struct.unpack_from("<h", head, 16)
    if channels == 0:
        raise ValueError("OGG: OpusHead channels must be nonzero")
    if head[18] != 0:
        raise NotImplementedError(
            "OGG: Opus channel mapping families beyond 0 (surround) "
            "are not supported")
    if len(packets) < 2 or packets[1][:8] != b"OpusTags":
        raise ValueError("OGG: OpusTags comment header missing")
    c = packets[1]
    pos = 8

    def take_u32() -> int:
        nonlocal pos
        if pos + 4 > len(c):
            raise ValueError("OGG: OpusTags truncated")
        (v,) = struct.unpack_from("<I", c, pos)
        pos += 4
        return v

    vlen = take_u32()
    if pos + vlen > len(c):
        raise ValueError("OGG: OpusTags vendor truncated")
    vendor = c[pos:pos + vlen].decode("utf-8")
    pos += vlen
    comments: dict[str, str] = {}
    for _ in range(take_u32()):
        ln = take_u32()
        if pos + ln > len(c):
            raise ValueError("OGG: OpusTags comment truncated")
        key, eq, value = c[pos:pos + ln].decode("utf-8").partition("=")
        if not eq:
            raise ValueError("OGG: OpusTags comment missing '='")
        comments[key.upper()] = value
        pos += ln
    return {
        "media_kind": "audio",
        "channels": channels,
        "sample_rate": rate,
        "pre_skip": pre_skip,
        "output_gain_db": gain_q8 / 256.0,
        "vendor": vendor,
        "title": comments.get("TITLE", ""),
        "comments": comments,
        "n_bytes": len(payload),
    }


def encode_ogg_opus_stub(doc_id: int) -> bytes:
    """Opus-SHAPED Ogg stream for the metadata scanner: a real
    OpusHead, a real OpusTags (vendor + TITLE), and opaque audio
    packets — the RFC 7845 twin of the Vorbis stub."""
    rate, channels, _ = vorbis_params(doc_id)
    pre_skip = 312 + doc_id % 100
    gain_q8 = (doc_id % 13 - 6) * 64
    head = (b"OpusHead" + bytes([1, channels])
            + struct.pack("<HIh", pre_skip, rate, gain_q8) + b"\x00")
    vendor = b"spark-graft synthesizer"
    tags = bytearray(b"OpusTags")
    tags += struct.pack("<I", len(vendor)) + vendor
    comments = [f"TITLE=doc {doc_id}"]
    tags += struct.pack("<I", len(comments))
    for kv in comments:
        b = kv.encode("utf-8")
        tags += struct.pack("<I", len(b)) + b
    audio = [bytes([doc_id % 251]) * (80 + (doc_id * 5) % 160)
             for _ in range(2 + doc_id % 2)]
    return encode_ogg([head, bytes(tags), *audio],
                      max_page_data=180 + (doc_id % 4) * 120)


def encode_ogg_vorbis_stub(doc_id: int) -> bytes:
    """Vorbis-SHAPED Ogg stream for the metadata scanner: a real
    identification header, a real comment header (vendor + TITLE +
    a non-ASCII ARTIST), a setup-header placeholder, and opaque
    audio-ish packets — the scanner never inspects setup/audio bytes,
    exactly like the MP3 stub's zeroed frame payloads."""
    rate, channels, br_nom = vorbis_params(doc_id)
    ident = (b"\x01vorbis" + struct.pack("<IBI", 0, channels, rate)
             + struct.pack("<iii", -1, br_nom, -1)
             + bytes([0xB8])  # blocksizes 256/2048
             + b"\x01")  # framing bit
    comments = [f"TITLE=doc {doc_id}", "ARTIST=sïnth €ncoder"]
    cbody = bytearray(b"\x03vorbis")
    vendor = b"spark-graft synthesizer"
    cbody += struct.pack("<I", len(vendor)) + vendor
    cbody += struct.pack("<I", len(comments))
    for kv in comments:
        b = kv.encode("utf-8")
        cbody += struct.pack("<I", len(b)) + b
    cbody += b"\x01"  # framing bit
    setup = b"\x05vorbis" + b"\x00" * (40 + doc_id % 17)
    audio = [bytes([doc_id % 251]) * (60 + (doc_id * 7) % 200)
             for _ in range(2 + doc_id % 3)]
    return encode_ogg([ident, bytes(cbody), setup, *audio],
                      max_page_data=200 + (doc_id % 3) * 150)


def vorbis_params(doc_id: int) -> tuple[int, int, int]:
    """Ground-truth (sample_rate, channels, nominal bitrate)."""
    return (
        (44100, 48000, 32000, 22050)[doc_id % 4],
        1 + doc_id % 2,
        64000 + (doc_id % 8) * 16000,
    )


def opus_info_stats(df: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Arrow-batched Ogg-Opus metadata scan: one row per stream
    (title, channels, input rate, pre-skip, output gain, vendor)."""
    keep_schema = ", ".join(f"{c} string" for c in keep)
    schema = (
        "doc_id long, title string, channels int, sample_rate long, "
        "pre_skip int, output_gain_db double, vendor string"
        + (", " + keep_schema if keep else "")
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for j, p in enumerate(pdf["payload"]):
                i = opus_stream_info(bytes(p))
                rows.append((
                    pdf["doc_id"].iloc[j], i["title"], i["channels"],
                    i["sample_rate"], i["pre_skip"],
                    i["output_gain_db"], i["vendor"],
                    *[pdf[c].iloc[j] for c in keep],
                ))
            yield pd.DataFrame(
                rows, columns=["doc_id", "title", "channels",
                               "sample_rate", "pre_skip",
                               "output_gain_db", "vendor", *keep])

    return df.mapInPandas(run, schema)


def vorbis_info_stats(df: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Arrow-batched Ogg-Vorbis metadata scan over the payload column:
    one row per stream (title, channels, rate, nominal bitrate,
    vendor) — the no-decode inventory pass, the .ogg twin of
    ``mp3_info_stats``."""
    keep_schema = ", ".join(f"{c} string" for c in keep)
    schema = (
        "doc_id long, title string, channels int, sample_rate long, "
        "bitrate_nominal long, vendor string"
        + (", " + keep_schema if keep else "")
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for j, p in enumerate(pdf["payload"]):
                i = vorbis_stream_info(bytes(p))
                rows.append((
                    pdf["doc_id"].iloc[j], i["title"], i["channels"],
                    i["sample_rate"], i["bitrate_nominal"], i["vendor"],
                    *[pdf[c].iloc[j] for c in keep],
                ))
            yield pd.DataFrame(
                rows, columns=["doc_id", "title", "channels",
                               "sample_rate", "bitrate_nominal",
                               "vendor", *keep])

    return df.mapInPandas(run, schema)


# ------------------------------------------------------------- AVI (video)
#
# RIFF/AVI container with an MJPEG video stream — the smallest REAL
# video format expressible over the codecs already here: every frame
# is a complete baseline JPEG, so the whole image pipeline (entropy
# decode, IDCT, color conversion) runs per frame and the container
# layer adds the genuinely video-shaped parts — stream headers,
# frame-rate arithmetic, the movi chunk walk, and the idx1 index.
# Public spec: Microsoft AVI RIFF reference (avih MainAVIHeader,
# strh/strf stream headers, '00dc' compressed-video chunks).


def _riff_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload, fourcc_offset) for the chunks in
    data[pos:end]; chunks pad to even length per RIFF."""
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body_end = pos + 8 + size
        if body_end > end:
            raise ValueError("AVI: chunk overruns its parent")
        yield fourcc, data[pos + 8:body_end], pos
        pos = body_end + (size & 1)


def encode_avi_mjpeg(fps: int, frames: list[bytes],
                     width: int, height: int) -> bytes:
    """Build a real AVI: RIFF('AVI ') → LIST hdrl (avih + LIST strl
    (strh 'vids'/'MJPG' + strf BITMAPINFOHEADER)) → LIST movi with one
    '00dc' chunk per JPEG frame → idx1 keyframe index (offsets
    relative to the movi list data, the common convention)."""
    if fps <= 0:
        raise ValueError("fps must be positive")

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    n = len(frames)
    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I",
        int(round(1_000_000 / fps)), max_bytes * fps, 0,
        0x10,  # AVIF_HASINDEX
        n, 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHH8I", 0, 0, 0, 0, 1, fps, 0, n, max_bytes,
                      10_000, 0)
        + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3,
        0, 0, 0, 0,
    )
    hdrl = chunk(b"LIST", b"strl" + chunk(b"strh", strh)
                 + chunk(b"strf", strf))
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih) + hdrl)
    movi_body = b"movi"
    idx = b""
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, len(movi_body), len(f))
        movi_body += chunk(b"00dc", f)
    riff = (b"AVI " + hdrl + chunk(b"LIST", movi_body)
            + chunk(b"idx1", idx))
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _avi_parse(payload: bytes) -> tuple[float, int, int, list[bytes]]:
    """Parse an AVI container down to (fps, width, height, [frame
    bytes]). Strict where the spec is load-bearing: MJPG is the only
    handler with a registered frame codec (anything else raises
    NotImplementedError — the loud-boundary discipline every other
    codec here follows), and the avih/strh/idx1 frame counts must
    agree with the movi chunk walk."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if 8 + riff_size > len(payload):
        raise ValueError("AVI: truncated RIFF payload")
    end = 8 + riff_size
    n_hdr = width = height = None
    handler = compression = None
    scale = rate = n_stream = None
    frames: list[bytes] = []
    idx_entries: list[tuple[int, int]] | None = None
    movi_start = None
    for fourcc, body, off in _riff_chunks(payload, 12, end):
        if fourcc == b"LIST" and body[:4] == b"hdrl":
            for f2, b2, _ in _riff_chunks(payload, off + 12, off + 8 + len(body)):
                if f2 == b"avih":
                    vals = struct.unpack_from("<14I", b2)
                    n_hdr, width, height = vals[4], vals[8], vals[9]
                elif f2 == b"LIST" and b2[:4] == b"strl":
                    for f3, b3, _ in _riff_chunks(b2, 4, len(b2)):
                        if f3 == b"strh" and b3[:4] == b"vids":
                            handler = b3[4:8]
                            _, _, _, _, scale, rate, _, n_stream = (
                                struct.unpack_from("<IHH5I", b3, 8))
                        elif f3 == b"strf" and handler is not None \
                                and compression is None:
                            compression = b3[16:20]
        elif fourcc == b"LIST" and body[:4] == b"movi":
            movi_start = off + 8
            for f2, b2, _ in _riff_chunks(payload, off + 12, off + 8 + len(body)):
                if f2[2:4] in (b"dc", b"db"):
                    frames.append(b2)
        elif fourcc == b"idx1":
            idx_entries = [
                struct.unpack_from("<II", body, i + 8)
                for i in range(0, len(body) - len(body) % 16, 16)
            ]
    if handler is None or width is None:
        raise ValueError("AVI: no video stream header")
    if handler != b"MJPG" or compression != b"MJPG":
        raise NotImplementedError(
            f"AVI: only MJPG video streams decode (handler "
            f"{handler!r}, biCompression {compression!r})")
    if n_hdr != len(frames) or (n_stream is not None
                                and n_stream != len(frames)):
        raise ValueError(
            f"AVI: header claims {n_hdr}/{n_stream} frames, movi has "
            f"{len(frames)}")
    if idx_entries is not None:
        if len(idx_entries) != len(frames):
            raise ValueError("AVI: idx1 entry count != frame count")
        for (ofs, ln), f in zip(idx_entries, frames):
            at = movi_start + ofs
            if payload[at:at + 4] != b"00dc" or ln != len(f):
                raise ValueError("AVI: idx1 entry does not point at "
                                 "its frame chunk")
    fps = (rate / scale) if scale else 0.0
    return fps, width, height, frames


def decode_avi_frames(payload: bytes, stride: int = 1) -> list[dict]:
    """Per-frame decode: one dict per movi frame with the frame's own
    reconstructed-pixel statistics — the real form of the frame-
    sampling shape (:func:`sample_frames` is the codec-free twin).
    ``stride`` keeps every stride-th frame (by true frame index) and
    SKIPS the JPEG decode of the rest — the dominant cost — which is
    the point of sampled extraction over a large video corpus."""
    _fps, width, height, frames = _avi_parse(payload)
    return _avi_frame_stats(width, height, frames, stride)


def _avi_frame_stats(width, height, frames, stride) -> list[dict]:
    if stride < 1:
        raise ValueError("stride must be >= 1")
    out = []
    for i, f in enumerate(frames):
        if i % stride:
            continue
        w, h, img = _jpeg_decode_pixels(f)
        if (w, h) != (width, height):
            raise ValueError(
                f"AVI: frame {i} is {w}x{h}, stream header says "
                f"{width}x{height}")
        out.append({
            "frame_index": i,
            "width": w,
            "height": h,
            "mean_value": (float(img.sum()) / img.size) if img.size else 0.0,
            "n_bytes": len(f),
        })
    return out


def decode_avi(payload: bytes) -> dict:
    """Decode an MJPEG AVI for real: container walk + per-frame JPEG
    decode, statistics over ALL reconstructed frames. ``sample_rate``
    carries the frame rate (units per second, like audio), ``n_units``
    the frame count — the schema's units are medium-generic by
    design."""
    fps, width, height, frames = _avi_parse(payload)
    per = _avi_frame_stats(width, height, frames, 1)  # parse once
    total = sum(p["mean_value"] for p in per)
    return {
        "media_kind": "video",
        "width": width,
        "height": height,
        "bit_depth": 8,
        "sample_rate": int(round(fps)),
        "channels": 3,
        "n_units": len(frames),
        "duration_ms": (len(frames) * 1000.0 / fps) if fps else 0.0,
        "mean_value": (total / len(per)) if per else 0.0,
        "n_bytes": len(payload),
    }


def avi_params(doc_id: int) -> tuple[int, int, int, int]:
    """Ground-truth (fps, n_frames, width, height) for a synthesized
    MJPEG AVI; dimensions are MCU multiples so constant tiles need no
    edge padding."""
    return (
        10 + doc_id % 15,
        2 + doc_id % 4,
        8 * (1 + doc_id % 3),
        8 * (1 + doc_id % 2),
    )


def avi_frame_rgb(doc_id: int, i: int) -> tuple[int, int, int]:
    """Ground-truth constant color of frame ``i``: mod-251 keeps the
    forward YCbCr conversion clip-free (the jpeg_color_params rule),
    and the per-frame drift makes frame ORDER load-bearing — a movi
    walk that drops or reorders chunks breaks the oracle."""
    return (
        (doc_id * 7 + i * 31) % 251,
        (doc_id * 11 + i * 17) % 251,
        (doc_id * 13 + i * 23) % 251,
    )


def encode_avi_sample(doc_id: int) -> bytes:
    """Synthesized MJPEG AVI for ``doc_id``: each frame a constant-
    color baseline 4:4:4 JPEG (distortion-free through the DCT), so
    the video's mean has the same SQL-replicable closed form as the
    color-JPEG rows — per frame."""
    fps, n, w, h = avi_params(doc_id)
    frames = [
        encode_jpeg(w, h, rgb=avi_frame_rgb(doc_id, i)) for i in range(n)
    ]
    return encode_avi_mjpeg(fps, frames, w, h)


def video_frame_stats(df: DataFrame, keep: tuple[str, ...] = (),
                      stride: int = 1) -> DataFrame:
    """Frame-extraction fan-out with a REAL codec: one output row per
    decoded AVI frame (1 input row → n_frames rows), Arrow-batched;
    only small per-frame stat rows leave the UDF — the payload bytes
    never hit the shuffle. ``stride`` samples every stride-th frame,
    skipping the skipped frames' JPEG decode entirely."""
    keep_schema = ", ".join(f"{c} string" for c in keep)
    schema = (
        "doc_id long, frame_index long, width long, height long, "
        "frame_mean double, frame_bytes long"
        + (", " + keep_schema if keep else "")
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for j, p in enumerate(pdf["payload"]):
                for f in decode_avi_frames(bytes(p), stride):
                    rows.append((
                        pdf["doc_id"].iloc[j], f["frame_index"],
                        f["width"], f["height"], f["mean_value"],
                        f["n_bytes"],
                        *[pdf[c].iloc[j] for c in keep],
                    ))
            cols = ["doc_id", "frame_index", "width", "height",
                    "frame_mean", "frame_bytes", *keep]
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema)


# ---------------------------------------------------------- codec registry
#
# The production seam for compressed formats: each known container
# format carries a magic-byte sniffer; a format decodes only if a
# decoder is REGISTERED for it. BMP, WAV, FLAC, PNG, GIF, JPEG, MJPEG
# AVI and Ogg (FLAC mapping) register their built-in spec parsers at
# import; MP3 is recognized (so the error is precise) but undecodable
# until a real codec is plugged in with ``register_decoder`` — the
# default stays the loud raise, as do the Vorbis/Opus Ogg mappings
# inside ``decode_ogg``.
#
# Distribution caveat, by design: Python workers re-import this module,
# so a runtime registration made in the driver is NOT visible on
# executors through module state. ``extract_media_features`` therefore
# SNAPSHOTS the registry into the UDF closure at plan-build time — the
# registered callables ship with the serialized closure, exactly like
# any other captured function. Register before building the plan.


class MediaFormat:
    """A sniffable container format: name + kind + magic matcher."""

    __slots__ = ("name", "kind", "sniff", "hint")

    def __init__(self, name: str, kind: str,
                 sniff: Callable[[bytes], bool], hint: str):
        self.name, self.kind, self.sniff, self.hint = name, kind, sniff, hint


KNOWN_MEDIA_FORMATS: tuple[MediaFormat, ...] = (
    MediaFormat("bmp", "image", lambda p: p[:2] == b"BM",
                "BMP decode failed"),
    MediaFormat("png", "image", lambda p: p[:8] == b"\x89PNG\r\n\x1a\n",
                "PNG decode failed"),
    MediaFormat("gif", "image", lambda p: p[:6] in (b"GIF87a", b"GIF89a"),
                "GIF decode failed"),
    MediaFormat("jpeg", "image", lambda p: p[:3] == b"\xff\xd8\xff",
                "JPEG decode failed"),
    MediaFormat("tiff", "image",
                lambda p: p[:4] in (b"II*\x00", b"MM\x00*"),
                "TIFF decode failed"),
    MediaFormat("wav", "audio",
                lambda p: p[:4] == b"RIFF" and p[8:12] == b"WAVE",
                "WAV decode failed"),
    MediaFormat("flac", "audio", lambda p: p[:4] == b"fLaC",
                "FLAC decode failed"),
    MediaFormat("mp3", "audio",
                lambda p: p[:3] == b"ID3" or p[:2] in (b"\xff\xfb",
                                                       b"\xff\xf3"),
                "MP3 decode requires an MPEG audio codec"),
    MediaFormat("ogg", "audio", lambda p: p[:4] == b"OggS",
                "OGG decode failed"),
    MediaFormat("avi", "video",
                lambda p: p[:4] == b"RIFF" and p[8:12] == b"AVI ",
                "AVI decode failed"),
    MediaFormat("pdf", "document", lambda p: p[:5] == b"%PDF-",
                "PDF extraction failed"),
)

_BUILTIN_DECODERS: dict[str, Callable[[bytes], dict]] = {
    "bmp": decode_bmp,
    "wav": decode_wav,
    "flac": decode_flac,
    "png": decode_png,
    "gif": decode_gif,
    "jpeg": decode_jpeg,
    "tiff": decode_tiff,
    "avi": decode_avi,
    "ogg": decode_ogg,
    "pdf": _pdf.decode_pdf,
}
_DECODERS: dict[str, Callable[[bytes], dict]] = dict(_BUILTIN_DECODERS)


def register_decoder(
    fmt: str, decoder: Callable[[bytes], dict]
) -> Callable[[bytes], dict]:
    """Plug a decoder in for a known format ('png', 'jpeg', 'mp3',
    'ogg' — or override 'bmp'/'wav'). The decoder takes the raw payload
    bytes and returns a feature dict with at least ``media_kind`` and
    ``n_bytes`` (see ``decode_bmp``/``decode_wav`` for the full key
    set). Returns the decoder, so it is usable as a decorator:
    ``@partial(register_decoder, 'jpeg')``."""
    known = {f.name for f in KNOWN_MEDIA_FORMATS}
    if fmt not in known:
        raise ValueError(f"unknown media format {fmt!r} (known: "
                         f"{sorted(known)})")
    if not callable(decoder):
        raise TypeError("decoder must be callable(bytes) -> dict")
    _DECODERS[fmt] = decoder
    return decoder


def unregister_decoder(fmt: str) -> None:
    """Remove a plugged-in decoder; built-in formats (bmp/wav) revert
    to their spec parsers."""
    if fmt in _BUILTIN_DECODERS:
        _DECODERS[fmt] = _BUILTIN_DECODERS[fmt]
    else:
        _DECODERS.pop(fmt, None)


def detect_media_format(
    payload: bytes, kind: str | None = None
) -> MediaFormat | None:
    """Sniff a payload's container format by magic bytes; ``kind``
    restricts to 'image' or 'audio' formats."""
    for f in KNOWN_MEDIA_FORMATS:
        if (kind is None or f.kind == kind) and f.sniff(payload):
            return f
    return None


def _decode_kind(
    payload: bytes, kind: str,
    decoders: dict[str, Callable[[bytes], dict]] | None,
) -> dict:
    f = detect_media_format(payload, kind)
    if f is None:
        raise ValueError(f"unrecognized {kind} payload")
    dec = (_DECODERS if decoders is None else decoders).get(f.name)
    if dec is None:
        raise NotImplementedError(f.hint)
    return dec(payload)


def decode_image(
    payload: bytes,
    decoders: dict[str, Callable[[bytes], dict]] | None = None,
) -> dict:
    """Image decode dispatch through the codec registry: BMP, PNG,
    GIF and baseline grayscale JPEG decode for real (built-in spec
    parsers); ``register_decoder`` overrides any of them. ``decoders``
    overrides the module registry (used by Arrow closures that
    snapshot it at plan-build time)."""
    return _decode_kind(payload, "image", decoders)


def decode_audio(
    payload: bytes,
    decoders: dict[str, Callable[[bytes], dict]] | None = None,
) -> dict:
    """Audio decode dispatch through the codec registry: PCM WAV
    decodes for real (``decode_wav``); MP3/OGG raise until a codec is
    registered."""
    return _decode_kind(payload, "audio", decoders)


def decode_video(
    payload: bytes,
    decoders: dict[str, Callable[[bytes], dict]] | None = None,
) -> dict:
    """Video decode dispatch through the codec registry: MJPEG AVI
    decodes for real (container walk + per-frame JPEG decode)."""
    return _decode_kind(payload, "video", decoders)


def decode_media(
    payload: bytes, media_type: str,
    decoders: dict[str, Callable[[bytes], dict]] | None = None,
) -> dict:
    """Typed decoder entry point keyed by MIME-ish media_type."""
    if media_type.startswith("image/"):
        return decode_image(payload, decoders)
    if media_type.startswith("audio/"):
        return decode_audio(payload, decoders)
    if media_type.startswith("video/"):
        return decode_video(payload, decoders)
    if media_type == "application/pdf":
        return _decode_kind(payload, "document", decoders)
    raise ValueError(f"no decoder for media_type {media_type!r}")


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


# ---------------------------------------------------------------------------
# Deterministic media synthesis + real-decode feature extraction.
# In production the payload column arrives from the object store; the
# synthesizer stands in for that ingest so the *decode* path runs on
# genuine BMP/WAV bytes whose ground-truth features are closed-form in
# doc_id — which is exactly what lets a SQL oracle verify the decoders
# end-to-end (see plans/catalog_ext.py multimodal_*_decode_stats).
# ---------------------------------------------------------------------------


def bmp_params(doc_id: int) -> tuple[int, int, int]:
    """Ground-truth (width, height, pixel_value) for a synthesized BMP.
    Width cycles through values where ``3*w % 4 != 0`` too, so row
    padding is exercised."""
    return 1 + doc_id % 13, 1 + doc_id % 7, doc_id % 251


def png_params(doc_id: int) -> tuple[int, int, int]:
    """Ground-truth (width, height, base_value) for a synthesized
    gradient PNG (truecolor). base ≤ 52 keeps the gradient peak
    ``52 + 7·6 + 13·12 + 2 = 252`` inside a byte for every geometry,
    so the closed-form mean ``base + 7(h-1)/2 + 13(w-1)/2 + 1`` holds
    without wraparound — which is what lets a SQL oracle verify the
    inflate+unfilter path end-to-end."""
    return 1 + doc_id % 13, 1 + doc_id % 7, doc_id % 53


def lowbit_png_params(doc_id: int) -> tuple[int, int, int, int, int]:
    """Ground-truth (bit_depth, color_type, width, height, base) for
    a synthesized sub-byte PNG — depth cycles 4/2/1 by ``doc_id % 3``:
    4-bit grayscale gradient (peak ≤ 5+5+4 = 14), 2-bit grayscale
    modular gradient with width a multiple of 4 (every row covers each
    residue equally → mean exactly 1.5), 1-bit indexed checkerboard
    through a 2-entry palette."""
    k = doc_id % 3
    if k == 0:
        return 4, 0, 1 + doc_id % 6, 1 + doc_id % 5, doc_id % 6
    if k == 1:
        return 2, 0, 4 * (1 + doc_id % 3), 1 + doc_id % 7, doc_id % 4
    return 1, 3, 3 + doc_id % 13, 1 + doc_id % 7, doc_id % 2


# non-identity oracle palette for synthesized indexed PNGs:
# index i → (255-i, i, i), so the palette-mapped per-pixel mean is
# (255 + i) / 3 — a lookup-skipping bug shifts it to i and breaks
# the oracle
_ORACLE_PALETTE = bytes(v for i in range(256) for v in (255 - i, i, i))


def jpeg_color_params(doc_id: int) -> tuple[int, int, tuple[int, int, int]]:
    """Ground-truth (width, height, (r, g, b)) for a synthesized
    constant-color JPEG: mod-251 keeps every channel ≤ 250, so the
    forward YCbCr conversion never clips and the decode-side RGB is
    the pure floor(x+0.5) chain a SQL oracle can replicate."""
    return (
        1 + doc_id % 13,
        1 + doc_id % 7,
        (doc_id % 251, (doc_id * 3) % 251, (doc_id * 7) % 251),
    )


def jpeg_cmyk_params(doc_id: int) -> tuple[int, int,
                                           tuple[int, int, int, int]]:
    """Ground-truth (width, height, (c, m, y, k)) for a synthesized
    constant-tile CMYK JPEG: CMY in 5..250 keeps the INVERTED channels
    ≤ 250, so the YCCK forward conversion never clips and the whole
    decode chain is the pure floor(x+0.5) algebra a SQL oracle can
    replicate."""
    return (
        1 + doc_id % 13,
        1 + doc_id % 7,
        (5 + doc_id % 246, 5 + (doc_id * 3) % 246,
         5 + (doc_id * 7) % 246, doc_id % 251),
    )


def wav_params(doc_id: int) -> tuple[int, int, int, int]:
    """Ground-truth (sample_rate, channels, n_frames, sample_value)."""
    return (
        8000 + (doc_id % 5) * 1000,
        1 + doc_id % 2,
        50 + doc_id % 100,
        doc_id % 1000 - 500,
    )


def wav_ext_params(doc_id: int) -> tuple[int, int, int, int]:
    """Ground-truth (fmt_cycle, sample_rate, channels, n_frames) for
    the extended-WAV fixture family; ``fmt_cycle`` = doc_id % 8 picks
    8-bit PCM / 24-bit PCM / float32 / IMA ADPCM / EXTENSIBLE-int16 /
    MS ADPCM / G.711 mu-law / G.711 A-law."""
    return (
        doc_id % 8,
        8000 + (doc_id % 4) * 1000,
        1 + doc_id % 2,
        40 + doc_id % 60,
    )


def encode_wav_ext(doc_id: int) -> bytes:
    """Per-document WAV synthesis cycling the real-corpus format axes
    the plain ``encode_wav`` fixture does not reach. Every variant's
    mean amplitude has a closed form the DuckDB oracle reproduces:

    * ``%6==0`` — 8-bit unsigned PCM, ramp ``(doc_id%50)+i`` (never
      wraps: max 49+197 < 256), signed-scale mean
      ``doc_id%50 + (N-1)/2 - 128``;
    * ``%6==1`` — 24-bit PCM, ramp ``base + 17*i`` with
      ``base=(doc_id%1000-500)*1000``, mean ``base + 17*(N-1)/2``;
    * ``%6==2`` — IEEE float32, integer ramp (exact in a float32),
      mean ``doc_id%200-100 + (N-1)/2``;
    * ``%6==3`` — IMA ADPCM with a per-channel CONSTANT signal: with
      the block header storing the first sample and step index 0,
      nibble 0 reconstructs ``step(0)>>3 == 0`` so a constant stream
      round-trips EXACTLY — a lossy codec with a lossless oracle.
      Channels carry ``c`` and ``c+100`` so interleave bugs shift the
      mean;
    * ``%6==4`` — WAVE_FORMAT_EXTENSIBLE-wrapped 16-bit PCM ramp,
      mean ``doc_id%400-200 + (N-1)/2``;
    * ``%6==5`` — MS ADPCM (format 2) with a per-channel CONSTANT
      signal: coefficient pair 0 is (256, 0), so prediction from two
      equal header samples is exact and every code is 0 — again a
      lossy codec under a lossless oracle. Channels carry ``c`` and
      ``c+77``, mean ``doc_id%800-400 + (ch-1)*38.5``;
    * ``%8==6`` / ``%8==7`` — G.711 mu-law / A-law (formats 7 / 6,
      mono): every sample the SAME companded code byte
      ``(doc_id // 8) % 256``, so the mean is that code's exact
      expansion-table value — closed-form in SQL via the G.711 chord
      arithmetic (mirrored formula, audioop-cross-validated tables).
    """
    fmt, rate, ch, nf = wav_ext_params(doc_id)
    n = nf * ch
    if fmt in (6, 7):
        code = (doc_id // 8) % 256
        return encode_g711_wav(rate, bytes([code]) * nf,
                               "ulaw" if fmt == 6 else "alaw")
    if fmt == 5:
        c = doc_id % 800 - 400
        frames = [tuple(c + 77 * k for k in range(ch))] * nf
        return encode_ms_adpcm_wav(rate, frames)
    if fmt == 0:
        base = doc_id % 50
        data = bytes(base + i for i in range(n))
        return _pcm_wav(rate, ch, 8, data)
    if fmt == 1:
        base = (doc_id % 1000 - 500) * 1000
        data = b"".join(
            struct.pack("<i", base + 17 * i)[:3] for i in range(n))
        return _pcm_wav(rate, ch, 24, data)
    if fmt == 2:
        base = doc_id % 200 - 100
        data = struct.pack(f"<{n}f", *(float(base + i) for i in range(n)))
        return _pcm_wav(rate, ch, 32, data, audio_format=3)
    if fmt == 3:
        c = doc_id % 1000 - 500
        frames = [tuple(c + 100 * k for k in range(ch))] * nf
        return encode_ima_adpcm_wav(rate, frames)
    base = doc_id % 400 - 200
    data = struct.pack(f"<{n}h", *(base + i for i in range(n)))
    return _pcm_wav(rate, ch, 16, data, extensible=True)


def _pcm_wav(rate: int, channels: int, bits: int, data: bytes,
             audio_format: int = 1, extensible: bool = False) -> bytes:
    """Assemble a RIFF/WAVE container around pre-packed sample bytes,
    optionally wrapped in WAVE_FORMAT_EXTENSIBLE (fmt 0xFFFE with the
    22-byte extension and the PCM/float SubFormat GUID)."""
    block_align = channels * (bits // 8)
    byte_rate = rate * block_align
    if extensible:
        guid = struct.pack("<H", audio_format) + _WAVE_EXT_GUID_TAIL
        fmt = struct.pack("<HHIIHHHHI", 0xFFFE, channels, rate, byte_rate,
                          block_align, bits, 22, bits,
                          (1 << channels) - 1) + guid
    else:
        fmt = struct.pack("<HHIIHH", audio_format, channels, rate,
                          byte_rate, block_align, bits)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    if len(data) % 2:
        body += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + struct.pack("<I", len(body)) + body


def flac_params(doc_id: int) -> tuple[int, int, int, int]:
    """Ground-truth (sample_rate, n_frames, base, slope): every channel
    carries the SAME linear ramp ``s[n] = base + slope*n``, so the PCM
    mean has the closed form ``base + slope*(n_frames-1)/2`` — exact in
    a double on both engines, the WAV-row oracle trick applied to a
    signal the FIXED order-2 / LPC predictors compress to zero
    residuals (the Rice path still decodes every sample)."""
    return (
        16000 + (doc_id % 4) * 4000,
        64 + doc_id % 128,
        doc_id % 200 - 100,
        1 + doc_id % 3,
    )


def encode_flac_ramp(doc_id: int) -> bytes:
    """Per-document FLAC synthesis: mono/stereo alternates by id;
    stereo ids cycle the three decorrelation modes; every 5th id takes
    the LPC subframe path; Rice partitioning is requested (falls back
    when the last short frame is indivisible)."""
    rate, n, base, slope = flac_params(doc_id)
    channels = 1 + doc_id % 2
    frames = [[base + slope * i] * channels for i in range(n)]
    mode = ("independent", "left_side", "mid_side")[doc_id % 3] \
        if channels == 2 else "independent"
    return encode_flac(rate, frames, stereo_mode=mode,
                       use_lpc=(doc_id % 5 == 0), partition_order=2)


def synthesize_media(
    df: DataFrame, kind: str, id_col: str = "doc_id", keep: tuple[str, ...] = ()
) -> DataFrame:
    """Materialize real payload bytes per row, Arrow-batched: BMP
    ("image"), PNG ("png"), GIF ("gif"), baseline grayscale JPEG
    ("jpeg") or WAV ("audio"). Payload bytes are built and stay on the
    executors; ``keep`` columns pass through for downstream
    grouping."""
    kinds = ("image", "rle-bmp", "rle4-bmp", "pal-bmp", "bmp-32",
             "audio", "wav-ext", "flac", "ogg-flac", "png",
             "png-palette", "png-lowbit",
             "png-interlaced", "png-16", "gif", "gif-anim", "jpeg",
             "jpeg-color", "jpeg-420", "jpeg-progressive", "jpeg-cmyk",
             "tiff", "tiff-16", "tiff-palette", "tiff-multipage",
             "tiff-g4", "tiff-g3", "tiff-subbyte", "tiff-ycbcr",
             "video", "mp3", "vorbis", "opus")
    if kind not in kinds:
        raise ValueError(f"kind must be one of {kinds}")
    media_type = {"image": "image/bmp", "rle-bmp": "image/bmp",
                  "pal-bmp": "image/bmp", "bmp-32": "image/bmp",
                  "rle4-bmp": "image/bmp",
                  "png": "image/png",
                  "png-palette": "image/png", "png-lowbit": "image/png",
                  "png-interlaced": "image/png", "png-16": "image/png",
                  "gif": "image/gif", "gif-anim": "image/gif",
                  "jpeg": "image/jpeg", "jpeg-color": "image/jpeg",
                  "jpeg-420": "image/jpeg",
                  "jpeg-progressive": "image/jpeg",
                  "jpeg-cmyk": "image/jpeg",
                  "tiff": "image/tiff", "tiff-16": "image/tiff",
                  "tiff-palette": "image/tiff", "tiff-g4": "image/tiff",
                  "tiff-g3": "image/tiff",
                  "tiff-subbyte": "image/tiff",
                  "tiff-ycbcr": "image/tiff",
                  "tiff-multipage": "image/tiff",
                  "audio": "audio/wav", "wav-ext": "audio/wav",
                  "flac": "audio/flac",
                  "ogg-flac": "audio/ogg", "mp3": "audio/mpeg",
                  "vorbis": "audio/ogg", "opus": "audio/ogg",
                  "video": "video/x-msvideo"}[kind]
    cols = [id_col, *keep]
    keep_schema = ", ".join(f"{c} string" for c in keep)
    out_schema = "doc_id long, payload binary, media_type string" + (
        ", " + keep_schema if keep else ""
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            if kind == "image":
                payloads = [encode_bmp(*bmp_params(int(d))) for d in ids]
            elif kind == "rle-bmp":
                # BI_RLE8: encoded runs + absolute-mode gradient rows
                payloads = [encode_bmp_rle8(*rle_bmp_params(int(d)))
                            for d in ids]
            elif kind == "rle4-bmp":
                # BI_RLE4: nibble-alternating runs + absolute nibble
                # gradients, word alignment — the 16-color RLE layout
                payloads = [encode_bmp_rle4(*rle4_bmp_params(int(d)))
                            for d in ids]
            elif kind == "bmp-32":
                # 32-bit BGRX (the screenshot/compositor layout):
                # BI_BITFIELDS for odd ids, top-down every 3rd, the
                # X byte poisoned 0xAA so stats must exclude it
                payloads = [encode_bmp32(
                    2 + int(d) % 9, 1 + int(d) % 6, int(d) % 251,
                    top_down=int(d) % 3 == 0, bitfields=bool(int(d) % 2))
                    for d in ids]
            elif kind == "pal-bmp":
                # uncompressed paletted 8/4/1-bit cycling by id, both
                # orientations — the most common BMP variants in the
                # wild, each with a closed-form mean
                payloads = []
                for d in ids:
                    bpp, w, h, base, td = pal_bmp_params(int(d))
                    payloads.append(encode_bmp_paletted(
                        w, h, bpp, base, top_down=td))
            elif kind == "png":
                payloads = [encode_png(*png_params(int(d))) for d in ids]
            elif kind == "png-16":
                # 16-bit truecolor: the v*257 gradient keeps the
                # 16-bit mean at 257x the 8-bit closed form
                payloads = [
                    encode_png(*png_params(int(d)), bit_depth=16)
                    for d in ids
                ]
            elif kind == "png-interlaced":
                # Adam7: same gradient, seven-pass storage order —
                # downstream position-sensitive consumers (resize)
                # verify the scatter, not just the mean
                payloads = [
                    encode_png(*png_params(int(d)), interlaced=True)
                    for d in ids
                ]
            elif kind == "png-palette":
                # indexed: gradient indexes through the non-identity
                # oracle palette — the PLTE lookup is load-bearing
                payloads = [
                    encode_png(*png_params(int(d)), color_type=3,
                               palette=_ORACLE_PALETTE)
                    for d in ids
                ]
            elif kind == "png-lowbit":
                # 1/2/4-bit sub-byte depths (icons/screenshots/charts):
                # 4-bit gray gradient, 2-bit modular gradient (width a
                # multiple of 4 -> mean exactly 1.5), 1-bit PALETTED
                # checkerboard through the non-identity oracle palette;
                # every 5th id stores Adam7-interlaced
                payloads = []
                for d in ids:
                    depth, ct, w, h, base = lowbit_png_params(int(d))
                    mx = (1 << depth) - 1
                    if depth == 4:
                        smp = bytes(base + r + c for r in range(h)
                                    for c in range(w))
                    else:
                        smp = bytes((base + r + c) % (mx + 1)
                                    for r in range(h) for c in range(w))
                    payloads.append(encode_png(
                        w, h, color_type=ct, samples=smp,
                        bit_depth=depth,
                        palette=_ORACLE_PALETTE[:6] if ct == 3 else None,
                        interlaced=int(d) % 5 == 0))
            elif kind == "gif":
                payloads = [encode_gif(*png_params(int(d))) for d in ids]
            elif kind == "gif-anim":
                # animated: full-canvas base frame + non-overlapping
                # 2x2 patches, composed per-frame means closed-form
                payloads = [encode_gif_animation_sample(int(d))
                            for d in ids]
            elif kind == "jpeg":
                # constant tiles: distortion-free through the DCT path
                payloads = [encode_jpeg(*bmp_params(int(d))) for d in ids]
            elif kind == "jpeg-color":
                # constant COLOR tiles: the YCbCr 4:4:4 scan is
                # distortion-free too, and the color conversions round
                # half-up so the chain stays SQL-replicable
                payloads = []
                for d in ids:
                    cw, chh, crgb = jpeg_color_params(int(d))
                    payloads.append(encode_jpeg(cw, chh, rgb=crgb))
            elif kind == "jpeg-420":
                # the dominant real-world layout: 4:2:0 chroma +
                # restart markers. Constant tiles subsample
                # losslessly, so the SAME color oracle must hold
                payloads = []
                for d in ids:
                    cw, chh, crgb = jpeg_color_params(int(d))
                    payloads.append(encode_jpeg(
                        cw, chh, rgb=crgb, subsampling="420",
                        restart_interval=1 + int(d) % 3))
            elif kind == "jpeg-progressive":
                # SOF2 color files (spectral selection + successive
                # approximation, 4:2:0 for odd ids, restart markers
                # threaded through every scan for ids % 3 != 0):
                # progressive re-orders the SAME quantized
                # coefficients, so the constant-tile color oracle is
                # again identical
                payloads = []
                for d in ids:
                    cw, chh, crgb = jpeg_color_params(int(d))
                    payloads.append(encode_jpeg(
                        cw, chh, rgb=crgb, progressive=True,
                        subsampling="420" if int(d) % 2 else "444",
                        restart_interval=int(d) % 3))
            elif kind == "jpeg-cmyk":
                # Adobe 4-component print-origin files: plain inverted
                # CMYK (transform 0) for even ids, YCCK (transform 2)
                # for odd — constant tiles keep both chains exact
                payloads = []
                for d in ids:
                    cw, chh, ccmyk = jpeg_cmyk_params(int(d))
                    payloads.append(encode_jpeg(
                        cw, chh, cmyk=ccmyk,
                        adobe_transform=2 if int(d) % 2 else 0))
            elif kind == "flac":
                # real Rice-coded FLAC; mono/stereo + all three
                # decorrelation modes + fixed/LPC subframes cycle by id
                payloads = [encode_flac_ramp(int(d)) for d in ids]
            elif kind == "tiff":
                # gray/RGB, PackBits/none, II/MM cycle per id
                payloads = [encode_tiff_sample(int(d)) for d in ids]
            elif kind == "tiff-16":
                # 16 bits per sample (the scientific/GeoTIFF depth),
                # same variant cycle, sample-wide predictor
                payloads = [encode_tiff16_sample(int(d)) for d in ids]
            elif kind == "tiff-palette":
                # photometric 3 + ColorMap (the scanned-document
                # layout), compression/byte-order/tiling cycle
                payloads = [encode_tiff_palette_sample(int(d))
                            for d in ids]
            elif kind == "tiff-g4":
                # CCITT Group 4 fax: T.6 MMR bilevel strips, both
                # photometrics, FillOrder 2 every 5th id
                payloads = [encode_tiff_g4_sample(int(d))
                            for d in ids]
            elif kind == "tiff-g3":
                # CCITT Group 3 / RLE fax: Compression 2 -> G3 1-D ->
                # G3 2-D cycle over the same patterns
                payloads = [encode_tiff_g3_sample(int(d))
                            for d in ids]
            elif kind == "tiff-subbyte":
                # 1/4-bit planes under the byte-stream codecs
                # (uncompressed/PackBits/LZW/Deflate), incl. 4-bit
                # palette through a non-identity ColorMap
                payloads = [encode_tiff_subbyte_sample(int(d))
                            for d in ids]
            elif kind == "tiff-ycbcr":
                # photometric 6 at 4:4:4, constant clip-free colors so
                # the JFIF double-conversion chain is SQL-replicable
                payloads = []
                for d in ids:
                    w, h, c = jpeg_color_params(int(d))
                    comp = ("none", "packbits", "lzw",
                            "deflate")[int(d) % 4]
                    tiled = int(d) % 7 == 5
                    payloads.append(encode_tiff(
                        w, h, rgb=True, rgb_const=c, ycbcr=True,
                        compression=comp,
                        big_endian=int(d) % 5 == 0, tiled=tiled,
                        planar=not tiled and int(d) % 11 == 7))
            elif kind == "tiff-multipage":
                # 1..4 IFD-chained pages, each cycling the container
                # variants independently (the fax/scan corpus shape)
                payloads = [encode_tiff_multipage_sample(int(d))
                            for d in ids]
            elif kind == "ogg-flac":
                # the FLAC ramps wrapped in Ogg transport; page and
                # packet sizes cycle by id so lacing terminators and
                # cross-page continuation both occur in-corpus
                payloads = [
                    encode_ogg_flac(
                        encode_flac_ramp(int(d)),
                        max_page_data=200 + (int(d) % 4) * 300,
                        audio_packet_bytes=255 if int(d) % 3 == 0 else 600,
                    )
                    for d in ids
                ]
            elif kind == "video":
                # MJPEG AVI: per-frame constant-color JPEGs whose
                # colors drift per frame index — chunk order is
                # load-bearing in the oracle
                payloads = [encode_avi_sample(int(d)) for d in ids]
            elif kind == "wav-ext":
                # extended-WAV family: 8/24-bit PCM, float32, IMA
                # ADPCM, EXTENSIBLE — same decode_wav dispatch path
                payloads = [encode_wav_ext(int(d)) for d in ids]
            elif kind == "mp3":
                # header-walkable MPEG-1 Layer III streams with ID3v2
                # titles (metadata scan only — PCM stays the boundary)
                payloads = [encode_mp3_stub(int(d)) for d in ids]
            elif kind == "vorbis":
                # Ogg-Vorbis streams with real identification/comment
                # headers (metadata scan only — PCM stays the boundary)
                payloads = [encode_ogg_vorbis_stub(int(d)) for d in ids]
            elif kind == "opus":
                # Ogg-Opus: RFC 7845 OpusHead/OpusTags (metadata only)
                payloads = [encode_ogg_opus_stub(int(d)) for d in ids]
            else:
                payloads = [encode_wav(*wav_params(int(d))) for d in ids]
            out = {"doc_id": ids, "payload": payloads, "media_type": media_type}
            for c in keep:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(run, out_schema)


def extract_media_features(df: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Real decode over the payload column: dispatches per-row on
    ``media_type`` (BMP/PNG/GIF/JPEG/WAV parse for real; other compressed
    formats raise until registered). One Arrow batch per ~10k rows;
    only small feature rows leave the UDF."""
    keep_schema = ", ".join(f"{c} string" for c in keep)
    schema = MEDIA_FEATURE_SCHEMA + (", " + keep_schema if keep else "")
    feature_keys = (
        "width height bit_depth sample_rate channels n_units "
        "duration_ms mean_value n_bytes"
    ).split()
    # snapshot the codec registry NOW: executors re-import the module
    # (losing runtime registrations), but the snapshot ships inside the
    # serialized closure alongside the registered callables
    decoders = dict(_DECODERS)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [
                decode_media(bytes(p), mt, decoders)
                for p, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            out = {
                "doc_id": pdf["doc_id"],
                "media_kind": [f["media_kind"] for f in feats],
            }
            for k in feature_keys:
                out[k] = [f.get(k) for f in feats]
            for c in keep:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema)


def decode_image_pixels(payload: bytes):
    """(width, height, top-down H×W×3 uint8 RGB array) for any BUILT-IN
    image format — BMP, PNG (gray/gray+alpha expand, alpha drops), GIF
    (palette-mapped), baseline grayscale JPEG (replicated), TIFF
    (gray replicate / white-is-zero invert / RGB passthrough). Pixel
    access is a built-in capability: ``register_decoder`` plugs in
    FEATURE decoders, which return stats, not pixels — a registered
    format still raises here."""
    import numpy as np

    f = detect_media_format(payload, "image")
    if f is None:
        raise ValueError("unrecognized image payload")
    if f.name == "bmp":
        w, h, bgr = _bmp_pixels(payload)
        return w, h, np.ascontiguousarray(bgr[:, :, ::-1])
    if f.name == "png":
        w, h, ch, recon, depth = _png_parse(payload)
        if depth == 16:
            # 16-bit → 8-bit: the high byte (the spec's sample
            # scaling 65535→255 rounds to exactly this for v*257)
            a = np.frombuffer(bytes(recon), ">u2").reshape(h, w, ch)
            a = (a >> 8).astype(np.uint8)
        else:
            a = np.frombuffer(bytes(recon), np.uint8).reshape(h, w, ch)
        if ch == 1:
            rgb = np.repeat(a, 3, axis=2)
        elif ch == 2:  # gray + alpha: the gray plane
            rgb = np.repeat(a[:, :, :1], 3, axis=2)
        elif ch == 3:
            rgb = a
        else:  # RGBA: drop alpha
            rgb = a[:, :, :3]
        return w, h, np.ascontiguousarray(rgb)
    if f.name == "gif":
        w, h, pal, idx = _gif_parse(payload)
        p = np.frombuffer(pal, np.uint8).reshape(-1, 3)
        rgb = p[np.frombuffer(bytes(idx), np.uint8)].reshape(h, w, 3)
        return w, h, np.ascontiguousarray(rgb)
    if f.name == "jpeg":
        w, h, img = _jpeg_decode_pixels(payload)
        if img.ndim == 3:  # color (YCbCr 4:4:4): already RGB
            return w, h, np.ascontiguousarray(img)
        return w, h, np.repeat(img[:, :, None], 3, axis=2)
    if f.name == "tiff":
        w, h, spp, photo, data, bit_depth = _tiff_parse(payload)
        a = np.asarray(data).reshape(h, w, spp)
        if bit_depth == 16:  # high byte: exact for the v·257 lattice
            a = (a >> 8).astype(np.uint8)
        else:
            a = a.astype(np.uint8)
        if photo == 0:  # white-is-zero inverts
            a = 255 - a
        rgb = a if spp == 3 else np.repeat(a, 3, axis=2)
        return w, h, np.ascontiguousarray(rgb)
    raise NotImplementedError(f.hint)


def _bmp_from_rgb(arr) -> bytes:
    """24-bit bottom-up BMP from a top-down H×W×3 uint8 RGB array —
    the canonical output container of the resize tier."""
    h, w = arr.shape[:2]
    bgr = arr[:, :, ::-1]
    pad = (4 - (w * 3) % 4) % 4
    body = bytearray()
    for r in range(h - 1, -1, -1):
        body += bgr[r].tobytes() + b"\x00" * pad
    file_header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0
    )
    return file_header + info_header + bytes(body)


RESIZE_SCHEMA = (
    "doc_id long, source string, media_type string, width int, "
    "height int, payload binary"
)


def _bmp_pixels(payload: bytes):
    """Parse an uncompressed 24-bit BMP into (width, height, top-down
    H×W×3 uint8 array in the container's BGR order) — shared by the
    BMP resize fast path and :func:`decode_image_pixels`."""
    import numpy as np

    if len(payload) < 54:
        raise ValueError("truncated BMP: shorter than headers")
    magic, _fs, _r1, _r2, data_offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (dib_size, width, height, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if dib_size < 40:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    if compression == 1:  # BI_RLE8: 8-bit palette + run-length data
        return _bmp_rle8_pixels(payload, dib_size, width, height,
                                data_offset, bpp)
    if compression == 2:  # BI_RLE4: nibble-alternating runs
        return _bmp_rle4_pixels(payload, dib_size, width, height,
                                data_offset, bpp)
    if bpp == 32 and compression in (0, 3):  # BGRX / BI_BITFIELDS
        return _bmp32_pixels(payload, width, height, data_offset,
                             compression, dib_size)
    if compression != 0:
        raise NotImplementedError(
            f"compressed BMP (method {compression}) unsupported"
        )
    if bpp in (1, 4, 8):  # uncompressed paletted variants
        return _bmp_paletted_pixels(payload, dib_size, width, height,
                                    data_offset, bpp)
    if bpp != 24:
        raise NotImplementedError(f"{bpp}-bit BMP unsupported (only 1/4/8/24-bit)")
    top_down = height < 0
    h = -height if top_down else height
    if width <= 0 or h <= 0:
        raise ValueError(f"malformed BMP geometry {width}x{height}")
    stride = width * 3 + (4 - (width * 3) % 4) % 4
    if len(payload) < data_offset + stride * h:
        raise ValueError("truncated BMP: pixel array shorter than geometry")
    rows = np.frombuffer(
        payload, np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)[:, : width * 3].reshape(h, width, 3)
    if not top_down:
        rows = rows[::-1]  # normalize to top-down logical order
    return width, h, rows


def _bmp_rle8_pixels(payload: bytes, dib_size: int, width: int,
                     height: int, data_offset: int, bpp: int = 8):
    """Decode a BI_RLE8 BMP (public BITMAPINFOHEADER spec): 256-entry
    BGRA palette, bottom-up rows, encoded runs (count, index), and the
    escape codes — 0 end-of-line, 1 end-of-bitmap, 2 delta (dx, dy),
    n≥3 absolute literal indexes padded to even length. Returns the
    same (width, height, top-down BGR array) contract as the
    uncompressed path, so stats, pixel access, and resize all work."""
    import numpy as np

    if bpp != 8:
        raise ValueError(f"BI_RLE8 requires 8-bit pixels, got {bpp}")
    if height < 0:
        raise ValueError("BI_RLE8 BMPs are bottom-up by spec")
    if width <= 0 or height <= 0:
        raise ValueError(f"malformed BMP geometry {width}x{height}")
    h = height
    # biClrUsed (header offset 46): a spec-valid file may store fewer
    # than 256 palette entries
    (clr_used,) = struct.unpack_from("<I", payload, 46)
    n_pal = clr_used or 256
    pal_at = 14 + dib_size
    if pal_at + n_pal * 4 > data_offset or n_pal > 256:
        raise ValueError("RLE8 BMP: palette truncated")
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[:n_pal] = np.frombuffer(payload, np.uint8, count=n_pal * 4,
                                offset=pal_at).reshape(n_pal, 4)[:, :3]
    idx = np.zeros((h, width), dtype=np.uint8)
    x = y = 0  # bottom-up coordinates: y 0 = bottom row
    pos = data_offset
    ended = False
    while pos + 2 <= len(payload):
        n, v = payload[pos], payload[pos + 1]
        pos += 2
        if n:  # encoded run
            if y >= h or x + n > width:
                raise ValueError("RLE8 BMP: run overflows its row")
            idx[y, x:x + n] = v
            x += n
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            ended = True
            break
        elif v == 2:  # delta: skipped cells keep index 0
            if pos + 2 > len(payload):
                raise ValueError("RLE8 BMP: truncated delta escape")
            x += payload[pos]
            y += payload[pos + 1]
            pos += 2
            if x > width or y > h:
                raise ValueError("RLE8 BMP: delta escape leaves the image")
        else:  # absolute mode: v literal indexes, padded to even
            if y >= h or x + v > width:
                raise ValueError("RLE8 BMP: absolute run overflows its row")
            end = pos + v
            if end > len(payload):
                raise ValueError("RLE8 BMP: truncated absolute run")
            idx[y, x:x + v] = np.frombuffer(payload, np.uint8, count=v,
                                            offset=pos)
            x += v
            pos = end + (v & 1)
    if not ended:
        raise ValueError("RLE8 BMP: missing end-of-bitmap escape")
    if n_pal < 256 and int(idx.max(initial=0)) >= n_pal:
        raise ValueError("RLE8 BMP: pixel index beyond the palette")
    bgr = pal[idx][::-1]  # bottom-up → top-down
    return width, h, np.ascontiguousarray(bgr)


def _bmp_rle4_pixels(payload: bytes, dib_size: int, width: int,
                     height: int, data_offset: int, bpp: int = 4):
    """Decode a BI_RLE4 BMP (the 16-color run-length layout): encoded
    packets (count, value) paint count pixels ALTERNATING the value
    byte's high and low nibbles; absolute packets hold n literal
    nibbles packed high-first and padded to a WORD boundary; the
    0/1/2 escapes match RLE8. Same (width, height, top-down BGR)
    contract as every other BMP path."""
    import numpy as np

    if bpp != 4:
        raise ValueError(f"BI_RLE4 requires 4-bit pixels, got {bpp}")
    if height < 0:
        raise ValueError("BI_RLE4 BMPs are bottom-up by spec")
    if width <= 0 or height <= 0:
        raise ValueError(f"malformed BMP geometry {width}x{height}")
    h = height
    (clr_used,) = struct.unpack_from("<I", payload, 46)
    n_pal = clr_used or 16
    pal_at = 14 + dib_size
    if pal_at + n_pal * 4 > data_offset or n_pal > 16:
        raise ValueError("RLE4 BMP: palette truncated")
    pal = np.zeros((16, 3), dtype=np.uint8)
    pal[:n_pal] = np.frombuffer(payload, np.uint8, count=n_pal * 4,
                                offset=pal_at).reshape(n_pal, 4)[:, :3]
    idx = np.zeros((h, width), dtype=np.uint8)
    x = y = 0  # bottom-up coordinates
    pos = data_offset
    ended = False
    while pos + 2 <= len(payload):
        n, v = payload[pos], payload[pos + 1]
        pos += 2
        if n:  # encoded run: alternate the two nibbles
            if y >= h or x + n > width:
                raise ValueError("RLE4 BMP: run overflows its row")
            hi, lo = v >> 4, v & 0x0F
            for i in range(n):
                idx[y, x + i] = hi if i % 2 == 0 else lo
            x += n
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            ended = True
            break
        elif v == 2:  # delta
            if pos + 2 > len(payload):
                raise ValueError("RLE4 BMP: truncated delta escape")
            x += payload[pos]
            y += payload[pos + 1]
            pos += 2
            if x > width or y > h:
                raise ValueError("RLE4 BMP: delta escape leaves the image")
        else:  # absolute mode: v literal nibbles, word-aligned
            if y >= h or x + v > width:
                raise ValueError("RLE4 BMP: absolute run overflows its row")
            nbytes = (v + 1) // 2
            end = pos + nbytes + (nbytes & 1)
            if end > len(payload):
                raise ValueError("RLE4 BMP: truncated absolute run")
            for i in range(v):
                b = payload[pos + i // 2]
                idx[y, x + i] = (b >> 4) if i % 2 == 0 else (b & 0x0F)
            x += v
            pos = end
    if not ended:
        raise ValueError("RLE4 BMP: missing end-of-bitmap escape")
    if n_pal < 16 and int(idx.max(initial=0)) >= n_pal:
        raise ValueError("RLE4 BMP: pixel index beyond the palette")
    bgr = pal[idx][::-1]  # bottom-up → top-down
    return width, h, np.ascontiguousarray(bgr)


def encode_bmp_rle4(width: int, height: int, a: int, b: int,
                    base: int) -> bytes:
    """Build a real BI_RLE4 BMP over the grayscale i*17 palette: even
    logical rows are ONE encoded run alternating nibbles (a, b); odd
    rows are absolute-mode literals of the gradient ``base + x``
    (word-padded) — both packet families plus EOL/EOD in every file.
    Closed-form mean: 17 * (ceil(h/2)*(ceil(w/2)*a + floor(w/2)*b)
    + floor(h/2)*(w*base + w(w-1)/2)) / (w*h)."""
    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")
    if not (0 <= a <= 15 and 0 <= b <= 15 and
            0 <= base and base + width - 1 <= 15):
        raise ValueError("RLE4 nibble values exceed 4 bits")
    data = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up storage order
        if y % 2 == 0:  # encoded runs (≤255 pixels per packet)
            x = 0
            while x < width:
                n = min(255, width - x)
                # alternation restarts per packet; keep parity by
                # swapping the pair when x is odd
                pair = (a, b) if x % 2 == 0 else (b, a)
                data += bytes([n, (pair[0] << 4) | pair[1]])
                x += n
        else:  # absolute-mode gradient
            x = 0
            while x < width:
                n = min(255, width - x)
                if n < 3:  # absolute packets need n >= 3
                    for i in range(n):
                        data += bytes([1, (base + x + i) << 4])
                else:
                    nibbles = [base + x + i for i in range(n)]
                    if len(nibbles) % 2:
                        nibbles.append(0)
                    packed = bytes((nibbles[i] << 4) | nibbles[i + 1]
                                   for i in range(0, len(nibbles), 2))
                    data += bytes([0, n]) + packed
                    if len(packed) % 2:
                        data += b"\x00"  # word alignment
                x += n
        data += b"\x00\x00"  # end of line
    data += b"\x00\x01"  # end of bitmap
    pal = bytes(v for i in range(16) for v in (i * 17, i * 17, i * 17, 0))
    data_offset = 14 + 40 + len(pal)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 4, 2,
                       len(data), 0, 0, 16, 0)
    head = struct.pack("<2sIHHI", b"BM", data_offset + len(data), 0, 0,
                       data_offset)
    return head + info + pal + bytes(data)


def rle4_bmp_params(doc_id: int) -> tuple[int, int, int, int, int]:
    """Ground-truth (width, height, a, b, base) for a synthesized RLE4
    BMP — geometry keeps the gradient inside a nibble."""
    w = 2 + doc_id % 10          # ≤ 11, so base ≤ 4 keeps base+w-1 ≤ 14
    return w, 1 + doc_id % 5, doc_id % 8, (doc_id + 3) % 8, doc_id % 5


def encode_bmp_rle8(width: int, height: int, base_value: int = 0) -> bytes:
    """Build a real BI_RLE8 BMP: grayscale BGRA palette; even logical
    rows are one encoded run of ``base_value`` and odd rows are
    absolute-mode literals of the gradient ``base + x`` — both packet
    families plus the EOL/EOD escapes appear in every file. Mean has
    the closed form sum/(w·h) with
    sum = ceil(h/2)·w·base + floor(h/2)·(w·base + w(w-1)/2)."""
    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")
    if not 0 <= base_value <= 255 - max(0, width - 1):
        raise ValueError("gradient exceeds a byte; lower base_value")
    data = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up storage order
        if y % 2 == 0:  # logical even row: encoded runs
            x = 0
            while x < width:
                n = min(255, width - x)
                data += bytes([n, base_value])
                x += n
        else:  # logical odd row: absolute-mode gradient
            x = 0
            while x < width:
                n = min(255, width - x)
                if n < 3:  # absolute packets need n >= 3: tiny tails
                    for i in range(n):
                        data += bytes([1, base_value + x + i])
                else:
                    data += bytes([0, n]) + bytes(
                        base_value + x + i for i in range(n))
                    if n & 1:
                        data += b"\x00"
                x += n
        data += b"\x00\x00"  # end of line
    data += b"\x00\x01"  # end of bitmap
    pal = bytes(v for i in range(256) for v in (i, i, i, 0))
    data_offset = 14 + 40 + len(pal)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8, 1,
                       len(data), 0, 0, 256, 0)
    head = struct.pack("<2sIHHI", b"BM", data_offset + len(data), 0, 0,
                       data_offset)
    return head + info + pal + bytes(data)


def rle_bmp_params(doc_id: int) -> tuple[int, int, int]:
    """Ground-truth (width, height, base) for a synthesized RLE8 BMP."""
    return 3 + doc_id % 13, 1 + doc_id % 7, doc_id % 200


def _bmp_paletted_pixels(payload: bytes, dib_size: int, width: int,
                         height: int, data_offset: int, bpp: int):
    """Decode an UNCOMPRESSED paletted BMP (1/4/8 bits per pixel — the
    most common BMP variants in the wild): BGRA palette of biClrUsed
    (or 2^bpp) entries, MSB-first bit packing inside each byte for the
    sub-byte depths, 4-byte row stride, bottom-up or top-down. Returns
    the (width, height, top-down BGR array) contract shared with the
    24-bit and RLE8 paths."""
    import numpy as np

    top_down = height < 0
    h = -height if top_down else height
    if width <= 0 or h <= 0:
        raise ValueError(f"malformed BMP geometry {width}x{height}")
    (clr_used,) = struct.unpack_from("<I", payload, 46)
    n_pal = clr_used or (1 << bpp)
    pal_at = 14 + dib_size
    if n_pal > (1 << bpp) or pal_at + n_pal * 4 > data_offset:
        raise ValueError("paletted BMP: palette truncated")
    pal = np.zeros((1 << bpp, 3), dtype=np.uint8)
    pal[:n_pal] = np.frombuffer(payload, np.uint8, count=n_pal * 4,
                                offset=pal_at).reshape(n_pal, 4)[:, :3]
    stride = ((width * bpp + 31) // 32) * 4
    if len(payload) < data_offset + stride * h:
        raise ValueError("truncated BMP: pixel array shorter than geometry")
    rows = np.frombuffer(payload, np.uint8, count=stride * h,
                         offset=data_offset).reshape(h, stride)
    if bpp == 8:
        idx = rows[:, :width]
    elif bpp == 4:
        nibbles = np.empty((h, stride * 2), dtype=np.uint8)
        nibbles[:, 0::2] = rows >> 4
        nibbles[:, 1::2] = rows & 0x0F
        idx = nibbles[:, :width]
    else:  # 1-bit: MSB-first within each byte
        bits = np.unpackbits(rows, axis=1)
        idx = bits[:, :width]
    if n_pal < (1 << bpp) and int(idx.max(initial=0)) >= n_pal:
        raise ValueError("paletted BMP: pixel index beyond the palette")
    bgr = pal[idx]
    if not top_down:
        bgr = bgr[::-1]
    return width, h, np.ascontiguousarray(bgr)


def encode_bmp_paletted(width: int, height: int, bpp: int,
                        base_value: int = 0,
                        top_down: bool = False) -> bytes:
    """Build a real uncompressed paletted BMP at 1, 4, or 8 bits per
    pixel: grayscale BGRA palette (entry i = i·(255 // (2^bpp − 1))),
    MSB-first sub-byte packing, 4-byte row stride, bottom-up storage
    (or top-down via negative height). The pixel-INDEX pattern is
    depth-specific so the mean stays closed-form in the parameters:

    - 8-bit: the GIF gradient ``base + 7y + 13x`` (validated not to
      wrap) → mean = base + 7(h−1)/2 + 13(w−1)/2;
    - 4-bit: ``base + x + y`` (validated ≤ 15)
      → mean = 17·(base + (w−1)/2 + (h−1)/2);
    - 1-bit: the checkerboard ``(base + x + y) % 2``
      → mean = 255·ones/(w·h)."""
    import numpy as np

    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")
    if bpp not in (1, 4, 8):
        raise ValueError(f"paletted bpp must be 1/4/8, got {bpp}")
    n_pal = 1 << bpp
    scale = 255 // (n_pal - 1)
    y_ix, x_ix = np.mgrid[0:height, 0:width]
    if bpp == 8:
        idx = base_value + 7 * y_ix + 13 * x_ix
    elif bpp == 4:
        idx = base_value + x_ix + y_ix
    else:
        idx = (base_value + x_ix + y_ix) % 2
    if int(idx.max()) >= n_pal or base_value < 0:
        raise ValueError(
            f"index gradient exceeds the {n_pal}-entry palette; "
            "lower base_value or shrink the image")
    idx = idx.astype(np.uint8)
    stride = ((width * bpp + 31) // 32) * 4
    rows = np.zeros((height, stride), dtype=np.uint8)
    if bpp == 8:
        rows[:, :width] = idx
    elif bpp == 4:
        padded = np.zeros((height, stride * 2), dtype=np.uint8)
        padded[:, :width] = idx
        rows[:] = (padded[:, 0::2] << 4) | padded[:, 1::2]
    else:
        padded = np.zeros((height, stride * 8), dtype=np.uint8)
        padded[:, :width] = idx
        rows[:] = np.packbits(padded, axis=1)
    if not top_down:
        rows = rows[::-1]  # bottom-up storage
    pal = bytes(v for i in range(n_pal) for v in
                (i * scale, i * scale, i * scale, 0))
    data = rows.tobytes()
    data_offset = 14 + 40 + len(pal)
    info = struct.pack("<IiiHHIIiiII", 40, width,
                       -height if top_down else height, 1, bpp, 0,
                       len(data), 0, 0, n_pal, 0)
    head = struct.pack("<2sIHHI", b"BM", data_offset + len(data), 0, 0,
                       data_offset)
    return head + info + pal + data


def _bmp32_pixels(payload: bytes, width: int, height: int,
                  data_offset: int, compression: int, dib_size: int):
    """Decode a 32-bit BMP (BGRX under BI_RGB, or BI_BITFIELDS with
    the canonical 8-8-8 masks — the screenshot/compositor layout):
    4 bytes per pixel, rows naturally 4-aligned, the high byte
    (alpha/unused) excluded from the BGR contract. Non-canonical
    bitfield masks stay a loud boundary rather than silently
    mis-channeling."""
    import numpy as np

    if compression == 3:
        # BI_BITFIELDS masks sit at absolute offset 54 in BOTH layouts
        # real files use: appended after a 40-byte BITMAPINFOHEADER,
        # or embedded at DIB offset 40 in the V4/V5 headers
        if len(payload) < 54 + 12:
            raise ValueError("BMP: BI_BITFIELDS without mask fields")
        r_m, g_m, b_m = struct.unpack_from("<III", payload, 54)
        if (r_m, g_m, b_m) != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise NotImplementedError(
                f"BMP: bitfield masks {r_m:#x}/{g_m:#x}/{b_m:#x} "
                "unsupported (only canonical 8-8-8 BGRX)")
    top_down = height < 0
    h = -height if top_down else height
    if width <= 0 or h <= 0:
        raise ValueError(f"malformed BMP geometry {width}x{height}")
    need = data_offset + width * h * 4
    if len(payload) < need:
        raise ValueError("truncated BMP: pixel array shorter than geometry")
    rows = np.frombuffer(payload, np.uint8, count=width * h * 4,
                         offset=data_offset).reshape(h, width, 4)
    bgr = rows[:, :, :3]
    if not top_down:
        bgr = bgr[::-1]
    return width, h, np.ascontiguousarray(bgr)


def encode_bmp32(width: int, height: int, pixel_value: int,
                 top_down: bool = False,
                 bitfields: bool = False) -> bytes:
    """Build a 32-bit BMP whose every BGR byte equals ``pixel_value``
    (X byte = 0xAA, which decode must IGNORE): BI_RGB, or
    BI_BITFIELDS with the canonical masks appended after the 40-byte
    DIB header the way real writers emit them."""
    if width <= 0 or height <= 0 or not 0 <= pixel_value <= 255:
        raise ValueError("width/height must be positive, pixel_value a byte")
    px = bytes([pixel_value] * 3 + [0xAA]) * (width * height)
    masks = struct.pack("<III", 0x00FF0000, 0x0000FF00, 0x000000FF) \
        if bitfields else b""
    data_offset = 14 + 40 + len(masks)
    info = struct.pack("<IiiHHIIiiII", 40, width,
                       -height if top_down else height, 1, 32,
                       3 if bitfields else 0, len(px), 0, 0, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", data_offset + len(px), 0, 0,
                       data_offset)
    return head + info + masks + px


def pal_bmp_params(doc_id: int) -> tuple[int, int, int, int, bool]:
    """Ground-truth (bpp, width, height, base, top_down) for a
    synthesized paletted BMP — depth cycles 8/4/1 by ``doc_id % 3``,
    orientation flips by parity, and each depth's geometry keeps its
    index pattern inside the palette."""
    kind = doc_id % 3
    if kind == 0:   # 8-bit: gradient peak ≤ 31 + 7·6 + 13·14 = 255
        return 8, 3 + doc_id % 13, 1 + doc_id % 7, doc_id % 32, \
            bool(doc_id % 2)
    if kind == 1:   # 4-bit: peak ≤ 5 + 5 + 4 = 14 ≤ 15
        return 4, 1 + doc_id % 6, 1 + doc_id % 5, doc_id % 6, \
            bool(doc_id % 2)
    return 1, 3 + doc_id % 13, 1 + doc_id % 7, doc_id % 2, \
        bool(doc_id % 2)


def _nn_gather(rows, out_w: int, out_h: int):
    """Nearest-neighbor index gather: source index = floor(i·src/dst)."""
    import numpy as np

    h, w = rows.shape[:2]
    ri = (np.arange(out_h, dtype=np.int64) * h) // out_h
    ci = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return rows[ri][:, ci]


def resize_bmp(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resample of a BMP (uncompressed 24-bit or
    BI_RLE8 palette) to ``out_w × out_h`` — a REAL resize over real
    pixels, dependency-free (numpy index gather, no imaging library).
    Handles bottom-up and top-down inputs (output is canonical
    bottom-up 24-bit), strips/re-derives row padding. Other
    compression methods and bit depths raise the same documented
    container constraint as :func:`decode_bmp`."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError("resize dimensions must be positive")
    width, h, rows = _bmp_pixels(payload)
    out = _nn_gather(rows, out_w, out_h)  # (out_h, out_w, 3) BGR
    # rows are in the container's BGR order: flip so the shared
    # RGB writer flips them back — a byte-identical round trip
    return _bmp_from_rgb(out[:, :, ::-1])


def resize_image(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resample of ANY built-in-decodable image
    (BMP/PNG/GIF/JPEG) to a canonical ``out_w × out_h`` 24-bit BMP —
    the mixed-format-corpus normalization step before a vision
    encoder: whatever arrived, one fixed container and geometry comes
    out."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError("resize dimensions must be positive")
    f = detect_media_format(payload, "image")
    if f is not None and f.name == "bmp":
        return resize_bmp(payload, out_w, out_h)  # no channel shuffle
    _w, _h, rgb = decode_image_pixels(payload)
    return _bmp_from_rgb(_nn_gather(rgb, out_w, out_h))


def resize_images(
    df: DataFrame, width: int, height: int, payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched image resize over a MIXED-FORMAT binary payload
    column: every built-in-decodable payload (BMP/PNG/GIF/JPEG) re-
    emerges as a canonical ``width × height`` 24-bit BMP — the
    training-data normalization step before a vision encoder, with the
    container normalized along with the geometry (``media_type`` in
    the output is always ``image/bmp``). Same plumbing discipline as
    the decoders — mapInPandas over whole Arrow batches, per-payload
    work inside the worker, only the resized bytes cross the boundary.
    Unrecognized payloads raise loudly (never silent nulls)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "media_type": "image/bmp",  # canonical output
                    "width": width,
                    "height": height,
                    "payload": [
                        resize_image(p, width, height)
                        for p in pdf[payload_col]
                    ],
                }
            )

    return df.mapInPandas(run, RESIZE_SCHEMA)


RESAMPLE_SCHEMA = (
    "doc_id long, source string, sample_rate int, n_frames long, "
    "payload binary"
)


def resample_wav(payload: bytes, out_rate: int) -> bytes:
    """Nearest-neighbor rate conversion of 16-bit PCM audio to
    ``out_rate`` Hz — real samples in, real samples out, dependency-
    free (numpy frame-index gather; channels preserved, frame count
    scales by out_rate/in_rate). Accepts WAV or FLAC input; the output
    container is always canonical PCM WAV (the audio analog of the
    resize tier's canonical BMP). The training-data normalization step
    before an audio encoder that expects one fixed rate. Non-PCM,
    non-16-bit, or unrecognized inputs raise the documented container
    constraint."""
    import numpy as np

    if out_rate <= 0:
        raise ValueError("out_rate must be positive")
    if bytes(payload[:4]) == b"OggS":
        # Ogg transport: reassemble the native stream (the shared
        # mapping helper raises for Vorbis/Opus), then fall through to
        # the FLAC branch
        payload = _ogg_flac_native(bytes(payload))
    if bytes(payload[:4]) == b"fLaC":
        in_rate, channels, bps, pcm = _flac_pcm(bytes(payload))
        if bps != 16:
            raise NotImplementedError(
                f"{bps}-bit FLAC resample unsupported (only 16-bit)")
        if in_rate <= 0 or channels <= 0:
            raise ValueError(
                f"malformed FLAC: sample_rate={in_rate}, channels={channels}")
        frames = np.asarray(pcm, dtype=np.int64).reshape(-1, channels)
        n_in = frames.shape[0]
        n_out = max(0, (n_in * out_rate) // in_rate)
        fi = (np.arange(n_out, dtype=np.int64) * in_rate) // out_rate
        out = frames[fi] if n_out else frames[:0]
        raw = out.astype("<i2").tobytes()
        fmt = struct.pack("<HHIIHH", 1, channels, out_rate,
                          out_rate * channels * 2, channels * 2, 16)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(raw)) + raw)
        return b"RIFF" + struct.pack("<I", len(body)) + body
    meta = decode_wav(payload)  # validates format, walks chunks
    in_rate, channels = meta["sample_rate"], meta["channels"]
    if in_rate <= 0 or channels <= 0:
        # decode_wav tolerates a degenerate fmt chunk (stats of an
        # empty signal); a rate conversion cannot — fail as the
        # documented constraint, not a ZeroDivisionError mid-batch
        raise ValueError(
            f"malformed WAV: sample_rate={in_rate}, channels={channels}"
        )
    # re-walk for the raw data chunk (decode_wav returns stats only)
    pos, end = 12, len(payload)
    data = b""
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        if cid == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos = pos + 8 + size + (size % 2)
    frames = np.frombuffer(
        data, np.int16, count=(len(data) // (2 * channels)) * channels
    ).reshape(-1, channels)
    n_in = frames.shape[0]
    n_out = max(0, (n_in * out_rate) // in_rate)
    fi = (np.arange(n_out, dtype=np.int64) * in_rate) // out_rate
    out = frames[fi] if n_out else frames[:0]
    raw = out.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, out_rate,
                      out_rate * channels * 2, channels * 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def resample_audio(
    df: DataFrame, sample_rate: int, payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched audio resample over a binary payload column —
    the audio twin of :func:`resize_images`, same plumbing
    discipline."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            outs = [resample_wav(p, sample_rate) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "sample_rate": sample_rate,
                    "n_frames": [decode_wav(o)["n_units"] for o in outs],
                    "payload": outs,
                }
            )

    return df.mapInPandas(run, RESAMPLE_SCHEMA)
