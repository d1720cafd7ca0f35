"""Multimodal column plumbing: opaque binary media + typed metadata.

Decode paths, strongest available first:

- ``decode_image_real``: Pillow when importable (any format it reads), else
  a built-in pure-stdlib PNG decoder (zlib inflate + scanline unfilter,
  8-bit grey/grey+alpha/RGB/RGBA, non-interlaced) — REAL image bytes decode
  even in environments that ship no media library. ``encode_png`` is the
  matching minimal encoder so tests / synthetic pipelines can produce real
  decodable payloads anywhere. Formats beyond that (JPEG, video, audio)
  raise NotImplementedError until the cluster deployment's Pillow/libvips
  is present.
- ``decode_image_stub``: deterministic md5-derived fake, exactly
  reproducible in ANSI SQL — the oracle-checkable contract path.

The Spark-side plumbing is identical for both: schema,
partition-preserving ``mapInPandas`` batching, Arrow binary transfer, and
the feature contract (``image_feature_batch`` is the real-decode
``batch_decode`` for ``extract_features``).

Design for 100 TB: media bytes ride as a ``binary`` column next to metadata;
``mapInPandas`` keeps each Arrow batch bounded
(``spark.sql.execution.arrow.maxRecordsPerBatch``) so executor memory is
independent of corpus size, and the decode stage is a pure map — no shuffle.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("doc_id long, media_type string, byte_len long, "
                "width int, height int, payload binary")

FEATURE_DIM = 8

FEATURES_SCHEMA = ("doc_id long, media_type string, byte_len long, "
                   "feature array<double>")


def synth_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media table from a text corpus: payload =
    md5-derived pseudo-bytes, metadata derived from text length. Stands in
    for e.g. an Iceberg table with image bytes."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col(id_col) % 3 + 1).cast("int")).alias("media_type"),
        F.length(t).cast("long").alias("byte_len"),
        (F.length(t) % 640 + 16).cast("int").alias("width"),
        (F.length(t) % 480 + 16).cast("int").alias("height"),
        F.to_binary(F.md5(t), F.lit("hex")).alias("payload"))


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal stdlib PNG encoder (8-bit, filter 0, non-interlaced;
    grey/grey+alpha/RGB/RGBA by channel count). Exists so tests and
    synthetic pipelines can mint REAL decodable image bytes without any
    media library."""
    import struct
    import zlib
    a = np.ascontiguousarray(np.asarray(arr, dtype=np.uint8))
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _decode_png_builtin(payload: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode: chunk walk → concatenated-IDAT zlib inflate
    → per-scanline unfilter (all five PNG filter types). Supports 8-bit
    grey/grey+alpha/RGB/RGBA, non-interlaced (no palette). Returns HxW
    (grey) or HxWxC uint8."""
    import struct
    import zlib
    if payload[:8] != PNG_SIG:
        raise NotImplementedError("payload is not a PNG")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise NotImplementedError("malformed PNG (missing IHDR/IDAT)")
    w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr)
    if depth != 8 or interlace != 0 or ctype not in (0, 2, 4, 6):
        raise NotImplementedError(
            f"unsupported PNG (depth={depth}, colortype={ctype}, "
            f"interlace={interlace}) — deploy Pillow for full coverage")
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise NotImplementedError("truncated PNG scanline data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = raw[y * (stride + 1):(y + 1) * (stride + 1)]
        ftype = row[0]
        cur = np.frombuffer(row, dtype=np.uint8)[1:].astype(np.int32)
        if ftype == 0:
            pass
        elif ftype == 2:                           # Up — vectorizes
            cur = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):                   # left-dependent: Sub /
            res = np.zeros(stride, dtype=np.int32)  # Average / Paeth
            for i in range(stride):
                a = int(res[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                res[i] = (int(cur[i]) + pred) & 0xFF
            cur = res
        else:
            raise NotImplementedError(f"unknown PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def decode_image_real(payload: bytes) -> np.ndarray:
    """Real decode path: Pillow when importable (any format it reads),
    else the built-in PNG decoder. Non-PNG payloads without Pillow raise
    NotImplementedError (the cluster deployment ships Pillow/libvips;
    nothing here requires it)."""
    try:
        import io

        from PIL import Image
    except ImportError:
        return _decode_png_builtin(bytes(payload))
    return np.asarray(Image.open(io.BytesIO(bytes(payload))))


def image_feature_batch(payloads: "pd.Series") -> "list[np.ndarray]":
    """``batch_decode`` for ``extract_features`` over REAL image payloads:
    decode → luma → nearest-neighbor 8x8 downsample → FEATURE_DIM per-row
    means in [0, 1]. Deterministic, library-free; swap in a model embed on
    the cluster."""
    out = []
    for p in payloads:
        img = decode_image_real(bytes(p)).astype(np.float64)
        luma = img[:, :, :3].mean(axis=2) if img.ndim == 3 else img
        hh, ww = luma.shape
        ys = (np.arange(FEATURE_DIM) * hh) // FEATURE_DIM
        xs = (np.arange(FEATURE_DIM) * ww) // FEATURE_DIM
        small = luma[np.ix_(ys, xs)] / 255.0
        out.append(small.mean(axis=1).astype(np.float64))
    return out


def decode_image_stub(payload: bytes) -> np.ndarray:
    """Deterministic fake decode: feature_j = h60(hex(payload) + ':' + j)
    / 2^60 ∈ [0, 1). Stands in for decode→resize→embed, and is exactly
    reproducible in ANSI SQL (md5 + hex parse — see __spark_entry__)."""
    hx = payload.hex()
    return np.array(
        [int(hashlib.md5(f"{hx}:{j}".encode()).hexdigest()[:15], 16)
         / float(1 << 60) for j in range(FEATURE_DIM)], dtype=np.float64)


def extract_features(media: DataFrame, batch_decode=None) -> DataFrame:
    """mapInPandas feature extraction over the media table. ``batch_decode``
    maps a pd.Series[bytes] → list[np.ndarray]; default = vectorized stub."""

    def default_batch(payloads: pd.Series) -> list[np.ndarray]:
        return [decode_image_stub(p) for p in payloads]

    decode = batch_decode or default_batch

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = decode(pdf["payload"])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(np.int64),
                "media_type": pdf["media_type"],
                "byte_len": pdf["byte_len"].to_numpy(np.int64),
                "feature": [f.tolist() for f in feats],
            })

    return media.mapInPandas(gen, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one row per (doc_id, frame_idx) to
    decode, frames 0, n, 2n, ... bounded by a fake duration derived from
    byte_len. The explode is the real Spark work; actual frame decode is the
    stubbed step above."""
    n_frames = (F.col("byte_len") % 300 + 1).cast("int")
    return (media.filter(F.col("media_type") == "video")
            .select("doc_id", F.explode(
                F.sequence(F.lit(0), n_frames - 1, F.lit(every_n)))
                .alias("frame_idx")))
