"""Multimodal column plumbing: opaque binary media + typed metadata.

No media libraries exist in this environment, so the *decode* step is stubbed
(deterministic fake behind ``decode_image_stub``; the real-library path raises
NotImplementedError) — but the Spark-side plumbing is real and tested:
schema, partition-preserving ``mapInPandas`` batching, Arrow binary transfer,
and the feature-extraction contract a cluster deployment would drop a real
decoder into.

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


def decode_image_real(payload: bytes) -> np.ndarray:
    """Real decode path — requires an image library not present here."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "media decode requires Pillow/libvips on the cluster; "
            "this sandbox ships none — use decode_image_stub") from e
    raise NotImplementedError("real decode wiring is cluster-deployment work")


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
