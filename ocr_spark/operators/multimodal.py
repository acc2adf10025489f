"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The real decoders (PIL/ffmpeg/librosa) are NOT in this container, so the
decode step is a deterministic fake behind `_decode_image_bytes` (clearly
marked; raises NotImplementedError when a real codec is requested). The
Spark-side plumbing — schema, batch iteration, partitioning — is real and
tested; swapping in a real codec changes one function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("kind", StringType()),
])


def _decode_image_bytes(data: bytes, real_codec: bool = False) -> dict:
    """DETERMINISTIC FAKE decode: metadata derived from byte length only.

    A real deployment plugs PIL/pyav here; the container has neither, so
    requesting real decoding raises.
    """
    if real_codec:
        raise NotImplementedError(
            "no image/audio codecs in this environment; fake decode only")
    n = len(data)
    return {
        "n_bytes": n,
        "width": n % 640 + 16,
        "height": (n // 7) % 480 + 16,
        "n_frames": n % 30 + 1,
        "kind": "image" if n % 2 == 0 else "video",
    }


def decode_media_meta(df: DataFrame, id_col: str = "doc_id",
                      blob_col: str = "blob") -> DataFrame:
    """binary column -> typed metadata rows via mapInPandas.

    mapInPandas (not a scalar UDF) because real decoders return variable
    per-item payloads (frames) — the 1-group->n-rows shape. Batches arrive
    Arrow-sized per ocr_spark.session (small for big blobs).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                m = _decode_image_bytes(bytes(blob) if blob is not None
                                        else b"")
                m["doc_id"] = int(doc_id)
                metas.append(m)
            yield pd.DataFrame(
                metas, columns=[f.name for f in MEDIA_META_SCHEMA.fields])

    return df.select(id_col, blob_col).mapInPandas(run, MEDIA_META_SCHEMA)


RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("resized_w", IntegerType()),
    StructField("resized_h", IntegerType()),
])


def _resize_dims(w: int, h: int, target: int) -> tuple[int, int]:
    """DETERMINISTIC FAKE resize: integer long-side downscale to `target`
    (never upscale) — the arithmetic a real thumbnailer would do; the
    pixel resample itself would plug in here (PIL absent in container)."""
    long_side = max(w, h)
    if long_side <= target:
        return w, h
    return (w * target) // long_side, (h * target) // long_side


def resize_meta(df: DataFrame, id_col: str = "doc_id",
                blob_col: str = "blob", target: int = 224) -> DataFrame:
    """binary -> (orig dims, resized dims) via mapInPandas; same fake
    decode as decode_media_meta, then long-side integer downscale."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                m = _decode_image_bytes(bytes(blob) if blob is not None
                                        else b"")
                rw, rh = _resize_dims(m["width"], m["height"], target)
                rows.append((int(doc_id), m["width"], m["height"], rw, rh))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return df.select(id_col, blob_col).mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_bytes", LongType()),
])


def sample_frames(df: DataFrame, id_col: str = "doc_id",
                  blob_col: str = "blob", stride: int = 7) -> DataFrame:
    """Video frame sampling plumbing: 1 blob -> n rows (every stride-th
    frame index below the fake-decoded n_frames) — the UDTF shape a real
    ffmpeg frame extractor produces. frame_bytes is the fake per-frame
    payload size (n_bytes // n_frames)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob) if blob is not None else b""
                m = _decode_image_bytes(b)
                per_frame = m["n_bytes"] // m["n_frames"]
                for idx in range(0, m["n_frames"], stride):
                    rows.append((int(doc_id), idx, per_frame))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.select(id_col, blob_col).mapInPandas(run, FRAME_SCHEMA)


FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("dim", IntegerType()),
    StructField("feat", LongType()),
])


def extract_features(df: DataFrame, id_col: str = "doc_id",
                     blob_col: str = "blob", n_dims: int = 8) -> DataFrame:
    """Feature extraction plumbing: blob -> n_dims (doc_id, dim, feat)
    rows. DETERMINISTIC FAKE featurizer (byte-length arithmetic mod a
    prime); a real model forward pass plugs in here as a per-executor
    lazy singleton (SURVEY.md S8)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                n = len(bytes(blob)) if blob is not None else 0
                for j in range(1, n_dims + 1):
                    rows.append((int(doc_id), j, (n * j) % 997))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.select(id_col, blob_col).mapInPandas(run, FEATURE_SCHEMA)
