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


class _StubFeaturizer:
    """Stand-in for a heavy model artifact (weights file, ONNX session...).

    Construction is the expensive step a real model pays once; featurize()
    is the per-batch forward pass. Deterministic byte-length arithmetic so
    the DuckDB oracle can verify outputs.
    """

    def __init__(self) -> None:
        self.n_batches = 0

    def featurize(self, n_bytes: int, n_dims: int) -> list[int]:
        return [(n_bytes * j) % 997 for j in range(1, n_dims + 1)]


# Per-executor lazy singleton (SURVEY.md S8): loaded at most ONCE per
# Python worker process and reused across every Arrow batch and task the
# worker handles (spark.python.worker.reuse). This is the reference's CLI
# pattern — model loaded once, batch predict (/root/reference/
# hebrew-letter-segmentation.py:146, func.py:34-60) — and explicitly NOT
# its web-path bug of reloading the model per request (func.py:202).
_MODEL: _StubFeaturizer | None = None
_MODEL_INITS = 0


def _get_model() -> _StubFeaturizer:
    global _MODEL, _MODEL_INITS
    if _MODEL is None:
        _MODEL = _StubFeaturizer()
        _MODEL_INITS += 1
    return _MODEL


def extract_features(df: DataFrame, id_col: str = "doc_id",
                     blob_col: str = "blob", n_dims: int = 8) -> DataFrame:
    """Feature extraction plumbing: blob -> n_dims (doc_id, dim, feat)
    rows, through the per-executor singleton featurizer (_get_model)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _get_model()
        for pdf in batches:
            model.n_batches += 1
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                n = len(bytes(blob)) if blob is not None else 0
                for j, feat in enumerate(model.featurize(n, n_dims), 1):
                    rows.append((int(doc_id), j, feat))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.select(id_col, blob_col).mapInPandas(run, FEATURE_SCHEMA)


WORKER_STATS_SCHEMA = StructType([
    StructField("pid", LongType()),
    StructField("inits", IntegerType()),
    StructField("batches", LongType()),
])


def worker_model_stats(spark, n_tasks: int = 64) -> DataFrame:
    """Diagnostic: per-Python-worker (pid, model inits, batches served).

    Run AFTER a job that used extract_features (worker reuse keeps module
    globals alive across jobs): every worker that served featurize batches
    must report inits == 1 — the singleton held (tests/test_operators.py).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os
        # Read the WORKER's module instance: cloudpickle snapshots plain
        # global references by value at driver pickle time, which would
        # report the driver's (0, None) instead of the worker state.
        from ocr_spark.operators import multimodal as M
        for _ in batches:
            pass
        yield pd.DataFrame(
            [(os.getpid(), M._MODEL_INITS,
              M._MODEL.n_batches if M._MODEL is not None else 0)],
            columns=[f.name for f in WORKER_STATS_SCHEMA.fields])

    return (spark.range(n_tasks).repartition(n_tasks)
            .mapInPandas(run, WORKER_STATS_SCHEMA))
