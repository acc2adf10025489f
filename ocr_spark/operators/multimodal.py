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
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
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
    StructField("feat", DoubleType()),
])


def extract_features(df: DataFrame, id_col: str = "doc_id",
                     blob_col: str = "blob", n_dims: int | None = None,
                     round_to: int = 4) -> DataFrame:
    """Feature extraction through the REAL model: decode the blob as
    UTF-8 text and run the seeded from-scratch numpy MLP
    (:class:`ocr_spark.operators.embedding.MLPFeaturizer`, the
    per-executor lazy singleton — SURVEY.md S8, the reference's
    loaded-once + batch-predict pattern, /root/reference/
    hebrew-letter-segmentation.py:146, func.py:34-60), emitting
    (doc_id, dim, feat) rows, ``feat`` rounded to ``round_to``.
    ``n_dims`` (<= the model's dim_out) keeps only the leading dims.
    Values are engine-portable (embedding module contract), so the
    DuckDB oracle verifies them via
    :func:`ocr_spark.operators.embedding.sql_feature_rows`."""
    from ocr_spark.operators.embedding import DIM_OUT, get_mlp

    n_keep = DIM_OUT if n_dims is None else n_dims
    if n_keep > DIM_OUT:
        raise ValueError(f"n_dims {n_keep} > model dim_out {DIM_OUT}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = get_mlp()
        for pdf in batches:
            model.n_batches += 1
            texts = [bytes(b).decode("utf-8", errors="replace")
                     if b is not None else ""
                     for b in pdf[blob_col]]
            E = model.embed(texts)
            rows = []
            for r, doc_id in enumerate(pdf[id_col]):
                for j in range(n_keep):
                    rows.append((int(doc_id), j + 1, float(E[r, j])))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    # round JVM-side (F.round == DuckDB round, half away from zero);
    # Python's round() is half-to-even and would diverge on exact ties
    return (df.select(id_col, blob_col).mapInPandas(run, FEATURE_SCHEMA)
            .withColumn("feat", F.round("feat", round_to)))


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
        # report the driver's (0, {}) instead of the worker state.
        from ocr_spark.operators import embedding as E
        for _ in batches:
            pass
        yield pd.DataFrame(
            [(os.getpid(), E._MODEL_INITS,
              sum(m.n_batches for m in E._MODELS.values()))],
            columns=[f.name for f in WORKER_STATS_SCHEMA.fields])

    return (spark.range(n_tasks).repartition(n_tasks)
            .mapInPandas(run, WORKER_STATS_SCHEMA))
