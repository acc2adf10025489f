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
