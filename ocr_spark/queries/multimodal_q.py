"""Multimodal plumbing query: binary media column -> typed metadata via
mapInPandas (deterministic fake decode; real plumbing). The oracle mirrors
the fake decode arithmetic so values are verified."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators.embedding import sql_feature_rows
from ocr_spark.operators.multimodal import (
    decode_media_meta, extract_features, resize_meta, sample_frames,
)
from ocr_spark.queries import QuerySpec, load

QUERIES: list[QuerySpec] = []


def _pages(spark, sf):
    return load(spark, sf, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("blob"))


def _spark(spark, sf):
    return decode_media_meta(_pages(spark, sf), "doc_id", "blob")


QUERIES.append(QuerySpec(
    "multimodal_decode_meta",
    _spark,
    "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
    "CAST(octet_length(encode(text)) % 640 + 16 AS INT) AS width, "
    "CAST((octet_length(encode(text)) // 7) % 480 + 16 AS INT) AS height, "
    "CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS n_frames, "
    "CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'image' "
    "ELSE 'video' END AS kind FROM documents",
    "multimodal: Arrow-batched mapInPandas decode plumbing (stubbed codec)",
))

# Shared CTE: the fake-decoded dims (mirror of _decode_image_bytes).
_DIMS_CTE = (
    "WITH m AS (SELECT doc_id, "
    "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
    "CAST(octet_length(encode(text)) % 640 + 16 AS INT) AS width, "
    "CAST((octet_length(encode(text)) // 7) % 480 + 16 AS INT) AS height, "
    "CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS n_frames "
    "FROM documents) "
)


def _resize_spark(spark, sf):
    return resize_meta(_pages(spark, sf), "doc_id", "blob", target=224)


QUERIES.append(QuerySpec(
    "multimodal_resize",
    _resize_spark,
    _DIMS_CTE +
    "SELECT doc_id, width, height, "
    "CAST(CASE WHEN greatest(width, height) <= 224 THEN width "
    "ELSE (width * 224) // greatest(width, height) END AS INT) AS resized_w, "
    "CAST(CASE WHEN greatest(width, height) <= 224 THEN height "
    "ELSE (height * 224) // greatest(width, height) END AS INT) AS resized_h "
    "FROM m",
    "multimodal: long-side integer downscale plumbing (mapInPandas)",
))


def _frames_spark(spark, sf):
    return sample_frames(_pages(spark, sf), "doc_id", "blob", stride=7)


QUERIES.append(QuerySpec(
    "multimodal_frame_sample",
    _frames_spark,
    _DIMS_CTE +
    "SELECT doc_id, CAST(unnest(range(0, n_frames, 7)) AS INT) AS frame_idx, "
    "CAST(n_bytes // n_frames AS BIGINT) AS frame_bytes FROM m",
    "multimodal: video frame sampling — 1 blob -> n rows (UDTF shape via "
    "mapInPandas)",
))


def _features_spark(spark, sf):
    return extract_features(_pages(spark, sf), "doc_id", "blob", n_dims=8)


QUERIES.append(QuerySpec(
    "multimodal_feature_extract",
    _features_spark,
    sql_feature_rows("documents", "doc_id", "text", n_dims=8),
    "multimodal: per-blob feature extraction through the REAL model — "
    "seeded from-scratch numpy MLP (relu, hashed char-trigram features) "
    "as the per-executor lazy singleton; oracle replays the identical "
    "forward pass in SQL (bit-exact: IEEE-only ops, pinned fold order)",
))
