"""Multimodal plumbing query: binary media column -> typed metadata via
mapInPandas (deterministic fake decode; real plumbing). The oracle mirrors
the fake decode arithmetic so values are verified."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators.multimodal import decode_media_meta
from ocr_spark.queries import QuerySpec, load

QUERIES: list[QuerySpec] = []


def _spark(spark, sf):
    d = load(spark, sf, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("blob"))
    return decode_media_meta(d, "doc_id", "blob")


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
