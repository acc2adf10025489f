"""Structured Streaming analogs of the reference's streaming-shaped loops.

1. Stateful sessionization (the `in_char` open/close state machine over
   x-slices, /root/reference/overflow/test_sliding_window.py:37-92) as a
   `session_window` aggregation with a watermark.
2. Continuous ingestion (the Django POST endpoint, /root/reference/
   ocr_project/ocr_app/views.py:18-26) as an incremental extract: a file-
   source readStream over the pages directory, the SAME extraction UDF,
   foreachBatch append — Trigger.AvailableNow for batch-boundary runs.

Both run with `availableNow` in tests (bounded), and unchanged on a real
cluster with continuous triggers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.plans.extract_job import extract_udf


def streaming_session_counts(
    spark: SparkSession,
    events_path: str,
    out_path: str,
    checkpoint: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> None:
    """Sessionize an event stream: session_window(ts, gap) per user.

    Late data beyond the watermark is dropped (state store stays bounded —
    the at-scale requirement for 10^12-row streams).
    """
    schema = spark.read.parquet(events_path).schema
    stream = (spark.readStream.schema(schema).parquet(events_path))
    sessions = (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("events"),
             F.round(F.sum("value"), 4).alias("total_value"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "events", "total_value")
    )
    q = (sessions.writeStream.outputMode("append")
         .trigger(availableNow=True)
         .option("checkpointLocation", checkpoint)
         .format("parquet").option("path", out_path).start())
    q.awaitTermination()


def run_incremental_extract(
    spark: SparkSession,
    pages_dir: str,
    out_path: str,
    checkpoint: str,
) -> None:
    """Incremental extraction over newly-arrived page files.

    The file source tracks processed files in the checkpoint — the
    streaming twin of the batch manifest resume (new snapshot -> only new
    files extract). Same fused UDF as the batch plan.
    """
    schema = spark.read.parquet(pages_dir).schema
    stream = spark.readStream.schema(schema).parquet(pages_dir)
    res = (stream
           .withColumn("_r", extract_udf(F.col("html"), F.col("lang")))
           .select("url", "warc_ts", "lang",
                   F.col("_r.extracted_text").alias("extracted_text"),
                   F.col("_r.content_kind").alias("content_kind"),
                   F.col("_r.n_blocks").alias("n_blocks")))
    q = (res.writeStream.outputMode("append")
         .trigger(availableNow=True)
         .option("checkpointLocation", checkpoint)
         .format("parquet").option("path", out_path).start())
    q.awaitTermination()
