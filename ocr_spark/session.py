"""SparkSession construction with scale-aware defaults.

Tunings and why (SURVEY.md §4, §7 "Hard parts"):
  * arrow.maxRecordsPerBatch=256 — the default 10k rows/batch would
    materialize GBs per Arrow batch inside the Python worker for blob
    columns (OOM at scale); 256 rows x ~100 KB avg ≈ 25 MB per batch.
    Measured: 256 beats 64 by ~15% at local[16] (fewer batch-boundary
    stalls in the JVM<->worker pipeline) and 1024 is slightly worse.
    The per-batch byte worst case is additionally bounded by the scan
    split size (files.maxPartitionBytes): one task's batches can never
    exceed its split's data.
  * files.maxPartitionBytes=32m (vs 128m default) — byte-balanced scan
    splits are what load-balances the narrow extraction stage (document
    sizes are wildly heterogeneous; hash keys cannot balance bytes).
  * AQE on (coalesce partitions + skew join) — runtime re-plan is the
    first line of defense against skewed shuffles.
  * shuffle.partitions default 32 locally; on a real cluster set to
    2-3x total cores via spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH_ROWS = 256


def get_spark(
    app_name: str = "ocr_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = ARROW_BATCH_ROWS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = cpus if cpus != "*" else os.cpu_count() or 8
        shuffle_partitions = int(n)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(arrow_batch_rows))
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory",
                os.environ.get("OCR_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
