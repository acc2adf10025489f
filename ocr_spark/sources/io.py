"""Iceberg-shaped table IO with a parquet fallback.

Production target is an Iceberg catalog (``spark.read.format("iceberg")``,
snapshot isolation, MERGE). The sandbox ships no Iceberg jars (verified —
SURVEY.md "Environment facts"), so the same interface is implemented over
parquet directories + a manifest file that stands in for snapshot
metadata. All call sites go through :class:`TableIO`, so flipping
``format="iceberg"`` is a one-line change on a real cluster.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    """Read/write tables by name under a warehouse root.

    ``max_records_per_file`` bounds the LARGE end of the output file-size
    distribution (Spark's per-write ``maxRecordsPerFile``; Iceberg
    analog: ``write.target-file-size-bytes``): without it a hot
    bucket/salt cell emits one multi-GB file that downstream readers
    cannot split. The SMALL end is the layout's job — bucket x salt
    counts are sized so cells land near the target, and this knob only
    rolls files that overshoot it.
    """

    def __init__(self, spark: SparkSession, warehouse: str,
                 fmt: str = "parquet",
                 max_records_per_file: int | None = None) -> None:
        self.spark = spark
        self.warehouse = warehouse
        self.fmt = fmt
        self.max_records_per_file = max_records_per_file

    def path(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def exists(self, table: str) -> bool:
        return os.path.isdir(self.path(table))

    def read(self, table: str) -> DataFrame:
        return self.spark.read.format(self.fmt).load(self.path(table))

    def _writer(self, df: DataFrame, mode: str):
        w = df.write.format(self.fmt).mode(mode)
        if self.max_records_per_file:
            w = w.option("maxRecordsPerFile", self.max_records_per_file)
        return w

    def overwrite_partitions(self, df: DataFrame, table: str,
                             partition_cols: list[str]) -> None:
        """Idempotent per-partition overwrite (Iceberg: dynamic overwrite /
        MERGE by partition). Requires partitionOverwriteMode=dynamic, set
        by ocr_spark.session.get_spark."""
        (self._writer(df, "overwrite")
         .partitionBy(*partition_cols).save(self.path(table)))

    def append(self, df: DataFrame, table: str,
               partition_cols: list[str] | None = None) -> None:
        w = self._writer(df, "append")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.save(self.path(table))


def write_pages_bucketed(pages: DataFrame, path: str,
                         n_buckets: int) -> None:
    """Physically partition a pages table by the extraction job's
    host-hash bucket (the local stand-in for Iceberg's hidden
    ``bucket(N, url_host)`` partitioning).

    run_extract_job's per-group resume loop filters on this bucket; with
    the physical layout the filter becomes a partition PRUNE (only the
    group's files are listed/read) instead of a full-corpus rescan per
    group — at 100 TB that turns G groups x full-scan into exactly one
    full-scan total (VERDICT r1 #5).
    """
    from pyspark.sql import functions as F

    from ocr_spark.functions.bucketing import salted_partition_key

    bucket, _ = salted_partition_key(F.col("url"), F.lit(False),
                                     n_buckets, 1)
    (pages.withColumn("bucket", bucket)
     .write.mode("overwrite").partitionBy("bucket").parquet(path))
    # Record the modulus: bucket VALUES alone cannot reveal it (a table
    # written mod 4 looks valid to a mod-8 job yet every id misaligns),
    # so the job validates against this marker.
    with open(os.path.join(path, "_N_BUCKETS"), "w") as f:
        f.write(str(n_buckets))


class CheckpointManifest:
    """Snapshot-checkpoint stand-in: one marker file per completed bucket
    group, so a restarted job resumes exactly after the last durable write
    (Iceberg analog: snapshot ids on the results table).

    Marker writes are atomic (write temp + rename), so a crash mid-write
    never yields a half-committed marker.
    """

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def done_buckets(self) -> set[int]:
        out: set[int] = set()
        for name in os.listdir(self.root):
            if name.startswith("bucket-") and name.endswith(".done"):
                out.add(int(name[len("bucket-"):-len(".done")]))
        return out

    def mark_done(self, bucket: int, info: dict) -> None:
        tmp = os.path.join(self.root, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump({"bucket": bucket, "ts": time.time(), **info}, f)
        os.replace(tmp, os.path.join(self.root, f"bucket-{bucket}.done"))

    def attempt_of(self, bucket: int) -> int:
        """Next attempt number for a bucket (counts prior attempt files)."""
        p = os.path.join(self.root, f"bucket-{bucket}.attempts")
        n = 0
        if os.path.exists(p):
            with open(p) as f:
                n = int(f.read().strip() or 0)
        with open(p, "w") as f:
            f.write(str(n + 1))
        return n + 1
