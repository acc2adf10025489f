"""Loose-file ingestion via Spark's binaryFile source.

SURVEY.md S2: the reference walks class directories, globs image files,
and labels each file by its parent directory name (/root/reference/
hebrew-ocr-cnn.py:69-95). The Spark-native equivalent is the binaryFile
data source with pathGlobFilter + a regexp over the file path for the
label — no driver-side os.walk, scan parallelism and file listing handled
by the source.

At corpus scale this is the on-ramp only (millions of loose WARC/HTML
files land as a table once, then everything downstream reads the table);
the scan is still predicate/projection-prunable on path and length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_labeled_binary_dir(spark: SparkSession, root: str,
                            glob: str = "*.html") -> DataFrame:
    """(path, label, length, content) for files matching ``glob`` under
    ``root``, labeled by parent directory name."""
    df = (spark.read.format("binaryFile")
          .option("pathGlobFilter", glob)
          .option("recursiveFileLookup", "true")
          .load(root))
    label = F.regexp_extract(F.col("path"), r"([^/]+)/[^/]+$", 1)
    return df.select("path", label.alias("label"), "length", "content")


def pages_from_binary_dir(spark: SparkSession, root: str,
                          glob: str = "*.html") -> DataFrame:
    """Adapt loose files to the canonical pages schema
    (url, warc_ts, html, text, lang) so extract_pages can run on them
    directly — the upload/ingest source (SURVEY.md S5) for file drops."""
    df = (spark.read.format("binaryFile")
          .option("pathGlobFilter", glob)
          .option("recursiveFileLookup", "true")
          .load(root))
    return df.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
