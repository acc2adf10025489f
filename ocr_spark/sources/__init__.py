"""Table IO layer: iceberg-shaped interface with a parquet fallback."""

from ocr_spark.sources.io import TableIO  # noqa: F401
