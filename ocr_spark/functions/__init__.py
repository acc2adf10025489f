"""Column-expression helpers (pure Catalyst expressions, no UDFs)."""

from ocr_spark.functions.bucketing import (  # noqa: F401
    host_of, salted_partition_key, url_bucket,
)
