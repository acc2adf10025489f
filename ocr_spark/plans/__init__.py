"""End-to-end job plans (extract pipeline, lineage, resume)."""

from ocr_spark.plans.extract_job import (  # noqa: F401
    extract_pages, run_extract_job,
)
