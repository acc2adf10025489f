"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction over sf0.001 documents wrapped as
web pages (full tokenizer -> DOM -> classifier -> assembly UDF) and
aggregates per language. ``queries``/``oracle_sql`` expose the SURVEY.md
§2 operator inventory plus the training-data operators (dedup, similarity,
text analysis, multimodal) — each Spark implementation paired with the
equivalent DuckDB SQL, aliases matched column-for-column.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from ocr_spark.plans.extract_job import extract_udf

    sf = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf}/documents.parquet")
    page = F.encode(
        F.concat(
            F.lit('<html><body><nav><a href="/">home</a></nav><article><p>'),
            F.col("text"),
            F.lit('</p></article><footer>(c) corp</footer></body></html>')),
        "utf-8")
    res = d.select("doc_id", "lang",
                   extract_udf(page, F.col("lang")).alias("r"))
    return (res.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.when(F.length("r.extracted_text") > 0, 1).otherwise(0))
        .alias("extracted_docs"),
        F.round(F.avg(F.length("r.extracted_text")), 2)
        .alias("avg_extracted_len"),
        F.sum("r.n_blocks").alias("total_blocks")))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from ocr_spark.queries import all_queries

    return {spec.name: spec.spark for spec in all_queries()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    from ocr_spark.queries import all_queries
    from ocr_spark.queries.golden_q import ensure_fixture

    # j7_golden_alignment's oracle reads a deterministic fixture parquet;
    # materialize it here so DuckDB can run even if the driver evaluates
    # oracles before invoking the Spark side.
    ensure_fixture()
    return {spec.name: spec.sql for spec in all_queries()
            if spec.sql is not None}
