"""Driver-facing operator queries (SURVEY.md §2 inventory).

Each QuerySpec pairs a Spark DataFrame callable with the equivalent ANSI
SQL for the DuckDB oracle. Column names/aliases match EXACTLY on both
sides (driver hashes values after sorting columns by name). Computed
floats are rounded to fixed decimals on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None -> non-SQL-expressible; driver does rows-only
    note: str = ""


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def all_queries() -> list[QuerySpec]:
    from ocr_spark.queries import (
        dedup_q, multimodal_q, relational, roundtrip, similarity_q,
        textstats_q,
    )

    out: list[QuerySpec] = []
    for mod in (relational, roundtrip, dedup_q, similarity_q, textstats_q,
                multimodal_q):
        out.extend(mod.QUERIES)
    names = [q.name for q in out]
    assert len(names) == len(set(names)), "duplicate query names"
    return out
