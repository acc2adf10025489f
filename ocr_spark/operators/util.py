"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin pre-spread for tiny inputs (the extract_pages escape
    hatch, shared): when a scan yields fewer splits than the cluster
    has slots, a per-row-expensive narrow stage (shingling, feature
    extraction) would run nearly serially — so pay one round-robin
    exchange. The shuffle moves the rows' text, but only in exactly the
    regime where the input is small enough for that to be cheap; at
    corpus scale the scan has >> slots splits and this is a no-op, so
    hot paths stay narrow."""
    slots = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < slots:
        return df.repartition(slots)
    return df
