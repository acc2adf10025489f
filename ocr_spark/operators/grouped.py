"""Grouped-map (applyInPandas) operators: per-group sequential algorithms
that no window frame can express.

W6 greedy overlap acceptance (SURVEY.md §2.5): the reference's
order-dependent segment dedup (/root/reference/utils.py:244-265) — walk
candidates in a fixed order, accept one iff its interval overlaps every
previously-ACCEPTED interval by at most `max_overlap` of the smaller
width. The accepted set feeds back into later decisions, so this is a
sequential per-group scan — `applyInPandas` per group key, Arrow-batched,
with plain numpy/pandas inside (never per-row Python at the Spark level).

Scale: the shuffle key is the group key; group state is O(accepted) and
processing is O(n * accepted) per group — the same cost envelope as the
reference's per-line scan. Skewed group sizes are an AQE concern only for
the exchange; the per-group algorithm is unavoidable (it IS the spec).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StructField, StructType,
)

ACCEPT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("event_id", LongType()),
    StructField("start", DoubleType()),
    StructField("accepted_rank", IntegerType()),
])


def _overlap_ratio(a0: float, a1: float, b0: float, b1: float) -> float:
    inter = min(a1, b1) - max(a0, b0)
    if inter <= 0:
        return 0.0
    smaller = min(a1 - a0, b1 - b0)
    return inter / smaller if smaller > 0 else 1.0


def greedy_accept_group(pdf: pd.DataFrame, width: float,
                        max_overlap: float) -> pd.DataFrame:
    """Pure-pandas greedy scan for ONE group; also the unit-test oracle."""
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    accepted: list[tuple[float, float]] = []
    rows = []
    for uid, eid, val in zip(pdf["user_id"], pdf["event_id"], pdf["value"]):
        lo, hi = float(val), float(val) + width
        if all(_overlap_ratio(lo, hi, a0, a1) <= max_overlap
               for a0, a1 in accepted):
            accepted.append((lo, hi))
            rows.append((int(uid), int(eid), lo, len(accepted)))
    return pd.DataFrame(
        rows, columns=[f.name for f in ACCEPT_SCHEMA.fields])


def greedy_overlap_accept(events: DataFrame, width: float = 10.0,
                          max_overlap: float = 0.5) -> DataFrame:
    """events(user_id, event_id, ts, value) -> accepted intervals per user.

    Each event claims the interval [value, value + width); events are
    visited in (ts, event_id) order per user (explicit tie-break — the
    reference's greedy dedup left order implicit, SURVEY.md §7
    "determinism").
    """

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return greedy_accept_group(pdf, width, max_overlap)

    return (events.select("user_id", "event_id", "ts", "value")
            .groupBy("user_id")
            .applyInPandas(run, ACCEPT_SCHEMA))
