"""As-of (point-in-time) join as a single-shuffle DataFrame composition.

For every left row, attach the value columns of the LATEST right row with
``right.ts <= left.ts`` in the same key group — the standard
point-in-time-correct enrichment (market data, feature stores, "state of
X when Y happened"). Spark has no native ASOF JOIN; the scalable
composition is the union-tag trick:

    union(left tagged 1, right tagged 0)
      -> window last(value, ignorenulls) over
         (partition by keys order by ts, tag rowsBetween unbounded, 0)
      -> keep left rows

which is ONE shuffle on the keys followed by an in-partition sort —
exactly the sort-merge work a native as-of join does, with no
per-left-row probe join and no range explosion. Equal timestamps on both
sides match (tag orders right before left), matching DuckDB's
``ASOF JOIN ON l.ts >= r.ts`` oracle semantics.

Right rows duplicated on (keys, ts) are ambiguous for "the" latest value;
pre-aggregate the right side (e.g. max per (keys, ts)) before calling —
the query wrapper does, and the oracle mirrors it.

Skew note: a hot key serializes into one partition's sort. At corpus
scale, range-partition by (key, ts) instead (repartitionByRange) so a hot
key spans partitions, then stitch boundaries by carrying each partition's
last value forward — not needed at driver-testdata scale and noted here
so the single-shuffle claim stays honest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, keys: list[str],
              ts_col: str, value_cols: list[str],
              prefix: str = "asof_") -> DataFrame:
    """left columns + ``<prefix><value_col>`` columns (null when no right
    row precedes the left row in its key group).

    The right side's value columns travel as ONE struct payload, not as
    raw columns: last(ignorenulls) must distinguish "no right row yet"
    (null payload on left-tagged rows) from a right row whose value is
    genuinely NULL (non-null payload, null member) — carrying raw columns
    would silently fall back to an OLDER right row on genuine NULLs, and
    with several value columns could stitch one output row from different
    right rows. The struct also keeps the right row atomic. Right rows
    with NULL timestamps are dropped (``l.ts >= r.ts`` never matches
    NULL), matching the DuckDB ASOF JOIN oracle on both counts.
    """
    lcols = left.columns
    out_names = [f"{prefix}{c}" for c in value_cols]
    clash = set(out_names) & set(lcols)
    if clash:
        raise ValueError(
            f"asof_join output column(s) {sorted(clash)} collide with "
            f"left columns; pass a disambiguating prefix")
    payload = "_asof_payload"
    rt = (right.where(F.col(ts_col).isNotNull())
          .select(*keys, ts_col,
                  F.struct(*value_cols).alias(payload))
          .withColumn("_side", F.lit(0)))
    payload_type = dict(rt.dtypes)[payload]
    lt = left.select(*lcols,
                     F.lit(None).cast(payload_type).alias(payload),
                     F.lit(1).alias("_side"))
    for c in lcols:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    merged = lt.unionByName(rt.select(*lt.columns))
    w = (Window.partitionBy(*keys)
         .orderBy(ts_col, "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    asof = F.last(payload, ignorenulls=True).over(w)
    out = merged.select(*lcols, "_side",
                        *[asof[c].alias(o)
                          for c, o in zip(value_cols, out_names)])
    return out.where(F.col("_side") == 1).drop("_side")
