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

Skew note: a hot key serializes into one partition's sort. The
``skew_safe=True`` mode range-partitions the union by (keys, ts) instead
(repartitionByRange) so a hot key SPANS partitions, computes the running
last-right-value per partition locally (Arrow-batched, vectorized
group-ffill), and stitches partition boundaries with a driver-side carry
pass over one tiny boundary row per partition — a feature-store workload
where one key holds 90% of the rows parallelizes across the whole
cluster instead of serializing into one task's sort.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, keys: list[str],
              ts_col: str, value_cols: list[str],
              prefix: str = "asof_", skew_safe: bool = False,
              num_partitions: int | None = None,
              materialize: bool = True) -> DataFrame:
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
    if skew_safe:
        return _asof_range_partitioned(
            left, right, merged, keys, ts_col, value_cols, out_names,
            payload, num_partitions, materialize)
    w = (Window.partitionBy(*keys)
         .orderBy(ts_col, "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    asof = F.last(payload, ignorenulls=True).over(w)
    out = merged.select(*lcols, "_side",
                        *[asof[c].alias(o)
                          for c, o in zip(value_cols, out_names)])
    return out.where(F.col("_side") == 1).drop("_side")


def _asof_range_partitioned(left: DataFrame, right: DataFrame,
                            merged: DataFrame, keys: list[str],
                            ts_col: str, value_cols: list[str],
                            out_names: list[str], payload: str,
                            num_partitions: int | None,
                            materialize: bool) -> DataFrame:
    """Skew-safe as-of: range-partition the tagged union by (keys, ts,
    side) so a hot key spans many partitions, fill the running
    last-right-payload per partition with a vectorized pandas group-ffill,
    and stitch boundaries with a driver carry pass.

    Two Arrow passes over one PERSISTED range-partitioned dataset:
      pass 1 emits ONE boundary row per partition (first key, last key,
      the last non-null payload of the last key) — the driver folds these
      N rows, in partition order, into a carry-in per partition (the
      payload a partition's FIRST key inherited from earlier partitions;
      keys are contiguous under range order, so only the first key can
      have history);
      pass 2 redoes the local fill seeded with the broadcast carry-in and
      emits only left rows.

    Cost: one range shuffle (same bytes as the window path's hash
    shuffle), plus the tiny boundary aggregation — and no partition ever
    holds more than ~rows/num_partitions rows, hot key or not. Equal
    (keys, ts, side) tuples land in one partition (RangePartitioner maps
    equal tuples together), so right-before-left tie order is preserved.

    Unlike the lazy window path, this mode is EAGER by default
    (materialize=True): the boundary pass already runs a job, and the
    fill output is localCheckpointed so the cached union and the carry
    broadcast can be released before returning — repeated skew_safe
    calls do not accumulate cached copies of their inputs.
    materialize=False returns the lazy fill plan (useful for plan
    inspection) and leaves the union cached until the context GCs it.
    """
    spark = merged.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    lschema = {f.name: f for f in left.schema.fields}
    rschema = {f.name: f for f in right.schema.fields}
    sort_cols = [*keys, ts_col, "_side"]
    part = (merged.repartitionByRange(n, *sort_cols)
            .sortWithinPartitions(*sort_cols)
            .withColumn("_pid", F.spark_partition_id())
            .persist())
    payload_field = next(f for f in part.schema.fields
                         if f.name == payload)

    def _key_tuple(pdf: pd.DataFrame, i: int) -> tuple:
        return tuple(pdf[k].iloc[i] for k in keys)

    def _scan_batch(pdf, cur_key, cur_payload):
        """Fold one sorted batch into (last_key, last non-null payload of
        last_key), continuing a run from (cur_key, cur_payload)."""
        lk = _key_tuple(pdf, -1)
        mask = pdf[payload].notna()
        for k in keys:
            mask &= pdf[k].eq(pdf[k].iloc[-1])
        if mask.any():
            return lk, pdf.loc[mask, payload].iloc[-1]
        return lk, (cur_payload if lk == cur_key else None)

    def boundary_fn(batches):
        pid = first = cur_key = cur_payload = None
        for pdf in batches:
            if not len(pdf):
                continue
            if first is None:
                pid = int(pdf["_pid"].iloc[0])
                first = _key_tuple(pdf, 0)
            cur_key, cur_payload = _scan_batch(pdf, cur_key, cur_payload)
        if first is not None:
            row = {"pid": pid, payload: cur_payload}
            row.update({f"_fk_{k}": v for k, v in zip(keys, first)})
            row.update({f"_lk_{k}": v for k, v in zip(keys, cur_key)})
            yield pd.DataFrame([row])

    bschema = StructType(
        [StructField("pid", part.schema["_pid"].dataType, False)]
        + [StructField(f"_fk_{k}", lschema[k].dataType) for k in keys]
        + [StructField(f"_lk_{k}", lschema[k].dataType) for k in keys]
        + [payload_field])
    boundary = sorted(
        (r.asDict(recursive=True) for r in
         part.mapInPandas(boundary_fn, schema=bschema).collect()),
        key=lambda r: r["pid"])

    # Driver carry fold: state = (key, payload-or-None) of the run that is
    # open at each partition boundary. carry_in[pid] seeds pid's first key.
    carry_in: dict[int, tuple] = {}
    state = None
    for b in boundary:
        fk = tuple(b[f"_fk_{k}"] for k in keys)
        lk = tuple(b[f"_lk_{k}"] for k in keys)
        if state is not None and state[0] == fk and state[1] is not None:
            carry_in[b["pid"]] = state
        if b[payload] is not None:
            state = (lk, b[payload])
        elif state is None or state[0] != lk:
            state = (lk, None)
        # else: run continues with no new right row — keep prior payload
    bc_carry = spark.sparkContext.broadcast(carry_in)

    out_schema = StructType(
        list(left.schema.fields)
        + [StructField(o, rschema[c].dataType)
           for c, o in zip(value_cols, out_names)])
    lcols = [f.name for f in left.schema.fields]

    def fill_fn(batches):
        cur_key = cur_payload = None
        seeded = False
        for pdf in batches:
            if not len(pdf):
                continue
            if not seeded:
                seeded = True
                carry = bc_carry.value.get(int(pdf["_pid"].iloc[0]))
                if carry is not None:
                    cur_key, cur_payload = carry
            filled = (pdf.groupby(list(keys), sort=False, dropna=False)
                      [payload].ffill().copy())
            if filled.dtype != object:   # all-null batch arrives as float
                filled = filled.astype(object).where(filled.notna(), None)
            if cur_payload is not None:
                head = filled.isna()
                for k, v in zip(keys, cur_key):
                    head &= pdf[k].eq(v)
                if head.any():
                    filled[head] = pd.Series(
                        [cur_payload] * int(head.sum()),
                        index=filled.index[head])
            is_left = pdf["_side"].eq(1)
            out = pdf.loc[is_left, lcols].copy()
            vals = filled[is_left]
            for c, o in zip(value_cols, out_names):
                out[o] = [None if not isinstance(v, dict) else v.get(c)
                          for v in vals]
            yield out
            cur_key, cur_payload = _scan_batch(pdf, cur_key, cur_payload)

    res = part.mapInPandas(fill_fn, schema=out_schema)
    if materialize:
        res = res.localCheckpoint(eager=True)
        part.unpersist()
        bc_carry.unpersist()
    return res
