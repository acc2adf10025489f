"""Model-based random walk over the full VersionedTable surface.

A pure-Python model (a row multiset + per-url replace rules) steps
through a SEEDED random sequence of commit / delete_where / merge_into
/ rewrite_files / expire_snapshots, and after EVERY op the table's
latest view must equal the model exactly — including a seeded
file-skipped read (read(where=...) on a stats-carrying table, the
property enabled by the walk's first commit and inherited through
every maintenance op) checked against the model filtered in Python. Alongside, one mid-walk
snapshot is pinned and must read byte-stably until expiry truncates
past it — the time-travel contract under arbitrary op interleavings.
This is the cross-feature test the per-feature suites can't express:
e.g. a merge over a partition that a delete tombstoned and a rewrite
then compacted.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ocr_spark.sources.io import VersionedTable

COLS = ["drop_id", "url", "score"]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "drop_id INT, url STRING, score INT")


def _read(vt, snapshot_id=None):
    return sorted((r.drop_id, r.url, r.score)
                  for r in vt.read(snapshot_id=snapshot_id).collect())


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_versioned_table_random_walk_matches_model(spark, tmp_path, seed):
    rnd = random.Random(seed)
    vt = VersionedTable(spark, str(tmp_path / f"t{seed}"))
    model: list[tuple] = []          # latest-view row multiset
    pins: dict[int, list] = {}       # snapshot id -> expected rows

    def fresh_rows(n):
        return [(rnd.randint(1, 4), f"u{rnd.randint(0, 9)}",
                 rnd.randint(0, 99)) for _ in range(n)]

    # op 0 is always a commit so every later op has a table to act on
    for step in range(16):
        op = "commit" if step == 0 else rnd.choice(
            ["commit", "commit", "delete", "merge", "rewrite", "expire"])
        if op == "commit":
            rows = fresh_rows(rnd.randint(1, 5))
            sid = vt.commit(_df(spark, rows), "drop_id",
                            note=f"step {step}",
                            stats_cols=(["score", "url"] if step == 0
                                        else None))
            parts = {r[0] for r in rows}
            model = [r for r in model if r[0] not in parts] + rows
        elif op == "delete":
            cut = rnd.randint(0, 99)
            # alternate spellings: Column vs structured (the structured
            # one routes the affected-partition probe through the
            # file-skipped read path)
            sid, _ = vt.delete_where(
                F.col("score") < cut if step % 2
                else [("score", "<", cut)])
            model = [r for r in model if not r[2] < cut]
        elif op == "merge":
            # unique urls in the source (MERGE cardinality contract)
            srcs = {}
            for r in fresh_rows(rnd.randint(1, 4)):
                srcs[r[1]] = r
            rows = list(srcs.values())
            sid, _ = vt.merge_into(_df(spark, rows), ["url"],
                                   note=f"step {step}")
            keys = set(srcs)
            model = [r for r in model if r[1] not in keys] + rows
        elif op == "rewrite":
            sid, _ = vt.rewrite_files()      # logical no-op
        else:
            keep = rnd.randint(2, 4)
            vt.expire_snapshots(keep)
            oldest = vt.snapshots()[0]["id"]
            for old in [p for p in pins if p < oldest]:
                pins.pop(old)
            sid = None

        assert _read(vt) == sorted(model), f"seed {seed} step {step} {op}"
        # seeded file-skipped read vs the model filtered in Python
        lo = rnd.randint(0, 99)
        hi = rnd.randint(lo, 99)
        got = sorted((r.drop_id, r.url, r.score) for r in
                     vt.read(where=[("score", "between", (lo, hi))])
                     .collect())
        assert got == sorted(r for r in model if lo <= r[2] <= hi), (
            f"seed {seed} step {step} {op}: where-read diverged")
        # pin one committing step's view and check every surviving pin
        if sid is not None and len(pins) < 2:
            pins[sid] = _read(vt)
        for pid, expected in pins.items():
            assert _read(vt, snapshot_id=pid) == expected, (
                f"seed {seed} step {step}: pinned snapshot {pid} drifted "
                f"after {op}")

    # the walk must have exercised time travel at least once
    assert pins
