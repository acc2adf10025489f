"""rollback_to — Iceberg ``rollback_to_snapshot``: an earlier snapshot
becomes the live view again via one O(1) metadata-only manifest entry.

Contract under test (io.py):
  * the live view equals the target's pinned view exactly; nothing
    after the target is lost (rolled-past snapshots stay readable —
    roll forward by rolling "back" to one), and later commits stack on
    top of the restored view;
  * restoring a snapshot restores its DELETE state: merge-on-read
    records issued after the target stop applying (rows come back),
    records at or before it keep filtering; pins between target and
    rollback still see their own delete state;
  * a rollback across evolve_partition_spec restores the OLD spec
    (later commits/maintenance run under it; a staged snapshot whose
    spec no longer matches is hard-blocked from publish);
  * read_incremental raises across the rollback (consumed rows changed
    underneath); read_changes returns exactly the net undo;
  * expiry after a rollback physically purges the rolled-past data
    once nothing references it, while the live view stays byte-stable;
  * guards: unknown/expired ids, staged targets, already-latest.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ocr_spark.sources.io import VersionedTable


def _mk(spark, rows):
    return spark.createDataFrame(rows, "drop_id INT, url STRING, n INT")


def _rows(df):
    return sorted((r.drop_id, r.url, r.n) for r in df.collect())


def test_rollback_restores_view_and_stacks(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_mk(spark, [(1, "a", 1), (2, "b", 2)]), "drop_id")  # id 1
    vt.commit(_mk(spark, [(2, "b", 9)]), "drop_id")               # id 2
    vt.commit(_mk(spark, [(3, "c", 3)]), "drop_id")               # id 3
    at1 = _rows(vt.read(snapshot_id=1))
    at3 = _rows(vt.read())
    rid = vt.rollback_to(1)
    assert _rows(vt.read()) == at1
    # nothing lost: the rolled-past snapshots still read
    assert _rows(vt.read(snapshot_id=3)) == at3
    # roll FORWARD by rolling back to the later snapshot
    vt.rollback_to(3)
    assert _rows(vt.read()) == at3
    # and stack a new commit on top of a restored view
    vt.rollback_to(rid)   # back to the view-at-1 state
    vt.commit(_mk(spark, [(4, "d", 4)]), "drop_id")
    assert _rows(vt.read()) == sorted(at1 + [(4, "d", 4)])
    ops = {r.snapshot_id: r.operation for r in vt.history().collect()}
    assert ops[rid] == "rollback"


def test_rollback_restores_delete_state(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_mk(spark, [(1, "a", 1), (1, "b", 2), (2, "c", 3)]),
              "drop_id", stats_cols=["url"])                      # id 1
    vt.delete_where([("url", "==", "a")],
                    mode="merge_on_read")                         # id 2
    assert _rows(vt.read()) == [(1, "b", 2), (2, "c", 3)]
    vt.delete_where([("url", "==", "b")],
                    mode="merge_on_read")                         # id 3
    assert _rows(vt.read()) == [(2, "c", 3)]
    # rollback to BETWEEN the deletes: the later record vanishes
    # (its row comes back), the earlier one keeps filtering
    vt.rollback_to(2)                                             # id 4
    assert _rows(vt.read()) == [(1, "b", 2), (2, "c", 3)]
    led = {r.delete_id: r.pending for r in vt.row_deletes().collect()}
    assert led == {2: True}
    # the pin between target and rollback still sees ITS delete state
    assert _rows(vt.read(snapshot_id=3)) == [(2, "c", 3)]
    # rollback to before any delete: everything comes back
    vt.rollback_to(1)                                             # id 5
    assert _rows(vt.read()) == [(1, "a", 1), (1, "b", 2), (2, "c", 3)]
    assert vt.row_deletes().count() == 0


def test_rollback_across_spec_evolution_restores_spec(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_mk(spark, [(1, "a", 1), (2, "b", 2)]), "drop_id")  # id 1
    vt.evolve_partition_spec("url", ("bucket", 4))                # id 2
    assert vt.partition_spec()["transform"] == {"kind": "bucket",
                                                "n": 4}
    vt.rollback_to(1)                                             # id 3
    # the OLD spec is live again…
    assert vt.partition_spec() == {"partition_col": "drop_id",
                                   "transform": None}
    assert _rows(vt.read()) == [(1, "a", 1), (2, "b", 2)]
    # …and later commits validate/lay out under it
    vt.commit(_mk(spark, [(3, "c", 3)]), "drop_id")               # id 4
    assert set(vt.snapshots()[-1]["parts"]) == {"3"}
    with pytest.raises(ValueError, match="partitioned by"):
        vt.commit(_mk(spark, [(4, "d", 4)]), "url")
    # the pinned EVOLVED snapshot still plans under ITS spec
    assert vt.partition_spec(snapshot_id=2)["partition_col"] == "url"


def test_rollback_blocks_stale_staged_publish(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_mk(spark, [(1, "a", 1)]), "drop_id")               # id 1
    vt.evolve_partition_spec("url", ("bucket", 4))                # id 2
    staged = vt.commit(_mk(spark, [(2, "b", 2)]), "url",
                       staged=True)                               # id 3
    vt.rollback_to(1)   # spec back to identity drop_id            # id 4
    with pytest.raises(ValueError, match="re-stage"):
        vt.publish(staged)


def test_rollback_boundary_scans(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_mk(spark, [(1, "a", 1)]), "drop_id")               # id 1
    vt.commit(_mk(spark, [(2, "b", 2)]), "drop_id")               # id 2
    rid = vt.rollback_to(1)                                       # id 3
    # consumed partition "2" vanished underneath: the append scan
    # refuses, CDC returns exactly the net undo
    with pytest.raises(ValueError, match="non-append"):
        vt.read_incremental(2)
    got = sorted(((r.drop_id, r.url, r.n), r._change_type)
                 for r in vt.read_changes(2, rid).collect())
    assert got == [((2, "b", 2), "delete")]
    # and the whole range from before the rolled-back commit is clean
    assert vt.read_changes(1, rid).count() == 0


def test_expiry_after_rollback_purges_rolled_past_data(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_mk(spark, [(1, "a", 1)]), "drop_id")               # id 1
    vt.commit(_mk(spark, [(9, "bad", 9)]), "drop_id")             # id 2
    vt.rollback_to(1)                                             # id 3
    live = _rows(vt.read())
    vt.expire_snapshots(keep_last=1)
    assert _rows(vt.read()) == live == [(1, "a", 1)]
    # the bad drop's partition dir is physically gone (no surviving
    # snapshot references it)
    data = os.path.join(vt.root, "data")
    leftover = [os.path.join(dp, f) for dp, _dn, fns in os.walk(data)
                for f in fns if f.endswith(".parquet")]
    joined = "\n".join(leftover)
    assert "_pv=9" not in joined and leftover


def test_rollback_guards(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="no snapshots"):
        vt.rollback_to(1)
    vt.commit(_mk(spark, [(1, "a", 1)]), "drop_id")               # id 1
    with pytest.raises(ValueError, match="already the latest"):
        vt.rollback_to(1)
    vt.commit(_mk(spark, [(2, "b", 2)]), "drop_id")               # id 2
    with pytest.raises(ValueError):
        vt.rollback_to(99)
    staged = vt.commit(_mk(spark, [(3, "c", 3)]), "drop_id",
                       staged=True)                               # id 3
    with pytest.raises(ValueError, match="staged"):
        vt.rollback_to(staged)


# ---- review findings (r4 session): rollback x merge-on-read deletes


def test_roll_forward_restores_delete_records(spark, tmp_path):
    """Roll-forward must restore the target's VISIBLE delete set: a
    takedown cancelled by an intermediate rollback re-applies when a
    later rollback restores the post-takedown snapshot — a
    right-to-be-forgotten delete must never silently resurrect rows."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_mk(spark, [(1, "a", 1), (2, "b", 2)]), "drop_id")  # id 1
    vt.delete_where([("url", "==", "a")],
                    mode="merge_on_read")                         # id 2
    vt.rollback_to(1)                                             # id 3
    assert _rows(vt.read()) == [(1, "a", 1), (2, "b", 2)]
    assert vt.row_deletes().count() == 0
    vt.rollback_to(2)   # roll FORWARD to the post-takedown state   # id 4
    assert _rows(vt.read()) == [(2, "b", 2)]
    led = vt.row_deletes().collect()
    assert len(led) == 1 and led[0].delete_id == 2 and led[0].pending


def test_rollback_of_mor_delete_visible_to_consumers(spark, tmp_path):
    """A rollback that undoes a metadata-only takedown changes ROWS
    without moving any partition dir — incremental consumers must see
    it (read_incremental raises; read_changes emits the restored rows
    as inserts), never a silent zero-change range."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_mk(spark, [(1, "a", 1), (2, "b", 2)]), "drop_id",
              stats_cols=["url"])                                 # id 1
    vt.delete_where([("url", "==", "a")],
                    mode="merge_on_read")                         # id 2
    rid = vt.rollback_to(1)                                       # id 3
    ch = vt.changed_partitions(2, rid)
    assert ch["rewritten"], "delete-state change must mark rewrites"
    with pytest.raises(ValueError, match="non-append"):
        vt.read_incremental(2)
    got = sorted(((r.drop_id, r.url, r.n), r._change_type)
                 for r in vt.read_changes(2, rid).collect())
    assert got == [((1, "a", 1), "insert")]


def test_expiry_preserves_rollback_delete_cancellation(spark, tmp_path):
    """Expiry must never change what the latest view reads: when the
    rollback entry that cancelled a delete record is compacted away
    while an EARLIER surviving (tagged) entry still carries the
    record, the compacted base's authoritative delete set (deletes_set)
    keeps the cancellation."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_mk(spark, [(1, "a", 1), (2, "b", 2)]), "drop_id")  # id 1
    vt.delete_where([("url", "==", "a")],
                    mode="merge_on_read")                         # id 2
    vt.create_tag("audit", 2)
    vt.commit(_mk(spark, [(3, "c", 3)]), "drop_id")               # id 3
    vt.rollback_to(1)                                             # id 4
    before = _rows(vt.read())
    assert before == [(1, "a", 1), (2, "b", 2)]
    vt.expire_snapshots(keep_last=1)
    assert _rows(vt.read()) == before, \
        "expiry changed the live view's delete state"
    assert vt.row_deletes().count() == 0
    # the tagged pre-rollback pin still reads ITS delete state
    assert _rows(vt.read(ref="audit")) == [(2, "b", 2)]
