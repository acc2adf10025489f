"""Copy-on-write row-level DELETE on VersionedTable.

The contract under test (io.py delete_where/commit(drop_partitions)):
  * latest view loses exactly the condition-is-TRUE rows;
  * untouched partitions carry over BY REFERENCE (same manifest dir —
    no rewrite, the 100 TB property);
  * a fully-deleted partition disappears via a manifest tombstone;
  * every earlier snapshot still reads the deleted rows (time travel);
  * NULL-condition rows are KEPT (SQL DELETE semantics);
  * physical removal happens only at expire_snapshots;
  * a no-match delete commits nothing (idempotent takedown re-runs).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ocr_spark.sources.io import VersionedTable


def _mk(spark, rows, cols=("drop_id", "url", "score")):
    return spark.createDataFrame(rows, list(cols))


def test_delete_where_partitioned_cow(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    rows = [(1, "a1", 10), (1, "a2", 99), (2, "b1", 99), (2, "b2", 99),
            (3, "c1", 10), (3, "c2", 20)]
    v1 = vt.commit(_mk(spark, rows), "drop_id", note="initial")
    live_before = {k: v for s in vt.snapshots() for k, v in s["parts"].items()}

    # delete: partial in partition 1, ALL of partition 2, none of 3
    sid, stats = vt.delete_where(F.col("score") == 99, note="takedown")
    assert sid == v1 + 1
    assert stats == {"rows_deleted": 3, "partitions_rewritten": 1,
                     "partitions_dropped": 1}

    latest = {(r.drop_id, r.url) for r in vt.read().collect()}
    assert latest == {(1, "a1"), (3, "c1"), (3, "c2")}

    # untouched partition 3 carried over by reference: same relative dir
    snaps = vt.snapshots()
    assert "3" not in snaps[-1]["parts"]           # not rewritten
    assert snaps[-1]["parts"]["2"] is None          # tombstone
    assert snaps[-1]["parts"]["1"] != live_before["1"]  # rewritten
    # time travel: snapshot 1 still reads everything, byte-for-byte
    old = {(r.drop_id, r.url) for r in vt.read(snapshot_id=v1).collect()}
    assert old == {(d, u) for d, u, _ in rows}
    # the old partition-1/2 files still exist on disk (COW, not purge)
    data = tmp_path / "t" / "data"
    assert any(p.startswith("snap-000001") for p in os.listdir(data))


def test_delete_where_null_condition_rows_survive(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, "keep", None), (1, "kill", 99), (1, "null-keeps", None)],
        ["drop_id", "url", "score"])
    vt.commit(df.withColumn("score", F.col("score").cast("int")), "drop_id")
    sid, stats = vt.delete_where("score = 99")
    assert sid is not None and stats["rows_deleted"] == 1
    kept = {r.url for r in vt.read().collect()}
    assert kept == {"keep", "null-keeps"}


def test_delete_where_no_match_commits_nothing(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_mk(spark, [(1, "a", 1)]), "drop_id")
    sid, stats = vt.delete_where(F.col("score") > 1000)
    assert sid is None and stats["rows_deleted"] == 0
    assert len(vt.snapshots()) == 1


def test_delete_where_everything_leaves_typed_empty(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_mk(spark, [(1, "a", 1), (2, "b", 2)]), "drop_id")
    sid, stats = vt.delete_where(F.lit(True))
    assert sid == 2 and stats["partitions_dropped"] == 2
    out = vt.read()
    assert out.count() == 0
    assert set(out.columns) == {"drop_id", "url", "score"}
    # history intact
    assert vt.read(snapshot_id=1).count() == 2


def test_delete_where_unpartitioned(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_mk(spark, [(1, "a", 1), (2, "b", 99)]), None)
    sid, stats = vt.delete_where("score = 99")
    assert sid == 2 and stats["rows_deleted"] == 1
    assert {r.url for r in vt.read().collect()} == {"a"}
    assert vt.read(snapshot_id=1).count() == 2


def test_delete_then_expire_purges_physically(spark, tmp_path):
    """The takedown pipeline: delete_where then expire_snapshots — the
    deleted rows' files must be GONE from disk, surviving reads intact."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_mk(spark, [(1, "pii", 99), (2, "ok", 1)]), "drop_id")
    vt.delete_where("score = 99", note="gdpr")
    removed = vt.expire_snapshots(keep_last=1)
    assert removed, "expiry must purge the pre-delete snapshot dir"
    # no parquet file anywhere under the table still holds the row
    data = str(tmp_path / "t" / "data")
    leftovers = spark.read.option("mergeSchema", "true").parquet(
        *[os.path.join(r, f) for r, _, fs in os.walk(data)
          for f in fs if f.endswith(".parquet")])
    assert leftovers.where("url = 'pii'").count() == 0
    assert {r.url for r in vt.read().collect()} == {"ok"}


def test_tombstoned_partition_can_be_recommitted(spark, tmp_path):
    """A dropped partition value must come back cleanly on a later
    normal commit (recrawl of a previously taken-down drop)."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_mk(spark, [(1, "a", 99)]), "drop_id")
    vt.delete_where("score = 99")
    assert vt.read().count() == 0
    v3 = vt.commit(_mk(spark, [(1, "a-v2", 1)]), "drop_id")
    assert {r.url for r in vt.read().collect()} == {"a-v2"}
    assert {r.url for r in vt.read(snapshot_id=v3 - 1).collect()} == set()
    assert {r.url for r in vt.read(snapshot_id=1).collect()} == {"a"}
