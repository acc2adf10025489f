"""Snapshot tags (named refs) + orphan-file lifecycle on
VersionedTable — the retention/reproducibility surface of the Iceberg
analog.

Contract under test (io.py):
  * create_tag(name) pins a snapshot BY NAME; read(ref=name) is
    byte-identical to read(snapshot_id=pinned) forever — across later
    commits, deletes, merges, and (the point) expire_snapshots with a
    retention policy that would otherwise drop the pinned snapshot;
  * a tagged mid-history snapshot survives truncation as its own
    COMPACTED base (resolved view, replace_all) while untagged
    neighbors expire — reads at the tag unchanged, reads at expired
    ids raise;
  * drop_tag releases the pin: the next expiry physically purges the
    previously-pinned rows (takedown story stays complete);
  * same-name/same-id re-tag is a no-op (idempotent job re-runs);
    same-name/different-id raises (a silently moved training-corpus
    pin is the failure the feature exists to prevent); tagging a
    future or expired id raises;
  * the stats property (file skipping) survives on the tag's compacted
    entry: plan_files(ref=, where=) still prunes;
  * orphan sweep is AGE-GATED: a never-referenced data dir younger
    than the grace survives expiry (it may be a concurrent commit that
    wrote files outside the manifest lock but hasn't appended its
    line), and remove_orphan_files(older_than_s) reclaims genuinely
    crashed commits.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from ocr_spark.sources.io import VersionedTable


@pytest.fixture(scope="module")
def spark():
    from ocr_spark.session import get_spark
    s = get_spark(master="local[4]", app_name="refs-tests")
    yield s


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["drop_id", "url", "score"])


def _rows(df):
    return {(r.drop_id, r.url, r.score) for r in df.collect()}


def _vt(spark, tmp_path, name="t"):
    vt = VersionedTable(spark, str(tmp_path / name))
    vt.commit(_mk(spark, [(1, "a", 10), (2, "b", 20)]), "drop_id",
              stats_cols=["url"])
    return vt


def test_tag_roundtrip_and_pin_survives_commits(spark, tmp_path):
    vt = _vt(spark, tmp_path)
    sid = vt.create_tag("train-v1")
    assert sid == 1 and vt.refs()["train-v1"]["snapshot_id"] == 1
    before = _rows(vt.read(ref="train-v1"))
    vt.commit(_mk(spark, [(1, "a2", 11)]), "drop_id")
    vt.delete_where("score = 20")
    assert _rows(vt.read(ref="train-v1")) == before == {
        (1, "a", 10), (2, "b", 20)}
    # idempotent re-tag; moved pin raises; both-pins-at-once raises
    assert vt.create_tag("train-v1", snapshot_id=1) == 1
    with pytest.raises(ValueError, match="already pins"):
        vt.create_tag("train-v1", snapshot_id=2)
    with pytest.raises(ValueError, match="not both"):
        vt.read(ref="train-v1", snapshot_id=1)
    with pytest.raises(ValueError, match="unknown ref"):
        vt.read(ref="nope")
    with pytest.raises(ValueError, match="unknown snapshot"):
        vt.create_tag("future", snapshot_id=99)


def test_tagged_snapshot_survives_expiry_as_compacted_base(spark, tmp_path):
    """ids 1..5, tag id 3, keep_last=1: survivors are exactly {3, 5},
    both byte-identical to their pre-expiry reads; 3 becomes a
    self-contained compacted base; 2 and 4 expire."""
    vt = _vt(spark, tmp_path)
    vt.commit(_mk(spark, [(2, "b2", 21)]), "drop_id")          # 2
    vt.commit(_mk(spark, [(3, "c", 30)]), "drop_id")           # 3
    vt.create_tag("train-v1", snapshot_id=3)
    vt.commit(_mk(spark, [(1, "a4", 12)]), "drop_id")          # 4
    vt.commit(_mk(spark, [(2, "b5", 22)]), "drop_id")          # 5
    at3, at5 = _rows(vt.read(snapshot_id=3)), _rows(vt.read())
    vt.expire_snapshots(keep_last=1)
    assert [s["id"] for s in vt.snapshots()] == [3, 5]
    assert _rows(vt.read(ref="train-v1")) == at3
    assert _rows(vt.read()) == at5
    meta3 = vt.snapshots()[0]
    assert meta3["replace_all"] and "compacted" in meta3["note"]
    # stats property survived onto the compacted tag entry: a url
    # point-lookup at the tag still skips files
    plan = vt.plan_files(ref="train-v1", where=[("url", "==", "c")])
    assert plan["files_skipped"] > 0
    assert {r.url for r in vt.read(
        ref="train-v1", where=[("url", "==", "c")]).collect()} == {"c"}
    for gone in (1, 2, 4):
        with pytest.raises(ValueError):
            vt.read(snapshot_id=gone)
    # 5's predecessor 4 was dropped, so 5 is compacted too (its view
    # depends on 4's rewrite of partition 1 — folding from C3 alone
    # would lose it); a kept snapshot with an INTACT prefix carries
    # verbatim instead — pinned below with a contiguous keep
    assert vt.snapshots()[1]["replace_all"]
    vt.commit(_mk(spark, [(3, "c6", 31)]), "drop_id")          # 6
    vt.expire_snapshots(keep_last=2)                           # {3,5,6}
    assert [s["id"] for s in vt.snapshots()] == [3, 5, 6]
    assert not vt.snapshots()[2].get("replace_all")            # verbatim
    assert _rows(vt.read(ref="train-v1")) == at3


def test_drop_tag_releases_pin_for_physical_purge(spark, tmp_path):
    vt = _vt(spark, tmp_path)
    vt.create_tag("pin", snapshot_id=1)
    vt.delete_where("url = 'a'", note="takedown")
    assert vt.expire_snapshots(keep_last=1) == []   # pin holds history
    assert _rows(vt.read(ref="pin")) == {(1, "a", 10), (2, "b", 20)}
    assert vt.drop_tag("pin") is True
    assert vt.drop_tag("pin") is False              # idempotent
    removed = vt.expire_snapshots(keep_last=1)
    assert removed, "released pin must let expiry purge"
    data = str(tmp_path / "t" / "data")
    leftovers = spark.read.option("mergeSchema", "true").parquet(
        *[os.path.join(r, f) for r, _, fs in os.walk(data)
          for f in fs if f.endswith(".parquet")])
    assert leftovers.where("url = 'a'").count() == 0
    with pytest.raises(ValueError, match="unknown ref"):
        vt.read(ref="pin")


def test_tagging_an_expired_id_raises(spark, tmp_path):
    vt = _vt(spark, tmp_path)
    vt.commit(_mk(spark, [(1, "a2", 11)]), "drop_id")
    vt.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="no snapshot"):
        vt.create_tag("late", snapshot_id=1)


def test_orphan_grace_protects_in_flight_commits(spark, tmp_path):
    """A never-referenced snap dir younger than the grace survives both
    the expiry sweep and remove_orphan_files; past the age it is
    reclaimed by remove_orphan_files. A dir the PRE-expiry manifest
    referenced is provably committed garbage and goes immediately."""
    vt = _vt(spark, tmp_path)
    vt.commit(_mk(spark, [(1, "a2", 11)]), "drop_id")
    inflight = tmp_path / "t" / "data" / "snap-000099-aaaaaaaa"
    os.makedirs(inflight)
    (inflight / "part-0.parquet").write_bytes(b"in flight")
    removed = vt.expire_snapshots(keep_last=1)
    # snap 1's superseded partition went (manifest-proven garbage) ...
    assert any(r.startswith("snap-000001") for r in removed)
    # ... the possible in-flight commit did not
    assert inflight.exists()
    assert vt.remove_orphan_files() == []
    old = time.time() - 8 * 86400
    os.utime(inflight, (old, old))
    assert vt.remove_orphan_files(older_than_s=7 * 86400) == [
        "snap-000099-aaaaaaaa"]
    assert not inflight.exists()
    # reads never noticed any of it
    assert _rows(vt.read()) == {(1, "a2", 11), (2, "b", 20)}


def test_tag_on_results_shape_composes_with_where(spark, tmp_path):
    """The production story in one flow: ingest-shaped commits with url
    stats, tag the training corpus, keep ingesting + takedown, expire —
    the tag still reads byte-identically AND point-lookups at the tag
    still skip files."""
    vt = VersionedTable(spark, str(tmp_path / "r"))
    day1 = spark.range(100).select(
        F.lit(1).alias("drop_id"),
        F.format_string("a%03d", "id").alias("url"),
        F.col("id").alias("score"))
    vt.commit(day1.repartitionByRange(4, "url")
              .sortWithinPartitions("url"), "drop_id", stats_cols=["url"])
    vt.create_tag("train-v1")
    day2 = spark.range(100).select(
        F.lit(2).alias("drop_id"),
        F.format_string("b%03d", "id").alias("url"),
        F.col("id").alias("score"))
    vt.commit(day2.repartitionByRange(4, "url")
              .sortWithinPartitions("url"), "drop_id")
    vt.delete_where([("url", "==", "a007")], note="takedown")
    vt.expire_snapshots(keep_last=1)
    pinned = vt.read(ref="train-v1", where=[("url", "==", "a007")])
    assert pinned.count() == 1          # pre-takedown pin intact
    plan = vt.plan_files(ref="train-v1", where=[("url", "==", "a007")])
    assert plan["files_skipped"] >= plan["files_total"] - 1
    assert vt.read(where=[("url", "==", "a007")]).count() == 0
