"""Hidden partitioning on VersionedTable — the Iceberg partition-spec
analog: the layout key is a TRANSFORM of a source column (bucket(n),
truncate(w), days), fixed at the first commit as a table property,
never materialized by writers, and PRUNED against predicates on the
SOURCE column at planning time.

Contract under test (io.py):
  * read(where=...) on a transformed layout returns EXACTLY
    read().where(<same conjunction>) — partition pruning is pure I/O
    elimination on top of file-stats skipping;
  * the Spark write expression and the driver-side planning mirror are
    bit-identical (bucket: md5-derived 60-bit hash; truncate int:
    pmod; truncate str: prefix; days: ISO day) — the manifest keys a
    commit writes equal _transform_py over the source values;
  * equality/IN prune on every transform; ranges prune on the
    order-preserving truncate/days/identity; bucket keeps everything
    for ranges (conservative);
  * the spec is a TABLE PROPERTY: inherited by later commits and by
    every maintenance path (delete_where COW + merge-on-read,
    merge_into, rewrite_files, apply_deletes, expire_snapshots
    compaction), all of which must map data rows to partitions through
    the TRANSFORM, never the raw source values;
  * NULL source values land in the Hive default partition and are
    pruned by any source-column predicate (all ops NULL-rejecting),
    while a plain read() still returns them;
  * a DIFFERENT spec on a later commit raises.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from ocr_spark.sources.io import (VersionedTable, _transform_py,
                                  _validate_transform, _where_to_column)


def _urls(spark, n=400, tag=""):
    return (spark.range(0, n)
            .select(F.format_string(f"u{tag}%05d", F.col("id"))
                    .alias("url"),
                    F.col("id").alias("n")))


def test_bucket_layout_keys_match_driver_mirror(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    df = _urls(spark)
    vt.commit(df, "url", partition_transform=("bucket", 8))
    tf = vt.snapshots()[0]["transform"]
    assert tf == {"kind": "bucket", "n": 8}
    # every manifest key equals the mirror over the rows it holds
    for key in vt.snapshots()[0]["parts"]:
        got = vt.read(partitions=[key]).select("url").collect()
        assert got, key
        for r in got:
            assert _transform_py(tf, r["url"]) == key


def test_bucket_point_lookup_prunes_and_is_exact(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_urls(spark), "url", partition_transform=("bucket", 8))
    plan = vt.plan_files(where=[("url", "==", "u00042")])
    assert plan["partitions_pruned"] == 7
    assert plan["partitions"] == [_transform_py(
        vt.snapshots()[0]["transform"], "u00042")]
    got = vt.read(where=[("url", "==", "u00042")]).collect()
    assert [(r["url"], r["n"]) for r in got] == [("u00042", 42)]
    # IN prunes to the union of the named urls' buckets
    tf = vt.snapshots()[0]["transform"]
    urls = ["u00001", "u00002", "u00003"]
    plan = vt.plan_files(where=[("url", "in", urls)])
    assert set(plan["partitions"]) == {_transform_py(tf, u)
                                       for u in urls}
    # a RANGE on a bucket layout prunes nothing (no key order) — but
    # stays exact
    plan = vt.plan_files(where=[("url", "<", "u00010")])
    assert plan["partitions_pruned"] == 0
    assert vt.read(where=[("url", "<", "u00010")]).count() == 10


def test_bucket_exactness_vs_residual_filter(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_urls(spark, 300), "url", partition_transform=("bucket", 4))
    for w in ([("url", "==", "u00007")],
              [("url", "in", ["u00001", "u00299", "zz-absent"])],
              [("url", "!=", "u00000")],
              [("url", ">=", "u00290")]):
        want = {tuple(r) for r in
                vt.read().where(_where_to_column(w)).collect()}
        got = {tuple(r) for r in vt.read(where=w).collect()}
        assert got == want, w


def test_truncate_int_range_prunes(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    df = spark.range(0, 1000).select(F.col("id").alias("seq"),
                                     F.md5(F.col("id").cast("string"))
                                     .alias("payload"))
    vt.commit(df, "seq", partition_transform=("truncate", 100))
    assert sorted(vt.snapshots()[0]["parts"], key=int) == [
        str(i * 100) for i in range(10)]
    plan = vt.plan_files(where=[("seq", "between", (250, 349))])
    assert sorted(plan["partitions"], key=int) == ["200", "300"]
    assert vt.read(where=[("seq", "between", (250, 349))]).count() == 100
    plan = vt.plan_files(where=[("seq", "<", 100)])
    # strict < cannot exclude the bound's own key partition
    assert sorted(plan["partitions"], key=int) == ["0", "100"]
    assert vt.read(where=[("seq", "<", 100)]).count() == 100
    plan = vt.plan_files(where=[("seq", ">=", 750)])
    assert sorted(plan["partitions"], key=int) == ["700", "800", "900"]


def test_truncate_string_prefix_prunes(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    rows = [(f"{h}ost{i}.example/p{i}", i)
            for i in range(40) for h in ("a", "b", "c")]
    df = spark.createDataFrame(rows, ["url", "n"])
    vt.commit(df, "url", partition_transform=("truncate", 1))
    assert sorted(vt.snapshots()[0]["parts"]) == ["a", "b", "c"]
    plan = vt.plan_files(where=[("url", "==", "bost7.example/p7")])
    assert plan["partitions"] == ["b"]
    assert vt.read(
        where=[("url", "==", "bost7.example/p7")]).count() == 1
    plan = vt.plan_files(where=[("url", ">=", "b")])
    assert sorted(plan["partitions"]) == ["b", "c"]


def test_days_layout_and_range(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    base = datetime.datetime(2026, 3, 1, 12, 0, 0)
    rows = [(base + datetime.timedelta(hours=6 * i), i)
            for i in range(20)]
    df = spark.createDataFrame(rows, ["ts", "n"])
    vt.commit(df, "ts", partition_transform="days")
    keys = sorted(vt.snapshots()[0]["parts"])
    assert keys[0] == "2026-03-01" and len(keys) == 6
    lo = datetime.datetime(2026, 3, 2, 0, 0, 0)
    hi = datetime.datetime(2026, 3, 3, 23, 59, 59)
    plan = vt.plan_files(where=[("ts", "between", (lo, hi))])
    assert sorted(plan["partitions"]) == ["2026-03-02", "2026-03-03"]
    got = vt.read(where=[("ts", "between", (lo, hi))]).count()
    assert got == 8  # 4 rows/day x 2 days


def test_null_source_value_partition(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    rows = [("u1", 1), (None, 2), ("u3", 3)]
    df = spark.createDataFrame(rows, ["url", "n"])
    vt.commit(df, "url", partition_transform=("bucket", 4))
    assert "__HIVE_DEFAULT_PARTITION__" in vt.snapshots()[0]["parts"]
    # plain read keeps the NULL row; any url predicate prunes it out
    assert vt.read().count() == 3
    plan = vt.plan_files(where=[("url", "==", "u1")])
    assert "__HIVE_DEFAULT_PARTITION__" not in plan["partitions"]
    assert {r["n"] for r in vt.read(
        where=[("url", "==", "u1")]).collect()} == {1}


def test_spec_is_inherited_and_mismatch_raises(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_urls(spark, 100), "url",
              partition_transform=("bucket", 8))
    # inherited: a plain later commit lands in consistent buckets
    vt.commit(_urls(spark, 100, tag="x"), "url")
    tf = vt.snapshots()[0]["transform"]
    for key in vt.snapshots()[-1]["parts"]:
        for r in vt.read(partitions=[key]).select("url").collect():
            assert _transform_py(tf, r["url"]) == key
    with pytest.raises(ValueError, match="partition transform"):
        vt.commit(_urls(spark, 10), "url",
                  partition_transform=("bucket", 16))
    with pytest.raises(ValueError, match="requires partition_col"):
        VersionedTable(spark, str(tmp_path / "t2")).commit(
            _urls(spark, 10), None, partition_transform=("bucket", 4))
    with pytest.raises(ValueError, match="transform"):
        _validate_transform(("bucket",))
    with pytest.raises(ValueError, match="transform"):
        _validate_transform(("zorder", 4))


def test_delete_where_cow_bounded_to_buckets(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_urls(spark, 300), "url",
              partition_transform=("bucket", 8))
    tf = vt.snapshots()[0]["transform"]
    sid, stats = vt.delete_where([("url", "==", "u00123")])
    assert stats["rows_deleted"] == 1
    assert stats["partitions_rewritten"] == 1
    # the delete commit rewrote ONLY the url's bucket
    assert set(vt.snapshots()[-1]["parts"]) == {
        _transform_py(tf, "u00123")}
    assert vt.read().count() == 299
    assert vt.read(where=[("url", "==", "u00123")]).count() == 0
    assert vt.read(snapshot_id=1).count() == 300


def test_delete_where_mor_affected_is_one_bucket(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_urls(spark, 300), "url",
              partition_transform=("bucket", 8))
    tf = vt.snapshots()[0]["transform"]
    sid, stats = vt.delete_where([("url", "==", "u00123")],
                                 mode="merge_on_read")
    assert sid is not None
    entry = vt.snapshots()[-1]
    assert entry["operation"] == "row_delete"
    assert entry["affected"] == [_transform_py(tf, "u00123")]
    assert vt.read().count() == 299
    # apply_deletes rewrites exactly the affected bucket
    sid2, st2 = vt.apply_deletes()
    assert st2["partitions_rewritten"] == 1
    assert vt.read().count() == 299


def test_merge_into_rewrites_matched_buckets_only(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_urls(spark, 300), "url",
              partition_transform=("bucket", 8))
    tf = vt.snapshots()[0]["transform"]
    src = spark.createDataFrame(
        [("u00007", 7000), ("brand-new-url", 1)], ["url", "n"])
    sid, stats = vt.merge_into(src, ["url"])
    assert stats["rows_written"] == 2 and stats["rows_replaced"] == 1
    touched = {_transform_py(tf, "u00007"),
               _transform_py(tf, "brand-new-url")}
    assert set(vt.snapshots()[-1]["parts"]) == touched
    assert vt.read().count() == 301
    assert vt.read(where=[("url", "==", "u00007")]).collect()[0]["n"] \
        == 7000
    # the untouched buckets' OTHER rows survived (dynamic overwrite at
    # key grain would have nuked them without the merge path)
    assert vt.read(where=[("url", "==", "u00008")]).collect()[0]["n"] \
        == 8


def test_rewrite_files_keeps_transform_layout(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    df = _urls(spark, 200).repartition(6)
    vt.commit(df, "url", partition_transform=("bucket", 2))
    sid, stats = vt.rewrite_files(target_bytes=1 << 30)
    assert sid is not None and stats["partitions_rewritten"] >= 1
    tf = vt.snapshots()[0]["transform"]
    for key in vt.snapshots()[-1]["parts"]:
        for r in vt.read(partitions=[key]).select("url").collect():
            assert _transform_py(tf, r["url"]) == key
    assert vt.read().count() == 200


def test_expiry_compaction_carries_transform(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_urls(spark, 100), "url",
              partition_transform=("bucket", 4))
    vt.commit(_urls(spark, 50, tag="x"), "url")
    vt.commit(_urls(spark, 50, tag="y"), "url")
    vt.expire_snapshots(keep_last=1)
    snaps = vt.snapshots()
    assert snaps[0]["transform"] == {"kind": "bucket", "n": 4}
    # post-compaction commits still inherit + prune
    vt.commit(_urls(spark, 30, tag="z"), "url")
    plan = vt.plan_files(where=[("url", "==", "uz00005")])
    assert plan["partitions_pruned"] >= 1
    got = vt.read(where=[("url", "==", "uz00005")]).collect()
    assert [r["url"] for r in got] == ["uz00005"]
    with pytest.raises(ValueError, match="partition transform"):
        vt.commit(_urls(spark, 5), "url",
                  partition_transform=("bucket", 16))


def test_identity_partition_col_predicate_now_prunes(spark, tmp_path):
    """NEW behavior for plain identity-partitioned tables too: a
    predicate on the partition column itself prunes partitions
    driver-side (previously only file stats could skip)."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    df = spark.range(0, 400).select(
        (F.col("id") % 8).cast("int").alias("drop_id"),
        F.col("id").alias("n"))
    vt.commit(df, "drop_id")
    plan = vt.plan_files(where=[("drop_id", "==", 3)])
    assert plan["partitions"] == ["3"]
    assert plan["partitions_pruned"] == 7
    assert vt.read(where=[("drop_id", "==", 3)]).count() == 50
    plan = vt.plan_files(where=[("drop_id", "between", (1, 2))])
    assert sorted(plan["partitions"]) == ["1", "2"]
    plan = vt.plan_files(where=[("drop_id", "!=", 0)])
    assert "0" not in plan["partitions"]
    assert vt.read(where=[("drop_id", "!=", 0)]).count() == 350
    # predicates on OTHER columns prune no partitions
    plan = vt.plan_files(where=[("n", "==", 5)])
    assert plan["partitions_pruned"] == 0


def test_transform_composes_with_blooms(spark, tmp_path):
    """The 100 TB point-lookup story end-to-end: the bucket transform
    prunes to 1/n of the PARTITIONS, the per-file bloom then skips
    files inside the surviving bucket."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    df = _urls(spark, 2000).repartition(4)
    vt.commit(df, "url", partition_transform=("bucket", 8),
              bloom_cols=["url"])
    plan_all = vt.plan_files()
    plan = vt.plan_files(where=[("url", "==", "u00042")])
    assert plan["partitions_pruned"] == 7
    assert len(plan["files"]) < plan_all["files_total"] / 8
    got = vt.read(where=[("url", "==", "u00042")]).collect()
    assert [(r["url"], r["n"]) for r in got] == [("u00042", 42)]
