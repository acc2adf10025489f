"""File-level column statistics + scan-time data skipping on
VersionedTable — the Iceberg manifest-bounds analog (min/max/null-count
per data file, harvested from parquet FOOTERS at commit time, planned
against driver-side).

Contract under test (io.py):
  * read(where=[(col, op, val), ...]) returns EXACTLY
    read().where(<same conjunction>) — file skipping is pure I/O
    elimination, never a semantics change (superset-safe pruning +
    exact residual filter);
  * a sorted/range-disjoint layout (zorder_layout's promise) actually
    prunes: plan_files reports most files skipped for a narrow range;
  * pruning is CONSERVATIVE: files without stats (pre-property
    commits), unconfigured columns, incomparable predicate values, and
    unknown null counts all keep the file;
  * an all-null stats column proves non-match for comparison
    predicates (SQL: comparisons never match NULL) and skips the file;
  * stats_cols is a TABLE PROPERTY: inherited by every later commit,
    including the internal delete_where / merge_into / rewrite_files
    commits and the expire_snapshots compacted base, so maintenance
    never loses skipping;
  * time-travel reads prune against the pinned snapshot's own files.
"""

from __future__ import annotations

import json
import os
import random

import pytest
from pyspark.sql import functions as F

from ocr_spark.sources.io import _STATS_FILE, VersionedTable


def _corpus(spark, n=2000, seed=7):
    rng = random.Random(seed)
    rows = [(i % 4, i, f"u{i:05d}",
             None if i % 11 == 0 else rng.randint(0, 10**6))
            for i in range(n)]
    return spark.createDataFrame(
        rows, ["drop_id", "seq", "url", "score"])


def _sorted_layout(df, col, n_files):
    # range-disjoint files on `col` — what zorder_layout produces for a
    # single clustered column (bits wide enough to cover the domain)
    return df.repartitionByRange(n_files, col).sortWithinPartitions(col)


def _ids(df):
    return sorted(r.seq for r in df.collect())


@pytest.fixture()
def vt(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_sorted_layout(_corpus(spark), "seq", 8), "drop_id",
             stats_cols=["seq", "url", "score"])
    return t


# ------------------------------------------------------------ exactness


def test_where_read_equals_filter_exactly(vt):
    cases = [
        [("seq", ">=", 100), ("seq", "<", 300)],
        [("url", "==", "u00150")],
        [("url", "!=", "u00150")],
        [("seq", "between", (500, 999))],
        [("seq", "in", [3, 1999, 77777])],
        [("score", ">", 500000)],          # nullable column
        [("seq", "<=", 0)],
        [("seq", ">", 10**9)],             # provably empty
    ]
    for where in cases:
        got = _ids(vt.read(where=where))
        exp = _ids(vt.read().where(
            F.expr(" AND ".join(_sql(p) for p in where))))
        assert got == exp, where


def _sql(p):
    col, op, val = p
    if op == "between":
        return f"{col} BETWEEN {val[0]} AND {val[1]}"
    if op == "in":
        return f"{col} IN ({','.join(map(repr, val))})"
    op = {"==": "="}.get(op, op)
    return f"{col} {op} {val!r}"


def test_provably_empty_returns_typed_empty(vt):
    out = vt.read(where=[("seq", ">", 10**9)])
    assert out.count() == 0
    assert out.columns == vt.read().columns


# ------------------------------------------------------------- pruning


def test_sorted_layout_prunes_most_files(vt):
    plan = vt.plan_files(where=[("seq", ">=", 100), ("seq", "<", 300)])
    assert plan["files_total"] > 8
    # 2000 rows in 8 range slices of ~250: a 200-wide window overlaps
    # <= 3 slices even with skewed sampled bounds; each slice holds
    # <= 4 partition files
    assert len(plan["files"]) <= 12
    assert plan["files_skipped"] >= plan["files_total"] // 2


def test_point_lookup_prunes(vt):
    plan = vt.plan_files(where=[("url", "==", "u00150")])
    assert plan["files_skipped"] > 0
    assert vt.read(where=[("url", "==", "u00150")]).count() == 1


def test_unconfigured_column_keeps_everything(vt):
    plan = vt.plan_files(where=[("drop_id", "==", 2)])
    assert plan["files_skipped"] == 0          # no stats on drop_id
    assert (vt.read(where=[("drop_id", "==", 2)]).count()
            == vt.read().where("drop_id = 2").count())


def test_incomparable_value_keeps_everything(vt):
    plan = vt.plan_files(where=[("seq", "==", "not-an-int")])
    assert plan["files_skipped"] == 0


def test_all_null_stats_column_is_skipped(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "n"))
    a = spark.createDataFrame(
        [(1, i, None) for i in range(50)], "d INT, seq INT, v INT")
    b = spark.createDataFrame(
        [(2, i, i) for i in range(50)], "d INT, seq INT, v INT")
    t.commit(a.coalesce(1).unionByName(b.coalesce(1)), "d",
             stats_cols=["v"])
    plan = t.plan_files(where=[("v", ">=", 0)])
    kept_parts = {os.path.basename(os.path.dirname(f))
                  for f in plan["files"]}
    assert plan["files_skipped"] >= 1          # the all-null partition
    assert kept_parts == {"_pv=2"}
    assert t.read(where=[("v", ">=", 0)]).count() == 50


# ----------------------------------------------------- property lifecycle


def test_explicit_missing_stats_col_raises(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "e"))
    with pytest.raises(ValueError, match="stats_cols"):
        t.commit(_corpus(spark, 10), "drop_id", stats_cols=["nope"])


def test_bad_where_op_raises(vt):
    with pytest.raises(ValueError, match="where predicates"):
        vt.read(where=[("seq", "~", 1)])


def test_maintenance_commits_inherit_stats(vt, spark):
    # delete -> merge -> compact: every resulting snapshot dir carries
    # a file manifest and skipping keeps working with exact semantics
    vt.delete_where("seq >= 1900")
    src = spark.createDataFrame(
        [(9, 150, "u00150", 5)], ["drop_id", "seq", "url", "score"])
    vt.merge_into(src, ["url"])
    vt.rewrite_files(target_bytes=1 << 30)
    for s in vt.snapshots():
        assert s.get("stats_cols") == ["seq", "url", "score"]
        for rel in {v.split(os.sep)[0]
                    for v in s["parts"].values() if v}:
            assert os.path.exists(os.path.join(
                vt.root, "data", rel, _STATS_FILE))
    got = vt.read(where=[("url", "==", "u00150")]).collect()
    assert [(r.drop_id, r.score) for r in got] == [(9, 5)]
    assert vt.read(where=[("seq", ">=", 1900)]).count() == 0
    where = [("seq", "between", (100, 299))]
    assert _ids(vt.read(where=where)) == _ids(
        vt.read().where("seq BETWEEN 100 AND 299"))


def test_pre_property_commits_fall_back_and_keep_all(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "m"))
    t.commit(_corpus(spark, 200), "drop_id")            # no stats yet
    assert not any(s.get("stats_cols") for s in t.snapshots())
    extra = spark.createDataFrame(
        [(7, 10_000 + i, f"x{i}", i) for i in range(100)],
        ["drop_id", "seq", "url", "score"])
    t.commit(_sorted_layout(extra, "seq", 4), "drop_id",
             stats_cols=["seq"])                        # property ON
    plan = t.plan_files(where=[("seq", ">=", 10_050)])
    # the 4 pre-property partitions keep every file (no stats); the new
    # partition prunes its own range-sorted files
    assert plan["files_skipped"] >= 1
    assert _ids(t.read(where=[("seq", ">=", 10_050)])) == _ids(
        t.read().where("seq >= 10050"))
    # plain commits AFTER the property keep harvesting (inheritance)
    t.commit(spark.createDataFrame(
        [(8, 20_000, "y", 1)], ["drop_id", "seq", "url", "score"]),
        "drop_id")
    assert t.snapshots()[-1]["stats_cols"] == ["seq"]


def test_time_travel_prunes_pinned_snapshot(vt, spark):
    sid = vt.snapshots()[-1]["id"]
    vt.delete_where("seq BETWEEN 100 AND 299")
    where = [("seq", "between", (100, 299))]
    assert vt.read(where=where).count() == 0
    assert vt.read(snapshot_id=sid, where=where).count() == 200


def test_expire_compaction_keeps_property_and_skipping(vt):
    vt.delete_where("seq >= 1500")
    # sort_by is the Iceberg rewrite sort strategy: without it a
    # compacted file spans the whole value range and skipping on the
    # clustered column degrades to nothing
    vt.rewrite_files(target_bytes=2048, sort_by=["seq"])
    vt.expire_snapshots(keep_last=1)
    assert vt.snapshots()[0].get("stats_cols") == ["seq", "url", "score"]
    # the deleted tail is provably absent from every surviving file's
    # bounds — the whole scan is skipped driver-side
    gone = vt.plan_files(where=[("seq", ">=", 1500)])
    assert gone["files_total"] > 0
    assert gone["files_skipped"] == gone["files_total"]
    # the sorted rewrite kept the clustering: a narrow window prunes
    where = [("seq", "between", (100, 299))]
    plan = vt.plan_files(where=where)
    assert plan["files_skipped"] > 0
    assert _ids(vt.read(where=where)) == _ids(
        vt.read().where("seq BETWEEN 100 AND 299"))


def test_unpartitioned_table_where_read(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "u"))
    t.commit(_sorted_layout(_corpus(spark, 500), "seq", 4),
             stats_cols=["seq"])
    plan = t.plan_files(where=[("seq", "<", 50)])
    assert plan["files_total"] == 4
    assert plan["files_skipped"] >= 2
    assert _ids(t.read(where=[("seq", "<", 50)])) == list(range(50))


def test_stats_manifest_shape(vt):
    rel = next(v for v in vt.snapshots()[-1]["parts"].values() if v)
    top = rel.split(os.sep)[0]
    with open(os.path.join(vt.root, "data", top, _STATS_FILE)) as f:
        man = json.load(f)
    assert man["stats_cols"] == ["seq", "url", "score"]
    entry = next(iter(man["files"].values()))[0]
    assert entry["rows"] > 0
    st = entry["cols"]["seq"]
    assert st["min"] <= st["max"] and st["nulls"] == 0
    # score carries real null counts (1 in 11 rows is NULL)
    assert sum(e["cols"]["score"]["nulls"]
               for fs in man["files"].values() for e in fs) > 0


# ------------------------------------------- stats-consuming maintenance


def _spy_plans(monkeypatch):
    """Record every file-skipped plan the table builds (read(where=...)
    funnels through plan_files)."""
    plans = []
    orig = VersionedTable.plan_files

    def spy(self, snapshot_id=None, partitions=None, where=None):
        out = orig(self, snapshot_id, partitions, where)
        if where:
            plans.append(out)
        return out

    monkeypatch.setattr(VersionedTable, "plan_files", spy)
    return plans


def test_structured_delete_condition_matches_sql_spelling(vt):
    sid, st = vt.delete_where([("url", "==", "u00150")])
    assert sid is not None and st["rows_deleted"] == 1
    assert vt.read().where("url = 'u00150'").count() == 0
    # no-match structured delete commits nothing
    sid2, st2 = vt.delete_where([("score", "<", 0)])
    assert sid2 is None and st2["rows_deleted"] == 0


def test_structured_delete_probe_is_file_skipped(vt, monkeypatch):
    plans = _spy_plans(monkeypatch)
    sid, st = vt.delete_where([("seq", "between", (100, 149))])
    assert st["rows_deleted"] == 50
    assert plans and plans[0]["files_skipped"] > 0
    assert vt.read().where("seq BETWEEN 100 AND 149").count() == 0


def test_merge_probe_bounded_by_source_key_range(vt, spark, monkeypatch):
    plans = _spy_plans(monkeypatch)
    src = spark.createDataFrame(
        [(9, 150, "u00150", 1)], ["drop_id", "seq", "url", "score"])
    sid, st = vt.merge_into(src, ["url"])
    assert st["rows_replaced"] == 1 and st["rows_written"] == 1
    # the probe ran through read(where=[("url","between",(u,u))]) and
    # the url bounds skipped the files that cannot hold the key
    assert plans and plans[0]["files_skipped"] > 0
    got = vt.read(where=[("url", "==", "u00150")]).collect()
    assert [(r.drop_id, r.score) for r in got] == [(9, 1)]


def test_read_incremental_composes_with_where(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "inc"))
    t.commit(_sorted_layout(_corpus(spark, 400), "seq", 4), "drop_id",
             stats_cols=["seq"])
    extra = spark.createDataFrame(
        [(7, 10_000 + i, f"x{i}", i) for i in range(200)],
        ["drop_id", "seq", "url", "score"])
    t.commit(_sorted_layout(extra, "seq", 4), "drop_id")
    inc = t.read_incremental(1, where=[("seq", "<", 10_050)])
    assert _ids(inc) == list(range(10_000, 10_050))
    # incremental partition pruning AND file bounds both applied
    plan = t.plan_files(partitions=["7"], where=[("seq", "<", 10_050)])
    assert plan["files_skipped"] > 0
