"""Schema evolution on VersionedTable — the Iceberg field-id column
registry (metadata-only ALTER TABLE: add / rename / drop / widen), with
reads aligning every data epoch to the CURRENT logical schema by field
id. No evolution op ever rewrites a data file.

Contract under test (io.py):
  * rename_column is metadata-only: old files keep reading under the
    new name (no new data dirs), and EVERY snapshot — time travel
    included — shows the current schema (Iceberg: schema is
    table-level, not per-snapshot);
  * drop-then-re-add NEVER resurfaces old values: the re-added column
    is a new field id, so the old files' same-named physical column is
    projected out and old rows read NULL;
  * add_column reads typed NULL until a commit provides the column;
  * update_column_type allows WIDENING only (int->bigint,
    float->double) and reads cast old epochs up;
  * the partition column cannot be renamed or dropped; name collisions
    and unknown columns raise;
  * file-statistics skipping follows a rename (the stats property is
    recorded by field id), and an epoch that predates an added column
    is provably non-matching for predicates on it (all-NULL rule);
  * the maintenance ops (delete_where / merge_into / rewrite_files /
    expire_snapshots compaction) keep working across evolved schemas —
    the per-dir _cols.json mapping travels WITH the data, surviving
    manifest truncation;
  * tables that never call an evolution op have no registry and keep
    the plain read path (the whole rest of the suite pins that).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ocr_spark.sources.io import _COLS_FILE, VersionedTable


def _pages(spark, drop, n=40, with_score=True):
    rows = []
    for i in range(n):
        seq = drop * 1000 + i
        r = (drop, seq, f"u{seq:06d}")
        rows.append(r + (seq * 10,) if with_score else r)
    cols = ["drop_id", "seq", "url"] + (["score"] if with_score else [])
    return spark.createDataFrame(rows, cols)


def _snap_dirs(root):
    d = os.path.join(root, "data")
    return sorted(x for x in os.listdir(d) if x.startswith("snap-"))


def test_rename_is_metadata_only_across_epochs(spark, tmp_path):
    root = str(tmp_path / "t")
    vt = VersionedTable(spark, root)
    vt.commit(_pages(spark, 1), "drop_id")
    dirs_before = _snap_dirs(root)

    vt.rename_column("url", "page_url")
    assert _snap_dirs(root) == dirs_before   # no data rewrite

    cur = vt.read()
    assert "page_url" in cur.columns and "url" not in cur.columns
    vals = {r.page_url for r in cur.collect()}
    assert vals == {f"u{1000 + i:06d}" for i in range(40)}

    # time travel shows the CURRENT schema over the old bytes
    old = vt.read(snapshot_id=1)
    assert "page_url" in old.columns and "url" not in old.columns
    assert old.count() == 40

    # a post-rename commit writes the new physical name; both epochs
    # align into one logical column
    vt.commit(_pages(spark, 2).withColumnRenamed("url", "page_url"),
              "drop_id")
    both = vt.read()
    assert both.count() == 80
    assert both.where(F.col("page_url").startswith("u001")).count() == 40
    assert both.where(F.col("page_url").startswith("u002")).count() == 40


def test_drop_then_readd_never_resurfaces_values(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_pages(spark, 1), "drop_id")
    assert vt.read().where(F.col("score").isNotNull()).count() == 40

    vt.drop_column("score")
    assert "score" not in vt.read().columns
    assert "score" not in vt.read(snapshot_id=1).columns  # table-level

    vt.add_column("score", "bigint")
    # the marquee Iceberg contract: same name, NEW field id — the old
    # files' physical score column must NOT come back
    re_read = vt.read()
    assert re_read.where(F.col("score").isNotNull()).count() == 0
    assert dict(re_read.dtypes)["score"] == "bigint"

    # a new commit provides the re-added column; only ITS rows carry it
    vt.commit(_pages(spark, 2), "drop_id")
    final = vt.read()
    assert final.count() == 80
    assert final.where(F.col("score").isNotNull()).count() == 40
    assert (final.where(F.col("drop_id") == 1)
            .where(F.col("score").isNotNull()).count() == 0)


def test_add_column_reads_typed_null_until_provided(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_pages(spark, 1), "drop_id")
    vt.add_column("lang", "string")
    df = vt.read()
    assert dict(df.dtypes)["lang"] == "string"
    assert df.where(F.col("lang").isNull()).count() == 40

    vt.commit(_pages(spark, 2).withColumn("lang", F.lit("en")),
              "drop_id")
    df = vt.read()
    assert df.where(F.col("lang") == "en").count() == 40
    assert (df.where(F.col("drop_id") == 1)
            .where(F.col("lang").isNull()).count() == 40)

    # adding an existing name raises; so does an invalid type
    with pytest.raises(ValueError, match="already exists"):
        vt.add_column("lang", "string")
    with pytest.raises(Exception):
        vt.add_column("bad", "not_a_type")


def test_update_column_type_widens_only(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    df1 = spark.createDataFrame([(1, i) for i in range(10)],
                                "drop_id int, v int")
    vt.commit(df1, "drop_id")
    vt.rename_column("v", "value")        # force the registry on
    with pytest.raises(ValueError, match="unsafe type change"):
        vt.update_column_type("value", "string")
    vt.update_column_type("value", "bigint")
    assert dict(vt.read().dtypes)["value"] == "bigint"
    assert sorted(r.value for r in vt.read().collect()) == list(range(10))

    big = 2**40
    df2 = spark.createDataFrame([(2, big)], "drop_id int, value bigint")
    vt.commit(df2, "drop_id")
    got = vt.read()
    assert got.where(F.col("value") == big).count() == 1
    assert got.count() == 11

    # a later NARROW commit is fine (reads cast up); an incompatible
    # same-name type raises
    vt.commit(spark.createDataFrame([(3, 77)], "drop_id int, value int"),
              "drop_id")
    assert vt.read().where(F.col("value") == 77).count() == 1
    bad = spark.createDataFrame([(4, "x")], "drop_id int, value string")
    with pytest.raises(ValueError, match="incompatible"):
        vt.commit(bad, "drop_id")


def test_guards_partition_column_and_collisions(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_pages(spark, 1), "drop_id")
    with pytest.raises(ValueError, match="partition column"):
        vt.rename_column("drop_id", "day")
    with pytest.raises(ValueError, match="partition column"):
        vt.drop_column("drop_id")
    vt.rename_column("url", "page_url")   # registry now exists
    with pytest.raises(ValueError, match="already exists"):
        vt.rename_column("seq", "page_url")
    with pytest.raises(ValueError, match="unknown column"):
        vt.rename_column("nope", "x")
    with pytest.raises(ValueError, match="unknown column"):
        vt.drop_column("nope")

    # single-column unpartitioned table: the last column is undroppable
    u = VersionedTable(spark, str(tmp_path / "u"))
    u.commit(spark.createDataFrame([("a",)], "k string"))
    u.rename_column("k", "key")
    with pytest.raises(ValueError, match="last column"):
        u.drop_column("key")


def test_stats_skipping_follows_rename(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    lay = (_pages(spark, 1, n=400)
           .repartitionByRange(8, "url").sortWithinPartitions("url"))
    vt.commit(lay, "drop_id", stats_cols=["url"])
    vt.rename_column("url", "page_url")
    lay2 = (_pages(spark, 2, n=400)
            .withColumnRenamed("url", "page_url")
            .repartitionByRange(8, "page_url")
            .sortWithinPartitions("page_url"))
    vt.commit(lay2, "drop_id")   # property inherited BY ID across rename

    # a point predicate on the CURRENT name prunes files in BOTH
    # epochs: the pre-rename epoch's stats are keyed by the old
    # physical name and the id mapping bridges them
    target = "u001007"
    plan = vt.plan_files(where=[("page_url", "==", target)])
    assert plan["files_total"] == 16
    assert plan["files_skipped"] >= 14
    got = vt.read(where=[("page_url", "==", target)])
    assert [r.seq for r in got.collect()] == [1007]

    # exactness across the whole rename on a range predicate
    w = [("page_url", "between", ("u001000", "u002005"))]
    a = sorted(r.seq for r in vt.read(where=w).collect())
    b = sorted(r.seq for r in vt.read().where(
        F.col("page_url").between("u001000", "u002005")).collect())
    assert a == b and len(a) > 0


def test_epoch_lacking_predicate_column_is_skipped(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_pages(spark, 1, n=200, with_score=False), "drop_id")
    vt.add_column("extra", "bigint")
    lay = (_pages(spark, 2, n=200, with_score=False)
           .withColumn("extra", F.col("seq") * 2)
           .repartitionByRange(4, "extra").sortWithinPartitions("extra"))
    vt.commit(lay, "drop_id", stats_cols=["extra"])

    # drop-1 files predate the column: they read all-NULL for it, so a
    # comparison predicate can never match there — every drop-1 file
    # is skipped without stats, plus in-epoch pruning on drop 2
    target = 2 * (2 * 1000 + 7)
    plan = vt.plan_files(where=[("extra", "==", target)])
    assert plan["files_skipped"] >= plan["files_total"] - 1
    got = vt.read(where=[("extra", "==", target)])
    assert [r.seq for r in got.collect()] == [2007]
    # exactness vs the plain spelling
    assert (vt.read(where=[("extra", ">=", 4300)]).count()
            == vt.read().where(F.col("extra") >= 4300).count())


def test_maintenance_ops_across_evolved_schema(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_pages(spark, 1), "drop_id", stats_cols=["url"])
    vt.commit(_pages(spark, 2), "drop_id")
    vt.rename_column("url", "page_url")

    # structured DELETE on the current name
    sid, st = vt.delete_where([("page_url", "==", "u001003")])
    assert sid is not None and st["rows_deleted"] == 1
    assert vt.read().where(F.col("page_url") == "u001003").count() == 0
    # pre-delete snapshot: old bytes, current schema
    pinned = vt.read(snapshot_id=2)
    assert pinned.where(F.col("page_url") == "u001003").count() == 1

    # MERGE with a source in the current schema (recrawl one url)
    src = spark.createDataFrame(
        [(2, 1005, "u001005", 999999)],
        "drop_id bigint, seq bigint, page_url string, score bigint")
    sid, st = vt.merge_into(src, ["page_url"])
    assert st["rows_replaced"] == 1 and st["rows_written"] == 1
    moved = vt.read().where(F.col("page_url") == "u001005").collect()
    assert len(moved) == 1 and moved[0].score == 999999
    assert moved[0].drop_id == 2

    # compaction is a logical no-op over the evolved epochs
    before = sorted((r.page_url, r.seq) for r in vt.read().collect())
    vt.rewrite_files(target_bytes=1)   # force no partition selection
    vt.rewrite_files()
    after = sorted((r.page_url, r.seq) for r in vt.read().collect())
    assert before == after


def test_expiry_compaction_keeps_alignment(spark, tmp_path):
    """The per-dir _cols.json mapping must survive manifest truncation:
    after expire_snapshots drops the epochs' own manifest entries, the
    compacted base still references their data dirs and reads must
    still align by field id."""
    root = str(tmp_path / "t")
    vt = VersionedTable(spark, root)
    vt.commit(_pages(spark, 1), "drop_id")
    vt.rename_column("url", "page_url")
    vt.commit(_pages(spark, 2).withColumnRenamed("url", "page_url"),
              "drop_id")
    vt.commit(_pages(spark, 3).withColumnRenamed("url", "page_url"),
              "drop_id")
    expect = sorted((r.page_url, r.seq) for r in vt.read().collect())

    vt.expire_snapshots(keep_last=1, orphan_grace_s=0.0)
    got = sorted((r.page_url, r.seq) for r in vt.read().collect())
    assert got == expect
    # the surviving epochs' dirs carry their own mapping files
    data = os.path.join(root, "data")
    tops = _snap_dirs(root)
    assert any(os.path.exists(os.path.join(data, t, _COLS_FILE))
               for t in tops)


def test_unpartitioned_table_evolution(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(spark.createDataFrame([(1, "a"), (2, "b")],
                                    "id int, name string"))
    vt.rename_column("name", "label")
    vt.drop_column("id")
    assert vt.read().columns == ["label"]
    assert {r.label for r in vt.read().collect()} == {"a", "b"}
    vt.commit(spark.createDataFrame([("c",)], "label string"))
    assert {r.label for r in vt.read().collect()} == {"c"}  # replace-all
