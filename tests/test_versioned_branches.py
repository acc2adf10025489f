"""Branch refs on VersionedTable — Iceberg BRANCHES + fast-forward
publish, the multi-commit generalization of write-audit-publish.

Contract under test (io.py):
  * commit(branch=) chains staged snapshots: read(ref=branch) = the
    fork-point view + the WHOLE chain (dynamic-overwrite shadowing
    within the chain); main and every published surface never see any
    of it; an explicit pin of a mid-chain id shows the chain UP TO it;
  * fast_forward publishes the chain's net effect as ONE metadata-only
    entry (no data read/moved), with the publish-style conflict check
    chain-wide: partitions the branch touched must be unchanged on
    main since the fork, merge-on-read deletes since the fork conflict,
    and a spec change since the fork is a hard block (commit to the
    branch included);
  * a branch read sees the delete state OF ITS FORK: main's later
    takedowns do not filter the branch lineage, earlier ones do;
  * expiry keeps a live branch's fork point and chain readable
    (compaction-aware); drop_branch releases them, fast-forwarded data
    stays live via the publish entry's references;
  * guards: one ref namespace, branch entries rejected by publish()/
    rollback_to(), replace_all/drop_partitions/staged= rejected on
    branch commits.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.sources.io import VersionedTable

SCHEMA = "drop_id INT, url STRING, text STRING"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df, *cols):
    cols = cols or ("drop_id", "url", "text")
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture()
def vt(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, [(1, "a", "x"), (1, "b", "y"), (2, "c", "z")]),
             "drop_id", stats_cols=["url"])
    return t


def test_branch_chain_read_and_isolation(spark, vt):
    base = vt.create_branch("audit")
    assert base == 1
    s1 = vt.commit(_df(spark, [(3, "d", "new")]), "drop_id",
                   branch="audit")
    s2 = vt.commit(_df(spark, [(3, "d", "newer"), (4, "e", "v4")]),
                   "drop_id", branch="audit")
    # chain shadowing: the second branch commit rewrote partition 3
    assert _rows(vt.read(ref="audit")) == [
        (1, "a", "x"), (1, "b", "y"), (2, "c", "z"),
        (3, "d", "newer"), (4, "e", "v4")]
    # mid-chain pin: chain UP TO s1 (not just "parent + s1's parts")
    assert _rows(vt.read(snapshot_id=s1)) == [
        (1, "a", "x"), (1, "b", "y"), (2, "c", "z"), (3, "d", "new")]
    # main never sees the branch
    assert _rows(vt.read()) == [(1, "a", "x"), (1, "b", "y"),
                                (2, "c", "z")]
    assert vt.changed_partitions(1) == {
        "appended": [], "rewritten": [], "dropped": [], "evolved": []}
    r = vt.refs()["audit"]
    assert r["base"] == 1 and r["head"] == s2


def test_fast_forward_publishes_net_delta(spark, vt):
    vt.create_branch("backfill")
    vt.commit(_df(spark, [(3, "d", "v1")]), "drop_id", branch="backfill")
    head = vt.commit(_df(spark, [(3, "d", "v2")]), "drop_id",
                     branch="backfill")
    # main advances on an UNTOUCHED partition meanwhile — no conflict
    main_mid = vt.commit(_df(spark, [(5, "m", "mm")]), "drop_id")
    ff = vt.fast_forward("backfill")
    assert ff == head + 2
    assert _rows(vt.read()) == [
        (1, "a", "x"), (1, "b", "y"), (2, "c", "z"),
        (3, "d", "v2"), (5, "m", "mm")]
    # net delta: consumers see exactly the branch's partitions appear
    ch = vt.changed_partitions(main_mid, ff)
    assert ch["appended"] == ["3"] and ch["rewritten"] == []
    # pre-ff pins byte-stable
    assert _rows(vt.read(snapshot_id=main_mid)) == [
        (1, "a", "x"), (1, "b", "y"), (2, "c", "z"), (5, "m", "mm")]
    # idempotent replay
    assert vt.fast_forward("backfill") == ff
    # the branch ref survives and still reads its own lineage
    assert (3, "d", "v2") in _rows(vt.read(ref="backfill"))
    assert vt.drop_branch("backfill") is True
    # published data survives the branch drop + expiry
    vt.expire_snapshots(keep_last=1)
    assert (3, "d", "v2") in _rows(vt.read())


def test_repeated_fast_forward_of_advancing_branch(spark, vt):
    """The Iceberg continuous-promotion workflow: commit → ff →
    commit more (rewriting the SAME partition) → ff again. Main
    carrying exactly a version THIS branch published is not a
    conflict, each publish carries only the chain's new work, and a
    genuine third-party change on main still conflicts."""
    vt.create_branch("b")
    vt.commit(_df(spark, [(3, "d", "v1")]), "drop_id", branch="b")
    ff1 = vt.fast_forward("b")
    assert (3, "d", "v1") in _rows(vt.read())
    vt.commit(_df(spark, [(3, "d", "v2"), (4, "e", "w")]),
              "drop_id", branch="b")
    ff2 = vt.fast_forward("b")
    assert ff2 is not None and ff2 != ff1
    got = _rows(vt.read())
    assert (3, "d", "v2") in got and (4, "e", "w") in got
    ch = vt.changed_partitions(ff1, ff2)
    assert set(ch["appended"]) | set(ch["rewritten"]) == {"3", "4"}
    # third-party rewrite of a branch partition still conflicts
    vt.commit(_df(spark, [(3, "d", "main")]), "drop_id")
    vt.commit(_df(spark, [(3, "d", "v3")]), "drop_id", branch="b")
    with pytest.raises(ValueError, match="changed on main"):
        vt.fast_forward("b")


def test_fast_forward_conflicts_and_force(spark, vt):
    vt.create_branch("b")
    vt.commit(_df(spark, [(2, "c", "branch-version")]), "drop_id",
              branch="b")
    vt.commit(_df(spark, [(2, "c", "main-version")]), "drop_id")
    with pytest.raises(ValueError, match="changed on main"):
        vt.fast_forward("b")
    ff = vt.fast_forward("b", force=True)
    assert ff is not None
    assert (2, "c", "branch-version") in _rows(vt.read())


def test_fast_forward_blocks_on_mor_delete_since_fork(spark, vt):
    vt.create_branch("b")
    vt.commit(_df(spark, [(2, "c", "edited")]), "drop_id", branch="b")
    vt.delete_where([("url", "==", "c")], mode="merge_on_read")
    with pytest.raises(ValueError, match="row_delete"):
        vt.fast_forward("b")


def test_branch_sees_fork_delete_state(spark, vt):
    # a takedown BEFORE the fork filters the branch lineage too
    vt.delete_where([("url", "==", "a")], mode="merge_on_read")
    vt.create_branch("b")
    vt.commit(_df(spark, [(3, "d", "v")]), "drop_id", branch="b")
    assert _rows(vt.read(ref="b"), "url") == [("b",), ("c",), ("d",)]
    # a takedown AFTER the fork is not part of the branch lineage
    vt.delete_where([("url", "==", "b")], mode="merge_on_read")
    assert _rows(vt.read(), "url") == [("c",)]
    assert _rows(vt.read(ref="b"), "url") == [("b",), ("c",), ("d",)]


def test_branch_spec_guard_is_hard(spark, vt):
    vt.create_branch("b")
    vt.commit(_df(spark, [(3, "d", "v")]), "drop_id", branch="b")
    vt.evolve_partition_spec("url", ("bucket", 4))
    with pytest.raises(ValueError, match="spec changed"):
        vt.commit(_df(spark, [(4, "e", "w")]), "url", branch="b")
    with pytest.raises(ValueError, match="spec changed"):
        vt.fast_forward("b", force=True)
    # the stale branch pin still READS — under its own fork spec
    assert (3, "d", "v") in _rows(vt.read(ref="b"))
    assert vt.partition_spec(snapshot_id=vt.refs()["b"]["head"]) == {
        "partition_col": "drop_id", "transform": None}


def test_branch_survives_expiry(spark, vt):
    vt.create_branch("keep")
    vt.commit(_df(spark, [(3, "d", "v3")]), "drop_id", branch="keep")
    vt.commit(_df(spark, [(4, "e", "v4")]), "drop_id", branch="keep")
    for i in range(5, 9):
        vt.commit(_df(spark, [(i, f"u{i}", "m")]), "drop_id")
    before = _rows(vt.read(ref="keep"))
    vt.expire_snapshots(keep_last=1)
    assert _rows(vt.read(ref="keep")) == before
    # and the chain can still fast-forward after truncation
    ff = vt.fast_forward("keep")
    assert ff is not None
    got = _rows(vt.read())
    assert (3, "d", "v3") in got and (4, "e", "v4") in got


def test_branch_guards(spark, vt):
    vt.create_branch("b")
    with pytest.raises(ValueError, match="not both"):
        vt.commit(_df(spark, [(3, "d", "v")]), "drop_id",
                  branch="b", staged=True)
    with pytest.raises(ValueError, match="plain dynamic"):
        vt.commit(_df(spark, [(3, "d", "v")]), "drop_id",
                  branch="b", replace_all=True)
    with pytest.raises(ValueError, match="plain dynamic"):
        vt.commit(_df(spark, [(3, "d", "v")]), "drop_id",
                  branch="b", drop_partitions=["2"])
    with pytest.raises(ValueError, match="unknown branch"):
        vt.commit(_df(spark, [(3, "d", "v")]), "drop_id",
                  branch="nope")
    assert vt.create_branch("b") == 1   # unchanged re-create: no-op
    with pytest.raises(ValueError, match="is a branch"):
        vt.create_tag("b")
    with pytest.raises(ValueError, match="is a branch"):
        vt.drop_tag("b")
    vt.create_tag("t1")
    with pytest.raises(ValueError, match="is a tag"):
        vt.drop_branch("t1")
    sid = vt.commit(_df(spark, [(3, "d", "v")]), "drop_id", branch="b")
    # a MOVED ref must be explicit: the branch now has a chain, so
    # re-creating it (head != base) raises
    with pytest.raises(ValueError, match="already exists"):
        vt.create_branch("b")
    with pytest.raises(ValueError, match="fast_forward"):
        vt.publish(sid)
    with pytest.raises(ValueError, match="staged"):
        vt.rollback_to(sid)
    # empty branch fast-forward publishes nothing
    vt.create_branch("empty")
    assert vt.fast_forward("empty") is None


def test_fast_forward_ignores_layout_only_compaction(spark, tmp_path):
    """A rewrite_files compaction on main between fork and publish
    moves partition dirs without touching rows — it must NOT read as
    a conflict (the check diffs LOGICAL views, like
    changed_partitions), and fast-forward replaces the touched
    partition's content as intended."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    # each partition split over 2 tasks -> 2 files per partition dir,
    # deterministically (union keeps the slices separate)
    p1 = _df(spark, [(1, "a", "x"), (1, "b", "y")]).repartition(2)
    p2 = _df(spark, [(2, "c", "z"), (2, "d", "w")]).repartition(2)
    vt.commit(p1.unionByName(p2), "drop_id")
    vt.create_branch("b")
    vt.commit(_df(spark, [(2, "c", "edited"), (2, "d", "w")]),
              "drop_id", branch="b")
    # main compacts BOTH partitions (2 files -> 1): layout only
    sid, stats = vt.rewrite_files(target_bytes=1 << 30)
    assert stats["partitions_rewritten"] == 2
    ff = vt.fast_forward("b")
    assert ff is not None
    assert (2, "c", "edited") in _rows(vt.read())
    assert (1, "a", "x") in _rows(vt.read())


def test_publish_ignores_layout_only_compaction(spark, tmp_path):
    """Same rule for single-commit WAP: stage, compact on main,
    publish — no false conflict."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    p1 = _df(spark, [(1, "a", "x"), (1, "b", "y")]).repartition(2)
    p2 = _df(spark, [(2, "c", "z"), (2, "d", "w")]).repartition(2)
    vt.commit(p1.unionByName(p2), "drop_id")
    aid = vt.commit(_df(spark, [(2, "c", "edited")]), "drop_id",
                    staged=True)
    sid, stats = vt.rewrite_files(target_bytes=1 << 30)
    assert stats["partitions_rewritten"] == 2
    sid = vt.publish(aid)
    assert sid is not None
    assert (2, "c", "edited") in _rows(vt.read())


def test_staged_branch_property_does_not_leak(spark, vt):
    """An explicit table property on a quarantined (branch/staged)
    commit must not rewrite MAIN's configuration: inheritance prefers
    published recordings."""
    vt.create_branch("b")
    vt.commit(_df(spark, [(3, "d", "v")]), "drop_id", branch="b",
              stats_cols=["text"], sort_order=["text"])
    sid = vt.commit(_df(spark, [(5, "m", "mm")]), "drop_id")
    e = next(s for s in vt.snapshots() if s["id"] == sid)
    assert e["stats_cols"] == ["url"]       # the fixture's property
    assert e.get("sort_order") is None or e["sort_order"] == []
    assert vt.sort_order() is None


def test_expiry_gap_not_healed_by_staged_survivor(spark, tmp_path):
    """Expiry must never change the live view — the kept-branch
    regression: a compacted STAGED survivor sits between a DROPPED
    rollback and the next published survivor. The staged entry is
    invisible to live folds, so it must not 'heal' the truncation gap:
    the next published survivor still has to compact (re-stating the
    rollback's delete-state and view), or the rollback's cancellation
    of a takedown — and its removal of a partition — silently
    reappear after a pure maintenance op."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_df(spark, [(1, "a", "x"), (2, "c", "z")]), "drop_id",
              stats_cols=["url"])                              # id 1
    vt.delete_where([("url", "==", "a")], mode="merge_on_read")  # id 2
    vt.commit(_df(spark, [(7, "g", "gg")]), "drop_id")           # id 3
    vt.create_branch("keep")                                   # base 3
    vt.rollback_to(1)            # id 4: url a back, partition 7 gone
    vt.commit(_df(spark, [(9, "i", "ii")]), "drop_id",
              branch="keep")                                     # id 5
    vt.commit(_df(spark, [(8, "h", "hh")]), "drop_id")           # id 6
    vt.commit(_df(spark, [(6, "f", "ff")]), "drop_id")           # id 7
    before = _rows(vt.read())
    assert ("a",) in {(u,) for _, u, _ in before}
    assert (7, "g", "gg") not in before
    vt.expire_snapshots(keep_last=2)   # drops ids 1, 2, 4
    assert _rows(vt.read()) == before
    # the branch pin keeps ITS fork state: url a filtered, p7 present
    got = _rows(vt.read(ref="keep"))
    assert ("a",) not in {(u,) for _, u, _ in got}
    assert (7, "g", "gg") in got and (9, "i", "ii") in got


def test_expiry_keeps_last_published_under_staged_tail(spark,
                                                       tmp_path):
    """A branch tail must not push the newest PUBLISHED entry out of
    the keep window: dropping it would lose the last takedowns from
    the live fold (no published survivor left to compact them onto)."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_df(spark, [(1, "a", "x"), (2, "c", "z")]), "drop_id",
              stats_cols=["url"])                              # id 1
    vt.create_branch("b")                                      # base 1
    vt.delete_where([("url", "==", "a")], mode="merge_on_read")  # id 2
    vt.commit(_df(spark, [(7, "g", "gg")]), "drop_id")           # id 3
    vt.commit(_df(spark, [(9, "i", "ii")]), "drop_id",
              branch="b")                                        # id 4
    vt.commit(_df(spark, [(9, "i", "jj")]), "drop_id",
              branch="b")                                        # id 5
    before = _rows(vt.read())
    assert ("a",) not in {(u,) for _, u, _ in before}
    vt.expire_snapshots(keep_last=2)   # tail = the two branch entries
    assert _rows(vt.read()) == before  # takedown still applies
    # and the branch pin still sees ITS fork state (a present — the
    # takedown postdates the fork)
    got = _rows(vt.read(ref="b"))
    assert ("a",) in {(u,) for _, u, _ in got}
    assert (9, "i", "jj") in got and (9, "i", "ii") not in got


def test_branch_pin_delete_state_survives_fork_expiry(spark,
                                                      tmp_path):
    """Positive carry coverage: after the prefix at the fork is
    truncated, a compacted chain entry's carried records still serve
    the BRANCH pin's fold (scoped by branch uid — never the live
    fold)."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit(_df(spark, [(1, "a", "x"), (2, "c", "z")]), "drop_id",
              stats_cols=["url"])                              # id 1
    vt.delete_where([("url", "==", "a")], mode="merge_on_read")  # id 2
    vt.create_branch("b")                                      # base 2
    vt.commit(_df(spark, [(9, "i", "ii")]), "drop_id",
              branch="b")                                        # id 3
    vt.rollback_to(1)                  # id 4: url a back on MAIN
    vt.commit(_df(spark, [(8, "h", "hh")]), "drop_id")           # id 5
    vt.commit(_df(spark, [(6, "f", "ff")]), "drop_id")           # id 6
    vt.expire_snapshots(keep_last=2)
    # main: rollback restored a
    assert ("a",) in {(u,) for _, u, _ in _rows(vt.read())}
    # branch: fork predates the rollback — a stays filtered
    got = _rows(vt.read(ref="b"))
    assert ("a",) not in {(u,) for _, u, _ in got}
    assert (9, "i", "ii") in got


def test_refs_metadata_table(spark, vt):
    """The .refs metadata table: tags and branches in one listing,
    branch rows tracking head and the fast-forward publish id."""
    vt.create_tag("v1")
    vt.create_branch("b")
    head = vt.commit(_df(spark, [(3, "d", "v")]), "drop_id",
                     branch="b")
    rows = {r.name: r for r in vt.refs_table().collect()}
    assert rows["v1"].kind == "tag" and rows["v1"].snapshot_id == 1
    assert rows["v1"].base is None
    b = rows["b"]
    assert (b.kind, b.base, b.head, b.published) == (
        "branch", 1, head, None)
    ff = vt.fast_forward("b")
    assert {r.name: r.published
            for r in vt.refs_table().collect()}["b"] == ff


def test_branch_on_unpartitioned_table(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "u"))
    vt.commit(_df(spark, [(1, "a", "x")]), None)
    vt.create_branch("b")
    vt.commit(_df(spark, [(1, "a", "x"), (2, "b", "y")]), None,
              branch="b")
    assert _rows(vt.read(ref="b"), "url") == [("a",), ("b",)]
    assert _rows(vt.read(), "url") == [("a",)]
    ff = vt.fast_forward("b")
    assert ff is not None
    assert _rows(vt.read(), "url") == [("a",), ("b",)]
