"""Production daily-ingest composition (VERDICT r3 #1): WARC drop ->
Bloom incremental dedup -> extract -> VersionedTable snapshot commit,
crash/resume byte-identity at the package surface."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ocr_spark.plans.ingest_job import (compact_history, retract_drop,
                                        run_ingest_job)
from ocr_spark.sources.io import VersionedTable
from ocr_spark.sources.warc import build_warc_bytes

_WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lamda mu nu xi omicron pi rho sigma tau upsilon ")


def _page(tag: str) -> bytes:
    body = f"essay {tag} " + _WORDS
    return (f"<html><body><nav><a href='/'>home</a></nav>"
            f"<p>{body}</p><footer>copyright footer</footer>"
            f"</body></html>").encode()


def _write_drop(root: str, name: str, records) -> None:
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "seg-0.warc.gz"), "wb") as f:
        f.write(build_warc_bytes(records))


def _latest(spark, out: str, snapshot_id=None):
    vt = VersionedTable(spark, os.path.join(out, "results"))
    rows = (vt.read(snapshot_id=snapshot_id)
            .select("url", "drop_id",
                    F.encode("extracted_text", "utf-8").alias("b"))
            .collect())
    return sorted((r["url"], r["drop_id"], bytes(r["b"])) for r in rows)


def test_ingest_two_drops_crash_resume_byte_identical(spark, tmp_path):
    """Two staged WARC drops with an overlapping page; a crash in the
    worst-case window (after the drop's snapshot commit AND fingerprint
    write, before its done marker), then resume. Pins: (a) the latest
    view is byte-identical to an uninterrupted run's; (b) the crashed
    drop's snapshot id stays byte-stable across the resume; (c) the
    already-seen page is extracted exactly once — the second drop's
    partition carries only its genuinely new pages; (d) a further
    resume is a no-op."""
    drops = str(tmp_path / "drops")
    dup = ("https://w.example.com/u2", "2026-01-01T00:00:00Z",
           _page("two"))
    _write_drop(drops, "day1", [
        ("https://w.example.com/u1", "2026-01-01T00:00:00Z", _page("one")),
        dup,
        ("https://w.example.com/u3", "2026-01-01T00:00:00Z",
         _page("three")),
    ])
    _write_drop(drops, "day2", [
        dup,  # byte-identical recrawl: must NOT be re-extracted
        ("https://w.example.com/u4", "2026-01-02T00:00:00Z", _page("four")),
        ("https://w.example.com/u5", "2026-01-02T00:00:00Z", _page("five")),
    ])

    # --- uninterrupted reference run ---
    out_a = str(tmp_path / "a")
    st = run_ingest_job(spark, drops, out_a, n_buckets=8)
    assert st["completed"] and st["drops_done"] == ["day1", "day2"]
    ref = _latest(spark, out_a)
    assert len(ref) == 5
    vt_a = VersionedTable(spark, out_a + "/results")
    day2 = {r["url"] for r in vt_a.read(partitions=["day2"]).collect()}
    assert day2 == {"https://w.example.com/u4",
                    "https://w.example.com/u5"}  # (c) seen-once
    # snapshot 1 pins the day1-only corpus
    assert {u for u, _, _ in _latest(spark, out_a, snapshot_id=1)} == {
        "https://w.example.com/u1", "https://w.example.com/u2",
        "https://w.example.com/u3"}
    # downstream incremental consumer (tokenize/pack since snapshot 1):
    # exactly the day2 partition, discovered from the manifest alone
    assert vt_a.changed_partitions(1) == {
        "appended": ["day2"], "rewritten": [], "dropped": [], "evolved": []}
    assert {r["url"] for r in vt_a.read_incremental(1).collect()} == day2

    # --- crashed run + resume ---
    out_b = str(tmp_path / "b")
    st1 = run_ingest_job(spark, drops, out_b, n_buckets=8,
                         fail_after_drops=1, fail_point="pre_mark")
    assert st1["completed"] is False
    assert st1["drops_done"] == []  # committed but unmarked
    snap1_before = _latest(spark, out_b, snapshot_id=1)
    st2 = run_ingest_job(spark, drops, out_b, n_buckets=8)
    assert st2["completed"] and st2["drops_done"] == ["day1", "day2"]
    assert _latest(spark, out_b) == ref                      # (a)
    assert _latest(spark, out_b, snapshot_id=1) == snap1_before  # (b)
    # the replayed day1 landed as a NEW snapshot shadowing the crashed
    # one at the same partition
    vt_b = VersionedTable(spark, out_b + "/results")
    assert [s["id"] for s in vt_b.snapshots()] == [1, 2, 3]
    # (d) nothing pending
    st3 = run_ingest_job(spark, drops, out_b, n_buckets=8)
    assert st3["completed"] and st3["drops_run"] == 0
    # lineage/metrics landed, and the replayed drop is distinguishable
    # by its attempt (exactly-once at read time via latest_metrics)
    mets = spark.read.parquet(os.path.join(out_b, "metrics"))
    assert mets.agg(F.max("attempt")).first()[0] == 2


def test_ingest_single_drop_one_new_doc(spark, tmp_path):
    """The reference upload-endpoint shape (ocr_project/ocr_app/
    views.py:18-26): one new document arriving after a corpus exists ->
    exactly one new persisted result row, one new snapshot, history
    untouched."""
    drops = str(tmp_path / "drops")
    _write_drop(drops, "d1", [
        ("https://w.example.com/a", "2026-01-01T00:00:00Z", _page("aa")),
    ])
    out = str(tmp_path / "o")
    run_ingest_job(spark, drops, out, n_buckets=4)
    # a later drop: the old doc again + ONE new upload
    _write_drop(drops, "d2", [
        ("https://w.example.com/a", "2026-01-02T00:00:00Z", _page("aa")),
        ("https://w.example.com/new", "2026-01-02T00:00:00Z",
         _page("upload")),
    ])
    st = run_ingest_job(spark, drops, out, n_buckets=4)
    assert st["drops_run"] == 1
    vt = VersionedTable(spark, out + "/results")
    new_rows = vt.read(partitions=["d2"]).collect()
    assert [r["url"] for r in new_rows] == ["https://w.example.com/new"]
    assert "upload" in new_rows[0]["extracted_text"]
    assert len(_latest(spark, out)) == 2


def test_ingest_merge_latest_recrawl(spark, tmp_path):
    """recrawl="merge_latest": the results table holds ONE row per url
    (latest content-distinct capture). Pins: a changed recapture
    replaces the old row and MOVES it to the new drop's partition
    (copy-on-write — the pre-recrawl snapshot still reads the old
    capture); a byte-identical recrawl leaves the existing row alone;
    within a drop the newest capture wins — INCLUDING in the table's
    first drop (the window runs pre-extraction, unconditionally);
    incremental consumers see the rewritten partition
    (read_incremental raises by default); a crash in the worst-case
    window of EITHER drop + resume is byte-identical; an all-dup drop
    commits nothing and its marker records snapshot_id None."""
    import json

    drops = str(tmp_path / "drops")
    u1, u2, u3 = (f"https://w.example.com/u{i}" for i in (1, 2, 3))
    dup = (u2, "2026-01-01T00:00:00Z", _page("two"))
    _write_drop(drops, "day1", [
        (u1, "2026-01-01T00:00:00Z", _page("one-old")),  # first-drop dup
        (u1, "2026-01-01T12:00:00Z", _page("one")),      # day1 winner
        dup])
    _write_drop(drops, "day2", [
        dup,                                        # byte-identical
        (u1, "2026-01-02T00:00:00Z", _page("one-v2a")),
        (u1, "2026-01-02T12:00:00Z", _page("one-v2b")),  # drop winner
        (u3, "2026-01-02T00:00:00Z", _page("three"))])
    _write_drop(drops, "day3", [dup])               # all-dup drop

    out_a = str(tmp_path / "a")
    st = run_ingest_job(spark, drops, out_a, n_buckets=8,
                        recrawl="merge_latest")
    assert st["completed"] and st["drops_done"] == [
        "day1", "day2", "day3"]
    vt = VersionedTable(spark, os.path.join(out_a, "results"))
    rows = {(r["url"], r["drop_id"]): r["extracted_text"]
            for r in vt.read().collect()}
    assert set(rows) == {(u1, "day2"), (u2, "day1"), (u3, "day2")}
    assert "essay one-v2b " in rows[(u1, "day2")]
    # day1's partition physically lost the moved url...
    day1 = {r["url"] for r in vt.read(partitions=["day1"]).collect()}
    assert day1 == {u2}
    # ...but the pre-recrawl snapshot pin still reads the old capture
    old = {r["url"]: r["extracted_text"]
           for r in vt.read(snapshot_id=1).collect()}
    assert set(old) == {u1, u2} and "essay one " in old[u1]
    # incremental consumers are TOLD day1 changed underneath them
    assert vt.changed_partitions(1) == {
        "appended": ["day2"], "rewritten": ["day1"], "dropped": [], "evolved": []}
    with pytest.raises(ValueError, match="non-append"):
        vt.read_incremental(1)
    inc = {r["url"] for r in
           vt.read_incremental(1, on_nonappend="skip").collect()}
    assert inc == {u1, u3}
    # ...and read_changes is the reconciliation path read_incremental
    # refuses: the recrawl is a delete+insert pair, the new url an
    # insert, and the untouched u2 capture does not appear at all
    cdc = {(r["url"], r["_change_type"]): r["extracted_text"]
           for r in vt.read_changes(1).collect()}
    assert set(cdc) == {(u1, "delete"), (u1, "insert"), (u3, "insert")}
    assert "essay one " in cdc[(u1, "delete")]
    assert "essay one-v2b " in cdc[(u1, "insert")]
    # the all-dup drop committed NO snapshot; its marker says so
    assert [s["id"] for s in vt.snapshots()] == [1, 2]
    with open(os.path.join(out_a, "_checkpoints", "drop-day3.done")) as f:
        assert json.load(f)["snapshot_id"] is None

    # crash in the worst-case window (post-merge, pre-marker) + resume,
    # injected into the MERGE drop (day2)...
    out_b = str(tmp_path / "b")
    st1 = run_ingest_job(spark, drops, out_b, n_buckets=8,
                         recrawl="merge_latest",
                         fail_after_drops=2, fail_point="pre_mark")
    assert st1["completed"] is False
    st2 = run_ingest_job(spark, drops, out_b, n_buckets=8,
                         recrawl="merge_latest")
    assert st2["completed"]
    assert _latest(spark, out_b) == _latest(spark, out_a)
    # ...and into the FIRST drop (whose replay takes the merge branch
    # against its own crashed commit — winners must be identical)
    out_c = str(tmp_path / "c")
    st3 = run_ingest_job(spark, drops, out_c, n_buckets=8,
                         recrawl="merge_latest",
                         fail_after_drops=1, fail_point="pre_mark")
    assert st3["completed"] is False
    st4 = run_ingest_job(spark, drops, out_c, n_buckets=8,
                         recrawl="merge_latest")
    assert st4["completed"]
    assert _latest(spark, out_c) == _latest(spark, out_a)


def test_history_compaction_preserves_exactly_once(spark, tmp_path):
    """compact_history folds the per-drop fingerprint dirs into one
    distinct table without changing the history VIEW: dups whose
    fingerprints moved into the compact dir still dedup, drops folded
    since still dedup, and a leftover per-drop dir already covered by
    the marker (the crash-between-flip-and-delete window) is ignored —
    even when poisoned with a hash that would wrongly swallow a new
    page. Staged drop tables are cleaned up after their done marker."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_spark.plans.ingest_job import (
        _history_view_dirs, compact_history)

    drops = str(tmp_path / "drops")
    dup1 = ("https://w.example.com/u1", "2026-01-01T00:00:00Z",
            _page("one"))
    dup2 = ("https://w.example.com/u2", "2026-01-02T00:00:00Z",
            _page("two"))
    _write_drop(drops, "day1", [dup1])
    _write_drop(drops, "day2", [dup2])
    out = str(tmp_path / "o")
    st = run_ingest_job(spark, drops, out, n_buckets=4,
                        compact_history_every=2)
    assert st["drops_run"] == 2
    hist = os.path.join(out, "_history")
    assert os.path.exists(os.path.join(hist, "_compact.json"))
    assert os.path.isdir(os.path.join(hist, "compact=1"))
    assert not os.path.isdir(os.path.join(hist, "drop=day1"))
    assert not os.path.isdir(os.path.join(hist, "drop=day2"))
    # staged tables cleaned up post-marker
    staged_root = os.path.join(out, "_staged")
    assert not any(n.startswith("drop=") for n in
                   os.listdir(staged_root)) if os.path.isdir(
                       staged_root) else True

    # day3: one dup now living ONLY in the compact dir + one new page
    _write_drop(drops, "day3", [
        dup1, ("https://w.example.com/u6", "2026-01-03T00:00:00Z",
               _page("six"))])
    run_ingest_job(spark, drops, out, n_buckets=4)  # no auto-compact
    vt = VersionedTable(spark, out + "/results")
    assert [r["url"] for r in vt.read(partitions=["day3"]).collect()] \
        == ["https://w.example.com/u6"]

    # day4: dup vs the UNCOMPACTED day3 dir + dup vs compact + new page
    _write_drop(drops, "day4", [
        dup2,
        ("https://w.example.com/u6b", "2026-01-04T00:00:00Z",
         _page("six")),  # same bytes as u6 -> content-dup vs day3
        ("https://w.example.com/u7", "2026-01-04T00:00:00Z",
         _page("seven"))])
    run_ingest_job(spark, drops, out, n_buckets=4)
    assert [r["url"] for r in vt.read(partitions=["day4"]).collect()] \
        == ["https://w.example.com/u7"]

    # poison a leftover covered dir: if the view wrongly read it, the
    # next drop's genuinely-new page would be deduped away and LOST
    from ocr_spark.operators.hashing import md5long
    from pyspark.sql import functions as F
    poison_page = _page("eight")
    poison_h = (spark.range(1)
                .select(md5long(F.lit(poison_page)).alias("_h"))
                .first()["_h"])
    leftover = os.path.join(hist, "drop=day1")
    os.makedirs(leftover, exist_ok=True)
    pq.write_table(
        pa.table({"_h": pa.array([poison_h], type=pa.int64())}),
        os.path.join(leftover, "part-0.parquet"))
    from ocr_spark.plans.ingest_job import DropManifest
    done = DropManifest(os.path.join(out, "_checkpoints")).done_drops()
    assert leftover not in _history_view_dirs(out, done)
    _write_drop(drops, "day5", [
        ("https://w.example.com/u8", "2026-01-05T00:00:00Z",
         poison_page)])
    run_ingest_job(spark, drops, out, n_buckets=4)
    assert [r["url"] for r in vt.read(partitions=["day5"]).collect()] \
        == ["https://w.example.com/u8"]

    # second compaction folds day3..day5 and removes the poisoned leftover
    res = compact_history(spark, out)
    assert res["compacted_drops"] == 3 and res["compact_id"] == 2
    assert not os.path.isdir(os.path.join(hist, "compact=1"))
    assert not os.path.isdir(leftover)
    # idempotent when nothing is pending
    assert compact_history(spark, out)["compacted_drops"] == 0


def test_keep_latest_within_drop_total_order_and_null_urls(spark):
    """The within-drop window's order is total over every PAGES_SCHEMA
    column that reaches extraction — two captures tying on (url,
    warc_ts, bytes) but differing in the lang hint must pick the SAME
    winner on every (replayed) evaluation — and NULL-url pages are
    dropped in merge mode (no url identity to merge on; append mode
    keeps them)."""
    import datetime

    from ocr_spark.plans.ingest_job import keep_latest_within_drop

    t = datetime.datetime(2026, 1, 1)
    rows = [("u", t, b"<p>x</p>", None, "en"),
            ("u", t, b"<p>x</p>", None, None),
            (None, t, b"<p>a</p>", None, None),
            (None, t, b"<p>b</p>", None, None)]
    schema = ("url string, warc_ts timestamp, html binary, "
              "text string, lang string")
    for data in (rows, list(reversed(rows))):
        df = spark.createDataFrame(data, schema)
        out = [(r.url, r.lang)
               for r in keep_latest_within_drop(df).collect()]
        assert out == [("u", "en")]


def test_retract_drop_end_to_end(spark, tmp_path):
    """retract_drop undoes an ingested drop EVERYWHERE the ingest
    protocol recorded it: the results partition tombstones, the drop's
    fingerprints leave the dedup history (a table-level rollback alone
    would leave them — a re-ingest would then silently drop the
    content as already-seen), and the done marker clears so the next
    run RE-INGESTS the drop to a byte-identical state."""
    drops = str(tmp_path / "drops")
    dup = ("https://w.example.com/u2", "2026-01-01T00:00:00Z",
           _page("two"))
    _write_drop(drops, "day1", [
        ("https://w.example.com/u1", "2026-01-01T00:00:00Z",
         _page("one")), dup])
    _write_drop(drops, "day2", [
        dup,   # already-seen vs day1: not extracted either time
        ("https://w.example.com/u4", "2026-01-02T00:00:00Z",
         _page("four"))])
    out = str(tmp_path / "out")
    run_ingest_job(spark, drops, out, n_buckets=8)
    ref = _latest(spark, out)
    assert {u for u, _, _ in ref} == {
        "https://w.example.com/u1", "https://w.example.com/u2",
        "https://w.example.com/u4"}

    st = retract_drop(spark, out, "day2")
    assert st["rows_deleted"] == 1 and st["results_snapshot"] is not None
    # live view = day1 only; day1's rows untouched
    assert {u for u, _, _ in _latest(spark, out)} == {
        "https://w.example.com/u1", "https://w.example.com/u2"}
    # history excludes day2's fingerprints and the marker is gone
    assert not os.path.isdir(
        os.path.join(out, "_history", "drop=day2"))
    assert not os.path.exists(
        os.path.join(out, "_checkpoints", "drop-day2.done"))
    # a completed retraction re-run raises (nothing left to retract)
    with pytest.raises(ValueError, match="not done"):
        retract_drop(spark, out, "day2")

    # re-ingest: day2 comes back byte-identical — its novel page
    # extracts again (fingerprints really left the history), the
    # already-seen page stays deduped vs day1
    st2 = run_ingest_job(spark, drops, out, n_buckets=8)
    assert st2["completed"]
    assert _latest(spark, out) == ref


def test_retract_drop_guards(spark, tmp_path):
    """Compacted-away fingerprints and merge_latest tables refuse
    retraction with directed errors (exact subtraction impossible /
    partition-grain unsound)."""
    drops = str(tmp_path / "drops")
    _write_drop(drops, "day1", [
        ("https://w.example.com/u1", "2026-01-01T00:00:00Z",
         _page("one"))])
    out = str(tmp_path / "out")
    run_ingest_job(spark, drops, out, n_buckets=8)
    compact_history(spark, out)
    with pytest.raises(ValueError, match="compacted"):
        retract_drop(spark, out, "day1")
    with pytest.raises(ValueError, match="not done"):
        retract_drop(spark, out, "nope")

    # merge_latest: the guard keys on an actual merge having happened
    # (a single plain bootstrap commit is still partition-sound)
    drops2 = str(tmp_path / "drops2")
    _write_drop(drops2, "day1", [
        ("https://w.example.com/u1", "2026-01-01T00:00:00Z",
         _page("one"))])
    _write_drop(drops2, "day2", [
        ("https://w.example.com/u1", "2026-01-02T00:00:00Z",
         _page("one-v2"))])
    out2 = str(tmp_path / "out2")
    run_ingest_job(spark, drops2, out2, n_buckets=8,
                   recrawl="merge_latest")
    with pytest.raises(ValueError, match="merge_latest"):
        retract_drop(spark, out2, "day2")


def test_ingest_url_stats_power_point_lookup_and_takedown(spark, tmp_path):
    """The ingest jobs set the results table's file-statistics property
    on url by default (stats_cols=("url",), shared by the streaming
    twin via commit_drop_results): with drops whose url ranges are
    lexically disjoint, a point lookup / takedown via
    read(where=[("url", "==", u)]) skips the other drops' files
    driver-side instead of scanning the corpus — and the takedown
    delete's own commit inherits the property, so the files it writes
    stay skippable."""
    drops = str(tmp_path / "drops")
    _write_drop(drops, "day1", [
        (f"https://a.example.com/u{i}", "2026-01-01T00:00:00Z",
         _page(f"a{i}")) for i in range(4)])
    _write_drop(drops, "day2", [
        (f"https://z.example.com/u{i}", "2026-01-02T00:00:00Z",
         _page(f"z{i}")) for i in range(4)])
    out = str(tmp_path / "o")
    st = run_ingest_job(spark, drops, out, n_buckets=8)
    assert st["completed"]
    vt = VersionedTable(spark, out + "/results")
    assert all(s.get("stats_cols") == ["url"] for s in vt.snapshots())

    target = "https://a.example.com/u2"
    plan = vt.plan_files(where=[("url", "==", target)])
    assert plan["files_skipped"] > 0          # day2's files pruned
    rows = vt.read(where=[("url", "==", target)]).collect()
    assert [r.url for r in rows] == [target]

    sid_pre = vt.snapshots()[-1]["id"]
    _, dstats = vt.delete_where(f"url = '{target}'")
    assert dstats["rows_deleted"] == 1
    assert vt.read(where=[("url", "==", target)]).count() == 0
    # the pinned pre-takedown snapshot still reads (and prunes) the row
    assert vt.read(snapshot_id=sid_pre,
                   where=[("url", "==", target)]).count() == 1
    # delete commit inherited the property: bounds still prune day2
    plan2 = vt.plan_files(where=[("url", "==", "https://a.example.com/u0")])
    assert plan2["files_skipped"] > 0


def test_merge_probe_bounded_by_url_index(spark, tmp_path, monkeypatch):
    """url-bucket -> partition side index (VERDICT r4 #7): the
    merge_latest probe reads ONLY the partitions the drop's url
    buckets name (plus the in-flight drop), never the corpus — and a
    lost sidecar rebuilds via bootstrap with identical results."""
    from ocr_spark.plans.ingest_job import UrlBucketIndex

    drops = str(tmp_path / "drops")
    A, B, C = ("https://idx.example.com/a", "https://idx.example.com/b",
               "https://idx.example.com/c")  # buckets 800 / 17 / 541
    _write_drop(drops, "d1", [(A, "2026-01-01T00:00:00Z", _page("aa"))])
    _write_drop(drops, "d2", [(B, "2026-01-02T00:00:00Z", _page("bb"))])
    out = str(tmp_path / "o")
    run_ingest_job(spark, drops, out, n_buckets=4,
                   recrawl="merge_latest")
    idx = UrlBucketIndex(out)
    assert idx.partitions_for([800]) == ["d1"]
    assert idx.partitions_for([17]) == ["d2"]

    # d3 recrawls B and adds C: the probe must name d2 + d3, NOT d1
    _write_drop(drops, "d3", [
        (B, "2026-01-03T00:00:00Z", _page("bb-v2")),
        (C, "2026-01-03T00:00:00Z", _page("cc"))])
    probes = []
    orig = VersionedTable.read

    def spy(self, *a, **kw):
        if kw.get("partitions") is not None:
            probes.append(sorted(kw["partitions"]))
        return orig(self, *a, **kw)

    monkeypatch.setattr(VersionedTable, "read", spy)
    run_ingest_job(spark, drops, out, n_buckets=4,
                   recrawl="merge_latest")
    monkeypatch.setattr(VersionedTable, "read", orig)
    # d3 itself is in the probe SET but not yet live, so the actual
    # read is exactly [d2]; on a crash replay d3 IS live and survives
    # the liveness intersection — the superset argument
    assert ["d2"] in probes
    assert not any("d1" in p for p in probes), probes
    rows = {(u, d) for u, d, _ in _latest(spark, out)}
    assert rows == {(A, "d1"), (B, "d3"), (C, "d3")}
    # index tracked the merge: B's bucket now names both d2 and d3
    # (stale superset is the documented discipline)
    assert "d3" in idx.partitions_for([17])

    # lost sidecar: bootstrap rebuilds from one url scan, results equal
    os.unlink(os.path.join(out, UrlBucketIndex.FILE))
    _write_drop(drops, "d4", [
        (A, "2026-01-04T00:00:00Z", _page("aa-v2"))])
    run_ingest_job(spark, drops, out, n_buckets=4,
                   recrawl="merge_latest")
    rows = {(u, d) for u, d, _ in _latest(spark, out)}
    assert rows == {(A, "d4"), (B, "d3"), (C, "d3")}
    assert idx.partitions_for([800]) == ["d1", "d4"]
