"""Production daily-ingest composition (VERDICT r3 #1): WARC drop ->
Bloom incremental dedup -> extract -> VersionedTable snapshot commit,
crash/resume byte-identity at the package surface."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ocr_spark.plans.ingest_job import run_ingest_job
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
