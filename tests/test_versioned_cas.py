"""Cross-process optimistic-concurrency commits (VERDICT r4 #3).

The manifest write is a compare-and-swap on a versioned path
(``_v/<n>.json`` claimed by atomic ``os.link``); the lock file is only
contention avoidance. Contract under test:
  * N real PROCESSES x M appends each, lock DISABLED (pure CAS): every
    append lands, snapshot ids are exactly 1..N*M, no entry lost;
  * ``commit()`` rebases and retries after losing the CAS to a rival
    committer (fresh read, re-numbered id, both commits' rows live);
  * lock takeover no longer needs pid-liveness: an expired lease is
    taken over even when the recorded pid is alive (safe — CAS guards
    correctness), and no ``_LOCK`` file survives;
  * legacy tables (mirror file only, no ``_v/``) read fine and their
    first new write claims version 1 carrying the full history;
  * deep version history is pruned, recent versions kept.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import pytest

from ocr_spark.sources.io import (
    CommitConflict, VersionedTable, _ManifestLock,
)


def _append_worker(args):
    root, wid, n = args
    os.environ["OCR_SPARK_NO_LOCK"] = "1"
    vt = VersionedTable(None, root)  # manifest ops never touch spark
    got = []
    for i in range(n):
        while True:
            snaps = vt.snapshots()
            sid = (snaps[-1]["id"] + 1) if snaps else 1
            entry = {"id": sid, "ts": 0.0, "note": f"w{wid}c{i}",
                     "operation": "write", "partition_col": "p",
                     "replace_all": False, "parts": {}}
            try:
                vt._write_manifest(snaps + [entry])
            except CommitConflict:
                continue  # rebase: re-read, re-number, retry
            got.append(sid)
            break
    return got


def test_multiprocess_appends_lose_nothing(tmp_path):
    root = str(tmp_path / "t")
    N, M = 4, 25
    ctx = mp.get_context("fork")
    with ctx.Pool(N) as pool:
        ids = pool.map(_append_worker,
                       [(root, w, M) for w in range(N)])
    flat = sorted(i for part in ids for i in part)
    assert flat == list(range(1, N * M + 1))
    vt = VersionedTable(None, root)
    snaps = vt.snapshots()
    assert [s["id"] for s in snaps] == flat
    notes = {s["note"] for s in snaps}
    assert notes == {f"w{w}c{i}" for w in range(N) for i in range(M)}
    assert not os.path.exists(os.path.join(root, "_LOCK"))


def test_commit_rebases_after_cas_loss(spark, tmp_path, monkeypatch):
    # disable the contention lock so the rival can interleave — this
    # IS the cross-host scenario the CAS exists for
    monkeypatch.setenv("OCR_SPARK_NO_LOCK", "1")
    root = str(tmp_path / "t")
    vt = VersionedTable(spark, root)
    df = lambda p, v: spark.createDataFrame([(p, v)], "p INT, v STRING")
    vt.commit(df(1, "base"), "p")
    rival = VersionedTable(spark, root)
    state = {"fired": False, "rival_sid": None}
    real = vt._write_manifest

    def raced(snaps):
        if not state["fired"]:
            state["fired"] = True
            # rival claims the next version between our read and write
            state["rival_sid"] = rival.commit(df(2, "rival"), "p")
        return real(snaps)

    vt._write_manifest = raced
    sid = vt.commit(df(3, "mine"), "p")
    vt._write_manifest = real
    assert state["rival_sid"] == 2 and sid == 3  # rebased, re-numbered
    rows = {(r["p"], r["v"]) for r in vt.read().collect()}
    assert rows == {(1, "base"), (2, "rival"), (3, "mine")}
    ids = [s["id"] for s in vt.snapshots()]
    assert ids == [1, 2, 3]


def test_lock_lease_takeover_without_pid_liveness(tmp_path):
    root = str(tmp_path)
    lockfile = os.path.join(root, "_LOCK")
    # a LIVE pid (our own) holds the lock, but the lease has expired:
    # pre-r5 pid-liveness would block to timeout; now age wins
    with open(lockfile, "w") as f:
        f.write(str(os.getpid()))
    old = time.time() - _ManifestLock.lease_s - 5
    os.utime(lockfile, (old, old))
    t0 = time.time()
    with _ManifestLock(root, timeout=10.0):
        assert time.time() - t0 < 5.0  # took over, didn't wait out
    assert not os.path.exists(lockfile)
    # a FRESH lock held by a live pid still blocks to timeout
    with open(lockfile, "w") as f:
        f.write(str(os.getpid()))
    with pytest.raises(TimeoutError):
        with _ManifestLock(root, timeout=0.3):
            pass
    os.unlink(lockfile)


def test_legacy_mirror_table_bootstraps_into_cas(spark, tmp_path):
    root = str(tmp_path / "t")
    vt = VersionedTable(spark, root)
    df = lambda p, v: spark.createDataFrame([(p, v)], "p INT, v STRING")
    vt.commit(df(1, "a"), "p")
    vt.commit(df(2, "b"), "p")
    # simulate a table written before versioned manifests existed
    import shutil
    shutil.rmtree(os.path.join(root, "_v"))
    fresh = VersionedTable(spark, root)
    assert [s["id"] for s in fresh.snapshots()] == [1, 2]  # mirror read
    fresh.commit(df(3, "c"), "p")
    with open(os.path.join(root, "_v", "1.json")) as f:
        v1 = json.load(f)
    assert [s["id"] for s in v1] == [1, 2, 3]  # full history carried
    assert {r["v"] for r in fresh.read().collect()} == {"a", "b", "c"}


def test_version_history_pruned(tmp_path):
    root = str(tmp_path / "t")
    vt = VersionedTable(None, root)
    n = 2 * VersionedTable._KEEP_VERSIONS + 20
    snaps = []
    for i in range(1, n + 1):
        snaps = snaps + [{"id": i, "ts": 0.0, "note": "", "operation":
                          "write", "partition_col": None,
                          "replace_all": True, "parts": {}}]
        vt.snapshots()
        vt._write_manifest(snaps)
    versions = sorted(int(f[:-5]) for f in
                      os.listdir(os.path.join(root, "_v"))
                      if f.endswith(".json"))
    assert versions[-1] == n
    assert len(versions) <= VersionedTable._KEEP_VERSIONS + 2
    assert versions[0] >= n - VersionedTable._KEEP_VERSIONS
    # the recent tail a lagging reader may resolve is intact
    assert versions[-VersionedTable._KEEP_VERSIONS:] == list(
        range(n - VersionedTable._KEEP_VERSIONS + 1, n + 1))
