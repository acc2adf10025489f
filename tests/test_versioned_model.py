"""Model-based random walk over the full VersionedTable surface.

A pure-Python model (a row multiset + per-url replace rules) steps
through a SEEDED random sequence of commit / delete_where / merge_into
/ rewrite_files / expire_snapshots, and after EVERY op the table's
latest view must equal the model exactly — including a seeded
file-skipped read (read(where=...) on a stats-carrying table, the
property enabled by the walk's first commit and inherited through
every maintenance op) checked against the model filtered in Python. Alongside, one mid-walk
snapshot is pinned and must read byte-stably until expiry truncates
past it — the time-travel contract under arbitrary op interleavings.
This is the cross-feature test the per-feature suites can't express:
e.g. a merge over a partition that a delete tombstoned and a rewrite
then compacted.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ocr_spark.sources.io import (VersionedTable, _transform_py,
                                  _validate_transform)

COLS = ["drop_id", "url", "score"]

_BUCKET_TF = {"kind": "bucket", "n": 4}


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "drop_id INT, url STRING, score INT")


def _read(vt, snapshot_id=None):
    return sorted((r.drop_id, r.url, r.score)
                  for r in vt.read(snapshot_id=snapshot_id).collect())


@pytest.mark.parametrize("seed,layout", [
    (7, "drop"), (23, "drop"), (91, "drop"),
    # hidden partitioning: the SAME walk over a bucket(4, url) layout —
    # every op's partition membership goes through the transform, and
    # commit/stage/publish replacement happens at BUCKET grain
    (11, "bucket"), (37, "bucket")])
def test_versioned_table_random_walk_matches_model(spark, tmp_path, seed,
                                                   layout):
    rnd = random.Random(seed)
    # the spec is WALK STATE now: the "evolve" op toggles between the
    # identity and hidden-bucket layouts mid-walk, and every later op
    # must keep matching the model under the new spec
    spec = [("drop_id", None) if layout == "drop"
            else ("url", ("bucket", 4))]
    evolve_ids: set[int] = set()
    pinned_any = [False]

    def key_of(r):
        pc, t = spec[0]
        v = r[0] if pc == "drop_id" else r[1]
        return _transform_py(_validate_transform(t), v)
    vt = VersionedTable(spark, str(tmp_path / f"t{seed}"))
    model: list[tuple] = []          # latest-view row multiset
    pins: dict[int, list] = {}       # snapshot id -> expected rows
    staged_pending: dict[int, list] = {}   # staged id -> its rows
    audit_expect: dict[int, list] = {}     # staged id -> audit view
    model_at: dict[int, list] = {}   # published id -> model rows then
    spec_of: dict[int, tuple] = {}   # published id -> spec active then
    # at most one live BRANCH: its own lineage model (fork rows +
    # chain replacements under the FORK spec), the fork spec, and the
    # partition keys its chain touched (the fast-forward delta)
    branch_st: list[dict | None] = [None]

    def _branch_key(st, r):
        pc, t = st["spec"]
        v = r[0] if pc == "drop_id" else r[1]
        return _transform_py(_validate_transform(t), v)

    def fresh_rows(n):
        return [(rnd.randint(1, 4), f"u{rnd.randint(0, 9)}",
                 rnd.randint(0, 99)) for _ in range(n)]

    # op 0 is always a commit so every later op has a table to act on
    for step in range(18):
        op = "commit" if step == 0 else rnd.choice(
            ["commit", "commit", "delete", "merge", "rewrite", "expire",
             "apply", "stage", "publish", "evolve", "rollback",
             "branch", "branch_commit", "branch_ff"])
        if op == "publish" and not staged_pending:
            op = "commit"
        if op == "branch" and branch_st[0] is not None:
            op = "branch_commit"
        if op in ("branch_commit", "branch_ff") and branch_st[0] is None:
            op = "branch"
        if op == "commit":
            rows = fresh_rows(rnd.randint(1, 5))
            sid = vt.commit(_df(spark, rows), spec[0][0],
                            note=f"step {step}",
                            stats_cols=(["score", "url"] if step == 0
                                        else None),
                            partition_transform=(spec[0][1] if step == 0
                                                 else None))
            parts = {key_of(r) for r in rows}
            model = [r for r in model if key_of(r) not in parts] + rows
        elif op == "delete":
            cut = rnd.randint(0, 99)
            # rotate spellings: Column CoW, structured CoW (routes the
            # affected-partition probe through the file-skipped read),
            # and merge-on-read (metadata-only; reads apply the
            # predicate to the predating affected partitions) — all
            # three must be logically IDENTICAL to the model
            spell = step % 3
            if spell == 0:
                sid, _ = vt.delete_where(F.col("score") < cut)
            elif spell == 1:
                sid, _ = vt.delete_where([("score", "<", cut)])
            else:
                sid, _ = vt.delete_where([("score", "<", cut)],
                                         mode="merge_on_read")
            model = [r for r in model if not r[2] < cut]
        elif op == "apply":
            sid, _ = vt.apply_deletes()      # logical no-op
        elif op == "stage":
            # write-audit-publish: the staged commit must change
            # NOTHING observable (the generic post-op checks below),
            # while its own pin reads the frozen audit view — live at
            # stage time with the staged partitions replaced
            rows = fresh_rows(rnd.randint(1, 4))
            aid = vt.commit(_df(spark, rows), spec[0][0],
                            note=f"staged {step}", staged=True)
            staged_pending[aid] = rows
            parts = {key_of(r) for r in rows}
            audit_expect[aid] = sorted(
                [r for r in model if key_of(r) not in parts] + rows)
            sid = None   # never pin a staged id against the live model
        elif op == "publish":
            pick = rnd.choice(sorted(staged_pending))
            rows = staged_pending.pop(pick)
            try:
                sid = vt.publish(pick)
            except ValueError:
                # conflicted (a later op changed a staged partition) or
                # compacted — the quarantine is simply abandoned; live
                # must be untouched (generic checks below)
                audit_expect.pop(pick, None)
                sid = None
            else:
                parts = {key_of(r) for r in rows}
                model = [r for r in model
                         if key_of(r) not in parts] + rows
        elif op == "merge":
            # unique urls in the source (MERGE cardinality contract)
            srcs = {}
            for r in fresh_rows(rnd.randint(1, 4)):
                srcs[r[1]] = r
            rows = list(srcs.values())
            sid, _ = vt.merge_into(_df(spark, rows), ["url"],
                                   note=f"step {step}")
            keys = set(srcs)
            model = [r for r in model if r[1] not in keys] + rows
        elif op == "rewrite":
            sid, _ = vt.rewrite_files()      # logical no-op
        elif op == "evolve":
            # partition-spec evolution: toggle identity <-> bucket(4).
            # Rows are preserved exactly; the walk keeps checking the
            # SAME model while every later op runs under the new spec
            # (and a staged snapshot predating it can no longer
            # publish — exercised by the publish branch's except).
            new = (("url", ("bucket", 4))
                   if spec[0][0] == "drop_id" else ("drop_id", None))
            sid = vt.evolve_partition_spec(new[0], new[1])
            spec[0] = new
            evolve_ids.add(sid)
        elif op == "rollback":
            # restore a random earlier recorded state: the model (and
            # the walk's spec tracking) jump back with it — rolled-past
            # pins/audits must stay readable (generic checks below)
            latest = vt.snapshots()[-1]["id"]
            targets = [i for i in sorted(model_at) if i != latest]
            if not targets:
                sid = None
            else:
                tgt = rnd.choice(targets)
                sid = vt.rollback_to(tgt)
                model = list(model_at[tgt])
                spec[0] = spec_of[tgt]
        elif op == "branch":
            # fork a branch at the latest published snapshot: its
            # lineage model starts as the CURRENT live model and from
            # here on evolves independently of main
            name = f"b{step}"
            vt.create_branch(name)
            branch_st[0] = {"name": name, "model": list(model),
                            "spec": spec[0], "touched": set()}
            sid = None
        elif op == "branch_commit":
            st = branch_st[0]
            rows = fresh_rows(rnd.randint(1, 4))
            try:
                vt.commit(_df(spark, rows), st["spec"][0],
                          branch=st["name"])
            except ValueError:
                # only a spec change since the fork may reject a
                # branch commit — anything else is a real bug
                assert spec[0] != st["spec"], (
                    f"seed {seed} step {step}: branch commit raised "
                    "without a spec change")
            else:
                parts = {_branch_key(st, r) for r in rows}
                st["model"] = [r for r in st["model"]
                               if _branch_key(st, r) not in parts] + rows
                st["touched"] |= parts
            sid = None
        elif op == "branch_ff":
            st = branch_st[0]
            try:
                fid = vt.fast_forward(st["name"])
            except ValueError:
                # conflicted (main changed a touched partition / a
                # takedown since the fork) or spec-blocked: live must
                # be untouched (generic checks below); the branch
                # stays for a later attempt
                sid = None
            else:
                if fid is not None:
                    t = st["touched"]
                    model = ([r for r in model
                              if _branch_key(st, r) not in t]
                             + [r for r in st["model"]
                                if _branch_key(st, r) in t])
                    sid = fid
                else:
                    sid = None   # empty branch: nothing published
                if fid is None or rnd.random() < 0.5:
                    vt.drop_branch(st["name"])
                    branch_st[0] = None
                # else: branch kept ALIVE post-publish — later
                # branch_commits extend the chain and a later
                # branch_ff exercises REPEATED fast-forward (main at
                # this branch's own published versions is not a
                # conflict; each publish carries only new work)
        else:
            keep = rnd.randint(2, 4)
            vt.expire_snapshots(keep)
            # eviction is ALIVE-set based, not oldest-id based: a live
            # branch's keep set leaves HOLES in the id line (its chain
            # and fork survive while intermediate published ids drop)
            alive = {s["id"] for s in vt.snapshots()}
            for old in [p for p in pins if p not in alive]:
                pins.pop(old)
            # truncated staged snapshots are gone (quarantine GC'd);
            # a staged entry SURVIVING as the compacted base must keep
            # reading its audit view, so it stays checked
            for old in [a for a in staged_pending if a not in alive]:
                staged_pending.pop(old)
                audit_expect.pop(old, None)
            for old in [a for a in audit_expect if a not in alive]:
                audit_expect.pop(old)
            for old in [m for m in model_at if m not in alive]:
                model_at.pop(old)
            sid = None
        if sid is not None:
            model_at[sid] = list(model)
            spec_of[sid] = spec[0]

        assert _read(vt) == sorted(model), f"seed {seed} step {step} {op}"
        # CDC changelog between a seeded pair of surviving published
        # ids (0 = the empty pre-table) must equal the model multiset
        # diff — insert/delete rows, updates as delete+insert pairs
        endpoints = [0] + sorted(model_at)
        i, j = sorted((rnd.choice(endpoints), rnd.choice(endpoints)))
        from collections import Counter
        ci = Counter(model_at[i]) if i else Counter()
        cj = Counter(model_at[j]) if j else Counter()
        expect = sorted(
            [(r, "insert") for r in (cj - ci).elements()]
            + [(r, "delete") for r in (ci - cj).elements()])
        try:
            got = sorted(((r.drop_id, r.url, r.score), r._change_type)
                         for r in vt.read_changes(i, j).collect())
        except ValueError as err:
            # a range mixing a spec evolution with data changes refuses
            # with ordered split points — anything else is a real bug
            assert "sub-ranges" in str(err) and any(
                i < e <= j for e in evolve_ids), (
                f"seed {seed} step {step} {op}: read_changes({i},{j}) "
                f"raised unexpectedly: {err}")
        else:
            assert got == expect, (
                f"seed {seed} step {step} {op}: read_changes({i},{j}) "
                f"diverged from the model diff")
        # seeded file-skipped read vs the model filtered in Python
        lo = rnd.randint(0, 99)
        hi = rnd.randint(lo, 99)
        got = sorted((r.drop_id, r.url, r.score) for r in
                     vt.read(where=[("score", "between", (lo, hi))])
                     .collect())
        assert got == sorted(r for r in model if lo <= r[2] <= hi), (
            f"seed {seed} step {step} {op}: where-read diverged")
        # pin one committing step's view and check every surviving pin
        if sid is not None and len(pins) < 2:
            pins[sid] = _read(vt)
            pinned_any[0] = True
        for pid, expected in pins.items():
            assert _read(vt, snapshot_id=pid) == expected, (
                f"seed {seed} step {step}: pinned snapshot {pid} drifted "
                f"after {op}")
        # every surviving staged snapshot's AUDIT view is frozen at
        # stage time — byte-stable under arbitrary later ops, published
        # or not, including survival as the expiry-compacted base
        for aid, expected in audit_expect.items():
            assert _read(vt, snapshot_id=aid) == expected, (
                f"seed {seed} step {step}: staged audit view {aid} "
                f"drifted after {op}")
        # a live branch's view is ITS OWN lineage — byte-stable under
        # every main-side op (commits, deletes, merges, rollbacks,
        # expiry compaction), evolving only with its own chain
        if branch_st[0] is not None:
            st = branch_st[0]
            got = sorted((r.drop_id, r.url, r.score)
                         for r in vt.read(ref=st["name"]).collect())
            assert got == sorted(st["model"]), (
                f"seed {seed} step {step}: branch view {st['name']} "
                f"diverged after {op}")

    # the walk must have exercised time travel at least once (pins may
    # have been dropped by a late expiry — the checks still ran)
    assert pinned_any[0]


# ---- the schema-evolution walk ----
#
# Same discipline, but the model is FIELD-ID-native (rows are
# {fid: value} dicts and the expected view is projected through the
# model's own live-column list), mirroring exactly the semantics the
# registry implements: renames change display only, drop hides a fid,
# re-add allocates a NEW fid (old values must not resurface), widening
# changes nothing about values. Every step checks the latest view, a
# seeded range read on a never-renamed column, a seeded POINT read on
# the rename-toggled column (exercising stats translation across name
# epochs), and every surviving snapshot pin — under arbitrary
# interleavings with delete / merge / rewrite / expire.

_FID_DROP, _FID_URL, _FID_SCORE = 1, 2, 3


def _nkey(t):
    return tuple((v is None, v) for v in t)


@pytest.mark.parametrize("seed", [11, 37])
def test_random_walk_with_schema_evolution(spark, tmp_path, seed):
    rnd = random.Random(seed)
    vt = VersionedTable(spark, str(tmp_path / f"e{seed}"))
    model: list[dict] = []               # latest view, {fid: value}
    pins: dict[int, list[dict]] = {}     # snapshot id -> model rows then
    live = [(_FID_DROP, "drop_id"), (_FID_URL, "url"),
            (_FID_SCORE, "score")]
    next_fid = 4
    extra_fid: int | None = None         # live fid of "extra", if any
    widened = False

    def url_name():
        return dict((f, n) for f, n in live)[_FID_URL]

    def fresh_rows(n):
        out = []
        for _ in range(n):
            r = {_FID_DROP: rnd.randint(1, 4),
                 _FID_URL: f"u{rnd.randint(0, 9)}",
                 _FID_SCORE: rnd.randint(0, 99)}
            if extra_fid is not None:
                r[extra_fid] = rnd.randint(100, 199)
            out.append(r)
        return out

    def to_df(rows):
        ddl = f"drop_id INT, {url_name()} STRING, score INT"
        if extra_fid is not None:
            ddl += ", extra INT"
        fids = [_FID_DROP, _FID_URL, _FID_SCORE] + (
            [extra_fid] if extra_fid is not None else [])
        return spark.createDataFrame(
            [tuple(r.get(f) for f in fids) for r in rows], ddl)

    def expect(rows):
        return sorted((tuple(r.get(f) for f, _ in live) for r in rows),
                      key=_nkey)

    def read_all(snapshot_id=None):
        df = vt.read(snapshot_id=snapshot_id)
        names = [n for _, n in live]
        # the column SET must track the model exactly; ORDER follows
        # the registry (captured from the merged live schema at init),
        # which need not match the model's bookkeeping order
        assert sorted(df.columns) == sorted(names)
        return sorted((tuple(row) for row in
                       df.select(names).collect()), key=_nkey)

    for step in range(18):
        op = "commit" if step == 0 else rnd.choice(
            ["commit", "commit", "delete", "merge", "rewrite",
             "expire", "evolve", "evolve"])
        sid = None
        if op == "commit":
            rows = fresh_rows(rnd.randint(1, 5))
            sid = vt.commit(to_df(rows), "drop_id", note=f"step {step}",
                            stats_cols=(["score", "url"] if step == 0
                                        else None))
            parts = {r[_FID_DROP] for r in rows}
            model = [r for r in model
                     if r[_FID_DROP] not in parts] + rows
        elif op == "delete":
            cut = rnd.randint(0, 99)
            sid, _ = vt.delete_where(
                F.col("score") < cut if step % 2
                else [("score", "<", cut)])
            model = [r for r in model if not r[_FID_SCORE] < cut]
        elif op == "merge":
            srcs = {}
            for r in fresh_rows(rnd.randint(1, 4)):
                srcs[r[_FID_URL]] = r
            rows = list(srcs.values())
            sid, _ = vt.merge_into(to_df(rows), [url_name()],
                                   note=f"step {step}")
            model = [r for r in model if r[_FID_URL] not in srcs] + rows
        elif op == "rewrite":
            sid, _ = vt.rewrite_files()
        elif op == "expire":
            vt.expire_snapshots(rnd.randint(2, 4))
            oldest = vt.snapshots()[0]["id"]
            for old in [p for p in pins if p < oldest]:
                pins.pop(old)
        else:
            kind = rnd.choice(["rename", "extra", "widen"])
            if kind == "rename":
                old, new = url_name(), (
                    "page_url" if url_name() == "url" else "url")
                vt.rename_column(old, new)
                live = [(f, new if f == _FID_URL else n)
                        for f, n in live]
            elif kind == "extra":
                if extra_fid is None:
                    vt.add_column("extra", "int")
                    extra_fid = next_fid
                    next_fid += 1
                    live = live + [(extra_fid, "extra")]
                else:
                    vt.drop_column("extra")
                    live = [(f, n) for f, n in live if f != extra_fid]
                    extra_fid = None
            elif not widened:
                vt.update_column_type("score", "bigint")
                widened = True

        assert read_all() == expect(model), (
            f"seed {seed} step {step} {op}")
        # seeded range read on the never-renamed column
        lo = rnd.randint(0, 99)
        hi = rnd.randint(lo, 99)
        got = sorted((tuple(row) for row in
                      vt.read(where=[("score", "between", (lo, hi))])
                      .select([n for _, n in live]).collect()),
                     key=_nkey)
        assert got == expect(r for r in model
                             if lo <= r[_FID_SCORE] <= hi), (
            f"seed {seed} step {step} {op}: range where-read diverged")
        # seeded POINT read on the rename-toggled column: predicate
        # translation must bridge every physical-name epoch
        u = f"u{rnd.randint(0, 9)}"
        got = sorted((tuple(row) for row in
                      vt.read(where=[(url_name(), "==", u)])
                      .select([n for _, n in live]).collect()),
                     key=_nkey)
        assert got == expect(r for r in model if r[_FID_URL] == u), (
            f"seed {seed} step {step} {op}: point where-read diverged")
        if sid is not None and len(pins) < 2:
            pins[sid] = [dict(r) for r in model]
        for pid, rows_then in pins.items():
            # pinned BYTES are stable; the pinned SCHEMA is the current
            # one (Iceberg: schema is table-level) — so the expectation
            # is the pin-time row set projected through TODAY's columns
            assert read_all(snapshot_id=pid) == expect(rows_then), (
                f"seed {seed} step {step}: pin {pid} drifted after {op}")

    assert pins
