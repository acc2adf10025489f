"""Derived ANN index (plans/ann_index.py): the real-MLP + IVFADC index
maintained incrementally over a versioned results table.

Contract under test:
  * first sync trains + freezes the model (sidecar) and full-derives
    (url, cell, codes) — codes shaped (m,), cells in 1..n_cells;
  * appends / recrawls / takedowns on the results table propagate at
    the next sync, and the index is EQUAL to a from-scratch rebuild
    under the same frozen model after every step;
  * a recrawl's codes equal a direct encode of the new capture (stale
    codes leave by key reconciliation);
  * search embeds the query through the frozen model and finds the
    matching document;
  * a conflicting explicit model on an existing index root is refused
    (the model is part of the derived contract).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ocr_spark.plans.ann_index import (
    load_ann_model, model_fingerprint, search_ann_index, sync_ann_index,
    train_ann_model,
)
from ocr_spark.sources.io import VersionedTable

SCHEMA = "drop_id INT, url STRING, extracted_text STRING"

DAY1 = [(1, f"https://a.example/{i}",
         f"document number {i} talks about {topic} in detail, "
         f"{topic} {topic} words and more prose about {topic}")
        for i, topic in enumerate(
            ["astronomy", "baking", "chemistry", "databases", "espresso",
             "fjords", "geology", "harmonics", "immunology", "juggling",
             "kayaking", "linguistics"])]
DAY2 = [(2, "https://b.example/0",
         "fresh capture about volcanoes and lava flows and magma"),
        (2, "https://b.example/1",
         "another new page mentioning sailing knots and rigging")]

TRAIN_KW = dict(n_cells=2, m=4, ksub=4, kmeans_iters=2, pq_iters=2)


def _mk_results(spark, root, rows):
    vt = VersionedTable(spark, root)
    vt.commit(spark.createDataFrame(rows, SCHEMA), "drop_id",
              note="day1", stats_cols=["url"])
    return vt


def _rows(spark, root):
    vt = VersionedTable(spark, root)
    return sorted((r["url"], r["cell"], tuple(r["codes"]))
                  for r in vt.read().collect())


def _rebuild(spark, results_root, tmp_path, model, tag):
    root = str(tmp_path / f"rebuild_{tag}")
    sync_ann_index(spark, results_root, root, n_buckets=4, model=model)
    return _rows(spark, root)


def test_ann_index_tracks_ingest_lifecycle(spark, tmp_path):
    res_root = str(tmp_path / "results")
    idx_root = str(tmp_path / "annidx")
    src = _mk_results(spark, res_root, DAY1)

    # ---- first sync: trains, freezes, full-derives --------------------
    r1 = sync_ann_index(spark, res_root, idx_root, n_buckets=4,
                        **TRAIN_KW)
    assert r1["synced"] and r1["keys_inserted"] == len(DAY1)
    model = load_ann_model(idx_root)
    assert model is not None and len(model["centroids"]) == 2
    assert r1["model_fingerprint"] == model_fingerprint(model)
    rows = _rows(spark, res_root.replace("results", "annidx"))
    assert len(rows) == len(DAY1)
    assert all(len(c) == TRAIN_KW["m"] and cell in (1, 2)
               for _, cell, c in rows)
    assert rows == _rebuild(spark, res_root, tmp_path, model, "d1")

    # ---- day2 append: only the drop's keys re-derive ------------------
    src.commit(spark.createDataFrame(DAY2, SCHEMA), "drop_id",
               note="day2")
    r2 = sync_ann_index(spark, res_root, idx_root, n_buckets=4)
    assert r2["keys_inserted"] == 2 and r2["keys_deleted"] == 0
    assert _rows(spark, idx_root) == _rebuild(spark, res_root, tmp_path,
                                              model, "d2")

    # ---- recrawl: url re-encoded under its new capture ----------------
    new_text = "completely rewritten page about astronomy telescopes"
    src.merge_into(spark.createDataFrame(
        [(3, DAY1[0][1], new_text)], SCHEMA), ["url"])
    r3 = sync_ann_index(spark, res_root, idx_root, n_buckets=4)
    assert r3["keys_deleted"] >= 1  # the superseded capture's key
    got = {u: (cell, codes) for u, cell, codes in _rows(spark, idx_root)}
    from ocr_spark.plans.ann_index import _encode_transform
    direct = _encode_transform(model)(spark.createDataFrame(
        [(3, DAY1[0][1], new_text)], SCHEMA)).collect()[0]
    assert got[DAY1[0][1]] == (direct["cell"], tuple(direct["codes"]))
    assert sorted((u, c, cd) for u, (c, cd) in got.items()) == \
        _rebuild(spark, res_root, tmp_path, model, "d3")

    # ---- takedown: codes retracted, equal to rebuild ------------------
    victim = DAY1[5][1]
    src.delete_where([("url", "==", victim)], mode="merge_on_read")
    r4 = sync_ann_index(spark, res_root, idx_root, n_buckets=4)
    assert r4["synced"]
    rows4 = _rows(spark, idx_root)
    assert victim not in {u for u, _, _ in rows4}
    assert len(rows4) == len(DAY1) + len(DAY2) - 1
    assert rows4 == _rebuild(spark, res_root, tmp_path, model, "d4")

    # ---- no-op sync: watermark caught up, no new snapshot -------------
    n_snaps = len(VersionedTable(spark, idx_root).snapshots())
    r5 = sync_ann_index(spark, res_root, idx_root, n_buckets=4)
    assert not r5["synced"]
    assert len(VersionedTable(spark, idx_root).snapshots()) == n_snaps


def test_ann_search_finds_matching_doc(spark, tmp_path):
    res_root = str(tmp_path / "results")
    idx_root = str(tmp_path / "annidx")
    _mk_results(spark, res_root, DAY1)
    sync_ann_index(spark, res_root, idx_root, n_buckets=4, **TRAIN_KW)
    # query with a document's own text, probing every cell: its own
    # codes reproduce exactly, so it must surface in the top ranks
    target = DAY1[7]
    hits = [r["url"] for r in search_ann_index(
        spark, idx_root, query_text=target[2], k=3,
        nprobe=TRAIN_KW["n_cells"]).collect()]
    assert target[1] in hits, hits
    # vec and text queries agree through the frozen model
    from ocr_spark.operators import embedding as E
    m = load_ann_model(idx_root)
    qv = E.MLPFeaturizer(m["embed_seed"]).embed([target[2]])[0].tolist()
    hits_v = [r["url"] for r in search_ann_index(
        spark, idx_root, query_vec=qv, k=3,
        nprobe=TRAIN_KW["n_cells"]).collect()]
    assert hits_v == hits


def test_conflicting_model_refused(spark, tmp_path):
    res_root = str(tmp_path / "results")
    idx_root = str(tmp_path / "annidx")
    _mk_results(spark, res_root, DAY1)
    sync_ann_index(spark, res_root, idx_root, n_buckets=4, **TRAIN_KW)
    other = train_ann_model(spark, res_root, n_cells=3, m=4, ksub=4,
                            kmeans_iters=1, pq_iters=1)
    with pytest.raises(ValueError, match="different model"):
        sync_ann_index(spark, res_root, idx_root, model=other)
    # missing sidecar on search is a clear error
    with pytest.raises(ValueError, match="no ANN model"):
        search_ann_index(spark, str(tmp_path / "nope"), query_text="x")


def test_batch_text_search_matches_single(spark, tmp_path):
    """search_ann_index_batch: a text-query workload answered in one
    pass equals the per-query search_ann_index rank-for-rank."""
    from ocr_spark.plans.ann_index import search_ann_index_batch

    res_root = str(tmp_path / "results")
    idx_root = str(tmp_path / "annidx")
    _mk_results(spark, res_root, DAY1)
    sync_ann_index(spark, res_root, idx_root, n_buckets=4, **TRAIN_KW)
    queries = [(f"q{i}", DAY1[i * 3][2]) for i in range(3)]
    got = search_ann_index_batch(spark, idx_root, queries, k=3,
                                 nprobe=TRAIN_KW["n_cells"])
    by_q: dict[str, list] = {}
    for r in got.collect():
        by_q.setdefault(r["qid"], []).append(
            (r["rank"], r["url"], r["ivfpq_adc"]))
    assert set(by_q) == {"q0", "q1", "q2"}
    for qid, text in queries:
        single = [(i + 1, r["url"], r["ivfpq_adc"]) for i, r in
                  enumerate(search_ann_index(
                      spark, idx_root, query_text=text, k=3,
                      nprobe=TRAIN_KW["n_cells"]).collect())]
        assert sorted(by_q[qid]) == single, qid


def test_index_cell_layout_and_pruned_search(spark, tmp_path):
    """The index sink declares cell stats + cell write sort order
    (sync_keyed sink_props): searches read through
    `where=[("cell","in",probed)]`, and after a bare compaction —
    whose range distribution inherits the sort order, making files
    CELL-DISJOINT — the probe file-skips to the probed cells. Search
    results are identical before and after maintenance."""
    res_root = str(tmp_path / "results")
    idx_root = str(tmp_path / "annidx")
    _mk_results(spark, res_root, DAY1)
    sync_ann_index(spark, res_root, idx_root, n_buckets=4,
                   n_cells=4, m=4, ksub=4, kmeans_iters=2, pq_iters=2)
    vt = VersionedTable(spark, idx_root)
    snap = vt.snapshots()[-1]
    assert snap.get("stats_cols") == ["cell"]
    assert snap.get("sort_order") == ["cell"]
    target = DAY1[2]
    before = [(r["url"], r["ivfpq_adc"]) for r in search_ann_index(
        spark, idx_root, query_text=target[2], k=5, nprobe=1).collect()]
    # bare compaction: range distribution follows the inherited sort
    # order -> cell-disjoint files -> the single-cell probe skips files
    vt.rewrite_files()
    m = load_ann_model(idx_root)
    from ocr_spark.operators import embedding as E
    from ocr_spark.operators.similarity import nearest_cells
    qv = E.MLPFeaturizer(m["embed_seed"]).embed([target[2]])[0].tolist()
    cells = nearest_cells(qv, m["centroids"], 1)
    plan = vt.plan_files(where=[("cell", "in", cells)])
    assert plan["files_skipped"] >= 1, plan
    after = [(r["url"], r["ivfpq_adc"]) for r in search_ann_index(
        spark, idx_root, query_text=target[2], k=5, nprobe=1).collect()]
    assert after == before
