"""Batched IVFADC search (ivf_pq_search_batch): Q queries answered in
ONE pass over the codes table — the scale shape for query workloads
(per-query probes don't amortize the scan at 10^12 codes).

Contract under test:
  * batch results == the per-query ivf_pq_search loop, rank-for-rank,
    for every query (same ADC values, same tie order);
  * one query appearing twice gets identical result sets;
  * k larger than the probed population truncates cleanly;
  * the plan is a single scan + broadcast join — no per-query jobs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ocr_spark.operators import similarity as S


def _fixture(spark):
    rng = np.random.default_rng(5)
    C_, PER, DIM, M, KSUB = 6, 20, 16, 4, 8
    centers = rng.normal(size=(C_, DIM))
    X = np.repeat(centers, PER, axis=0) \
        + 0.15 * rng.normal(size=(C_ * PER, DIM))
    emb = spark.createDataFrame(
        [(i, x.tolist()) for i, x in enumerate(X)],
        "vec_id int, embedding array<double>")
    cents = centers.tolist()
    cells = np.argmax(np.round(
        (X @ centers.T) / (np.linalg.norm(X, axis=1, keepdims=True)
                           * np.linalg.norm(centers, axis=1)),
        S.ARGMAX_ROUND), axis=1)
    R = X - centers[cells]
    resid = spark.createDataFrame(
        [(i, r.tolist()) for i, r in enumerate(R)],
        "vec_id int, embedding array<double>")
    cb = S.pq_train_codebooks(resid, "vec_id", "embedding", M, KSUB,
                              n_iters=3)
    codes = S.ivf_pq_encode(emb, "vec_id", "embedding", cents, cb)
    return X, cents, cb, codes


def test_batch_search_matches_per_query_loop(spark):
    X, cents, cb, codes = _fixture(spark)
    codes = codes.persist()
    queries = [(qid, X[qid * 7].tolist()) for qid in range(5)]
    qdf = spark.createDataFrame(queries, "qid int, qvec array<double>")
    got = S.ivf_pq_search_batch(codes, "vec_id", qdf, "qid", "qvec",
                                cents, cb, k=4, nprobe=2)
    by_q: dict[int, list] = {}
    for r in got.collect():
        by_q.setdefault(r["qid"], []).append(
            (r["rank"], r["vec_id"], r["ivfpq_adc"]))
    assert set(by_q) == {0, 1, 2, 3, 4}
    for qid, qv in queries:
        ref = [(i + 1, r["vec_id"], r["ivfpq_adc"]) for i, r in
               enumerate(S.ivf_pq_search(codes, "vec_id", qv, cents,
                                         cb, k=4, nprobe=2).collect())]
        assert sorted(by_q[qid]) == ref, qid
    codes.unpersist()


def test_batch_search_duplicate_and_truncated(spark):
    X, cents, cb, codes = _fixture(spark)
    qv = X[3].tolist()
    qdf = spark.createDataFrame([(1, qv), (2, qv)],
                                "qid int, qvec array<double>")
    got = S.ivf_pq_search_batch(codes, "vec_id", qdf, "qid", "qvec",
                                cents, cb, k=1000, nprobe=1)
    rows = got.collect()
    a = sorted((r["rank"], r["vec_id"]) for r in rows if r["qid"] == 1)
    b = sorted((r["rank"], r["vec_id"]) for r in rows if r["qid"] == 2)
    assert a == b and 0 < len(a) < 120  # one probed cell's population


def test_batch_search_single_scan_plan(spark):
    X, cents, cb, codes = _fixture(spark)
    qdf = spark.createDataFrame([(0, X[0].tolist())],
                                "qid int, qvec array<double>")
    plan = S.ivf_pq_search_batch(
        codes, "vec_id", qdf, "qid", "qvec", cents, cb, k=3,
        nprobe=2)._jdf.queryExecution().executedPlan().toString()
    # query side broadcasts; the codes scan appears once
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert plan.count("Scan ExistingRDD") <= 2
