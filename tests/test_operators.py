"""Unit tests for dedup/similarity/textstats operators on tiny in-memory
frames (semantics pinned independently of the DuckDB oracle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators import dedup as D
from ocr_spark.operators import similarity as S
from ocr_spark.operators import textstats as T
from ocr_spark.operators.multimodal import _decode_image_bytes, decode_media_meta


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup
        (3, "the quick brown fox jumps over the lazy cat"),   # near dup
        (4, "completely different words here about spark engines"),
        (5, "a"),                                             # < shingle_k
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(docs):
    surv = D.exact_dedup_survivors(docs, "doc_id", "text").collect()
    assert len(surv) == 4  # 1&2 merged
    by_copies = {r["doc_id"]: r["copies"] for r in surv}
    assert by_copies[1] == 2


def test_minhash_identical_docs_identical_sigs(docs):
    sig = D.minhash_signatures(docs, "doc_id", "text", n_hashes=8)
    pdf = sig.toPandas().pivot(index="doc_id", columns="seed",
                               values="minhash")
    assert list(pdf.loc[1]) == list(pdf.loc[2])
    # near-dup shares most minhashes, disjoint doc shares none
    shared_near = sum(a == b for a, b in zip(pdf.loc[1], pdf.loc[3]))
    shared_far = sum(a == b for a, b in zip(pdf.loc[1], pdf.loc[4]))
    assert shared_near > shared_far


def test_lsh_pairs_find_duplicates(docs):
    sig = D.minhash_signatures(docs, "doc_id", "text", n_hashes=8)
    pairs = D.lsh_candidate_pairs(
        D.lsh_band_buckets(sig, "doc_id", band_size=2), "doc_id").collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in found


def test_simhash_hamming(docs):
    import numpy as np
    sh = {r["doc_id"]: r["simhash"]
          for r in D.simhash(docs, "doc_id", "text").collect()}
    assert sh[1] == sh[2]
    ham_near = bin(sh[1] ^ sh[3]).count("1")
    ham_far = bin(sh[1] ^ sh[4]).count("1")
    assert ham_near < ham_far


def test_ngram_jaccard(docs):
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text",
                                  threshold=0.01).collect()
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert j[(1, 2)] == 1.0
    assert 0.0 < j[(1, 3)] < 1.0


@pytest.fixture()
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    return df.withColumn(
        "embedding", F.col("embedding").cast("array<float>"))


def test_cosine_topk(vecs):
    top = S.cosine_topk(vecs.where("vec_id <> 0"), "vec_id", "embedding",
                        [1.0, 0.0, 0.0, 0.0], k=2).collect()
    assert [r["vec_id"] for r in top] == [1, 2]
    assert top[0]["cos"] > 0.99


def test_ann_bucket_excludes_opposite(vecs):
    planes = S.hyperplanes(2, 4, seed=5)
    res = S.ann_search(vecs, "vec_id", "embedding",
                       [1.0, 0.0, 0.0, 0.0], planes, k=4).collect()
    ids = [r["vec_id"] for r in res]
    assert 0 in ids or 1 in ids  # same-direction vectors in query bucket


def test_lang_id(spark):
    rows = [(1, "the cat and the dog of the house"),
            (2, "der hund und die katze ist nicht da"),
            (3, "xyzzy qwerty")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["pred"] for r in df.select(
        "doc_id", T.lang_id(F.col("text")).alias("pred")).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "und"


def test_quality_and_tokens(spark):
    df = spark.createDataFrame([(1, "the data of value!!")],
                               ["doc_id", "text"])
    feat = T.quality_features(df, "doc_id", "text").collect()[0]
    assert feat["n_words"] == 4
    assert feat["punct_ratio"] > 0
    tok = T.token_counts(df, "doc_id", "text").collect()[0]
    assert tok["ws_tokens"] == 4
    assert tok["bpe_tokens"] >= 5


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta alpha")], ["doc_id", "text"])
    fp = {r["doc_id"]: (r["md5_fp"], r["rolling_fp"])
          for r in T.fingerprint(df, "doc_id", "text").collect()}
    assert fp[1][0] != fp[2][0]
    assert fp[1][1] != fp[2][1]


def test_multimodal_stub_and_plumbing(spark):
    assert _decode_image_bytes(b"abcd")["n_bytes"] == 4
    with pytest.raises(NotImplementedError):
        _decode_image_bytes(b"x", real_codec=True)
    df = spark.createDataFrame([(1, bytearray(b"x" * 100)),
                                (2, None)], ["doc_id", "blob"])
    out = {r["doc_id"]: r for r in
           decode_media_meta(df, "doc_id", "blob").collect()}
    assert out[1]["n_bytes"] == 100 and out[1]["width"] == 116
    assert out[2]["n_bytes"] == 0


def test_w6_greedy_overlap_matches_pandas_oracle(spark):
    """applyInPandas greedy acceptance == single-process pandas scan."""
    import pandas as pd

    from ocr_spark.operators.grouped import (
        greedy_accept_group, greedy_overlap_accept,
    )

    pdf = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    exp = (pd.concat([greedy_accept_group(g, 10.0, 0.5)
                      for _, g in pdf.groupby("user_id", sort=True)])
           .sort_values(["user_id", "event_id"]).reset_index(drop=True))
    got = (greedy_overlap_accept(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
        .toPandas().sort_values(["user_id", "event_id"])
        .reset_index(drop=True))
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_ngram_jaccard_stop_shingle_cap(spark):
    """A shingle shared by every doc is a hot join key; with the df cap it
    is dropped before the self-join, so pair fan-out collapses from
    all-pairs to only genuinely-similar pairs (VERDICT r1 #4)."""
    stop = "as seen on the home page"  # 6 words -> 4 shared shingles
    rows = [(i, f"{stop} unique{i} tail{i} words{i} here{i}")
            for i in range(1, 9)]
    rows[1] = (2, rows[0][1])  # doc 2 duplicates doc 1 exactly
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    uncapped = D.ngram_jaccard_pairs(docs, "doc_id", "text",
                                     threshold=0.01, max_df=None).collect()
    capped = D.ngram_jaccard_pairs(docs, "doc_id", "text",
                                   threshold=0.01, max_df=4).collect()
    # every pair shares the stop shingles -> full 8*7/2 fan-out uncapped
    assert len(uncapped) == 28
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in capped}
    assert set(got) == {(1, 2)}   # only the true duplicate pair survives
    assert got[(1, 2)] == 1.0     # jaccard over the FILTERED shingle sets


def test_stratified_split_sampleby(spark):
    """SURVEY §3.3: seeded sampleBy stratified split (reference analog
    train_test_split(stratify=labels), hebrew-ocr-cnn.py:102-110)."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fracs = {lg: 0.8 for lg in
             [r["lang"] for r in d.select("lang").distinct().collect()]}
    train = d.sampleBy("lang", fracs, seed=7)
    t1 = train.groupBy("lang").count().collect()
    t2 = d.sampleBy("lang", fracs, seed=7).groupBy("lang").count().collect()
    assert sorted(map(tuple, t1)) == sorted(map(tuple, t2))  # deterministic
    totals = {r["lang"]: r["count"] for r in d.groupBy("lang").count().collect()}
    for r in t1:
        frac = r["count"] / totals[r["lang"]]
        assert 0.6 < frac < 0.95, (r["lang"], frac)


def test_feature_singleton_one_init_per_worker(spark):
    """S8: the featurizer model loads at most once per Python worker and
    is reused across batches/tasks — the reference's load-once batch
    pattern (func.py:34-60), not its per-request reload (func.py:202)."""
    from ocr_spark.operators.multimodal import (
        extract_features, worker_model_stats,
    )

    df = (spark.range(2000)
          .select(F.col("id").alias("doc_id"),
                  F.encode(F.col("id").cast("string"), "utf-8").alias("blob"))
          .repartition(32))
    assert extract_features(df, "doc_id", "blob", n_dims=4).count() == 8000
    stats = worker_model_stats(spark, n_tasks=64).collect()
    served = [r for r in stats if r["batches"] > 0]
    assert served, "no worker reported featurize batches"
    assert all(r["inits"] == 1 for r in served), stats
    assert max(r["batches"] for r in served) >= 2  # reuse across batches


def test_binaryfile_labeled_source(spark, tmp_path):
    """S2: binaryFile + pathGlobFilter + dir-name label, and the pages
    adapter feeding the real extraction job."""
    from ocr_spark.plans.extract_job import extract_pages
    from ocr_spark.sources.binary_source import (
        pages_from_binary_dir, read_labeled_binary_dir,
    )

    body = ("<html><body><article><p>" + "actual content words " * 10
            + "</p></article></body></html>")
    for label, n in (("news", 3), ("blog", 2)):
        d = tmp_path / label
        d.mkdir()
        for i in range(n):
            (d / f"doc{i}.html").write_bytes(body.encode())
        (d / "skip.txt").write_bytes(b"not html")

    labeled = read_labeled_binary_dir(spark, str(tmp_path), "*.html")
    counts = {r["label"]: r["count"]
              for r in labeled.groupBy("label").count().collect()}
    assert counts == {"news": 3, "blog": 2}

    pages = pages_from_binary_dir(spark, str(tmp_path), "*.html")
    res = extract_pages(pages, n_buckets=4, salt_n=2).collect()
    assert len(res) == 5
    assert all(r["content_kind"] == "html" and
               "actual content words" in r["extracted_text"] for r in res)


def test_dedup_components_clusters(spark):
    """Pairs (1-2, 2-3) and (5-6) must collapse to components {1} and
    {5}; 2-step chains prove propagation crosses indirect links."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], ["id_a", "id_b"])
    got = {r["doc_id"]: r["component"]
           for r in D.dedup_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_ann_multiprobe_superset_of_single(vecs):
    """Hamming<=1 probing must scan a superset of the single-probe
    bucket, so its candidate set can only grow."""
    planes = S.hyperplanes(3, 4, seed=5)
    q = [1.0, 0.0, 0.0, 0.0]
    single = {r["vec_id"] for r in
              S.ann_search(vecs, "vec_id", "embedding", q, planes,
                           k=10).collect()}
    multi = {r["vec_id"] for r in
             S.ann_search_multiprobe(vecs, "vec_id", "embedding", q,
                                     planes, k=10).collect()}
    assert single <= multi


def test_ivf_nprobe_superset(vecs):
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
             [-1.0, 0.0, 0.0, 0.0]]
    q = [0.7, 0.7, 0.0, 0.0]  # near the cell boundary of cents 1 and 2
    one = {r["vec_id"] for r in
           S.ivf_search(vecs, "vec_id", "embedding", q, cents,
                        k=10).collect()}
    two = {r["vec_id"] for r in
           S.ivf_search_nprobe(vecs, "vec_id", "embedding", q, cents,
                               k=10, nprobe=2).collect()}
    assert one < two  # boundary query: second cell adds real neighbors
    assert S.nearest_cells(q, cents, 2) == [1, 2]


def test_scrub_pii(spark):
    rows = [(1, "contact bob.smith+x@corp.example.com or +1 (415) 555-0100 now"),
            (2, "no pii here at all")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           T.scrub_pii(df, "doc_id", "text").collect()}
    assert got[1]["n_emails"] == 1 and got[1]["n_phones"] == 1
    assert "@" not in got[1]["scrubbed"]
    assert "555" not in got[1]["scrubbed"]
    assert got[1]["scrubbed"].count("<pii>") == 2
    assert got[2]["scrubbed"] == "no pii here at all"
    assert got[2]["n_emails"] == 0 and got[2]["n_phones"] == 0


def test_repetition_stats(spark):
    rows = [(1, "spam spam spam spam"), (2, "all words here differ fully")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           T.repetition_stats(df, "doc_id", "text").collect()}
    assert got[1]["distinct_ratio"] == 0.25
    assert got[1]["top_word_share"] == 1.0
    assert got[2]["distinct_ratio"] == 1.0
    assert got[2]["top_word_share"] == 0.2


def test_lsh_buckets_scale_with_planes(spark):
    """The near-dup/ANN bucket count must grow ~2^n_planes so candidate
    pair cost shrinks as the corpus grows (the production knob the r1
    review flagged as a toy setting at n_planes=4)."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    counts = {}
    for n in (4, 8):
        planes = S.hyperplanes(n, 64, seed=123)
        counts[n] = (S.lsh_buckets(emb, "vec_id", "embedding", planes)
                     .select("bucket").distinct().count())
    assert counts[4] <= 16 and counts[8] <= 256
    assert counts[8] >= counts[4] * 4  # occupancy actually spreads


def test_hot_host_salting_policy(spark):
    """Skew policy (reference analog: wide-segment splitting,
    revised_code.py:249-306): hosts above 1.5x the mean row count are
    flagged hot and fan out over salt_n sub-keys; cold hosts stay
    co-located at salt 0."""
    from ocr_spark.functions.bucketing import (
        SKEW_FACTOR, host_of, hot_hosts, salted_partition_key,
    )

    rows = ([(f"https://giant.example/p{i}",) for i in range(400)]
            + [(f"https://small{j}.example/p{i}",)
               for j in range(20) for i in range(5)])
    pages = spark.createDataFrame(rows, ["url"])
    hot = hot_hosts(pages, SKEW_FACTOR)
    assert [r["host"] for r in hot.collect()] == ["giant.example"]

    flagged = (pages.withColumn("_host", host_of(F.col("url")))
               .join(F.broadcast(hot.withColumn("_is_hot", F.lit(True))
                                 .withColumnRenamed("host", "_host")
                                 .drop("cnt")), on="_host", how="left")
               .withColumn("_is_hot",
                           F.coalesce(F.col("_is_hot"), F.lit(False))))
    bucket, salt = salted_partition_key(F.col("url"), F.col("_is_hot"),
                                        n_buckets=32, salt_n=8)
    keyed = flagged.select("_host", bucket.alias("b"), salt.alias("s"))
    hot_salts = (keyed.where(F.col("_host") == "giant.example")
                 .select("s").distinct().count())
    cold_salts = (keyed.where(F.col("_host") != "giant.example")
                  .select("s").distinct().collect())
    assert hot_salts > 1                      # hot host fans out
    assert [r["s"] for r in cold_salts] == [0]  # cold hosts co-located
    hot_buckets = (keyed.where(F.col("_host") == "giant.example")
                   .select("b").distinct().count())
    assert hot_buckets == 1                   # same host -> same bucket


def test_asof_join_semantics(spark):
    """Point-in-time contract: latest right row with ts <= left ts per
    key; equal timestamps match; no prior right row -> null."""
    import datetime as _dt

    from ocr_spark.operators.asof import asof_join

    t = lambda m: _dt.datetime(2025, 1, 1, 0, m)
    right = spark.createDataFrame(
        [(1, t(0), 10.0), (1, t(5), 50.0), (2, t(9), 90.0)],
        ["user_id", "ts", "value"])
    left = spark.createDataFrame(
        [(100, 1, t(4)),   # between right rows -> 10.0
         (101, 1, t(5)),   # equal ts -> matches 50.0
         (102, 2, t(1)),   # before any right row -> null
         (103, 3, t(9))],  # key with no right rows -> null
        ["event_id", "user_id", "ts"])
    got = {r["event_id"]: r["asof_value"]
           for r in asof_join(left, right, ["user_id"], "ts",
                              ["value"]).collect()}
    assert got == {100: 10.0, 101: 50.0, 102: None, 103: None}


def test_asof_join_null_semantics(spark):
    """DuckDB ASOF parity on NULLs: a right row whose value is genuinely
    NULL must NOT fall back to an older row, and right rows with NULL
    timestamps never match; clashing output names fail loudly."""
    import datetime as _dt

    import pytest as _pytest

    from ocr_spark.operators.asof import asof_join

    t = lambda m: _dt.datetime(2025, 1, 1, 0, m)
    right = spark.createDataFrame(
        [(1, t(1), 10.0), (1, t(5), None), (2, None, 99.0)],
        "user_id long, ts timestamp, value double")
    left = spark.createDataFrame(
        [(100, 1, t(6)),   # latest right row has NULL value -> NULL
         (101, 2, t(6))],  # only right row has NULL ts -> NULL
        ["event_id", "user_id", "ts"])
    got = {r["event_id"]: r["asof_value"]
           for r in asof_join(left, right, ["user_id"], "ts",
                              ["value"]).collect()}
    assert got == {100: None, 101: None}

    with _pytest.raises(ValueError, match="collide"):
        asof_join(left.withColumn("asof_value", F.lit(0.0)), right,
                  ["user_id"], "ts", ["value"])


def test_kmeans_fit_matches_numpy_oracle(spark):
    """Spherical k-means (IVF training step) vs an exact single-process
    numpy mirror of the same Lloyd iterations: same init, cosine-argmax
    assignment with the same rounding/tie-break, mean recentering."""
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    init = [1, 2, 3, 4]
    got = S.kmeans_fit(emb, "vec_id", "embedding", init, n_iters=3)

    pdf = emb.toPandas()
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for r in pdf.itertuples()}
    cents = [vecs[i].copy() for i in init]
    ids = sorted(vecs)
    X = np.stack([vecs[i] for i in ids])
    for _ in range(3):
        C = np.stack(cents)
        sims = (X @ C.T) / (np.linalg.norm(X, axis=1, keepdims=True)
                            * np.linalg.norm(C, axis=1))
        sims = np.round(sims, S.ARGMAX_ROUND)
        assign = sims.argmax(axis=1)  # first max = lowest index, as Spark
        cents = [X[assign == j].mean(axis=0) if (assign == j).any()
                 else cents[j] for j in range(len(cents))]
    exp = np.stack(cents)
    assert np.allclose(np.stack(got), exp, atol=1e-9), (got, exp)


def test_dedup_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir switches lineage truncation from executor-local
    blocks to reliable storage; components identical either way."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 8)], ["id_a", "id_b"])
    local = {(r["doc_id"], r["component"])
             for r in D.dedup_components(pairs).collect()}
    reliable = {(r["doc_id"], r["component"])
                for r in D.dedup_components(
                    pairs, checkpoint_dir=str(tmp_path / "ckpt")).collect()}
    assert local == reliable == {(1, 1), (2, 1), (3, 1), (4, 1),
                                 (7, 7), (8, 7)}
    import glob
    import os
    assert os.listdir(str(tmp_path / "ckpt"))  # reliable files really land
    # superseded rounds' rdd-N dirs are deleted eagerly: only the FINAL
    # labels (which back the returned DataFrame) survive the call
    assert len(glob.glob(str(tmp_path / "ckpt" / "*" / "rdd-*"))) == 1


def test_dedup_components_nonconvergence_raises(spark):
    """Exhausting max_iters before convergence must raise — silently
    returning partially-propagated labels would hand back WRONG
    components."""
    import pytest as _pytest
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], ["id_a", "id_b"])
    with _pytest.raises(RuntimeError, match="did not converge"):
        D.dedup_components(chain, max_iters=1)
    got = {r["component"] for r in D.dedup_components(chain).collect()}
    assert got == {1}


def test_dedup_components_star_matches_pointer_jumping(spark):
    """The large-star/small-star strategy (trillion-edge path, Kiveris
    et al. SoCC 2014) must resolve EXACTLY the components the
    pointer-jumping path does — chain, hub star (its motivating skew
    case), clique, self-loop-only node, and a seeded random graph."""
    import random
    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(1, 21)]             # 20-link chain
    edges += [(100, 100 + i) for i in range(1, 15)]        # high-degree hub
    edges += [(a, b) for a in range(200, 205)
              for b in range(a + 1, 205)]                  # 5-clique
    edges += [(777, 777)]                                  # self-loop only
    edges += [(rng.randrange(300, 340), rng.randrange(300, 340))
              for _ in range(30)]                          # random (has dups)
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    pj = {(r["doc_id"], r["component"])
          for r in D.dedup_components(pairs).collect()}
    star = {(r["doc_id"], r["component"])
            for r in D.dedup_components_star(pairs).collect()}
    assert star == pj
    assert (777, 777) in star


def test_dedup_components_star_string_ids_and_reliable_ckpt(spark, tmp_path):
    """String doc ids order lexicographically — identical canonical
    survivors on both strategies — and checkpoint_dir really lands
    reliable files, mirroring the pointer-jumping test."""
    pairs = spark.createDataFrame(
        [("d2", "d1"), ("d2", "d3"), ("d9", "d8")], ["id_a", "id_b"])
    want = {("d1", "d1"), ("d2", "d1"), ("d3", "d1"),
            ("d8", "d8"), ("d9", "d8")}
    got = {(r["doc_id"], r["component"])
           for r in D.dedup_components_star(
               pairs, checkpoint_dir=str(tmp_path / "ckpt")).collect()}
    assert got == want
    import glob
    import os
    assert os.listdir(str(tmp_path / "ckpt"))
    # eager cleanup of superseded rounds: only nodes + final edges remain
    assert len(glob.glob(str(tmp_path / "ckpt" / "*" / "rdd-*"))) == 2


def test_dedup_components_release_superseded_rounds(spark):
    """A multi-round run must not accumulate one persisted copy of the
    working set per round: superseded checkpoints are freed eagerly, so
    the persistent-RDD count grows by at most the SURVIVING state (star:
    nodes + final edges; pointer jumping: final labels) — not by
    O(rounds). ContextCleaner may free other RDDs concurrently, hence
    <= bounds."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 21)], ["id_a", "id_b"])
    jsc = spark.sparkContext._jsc.sc()

    before = jsc.getPersistentRDDs().size()
    star = D.dedup_components_star(chain)
    assert jsc.getPersistentRDDs().size() - before <= 2
    # the retained state still backs the result after the frees
    assert {r["component"] for r in star.collect()} == {1}

    before = jsc.getPersistentRDDs().size()
    pj = D.dedup_components(chain)
    assert jsc.getPersistentRDDs().size() - before <= 1
    assert {r["component"] for r in pj.collect()} == {1}


def test_dedup_components_star_nonconvergence_raises(spark):
    """max_iters=1 cannot star a 12-node chain (needs ~log n rounds):
    must raise, never return a non-star edge set."""
    import pytest as _pytest
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], ["id_a", "id_b"])
    with _pytest.raises(RuntimeError, match="did not converge"):
        D.dedup_components_star(chain, max_iters=1)
    got = {r["component"] for r in D.dedup_components_star(chain).collect()}
    assert got == {1}


def test_ivf_batched_assignment_scales_past_literals(spark):
    """VERDICT r2 #2: the broadcast-matrix pandas-UDF quantizer at k=256,
    dim=64 — a size where inlined literal expressions are already
    pathological — must (a) agree with the pure-expression path cell by
    cell at small k, and (b) produce a plan with NO centroid literals."""
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    # (a) exact agreement between the two paths at a literal-friendly k
    small = [[1.0] + [0.0] * 63, [0.0] * 63 + [1.0],
             [-1.0] + [0.0] * 63, [0.5] * 64]
    a = {r["vec_id"]: r["centroid"] for r in
         S.ivf_assign(emb, "vec_id", "embedding", small,
                      batched=False).collect()}
    b = {r["vec_id"]: r["centroid"] for r in
         S.ivf_assign(emb, "vec_id", "embedding", small,
                      batched=True).collect()}
    assert a == b

    # (b) k=256 x dim=64: runs fine, every cell in range, plan is an
    # ArrowEvalPython over the broadcast matrix — no literal centroids
    rng = np.random.default_rng(7)
    big = rng.normal(size=(256, 64)).tolist()
    assigned = S.ivf_assign(emb, "vec_id", "embedding", big, batched=True)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert plan.count("0.") < 50, "centroid matrix leaked into the plan"
    cells = [r["centroid"] for r in assigned.collect()]
    assert all(1 <= c <= 256 for c in cells)
    assert len(set(cells)) > 10  # real spread over the 256 cells

    # mirror the assignment in numpy to prove end-to-end correctness
    pdf = emb.toPandas()
    V = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    C = np.asarray(big)
    sims = np.round((V @ C.T) / (np.linalg.norm(V, axis=1, keepdims=True)
                                 * np.linalg.norm(C, axis=1)),
                    S.ARGMAX_ROUND)
    exp = dict(zip(pdf["vec_id"].tolist(),
                   (sims.argmax(axis=1) + 1).tolist()))
    got = {r["vec_id"]: r["centroid"] for r in assigned.collect()}
    assert got == exp

    # ivf_search at k=256 stays join-free and returns plausible top-k
    q = [float(x) for x in V[0]]
    top = S.ivf_search(emb, "vec_id", "embedding", q, big, k=5)
    tplan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in tplan
    assert "Exchange" not in tplan
    rows = top.collect()
    assert rows and rows[0]["cos"] >= max(r["cos"] for r in rows) - 1e-9


def test_asof_join_skew_safe_matches_window_path(spark):
    """VERDICT r2 #3: skew-safe as-of. One key holds 90% of rows — the
    range-partitioned mode must split it across partitions (plan shows
    RangePartitioning, >1 partition actually populated) and return
    EXACTLY the window path's rows, including boundary carry-over,
    equal-ts right-before-left ties, and genuine-NULL right values."""
    import datetime as _dt

    from ocr_spark.operators.asof import asof_join

    base = _dt.datetime(2025, 1, 1)
    sec = _dt.timedelta(seconds=1)
    # hot key 1: 900 left rows; right rows only every 50s -> long runs of
    # left rows between right rows, guaranteed to straddle partitions
    left_rows = [(1, base + i * sec, i) for i in range(900)]
    left_rows += [(k, base + i * sec, 1000 * k + i)
                  for k in (2, 3) for i in range(50)]
    right_rows = [(1, base + i * sec, float(i)) for i in range(0, 900, 50)]
    right_rows += [(2, base + 10 * sec, None),   # genuine NULL value
                   (2, base + 20 * sec, 2.5),
                   (3, base + 25 * sec, 3.5)]
    left = spark.createDataFrame(
        left_rows, "user_id int, ts timestamp, row_id int")
    right = spark.createDataFrame(
        right_rows, "user_id int, ts timestamp, value double")

    ref = asof_join(left, right, ["user_id"], "ts", ["value"])
    got = asof_join(left, right, ["user_id"], "ts", ["value"],
                    skew_safe=True, num_partitions=8)

    # default (materialized) output is checkpoint-truncated; inspect the
    # lazy form for the range-partitioning evidence
    lazy = asof_join(left, right, ["user_id"], "ts", ["value"],
                     skew_safe=True, num_partitions=8, materialize=False)
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()

    a = {r["row_id"]: r["asof_value"] for r in ref.collect()}
    b = {r["row_id"]: r["asof_value"] for r in got.collect()}
    assert a == b
    # spot semantics: row 49 saw right@0, row 50 sees right@50 (equal-ts
    # match), key-2 rows in [10, 20) carry the genuine NULL (not nothing)
    assert b[49] == 0.0 and b[50] == 50.0 and b[899] == 850.0
    assert b[2015] is None and b[2025] == 2.5
    assert b[3010] is None and b[3030] == 3.5


def test_banded_near_dup_beats_single_band_recall(spark):
    """VERDICT r2 #4: at the production plane count (12) a SINGLE band
    loses most near-dup recall (a true pair must agree on all 12
    hyperplanes); banding (2 x 6) recovers it. Banded candidates are a
    strict superset by construction (all-12 agreement implies band-0
    agreement), and on planted near-dups banded recall must actually be
    higher."""
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, [float(x) for x in v]))
        # planted near-dup: small perturbation, cosine ~0.97+
        w = v + 0.15 * rng.normal(size=16)
        rows.append((2 * i + 1, [float(x) for x in w]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planes = S.hyperplanes(12, 16, seed=123)

    single = {(r["id_a"], r["id_b"]) for r in S.embedding_near_dup_pairs(
        df, "vec_id", "embedding", planes, 0.9).collect()}
    banded = {(r["id_a"], r["id_b"]) for r in
              S.embedding_near_dup_pairs_banded(
                  df, "vec_id", "embedding", planes, 2, 0.9).collect()}
    planted = {(2 * i, 2 * i + 1) for i in range(40)}
    assert single <= banded
    assert len(banded & planted) > len(single & planted)
    assert len(banded & planted) >= 25  # real recall, not a fluke


def test_asof_join_skew_safe_randomized_parity(spark):
    """Randomized adversarial parity: several seeds of irregular
    key/ts/NULL mixes (duplicate left timestamps, keys with no right
    rows, right rows after all left rows) — skew_safe output must equal
    the window path row-for-row at several partition counts, including
    num_partitions larger than the row count (empty partitions)."""
    import datetime as _dt
    import random

    from ocr_spark.operators.asof import asof_join

    base = _dt.datetime(2025, 3, 1)
    for seed, nparts in [(1, 4), (2, 16), (3, 64)]:
        rng = random.Random(seed)
        keys = list(range(1, 8))
        left_rows = [(rng.choice(keys),
                      base + _dt.timedelta(seconds=rng.randrange(0, 300)),
                      i)
                     for i in range(250)]
        right_rows = [(rng.choice(keys[:-2]),   # last 2 keys: no right rows
                       base + _dt.timedelta(seconds=rng.randrange(0, 300)),
                       None if rng.random() < 0.2 else
                       round(rng.random() * 100, 4))
                      for _ in range(60)]
        # dedupe right on (key, ts) — ambiguous duplicates are the
        # documented precondition
        seen = {}
        for k, t, v in right_rows:
            seen[(k, t)] = v
        right_rows = [(k, t, v) for (k, t), v in sorted(seen.items())]
        left = spark.createDataFrame(
            left_rows, "user_id int, ts timestamp, row_id int")
        right = spark.createDataFrame(
            right_rows, "user_id int, ts timestamp, value double")
        ref = {r["row_id"]: r["asof_value"] for r in asof_join(
            left, right, ["user_id"], "ts", ["value"]).collect()}
        got = {r["row_id"]: r["asof_value"] for r in asof_join(
            left, right, ["user_id"], "ts", ["value"],
            skew_safe=True, num_partitions=nparts).collect()}
        assert got == ref, (seed, nparts)


def test_ivf_batched_null_vectors_match_expression_path(spark):
    """NULL embeddings must assign NULL in BOTH quantizer paths (the
    batched UDF previously crashed on them)."""
    rows = [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0], [0.0, 1.0]]
    a = {r["vec_id"]: r["centroid"] for r in
         S.ivf_assign(df, "vec_id", "embedding", cents,
                      batched=False).collect()}
    b = {r["vec_id"]: r["centroid"] for r in
         S.ivf_assign(df, "vec_id", "embedding", cents,
                      batched=True).collect()}
    assert a == b == {1: 1, 2: None, 3: 2}


def test_dedup_repeated_lines(spark):
    """CCNet-style corpus-level boilerplate removal: every occurrence of
    a line whose TRIMMED form repeats >= min_count times corpus-wide is
    removed; kept lines stay byte-identical and ordered; blank lines are
    never counted or removed; NULL text stays NULL; within-doc repeats
    count toward the corpus threshold."""
    rows = [
        (1, "alpha\nNAV MENU\nbody one\n\nNAV MENU"),
        (2, "NAV MENU\nbody two"),
        (3, "body three\n  NAV MENU  \ntail"),   # trim-matched, kept raw
        (4, "unique only"),
        (5, "x\nx"),                              # within-doc repeat
        (6, "\n\n"),                              # blanks only
        (7, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["clean_text"], r["n_dup_lines"])
           for r in D.dedup_repeated_lines(df, "doc_id", "text").collect()}
    assert got == {
        1: ("alpha\nbody one\n", 2),
        2: ("body two", 1),
        3: ("body three\ntail", 1),
        4: ("unique only", 0),
        5: ("", 2),
        6: ("\n\n", 0),
        7: (None, 0),
    }
    # higher threshold: NAV MENU (4 occurrences) still goes, x (2) stays
    got3 = {r["doc_id"]: (r["clean_text"], r["n_dup_lines"])
            for r in D.dedup_repeated_lines(
                df, "doc_id", "text", min_count=3).collect()}
    assert got3[5] == ("x\nx", 0)
    assert got3[1] == ("alpha\nbody one\n", 2)
    # original columns ride along untouched
    assert set(D.dedup_repeated_lines(df, "doc_id", "text").columns) \
        == {"doc_id", "text", "clean_text", "n_dup_lines"}


def test_decontaminate(spark):
    """GPT-3-style benchmark-overlap flagging: any shared k-shingle
    marks a training doc contaminated; hit counts are distinct-shingle
    counts; docs shorter than k fall back to the whole-text shingle
    (word_shingles semantics)."""
    docs = spark.createDataFrame([
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "a completely different sentence with no overlap at all"),
        (3, "quick brown fox seen again here"),     # shares 1 shingle
        (4, "short text"),                          # < k words, no match
    ], ["doc_id", "text"])
    bench = spark.createDataFrame(
        [("the quick brown fox runs",)], ["text"])
    got = {r["doc_id"]: (r["n_bench_hits"], r["contaminated"])
           for r in D.decontaminate(docs, bench, "doc_id", "text",
                                    k=3).collect()}
    # bench 3-shingles: {the quick brown, quick brown fox, brown fox runs}
    assert got == {1: (2, 1), 2: (0, 0), 3: (1, 1), 4: (0, 0)}
    # whole-text fallback: doc shorter than k matches only byte-equal
    got13 = {r["doc_id"]: r["contaminated"]
             for r in D.decontaminate(
                 docs, docs.where("doc_id = 4").select("text"),
                 "doc_id", "text", k=13).collect()}
    assert got13 == {1: 0, 2: 0, 3: 0, 4: 1}


def test_model_quality_scores(spark):
    """Linear-classifier scoring: sigmoid(mean word weight) with OOV
    words contributing 0 but counted in the denominator; wordless docs
    absent from the output (caller left-joins)."""
    import math
    docs = spark.createDataFrame([
        (1, "good good bad other"),
        (2, "other words only"),
        (3, ""),
    ], ["doc_id", "text"])
    wt = spark.createDataFrame(
        [("good", 0.5), ("bad", -0.5)], ["word", "weight"])
    got = {r["doc_id"]: r["model_score"]
           for r in T.model_quality_scores(
               docs, "doc_id", "text", wt).collect()}
    sig = lambda x: round(1.0 / (1.0 + math.exp(-x)), 4)  # noqa: E731
    assert got == {1: sig(0.5 / 4), 2: sig(0.0)}
    # bias shifts the operating point
    got_b = {r["doc_id"]: r["model_score"]
             for r in T.model_quality_scores(
                 docs, "doc_id", "text", wt, bias=1.0).collect()}
    assert got_b[2] == sig(1.0)


def test_sample_to_mixture(spark):
    """Deterministic per-source thinning: keep iff md5long(id) % 1e6 <
    frac*1e6 — exact Python mirror; unlisted sources keep `default`;
    re-running selects the SAME rows (restartable sampling)."""
    import hashlib

    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    from ocr_spark.operators.sampling import sample_to_mixture
    rows = [(i, "a" if i % 3 == 0 else ("b" if i % 3 == 1 else "c"))
            for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    targets = {"a": 0.5, "b": 1.0}          # c falls to default
    for default, got_rows in (
            (0.25, None), (1.0, None)):
        got = {r["doc_id"] for r in sample_to_mixture(
            df, "doc_id", "source", targets, default=default).collect()}
        ppm = {"a": 500_000, "b": 1_000_000, "c": int(default * 1_000_000)}
        want = {i for i, s in rows if h(i) % 1_000_000 < ppm[s]}
        assert got == want
        assert {r["doc_id"] for r in sample_to_mixture(
            df, "doc_id", "source", targets,
            default=default).collect()} == want  # stable on re-run
    # sanity: thinning actually thins and keeps full-weight sources
    kept = sample_to_mixture(df, "doc_id", "source", targets, 0.25)
    by_src = {r["source"]: r["n"] for r in kept.groupBy("source")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_src["b"] == 100 and by_src["a"] < 100 and by_src["c"] < 50


def test_cap_per_source(spark):
    """Per-source quota: exact mode keeps exactly `cap` rows per source
    (the hash-smallest ones); default mode mirrors the deterministic
    floor(cap*1e6/count) thinning exactly and is stable on re-run."""
    import hashlib

    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    from ocr_spark.operators.sampling import cap_per_source
    rows = [(i, "hot" if i < 240 else "cold") for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])

    ex = cap_per_source(df, "doc_id", "source", cap=50, exact=True)
    got = {}
    for r in ex.collect():
        got.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(got["hot"]) == 50 and len(got["cold"]) == 50
    want_hot = set(sorted((i for i, s in rows if s == "hot"),
                          key=lambda i: (h(i), i))[:50])
    assert got["hot"] == want_hot

    th = cap_per_source(df, "doc_id", "source", cap=50)
    cnt = {"hot": 240, "cold": 60}
    want = {i for i, s in rows
            if h(i) % 1_000_000 < min(1_000_000, 50 * 1_000_000 // cnt[s])}
    got_th = {r["doc_id"] for r in th.collect()}
    assert got_th == want
    assert {r["doc_id"] for r in cap_per_source(
        df, "doc_id", "source", cap=50).collect()} == want
    # cap >= count -> keep everything (threshold saturates at 1e6)
    assert cap_per_source(df, "doc_id", "source", cap=1000).count() == 300


def test_assign_token_shards(spark):
    """Distributed prefix sum == serial prefix sum: shard ids match an
    exact Python cumsum over the (md5long(id), id) order, and are
    independent of the bucket count (1 bucket == 64 buckets)."""
    import hashlib

    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    from ocr_spark.operators.packing import assign_token_shards
    rows = [(i, (i * 37) % 90 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "tokens"])

    order = sorted(rows, key=lambda r: (h(r[0]), r[0]))
    want, start = {}, 0
    for i, t in order:
        want[i] = start // 1000
        start += t

    for nb in (1, 64):
        got = {r["doc_id"]: r["shard_id"] for r in assign_token_shards(
            df, "doc_id", "tokens", budget=1000, n_buckets=nb).collect()}
        assert got == want, f"n_buckets={nb}"
    # columns preserved + shard_id appended
    out = assign_token_shards(df, "doc_id", "tokens", 1000)
    assert set(out.columns) == {"doc_id", "tokens", "shard_id"}
    with pytest.raises(ValueError):
        assign_token_shards(df, "doc_id", "tokens", 1000, n_buckets=3)


def test_duplicated_span_stats(spark):
    """k-gram span dedup == exact Python mirror: positional k-grams,
    global count >= min_count, merged union of [pos, pos+k) windows.
    Covers cross-doc shares, within-doc repeats, docs < k words, and
    clean docs (absent from the output)."""
    import hashlib

    k = 3
    shared = "the quick brown fox jumps over"
    rows = [
        (1, shared + " lazy dogs today"),
        (2, "intro words first " + shared + " and unrelated tail here"),
        (3, "repeat me now repeat me now totally"),   # within-doc repeat
        (4, "two words"),                              # < k words
        (5, "completely unique sentence with fresh vocabulary only"),
    ]
    from ocr_spark.operators.dedup import duplicated_span_stats
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["dup_spans"], r["dup_words"])
           for r in duplicated_span_stats(df, "doc_id", "text", k=k)
           .collect()}

    # exact mirror
    from collections import Counter
    grams = {}
    for i, t in rows:
        ws = [w for w in t.split(" ") if w]
        grams[i] = [(p + 1, " ".join(ws[p:p + k]))
                    for p in range(len(ws) - k + 1)]
    cnt = Counter(g for gs in grams.values() for _, g in gs)
    want = {}
    for i, gs in grams.items():
        pos = sorted(p for p, g in gs if cnt[g] >= 2)
        if not pos:
            continue
        spans, words = 1, k
        for a, b in zip(pos, pos[1:]):
            d = b - a
            spans += d > k
            words += min(d, k)
        want[i] = (spans, words)
    assert got == want
    assert 1 in want and 2 in want and 3 in want
    assert 4 not in got and 5 not in got
    # doc 3's within-doc repeat is found without any cross-doc partner
    assert want[3][0] >= 1


def test_pq_encode_adc_matches_python_mirror(spark):
    """PQ encode + ADC top-k == exact Python mirror (same dim-ascending
    distance fold, ARGMAX_ROUND argmin, lowest-index ties); NULL vectors
    encode NULL; ADC ranking is a faithful compressed-domain proxy (the
    true nearest vector ranks first here by construction)."""
    import random as pyrandom

    rng = pyrandom.Random(7)
    m, ksub, dsub = 4, 4, 2
    cb = [[[round(rng.uniform(-1, 1), 3) for _ in range(dsub)]
           for _ in range(ksub)] for _ in range(m)]
    vecs = [[round(rng.uniform(-1, 1), 3) for _ in range(m * dsub)]
            for _ in range(40)]
    q = vecs[0]

    def subdist(v, s, c):
        acc = 0.0
        for d in range(dsub):
            diff = v[s * dsub + d] - cb[s][c][d]
            acc = acc + diff * diff
        return acc

    def encode(v):
        return [min(range(ksub),
                    key=lambda c: (round(subdist(v, s, c), 9), c))
                for s in range(m)]

    lut_py = [[round(subdist(q, s, c), 9) for c in range(ksub)]
              for s in range(m)]

    from ocr_spark.operators.similarity import (
        pq_adc_lut, pq_adc_topk, pq_encode)
    rows = [(i, v) for i, v in enumerate(vecs)] + [(99, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    enc = pq_encode(df, "vec_id", "embedding", cb)
    got_codes = {r["vec_id"]: r["codes"] for r in enc.collect()}
    assert got_codes[99] is None
    for i, v in enumerate(vecs):
        assert got_codes[i] == encode(v), i

    lut = pq_adc_lut(q, cb)
    assert [[round(x, 9) for x in row] for row in lut] == lut_py

    got = [(r["vec_id"], r["pq_adc"]) for r in pq_adc_topk(
        enc.where(F.col("vec_id") != 99), "vec_id", "codes", lut,
        k=5).collect()]
    adc = {i: round(sum(lut_py[s][encode(v)[s]] for s in range(m)), 4)
           for i, v in enumerate(vecs)}
    want = sorted(adc.items(), key=lambda kv: (kv[1], kv[0]))[:5]
    assert got == [(i, a) for i, a in want]
    # the query vector itself (vecs[0]) must be the ADC-nearest
    assert got[0][0] == 0


# ---------------------------------------------------------------- urls

def test_canonicalize_url(spark):
    from ocr_spark.operators.urls import canonicalize_url
    raw = [
        "HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&b=2&a=1#frag",
        "http://site.org:80/path",
        "https://site.org/path/?gclid=abc&fbclid=z&ref",
        "https://site.org/path?z=9&a=1",
        "https://host.net/",
    ]
    df = spark.createDataFrame([(u,) for u in raw], ["url"])
    got = [r["c"] for r in
           df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    assert got == [
        "https://www.example.com/A/b?a=1&b=2",  # port, case, utm, sort, frag
        "http://site.org/path",                  # default http port
        "https://site.org/path",                 # all-tracker query dropped
        "https://site.org/path?a=1&z=9",         # bytewise param sort
        "https://host.net",                      # trailing slash
    ]


def test_dedup_latest_capture(spark):
    from datetime import datetime
    from ocr_spark.operators.urls import dedup_latest_capture
    t = datetime(2026, 1, 1)
    t2 = datetime(2026, 1, 2)
    rows = [
        ("https://a.com/x?utm_source=1", t, 1),
        ("HTTPS://A.COM/x/", t2, 2),        # same canon, newer -> keeper
        ("https://a.com/x#frag", t2, 3),    # ts tie with 2 -> higher id wins
        ("https://b.com/y", t, 4),          # singleton
    ]
    df = spark.createDataFrame(rows, ["url", "ts", "doc_id"])
    out = {r["url_canon"]: r for r in
           dedup_latest_capture(df, "url", "ts", "doc_id").collect()}
    assert len(out) == 2
    a = out["https://a.com/x"]
    assert a["keeper_id"] == 3 and a["n_captures"] == 3
    assert a["latest_ts"] == t2
    assert out["https://b.com/y"]["keeper_id"] == 4


# --------------------------------------------- incremental (Bloom) dedup

def _inc_frames(spark):
    hist = spark.createDataFrame(
        [(i, f"history document number {i}") for i in range(40)],
        ["doc_id", "text"])
    # batch: 10 re-fetches of history content + 30 genuinely new docs
    batch = spark.createDataFrame(
        [(100 + i, f"history document number {i}") for i in range(10)]
        + [(200 + i, f"fresh new content {i}") for i in range(30)],
        ["doc_id", "text"])
    return hist, batch


def test_dedup_incremental_matches_plain_antijoin(spark):
    hist, batch = _inc_frames(spark)
    got = sorted(r["doc_id"] for r in
                 D.dedup_incremental(batch, hist, "doc_id", "text",
                                     n_bits=1 << 14).collect())
    plain = sorted(r["doc_id"] for r in batch.join(
        hist.select("text").distinct(), "text", "left_anti").collect())
    assert got == plain == [200 + i for i in range(30)]


def test_dedup_incremental_bloom_semantics(spark):
    from ocr_spark.operators.hashing import md5long
    hist, batch = _inc_frames(spark)
    hist_h = hist.select(md5long(F.col("text")).alias("h"))
    mask = D.build_bloom_mask(hist_h, "h", n_bits=1 << 14)
    member = D.bloom_member_udf(spark, mask, n_bits=1 << 14)
    probed = (batch.withColumn("h", md5long(F.col("text")))
              .withColumn("m", member(F.col("h"))).collect())
    # no false negatives: every re-fetch row tests positive
    assert all(r["m"] for r in probed if r["doc_id"] < 200)
    # the prune lever: ~all new rows test negative at 10x-sized mask
    fp = sum(r["m"] for r in probed if r["doc_id"] >= 200)
    assert fp <= 3


def test_dedup_incremental_empty_history(spark):
    _, batch = _inc_frames(spark)
    hist = batch.where(F.lit(False))
    out = D.dedup_incremental(batch, hist, "doc_id", "text",
                              n_bits=1 << 14)
    assert out.count() == batch.count()


# ------------------------------------------------------------- weblinks

def test_outlinks_core_total():
    from ocr_spark.core.links import outlinks
    html = ('<body><A HREF="/x">up</A>'
            "<a href='s.html' rel=nofollow>q</a>"
            '<a name="anchor-only">no href</a>'
            '<a href="">empty skipped</a>'
            '<a href=bare>bare</a>'
            '<p><a href="https://e.com/p?a=1&b=2">abs</a>'
            '<a href="//cdn.e.com/i">proto-rel</a>'
            '<a href="/dup" href="/second">first wins</a>'
            '<a href="/unclosed')
    assert outlinks(html) == [
        "/x", "s.html", "bare", "https://e.com/p?a=1&b=2",
        "//cdn.e.com/i", "/dup"]
    assert outlinks("") == []
    assert outlinks("<a") == []


def test_resolve_links_and_host_graph(spark):
    from ocr_spark.operators import weblinks as W
    rows = [
        ("https://a.com/d/idx", ["/r", "p.html", "//c.com/x",
                                 "http://b.com/y", "https://a.com/self",
                                 "../up", "./here", "../../../over",
                                 "/x/../y/./z", "sub/.."]),
        ("https://b.com/", ["https://a.com/z"]),
        ("https://c.com/q", None),
    ]
    df = spark.createDataFrame(rows, "url string, links array<string>")
    got = (df.where(F.col("links").isNotNull())
           .select(W.resolve_links(F.col("links"), F.col("url"))
                   .alias("r")).collect())
    # RFC 3986 §5: relative refs merge with the base DIRECTORY (/d/)
    # and dot segments resolve (floored at root; trailing '..' keeps a
    # trailing slash) — cross-checked against urllib.parse.urljoin
    import urllib.parse as up
    assert got[0]["r"] == [
        "https://a.com/r", "https://a.com/d/p.html", "https://c.com/x",
        "http://b.com/y", "https://a.com/self",
        "https://a.com/up", "https://a.com/d/here", "https://a.com/over",
        "https://a.com/y/z", "https://a.com/d/"]
    assert got[0]["r"] == [up.urljoin(rows[0][0], l) for l in rows[0][1]]
    edges = {(r["src_host"], r["dst_host"]) for r in
             W.host_edges(df.where(F.col("links").isNotNull()),
                          "url", "links").collect()}
    # self-edges (a.com -> a.com from /r, p.html, /self) dropped
    assert edges == {("a.com", "c.com"), ("a.com", "b.com"),
                     ("b.com", "a.com")}
    deg = {r["dst_host"]: r["n_ref_hosts"] for r in
           W.host_indegree(W.host_edges(
               df.where(F.col("links").isNotNull()), "url", "links"))
           .collect()}
    assert deg == {"c.com": 1, "b.com": 1, "a.com": 1}


def test_host_pagerank_matches_python_mirror(spark):
    from collections import Counter
    from ocr_spark.operators import weblinks as W
    edges = [("a.com", "hub.com"), ("b.com", "hub.com"),
             ("c.com", "hub.com"), ("hub.com", "a.com"),
             ("a.com", "dangle.com"), ("b.com", "a.com")]
    df = spark.createDataFrame(edges, ["src_host", "dst_host"])
    got = {r["host"]: r["pr"] for r in W.host_pagerank(df, 3).collect()}

    hosts = sorted({s for s, _ in edges} | {t for _, t in edges})
    n, d = len(hosts), 0.85
    deg = Counter(s for s, _ in edges)
    p = {h: 1 / n for h in hosts}
    for _ in range(3):
        nxt = {h: (1 - d) / n for h in hosts}
        for s, t in edges:
            nxt[t] += d * p[s] / deg[s]
        p = nxt
    assert set(got) == set(p)
    for h in p:
        assert abs(got[h] - p[h]) < 1e-12, h
    # dangling host never accumulates beyond base + inflow; hub outranks all
    assert got["hub.com"] == max(got.values())


def test_compression_ratio_matches_zlib_mirror(spark):
    import zlib
    rows = [
        (1, "natural prose with varied words and no repetition at all"),
        (2, "spam spam spam spam spam spam spam spam spam spam spam"),
        (3, ""),
        (4, None),
        (5, "ünïcode bytes — multi-byte utf-8 ✓" * 3),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           T.compression_ratio(df, "doc_id", "text").collect()}
    for i, t in rows:
        if not t:
            assert got[i]["compress_ratio"] is None
            continue
        raw = t.encode("utf-8")
        exp = round(len(zlib.compress(raw, 6)) / len(raw), 4)
        assert got[i]["compress_ratio"] == exp
        assert got[i]["raw_bytes"] == len(raw)
    # the signal: repetitive text compresses much harder than prose
    assert got[2]["compress_ratio"] < got[1]["compress_ratio"] - 0.2


# ----------------------------------------------------------- WARC source

def test_warc_source_roundtrip(spark, tmp_path):
    from datetime import datetime, timezone
    from ocr_spark.sources.warc import build_warc_bytes, read_warc

    recs = [
        ("https://a.com/1", "2026-01-02T03:04:05Z", b"<html>one</html>"),
        ("https://b.com/2", "2026-01-02T03:04:06Z",
         "<html>unicodé</html>".encode("utf-8")),
        ("https://c.com/3", "2026-01-02T03:04:07Z", b""),
    ]
    (tmp_path / "seg-0.warc.gz").write_bytes(build_warc_bytes(recs[:2]))
    (tmp_path / "seg-1.warc.gz").write_bytes(build_warc_bytes(recs[2:]))
    (tmp_path / "ignore.txt").write_text("not a warc")

    got = {r["url"]: r for r in read_warc(spark, str(tmp_path)).collect()}
    assert len(got) == 3  # warcinfo members skipped, both files read
    for url, iso, page in recs:
        r = got[url]
        assert bytes(r["html"]) == page
        assert r["warc_ts"] == datetime.strptime(
            iso, "%Y-%m-%dT%H:%M:%SZ").replace(tzinfo=timezone.utc) \
            .replace(tzinfo=None)
        assert r["text"] is None and r["lang"] is None


def test_warc_parser_total_on_malformed():
    from ocr_spark.sources.warc import (
        build_warc_bytes, parse_warc_records, split_gzip_members)

    # truncated gzip member: earlier members still decode
    good = build_warc_bytes([("https://a.com/x", "2026-01-01T00:00:00Z",
                              b"<p>hi</p>")])
    members = list(split_gzip_members(good + b"\x1f\x8b\x08garbage"))
    assert len(members) >= 1
    assert list(split_gzip_members(b"")) == []
    assert list(split_gzip_members(b"plain text")) == []

    # bad Content-Length, missing URI, truncated body: skipped, no raise
    raw = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"Content-Length: notanumber\r\n\r\n"
           b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"Content-Length: 5\r\n\r\nABCDE\r\n\r\n"          # no URI
           b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://ok.com\r\n"
           b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
           b"Content-Length: 7\r\n\r\npayload\r\n\r\n"
           b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://cut.com\r\n"
           b"Content-Length: 999\r\n\r\nshort")
    recs = list(parse_warc_records(raw))
    assert recs == [("https://ok.com", "2026-01-01T00:00:00Z", b"payload")]


def test_warc_feeds_extract_job(spark, tmp_path):
    from ocr_spark.plans.extract_job import run_extract_job
    from ocr_spark.sources.warc import build_warc_bytes, read_warc

    body = ("<html><body><p>" + "real content words " * 10
            + "</p></body></html>").encode()
    recs = [(f"https://w{i}.com/p", "2026-01-01T00:00:00Z", body)
            for i in range(6)]
    (tmp_path / "seg.warc.gz").write_bytes(build_warc_bytes(recs))
    pages = read_warc(spark, str(tmp_path))
    pages.write.parquet(str(tmp_path / "pages.parquet"))
    st = run_extract_job(spark, str(tmp_path / "pages.parquet"),
                         str(tmp_path / "out"), n_buckets=4, group_size=4)
    assert st["completed"]
    res = spark.read.parquet(str(tmp_path / "out/results"))
    rows = res.collect()
    assert len(rows) == 6
    assert all("real content words" in r["extracted_text"] for r in rows)


def test_head_meta_total_and_first_wins():
    from ocr_spark.core.headmeta import head_meta
    h = ('<html><head><TITLE> My Page </TITLE>'
         '<meta name=ROBOTS content="a,NOINDEX">'
         '<link rel=Canonical href="https://c.com/x">'
         '<link rel=canonical href="https://second.com/ignored">'
         '</head><body><title>not this</title>'
         '<meta name="robots" content="noindex">')
    assert head_meta(h) == (True, "https://c.com/x", "My Page")
    # body-only signals never leak in; absent head -> falsy defaults
    assert head_meta("<p>no head</p>") == (False, None, None)
    assert head_meta("") == (False, None, None)
    # <body with no </head> still terminates the scan
    nx, canon, title = head_meta(
        '<head><title>t</title><body><meta name=robots content=noindex>')
    assert (nx, canon, title) == (False, None, "t")
    # unterminated constructs stay total
    assert head_meta('<head><link rel=canonical href=')[1] is None
    # nofollow alone is not noindex
    assert head_meta('<head><meta name=robots content=nofollow></head>'
                     )[0] is False


def test_semdedup_matches_numpy_mirror(spark):
    """SemDeDup over the real embeddings table: cluster by cosine argmax,
    remove any vector with a LOWER-id cluster-mate at round(cos,4) >= t.
    Mirrored exactly in numpy; also pins the chain policy (lowest id of a
    duplicate chain survives, every later link is removed)."""
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = (emb.where(F.col("vec_id").isin([1, 2, 3, 4]))
            .orderBy("vec_id").collect())
    cents = [[float(x) for x in r["embedding"]] for r in rows]
    thr = 0.4

    got = {r["vec_id"]: (r["centroid"], r["keep"]) for r in
           S.semdedup(emb, "vec_id", "embedding", cents, thr).collect()}

    pdf = emb.toPandas().sort_values("vec_id")
    ids = pdf["vec_id"].tolist()
    V = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    C = np.asarray(cents)
    cell = (np.round(
        (V @ C.T) / (np.linalg.norm(V, axis=1, keepdims=True)
                     * np.linalg.norm(C, axis=1)),
        S.ARGMAX_ROUND).argmax(axis=1) + 1)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    cos = np.round(Vn @ Vn.T, 4)
    exp = {}
    for i, di in enumerate(ids):
        dup = any(cos[i, j] >= thr and cell[j] == cell[i]
                  and ids[j] < di for j in range(len(ids)))
        exp[di] = (int(cell[i]), not dup)
    assert got == exp
    assert any(not k for _, k in got.values())  # removals exist
    assert any(k for _, k in got.values())      # survivors exist

    # chain policy: a~b and b~c near-dup, a!~c -> only a survives
    chain = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.96, 0.28]), (3, [0.85, 0.53])],
        "id long, v array<double>")
    out = {r["id"]: r["keep"] for r in
           S.semdedup(chain, "id", "v", [[1.0, 0.0]], 0.95).collect()}
    assert out == {1: True, 2: False, 3: False}


def test_bigram_lm_perplexity_matches_python_mirror(spark):
    """Bigram LM train + add-k perplexity vs an exact pure-Python mirror,
    including the OOV path (held-out doc with unseen words) the
    self-trained driver oracle never exercises, and the <2-word NULL
    contract."""
    import math

    train = spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "the cat ran"),
         (3, "a dog sat on a mat"),
         (4, "single")],
        "doc_id long, text string")
    k = 0.5
    lm = T.fit_bigram_lm(train, "doc_id", "text")

    # python mirror of training
    docs = {1: "the cat sat on the mat", 2: "the cat ran",
            3: "a dog sat on a mat", 4: "single"}
    c12: dict[tuple[str, str], int] = {}
    for t in docs.values():
        ws = [w for w in t.split(" ") if w]
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    for (a, _), c in c12.items():
        c1[a] = c1.get(a, 0) + c
    vocab = {w for p in c12 for w in p}
    assert "single" not in vocab  # 1-word docs train nothing

    got_lm = {(r["w1"], r["w2"]): r["c12"] for r in lm.collect()}
    assert got_lm == c12

    def mirror_ppl(text):
        ws = [w for w in text.split(" ") if w]
        lps = [math.log((c12.get((a, b), 0) + k)
                        / (c1.get(a, 0) + k * len(vocab)))
               for a, b in zip(ws, ws[1:])]
        return round(math.exp(-sum(lps) / len(lps)), 4) if lps else None

    # score train docs + a held-out doc with OOV words
    score = spark.createDataFrame(
        [(1, docs[1]), (4, docs[4]), (9, "zebra cat sat quietly")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["ppl"] for r in
           T.lm_perplexity(score, "doc_id", "text", lm, k=k).collect()}
    assert got == {1: mirror_ppl(docs[1]), 4: None,
                   9: mirror_ppl("zebra cat sat quietly")}
    assert got[4] is None                    # no bigrams -> NULL
    assert got[9] > got[1]                   # OOV doc scores worse

    # min_count pruning drops singleton bigrams from the table
    pruned = {(r["w1"], r["w2"]) for r in
              T.fit_bigram_lm(train, "doc_id", "text", min_count=2)
              .collect()}
    assert pruned == {p for p, c in c12.items() if c >= 2}


def test_chunk_documents_matches_python_mirror(spark):
    """Training-window chunking at chunk grain vs an exact mirror:
    full-window starts at stride spacing + one right-aligned tail
    window; <=chunk-token docs give one window; empty docs none."""
    chunk, stride = 8, 5
    rows = [
        (1, " ".join(f"w{i}" for i in range(20))),   # 20 words
        (2, " ".join(f"x{i}" for i in range(8))),    # exactly chunk
        (3, "a b c"),                                # under chunk
        (4, ""),                                     # empty -> no rows
        (5, " ".join(f"y{i}" for i in range(9))),    # chunk + 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def mirror(text):
        ws = [w for w in text.split(" ") if w]
        m = len(ws)
        if m == 0:
            starts = []
        elif m <= chunk:
            starts = [0]
        else:
            starts = [s for s in range(0, m, stride)
                      if s + chunk < m] + [m - chunk]
        return [(" ".join(ws[s:s + chunk])) for s in starts]

    exp = [(i, ci, c, len(c.split(" ")))
           for i, t in rows for ci, c in enumerate(mirror(t))]
    got = [(r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_tokens"])
           for r in T.chunk_documents(df, "doc_id", "text", chunk, stride)
           .orderBy("doc_id", "chunk_id").collect()]
    assert got == exp
    # pin the shape: doc 1 (20 words) -> starts 0,5,10 full + tail 12
    d1 = [c for i, _, c, _ in got if i == 1]
    assert len(d1) == 4 and d1[-1].startswith("w12 ")
    assert all(n == chunk for i, _, _, n in got if i == 1)
    assert not any(i == 4 for i, _, _, _ in got)

    # non-overlapping default (stride = chunk): exact cover of doc 2
    got2 = T.chunk_documents(df, "doc_id", "text", chunk).where(
        F.col("doc_id") == 2).collect()
    assert len(got2) == 1 and got2[0]["n_tokens"] == chunk


def test_dsir_weights_matches_python_mirror(spark):
    """DSIR importance weights vs an exact pure-Python mirror: target LM
    trained on the 'good' docs, raw LM on the whole pool; target-OOV
    bigrams hit the add-k zero-count path; in-domain docs must outweigh
    out-of-domain ones; <2-word docs get NULL."""
    import math

    from ocr_spark.operators.sampling import dsir_weights

    rows = [(1, "the cat sat on the mat", 1),
            (2, "the cat ran to the mat", 1),
            (3, "der hund lief zum haus", 0),
            (4, "the dog sat on the mat", 0),
            (5, "x", 0)]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt int")
    k = 0.5
    target = df.where(F.col("tgt") == 1)
    tlm = T.fit_bigram_lm(target, "doc_id", "text")
    rlm = T.fit_bigram_lm(df, "doc_id", "text")

    def counts(texts):
        c12, c1 = {}, {}
        for t in texts:
            ws = [w for w in t.split(" ") if w]
            for a, b in zip(ws, ws[1:]):
                c12[(a, b)] = c12.get((a, b), 0) + 1
                c1[a] = c1.get(a, 0) + 1
        vocab = {w for p in c12 for w in p}
        return c12, c1, len(vocab)

    tc, tcc, tv = counts([t for _, t, g in rows if g == 1])
    rc, rcc, rv = counts([t for _, t, _ in rows])

    def mirror(text):
        ws = [w for w in text.split(" ") if w]
        ds = [math.log((tc.get((a, b), 0) + k) / (tcc.get(a, 0) + k * tv))
              - math.log((rc.get((a, b), 0) + k) / (rcc.get(a, 0) + k * rv))
              for a, b in zip(ws, ws[1:])]
        return round(math.exp(sum(ds) / len(ds)), 4) if ds else None

    got = {r["doc_id"]: r["dsir_w"] for r in
           dsir_weights(df, "doc_id", "text", tlm, rlm, k=k).collect()}
    exp = {i: mirror(t) for i, t, _ in rows}
    assert got == exp
    assert got[5] is None
    # in-domain beats out-of-domain beats other-language
    assert got[1] > got[4] > got[3]


def test_tfidf_matches_python_mirror(spark):
    """Word-grain TF-IDF stats and per-doc top term vs exact mirrors,
    pinning idf = ln(N/df) with N = ALL docs (incl. empty), raw-count
    tf, round-before-multiply, and the (tfidf desc, word desc)
    tie-break."""
    import math

    from ocr_spark.operators.textstats import (tf_idf_word_stats,
                                               tfidf_top_term)

    rows = [(1, "apple banana apple"),
            (2, "apple cherry"),
            (3, "banana banana cherry cherry"),
            (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    nd = len(rows)

    dw = {}
    for i, t in rows:
        for w in t.split(" "):
            if w:
                dw[(i, w)] = dw.get((i, w), 0) + 1
    words = {w for _, w in dw}
    exp_ws = {}
    for w in words:
        per = [c for (i, x), c in dw.items() if x == w]
        idf = math.log(nd / len(per))
        # word stats use UNROUNDED idf inside top_tfidf; the per-doc top
        # term below uses the published (rounded) idf column
        exp_ws[w] = (sum(per), len(per), round(idf, 4),
                     round(max(per) * idf, 4))
    got_ws = {r["word"]: (r["cnt"], r["doc_freq"], r["idf"], r["top_tfidf"])
              for r in tf_idf_word_stats(df, "doc_id", "text").collect()}
    assert got_ws == exp_ws
    # banana: df=2 of 4 docs -> idf = ln(2)
    assert got_ws["banana"][2] == round(math.log(2), 4)

    exp_top = {}
    for i, t in rows:
        cand = [(round(c * exp_ws[w][2], 4), w)
                for (j, w), c in dw.items() if j == i]
        if cand:
            exp_top[i] = max(cand)  # (tfidf, word) max = tie -> last word
    got_top = {r["doc_id"]: (r["top_term_tfidf"], r["top_term"])
               for r in tfidf_top_term(df, "doc_id", "text").collect()}
    assert got_top == exp_top
    assert 4 not in got_top  # empty doc absent

    # explicit tie: both words once in one doc, same idf -> last word wins
    tie = spark.createDataFrame([(1, "zed aardvark"), (2, "other words")],
                                "doc_id long, text string")
    t1 = {r["doc_id"]: r["top_term"]
          for r in tfidf_top_term(tie, "doc_id", "text").collect()}
    assert t1[1] == "zed"


def test_anchored_outlinks_total_and_ordered():
    """Core anchor extraction: pairs in document order, hrefs identical
    to outlinks(), nested inline tags contribute text, unclosed <a>
    flushes at next <a>/EOF, self-closing and href-less anchors."""
    from ocr_spark.core.links import anchored_outlinks, outlinks

    h = ('<nav><a href="/">home</a> <a href="https://x.net/p">more-3'
         '</a></nav><a href="/b"><b>bold</b>  text\n here</a>'
         '<a>nohref</a><a href="/u">un closed<a href="/s"/>'
         '<a href="/t">tail')
    got = anchored_outlinks(h)
    assert got == [("/", "home"), ("https://x.net/p", "more-3"),
                   ("/b", "bold text here"), ("/u", "un closed"),
                   ("/s", ""), ("/t", "tail")]
    assert [p[0] for p in got] == outlinks(h)
    assert anchored_outlinks("") == []
    assert anchored_outlinks("<p>no anchors</p>") == []
    # block-level start tag auto-closes an open anchor (browser rule)
    blk = anchored_outlinks('<a href="/x">link text<p>whole article '
                            'body continues forever')
    assert blk == [("/x", "link text")]
    # page-sized anchor text is capped, not shipped
    from ocr_spark.core.links import ANCHOR_TEXT_CAP
    big = anchored_outlinks('<a href="/y">' + "w " * 10000)
    assert len(big) == 1 and len(big[0][1]) <= ANCHOR_TEXT_CAP


def test_host_anchor_summary(spark):
    """Inbound-anchor aggregation: counts, distinct anchors, and the
    (cnt desc, anchor desc) top pick incl. the tie case."""
    from ocr_spark.operators.weblinks import host_anchor_summary

    pairs = spark.createDataFrame(
        [("a.com", "news"), ("a.com", "news"), ("a.com", "zlatest"),
         ("b.com", "x"), ("b.com", "y"),      # tie -> 'y' (lex last)
         ("c.com", "only")],
        "host string, anchor string")
    got = {r["host"]: (r["n_inbound"], r["n_anchors"], r["top_anchor"])
           for r in host_anchor_summary(pairs, "host", "anchor")
           .collect()}
    assert got == {"a.com": (3, 2, "news"),
                   "b.com": (2, 2, "y"),
                   "c.com": (1, 1, "only")}


def test_top_fraction_gate_exact_with_ties(spark):
    """Exact top-fraction selection on a finite score grid: keeps
    exactly ceil(frac*N) rows when scores are distinct, keeps ALL
    threshold ties otherwise, never under-selects; plan has no
    corpus-grain global sort (the only window runs on the histogram)."""
    from ocr_spark.operators.sampling import top_fraction_gate

    # distinct scores 1..10, frac 0.3 -> threshold is 8, keep {8,9,10}
    df = spark.createDataFrame([(i, float(i)) for i in range(1, 11)],
                               "id long, s double")
    got = {r["id"]: r["kept"] for r in
           top_fraction_gate(df, "s", 0.3).collect()}
    assert got == {i: i >= 8 for i in range(1, 11)}

    # ties at the threshold: scores [5,5,5,3,1], frac 0.4 -> target 2,
    # cum at score 5 is 3 >= 2 -> all three 5s kept
    tie = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 5.0), (4, 3.0), (5, 1.0)],
        "id long, s double")
    gt = {r["id"]: r["kept"] for r in
          top_fraction_gate(tie, "s", 0.4).collect()}
    assert gt == {1: True, 2: True, 3: True, 4: False, 5: False}

    # frac=1.0 keeps everything; frac=0 keeps NOTHING; empty input
    # yields a total boolean column, not NULLs
    assert all(r["kept"] for r in
               top_fraction_gate(tie, "s", 1.0).collect())
    assert not any(r["kept"] for r in
                   top_fraction_gate(tie, "s", 0.0).collect())
    empty = spark.createDataFrame([], "id long, s double")
    assert top_fraction_gate(empty, "s", 0.4).collect() == []
    one = top_fraction_gate(
        spark.createDataFrame([(1, None)], "id long, s double"),
        "s", 0.4).collect()
    assert one[0]["kept"] is False  # NULL score never kept

    # exact python mirror on the real table's quality grid
    from ocr_spark.operators.textstats import quality_expr
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = d.select("doc_id", quality_expr(F.col("text")).alias("q"))
    kept_ids = {r["doc_id"] for r in
                top_fraction_gate(q, "q", 0.4).collect() if r["kept"]}
    rows = sorted(((r["q"], r["doc_id"]) for r in q.collect()),
                  reverse=True)
    import math
    target = math.ceil(0.4 * len(rows))
    thr = rows[target - 1][0]
    exp_ids = {i for s, i in rows if s >= thr}
    assert kept_ids == exp_ids
    assert len(kept_ids) >= target


def test_parse_robots_groups_and_eval():
    """robots.txt parsing: group selection (specific agent beats *),
    multi-agent groups, empty Disallow, comments/garbage total; and
    longest-prefix/allow-tie evaluation."""
    from ocr_spark.core.robots import parse_robots, robots_allows

    txt = ("# crawler policy\n"
           "User-agent: googlebot\n"
           "Disallow: /private\n"
           "Allow: /private/ok\n"
           "\n"
           "User-agent: abot\n"
           "User-agent: bbot\n"
           "Disallow: /b\n"
           "\n"
           "User-agent: *\n"
           "Disallow: /tmp\n"
           "Allow: /tmp/keep\n"
           "Disallow:\n")
    g = parse_robots(txt, "Googlebot/2.1")
    assert g == [("/private", False), ("/private/ok", True)]
    assert robots_allows(g, "/private/x") is False
    assert robots_allows(g, "/private/ok/y") is True
    assert robots_allows(g, "/anything") is True
    # multi-agent group shared; star fallback for unknown agents
    assert parse_robots(txt, "bbot") == [("/b", False)]
    s = parse_robots(txt, "unknown")
    assert ("/tmp", False) in s and ("", True) in s
    assert robots_allows(s, "/tmp/keep/z") is True
    assert robots_allows(s, "/tmp/x") is False
    # total on garbage / empty; allow wins same-length tie
    assert parse_robots("no colons here\n:::", "x") == []
    assert robots_allows([], "/a") is True
    assert robots_allows([("/a", False), ("/a", True)], "/a/b") is True
    # RFC 9309 group MERGE: repeated groups for the same agent combine
    two_star = ("User-agent: *\nDisallow: /admin\n\n"
                "User-agent: *\nDisallow: /private\n")
    ms = parse_robots(two_star, "anybot")
    assert ("/admin", False) in ms and ("/private", False) in ms
    two_specific = ("User-agent: abot\nDisallow: /one\n\n"
                    "User-agent: abot\nDisallow: /two\n")
    m2 = parse_robots(two_specific, "abot")
    assert ("/one", False) in m2 and ("/two", False) in m2


def test_apply_robots_matches_python_mirror(spark):
    """Distributed robots evaluation vs robots_allows on every URL:
    longest match, allow-tie, unmatched-host default, no-path URL."""
    from ocr_spark.core.robots import robots_allows
    from ocr_spark.operators.urls import apply_robots

    rules_py = {"a.com": [("/x", False), ("/x/ok", True), ("/x", True)],
                "b.com": [("/", False)]}
    rules = spark.createDataFrame(
        [(h, p, a) for h, rs in rules_py.items() for p, a in rs],
        "host string, prefix string, allow boolean")
    urls = [(1, "https://a.com/x/deep"), (2, "https://a.com/x/ok/f"),
            (3, "https://a.com/free"), (4, "https://b.com/any"),
            (5, "https://c.com/x"), (6, "https://a.com"),
            (7, "HTTPS://b.com/raw-capture")]  # raw uppercase scheme
    df = spark.createDataFrame(urls, "id long, url string")
    got = {r["id"]: r["robots_ok"] for r in
           apply_robots(df, "id", "url", rules).collect()}

    def path_of(u):
        i = u.find("/", u.find("://") + 3)
        return u[i:] if i >= 0 else "/"

    exp = {i: robots_allows(rules_py.get(
        u.split("://")[1].split("/")[0], []), path_of(u))
        for i, u in urls}
    assert got == exp
    assert got[1] is True   # same-length tie at /x -> allow wins
    assert got[5] is True   # unknown host -> allowed
    assert got[4] is False
    assert got[7] is False  # uppercase scheme must NOT bypass the gate


def test_lm_fused_scoring_equals_separate_ops(spark):
    """lm_ppl_and_dsir (one explode, both LMs) returns exactly what
    lm_perplexity + dsir_weights compute separately."""
    from ocr_spark.operators.sampling import dsir_weights, lm_ppl_and_dsir

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lm = T.fit_bigram_lm(d, "doc_id", "text")
    tlm = T.fit_bigram_lm(d.where(F.col("lang") == "en"),
                          "doc_id", "text")
    fused = {r["doc_id"]: (r["ppl"], r["dsir_w"]) for r in
             lm_ppl_and_dsir(d, "doc_id", "text", tlm, lm).collect()}
    ppl = {r["doc_id"]: r["ppl"] for r in
           T.lm_perplexity(d, "doc_id", "text", lm).collect()}
    dsir = {r["doc_id"]: r["dsir_w"] for r in
            dsir_weights(d, "doc_id", "text", tlm, lm).collect()}
    assert fused == {i: (ppl[i], dsir[i]) for i in ppl}
    assert any(v[0] is not None for v in fused.values())


def test_sitemap_locs_total_and_entry_scoped():
    """sitemap.xml parsing: urlset + sitemapindex shapes, lastmod
    scoped to its OWN entry (an orphan lastmod never attaches to the
    previous loc), whitespace-trimmed locs, raw entities, totality."""
    from ocr_spark.core.sitemap import sitemap_locs

    xml = ('<?xml version="1.0" encoding="UTF-8"?>\n'
           '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
           '<url><loc>https://a.com/p1?x=1&y=2</loc>'
           '<lastmod>2024-01-02</lastmod></url>'
           '<url><loc>\n  https://a.com/p2\n</loc></url>'
           '<url><lastmod>2024-09-09</lastmod></url>'  # orphan
           '</urlset>')
    assert sitemap_locs(xml) == [
        ("https://a.com/p1?x=1&y=2", "2024-01-02"),
        ("https://a.com/p2", None)]
    idx = ('<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc>'
           '</sitemap><sitemap><lastmod>z</lastmod>'
           '<loc>https://a.com/s2.xml</loc></sitemap></sitemapindex>')
    assert sitemap_locs(idx) == [("https://a.com/s1.xml", None),
                                 ("https://a.com/s2.xml", None)]
    assert sitemap_locs("") == []
    assert sitemap_locs("not xml <<< at all") == []
    assert sitemap_locs("<loc></loc>") == []   # empty loc dropped
    # bare loc without a wrapper still counts (lenient)
    assert sitemap_locs("<loc>https://x/1</loc>") == [("https://x/1",
                                                       None)]


def test_zorder_key_and_layout(spark):
    """Morton key vs an exact python bit-interleave mirror, and
    zorder_layout producing sorted, range-disjoint partitions."""
    from ocr_spark.functions.bucketing import zorder_key, zorder_layout

    def mirror(vals, bits=9):
        n, mask, z = len(vals), (1 << 9) - 1, 0
        for j, v in enumerate(vals):
            v &= mask
            for i in range(bits):
                z += ((v >> i) & 1) << (i * n + j)
        return z

    rows = [(i, (i * 37) % 600, (i * 53) % 150) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = {r["id"]: r["z"] for r in df.select(
        "id", zorder_key([F.col("a"), F.col("b")]).alias("z")).collect()}
    assert got == {i: mirror([a, b]) for i, a, b in rows}
    # locality property: interleaving bounds the key spread of a value
    # box — two rows equal in both dims share the key exactly
    assert mirror([5, 7]) == mirror([5 + 512, 7])  # mask applies

    laid = zorder_layout(df, ["a", "b"], n_files=4)
    parts = laid.select(F.spark_partition_id().alias("p"), "_z").collect()
    by_p = {}
    for r in parts:
        by_p.setdefault(r["p"], []).append(r["_z"])
    assert len(by_p) == 4
    ranges = sorted((min(v), max(v)) for v in by_p.values())
    for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # range-disjoint files -> min/max pruning works
    for v in by_p.values():
        assert v == sorted(v)  # sorted within partition


def test_c4_line_filter_rules(spark):
    """C4 §2.2 line rules, each exercised: terminal punctuation (. ! ?
    double-quote, checked on the TRIMMED line), >= min_words words,
    no 'javascript' (case-insensitive); kept lines re-join by newline
    in original order; docs with no newline are a single line; empty
    text yields one empty (dropped) line."""
    rows = [
        (1, "one two three four five.\n"          # kept
            "one two three four five\n"           # no terminal punct
            "three word line.\n"                  # < 5 words
            "enable JavaScript to view this page.\n"  # js rule
            "does it really end well?\n"          # kept (?)
            'he said "quote me on that"\n'        # kept (")
            "trailing spaces count four five.   "),  # kept (trim first)
        (2, "single line with five words!"),      # kept, no newline
        (3, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["c4"] for r in df.select(
        "doc_id",
        T.c4_line_filter(F.col("text")).alias("c4")).collect()}
    assert got[1]["n_lines"] == 7
    assert got[1]["n_kept"] == 4
    assert got[1]["clean"] == (
        "one two three four five.\n"
        "does it really end well?\n"
        'he said "quote me on that"\n'
        "trailing spaces count four five.   ")
    assert got[2] == (1, 1, "single line with five words!")
    assert got[3] == (1, 0, "")
    # min_words is a real knob
    got3 = df.where("doc_id = 1").select(
        T.c4_line_filter(F.col("text"), min_words=3)["n_kept"]
        .alias("k")).collect()[0]["k"]
    assert got3 == 5  # 'three word line.' re-admitted; js line still out


def test_c4_page_flags(spark):
    """Page-grain policy: badword hit count via a broadcast blocklist
    TABLE (case-insensitive), lorem-ipsum + brace flags, combined
    verdict; docs with zero blocklist hits take the left-join
    coalesce-0 path."""
    rows = [
        (1, "clean words only here"),
        (2, "one Bad word and another BAD one"),
        (3, "Lorem Ipsum dolor sit amet"),
        (4, "some code { return 1; }"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    bw = spark.createDataFrame([("bad",)], ["word"])
    got = {r["doc_id"]: (r["n_badwords"], r["has_lorem"], r["has_brace"],
                         r["c4_kept"])
           for r in T.c4_page_flags(df, "doc_id", "text", bw).collect()}
    assert got == {
        1: (0, False, False, True),
        2: (2, False, False, False),
        3: (0, True, False, False),
        4: (0, False, True, False),
        5: (0, False, False, True),
    }


def test_bpe_train_paper_example():
    """Sennrich et al. 2016's worked example: {low:5, lower:2, newest:6,
    widest:3} learns es -> est -> est</w> -> lo -> low first (with the
    documented highest-count / smallest-pair tie-break)."""
    from ocr_spark.operators import bpe as B
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = B.bpe_train(wf, 5)
    assert merges == [("e", "s"), ("es", "t"), ("est", B.END),
                      ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert B.bpe_segment("newest", ranks) == ["n", "e", "w",
                                              "est" + B.END]
    assert B.bpe_segment("lowest", ranks) == ["low", "est" + B.END]
    # marker-strip normalization: END codepoints in input words vanish
    assert B.bpe_segment("new" + B.END + "est", ranks) == [
        "n", "e", "w", "est" + B.END]
    assert B.bpe_segment(B.END, ranks) == []
    # unseen characters segment to chars + END (never raises)
    assert B.bpe_segment("xyz", ranks) == ["x", "y", "z", B.END]
    # early stop: no pair occurs twice -> fewer merges than asked
    assert B.bpe_train([("ab", 1)], 10) == []


def _naive_bpe_apply(word, merges):
    """Independent mirror of segmentation: replay the merge LIST in
    learned order (rank order == replay order for BPE), each merge
    applied to all occurrences left-to-right."""
    from ocr_spark.operators.bpe import END
    sym = list(word.replace(END, "")) + [END]
    for a, b in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_bpe_tokenize_distributed_roundtrip(spark):
    """End-to-end over the real testdata corpus: distributed word
    frequencies -> driver merge loop -> Arrow-batched tokenizer UDF.
    Every doc's tokens (a) match the independent naive merge-replay
    mirror word-for-word and (b) detokenize back to the original
    whitespace-normalized text; NULL text stays NULL."""
    from ocr_spark.operators import bpe as B
    d = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
         .limit(60))
    wf = B.word_frequencies(d, "text", top_v=200).collect()
    merges = B.bpe_train([(r["word"], r["cnt"]) for r in wf], 50)
    assert len(merges) == 50
    got = {r["doc_id"]: (r["tokens"], r["n_bpe_tokens"])
           for r in B.bpe_tokenize(d, "doc_id", "text", merges).collect()}
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    assert set(got) == set(texts)
    for i, text in texts.items():
        toks, n = got[i]
        assert n == len(toks)
        words = [w for w in text.split(" ") if w]
        expect = [t for w in words for t in _naive_bpe_apply(w, merges)]
        assert toks == expect
        assert B.detokenize(toks) == " ".join(words)
    # merges compress: fewer tokens than characters-per-word baseline
    base = sum(len(w) + 1 for ws in texts.values()
               for w in ws.split(" ") if w)
    assert sum(n for _, n in got.values()) < base


def test_bpe_word_frequencies_top_v(spark):
    """top_v cap is deterministic (count desc, word asc) and the
    aggregation counts every occurrence."""
    from ocr_spark.operators import bpe as B
    df = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a c  c")], ["doc_id", "text"])
    allf = {r["word"]: r["cnt"]
            for r in B.word_frequencies(df, "text").collect()}
    assert allf == {"a": 3, "b": 3, "c": 3}
    top = B.word_frequencies(df, "text", top_v=2).collect()
    assert sorted((r["word"], r["cnt"]) for r in top) == [("a", 3), ("b", 3)]


def test_quantile_buckets_terciles(spark):
    """CCNet-style per-group terciles: integer cut ranks (ceil(n*k/3)
    via floor-div), ties fall into the LOWER bucket, NULL scores get a
    NULL bucket, groups bucket independently — exact Python mirror."""
    import math

    from ocr_spark.operators.sampling import quantile_buckets
    rows = []
    # group a: 1..9 -> thresholds at rank 3 and 6 (scores 3.0 and 6.0)
    rows += [(f"a{i}", "a", float(i)) for i in range(1, 10)]
    # group b: heavy ties at 1.0 (5 of 7) -> head swallows the tie run
    rows += [(f"b{i}", "b", 1.0) for i in range(5)]
    rows += [("b5", "b", 2.0), ("b6", "b", 3.0)]
    # group c: a single doc -> everything is head
    rows += [("c0", "c", 9.9)]
    # NULL scores ride along unbucketed
    rows += [("a_null", "a", None), ("d_null", "d", None)]
    # NULL group key: joins no threshold row -> NULL bucket, never 'tail'
    rows += [("g_null", None, 5.0)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "ppl"])
    got = {r["doc_id"]: r["bucket"]
           for r in quantile_buckets(df, "grp", "ppl").collect()}

    def mirror():
        by_g = {}
        for did, g, s in rows:
            if s is not None and g is not None:
                by_g.setdefault(g, []).append(s)
        out = {}
        for did, g, s in rows:
            if s is None or g is None:
                out[did] = None
                continue
            vals = sorted(by_g[g])
            n = len(vals)
            t1 = vals[math.ceil(n / 3) - 1]
            t2 = vals[math.ceil(2 * n / 3) - 1]
            out[did] = ("head" if s <= t1 else
                        "middle" if s <= t2 else "tail")
        return out

    assert got == mirror()
    # spot-check the tie rule: all five 1.0s are head (> n/3 of group
    # b), and the tie run swallows BOTH thresholds (t1 = t2 = 1.0) so
    # the middle bucket is empty and everything above is tail
    assert [got[f"b{i}"] for i in range(5)] == ["head"] * 5
    assert got["b5"] == "tail" and got["b6"] == "tail"
    assert got["c0"] == "head"
    assert got["a_null"] is None and got["d_null"] is None
    assert got["g_null"] is None


def test_pack_sequences_bfd(spark):
    """Best-fit-decreasing sequence packing: capacity respected, whole
    docs only, oversize docs flagged into singleton packs, NULL lengths
    total, determinism across runs — and an independent naive BFD
    mirror reproduces every assignment per bucket."""
    import bisect
    import hashlib

    from ocr_spark.operators.packing import pack_sequences

    cap, nb = 100, 4
    rows = [(i, (i * 37) % 90 + 8) for i in range(80)]
    rows += [(100, 150), (101, None)]   # oversize + NULL length
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    got = pack_sequences(df, "doc_id", "n_tok", cap, n_buckets=nb)
    out = {r["doc_id"]: (r["n_tok"], r["pack_id"], r["oversize"])
           for r in got.collect()}
    assert set(out) == {i for i, _ in rows}

    # capacity invariant (oversize singletons exempt by contract)
    sums: dict = {}
    for did, (ln, pid, ov) in out.items():
        if not ov:
            sums[pid] = sums.get(pid, 0) + (ln or 0)
    assert all(s <= cap for s in sums.values())
    assert out[100][2] is True
    ov_pack = out[100][1]
    assert [d for d, v in out.items() if v[1] == ov_pack] == [100]
    assert out[101][0] is None and out[101][2] is False

    # independent mirror: same bucketing, same order, naive BFD scan
    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    mirror = {}
    for b in range(nb):
        items = sorted(((ln if ln is not None else 0, i)
                        for i, ln in rows if h(i) % nb == b),
                       key=lambda t: (-t[0], t[1]))
        bins = []   # (remaining, idx), kept sorted
        n = 0
        for ln, i in items:
            if ln > cap:
                continue   # patched to fresh singleton afterwards
            j = bisect.bisect_left(bins, (ln, -1))
            if j < len(bins):
                rem, idx = bins.pop(j)
                bisect.insort(bins, (rem - ln, idx))
            else:
                idx = n
                bisect.insort(bins, (cap - ln, idx))
                n += 1
            mirror[i] = b * (1 << 40) + idx
        for ln, i in items:
            if ln > cap:
                mirror[i] = b * (1 << 40) + n
                n += 1
    assert {d: v[1] for d, v in out.items()} == mirror

    # determinism: a second run yields identical assignments
    again = {r["doc_id"]: r["pack_id"]
             for r in pack_sequences(df, "doc_id", "n_tok", cap,
                                     n_buckets=nb).collect()}
    assert again == {d: v[1] for d, v in out.items()}

    # packing quality: BFD never uses more packs than one-doc-per-pack
    n_small = sum(1 for _, ln in rows if ln is not None and ln <= cap)
    assert len(sums) < n_small


def test_robots_wildcards_core():
    """RFC 9309 §2.2.3 wildcards: `*` matches any char run, a trailing
    `$` anchors the end (a mid-pattern `$` is literal), specificity =
    rule-string length with wildcards counted, allow still wins ties;
    pattern_re emits syntax valid in both Java regex and RE2."""
    from ocr_spark.core.robots import (parse_robots, pattern_re,
                                       robots_allows)

    rules = [("/*.php$", False), ("/fish*", False), ("/fish*/ok", True)]
    assert robots_allows(rules, "/dir/x.php") is False
    assert robots_allows(rules, "/dir/x.php?y=1") is True   # $ anchors
    assert robots_allows(rules, "/fishheads/a") is False
    assert robots_allows(rules, "/fishtank/ok/page") is True  # longer wins
    # unmatched default
    assert robots_allows(rules, "/other") is True
    # parse keeps wildcard rules verbatim
    g = parse_robots("User-agent: *\nDisallow: /*/tmp$\n", "x")
    assert g == [("/*/tmp$", False)]
    assert robots_allows(g, "/a/tmp") is False
    assert robots_allows(g, "/a/tmp/file") is True
    assert pattern_re("/*/page-3$") == "^/.*/page\\-3$"


def test_apply_robots_wildcards_distributed(spark):
    """The distributed evaluator under a wildcard rule table matches
    robots_allows URL-for-URL (regexp_like residual on the broadcast
    join; specificity = rule-string length)."""
    from ocr_spark.core.robots import robots_allows
    from ocr_spark.operators.urls import apply_robots, robots_rule_table

    pats = [("/de", False), ("/de/page-1", True), ("/*/page-3$", False)]
    rules = robots_rule_table(
        spark, [("h.example.com", p, a) for p, a in pats])
    paths = ["/de/x", "/de/page-1/y", "/en/page-3", "/en/page-30",
             "/fr/page-3", "/de/page-3", "/", "/en/other"]
    df = spark.createDataFrame(
        [(i, f"https://h.example.com{p}") for i, p in enumerate(paths)],
        ["doc_id", "url"])
    got = {r["doc_id"]: r["robots_ok"]
           for r in apply_robots(df, "doc_id", "url", rules).collect()}
    expect = {i: robots_allows(pats, p) for i, p in enumerate(paths)}
    assert got == expect
    # the $ anchor is live: page-3 blocked, page-30 allowed
    assert got[2] is False and got[3] is True


def test_parse_sitemap_urls_from_robots():
    """Sitemap: lines are group-independent metadata (collected from
    the whole file), order-preserving, first-occurrence-deduped,
    comment-stripped, and total on malformed input — the discovery
    hook joining the robots gate to the sitemap parser."""
    from ocr_spark.core.robots import parse_sitemap_urls

    txt = ("User-agent: a\nDisallow: /x\n"
           "Sitemap: https://h.example.com/sitemap.xml  # primary\n"
           "User-agent: *\n"
           "sitemap: https://h.example.com/news.xml\n"
           "Sitemap: https://h.example.com/sitemap.xml\n"   # dup
           "Sitemap:\n"                                      # empty
           "Sitemap https://no-colon.example.com/s.xml\n")   # malformed
    assert parse_sitemap_urls(txt) == [
        "https://h.example.com/sitemap.xml",
        "https://h.example.com/news.xml"]
    assert parse_sitemap_urls("") == []
    assert parse_sitemap_urls("garbage\n:::\n") == []


def test_apply_robots_bare_table_wildcards_not_literal(spark):
    """The review scenario: a bare 3-column (host, prefix, allow) table
    carrying a wildcard rule (the shape parse_robots feeds) must NOT
    evaluate the pattern as a literal prefix — apply_robots collects
    and re-translates it, so verdicts match core robots_allows."""
    from ocr_spark.core.robots import robots_allows
    from ocr_spark.operators.urls import apply_robots

    pats = [("/*/tmp$", False)]
    bare = spark.createDataFrame(
        [("h.example.com", p, a) for p, a in pats],
        "host string, prefix string, allow boolean")
    df = spark.createDataFrame(
        [(1, "https://h.example.com/a/tmp"),
         (2, "https://h.example.com/a/tmp/file")],
        ["doc_id", "url"])
    got = {r["doc_id"]: r["robots_ok"]
           for r in apply_robots(df, "doc_id", "url", bare).collect()}
    assert got == {1: robots_allows(pats, "/a/tmp"),
                   2: robots_allows(pats, "/a/tmp/file")}
    assert got == {1: False, 2: True}


def test_apply_robots_bare_table_collect_is_capped(spark, monkeypatch):
    """ADVICE r4: the bare-3-column convenience collect is bounded — a
    contract-violating large rules table raises a directed error instead
    of OOMing the driver."""
    import pytest as _pytest

    from ocr_spark.operators import urls as U

    bare = spark.createDataFrame(
        [(f"h{i}.com", "/x", False) for i in range(5)],
        ["host", "prefix", "allow"])
    df = spark.createDataFrame([(1, "https://h0.com/x")], ["doc_id", "url"])
    monkeypatch.setattr(U, "MAX_BARE_RULES", 3)
    with _pytest.raises(ValueError, match="robots_rule_table"):
        U.apply_robots(df, "doc_id", "url", bare)


def test_bpe_memo_lru_keeps_recent_models():
    """ADVICE r4: the per-worker segmentation memo is a small LRU —
    interleaved jobs with different merge tables no longer thrash each
    other's word memos, and old models are evicted oldest-first."""
    from ocr_spark.operators import bpe as B

    B._MEMO.clear()
    keys = [((f"a{i}", "b"),) for i in range(B._MEMO_MAX + 2)]
    for k in keys:
        B._memo_entry(k, list(k))
    assert len(B._MEMO) == B._MEMO_MAX
    assert keys[0] not in B._MEMO and keys[1] not in B._MEMO
    # a hit refreshes recency: touching the oldest survivor keeps it
    # alive through the next insertion
    survivor = keys[2]
    B._memo_entry(survivor, list(survivor))
    B._memo_entry((("z", "z"),), [("z", "z")])
    assert survivor in B._MEMO
    B._MEMO.clear()


def test_remove_duplicated_spans_matches_python_mirror(spark):
    """ExactSubstr removal (Lee et al. 2021 §4.1, word grain): an exact
    independent mirror — positional k-grams, corpus-wide >= 2 counts,
    union of duplicated windows removed from EVERY occurrence — must
    reproduce clean_text/dup_words byte-for-byte, including NULL/empty/
    no-dup docs and within-doc repeats."""
    from collections import Counter

    from ocr_spark.operators.dedup import remove_duplicated_spans

    K = 3
    shared = "alpha beta gamma delta epsilon"
    docs = [
        (1, f"intro words {shared} tail one"),
        (2, f"other lead {shared} closing remarks here"),
        (3, "x y z x y z x y z"),              # within-doc repetition
        (4, "completely unique words nothing repeats at all"),
        (5, None),
        (6, ""),
        (7, "a b"),                             # shorter than k
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: (r["clean_text"], r["dup_spans"], r["dup_words"])
           for r in remove_duplicated_spans(df, "doc_id", "text",
                                            k=K, min_count=2).collect()}

    # -- independent mirror --
    words = {i: ([w for w in t.split(" ") if w] if t is not None else None)
             for i, t in docs}
    grams = Counter()
    for ws in words.values():
        if ws:
            for p in range(len(ws) - K + 1):
                grams[" ".join(ws[p:p + K])] += 1
    for i, t in docs:
        ws = words[i]
        if ws is None:
            assert got[i] == (None, 0, 0)
            continue
        pos = [p for p in range(len(ws) - K + 1)
               if grams[" ".join(ws[p:p + K])] >= 2]
        rem = sorted({j for p in pos for j in range(p, p + K)})
        clean = " ".join(w for j, w in enumerate(ws) if j not in rem)
        spans = 0
        for a, b in zip([None] + pos, pos):
            if a is None or b - a > K:
                spans += 1
        assert got[i] == (clean, spans, len(rem)), f"doc {i}"
    # docs 1 and 2 share the 5-word sentence; doc 3 repeats within itself
    assert got[1][2] > 0 and got[2][2] > 0 and got[3][2] > 0
    assert shared not in got[1][0] and shared not in got[2][0]
    assert got[4] == (docs[3][1], 0, 0)


def test_maybe_broadcast_gate_degrades_to_shuffle_join(spark):
    """VERDICT r3 #3/#4: model-table lookups broadcast only under the
    size gate — past max_model_rows the SAME plan degrades to a shuffle
    join (no driver OOM), with identical values either way."""
    from ocr_spark.operators.textstats import model_quality_scores

    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        # the hint must DECIDE the strategy: disable the size-based
        # auto-broadcast and AQE's runtime re-plan for the assertion
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        wt = spark.range(100).selectExpr("CAST(id AS STRING) AS word",
                                         "CAST(id AS DOUBLE) AS weight")
        docs = spark.createDataFrame([(1, "1 2 oov"), (2, "3 3")],
                                     ["doc_id", "text"])
        small = model_quality_scores(docs, "doc_id", "text", wt,
                                     max_model_rows=1000)
        assert "BroadcastHashJoin" in \
            small._jdf.queryExecution().executedPlan().toString()
        big = model_quality_scores(docs, "doc_id", "text", wt,
                                   max_model_rows=10)
        plan = big._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert sorted(map(tuple, small.collect())) \
            == sorted(map(tuple, big.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_histogram_device_guards_ungridded_scores(spark):
    """VERDICT r3 #2: a continuous (unrounded) score column would build
    a corpus-sized window partition inside the histogram device — the
    grid guard must raise a directed error instead; rounded scores pass
    unchanged under the same bound."""
    import pytest as _pytest

    from ocr_spark.operators.sampling import (
        quantile_buckets, top_fraction_gate)

    n = 500
    # deterministic 'continuous' scores: every value distinct
    cont = spark.range(n).selectExpr(
        "id", "'g' AS g", "1.0 + id / 7777.0 AS score")
    with _pytest.raises(ValueError, match="coarser grid"):
        top_fraction_gate(cont, "score", 0.4, max_grid=100)
    with _pytest.raises(ValueError, match="coarser grid"):
        quantile_buckets(cont, "g", "score", max_grid=100)
    # a rounded score under the same bound works and is exact
    grid = cont.selectExpr("id", "g", "ROUND(score, 2) AS score")
    kept = top_fraction_gate(grid, "score", 0.4, max_grid=100) \
        .where("kept").count()
    assert kept >= int(0.4 * n)  # ties may exceed, never fall short
    assert quantile_buckets(grid, "g", "score", max_grid=100) \
        .where("bucket IS NOT NULL").count() == n


def test_kmeans_fit_distributed_combine_at_high_k(spark):
    """VERDICT r3 #5: the k-scale path — past DRIVER_COMBINE_MAX_K the
    Lloyd partials are combined by ONE groupBy('c') partial aggregation
    (plan shows the aggregate; the driver receives exactly k rows) and
    the result still matches the exact numpy mirror at k=4096, dim=64."""
    import numpy as np

    K, DIM, N, ITERS = 4096, 64, 8192, 2
    vec = ("transform(sequence(0, 63), d -> "
           "CAST(pmod(hash(id * 31 + d), 997) AS DOUBLE) / 499.0 - 1.0)")
    emb = spark.range(N).selectExpr("CAST(id AS INT) AS vec_id",
                                    f"{vec} AS embedding")
    init = list(range(K))
    got = S.kmeans_fit(emb, "vec_id", "embedding", init, n_iters=ITERS,
                       metric="l2")  # auto distributed_combine: k > 2048
    # the combine really is a distributed aggregate
    dummy = spark.createDataFrame(
        [(1, 2, [1.0, 2.0])], "c int, n long, s array<double>")
    plan = S._combine_partials(dummy, 2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Aggregate" in plan

    pdf = emb.toPandas()
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for r in pdf.itertuples()}
    cents = [vecs[i].copy() for i in init]
    ids = sorted(vecs)
    X = np.stack([vecs[i] for i in ids])
    for _ in range(ITERS):
        C = np.stack(cents)
        D2 = -2.0 * (X @ C.T) + np.sum(C * C, axis=1)[None, :]
        assign = np.round(D2, S.ARGMAX_ROUND).argmin(axis=1)
        cents = [X[assign == j].mean(axis=0) if (assign == j).any()
                 else cents[j] for j in range(len(cents))]
    assert np.allclose(np.stack(got), np.stack(cents), atol=1e-9)
    # and the driver path agrees with the distributed path bit-for-bit
    # at a size where both are tenable
    small_init = list(range(8))
    a = S.kmeans_fit(emb.limit(64), "vec_id", "embedding", small_init,
                     n_iters=2, metric="l2", distributed_combine=False)
    b = S.kmeans_fit(emb.limit(64), "vec_id", "embedding", small_init,
                     n_iters=2, metric="l2", distributed_combine=True)
    assert np.allclose(np.stack(a), np.stack(b), atol=1e-12)


def test_pq_trained_codebooks_recall(spark):
    """VERDICT r3 #8: PQ codebooks trained IN-PIPELINE (per-subspace L2
    kmeans_fit over F.slice'd vectors) — ADC top-k over the trained
    codes must recover most of the exact L2 top-k. Corpus is a
    deterministic CLUSTER-STRUCTURED set (20 centers, dim 64, small
    noise): the testdata embeddings are distance-concentrated random
    vectors where NO 64-bit quantizer can rank neighbors, so they test
    plumbing, not training — structure is what PQ training must
    exploit. The trained books must also beat the driver query's
    deterministic stand-in codebook on the same query."""
    import numpy as np

    rng = np.random.default_rng(0)
    C, PER, DIM = 20, 25, 64
    centers = rng.normal(size=(C, DIM))
    X = np.repeat(centers, PER, axis=0) \
        + 0.05 * rng.normal(size=(C * PER, DIM))
    emb = spark.createDataFrame(
        [(i, x.tolist()) for i, x in enumerate(X)],
        "vec_id int, embedding array<double>")
    M, KSUB, K = 4, 16, 10
    q = X[0]
    base = emb.where(F.col("vec_id") != 0)
    exact = set((1 + np.argsort(
        np.sum((X[1:] - q) ** 2, axis=1), kind="stable")[:K]).tolist())

    def recall(cb):
        enc = S.pq_encode(base, "vec_id", "embedding", cb)
        got = {r["vec_id"] for r in S.pq_adc_topk(
            enc, "vec_id", "codes", S.pq_adc_lut(list(q), cb),
            k=K).collect()}
        return len(got & exact) / K

    trained = S.pq_train_codebooks(emb, "vec_id", "embedding",
                                   M, KSUB, n_iters=4)
    assert len(trained) == M and len(trained[0]) == KSUB \
        and len(trained[0][0]) == DIM // M
    r_trained = recall(trained)
    # deterministic stand-in (the registered query's fixture codebook)
    from ocr_spark.queries.similarity_q import _PQ_CB
    assert r_trained >= 0.6, r_trained
    assert r_trained > recall(_PQ_CB), (r_trained, recall(_PQ_CB))


def test_gopher_quality_flags_matches_python_mirror(spark):
    """Exact Python mirror of the Gopher A1.1 rules on adversarial
    shapes: bullet-heavy, ellipsis-heavy, symbol-heavy, short, wordless,
    and a long natural page that passes every rule."""
    import re

    from ocr_spark.operators import textstats as T

    passing = ("the quick brown fox jumps over that lazy dog and it "
               "went to be with a pack of hounds near the river " * 3
               + "\nplain closing line with the end of that story and "
                 "more words to have with it")
    docs = [
        ("pass", passing),
        ("bullets", "\n".join(f"- item {i} of the list to be" for i in
                              range(10)) + "\nthe only plain line"),
        ("ellipsis", "\n".join(f"line {i} of the story that trails..."
                               for i in range(9)) + "\nthe end to be"),
        ("symbols", "# " * 30 + "the tag soup of... that page... to be"),
        ("short", "the tiny page of that"),
        ("numeric", " ".join(str(i) for i in range(80))
         + " the of that to be and have with"),
        ("empty", ""),
        ("blank_lines", "\n\n  \n" + passing),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict()
           for r in T.gopher_quality_flags(df, "doc_id", "text").collect()}

    def mirror(text):
        ws = [w for w in text.split(" ") if w != ""]
        nw = len(ws)
        dw = max(nw, 1)
        mean_wlen = sum(len(w) for w in ws) / dw
        n_sym = text.count("#") + len(re.findall(r"[.]{3}", text))
        lines = [l for l in text.split("\n") if l.strip() != ""]
        dl = max(len(lines), 1)
        bullet = sum(1 for l in lines
                     if l.strip().startswith(("- ", "* "))) / dl
        ell = sum(1 for l in lines if l.strip().endswith("...")) / dl
        alpha = sum(1 for w in ws if re.search("[A-Za-z]", w)) / dw
        stops = len({w for w in ws if w in T.GOPHER_STOPWORDS})
        ok = (T.GOPHER_MIN_WORDS <= nw <= T.GOPHER_MAX_WORDS
              and T.GOPHER_MIN_MEAN_WLEN <= mean_wlen
              <= T.GOPHER_MAX_MEAN_WLEN
              and n_sym / dw <= T.GOPHER_MAX_SYMBOL_RATIO
              and bullet <= T.GOPHER_MAX_BULLET_FRAC
              and ell <= T.GOPHER_MAX_ELLIPSIS_FRAC
              and alpha >= T.GOPHER_MIN_ALPHA_FRAC
              and stops >= T.GOPHER_MIN_STOP_HITS)
        return dict(g_n_words=nw, g_mean_wlen=round(mean_wlen, 4),
                    g_symbol_ratio=round(n_sym / dw, 4),
                    g_bullet_frac=round(bullet, 4),
                    g_ellipsis_frac=round(ell, 4),
                    g_alpha_frac=round(alpha, 4),
                    g_stop_hits=stops, gopher_pass=ok)

    for doc_id, text in docs:
        want = mirror(text)
        row = got[doc_id]
        for k, v in want.items():
            assert row[k] == pytest.approx(v) if isinstance(v, float) \
                else row[k] == v, (doc_id, k, row[k], v)
    # shape assertions: the adversarial docs exercise each branch
    assert got["pass"]["gopher_pass"] is True
    assert got["bullets"]["gopher_pass"] is False
    assert got["ellipsis"]["gopher_pass"] is False
    assert got["symbols"]["gopher_pass"] is False
    assert got["short"]["gopher_pass"] is False
    assert got["numeric"]["gopher_pass"] is False
    assert got["empty"]["gopher_pass"] is False
    assert got["blank_lines"]["gopher_pass"] is True


def test_ivf_pq_encode_and_search_match_numpy_mirror(spark):
    """IVFADC (Jégou 2011 §IV): cells, residual codes, and per-cell
    residual-LUT ADC ranking all match an exact numpy mirror —
    including a NULL vector row and the cell-conditional LUT selection
    at nprobe=2."""
    import numpy as np

    rng = np.random.default_rng(7)
    N, DIM, M, KSUB = 40, 16, 4, 8
    X = rng.normal(size=(N, DIM))
    cents = rng.normal(size=(3, DIM)).tolist()
    cb = (0.5 * rng.normal(size=(M, KSUB, DIM // M))).tolist()
    rows = [(i, X[i].tolist()) for i in range(N)] + [(N, None)]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")

    enc = S.ivf_pq_encode(emb, "vec_id", "embedding", cents, cb)
    got = {r["vec_id"]: (r["cell"], r["codes"]) for r in enc.collect()}
    assert got[N] == (None, None)

    C = np.asarray(cents)
    CB = np.asarray(cb)
    dsub = DIM // M

    def mirror(v):
        sims = np.round((v @ C.T) / (np.linalg.norm(v)
                                     * np.linalg.norm(C, axis=1)),
                        S.ARGMAX_ROUND)
        cell = int(np.argmax(sims)) + 1
        r = v - C[cell - 1]
        codes = []
        for s in range(M):
            acc = np.zeros(KSUB)
            for d in range(dsub):
                diff = r[s * dsub + d] - CB[s, :, d]
                acc = acc + diff * diff
            codes.append(int(np.argmin(np.round(acc, S.ARGMAX_ROUND))))
        return cell, codes

    exp_cells = {}
    for i in range(N):
        cell, codes = mirror(X[i])
        exp_cells[i] = cell
        assert got[i] == (cell, codes), i
    assert len(set(exp_cells.values())) > 1  # the test exercises >1 cell

    q = X[0]
    res = S.ivf_pq_search(enc, "vec_id", q.tolist(), cents, cb,
                          k=5, nprobe=2)
    got_rank = [(r["vec_id"], r["ivfpq_adc"]) for r in res.collect()]

    cells = S.nearest_cells(q.tolist(), cents, 2)
    exp = []
    for i in range(N):
        cell, codes = mirror(X[i])
        if cell not in cells:
            continue
        qr = q - C[cell - 1]
        adc = 0.0
        for s in range(M):
            acc = np.zeros(KSUB)
            for d in range(dsub):
                diff = qr[s * dsub + d] - CB[s, :, d]
                acc = acc + diff * diff
            adc += np.round(acc, S.ARGMAX_ROUND)[codes[s]]
        exp.append((round(adc, 4), i))
    exp.sort()
    assert got_rank == [(i, a) for a, i in exp[:5]]


def test_ivf_pq_search_recall_beats_plain_pq(spark):
    """On cluster-structured data the IVFADC residual encoding must
    recover the exact L2 top-k better than plain PQ with the same
    (m, ksub) budget: the coarse quantizer absorbs the between-cluster
    energy so the codewords spend their bits on the small within-cluster
    displacement (Jégou 2011 §IV-A's stated motivation)."""
    import numpy as np

    rng = np.random.default_rng(1)
    # MORE clusters than codewords per subspace (64 > 16): raw PQ must
    # spend its codewords on cluster subcenters it cannot all represent,
    # while residual PQ only encodes the small within-cluster noise —
    # the regime where the residual advantage is structural, not luck.
    C_, PER, DIM, M, KSUB, K = 64, 12, 32, 4, 16, 10
    centers = rng.normal(size=(C_, DIM))
    X = np.repeat(centers, PER, axis=0) \
        + 0.1 * rng.normal(size=(C_ * PER, DIM))
    emb = spark.createDataFrame(
        [(i, x.tolist()) for i, x in enumerate(X)],
        "vec_id int, embedding array<double>")
    cents = centers.tolist()
    q = X[0]
    exact = set((1 + np.argsort(
        np.sum((X[1:] - q) ** 2, axis=1), kind="stable")[:K]).tolist())

    # residual codebooks: train per-subspace kmeans on v - centroid[cell]
    cells = np.argmax(np.round(
        (X @ centers.T) / (np.linalg.norm(X, axis=1, keepdims=True)
                           * np.linalg.norm(centers, axis=1)),
        S.ARGMAX_ROUND), axis=1)
    R = X - centers[cells]
    resid = spark.createDataFrame(
        [(i, r.tolist()) for i, r in enumerate(R)],
        "vec_id int, embedding array<double>")
    cb_res = S.pq_train_codebooks(resid, "vec_id", "embedding",
                                  M, KSUB, n_iters=4)
    enc = S.ivf_pq_encode(emb.where(F.col("vec_id") != 0),
                          "vec_id", "embedding", cents, cb_res)
    got = {r["vec_id"] for r in S.ivf_pq_search(
        enc, "vec_id", q.tolist(), cents, cb_res, k=K,
        nprobe=2).collect()}
    r_ivfpq = len(got & exact) / K

    cb_raw = S.pq_train_codebooks(emb, "vec_id", "embedding",
                                  M, KSUB, n_iters=4)
    enc_raw = S.pq_encode(emb.where(F.col("vec_id") != 0),
                          "vec_id", "embedding", cb_raw)
    got_raw = {r["vec_id"] for r in S.pq_adc_topk(
        enc_raw, "vec_id", "codes", S.pq_adc_lut(q.tolist(), cb_raw),
        k=K).collect()}
    r_raw = len(got_raw & exact) / K

    assert r_ivfpq >= 0.9, (r_ivfpq, r_raw)
    assert r_ivfpq > r_raw, (r_ivfpq, r_raw)


def _lr_mirror(docs, vocab_size, n_iters, lr, l2=0.0):
    """Exact single-process mirror of train_quality_classifier: same
    vocabulary cut ((-df, word) order), same length-normalized features
    (OOV tokens count in the denominator only), same full-batch GD."""
    import numpy as np

    feats = []
    dfreq: dict[str, int] = {}
    for _id, text, y in docs:
        ws = [w for w in text.split(" ") if w != ""]
        if not ws:
            continue
        cnt: dict[str, int] = {}
        for w in ws:
            cnt[w] = cnt.get(w, 0) + 1
        for w in cnt:
            dfreq[w] = dfreq.get(w, 0) + 1
        feats.append((float(y), cnt, len(ws)))
    vocab = sorted(dfreq, key=lambda w: (-dfreq[w], w))[:vocab_size]
    jmap = {w: j + 1 for j, w in enumerate(vocab)}
    w = np.zeros(len(vocab) + 1)
    losses = []
    for _ in range(n_iters):
        grad = np.zeros_like(w)
        loss = 0.0
        for y, cnt, n in feats:
            x = w[0] + sum(c / n * w[jmap[t]]
                           for t, c in cnt.items() if t in jmap)
            p = 1.0 / (1.0 + np.exp(-x))
            g = p - y
            grad[0] += g
            for t, c in cnt.items():
                if t in jmap:
                    grad[jmap[t]] += g * c / n
            loss += -np.log(max(p, 1e-12)) if y else \
                -np.log(max(1.0 - p, 1e-12))
        grad /= len(feats)
        if l2:
            grad[1:] += l2 * w[1:]
        w -= lr * grad
        losses.append(loss / len(feats))
    return {t: w[j] for t, j in jmap.items()}, w[0], losses


def test_train_quality_classifier_matches_numpy_mirror(spark):
    """Distributed full-batch logistic regression vs an exact
    single-process mirror: same vocabulary cut, same length-normalized
    sparse features, same gradient steps — including an all-OOV doc
    (trains the bias only), a wordless doc (excluded), and a vocab cut
    smaller than the corpus vocabulary."""
    import numpy as np

    docs = [
        (1, "good clean prose with structure and depth", 1),
        (2, "good thoughtful prose and careful structure", 1),
        (3, "spam spam click here spam buy now", 0),
        (4, "click buy spam now now now", 0),
        (5, "zzz qqq xxx", 0),          # all words fall below vocab cut
        (6, "", 1),                      # wordless: excluded from training
        (7, "good prose and spam mixed together here", 1),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string, label int")
    got_w, got_b, got_losses = T.train_quality_classifier(
        df, "doc_id", "text", "label", vocab_size=12, n_iters=6, lr=1.5)
    exp_w, exp_b, exp_losses = _lr_mirror(
        [(i, t, y) for i, t, y in docs], 12, 6, 1.5)

    got = {r["word"]: r["weight"] for r in got_w.collect()}
    assert set(got) == set(exp_w)
    for t in exp_w:
        assert abs(got[t] - exp_w[t]) < 1e-9, t
    assert abs(got_b - exp_b) < 1e-9
    assert np.allclose(got_losses, exp_losses, atol=1e-9)
    # descent actually happened
    assert got_losses[-1] < got_losses[0]


def test_train_quality_classifier_l2_and_separation(spark):
    """On separable data the trained model must (a) descend with l2
    regularization matching the mirror, (b) separate held-out docs when
    composed with model_quality_scores — the zero-train/serve-skew
    promise (scorer applies the exact feature map training optimized)."""
    rng_words_hi = ["insight", "analysis", "method", "result", "careful"]
    rng_words_lo = ["click", "buy", "winner", "free", "casino"]
    rows = []
    for i in range(40):
        hi = i % 2 == 0
        ws = (rng_words_hi if hi else rng_words_lo)
        text = " ".join(ws[(i + j) % 5] for j in range(6)) + " filler"
        rows.append((i, text, 1 if hi else 0))
    df = spark.createDataFrame(rows, "doc_id int, text string, label int")
    w_df, b, losses = T.train_quality_classifier(
        df, "doc_id", "text", "label", vocab_size=50, n_iters=25,
        lr=2.0, l2=0.01)
    _, _, exp_losses = _lr_mirror(
        [(i, t, y) for i, t, y in rows], 50, 25, 2.0, l2=0.01)
    import numpy as np
    assert np.allclose(losses, exp_losses, atol=1e-9)

    held = spark.createDataFrame(
        [(100, "careful analysis method insight here", 1),
         (101, "free casino winner click buy", 0)],
        "doc_id int, text string, label int")
    scored = {r["doc_id"]: r["model_score"]
              for r in T.model_quality_scores(
                  held, "doc_id", "text", w_df, bias=b).collect()}
    assert scored[100] > 0.5 > scored[101], scored
