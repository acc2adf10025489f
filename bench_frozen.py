"""FROZEN bench comparability subset (VERDICT r3 "what's wrong" #1 /
next-round #7).

Round 3 showed why the headline numbers cannot be compared across
rounds: composite queries keep absorbing new folds, so "f10 got 16x
slower" conflated genuinely new work (the TF-IDF fold) with regression.
This module pins SIX query spellings exactly as registered in round 4.

RULES: never edit these functions — future folds go into the live
registry (ocr_spark/queries/), not here. Operator-INTERNAL changes do
show up in these timings; that is the point: the subset measures the
engine at fixed semantics, so a cross-round delta here is a real engine
delta (or host noise, bounded by bench.py's printed spread), never fold
cost. Parameters are inlined as literals for the same reason.

bench.py runs this subset in its default mode and reports it under the
"frozen" key of the single JSON line.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _load(spark, sf_dir: str, table: str):
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# --- pinned parameters (r4 registry values, inlined) -------------------
_N_HASHES = 16            # minhash lanes
_N_PLANES = 12            # hyperplane count (seed 123, dim 64)
_N_BANDS = 2              # banded near-dup: 2 bands x 6 planes
_NEAR_DUP_THRESHOLD = 0.3
_PROBE_HAMMING = 2


def _planes():
    from ocr_spark.operators import similarity as S
    return S.hyperplanes(_N_PLANES, 64, seed=123)


def frozen_dedup_minhash_signatures(spark, sf):
    from ocr_spark.operators import dedup as D
    return D.minhash_signatures(_load(spark, sf, "documents"),
                                "doc_id", "text", _N_HASHES)


def frozen_dedup_embedding_cosine(spark, sf):
    from ocr_spark.operators import similarity as S
    return S.embedding_near_dup_pairs_banded(
        _load(spark, sf, "embeddings"), "vec_id", "embedding",
        _planes(), _N_BANDS, _NEAR_DUP_THRESHOLD)


def frozen_sim_ann_multiprobe(spark, sf):
    from ocr_spark.operators import similarity as S
    emb = _load(spark, sf, "embeddings")
    row = emb.where(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in row["embedding"]]
    return S.ann_search_multiprobe(emb, "vec_id", "embedding", qv,
                                   _planes(), k=5,
                                   probe_hamming=_PROBE_HAMMING)


def _weight_k(word: str) -> int:
    return int(hashlib.md5(word.encode()).hexdigest()[:15], 16) % 2001 \
        - 1000


def frozen_text_quality_score(spark, sf):
    from ocr_spark.operators import textstats as T
    d = _load(spark, sf, "documents")
    base = T.quality_features(d, "doc_id", "text")
    vocab = sorted(set(T.STOPWORDS)
                   | {w for ms in T.LANG_MARKERS.values() for w in ms})
    wt = spark.createDataFrame(
        [(w, _weight_k(w) / 1000.0) for w in vocab], ["word", "weight"])
    scores = T.model_quality_scores(d, "doc_id", "text", wt)
    return base.join(scores, "doc_id", "left")


def frozen_curation_pipeline(spark, sf):
    from ocr_spark.operators import textstats as T
    from ocr_spark.operators.dedup import (
        contaminated_ids, exact_dedup_survivors)
    d = _load(spark, sf, "documents")
    surv = exact_dedup_survivors(d, "doc_id", "text").select("doc_id")
    feats = T.repetition_stats(d, "doc_id", "text", carry=("lang",))
    gated = feats.where((F.col("n_words") >= 20)
                        & (F.col("distinct_ratio") >= 0.3))
    bench = d.where(F.col("doc_id") < 5).select("text")
    hits = contaminated_ids(d.select("doc_id", "text"), bench,
                            "doc_id", "text", k=3)
    clean = F.col("_hits").isNull()
    return (gated.join(surv, "doc_id").join(hits, "doc_id", "left")
            .groupBy("lang")
            .agg(F.sum(F.when(clean, 1).otherwise(0)).alias("kept"),
                 F.round(F.avg(F.when(clean, F.col("n_words"))), 4)
                 .alias("avg_words"),
                 F.sum(F.when(clean, 0).otherwise(1)).alias("n_contam")))


def frozen_f10_array_explode_topwords(spark, sf):
    from ocr_spark.operators.textstats import tf_idf_word_stats
    d = _load(spark, sf, "documents")
    return (tf_idf_word_stats(d, "doc_id", "text")
            .orderBy(F.desc("cnt"), "word").limit(50))


FROZEN = {
    "dedup_minhash_signatures": frozen_dedup_minhash_signatures,
    "dedup_embedding_cosine": frozen_dedup_embedding_cosine,
    "sim_ann_multiprobe": frozen_sim_ann_multiprobe,
    "text_quality_score": frozen_text_quality_score,
    "curation_pipeline": frozen_curation_pipeline,
    "f10_array_explode_topwords": frozen_f10_array_explode_topwords,
}
