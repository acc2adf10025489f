"""Incremental near-duplicate dedup against a persisted MinHash index.

The ingest pipeline's Bloom fingerprint history catches EXACT re-crawls
(dedup.dedup_incremental_vs_hashes), but near-duplicates — boilerplate
variants, mirrored pages with a changed date stamp, syndicated articles
— survive byte-hashing and accumulate across drops. Re-running corpus-
wide MinHash+LSH per drop is O(corpus text) every day; the index makes
near-dup dedup DROP-INCREMENTAL, the near-dup sibling of the Bloom
history:

  * the index stores ONE ROW PER DOCUMENT ``(id, sig, bands)`` — the
    n_hashes-lane MinHash signature and its LSH band hashes, ~(2 ×
    n_hashes) longs per doc (a fraction of a percent of corpus text
    bytes). Band-hash values are IDENTICAL to ``dedup.lsh_band_buckets``
    (same md5 lanes, same concat spelling), pinned by test.
  * per drop: signature the NEW docs (drop-sized work), probe the index
    by band collision, confirm candidates with the signature-estimated
    Jaccard, keep the non-matching docs, append THEIR rows to the index.
    Corpus text is never re-read and never re-signatured.

Scale shape of the probe (the part that sees the corpus): the index
scan is column-pruned to (id, sig, bands) and its band explode is
NARROW — no corpus shuffle; the drop's exploded band keys are
broadcast (size-gated: a giant drop degrades to a shuffle join, never
a driver OOM), so one drop costs one narrow index scan + a broadcast
hash join emitting only colliding candidates. Candidate confirmation
(zip_with lane equality over the two signature arrays) runs on the
candidate sliver only.

Replay/exactly-once contract (mirrors the Bloom history): the matching
view must contain ONLY drops with a done marker — a replayed drop that
committed its index rows before crashing would otherwise match
ITSELF and drop everything. ``plans/ingest_job.py`` gates the index
partitions by ``DropManifest.done_drops()``; the per-drop index commit
is a partition replace, so replay converges.

Reference parity: the reference has no incremental story (it re-scans
its image directory per run, hebrew-letter-segmentation.py:230-272);
this is the corpus-scale operation its batch shape implies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ocr_spark.operators.dedup import (
    DEFAULT_BAND_SIZE, DEFAULT_N_HASHES, DEFAULT_SHINGLE_K,
    minhash_signatures)
from ocr_spark.operators.hashing import md5long

# A drop's exploded band keys: one row per (doc, band). 4M rows ≈ a
# 250k-doc drop at 16 bands — comfortably broadcastable; bigger drops
# degrade to a shuffle join via maybe_broadcast.
DEFAULT_MAX_BROADCAST_ROWS = 4_000_000


def minhash_index_rows(df: DataFrame, id_col: str, text_col: str,
                       n_hashes: int = DEFAULT_N_HASHES,
                       band_size: int = DEFAULT_BAND_SIZE,
                       shingle_k: int = DEFAULT_SHINGLE_K) -> DataFrame:
    """One index row per doc: ``(id, sig array<bigint>, bands
    array<bigint>)`` — the seed-ordered MinHash signature and its band
    hashes. Built on the SAME lane/band spelling as
    ``dedup.minhash_signatures`` / ``lsh_band_buckets`` (one md5 per
    shingle feeding all lanes; band hash = md5 over the band's
    minhashes joined by ","), so values are interchangeable with the
    long-form operators — pinned by test and by the driver oracle
    (the dedup_minhash_signatures query's band fold)."""
    if n_hashes % band_size:
        raise ValueError(
            f"n_hashes ({n_hashes}) must be a multiple of band_size "
            f"({band_size})")
    sig = minhash_signatures(df, id_col, text_col, n_hashes, shingle_k)
    arr = (sig.groupBy(id_col)
           .agg(F.transform(
               F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
               lambda s: s["minhash"]).alias("sig")))
    bands = F.array(*[
        md5long(F.array_join(
            F.transform(F.slice(F.col("sig"), b * band_size + 1,
                                band_size),
                        lambda m: m.cast("string")), ","))
        for b in range(n_hashes // band_size)])
    return arr.select(id_col, "sig", bands.alias("bands"))


def explode_bands(rows: DataFrame, id_col: str) -> DataFrame:
    """(id, band, band_hash) long form of index rows — NARROW (the
    explode is a per-row map over the scan, no shuffle). Equal to
    ``dedup.lsh_band_buckets`` output for the same corpus."""
    return rows.select(
        id_col, F.posexplode("bands").alias("band", "band_hash"))


def _est_jaccard(a: Column, b: Column) -> Column:
    """Signature-estimated Jaccard: fraction of equal MinHash lanes."""
    return (F.size(F.filter(F.zip_with(a, b, lambda x, y: x == y),
                            lambda e: e))
            / F.size(a)).cast("double")


def neardup_matches(batch: DataFrame, index: DataFrame, id_col: str,
                    threshold: float = 0.8,
                    max_broadcast_rows: int | None =
                    DEFAULT_MAX_BROADCAST_ROWS) -> DataFrame:
    """Batch docs whose estimated Jaccard against SOME index doc clears
    ``threshold``: ``(id, matched_id, est_jaccard)``, one row per batch
    doc (the best-scoring match, ties broken by lowest matched id —
    deterministic under replay). ``batch``/``index`` are
    ``minhash_index_rows`` outputs; the index side must NOT contain the
    batch itself (see module docstring — the caller gates by done
    markers).

    Plan: index bands explode NARROW over the column-pruned index scan;
    the batch's exploded keys broadcast (size-gated) into one hash join
    emitting only band collisions; signatures compare on the candidate
    sliver; ONE partial-aggregated groupBy(batch id) picks the best
    match. The corpus side never shuffles."""
    from ocr_spark.operators.util import maybe_broadcast

    b = (explode_bands(batch, id_col)
         .withColumnRenamed(id_col, "_nd_id"))
    ix = (explode_bands(index, id_col)
          .withColumnRenamed(id_col, "_nd_matched"))
    cand = (ix.join(maybe_broadcast(b, max_broadcast_rows),
                    ["band", "band_hash"])
            .select("_nd_id", "_nd_matched").distinct())
    bsig = batch.select(F.col(id_col).alias("_nd_id"),
                        F.col("sig").alias("_nd_sig_b"))
    isig = index.select(F.col(id_col).alias("_nd_matched"),
                        F.col("sig").alias("_nd_sig_i"))
    scored = (cand.join(bsig, "_nd_id").join(isig, "_nd_matched")
              .select("_nd_id", "_nd_matched",
                      _est_jaccard(F.col("_nd_sig_b"),
                                   F.col("_nd_sig_i")).alias("est_j"))
              .where(F.col("est_j") >= threshold))
    best = (scored.groupBy("_nd_id")
            .agg(F.max("est_j").alias("best_j")))
    # deterministic tie-break: among equal best scores keep the LOWEST
    # matched id (a max_by struct would keep the highest)
    tie = (scored.join(best, "_nd_id")
           .where(F.col("est_j") == F.col("best_j"))
           .groupBy("_nd_id")
           .agg(F.min("_nd_matched").alias("matched_id"),
                F.max("est_j").alias("est_jaccard")))
    return tie.select(F.col("_nd_id").alias(id_col), "matched_id",
                      F.col("est_jaccard"))


def neardup_within(batch: DataFrame, id_col: str,
                   threshold: float = 0.8,
                   bucket_cap: int = 64) -> DataFrame:
    """Within-batch near-dup drops (greedy keep-first): the ids of
    batch docs for which a LOWER-id batch doc scores ≥ ``threshold``
    — the same deterministic lowest-id-survives rule as
    dedup_embedding_cosine, so replay reproduces identical winners.
    Returns a 1-column DataFrame of ids to drop.

    The naive band self-join is QUADRATIC in template-cluster size —
    a boilerplate cluster of C near-identical docs shares band
    buckets, so all-pairs candidate generation emits ~C²/2 rows
    (measured: one 3,014-doc cluster in the 60k bench corpus = ~36M
    pairs and a 9 s within-pass; a 100k-doc cluster would be 5·10⁹).
    Two devices bound it:

    1. IDENTICAL-signature collapse first (one groupBy over the sig
       arrays — LINEAR): an identical sig always scores 1.0 ≥ any
       threshold ≤ 1, so every non-minimum doc of a sig group is
       dropped outright, and checking the remaining docs against
       group MINIMA only is exact — if b's witness a (a<b, est≥t)
       was collapsed, its group minimum a'≤a<b has the SAME sig,
       hence the same score vs b. Template clusters (the actual
       mass at web scale) collapse to one row here.
    2. A per-bucket candidate CAP on the survivors' band join: each
       doc pairs against at most ``bucket_cap`` lowest-id docs per
       (band, band_hash) bucket — linear in bucket size. Survivors
       have DISTINCT sigs, so post-collapse buckets are small by
       construction (measured max 7 on the bench corpus) and the
       cap is exact there; it only bites on an adversarial cluster
       of near-identical-but-unequal sigs, where missing a pair
       past rank 64 means keeping an extra near-dup, never losing
       a doc."""
    sig_min = batch.groupBy("sig").agg(F.min(id_col).alias("_nd_keep"))
    with_min = batch.join(sig_min, "sig")
    ident_drops = (with_min.where(F.col(id_col) > F.col("_nd_keep"))
                   .select(id_col))
    rest = (with_min.where(F.col(id_col) == F.col("_nd_keep"))
            .select(id_col, "sig", "bands"))
    e = explode_bands(rest, id_col)
    w = Window.partitionBy("band", "band_hash").orderBy(id_col)
    a = (e.withColumn("_rk", F.row_number().over(w))
         .where(F.col("_rk") <= bucket_cap)
         .select(F.col(id_col).alias("_nd_a"), "band", "band_hash"))
    b = e.select(F.col(id_col).alias("_nd_b"), "band", "band_hash")
    cand = (a.join(b, ["band", "band_hash"])
            .where(F.col("_nd_a") < F.col("_nd_b"))
            .select("_nd_a", "_nd_b").distinct())
    s = rest.select(id_col, "sig")
    scored = (cand
              .join(s.select(F.col(id_col).alias("_nd_a"),
                             F.col("sig").alias("_sa")), "_nd_a")
              .join(s.select(F.col(id_col).alias("_nd_b"),
                             F.col("sig").alias("_sb")), "_nd_b")
              .where(_est_jaccard(F.col("_sa"), F.col("_sb"))
                     >= threshold))
    return (scored.select(F.col("_nd_b").alias(id_col))
            .unionByName(ident_drops).distinct())
