"""Dedup operator queries + DuckDB oracles over the documents table.

The oracle SQL mirrors the exact hash/shingle/band construction (shared
md5-derived 60-bit hash, ocr_spark/operators/hashing.py), so the driver
verifies sketch VALUES — minhash signatures, simhash bits, jaccard — not
just row counts.
"""

from __future__ import annotations

from ocr_spark.operators import dedup as D
from ocr_spark.operators.hashing import MOD_P, sql_md5long
from ocr_spark.queries import QuerySpec, load

QUERIES: list[QuerySpec] = []

N_HASHES = 16
BAND_SIZE = 2
_COEFFS = D.minhash_coeffs(N_HASHES)

# Shared CTE: distinct 3-word shingles per doc (mirror of word_shingles).
_SH_CTE = (
    "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
    "sh AS (SELECT DISTINCT doc_id, shingle FROM ("
    "SELECT doc_id, unnest(CASE WHEN len(ws) >= 3 THEN "
    "list_transform(range(1, len(ws) - 1), "
    "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) "
    "ELSE [array_to_string(ws, ' ')] END) AS shingle FROM w)) "
)

# Universal-hash lanes over ONE md5 per shingle (mirror of
# minhash_signatures): lane_s(h) = (a_s*h + b_s) % p.
_LANES_SQL = ", ".join(
    f"(({a} * h + {b}) % {MOD_P}) AS h{s}"
    for s, (a, b) in enumerate(_COEFFS))
_SIG_LONG = " UNION ALL ".join(
    f"SELECT doc_id, {s} AS seed, min(h{s}) AS minhash "
    f"FROM lanes GROUP BY doc_id" for s in range(N_HASHES))

_SIG_CTE = (
    ", hashes AS (SELECT doc_id, " + sql_md5long("shingle")
    + f" % {MOD_P} AS h FROM sh), "
    "lanes AS (SELECT doc_id, " + _LANES_SQL + " FROM hashes), "
    "sig AS (" + _SIG_LONG + ") "
)

_BANDS_CTE = (
    ", bands AS (SELECT doc_id, CAST(seed // " + str(BAND_SIZE) + " AS INT) "
    "AS band, " +
    sql_md5long("string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)")
    + " AS band_hash FROM sig GROUP BY doc_id, band) "
)

_SIG_SQL = (
    _SH_CTE + _SIG_CTE + _BANDS_CTE +
    "SELECT s.doc_id, CAST(s.seed AS INT) AS seed, s.minhash, "
    f"CAST(s.seed // {BAND_SIZE} AS INT) AS band, "
    "b.band_hash FROM sig s JOIN bands b ON s.doc_id = b.doc_id "
    f"AND s.seed // {BAND_SIZE} = b.band"
)


def q(name, sql, note=""):
    def deco(fn):
        QUERIES.append(QuerySpec(name, fn, sql, note))
        return fn
    return deco


# Incremental-dedup crawl split: "yesterday's crawl" = doc_id % 3 = 0,
# "today's batch" = doc_id % 2 = 0 — genuine re-fetch overlap at
# doc_id % 6 = 0, so the anti-join really drops rows. The Bloom prefilter
# never changes the row set (no false negatives), so the oracle is the
# plain NOT IN — the filter is purely the shuffle-volume lever
# (test_dedup_incremental_* pins the prune behaviour).
@q("dedup_exact",
   "WITH hist AS (SELECT DISTINCT md5(text) AS content_hash FROM documents "
   "WHERE doc_id % 3 = 0), "
   "nw AS (SELECT md5(text) AS content_hash, count(*) AS n_new "
   "FROM documents WHERE doc_id % 2 = 0 "
   "AND md5(text) NOT IN (SELECT content_hash FROM hist) GROUP BY 1) "
   "SELECT d.content_hash, d.doc_id, d.copies, "
   "CAST(d.content_hash IN (SELECT content_hash FROM hist) AS INT) "
   "AS in_hist, "
   "CAST(coalesce(nw.n_new, 0) AS BIGINT) AS n_new "
   "FROM (SELECT md5(text) AS content_hash, min(doc_id) AS doc_id, "
   "count(*) AS copies FROM documents GROUP BY 1) d "
   "LEFT JOIN nw USING (content_hash)",
   "exact dedup (hash-groupBy survivors) + r3 incremental dedup vs a "
   "historical corpus (dedup_incremental: distributed-built broadcast "
   "Bloom prefilter -> only the true-dup+fp sliver of the batch enters "
   "the exact anti-join; n_new counts today's batch docs whose content "
   "is absent from yesterday's crawl)")
def dedup_exact(spark, sf):
    from pyspark.sql import functions as F
    d = load(spark, sf, "documents")
    hist = d.where(F.col("doc_id") % 3 == 0)
    batch = d.where(F.col("doc_id") % 2 == 0)
    new_docs = D.dedup_incremental(batch, hist, "doc_id", "text")
    base = D.exact_dedup_survivors(d, "doc_id", "text")
    hist_hashes = (hist.select(F.md5("text").alias("content_hash"))
                   .distinct().withColumn("_ih", F.lit(1)))
    newagg = (new_docs.groupBy(F.md5("text").alias("content_hash"))
              .agg(F.count(F.lit(1)).alias("_nn")))
    return (base.join(hist_hashes, "content_hash", "left")
            .join(newagg, "content_hash", "left")
            .select("content_hash", "doc_id", "copies",
                    F.coalesce(F.col("_ih"), F.lit(0)).cast("int")
                    .alias("in_hist"),
                    F.coalesce(F.col("_nn"), F.lit(0)).cast("long")
                    .alias("n_new")))


@q("dedup_minhash_signatures", _SIG_SQL,
   "minhash: shingle -> 16 seeded hash lanes -> per-doc min, computed "
   "through the neardup-index (sig, bands) row grain — signature AND "
   "band-hash values verified against oracle (r4 fold: the persisted "
   "incremental near-dup index stores exactly these rows)")
def minhash_sigs(spark, sf):
    # computed through the INDEX-ROW spelling (operators/neardup.py —
    # the persisted per-doc (sig, bands) grain the drop-incremental
    # near-dup gate stores), exploded back to the long form + each
    # lane's band hash: the oracle thereby verifies the index's sig
    # AND band values, not just the long form
    from pyspark.sql import functions as F

    from ocr_spark.operators import neardup as ND
    rows = ND.minhash_index_rows(load(spark, sf, "documents"),
                                 "doc_id", "text", N_HASHES, BAND_SIZE)
    return (rows.select("doc_id", "bands",
                        F.posexplode("sig").alias("seed", "minhash"))
            .withColumn("band",
                        (F.col("seed") / BAND_SIZE).cast("int"))
            .select("doc_id", "seed", "minhash", "band",
                    F.element_at("bands", F.col("band") + 1)
                    .alias("band_hash")))


@q("dedup_minhash_lsh_pairs",
   _SH_CTE + _SIG_CTE + _BANDS_CTE +
   ", pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
   "count(*) AS shared_bands "
   "FROM bands a JOIN bands b ON a.band = b.band "
   "AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id "
   "GROUP BY 1, 2), "
   # equal-lane count over the FULL signatures (the near-dup gate's
   # candidate-confirmation statistic): estimated Jaccard per pair
   "eq AS (SELECT sa.doc_id AS id_a, sb.doc_id AS id_b, "
   "count(*) AS n_eq FROM sig sa JOIN sig sb ON sa.seed = sb.seed "
   "AND sa.minhash = sb.minhash AND sa.doc_id < sb.doc_id "
   "GROUP BY 1, 2) "
   "SELECT p.id_a, p.id_b, p.shared_bands, "
   f"ROUND(coalesce(e.n_eq, 0) / {N_HASHES}.0, 4) AS est_jaccard "
   "FROM pairs p LEFT JOIN eq e ON p.id_a = e.id_a AND p.id_b = e.id_b",
   "LSH: band -> bucket join -> candidate pairs + the signature-"
   "estimated Jaccard each pair confirms against (r4 fold: the "
   "statistic the drop-incremental near-dup gate thresholds)")
def minhash_lsh(spark, sf):
    from pyspark.sql import functions as F

    from ocr_spark.operators import neardup as ND
    d = load(spark, sf, "documents")
    rows = ND.minhash_index_rows(d, "doc_id", "text",
                                 N_HASHES, BAND_SIZE)
    sig = (rows.select("doc_id",
                       F.posexplode("sig").alias("seed", "minhash")))
    buckets = D.lsh_band_buckets(sig, "doc_id", BAND_SIZE)
    pairs = D.lsh_candidate_pairs(buckets, "doc_id")
    sa = rows.select(F.col("doc_id").alias("id_a"),
                     F.col("sig").alias("_sa"))
    sb = rows.select(F.col("doc_id").alias("id_b"),
                     F.col("sig").alias("_sb"))
    return (pairs.join(sa, "id_a").join(sb, "id_b")
            .select("id_a", "id_b", "shared_bands",
                    F.round(
                        F.size(F.filter(
                            F.zip_with(F.col("_sa"), F.col("_sb"),
                                       lambda x, y: x == y),
                            lambda e: e)) / F.lit(float(N_HASHES)),
                        4).alias("est_jaccard")))


@q("dedup_simhash",
   "WITH wd AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) "
   "AS word FROM documents), "
   "wf AS (SELECT doc_id, " + sql_md5long("word") + " AS h FROM wd "
   "WHERE word <> ''), "
   "bits AS (SELECT doc_id, b, sum(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 "
   "THEN 1 ELSE -1 END) AS s FROM wf CROSS JOIN "
   "(SELECT unnest(range(32)) AS b) GROUP BY doc_id, b) "
   "SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN "
   "(CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) "
   "AS simhash FROM bits GROUP BY doc_id",
   "simhash: sign-aggregated 32-bit word-hash sketch")
def simhash_q(spark, sf):
    return D.simhash(load(spark, sf, "documents"), "doc_id", "text")


# Duplicate-cluster resolution: LSH candidate pairs -> connected
# components (min-id canonical label). Oracle = recursive reachability
# closure over the same pair edges; fine at oracle scale, while the Spark
# side is the iterative min-label propagation that works at corpus scale.
_COMPONENTS_SQL = (
    "WITH RECURSIVE " + _SH_CTE[len("WITH "):] + _SIG_CTE + _BANDS_CTE +
    ", pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b "
    "FROM bands a JOIN bands b ON a.band = b.band "
    "AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id "
    "GROUP BY 1, 2), "
    "e AS (SELECT id_a AS a, id_b AS b FROM pairs "
    "UNION SELECT id_b, id_a FROM pairs), "
    "reach(a, b) AS (SELECT a, a FROM (SELECT DISTINCT a FROM e) "
    "UNION SELECT e.a, r.b FROM e JOIN reach r ON e.b = r.a) "
    "SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a"
)


@q("dedup_cluster_components", _COMPONENTS_SQL,
   "near-dup pairs -> duplicate clusters (connected components) via the "
   "large-star/small-star edge-only strategy — the trillion-edge path, "
   "so the driver oracle exercises it; the pointer-jumping strategy is "
   "pytest-verified equivalent on every graph shape "
   "(test_dedup_components_star_matches_pointer_jumping); survivor "
   "selection = keep component id, drop the rest")
def cluster_components(spark, sf):
    d = load(spark, sf, "documents")
    sig = D.minhash_signatures(d, "doc_id", "text", N_HASHES)
    buckets = D.lsh_band_buckets(sig, "doc_id", BAND_SIZE)
    pairs = D.lsh_candidate_pairs(buckets, "doc_id")
    return D.dedup_components_star(pairs)


MAX_SHINGLE_DF = D.DEFAULT_MAX_SHINGLE_DF

@q("dedup_ngram_jaccard",
   _SH_CTE +
   # stop-shingle cap (mirror of max_df in ngram_jaccard_pairs): drop
   # shingles appearing in > MAX_SHINGLE_DF docs before the self-join
   ", freq AS (SELECT shingle FROM (SELECT shingle, count(*) AS c FROM sh "
   f"GROUP BY shingle) WHERE c <= {MAX_SHINGLE_DF}), "
   "shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN freq USING (shingle)), "
   "sizes AS (SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY doc_id), "
   "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i "
   "FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
   "GROUP BY 1, 2) "
   "SELECT id_a, id_b, ROUND(i / (sa.n_sh + sb.n_sh - i), 4) AS jaccard "
   "FROM inter JOIN sizes sa ON sa.doc_id = id_a "
   "JOIN sizes sb ON sb.doc_id = id_b "
   "WHERE ROUND(i / (sa.n_sh + sb.n_sh - i), 4) >= 0.01",
   "n-gram Jaccard via inverted shingle index (no cross join), stop-"
   "shingle df cap engaged")
def ngram_jaccard(spark, sf):
    return D.ngram_jaccard_pairs(load(spark, sf, "documents"),
                                 "doc_id", "text", threshold=0.01,
                                 max_df=MAX_SHINGLE_DF)
