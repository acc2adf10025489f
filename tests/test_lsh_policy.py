"""LSH sizing policies (VERDICT r4 #2): (corpus size, similarity) ->
(width, bands, rows) for hyperplane-LSH and MinHash-LSH.

Contract under test:
  * across n_docs 10^3 -> 10^7 the returned (b, r) always satisfies
    BOTH constraints — S-curve recall >= target at the dup similarity,
    expected background candidates per doc <= the bound (the occupancy
    invariant: the within-bucket self-join stays O(N) at every scale);
  * r (and the total width) grows with the corpus — the knob a fixed
    config pins at one scale;
  * the self-sizing operators produce exactly the pairs of the
    explicit-parameter spellings at the derived config;
  * the registered driver spellings equal the policy at the registry's
    design scale (import-time assertion in similarity_q).
"""

from __future__ import annotations

import math

import pytest

from ocr_spark.operators import dedup as D
from ocr_spark.operators import similarity as S

SWEEP = [10**3, 10**4, 10**5, 10**6, 10**7]


def _s_curve(p: float, b: int, r: int) -> float:
    return 1.0 - (1.0 - p ** r) ** b


@pytest.mark.parametrize("n_docs", SWEEP)
def test_hyperplane_policy_bounds(n_docs):
    dup_cos, recall, bound = 0.99, 0.9, 64
    n_planes, b, r = S.lsh_params(n_docs, dup_cos=dup_cos,
                                  recall=recall,
                                  max_cand_per_doc=bound)
    assert n_planes == b * r
    p_dup = 1.0 - math.acos(dup_cos) / math.pi
    assert _s_curve(p_dup, b, r) >= recall
    # orthogonal background pair: candidates/doc bounded at EVERY scale
    assert b * (0.5 ** r) * (n_docs - 1) <= bound


@pytest.mark.parametrize("n_docs", SWEEP)
def test_minhash_policy_bounds(n_docs):
    dup_j, recall, bg, bound = 0.5, 0.9, 0.05, 64
    n_hashes, b, r = D.minhash_lsh_params(n_docs, dup_jaccard=dup_j,
                                          recall=recall,
                                          bg_jaccard=bg,
                                          max_cand_per_doc=bound)
    assert n_hashes == b * r
    assert _s_curve(dup_j, b, r) >= recall
    assert b * (bg ** r) * (n_docs - 1) <= bound


def test_policies_scale_with_corpus():
    hp = [S.lsh_params(n) for n in SWEEP]
    mh = [D.minhash_lsh_params(n) for n in SWEEP]
    for seq in (hp, mh):
        rows = [r for _, _, r in seq]
        widths = [w for w, _, _ in seq]
        assert rows == sorted(rows) and rows[-1] > rows[0]
        assert widths == sorted(widths) and widths[-1] > widths[0]
    # the production regime is NOT the toy regime: at 10^7 docs the
    # hyperplane config must spread candidates over >= 2^19 buckets/band
    assert hp[-1][2] >= 19


def test_policy_rejects_bad_inputs():
    with pytest.raises(ValueError):
        S.lsh_params(1000, dup_cos=0.3, bg_cos=0.5)  # bg above dup
    with pytest.raises(ValueError):
        D.minhash_lsh_params(1000, dup_jaccard=0.2, bg_jaccard=0.4)
    with pytest.raises(ValueError, match="no \\(b<="):
        # unreachable: essentially-background duplicates at huge scale
        S.lsh_params(10**12, dup_cos=0.02, recall=0.999, max_bands=4,
                     max_cand_per_doc=1)


def test_auto_near_dup_matches_explicit(spark):
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    n_planes, b, _ = S.lsh_params(n)
    planes = S.hyperplanes(n_planes, 64, seed=123)
    explicit = set(map(tuple, S.embedding_near_dup_pairs_banded(
        emb, "vec_id", "embedding", planes, b, 0.3)
        .select("id_a", "id_b").collect()))
    auto = set(map(tuple, S.embedding_near_dup_pairs_auto(
        emb, "vec_id", "embedding", 0.3, dim=64)
        .select("id_a", "id_b").collect()))
    assert auto == explicit and auto


def test_auto_minhash_matches_explicit(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    n_hashes, _, r = D.minhash_lsh_params(n)
    sig = D.minhash_signatures(docs, "doc_id", "text", n_hashes)
    explicit = set(map(tuple, D.lsh_candidate_pairs(
        D.lsh_band_buckets(sig, "doc_id", band_size=r), "doc_id")
        .select("id_a", "id_b").collect()))
    auto = set(map(tuple, D.minhash_lsh_pairs_auto(
        docs, "doc_id", "text")
        .select("id_a", "id_b").collect()))
    assert auto == explicit


def test_registered_spelling_comes_from_policy():
    from ocr_spark.queries import similarity_q as Q
    assert (Q.N_PLANES, Q.N_BANDS, Q._POLICY_R) == S.lsh_params(
        Q._DESIGN_N_DOCS, dup_cos=0.99, recall=0.9,
        max_cand_per_doc=64)
