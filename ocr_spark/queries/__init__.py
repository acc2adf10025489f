"""Driver-facing operator queries (SURVEY.md §2 inventory).

Each QuerySpec pairs a Spark DataFrame callable with the equivalent ANSI
SQL for the DuckDB oracle. Column names/aliases match EXACTLY on both
sides (driver hashes values after sorting columns by name). Computed
floats are rounded to fixed decimals on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None -> non-SQL-expressible; driver does rows-only
    note: str = ""


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# The driver's correctness gate checks only the FIRST 50 registered
# queries (observed in round 1 — every query past position 50 got no
# CORRECTNESS row). Round 3 consolidated the relational micro-queries
# into composite suites (VERDICT r2 #1) so the WHOLE registry fits the
# window: every SURVEY §2/§2.11/§2.12 row gets a fresh driver row each
# round. MAX_QUERIES guards the invariant — adding query #51 fails
# loudly here instead of silently losing driver coverage; fold new work
# into an existing composite (or extend one) when the cap is hit.
MAX_QUERIES = 50

_ORDER = [
    # flagship extraction + corpus-level golden alignment
    "extract_html_roundtrip", "extract_blocks_spans",
    "j7_golden_alignment",
    # §2.11/§2.12 dedup / similarity / textstats / multimodal
    "dedup_exact", "dedup_minhash_signatures", "dedup_minhash_lsh_pairs",
    "dedup_simhash", "dedup_ngram_jaccard", "dedup_embedding_cosine",
    "dedup_cluster_components",
    "sim_cosine_topk", "sim_lsh_bucket_histogram", "sim_ann_lsh_query",
    "sim_ann_multiprobe", "sim_ivf_assign_histogram", "sim_ivf_topk",
    "sim_ivf_topk_nprobe2", "sim_ivf_kmeans_centroids",
    "text_lang_id", "text_quality_score", "text_token_counts",
    "text_fingerprint", "text_scrub_pii", "text_repetition_stats",
    "curation_pipeline",
    "multimodal_decode_meta", "multimodal_resize",
    "multimodal_frame_sample", "multimodal_feature_extract",
    "j8_asof_join", "w6_greedy_overlap_accept",
    # consolidated relational suites + remaining single-primitive rows
    "documents_enriched", "events_enriched", "documents_rollup_metrics",
    "events_profile_by_type", "time_bucket_counts",
    "lineitem_topk_filtered", "t_limit_suite", "set_ops_suite",
    "a1_profile_local_minima", "a4_ordered_text_assembly",
    "a6_confusion_matrix_pivot", "w1_sessionize_gaps_islands",
    "f10_array_explode_topwords", "s10_stratified_split",
    "j1_broadcast_dim_join", "j2_containment_anti_join",
    "j3_interval_range_join", "j4_fullouter_alignment",
    "j6_large_sortmerge_join",
]


def all_queries() -> list[QuerySpec]:
    from ocr_spark.queries import (
        dedup_q, golden_q, multimodal_q, relational, roundtrip,
        similarity_q, textstats_q,
    )

    out: list[QuerySpec] = []
    for mod in (relational, roundtrip, golden_q, dedup_q, similarity_q,
                textstats_q, multimodal_q):
        out.extend(mod.QUERIES)
    names = [q.name for q in out]
    assert len(names) == len(set(names)), "duplicate query names"
    assert set(names) == set(_ORDER), (
        f"registry drift: only in _ORDER {set(_ORDER) - set(names)}, "
        f"only registered {set(names) - set(_ORDER)}")
    assert len(out) <= MAX_QUERIES, (
        f"{len(out)} queries registered but the driver checks only "
        f"{MAX_QUERIES}; consolidate (see module docstring)")
    rank = {n: i for i, n in enumerate(_ORDER)}
    out.sort(key=lambda s: rank[s.name])
    return out
