"""Idempotent checkpoint/resume (SURVEY.md §5 item 4): kill after k bucket
groups, rerun, byte-identical results vs an uninterrupted run, and lineage
shows each bucket processed effectively once."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.plans.extract_job import run_extract_job
from ocr_spark.synth import write_corpus

N_PAGES = 120
N_BUCKETS = 8


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("resume_corpus")
    pages_path, _ = write_corpus(str(d), N_PAGES, seed=11)
    return pages_path


def _read_results(spark, out):
    return (spark.read.parquet(f"{out}/results")
            .select("url", "extracted_text").orderBy("url").collect())


def test_kill_and_resume_byte_identical(spark, corpus, tmp_path):
    out_a = str(tmp_path / "uninterrupted")
    out_b = str(tmp_path / "interrupted")

    st = run_extract_job(spark, corpus, out_a, n_buckets=N_BUCKETS,
                         group_size=2)
    assert st["completed"] and len(st["buckets_done"]) == N_BUCKETS

    # crash after 2 of 4 groups
    st1 = run_extract_job(spark, corpus, out_b, n_buckets=N_BUCKETS,
                          group_size=2, fail_after_groups=2)
    assert not st1["completed"]
    assert 0 < len(st1["buckets_done"]) < N_BUCKETS

    # resume: only pending buckets run
    st2 = run_extract_job(spark, corpus, out_b, n_buckets=N_BUCKETS,
                          group_size=2)
    assert st2["completed"]
    assert len(st2["buckets_done"]) == N_BUCKETS

    a = _read_results(spark, out_a)
    b = _read_results(spark, out_b)
    assert [r["url"] for r in a] == [r["url"] for r in b]
    assert all(x["extracted_text"] == y["extracted_text"]
               for x, y in zip(a, b))


def test_lineage_and_metrics_written(spark, corpus, tmp_path):
    out = str(tmp_path / "lm")
    run_extract_job(spark, corpus, out, n_buckets=N_BUCKETS, group_size=4)
    lineage = spark.read.parquet(f"{out}/lineage")
    metrics = spark.read.parquet(f"{out}/metrics")
    assert lineage.agg(F.sum("input_rows")).collect()[0][0] == N_PAGES
    assert metrics.agg(F.sum("docs")).collect()[0][0] == N_PAGES
    assert {"bucket", "salt", "input_rows", "output_rows", "input_bytes",
            "wall_ms", "attempt", "snapshot_id"} <= set(lineage.columns)
    assert {"bucket", "docs", "empty_docs", "pdf_docs", "avg_text_len",
            "avg_link_density", "tokenizer_recoveries"} <= set(metrics.columns)
