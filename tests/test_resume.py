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


def test_bucketed_input_prunes_scan(spark, corpus, tmp_path):
    """Physically bucket-partitioned pages (the Iceberg bucket(url_host)
    analog): per-group scans prune to the group's files instead of
    rescanning the corpus, and results stay byte-identical."""
    from ocr_spark.sources.io import write_pages_bucketed

    bucketed = str(tmp_path / "pages_bucketed")
    write_pages_bucketed(spark.read.parquet(corpus), bucketed, N_BUCKETS)

    b = spark.read.parquet(bucketed)
    total_files = len(b.inputFiles())
    pruned = b.where(F.col("bucket").isin([0, 1]))
    # files actually TOUCHED at execution (inputFiles() is pre-pushdown)
    touched = (pruned.select(F.input_file_name().alias("f"))
               .distinct().count())
    assert touched < total_files, (touched, total_files)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan

    out_flat = str(tmp_path / "out_flat")
    out_bkt = str(tmp_path / "out_bkt")
    run_extract_job(spark, corpus, out_flat, n_buckets=N_BUCKETS,
                    group_size=2)
    st = run_extract_job(spark, bucketed, out_bkt, n_buckets=N_BUCKETS,
                         group_size=2)
    assert st["completed"]
    a = _read_results(spark, out_flat)
    c = _read_results(spark, out_bkt)
    assert [r["url"] for r in a] == [r["url"] for r in c]
    assert all(x["extracted_text"] == y["extracted_text"]
               for x, y in zip(a, c))

    # mismatched bucket count must fail loudly, not mis-prune
    import pytest as _pytest
    with _pytest.raises(ValueError):
        run_extract_job(spark, bucketed, str(tmp_path / "bad"),
                        n_buckets=N_BUCKETS // 2, group_size=2)
