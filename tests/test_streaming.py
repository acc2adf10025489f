"""Structured Streaming analogs: incremental extract must match the batch
pipeline byte-for-byte (stateless, so append mode emits everything);
sessionization runs bounded with availableNow."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.plans.extract_job import extract_pages
from ocr_spark.streaming.sessionize import (
    run_incremental_extract, streaming_session_counts,
)
from ocr_spark.synth import write_corpus


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_corpus")
    write_corpus(str(d), 80, seed=3)
    return str(d)


def test_incremental_extract_matches_batch(spark, corpus_dir, tmp_path):
    # file stream source requires a directory of files
    pages = str(tmp_path / "pages_dir")
    spark.read.parquet(f"{corpus_dir}/pages.parquet").write.parquet(pages)
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    run_incremental_extract(spark, pages, out, ckpt)
    got = (spark.read.parquet(out)
           .select("url", "extracted_text").orderBy("url").collect())
    exp = (extract_pages(spark.read.parquet(pages), n_buckets=4, salt_n=2)
           .select("url", "extracted_text").orderBy("url").collect())
    assert len(got) == len(exp) == 80
    assert all(g["extracted_text"] == e["extracted_text"]
               for g, e in zip(got, exp))

    # rerun with same checkpoint: no new files -> no new rows (exactly-once)
    run_incremental_extract(spark, pages, out, ckpt)
    assert spark.read.parquet(out).count() == 80


def test_streaming_stateful_dedup(spark, tmp_path):
    """applyInPandasWithState first-seen dedup: duplicates across micro-
    batches and across restarts are suppressed via keyed state."""
    from ocr_spark.streaming.stateful import run_streaming_dedup

    pages = str(tmp_path / "dedup_pages")
    out = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "dedup_ckpt")

    def mk(rows):
        return spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, "
                  "text string, lang string")

    import datetime as _dt
    ts = _dt.datetime(2025, 1, 1)
    a = bytearray(b"<p>alpha content</p>")
    b = bytearray(b"<p>beta content</p>")
    batch1 = [(f"https://h{i % 2}.org/p{i}", ts, a if i < 4 else b, "", "en")
              for i in range(6)]
    mk(batch1).coalesce(1).write.mode("append").parquet(pages)
    run_streaming_dedup(spark, pages, out, ckpt)
    got1 = spark.read.parquet(out)
    # per host: content 'a' once per host (h0,h1), 'b' once per host
    assert got1.count() == 4
    assert got1.select("host", "content_hash").distinct().count() == 4

    # second arrival: all-duplicate content + one new doc
    c = bytearray(b"<p>gamma content</p>")
    batch2 = [("https://h0.org/dup1", ts, a, "", "en"),
              ("https://h1.org/dup2", ts, b, "", "en"),
              ("https://h0.org/new1", ts, c, "", "en")]
    mk(batch2).coalesce(1).write.mode("append").parquet(pages)
    run_streaming_dedup(spark, pages, out, ckpt)
    got2 = spark.read.parquet(out)
    assert got2.count() == 5  # only the gamma doc is new
    assert got2.where(F.col("url") == "https://h0.org/new1").count() == 1


def test_streaming_sessionize_runs(spark, tmp_path):
    from datetime import datetime, timedelta
    base = datetime(2025, 1, 1)
    rows = []
    for u in range(3):
        for s in range(2):          # two sessions per user, 2h apart
            for i in range(4):
                rows.append((u, base + timedelta(hours=2 * s, minutes=i),
                             float(i)))
    src = str(tmp_path / "events")
    spark.createDataFrame(rows, ["user_id", "ts", "value"]) \
        .write.parquet(src)
    out = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "sckpt")
    streaming_session_counts(spark, src, out, ckpt, gap="30 minutes",
                             watermark="0 seconds")
    got = spark.read.parquet(out)
    # append mode emits sessions closed before the final watermark: at
    # minimum every user's FIRST session (2h older than max ts) is out.
    assert got.count() >= 3
    r = got.where((F.col("user_id") == 0)).orderBy("session_start").first()
    assert r["events"] == 4


def test_streaming_dedup_ttl_expires_and_readmits(spark, tmp_path):
    """TTL-bounded state: a quiet host's seen-set is dropped after the TTL
    (memory stays bounded to recently-active hosts), so a post-TTL
    duplicate is re-admitted — the documented freshness-horizon trade."""
    import time
    import datetime as _dt

    from ocr_spark.streaming.stateful import run_streaming_dedup

    pages = str(tmp_path / "ttl_pages")
    out = str(tmp_path / "ttl_out")
    ckpt = str(tmp_path / "ttl_ckpt")
    ts = _dt.datetime(2025, 1, 1)

    def mk(rows):
        return spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, "
                  "text string, lang string")

    a = bytearray(b"<p>alpha</p>")
    run = lambda: run_streaming_dedup(spark, pages, out, ckpt, ttl_ms=500)

    mk([("https://x.org/p1", ts, a, "", "en")]) \
        .coalesce(1).write.mode("append").parquet(pages)
    run()
    assert spark.read.parquet(out).count() == 1

    # batch 2 carries only host y; host x's state passes its TTL and is
    # evicted during this batch's timeout processing
    time.sleep(1.5)
    mk([("https://y.org/p1", ts, a, "", "en")]) \
        .coalesce(1).write.mode("append").parquet(pages)
    run()
    assert spark.read.parquet(out).count() == 2

    # batch 3: the SAME content on host x again -> re-admitted (state was
    # dropped), proving eviction actually happened
    mk([("https://x.org/p2", ts, a, "", "en")]) \
        .coalesce(1).write.mode("append").parquet(pages)
    run()
    got = spark.read.parquet(out)
    assert got.where(F.col("host") == "x.org").count() == 2


def test_streaming_dedup_bloom_mode(spark, tmp_path):
    """Bloom-filter state: duplicates are still suppressed (no false
    negatives by construction) with fixed-size per-host state."""
    import datetime as _dt

    from ocr_spark.streaming.stateful import BLOOM_BITS, run_streaming_dedup

    pages = str(tmp_path / "bloom_pages")
    out = str(tmp_path / "bloom_out")
    ckpt = str(tmp_path / "bloom_ckpt")
    ts = _dt.datetime(2025, 1, 1)

    rows = [(f"https://h.org/p{i}", ts,
             bytearray(f"<p>doc {i % 50}</p>".encode()), "", "en")
            for i in range(200)]  # 50 uniques, each duplicated 4x
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, "
              "text string, lang string") \
        .coalesce(1).write.mode("append").parquet(pages)
    run_streaming_dedup(spark, pages, out, ckpt, mode="bloom")
    got = spark.read.parquet(out)
    n = got.count()
    # exactly-once per content hash; tiny fp chance may drop a unique but
    # can never emit a duplicate
    assert got.select("content_hash").distinct().count() == n
    assert 45 <= n <= 50
    # survivor is the lexicographically smallest url of each dup group
    first = got.where(F.col("content_hash") == F.md5(F.lit("<p>doc 0</p>")
                      .cast("binary"))).first()
    assert first["url"] == "https://h.org/p0"
    # state is fixed-size by construction
    assert BLOOM_BITS // 8 == 8192
