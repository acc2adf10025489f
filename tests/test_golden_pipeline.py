"""End-to-end golden test: Spark pipeline output must be byte-identical
per url to the single-node oracle extractor (BASELINE.json correctness
gate). Reference analog: verify_characters against the golden parasha
text (/root/reference/overflow/segment_according_to_sentence.py:203-236).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.plans.extract_job import extract_pages
from ocr_spark.synth import write_corpus

N_PAGES = 250


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    pages_path, golden_path = write_corpus(str(d), N_PAGES, seed=42)
    return pages_path, golden_path


def test_byte_identical_extraction(spark, corpus):
    pages_path, golden_path = corpus
    pages = spark.read.parquet(pages_path)
    golden = spark.read.parquet(golden_path)

    results = extract_pages(pages, n_buckets=8, salt_n=4)
    joined = (
        results.select("url",
                       F.encode("extracted_text", "utf-8").alias("got"),
                       "content_kind")
        .join(golden, on="url", how="full_outer")
    ).collect()

    assert len(joined) == N_PAGES
    mismatches = []
    for row in joined:
        got = bytes(row["got"]) if row["got"] is not None else None
        exp = bytes(row["expected_text"]) if row["expected_text"] is not None else None
        if got != exp:
            # first-divergence offset for debuggability (SURVEY.md §5.1)
            off = next((i for i, (a, b) in enumerate(zip(got or b"", exp or b""))
                        if a != b), min(len(got or b""), len(exp or b"")))
            mismatches.append((row["url"], off, (got or b"")[off:off + 40],
                               (exp or b"")[off:off + 40]))
    assert not mismatches, f"{len(mismatches)} urls diverge; first: {mismatches[0]}"


def test_kind_matches_oracle(spark, corpus):
    pages_path, golden_path = corpus
    pages = spark.read.parquet(pages_path)
    golden = spark.read.parquet(golden_path)
    results = extract_pages(pages, n_buckets=8, salt_n=4)
    bad = (results.join(golden, "url")
           .where(F.col("content_kind") != F.col("expected_kind"))
           .count())
    assert bad == 0


def test_block_spans_match_oracle(spark, corpus):
    """The nested blocks column must match the oracle extractor's blocks
    field-for-field (north rule: 'extracted text/SPANS per document')."""
    from ocr_spark.core.extract import extract

    pages_path, _ = corpus
    pages = spark.read.parquet(pages_path)
    rows = (extract_pages(pages, n_buckets=8, salt_n=4)
            .where(F.col("content_kind") == "html")
            .select("url", "blocks")
            .collect())
    assert rows, "no html pages in corpus"
    raw = {r["url"]: bytes(r["html"])
           for r in pages.select("url", "html").collect()}
    n_blocks_total = 0
    for row in rows:
        exp = extract(raw[row["url"]], None, keep_blocks=True).blocks
        got = row["blocks"]
        assert len(got) == len(exp), row["url"]
        for g, e in zip(got, exp):
            assert (g["block_id"], g["tag"], g["depth"], g["n_words"],
                    g["is_content"]) == (e.block_id, e.tag, e.depth,
                                         e.n_words, e.is_content), row["url"]
            assert abs(g["link_density"] - e.link_density) < 1e-12
        n_blocks_total += len(got)
    assert n_blocks_total > 0


def test_huge_doc_survives_arrow_batching(spark, corpus):
    """The ~5 MB doc (page-0000000) must extract, not OOM or truncate."""
    pages_path, golden_path = corpus
    pages = spark.read.parquet(pages_path)
    res = (extract_pages(pages.where(F.col("url").endswith("page-0000000")),
                         n_buckets=2, salt_n=2)
           .select(F.length("extracted_text").alias("n")).collect())
    assert res and res[0]["n"] > 1_000_000


def test_golden_alignment_fixture_deterministic(tmp_path):
    """The j7_golden_alignment oracle reads a parquet regenerated on
    demand — its validity rests on the synth corpus being byte-stable
    across regenerations. Rebuild with the same (n, seed) into a fresh
    dir and compare every golden row."""
    import pyarrow.parquet as pq

    from ocr_spark.queries import golden_q
    from ocr_spark.synth import write_corpus

    fix = golden_q.ensure_fixture()
    _, fresh_golden = write_corpus(
        str(tmp_path / "re"), golden_q._N_DOCS, seed=golden_q._SEED)
    a = pq.read_table(f"{fix}/golden.parquet").to_pylist()
    b = pq.read_table(fresh_golden).to_pylist()
    assert len(a) == len(b) == golden_q._N_DOCS
    assert a == b
