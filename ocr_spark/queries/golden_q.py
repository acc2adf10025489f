"""Corpus-level golden alignment: the REAL extracted-vs-expected
alignment the survey's J4 row promised (VERDICT r2 #7) — replaces the
round-2 self-referential j7 oracle.

A deterministic synth corpus (seed 777) is materialized once under
``fixtures/golden_align/`` (pages + golden parquet, regenerated on demand
— same seed, same bytes, so nothing needs committing). The Spark side
runs the REAL fused extraction UDF over the pages, full-outer joins the
golden table (the alignment join), and computes per-url edit distance +
exact-match + missing/extra flags — the reference's verify_characters
analysis (/root/reference/overflow/segment_according_to_sentence.py:
203-236: all_found / missing / extra / char mapping) lifted to corpus
scale. The DuckDB oracle reads the SAME golden parquet and asserts the
byte-identity invariant (edit_dist 0, exact_match 1, nothing missing or
extra): any divergent byte anywhere in the tokenizer, DOM recovery,
classifier, assembly, or PDF parser flips a value and fails the hash.

Levenshtein runs on a 2000-char prefix (the 5 MB stress doc makes the
full O(n*m) DP infeasible and pointless); full-length divergence is
caught by the exact_match equality column, which costs one comparison.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ocr_spark.queries import QuerySpec

QUERIES: list[QuerySpec] = []

_REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
FIXTURE_DIR = os.path.join(_REPO, "fixtures", "golden_align")
_N_DOCS = 200
_SEED = 777
_LEV_PREFIX = 2000


def ensure_fixture() -> str:
    """Materialize the alignment corpus (idempotent, atomic, no Spark).

    Runs at QUERY time, never at import time (import of the registry must
    stay pure — no multi-second corpus I/O, importable from a read-only
    checkout). A directory without the _READY marker (interrupted write,
    partial copy) is rebuilt, never trusted."""
    marker = os.path.join(FIXTURE_DIR, "_READY")
    if not os.path.exists(marker):
        import shutil
        import uuid

        from ocr_spark.synth import write_corpus
        if os.path.isdir(FIXTURE_DIR):   # stale partial dir: rebuild
            shutil.rmtree(FIXTURE_DIR, ignore_errors=True)
        tmp = FIXTURE_DIR + f".tmp-{uuid.uuid4().hex[:8]}"
        write_corpus(tmp, _N_DOCS, seed=_SEED)
        open(os.path.join(tmp, "_READY"), "w").close()
        try:
            os.rename(tmp, FIXTURE_DIR)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            # lost a concurrent race — valid only if the winner FINISHED
            if not os.path.exists(marker):
                raise RuntimeError(
                    f"golden fixture at {FIXTURE_DIR} exists without its "
                    f"_READY marker and could not be replaced; remove it "
                    f"and retry")
    return FIXTURE_DIR


def _spark(spark, sf):
    # The alignment corpus is its own deterministic fixture — the sf dir
    # has no golden table; sf is accepted (and ignored) for the driver's
    # uniform (spark, sf_dir) calling convention.
    from ocr_spark.operators.dedup import dedup_repeated_lines
    from ocr_spark.plans.extract_job import extract_udf

    fix = ensure_fixture()
    pages = spark.read.parquet(os.path.join(fix, "pages.parquet"))
    golden = (spark.read.parquet(os.path.join(fix, "golden.parquet"))
              .select("url",
                      F.decode("expected_text", "utf-8").alias("expected")))
    extracted = (pages
                 .select("url",
                         extract_udf(F.col("html"), F.col("lang")).alias("r"))
                 .select("url", F.col("r.extracted_text").alias("got"))
                 # line-dedup references the extraction output from three
                 # subtrees (line counts, removal positions, final join);
                 # cache so the UDF runs once over the fixture instead of
                 # 3x (at corpus scale this input would be a persisted
                 # results table already)
                 .cache())
    # corpus-level repeated-line removal runs on the EXTRACTED text while
    # the oracle recomputes it from the golden parquet in SQL — the hash
    # compare therefore verifies extraction byte-identity AND the
    # line-frequency + reassembly semantics in one query
    cleaned = dedup_repeated_lines(extracted, "url", "got")
    j = cleaned.join(golden, "url", "full_outer")
    # C4 line-filter fold: the synth vocabulary carries no punctuation,
    # so the terminal-punct / javascript rules would be vacuous on raw
    # lines — enrich deterministically (md5-keyed suffixes, mirrored
    # string-for-string by the oracle) so all three rules do real work.
    from ocr_spark.operators.hashing import md5long
    from ocr_spark.operators.textstats import c4_line_filter
    enriched = F.array_join(F.transform(
        F.split(F.col("got"), "\n", -1),
        lambda l: F.when(md5long(l) % 3 == 0, F.concat(l, F.lit(".")))
        .when(md5long(l) % 7 == 0, F.concat(l, F.lit(" javascript.")))
        .otherwise(l)), "\n")
    c4 = c4_line_filter(enriched)
    return j.select(
        "url",
        F.levenshtein(F.substring("got", 1, _LEV_PREFIX),
                      F.substring("expected", 1, _LEV_PREFIX))
        .cast("int").alias("edit_dist"),
        (F.col("got") == F.col("expected")).cast("int").alias("exact_match"),
        F.length("expected").cast("int").alias("expected_len"),
        F.when(F.col("got").isNull(), 1).otherwise(0)
        .cast("int").alias("missing"),
        F.when(F.col("expected").isNull(), 1).otherwise(0)
        .cast("int").alias("extra"),
        F.col("n_dup_lines").cast("int").alias("n_dup_lines"),
        F.md5("clean_text").alias("clean_md5"),
        c4["n_kept"].cast("int").alias("c4_kept_lines"),
        F.md5(c4["clean"]).alias("c4_md5"))


def _oracle_sql() -> str:
    # Pure string construction — the fixture path is deterministic, so
    # nothing needs to exist at import time. Materialization happens in
    # the Spark fn and in __spark_entry__.oracle_sql() (whichever the
    # driver calls first).
    from ocr_spark.operators.hashing import sql_md5long
    golden = os.path.join(FIXTURE_DIR, "golden.parquet")
    h = sql_md5long("l")
    c4_keep = (
        "right(trim(l), 1) IN ('.', '!', '?', '\"') "
        "AND len(list_filter(string_split(l, ' '), w -> w <> '')) >= 5 "
        "AND NOT contains(lower(l), 'javascript')")
    return (
        # Line-dedup columns are recomputed INDEPENDENTLY from the golden
        # text (string-keyed line frequencies, string_agg reassembly) —
        # not constants like the byte-identity columns — so they verify
        # dedup_repeated_lines' counting + reassembly semantics against
        # an engine that shares none of its code.
        "WITH d AS (SELECT url, decode(expected_text) AS txt "
        f"FROM read_parquet('{golden}')), "
        "s AS (SELECT url, string_split(txt, chr(10)) AS ls FROM d), "
        "l AS (SELECT url, unnest(ls) AS line, "
        "generate_subscripts(ls, 1) AS pos FROM s), "
        "dh AS (SELECT trim(line) AS tl FROM l WHERE trim(line) <> '' "
        "GROUP BY 1 HAVING count(*) >= 2), "
        "k AS (SELECT l.url, "
        "COALESCE(string_agg(l.line, chr(10) ORDER BY l.pos) "
        "FILTER (WHERE dh.tl IS NULL), '') AS clean, "
        "count(*) FILTER (WHERE dh.tl IS NOT NULL) AS n_dup "
        "FROM l LEFT JOIN dh ON trim(l.line) = dh.tl GROUP BY l.url), "
        # C4 line-filter mirror: identical md5-keyed punctuation
        # enrichment, then the three §2.2 rules (terminal punct, >= 5
        # words, no 'javascript') recomputed from the golden text.
        "c4 AS (SELECT url, list_filter(list_transform(ls, "
        f"l -> CASE WHEN {h} % 3 = 0 THEN l || '.' "
        f"WHEN {h} % 7 = 0 THEN l || ' javascript.' ELSE l END), "
        f"l -> {c4_keep}) AS kept FROM s) "
        "SELECT d.url, CAST(0 AS INT) AS edit_dist, "
        "CAST(1 AS INT) AS exact_match, "
        "CAST(length(txt) AS INT) AS expected_len, "
        "CAST(0 AS INT) AS missing, CAST(0 AS INT) AS extra, "
        "CAST(n_dup AS INT) AS n_dup_lines, md5(clean) AS clean_md5, "
        "CAST(len(kept) AS INT) AS c4_kept_lines, "
        # array_to_string of an empty list is NULL in the oracle engine
        # but '' under Spark's array_join — coalesce to match
        "md5(COALESCE(array_to_string(kept, chr(10)), '')) AS c4_md5 "
        "FROM d JOIN k USING (url) JOIN c4 USING (url)")


QUERIES.append(QuerySpec(
    "j7_golden_alignment", _spark, _oracle_sql(),
    "corpus-level golden alignment: REAL extraction UDF vs the golden "
    "table (full-outer join, per-url levenshtein + exact-match + "
    "missing/extra) — the byte-identity gate expressed as a driver-"
    "checkable query; oracle reads the same deterministic golden parquet "
    "and asserts zero divergence. Composite since r3: also runs "
    "dedup_repeated_lines (CCNet-style corpus-level boilerplate line "
    "removal) over the extracted text, with per-url removed-occurrence "
    "counts and cleaned-text md5 recomputed independently by the oracle "
    "from the golden text. Late fold: C4 line-grain structural filter "
    "(c4_kept_lines, c4_md5) over md5-keyed punctuation-enriched lines "
    "— all three §2.2 rules recomputed by the oracle"))
