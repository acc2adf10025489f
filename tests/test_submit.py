"""Smoke test for the north rule's named deployment path: package
`ocr_spark` into a zip and run the extraction job via
`spark-submit --py-files` (scripts/submit_extract.sh), then byte-compare
the results against the golden table. The subprocess imports the engine
from the ZIP, not the repo checkout — exactly what a real cluster's
executors see — so a packaging break (missing module, cwd-relative
import, fixture path) fails here and nowhere else."""

from __future__ import annotations

import json
import os
import subprocess

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_roundtrip(tmp_path):
    from ocr_spark.synth import write_corpus

    pages, golden = write_corpus(str(tmp_path / "corpus"), 60, seed=7)
    out = str(tmp_path / "out")

    r = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "submit_extract.sh"),
         pages, out, "local[2]"],
        capture_output=True, text=True, timeout=420, cwd=REPO)
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-3000:])

    status_lines = [ln for ln in r.stdout.splitlines()
                    if ln.startswith("{")]
    st = json.loads(status_lines[-1])
    assert st["completed"] is True
    assert st["result_rows"] == 60

    n_div, n_join = duckdb.sql(
        f"SELECT count(*) FILTER (WHERE r.extracted_text IS DISTINCT "
        f"FROM g.expected_text), count(*) "
        f"FROM read_parquet('{out}/results/**/*.parquet') r "
        f"JOIN read_parquet('{golden}') g ON r.url = g.url"
    ).fetchone()
    assert n_join == 60
    assert n_div == 0
