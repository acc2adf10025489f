"""Emulate the driver: entry() smoke + every queries()/oracle_sql() pair
compared against DuckDB at sf0.001 (fast tier; the driver uses sf0.01 —
bench.py and CI scripts cover that)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from ocr_spark.queries import all_queries
from ocr_spark.queries.compare import compare_query, duck_connection

SF = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"lang", "docs", "extracted_docs", "avg_extracted_len",
            "total_blocks"} == set(df.columns)
    assert sum(r["docs"] for r in rows) == 500


def test_contract_shape():
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    assert len(qs) >= 40
    assert set(sqls) <= set(qs)
    missing_oracle = set(qs) - set(sqls)
    assert len(missing_oracle) <= 2, missing_oracle


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


@pytest.mark.parametrize("spec", all_queries(), ids=lambda s: s.name)
def test_query_matches_oracle(spark, duck, spec):
    r = compare_query(spec, spark, SF, duck)
    assert r["ok"], r
