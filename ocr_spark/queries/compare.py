"""Local emulation of the driver's correctness gate: run each QuerySpec's
Spark side and DuckDB oracle side by side and compare row count, column
names, and an order-insensitive value hash."""

from __future__ import annotations

import hashlib
import math
from datetime import date, datetime

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # Type-tagged so an int-valued float (e.g. DuckDB HUGEINT ->
        # float64 via fetchdf) can NEVER hash equal to a true integer —
        # the r01 driver failed j4/a6/w1 on exactly that class while this
        # local gate masked it with a bare %.9g print.
        return f"f{v:.9g}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def frame_digest(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    rows = ["\x1f".join(_norm_cell(v) for v in rec)
            for rec in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    h = hashlib.md5("\x1e".join(rows).encode()).hexdigest()
    return len(df), cols, h


def compare_query(spec, spark, sf_dir: str, con=None) -> dict:
    sdf = spec.spark(spark, sf_dir).toPandas()
    out = {"name": spec.name, "rows": len(sdf)}
    if spec.sql is None:
        out["status"] = "rows-only"
        out["ok"] = len(sdf) >= 0
        return out
    own = con is None
    if own:
        con = duck_connection(sf_dir)
    try:
        odf = con.execute(spec.sql).fetchdf()
    finally:
        if own:
            con.close()
    sn, sc, sh = frame_digest(sdf)
    on, oc, oh = frame_digest(odf)
    out.update(status="sql", oracle_rows=on,
               rows_ok=(sn == on), schema_ok=(sc == oc), hash_ok=(sh == oh))
    out["ok"] = out["rows_ok"] and out["schema_ok"] and out["hash_ok"]
    if not out["schema_ok"]:
        out["spark_cols"], out["oracle_cols"] = sc, oc
    return out
