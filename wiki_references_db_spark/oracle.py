"""Local mirror of the driver's DuckDB oracle harness.

Runs a registered Spark query and its oracle SQL side-by-side on the same
parquet tables, then compares row count, column names, and the
order-insensitive multiset of values (columns sorted by name) — the same
contract the driver's CORRECTNESS check applies.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
from pyspark.sql import SparkSession

from wiki_references_db_spark.tables import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return bool(v)
    if hasattr(v, "isoformat"):
        return v.isoformat(sep=" ", timespec="seconds") if hasattr(v, "time") else str(v)
    return str(v)


def _rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


@dataclass
class OracleResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def check_query(
    spark: SparkSession, name: str, fn, sql: str, sf_dir: str
) -> OracleResult:
    sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    try:
        cur = con.execute(sql)
        o_cols = [d[0] for d in cur.description]
        o_rows = cur.fetchall()
    finally:
        con.close()

    if sorted(s_cols) != sorted(o_cols):
        return OracleResult(
            name, False, len(s_rows), len(o_rows),
            f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}",
        )
    if len(s_rows) != len(o_rows):
        return OracleResult(
            name, False, len(s_rows), len(o_rows),
            f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}",
        )
    sm = _rows_multiset(s_cols, s_rows)
    om = _rows_multiset(o_cols, o_rows)
    if sm != om:
        diff = next(
            (i for i, (a, b) in enumerate(zip(sm, om)) if a != b), None
        )
        detail = "value mismatch"
        if diff is not None:
            detail += f" at sorted row {diff}: spark={sm[diff]} oracle={om[diff]}"
        return OracleResult(name, False, len(s_rows), len(o_rows), detail)
    return OracleResult(name, True, len(s_rows), len(o_rows))
