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
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from wiki_references_db_spark.tables import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):
            # Spark-written layout: a DIRECTORY of part files (used by
            # the degenerate-corpus sweeps and tools/stress_scale.py).
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    """Canonical string form of one cell, at DRIVER strictness.

    Round-3 lesson: the driver canonicalizes through pandas frames and
    hashes full-precision values; this mirror's old 10-significant-digit
    float rounding (and raw collect()/fetchall() row fetch) certified
    two queries the driver then rejected.  Both sides now travel
    through pandas (``_frame_rows``) so engine-specific frame dtypes
    (DuckDB HUGEINT -> float64, nullable BIGINT -> float64) show up
    locally exactly as the driver sees them, and floats compare at full
    repr precision."""
    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):
        return bool(v)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat(sep=" ")
    if hasattr(v, "isoformat"):
        return v.isoformat(sep=" ") if hasattr(v, "time") else str(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, dict, np.ndarray)):
        # The driver's canonicalizer hard-errors on non-scalar cells
        # (round-3 `multimodal_feature_extract`); fail identically here.
        raise TypeError(
            f"non-scalar cell of type {type(v).__name__} — registered "
            "queries must emit scalar columns only"
        )
    return str(v)


def _frame_rows(df: pd.DataFrame):
    """(columns, row tuples) from a pandas frame, NaN/NaT surfaced as
    the raw float('nan')/NaT objects pandas stores (handled by
    ``_norm_cell``), None kept as None."""
    cols = list(df.columns)
    rows = []
    for tup in df.itertuples(index=False, name=None):
        rows.append(
            tuple(None if v is pd.NaT else v for v in tup)
        )
    return cols, rows


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
    s_cols, s_rows = _frame_rows(sdf.toPandas())
    # Queries that persist() an intermediate (corpus_dup_span_stats's
    # span stream) would otherwise accumulate cached blocks across the
    # 123-query suite; the result is already materialized here.
    spark.catalog.clearCache()

    con = duckdb_connection(sf_dir)
    try:
        o_cols, o_rows = _frame_rows(con.execute(sql).df())
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
