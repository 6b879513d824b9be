#!/usr/bin/env python3
"""Measure the dup_span_maximal_runs knob trade: gram width N (the
duplication evidence unit) x removal floor (minimum span length a
removal pass acts on), on the real corpus.

Same role as tools/winnow_cap_trade.py played for the winnowing knobs:
the registered constants (_RUN_GRAM = 5, _RUN_MIN_SPAN = 8) should be
a measured point on a curve, not folklore.  Runs on DuckDB — the
Spark operator is value-identical by the registry's parity discipline,
so the knob CURVE is engine-independent and measuring it here leaves
the Spark benchmark environment unpolluted.

Usage: python tools/dup_span_trade.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def report(con, n: int) -> list[tuple]:
    q = f"""
    WITH doc_toks AS (
        SELECT doc_id,
               regexp_split_to_array(coalesce(trim(text), ''), '\\s+') AS toks
        FROM documents
    ),
    grams AS (
        SELECT doc_id, len(toks) AS n_tokens, i - 1 AS pos,
               md5(array_to_string(toks[i:i+{n - 1}], ' ')) AS gh
        FROM doc_toks,
             unnest(generate_series(1, len(toks) - {n - 1})) AS t(i)
        WHERE len(toks) >= {n}
    ),
    freq AS (SELECT gh FROM grams GROUP BY gh HAVING COUNT(*) > 1),
    dup AS (
        SELECT g.doc_id, g.n_tokens, g.pos
        FROM grams g JOIN freq f ON f.gh = g.gh
    ),
    isl AS (
        SELECT doc_id, n_tokens, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM dup
    ),
    spans AS (
        SELECT doc_id, MIN(n_tokens) AS n_tokens,
               COUNT(*) + {n - 1} AS span_len
        FROM isl GROUP BY doc_id, grp
    ),
    tot AS (SELECT SUM(len(toks)) AS all_toks,
                   COUNT(*) AS all_docs FROM doc_toks)
    SELECT
        (SELECT all_docs FROM tot) AS all_docs,
        COUNT(DISTINCT doc_id) AS docs_flagged,
        COUNT(*) AS n_spans,
        MAX(span_len) AS max_span,
        CAST(median(span_len) AS DOUBLE) AS median_span,
        SUM(CASE WHEN span_len >= 8 THEN 1 ELSE 0 END) AS spans_ge8,
        SUM(CASE WHEN span_len >= 16 THEN 1 ELSE 0 END) AS spans_ge16
    FROM spans
    """
    return con.execute(q).fetchone()


def main() -> int:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF, 'documents.parquet')}')"
    )
    print(f"# dup-span knob trade at {SF}")
    print("# gram N | docs flagged | spans | max | median | >=8 | >=16")
    for n in (3, 4, 5, 8):
        row = report(con, n)
        all_docs, flagged, n_spans, mx, med, ge8, ge16 = row
        print(
            f"N={n}:  {flagged}/{all_docs} docs  spans={n_spans}  "
            f"max={mx}  median={med:.1f}  >=8:{ge8}  >=16:{ge16}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
