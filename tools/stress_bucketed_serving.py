#!/usr/bin/env python3
"""Stress-scale the SERVING path through the bucketed warehouse catalog
(VERDICT r9 item 4).

tests/test_warehouse_bucketing.py pins the zero-instance-Exchange plan
on a unit fixture; tools/stress_scale.py times the flagship derivation
at 10x but over ad-hoc staging, not the written warehouse.  This tool
closes the gap: it derives a FULL-corpus warehouse-shaped table set
from sf0.1 (every page, the same derivation the registered serving
queries use page-sliced), inflates it Kx by key-shifted replication
(pages, revisions and citation identities all grow Kx — corpus growth,
not densification), writes it BOTH ways (plain parquet vs the default
bucketed catalog layout), and then at 1x and Kx:

- runs the real serving endpoint (queries/serving.py
  article_citations, raw mode — the function behind the flagship and
  the WSGI shell) over both layouts,
- CHECKS the plan property at scale: the bucketed read plans ZERO
  Exchange on citation_instance_id while the plain read shuffles on it
  (the tool exits non-zero if either side of that discrimination
  fails),
- checks row-identity between the two layouts,
- reports min-of-2 wall-clock for both.

Usage: python tools/stress_bucketed_serving.py [K] [buckets]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from wiki_references_db_spark.plans.warehouse import (
    read_warehouse,
    write_warehouse,
)
from wiki_references_db_spark.queries.serving import article_citations
from wiki_references_db_spark.queries.serving_query import (
    derive_warehouse_for_page,
)
from wiki_references_db_spark.session import get_spark
from wiki_references_db_spark.tables import load_table

BASE = "/root/testdata/sf0.1"


def derive_warehouse_full(
    spark: SparkSession, sf_dir: str, k: int
) -> dict[str, DataFrame]:
    """The registered serving queries' warehouse derivation
    (serving_query.derive_warehouse_for_page) WITHOUT the page slice,
    over a corpus inflated Kx by key-shifted replication: replica i
    shifts page ids (o_custkey) and revision ids (o_orderkey), and
    salts raw_sha1/normalized_sha1 with the replica index, so page
    count, revision count and citation-identity cardinality all grow
    linearly — Kx MORE pages, not Kx denser pages."""
    from wiki_references_db_spark.operators.relational import distinct_on

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber"
    )
    o_shift = orders.agg(F.max("o_orderkey")).first()[0] + 1
    c_shift = orders.agg(F.max("o_custkey")).first()[0] + 1

    def replicas(df: DataFrame, cols: dict[str, str], salt_col: str | None):
        parts = []
        for i in range(k):
            p = df
            for col, kind in cols.items():
                shift = o_shift if kind == "o" else c_shift
                p = p.withColumn(col, F.col(col) + F.lit(i * shift))
            if salt_col is not None:
                p = p.withColumn(salt_col, F.lit(f"r{i}"))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    ords = replicas(orders, {"o_orderkey": "o", "o_custkey": "c"}, None)
    lines_raw = replicas(lineitem, {"l_orderkey": "o"}, "salt")

    revisions = ords.select(
        F.col("o_orderkey").alias("revision_id"),
        F.col("o_custkey").alias("page_id"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias(
            "revision_timestamp"
        ),
    )
    # Same identity derivation as derive_warehouse_for_page, with the
    # replica salt folded into the content hash so replicas are NEW
    # citations (the duplicate RATE is preserved, not multiplied).
    raw_sha1 = F.md5(
        F.concat(
            F.lit("raw:"),
            F.col("salt"),
            F.lit(":"),
            F.col("page_id").cast("string"),
            F.lit(":"),
            F.col("l_partkey").cast("string"),
        )
    )
    ci_id = F.md5(F.concat(F.lit("ci:"), F.col("raw_sha1")))
    norm_key = ((F.col("l_partkey") - F.col("l_partkey") % 10) / 10).cast("long")
    normalized_sha1 = F.md5(
        F.concat(F.lit("norm:"), F.col("salt"), F.lit(":"), norm_key.cast("string"))
    )
    lines = (
        lines_raw.join(
            ords.select("o_orderkey", "o_custkey"),
            lines_raw.l_orderkey == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("page_id"),
            F.col("o_orderkey").alias("revision_id"),
            "l_partkey",
            "l_linenumber",
            "salt",
        )
        .withColumn("raw_sha1", raw_sha1)
        .withColumn("normalized_sha1", normalized_sha1)
    )
    citation_instances = distinct_on(
        lines.select(
            "page_id",
            "raw_sha1",
            "normalized_sha1",
            (F.col("l_linenumber") % 3).alias("reference_type"),
            F.when(
                F.col("l_partkey") % 5 == 0,
                F.concat(F.lit("ref_"), F.col("l_partkey").cast("string")),
            ).alias("reference_name"),
            "revision_id",
            "l_linenumber",
        ),
        ["page_id", "raw_sha1"],
        order_by=[F.col("revision_id"), F.col("l_linenumber")],
    ).select(
        ci_id.alias("id"),
        "page_id",
        "raw_sha1",
        F.md5(F.concat(F.lit("nc:"), F.col("normalized_sha1"))).alias(
            "normalized_id"
        ),
        "normalized_sha1",
        "reference_type",
        "reference_name",
    )
    citation_histories = lines.select(
        ci_id.alias("citation_instance_id"), "revision_id"
    ).distinct()
    return {
        "revisions": revisions,
        "citation_instances": citation_instances,
        "citation_histories": citation_histories,
    }


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _rows_as_json(df) -> list[str]:
    cols = sorted(df.columns)
    return sorted(
        r["j"] for r in df.select(F.to_json(F.struct(*cols)).alias("j")).collect()
    )


def run_one(spark, k: int, buckets: int, root: str) -> dict:
    prefix = f"stressb{k}x"
    wh_dir = os.path.join(root, f"wh_{k}x")
    t0 = time.perf_counter()
    wh = derive_warehouse_full(spark, BASE, k)
    write_warehouse(
        wh, wh_dir, history_buckets=buckets, bucketed=True, table_prefix=prefix
    )
    plain_dir = os.path.join(root, f"wh_{k}x_plain")
    write_warehouse(wh, plain_dir, history_buckets=buckets, bucketed=False)
    build_s = time.perf_counter() - t0

    bucketed = read_warehouse(spark, wh_dir, table_prefix=prefix)
    plain = read_warehouse(spark, plain_dir)

    # Deterministic target: the most-revised page (exists at every K —
    # replica 0 keeps original ids), served at its median revision.
    page = (
        bucketed["revisions"]
        .groupBy("page_id")
        .count()
        .orderBy(F.desc("count"), "page_id")
        .first()["page_id"]
    )
    # ... at its busiest revision (most citations present), so the
    # served page and the row-identity check are non-trivial.
    page_revs = bucketed["revisions"].filter(F.col("page_id") == page)
    rev = (
        bucketed["citation_histories"]
        .join(
            F.broadcast(page_revs.select("revision_id")), "revision_id"
        )
        .groupBy("revision_id")
        .count()
        .orderBy(F.desc("count"), "revision_id")
        .first()["revision_id"]
    )

    shuffle_marker = "hashpartitioning(citation_instance_id"
    result = {"k": k, "buckets": buckets, "build_s": round(build_s, 1),
              "page_id": int(page), "revision_id": int(rev)}
    for label, w in (("bucketed", bucketed), ("plain", plain)):
        df = article_citations(w, int(page), revision_id=int(rev), raw=True,
                               limit=100)
        plan = _executed_plan(df)
        result[f"{label}_instance_exchange"] = shuffle_marker in plan
        best = None
        for _ in range(2):
            df = article_citations(w, int(page), revision_id=int(rev),
                                   raw=True, limit=100)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            best = min(best or 9e9, time.perf_counter() - t0)
        result[f"{label}_serve_s"] = round(best, 3)
    # The plan property AT SCALE, both directions of the discrimination.
    assert not result["bucketed_instance_exchange"], (
        f"{k}x: bucketed serving plan SHUFFLES on the instance key"
    )
    assert result["plain_instance_exchange"], (
        f"{k}x: plain plan has no instance shuffle — assertion can't discriminate"
    )
    # Row identity between layouts.
    b_rows = _rows_as_json(
        article_citations(bucketed, int(page), revision_id=int(rev), raw=True,
                          limit=100)
    )
    p_rows = _rows_as_json(
        article_citations(plain, int(page), revision_id=int(rev), raw=True,
                          limit=100)
    )
    assert b_rows == p_rows and len(b_rows) > 0, "layouts disagree"
    result["rows"] = len(b_rows)
    result["history_rows"] = bucketed["citation_histories"].count()
    for name in ("citation_histories", "citation_instances"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{name}")
    return result


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    root = tempfile.mkdtemp(prefix="stress_bucketed_")
    spark = get_spark(app_name="stress-bucketed-serving")
    spark.sparkContext.setLogLevel("ERROR")
    out = [run_one(spark, 1, buckets, root), run_one(spark, k, buckets, root)]
    for r in out:
        print(json.dumps(r))
    g_b = out[1]["bucketed_serve_s"] / out[0]["bucketed_serve_s"]
    g_p = out[1]["plain_serve_s"] / out[0]["plain_serve_s"]
    print(
        f"zero-instance-Exchange HOLDS at {k}x "
        f"({out[1]['history_rows']:,} history rows); serve growth "
        f"bucketed {g_b:.1f}x, plain {g_p:.1f}x on {k}x corpus"
    )
    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
