"""Unit tests for the curation operator family (queries/curation.py,
operators/graph.py): connected-components transitivity on crafted
graphs, PII regex behavior, repetition-flag arithmetic.  The
corpus-level value-hash checks live in tests/test_oracle_parity.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wiki_references_db_spark.operators.graph import connected_components

pytestmark = pytest.mark.usefixtures("spark")


def _cc(spark, node_ids, edge_pairs):
    nodes = spark.createDataFrame([(i,) for i in node_ids], "id long")
    edges = spark.createDataFrame(
        [(a, b) for a, b in edge_pairs] or [(None, None)], "src long, dst long"
    )
    if not edge_pairs:
        edges = edges.filter(F.col("src").isNotNull())
    rows = connected_components(nodes, edges).collect()
    return {r["id"]: r["component"] for r in rows}


def test_cc_chain_is_transitive(spark):
    # A-B, B-C, C-D: one component although A and D share no edge.
    comp = _cc(spark, [1, 2, 3, 4, 10], [(1, 2), (2, 3), (3, 4)])
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10}


def test_cc_isolated_and_cliques(spark):
    comp = _cc(spark, range(8), [(5, 6), (6, 7), (5, 7), (2, 3)])
    assert comp == {0: 0, 1: 1, 2: 2, 3: 2, 4: 4, 5: 5, 6: 5, 7: 5}


def test_cc_no_edges(spark):
    comp = _cc(spark, [4, 7], [])
    assert comp == {4: 4, 7: 7}


def test_cc_long_path_converges_in_log_rounds(spark):
    # A 40-node path stresses path halving: plain one-hop propagation
    # would need 40 rounds; the operator caps at 25 and must still
    # converge via pointer jumping.
    n = 40
    comp = _cc(spark, range(n), [(i, i + 1) for i in range(n - 1)])
    assert set(comp.values()) == {0}


def test_cc_edge_referencing_min_orders(spark):
    # Edges given in "wrong" orientation (dst < src) must still pull
    # labels both ways (symmetrization).
    comp = _cc(spark, [1, 2, 3], [(3, 1), (2, 3)])
    assert comp == {1: 1, 2: 1, 3: 1}


def test_pii_patterns_match_and_redact(spark):
    from wiki_references_db_spark.queries.curation import (
        _PII_EMAIL,
        _PII_IPV4,
        _PII_PHONE,
    )

    df = spark.createDataFrame(
        [("mail a.b%c@ex-ample.co.uk ip 192.168.0.1 tel +44-555-0199 x",)],
        "t string",
    )
    out = df.select(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("t"), _PII_EMAIL, "<EMAIL>"),
                _PII_IPV4,
                "<IP>",
            ),
            _PII_PHONE,
            "<PHONE>",
        ).alias("red")
    ).first()["red"]
    assert out == "mail <EMAIL> ip <IP> tel <PHONE> x"


def test_pii_ipv4_word_boundary(spark):
    from wiki_references_db_spark.queries.curation import _PII_IPV4

    df = spark.createDataFrame([("v1.2.3.4.5 but 10.0.0.1 ok",)], "t string")
    n = df.select(
        F.size(F.regexp_extract_all("t", F.lit(_PII_IPV4), F.lit(0))).alias("n")
    ).first()["n"]
    # 1.2.3.4 inside the version-ish token still matches (digit runs are
    # word chars); the point of \b is excluding partial digit runs like
    # matching "0.0.1 o" — assert the full-address match count.
    assert n == 2


def test_repetition_flag_arithmetic(spark):
    from wiki_references_db_spark.queries.curation import quality_repetition_stats

    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="curation_docs_")
    docs = spark.createDataFrame(
        [
            (1, "a a a a b", "en", "s", 9),       # max=4/5 tokens -> repetitive
            (2, "a b c d e f g h", "en", "s", 15),  # all distinct -> clean
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    rows = {
        r["doc_id"]: r.asDict()
        for r in quality_repetition_stats(spark, d).collect()
    }
    assert rows[1]["flag_repetitive"] == 1
    assert rows[1]["max_token_count"] == 4
    assert rows[1]["n_tokens"] == 5
    assert rows[2]["flag_repetitive"] == 0
    assert rows[2]["dup_bigram_frac"] == 0.0
