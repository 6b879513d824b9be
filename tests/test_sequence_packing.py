"""Invariants of the token-budget sequence packer beyond what the SQL
oracle pins (queries/curation.py::sequence_pack_greedy)."""

from pyspark.sql import functions as F

from wiki_references_db_spark.queries import all_queries
from wiki_references_db_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
BUDGET = 2048


def test_sequence_packing_invariants(spark):
    packed = all_queries()["sequence_pack_greedy"](spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    total_tokens = docs.select(
        F.sum(F.expr("size(split(trim(text), '\\\\s+'))").cast("long")).alias("t")
    ).collect()[0]["t"]
    n_docs = docs.count()

    # Conservation: every document lands in exactly one sequence.
    assert sum(r["n_docs"] for r in packed) == n_docs
    assert sum(r["n_tokens"] for r in packed) == total_tokens

    # Sequence ids are dense from 0.
    seq_ids = sorted(r["seq_id"] for r in packed)
    assert seq_ids == list(range(len(packed)))

    # Packing follows doc_id order: doc ranges of consecutive sequences
    # are disjoint and increasing.
    by_seq = sorted(packed, key=lambda r: r["seq_id"])
    for prev, cur in zip(by_seq, by_seq[1:]):
        assert prev["last_doc"] < cur["first_doc"]

    # Offset binning: a sequence overshoots the budget by at most the
    # size of its final document, and every non-final sequence spans at
    # least the budget when combined with its first doc's offset (i.e.
    # no sequence both underfills and precedes more data).
    for r in by_seq[:-1]:
        assert r["n_tokens"] + BUDGET > BUDGET  # non-empty
        # each doc starts in the bin holding its pre-document offset, so
        # a non-final bin's cumulative span must reach its bin boundary
    # cumulative check: bin of each sequence's last token offset
    cum = 0
    for r in by_seq:
        start_bin = cum // BUDGET
        assert start_bin == r["seq_id"]
        cum += r["n_tokens"]
