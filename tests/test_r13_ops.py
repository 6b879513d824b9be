"""Property tests for the round-13 operators: the decontamination
recall meter (generator/meter symmetry, cross-query consistency with
the generator it prices) and RRF over real candidate generators
(fusion algebra, candidate-subset containment).  Oracle parity is
covered registry-wide by tests/test_oracle_parity.py; these pin the
operator SEMANTICS."""

from pyspark.sql import functions as F

from wiki_references_db_spark.queries import all_queries
from wiki_references_db_spark.queries.pipeline_extra import (
    _RRF_K,
    _RRF_QUERIES,
    _RRF_TOPK,
)


def test_decontam_meter_algebra_and_cross_consistency(spark, sf_dir):
    qs = all_queries()
    meter = qs["decontam_recall_eval"](spark, sf_dir).first()
    # ppm algebra and the subset bound.
    assert 0 <= meter["n_captured_pairs"] <= meter["n_true_pairs"]
    assert meter["recall_ppm"] == round(
        meter["n_captured_pairs"] / meter["n_true_pairs"] * 1_000_000
    )
    # Cross-query consistency: the meter's captured set is EXACTLY the
    # pair set the generator confirms (truth ∩ band candidates at the
    # same threshold), so the generator's total (train, eval) hit count
    # must equal n_captured_pairs.
    gen_pairs = (
        qs["semantic_decontaminate_lsh"](spark, sf_dir)
        .agg(F.coalesce(F.sum("n_eval_matches"), F.lit(0)).cast("long"))
        .first()[0]
    )
    assert gen_pairs == meter["n_captured_pairs"]


def test_rrf_hybrid_generators_shape(spark, sf_dir):
    rows = all_queries()["rrf_hybrid_generators"](spark, sf_dir).collect()
    assert rows, "hybrid retrieval returned nothing on the synthetic corpus"
    seen = set()
    per_q = {}
    for r in rows:
        assert 0 <= r["qid"] < _RRF_QUERIES
        assert r["cid"] != r["qid"]
        assert (r["qid"], r["cid"]) not in seen
        seen.add((r["qid"], r["cid"]))
        per_q[r["qid"]] = per_q.get(r["qid"], 0) + 1
        # A fused row must come from at least one generator.
        assert r["rank_lex"] is not None or r["rank_sem"] is not None
    assert all(n <= _RRF_TOPK for n in per_q.values())


def test_rrf_hybrid_generators_fusion_algebra(spark, sf_dir):
    # rrf_score is EXACTLY the reciprocal-rank sum over the generators
    # that produced the candidate — recomputed in Python per row.
    rows = all_queries()["rrf_hybrid_generators"](spark, sf_dir).collect()
    for r in rows:
        want = 0.0
        if r["rank_lex"] is not None:
            assert r["rank_lex"] >= 1
            want += 1.0 / (_RRF_K + r["rank_lex"])
        if r["rank_sem"] is not None:
            assert r["rank_sem"] >= 1
            want += 1.0 / (_RRF_K + r["rank_sem"])
        assert r["rrf_score"] == want


def test_rrf_hybrid_semantic_side_is_band_candidate_subset(spark, sf_dir):
    # Every candidate carrying a semantic rank must actually collide
    # with its query in >= 1 LSH band — the generator containment that
    # makes this the "real generators" form.
    from wiki_references_db_spark.queries.training import _neardup_band_rows
    from wiki_references_db_spark.tables import load_table

    rows = all_queries()["rrf_hybrid_generators"](spark, sf_dir).collect()
    sem_pairs = {
        (r["qid"], r["cid"]) for r in rows if r["rank_sem"] is not None
    }
    if not sem_pairs:
        return
    e = load_table(spark, sf_dir, "embeddings")
    bands = _neardup_band_rows(e).select("vec_id", "band_id", "band_key")
    qb = bands.filter(F.col("vec_id") < _RRF_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("band_id").alias("q_band_id"),
        F.col("band_key").alias("q_band_key"),
    )
    collide = {
        (r["qid"], r["cid"])
        for r in qb.join(
            bands,
            (F.col("q_band_id") == F.col("band_id"))
            & (F.col("q_band_key") == F.col("band_key")),
        )
        .select("qid", F.col("vec_id").alias("cid"))
        .distinct()
        .collect()
    }
    assert sem_pairs <= collide


def test_mixture_temperature_epochs_algebra(spark, sf_dir):
    from wiki_references_db_spark.queries.curation import _MIXT_EPOCH_CAP

    rows = all_queries()["mixture_temperature_epochs"](spark, sf_dir).collect()
    assert rows
    budget = sum(r["n_tokens"] for r in rows)
    # Allocation conserves the budget up to per-source rounding.
    assert abs(sum(r["alloc_tokens"] for r in rows) - budget) <= len(rows)
    assert abs(sum(r["weight_ppm"] for r in rows) - 1_000_000) <= len(rows)
    for r in rows:
        # capped + excess is an identity, never a re-plan.
        assert r["capped_tokens"] + r["excess_tokens"] == r["alloc_tokens"]
        assert r["capped_tokens"] <= _MIXT_EPOCH_CAP * r["n_tokens"]
        assert r["epochs_milli"] == round(
            r["alloc_tokens"] / r["n_tokens"] * 1000
        ) or abs(
            r["epochs_milli"] - r["alloc_tokens"] / r["n_tokens"] * 1000
        ) <= 1  # alloc is itself rounded; allow 1 milli-epoch slack
    # Temperature direction: alpha = 0.5 flattens — a strictly larger
    # source gets a strictly larger weight but strictly FEWER epochs.
    by_tokens = sorted(rows, key=lambda r: r["n_tokens"])
    for a, b in zip(by_tokens, by_tokens[1:]):
        if a["n_tokens"] < b["n_tokens"]:
            assert a["weight_ppm"] <= b["weight_ppm"]
            assert a["epochs_milli"] >= b["epochs_milli"]
