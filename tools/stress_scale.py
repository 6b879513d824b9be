#!/usr/bin/env python3
"""Empirical scale check: inflate sf0.1 by KX (key-shifted unions, so
join/group cardinalities grow linearly and duplicate/cluster structure
replicates rather than densifies), write it as parquet, and time the
scale-critical headline queries at both sizes.

A scale-safe plan should grow wall-clock sub-linearly to linearly in
rows (fixed per-job overhead amortizes; shuffles grow linearly); a
quadratic candidate-generation bug or a single-partition bottleneck
shows up immediately as a >K growth factor.

Usage: python tools/stress_scale.py [K] [out_dir] [--only a,b,c]

``--only`` restricts the timed sweep to the named queries (the corpus
is still inflated once) — re-measuring one late-added query no longer
costs a full-harness re-run.  The codec-decode stage only runs on full
sweeps.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from wiki_references_db_spark.queries import all_queries
from wiki_references_db_spark.session import get_spark
from wiki_references_db_spark.tables import TESTDATA_TABLES, load_table

BASE = "/root/testdata/sf0.1"

# Key columns to shift per replica so cardinalities scale linearly.
SHIFT_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # dimension tables stay as-is (they'd be dimensions at scale too)
    "region": [],
    "nation": [],
    "supplier": [],
    "part": [],
}

QUERIES = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "corpus_dup_span_stats",
    "multimodal_phash_dedup",
    "dedup_canonical_pick",
    "ann_ivf_probe",
    "events_sessionize",
    "tfidf_top_terms",
    "wiki_citations_at_revision",
    "dedup_substring_containment",
    "bpe_pair_merge",
    "triangle_count_cosupplier",
    "events_in_incident_windows",
    "dedup_paragraphs_global",
    "sparse_idf_cosine_pairs",
    "events_rolling_wau",
    "embedding_pca_power_iter",
    # round-6 late additions
    "graph_bfs_khop",
    "bigram_lm_doc_score",
    "embedding_coreset_per_cell",
    "sketch_sample_quantiles",
    # round-6 closing additions (post-freeze ops + perf-rewritten forms)
    "sketch_ams_f2",
    "ols_normal_equations",
    "sketch_hll_sliding_union",
    "interval_merge_coverage",
    "event_type_trigrams",
    "vocab_encode_docs",
    "rare_token_score",
    "dedup_jaccard_prefix_filter",
    # round-8/9 additions (part_metrics_* read the unshifted part
    # dimension, so ~1x growth is the EXPECTED honest reading there;
    # customer_priority_listagg grows with orders, and its collect_set
    # payload is structurally bounded at 5 distinct priorities per
    # customer regardless of per-customer row count — the partial
    # aggregation collapses duplicates map-side before the shuffle);
    # multimodal_decode_stats runs the Arrow mapInPandas decode plumbing
    # over the shifted documents table.
    "part_metrics_unpivot",
    "part_metrics_pivot",
    "customer_priority_listagg",
    "multimodal_decode_stats",
    # round-10 addition: the exact vs approx profile pair over the
    # shifted orders table (o_orderkey cardinality grows 10x, so the
    # exact form's per-column distinct shuffle grows with it while the
    # approx form ships one HLL buffer per partition; both are
    # scan-dominated at sf0.1 — the shape difference is pinned by
    # tests/test_profiling_approx.py, the growth recorded here).
    "table_profile_stats",
    "table_profile_stats_approx",
    # round-10 late additions: the embedding-dedup pair over the
    # rotated-replica inflation (see the embeddings branch in inflate).
    # vec_id shifting replicates the centroid sample (vec_id % 125 == 7)
    # into every replica and the rotation keeps each replica's geometry
    # isomorphic to the base corpus, so the cell count k grows LINEARLY
    # with the corpus while per-cell membership stays ~flat — the
    # regime the SemDeDup sum(|cell|^2) pair bound is designed for
    # (measured 1.8x / 2.2x on 10x).  dedup_embedding_cosine was the
    # round-10 honest SUPER-LINEAR point (12.6x on 10x, fixed 2^4 band
    # keys); since round 11 its band width is corpus-adaptive
    # (2^bits ~ n/16) and it measures ~1.4-1.5x here
    # (bench_runs/r11/stress_semdedup_10x.txt) — a super-linear result
    # on this query is now a REGRESSION (e.g. the 16-bit width cap
    # being hit), not the documented regime.
    "dedup_semdedup_cells",
    "cell_label_purity",
    "dedup_embedding_cosine",
    # fixed-k SemDeDup: the OTHER endpoint of the k dial — assignment
    # stays exactly n x k (linear) but same-cell pairs densify as
    # ~n^2/k when k is held at 16 while the corpus grows 10x, so a
    # super-linear growth here is the DOCUMENTED expected regime, not
    # a plan bug (deployments size k ~ sqrt(n); the %125-sample form
    # above is the in-family linear-pairs alternative).  Listed so the
    # trade is measured, not narrated.
    "dedup_semdedup_cells_kfixed",
    # sqrt-k: the balanced dial setting — k grows as sqrt(n), both the
    # assignment and the pair term are ~n^1.5, so expected 10x growth
    # is ~10^1.5/10 ~ 3x relative to linear (still sub-K).
    "dedup_semdedup_cells_ksqrt",
    # hashed-hyperplane banded LSH: same adaptive width rule as the
    # coordinate form (expected ~linear), plus 4 x bits literal-array
    # projection folds per row — map-side constant factor, not a
    # growth term.
    "dedup_embedding_cosine_projected",
    # batch-vs-corpus form: the batch slice (vec_id % 10 == 3) grows
    # with the corpus, so expected growth is ~linear like the global
    # form — the property under test is that corpus x corpus pairs are
    # never generated (the pair join's left side stays delta-sized).
    "dedup_semdedup_incremental",
    # round-12 additions.  Winnowing: fingerprint selection is map-side
    # (expected ~linear); the pair join goes through the DF-capped
    # inverted index, and the replica token-suffixing keeps duplicate
    # RATE constant, so candidate pairs grow ~linearly too.  CDC: one
    # map-side chunk projection + an exact-dedup-shaped groupBy —
    # expected ~linear.  Decontam: train x eval band join where both
    # sides grow with the corpus here (worst case for the plan; in
    # production the eval side is fixed), so ~linear growth with the
    # adaptive band width holding occupancy flat.  RRF: 3-query
    # broadcast scan + rank windows over n candidates — ~linear.
    "dedup_winnowing_fingerprints",
    "dedup_cdc_chunks",
    "semantic_decontaminate_lsh",
    "rrf_hybrid_rank",
    # round-13 addition.  RRF over real generators: the query sides
    # (3 band rows + 3 gram sets) broadcast, so expected growth is the
    # corpus-side generator cost — band-table probe (~linear with the
    # adaptive width holding bucket occupancy flat) + stopgram-index
    # probe (posting lengths grow ~linearly under the relative DF cap;
    # candidates per query stay O(postings of its ~30 grams)).
    "rrf_hybrid_generators",
    # round-13 batch-2 additions.  dup_span_maximal_runs: map-side gram
    # hashing + one frequency shuffle keyed on md5; replica
    # token-suffixing keeps the duplicate RATE constant, so dup
    # positions and islands grow ~linearly.  embedding_matryoshka_recall:
    # 3 broadcast queries x 3 dims over the streamed corpus — ~linear
    # (an eval harness; at 100 TB it runs on a sample).
    # adamic_adar_links: edges/degrees grow ~linearly, but the PAIR
    # stage is flat by design — the per-supplier cap bounds fan-out at
    # cap^2 per supplier and the supplier dimension is unshifted, so a
    # growth factor well BELOW K on the pair-side is the expected
    # reading (the linear part is the edge-distinct shuffle).
    # phrase_tag_dictionary: map-side n-grams + broadcast dict join —
    # scan-bound ~linear; replica token-suffixing means only the base
    # replica matches (flat match counts, honest scan growth).
    # source_length_ks: one (source, value) count shuffle (~linear);
    # the grid/window stage is value-DOMAIN-sized and stays flat.
    "dup_span_maximal_runs",
    "embedding_matryoshka_recall",
    "adamic_adar_links",
    "phrase_tag_dictionary",
    "source_length_ks",
    # mmr_diversify_topk: the pool is a rank-limit window over the
    # brute-force relevance scan (the corpus-sized part, ~linear with
    # the 3 queries broadcast); everything after — pool x pool sims,
    # 4 greedy steps — is pool-sized (8 rows/query) and flat.
    "mmr_diversify_topk",
    # NOT listed: stream_* queries (incl. stream_dedup_vs_corpus) — the
    # stream executes inside the query callable (awaitTermination before
    # it returns), so this harness's timed noop write would measure only
    # the sink read, not the streaming work.
]


# Circular dimension rotation for embedding replicas (shared with
# tools/stress_semdedup_streaming.py): keeps each replica's internal
# geometry isomorphic to the base corpus while making cross-replica
# vectors new content.  The 64-dim budget caps how many distinct
# replicas exist; factors past it fail loudly in the helper below
# (replica 64 would be a verbatim copy — the densification artifact
# the rotation prevents).
EMBED_ROTATION_MAX_K = 64


def rotated_embedding_expr(i: int) -> str:
    # Loud at the helper itself: i >= MAX_K would wrap to a verbatim
    # replica of the base corpus (the densification artifact the
    # rotation exists to prevent), so it is an error, not a modulo.
    # ValueError, not assert: the guard must survive `python -O`.
    if not 0 <= i < EMBED_ROTATION_MAX_K:
        raise ValueError(
            f"inflation factor {i} exceeds the {EMBED_ROTATION_MAX_K}-dim "
            "rotation budget; replica would duplicate base corpus verbatim"
        )
    r = i
    return (
        f"concat(slice(embedding, {r} + 1, {64 - r}),"
        f" slice(embedding, 1, {r}))"
    )


def time_real_codec_decode(spark, n: int) -> float:
    """Wall-clock of the REAL JPEG decode stage (operators/jpeg.py via
    image_pixel_stats) over ``n`` distinct in-repo-encoded baseline
    JPEGs — the map-only real-codec path whose per-row cost, not plan
    shape, is the scale question."""
    import numpy as np
    from pyspark.sql import Row

    from wiki_references_db_spark.operators.jpeg import encode_jpeg_baseline
    from wiki_references_db_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_pixel_stats,
    )

    rng = np.random.default_rng(7)
    # 64 distinct payloads cycled to n rows: encode cost stays off the
    # clock, decode work scales exactly with n.
    payloads = [
        encode_jpeg_baseline(
            rng.integers(0, 256, (24, 24, 3), dtype=np.uint8), quality=80
        )
        for _ in range(64)
    ]
    rows = [
        Row(media_id=i, kind="image", payload=payloads[i % 64], metadata={})
        for i in range(n)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(32)
    stats = image_pixel_stats(media)
    stats.write.mode("overwrite").format("noop").save()  # warm
    t0 = time.perf_counter()
    stats.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def inflate(spark, k: int, out_dir: str) -> None:
    for name in TESTDATA_TABLES:
        df = load_table(spark, BASE, name)
        keys = SHIFT_KEYS[name]
        if keys:
            offsets = {c: df.agg(F.max(c)).first()[0] + 1 for c in keys}
            parts = []
            for i in range(k):
                p = df
                for c in keys:
                    p = p.withColumn(c, F.col(c) + F.lit(i * offsets[c]))
                if name == "documents" and i > 0:
                    # Suffix every token per replica: replicas must be NEW
                    # content, not 10 exact copies of each document —
                    # otherwise every MinHash/SimHash bucket grows 10x and
                    # candidate PAIRS grow 100x, a quadratic artifact of
                    # the inflation rather than of the plans under test
                    # (a real 10x corpus keeps the duplicate RATE, not
                    # 10x duplicate MULTIPLICITY).
                    p = p.withColumn(
                        "text",
                        F.expr(
                            "array_join(transform(split(coalesce(text, ''), ' '),"
                            f" x -> concat(x, '_r{i}')), ' ')"
                        ),
                    )
                if name == "embeddings" and i > 0:
                    # Same multiplicity-vs-rate principle for vectors:
                    # verbatim replicas are 10 EXACT copies of every
                    # embedding, which tie-break into one cell /
                    # LSH bucket and densify it 10x (candidate pairs
                    # grow 100x — an inflation artifact, not a plan
                    # property).  A circular dimension rotation per
                    # replica keeps each replica's internal geometry
                    # isomorphic to the base corpus (norms, within-
                    # replica cosines, duplicate RATE all preserved)
                    # while making cross-replica vectors new content.
                    assert k <= EMBED_ROTATION_MAX_K, (
                        f"embedding rotation supports k <= "
                        f"{EMBED_ROTATION_MAX_K}, got {k}"
                    )
                    p = p.withColumn(
                        "embedding", F.expr(rotated_embedding_expr(i))
                    )
                parts.append(p)
            out: DataFrame = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        else:
            out = df
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))


def time_queries(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    qs = all_queries()
    res = {}
    for name in names:
        best = None
        for _ in range(2):
            df = qs[name](spark, sf_dir)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            best = min(best or 9e9, time.perf_counter() - t0)
        spark.catalog.clearCache()
        res[name] = round(best, 3)
    return res


def main() -> None:
    argv = list(sys.argv[1:])
    names = QUERIES
    if "--only" in argv:
        i = argv.index("--only")
        if i + 1 >= len(argv):
            raise SystemExit("usage: stress_scale.py [K] [out_dir] [--only a,b,c]")
        names = argv[i + 1].split(",")
        unknown = [n for n in names if n not in all_queries()]
        if unknown:
            raise SystemExit(f"--only: unknown queries {unknown}")
        # stream_* queries execute the streaming job INSIDE the callable
        # (awaitTermination before it returns), so this harness's timed
        # noop write would measure only the sink read — enforce the
        # documented exclusion instead of silently mismeasuring.
        streams = [n for n in names if n.startswith("stream_")]
        if streams:
            raise SystemExit(
                f"--only: stream queries are not stress-timeable here "
                f"(the timed write would measure only the sink read): "
                f"{streams}"
            )
        del argv[i : i + 2]
    k = int(argv[0]) if len(argv) > 0 else 10
    out_dir = argv[1] if len(argv) > 1 else tempfile.mkdtemp(prefix="stress_sf")
    spark = get_spark(app_name="stress-scale")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    inflate(spark, k, out_dir)
    print(f"inflated {k}x corpus written to {out_dir} in {time.perf_counter()-t0:.1f}s")

    base = time_queries(spark, BASE, names)
    big = time_queries(spark, out_dir, names)
    print(f"{'query':30s} {'sf0.1':>8s} {k:>6d}x {'growth':>8s}")
    worst = 0.0
    for name in names:
        g = big[name] / base[name] if base[name] else float("inf")
        worst = max(worst, g)
        print(f"{name:30s} {base[name]:8.3f} {big[name]:8.3f} {g:7.1f}x")
    print(
        f"worst growth {worst:.1f}x on a {k}x corpus "
        f"({'SUB-LINEAR: scale-safe' if worst <= k else 'SUPER-LINEAR: investigate'})"
    )
    if names is QUERIES:
        codec_small = time_real_codec_decode(spark, 2000)
        codec_big = time_real_codec_decode(spark, 2000 * k)
        print(
            f"{'real_jpeg_decode_stage':30s} {codec_small:8.3f} {codec_big:8.3f} "
            f"{codec_big / codec_small:7.1f}x  (rows 2000 -> {2000 * k})"
        )
    if out_dir.startswith(tempfile.gettempdir()):
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
