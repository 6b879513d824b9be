"""SemDeDup / cluster-eval / ORC-glue checks beyond the oracle parity:
an independent pure-Python re-computation of the cluster-scoped dedup
(same IEEE fold order, so exact equality), plan-shape pins, and ORC
roundtrip losslessness against the parquet source."""

import math
from decimal import ROUND_HALF_UP, Decimal

from wiki_references_db_spark.queries import all_queries
from wiki_references_db_spark.tables import load_table


def _round_half_up(x: float) -> int:
    """Exact HALF_UP (away-from-zero on .5) like Spark round() / DuckDB
    round() — Decimal on the shortest repr, so a double whose x + 0.5
    is not exactly representable can never round the wrong way (the
    float `floor(x + 0.5)` idiom can)."""
    return int(Decimal(repr(x)).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _py_fold_dot(a, b):
    """Sequential left fold, the exact order Spark's `aggregate` and
    DuckDB's `list_reduce` use — bit-identical to both engines."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _reference_semdedup(rows, mod, rem, tau):
    """(assign, dropped): nearest-centroid assignment and the min-id
    canonical-survivor drop set, computed sequentially in Python."""
    norms = {vid: math.sqrt(_py_fold_dot(e, e)) for vid, e, _ in rows}
    # vec_id order so the strictly-greater-wins scan reproduces the
    # ORDER BY cosine DESC, cent_id tie-break (smallest cent_id wins).
    cents = sorted((vid, e) for vid, e, _ in rows if vid % mod == rem)
    assign = {}
    for vid, e, _ in rows:
        best = None
        for cid, ce in cents:
            cos = _py_fold_dot(e, ce) / (norms[vid] * norms[cid])
            # ORDER BY cosine DESC, cent_id: strictly-greater wins; ties
            # keep the smaller cent_id (cents iterate in vec_id order).
            if best is None or cos > best[1]:
                best = (cid, cos)
        assign[vid] = best[0]
    emb = {vid: e for vid, e, _ in rows}
    by_cell = {}
    for vid, cell in assign.items():
        by_cell.setdefault(cell, []).append(vid)
    dropped = set()
    for cell, members in by_cell.items():
        members.sort()
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                cos = _py_fold_dot(emb[a], emb[b]) / (norms[a] * norms[b])
                if cos >= tau:
                    dropped.add(b)
    return assign, dropped


def _load_rows(spark, sf_dir):
    return [
        (r.vec_id, list(r.embedding), r.label)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    ]


def test_semdedup_matches_sequential_reference(spark, sf_dir):
    from wiki_references_db_spark.queries.training import (
        _IVF_CENT_MOD,
        _IVF_CENT_REM,
        _SEMDEDUP_TAU,
    )

    rows = _load_rows(spark, sf_dir)
    assign, dropped = _reference_semdedup(
        rows, _IVF_CENT_MOD, _IVF_CENT_REM, _SEMDEDUP_TAU
    )
    expected = {}
    for vid, cell in assign.items():
        m, d = expected.get(cell, (0, 0))
        expected[cell] = (m + 1, d + (1 if vid in dropped else 0))

    got = {
        r.cell: (r.n_members, r.n_dropped, r.n_kept)
        for r in all_queries()["dedup_semdedup_cells"](spark, sf_dir).collect()
    }
    spark.catalog.clearCache()
    assert got == {
        cell: (m, d, m - d) for cell, (m, d) in expected.items()
    }
    # The dedup must have real signal at every test SF — an all-zero
    # n_dropped column would make the query vacuous as evidence.
    assert sum(d for _, d, _ in got.values()) > 0
    assert sum(m for m, _, _ in got.values()) == len(rows)


def test_cell_label_purity_matches_sequential_reference(spark, sf_dir):
    from wiki_references_db_spark.queries.training import (
        _IVF_CENT_MOD,
        _IVF_CENT_REM,
        _SEMDEDUP_TAU,
    )

    rows = _load_rows(spark, sf_dir)
    assign, _ = _reference_semdedup(
        rows, _IVF_CENT_MOD, _IVF_CENT_REM, _SEMDEDUP_TAU
    )
    hist = {}
    for vid, _e, label in rows:
        cell = assign[vid]
        hist.setdefault(cell, {}).setdefault(label, 0)
        hist[cell][label] += 1
    expected = {}
    for cell, counts in hist.items():
        n = sum(counts.values())
        # ORDER BY c DESC, label
        maj_label, maj_count = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        expected[cell] = (
            n,
            maj_label,
            maj_count,
            # HALF_UP like Spark round()/DuckDB round() — Python's
            # round() is banker's and would diverge on exact .5 ties,
            # and floor(x + 0.5) can round up a value strictly below
            # .5 when x + 0.5 is not exactly representable.
            _round_half_up(maj_count / n * 1_000_000),
        )

    got = {
        r.cell: (r.n_members, r.majority_label, r.majority_count, r.purity_ppm)
        for r in all_queries()["cell_label_purity"](spark, sf_dir).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_semdedup_incremental_matches_sequential_reference(spark, sf_dir):
    """Batch-vs-corpus form: a batch vector (vec_id % 10 == 3) is a dup
    iff some same-cell CORPUS vector scores >= the incremental tau —
    corpus-internal pairs never influence the result."""
    from wiki_references_db_spark.queries.training import (
        _IVF_CENT_MOD,
        _IVF_CENT_REM,
        _SEMDEDUP_INC_TAU,
    )

    rows = _load_rows(spark, sf_dir)
    assign, _ = _reference_semdedup(
        rows, _IVF_CENT_MOD, _IVF_CENT_REM, _SEMDEDUP_INC_TAU
    )
    norms = {vid: math.sqrt(_py_fold_dot(e, e)) for vid, e, _ in rows}
    emb = {vid: e for vid, e, _ in rows}
    by_cell = {}
    for vid, cell in assign.items():
        by_cell.setdefault(cell, []).append(vid)
    expected = {}
    for cell, members in by_cell.items():
        batch = [v for v in members if v % 10 == 3]
        corpus = [v for v in members if v % 10 != 3]
        if not batch:
            continue
        n_dup = sum(
            1
            for b in batch
            if any(
                _py_fold_dot(emb[b], emb[c]) / (norms[b] * norms[c])
                >= _SEMDEDUP_INC_TAU
                for c in corpus
            )
        )
        expected[cell] = (len(batch), n_dup, len(batch) - n_dup)

    got = {
        r.cell: (r.n_batch, r.n_dup_vs_corpus, r.n_new)
        for r in all_queries()["dedup_semdedup_incremental"](
            spark, sf_dir
        ).collect()
    }
    spark.catalog.clearCache()
    assert got == expected
    assert sum(d for _, d, _ in got.values()) > 0  # real signal


def test_streaming_semdedup_agrees_with_incremental_batch(spark, sf_dir):
    """Triad consistency: the streaming form's per-vector dup flags,
    aggregated per cell, must equal dedup_semdedup_incremental's
    per-cell stats — the same semantics through the Structured
    Streaming engine (file-source ledger, foreachBatch probe, parquet
    sink) and through the one-shot batch plan."""
    stream_rows = all_queries()["stream_semdedup_vs_corpus"](
        spark, sf_dir
    ).collect()
    spark.catalog.clearCache()
    agg = {}
    for r in stream_rows:
        n_b, n_d = agg.get(r.cell, (0, 0))
        agg[r.cell] = (n_b + 1, n_d + r.is_dup)
    batch = {
        r.cell: (r.n_batch, r.n_dup_vs_corpus)
        for r in all_queries()["dedup_semdedup_incremental"](
            spark, sf_dir
        ).collect()
    }
    spark.catalog.clearCache()
    assert agg == batch
    # Per-vector output is emitted exactly once per batch vector.
    assert len(stream_rows) == len({r.vec_id for r in stream_rows})


def test_semdedup_plan_has_no_cartesian_and_joins_on_cell(spark, sf_dir):
    """The ONLY pair generation is the equi-join on the cell key; the
    centroid scoring is a broadcast nested-loop over the parameter-sized
    centroid set (the same allowance as ann_ivf_probe) — never a
    CartesianProduct over corpus x corpus."""
    df = all_queries()["dedup_semdedup_cells"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    spark.catalog.clearCache()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # corpus x broadcast(centroids)
    assert "cell" in plan  # the pair join keys on the cell id


def test_orc_roundtrip_equals_parquet_source(spark, sf_dir):
    """The five integrity stats after the ORC write/read cycle equal the
    same aggregate computed directly over the parquet source — the
    roundtrip is lossless (values, not just counts: the distinct
    md5(text) pins content)."""
    import pyspark.sql.functions as F

    got = all_queries()["orc_roundtrip_stats"](spark, sf_dir).collect()[0]
    direct = (
        load_table(spark, sf_dir, "documents")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("doc_id").alias("n_ids"),
            F.countDistinct(F.md5("text")).alias("n_text_hashes"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .collect()[0]
    )
    assert tuple(got) == tuple(direct)


def _reference_kfixed_assign(rows, k):
    """Seed-k Lloyd assignment exactly as _semdedup_lloyd_assign_sql:
    k seeds (vec_id < k), one Lloyd update with 1e-6 fixed-point member
    means, then nearest-updated-centroid by cosine — every float op in
    the engines' order, so equality is exact.  Parameterized by k so it
    serves both the fixed-k and sqrt-k registered settings."""
    norms = {vid: math.sqrt(_py_fold_dot(e, e)) for vid, e, _ in rows}
    seeds = sorted((vid, e) for vid, e, _ in rows if vid < k)

    def argmax(vid, e, cents, cnorms):
        best = None
        for cid, ce in cents:
            cos = _py_fold_dot(e, ce) / (norms[vid] * cnorms[cid])
            if best is None or cos > best[1]:
                best = (cid, cos)
        return best[0]

    seed_norms = {cid: norms[cid] for cid, _ in seeds}
    a0 = {vid: argmax(vid, e, seeds, seed_norms) for vid, e, _ in rows}
    # Lloyd update: per-(cell, dim) mean of round(v * 1e6) integers,
    # recombined as CAST(SUM AS DOUBLE) / 1e6 / COUNT in that order.
    sums, counts = {}, {}
    for vid, e, _ in rows:
        cell = a0[vid]
        counts[cell] = counts.get(cell, 0) + 1
        acc = sums.setdefault(cell, [0] * len(e))
        for d, v in enumerate(e):
            acc[d] += _round_half_up(float(v) * 1000000)
    cents = sorted(
        (cell, [float(s) / 1000000.0 / counts[cell] for s in acc])
        for cell, acc in sums.items()
    )
    cnorms = {cid: math.sqrt(_py_fold_dot(ce, ce)) for cid, ce in cents}
    return {vid: argmax(vid, e, cents, cnorms) for vid, e, _ in rows}


def test_semdedup_kfixed_matches_sequential_reference(spark, sf_dir):
    from wiki_references_db_spark.queries.training import (
        _SEMDEDUP_KFIXED_K,
        _SEMDEDUP_TAU,
    )

    rows = _load_rows(spark, sf_dir)
    assign = _reference_kfixed_assign(rows, _SEMDEDUP_KFIXED_K)
    norms = {vid: math.sqrt(_py_fold_dot(e, e)) for vid, e, _ in rows}
    emb = {vid: e for vid, e, _ in rows}
    by_cell = {}
    for vid, cell in assign.items():
        by_cell.setdefault(cell, []).append(vid)
    dropped = set()
    for members in by_cell.values():
        members.sort()
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                cos = _py_fold_dot(emb[a], emb[b]) / (norms[a] * norms[b])
                if cos >= _SEMDEDUP_TAU:
                    dropped.add(b)
    expected = {
        cell: (
            len(members),
            sum(1 for v in members if v in dropped),
        )
        for cell, members in by_cell.items()
    }

    got = {
        r.cell: (r.n_members, r.n_dropped, r.n_kept)
        for r in all_queries()["dedup_semdedup_cells_kfixed"](
            spark, sf_dir
        ).collect()
    }
    spark.catalog.clearCache()
    assert got == {
        cell: (m, d, m - d) for cell, (m, d) in expected.items()
    }
    # fixed k: never more cells than k, and the dedup has real signal
    assert len(got) <= _SEMDEDUP_KFIXED_K
    assert sum(d for _, d, _ in got.values()) > 0
    assert sum(m for m, _, _ in got.values()) == len(rows)


def test_kfixed_recall_flat_vs_sample_rule_decay(spark):
    """The k-dial trade the two recall evals exist to measure, pinned
    at the two largest test SFs: the fixed-SAMPLE rule's recall DROPS
    as the corpus grows (cells multiply and split neighborhoods) while
    fixed-k recall holds ~flat (cells densify)."""
    qs = all_queries()
    r = {}
    for sf in ("sf0.01", "sf0.1"):
        for name in ("semdedup_recall_eval", "semdedup_recall_eval_kfixed"):
            row = qs[name](spark, f"/root/testdata/{sf}").collect()[0]
            r[(name, sf)] = row.recall_ppm
            spark.catalog.clearCache()
    sample_drop = (
        r[("semdedup_recall_eval", "sf0.01")]
        - r[("semdedup_recall_eval", "sf0.1")]
    )
    kfixed_drift = abs(
        r[("semdedup_recall_eval_kfixed", "sf0.01")]
        - r[("semdedup_recall_eval_kfixed", "sf0.1")]
    )
    assert sample_drop > 100_000, r  # the sample rule loses >10 points
    assert kfixed_drift < 100_000, r  # fixed k drifts <10 points


def test_semdedup_ksqrt_matches_sequential_reference(spark, sf_dir):
    """The sqrt-k dial setting reuses the same Lloyd machinery with
    k = ceil(sqrt(n)) — the reference is the kfixed one at that k."""
    from wiki_references_db_spark.queries.training import _SEMDEDUP_TAU

    rows = _load_rows(spark, sf_dir)
    k = math.ceil(math.sqrt(len(rows)))
    assign = _reference_kfixed_assign(rows, k)
    norms = {vid: math.sqrt(_py_fold_dot(e, e)) for vid, e, _ in rows}
    emb = {vid: e for vid, e, _ in rows}
    by_cell = {}
    for vid, cell in assign.items():
        by_cell.setdefault(cell, []).append(vid)
    dropped = set()
    for members in by_cell.values():
        members.sort()
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                cos = _py_fold_dot(emb[a], emb[b]) / (norms[a] * norms[b])
                if cos >= _SEMDEDUP_TAU:
                    dropped.add(b)
    expected = {
        cell: (
            len(members),
            sum(1 for v in members if v in dropped),
        )
        for cell, members in by_cell.items()
    }

    got = {
        r.cell: (r.n_members, r.n_dropped, r.n_kept)
        for r in all_queries()["dedup_semdedup_cells_ksqrt"](
            spark, sf_dir
        ).collect()
    }
    spark.catalog.clearCache()
    assert got == {
        cell: (m, d, m - d) for cell, (m, d) in expected.items()
    }
    assert sum(m for m, _, _ in got.values()) == len(rows)
