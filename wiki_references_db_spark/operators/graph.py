"""Distributed connected components over a DataFrame edge list.

Large-scale near-dedup pipelines don't stop at candidate PAIRS: pairs
must be clustered (A~B, B~C => {A,B,C} even when A and C share nothing)
and one canonical document kept per cluster.  The reference's dedup is
purely content-addressed (reference:dedup_parquet.py:74-86 — equal
hashes collapse, no transitivity), so this operator is part of the
engine's training-data extension surface, not a port.

Algorithm: iterative min-label propagation with path halving — the
DataFrame form of the classic "hash-to-min" / pointer-jumping scheme
(Kiveris et al., "Connected Components in MapReduce and Beyond").
Each iteration is two keyed shuffles (one neighbor join + min-agg, one
label-of-label join); path halving makes convergence O(log d) in the
component diameter rather than O(d), so a 100 TB corpus with million-doc
near-dup chains converges in ~20 rounds, each a bounded hash shuffle —
never a global sort, never a driver-side frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from wiki_references_db_spark.storage import persist_corpus


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """Return ``(id, component)`` where ``component`` is the minimum node
    id reachable from ``id`` over undirected ``edges``.

    ``nodes`` must contain every vertex (isolated vertices become their
    own singleton component).  Edges are symmetrized internally, so pass
    each undirected edge once in either orientation.

    Convergence detection is a single scalar aggregate per round
    (labels are monotonically non-increasing, so ``sum(label)`` is a
    strictly decreasing potential until fixpoint) — no row-level diff
    join, no ``collect()`` of data.
    """
    # Persist the symmetrized edge list: it is joined once per round, and
    # its lineage (often an expensive candidate-pair computation, e.g. a
    # shingle inverted-index self-join) must not re-run every iteration.
    # DISK_ONLY: 2x the edge list (corpus-proportional), re-joined
    # once per round — must not hold executor heap for the whole loop.
    sym = persist_corpus(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
    )
    n_edges = sym.count()

    # Memory-first: one narrow row per node, rewritten and re-read
    # every round (storage.py policy).
    labels = nodes.select(
        F.col(id_col).alias("nid"), F.col(id_col).alias("label")
    ).persist()
    prev_sum = labels.agg(F.sum("label")).first()[0]

    for _ in range(max_iterations if n_edges else 0):
        # 1) each vertex takes the min of its own and its neighbors' labels
        nbr = sym.join(labels, sym.src == labels.nid).select(
            F.col("dst").alias("nid"), "label"
        )
        stepped = (
            labels.select("nid", "label")
            .union(nbr)
            .groupBy("nid")
            .agg(F.min("label").alias("label"))
        )
        # 2) path halving: label <- label(label).  Every label is itself a
        #    vertex id, so the self-join resolves one more pointer hop.
        a, b = stepped.alias("a"), stepped.alias("b")
        halved = a.join(b, F.col("a.label") == F.col("b.nid"), "left").select(
            F.col("a.nid").alias("nid"),
            F.coalesce(F.col("b.label"), F.col("a.label")).alias("label"),
        )
        # localCheckpoint (eager) materializes the round AND truncates the
        # logical plan — with persist() alone the plan tree doubles every
        # iteration and analysis/codegen cost (and driver heap) grows
        # exponentially with round count.
        halved = halved.localCheckpoint(eager=True)

        cur_sum = halved.agg(F.sum("label")).first()[0]
        labels.unpersist()
        labels = halved
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    sym.unpersist()
    return labels.select(F.col("nid").alias(id_col), F.col("label").alias("component"))


def resolve_roots(
    nodes: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    rounds: int = 5,
) -> DataFrame:
    """Hierarchy closure by pointer doubling: for every node of a
    parent-pointer forest, the root ancestor and the depth (edge count
    to that root), in ``rounds`` keyed self-joins.

    The reference's schema carries three such self-FK hierarchies —
    ``domains.parent_domain`` (reference:models.py:145-199),
    ``documents.part_of_larger_work`` (reference:models.py:18-37) and
    ``web_resources.is_archive_of`` (reference:models.py:42-141) — which
    its Postgres layer would walk with a recursive CTE.  A recursive CTE
    re-joins the FRONTIER once per LEVEL (depth-many sequential passes);
    pointer doubling squares the known-ancestor distance each round, so
    ``rounds`` iterations cover depth 2^rounds — 5 rounds close a
    32-level hierarchy, each round one hash-partitioned self-join on the
    current pointer (no global sort, no driver-side frontier).

    Roots are rows with NULL ``parent_col``.  Cycles are the caller's
    responsibility (a parent-pointer table with cycles is corrupt under
    the reference's FK semantics); nodes on a cycle keep a non-root
    pointer and are detectable as ``root_is_final = false``.
    """
    state = nodes.select(
        F.col(id_col).alias("nid"),
        F.coalesce(F.col(parent_col), F.col(id_col)).alias("ptr"),
        F.when(F.col(parent_col).isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("d"),
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        s, p = state.alias("s"), state.alias("p")
        state = s.join(p, F.col("s.ptr") == F.col("p.nid"), "left").select(
            F.col("s.nid").alias("nid"),
            F.coalesce(F.col("p.ptr"), F.col("s.ptr")).alias("ptr"),
            (F.col("s.d") + F.coalesce(F.col("p.d"), F.lit(0))).alias("d"),
        )
        # Same bounded-lineage discipline as connected_components.
        state = state.localCheckpoint(eager=True)
    return state.select(
        F.col("nid").alias(id_col),
        F.col("ptr").alias("root_id"),
        F.col("d").alias("depth"),
    )
