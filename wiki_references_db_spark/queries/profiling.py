"""Warehouse-operations queries: data profiling, snapshot-diff CDC,
incremental materialized-view maintenance, audience overlap, and
storage-layout (Z-order) locality — the operational layer a 100 TB
warehouse runs around its analytical queries.

The reference's operational layer is Postgres-era (ANALYZE, upserts,
index lifecycle — reference:load_all.py:533-588, reference:init_db.py:29-91);
these queries re-express the same operational needs as declarative,
engine-checked DataFrame plans.

Determinism rules are the module-wide ones (see queries/generic.py):
decimal-exact double sums, string-formatted timestamps, total-order
tie-breaks on every ranked output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wiki_references_db_spark.operators.zorder import (
    morton_interleave8,
    morton_interleave8_sql,
)
from wiki_references_db_spark.queries import register
from wiki_references_db_spark.queries.generic import _dsum, dsum
from wiki_references_db_spark.tables import load_table


# --------------------------------------------------------------------------
# Per-column table profile (the ANALYZE / data-profiling staple)
# --------------------------------------------------------------------------


# (column, null-safe min/max rendering) — doubles go through
# DECIMAL(18,4) so both engines print the identical fixed-scale string
# ('158960.4800'); timestamps are strftime'd; integers/strings cast
# directly.  One literal spec shared by the Spark and SQL builders.
_PROFILE_COLS = [
    ("o_orderkey", "CAST({m} AS {s})"),
    ("o_custkey", "CAST({m} AS {s})"),
    ("o_orderstatus", "CAST({m} AS {s})"),
    ("o_totalprice", "CAST(CAST({m} AS DECIMAL(18,4)) AS {s})"),
    ("o_orderdate", None),  # timestamp: engine-specific formatter
    ("o_orderpriority", "CAST({m} AS {s})"),
]


def _profile_oracle() -> str:
    parts = []
    for col, fmt in _PROFILE_COLS:
        if fmt is None:
            mn = f"strftime(MIN({col}), '%Y-%m-%d %H:%M:%S')"
            mx = f"strftime(MAX({col}), '%Y-%m-%d %H:%M:%S')"
        else:
            mn = fmt.format(m=f"MIN({col})", s="VARCHAR")
            mx = fmt.format(m=f"MAX({col})", s="VARCHAR")
        parts.append(
            f"""
    SELECT '{col}' AS column_name,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT({col}) AS n_nulls,
           COUNT(DISTINCT {col}) AS n_distinct,
           {mn} AS min_value,
           {mx} AS max_value
    FROM orders"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY column_name"


@register("table_profile_stats", oracle=_profile_oracle())
def table_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column table profile — row count, null count, exact distinct
    count, rendered min/max — one row per column: the ANALYZE-style
    statistics pass a warehouse runs to feed its optimizer and data
    monitors (the reference leaves this to Postgres ANALYZE /
    reference:init_db.py's index lifecycle).  Plan: one aggregate PER
    COLUMN over a column-pruned scan, unioned — total bytes read equal
    one full-table scan (each branch reads exactly its column), and the
    exact COUNT(DISTINCT) shuffles stay narrow and independent, instead
    of one combined aggregate whose multi-distinct Expand multiplies
    every row by the column count before the shuffle (measured 6x
    slower at sf0.1).  At 100 TB you'd swap approx_count_distinct into
    the same shape."""
    o = load_table(spark, sf_dir, "orders")
    parts = []
    for col, fmt in _PROFILE_COLS:
        if fmt is None:
            mn = F.date_format(F.min(col), "yyyy-MM-dd HH:mm:ss")
            mx = F.date_format(F.max(col), "yyyy-MM-dd HH:mm:ss")
        else:
            mn = F.expr(fmt.format(m=f"MIN({col})", s="STRING"))
            mx = F.expr(fmt.format(m=f"MAX({col})", s="STRING"))
        parts.append(
            o.select(col).agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
                F.count_distinct(F.col(col)).alias("n_distinct"),
                mn.alias("min_value"),
                mx.alias("max_value"),
            ).select(F.lit(col).alias("column_name"), "*")
        )
    prof = parts[0]
    for p in parts[1:]:
        prof = prof.unionByName(p)
    return prof.orderBy("column_name")


def _profile_approx_oracle() -> str:
    # The oracle is the EXACT profile plus a literal-TRUE verdict: the
    # value hash matches iff Spark's HLL++ estimate lands within 5% of
    # the exact distinct count for every column, on the driver, at
    # every SF — the accuracy contract as a hard cross-engine check
    # (raw HLL estimates are engine-specific and unhashable; the
    # verdict is engine-exact).
    parts = []
    for col, fmt in _PROFILE_COLS:
        if fmt is None:
            mn = f"strftime(MIN({col}), '%Y-%m-%d %H:%M:%S')"
            mx = f"strftime(MAX({col}), '%Y-%m-%d %H:%M:%S')"
        else:
            mn = fmt.format(m=f"MIN({col})", s="VARCHAR")
            mx = fmt.format(m=f"MAX({col})", s="VARCHAR")
        parts.append(
            f"""
    SELECT '{col}' AS column_name,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT({col}) AS n_nulls,
           COUNT(DISTINCT {col}) AS n_distinct,
           CAST(1 AS BIGINT) AS within_5pct_of_exact,
           {mn} AS min_value,
           {mx} AS max_value
    FROM orders"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY column_name"


@register("table_profile_stats_approx", oracle=_profile_approx_oracle())
def table_profile_stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB cardinality pass of ``table_profile_stats``, with its
    accuracy contract DRIVER-CHECKABLE (VERDICT r10 item 2): each
    per-column branch computes BOTH the exact ``COUNT(DISTINCT)`` and
    the ``approx_count_distinct`` HyperLogLog++ sketch (rsd=0.02) and
    emits, instead of the unhashable engine-specific raw estimate, the
    engine-exact verdict ``within_5pct_of_exact`` (1 iff
    \\|approx - exact\\| <= 5% of exact).  The oracle reproduces the
    exact profile and a literal 1, so the driver's value hash matches
    iff the sketch accuracy bound holds — at every SF, on every run.

    The production substitution drops the exact branch and keeps the
    sketch: same per-column union (each branch reads exactly its
    column), but the shuffle payload collapses from one row per
    distinct value to ONE fixed-size HLL buffer per partition
    (O(partitions x sketch_size); register-max merge, plain
    partial/final pair).  The registered form carries the exact branch
    so the 5% claim is hard evidence rather than prose — and each
    column runs its exact profile and its sketch as TWO SEPARATE
    narrow aggregates merged by a 1-row cross join, NOT one fused
    aggregate: planAggregateWithOneDistinct evaluates the co-resident
    non-distinct aggregates grouped BY the distinct column, which
    would ship one HLL buffer per distinct VALUE through the shuffle
    (measured 2.29 s / 3.1x-at-10x fused vs ~1.1 s split at sf0.1 —
    the split is just exact + sketch run side by side).  Expand-free
    either way (single distinct per aggregate); shape pinned by
    tests/test_profiling_approx.py.

    rsd is MEASURED, not defaulted: 0.01 needs 2^14 6-bit registers
    (1639-long buffers — 2.82 s for the 6-column union at sf0.1,
    interpreted-update bound), 0.04 breaks the 5% accuracy contract
    (measured 6.1% worst column), 0.02 (2^12 registers) holds worst
    error <=2.3% across sf0.001/0.01/0.1 at 0.79 s — the 5% verdict
    bound keeps >2x headroom."""
    o = load_table(spark, sf_dir, "orders")
    parts = []
    for col, fmt in _PROFILE_COLS:
        if fmt is None:
            mn = F.date_format(F.min(col), "yyyy-MM-dd HH:mm:ss")
            mx = F.date_format(F.max(col), "yyyy-MM-dd HH:mm:ss")
        else:
            mn = F.expr(fmt.format(m=f"MIN({col})", s="STRING"))
            mx = F.expr(fmt.format(m=f"MAX({col})", s="STRING"))
        exact = o.select(col).agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
            F.count_distinct(F.col(col)).alias("n_distinct"),
            mn.alias("min_value"),
            mx.alias("max_value"),
        )
        sketch = o.select(col).agg(
            F.approx_count_distinct(F.col(col), rsd=0.02).alias("_apx")
        )
        parts.append(
            exact.crossJoin(F.broadcast(sketch)).select(
                F.lit(col).alias("column_name"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                F.when(
                    F.abs(F.col("_apx") - F.col("n_distinct")).cast("double")
                    <= 0.05 * F.col("n_distinct"),
                    1,
                )
                .otherwise(0)
                .cast("long")
                .alias("within_5pct_of_exact"),
                "min_value",
                "max_value",
            )
        )
    prof = parts[0]
    for p in parts[1:]:
        prof = prof.unionByName(p)
    return prof.orderBy("column_name")


# --------------------------------------------------------------------------
# Numeric column correlation matrix (profiling's second pass)
# --------------------------------------------------------------------------


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_oracle() -> str:
    moments = [f"COUNT(*) AS n"]
    for c in _CORR_COLS:
        moments.append(f"{_dsum(c)} AS s_{c}")
        moments.append(f"{_dsum(f'{c} * {c}')} AS ss_{c}")
    pairs = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            moments.append(f"{_dsum(f'{a} * {b}')} AS sp_{a}_{b}")
            pairs.append(
                f"""
    SELECT '{a}' AS col_a, '{b}' AS col_b,
           (n * sp_{a}_{b} - s_{a} * s_{b})
             / sqrt((n * ss_{a} - s_{a} * s_{a})
                    * (n * ss_{b} - s_{b} * s_{b})) AS pearson_r
    FROM m"""
            )
    return (
        "WITH m AS (SELECT "
        + ", ".join(moments)
        + " FROM lineitem) "
        + " UNION ALL ".join(pairs)
        + " ORDER BY col_a, col_b"
    )


@register("numeric_corr_matrix", oracle=_corr_oracle())
def numeric_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation over the numeric lineitem columns —
    the profiling second pass that finds redundant / derived columns
    before schema design.  Exactness discipline: every moment (sum,
    sum-of-squares, cross product) accumulates in DECIMAL(28,10), so
    the shuffle-order-dependent association is exact; the final
    correlation is a FIXED expression tree over those exact doubles
    (*, -, /, sqrt — each correctly rounded IEEE), hence bit-identical
    cross-engine.  Plan: ONE scan, one 1-row aggregate carrying all
    moments, then a zero-shuffle unpivot — the corpus is read once no
    matter how many column pairs are profiled."""
    l = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _CORR_COLS:
        aggs.append(dsum(F.col(c)).alias(f"s_{c}"))
        aggs.append(dsum(F.col(c) * F.col(c)).alias(f"ss_{c}"))
    rows = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            aggs.append(dsum(F.col(a) * F.col(b)).alias(f"sp_{a}_{b}"))
            rows.append(
                f"'{a}', '{b}', (n * sp_{a}_{b} - s_{a} * s_{b}) "
                f"/ sqrt((n * ss_{a} - s_{a} * s_{a}) "
                f"* (n * ss_{b} - s_{b} * s_{b}))"
            )
    m = l.agg(*aggs)
    n_pairs = len(rows)
    return (
        m.select(
            F.expr(
                f"stack({n_pairs}, {', '.join(rows)}) AS (col_a, col_b, pearson_r)"
            )
        )
        .orderBy("col_a", "col_b")
    )


# --------------------------------------------------------------------------
# Key-skew diagnostic (the pre-join health check)
# --------------------------------------------------------------------------


@register(
    "key_skew_profile",
    oracle="""
    WITH per_key AS (
        SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY l_orderkey
    ),
    hist AS (
        -- floor(log2(n)) via the binary-digit count: integer-exact in
        -- both engines (float log2 can land an ulp under an integer on
        -- one engine and not the other).
        SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS count_log2_bucket,
               COUNT(*) AS n_keys,
               -- SUM(BIGINT) is HUGEINT in DuckDB -> pandas float;
               -- pin to BIGINT so the canonical form matches Spark's long
               CAST(SUM(n) AS BIGINT) AS n_rows
        FROM per_key GROUP BY count_log2_bucket
    ),
    tot AS (
        SELECT COUNT(*) AS total_keys, SUM(n) AS total_rows,
               MAX(n) AS max_key_rows
        FROM per_key
    )
    SELECT h.count_log2_bucket, h.n_keys, h.n_rows,
           CAST(t.max_key_rows * t.total_keys AS DOUBLE) / t.total_rows
             AS skew_factor
    FROM hist h CROSS JOIN tot t
    ORDER BY count_log2_bucket
    """,
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the distribution of per-key row counts
    (log2-bucketed histogram, computed integer-exactly as
    binary-digit-count minus one) plus the global skew factor
    (max-key-rows / mean-key-rows) — the health check run BEFORE a big
    join to decide between plain shuffle, AQE skew split, and manual
    salting (`operators/skew.py`).  Plan: one keyed count (map-side
    partial), a tiny histogram aggregate over the per-key table, and a
    1-row broadcast of the global stats; the skew factor is an exact
    integer rational."""
    l = load_table(spark, sf_dir, "lineitem")
    per_key = l.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    hist = per_key.groupBy(
        (F.length(F.bin(F.col("n"))) - 1)
        .cast("bigint")
        .alias("count_log2_bucket")
    ).agg(F.count(F.lit(1)).alias("n_keys"), F.sum("n").alias("n_rows"))
    tot = per_key.agg(
        F.count(F.lit(1)).alias("total_keys"),
        F.sum("n").alias("total_rows"),
        F.max("n").alias("max_key_rows"),
    )
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "count_log2_bucket",
            "n_keys",
            "n_rows",
            (
                (F.col("max_key_rows") * F.col("total_keys")).cast("double")
                / F.col("total_rows")
            ).alias("skew_factor"),
        )
        .orderBy("count_log2_bucket")
    )


# --------------------------------------------------------------------------
# Snapshot diff (CDC between two table versions)
# --------------------------------------------------------------------------


_CDC_OLD = "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0"
_CDC_NEW = """
SELECT o_orderkey, o_orderstatus,
       CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10.0
            ELSE o_totalprice END AS o_totalprice
FROM orders WHERE o_orderkey % 5 <> 0
"""


@register(
    "snapshot_diff_cdc",
    oracle=f"""
    WITH old AS ({_CDC_OLD}),
    new AS ({_CDC_NEW}),
    diff AS (
        SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'deleted'
                    WHEN n.o_totalprice <> o.o_totalprice
                      OR n.o_orderstatus <> o.o_orderstatus THEN 'changed'
                    ELSE 'unchanged' END AS change_type,
               COALESCE(n.o_totalprice, 0.0) - COALESCE(o.o_totalprice, 0.0)
                 AS price_delta
        FROM old o FULL OUTER JOIN new n ON n.o_orderkey = o.o_orderkey
    )
    SELECT change_type, COUNT(*) AS n, {_dsum('price_delta')} AS total_price_delta
    FROM diff GROUP BY change_type ORDER BY change_type
    """,
)
def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two snapshots of the same table:
    a full outer join on the key classifies every row added / deleted /
    changed / unchanged and aggregates the net price movement per
    class — the audit query run after every incremental load (the
    reference's load phase answers the same question row-by-row through
    ON CONFLICT upserts, reference:models.py:126-141; here it is one
    set-oriented diff).  The two snapshots are deterministic slices of
    ``orders`` (old: key%7!=0; new: key%5!=0 with key%3==0 prices
    bumped), so the diff exercises all four classes.  Plan: one
    shuffle on the join key; the classifier and the decimal-exact delta
    sum are pure column expressions."""
    o = load_table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 10.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    joined = old.alias("o").join(
        new.alias("n"),
        F.col("n.o_orderkey") == F.col("o.o_orderkey"),
        "full_outer",
    )
    diff = joined.select(
        F.when(F.col("o.o_orderkey").isNull(), "added")
        .when(F.col("n.o_orderkey").isNull(), "deleted")
        .when(
            (F.col("n.o_totalprice") != F.col("o.o_totalprice"))
            | (F.col("n.o_orderstatus") != F.col("o.o_orderstatus")),
            "changed",
        )
        .otherwise("unchanged")
        .alias("change_type"),
        (
            F.coalesce(F.col("n.o_totalprice"), F.lit(0.0))
            - F.coalesce(F.col("o.o_totalprice"), F.lit(0.0))
        ).alias("price_delta"),
    )
    return (
        diff.groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("price_delta")).alias("total_price_delta"),
        )
        .orderBy("change_type")
    )


# --------------------------------------------------------------------------
# Incremental materialized-view maintenance (partial-aggregate merge)
# --------------------------------------------------------------------------


_MV_SPLIT = "2024-01-16 00:00:00"


@register(
    "incremental_agg_merge",
    # The oracle recomputes the view in ONE pass; the Spark side builds
    # it from two partial aggregates merged — value-identical because
    # counts are additive and the decimal sums associate exactly.
    oracle=f"""
    SELECT event_type, COUNT(*) AS n_events,
           {_dsum('value')} AS total_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the per-type event
    aggregate is built as base-partial (ts < {split}) plus
    delta-partial (ts >= {split}) merged by re-aggregation — the
    refresh path that processes ONLY the new partition at each load
    instead of rescanning the corpus, exact because COUNT partials add
    and DECIMAL(28,10) partial sums associate exactly (double sums
    would drift under re-association; that is WHY the merge runs in
    decimal and casts to double only at the very end).  The oracle
    recomputes the view in one pass over all events, so the hash match
    PROVES merge == recompute.  At 100 TB the base partial is a stored
    table and each refresh touches one day of data."""
    e = load_table(spark, sf_dir, "events")
    split = F.lit(_MV_SPLIT).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)")).alias("sum_dec"),
        )

    base = partial(e.filter(F.col("ts") < split))
    delta = partial(e.filter(F.col("ts") >= split))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_dec").alias("sum_dec"),
        )
    )
    return merged.select(
        "event_type",
        "n_events",
        # Match _dsum's VARCHAR hop: decimal -> string -> double is
        # correctly rounded in both engines.
        F.col("sum_dec").cast("string").cast("double").alias("total_value"),
    ).orderBy("event_type")


incremental_agg_merge.__doc__ = incremental_agg_merge.__doc__.replace(
    "{split}", _MV_SPLIT
)


# --------------------------------------------------------------------------
# Audience overlap (pairwise Jaccard between event-type user sets)
# --------------------------------------------------------------------------


@register(
    "audience_overlap_jaccard",
    oracle="""
    WITH aud AS (
        SELECT DISTINCT event_type, user_id FROM events
    ),
    sizes AS (
        SELECT event_type, COUNT(*) AS n_users FROM aud GROUP BY event_type
    ),
    overlap AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS n_overlap
        FROM aud a JOIN aud b
          ON b.user_id = a.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT o.type_a, o.type_b, sa.n_users AS n_a, sb.n_users AS n_b,
           o.n_overlap,
           CAST(o.n_overlap AS DOUBLE)
             / (sa.n_users + sb.n_users - o.n_overlap) AS jaccard
    FROM overlap o
    JOIN sizes sa ON sa.event_type = o.type_a
    JOIN sizes sb ON sb.event_type = o.type_b
    ORDER BY type_a, type_b
    """,
)
def audience_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap: the Jaccard similarity between the
    distinct-user sets of every event-type pair — the
    segment-similarity matrix audience tooling is built on.  Plan: one
    distinct (type, user) projection, then a self equi-join ON user_id
    — per-user fan-out is bounded by the (tiny) number of event types,
    so the worst bucket is T^2 rows per user regardless of corpus
    size; the Jaccard is an exact integer rational, bit-identical in
    both engines."""
    e = load_table(spark, sf_dir, "events")
    aud = e.select("event_type", "user_id").distinct()
    sizes = aud.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))
    a = aud.alias("a")
    b = aud.alias("b")
    overlap = (
        a.join(
            b,
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        overlap.join(
            sizes.select(
                F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a")
            ),
            "type_a",
        )
        .join(
            sizes.select(
                F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b")
            ),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_overlap",
            (
                F.col("n_overlap").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_overlap"))
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


# --------------------------------------------------------------------------
# Z-order (Morton) storage-layout locality codes
# --------------------------------------------------------------------------


@register(
    "zorder_morton_codes",
    oracle=f"""
    WITH coded AS (
        SELECT {morton_interleave8_sql('o_custkey % 256', "epoch(o_orderdate) // 86400 % 256")}
               AS morton
        FROM orders
    )
    SELECT morton // 64 AS z_block, COUNT(*) AS n,
           MIN(morton) AS min_code, MAX(morton) AS max_code
    FROM coded GROUP BY z_block ORDER BY z_block
    """,
)
def zorder_morton_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) codes over two clustering dimensions
    (customer, order day): interleaving the bit patterns linearizes the
    2-D key space so that sorting by the code co-locates rows close in
    BOTH dimensions — the write-time layout that lets parquet row-group
    min/max stats prune 2-D range predicates (the multi-dimensional
    generalization of the reference's sort-for-data-skipping,
    reference:init_db.py:29-40 index lifecycle).  The interleave is a
    fixed 16-term shift/mask expression — pure JVM codegen, zero
    shuffle before the block aggregate.  `operators/zorder.py` carries
    the write path; `tests/test_zorder.py` proves the locality (block
    bounding boxes shrink vs linear order)."""
    o = load_table(spark, sf_dir, "orders")
    x = (F.col("o_custkey") % 256).cast("long")
    y = (
        (F.unix_timestamp(F.col("o_orderdate")) / F.lit(86400)).cast("long") % 256
    )
    coded = o.select(morton_interleave8(x, y).alias("morton"))
    return (
        coded.groupBy((F.floor(F.col("morton") / 64)).alias("z_block"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("morton").alias("min_code"),
            F.max("morton").alias("max_code"),
        )
        .orderBy("z_block")
    )


# --------------------------------------------------------------------------
# Importance-weighted sampling (per-row quality weight, seedless)
# --------------------------------------------------------------------------


def _hex16(md5_expr: str, pos_fn: str) -> str:
    """First 16 bits of an md5 hex string as an integer, via hex-digit
    position lookup (``pos_fn``: DuckDB strpos / Spark instr)."""
    terms = []
    for i, mult in enumerate((4096, 256, 16, 1)):
        terms.append(
            f"{mult} * ({pos_fn}('0123456789abcdef', "
            f"substr({md5_expr}, {i + 1}, 1)) - 1)"
        )
    return "(" + " + ".join(terms) + ")"


_IWS_W = "greatest(0.05, least(1.0, n_chars / 2000.0))"
_IWS_MD5_SQL = "md5(CAST(doc_id AS VARCHAR))"
_IWS_MD5_SPARK = "md5(CAST(doc_id AS STRING))"


@register(
    "importance_weighted_sample",
    oracle=f"""
    WITH scored AS (
        SELECT lang,
               {_IWS_W} AS w,
               {_hex16(_IWS_MD5_SQL, 'strpos')} AS h16
        FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN h16 < CAST(floor(w * 65536) AS BIGINT)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           {_dsum('w')} AS expected_keep
    FROM scored GROUP BY lang ORDER BY lang
    """,
)
def importance_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted corpus sampling: every document keeps with
    probability proportional to its own quality weight (here a length
    proxy clamped to [0.05, 1]) — the per-ROW generalization of
    ``corpus_mix_rebalance``'s per-group rates, i.e. the
    quality-weighted data-mixing step of a pretraining pipeline.
    Seedless and reproducible: keep iff the first 16 bits of
    md5(doc_id) fall below floor(w * 65536) — the same document is kept
    on every engine, every rerun, every partitioning.  Plan: pure
    map-side filter arithmetic plus one keyed aggregate; the reported
    ``expected_keep`` (decimal-exact sum of weights) sits next to
    ``n_kept`` as the sanity check that the realized rate tracks the
    target."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "lang",
        F.expr(_IWS_W).alias("w"),
        F.expr(_hex16(_IWS_MD5_SPARK, "instr")).alias("h16"),
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (F.col("h16") < F.floor(F.col("w") * 65536).cast("bigint")).cast(
                    "int"
                )
            )
            .cast("bigint")
            .alias("n_kept"),
            dsum(F.col("w")).alias("expected_keep"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Equi-depth histogram (exact, P-way parallel global order)
# --------------------------------------------------------------------------


@register(
    "events_equidepth_histogram",
    oracle="""
    WITH ranked AS (
        -- NULL values are excluded: Spark orders NULLs first ASC,
        -- DuckDB last, so any NULL in the rank order would shift every
        -- bucket; a value histogram has no bucket for "no value".
        SELECT value,
               NTILE(10) OVER (ORDER BY value, event_id) AS bucket
        FROM events WHERE value IS NOT NULL
    )
    SELECT bucket, COUNT(*) AS n_events,
           MIN(value) AS lo, MAX(value) AS hi
    FROM ranked GROUP BY bucket ORDER BY bucket
    """,
)
def events_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-FREQUENCY histogram of event values: ten buckets holding
    the same row count, with each bucket's exact value range — the
    equi-depth profile optimizers and drift monitors prefer over
    equal-width bins on skewed data (complement of
    ``events_value_histogram``).  The bucketing is exact global NTILE —
    but via ``operators/ordered.ntile_over`` (range partition +
    closed-form buckets), NOT a bare global window: the sort stays
    P-way parallel at any corpus size while remaining bit-identical to
    the oracle's built-in NTILE."""
    from wiki_references_db_spark.operators.ordered import ntile_over

    e = (
        load_table(spark, sf_dir, "events")
        .select("value", "event_id")
        .filter(F.col("value").isNotNull())
    )
    b = ntile_over(e, [F.asc("value"), F.asc("event_id")], 10, "bucket")
    return (
        b.groupBy(F.col("bucket").cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# GDPR-style cascade-delete impact (FK DAG traversal, reverse of U5)
# --------------------------------------------------------------------------


@register(
    "cascade_delete_impact",
    oracle="""
    WITH del_cust AS (
        SELECT c_custkey FROM customer WHERE c_nationkey = 3
    ),
    del_orders AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM del_cust)
    ),
    del_lineitem AS (
        SELECT l_orderkey FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders)
    )
    SELECT 'customer' AS table_name, COUNT(*) AS n_rows FROM del_cust
    UNION ALL
    SELECT 'orders', COUNT(*) FROM del_orders
    UNION ALL
    SELECT 'lineitem', COUNT(*) FROM del_lineitem
    """,
)
def cascade_delete_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten impact report: a deletion set on the root
    entity (customers of one nation) propagated down the FK DAG
    (customer -> orders -> lineitem) via semi-joins, reporting affected
    row counts per table — the pre-flight audit every GDPR deletion run
    needs, and the reverse traversal of the warehouse build's U5
    FK-ordered phases (plans/warehouse.py, reference:models.py FK
    graph).

    Scale: each hop is a semi-join keyed on the FK; the deletion key
    set is typically small enough to broadcast, making the whole
    cascade map-only — the plan below leaves the choice to AQE so a
    huge deletion set degrades to a shuffle semi-join instead of an
    OOM."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    del_cust = cust.filter(F.col("c_nationkey") == 3).select("c_custkey")
    del_orders = orders.join(
        del_cust, orders.o_custkey == del_cust.c_custkey, "left_semi"
    ).select("o_orderkey")
    del_li = li.join(
        del_orders, li.l_orderkey == del_orders.o_orderkey, "left_semi"
    ).select("l_orderkey")
    counts = [
        del_cust.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit("customer").alias("table_name"), "n_rows"
        ),
        del_orders.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit("orders").alias("table_name"), "n_rows"
        ),
        del_li.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit("lineitem").alias("table_name"), "n_rows"
        ),
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


# --------------------------------------------------------------------------
# Multi-feature OLS via one-pass distributed normal equations
# --------------------------------------------------------------------------

# One formula text shared verbatim by the Spark and DuckDB plans: +,-,*,/
# over exact-moment doubles are IEEE correctly-rounded in both engines, so
# an IDENTICAL expression tree guarantees bit-identical coefficients.
# The moments are accumulated in the SCALED-INTEGER domain (quantity is
# integral; discount and price are exact 2-decimal values, so d_c = 100*d
# and y_c = 100*y are exact bigints): every sum is a plain LONG sum —
# measured 22x faster than DECIMAL(28,10) accumulation in Spark, whose
# >18-digit decimal buffer falls off the compact long-backed path — and
# an exact integer needs no cross-engine float discipline at all.  The
# one overflow risk, syy_c = sum(y_c^2) (~6.6e19 at sf0.1 > int64), is
# split via y_c = 1e4*y_hi + y_lo into three long sums (each with
# headroom past 1e11 rows; add one more split level beyond that) and
# recombined exactly in one 1-row decimal expression.  The Cramer solve
# runs on the scaled moments; the final betas unscale by the exact
# power-of-100 factors (y and d both scaled by 100: intercept and the
# quantity slope divide by 100, the discount slope and R^2 are invariant).
# 3x3 Cramer expansions for A*beta = b with
#   A = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]],  b = [sy, s1y, s2y].
_OLS_DET = (
    "n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)"
    " + s2 * (s1 * s12 - s11 * s2)"
)
_OLS_DET0 = (
    "sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)"
    " + s2 * (s1y * s12 - s11 * s2y)"
)
_OLS_DET1 = (
    "n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)"
    " + s2 * (s1 * s2y - s1y * s2)"
)
_OLS_DET2 = (
    "n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)"
    " + sy * (s1 * s12 - s11 * s2)"
)
_OLS_FIT = (
    "SELECT CAST(n AS BIGINT) AS n_rows, "
    "(det0 / det) / 100 AS beta_intercept, "
    "(det1 / det) / 100 AS beta_quantity, "
    "det2 / det AS beta_discount, "
    "1 - (syy - ((det0 / det) * sy + (det1 / det) * s1y"
    " + (det2 / det) * s2y)) / (syy - sy * sy / n) AS r_squared "
)

# Scaled-integer pre-projection and the moment aggregate, shared as text
# (dialect-neutral): q integral, d in exact basis points (x100), y in
# exact cents (x100), y split for the sum-of-squares.
_OLS_PRE = (
    "SELECT CAST(l_quantity AS BIGINT) AS q, "
    "CAST(ROUND(l_discount * 100) AS BIGINT) AS d, "
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y "
    "FROM lineitem"
)
_OLS_MOMENTS = (
    "SELECT CAST(COUNT(*) AS DOUBLE) AS n, "
    "SUM(q) AS ls1, SUM(d) AS ls2, "
    "SUM(q * q) AS ls11, SUM(q * d) AS ls12, SUM(d * d) AS ls22, "
    "SUM(y) AS lsy, SUM(q * y) AS ls1y, SUM(d * y) AS ls2y, "
    "SUM((y {idiv} 10000) * (y {idiv} 10000)) AS shh, "
    "SUM((y {idiv} 10000) * (y % 10000)) AS shl, "
    "SUM((y % 10000) * (y % 10000)) AS sll"
)
# Exact recombination + int->double conversions (both correctly rounded
# and hence engine-identical); syy goes through a wide-decimal string so
# the >2^53 integer is parsed to double rather than accumulated in it.
_OLS_WIDEN = (
    "SELECT n, "
    "CAST(ls1 AS DOUBLE) AS s1, CAST(ls2 AS DOUBLE) AS s2, "
    "CAST(ls11 AS DOUBLE) AS s11, CAST(ls12 AS DOUBLE) AS s12, "
    "CAST(ls22 AS DOUBLE) AS s22, CAST(lsy AS DOUBLE) AS sy, "
    "CAST(ls1y AS DOUBLE) AS s1y, CAST(ls2y AS DOUBLE) AS s2y, "
    "CAST(CAST(CAST(shh AS DECIMAL(38, 0)) * 100000000"
    " + CAST(shl AS DECIMAL(38, 0)) * 20000"
    " + CAST(sll AS DECIMAL(38, 0)) AS {vc}) AS DOUBLE) AS syy"
)


def _ols_oracle() -> str:
    return f"""
    WITH pre AS ({_OLS_PRE}),
    lm AS ({_OLS_MOMENTS.format(idiv='//')} FROM pre),
    m AS ({_OLS_WIDEN.format(vc='VARCHAR')} FROM lm),
    d AS (
        SELECT *, ({_OLS_DET}) AS det, ({_OLS_DET0}) AS det0,
               ({_OLS_DET1}) AS det1, ({_OLS_DET2}) AS det2
        FROM m
    )
    {_OLS_FIT}
    FROM d
    """


@register("ols_normal_equations", oracle=_ols_oracle())
def ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-feature linear regression (l_extendedprice ~ intercept +
    l_quantity + l_discount) solved in CLOSED FORM by distributed normal
    equations — the one-pass OLS every feature-importance / leakage
    screen in a training-data pipeline runs before anything iterative:
    one scan accumulates the 10 Gram-matrix moments, the 3x3 system is
    solved by Cramer's rule, and R-squared falls out of the same
    moments (SSE = yTy - betaT XTy).

    Exactness discipline: every moment is an EXACT INTEGER in the
    scaled domain (see the _OLS_PRE note: quantity integral, discount
    in basis points, price in cents — verified exact 2-decimal in the
    generator's data), accumulated as plain LONG sums (22x faster than
    the decimal path a first cut used, whose >18-digit buffer falls off
    Spark's compact long-backed decimal), with sum(y_c^2) split hi/lo to
    stay inside int64; the solve is a FIXED expression tree shared as
    literal text with the oracle — since the moments are identical
    integers and int->double conversion is correctly rounded, the
    coefficients are bit-identical cross-engine with no float-order
    discipline needed anywhere in the aggregate.

    Scale shape: the Gram matrix IS the shuffle payload — a single
    map-side-combinable 1-row aggregate (12 longs per partition, then
    12 longs total) no matter how many rows the fact table has; the
    solve is O(k^3) on that one row with k=3.  This is the textbook
    reason normal equations beat gradient descent at 100 TB for small
    k: one pass, zero iterations, no driver-side math at all."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_ols_lineitem")
    pre = spark.sql(_OLS_PRE.replace("FROM lineitem", "FROM _ols_lineitem"))
    pre.createOrReplaceTempView("_ols_pre")
    lm = spark.sql(_OLS_MOMENTS.format(idiv="div") + " FROM _ols_pre")
    lm.createOrReplaceTempView("_ols_lm")
    m = spark.sql(_OLS_WIDEN.format(vc="STRING") + " FROM _ols_lm")
    d = m.selectExpr(
        "*",
        f"({_OLS_DET}) AS det",
        f"({_OLS_DET0}) AS det0",
        f"({_OLS_DET1}) AS det1",
        f"({_OLS_DET2}) AS det2",
    )
    d.createOrReplaceTempView("_ols_moments")
    return spark.sql(_OLS_FIT + " FROM _ols_moments")


# --------------------------------------------------------------------------
# Grouped OLS: one regression PER SEGMENT from the same single scan
# --------------------------------------------------------------------------

# The same shared texts, group-keyed: prefix every SELECT with the key
# column and aggregate per group.  This is the point of the
# moments-as-payload design — fitting one model or ten thousand is the
# SAME one-pass plan, with the shuffle payload growing only by
# (12 longs x groups).
_OLSG_KEY = "l_returnflag"


def _olsg(text: str) -> str:
    return text.replace("SELECT ", f"SELECT {_OLSG_KEY}, ", 1)


@register(
    "ols_per_group",
    oracle=f"""
    WITH pre AS ({_olsg(_OLS_PRE)}),
    lm AS ({_olsg(_OLS_MOMENTS.format(idiv='//'))} FROM pre
           GROUP BY {_OLSG_KEY}),
    m AS ({_olsg(_OLS_WIDEN.format(vc='VARCHAR'))} FROM lm),
    d AS (
        SELECT *, ({_OLS_DET}) AS det, ({_OLS_DET0}) AS det0,
               ({_OLS_DET1}) AS det1, ({_OLS_DET2}) AS det2
        FROM m
    )
    {_olsg(_OLS_FIT)}
    FROM d ORDER BY {_OLSG_KEY}
    """,
)
def ols_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One OLS fit PER SEGMENT (return flag) from a single scan — the
    fit-10k-models-at-once pattern every per-segment calibration /
    leakage screen in a training pipeline needs: the grouped Gram
    moments are the only stream-sized work (map-side-combined long
    sums, 12 longs per group in the shuffle), and each group's 3x3
    Cramer solve is a per-row expression over its one moment row.
    Identical exactness argument to ols_normal_equations (exact
    scaled-integer moments; shared literal solve text); the grouped
    form demonstrates that closed-form distributed OLS costs the same
    one pass whether fitting one model or one per group."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_olsg_lineitem")
    pre = spark.sql(
        _olsg(_OLS_PRE).replace("FROM lineitem", "FROM _olsg_lineitem")
    )
    pre.createOrReplaceTempView("_olsg_pre")
    lm = spark.sql(
        _olsg(_OLS_MOMENTS.format(idiv="div"))
        + f" FROM _olsg_pre GROUP BY {_OLSG_KEY}"
    )
    lm.createOrReplaceTempView("_olsg_lm")
    m = spark.sql(_olsg(_OLS_WIDEN.format(vc="STRING")) + " FROM _olsg_lm")
    d = m.selectExpr(
        "*",
        f"({_OLS_DET}) AS det",
        f"({_OLS_DET0}) AS det0",
        f"({_OLS_DET1}) AS det1",
        f"({_OLS_DET2}) AS det2",
    )
    d.createOrReplaceTempView("_olsg_moments")
    return spark.sql(
        _olsg(_OLS_FIT) + f" FROM _olsg_moments ORDER BY {_OLSG_KEY}"
    )


# --------------------------------------------------------------------------
# Join-cardinality estimation from per-side key histograms (planner stat)
# --------------------------------------------------------------------------


def _card_sql(pair: str, lt: str, lk: str, rt: str, rk: str) -> str:
    return f"""
    SELECT '{pair}' AS join_pair,
           CAST(COUNT(lc) AS BIGINT) AS n_keys_left,
           CAST(COUNT(rc) AS BIGINT) AS n_keys_right,
           CAST(COUNT(CASE WHEN lc IS NOT NULL AND rc IS NOT NULL
                           THEN 1 END) AS BIGINT) AS n_keys_matched,
           CAST(COALESCE(SUM(lc * rc), 0) AS BIGINT) AS join_rows,
           CAST(COALESCE(MAX(lc * rc), 0) AS BIGINT) AS max_key_rows
    FROM (SELECT {lk} AS k, COUNT(*) AS lc FROM {lt} GROUP BY 1) l
    FULL OUTER JOIN
         (SELECT {rk} AS k, COUNT(*) AS rc FROM {rt} GROUP BY 1) r
    USING (k)
    """


_CARD_PAIRS = [
    ("customer*orders", "customer", "c_custkey", "orders", "o_custkey"),
    ("orders*lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
]


@register(
    "join_cardinality_stats",
    oracle=" UNION ALL ".join(_card_sql(*p) for p in _CARD_PAIRS)
    + " ORDER BY join_pair",
)
def join_cardinality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact join-output cardinality and skew profile WITHOUT running
    the join: |A JOIN B on k| = SUM over matched keys of cA(k)*cB(k),
    from the two per-side key histograms — the statistic a planner (or
    a pre-flight data-quality gate) needs before committing to a 100 TB
    shuffle, plus the hottest key's output contribution (max cA*cB),
    the direct read on whether AQE skew-split or salting will be needed.

    Scale shape: per-side map-side-combined COUNT per key (each far
    smaller than its table), one narrow FULL OUTER merge of the two
    histograms on the key, one global fold to a single row per pair.
    The candidate 100 TB join itself is never executed or shuffled.
    """
    rows = []
    for pair, lt, lk, rt, rk in _CARD_PAIRS:
        left = (
            load_table(spark, sf_dir, lt)
            .groupBy(F.col(lk).alias("k"))
            .agg(F.count(F.lit(1)).alias("lc"))
        )
        right = (
            load_table(spark, sf_dir, rt)
            .groupBy(F.col(rk).alias("k"))
            .agg(F.count(F.lit(1)).alias("rc"))
        )
        both = left.join(right, "k", "full")
        matched = F.col("lc").isNotNull() & F.col("rc").isNotNull()
        rows.append(
            both.agg(
                F.count("lc").cast("long").alias("n_keys_left"),
                F.count("rc").cast("long").alias("n_keys_right"),
                F.count(F.when(matched, F.lit(1))).cast("long").alias(
                    "n_keys_matched"
                ),
                F.coalesce(F.sum(F.col("lc") * F.col("rc")), F.lit(0))
                .cast("long")
                .alias("join_rows"),
                F.coalesce(F.max(F.col("lc") * F.col("rc")), F.lit(0))
                .cast("long")
                .alias("max_key_rows"),
            ).select(F.lit(pair).alias("join_pair"), "*")
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("join_pair")


# --------------------------------------------------------------------------
# Hive-partitioned layout roundtrip + partition-pruned read (S-family)
# --------------------------------------------------------------------------


@register(
    "partitioned_layout_prune_stats",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custkeys,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100 AS total_price
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderpriority
    """,
)
def partitioned_layout_prune_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hive-partitioned parquet layout, value-checked as a roundtrip:
    rewrite orders PARTITIONED BY order priority
    (``.../o_orderpriority=X/part-*.parquet``), read the layout back
    with a filter on the partition column, and aggregate — equal to the
    same aggregate over the unpartitioned source iff the partitioned
    write+read is lossless.  This is the storage-layout S-family
    facility the other sinks don't cover: at 100 TB, partitioning by a
    low-cardinality predicate column means a query like this one opens
    1/5th of the files — the read plan carries the predicate as a
    PartitionFilter (directory pruning, zero data files of other
    partitions touched; pinned by tests/test_plan_shapes.py), which is
    free with a declarative filter on the partition column.  The money
    sum uses the exact-cents long-sum discipline (one shared /100 at
    the end), so the value hash is bit-stable cross-engine."""
    import os
    import shutil
    import tempfile

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    lay_dir = os.path.join(
        tempfile.gettempdir(),
        "wikirefs_partlayout_"
        + os.path.basename(os.path.normpath(sf_dir)),
    )
    shutil.rmtree(lay_dir, ignore_errors=True)
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(lay_dir)
    # Explicit schema (the written frame's own, partition column
    # included): an EMPTY corpus writes a layout with zero partition
    # directories, and schema inference has nothing to read.
    back = spark.read.schema(o.schema).parquet(lay_dir).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").cast("long").alias("n_custkeys"),
        (
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).cast("double")
            / 100
        ).alias("total_price"),
    )


@register(
    "dynamic_partition_pruning_stats",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100 AS total_price
    FROM orders o
    JOIN (SELECT DISTINCT o_orderpriority FROM orders
          WHERE o_orderstatus = 'F'
            AND o_orderpriority < '3-MEDIUM') d
      ON d.o_orderpriority = o.o_orderpriority
    GROUP BY o.o_orderpriority
    """,
)
def dynamic_partition_pruning_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DYNAMIC partition pruning over the hive-partitioned layout: the
    fact side carries NO static predicate on the partition column — the
    selective filter lives on a dimension frame, and Catalyst injects
    the dim's partition-key set into the fact scan at runtime
    (``dynamicpruningexpression`` in the scan's PartitionFilters,
    pinned by tests/test_plan_shapes.py; it reuses the join's broadcast
    rather than scanning the dim twice).  This is the facility that
    makes star-schema joins over a date/tenant-partitioned 100 TB fact
    table read only the joined partitions — the static-pruning sibling
    of partitioned_layout_prune_stats.  Money sums in exact cents, one
    shared /100 at the end."""
    import os
    import shutil
    import tempfile

    o = load_table(spark, sf_dir, "orders")
    lay_dir = os.path.join(
        tempfile.gettempdir(),
        "wikirefs_dpplayout_" + os.path.basename(os.path.normpath(sf_dir)),
    )
    shutil.rmtree(lay_dir, ignore_errors=True)
    sel = o.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    sel.write.mode("overwrite").partitionBy("o_orderpriority").parquet(lay_dir)
    # Explicit schema: an empty corpus writes zero partition
    # directories, leaving inference nothing to read (see
    # partitioned_layout_prune_stats).
    fact = spark.read.schema(sel.schema).parquet(lay_dir)
    dim = (
        o.filter(
            (F.col("o_orderstatus") == "F")
            & (F.col("o_orderpriority") < "3-MEDIUM")
        )
        .select("o_orderpriority")
        .distinct()
    )
    return (
        fact.join(F.broadcast(dim), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                ).cast("double")
                / 100
            ).alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# Hand-rolled runtime Bloom pre-filter for a selective join (row-level
# sibling of dynamic partition pruning)
# --------------------------------------------------------------------------

_BPF_K = 4  # hash functions: md5 byte pairs 0..3 -> 16-bit positions


def _bpf_pos(engine: str, j: int, key: str) -> str:
    """16-bit Bloom position j for ``key``: md5 byte pair j as an int
    0..65535 (m = 65536 bits, so the byte-pair value IS the position)."""
    fn = "instr" if engine == "spark" else "strpos"
    sub = "substring" if engine == "spark" else "substr"
    nib = f"({fn}('0123456789abcdef', {sub}(md5({key}), {{p}}, 1)) - 1)"
    b_hi = f"(16 * {nib.format(p=4 * j + 1)} + {nib.format(p=4 * j + 2)})"
    b_lo = f"(16 * {nib.format(p=4 * j + 3)} + {nib.format(p=4 * j + 4)})"
    return f"({b_hi} * 256 + {b_lo})"


@register(
    "bloom_prefilter_join_stats",
    oracle=f"""
    WITH members AS (
        SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-03-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
    ),
    bits AS (
        {" UNION ".join(
            f"SELECT DISTINCT {_bpf_pos('sql', j, 'k')} AS pos FROM members"
            for j in range(_BPF_K)
        )}
    ),
    probe AS (
        SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem
    ),
    flags AS (
        SELECT ({" AND ".join(
                   f"EXISTS(SELECT 1 FROM bits b"
                   f" WHERE b.pos = {_bpf_pos('sql', j, 'p.k')})"
                   for j in range(_BPF_K)
               )}) AS pass_bloom,
               EXISTS(SELECT 1 FROM members m WHERE m.k = p.k) AS matched
        FROM probe p
    )
    SELECT COUNT(*) AS n_fact,
           CAST(SUM(CASE WHEN pass_bloom THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass_bloom,
           CAST(SUM(CASE WHEN matched THEN 1 ELSE 0 END) AS BIGINT)
               AS n_matched,
           CAST(SUM(CASE WHEN pass_bloom AND NOT matched THEN 1 ELSE 0 END)
               AS BIGINT) AS n_false_pass,
           CAST(SUM(CASE WHEN pass_bloom AND NOT matched THEN 1 ELSE 0 END)
               AS DOUBLE)
             / (COUNT(*) - CAST(SUM(CASE WHEN matched THEN 1 ELSE 0 END)
                                AS BIGINT)) AS fp_rate
    FROM flags
    """,
)
def bloom_prefilter_join_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hand-rolled RUNTIME BLOOM FILTER for a selective fact⨝dim join —
    the row-level sibling of dynamic_partition_pruning_stats: the
    selective dim (one order-month, ~1% of orders) builds a 65536-bit
    k=4 Bloom set (explode to bit positions + distinct — shard merge is
    set union, exactly the mergeable-sketch discipline), the fact side
    probes it BEFORE the join, and the report quantifies what the
    pre-filter would save: rows passing the bloom vs rows actually
    matching, false-pass count, and the measured false-positive rate
    (~(q)^4 at bit density q; false negatives structurally impossible).
    At 100 TB this is the filter a shuffle join ships to the fact scan
    to skip non-matching rows before the exchange — Spark's own
    runtime-bloom injection does precisely this when thresholds allow;
    building it as data keeps it deterministic and oracle-checkable.
    Integer arithmetic end to end; the one fp-rate division is a shared
    expression tree."""
    o = load_table(spark, sf_dir, "orders")
    members = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    ).select(F.col("o_orderkey").cast("string").alias("k"))
    bits = None
    for j in range(_BPF_K):
        b = members.select(F.expr(_bpf_pos("spark", j, "k")).alias("pos"))
        bits = b if bits is None else bits.unionByName(b)
    bits = bits.distinct()
    probe = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("string").alias("k")
    )
    flags = probe
    for j in range(_BPF_K):
        bj = bits.select(F.col("pos").alias(f"pos{j}")).withColumn(
            f"hit{j}", F.lit(True)
        )
        flags = flags.withColumn(
            f"p{j}", F.expr(_bpf_pos("spark", j, "k"))
        ).join(F.broadcast(bj), F.col(f"p{j}") == F.col(f"pos{j}"), "left")
    members_flag = members.select(
        F.col("k").alias("mk"), F.lit(True).alias("matched")
    )
    flags = flags.join(
        F.broadcast(members_flag), F.col("k") == F.col("mk"), "left"
    ).select(
        (
            F.coalesce("hit0", F.lit(False))
            & F.coalesce("hit1", F.lit(False))
            & F.coalesce("hit2", F.lit(False))
            & F.coalesce("hit3", F.lit(False))
        ).alias("pass_bloom"),
        F.coalesce("matched", F.lit(False)).alias("matched"),
    )
    n_false = F.sum(
        F.when(F.col("pass_bloom") & ~F.col("matched"), 1).otherwise(0)
    ).cast("long")
    n_matched = F.sum(F.when(F.col("matched"), 1).otherwise(0)).cast("long")
    return flags.agg(
        F.count(F.lit(1)).alias("n_fact"),
        F.sum(F.when(F.col("pass_bloom"), 1).otherwise(0))
        .cast("long")
        .alias("n_pass_bloom"),
        n_matched.alias("n_matched"),
        n_false.alias("n_false_pass"),
        (
            n_false.cast("double") / (F.count(F.lit(1)) - n_matched)
        ).alias("fp_rate"),
    )


# --------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift test per source (round 13)
# --------------------------------------------------------------------------


@register(
    "source_length_ks",
    oracle="""
    WITH counts AS (
        SELECT source, n_chars AS v, COUNT(*) AS c
        FROM documents GROUP BY source, n_chars
    ),
    vals AS (
        SELECT DISTINCT v FROM counts
    ),
    srcs AS (
        SELECT source, SUM(c) AS tot FROM counts GROUP BY source
    ),
    gtot AS (
        SELECT v, SUM(c) AS g FROM counts GROUP BY v
    ),
    grid AS (
        SELECT s.source, s.tot, x.v, g.g, COALESCE(c.c, 0) AS c
        FROM srcs s
        CROSS JOIN vals x
        JOIN gtot g ON g.v = x.v
        LEFT JOIN counts c ON c.source = s.source AND c.v = x.v
    ),
    cums AS (
        SELECT source, tot, v,
               SUM(c) OVER (PARTITION BY source ORDER BY v) AS cum_src,
               SUM(g - c) OVER (PARTITION BY source ORDER BY v) AS cum_rest,
               (SELECT SUM(c) FROM counts) - tot AS tot_rest
        FROM grid
    ),
    diffs AS (
        SELECT source, tot, v,
               abs(CAST(cum_src AS DOUBLE) / tot
                   - CAST(cum_rest AS DOUBLE) / tot_rest) AS diff
        FROM cums
    ),
    ranked AS (
        SELECT source, tot, v, diff,
               row_number() OVER (PARTITION BY source
                   ORDER BY diff DESC, v) AS rn
        FROM diffs
    )
    SELECT source, CAST(tot AS BIGINT) AS n_docs, diff AS ks_stat,
           v AS ks_at_value
    FROM ranked WHERE rn = 1
    """,
)
def source_length_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test, each source against
    the REST of the corpus, over the document-length distribution:
    KS = max_x |F_source(x) - F_rest(x)| plus the length at which the
    maximum occurs — the nonparametric distribution-shift detector
    (sensitive to shape, not just mean/variance) that complements
    ``source_token_drift``'s lexical chi-square residuals on the
    LENGTH axis.  Exact, not binned: both empirical CDFs are step
    functions that only change at observed values, so evaluating the
    gap at every distinct global value is the complete sup.

    Scale shape: the corpus collapses FIRST to (source, value) counts
    (one shuffle, grid size = sources x distinct lengths — a value
    DOMAIN, independent of row count); the dense grid is a broadcast
    cross of two aggregate frames; CDFs are running sums windowed BY
    SOURCE (never a global ordering); F_rest falls out of the same
    window as sum(global - own) with no second pass.  Divisions are
    single IEEE ops of exact integers — deterministic across engines."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy(
        F.col("source"), F.col("n_chars").alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    # counts feeds vals / srcs / glob / the grid probe — one corpus scan.
    counts = counts.persist()
    srcs = counts.groupBy("source").agg(F.sum("c").alias("tot"))
    # r13 optimization (guide §2.4): the grid used to be vals JOIN glob
    # CROSS srcs, but vals (SELECT DISTINCT v) has exactly glob's key
    # set — the distinct aggregation and the equi-join were a no-op
    # pass over the value domain.  glob alone seeds the grid.
    # r14 (guide §2.4 again): the LEFT JOIN back onto counts to densify
    # the grid is gone too — the same groupBy(v) that computes g also
    # collects the per-value source→count map (bounded by the source
    # DOMAIN, ~tens of entries, never corpus-proportional), and the
    # dense cell is an element_at lookup.  One exchange and one join
    # fewer; A/B won 5/6 min-of-2 passes (0.580 → 0.549 s min,
    # bench_runs/r14/ab_ks_mapgrid.txt).
    glob = counts.groupBy("v").agg(
        F.sum("c").alias("g"),
        F.map_from_entries(F.collect_list(F.struct("source", "c"))).alias(
            "m"
        ),
    )
    total_all = counts.agg(F.sum("c").alias("tot_all"))
    grid = (
        glob.crossJoin(F.broadcast(srcs))
        .select(
            "source",
            "tot",
            "v",
            "g",
            F.coalesce(
                F.element_at("m", F.col("source")), F.lit(0)
            ).alias("c"),
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = (
        grid.withColumn("cum_src", F.sum("c").over(w))
        .withColumn("cum_rest", F.sum(F.col("g") - F.col("c")).over(w))
        .crossJoin(F.broadcast(total_all))
        .withColumn("tot_rest", F.col("tot_all") - F.col("tot"))
    )
    diffs = cums.select(
        "source",
        "tot",
        "v",
        F.abs(
            F.col("cum_src").cast("double") / F.col("tot")
            - F.col("cum_rest").cast("double") / F.col("tot_rest")
        ).alias("diff"),
    )
    rw = Window.partitionBy("source").orderBy(F.col("diff").desc(), F.col("v"))
    return (
        diffs.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") == 1)
        .select(
            "source",
            F.col("tot").alias("n_docs"),
            F.col("diff").alias("ks_stat"),
            F.col("v").alias("ks_at_value"),
        )
    )
