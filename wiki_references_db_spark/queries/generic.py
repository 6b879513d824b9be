"""Generic relational operator queries (SURVEY.md §2) over the driver's
synthetic TPC-H-ish tables, each with a DuckDB oracle.

Determinism rules applied throughout (so the driver's value-hash compare
is byte-stable):

- Sums of doubles are computed exactly: each addend is cast to
  DECIMAL(28,10), summed exactly, and the result cast back to DOUBLE —
  identically in Spark and DuckDB, so no float-association drift.
- Timestamp outputs are formatted as 'yyyy-MM-dd HH:mm:ss' strings.
- Every ranked/limited query has a total-order tie-break.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wiki_references_db_spark.operators.relational import (
    distinct_on,
    insert_if_absent,
    paginate,
    top_k_per_group,
    upsert_coalesce,
)
from wiki_references_db_spark.queries import register
from wiki_references_db_spark.tables import load_table


def dsum(c: Column) -> Column:
    """Exact (decimal) sum of a double expression, returned as double."""
    return F.sum(c.cast("decimal(28,10)")).cast("double")


def ts_str(c: Column) -> Column:
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


# SQL-side equivalents of the helpers above (DuckDB dialect).
def _dsum(expr: str) -> str:
    # The VARCHAR hop matters: DuckDB's direct DECIMAL->DOUBLE cast can be
    # one ulp off for wide values (int128 -> double in two lossy steps),
    # while string->double parsing is correctly rounded — matching Spark's
    # BigDecimal.doubleValue exactly.
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)"


def _ts(expr: str) -> str:
    return f"strftime({expr}, '%Y-%m-%d %H:%M:%S')"


# --------------------------------------------------------------------------
# Exact scaled-integer money sums — the q1_pricing_summary discipline,
# factored for reuse.  Money columns in the corpus are exact 2-decimal
# values at EVERY scale factor (verified: max |100x - round(100x)| == 0
# across sf0.001/0.01/0.1 for l_extendedprice, l_discount, l_tax,
# o_totalprice, c_acctbal, events.value), so money sums accumulate as
# plain LONG sums in the cents domain — ~20x faster in Spark than
# DECIMAL(28,10) accumulation (dsum), whose >18-digit buffer falls off
# the compact long-backed aggregation path — and remain exact.
# --------------------------------------------------------------------------


def csum(c: Column) -> Column:
    """Exact sum of a 2-decimal money column, as double.

    Headroom (the revsum recipe, adapted): a plain long cents sum is
    exact only to 2^63 cents, and a 100 TB q1-style group already sums
    ~5e17 cents — 2.5x below overflow (which ANSI mode turns into a
    hard error).  So the cents are split per row by FLOORED divmod on
    ``_REV_MOD`` — floored, not ``%``, because money can be negative
    (c_acctbal) and Spark's ``%`` follows the dividend sign — then the
    two long partial sums are recombined exactly in DECIMAL(38,0) and
    converted through the VARCHAR hop, identically to the paired
    ``_csum`` oracle (bit-identical at any feasible scale).

    Relation to ``dsum``: value-identical below 2^53 total cents
    (~$90T per group); beyond that the two may differ in the final ulp
    (dsum rounds once from the exact decimal quotient; this path rounds
    the exact integer to double, then divides by 100)."""
    cents = F.round(c * 100).cast("long")
    # Per-row floored split: hi in "$1000 units", lo the long remainder.
    # Correctness rests on the EXACT long recombination hi*_REV_MOD +
    # lo == cents (true by construction of lo, whatever floor() of the
    # double quotient returned), not on the float floor matching true
    # floored divmod — above ~1.4e16 cents per row the quotient can
    # round across an integer boundary and push lo outside
    # [0, _REV_MOD) without affecting the sum.  The identical split
    # runs in the paired ``_csum`` oracle, so the partials also match
    # term-for-term.
    hi = F.floor(cents / _REV_MOD)
    lo = cents - hi * _REV_MOD
    return (
        (
            F.sum(hi).cast("decimal(38,0)") * _REV_MOD
            + F.sum(lo).cast("decimal(38,0)")
        )
        .cast("string")
        .cast("double")
        / 100
    )


def _csum(expr: str) -> str:
    cents = f"CAST(ROUND(({expr}) * 100) AS BIGINT)"
    hi = f"CAST(FLOOR(CAST({cents} AS DOUBLE) / {_REV_MOD}) AS BIGINT)"
    lo = f"({cents} - {hi} * {_REV_MOD})"
    return (
        f"(CAST(CAST(CAST(SUM({hi}) AS DECIMAL(38,0)) * {_REV_MOD}"
        f" + CAST(SUM({lo}) AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) / 100)"
    )


# Product sums (price x discount factor) live at scale 1e4 and are
# hi/lo-split on _REV_MOD for int64 headroom past 1e13 rows per group
# (q1's recipe); the exact integer is recombined per group in
# DECIMAL(38,0) and converted through VARCHAR so both engines round
# identically (see _dsum's note on DuckDB's int128->double cast).
_REV_MOD = 100_000


def _prodsum_col(prod: Column, scale: int) -> Column:
    hi = F.sum(F.floor(prod / _REV_MOD).cast("long"))
    lo = F.sum(prod % _REV_MOD)
    return (
        (hi.cast("decimal(38,0)") * _REV_MOD + lo.cast("decimal(38,0)"))
        .cast("string")
        .cast("double")
        / scale
    )


def revsum(price: Column, disc: Column) -> Column:
    """Exact SUM(price * (1 - discount)) as double — drop-in for
    ``dsum(price * (1 - disc))`` up to last-ulp product rounding (the
    decimal path rounds the per-row product to double first; this path
    keeps it exact — the paired ``_revsum`` oracle matches bit-for-bit)."""
    y = F.round(price * 100).cast("long")
    dm = F.lit(100) - F.round(disc * 100).cast("long")
    return _prodsum_col(y * dm, 10_000)


def discsum(price: Column, disc: Column) -> Column:
    """Exact SUM(price * discount) as double (q6's shape)."""
    y = F.round(price * 100).cast("long")
    dd = F.round(disc * 100).cast("long")
    return _prodsum_col(y * dd, 10_000)


def _prodsum_sql(prod: str, scale: int) -> str:
    return (
        f"(CAST(CAST(CAST(SUM(({prod}) // {_REV_MOD}) AS DECIMAL(38,0))"
        f" * {_REV_MOD} + CAST(SUM(({prod}) % {_REV_MOD}) AS DECIMAL(38,0))"
        f" AS VARCHAR) AS DOUBLE) / {scale})"
    )


def _revsum(price: str, disc: str) -> str:
    prod = (
        f"(CAST(ROUND(({price}) * 100) AS BIGINT)"
        f" * (100 - CAST(ROUND(({disc}) * 100) AS BIGINT)))"
    )
    return _prodsum_sql(prod, 10_000)


def _discsum(price: str, disc: str) -> str:
    prod = (
        f"(CAST(ROUND(({price}) * 100) AS BIGINT)"
        f" * CAST(ROUND(({disc}) * 100) AS BIGINT))"
    )
    return _prodsum_sql(prod, 10_000)


# --------------------------------------------------------------------------
# Aggregation (SURVEY §2.5 A1-A4) — TPC-H Q1-shaped pricing summary
# --------------------------------------------------------------------------

# Dialect-neutral text shared verbatim by the Spark plan and the DuckDB
# oracle ({idiv}: Spark `div` / DuckDB `//`; {vc}: STRING / VARCHAR).
# Scaled-integer domain: y in exact cents, dm = 100*(1-discount),
# tp = 100*(1+tax) — all exact bigints (2-decimal source data), so the
# money sums are plain long sums; y*dm (scale 1e4) and y*dm*tp (scale
# 1e6) are hi/lo-split to keep int64 headroom past 1e13 rows per group.
_Q1_PRE = (
    "SELECT l_returnflag, l_linestatus, "
    "CAST(l_quantity AS BIGINT) AS q, "
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y, "
    "(100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS dm, "
    "(100 + CAST(ROUND(l_tax * 100) AS BIGINT)) AS tp "
    "FROM lineitem "
    "WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'"
)
_Q1_AGG = (
    "SELECT l_returnflag, l_linestatus, "
    "SUM(q) AS sq, SUM(y) AS sy, "
    "SUM((y * dm) {idiv} 100000) AS ph, SUM((y * dm) % 100000) AS pl, "
    "SUM((y * dm * tp) {idiv} 1000000) AS ch, "
    "SUM((y * dm * tp) % 1000000) AS cl, "
    "COUNT(*) AS count_order"
)
_Q1_OUT = (
    "SELECT l_returnflag, l_linestatus, "
    "CAST(sq AS DOUBLE) AS sum_qty, "
    "CAST(sy AS DOUBLE) / 100 AS sum_base_price, "
    "CAST(CAST(CAST(ph AS DECIMAL(38, 0)) * 100000"
    " + CAST(pl AS DECIMAL(38, 0)) AS {vc}) AS DOUBLE) / 10000"
    " AS sum_disc_price, "
    "CAST(CAST(CAST(ch AS DECIMAL(38, 0)) * 1000000"
    " + CAST(cl AS DECIMAL(38, 0)) AS {vc}) AS DOUBLE) / 1000000"
    " AS sum_charge, "
    "count_order"
)


@register(
    "q1_pricing_summary",
    oracle=f"""
    WITH pre AS ({_Q1_PRE}),
    agg AS ({_Q1_AGG.format(idiv='//')} FROM pre
            GROUP BY l_returnflag, l_linestatus)
    {_Q1_OUT.format(vc='VARCHAR')}
    FROM agg
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary, accumulated in the EXACT scaled-integer
    domain: quantity is integral, price/discount/tax are exact 2-decimal
    values, so every money sum is a plain LONG sum (22x faster in Spark
    than DECIMAL(28,10) accumulation, whose >18-digit buffer falls off
    the compact long-backed path; measured 1.36s -> ~0.25s at sf0.1).
    The two wide products (disc price at scale 1e4, charge at scale 1e6)
    are hi/lo-split so each long sum keeps headroom past 1e13 rows per
    group, then recombined exactly in a per-group decimal expression —
    exact integers need no cross-engine float-order discipline, and the
    single final division per column is correctly rounded identically
    in both engines (same discipline as ols_normal_equations).
    Reference parity: A1 grouped aggregation (SURVEY.md §2.5)."""
    l = load_table(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("_q1_lineitem")
    pre = spark.sql(_Q1_PRE.replace("FROM lineitem", "FROM _q1_lineitem"))
    pre.createOrReplaceTempView("_q1_pre")
    agg = spark.sql(_Q1_AGG.format(idiv="div") + " FROM _q1_pre"
                    + " GROUP BY l_returnflag, l_linestatus")
    agg.createOrReplaceTempView("_q1_agg")
    return spark.sql(_Q1_OUT.format(vc="STRING") + " FROM _q1_agg")


# --------------------------------------------------------------------------
# Projection / filters / predicates (SURVEY §2.2 P1-P8)
# --------------------------------------------------------------------------


@register(
    "filter_project_predicates",
    oracle="""
    SELECT l_orderkey, l_partkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
      AND l_returnflag IS NOT NULL
    """,
)
def filter_project_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive range/equality predicates + narrow projection; the
    filters and the 5-column read schema reach the parquet scan
    (PushedFilters / ReadSchema pruning)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
        & F.col("l_returnflag").isNotNull()
    ).select(
        "l_orderkey",
        "l_partkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


@register(
    "regex_predicate",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE regexp_matches(text, 'hash (join|merge)')
    """,
)
def regex_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate (SURVEY §2.2 P6, reference:explorer.py:20-26)."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.col("text").rlike("hash (join|merge)")).select("doc_id", "lang")


# --------------------------------------------------------------------------
# Deduplication (SURVEY §2.3 D1/D2/D4)
# --------------------------------------------------------------------------


@register(
    "distinct_full_row",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def distinct_full_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row DISTINCT (D1, reference:dedup_parquet.py:60-71)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


@register(
    "distinct_on_survivor",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS latest_orderdate,
           o_totalprice AS latest_totalprice
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC
        ) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def distinct_on_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON (key) with deterministic survivor (D2/W2,
    reference:dedup_parquet.py:74-86): latest order per customer."""
    o = load_table(spark, sf_dir, "orders")
    out = distinct_on(
        o,
        ["o_custkey"],
        order_by=[F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
    )
    return out.select(
        "o_custkey",
        F.col("o_orderkey").alias("latest_orderkey"),
        ts_str(F.col("o_orderdate")).alias("latest_orderdate"),
        F.col("o_totalprice").alias("latest_totalprice"),
    )


@register(
    "merge_non_null",
    oracle="""
    SELECT user_id,
           COUNT(*) AS event_count,
           MAX(value) AS max_value,
           MAX(CASE WHEN event_type <> 'click' THEN event_type END) AS last_nonclick_type,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM events
    GROUP BY user_id
    """,
)
def merge_non_null_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-wise non-null merge per key (D4, reference:models.py:108-115):
    deterministic MAX-ignoring-nulls survivor semantics."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("event_count"),
        F.max("value").alias("max_value"),
        F.max(F.when(F.col("event_type") != "click", F.col("event_type"))).alias(
            "last_nonclick_type"
        ),
        ts_str(F.min("ts")).alias("first_ts"),
        ts_str(F.max("ts")).alias("last_ts"),
    )


# --------------------------------------------------------------------------
# Joins (SURVEY §2.4 J1-J9)
# --------------------------------------------------------------------------


@register(
    "join_inner_3way",
    oracle=f"""
    SELECT r_name AS region_name, n_name AS nation_name,
           COUNT(*) AS customer_count,
           {_dsum('c_acctbal')} AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_inner_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join chain fact ⋈ dim ⋈ dim (J1) with the small dims
    explicitly broadcast (reference emulates this with batched lookups,
    reference:load_all.py:313-323)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("customer_count"),
            dsum(F.col("c_acctbal")).alias("total_acctbal"),
        )
    )


@register(
    "left_join_count",
    oracle="""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS order_count
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    """,
)
def left_join_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + COUNT(non-null) keeps zero-order customers with
    count 0 (J3, reference:api_v1.py:116-128)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("order_count"))
    )


@register(
    "semi_join_exists",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
    """,
)
def semi_join_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — the reference's IN-subquery (J5,
    reference:api_v1.py:171-177,195)."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    return p.join(
        l.select(F.col("l_partkey").alias("p_partkey")), "p_partkey", "left_semi"
    ).select("p_partkey", "p_name", "p_brand")


@register(
    "anti_join_absent",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def anti_join_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the reference's set-difference removed-at logic
    (J6, reference:api_v1.py:250-263)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "broadcast_lookup_join",
    oracle=f"""
    SELECT p_brand, COUNT(*) AS line_count,
           {_revsum('l_extendedprice', 'l_discount')} AS revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def broadcast_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Natural-key -> dimension lookup join, broadcast (J7): replaces the
    reference's chunked IN(1000) lookups (reference:load_all.py:313-323).
    Revenue accumulates in the exact scaled-integer domain (``revsum``) —
    the decimal form spent ~0.45s of this query's 0.83s at sf0.1 in
    DECIMAL(28,10) aggregation buffers."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("line_count"),
            revsum(F.col("l_extendedprice"), F.col("l_discount")).alias("revenue"),
        )
    )


@register(
    "hydrate_collect_list",
    oracle="""
    SELECT l_orderkey,
           COUNT(*) AS line_count,
           string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber, l_partkey)
               AS line_numbers,
           string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_linenumber, l_partkey)
               AS part_keys
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def hydrate_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Child-row hydration as grouped ordered collection (J8,
    reference:api_v1.py:266-306 batch-fetch + Python grouping) — here a
    single groupBy with deterministic intra-group order."""
    l = load_table(spark, sf_dir, "lineitem")
    pair = F.struct(F.col("l_linenumber"), F.col("l_partkey"))
    return l.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("line_count"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(pair)), lambda s: s["l_linenumber"].cast("string")
            ),
            ",",
        ).alias("line_numbers"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(pair)), lambda s: s["l_partkey"].cast("string")
            ),
            ",",
        ).alias("part_keys"),
    )


# --------------------------------------------------------------------------
# Windows (SURVEY §2.6 W1-W3)
# --------------------------------------------------------------------------


@register(
    "window_lead_next",
    oracle="""
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_event_id
    FROM events
    """,
)
def window_lead_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead() over (partition, order) — the 'next revision' lookup the
    reference emulates with a subquery (W1, reference:api_v1.py:250-256)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        ts_str(F.col("ts")).alias("ts_str"),
        F.lead("event_id").over(w).alias("next_event_id"),
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
            PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        ) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (W2 + O7)."""
    o = load_table(spark, sf_dir, "orders")
    return top_k_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
    )


# --------------------------------------------------------------------------
# Sort / limit / pagination / set ops (SURVEY §2.7)
# --------------------------------------------------------------------------


@register(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with deterministic tie-break (O2/O6); Spark runs this
    as TakeOrderedAndProject (no full sort)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "pagination_offset",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100 OFFSET 100
    """,
)
def pagination_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page 2 (LIMIT 100 OFFSET 100) over a total order — the API's
    pagination contract (O6, reference:api_v1.py:26-27)."""
    o = load_table(spark, sf_dir, "orders")
    return paginate(
        o.select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        limit=100,
        offset=100,
    )


@register(
    "pagination_limit_cap",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    ORDER BY o_orderdate DESC, o_orderkey
    LIMIT 1000 OFFSET 150
    """,
)
def pagination_limit_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The API layer's limit CAP: a client asking for limit=5000 gets at
    most 1000 rows (default 100, max 1000 —
    reference:api_v1.py:26-27,108 / openapi.yaml:219-236), composed with
    a non-trivial offset so the cap is value-checked through the same
    deterministic total order the serving layer uses (O6)."""
    o = load_table(spark, sf_dir, "orders")
    return paginate(
        o.select("o_orderkey", "o_orderdate", "o_totalprice"),
        [F.col("o_orderdate").desc(), F.col("o_orderkey").asc()],
        limit=5000,  # client over-ask; paginate caps at max_limit=1000
        offset=150,
    )


@register(
    "union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName + distinct (SURVEY §2.7 set-ops note)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side"))
        .unionByName(
            s.select(F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side"))
        )
        .distinct()
    )


# --------------------------------------------------------------------------
# Upsert / merge semantics (SURVEY §2.8 U1/U2)
# --------------------------------------------------------------------------

_CUTOFF = "1999-01-01 00:00:00"


@register(
    "upsert_coalesce",
    oracle=f"""
    WITH old AS (
        SELECT o_custkey, COUNT(*) AS order_count, MAX(o_totalprice) AS max_price
        FROM orders WHERE o_orderdate < TIMESTAMP '{_CUTOFF}'
        GROUP BY o_custkey
    ), new AS (
        SELECT o_custkey, COUNT(*) AS order_count, MAX(o_totalprice) AS max_price
        FROM orders WHERE o_orderdate >= TIMESTAMP '{_CUTOFF}'
        GROUP BY o_custkey
    )
    SELECT COALESCE(new.o_custkey, old.o_custkey) AS o_custkey,
           COALESCE(new.order_count, old.order_count) AS order_count,
           COALESCE(new.max_price, old.max_price) AS max_price
    FROM old FULL OUTER JOIN new ON old.o_custkey = new.o_custkey
    """,
)
def upsert_coalesce_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ON CONFLICT DO UPDATE with COALESCE(new, old) as a full-outer merge
    (U1, reference:models.py:126-141)."""
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(_CUTOFF).cast("timestamp")

    def slice_agg(pred):
        return (
            o.filter(pred)
            .groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).alias("order_count"),
                F.max("o_totalprice").alias("max_price"),
            )
        )

    old = slice_agg(F.col("o_orderdate") < cutoff)
    new = slice_agg(F.col("o_orderdate") >= cutoff)
    return upsert_coalesce(old, new, ["o_custkey"])


@register(
    "insert_if_absent",
    oracle="""
    WITH existing AS (
        SELECT p_partkey, p_name, p_size FROM part WHERE p_size > 25
    ), new AS (
        SELECT p_partkey, p_name, p_size FROM part WHERE p_size <= 30
    )
    SELECT * FROM existing
    UNION ALL
    SELECT * FROM new
    WHERE p_partkey NOT IN (SELECT p_partkey FROM existing)
    """,
)
def insert_if_absent_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ON CONFLICT DO NOTHING — anti-join + union (U2,
    reference:models.py:355-359)."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_size")
    existing = p.filter(F.col("p_size") > 25)
    new = p.filter(F.col("p_size") <= 30)
    return insert_if_absent(existing, new, ["p_partkey"])


# --------------------------------------------------------------------------
# Scalar derivations (SURVEY §2.9 F1-F11)
# --------------------------------------------------------------------------


@register(
    "scalar_derivations",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           lang || '.wikipedia.org' AS domain,
           split_part(lang || '.wikipedia.org', '.', 1) AS language_code,
           'https://' || lang || '.wikipedia.org/w/index.php?curid=' || doc_id
               AS curid_url,
           upper(substr(source, 1, 1)) || substr(source, 2) AS source_norm,
           replace(replace('2024-01-02T03:04:05Z', 'T', ' '), 'Z', '') AS cleaned_ts,
           CASE
             WHEN fam_dom = 'species.wikimedia.org' THEN 'Wikispecies'
             WHEN fam_dom = 'commons.wikimedia.org' THEN 'Wikimedia Commons'
             WHEN len(string_split(fam_dom, '.')) = 3
               THEN upper(substr(split_part(fam_dom, '.', 2), 1, 1))
                    || substr(split_part(fam_dom, '.', 2), 2)
             ELSE upper(substr(split_part(fam_dom, '.', 1), 1, 1))
                    || substr(split_part(fam_dom, '.', 1), 2)
           END AS wiki_family
    FROM (
        SELECT *,
               CASE doc_id % 4
                 WHEN 0 THEN lang || '.wikipedia.org'
                 WHEN 1 THEN 'commons.wikimedia.org'
                 WHEN 2 THEN 'species.wikimedia.org'
                 ELSE 'wikidata.org'
               END AS fam_dom
        FROM documents
    )
    """,
)
def scalar_derivations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function family F2 (md5 hash), F4 (timestamp cleanup), F5
    (curid URL synthesis), F6 (language code), F7 (first-char-upper
    normalization), F9 (wiki family) — reference:build_db.py:258,312,
    318,279-286, reference:models.py:57-59, reference:wikis.py:1-11."""
    from wiki_references_db_spark.functions.wikis import wiki_family

    d = load_table(spark, sf_dir, "documents")
    domain = F.concat(F.col("lang"), F.lit(".wikipedia.org"))
    fam_dom = (
        F.when(F.col("doc_id") % 4 == 0, domain)
        .when(F.col("doc_id") % 4 == 1, F.lit("commons.wikimedia.org"))
        .when(F.col("doc_id") % 4 == 2, F.lit("species.wikimedia.org"))
        .otherwise(F.lit("wikidata.org"))
    )
    return d.select(
        "doc_id",
        F.md5(F.col("text")).alias("text_md5"),
        domain.alias("domain"),
        F.split(domain, "\\.").getItem(0).alias("language_code"),
        F.concat(
            F.lit("https://"),
            F.col("lang"),
            F.lit(".wikipedia.org/w/index.php?curid="),
            F.col("doc_id").cast("string"),
        ).alias("curid_url"),
        F.concat(
            F.upper(F.substring(F.col("source"), 1, 1)),
            F.expr("substring(source, 2)"),
        ).alias("source_norm"),
        F.regexp_replace(
            F.regexp_replace(F.lit("2024-01-02T03:04:05Z"), "T", " "), "Z", ""
        ).alias("cleaned_ts"),
        wiki_family(fam_dom).alias("wiki_family"),
    )


# --------------------------------------------------------------------------
# Event-stream analytics (batch form; SURVEY §2.11 leaves streaming
# optional — the same plans run under Structured Streaming)
# --------------------------------------------------------------------------


@register(
    "events_lifecycle",
    oracle="""
    WITH per_user AS (
        SELECT user_id, MAX(ts) AS user_last_ts FROM events GROUP BY user_id
    ), stats AS (
        SELECT user_id, event_type,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_seen_ts,
               strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_seen_ts,
               MIN(event_id) AS first_seen_id,
               MAX(event_id) AS last_seen_id,
               COUNT(*) AS appearance_count,
               MAX(ts) AS raw_last_ts
        FROM events
        GROUP BY user_id, event_type
    )
    SELECT s.user_id, s.event_type, s.first_seen_ts, s.last_seen_ts,
           s.first_seen_id, s.last_seen_id, s.appearance_count,
           (s.raw_last_ts = p.user_last_ts) AS currently_active
    FROM stats s JOIN per_user p ON s.user_id = p.user_id
    """,
)
def events_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifecycle stats — the flagship first/last-seen + appearance-count +
    currently-visible aggregation shape (A1 + A5,
    reference:api_v1.py:186-213) applied to the events table."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.max("ts").alias("user_last_ts"))
    stats = e.groupBy("user_id", "event_type").agg(
        ts_str(F.min("ts")).alias("first_seen_ts"),
        ts_str(F.max("ts")).alias("last_seen_ts"),
        F.min("event_id").alias("first_seen_id"),
        F.max("event_id").alias("last_seen_id"),
        F.count(F.lit(1)).alias("appearance_count"),
        F.max("ts").alias("raw_last_ts"),
    )
    return stats.join(per_user, "user_id").select(
        "user_id",
        "event_type",
        "first_seen_ts",
        "last_seen_ts",
        "first_seen_id",
        "last_seen_id",
        "appearance_count",
        (F.col("raw_last_ts") == F.col("user_last_ts")).alias("currently_active"),
    )


@register(
    "events_sessionize",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w <= 1800000000
                    THEN 0 ELSE 1 END
                   AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, event_id, ts, value,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           {_csum('value')} AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + running sum —
    lag/lead + frame windows over the event stream (SURVEY §2.6/§2.11)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Gap test at MICROsecond precision (unix_micros on both engines):
    # whole-second truncation silently disagrees with the oracle for gaps
    # within ~1s of the 1800s boundary on sub-second timestamps.
    micros = F.unix_micros(F.col("ts"))
    flagged = e.withColumn(
        "new_session",
        F.when(
            micros - F.lag(micros).over(w) <= 1_800_000_000,
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        ts_str(F.min("ts")).alias("session_start"),
        ts_str(F.max("ts")).alias("session_end"),
        csum(F.col("value")).alias("total_value"),
    )


@register(
    "events_tumbling_hourly",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {_dsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (batch form of the Structured
    Streaming windowed agg in wiki_references_db_spark.streaming)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            ts_str(F.date_trunc("hour", F.col("ts"))).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
    )


@register(
    "pivot_conditional_agg",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signups
    FROM events
    GROUP BY user_id
    """,
)
def pivot_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key->value pivot via conditional aggregation — the template
    parameter pivot shape (A7, reference:api_v1.py:324-333)."""
    e = load_table(spark, sf_dir, "events")

    def cnt(t: str) -> Column:
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))

    return e.groupBy("user_id").agg(
        cnt("click").alias("clicks"),
        cnt("view").alias("views"),
        cnt("purchase").alias("purchases"),
        cnt("error").alias("errors"),
        cnt("signup").alias("signups"),
    )


@register(
    "salted_skew_aggregate",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           {_dsum('value')} AS total_value,
           MIN(event_id) AS first_event,
           MAX(event_id) AS last_event
    FROM events
    GROUP BY event_type
    """,
)
def salted_skew_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation via explicit salting (operators/skew.py): the
    5-key event_type groupBy fans out to keys x 16 salted partial states
    before combining, so the reduce parallelism no longer caps at the
    key cardinality.  Result-identical to the plain groupBy (decimal
    partial sums are exact and commutative), which the oracle verifies."""
    from wiki_references_db_spark.operators.skew import salted_aggregate

    e = load_table(spark, sf_dir, "events")
    return salted_aggregate(
        e,
        ["event_type"],
        "event_id",
        n_events=(F.count(F.lit(1)), F.sum("n_events")),
        total_value=(
            F.sum(F.col("value").cast("decimal(28,10)")),
            F.sum("total_value").cast("double"),
        ),
        first_event=(F.min("event_id"), F.min("first_event")),
        last_event=(F.max("event_id"), F.max("last_event")),
    )


@register(
    "asof_join_clicks",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purch AS (
        SELECT event_id AS purchase_event_id, user_id, ts AS p_ts
        FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           p.purchase_event_id,
           strftime(p.p_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND p.p_ts <= c.ts
    """,
)
def asof_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each click matched to the user's
    most recent prior-or-simultaneous purchase — checked against
    DuckDB's native ASOF LEFT JOIN.  The Spark composition (union +
    running last-ignorenulls window) shuffles once on the key and never
    builds a range cross-product."""
    from wiki_references_db_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    ).withColumn("purchase_ts", ts_str(F.col("p_ts")))
    joined = asof_join(clicks, purch, key="user_id", left_time="ts", right_time="p_ts")
    return joined.select(
        "event_id",
        "user_id",
        ts_str(F.col("ts")).alias("click_ts"),
        "purchase_event_id",
        "purchase_ts",
    )


@register(
    "range_join_tiers",
    oracle=f"""
    WITH tiers AS (
        SELECT * FROM (VALUES
            ('low', 0.0, 100.0),
            ('mid', 100.0, 500.0),
            ('high', 500.0, 1e9)
        ) AS t(tier, lo, hi)
    )
    SELECT t.tier, COUNT(*) AS n_events, {_dsum('e.value')} AS total_value
    FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
    GROUP BY t.tier
    """,
)
def range_join_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-containment) join: events matched to value tiers
    by lo <= value < hi.  The tier table broadcasts, so the non-equi
    condition evaluates map-side (BroadcastNestedLoopJoin over a 3-row
    build side — not a shuffle cross-product); with a large interval
    table the scale path is bucketing both sides on floor(value/width)
    and equi-joining the bucket key."""
    e = load_table(spark, sf_dir, "events")
    tiers = spark.createDataFrame(
        [("low", 0.0, 100.0), ("mid", 100.0, 500.0), ("high", 500.0, 1e9)],
        "tier string, lo double, hi double",
    )
    return (
        e.join(
            F.broadcast(tiers),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
    )


@register(
    "rollup_hourly_to_daily",
    oracle=f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, event_type,
               COUNT(*) AS n, SUM(CAST(value AS DECIMAL(28,10))) AS v
        FROM events GROUP BY 1, 2
    )
    SELECT strftime(date_trunc('day', h), '%Y-%m-%d') AS day, event_type,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) AS total_value
    FROM hourly GROUP BY 1, 2
    """,
)
def rollup_hourly_to_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup: the daily aggregate is composed from
    HOURLY partial aggregates rather than raw rows — the continuous-
    aggregate pattern where coarser resolutions reuse finer ones.
    Decimal partials re-aggregate exactly, so the two-level result is
    bit-identical to a direct daily aggregation (which is what the
    oracle's equivalent two-level SQL computes)."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(28,10)")).alias("v"),
    )
    return hourly.groupBy(
        F.date_format(F.date_trunc("day", F.col("h")), "yyyy-MM-dd").alias("day"),
        F.col("event_type"),
    ).agg(
        F.sum("n").alias("n_events"),
        F.sum("v").cast("double").alias("total_value"),
    )


@register(
    "null_aware_not_in",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderstatus = 'F')
    """,
)
def null_aware_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a nullable subquery column — three-valued-logic
    anti-join (beyond the reference, which only does NOT EXISTS-style
    set difference, reference:api_v1.py:250-263).

    Spark plans this as a null-aware anti join (BroadcastHashJoin
    LeftAnti buildRight, NULL-aware) because `o_custkey` is nullable in
    the schema: one NULL in the subquery would empty the result, which
    a plain left_anti cannot express.  Scale note: the null-aware build
    side MUST be broadcastable; at 100 TB pre-filter it (as here, one
    order status) or prove non-nullness and rewrite to left_anti."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_nai_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_nai_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM v_nai_customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM v_nai_orders
                                WHERE o_orderstatus = 'F')
        """
    )


@register(
    "data_quality_checks",
    oracle="""
    SELECT 'lineitem_negative_price' AS check_name,
           COUNT(*) FILTER (WHERE l_extendedprice < 0) AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_discount_range',
           COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 1)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_ship_before_1995',
           COUNT(*) FILTER (WHERE l_shipdate < TIMESTAMP '1995-01-01 00:00:00')
    FROM lineitem
    UNION ALL
    SELECT 'orders_orphan_custkey',
           COUNT(*) FILTER (WHERE c.c_custkey IS NULL)
    FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    UNION ALL
    SELECT 'events_null_user', COUNT(*) FILTER (WHERE user_id IS NULL)
    FROM events
    """,
)
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite style data validation: each check is a
    conditional count (nulls, range violations, FK orphans via a
    broadcast left join) and the report is one row per check.  Each
    check is a single partial-aggregable pass over its table, so the
    suite costs one scan per table regardless of how many expectations
    share it — the shape a 100 TB nightly validation job needs."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")

    def check(df, name, cond):
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count(F.when(cond, 1)).alias("n_violations"),
        )

    lineitem_checks = l.agg(
        F.count(F.when(F.col("l_extendedprice") < 0, 1)).alias("neg_price"),
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
        ).alias("disc_range"),
        F.count(
            F.when(
                F.col("l_shipdate")
                < F.lit("1995-01-01 00:00:00").cast("timestamp"),
                1,
            )
        ).alias("early_ship"),
    )
    orphans = check(
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left"),
        "orders_orphan_custkey",
        F.col("c_custkey").isNull(),
    )
    null_users = check(e, "events_null_user", F.col("user_id").isNull())
    li = lineitem_checks.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("lineitem_negative_price").alias("check_name"),
                    F.col("neg_price").alias("n_violations"),
                ),
                F.struct(
                    F.lit("lineitem_discount_range").alias("check_name"),
                    F.col("disc_range").alias("n_violations"),
                ),
                F.struct(
                    F.lit("lineitem_ship_before_1995").alias("check_name"),
                    F.col("early_ship").alias("n_violations"),
                ),
            )
        ).alias("r")
    ).select("r.check_name", "r.n_violations")
    return li.unionByName(orphans).unionByName(null_users)


@register(
    "salted_replicate_join",
    oracle=f"""
    SELECT s.s_nationkey,
           {_dsum('l.l_extendedprice')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY s.s_nationkey
    ORDER BY s.s_nationkey
    """,
)
def salted_replicate_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed fact⋈dim equi-join via salt-and-replicate
    (operators/skew.salted_join): the fact side gets a deterministic
    per-row salt, the dim side is replicated once per salt value, and
    the join runs on (key, salt) — a hot supplier's rows land in
    n_salts partitions instead of one.  The shape for when the skewed
    side's dim is too big to broadcast and AQE's skew-split isn't
    available (e.g. the join feeds a co-partitioned downstream op).
    Result-identical to the plain join, which the oracle verifies."""
    from wiki_references_db_spark.operators.skew import salted_join

    l = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_suppkey", "s_suppkey"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    joined = salted_join(l, s, ["s_suppkey"], salt_on="s_suppkey", n_salts=8)
    return (
        joined.groupBy("s_nationkey")
        .agg(
            dsum(F.col("l_extendedprice")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("s_nationkey")
    )


@register(
    "part_metrics_unpivot",
    oracle="""
    WITH wide AS (
        SELECT p_brand,
               MIN(p_size) AS min_size,
               MAX(p_size) AS max_size,
               COUNT(*) AS n_parts
        FROM part GROUP BY p_brand
    )
    SELECT p_brand, metric, value FROM wide
    UNPIVOT (value FOR metric IN (min_size, max_size, n_parts))
    ORDER BY p_brand, metric
    """,
)
def part_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt — the inverse of the pivot family: a wide
    per-brand aggregate row turns into (brand, metric, value) long
    form, the shape feeding generic metric stores and per-metric
    visualization/alerting sinks.  Spark-first: ``DataFrame.unpivot``
    plans a single Expand over the aggregate (no join, no union of N
    selects — one pass emits all N metric rows per input row); metrics
    are integer-exact (MIN/MAX/COUNT) so the cross-engine hash is
    drift-free by construction."""
    part = load_table(spark, sf_dir, "part")
    wide = part.groupBy("p_brand").agg(
        F.min("p_size").cast("long").alias("min_size"),
        F.max("p_size").cast("long").alias("max_size"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        wide.unpivot(
            ["p_brand"], ["min_size", "max_size", "n_parts"],
            "metric", "value",
        )
        .orderBy("p_brand", "metric")
    )


@register(
    "part_metrics_pivot",
    oracle="""
    WITH base AS (
        SELECT p_brand, split_part(p_type, ' ', 1) AS type_class
        FROM part
    ),
    wide AS (
        PIVOT base
        ON type_class IN ('ECONOMY', 'LARGE', 'MEDIUM', 'PROMO', 'SMALL',
                          'STANDARD')
        USING COUNT(*) GROUP BY p_brand
    )
    SELECT p_brand,
           "ECONOMY" AS n_economy, "LARGE" AS n_large,
           "MEDIUM" AS n_medium, "PROMO" AS n_promo,
           "SMALL" AS n_small, "STANDARD" AS n_standard
    FROM wide
    ORDER BY p_brand
    """,
)
def part_metrics_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar PIVOT — the twin of ``part_metrics_unpivot`` (long ->
    wide): per-brand part counts spread across the six type classes
    (first token of p_type) as columns, the crosstab shape every BI
    export needs.  Spark-first: ``groupBy().pivot()`` with a PINNED
    value list — the pinned list matters at scale because it skips the
    extra distinct-values job AND fixes the output schema regardless of
    which classes a data slice happens to contain; the whole plan is
    one hash aggregate (pivot compiles to conditional aggregation, no
    join, no union).  Counts are integer-exact and nulls (brand never
    shipped in a class) are coalesced to 0 on both engines, so the
    cross-engine hash is drift-free by construction.  Round-trips with
    ``DataFrame.unpivot`` (pinned by tests/test_registry.py)."""
    part = load_table(spark, sf_dir, "part")
    classes = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
    wide = (
        part.withColumn(
            "type_class", F.split(F.col("p_type"), " ").getItem(0)
        )
        .groupBy("p_brand")
        .pivot("type_class", classes)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "p_brand",
        *[
            F.coalesce(F.col(f"`{c}`"), F.lit(0)).cast("long").alias(
                f"n_{c.lower()}"
            )
            for c in classes
        ],
    ).orderBy("p_brand")


@register(
    "customer_priority_listagg",
    oracle="""
    WITH pri AS (
        SELECT DISTINCT o_custkey, o_orderpriority FROM orders
    )
    SELECT o_custkey AS c_custkey,
           string_agg(o_orderpriority, ',' ORDER BY o_orderpriority)
               AS priorities,
           COUNT(*) AS n_priorities
    FROM pri GROUP BY o_custkey
    ORDER BY c_custkey
    LIMIT 1000
    """,
)
def customer_priority_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG / ordered string aggregation: the distinct order
    priorities each customer has used, sorted and comma-joined — the
    denormalized-label shape (tag lists, category strings) every
    reporting export needs.  Spark-first: ``collect_set`` (exact
    distinct, partial-aggregated map-side) -> ``array_sort`` ->
    ``array_join`` keeps the whole aggregation JVM-side and makes the
    string DETERMINISTIC regardless of row order — the property the
    oracle's ORDER BY inside string_agg mirrors; a bare collect_list
    join would hash-mismatch across engines on every run."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.array_sort(F.collect_set("o_orderpriority")).alias("pri_arr")
        )
        .select(
            "c_custkey",
            F.array_join("pri_arr", ",").alias("priorities"),
            F.size("pri_arr").cast("long").alias("n_priorities"),
        )
        .orderBy("c_custkey")
        .limit(1000)
    )
