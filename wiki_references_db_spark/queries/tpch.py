"""TPC-H completion set (Q4/Q7/Q8/Q9/Q13/Q15/Q16/Q21/Q22 shapes) on the
driver's synthetic star schema.

These fill the remaining classic decision-support shapes the registry
did not yet exercise: correlated EXISTS / NOT EXISTS (Q4, Q21, Q22),
two-sided nation routing (Q7), market-share ratio-of-conditional-sums
(Q8), multi-fact star profit rollup (Q9), double aggregation /
count-of-counts (Q13), scalar-subquery max selection (Q15), and
distinct-count variety with an exclusion anti-join (Q16).

The synthetic schema has no `partsupp`, `l_commitdate` /
`l_receiptdate`, `l_shipmode`, or comment columns, so the queries keep
each original's *operator shape* with adapted predicates (documented
per query).  Determinism rules follow queries/generic.py: decimal-exact
double sums (`dsum`/`_dsum`), total-order tie-breaks on every ranked
output, and identical expression trees in Spark and DuckDB.

Scale notes (100 TB design): every dim (nation/region/supplier/part,
and post-aggregation 1-row stat tables) is broadcast; the only shuffles
are fact-fact joins keyed on orderkey and the final small-group
aggregates.  EXISTS/NOT EXISTS are expressed as semi/anti joins on the
order key — Spark's shuffled-hash/SMJ handles them without any
correlated re-scan per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wiki_references_db_spark.queries import register
from wiki_references_db_spark.queries.generic import _dsum, _revsum, dsum, revsum
from wiki_references_db_spark.tables import load_table


# --------------------------------------------------------------------------
# Q4 — order priority checking via correlated EXISTS
# --------------------------------------------------------------------------


@register(
    "q4_priority_late_exists",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q4_priority_late_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority counts over orders that have at least one
    "late" lineitem (correlated EXISTS).  Adapted predicate: the schema
    has no commit/receipt dates, so "late" = shipped more than 60 days
    after the order date.

    Spark-first: the EXISTS is a left-semi join on the order key with
    the non-equi lateness predicate folded into the join condition —
    one keyed shuffle, no per-row re-scan.  The 3-month date window is
    pushed to the orders parquet scan.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by direction and year
# --------------------------------------------------------------------------


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           {_revsum('l.l_extendedprice', 'l.l_discount')} AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations, split
    by shipping direction and year.

    Spark-first: supplier and customer are each pre-joined to their
    (broadcast) nation row and pre-filtered to the two nations of
    interest, so the fact-side joins only carry qualifying keys; the
    OR-of-two-directions is applied after both nation names are
    attached (one cheap post-join filter, same tree as the oracle).
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            revsum(F.col("l_extendedprice"), F.col("l_discount")).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# Q8 — national market share within a region/part-type segment
# --------------------------------------------------------------------------


@register(
    "q8_market_share",
    oracle=f"""
    WITH vol AS (
        SELECT year(o.o_orderdate) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n1.n_name AS supp_nation
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n2.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA'
          AND p.p_type = 'PROMO'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           {_dsum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")}
             / {_dsum('volume')} AS mkt_share
    FROM vol
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue sold into
    ASIA customers, per year — a ratio of a conditional sum to a total
    sum over the same joined stream.

    Spark-first: part (filtered to PROMO), supplier+nation, and the
    customer-side nation/region lookups are all broadcast; lineitem and
    orders are the only shuffled relations.  Both sums come from one
    aggregate pass (no second scan for the denominator).
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = (
        n.join(
            F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
        ).select(F.col("n_nationkey").alias("cust_nationkey"))
    )
    sn = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cust_nationkey"))
        .select("c_custkey")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), l.l_suppkey == sn.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                dsum(
                    F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
                        F.lit(0)
                    )
                )
                / dsum(volume)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q9 — product-type profit by supplier nation and year
# --------------------------------------------------------------------------


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           year(o.o_orderdate) AS o_year,
           {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on a name-matched part family, rolled up by
    the supplier's nation and order year.  Adapted: the schema has no
    partsupp, so profit omits the supplycost term (pure revenue).

    Spark-first: the part filter (LIKE on p_name) and supplier→nation
    hydration are broadcast onto lineitem before the single fact-fact
    join with orders; the rollup groups on (nation, year) — 25×7 groups,
    trivially combinable map-side.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    sn = s.join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(sn), l.l_suppkey == sn.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_profit"
            )
        )
        .orderBy("nation", F.desc("o_year"))
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution (double aggregation)
# --------------------------------------------------------------------------


@register(
    "q13_customer_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: double aggregation — orders per customer (keeping
    zero-order customers via the outer join), then the distribution of
    those counts.  Adapted predicate: the filtered-out order class is
    '1-URGENT' (the schema has no comment column to pattern-match).

    Spark-first: COUNT(o_orderkey) over the left join counts only
    matched rows (null-skipping), exactly mirroring SQL semantics; the
    second aggregate is a few hundred groups, combined map-side.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------------
# Q15 — top supplier(s) by quarterly revenue (scalar-subquery max)
# --------------------------------------------------------------------------


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               {_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, rev.total_revenue
    FROM rev
    JOIN supplier s ON s.s_suppkey = rev.supplier_no
    WHERE rev.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the maximum quarterly
    revenue — a scalar subquery over an aggregate.

    Spark-first: one keyed aggregate builds the per-supplier revenue
    relation; the scalar max is a 1-row aggregate broadcast-crossed
    back onto it (no global-window sort, no second lineitem scan —
    the CTE is computed once and reused for both sides, mirroring the
    oracle's named CTE).  Revenue doubles come from the shared
    decimal-exact path, so the equality comparison is deterministic.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(
            F.broadcast(top),
            F.col("total_revenue") == F.col("max_revenue"),
        )
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q16 — part/supplier variety with an exclusion anti-join
# --------------------------------------------------------------------------


@register(
    "q16_part_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    LIMIT 100
    """,
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each
    (brand, type, size) bucket, excluding an undesirable supplier set
    via NOT IN.  Adapted: the supplier exclusion is s_acctbal < 0 (the
    schema has no comment column), and supplier-part pairs come from
    lineitem (no partsupp).

    Spark-first: the exclusion is a broadcast left-anti join (s_suppkey
    is non-null, so NOT IN == anti join); part attributes are broadcast
    onto lineitem; the distinct-count shuffles once on the 3-attr group
    key with partial distinct-aggregation map-side.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who alone blocked a finished order
# --------------------------------------------------------------------------


@register(
    "q21_blocking_supplier",
    oracle="""
    WITH per_line AS (
        SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate,
               MAX(l.l_shipdate) OVER (PARTITION BY l.l_orderkey)
                 AS max_ship
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
    ),
    per_order AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE WHEN l_shipdate = max_ship
                                   THEN l_suppkey END) AS n_last
        FROM per_line
        GROUP BY l_orderkey
    ),
    blockers AS (
        SELECT DISTINCT pl.l_orderkey, pl.l_suppkey
        FROM per_line pl
        JOIN per_order po ON po.l_orderkey = pl.l_orderkey
        WHERE pl.l_shipdate = pl.max_ship
          AND po.n_supp > 1
          AND po.n_last = 1
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM blockers b
    JOIN supplier s ON s.s_suppkey = b.l_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def q21_blocking_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the *sole* last shipper on a
    multi-supplier finished order — the original's EXISTS (another
    supplier participated) plus NOT EXISTS (another supplier was also
    late) pair.  Adapted: with no commit/receipt dates, "kept the order
    waiting" = shipped on the order's latest ship date.

    Spark-first: both correlated subqueries collapse into one
    DISTINCT-FREE pass — pre-aggregate to one row per (order,
    supplier) with that supplier's latest ship date, then a single
    per-order window supplies the order max, the supplier count and
    the at-the-max count together (plain COUNT/SUM over the
    already-distinct rows, so no countDistinct Expand doubling the
    stream, no join-back, no final dedup; measured 0.84s -> 0.58s at
    sf0.1 vs the window+distinct-aggregate form).  Every shuffle is
    keyed on the order key; supplier names are broadcast at the end.
    No EXISTS re-scan of lineitem per row, which is the classic Q21
    execution trap.
    """
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    per_supp = (
        l.join(o.select("o_orderkey"), l.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("smax"))
    )
    w = Window.partitionBy("l_orderkey")
    ranked = (
        per_supp.withColumn("omax", F.max("smax").over(w))
        .withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn(
            "n_last",
            F.sum((F.col("smax") == F.col("omax")).cast("int")).over(w),
        )
    )
    blockers = ranked.filter(
        (F.col("smax") == F.col("omax"))
        & (F.col("n_supp") > 1)
        & (F.col("n_last") == 1)
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        blockers.join(F.broadcast(s), blockers.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q22 — dormant high-balance customers by nation (NOT EXISTS)
# --------------------------------------------------------------------------


@register(
    "q22_dormant_customers",
    oracle=f"""
    WITH threshold AS (
        SELECT {_dsum('c_acctbal')} / COUNT(*) AS avg_bal
        FROM customer WHERE c_acctbal > 0
    )
    SELECT n.n_name AS nation,
           COUNT(*) AS numcust,
           {_dsum('c.c_acctbal')} AS totacctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    CROSS JOIN threshold t
    WHERE c.c_acctbal > t.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY nation
    ORDER BY nation
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balances
    and no *recent* order (none since 2000-01-01), rolled up by
    geography.  Adapted: grouped by nation name (the schema has no
    phone country codes), and dormancy is recency-based because every
    synthetic customer has at least one lifetime order.

    Spark-first: the global average is a 1-row aggregate broadcast-
    crossed onto customer (decimal-exact on both engines so the
    threshold comparison is bit-identical); NOT EXISTS is a left-anti
    join against the orders key; nation names broadcast.  One shuffle
    total (the anti join on custkey).
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate")
            >= F.lit("2000-01-01 00:00:00").cast("timestamp")
        )
        .select("o_custkey")
    )
    threshold = c.filter(F.col("c_acctbal") > 0).agg(
        (dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# Q2 — groupwise-min join-back (min-cost supplier per part)
# --------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH unit AS (
        SELECT l_partkey, l_suppkey,
               {_dsum('l_extendedprice')}
                 / {_dsum('l_quantity')} AS unit_cost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ), best AS (
        SELECT l_partkey, MIN(unit_cost) AS min_cost
        FROM unit GROUP BY l_partkey
    )
    SELECT p.p_partkey, p.p_brand, s.s_name, s.s_acctbal, n.n_name,
           u.unit_cost
    FROM part p
    JOIN best b ON b.l_partkey = p.p_partkey
    JOIN unit u ON u.l_partkey = p.p_partkey
             AND u.unit_cost = b.min_cost
    JOIN supplier s ON s.s_suppkey = u.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'LARGE' AND p.p_size <= 10
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each part in a type/size slice, the
    supplier(s) offering the minimum cost — the groupwise-min
    correlated subquery, hand-decorrelated into per-group aggregate +
    equality join-back.  Adapted: with no partsupp, "cost" is the
    supplier's historical unit price (decimal-exact revenue / quantity
    per (part, supplier) from lineitem).

    Spark-first: the per-(part,supplier) aggregate shuffles once on the
    composite key; the per-part min is a second keyed aggregate over
    the already-small unit relation; the join-back is an equi-join on
    (part, cost) where both sides derive the double through the same
    decimal-exact path, so the equality is deterministic.  part (after
    the pushed filter), supplier and nation broadcast.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    unit = l.groupBy("l_partkey", "l_suppkey").agg(
        (dsum(F.col("l_extendedprice")) / dsum(F.col("l_quantity"))).alias(
            "unit_cost"
        )
    )
    best = unit.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    sn = s.join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    return (
        unit.join(
            best,
            (unit.l_partkey == F.col("b_partkey"))
            & (unit.unit_cost == F.col("min_cost")),
        )
        .join(F.broadcast(p), unit.l_partkey == p.p_partkey)
        .join(F.broadcast(sn), unit.l_suppkey == F.col("s_suppkey"))
        .select(
            "p_partkey", "p_brand", "s_name", "s_acctbal", "n_name",
            "unit_cost",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q20 — aggregate-derived threshold -> semi join (excess-share supplier)
# --------------------------------------------------------------------------


@register(
    "q20_excess_share_supplier",
    oracle=f"""
    WITH shipped AS (
        SELECT l.l_partkey, l.l_suppkey,
               {_dsum('l.l_quantity')} AS qty
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%red%'
        GROUP BY l.l_partkey, l.l_suppkey
    ), per_part AS (
        SELECT l_partkey,
               {_dsum('qty')} / COUNT(*) AS avg_qty
        FROM shipped GROUP BY l_partkey
    ), excess AS (
        SELECT DISTINCT s.l_suppkey
        FROM shipped s
        JOIN per_part pp ON pp.l_partkey = s.l_partkey
        WHERE s.qty > 2.0 * pp.avg_qty
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM excess)
    ORDER BY s.s_suppkey
    """,
)
def q20_excess_share_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding an outsized share of a
    name-matched part family — an aggregate-derived per-part threshold
    compared against per-(part,supplier) totals, collapsed into a semi
    join on the supplier dimension.  Adapted: with no partsupp,
    "excess" = shipped more than 2x the per-supplier average quantity
    of that red part.

    Spark-first: two keyed aggregates (composite key, then part key —
    the second over an already-aggregated relation), a broadcast of the
    tiny per-part threshold table back onto it, and a left-semi join
    into supplier.  Every double derives decimal-exact on both engines
    so the 2x threshold comparison is deterministic.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    shipped = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum(F.col("l_quantity")).alias("qty"))
    )
    per_part = shipped.groupBy(F.col("l_partkey").alias("pp_partkey")).agg(
        (dsum(F.col("qty")) / F.count(F.lit(1))).alias("avg_qty")
    )
    excess = (
        shipped.join(
            F.broadcast(per_part), F.col("l_partkey") == F.col("pp_partkey")
        )
        .filter(F.col("qty") > 2.0 * F.col("avg_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q11 — group value share above a global aggregate-derived threshold
# --------------------------------------------------------------------------


@register(
    "q11_important_share",
    oracle=f"""
    WITH val AS (
        SELECT n.n_name, l.l_partkey,
               {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        GROUP BY n.n_name, l.l_partkey
    ), total AS (
        SELECT {_dsum('value')} * 0.0005 AS threshold FROM val
    )
    SELECT v.n_name, v.l_partkey, v.value
    FROM val v CROSS JOIN total t
    WHERE v.value > t.threshold
    ORDER BY v.value DESC, v.n_name, v.l_partkey
    LIMIT 100
    """,
)
def q11_important_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: (nation, part) positions whose traded value
    exceeds a fraction of the GLOBAL total — the HAVING-with-scalar-
    subquery pattern.  Adapted: with no partsupp, "value" is shipped
    revenue per (supplier-nation, part) instead of stock value.

    Spark-first: one composite-key aggregate builds the position table;
    the global threshold is a 1-row re-aggregate of it broadcast back
    (the allowlisted 1-row-stat BNLJ shape); the final cut is
    TakeOrderedAndProject.  Nothing rescans lineitem for the subquery.
    """
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sn = s.join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    val = (
        l.join(F.broadcast(sn), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("n_name", "l_partkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "value"
            )
        )
    )
    total = val.agg((dsum(F.col("value")) * 0.0005).alias("threshold"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("n_name", "l_partkey", "value")
        .orderBy(F.desc("value"), "n_name", "l_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q12 — priority-class conditional counts per line status
# --------------------------------------------------------------------------


@register(
    "q12_priority_class_counts",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
)
def q12_priority_class_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional CASE-counts of high/low-priority
    orders per shipping class — completing the 22/22 TPC-H shape
    lineup.  Adapted: grouped by l_linestatus (the schema has no
    l_shipmode) and windowed on l_shipdate (no receipt/commit dates).

    Spark-first: shipdate predicate pushed to the lineitem scan, one
    fact-fact join keyed on the order key, both conditional counts from
    a single aggregate pass (map-side combinable)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )
