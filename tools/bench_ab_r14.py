#!/usr/bin/env python3
"""Round-14 same-JVM A/B shoot-outs (the bench_persist_ab.py
methodology: variants alternated A/B/A/B per pass so container drift
cancels; min and per-pass times reported).  Evidence, not engine code.

Usage: python tools/bench_ab_r14.py <experiment> [passes]

Experiments
  cosine      r13 self-join candidate generation vs r14 occupancy-graded
              fan-out + salted hot branch (dedup_embedding_cosine and
              the projected twin, library form = "new").
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"


def _noop(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def _r13_pairs_from_bands(e: DataFrame, bands: DataFrame) -> DataFrame:
    """The r13 form: plain self-join + scoped repartition + distinct."""
    from wiki_references_db_spark.queries.training import (
        _NEARDUP_THRESHOLD,
        _dot_expr,
    )

    par = e.sparkSession.sparkContext.defaultParallelism
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.nrm").alias("nrm_a"),
            F.col("b.nrm").alias("nrm_b"),
        )
        .repartition(par, "id_a", "id_b")
        .distinct()
    )
    ea = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    eb = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    pairs = cand.join(ea, "id_a").join(eb, "id_b")
    return pairs.select(
        "id_a",
        "id_b",
        (F.expr(_dot_expr("ea", "eb")) / (F.col("nrm_a") * F.col("nrm_b"))).alias(
            "cosine"
        ),
    ).filter(F.col("cosine") >= _NEARDUP_THRESHOLD)


def _hotk_pairs_from_bands(
    e: DataFrame, bands: DataFrame, persist: bool
) -> DataFrame:
    """Variant C/D: hot keys via a partial-count aggregate broadcast
    back (anti-join for the fan-out branch, semi-join for the salted
    branch) instead of a window over the full band rows."""
    from wiki_references_db_spark.queries.training import (
        _NEARDUP_THRESHOLD,
        _dot_expr,
    )
    from wiki_references_db_spark.storage import persist_corpus

    _NEARDUP_HOT_OCC, _NEARDUP_HOT_SALTS = 64, 16
    par = e.sparkSession.sparkContext.defaultParallelism
    wb = bands.filter(
        F.col("band_key").isNotNull() & F.col("vec_id").isNotNull()
    )
    if persist:
        wb = persist_corpus(wb)
    hotk = (
        wb.groupBy("band_id", "band_key")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") > _NEARDUP_HOT_OCC)
        .select("band_id", "band_key")
    )
    small = (
        wb.join(F.broadcast(hotk), ["band_id", "band_key"], "left_anti")
        .groupBy("band_id", "band_key")
        .agg(F.sort_array(F.collect_list(F.struct("vec_id", "nrm"))).alias("ms"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ms, (x, i) -> "
                    "transform(slice(ms, i + 2, size(ms) - i - 1), "
                    "y -> struct(x.vec_id AS id_a, y.vec_id AS id_b, "
                    "x.nrm AS nrm_a, y.nrm AS nrm_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b", "p.nrm_a", "p.nrm_b")
    )
    hot = wb.join(F.broadcast(hotk), ["band_id", "band_key"], "left_semi")
    hot_a = hot.withColumn(
        "salt",
        F.pmod(F.xxhash64("vec_id"), F.lit(_NEARDUP_HOT_SALTS)).cast("int"),
    )
    hot_b = hot.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_NEARDUP_HOT_SALTS - 1)))
    )
    hot_pairs = (
        hot_a.alias("a")
        .join(
            hot_b.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.nrm").alias("nrm_a"),
            F.col("b.nrm").alias("nrm_b"),
        )
    )
    cand = (
        small.unionByName(hot_pairs).repartition(par, "id_a", "id_b").distinct()
    )
    ea = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    eb = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    pairs = cand.join(ea, "id_a").join(eb, "id_b")
    return pairs.select(
        "id_a",
        "id_b",
        (F.expr(_dot_expr("ea", "eb")) / (F.col("nrm_a") * F.col("nrm_b"))).alias(
            "cosine"
        ),
    ).filter(F.col("cosine") >= _NEARDUP_THRESHOLD)


def _window_hybrid_pairs(
    e: DataFrame, bands: DataFrame, persist: bool
) -> DataFrame:
    """The r14 library shape, with the persist optional: occupancy via
    window count, fan-out for small buckets, salted self-join for hot
    ones.  persist=False leans on ReusedExchange to run the band fold
    once across the three branches."""
    from pyspark.sql import Window
    from wiki_references_db_spark.queries.training import (
        _NEARDUP_THRESHOLD,
        _dot_expr,
    )
    from wiki_references_db_spark.storage import persist_corpus

    _NEARDUP_HOT_OCC, _NEARDUP_HOT_SALTS = 64, 16
    par = e.sparkSession.sparkContext.defaultParallelism
    wb = bands.filter(
        F.col("band_key").isNotNull() & F.col("vec_id").isNotNull()
    ).withColumn(
        "occ",
        F.count(F.lit(1)).over(Window.partitionBy("band_id", "band_key")),
    )
    if persist:
        wb = persist_corpus(wb)
    small = (
        wb.filter(F.col("occ") <= _NEARDUP_HOT_OCC)
        .groupBy("band_id", "band_key")
        .agg(F.sort_array(F.collect_list(F.struct("vec_id", "nrm"))).alias("ms"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ms, (x, i) -> "
                    "transform(slice(ms, i + 2, size(ms) - i - 1), "
                    "y -> struct(x.vec_id AS id_a, y.vec_id AS id_b, "
                    "x.nrm AS nrm_a, y.nrm AS nrm_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b", "p.nrm_a", "p.nrm_b")
    )
    hot = wb.filter(F.col("occ") > _NEARDUP_HOT_OCC)
    hot_a = hot.withColumn(
        "salt",
        F.pmod(F.xxhash64("vec_id"), F.lit(_NEARDUP_HOT_SALTS)).cast("int"),
    )
    hot_b = hot.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_NEARDUP_HOT_SALTS - 1)))
    )
    hot_pairs = (
        hot_a.alias("a")
        .join(
            hot_b.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.nrm").alias("nrm_a"),
            F.col("b.nrm").alias("nrm_b"),
        )
    )
    cand = (
        small.unionByName(hot_pairs).repartition(par, "id_a", "id_b").distinct()
    )
    ea = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    eb = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    pairs = cand.join(ea, "id_a").join(eb, "id_b")
    return pairs.select(
        "id_a",
        "id_b",
        (F.expr(_dot_expr("ea", "eb")) / (F.col("nrm_a") * F.col("nrm_b"))).alias(
            "cosine"
        ),
    ).filter(F.col("cosine") >= _NEARDUP_THRESHOLD)


def _uni_pairs_from_bands(e: DataFrame, bands: DataFrame) -> DataFrame:
    """Variant UNI: occupancy-scaled part-pair fan-out.  Every band row
    emits ceil(occ/T) (band, key, i, j) group keys (exactly ONE when
    occ <= T); group (i, i) emits within-part pairs, group (i, j<j)
    emits cross-part pairs — every unordered same-bucket pair exactly
    once, group size bounded by ~2T members."""
    from pyspark.sql import Window
    from wiki_references_db_spark.queries.training import (
        _NEARDUP_THRESHOLD,
        _dot_expr,
    )

    T = 64
    par = e.sparkSession.sparkContext.defaultParallelism
    wb = bands.filter(
        F.col("band_key").isNotNull() & F.col("vec_id").isNotNull()
    ).withColumn(
        "occ",
        F.count(F.lit(1)).over(Window.partitionBy("band_id", "band_key")),
    )
    parts = wb.select(
        "band_id",
        "band_key",
        "vec_id",
        "nrm",
        F.expr(
            f"CAST(pmod(xxhash64(vec_id), (occ + {T - 1}) div {T}) AS INT)"
        ).alias("part"),
        F.explode(
            F.expr(
                f"transform(sequence(0, CAST((occ + {T - 1}) div {T} AS INT) - 1), "
                f"k -> struct(least(CAST(pmod(xxhash64(vec_id), (occ + {T - 1}) div {T}) AS INT), k) AS i, "
                f"greatest(CAST(pmod(xxhash64(vec_id), (occ + {T - 1}) div {T}) AS INT), k) AS j))"
            )
        ).alias("g"),
    )
    pair_expr = (
        "CASE WHEN g.i = g.j THEN "
        "flatten(transform(ms, (x, idx) -> "
        "transform(slice(ms, idx + 2, size(ms) - idx - 1), "
        "y -> struct(x.vec_id AS id_a, y.vec_id AS id_b, "
        "x.nrm AS nrm_a, y.nrm AS nrm_b)))) "
        "ELSE "
        "flatten(transform(filter(ms, m -> m.part = g.i), x -> "
        "transform(filter(ms, m -> m.part = g.j), y -> "
        "struct(IF(x.vec_id < y.vec_id, x.vec_id, y.vec_id) AS id_a, "
        "IF(x.vec_id < y.vec_id, y.vec_id, x.vec_id) AS id_b, "
        "IF(x.vec_id < y.vec_id, x.nrm, y.nrm) AS nrm_a, "
        "IF(x.vec_id < y.vec_id, y.nrm, x.nrm) AS nrm_b)))) END"
    )
    cand = (
        parts.groupBy("band_id", "band_key", "g")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("vec_id", "nrm", "part"))
            ).alias("ms")
        )
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.id_a", "p.id_b", "p.nrm_a", "p.nrm_b")
        .repartition(par, "id_a", "id_b")
        .distinct()
    )
    ea = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    eb = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    pairs = cand.join(ea, "id_a").join(eb, "id_b")
    return pairs.select(
        "id_a",
        "id_b",
        (F.expr(_dot_expr("ea", "eb")) / (F.col("nrm_a") * F.col("nrm_b"))).alias(
            "cosine"
        ),
    ).filter(F.col("cosine") >= _NEARDUP_THRESHOLD)


def cosine_variants(spark: SparkSession):
    from wiki_references_db_spark.queries.training import (
        _neardup_band_rows,
        _neardup_pairs_from_bands,
        _proj_band_rows,
    )
    from wiki_references_db_spark.storage import persist_corpus
    from wiki_references_db_spark.tables import load_table, load_table_parallel

    def coord_old(sf_dir: str) -> DataFrame:
        raw = load_table(spark, sf_dir, "embeddings")
        e = load_table_parallel(spark, sf_dir, "embeddings")
        return _r13_pairs_from_bands(raw, _neardup_band_rows(e, raw))

    def coord_new(sf_dir: str) -> DataFrame:
        raw = load_table(spark, sf_dir, "embeddings")
        e = load_table_parallel(spark, sf_dir, "embeddings")
        return _neardup_pairs_from_bands(raw, _neardup_band_rows(e, raw))

    def proj_old(sf_dir: str) -> DataFrame:
        raw = load_table(spark, sf_dir, "embeddings")
        e = load_table_parallel(spark, sf_dir, "embeddings")
        return _r13_pairs_from_bands(
            raw, persist_corpus(_proj_band_rows(e, raw))
        )

    def proj_new(sf_dir: str) -> DataFrame:
        raw = load_table(spark, sf_dir, "embeddings")
        e = load_table_parallel(spark, sf_dir, "embeddings")
        return _neardup_pairs_from_bands(raw, _proj_band_rows(e, raw))

    def coord_hotk_p(sf_dir: str) -> DataFrame:
        raw = load_table(spark, sf_dir, "embeddings")
        e = load_table_parallel(spark, sf_dir, "embeddings")
        return _hotk_pairs_from_bands(raw, _neardup_band_rows(e, raw), True)

    def coord_hotk_nop(sf_dir: str) -> DataFrame:
        raw = load_table(spark, sf_dir, "embeddings")
        e = load_table_parallel(spark, sf_dir, "embeddings")
        return _hotk_pairs_from_bands(raw, _neardup_band_rows(e, raw), False)

    def proj_hotk_p(sf_dir: str) -> DataFrame:
        raw = load_table(spark, sf_dir, "embeddings")
        e = load_table_parallel(spark, sf_dir, "embeddings")
        return _hotk_pairs_from_bands(raw, _proj_band_rows(e, raw), True)

    def proj_hotk_nop(sf_dir: str) -> DataFrame:
        raw = load_table(spark, sf_dir, "embeddings")
        e = load_table_parallel(spark, sf_dir, "embeddings")
        return _hotk_pairs_from_bands(raw, _proj_band_rows(e, raw), False)

    def coord_uni(sf_dir: str) -> DataFrame:
        raw = load_table(spark, sf_dir, "embeddings")
        e = load_table_parallel(spark, sf_dir, "embeddings")
        return _uni_pairs_from_bands(raw, _neardup_band_rows(e, raw))

    def proj_uni(sf_dir: str) -> DataFrame:
        raw = load_table(spark, sf_dir, "embeddings")
        e = load_table_parallel(spark, sf_dir, "embeddings")
        return _uni_pairs_from_bands(raw, _proj_band_rows(e, raw))

    def coord_nop(sf_dir: str) -> DataFrame:
        raw = load_table(spark, sf_dir, "embeddings")
        e = load_table_parallel(spark, sf_dir, "embeddings")
        return _window_hybrid_pairs(raw, _neardup_band_rows(e, raw), False)

    def proj_nop(sf_dir: str) -> DataFrame:
        raw = load_table(spark, sf_dir, "embeddings")
        e = load_table_parallel(spark, sf_dir, "embeddings")
        return _window_hybrid_pairs(raw, _proj_band_rows(e, raw), False)

    return {
        "coord_old": coord_old,
        "coord_new": coord_new,
        "coord_nop": coord_nop,
        "coord_uni": coord_uni,
        "proj_old": proj_old,
        "proj_new": proj_new,
        "proj_nop": proj_nop,
        "proj_uni": proj_uni,
    }


def hll_variants(spark: SparkSession):
    from wiki_references_db_spark.queries.training import (
        _HLL_ALPHA,
        _HLL_M,
    )
    from wiki_references_db_spark.queries import all_queries
    from wiki_references_db_spark.tables import load_table

    def old(sf_dir: str) -> DataFrame:
        e = load_table(spark, sf_dir, "events")
        hu = e.select(
            F.date_trunc("hour", F.col("ts")).alias("hr"), "user_id"
        ).distinct()
        hv = F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        parts = hu.select(
            "hr",
            (hv % _HLL_M).alias("bucket"),
            (hv / F.lit(_HLL_M)).cast("bigint").alias("w"),
        )
        regs = parts.groupBy("hr", "bucket").agg(
            F.max(
                F.when(F.col("w") == 0, 27).otherwise(
                    27 - F.length(F.bin(F.col("w")))
                )
            ).alias("rho")
        )
        targets = F.explode(
            F.array(
                F.col("hr"),
                F.col("hr") + F.expr("INTERVAL 1 HOUR"),
                F.col("hr") + F.expr("INTERVAL 2 HOUR"),
            )
        )
        hrs = hu.select("hr").distinct()
        merged = (
            regs.select(targets.alias("target"), "bucket", "rho")
            .join(F.broadcast(hrs.withColumnRenamed("hr", "target")), "target")
            .groupBy("target", "bucket")
            .agg(F.max("rho").alias("rho"))
        )
        folded = merged.groupBy("target").agg(
            (
                F.sum(F.pow(F.lit(2.0), -F.col("rho")))
                + (F.lit(_HLL_M) - F.count(F.lit(1)))
            ).alias("ssum"),
            (
                F.sum((F.col("rho") == 0).cast("int"))
                + (F.lit(_HLL_M) - F.count(F.lit(1)))
            )
            .cast("long")
            .alias("n_empty"),
        )
        exact = (
            hu.select(targets.alias("target"), "user_id")
            .join(F.broadcast(hrs.withColumnRenamed("hr", "target")), "target")
            .groupBy("target")
            .agg(F.countDistinct("user_id").alias("exact_3h"))
        )
        return folded.join(exact, "target").select(
            F.date_format(F.col("target"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            (F.lit(_HLL_M) - F.col("n_empty")).alias("n_buckets_used"),
            (F.lit(_HLL_ALPHA) * F.lit(_HLL_M * _HLL_M) / F.col("ssum")).alias(
                "hll_estimate_3h"
            ),
            "exact_3h",
        )

    def new(sf_dir: str) -> DataFrame:
        return all_queries()["sketch_hll_sliding_union"](spark, sf_dir)

    def new_d1(sf_dir: str) -> DataFrame:
        """One-pass form but with the per-hour (hr, user) distinct kept
        BEFORE the x3 fan-out, so the first aggregate sees |hu| rows."""
        e = load_table(spark, sf_dir, "events")
        hu = e.select(
            F.date_trunc("hour", F.col("ts")).alias("hr"), "user_id"
        ).distinct()
        targets3 = F.explode(
            F.array(
                F.struct(F.col("hr").alias("target"), F.lit(1).alias("at0")),
                F.struct(
                    (F.col("hr") + F.expr("INTERVAL 1 HOUR")).alias("target"),
                    F.lit(0).alias("at0"),
                ),
                F.struct(
                    (F.col("hr") + F.expr("INTERVAL 2 HOUR")).alias("target"),
                    F.lit(0).alias("at0"),
                ),
            )
        )
        r = hu.select(targets3.alias("t"), "user_id")
        dedup = r.groupBy(F.col("t.target").alias("target"), "user_id").agg(
            F.max("t.at0").alias("at0")
        )
        hv = F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        parts = dedup.select(
            "target",
            "at0",
            (hv % _HLL_M).alias("bucket"),
            (hv / F.lit(_HLL_M)).cast("bigint").alias("w"),
        )
        regs = parts.groupBy("target", "bucket").agg(
            F.max(
                F.when(F.col("w") == 0, 27).otherwise(
                    27 - F.length(F.bin(F.col("w")))
                )
            ).alias("rho"),
            F.count(F.lit(1)).alias("du"),
            F.max("at0").alias("at0"),
        )
        folded = regs.groupBy("target").agg(
            (
                F.sum(F.pow(F.lit(2.0), -F.col("rho")))
                + (F.lit(_HLL_M) - F.count(F.lit(1)))
            ).alias("ssum"),
            (
                F.sum((F.col("rho") == 0).cast("int"))
                + (F.lit(_HLL_M) - F.count(F.lit(1)))
            )
            .cast("long")
            .alias("n_empty"),
            F.sum("du").alias("exact_3h"),
            F.max("at0").alias("at0"),
        )
        return folded.filter(F.col("at0") == 1).select(
            F.date_format(F.col("target"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            (F.lit(_HLL_M) - F.col("n_empty")).alias("n_buckets_used"),
            (F.lit(_HLL_ALPHA) * F.lit(_HLL_M * _HLL_M) / F.col("ssum")).alias(
                "hll_estimate_3h"
            ),
            "exact_3h",
        )

    def mid(sf_dir: str) -> DataFrame:
        """Middle form: keep the r13 two-arm shape (register arm +
        exact arm, final join) but kill the THIRD (hour-spine) lineage
        replay and its two broadcast joins — each arm carries an at0
        flag on the explode and the folded arm filters at0 = 1; the
        inner join then prunes phantom targets from the exact arm."""
        e = load_table(spark, sf_dir, "events")
        hu = e.select(
            F.date_trunc("hour", F.col("ts")).alias("hr"), "user_id"
        ).distinct()
        hv = F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        parts = hu.select(
            "hr",
            (hv % _HLL_M).alias("bucket"),
            (hv / F.lit(_HLL_M)).cast("bigint").alias("w"),
        )
        regs = parts.groupBy("hr", "bucket").agg(
            F.max(
                F.when(F.col("w") == 0, 27).otherwise(
                    27 - F.length(F.bin(F.col("w")))
                )
            ).alias("rho")
        )
        targets3 = F.explode(
            F.array(
                F.struct(F.col("hr").alias("target"), F.lit(1).alias("at0")),
                F.struct(
                    (F.col("hr") + F.expr("INTERVAL 1 HOUR")).alias("target"),
                    F.lit(0).alias("at0"),
                ),
                F.struct(
                    (F.col("hr") + F.expr("INTERVAL 2 HOUR")).alias("target"),
                    F.lit(0).alias("at0"),
                ),
            )
        )
        merged = (
            regs.select(targets3.alias("t"), "bucket", "rho")
            .groupBy(F.col("t.target").alias("target"), "bucket")
            .agg(F.max("rho").alias("rho"), F.max("t.at0").alias("at0"))
        )
        folded = (
            merged.groupBy("target")
            .agg(
                (
                    F.sum(F.pow(F.lit(2.0), -F.col("rho")))
                    + (F.lit(_HLL_M) - F.count(F.lit(1)))
                ).alias("ssum"),
                (
                    F.sum((F.col("rho") == 0).cast("int"))
                    + (F.lit(_HLL_M) - F.count(F.lit(1)))
                )
                .cast("long")
                .alias("n_empty"),
                F.max("at0").alias("at0"),
            )
            .filter(F.col("at0") == 1)
        )
        exact = (
            hu.select(targets3.alias("t"), "user_id")
            .groupBy(F.col("t.target").alias("target"))
            .agg(F.countDistinct("user_id").alias("exact_3h"))
        )
        return folded.join(exact, "target").select(
            F.date_format(F.col("target"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            (F.lit(_HLL_M) - F.col("n_empty")).alias("n_buckets_used"),
            (F.lit(_HLL_ALPHA) * F.lit(_HLL_M * _HLL_M) / F.col("ssum")).alias(
                "hll_estimate_3h"
            ),
            "exact_3h",
        )

    return {"hll_old": old, "hll_new": new, "hll_mid": mid}


def jaccard_variants(spark: SparkSession):
    from pyspark.sql import Window
    from wiki_references_db_spark.queries.training import _docs_with_shingles
    from wiki_references_db_spark.storage import persist_corpus

    def _verify(cand: DataFrame, ds: DataFrame) -> DataFrame:
        sa = ds.select(
            F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
        )
        sb = ds.select(
            F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
        )
        nc = F.size(F.array_intersect("sh_a", "sh_b"))
        return (
            cand.join(sa, "doc_a")
            .join(sb, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                nc.alias("nc"),
                F.size("sh_a").alias("na"),
                F.size("sh_b").alias("nb"),
            )
            .filter(
                5 * F.col("nc") >= 3 * (F.col("na") + F.col("nb") - F.col("nc"))
            )
            .select(
                "doc_a",
                "doc_b",
                (
                    F.col("nc").cast("double")
                    / (F.col("na") + F.col("nb") - F.col("nc"))
                ).alias("jaccard"),
            )
        )

    def jac_old(sf_dir: str) -> DataFrame:
        """The r13 library form."""
        ds = _docs_with_shingles(spark, sf_dir).filter(F.size("shingles") > 0)
        counts = ds.select("doc_id", F.size("shingles").alias("n"))
        rows = ds.select("doc_id", F.explode("shingles").alias("shingle"))
        dfreq = rows.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        ranked = rows.join(dfreq, "shingle").join(counts, "doc_id")
        w = Window.partitionBy("doc_id").orderBy("df", "shingle")
        prefix = persist_corpus(
            ranked.withColumn("pos", F.row_number().over(w))
            .filter(F.col("pos") <= F.expr("n - (3 * n + 4) div 5 + 1"))
            .select("doc_id", "n", "shingle")
        )
        pa = prefix.select(
            F.col("doc_id").alias("doc_a"), F.col("n").alias("na"), "shingle"
        )
        pb = prefix.select(
            F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"), "shingle"
        )
        cand = (
            pa.join(pb, "shingle")
            .filter(
                (F.col("doc_a") < F.col("doc_b"))
                & (5 * F.col("na") >= 3 * F.col("nb"))
                & (5 * F.col("nb") >= 3 * F.col("na"))
            )
            .select("doc_a", "doc_b")
            .distinct()
        )
        return _verify(cand, ds)

    def _prefix_noj(ds: DataFrame) -> DataFrame:
        """n projected before the explode (no counts join), df via
        window count (no dfreq broadcast join)."""
        rows = ds.select(
            "doc_id",
            F.size("shingles").alias("n"),
            F.explode("shingles").alias("shingle"),
        )
        dfw = F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        w = Window.partitionBy("doc_id").orderBy("df", "shingle")
        return (
            rows.withColumn("df", dfw)
            .withColumn("pos", F.row_number().over(w))
            .filter(F.col("pos") <= F.expr("n - (3 * n + 4) div 5 + 1"))
            .select("doc_id", "n", "shingle")
        )

    def jac_noj(sf_dir: str) -> DataFrame:
        """Join-free prefix derivation, self-join candidate gen kept."""
        ds = _docs_with_shingles(spark, sf_dir).filter(F.size("shingles") > 0)
        prefix = persist_corpus(_prefix_noj(ds))
        pa = prefix.select(
            F.col("doc_id").alias("doc_a"), F.col("n").alias("na"), "shingle"
        )
        pb = prefix.select(
            F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"), "shingle"
        )
        cand = (
            pa.join(pb, "shingle")
            .filter(
                (F.col("doc_a") < F.col("doc_b"))
                & (5 * F.col("na") >= 3 * F.col("nb"))
                & (5 * F.col("nb") >= 3 * F.col("na"))
            )
            .select("doc_a", "doc_b")
            .distinct()
        )
        return _verify(cand, ds)

    def jac_fan(sf_dir: str) -> DataFrame:
        """Join-free prefix + part-pair fan-out candidate gen (one
        consumer of prefix, so the persist is gone too)."""
        T = 64
        ds = _docs_with_shingles(spark, sf_dir).filter(F.size("shingles") > 0)
        # NULL shingles never matched in the old equi self-join; a
        # groupBy would pair the null bucket — filter explicitly.
        prefix = _prefix_noj(ds).filter(F.col("shingle").isNotNull())
        wb = prefix.withColumn(
            "occ", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
        n_parts = f"(occ + {T - 1}) div {T}"
        part = f"CAST(pmod(xxhash64(doc_id), {n_parts}) AS INT)"
        parts = wb.select(
            "shingle",
            "doc_id",
            "n",
            F.expr(part).alias("part"),
            F.explode(
                F.expr(
                    f"transform(sequence(0, CAST({n_parts} AS INT) - 1), "
                    f"k -> struct(least({part}, k) AS i, "
                    f"greatest({part}, k) AS j))"
                )
            ).alias("g"),
        )
        pair_expr = (
            "CASE WHEN g.i = g.j THEN "
            "flatten(transform(ms, (x, idx) -> "
            "transform(slice(ms, idx + 2, size(ms) - idx - 1), "
            "y -> struct(x.doc_id AS doc_a, y.doc_id AS doc_b, "
            "x.n AS na, y.n AS nb)))) "
            "ELSE "
            "flatten(transform(filter(ms, m -> m.part = g.i), x -> "
            "transform(filter(ms, m -> m.part = g.j), y -> "
            "struct(IF(x.doc_id < y.doc_id, x.doc_id, y.doc_id) AS doc_a, "
            "IF(x.doc_id < y.doc_id, y.doc_id, x.doc_id) AS doc_b, "
            "IF(x.doc_id < y.doc_id, x.n, y.n) AS na, "
            "IF(x.doc_id < y.doc_id, y.n, x.n) AS nb)))) END"
        )
        par = spark.sparkContext.defaultParallelism
        cand = (
            parts.groupBy("shingle", "g")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("doc_id", "n", "part"))
                ).alias("ms")
            )
            .select(F.explode(F.expr(pair_expr)).alias("p"))
            .filter(
                (5 * F.col("p.na") >= 3 * F.col("p.nb"))
                & (5 * F.col("p.nb") >= 3 * F.col("p.na"))
            )
            .select("p.doc_a", "p.doc_b")
            .repartition(par, "doc_a", "doc_b")
            .distinct()
        )
        return _verify(cand, ds)

    return {"jac_old": jac_old, "jac_noj": jac_noj, "jac_fan": jac_fan}


def rrf_variants(spark: SparkSession):
    from pyspark.sql import Window
    from wiki_references_db_spark.queries import all_queries
    from wiki_references_db_spark.queries.pipeline_extra import (
        _RRF_BIGRAMS,
        _RRF_FUSE_LEX,
        _RRF_FUSE_SEM,
        _RRF_QUERIES,
        _RRF_STOP_FRACTION,
        _RRF_TOPK,
    )
    from wiki_references_db_spark.queries.training import (
        _TOKENS,
        _dot_expr,
        _neardup_band_rows,
    )
    from wiki_references_db_spark.storage import persist_corpus
    from wiki_references_db_spark.tables import load_table, load_table_parallel

    def rrf_old(sf_dir: str) -> DataFrame:
        return all_queries()["rrf_hybrid_generators"](spark, sf_dir)

    def rrf_qb(sf_dir: str) -> DataFrame:
        """Query band rows folded from ONLY the query vectors (cfg still
        counts the full corpus, so band keys are identical) instead of
        running the corpus-wide band fold a second time and keeping
        3 x 4 rows of it."""
        raw = load_table(spark, sf_dir, "embeddings")
        e = load_table_parallel(spark, sf_dir, "embeddings")
        bands = _neardup_band_rows(e, raw)
        qb = _neardup_band_rows(
            raw.filter(F.col("vec_id") < _RRF_QUERIES), raw
        ).select(
            F.col("vec_id").alias("qid"),
            F.col("nrm").alias("nrm_q"),
            F.col("band_id").alias("q_band_id"),
            F.col("band_key").alias("q_band_key"),
        )
        scand = (
            F.broadcast(qb)
            .join(
                bands.alias("c"),
                (F.col("q_band_id") == F.col("c.band_id"))
                & (F.col("q_band_key") == F.col("c.band_key"))
                & (F.col("c.vec_id") != F.col("qid")),
            )
            .select(
                "qid",
                F.col("c.vec_id").alias("cid"),
                "nrm_q",
                F.col("c.nrm").alias("nrm_c"),
            )
            .distinct()
        )
        eq = raw.select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
        )
        ec = raw.select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
        )
        sem = (
            scand.join(F.broadcast(eq.filter(F.col("qid") < _RRF_QUERIES)), "qid")
            .join(ec, "cid")
            .select(
                "qid",
                "cid",
                (
                    F.expr(_dot_expr("qe", "ce"))
                    / (F.col("nrm_q") * F.col("nrm_c"))
                ).alias("cosine"),
            )
        )
        ws = Window.partitionBy("qid").orderBy(F.desc("cosine"), "cid")
        rsem = sem.select(
            "qid", "cid", F.row_number().over(ws).alias("rank_sem")
        )

        d = load_table_parallel(spark, sf_dir, "documents")
        grams = d.select("doc_id", F.expr(_TOKENS).alias("tk")).select(
            "doc_id", F.explode(F.expr(_RRF_BIGRAMS)).alias("bg")
        )
        nd = d.agg(F.count(F.lit(1)).alias("n"))
        wdf = Window.partitionBy("bg")
        idx = persist_corpus(
            grams.withColumn("df", F.count(F.lit(1)).over(wdf))
            .crossJoin(F.broadcast(nd))
            .filter(F.col("df") <= F.col("n") * _RRF_STOP_FRACTION)
            .select("doc_id", "bg")
        )
        qg = idx.filter(F.col("doc_id") < _RRF_QUERIES).select(
            F.col("doc_id").alias("qid"), F.col("bg").alias("q_bg")
        )
        lex = (
            F.broadcast(qg)
            .join(
                idx.alias("i"),
                (F.col("q_bg") == F.col("i.bg"))
                & (F.col("i.doc_id") != F.col("qid")),
            )
            .groupBy("qid", F.col("i.doc_id").alias("cid"))
            .agg(F.count(F.lit(1)).alias("overlap"))
        )
        wl = Window.partitionBy("qid").orderBy(F.desc("overlap"), "cid")
        rlex = lex.select(
            "qid", "cid", F.row_number().over(wl).alias("rank_lex")
        )

        fused = rlex.join(rsem, ["qid", "cid"], "full_outer").select(
            "qid",
            "cid",
            "rank_lex",
            "rank_sem",
            (
                F.coalesce(F.expr(_RRF_FUSE_LEX), F.lit(0.0).cast("double"))
                + F.coalesce(F.expr(_RRF_FUSE_SEM), F.lit(0.0).cast("double"))
            ).alias("rrf_score"),
        )
        wf = Window.partitionBy("qid").orderBy(F.desc("rrf_score"), "cid")
        return (
            fused.withColumn("rk", F.row_number().over(wf))
            .filter(F.col("rk") <= _RRF_TOPK)
            .select("qid", "cid", "rank_lex", "rank_sem", "rrf_score")
        )

    return {"rrf_old": rrf_old, "rrf_qb": rrf_qb}


def semdedup_variants(spark: SparkSession):
    from pyspark.sql import Window
    from wiki_references_db_spark.queries import all_queries
    from wiki_references_db_spark.queries.training import (
        _IVF_CENT_MOD,
        _IVF_CENT_REM,
        _SEMDEDUP_KFIXED_K,
        _dot_expr,
        _norm_expr,
        _semdedup_cells_report,
    )
    from wiki_references_db_spark.storage import persist_corpus
    from wiki_references_db_spark.tables import load_table_parallel

    def _argmax_window(e: DataFrame, cents: DataFrame) -> DataFrame:
        """The r13 shape: n x k crossJoin vs the broadcast centroid
        table + row_number window partitioned by vec_id."""
        nrm_v = F.expr(_norm_expr("embedding")).alias("nrm_v")
        cos = (
            e.select("vec_id", F.col("embedding").alias("ea"), nrm_v)
            .crossJoin(F.broadcast(cents))
            .select(
                "vec_id",
                "cent_id",
                (
                    F.expr(_dot_expr("ea", "ce"))
                    / (F.col("nrm_v") * F.col("nrm_c"))
                ).alias("cosine"),
            )
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("cosine").desc(), F.col("cent_id")
        )
        return (
            cos.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("cent_id").alias("cell"))
        )

    def _report_join(e: DataFrame, assign: DataFrame) -> DataFrame:
        mem_src = assign.join(
            e.select(
                "vec_id",
                "embedding",
                F.expr(_norm_expr("embedding")).alias("nrm"),
            ),
            "vec_id",
        ).select("cell", "vec_id", "embedding", "nrm")
        return _semdedup_cells_report(mem_src)

    def cells_old(sf_dir: str) -> DataFrame:
        e = load_table_parallel(spark, sf_dir, "embeddings")
        cents = e.filter(
            F.col("vec_id") % _IVF_CENT_MOD == _IVF_CENT_REM
        ).select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("ce"),
            F.expr(_norm_expr("embedding")).alias("nrm_c"),
        )
        return _report_join(e, _argmax_window(e, cents))

    def cells_new(sf_dir: str) -> DataFrame:
        return all_queries()["dedup_semdedup_cells"](spark, sf_dir)

    def kfixed_old(sf_dir: str) -> DataFrame:
        e = load_table_parallel(spark, sf_dir, "embeddings")
        seeds = e.filter(F.col("vec_id") < _SEMDEDUP_KFIXED_K).select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("ce"),
            F.expr(_norm_expr("embedding")).alias("nrm_c"),
        )
        a0 = _argmax_window(e, seeds)
        upd = (
            a0.join(e.select("vec_id", "embedding"), "vec_id")
            .select("cell", F.posexplode("embedding").alias("pos", "v"))
            .select(
                "cell",
                (F.col("pos") + 1).cast("int").alias("dim"),
                F.round(F.col("v").cast("double") * 1000000)
                .cast("long")
                .alias("val"),
            )
            .groupBy("cell", "dim")
            .agg(
                (
                    F.sum("val").cast("double") / 1000000.0 / F.count(F.lit(1))
                ).alias("cv")
            )
        )
        kc = (
            upd.groupBy("cell")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(dim, cv))),"
                    " s -> s.cv)"
                ).alias("ce")
            )
            .select(
                F.col("cell").alias("cent_id"),
                "ce",
                F.expr(_norm_expr("ce")).alias("nrm_c"),
            )
        )
        return _report_join(e, _argmax_window(e, kc))

    def kfixed_new(sf_dir: str) -> DataFrame:
        return all_queries()["dedup_semdedup_cells_kfixed"](spark, sf_dir)

    def incr_new(sf_dir: str) -> DataFrame:
        return all_queries()["dedup_semdedup_incremental"](spark, sf_dir)

    def purity_new(sf_dir: str) -> DataFrame:
        return all_queries()["cell_label_purity"](spark, sf_dir)

    return {
        "cells_old": cells_old,
        "cells_new": cells_new,
        "kfixed_old": kfixed_old,
        "kfixed_new": kfixed_new,
        "incr_new": incr_new,
        "purity_new": purity_new,
    }


def argmax2_variants(spark: SparkSession):
    """kmeans / ann_ivf_probe / pq_codebook_assign / coreset: r13
    crossJoin+window argmax vs the r14 map-side fold now in the
    library."""
    from pyspark.sql import Window
    from wiki_references_db_spark.queries import all_queries
    from wiki_references_db_spark.queries.training import (
        _IVF_CENT_MOD,
        _IVF_CENT_REM,
        _IVF_NPROBE,
        _IVF_TOPK,
        _KM_CENT_MOD,
        _KM_CENT_REM,
        _N_QUERY_VECS,
        _PQR_CODES,
        _PQR_NSUB,
        _PQR_SUBDIM,
        _PQR_SUBDIST,
        _dot_expr,
        _norm_expr,
    )
    from wiki_references_db_spark.queries.pipeline_extra import (
        _PQ_CODES,
        _PQ_DIST,
        _PQ_SUBDIM,
        _PQ_SUBSPACES,
    )
    from wiki_references_db_spark.queries.generic import dsum
    from wiki_references_db_spark.storage import persist_corpus
    from wiki_references_db_spark.tables import load_table, load_table_parallel

    def _vc_cos(e, cents):
        return (
            e.select(
                "vec_id",
                F.col("embedding").alias("ea"),
                F.expr(_norm_expr("embedding")).alias("nrm_v"),
            )
            .crossJoin(F.broadcast(cents))
            .select(
                "vec_id",
                "cent_id",
                (
                    F.expr(_dot_expr("ea", "ce"))
                    / (F.col("nrm_v") * F.col("nrm_c"))
                ).alias("cosine"),
            )
        )

    def km_old(sf_dir: str) -> DataFrame:
        e = load_table_parallel(spark, sf_dir, "embeddings")
        raw = load_table(spark, sf_dir, "embeddings")
        cents = raw.filter(
            F.col("vec_id") % _KM_CENT_MOD == _KM_CENT_REM
        ).select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("ce"),
            F.expr(_norm_expr("embedding")).alias("nrm_c"),
        )
        vc = _vc_cos(e, cents)
        w = Window.partitionBy("vec_id").orderBy(
            F.desc("cosine"), F.asc("cent_id")
        )
        assign = (
            vc.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("cent_id").alias("cell"))
        )
        member_dims = (
            assign.join(e, "vec_id")
            .select("cell", F.posexplode("embedding").alias("pos", "v"))
            .select(
                "cell",
                (F.col("pos") + 1).cast("int").alias("dim"),
                F.round(F.col("v").cast("double") * 1000000)
                .cast("long")
                .alias("val"),
            )
        )
        return member_dims.groupBy("cell", "dim").agg(
            F.count(F.lit(1)).alias("n_members"),
            (
                F.sum("val").cast("double") / 1000000.0 / F.count(F.lit(1))
            ).alias("centroid"),
        )

    def ivf_old(sf_dir: str) -> DataFrame:
        raw = load_table(spark, sf_dir, "embeddings")
        e = load_table_parallel(spark, sf_dir, "embeddings")
        cents = raw.filter(
            F.col("vec_id") % _IVF_CENT_MOD == _IVF_CENT_REM
        ).select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("ce"),
            F.expr(_norm_expr("embedding")).alias("nrm_c"),
        )
        vc_cos = persist_corpus(_vc_cos(e, cents))
        w_v = Window.partitionBy("vec_id").orderBy(
            F.col("cosine").desc(), F.col("cent_id")
        )
        assign = (
            vc_cos.withColumn("rn", F.row_number().over(w_v))
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("cent_id").alias("cell"))
        )
        probes = (
            vc_cos.filter(F.col("vec_id") < _N_QUERY_VECS)
            .withColumn("rn", F.row_number().over(w_v))
            .filter(F.col("rn") <= _IVF_NPROBE)
            .select(F.col("vec_id").alias("qid"), F.col("cent_id").alias("cell"))
        )
        cand = (
            F.broadcast(probes)
            .join(assign, "cell")
            .filter(F.col("vec_id") != F.col("qid"))
            .select("qid", F.col("vec_id").alias("cid"), "cell")
        )
        eq = raw.filter(F.col("vec_id") < _N_QUERY_VECS).select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("ea"),
            F.expr(_norm_expr("embedding")).alias("nrm_q"),
        )
        ec = raw.select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("eb"),
            F.expr(_norm_expr("embedding")).alias("nrm_cd"),
        )
        qc = cand.join(F.broadcast(eq), "qid").join(ec, "cid")
        scored = qc.select(
            "qid",
            "cid",
            (
                F.expr(_dot_expr("ea", "eb"))
                / (F.col("nrm_q") * F.col("nrm_cd"))
            ).alias("cosine"),
            "cell",
        )
        w_q = Window.partitionBy("qid").orderBy(
            F.col("cosine").desc(), F.col("cid")
        )
        return (
            scored.withColumn("rn", F.row_number().over(w_q))
            .filter(F.col("rn") <= _IVF_TOPK)
            .select("qid", "cid", "cosine", "cell")
        )

    def pq_old(sf_dir: str) -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        subspaces = F.array([F.lit(i) for i in range(_PQ_SUBSPACES)])
        subs = emb.select(
            "vec_id", "embedding", F.explode(subspaces).alias("subspace")
        ).select(
            "vec_id",
            "subspace",
            F.expr(
                f"slice(embedding, subspace * {_PQ_SUBDIM} + 1, {_PQ_SUBDIM})"
            ).alias("sub"),
        )
        codebook = subs.filter(F.col("vec_id") < _PQ_CODES).select(
            F.col("vec_id").cast("int").alias("code"),
            F.col("subspace").alias("cb_subspace"),
            F.col("sub").alias("cent"),
        )
        dists = subs.join(
            F.broadcast(codebook), F.col("cb_subspace") == F.col("subspace")
        ).select("vec_id", "subspace", "code", F.expr(_PQ_DIST).alias("dist2"))
        w = Window.partitionBy("vec_id", "subspace").orderBy("dist2", "code")
        return (
            dists.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .groupBy("subspace", "code")
            .agg(
                F.count(F.lit(1)).alias("n_assigned"),
                dsum(F.col("dist2")).alias("total_dist2"),
            )
            .orderBy("subspace", "code")
        )

    def coreset_old(sf_dir: str) -> DataFrame:
        e = load_table_parallel(spark, sf_dir, "embeddings")
        raw = load_table(spark, sf_dir, "embeddings")
        cents = raw.filter(
            F.col("vec_id") % _IVF_CENT_MOD == _IVF_CENT_REM
        ).select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("ce"),
            F.expr(_norm_expr("embedding")).alias("nrm_c"),
        )
        vc_cos = _vc_cos(e, cents)
        w_v = Window.partitionBy("vec_id").orderBy(
            F.col("cosine").desc(), F.col("cent_id")
        )
        assign = (
            vc_cos.withColumn("rn", F.row_number().over(w_v))
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("cent_id").alias("cell"), "cosine")
        )
        w_c = Window.partitionBy("cell").orderBy(
            F.col("cosine").desc(), F.col("vec_id")
        )
        return (
            assign.withColumn(
                "n_members",
                F.count(F.lit(1)).over(Window.partitionBy("cell")),
            )
            .withColumn("rk", F.row_number().over(w_c))
            .filter(F.col("rk") == 1)
            .select(
                "cell",
                "n_members",
                F.col("vec_id").alias("rep_vec_id"),
                F.col("cosine").alias("rep_cosine"),
            )
            .orderBy("cell")
        )

    qs = None

    def _lib(name):
        def run(sf_dir: str) -> DataFrame:
            nonlocal qs
            if qs is None:
                qs = all_queries()
            return qs[name](spark, sf_dir)

        return run

    return {
        "km_old": km_old,
        "km_new": _lib("kmeans_lloyd_update"),
        "ivf_old": ivf_old,
        "ivf_new": _lib("ann_ivf_probe"),
        "pq_old": pq_old,
        "pq_new": _lib("pq_codebook_assign"),
        "coreset_old": coreset_old,
        "coreset_new": _lib("embedding_coreset_per_cell"),
    }


def watch_variants(spark: SparkSession):
    """VERDICT item 7: close the two r13 watch-list regressions as
    noise or real — dedup_cdc_chunks (r12 blanket repartition loader vs
    the r13 split-aware loader) and semantic_decontaminate_lsh (r12
    norms-frame joins vs the r13 norm-on-band-rows form)."""
    from wiki_references_db_spark.queries import all_queries
    from wiki_references_db_spark.queries.training import (
        _CDC_MIN_REPORT_LEN,
        _DECONTAM_THRESHOLD,
        _cdc_chunk_rows,
        _dot_expr,
        _neardup_band_rows,
        _norm_expr,
    )
    from wiki_references_db_spark.tables import load_table

    def cdc_r12(sf_dir: str) -> DataFrame:
        d = load_table(spark, sf_dir, "documents").repartition(
            spark.sparkContext.defaultParallelism
        )
        chunk_rows = _cdc_chunk_rows(d)
        return (
            chunk_rows.filter(F.length("chunk") >= _CDC_MIN_REPORT_LEN)
            .groupBy("chunk")
            .agg(
                F.countDistinct("doc_id").alias("n_docs"),
                F.count(F.lit(1)).alias("n_occurrences"),
            )
            .filter(F.col("n_docs") >= 2)
            .select(
                F.md5("chunk").alias("chunk_hash"),
                F.length("chunk").cast("long").alias("chunk_len"),
                "n_docs",
                "n_occurrences",
            )
        )

    def decon_r12(sf_dir: str) -> DataFrame:
        """Approximate r12 shape: norms as a separate corpus frame
        joined onto the candidate set (twice) instead of riding the
        band rows."""
        raw = load_table(spark, sf_dir, "embeddings")
        e = raw.repartition(spark.sparkContext.defaultParallelism)
        bands = _neardup_band_rows(e, raw).drop("nrm")
        norms = raw.select(
            "vec_id", F.expr(_norm_expr("embedding")).alias("nrm")
        )
        trainb = bands.filter(F.col("vec_id") % 20 != 0)
        evalb = bands.filter(F.col("vec_id") % 20 == 0)
        cand = (
            trainb.alias("t")
            .join(
                evalb.alias("v"),
                (F.col("t.band_id") == F.col("v.band_id"))
                & (F.col("t.band_key") == F.col("v.band_key")),
            )
            .select(
                F.col("t.vec_id").alias("train_id"),
                F.col("v.vec_id").alias("eval_id"),
            )
            .distinct()
        )
        et = raw.select(
            F.col("vec_id").alias("train_id"), F.col("embedding").alias("ea")
        )
        ev = raw.select(
            F.col("vec_id").alias("eval_id"), F.col("embedding").alias("eb")
        )
        nt = norms.select(
            F.col("vec_id").alias("train_id"), F.col("nrm").alias("nrm_t")
        )
        nv = norms.select(
            F.col("vec_id").alias("eval_id"), F.col("nrm").alias("nrm_v")
        )
        hits = (
            cand.join(et, "train_id")
            .join(ev, "eval_id")
            .join(nt, "train_id")
            .join(nv, "eval_id")
            .select(
                "train_id",
                "eval_id",
                (
                    F.expr(_dot_expr("ea", "eb"))
                    / (F.col("nrm_t") * F.col("nrm_v"))
                ).alias("cosine"),
            )
            .filter(F.col("cosine") >= _DECONTAM_THRESHOLD)
        )
        return hits.groupBy("train_id").agg(
            F.count(F.lit(1)).alias("n_eval_matches"),
            F.max("cosine").alias("max_cosine"),
        )

    qs = None

    def _lib(name):
        def run(sf_dir: str) -> DataFrame:
            nonlocal qs
            if qs is None:
                qs = all_queries()
            return qs[name](spark, sf_dir)

        return run

    return {
        "cdc_r12": cdc_r12,
        "cdc_r13": _lib("dedup_cdc_chunks"),
        "decon_r12": decon_r12,
        "decon_r13": _lib("semantic_decontaminate_lsh"),
    }


def mrl_variants(spark: SparkSession):
    """embedding_matryoshka_recall: r13 two-pass (truth + x3-dim
    fan-out) vs a fused single corpus pass where the dim-8/16/32 dots
    and norms are PREFIX FOLDS of one product array (bit-identical to
    the sliced expressions) and truth rides the same window as a
    dim-64 row."""
    from pyspark.sql import Window
    from wiki_references_db_spark.queries import all_queries
    from wiki_references_db_spark.queries.training import (
        _MRL_DIMS,
        _N_QUERY_VECS,
        _TOPK,
        _norm_expr,
    )
    from wiki_references_db_spark.tables import load_table, load_table_parallel

    def mrl_old(sf_dir: str) -> DataFrame:
        return all_queries()["embedding_matryoshka_recall"](spark, sf_dir)

    def mrl_fused(sf_dir: str) -> DataFrame:
        raw = load_table(spark, sf_dir, "embeddings")
        e = load_table_parallel(spark, sf_dir, "embeddings")
        dims = spark.createDataFrame([(d,) for d in _MRL_DIMS], "dim int")
        dims_lit = f"array({', '.join(str(d) for d in _MRL_DIMS)})"
        mult = "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)"
        addf = "(acc, v) -> acc + v"
        q = (
            raw.filter(F.col("vec_id") < _N_QUERY_VECS)
            .select(
                F.col("vec_id").alias("qid"),
                F.col("embedding").alias("qe"),
                F.expr(_norm_expr("embedding")).alias("nrm_q"),
                F.expr(
                    f"transform({dims_lit}, d -> SQRT(aggregate("
                    f"slice(zip_with(embedding, embedding, {mult}), 1, d), "
                    f"CAST(0 AS DOUBLE), {addf})))"
                ).alias("nqs"),
            )
        )
        pre = (
            e.select(
                F.col("vec_id").alias("cid"),
                F.col("embedding").alias("ce"),
                F.expr(_norm_expr("embedding")).alias("nrm_c"),
            )
            .join(F.broadcast(q), F.col("cid") != F.col("qid"))
            .select(
                "qid",
                "cid",
                "nrm_q",
                "nrm_c",
                "nqs",
                F.expr(f"zip_with(qe, ce, {mult})").alias("p"),
                F.expr(f"zip_with(ce, ce, {mult})").alias("sq"),
            )
        )
        row_expr = (
            "concat("
            "array(named_struct('dim', 64, 'tcos', "
            f"aggregate(p, CAST(0 AS DOUBLE), {addf}) / (nrm_q * nrm_c), "
            "'ok', true)), "
            f"transform(sequence(1, {len(_MRL_DIMS)}), i -> "
            f"named_struct("
            f"'dim', element_at({dims_lit}, i), "
            f"'tcos', aggregate(slice(p, 1, element_at({dims_lit}, i)), "
            f"CAST(0 AS DOUBLE), {addf}) / (element_at(nqs, i) * "
            f"SQRT(aggregate(slice(sq, 1, element_at({dims_lit}, i)), "
            f"CAST(0 AS DOUBLE), {addf}))), "
            f"'ok', element_at(nqs, i) > 0 AND "
            f"SQRT(aggregate(slice(sq, 1, element_at({dims_lit}, i)), "
            f"CAST(0 AS DOUBLE), {addf})) > 0)))"
        )
        rows = (
            pre.select(
                "qid", "cid", F.explode(F.expr(row_expr)).alias("s")
            )
            .filter(F.col("s.ok"))
            .select("qid", "cid", F.col("s.dim").alias("dim"),
                    F.col("s.tcos").alias("tcos"))
        )
        w = Window.partitionBy("dim", "qid").orderBy(
            F.col("tcos").desc(), F.col("cid").asc()
        )
        top = (
            rows.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _TOPK)
            .select("dim", "qid", "cid")
        )
        hits = (
            top.groupBy("qid", "cid")
            .agg(F.collect_set("dim").alias("ds"))
            .filter(F.array_contains("ds", 64))
            .select(
                F.explode(F.expr("filter(ds, d -> d <> 64)")).alias("dim")
            )
            .groupBy("dim")
            .agg(F.count(F.lit(1)).alias("n_hits"))
        )
        return (
            dims.join(hits, "dim", "left")
            .select(
                "dim",
                F.coalesce(F.col("n_hits"), F.lit(0))
                .cast("long")
                .alias("n_hits"),
                (
                    F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                    / F.lit(_TOPK * _N_QUERY_VECS)
                ).alias("recall_at_k"),
            )
        )

    return {"mrl_old": mrl_old, "mrl_fused": mrl_fused}


def bigram_variants(spark: SparkSession):
    """bigram_lm_doc_score: c1 (start counts) as groupBy+join vs a
    sum() window over c2 on the w1 key (one join fewer; no
    vocabulary-sized broadcast build)."""
    from pyspark.sql import Window
    from wiki_references_db_spark.queries import all_queries
    from wiki_references_db_spark.queries.training import _TOKENS
    from wiki_references_db_spark.storage import persist_corpus
    from wiki_references_db_spark.tables import load_table

    def bl_old(sf_dir: str) -> DataFrame:
        return all_queries()["bigram_lm_doc_score"](spark, sf_dir)

    def bl_win(sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        toks = docs.select("doc_id", F.expr(_TOKENS).alias("t"))
        bg = toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(t) < 2 THEN array() "
                    "ELSE transform(sequence(1, size(t) - 1), "
                    "i -> struct(element_at(t, i) AS w1, "
                    "element_at(t, i + 1) AS w2)) END"
                )
            ).alias("p"),
        ).select("doc_id", "p.w1", "p.w2")
        bg = persist_corpus(bg)
        c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
        model = c2.withColumn(
            "n1", F.sum("n2").over(Window.partitionBy("w1"))
        )
        vocab = toks.select(F.explode("t").alias("tok")).agg(
            F.countDistinct("tok").alias("v")
        )
        q = (
            bg.join(model, ["w1", "w2"])
            .crossJoin(F.broadcast(vocab))
            .select(
                "doc_id",
                F.round(
                    (F.col("n2") + 1).cast("double")
                    / (F.col("n1") + F.col("v"))
                    * 1000000000.0
                )
                .cast("long")
                .alias("qp"),
            )
        )
        return (
            q.groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_bigrams"),
                (
                    F.sum("qp").cast("double")
                    / (F.lit(1000000000.0) * F.count(F.lit(1)))
                ).alias("lm_score"),
            )
            .orderBy(F.desc("lm_score"), "doc_id")
            .limit(25)
        )

    return {"bl_old": bl_old, "bl_win": bl_win}


def simhashpp_variants(spark: SparkSession):
    """simhash_hamming_pairs: shipped bucket SELF-JOIN pair stage vs the
    r14 occupancy-scaled part-pair fan-out (T=64) — the r13 rejection of
    a fan-out here was against the UNBOUNDED C(cap,2)-per-bucket-array
    form; the part-pair form bounds group state at ~2T structs, so it
    deserves its own measurement."""
    from pyspark.sql import Window
    from wiki_references_db_spark.queries import all_queries
    from wiki_references_db_spark.queries.training import (
        _SIMHASH_BLOCK_CAP,
        _SIMHASH_HAM_K,
        _HAMMING64_INT_SPARK,
        _fp_halves,
        _simhash_fp_frame,
    )
    from wiki_references_db_spark.storage import persist_corpus

    def sh_old(sf_dir: str) -> DataFrame:
        return all_queries()["simhash_hamming_pairs"](spark, sf_dir)

    def sh_pp(sf_dir: str) -> DataFrame:
        T = 64
        par = spark.sparkContext.defaultParallelism
        fps = persist_corpus(
            _simhash_fp_frame(spark, sf_dir).select(
                "doc_id", "simhash64", *_fp_halves()
            )
        )
        blocks = fps.select(
            "doc_id",
            "ha",
            "hb",
            F.explode(
                F.expr(
                    "transform(sequence(0, 3), i -> struct(i AS b,"
                    " substring(simhash64, i * 16 + 1, 16) AS blk))"
                )
            ).alias("e"),
        ).select("doc_id", "ha", "hb", "e.b", "e.blk")
        w = Window.partitionBy("b", "blk")
        krows = (
            blocks.withColumn("df", F.count(F.lit(1)).over(w))
            .filter(
                (F.col("df") >= 2) & (F.col("df") <= _SIMHASH_BLOCK_CAP)
            )
        )
        n_parts = f"(df + {T - 1}) div {T}"
        part = f"CAST(pmod(xxhash64(doc_id), {n_parts}) AS INT)"
        parts = krows.select(
            "b",
            "blk",
            "doc_id",
            "ha",
            "hb",
            F.expr(part).alias("part"),
            F.explode(
                F.expr(
                    f"transform(sequence(0, CAST({n_parts} AS INT) - 1), "
                    f"k -> struct(least({part}, k) AS i, "
                    f"greatest({part}, k) AS j))"
                )
            ).alias("g"),
        )
        pair_expr = (
            "CASE WHEN g.i = g.j THEN "
            "flatten(transform(ms, (x, idx) -> "
            "transform(slice(ms, idx + 2, size(ms) - idx - 1), "
            "y -> struct(x.doc_id AS doc_a, y.doc_id AS doc_b, "
            "x.ha AS ha_a, x.hb AS hb_a, y.ha AS ha_b, y.hb AS hb_b)))) "
            "ELSE "
            "flatten(transform(filter(ms, m -> m.part = g.i), x -> "
            "transform(filter(ms, m -> m.part = g.j), y -> "
            "struct(IF(x.doc_id < y.doc_id, x.doc_id, y.doc_id) AS doc_a, "
            "IF(x.doc_id < y.doc_id, y.doc_id, x.doc_id) AS doc_b, "
            "IF(x.doc_id < y.doc_id, x.ha, y.ha) AS ha_a, "
            "IF(x.doc_id < y.doc_id, x.hb, y.hb) AS hb_a, "
            "IF(x.doc_id < y.doc_id, y.ha, x.ha) AS ha_b, "
            "IF(x.doc_id < y.doc_id, y.hb, x.hb) AS hb_b)))) END"
        )
        cand = (
            parts.groupBy("b", "blk", "g")
            .agg(
                F.sort_array(
                    F.collect_list(
                        F.struct("doc_id", "ha", "hb", "part")
                    )
                ).alias("ms")
            )
            .select(F.explode(F.expr(pair_expr)).alias("p"))
            .select(
                "p.doc_a", "p.doc_b", "p.ha_a", "p.hb_a", "p.ha_b", "p.hb_b"
            )
            .repartition(par, "doc_a", "doc_b")
            .distinct()
        )
        return (
            cand.withColumn("hamming", F.expr(_HAMMING64_INT_SPARK))
            .filter(F.col("hamming") <= _SIMHASH_HAM_K)
            .select("doc_a", "doc_b", "hamming")
        )

    return {"sh_old": sh_old, "sh_pp": sh_pp}


def cds_variants(spark: SparkSession):
    """corpus_dup_span_stats: shipped window-count + final documents
    left-join (the join exists only to emit zero-span docs) vs an
    explode_outer single-pass whose window key is null-safe
    (null spans get per-doc singleton groups so the short-doc mass can
    never pile into one window partition) — no join, no second scan of
    documents, no corpus-sized auto-broadcast build."""
    from pyspark.sql import Window
    from wiki_references_db_spark.queries import all_queries
    from wiki_references_db_spark.queries.curation import (
        _SPANS_FROM_TOKS,
        _TOKENS,
    )
    from wiki_references_db_spark.tables import load_table

    def cds_old(sf_dir: str) -> DataFrame:
        return all_queries()["corpus_dup_span_stats"](spark, sf_dir)

    def cds_outer(sf_dir: str) -> DataFrame:
        d = load_table(spark, sf_dir, "documents")
        toks = d.select("doc_id", F.expr(_TOKENS).alias("toks"))
        span_rows = toks.select(
            "doc_id",
            F.explode_outer(F.expr(_SPANS_FROM_TOKS)).alias("span"),
        )
        w = Window.partitionBy(
            "span",
            F.expr("CASE WHEN span IS NULL THEN doc_id ELSE NULL END"),
        )
        per_doc = (
            span_rows.withColumn("df", F.count("span").over(w))
            .groupBy("doc_id")
            .agg(
                F.count("span").alias("n_spans"),
                F.sum((F.col("df") > 1).cast("long")).alias("n_dup_spans"),
            )
        )
        return per_doc.select(
            "doc_id",
            "n_spans",
            "n_dup_spans",
            F.when(
                F.col("n_spans") > 0,
                F.col("n_dup_spans").cast("double") / F.col("n_spans"),
            ).alias("dup_frac"),
        )

    return {"cds_old": cds_old, "cds_outer": cds_outer}


def winnow_variants(spark: SparkSession):
    """dedup_winnowing_fingerprints: shipped DF-cap as groupBy-count +
    join-back on fp (TWO shuffles of the fp stream + an index-sized
    broadcast build) vs the df window count over the same fp key the
    bucket groupBy shuffles on (ONE shared exchange — the
    simhash/jaccard/dup_span treatment)."""
    from pyspark.sql import Window
    from wiki_references_db_spark.queries import all_queries
    from wiki_references_db_spark.queries.training import (
        _WINNOW_DF_CAP,
        _WINNOW_FPS,
        _WINNOW_HS,
        _WINNOW_MIN_SHARED,
        _bucket_pairs_expr,
    )
    from wiki_references_db_spark.storage import persist_corpus
    from wiki_references_db_spark.tables import load_table_parallel

    def wn_old(sf_dir: str) -> DataFrame:
        return all_queries()["dedup_winnowing_fingerprints"](spark, sf_dir)

    def wn_win(sf_dir: str) -> DataFrame:
        d = load_table_parallel(spark, sf_dir, "documents")
        fps = persist_corpus(
            d.withColumn("text", F.coalesce(F.col("text"), F.lit("")))
            .select("doc_id", F.expr(_WINNOW_HS).alias("hs"))
            .select("doc_id", F.expr(_WINNOW_FPS).alias("fps"))
        )
        fp_rows = fps.select("doc_id", F.explode("fps").alias("fp"))
        buckets = (
            fp_rows.withColumn(
                "df", F.count(F.lit(1)).over(Window.partitionBy("fp"))
            )
            .filter((F.col("df") >= 2) & (F.col("df") <= _WINNOW_DF_CAP))
            .groupBy("fp")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
        )
        return (
            buckets.select(F.explode(_bucket_pairs_expr("docs")).alias("p"))
            .groupBy(
                F.col("p.doc_a").alias("doc_a"),
                F.col("p.doc_b").alias("doc_b"),
            )
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= _WINNOW_MIN_SHARED)
        )

    return {"wn_old": wn_old, "wn_win": wn_win}


def adamic_variants(spark: SparkSession):
    """adamic_adar_links: shipped degree groupBy + buckets⋈deg join vs
    the full degree as an unbounded count window in the SAME
    (PARTITION BY s) pass the cap's row_number already shuffles for —
    no deg frame, no join, and the edges persist (whose point was the
    two consumers) can go."""
    from pyspark.sql import Window
    from wiki_references_db_spark.queries import all_queries
    from wiki_references_db_spark.queries.curation import (
        _RA_NBR_CAP,
        _RA_SCALE,
        _RA_TOPK,
    )
    from wiki_references_db_spark.queries.training import _bucket_pairs_expr
    from wiki_references_db_spark.tables import load_table

    def aa_old(sf_dir: str) -> DataFrame:
        return all_queries()["adamic_adar_links"](spark, sf_dir)

    def aa_win(sf_dir: str) -> DataFrame:
        o = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        edges = (
            o.join(li, o["o_orderkey"] == li["l_orderkey"])
            .select(
                F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
            )
            .distinct()
        )
        wcap = Window.partitionBy("s").orderBy(
            F.md5(
                F.concat(
                    F.col("s").cast("string"),
                    F.lit(":"),
                    F.col("c").cast("string"),
                )
            ),
            "c",
        )
        capped = (
            edges.withColumn(
                "d", F.count(F.lit(1)).over(Window.partitionBy("s"))
            )
            .withColumn("rn", F.row_number().over(wcap))
            .filter(F.col("rn") <= _RA_NBR_CAP)
            .select("c", "s", "d")
        )
        buckets = capped.groupBy("s").agg(
            F.max("d").alias("d"),
            F.sort_array(F.collect_list("c")).alias("cs"),
        )
        pairs = buckets.select(
            "d", F.explode(_bucket_pairs_expr("cs")).alias("p")
        )
        scored = pairs.groupBy(
            F.col("p.doc_a").alias("cust_a"), F.col("p.doc_b").alias("cust_b")
        ).agg(
            F.count(F.lit(1)).alias("n_common_suppliers"),
            F.sum(
                F.floor(F.lit(float(_RA_SCALE)) / F.col("d")).cast("long")
            ).alias("ra_score_fp"),
        )
        return scored.orderBy(
            F.col("ra_score_fp").desc(), "cust_a", "cust_b"
        ).limit(_RA_TOPK)

    return {"aa_old": aa_old, "aa_win": aa_win}


EXPERIMENTS = {
    "cds": cds_variants,
    "winnow": winnow_variants,
    "adamic": adamic_variants,
    "simhashpp": simhashpp_variants,
    "cosine": cosine_variants,
    "hll": hll_variants,
    "jaccard": jaccard_variants,
    "rrf": rrf_variants,
    "semdedup": semdedup_variants,
    "argmax2": argmax2_variants,
    "watch": watch_variants,
    "mrl": mrl_variants,
    "bigram": bigram_variants,
}


def main() -> None:
    exp = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from wiki_references_db_spark.session import get_spark

    spark = get_spark(app_name=f"ab-r14-{exp}")
    spark.sparkContext.setLogLevel("ERROR")
    variants = EXPERIMENTS[exp](spark)

    # Warm codegen/JIT on the tiny SF, once per variant.
    for name, fn in variants.items():
        _noop(fn(WARM_DIR))
        spark.catalog.clearCache()

    results: dict[str, list[float]] = {n: [] for n in variants}
    for p in range(passes):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"{exp}:{name}:pass{p}")
            dt = _noop(fn(SF_DIR))
            spark.catalog.clearCache()
            results[name].append(dt)
    spark.sparkContext.setJobDescription(None)

    for name, times in results.items():
        print(
            f"{exp}/{name}: min={min(times):.3f}s "
            f"passes={[round(t, 3) for t in times]}"
        )


if __name__ == "__main__":
    main()
