#!/usr/bin/env python3
"""Same-JVM alternating A/B: the scoped pre-distinct repartition
(committed form, default AQE floor) vs the plain-distinct r12 tail
(reconstructed inline, default AQE floor) for the three confirm-stage
families the 64k-floor experiment targeted (guide §1.1/§2.2)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = 3

def main():
    from pyspark.sql import functions as F, Window
    from wiki_references_db_spark.session import get_spark
    from wiki_references_db_spark.tables import load_table, load_table_parallel
    from wiki_references_db_spark.queries import all_queries
    import wiki_references_db_spark.queries.training as T

    spark = get_spark(app_name="ab-scoped-repart")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    def old_pairs_from_bands(e, bands):
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
            .distinct()
        )
        ea = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
        eb = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
        pairs = cand.join(ea, "id_a").join(eb, "id_b")
        return pairs.select(
            "id_a", "id_b",
            (F.expr(T._dot_expr("ea", "eb")) / (F.col("nrm_a") * F.col("nrm_b"))).alias("cosine"),
        ).filter(F.col("cosine") >= T._NEARDUP_THRESHOLD)

    def cosine_old(spark, sf_dir):
        raw = load_table(spark, sf_dir, "embeddings")
        e = load_table_parallel(spark, sf_dir, "embeddings")
        return old_pairs_from_bands(raw, T._neardup_band_rows(e, raw))

    def decontam_old(spark, sf_dir):
        raw = load_table(spark, sf_dir, "embeddings")
        e = load_table_parallel(spark, sf_dir, "embeddings")
        bands = T._neardup_band_rows(e, raw)
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
                F.col("t.nrm").alias("nrm_t"),
                F.col("v.nrm").alias("nrm_v"),
            )
            .distinct()
        )
        et = raw.select(F.col("vec_id").alias("train_id"), F.col("embedding").alias("ea"))
        ev = raw.select(F.col("vec_id").alias("eval_id"), F.col("embedding").alias("eb"))
        hits = (
            cand.join(et, "train_id").join(ev, "eval_id")
            .select(
                "train_id", "eval_id",
                (F.expr(T._dot_expr("ea", "eb")) / (F.col("nrm_t") * F.col("nrm_v"))).alias("cosine"),
            )
            .filter(F.col("cosine") >= T._DECONTAM_THRESHOLD)
        )
        return hits.groupBy("train_id").agg(
            F.count(F.lit(1)).alias("n_eval_matches"),
            F.max("cosine").alias("max_cosine"),
        )

    def simhash_old(spark, sf_dir):
        from wiki_references_db_spark.queries.training import (
            _simhash_fp_frame, _fp_halves, _SIMHASH_BLOCK_CAP,
            _HAMMING64_INT_SPARK, _SIMHASH_HAM_K, persist_corpus,
        )
        fps = persist_corpus(
            _simhash_fp_frame(spark, sf_dir).select("doc_id", "simhash64", *_fp_halves())
        )
        blocks = fps.select(
            "doc_id", "ha", "hb",
            F.explode(F.expr(
                "transform(sequence(0, 3), i -> struct(i AS b,"
                " substring(simhash64, i * 16 + 1, 16) AS blk))"
            )).alias("e"),
        ).select("doc_id", "ha", "hb", "e.b", "e.blk")
        w = Window.partitionBy("b", "blk")
        krows = (
            blocks.withColumn("df", F.count(F.lit(1)).over(w))
            .filter((F.col("df") >= 2) & (F.col("df") <= _SIMHASH_BLOCK_CAP))
            .select("doc_id", "ha", "hb", "b", "blk")
        )
        cand = (
            krows.alias("a")
            .join(
                krows.alias("b"),
                (F.col("a.b") == F.col("b.b"))
                & (F.col("a.blk") == F.col("b.blk"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                F.col("a.ha").alias("ha_a"), F.col("a.hb").alias("hb_a"),
                F.col("b.ha").alias("ha_b"), F.col("b.hb").alias("hb_b"),
            )
            .distinct()
        )
        return (
            cand.withColumn("hamming", F.expr(_HAMMING64_INT_SPARK))
            .filter(F.col("hamming") <= _SIMHASH_HAM_K)
            .select("doc_a", "doc_b", "hamming")
        )

    cases = [
        ("dedup_embedding_cosine", qs["dedup_embedding_cosine"], cosine_old),
        ("dedup_embedding_cosine_projected", qs["dedup_embedding_cosine_projected"], None),
        ("semantic_decontaminate_lsh", qs["semantic_decontaminate_lsh"], decontam_old),
        ("simhash_hamming_pairs", qs["simhash_hamming_pairs"], simhash_old),
    ]
    for name, newfn, oldfn in cases:
        variants = {"new": newfn}
        if oldfn is not None:
            variants["old"] = oldfn
        # warm
        newfn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        res = {v: [] for v in variants}
        keys = list(variants)
        for p in range(PASSES):
            order = keys if p % 2 == 0 else keys[::-1]
            for v in order:
                spark.sparkContext.setJobDescription(f"ab:{name}:{v}:p{p}")
                t0 = time.perf_counter()
                variants[v](spark, SF_DIR).write.mode("overwrite").format("noop").save()
                res[v].append(time.perf_counter() - t0)
                spark.catalog.clearCache()
        line = f"{name:36s} " + " | ".join(
            f"{v} min {min(res[v]):.3f} med {sorted(res[v])[len(res[v])//2]:.3f}"
            for v in keys
        )
        if oldfn is not None:
            wins = sum(1 for x, y in zip(res["new"], res["old"]) if x < y)
            line += f" | new wins {wins}/{PASSES}"
        print(line, flush=True)

if __name__ == "__main__":
    main()
