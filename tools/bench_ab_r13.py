#!/usr/bin/env python3
"""Round-13 optimization A/B shoot-out (same-JVM, alternating passes —
the bench_persist_ab.py methodology): settle the freq-stage choice in
``dup_span_maximal_runs`` and the gram-generation choice in
``phrase_tag_dictionary`` head-to-head at sf0.1, variants alternated
A/B/A/B so container drift cancels.  Evidence, not part of the engine.

Variants
  dup_span:   head    = count() window over gh (one tokenize pass,
                        one full-stream exchange + sort)
              gbjoin  = groupBy(gh)+join-back (two tokenize passes,
                        partial-agg shuffle, AQE picks the join)
              both share the r13 interval-union coverage tail.
  phrase_tag: head    = one-pass concat-of-lengths, plain load_table
              union   = per-length union branches (r12 form)
              onepar  = one-pass + load_table_parallel (batch-1 form)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F, Window

PASSES = 3
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"


def _dup_span_common(spark: SparkSession, sf_dir: str):
    from wiki_references_db_spark.tables import load_table
    from wiki_references_db_spark.queries.training import _TOKENS, _RUN_GRAM

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.expr(_TOKENS).alias("toks"))
    grams = toks.select(
        "doc_id",
        F.expr("size(toks)").cast("long").alias("n_tokens"),
        F.posexplode(
            F.expr(
                f"CASE WHEN size(toks) < {_RUN_GRAM}"
                " THEN CAST(array() AS ARRAY<STRING>)"
                f" ELSE transform(sequence(0, size(toks) - {_RUN_GRAM}),"
                f" i -> md5(concat_ws(' ', slice(toks, i + 1, {_RUN_GRAM}))))"
                " END"
            )
        ).alias("pos", "gh"),
    ).select("doc_id", "n_tokens", F.col("pos").cast("long").alias("pos"), "gh")
    return grams


def _dup_span_tail(dup: DataFrame):
    from wiki_references_db_spark.queries.training import _RUN_GRAM, _RUN_MIN_SPAN

    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = dup.withColumn("grp", F.col("pos") - F.row_number().over(w))
    spans = isl.groupBy("doc_id", "grp").agg(
        F.min("n_tokens").alias("n_tokens"),
        (F.count(F.lit(1)) + F.lit(_RUN_GRAM - 1)).alias("span_len"),
        F.min("pos").alias("s"),
    )
    wlag = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = spans.withColumn(
        "new_cov",
        (F.col("s") + F.col("span_len") - 1)
        - F.greatest(
            F.col("s") - 1,
            F.coalesce(
                F.max(F.col("s") + F.col("span_len") - 1).over(wlag),
                F.col("s") - 1,
            ),
        ),
    )
    return contrib.groupBy("doc_id").agg(
        F.min("n_tokens").alias("n_tokens"),
        F.max("span_len").alias("longest_dup_span"),
        F.sum(
            F.when(F.col("span_len") >= _RUN_MIN_SPAN, 1).otherwise(0)
        ).alias("n_long_spans"),
        F.sum("new_cov").alias("n_covered_tokens"),
        (F.sum("new_cov").cast("double") / F.min("n_tokens")).alias(
            "dup_token_frac"
        ),
    )


def dup_span_head(spark, sf_dir):
    from wiki_references_db_spark.queries.training import dup_span_maximal_runs

    return dup_span_maximal_runs(spark, sf_dir)


def dup_span_gbjoin(spark, sf_dir):
    grams = _dup_span_common(spark, sf_dir)
    freq = (
        grams.groupBy("gh").agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )
    dup = grams.join(freq.select("gh"), "gh").select(
        "doc_id", "n_tokens", "pos"
    )
    return _dup_span_tail(dup)


def phrase_head(spark, sf_dir):
    from wiki_references_db_spark.queries.curation import phrase_tag_dictionary

    return phrase_tag_dictionary(spark, sf_dir)


def _phrase_tail(grams, spark):
    from wiki_references_db_spark.queries.curation import _PHRASE_TAGS

    dict_df = spark.createDataFrame(
        list(_PHRASE_TAGS), "phrase string, tag string"
    )
    matches = grams.join(F.broadcast(dict_df), "phrase")
    return matches.groupBy("doc_id", "tag").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.countDistinct("phrase").alias("n_phrases"),
        F.min("pos").alias("first_pos"),
    )


def phrase_union(spark, sf_dir):
    from wiki_references_db_spark.tables import load_table
    from wiki_references_db_spark.queries.curation import _PHRASE_LENS
    from wiki_references_db_spark.queries.training import _TOKENS

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.expr(_TOKENS).alias("toks"))
    gram_frames = []
    for n in _PHRASE_LENS:
        gram_frames.append(
            toks.select(
                "doc_id",
                F.posexplode(
                    F.expr(
                        f"CASE WHEN size(toks) < {n}"
                        " THEN CAST(array() AS ARRAY<STRING>)"
                        f" ELSE transform(sequence(0, size(toks) - {n}),"
                        f" i -> concat_ws(' ', slice(toks, i + 1, {n})))"
                        " END"
                    )
                ).alias("pos", "phrase"),
            ).select(
                "doc_id", F.col("pos").cast("long").alias("pos"), "phrase"
            )
        )
    grams = gram_frames[0]
    for gf in gram_frames[1:]:
        grams = grams.union(gf)
    return _phrase_tail(grams, spark)


def phrase_onepar(spark, sf_dir):
    from wiki_references_db_spark.tables import load_table_parallel
    from wiki_references_db_spark.queries.curation import _PHRASE_LENS
    from wiki_references_db_spark.queries.training import _TOKENS

    d = load_table_parallel(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.expr(_TOKENS).alias("toks"))
    gram_struct_t = "array<struct<pos:bigint,phrase:string>>"
    gram_arrays = ", ".join(
        f"CASE WHEN size(toks) < {n} THEN CAST(array() AS {gram_struct_t})"
        f" ELSE transform(sequence(0, size(toks) - {n}),"
        f" i -> struct(CAST(i AS BIGINT) AS pos,"
        f" concat_ws(' ', slice(toks, i + 1, {n})) AS phrase)) END"
        for n in _PHRASE_LENS
    )
    grams = toks.select(
        "doc_id", F.explode(F.expr(f"concat({gram_arrays})")).alias("g")
    ).select(
        "doc_id", F.col("g.pos").alias("pos"), F.col("g.phrase").alias("phrase")
    )
    return _phrase_tail(grams, spark)




def phrase_oneflat(spark, sf_dir):
    from wiki_references_db_spark.tables import load_table
    from wiki_references_db_spark.queries.curation import _PHRASE_LENS
    from wiki_references_db_spark.queries.training import _TOKENS

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.expr(_TOKENS).alias("toks"))
    gram_arrays = ", ".join(
        f"CASE WHEN size(toks) < {n} THEN CAST(array() AS ARRAY<STRING>)"
        f" ELSE transform(sequence(0, size(toks) - {n}),"
        f" i -> concat_ws(' ', slice(toks, i + 1, {n}))) END"
        for n in _PHRASE_LENS
    )
    lens = sorted(_PHRASE_LENS)
    # block sizes: for length n the block has greatest(0, size-n+1) rows
    offs = []
    acc = "0L"
    for n in lens:
        offs.append(acc)
        acc = f"({acc} + greatest(0L, size(toks) - {n} + 1L))"
    pos_expr = "CASE"
    for i, n in enumerate(lens):
        lo = offs[i]
        hi = offs[i + 1] if i + 1 < len(lens) else acc
        pos_expr += f" WHEN idx >= {lo} AND idx < {hi} THEN idx - {lo}"
    pos_expr += " END"
    ordered = ", ".join(
        f"CASE WHEN size(toks) < {n} THEN CAST(array() AS ARRAY<STRING>)"
        f" ELSE transform(sequence(0, size(toks) - {n}),"
        f" i -> concat_ws(' ', slice(toks, i + 1, {n}))) END"
        for n in lens
    )
    grams = toks.select(
        "doc_id",
        "toks",
        F.posexplode(F.expr(f"concat({ordered})")).alias("idx", "phrase"),
    ).select(
        "doc_id",
        F.expr(pos_expr).cast("long").alias("pos"),
        "phrase",
    )
    return _phrase_tail(grams, spark)



def _emb_cos_variant(spark, sf_dir, persist_bands):
    from wiki_references_db_spark.tables import load_table, load_table_parallel
    from wiki_references_db_spark.queries.training import (
        _neardup_band_rows, _neardup_pairs_from_bands,
    )
    from wiki_references_db_spark.storage import persist_corpus

    raw = load_table(spark, sf_dir, "embeddings")
    e = load_table_parallel(spark, sf_dir, "embeddings")
    bands = _neardup_band_rows(e, raw)
    if persist_bands:
        bands = persist_corpus(bands)
    return _neardup_pairs_from_bands(raw, bands)


def emb_cos_head(spark, sf_dir):
    return _emb_cos_variant(spark, sf_dir, False)


def emb_cos_pbands(spark, sf_dir):
    return _emb_cos_variant(spark, sf_dir, True)


def _emb_proj_variant(spark, sf_dir, persist_bands):
    from wiki_references_db_spark.tables import load_table, load_table_parallel
    from wiki_references_db_spark.queries.training import (
        _proj_band_rows, _neardup_pairs_from_bands,
    )
    from wiki_references_db_spark.storage import persist_corpus

    raw = load_table(spark, sf_dir, "embeddings")
    e = load_table_parallel(spark, sf_dir, "embeddings")
    bands = _proj_band_rows(e, raw)
    if persist_bands:
        bands = persist_corpus(bands)
    return _neardup_pairs_from_bands(raw, bands)


def emb_proj_head(spark, sf_dir):
    return _emb_proj_variant(spark, sf_dir, False)


def emb_proj_pbands(spark, sf_dir):
    return _emb_proj_variant(spark, sf_dir, True)



def dup_span_r12(spark, sf_dir):
    """Exact r12 form: gbjoin freq + persisted dup + explode coverage."""
    from wiki_references_db_spark.queries.training import _RUN_GRAM, _RUN_MIN_SPAN
    from wiki_references_db_spark.storage import persist_corpus

    grams = _dup_span_common(spark, sf_dir)
    freq = grams.groupBy("gh").agg(F.count(F.lit(1)).alias("cnt")).filter(
        F.col("cnt") > 1
    )
    dup = grams.join(freq.select("gh"), "gh").select("doc_id", "n_tokens", "pos")
    dup = persist_corpus(dup)
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = dup.withColumn("grp", F.col("pos") - F.row_number().over(w))
    spans = isl.groupBy("doc_id", "grp").agg(
        F.min("n_tokens").alias("n_tokens"),
        (F.count(F.lit(1)) + F.lit(_RUN_GRAM - 1)).alias("span_len"),
    )
    covered = (
        dup.select(
            "doc_id",
            F.explode(F.expr(f"sequence(pos, pos + {_RUN_GRAM - 1})")).alias("j"),
        )
        .groupBy("doc_id")
        .agg(F.countDistinct("j").alias("n_covered"))
    )
    return (
        spans.groupBy("doc_id")
        .agg(
            F.min("n_tokens").alias("n_tokens"),
            F.max("span_len").alias("longest_dup_span"),
            F.sum(
                F.when(F.col("span_len") >= _RUN_MIN_SPAN, 1).otherwise(0)
            ).alias("n_long_spans"),
        )
        .join(covered, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "longest_dup_span",
            "n_long_spans",
            F.col("n_covered").alias("n_covered_tokens"),
            (F.col("n_covered").cast("double") / F.col("n_tokens")).alias(
                "dup_token_frac"
            ),
        )
    )

GROUPS = {
    "dup_span": [
        ("head", dup_span_head),
        ("r12", dup_span_r12),
        ("gbjoin", dup_span_gbjoin),
    ],
    "emb_cos": [("head", emb_cos_head), ("pbands", emb_cos_pbands)],
    "emb_proj": [("head", emb_proj_head), ("pbands", emb_proj_pbands)],
}


def main() -> None:
    from wiki_references_db_spark.session import get_spark

    spark = get_spark(app_name="bench-ab-r13")
    spark.sparkContext.setLogLevel("ERROR")

    def run(fn, sf_dir):
        df = fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    # Warm every variant once at sf0.001, then once at sf0.1 (JIT +
    # page cache), before any timed pass.
    for gname, variants in GROUPS.items():
        for vname, fn in variants:
            run(fn, WARM_DIR)
            run(fn, SF_DIR)

    results: dict[str, dict[str, list[float]]] = {
        g: {v: [] for v, _ in vs} for g, vs in GROUPS.items()
    }
    for p in range(PASSES):
        for gname, variants in GROUPS.items():
            for vname, fn in variants:
                spark.sparkContext.setJobDescription(
                    f"ab-{gname}-{vname}-p{p}"
                )
                dt = min(run(fn, SF_DIR), run(fn, SF_DIR))
                results[gname][vname].append(round(dt, 3))
    for gname, vs in results.items():
        for vname, times in vs.items():
            print(
                f"{gname:12s} {vname:8s} min={min(times):6.3f} "
                f"passes={times}"
            )


if __name__ == "__main__":
    main()
