"""Multimodal-column queries registered in the driver contract.

The testdata ships no binary media tables, so a deterministic media
table is derived from ``documents`` (payload = UTF-8 bytes of the text,
kind by doc_id mod 3) and pushed through the REAL Spark-side plumbing —
binary columns, mapInPandas Arrow batches, typed output schemas
(operators/multimodal.py).  Because the stubbed decode derives
dimensions from md5(payload), the whole pipeline has an exact DuckDB
oracle: the driver value-hash checks the mapInPandas path end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wiki_references_db_spark.operators.multimodal import MEDIA_SCHEMA, decode_images
from wiki_references_db_spark.queries import register
from wiki_references_db_spark.tables import load_table


def _media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "video")
        .otherwise("audio")
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        # null text is canonically the empty payload (both engines then
        # hash/measure the same zero-byte value).
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("metadata"),
    )


# DuckDB twin of operators.multimodal._fake_dims: digest byte j of
# md5(payload) as two hex nibbles.
def _md5_byte(j: int) -> str:
    nib = "(strpos('0123456789abcdef', substr(h, {p}, 1)) - 1)"
    hi = nib.format(p=2 * j + 1)
    lo = nib.format(p=2 * j + 2)
    return f"(16 * {hi} + {lo})"


@register(
    "multimodal_decode_stats",
    oracle=f"""
    WITH media AS (
        -- DuckDB 1.0 md5 takes VARCHAR and hashes its UTF-8 bytes, which
        -- are exactly the payload the Spark side decodes.
        SELECT doc_id AS media_id,
               md5(coalesce(text, '')) AS h,
               octet_length(encode(coalesce(text, ''))) AS payload_bytes
        FROM documents
        WHERE doc_id % 3 = 0
    )
    SELECT media_id,
           CAST(16 + {_md5_byte(0)} % 64 AS INT) AS width,
           CAST(16 + {_md5_byte(1)} % 64 AS INT) AS height,
           CAST(1 + {_md5_byte(2)} % 4 AS INT) AS channels,
           CAST(payload_bytes AS BIGINT) AS payload_bytes
    FROM media
    """,
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media decode through the real mapInPandas plumbing
    (Arrow-batched, typed schema) over a deterministic media table; the
    stub decoder's md5-derived dimensions give the pipeline an exact
    SQL oracle.  Swapping the stub for PIL/ffmpeg changes only the
    lambda body — the plan shape (binary column in, narrow typed frame
    out, no per-row Python) is what this query pins down."""
    media = _media_from_documents(spark, sf_dir)
    assert [f.name for f in media.schema.fields] == [
        f.name for f in MEDIA_SCHEMA.fields
    ]
    return decode_images(media)


@register(
    "multimodal_feature_extract",
    oracle=f"""
    WITH media AS (
        SELECT doc_id AS media_id, md5(coalesce(text, '')) AS h FROM documents
    )
    SELECT media_id,
           {", ".join(
               f"CAST(({_md5_byte(i)} - 128) AS DOUBLE) / 128.0 AS f{i}"
               for i in range(8)
           )}
    FROM media
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads through mapInPandas — the
    batch shape a real model-inference stage uses (Arrow batch of
    payloads in, fixed-dim float vector per row out).  The md5-seeded
    stub gives the plumbing an exact SQL oracle; swapping in a vision
    model changes only the lambda body, not the plan.

    The registered form projects the vector to scalar columns f0..f7
    (driver canonicalization contract: scalar output columns only —
    round-3 lesson; the array-typed operator ``extract_features`` stays
    available for pipeline composition).  Every k/128 value is exactly
    representable in float32 and float64, so the float->double widening
    is lossless and the oracle is exact."""
    from wiki_references_db_spark.operators.multimodal import extract_features

    feats = extract_features(_media_from_documents(spark, sf_dir), dim=8)
    return feats.select(
        "media_id",
        *[F.col("feature")[i].cast("double").alias(f"f{i}") for i in range(8)],
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH media AS (
        SELECT doc_id AS media_id,
               octet_length(encode(coalesce(text, ''))) AS blen
        FROM documents
        WHERE doc_id % 3 = 1
    )
    SELECT media_id,
           CAST(i AS INT) AS frame_index,
           CAST(LEAST(1024, blen - i * 1024) AS BIGINT) AS frame_bytes
    FROM media,
         UNNEST(generate_series(0,
             CAST(LEAST(8, GREATEST(1, blen // 1024)) AS BIGINT) - 1)) AS u(i)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling plumbing: one binary payload row fans out to
    multiple frame rows (byte-slice stand-ins for ffmpeg keyframe
    seeks).  The query projects frame sizes so the fan-out arithmetic —
    the part Spark owns — is value-hash-checked; the payload slices
    themselves stay binary-typed in the FRAMES schema."""
    from wiki_references_db_spark.operators.multimodal import sample_frames

    frames = sample_frames(_media_from_documents(spark, sf_dir))
    return frames.select(
        "media_id",
        "frame_index",
        F.length("frame_payload").cast("long").alias("frame_bytes"),
    )


@register(
    "multimodal_resize",
    oracle=f"""
    WITH media AS (
        SELECT doc_id AS media_id, md5(coalesce(text, '')) AS h FROM documents
        WHERE doc_id % 3 = 0
    )
    SELECT media_id,
           CAST(16 + {_md5_byte(0)} % 64 AS INT) AS src_width,
           CAST(16 + {_md5_byte(1)} % 64 AS INT) AS src_height,
           CAST(32 AS INT) AS width,
           CAST(32 AS INT) AS height,
           CAST(32 * 32 * (1 + {_md5_byte(2)} % 4) AS BIGINT) AS resized_bytes
    FROM media
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize plumbing (mapInPandas): source dims decoded from the
    payload, fixed 32x32 target, output buffer size src-channel-
    dependent — the stub mirror of a PIL resize stage, exact under the
    md5 fake so the driver hash-checks the whole path."""
    from wiki_references_db_spark.operators.multimodal import resize_images

    return resize_images(_media_from_documents(spark, sf_dir), 32, 32)


@register(
    "multimodal_audio_stats",
    oracle=f"""
    WITH rates AS (
        SELECT UNNEST([8000, 16000, 22050, 44100, 48000]) AS rate,
               UNNEST([0, 1, 2, 3, 4]) AS idx
    ),
    media AS (
        SELECT doc_id AS media_id,
               md5(coalesce(text, '')) AS h,
               octet_length(encode(coalesce(text, ''))) AS blen
        FROM documents
        WHERE doc_id % 3 = 2
    ),
    decoded AS (
        SELECT m.media_id, r.rate AS sample_rate,
               CAST(1 + {_md5_byte(1)} % 2 AS INT) AS n_channels,
               m.blen
        FROM media m
        JOIN rates r ON r.idx = {_md5_byte(0)} % 5
    )
    SELECT media_id,
           CAST(sample_rate AS INT) AS sample_rate,
           n_channels,
           CAST(blen * 1000 // (sample_rate * n_channels * 2) AS BIGINT)
               AS duration_ms,
           CAST(blen AS BIGINT) AS payload_bytes
    FROM decoded
    """,
)
def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode plumbing (mapInPandas): sample rate / channel count
    / PCM duration derived from the payload, completing the modality
    triple (image decode+resize, video frame-sample, audio decode).
    The md5-stub parameters give the path an exact SQL oracle; a real
    soundfile/ffprobe decode swaps in behind ``use_real_codecs``."""
    from wiki_references_db_spark.operators.multimodal import decode_audio

    return decode_audio(_media_from_documents(spark, sf_dir))


# --------------------------------------------------------------------------
# Perceptual-hash near-duplicate detection (band-blocked Hamming join)
# --------------------------------------------------------------------------

from wiki_references_db_spark.queries.training import (
    _TOKENS as _PH_TOKENS,
    _TOKENS_SQL as _PH_TOKENS_SQL,
)

_PHASH_MAX_HAMMING = 6
# Candidate-generation guards (both engines, mirrored exactly):
# - a band whose 16-token range lies entirely past the document's end is
#   all padding and carries no signal; at scale every short document
#   would land in one giant all-zero bucket and candidate pairs would go
#   quadratic (caught by tools/stress_scale.py at 10x: 23.8x growth).
#   A band is kept only if the document has at least one real token in
#   its range.
# - residual hot buckets (legitimately shared band values) are capped at
#   _PHASH_BAND_DF_CAP members, the same document-frequency discipline
#   as dedup_ngram_jaccard's shingle cap; pairs recallable only through
#   a hotter bucket are dropped (documented LSH recall tradeoff).
_PHASH_BAND_DF_CAP = 100


# 64-bit structural signature: bit j = parity of the length of token j
# (zero-padded past the document's end).  Unlike a digest, this is
# stable under token-REPLACEMENT edits, so genuinely near-identical
# payloads land at small Hamming distances — the property a real
# DCT pHash has for images, reproduced here within the stubbed-codec
# constraint (same fake-decode discipline as the rest of the family).
_SIG = """
array_join(transform(sequence(1, 64),
  j -> CASE WHEN j <= size(toks) THEN CAST(length(element_at(toks, j)) % 2 AS STRING)
            ELSE '0' END), '')
"""

_SIG_SQL = """
array_to_string(list_transform(range(1, 65),
  j -> CASE WHEN j <= len(toks) THEN CAST(length(toks[j]) % 2 AS VARCHAR)
            ELSE '0' END), '')
"""


# 1-bit band variants for multi-probe (both engines, identical): j=0 is
# the band itself, j=1..16 flips bit j.  Probing every 1-bit variant of
# ONE side's band keys guarantees a candidate for any pair with <=1
# differing bit in SOME shared valid band — and by pigeonhole, a pair
# within the Hamming budget of 6 spread over 4 bands always has such a
# band (when >=4 bands are shared).  Probe fan-out is 17x on one side
# only; keys stay 16-bit, so buckets stay uniform.
_PROBE_SQL = """
list_transform(range(0, 17), j -> CASE WHEN j = 0 THEN band_key
  ELSE concat(substr(band_key, 1, j - 1),
              CASE WHEN substr(band_key, j, 1) = '0' THEN '1' ELSE '0' END,
              substr(band_key, j + 1, 16 - j)) END)
"""


_PHASH_ORACLE = f"""
    WITH fp AS (
        SELECT media_id, {_SIG_SQL} AS sig, CAST(len(toks) AS BIGINT) AS n_toks
        FROM (
            SELECT doc_id AS media_id, {_PH_TOKENS_SQL} AS toks
            FROM documents WHERE doc_id % 3 = 0
        )
    ),
    bands AS (
        SELECT media_id, sig, b AS band_idx, substr(sig, 16 * b + 1, 16) AS band_key
        FROM fp, UNNEST([0, 1, 2, 3]) AS t(b)
        WHERE n_toks > 16 * b
    ),
    kept AS (
        SELECT * FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_key) AS bdf
            FROM bands
        ) WHERE bdf <= {_PHASH_BAND_DF_CAP}
    ),
    probes AS (
        SELECT media_id, sig, band_idx, p AS band_key
        FROM (SELECT media_id, sig, band_idx, {_PROBE_SQL} AS ps FROM bands),
             UNNEST(ps) AS u(p)
    ),
    pairs AS (
        SELECT DISTINCT a.media_id AS media_id_a, b.media_id AS media_id_b,
               a.sig AS sa, b.sig AS sb
        FROM probes a JOIN kept b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         AND a.media_id < b.media_id
    )
    SELECT media_id_a, media_id_b,
           CAST(len(list_filter(range(1, 65),
                i -> substr(sa, i, 1) <> substr(sb, i, 1))) AS INT) AS hamming
    FROM pairs
    WHERE len(list_filter(range(1, 65),
          i -> substr(sa, i, 1) <> substr(sb, i, 1))) <= {_PHASH_MAX_HAMMING}
    """


@register(
    "multimodal_phash_dedup",
    oracle=_PHASH_ORACLE,
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection over the image media
    table: 64-bit structural fingerprint per payload, 4x16-bit LSH bands
    with MULTI-PROBE candidate generation — one side explodes every
    1-bit variant of each band key (17 keys/band), the other side keeps
    exact keys, so any pair with <=1 differing bit in some shared valid
    band is guaranteed a candidate (pigeonhole: a <=6-flip pair with 4
    shared bands always has one).  Still an equi-join, never an
    all-pairs product; exact Hamming <= 6 verifies candidates only.

    With a real image codec a DCT pHash slots into the fingerprint
    column and the identical plan surfaces visually near-identical
    images; here the fingerprint is a token-length-parity signature of
    the payload so the corpus's genuine near-duplicates (not just exact
    copies) exercise the candidate join and the bit-distance verify with
    nonzero results.  Scale: one shuffle on (band_idx, band_key) reused
    by the bucket-size window and the self-join; degenerate padding
    bands are excluded and residual hot buckets capped (see
    _PHASH_BAND_DF_CAP above), so candidates stay near-linear in the
    corpus; probe fan-out is 17x rows on one join side but keys stay
    16-bit uniform (measured 2.2x wall on a 10x corpus); the 64-step
    Hamming fold runs only on candidates."""
    from wiki_references_db_spark.queries.training import _TOKENS

    media = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 0
    )
    # Spark-side representation is BIT-PACKED (the oracle keeps the
    # equivalent string form — only VALUES must match): the 64-bit
    # signature travels as two 32-bit halves (hi/lo bigints), band keys
    # are 16-bit ints, multi-probe variants are XORs with one-bit masks,
    # and the candidate Hamming distance is two bit_count(xor) calls —
    # replacing 17x string-concat probe keys and a 64-step per-candidate
    # substring fold with integer codegen, and shrinking the candidate
    # join's shuffle key from 16 chars to one int.  Flipping string
    # position j equals XOR with 1<<(16-j); the probe set enumerates all
    # 16 masks, so the generated key set is identical to the string
    # form's.
    fp = media.select(
        F.col("doc_id").alias("media_id"), F.expr(_TOKENS).alias("toks")
    ).select(
        "media_id",
        F.expr(_SIG).alias("sig"),
        F.expr("size(toks)").alias("n_toks"),
    ).select(
        "media_id",
        "n_toks",
        F.expr("CAST(conv(substring(sig, 1, 32), 2, 10) AS BIGINT)").alias("hi"),
        F.expr("CAST(conv(substring(sig, 33, 32), 2, 10) AS BIGINT)").alias("lo"),
    )
    bands = (
        fp.select(
            "media_id",
            "hi",
            "lo",
            "n_toks",
            F.explode(F.array(*[F.lit(b) for b in range(4)])).alias("band_idx"),
        )
        .filter(F.col("n_toks") > 16 * F.col("band_idx"))
        .withColumn(
            "band_key",
            F.expr(
                "CAST(CASE WHEN band_idx < 2"
                " THEN shiftright(hi, 16 * (1 - band_idx)) % 65536"
                " ELSE shiftright(lo, 16 * (3 - band_idx)) % 65536"
                " END AS INT)"
            ),
        )
    )
    w = Window.partitionBy("band_idx", "band_key")
    kept = bands.withColumn("bdf", F.count(F.lit(1)).over(w)).filter(
        F.col("bdf") <= _PHASH_BAND_DF_CAP
    )
    probes = bands.select(
        "media_id",
        "hi",
        "lo",
        "band_idx",
        F.explode(
            F.expr(
                "transform(sequence(0, 16), j -> CASE WHEN j = 0"
                " THEN band_key ELSE"
                " CAST(band_key ^ shiftleft(1, j - 1) AS INT) END)"
            )
        ).alias("band_key"),
    )
    a = probes.select(
        F.col("media_id").alias("media_id_a"),
        F.col("hi").alias("ha"),
        F.col("lo").alias("la"),
        "band_idx",
        "band_key",
    )
    b = kept.select(
        F.col("media_id").alias("media_id_b"),
        F.col("hi").alias("hb"),
        F.col("lo").alias("lb"),
        "band_idx",
        "band_key",
    )
    pairs = (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("media_id_a") < F.col("media_id_b"))
        .select("media_id_a", "media_id_b", "ha", "la", "hb", "lb")
        .dropDuplicates(["media_id_a", "media_id_b"])
        .withColumn(
            "hamming",
            F.expr("CAST(bit_count(ha ^ hb) + bit_count(la ^ lb) AS INT)"),
        )
    )
    return pairs.filter(F.col("hamming") <= _PHASH_MAX_HAMMING).select(
        "media_id_a", "media_id_b", "hamming"
    )


@register(
    "phash_recall_eval",
    oracle=f"""
    WITH detected AS ({_PHASH_ORACLE}),
    fp AS (
        SELECT media_id, CAST({_SIG_SQL.strip()} AS BIT) AS sigbit,
               CAST(len(toks) AS BIGINT) AS n_toks
        FROM (
            SELECT doc_id AS media_id, {_PH_TOKENS_SQL} AS toks
            FROM documents WHERE doc_id % 3 = 0
        )
    ),
    elig AS (SELECT media_id, sigbit FROM fp WHERE n_toks >= 16),
    truth AS (
        SELECT a.media_id AS media_id_a, b.media_id AS media_id_b
        FROM elig a JOIN elig b ON a.media_id < b.media_id
        WHERE bit_count(xor(a.sigbit, b.sigbit)) <= 6
    ),
    det_elig AS (
        SELECT d.media_id_a, d.media_id_b FROM detected d
        JOIN elig ea ON ea.media_id = d.media_id_a
        JOIN elig eb ON eb.media_id = d.media_id_b
    ),
    hits AS (
        SELECT t.media_id_a FROM truth t
        JOIN det_elig d
          ON d.media_id_a = t.media_id_a AND d.media_id_b = t.media_id_b
    )
    SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
           (SELECT COUNT(*) FROM det_elig) AS n_detected,
           (SELECT COUNT(*) FROM hits) AS n_hits,
           CASE WHEN (SELECT COUNT(*) FROM truth) = 0 THEN NULL
                ELSE CAST((SELECT COUNT(*) FROM hits) AS DOUBLE)
                     / (SELECT COUNT(*) FROM truth) END AS recall
    """,
)
def phash_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the banded phash detector against EXACT
    Hamming ground truth — the eval harness for the newest dedup
    operator, same discipline as dedup_lsh_recall_curve / ann_*_recall:
    an approximate index ships with its measured quality.

    Scored over SIGNAL-BEARING pairs only (both documents >= 16 tokens,
    i.e. at least one full band of real parities): for shorter payloads
    the padding positions dominate the 64-bit distance and any two tiny
    documents measure "near" without being similar — the same floor a
    real DCT pHash has for thumbnail-sized images.  Ground truth is the
    full eligible pair space, no sampling, via packed bit arithmetic
    (four 16-bit words per signature, Hamming = sum of bit_count(xor) —
    whole-stage codegen, so even the sf0.1 pair space is seconds; at
    real scale you sample the query side, which changes the estimator,
    not the plan).  With multi-probe the
    pigeonhole guarantee covers pairs sharing all four valid bands;
    the remaining misses are SHORT-document pairs (<64 tokens) whose
    flips concentrate in their few shared valid bands — this eval
    prices exactly that residual loss (recall 1.0 / 0.63 / 0.46 at
    sf0.001/0.01/0.1)."""
    det = multimodal_phash_dedup(spark, sf_dir)
    media = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 0
    )
    words = [
        F.conv(F.expr(f"substring(sig, {16 * b + 1}, 16)"), 2, 10)
        .cast("long")
        .alias(f"w{b}")
        for b in range(4)
    ]
    fp = (
        media.select(
            F.col("doc_id").alias("media_id"),
            F.expr(_PH_TOKENS).alias("toks"),
        )
        .select(
            "media_id",
            F.expr(_SIG).alias("sig"),
            F.expr("size(toks)").alias("n_toks"),
        )
        .filter(F.col("n_toks") >= 16)
        .select("media_id", *words)
    )
    a = fp.select(
        F.col("media_id").alias("media_id_a"),
        *[F.col(f"w{b}").alias(f"a{b}") for b in range(4)],
    )
    b_side = fp.select(
        F.col("media_id").alias("media_id_b"),
        *[F.col(f"w{b}").alias(f"b{b}") for b in range(4)],
    )
    hamming = sum(
        F.bit_count(F.expr(f"a{i} ^ b{i}")) for i in range(4)
    )
    truth = (
        a.join(F.broadcast(b_side), F.col("media_id_a") < F.col("media_id_b"))
        .filter(hamming <= 6)
        .select("media_id_a", "media_id_b")
    )
    elig = fp.select("media_id")
    det_elig = (
        det.join(
            F.broadcast(elig.withColumnRenamed("media_id", "media_id_a")),
            "media_id_a",
            "left_semi",
        )
        .join(
            F.broadcast(elig.withColumnRenamed("media_id", "media_id_b")),
            "media_id_b",
            "left_semi",
        )
        .select("media_id_a", "media_id_b")
    )
    hits = truth.join(det_elig, ["media_id_a", "media_id_b"], "left_semi")
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    n_det = det_elig.agg(F.count(F.lit(1)).alias("n_detected"))
    n_hits = hits.agg(F.count(F.lit(1)).alias("n_hits"))
    out = n_truth.join(F.broadcast(n_det)).join(F.broadcast(n_hits))
    return out.select(
        "n_truth",
        "n_detected",
        "n_hits",
        F.when(
            F.col("n_truth") > 0,
            F.col("n_hits").cast("double") / F.col("n_truth"),
        ).alias("recall"),
    )
