"""Property tests for the round-13 batch-3 operators: the SimHash
pigeonhole Hamming pair join and its streaming corpus-probe twin.
Oracle parity is covered registry-wide by tests/test_oracle_parity.py;
these pin the SEMANTICS — pigeonhole losslessness against an all-pairs
brute force, and stream/batch agreement on the same split."""

from pyspark.sql import functions as F

from wiki_references_db_spark.queries import all_queries


def _hamming(a: str, b: str) -> int:
    return sum(1 for x, y in zip(a, b) if x != y)


def _fingerprints(spark, sf_dir):
    from wiki_references_db_spark.queries.training import _simhash_fp_frame

    return {
        r["doc_id"]: r["simhash64"]
        for r in _simhash_fp_frame(spark, sf_dir).collect()
    }


# --------------------------------------------------------------------------
# simhash_hamming_pairs
# --------------------------------------------------------------------------


def test_simhash_pairs_lossless_vs_all_pairs_brute_force(spark, sf_dir):
    # Pigeonhole claim: EVERY pair within Hamming <= 3 is found (no
    # recall loss), and nothing else is.  At sf0.001 (500 docs) no
    # (block, value) bucket approaches the 1000-doc cap, so the join
    # must equal the exact all-pairs answer — both directions checked.
    from wiki_references_db_spark.queries.training import _SIMHASH_HAM_K

    fps = _fingerprints(spark, sf_dir)
    want = {
        (a, b, _hamming(fps[a], fps[b]))
        for a in fps
        for b in fps
        if a < b and _hamming(fps[a], fps[b]) <= _SIMHASH_HAM_K
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in all_queries()["simhash_hamming_pairs"](
            spark, sf_dir
        ).collect()
    }
    assert got == want
    assert want, "corpus produced no near pairs (vacuous)"


def test_simhash_pairs_block_cap_is_only_loss(spark, sf_dir):
    # The documented loss condition: a pair is dropped only if EVERY
    # 16-bit block the two fingerprints agree on exactly is a bucket
    # holding > _SIMHASH_BLOCK_CAP docs.  Verify the cap is inert at
    # this SF (max bucket population far below the cap), so the
    # losslessness above is the cap-free regime by construction.
    from wiki_references_db_spark.queries.training import _SIMHASH_BLOCK_CAP

    fps = _fingerprints(spark, sf_dir)
    buckets = {}
    for fp in fps.values():
        for b in range(4):
            k = (b, fp[b * 16 : (b + 1) * 16])
            buckets[k] = buckets.get(k, 0) + 1
    assert max(buckets.values()) <= _SIMHASH_BLOCK_CAP


def test_simhash_pairs_ordering_and_bounds(spark, sf_dir):
    from wiki_references_db_spark.queries.training import _SIMHASH_HAM_K

    rows = all_queries()["simhash_hamming_pairs"](spark, sf_dir).collect()
    seen = set()
    for r in rows:
        assert r["doc_a"] < r["doc_b"], "pairs must be canonical a<b"
        assert 0 <= r["hamming"] <= _SIMHASH_HAM_K
        key = (r["doc_a"], r["doc_b"])
        assert key not in seen, "pair emitted twice"
        seen.add(key)


# --------------------------------------------------------------------------
# stream_simhash_vs_corpus
# --------------------------------------------------------------------------


def test_stream_simhash_matches_static_recompute(spark, sf_dir):
    # The streaming probe's union-of-batches output must equal a
    # from-scratch static recompute of the same split (new = doc_id %
    # 10 == 0 vs corpus = rest): same pairs, same exact Hamming.
    from wiki_references_db_spark.queries.training import _SIMHASH_HAM_K

    fps = _fingerprints(spark, sf_dir)
    want = {
        (n, c, _hamming(fps[n], fps[c]))
        for n in fps
        if n % 10 == 0
        for c in fps
        if c % 10 != 0 and _hamming(fps[n], fps[c]) <= _SIMHASH_HAM_K
    }
    got = {
        (r["new_doc"], r["corpus_doc"], r["hamming"])
        for r in all_queries()["stream_simhash_vs_corpus"](
            spark, sf_dir
        ).collect()
    }
    assert got == want
    assert want, "split produced no stream-vs-corpus pairs (vacuous)"


def test_stream_simhash_sides_disjoint(spark, sf_dir):
    df = all_queries()["stream_simhash_vs_corpus"](spark, sf_dir)
    bad = df.filter(
        (F.col("new_doc") % 10 != 0) | (F.col("corpus_doc") % 10 == 0)
    ).count()
    assert bad == 0, "a pair crossed the stream/corpus split"
