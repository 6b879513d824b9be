"""Semantic (hand-verified) tests for the late-round-4 operators —
containment dedup, BPE pair-merge, triangle counting — on crafted
inputs with expectations derived BY HAND, independent of the DuckDB
oracle cross-check (two engines can agree on a shared spec bug; these
pin the spec itself)."""

import os

from wiki_references_db_spark.queries import all_queries


def _write(df, out, name):
    df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))


def test_containment_flags_subset_doc(spark, tmp_path):
    sf = str(tmp_path)
    short = "alpha beta gamma delta epsilon"
    long_ = short + " zeta eta theta iota kappa lambda mu nu xi"
    docs = spark.createDataFrame(
        [(1, short), (2, long_), (3, "one two three four five")],
        "doc_id long, text string",
    )
    _write(docs, sf, "documents")
    rows = all_queries()["dedup_substring_containment"](spark, sf).collect()
    # doc1 has 3 word-3-gram shingles, all present in doc2 (12 shingles
    # total there): containment 1.0 one way, 3/12 the other; doc3 shares
    # nothing with anyone.
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["cont_a_in_b"] == 1.0
    assert abs(r["cont_b_in_a"] - 3 / 12) < 1e-12
    spark.catalog.clearCache()


def test_bpe_merge_is_the_argmax_and_applies_left_to_right(spark, tmp_path):
    sf = str(tmp_path)
    # Word freqs: foo x3, bar x3.  Iter-1 pairs all tie at 3 ('a r',
    # 'b a', 'f o', 'o o') -> argmax tie-break is lexicographic: 'a r'.
    # After merging 'a r' -> 'ar': bar = ['b','ar'], foo unchanged.
    docs = spark.createDataFrame(
        [(1, "foo foo bar"), (2, "foo bar bar")], "doc_id long, text string"
    )
    _write(docs, sf, "documents")
    rows = all_queries()["bpe_pair_merge"](spark, sf).collect()
    it1 = {r["rnk"]: (r["pair"], r["cnt"]) for r in rows if r["iter"] == 1}
    it2 = {r["rnk"]: (r["pair"], r["cnt"]) for r in rows if r["iter"] == 2}
    assert it1 == {1: ("a r", 3), 2: ("b a", 3), 3: ("f o", 3), 4: ("o o", 3)}
    assert it2 == {1: ("b ar", 3), 2: ("f o", 3), 3: ("o o", 3)}


def test_triangle_count_on_known_graph(spark, tmp_path):
    sf = str(tmp_path)
    # Co-supplier graph: order 10 -> clique {1,2,3}; orders 11/12 ->
    # path edges (3,4), (4,5).  Exactly one triangle {1,2,3}; every
    # degree is far below the 8-neighbor backbone cap, so the cap is
    # the identity here.
    li = spark.createDataFrame(
        [(10, 1), (10, 2), (10, 3), (11, 3), (11, 4), (12, 4), (12, 5)],
        "l_orderkey long, l_suppkey long",
    )
    _write(li, sf, "lineitem")
    rows = all_queries()["triangle_count_cosupplier"](spark, sf).collect()
    got = {r["node"]: (r["n_triangles"], r["degree"]) for r in rows}
    assert got == {1: (1, 2), 2: (1, 2), 3: (1, 3)}
    # The query persists its backbone relations; honor its documented
    # cache-lifetime contract.
    spark.catalog.clearCache()


def test_paragraph_dedup_keeps_first_occurrence_only(spark, tmp_path):
    sf = str(tmp_path)
    block_a = " ".join(f"a{i}" for i in range(10))   # one 10-token passage
    block_b = " ".join(f"b{i}" for i in range(10))
    block_c = " ".join(f"c{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, block_a),                       # 1 passage
            (2, block_a + " " + block_b),       # passage 1 duplicates doc1's
            (3, block_c),                       # unique
        ],
        "doc_id long, text string",
    )
    _write(docs, sf, "documents")
    rows = {
        r["doc_id"]: r
        for r in all_queries()["dedup_paragraphs_global"](spark, sf).collect()
    }
    assert (rows[1]["n_paras"], rows[1]["n_kept"]) == (1, 1)
    assert (rows[2]["n_paras"], rows[2]["n_kept"]) == (2, 1)
    assert rows[2]["retained_frac"] == 0.5
    assert (rows[3]["n_paras"], rows[3]["n_kept"]) == (1, 1)
    import hashlib
    # doc2's reassembled survivor text is exactly its second block
    assert rows[2]["kept_md5"] == hashlib.md5(block_b.encode()).hexdigest()


def _write_events(spark, sf, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")


def test_time_weighted_avg_hand_computed(spark, tmp_path):
    """User holds value 10.0 for 30s then 20.0 for 10s: the TWA is
    (10*30 + 20*10) / 40 = 12.5 — NOT the arithmetic mean 15."""
    from datetime import datetime

    sf = str(tmp_path)
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 7, "click", 10.0, "{}"),
        (2, datetime(2024, 1, 1, 0, 0, 30), 7, "click", 20.0, "{}"),
        (3, datetime(2024, 1, 1, 0, 0, 40), 7, "click", 99.0, "{}"),  # last: no segment
    ]
    _write_events(spark, sf, rows)
    out = all_queries()["events_time_weighted_avg"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["user_id"] == 7
    assert r["n_segments"] == 2
    assert r["span_us"] == 40_000_000
    assert abs(r["twa"] - 12.5) < 1e-9


def test_rolling_wau_counts_user_once_per_window(spark, tmp_path):
    """One user active on 2 days within the same week must count ONCE in
    the windows covering both days (the double-count the DAU-sum
    explicitly gets wrong), and an interior dead day still reports the
    actives of its trailing window."""
    from datetime import datetime

    sf = str(tmp_path)
    rows = [
        (1, datetime(2024, 3, 1, 10, 0), 1, "view", 1.0, "{}"),
        (2, datetime(2024, 3, 3, 10, 0), 1, "view", 1.0, "{}"),  # same user, day 3
        (3, datetime(2024, 3, 3, 11, 0), 2, "view", 1.0, "{}"),
    ]
    _write_events(spark, sf, rows)
    out = {
        r["day"]: r["wau"]
        for r in all_queries()["events_rolling_wau"](spark, sf).collect()
    }
    # axis = 2024-03-01 .. 2024-03-03 (min..max active days)
    assert out == {"2024-03-01": 1, "2024-03-02": 1, "2024-03-03": 2}


def test_incident_window_join_hand_computed(spark, tmp_path):
    """Purchases inside [err-5min, err+5min): boundary semantics — a
    purchase exactly at err+5min is OUT (half-open), one at err-5min is
    IN, across bucket boundaries."""
    from datetime import datetime, timedelta

    sf = str(tmp_path)
    err_t = datetime(2024, 1, 1, 12, 2, 30)
    rows = [
        (1, err_t, 9, "error", 0.0, "{}"),
        (2, err_t - timedelta(minutes=5), 11, "purchase", 10.0, "{}"),          # IN (lo inclusive)
        (3, err_t + timedelta(minutes=5), 12, "purchase", 20.0, "{}"),          # OUT (hi exclusive)
        (4, err_t + timedelta(minutes=4, seconds=59), 11, "purchase", 5.0, "{}"),  # IN, same buyer
        (5, err_t - timedelta(minutes=6), 13, "purchase", 7.0, "{}"),           # OUT
    ]
    _write_events(spark, sf, rows)
    out = all_queries()["events_in_incident_windows"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["incident_id"] == 1
    assert r["n_purchases"] == 2
    assert r["n_buyers"] == 1
    assert abs(r["total_value"] - 15.0) < 1e-9


def test_ols_trend_hand_computed_and_null_excluded(spark, tmp_path):
    """y = 2 + 0.5x on exact points -> slope 0.5, intercept 2; a
    NULL-value event in the same group must not perturb either (the
    round-4 review found n/sx counting rows that sqy/sxy skipped)."""
    from datetime import datetime, timedelta

    sf = str(tmp_path)
    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(seconds=10 * i), 1, "gauge", 2.0 + 0.5 * (10 * i), "{}")
        for i in range(5)
    ] + [(99, t0 + timedelta(seconds=1000), 1, "gauge", None, "{}")]
    _write_events(spark, sf, rows)
    out = all_queries()["events_value_trend_ols"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 5  # the NULL-value row is in no moment
    assert abs(r["slope"] - 0.5) < 1e-9
    assert abs(r["intercept"] - 2.0) < 1e-9


def test_backlog_curve_hand_computed(spark, tmp_path):
    """Two orders opening a day apart: the curve steps 1, 2, then back
    down 1, 0 at each +30d close; every running value is the true count
    of open intervals."""
    from datetime import datetime

    sf = str(tmp_path)
    o = spark.createDataFrame(
        [(1, datetime(2024, 1, 1)), (2, datetime(2024, 1, 2))],
        "o_orderkey long, o_orderdate timestamp",
    )
    o.write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    out = {
        r["day"]: (r["net_change"], r["open_orders"])
        for r in all_queries()["orders_open_backlog_curve"](spark, sf).collect()
    }
    assert out == {
        "2024-01-01": (1, 1),
        "2024-01-02": (1, 2),
        "2024-01-31": (-1, 1),
        "2024-02-01": (-1, 0),
    }
    # global_running_sum persists its ranged frame; honor the per-query
    # cache-lifetime contract.
    spark.catalog.clearCache()


def test_subtree_rollup_hand_computed(spark, tmp_path):
    """Forest parent(k) = k div 3 (only for k >= 3 — keys 0..2 are
    roots) over keys 0..8: node 1's subtree is {1, 3, 4, 5}, node 2's
    is {2, 6, 7, 8}, and node 0 — a root with NO children, since
    k div 3 = 0 only holds for k < 3 — is just {0}."""
    sf = str(tmp_path)
    c = spark.createDataFrame(
        [(k, float(10 * k)) for k in range(9)],
        "c_custkey long, c_acctbal double",
    )
    c.write.mode("overwrite").parquet(f"{sf}/customer.parquet")
    out = {
        r["node_id"]: (r["subtree_size"], r["subtree_acctbal"])
        for r in all_queries()["hierarchy_subtree_rollup"](spark, sf).collect()
    }
    assert out[1] == (4, 10.0 + 30.0 + 40.0 + 50.0)
    assert out[2] == (4, 20.0 + 60.0 + 70.0 + 80.0)
    assert out[0] == (1, 0.0)
    assert out[5] == (1, 50.0)


def test_incremental_dedup_reports_batch_pairs_only(spark, tmp_path):
    """doc 10 (batch: id % 10 == 0) duplicates corpus doc 11 -> the pair
    is reported; corpus docs 21 and 31 duplicate EACH OTHER but neither
    is in the batch -> no pair (the incremental contract: never
    corpus x corpus)."""
    sf = str(tmp_path)
    dup_a = " ".join(f"w{i}" for i in range(30))
    dup_b = " ".join(f"v{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(10, dup_a), (11, dup_a), (21, dup_b), (31, dup_b)],
        "doc_id long, text string",
    )
    _write(docs, sf, "documents")
    rows = all_queries()["dedup_incremental_batch"](spark, sf).collect()
    got = {(r["new_doc"], r["corpus_doc"]) for r in rows}
    assert got == {(10, 11)}
    spark.catalog.clearCache()
