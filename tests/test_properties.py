"""Property-based checks (hypothesis) for the invariants the engine's
content-addressing depends on:

- ``normalize_wikitext`` is idempotent — a normalized string re-normalizes
  to itself, so ``normalized_sha1`` is a stable identity no matter how many
  times text flows through the pipeline.
- Named-parameter order never changes identity — the whole point of
  normalization (reference:README.md:6) is that two formattings of one
  citation hash identically.
- ``distinct_on`` picks exactly the minimal row per key under its order
  spec (deterministic survivor, SURVEY §2.3 D2 / W2).
"""

from __future__ import annotations

import random

from hypothesis import given, settings, strategies as st

from wiki_references_db_spark.functions.wikitext import get_sha1, normalize_wikitext

# ---------------------------------------------------------------------------
# Wikitext generators: template soup that exercises the normalizer's rules
# (whitespace folding, param alphabetization, name capitalization).
# ---------------------------------------------------------------------------

_name = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=10
).map(lambda s: s.strip("_") or "x")
_value = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789 .,-:/",
    min_size=0,
    max_size=30,
)


@st.composite
def template(draw):
    name = draw(_name)
    n_named = draw(st.integers(0, 5))
    n_pos = draw(st.integers(0, 3))
    parts = [name]
    parts += [draw(_value) for _ in range(n_pos)]
    keys = draw(
        st.lists(_name, min_size=n_named, max_size=n_named, unique=True)
    )
    for k in keys:
        parts.append(f"{k} = {draw(_value)}")
    sep = draw(st.sampled_from(["|", " | ", "\n| ", "  |"]))
    return "{{" + sep.join(parts) + "}}"


@st.composite
def wikitext(draw):
    pieces = draw(
        st.lists(
            st.one_of(
                _value,
                template(),
                st.just("<ref name=x>http://e.example/a</ref>"),
                st.just("<nowiki>{{ raw | kept }}</nowiki>"),
            ),
            min_size=1,
            max_size=5,
        )
    )
    return " ".join(pieces)


@given(wikitext())
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent(text):
    once = normalize_wikitext(text)
    assert once is not None
    assert normalize_wikitext(once) == once


@given(template())
@settings(max_examples=200, deadline=None)
def test_normalize_param_order_invariant(tpl):
    """Shuffling named parameters (keeping positional order) never changes
    the normalized form, hence never changes normalized_sha1."""
    inner = tpl[2:-2]
    parts = inner.split("|")
    head, params = parts[0], parts[1:]
    named = [p for p in params if "=" in p]
    pos = [p for p in params if "=" not in p]
    rng = random.Random(get_sha1(tpl))
    shuffled_named = named[:]
    rng.shuffle(shuffled_named)
    # Positional params keep their relative order; named ones move freely.
    variant = "{{" + "|".join([head] + pos + shuffled_named) + "}}"
    original = "{{" + "|".join([head] + pos + named) + "}}"
    assert normalize_wikitext(variant) == normalize_wikitext(original)
    assert get_sha1(normalize_wikitext(variant)) == get_sha1(
        normalize_wikitext(original)
    )


def test_distinct_on_minimal_survivor(spark):
    """distinct_on(keys, order_by) returns exactly the min row per key —
    cross-checked against a plain-Python reduction on random data."""
    from pyspark.sql import functions as F

    from wiki_references_db_spark.operators.relational import distinct_on

    rng = random.Random(7)
    rows = [
        (rng.randrange(40), rng.randrange(1000), rng.randrange(1000), f"v{i}")
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "k int, o1 int, o2 int, payload string")
    got = {
        r.k: (r.o1, r.o2, r.payload)
        for r in distinct_on(df, ["k"], order_by=[F.col("o1"), F.col("o2"), F.col("payload")]).collect()
    }
    expect: dict[int, tuple] = {}
    for k, o1, o2, p in rows:
        cand = (o1, o2, p)
        if k not in expect or cand < expect[k]:
            expect[k] = cand
    assert got == expect


def test_salted_join_matches_plain_join(spark):
    """salted_join is result-identical to the plain equi-join."""
    import random

    from wiki_references_db_spark.operators.skew import salted_join

    rng = random.Random(11)
    big = spark.createDataFrame(
        [(rng.choice(["a", "b", "c"]), i) for i in range(3000)], "k string, v long"
    )
    small = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3), ("d", 4)], "k string, w long"
    )
    got = sorted(
        (r.k, r.v, r.w) for r in salted_join(big, small, ["k"], "v", n_salts=8).collect()
    )
    expect = sorted((r.k, r.v, r.w) for r in big.join(small, "k").collect())
    assert got == expect


# ---------------------------------------------------------------------------
# Extractor structural invariants over generated reference soup
# ---------------------------------------------------------------------------

_filler = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz ., \n", min_size=0, max_size=40
)


@st.composite
def ref_soup(draw):
    """Prose interleaved with well-formed references of each kind."""
    n = draw(st.integers(1, 5))
    parts = [draw(_filler)]
    for i in range(n):
        kind = draw(st.integers(0, 2))
        if kind == 0:
            body = f"<ref name=r{i}>https://s{i}.example/p</ref>"
        elif kind == 1:
            body = f"{{{{Sfn|Author{i}|200{i}|p={i}}}}}"
        else:
            body = f"{{{{cite web |url=https://w{i}.example/x |title=T{i}}}}}"
        parts.append(body)
        parts.append(draw(_filler))
    return "".join(parts)


@given(ref_soup())
@settings(max_examples=150, deadline=None)
def test_extract_offsets_slice_back_to_raw(text):
    """Every extracted reference's (offset_start, length) must slice the
    ORIGINAL text back to exactly its raw_reference — the invariant the
    whole citation-identity model depends on."""
    from wiki_references_db_spark.functions.extract import extract_references

    for ref in extract_references(text):
        off, ln = ref["offset_start"], ref["length"]
        assert text[off : off + ln] == ref["raw_reference"]


@given(ref_soup())
@settings(max_examples=150, deadline=None)
def test_extract_no_standalone_urls_from_inside_refs(text):
    """URLs captured inside <ref>/template references never reappear as
    standalone bare-URL references (D5,
    reference:tests/test_article_extract_references.py:44-46)."""
    from wiki_references_db_spark.functions.extract import extract_references

    refs = extract_references(text)
    spans = [
        (r["offset_start"], r["offset_start"] + r["length"]) for r in refs
    ]
    for i, (lo, hi) in enumerate(spans):
        for j, (lo2, hi2) in enumerate(spans):
            if i != j:
                # No reference may be strictly nested inside another.
                assert not (lo2 <= lo and hi <= hi2 and (lo, hi) != (lo2, hi2))


def test_connected_components_match_union_find(spark):
    """Randomized cross-check: the distributed label-propagation CC
    (operators/graph.py) must agree with a driver-side union-find on
    arbitrary graphs (the same invariant the oracle checks on the
    corpus edge set, here on adversarially random topologies)."""
    from wiki_references_db_spark.operators.graph import connected_components

    rng = random.Random(1234)
    for trial in range(4):
        n = rng.randint(2, 60)
        m = rng.randint(0, n * 2)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        # union-find ground truth with min-label canonicalization
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {}
        for v in range(n):
            root = find(v)
            comp = expected.setdefault(root, set())
            comp.add(v)
        canon = {
            v: min(members)
            for members in expected.values()
            for v in members
        }

        nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
        if edges:
            edf = spark.createDataFrame(edges, "src long, dst long")
        else:
            edf = spark.createDataFrame([], "src long, dst long")
        got = {
            r["id"]: r["component"]
            for r in connected_components(nodes, edf).collect()
        }
        assert got == canon, f"trial {trial}: n={n} edges={edges}"


@given(st.binary(max_size=64))
@settings(max_examples=300, deadline=None)
def test_parse_image_header_total_on_arbitrary_bytes(payload):
    """The header parser is total: any byte string either parses to a
    well-formed (format, w, h, channels) tuple or returns None — never
    raises (it runs inside mapInPandas where an exception kills the
    task)."""
    from wiki_references_db_spark.operators.multimodal import parse_image_header

    out = parse_image_header(payload)
    if out is not None:
        fmt, w, h, c = out
        assert fmt in ("png", "gif", "bmp", "jpeg")
        assert all(isinstance(v, int) for v in (w, h, c))


@given(st.binary(max_size=64))
@settings(max_examples=300, deadline=None)
def test_parse_wav_header_total_on_arbitrary_bytes(payload):
    """Totality twin for the audio parser: arbitrary bytes either parse
    to a well-formed (format, rate, channels, duration) or return None —
    never raise, never divide by zero on a zero byte_rate."""
    from wiki_references_db_spark.operators.multimodal import parse_wav_header

    out = parse_wav_header(payload)
    if out is not None:
        fmt, rate, nch, dur = out
        assert fmt == "wav"
        assert rate > 0 and nch > 0 and dur >= 0


@given(
    rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
    nch=st.integers(min_value=1, max_value=8),
    bits=st.sampled_from([8, 16, 24, 32]),
    n_data=st.integers(min_value=0, max_value=1 << 20),
)
@settings(max_examples=200, deadline=None)
def test_parse_wav_header_roundtrip(rate, nch, bits, n_data):
    """Synthesize a canonical RIFF/WAVE container (without materializing
    the data payload) and assert the parser recovers the exact encoding
    parameters and the PCM duration formula."""
    from wiki_references_db_spark.operators.multimodal import parse_wav_header

    byte_rate = rate * nch * bits // 8
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + nch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (nch * bits // 8).to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    # data chunk header only — the parser never reads payload bytes, so
    # a truncated body must still parse (streamed/headered blobs).
    body = b"WAVE" + fmt + b"data" + n_data.to_bytes(4, "little")
    p = b"RIFF" + (len(body) + n_data).to_bytes(4, "little") + body
    assert parse_wav_header(p) == ("wav", rate, nch, n_data * 1000 // byte_rate)


# ---------------------------------------------------------------------------
# Round-7 additions: PNG decode roundtrip and the URL-grammar column twin.
# ---------------------------------------------------------------------------


@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    ctype=st.sampled_from([0, 2, 4, 6]),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=6),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=120, deadline=None)
def test_png_decode_roundtrip_property(h, w, ctype, filters, seed):
    """decode_png_pixels inverts an independently written spec encoder
    for every (shape, color type, filter schedule) — the unfilter paths
    are exercised in arbitrary interleavings, not just fixed grids."""
    import numpy as np

    from tests.test_streaming_multimodal import _encode_png
    from wiki_references_db_spark.operators.multimodal import (
        _PNG_CHANNELS,
        decode_png_pixels,
    )

    ch = _PNG_CHANNELS[ctype]
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
    got = decode_png_pixels(_encode_png(px, ctype, 8, None, filters))
    assert got.shape == (h, w, ch)
    assert np.array_equal(got, px)


_url_path = st.one_of(
    st.just("/wiki/index.php"),
    st.just("/w/index.php"),
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789_", min_size=1, max_size=8
    ).map(lambda t: f"/wiki/{t}"),
    st.just("/article/5"),
    st.just("/"),
)
_qs = st.one_of(
    st.just(""),
    st.just("title=Apollo_11"),
    st.just("curid=1001"),
    st.just("title=Apollo_11&curid=7"),
    st.just("title="),
    st.just("curid="),
    st.just("title=&curid=7"),
    st.just("other=x"),
)


def test_url_grammar_twin_property(spark):
    """title_url_parts == parse_wikipedia_title_url over the full
    (path x query) grammar product — run as one Spark job over the
    cartesian grid rather than per-example sessions."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from wiki_references_db_spark.functions.resolve import (
        ALREADY_CURID,
        parse_wikipedia_title_url,
        title_url_parts,
    )

    paths = [
        "/wiki/index.php", "/w/index.php", "/wiki/Apollo_11", "/wiki/a_b",
        "/wiki/x", "/article/5", "/", "/wiki/index.php/extra",
    ]
    queries = [
        "", "title=Apollo_11", "curid=1001", "title=Apollo_11&curid=7",
        "title=", "curid=", "title=&curid=7", "other=x",
        "curid=7&title=Apollo_11",
    ]
    urls = [
        f"https://en.wikipedia.org{p}" + (f"?{q}" if q else "")
        for p in paths
        for q in queries
    ]
    df = spark.createDataFrame([Row(url=u) for u in urls])
    d, t, c = title_url_parts(F.col("url"))
    got = {
        r.url: (r.d, r.t, bool(r.c))
        for r in df.select("url", d.alias("d"), t.alias("t"), c.alias("c")).collect()
    }
    for u in urls:
        want = parse_wikipedia_title_url(u)
        d_, t_, c_ = got[u]
        if want is ALREADY_CURID:
            assert c_ and t_ is None, (u, got[u])
        elif want is None:
            assert not c_ and (t_ is None or not d_), (u, got[u])
        else:
            assert (d_, t_) == want and not c_, (u, got[u], want)


@given(
    n_colors=st.sampled_from([4, 8, 16]),
    h=st.integers(1, 10),
    w=st.integers(1, 14),
    interlaced=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=80, deadline=None)
def test_gif_lzw_roundtrip_property(n_colors, h, w, interlaced, seed):
    """decode_gif_pixels inverts the independent test LZW encoder over
    arbitrary index grids, palette sizes, and interlacing."""
    import numpy as np

    from tests.test_streaming_multimodal import _encode_gif
    from wiki_references_db_spark.operators.multimodal import decode_gif_pixels

    rng = np.random.RandomState(seed)
    pal = bytes(rng.randint(0, 256, size=3 * n_colors).tolist())
    idx = rng.randint(0, n_colors, size=(h, w)).astype(np.uint8)
    got = decode_gif_pixels(_encode_gif(idx, pal, interlaced=interlaced))
    want = np.frombuffer(pal, dtype=np.uint8).reshape(n_colors, 3)[idx]
    assert np.array_equal(got, want)


@given(
    fmt=st.sampled_from(["png", "gif", "bmp", "bmp8", "wav"]),
    cut=st.floats(0.02, 0.98),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=120, deadline=None)
def test_image_decode_truncation_never_hangs_or_garbles(fmt, cut, seed):
    """Corrupt blobs are a fact of life in a 100 TB media corpus: for
    ANY truncation point, decode either raises a clean error or returns
    exactly the full-payload result (a cut after the image data is
    legal) — never hangs, never returns silently different pixels.
    (This property caught the 2^255-dictionary LZW hang.)"""
    import numpy as np

    from tests.test_streaming_multimodal import (
        _encode_bmp,
        _encode_gif,
        _encode_png,
        _encode_wav,
        _rng_px,
    )
    from wiki_references_db_spark.operators.multimodal import (
        decode_image_pixels,
        decode_wav_samples,
    )

    rng = np.random.RandomState(seed)
    if fmt == "wav":
        sam = rng.uniform(-0.9, 0.9, size=(30, 2))
        payload = _encode_wav(sam, 8000, bits=16)
        full, rate = decode_wav_samples(payload)
        k = max(1, int(len(payload) * cut))
        try:
            got, rate2 = decode_wav_samples(bytes(payload[:k]))
        except (ValueError, NotImplementedError):
            return
        assert rate2 == rate and np.array_equal(got, full), (fmt, k)
        return
    if fmt == "png":
        px = rng.randint(0, 256, size=(6, 5, 3)).astype(np.uint8)
        payload = _encode_png(px, 2, 8, None, [0, 1, 2, 3, 4])
    elif fmt == "gif":
        pal = bytes(range(24))
        idx = rng.randint(0, 8, size=(6, 5)).astype(np.uint8)
        payload = _encode_gif(idx, pal)
    elif fmt == "bmp":
        px = rng.randint(0, 256, size=(6, 5, 3)).astype(np.uint8)
        payload = _encode_bmp(px, 24)
    else:
        pal = [(int(a), int(b), int(c))
               for a, b, c in rng.randint(0, 256, size=(16, 3))]
        idx = rng.randint(0, 16, size=(6, 5)).astype(np.uint8)
        payload = _encode_bmp(idx, 8, palette=pal)
    full = decode_image_pixels(payload)
    k = max(1, int(len(payload) * cut))
    try:
        got = decode_image_pixels(bytes(payload[:k]))
    except (ValueError, NotImplementedError):
        return
    except Exception as e:  # zlib etc. surface as clean errors too
        assert type(e).__name__ in ("error",), type(e)
        return
    assert np.array_equal(got, full), (fmt, k, len(payload))
