"""Property-based invariants (hypothesis) for the operators whose
correctness is an algebraic identity, complementing the fixture-bound
oracle suite with adversarial small inputs: skewed keys, empty groups,
single rows, boundary timestamps.

Examples are kept few (each runs Spark jobs); the point is shrunk
counterexamples on structural edge cases, not volume.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

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
             "q_global_enumerate"]
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
