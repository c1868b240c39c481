"""Pins the bit-faithful reference-flush emulation (SURVEY.md §2.4 quirks
1-5) against hand-computed streams, and checks the streaming operator
(applyInPandasWithState) agrees with the pure-Python state machine."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from kafka_go_cardinality_spark.streaming.ref_emulation import (
    _process_grain,
    interval_from,
    reference_flush_emulation,
)

DAY = 86_400


def run(grain, events):
    out, last_flush, uids = _process_grain(grain, events, 0, set())
    return out, last_flush, uids


def test_startup_artifact_quirk3():
    """First realistic event flushes immediately with Timestamp=0, Value=1:
    ts - interval_from(0) > 0 holds for every grain at modern epochs."""
    ts = 1_700_000_000
    for grain in ("minute", "day", "week", "month", "year"):
        out, last_flush, uids = run(grain, [(ts, "u1")])
        assert out == [(f"{grain}_count", 0, 1)], grain
        assert last_flush == ts and uids == set()


def test_insert_before_check_quirk1():
    """The event that triggers a flush is already counted — and is NOT
    carried into the next window."""
    t0 = 1_700_000_000
    events = [(t0, "a"), (t0 + 10, "b"), (t0 + 100, "c")]  # minute grain
    out, _, uids = run("minute", events)
    # event 1 -> startup flush {a}; events 2,3: c lands at +100 > t0+60,
    # flushing {b, c} with window start t0 (the previous flush time).
    assert out == [("minute_count", 0, 1), ("minute_count", t0, 2)]
    assert uids == set()  # triggering event consumed by the flush


def test_data_driven_drift_quirk2():
    """Windows start at the closing event's ts, not at :00 boundaries."""
    t0 = 1_700_000_000
    out, _, _ = run(
        "minute", [(t0, "a"), (t0 + 75, "b"), (t0 + 155, "c")]
    )
    # t0+75 closes the startup window (start 0); t0+155 is 80s after the
    # new lastFlush t0+75 -> closes window with start t0+75 (drifted).
    assert [o[1] for o in out] == [0, t0, t0 + 75]


def test_no_final_partial_window_quirk5():
    t0 = 1_700_000_000
    out, last_flush, uids = run("minute", [(t0, "a"), (t0 + 30, "b")])
    assert out == [("minute_count", 0, 1)]  # only the startup flush
    assert last_flush == t0 and uids == {"b"}  # partial window retained


def test_uint64_underflow_quirk4():
    """ts < interval wraps (ts - interval) to ~2^64 > lastFlush -> flush."""
    out, _, _ = run("year", [(5, "a")])
    assert out == [("year_count", 0, 1)]


def test_interval_from_calendar_go_adddate():
    """Month/year intervals recomputed from the flush timestamp with Go's
    AddDate normalization (UTC)."""
    # 2024-01-31 00:00:00 UTC + 1 month = Mar 2 (Feb 29 in 2024 rolls over)
    jan31 = 1_706_659_200
    assert interval_from("month", jan31) == 31 * DAY  # Jan31 -> Mar 2 = 31 d
    # 2023-03-15: +1 month = Apr 15 = 31 days
    mar15 = 1_678_838_400
    assert interval_from("month", mar15) == 31 * DAY
    # leap year: 2024-02-29 + 1 year = Mar 1 2025 (366 days)
    feb29 = 1_709_164_800
    assert interval_from("year", feb29) == 366 * DAY
    assert interval_from("minute", 0) == 60
    assert interval_from("day", 0) == DAY
    assert interval_from("week", 0) == 7 * DAY


def test_exact_vs_reference_trace():
    """A longer randomized-but-fixed stream against an independently
    written simulation of processor.go's loop."""
    import random

    rng = random.Random(1234)
    ts, events = 1_690_000_000, []
    for _ in range(500):
        ts += rng.randrange(0, 3600)
        events.append((ts, f"user{rng.randrange(0, 40)}"))

    def simulate(grain):  # straight transliteration of the spec in SURVEY §2.4
        flush, seen, res = 0, set(), []
        iv = interval_from(grain, flush)
        for t, u in events:
            seen.add(u)
            if (t - iv) % (1 << 64) > flush:
                res.append((f"{grain}_count", flush, len(seen)))
                seen, flush = set(), t
                iv = interval_from(grain, t)
        return res

    for grain in ("minute", "day", "week", "month", "year"):
        out, _, _ = run(grain, events)
        assert out == simulate(grain), grain


def test_streaming_operator_matches_state_machine(spark, tmp_path):
    """End-to-end: the applyInPandasWithState operator over a file replay
    produces exactly the pure-Python trace for every grain."""
    import json

    rng_events = []
    ts = 1_690_000_000
    import random

    rng = random.Random(7)
    for _ in range(300):
        ts += rng.randrange(0, 7200)
        rng_events.append((ts, f"user{rng.randrange(0, 25)}"))
    wire = tmp_path / "wire"
    wire.mkdir()
    (wire / "part-0.jsonl").write_text(
        "\n".join(json.dumps({"uid": u, "ts": t}) for t, u in rng_events)
    )

    from kafka_go_cardinality_spark.streaming import (
        file_user_source,
        parse_user_events,
        replay_to_memory,
    )

    parsed = parse_user_events(file_user_source(spark, str(wire)))
    name = f"t_{uuid.uuid4().hex[:8]}"
    replay_to_memory(
        reference_flush_emulation(parsed), name, output_mode="append"
    )
    got = {
        (r["type"], r["timestamp"], r["value"])
        for r in spark.table(name).collect()
    }
    ordered = sorted(rng_events)  # the operator's documented (ts, uid) order
    exp = set()
    for grain in ("minute", "day", "week", "month", "year"):
        out, _, _ = _process_grain(grain, ordered, 0, set())
        exp.update(out)
    assert got == exp
