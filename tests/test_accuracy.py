"""Accuracy self-assertions for the approximate operators (SURVEY.md
§5.2): the DataSketches HLL estimate at lg_k=14 must stay within 2% of
the exact twin on every window — mirroring the reference README's "<1%"
claim (/root/reference/README.md:4) with margin for a different
estimator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_go_cardinality_spark.operators.cardinality import (
    GRAINS,
    cardinality_error_bound,
)
from kafka_go_cardinality_spark.sources import load_table


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
@pytest.mark.parametrize("grain", GRAINS)
def test_approx_within_two_percent_of_exact(spark, sf, grain):
    """The reference's one published number (README.md:4, "<1%" HLL
    error, generous 2% here for a different estimator) — proven at BOTH
    the quick-loop scale and the driver's checking scale, since sketch
    error is cardinality-dependent."""
    err = cardinality_error_bound(load_table(spark, sf, "events"), grain)
    worst = err.agg(F.max("rel_err").alias("m")).collect()[0]["m"]
    assert worst is not None and worst <= 0.02, f"{grain}: worst rel_err {worst}"


def test_sketch_rollup_matches_exact_months(spark, sf_dir):
    """Merging day sketches (hll_union_agg) must estimate month
    cardinality within 2% of the exact count — the re-aggregability
    guarantee the persisted-sketch path is built on."""
    from kafka_go_cardinality_spark.operators.cardinality import (
        cardinality,
        sketch_rollup,
    )

    events = load_table(spark, sf_dir, "events")
    exact = cardinality(events, "month", exact=True).select(
        "timestamp", F.col("value").alias("exact")
    )
    rolled = sketch_rollup(events).select("timestamp", F.col("value").alias("est"))
    err = exact.join(rolled, "timestamp", "full").select(
        (F.abs(F.col("est") - F.col("exact")) / F.col("exact")).alias("rel_err")
    )
    worst = err.agg(F.max("rel_err")).collect()[0][0]
    assert worst is not None and worst <= 0.02, f"worst rel_err {worst}"


def test_sketch_table_survives_parquet_roundtrip(spark, sf_dir, tmp_path):
    """The 100 TB sketch-table pattern made concrete: persist day-grain
    HLL sketches as a parquet BINARY column, read them back, and merge
    into month estimates — the estimate must be IDENTICAL to the
    all-in-memory merge (sketch bytes are the aggregation state; storage
    must not perturb them)."""
    from kafka_go_cardinality_spark.operators.cardinality import sketch_rollup
    from kafka_go_cardinality_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            F.date_trunc("day", "ts").alias("day"),
            F.col("user_id").cast("string").alias("uid"),
        )
        .groupBy("day")
        .agg(F.hll_sketch_agg("uid", F.lit(14)).alias("sk"))
    )
    path = str(tmp_path / "day_sketches")
    daily.write.mode("overwrite").parquet(path)
    merged = (
        spark.read.parquet(path)
        .select(F.date_trunc("month", "day").cast("long").alias("timestamp"), "sk")
        .groupBy("timestamp")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("value"))
    )
    from_disk = {(r["timestamp"], r["value"]) for r in merged.collect()}
    in_memory = {
        (r["timestamp"], r["value"]) for r in sketch_rollup(events).collect()
    }
    assert from_disk == in_memory


def test_bitmap_table_survives_parquet_roundtrip(spark, sf_dir, tmp_path):
    """Same persistence guarantee for the exact-count path: per-(day,
    bucket) bitmaps written to parquet, read back, OR-merged into month
    windows — must equal count(distinct) exactly."""
    from kafka_go_cardinality_spark.operators.cardinality import cardinality
    from kafka_go_cardinality_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    per_bucket = (
        events.select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .groupBy("day", F.bitmap_bucket_number(F.col("user_id")).alias("bucket"))
        .agg(
            F.bitmap_construct_agg(F.bitmap_bit_position(F.col("user_id"))).alias(
                "bm"
            )
        )
    )
    path = str(tmp_path / "day_bitmaps")
    per_bucket.write.mode("overwrite").parquet(path)
    merged = (
        spark.read.parquet(path)
        .select(F.date_trunc("month", "day").cast("long").alias("timestamp"), "bucket", "bm")
        .groupBy("timestamp", "bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .groupBy("timestamp")
        .agg(F.sum(F.bitmap_count("bm")).alias("value"))
    )
    got = {(r["timestamp"], r["value"]) for r in merged.collect()}
    exact = {
        (r["timestamp"], r["value"])
        for r in cardinality(events, "month", exact=True).collect()
    }
    assert got == exact


def test_fanout_rollup_matches_exact_within_bound(spark, sf_dir):
    """The sketch-algebra fan-out (one minute pass + union rollups) must
    estimate every (grain, window) within 2% of the exact fan-out — the
    union-of-sketches estimate carries the same rsd as a direct sketch
    of the union."""
    from kafka_go_cardinality_spark.operators.cardinality import (
        grain_fanout,
        grain_fanout_rollup,
    )
    from kafka_go_cardinality_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    exact = {
        (r["type"], r["timestamp"]): r["value"]
        for r in grain_fanout(events, exact=True).collect()
    }
    rolled = {
        (r["type"], r["timestamp"]): r["value"]
        for r in grain_fanout_rollup(events).collect()
    }
    assert set(exact) == set(rolled)
    for key, ev in exact.items():
        assert abs(rolled[key] - ev) / ev <= 0.02, (key, ev, rolled[key])


def test_incremental_sketch_rollup_equals_full_recompute(spark, sf_dir):
    """Incremental maintenance must be LOSSLESS: month estimates from
    (persisted day sketches ∪ last-7-days raw) are bit-identical to the
    full sketch_rollup recompute — HLL union is register-wise max, so
    the merge order and storage round-trip cannot change a single
    register."""
    from kafka_go_cardinality_spark.operators.cardinality import sketch_rollup
    from kafka_go_cardinality_spark.queries_cardinality import (
        q_card_sketch_incremental,
    )
    from kafka_go_cardinality_spark.sources import load_table

    full = {
        (r["type"], r["timestamp"]): r["value"]
        for r in sketch_rollup(load_table(spark, sf_dir, "events")).collect()
    }
    inc = {
        (r["type"], r["timestamp"]): r["value"]
        for r in q_card_sketch_incremental(spark, sf_dir).collect()
    }
    assert full == inc


def test_cms_never_undercounts(spark, sf_dir):
    """The count-min guarantee: est >= exact for every reported item, and
    the top-1 item's estimate is within the eps*N additive bound."""
    from kafka_go_cardinality_spark.operators.cardinality import (
        CMS_WIDTH,
        cms_heavy_hitters,
    )
    from kafka_go_cardinality_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    n = events.count()
    rows = cms_heavy_hitters(events, k=20).collect()
    assert rows
    assert all(r["cms_est"] >= r["exact"] for r in rows)
    # depth-4 min: overestimate beyond ~2e/width of the stream length is
    # astronomically unlikely; assert the loose single-row bound.
    assert all(r["cms_est"] - r["exact"] <= 2.0 * 2.718 * n / CMS_WIDTH for r in rows)


def test_ccnet_buckets_are_balanced_thirds(spark, sf_dir):
    """ntile(3) per language: bucket sizes differ by at most 1 within a
    language, and head always holds the lowest mean surprisal."""
    from kafka_go_cardinality_spark.operators.text import ccnet_buckets
    from kafka_go_cardinality_spark.sources import load_table

    rows = ccnet_buckets(load_table(spark, sf_dir, "documents")).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        sizes = {b: sum(1 for r in rs if r["bucket"] == b)
                 for b in ("head", "middle", "tail")}
        assert max(sizes.values()) - min(sizes.values()) <= 1, (lang, sizes)
        head_max = max(r["avg_nll_q"] for r in rs if r["bucket"] == "head")
        tail_min = min(r["avg_nll_q"] for r in rs if r["bucket"] == "tail")
        assert head_max <= tail_min or len(rs) < 3


def test_segment_overlap_sketch_accuracy(spark, sf_dir):
    """HLL inclusion-exclusion overlap must track the exact pairwise
    overlap: union within 2% (it's a direct HLL estimate), intersection
    within 5% of the PAIR's union size (inclusion-exclusion compounds
    the absolute errors of three estimates, so the honest bound is
    relative to the union, not the — possibly tiny — intersection)."""
    from kafka_go_cardinality_spark.operators.cardinality import (
        segment_overlap_exact,
        segment_overlap_sketch,
    )
    from kafka_go_cardinality_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    exact = {
        (r["type_a"], r["type_b"]): r
        for r in segment_overlap_exact(events).collect()
    }
    est = {
        (r["type_a"], r["type_b"]): r
        for r in segment_overlap_sketch(events).collect()
    }
    assert set(exact) == set(est) and exact
    for key, e in exact.items():
        s = est[key]
        assert abs(s["est_union"] - e["n_union"]) / e["n_union"] <= 0.02, (
            key,
            s["est_union"],
            e["n_union"],
        )
        assert abs(s["est_common"] - e["n_common"]) / e["n_union"] <= 0.05, (
            key,
            s["est_common"],
            e["n_common"],
        )


def test_pcsa_within_fifteen_percent_of_exact(spark, sf_dir):
    """PCSA at m=64 has ~10% theoretical rsd (0.78/√64); with the
    small-range correction every day-window must land within 15% of
    the exact distinct count."""
    from kafka_go_cardinality_spark.operators.cardinality import (
        cardinality,
        pcsa_cardinality,
    )
    from kafka_go_cardinality_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    exact = {
        r["timestamp"]: r["value"]
        for r in cardinality(events, "day", exact=True).collect()
    }
    est = {
        r["timestamp"]: r["est_users"]
        for r in pcsa_cardinality(events, "day").collect()
    }
    assert set(exact) == set(est) and exact
    for t, v in exact.items():
        # max(relative, absolute) floor: at the sf0.001 fixture a day
        # holds ~15 distinct users, where one bucket's worth of
        # granularity exceeds 15% — sketch error is lumpy below n ≈ m.
        assert abs(est[t] - v) <= max(0.15 * v, 5), (t, est[t], v)


def test_quantile_hist_within_bucket_width(spark, sf_dir):
    """Merged-histogram quantile estimates must land within one bucket
    width (2.0) of the exact month percentile — the error bound the
    fixed-boundary table buys by construction."""
    from pyspark.sql import functions as F

    from kafka_go_cardinality_spark.operators.cardinality import (
        QHIST_QS,
        quantile_hist_rollup,
    )
    from kafka_go_cardinality_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    est = {
        (r["month"], r["q"]): r["est_value"]
        for r in quantile_hist_rollup(events).collect()
    }
    exact_rows = (
        events.select(
            F.unix_timestamp(F.date_trunc("month", "ts")).alias("month"),
            "value",
        )
        .groupBy("month")
        .agg(
            *[
                F.expr(
                    f"percentile_cont({q}) WITHIN GROUP (ORDER BY value)"
                ).alias(f"p{i}")
                for i, q in enumerate(QHIST_QS)
            ]
        )
        .collect()
    )
    assert est and exact_rows
    for row in exact_rows:
        for i, q in enumerate(QHIST_QS):
            assert abs(est[(row["month"], q)] - row[f"p{i}"]) <= 2.0, (
                row["month"],
                q,
                est[(row["month"], q)],
                row[f"p{i}"],
            )


def test_bloom_has_no_false_negatives(spark, sf_dir):
    """Every probe id actually active in a month MUST report
    maybe_member=1 — the Bloom guarantee; false positives are allowed
    (and counted, loosely bounded) but false negatives never."""
    from kafka_go_cardinality_spark.operators.cardinality import (
        bloom_membership,
    )
    from kafka_go_cardinality_spark.queries_cardinality import BLOOM_PROBES
    from kafka_go_cardinality_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    got = {
        (r["month"], r["probe_id"]): r["maybe_member"]
        for r in bloom_membership(events, BLOOM_PROBES).collect()
    }
    truth_rows = (
        events.select(
            F.unix_timestamp(F.date_trunc("month", "ts")).alias("month"),
            "user_id",
        )
        .filter(F.col("user_id").isin(BLOOM_PROBES))
        .distinct()
        .collect()
    )
    assert truth_rows
    truth = {(r["month"], r["user_id"]) for r in truth_rows}
    for key in truth:
        assert got.get(key) == 1, f"false negative for {key}"
    # loose fp bound: absent probes reporting membership stay under 20%
    absent = [k for k in got if k not in truth]
    fps = sum(got[k] for k in absent)
    assert fps <= max(1, len(absent) // 5), (fps, len(absent))
