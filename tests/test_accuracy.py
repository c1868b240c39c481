"""Accuracy self-assertions for the approximate operators (SURVEY.md
§5.2): the HLL++ estimate at rsd=0.008 must stay within 2% of the exact
twin on every window — mirroring the reference README's "<1%" claim
(/root/reference/README.md:4) with margin for a different estimator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_go_cardinality_spark.operators.cardinality import (
    GRAINS,
    cardinality_error_bound,
)
from kafka_go_cardinality_spark.sources import load_table


@pytest.mark.parametrize("grain", GRAINS)
def test_approx_within_two_percent_of_exact(spark, sf_dir, grain):
    err = cardinality_error_bound(load_table(spark, sf_dir, "events"), grain)
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
