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
