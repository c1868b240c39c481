"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine code lives in ``kafka_go_cardinality_spark/``; this module only
declares the query surface (SURVEY.md §2 is the inventory contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_go_cardinality_spark.queries import QUERIES, ORACLE_SQL
from kafka_go_cardinality_spark.sources import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's day-grain distinct-user count
    (exact + HLL approx side by side) over events at sf0.001.

    This is the reference's core computation (SURVEY.md §2.1 C5+C6+C8) on
    the driver's fixture: /root/reference/processor/processor.go:79-102.
    """
    from kafka_go_cardinality_spark.operators.cardinality import (
        cardinality_error_bound,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    return cardinality_error_bound(events, "day").orderBy("timestamp")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every exact-semantics query key.

    Estimator-valued queries (q_card_*_approx sketch estimates, seeded
    sampling, iterative k-means) are deliberately absent — their VALUES
    can never hash-match another engine (SURVEY.md §7.3); they get
    rows-only checks plus in-repo error-bound tests against exact
    twins.  Deterministic-but-approximate pipelines (MinHash LSH,
    sign-sketch ANN, the decode stub) DO carry full oracles: recall may
    be < 1 by construction, but every emitted value reproduces exactly
    from the same md5-seeded constants.
    """
    return dict(ORACLE_SQL)
