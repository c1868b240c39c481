"""The declared query surface: name → (spark, sf_dir) → DataFrame, plus the
DuckDB oracle SQL for every exact-semantics query.

This is the registry behind ``__spark_entry__.queries()`` /
``oracle_sql()``.  Conventions:

- every computed column is aliased identically in the Spark query and the
  oracle SQL (the driver sorts columns by name before value-hashing);
- approximate queries register NO oracle (rows-only check) — estimator
  values can never hash-match across engines (SURVEY.md §7.3);
- double-typed aggregates are rounded the same way on both sides so
  summation-order ulps can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` marks it rows-only (approx ops)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# Import the family modules for their registration side effects.  Order
# mirrors SURVEY.md §7.1's build order.
from kafka_go_cardinality_spark import queries_cardinality  # noqa: E402,F401
from kafka_go_cardinality_spark import queries_relational  # noqa: E402,F401
from kafka_go_cardinality_spark import queries_datapipe  # noqa: E402,F401
from kafka_go_cardinality_spark import queries_analytics  # noqa: E402,F401
from kafka_go_cardinality_spark import queries_streaming  # noqa: E402,F401
from kafka_go_cardinality_spark import queries_udf  # noqa: E402,F401
