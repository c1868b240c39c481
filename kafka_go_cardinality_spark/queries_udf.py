"""[EXT E17] query registrations: the Python UDF surface, oracle-checked.

Every UDF here is a demonstration of the extension mechanism the reference
lacks entirely (its one transform is a hard-wired Go closure,
/root/reference/processor/processor.go:79) — the engine's own operators
stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafka_go_cardinality_spark.functions.udfs import (
    discounted_price,
    int_total_qty,
    top_order_per_customer,
)
from kafka_go_cardinality_spark.queries import query
from kafka_go_cardinality_spark.sources import load_table


@query(
    "q_udf_pandas_scalar",
    """
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * 100) / 100 AS disc_price
    FROM lineitem
    """,
)
def q_udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas UDF; floor-truncation keeps IEEE bit
    parity with the oracle (round() would differ: half-even vs
    half-away)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        discounted_price("l_extendedprice", "l_discount").alias("disc_price"),
    )


@query(
    "q_udf_grouped_agg",
    """
    SELECT l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def q_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (integer accumulation → order-insensitive,
    hash-stable across engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        int_total_qty("l_quantity").alias("total_qty")
    )


@query(
    "q_udf_grouped_map",
    """
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    )
    WHERE rn = 1
    """,
)
def q_udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas with an explicit total order per group —
    deterministic top-1 selection regardless of Arrow batch order."""
    return top_order_per_customer(load_table(spark, sf_dir, "orders"))
