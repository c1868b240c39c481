"""Parquet fixture-table source (SURVEY.md §2.3 row E1).

The reference only speaks Kafka (``/root/reference/kafkaio/kafkaio.go:29-36``);
file scans are part of the mandated extension surface.  Reading through
``spark.read.parquet`` gets predicate pushdown, column pruning, and partition
pruning from Catalyst for free — at 100 TB this is the difference between
scanning a table and scanning a projection of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor.
# (region/nation are fixed-size in TPC-H; supplier/part/customer grow with sf
# but stay orders of magnitude under fact tables.)
BROADCASTABLE = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; path layout per /root/repo/TESTDATA.md.

    Timestamp normalization happens HERE, at the source boundary, never
    downstream (SURVEY.md §7.3): ``events.ts`` is parquet TIMESTAMP(NANOS),
    which Spark 4 refuses by default — we read it as raw nanos
    (``nanosAsLong``) and truncate to microseconds with *integer* division
    (double division would lose precision above 2^53 ns ≈ 104 days).
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
