"""Parquet fixture-table source (SURVEY.md §2.3 row E1).

The reference only speaks Kafka (``/root/reference/kafkaio/kafkaio.go:29-36``);
file scans are part of the mandated extension surface.  Reading through
``spark.read.parquet`` gets predicate pushdown, column pruning, and partition
pruning from Catalyst for free — at 100 TB this is the difference between
scanning a table and scanning a projection of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

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

# Tables that may carry a HARD broadcast hint: fixed-cardinality dims only
# (region = 5 rows, nation = 25 rows at every TPC-H scale factor).  A hint
# is honored regardless of size, so anything that GROWS with sf —
# supplier, part, customer — must never be hard-hinted: at sf10k supplier
# is ~15 GB and the hinted plan cannot execute.  Catalyst auto-broadcasts
# growing dims while they fit under spark.sql.autoBroadcastJoinThreshold
# (and AQE re-plans at runtime), which is the correct mechanism — size-
# aware, not declared.  tests/test_plans.py pins both halves: members of
# this set are sf-invariant, and the un-hinted supplier/part joins still
# broadcast at fixture scale.
BROADCASTABLE = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; path layout per /root/repo/TESTDATA.md.

    Timestamp normalization happens HERE, at the source boundary, never
    downstream (SURVEY.md §7.3).  The fixture's ``events.ts`` column has
    shipped as parquet TIMESTAMP(NANOS) in some builds and TIMESTAMP(MICROS)
    in others, so we branch on the *loaded* dtype rather than assuming:

    - TIMESTAMP(NANOS) + ``nanosAsLong`` → LongType raw nanos; truncate to
      microseconds with *integer* division (double division would lose
      precision above 2^53 ns ≈ 104 days).
    - TIMESTAMP(MICROS) → Spark 4 loads it as TIMESTAMP_NTZ; cast to the
      session-zoned TIMESTAMP (session tz is pinned to UTC in session.py, so
      the cast is wall-clock-preserving and matches the DuckDB oracle).
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # Pin the session timezone HERE, not only in session.py: the driver's
    # correctness harness calls queries() with ITS OWN SparkSession, and a
    # non-UTC session would shift every TIMESTAMP_NTZ→TIMESTAMP cast and
    # date_trunc against the timezone-naive DuckDB oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif not isinstance(ts_type, T.TimestampType):
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


# One partitioned copy per (process, sf_dir) — several queries/tests can
# share the layout without re-writing it.
_PARTITIONED_EVENTS: dict[str, str] = {}


def partitioned_events_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize ``events`` hive-partitioned by ``event_date`` (one
    directory per day) and return the path.

    This is THE layout lever for a 100 TB event store: a date-partitioned
    table turns any time-bounded query into a scan of the matching
    directories only — the files of every other day are never opened
    (partition pruning happens at planning time, before any I/O).  The
    reference has no storage at all (/root/reference/README.md:5); a
    retained-topic replay re-reads everything every time.

    ``repartition(event_date)`` before the write keeps it to ONE file per
    partition instead of one per (task × partition) — the small-files
    failure mode of naive partitioned writes.
    """
    existing = _PARTITIONED_EVENTS.get(sf_dir)
    if existing:
        return existing
    import tempfile

    path = tempfile.mkdtemp(prefix="kgc_events_by_date_")
    events = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    (
        events.repartition(F.col("event_date"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )
    _PARTITIONED_EVENTS[sf_dir] = path
    return path


def read_partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the date-partitioned events layout with its EXPLICIT schema.
    An empty source (a brand-new ingest partition, a fully filtered
    backfill) writes ZERO part files, and schema inference over an
    empty directory aborts the read (UNABLE_TO_INFER_SCHEMA) — but the
    layout's schema is a function of the events table, not of which
    days happen to contain data, so the reader must never depend on
    files existing."""
    path = partitioned_events_path(spark, sf_dir)
    schema = (
        load_table(spark, sf_dir, "events")
        .withColumn("event_date", F.to_date("ts"))
        .schema
    )
    return spark.read.schema(schema).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int,
    path: str | None = None,
) -> None:
    """Materialize a table bucketed (and sorted) on a join key.

    Bucketing is the pre-shuffle trade: pay one hash-partitioned write, and
    every later equi-join or aggregation on ``bucket_col`` between tables
    bucketed to the same ``num_buckets`` runs with ZERO exchanges — Spark's
    scan reports the bucket spec as its output partitioning, so
    ``EnsureRequirements`` inserts no shuffle (sortBy additionally enables
    in-scan sort order for engines/flags that consume it; vanilla Spark
    keeps cheap in-partition sorts — SPARK-28632).  At 100 TB this converts the
    nightly fact⋈dim join from two full-table shuffles into a co-located
    map-side merge.  (The reference has no storage at all —
    /root/reference/README.md:5 — so this entire axis is extension
    surface.)  Shuffle-free-ness is pinned in tests/test_plans.py.
    """
    # One file per bucket: Spark only trusts bucket-sort metadata (and can
    # drop the SMJ's sorts) when a bucket is a single file; repartitioning
    # on the bucket column puts each bucket's rows in exactly one task.
    writer = (
        df.repartition(num_buckets, F.col(bucket_col))
        .write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


# One evolved-schema materialization per (process, sf_dir).
_EVOLVED_NATION: dict[str, str] = {}


def evolved_nation_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize a two-generation `nation` table for the schema-evolution
    scan: generation 1 is the original schema, generation 2 adds an
    ``iso_code`` column.  This is the 100 TB reality of long-lived tables —
    columns are added mid-history, and scans must reconcile footers with
    different schemas (``mergeSchema``) instead of rewriting petabytes of
    old files.  The ``gen=N`` layout doubles as a partition column, so the
    read also exercises partition discovery alongside schema merge."""
    existing = _EVOLVED_NATION.get(sf_dir)
    if existing:
        return existing
    import tempfile

    path = tempfile.mkdtemp(prefix="kgc_nation_evolved_")
    nation = load_table(spark, sf_dir, "nation")
    nation.write.mode("overwrite").parquet(f"{path}/gen=1")
    nation.withColumn(
        "iso_code", F.upper(F.substring("n_name", 1, 3))
    ).write.mode("overwrite").parquet(f"{path}/gen=2")
    _EVOLVED_NATION[sf_dir] = path
    return path


# One bucketed (orders, customer) pair per (process, sf_dir).
_BUCKETED_PAIR: dict[str, tuple[str, str]] = {}


def bucketed_pair(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Materialize orders + customer bucketed on the join key (8 buckets
    each) and return the two table names.  This is the pre-shuffled
    co-located layout write_bucketed documents: every later equi-join on
    o_custkey = c_custkey runs with zero shuffle exchanges.  Cached per
    (process, sf_dir) — the write is storage prep (the nightly ingest
    job at 100 TB), not part of any query's cost."""
    existing = _BUCKETED_PAIR.get(sf_dir)
    if existing:
        return existing
    import re
    import tempfile

    suffix = re.sub(r"\W+", "_", sf_dir).strip("_")
    names = (f"orders_bkt_{suffix}", f"customer_bkt_{suffix}")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    write_bucketed(
        orders, names[0], "o_custkey", 8, path=tempfile.mkdtemp(prefix="kgc_bkt_o_")
    )
    write_bucketed(
        cust, names[1], "c_custkey", 8, path=tempfile.mkdtemp(prefix="kgc_bkt_c_")
    )
    _BUCKETED_PAIR[sf_dir] = names
    return names


# One date-dimension per (process, sf_dir) — DPP demo storage prep.
_DATE_DIMS: dict[str, str] = {}


def date_dim_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize a tiny calendar dimension (event_date, isodow 1-7)
    covering the events table's date range.  Together with the
    date-partitioned events layout this is the dynamic-partition-pruning
    pair: a runtime-filtered dim join prunes fact partitions that no
    surviving dim row references — the 100 TB pattern for "scan only the
    days the campaign ran" without hardcoding dates in the query.

    The dim deliberately carries the day-of-week as an INTEGER, not a
    boolean flag: Catalyst only injects the DPP subquery when the dim
    side has a "likely selective" predicate (binary comparison, IN,
    LIKE...), and a bare boolean attribute filter fails that check —
    ``dow >= 6`` qualifies, ``is_weekend`` does not.
    """
    existing = _DATE_DIMS.get(sf_dir)
    if existing:
        return existing
    import tempfile

    path = tempfile.mkdtemp(prefix="kgc_date_dim_")
    (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("event_date"))
        .distinct()
        .withColumn("dow", (F.weekday("event_date") + 1).cast("int"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path)
    )
    _DATE_DIMS[sf_dir] = path
    return path


def morton2(a, b, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative ints as a pure
    column expression: bit i of ``a`` lands at position 2i, bit i of
    ``b`` at 2i+1.  Built from shifts/masks so it stays inside
    whole-stage codegen — no UDF.  ``bits`` per input (16 → 32-bit key)
    is plenty for a layout key: clustering needs locality, not
    uniqueness, so callers can ``pmod`` wider domains down first."""
    z = F.lit(0).cast("long")
    av = a.cast("long")
    bv = b.cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(av.bitwiseAND(F.lit(1 << i)) * F.lit(1 << i))
            .bitwiseOR(bv.bitwiseAND(F.lit(1 << i)) * F.lit(1 << (i + 1)))
        )
    return z


# One z-ordered + one linearly-sorted events copy per (process, sf_dir).
_ZORDER_EVENTS: dict[str, tuple[str, str]] = {}


def zordered_events_paths(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Materialize events twice: clustered on the Morton key of
    (user_id, day-number) vs linearly sorted by day only, same file and
    row-group counts.  Z-ordering is THE layout for 2-D-filtered scans
    of a single physical copy (Delta/Iceberg expose it as OPTIMIZE
    ZORDER): parquet row-group min/max stats stay tight on BOTH columns,
    so a (user range × date range) predicate skips row groups in both
    dimensions, where a linear sort only ever prunes its leading column.
    tests/test_plans.py quantifies the skip-rate difference from the
    actual parquet footers."""
    existing = _ZORDER_EVENTS.get(sf_dir)
    if existing:
        return existing
    import tempfile

    events = load_table(spark, sf_dir, "events").withColumn(
        "day_no", F.datediff(F.to_date("ts"), F.lit("2024-01-01")).cast("long")
    )
    z = morton2(F.pmod(F.col("user_id"), F.lit(1 << 16)), F.col("day_no"))
    # 256 range partitions → 256 files, each contiguous in its sort key;
    # file-level min/max footers are the pruning stats compared in the
    # plan test (row groups behave identically, at finer grain).
    zpath = tempfile.mkdtemp(prefix="kgc_events_zorder_")
    (
        events.withColumn("__z", z)
        .repartitionByRange(256, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(zpath)
    )
    lpath = tempfile.mkdtemp(prefix="kgc_events_linear_")
    (
        events.repartitionByRange(256, F.col("day_no"), F.col("ts"))
        .sortWithinPartitions("day_no", "ts")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    _ZORDER_EVENTS[sf_dir] = (zpath, lpath)
    return zpath, lpath
