"""[EXT] second-wave analytics registrations: batch sessionization,
correlated subqueries (the SQL surface Catalyst rewrites to joins),
heavy hitters, and deterministic / seeded sampling.

The reference has none of this — its whole query surface is the five-grain
HLL pipeline (/root/reference/processor/processor.go:56-102) — so every
query here extends SURVEY.md §2.3: sessionization generalizes E18's
session windows to the batch store, subqueries exercise the spark.sql
entry path over E4-E7's join machinery, heavy hitters and sampling are
the selection primitives of a training-data pipeline.

Oracle conventions follow queries_relational.py: identical aliases both
sides, BIGINT casts where DuckDB would widen to HUGEINT, integer-exact
comparisons wherever floats could diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafka_go_cardinality_spark.partitioning import spread

from kafka_go_cardinality_spark.functions import hash64, hash64_sql
from kafka_go_cardinality_spark.operators.relational import sessionize
from kafka_go_cardinality_spark.queries import query
from kafka_go_cardinality_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ------------------------------------------------------- batch sessionization

SESSION_GAP_SECONDS = 24 * 3600  # fixture events are sparse per user (~11 h median gap)


@query(
    "q_sessionize_batch",
    f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN prev_ts IS NULL
                    OR epoch_us(ts) - epoch_us(prev_ts) > {SESSION_GAP_SECONDS * 1_000_000}
                  THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ),
    numbered AS (
      SELECT user_id, ts,
             CAST(sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    """,
)
def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E18-batch] Gap-based sessionization of the historical event store
    (24 h gap) — the batch twin of q_stream_session, one shuffle on
    user_id end to end (operators/relational.sessionize)."""
    return sessionize(
        _t(spark, sf_dir, "events"),
        key="user_id",
        ts="ts",
        order_tiebreak="event_id",
        gap_seconds=SESSION_GAP_SECONDS,
    )


# ----------------------------------------------------------- subquery surface


@query(
    "q_exists_subquery",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    """,
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E4-E7 via SQL] Correlated EXISTS (TPC-H Q4 shape) through the
    spark.sql entry path: Catalyst's RewritePredicateSubquery turns the
    correlated predicate into a left-semi hash join — same physical plan
    a hand-written ``join(..., "left_semi")`` gets, proving the SQL and
    DataFrame surfaces converge."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("kgc_orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("kgc_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM kgc_orders
        WHERE EXISTS (SELECT 1 FROM kgc_lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        GROUP BY o_orderpriority
        """
    )


@query(
    "q_scalar_subquery",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#12'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E9 via SQL] Correlated scalar subquery (TPC-H Q17 shape):
    Catalyst de-correlates the per-part average into an aggregate +
    join — the small-parts side broadcasts under AQE.  Demonstrates the
    decorrelation rewrite no hand plan is needed for."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("kgc_lineitem")
    _t(spark, sf_dir, "part").createOrReplaceTempView("kgc_part")
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM kgc_lineitem, kgc_part
        WHERE p_partkey = l_partkey
          AND p_brand = 'Brand#12'
          AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                            FROM kgc_lineitem l2 WHERE l2.l_partkey = p_partkey)
        """
    )


# ------------------------------------------------------------- heavy hitters


@query(
    "q_heavy_hitters",
    """
    WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
    SELECT user_id, n FROM c WHERE n > (SELECT 1.1 * avg(n) FROM c)
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E9/E13] Heavy hitters: users whose event count exceeds 1.1× the
    mean — one groupBy shuffle, then a 1-row broadcast threshold join
    (BroadcastNestedLoopJoin over a single row costs nothing; the
    re-aggregation of `c` is over post-groupBy counts, not raw events).
    The comparison is exact: integer sums < 2^53 make both engines' avg
    the same double."""
    counts = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    threshold = counts.agg((F.avg("n") * 1.1).alias("thr"))
    return (
        counts.join(F.broadcast(threshold), F.col("n") > F.col("thr"), "inner")
        .select("user_id", "n")
    )


# ------------------------------------------------------------------ sampling


@query(
    "q_sample_hash",
    f"""
    SELECT lang, count(*) AS n_sampled, CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM documents
    WHERE {hash64_sql("CAST(doc_id AS VARCHAR)", "sample")} % 100 < 30
    GROUP BY lang
    """,
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Deterministic hash sample (30% by md5 of the id): the
    reproducible train/test-split primitive — membership is a pure
    function of the row, so it is stable across runs, engines, and
    repartitioning, unlike seeded Bernoulli sampling.  Aggregated per
    stratum; id_sum pins the exact selected set, not just its size."""
    docs = _t(spark, sf_dir, "documents")
    sampled = docs.filter(
        hash64(F.col("doc_id").cast("string"), "sample") % 100 < 30
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("doc_id").alias("id_sum"),
    )


@query("q_sample_stratified", oracle=None)  # seeded RNG: engine-specific set
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Stratified Bernoulli sample via ``sampleBy`` (per-lang
    fractions, fixed seed) — map-side, no shuffle; rows-only because the
    seeded RNG stream is engine-specific (SURVEY.md §7.3 logic applies).
    The fractions map leans strata deliberately: half the English corpus,
    all of the rest — the rebalancing move of multilingual pipelines."""
    fractions = {"en": 0.5, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 1.0}
    sampled = _t(spark, sf_dir, "documents").sampleBy("lang", fractions, seed=42)
    return sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled"))


@query(
    "q_ts_gapfill",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS events
      FROM events GROUP BY 1, 2),
    bounds AS (
      SELECT min(date_trunc('hour', ts)) AS h0, max(date_trunc('hour', ts)) AS h1
      FROM events),
    hours AS (
      SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events)
    SELECT t.event_type,
           CAST(epoch(h.hour) AS BIGINT) AS hour_ts,
           COALESCE(hourly.events, 0) AS events
    FROM hours h
    CROSS JOIN types t
    LEFT JOIN hourly ON hourly.event_type = t.event_type AND hourly.hour = h.hour
    """,
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT E28] Time-series gap filling: per-type hourly event counts on a
    DENSE hour grid — hours with no events appear with an explicit 0, the
    precondition for window/trend math downstream.  The dense grid
    (sequence+explode of the global [min,max] hour span × distinct types)
    is generated from two 1-row aggregates, so at 100 TB the heavy side is
    the hourly pre-aggregation; the grid join touches only
    grid-bounded (type, hour) rows — never raw events."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    )
    hourly = ev.groupBy("event_type", "hour").agg(F.count("*").alias("events"))
    bounds = ev.agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
    hours = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("hour")
    )
    types = ev.select("event_type").distinct()
    grid = hours.crossJoin(types)
    return grid.join(hourly, ["event_type", "hour"], "left").select(
        "event_type",
        F.col("hour").cast("long").alias("hour_ts"),
        F.coalesce("events", F.lit(0)).alias("events"),
    )


@query(
    "q_cooccurrence",
    """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_users
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
)
def q_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT E28] Behavior co-occurrence (market-basket pairs): for every
    unordered pair of event types, how many users did both.  The distinct
    projection FIRST collapses the fact table to (user, type) — bounded by
    users × types — before the self-join; the join itself is co-partitioned
    on user_id (one shuffle feeds both sides), and the '<' predicate keeps
    each pair once without a post-hoc dedup."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    a = ut.alias("a")
    b = ut.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    )
    return pairs.groupBy(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
    ).agg(F.count("*").alias("n_users"))


@query(
    "q_fuzzy_join",
    """
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand
     AND a.p_partkey < b.p_partkey
     AND abs(length(a.p_name) - length(b.p_name)) <= 1
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT E28] Edit-distance similarity join with blocking: part-name
    pairs within the same brand at levenshtein distance ≤ 2.  The naive
    formulation is an O(n²) cross join; blocking on p_brand bounds each
    block, and the cheap length-band predicate |len_a − len_b| ≤ 1 prunes
    most candidates before any levenshtein is computed (a deliberate
    recall tradeoff: pure two-insertion pairs at length gap 2 are
    excluded — the band is part of the operator's matching contract, and
    the oracle applies the identical band).  The '<' key order emits each
    pair once.
    At 100 TB the blocking key is the scaling contract: blocks must be
    O(thousands) — compose brand × length-band × first-token as needed."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand")
    # The probe side must be spread BEFORE a broadcast join: `part` is one
    # small file → one input partition → one task would grind all O(block²)
    # candidate pairs (measured 14× slower).  Round-robin repartition gives
    # every core a slice of the probe rows; the build side broadcasts.
    a = spread(p).alias("a")
    b = F.broadcast(p.alias("b"))
    joined = a.join(
        b,
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey"))
        & (
            F.abs(F.length(F.col("a.p_name")) - F.length(F.col("b.p_name")))
            <= 1
        ),
    )
    return joined.select(
        F.col("a.p_partkey").alias("key_a"),
        F.col("b.p_partkey").alias("key_b"),
        F.col("a.p_name").alias("name_a"),
        F.col("b.p_name").alias("name_b"),
        F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).cast("long").alias("dist"),
    ).filter(F.col("dist") <= 2)


@query(
    "q_scd2_intervals",
    """
    WITH ordered AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS t,
             event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    marked AS (
      SELECT user_id, event_type, t, event_id,
             CASE WHEN prev_type IS NULL OR prev_type <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM ordered),
    runs AS (
      SELECT user_id, event_type, t,
             sum(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run_id
      FROM marked)
    SELECT user_id, event_type,
           min(t) AS valid_from,
           max(t) AS last_seen,
           count(*) AS n_events
    FROM runs
    GROUP BY user_id, event_type, run_id
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E12/E29] Change-point intervals (the SCD type-2 history build):
    per user, consecutive runs of the same event_type collapse into one
    validity interval [valid_from, last_seen] — lag marks the change
    points, a running sum numbers the runs, one aggregate per run.  All
    three window passes and the final aggregate share the user_id
    partitioning, so the whole history build is ONE shuffle (the
    sessionize pattern applied to value changes instead of time gaps).
    The (ts, event_id) composite order is total → deterministic."""
    from pyspark.sql import Window

    # Order by the RAW timestamp (micros) + event_id — the oracle does the
    # same; ordering by the floored-seconds output column instead could
    # sequence same-second events differently across engines.
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "ts",
        F.col("ts").cast("long").alias("t"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "chg",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        ).otherwise(0),
    )
    runs = marked.withColumn(
        "run_id",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return runs.groupBy("user_id", "event_type", "run_id").agg(
        F.min("t").alias("valid_from"),
        F.max("t").alias("last_seen"),
        F.count(F.lit(1)).alias("n_events"),
    ).drop("run_id")


# ------------------------------------------------- compaction / product funnels

from kafka_go_cardinality_spark.operators.relational import (  # noqa: E402
    cohort_retention,
    funnel,
    latest_per_key,
    zscore_outliers,
)


@query(
    "q_dedup_latest",
    """
    SELECT event_id, ts, user_id, event_type
    FROM (
      SELECT event_id, ts, user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E30] CDC keep-latest compaction: the newest event per
    user (one row_number shuffle, no self-join —
    operators/relational.latest_per_key)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    return latest_per_key(ev, key="user_id", ts="ts", tiebreak="event_id")


@query(
    "q_funnel",
    """
    WITH staged AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t0
      FROM events
    ),
    s2 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts > t0 THEN ts END)
               OVER (PARTITION BY user_id) AS t1
      FROM staged
    ),
    s3 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t1 THEN ts END)
               OVER (PARTITION BY user_id) AS t2
      FROM s2
    ),
    per_user AS (
      SELECT user_id, min(t0) AS t0, min(t1) AS t1, min(t2) AS t2
      FROM s3 GROUP BY user_id
    )
    SELECT 0 AS stage_idx, 'view' AS stage, count(t0) AS n_converted FROM per_user
    UNION ALL
    SELECT 1, 'click', count(t1) FROM per_user
    UNION ALL
    SELECT 2, 'purchase', count(t2) FROM per_user
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E12/E9 composite] Strict ordered funnel view→click→purchase:
    chained analytic minimums over ONE user-key shuffle regardless of
    stage count (operators/relational.funnel)."""
    return funnel(
        _t(spark, sf_dir, "events"),
        key="user_id",
        ts="ts",
        type_col="event_type",
        stages=["view", "click", "purchase"],
    )


@query(
    "q_retention_cohort",
    """
    WITH act AS (
      SELECT DISTINCT user_id AS k, date_trunc('week', ts) AS period FROM events
    ),
    first AS (
      SELECT k, min(period) AS cohort FROM act GROUP BY k
    )
    SELECT cohort,
           CAST((epoch(period) - epoch(cohort)) / 604800 AS BIGINT)
             AS period_offset,
           count(*) AS n_active
    FROM act JOIN first USING (k)
    GROUP BY cohort, period_offset
    """,
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E9/E15 composite] Weekly cohort retention matrix: first-seen
    reduce + co-partitioned activity join + periods²-sized final reduce
    (operators/relational.cohort_retention)."""
    return cohort_retention(_t(spark, sf_dir, "events"), key="user_id", ts="ts")


@query(
    "q_anomaly_zscore",
    """
    WITH safe AS (
      SELECT * FROM events WHERE abs(value) < 1e150
    ),
    stats AS (
      SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
      FROM safe GROUP BY event_type
    )
    SELECT event_id, event_type, value,
           round((value - mu) / sigma, 4) AS zscore
    FROM safe JOIN stats USING (event_type)
    WHERE sigma > 0 AND abs(round((value - mu) / sigma, 4)) > 3.0
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E9/E5 composite] Per-type z-score anomaly filter: group moments
    reduce to #types rows then broadcast back over the fact scan — the
    100 TB side is never shuffled (operators/relational.zscore_outliers)."""
    return zscore_outliers(
        _t(spark, sf_dir, "events"),
        group_col="event_type",
        value_col="value",
        id_col="event_id",
    )


# ------------------------------------------------------ snapshot change feed

from kafka_go_cardinality_spark.operators.relational import snapshot_diff  # noqa: E402

# Deterministic synthetic snapshots from orders: integer-cent prices so
# the "updated" arithmetic is exact integer math on every engine.
_SNAP_OLD_SQL = """
  SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 10 < 9
"""
_SNAP_NEW_SQL = """
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0
              THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 11 // 10
              ELSE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) END AS cents
  FROM orders WHERE o_orderkey % 10 > 0
"""


@query(
    "q_snapshot_diff",
    f"""
    WITH old AS ({_SNAP_OLD_SQL}), new AS ({_SNAP_NEW_SQL})
    SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
           CASE WHEN old.o_orderkey IS NULL THEN 'insert'
                WHEN new.o_orderkey IS NULL THEN 'delete'
                WHEN old.cents IS DISTINCT FROM new.cents THEN 'update'
           END AS change,
           old.cents AS old_cents, new.cents AS new_cents
    FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    WHERE CASE WHEN old.o_orderkey IS NULL THEN 'insert'
                WHEN new.o_orderkey IS NULL THEN 'delete'
                WHEN old.cents IS DISTINCT FROM new.cents THEN 'update'
           END IS NOT NULL
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E29] Snapshot diff → change feed (insert/delete/update, unchanged
    dropped): one full-outer hash join, null-safe column compare
    (operators/relational.snapshot_diff)."""
    orders = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    old = orders.filter(F.col("o_orderkey") % 10 < 9).select(
        "o_orderkey", cents.alias("cents")
    )
    new = orders.filter(F.col("o_orderkey") % 10 > 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, (cents * 11) / F.lit(10))
        .otherwise(cents)
        .cast("long")
        .alias("cents"),
    )
    return snapshot_diff(old, new, key="o_orderkey", compare_cols=["cents"])


@query(
    "q_recursive_cte",
    """
    WITH RECURSIVE walk AS (
      SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth FROM customer
      UNION ALL
      SELECT node, cur // 2 AS cur, depth + 1 AS depth
      FROM walk WHERE cur > 1
    )
    SELECT node, max(depth) AS depth FROM walk GROUP BY node
    """,
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E24+] Recursive CTE (Spark 4.0+, SPARK-24497): per-node depth in
    a synthetic binary hierarchy (parent(k) = k div 2) walked to the
    root — the org-chart / BOM-explosion query shape SQL engines need
    WITH RECURSIVE for.  Each iteration is one narrow map over the
    frontier (no join needed for this parent function), and Spark caps
    runaway recursion at spark.sql.cteRecursionLevelLimit (100); depth
    here is log2(max key) ≈ 11.  Same SQL runs in DuckDB modulo the
    integer-division spelling (`div` vs `//`)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("kgc_customer")
    return spark.sql(
        """
        WITH RECURSIVE walk AS (
          SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth
          FROM kgc_customer
          UNION ALL
          SELECT node, cur div 2 AS cur, depth + 1 AS depth
          FROM walk WHERE cur > 1
        )
        SELECT node, max(depth) AS depth FROM walk GROUP BY node
        """
    )


# ----------------------------------------------------- E31 column profiling


def _profile_oracle() -> str:
    """Generated from the same column list as q_profile_columns so the
    Spark stringifiers and the oracle's can't drift."""
    cols = [
        ("o_orderkey", "CAST({m}(o_orderkey) AS VARCHAR)"),
        ("o_custkey", "CAST({m}(o_custkey) AS VARCHAR)"),
        ("o_orderstatus", "{m}(o_orderstatus)"),
        ("o_totalprice", "CAST(CAST({m}(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)"),
        ("o_orderdate", "strftime({m}(o_orderdate), '%Y-%m-%d %H:%M:%S')"),
        ("o_orderpriority", "{m}(o_orderpriority)"),
    ]
    measures = ["count(*) AS n_rows"]
    rows = []
    for i, (c, fmt) in enumerate(cols):
        measures += [
            f"count({c}) AS nn{i}",
            f"count(DISTINCT {c}) AS nd{i}",
            fmt.format(m="min") + f" AS mn{i}",
            fmt.format(m="max") + f" AS mx{i}",
        ]
        rows.append(
            f"SELECT '{c}' AS col_name, n_rows, nn{i} AS n_nonnull, "
            f"nd{i} AS n_distinct, mn{i} AS min_s, mx{i} AS max_s FROM p"
        )
    return (
        "WITH p AS (SELECT "
        + ", ".join(measures)
        + " FROM orders)\n    "
        + "\n    UNION ALL ".join(rows)
    )


@query("q_profile_columns", _profile_oracle())
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E31] One-pass column profiler over orders: per column non-null /
    exact-distinct counts and dtype-aware stringified min/max — all in a
    SINGLE scan (multi-count-distinct plans as one Expand+Aggregate),
    versus the naive N-scans-for-N-columns audit
    (operators/relational.profile_columns)."""
    from kafka_go_cardinality_spark.operators.relational import profile_columns

    orders = _t(spark, sf_dir, "orders")
    as_str = lambda c: c.cast("string")  # noqa: E731
    specs = [
        ("o_orderkey", as_str),
        ("o_custkey", as_str),
        ("o_orderstatus", as_str),
        ("o_totalprice", lambda c: c.cast("decimal(18,2)").cast("string")),
        ("o_orderdate", lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss")),
        ("o_orderpriority", as_str),
    ]
    return profile_columns(orders, specs)


# --------------------------------------------------- E13 global enumeration


@query(
    "q_global_enumerate",
    """
    SELECT event_id, value,
           CAST(row_number() OVER (ORDER BY value, event_id) AS BIGINT)
             AS global_rank
    FROM events
    """,
)
def q_global_enumerate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E13] Global total-order row numbering WITHOUT a single-partition
    sort: value-range buckets + constant-size offset table + per-bucket
    local row_number (operators/relational.global_enumerate).  The
    oracle is the naive one-task window — same numbers, a plan that
    would not survive 100 TB."""
    from kafka_go_cardinality_spark.operators.relational import global_enumerate

    return global_enumerate(_t(spark, sf_dir, "events"))


# ------------------------------------------------------ E31 skew diagnosis


@query(
    "q_skew_profile",
    """
    WITH counts AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
    SELECT count(*) AS n_keys,
           CAST(sum(n) AS BIGINT) AS total_rows,
           max(n) AS max_per_key,
           round(quantile_cont(n, 0.5), 6) AS p50,
           round(quantile_cont(n, 0.99), 6) AS p99,
           round(max(n) / quantile_cont(n, 0.5), 6) AS skew_ratio,
           (SELECT user_id FROM counts ORDER BY n DESC, user_id LIMIT 1)
             AS hottest_key
    FROM counts
    """,
)
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E31] Key-skew diagnosis over events.user_id — the audit that
    decides whether a join/agg needs salting (operators/relational's
    salted_join) or AQE suffices: per-key count distribution (max, p50,
    p99), the max/median skew ratio, and the hottest key.

    Scale shape: ONE shuffle to per-key counts (map-side combined), then
    a single-row aggregate over the #keys-sized frame.  The exact
    percentile buffers #keys values in one task — at billions of keys
    swap ``approx_percentile`` exactly as the percentile twins do."""
    counts = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("total_rows"),
        F.max("n").alias("max_per_key"),
        F.round(F.percentile("n", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("n", F.lit(0.99)), 6).alias("p99"),
        F.round(
            F.max("n") / F.percentile("n", F.lit(0.5)), 6
        ).alias("skew_ratio"),
        # argmax with deterministic tie-break: struct compares n first,
        # then -user_id, so max picks (highest n, lowest user_id).
        F.max_by(
            "user_id",
            F.struct(F.col("n").alias("n"), (-F.col("user_id")).alias("neg")),
        ).alias("hottest_key"),
    )


from kafka_go_cardinality_spark.operators.relational import (  # noqa: E402
    markov_transitions,
    markov_transitions_oracle_sql,
)


@query("q_markov_transitions", markov_transitions_oracle_sql())
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E30+] Per-user event-type Markov transition matrix with exact
    integer micro-unit probabilities: one user-partitioned lag window,
    then all math on the |types|²-bounded collapsed frame
    (operators/relational.markov_transitions)."""
    return markov_transitions(_t(spark, sf_dir, "events"))


@query(
    "q_ts_resample_ffill",
    """
    WITH span AS (
      SELECT event_type, date_trunc('hour', min(ts)) AS t0,
             date_trunc('hour', max(ts)) AS t1
      FROM events GROUP BY 1),
    grid AS (
      SELECT event_type, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS ts
      FROM span),
    u AS (
      SELECT event_type, ts, event_id, value, 0 AS is_grid FROM events
      UNION ALL
      SELECT event_type, ts, NULL, NULL, 1 FROM grid),
    f AS (
      SELECT event_type, ts, is_grid,
             last_value(value IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY ts, is_grid, event_id, value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      FROM u)
    SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS grid_ts,
           round(filled, 6) AS value_ffill
    FROM f WHERE is_grid = 1
    """,
)
def q_ts_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E28+] Forward-fill resample (LOCF): per event type, an hourly
    grid over that type's own [min, max] span carrying the last
    observed ``value`` at or before each grid instant (NULL until the
    first observation).  The sensor/finance resample primitive that
    gap-fill-with-zeros can't express.

    ONE shuffle: grid markers union the observations and a single
    per-type ordered window carries values forward — no join of grid
    against data, no per-grid-point lookup.  Grid rows order AFTER
    observations at the same instant (is_grid tie-key), same-instant
    observations order by event_id, and duplicate event_ids (an
    at-least-once source delivering the same key twice at the same
    instant) tie-break by the measurement itself — the largest value
    wins: an arbitrary but DEFINED choice, explicit nulls-last so both
    engines agree.  At 100 TB the per-type window becomes the
    two-level variant — IMPLEMENTED and registered against the same
    oracle as q_ts_resample_ffill_2level (partition by (type, day),
    carry the per-day closing value forward over the tiny closing
    frame), bit-equality pinned in tests/test_analytics.py."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql import Window

    span = ev.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = span.select(
        "event_type",
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
        ).alias("ts"),
    )
    obs = ev.select(
        "event_type", "ts", "event_id", "value", F.lit(0).alias("is_grid")
    )
    markers = grid.select(
        "event_type",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("is_grid"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(
            "ts",
            "is_grid",
            F.col("event_id").asc_nulls_last(),
            F.col("value").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        obs.unionByName(markers)
        .withColumn("filled", F.last("value", ignorenulls=True).over(w))
        .filter(F.col("is_grid") == 1)
        .select(
            "event_type",
            F.unix_timestamp("ts").alias("grid_ts"),
            F.round("filled", 6).alias("value_ffill"),
        )
    )


@query(
    "q_anomaly_mad",
    """
    WITH ev AS (
      SELECT event_id, event_type, value FROM events
      WHERE value IS NOT NULL AND NOT isnan(value)),
    med AS (
      SELECT event_type,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
      FROM ev GROUP BY 1),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM ev e JOIN med m USING (event_type)),
    mad AS (
      SELECT event_type,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY adev) AS mad
      FROM dev GROUP BY 1)
    SELECT event_id, d.event_type, value,
           round((value - d.med) / (1.4826 * mad), 4) AS robust_z
    FROM dev d JOIN mad USING (event_type)
    WHERE mad > 0
      AND abs(round((value - d.med) / (1.4826 * mad), 4)) > 2.5
    """,
)
def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E31+] Robust outlier filter via median absolute deviation: per
    type, flag events whose MAD-normalized deviation exceeds 2.5 — the
    robust twin of q_anomaly_zscore (a few gross outliers cannot drag
    the threshold the way they drag mean/stddev).  Group medians and
    MADs are |types|-row frames broadcast back onto the fact; the fact
    is never shuffled.  Exact percentile keeps the oracle bit-exact at
    fixture scale; at 100 TB the two median passes swap to
    approx_percentile (KLL-backed, q_quantile_kll_rollup's machinery)
    with identical plan shape."""
    # NULL / NaN measurements are excluded by contract on BOTH engines:
    # a NaN shifts the two medians differently per engine (NaN ordering
    # rules diverge), silently moving every robust_z in its group.
    ev = (
        _t(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .filter(F.col("value").isNotNull() & ~F.isnan(F.col("value")))
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY value)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy(F.col("event_type").alias("m_type")).agg(
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY adev)").alias("mad")
    )
    rz = F.round(
        (F.col("value") - F.col("med")) / (F.lit(1.4826) * F.col("mad")), 4
    )
    # mad == 0 (any type where ≥ half the values equal the median) makes
    # robust_z undefined — guard BEFORE the division on both engines, or
    # a degenerate type is a runtime error here and an Infinity row in
    # DuckDB (latent job failure + oracle divergence).
    return (
        dev.join(F.broadcast(mad), F.col("event_type") == F.col("m_type"))
        .filter(F.col("mad") > 0)
        .select("event_id", "event_type", "value", rz.alias("robust_z"))
        .filter(F.abs(F.col("robust_z")) > 2.5)
    )


from kafka_go_cardinality_spark.queries import ORACLE_SQL as _ORACLE_SQL  # noqa: E402


@query("q_ts_resample_ffill_2level", _ORACLE_SQL["q_ts_resample_ffill"])
def q_ts_resample_ffill_2level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E28+] The SCALABLE form of q_ts_resample_ffill, registered
    against the IDENTICAL oracle: per-(type, day) LOCF windows (bounded
    partitions — parallelism scales with days, not types) + a
    day-closing carry composed over the tiny (types × days) frame and
    broadcast back.  Proves the documented two-level fix is real and
    bit-identical, not aspirational
    (operators/relational.resample_ffill_two_level)."""
    from kafka_go_cardinality_spark.operators.relational import (
        resample_ffill_two_level,
    )

    return resample_ffill_two_level(_t(spark, sf_dir, "events"))


@query(
    "q_sample_balanced",
    f"""
    WITH h AS (
      SELECT doc_id, lang,
             {hash64_sql("CAST(doc_id AS VARCHAR)", salt="balance")} AS hv
      FROM documents),
    counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
    tgt AS (SELECT min(n) AS target FROM counts),
    r AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn
      FROM h)
    SELECT doc_id, lang FROM r CROSS JOIN tgt WHERE rn <= target
    """,
)
def q_sample_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E26+] Class-balanced downsampling: every language keeps exactly
    the minority class's count, chosen as the docs with the smallest
    salted id-hash — deterministic, partitioning-invariant, and stable
    under corpus append (a doc's keep rank only changes if smaller
    hashes arrive in its class).  The per-label rank window carries the
    few-huge-labels skew note; at 100 TB the rank becomes a per-label
    hash-quantile CUTOFF (one approx-quantile pass, broadcast, then a
    stateless filter) — the q_histogram_equidepth pattern — at the cost
    of an approximate class size."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    target = counts.agg(F.min("n").alias("target"))
    h = docs.select(
        "doc_id", "lang",
        hash64(F.col("doc_id").cast("string"), salt="balance").alias("hv"),
    )
    w = Window.partitionBy("lang").orderBy("hv", "doc_id")
    return (
        h.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(target))
        .filter(F.col("rn") <= F.col("target"))
        .select("doc_id", "lang")
    )


# ------------------------------------------------ round-6 E28 addition

from kafka_go_cardinality_spark.operators.relational import (  # noqa: E402
    EWMA_DEN,
    EWMA_DEV_PCT,
    EWMA_NUM,
    EWMA_SCALE,
    ewma_anomaly,
)


def _ewma_oracle() -> str:
    """DuckDB twin of operators/relational.ewma_anomaly: the identical
    integer recurrence replayed as a recursive CTE over the per-type
    day sequence.  Both engines' integer division agrees on the
    non-negative operands daily counts produce (Spark `div` truncates,
    DuckDB `//` floors — identical for ≥ 0)."""
    s, num, den, pct = EWMA_SCALE, EWMA_NUM, EWMA_DEN, EWMA_DEV_PCT
    return f"""
    WITH RECURSIVE daily AS (
      SELECT event_type,
             CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day,
             count(*) AS n
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2),
    seq AS (
      SELECT event_type, day, n,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily),
    r AS (
      SELECT event_type, rn, day, n,
             CAST(n * {s} AS BIGINT) AS forecast,
             CAST(n * {s} AS BIGINT) AS em
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT q.event_type, q.rn, q.day, q.n,
             r.em AS forecast,
             CAST((q.n * {s} * {num} + r.em * {den - num}) // {den}
                  AS BIGINT) AS em
      FROM r JOIN seq q
        ON q.event_type = r.event_type AND q.rn = r.rn + 1)
    SELECT event_type, day, CAST(n AS BIGINT) AS n,
           forecast AS forecast_micro,
           CAST(CASE WHEN abs(n * {s} - forecast) > (forecast // 100) * {pct}
                THEN 1 ELSE 0 END AS INT) AS is_anomaly
    FROM r
    """


@query("q_ts_ewma", _ewma_oracle())
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E28+] EWMA forecast + deviation anomaly over per-type daily
    event counts: the monitoring recurrence em' = alpha*x + (1-alpha)*em
    in exact integer micro-units (alpha = 1/8), run as a linear in-row
    fold over each type's day-grain history — one (type, day) count
    shuffle plus one type shuffle, per-key state bounded by the
    retention window (operators/relational.ewma_anomaly).  The oracle
    replays the identical recurrence as a recursive CTE."""
    return ewma_anomaly(_t(spark, sf_dir, "events"))
