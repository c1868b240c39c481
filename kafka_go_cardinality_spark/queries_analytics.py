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
