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


# ---------------------------------------------------------------------------
# Registry presentation order.
#
# The driver's correctness sweep checks the first N registry entries per
# round, so insertion order decides which queries accumulate driver-side
# evidence.  Rounds 1-2 proved the 62 names below (union of
# CORRECTNESS_r01/r02); we now front-load the never-checked families —
# near-dup dedup and the TPC-H sweep first (the two surfaces a migrating
# user exercises hardest), then the rest of the data-pipeline and
# analytics families — and park the already-proven block at the end.
# The set is frozen, not recomputed, so the order is deterministic and
# reviewable in-diff.  Refresh each round with
# ``python scripts_gen_driver_proven.py`` once the new CORRECTNESS file
# lands, pasting its output over this literal.
# ---------------------------------------------------------------------------

DRIVER_PROVEN: frozenset[str] = frozenset({
    "q_agg_q1", "q_asof_join", "q_bloom_membership", "q_card_day_approx",
    "q_card_day_exact", "q_card_day_exact_bitmap", "q_card_day_exact_salted",
    "q_card_minute_approx", "q_card_minute_exact", "q_card_month_approx",
    "q_card_month_exact", "q_card_pcsa_day", "q_card_sketch_incremental",
    "q_card_sketch_rollup", "q_card_week_approx", "q_card_week_exact",
    "q_card_year_approx", "q_card_year_exact", "q_cube", "q_distinct",
    "q_except", "q_filter_pred", "q_freq_cms", "q_grain_fanout",
    "q_grain_fanout_rollup", "q_grouping_sets", "q_intersect", "q_join3_agg",
    "q_join_anti", "q_join_broadcast", "q_join_inner", "q_join_left",
    "q_join_semi", "q_json_extract", "q_json_project", "q_malformed_filter",
    "q_percentile", "q_percentile_approx", "q_pivot", "q_project_expr",
    "q_quantile_hist_rollup", "q_quantile_kll_rollup", "q_range_join",
    "q_retention_theta", "q_rollup", "q_scalar_date", "q_scalar_math",
    "q_scalar_str", "q_scan_csv", "q_scan_json", "q_scan_orc",
    "q_scan_parquet", "q_scan_partition_pruned", "q_seg_overlap_exact",
    "q_seg_overlap_sketch", "q_seg_overlap_theta", "q_stats_shape", "q_topk",
    "q_union", "q_unpivot", "q_window_frame", "q_window_rank",
})


def _presentation_rank(name: str) -> tuple[int, str]:
    if name in DRIVER_PROVEN:
        return (9, name)
    prefix_order = (
        "q_dedup_", "q_tpch_", "q_text_", "q_sim_", "q_mm_", "q_sample_",
        "q_mix_", "q_split_",
    )
    for i, prefix in enumerate(prefix_order):
        if name.startswith(prefix):
            return (i, name)
    return (8, name)


def _reorder_for_driver() -> None:
    # Mutate in place: family modules and tests may already hold references
    # to these dicts, and late registrations (env-gated streaming ops) must
    # land in the same object.
    ordered_q = {name: QUERIES[name] for name in sorted(QUERIES, key=_presentation_rank)}
    QUERIES.clear()
    QUERIES.update(ordered_q)
    ordered_o = {name: ORACLE_SQL[name] for name in ordered_q if name in ORACLE_SQL}
    ORACLE_SQL.clear()
    ORACLE_SQL.update(ordered_o)


_reorder_for_driver()
