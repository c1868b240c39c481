"""Physical-plan inspection and scale assertions.

The reference has no plan representation at all (its "plan" is one
hand-fused Go closure, /root/reference/processor/processor.go:84-101); in
this engine the plan IS the product — every operator is declared to
Catalyst, and these helpers make the resulting physical properties
*testable* so scale regressions (a lost filter pushdown, a join that stops
broadcasting, an aggregation that ships raw rows instead of partials) fail
CI instead of melting a 1000-executor run.

All checks read Spark's own explain output — public behavior, stable
enough to pin the handful of keywords used here.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (``df.explain`` prints Python-side)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan.  Every one is a full
    network materialization at scale — the first thing to budget.
    (Simple mode keeps node + arguments on one line; formatted splits
    them.)"""
    return len(
        re.findall(
            r"\bExchange (?:hash|range)partitioning", plan_string(df, mode="simple")
        )
    )


def exchange_blocks(df: DataFrame) -> list[str]:
    """Formatted-plan node blocks for each Exchange: the block text
    includes the ``Input [..]`` attribute list and the partitioning
    ``Arguments`` — enough to assert what payload rides a shuffle."""
    plan = plan_string(df)
    return [
        m.group(0)
        for m in re.finditer(
            r"\(\d+\) Exchange\n(?:.+\n)*?(?=\n|\(\d+\) )", plan
        )
    ]


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """The parquet scan must receive the predicate (``PushedFilters``) —
    otherwise the filter runs after a full-column scan."""
    plan = plan_string(df)
    pushed = "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)
    assert fragment in pushed, (
        f"filter {fragment!r} not pushed to scan; PushedFilters lines:\n"
        f"{pushed or '(none)'}\nfull plan:\n{plan}"
    )


def assert_read_schema_only(df: DataFrame, columns: set[str]) -> None:
    """Column pruning: the scan's ReadSchema must contain exactly the
    needed columns — reading 16 columns for a 2-column projection is a
    100 TB-scale bug even when results are correct."""
    plan = plan_string(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, f"no ReadSchema in plan:\n{plan}"
    read = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
    assert read == columns, f"scan reads {sorted(read)}, expected {sorted(columns)}"


def assert_broadcast_join(df: DataFrame) -> None:
    """The small side must broadcast (no shuffle of the big side)."""
    plan = plan_string(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"no broadcast join in plan:\n{plan}"
    )


def assert_partial_aggregation(df: DataFrame, fn_fragment: str) -> None:
    """Two-phase aggregation: a map-side partial must run before the
    exchange so the shuffle carries aggregation state (e.g. 16 KiB HLL
    sketches), not raw rows."""
    plan = plan_string(df, mode="simple")
    assert f"partial_{fn_fragment}" in plan, (
        f"no partial_{fn_fragment} (map-side combine) in plan:\n{plan}"
    )


def assert_whole_stage_codegen(df: DataFrame) -> None:
    """The hot path must stay inside fused JVM codegen (simple-mode nodes
    inside a codegen stage are ``*(n)``-prefixed)."""
    plan = plan_string(df, mode="simple")
    assert re.search(r"\*\(\d+\)", plan), f"no WholeStageCodegen span:\n{plan}"


def assert_sort_free_topk(df: DataFrame) -> None:
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-partition
    heaps + merge), never a global sort."""
    plan = plan_string(df)
    assert "TakeOrderedAndProject" in plan, f"top-k planned as full sort:\n{plan}"
