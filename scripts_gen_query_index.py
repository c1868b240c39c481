#!/usr/bin/env python3
"""Generate QUERIES.md — the one-line index of every declared query —
from the live registry (single source of truth: __spark_entry__).
Regenerate with:  python scripts_gen_query_index.py > QUERIES.md
The sync test in tests/test_analytics.py fails if this file goes stale.
"""

from __future__ import annotations


def render() -> str:
    import __spark_entry__ as m

    qs, oracles = m.queries(), m.oracle_sql()
    lines = [
        "# QUERIES — declared surface index (generated; do not edit)",
        "",
        "Regenerate: `python scripts_gen_query_index.py > QUERIES.md`.",
        f"{len(qs)} queries: {len(oracles)} DuckDB-oracle-checked, "
        f"{len(qs) - len(oracles)} rows-only (approx estimators / iterative "
        "/ mapInPandas plumbing — SURVEY.md §7.3).",
        "",
        "| Query | Check | Summary |",
        "|---|---|---|",
    ]
    for name in sorted(qs):
        raw = " ".join((qs[name].__doc__ or "").split())
        doc = raw.split(". ")[0].rstrip(".")
        if len(doc) > 140:
            doc = doc[:137] + "..."
        check = "oracle" if name in oracles else "rows-only"
        lines.append(f"| `{name}` | {check} | {doc}. |")
    return "\n".join(lines) + "\n"


if __name__ == "__main__":
    print(render(), end="")
