#!/usr/bin/env python3
"""Print the union of driver-checked query names across every
CORRECTNESS_r*.json — the refresh source for ``DRIVER_PROVEN`` in
kafka_go_cardinality_spark/queries.py (run at the START of each round,
after the driver drops the previous round's file, and paste the output
over the frozen set so the registry keeps fronting never-checked
queries for the driver's first-N correctness sweep)."""

from __future__ import annotations

import glob
import json
import textwrap


def main() -> int:
    checked: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        checked |= set(json.load(open(path)))
    names = ", ".join(f'"{n}"' for n in sorted(checked))
    body = textwrap.fill(
        names, width=76, initial_indent="    ", subsequent_indent="    "
    )
    print(f"# union of {len(checked)} names from "
          f"{len(glob.glob('CORRECTNESS_r*.json'))} CORRECTNESS files")
    print("DRIVER_PROVEN: frozenset[str] = frozenset({")
    print(body)
    print("})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
