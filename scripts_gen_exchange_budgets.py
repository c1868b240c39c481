#!/usr/bin/env python3
"""Regenerate tests/exchange_budgets.json — the per-query physical
exchange-count snapshot that test_exchange_counts_stay_within_budget
enforces.  Run after a DELIBERATE plan change:

    python scripts_gen_exchange_budgets.py

Budgets are taken at sf0.001 (the test fixture scale) so broadcast
threshold decisions match the test session's."""

from __future__ import annotations

import json


def main() -> int:
    from kafka_go_cardinality_spark.plans.inspect import count_exchanges
    from kafka_go_cardinality_spark.session import get_spark

    import __spark_entry__ as m

    spark = get_spark(app_name="kgc-exchange-budgets", shuffle_partitions="8")
    budgets = {
        name: count_exchanges(fn(spark, "/root/testdata/sf0.001"))
        for name, fn in sorted(m.queries().items())
        if not name.startswith("q_stream")
    }
    with open("tests/exchange_budgets.json", "w") as f:
        json.dump(budgets, f, indent=0, sort_keys=True)
    print(f"{len(budgets)} budgets written")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
