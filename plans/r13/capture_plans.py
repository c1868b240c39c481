"""Capture explain("formatted") for a list of queries into plans/r13/.

Usage: python plans/r13/capture_plans.py <suffix> q_a q_b ...
Writes plans/r13/<query>_<suffix>.txt
"""
import io
import sys
from contextlib import redirect_stdout

from kafka_go_cardinality_spark.session import get_spark
import __spark_entry__ as entry

SF = "/root/testdata/sf0.1"


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(app_name="kgc-plan-capture")
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"plans/r13/{name}_{suffix}.txt", "w") as fh:
            fh.write(buf.getvalue())
        print(f"captured {name}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
