"""Fault-injection audit: run every registered query over POISONED tables.

A 100 TB corpus WILL contain rows the sf* fixtures happen not to have:
NULL keys, empty documents, epoch-0 / far-future timestamps, +/-1e308
and NaN measurements, NULL / wrong-dimension / NaN-element /
NULL-element embedding vectors, non-numeric source names, and multilingual text whose case
folding diverges between engines under plain lower() (Turkish İ, Greek
final Σ — see functions.fold), and DUPLICATE business keys — the same
event_id/doc_id/vec_id ingested twice (a re-crawl, an at-least-once
source), including the fully-tied case: same key, same ordering
columns, different payload.  The reference never aborts on malformed input
(kafkaio.go:77-81 skips and continues); this audit holds every query to
the same bar, and further demands that the DuckDB oracle AGREES on what
the poisoned rows mean — i.e. degenerate-input semantics are defined,
not accidental.

Usage:
    python3 scripts_poison_audit.py            # summary over all queries
    python3 scripts_poison_audit.py q_argmax   # per-row diff for one query

Streaming queries are INCLUDED (since r11): each replay materializes its
wire dump from the poisoned dir, so the malformed-row filter at the wire
boundary (parse_user_events — the reference's kafkaio.go:77-81
log-and-continue skip) is exercised against real poison, and every
streaming oracle must agree on which rows that filter drops.
"""

from __future__ import annotations

import sys
import tempfile

import duckdb

SRC = "/root/testdata/sf0.001"

# Poisoned copies: base fixture + adversarial rows appended via DuckDB SQL.
POISON = {
    "events": """
      SELECT * FROM read_parquet('{src}/events.parquet')
      UNION ALL SELECT * FROM (VALUES
        (900001, TIMESTAMP '1970-01-01 00:00:00', NULL, 'click', NULL, NULL),
        (900002, NULL, 7, NULL, 0.0, '{{}}'),
        (900003, TIMESTAMP '2199-12-31 23:59:59', 7, 'click', 1e308, '{{}}'),
        (900004, TIMESTAMP '2024-01-02 00:00:00', NULL, '', -1e308, NULL),
        (900005, TIMESTAMP '2024-01-03 00:00:00', 9, 'click', CAST('nan' AS DOUBLE), '{{"k": 1}}'),
        (900010, TIMESTAMP '2024-01-04 00:00:00', 11, 'click', 1.0, '{{}}'),
        (900010, TIMESTAMP '2024-01-04 00:00:00', 11, 'click', 2.0, '{{}}')
      ) v(event_id, ts, user_id, event_type, value, props)""",
    "documents": """
      SELECT * FROM read_parquet('{src}/documents.parquet')
      UNION ALL SELECT * FROM (VALUES
        (910001, NULL, NULL, NULL, NULL),
        (910002, '', 'en', 'crawl_z', 0),
        (910003, 'one two', NULL, 'crawl_z', 7),
        (910004, 'Größe STRAßE İstanbul Émile naïve CAFÉ über ÇOCUK',
         'de', 'crawl_u', 49),
        (910005, 'ΣΟΦΟΣ ΑΣ ς i̇x İ', 'el', 'crawl_u', 16),
        (910010, 'first crawl of a re-crawled page', 'en', 'crawl_a', 32),
        (910010, 'second crawl same id with different and longer bytes', 'en', 'crawl_b', 52)
      ) v(doc_id, text, lang, source, n_chars)""",
    "embeddings": """
      SELECT * FROM read_parquet('{src}/embeddings.parquet')
      UNION ALL SELECT 920001, NULL, NULL
      UNION ALL SELECT 920002,
                      CAST(list_transform(range(32), x -> 0.5) AS FLOAT[]), 2
      UNION ALL SELECT 920003,
                      CAST(list_transform(range(64),
                           x -> CASE WHEN x = 0 THEN CAST('nan' AS FLOAT)
                                     ELSE 0.5 END) AS FLOAT[]), 3
      UNION ALL SELECT 920004,
                      CAST(list_transform(range(64),
                           x -> CASE WHEN x = 0 THEN NULL
                                     ELSE 0.5 END) AS FLOAT[]), 3
      UNION ALL SELECT 920010,
                      CAST(list_transform(range(64), x -> 0.25) AS FLOAT[]), 1
      UNION ALL SELECT 920010,
                      CAST(list_transform(range(64), x -> -0.25) AS FLOAT[]), 2
      UNION ALL SELECT 3,
                      CAST(list_transform(range(64), x -> 0.125) AS FLOAT[]), 0
    """,
}

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def build_poison_dir(con: duckdb.DuckDBPyConnection) -> str:
    d = tempfile.mkdtemp(prefix="poison_")
    for t in TABLES:
        sql = POISON.get(t)
        q = (
            sql.format(src=SRC)
            if sql
            else f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        )
        con.execute(f"COPY ({q}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    return d


def norm(p):
    p = p[sorted(p.columns)]
    return p.astype(str).sort_values(by=list(p.columns)).reset_index(drop=True)


def main() -> int:
    from kafka_go_cardinality_spark.session import get_spark

    import __spark_entry__ as m

    only = sys.argv[1] if len(sys.argv) > 1 else None
    spark = get_spark(app_name="poison-audit", shuffle_partitions="8")
    qs, os_ = m.queries(), m.oracle_sql()
    con = duckdb.connect()
    d = build_poison_dir(con)

    crashes, oracle_crashes, mismatches, ok = [], [], [], 0
    names = [only] if only else sorted(qs)
    for name in names:
        try:
            s = qs[name](spark, d).toPandas()
        except Exception as e:  # noqa: BLE001 — audit collects, never raises
            crashes.append(
                (name, type(e).__name__, str(e)[:110].replace("\n", " "))
            )
            continue
        if name not in os_:
            ok += 1
            continue
        try:
            o = con.execute(os_[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            oracle_crashes.append((name, str(e)[:80].replace("\n", " ")))
            continue
        ns, no = norm(s), norm(o)
        if ns.equals(no):
            ok += 1
        else:
            mismatches.append(name)
            if only:
                import pandas as pd

                with pd.option_context(
                    "display.max_rows", 60, "display.width", 200
                ):
                    merged = ns.merge(no, how="outer", indicator=True)
                    print(merged[merged["_merge"] != "both"])
    print("OK:", ok)
    print("SPARK CRASHES:")
    for c in crashes:
        print(" ", c)
    print("ORACLE CRASHES:")
    for c in oracle_crashes:
        print(" ", c)
    print("MISMATCHES:", mismatches)
    spark.stop()
    return 1 if crashes else 0


if __name__ == "__main__":
    raise SystemExit(main())
