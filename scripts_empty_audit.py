"""Empty-corpus audit: run every registered query over ZERO-row tables.

An empty source is a normal production state — a brand-new ingest
partition, a fully filtered backfill, a tenant with no data yet — and a
100 TB pipeline hits it on day one.  The reference idles gracefully on
an empty topic (kafkaio.go:59-75 just keeps polling); this audit holds
every batch query to the same bar: no crash, and the DuckDB oracle
agrees on what zero input means.

Classes this audit caught (all fixed, pinned in tests/test_poison.py):
- collect()-seeded models (IVF centroids, k-means init, PQ codebooks,
  SemDeDup cells) built ``array()`` of zero scores (NULL-type analysis
  abort) or indexed an empty numpy sample — now typed empty results;
- the date-partitioned events layout wrote ZERO part files (partitioned
  writes skip empty partitions) and schema inference over the empty
  directory aborted the read — reads now carry the explicit schema
  (sources/tables.read_partitioned_events);
- rollup/cube/grouping-sets: ANSI gives the empty grouping set one n=0
  row over empty input (DuckDB does); Spark's Expand emits nothing —
  the contract is Spark's (zero rows → zero groups), pinned in the
  oracles with ``HAVING count(*) > 0``.

The ``--rows N`` variant runs the same sweep over an N-row corpus (one
row per table) — the SINGLETON class: every group a singleton, every
model fit from fewer vectors than its seed count, every self-join a
single candidate.  Caught: k-means indexing past a seed list shorter
than k (operators/similarity.kmeans_fit — the effective k is the init
set's size).

The ``--clones N`` variant is the ALL-IDENTICAL corpus: N copies of one
row per table with distinct business keys but byte-identical payloads —
the densest possible duplicate clique (every doc a near-dup of every
other, one giant group per aggregation key, every event the same user
at the same instant).  Dedup ops must flag the full clique, pair
enumeration must stay key-tie-broken, and single-group skew must not
diverge between engines.

The ``--longdoc N`` variant is the PATHOLOGICAL-ROW corpus: the full
sf0.01 tables plus ONE extra document of N tokens (vocab-997 cycle —
realistic repetition, not one repeated token).  Every in-row
tokenize/gram/shingle/winnow array materializes at N elements inside a
single task — the row that OOMs a 100 TB job if per-doc work is ever
accidentally quadratic — and every posting list it feeds grows by N.

Usage:
    python3 scripts_empty_audit.py                 # zero-row corpus, all queries
    python3 scripts_empty_audit.py --rows 1        # singleton corpus
    python3 scripts_empty_audit.py --clones 40     # all-identical corpus
    python3 scripts_empty_audit.py --longdoc 100000  # one huge document
    python3 scripts_empty_audit.py --unicode       # adversarial multilingual corpus
    python3 scripts_empty_audit.py q_kmeans        # one query

Streaming queries are INCLUDED (since r11, like the poison audit): each
replay materializes its wire dump from the audited dir, so the empty /
singleton / clone / longdoc / unicode corpora flow through the real
wire-parse path.  The empty case is the reference's idle-topic state
(kafkaio.go:59-75 keeps polling) — every replay must come back
zero-row without aborting, including the model-seeded ones
(q_stream_vec_assign's empty-seed early return, the near-dup guard's
empty static index).
"""

from __future__ import annotations

import sys
import tempfile

import duckdb

from scripts_poison_audit import SRC, TABLES


def build_empty_dir(con: duckdb.DuckDBPyConnection, rows: int = 0) -> str:
    """Write a corpus of ``rows`` rows per table (0 = empty) and register
    the DuckDB views over it — both engines then read the SAME files, so
    row selection can't diverge."""
    d = tempfile.mkdtemp(prefix="empty_" if rows == 0 else f"tiny{rows}_")
    for t in TABLES:
        clause = "WHERE false" if rows == 0 else f"LIMIT {rows}"
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            f" {clause}) TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    return d


# Business-key columns overridden with 0..N-1 in --clones mode; every
# other column is a byte-identical copy of the table's first row.
CLONE_KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build_clone_dir(con: duckdb.DuckDBPyConnection, n: int) -> str:
    """N distinct-keyed copies of each table's first row."""
    d = tempfile.mkdtemp(prefix=f"clone{n}_")
    for t in TABLES:
        cols = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchall()
        keys = set(CLONE_KEYS[t])
        sel = ", ".join(
            f'CAST(g.i AS {typ}) AS "{name}"' if name in keys else f'b."{name}"'
            for name, typ, *_ in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM (SELECT * FROM "
            f"read_parquet('{SRC}/{t}.parquet') LIMIT 1) b "
            f"CROSS JOIN range({n}) g(i)) TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    return d


def build_longdoc_dir(con: duckdb.DuckDBPyConnection, n_tokens: int) -> str:
    """The full source corpus plus one N-token document (and its
    embedding-table absence — a doc with no vector is already a defined
    state).  Token stream cycles a 997-word vocabulary so shingles
    repeat realistically instead of collapsing to one gram."""
    d = tempfile.mkdtemp(prefix=f"longdoc{n_tokens}_")
    for t in TABLES:
        if t == "documents":
            con.execute(
                f"""COPY (
                  SELECT * FROM read_parquet('{SRC}/documents.parquet')
                  UNION ALL BY NAME
                  SELECT (SELECT max(doc_id) + 1
                          FROM read_parquet('{SRC}/documents.parquet')) AS doc_id,
                         big.t AS text,
                         'en' AS lang,
                         'longdoc' AS source,
                         length(big.t) AS n_chars
                  FROM (SELECT string_agg('w' || (i % 997), ' ' ORDER BY i) AS t
                        FROM range({n_tokens}) r(i)) big
                ) TO '{d}/documents.parquet' (FORMAT PARQUET)"""
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
                f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
            )
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    return d


# Adversarial Unicode documents: every class where JVM (UTF-16,
# java.lang string tables) and DuckDB (UTF-8, utf8proc) could disagree
# on lower/regex/length semantics.  Each tuple is (lang, text).
UNICODE_DOCS = [
    # CJK, no whitespace — the whole doc is ONE token.
    ("ja", "春眠不覚暁処処聞啼鳥夜来風雨声花落知多少"),
    # Ideographic space U+3000 and NBSP U+00A0 — neither is \\s in
    # Java's ASCII \\s nor RE2's: both engines must KEEP them inside
    # tokens, identically.
    ("ja", "漢字　かな mixed spacing test"),
    # ZWJ emoji family + skin-tone modifiers + flags (surrogate pairs
    # in UTF-16 — astral-plane indexing stress).
    ("en", "family \U0001f468‍\U0001f469‍\U0001f467‍\U0001f466 wave \U0001f44b\U0001f3fd flag \U0001f1ef\U0001f1f5 done"),
    # Astral-plane cased letters: Deseret has real upper/lower maps.
    ("en", "\U00010400\U00010401\U00010402 deseret \U00010428\U00010429\U0001042a and math \U0001d407\U0001d41e\U0001d425\U0001d425\U0001d428"),
    # NFC vs NFD of the same words — byte-distinct, must stay distinct
    # on BOTH engines (no engine normalizes behind our back).
    ("fr", "école résumé déjà"),
    ("fr", "école résumé déjà"),
    # Turkish dotted/dotless i — the fold contract's home turf.
    ("tr", "İstanbul DİYARBAKIR ısparta IĞDIR"),
    # Greek final sigma + full-word caps.
    ("el", "ΟΔΥΣΣΕΥΣ οδυσσεύς ΤΈΛΟΣ τέλος"),
    # German sharp s and capital sharp s U+1E9E.
    ("de", "STRASSE straße GROẞ groß"),
    # Cherokee: lowercase letters added in Unicode 8 — a Unicode-table
    # version skew candidate between JVM and utf8proc.
    ("en", "ᏣᎳᎩ ᎦᏬᏂᎯᏍᏗ tsalagi"),
    # RTL Arabic + tatweel, Hebrew + niqqud.
    ("ar", "السلام عليكم ورحمة الله"),
    ("he", "שָׁלוֹם עֲלֵיכֶם"),
    # Ligatures and fullwidth forms — lower() must not decompose.
    ("en", "ﬁnal ﬆreet ＦＵＬＬＷＩＤＴＨ ｔｅｘｔ"),
    # Combining-mark pileup (zalgo) — per-codepoint ops stay linear.
    ("en", "z̀́̂̃̄̅ă̇̈l̉̊̋ǧ̍̎ȍ̐̑ text"),
]


def build_unicode_dir(con: duckdb.DuckDBPyConnection) -> str:
    """The full source corpus plus the adversarial-Unicode documents
    (source='unicode', doc ids continuing after max) — both engines
    read the same parquet, so any result divergence is a SEMANTICS
    divergence (lower/regex/length), never an input artifact."""
    import pandas as pd

    d = tempfile.mkdtemp(prefix="unicode_")
    base_max = con.execute(
        f"SELECT max(doc_id) FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    extra = pd.DataFrame(
        {
            "doc_id": [base_max + 1 + i for i in range(len(UNICODE_DOCS))],
            "text": [t for _, t in UNICODE_DOCS],
            "lang": [lang for lang, _ in UNICODE_DOCS],
            "source": ["unicode"] * len(UNICODE_DOCS),
            "n_chars": [len(t) for _, t in UNICODE_DOCS],
        }
    )
    con.register("unicode_extra", extra)
    for t in TABLES:
        if t == "documents":
            con.execute(
                f"""COPY (
                  SELECT * FROM read_parquet('{SRC}/documents.parquet')
                  UNION ALL BY NAME
                  SELECT doc_id, text, lang, source,
                         CAST(n_chars AS BIGINT) AS n_chars
                  FROM unicode_extra
                ) TO '{d}/documents.parquet' (FORMAT PARQUET)"""
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
                f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
            )
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

    argv = sys.argv[1:]
    rows, clones = 0, 0
    if "--rows" in argv:
        i = argv.index("--rows")
        rows = int(argv[i + 1])
        del argv[i : i + 2]
    if "--clones" in argv:
        i = argv.index("--clones")
        clones = int(argv[i + 1])
        del argv[i : i + 2]
    longdoc = 0
    if "--longdoc" in argv:
        i = argv.index("--longdoc")
        longdoc = int(argv[i + 1])
        del argv[i : i + 2]
    unicode_sweep = "--unicode" in argv
    if unicode_sweep:
        argv.remove("--unicode")
    only = argv[0] if argv else None
    spark = get_spark(app_name="empty-audit", shuffle_partitions="8")
    qs, os_ = m.queries(), m.oracle_sql()
    con = duckdb.connect()
    if unicode_sweep:
        d = build_unicode_dir(con)
    elif longdoc:
        d = build_longdoc_dir(con, longdoc)
    elif clones:
        d = build_clone_dir(con, clones)
    else:
        d = build_empty_dir(con, rows)

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
        # Zero-vs-zero short-circuits the dtype comparison: an empty
        # pandas frame's column dtypes depend on the engine's empty-
        # result conventions, not on the data contract.
        if (len(s) == 0 and len(o) == 0) or norm(s).equals(norm(o)):
            ok += 1
        else:
            mismatches.append((name, len(s), len(o)))
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
