"""Fault-injection regression gate: the queries that once crashed or
diverged on poisoned input stay crash-free AND oracle-exact on a corpus
containing every poison class a 100 TB ingest will see — NULL keys,
NULL/epoch-0/far-future timestamps, ±1e308 measurements, NULL/empty
documents, non-numeric source names, NULL and wrong-dimension vectors,
and DUPLICATE business keys (re-crawled doc_ids, at-least-once event
delivery with fully-tied ordering columns, duplicate seed vec_ids).

The reference never aborts on malformed records (kafkaio.go:77-81 skips
and continues); every fix asserted here implements that policy with
DEFINED, oracle-mirrored semantics.  The full-registry sweep lives in
scripts_poison_audit.py (same poison tables); this test pins its
formerly-red subset so regressions surface in the fast suite.
"""

from __future__ import annotations

import duckdb
import pytest

from scripts_poison_audit import TABLES, build_poison_dir
from tests.conftest import assert_frames_match

# Formerly aborted the Spark job outright (ArrayIndexOutOfBounds,
# DIVIDE_BY_ZERO, CAST_INVALID_INPUT, KLL NULL buffer, ragged np.stack).
FORMER_CRASHERS = [
    "q_array_ops",
    "q_domain_mix",
    "q_emb_centroids",
    "q_emb_gram",
    "q_kmeans",
    "q_pipeline_curate",
    "q_quality_topfrac",
    "q_quantile_kll_rollup",
    "q_text_quality",
]

# Formerly hash-diverged from the oracle on poisoned rows (NULL-key
# ordering/join/grouping semantics, dtype poisoning).
FORMER_DIVERGERS = [
    "q_anomaly_mad",
    "q_anomaly_zscore",
    "q_argmax",
    "q_dedup_semantic",
    "q_emb_gram",
    "q_emb_quantize",
    "q_malformed_filter",
    "q_map_ops",
    "q_markov_transitions",
    "q_mm_decode",
    "q_quantile_hist_rollup",
    "q_quantile_kll_rollup",
    "q_retention_theta",
    "q_seg_overlap_exact",
    "q_seg_overlap_theta",
    "q_sessionize_batch",
    "q_text_dsir",
    "q_text_fingerprint",
    "q_text_hash_classifier",
    "q_text_normalize",
    "q_text_tokens",
    "q_ts_resample_ffill",
    "q_ts_resample_ffill_2level",
]


@pytest.fixture(scope="module")
def poison(spark):
    con = duckdb.connect()
    d = build_poison_dir(con)
    yield d, con
    con.close()


def _registry():
    import __spark_entry__ as m

    return m.queries(), m.oracle_sql()


@pytest.mark.parametrize("name", sorted(set(FORMER_CRASHERS + FORMER_DIVERGERS)))
def test_poisoned_input_parity(spark, poison, name):
    d, con = poison
    qs, os_ = _registry()
    pdf = qs[name](spark, d).toPandas()  # must not abort
    if name in os_:
        assert_frames_match(pdf, con.execute(os_[name]).fetchdf())


# Formerly hash-diverged when the poison audit first covered STREAMING
# replays (r11): the wire boundary drops malformed rows
# (parse_user_events — NULL uid/ts never leaves the source; the vector
# wire additionally drops wrong-dimension vectors per the similarity
# family's size==64 contract), but the oracles lacked the mirroring
# WHERE, so they kept a NULL/NaN group the stream can never emit —
# and the NULL poisoned the pandas dtype of every other row's column.
STREAM_FORMER_DIVERGERS = [
    "q_stream_card_day_exact",
    "q_stream_card_month_exact",
    "q_stream_dedup",
    "q_stream_enrich",
    "q_stream_session",
    "q_stream_upsert_sink",
    "q_stream_vec_assign",
]


@pytest.mark.parametrize("name", STREAM_FORMER_DIVERGERS)
def test_stream_poisoned_input_parity(spark, poison, name):
    d, con = poison
    qs, os_ = _registry()
    pdf = qs[name](spark, d).toPandas()  # replay must not abort
    assert_frames_match(pdf, con.execute(os_[name]).fetchdf())


def test_poison_tables_cover_all_base_tables():
    assert set(TABLES) == {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }


# Formerly crashed or hash-diverged on a ZERO-row corpus (empty-seed
# models, partitioned layouts with no files, grouping-set grand totals)
# — scripts_empty_audit.py is the full-registry sweep; this pins its
# formerly-red subset in the fast suite.
EMPTY_FORMER_RED = [
    "q_cube",
    "q_dedup_semantic",
    "q_grouping_sets",
    "q_kmeans",
    "q_rollup",
    "q_scan_dpp",
    "q_scan_partition_pruned",
    "q_sim_ann_ivf",
    "q_sim_ann_pq",
]


@pytest.fixture(scope="module")
def empty_dir():
    from scripts_empty_audit import build_empty_dir

    con = duckdb.connect()
    d = build_empty_dir(con)
    yield d, con
    con.close()


@pytest.mark.parametrize("name", EMPTY_FORMER_RED)
def test_empty_corpus_former_red(name, spark, empty_dir):
    """Every formerly-red query runs on the all-empty corpus and, when
    oracled, matches DuckDB (zero-vs-zero counts as a match — empty
    frames carry engine-convention dtypes, not data)."""
    import __spark_entry__ as m

    d, con = empty_dir
    qs, os_ = m.queries(), m.oracle_sql()
    s = qs[name](spark, d).toPandas()
    if name not in os_:
        return
    o = con.execute(os_[name]).fetchdf()
    if len(s) == 0 and len(o) == 0:
        return
    assert_frames_match(s, o)


# Formerly crashed on the ALL-IDENTICAL corpus (N distinct-keyed copies
# of one row per table: zero dispersion in every group).  Spark under
# ANSI aborts on sigma=0 divisions — built-in ``corr`` included — where
# DuckDB returns NULL; the contract is NULL corr / no anomalies on both
# engines.  scripts_empty_audit.py --clones N is the full-registry
# sweep; this pins its formerly-red subset.
CLONE_FORMER_RED = ["q_agg_stats", "q_anomaly_zscore"]


@pytest.fixture(scope="module")
def clone_dir():
    from scripts_empty_audit import build_clone_dir

    con = duckdb.connect()
    d = build_clone_dir(con, 8)
    yield d, con
    con.close()


# Formerly took >3 min PER DOCUMENT in the DuckDB oracle on a 100k-token
# document: list_min(list_slice(..)) / list_slice-per-chunk cost grows
# with the FULL list length in DuckDB, turning window selection
# quadratic in document length.  Both oracles now use direct indexing
# (least(gh[i]..gh[i+w-1]); list_transform(range(s, s+len), j -> t[j])).
# scripts_empty_audit.py --longdoc N is the full-registry sweep; this
# pins the formerly-pathological subset at 20k tokens (>10x the old
# quadratic knee, <5 s fixed).
LONGDOC_FORMER_SLOW = ["q_text_winnow", "q_dedup_winnow", "q_text_chunk"]


@pytest.fixture(scope="module")
def longdoc_dir():
    from scripts_empty_audit import build_longdoc_dir

    con = duckdb.connect()
    d = build_longdoc_dir(con, 20000)
    yield d, con
    con.close()


@pytest.mark.parametrize("name", LONGDOC_FORMER_SLOW)
def test_longdoc_corpus_former_slow(name, spark, longdoc_dir):
    """One pathological 20k-token document must neither abort nor stall
    either engine, and values must stay parity-exact."""
    import __spark_entry__ as m

    d, con = longdoc_dir
    qs, os_ = m.queries(), m.oracle_sql()
    s = qs[name](spark, d).toPandas()
    o = con.execute(os_[name]).fetchdf()
    assert_frames_match(s, o)


@pytest.mark.parametrize("name", CLONE_FORMER_RED)
def test_identical_corpus_former_red(name, spark, clone_dir):
    """Zero-dispersion groups must not abort and must agree with the
    oracle on the defined degenerate value (NULL corr, zero anomalies)."""
    import __spark_entry__ as m

    d, con = clone_dir
    qs, os_ = m.queries(), m.oracle_sql()
    s = qs[name](spark, d).toPandas()
    o = con.execute(os_[name]).fetchdf()
    if len(s) == 0 and len(o) == 0:
        return
    assert_frames_match(s, o)


# Unicode-semantics pin: the queries whose results depend most directly
# on lower()/regex/length behavior, run over the adversarial
# multilingual corpus (CJK no-space, ZWJ emoji, astral-plane case maps,
# NFC-vs-NFD twins, Turkish İ, final sigma, Cherokee, RTL, zalgo —
# scripts_empty_audit.UNICODE_DOCS).  The round-6 full-registry sweep
# (scripts_empty_audit.py --unicode) found ZERO divergences — the fold
# contract and byte-level md5 discipline hold; this subset keeps the
# class from regressing in the fast suite.
UNICODE_SENSITIVE = [
    "q_text_tokens",
    "q_text_normalize",
    "q_text_langid",
    "q_text_ccnet_buckets",
    "q_text_chunk",
    "q_text_pii_scrub",
    "q_dedup_ngram",
    "q_text_winnow",
    # The r8 BPE oracles: three symbol alphabets must agree per CODE
    # POINT — Spark split(w,''), the Python trainer's tuple(w), and the
    # oracle's utf8proc '(.)' — which this corpus's Deseret/emoji/ZWJ
    # words exercise directly.
    "q_text_bpe_merges",
    "q_text_bpe_encode",
    "q_seq_pack_bpe",
]


@pytest.fixture(scope="module")
def unicode_dir():
    from scripts_empty_audit import build_unicode_dir

    con = duckdb.connect()
    d = build_unicode_dir(con)
    yield d, con
    con.close()


@pytest.mark.parametrize("name", UNICODE_SENSITIVE)
def test_unicode_corpus_parity(name, spark, unicode_dir):
    """Adversarial multilingual text must neither abort nor diverge:
    JVM (UTF-16) and DuckDB (utf8proc) agree value-exactly."""
    import __spark_entry__ as m

    d, con = unicode_dir
    qs, os_ = m.queries(), m.oracle_sql()
    s = qs[name](spark, d).toPandas()
    o = con.execute(os_[name]).fetchdf()
    assert_frames_match(s, o)
