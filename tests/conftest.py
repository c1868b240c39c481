"""Shared test fixtures: one local SparkSession, a DuckDB connection with
the fixture tables pre-registered (mirroring the driver's oracle setup),
and an order-insensitive result comparator."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from kafka_go_cardinality_spark.session import get_spark
from kafka_go_cardinality_spark.sources import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)
# The oracle-parity sweep runs at the DRIVER'S checking scale (sf0.01)
# so scale-sensitive surprises (single-row pruning results, broadcast
# flips) surface locally first; everything else (plan pins, exchange
# budgets, accuracy) stays on the sf0.001 quick loop.  Point this env at
# sf0.001 to speed up an inner dev loop.
PARITY_SF_DIR = os.environ.get(
    "SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.01"
)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="kgc-spark-tests", shuffle_partitions="8")
    yield spark
    spark.stop()


@pytest.fixture(autouse=True)
def _release_operator_caches():
    """Tests that call operators DIRECTLY (bypassing the registry's
    entry-releases) would otherwise pin persisted intermediates for the
    whole session; drain the tracked-cache registry after every test."""
    yield
    from kafka_go_cardinality_spark.caching import release_tracked

    release_tracked()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR_ORACLE}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def parity_sf_dir() -> str:
    return PARITY_SF_DIR


@pytest.fixture(scope="session")
def parity_duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{PARITY_SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style normalization: columns sorted by name, rows sorted by
    all values, index dropped — so comparison is order-insensitive."""
    out = df[sorted(df.columns)].copy()
    # stringify for a total ordering across mixed/NaN columns
    order = out.astype(str).sort_values(by=list(out.columns)).index
    return out.loc[order].reset_index(drop=True)


def assert_frames_match(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, rel_tol: float = 1e-9
) -> None:
    """Order-insensitive equality with exact match for non-floats and
    a tight relative tolerance for floats (the driver hashes values, so any
    float divergence is a red flag — we round in-query instead of relying
    on tolerance; the tolerance here only cushions representation noise)."""
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"column mismatch: {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    assert len(a) == len(b), f"row count {len(a)} vs {len(b)}"
    for col in a.columns:
        av, bv = a[col], b[col]
        # A float column on one side with an integer column on the other
        # is a declared-type divergence even when values coincide — the
        # driver stringifies/hashes what fetchdf returns, and "45.0" !=
        # "45" (e.g. DuckDB windowed SUM yields HUGEINT → pandas float64;
        # the oracle must CAST it back to BIGINT).
        assert pd.api.types.is_float_dtype(av) == pd.api.types.is_float_dtype(bv), (
            f"dtype kind mismatch in column {col!r}: "
            f"spark={av.dtype} vs oracle={bv.dtype}"
        )
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            pd.testing.assert_series_equal(
                av.astype(float),
                bv.astype(float),
                check_names=False,
                rtol=rel_tol,
                atol=1e-12,
            )
        else:
            assert av.astype(str).tolist() == bv.astype(str).tolist(), (
                f"value mismatch in column {col!r}:\n{av.head()}\nvs\n{bv.head()}"
            )
