"""[CORE] Windowed distinct-user cardinality — the reference's entire query
surface, re-expressed as declarative Spark aggregations.

Reference semantics (see ``/root/reference/processor/processor.go``):

- five window grains, ``minute/day/week/month/year``
  (processor.go:26-32, 36-53);
- per-grain HyperLogLog sketch at precision 14 (≈0.81% rsd), inserted with
  the event's ``uid`` (processor.go:80, 87);
- emits ``StatMsg{Type, Timestamp=window start, Value=estimate}``
  (processor.go:18-22, 90-94).

Design divergences (SURVEY.md §2.4): we use epoch-aligned calendar windows
via ``date_trunc`` instead of the reference's data-driven drifting windows,
and we are late-data-tolerant (grouping is by event time, not arrival
order).  Both are strictly better-defined and are what the driver's
``spark_approach`` prescribes.

Scale notes (100 TB):

- approx counts use ``hll_sketch_agg`` (Apache DataSketches HLL,
  Spark 3.5+) — map-side partial sketches merged across partitions, so
  the shuffle moves sketches per (grain, window) group, not raw uids.
  This is the single biggest scale win over the reference's one-process
  design.  DataSketches over ``approx_count_distinct``'s HLL++ because
  its sketches are SPARSE below the register-promotion threshold: a
  near-empty window costs tens of bytes of aggregation state, not the
  ~21 KiB dense buffer HLL++ allocates per (group, partition)
  unconditionally.  Fine grains (minute at 100 TB ≈ millions of groups)
  are exactly the many-groups/few-rows regime where that constant
  dominates — measured 8.6× on the minute grain and 4-5× even on
  coarse grains at sf0.1.  Estimates match axiomhq's precision
  (lg_k=14 = the reference's 2^14 registers, processor.go:80).
- exact ``count(distinct ...)`` expands to a two-phase aggregate
  (distinct-first partial, then count); it shuffles the distinct keys and is
  kept as the oracle-checkable twin, not the scale path.
- grain fan-out (processor.go:60-75 spawns 5 goroutines per message) is a
  ``explode(array(...))`` over grain names → ONE shuffle keyed by
  (grain, window) instead of five passes over the input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from kafka_go_cardinality_spark.functions import hash64

# Grain name ↔ the reference's StatType enum (processor.go:26-32), minus the
# "_count" suffix which we keep in the output `type` column.
GRAINS = ("minute", "day", "week", "month", "year")

# The reference sketch is HLL precision 14 — 16,384 registers, theoretical
# rsd 1.04/sqrt(2^14) ≈ 0.81% (processor.go:80 via axiomhq's New();
# /root/reference/README.md:4 claims "<1%").  DataSketches lg_k=14 is the
# same register count, with a sparse representation below promotion (see
# module docstring).  Both batch and streaming approx paths use it.
REFERENCE_LG_K = 14


def _hll_estimate(col: str) -> Column:
    """DataSketches HLL estimate of ``count(distinct col)`` at the
    reference's register count.  ``hll_sketch_agg`` hashes strings and
    binary directly; casting keeps the hashed representation stable for
    any input type."""
    return F.hll_sketch_estimate(
        F.hll_sketch_agg(F.col(col).cast("string"), F.lit(REFERENCE_LG_K))
    )


def _window_start(ts: Column, grain: str) -> Column:
    """Epoch-aligned window start for a grain, as epoch seconds (BIGINT).

    ``date_trunc`` handles all five grains uniformly — including calendar
    month/year, which Spark's ``window()`` cannot express (it rejects month
    durations).  Emitting epoch seconds keeps the output type identical to
    the reference's ``Timestamp uint64`` field (processor.go:20) and avoids
    timestamp-precision mismatches across engines.
    """
    return F.date_trunc(grain, ts).cast("long")


def cardinality(events: DataFrame, grain: str, exact: bool) -> DataFrame:
    """Distinct-user count per `grain` window, shaped like StatMsg.

    Output columns: ``type`` (e.g. "day_count"), ``timestamp`` (window start,
    epoch seconds), ``value`` (distinct-user count or HLL estimate).
    Mirrors processor.go:84-101's flush output, with epoch-aligned windows.
    """
    if grain not in GRAINS:
        raise ValueError(f"unknown grain {grain!r}; expected one of {GRAINS}")
    agg = F.count_distinct(F.col("user_id")) if exact else _hll_estimate("user_id")
    keyed = events.select(
        _window_start(F.col("ts"), grain).alias("timestamp"), "user_id"
    )
    return (
        keyed.groupBy("timestamp")
        .agg(agg.alias("value"))
        .select(
            F.lit(f"{grain}_count").alias("type"),
            F.col("timestamp"),
            F.col("value"),
        )
    )


def grain_fanout(events: DataFrame, exact: bool = True) -> DataFrame:
    """All five grains in one pass — the Spark-first version of the
    reference's per-message 5-goroutine fan-out (processor.go:60-75).

    ``explode`` multiplies each event into one row per grain, then a single
    grouped aggregation keyed by (grain, window start) computes every grain
    concurrently in one shuffle.  At scale this reads the input once instead
    of five times; partial aggregation still happens map-side per key.
    """
    grains = F.array(*[F.lit(g) for g in GRAINS])
    exploded = events.select(
        F.explode(grains).alias("grain"), F.col("ts"), F.col("user_id")
    )
    # date_trunc(grain_column, ts) requires a foldable grain in some engines;
    # Spark accepts a column fmt only via expr — build with CASE instead so
    # the expression stays codegen-friendly and portable.
    window_start = F.coalesce(
        *[
            F.when(F.col("grain") == g, _window_start(F.col("ts"), g))
            for g in GRAINS
        ]
    ).alias("timestamp")
    agg = F.count_distinct(F.col("user_id")) if exact else _hll_estimate("user_id")
    return (
        exploded.select(F.concat(F.col("grain"), F.lit("_count")).alias("type"), window_start, "user_id")
        .groupBy("type", "timestamp")
        .agg(agg.alias("value"))
    )


def salted_exact_cardinality(
    events: DataFrame, grain: str, buckets: int = 16
) -> DataFrame:
    """Skew-proof EXACT distinct count: salt on ``hash(user_id) % buckets``.

    A plain ``count(distinct)`` shuffles every distinct key of a group to
    one reducer — a single hot window (one day holding half of 100 TB's
    events) serializes on one task.  Salting by a hash OF THE COUNTED
    COLUMN keeps the count decomposable: each distinct uid lands in
    exactly one salt bucket, so per-(window, salt) distinct counts sum to
    the true distinct count, and the hot window's work spreads over
    ``buckets`` reducers.  Identical semantics to ``cardinality(exact=True)``
    — same DuckDB oracle — with a plan that survives skew the reference
    (single process, processor.go:80) could never see.
    """
    if grain not in GRAINS:
        raise ValueError(f"unknown grain {grain!r}; expected one of {GRAINS}")
    salted = events.select(
        _window_start(F.col("ts"), grain).alias("timestamp"),
        "user_id",
        F.pmod(F.xxhash64("user_id"), F.lit(buckets)).alias("salt"),
    )
    partial = salted.groupBy("timestamp", "salt").agg(
        F.count_distinct("user_id").alias("partial_value")
    )
    return (
        partial.groupBy("timestamp")
        .agg(F.sum("partial_value").alias("value"))
        .select(F.lit(f"{grain}_count").alias("type"), "timestamp", "value")
    )


def bitmap_exact_cardinality(events: DataFrame, grain: str) -> DataFrame:
    """Skew-proof EXACT distinct count for integer keys via two-level
    bitmap aggregation (``bitmap_construct_agg``, Spark 3.5+).

    Level 1 groups by (window, ``bitmap_bucket_number(uid)``) and builds a
    4 KB bitmap of the bucket's bit positions; level 2 sums per-bucket
    ``bitmap_count``s.  Exactness without shuffling raw keys: the exchange
    carries one bitmap per (window, bucket) — each covering 32,768 ids —
    and partial aggregation ORs bitmaps map-side.  Compared to
    ``count(distinct)`` (shuffles every distinct uid to one reducer per
    window) this bounds both wire bytes and per-reducer fan-in, and the
    level-1 bitmaps are persistable: a day's bitmap table re-aggregates
    into months by OR, the exact-count analogue of ``sketch_rollup``.
    Integer-key-only by construction (uids here are longs).
    """
    if grain not in GRAINS:
        raise ValueError(f"unknown grain {grain!r}; expected one of {GRAINS}")
    keyed = events.select(
        _window_start(F.col("ts"), grain).alias("timestamp"), "user_id"
    )
    per_bucket = keyed.groupBy(
        "timestamp", F.bitmap_bucket_number(F.col("user_id")).alias("bucket")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position(F.col("user_id"))).alias("bm")
    )
    return (
        per_bucket.groupBy("timestamp")
        .agg(F.sum(F.bitmap_count(F.col("bm"))).alias("value"))
        .select(F.lit(f"{grain}_count").alias("type"), "timestamp", "value")
    )


def sketch_rollup(events: DataFrame, lg_k: int = 14) -> DataFrame:
    """Re-mergeable sketch tables — the 100 TB pattern the reference's
    in-memory sketches (processor.go:80-82) cannot do: persist one
    DataSketches HLL per fine window, then answer ANY coarser window by
    merging sketches, never re-reading raw uids.

    ``hll_sketch_agg`` (Spark 3.5+, Apache DataSketches) differs from
    ``approx_count_distinct``'s HLL++ in one crucial way: its binary
    sketches are first-class column values that ``hll_union_agg`` can
    re-merge later.  A daily job at 100 TB materializes ~16 KiB per
    (day) group; month/quarter/year rollups then cost a scan of KiB-sized
    sketches instead of the raw table.  ``lg_k=14`` matches the
    reference's 2^14 registers (processor.go:80 via axiomhq New()).

    Output: month-grain StatMsg rows computed by merging day sketches.
    """
    return month_union(day_sketches(events, lg_k))


def day_sketches(events: DataFrame, lg_k: int = 14) -> DataFrame:
    """(day, sk): one DataSketches HLL per day — THE shared day-sketch
    expression.  sketch_rollup, incremental_sketch_rollup, and the
    persisted sketch table all build days through this single function,
    so the bit-identity invariant between full and incremental rollups
    cannot drift via a one-sided edit (uid cast, lg_k, truncation)."""
    return (
        events.select(
            F.date_trunc("day", "ts").alias("day"),
            F.col("user_id").cast("string").alias("uid"),
        )
        .groupBy("day")
        .agg(F.hll_sketch_agg("uid", lg_k).alias("sk"))
    )


def month_union(daily: DataFrame) -> DataFrame:
    """Month-grain StatMsg rows by hll_union_agg over (day, sk) rows —
    the shared rollup tail of sketch_rollup / incremental_sketch_rollup."""
    return (
        daily.select(F.date_trunc("month", "day").cast("long").alias("timestamp"), "sk")
        .groupBy("timestamp")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("value"))
        .select(F.lit("month_count").alias("type"), "timestamp", "value")
    )


def stats_shape(events: DataFrame) -> DataFrame:
    """[CORE C8] Output-projection shape check: day-grain exact counts
    projected into the StatMsg envelope {type, timestamp, value}
    (processor.go:90-94), ordered for display determinism.
    """
    return cardinality(events, "day", exact=True).orderBy("timestamp")


def cardinality_error_bound(events: DataFrame, grain: str) -> DataFrame:
    """Self-assertion helper: per-window relative error of the approx
    estimate vs the exact count (SURVEY.md §5.2, mirroring README.md:4's
    "<1%" claim).  Returns windows with their relative error.
    """
    exact = cardinality(events, grain, exact=True).select(
        "timestamp", F.col("value").alias("exact")
    )
    approx = cardinality(events, grain, exact=False).select(
        "timestamp", F.col("value").alias("approx")
    )
    return exact.join(approx, "timestamp").select(
        "timestamp",
        "exact",
        "approx",
        (F.abs(F.col("approx") - F.col("exact")) / F.col("exact")).alias("rel_err"),
    )


def grain_fanout_rollup(events: DataFrame, lg_k: int = REFERENCE_LG_K) -> DataFrame:
    """All five grains from ONE fine-grained sketch pass — sketch algebra
    instead of row multiplication.

    ``grain_fanout`` explodes every event 5× before aggregating; at scale
    that is 5× the shuffle input for the approx case, where HLL sketches
    are unionable and every grain is an epoch-aligned union of minutes.
    This variant aggregates one DataSketches sketch per minute (the only
    pass over raw data), then derives day/week/month/year by
    ``hll_union_agg`` over the ~minutes-sized sketch table — the rollup
    cost is proportional to #minutes, not #events.  Same estimator, same
    lg_k, so minute estimates are identical to ``cardinality('minute',
    exact=False)`` and coarse grains estimate unions of the same
    sketches (accuracy pinned vs the exact fan-out in
    tests/test_accuracy.py).
    """
    minute = (
        events.select(
            F.date_trunc("minute", "ts").alias("m"),
            F.col("user_id").cast("string").alias("uid"),
        )
        .groupBy("m")
        .agg(F.hll_sketch_agg("uid", F.lit(lg_k)).alias("sk"))
    )
    # Branch 1 — minute estimates are a PROJECTION of the minute sketches:
    # no union aggregate at all.  Putting the minute grain through a
    # union (a grouping set of singleton groups) allocates a dense
    # 2^lg_k union gadget per minute — measured 56 s vs <1 s at 32×
    # sf0.1, the dominant cost of the whole rollup — to compute sketches
    # it already has.
    minute_est = minute.select(
        F.lit("minute_count").alias("type"),
        F.col("m").cast("long").alias("timestamp"),
        F.hll_sketch_estimate("sk").alias("value"),
    )
    # Branch 2 — the four coarse grains in ONE grouping-sets pass: one
    # Expand (4× the minutes-sized sketch frame) feeding one partial/
    # final union aggregate with only #days+#weeks+#months+#years
    # groups, so the union gadgets are allocated a handful of times.
    coarse = [g for g in GRAINS if g != "minute"]
    grain_cols = [f"{g}_ts" for g in coarse]
    keyed = minute.select(
        "sk",
        *[F.date_trunc(g, "m").cast("long").alias(f"{g}_ts") for g in coarse],
    )
    # grouping() resolves only inside the aggregate list, so the
    # which-grain label is computed there.
    type_col = F.coalesce(
        *[
            F.when(F.grouping(c) == 0, F.lit(f"{g}_count"))
            for g, c in zip(coarse, grain_cols)
        ]
    )
    rolled = keyed.groupingSets(
        [[c] for c in grain_cols], *[F.col(c) for c in grain_cols]
    ).agg(
        type_col.alias("type"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("value"),
    )
    # Both branches sit in ONE plan, so the minute aggregation's exchange
    # is deduplicated at runtime (AQE shuffle-stage reuse — measured: the
    # two-branch union costs ~the minute aggregation alone, not 2×) with
    # no persist; an explicit .persist() was measured STRICTLY worse here
    # (erratic materialization stalls on the sketch column).
    return minute_est.unionByName(
        rolled.select(
            "type",
            F.coalesce(*[F.col(c) for c in grain_cols]).alias("timestamp"),
            "value",
        )
    )


def incremental_sketch_rollup(
    events: DataFrame,
    stored_day_sketches: DataFrame,
    cutoff_day: "Column | str",
    lg_k: int = REFERENCE_LG_K,
) -> DataFrame:
    """Incremental maintenance of the sketch table: month totals from a
    PERSISTED day-sketch table plus only the raw events at/after
    ``cutoff_day`` — history is never rescanned.

    This is the daily production shape at 100 TB: yesterday's job left
    ~16 KiB of sketch per day; today's job sketches ONE day of raw
    events and unions it in.  HLL union is register-wise max —
    associative and commutative — so (stored ∪ fresh) is bit-identical
    to the full recompute over all raw data grouped the same way
    (pinned in tests/test_accuracy.py).

    ``stored_day_sketches`` must be (day timestamp, sk binary) rows with
    every day strictly before ``cutoff_day``; overlap would double-insert
    uids (harmless for distinct-count semantics — HLL insert is
    idempotent — but the invariant keeps lineage auditable).
    """
    fresh = day_sketches(
        events.filter(F.date_trunc("day", "ts") >= cutoff_day), lg_k
    )
    return month_union(stored_day_sketches.select("day", "sk").unionByName(fresh))


# Count-min sketch geometry: depth 4 (P[overestimate > eps] decays
# exponentially in depth), width 256 (eps ≈ 2.7% of stream length per
# row).  Hashes are md5-derived (functions.hash64) — deterministic and
# engine-reproducible, so unlike the HLL estimators this sketch IS
# oracle-checkable end to end.
CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_heavy_hitters(events: DataFrame, k: int = 10) -> DataFrame:
    """Count-min-sketch frequency table + heavy-hitter readout — the
    mergeable *frequency* sketch next to the cardinality (HLL) and
    membership (bitmap) sketch tables of E27.

    The reference has no frequency surface at all; its one sketch is
    HLL (/root/reference/processor/processor.go:80).  CMS is the same
    production shape: the (depth, bucket)→count table is depth·width
    rows regardless of stream size, additive under union (counts sum),
    so per-day sketch tables roll up losslessly like the HLL ones —
    and the estimate is a guaranteed OVERcount (min over depth rows),
    never an undercount.

    Scale shape: the build is one groupBy over (depth, bucket) — 1024
    groups, map-side combine collapses each partition to ≤1024 rows
    before the shuffle.  The readout joins candidates against the
    BROADCAST sketch once per depth; candidates here are the distinct
    items (the exact side rides along to exhibit the ≥ guarantee).

    Returns the top-``k`` items by CMS estimate with their exact
    counts: ``cms_est >= exact`` for every row, with equality for
    unaliased buckets.
    """
    items = events.select(F.col("user_id").cast("string").alias("item"))

    def _bucket(col: Column, d: int) -> Column:
        return F.pmod(hash64(col, salt=f"cms{d}"), F.lit(CMS_WIDTH))

    hits = items.select(
        F.posexplode(
            F.array(*[_bucket(F.col("item"), d) for d in range(CMS_DEPTH)])
        ).alias("d", "bucket")
    )
    sketch = hits.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    cand = items.groupBy("item").agg(F.count(F.lit(1)).alias("exact"))
    for d in range(CMS_DEPTH):
        sk_d = sketch.filter(F.col("d") == d).select(
            F.col("bucket").alias(f"b{d}"), F.col("cnt").alias(f"c{d}")
        )
        cand = cand.withColumn(f"b{d}", _bucket(F.col("item"), d)).join(
            F.broadcast(sk_d), f"b{d}"
        )
    est = F.least(*[F.col(f"c{d}") for d in range(CMS_DEPTH)])
    return (
        cand.select(
            F.col("item").cast("long").alias("user_id"),
            "exact",
            est.alias("cms_est"),
        )
        .orderBy(F.col("cms_est").desc(), F.col("user_id"))
        .limit(k)
    )


def cms_heavy_hitters_oracle_sql(k: int = 10) -> str:
    """DuckDB twin of cms_heavy_hitters, generated from the same
    (CMS_DEPTH, CMS_WIDTH) geometry and md5 hash."""
    from kafka_go_cardinality_spark.functions import hash64_sql

    def bucket(expr: str, d: int) -> str:
        return f"(({hash64_sql(expr, salt=f'cms{d}')}) % {CMS_WIDTH})"

    hit_rows = "\n      UNION ALL ".join(
        f"SELECT {d} AS d, {bucket('item', d)} AS bucket FROM items"
        for d in range(CMS_DEPTH)
    )
    est = ", ".join(
        f"(SELECT cnt FROM sketch s WHERE s.d = {d}"
        f" AND s.bucket = {bucket('cand.item', d)})"
        for d in range(CMS_DEPTH)
    )
    return f"""
    WITH items AS (SELECT CAST(user_id AS VARCHAR) AS item FROM events),
    hits AS (
      {hit_rows}
    ),
    sketch AS (SELECT d, bucket, count(*) AS cnt FROM hits GROUP BY 1, 2),
    cand AS (SELECT item, count(*) AS exact FROM items GROUP BY 1)
    SELECT CAST(cand.item AS BIGINT) AS user_id, exact,
           least({est}) AS cms_est
    FROM cand
    ORDER BY cms_est DESC, user_id
    LIMIT {k}
    """


def segment_overlap_exact(events: DataFrame) -> DataFrame:
    """Exact audience overlap between every pair of event-type segments:
    |A|, |B|, |A∩B|, |A∪B| and Jaccard — the ad-tech query a cardinality
    engine exists for (the reference counts ONE segment per window,
    processor.go:87; pairwise overlap is its natural extension).

    Scale shape: the fact table is scanned ONCE and never self-joined.
    One user-keyed shuffle builds each user's distinct type-set
    (collect_set combines map-side, so the exchange carries ≤T types
    per user); ordered pairs INCLUDING the diagonal explode from the
    sorted set as pure array expressions (≤ T(T+1)/2 rows per user, T =
    #event types), and one more tiny shuffle counts users per pair.
    Segment sizes are the diagonal pair counts, so the final
    enrichment is a broadcast join of a T²-row frame against itself —
    inclusion-exclusion gives the union and Jaccard for free.
    """
    # A segment member needs both a user and a type: NULL-keyed rows are
    # skipped (reference policy, kafkaio.go:77-81), and the oracle's m
    # CTE carries the same WHERE — without it, DISTINCT keeps a NULL
    # "user" in the sizes but the intersection join drops it.
    events = events.filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    types = F.array_sort(F.collect_set("event_type"))
    pair_rows = (
        events.groupBy("user_id")
        .agg(types.alias("ts"))
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ts"),
                        lambda x, i: F.transform(
                            F.slice(F.col("ts"), i + 1, F.size(F.col("ts"))),
                            lambda y: F.struct(
                                x.alias("type_a"), y.alias("type_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.type_a", "p.type_b")
    )
    counts = pair_rows.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    diag = counts.filter(F.col("type_a") == F.col("type_b"))
    sa = diag.select(F.col("type_a"), F.col("n_users").alias("n_a"))
    sb = diag.select(
        F.col("type_b"), F.col("n_users").alias("n_b")
    )
    return (
        counts.filter(F.col("type_a") < F.col("type_b"))
        .withColumnRenamed("n_users", "n_common")
        .join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_common",
            (F.col("n_a") + F.col("n_b") - F.col("n_common")).alias("n_union"),
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


SEGMENT_OVERLAP_ORACLE_SQL = """
    WITH m AS (SELECT DISTINCT event_type, user_id FROM events
               WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    sizes AS (SELECT event_type, count(*) AS n FROM m GROUP BY 1),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_common
      FROM m a JOIN m b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_common,
           sa.n + sb.n - n_common AS n_union,
           round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.event_type = type_a
    JOIN sizes sb ON sb.event_type = type_b
"""


def segment_overlap_sketch(events: DataFrame, lg_k: int = REFERENCE_LG_K) -> DataFrame:
    """Sketch twin of :func:`segment_overlap_exact` via HLL
    inclusion-exclusion: ONE pass builds a T-row sketch table (T =
    #event types), then every pairwise union is ``hll_union_agg`` over
    two sketch VALUES and the intersection falls out as
    |A| + |B| - |A∪B|.

    This is the 100 TB plan: the fact table is scanned exactly once and
    never self-joined — the exact version's (user-keyed distinct +
    self-join) shuffles disappear entirely, replaced by a T-row × T-row
    pairing of kilobyte sketches.  At lg_k=14 the per-segment rsd is
    ~0.81%; the intersection inherits the absolute errors of the three
    terms, so tiny overlaps of huge segments are where exact (or
    bitmap) beats sketches — the accuracy test pins the achieved error.
    """
    # Same NULL-keyed-row skip as the exact twin (and its shared oracle).
    events = events.filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    sk = (
        events.groupBy("event_type")
        .agg(
            F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(lg_k)).alias(
                "sk"
            )
        )
    )
    a = sk.select(F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a"))
    b = sk.select(F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b"))
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("type_a") < F.col("type_b"))
    # Per-pair union: explode the two sketches back to rows and
    # hll_union_agg them grouped by the pair key — stays in the
    # DataSketches merge path (lossless register-wise max).
    unions = (
        pairs.select(
            "type_a", "type_b", F.explode(F.array("sk_a", "sk_b")).alias("sk")
        )
        .groupBy("type_a", "type_b")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_union"))
    )
    est = sk.select(
        "event_type", F.hll_sketch_estimate("sk").alias("est_n")
    )
    ea = est.select(F.col("event_type").alias("type_a"), F.col("est_n").alias("est_a"))
    eb = est.select(F.col("event_type").alias("type_b"), F.col("est_n").alias("est_b"))
    return (
        unions.join(F.broadcast(ea), "type_a")
        .join(F.broadcast(eb), "type_b")
        .select(
            "type_a",
            "type_b",
            "est_a",
            "est_b",
            "est_union",
            F.greatest(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0)
            ).alias("est_common"),
        )
    )


# PCSA (Flajolet-Martin probabilistic counting with stochastic averaging)
# geometry: 64 buckets, md5-derived hashes (functions.hash64), so unlike
# the DataSketches HLL path this estimator is BIT-DETERMINISTIC and
# oracle-checkable end to end — the "PCSA" branch of the estimator
# design space surveyed in "Better Cardinality Estimators for
# HyperLogLog, PCSA, and Beyond" (PODS 2023).  Standard FM correction
# constant φ ≈ 0.77351.
PCSA_BUCKETS = 64
PCSA_PHI = 0.77351


def pcsa_cardinality(events: DataFrame, grain: str = "day") -> DataFrame:
    """Per-window PCSA cardinality estimate with an engine-exact sketch.

    Each uid hashes once: ``bucket = h mod m``, ``rank = trailing zeros
    of (h div m)``; a window's sketch is m OR-merged bitmaps.  The
    readout is stochastic averaging: R_j = lowest unset bit of bucket
    j's bitmap, estimate = m/φ·2^(ΣR/m).

    Everything through ΣR is integer arithmetic on BIGINTs (the lowest-
    unset-bit extraction is the two's-complement identity
    ``bit_count(((x+1) & -(x+1)) - 1)``), so the sketch and ΣR match
    the DuckDB oracle exactly; only the final 2^(ΣR/m) touches floats,
    rounded to whole users.

    Scale shape: identical to the HLL path — ONE shuffle keyed by
    (window, bucket) carrying 8-byte bitmaps (map-side bit_or combine),
    total state m×8 bytes per window.  OR-merge makes the sketch table
    losslessly re-aggregable across windows/segments exactly like the
    bitmap and HLL tables of E27.
    """
    if grain not in GRAINS:
        raise ValueError(f"grain {grain!r} not in {GRAINS}")
    h = hash64(F.col("user_id").cast("string"), salt="pcsa")
    per_bucket = (
        events.select(
            _window_start(F.col("ts"), grain).alias("timestamp"),
            h.alias("h"),
        )
        .select(
            "timestamp",
            F.pmod(F.col("h"), F.lit(PCSA_BUCKETS)).alias("bucket"),
            F.expr(f"h div {PCSA_BUCKETS}").alias("hd"),
        )
        .select(
            "timestamp",
            "bucket",
            # rank = trailing zeros of hd (rank 0 if hd = 0, a 2^-54
            # event made explicit rather than left to shift-mod-64
            # wraparound); bit (rank) of the bucket's bitmap via the
            # lowest-set-bit identity: rank = bit_count(lsb - 1).
            F.when(F.col("hd") == 0, F.lit(0))
            .otherwise(
                F.bit_count(
                    (F.col("hd").bitwiseAND(-F.col("hd"))) - F.lit(1)
                )
            )
            .alias("rank"),
        )
        .select(
            "timestamp",
            "bucket",
            F.expr("shiftleft(CAST(1 AS BIGINT), rank)").alias("bit"),
        )
    )
    sketch = per_bucket.groupBy("timestamp", "bucket").agg(
        F.bit_or("bit").alias("bm")
    )
    # R = lowest unset bit index of bm = bit_count(((bm+1) & -(bm+1)) - 1)
    r = F.bit_count(
        ((F.col("bm") + F.lit(1)).bitwiseAND(-(F.col("bm") + F.lit(1))))
        - F.lit(1)
    )
    per_window = sketch.groupBy("timestamp").agg(
        F.sum(r).alias("sum_r"),
        F.count(F.lit(1)).alias("n_buckets_hit"),
    )
    # Small-range-corrected FM readout (Scheuermann & Mauve 2007):
    # E = m/φ·(2^A − 2^(−1.75A)), A = ΣR/m — removes the ~20%
    # overestimate PCSA shows for n/m ≲ 30 without hurting large n.
    a = F.col("sum_r") / F.lit(PCSA_BUCKETS)
    est = F.round(
        F.lit(PCSA_BUCKETS)
        / F.lit(PCSA_PHI)
        * (F.pow(F.lit(2.0), a) - F.pow(F.lit(2.0), F.lit(-1.75) * a))
    ).cast("long")
    return per_window.select(
        F.lit(f"{grain}_count").alias("type"),
        "timestamp",
        "sum_r",
        "n_buckets_hit",
        est.alias("est_users"),
    )


def pcsa_oracle_sql(grain: str = "day") -> str:
    from kafka_go_cardinality_spark.functions import hash64_sql

    h = hash64_sql("CAST(user_id AS VARCHAR)", salt="pcsa")
    m = PCSA_BUCKETS
    return f"""
    WITH hashed AS (
      SELECT CAST(epoch(date_trunc('{grain}', ts)) AS BIGINT) AS timestamp,
             {h} AS h
      FROM events),
    bits AS (
      SELECT timestamp, h % {m} AS bucket,
             CASE WHEN (h // {m}) = 0 THEN 0
                  ELSE (h // {m}) & -(h // {m}) END AS lsb
      FROM hashed),
    ranked AS (
      SELECT timestamp, bucket,
             CASE WHEN lsb = 0 THEN CAST(1 AS BIGINT)
                  ELSE CAST(power(2, bit_count(lsb - 1)) AS BIGINT) END AS bit
      FROM bits),
    sk AS (
      SELECT timestamp, bucket, bit_or(bit) AS bm
      FROM ranked GROUP BY 1, 2),
    rr AS (
      SELECT timestamp,
             bit_count(((bm + 1) & -(bm + 1)) - 1) AS r
      FROM sk)
    SELECT '{grain}_count' AS type, timestamp,
           CAST(sum(r) AS BIGINT) AS sum_r,
           count(*) AS n_buckets_hit,
           CAST(round({m} / {PCSA_PHI} *
                (power(2, sum(r) / {m}.0)
                 - power(2, -1.75 * sum(r) / {m}.0))) AS BIGINT)
             AS est_users
    FROM rr GROUP BY timestamp
    """


# Mergeable quantile-histogram geometry: FIXED, data-independent bucket
# boundaries (domain [0, 500), 250 buckets of width 2.0) — the property
# that makes per-shard/per-day tables additive under plain count-sum,
# like the HLL (max), bitmap (OR) and CMS (sum) tables of E27.  A
# t-digest/KLL would adapt boundaries to data and give tighter tails,
# but its merge is estimator-specific and engine-private; the fixed
# histogram trades ≤ bucket-width error for bit-exact mergeability.
QHIST_LO = 0.0
QHIST_HI = 500.0
QHIST_BUCKETS = 250
QHIST_QS = (0.5, 0.9, 0.99)


def quantile_hist_rollup(events: DataFrame) -> DataFrame:
    """Month-grain quantile estimates of ``value`` read from MERGED
    day-grain histogram tables — the fourth mergeable sketch table:
    build (day, bucket, cnt) once, answer any coarser window's
    quantiles by summing counts, never rescanning raw data.

    Readout per (month, q): rank = ceil(q·total); the estimate
    interpolates linearly inside the first bucket whose cumulative
    count reaches the rank.  Every step is deterministic integer math
    plus one final division, so the result hash-matches the oracle —
    with error bounded by the 2.0 bucket width by construction.

    Scale shape: one shuffle to the (day, bucket)-keyed table (map-side
    combined, ≤ days×250 rows), a second tiny aggregation to month
    grain, and a per-month cumulative window over ≤250 rows — constant
    per window at ANY data scale.
    """
    w = (QHIST_HI - QHIST_LO) / QHIST_BUCKETS
    # NULL / NaN measurements are excluded by contract on BOTH engines:
    # neither has a bucket (Spark width_bucket yields NULL, DuckDB's NaN
    # compares greater-than-everything into the overflow bucket), so one
    # poisoned row silently shifts every rank readout in its month.
    events = events.filter(F.col("value").isNotNull() & ~F.isnan(F.col("value")))
    day_table = (
        events.select(
            _window_start(F.col("ts"), "day").alias("day"),
            F.width_bucket(
                "value", F.lit(QHIST_LO), F.lit(QHIST_HI), F.lit(QHIST_BUCKETS)
            ).alias("bucket"),
        )
        .groupBy("day", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    month = (
        day_table.withColumn(
            "month",
            F.unix_timestamp(
                F.date_trunc("month", F.timestamp_seconds("day"))
            ),
        )
        .groupBy("month", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    win = Window.partitionBy("month").orderBy("bucket")
    cum = month.select(
        "month",
        "bucket",
        "cnt",
        F.sum("cnt").over(win).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("month")).alias("total"),
    )
    qs = F.explode(F.array(*[F.lit(q) for q in QHIST_QS])).alias("q")
    ranked = cum.select("*", qs).withColumn(
        "rank", F.ceil(F.col("q") * F.col("total"))
    )
    hit = ranked.filter(
        (F.col("cum") >= F.col("rank"))
        & (F.col("cum") - F.col("cnt") < F.col("rank"))
    )
    est = (
        F.lit(QHIST_LO)
        + (F.col("bucket") - 1) * F.lit(w)
        + F.lit(w)
        * (F.col("rank") - (F.col("cum") - F.col("cnt")))
        / F.col("cnt")
    )
    return hit.select(
        "month",
        "q",
        F.round(est, 6).alias("est_value"),
        F.col("total").alias("n_rows"),
    )


def quantile_hist_oracle_sql() -> str:
    w = (QHIST_HI - QHIST_LO) / QHIST_BUCKETS
    qs_rows = " UNION ALL ".join(f"SELECT {q} AS q" for q in QHIST_QS)
    return f"""
    WITH day_table AS (
      SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day,
             CAST(CASE WHEN value < {QHIST_LO} THEN 0
                       WHEN value >= {QHIST_HI} THEN {QHIST_BUCKETS} + 1
                       ELSE floor((value - {QHIST_LO}) / {w}) + 1 END
                  AS BIGINT) AS bucket,
             count(*) AS cnt
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(value)
      GROUP BY 1, 2),
    month AS (
      SELECT CAST(epoch(date_trunc('month', to_timestamp(day))) AS BIGINT)
               AS month,
             bucket, CAST(sum(cnt) AS BIGINT) AS cnt
      FROM day_table GROUP BY 1, 2),
    cum AS (
      SELECT month, bucket, cnt,
             CAST(sum(cnt) OVER (PARTITION BY month ORDER BY bucket)
                  AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY month) AS BIGINT) AS total
      FROM month),
    ranked AS (
      SELECT cum.*, qq.q, CAST(ceil(qq.q * total) AS BIGINT) AS rank
      FROM cum CROSS JOIN ({qs_rows}) qq)
    SELECT month, q,
           round({QHIST_LO} + (bucket - 1) * {w}
                 + {w} * (rank - (cum - cnt)) / cnt, 6) AS est_value,
           total AS n_rows
    FROM ranked
    WHERE cum >= rank AND cum - cnt < rank
    """


# Bloom-filter geometry: 1008 bits as 16 OR-merged BIGINT words of 63
# usable bits each (bit 63 stays clear — DuckDB's checked shift refuses
# the sign bit, and portability beats the 1.6% capacity), k=4
# md5-derived hashes — the approximate-membership sketch table next to
# the exact bitmap one (bitmap_exact_cardinality).  ~1% false-positive
# rate at ~100 members/window (p ≈ (1 - e^(-kn/m))^k); never a false
# negative.  Deterministic hashes make every bit oracle-checkable.
BLOOM_WORD_BITS = 63
BLOOM_WORDS = 16
BLOOM_BITS = BLOOM_WORDS * BLOOM_WORD_BITS
BLOOM_K = 4


def _bloom_word_bits(df: DataFrame, id_col: str):
    """Explode each id into its k Bloom (word, bit) contributions.

    The k positions are FOUR 32-bit windows of ONE md5, not k salted
    md5s: one digest per id instead of four (the round-5 bench flagged
    the 4× md5+conv chain as this operator's hot spot), with identical
    independence properties — md5's 128 bits are uniformly mixed, so
    disjoint 32-bit slices are as decorrelated as separately-salted
    digests.  Shift amounts must be literal-int-free column math, so
    the bit is shiftleft via SQL expr (pyspark's shiftleft takes a
    Python int)."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("#bloom")))
    pos_structs = [
        F.pmod(
            F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long"),
            F.lit(BLOOM_BITS),
        ).alias(f"p{i}")
        for i in range(BLOOM_K)
    ]
    wide = df.select("*", *pos_structs)
    exploded = wide.select(
        *df.columns,
        F.explode(
            F.array(*[F.col(f"p{i}") for i in range(BLOOM_K)])
        ).alias("pos"),
    )
    return exploded.select(
        *df.columns,
        F.expr("pos div 63").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))").alias(
            "bit"
        ),
    )


def bloom_membership(events: DataFrame, probe_ids: list[int]) -> DataFrame:
    """Month-grain approximate membership from MERGED day-grain Bloom
    tables: build (day, word, bits) once — 16 longs per day regardless
    of traffic — OR-merge to month, then probe a candidate list.

    The fifth mergeable sketch table of E27 (HLL/PCSA cardinality, CMS
    frequency, bitmap exact-membership, histogram quantiles): Bloom
    answers "was this user active this month?" from 128 bytes per
    window with zero false negatives and ~1% false positives at ~100
    members (p ≈ (1−e^(−kn/m))^k), without rescanning raw events —
    the retention/reactivation probe at 100 TB.

    Scale shape: one (day, word)-keyed shuffle of OR-combined words
    (map-side bit_or), a tiny month merge, and a BROADCAST probe join
    per word — the sketch table never exceeds months×16 rows.
    """
    spark = events.sparkSession
    days = events.select(
        _window_start(F.col("ts"), "day").alias("day"),
        F.col("user_id").alias("uid"),
    )
    contrib = _bloom_word_bits(days, "uid").select("day", "word", "bit")
    day_table = contrib.groupBy("day", "word").agg(F.bit_or("bit").alias("bm"))
    month = (
        day_table.withColumn(
            "month",
            F.unix_timestamp(F.date_trunc("month", F.timestamp_seconds("day"))),
        )
        .groupBy("month", "word")
        .agg(F.bit_or("bm").alias("bm"))
    )
    probes = spark.createDataFrame(
        [(int(p),) for p in probe_ids], "probe_id long"
    )
    probe_bits = _bloom_word_bits(probes, "probe_id").select(
        "probe_id", "word", "bit"
    )
    hits = (
        month.join(F.broadcast(probe_bits), "word")
        .select(
            "month",
            "probe_id",
            (F.col("bm").bitwiseAND(F.col("bit")) != 0).cast("int").alias("hit"),
        )
        .groupBy("month", "probe_id")
        .agg(F.sum("hit").alias("n_hits"))
    )
    return hits.select(
        "month",
        "probe_id",
        (F.col("n_hits") == BLOOM_K).cast("int").alias("maybe_member"),
    )


def bloom_membership_oracle_sql(probe_ids: list[int]) -> str:
    def wordbit(expr, i):
        # Mirror of _bloom_word_bits: 32-bit window i of one salted md5.
        h = (
            f"CAST(('0x' || substring(md5(({expr}) || '#bloom'), "
            f"{1 + 8 * i}, 8)) AS BIGINT)"
        )
        return (
            f"(({h}) % {BLOOM_BITS}) // {BLOOM_WORD_BITS} AS word, "
            f"(CAST(1 AS BIGINT) << ((({h}) % {BLOOM_BITS}) % {BLOOM_WORD_BITS}))"
            f" AS bit"
        )

    contrib = "\n      UNION ALL ".join(
        f"SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day, "
        f"{wordbit('CAST(user_id AS VARCHAR)', i)} FROM events"
        for i in range(BLOOM_K)
    )
    probes = ", ".join(str(int(p)) for p in probe_ids)
    probe_bits = "\n      UNION ALL ".join(
        f"SELECT probe_id, {wordbit('CAST(probe_id AS VARCHAR)', i)} FROM probes"
        for i in range(BLOOM_K)
    )
    return f"""
    WITH contrib AS (
      {contrib}
    ),
    day_table AS (
      SELECT day, word, bit_or(bit) AS bm FROM contrib GROUP BY 1, 2),
    month AS (
      SELECT CAST(epoch(date_trunc('month', to_timestamp(day))) AS BIGINT)
               AS month,
             word, bit_or(bm) AS bm
      FROM day_table GROUP BY 1, 2),
    probes AS (SELECT unnest([{probes}]) AS probe_id),
    probe_bits AS (
      {probe_bits}
    ),
    hits AS (
      SELECT month, probe_id,
             CASE WHEN (bm & bit) <> 0 THEN 1 ELSE 0 END AS hit
      FROM month JOIN probe_bits USING (word))
    SELECT month, probe_id,
           CASE WHEN sum(hit) = {BLOOM_K} THEN 1 ELSE 0 END AS maybe_member
    FROM hits GROUP BY 1, 2
    """


# --- DataSketches Theta sketches (Spark 4.1+) -------------------------------
#
# Theta sketches close the algebra gap HLL leaves open: HLL union is
# lossless but intersection/difference only exist via inclusion-exclusion
# (segment_overlap_sketch), whose error compounds with each term.  A Theta
# sketch is a uniform hash SAMPLE of the distinct keys (retain the k
# smallest hashes; theta = the retention threshold), so A∩B and A\B are
# first-class sketch operations with bounded error — and below k distinct
# keys the sketch retains EVERY hash (theta = 1, "exact mode"), making the
# estimate the exact distinct count.  The fixture's per-day cardinality
# (≤1,356 users at sf0.1) sits far below the default 2^12 nominal entries,
# so every value below is engine-exact and fully oracle-checkable — the
# same queries run unchanged at 100 TB, trading exactness for the
# documented ~1/sqrt(k) relative error once days exceed 4,096 distinct
# users.  (The reference's axiomhq HLL — processor.go:80 — has no
# intersection at all.)
THETA_LG_K = 12


def theta_day_retention(events: DataFrame) -> DataFrame:
    """Day-over-day retention/churn from per-day Theta sketches: one fact
    scan builds a T-row (day, sketch) table, then every adjacent-day pair
    answers |active|, |retained| = |D ∩ D₋₁| and |new| = |D \\ D₋₁| from
    two kilobyte sketch values via ``theta_intersection`` /
    ``theta_difference`` — the fact table is never self-joined.

    The previous-day sketch arrives by a *calendar* self-join
    (``prev.day = day - 1 day``) on the tiny sketch table, broadcast, so
    a missing day yields NULL retention rather than silently comparing
    against the last day that happened to have data (a ``lag`` window
    would do the latter, and would also serialize the table through one
    task).  At 100 TB the sketch table is ~365 rows/year — the join cost
    is nil; the win is that the raw-uid shuffle of the exact twin
    (distinct (day, uid) self-joined on uid) disappears entirely.
    """
    # NULL user/ts rows are skipped on BOTH engines: theta_sketch_agg
    # already ignores NULL items, but the oracle's DISTINCT would count
    # a NULL "user" — the shared WHERE keeps active-user semantics
    # identical (a NULL is not a user; a row without a time has no day).
    day = (
        events.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            F.date_trunc("day", "ts").alias("day"),
            F.col("user_id").cast("string").alias("uid"),
        )
        .groupBy("day")
        .agg(F.theta_sketch_agg("uid", F.lit(THETA_LG_K)).alias("sk"))
    )
    prev = day.select(
        (F.col("day") + F.expr("INTERVAL 1 DAY")).alias("day"),
        F.col("sk").alias("prev_sk"),
    )
    return (
        day.join(F.broadcast(prev), "day", "left")
        .select(
            F.col("day").cast("long").alias("timestamp"),
            F.theta_sketch_estimate("sk").alias("est_n"),
            F.theta_sketch_estimate(
                F.theta_intersection("prev_sk", "sk")
            ).alias("est_ret"),
            F.theta_sketch_estimate(
                F.theta_difference("sk", "prev_sk")
            ).alias("est_new"),
        )
    )


THETA_RETENTION_ORACLE_SQL = """
    WITH m AS (
      SELECT DISTINCT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day,
             user_id
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    days AS (SELECT day, count(*) AS n FROM m GROUP BY 1),
    ret AS (
      SELECT b.day AS day, count(*) AS n_ret
      FROM m a JOIN m b ON a.user_id = b.user_id AND b.day = a.day + 86400
      GROUP BY 1)
    SELECT d.day AS timestamp, d.n AS est_n,
           CASE WHEN p.day IS NULL THEN NULL
                ELSE coalesce(r.n_ret, 0) END AS est_ret,
           CASE WHEN p.day IS NULL THEN NULL
                ELSE d.n - coalesce(r.n_ret, 0) END AS est_new
    FROM days d
    LEFT JOIN days p ON p.day = d.day - 86400
    LEFT JOIN ret r ON r.day = d.day
"""


def segment_overlap_theta(events: DataFrame) -> DataFrame:
    """Theta twin of :func:`segment_overlap_exact`: per-segment Theta
    sketches, every pairwise intersection/union taken DIRECTLY on two
    sketch values (``theta_intersection`` / ``theta_union``) instead of
    the HLL twin's inclusion-exclusion — one intersection error bound
    instead of three compounding union terms, and in exact mode (all
    fixture segments < 2^12 distinct users) no error at all, so the whole
    frame including Jaccard hash-matches the exact oracle.

    Same 100 TB shape as the HLL twin: ONE fact scan → T-row sketch
    table → T×T broadcast pairing of kilobyte values; the exact
    version's user-keyed shuffles never happen.
    """
    # Same NULL-keyed-row skip as the exact twin (and its shared oracle).
    sk = events.filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    ).groupBy("event_type").agg(
        F.theta_sketch_agg(F.col("user_id").cast("string"), F.lit(THETA_LG_K)).alias(
            "sk"
        )
    )
    a = sk.select(F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a"))
    b = sk.select(F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b"))
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            F.theta_sketch_estimate("sk_a").alias("n_a"),
            F.theta_sketch_estimate("sk_b").alias("n_b"),
            F.theta_sketch_estimate(
                F.theta_intersection("sk_a", "sk_b")
            ).alias("n_common"),
            F.theta_sketch_estimate(F.theta_union("sk_a", "sk_b")).alias(
                "n_union"
            ),
        )
        .withColumn(
            "jaccard", F.round(F.col("n_common") / F.col("n_union"), 6)
        )
    )


# --- DataSketches KLL quantile sketches (Spark 4.1+) ------------------------
#
# The mergeable-quantile story quantile_hist_rollup tells with fixed
# histogram buckets, retold with the proper sketch: KLL keeps a weighted
# sample with a PROVEN worst-case rank error (~1.33%/(k/200)^0.93 at
# default k=200) under arbitrary merges, where the fixed histogram's error
# is bounded by bucket width and its buckets must be chosen up front.
# Below k retained items a KLL sketch stores every value (exact mode), and
# DataSketches' INCLUSIVE quantile rule — smallest item whose rank ≥ ⌈qn⌉
# — coincides with SQL's discrete percentile, so at fixture scale the
# readout is engine-exact end to end (verified: merged month of 10,000
# values matches DuckDB quantile_disc to the last bit at k=16,384).
KLL_K = 16384


def kll_quantile_rollup(events: DataFrame) -> DataFrame:
    """Mergeable quantile table: one KLL sketch of ``value`` per day,
    day sketches merged into months, p50/p90/p99 read from the merged
    sketch — the daily-production shape where history is kept as
    kilobyte sketches and any coarser window's quantiles cost a scan of
    sketches, never of raw rows.

    ``kll_sketch_merge_double`` is a binary op, so the month merge is a
    higher-order ``aggregate`` fold over the collected day sketches —
    pure JVM expressions, no UDF; a month folds ≤31 sketches.  At 100 TB
    keep k at the accuracy the product needs (k=200 → ~1.3% rank error,
    ~2 KiB) rather than this fixture-exact k=16,384.
    """
    # NULL / NaN measurements are dropped BEFORE sketching (both
    # engines): a day whose values are all NULL would produce a NULL
    # sketch, and kll_sketch_merge/get_quantile on a NULL buffer aborts
    # the job (KLL_INVALID_INPUT_SKETCH_BUFFER); a NaN is silently
    # IGNORED by the DataSketches update but RANKED greater-than-
    # everything by SQL quantile_disc, so one poisoned row shifts every
    # rank readout in its month — n_rows therefore counts finite
    # measured rows, matching the oracle's WHERE clause (same contract
    # as quantile_hist_rollup).
    day = (
        events.filter(F.col("value").isNotNull() & ~F.isnan(F.col("value")))
        .select(F.date_trunc("day", "ts").alias("day"), "value")
        .groupBy("day")
        .agg(
            F.kll_sketch_agg_double("value", F.lit(KLL_K)).alias("ks"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        day.groupBy(F.date_trunc("month", "day").cast("long").alias("timestamp"))
        .agg(F.collect_list("ks").alias("kss"), F.sum("n").alias("n_rows"))
        .withColumn(
            "ks",
            F.expr(
                "aggregate(slice(kss, 2, size(kss)-1), kss[0],"
                " (acc, x) -> kll_sketch_merge_double(acc, x))"
            ),
        )
        .select(
            "timestamp",
            "n_rows",
            F.kll_sketch_get_quantile_double("ks", F.lit(0.5)).alias("p50"),
            F.kll_sketch_get_quantile_double("ks", F.lit(0.9)).alias("p90"),
            F.kll_sketch_get_quantile_double("ks", F.lit(0.99)).alias("p99"),
        )
    )


KLL_QUANTILE_ORACLE_SQL = """
    SELECT CAST(epoch(date_trunc('month', ts)) AS BIGINT) AS timestamp,
           count(*) AS n_rows,
           quantile_disc(value, 0.5) AS p50,
           quantile_disc(value, 0.9) AS p90,
           quantile_disc(value, 0.99) AS p99
    FROM events
    WHERE value IS NOT NULL AND NOT isnan(value)
    GROUP BY 1
"""
