"""[EXT] Relational operators (SURVEY.md §2.3 E1-E16).

The reference has no relational surface at all — its only dataflow is the
linear Kafka→HLL→Kafka pipeline wired at ``/root/reference/main.go:24-26``
— so everything here is the mandated extension, expressed with built-in
DataFrame operators so Catalyst plans them (broadcast vs shuffle join
selection, predicate pushdown, partial aggregation, AQE skew handling).

Only operators with real decision content live here; one-expression
queries are declared inline in ``queries_relational.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def topk(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """Top-k with a total order.  Spark plans this as
    ``TakeOrderedAndProject`` — each partition keeps a k-row heap and only
    k rows per partition reach the driver; no global sort materializes.
    The caller must make `order` a TOTAL order (include a unique key) or
    the result set is non-deterministic under ties.
    """
    return df.orderBy(*order).limit(k)


def grouped_topk(
    df: DataFrame, partition_cols: list[str], order: list[Column], k: int
) -> DataFrame:
    """Top-k per group via ``row_number`` over a window — one shuffle on
    the partition keys; at scale prefer this over self-joins with min/max.
    `order` must be total within a partition for determinism.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
) -> DataFrame:
    """As-of join (E8): for each left row, attach the most recent right row
    with ``right.ts <= left.ts`` and the same key.

    Spark has no ASOF JOIN operator; the naive formulation is a non-equi
    range join (O(n·m) within key).  This implementation uses the
    union+window technique, which scales: tag both sides, union, and run
    ``last_value(..., ignoreNulls)`` over a window partitioned by key and
    ordered by (ts, side) — ONE shuffle on the key, no cross product, no
    skew amplification.  This is the 100 TB-safe as-of plan.
    """
    lcols = left.columns
    tagged_left = left.select(
        *lcols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_value_cols],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
    )
    tagged_right = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
        F.col(on),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
    ).select(*lcols, *[f"__r_{c}" for c in right_value_cols], "__ts", "__side")
    unioned = tagged_left.unionByName(tagged_right)
    # right rows sort before left rows at equal ts (side 0 < 1), so an
    # exactly-equal timestamp is visible to the left row — ASOF >= semantics.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned
    for c in right_value_cols:
        out = out.withColumn(
            f"__r_{c}", F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
        )
    return (
        out.filter(F.col("__side") == 1)
        .drop("__ts", "__side")
        .withColumnsRenamed({f"__r_{c}": c for c in right_value_cols})
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    order_tiebreak: str,
    gap_seconds: int,
) -> DataFrame:
    """Gap-based batch sessionization: consecutive events of one key whose
    gaps are ≤ ``gap_seconds`` form a session.  The batch twin of the
    streaming ``session_window`` (queries_streaming.q_stream_session) —
    this is how you sessionize the *historical* 100 TB store, where a
    stateful stream replay would be absurd.

    Plan shape: ONE shuffle on the key (both window passes and the final
    aggregation share the ``partitionBy(key)`` exchange), then per-group
    sort — lag → flag → running-sum session id → groupBy.  No self-join,
    no cross product; skew bounded by max events per key.

    Gap comparison is integer microseconds (``unix_micros``) so the DuckDB
    oracle (``epoch_us``) computes bit-identical flags.  ``order_tiebreak``
    must make the per-key ordering total or session numbering is
    non-deterministic under equal timestamps.
    """
    # A session needs an owner and an instant: NULL key/ts rows are
    # skipped on BOTH engines (oracle carries the same WHERE).  Unfiltered,
    # a NULL ts sorts FIRST here but LAST in SQL, splitting sessions
    # differently — and a NaT "session" means nothing downstream.
    df = df.filter(F.col(key).isNotNull() & F.col(ts).isNotNull())
    w = Window.partitionBy(key).orderBy(ts, order_tiebreak)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_us = F.lag(F.unix_micros(F.col(ts))).over(w)
    new_sess = F.when(
        prev_us.isNull()
        | (F.unix_micros(F.col(ts)) - prev_us > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    return (
        df.withColumn("__new", new_sess)
        .withColumn("session_id", F.sum("__new").over(run).cast("long"))
        .groupBy(key, "session_id")
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
) -> DataFrame:
    """Bounded range join (E8): pairs (l, r) with the same key and
    ``l.ts <= r.ts < l.ts + gap``.

    A raw non-equi join degenerates to BroadcastNestedLoopJoin.  Bucketing
    both sides by ``floor(ts / gap)`` and equi-joining on
    (key, bucket) ∪ (key, bucket+1) turns it into two hash joins whose
    false positives are filtered after — the standard interval-join
    decomposition (what Flink's interval join does internally).
    """
    lb = left.withColumn(
        "__b", (F.unix_timestamp(F.col(left_ts)) / max_gap_seconds).cast("long")
    )
    rb = right.withColumnRenamed(on, "__r_key").withColumn(
        "__rb", (F.unix_timestamp(F.col(right_ts)) / max_gap_seconds).cast("long")
    )
    candidates = lb.withColumn(
        "__probe", F.explode(F.array(F.col("__b"), F.col("__b") + 1))
    ).join(
        rb,
        (F.col("__probe") == F.col("__rb")) & (F.col(on) == F.col("__r_key")),
    )
    return candidates.filter(
        (F.col(right_ts) >= F.col(left_ts))
        & (
            F.col(right_ts)
            < F.col(left_ts) + F.expr(f"INTERVAL {max_gap_seconds} SECONDS")
        )
    ).drop("__b", "__rb", "__probe", "__r_key")


def latest_per_key(
    df: DataFrame, key: str, ts: str, tiebreak: str
) -> DataFrame:
    """CDC-style compaction: keep exactly the newest record per key.

    The 100 TB shape of "apply a change stream to a snapshot": one
    ``row_number`` over (key, ts desc) — a single hash shuffle on the key,
    partial-sorted within partitions, no self-join and no global sort.
    ``tiebreak`` must make the order total (same-timestamp updates would
    otherwise be picked nondeterministically).  AQE's skew-join handling
    doesn't apply to window shuffles, so a genuinely hot key (one entity
    receiving a measurable fraction of all updates) wants the two-level
    variant: keep max-ts per (key, salt) first, then re-reduce the ≤S
    survivors per key.  (Reference has no storage/compaction at all:
    /root/reference/README.md:5.)
    """
    w = Window.partitionBy(key).orderBy(F.col(ts).desc(), F.col(tiebreak).desc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    ).drop("__rn")


def funnel(
    events: DataFrame, key: str, ts: str, type_col: str, stages: list[str]
) -> DataFrame:
    """Strict ordered-funnel conversion: a key reaches stage i at the
    FIRST ``stages[i]`` event strictly after its stage i-1 time.

    All stage times are chained analytic minimums over the same
    ``partitionBy(key)`` window, so the whole funnel costs ONE hash
    shuffle on the key no matter how many stages — Spark reuses the
    child's partitioning for every subsequent Window operator instead of
    re-exchanging.  The alternative (one aggregate + join per stage)
    pays a shuffle per stage and a join per stage.
    Returns one row per funnel stage: (stage_idx, stage, n_converted).
    """
    w = Window.partitionBy(key)
    cur = events.select(key, ts, type_col)
    prev_t = None
    stage_cols = []
    for i, stage in enumerate(stages):
        col = f"__t{i}"
        cond = F.col(type_col) == stage
        if prev_t is not None:
            cond = cond & (F.col(ts) > F.col(prev_t))
        cur = cur.withColumn(col, F.min(F.when(cond, F.col(ts))).over(w))
        stage_cols.append(col)
        prev_t = col
    per_key = cur.groupBy(key).agg(
        *[F.min(c).alias(c) for c in stage_cols]
    )
    counts = per_key.select(
        *[
            F.count(F.col(c)).cast("long").alias(f"n{i}")
            for i, c in enumerate(stage_cols)
        ]
    )
    rows = [
        F.struct(
            F.lit(i).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            F.col(f"n{i}").alias("n_converted"),
        )
        for i, stage in enumerate(stages)
    ]
    return counts.select(F.explode(F.array(*rows)).alias("s")).select("s.*")


def cohort_retention(
    events: DataFrame, key: str, ts: str, grain: str = "week"
) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-active period,
    counted in each later period they return.

    Two aggregations, both hash-partitioned on the key — the first-seen
    reduce and the distinct (key, period) activity set co-partition, so
    the join between them is exchange-free on the key side under AQE;
    the final (cohort, offset) reduce is a second small shuffle whose
    cardinality is periods², independent of corpus size.
    """
    # Fixed-length grains only: the offset is computed by epoch-second
    # division, which cannot express variable-length months/quarters.
    supported = {"week": 604_800, "day": 86_400}
    if grain not in supported:
        raise ValueError(
            f"cohort_retention supports grains {sorted(supported)}, got {grain!r}"
        )
    act = events.select(
        F.col(key).alias("k"), F.date_trunc(grain, F.col(ts)).alias("period")
    ).distinct()
    first = act.groupBy("k").agg(F.min("period").alias("cohort"))
    seconds = supported[grain]
    joined = act.join(first, "k")
    return (
        joined.select(
            "cohort",
            (
                (F.unix_timestamp("period") - F.unix_timestamp("cohort"))
                / seconds
            )
            .cast("long")
            .alias("period_offset"),
            "k",
        )
        .groupBy("cohort", "period_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )


def zscore_outliers(
    events: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    threshold: float = 3.0,
) -> DataFrame:
    """Per-group z-score anomaly filter: rows whose value deviates more
    than ``threshold`` sample standard deviations from their group mean.

    Group statistics reduce to #groups rows (partial aggregation
    map-side), then broadcast back over the fact scan — the second pass
    is a broadcast hash join, never a shuffle of the 100 TB side.  The
    z value is rounded to 4 decimals on both engines so accumulation-
    order ulps in the double sums can't flip the hash.

    Values beyond ±1e150 are excluded on BOTH engines before the
    moments: their square overflows IEEE double, which DuckDB surfaces
    as an out-of-range ERROR while Spark silently degrades to inf — a
    job abort vs a silent divergence on the same sentinel row.  Real
    measurements live far inside the guard; anything outside it is a
    corrupt/sentinel value, exactly what an anomaly filter must not
    let poison its own baseline.

    A zero-dispersion group (every value identical — sigma exactly 0)
    has no anomalies BY CONTRACT, same as the mad=0 guard in
    q_anomaly_mad: under ANSI the bare division is a job abort on the
    first such group, and a 100 TB corpus always has one (a constant
    heartbeat metric).  Mirrored in the oracle with ``sigma > 0``.
    """
    events = events.filter(F.abs(F.col(value_col)) < 1e150)
    stats = events.groupBy(group_col).agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_samp(value_col).alias("__sigma"),
    )
    z = F.when(
        F.col("__sigma") > 0,
        F.round((F.col(value_col) - F.col("__mu")) / F.col("__sigma"), 4),
    )
    return (
        events.join(F.broadcast(stats), group_col)
        .withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) > threshold)
        .select(id_col, group_col, value_col, "zscore")
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, compare_cols: list[str]
) -> DataFrame:
    """Diff two snapshots of a table into a change feed:
    ``insert`` (key only in new), ``delete`` (key only in old),
    ``update`` (key in both, any compared column differs).  Unchanged
    rows are dropped.

    One full-outer hash join on the key — the same single-shuffle shape
    as merge_upsert, and zero-shuffle when both snapshots are bucketed
    on the key.  Null-safe equality (``eqNullSafe``) so a NULL→value
    transition registers as an update rather than vanishing.
    (The reference persists nothing — /root/reference/README.md:5 — so
    change-feed derivation is extension surface.)
    """
    o = old.select(F.col(key).alias("__k"), *[F.col(c).alias(f"old_{c}") for c in compare_cols])
    n = new.select(F.col(key).alias("__nk"), *[F.col(c).alias(f"new_{c}") for c in compare_cols])
    j = o.join(n, F.col("__k") == F.col("__nk"), "full_outer")
    # No compare columns → a keys-only presence diff (insert/delete, no
    # update can exist).
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("__k").isNull(), "insert")
        .when(F.col("__nk").isNull(), "delete")
        .when(~same, "update")
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            F.coalesce(F.col("__k"), F.col("__nk")).alias(key),
            "change",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-proof equi join via two-sided salting: the fact side gets a
    deterministic per-row salt, the dim side is replicated once per salt
    value, and the join runs on (key, salt) — a hot key's rows spread
    over ``salt_buckets`` reducers instead of serializing on one.

    When to reach for this instead of AQE's skew-join splitting: AQE
    only splits SORT-MERGE join partitions of a BATCH query after a
    shuffle materializes; stream-stream joins, shuffled-hash joins, and
    any join feeding a strict partitioning requirement don't get the
    runtime rescue, and at 1000 executors a single 500 GB key has
    already ruined the stage before AQE can react.  Cost: dim side
    scans/shuffles ``salt_buckets``× — only pay it when the fact side
    is big enough for skew to matter and the dim side is small enough
    to replicate.

    The salt is ``pmod(xxhash64(monotonically_increasing_id-free fact
    columns), buckets)`` — derived from fact ROW CONTENT, not rand(),
    so retries and speculative tasks compute identical salts
    (nondeterministic salts break exactly-once sinks and re-runs).
    """
    salted_fact = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets)),
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    joined = salted_fact.join(
        replicated_dim,
        (F.col(fact_key) == F.col(dim_key)) & (salted_fact["__salt"] == replicated_dim["__salt"]),
    )
    return joined.drop("__salt")


def profile_columns(df: DataFrame, specs: list[tuple[str, Column]]) -> DataFrame:
    """One-pass column profiler — the data-quality audit every ingest of
    a new 100 TB source starts with: per column, non-null count, exact
    distinct count, and stringified min/max, in long form.

    The reference has no profiling surface at all (its schema is fixed at
    compile time, /root/reference/processor/processor.go:13-16); this is
    extension surface (SURVEY.md §2.3 E31).

    Scale shape: TWO column-pruned scans, no sort anywhere.  The exact
    distinct counts plan as one Expand + partial/final aggregate whose
    buffers are all fixed-width (counts only), so Spark keeps it in
    HashAggregate.  Min/max/non-null run as a separate GLOBAL fold —
    deliberately NOT merged into the Expand aggregate: ``min(string)``
    has a variable-width buffer, which disqualifies HashAggregateExec
    and silently demotes the whole combined plan to SortAggregate — an
    Expand-multiplied full sort (measured 3× this shape at sf0.1, and
    at 100 TB it is a sort of 7× the table).  Two cheap scans beat one
    scan that sorts sevenfold data.  ``specs`` maps column name →
    stringifier (dtype-aware formatting so min/max render identically
    across engines: decimals for doubles, explicit date patterns for
    timestamps).
    """
    distinct_aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    minmax_aggs: list[Column] = []
    for name, to_str in specs:
        distinct_aggs.append(F.countDistinct(F.col(name)).alias(f"{name}__nd"))
        minmax_aggs += [
            F.count(F.col(name)).alias(f"{name}__nn"),
            to_str(F.min(F.col(name))).alias(f"{name}__mn"),
            to_str(F.max(F.col(name))).alias(f"{name}__mx"),
        ]
    row = df.agg(*distinct_aggs).crossJoin(df.agg(*minmax_aggs))
    stack = "stack(%d, %s) as (col_name, n_nonnull, n_distinct, min_s, max_s)" % (
        len(specs),
        ", ".join(
            f"'{name}', {name}__nn, {name}__nd, {name}__mn, {name}__mx"
            for name, _ in specs
        ),
    )
    return row.selectExpr("n_rows", stack).select(
        "col_name", "n_rows", "n_nonnull", "n_distinct", "min_s", "max_s"
    )


# Bucket-count FLOOR for global_enumerate's range decomposition; the
# effective count is max(ENUM_BUCKETS, defaultParallelism) — see
# partitioning.scaled_fanout (bucket counts never change results).
ENUM_BUCKETS = 64


def global_enumerate(
    events: DataFrame, n_buckets: int | None = None
) -> DataFrame:
    """Global row numbering over a total order (value, event_id) WITHOUT
    a single-partition window — the scalable "assign every record a
    stable global position" primitive (shard ids for packed training
    sequences, stable pagination, rank exports).

    A naive ``row_number() OVER (ORDER BY ...)`` collapses the whole
    table into ONE task; at 100 TB that is the job.  This decomposes the
    total order into value-range buckets (order-preserving by
    construction), so the plan is:

    1. 1-row min/max aggregate, broadcast (no shuffle of the fact);
    2. bucket = fixed arithmetic on value (map-side);
    3. per-bucket counts → cumulative offsets — a window over at most
       ``n_buckets`` rows, constant-size at ANY data scale;
    4. one shuffle keyed by bucket, local row_number + broadcast offset.

    Equal values always land in the same bucket (bucket is a function of
    value), so cross-bucket ordering is exact.  The same decomposition
    is how Spark's own range-partitioned sort works; doing it explicitly
    exposes the offsets, which the packed-sequence writer consumes.

    ``n_buckets=None`` derives max(ENUM_BUCKETS, defaultParallelism):
    ranks are bucket-count-independent (equal values share a bucket for
    ANY count), so the decomposition widens with the cluster.
    """
    from kafka_go_cardinality_spark.partitioning import session_fanout

    if n_buckets is None:
        n_buckets = session_fanout(events, ENUM_BUCKETS)
    ev = events.select("event_id", "value")
    stats = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    bucketed = ev.crossJoin(F.broadcast(stats)).withColumn(
        "bucket",
        F.least(
            F.floor(
                ((F.col("value") - F.col("vmin")) * n_buckets)
                / (F.col("vmax") - F.col("vmin") + F.lit(1e-9))
            ),
            F.lit(n_buckets - 1).cast("long"),
        ).cast("int"),
    )
    counts = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    # Cumulative offsets: window over ≤ n_buckets rows — the single
    # partition here is a CONSTANT-size frame, not the data.
    cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "offset", F.coalesce(F.sum("cnt").over(cum), F.lit(0).cast("long"))
    ).select("bucket", "offset")
    local = Window.partitionBy("bucket").orderBy("value", "event_id")
    return (
        bucketed.join(F.broadcast(offsets), "bucket")
        .withColumn(
            "global_rank",
            (F.row_number().over(local).cast("long") + F.col("offset")),
        )
        .select("event_id", "value", "global_rank")
    )


# Markov transition probabilities in exact integer micro-units.
MARKOV_Q = 1_000_000


def markov_transitions(events: DataFrame) -> DataFrame:
    """Per-user event-type transition matrix — the behavioral-analytics
    primitive behind next-action prediction and journey analysis: for
    every ordered pair (prev_type, next_type), how many consecutive
    same-user transitions occurred and the row-normalized probability,
    in exact integer micro-units (``p_q = c * 1e6 div row_total`` —
    engine-exact, same discipline as TextRank/bigram_assoc).

    Scale shape: ONE hash exchange on user_id feeds the lag window
    (per-user ordering is partition-local); transitions then collapse
    to a |types|²-bounded frame, and the row marginal derives from that
    collapsed frame via a broadcast join — the raw events are never
    touched again.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # A transition needs a user, an instant, and a state on both ends:
    # NULL-keyed rows are skipped up front on BOTH engines.  Unfiltered,
    # a NULL ts row sorts FIRST in Spark's window but LAST in SQL
    # (NULLS LAST default), silently shifting every transition after it.
    steps = (
        events.filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
    )
    trans = steps.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("c")
    )
    trans = trans.localCheckpoint(eager=True)  # feeds the marginal + the join
    marg = trans.groupBy(F.col("prev_type").alias("m_type")).agg(
        F.sum("c").alias("row_total")
    )
    return (
        trans.join(F.broadcast(marg), F.col("prev_type") == F.col("m_type"))
        .select(
            "prev_type",
            "next_type",
            "c",
            F.col("row_total"),
            F.expr(f"(c * {MARKOV_Q}) div row_total").alias("p_q"),
        )
    )


def markov_transitions_oracle_sql() -> str:
    return f"""
    WITH steps AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IS NOT NULL),
    trans AS (
      SELECT prev_type, event_type AS next_type, count(*) AS c
      FROM steps WHERE prev_type IS NOT NULL GROUP BY 1, 2),
    marg AS (SELECT prev_type, sum(c) AS row_total FROM trans GROUP BY 1)
    SELECT t.prev_type, t.next_type, t.c,
           CAST(m.row_total AS BIGINT) AS row_total,
           CAST((t.c * {MARKOV_Q}) // m.row_total AS BIGINT) AS p_q
    FROM trans t JOIN marg m ON t.prev_type = m.prev_type
    """


def resample_ffill_two_level(events: DataFrame) -> DataFrame:
    """The 100 TB form of q_ts_resample_ffill, IMPLEMENTED (not just
    documented): the per-type LOCF window is split into per-(type, DAY)
    windows — bounded partitions instead of few-huge per-type ones —
    plus a day-closing carry composed over the tiny (types × days)
    closing frame and broadcast back.  Bit-identical to the
    single-window form by construction: within a day the local window
    sees the same prefix; across days the carry IS the previous days'
    last non-null value (pinned by an equality test and by registering
    this variant against the same oracle).

    Plan: the big shuffle is hash (type, day) — parallelism scales with
    days, not types; the carry pass runs on the closing frame (one row
    per (type, day)) and attaches broadcast."""
    from pyspark.sql import Window

    span = events.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = span.select(
        "event_type",
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("ts"),
    )
    obs = events.select(
        "event_type", "ts", "event_id", "value", F.lit(0).alias("is_grid")
    )
    markers = grid.select(
        "event_type",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("is_grid"),
    )
    u = obs.unionByName(markers).withColumn("day", F.date_trunc("day", "ts"))
    w_day = (
        Window.partitionBy("event_type", "day")
        .orderBy(
            "ts",
            "is_grid",
            F.col("event_id").asc_nulls_last(),
            F.col("value").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_day_full = (
        Window.partitionBy("event_type", "day")
        .orderBy(
            "ts",
            "is_grid",
            F.col("event_id").asc_nulls_last(),
            F.col("value").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    # Both frames share partitioning and ordering, so they run in the
    # SAME WindowExec pass; `close` (the day's last non-null value) is a
    # full-frame last, not a max_by(struct) — a struct ordering key
    # would demote the aggregation to SortAggregate (SURVEY §7.7).
    local = u.withColumn(
        "local_fill", F.last("value", ignorenulls=True).over(w_day)
    ).withColumn("close", F.last("value", ignorenulls=True).over(w_day_full))
    closing = local.select("event_type", "day", "close").distinct()
    w_carry = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = closing.select(
        F.col("event_type").alias("c_type"),
        F.col("day").alias("c_day"),
        F.last("close", ignorenulls=True).over(w_carry).alias("prev_fill"),
    )
    return (
        local.filter(F.col("is_grid") == 1)
        .join(
            F.broadcast(carry),
            (F.col("event_type") == F.col("c_type"))
            & (F.col("day") == F.col("c_day")),
            "left",
        )
        .select(
            "event_type",
            F.unix_timestamp("ts").alias("grid_ts"),
            F.round(
                F.coalesce("local_fill", "prev_fill"), 6
            ).alias("value_ffill"),
        )
    )


# EWMA smoothing: alpha = EWMA_NUM/EWMA_DEN in integer micro-units; a
# day's count is anomalous when it deviates from the forecast (the EWMA
# of all PRIOR days) by more than EWMA_DEV_PCT percent.
EWMA_NUM = 1
EWMA_DEN = 8
EWMA_SCALE = 1_000_000
EWMA_DEV_PCT = 50


def ewma_anomaly(
    events: DataFrame,
    num: int = EWMA_NUM,
    den: int = EWMA_DEN,
    dev_pct: int = EWMA_DEV_PCT,
) -> DataFrame:
    """[E28+] EWMA forecast + deviation anomaly over per-type daily event
    counts — the classic monitoring recurrence (em' = α·x + (1−α)·em)
    that windowed aggregates cannot express because each step depends on
    the previous step's OUTPUT.

    Exactness: the recurrence runs in integer micro-units with
    α = num/den — ``em' = (n·10⁶·num + em·(den−num)) div den`` — so
    every step is exact integer arithmetic, identical on any engine and
    at any parallelism (both engines' integer division agrees on the
    non-negative operands counts produce; the DuckDB twin replays the
    identical recurrence as a recursive CTE).  The first day seeds
    ``em = n·10⁶`` and is never anomalous.

    The anomaly test is ``|n·10⁶ − forecast| > (forecast div 100) ·
    dev_pct`` — the div-by-100-first form (mirrored in the oracle) so
    the comparison never multiplies a deviation by 100: the naive
    ``dev·100 > forecast·pct`` form overflows BIGINT once a daily
    deviation exceeds ~9.2e16 micro-units (counts ≳9.2e10/day/type —
    plausible at 100 TB).  Flooring forecast/100 first shifts the
    threshold by < dev_pct micro-units (< 10⁻⁴ of one event) — both
    engines shift identically.  Remaining bound: ``n·10⁶`` itself
    overflows at n ≳ 9.2e12 events/day/type; beyond that, lower
    EWMA_SCALE.

    Scale shape: one (type, day) count shuffle with map-side combine,
    then one shuffle on type collapses each series to a single row
    whose payload is that type's DAY-GRAIN history — bounded by the
    retention window (a decade of days ≈ 3.7k structs), model-sized
    per key, never event-proportional.  The fold itself is one linear
    in-row ``aggregate``; the explode back out is output-proportional.
    """
    daily = (
        events.filter(
            F.col("event_type").isNotNull() & F.col("ts").isNotNull()
        )
        .groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("long").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "n"))).alias("s")
    )
    out_t = (
        "array<struct<day:bigint,n:bigint,forecast_micro:bigint,"
        "is_anomaly:int>>"
    )
    fold = f"""
    aggregate(
      s,
      struct(CAST(-1 AS BIGINT) AS em, CAST(array() AS {out_t}) AS out),
      (acc, x) -> struct(
        CAST(CASE WHEN acc.em < 0 THEN x.n * {EWMA_SCALE}
             ELSE (x.n * {EWMA_SCALE} * {num} + acc.em * {den - num})
                  div {den} END AS BIGINT) AS em,
        array_append(acc.out, struct(
          x.day AS day,
          CAST(x.n AS BIGINT) AS n,
          CAST(CASE WHEN acc.em < 0 THEN x.n * {EWMA_SCALE}
               ELSE acc.em END AS BIGINT) AS forecast_micro,
          CAST(CASE WHEN abs(x.n * {EWMA_SCALE}
                             - CASE WHEN acc.em < 0 THEN x.n * {EWMA_SCALE}
                                    ELSE acc.em END)
                    > (CASE WHEN acc.em < 0 THEN x.n * {EWMA_SCALE}
                            ELSE acc.em END div 100) * {dev_pct}
               THEN 1 ELSE 0 END AS INT) AS is_anomaly)) AS out),
      acc -> acc.out)
    """
    return (
        series.select("event_type", F.explode(F.expr(fold)).alias("r"))
        .select(
            "event_type",
            F.col("r.day").alias("day"),
            F.col("r.n").alias("n"),
            F.col("r.forecast_micro").alias("forecast_micro"),
            F.col("r.is_anomaly").alias("is_anomaly"),
        )
    )
