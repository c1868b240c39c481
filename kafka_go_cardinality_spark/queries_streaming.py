"""[CORE streaming] query registrations: end-to-end Structured Streaming
replays of the reference pipeline (SURVEY.md §2.1 C1-C9, §2.3 E18-E19).

Each query materializes the full stream path — wire-format JSONL on disk →
file source (same ``value`` column as Kafka) → ``from_json`` parse →
watermarked windowed aggregation → ``AvailableNow`` replay into a memory
sink — and returns the sink table as a batch DataFrame.  ``AvailableNow``
over a file dump is exactly the reference's restart/replay story
(``/root/reference/README.md:5``: stateless, re-run over the topic).

Exactness in a stream: distinct aggregations are unsupported on streaming
frames, so the exact twins use streaming dedup (``dropDuplicates`` on
(uid, window)) + ``count(*)`` — oracle-checkable, unlike any sketch.  The
approx twins (DataSketches HLL, bounded state) remain the 100 TB path.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafka_go_cardinality_spark.queries import query
from kafka_go_cardinality_spark.sources import load_table
from kafka_go_cardinality_spark.streaming import (
    file_user_source,
    parse_user_events,
    replay_to_memory,
    session_activity,
    sliding_cardinality,
    stream_cardinality,
    stream_exact_cardinality,
)

# One wire dump per (process, sf_dir): five streaming queries replay the
# same JSONL, so write it once.  Keyed also by pid-safe tmp dir.
_WIRE_DIRS: dict[str, str] = {}


def _wire_dir(spark: SparkSession, sf_dir: str) -> str:
    """events.parquet → JSONL wire dump ``{"uid": ..., "ts": <unix s>}``
    (processor.go:13-16), the replayable stand-in for a retained Kafka
    topic.  ``ts`` is floored to whole seconds at the wire boundary — the
    reference's wire type is integer seconds (processor.go:45).

    Degenerate-row contract (poison audit, r11): ``to_json`` omits NULL
    struct fields, so a NULL user_id/ts lands on the wire as a missing
    key and ``parse_user_events`` drops it (kafkaio.go:77-81
    log-and-continue).  Every oracle over this wire therefore carries
    ``WHERE user_id IS NOT NULL AND ts IS NOT NULL`` — the SQL mirror of
    that filter; on NULL-free fixtures it is a no-op."""
    existing = _WIRE_DIRS.get(sf_dir)
    if existing and os.path.isdir(existing):
        return existing
    events = load_table(spark, sf_dir, "events")
    wire = events.select(
        F.to_json(
            F.struct(
                F.col("user_id").cast("string").alias("uid"),
                F.col("ts").cast("long").alias("ts"),
            )
        ).alias("value")
    )
    path = tempfile.mkdtemp(prefix="kgc_wire_")
    # A handful of files ≈ a handful of Kafka partitions; plenty for replay.
    wire.coalesce(8).write.mode("overwrite").text(path)
    _WIRE_DIRS[sf_dir] = path
    return path


# ~512 KiB of wire input per state-store partition, capped at the
# session's shuffle.partitions.  A streaming query's state partition
# count is frozen at the first checkpoint and every micro-batch pays a
# per-partition state commit (~40 ms of file I/O even when empty), so it
# must be sized to the job like shuffle.partitions on a batch job — both
# failure modes are measured: 32 partitions over a 30 KiB replay spends
# 5× longer committing empty state files than computing, while ONE
# partition over a 5 MiB replay serializes the whole aggregation behind
# a single state task (2× wall).  At 100 TB the byte-derived count is
# astronomically high and the configured shuffle.partitions ceiling is
# what governs — the divisor exists to stop tiny replays from paying
# per-partition commit overhead for parallelism they can't use.
# Re-probed r10 (verdict item 3): a 256 KiB divisor (12 partitions at
# the 3 MiB sf0.1 wire) looked better on single-query A/Bs but is
# pass-to-pass variance; min-of-2 across the stateful set shows 6 ≈ 8
# for aggregations while q_stream_stream_join (4 state stores per
# partition × 2 micro-batches) degrades monotonically (6→2.64 s,
# 8→2.75, 12→3.22) — 512 KiB stays for single-store replays.
#
# STORE-AWARE sizing (r10 verdict item 4): the per-micro-batch commit
# cost is per state-store INSTANCE, i.e. partitions × stores-per-
# partition, so a replay whose plan stacks S stateful operators (or a
# stream-stream join, S=4 internal stores) pays S× the commit overhead
# at the same partition count.  ``stores`` scales the divisor so the
# INSTANCE count stays what the 512 KiB constant was tuned for.
# Min-of-2 at the sf0.1 wires: the join (4.3 MiB typed wire) improves
# monotonically 9→3.11 s, 5→2.65, 3→2.48, 2→2.40 then flattens (1→
# 2.44) — stores=4 lands it at 2-3; the dedup+agg stacks (stores=2)
# measure 2.44→2.18 s (card_day_exact) with session/dedup flat.
_WIRE_BYTES_PER_STATE_PARTITION = 512 << 10


def _state_partitions(wire_path: str, ceiling: int, stores: int = 1) -> int:
    total = sum(
        e.stat().st_size
        for e in os.scandir(wire_path)
        if e.name.startswith("part-")
    )
    per_part = _WIRE_BYTES_PER_STATE_PARTITION * max(1, stores)
    return max(1, min(ceiling, -(-total // per_part)))


# Latest memory-sink table per replay prefix: a memory sink pins its
# result rows in DRIVER memory for the life of the session, so a
# 197-query bench (×2 passes) would otherwise accumulate hundreds of
# dead sinks — dropping the previous one on re-invocation bounds the
# footprint to one live table per query.  The prior invocation's
# returned DataFrame becomes invalid at that point; every caller
# (driver, bench, tests) consumes the frame before re-invoking.
_LAST_REPLAY_TABLE: dict[str, str] = {}


def _replay(
    spark: SparkSession,
    sf_dir: str,
    build,
    prefix: str,
    output_mode: str = "complete",
    stores: int = 1,
) -> DataFrame:
    wire = _wire_dir(spark, sf_dir)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    # Read at query start (stream planning has no AQE to coalesce later);
    # restored after the blocking replay finishes.  ``stores`` = stateful
    # operators stacked in the built plan (see _state_partitions).
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(_state_partitions(wire, int(prev), stores)),
    )
    try:
        parsed = parse_user_events(file_user_source(spark, wire))
        table = f"{prefix}_{uuid.uuid4().hex[:8]}"
        replay_to_memory(build(parsed), table, output_mode=output_mode)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    old = _LAST_REPLAY_TABLE.get(prefix)
    if old is not None:
        spark.catalog.dropTempView(old)
    _LAST_REPLAY_TABLE[prefix] = table
    return spark.table(table)


@query(
    "q_stream_card_day_exact",
    """
    SELECT 'day_count' AS type,
           CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS timestamp,
           count(DISTINCT user_id) AS value
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
    GROUP BY 2
    """,
)
def q_stream_card_day_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[CORE C1-C8] Full streaming path, exact twin: wire parse →
    streaming dedup on (uid, day) → count per window.  Day-grain
    truncation is sub-second-insensitive, so floored wire seconds still
    match the oracle on raw timestamps."""
    return _replay(
        spark,
        sf_dir,
        lambda e: stream_exact_cardinality(e, "day"),
        "stream_day_exact",
        stores=2,  # dropDuplicates + windowed agg
    )


@query(
    "q_stream_card_month_exact",
    """
    SELECT 'month_count' AS type,
           CAST(epoch(date_trunc('month', ts)) AS BIGINT) AS timestamp,
           count(DISTINCT user_id) AS value
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
    GROUP BY 2
    """,
)
def q_stream_card_month_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[CORE C5] Calendar grain on a stream — ``date_trunc`` group key
    (Spark's window() can't express months; SURVEY.md §7.3), complete
    output mode, state = one row per month."""
    return _replay(
        spark,
        sf_dir,
        lambda e: stream_exact_cardinality(e, "month"),
        "stream_month_exact",
        stores=2,  # dropDuplicates + date_trunc agg
    )


@query("q_stream_card_day_approx", oracle=None)  # approx: rows-only by design
def q_stream_card_day_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[CORE C5-C7] The reference's actual computation on the stream:
    DataSketches HLL (lg_k=14 = the reference's 2^14 registers,
    processor.go:80) per day window via ``window()``, partial sketches
    merged map-side, sparse state for near-empty open windows."""
    return _replay(
        spark, sf_dir, lambda e: stream_cardinality(e, "day"), "stream_day_approx"
    )


# Session gap in seconds; '30 minutes' on the Spark side.
_SESSION_GAP_S = 1800


@query(
    "q_stream_session",
    f"""
    WITH e AS (
        SELECT DISTINCT CAST(user_id AS VARCHAR) AS uid,
               CAST(floor(epoch(ts)) AS BIGINT) AS t
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    marked AS (
        SELECT uid, t,
               CASE WHEN t - lag(t) OVER (PARTITION BY uid ORDER BY t)
                         >= {_SESSION_GAP_S}
                    OR lag(t) OVER (PARTITION BY uid ORDER BY t) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM e
    ),
    sessions AS (
        SELECT uid, t,
               sum(new_session) OVER (
                   PARTITION BY uid ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sid
        FROM marked
    )
    SELECT uid,
           min(t) AS session_start,
           max(t) + {_SESSION_GAP_S} AS session_end,
           count(*) AS events
    FROM sessions
    GROUP BY uid, sid
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT E18] Gap-based session windows per uid on the stream, checked
    against a gaps-and-islands SQL oracle.  Events are pre-deduped to one
    per (uid, second) on BOTH sides so the oracle's count(*) is
    order-independent (the wire floors ts to seconds, collapsing events the
    raw-timestamp oracle would count separately)."""

    def build(parsed: DataFrame) -> DataFrame:
        return session_activity(parsed.dropDuplicates(["uid", "ts"]), gap="30 minutes")

    return _replay(spark, sf_dir, build, "stream_session", stores=2)


@query("q_stream_ref_emulation", oracle=None)  # custom stateful op: not SQL-expressible
def q_stream_ref_emulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[CORE §2.4] Bit-faithful emulation of the reference's data-driven
    flush (processor.go:79-102) as an applyInPandasWithState operator —
    drifting windows, insert-before-check, startup artifact and all.  The
    semantics are inherently sequential per grain (no SQL oracle exists);
    the driver records a rows-only check, and tests/test_ref_emulation.py
    pins the quirks against hand-computed streams."""
    from kafka_go_cardinality_spark.streaming.ref_emulation import (
        reference_flush_emulation,
    )

    return _replay(spark, sf_dir, reference_flush_emulation, "stream_ref_emu", "append")


@query("q_stream_sliding", oracle=None)  # approx HLL values: rows-only
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT E18] Sliding windows (10 min length / 5 min slide): each event
    feeds length/slide overlapping windows; approx distinct per window."""
    return _replay(
        spark,
        sf_dir,
        lambda e: sliding_cardinality(e, "10 minutes", "5 minutes"),
        "stream_sliding",
    )


@query(
    "q_stream_enrich",
    """
    SELECT CAST(epoch(date_trunc('day', e.ts)) AS BIGINT) AS day_ts,
           CAST(c.c_nationkey AS INT) AS nationkey,
           count(*) AS n_events
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.user_id IS NOT NULL AND e.ts IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT E18 stream-static join] Enrich the live stream with a static
    dimension: wire events join a BROADCAST customer table (stream-static
    joins need no state — the static side is a plain broadcast relation
    re-used every micro-batch), then exact per-(day, nation) counts.
    This is the canonical streaming-ETL shape: dimension lookups happen
    in-flight, map-side, before any stateful operator."""

    def build(parsed: DataFrame) -> DataFrame:
        dim = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey"), F.col("c_nationkey").cast("int").alias("nationkey")
        )
        enriched = parsed.join(
            F.broadcast(dim), parsed["uid"].cast("long") == dim["c_custkey"], "left"
        )
        return (
            enriched.withWatermark("ts", "10 minutes")
            .groupBy(F.date_trunc("day", "ts").alias("day"), "nationkey")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.col("day").cast("long").alias("day_ts"),
                "nationkey",
                "n_events",
            )
        )

    return _replay(spark, sf_dir, build, "stream_enrich")


@query(
    "q_stream_dedup",
    """
    SELECT DISTINCT CAST(user_id AS VARCHAR) AS uid,
           CAST(floor(epoch(ts)) AS BIGINT) AS t
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT E19] Streaming deduplication as its own operator:
    ``dropDuplicates`` on (uid, second) with a watermark bounds the dedup
    state to the watermark horizon — the exactly-once ingest guard every
    at-least-once pipeline needs in front of it.  Append mode emits each
    surviving row once; the oracle is plain DISTINCT."""

    def build(parsed: DataFrame) -> DataFrame:
        return (
            parsed.withWatermark("ts", "10 minutes")
            .dropDuplicates(["uid", "ts"])
            .select("uid", F.col("ts").cast("long").alias("t"))
        )

    return _replay(spark, sf_dir, build, "stream_dedup", "append")


# Typed wire dump (uid, ts, etype) for the stream-stream join — the
# reference's wire has no event type (processor.go:13-16), so this is
# the E18 extension wire.  One dump per (process, sf_dir).
_TYPED_WIRE_DIRS: dict[str, str] = {}


def _typed_wire_dir(spark: SparkSession, sf_dir: str) -> str:
    existing = _TYPED_WIRE_DIRS.get(sf_dir)
    if existing and os.path.isdir(existing):
        return existing
    events = load_table(spark, sf_dir, "events")
    wire = events.select(
        F.to_json(
            F.struct(
                F.col("user_id").cast("string").alias("uid"),
                F.col("ts").cast("long").alias("ts"),
                F.col("event_type").alias("etype"),
            )
        ).alias("value")
    )
    path = tempfile.mkdtemp(prefix="kgc_wire_typed_")
    wire.coalesce(8).write.mode("overwrite").text(path)
    _TYPED_WIRE_DIRS[sf_dir] = path
    return path


@query(
    "q_stream_stream_join",
    """
    SELECT CAST(v.user_id AS VARCHAR) AS uid,
           CAST(floor(epoch(v.ts)) AS BIGINT) AS view_ts,
           CAST(floor(epoch(c.ts)) AS BIGINT) AS click_ts
    FROM events v JOIN events c
      ON v.user_id = c.user_id
     AND v.event_type = 'view' AND c.event_type = 'click'
     AND floor(epoch(c.ts)) >= floor(epoch(v.ts))
     AND floor(epoch(c.ts)) <= floor(epoch(v.ts)) + 3600
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E18] Stream-stream interval join over the typed wire replay:
    views ⋈ same-user clicks within the next hour, watermarks on both
    sides bounding join state to rate × gap
    (streaming/pipeline.interval_join_streams).  The replayed result is
    oracle-checked against the equivalent batch join — completeness,
    not just shape."""
    from pyspark.sql.types import StructField, StructType, StringType, LongType

    from kafka_go_cardinality_spark.streaming.pipeline import (
        interval_join_streams,
        replay_to_memory,
    )

    wire = _typed_wire_dir(spark, sf_dir)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        # 4 internal stores per partition for a stream-stream join
        str(_state_partitions(wire, int(prev), stores=4)),
    )
    try:
        schema = StructType(
            [
                StructField("uid", StringType()),
                StructField("ts", LongType()),
                StructField("etype", StringType()),
            ]
        )
        parsed = (
            spark.readStream.text(wire)
            .select(F.from_json(F.col("value"), schema).alias("m"))
            .filter(F.col("m").isNotNull())
            .select(
                F.col("m.uid").alias("uid"),
                F.timestamp_seconds(F.col("m.ts")).alias("ts"),
                F.col("m.etype").alias("etype"),
            )
        )
        views = parsed.filter(F.col("etype") == "view").drop("etype")
        clicks = parsed.filter(F.col("etype") == "click").drop("etype")
        joined = interval_join_streams(views, clicks)
        table = f"ssj_{uuid.uuid4().hex[:8]}"
        replay_to_memory(joined, table, output_mode="append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(table)


@query(
    "q_stream_upsert_sink",
    """
    SELECT CAST(user_id AS VARCHAR) AS uid,
           CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day,
           count(*) AS n
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q_stream_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E19/E29 composite] foreachBatch idempotent upsert sink — the
    production streaming-write pattern (a MERGE stand-in without Delta):
    an update-mode per-(uid, day) count emits each touched key's LATEST
    cumulative total per micro-batch, and the sink upserts those keys
    into a versioned parquet table (anti-join keep + union new, write
    new version, swap).  Upserting latest-value-per-key is idempotent
    under micro-batch retry — the exactly-once recipe Spark documents
    for foreachBatch.  ``maxFilesPerTrigger`` forces a multi-batch
    replay so the upsert path actually re-merges (a single availableNow
    batch would trivialize it).  Final table is oracle-checked against
    the batch aggregate — the merged state must equal a from-scratch
    groupBy."""
    wire = _wire_dir(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="kgc_upsert_")
    versions: list[str] = []

    def upsert(batch_df, batch_id: int) -> None:
        new = batch_df.select("uid", "day", "n")
        if versions:
            cur = batch_df.sparkSession.read.parquet(versions[-1])
            keep = cur.join(new.select("uid", "day"), ["uid", "day"], "left_anti")
            merged = keep.unionByName(new)
        else:
            merged = new
        path = f"{base}/v{batch_id}"
        merged.write.mode("overwrite").parquet(path)
        versions.append(path)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_state_partitions(wire, int(prev)))
    )
    # Skip the trailing no-data micro-batch (the replay_to_memory
    # rationale): in update mode it emits zero keys, so its only effect
    # here was one extra no-op upsert version written and swapped.
    ndb_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev_ndb = spark.conf.get(ndb_key, None)
    spark.conf.set(ndb_key, "false")
    try:
        parsed = parse_user_events(
            spark.readStream.option("maxFilesPerTrigger", "3").text(wire)
        )
        counts = (
            parsed.groupBy(
                F.col("uid"),
                F.date_trunc("day", "ts").cast("long").alias("day"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            counts.writeStream.foreachBatch(upsert)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "q_stream_upsert_sink replay did not finish within 300 s "
                f"({len(versions)} batches committed)"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        if prev_ndb is not None:
            spark.conf.set(ndb_key, prev_ndb)
        else:
            spark.conf.unset(ndb_key)
    return spark.read.parquet(versions[-1])


@query("q_stream_grain_fanout", oracle=None)  # approx HLL values: rows-only
def q_stream_grain_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[CORE C4-C8] The whole reference pipeline as ONE streaming query:
    wire parse → 5-grain explode fan-out → per-(grain, window) sparse
    HLL state → StatMsg projection (streaming/pipeline.
    stream_grain_fanout).  The per-grain streaming queries remain the
    append-mode-capable variants; this is the faithful all-grains-at-
    once shape of processor.go:60-75."""
    from kafka_go_cardinality_spark.streaming.pipeline import stream_grain_fanout

    return _replay(spark, sf_dir, stream_grain_fanout, "stream_fanout")


def _register_stream_profile() -> None:
    """[E19+] Register the Spark 4 ``transformWithStateInPandas`` typed-
    state profile operator — ONLY where the state-server protocol's
    ``google.protobuf`` dependency exists (streaming/stateful_v2.py
    documents the gate; this container lacks it and installs are
    off-limits).  Environments with the dep get the query + a full
    DuckDB oracle: counters are monotone, so max-over-update-emissions
    per key equals the batch aggregate."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return

    @query(
        "q_stream_profile",
        """
        SELECT user_id, count(*) AS n_events,
               count(DISTINCT event_type) AS n_types
        FROM events
        GROUP BY user_id
        """,
    )
    def q_stream_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
        """[E19+] Per-user lifetime profile via transformWithStateInPandas
        (ValueState counter + MapState-as-set), replayed availableNow into
        a memory sink; update-mode emissions collapse to the final state
        with max() since both counters are monotone
        (streaming/stateful_v2.py)."""
        from kafka_go_cardinality_spark.streaming.stateful_v2 import (
            user_profile_stream,
        )

        d = tempfile.mkdtemp(prefix="kgc_profile_wire_")
        load_table(spark, sf_dir, "events").select(
            "user_id", "event_type"
        ).coalesce(4).write.mode("overwrite").json(d)
        prev = spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", None
        )
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        try:
            src = spark.readStream.schema(
                "user_id long, event_type string"
            ).json(d)
            table = f"stream_profile_{uuid.uuid4().hex[:8]}"
            replay_to_memory(
                user_profile_stream(src), table, output_mode="update"
            )
        finally:
            if prev is not None:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev
                )
            else:
                spark.conf.unset(
                    "spark.sql.streaming.stateStore.providerClass"
                )
        return spark.table(table).groupBy("user_id").agg(
            F.max("n_events").alias("n_events"),
            F.max("n_types").alias("n_types"),
        )


_register_stream_profile()


# Vector wire dump for the online-embedding-ingest query: one per
# (process, sf_dir), like _WIRE_DIRS.  Doubles are widened BEFORE
# to_json so the JSONL round-trip is exact (Jackson serializes doubles
# shortest-round-trip; the oracle's CAST(embedding AS DOUBLE[]) is the
# same float→double widening).
_VEC_WIRE_DIRS: dict[str, str] = {}


def _vec_wire_dir(spark: SparkSession, sf_dir: str) -> str:
    existing = _VEC_WIRE_DIRS.get(sf_dir)
    if existing and os.path.isdir(existing):
        return existing
    emb = load_table(spark, sf_dir, "embeddings")
    wire = emb.select(
        F.to_json(
            F.struct(
                F.col("vec_id").cast("long").alias("vec_id"),
                F.expr("transform(embedding, x -> cast(x as double))").alias(
                    "embedding"
                ),
            )
        ).alias("value")
    )
    path = tempfile.mkdtemp(prefix="kgc_vec_wire_")
    wire.coalesce(4).write.mode("overwrite").text(path)
    _VEC_WIRE_DIRS[sf_dir] = path
    return path


# The near-dup guard's STATIC side — the planted LSH index, banded —
# materialized to parquet once per (process, sf_dir).  A stream-static
# join re-analyzes the static plan EVERY micro-batch, and the
# md5-hyperplane sketch is a ~4k-literal generated expression tree, so
# keeping it in the live plan made each replay pay seconds of repeated
# driver-side analysis (q_stream_vec_neardup was 6.4 s at sf0.1 —
# 3-4x the other replays); as a parquet scan the static side is a
# trivial plan and the values are bit-identical (parquet doubles are
# exact).  This is also the production shape: an ingest gate reads its
# index as a TABLE, it does not recompute sketches per batch.
_VEC_INDEX_DIRS: dict[str, str] = {}


def _vec_index_dir(spark: SparkSession, sf_dir: str) -> str:
    existing = _VEC_INDEX_DIRS.get(sf_dir)
    if existing and os.path.isdir(existing):
        return existing
    from kafka_go_cardinality_spark.functions import norm
    from kafka_go_cardinality_spark.operators import similarity as sim

    index = sim.with_planted_neighbors(
        load_table(spark, sf_dir, "embeddings")
    ).select("vec_id", F.col("embedding").alias("v"))
    # dot64_seq's contract (64 fully-measured dims on BOTH sides) holds
    # here by construction, not by luck: with_planted_neighbors filters
    # `vec_finite & size == 64` on the index side (similarity.py — same
    # WHERE in its SQL twin), so no short/NULL-element/NULL vector ever
    # reaches the sketch or the banded join (r10 ADVICE flagged the
    # sketch-0 → ragged-np.vstack crash path; its premise — an
    # unfiltered index — is refuted by that upstream filter, and
    # tests/test_streaming.py::test_vec_neardup_poisoned_corpus_parity
    # pins the invariant with malformed rows planted in the corpus).
    # Scale-aware band values (see the ladder block): band b = its own
    # w-plane mini-sketch over planes [b·w, (b+1)·w) — exactly
    # bands·width planes are ever computed (guide §2.3: don't compute
    # what you throw away; at sf0.1's (5, 3) rung that is 15 planes
    # against the 80-plane oracle ceiling), values identical to the
    # old packed-sketch bit windows wherever both exist.
    bits, bands = _neardup_dims_for(spark, sf_dir)
    ibase = index.withColumn(
        "bvals", sim.ann_band_values("v", bits, bands)
    ).withColumn("nrm", norm(F.col("v")))
    ibands = ibase.select(
        F.col("vec_id").alias("dup_of"),
        F.col("v").alias("iv"),
        F.col("nrm").alias("inrm"),
        F.posexplode("bvals").alias("band", "band_bits"),
    )
    path = tempfile.mkdtemp(prefix="kgc_vec_index_")
    ibands.coalesce(4).write.mode("overwrite").parquet(path)
    _VEC_INDEX_DIRS[sf_dir] = path
    return path


def _vec_assign_oracle() -> str:
    """Per PHYSICAL wire row (a stream replays duplicates as-is): the
    ann_ivf cells derivation, emitting each row's winning cell and its
    cosine (the argmax row's cos IS array_max; ties to the lowest cid =
    Spark's array_position-first)."""
    from kafka_go_cardinality_spark.functions import vec_finite_sql
    from kafka_go_cardinality_spark.operators.similarity import IVF_CENTROIDS

    def dot(x: str, y: str) -> str:
        return (
            f"list_reduce(list_transform(range(1, len({x}) + 1), "
            f"i -> {x}[i] * {y}[i]), (acc, v) -> acc + v)"
        )

    cos = (
        f"(CASE WHEN sqrt({dot('c0.v', 'c0.v')}) > 0 "
        f"AND sqrt({dot('cent.cv', 'cent.cv')}) > 0 "
        f"THEN {dot('c0.v', 'cent.cv')} / "
        f"(sqrt({dot('c0.v', 'c0.v')}) * sqrt({dot('cent.cv', 'cent.cv')})) "
        f"ELSE 0.0 END)"
    )
    return f"""
    WITH c0a AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings WHERE {vec_finite_sql('embedding')}
                   AND len(embedding) = 64),
    c0 AS (SELECT vec_id, v,
                  row_number() OVER (PARTITION BY vec_id ORDER BY v) AS rid
           FROM c0a),
    cent AS (SELECT vec_id AS cid, v AS cv FROM c0
             WHERE vec_id < {IVF_CENTROIDS} AND rid = 1),
    cc AS (SELECT c0.vec_id, c0.rid, cent.cid, {cos} AS cos
           FROM c0 CROSS JOIN cent)
    SELECT vec_id, CAST(cell AS INT) AS cell, round(cos, 6) AS cos FROM (
      SELECT vec_id, rid, cid AS cell, cos,
             row_number() OVER (PARTITION BY vec_id, rid
                                ORDER BY cos DESC, cid ASC) AS r
      FROM cc) WHERE r = 1
    """


@query("q_stream_vec_assign", _vec_assign_oracle())
def q_stream_vec_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT E18×E21] Online embedding ingest: a STREAM of vectors is
    assigned to IVF cells against STATIC coarse centroids — the index
    side of a live ANN/near-dup service (new vectors route to their
    inverted-file cell in-flight; the batch ivf_topk/semantic_dedup
    plans consume the same cells).  Stateless streaming map: the
    centroid model is a broadcast-sized literal (trained offline — here
    the shared deterministic seeding), the cell argmax and cosine are
    in-row expressions, no watermark, no state store — the one
    streaming shape that costs NOTHING per micro-batch beyond the scan.
    Append mode emits each wire row exactly once, so the whole path is
    deterministic and FULLY ORACLED (stream parse → assignment ≡ the
    ann_ivf cells derivation per physical row), unlike the
    aggregation-bearing streaming replays whose sketch values are
    rows-only."""
    import math as _math

    from kafka_go_cardinality_spark.functions import as_double, norm, vec_finite
    from kafka_go_cardinality_spark.operators.similarity import (
        IVF_CENTROIDS,
        _dedup_rows_by_id,
        _dlit,
        _dot_sql,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter(
        vec_finite(F.col("embedding")) & (F.size("embedding") == 64)
    )
    seeds = (
        emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
        .filter(F.col("vec_id") < IVF_CENTROIDS)
        .collect()
    )
    seed_vecs = [row["v"] for row in _dedup_rows_by_id(seeds, "v")]
    if not seed_vecs:
        return spark.createDataFrame([], "vec_id bigint, cell int, cos double")

    def _seq_norm(vec):
        acc = 0.0
        for x in vec:
            acc = acc + float(x) * float(x)
        return _math.sqrt(acc)

    def _cell_cos(vec, cn: float) -> str:
        if not cn > 0:
            return "0.0D"
        return "if(nrm > 0, %s / (nrm * %s), 0.0D)" % (
            _dot_sql("v", vec),
            _dlit(cn),
        )

    cos_arr = F.expr(
        "array(%s)"
        % ", ".join(
            _cell_cos(vec, _seq_norm(vec)) for vec in seed_vecs
        )
    )
    wire = _vec_wire_dir(spark, sf_dir)
    src = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .json(wire)
        # size == 64: the similarity family's dimension contract — a
        # wrong-width vector is malformed wire input (poison audit row
        # 920002: a clean 32-dim vector must drop on BOTH engines, not
        # prefix-dot on one and NULL-fold on the other).
        .filter(vec_finite(F.col("embedding")) & (F.size("embedding") == 64))
        .select("vec_id", F.col("embedding").alias("v"))
        .select("vec_id", "v", norm(F.col("v")).alias("nrm"))
        .select("vec_id", cos_arr.alias("ca"))
        .select(
            "vec_id",
            (F.array_position(F.col("ca"), F.array_max("ca")) - 1)
            .cast("int")
            .alias("cell"),
            F.round(F.array_max("ca"), 6).alias("cos"),
        )
    )
    table = f"stream_vec_assign_{uuid.uuid4().hex[:8]}"
    replay_to_memory(src, table, output_mode="append")
    old = _LAST_REPLAY_TABLE.get("stream_vec_assign")
    if old is not None:
        spark.catalog.dropTempView(old)
    _LAST_REPLAY_TABLE["stream_vec_assign"] = table
    return spark.table(table)


# Online near-dup ingest guard: cosine threshold for "this incoming
# vector already (≈) exists in the index".
VEC_NEARDUP_TAU = 0.9

# Scale-aware LSH band WIDTH (the named dial from the r10 streaming
# scale probe, implemented): at fixed width the band-collision
# probability is a constant (3·2⁻⁴ on near-orthogonal data), so the
# guard's candidate pairs grow ∝ N² — measured 34.5× wall at 32× the
# corpus.  Collision probability is 2^-band_bits, so one extra bit per
# 4× corpus growth (bits ≈ ½·log₂N) holds candidate pairs to ∝ N^1.5
# — the same balance point as the kNN pair's n_cells ∝ √N.  Mechanism:
# band b is bits [b·w, (b+1)·w) of the ANN_BANDS·w-plane sign sketch.
# Because _hyperplanes seeds md5-per-(plane, component), a wider
# sketch is a STRICT EXTENSION of a narrower one (bit p = plane p at
# any width — the property the 12→24 step already relied on), so the
# ENGINE computes exactly the ANN_BANDS·w planes the current width
# needs (computing the full MAX-width sketch and masking, as r11 did,
# produces bit-identical bands while paying for planes no band reads
# — at the fixture widths that was 24 planes computed for 12-15 used)
# while the ORACLE — one static SQL string — always folds the full
# MAX-width sketch and extracts the same [b·w, (b+1)·w) windows: the
# extracted bands are equal either way, pinned by the scaled-width
# parity test.  At w = 4 the bands are exactly the shipped 3×4-bit
# ones, so every fixture ≤ the first step keeps bit-identical results.
# w derives from a RAW embeddings row count — engine in Python, oracle
# as the identical integer ladder over a scalar subquery — so the
# queries stay FULLY ORACLED at any N.  Widening costs recall on
# MARGINAL pairs (cos ≈ τ: any-band collision 0.90 at w=4 → 0.70 at
# w=8) while near-identical duplicates stay ≥0.97 — the standard LSH
# precision/cost trade, taken deliberately.
#
# r12 (r11 verdict item 3): the ladder gets its next rungs by scaling
# band COUNT alongside width.  Width alone cannot go past 8 bits
# without giving up the planted-twin floor: the fixture twins sit at
# per-plane sign agreement p ≈ 0.904 (cos ≈ 0.955 — genuine near-dups
# for τ = 0.9), so a single band's hit rate p^w decays geometrically
# and 3 bands at w = 9 catch only 0.82 (measured on the rotated
# 736-twin sample) — the exact recall the ≥95% floor exists to
# protect.  Adding bands restores it: measured catch/mass per rung
# (rotated twin sample / random-pair collision fraction):
#   (4,3) shipped   (5,3) 0.951   (6,4) 0.974/.0625  (7,5) 0.981/.0391
#   (8,5) 0.973/.0195  (9,7) 0.981/.0137  (10,8) 0.988/.0078
# — every rung ≥0.95, candidate mass ~0.6× per 4× corpus ⇒ candidates
# ∝ ~N^1.64 (vs N^1.5 for width-only-with-floorless-recall, N² for a
# frozen sketch).  Bands are no longer bit-windows of ONE packed
# BIGINT (that capped bands·width at 63 planes): band b is computed
# directly as its own w-plane mini-sketch over planes [b·w, (b+1)·w) —
# numerically identical to the old shift-and-mask extraction wherever
# both exist (the strict-extension md5-per-(plane, component) seeding,
# the property every widening step has used).  The engine materializes
# exactly bands·width planes; the oracle folds a static 80-plane sign
# ARRAY (the ladder ceiling) and windows it dynamically.  Ceiling:
# above 2.048M rows the dial freezes at (10, 8) and candidate growth
# reverts toward N²·0.008 — the next rung needs either a lower
# marginal-pair floor or longer hashes (SURVEY scale table).
VEC_NEARDUP_MAX_BAND_BITS = 10
_VEC_NEARDUP_BITS_STEPS = (
    2_000,
    8_000,
    32_000,
    128_000,
    512_000,
    2_048_000,
)
# Band count per ladder position (index = steps crossed).
_VEC_NEARDUP_BANDS = (3, 3, 4, 5, 5, 7, 8)
# Static oracle sketch width: the widest any rung reads (10 × 8).
VEC_NEARDUP_MAX_PLANES = max(
    (4 + i) * b for i, b in enumerate(_VEC_NEARDUP_BANDS)
)


def _neardup_band_bits(n_rows: int) -> int:
    """Band width for an N-row corpus: ANN_BAND_BITS (4) + one bit per
    ladder step crossed, capped by the ladder length at MAX (10)."""
    from kafka_go_cardinality_spark.operators import similarity as sim

    return sim.ANN_BAND_BITS + sum(
        1 for t in _VEC_NEARDUP_BITS_STEPS if n_rows >= t
    )


def _neardup_bands(n_rows: int) -> int:
    """Band COUNT for an N-row corpus — the r12 rung dial (see the
    ladder block): indexed by the same steps-crossed as the width."""
    return _VEC_NEARDUP_BANDS[
        sum(1 for t in _VEC_NEARDUP_BITS_STEPS if n_rows >= t)
    ]


def _neardup_bands_sql() -> str:
    """The oracle's :func:`_neardup_bands`: the identical list lookup
    over a scalar-subquery raw count of ``embeddings``."""
    terms = " + ".join(
        f"CAST(n >= {t} AS INT)" for t in _VEC_NEARDUP_BITS_STEPS
    )
    lst = "[" + ", ".join(str(b) for b in _VEC_NEARDUP_BANDS) + "]"
    return (
        f"(SELECT ({lst})[1 + {terms}] "
        f"FROM (SELECT count(*) AS n FROM embeddings) t)"
    )


def _neardup_band_bits_sql() -> str:
    """The oracle's :func:`_neardup_band_bits`: the identical integer
    ladder over a scalar-subquery raw count of ``embeddings``."""
    from kafka_go_cardinality_spark.operators import similarity as sim

    terms = " + ".join(
        f"CAST(n >= {t} AS INT)" for t in _VEC_NEARDUP_BITS_STEPS
    )
    return (
        f"(SELECT {sim.ANN_BAND_BITS} + {terms} "
        f"FROM (SELECT count(*) AS n FROM embeddings) t)"
    )


def _neardup_raw_count(spark: SparkSession, sf_dir: str) -> int:
    """Raw physical-row count (parquet footer metadata — the same
    raw-frame contract as the kNN grid; the count deliberately precedes
    the planted-neighbor augmentation and the vec filter, mirroring the
    oracle's ``count(*) FROM embeddings``).  The ONE dial both ladder
    laws read — tests force post-cap rungs by patching this."""
    return load_table(spark, sf_dir, "embeddings").count()


def _neardup_bits_for(spark: SparkSession, sf_dir: str) -> int:
    """Engine-side width from the shared raw count."""
    return _neardup_band_bits(_neardup_raw_count(spark, sf_dir))


def _neardup_dims_for(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    """(width, bands) from ONE raw count — index build and stream side
    derive both dials identically, as the oracle's bw CTE does."""
    n = _neardup_raw_count(spark, sf_dir)
    return _neardup_band_bits(n), _neardup_bands(n)


def _vec_neardup_oracle() -> str:
    """Batch replay of the stream ingest guard: the planted-index
    derivation (WITH_PLANTED_NEIGHBORS_SQL), md5-hyperplane sign
    sketches on BOTH sides (identical fold to functions.dot — the
    _ann_lsh_oracle device), scale-aware banded join, exact cosine ≥ τ.
    One event per SHARED BAND (the stateless stream emits per
    collision; a distinct would need state), so the oracle keeps the
    band column and no DISTINCT.  Band width AND count are the
    engine's integer ladders over one scalar-subquery raw count (the
    ``bw`` CTE — see the ladder block): the oracle folds the static
    80-plane sign array (the ladder ceiling) once per row and windows
    it per band — band b = Σ_{{j<w}} sb[b·w+j]·2^j, identical to the
    engine's per-band mini-sketches at any rung, and to the shipped
    3×4-bit bands whenever (w, B) = (4, 3)."""
    from kafka_go_cardinality_spark.functions import vec_finite_sql
    from kafka_go_cardinality_spark.operators import similarity as sim

    planes = sim._hyperplanes(64, VEC_NEARDUP_MAX_PLANES)

    def duck_dot(vec: str, comps) -> str:
        # Unrolled left-associative sum: the same IEEE adds in the same
        # order as the engine's sequential fold (x1·c1 + x2·c2 + … ≡
        # ((x1·c1 + x2·c2) + x3·c3)…; the fold's extra leading 0.0 can
        # only flip a zero's SIGN, which a `>= 0` test cannot see — and
        # the dot feeds ONLY the sign below).  ~20× cheaper in DuckDB
        # than list_reduce(list_transform(...)), which allocates two
        # 64-element lists and runs an interpreted lambda per plane per
        # row — at the 80-plane ceiling that made the oracle the wall.
        return "(" + " + ".join(
            f"{vec}[{i + 1}] * {sim._dlit(c)}" for i, c in enumerate(comps)
        ) + ")"

    def signs(vec: str) -> str:
        return "[" + ", ".join(
            f"(CASE WHEN {duck_dot(vec, comps)} >= 0 THEN 1 ELSE 0 END)"
            for comps in planes
        ) + "]"

    # bw rides the FROM clause as a 1-row cross join: DuckDB lambdas
    # can capture row columns (bw.bits) but not scalar subqueries; the
    # band fan-out unnests the static ceiling and filters to bw.bands.
    max_bands = max(_VEC_NEARDUP_BANDS)
    bval = (
        "CAST(list_sum(list_transform(range(0, bw.bits), "
        "j -> CAST(sb[b.band * bw.bits + j + 1] AS BIGINT) "
        "* (CAST(1 AS BIGINT) << j))) AS BIGINT)"
    )

    def dot(x: str, y: str) -> str:
        return (
            f"list_reduce(list_transform(range(1, len({x}) + 1), "
            f"i -> {x}[i] * {y}[i]), (acc, v) -> acc + v)"
        )

    cos = (
        f"(CASE WHEN sqrt({dot('s.v', 's.v')}) > 0 "
        f"AND sqrt({dot('x.v', 'x.v')}) > 0 "
        f"THEN {dot('s.v', 'x.v')} / "
        f"(sqrt({dot('s.v', 's.v')}) * sqrt({dot('x.v', 'x.v')})) "
        f"ELSE 0.0 END)"
    )
    return f"""
    WITH bw AS (SELECT CAST({_neardup_band_bits_sql()} AS BIGINT) AS bits,
                       CAST({_neardup_bands_sql()} AS BIGINT) AS bands),
    aug AS ({sim.WITH_PLANTED_NEIGHBORS_SQL}),
    idx AS (SELECT vec_id, embedding AS v, {signs('embedding')} AS sb
            FROM aug),
    ibands AS (
      SELECT vec_id AS dup_of, v, b.band, {bval} AS band_bits
      FROM idx CROSS JOIN bw,
           (SELECT unnest(range(0, {max_bands})) AS band) b
      WHERE b.band < bw.bands),
    strm AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             FROM embeddings
             WHERE {vec_finite_sql('embedding')} AND len(embedding) = 64),
    ssk AS (SELECT vec_id, v, {signs('v')} AS sb
            FROM strm),
    sbands AS (
      SELECT vec_id, v, b.band, {bval} AS band_bits
      FROM ssk CROSS JOIN bw,
           (SELECT unnest(range(0, {max_bands})) AS band) b
      WHERE b.band < bw.bands)
    SELECT vec_id, dup_of, CAST(band AS INT) AS band,
           round(cos, 6) AS cos FROM (
      SELECT s.vec_id, x.dup_of, s.band, {cos} AS cos
      FROM sbands s
      JOIN ibands x ON x.band = s.band AND x.band_bits = s.band_bits
      WHERE x.dup_of <> s.vec_id)
    WHERE cos >= {VEC_NEARDUP_TAU}
    """


@query("q_stream_vec_neardup", _vec_neardup_oracle())
def q_stream_vec_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT E18×E20/E21] Online near-dup ingest guard: each STREAMED
    vector is checked against a STATIC planted index by LSH band join +
    exact cosine ≥ τ — "does this incoming document already (≈) exist
    in the corpus", the streaming twin of q_dedup_incremental /
    q_dedup_embedding and the gate an online ingest runs BEFORE
    admitting a document to training data.  Stateless: sign sketch and
    band expansion are in-row expressions against md5-hyperplane
    literals, candidates come from a stream-static equi join on (band,
    band_bits) — the static index side is a persisted batch frame, no
    state store, no watermark — and the exact-cosine verify runs only
    on band collisions.  Emits one event per shared band (a distinct
    would need state; the oracle keeps the band column instead).
    Append mode is therefore deterministic per wire row and the query
    is FULLY ORACLED."""
    src = _vec_neardup_pairs(spark, sf_dir)
    table = f"stream_vec_neardup_{uuid.uuid4().hex[:8]}"
    replay_to_memory(src, table, output_mode="append")
    old = _LAST_REPLAY_TABLE.get("stream_vec_neardup")
    if old is not None:
        spark.catalog.dropTempView(old)
    _LAST_REPLAY_TABLE["stream_vec_neardup"] = table
    return spark.table(table)


def _vec_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared streaming frame of the two near-dup guards:
    (vec_id, dup_of, band, cos) for every band collision between the
    wire stream and the static parquet-materialized LSH index that
    passes the exact-cosine verify.

    Plan-shape note (r13, negative result kept for the record): the
    guide-§8 'broadcast the index, ship each wire row once' alternative
    — a mapInPandas enumerating the identical collision set in numpy
    against a worker-held index — was built and measured.  In BATCH
    form it wins (1.50 s vs 2.32 s at sf0.1: the join ships 432k
    collision pairs × two 64-dim vectors ≈ 440 MB through Arrow), but
    inside a streaming micro-batch the fresh-per-query Python workers
    pay import + broadcast-hydration + first-touch allocation costs
    that erase the win (interleaved min-of-3: 3.1 s broadcast vs 2.9 s
    join, with far worse variance) — so the stream keeps the
    stream-static equi join, which also remains the only scale-safe
    shape once the index outgrows a broadcast.  The chunk-size fix the
    experiment surfaced (BLOCK_PAIR_CHUNK 131k→32k: 8.6× cold-worker
    fold speedup) is kept in functions/udfs.py for the batch grouped
    passes."""
    from kafka_go_cardinality_spark.functions import cosine_pre, norm, vec_finite
    from kafka_go_cardinality_spark.functions.udfs import dot64_seq
    from kafka_go_cardinality_spark.operators import similarity as sim

    # Scale-aware (width, bands), identical derivation to the index
    # build (both sides fall out of the same raw count, as the oracle's
    # bw CTE does).
    bits, bands = _neardup_dims_for(spark, sf_dir)
    ibands = spark.read.parquet(_vec_index_dir(spark, sf_dir))
    wire = _vec_wire_dir(spark, sf_dir)
    return (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .json(wire)
        .filter(vec_finite(F.col("embedding")) & (F.size("embedding") == 64))
        .select("vec_id", F.col("embedding").alias("v"))
        # Rung-proportional band values (bands·width planes — all any
        # band reads; see the _vec_index_dir comment): per wire row
        # this cuts the dominant in-row cost of the two slowest
        # replays by ~38% at the fixture rung ((5,3) = 15 planes vs
        # the 24 the r11 fixed-max sketch always folded) and shrinks
        # the generated expression tree the micro-batch planner
        # re-analyzes.
        .withColumn("bvals", sim.ann_band_values("v", bits, bands))
        .withColumn("nrm", norm(F.col("v")))
        .select(
            "vec_id",
            "v",
            "nrm",
            F.posexplode("bvals").alias("band", "band_bits"),
        )
        .join(ibands, ["band", "band_bits"])
        .filter(F.col("dup_of") != F.col("vec_id"))
        # dot64_seq: the exact-cosine verify runs on EVERY band
        # collision (432k pairs at sf0.1's (5, 3) rung) and the
        # lambda-HOF dot is interpreted row-at-a-time; the
        # Arrow-batched sequential fold is bit-identical (verified by
        # exceptAll both ways) and ~2x faster on this pair volume.
        .withColumn(
            "cos_raw",
            cosine_pre(
                dot64_seq(F.col("v"), F.col("iv")),
                F.col("nrm"),
                F.col("inrm"),
            ),
        )
        # Filter on the UNROUNDED cosine: the oracle's outer WHERE binds
        # to the raw subquery column (DuckDB resolves the real column over
        # the round(...,6) select alias), so rounding first would admit
        # pairs with true cos in [tau - 5e-7, tau) that the oracle drops.
        .filter(F.col("cos_raw") >= VEC_NEARDUP_TAU)
        .select(
            "vec_id",
            "dup_of",
            F.col("band").cast("int").alias("band"),
            F.round(F.col("cos_raw"), 6).alias("cos"),
        )
    )


def _vec_neardup_distinct_oracle() -> str:
    """The DISTINCT form of the same replay: the per-band inner query
    collapses to one row per (vec_id, dup_of) — the cosine is a pair
    property (band-independent), so DISTINCT over (vec_id, dup_of, cos)
    is exactly one-event-per-duplicate."""
    return (
        "SELECT DISTINCT vec_id, dup_of, cos FROM (\n"
        + _vec_neardup_oracle()
        + "\n)"
    )


@query("q_stream_vec_neardup_distinct", _vec_neardup_distinct_oracle())
def q_stream_vec_neardup_distinct(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """[EXT E18×E19×E20] The near-dup ingest guard with the
    one-event-per-(vec_id, dup_of) contract a real admission gate
    wants: q_stream_vec_neardup deliberately emits one event per
    SHARED BAND (stateless), this twin adds the E19 streaming-dedup
    machinery — ``dropDuplicates`` on the pair key — so a vector
    colliding with the same index entry in several bands is flagged
    once.  Deterministic despite state: the dedup key is the FULL
    output row (vec_id, dup_of, cos) — on the shipped corpora every
    band row of a pair is identical (the cosine is a pair property),
    and under re-crawled corpora where one vec_id carries two payloads
    (the rid-edge the PQ property suite plants) each distinct cos
    survives exactly as the oracle's DISTINCT does, so arrival order
    never picks a winner and the query stays FULLY ORACLED (the
    DISTINCT form of the same replay SQL).  State is bounded by the
    distinct-pair count of the batch being replayed; a continuous
    deployment bounds it with ``dropDuplicatesWithinWatermark`` once
    the wire carries event time."""
    pairs = _vec_neardup_pairs(spark, sf_dir).drop("band")
    src = pairs.dropDuplicates(["vec_id", "dup_of", "cos"])
    # The first stateful vec-wire replay: size the state partitions to
    # the wire like _replay does, instead of paying the session
    # ceiling's per-partition state commits (the _WIRE_BYTES_PER_
    # STATE_PARTITION rationale).
    wire = _vec_wire_dir(spark, sf_dir)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(_state_partitions(wire, int(prev))),
    )
    table = f"stream_vec_neardup_d_{uuid.uuid4().hex[:8]}"
    try:
        replay_to_memory(src, table, output_mode="append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    old = _LAST_REPLAY_TABLE.get("stream_vec_neardup_d")
    if old is not None:
        spark.catalog.dropTempView(old)
    _LAST_REPLAY_TABLE["stream_vec_neardup_d"] = table
    return spark.table(table)
