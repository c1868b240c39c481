"""[EXT E23] Multimodal column plumbing — images/audio/video as opaque
``binary`` payloads with typed metadata, processed through Arrow-batched
``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is a
deterministic fake (clearly marked); everything Spark-side is real and
tested: the binary column, the metadata struct, the mapInPandas batch
signature, and the output schema.  Swapping the fake for PIL/libav is a
one-function change.

Scale notes: mapInPandas streams Arrow record batches through Python —
the only Python hot path in the engine, used exactly where built-ins
cannot go (codec calls).  Batch size is controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch``; payload bytes never
hit the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload_len", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def as_media(documents: DataFrame) -> DataFrame:
    """Shape text docs as a multimodal table: binary payload + metadata
    struct — the schema a real image/audio table would have."""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").cast(BinaryType()).alias("payload"),
        F.struct(
            F.when(F.col("doc_id") % 3 == 0, "image")
            .when(F.col("doc_id") % 3 == 1, "audio")
            .otherwise("video")
            .alias("media_type"),
            F.octet_length(F.col("text")).alias("payload_len"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB — stands in for PIL.Image.open / av.open.  Deterministic
    dimensions derived from payload bytes so tests are reproducible.
    Replace with a real codec call in production."""
    h = sum(payload[:16]) if payload else 0
    return (64 + h % 512, 64 + (h * 7) % 512, 1 + h % 30)


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode pass: mapInPandas over (doc_id, payload, meta),
    emitting typed per-item features.  The batch loop is the real
    production shape; only ``_fake_decode`` is a stand-in."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, hgt, fr = zip(*[_fake_decode(p) for p in pdf["payload"]])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["media_type"] for m in pdf["meta"]],
                    "payload_len": [m["payload_len"] for m in pdf["meta"]],
                    "width": w,
                    "height": hgt,
                    "n_frames": fr,
                }
            )

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


FRAME_SAMPLES = 8  # uniform samples per video
FRAME_MODULUS = 240  # synthetic frame-count derivation (documented fake)


def frame_sample(media: DataFrame) -> DataFrame:
    """Deterministic uniform frame sampling over the video rows — the
    frame-selection half of a video ingestion pipeline, entirely JVM-side
    (sequence + explode): pick ``FRAME_SAMPLES`` uniformly-spaced frame
    indices per clip and the byte offset to seek each one.

    Frame count is DERIVED from payload length (the codecs that would
    read real container metadata aren't in this environment — same
    documented-fake policy as ``_fake_decode``); the selection math
    ``idx_i = floor(i·n/m)`` and the offset plumbing are the real
    article, and a row explodes into at most ``min(n_frames, m)`` frame
    rows with no shuffle anywhere.
    """
    v = media.filter(F.col("meta.media_type") == "video").select(
        "doc_id",
        F.col("meta.payload_len").alias("plen"),
        (1 + F.col("meta.payload_len") % FRAME_MODULUS).alias("n_frames"),
    )
    v = v.withColumn(
        "m", F.least(F.col("n_frames"), F.lit(FRAME_SAMPLES))
    ).withColumn("stride", F.expr("plen div n_frames"))
    rows = v.select(
        "doc_id",
        "n_frames",
        "stride",
        F.explode(F.sequence(F.lit(0), F.col("m") - 1)).alias("i"),
        F.col("m"),
    )
    frame_idx = F.floor(
        (F.col("i") * F.col("n_frames")).cast("double") / F.col("m")
    ).cast("long")
    return rows.select(
        "doc_id",
        F.col("n_frames").cast("long").alias("n_frames"),
        F.col("i").cast("long").alias("sample_i"),
        frame_idx.alias("frame_idx"),
        (frame_idx * F.col("stride")).cast("long").alias("byte_offset"),
    )


def with_planted_media_dupes(media: DataFrame) -> DataFrame:
    """Media corpus ∪ re-encoded copies of every 9th item (id+3_000_000,
    payload suffixed with 16 bytes of 'junk') — models the
    same-content-different-bytes duplicates (re-encodes, metadata edits)
    that media dedup exists for: exact hashing misses them."""
    mutants = (
        media.filter(F.col("doc_id") % 9 == 0)
        .withColumn("doc_id", F.col("doc_id") + 3_000_000)
        .withColumn(
            "payload",
            F.concat(
                F.col("payload"), F.encode(F.lit("~" * 16), "UTF-8")
            ).cast(BinaryType()),
        )
    )
    return media.unionByName(mutants)


WITH_PLANTED_MEDIA_DUPES_SQL = """
    SELECT doc_id, payload FROM media
    UNION ALL
    SELECT doc_id + 3000000 AS doc_id,
           payload || CAST('~~~~~~~~~~~~~~~~' AS BLOB) AS payload
    FROM media WHERE doc_id % 9 = 0
"""

# 30 payload bytes = 40 base64 chars: base64 is block-aligned per 3 bytes,
# so prefix-of-base64(whole) == base64(prefix) and BOTH engines can take
# the prefix on the VARCHAR side (DuckDB cannot slice BLOBs).
PHASH_PREFIX_BYTES = 30
PHASH_PREFIX_B64_CHARS = PHASH_PREFIX_BYTES // 3 * 4


def media_neardup_pairs(media: DataFrame) -> DataFrame:
    """Near-duplicate media pairs via a locality-sensitive content hash:
    hash the first ``PHASH_PREFIX_BYTES`` of the payload, bucket-join on
    it.  This is the perceptual-hash dedup SHAPE — in production the key
    is pHash/chromaprint over decoded content (robust to re-encoding);
    here the documented fake is prefix-md5 (robust to appended metadata
    /container trailers), chosen because it is computable without codecs
    AND exactly reproducible in the oracle.

    Scale shape: one shuffle keyed by the 60-bit hash — candidates are
    hash-equal groups, never a cross join; the pair explosion is bounded
    by duplicate-group sizes exactly like exact dedup."""
    from kafka_go_cardinality_spark.functions import hash64

    keyed = media.select(
        "doc_id",
        hash64(
            F.substring(F.base64(F.col("payload")), 1, PHASH_PREFIX_B64_CHARS)
        ).alias("phash"),
    )
    a = keyed.select(F.col("doc_id").alias("doc_a"), "phash")
    b = keyed.select(F.col("doc_id").alias("doc_b"), "phash")
    return (
        a.join(b, "phash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "phash")
    )


# WebDataset-style shard size in bytes (fixture-scaled; a production
# run uses ~100 MB-1 GB tar shards — the plan is size-independent).
SHARD_BYTES = 4096


def shard_manifest(media: DataFrame, shard_bytes: int = SHARD_BYTES) -> DataFrame:
    """WebDataset-style shard manifest: per media type, samples
    concatenate in doc_id order into fixed-byte-budget shards; each
    sample records the shard it STARTS in and its byte offset there —
    the layout table a multimodal tar-sharding job writes before
    packing the actual bytes.

    Scale shape: one hash exchange on media_type feeds a
    partition-local cumulative-sum window; all arithmetic is BIGINT on
    the METADATA column, so the manifest is deterministic and
    resumable — the payload bytes never move until the final per-shard
    write, which reads this manifest partitioned by (media_type,
    shard_id).  Skew note: media types are FEW and huge, so at 100 TB
    the window key becomes (media_type, doc_id range-bucket) with the
    per-bucket closing offsets composed in a second vocab-sized pass —
    the same two-level carry q_ts_resample_ffill documents for
    ordering and q_card_day_exact_salted implements for distinctness.
    The fixture-scale single-window form is what the oracle checks."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.col("meta.media_type")).orderBy("doc_id")
    start = (
        F.sum(F.col("meta.payload_len")).over(w) - F.col("meta.payload_len")
    ).cast("long")
    return media.select(
        "doc_id",
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.payload_len").cast("long").alias("n_bytes"),
        start.alias("start"),
    ).select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.expr(f"start div {shard_bytes}").alias("shard_id"),
        (F.col("start") % shard_bytes).alias("shard_offset"),
    )


def shard_manifest_oracle_sql(shard_bytes: int = SHARD_BYTES) -> str:
    return f"""
    WITH m AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS media_type,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents),
    c AS (
      SELECT doc_id, media_type, n_bytes,
             CAST(sum(n_bytes) OVER (PARTITION BY media_type ORDER BY doc_id)
                  - n_bytes AS BIGINT) AS start
      FROM m)
    SELECT doc_id, media_type, n_bytes,
           CAST(start // {shard_bytes} AS BIGINT) AS shard_id,
           CAST(start % {shard_bytes} AS BIGINT) AS shard_offset
    FROM c
    """


# Caption-alignment scoring: feature-hashing text encoder dimension and
# keep threshold for the CLIP-style image-text curation filter.
CLIP_DIM = 64
CLIP_KEEP_THRESHOLD = 0.0


def caption_alignment(
    documents: DataFrame,
    embeddings: DataFrame,
    dim: int = CLIP_DIM,
    threshold: float = CLIP_KEEP_THRESHOLD,
) -> DataFrame:
    """CLIP-style caption-image alignment filtering — the LAION curation
    step: score how well each document's TEXT agrees with its IMAGE
    embedding and keep aligned pairs.  A real deployment embeds text
    with a learned encoder; this engine's deterministic stand-in is the
    classic FEATURE-HASHING text encoder (the hash_classifier pattern
    lifted to vectors): every token hashes to one of ``dim`` signed
    buckets, the document's text vector is the signed bucket-count
    vector, and alignment = cosine(text vector, image embedding).
    Every number is an exact function of the data — fully
    oracle-checkable, unlike any learned encoder.

    Scale shape: token→(bucket, sign) is a zero-lookup map pass (two
    md5s per token); one (doc, bucket) shuffle with map-side combine
    collapses to ≤``dim`` rows per doc; the dense vector assembles
    in-row from that map; ONE equi join attaches the image embedding
    (both sides doc-keyed — co-partitionable at 100 TB).  Docs with no
    tokens or no image embedding drop out of the inner join on both
    engines; non-finite embeddings are excluded at ingress
    (vec_finite) and zero-norm text vectors score exactly 0.0 (the
    cosine degenerate-pair contract)."""
    from kafka_go_cardinality_spark.functions import (
        as_double,
        cosine,
        hash64,
        tokens,
        vec_finite,
    )

    tok = documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("t")
    )
    buckets = tok.select(
        "doc_id",
        F.pmod(hash64(F.col("t"), "clipdim"), F.lit(dim)).alias("b"),
        (F.pmod(hash64(F.col("t"), "clipsign"), F.lit(2)) * 2 - 1).alias(
            "s"
        ),
    )
    sparse = (
        buckets.groupBy("doc_id", "b")
        .agg(F.sum("s").alias("v"))
        .groupBy("doc_id")
        .agg(
            F.map_from_arrays(
                F.collect_list("b"), F.collect_list("v")
            ).alias("m")
        )
    )
    tvec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.coalesce(
            F.element_at(F.col("m"), d), F.lit(0).cast("long")
        ).cast("double"),
    )
    img = embeddings.filter(vec_finite(F.col("embedding"))).select(
        F.col("vec_id").alias("doc_id"),
        as_double(F.col("embedding")).alias("iv"),
    )
    return (
        sparse.join(img, "doc_id")
        .select(
            "doc_id",
            F.round(cosine(tvec, F.col("iv")), 6).alias("align_score"),
        )
        .select(
            "doc_id",
            "align_score",
            (F.col("align_score") > threshold).cast("int").alias("keep"),
        )
    )
