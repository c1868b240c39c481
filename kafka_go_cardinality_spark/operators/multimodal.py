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
