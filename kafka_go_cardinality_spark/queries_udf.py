"""[EXT E17] query registrations: the Python UDF surface, oracle-checked.

Every UDF here is a demonstration of the extension mechanism the reference
lacks entirely (its one transform is a hard-wired Go closure,
/root/reference/processor/processor.go:79) — the engine's own operators
stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafka_go_cardinality_spark.functions import tokens_sql, vec_finite_sql
from kafka_go_cardinality_spark.functions.udfs import (
    discounted_price,
    int_total_qty,
    top_order_per_customer,
)
from kafka_go_cardinality_spark.queries import query
from kafka_go_cardinality_spark.sources import load_table


@query(
    "q_udf_pandas_scalar",
    """
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * 100) / 100 AS disc_price
    FROM lineitem
    """,
)
def q_udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas UDF; floor-truncation keeps IEEE bit
    parity with the oracle (round() would differ: half-even vs
    half-away)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        discounted_price("l_extendedprice", "l_discount").alias("disc_price"),
    )


@query(
    "q_udf_grouped_agg",
    """
    SELECT l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def q_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (integer accumulation → order-insensitive,
    hash-stable across engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        int_total_qty("l_quantity").alias("total_qty")
    )


@query(
    "q_udf_grouped_map",
    """
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    )
    WHERE rn = 1
    """,
)
def q_udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas with an explicit total order per group —
    deterministic top-1 selection regardless of Arrow batch order."""
    return top_order_per_customer(load_table(spark, sf_dir, "orders"))


@query(
    "q_udtf_chunks",
    f"""
    WITH c AS (
      SELECT doc_id,
             list_transform(
               range(CAST(ceil(len({tokens_sql('text')}) / 3.0)
                     AS BIGINT)),
               i -> array_to_string(
                 ({tokens_sql('text')})[(i*3)+1:(i+1)*3], ' ')
             ) AS chunks
      FROM documents WHERE doc_id < 50)
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, chunks[i] AS chunk
    FROM c, unnest(range(1, len(chunks) + 1)) AS r(i)
    """,
)
def q_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): LATERAL doc → 3-token-chunk rows — the
    one-to-many table-function shape of the UDF surface
    (functions/udfs.make_chunker_udtf).  Bounded to 50 docs: UDTFs are
    the demonstration slow path; the production chunker is the pure
    array expression in operators/text._chunks."""
    from kafka_go_cardinality_spark.functions.udfs import make_chunker_udtf

    spark.udtf.register("doc_chunks", make_chunker_udtf())
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, c.pos, c.chunk "
        "FROM _udtf_docs d, LATERAL doc_chunks(d.doc_id, d.text) c"
    )


@query(
    "q_emb_gram",
    f"""
    WITH keyed AS (
      -- rid identifies the PHYSICAL row: G = Σ_rows v vᵀ sums each
      -- row's own outer product, so the self-join must pair a row with
      -- ITSELF — joining on vec_id alone would cross-multiply the two
      -- different vectors of a duplicate id (ORDER BY embedding is the
      -- deterministic elementwise-lexicographic identity).
      SELECT vec_id, embedding,
             row_number() OVER (PARTITION BY vec_id ORDER BY embedding)
               AS rid
      FROM embeddings
      WHERE {vec_finite_sql('embedding')} AND len(embedding) = 64),
    flat AS (
      SELECT vec_id, rid, t.pos AS pos,
             CAST(floor(CAST(embedding[t.pos + 1] AS DOUBLE) * 1000 + 0.5)
                  AS BIGINT) AS qv
      FROM keyed, range(64) t(pos))
    SELECT a.pos AS i, b.pos AS j,
           CAST(sum(a.qv * b.qv) AS BIGINT) AS gram_q6
    FROM flat a JOIN flat b USING (vec_id, rid)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_emb_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[E21] Distributed Gram matrix G = XᵀX over the embedding column —
    the covariance/PCA/whitening training primitive.  Each Arrow batch
    computes its PARTIAL d×d product with one vectorized int64 numpy
    matmul (mapInPandas), so the shuffle carries fixed-size matrix
    state — #partitions × d² rows of 16 bytes — never vectors; at
    100 TB the cost is one scan plus a kilobyte-scale merge, the same
    partial/final shape as an aggregate.  Coordinates are quantized to
    integer milli-units with floor(x·1000 + 0.5) on DOUBLE (the repo's
    cross-engine rounding rule — round() half-rules differ between
    engines), making every product and sum exact integer math:
    order-independent, bit-identical at any parallelism, and fully
    DuckDB-oracle-checkable — unusual for a "numeric" ML kernel.
    The oracle states the same computation as a position self-join
    (cost |rows|·d² in SQL, the reason the engine path is a matmul).
    """
    import pandas as pd

    dim = 64

    def partial_gram(batches):
        import numpy as np

        for pdf in batches:
            # Drop NULL / wrong-dimension / non-finite vectors: np.stack
            # on a ragged batch raises and aborts the job, and one NaN
            # coordinate overflows the int64 quantization; the oracle
            # applies the identical filter, so exclusion is value-checked
            # (functions.vec_finite contract).
            vecs = pdf["embedding"]
            keep = vecs.map(
                lambda v: v is not None
                and len(v) == dim
                and bool(np.isfinite(np.asarray(v, dtype=np.float64)).all())
            )
            pdf = pdf[keep]
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            q = np.floor(x * 1000.0 + 0.5).astype(np.int64)
            g = q.T @ q  # exact int64: |qv| ≤ ~2e3 → products ≤ 4e6, rows ≤ 2^40
            i, j = np.nonzero(np.ones_like(g))
            yield pd.DataFrame(
                {"i": i.astype("int32"), "j": j.astype("int32"), "partial": g[i, j]}
            )

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    parts = emb.mapInPandas(partial_gram, schema="i int, j int, partial long")
    return (
        parts.groupBy("i", "j")
        .agg(F.sum("partial").alias("gram_q6"))
        .orderBy("i", "j")
    )
