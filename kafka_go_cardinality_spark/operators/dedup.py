"""[EXT E20] Deduplication operators — exact and near-duplicate detection
over the ``documents`` table, the core of a training-data pipeline.

The reference has no dedup at all (its only distinct-ness notion is the
HLL uid sketch, /root/reference/processor/processor.go:80); this family is
mandated by the driver's north star.

All variants are expressed with built-in JVM-side functions (no Python
UDFs anywhere): md5-derived 60-bit hashes, higher-order array functions
for shingles/signatures, and hash-partitioned self-joins for candidate
pairs.  Scale design per operator:

- exact: one groupBy on a 128-bit content hash — the shuffle carries
  (hash, id), never the document bodies.
- MinHash LSH: signatures are k=16 mins over shingle hashes computed
  map-side; candidate generation is an equi self-join on (band, band
  hash) buckets — the classic shuffle-friendly LSH plan; verification
  re-checks exact Jaccard only on candidates.
- SimHash: 48-bit fingerprints from per-bit token votes; banded equi-join
  (4×12 bits) guarantees recall for Hamming distance ≤ 3 by pigeonhole.
- n-gram Jaccard: exact pairs within a blocking key (source) — the
  explode/self-join/count plan, all integer math.

The fixture corpus has NO natural duplicates (checked), so each query
plants deterministic duplicates/mutants first — the plant rule is part of
the query definition and is replicated in the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kafka_go_cardinality_spark.caching import tracked_persist
from kafka_go_cardinality_spark.partitioning import spread
from kafka_go_cardinality_spark.functions import hash64, shingles, tokens, tokens_sql

# MinHash parameters: 16 permutations in 8 bands of 2 → candidate
# probability 1-(1-j²)⁸ (≈1 for j≥0.8, ≈.08 for j=0.1).
NUM_PERMS = 16
BAND_SIZE = 2
NUM_BANDS = NUM_PERMS // BAND_SIZE

# Permutations are affine maps h -> (a*h + b) mod P over ONE md5-derived
# base hash per shingle — md5 runs once per shingle, not once per
# (shingle, permutation): 16x less hashing, the dominant signature cost.
# P = 2^31-1 keeps a*(h%P)+b < 2^62: no BIGINT overflow in either engine
# (both run ANSI semantics and would throw, not wrap).  Constants are
# Knuth multiplicative-hash multiples, fixed so the DuckDB oracle can
# replicate the exact signatures.
MINHASH_P = 2_147_483_647
PERM_A = tuple((2_654_435_761 * (i + 1)) % MINHASH_P for i in range(NUM_PERMS))
PERM_B = tuple((40_503 * (i + 1) * 2_654_435_761) % MINHASH_P for i in range(NUM_PERMS))

# SimHash: 48 bits (stays clear of BIGINT sign), 4 bands of 12 →
# guaranteed recall for Hamming distance ≤ 3.
SIMHASH_BITS = 48
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS


def with_exact_dupes(documents: DataFrame) -> DataFrame:
    """Corpus ∪ exact copies of every 5th doc (planted, id+1_000_000)."""
    copies = documents.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    return documents.unionByName(copies)


WITH_EXACT_DUPES_SQL = """
    SELECT * FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
    FROM documents WHERE doc_id % 5 = 0
"""


def with_near_dupes(documents: DataFrame) -> DataFrame:
    """Corpus ∪ mutants of every 7th doc: last token dropped
    (id+1_000_000) — shingle Jaccard ≈ (n-1)/n ≈ 0.97 vs the original."""
    tok = tokens(F.col("text"))
    mutants = (
        documents.filter(F.col("doc_id") % 7 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
        .withColumn(
            "text",
            F.array_join(F.slice(tok, 1, F.greatest(F.size(tok) - 1, F.lit(1))), " "),
        )
    )
    return documents.unionByName(mutants)


WITH_NEAR_DUPES_SQL = f"""
    SELECT * FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id,
           array_to_string(list_slice(toks, 1, greatest(len(toks) - 1, 1)), ' ') AS text,
           lang, source, n_chars
    FROM (SELECT *, {tokens_sql('text')} AS toks
          FROM documents)
    WHERE doc_id % 7 = 0
"""


def exact_dedup(corpus: DataFrame) -> DataFrame:
    """Exact dedup groups: content hash → canonical (min) id + copy count.
    Deterministic by construction (``dropDuplicates`` keeps an arbitrary
    row; min-id keeps a defined one)."""
    return (
        corpus.select(F.md5(F.col("text")).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _signature(corpus: DataFrame) -> DataFrame:
    """doc_id + distinct shingle set + MinHash signature (16 mins).

    Tokens and shingles are each bound in their own projection: lambda
    bodies re-evaluate unbound expressions PER ARRAY ELEMENT (a regex
    split inlined into ``element_at`` costs O(tokens) per shingle —
    measured 20× slower), and CollapseProject keeps multi-referenced
    non-trivial aliases materialized.

    The input is spread across all cores first: signature computation is
    CPU-bound (one md5 per shingle) and must not inherit a narrow file
    layout.
    """
    corpus = spread(corpus)
    def perm_min(i: int):
        # NB: the transform lambda must stay single-arg — a second arg
        # would be bound to the element INDEX column by Spark.
        a, b = F.lit(PERM_A[i]), F.lit(PERM_B[i])
        return F.array_min(
            F.transform(F.col("hs"), lambda h: (a * (h % MINHASH_P) + b) % MINHASH_P)
        ).alias(f"mh{i}")

    sig = [perm_min(i) for i in range(NUM_PERMS)]
    return (
        corpus.select("doc_id", tokens(F.col("text")).alias("t"))
        .select("doc_id", shingles(F.col("t")).alias("shingle_set"))
        .select(
            "doc_id",
            "shingle_set",
            F.transform(F.col("shingle_set"), lambda s: hash64(s)).alias("hs"),
        )
        .select("doc_id", "shingle_set", *sig)
    )


def _band_frame(sig: DataFrame) -> DataFrame:
    """(doc_id, band, band_hash) — one row per LSH band bucket entry; the
    ONLY payload that rides a candidate-generation shuffle.

    Docs whose shingle set is EMPTY (shorter than the shingle width) are
    excluded before banding: their MinHash mins are all NULL, so every
    such doc lands in the identical md5("") bucket in every band — at
    corpus scale that one bucket goes quadratic in the candidate join.
    Excluding them is semantics-preserving: Jaccard against an empty set
    is 0/0 → NaN, which can never pass a ``>= threshold`` verification
    on either engine."""
    sig = sig.filter(F.size("shingle_set") > 0)
    return sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"mh{b * BAND_SIZE + r}")
                                for r in range(BAND_SIZE)
                            ],
                        )
                    )
                    for b in range(NUM_BANDS)
                ]
            )
        ).alias("band", "band_hash"),
    )


def minhash_lsh_pairs(corpus: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Near-dup pairs via MinHash LSH: band-bucket candidates, then exact
    Jaccard verification.  Output: (doc_a, doc_b, jaccard) with a < b.

    The signature frame is persisted before use: it feeds FOUR plan
    branches (both sides of the band self-join, both re-attachment joins),
    and without a cache boundary Spark recomputes the md5-per-shingle
    signature stage — the dominant cost — once per branch and compiles its
    codegen unit once per branch.  One materialization of (doc_id,
    shingles, 16 longs) is strictly smaller than the corpus and is the
    standard shape for persisted LSH signature tables at scale."""
    sig = tracked_persist(_signature(corpus))
    sets = sig.select("doc_id", "shingle_set")
    # Candidate generation shuffles (band, band_hash, doc_id) ONLY — at
    # 100 TB the shingle sets (i.e. the documents) must never ride the
    # LSH self-join; they are re-attached per candidate pair afterwards.
    bands = _band_frame(sig)
    cands = (
        bands.select(F.col("doc_id").alias("doc_a"), "band", "band_hash")
        .join(
            bands.select(F.col("doc_id").alias("doc_b"), "band", "band_hash"),
            ["band", "band_hash"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    pairs = cands.join(
        sets.select(F.col("doc_id").alias("doc_a"), F.col("shingle_set").alias("set_a")),
        "doc_a",
    ).join(
        sets.select(F.col("doc_id").alias("doc_b"), F.col("shingle_set").alias("set_b")),
        "doc_b",
    )
    inter = F.size(F.array_intersect("set_a", "set_b")).cast("double")
    union = (F.size("set_a") + F.size("set_b") - inter).cast("double")
    return (
        pairs.select(
            "doc_a", "doc_b", F.round(inter / union, 6).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(corpus: DataFrame) -> DataFrame:
    """48-bit SimHash fingerprint per doc: per-bit ±1 votes over token
    hashes, folded IN-ROW with higher-order array functions — tokenize →
    hash array → ``aggregate``/``zip_with`` vote fold → bit assembly, all
    inside one projection.

    This formulation has NO shuffle and no per-token row explosion: the
    earlier explode + groupBy(48 conditional sums) version shuffled one
    row per token and built 48 aggregation buffers per doc per partition
    (measured 2.5× slower at sf0.1, identical fingerprints).  A map-only
    stage is the ideal 100 TB shape — throughput scales linearly with
    executors and the operator composes with any upstream partitioning.

    The corpus is still spread across all cores first: the fold is
    CPU-bound and must not inherit a narrow file layout.  The token hash
    array is bound in its own projection so the fold's lambda reads a
    materialized array (an unbound expression would re-tokenize per
    element)."""
    corpus = spread(corpus)
    hs = corpus.select(
        "doc_id",
        F.transform(tokens(F.col("text")), lambda t: hash64(t, "simhash")).alias(
            "hs"
        ),
    )
    zero = F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS)

    def tok_votes(h):
        # shiftright's bit index must be a Python literal (the wrapper
        # rejects Columns), hence the unrolled 48-element array.
        return F.array(
            *[
                F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1
                for j in range(SIMHASH_BITS)
            ]
        )

    votes = F.aggregate(
        F.col("hs"), zero, lambda acc, h: F.zip_with(acc, tok_votes(h), lambda a, b: a + b)
    )
    powers = F.array(*[F.lit(2**j).cast("long") for j in range(SIMHASH_BITS)])
    fp = F.aggregate(
        F.zip_with(
            votes, powers, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return hs.select("doc_id", fp.alias("simhash"))


def simhash_pairs(corpus: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.
    Banded equi-join (4×12-bit keys) keeps recall exact for ≤3 by
    pigeonhole while avoiding the all-pairs cross product.

    The fingerprint frame (doc_id + one long — tiny at any scale) is
    persisted first: both sides of the band self-join consume it, and
    without the cache boundary the 48-sum vote aggregate runs twice AND
    its very large generated-code unit JIT-compiles twice (measured: the
    double compile alone costs more than the whole warm query)."""
    fp = tracked_persist(simhash(corpus))
    mask = (1 << SIMHASH_BAND_BITS) - 1
    bands = fp.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), b * SIMHASH_BAND_BITS)
                    .bitwiseAND(F.lit(mask))
                    .cast("long")
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band", "band_key"),
    )
    left = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fp_a"), "band", "band_key"
    )
    right = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fp_b"), "band", "band_key"
    )
    cands = (
        left.join(right, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "fp_a", "fp_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return cands.select(
        "doc_a", "doc_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def connected_components(pairs: DataFrame, max_iter: int = 10) -> DataFrame:
    """Near-dup cluster assignment: connected components over a pair list
    via iterative min-label propagation — ``(doc_id, cluster_id)`` where
    ``cluster_id`` is the smallest doc_id reachable through pairs.

    This is the step every dedup pipeline needs after pair generation
    (keep one doc per CLUSTER, not per pair — pairs alone over-delete on
    chains a-b, b-c).  Each round does (1) the standard min-label
    propagation — every vertex takes the min label among itself and its
    neighbors — then (2) a POINTER JUMP: each vertex replaces its label
    with its label's label (labels only decrease, so label-of-label is
    always ≤ label).  Propagation alone needs diameter rounds — a
    50-link chain would exhaust any fixed budget; the jump halves the
    effective distance each round (the shortcutting half of the
    large-star/small-star family, Kiveris et al., "Connected Components
    in MapReduce and Beyond"), giving O(log diameter) convergence:
    near-dup components are shallow (2-3 rounds), and even pathological
    chain corpora converge within the default ``max_iter`` — pinned by
    the planted-50-chain property test (tests/test_properties.py).

    Scale notes: the edge list is localCheckpoint-ed once (the loop body
    re-reads it every round; at 100 TB re-deriving pairs per round would
    dominate), every round is one equi-join + one groupBy on doc_id, and
    lineage is cut per round so the plan doesn't grow with iterations.
    Convergence is detected with a count of decreased labels — a driver
    scalar, not a collect of data rows.  The previous label rides the
    union as an extra column (min over exactly one non-null), so change
    detection is a filter over the already-materialized round output —
    no second join per round.
    """
    # Materialize the pair list BEFORE the symmetrizing union: both union
    # branches read `pairs`, and without a boundary the whole upstream
    # pair-generation pipeline is computed once per branch (no
    # common-subplan reuse in Spark).  The checkpointed (doc_a, doc_b)
    # list is tiny relative to pair generation at any scale.
    pair_ids = pairs.select("doc_a", "doc_b").localCheckpoint()
    edges = pair_ids.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pair_ids.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    label_type = dict(labels.dtypes)["cluster_id"]
    for _ in range(max_iter):
        neighbor_labels = edges.join(
            labels, edges["dst"] == labels["doc_id"]
        ).select(
            F.col("src").alias("doc_id"),
            "cluster_id",
            F.lit(None).cast(label_type).alias("old"),
        )
        # Each doc_id contributes exactly one non-null `old` (its own row),
        # so min(old) recovers the previous label without a second join.
        propagated = (
            labels.select(
                "doc_id", "cluster_id", F.col("cluster_id").alias("old")
            )
            .unionByName(neighbor_labels)
            .groupBy("doc_id")
            .agg(
                F.min("cluster_id").alias("cluster_id"),
                F.min("old").alias("old"),
            )
        )
        # Pointer jump: follow one level of label indirection.  Every
        # label IS some vertex's doc_id, so the self-join is total; the
        # left join + coalesce only guards the degenerate empty frame.
        # This join is labels-sized (vertices, not edges) — cheap next
        # to the neighbor join above.
        jump = propagated.select(
            F.col("doc_id").alias("j_id"), F.col("cluster_id").alias("j_cl")
        )
        new_labels = (
            propagated.join(jump, propagated["cluster_id"] == jump["j_id"], "left")
            .select(
                "doc_id",
                F.coalesce("j_cl", "cluster_id").alias("cluster_id"),
                "old",
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("cluster_id") < F.col("old")).count()
        labels = new_labels.select("doc_id", "cluster_id")
        if changed == 0:
            break
    return labels


def ngram_jaccard_pairs(
    corpus: DataFrame, threshold: float = 0.6, block_col: str = "source"
) -> DataFrame:
    """EXACT n-gram Jaccard pairs within a blocking key — no LSH, no
    approximation: explode distinct shingles, self-join on (block,
    shingle), count shared, Jaccard from distinct-set sizes."""
    shared = _shared_shingle_counts(corpus, block_col)
    jac = F.col("shared") / (F.col("size_a") + F.col("size_b") - F.col("shared"))
    return shared.select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def _shared_shingle_counts(corpus: DataFrame, block_col: str) -> DataFrame:
    """(doc_a, doc_b, size_a, size_b, shared) for every doc pair sharing
    ≥ 1 shingle within a block — the common engine under Jaccard and
    containment pair generation (plan documented inline)."""
    # Spread the CPU-heavy tokenize/shingle/md5 map stage across all
    # cores — a couple of parquet files would otherwise pin it to a
    # couple of tasks (the shuffle moves raw text once; the stage it
    # feeds does ~1000x that work).
    corpus = spread(corpus)
    sh = (
        corpus.select(
            "doc_id",
            F.col(block_col).alias("block"),
            tokens(F.col("text")).alias("t"),
        )
        .select("doc_id", "block", shingles(F.col("t")).alias("shingle_set"))
        .withColumn("set_size", F.size("shingle_set"))
    )
    # Bucket plan instead of a self-join: group postings by (block,
    # shingle-hash) and emit ordered pairs from each bucket array-side.
    # One shuffle of 8-byte hashed postings (vs two exchanges of both join
    # sides), and singleton buckets — the vast majority of shingles —
    # are dropped before any pair exists.  Joining on the 60-bit hash
    # rather than the trigram text also shrinks the posting payload; the
    # oracle applies the identical hash (collision odds at 2^60 ignorable).
    # explode_outer, NOT explode: plain explode makes Catalyst infer a
    # `size(shingle_set) > 0` filter (InferFiltersFromGenerate) that gets
    # pushed below the repartition to the scan, re-running the whole
    # tokenize→shingle expression per row at scan parallelism — measured
    # 2× the entire stage.  outer + null-filter is semantically identical
    # here and cannot be pushed below the Generate.
    flat = (
        sh.select(
            "doc_id", "block", "set_size", F.explode_outer("shingle_set").alias("shingle")
        )
        .filter(F.col("shingle").isNotNull())
        .select("doc_id", "block", "set_size", hash64(F.col("shingle")).alias("sh_h"))
    )
    buckets = (
        flat.groupBy("block", "sh_h")
        .agg(F.collect_list(F.struct("doc_id", "set_size")).alias("ds"))
        .filter(F.size("ds") > 1)
        .select(F.array_sort("ds").alias("ds"))  # doc_a < doc_b by construction
    )
    pair_arrays = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda y: F.struct(
                    x["doc_id"].alias("doc_a"),
                    x["set_size"].alias("size_a"),
                    y["doc_id"].alias("doc_b"),
                    y["set_size"].alias("size_b"),
                ),
            ),
        )
    )
    # explode_outer for the same reason as `flat` above: the inferred
    # size()>0 filter would re-enumerate every bucket's pair array twice.
    return (
        buckets.select(F.explode_outer(pair_arrays).alias("p"))
        .filter(F.col("p").isNotNull())
        .select("p.*")
        .groupBy("doc_a", "doc_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )


def with_subset_dupes(documents: DataFrame) -> DataFrame:
    """Corpus ∪ HALF-COPIES of every 13th doc (id+2_000_000, first half
    of the tokens): the contained-document case — a quote, excerpt, or
    truncated re-crawl whose shingle set is a SUBSET of its source's.
    Containment(half → full) = 1.0 while Jaccard ≈ 0.5 sits far below
    any near-dup threshold; this plant is what separates the two
    detectors."""
    tok = tokens(F.col("text"))
    half = (
        documents.filter(F.col("doc_id") % 13 == 0)
        .withColumn("doc_id", F.col("doc_id") + 2_000_000)
        .withColumn(
            "text",
            F.array_join(
                F.slice(
                    tok, 1, F.greatest(F.floor(F.size(tok) / 2), F.lit(1)).cast("int")
                ),
                " ",
            ),
        )
    )
    return documents.unionByName(half)


WITH_SUBSET_DUPES_SQL = f"""
    SELECT * FROM documents
    UNION ALL
    SELECT doc_id + 2000000 AS doc_id,
           array_to_string(list_slice(toks, 1, greatest(len(toks) // 2, 1)), ' ')
             AS text,
           lang, source, n_chars
    FROM (SELECT *, {tokens_sql('text')} AS toks FROM documents)
    WHERE doc_id % 13 = 0
"""


def containment_pairs(
    corpus: DataFrame, threshold: float = 0.9, block_col: str = "source"
) -> DataFrame:
    """Exact shingle-set CONTAINMENT pairs: max(|A∩B|/|A|, |A∩B|/|B|) =
    shared / min(|A|, |B|) — the asymmetric overlap that catches a
    document EMBEDDED in another (quotes, excerpts, truncated
    re-crawls), which symmetric Jaccard structurally misses: a half-doc
    inside its source scores containment 1.0 but Jaccard ≈ 0.5, below
    any near-dup cut.  Emits both measures so the separation is visible:

      ``(doc_a, doc_b, containment, jaccard)``

    Shares :func:`_shared_shingle_counts`'s bucket plan with
    ngram_jaccard_pairs (banded postings, pairs born array-side, no
    self-join of the corpus); pairs exist only for docs with ≥ 1
    shingle, so min(|A|,|B|) ≥ 1 and the division is total.
    """
    shared = _shared_shingle_counts(corpus, block_col)
    cont = F.col("shared") / F.least("size_a", "size_b")
    jac = F.col("shared") / (F.col("size_a") + F.col("size_b") - F.col("shared"))
    return (
        shared.select(
            "doc_a",
            "doc_b",
            F.round(cont, 6).alias("containment"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("containment") >= threshold)
    )


# Exact-substring dedup: window length in tokens.  Real pipelines use
# ~50 BPE tokens (Lee et al., "Deduplicating Training Data Makes
# Language Models Better"); the fixture docs are ~30 whitespace tokens,
# so 8 keeps the statistic non-degenerate while the plan is identical
# at any W.
SUBSTR_W = 8


def substring_dup_stats(corpus: DataFrame, w: int = SUBSTR_W) -> DataFrame:
    """Exact substring-duplication profile per document: every length-``w``
    token window (positional, duplicates kept — unlike shingles) is
    hashed; a window is DUPLICATED if its hash occurs ≥ 2 times anywhere
    in the corpus (other docs or elsewhere in the same doc).  Emits per
    doc the window count, duplicated-window count, and duplicated
    fraction — the signal substring-level dedup pipelines threshold on
    to drop or trim boilerplate-heavy documents.

    Scale shape: windows are hashed IN-ROW (one md5 per window, map
    side), and the corpus is never self-joined — occurrence totals come
    from two hash-partitioned aggregations over (window-hash, doc_id)
    postings, and the per-bucket doc list rides a collect_list bounded
    by the bucket's own occurrence count (a hot boilerplate window
    concentrates its postings, the same skew class as the n-gram
    posting plan).  Three exchanges of 16-byte postings total; document
    text never shuffles.  Docs shorter than ``w`` tokens have no
    windows and are absent from the output (contract shared with the
    oracle).
    """
    from kafka_go_cardinality_spark.functions import grams

    # Token and gram arrays are bound in their own projections — an
    # unbound split inside the gram lambda re-runs the regex per
    # element_at (O(tokens) per window, measured 12× slower; same
    # pathology _signature documents).  The map stage is CPU-bound
    # (one md5 per window), so spread it across all cores first.
    corpus = spread(corpus)
    flat = (
        corpus.select("doc_id", tokens(F.col("text")).alias("t"))
        .select("doc_id", grams(F.col("t"), w).alias("g"))
        # NB: single-arg lambda — transform would bind hash64's `salt`
        # parameter to the element-index column otherwise.
        .select(
            "doc_id",
            F.explode(
                F.transform(F.col("g"), lambda g: hash64(g))
            ).alias("h"),
        )
    )
    per_doc = flat.groupBy("h", "doc_id").agg(F.count(F.lit(1)).alias("k"))
    buckets = per_doc.groupBy("h").agg(
        F.sum("k").alias("tot"),
        F.collect_list(F.struct("doc_id", "k")).alias("pd"),
    )
    n_dup = F.sum(F.when(F.col("tot") >= 2, F.col("k")).otherwise(F.lit(0)))
    return (
        buckets.select(F.explode("pd").alias("p"), "tot")
        .select(F.col("p.doc_id").alias("doc_id"), F.col("p.k").alias("k"), "tot")
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_windows"),
            n_dup.alias("n_dup_windows"),
        )
        .withColumn(
            "dup_frac", F.round(F.col("n_dup_windows") / F.col("n_windows"), 6)
        )
    )


def substring_span_removal(corpus: DataFrame, w: int = SUBSTR_W) -> DataFrame:
    """Exact-substring SPAN REMOVAL accounting (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): where
    :func:`substring_dup_stats` only *profiles* duplication, this
    operator computes what the trim step would actually cut — per doc,
    the corpus-duplicated length-``w`` token windows are merged into
    maximal spans (overlapping/adjacent windows coalesce) and the doc's
    post-removal token count is reported:

      ``(doc_id, n_tokens, dup_spans, tokens_removed, clean_tokens)``

    with ``tokens_removed`` = |union of [p, p+w) over flagged window
    starts p| and ``dup_spans`` = the number of maximal merged runs.

    Scale shape: ONE corpus scan — windows are hashed in-row, postings
    ``(doc_id, pos)`` group once on the window hash (shuffle 1, 16-byte
    postings; document text never shuffles), the per-bucket dup verdict
    is array-side, and a single groupBy doc_id (shuffle 2) collects each
    doc's flagged start positions, which an in-row ``aggregate`` fold
    merges into spans — per-doc state bounded by the doc's own window
    count, the same bound every per-doc array op here carries.  No join
    back to the corpus and no branch re-computation: totals and flagged
    positions come out of the SAME doc_id aggregation.

    Interval-merge fold over the ASC-sorted start positions (0-based),
    state (end, covered, spans), init end = -1:
      - covered += (p + w) - greatest(p, end)  — w on a gap/adjacency,
        the non-overlapped suffix otherwise (sorted starts of equal
        width ⇒ end < p + w, so the increment is ≥ 1);
      - spans   += 1 iff p > end  — strictly greater: a window starting
        exactly at the previous end extends the same maximal run;
      - end      = p + w.
    The oracle computes the identical quantities as |DISTINCT covered
    positions| and lag-gap run starts — equal by definition of interval
    union.  Docs shorter than ``w`` tokens have no windows and are
    absent (contract shared with substring_dup_stats and the oracle).
    """
    from kafka_go_cardinality_spark.functions import grams

    corpus = spread(corpus)
    flat = (
        corpus.select("doc_id", tokens(F.col("text")).alias("t"))
        .select("doc_id", grams(F.col("t"), w).alias("g"))
        # posexplode_outer + null-filter, NOT posexplode: the inferred
        # size()>0 filter would be pushed below the repartition and
        # re-run tokenize→grams at scan parallelism (the pathology
        # ngram_jaccard_pairs documents).
        .select(
            "doc_id",
            F.posexplode_outer(
                F.transform(F.col("g"), lambda g: hash64(g))
            ).alias("pos", "h"),
        )
        .filter(F.col("h").isNotNull())
    )
    buckets = flat.groupBy("h").agg(
        F.collect_list(F.struct("doc_id", "pos")).alias("occ")
    )
    occ = (
        buckets.select(
            (F.size("occ") >= 2).alias("dup"), F.explode_outer("occ").alias("o")
        )
        .filter(F.col("o").isNotNull())
        .select(F.col("o.doc_id").alias("doc_id"), F.col("o.pos").alias("pos"), "dup")
    )
    # collect_list drops the NULLs of clean windows, so `ps` holds only
    # the flagged starts while count(*) still sees every window.
    per_doc = occ.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.array_sort(
            F.collect_list(F.when(F.col("dup"), F.col("pos").cast("long")))
        ).alias("ps"),
    )
    init = F.struct(
        F.lit(-1).cast("long").alias("end"),
        F.lit(0).cast("long").alias("covered"),
        F.lit(0).cast("long").alias("spans"),
    )
    merged = F.aggregate(
        F.col("ps"),
        init,
        lambda acc, p: F.struct(
            (p + w).alias("end"),
            (acc["covered"] + (p + w) - F.greatest(p, acc["end"])).alias("covered"),
            (acc["spans"] + F.when(p > acc["end"], 1).otherwise(0)).alias("spans"),
        ),
    )
    # Bind the fold ONCE — referencing `merged` per output column would
    # re-run the O(|ps|) aggregate once per reference.
    return per_doc.select(
        "doc_id", (F.col("n_windows") + (w - 1)).alias("n_tokens"), merged.alias("m")
    ).select(
        "doc_id",
        "n_tokens",
        F.col("m.spans").alias("dup_spans"),
        F.col("m.covered").alias("tokens_removed"),
        (F.col("n_tokens") - F.col("m.covered")).alias("clean_tokens"),
    )


def source_overlap(documents: DataFrame) -> DataFrame:
    """Corpus-level contamination matrix: pairwise shingle-set Jaccard
    between SOURCES (crawls/dumps/domains) — the audit every multi-source
    training mix needs before weighting sources (near-identical sources
    double-count their mass).

    Exact, not sketched, and the corpus is scanned ONCE: distinct
    (source, shingle-hash) postings collapse into per-shingle source
    lists (bucket size ≤ |sources| — constants, not data), persisted
    because both downstream reductions read them.  Source-pair common
    counts come from in-row pair enumeration over each bucket's sorted
    source array (C(|sources|, 2) structs max per row — no self-join,
    no bucket²-row blowup), set sizes from exploding the same buckets;
    both reductions shuffle rows bounded by |sources|² TOTAL.  At
    100 TB swap the exact postings for per-source theta sketches
    (operators/cardinality) when shingle volume outgrows the posting
    shuffle; the exact plan is the oracle-checkable ground truth.
    """
    # Same binding discipline as substring_dup_stats: tokens and
    # shingles each materialized before the next lambda touches them,
    # and the md5-heavy map stage spread across all cores.
    documents = spread(documents)
    # explode_OUTER + post-filter, not plain explode: Catalyst infers a
    # `size(shingles) > 0` pre-filter from a non-outer Generate and
    # pushes it below the repartition INTO THE SCAN — re-evaluating the
    # whole shingle expression at the parquet file's parallelism (one
    # task) before the spread; measured 23× slower at sf0.1.  The
    # null-filter on the exploded column cannot sink below the Generate.
    buckets = tracked_persist(
        documents.select("source", tokens(F.col("text")).alias("t"))
        .select("source", shingles(F.col("t")).alias("s"))
        .select("source", F.explode_outer("s").alias("g"))
        .filter(F.col("g").isNotNull())
        .select("source", hash64(F.col("g")).alias("h"))
        .distinct()
        .groupBy("h")
        .agg(F.array_sort(F.collect_list("source")).alias("srcs"))
    )
    sizes = (
        buckets.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("size"))
    )
    # Ordered pair enumeration in-row: for each source at index i, pair
    # it with every later source in the sorted array.
    pairs = F.flatten(
        F.transform(
            F.col("srcs"),
            lambda x, i: F.transform(
                F.slice(F.col("srcs"), i + 2, F.size(F.col("srcs"))),
                lambda y: F.struct(x.alias("source_a"), y.alias("source_b")),
            ),
        )
    )
    common = (
        buckets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.source_a").alias("source_a"),
                 F.col("p.source_b").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(
            F.broadcast(sizes.select(F.col("source").alias("source_a"),
                                     F.col("size").alias("size_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("source_b"),
                                     F.col("size").alias("size_b"))),
            "source_b",
        )
        .select(
            "source_a", "source_b", "n_common", "size_a", "size_b",
            F.round(
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def with_incremental_batch(documents: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(corpus, batch) for incremental dedup: corpus = the documents as
    they stand; batch = a new 'crawl' containing near-duplicates of
    corpus docs (every 7th doc minus its last token, id+1_000_000 — the
    with_near_dupes mutation rule) plus genuinely new docs (every 9th
    doc with its token order REVERSED, id+2_000_000 — in-order 3-gram
    shingles share almost nothing with the reversed stream, so these
    must survive the dedup)."""
    tok = tokens(F.col("text"))
    mutants = (
        documents.filter(F.col("doc_id") % 7 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
        .withColumn(
            "text",
            F.array_join(F.slice(tok, 1, F.greatest(F.size(tok) - 1, F.lit(1))), " "),
        )
    )
    fresh = (
        documents.filter(F.col("doc_id") % 9 == 0)
        .withColumn("doc_id", F.col("doc_id") + 2_000_000)
        .withColumn("text", F.array_join(F.reverse(tok), " "))
    )
    return documents, mutants.unionByName(fresh)


WITH_INCREMENTAL_BATCH_SQL = f"""
    SELECT doc_id + 1000000 AS doc_id,
           array_to_string(list_slice(toks, 1, greatest(len(toks) - 1, 1)), ' ') AS text
    FROM (SELECT *, {tokens_sql('text')} AS toks
          FROM documents)
    WHERE doc_id % 7 = 0
    UNION ALL
    SELECT doc_id + 2000000 AS doc_id,
           array_to_string(list_reverse(toks), ' ') AS text
    FROM (SELECT *, {tokens_sql('text')} AS toks
          FROM documents)
    WHERE doc_id % 9 = 0
"""


def minhash_incremental(
    corpus: DataFrame, batch: DataFrame, threshold: float = 0.8
) -> DataFrame:
    """Incremental dedup: screen a NEW batch against an EXISTING corpus
    without re-pairing the corpus against itself — the production shape
    of continuous crawl ingestion (the corpus's signature/band table is
    write-once; each new batch only joins against it).

    Per batch doc: the number of corpus docs with verified shingle
    Jaccard ≥ threshold (``n_matches``) and the keep decision
    (``is_dup``).  Candidate generation is a batch-bands ⋈ corpus-bands
    equi-join on (band, band_hash) — shuffles band keys only, never
    shingle sets; exact verification re-attaches the two shingle sets
    per CANDIDATE pair.  At 100 TB the corpus band table is the
    pre-bucketed asset and the per-batch cost scales with the batch,
    not the corpus.
    """
    sig_c = tracked_persist(_signature(corpus))
    sig_b = tracked_persist(_signature(batch))
    cands = (
        _band_frame(sig_b)
        .select(F.col("doc_id").alias("batch_id"), "band", "band_hash")
        .join(
            _band_frame(sig_c).select(
                F.col("doc_id").alias("corpus_id"), "band", "band_hash"
            ),
            ["band", "band_hash"],
        )
        .select("batch_id", "corpus_id")
        .dropDuplicates(["batch_id", "corpus_id"])
    )
    pairs = cands.join(
        sig_b.select(F.col("doc_id").alias("batch_id"),
                     F.col("shingle_set").alias("set_b")),
        "batch_id",
    ).join(
        sig_c.select(F.col("doc_id").alias("corpus_id"),
                     F.col("shingle_set").alias("set_c")),
        "corpus_id",
    )
    inter = F.size(F.array_intersect("set_b", "set_c")).cast("double")
    union = (F.size("set_b") + F.size("set_c") - inter).cast("double")
    matches = (
        pairs.select(
            "batch_id", F.round(inter / union, 6).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
        .groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )
    return (
        batch.select(F.col("doc_id"))
        .join(matches, F.col("doc_id") == F.col("batch_id"), "left")
        .select(
            "doc_id",
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
            (F.coalesce("n_matches", F.lit(0)) > 0).cast("int").alias("is_dup"),
        )
    )


# Leakage-safe split percentages: hash buckets 0..SPLIT_TEST_PCT-1 are
# test, the next SPLIT_VAL_PCT are validation, the rest train.
SPLIT_TEST_PCT = 10
SPLIT_VAL_PCT = 10


def cluster_keep_best(corpus: DataFrame) -> DataFrame:
    """Near-dup cluster REPRESENTATIVE SELECTION — the decision step a
    dedup pipeline runs after clustering: within every connected
    component of the exact n-gram pair graph, keep the single document
    with the HIGHEST quality score (C4-style heuristic, ties broken by
    the lower doc_id), instead of the arbitrary min-id doc naive dedup
    keeps.  Emits every doc with its cluster and the keep verdict:

      ``(doc_id, cluster_id, quality, keep)``

    Docs in no pair are their own singleton cluster (kept).  Selecting
    by quality rather than id is what makes dedup IMPROVE a training
    set: the retained copy of boilerplate-heavy mirror pages is the
    cleanest one, not the first-crawled one.

    Scale shape: pair generation and connected components reuse their
    operators unchanged (banded postings / pointer-jumping — see those
    docstrings); the quality score is one in-row scan; the label
    join is corpus × (docs-in-pairs) on doc_id; the keep window
    partitions by cluster_id, whose groups are near-dup components —
    bounded by duplication multiplicity, never corpus-proportional.
    """
    from pyspark.sql import Window

    from kafka_go_cardinality_spark.operators.text import quality_score

    labels = connected_components(ngram_jaccard_pairs(corpus))
    scored = quality_score(corpus).select("doc_id", "quality")
    joined = scored.join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        "quality",
    )
    # Explicit NULLS FIRST: Spark's ASC default — spelled out so the
    # oracle's (NULLS LAST by default) window is forced to match on
    # poisoned NULL-id rows.
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc_nulls_first()
    )
    return joined.withColumn("keep", F.row_number().over(w) == F.lit(1))


def leakage_safe_split(
    documents: DataFrame,
    test_pct: int = SPLIT_TEST_PCT,
    val_pct: int = SPLIT_VAL_PCT,
) -> DataFrame:
    """Dedup-aware train/val/test assignment: split by NEAR-DUP CLUSTER,
    not by document, so two near-duplicates can never land in different
    splits — the eval-contamination guard (a test doc whose near-twin
    sits in train silently inflates benchmarks, the same failure mode
    benchmark decontamination chases ACROSS corpora, here applied to
    one corpus's own split).

    Every document's split is a pure md5 function of its cluster
    REPRESENTATIVE (the component's smallest doc_id; singleton docs
    represent themselves), so membership is stable across runs,
    engines, and repartitioning, and adding a near-dup of an existing
    doc can never move the original between splits.  NULL-id docs hash
    NULL and fall to 'train' on both engines — the defined poison
    contract.

    Scale shape: the pair list and clustering reuse the dedup family's
    plans (source-blocked bucket pair enumeration, O(log diameter)
    pointer-jump CC); the representative attach is one left join
    against the cluster table (pair-participants only — tiny vs the
    corpus), and the hash split is a zero-shuffle map.

    Splits EXACTLY the corpus passed in — fixture planting
    (with_near_dupes) lives at the query layer (q_split_leakage),
    matching the q_dedup_* convention, so a direct consumer splitting a
    real corpus never receives phantom mutant doc_ids."""
    docs = documents
    clusters = connected_components(ngram_jaccard_pairs(docs))
    rep = (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_rep"),
        )
    )
    h = (
        hash64(F.col("cluster_rep").cast("string"), salt="split")
        % 100
    )
    return rep.select(
        "doc_id",
        "cluster_rep",
        F.when(h < test_pct, F.lit("test"))
        .when(h < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )
