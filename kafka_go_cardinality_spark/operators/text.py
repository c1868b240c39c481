"""[EXT E22] Text analysis over ``documents`` — the per-document scoring
pass of a training-data pipeline (absent from the reference, whose only
string op is a byte cast, /root/reference/processor/processor.go:87).

Everything is built-in JVM expressions (regex + array higher-order
functions): at 100 TB these run inside whole-stage codegen with zero
Python involvement, embarrassingly parallel, no shuffle at all — a pure
map pass over the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from kafka_go_cardinality_spark.partitioning import spread

from kafka_go_cardinality_spark.functions import fold, hash64, shingles, tokens

# A BPE-ish token regex: letter runs, digit runs, single non-alnum marks.
BPE_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  Deliberately small and fixed: the heuristic must be
# expressible identically in the oracle SQL.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "is", "in"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "es": ["el", "la", "los", "de", "y", "es", "un"],
    "fr": ["le", "la", "les", "et", "est", "un", "des"],
}


def token_stats(documents: DataFrame) -> DataFrame:
    """Whitespace + BPE-ish token counts and mean token length."""
    tok = tokens(F.col("text"))
    bpe = F.regexp_extract_all(F.col("text"), F.lit(BPE_REGEX), 0)
    total_len = F.aggregate(
        tok, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return documents.select(
        "doc_id",
        F.size(tok).alias("n_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
        F.round(total_len.cast("double") / F.size(tok), 6).alias("avg_token_len"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-overlap language ID: score = |distinct tokens ∩ stopwords|
    per language; argmax with fixed tie order (de > en > es > fr on equal
    score is avoided by deterministic comparison order below: the first
    strictly-greater language wins, ties resolve alphabetically)."""
    tok = F.array_distinct(tokens(F.col("text")))
    scores = {
        lang: F.size(
            F.array_intersect(tok, F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in STOPWORDS.items()
    }
    langs = sorted(STOPWORDS)  # alphabetical: deterministic tie-break
    out = documents.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
    )
    # recompute argmax over the materialized score columns (keeps the
    # final expression simple and mirrors the oracle's CASE chain)
    guess = F.lit("unknown")
    guess_score = F.lit(0)
    for lang in reversed(langs):
        cond = F.col(f"score_{lang}") > guess_score
        guess = F.when(cond, F.lit(lang)).otherwise(guess)
        guess_score = F.when(cond, F.col(f"score_{lang}")).otherwise(guess_score)
    return out.withColumn("guessed_lang", guess)


def quality_score(documents: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Heuristic quality signals: doc length, punctuation density,
    stopword ratio, mean token length — combined into one score.
    Mirrors the shape of C4/Gopher-style quality filters.  ``keep``
    carries extra input columns through (e.g. ``lang`` for per-language
    downstream filtering) — cheaper than a join-back on doc_id."""
    tok = tokens(F.col("text"))
    n_tok = F.size(tok)
    n_chars = F.length("text")
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit("[^a-zA-Z0-9\\s]"), 0))
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(
        F.filter(tok, lambda t: F.array_contains(en_stop, t))
    )
    # Guarded ratios: an empty or NULL document is 0.0 on every signal
    # on BOTH engines — unguarded, n_chars = 0 is an ANSI DIVIDE_BY_ZERO
    # job abort here and an inf in DuckDB (the oracles carry the same
    # CASE guards).
    punct_ratio = F.when(
        n_chars > 0, n_punct.cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(
        F.lit(0.0)
    )
    avg_tok_len = F.when(n_tok > 0, n_chars.cast("double") / n_tok).otherwise(
        F.lit(0.0)
    )
    score = (
        F.lit(0.4) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
        + F.lit(0.3)
        * F.when((avg_tok_len >= 3) & (avg_tok_len <= 10), 1.0).otherwise(0.0)
    )
    return documents.select(
        "doc_id",
        *keep,
        n_tok.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def quality_topfrac(documents: DataFrame, frac: float = 0.2) -> DataFrame:
    """Keep the top ``frac`` of documents per language by quality score —
    the RELATIVE-threshold curation filter (an absolute cutoff drifts as
    the corpus mix shifts; a per-language percentile doesn't).

    ``percent_rank`` over (lang, quality desc, doc_id) is one hash
    shuffle on lang; the tiebreak makes the cut deterministic.  Skew
    note: languages are few and huge at corpus scale, so the window
    shuffle is the two-level variant's candidate — but since only the
    RANK is needed, the scalable form at 1000 executors is one
    aggregate for per-language quality histograms, broadcast the
    cutoff, then a stateless filter (same shape as the equi-depth
    histogram query).  This operator declares the windowed form; the
    histogram-broadcast form is q_histogram_equidepth's pattern.
    """
    scored = quality_score(documents, keep=("lang",))
    w = Window.partitionBy("lang").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") <= frac)
        .select("doc_id", "lang", "quality", F.round("pr", 6).alias("pr"))
    )


def quality_domain_gate(documents: DataFrame, pct: int = 30) -> DataFrame:
    """Per-DOMAIN adaptive quality threshold — keep every doc scoring at
    or above its own source's ``pct``-th percentile, so a clean domain
    isn't gutted by a corpus-global cutoff and a dirty one isn't waved
    through.  Emits the kept docs with the threshold that admitted them:

      ``(doc_id, source, quality, thr)``

    This is the HISTOGRAM-BROADCAST form quality_topfrac's docstring
    declares as the 1000-executor scale path, implemented: scores are
    rounded to 6dp, so a (source, quality) GROUP BY is a BOUNDED
    histogram (≤ 1e6+1 distinct values per domain no matter the corpus
    size); the exact order statistic k = ceil(pct·n/100) — integer
    arithmetic ``(pct·n + 99) div 100``, no float percentile rules —
    comes from a cumulative sum over that histogram; and the cutoff
    joins back broadcast for a stateless filter.  No corpus-sized
    window sort anywhere; the only corpus-wide shuffle is the histogram
    aggregation's map-side-combined partial counts.  NULL-source docs
    drop at the inner join on both engines (SQL equi-join semantics).

    The scoring map is consumed by BOTH the histogram branch and the
    final gate join; unspread and unpersisted it ran at scan
    parallelism TWICE — the 32× probe measured 5.5× wall.  ``spread``
    restores full-core map parallelism (→ 3.0×) and ``tracked_persist``
    on the narrow (doc_id, source, quality) projection collapses the
    two branch computations into one (→ ~1.4×); the cache is released
    on the next registry query like every multi-branch intermediate.
    """
    from kafka_go_cardinality_spark.caching import tracked_persist

    documents = spread(documents)
    scored = tracked_persist(
        quality_score(documents, keep=("source",)).select(
            "doc_id", "source", "quality"
        )
    )
    hist = scored.groupBy("source", "quality").agg(F.count(F.lit(1)).alias("c"))
    w_cum = (
        Window.partitionBy("source")
        .orderBy("quality")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("source")
    cum = hist.select(
        "source",
        "quality",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    thr = (
        cum.filter(F.col("cum") >= F.expr(f"({pct} * n + 99) div 100"))
        .groupBy("source")
        .agg(F.min("quality").alias("thr"))
    )
    return (
        scored.join(F.broadcast(thr), "source")
        .filter(F.col("quality") >= F.col("thr"))
        .select("doc_id", "source", "quality", "thr")
    )


def with_dirty_text(documents: DataFrame) -> DataFrame:
    """Corpus with deterministically 'dirtied' text — the raw-crawl
    formatting noise a normalization pass exists to remove.  Every 3rd
    doc: padded, upper-cased, bang-suffixed; every remaining 5th doc:
    single spaces tripled; every remaining 7th doc: a fixed multilingual
    suffix whose case-folding DIVERGES between engines under plain
    lower() (Turkish İ, Greek final Σ — see functions.fold), so the
    normalize oracle check exercises the fold contract on every run.
    The rule is part of the query definition and is replicated verbatim
    in the oracle SQL."""
    dirty = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("  "), F.upper(F.col("text")), F.lit(" !!!")),
        )
        .when(
            F.col("doc_id") % 5 == 0,
            F.replace(F.col("text"), F.lit(" "), F.lit("   ")),
        )
        .when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" İstanbul ΣΟΦΟΣ ΑΣ Größe")),
        )
        .otherwise(F.col("text"))
    )
    return documents.withColumn("text", dirty)


WITH_DIRTY_TEXT_SQL = """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN '  ' || upper(text) || ' !!!'
                WHEN doc_id % 5 = 0 THEN replace(text, ' ', '   ')
                WHEN doc_id % 7 = 0 THEN text || ' İstanbul ΣΟΦΟΣ ΑΣ Größe'
                ELSE text END AS text,
           lang, source, n_chars
    FROM documents
"""


def normalize_text(documents: DataFrame) -> DataFrame:
    """Text normalization — the first stage of every training-data
    pipeline (case folding, punctuation strip, whitespace collapse) and
    the reason the `fingerprint` canonical key is stable across
    formatting variants.

    Pure narrow map over built-in JVM regex expressions: no shuffle, no
    Python, runs inside whole-stage codegen at scan parallelism — at
    100 TB this costs nothing beyond the scan."""
    lowered = fold(F.col("text"))
    stripped = F.regexp_replace(lowered, "[^a-z0-9\\s]", " ")
    collapsed = F.trim(F.regexp_replace(stripped, "\\s+", " "))
    return documents.select(
        "doc_id",
        F.length("text").alias("n_chars_raw"),
        collapsed.alias("norm_text"),
    ).withColumn("n_chars_norm", F.length("norm_text"))


def with_planted_contamination(documents: DataFrame, bench_mod: int = 23) -> DataFrame:
    """Corpus ∪ training docs that quote a benchmark doc verbatim behind
    filler (id+2_000_000, which must not be ≡ 0 mod bench_mod, or planted
    leaks would be classified as benchmark docs).  Stand-in for real
    test-set leakage."""
    if 2_000_000 % bench_mod == 0:
        raise ValueError(
            f"bench_mod={bench_mod} divides the planted-id offset 2_000_000; "
            "planted docs would land on the benchmark side"
        )
    quotes = documents.filter(F.col("doc_id") % bench_mod == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta filler "), F.col("text")).alias(
            "text"
        ),
        "lang",
        "source",
        "n_chars",
    )
    return documents.unionByName(quotes)


WITH_PLANTED_CONTAMINATION_SQL = """
    SELECT * FROM documents
    UNION ALL
    SELECT doc_id + 2000000 AS doc_id,
           'alpha beta gamma delta filler ' || text AS text,
           lang, source, n_chars
    FROM documents WHERE doc_id % 23 = 0
"""


def contamination(
    corpus: DataFrame,
    bench_mod: int = 23,
    n: int = 5,
    min_shared: int = 2,
) -> DataFrame:
    """Benchmark decontamination: (train doc, benchmark doc) pairs sharing
    ≥ ``min_shared`` distinct ``n``-token shingles — the GPT-3-style
    n-gram overlap check run before any training corpus ships.  The
    benchmark membership rule here is ``doc_id % bench_mod == 0`` (a
    fixture stand-in for a real benchmark suite).

    Scale plan: both sides reduce to (doc_id, shingle-hash) postings
    map-side — 8-byte hashes, never text.  A real benchmark suite is
    MB-scale against a 100 TB corpus, so its postings broadcast and the
    train postings never shuffle — but the broadcast is NOT hard-hinted:
    the fixture's ``% bench_mod`` membership makes the bench side
    corpus-proportional (1/23 of the corpus), and a hint would pin an
    executor-OOM plan at scale.  Catalyst/AQE picks broadcast by
    measured size — fixture-scale plans are pinned unchanged by
    tests/test_plans.py::test_contamination_broadcasts_bench_side."""
    # Spread the CPU-heavy tokenize/shingle/md5 map across all cores —
    # a couple of parquet files would otherwise pin it to a couple of
    # tasks (see dedup.ngram_jaccard_pairs; measured 11× on this query).
    corpus = spread(corpus)
    sh = corpus.select("doc_id", shingles(tokens(F.col("text")), n).alias("s"))
    # explode_outer: plain explode makes Catalyst infer size(s) > 0 and
    # push the whole tokenize→shingle expression down to the scan (see
    # dedup.ngram_jaccard_pairs for the measured cost).
    # Persisted: the postings feed BOTH the bench and train branches —
    # without the cache boundary the tokenize→shingle→md5 map (the
    # dominant cost) evaluates once per branch (two RoundRobin
    # exchanges in the unpersisted plan).  The cached frame is (long,
    # long) postings, far smaller than the corpus.
    from kafka_go_cardinality_spark.caching import tracked_persist

    flat = tracked_persist(
        sh.select("doc_id", F.explode_outer("s").alias("g"))
        .filter(F.col("g").isNotNull())
        .select("doc_id", hash64(F.col("g")).alias("gh"))
    )
    bench = flat.filter(F.col("doc_id") % bench_mod == 0).select(
        F.col("doc_id").alias("bench_id"), "gh"
    )
    train = flat.filter(F.col("doc_id") % bench_mod != 0).select(
        F.col("doc_id").alias("train_id"), "gh"
    )
    return (
        train.join(bench, "gh")
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase text —
    the canonical key for exact dedup across formatting variants."""
    normalized = F.regexp_replace(fold(F.trim(F.col("text"))), "\\s+", " ")
    return documents.select(
        "doc_id",
        F.md5(normalized).alias("fingerprint"),
        F.length(normalized).alias("norm_len"),
    )


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition signal: fraction of tokens that are
    repeats of an earlier token in the same document.  High
    dup_token_ratio flags boilerplate / spam for corpus filtering.

    Pure narrow map (split + array_distinct per row): no shuffle, runs
    inside whole-stage codegen at scan parallelism — at 100 TB this adds
    nothing beyond the scan itself."""
    tok = tokens(F.col("text"))
    n_tok = F.size(tok)
    n_distinct = F.size(F.array_distinct(tok))
    return documents.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        n_distinct.cast("long").alias("n_distinct_tokens"),
        F.round(
            F.lit(1.0) - n_distinct.cast("double") / n_tok, 6
        ).alias("dup_token_ratio"),
    )


def pack_sequences(
    documents: DataFrame, capacity: int = 2048, n_streams: int = 8
) -> DataFrame:
    """[EXT] LLM-pretraining sequence packing: concatenate documents into
    fixed-``capacity`` token sequences and record where each document
    lands (sequence id + offset), documents crossing sequence boundaries
    exactly as a concat-and-split tokenizer pipeline does.

    Determinism at any parallelism: documents are assigned to
    ``n_streams`` independent packing streams by ``doc_id % n_streams``
    (NOT by Spark partition — task placement is nondeterministic), and
    packed in ``doc_id`` order within a stream.  The layout is then a
    pure function of the corpus, so it is SQL-expressible (window
    cumulative sum) and oracle-checkable — and a re-run on different
    cluster sizes yields byte-identical packing.

    Scale shape: one shuffle on ``stream`` (n_streams spreads the sort;
    at 100 TB raise n_streams to O(cores) — each stream's window sort is
    independent).  The window carries only (doc_id, n_tokens), never
    text.
    """
    tok = tokens(F.col("text"))
    sized = documents.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(n_streams)).alias("stream"),
        F.size(tok).cast("long").alias("n_tokens"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("stream")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return sized.select(
        "doc_id",
        "stream",
        "n_tokens",
        F.floor(start / capacity).alias("seq_id"),
        (start % capacity).alias("seq_offset"),
    )


# PII patterns kept deliberately simple and RE2/Java-portable: the oracle
# must compile the identical pattern.
PII_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PII_PHONE_RE = "[0-9]{3}-[0-9]{4}"


def with_planted_pii(documents: DataFrame) -> DataFrame:
    """Deterministically plant PII into the fixture corpus (which has
    none): every 7th doc gets an email, every 11th a phone fragment, both
    derived from doc_id so the oracle can plant the identical strings."""
    email = F.concat(
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com"),
    )
    phone = F.concat(
        F.lit(" call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    text = F.col("text")
    text = F.when(F.col("doc_id") % 7 == 0, F.concat(text, email)).otherwise(text)
    text = F.when(F.col("doc_id") % 11 == 0, F.concat(text, phone)).otherwise(text)
    return documents.withColumn("text", text)


def pii_scrub(documents: DataFrame) -> DataFrame:
    """[EXT] PII redaction pass: count and mask emails/phones.  Pure
    regex map — JVM-side, no shuffle, embarrassingly parallel at 100 TB.
    Emails are masked before phones so digit runs inside a masked email
    can never double-match.  Returns counts + md5 of the scrubbed text
    (the text itself stays in the pipeline; the hash makes the full
    output oracle-checkable without shipping megabytes per row)."""
    n_emails = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(PII_EMAIL_RE), F.lit(0))
    )
    n_phones = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(PII_PHONE_RE), F.lit(0))
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return documents.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


def tfidf_topk(documents: DataFrame, k: int = 5) -> DataFrame:
    """[EXT] Top-k TF-IDF terms per document.

    Determinism contract: idf is quantized to integer micro-units
    (``round(ln(N/df)·1e6)``) before scoring, so scores are exact integer
    products — rankable and hash-comparable across engines regardless of
    float accumulation or libm ulp differences.  Ties break on the term.

    Scale shape: tf is one shuffle on (doc_id, term) with map-side
    combine; df is vocabulary-sized (broadcast side of the score join);
    N comes from a 1-row aggregate cross join.  The per-doc top-k is a
    window over doc_id — the same single-shuffle top-k pattern as
    grouped_topk."""
    from pyspark.sql import Window

    tok = documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = tf.join(F.broadcast(df_), "term").crossJoin(F.broadcast(n))
    idf_micro = F.round(
        F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")) * 1e6
    ).cast("long")
    scored = scored.select(
        "doc_id", "term", "tf", (F.col("tf") * idf_micro).alias("score_micro")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", "term", "tf", "score_micro", F.col("rn").cast("long").alias("rn"))
    )


def unigram_surprisal(
    documents: DataFrame, keep: tuple[str, ...] = ()
) -> DataFrame:
    """Corpus-unigram language-model scoring — the KenLM-perplexity
    stand-in of a CCNet-style quality pipeline: per document, the summed
    and mean surprisal (-ln p(token)) under the corpus's own unigram
    distribution.  Low mean surprisal ≈ common boilerplate, high ≈ rare
    noise; pipelines keep the middle.

    Determinism contract (same as tfidf_topk): per-token surprisal is
    quantized to integer micro-units ``round(ln(N/cnt)·1e6)`` BEFORE any
    aggregation, so document totals are exact integer sums — identical
    at any parallelism and engine; the mean uses integer division (both
    engines truncate positives identically), never float division.

    Scale shape: token counts are one shuffle with map-side combine into
    a vocabulary-sized frame; N is a 1-row aggregate cross join; the
    score-back join broadcasts the vocabulary (vocab ≪ corpus — at
    100 TB the vocab is GBs while the token stream is TBs, so the token
    stream never shuffles for the join); the per-doc rollup re-shuffles
    on doc_id once.
    """
    tok = documents.select(
        "doc_id", *keep, F.explode(tokens(F.col("text"))).alias("term")
    )
    vocab = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n_total"))
    nll = vocab.crossJoin(F.broadcast(total)).select(
        "term",
        F.round(
            F.log(F.col("n_total").cast("double") / F.col("cnt").cast("double"))
            * 1e6
        )
        .cast("long")
        .alias("nll_q"),
    )
    return (
        tok.join(F.broadcast(nll), "term")
        .groupBy("doc_id", *keep)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("nll_q").alias("sum_nll_q"),
        )
        .withColumn("avg_nll_q", F.expr("sum_nll_q div n_tokens"))
    )


def ccnet_buckets(documents: DataFrame) -> DataFrame:
    """CCNet-style perplexity bucketing: within each language, rank
    documents by mean unigram surprisal and split into thirds — head
    (most fluent / lowest perplexity), middle, tail.  CCNet keeps head
    and middle for pretraining; the tail is the noise bucket.

    ``ntile(3)`` over (avg_nll_q, doc_id) is the rank split: both Spark
    and DuckDB implement the standard remainder-to-leading-groups
    semantics, and the integer micro-unit score plus doc_id tie-break
    makes the full order (hence every bucket boundary) engine-exact.
    One shuffle keyed by lang for the ranking — per-language frames,
    never a global sort.
    """
    scored = unigram_surprisal(documents, keep=("lang",))
    w = Window.partitionBy("lang").orderBy("avg_nll_q", "doc_id")
    tier = F.ntile(3).over(w)
    return scored.select(
        "doc_id",
        "lang",
        "avg_nll_q",
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")), tier
        ).alias("bucket"),
    )


# Chunk size for the line-dedup stand-in: the fixture corpus is
# single-line, so fixed 3-token windows play the role CCNet/FineWeb
# lines play in real crawl text.  3 tokens over the ~31-word fixture
# vocabulary yields a realistic mix of unique and corpus-duplicated
# chunks.
CHUNK_TOKENS = 3


def _chunks(col: Column) -> Column:
    """Split a text column into consecutive CHUNK_TOKENS-token chunks
    (last one ragged), each re-joined with single spaces."""
    tok = tokens(col)
    n_chunks = F.ceil(F.size(tok) / F.lit(CHUNK_TOKENS)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(tok, i * CHUNK_TOKENS + 1, CHUNK_TOKENS)
        ),
    )


def _chunks_sql(expr: str) -> str:
    from kafka_go_cardinality_spark.functions import tokens_sql

    t = tokens_sql(expr)
    c = CHUNK_TOKENS
    return (
        f"list_transform(range(CAST(ceil(len({t}) / {c}.0) AS BIGINT)), "
        f"i -> array_to_string(({t})[(i*{c})+1:(i+1)*{c}], ' '))"
    )


def line_dedup(documents: DataFrame, min_df: int = 2) -> DataFrame:
    """CCNet/FineWeb-style duplicated-line removal, on 3-token chunks as
    the documented line stand-in (see CHUNK_TOKENS): drop every chunk
    that appears in ≥ ``min_df`` DISTINCT documents, reassemble each
    document from its surviving chunks in original order.

    This is the remove-and-reassemble shape that distinguishes line
    dedup from document dedup: boilerplate (nav bars, cookie banners)
    dies corpus-wide while the unique prose of each page survives.

    Scale shape: THREE shuffles total, each on a high-cardinality key —
    (1) chunk-keyed document-frequency count (the distinct-doc count
    combines map-side; the frame is distinct-chunks-sized), (2) the
    dup-mark join back onto the exploded rows (AQE broadcasts the dup
    side when the boilerplate set is small enough), (3) ONE doc-keyed
    aggregation computing kept-count and the reassembled text as
    conditional aggregates — no anti join, no second per-doc pass, no
    final doc join.  No step ever holds more than one document's
    chunks in a row.

    The tokenizing split is MATERIALIZED in its own projection before
    chunking: referencing ``tokens(text)`` inside the chunk lambda
    would re-run the regex split once per chunk (measured 4× on the
    explode stage) — higher-order lambdas don't share subexpressions
    with their enclosing row.
    """
    tok = documents.select("doc_id", tokens(F.col("text")).alias("tk"))
    n_chunks = F.ceil(F.size("tk") / F.lit(CHUNK_TOKENS)).cast("int")
    chunked = tok.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("tk"), i * CHUNK_TOKENS + 1, CHUNK_TOKENS)
                ),
            )
        ).alias("pos", "chunk"),
    )
    dup = (
        chunked.groupBy("chunk")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("chunk", F.lit(True).alias("is_dup"))
    )
    marked = chunked.join(dup, "chunk", "left")
    keep = F.col("is_dup").isNull()
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count(F.when(keep, 1)).alias("n_kept"),
        F.count(F.when(~keep, 1)).alias("n_removed"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(keep, F.struct("pos", "chunk")))
                ),
                lambda s: s.chunk,
            ),
        ).alias("new_text"),
    )


def line_dedup_oracle_sql(min_df: int = 2) -> str:
    return f"""
    WITH chunked AS (
      SELECT doc_id, i - 1 AS pos, c[i] AS chunk
      FROM (SELECT doc_id, {_chunks_sql('text')} AS c FROM documents),
           unnest(range(1, len(c) + 1)) AS r(i)),
    dup AS (SELECT chunk FROM chunked GROUP BY chunk
            HAVING count(DISTINCT doc_id) >= {min_df}),
    kept AS (SELECT * FROM chunked WHERE chunk NOT IN (SELECT chunk FROM dup)),
    ka AS (SELECT doc_id, count(*) AS n_kept,
                  string_agg(chunk, ' ' ORDER BY pos) AS new_text
           FROM kept GROUP BY doc_id)
    SELECT c.doc_id, count(*) AS n_chunks,
           COALESCE(any_value(ka.n_kept), 0) AS n_kept,
           count(*) - COALESCE(any_value(ka.n_kept), 0) AS n_removed,
           COALESCE(any_value(ka.new_text), '') AS new_text
    FROM chunked c LEFT JOIN ka ON c.doc_id = ka.doc_id
    GROUP BY c.doc_id
    """


def inverted_index(documents: DataFrame, min_df: int = 2) -> DataFrame:
    """Build the inverted index: token → document frequency, total term
    frequency, and the posting list (doc_id:tf, ordered by doc_id) —
    the retrieval-side primitive of a search/RAG corpus.

    Scale shape: explode to (token, doc_id) rows, ONE shuffle keyed by
    token (per-doc tf is combined map-side within each document before
    the shuffle via the two-level groupBy), then the posting list is
    assembled with an order-pinned array_sort — deterministic at any
    parallelism.  ``min_df`` drops the long unique-token tail; at
    100 TB the posting lists of ultra-common tokens are the skew risk —
    they shard naturally by adding (token, doc_id % k) sub-keys, same
    salting pattern as salted_exact_cardinality.
    """
    tf = (
        documents.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("token")
        )
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        tf.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "tf"))),
                    lambda s: F.concat_ws(":", s.doc_id, s.tf),
                ),
            ).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )


def inverted_index_oracle_sql(min_df: int = 2) -> str:
    from kafka_go_cardinality_spark.functions import tokens_sql

    return f"""
    WITH tf AS (
      SELECT token, doc_id, count(*) AS tf
      FROM (SELECT doc_id, unnest({tokens_sql('text')}) AS token
            FROM documents)
      GROUP BY 1, 2)
    SELECT token, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf,
           string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
    FROM tf GROUP BY token HAVING count(*) >= {min_df}
    """


# TextRank / PageRank geometry: damping 0.85 expressed as exact integer
# arithmetic (85/100) in micro-units so every engine computes identical
# BIGINT ranks; 5 fixed iterations (keyword scoring converges fast and a
# fixed count keeps the result oracle-expressible as unrolled SQL).
TEXTRANK_Q = 1_000_000
TEXTRANK_BASE = TEXTRANK_Q * 15 // 100
TEXTRANK_ITERS = 5


def textrank(documents: DataFrame, iters: int = TEXTRANK_ITERS) -> DataFrame:
    """TextRank keyword scoring: PageRank over the directed, weighted
    corpus bigram graph (edge src→dst weighted by adjacency count).
    No dangling-mass redistribution — the documented contract both
    engines implement identically.

    Iteration semantics (all BIGINT):
      contrib(u→v) = (r(u) * w(u,v)) div out_w(u)
      r'(v)        = 150000 + (85 * Σ contrib) div 100

    Scale shape: the corpus is touched ONCE — a single shuffle builds
    the vocab²-bounded edge frame, materialized eagerly.  Rank state
    stays a DataFrame for the whole solve — never collected, never
    embedded in the plan as a literal — and is broadcast-joined onto
    the edges each round; the round's only exchange sits ABOVE the
    partial aggregation, so it moves vocab-bounded partial sums, never
    edges.  Every round ends in an eager localCheckpoint, the
    connected_components pattern (operators/dedup.py), so lineage
    stays O(1) across iterations.  At 100 TB the cost is the bigram
    count, not the solve."""
    e, nodes = _textrank_graph(documents)
    ranks = nodes.select(
        "token", F.lit(TEXTRANK_Q).cast("long").alias("r")
    )
    for _ in range(iters):
        ranks = _textrank_round(e, nodes, ranks).localCheckpoint(eager=True)
    return ranks.select("token", F.col("r").alias("rank_q")).orderBy(
        F.col("rank_q").desc(), "token"
    )


def _textrank_graph(documents: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Collapse the corpus into the weighted bigram graph, materialized
    eagerly: ``e`` (src, dst, w, ow) and ``nodes`` (token), the
    vocabulary.  (No pre-partitioning: localCheckpoint does not carry
    output partitioning through LogicalRDD, so a repartition here would
    be a dead build-time shuffle — verified empirically; the per-round
    aggregation map-side-combines instead, see _textrank_round.)"""
    tok = tokens(F.col("text"))
    pairs = documents.select(
        F.explode(
            F.arrays_zip(
                F.slice(tok, 1, F.size(tok) - 1).alias("src"),
                F.slice(tok, 2, F.size(tok) - 1).alias("dst"),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    edges = (
        pairs.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    out_w = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    e = edges.join(out_w, "src").select("src", "dst", "w", "ow")
    # Iterations re-scan this vocab²-bounded frame; materialize it once.
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.explode(F.array("src", "dst")).alias("token"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    return e, nodes


def _textrank_round(e: DataFrame, nodes: DataFrame, ranks: DataFrame) -> DataFrame:
    """One PageRank round as a pure plan (no checkpoint): ranks broadcast
    onto the edge frame, contributions partial-aggregated per dst BEFORE
    the exchange (the one shuffle moves ≤vocab rows per partition, never
    edges), result left-joined back onto the node set so zero-indegree
    tokens keep the base rank.  Plan shape pinned in
    tests/test_plans.py::test_textrank_round_is_broadcast_only."""
    sums = (
        e.join(F.broadcast(ranks), e["src"] == ranks["token"])
        .groupBy("dst")
        .agg(F.sum(F.expr("(r * w) div ow")).alias("s"))
    )
    return nodes.join(
        F.broadcast(sums), nodes["token"] == sums["dst"], "left"
    ).select(
        "token",
        F.expr(f"{TEXTRANK_BASE} + (85 * coalesce(s, 0L)) div 100").alias("r"),
    )


def textrank_oracle_sql(iters: int = TEXTRANK_ITERS) -> str:
    from kafka_go_cardinality_spark.functions import tokens_sql

    t = tokens_sql("text")
    ctes = [
        f"""toks AS (SELECT {t} AS t FROM documents),
    pairs AS (SELECT t[i] AS src, t[i+1] AS dst
              FROM toks, unnest(range(1, len(t))) AS r(i)),
    edges AS (SELECT src, dst, count(*) AS w FROM pairs GROUP BY 1, 2),
    ow AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
    e AS (SELECT edges.src, edges.dst, edges.w, ow.ow
          FROM edges JOIN ow USING (src)),
    nodes AS (SELECT DISTINCT src AS node FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    r0 AS (SELECT node, CAST({TEXTRANK_Q} AS BIGINT) AS r FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""r{i} AS (
      SELECT n.node,
             CAST({TEXTRANK_BASE} + (85 * COALESCE(q.s, 0)) // 100
                  AS BIGINT) AS r
      FROM nodes n LEFT JOIN (
        SELECT e.dst, sum((r.r * e.w) // e.ow) AS s
        FROM e JOIN r{i - 1} r ON r.node = e.src
        GROUP BY e.dst) q
      ON q.dst = n.node)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node AS token, r AS rank_q FROM r{iters}"
        "\n    ORDER BY rank_q DESC, token"
    )


# Hashing-trick classifier geometry: 1024 weight buckets; the "trained"
# weight vector is a deterministic function of the bucket id (documented
# stand-in — no labeled data ships with the fixtures), so both engines
# can materialize the identical model without a side file.
HCLF_BUCKETS = 1024
HCLF_MULT = 2654435761  # Knuth multiplicative constant
HCLF_RANGE = 2001  # weights in [-1000, 1000]


def hash_classifier_scores(documents: DataFrame) -> DataFrame:
    """FastText-style linear classifier INFERENCE via the hashing trick —
    the quality-filter shape of every large-scale pretraining corpus
    pipeline (score each doc with a linear model over hashed token
    features, keep the positive class).

    Token → md5-derived 60-bit hash → weight bucket (mod 1024) → integer
    weight looked up by pure arithmetic; the doc score is the sum of its
    token weights, folded IN-ROW with ``aggregate`` over the token
    array.  No explode, no shuffle, no Python: inference is a narrow map
    over built-in expressions inside whole-stage codegen, so at 100 TB
    it costs exactly one scan at full parallelism — the same shape a
    broadcast real weight vector would have (swap the arithmetic weight
    for ``element_at(lit(weights), bucket)``).

    Integer weights make the score exact and order-independent, so the
    whole model is DuckDB-oracle-checkable — unusual for an "ML
    inference" operator.  The reference has no classification surface
    at all (its processor computes one HLL estimate,
    /root/reference/processor/processor.go:80-101).
    """
    # NULL-text docs are skipped on BOTH engines: nothing to score, and
    # one NULL floats the integer score columns at the harness boundary.
    documents = documents.filter(F.col("text").isNotNull())
    toks = tokens(F.col("text"))
    bucket = lambda t: hash64(t, salt="hclf") % HCLF_BUCKETS  # noqa: E731
    weight = lambda t: (bucket(t) * HCLF_MULT) % HCLF_RANGE - (  # noqa: E731
        HCLF_RANGE - 1
    ) // 2
    score = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + weight(t)
    )
    return documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        score.alias("score_sum"),
        (score > 0).cast("int").alias("keep"),
    )


# Vocabulary induction: table size for the frequency-rank vocab.
VOCAB_SIZE = 100


def vocab_top(documents: DataFrame, v: int = VOCAB_SIZE) -> DataFrame:
    """Tokenizer vocabulary induction (frequency-rank flavor): the top-V
    corpus tokens by occurrence count, each assigned a dense token_id in
    (count desc, token) order — the deterministic id table every
    tokenize step downstream joins against.

    Scale shape: one explode + hash aggregation for counts (map-side
    combined — the shuffle carries one row per distinct token per
    partition), then TakeOrderedAndProject for the top V (never a global
    sort of the counts), and the row_number window runs over the already
    -limited V rows — a single partition of MODEL-SIZED state, the same
    contract as a k-means centroid array.  BPE-style merge induction is
    iterative and out of scope; frequency-rank is the vocab shape used
    by classic word-level LMs and count-based filters.
    """
    counts = (
        documents.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = counts.orderBy(F.col("freq").desc(), "token").limit(v)
    w = Window.orderBy(F.col("freq").desc(), "token")
    return top.select(
        "token", "freq", F.row_number().over(w).alias("token_id")
    )


def vocab_top_oracle_sql(v: int = VOCAB_SIZE) -> str:
    from kafka_go_cardinality_spark.functions import tokens_sql

    return f"""
    WITH c AS (SELECT unnest({tokens_sql('text')}) AS token FROM documents),
    f AS (SELECT token, count(*) AS freq FROM c GROUP BY 1)
    SELECT token, freq,
           CAST(row_number() OVER (ORDER BY freq DESC, token) AS INT) AS token_id
    FROM f ORDER BY freq DESC, token LIMIT {v}
    """


ENTROPY_Q = 1_000_000


def token_entropy(documents: DataFrame) -> DataFrame:
    """Per-document Shannon ENTROPY of the in-doc word distribution, in
    integer micro-nats — the information-density quality signal that
    separates natural prose from keyword-stuffed / template / spam text
    (low entropy = few words dominate), complementary to
    repetition_stats' distinct-ratio (which can't tell "one word
    repeated" from "two words alternating"):

      ``(doc_id, n_tokens, n_distinct_tokens, entropy_q, norm_entropy)``

    with ``entropy_q`` = Σ_w floor(−(c_w/n)·ln(c_w/n)·1e6 + 0.5) and
    ``norm_entropy`` = entropy / ln(distinct) (0.0 when distinct ≤ 1,
    same guard both engines).

    Scale shape: ZERO shuffle — the word histogram is never
    materialized; the doc's token array is sorted IN-ROW and one
    ``aggregate`` fold walks the runs (a run in the sorted array IS a
    word's count), quantizing each run's term to an exact integer
    before summation.  One codegen'd scan pass at any corpus size.
    The oracle GROUPs BY (doc, word) instead — run lengths and group
    counts are the same integers, so the quantized terms are equal by
    construction.  NULL-text docs emit no row on both engines
    (chunk_documents' contract); empty/whitespace text is the single
    '' pseudo-token — one run of c = n → entropy exactly 0.
    """
    docs = documents.filter(F.col("text").isNotNull()).select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    n = F.size("t")

    def term(c):
        p = c.cast("double") / n
        return F.floor((-p) * F.log(p) * ENTROPY_Q + F.lit(0.5)).cast("long")

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("c"),
        F.lit(0).cast("long").alias("acc"),
        F.lit(0).cast("long").alias("runs"),
    )

    def step(acc, w):
        new_run = acc["prev"].isNull() | (w != acc["prev"])
        return F.struct(
            w.alias("prev"),
            F.when(new_run, F.lit(1).cast("long")).otherwise(acc["c"] + 1).alias("c"),
            F.when(
                new_run & acc["prev"].isNotNull(), acc["acc"] + term(acc["c"])
            ).otherwise(acc["acc"]).alias("acc"),
            (acc["runs"] + F.when(new_run, 1).otherwise(0)).alias("runs"),
        )

    def finish(acc):
        return F.struct(
            F.when(acc["prev"].isNotNull(), acc["acc"] + term(acc["c"]))
            .otherwise(F.lit(0).cast("long"))
            .alias("entropy_q"),
            acc["runs"].alias("n_distinct"),
        )

    folded = F.aggregate(F.array_sort("t"), init, step, finish)
    out = docs.select("doc_id", n.cast("long").alias("n_tokens"), folded.alias("f"))
    norm = F.when(
        F.col("f.n_distinct") > 1,
        F.round(
            F.col("f.entropy_q").cast("double")
            / ENTROPY_Q
            / F.log(F.col("f.n_distinct").cast("double")),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return out.select(
        "doc_id",
        "n_tokens",
        F.col("f.n_distinct").alias("n_distinct_tokens"),
        F.col("f.entropy_q").alias("entropy_q"),
        norm.alias("norm_entropy"),
    )


def token_entropy_oracle_sql() -> str:
    from kafka_go_cardinality_spark.functions import tokens_sql

    return f"""
    WITH d AS (SELECT doc_id, {tokens_sql('text')} AS t FROM documents
               WHERE text IS NOT NULL),
    tok AS (SELECT doc_id, len(t) AS n, unnest(t) AS w FROM d),
    cw AS (SELECT doc_id, n, w, count(*) AS c FROM tok GROUP BY 1, 2, 3),
    terms AS (
      SELECT doc_id, n,
             CAST(floor((-(CAST(c AS DOUBLE) / n))
                        * ln(CAST(c AS DOUBLE) / n)
                        * {ENTROPY_Q} + 0.5) AS BIGINT) AS tq
      FROM cw)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct_tokens,
           CAST(sum(tq) AS BIGINT) AS entropy_q,
           (CASE WHEN count(*) > 1
                 THEN round(CAST(sum(tq) AS DOUBLE) / {ENTROPY_Q}
                            / ln(CAST(count(*) AS DOUBLE)), 6)
                 ELSE 0.0 END) AS norm_entropy
    FROM terms GROUP BY doc_id, n
    """


COVERAGE_SIZES = (4, 16, 64)


def vocab_coverage(
    documents: DataFrame, sizes: tuple[int, ...] = COVERAGE_SIZES
) -> DataFrame:
    """Vocabulary COVERAGE CURVE / OOV-rate accounting: for each
    candidate vocab size V, the fraction of the corpus token stream a
    frequency-rank top-V vocabulary covers — the measurement a
    tokenizer-design or word-LM pipeline runs before fixing V (sizes
    span the fixture vocabulary so the curve is non-degenerate; the
    plan is size-generic):

      ``(v, vocab_words, covered_tokens, total_tokens, coverage,
         oov_rate)``

    with ``vocab_words`` = min(V, distinct words), coverage =
    covered/total (0.0 on an empty corpus, same guard both engines) and
    oov_rate its complement.

    Scale shape: same skeleton as vocab_top — ONE explode + map-side-
    combined hash aggregation for counts (the only corpus-proportional
    shuffle; a raw web vocab is billions of rows at 100 TB), then
    TakeOrderedAndProject for the top max(sizes) candidates (never a
    global sort of the counts) with the rank window over those ≤ 1024
    rows — SinglePartition on a constant-size frame only.  The total
    token count re-reads the counts aggregation through a reused
    exchange; per-V coverage is |sizes| conditional sums over the
    model-sized ranked frame, unioned and cross-joined onto the 1-row
    total.  Ties rank (count DESC, token ASC) — the deterministic total
    order the whole vocab family uses.
    """
    counts = (
        documents.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = counts.orderBy(F.col("freq").desc(), "token").limit(max(sizes))
    w = Window.orderBy(F.col("freq").desc(), "token")
    ranked = top.select("freq", F.row_number().over(w).alias("r"))
    per_v = None
    for v in sizes:
        one = ranked.filter(F.col("r") <= v).agg(
            F.lit(v).cast("long").alias("v"),
            F.count(F.lit(1)).alias("vocab_words"),
            F.coalesce(F.sum("freq"), F.lit(0)).cast("long").alias(
                "covered_tokens"
            ),
        )
        per_v = one if per_v is None else per_v.unionByName(one)
    totals = counts.agg(
        F.coalesce(F.sum("freq"), F.lit(0)).cast("long").alias("total_tokens")
    )
    cov = F.when(
        F.col("total_tokens") > 0,
        F.round(
            F.col("covered_tokens") / F.col("total_tokens").cast("double"), 6
        ),
    ).otherwise(F.lit(0.0))
    return (
        per_v.crossJoin(F.broadcast(totals))
        .withColumn("coverage", cov)
        .withColumn(
            "oov_rate",
            F.round(F.lit(1.0) - F.col("coverage"), 6),
        )
    )


def vocab_coverage_oracle_sql(sizes: tuple[int, ...] = COVERAGE_SIZES) -> str:
    from kafka_go_cardinality_spark.functions import tokens_sql

    arms = "\n      UNION ALL\n".join(
        f"""      SELECT CAST({v} AS BIGINT) AS v,
             count(*) AS vocab_words,
             CAST(coalesce(sum(freq), 0) AS BIGINT) AS covered_tokens
      FROM ranked WHERE r <= {v}"""
        for v in sizes
    )
    return f"""
    WITH tokstream AS (SELECT unnest({tokens_sql('text')}) AS token
                       FROM documents),
    counts AS (SELECT token, count(*) AS freq FROM tokstream GROUP BY 1),
    ranked AS (SELECT freq,
                      row_number() OVER (ORDER BY freq DESC, token) AS r
               FROM counts
               ORDER BY freq DESC, token LIMIT {max(sizes)}),
    tot AS (SELECT CAST(coalesce(sum(freq), 0) AS BIGINT) AS total_tokens
            FROM counts),
    per_v AS (
{arms}
    )
    SELECT v, vocab_words, covered_tokens, total_tokens,
           (CASE WHEN total_tokens > 0
                 THEN round(covered_tokens / CAST(total_tokens AS DOUBLE), 6)
                 ELSE 0.0 END) AS coverage,
           round(1.0 - (CASE WHEN total_tokens > 0
                 THEN round(covered_tokens / CAST(total_tokens AS DOUBLE), 6)
                 ELSE 0.0 END), 6) AS oov_rate
    FROM per_v CROSS JOIN tot
    """


# RAG chunking geometry: window length and stride in tokens (overlap =
# CHUNK_LEN - CHUNK_STRIDE).  Chunk starts advance by stride while they
# stay inside the document; the last chunks truncate at the end.
CHUNK_LEN = 32
CHUNK_STRIDE = 24


def chunk_documents(
    documents: DataFrame, length: int = CHUNK_LEN, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """RAG-style document chunking: overlapping fixed-length token
    windows per document — the retrieval-side preprocessing every
    embedding/RAG corpus runs.  Emits (doc_id, chunk_id, start_tok,
    n_chunk_tokens, chunk_md5); the md5 stands in for the chunk text so
    the result stays compact while remaining exactly checkable.

    Scale shape: chunk starts, slices, and hashes are all built IN-ROW
    with higher-order array functions and exploded — a pure map pass,
    zero shuffle, full scan parallelism; at 100 TB this costs one pass
    over the corpus like normalize_text.  explode_outer keeps the plan
    free of an inferred size()>0 scan filter (the DataFilters
    invariant, tests/test_plans.py).

    NULL-text docs emit NO chunks (skip-and-continue, kafkaio.go:77-81
    — mirrored as WHERE text IS NOT NULL in the oracle): unfiltered,
    Spark's null-skipping ``greatest`` built one phantom all-NULL chunk
    while DuckDB's null-ignoring ``least`` built a 32-NULL-token one —
    the round-7 poison sweep caught the divergence.  Empty/whitespace
    text keeps the corpus-wide '' pseudo-token contract: ONE chunk of
    the single empty token, identical on both engines."""
    tok = tokens(F.col("text"))
    toks = documents.filter(F.col("text").isNotNull()).select(
        "doc_id", tok.alias("t")
    )
    n = F.size(F.col("t"))
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    chunks = toks.select(
        "doc_id",
        F.posexplode_outer(
            F.transform(
                starts,
                lambda s: F.struct(
                    s.alias("start_tok"),
                    F.slice(F.col("t"), s, length).alias("w"),
                ),
            )
        ).alias("chunk_id", "c"),
    )
    return chunks.filter(F.col("c").isNotNull()).select(
        "doc_id",
        "chunk_id",
        F.col("c.start_tok").alias("start_tok"),
        F.size("c.w").cast("long").alias("n_chunk_tokens"),
        F.md5(F.array_join(F.col("c.w"), " ")).alias("chunk_md5"),
    )


def chunk_documents_oracle_sql(
    length: int = CHUNK_LEN, stride: int = CHUNK_STRIDE
) -> str:
    from kafka_go_cardinality_spark.functions import tokens_sql

    # Chunk tokens by DIRECT indexing (list_transform(range(s, ..), j ->
    # t[j])), never list_slice: DuckDB's per-row slice cost grows with
    # the FULL list length, so a 100k-token document paid O(n²/stride)
    # (11.4 s/doc measured; 0.2 s indexed — values identical).
    window = f"list_transform(range(start_tok, least(start_tok + {length}, len(t) + 1)), j -> t[j])"
    return f"""
    WITH toks AS (SELECT doc_id, {tokens_sql('text')} AS t FROM documents
                  WHERE text IS NOT NULL),
    starts AS (
      SELECT doc_id, t,
             unnest(range(1, greatest(len(t), 1) + 1, {stride})) AS start_tok,
             CAST(unnest(range(0, CAST(ceil(greatest(len(t), 1) / {stride}.0) AS BIGINT)))
                  AS BIGINT) AS chunk_id
      FROM toks)
    SELECT doc_id, chunk_id, CAST(start_tok AS BIGINT) AS start_tok,
           CAST(len({window}) AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string({window}, ' ')) AS chunk_md5
    FROM starts
    """


# Bigram association: minimum pair count and the micro-unit scale for
# the integer PMI-odds score (the ln is monotone in the ratio, so the
# exact integer ratio ranks identically and stays engine-exact).
PMI_MIN_COUNT = 3
PMI_Q = 1_000_000


def bigram_assoc(documents: DataFrame, min_count: int = PMI_MIN_COUNT) -> DataFrame:
    """Bigram association scores — the PMI-style collocation table
    word2vec/phrase-mining preprocessing builds.  score_q is the exact
    integer odds ratio in micro-units::

        score_q = (c_ab * T * 1e6) div (c_a * c_b)

    (T = total bigram tokens; monotone in PMI = ln of the same ratio,
    kept as an integer so both engines agree bit-for-bit — same
    micro-unit discipline as TextRank/unigram-NLL).

    Scale shape: one shuffle builds the vocab²-bounded bigram counts;
    left/right unigram totals derive from the SAME collapsed frame
    (vocab-sized aggregations), broadcast back onto it; T is a 1-row
    broadcast.  The corpus is touched once."""
    tok = tokens(F.col("text"))
    pairs = documents.select(
        F.explode(
            F.arrays_zip(
                F.slice(tok, 1, F.size(tok) - 1).alias("src"),
                F.slice(tok, 2, F.size(tok) - 1).alias("dst"),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    bi = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c_ab"))
    bi = bi.localCheckpoint(eager=True)  # feeds four reductions below
    c_src = bi.groupBy("src").agg(F.sum("c_ab").alias("c_a"))
    c_dst = bi.groupBy("dst").agg(F.sum("c_ab").alias("c_b"))
    total = bi.agg(F.sum("c_ab").alias("t_total"))
    return (
        bi.join(F.broadcast(c_src), "src")
        .join(F.broadcast(c_dst), "dst")
        .join(F.broadcast(total))
        .filter(F.col("c_ab") >= min_count)
        .select(
            "src",
            "dst",
            "c_ab",
            "c_a",
            "c_b",
            F.expr(f"(c_ab * t_total * {PMI_Q}) div (c_a * c_b)").alias("score_q"),
        )
    )


def bigram_assoc_oracle_sql(min_count: int = PMI_MIN_COUNT) -> str:
    from kafka_go_cardinality_spark.functions import tokens_sql

    t = tokens_sql("text")
    return f"""
    WITH toks AS (SELECT {t} AS t FROM documents),
    pairs AS (SELECT t[i] AS src, t[i+1] AS dst
              FROM toks, unnest(range(1, len(t))) AS r(i)),
    bi AS (SELECT src, dst, count(*) AS c_ab FROM pairs GROUP BY 1, 2),
    ca AS (SELECT src, sum(c_ab) AS c_a FROM bi GROUP BY 1),
    cb AS (SELECT dst, sum(c_ab) AS c_b FROM bi GROUP BY 1),
    tt AS (SELECT sum(c_ab) AS t_total FROM bi)
    SELECT bi.src, bi.dst, bi.c_ab,
           CAST(ca.c_a AS BIGINT) AS c_a, CAST(cb.c_b AS BIGINT) AS c_b,
           CAST((bi.c_ab * tt.t_total * {PMI_Q}) // (ca.c_a * cb.c_b) AS BIGINT)
             AS score_q
    FROM bi JOIN ca USING (src) JOIN cb USING (dst) CROSS JOIN tt
    WHERE bi.c_ab >= {min_count}
    """


def bigram_lm(documents: DataFrame) -> DataFrame:
    """Order-2 corpus language-model scoring — the next rung above
    :func:`unigram_surprisal` on the KenLM-perplexity ladder CCNet-style
    quality filtering actually uses: per document, the summed and mean
    surprisal of its adjacent token pairs under the corpus's own
    add-one-smoothed bigram model::

        P(w2 | w1) = (c(w1,w2) + 1) / (c(w1) + V)
        nll_q      = round(ln((c(w1) + V) / (c(w1,w2) + 1)) * 1e6)

    (V = distinct-token vocabulary size).  Per-pair surprisal is
    quantized to integer micro-units BEFORE aggregation and the mean is
    integer division — the module's engine-exactness discipline, so
    sums/means are identical at any parallelism and engine.

    Contract: docs with fewer than two tokens have no bigrams and emit
    NO row (an order-2 model cannot score them — the same
    skip-and-continue shape as grams()); NULL text likewise.  A ''
    pseudo-token participates as an ordinary vocabulary word when it
    appears inside a longer token stream.

    Scale shape: the pairs stream is an in-row zip-of-slices (no guard
    needed — ``slice(t, 2, size-1)`` is empty at size 1, and tokens()
    yields ≥1 element), exploded once per consumer.  The bigram model
    is ONE map-side-combined shuffle into a vocab²-bounded frame; the
    unigram counts and V derive from vocab-sized aggregations and
    BROADCAST onto it (vocab ≪ vocab²).  The score-back join does NOT
    broadcast the model — at 100 TB a bigram table can be GBs-to-TBs,
    so pairs and model co-shuffle on the (w1, w2) key (the price any
    engine pays for order-2 scoring without an external model file) —
    and the per-doc rollup re-shuffles on doc_id once."""
    tok = tokens(F.col("text"))
    pairs = documents.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(tok, 1, F.size(tok) - 1).alias("w1"),
                F.slice(tok, 2, F.size(tok) - 1).alias("w2"),
            )
        ).alias("e"),
    ).select("doc_id", "e.w1", "e.w2")
    uni = (
        documents.select(F.explode(tokens(F.col("text"))).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vsize = uni.agg(F.count(F.lit(1)).alias("v"))
    model = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .join(F.broadcast(uni), "w1")
        .crossJoin(F.broadcast(vsize))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (F.col("c1") + F.col("v")).cast("double")
                    / (F.col("c2") + 1).cast("double")
                )
                * 1e6
            )
            .cast("long")
            .alias("nll_q"),
        )
    )
    return (
        pairs.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("nll_q").alias("sum_nll_q"),
        )
        .withColumn("avg_nll_q", F.expr("sum_nll_q div n_bigrams"))
    )


def bigram_lm_oracle_sql() -> str:
    """DuckDB twin of :func:`bigram_lm` — same smoothing, same
    micro-unit quantization point, same truncating integer mean."""
    from kafka_go_cardinality_spark.functions import tokens_sql

    t = tokens_sql("text")
    return f"""
    WITH blm_toks AS (SELECT doc_id, {t} AS t FROM documents),
    blm_pairs AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
                  FROM blm_toks, unnest(range(1, len(t))) AS r(i)),
    blm_uni AS (SELECT w1, count(*) AS c1
                FROM (SELECT unnest(t) AS w1 FROM blm_toks) GROUP BY 1),
    blm_v AS (SELECT count(*) AS v FROM blm_uni),
    blm_model AS (
      SELECT w1, w2,
             CAST(round(ln(CAST(c1 + v AS DOUBLE) / (c2 + 1)) * 1e6)
               AS BIGINT) AS nll_q
      FROM (SELECT w1, w2, count(*) AS c2 FROM blm_pairs GROUP BY 1, 2)
      JOIN blm_uni USING (w1) CROSS JOIN blm_v)
    SELECT doc_id,
           count(*) AS n_bigrams,
           CAST(sum(nll_q) AS BIGINT) AS sum_nll_q,
           CAST(sum(nll_q) AS BIGINT) // count(*) AS avg_nll_q
    FROM blm_pairs JOIN blm_model USING (w1, w2)
    GROUP BY doc_id
    """


# DSIR-style importance weights: two hashed unigram "models" (target and
# source) whose integer bucket weights are pure arithmetic functions of
# the md5 bucket id — the documented stand-in for trained hashed-ngram
# LMs (no model files ship with the fixtures), same device as the
# hash classifier.  The log-importance proxy is the integer sum of
# per-token weight differences.
DSIR_BUCKETS = 1024
DSIR_MULT = 2654435761
DSIR_RANGE = 2001


def dsir_weights(documents: DataFrame) -> DataFrame:
    """DSIR-shaped data selection (Xie et al., "Data Selection for
    Language Models via Importance Resampling"): score each document
    with the difference of two hashed unigram models (target-domain
    minus source-domain) and keep the documents the target model
    prefers.  The deterministic arithmetic weights stand in for the two
    trained models; the SHAPE — hashed n-gram features, per-doc
    log-ratio fold, thresholded keep — is the production pipeline's.

    Zero shuffle, zero Python: token hashing and both weight lookups
    fold IN-ROW with ``aggregate`` over the token array, exactly the
    hash-classifier plan, so at 100 TB selection costs one scan."""
    # NULL-text docs skipped on both engines (see hash_classifier_scores).
    documents = documents.filter(F.col("text").isNotNull())
    toks = tokens(F.col("text"))

    def weight(t, salt: str):
        bucket = hash64(t, salt=salt) % DSIR_BUCKETS
        return (bucket * DSIR_MULT) % DSIR_RANGE - (DSIR_RANGE - 1) // 2

    ratio = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + weight(t, "dsir_tgt") - weight(t, "dsir_src"),
    )
    return documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        ratio.alias("logratio_q"),
        (ratio > 0).cast("int").alias("keep"),
    )


def dsir_weights_oracle_sql() -> str:
    from kafka_go_cardinality_spark.functions import hash64_sql, tokens_sql

    half = (DSIR_RANGE - 1) // 2

    def w(salt: str) -> str:
        b = f"({hash64_sql('x', salt=salt)} % {DSIR_BUCKETS})"
        return f"(({b} * {DSIR_MULT}) % {DSIR_RANGE} - {half})"

    return f"""
    WITH toks AS (SELECT doc_id, {tokens_sql('text')} AS t FROM documents
                  WHERE text IS NOT NULL)
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(coalesce(list_sum(list_transform(t, x ->
                {w('dsir_tgt')} - {w('dsir_src')})), 0) AS BIGINT) AS logratio_q,
           CAST(coalesce(list_sum(list_transform(t, x ->
                {w('dsir_tgt')} - {w('dsir_src')})), 0) > 0 AS INT) AS keep
    FROM toks
    """


NB_BUCKETS = 1024
NB_Q = 1_000_000


def with_planted_domain(documents: DataFrame) -> DataFrame:
    """Corpus with PLANTED in-domain marker tokens: 4 of 5 English-
    labeled docs get two marker words appended.  The raw fixture's lang
    labels are TEXT-INDEPENDENT (measured: every one of the 31 corpus
    words has en-share 0.35-0.39 — pure noise), so an unplanted
    classifier target is unlearnable by construction; the plant gives
    the in-domain class a real lexical signature while the remaining
    1-in-5 positives keep the problem non-degenerate.  Same fixture-
    planting discipline as with_near_dupes/with_planted_contamination;
    the rule is replicated in the oracle CTE."""
    marked = F.when(
        (F.col("lang") == "en") & (F.col("doc_id") % 5 != 0),
        F.concat(F.col("text"), F.lit(" qdom0 qdom1")),
    ).otherwise(F.col("text"))
    return documents.withColumn("text", marked)


WITH_PLANTED_DOMAIN_SQL = """
    SELECT doc_id,
           (CASE WHEN lang = 'en' AND doc_id % 5 != 0
                 THEN text || ' qdom0 qdom1' ELSE text END) AS text,
           lang, source, n_chars
    FROM documents
"""


def nb_classifier(documents: DataFrame) -> DataFrame:
    """TRAINED naive-Bayes domain classifier, corpus-trained and
    corpus-applied in one plan — the self-supervised quality/domain
    scorer one rung above hash_classifier_scores' fixed arithmetic
    weights: multinomial NB over 1024 hashed unigram buckets, target
    class = English-labeled docs (the in-domain proxy, DSIR's framing),
    Laplace-smoothed log-likelihood ratios in integer micro-units:

      ``(doc_id, labeled_en, n_tokens, score_q, pred_en)``

    with score = prior + Σ_tok llr[bucket(tok)] and pred = score > 0.

    Cross-engine exactness: bucket counts are exact integers, both
    engines evaluate the SAME ln expression on the same
    exactly-representable ratios (the unigram_nll precedent), and the
    quantized llr/prior are exact longs from there on — so scores
    hash-match.

    Scale shape: TRAINING is one token-stream hash aggregation into ≤
    1024 bucket rows (map-side combined; the model is
    BOUNDED-by-construction however large the corpus) + two scalar
    count rows; the llr table is computed engine-side on the 1024-row
    frame and collected as a MODEL-SIZED array (the PQ-codebook
    discipline).  APPLICATION is a zero-shuffle in-row fold — one
    1024-literal array lookup per token, the hash_classifier plan.
    The oracle applies via a bucket join instead of literals — same
    values.  NULL-text docs emit no row (the scoring-family contract);
    NULL lang is class 0 on both engines (CASE/when agree).
    """
    from kafka_go_cardinality_spark.caching import tracked_persist

    base = documents.filter(F.col("text").isNotNull())
    y = F.when(F.col("lang") == "en", 1).otherwise(0)
    toks = base.select(
        y.alias("y"), F.explode_outer(tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok").isNotNull())
    hashed = toks.select(
        "y", (hash64(F.col("tok"), salt="nb") % NB_BUCKETS).alias("b")
    )
    counts = hashed.groupBy("b").agg(
        F.sum("y").alias("c1"), F.count(F.lit(1)).alias("ct")
    )
    spark = documents.sparkSession
    full = (
        spark.range(NB_BUCKETS)
        .select(F.col("id").alias("b"))
        .join(counts, "b", "left")
        .select(
            "b",
            F.coalesce("c1", F.lit(0)).alias("c1"),
            F.coalesce("ct", F.lit(0)).alias("ct"),
        )
    )
    totals = counts.agg(
        F.coalesce(F.sum("c1"), F.lit(0)).alias("t1"),
        F.coalesce(F.sum("ct") - F.sum("c1"), F.lit(0)).alias("t0"),
        F.count(F.lit(1)).alias("v"),
    )
    # Laplace-smooth by the OBSERVED vocabulary size v, not the bucket
    # count: with T1 < T0, a fixed +1024 denominator biases every
    # token's llr by ~ -(B/T1 - B/T0) — on the fixture ~-0.02 nats/token,
    # ~-1 nat/doc, which drowned the real signal (measured: the skew
    # pushed 95% of docs negative).  v is exact on both engines.
    # greatest(·, 1): on a tokenless corpus (empty, or every text
    # empty/NULL) v == t1 == t0 == 0 and the smoothed denominators hit
    # log(1/0) — an ANSI DIVIDE_BY_ZERO abort at model build (empty-
    # corpus audit, r11) on a model that can never be APPLIED (no token
    # reaches the scoring fold; score degenerates to the prior, as the
    # oracle's bucket join does).  Whenever any token exists v ≥ 1 and
    # the clamp is a no-op, so non-degenerate values are untouched.
    llr = F.floor(
        (
            F.log(
                (F.col("c1") + 1).cast("double")
                / F.greatest(F.col("t1") + F.col("v"), F.lit(1))
            )
            - F.log(
                (F.col("ct") - F.col("c1") + 1).cast("double")
                / F.greatest(F.col("t0") + F.col("v"), F.lit(1))
            )
        )
        * NB_Q
        + F.lit(0.5)
    ).cast("long")
    model_rows = (
        full.crossJoin(F.broadcast(totals))
        .select("b", llr.alias("llr_q"))
        .collect()
    )
    llr_by_bucket = {r["b"]: r["llr_q"] for r in model_rows}
    llr_arr = F.array(
        *[F.lit(int(llr_by_bucket[i])) for i in range(NB_BUCKETS)]
    )
    d1 = base.filter(F.col("lang") == "en").count()
    d0 = base.count() - d1
    # The prior is computed ENGINE-side (F.log over exact-int literals)
    # so no Python-libm double ever enters the result.
    tok_col = tokens(F.col("text"))
    score = F.aggregate(
        tok_col,
        F.floor(
            F.log(F.lit(float(d1 + 1)) / F.lit(float(d0 + 1))) * NB_Q
            + F.lit(0.5)
        ).cast("long"),
        lambda acc, t: acc
        + F.element_at(llr_arr, (hash64(t, salt="nb") % NB_BUCKETS + 1).cast("int")),
    )
    return base.select(
        "doc_id",
        y.cast("int").alias("labeled_en"),
        F.size(tok_col).cast("long").alias("n_tokens"),
        score.alias("score_q"),
        (score > 0).cast("int").alias("pred_en"),
    )


def nb_classifier_oracle_sql() -> str:
    from kafka_go_cardinality_spark.functions import hash64_sql, tokens_sql

    b_of = f"({hash64_sql('x', salt='nb')} % {NB_BUCKETS})"
    return f"""
    WITH corpus AS ({WITH_PLANTED_DOMAIN_SQL}),
    base AS (SELECT doc_id, lang, {tokens_sql('text')} AS t
             FROM corpus WHERE text IS NOT NULL),
    toks AS (SELECT (CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS y,
                    unnest(list_transform(t, x -> {b_of})) AS b
             FROM base),
    counts AS (SELECT b, sum(y) AS c1, count(*) AS ct FROM toks GROUP BY 1),
    allb AS (
      SELECT r.b, coalesce(c.c1, 0) AS c1, coalesce(c.ct, 0) AS ct
      FROM (SELECT unnest(range({NB_BUCKETS})) AS b) r
      LEFT JOIN counts c USING (b)),
    tot AS (SELECT coalesce(sum(c1), 0) AS t1,
                   coalesce(sum(ct) - sum(c1), 0) AS t0,
                   count(*) AS v
            FROM counts),
    model AS (
      SELECT b,
             CAST(floor((ln(CAST(c1 + 1 AS DOUBLE) / (t1 + v))
                       - ln(CAST(ct - c1 + 1 AS DOUBLE) / (t0 + v)))
                        * {NB_Q} + 0.5) AS BIGINT) AS llr_q
      FROM allb CROSS JOIN tot),
    dc AS (SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS d1,
                  sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS d0
           FROM base),
    prior AS (SELECT CAST(floor(ln(CAST(d1 + 1 AS DOUBLE)
                                   / CAST(d0 + 1 AS DOUBLE))
                                * {NB_Q} + 0.5) AS BIGINT) AS prior_q
              FROM dc),
    -- apply IN-ROW against the model as an array (mirrors the engine's
    -- 1024-literal fold): a stream/join/group-by-doc_id apply would
    -- MERGE duplicate doc_ids that the engine scores per physical row
    marr AS (SELECT list(llr_q ORDER BY b) AS arr FROM model)
    SELECT doc_id,
           (CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS labeled_en,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(list_sum(list_transform(t, x -> arr[{b_of} + 1]))
                + prior_q AS BIGINT) AS score_q,
           CAST((list_sum(list_transform(t, x -> arr[{b_of} + 1]))
                 + prior_q) > 0 AS INT) AS pred_en
    FROM base CROSS JOIN marr CROSS JOIN prior
    """


DSIR_SAMPLE_K = 64
DSIR_TEMP = 1000.0
DSIR_GUMBEL_M = 1_048_576  # 2^20 uniform grid for the hash-derived u


def dsir_gumbel_sample(documents: DataFrame, k: int = DSIR_SAMPLE_K) -> DataFrame:
    """The RESAMPLING step of DSIR (Xie et al.): draw ``k`` documents
    with probability ∝ exp(logratio/T) via the GUMBEL-TOP-K trick —
    ``key = logratio/T + g`` with ``g = −ln(−ln(u))`` and the top-k by
    key being exactly a weighted sample-without-replacement.
    dsir_weights scores; this draws — thresholded keep (its ``keep``
    bit) over-selects whole modes, importance RESAMPLING preserves the
    target distribution's shape.

      ``(sel_rank, doc_id, logratio_q, key)``

    Deterministic and fully oracled: ``u`` comes from the md5 hash
    (``(h mod 2^20 + 0.5) / 2^20`` — never 0 or 1, so both logs are
    finite), every float step is the same double expression on both
    engines, and ties break on doc_id.  Scale shape: dsir_weights'
    zero-shuffle scan plus ONE TakeOrderedAndProject for the top-k —
    never a global sort; the rank window runs over the k-row frame
    only (model-sized SinglePartition, the vocab_top contract).
    """
    # spread first: the per-token double-md5 scoring fold dominates and
    # would otherwise run at scan parallelism — the 32x probe measured
    # 4.3x wall from a couple of parquet-file tasks.
    scored = dsir_weights(spread(documents)).select("doc_id", "logratio_q")
    u = (
        (hash64(F.col("doc_id").cast("string"), salt="dsir_gumbel")
         % DSIR_GUMBEL_M).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(DSIR_GUMBEL_M))
    g = -F.log(-F.log(u))
    key = F.col("logratio_q").cast("double") / F.lit(DSIR_TEMP) + g
    top = (
        scored.select("doc_id", "logratio_q", F.round(key, 6).alias("key"))
        .orderBy(F.col("key").desc(), "doc_id")
        .limit(k)
    )
    w = Window.orderBy(F.col("key").desc(), "doc_id")
    return top.select(
        F.row_number().over(w).alias("sel_rank"),
        "doc_id",
        "logratio_q",
        "key",
    )


def dsir_gumbel_oracle_sql(k: int = DSIR_SAMPLE_K) -> str:
    from kafka_go_cardinality_spark.functions import hash64_sql, tokens_sql

    half = (DSIR_RANGE - 1) // 2

    def w(salt: str) -> str:
        b = f"({hash64_sql('x', salt=salt)} % {DSIR_BUCKETS})"
        return f"(({b} * {DSIR_MULT}) % {DSIR_RANGE} - {half})"

    u = (
        f"((CAST({hash64_sql('CAST(doc_id AS VARCHAR)', salt='dsir_gumbel')} "
        f"% {DSIR_GUMBEL_M} AS DOUBLE) + 0.5) / {float(DSIR_GUMBEL_M)})"
    )
    return f"""
    WITH toks AS (SELECT doc_id, {tokens_sql('text')} AS t FROM documents
                  WHERE text IS NOT NULL),
    scored AS (
      SELECT doc_id,
             CAST(coalesce(list_sum(list_transform(t, x ->
                  {w('dsir_tgt')} - {w('dsir_src')})), 0) AS BIGINT)
               AS logratio_q
      FROM toks),
    keyed AS (
      SELECT doc_id, logratio_q,
             round(CAST(logratio_q AS DOUBLE) / {DSIR_TEMP}
                   + (-ln(-ln({u}))), 6) AS key
      FROM scored),
    top AS (SELECT * FROM keyed ORDER BY key DESC, doc_id LIMIT {k})
    SELECT CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS INT)
             AS sel_rank,
           doc_id, logratio_q, key
    FROM top
    """


# Winnowing (Schleimer, Wilkerson, Aiken — "Winnowing: Local Algorithms
# for Document Fingerprinting", SIGMOD 2003): hash every k-token gram,
# slide a w-hash window, keep each window's MINIMUM hash.  Guarantees a
# shared fingerprint for any match of length >= w + k - 1 tokens while
# storing only ~2/(w+1) of the gram hashes — the rolling-hash
# fingerprinting scheme plagiarism/overlap detectors (MOSS) use.
WINNOW_K = 4  # gram width in tokens
WINNOW_W = 5  # window of consecutive gram hashes


def winnow_fingerprints(
    documents: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """[EXT] Per-document winnowing fingerprint set.

    Entirely IN-ROW (tokenize → gram hash → windowed min → distinct):
    a pure map pass with zero shuffle — at 100 TB it adds nothing
    beyond the scan, and the fingerprint set it emits is ~2/(w+1) the
    size of the gram list, which is the whole point of winnowing over
    plain shingle postings.  Arrays are bound in their own projections
    (the per-element lambda re-evaluation discipline _signature
    documents), and sub-(k+w-1)-token docs yield an EMPTY fingerprint
    list, never an error (grams() short-doc contract)."""
    from kafka_go_cardinality_spark.functions import grams

    d = documents.select("doc_id", tokens(F.col("text")).alias("t"))
    d = d.select("doc_id", grams(F.col("t"), k).alias("g"))
    d = d.select(
        "doc_id", F.transform(F.col("g"), lambda s: hash64(s)).alias("gh")
    )
    idx = F.sequence(F.lit(1), F.size("gh") - (w - 1))
    win_min = F.transform(
        idx, lambda i: F.array_min(F.slice(F.col("gh"), i, w))
    )
    fps = (
        F.when(F.size("gh") >= w, F.array_distinct(win_min))
        .otherwise(F.array().cast("array<bigint>"))
    )
    return d.select("doc_id", fps.alias("fps"))


def winnow_pairs(
    documents: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = 2,
) -> DataFrame:
    """[EXT] Document pairs sharing >= ``min_shared`` winnowing
    fingerprints — overlap detection at fingerprint (not shingle) cost.

    Scale shape mirrors ngram_jaccard_pairs' posting-bucket plan but
    over the winnowed ~2/(w+1) subset: group postings by fingerprint,
    enumerate ordered pairs IN-ROW from each bucket's sorted doc array
    (no posting self-join), then count shared fingerprints per pair.
    The shuffle carries (fingerprint, doc_id) longs only."""
    fps = winnow_fingerprints(documents, k, w)
    # explode_outer + null-filter: plain explode infers size(fps) > 0
    # and pushes the whole fingerprint expression into the scan (the
    # measured pathology ngram_jaccard_pairs documents).
    flat = (
        fps.select("doc_id", F.explode_outer("fps").alias("fp"))
        .filter(F.col("fp").isNotNull())
    )
    buckets = (
        flat.groupBy("fp")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") > 1)
        .select("ds")
    )
    pair_arrays = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode_outer(pair_arrays).alias("p"))
        .filter(F.col("p").isNotNull())
        .select("p.*")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# BM25 (Robertson/Spärck Jones; the Lucene "+1 inside the log" idf
# variant, which keeps idf positive even for terms in over half the
# corpus — with a small fixture vocabulary every query term is that
# common).  Scores are quantized to integer micro-units per term before
# the cross-term sum, the same cross-engine determinism contract
# tfidf_topk established.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("join", "window", "scan")
BM25_TOPK = 20


def bm25_topk(
    documents: DataFrame,
    terms: tuple[str, ...] = BM25_TERMS,
    k: int = BM25_TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """[EXT] BM25 top-k retrieval for a fixed query term set.

    Scale shape: per-term tf and doc length are computed IN-ROW
    (``size(filter(tokens, = term))`` — no token explode, no (doc,
    term) shuffle for a |Q|-term query), corpus statistics (N, Σdl,
    per-term df) are ONE single-row aggregate broadcast back, scoring
    is map-side, and the top-k is a TakeOrdered — the fact table is
    scanned once and never shuffled.  Contrast tfidf_topk, which must
    explode because its term set is the whole vocabulary.

    Determinism: idf is ln-based but quantized to integer micro-units
    per term; the remaining arithmetic is IEEE mul/div in a fixed
    parenthesization replicated exactly in the oracle SQL, and the
    final per-term score is rounded to an integer before the sum —
    order-free.

    NULL-text docs are excluded up front (mirrored in the oracle's
    WHERE): a NULL text makes every tf_i NULL, and Spark's
    NULL-absorbing arithmetic would yield NULL n_hit/score while the
    oracle's CASE WHEN counts 0 — a divergence whenever such a row
    reaches the top-k (corpus with fewer than k scored docs)."""
    d = documents.filter(F.col("text").isNotNull()).select(
        "doc_id", tokens(F.col("text")).alias("t")
    )

    def _eq(term: str):
        # NB: single-arg lambda — a second parameter (even defaulted)
        # would be bound to the element INDEX by Spark's HOF arity rule.
        return lambda x: x == F.lit(term)

    tf_cols = [
        F.size(F.filter(F.col("t"), _eq(tm))).alias(f"tf_{i}")
        for i, tm in enumerate(terms)
    ]
    base = d.select("doc_id", F.size("t").alias("dl"), *tf_cols)
    consts = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("dl_sum"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(consts))
    avgdl = F.col("dl_sum").cast("double") / F.col("n_docs").cast("double")

    def term_score(i: int):
        tf = F.col(f"tf_{i}").cast("double")
        df = F.col(f"df_{i}").cast("double")
        idf_micro = F.round(
            F.log(
                (F.col("n_docs").cast("double") - df + 0.5) / (df + 0.5) + 1.0
            )
            * 1e6
        ).cast("long")
        denom = tf + k1 * ((1.0 - b) + b * (F.col("dl").cast("double") / avgdl))
        return F.round(
            idf_micro.cast("double") * ((tf * (k1 + 1.0)) / denom)
        ).cast("long")

    score = term_score(0)
    for i in range(1, len(terms)):
        score = score + term_score(i)
    n_hit = sum(
        (F.col(f"tf_{i}") > 0).cast("int") for i in range(len(terms))
    ).cast("long")
    # No n_hit > 0 pre-filter: the predicate's higher-order tf
    # expressions would be pushed into the scan's DataFilters and the
    # whole tokenize pass would evaluate TWICE per row (the banned
    # pathology test_no_higher_order_expressions_in_scan_datafilters
    # pins).  TakeOrdered ranks zero-score docs last at no extra cost;
    # they can only surface when the corpus has fewer than k hits, and
    # n_hit in the output lets consumers drop them.
    return (
        scored.select(
            "doc_id",
            F.col("dl").cast("long").alias("dl"),
            n_hit.alias("n_hit"),
            score.alias("score_micro"),
        )
        .orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(k)
    )



# --------------------------------------------------- training-data packing

# Tokens per packed training example and doc_id-range buckets for the
# distributed prefix sum (same decomposition as relational.global_enumerate).
PACK_SEQ_LEN = 128
PACK_BUCKETS = 64


def seq_pack(documents: DataFrame, seq_len: int = PACK_SEQ_LEN,
             n_buckets: int | None = None) -> DataFrame:
    """Concat-and-chunk sequence packing — the LLM-pretraining writer
    step: tokenize every document, concatenate the token streams in
    doc_id order, and cut the global stream into fixed ``seq_len``
    training examples.  Returns one row per example: how many documents
    it spans, how many tokens it holds (== seq_len except the tail),
    and the first/last doc_id feeding it — the manifest a packed-
    sequence writer emits alongside the shards.

    NULL-id docs are skipped (no stable position in the stream) and
    NULL/whitespace-only docs contribute zero tokens — the reference's
    skip-and-continue policy (kafkaio.go:77-81) applied to packing.

    Scale shape: the global token-offset prefix sum NEVER runs a
    single-partition window over the corpus.  doc_id's min/max (1-row
    broadcast) split the id range into ``n_buckets`` order-preserving
    buckets via exact integer arithmetic; per-bucket token totals make
    an ≤n_buckets-row cumulative frame (constant at ANY scale), and
    each doc's offset = its bucket's offset + a bucket-local running
    sum.  The doc→example explode is bounded by cnt/seq_len + 1 rows
    per doc (output-proportional, never quadratic), and ONE hash
    exchange on example_id builds the manifest.

    ``n_buckets=None`` (the default) derives
    max(PACK_BUCKETS, defaultParallelism) — bucket counts are
    result-independent (any order-preserving range split yields the
    identical offsets), so the decomposition widens with the cluster
    (partitioning.scaled_fanout, round-7 verdict item 1).
    """
    from kafka_go_cardinality_spark.partitioning import session_fanout

    if n_buckets is None:
        n_buckets = session_fanout(documents, PACK_BUCKETS)
    d = (
        documents.filter(F.col("doc_id").isNotNull())
        .select(
            "doc_id",
            F.when(
                F.col("text").isNull() | (F.trim("text") == ""), F.lit(0)
            )
            .otherwise(F.size(tokens(F.col("text"))))
            .cast("long")
            .alias("cnt"),
        )
    )
    return _pack_manifest(d, seq_len, n_buckets)


def _pack_manifest(
    d: DataFrame, seq_len: int, n_buckets: int
) -> DataFrame:
    """The packing arithmetic behind :func:`seq_pack`, over ANY
    (doc_id, cnt) frame — cnt is whatever token count the caller's
    tokenizer produced (whitespace words for seq_pack, BPE tokens for
    seq_pack_bpe).  Same bucket-decomposed distributed prefix sum, same
    (doc_id, cnt) total order, same output manifest schema."""
    stats = d.agg(F.min("doc_id").alias("dmin"), F.max("doc_id").alias("dmax"))
    # Width-first bucket arithmetic: (doc_id - dmin) * n_buckets would
    # overflow BIGINT (ANSI job abort) whenever the id span exceeds
    # ~2^57 — e.g. sparse snowflake-style 63-bit ids.  Dividing by the
    # bucket width instead stays in range for ANY id span, and the
    # width's +1 guarantees span/width < n_buckets so buckets stay in
    # [0, n_buckets).  Bucket boundaries shift vs the multiply form,
    # but any order-preserving range split yields identical offsets.
    bucketed = d.crossJoin(F.broadcast(stats)).withColumn(
        "bucket",
        F.expr(
            "CAST((doc_id - dmin) div"
            f" (((dmax - dmin) div {n_buckets}) + 1) AS INT)"
        ),
    )
    totals = bucketed.groupBy("bucket").agg(F.sum("cnt").alias("btot"))
    cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    # ≤ n_buckets rows: the unpartitioned window is a constant-size
    # frame, not the data.
    offsets = totals.withColumn(
        "boff", F.coalesce(F.sum("btot").over(cum), F.lit(0).cast("long"))
    ).select("bucket", "boff")
    # Stream order is (doc_id, cnt), not doc_id alone: duplicate ids
    # with DIFFERENT token counts would otherwise take engine-arbitrary
    # offsets, shifting which example a boundary-straddling row feeds.
    # Equal (doc_id, cnt) rows are interchangeable — identical
    # contribution pattern — so the order is total where it matters.
    loc = (
        Window.partitionBy("bucket")
        .orderBy("doc_id", "cnt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = (
        bucketed.join(F.broadcast(offsets), "bucket")
        .withColumn(
            "off",
            F.col("boff")
            + F.coalesce(F.sum("cnt").over(loc), F.lit(0).cast("long")),
        )
        .filter(F.col("cnt") > 0)
    )
    spans = placed.select(
        "doc_id",
        "cnt",
        "off",
        F.explode(
            F.sequence(
                F.expr(f"off div {seq_len}"),
                F.expr(f"(off + cnt - 1) div {seq_len}"),
            )
        ).alias("example_id"),
    )
    contrib = F.least(
        (F.col("example_id") + 1) * seq_len, F.col("off") + F.col("cnt")
    ) - F.greatest(F.col("example_id") * seq_len, F.col("off"))
    return (
        spans.groupBy("example_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(contrib).alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .select(
            F.col("example_id").cast("long").alias("example_id"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "first_doc",
            "last_doc",
        )
    )


# Curriculum: difficulty-range buckets for the distributed enumerate and
# the shard fan-out of the ordered corpus.
CURRICULUM_BUCKETS = 64
CURRICULUM_SHARDS = 16


def curriculum_order(
    documents: DataFrame,
    n_buckets: int | None = None,
    n_shards: int = CURRICULUM_SHARDS,
) -> DataFrame:
    """Curriculum ordering for LLM pretraining: score every document's
    difficulty (mean corpus-unigram surprisal — the
    :func:`unigram_surprisal` micro-unit score, so the order is
    engine-exact), assign each doc its global easy→hard position, and
    cut the ordered stream into ``n_shards`` contiguous shards — the
    manifest an easy-first data loader consumes.

    Scale shape: the global position NEVER runs a single-partition
    window over the corpus.  Same decomposition as
    ``relational.global_enumerate`` / :func:`seq_pack`: a 1-row min/max
    broadcast splits the score range into width-first buckets
    (overflow-safe at any score span), per-bucket counts make a
    ≤``n_buckets``-row cumulative frame, and position = bucket offset +
    bucket-local rank.  Shard = position ÷ ceil(N/n_shards), width-first
    again.  NULL-id and NULL-text docs are skipped (no stable position /
    nothing to score — the reference's skip-and-continue policy,
    kafkaio.go:77-81).  Empty/whitespace-only text folds to ONE ''
    pseudo-token on BOTH engines (split('', '\\s+') == ['']), so such
    docs ARE scored, identically (pinned by the round-7 Hypothesis
    property test).

    ``n_buckets=None`` derives max(CURRICULUM_BUCKETS,
    defaultParallelism) — positions are bucket-count-independent, so
    the split widens with the cluster (partitioning.scaled_fanout).
    """
    from kafka_go_cardinality_spark.caching import tracked_persist
    from kafka_go_cardinality_spark.partitioning import session_fanout

    if n_buckets is None:
        n_buckets = session_fanout(documents, CURRICULUM_BUCKETS)

    # The scored frame (one 3-long row per doc — corpus-count-sized,
    # never corpus-byte-sized) feeds the stats aggregate, the bucket
    # counts, AND the final join; without the cache boundary the whole
    # tokenize->vocab->score pipeline re-evaluates once per branch
    # (measured 14 exchanges -> 6 with the persist).
    scored = tracked_persist(
        unigram_surprisal(
            documents.filter(F.col("doc_id").isNotNull())
        ).select("doc_id", "avg_nll_q")
    )
    stats = scored.agg(
        F.min("avg_nll_q").alias("smin"),
        F.max("avg_nll_q").alias("smax"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    bucketed = scored.crossJoin(F.broadcast(stats)).withColumn(
        "bucket",
        F.expr(
            "CAST((avg_nll_q - smin) div"
            f" (((smax - smin) div {n_buckets}) + 1) AS INT)"
        ),
    )
    counts = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("bcnt"))
    cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    # ≤ n_buckets rows: constant-size frame, not the data.
    offsets = counts.withColumn(
        "boff", F.coalesce(F.sum("bcnt").over(cum), F.lit(0).cast("long"))
    ).select("bucket", "boff")
    local = Window.partitionBy("bucket").orderBy("avg_nll_q", "doc_id")
    return (
        bucketed.join(F.broadcast(offsets), "bucket")
        .withColumn(
            "curriculum_pos",
            F.row_number().over(local).cast("long") - 1 + F.col("boff"),
        )
        .select(
            "doc_id",
            "avg_nll_q",
            "curriculum_pos",
            F.expr(
                f"CAST(curriculum_pos div ((n_docs div {n_shards}) + 1)"
                " AS INT)"
            ).alias("shard"),
        )
    )


BUDGET_TOKENS = 8_000


def budget_select(
    documents: DataFrame,
    budget_tokens: int = BUDGET_TOKENS,
    n_buckets: int | None = None,
) -> DataFrame:
    """TOKEN-BUDGET data selection: spend a fixed training-token budget
    on the best documents — walk the corpus in (quality DESC, doc_id)
    order and keep every doc that starts before the budget is exhausted
    (the standard fill-until-exceeded greedy; the last kept doc may
    overflow).  Emits the kept docs with their position in the spend:

      ``(doc_id, quality, n_tokens, tokens_before)``

    This is the budgeting step between scoring and packing: "we can
    afford N tokens this run — which docs?".

    Scale shape: the global quality-ordered PREFIX SUM never runs a
    single-partition window — same bucket decomposition as
    curriculum_order/seq_pack, but accumulating TOKENS instead of
    counts: the 6dp quality round-trips to an exact integer key
    (floor(q·1e6 + 0.5), identical on both engines), a 1-row min/max
    broadcast splits the key range into width-first buckets, per-bucket
    token sums make a ≤n_buckets cumulative frame, and a doc's
    tokens_before = bucket token offset + bucket-local running sum.
    The filter keeps tokens_before < budget.  NULL-text docs are
    skipped on both engines (nothing to count); ties order by doc_id
    NULLS FIRST, pinned to the oracle's single-window replay.
    ``n_buckets=None`` derives from cluster parallelism
    (partitioning.scaled_fanout), like the other bucket decompositions.
    """
    from kafka_go_cardinality_spark.caching import tracked_persist
    from kafka_go_cardinality_spark.partitioning import session_fanout

    if n_buckets is None:
        n_buckets = session_fanout(documents, CURRICULUM_BUCKETS)

    scored = tracked_persist(
        quality_score(documents.filter(F.col("text").isNotNull())).select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "quality",
            # ascending integer key == quality descending: quality is a
            # 6dp-rounded double in [0, 1], so the micro-unit round-trip
            # is exact and identical on both engines.
            (
                F.lit(1_000_000)
                - F.floor(F.col("quality") * 1_000_000 + F.lit(0.5))
            ).cast("long").alias("akey"),
        )
    )
    stats = scored.agg(
        F.min("akey").alias("smin"), F.max("akey").alias("smax")
    )
    bucketed = scored.crossJoin(F.broadcast(stats)).withColumn(
        "bucket",
        F.expr(
            f"CAST((akey - smin) div (((smax - smin) div {n_buckets}) + 1)"
            " AS INT)"
        ),
    )
    toksums = bucketed.groupBy("bucket").agg(
        F.sum("n_tokens").alias("btok")
    )
    cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = toksums.withColumn(
        "boff", F.coalesce(F.sum("btok").over(cum), F.lit(0).cast("long"))
    ).select("bucket", "boff")
    local = (
        Window.partitionBy("bucket")
        .orderBy(F.col("akey"), F.col("doc_id").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        bucketed.join(F.broadcast(offsets), "bucket")
        .withColumn(
            "tokens_before",
            F.col("boff")
            + F.coalesce(F.sum("n_tokens").over(local), F.lit(0).cast("long")),
        )
        .filter(F.col("tokens_before") < budget_tokens)
        .select("doc_id", "quality", "n_tokens", "tokens_before")
    )


# BPE trainer: model-sized word-frequency seed and merge count.
BPE_TOP_WORDS = 256
BPE_MERGES = 32


def bpe_merges(
    documents: DataFrame,
    top_words: int = BPE_TOP_WORDS,
    n_merges: int = BPE_MERGES,
) -> DataFrame:
    """BPE merge-table induction — the tokenizer-training step of an LLM
    data pipeline.  Standard byte-pair-encoding trainers (the
    Sennrich et al. algorithm) operate on the WORD-FREQUENCY MODEL, not
    the raw corpus: count words once, then iteratively merge the
    most-frequent adjacent symbol pair inside the word table.  The
    corpus pays one tokenize+count shuffle into a vocabulary-sized
    frame; a TakeOrdered keeps the ``top_words`` head (driver state is
    model-sized, the same seed discipline as k-means/PQ — at 100 TB a
    min-frequency threshold plays this role), and the merge loop runs
    on that model.  Returns the ordered merge table: (rank, left,
    right, pair_count, merged).

    Determinism: seed selection orders by (count DESC, word); each
    iteration picks the (count DESC, pair ASC) argmax — no RNG, no
    scheduling dependence, so the merge table is a pure function of the
    corpus.  Empty corpus → typed empty table (the empty-model
    contract)."""
    spark = documents.sparkSession
    merges = _train_bpe(documents, top_words, n_merges)
    return spark.createDataFrame(
        merges,
        "rank int, left string, right string, pair_count long, merged string",
    )


def _train_bpe(
    documents: DataFrame, top_words: int, n_merges: int
) -> list[tuple[int, str, str, int, str]]:
    """The Sennrich trainer loop behind :func:`bpe_merges` (and the
    model source for :func:`bpe_encode`): TakeOrdered word-frequency
    seed, deterministic (count DESC, pair ASC) merges on the
    driver-side model.  Returns [(rank, left, right, pair_count,
    merged), ...]."""
    words = (
        documents.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    seed = (
        words.orderBy(F.col("cnt").desc(), "w").limit(top_words).collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in seed:
        vocab[tuple(r["w"])] = vocab.get(tuple(r["w"]), 0) + int(r["cnt"])
    merges: list[tuple[int, str, str, int, str]] = []
    for rank in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        (a, b), pc = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merged = a + b
        merges.append((rank, a, b, pc, merged))
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def _sql_str_lit(s: str) -> str:
    """Spark SQL string literal (backslash escaping is on by default;
    symbols come from corpus tokens, so escape everything that can
    break a literal)."""
    return "'%s'" % s.replace("\\", "\\\\").replace("'", "\\'")


def _bpe_apply_sql(merges, base: str) -> str:
    """Generated-SQL application of an ordered merge table to a symbol
    array expression — one left-to-right fold per merge, nested in rank
    order (same one-string-one-parse discipline as similarity._dot_sql).

    Each fold is exactly the trainer's single non-overlapping
    leftmost-first replacement pass: append x unless the accumulator's
    last symbol is `left` and x is `right`, in which case the pair
    collapses to `merged`.  Equivalence to the trainer's index loop
    holds because a merged symbol can never equal `left` (merged =
    left+right with right non-empty), so a replacement can't chain into
    the next pair within the same pass."""
    expr = base
    for _rank, a, b, _pc, m in merges:
        expr = (
            "aggregate(%s, cast(array() as array<string>), "
            "(acc, x) -> if(size(acc) > 0 AND element_at(acc, -1) = %s "
            "AND x = %s, "
            "concat(slice(acc, 1, size(acc) - 1), array(%s)), "
            "concat(acc, array(x))))"
            % (expr, _sql_str_lit(a), _sql_str_lit(b), _sql_str_lit(m))
        )
    return expr


# Sentinel code points for the DuckDB BPE oracles' symbol encoding (see
# _bpe_train_oracle_ctes).  chr(1)/chr(2) wrap every symbol.  The
# oracles are exact for any corpus whose TOKENS contain neither U+0001
# nor U+0002 (the engine side has no such restriction — these bytes
# exist only inside the oracle's internal string encoding).
_BPE_SENT_A = "chr(1)"
_BPE_SENT_B = "chr(2)"


def _bpe_wrap_sql(expr: str) -> str:
    """One sentinel-wrapped symbol: chr(1) || sym || chr(2)."""
    return f"{_BPE_SENT_A} || {expr} || {_BPE_SENT_B}"


def _bpe_train_oracle_ctes(top_words: int, n_merges: int) -> list[str]:
    """DuckDB CTE chain replaying :func:`_train_bpe` exactly — the
    in-oracle model derivation that flips the BPE family from rows-only
    to hash-checked (the q_sim_ann_ivf / q_text_textrank precedent:
    the oracle derives the iterative model itself instead of trusting
    the engine's).

    Symbolizations are SENTINEL-WRAPPED STRINGS, one wrapped symbol per
    element: ``chr(1)||sym||chr(2)`` concatenated.  That encoding makes
    ONE ``replace()`` call exactly the trainer's single leftmost
    non-overlapping merge pass: the pattern ``<a><b>`` (angle brackets
    standing for the sentinels) can only match whole symbols at symbol
    boundaries — ``<`` opens every symbol and ``>`` closes it, so ``a``
    and ``b`` cannot match prefixes/suffixes of longer symbols — and
    adjacent occurrences share no delimiter characters, so consecutive
    pairs all merge in one scan (the failure mode of single-delimiter
    encodings).  Scan-resume-after-replacement equals the trainer's
    ``i += 2``, and a replacement ``<ab>`` contains no interior ``<``,
    so it can never chain into a new match within the same pass.

    Each stage: adjacent-pair counts from the split symbol list
    (``list_zip(syms, syms[2:])``, NULL-padded tail filtered), argmax
    by (count DESC, pair ASC) — DuckDB's binary UTF-8 collation equals
    Python's code-point tuple compare — then one replace applies the
    merge to every vocab word.  ``LEFT JOIN ... ON TRUE`` keeps the
    chain total when a stage finds no pairs (the trainer's ``break``):
    the NULL merge makes ``replace`` NULL and ``coalesce`` restores the
    untouched repr, while the stage's empty best-CTE simply emits no
    merge row.  Vocab stages are MATERIALIZED: each is referenced
    twice (pairs + next vocab), and inlining would re-expand the whole
    prefix chain exponentially."""
    from kafka_go_cardinality_spark.functions import tokens_sql

    sa, sb = _BPE_SENT_A, _BPE_SENT_B
    ctes = [
        f"bpe_tok AS (SELECT unnest({tokens_sql('text')}) AS w FROM documents)",
        "bpe_wc AS MATERIALIZED "
        "(SELECT w, count(*) AS cnt FROM bpe_tok GROUP BY 1)",
        # seed = trainer's TakeOrdered (count DESC, word) head; repr wraps
        # every CODE POINT (the trainer splits Python strings)
        "bpe_v0 AS MATERIALIZED (SELECT "
        f"regexp_replace(w, '(.)', {sa} || '\\1' || {sb}, 'g') AS repr, cnt"
        f" FROM (SELECT w, cnt FROM bpe_wc ORDER BY cnt DESC, w"
        f" LIMIT {top_words}))",
    ]
    for k in range(1, n_merges + 1):
        ctes.append(
            f"bpe_p{k} AS (SELECT z[1] AS a, z[2] AS b,"
            " CAST(sum(cnt) AS BIGINT) AS pc"
            " FROM (SELECT unnest(list_zip(syms, syms[2:])) AS z, cnt"
            " FROM (SELECT string_split(substr(repr, 2,"
            f" greatest(length(repr) - 2, 0)), {sb} || {sa}) AS syms, cnt"
            f" FROM bpe_v{k-1}))"
            " WHERE z[2] IS NOT NULL GROUP BY 1, 2)"
        )
        ctes.append(
            f"bpe_b{k} AS (SELECT a, b, pc, a || b AS m FROM bpe_p{k}"
            " ORDER BY pc DESC, a, b LIMIT 1)"
        )
        ctes.append(
            f"bpe_v{k} AS MATERIALIZED (SELECT coalesce(replace(v.repr,"
            f" {_bpe_wrap_sql('b.a')} || {_bpe_wrap_sql('b.b')},"
            f" {_bpe_wrap_sql('b.m')}), v.repr) AS repr, v.cnt"
            f" FROM bpe_v{k-1} v LEFT JOIN bpe_b{k} b ON TRUE)"
        )
    return ctes


def bpe_merges_oracle_sql(
    top_words: int = BPE_TOP_WORDS, n_merges: int = BPE_MERGES
) -> str:
    """DuckDB twin of :func:`bpe_merges`: the merge table as the union
    of the per-stage argmax rows, rank-ordered.  A stage past the
    trainer's break point has an empty best-CTE and contributes no row,
    matching the trainer's truncated table."""
    ctes = _bpe_train_oracle_ctes(top_words, n_merges)
    arms = "\n    UNION ALL\n    ".join(
        f"SELECT CAST({k - 1} AS INT) AS rank, a AS \"left\","
        f" b AS \"right\", pc AS pair_count, m AS merged FROM bpe_b{k}"
        for k in range(1, n_merges + 1)
    )
    return (
        "WITH\n    " + ",\n    ".join(ctes)
        + "\n    SELECT * FROM (\n    " + arms + "\n    ) ORDER BY rank"
    )


def _bpe_counts_oracle_ctes(
    top_words: int, n_merges: int, skip_blank: bool
) -> list[str]:
    """Trainer CTEs + the apply side of :func:`_bpe_doc_counts`: distinct
    words of the (doc, word) stream, 32 chained merge replaces, per-word
    subtoken count = the number of symbol-open sentinels (floored at 1:
    ``split('', '')`` is ``['']`` on the JVM — the '' pseudo-token
    contract).

    The apply repr wraps CODE POINTS, the engine's actual symbol
    alphabet: Spark's ``split(w, '')`` is code-point-wise (verified on
    the adversarial-Unicode corpus — Deseret/emoji words symbolize per
    code point, matching DuckDB's utf8proc ``(.)`` and the Python
    trainer's ``tuple(w)``), so no surrogate special-casing is needed.
    ``skip_blank`` is the packing family's blank rule (NULL or
    ASCII-space-only text contributes nothing), identical on both
    engines because both trims strip ASCII spaces only."""
    blank = " AND trim(text) != ''" if skip_blank else ""
    from kafka_go_cardinality_spark.functions import tokens_sql

    sa, sb = _BPE_SENT_A, _BPE_SENT_B
    ctes = _bpe_train_oracle_ctes(top_words, n_merges)
    ctes.append(
        "bpe_stream AS MATERIALIZED (SELECT doc_id,"
        f" unnest({tokens_sql('text')}) AS w"
        f" FROM documents WHERE doc_id IS NOT NULL{blank})"
    )
    ctes.append(
        "bpe_e0 AS MATERIALIZED (SELECT w,"
        f" regexp_replace(w, '(.)', {sa} || '\\1' || {sb}, 'g') AS repr"
        " FROM (SELECT DISTINCT w FROM bpe_stream))"
    )
    for k in range(1, n_merges + 1):
        ctes.append(
            f"bpe_e{k} AS MATERIALIZED (SELECT w, coalesce(replace(e.repr,"
            f" {_bpe_wrap_sql('b.a')} || {_bpe_wrap_sql('b.b')},"
            f" {_bpe_wrap_sql('b.m')}), e.repr) AS repr"
            f" FROM bpe_e{k-1} e LEFT JOIN bpe_b{k} b ON TRUE)"
        )
    ctes.append(
        "bpe_wt AS (SELECT w, CAST(greatest(1,"
        f" length(repr) - length(replace(repr, {sa}, ''))) AS BIGINT)"
        f" AS n_sub FROM bpe_e{n_merges})"
    )
    return ctes


def bpe_encode_oracle_sql(
    top_words: int = BPE_TOP_WORDS, n_merges: int = BPE_MERGES
) -> str:
    """DuckDB twin of :func:`bpe_encode` (scoring family: blank docs
    count their single '' pseudo-token)."""
    ctes = _bpe_counts_oracle_ctes(top_words, n_merges, skip_blank=False)
    return (
        "WITH\n    " + ",\n    ".join(ctes) + """
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_sub) AS BIGINT) AS n_bpe_tokens
    FROM bpe_stream JOIN bpe_wt USING (w) GROUP BY doc_id"""
    )


def seq_pack_bpe_oracle_sql(
    seq_len: int = PACK_SEQ_LEN,
    top_words: int = BPE_TOP_WORDS,
    n_merges: int = BPE_MERGES,
) -> str:
    """DuckDB twin of :func:`seq_pack_bpe`: the BPE per-doc counts
    (packing family's blank rule) feeding the same single-window pack
    replay as the seq_pack oracle — the oracle doesn't need to scale,
    it needs to MATCH the bucket-decomposed engine."""
    ctes = _bpe_counts_oracle_ctes(top_words, n_merges, skip_blank=True)
    return (
        "WITH\n    " + ",\n    ".join(ctes) + f""",
    bpe_cnts AS (SELECT doc_id, CAST(sum(n_sub) AS BIGINT) AS cnt
                 FROM bpe_stream JOIN bpe_wt USING (w) GROUP BY doc_id),
    bpe_placed AS (
      SELECT doc_id, cnt,
             CAST(coalesce(sum(cnt) OVER (ORDER BY doc_id, cnt
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS off
      FROM bpe_cnts),
    bpe_spans AS (
      SELECT doc_id, cnt, off,
             unnest(generate_series(off // {seq_len},
                                    (off + cnt - 1) // {seq_len}))
               AS example_id
      FROM bpe_placed WHERE cnt > 0)
    SELECT CAST(example_id AS BIGINT) AS example_id,
           count(*) AS n_docs,
           CAST(sum(least((example_id + 1) * {seq_len}, off + cnt)
                    - greatest(example_id * {seq_len}, off)) AS BIGINT)
             AS n_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM bpe_spans GROUP BY 1"""
    )


def bpe_encode(
    documents: DataFrame,
    top_words: int = BPE_TOP_WORDS,
    n_merges: int = BPE_MERGES,
) -> DataFrame:
    """Apply the trained BPE tokenizer to the corpus — the actual
    TOKENIZATION pass of a pretraining pipeline (bpe_merges trains the
    model; this spends it): per document, word count and total BPE
    token count under the induced merge table.  The per-doc BPE token
    count is what sequence packing, cost estimation, and per-document
    length curricula consume.

    Scale shape: the merge table is a driver-side model (same
    discipline as k-means/PQ/BPE training); the 32-merge application is
    ONE generated in-row expression evaluated once per DISTINCT word —
    vocabulary-sized compute, not token-stream-sized — then the
    word→subtoken-count map broadcast-joins back to the (doc, word)
    stream (vocab ≪ corpus, the unigram_surprisal precedent) and one
    doc_id shuffle aggregates.  No Python anywhere; OOV-free by
    construction (unmerged characters remain symbols).

    Fully oracled (bpe_encode_oracle_sql replays the trainer AND the
    per-distinct-word application in DuckDB); additionally pinned in
    tests against an independent Python BPE-apply over the same merge
    table, including the '' pseudo-token edge (split('', '') == ['']
    on the JVM — one empty symbol, counted as one token; documented
    corpus-wide contract).

    Unicode note: Spark's split(w, '') is CODE-POINT-wise (verified on
    the adversarial-Unicode corpus: Deseret/emoji words keep one symbol
    per code point), matching the Python trainer's tuple(w) and the
    oracle's utf8proc '(.)' — all three symbol alphabets agree, so
    astral-plane words train and apply identically everywhere."""
    return _bpe_doc_counts(documents, top_words, n_merges).select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
    )


def _bpe_doc_counts(
    documents: DataFrame, top_words: int, n_merges: int,
    skip_blank: bool = False,
) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens) under the trained merge table —
    the shared core of bpe_encode and seq_pack_bpe (train, fold once
    per DISTINCT word, broadcast join back, one doc shuffle).

    ``skip_blank`` selects which corpus-wide contract applies to blank
    text, where "blank" is the engine-exact rule seq_pack zeroes by —
    NULL or ``trim(text) == ''`` (both engines' ``trim`` strips ASCII
    SPACES only, so a tab/newline-only doc is NOT blank: it tokenizes
    to '' pseudo-tokens on both engines and both packers count them
    identically).  The SCORING family (bpe_encode, like
    unigram_surprisal/curriculum/chunk) counts blank docs' single ''
    pseudo-token; the PACKING family (seq_pack_bpe, like seq_pack)
    packs nothing for them.

    What gets cached is chosen by SIZE, not convenience (the module's
    persist discipline: curriculum caches 3-long rows per doc,
    contamination caches integer postings): the fold output per
    DISTINCT word persists (``word_tok`` — VOCAB-sized, and the 32
    nested merge folds are the expensive expression), while the
    (doc, word) occurrence stream deliberately does NOT — it is
    corpus-byte-scale, and re-deriving it is a shuffle-free
    scan+explode (measured: pre-grouping it into (doc, word, c) pairs
    to shrink a cache costs MORE than the recompute — the extra
    pair-shuffle is real work, the tokenize is not).  The trainer
    keeps its own pass over ALL text (identical semantics to the
    registered bpe_merges query, NULL-id docs included)."""
    from kafka_go_cardinality_spark.caching import tracked_persist

    merges = _train_bpe(documents, top_words, n_merges)
    rows = documents.filter(F.col("doc_id").isNotNull())
    if skip_blank:
        rows = rows.filter(F.trim(F.col("text")) != "")
    stream = rows.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("w")
    )
    fold = _bpe_apply_sql(merges, "split(w, '')")
    word_tok = tracked_persist(
        stream.select("w")
        .distinct()
        .select("w", F.expr("size(%s)" % fold).cast("long").alias("n_sub"))
    )
    return (
        stream.join(F.broadcast(word_tok), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").alias("n_bpe_tokens"),
        )
    )


def bpe_fertility(
    documents: DataFrame,
    top_words: int = BPE_TOP_WORDS,
    n_merges: int = BPE_MERGES,
) -> DataFrame:
    """Tokenizer FERTILITY by language: BPE tokens emitted per
    whitespace word under the induced merge table, per ``lang`` — the
    cross-lingual cost/fairness audit run before fixing a tokenizer (a
    merge table trained on a mixed corpus fragments under-represented
    scripts into more subtokens; fertility is the number that shows
    it):

      ``(lang, n_docs, n_words, n_bpe_tokens, fertility)``

    with fertility = round(Σ bpe_tokens / Σ words, 6) (Σ words ≥ 1 per
    group — every doc carries at least its '' pseudo-token).

    Scale shape: everything expensive is :func:`_bpe_doc_counts`
    unchanged (driver-side merge model, vocab-sized fold per DISTINCT
    word, broadcast join, one doc shuffle); the lang join adds one
    corpus-thin (doc_id, lang) projection joined on the aggregated
    doc-level counts, then a #langs-sized aggregation.  Duplicate
    doc_ids (re-crawls) duplicate the join row identically on both
    engines — the unit of accounting is the (doc row × count) pair.
    """
    counts = _bpe_doc_counts(documents, top_words, n_merges)
    langs = documents.filter(F.col("doc_id").isNotNull()).select(
        "doc_id", "lang"
    )
    return (
        counts.join(langs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        )
        .withColumn(
            "fertility",
            F.round(
                F.col("n_bpe_tokens") / F.col("n_words").cast("double"), 6
            ),
        )
    )


def bpe_fertility_oracle_sql(
    top_words: int = BPE_TOP_WORDS, n_merges: int = BPE_MERGES
) -> str:
    """DuckDB twin of :func:`bpe_fertility` — the bpe_encode oracle's
    per-doc counts joined to (doc_id, lang) and re-aggregated."""
    ctes = _bpe_counts_oracle_ctes(top_words, n_merges, skip_blank=False)
    return (
        "WITH\n    " + ",\n    ".join(ctes) + """,
    per_doc AS (
      SELECT doc_id, count(*) AS n_words, sum(n_sub) AS n_bpe
      FROM bpe_stream JOIN bpe_wt USING (w) GROUP BY doc_id),
    langd AS (SELECT doc_id, lang FROM documents WHERE doc_id IS NOT NULL)
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS n_words,
           CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
           round(CAST(sum(n_bpe) AS DOUBLE) / CAST(sum(n_words) AS DOUBLE), 6)
             AS fertility
    FROM per_doc JOIN langd USING (doc_id)
    GROUP BY lang"""
    )


def seq_pack_bpe(
    documents: DataFrame,
    seq_len: int = PACK_SEQ_LEN,
    n_buckets: int | None = None,
    top_words: int = BPE_TOP_WORDS,
    n_merges: int = BPE_MERGES,
) -> DataFrame:
    """Sequence packing by REAL tokenizer counts — the composition a
    pretraining pipeline actually runs: train BPE (bpe_merges), count
    each document's BPE tokens (bpe_encode), cut the doc_id-ordered
    global token stream into fixed ``seq_len`` training examples
    (seq_pack's bucket-decomposed prefix sum).  seq_pack over
    whitespace words answers "how many examples of N words"; this
    answers the question the trainer bills for: examples of N BPE
    tokens.

    Contract (seq_pack's PACKING contract, not the scoring family's):
    one stream entry per DISTINCT doc_id whose cnt is the doc's total
    BPE token count; NULL-text and blank docs (trim(text) == '' —
    ASCII-space trim, the exact rule seq_pack zeroes by; tab-only docs
    are NOT blank and contribute their '' pseudo-tokens in BOTH
    packers) contribute nothing.  Docs with zero contribution never
    reach the manifest (cnt > 0 is filtered inside _pack_manifest), so
    the grouped count frame feeds the packer DIRECTLY — no distinct,
    no re-join; it is persisted because _pack_manifest's three
    branches (stats, bucket totals, placement) would otherwise each
    re-run the whole count pipeline (the curriculum_order precedent).
    Fully oracled (seq_pack_bpe_oracle_sql replays train→count→pack);
    also pinned in tests against the composed independent models
    (Python BPE-apply feeding the sequential pack model), including
    tab/newline-edge docs.  ``n_buckets=None`` derives
    max(PACK_BUCKETS, defaultParallelism) — see :func:`seq_pack`."""
    from kafka_go_cardinality_spark.caching import tracked_persist
    from kafka_go_cardinality_spark.partitioning import session_fanout

    if n_buckets is None:
        n_buckets = session_fanout(documents, PACK_BUCKETS)
    counts = tracked_persist(
        _bpe_doc_counts(
            documents, top_words, n_merges, skip_blank=True
        ).select("doc_id", F.col("n_bpe_tokens").cast("long").alias("cnt"))
    )
    return _pack_manifest(counts, seq_len, n_buckets)


# Shard count for the deterministic corpus shuffle.
SHUFFLE_SHARDS = 16


def shuffle_shards(documents: DataFrame, n_shards: int = SHUFFLE_SHARDS) -> DataFrame:
    """Seeded deterministic corpus shuffle + sharding — the "globally
    shuffle the training set and write N shards" step.  Every doc gets
    a reproducible md5-derived sort key; shard = key mod n_shards and
    position-in-shard = rank of the key within the shard.  Reading the
    shards in (shard, pos) order replays one fixed pseudorandom
    permutation of the corpus — byte-identical across engines, runs,
    and cluster sizes, unlike rand()-based shuffles.

    Scale shape: NO global total order is materialized — that is the
    point.  The key assignment is a zero-shuffle map; ONE hash exchange
    on shard co-locates each shard, and the rank window is
    partition-local sort within a shard (exactly the sort a shard
    writer performs anyway).  Shards are hash-balanced (±O(√(n/N))), so
    no shard becomes a straggler at 100 TB.
    """
    keyed = (
        documents.filter(F.col("doc_id").isNotNull())
        .select(
            "doc_id",
            hash64(F.col("doc_id").cast("string"), salt="shuffle").alias(
                "skey"
            ),
        )
        .withColumn("shard", (F.col("skey") % n_shards).cast("int"))
    )
    w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    return keyed.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("int").alias("pos"),
    )
