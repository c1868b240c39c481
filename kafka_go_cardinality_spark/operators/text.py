"""[EXT E22] Text analysis over ``documents`` — the per-document scoring
pass of a training-data pipeline (absent from the reference, whose only
string op is a byte cast, /root/reference/processor/processor.go:87).

Everything is built-in JVM expressions (regex + array higher-order
functions): at 100 TB these run inside whole-stage codegen with zero
Python involvement, embarrassingly parallel, no shuffle at all — a pure
map pass over the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from kafka_go_cardinality_spark.functions import tokens

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


def quality_score(documents: DataFrame) -> DataFrame:
    """Heuristic quality signals: doc length, punctuation density,
    stopword ratio, mean token length — combined into one score.
    Mirrors the shape of C4/Gopher-style quality filters."""
    tok = tokens(F.col("text"))
    n_tok = F.size(tok)
    n_chars = F.length("text")
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit("[^a-zA-Z0-9\\s]"), 0))
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(
        F.filter(tok, lambda t: F.array_contains(en_stop, t))
    )
    punct_ratio = n_punct.cast("double") / n_chars
    stop_ratio = n_stop.cast("double") / n_tok
    avg_tok_len = n_chars.cast("double") / n_tok
    score = (
        F.lit(0.4) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
        + F.lit(0.3)
        * F.when((avg_tok_len >= 3) & (avg_tok_len <= 10), 1.0).otherwise(0.0)
    )
    return documents.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase text —
    the canonical key for exact dedup across formatting variants."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), "\\s+", " ")
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
