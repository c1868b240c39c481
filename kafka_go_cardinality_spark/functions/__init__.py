"""Shared expression helpers for the data-pipeline operators.

Each helper has a Spark Column builder and a matching DuckDB SQL fragment
builder (``*_sql``).  The pair is kept in one place so the engine query
and its oracle compute *identical* values — the cross-engine determinism
rules are:

- hashing: md5 (both engines) → first 15 hex chars → base-16 parse →
  60-bit non-negative BIGINT.  Never use engine-native hash functions
  (Spark xxhash64 ≠ DuckDB hash).
- float folds: cast float→double FIRST, accumulate sequentially in array
  order — bit-identical across engines (verified: Spark ``aggregate`` ==
  DuckDB ``list_cosine_similarity`` on DOUBLE[]).
- tokenization: ``fold(trim(text))`` split on ``\\s+``; shingles are
  space-joined n-grams in order.
- case folding (``fold``/``fold_sql``/``fold_py``): plain ``lower()``
  DIVERGES between the JVM/CPython (Unicode SpecialCasing: ``İ`` →
  ``i`` + U+0307, word-final ``Σ`` → ``ς``) and DuckDB's utf8proc
  (simple mappings: ``İ`` → ``i``, every ``Σ`` → ``σ``) — so md5-token
  hashes silently disagree on real multilingual text.  The contract is
  lower() then canonicalize both divergent classes (``i`` + combining
  dot → ``i``; ``ς`` → ``σ``) on EVERY engine, making the folded string
  — and every hash derived from it — engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# ---------------------------------------------------------------- hashing


def hash64(col: Column, salt: str = "") -> Column:
    """Deterministic 60-bit hash via md5 — reproducible in any engine."""
    salted = F.concat(col, F.lit(f"#{salt}")) if salt else col
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str, salt: str = "") -> str:
    salted = f"({expr}) || '#{salt}'" if salt else expr
    return f"CAST(('0x' || substring(md5({salted}), 1, 15)) AS BIGINT)"


# ------------------------------------------------------------ tokenization


# What JVM/CPython ``lower()`` makes of ``İ`` (U+0130): ``i`` + U+0307.
_DOTTED_I = "i̇"


def fold(col: Column) -> Column:
    """Engine-agnostic case fold (see module docstring): ``lower`` then
    canonicalize the two classes where JVM SpecialCasing and DuckDB's
    utf8proc disagree — ``İ``/``i``+U+0307 → ``i``, final sigma ``ς`` →
    ``σ``.  Literal ``replace``, not regex: stays a cheap in-row JVM
    expression inside whole-stage codegen."""
    return F.replace(
        F.replace(F.lower(col), F.lit(_DOTTED_I), F.lit("i")),
        F.lit("ς"),
        F.lit("σ"),
    )


def fold_sql(expr: str) -> str:
    """DuckDB twin of :func:`fold` — utf8proc's lower() already yields
    ``i``/``σ`` for İ/Σ, so the replaces only canonicalize literal
    ``i``+U+0307 / ``ς`` appearing in the input."""
    return (
        f"replace(replace(lower({expr}), 'i' || chr(775), 'i'), "
        f"chr(962), chr(963))"
    )


def fold_py(s: str) -> str:
    """Python twin of :func:`fold` for pandas-UDF/UDTF paths."""
    return s.lower().replace(_DOTTED_I, "i").replace("ς", "σ")


def tokens(col: Column) -> Column:
    return F.split(fold(F.trim(col)), r"\s+")


def tokens_sql(expr: str) -> str:
    return f"string_split_regex({fold_sql(f'trim({expr})')}, '\\s+')"


def grams(tok: Column, n: int = 3) -> Column:
    """ALL space-joined word n-grams in position order (duplicates kept —
    the positional variant substring dedup needs).

    Docs shorter than ``n`` tokens yield an EMPTY list, never an error:
    ``sequence(1, 0)`` in Spark is the DESCENDING ``[1, 0]``, so an
    unguarded transform would call ``element_at(tok, 0)`` and abort the
    whole job on the first short document (the reference skips bad
    records and continues — kafkaio.go:77-81; match that robustness).
    The matching DuckDB ``range(1, 1)`` is already empty, so the guard
    also keeps the two engines' values identical."""
    idx = F.sequence(F.lit(1), F.size(tok) - (n - 1))
    return F.when(
        F.size(tok) >= n,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(tok, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def grams_sql(tok_col: str, n: int = 3) -> str:
    """`tok_col` must be a plain column name (bind the token list in a CTE
    first) — it is referenced n times per gram."""
    parts = " || ' ' || ".join(f"{tok_col}[i + {j}]" for j in range(n))
    return (
        f"list_transform("
        f"range(1, greatest(len({tok_col}) - {n - 1}, 0) + 1), "
        f"i -> {parts})"
    )


def shingles(tok: Column, n: int = 3) -> Column:
    """Distinct space-joined word n-grams, in-order construction."""
    return F.array_distinct(grams(tok, n))


def shingles_sql(tok_col: str, n: int = 3) -> str:
    """`tok_col` must be a plain column name (bind the token list in a CTE
    first) — it is referenced n times per shingle."""
    return f"list_distinct({grams_sql(tok_col, n)})"


# ------------------------------------------------------------ vector math


def vec_finite(col: Column) -> Column:
    """True iff the array is non-NULL, non-empty, fully measured (no
    NULL element), and every element finite — the skip-and-continue
    contract for embedding columns (reference: kafkaio.go:77-81 drops
    malformed records).  A NaN/Inf coordinate poisons every downstream
    integer quantization (``CAST_OVERFLOW`` on Spark, a conversion
    error in DuckDB), and a NULL coordinate is a hole no dot product or
    quantizer can interpret — and one that NULL-propagates differently
    through Spark ``aggregate`` folds (NULL-absorbing) vs DuckDB
    ``list_sum`` (NULL-skipping) — so both classes are excluded up
    front on BOTH engines, value-checked by the fault-injection sweep
    (scripts_poison_audit.py rows 920003/920004) and matching the
    pandas-UDF paths' ``np.isfinite(...).all()`` (None → NaN → drop).

    Deliberately expressed through ``array_max``/``array_min``/
    ``array_compact`` — both engines rank NaN above +Inf, so a NaN
    anywhere surfaces in the max, and a NULL element anywhere shrinks
    the compacted length — and NOT through a higher-order ``exists``/
    ``list_filter`` lambda: this predicate sits directly on the scan,
    and the repo bans lambda-bearing scan DataFilters
    (tests/test_plans.py — they evaluate outside whole-stage codegen,
    per row, at every scan).  Empty and all-NULL vectors make the
    extrema NULL → predicate NULL → row dropped, identically on both
    engines."""
    hi, lo = F.array_max(col), F.array_min(col)
    return (
        col.isNotNull()
        & hi.isNotNull()
        & ~F.isnan(hi)
        & (hi != F.lit(float("inf")))
        & (lo != F.lit(float("-inf")))
        & (F.size(F.array_compact(col)) == F.size(col))
    )


def vec_finite_sql(expr: str) -> str:
    """DuckDB twin of :func:`vec_finite` (list_max/list_min share
    Spark's NULL-skipping and NaN-sorts-greatest semantics; the
    list_filter lambda is DuckDB-side only, where no scan-filter
    codegen constraint exists)."""
    return (
        f"({expr} IS NOT NULL AND list_max({expr}) IS NOT NULL"
        f" AND NOT isnan(list_max({expr}))"
        f" AND list_max({expr}) <> 'infinity'::DOUBLE"
        f" AND list_min({expr}) <> '-infinity'::DOUBLE"
        f" AND len(list_filter({expr}, x -> x IS NOT NULL)) = len({expr}))"
    )


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential double fold over zip — bit-identical to DuckDB's
    DOUBLE[] list functions."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, defined as 0.0 when either vector has zero
    norm: the unguarded division is a DIVIDE_BY_ZERO job abort under
    ANSI semantics the moment a real corpus contains one zero/padding
    embedding (same robustness contract as grams() on short docs — the
    reference never aborts on malformed input).  The oracle twin
    (_cos_sql) carries the identical CASE guard, so both engines emit
    exactly 0.0 for degenerate pairs and bit-identical doubles
    otherwise."""
    na, nb = F.sqrt(dot(a, a)), F.sqrt(dot(b, b))
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(
        F.lit(0.0)
    )


def norm(a: Column) -> Column:
    """sqrt(a . a) — precompute per VECTOR so an N^2 pair join folds one
    dot per pair instead of three; ``dot(a,b) / (norm_a * norm_b)`` is
    the same IEEE ops in the same order as ``cosine``, so oracle
    bit-equality is preserved."""
    return F.sqrt(dot(a, a))


def cosine_pre(dot_ab: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from a pair dot and two precomputed norms — bit-identical
    to ``cosine`` (hoisting sqrt(dot(a,a)) out of the pair expression
    changes evaluation site, not arithmetic), including the zero-norm
    guard: 0.0 instead of an ANSI DIVIDE_BY_ZERO abort."""
    return F.when(
        (norm_a > 0) & (norm_b > 0), dot_ab / (norm_a * norm_b)
    ).otherwise(F.lit(0.0))
