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
- tokenization: ``lower(trim(text))`` split on ``\\s+``; shingles are
  space-joined n-grams in order.
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


def tokens(col: Column) -> Column:
    return F.split(F.lower(F.trim(col)), r"\s+")


def tokens_sql(expr: str) -> str:
    return f"string_split_regex(lower(trim({expr})), '\\s+')"


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
