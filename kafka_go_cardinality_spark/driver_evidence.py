"""Driver-side correctness evidence, derived from the CORRECTNESS_r*.json
artifacts the external harness drops in the repo root each round.

The registry (queries.py) fronts queries the driver has never proven and
parks — but still periodically re-checks — the proven block, so each
round's first-N correctness sweep maximizes *new* evidence without letting
a later regression in a "proven" query go unchecked forever.

A query counts as PROVEN only if its LATEST driver row is green:

- oracled queries: ``err`` is null and ``hash_match`` is true;
- rows-only queries (estimators/seeded ops that register no oracle):
  ``err == 'no_oracle'`` and the Spark side returned rows.

A query whose latest row is an ERROR (e.g. the round-1 loader crash that
hit q_except / q_json_extract before any result row existed) is STALE-RED:
it must go to the very FRONT of the registry until a green row lands —
the opposite of the old behavior, which counted any mention in any
CORRECTNESS file as proof and parked those two queries at the back.
"""

from __future__ import annotations

import copy
import functools
import glob
import json
import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def correctness_files(root: str = _REPO_ROOT) -> list[str]:
    # Lexicographic sort == round order for the driver's zero-padded
    # CORRECTNESS_r{NN}.json naming.
    return sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))


@functools.lru_cache(maxsize=8)
def _parsed_rounds_cached(root: str) -> list[dict]:
    """The raw parse behind :func:`_parsed_rounds` — cache of record;
    never hand its return value out (see _parsed_rounds)."""
    rounds: list[dict] = []
    for path in correctness_files(root):
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        if isinstance(data, dict):
            rounds.append(data)
    return rounds


def _parsed_rounds(root: str = _REPO_ROOT) -> list[dict]:
    """Per-round row dicts, oldest first — only files that parse count as
    rounds, so latest_rows() and round_index() agree on what a round is.

    Memoized per root: proven_names / stale_red_names / evidence_age /
    round_index each consume this, and the registry calls all four at
    import — uncached that re-reads and re-parses every round's JSON
    four times per process (O(rounds x file size), growing each round).
    Returns a DEEP COPY of the cached parse (the rounds are small —
    a few hundred 6-field rows): a caller mutating a row, which the old
    shared-reference contract only forbade by docstring, can no longer
    corrupt every downstream consumer.  A long-lived process that wants
    to see a NEW CORRECTNESS_r*.json land mid-flight can call
    ``_parsed_rounds_cached.cache_clear()``; within a normal driver or
    test process the artifacts only change between rounds."""
    return copy.deepcopy(_parsed_rounds_cached(root))


def latest_rows(root: str = _REPO_ROOT) -> dict[str, dict]:
    """name -> the row from the most recent round that checked it."""
    rows: dict[str, dict] = {}
    for data in _parsed_rounds(root):
        for name, row in data.items():
            if isinstance(row, dict):
                rows[name] = row
    return rows


def is_green(row: dict) -> bool:
    if row.get("err") == "no_oracle":
        return row.get("spark_rows") is not None
    return row.get("err") is None and row.get("hash_match") is True


def proven_names(root: str = _REPO_ROOT) -> frozenset[str]:
    """Queries whose latest driver row is green."""
    return frozenset(n for n, r in latest_rows(root).items() if is_green(r))


def stale_red_names(root: str = _REPO_ROOT) -> frozenset[str]:
    """Queries the driver has checked but whose latest row is NOT green."""
    return frozenset(n for n, r in latest_rows(root).items() if not is_green(r))


def rows_only_green_names(root: str = _REPO_ROOT) -> frozenset[str]:
    """Queries whose latest driver row is a green ROWS-ONLY check
    (``err == 'no_oracle'`` with rows returned) — i.e. the driver has
    never value-hashed them.  The registry intersects this with the
    current ORACLE_SQL keys to find HASH-PENDING queries: ones that
    gained an oracle AFTER their latest driver visit (r8 verdict item
    1 — six queries flipped to oracled in r8 carried only rows-only
    evidence and the age-based rotation, blind to the evidence TYPE
    changing, left them outside the sweep head).  Hash-capable but
    never hash-checked outranks mere staleness: a sweep slot spent
    there buys a first-ever hash row instead of a refresh."""
    return frozenset(
        n
        for n, r in latest_rows(root).items()
        if r.get("err") == "no_oracle" and r.get("spark_rows") is not None
    )


def evidence_age(root: str = _REPO_ROOT) -> dict[str, int]:
    """name -> 0-based index of the ROUND that produced its latest row.

    The registry fronts the proven block by ascending age index (oldest
    evidence first), so each driver sweep re-proves the queries whose
    green rows are most stale — e.g. the relational core's r2 rows after
    four rounds of engine rewrites underneath them.  Self-maintaining:
    a sweep refreshes the head's rows, making them the NEWEST evidence,
    so the next round a different slice rises to the head."""
    age: dict[str, int] = {}
    for i, data in enumerate(_parsed_rounds(root)):
        for name, row in data.items():
            if isinstance(row, dict):
                age[name] = i
    return age


def round_index(root: str = _REPO_ROOT) -> int:
    """Rounds of driver evidence seen so far — the rotation phase for the
    periodic re-check of proven queries (queries.py uses this to shift the
    proven block's internal order each round).  Counts only files that
    parsed, matching latest_rows()."""
    return len(_parsed_rounds(root))


@functools.lru_cache(maxsize=8)
def changed_files(root: str = _REPO_ROOT) -> frozenset[str]:
    """Repo-relative paths changed since the last driver round-close
    commit (the harness commits ``round N: verdict/advice/...`` when a
    round ends) — the CODE-CHURN signal for the sweep rotation (r9
    verdict item 6): a green row from round N-k proves nothing about
    code rewritten since, so churned queries deserve re-check priority
    over equally-aged untouched ones.  Diffs BASE vs the WORKING TREE
    (``git diff <base>``, not ``<base>..HEAD`` — r10 ADVICE): the
    intent is "code rewritten since the round-close commit", and the
    freshest rewrites are exactly the ones not yet committed when a
    mid-session sweep imports the registry.  Returns the empty set
    whenever the signal is unavailable (no git, no round commit yet,
    subprocess failure) — ordering then degrades to the pure age
    rotation."""
    import re
    import subprocess

    try:
        base = subprocess.run(
            ["git", "-C", root, "log", "-E",
             "--grep", r"^round [0-9]+:", "-1", "--format=%H"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        if not re.fullmatch(r"[0-9a-f]{40}", base):
            return frozenset()
        out = subprocess.run(
            ["git", "-C", root, "diff", "--name-only", base],
            capture_output=True, text=True, timeout=10,
        )
        if out.returncode != 0:
            return frozenset()
        # `git diff <base>` never lists UNTRACKED files, so a brand-new
        # not-yet-added module would be invisible to the churn boost
        # despite being the freshest rewrite (r11 ADVICE) — union in the
        # untracked-but-not-ignored set.
        untracked = subprocess.run(
            ["git", "-C", root, "ls-files", "--others", "--exclude-standard"],
            capture_output=True, text=True, timeout=10,
        )
        names = list(out.stdout.splitlines())
        if untracked.returncode == 0:
            names += untracked.stdout.splitlines()
        return frozenset(line.strip() for line in names if line.strip())
    except Exception:
        return frozenset()
