"""Shared text/hash column helpers for the training-data operators.

Everything here is a Catalyst ``Column`` expression (JVM-side, codegen).
Hashing is deliberately **md5-based, not xxhash64-based**, wherever a
DuckDB oracle must reproduce the value bit-for-bit: both engines ship an
identical md5, while their native 64-bit hashes differ. Where no oracle
parity is needed (e.g. salting), ``xxhash64`` stays the cheaper choice.

The token regex avoids lookaround/backreferences so Java ``java.util.regex``
(Spark) and RE2 (DuckDB) agree — same stance as
``functions/formats.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Split-on-non-alphanumeric. Used with F.split (Spark) and
# string_split_regex (DuckDB); both keep empty fields, so callers filter.
TOKEN_SPLIT_REGEX = r"[^a-z0-9]+"

# "BPE-ish" lexer: word | single digit | single punctuation mark. A crude
# stand-in for a subword tokenizer with stable cross-engine semantics.
BPE_ISH_REGEX = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

# Tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic. Deterministic and intentionally small.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "is", "a", "that"),
    "es": ("el", "la", "de", "que", "y", "los", "se", "un"),
    "fr": ("le", "la", "et", "les", "des", "une", "du", "est"),
    "de": ("der", "die", "und", "das", "den", "von", "zu", "mit"),
}


def tokens(text: Column) -> Column:
    """Lower-cased alphanumeric tokens, empties removed."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_REGEX), lambda t: t != ""
    )


def hash_hex(*cols: Column, width: int = 32) -> Column:
    """md5 hex digest (prefix) of ':'-joined inputs — identical in DuckDB
    as ``substr(md5(concat_ws(':', ...)), 1, width)``."""
    h = F.md5(F.concat_ws(":", *[c.cast("string") for c in cols]))
    return h if width >= 32 else F.substring(h, 1, width)


def hash_long(*cols: Column, hex_chars: int = 15) -> Column:
    """First ``hex_chars`` md5 hex chars as a non-negative BIGINT.

    ≤15 hex chars (60 bits) keeps the value positive in both engines.
    DuckDB equivalent: ``('0x' || substr(md5(...), 1, 15))::BIGINT``.
    """
    return F.conv(hash_hex(*cols, width=hex_chars), 16, 10).cast("long")


def unit_uniform(*cols: Column) -> Column:
    """Deterministic uniform [0,1) from md5 bits — the oracle-parity
    cousin of ``sources/synth._u`` (which uses xxhash64 and needs no
    oracle). 6 hex chars = 24 bits of resolution."""
    return hash_long(*cols, hex_chars=6) / F.lit(float(1 << 24))


def let(bound: Column, body) -> Column:
    """Single-evaluation let-binding for Column expressions.

    Higher-order-function lambdas re-evaluate any *expression* they
    reference on every element (and HOFs run interpreted, outside
    codegen) — referencing an expensive expression like a tokenization
    inside a per-element lambda is O(elements × cost). Wrapping it as
    ``transform(array(bound), v -> body(v))[1]`` evaluates ``bound``
    exactly once and hands the materialized VALUE to ``body`` as a
    lambda variable. See operators/dedup.py for the aggregation-barrier
    variant of the same fix."""
    return F.element_at(F.transform(F.array(bound), body), 1)


def seq1(n: Column) -> Column:
    """``[1..n]``, or an EMPTY array when n < 1. Plain ``F.sequence(1, 0)``
    yields a *descending* ``[1, 0]`` (step defaults to -1), which poisons
    downstream ``slice``/``substr`` calls with start=0 — this guard is the
    difference between "works" and "crashes on the first empty document"."""
    return F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )


def shingles(toks: Column, k: int = 3) -> Column:
    """Distinct k-token shingles (space-joined) of a token array; empty
    array when the doc has fewer than ``k`` tokens."""
    n = F.size(toks)
    idx = seq1(n - (k - 1))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
    )
