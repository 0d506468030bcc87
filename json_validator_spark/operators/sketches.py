"""Sketch-accelerated exact operators — the 10^12-row scale paths for
two checks that elsewhere in the engine rely on a broadcastable side or
a vocabulary-sized shuffle:

- ``bloom_referential_violations``: referential integrity where the
  dimension's key set is too large to broadcast as a hash relation.
  A Bloom bitmap over the dimension keys (~10 bits/key vs ~50+ bytes/key
  for a broadcast hash table) is built in one distributed agg, shipped
  to the workers, and used to split the fact side into *definitely
  missing* (some bit unset — emitted as violations with NO join at all)
  and *maybe present* (all bits set — the only rows that reach the
  exact anti-join verify). Bloom filters have no false negatives, so
  the union is EXACTLY the plain anti-join result; the false-positive
  rate only sizes the verify join's probe side. This is the same
  strategy Spark's own runtime row-level filtering applies to shuffle
  joins, surfaced as an explicit operator with an exact contract.
- ``heavy_hitters``: exact top-k frequency when even the *grouped*
  table (the distinct-key universe) is too large to shuffle
  comfortably. Per-partition Misra–Gries summaries (mergeable, error
  ≤ N/(capacity+1)) nominate a bounded candidate set; only candidates
  are exactly recounted. The result carries an ``exact`` certificate —
  true iff the k-th candidate count exceeds N/(capacity+1), in which
  case no non-candidate can displace it and the top-k is provably the
  true top-k.

Reference provenance: the reference validates references per document
against a preloaded local cache (``LocalSchemaCache.java:62-73``); at
corpus scale that becomes the referential check, and these are its
bounded-memory forms (SURVEY §2.2 set-based rows).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ----------------------------------------------------------------------
# Bloom-prefiltered referential integrity
# ----------------------------------------------------------------------


def _bloom_positions(col: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """``n_hashes`` deterministic bit positions for a key: JVM-side
    ``xxhash64(key, i)`` (one hash per seed, whole-stage codegen) mod
    ``n_bits``. ``pmod`` keeps positions non-negative."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(n_bits)).cast("long")
        for i in range(n_hashes)
    ]


def bloom_bitmap(
    dim: DataFrame, dim_key: str, n_bits: int = 1 << 20, n_hashes: int = 5
) -> np.ndarray:
    """Build the Bloom bitset over a dimension's key set as ONE
    distributed aggregation: explode each key's ``n_hashes`` positions
    → (word, mask) → ``groupBy(word).agg(bit_or(mask))``. The shuffle
    carries at most ``n_bits/64`` distinct words (map-side bit_or
    combine), and the driver collect is the dense word table — bounded
    by the *configured* bitmap size, never by the dimension's row count.
    Returns a dense uint64 numpy array of ``ceil(n_bits/64)`` words."""
    key = F.col(dim_key)
    pos = F.explode(F.array(*_bloom_positions(key, n_bits, n_hashes))).alias("p")
    words = (
        dim.select(key.alias(dim_key))
        .filter(key.isNotNull())
        .select(pos)
        .select(
            (F.col("p") / 64).cast("long").alias("w"),
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("m"))
        .collect()
    )
    arr = np.zeros((n_bits + 63) // 64, dtype=np.uint64)
    for r in words:
        arr[r["w"]] = np.int64(r["m"]).view(np.uint64)
    return arr


def bloom_referential_violations(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    rule_id: str,
    doc_id: str = "doc_id",
    span_path: Column | None = None,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    verify_broadcast: bool = True,
) -> DataFrame:
    """Exact referential-integrity violations with a Bloom prefilter.

    Plan shape (all fact-side stages are NARROW — no fact shuffle):

    1. bitmap build: one agg over the dimension, ≤ ``n_bits/64`` words
       collected (bounded by config, not data).
    2. fact prefilter: positions computed JVM-side (codegen), bit tests
       vectorized in numpy inside ``mapInPandas`` (Arrow batches; no
       per-row Python).
    3. rows with any unset bit are DEFINITELY missing → violations
       emitted directly (at 10^12 scale, when violations dominate the
       missing set, most violation rows never touch a join).
    4. rows with all bits set (true members + false positives) are the
       only anti-join probes. ``verify_broadcast=False`` switches the
       verify to a shuffled anti-join for dimensions too large to
       broadcast — the survivor probe side is small by construction,
       so the shuffle is survivor-sized, not fact-sized.

    False positives only move rows from bucket 3 to bucket 4; bucket 4
    is exact. The result therefore equals ``referential_violations``
    row-for-row (oracle: plain NOT EXISTS anti-join).
    """
    bitmap = bloom_bitmap(dim, dim_key, n_bits=n_bits, n_hashes=n_hashes)
    path = span_path if span_path is not None else F.lit(f"/{fact_key}")
    pos_cols = [
        c.alias(f"__p{i}")
        for i, c in enumerate(_bloom_positions(F.col("__k"), n_bits, n_hashes))
    ]
    probe = (
        fact.select(
            F.col(doc_id).cast("string").alias("doc_id"),
            path.alias("span_path"),
            F.col(fact_key).alias("__k"),
        )
        .filter(F.col("__k").isNotNull())
        .select("doc_id", "span_path", "__k", *pos_cols)
    )
    out_schema = "doc_id string, span_path string, __k " + dict(probe.dtypes)["__k"] + ", __maybe boolean"
    n_h = n_hashes

    def _test_bits(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        words = bitmap  # shipped once per worker in the task closure
        for pdf in batches:
            maybe = np.ones(len(pdf), dtype=bool)
            for i in range(n_h):
                p = pdf[f"__p{i}"].to_numpy(dtype=np.int64).view(np.uint64)
                w = words[(p >> np.uint64(6)).astype(np.int64)]
                bit = (w >> (p & np.uint64(63))) & np.uint64(1)
                maybe &= bit.astype(bool)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "span_path": pdf["span_path"],
                    "__k": pdf["__k"],
                    "__maybe": maybe,
                }
            )

    tested = probe.mapInPandas(_test_bits, schema=out_schema)
    definite = tested.filter(~F.col("__maybe"))
    dim_keys = dim.select(F.col(dim_key).alias("__k")).distinct()
    verify_side = F.broadcast(dim_keys) if verify_broadcast else dim_keys
    verified = tested.filter(F.col("__maybe")).join(verify_side, on="__k", how="left_anti")
    missing = definite.select("doc_id", "span_path", "__k").unionByName(
        verified.select("doc_id", "span_path", "__k")
    )
    return missing.select(
        "doc_id",
        "span_path",
        F.lit(rule_id).alias("rule_id"),
        F.lit("error").alias("severity"),
        F.concat(F.lit("unresolved reference: "), F.col("__k").cast("string")).alias("message"),
    )


# ----------------------------------------------------------------------
# Misra–Gries heavy hitters with exact recount
# ----------------------------------------------------------------------


def _mg_sketch_partition(
    batches: Iterator[pd.DataFrame], capacity: int
) -> Iterator[pd.DataFrame]:
    """Mergeable Misra–Gries over one partition's Arrow batches. Each
    batch is reduced with a vectorized ``value_counts`` (per-DISTINCT
    work, not per-row Python), merged into the running summary, then
    pruned by the mergeable-summaries rule (Agarwal et al., 2013):
    subtract the (capacity+1)-th largest weight and drop non-positive
    entries. Invariant: any key whose true partition count exceeds
    N_p/(capacity+1) is present at the end. Emits the surviving keys
    plus one null-key row carrying the partition's total row count."""
    summary = pd.Series(dtype="int64")
    total = 0
    for pdf in batches:
        s = pdf["__k"].dropna()
        total += len(s)
        vc = s.value_counts()
        summary = summary.add(vc, fill_value=0).astype("int64")
        if len(summary) > capacity:
            thresh = summary.nlargest(capacity + 1).iloc[-1]
            summary = summary.sub(thresh)
            summary = summary[summary > 0]
    yield pd.DataFrame(
        {
            "__k": list(summary.index.astype(str)) + [None],
            "n": list(summary.to_numpy(dtype="int64")) + [total],
        }
    )


def heavy_hitters(
    df: DataFrame, col: str, k: int = 50, capacity: int = 4096
) -> DataFrame:
    """Exact top-``k`` most frequent values of ``col`` with bounded
    memory and a candidate-sized shuffle — the scale path beside
    ``text_checks.vocab_topk`` (whose ``groupBy`` shuffles the full
    distinct-key universe; fine for vocabularies, not for, say,
    near-unique URL columns at 10^12 rows).

    1. SKETCH: one narrow ``mapInPandas`` scan; each partition emits at
       most ``capacity`` candidate keys + its row total. The collect is
       ≤ capacity × n_partitions rows — bounded by config.
    2. RECOUNT: exact counts of the candidate keys only, via a
       broadcast semi-join (candidate set is tiny by construction) and
       one candidate-sized ``groupBy``.
    3. CERTIFICATE: every non-candidate key has true count ≤
       N/(capacity+1) (Misra–Gries union bound across partitions), so
       the result is provably the exact top-k iff k rows exist and the
       k-th recounted value exceeds that bound. Emitted as the
       ``exact`` column (constant across rows).

    Returns ``(rank, key, n, exact)`` with the deterministic
    (n desc, key asc) total order; the output is partition-layout
    invariant whenever ``exact`` is true (the sketch's arrival-order
    sensitivity only perturbs which *extra* candidates are nominated,
    and extras lose the exact recount).
    """
    keyed = df.select(F.col(col).cast("string").alias("__k"))
    sketch_rows = keyed.mapInPandas(
        lambda it: _mg_sketch_partition(it, capacity), schema="__k string, n long"
    ).collect()
    total = sum(r["n"] for r in sketch_rows if r["__k"] is None)
    candidates = sorted({r["__k"] for r in sketch_rows if r["__k"] is not None})
    spark = df.sparkSession
    cand_df = spark.createDataFrame([(c,) for c in candidates], "__k string")
    counts = (
        keyed.filter(F.col("__k").isNotNull())
        .join(F.broadcast(cand_df), on="__k", how="left_semi")
        .groupBy("__k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counts.orderBy(F.desc("n"), F.asc("__k")).limit(k)
    w = Window.orderBy(F.desc("n"), F.asc("__k"))
    whole = Window.partitionBy()
    bound = total / (capacity + 1)
    return top.select(
        F.row_number().over(w).alias("rank"),
        F.col("__k").alias("key"),
        F.col("n").cast("long").alias("n"),
        (
            (F.count(F.lit(1)).over(whole) == F.lit(k))
            & (F.min("n").over(whole) > F.lit(bound))
        ).alias("exact"),
    )
