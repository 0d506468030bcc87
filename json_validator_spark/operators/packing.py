"""Training-sequence packing — deterministic doc → sequence assignment.

Pretraining pipelines concatenate documents into fixed token-budget
training sequences. At 100 TB the packer must be (a) deterministic
(resume/rerun gives byte-identical assignments — the same contract as
the validation layer), (b) shuffle-minimal, and (c) free of any global
ordering: a single total-order window over the corpus would funnel
everything through one task.

This packer uses *sharded boundary packing*:

- ``shard = md5(doc_id) % n_shards`` — deterministic, engine-portable
  (the same ``functions/text.hash_long`` md5 discipline every other
  operator uses, so DuckDB reproduces assignments exactly).
- within a shard, docs are ordered by ``doc_id`` and packed greedily at
  token-budget boundaries: a doc joins sequence ``floor(tokens_before /
  budget)``. Document boundaries are preserved — a sequence may overrun
  the budget by less than one document (the standard concat-then-split-
  at-doc-boundaries policy); no document is ever split.

The per-shard window is ONE shuffle keyed on ``shard`` plus an
in-partition sort — the identical physical shape as any keyed window
aggregation. Choose ``n_shards`` well above the executor count so each
shard's sort fits a task (at 10^12 docs: tens of thousands of shards);
the packing quality is unaffected because budgets are per-shard-local.

Reference anchor: the reference processes documents one per request in
a sequential loop (``RestValidationController.java:276-289``); packing
is the training-pipeline generalization of that loop's "next document"
ordering into a deterministic distributed assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from json_validator_spark.functions.text import hash_hex, hash_long, tokens


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    n_shards: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document to a training sequence.

    Returns ``(doc_id, shard, n_tokens, seq_id, seq_offset)`` where
    ``seq_id`` is shard-local (globally unique as ``(shard, seq_id)``)
    and ``seq_offset`` is the document's token offset inside its
    sequence. Whitespace tokens (``functions/text.tokens``) are the
    budget unit; swap in a BPE count column upstream if available —
    the packer only needs *a* deterministic per-doc count.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        (hash_long(F.col(id_col), hex_chars=6) % n_shards).alias("shard"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    # bind the window sum once (two references would declare the frame
    # aggregation twice in WindowExec), then derive both assignment
    # columns from the materialized value
    return (
        base.withColumn("__cum", cum_before)
        .select(
            "doc_id",
            "shard",
            "n_tokens",
            F.floor(F.col("__cum") / F.lit(budget)).cast("long").alias("seq_id"),
            (F.col("__cum") % F.lit(budget)).alias("seq_offset"),
        )
    )


def global_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuf",
    shard_hex_chars: int = 3,
) -> DataFrame:
    """Deterministic global training order WITHOUT a global sort window:
    every document gets ``position`` = its exact rank under
    ``ORDER BY md5(doc_id:salt), doc_id`` — the reshuffle a pretraining
    pipeline applies so corpus insertion order never leaks into the
    batch stream. Changing ``salt`` yields an independent permutation
    (per-epoch shuffles). Returns ``(doc_id, position)``.

    The naive ``row_number() OVER (ORDER BY key)`` funnels the corpus
    through ONE task. Instead the md5 key's hex prefix IS the range
    partition (prefix order ≡ key order): shard = first
    ``shard_hex_chars`` hex chars (16^3 = 4096 shards by default; raise
    for 10^12 docs so each in-shard sort fits a task), rank within the
    shard by (key, id), then add the exclusive cumsum of shard sizes —
    a tiny ≤16^k-row frame whose window and broadcast join cost
    nothing. One data shuffle total (the shard hash), same shape as any
    keyed window; ties on duplicate ids hold the multiset
    {(doc_id, position)} invariant either way."""
    key = hash_hex(F.col(id_col), F.lit(salt), width=32)
    base = df.select(F.col(id_col).alias("doc_id"), key.alias("__key")).select(
        "doc_id",
        "__key",
        # long, not int: 8+ hex chars (the setting large corpora need)
        # overflow INT32 — ANSI mode crashes, non-ANSI NULLs the shard
        # and the inner offset join would silently drop rows
        F.conv(F.substring("__key", 1, shard_hex_chars), 16, 10)
        .cast("long")
        .alias("__shard"),
    )
    w = Window.partitionBy("__shard").orderBy("__key", "doc_id")
    local = base.withColumn("__r", F.row_number().over(w))
    sizes = base.groupBy("__shard").agg(F.count(F.lit(1)).alias("__n"))
    off_w = Window.orderBy("__shard").rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.select(
        "__shard", F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias("__off")
    )
    return local.join(F.broadcast(offs), "__shard").select(
        "doc_id", (F.col("__off") + F.col("__r") - 1).cast("long").alias("position")
    )


def materialize_sequences(
    df: DataFrame,
    budget: int = 2048,
    n_shards: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = " ",
) -> DataFrame:
    """The packing APPLY step: the actual training sequences —
    ``(shard, seq_id, n_docs, tokens_total, text)`` with ``text`` the
    member documents concatenated in ``doc_id`` order (``sep`` stands in
    for the EOS token between documents).

    Shape: ``pack_sequences``' keyed window (one shuffle on shard) →
    join the text back by doc_id → ONE groupBy((shard, seq_id)) whose
    ``collect_list`` runs map-side partial; member order inside a
    sequence is restored deterministically by sorting the collected
    (doc_id, text) structs — the sort is per-sequence (a handful of
    docs, budget-bounded), never global. NULL-text members are skipped
    by the join (no value, no separator) — the same semantics as
    DuckDB's ``string_agg``, so the oracle mirrors exactly; they still
    count toward ``n_docs``/``tokens_total``."""
    packed = pack_sequences(df, budget, n_shards, text_col, id_col)
    docs = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text"))
    joined = packed.join(docs, "doc_id")
    return (
        joined.groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens_total"),
            F.array_sort(
                F.collect_list(F.struct("doc_id", F.col("__text").alias("t")))
            ).alias("__members"),
        )
        .select(
            "shard",
            "seq_id",
            "n_docs",
            "tokens_total",
            F.array_join(
                F.transform(F.col("__members"), lambda m: m["t"]), sep
            ).alias("text"),
        )
    )


def sequence_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-sequence rollup of a ``pack_sequences`` result:
    ``(shard, seq_id, n_docs, tokens_total, fill_ratio)``. One
    partial-aggregated groupBy on the (shard, seq_id) key — the
    packing-quality audit (fill_ratio near 1.0 = healthy; a fleet of
    near-empty sequences means the budget is below the typical doc)."""
    return packed.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens_total"),
        F.round(F.sum("n_tokens") / F.lit(float(budget)), 6).alias("fill_ratio"),
    )
