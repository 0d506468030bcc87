"""Stateful streaming dedup — ``applyInPandasWithState``.

The batch engine's exact-dedup (``operators/dedup.exact_duplicates``)
needs the whole corpus in one pass; on a stream the "have I seen this
content before" question is *state*. This operator keys the stream by
content hash and keeps ``(first_doc_id, n_seen)`` per key in Spark's
managed state store (checkpointed, restart-safe), emitting every
incoming doc tagged duplicate-or-first — the canonical custom stateful
operator the built-in windowed aggregations can't express.

Scale shape: state is partitioned by the groupBy key (content hash) —
the same hash-partitioning discipline as the batch groupBy, so state
shards evenly and a hot key holds one tiny (long, long) tuple, not
rows. The pandas function is VECTORIZED per group-batch (concat + min +
vector compare) — no per-row Python.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# doc_id is STRING throughout the engine (the synth corpus uses
# 'doc-%012d' ids) — a long cast would null every canonical id
OUTPUT_SCHEMA = "doc_id string, text_hash string, is_duplicate boolean, first_doc_id string"
STATE_SCHEMA = "first_doc_id string, n_seen long"


def _flag_duplicates(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per content-hash group: first doc ever seen (lexicographic-min
    doc_id of the first batch — deterministic) is canonical; everything
    after is a duplicate."""
    frames = [p for p in pdfs if len(p)]
    if not frames:
        return
    allp = pd.concat(frames, ignore_index=True)
    if state.exists:
        first_id, n_seen = state.get
        dup = pd.Series(True, index=allp.index)
    else:
        first_id = str(allp["doc_id"].min())
        n_seen = 0
        dup = allp["doc_id"] != first_id
    state.update((str(first_id), int(n_seen) + len(allp)))
    yield pd.DataFrame(
        {
            "doc_id": allp["doc_id"],
            "text_hash": key[0],
            "is_duplicate": dup,
            "first_doc_id": str(first_id),
        }
    )


def dedup_stream(
    spark: SparkSession,
    input_path: str,
    schema: str,
    output_path: str,
    checkpoint_path: str,
    max_files_per_trigger: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> StreamingQuery:
    """Incremental exact-dedup over a landing directory: every arriving
    doc is emitted with its duplicate verdict; state survives restarts
    via the streaming checkpoint, so a duplicate arriving WEEKS after
    its original is still caught. Sink reuses the idempotent per-batch
    overwrite (``validate_stream.write_batch_idempotent``)."""
    from json_validator_spark.streaming.validate_stream import write_batch_idempotent

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # bound each micro-batch (availableNow still drains everything):
        # forces genuine multi-batch state carryover in tests/parity runs
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)
    keyed = stream.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.md5(F.col(text_col)).alias("text_hash"),
    ).groupBy("text_hash")
    flagged = keyed.applyInPandasWithState(
        _flag_duplicates,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        write_batch_idempotent(batch, batch_id, f"{output_path}/dedup")

    return (
        flagged.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def neardup_ingest_stream(
    spark: SparkSession,
    input_path: str,
    schema: str,
    corpus_path: str,
    output_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 8,
    threshold: float = 0.9,
    max_bucket: int = 1000,
) -> StreamingQuery:
    """Streaming ingest with NEAR-dup screening: every arriving
    micro-batch is probed one-sidedly against the standing corpus
    (``operators/dedup.accept_new_documents`` — LSH candidates sized by
    the increment, exact-Jaccard verify), and only surviving docs land,
    idempotently per batch. The streaming complement of
    ``dedup_stream``'s exact-hash state: exact dups of *streamed*
    content are caught by that operator's state store; NEAR dups of
    *corpus* content are caught here by the standing index.

    Cross-increment near-dups (batch N+1 nearly duplicating batch N's
    accepted docs, neither in the corpus yet) are out of this
    operator's scope by design — full LSH signature state in the state
    store would hold a signature per historical doc; the production
    pattern is instead to FOLD accepted batches into the corpus index
    between triggers (cheap: signatures/bands are incremental
    artifacts), which this operator models by re-reading
    ``corpus_path`` at every batch — append accepted output there and
    the next trigger probes against it."""
    from json_validator_spark.operators.dedup import accept_new_documents
    from json_validator_spark.streaming.validate_stream import write_batch_idempotent

    stream = spark.readStream.schema(schema).parquet(input_path)

    def sink(batch: DataFrame, batch_id: int) -> None:
        corpus = batch.sparkSession.read.parquet(corpus_path)
        kept = accept_new_documents(
            batch, corpus, text_col, id_col, k, n_hashes, n_bands, threshold,
            max_bucket,
        )
        write_batch_idempotent(kept, batch_id, f"{output_path}/accepted")

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
