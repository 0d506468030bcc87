"""Stateful streaming sessionization — ``applyInPandasWithState``.

The streaming complement of ``operators/temporal.sessionize``: on a
stream, "which session does this event belong to" is per-user STATE
(current session index + last event tick), not a window over a complete
corpus. Each arriving event is emitted tagged with its session — same
``session_idx``/``session_id`` contract as the batch operator — and the
state store (checkpointed, restart-safe) carries sessions across
micro-batches and stream restarts, so a user who pauses 10 minutes
between batches stays in one session and a 31-minute pause opens a new
one, exactly as the batch window would have decided.

Semantics note (inherent to streaming): events are sessionized in
ARRIVAL order within each micro-batch (sorted by event time inside the
batch); an event arriving out of order ACROSS batches, older than the
user's last seen tick, is treated as current — the batch operator is
the replayable source of truth for late-data reprocessing.

Scale shape: state is hash-partitioned by the user key (one small
(long, long) tuple per user, not rows); the pandas function is
vectorized per group-batch (numpy sort + diff + cumsum — no per-row
Python).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id string, event_id string, ts timestamp, "
    "session_idx long, session_id string"
)
STATE_SCHEMA = "session_idx long, last_us long"


def _make_assigner(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def assign(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        allp = pd.concat(frames, ignore_index=True).sort_values("ts", kind="mergesort")
        us = allp["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        if state.exists:
            idx0, last_us = state.get
        else:
            idx0, last_us = 0, None
        prev = np.concatenate(([last_us if last_us is not None else -(1 << 62)], us[:-1]))
        new_session = (us - prev) > gap_us
        if last_us is None:
            new_session[0] = True  # first event ever opens session 1
        sidx = idx0 + np.cumsum(new_session.astype("int64"))
        state.update((int(sidx[-1]), int(us[-1])))
        yield pd.DataFrame(
            {
                "user_id": key[0],
                "event_id": allp["event_id"].astype(str),
                "ts": allp["ts"],
                "session_idx": sidx,
                "session_id": [f"{key[0]}#{i}" for i in sidx],
            }
        )

    return assign


def session_stream(
    spark: SparkSession,
    input_path: str,
    schema: str,
    output_path: str,
    checkpoint_path: str,
    max_files_per_trigger: int | None = None,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> StreamingQuery:
    """Incremental sessionization over a landing directory: every
    arriving event is emitted with its session assignment; per-user
    state survives restarts via the streaming checkpoint. Sink reuses
    the idempotent per-batch overwrite."""
    from json_validator_spark.streaming.validate_stream import write_batch_idempotent

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # bound each micro-batch (availableNow still drains everything):
        # forces genuine multi-batch state carryover in tests/parity runs
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)
    keyed = stream.select(
        F.col(user_col).cast("string").alias("user_id"),
        F.col(id_col).cast("string").alias("event_id"),
        F.col(ts_col).cast("timestamp").alias("ts"),
    ).groupBy("user_id")
    assigned = keyed.applyInPandasWithState(
        _make_assigner(gap_minutes),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        write_batch_idempotent(batch, batch_id, f"{output_path}/sessions")

    return (
        assigned.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
