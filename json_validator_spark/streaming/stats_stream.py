"""Stateful streaming column statistics — Welford moments per key.

The streaming complement of ``operators/set_checks.column_stats``: on a
stream, per-key running statistics are STATE (count, mean, M2 — the
classic Welford accumulator, numerically stable and exactly mergeable),
not a corpus aggregate. Each micro-batch folds its rows into the stored
moments with one vectorized merge per key (Chan et al.'s parallel
update formula) and emits the key's updated ``(n, mean, std, min, max)``
plus the incoming batch's own mean — the signal a monitoring layer
compares against the long-run mean to catch per-key drift AS IT LANDS,
weeks-long history included, restart-safe via the checkpoint.

Scale shape: state is one 5-tuple of doubles per key, hash-partitioned
by the groupBy key; per group-batch the update is numpy over the Arrow
batch — no per-row Python, no history kept beyond the moments.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "key string, n long, mean double, std double, min double, max double, "
    "batch_n long, batch_mean double"
)
STATE_SCHEMA = "n long, mean double, m2 double, mn double, mx double"


def _update_moments(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import math

    import numpy as np

    vals = []
    for p in pdfs:
        v = p["value"].dropna().to_numpy(dtype="float64")
        if len(v):
            vals.append(v)
    if not vals:
        return
    v = np.concatenate(vals)
    bn, bmean = len(v), float(v.mean())
    bm2 = float(((v - bmean) ** 2).sum())
    bmn, bmx = float(v.min()), float(v.max())
    if state.exists:
        n, mean, m2, mn, mx = state.get
        # Chan/Welford parallel merge of (n, mean, M2) pairs
        tot = n + bn
        delta = bmean - mean
        mean = mean + delta * bn / tot
        m2 = m2 + bm2 + delta * delta * n * bn / tot
        mn, mx = min(mn, bmn), max(mx, bmx)
        n = tot
    else:
        n, mean, m2, mn, mx = bn, bmean, bm2, bmn, bmx
    state.update((int(n), float(mean), float(m2), float(mn), float(mx)))
    std = math.sqrt(m2 / (n - 1)) if n > 1 else 0.0
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "n": [n],
            "mean": [round(mean, 6)],
            "std": [round(std, 6)],
            "min": [mn],
            "max": [mx],
            "batch_n": [bn],
            "batch_mean": [round(bmean, 6)],
        }
    )


def running_stats_stream(
    spark: SparkSession,
    input_path: str,
    schema: str,
    output_path: str,
    checkpoint_path: str,
    max_files_per_trigger: int | None = None,
    key_col: str = "event_type",
    value_col: str = "value",
) -> StreamingQuery:
    """Incremental per-key column stats over a landing directory: each
    batch emits every touched key's updated lifetime moments and the
    batch's own mean; state survives restarts via the checkpoint. Sink
    reuses the idempotent per-batch overwrite."""
    from json_validator_spark.streaming.validate_stream import write_batch_idempotent

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # bound each micro-batch (availableNow still drains everything):
        # forces genuine multi-batch state carryover in tests/parity runs
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)
    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    ).groupBy("key")
    stats = keyed.applyInPandasWithState(
        _update_moments,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        write_batch_idempotent(batch, batch_id, f"{output_path}/stats")

    return (
        stats.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
