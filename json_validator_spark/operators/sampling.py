"""Deterministic corpus sampling & splitting — the data-mixture layer.

A pretraining pipeline mixes sources at configured rates (C4 / The Pile
style mixture weights) and carves held-out splits. Both are modeled as
pure NARROW operations: the keep/assign decision is a plan-constant
function of the document id (md5-based ``unit_uniform`` —
``functions/text.py``), never of partition id, sort order, or a random
seed held in executor state. Consequences at 100 TB scale:

- zero shuffle: a filter / projection over the scan, whole-stage codegen;
- reproducible: re-running the job (any cluster size, any partitioning)
  selects the identical sample — the same property that makes the
  N-vs-4N violation sets byte-identical;
- oracle-checkable: DuckDB reproduces the md5 arithmetic bit-for-bit
  (same discipline as every hash in this repo).

The reference has no sampling layer (it validates what it is given —
``ValidationRunner.java`` iterates the inputs exhaustively); this module
is part of the training-data pipeline extension alongside
``operators/dedup.py``.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from json_validator_spark.functions.text import unit_uniform


def _u(id_col: str, salt: str) -> Column:
    return unit_uniform(F.col(id_col), F.lit(salt))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Keep each row with its stratum's probability: mixture-weight
    downsampling (e.g. ``{"en": 0.5, "es": 0.25}``). Rows whose stratum
    is absent from ``fractions`` (including NULL strata) use
    ``default_fraction``. Pure filter — schema passes through."""
    frac: Column = F.lit(float(default_fraction))
    for value, f in fractions.items():
        frac = F.when(F.col(strata_col) == F.lit(value), F.lit(float(f))).otherwise(frac)
    return df.filter(_u(id_col, salt) < frac)


def hash_split(
    df: DataFrame,
    weights: Mapping[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split by cumulative weight
    over the id-hash uniform — the train/val/test carve. Weights must
    sum to ~1; the LAST split absorbs the remainder (so float dust never
    drops a row)."""
    if weights is None:
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    names = list(weights)
    bad = {k: w for k, w in weights.items() if not 0.0 <= w <= 1.0}
    if bad:
        raise ValueError(f"split weights must each be in [0, 1]: {bad}")
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1 (got {total}): {dict(weights)}")
    u = _u(id_col, salt)
    expr: Column = F.lit(names[-1])
    cum = 0.0
    conds = []
    for name in names[:-1]:
        cum += float(weights[name])
        conds.append((cum, name))
    for cum, name in reversed(conds):
        expr = F.when(u < F.lit(cum), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)
