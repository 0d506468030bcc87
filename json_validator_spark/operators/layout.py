"""Physical-layout operators — Z-order (Morton) interleaving for
multi-dimensional data-skipping.

At 100 TB the dominant cost of every selective query is the scan, and
the scan is only cheap when file-level min/max statistics prune: parquet
footers (and Iceberg manifests) skip a file when the predicate's range
misses the file's range. Sorting by ONE column makes that column
prunable and destroys locality for every other; interleaving the bits
of SEVERAL columns (the Z-order / Morton curve) keeps every indexed
column's per-file range tight simultaneously — the same layout Delta
``OPTIMIZE ZORDER BY`` and Iceberg's sort-order rewrite produce. This
module computes the key with pure JVM-side integer arithmetic
(whole-stage codegen; reproducible verbatim in the DuckDB oracle) and
lays data out with ``repartitionByRange`` + in-partition sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    cols: Sequence[Column | str],
    los: Sequence[float],
    his: Sequence[float],
    bits: int = 16,
) -> Column:
    """Morton key of ``cols``: each value is scaled to an unsigned
    ``bits``-bit integer over its fixed ``[lo, hi]`` range (clamped, so
    stragglers outside the range land on the curve's edge instead of
    corrupting the interleave), then the columns' bits are interleaved
    — bit *b* of column *i* lands at position ``b·ncols + i``. Fixed
    ranges (not per-batch ranks) keep the key PLAN-CONSTANT: the same
    row always gets the same key, so incremental writes stay mergeable
    and the oracle can reproduce keys bit-for-bit.

    ``ncols × bits`` must fit a signed 64-bit long (≤ 62 used here);
    pure integer shifts/masks, whole-stage-codegen friendly."""
    n = len(cols)
    if n < 2:
        raise ValueError("z-order needs at least two columns")
    if n * bits > 62:
        raise ValueError("ncols*bits must fit a signed 64-bit key")
    scale = float((1 << bits) - 1)
    quantized = []
    for c, lo, hi in zip(cols, los, his):
        x = (F.col(c) if isinstance(c, str) else c).cast("double")
        q = F.floor(
            (F.least(F.greatest(x, F.lit(float(lo))), F.lit(float(hi))) - lo)
            / (hi - lo) * scale
        ).cast("long")
        quantized.append(q)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, q in enumerate(quantized):
            z = z + F.shiftleft(
                F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return z


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    los: Sequence[float],
    his: Sequence[float],
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Lay ``df`` out along the Z-curve: range-partition on the Morton
    key (one range exchange with a sampled boundary pass — Spark's
    ``repartitionByRange``) and sort within partitions, so every
    written file covers a contiguous curve segment and its min/max
    stats stay tight on EVERY indexed column. The key column is dropped
    before returning; layout is a physical property, not data."""
    key = zorder_key(list(cols), los, his, bits).alias("__z")
    parted = (
        df.select("*", key)
        .repartitionByRange(*([num_partitions, "__z"] if num_partitions else ["__z"]))
        .sortWithinPartitions("__z")
    )
    return parted.drop("__z")
