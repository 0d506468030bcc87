"""Z-order layout: Morton key arithmetic + data-skipping benefit."""

from __future__ import annotations

from pyspark.sql import functions as F

from json_validator_spark.operators.layout import zorder_key, zorder_layout


def _morton2(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    pts = [(0, 0), (1, 0), (0, 1), (3, 5), (15, 15), (7, 12)]
    df = spark.createDataFrame(pts, "x int, y int")
    # ranges [0,15] with 4 bits -> quantization is the identity
    out = df.select(
        "x", "y", zorder_key(["x", "y"], [0, 0], [15, 15], bits=4).alias("z")
    ).collect()
    for r in out:
        assert r["z"] == _morton2(r["x"], r["y"], 4), (r["x"], r["y"])


def test_zorder_key_clamps_out_of_range(spark):
    df = spark.createDataFrame([(-5, 99)], "x int, y int")
    z = df.select(zorder_key(["x", "y"], [0, 0], [15, 15], bits=4).alias("z")).first()["z"]
    assert z == _morton2(0, 15, 4)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        zorder_key(["x"], [0], [1])
    with _pytest.raises(ValueError):
        zorder_key(["x", "y", "w", "v"], [0] * 4, [1] * 4, bits=16)


def test_zorder_layout_enables_pruning_on_both_dimensions(spark):
    """Data-skipping proxy: with 16 range partitions ("files"), a
    min/max-pruned scan for a narrow Y predicate must skip most
    partitions under the z layout, while the x-only layout can skip
    none (every partition spans all of y) — and the z layout must stay
    prunable on X too."""
    grid = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], "x int, y int"
    )

    def scanned(df, col, lo, hi):
        stats = (
            df.withColumn("__pid", F.spark_partition_id())
            .groupBy("__pid")
            .agg(F.min(col).alias("mn"), F.max(col).alias("mx"))
            .collect()
        )
        return sum(1 for r in stats if not (r["mx"] < lo or r["mn"] > hi))

    by_x = grid.repartitionByRange(16, "x")
    by_z = zorder_layout(grid, ["x", "y"], [0, 0], [63, 63], bits=6,
                         num_partitions=16)
    # y in [0, 3]: x-only layout prunes nothing
    assert scanned(by_x, "y", 0, 3) == 16
    assert scanned(by_z, "y", 0, 3) <= 8
    # x in [0, 3]: z layout still prunes most partitions
    assert scanned(by_z, "x", 0, 3) <= 8
    # layout must not change the data
    assert by_z.count() == 64 * 64


def test_zorder_layout_plan_is_range_exchange_plus_sort(spark):
    grid = spark.createDataFrame([(x, x) for x in range(64)], "x int, y int")
    out = zorder_layout(grid, ["x", "y"], [0, 0], [63, 63], bits=6,
                        num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange rangepartitioning" in plan
    assert "Sort " in plan
    # the layout key must not leak into the returned schema
    assert out.columns == ["x", "y"]
