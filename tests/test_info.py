"""Entropy / mutual-information checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from json_validator_spark.operators.info import column_entropy, mutual_information


def test_column_entropy_known_values(spark):
    rows = [("a", 1, None), ("a", 2, None), ("b", 3, None), ("c", 4, "x")]
    df = spark.createDataFrame(rows, "cat string, uniq int, mostly_null string")
    out = {r["column"]: r for r in
           column_entropy(df, ["cat", "uniq", "mostly_null"]).collect()}
    # cat: p = (1/2, 1/4, 1/4) -> 1.5 bits
    assert abs(out["cat"]["entropy"] - 1.5) < 1e-3
    # uniq: uniform over 4 -> 2 bits
    assert abs(out["uniq"]["entropy"] - 2.0) < 1e-3
    # NULL is a category: (3/4 null, 1/4 x) -> H ~ 0.8113
    assert out["mostly_null"]["n_distinct"] == 2
    assert abs(out["mostly_null"]["entropy"] - 0.8113) < 1e-3
    # constant column -> zero entropy
    const = spark.createDataFrame([(1,)] * 8, "k int")
    assert column_entropy(const, ["k"]).first()["entropy"] == 0.0


def test_mutual_information_leak_and_independence(spark):
    # b == f(a): perfect leak, nmi == 1; c independent of a: nmi ~= 0
    # coin cycles at a period (4) orthogonal to a's: truly independent
    # (i % 2 would NOT be — it's determined by i % 4)
    rows = [(i, i % 4, (i % 4) * 10, (i // 4) % 2) for i in range(64)]
    df = spark.createDataFrame(rows, "id long, a int, leak int, coin int")
    leak = mutual_information(df, "a", "leak").first()
    assert abs(leak["nmi"] - 1.0) < 1e-3 and abs(leak["mi"] - 2.0) < 1e-3
    indep = mutual_information(df, "a", "coin").first()
    assert abs(indep["nmi"]) < 1e-3
    assert indep["col_a"] == "a" and indep["col_b"] == "coin"
    # expression + explicit name
    named = mutual_information(
        df, "a", F.col("leak") / 10, name_b="leak_bucket"
    ).first()
    assert named["col_b"] == "leak_bucket" and abs(named["nmi"] - 1.0) < 1e-3


def test_mutual_information_single_scan_plan(spark):
    """One corpus-sized exchange: the joint groupBy; marginals reuse the
    joint frame. The parquet relation must be scanned once."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = mutual_information(ev, "event_type", "user_id")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
