"""Sketch-accelerated exact operators: Bloom-prefiltered referential
integrity and Misra–Gries heavy hitters with exact recount."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from json_validator_spark.operators.set_checks import referential_violations
from json_validator_spark.operators.sketches import (
    _mg_sketch_partition,
    bloom_bitmap,
    bloom_referential_violations,
    heavy_hitters,
)


@pytest.fixture(scope="module")
def fact_dim(spark):
    # keys 0..999 in the fact; dimension holds only multiples of 3
    fact = spark.range(0, 1000).select(
        F.col("id").cast("string").alias("doc_id"),
        (F.col("id") % 250).alias("k"),
    )
    dim = spark.range(0, 250, 3).select(F.col("id").alias("dk"))
    return fact, dim


def test_bloom_matches_exact_anti_join(spark, fact_dim):
    fact, dim = fact_dim
    exact = referential_violations(fact, "k", dim, "dk", rule_id="r", doc_id="doc_id")
    bloom = bloom_referential_violations(
        fact, "k", dim, "dk", rule_id="r", doc_id="doc_id", n_bits=1 << 12
    )
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, bloom.collect()))


def test_bloom_matches_under_heavy_false_positives(spark, fact_dim):
    # a deliberately undersized bitmap (64 bits for ~83 keys) saturates:
    # nearly every probe is a false positive, so almost everything rides
    # the verify join — the result must STILL be exact.
    fact, dim = fact_dim
    exact = referential_violations(fact, "k", dim, "dk", rule_id="r", doc_id="doc_id")
    bloom = bloom_referential_violations(
        fact, "k", dim, "dk", rule_id="r", doc_id="doc_id", n_bits=64, n_hashes=2
    )
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, bloom.collect()))


def test_bloom_shuffled_verify_path(spark, fact_dim):
    fact, dim = fact_dim
    exact = referential_violations(fact, "k", dim, "dk", rule_id="r", doc_id="doc_id")
    bloom = bloom_referential_violations(
        fact, "k", dim, "dk", rule_id="r", doc_id="doc_id",
        n_bits=1 << 12, verify_broadcast=False,
    )
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, bloom.collect()))


def test_bloom_no_false_negatives_by_construction(spark, fact_dim):
    # every dimension key must test positive against its own bitmap
    _, dim = fact_dim
    bits = bloom_bitmap(dim, "dk", n_bits=1 << 12, n_hashes=5)
    probe = bloom_referential_violations(
        dim.select(F.col("dk").alias("doc_id"), F.col("dk").alias("k")),
        "k", dim, "dk", rule_id="r", doc_id="doc_id", n_bits=1 << 12,
    )
    assert probe.count() == 0
    assert bits.any()  # bitmap actually has bits set


def test_bloom_fact_side_is_narrow(spark, fact_dim):
    # the fact side must not shuffle: no Exchange between the fact scan
    # and the violation projection on the definite branch
    fact, dim = fact_dim
    plan = bloom_referential_violations(
        fact, "k", dim, "dk", rule_id="r", doc_id="doc_id", n_bits=1 << 12
    )._jdf.queryExecution().executedPlan().toString()
    # broadcast exchange for the verify side is expected; a shuffle
    # (Exchange hashpartitioning) of the fact probe is not
    assert "Exchange hashpartitioning" not in plan


def test_heavy_hitters_exact_and_certified(spark):
    # zipf-ish frequencies: value v appears 1000//(v+1) times
    rows = [(str(v),) for v in range(200) for _ in range(1000 // (v + 1))]
    df = spark.createDataFrame(rows, "k string").repartition(8)
    got = heavy_hitters(df, "k", k=10, capacity=512).collect()
    exact = (
        df.groupBy("k").count().orderBy(F.desc("count"), F.asc("k")).limit(10).collect()
    )
    assert [(r["key"], r["n"]) for r in got] == [(r["k"], r["count"]) for r in exact]
    assert all(r["exact"] for r in got)
    assert [r["rank"] for r in got] == list(range(1, 11))


def test_heavy_hitters_certificate_honest_at_tiny_capacity(spark):
    # near-uniform data + tiny capacity: the k-th count cannot beat
    # N/(capacity+1), so the operator must NOT claim exactness
    rows = [(str(v % 97),) for v in range(2000)]
    df = spark.createDataFrame(rows, "k string").repartition(4)
    got = heavy_hitters(df, "k", k=10, capacity=4).collect()
    assert all(not r["exact"] for r in got)


def test_heavy_hitters_partition_layout_invariant_when_exact(spark):
    rows = [(str(v),) for v in range(50) for _ in range(500 // (v + 1))]
    df = spark.createDataFrame(rows, "k string")
    a = heavy_hitters(df.repartition(2), "k", k=5, capacity=256).collect()
    b = heavy_hitters(df.repartition(16), "k", k=5, capacity=256).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert a[0]["exact"]


def test_mg_sketch_superset_guarantee():
    # any key with count > N/(capacity+1) must survive the partition sketch
    rng = np.random.RandomState(7)
    vals = [str(v) for v in rng.zipf(1.5, 5000) if v < 1000]
    cap = 64
    batches = [pd.DataFrame({"__k": vals[i : i + 500]}) for i in range(0, len(vals), 500)]
    out = list(_mg_sketch_partition(iter(batches), cap))[0]
    survivors = set(out["__k"].dropna())
    n_total = int(out.loc[out["__k"].isnull(), "n"].iloc[0])
    assert n_total == len(vals)
    counts = pd.Series(vals).value_counts()
    must_survive = set(counts[counts > n_total / (cap + 1)].index)
    assert must_survive <= survivors
    assert len(survivors) <= cap
