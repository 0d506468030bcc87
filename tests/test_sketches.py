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


def test_mg_certificate_sound_under_random_partitionings():
    """Fuzz the certificate math end-to-end at the pandas level (the
    Spark plan only moves these exact computations around): for random
    value distributions, random partition splits, and random batch
    boundaries, whenever the k-th recounted candidate clears the
    N/(capacity+1) bound the candidate top-k MUST equal the true top-k.
    A certificate that ever passes on a wrong answer is a soundness bug;
    one that never passes is useless — assert it fires reasonably often
    on skewed data."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    certified = [0]

    @settings(max_examples=60, deadline=None)
    @given(
        data=st.lists(st.integers(min_value=0, max_value=60), min_size=30, max_size=800),
        n_parts=st.integers(min_value=1, max_value=6),
        cap=st.integers(min_value=4, max_value=64),
        k=st.integers(min_value=1, max_value=8),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def run(data, n_parts, cap, k, seed):
        rng = np.random.RandomState(seed)
        # zipf-skew the uniform draw so certificates actually fire
        vals = [str(v * v // 37) for v in data]
        part_of = rng.randint(0, n_parts, size=len(vals))
        candidates: set[str] = set()
        total = 0
        for p in range(n_parts):
            pv = [v for v, pp in zip(vals, part_of) if pp == p]
            if not pv:
                continue
            cut = rng.randint(1, len(pv) + 1)
            batches = [pd.DataFrame({"__k": pv[:cut]}), pd.DataFrame({"__k": pv[cut:]})]
            out = list(_mg_sketch_partition(iter(batches), cap))[0]
            candidates |= set(out["__k"].dropna())
            total += int(out.loc[out["__k"].isnull(), "n"].iloc[0])
        assert total == len(vals)
        counts = pd.Series(vals).value_counts()
        recount = counts[counts.index.isin(candidates)]
        got = sorted(recount.items(), key=lambda t: (-t[1], t[0]))[:k]
        exact = len(got) == k and got[-1][1] > total / (cap + 1)
        if exact:
            certified[0] += 1
            truth = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[:k]
            assert got == truth

    run()
    assert certified[0] >= 10


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
