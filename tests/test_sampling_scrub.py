"""Unit tests for the sampling/splitting and PII-scrub pipeline ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from json_validator_spark.operators.sampling import hash_split, stratified_sample
from json_validator_spark.operators.scrub import pii_scrub


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, ["en", "es", "fr", "xx", None][i % 5]) for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_stratified_sample_rates_and_determinism(spark, corpus):
    fr = {"en": 0.5, "es": 0.25, "fr": 0.0}
    out = stratified_sample(corpus, "lang", fr, default_fraction=0.1)
    got = out.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in got}
    # 400 docs per stratum; md5 uniform → binomial, generous bounds
    assert 140 <= by_lang.get("en", 0) <= 260
    assert 60 <= by_lang.get("es", 0) <= 140
    assert "fr" not in by_lang  # 0.0 keeps nothing
    assert 15 <= by_lang.get("xx", 0) <= 70  # default 0.1
    assert 15 <= by_lang.get(None, 0) <= 70  # NULL stratum → default
    # identical selection across runs and partitionings
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in stratified_sample(
        corpus.repartition(13), "lang", fr, default_fraction=0.1).collect()}
    assert a == b


def test_hash_split_partition_and_weights(spark, corpus):
    out = hash_split(corpus)
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 2000  # exactly one split per row
    assert 1500 <= counts["train"] <= 1700
    assert 120 <= counts["val"] <= 280
    assert 120 <= counts["test"] <= 280
    # deterministic assignment, invariant to partitioning
    a = {(r["doc_id"], r["split"]) for r in out.collect()}
    b = {(r["doc_id"], r["split"]) for r in hash_split(corpus.repartition(7)).collect()}
    assert a == b
    with pytest.raises(ValueError):
        hash_split(corpus, {"train": 0.5, "val": 0.1})
    with pytest.raises(ValueError):  # sums to 1 but individually degenerate
        hash_split(corpus, {"train": 1.5, "val": -0.5})


def test_pii_scrub_counts_and_replacement(spark):
    rows = [
        (0, "write to alice.smith+x@mail.example.org today"),
        (1, "call 555-123-4567 or 555-765-4321"),
        (2, "clean text with no pii at all"),
        (3, None),
        (4, "both a@b.co and 111-222-3333 here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (out[0]["n_emails"], out[0]["n_phones"]) == (1, 0)
    assert out[0]["scrubbed"] == "write to [EMAIL] today"
    assert (out[1]["n_emails"], out[1]["n_phones"]) == (0, 2)
    assert out[1]["scrubbed"] == "call [PHONE] or [PHONE]"
    assert (out[2]["n_emails"], out[2]["n_phones"]) == (0, 0)
    assert out[2]["scrubbed"] == rows[2][1]
    assert out[3]["n_emails"] is None and out[3]["scrubbed"] is None
    assert (out[4]["n_emails"], out[4]["n_phones"]) == (1, 1)
    assert out[4]["scrubbed"] == "both [EMAIL] and [PHONE] here"


def test_sampling_plans_are_narrow(spark, corpus):
    """Both ops must stay pure narrow scan work — no Exchange anywhere."""
    for op in (
        stratified_sample(corpus, "lang", {"en": 0.5}),
        hash_split(corpus),
        pii_scrub(corpus.withColumn("text", F.lit("x"))),
    ):
        plan = op._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_pack_sequences_invariants(spark):
    """Boundary-packing contract: every doc in exactly one sequence,
    seq_offset < budget (a doc STARTS inside the budget; overflow past
    the boundary is carried by the doc itself), offsets equal the
    doc_id-ordered exclusive cumsum within (shard, seq_id), and the
    assignment is identical under a different input partitioning."""
    from json_validator_spark.operators.packing import pack_sequences, sequence_stats

    rows = [(i, "tok " * (5 + i % 40)) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    budget = 64
    out = pack_sequences(docs, budget=budget, n_shards=4).collect()
    assert len(out) == 300 and len({r["doc_id"] for r in out}) == 300
    assert all(0 <= r["seq_offset"] < budget for r in out)
    from collections import defaultdict
    # full reconstruction: within a shard, walking sequences in order and
    # docs in doc_id order, every offset equals the exclusive running
    # token sum modulo the budget boundary rule (cum // budget = seq_id,
    # cum % budget = seq_offset)
    shard_docs = defaultdict(list)
    for r in out:
        shard_docs[r["shard"]].append(r)
    for rows_in in shard_docs.values():
        rows_in.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rows_in:
            assert r["seq_id"] == cum // budget
            assert r["seq_offset"] == cum % budget
            cum += r["n_tokens"]
    # determinism across partitionings
    again = pack_sequences(docs.repartition(17), budget=budget, n_shards=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # stats rollup: fill ratios near 1 except each shard's tail sequence
    stats = sequence_stats(
        pack_sequences(docs, budget=budget, n_shards=4), budget
    ).collect()
    assert sum(r["n_docs"] for r in stats) == 300
    per_shard_max = defaultdict(int)
    for r in stats:
        per_shard_max[r["shard"]] = max(per_shard_max[r["shard"]], r["seq_id"])
    # boundary rule: a non-tail sequence spans one full budget window,
    # shifted by at most one document's overflow on each side
    max_doc = max(r["n_tokens"] for r in out)
    for r in stats:
        if r["seq_id"] < per_shard_max[r["shard"]]:
            assert r["fill_ratio"] >= (budget - max_doc) / budget
            assert r["fill_ratio"] <= (budget + max_doc) / budget


def test_cluster_safe_split_no_leakage(spark):
    from json_validator_spark.operators.sampling import cluster_safe_split

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(200)], "doc_id long, text string"
    )
    # chains {0,1,2}, {10,11}, plus a bigger star around 50
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)] + [(50, x) for x in range(51, 60)],
        "doc_id_a long, doc_id_b long",
    )
    out = cluster_safe_split(docs, pairs).collect()
    split = {r["doc_id"]: r["split"] for r in out}
    assert len(split) == 200 and set(split.values()) <= {"train", "val", "test"}
    # every cluster member shares its cluster's split
    assert split[0] == split[1] == split[2]
    assert split[10] == split[11]
    assert len({split[x] for x in range(50, 60)}) == 1
    # unclustered docs keep the plain hash_split assignment
    plain = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    for d in (5, 99, 150):
        assert split[d] == plain[d]


def test_mixture_weights_exact_targets(spark):
    from json_validator_spark.operators.sampling import mixture_weights

    docs = spark.createDataFrame(
        [(i, ["en", "en", "en", "es"][i % 4], "alpha beta gamma") for i in range(400)],
        "doc_id long, lang string, text string",
    )
    out = {r["stratum"]: r for r in mixture_weights(docs, "lang", {"en": 0.5, "es": 0.5}).collect()}
    # en has 3x the docs of es (token mix identical) -> en downsampled to ~1/3
    assert out["es"]["keep_fraction"] == 1.0
    assert out["en"]["keep_fraction"] == pytest.approx(1 / 3, abs=1e-5)
    # achieved mixture = target: share_s * keep_s proportional to targets
    en = out["en"]["token_share"] * out["en"]["keep_fraction"]
    es = out["es"]["token_share"] * out["es"]["keep_fraction"]
    assert en / (en + es) == pytest.approx(0.5, abs=1e-5)
    # token accounting is real
    assert out["en"]["n_docs"] == 300 and out["es"]["n_docs"] == 100


def test_cluster_safe_split_component_id_column(spark):
    """The input corpus may already carry a component_id column (e.g.
    previously labeled by connected_components): the internal label join
    must not become ambiguous, and the passthrough column survives."""
    from json_validator_spark.operators.sampling import cluster_safe_split

    docs = spark.createDataFrame(
        [(i, f"text {i}", i * 10) for i in range(20)],
        "doc_id long, text string, component_id long",
    )
    pairs = spark.createDataFrame([(0, 1)], "doc_id_a long, doc_id_b long")
    out = cluster_safe_split(docs, pairs).collect()
    assert len(out) == 20
    split = {r["doc_id"]: r["split"] for r in out}
    assert split[0] == split[1]
    assert all(r["component_id"] == r["doc_id"] * 10 for r in out)


def test_mixture_weights_validation_and_absent_targets(spark):
    from json_validator_spark.operators.sampling import mixture_weights

    docs = spark.createDataFrame(
        [(i, "en", "alpha beta") for i in range(10)],
        "doc_id long, lang string, text string",
    )
    # shares must sum to 1 and each lie in [0, 1]
    with pytest.raises(ValueError, match="sum to 1"):
        mixture_weights(docs, "lang", {"en": 0.3})
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        mixture_weights(docs, "lang", {"en": 1.5, "es": -0.5})
    # no target stratum present in the corpus: keep = 0 everywhere, not NaN
    out = mixture_weights(docs, "lang", {"fr": 1.0}).collect()
    assert [r["keep_fraction"] for r in out] == [0.0]


def test_resample_to_mixture_lands_on_targets(spark):
    from json_validator_spark.operators.sampling import resample_to_mixture

    rows = [
        (i, ["en", "en", "en", "es", None][i % 5], "alpha beta gamma delta")
        for i in range(5000)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = resample_to_mixture(docs, "lang", {"en": 0.5, "es": 0.5}).collect()
    assert set(r.__fields__[0] for r in out[:1]) == {"doc_id"}  # schema passthrough
    by_lang = {}
    for r in out:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    # NULL stratum (no target) fully dropped
    assert None not in by_lang
    # uniform text -> doc mixture ~ token mixture ~ 50/50 within binomial noise
    total = by_lang["en"] + by_lang["es"]
    assert abs(by_lang["en"] / total - 0.5) < 0.06
    # es is the scarcest target stratum: kept in full (1000 of 1000)
    assert by_lang["es"] == 1000
    # deterministic across partitionings
    again = resample_to_mixture(
        docs.repartition(13), "lang", {"en": 0.5, "es": 0.5}
    ).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in again)


def test_global_shuffle_is_exact_permutation(spark):
    """Sharded rank == the literal global rank by (md5 key, id): the
    positions are exactly 0..n-1, match a driver-side sort, are
    partitioning-invariant, and a different salt gives a different
    permutation."""
    import hashlib

    from json_validator_spark.operators.packing import global_shuffle

    n = 400
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(n)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["position"] for r in global_shuffle(docs).collect()}
    assert sorted(out.values()) == list(range(n))
    expected = sorted(range(n), key=lambda i: (hashlib.md5(f"{i}:shuf".encode()).hexdigest(), i))
    assert out == {doc: pos for pos, doc in enumerate(expected)}
    again = {
        r["doc_id"]: r["position"]
        for r in global_shuffle(docs.repartition(13)).collect()
    }
    assert again == out
    epoch2 = {r["doc_id"]: r["position"] for r in global_shuffle(docs, salt="e2").collect()}
    assert sorted(epoch2.values()) == list(range(n)) and epoch2 != out


def test_materialize_sequences_matches_assignment(spark):
    """The apply step agrees row-for-row with pack_sequences: same
    (shard, seq_id) groups, text concatenated in doc_id order, token
    totals preserved; deterministic across partitioning."""
    from json_validator_spark.operators.packing import (
        materialize_sequences,
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (1 + i % 7))) for i in range(200)],
        "doc_id long, text string",
    )
    packed = pack_sequences(docs, budget=16, n_shards=4).collect()
    seqs = materialize_sequences(docs, budget=16, n_shards=4).collect()
    by_seq: dict = {}
    for r in sorted(packed, key=lambda r: (r["shard"], r["seq_id"], r["doc_id"])):
        by_seq.setdefault((r["shard"], r["seq_id"]), []).append(r)
    assert len(seqs) == len(by_seq)
    texts = {i: f'{" ".join(["w"] * (1 + i % 7))}' for i in range(200)}
    for s in seqs:
        members = by_seq[(s["shard"], s["seq_id"])]
        assert s["n_docs"] == len(members)
        assert s["tokens_total"] == sum(m["n_tokens"] for m in members)
        assert s["text"] == " ".join(texts[m["doc_id"]] for m in members)
    again = materialize_sequences(docs.repartition(11), budget=16, n_shards=4)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, seqs))


def test_review_fixes_shuffle_materialize(spark):
    """Review regressions: (a) global_shuffle with 8-hex shards (the
    large-corpus setting) must not overflow the shard cast; (b) NULL-
    text members concatenate without a doubled separator, matching
    string_agg semantics."""
    from json_validator_spark.operators.packing import (
        global_shuffle,
        materialize_sequences,
    )

    docs = spark.createDataFrame(
        [(i, "w x y") for i in range(50)], "doc_id long, text string"
    )
    out = global_shuffle(docs, shard_hex_chars=8).collect()
    assert sorted(r["position"] for r in out) == list(range(50))
    nd = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "d e f")], "doc_id long, text string"
    )
    seqs = materialize_sequences(nd, budget=1000, n_shards=1).collect()
    assert len(seqs) == 1
    assert seqs[0]["text"] == "a b c d e f"  # no double separator
    assert seqs[0]["n_docs"] == 3            # the NULL doc still counts


def test_frequency_cap_deterministic_and_partition_invariant(spark):
    from json_validator_spark.operators.sampling import frequency_cap

    rows = [(f"doc-{i:03d}", "big" if i < 46 else "small") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    out = frequency_cap(df, "source", cap=5, id_col="doc_id")
    kept = sorted(r["doc_id"] for r in out.collect())
    # big capped at 5; small (4 rows, under the cap) fully kept
    per = {s: sum(1 for r in out.collect() if r["source"] == s)
           for s in ("big", "small")}
    assert per == {"big": 5, "small": 4}
    # deterministic under repartitioning
    kept7 = sorted(r["doc_id"] for r in
                   frequency_cap(df.repartition(7), "source", 5).collect())
    assert kept7 == kept
    # schema passthrough
    assert out.columns == ["doc_id", "source"]
