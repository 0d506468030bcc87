"""Tests for the training-data pipeline operators: text analysis,
dedup (exact / jaccard / minhash / simhash), similarity, media plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from json_validator_spark.operators import dedup, media, similarity, text_checks
from tests.conftest import rows_set


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
        (3, "spark schema rule check table row column batch"),
        (4, "spark schema rule check table row column batch"),  # exact dup of 3
        (5, "el la de que y los se un documento"),
        (6, "zz"),                                             # too short
        (7, None),                                             # null text
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_stats(spark, docs):
    out = {r["doc_id"]: r for r in text_checks.token_stats(docs).collect()}
    assert out[1]["n_ws_tokens"] == 9
    assert out[1]["n_distinct_tokens"] == 8  # 'the' twice
    assert out[6]["n_ws_tokens"] == 1
    assert out[7]["n_ws_tokens"] == -1 or out[7]["n_ws_tokens"] is None or out[7]["n_ws_tokens"] == 0


def test_quality_scores(spark, docs):
    out = {r["doc_id"]: r for r in text_checks.quality_scores(docs, min_tokens=5).collect()}
    assert out[1]["keep"] is True
    assert out[6]["keep"] is False
    assert 0 < out[1]["stopword_ratio"] < 1
    assert out[1]["dup_token_ratio"] == pytest.approx(1 / 9, abs=1e-6)


def test_language_id(spark, docs):
    out = {r["doc_id"]: r for r in text_checks.language_id(docs).collect()}
    assert out[1]["pred_lang"] == "en"
    assert out[5]["pred_lang"] == "es"
    assert out[3]["pred_lang"] == "und"


def test_winnow_fingerprints_deterministic(spark, docs):
    fp1 = rows_set(text_checks.winnow_fingerprints(docs, k=5, window=3))
    fp2 = rows_set(text_checks.winnow_fingerprints(docs, k=5, window=3))
    assert fp1 == fp2 and len(fp1) > 0
    # identical docs share identical fingerprint sets
    by_doc = {}
    for doc_id, fp in fp1:
        by_doc.setdefault(doc_id, set()).add(fp)
    assert by_doc[3] == by_doc[4]


def test_exact_duplicates(spark, docs):
    out = dedup.exact_duplicates(docs).collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 2 and out[0]["keep_doc_id"] == 3


def test_ngram_jaccard_pairs(spark, docs):
    out = dedup.ngram_jaccard_pairs(docs, k=2, threshold=0.4).collect()
    pairs = {(r["doc_id_a"], r["doc_id_b"]): r["jaccard"] for r in out}
    assert (1, 2) in pairs and 0.4 <= pairs[(1, 2)] < 1.0
    assert pairs[(3, 4)] == 1.0


def test_minhash_neardup(spark, docs):
    out = dedup.minhash_neardup_pairs(docs, k=2, n_hashes=16, n_bands=8, threshold=0.4)
    pairs = {(r["doc_id_a"], r["doc_id_b"]) for r in out.collect()}
    assert (3, 4) in pairs  # exact dup always caught
    assert (1, 2) in pairs  # near dup caught at 8 bands of 2


def test_simhash_neardup(spark, docs):
    sims = dedup.simhash(docs)
    vals = {r["doc_id"]: r["simhash"] for r in sims.collect()}
    assert vals[3] == vals[4] != 0
    pairs = dedup.simhash_neardup_pairs(sims, max_hamming=16, n_bands=4).collect()
    got = {(r["doc_id_a"], r["doc_id_b"]): r["hamming"] for r in pairs}
    assert got.get((3, 4)) == 0


@pytest.fixture(scope="module")
def vectors(spark):
    import math
    rows = []
    for i in range(40):
        base = [math.sin(0.1 * i + j) for j in range(8)]
        rows.append((i, [float(x) for x in base]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_matches_numpy(spark, vectors):
    queries = vectors.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = similarity.cosine_topk(vectors, queries, k=5)
    b = similarity.cosine_topk_numpy(vectors, queries, k=5)
    assert rows_set(a) == rows_set(b)
    assert a.count() == 15


def test_lsh_topk_subset(spark, vectors):
    queries = vectors.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r["query_id"], r["neighbor_id"]) for r in
             similarity.cosine_topk(vectors, queries, k=5).collect()}
    approx = similarity.lsh_topk(vectors, queries, dim=8, k=5, n_planes=4).collect()
    assert len(approx) > 0
    # approximate neighbors must at least be real vectors w/ valid sims
    for r in approx:
        assert -1.0 <= r["sim"] <= 1.0 and r["neighbor_id"] != r["query_id"]
    # sanity: decent recall on this tiny smooth dataset
    hits = sum(1 for r in approx if (r["query_id"], r["neighbor_id"]) in exact)
    assert hits >= len(approx) * 0.2


def test_media_pipeline(spark):
    from json_validator_spark.sources.synth import synth_media_catalog

    catalog = synth_media_catalog(spark, catalog_size=50)
    m = media.synth_media_table(spark, catalog, payload_bytes=64)
    assert dict(m.dtypes)["payload"] == "binary"
    feats = media.decode_features(m, dim=8)
    rows = feats.collect()
    assert len(rows) == catalog.count()
    for r in rows[:5]:
        assert r["n_bytes"] == 64
        assert len(r["feature"]) == 8
        assert 0 <= r["byte_entropy_proxy"] <= 8.0
    # determinism
    assert rows_set(feats.select("media_ref", "byte_mean")) == rows_set(
        media.decode_features(m, dim=8).select("media_ref", "byte_mean")
    )


def test_frame_sample(spark):
    from json_validator_spark.sources.synth import synth_media_catalog

    catalog = synth_media_catalog(spark, catalog_size=20)
    m = media.synth_media_table(spark, catalog, payload_bytes=16)
    frames = media.frame_sample(m, every_ms=10000).collect()
    assert len(frames) >= 20  # ≥1 frame per media row
    for r in frames[:5]:
        assert r["frame_offset_ms"] == r["frame_idx"] * 10000


def test_ivf_topk(spark, vectors):
    queries = vectors.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r["query_id"], r["neighbor_id"]) for r in
             similarity.cosine_topk(vectors, queries, k=5).collect()}
    approx = similarity.ivf_topk(vectors, queries, k=5, n_clusters=4, n_probe=2).collect()
    assert len(approx) > 0
    per_q = {}
    for r in approx:
        assert -1.0 <= r["sim"] <= 1.0 and r["neighbor_id"] != r["query_id"]
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # smooth dataset + 2/4 probes → decent recall
    hits = sum(1 for r in approx if (r["query_id"], r["neighbor_id"]) in exact)
    assert hits >= len(approx) * 0.4


def test_embedding_checks(spark):
    from json_validator_spark.operators import embedding_checks as ec

    rows = [
        (1, [3.0, 4.0], 0),          # norm 5
        (2, [3.0, 4.0], 0),          # identical → cos 1 to centroid
        (3, [0.0, 1.0], 1),
        (4, [0.0, 2.0], 1),          # same direction → cos 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    stats = {r["label"]: r for r in ec.embedding_stats(df).collect()}
    assert stats[0]["norm_min"] == stats[0]["norm_max"] == 5.0
    assert stats[1]["dim_min"] == 2

    sim = {r["label"]: r for r in ec.label_centroid_similarity(df).collect()}
    assert sim[0]["avg_cos"] == pytest.approx(1.0, abs=1e-6)
    assert sim[1]["avg_cos"] == pytest.approx(1.0, abs=1e-6)

    bad = spark.createDataFrame(
        [(9, [1.0, 2.0, 3.0], 0), (10, [float("nan"), 1.0], 0), (11, [0.0, 0.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    v = ec.embedding_violations(bad, expected_dim=2)
    got = {(r["doc_id"], r["rule_id"]) for r in v.collect()}
    assert got == {("9", "dim.embedding"), ("10", "finite.embedding"), ("11", "norm.embedding")}


def test_lsh_neardup_pairs_subset_of_exact(spark, vectors):
    """Bucketed near-dup pairs are a strict subset of brute-force pairs
    at the same threshold (exact rerank inside buckets), with recall."""
    exact = (
        vectors.alias("a")
        .join(vectors.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"),
            F.round(
                similarity.cosine(F.col("a.embedding"), F.col("b.embedding")), 6
            ).alias("sim"),
        )
        .filter(F.col("sim") >= 0.9)
    )
    exact_pairs = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    got = similarity.lsh_neardup_pairs(
        vectors, dim=8, threshold=0.9, n_planes=3, n_tables=2
    ).collect()
    got_pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert len(got) == len(got_pairs)  # distinct() dedups multi-table hits
    assert got_pairs <= exact_pairs
    assert len(got_pairs) >= max(1, int(0.3 * len(exact_pairs)))  # recall floor


def test_kmeans_centroids_sampled_deterministic(spark, vectors):
    """Codebook training is bounded + deterministic: the hash-sampled
    driver-side k-means returns identical centroids across calls and
    respects max_train."""
    import numpy as np

    c1 = similarity.kmeans_centroids(vectors, k=4, max_train=20)
    c2 = similarity.kmeans_centroids(vectors, k=4, max_train=20)
    assert np.array_equal(c1, c2)
    out = similarity.ivf_topk(
        vectors,
        vectors.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        k=5, n_clusters=4, n_probe=2, max_train=20,
    )
    assert out.count() > 0


def test_boilerplate_stats(spark, docs):
    """Segments shared by the exact-dup pair (docs 3,4) reach min_df=2;
    unique docs score 0; null-text doc gets a 0-segment row."""
    out = {
        r["doc_id"]: r
        for r in text_checks.boilerplate_stats(docs, k=4, min_df=2).collect()
    }
    assert len(out) == 7  # one row per input doc, including empties
    # docs 3/4: identical 8-token text → two 4-token segments each, both
    # appearing twice corpus-wide → fully boilerplate
    for d in (3, 4):
        assert out[d]["n_segments"] == 2
        assert out[d]["n_boilerplate"] == 2
        assert out[d]["boilerplate_ratio"] == 1.0
    # doc 5 is unique → no segment repeats
    assert out[5]["n_boilerplate"] == 0
    assert out[7]["n_segments"] == 0 and out[7]["boilerplate_ratio"] == 0.0


def test_contamination_overlap(spark, docs):
    """Doc 2 (near-dup of benchmark doc 1) shares shingles; unrelated
    docs score 0; flag respects min_overlap."""
    bench = docs.filter(F.col("doc_id") == 1)
    corpus = docs.filter(F.col("doc_id") != 1)
    out = {
        r["doc_id"]: r
        for r in text_checks.contamination_overlap(
            corpus, bench, k=3, min_overlap=2
        ).collect()
    }
    assert len(out) == 6
    # doc 2 differs from doc 1 only in the last token → shares the first
    # 6 of its 7 3-shingles
    assert out[2]["n_overlap"] == 6 and out[2]["contaminated"]
    assert out[3]["n_overlap"] == 0 and not out[3]["contaminated"]
    assert out[7]["n_overlap"] == 0 and not out[7]["contaminated"]


def test_plan_shapes_scale_paths(spark, docs, vectors):
    """The scale-path operators must never degenerate into all-pairs
    products: LSH near-dup joins hash-partitioned on bucket, and the
    contamination probe broadcasts the benchmark side."""
    pairs = similarity.lsh_neardup_pairs(vectors, dim=8, threshold=0.9, n_planes=3, n_tables=2)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    cont = text_checks.contamination_overlap(
        docs.filter(F.col("doc_id") != 1), docs.filter(F.col("doc_id") == 1)
    )
    cplan = cont._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in cplan  # bench shingles ship, postings stream
    assert "CartesianProduct" not in cplan


def test_plan_shapes_narrow_text_ops(spark, docs):
    """Round-3 plan regressions stay fixed (VERDICT r02 #1/#2): winnow
    is shuffle-free end-to-end (no Exchange, no Window — the sliding
    min runs per-doc inside mapInPandas), and quality/language_id
    tokenize exactly once per row (one split() in the optimized plan,
    not one per referencing output column)."""
    w = text_checks.winnow_fingerprints(docs, k=5, window=3)
    wplan = w._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in wplan and "Window" not in wplan

    for op in (
        text_checks.quality_scores(docs),
        text_checks.language_id(docs),
    ):
        oplan = op._jdf.queryExecution().optimizedPlan().toString()
        assert oplan.count("split(") == 1


def test_repetition_stats(spark):
    rows = [
        (1, "a b a b a b"),        # 5 bigrams: "a b"x3, "b a"x2 → top 3/5
        (2, "w x y z"),            # 3 bigrams, all distinct
        (3, "solo"),               # <2 tokens → 0 bigrams
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text_checks.repetition_stats(df, n=2).collect()}
    assert len(out) == 4
    assert out[1]["n_bigrams"] == 5 and out[1]["n_distinct_bigrams"] == 2
    assert out[1]["top_bigram_frac"] == 0.6 and out[1]["dup_bigram_ratio"] == 0.6
    assert out[2]["dup_bigram_ratio"] == 0.0 and out[2]["top_bigram_frac"] == round(1 / 3, 6)
    assert out[3]["n_bigrams"] == 0 and out[4]["n_bigrams"] == 0


def test_ivf_recall_floor(spark, vectors):
    """Quantified recall for the approximate IVF path (its driver query
    is rows-only, so the recall bar lives here): probing 2 of 4 coarse
    clusters must recover at least 60% of the exact top-5 neighbor set
    on the smooth test vectors, and all similarities must be exact."""
    queries = vectors.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(vectors, queries, k=5).collect()
    }
    approx = similarity.ivf_topk(
        vectors, queries, k=5, n_clusters=4, n_probe=2, max_train=40
    ).collect()
    hits = {(r["query_id"], r["neighbor_id"]) for r in approx} & exact
    assert len(hits) >= 0.6 * len(exact)
    # the reported sims must equal the exact cosine for the same pairs
    exact_sims = {
        (r["query_id"], r["neighbor_id"]): r["sim"]
        for r in similarity.cosine_topk(vectors, queries, k=39).collect()
    }
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_sims:
            assert abs(r["sim"] - exact_sims[key]) < 1e-9


def test_lsh_hot_bucket_star_guard(spark):
    """A viral duplicate cluster larger than max_bucket emits O(n) star
    pairs anchored at the min doc_id instead of C(n,2) — connectivity
    (what dedup needs) preserved, the quadratic blow-up is not."""
    n = 30
    dup_docs = spark.createDataFrame(
        [(i, "same viral content repeated " * 3) for i in range(n)],
        "doc_id long, text string",
    )
    sigs = dedup.minhash_signatures(dup_docs)
    star = dedup.lsh_candidate_pairs(sigs, max_bucket=5).collect()
    assert len(star) == n - 1                       # O(n), not 435
    assert all(r["doc_id_a"] == 0 for r in star)    # anchored at min id
    assert {r["doc_id_b"] for r in star} == set(range(1, n))
    # the verified pipeline still flags every copy against the survivor
    pairs = dedup.minhash_neardup_pairs(dup_docs, threshold=0.9, max_bucket=5)
    assert pairs.count() == n - 1
    # under the cap nothing changes: exact all-pairs candidates
    full = dedup.lsh_candidate_pairs(sigs, max_bucket=1000).collect()
    assert len(full) == n * (n - 1) // 2


def test_media_codecs_roundtrip():
    """PPM and WAV encode→decode roundtrips are exact, and features come
    from the REAL decoded content (no stub in this path)."""
    import numpy as np

    from json_validator_spark.operators import media_codecs as mc

    rgb = np.zeros((4, 6, 3), dtype=np.uint8)
    rgb[..., 0] = 200  # constant red
    p = mc.encode_ppm(rgb)
    assert np.array_equal(mc.decode_ppm(p), rgb)
    f = mc.ppm_features(p)
    assert (f["width"], f["height"]) == (6, 4)
    assert f["mean_r"] == 200.0 and f["mean_g"] == 0.0

    t = np.arange(8000, dtype=np.float64) / 8000.0
    samples = (0.5 * 32767 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    w = mc.encode_wav(samples, 8000)
    rate, back = mc.decode_wav(w)
    assert rate == 8000 and np.array_equal(back, samples)
    wf = mc.wav_features(w)
    assert wf["duration_ms"] == 1000
    assert abs(wf["rms"] - 0.5 / (2 ** 0.5)) < 0.01  # sine RMS = A/sqrt(2)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        mc.decode_ppm(b"NOTAPPM")
    with _pytest.raises(ValueError):
        mc.decode_wav(b"RIFFxxxxJUNK")


def test_decode_media_features_end_to_end(spark):
    """Catalog → real PPM/WAV payloads → real decode: every well-formed
    payload decodes with mime-appropriate features; the deterministic
    corrupted refs surface as decode_ok=false with an error message."""
    from json_validator_spark.operators.media import (
        decode_media_features,
        synth_decodable_media,
    )
    from json_validator_spark.sources.synth import synth_media_catalog

    cat = synth_media_catalog(spark, catalog_size=300)
    media = synth_decodable_media(spark, cat)
    out = decode_media_features(media).collect()
    assert len(out) == cat.count()
    ok = [r for r in out if r["decode_ok"]]
    bad = [r for r in out if not r["decode_ok"]]
    assert len(ok) > 0.9 * len(out) and bad  # corruption path exercised
    for r in ok:
        if r["mime_type"].startswith("image/"):
            assert (r["width"], r["height"]) == (16, 12)
            assert 0.0 <= r["brightness"] <= 1.0 and r["duration_ms"] is None
        else:
            assert 50 <= r["duration_ms"] <= 90 and r["width"] is None
            assert 0.3 < r["rms"] < 0.4  # 0.5-amplitude sine ≈ 0.3536
    assert all(r["decode_error"] for r in bad)


def test_dedup_apply_steps(spark, docs):
    """drop_exact_duplicates keeps the min-id survivor per content group
    with all columns intact; drop_near_duplicates removes the greater
    member of every pair."""
    kept = dedup.drop_exact_duplicates(docs)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 3 in ids and 4 not in ids          # exact dup pair → min survives
    assert {1, 2, 5, 6} <= ids                # near-dups/uniques untouched
    assert set(kept.columns) == set(docs.columns)

    pairs = spark.createDataFrame(
        [(1, 2, 0.95), (3, 4, 1.0)], "doc_id_a long, doc_id_b long, jaccard double"
    )
    survivors = {r["doc_id"] for r in dedup.drop_near_duplicates(docs, pairs).collect()}
    assert survivors == {1, 3, 5, 6, 7}


def test_lsh_neardup_hot_bucket_guard(spark):
    """An exact-duplicate embedding flood above max_bucket emits O(n)
    hub-anchored pairs instead of C(n,2), all with exact sim 1.0."""
    rows = [(i, [1.0, 0.5, 0.25, 0.1, 0.9, 0.3, 0.7, 0.2]) for i in range(24)]
    dup_vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = similarity.lsh_neardup_pairs(
        dup_vecs, dim=8, threshold=0.99, n_planes=3, n_tables=2, max_bucket=5
    ).collect()
    assert len(pairs) == 23
    assert all(r["id_a"] == 0 and r["sim"] == 1.0 for r in pairs)


def test_zero_vector_never_wins_topk(spark):
    """A degenerate all-zero embedding scores sim=0 (not NaN) and never
    displaces real neighbors from the top-k in any tier."""
    import math
    rows = [(i, [math.sin(0.1 * i + j) for j in range(8)]) for i in range(20)]
    rows.append((99, [0.0] * 8))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = vecs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for fn in (similarity.cosine_topk, similarity.cosine_topk_numpy):
        out = fn(vecs, queries, k=5).collect()
        assert all(r["neighbor_id"] != 99 for r in out), fn.__name__
        assert all(not (r["sim"] != r["sim"]) for r in out)  # no NaN


def test_connected_components_transitive(spark):
    """Chain 1-2-3-4 (no direct 1~4 edge), triangle 10-11-12, isolated
    pair 20-21: min-label CC must close the chain transitively, which
    the edge-greedy apply step cannot. Also: long path (pointer jumping
    must converge within max_iter) and determinism across reruns."""
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    # a 12-node path 100..111 — diameter 11, converges only if pointer
    # jumping actually doubles path lengths (plain propagation would
    # need 11 rounds; give it headroom but assert correctness)
    edges += [(100 + i, 101 + i) for i in range(11)]
    pairs = spark.createDataFrame(edges, "doc_id_a long, doc_id_b long")
    out = dedup.connected_components(pairs)
    got = {r["node"]: r["component_id"] for r in out.collect()}
    expect = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    expect.update({100 + i: 100 for i in range(12)})
    assert got == expect
    # deterministic on rerun
    again = {r["node"]: r["component_id"] for r in dedup.connected_components(pairs).collect()}
    assert again == expect


def test_connected_components_random_vs_union_find(spark):
    """Differential check: 3 seeded random graphs vs a driver-side
    union-find. Guards the iterative pointer-jumping against convergence
    bugs that a hand-built fixture would not reach (cross-linking
    between partially-collapsed stars, duplicate edges, self-loops)."""
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n = 400
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(300)]
        # reference: union-find with path compression
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # min-id per component, only for nodes that appear in an edge
        touched = {v for e in edges for v in e}
        comp_min: dict[int, int] = {}
        for v in touched:
            r = find(v)
            comp_min[r] = min(comp_min.get(r, v), v)
        expect = {v: comp_min[find(v)] for v in touched}

        pairs = spark.createDataFrame(edges, "doc_id_a long, doc_id_b long")
        got = {
            r["node"]: r["component_id"]
            for r in dedup.connected_components(pairs).collect()
        }
        assert got == expect, f"seed {seed}"


def test_drop_cluster_duplicates_chain(spark):
    """Edges (1,3), (2,3) — the case that actually distinguishes the two
    apply policies: edge-greedy ``drop_near_duplicates`` only drops
    right-hand nodes ({3}), keeping BOTH 1 and 2 although they are
    transitively linked through 3; the cluster apply keeps only the
    canonical min (1). Singletons outside the graph survive untouched."""
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in (1, 2, 3, 9)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 3), (2, 3)], "doc_id_a long, doc_id_b long")
    kept = sorted(r["doc_id"] for r in dedup.drop_cluster_duplicates(docs, pairs).collect())
    assert kept == [1, 9]
    greedy = sorted(
        r["doc_id"] for r in dedup.drop_near_duplicates(docs, pairs).collect()
    )
    assert greedy == [1, 2, 9]
    # chains converge too: 1~2, 2~3 gives the same cluster answer
    chain = spark.createDataFrame([(1, 2), (2, 3)], "doc_id_a long, doc_id_b long")
    kept2 = sorted(r["doc_id"] for r in dedup.drop_cluster_duplicates(docs, chain).collect())
    assert kept2 == [1, 9]


def test_vocab_topk(spark, docs):
    out = text_checks.vocab_topk(docs, k=3).collect()
    got = [(r["rank"], r["token"], r["n"]) for r in out]
    # 'the' appears twice in docs 1 and 2; the n=2 ties break
    # lexicographically (batch < brown < check < ...).
    assert got == [(1, "the", 4), (2, "batch", 2), (3, "brown", 2)]


def test_lm_scores(spark, docs):
    import math

    out = {r["doc_id"]: r for r in text_checks.lm_scores(docs).collect()}
    # doc 6 = single token 'zz' with tf=1: mean_lp = 0 - round(ln(total),6)
    total = 9 + 9 + 8 + 8 + 9 + 1  # tokens across docs 1..6
    assert out[6]["n_tokens"] == 1
    assert out[6]["mean_lp"] == pytest.approx(round(-round(math.log(total), 6), 4))
    # null-text doc: no tokens, null score, null keep
    assert out[7]["n_tokens"] == 0 and out[7]["mean_lp"] is None and out[7]["keep"] is None
    # docs of common tokens score higher than the rare-token doc
    assert out[1]["mean_lp"] > out[6]["mean_lp"]
    # exact duplicates get identical scores
    assert out[3]["mean_lp"] == out[4]["mean_lp"]


def test_substring_dup_stats(spark, docs):
    out = {
        r["doc_id"]: r
        for r in text_checks.substring_dup_stats(docs, k=5, window=3).collect()
    }
    # docs 3 and 4 are byte-identical: every fingerprint shared
    assert out[3]["shared_ratio"] == 1.0 and out[3]["flagged"] is True
    assert out[4]["shared_ratio"] == 1.0
    # docs 1 and 2 share a 40-char prefix >= k+window-1=7 chars: the
    # winnowing guarantee forces at least one common fingerprint
    assert out[1]["n_shared"] > 0 and out[2]["n_shared"] > 0
    # doc 5 shares no substring with anything
    assert out[5]["n_shared"] == 0 and out[5]["flagged"] is False
    # short/null docs produce zero fingerprints and are not flagged
    assert out[6]["n_fingerprints"] == 0 and out[6]["flagged"] is False
    assert out[7]["n_fingerprints"] == 0


def test_connected_components_nonconvergence_raises(spark):
    """Exhausting max_iter with labels still moving returns WRONG
    components — the guard must fail loudly instead (a long path graph
    cannot settle in one round)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 9)], "doc_id_a long, doc_id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, max_iter=1)
    with pytest.raises(ValueError, match="max_iter"):
        dedup.connected_components(pairs, max_iter=0)


def test_incremental_neardup_and_accept(spark, docs):
    """Incremental ingest: exact copy of a corpus doc is rejected, a
    fresh doc is accepted, and an intra-batch duplicate pair keeps only
    its min-id member."""
    new_rows = [
        (101, "spark schema rule check table row column batch"),  # = corpus 3/4
        (102, "totally fresh content about distributed validation engines"),
        (103, "totally fresh content about distributed validation engines"),
        (104, None),  # null text: no shingles, always accepted
    ]
    new_df = spark.createDataFrame(new_rows, "doc_id long, text string")
    pairs = dedup.incremental_neardup_pairs(
        new_df, docs, k=2, n_hashes=16, n_bands=8, threshold=0.9
    )
    got = {(r["new_doc_id"], r["corpus_doc_id"]): r["jaccard"] for r in pairs.collect()}
    assert got.get((101, 3)) == 1.0 and got.get((101, 4)) == 1.0
    assert all(nid == 101 for nid, _ in got)  # fresh docs match nothing
    kept = dedup.accept_new_documents(
        new_df, docs, k=2, n_hashes=16, n_bands=8, threshold=0.9
    )
    assert {r["doc_id"] for r in kept.collect()} == {102, 104}
    # all original columns pass through
    assert kept.columns == new_df.columns


def test_incremental_hot_bucket_guard(spark):
    """A corpus band bucket over max_bucket collapses to its min-id
    representative: each probing new doc gains ONE candidate edge per
    hot bucket instead of |bucket|."""
    n = 20
    corpus = spark.createDataFrame(
        [(i, "same viral content repeated " * 3) for i in range(n)],
        "doc_id long, text string",
    )
    new_df = spark.createDataFrame(
        [(100, "same viral content repeated " * 3)], "doc_id long, text string"
    )
    new_sigs = dedup.minhash_signatures(new_df)
    corpus_sigs = dedup.minhash_signatures(corpus)
    cand = dedup.incremental_candidate_pairs(new_sigs, corpus_sigs, max_bucket=5)
    got = cand.collect()
    assert len(got) == 1 and got[0]["corpus_doc_id"] == 0  # the representative
    # under the cap: every bucket member is a candidate
    full = dedup.incremental_candidate_pairs(new_sigs, corpus_sigs, max_bucket=1000)
    assert full.count() == n
    # the verified probe still rejects the duplicate new doc either way
    kept = dedup.accept_new_documents(new_df, corpus, threshold=0.9, max_bucket=5)
    assert kept.count() == 0


def test_filter_pipeline_reasons(spark):
    """Composed cleaning recipe: each reason code fires on the doc built
    to trip it, reasons are fixed-order, and a clean doc keeps."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and then the "
            "dog naps while the fox keeps running through fields"),  # clean en
        (2, "short text"),                                           # too_short
        (3, " ".join(["dup"] * 30)),                                 # dup+repetition
        (4, "xyzzy plugh quux corge grault garply waldo fred plugh "
            "thud foo bar baz qux quux corge grault garply waldo fred"),  # lang (und)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in text_checks.filter_pipeline(
            docs, min_tokens=5, max_dup_ratio=0.6,
            allowed_langs=("en",), max_top_bigram_frac=0.5,
            max_boilerplate_ratio=2.0,  # boilerplate disabled for this tiny frame
        ).collect()
    }
    assert out[1]["keep"] is True and out[1]["drop_reasons"] == ""
    # 2 tokens, no en stopwords; its single bigram is also 100% of bigrams
    assert out[2]["drop_reasons"] == "too_short,lang,repetition"
    assert out[3]["keep"] is False
    assert out[3]["drop_reasons"] == "dup_tokens,lang,repetition"  # fixed order
    assert out[4]["drop_reasons"] == "lang" and out[4]["pred_lang"] == "und"
    assert set(out) == {1, 2, 3, 4}  # one verdict per doc


def test_bpe_pair_counts_and_training(spark):
    """Pair counts match hand-computation; iterative training's first
    merge equals the top candidate pair; merges apply transitively
    (merged symbols pair up in later rounds); determinism across
    partitioning."""
    rows = [(1, "aab aab bc"), (2, "aab bc bc")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # words: aab x3, bc x3 -> pairs: 'a a' 3, 'a b' 3, 'b c' 3
    cand = text_checks.bpe_merge_candidates(docs, k=10).collect()
    got = [(r["rank"], r["pair"], r["n"]) for r in cand]
    assert got == [(1, "a a", 3), (2, "a b", 3), (3, "b c", 3)]
    merges = text_checks.train_bpe_merges(docs, n_merges=3)
    # round 1: 'a a' (lexicographic tie-break) -> aab becomes (aa, b)
    # round 2: pairs {('aa','b'): 3, ('b','c'): 3} -> ('aa','b') wins
    # round 3: only ('b','c') remains
    assert merges == [("a", "a"), ("aa", "b"), ("b", "c")]
    again = text_checks.train_bpe_merges(docs.repartition(7), n_merges=3)
    assert again == merges
    # exhausting all pairs stops early instead of looping
    assert len(text_checks.train_bpe_merges(docs, n_merges=50)) < 50


def test_quantize_embeddings_invariants(spark):
    """Scalar quantization: extremes map to code 0/levels, constant
    dims to code 0 with zero error, every reconstruction stays within
    half a quantization step."""
    from json_validator_spark.operators.embedding_checks import quantize_embeddings

    rows = [
        (1, [0.0, 5.0, -1.0, 7.0]),
        (2, [10.0, 5.0, 1.0, 7.0]),
        (3, [5.0, 5.0, 0.0, 7.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in quantize_embeddings(df, dim=4).collect()}
    assert out[1]["codes"][0] == 0 and out[2]["codes"][0] == 255  # extremes
    assert [o["codes"][1] for o in out.values()] == [0, 0, 0]     # constant dim
    assert out[3]["codes"][2] == 128                               # 0.0 in [-1,1] -> midpoint
    assert all(o["within_bound"] for o in out.values())
    # max error bounded by half the largest step: (10-0)/255/2 ≈ 0.0196
    # (1e-6 slack: max_abs_err is reported rounded to 6 decimals)
    assert all(o["max_abs_err"] <= 10.0 / 255 / 2 + 1e-6 for o in out.values())


def test_filter_pipeline_null_text_too_short(spark):
    """NULL text counts as 0 tokens: too_short fires exactly as for an
    empty doc instead of NULL-comparing to never-fire."""
    docs = spark.createDataFrame(
        [(1, None), (2, "!!!")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in text_checks.filter_pipeline(
            docs, min_tokens=5, allowed_langs=("en", "und"),
            max_top_bigram_frac=2.0, max_boilerplate_ratio=2.0,
        ).collect()
    }
    assert out[1]["n_tokens"] == 0 and "too_short" in out[1]["drop_reasons"]
    assert out[2]["n_tokens"] == 0 and "too_short" in out[2]["drop_reasons"]


def test_tfidf_top_terms(spark):
    """TF-IDF: a corpus-wide term scores ln(1)=0, rare terms dominate,
    ranks are contiguous per doc, tie-break lexicographic."""
    import math

    rows = [
        (1, "common rare1 common"),
        (2, "common rare2"),
        (3, "common"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = text_checks.tfidf_top_terms(docs, k=3).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 'common' appears in all 3 docs -> idf = ln(3/3) = 0
    for r in out:
        if r["term"] == "common":
            assert r["score"] == 0.0 and r["df"] == 3
    # rare terms (df=1) outrank 'common' despite tf=2 for doc 1
    assert by_doc[1][0]["term"] == "rare1"
    assert by_doc[1][0]["score"] == pytest.approx(math.log(3.0), abs=1e-6)
    assert by_doc[2][0]["term"] == "rare2"
    for docid, terms in by_doc.items():
        assert [t["rank"] for t in terms] == list(range(1, len(terms) + 1))


def test_plan_shapes_new_ops(spark, docs):
    """Plan regressions for the late-round operators: filter_pipeline's
    fused narrow branch tokenizes each row exactly once per scan (one
    split() per of the 3 scans: fused quality+lang, repetition,
    boilerplate — not one per referencing output column), and tfidf /
    global_shuffle never sort globally (no single-partition Exchange
    feeding a corpus-sized Window/Sort)."""
    from json_validator_spark.operators.packing import global_shuffle

    fp = text_checks.filter_pipeline(docs)
    fplan = fp._jdf.queryExecution().optimizedPlan().toString()
    # one tokenization per scan: fused quality+lang (1), repetition (1),
    # boilerplate's self-frequency join (2 — it reads the segment scan
    # on both sides by design). A per-output-column re-tokenization
    # regression would push this to 10+.
    assert fplan.count("split(") == 4

    tf = text_checks.tfidf_top_terms(docs, k=3)
    tplan = tf._jdf.queryExecution().executedPlan().toString()
    # the top-k window is keyed on doc_id (the only single-partition
    # exchange is the 1-row corpus-count aggregate)
    assert "hashpartitioning(doc_id" in tplan

    gs = global_shuffle(docs)
    gplan = gs._jdf.queryExecution().executedPlan().toString()
    # the only single-partition exchange allowed is the tiny <=4096-row
    # shard-offset cumsum; the data-path window must be hash-partitioned
    assert "hashpartitioning(__shard" in gplan


def test_fuzzy_key_pairs(spark):
    from json_validator_spark.operators.dedup import fuzzy_key_pairs

    rows = [
        ("alice",), ("alice",), ("alise",),   # substitution, tf 2 vs 1
        ("bob",), ("bobb",),                  # insertion
        ("carol",), ("darrel",),              # distance > 1: no pair
        ("ab",),                              # below min_len: ignored
        (None,),
    ]
    df = spark.createDataFrame(rows, "k string")
    out = {(r["key_a"], r["key_b"]): (r["n_a"], r["n_b"])
           for r in fuzzy_key_pairs(df, "k", min_len=3).collect()}
    assert set(out) == {("alice", "alise"), ("bob", "bobb")}
    assert out[("alice", "alise")] == (2, 1)
    # identical keys are ONE histogram row — never paired with themselves
    assert ("alice", "alice") not in out


def test_containment_vs_jaccard_asymmetry(spark):
    """A short doc quoted inside a long one: containment ~= 1 while
    Jaccard stays low — the case the symmetric measure misses."""
    from json_validator_spark.operators.dedup import (
        containment_pairs, ngram_jaccard_pairs)

    short = "alpha beta gamma delta epsilon zeta"
    long_ = short + " " + " ".join(f"word{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, short), (2, long_), (3, "totally different content here")],
        "doc_id long, text string",
    )
    cont = containment_pairs(df, k=3, threshold=0.8, max_df=None).collect()
    assert len(cont) == 1
    r = cont[0]
    assert (r["doc_id_a"], r["doc_id_b"]) == (1, 2)
    assert r["containment"] == 1.0
    # the same pair under Jaccard scores low
    jac = ngram_jaccard_pairs(df, k=3, threshold=0.0001, max_df=None).collect()
    j12 = [x for x in jac if (x["doc_id_a"], x["doc_id_b"]) == (1, 2)][0]
    assert j12["jaccard"] < 0.15


def test_quantize_embeddings_per_dim_bound(spark):
    """ADVICE r03 #3: within_bound must compare each dimension's error
    against its OWN half-step — a wide dimension's slack cannot mask a
    narrow dimension's violation. With correct round-to-nearest codes
    every per-dim bound holds even when ranges differ by 1000x."""
    from json_validator_spark.operators.embedding_checks import quantize_embeddings

    rows = [
        (1, [0.0, 0.000]),
        (2, [1000.0, 0.001]),
        (3, [333.3, 0.0007]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in quantize_embeddings(df, dim=2).collect()}
    # per-dim half-steps: 1000/510 ≈ 1.96 and 0.001/510 ≈ 1.96e-6; the
    # narrow dim's error must be judged against the SMALL bound
    assert all(o["within_bound"] for o in out.values())
    for o in out.values():
        assert o["max_abs_err"] <= 1000.0 / 510 + 1e-9


def test_normalize_text_forms(spark):
    """NFC recomposes e+U+0301; NFKC additionally folds compatibility
    characters (ligature fi); nulls pass through; bad form raises."""
    from json_validator_spark.operators.text_checks import normalize_text

    rows = [(0, "café"), (1, "café"), (2, "ﬁsh"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    nfc = {r.doc_id: (r.norm_text, r.changed) for r in normalize_text(df).collect()}
    assert nfc[0] == ("café", True)
    assert nfc[1] == ("café", False)
    assert nfc[2] == ("ﬁsh", False)       # NFC keeps the ligature
    assert nfc[3] == (None, None)
    nfkc = {r.doc_id: r.norm_text for r in normalize_text(df, form="NFKC").collect()}
    assert nfkc[2] == "fish"                    # NFKC folds it
    import pytest as _pytest

    with _pytest.raises(ValueError, match="normalization form"):
        normalize_text(df, form="NFX")
