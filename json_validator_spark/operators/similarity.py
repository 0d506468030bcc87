"""Similarity search over embedding columns (``array<float>``).

Three tiers, matching how an ANN service scales on Spark:

1. ``cosine_topk`` — exact brute force as Catalyst expressions
   (``zip_with`` dot product + window top-k). The correctness baseline;
   also the DuckDB-oracle-checkable path (sequential fold ⇒ bit-stable
   double arithmetic in both engines).
2. ``cosine_topk_numpy`` — exact brute force via ``mapInPandas``:
   queries broadcast to every partition, one BLAS matmul per Arrow
   batch, per-partition top-k then global top-k. This is the 100 TB
   shape — compute streams past the data, only ``n_queries × k`` rows
   per partition hit the final shuffle.
3. ``lsh_topk`` — approximate: sign-random-projection bucket per
   vector (deterministic md5-derived hyperplanes), candidates =
   same-bucket (or ≤1-bit-off) vectors, exact rerank inside buckets.
   Sub-linear probe cost; the IVF-style scale path.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product — same evaluation order as the DuckDB
    oracle's list_sum(list_transform(...)), so doubles match bitwise."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query: ``(query_id, neighbor_id, rank,
    sim)``. ``queries`` must be small — it is broadcast, making the
    "join" a narrow map over the corpus; the only shuffle is the window
    top-k on ``n_queries × n_vectors`` scored rows, which AQE coalesces.
    Self-matches (same id) are excluded."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    scored = (
        vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v"))
        .join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("v")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def cosine_topk_numpy(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force exact ANN, vectorized: one ``numpy`` matmul per Arrow
    batch against the (broadcast) query matrix, partial top-k inside the
    batch, global top-k as a tiny window. At 1000 executors this is the
    plan you want: the corpus is scanned once, Python sees Arrow batches
    only, and the shuffle carries ``partitions × n_queries × k`` rows."""
    import numpy as np

    q_rows = queries.select(query_id_col, vec_col).collect()
    q_ids = [r[0] for r in q_rows]
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    sc = vectors.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, q_norm))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, qn = bq.value
        for batch in batches:
            if not len(batch):
                continue
            v = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
            vn = v / np.linalg.norm(v, axis=1, keepdims=True)
            sims = vn @ qn.T  # (batch, n_queries)
            n_keep = min(k + 1, sims.shape[0])
            top = np.argpartition(-sims, n_keep - 1, axis=0)[:n_keep]
            out = {
                "query_id": [],
                "neighbor_id": [],
                "sim": [],
            }
            vec_ids = batch[id_col].to_numpy()
            for qi, qid in enumerate(ids):
                rows = top[:, qi]
                out["query_id"].extend([qid] * len(rows))
                out["neighbor_id"].extend(vec_ids[rows])
                out["sim"].extend(sims[rows, qi])
            yield pd.DataFrame(out)

    partial = vectors.select(id_col, vec_col).mapInPandas(
        score, schema="query_id long, neighbor_id long, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        partial.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


# ----------------------------------------------------------------------
# IVF (inverted-file / coarse k-means) buckets
# ----------------------------------------------------------------------

def kmeans_centroids(
    vectors: DataFrame,
    k: int,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic coarse k-means (the IVF codebook). Init = the k
    lowest-id vectors (reproducible, no RNG); each iteration is one
    Arrow-batched assignment pass + one posexplode/groupBy centroid
    update (dimension-wise mean — tiny shuffle: k × dim rows). Returns a
    numpy array (k, dim); at 100 TB you train on a sample and broadcast."""
    import numpy as np

    cents = np.array(
        [
            r[vec_col]
            for r in vectors.orderBy(id_col).limit(k).collect()
        ],
        dtype=np.float64,
    )
    sc = vectors.sparkSession.sparkContext
    for _ in range(iters):
        bc = sc.broadcast(cents)

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            c = bc.value
            cn = c / np.linalg.norm(c, axis=1, keepdims=True)
            for batch in batches:
                if not len(batch):
                    continue
                v = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
                vn = v / np.linalg.norm(v, axis=1, keepdims=True)
                cl = (vn @ cn.T).argmax(axis=1)
                yield pd.DataFrame(
                    {"cluster": cl, vec_col: batch[vec_col]}
                )

        assigned = vectors.select(vec_col).mapInPandas(
            assign, schema=f"cluster int, {vec_col} array<float>"
        )
        upd = (
            assigned.select("cluster", F.posexplode(vec_col).alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = cents.copy()
        by_cluster: dict[int, dict[int, float]] = {}
        for r in upd:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = r["m"]
        for ci, dims in by_cluster.items():
            for d, m in dims.items():
                new[ci, d] = m
        cents = new
    return cents


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: assign the corpus to its nearest coarse
    centroid (one Arrow pass), probe each query's ``n_probe`` nearest
    clusters, exact cosine rerank inside the probed lists. The probe
    join is ``cluster IN (...)`` against a broadcast query list — the
    corpus never shuffles, and each query scans ≈ n_probe/n_clusters of
    it. Recall is tunable via n_probe."""
    import numpy as np

    cents = kmeans_centroids(vectors, n_clusters, id_col=id_col, vec_col=vec_col)
    sc = vectors.sparkSession.sparkContext
    bc = sc.broadcast(cents)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        cn = c / np.linalg.norm(c, axis=1, keepdims=True)
        for batch in batches:
            if not len(batch):
                continue
            v = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
            vn = v / np.linalg.norm(v, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "neighbor_id": batch[id_col],
                    "cluster": (vn @ cn.T).argmax(axis=1),
                    "v": batch[vec_col],
                }
            )

    assigned = vectors.select(id_col, vec_col).mapInPandas(
        assign, schema=f"neighbor_id long, cluster int, v array<float>"
    )

    q_rows = queries.select(query_id_col, vec_col).collect()
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    probe_rows = []
    for r in q_rows:
        qv = np.array(r[vec_col], dtype=np.float64)
        qn = qv / np.linalg.norm(qv)
        order = (cn @ qn).argsort()[::-1][:n_probe]
        for cl in order:
            probe_rows.append((int(r[query_id_col]), int(cl), [float(x) for x in qv]))
    probes = vectors.sparkSession.createDataFrame(
        probe_rows, "query_id long, cluster int, q_vec array<float>"
    )

    scored = (
        assigned.join(F.broadcast(probes), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("v")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
        .distinct()
    )


# ----------------------------------------------------------------------
# LSH (sign random projection) buckets
# ----------------------------------------------------------------------

def _hyperplane_sign(vec: Column, dim: int, plane: int) -> Column:
    """Sign of <vec, h_plane> where h_plane[j] ∈ {-1,+1} derives from
    md5(plane:j) parity — deterministic, no stored model, reproducible
    in the DuckDB oracle."""
    signs = F.array(
        *[
            F.when(
                F.lit(int_parity(plane, j)), F.lit(1.0)
            ).otherwise(F.lit(-1.0))
            for j in range(dim)
        ]
    )
    proj = F.aggregate(
        F.zip_with(vec, signs, lambda x, s: x.cast("double") * s),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (proj >= 0).cast("int")


def int_parity(plane: int, j: int) -> bool:
    """Driver-side: parity bit of md5('plane:j') — fixed at plan-build
    time, so the hyperplanes are constants folded into the plan."""
    h = hashlib.md5(f"{plane}:{j}".encode()).hexdigest()
    return (int(h[:2], 16) & 1) == 1


def with_lsh_bucket(
    df: DataFrame, dim: int, n_planes: int = 8, vec_col: str = "embedding"
) -> DataFrame:
    """Append ``bucket`` — the n_planes-bit sign signature. Narrow."""
    bucket = sum(
        (
            _hyperplane_sign(F.col(vec_col), dim, p) * F.lit(1 << p)
            for p in range(n_planes)
        ),
        start=F.lit(0),
    )
    return df.withColumn("bucket", bucket.cast("int"))


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, exact
    cosine rerank within the bucket. Probes one bucket (≈ n/2^planes of
    the corpus); recall is tunable via ``n_planes``. The join is on
    ``bucket`` — co-partitioned, no broadcast of the corpus, no
    all-pairs product."""
    v = with_lsh_bucket(
        vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v")),
        dim, n_planes, "v",
    )
    q = with_lsh_bucket(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        ),
        dim, n_planes, "q_vec",
    )
    scored = (
        v.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("v")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )
