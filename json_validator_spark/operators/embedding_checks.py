"""Embedding-column validation — set-based checks over ``array<float>``.

The embedding analogue of ``set_checks.column_stats``: corpus-level
invariants a trained-embedding table must satisfy (finite, sane norms,
labels coherent in embedding space). All sequential-fold arithmetic
(``similarity._dot`` style) so the DuckDB oracle reproduces doubles
bit-for-bit.

- ``embedding_stats``: per-label count / norm min-mean-max / dimension
  check — ONE agg pass, map-side partials.
- ``label_centroid_similarity``: per-label mean cosine of members to
  their label centroid (two passes: dimension-wise centroid via
  posexplode+groupBy — k×dim shuffle rows — then a broadcast join back).
  Low intra-label similarity flags label noise / collapsed embeddings.
- ``embedding_violations``: rows violating hard invariants (dimension
  mismatch, non-finite values, norm bounds) as standard violation rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm(vec: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def embedding_stats(
    df: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label ``(label, n, dim_min, dim_max, norm_min, norm_avg,
    norm_max)`` in one aggregation pass."""
    norm = _norm(F.col(vec_col))
    return (
        df.select(F.col(label_col).alias("label"), F.size(vec_col).alias("dim"), norm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("dim").cast("long").alias("dim_min"),
            F.max("dim").cast("long").alias("dim_max"),
            F.round(F.min("nrm"), 6).alias("norm_min"),
            F.round(F.avg("nrm"), 6).alias("norm_avg"),
            F.round(F.max("nrm"), 6).alias("norm_max"),
        )
    )


def label_centroids(
    df: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """``(label, centroid array<double>)`` — dimension-wise mean via
    posexplode + groupBy (labels × dim shuffle rows), reassembled in
    order with array_sort on (dim, mean) structs."""
    per_dim = (
        df.select(F.col(label_col).alias("label"), F.posexplode(vec_col).alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("dim"), F.col("m")))
            ).alias("dm")
        )
        .select("label", F.transform("dm", lambda s: s["m"]).alias("centroid"))
    )


def label_centroid_similarity(
    df: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """``(label, n, avg_cos, min_cos)`` — each member's cosine to its
    label centroid; centroids broadcast back (tiny dimension table)."""
    cents = label_centroids(df, vec_col, label_col)
    dot = F.aggregate(
        F.zip_with(
            F.col(vec_col), F.col("centroid"), lambda a, b: a.cast("double") * b
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cnorm = F.sqrt(
        F.aggregate(F.col("centroid"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    cos = dot / (_norm(F.col(vec_col)) * cnorm)
    return (
        df.select(F.col(label_col).alias("label"), F.col(vec_col))
        .join(F.broadcast(cents), "label")
        .select("label", cos.alias("cos"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("cos"), 6).alias("avg_cos"),
            F.round(F.min("cos"), 6).alias("min_cos"),
        )
    )


def embedding_violations(
    df: DataFrame,
    expected_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    norm_min: float = 1e-6,
    norm_max: float = 1e6,
) -> DataFrame:
    """Hard invariants as standard violation rows ``(doc_id, span_path,
    rule_id, severity, message)`` — dimension mismatch, NaN/Inf
    components, norm out of bounds."""
    norm = _norm(F.col(vec_col))
    has_bad = F.exists(
        F.col(vec_col), lambda x: F.isnan(x.cast("double")) | (F.abs(x) == float("inf"))
    )
    checks = [
        ("dim.embedding", F.size(vec_col) != expected_dim, "unexpected embedding dimension"),
        ("finite.embedding", has_bad, "non-finite embedding component"),
        # norm applies only to finite vectors (NaN sorts above every
        # value in Spark, which would double-report non-finite rows)
        ("norm.embedding", ~has_bad & ~norm.between(norm_min, norm_max), "embedding norm out of bounds"),
    ]
    parts = [
        df.filter(fail).select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.lit(f"/{vec_col}").alias("span_path"),
            F.lit(rid).alias("rule_id"),
            F.lit("error").alias("severity"),
            F.lit(msg).alias("message"),
        )
        for rid, fail, msg in checks
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
