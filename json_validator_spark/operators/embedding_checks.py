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


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    bits: int = 8,
) -> DataFrame:
    """Scalar (per-dimension min/max) int quantization of an embedding
    column — the storage/index-build step an ANN system runs before
    sharding vectors: ``(vec_id, codes array<int>, max_abs_err,
    within_bound)`` where ``within_bound`` asserts the reconstruction
    error never exceeds half a quantization step (+1e-9 rounding slack), per dimension — the
    correctness invariant of round-to-nearest scalar quantization.

    Shape: per-dimension min/max in ONE agg pass of ``2*dim`` aggregate
    expressions over indexed array access (no explode — the shuffle
    carries one 2*dim-value partial per partition), constants
    cross-joined back as a single broadcast row, then a narrow
    projection quantizes every vector. All arithmetic is float64 with
    explicit floor(x+0.5) rounding so DuckDB reproduces codes and
    errors bit-for-bit. Constant dimensions (min == max) map to code 0
    with zero error."""
    v = F.col(vec_col)
    levels = (1 << bits) - 1
    stats = df.agg(
        *[F.min(v[i].cast("double")).alias(f"__lo{i}") for i in range(dim)],
        *[F.max(v[i].cast("double")).alias(f"__hi{i}") for i in range(dim)],
    )
    joined = df.select(F.col(id_col).alias("vec_id"), v.alias("__v")).crossJoin(
        F.broadcast(stats)
    )
    codes, errs = [], []
    for i in range(dim):
        lo, hi = F.col(f"__lo{i}"), F.col(f"__hi{i}")
        x = F.col("__v")[i].cast("double")
        scale = (hi - lo) / F.lit(float(levels))
        code = F.when(hi == lo, F.lit(0)).otherwise(
            F.least(
                F.greatest(F.floor((x - lo) / scale + F.lit(0.5)), F.lit(0)),
                F.lit(levels),
            )
        ).cast("int")
        recon = F.when(hi == lo, lo).otherwise(lo + code.cast("double") * scale)
        codes.append(code)
        errs.append(F.abs(x - recon))
        # half-step bound: |err| <= scale/2 (+ tiny fp slack); constant dims exact
        errs[-1] = F.round(errs[-1], 9)
    max_err = F.greatest(*errs) if dim > 1 else errs[0]
    # per-dimension bound: each dimension's error against ITS OWN
    # half-step (a wide dimension's slack must not mask a narrow
    # dimension's violation), ANDed across dimensions
    # 1e-9 slack: errs are reported rounded to 9 decimals, which can
    # round an exactly-half-step error up by as much as 5e-10
    bounds = [
        errs[i]
        <= (F.col(f"__hi{i}") - F.col(f"__lo{i}")) / F.lit(2.0 * levels)
        + F.lit(1e-9)
        for i in range(dim)
    ]
    within = bounds[0]
    for b in bounds[1:]:
        within = within & b
    return joined.select(
        "vec_id",
        F.array(*codes).alias("codes"),
        F.round(max_err, 6).alias("max_abs_err"),
        within.alias("within_bound"),
    )
