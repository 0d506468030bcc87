"""Deterministic corpus sampling & splitting — the data-mixture layer.

A pretraining pipeline mixes sources at configured rates (C4 / The Pile
style mixture weights) and carves held-out splits. Both are modeled as
pure NARROW operations: the keep/assign decision is a plan-constant
function of the document id (md5-based ``unit_uniform`` —
``functions/text.py``), never of partition id, sort order, or a random
seed held in executor state. Consequences at 100 TB scale:

- zero shuffle: a filter / projection over the scan, whole-stage codegen;
- reproducible: re-running the job (any cluster size, any partitioning)
  selects the identical sample — the same property that makes the
  N-vs-4N violation sets byte-identical;
- oracle-checkable: DuckDB reproduces the md5 arithmetic bit-for-bit
  (same discipline as every hash in this repo).

The reference has no sampling layer (it validates what it is given —
``ValidationRunner.java`` iterates the inputs exhaustively); this module
is part of the training-data pipeline extension alongside
``operators/dedup.py``.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from json_validator_spark.functions.text import unit_uniform


def _u(id_col: str, salt: str) -> Column:
    return unit_uniform(F.col(id_col), F.lit(salt))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Keep each row with its stratum's probability: mixture-weight
    downsampling (e.g. ``{"en": 0.5, "es": 0.25}``). Rows whose stratum
    is absent from ``fractions`` (including NULL strata) use
    ``default_fraction``. Pure filter — schema passes through."""
    frac: Column = F.lit(float(default_fraction))
    for value, f in fractions.items():
        frac = F.when(F.col(strata_col) == F.lit(value), F.lit(float(f))).otherwise(frac)
    return df.filter(_u(id_col, salt) < frac)


def hash_split(
    df: DataFrame,
    weights: Mapping[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split by cumulative weight
    over the id-hash uniform — the train/val/test carve. Weights must
    sum to ~1; the LAST split absorbs the remainder (so float dust never
    drops a row)."""
    if weights is None:
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    names = list(weights)
    bad = {k: w for k, w in weights.items() if not 0.0 <= w <= 1.0}
    if bad:
        raise ValueError(f"split weights must each be in [0, 1]: {bad}")
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1 (got {total}): {dict(weights)}")
    u = _u(id_col, salt)
    expr: Column = F.lit(names[-1])
    cum = 0.0
    conds = []
    for name in names[:-1]:
        cum += float(weights[name])
        conds.append((cum, name))
    for cum, name in reversed(conds):
        expr = F.when(u < F.lit(cum), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def cluster_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    weights: Mapping[str, float] | None = None,
    id_col: str = "doc_id",
    src_col: str = "doc_id_a",
    dst_col: str = "doc_id_b",
    salt: str = "split",
    split_col: str = "split",
    max_iter: int = 25,
) -> DataFrame:
    """Leakage-safe train/val/test carve: a plain per-doc ``hash_split``
    scatters near-duplicate documents across splits, so the held-out set
    contains near-copies of training documents and every eval on it is
    contaminated. Here the split key is the TRANSITIVE duplicate
    cluster, not the document: run ``connected_components`` over the
    near-dup pair graph, key every clustered doc by its cluster's
    canonical (min) id, unclustered docs by their own id, and apply the
    cumulative-weight hash assignment to that key — every member of a
    cluster lands in the same split by construction.

    Shape: the component table is (clustered docs)-sized — a small
    fraction of the corpus at realistic dup rates — so the label join
    is broadcast-eligible; the split assignment itself stays the same
    plan-constant narrow projection as ``hash_split``. Output: input
    schema + ``split``."""
    from json_validator_spark.operators.dedup import connected_components

    comp = (
        connected_components(pairs, src_col, dst_col, max_iter=max_iter)
        # reserved names: the input df may itself carry a component_id
        # column (e.g. a corpus already labeled by connected_components),
        # which would make the coalesce reference ambiguous
        .withColumnRenamed("node", "__cc_node")
        .withColumnRenamed("component_id", "__cc_comp")
    )
    labeled = df.join(comp, df[id_col] == F.col("__cc_node"), "left")
    keyed = labeled.select(
        *[F.col(c) for c in df.columns],
        F.coalesce(F.col("__cc_comp"), F.col(id_col)).alias("__ckey"),
    )
    return hash_split(
        keyed, weights, id_col="__ckey", salt=salt, split_col=split_col
    ).drop("__ckey")


def mixture_weights(
    df: DataFrame,
    strata_col: str,
    targets: Mapping[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Compute the per-stratum keep fractions that reshape the corpus
    TOKEN mixture toward ``targets`` (shares summing to 1) by
    downsampling only — the data-mixture design step (Pile/DoReMi-style
    source weighting) whose output feeds ``stratified_sample`` directly.

    For each stratum: raw ratio w_s = target_share / actual_token_share;
    keep_fraction = w_s / max_t(w_t), so the most under-represented
    target stratum is kept in full and everything else is downsampled
    proportionally — the unique only-downsampling solution that lands
    exactly on the target mixture (strata absent from ``targets``,
    including NULL, get target 0 and are dropped). Emits the audit
    columns, one row per observed stratum:
    ``(stratum, n_docs, n_tokens, token_share, target_share,
    keep_fraction)``.

    Shape: ONE partial-aggregated groupBy over a scan (the stratum
    count is the number of sources/languages — tiny); the share/max
    arithmetic runs as windows over that tiny grouped result, never at
    corpus scale."""
    from pyspark.sql import Window

    from json_validator_spark.functions.text import tokens

    bad = {k: w for k, w in targets.items() if not 0.0 <= w <= 1.0}
    if bad:
        raise ValueError(f"target shares must each be in [0, 1]: {bad}")
    total_share = sum(targets.values())
    if not 0.999 <= total_share <= 1.001:
        raise ValueError(
            f"target shares must sum to 1 (got {total_share}): {dict(targets)}"
        )
    # greatest(·, 0) pins legacy size(NULL) = -1 (Spark 3.x with
    # spark.sql.legacy.sizeOfNull) and NULL alike to 0 tokens, matching
    # the DuckDB oracle which skips NULL texts
    per = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(
            F.sum(F.greatest(F.size(tokens(F.col(text_col))), F.lit(0))), F.lit(0)
        ).alias("n_tokens"),
    )
    target: Column = F.lit(0.0)
    for value, share in targets.items():
        target = F.when(F.col("stratum") == F.lit(value), F.lit(float(share))).otherwise(
            target
        )
    w_all = Window.partitionBy()
    tok_share = F.col("n_tokens") / F.sum("n_tokens").over(w_all)
    raw = F.when(tok_share > 0, target / tok_share).otherwise(F.lit(0.0))
    # max(raw) = 0 means no target stratum exists in the corpus: emit
    # keep = 0 everywhere instead of a silent NaN cascade
    max_raw = F.max(raw).over(w_all)
    keep = F.when(max_raw > 0, F.round(raw / max_raw, 6)).otherwise(F.lit(0.0))
    return per.select(
        "stratum",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(tok_share, 6).alias("token_share"),
        target.alias("target_share"),
        keep.alias("keep_fraction"),
    )


def resample_to_mixture(
    df: DataFrame,
    strata_col: str,
    targets: Mapping[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """End-to-end mixture apply: ``mixture_weights`` computes the
    per-stratum keep fractions, then every document is kept iff its
    plan-deterministic md5 uniform falls under its stratum's fraction —
    the corpus lands (in expectation, exactly at scale) on the target
    token mixture in ONE pass. Schema passes through.

    Shape: the weights table is strata-sized (a handful of rows) and
    broadcast; the keep decision is the same narrow md5 filter as
    ``stratified_sample`` — zero shuffle on the corpus side, so the
    operator is scan-bound at 100 TB. The aggregation pass that computes
    the weights is the one tiny groupBy from ``mixture_weights``.
    Strata absent from ``targets`` (including NULL) get fraction 0 and
    drop out; the null-safe join keys NULL strata correctly."""
    from json_validator_spark.functions.text import unit_uniform

    weights = mixture_weights(df, strata_col, targets, text_col, id_col).select(
        F.col("stratum").alias("__mix_stratum"),
        F.col("keep_fraction").alias("__mix_keep"),
    )
    joined = df.join(
        F.broadcast(weights),
        F.col(strata_col).eqNullSafe(F.col("__mix_stratum")),
        "left",
    )
    u = unit_uniform(F.col(id_col), F.lit(salt))
    return joined.filter(u < F.coalesce(F.col("__mix_keep"), F.lit(0.0))).select(
        *df.columns
    )


def frequency_cap(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group frequency capping — keep at most ``cap`` rows per
    group, chosen DETERMINISTICALLY (md5-of-id order, id tiebreak): the
    domain-balancing step of a pretraining pipeline (no single source /
    domain may dominate the mixture), and the "at most N examples per
    cluster" rule of cluster-balanced sampling. Schema passthrough.

    Shape: one window keyed on the group (rank ≤ cap). The md5 sort key
    makes the kept set independent of partitioning and arrival order.
    Skew note: a window sorts each group on one task, so a viral group
    (10^9 rows under one domain) serializes there; the at-scale
    refinement is a two-phase cap — per-group counts → keep rows with
    md5-uniform < slack·cap/n (survivors ≈ slack·cap per group) → this
    exact window over the survivors — same result whenever the slack
    retains ≥ cap candidates; apply it when group sizes are unbounded."""
    from pyspark.sql import Window as W

    from json_validator_spark.functions.text import hash_hex

    w = W.partitionBy(group_col).orderBy(
        hash_hex(F.col(id_col)), F.col(id_col).cast("string")
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )
