"""Information-theoretic checks — entropy and mutual information.

Training-data quality questions that frequency thresholds can't answer:
"is this column degenerate?" (near-zero entropy), "does this feature
leak the label?" (high mutual information between a feature column and
a label/split column — the classic target-leakage and split-contamination
detector). Both reduce to ONE partial-aggregated groupBy over the joint
histogram; every downstream frame is category-count-sized.

Cross-engine float discipline (the ``lm_scores`` contract): every
``p·log2`` term is rounded to 6 decimals BEFORE the sum and the final
statistic to 4, so per-engine libm last-ulp differences and summation
order cannot flip the result — the quantization is part of the metric's
contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NULL_CAT = "\x00null"


def _plogp(cnt: Column, total: Column) -> Column:
    """round6(p · log2(p)) for one histogram cell."""
    p = cnt.cast("double") / total.cast("double")
    return F.round(p * F.log2(p), 6)


def _entropy_of(hist: DataFrame, cnt_col: str) -> Column:
    """−Σ round6(p·log2 p) over a histogram frame carrying ``__t``."""
    return F.round(-F.sum(_plogp(F.col(cnt_col), F.col("__t"))), 4)


def column_entropy(df: DataFrame, cols: list[str]) -> DataFrame:
    """Shannon entropy (bits) per column: ``(column, n_distinct, n,
    entropy)``, one row per requested column. NULL is counted as its
    own category (a 99%-NULL column is nearly degenerate and should
    score near zero, not look healthy after dropping NULLs). Zero
    entropy = constant column — the degenerate-feature check.

    Shape: one groupBy per column over that column's histogram
    (partial-agg; the shuffle carries distinct values only), then a
    category-count-sized entropy agg; the grand total rides a window
    over the HISTOGRAM, never the corpus."""
    from pyspark.sql import Window as W

    outs = []
    for c in cols:
        hist = (
            df.select(
                F.coalesce(F.col(c).cast("string"), F.lit(_NULL_CAT)).alias("v")
            )
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        withtot = hist.withColumn("__t", F.sum("cnt").over(W.partitionBy()))
        outs.append(
            withtot.agg(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_distinct"),
                F.max("__t").alias("n"),
                _entropy_of(withtot, "cnt").alias("entropy"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def mutual_information(
    df: DataFrame,
    col_a: Column | str,
    col_b: Column | str,
    name_a: str | None = None,
    name_b: str | None = None,
) -> DataFrame:
    """Mutual information between two (categorical or pre-bucketed)
    columns, one output row: ``(col_a, col_b, n, h_a, h_b, h_ab, mi,
    nmi)`` — ``mi = h_a + h_b − h_ab`` (bits), ``nmi = mi /
    min(h_a, h_b)``. NULLs are their own category on both sides. High
    nmi between a feature and a label/split column is the
    target-leakage smell; nmi ≈ 0 certifies independence.

    Shape: ONE groupBy builds the joint (a, b) histogram — the only
    corpus-sized exchange, partial-aggregated — and everything else is
    window sums OVER THE JOINT frame folded into a single terminal agg:
    marginal cell counts ride ``partitionBy(a)`` / ``partitionBy(b)``
    windows and each marginal's entropy term is counted once per
    category via a row_number gate. ONE FileScan in the plan (asserted
    in tests) — a naive crossJoin of separately-aggregated h_a/h_b/h_ab
    frames would recompute the joint (and rescan the corpus) per
    branch, Spark does not CSE across DataFrame reuse."""
    from pyspark.sql import Window as W

    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    na = name_a or (col_a if isinstance(col_a, str) else "a")
    nb = name_b or (col_b if isinstance(col_b, str) else "b")
    joint = (
        df.select(
            F.coalesce(a.cast("string"), F.lit(_NULL_CAT)).alias("a"),
            F.coalesce(b.cast("string"), F.lit(_NULL_CAT)).alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cells = joint.select(
        "cnt",
        F.sum("cnt").over(W.partitionBy()).alias("__t"),
        F.sum("cnt").over(W.partitionBy("a")).alias("__ca"),
        F.sum("cnt").over(W.partitionBy("b")).alias("__cb"),
        F.row_number().over(W.partitionBy("a").orderBy("b")).alias("__rna"),
        F.row_number().over(W.partitionBy("b").orderBy("a")).alias("__rnb"),
    )
    one = cells.agg(
        F.lit(na).alias("col_a"),
        F.lit(nb).alias("col_b"),
        F.max("__t").alias("n"),
        F.round(
            -F.sum(F.when(F.col("__rna") == 1, _plogp(F.col("__ca"), F.col("__t")))),
            4,
        ).alias("h_a"),
        F.round(
            -F.sum(F.when(F.col("__rnb") == 1, _plogp(F.col("__cb"), F.col("__t")))),
            4,
        ).alias("h_b"),
        F.round(-F.sum(_plogp(F.col("cnt"), F.col("__t"))), 4).alias("h_ab"),
    )
    mi = F.round(F.col("h_a") + F.col("h_b") - F.col("h_ab"), 4)
    return one.select(
        "col_a", "col_b", "n", "h_a", "h_b", "h_ab",
        mi.alias("mi"),
        F.when(
            F.least("h_a", "h_b") > 0.0,
            F.round(
                (F.col("h_a") + F.col("h_b") - F.col("h_ab"))
                / F.least("h_a", "h_b"),
                4,
            ),
        ).otherwise(F.lit(0.0)).alias("nmi"),
    )
