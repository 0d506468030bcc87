"""Input preprocessing — the S5 JSONPath-preprocessor analogue.

The reference can apply a per-type JSONPath expression to the input
before validation (``ValidationSpecs.java:87-130``, read at ``:109``).
On a typed span table the same capability is pointer-driven projection
and span filtering — all narrow Column expressions, applied *lazily*
exactly like the reference's on-first-use normalization
(``ValidationSpecs.java:96-106``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pointer_project(df: DataFrame, pointer: str, doc_id: str = "doc_id") -> DataFrame:
    """Extract the value(s) at a JSON-pointer-style path into
    ``(doc_id, span_path, value)`` rows.

    - ``/col``            → one row per doc
    - ``/spans/3/text``   → positional element field
    - ``/spans/*/text``   → one row per span (posexplode keeps the index
      so ``span_path`` stays addressable)
    """
    parts = pointer.strip("/").split("/")
    if len(parts) >= 2 and parts[1] == "*":
        fld = parts[2] if len(parts) > 2 else None
        ex = df.select(
            F.col(doc_id).alias("doc_id"), F.posexplode(parts[0]).alias("i", "s")
        )
        val = F.col("s")[fld] if fld else F.col("s")
        suffix = f"/{fld}" if fld else ""
        return ex.select(
            "doc_id",
            F.concat(
                F.lit(f"/{parts[0]}/"), F.col("i").cast("string"), F.lit(suffix)
            ).alias("span_path"),
            val.alias("value"),
        )
    col: Column = F.col(parts[0])
    for p in parts[1:]:
        # F.get (not []) — ANSI mode throws on out-of-range positions;
        # a missing position must read as null (absent), like the
        # reference's pointer resolution on short arrays.
        col = F.get(col, int(p)) if p.isdigit() else col[p]
    return df.select(
        F.col(doc_id).alias("doc_id"),
        F.lit(pointer).alias("span_path"),
        col.alias("value"),
    )


def filter_spans(df: DataFrame, kind: str, spans_col: str = "spans") -> DataFrame:
    """Keep only spans of one kind *inside* each document — the
    projection analogue of a ``$.spans[?(@.kind=='text')]`` preprocess.
    Span order within the retained subsequence is preserved (array
    filter is positional), so the span-sequence invariant holds on the
    surviving spans."""
    return df.withColumn(
        spans_col, F.filter(F.col(spans_col), lambda s: s["kind"] == kind)
    )
