"""Input acceptance — the S2 layer (MIME sniff → corrupt-record handling).

The reference gates input with Tika byte-sampling against an accepted
mime-type list (``FileManager.java:58-64``, accepted list
``application.properties:46``) and sniffs JSON-vs-YAML by first
character (``ValidationSpecs.java:225-243``, ``:233-239``). Set-based
analogue over a stringly payload column:

- ``sniff_json_kind``: first-non-whitespace-character classification
  (object / array / other) — the ``{``/``[`` sniff as a narrow Column
  expression.
- ``parse_json_column`` / ``corrupt_record_violations``: PERMISSIVE
  ``from_json`` with the null ambiguity resolved — ``from_json`` yields
  NULL for corrupt input *and* for NULL input, so "corrupt" is defined
  as ``payload IS NOT NULL AND parsed IS NULL``. Corrupt rows become
  first-class violation rows (the analogue of the reference rejecting a
  non-JSON upload) instead of silently nulling out downstream rules.

Both are pure Catalyst expressions — the whole acceptance layer stays
inside the same narrow scan projection as the row rules.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sniff_json_kind(payload: Column) -> Column:
    """'object' | 'array' | 'other' from the first non-space character
    (``ValidationSpecs.java:233-239``). NULL payload → NULL."""
    # regexp strip, not ltrim: ltrim removes only spaces, but JSON
    # allows tab/newline/CR before the first token
    head = F.substring(F.regexp_replace(payload, r"^\s+", ""), 1, 1)
    return (
        F.when(payload.isNull(), F.lit(None).cast("string"))
        .when(head == "{", F.lit("object"))
        .when(head == "[", F.lit("array"))
        .otherwise(F.lit("other"))
    )


def parse_json_column(
    df: DataFrame, col: str, schema: str, parsed_col: str | None = None
) -> DataFrame:
    """Append ``{parsed_col}`` (default ``{col}_parsed``) and a boolean
    ``{col}_corrupt`` distinguishing genuinely corrupt payloads from
    absent ones."""
    out = parsed_col or f"{col}_parsed"
    parsed = F.from_json(F.col(col), schema)
    return df.withColumns(
        {
            out: parsed,
            f"{col}_corrupt": F.col(col).isNotNull() & parsed.isNull(),
        }
    )


def corrupt_record_violations(
    df: DataFrame,
    col: str,
    schema: str,
    doc_id: str = "doc_id",
    rule_id: str | None = None,
) -> DataFrame:
    """Violation rows for payloads that fail to parse under ``schema`` —
    the distributed form of the reference's mime-type rejection
    (``FileManager.java:58-64``): the bad row is *reported*, the rest of
    the corpus proceeds."""
    rid = rule_id or f"corrupt.{col}"
    flagged = parse_json_column(df, col, schema)
    return flagged.filter(F.col(f"{col}_corrupt")).select(
        F.col(doc_id).cast("string").alias("doc_id"),
        F.lit(f"/{col}").alias("span_path"),
        F.lit(rid).alias("rule_id"),
        F.lit("error").alias("severity"),
        F.lit(f"[/{col}] content is not parseable as the accepted type").alias("message"),
    )
