"""PII scrubbing — redaction counts + redacted text in one narrow pass.

The C4/RefinedWeb-style hygiene step a pretraining corpus needs before
anything else sees the text: find email / phone-shaped substrings,
replace them with stable placeholder tokens, and report per-document
counts so the redaction rate is auditable as a corpus-level stat (the
counts feed the same threshold machinery as ``set_checks``).

Regexes avoid lookaround/backreferences so Java ``java.util.regex``
(Spark) and RE2 (DuckDB) agree — the ``functions/formats.py`` stance.
Everything is scalar whole-stage-codegen expressions over one
projection: scan-bound at 100 TB, zero shuffle, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_REGEX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_REGEX = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"

EMAIL_TOKEN = "[EMAIL]"
PHONE_TOKEN = "[PHONE]"


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """``(doc_id, n_emails, n_phones, scrubbed)`` — counts are measured
    on the ORIGINAL text (audit trail), the scrubbed text has emails
    replaced first, then phones (placeholder tokens contain neither
    pattern, so the order is inert; fixed anyway for determinism).
    NULL text stays NULL throughout (absent-value semantics)."""
    text = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(text, EMAIL_REGEX, EMAIL_TOKEN), PHONE_REGEX, PHONE_TOKEN
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_REGEX), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(PHONE_REGEX), 0)).alias("n_phones"),
        scrubbed.alias("scrubbed"),
    )
