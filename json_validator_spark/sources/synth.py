"""Deterministic synthetic interleaved corpus (FIXTURES.md §1-§3).

Generates the ``input_hint`` table shape —
``doc_id:string, spans:array<struct<kind,text,media_ref,offset>>`` —
entirely with Spark expressions (``spark.range`` + ``xxhash64``-derived
pseudo-randomness). Determinism is *partition-invariant*: every random
decision is a pure function of (doc index, decision salt, seed), never of
partition id — so local[8] and local[32] generate byte-identical rows,
which is what lets the N-vs-4N identical-violations gate hold.

Injected corruptions (rates per FIXTURES.md):
- ~0.5% of spans get an invalid ``kind``        → enum-rule positives
- ~1% of text spans get a null ``text``          → required-rule positives
- ~1% of media spans get a malformed media_ref   → pattern-rule positives
- ~0.5% of docs get non-increasing offsets       → monotonic-rule positives
- ~0.1% of docs collide on doc_id                → uniqueness positives
- ~1% of media_refs absent from media_catalog    → referential positives
- ~1% of docs are media-heavy (100-1000 spans)   → skew for salting/AQE
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SPAN_SCHEMA = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"

_VOCAB = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "data",
    "spark", "span", "media", "text", "valid", "schema", "rule", "check",
    "table", "row", "column", "batch", "stream", "shard", "merge", "scan",
]

# One long deterministic word soup; span text = substring of this.
_CORPUS_TEXT = " ".join(_VOCAB[(7 * i) % len(_VOCAB)] for i in range(200))
# max text length is 60 tokens * 6 chars = 360; keep starts in-range
_CORPUS_SLACK = max(len(_CORPUS_TEXT) - 400, 1)


def _u(doc: Column, salt: int, span: Column | None = None) -> Column:
    """Uniform [0,1) from (doc index, salt[, span index]) — partition-invariant."""
    args = [doc, F.lit(salt)] if span is None else [doc, F.lit(salt), span]
    return (F.pmod(F.xxhash64(*args), F.lit(1_000_000)) / 1_000_000.0)


def _h(doc: Column, salt: int, span: Column | None = None) -> Column:
    args = [doc, F.lit(salt)] if span is None else [doc, F.lit(salt), span]
    return F.abs(F.xxhash64(*args))


def _uuid_from(k: Column) -> Column:
    hx = F.lpad(F.lower(F.hex(k)), 32, "0")
    return F.concat_ws(
        "-",
        hx.substr(1, 8), hx.substr(9, 4), hx.substr(13, 4), hx.substr(17, 4), hx.substr(21, 12),
    )


def synth_documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    catalog_size: int = 10_000,
    drift: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """The interleaved corpus. ``drift=True`` shifts the span-count and
    text-length distributions (FIXTURES.md §3 ``documents_drifted``)."""
    base = spark.range(0, n_docs, numPartitions=partitions)
    doc = F.col("id") + F.lit(seed * 1_000_003)

    heavy = _u(doc, 1) < 0.01
    span_med_lo, span_med_hi = (3, 12) if drift else (1, 10)
    n_spans_normal = (F.lit(span_med_lo) + (_h(doc, 2) % (span_med_hi - span_med_lo + 1))).cast("int")
    n_spans_heavy = (F.lit(100) + (_h(doc, 3) % 901)).cast("int")
    order_violation = _u(doc, 4) < 0.005
    n_spans = F.when(heavy, n_spans_heavy).otherwise(
        F.when(order_violation, F.greatest(n_spans_normal, F.lit(2))).otherwise(n_spans_normal)
    )

    # ~0.1% duplicate doc_ids: map onto the previous index (never id 0).
    dup = (_u(doc, 5) < 0.001) & (F.col("id") > 0)
    doc_id = F.format_string("doc-%012d", F.when(dup, F.col("id") - 1).otherwise(F.col("id")))

    text_len_lo, text_len_hi = (20, 60) if drift else (5, 50)

    def make_span(i: Column) -> Column:
        ku = _u(doc, 10, i)
        kind = (
            F.when(ku < 0.005, F.element_at(F.array(F.lit("imge"), F.lit("unknown")), (_h(doc, 11, i) % 2 + 1).cast("int")))
            .when(ku < 0.30, F.lit("media"))
            .otherwise(F.lit("text"))
        )
        # Variable-length text as a substring of a fixed corpus constant:
        # 2 hashes per span instead of one per token — generation is
        # O(spans), not O(tokens), which keeps 10^6-doc bench corpora
        # cheap to materialize. Rule semantics never inspect token
        # content, only length/nullness.
        n_tok = (F.lit(text_len_lo) + (_h(doc, 12, i) % (text_len_hi - text_len_lo + 1))).cast("int")
        start = (_h(doc, 13, i) % F.lit(_CORPUS_SLACK) + 1).cast("int")
        text_null = _u(doc, 14, i) < 0.01
        text = F.when(
            (kind == "text") & ~text_null,
            F.substring(F.lit(_CORPUS_TEXT), start, n_tok * 6),
        ).otherwise(F.lit(None).cast("string"))

        ref_idx = (_h(doc, 15, i) % catalog_size).cast("long")
        good_ref = F.concat(F.lit("media://"), _uuid_from(ref_idx))
        malformed = _u(doc, 16, i) < 0.01
        bad_ref = F.element_at(
            F.array(F.lit("media:/broken"), F.lit("http://not-media"), F.lit("media://xyz")),
            (_h(doc, 17, i) % 3 + 1).cast("int"),
        )
        media_ref = F.when(
            kind == "media", F.when(malformed, bad_ref).otherwise(good_ref)
        ).otherwise(F.lit(None).cast("string"))

        # offsets: increasing by 1-20 normally; constant for violating docs
        offset = F.when(order_violation, F.lit(5)).otherwise(
            (i * 10 + (_h(doc, 18, i) % 10)).cast("int")
        ).cast("int")

        return F.struct(
            kind.alias("kind"), text.alias("text"), media_ref.alias("media_ref"), offset.alias("offset")
        )

    spans = F.transform(F.sequence(F.lit(0), n_spans - 1), make_span)
    return base.select(doc_id.alias("doc_id"), spans.cast(SPAN_SCHEMA).alias("spans"))


def synth_media_catalog(spark: SparkSession, catalog_size: int = 10_000) -> DataFrame:
    """Dimension table (FIXTURES.md §2): covers indices [0, 0.99*size) —
    the top 1% of referenced indices are deliberately absent so the
    broadcast left_anti referential check has positives."""
    n = int(catalog_size * 0.99)
    k = F.col("id")
    return spark.range(0, n).select(
        F.concat(F.lit("media://"), _uuid_from(k)).alias("media_ref"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("image/jpeg"), F.lit("audio/wav")),
            (F.pmod(k, F.lit(3)) + 1).cast("int"),
        ).alias("mime_type"),
        (F.lit(1) + F.pmod(F.abs(F.xxhash64(k, F.lit(99))), F.lit(1_000_000))).alias("size_bytes"),
    )


def span_signature(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Per-row span-sequence signature (kind, text, media_ref, positional
    order) — the invariant the driver holds us to (BASELINE.json
    input_hint): any pipeline stage must leave this untouched. Offsets are
    excluded on purpose: order is positional, not offset-keyed.

    md5 over '|'-joined fields per span, ';'-joined across the sequence
    — NOT sha2(to_json(...)), whose JSON formatting is engine-specific.
    This exact construction is reproducible in DuckDB
    (``md5(string_agg(concat_ws('|', ...), ';' ORDER BY i))``), giving
    the per-row invariant a hard oracle (VERDICT r01 next-round #4).
    '∅' marks absent fields (never appears in corpus values; concat_ws
    would otherwise silently SKIP nulls and alias distinct sequences);
    '|' / ';' never occur in kind/text/media_ref values."""
    sig = F.md5(
        F.array_join(
            F.transform(
                F.col(spans_col),
                lambda s: F.concat_ws(
                    "|",
                    F.coalesce(s["kind"], F.lit("∅")),
                    F.coalesce(s["text"], F.lit("∅")),
                    F.coalesce(s["media_ref"], F.lit("∅")),
                ),
            ),
            ";",
        )
    )
    return df.withColumn("span_sig", sig)
