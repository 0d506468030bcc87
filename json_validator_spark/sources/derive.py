"""Derive the interleaved span corpus from a flat documents table.

The ingest-time normalization analogue of the reference's YAML→JSON
normalize step (S3, ``ValidationSpecs.java:225-243``): a flat
``(doc_id, text, ...)`` table becomes the ``input_hint`` shape
``doc_id, spans:array<struct<kind,text,media_ref,offset>>`` by chunking
the text into spans and interleaving deterministic media spans.

Every random decision is md5-derived (``functions/text.unit_uniform``) —
a pure function of (doc_id, salt, span index) — for two reasons:

1. partition-invariance: local[8] and local[32] build byte-identical
   corpora (the N-vs-4N gate);
2. **oracle parity**: the same construction is expressible in DuckDB SQL
   (see ``__spark_entry__.py``), so the whole span pipeline — derivation
   AND validation — is checked end-to-end against an independent engine.

Injected corruption rates (each rule's positives):
- u(kind)  < 0.004          → invalid span kind ('imge')   [enum]
- u(null)  < 0.02           → text span with NULL text     [required]
- u(bad)   < 0.02           → malformed media_ref          [format]
- u(off)   < 0.01 per doc   → constant offsets             [monotonic]
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from json_validator_spark.functions.text import let, tokens, unit_uniform
from json_validator_spark.rules.model import Rule, RuleSet

CHUNK_TOKENS = 8
SPAN_SCHEMA = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"


def derive_corpus(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, spans)`` — one narrow projection, no shuffle.

    The token array is ``let``-bound (``functions/text.let``) so the
    document is tokenized ONCE, not once per span — per-span lambdas
    re-evaluate referenced expressions otherwise."""
    doc = F.col(id_col)
    off_broken = unit_uniform(doc, F.lit("off")) < 0.01

    def build_spans(toks: Column) -> Column:
        n_spans = F.greatest(
            F.ceil(F.size(toks) / F.lit(float(CHUNK_TOKENS))).cast("int"), F.lit(1)
        )

        def make_span(i: Column) -> Column:
            u_kind = unit_uniform(doc, F.lit("kind"), i)
            kind = (
                F.when(u_kind < 0.004, F.lit("imge"))
                .when(u_kind < 0.3, F.lit("media"))
                .otherwise(F.lit("text"))
            )
            chunk = F.array_join(F.slice(toks, i * CHUNK_TOKENS + 1, CHUNK_TOKENS), " ")
            text_null = unit_uniform(doc, F.lit("null"), i) < 0.02
            text = F.when((kind == "text") & ~text_null, chunk).otherwise(
                F.lit(None).cast("string")
            )
            bad = unit_uniform(doc, F.lit("bad"), i) < 0.02
            media_ref = F.when(
                kind == "media",
                F.when(bad, F.lit("media:/broken")).otherwise(
                    F.concat(
                        F.lit("media://"),
                        F.md5(F.concat_ws(":", doc.cast("string"), F.lit("ref"), i.cast("string"))),
                    )
                ),
            ).otherwise(F.lit(None).cast("string"))
            offset = F.when(off_broken, F.lit(5)).otherwise(i * CHUNK_TOKENS).cast("int")
            return F.struct(
                kind.alias("kind"),
                text.alias("text"),
                media_ref.alias("media_ref"),
                offset.alias("offset"),
            )

        return F.transform(F.sequence(F.lit(0), n_spans - 1), make_span)

    spans = let(tokens(F.col(text_col)), build_spans)
    return docs.select(doc.alias("doc_id"), spans.cast(SPAN_SCHEMA).alias("spans"))


def derived_corpus_ruleset() -> RuleSet:
    """Rules matched to ``derive_corpus``'s injected corruptions. Same
    vocabulary entries as ``corpus.corpus_ruleset`` minus the doc_id
    lexical rules (the flat table's ids are numeric)."""
    return RuleSet(
        name="derived",
        rules=(
            Rule("minItems.spans", "/spans", "minItems", {"value": 1}),
            Rule("enum.span.kind", "/spans/*/kind", "enum", {"values": ["text", "media"]}),
            Rule(
                "required.span.text",
                "/spans/*/text",
                "required",
                {"when": {"field": "kind", "eq": "text"}},
            ),
            Rule(
                "format.span.media_ref",
                "/spans/*/media_ref",
                "format",
                {"format": "media-ref-32", "when": {"field": "kind", "eq": "media"}},
            ),
            Rule("monotonic.offsets", "/spans", "monotonic", {"field": "offset"}),
        ),
    )


# ----------------------------------------------------------------------
# Recursive-document flattening (the engine-side twin of bounded $ref
# unrolling in rules/schema_import — see its _unroll_definitions)
# ----------------------------------------------------------------------

def _recursive_node_ddl(
    fields: dict[str, str], children_field: str, levels_left: int
) -> str:
    scalars = ",".join(f"{k}:{t}" for k, t in fields.items())
    if levels_left == 0:
        # probe level: one extra struct layer so nesting BEYOND the
        # boundary is countable (its own children are dropped by the
        # parser, which is exactly the undetectable residue the
        # refDepthExceeded violation at the boundary reports on)
        child_t = f"array<struct<{scalars}>>"
    else:
        child_t = f"array<{_recursive_node_ddl(fields, children_field, levels_left - 1)}>"
    return f"struct<{scalars},{children_field}:{child_t}>"


def flatten_recursive(
    docs: DataFrame,
    json_col: str,
    fields: dict[str, str],
    *,
    children_field: str = "children",
    max_depth: int = 2,
    root_path: str = "/people",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode a RECURSIVE JSON document column (the reference's sample
    schema shape — ``etc/dev/sample/sample-v1.0/sample.json``, persons
    with nested ``children`` persons, validated natively by networknt's
    tree walk at ``JSONValidator.java:381-397``) into one row per node
    at depths ``0..max_depth``, so the imported per-node RuleSet runs as
    ONE distributed scan over the node table instead of a per-document
    recursive interpreter.

    ``json_col`` holds the serialized node ARRAY (e.g. the ``people``
    value). ``fields`` maps scalar field → DDL type (use ``string`` for
    lexical type checks). Output: ``(id_col, node_path, depth,
    <fields...>, n_children int)`` where ``node_path`` is the exact
    JSON-pointer location the reference would report
    (``/people/0/children/2`` style). Nodes AT ``max_depth`` with
    ``n_children > 0`` nest deeper than the unrolled schema — callers
    surface those as ``refDepthExceeded`` violations (error, never
    silence; the import-side twin is ``schema_import.max_ref_depth``).

    Scale: ONE scan, ONE ``from_json`` (let-bound so the document parses
    exactly once), every level's node array built with nested
    ``transform`` lambdas inside the same projection, then a single
    explode. The per-level-union alternative re-scans AND re-parses the
    corpus once per level (each union branch has its own lineage):
    measured equal wall-clock at sf0.1 — the corpus is one tiny cached
    file there — but its plan carries (max_depth+1)× the FileScan +
    from_json work, which IS the dominant cost at 100 TB, so the
    single-scan shape is the one that survives the scale-up."""
    ddl = f"array<{_recursive_node_ddl(fields, children_field, max_depth)}>"

    def mk_struct(x: Column, d: int, path: Column) -> Column:
        return F.struct(
            path.alias("node_path"),
            F.lit(d).alias("depth"),
            *[x[k].alias(k) for k in fields],
            F.coalesce(F.size(x[children_field]), F.lit(0)).alias("n_children"),
        )

    def collect(arr: Column, d: int, target: int, prefix: Column) -> Column:
        """array<node-struct> of all depth-``target`` nodes under ``arr``
        (the depth-``d`` node array); ``prefix`` is the parent pointer +
        '/'. Null children arrays coalesce to typed empties so flatten
        never sees a null element."""
        if d == target:
            return F.transform(
                arr, lambda x, i: mk_struct(x, d, F.concat(prefix, i.cast("string")))
            )
        child_t = _recursive_node_ddl(fields, children_field, max_depth - (d + 1))
        empty = F.array().cast(f"array<{child_t}>")
        return F.flatten(
            F.transform(
                arr,
                lambda x, i: collect(
                    F.coalesce(x[children_field], empty),
                    d + 1,
                    target,
                    F.concat(
                        prefix, i.cast("string"), F.lit(f"/{children_field}/")
                    ),
                ),
            )
        )

    def all_nodes(roots: Column) -> Column:
        root_prefix = F.lit(root_path + "/")
        return F.concat(
            *[collect(roots, 0, t, root_prefix) for t in range(max_depth + 1)]
        )

    return docs.select(
        F.col(id_col),
        F.explode(let(F.from_json(F.col(json_col), ddl), all_nodes)).alias("_n"),
    ).select(
        F.col(id_col),
        "_n.node_path",
        "_n.depth",
        *[F.col(f"_n.{k}").alias(k) for k in fields],
        "_n.n_children",
    )
