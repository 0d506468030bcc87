"""The standard rule set for the interleaved corpus.

This is the engine's analogue of a domain configuration
(``DomainConfig.java:32-110``; validation types at
``etc/dev/test/config.properties:2-11``): a named profile selecting which
rules apply to the ``documents`` table of BASELINE.json's ``input_hint``.
"""

from __future__ import annotations

from json_validator_spark.rules.model import Combination, Rule, RuleSet


def corpus_ruleset() -> RuleSet:
    """Row rules over (doc_id, spans) — each has injected positives in the
    synthetic corpus (FIXTURES.md §1)."""
    return RuleSet(
        name="corpus",
        combination=Combination.ALL,
        rules=(
            Rule("required.doc_id", "/doc_id", "required"),
            Rule("pattern.doc_id", "/doc_id", "pattern", {"regex": r"^doc-\d{12}$"}),
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
                {"format": "media-ref", "when": {"field": "kind", "eq": "media"}},
            ),
            Rule(
                "forbidden.span.media_ref_on_text",
                "/spans/*/media_ref",
                "forbidden",
                {"when": {"field": "kind", "eq": "text"}},
                severity="warning",
            ),
            Rule("monotonic.offsets", "/spans", "monotonic", {"field": "offset"}),
            Rule(
                "minimum.span.offset",
                "/spans/*/offset",
                "minimum",
                {"value": 0},
            ),
            # a document should carry at least one text span (all-media
            # docs are flagged, not failed) — exercises contains/min
            Rule(
                "contains.text_span",
                "/spans",
                "contains",
                {
                    "field": "kind",
                    "schema": {"kind": "enum", "params": {"values": ["text"]}},
                    "min": 1,
                },
                severity="warning",
            ),
        ),
    )
