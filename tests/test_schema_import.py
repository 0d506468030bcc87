"""JSON-Schema document import → flat rule table → violations.

The import path is the reference's user interface (schema.json in,
violations out); these tests feed realistic schema documents through
``ruleset_from_json_schema`` + ``violations_df`` and assert keyword
semantics end-to-end, including $defs/$ref chains, nested combinators,
map-typed object properties and the strict unknown-keyword stance.
"""

from __future__ import annotations

import pytest

from json_validator_spark.operators.row_checks import violations_df
from json_validator_spark.rules.schema_import import ruleset_from_json_schema

SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "type": "object",
    "required": ["name"],
    "dependentRequired": {"source": ["lang"]},
    "$defs": {
        "shortText": {"maxLength": 6},
    },
    "properties": {
        "name": {"type": "string", "minLength": 2, "pattern": "^[a-z]+$"},
        "lang": {"enum": ["en", "es"], "x-severity": "warning"},
        "source": {"$ref": "#/$defs/shortText"},
        "n": {"type": "integer", "minimum": 0, "maximum": 100, "multipleOf": 5},
        "score": {
            "allOf": [{"minimum": 0}, {"maximum": 1}],
            "not": {"const": 0.5},
        },
        "tags": {
            "type": "array",
            "minItems": 1,
            "uniqueItems": True,
            "items": {"pattern": "^t"},
        },
        "meta": {
            "type": "object",
            "required": ["k"],
            "maxProperties": 3,
            "propertyNames": {"pattern": "^[a-z]+$"},
            "patternProperties": {"^x": {"pattern": "^v"}},
        },
        "legacy": False,
    },
}

ROWS = [
    # doc_id, name, lang, source, n, score, tags, meta, legacy
    (0, "alice", "en", "src", 10, 0.9, ["t1", "t2"], {"k": "1"}, None),       # clean
    (1, None, "xx", "longer7", 7, 0.5, [], {"K": "1"}, "x"),                  # many violations
    (2, "Bob", "es", None, None, 1.5, ["a", "a"], {"k": "1", "xq": "bad"}, None),
    (3, "cd", "en", "s", 0, None, None, {"a": "1", "b": "2", "c": "3", "k": "4"}, None),
]
DDL = (
    "doc_id long, name string, lang string, source string, n long, score double, "
    "tags array<string>, meta map<string,string>, legacy string"
)


@pytest.fixture(scope="module")
def imported():
    return ruleset_from_json_schema(SCHEMA, name="t")


def test_import_end_to_end(spark, imported):
    rs, defs = imported
    df = spark.createDataFrame(ROWS, DDL)
    got = {
        (r["doc_id"], r["rule_id"], r["severity"])
        for r in violations_df(df, rs, definitions=defs).collect()
    }
    assert got == {
        # doc 1: missing name; bad lang (warning); source present w/o... lang
        # present so dependentRequired ok; source too long ($ref chain);
        # n=7 not multipleOf 5; score=0.5 hits `not`; tags empty (minItems);
        # meta missing k + bad property name 'K'; legacy present (false schema)
        (1, "name.required", "error"),
        (1, "lang.enum", "warning"),
        (1, "source.$ref", "error"),  # resolves through #/$defs/shortText
        (1, "n.multipleOf", "error"),
        (1, "score.not", "error"),
        (1, "tags.minItems", "error"),
        (1, "meta.requiredKey", "error"),
        (1, "meta.propertyNames", "error"),
        (1, "legacy.notAllowed", "error"),
        # doc 2: 'Bob' fails pattern; source absent while... dependentRequired
        # fires on lang? no: source->lang dep; source null => no dep. score 1.5
        # fails allOf max; duplicate tags + both fail item pattern; meta xq
        # fails patternProperties value pattern
        (2, "name.pattern", "error"),
        (2, "score.allOf", "error"),
        (2, "tags.uniqueItems", "error"),
        (2, "tags.items", "error"),
        (2, "meta.patternProperties", "error"),
        # doc 3: n=0 passes (multipleOf 0 ok); meta has 4 keys (maxProperties)
        (3, "meta.maxProperties", "error"),
    }


def test_import_rule_granularity(imported):
    rs, defs = imported
    ids = {r.rule_id for r in rs.rules}
    # one rule per keyword application, reference-style per-keyword messages
    assert {"name.required", "name.type", "name.minLength", "name.pattern",
            "lang.dependentRequired", "source.$ref", "n.minimum", "n.maximum",
            "tags.items", "meta.properties"} - ids == {"meta.properties"}
    assert "#/$defs/shortText" in defs


def test_import_unknown_keyword_raises():
    with pytest.raises(ValueError, match="unsupported JSON-Schema keyword"):
        ruleset_from_json_schema(
            {"type": "object", "properties": {"a": {"unevaluatedFrobnitz": 1}}}
        )


def test_import_requires_object_with_properties():
    with pytest.raises(ValueError, match="object with `properties`"):
        ruleset_from_json_schema({"type": "array"})


def test_import_top_level_oneof_branches(spark):
    """Top-level oneOf of object schemas compiles to the engine's
    ONE_OF schema-set combination conjoined with the main rules."""
    rs, defs = ruleset_from_json_schema({
        "type": "object",
        "properties": {"name": {"minLength": 1}},
        "oneOf": [
            {"required": ["a"]},
            {"required": ["b"]},
        ],
    })
    df = spark.createDataFrame(
        [(0, "x", "1", None), (1, "x", None, None), (2, "x", "1", "2")],
        "doc_id long, name string, a string, b string",
    )
    from json_validator_spark.operators.row_checks import with_violations

    got = {
        r["doc_id"]: r["doc_pass"]
        for r in with_violations(df, rs, defs).select("doc_id", "doc_pass").collect()
    }
    # doc 0: exactly one branch (a present) → pass; doc 1: zero → fail;
    # doc 2: both → fail (oneOf)
    assert got == {0: True, 1: False, 2: False}


def test_import_top_level_unknown_constraint_raises():
    with pytest.raises(ValueError, match="unsupported top-level keyword"):
        ruleset_from_json_schema(
            {"type": "object", "properties": {}, "patternProperties": {"^x": {}}}
        )


def test_import_required_without_declared_type(spark):
    """`required` inside a property subschema applies even without an
    explicit type: object (JSON Schema semantics — it constrains any
    value that IS an object; here, the map-typed column)."""
    rs, defs = ruleset_from_json_schema(
        {"type": "object", "properties": {"meta": {"required": ["k"]}}}
    )
    df = spark.createDataFrame(
        [(0, {"k": "1"}), (1, {"other": "1"})], "doc_id long, meta map<string,string>"
    )
    got = {(r["doc_id"], r["rule_id"]) for r in violations_df(df, rs, definitions=defs).collect()}
    assert got == {(1, "meta.requiredKey")}


def test_import_nested_ref_in_map_properties(spark):
    """$ref nested under a map property's `properties` holder resolves
    (compiler.resolve_refs recurses into dict-valued param holders)."""
    rs, defs = ruleset_from_json_schema({
        "type": "object",
        "$defs": {"short": {"maxLength": 2}},
        "properties": {
            "meta": {"type": "object", "properties": {"k": {"$ref": "#/$defs/short"}}}
        },
    })
    df = spark.createDataFrame(
        [(0, {"k": "ab"}), (1, {"k": "abc"}), (2, {"other": "x"})],
        "doc_id long, meta map<string,string>",
    )
    got = {(r["doc_id"], r["rule_id"]) for r in violations_df(df, rs, definitions=defs).collect()}
    assert got == {(1, "meta.properties")}


def test_import_draft4_tuple_items(spark):
    """Draft-4 array-form `items` + `additionalItems` maps to
    prefixItems + items(start=len(prefix))."""
    rs, defs = ruleset_from_json_schema({
        "type": "object",
        "properties": {
            "arr": {"items": [{"minimum": 10}], "additionalItems": {"maximum": 3}}
        },
    })
    df = spark.createDataFrame(
        [(0, [10, 1]), (1, [5, 1]), (2, [10, 7])], "doc_id long, arr array<long>"
    )
    got = {(r["doc_id"], r["rule_id"]) for r in violations_df(df, rs, definitions=defs).collect()}
    assert got == {(1, "arr.prefixItems"), (2, "arr.items")}


def test_import_edge_subschemas():
    # annotation-only propertyNames is a valid no-op
    rs, _ = ruleset_from_json_schema(
        {"type": "object",
         "properties": {"m": {"type": "object", "propertyNames": {"title": "x"}}}}
    )
    assert all(r.kind != "propertyNames" for r in rs.rules)
    # discriminator without mapping raises descriptively
    with pytest.raises(ValueError, match="explicit `mapping`"):
        ruleset_from_json_schema(
            {"type": "object",
             "properties": {"m": {"type": "object",
                                  "discriminator": {"propertyName": "kind"}}}}
        )


def test_cli_schema_over_jsonl_end_to_end(tmp_path, spark):
    """The reference's full workflow on this engine: raw JSON file in,
    JSON-Schema document as the contract, violation report out."""
    import json

    from json_validator_spark.cli import main

    (tmp_path / "docs.jsonl").write_text(
        "\n".join(
            [
                '{"doc_id": 1, "name": "alice", "n": 10}',
                '{"doc_id": 2, "name": "X", "n": 300}',
                "not json at all",
            ]
        )
    )
    (tmp_path / "schema.json").write_text(json.dumps({
        "type": "object",
        "required": ["name"],
        "properties": {
            "name": {"minLength": 2, "pattern": "^[a-z]+$"},
            "n": {"maximum": 100},
        },
    }))
    out = str(tmp_path / "out")
    rc = main([
        "validate", "--input", str(tmp_path / "docs.jsonl"), "--output", out,
        "--input-format", "jsonl", "--input-schema", "doc_id long, name string, n long",
        "--schema", str(tmp_path / "schema.json"),
    ])
    assert rc == 0
    got = {
        (r["doc_id"], r["rule_id"])
        for r in spark.read.parquet(f"{out}/violations").collect()
    }
    assert {(d, rid) for d, rid in got if not d.startswith("corrupt:")} == {
        ("2", "name.minLength"), ("2", "name.pattern"), ("2", "n.maximum"),
    }
    assert any(d.startswith("corrupt:") and rid == "corrupt.document" for d, rid in got)


def test_import_prefix_items_plus_items_start_offset(spark):
    rs, defs = ruleset_from_json_schema(
        {
            "type": "object",
            "properties": {
                "arr": {
                    "type": "array",
                    "prefixItems": [{"minimum": 10}],
                    "items": {"maximum": 3},
                }
            },
        }
    )
    df = spark.createDataFrame(
        [(0, [10, 1, 2]), (1, [5, 1]), (2, [10, 7])], "doc_id long, arr array<long>"
    )
    got = {(r["doc_id"], r["rule_id"]) for r in violations_df(df, rs, definitions=defs).collect()}
    # doc 1: prefix fails (5 < 10); doc 2: remainder fails (7 > 3)
    assert got == {(1, "arr.prefixItems"), (2, "arr.items")}
