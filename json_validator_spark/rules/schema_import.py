"""JSON-Schema document → flat rule table.

The reference's user interface is (document, JSON Schema file): schemas
are parsed by networknt and interpreted per document
(``JSONValidator.java:321-345`` parse, ``:381-397`` evaluate). Here the
same schema DOCUMENT compiles once, at the driver, into the flat
``RuleSet`` this engine executes as Catalyst expressions — so a user of
the reference can point their existing ``schema.json`` at a table whose
columns are the top-level properties and keep their validation
semantics, now as one distributed scan.

Scope: the keyword subset the engine's vocabulary implements (which is
the reference's catalog, ``jsv-messages.properties:1-71``), applied to
a TYPED table: top-level ``properties`` become per-column rules;
object-typed properties map to ``map<string,string>`` columns;
array-typed to array columns. Cross-subschema annotation flow is out of
scope (see README "Draft-2020-12 annotation boundary"). Unknown
keywords raise at compile time — the reference surfaces schema-parse
failures the same way, instead of silently ignoring constraints.

``$ref``/``$defs`` round-trip through the compiler's resolver
(``rules/compiler.resolve_refs``) using the schema's own JSON-pointer
names (``#/$defs/<name>``), cycle guard included.
"""

from __future__ import annotations

from typing import Any

from json_validator_spark.rules.model import Rule, RuleSet, RuleSetGroup

# Annotation-only keywords: legal everywhere, produce no rule.
_ANNOTATIONS = {
    "title", "description", "examples", "default", "$comment", "$schema",
    "$id", "deprecated", "x-severity",
}

# subschema keyword -> engine kind for 1:1 scalar keywords
_SCALAR_KEYWORDS = {
    "const": ("const", lambda v: {"value": v}),
    "enum": ("enum", lambda v: {"values": list(v)}),
    "pattern": ("pattern", lambda v: {"regex": v}),
    "format": ("format", lambda v: {"format": v}),
    "minimum": ("minimum", lambda v: {"value": v}),
    "maximum": ("maximum", lambda v: {"value": v}),
    "exclusiveMinimum": ("exclusiveMinimum", lambda v: {"value": v}),
    "exclusiveMaximum": ("exclusiveMaximum", lambda v: {"value": v}),
    "multipleOf": ("multipleOf", lambda v: {"value": v}),
    "minLength": ("minLength", lambda v: {"value": v}),
    "maxLength": ("maxLength", lambda v: {"value": v}),
    "contentEncoding": ("contentEncoding", lambda v: {"encoding": v}),
    "contentMediaType": ("contentMediaType", lambda v: {}),
    "minItems": ("minItems", lambda v: {"value": v}),
    "maxItems": ("maxItems", lambda v: {"value": v}),
    "minProperties": ("minProperties", lambda v: {"value": v}),
    "maxProperties": ("maxProperties", lambda v: {"value": v}),
}

_HANDLED = (
    set(_SCALAR_KEYWORDS)
    | _ANNOTATIONS
    | {
        "type", "uniqueItems", "items", "prefixItems", "contains",
        "minContains", "maxContains", "additionalItems", "propertyNames", "patternProperties",
        "additionalProperties", "properties", "required", "dependentRequired",
        "dependentSchemas", "discriminator", "allOf", "anyOf", "oneOf", "not",
        "$ref", "readOnly", "writeOnly",
    }
)


def _check_known(sub: dict[str, Any], where: str) -> None:
    unknown = set(sub) - _HANDLED
    if unknown:
        raise ValueError(
            f"unsupported JSON-Schema keyword(s) at {where}: {sorted(unknown)} "
            "(the engine refuses rather than silently dropping constraints)"
        )


def _applications(sub: dict[str, Any], where: str) -> list[tuple[str, dict]]:
    """One (kind, params) application per constraint keyword in ``sub``."""
    if sub is True or sub == {}:
        return []
    if sub is False:
        return [("notAllowed", {})]
    _check_known(sub, where)
    apps: list[tuple[str, dict]] = []

    if "$ref" in sub:
        apps.append(("$ref", {"ref": sub["$ref"]}))

    for kw, (kind, to_params) in _SCALAR_KEYWORDS.items():
        if kw in sub:
            apps.append((kind, to_params(sub[kw])))

    t = sub.get("type")
    if t is not None and t not in ("object", "array"):
        # typed-table columns: scalar type checks only; object/array shape
        # is expressed by the structural keywords below
        if isinstance(t, list):
            scalar_types = [x for x in t if x not in ("object", "array")]
            if scalar_types:
                apps.append(("type", {"types": scalar_types}))
        else:
            apps.append(("type", {"type": t}))

    if sub.get("uniqueItems"):
        apps.append(("uniqueItems", {}))
    # tuple-form positional schemas: 2020-12 `prefixItems`, or draft-4's
    # array-form `items` (with `additionalItems` as the remainder schema)
    prefix = sub.get("prefixItems")
    if prefix is None and isinstance(sub.get("items"), list):
        prefix = sub["items"]
    if prefix is not None:
        apps.append(("prefixItems", {"schemas": [_node(s, f"{where}/prefixItems") for s in prefix]}))
    remainder = None
    if isinstance(sub.get("items"), (dict, bool)):
        remainder = sub["items"]
    elif "additionalItems" in sub and isinstance(sub.get("items"), list):
        remainder = sub["additionalItems"]
    if remainder is not None:
        p: dict[str, Any] = {"schema": _node(remainder, f"{where}/items")}
        if prefix is not None:  # items beyond the tuple prefix
            p["start"] = len(prefix)
        apps.append(("items", p))
    if "contains" in sub:
        p = {"schema": _node(sub["contains"], f"{where}/contains")}
        if "minContains" in sub:
            p["min"] = sub["minContains"]
        if "maxContains" in sub:
            p["max"] = sub["maxContains"]
        apps.append(("contains", p))

    if "propertyNames" in sub:
        pn = sub["propertyNames"]
        if pn in (True, {}) or (isinstance(pn, dict) and not (set(pn) - _ANNOTATIONS)):
            pass  # annotation-only subschema: valid no-op, no rule
        elif not isinstance(pn, dict) or set(pn) - _ANNOTATIONS != {"pattern"}:
            raise ValueError(f"propertyNames at {where} supports only a pattern subschema")
        else:
            apps.append(("propertyNames", {"regex": pn["pattern"]}))
    if "patternProperties" in sub:
        for rx, s in sub["patternProperties"].items():
            apps.append(("patternProperties", {"key_regex": rx, "schema": _node(s, f"{where}/patternProperties")}))
    if sub.get("additionalProperties") is False:
        apps.append(
            ("additionalProperties", {
                "allowed": sorted(sub.get("properties", {})),
                "allowed_patterns": sorted(sub.get("patternProperties", {})),
            })
        )
    elif isinstance(sub.get("additionalProperties"), dict):
        raise ValueError(
            f"additionalProperties at {where}: only `false` (closed object) is "
            "supported on map-typed columns"
        )
    # object keywords apply whenever present — JSON Schema applies
    # `required`/`properties` to any value that IS an object regardless
    # of a declared `type` (including type: ["object","null"] and no
    # type at all); on this engine they target a map-typed column, and
    # a mistargeted column surfaces as an analysis error, never a
    # silently dropped constraint
    for key in sub.get("required", []):
        apps.append(("requiredKey", {"key": key}))
    if "properties" in sub:
        apps.append(
            ("properties", {
                "properties": {k: _node(s, f"{where}/properties/{k}") for k, s in sub["properties"].items()}
            })
        )
    if "dependentSchemas" in sub:
        for key, s in sub["dependentSchemas"].items():
            apps.append(("dependentSchemas", {"key": key, "schema": _node(s, f"{where}/dependentSchemas")}))
    if "discriminator" in sub:  # OpenAPI: {propertyName, mapping{value: schema}}
        d = sub["discriminator"]
        if "mapping" not in d:
            raise ValueError(
                f"discriminator at {where}: an explicit `mapping` is required "
                "(implicit schema-name mapping has no referent in a rule table)"
            )
        apps.append(
            ("discriminator", {
                "key": d["propertyName"],
                "mapping": {v: _node(s, f"{where}/discriminator/{v}") for v, s in d["mapping"].items()},
            })
        )

    for combo in ("allOf", "anyOf", "oneOf"):
        if combo in sub:
            apps.append((combo, {"schemas": [_node(s, f"{where}/{combo}") for s in sub[combo]]}))
    if "not" in sub:
        apps.append(("not", {"schema": _node(sub["not"], f"{where}/not")}))
    if sub.get("readOnly"):
        apps.append(("readOnly", {}))
    if sub.get("writeOnly"):
        apps.append(("writeOnly", {}))
    return apps


def _node(sub: Any, where: str) -> dict[str, Any]:
    """A nested subschema as ONE engine node ({kind, params}); multiple
    keywords wrap in allOf (conjunction — exactly JSON Schema's
    semantics for sibling keywords)."""
    if sub is True or sub == {}:
        return {"kind": "true", "params": {}}
    if sub is False:
        return {"kind": "false", "params": {}}
    apps = _applications(sub, where)
    if not apps:
        return {"kind": "true", "params": {}}
    if len(apps) == 1:
        kind, params = apps[0]
        return {"kind": kind, "params": params}
    return {
        "kind": "allOf",
        "params": {"schemas": [{"kind": k, "params": p} for k, p in apps]},
    }


def ruleset_from_json_schema(
    schema: dict[str, Any], name: str = "imported"
) -> tuple["RuleSet | RuleSetGroup", dict[str, dict[str, Any]]]:
    """Compile a JSON-Schema OBJECT document (top-level ``type: object``
    with ``properties`` over the table's columns) into ``(RuleSet,
    definitions)`` ready for ``violations_df`` / ``validate_run``.

    Per-keyword rule granularity is preserved (one rule per keyword
    application, ``rule_id = <prop>.<kind>[.n]``) so the report surface
    matches the reference's per-keyword messages. A subschema may set
    ``x-severity: warning|info`` to downgrade all its rules.

    Top-level ``allOf`` members (object schemas) merge into the main
    rule set; a top-level ``anyOf``/``oneOf`` of object schemas becomes
    the schema-set combination the engine already executes
    (``Combination.ANY``/``ONE_OF`` branches — the reference's
    ALL/ANY/ONE_OF approach, ``JSONValidator.java:252-296``); the
    result is then a ``RuleSetGroup`` conjoining the main rules with the
    combinator branches. Any OTHER top-level constraint keyword raises:
    the engine refuses rather than silently dropping a constraint."""
    from json_validator_spark.rules.model import Combination

    _TOP_LEVEL = {"type", "properties", "required", "$defs", "dependentRequired",
                  "allOf", "anyOf", "oneOf"} | _ANNOTATIONS
    unknown_top = set(schema) - _TOP_LEVEL
    if unknown_top:
        raise ValueError(
            f"unsupported top-level keyword(s): {sorted(unknown_top)} "
            "(the engine refuses rather than silently dropping constraints)"
        )
    if schema.get("type", "object") != "object" or "properties" not in schema:
        raise ValueError("top-level schema must be an object with `properties`")
    if "anyOf" in schema and "oneOf" in schema:
        raise ValueError("top-level anyOf and oneOf together are not supported")

    definitions = {
        f"#/$defs/{dn}": _node(ds, f"#/$defs/{dn}")
        for dn, ds in schema.get("$defs", {}).items()
    }

    rules: list[Rule] = []
    seen: dict[str, int] = {}

    def add(prop: str, kind: str, params: dict, severity: str,
            ruleset: str = "default", prefix: str = "") -> None:
        base = f"{prefix}{prop}.{kind}"
        n = seen.get(base, 0)
        seen[base] = n + 1
        rules.append(
            Rule(base if n == 0 else f"{base}.{n}", f"/{prop}", kind, params,
                 severity=severity, ruleset=ruleset)
        )

    def add_object_schema(obj: dict[str, Any], where: str,
                          ruleset: str = "default", prefix: str = "") -> None:
        for prop in obj.get("required", []):
            add(prop, "required", {}, "error", ruleset, prefix)
        for prop, deps in obj.get("dependentRequired", {}).items():
            for dep in deps:
                add(dep, "dependentRequired", {"if_target": f"/{prop}"},
                    "error", ruleset, prefix)
        for prop, sub in obj.get("properties", {}).items():
            if not isinstance(sub, (dict, bool)):
                raise ValueError(f"property {prop!r}: subschema must be an object or boolean")
            sev = sub.get("x-severity", "error") if isinstance(sub, dict) else "error"
            for kind, params in _applications(
                sub if isinstance(sub, dict) else {}, f"{where}/properties/{prop}"
            ):
                add(prop, kind, params, sev, ruleset, prefix)
            if sub is False:
                add(prop, "notAllowed", {}, "error", ruleset, prefix)

    add_object_schema(schema, "#")
    for i, member in enumerate(schema.get("allOf", [])):
        _require_object_member(member, f"#/allOf/{i}")
        add_object_schema(member, f"#/allOf/{i}", prefix=f"allOf{i}.")

    main = RuleSet(rules=tuple(rules), name=name)

    combo_kw = "anyOf" if "anyOf" in schema else ("oneOf" if "oneOf" in schema else None)
    if combo_kw is None:
        return main, definitions
    rules = []
    for i, member in enumerate(schema[combo_kw]):
        _require_object_member(member, f"#/{combo_kw}/{i}")
        add_object_schema(member, f"#/{combo_kw}/{i}",
                          ruleset=f"branch{i}", prefix=f"{combo_kw}{i}.")
    branches = RuleSet(
        rules=tuple(rules),
        combination=Combination.ANY if combo_kw == "anyOf" else Combination.ONE_OF,
        name=f"{name}-{combo_kw}",
    )
    return RuleSetGroup(groups=(main, branches), name=name), definitions


def _require_object_member(member: Any, where: str) -> None:
    if not isinstance(member, dict) or not (
        set(member) <= {"type", "properties", "required", "dependentRequired"} | _ANNOTATIONS
    ):
        raise ValueError(
            f"combinator member at {where} must be an object schema using only "
            "type/properties/required/dependentRequired"
        )
