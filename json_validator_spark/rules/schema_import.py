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

from json_validator_spark.rules.model import Rule, RuleSet

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
        "minContains", "maxContains", "propertyNames", "patternProperties",
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
    if "prefixItems" in sub:
        apps.append(("prefixItems", {"schemas": [_node(s, f"{where}/prefixItems") for s in sub["prefixItems"]]}))
    if "items" in sub and isinstance(sub["items"], (dict, bool)):
        p: dict[str, Any] = {"schema": _node(sub["items"], f"{where}/items")}
        if "prefixItems" in sub:  # items beyond the tuple prefix (2020-12)
            p["start"] = len(sub["prefixItems"])
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
        if not isinstance(pn, dict) or set(pn) - _ANNOTATIONS != {"pattern"}:
            raise ValueError(f"propertyNames at {where} supports only a pattern subschema")
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
    if t == "object":
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
) -> tuple[RuleSet, dict[str, dict[str, Any]]]:
    """Compile a JSON-Schema OBJECT document (top-level ``type: object``
    with ``properties`` over the table's columns) into ``(RuleSet,
    definitions)`` ready for ``violations_df`` / ``validate_run``.

    Per-keyword rule granularity is preserved (one rule per keyword
    application, ``rule_id = <prop>.<kind>[.n]``) so the report surface
    matches the reference's per-keyword messages. A subschema may set
    ``x-severity: warning|info`` to downgrade all its rules."""
    if schema.get("type", "object") != "object" or "properties" not in schema:
        raise ValueError("top-level schema must be an object with `properties`")
    _check_known(
        {k: v for k, v in schema.items() if k not in ("properties", "required", "$defs", "dependentRequired")},
        "#",
    )

    definitions = {
        f"#/$defs/{dn}": _node(ds, f"#/$defs/{dn}")
        for dn, ds in schema.get("$defs", {}).items()
    }

    rules: list[Rule] = []
    seen: dict[str, int] = {}

    def add(prop: str, kind: str, params: dict, severity: str) -> None:
        base = f"{prop}.{kind}"
        n = seen.get(base, 0)
        seen[base] = n + 1
        rules.append(
            Rule(base if n == 0 else f"{base}.{n}", f"/{prop}", kind, params, severity=severity)
        )

    for prop in schema.get("required", []):
        add(prop, "required", {}, "error")
    for prop, deps in schema.get("dependentRequired", {}).items():
        for dep in deps:
            add(dep, "dependentRequired", {"if_target": f"/{prop}"}, "error")

    for prop, sub in schema["properties"].items():
        if not isinstance(sub, (dict, bool)):
            raise ValueError(f"property {prop!r}: subschema must be an object or boolean")
        sev = sub.get("x-severity", "error") if isinstance(sub, dict) else "error"
        for kind, params in _applications(sub if isinstance(sub, dict) else {}, f"#/properties/{prop}"):
            add(prop, kind, params, sev)
        if sub is False:
            add(prop, "notAllowed", {}, "error")

    return RuleSet(rules=tuple(rules), name=name), definitions
