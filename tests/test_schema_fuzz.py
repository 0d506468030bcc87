"""Random-JSON-Schema differential fuzz: importer + compiler + executor
vs an independent spec-based evaluator.

``test_differential.py`` fuzzes fixed rule sets over random documents;
this file closes the remaining gap by fuzzing the SCHEMAS themselves:
hypothesis draws random 2020-12 schema documents from a bounded,
type-consistent keyword grammar (numeric bounds / multipleOf / const /
enum / combinators / if-then-else on a number column, length + pattern
keywords on a string column, items / contains / uniqueItems on an array
column, plus top-level required / dependentRequired), imports each
through ``ruleset_from_json_schema``, and checks the engine's violation
set against a from-the-spec Python evaluator on a deterministic
document grid. Divergence in ANY keyword interaction fails with the
offending (schema, doc) pair.

All drawn schemas are merged into one RuleSet per chunk (rule_ids
prefixed ``s<i>.``) so the whole fuzz costs a handful of Spark jobs —
the same many-rules-one-pass shape the engine runs in production
(reference semantics per keyword: ``JSONValidator.java:381-397``).
"""

from __future__ import annotations

import re
from dataclasses import replace

from json_validator_spark.operators.row_checks import violations_df
from json_validator_spark.rules.model import RuleSet
from json_validator_spark.rules.schema_import import ruleset_from_json_schema

DDL = "doc_id long, a double, b string, c array<long>, m map<string,string>"

A_VALUES = [None, -3.0, -1.0, 0.0, 1.0, 2.0, 2.5, 4.0, 4.5]
B_VALUES = [None, "", "x", "yy", "ab", "xy", "zzz", "xyxy"]
C_VALUES = [None, [], [1], [2, 3], [0, 0], [5, 2, 2, 1], [3, 3, 3, 3], [0, 1, 2, 3]]
M_VALUES = [
    None,
    {},
    {"k": "v1"},
    {"K": "1", "j": "2"},
    {"xq": "bad"},
    {"k": "1", "xv": "vv", "j": "2"},
    {"j": "v"},
]

PATTERNS = ["x", "^y", "b$", "^[xy]+$", "x.y"]
B_POOL = ["", "x", "yy", "ab", "xy", "zz"]
KEY_PATTERNS = ["^[a-z]+$", "^[kj]", "q$"]
VAL_PATTERNS = ["^v", "1"]


def _doc_grid() -> list[tuple]:
    """Deterministic ~230-doc grid over the four columns' value spaces."""
    rows, doc_id = [], 0
    for ia, a in enumerate(A_VALUES):
        for ib, b in enumerate(B_VALUES):
            for ic, c in enumerate(C_VALUES):
                for im, m in enumerate(M_VALUES):
                    if (ia + ib + ic + im) % 7 or (ia + 2 * ib + 3 * ic + im) % 3:
                        continue
                    rows.append((doc_id, a, b, c, m))
                    doc_id += 1
    return rows


# ---------------------------------------------------------------------------
# Independent evaluator — written from draft 2020-12, not from engine code.
# Engine contract divergence from raw JSON Schema: a NULL column value is
# ABSENT (all value keywords pass; only required/dependentRequired fire).
# ---------------------------------------------------------------------------


def _eval(sub: dict, val, root: dict | None = None) -> bool:
    for k, p in sub.items():
        if k in ("type", "minContains", "maxContains", "then", "else"):
            ok = True
        elif k == "$ref":
            name = p.rsplit("/", 1)[-1]
            ok = _eval((root or {}).get("$defs", {})[name], val, root)
        elif k == "minProperties":
            ok = len(val) >= p
        elif k == "maxProperties":
            ok = len(val) <= p
        elif k == "propertyNames":
            ok = all(re.search(p["pattern"], key) for key in val)
        elif k == "patternProperties":
            ok = all(
                _eval(vsch, v, root)
                for key_re, vsch in p.items()
                for key, v in val.items()
                if re.search(key_re, key)
            )
        elif k == "required" and isinstance(val, dict):
            ok = all(key in val for key in p)
        elif k == "minimum":
            ok = val >= p
        elif k == "maximum":
            ok = val <= p
        elif k == "exclusiveMinimum":
            ok = val > p
        elif k == "exclusiveMaximum":
            ok = val < p
        elif k == "multipleOf":
            ok = (val % p) == 0
        elif k == "const":
            ok = val == p
        elif k == "enum":
            ok = val in p
        elif k == "minLength":
            ok = len(val) >= p
        elif k == "maxLength":
            ok = len(val) <= p
        elif k == "pattern":
            ok = re.search(p, val) is not None
        elif k == "minItems":
            ok = len(val) >= p
        elif k == "maxItems":
            ok = len(val) <= p
        elif k == "uniqueItems":
            ok = (not p) or len(set(val)) == len(val)
        elif k == "items":
            ok = all(_eval(p, x) for x in val)
        elif k == "contains":
            cnt = sum(1 for x in val if _eval(p, x))
            lo, hi = sub.get("minContains", 1), sub.get("maxContains")
            ok = cnt >= lo and (hi is None or cnt <= hi)
        elif k == "allOf":
            ok = all(_eval(s, val) for s in p)
        elif k == "anyOf":
            ok = any(_eval(s, val) for s in p)
        elif k == "oneOf":
            ok = sum(bool(_eval(s, val)) for s in p) == 1
        elif k == "not":
            ok = not _eval(p, val)
        elif k == "if":
            br = sub.get("then") if _eval(p, val) else sub.get("else")
            ok = br is None or _eval(br, val)
        else:  # pragma: no cover - grammar and evaluator out of sync
            raise AssertionError(f"evaluator does not know keyword {k!r}")
        if not ok:
            return False
    return True


def _expected(schema: dict, doc: dict) -> dict[str, str]:
    """``{rule_id suffix: severity}`` the engine must emit. Iterating
    the result yields the rid strings (dict keys), so set-algebra
    call sites keep working; severity-aware callers use ``.items()``.
    Presence rules are always errors; a property's ``x-severity``
    downgrades every rule compiled from that property's subschema."""
    out: dict[str, str] = {}

    class fails:  # adapter: keep the add()-style body below readable
        @staticmethod
        def add(rid: str, sev: str = "error") -> None:
            out[rid] = sev

    for p in schema.get("required", []):
        if doc[p] is None:
            fails.add(f"{p}.required")
    for x, ys in schema.get("dependentRequired", {}).items():
        if doc[x] is not None:
            for y in ys:
                if doc[y] is None:
                    fails.add(f"{y}.dependentRequired")
    for p, sch in schema.get("properties", {}).items():
        val = doc[p]
        if val is None:
            continue
        psev = sch.get("x-severity", "error")
        saw_ite = False
        for k, par in sch.items():
            if k in ("type", "x-severity", "minContains", "maxContains"):
                continue
            if k in ("if", "then", "else"):
                if not saw_ite:
                    saw_ite = True
                    cond = _eval(sch["if"], val, schema)
                    br = sch.get("then") if cond else sch.get("else")
                    if br is not None and not _eval(br, val, schema):
                        fails.add(f"{p}.ifThenElse", psev)
                continue
            if k == "contains":
                cnt = sum(1 for x in val if _eval(par, x, schema))
                lo, hi = sch.get("minContains", 1), sch.get("maxContains")
                if cnt < lo or (hi is not None and cnt > hi):
                    fails.add(f"{p}.contains", psev)
                continue
            if k == "required":
                # map-typed property: one requiredKey rule per listed key,
                # importer-numbered `<p>.requiredKey[, .1, .2 ...]`
                for i, key in enumerate(par):
                    if key not in val:
                        fails.add(f"{p}.requiredKey" + (f".{i}" if i else ""), psev)
                continue
            if k == "patternProperties":
                # one rule per key-regex entry, insertion-order numbered
                for i, (rx, vsch) in enumerate(par.items()):
                    bad = any(
                        not _eval(vsch, v, schema)
                        for key, v in val.items()
                        if re.search(rx, key)
                    )
                    if bad:
                        fails.add(f"{p}.patternProperties" + (f".{i}" if i else ""), psev)
                continue
            if k == "properties" and isinstance(val, dict):
                # map member schemas fold into ONE `<p>.properties` rule
                bad = any(
                    key in val and not _eval(vsch, val[key], schema)
                    for key, vsch in par.items()
                )
                if bad:
                    fails.add(f"{p}.properties", psev)
                continue
            if k == "additionalProperties":
                if par is False:
                    allowed = set(sch.get("properties", {}))
                    pats = list(sch.get("patternProperties", {}))
                    bad = any(
                        key not in allowed
                        and not any(re.search(rx, key) for rx in pats)
                        for key in val
                    )
                    if bad:
                        fails.add(f"{p}.additionalProperties", psev)
                continue
            if not _eval({k: par}, val, schema):
                fails.add(f"{p}.{k}", psev)
    return out


# ---------------------------------------------------------------------------
# Schema grammar (hypothesis)
# ---------------------------------------------------------------------------


def _random_schemas(n: int) -> list[dict]:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ints = st.integers(-3, 6)

    @st.composite
    def num_leaf(draw):
        opts = {
            "minimum": ints,
            "maximum": ints,
            "exclusiveMinimum": ints,
            "exclusiveMaximum": ints,
            "multipleOf": st.integers(1, 3),
            "const": ints,
            "enum": st.lists(ints, min_size=1, max_size=3, unique=True),
        }
        keys = draw(
            st.lists(st.sampled_from(sorted(opts)), min_size=1, max_size=2, unique=True)
        )
        return {k: draw(opts[k]) for k in keys}

    @st.composite
    def a_schema(draw):
        sch = {"type": "number"}
        simple = {
            "minimum": ints,
            "maximum": ints,
            "exclusiveMinimum": ints,
            "exclusiveMaximum": ints,
            "multipleOf": st.integers(1, 3),
            "const": ints,
            "enum": st.lists(ints, min_size=1, max_size=3, unique=True),
        }
        menu = sorted(simple) + ["not", "allOf", "anyOf", "oneOf", "ifThenElse", "$ref"]
        for k in draw(st.lists(st.sampled_from(menu), max_size=4, unique=True)):
            if k == "not":
                sch["not"] = draw(num_leaf())
            elif k in ("allOf", "anyOf", "oneOf"):
                sch[k] = [draw(num_leaf()), draw(num_leaf())]
            elif k == "ifThenElse":
                sch["if"] = draw(num_leaf())
                sch["then"] = draw(num_leaf())
                sch["else"] = draw(num_leaf())
            elif k == "$ref":
                sch["$ref"] = "#/$defs/d0"
            else:
                sch[k] = draw(simple[k])
        return sch

    @st.composite
    def str_value_leaf(draw):
        kk = draw(st.sampled_from(["pattern", "minLength"]))
        if kk == "pattern":
            return {"pattern": draw(st.sampled_from(VAL_PATTERNS))}
        return {"minLength": draw(st.integers(0, 3))}

    @st.composite
    def m_schema(draw):
        sch = {"type": "object"}
        for k in draw(
            st.lists(
                st.sampled_from(
                    [
                        "minProperties",
                        "maxProperties",
                        "propertyNames",
                        "patternProperties",
                        "required",
                        "properties",
                        "additionalProperties",
                    ]
                ),
                max_size=4,
                unique=True,
            )
        ):
            if k == "propertyNames":
                sch[k] = {"pattern": draw(st.sampled_from(KEY_PATTERNS))}
            elif k == "patternProperties":
                regexes = draw(
                    st.lists(st.sampled_from(["^x", "^k", "q$"]),
                             min_size=1, max_size=2, unique=True)
                )
                sch[k] = {rx: draw(str_value_leaf()) for rx in regexes}
            elif k == "required":
                sch[k] = draw(
                    st.lists(st.sampled_from(["k", "j"]), min_size=1, max_size=2, unique=True)
                )
            elif k == "properties":
                members = draw(
                    st.lists(st.sampled_from(["k", "j"]), min_size=1, max_size=2, unique=True)
                )
                sch[k] = {mem: draw(str_value_leaf()) for mem in members}
            elif k == "additionalProperties":
                sch[k] = False
            else:
                sch[k] = draw(st.integers(0, 3))
        return sch

    @st.composite
    def b_schema(draw):
        sch = {"type": "string"}
        simple = {
            "minLength": st.integers(0, 4),
            "maxLength": st.integers(0, 4),
            "pattern": st.sampled_from(PATTERNS),
            "const": st.sampled_from(B_POOL),
            "enum": st.lists(st.sampled_from(B_POOL), min_size=1, max_size=3, unique=True),
        }
        for k in draw(st.lists(st.sampled_from(sorted(simple)), max_size=3, unique=True)):
            sch[k] = draw(simple[k])
        if draw(st.booleans()):
            sch["x-severity"] = draw(st.sampled_from(["warning", "info"]))
        return sch

    @st.composite
    def c_schema(draw):
        sch = {"type": "array"}
        for k in draw(
            st.lists(
                st.sampled_from(
                    ["minItems", "maxItems", "uniqueItems", "items", "contains"]
                ),
                max_size=3,
                unique=True,
            )
        ):
            if k == "uniqueItems":
                sch[k] = True
            elif k == "items":
                sch[k] = draw(num_leaf())
            elif k == "contains":
                sch[k] = draw(num_leaf())
                if draw(st.booleans()):
                    sch["minContains"] = draw(st.integers(0, 3))
                if draw(st.booleans()):
                    sch["maxContains"] = draw(st.integers(0, 3))
            else:
                sch[k] = draw(st.integers(0, 4))
        return sch

    @st.composite
    def whole(draw):
        sch = {
            "$schema": "https://json-schema.org/draft/2020-12/schema",
            "type": "object",
            "properties": {
                "a": draw(a_schema()),
                "b": draw(b_schema()),
                "c": draw(c_schema()),
                "m": draw(m_schema()),
            },
        }
        if "$ref" in sch["properties"]["a"]:
            sch["$defs"] = {"d0": draw(num_leaf())}
        req = draw(
            st.lists(st.sampled_from(["a", "b", "c", "m"]), max_size=2, unique=True)
        )
        if req:
            sch["required"] = req
        if draw(st.booleans()):
            x, y = draw(st.sampled_from([("a", "b"), ("b", "c"), ("c", "a"), ("m", "a")]))
            sch["dependentRequired"] = {x: [y]}
        if draw(st.booleans()):
            member = {"type": "object", "properties": {"b": draw(b_schema())}}
            mreq = draw(st.lists(st.sampled_from(["a", "b"]), max_size=1))
            if mreq:
                member["required"] = mreq
            sch["allOf"] = [member]
        return sch

    acc: list[dict] = []

    @settings(max_examples=n, deadline=None)
    @given(whole())
    def collect(s):
        acc.append(s)

    collect()
    return acc


def _random_combination_schemas(n: int) -> list[dict]:
    """Random top-level ``anyOf``/``oneOf`` schema-set documents — the
    reference's ALL/ANY/ONE_OF combination approach
    (``JSONValidator.java:252-296``) drawn as data."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ints = st.integers(-3, 6)

    @st.composite
    def a_leaf(draw):
        sch = {"type": "number"}
        opts = {"minimum": ints, "maximum": ints, "multipleOf": st.integers(1, 3)}
        for k in draw(st.lists(st.sampled_from(sorted(opts)), max_size=2, unique=True)):
            sch[k] = draw(opts[k])
        return sch

    @st.composite
    def b_leaf(draw):
        sch = {"type": "string"}
        opts = {
            "minLength": st.integers(0, 4),
            "maxLength": st.integers(0, 4),
            "pattern": st.sampled_from(PATTERNS),
        }
        for k in draw(st.lists(st.sampled_from(sorted(opts)), max_size=2, unique=True)):
            sch[k] = draw(opts[k])
        return sch

    @st.composite
    def c_leaf(draw):
        sch = {"type": "array"}
        opts = {"minItems": st.integers(0, 4), "maxItems": st.integers(0, 4)}
        for k in draw(st.lists(st.sampled_from(sorted(opts)), max_size=2, unique=True)):
            sch[k] = draw(opts[k])
        return sch

    @st.composite
    def m_leaf(draw):
        sch = {"type": "object"}
        opts = {"minProperties": st.integers(0, 3), "maxProperties": st.integers(0, 3)}
        for k in draw(st.lists(st.sampled_from(sorted(opts)), max_size=2, unique=True)):
            sch[k] = draw(opts[k])
        return sch

    leaves = {"a": a_leaf, "b": b_leaf, "c": c_leaf, "m": m_leaf}

    @st.composite
    def branch(draw):
        # max_size=2 with min_size=0: empty = a permissive always-pass
        # member (regression: these must still count as matches)
        chosen = draw(
            st.lists(st.sampled_from(["a", "b", "c", "m"]), max_size=2, unique=True)
        )
        out = {
            "type": "object",
            "properties": {p: draw(leaves[p]()) for p in chosen},
        }
        if not chosen:
            del out["properties"]
            return out
        req = draw(st.lists(st.sampled_from(chosen), max_size=2, unique=True))
        if req:
            out["required"] = req
        return out

    @st.composite
    def whole(draw):
        kind = draw(st.sampled_from(["anyOf", "oneOf"]))
        return {
            "$schema": "https://json-schema.org/draft/2020-12/schema",
            "type": "object",
            "properties": {"a": draw(a_leaf())},
            kind: [draw(branch()) for _ in range(draw(st.integers(2, 3)))],
        }

    acc: list[dict] = []

    @settings(max_examples=n, deadline=None)
    @given(whole())
    def collect(s):
        acc.append(s)

    collect()
    return acc


def _expected_combination(schema: dict, doc: dict) -> set[str]:
    """Expected rule_ids for a top-level anyOf/oneOf schema document,
    from the probed report contract: branch errors are suppressed when
    the combination holds; on a 0-pass doc a ``combination.any`` /
    ``combination.oneOf`` header row plus ``<kind><i>.``-prefixed branch
    errors appear; a >1-pass ONE_OF doc gets the single
    ``combination.oneOf.multiple`` header."""
    kind = "anyOf" if "anyOf" in schema else "oneOf"
    main = {k: v for k, v in schema.items() if k not in ("anyOf", "oneOf")}
    fails = set(_expected(main, doc))
    branch_fails = [set(_expected(br, doc)) for br in schema[kind]]
    npass = sum(1 for bf in branch_fails if not bf)
    if npass == 0:
        fails.add("combination.any" if kind == "anyOf" else "combination.oneOf")
        for i, bf in enumerate(branch_fails):
            fails.update(f"{kind}{i}.{rid}" for rid in bf)
    elif kind == "oneOf" and npass > 1:
        fails.add("combination.oneOf.multiple")
    return fails


def test_random_combination_differential(spark):
    docs = [r for i, r in enumerate(_doc_grid()) if i % 2 == 0]
    df = spark.createDataFrame(docs, DDL)
    for sch in _random_combination_schemas(10):
        rs, defs = ruleset_from_json_schema(sch, name="fzc")
        got = {
            (r["doc_id"], r["rule_id"])
            for r in violations_df(df, rs, definitions=defs).collect()
        }
        want = set()
        for doc_id, a, b, c, m in docs:
            want.update(
                (doc_id, rid)
                for rid in _expected_combination(sch, {"a": a, "b": b, "c": c, "m": m})
            )
        assert got == want, (
            f"combination divergence: extra={sorted(got - want)[:6]} "
            f"missing={sorted(want - got)[:6]} schema={sch}"
        )


# Pinned seed schema: fails loudly with a readable diff if the importer's
# rule naming (required / dependentRequired / ifThenElse / contains fold)
# ever changes, before the fuzz produces an opaque mismatch.
SEED_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "type": "object",
    "required": ["b"],
    "dependentRequired": {"b": ["a"]},
    "properties": {
        "a": {
            "type": "number",
            "if": {"minimum": 2},
            "then": {"multipleOf": 2},
            "else": {"maximum": 0},
            "oneOf": [{"minimum": 0}, {"minimum": 2}],
        },
        "b": {"type": "string", "pattern": "x"},
        "c": {"type": "array", "contains": {"minimum": 2}, "minContains": 1, "maxContains": 2},
    },
}


def _run_chunk(spark, schemas: list[dict], docs: list[tuple]) -> None:
    merged, merged_defs = [], {}
    for i, sch in enumerate(schemas):
        rs, defs = ruleset_from_json_schema(sch, name=f"fz{i}")
        assert isinstance(rs, RuleSet), "grammar emits plain object schemas only"
        # namespace each schema's definitions so chunks merge cleanly
        merged_defs.update({f"s{i}:{k}": v for k, v in defs.items()})
        for r in rs.rules:
            if r.kind == "$ref":
                r = replace(r, params={**r.params, "ref": f"s{i}:{r.params['ref']}"})
            merged.append(replace(r, rule_id=f"s{i}.{r.rule_id}"))
    ruleset = RuleSet(rules=tuple(merged), name="fuzz")

    df = spark.createDataFrame(docs, DDL)
    got = {
        (r["doc_id"], r["rule_id"], r["severity"])
        for r in violations_df(df, ruleset, definitions=merged_defs).collect()
    }

    want = set()
    for doc_id, a, b, c, m in docs:
        doc = {"a": a, "b": b, "c": c, "m": m}
        for i, sch in enumerate(schemas):
            want.update(
                (doc_id, f"s{i}.{rid}", sev)
                for rid, sev in _expected(sch, doc).items()
            )
            for j, member in enumerate(sch.get("allOf", [])):
                want.update(
                    (doc_id, f"s{i}.allOf{j}.{rid}", sev)
                    for rid, sev in _expected(member, doc).items()
                )

    if got != want:
        extra, missing = sorted(got - want), sorted(want - got)
        raise AssertionError(
            f"engine/spec divergence: {len(extra)} extra, {len(missing)} missing; "
            f"first={((extra + missing)[:6])}; schemas={schemas}"
        )


def test_seed_schema_naming_and_semantics(spark):
    _run_chunk(spark, [SEED_SCHEMA], _doc_grid())


# ---------------------------------------------------------------------------
# Metamorphic cross-dialect fuzz: a 2020-12 schema and its mechanical
# draft-4 downgrade (boolean exclusive bounds, `dependencies`,
# `definitions`) must produce IDENTICAL violations — the reference
# accepts both dialects through networknt's multi-draft mode
# (JSONValidator.java:321-345) with the same outcomes.
# ---------------------------------------------------------------------------


def _random_common_schemas(n: int) -> list[dict]:
    """Random schemas restricted to the draft-4-expressible keyword
    subset, spelled in 2020-12 form."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ints = st.integers(-3, 6)

    @st.composite
    def num_leaf(draw):
        sch = {}
        side = draw(st.sampled_from(["none", "min", "xmin", "max", "xmax", "both"]))
        if side in ("min", "both"):
            sch["minimum"] = draw(ints)
        if side == "xmin":
            sch["exclusiveMinimum"] = draw(ints)
        if side in ("max", "both"):
            sch["maximum"] = draw(ints)
        if side == "xmax":
            sch["exclusiveMaximum"] = draw(ints)
        if draw(st.booleans()):
            sch["multipleOf"] = draw(st.integers(1, 3))
        return sch

    @st.composite
    def whole(draw):
        a = {"type": "number", **draw(num_leaf())}
        defs = None
        if draw(st.booleans()):
            defs = draw(num_leaf()) or {"minimum": 0}
            a = {"type": "number", "$ref": "#/$defs/d0"}
        b = {"type": "string"}
        for k in draw(
            st.lists(
                st.sampled_from(["minLength", "maxLength", "pattern", "enum"]),
                max_size=2,
                unique=True,
            )
        ):
            if k == "pattern":
                b[k] = draw(st.sampled_from(PATTERNS))
            elif k == "enum":
                b[k] = draw(
                    st.lists(st.sampled_from(B_POOL), min_size=1, max_size=3, unique=True)
                )
            else:
                b[k] = draw(st.integers(0, 4))
        c = {"type": "array"}
        for k in draw(
            st.lists(
                st.sampled_from(["minItems", "maxItems", "uniqueItems", "items"]),
                max_size=2,
                unique=True,
            )
        ):
            if k == "uniqueItems":
                c[k] = True
            elif k == "items":
                c[k] = draw(num_leaf()) or {"minimum": 0}
            else:
                c[k] = draw(st.integers(0, 4))
        m = {"type": "object"}
        for k in draw(
            st.lists(
                st.sampled_from(["minProperties", "maxProperties", "required"]),
                max_size=2,
                unique=True,
            )
        ):
            if k == "required":
                m[k] = draw(
                    st.lists(st.sampled_from(["k", "j"]), min_size=1, max_size=2, unique=True)
                )
            else:
                m[k] = draw(st.integers(0, 3))
        sch = {
            "$schema": "https://json-schema.org/draft/2020-12/schema",
            "type": "object",
            "properties": {"a": a, "b": b, "c": c, "m": m},
        }
        if defs is not None:
            sch["$defs"] = {"d0": defs}
        req = draw(st.lists(st.sampled_from(["a", "b", "c", "m"]), max_size=2, unique=True))
        if req:
            sch["required"] = req
        if draw(st.booleans()):
            x, y = draw(st.sampled_from([("a", "b"), ("b", "c"), ("m", "a")]))
            sch["dependentRequired"] = {x: [y]}
        return sch

    acc: list[dict] = []

    @settings(max_examples=n, deadline=None)
    @given(whole())
    def collect(s):
        acc.append(s)

    collect()
    return acc


def _downgrade_draft4(node):
    """Mechanical 2020-12 → draft-4 respelling (deep copy)."""
    if isinstance(node, list):
        return [_downgrade_draft4(x) for x in node]
    if not isinstance(node, dict):
        return node
    out = {}
    for k, v in node.items():
        if k == "$schema":
            out[k] = "http://json-schema.org/draft-04/schema#"
        elif k == "exclusiveMinimum" and isinstance(v, (int, float)) and not isinstance(v, bool):
            out["minimum"] = v
            out["exclusiveMinimum"] = True
        elif k == "exclusiveMaximum" and isinstance(v, (int, float)) and not isinstance(v, bool):
            out["maximum"] = v
            out["exclusiveMaximum"] = True
        elif k == "dependentRequired":
            out["dependencies"] = _downgrade_draft4(v)
        elif k == "$defs":
            out["definitions"] = _downgrade_draft4(v)
        elif k == "$ref":
            out[k] = v.replace("#/$defs/", "#/definitions/")
        else:
            out[k] = _downgrade_draft4(v)
    return out


def _downgrade_draft7(node):
    """Mechanical 2020-12 → draft-7 respelling: numeric exclusive
    bounds stay (draft-6 introduced them), but ``$defs`` is spelled
    ``definitions`` and ``dependentRequired`` is ``dependencies``."""
    if isinstance(node, list):
        return [_downgrade_draft7(x) for x in node]
    if not isinstance(node, dict):
        return node
    out = {}
    for k, v in node.items():
        if k == "$schema":
            out[k] = "http://json-schema.org/draft-07/schema#"
        elif k == "dependentRequired":
            out["dependencies"] = _downgrade_draft7(v)
        elif k == "$defs":
            out["definitions"] = _downgrade_draft7(v)
        elif k == "$ref":
            out[k] = v.replace("#/$defs/", "#/definitions/")
        else:
            out[k] = _downgrade_draft7(v)
    return out


def _downgrade_draft6(node):
    """Mechanical 2020-12 → draft-6 respelling: identical to the
    draft-7 form for this keyword subset (numeric exclusives arrived
    in 6, if/then/else in 7 and the grammar emits none) but declares
    the draft-06 meta-schema — locking in that the `-06` URI neither
    trips the draft-4 boolean-bounds rewrite nor the draft-4 ``id``
    rename."""
    out = _downgrade_draft7(node)
    if isinstance(out, dict) and "$schema" in out:
        out = {**out, "$schema": "http://json-schema.org/draft-06/schema#"}
    return out


def test_dialect_downgrade_metamorphic(spark):
    """Each random schema is imported four ways — 2020-12 spelling,
    its draft-7 and draft-6 respellings and its draft-4 downgrade —
    and every run must match the independent evaluator's violations
    for the ORIGINAL (same semantics, different spelling)."""
    docs = _doc_grid()
    schemas = _random_common_schemas(12)
    merged, merged_defs = [], {}
    spellings = (
        ("n", lambda s: s),
        ("o", _downgrade_draft4),
        ("p", _downgrade_draft7),
        ("q", _downgrade_draft6),
    )
    for i, sch in enumerate(schemas):
        for tag, down in spellings:
            rs, defs = ruleset_from_json_schema(down(sch), name=f"x{i}{tag}")
            assert isinstance(rs, RuleSet)
            ns = f"s{i}{tag}"
            merged_defs.update({f"{ns}:{k}": v for k, v in defs.items()})
            for r in rs.rules:
                if r.kind == "$ref":
                    r = replace(r, params={**r.params, "ref": f"{ns}:{r.params['ref']}"})
                merged.append(replace(r, rule_id=f"{ns}.{r.rule_id}"))
    ruleset = RuleSet(rules=tuple(merged), name="dialect-fuzz")

    df = spark.createDataFrame(docs, DDL)
    got = {
        (r["doc_id"], r["rule_id"])
        for r in violations_df(df, ruleset, definitions=merged_defs).collect()
    }

    want = set()
    for doc_id, a, b, c, m in docs:
        doc = {"a": a, "b": b, "c": c, "m": m}
        for i, sch in enumerate(schemas):
            for rid in _expected(sch, doc):
                for tag, _ in spellings:
                    want.add((doc_id, f"s{i}{tag}.{rid}"))
    assert got == want, (
        f"dialect divergence: extra={sorted(got - want)[:6]} "
        f"missing={sorted(want - got)[:6]}"
    )


def test_random_schema_differential(spark):
    docs = _doc_grid()
    schemas = _random_schemas(24)
    for lo in range(0, len(schemas), 6):
        _run_chunk(spark, schemas[lo : lo + 6], docs)


SPAN_DDL = (
    "doc_id long, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)
SPAN_KINDS = [None, "text", "media", "imge"]
SPAN_TEXTS = [None, "", "x", "yy"]
SPAN_OFFSETS = [None, -2, 0, 1, 3, 7]


def _span_doc_grid() -> list[tuple]:
    """~50 deterministic docs whose spans sweep the field value spaces."""
    rows, doc_id = [], 0
    pool = [
        (k, t, None, o)
        for ik, k in enumerate(SPAN_KINDS)
        for it, t in enumerate(SPAN_TEXTS)
        for io, o in enumerate(SPAN_OFFSETS)
        if (ik + it + io) % 3 == 0
    ]
    rows.append((0, None))
    rows.append((1, []))
    for i in range(0, len(pool) - 2, 2):
        rows.append((i // 2 + 2, [pool[i], pool[i + 1]]))
    return rows


def _random_span_schemas(n: int) -> list[dict]:
    """Random element-object `items` schemas over the spans table shape."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @st.composite
    def field_leaf(draw, field):
        if field == "offset":
            opts = {
                "minimum": st.integers(-3, 6),
                "maximum": st.integers(-3, 6),
                "multipleOf": st.integers(1, 3),
            }
        else:
            opts = {
                "pattern": st.sampled_from(PATTERNS),
                "enum": st.lists(
                    st.sampled_from(["text", "media", "x", "yy"]),
                    min_size=1, max_size=2, unique=True,
                ),
                "minLength": st.integers(0, 3),
            }
        sch = {}
        for k in draw(st.lists(st.sampled_from(sorted(opts)), max_size=2, unique=True)):
            sch[k] = draw(opts[k])
        return sch

    @st.composite
    def whole(draw):
        fields = draw(
            st.lists(st.sampled_from(["kind", "text", "offset"]), max_size=2, unique=True)
        )
        items = {"type": "object"}
        if fields:
            items["properties"] = {f: draw(field_leaf(f)) for f in fields}
        req = draw(
            st.lists(st.sampled_from(["kind", "text", "media_ref"]), max_size=2, unique=True)
        )
        if req:
            items["required"] = req
        spans = {"type": "array", "items": items}
        if draw(st.booleans()):
            spans["minItems"] = draw(st.integers(0, 3))
        if draw(st.booleans()):
            spans["maxItems"] = draw(st.integers(0, 3))
        return {
            "$schema": "https://json-schema.org/draft/2020-12/schema",
            "type": "object",
            "properties": {"spans": spans},
        }

    acc: list[dict] = []

    @settings(max_examples=n, deadline=None)
    @given(whole())
    def collect(s):
        acc.append(s)

    collect()
    return acc


def _expected_span(schema: dict, spans) -> set[tuple[str, str]]:
    """(span_path, rule_id suffix) pairs for one doc's spans column."""
    fails: set[tuple[str, str]] = set()
    sch = schema["properties"]["spans"]
    if spans is None:
        return fails
    if "minItems" in sch and len(spans) < sch["minItems"]:
        fails.add(("/spans", "spans.minItems"))
    if "maxItems" in sch and len(spans) > sch["maxItems"]:
        fails.add(("/spans", "spans.maxItems"))
    items = sch["items"]
    names = ["kind", "text", "media_ref", "offset"]
    for i, span in enumerate(spans):
        vals = dict(zip(names, span))
        for f in items.get("required", []):
            if vals[f] is None:
                fails.add((f"/spans/{i}/{f}", f"spans.items.{f}.required"))
        for f, fsub in items.get("properties", {}).items():
            if vals[f] is None:
                continue
            for k, par in fsub.items():
                if not _eval({k: par}, vals[f]):
                    fails.add((f"/spans/{i}/{f}", f"spans.items.{f}.{k}"))
    return fails


def test_random_spans_items_differential(spark):
    """The element-object `items` import path (per-field span rules over
    the north-rule spans table shape) vs the spec evaluator."""
    docs = _span_doc_grid()
    df = spark.createDataFrame(docs, SPAN_DDL)
    for sch in _random_span_schemas(10):
        rs, defs = ruleset_from_json_schema(sch, name="fzs")
        got = {
            (r["doc_id"], r["span_path"], r["rule_id"])
            for r in violations_df(df, rs, definitions=defs).collect()
        }
        want = {
            (doc_id, path, rid)
            for doc_id, spans in docs
            for path, rid in _expected_span(sch, spans)
        }
        assert got == want, (
            f"spans divergence: extra={sorted(got - want)[:6]} "
            f"missing={sorted(want - got)[:6]} schema={sch}"
        )


def test_detail_mode_is_identity_invariant(spark):
    """``detail=True`` appends expected/found text to messages but must
    not change WHICH violations fire (rule identity, path, severity) —
    the invariant that keeps the aggregate rollup exact
    (``JSONValidator.java:466-481`` groups on severity|message-template).
    Checked under random schemas, not just the pinned oracle row."""
    docs = _doc_grid()
    df = spark.createDataFrame(docs, DDL)
    for sch in _random_schemas(6):
        rs, defs = ruleset_from_json_schema(sch, name="fzd")
        key = lambda r: (r["doc_id"], r["span_path"], r["rule_id"], r["severity"])
        plain = sorted(map(key, violations_df(df, rs, definitions=defs).collect()))
        detailed = violations_df(df, rs, definitions=defs, detail=True).collect()
        assert sorted(map(key, detailed)) == plain
        assert all(
            "(expected " in r["message"] or r["message"].startswith("[/")
            for r in detailed
        )
