"""Differential fuzzing: the Spark engine vs an INDEPENDENT pure-Python
rule interpreter on hypothesis-random documents.

The DuckDB oracles check the driver queries; this file checks the rule
*semantics* themselves against a second, from-scratch implementation of
the JSON-Schema evaluation contract (null-passes-except-presence,
span-level guards, strict monotonicity, combination algebra) — the same
differential-testing idea as sqlsmith/sqlancer, aimed at the keyword
layer. Any divergence between ``operators/row_checks`` and the ~60-line
reference interpreter below fails the property.
"""

from __future__ import annotations

import re

from json_validator_spark.operators.row_checks import violations_df, with_violations
from json_validator_spark.rules.model import Combination, Rule, RuleSet

SCHEMA = (
    "doc_id long, v double, s string, arr array<int>, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)

RULES = (
    Rule("req.s", "/s", "required"),
    Rule("range.v", "/v", "range", {"min": -5.0, "max": 5.0}),
    Rule("enum.s", "/s", "enum", {"values": ["aa", "bb", "cc"]}, severity="warning"),
    Rule("pat.s", "/s", "pattern", {"regex": "^[a-c]+$"}),
    Rule("minlen.s", "/s", "minLength", {"value": 2}),
    Rule("minitems.arr", "/arr", "minItems", {"value": 1}),
    Rule("uniq.arr", "/arr", "uniqueItems", {}),
    Rule("mono.spans", "/spans", "monotonic", {"field": "offset"}),
    Rule("enum.kind", "/spans/*/kind", "enum", {"values": ["text", "media"]}),
    Rule(
        "req.text", "/spans/*/text", "required",
        {"when": {"field": "kind", "eq": "text"}},
    ),
)


def interpret(row: dict) -> set[tuple]:
    """Independent evaluation of RULES over one row — deliberately
    written from the JSON-Schema spec, not from the engine code."""
    out: set[tuple] = set()
    d = row["doc_id"]

    def viol(path, rid, sev="error"):
        out.add((d, path, rid, sev))

    v, s, arr, spans = row["v"], row["s"], row["arr"], row["spans"]
    if s is None:
        viol("/s", "req.s")
    else:
        if not ("aa" == s or "bb" == s or "cc" == s):
            viol("/s", "enum.s", "warning")
        if not re.search("^[a-c]+$", s):
            viol("/s", "pat.s")
        if len(s) < 2:
            viol("/s", "minlen.s")
    if v is not None and not (-5.0 <= v <= 5.0):
        viol("/v", "range.v")
    if arr is not None:
        if len(arr) < 1:
            viol("/arr", "minitems.arr")
        if len(set(arr)) != len(arr):
            viol("/arr", "uniq.arr")
    if spans is not None:
        offs = [sp["offset"] for sp in spans]
        # strict increase; a null offset passes (absent value semantics)
        pairs = [
            (a, b) for a, b in zip(offs, offs[1:]) if a is not None and b is not None
        ]
        if not all(a < b for a, b in pairs):
            viol("/spans", "mono.spans")
        for i, sp in enumerate(spans):
            k = sp["kind"]
            if k is not None and k not in ("text", "media"):
                viol(f"/spans/{i}/kind", "enum.kind")
            if k == "text" and sp["text"] is None:
                viol(f"/spans/{i}/text", "req.text")
    return out


def _random_rows(n: int = 250) -> list[tuple]:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    maybe_str = st.one_of(st.none(), st.text(alphabet="abcdx", max_size=4))
    span = st.fixed_dictionaries(
        {
            "kind": st.one_of(st.none(), st.sampled_from(["text", "media", "imge"])),
            "text": maybe_str,
            "media_ref": maybe_str,
            "offset": st.one_of(st.none(), st.integers(0, 20)),
        }
    )
    row = st.tuples(
        st.one_of(st.none(), st.floats(-10, 10, allow_nan=False)),
        maybe_str,
        st.one_of(st.none(), st.lists(st.integers(0, 3), max_size=4)),
        st.one_of(st.none(), st.lists(span, max_size=4)),
    )
    acc: list[tuple] = []

    @settings(max_examples=n, deadline=None)
    @given(row)
    def collect(r):
        acc.append(r)

    collect()
    return [
        (i, v, s, arr, [tuple(sp.values()) for sp in sp_l] if sp_l is not None else None)
        for i, (v, s, arr, sp_l) in enumerate(acc)
    ]


def test_differential_rule_semantics(spark):
    rows = _random_rows()
    df = spark.createDataFrame(rows, SCHEMA)
    rs = RuleSet(rules=RULES)
    got = {
        (r["doc_id"], r["span_path"], r["rule_id"], r["severity"])
        for r in violations_df(df, rs).collect()
    }
    want: set[tuple] = set()
    for i, v, s, arr, spans in rows:
        want |= interpret(
            {
                "doc_id": i, "v": v, "s": s, "arr": arr,
                "spans": [
                    {"kind": k, "text": t, "media_ref": m, "offset": o}
                    for (k, t, m, o) in spans
                ]
                if spans is not None
                else None,
            }
        )
    assert got == want


def test_differential_combination_algebra(spark):
    """ANY / ONE_OF doc_pass and branch counts vs the interpreter."""
    rows = _random_rows(150)
    df = spark.createDataFrame(rows, SCHEMA)
    branch_a = Rule("a.range.v", "/v", "range", {"min": -5.0, "max": 5.0}, ruleset="A")
    branch_b = Rule("b.minlen.s", "/s", "minLength", {"value": 2}, ruleset="B")

    def passes(v, s):
        a = v is None or -5.0 <= v <= 5.0
        b = s is None or len(s) >= 2
        return a, b

    for combo, rule_fn in (
        (Combination.ANY, lambda a, b: a or b),
        (Combination.ONE_OF, lambda a, b: (a + b) == 1),
    ):
        rs = RuleSet(rules=(branch_a, branch_b), combination=combo)
        got = {
            r["doc_id"]: (r["doc_pass"], r["n_branches_passed"])
            for r in with_violations(df, rs)
            .select("doc_id", "doc_pass", "n_branches_passed")
            .collect()
        }
        for i, v, s, _arr, _spans in rows:
            a, b = passes(v, s)
            assert got[i] == (rule_fn(a, b), int(a) + int(b)), (combo, i, v, s)


MAP_RULES = (
    Rule("rk", "/props", "requiredKey", {"key": "k"}),
    Rule("minp", "/props", "minProperties", {"value": 1}),
    Rule("maxp", "/props", "maxProperties", {"value": 3}),
    Rule(
        "ap", "/props", "additionalProperties",
        {"allowed": ["k", "a", "b", "flag", "t"], "allowed_patterns": ["^x-"]},
    ),
    Rule("pn", "/props", "propertyNames", {"regex": "^[a-z0-9_-]+$"}),
    Rule(
        "pp", "/props", "patternProperties",
        {"key_regex": "^n_", "schema": {"kind": "pattern", "params": {"regex": r"^\d+$"}}},
    ),
    Rule(
        "ds", "/props", "dependentSchemas",
        {"key": "flag", "schema": {"kind": "minProperties", "params": {"value": 2}}},
    ),
    Rule(
        "pr", "/props", "properties",
        {"properties": {"a": {"kind": "pattern", "params": {"regex": r"^\d+$"}}}},
    ),
    Rule(
        "disc", "/props", "discriminator",
        {"key": "t", "mapping": {
            "num": {"kind": "requiredKey", "params": {"key": "k"}},
            "word": {"kind": "maxProperties", "params": {"value": 2}},
        }},
    ),
)


def interpret_map(doc_id: int, props: dict | None) -> set[tuple]:
    out: set[tuple] = set()

    def viol(rid):
        out.add((doc_id, "/props", rid, "error"))

    if props is None:
        return out  # absent value passes every map keyword (null semantics)
    keys = list(props)
    if "k" not in props:
        viol("rk")
    if len(keys) < 1:
        viol("minp")
    if len(keys) > 3:
        viol("maxp")
    allowed = {"k", "a", "b", "flag", "t"}
    if any(x not in allowed and not re.search("^x-", x) for x in keys):
        viol("ap")
    if not all(re.search("^[a-z0-9_-]+$", x) for x in keys):
        viol("pn")
    if not all(
        re.search(r"^\d+$", props[x]) for x in keys if re.search("^n_", x)
    ):
        viol("pp")
    if "flag" in props and len(keys) < 2:
        viol("ds")
    if "a" in props and not re.search(r"^\d+$", props["a"]):
        viol("pr")
    t = props.get("t")
    if t is None:
        viol("disc")
    elif t == "num":
        if "k" not in props:
            viol("disc")
    elif t == "word":
        if len(keys) > 2:
            viol("disc")
    else:
        viol("disc")
    return out


def test_differential_map_keywords(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    maps = st.one_of(
        st.none(),
        st.dictionaries(
            st.sampled_from(["k", "a", "b", "flag", "t", "x-trace", "n_1", "Z!"]),
            st.sampled_from(["1", "22", "zz", "num", "word", ""]),
            max_size=4,
        ),
    )
    acc: list = []

    @settings(max_examples=250, deadline=None)
    @given(maps)
    def collect(m):
        acc.append(m)

    collect()
    rows = [(i, m) for i, m in enumerate(acc)]
    df = spark.createDataFrame(rows, "doc_id long, props map<string,string>")
    got = {
        (r["doc_id"], r["span_path"], r["rule_id"], r["severity"])
        for r in violations_df(df, RuleSet(rules=MAP_RULES)).collect()
    }
    want: set[tuple] = set()
    for i, m in rows:
        want |= interpret_map(i, m)
    assert got == want


NESTED_RULES = (
    Rule(
        "cont", "/arr", "contains",
        {"schema": {"kind": "minimum", "params": {"value": 2}}, "min": 1, "max": 2},
    ),
    Rule(
        "items1", "/arr", "additionalItems",
        {"schema": {"kind": "maximum", "params": {"value": 3}}, "start": 1},
    ),
    Rule(
        "prefix", "/arr", "prefixItems",
        {"schemas": [
            {"kind": "minimum", "params": {"value": 1}},
            {"kind": "maximum", "params": {"value": 2}},
        ]},
    ),
    Rule(
        "allof", "/s", "allOf",
        {"schemas": [
            {"kind": "minLength", "params": {"value": 1}},
            {"kind": "pattern", "params": {"regex": "^a"}},
        ]},
    ),
    Rule(
        "anyof", "/s", "anyOf",
        {"schemas": [
            {"kind": "enum", "params": {"values": ["xx", "dd"]}},
            {"kind": "pattern", "params": {"regex": "^a"}},
        ]},
    ),
    Rule(
        "oneof", "/s", "oneOf",
        {"schemas": [
            {"kind": "pattern", "params": {"regex": "^a"}},
            {"kind": "minLength", "params": {"value": 3}},
        ]},
    ),
    Rule("not", "/s", "not", {"schema": {"kind": "enum", "params": {"values": ["xx"]}}}),
)


def interpret_nested(doc_id: int, arr: list | None, s: str | None) -> set[tuple]:
    out: set[tuple] = set()

    def viol(path, rid):
        out.add((doc_id, path, rid, "error"))

    if arr is not None:
        n_match = sum(1 for x in arr if x >= 2)
        if not (1 <= n_match <= 2):
            viol("/arr", "cont")
        if not all(x <= 3 for x in arr[1:]):       # additionalItems: beyond prefix
            viol("/arr", "items1")
        ok = True
        if len(arr) > 0 and not (arr[0] >= 1):
            ok = False
        if len(arr) > 1 and not (arr[1] <= 2):
            ok = False
        if not ok:
            viol("/arr", "prefix")
    if s is not None:
        if not (len(s) >= 1 and re.search("^a", s)):
            viol("/s", "allof")
        if not (s in ("xx", "dd") or re.search("^a", s)):
            viol("/s", "anyof")
        if (bool(re.search("^a", s)) + (len(s) >= 3)) != 1:
            viol("/s", "oneof")
        if s == "xx":
            viol("/s", "not")
    return out


def test_differential_nested_combinators(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rows_st = st.tuples(
        st.one_of(st.none(), st.lists(st.integers(0, 5), max_size=4)),
        st.one_of(st.none(), st.text(alphabet="adx", max_size=4)),
    )
    acc: list = []

    @settings(max_examples=250, deadline=None)
    @given(rows_st)
    def collect(r):
        acc.append(r)

    collect()
    rows = [(i, a, s) for i, (a, s) in enumerate(acc)]
    df = spark.createDataFrame(rows, "doc_id long, arr array<int>, s string")
    got = {
        (r["doc_id"], r["span_path"], r["rule_id"], r["severity"])
        for r in violations_df(df, RuleSet(rules=NESTED_RULES)).collect()
    }
    want: set[tuple] = set()
    for i, a, s in rows:
        want |= interpret_nested(i, a, s)
    assert got == want


def test_differential_snapshot_diff(spark):
    """snapshot_diff vs an independent pure-Python dict diff over seeded
    random snapshot pairs with NULLs, empty strings, separator bytes
    and every status class."""
    import random

    from json_validator_spark.operators.set_checks import snapshot_diff

    rng = random.Random(20260817)
    alphabet = ["", "a", "b", "a\x1fb", "\x1e", None, "x" * 5]

    def rand_snapshot(ids):
        return {
            i: (rng.choice(alphabet), rng.choice(alphabet)) for i in ids
        }

    for trial in range(5):
        old_ids = set(rng.sample(range(100), 60))
        new_ids = set(rng.sample(range(100), 60))
        old = rand_snapshot(old_ids)
        new = rand_snapshot(new_ids)
        # force some unchanged rows so the omission path is exercised
        for i in list(old_ids & new_ids)[:10]:
            new[i] = old[i]

        expected = {}
        for i in old_ids | new_ids:
            if i not in new:
                expected[i] = "removed"
            elif i not in old:
                expected[i] = "added"
            elif old[i] != new[i]:
                expected[i] = "changed"

        schema = "doc_id long, text string, lang string"
        old_df = spark.createDataFrame(
            [(i, *old[i]) for i in sorted(old_ids)], schema
        )
        new_df = spark.createDataFrame(
            [(i, *new[i]) for i in sorted(new_ids)], schema
        )
        got = {
            r["doc_id"]: r["status"]
            for r in snapshot_diff(old_df, new_df).collect()
        }
        assert got == expected, f"trial {trial}"


def test_differential_content_keywords(spark):
    """contentEncoding / contentMediaType vs an independent Python
    interpreter (base64 + json stdlib): the engine's JVM-side pass
    (base64 grammar, unbase64 → try_parse_json) must agree with the
    spec-written evaluation — decoded CONTENT parses as the declared
    media type (draft-7 §8.4 / 2019-09 §8.8.2), undecodable transport
    fails, non-JSON media types never assert."""
    import base64 as b64mod
    import json as jsonmod

    decoded_pool = [
        '{"a":1}', "[1,2]", "123", "true", '"txt"', " 5 ",  # valid JSON values
        "hello", "not json", "", "{broken", "a b c",  # invalid
        # valid JSON PREFIX + trailing garbage — RFC 8259 requires the
        # JSON text to be the whole string, but Spark's try_parse_json
        # (Jackson) ignores trailing content; the engine closes the
        # hole with array+object wrapper parses (vocabulary.py). The
        # bracket-escape forms ('1] , [2') defeat any SINGLE wrapper.
        "2 33]", '{"a":1} junk', "[1,2] x", "1, 2", '1, "a": 2',
        "1] , [2", '1} , {"a": 2', "true x", '"s" t',
    ]
    payloads = [b64mod.b64encode(p.encode()).decode() for p in decoded_pool]
    payloads += ["!not base64!", "QUJ", "ABCD", "MTIz", "QUJD=", "", "== =="]
    raw_pool = decoded_pool + ["  {\"k\": false} ", "nan", "[1,", "0.5e3"]

    rows = [
        (i * len(raw_pool) + j, p, r)
        for i, p in enumerate(payloads)
        for j, r in enumerate(raw_pool)
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload string, raw string")
    rs = RuleSet(rules=(
        Rule("ce", "/payload", "contentEncoding", {"encoding": "base64"}),
        Rule("cmt", "/payload", "contentMediaType",
             {"media_type": "application/json", "encoding": "base64"}),
        Rule("cmt_raw", "/raw", "contentMediaType",
             {"media_type": "application/json"}),
        Rule("cmt_plain", "/payload", "contentMediaType",
             {"media_type": "text/plain", "encoding": "base64"}),
    ))
    got = {(r["doc_id"], r["rule_id"])
           for r in violations_df(df, rs).collect()}

    b64_grammar = re.compile(
        r"([A-Za-z0-9+/]{4})*([A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?")

    def is_json(s: str) -> bool:
        try:
            jsonmod.loads(s)
            return True
        except Exception:
            return False

    def b64_json_ok(s: str) -> bool:
        if not b64_grammar.fullmatch(s):
            return False
        try:
            decoded = b64mod.b64decode(s).decode("utf-8")
        except Exception:
            return False
        return is_json(decoded)

    want = set()
    for i, p, r in rows:
        if not b64_grammar.fullmatch(p):
            want.add((i, "ce"))
        if not b64_json_ok(p):
            want.add((i, "cmt"))
        if not is_json(r):
            want.add((i, "cmt_raw"))
        # text/plain: never asserted — no cmt_plain rows expected
    assert got == want
