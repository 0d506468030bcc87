"""format.* keyword family: table-driven valid/invalid samples per
format (the reference's ~20 formats, jsv-messages.properties:51-70) and
a Hypothesis property check that the Java regex engine (Spark rlike) and
Python ``re`` agree on every format grammar — the Java-vs-Python regex
divergence is SURVEY §7's top watchlist item and the foundation of the
DuckDB-oracle parity story."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from json_validator_spark.functions.formats import FORMAT_REGEX

SAMPLES: dict[str, tuple[list[str], list[str]]] = {
    # format: ([valid...], [invalid...])
    "date": (
        ["2024-02-29", "1999-12-31", "2023-04-30"],
        ["2024-13-01", "2024-00-10", "24-01-01", "2023-02-30", "2023-04-31", "2023-06-31"],
    ),
    "time": (["23:59:59Z", "00:00:00+05:30", "12:00:00.5z"], ["24:00:00Z", "12:60:00Z", "12:00:00"]),
    "date-time": (
        ["2024-01-01T00:00:00Z", "2024-01-01 23:59:60.999-08:00"],
        ["2024-01-01", "2024-01-01T25:00:00Z"],
    ),
    "duration": (["P1Y2M3DT4H5M6S", "PT0.5S", "P4W"], ["1Y", "Pxx", "P", "PT"]),
    "email": (["a.b+c@example.com", "x@sub.domain.org"], ["@nope.com", "a@b", "a b@c.de"]),
    "ipv4": (["0.0.0.0", "255.255.255.255", "192.168.1.1"], ["256.1.1.1", "1.2.3", "1.2.3.4.5"]),
    "ipv6": (["::1", "2001:db8::8a2e:370:7334", "fe80::"], ["12345::", "g::1"]),
    "hostname": (["example.com", "a-b.c-d.e"], ["-bad.com", "bad-.com", "a..b"]),
    "uri": (["https://x.org/p?q=1#f", "urn:isbn:0451450523"], ["not a uri", "//missing.scheme"]),
    "uuid": (
        ["123e4567-e89b-12d3-a456-426614174000"],
        ["123e4567e89b12d3a456426614174000", "123e4567-e89b-12d3-a456-42661417400g"],
    ),
    "json-pointer": (["", "/a/b~0c/0", "/~1x"], ["a/b", "/a~2b"]),
    "relative-json-pointer": (["0", "1/a/b", "0#"], ["/a", "01", "-1"]),
    "media-ref": (
        ["media://123e4567-e89b-12d3-a456-426614174000"],
        ["media:/broken", "http://not-media", "media://xyz"],
    ),
    "media-type": (["image/png", "application/vnd.api+json"], ["image png", "/png", "image/"]),
}


def test_format_samples(spark):
    rows = [
        (fmt, s, expected)
        for fmt, (good, bad) in SAMPLES.items()
        for s, expected in [*((g, True) for g in good), *((b, False) for b in bad)]
    ]
    df = spark.createDataFrame(rows, "fmt string, s string, expected boolean")
    checks = F.lit(False)
    for fmt in SAMPLES:
        checks = F.when(F.col("fmt") == fmt, F.col("s").rlike(FORMAT_REGEX[fmt])).otherwise(checks)
    bad = df.withColumn("got", checks).filter(F.col("got") != F.col("expected"))
    assert bad.count() == 0, bad.collect()


def test_python_re_agrees_on_samples():
    """The same regexes under Python re (what a pandas-UDF path or the
    DuckDB RE2 oracle would see) give identical verdicts."""
    for fmt, (good, bad) in SAMPLES.items():
        rx = re.compile(FORMAT_REGEX[fmt])
        for s in good:
            assert rx.search(s), (fmt, s)
        for s in bad:
            assert not rx.search(s), (fmt, s)


def test_hypothesis_java_python_regex_agreement(spark):
    """Property: for random strings, Spark rlike == Python re.search for
    every format regex (no lookaround/backrefs ⇒ engines must agree)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from(
        list("abcZ019.:-/@+TZz #%~{}") + ["::", "2024-", "media://", "P1Y", "e89b"]
    )
    cases: list[str] = []

    @settings(max_examples=120, deadline=None)
    @given(st.lists(alphabet, min_size=0, max_size=12))
    def collect(parts):
        cases.append("".join(parts))

    collect()
    rows = [(s,) for s in set(cases)]
    df = spark.createDataFrame(rows, "s string")
    for fmt, rx in FORMAT_REGEX.items():
        got = {
            r["s"]: r["m"]
            for r in df.withColumn("m", F.col("s").rlike(rx)).collect()
        }
        pat = re.compile(rx)
        for s, jm in got.items():
            assert jm == bool(pat.search(s)), (fmt, s)


def test_format_regex_compilability(spark):
    """format:"regex" (jsv-messages.properties:66) — the value must
    itself compile; vectorized pandas UDF path, doc-level."""
    from json_validator_spark.operators.row_checks import violations_df
    from json_validator_spark.rules.model import Rule, RuleSet

    df = spark.createDataFrame(
        [
            ("d1", r"^x[0-9]+$"),   # compiles
            ("d2", "([unclosed"),    # re.error
            ("d3", "a{2,1}"),        # bad quantifier range → re.error
            ("d4", None),            # absent → passes (null semantics)
        ],
        "doc_id string, rx string",
    )
    rs = RuleSet(rules=(Rule("fmt.rx", "/rx", "format", {"format": "regex"}),))
    got = {(r["doc_id"], r["rule_id"]) for r in violations_df(df, rs).collect()}
    assert got == {("d2", "fmt.rx"), ("d3", "fmt.rx")}


def test_python_engine_span_rule_raises_at_compile_time():
    """Pandas-UDF predicates inside span lambdas are rejected clearly at
    rule-compile time, not with Spark's opaque analysis error."""
    import pytest as _pytest

    from json_validator_spark.rules.compiler import normalize_rule
    from json_validator_spark.rules.model import Rule

    with _pytest.raises(ValueError, match="doc-level only"):
        normalize_rule(
            Rule("p", "/spans/*/text", "pattern", {"regex": "x", "engine": "python"})
        )
    with _pytest.raises(ValueError, match="doc-level only"):
        normalize_rule(Rule("f", "/spans/*/text", "format", {"format": "regex"}))


def test_hypothesis_spark_duckdb_parity(spark):
    """Property: the md5 / tokenization / unit-uniform primitives every
    oracle rests on are bit-identical between Spark and DuckDB for
    arbitrary printable-ASCII inputs (the corpus contract; unicode
    casefolding differences between ICU and the JVM are out of contract
    and the testdata is ASCII)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from json_validator_spark.functions.text import hash_long, tokens, unit_uniform
    from pyspark.sql import functions as F

    strings: list[str] = []

    @settings(max_examples=200, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
        )
    )
    def collect(s):
        strings.append(s)

    collect()
    rows = [(i, s) for i, s in enumerate(dict.fromkeys(strings))]
    df = spark.createDataFrame(rows, "i long, s string")
    got = df.select(
        "i",
        F.md5(F.col("s")).alias("h"),
        F.array_join(tokens(F.col("s")), "|").alias("toks"),
        F.round(unit_uniform(F.col("i"), F.lit("salt")), 9).alias("u"),
        hash_long(F.col("s"), hex_chars=15).alias("hl"),
    ).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(
        "SELECT i, md5(s), "
        "coalesce(array_to_string(list_filter(string_split_regex(lower(s), '[^a-z0-9]+'),"
        " x -> x <> ''), '|'), ''), "
        "round(('0x' || substr(md5(concat_ws(':', i::VARCHAR, 'salt')), 1, 6))::BIGINT"
        " / 16777216.0, 9), "
        "('0x' || substr(md5(s), 1, 15))::BIGINT "
        "FROM t ORDER BY i"
    ).fetchall()
    got_t = sorted((r["i"], r["h"], r["toks"], float(r["u"]), r["hl"]) for r in got)
    want_t = sorted((w[0], w[1], w[2], float(w[3]), w[4]) for w in want)
    assert got_t == want_t


def test_duckdb_re2_agrees_on_samples():
    """Third engine leg: DuckDB's RE2 gives the same verdict as Java
    regex (Spark) and Python re on every format's good/bad samples —
    the regexes avoid lookaround precisely so all three agree."""
    import duckdb

    con = duckdb.connect()
    for fmt, (good, bad) in SAMPLES.items():
        rx = FORMAT_REGEX[fmt]
        for s, expect in [(g, True) for g in good] + [(b, False) for b in bad]:
            (got,) = con.execute(
                "SELECT regexp_matches(?, ?)", [s, rx]
            ).fetchone()
            assert got == expect, (fmt, s, expect)


def test_python_engine_guard_catches_nested_subschemas():
    """The span-level pandas-UDF guard also rejects Python-engine
    predicates NESTED in subschemas (items/contains/combinators)."""
    import pytest as _pytest

    from json_validator_spark.rules.compiler import normalize_rule
    from json_validator_spark.rules.model import Rule

    nested = Rule(
        "n", "/spans/*/text", "items",
        {"schema": {"kind": "format", "params": {"format": "regex"}}},
    )
    with _pytest.raises(ValueError, match="doc-level only"):
        normalize_rule(nested)
    deep = Rule(
        "d", "/spans/*/text", "allOf",
        {"schemas": [
            {"kind": "minLength", "params": {"value": 1}},
            {"kind": "pattern", "params": {"regex": "x", "engine": "python"}},
        ]},
    )
    with _pytest.raises(ValueError, match="doc-level only"):
        normalize_rule(deep)
