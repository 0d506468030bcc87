"""S5 preprocessor analogue + pandas-UDF rule path."""

from __future__ import annotations

from pyspark.sql import functions as F

from json_validator_spark.operators.row_checks import violations_df
from json_validator_spark.rules.model import Rule, RuleSet
from json_validator_spark.sources.preprocess import filter_spans, pointer_project
from tests.conftest import rows_set

SPANS = "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"


def _docs(spark):
    rows = [
        ("d1", [("text", "hello", None, 0), ("media", None, "media://x", 5)]),
        ("d2", [("text", "world", None, 0)]),
    ]
    return spark.createDataFrame(rows, SPANS)


def test_pointer_project_star(spark):
    out = rows_set(pointer_project(_docs(spark), "/spans/*/text"))
    assert out == {
        ("d1", "/spans/0/text", "hello"),
        ("d1", "/spans/1/text", None),
        ("d2", "/spans/0/text", "world"),
    }


def test_pointer_project_positional_and_doc(spark):
    out = rows_set(pointer_project(_docs(spark), "/spans/1/kind"))
    assert out == {("d1", "/spans/1/kind", "media"), ("d2", "/spans/1/kind", None)}
    out2 = rows_set(pointer_project(_docs(spark), "/doc_id"))
    assert ("d1", "/doc_id", "d1") in out2


def test_filter_spans_preserves_order(spark):
    out = filter_spans(_docs(spark), "text").collect()
    by_id = {r["doc_id"]: [s["text"] for s in r["spans"]] for r in out}
    assert by_id == {"d1": ["hello"], "d2": ["world"]}


def test_pandas_pattern_rule(spark):
    # lookahead: needs ≥1 digit AND ≥1 letter — not expressible the same
    # way in Java rlike, routed through the Arrow-vectorized pandas UDF
    docs = spark.createDataFrame(
        [("a1", "ab12"), ("a2", "abcd"), ("a3", "1234"), ("a4", None)],
        "doc_id string, code string",
    )
    rs = RuleSet(
        rules=(
            Rule(
                "pattern.code", "/code", "pattern",
                {"regex": r"(?=.*\d)(?=.*[a-z]).*", "engine": "python"},
            ),
        )
    )
    v = violations_df(docs, rs)
    assert {r["doc_id"] for r in v.collect()} == {"a2", "a3"}
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "EvalPython" in plan
