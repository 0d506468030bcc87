"""ALL/ANY/ONE_OF truth tables incl. the 0-pass and >1-pass oneOf cases
(JSONValidator.java:252-296 semantics)."""

from __future__ import annotations

from json_validator_spark.operators.row_checks import violations_df, with_violations
from json_validator_spark.rules.model import Combination, Rule, RuleSet
from tests.conftest import rows_set

# Two branches over one int column: branch "lo" requires v<=10, branch
# "hi" requires v>=20. v=5 → only lo; v=25 → only hi; v=15 → neither;
# with overlapping branches (lo2: v<=30) v=5 → both.
BRANCH_LO = Rule("lo.max", "/v", "maximum", {"value": 10}, ruleset="lo")
BRANCH_HI = Rule("hi.min", "/v", "minimum", {"value": 20}, ruleset="hi")
BRANCH_LO_WIDE = Rule("wide.max", "/v", "maximum", {"value": 30}, ruleset="wide")


def df(spark):
    return spark.createDataFrame([("a", 5), ("b", 25), ("c", 15)], "doc_id string, v int")


def flags(spark, combination, *rules):
    rs = RuleSet(rules=tuple(rules), combination=combination)
    wv = with_violations(df(spark), rs)
    return rows_set(wv, "doc_id", "doc_pass", "n_branches_passed")


def test_all_semantics(spark):
    got = flags(spark, Combination.ALL, BRANCH_LO, BRANCH_HI)
    # ALL: both branches must pass — impossible here for every doc
    assert got == {("a", False, 1), ("b", False, 1), ("c", False, 0)}


def test_any_semantics(spark):
    got = flags(spark, Combination.ANY, BRANCH_LO, BRANCH_HI)
    assert got == {("a", True, 1), ("b", True, 1), ("c", False, 0)}


def test_any_violations_only_when_no_branch_passes(spark):
    rs = RuleSet(rules=(BRANCH_LO, BRANCH_HI), combination=Combination.ANY)
    v = violations_df(df(spark), rs)
    got = rows_set(v, "doc_id", "rule_id")
    # only doc c (no branch passed) has violations: header + both branch errors
    assert got == {("c", "combination.any"), ("c", "lo.max"), ("c", "hi.min")}
    # branch violations carry the [n]: prefix (JSONValidator.java:305-310)
    msgs = {r["message"] for r in v.filter("rule_id != 'combination.any'").collect()}
    assert all(m.startswith("[0]: ") or m.startswith("[1]: ") for m in msgs)


def test_oneof_exactly_one(spark):
    got = flags(spark, Combination.ONE_OF, BRANCH_LO, BRANCH_HI, BRANCH_LO_WIDE)
    # a: lo+wide pass (2) → fail; b: hi+wide pass (2) → fail; c: wide only (1) → pass
    assert got == {("a", False, 2), ("b", False, 2), ("c", True, 1)}


def test_oneof_violation_shapes(spark):
    rs = RuleSet(rules=(BRANCH_LO, BRANCH_HI, BRANCH_LO_WIDE), combination=Combination.ONE_OF)
    v = violations_df(df(spark), rs)
    got = rows_set(v, "doc_id", "rule_id")
    # >1 pass → single count violation (validator_en.properties:21 analogue)
    assert got == {
        ("a", "combination.oneOf.multiple"),
        ("b", "combination.oneOf.multiple"),
    }


def test_oneof_zero_pass_emits_branch_errors(spark):
    rs = RuleSet(rules=(BRANCH_LO, BRANCH_HI), combination=Combination.ONE_OF)
    v = violations_df(df(spark), rs)
    got = rows_set(v.filter("doc_id = 'c'"), "rule_id")
    assert got == {("combination.oneOf",), ("lo.max",), ("hi.min",)}


def test_ruleset_group_two_groups(spark):
    """Preconfigured ⊕ external composition (JSONValidator.java:423-435):
    each group keeps its own approach, groups conjoin allOf-style."""
    from json_validator_spark.rules.model import RuleSetGroup

    grp = RuleSetGroup(
        groups=(
            RuleSet(
                name="external", combination=Combination.ANY,
                rules=(BRANCH_LO, BRANCH_HI),
            ),
            RuleSet(
                name="preconfigured",
                rules=(Rule("pre.min", "/v", "minimum", {"value": 10}),),
            ),
        )
    )
    wv = with_violations(df(spark), grp)
    # a(v=5): ANY passes (lo), ALL fails (min 10) → fail, 1 group passed
    # b(v=25): both pass → pass; c(v=15): ANY fails, ALL passes → fail
    assert rows_set(wv, "doc_id", "doc_pass", "n_branches_passed") == {
        ("a", False, 1), ("b", True, 2), ("c", False, 1),
    }
    v = violations_df(df(spark), grp)
    got = rows_set(v, "doc_id", "rule_id")
    # a: only the preconfigured group's violation (ANY group passed → suppressed)
    # c: ANY header + both tagged branch errors; preconfigured passed
    assert got == {
        ("a", "pre.min"),
        ("c", "combination.any"), ("c", "lo.max"), ("c", "hi.min"),
    }
    # ANY-group failures keep their branch tag inside the group
    msgs = {r["message"] for r in v.filter("doc_id = 'c' AND rule_id != 'combination.any'").collect()}
    assert all(m.startswith("[0]: ") or m.startswith("[1]: ") for m in msgs)


def test_ruleset_group_duplicate_rule_id_raises():
    import pytest as _pytest

    from json_validator_spark.rules.model import RuleSetGroup

    with _pytest.raises(ValueError, match="duplicate rule_id"):
        RuleSetGroup(
            groups=(
                RuleSet(rules=(BRANCH_LO,), name="g1"),
                RuleSet(rules=(BRANCH_LO,), name="g2"),
            )
        )
