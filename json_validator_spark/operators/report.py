"""Report layer — the TAR-report analogue (``JSONValidator.java:443-500``).

The reference builds, per document: result ∈ {SUCCESS, FAILURE} (SUCCESS
iff zero messages, ``:454-459``), error counters (``:447-448``), ordered
report items (``:139-146``), and an *aggregate* report grouping errors by
``severity|message`` (``:466-481``). Set-based analogues:

- per-doc verdicts: a flag column, no shuffle;
- per-partition verdicts: groupBy(spark_partition_id) — the unit the
  checkpoint/lineage layer tracks;
- aggregate rollup: groupBy(rule_id, severity) — map-side partial agg
  makes this cheap at any scale;
- deterministic ordering for diffable test output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_verdicts(with_viols: DataFrame, doc_id: str = "doc_id") -> DataFrame:
    """Per-document verdict from a ``with_violations`` frame. SUCCESS iff
    zero error-severity violations (``JSONValidator.java:454-459``) —
    warnings/infos are counted but do not fail the document."""
    n_err = F.size(F.filter(F.col("violations"), lambda v: v["severity"] == "error"))
    n_warn = F.size(F.filter(F.col("violations"), lambda v: v["severity"] == "warning"))
    # result derives from n_errors, not doc_pass: by construction every
    # failing combination emits ≥1 error-severity violation (ANY/ONE_OF
    # failures add an error header), and referencing doc_pass would
    # re-evaluate every branch expression a third time (HOFs are
    # CodegenFallback — each reference is a full re-evaluation).
    return with_viols.select(
        F.col(doc_id).alias("doc_id"),
        n_err.alias("n_errors"),
        n_warn.alias("n_warnings"),
    ).withColumn(
        "result",
        F.when(F.col("n_errors") == 0, F.lit("SUCCESS")).otherwise(F.lit("FAILURE")),
    )


def doc_verdicts_merged(
    docs: DataFrame, violations: DataFrame, doc_id: str = "doc_id"
) -> DataFrame:
    """Per-document verdict over the FULL merged violation stream —
    row rules ∪ uniqueness ∪ referential ∪ plugin providers — the exact
    counter semantics of the reference's report, which counts plugin
    TAR items alongside schema errors (``JSONValidator.java:193-219``
    merge feeding ``createReport`` ``:443-459``).

    Shape: the violations side partial-aggregates to one (doc_id,
    counts) row per doc-with-violations — typically a tiny fraction of
    the corpus — and joins back LEFT so clean docs still get SUCCESS
    rows. At scale the aggregated side is broadcast-eligible;
    otherwise it hash-joins on the same doc_id key the corpus is
    already salted by."""
    counts = violations.groupBy(F.col("doc_id").cast("string").alias("__d")).agg(
        F.sum((F.col("severity") == "error").cast("long")).alias("n_errors"),
        F.sum((F.col("severity") == "warning").cast("long")).alias("n_warnings"),
    )
    base = docs.select(F.col(doc_id).cast("string").alias("doc_id"))
    return (
        base.join(counts, base["doc_id"] == counts["__d"], "left")
        .select(
            "doc_id",
            F.coalesce("n_errors", F.lit(0)).alias("n_errors"),
            F.coalesce("n_warnings", F.lit(0)).alias("n_warnings"),
        )
        .withColumn(
            "result",
            F.when(F.col("n_errors") == 0, F.lit("SUCCESS")).otherwise(F.lit("FAILURE")),
        )
    )


def partition_verdicts(with_viols: DataFrame) -> DataFrame:
    """Per-partition pass/fail rollup ``(partition_id, n_docs, n_errors,
    result)`` — the verdict unit named by the north star; partial
    (map-side) aggregation means one tiny row per partition hits the
    shuffle."""
    n_err = F.size(F.filter(F.col("violations"), lambda v: v["severity"] == "error"))
    return (
        with_viols.select(
            F.spark_partition_id().alias("partition_id"), n_err.alias("n_err")
        )
        .groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_err").alias("n_errors"),
        )
        .withColumn(
            "result",
            F.when(F.col("n_errors") == 0, F.lit("SUCCESS")).otherwise(F.lit("FAILURE")),
        )
    )


def aggregate_report(violations: DataFrame) -> DataFrame:
    """Rule-level rollup ``(rule_id, severity, count)`` — exactly the
    reference's aggregate report keyed on severity|message with the
    location prefix stripped (``JSONValidator.java:466-481,479``); our
    rule_id *is* the location-free message identity."""
    return violations.groupBy("rule_id", "severity").agg(
        F.count(F.lit(1)).alias("count")
    )


def ordered(violations: DataFrame) -> DataFrame:
    """Deterministic report ordering (ReportItemComparator analogue,
    ``JSONValidator.java:139-146``) — for diffable golden-output tests."""
    return violations.orderBy("doc_id", "span_path", "rule_id")


def run_summary(with_viols: DataFrame) -> DataFrame:
    """One-row run rollup — the CLI summary line
    (``FileReport``/``ValidationRunner.java:156-157``): docs seen,
    total error/warning counts, failed docs, failure rate. One agg
    pass, map-side combined — constant output at any corpus size."""
    n_err = F.size(F.filter(F.col("violations"), lambda v: v["severity"] == "error"))
    n_warn = F.size(F.filter(F.col("violations"), lambda v: v["severity"] == "warning"))
    return (
        with_viols.select(n_err.alias("e"), n_warn.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("e").alias("n_errors"),
            F.sum("w").alias("n_warnings"),
            F.sum((F.col("e") > 0).cast("long")).alias("n_failed_docs"),
            F.round(F.avg((F.col("e") > 0).cast("double")), 6).alias("failure_rate"),
        )
    )


def top_violations(violations: DataFrame, k: int = 20) -> DataFrame:
    """Top-K most frequent rules — the human-facing truncated export
    (``ValidationRunner.java:163-176`` caps); full set is always persisted."""
    return (
        aggregate_report(violations)
        .orderBy(F.desc("count"), "rule_id", "severity")
        .limit(k)
    )


_ITEM_FIELDS = "location:string,rule_id:string,severity:string,description:string"


def _report_items_agg():
    """Sorted report-item list aggregate — the ReportItemComparator
    ordering (sort_array over (location, rule_id, ...) structs)."""
    return F.sort_array(
        F.collect_list(
            F.struct(
                F.col("span_path").alias("location"),
                F.col("rule_id").alias("rule_id"),
                F.col("severity").alias("severity"),
                F.col("message").alias("description"),
            )
        )
    )


def _empty_items():
    return F.array().cast(f"array<struct<{_ITEM_FIELDS}>>")


def tar_reports_from_violations(
    docs: DataFrame, violations: DataFrame, doc_id: str = "doc_id"
) -> DataFrame:
    """``tar_reports`` computed from the exploded violation stream in ONE
    aggregation: counters (nrOfErrors/nrOfWarnings) and the sorted
    report-item list come out of the same groupBy, then left-join back
    to the corpus ids so clean docs get SUCCESS rows. Use this when the
    violations are already materialized (the pipeline's normal state) —
    passing separately-derived verdicts + violations into
    ``tar_reports`` evaluates the rule projection once per consumer
    subtree, twice the scan work for the same output."""
    agg = (
        violations.groupBy(F.col("doc_id").cast("string").alias("__d"))
        .agg(
            F.sum((F.col("severity") == "error").cast("long")).alias("n_errors"),
            F.sum((F.col("severity") == "warning").cast("long")).alias("n_warnings"),
            _report_items_agg().alias("reports"),
        )
    )
    empty = _empty_items()
    base = docs.select(F.col(doc_id).cast("string").alias("doc_id"))
    return (
        base.join(agg, base["doc_id"] == agg["__d"], "left")
        .select(
            "doc_id",
            F.when(F.coalesce("n_errors", F.lit(0)) == 0, F.lit("SUCCESS"))
            .otherwise(F.lit("FAILURE")).alias("result"),
            F.struct(
                F.coalesce("n_errors", F.lit(0)).alias("nrOfErrors"),
                F.coalesce("n_warnings", F.lit(0)).alias("nrOfWarnings"),
            ).alias("counters"),
            F.coalesce("reports", empty).alias("reports"),
        )
    )


def tar_reports(doc_verdicts_df: DataFrame, violations: DataFrame) -> DataFrame:
    """Per-document TAR-shaped report rows — the reference's JSON report
    contract (``JSONValidator.java:443-500``; JSON serialization of the
    TAR via the REST accept header, ``RestValidationController.java:149-159``):
    ``(doc_id, result, counters{nrOfErrors, nrOfWarnings}, reports[])``
    with items sorted by (span_path, rule_id) — the ReportItemComparator
    ordering (``:139-146``). Write as JSON lines for the per-doc report
    artifact; the per-doc ``collect_list`` is bounded by that doc's
    violation count, never corpus-sized."""
    items = (
        violations.groupBy(F.col("doc_id").cast("string").alias("doc_id"))
        .agg(_report_items_agg().alias("reports"))
    )
    empty = _empty_items()
    return (
        doc_verdicts_df.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            "result",
            F.struct(
                F.col("n_errors").cast("long").alias("nrOfErrors"),
                F.col("n_warnings").cast("long").alias("nrOfWarnings"),
            ).alias("counters"),
        )
        .join(items, "doc_id", "left")
        .withColumn("reports", F.coalesce("reports", empty))
    )


# ----------------------------------------------------------------------
# GITB TAR XML serialization (S7 completion)
# ----------------------------------------------------------------------

_XML_HEADER = '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
_TAR_OPEN = (
    '<TAR xmlns="http://www.gitb.com/tr/v1/" '
    'xmlns:ns2="http://www.gitb.com/core/v1/" '
    'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">'
)


def tar_xml(report_row, date: str | None = None) -> str:
    """One per-document TAR report as the GITB XML wire format — the
    shape ``FileManager.java:100-139`` saves as ``TAR-<uuid>.xml`` and
    ``JSONValidator.java:443-465`` populates: result, counters
    (nrOfAssertions always zero in the reference's JSON flow), and one
    ``<error|warning|info xsi:type="BAR">`` element per report item
    carrying description + location (the JSON-pointer contentPath,
    ``JSONValidator.java:462-463``). ``report_row`` is one
    ``tar_reports``/``tar_reports_from_violations`` row; items are
    already in ReportItemComparator order (sort_array upstream), so the
    serialization is deterministic. Driver-side BY DESIGN: callers pass
    the truncated per-doc report set, never a corpus-sized frame."""
    from xml.sax.saxutils import escape

    c = report_row["counters"]
    lines = [_XML_HEADER, _TAR_OPEN]
    if date is not None:
        lines.append(f"    <date>{escape(date)}</date>")
    lines += [
        f"    <result>{escape(report_row['result'])}</result>",
        "    <counters>",
        "        <nrOfAssertions>0</nrOfAssertions>",
        f"        <nrOfErrors>{int(c['nrOfErrors'])}</nrOfErrors>",
        f"        <nrOfWarnings>{int(c['nrOfWarnings'])}</nrOfWarnings>",
        "    </counters>",
        "    <reports>",
    ]
    for it in report_row["reports"]:
        tag = it["severity"] if it["severity"] in ("error", "warning", "info") else "info"
        lines += [
            f'        <{tag} xsi:type="BAR">',
            f"            <description>{escape(it['description'])}</description>",
            f"            <location>{escape(it['location'])}</location>",
            f"        </{tag}>",
        ]
    lines += ["    </reports>", "</TAR>", ""]
    return "\n".join(lines)


def write_tar_xml_reports(
    tar_df: DataFrame,
    out_dir: str,
    max_docs: int = 100,
    date: str | None = None,
) -> list[str]:
    """Write ``TAR-<doc_id>.xml`` files (the ``getReportFileNameXml``
    naming, ``FileManager.java:121-124`` with the doc id as the uuid
    slot) for the FIRST ``max_docs`` documents by id — the reference's
    per-input report artifact is inherently per-file, so this sink is
    explicitly truncated driver-side output (the full report stays in
    the distributed tables; same contract as ``top_violations``).
    Returns the written paths."""
    from pathlib import Path

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rows = tar_df.orderBy("doc_id").limit(max_docs).collect()
    paths: list[str] = []
    for r in rows:
        p = out / f"TAR-{r['doc_id']}.xml"
        p.write_text(tar_xml(r, date=date))
        paths.append(str(p))
    return paths


def aggregate_tar_items(violations: DataFrame) -> DataFrame:
    """Aggregate-report items — the reference's ``AggregateReportItems``
    keying (``JSONValidator.java:466-481``): severity element name +
    description with the ``[location] `` prefix stripped (``:472-479``),
    counted. Output ``(severity, description, count)``, rule-catalog-
    sized (one partial-agg groupBy over the violation stream)."""
    desc = F.when(
        F.col("message").startswith("["),
        F.expr("substring(message, instr(message, '] ') + 2)"),
    ).otherwise(F.col("message"))
    return (
        violations.groupBy("severity", desc.alias("description"))
        .agg(F.count(F.lit(1)).alias("count"))
    )


def tar_xml_aggregate(items, n_errors: int, n_warnings: int, date: str | None = None) -> str:
    """One run-level aggregate TAR as XML — the ``TAR-<uuid>_aggregate``
    sibling of the per-doc report (``FileManager.java:100-124``
    aggregate naming; populated at ``JSONValidator.java:485-499``).
    ``items`` are ``aggregate_tar_items`` rows. itb-commons' exact
    aggregated-item wording is localization-dependent (library not in
    this repo); here each item is its location-free description
    prefixed with the occurrence count — deterministic and
    golden-testable. Items serialize in (severity, description) order."""
    from xml.sax.saxutils import escape

    lines = [_XML_HEADER, _TAR_OPEN]
    if date is not None:
        lines.append(f"    <date>{escape(date)}</date>")
    lines += [
        f"    <result>{'FAILURE' if n_errors else 'SUCCESS'}</result>",
        "    <counters>",
        "        <nrOfAssertions>0</nrOfAssertions>",
        f"        <nrOfErrors>{int(n_errors)}</nrOfErrors>",
        f"        <nrOfWarnings>{int(n_warnings)}</nrOfWarnings>",
        "    </counters>",
        "    <reports>",
    ]
    for it in sorted(items, key=lambda r: (r["severity"], r["description"])):
        tag = it["severity"] if it["severity"] in ("error", "warning", "info") else "info"
        lines += [
            f'        <{tag} xsi:type="BAR">',
            f"            <description>({int(it['count'])}x) "
            f"{escape(it['description'])}</description>",
            f"        </{tag}>",
        ]
    lines += ["    </reports>", "</TAR>", ""]
    return "\n".join(lines)


def write_tar_xml_aggregate(
    violations: DataFrame, out_path: str, date: str | None = None
) -> str:
    """Serialize the run-level aggregate report to ONE
    ``TAR-aggregate.xml`` file. The only driver-side data is the
    rule-catalog-sized (severity, description, count) frame plus two
    counters from the same rows — corpus-size-independent by
    construction. Returns the written path."""
    from pathlib import Path

    items = aggregate_tar_items(violations).collect()
    n_err = sum(r["count"] for r in items if r["severity"] == "error")
    n_warn = sum(r["count"] for r in items if r["severity"] == "warning")
    p = Path(out_path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(tar_xml_aggregate(items, n_err, n_warn, date=date))
    return str(p)
