"""Rendering-layer tests: the CONSOLE/HTML/fix-script presentation over
the report queries (report/ReportBuilder.java:49-141,
PartialReport.java:16-76)."""

from __future__ import annotations

import re

import hbase_tools_spark.operators  # noqa: F401 — registers queries
from hbase_tools_spark.catalog import load_model
from hbase_tools_spark.registry import QUERIES
from hbase_tools_spark.reporting import (
    PARTIAL_EVENTS,
    REPORTERS,
    build_reports,
    cluster_state,
    make_report,
    render_console,
    render_html,
    resolution_script,
)
from tests.conftest import SF_DIR


def _model(spark):
    return load_model(spark, SF_DIR)


def test_partial_caps_events_and_full_does_not(spark):
    m = _model(spark)
    partial = build_reports(m, partial=True)
    full = build_reports(m, partial=False)
    by_name = {r.name: r for r in full}
    for r in partial:
        assert len(r.events) <= PARTIAL_EVENTS
        f = by_name[r.name]
        assert len(f.events) == len(r.events) + r.truncated
        # truncation keeps a prefix, not a resample
        assert f.events[: len(r.events)] == r.events


def test_report_severity_is_worst_event_severity(spark):
    m = _model(spark)
    for r in build_reports(m, partial=False):
        if not r.events:
            assert r.severity == "NONE"
        elif "CRITICAL" in r.severities:
            assert r.severity == "CRITICAL"


def test_console_rendering_contract(spark):
    m = _model(spark)
    reports = build_reports(m)
    text = render_console(reports, cluster_state(m))
    assert text.startswith("CLUSTER STATE: ")
    for name in REPORTERS:
        assert f"REPORT: {name}" in text
    # actionable events render "SEV: ... :: resolution"
    assert re.search(r"CRITICAL: .* :: \w", text)


def test_html_rendering_contract(spark):
    m = _model(spark)
    reports = build_reports(m)
    html = render_html(reports, cluster_state(m))
    assert html.startswith("<html><style>")
    assert html.count("<h3>REPORT: ") == len(REPORTERS)
    # one header row per non-empty report, header cells from the schema
    nonempty = [r for r in reports if r.events]
    assert html.count("<table") == len(nonempty)
    for r in nonempty:
        assert f"<th>{r.header[0]}</th>" in html
    total_rows = sum(len(r.events) + 1 for r in nonempty)
    assert html.count("<tr>") == total_rows


def test_resolution_script_lines_match_actionable_events(spark):
    m = _model(spark)
    reports = build_reports(m, partial=False)
    script = resolution_script(reports)
    lines = [ln for ln in script.splitlines() if ln]
    expected = sum(
        1
        for r in reports
        for sev, res in zip(r.severities, r.resolutions)
        if sev != "NONE" and res
    )
    assert len(lines) == expected
    for ln in lines:
        assert ln.startswith('echo "') and ln.endswith('| hbase shell ')
    # spot-check against a source query: every stale snapshot fix appears
    stale = QUERIES["report_snapshots_stale"].fn(m).collect()
    if stale and expected <= len(lines):
        assert any(r["resolution"] in script for r in stale)


def test_make_report_writes_files(spark, tmp_path):
    m = _model(spark)
    out = make_report(m, mode="html", out_dir=str(tmp_path), stamp="test")
    html = open(out["html"]).read()
    fixes = open(out["fixes"]).read()
    assert "<table" in html
    assert "hbase shell" in fixes
    out2 = make_report(m, mode="console", out_dir=str(tmp_path), stamp="test2")
    assert "CLUSTER STATE" in out2["console"]
