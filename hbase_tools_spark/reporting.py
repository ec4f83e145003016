"""Report rendering — the presentation layer over the report queries.

The reference renders its reporter suite three ways
(report/ReportBuilder.java:49-141): CONSOLE (severity-prefixed event
lines), HTML (one bordered table per reporter, written to
``report-<ts>.html``), and — in every mode — a resolution script
``fix-cluster-<ts>.sh`` of ``echo "<fix>" | hbase shell`` lines for
each non-NONE event (ComplexReport.makeResolutionFile,
PartialReport.java:44-76).  PARTIAL mode keeps only the first 15
events per reporter (PartialReport.java:16,23-28).

This module reproduces that contract over the registered report
queries: each query's DataFrame is one SingleReport; a ``severity``
column (when present) drives the per-report severity and the fix
script; a ``resolution`` column (when present) supplies the fix lines.

Scale note: rendering necessarily collects — but only report
relations, whose cardinality is O(servers + tables) by construction
(severity banding and top-k happen distributed, in the queries).  The
presentation layer never sees region- or event-scale data.
"""

from __future__ import annotations

import html as _html
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame

from .catalog import Model
from .registry import QUERIES

#: Reporter suite, mirroring ReportRunner.java:35-43's registration
#: order where a query re-expresses that reporter.
REPORTERS: tuple[str, ...] = (
    "report_biggest_regions",
    "report_compaction_queues",
    "report_rs_distribution",
    "report_rit_stuck",
    "report_snapshots_stale",
    "report_snapshots_toomany",
    "report_heap_pressure",
    "report_locality",
)

PARTIAL_EVENTS = 15  # PartialReport.PARTIAL_NUMBER_OF_EVENTS

_SEV_ORDER = {"CRITICAL": 0, "NORMAL": 1, "WARN": 2, "LOW": 3, "NONE": 4}


@dataclass
class RenderedReport:
    """One reporter's materialized output (events are stringified)."""

    name: str
    header: list[str]
    events: list[list[str]]
    severities: list[str]       # per event, aligned with ``events``
    resolutions: list[str]      # per event ('' when none)
    severity: str               # report-level roll-up
    truncated: int              # events dropped by PARTIAL mode


def _norm_sev(v: object) -> str:
    s = str(v).upper() if v is not None else "NONE"
    for known in _SEV_ORDER:
        if s.startswith(known):
            return known
    return "NONE"


def build_reports(
    m: Model, partial: bool = True, reporters: tuple[str, ...] = REPORTERS
) -> list[RenderedReport]:
    """Run every reporter query and materialize it as a RenderedReport
    (PARTIAL truncation applied driver-side, like the reference)."""
    out = []
    for name in reporters:
        df: DataFrame = QUERIES[name].fn(m)
        pdf = df.toPandas()
        truncated = 0
        if partial and len(pdf) > PARTIAL_EVENTS:
            truncated = len(pdf) - PARTIAL_EVENTS
            pdf = pdf.iloc[:PARTIAL_EVENTS]
        cols = list(pdf.columns)
        sev_col = "severity" if "severity" in cols else None
        res_col = "resolution" if "resolution" in cols else None
        events = [[str(v) for v in row] for row in pdf.itertuples(index=False)]
        sevs = (
            [_norm_sev(v) for v in pdf[sev_col]] if sev_col else ["NONE"] * len(pdf)
        )
        ress = [str(v) for v in pdf[res_col]] if res_col else [""] * len(pdf)
        out.append(
            RenderedReport(
                name=name,
                header=cols,
                events=events,
                severities=sevs,
                resolutions=ress,
                severity=min(sevs, key=lambda s: _SEV_ORDER[s], default="NONE")
                if sevs
                else "NONE",
                truncated=truncated,
            )
        )
    return out


def cluster_state(m: Model) -> str:
    """Headline cluster state from the complex roll-up query
    (ComplexReport.java:14-31's weighted severity)."""
    row = QUERIES["report_complex_rollup"].fn(m).collect()[0]
    return (
        f"CLUSTER STATE: {row['cluster_state']} "
        f"(critical={row['critical']} normal={row['normal']} "
        f"low={row['low']} weight={row['weight']})"
    )


def render_console(reports: list[RenderedReport], header: str) -> str:
    """CONSOLE mode (ReportBuilder.java:49-78): severity-prefixed event
    lines, ``=> problem :: resolution`` for actionable events."""
    lines = [header]
    for r in reports:
        lines.append(f"REPORT: {r.name}")
        lines.append(f"REPORT STATE: {r.severity}")
        for ev, sev, res in zip(r.events, r.severities, r.resolutions):
            body = ", ".join(ev)
            if sev == "NONE":
                lines.append(body)
            else:
                lines.append(f"{sev}: {body}" + (f" :: {res}" if res else ""))
        if r.truncated:
            lines.append(f"... {r.truncated} more events (PARTIAL report)")
    return "\n".join(lines)


def render_html(reports: list[RenderedReport], header: str) -> str:
    """HTML mode (ReportBuilder.java:88-138): one bordered table per
    reporter, header cells from the result schema."""
    esc = _html.escape
    parts = [
        "<html>",
        "<style>table, th, td {border: 1px solid black}</style>",
        "<body>",
        f"<h1>{esc(header)}</h1>",
    ]
    for r in reports:
        parts.append(f"<h3>REPORT: {esc(r.name)}</h3>")
        parts.append(f"<h3>REPORT SEVERITY: {esc(r.severity)}</h3>")
        if r.events:
            parts.append('<table style="border: 1px solid black">')
            parts.append(
                "<tr>" + "".join(f"<th>{esc(c)}</th>" for c in r.header) + "</tr>"
            )
            for ev in r.events:
                parts.append(
                    "<tr>" + "".join(f"<td>{esc(v)}</td>" for v in ev) + "</tr>"
                )
            parts.append("</table>")
        if r.truncated:
            parts.append(f"<h5>{r.truncated} more events (PARTIAL report)</h5>")
    parts.append("</body></html>")
    return "".join(parts)


def resolution_script(reports: list[RenderedReport]) -> str:
    """The fix script (PartialReport.makeResolutionFile): one
    ``echo "<fix>" | hbase shell`` line per non-NONE event with a
    resolution — our resolutions are hbase-shell commands, the
    reference's HBASE_SHELL destination."""
    lines = []
    for r in reports:
        for sev, res in zip(r.severities, r.resolutions):
            if sev != "NONE" and res:
                lines.append('echo "' + res.replace("'", "\\'") + '" | hbase shell ')
    return "\n".join(lines)


def make_report(
    m: Model,
    mode: str = "console",
    partial: bool = True,
    out_dir: str = ".",
    stamp: str = "now",
) -> dict[str, str]:
    """Build + render + write, the ReportBuilder.makeReport analog.

    Returns {"console": text} or {"html": path, "fixes": path}; the fix
    script is written in every mode (ReportMode.makeReport always calls
    makeResolutionFile)."""
    reports = build_reports(m, partial=partial)
    header = cluster_state(m)
    fixes = resolution_script(reports)
    fix_path = os.path.join(out_dir, f"fix-cluster-{stamp}.sh")
    with open(fix_path, "w") as f:
        f.write(fixes)
    out = {"fixes": fix_path}
    if mode == "html":
        html_path = os.path.join(out_dir, f"report-{stamp}.html")
        with open(html_path, "w") as f:
            f.write(render_html(reports, header))
        out["html"] = html_path
    else:
        out["console"] = render_console(reports, header)
    return out
