"""Report sinks: findings -> JSON / SARIF 2.1.0 / HTML.

The distributed path ends at Parquet (``ScanResult`` datasets /
checkpoints); these formatters render the *collected* findings table —
presentation only, deliberately out of the distributed path (reference
reporting/{json,sarif,html}_reporter.py re-expressed over the engine's
findings schema, stages/rollup.py FINDINGS_SCHEMA).

* JSON: ``{schema_version, findings[], stats, config, timing}`` with an
  optional unified-diff ``compare`` block per finding when a unit-code
  lookup is supplied (reference json_reporter.py:12-88).
* SARIF: one rule ``near-duplicate-code``, one result per finding with
  two locations (reference sarif_reporter.py:9-59).
* HTML: self-contained, client-side sortable table with an optional
  per-finding side-by-side opcode diff viewer (reference
  html_reporter.py:12-360 incl. 205-360).
"""

from __future__ import annotations

import difflib
import html as html_mod
import json
from typing import Any

SCHEMA_VERSION = 2

_DIFF_MAX_LINES = 80
_DIFF_MAX_CHARS = 4000


def _sorted_records(findings: Any) -> list[dict]:
    """Accept a ray Dataset / pyarrow Table / pandas DataFrame / list
    of dicts; return deterministic, score-descending records."""
    if hasattr(findings, "to_pandas"):  # Dataset or pa.Table
        df = findings.to_pandas()
        recs = df.to_dict("records")
    elif hasattr(findings, "to_dict"):  # DataFrame
        recs = findings.to_dict("records")
    else:
        recs = list(findings)
    for r in recs:
        if hasattr(r.get("reasons"), "tolist"):
            r["reasons"] = r["reasons"].tolist()
    return sorted(
        recs, key=lambda r: (-r.get("score", 0.0), r.get("pair_key", ""))
    )


def _compare_block(rec: dict, unit_code: dict[str, str]) -> dict | None:
    code_a = unit_code.get(rec["unit_a"])
    code_b = unit_code.get(rec["unit_b"])
    if code_a is None or code_b is None:
        return None
    diff_lines = list(
        difflib.unified_diff(
            code_a.splitlines(),
            code_b.splitlines(),
            fromfile=rec["unit_a"],
            tofile=rec["unit_b"],
            lineterm="",
        )
    )[:_DIFF_MAX_LINES]
    text = "\n".join(diff_lines)
    if len(text) > _DIFF_MAX_CHARS:
        text = text[:_DIFF_MAX_CHARS] + "\n... (truncated)"
    return {"unified_diff": text}


def write_json_report(
    findings: Any,
    out_path: str,
    stats: dict | None = None,
    config: dict | None = None,
    timing: dict | None = None,
    unit_code: dict[str, str] | None = None,
) -> None:
    recs = _sorted_records(findings)
    payload_findings = []
    for r in recs:
        item = {
            "function_a": {
                "identity": r["unit_a"],
                "path": r["path_a"],
                "qualified_name": r["qual_a"],
            },
            "function_b": {
                "identity": r["unit_b"],
                "path": r["path_b"],
                "qualified_name": r["qual_b"],
            },
            "score": round(float(r["score"]), 6),
            "duplicated_lines": int(r["duplicated_lines"]),
            "reasons": list(r["reasons"]),
            "n_evidence": int(r["n_evidence"]),
            "best_evidence": r.get("best_evidence", ""),
        }
        if "cluster_id" in r and r.get("cluster_id") is not None:
            item["cluster_id"] = int(r["cluster_id"])
        if unit_code:
            cmp_block = _compare_block(r, unit_code)
            if cmp_block:
                item["compare"] = cmp_block
        payload_findings.append(item)
    payload = {
        "schema_version": SCHEMA_VERSION,
        "findings": payload_findings,
        "stats": stats or {},
        "config": config or {},
        "timing": timing or {},
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=2)


def write_sarif_report(findings: Any, out_path: str) -> None:
    recs = _sorted_records(findings)
    results = []
    for r in recs:
        results.append(
            {
                "ruleId": "near-duplicate-code",
                "level": "warning",
                "message": {
                    "text": (
                        f"Near-duplicate code: {r['qual_a']} ~ {r['qual_b']} "
                        f"(score {float(r['score']):.3f}, "
                        f"{int(r['duplicated_lines'])} duplicated lines)"
                    )
                },
                "locations": [
                    _sarif_location(r["path_a"], r["unit_a"]),
                    _sarif_location(r["path_b"], r["unit_b"]),
                ],
            }
        )
    sarif = {
        "$schema": "https://raw.githubusercontent.com/oasis-tcs/sarif-spec/master/Schemata/sarif-schema-2.1.0.json",
        "version": "2.1.0",
        "runs": [
            {
                "tool": {
                    "driver": {
                        "name": "clonehunter_ray",
                        "rules": [
                            {
                                "id": "near-duplicate-code",
                                "shortDescription": {
                                    "text": "Near-duplicate code detected"
                                },
                            }
                        ],
                    }
                },
                "results": results,
            }
        ],
    }
    with open(out_path, "w") as fh:
        json.dump(sarif, fh, indent=2)


def _sarif_location(path: str, unit_id: str) -> dict:
    # unit_id layout: path:qualname:start:end (engine unit identity)
    parts = unit_id.rsplit(":", 2)
    try:
        start, end = int(parts[-2]), int(parts[-1])
    except (ValueError, IndexError):
        start, end = 1, 1
    return {
        "physicalLocation": {
            "artifactLocation": {"uri": path},
            "region": {"startLine": start, "endLine": end},
        }
    }


# unchanged runs longer than this fold into a "<N lines not shown>"
# meta row, keeping _SBS_CONTEXT lines of context on each edge
# (reference html_reporter.py:300-312 renders the same marker text for
# its hidden-line rows; per-line numbers as reference :259-276)
_SBS_FOLD_OVER = 8
_SBS_CONTEXT = 3
# changed (rep/del/ins) runs fold later than equal runs — the changed
# lines are the content users came to inspect — but they must still be
# bounded: a mostly-different pair of 10k-line units would otherwise
# render every row
_SBS_NONEQ_FOLD_OVER = 120


def _unit_start_line(unit_id: str) -> int:
    # unit_id layout: path:qualname:start:end (engine unit identity)
    try:
        return int(str(unit_id).rsplit(":", 2)[-2])
    except (ValueError, IndexError):
        return 1


Row = tuple[str, object, str, object, str]  # (cls, a_no, left, b_no, right)


def _side_by_side_rows(
    code_a: str, code_b: str, start_a: int = 1, start_b: int = 1
) -> list[Row]:
    """Opcode-aligned (css_class, a_lineno, left, b_lineno, right) rows
    for the HTML diff viewer (reference html_reporter.py:196-276 renders
    the same side-by-side opcode table with line numbers). Long equal
    runs fold into a ('fold', '', '<N lines not shown>', ...) row."""
    a_lines = code_a.splitlines()
    b_lines = code_b.splitlines()
    sm = difflib.SequenceMatcher(a=a_lines, b=b_lines, autojunk=False)
    rows: list[Row] = []

    def eq_row(i: int, j: int) -> Row:
        return ("eq", start_a + i, a_lines[i], start_b + j, b_lines[j])

    for tag, i1, i2, j1, j2 in sm.get_opcodes():
        if tag == "equal":
            n = i2 - i1
            if n > _SBS_FOLD_OVER:
                head = 0 if i1 == 0 else _SBS_CONTEXT  # no context at edges
                tail = 0 if i2 == len(a_lines) else _SBS_CONTEXT
                hidden = n - head - tail
                for k in range(head):
                    rows.append(eq_row(i1 + k, j1 + k))
                marker = f"<{hidden} lines not shown>"
                rows.append(("fold", "", marker, "", marker))
                for k in range(n - tail, n):
                    rows.append(eq_row(i1 + k, j1 + k))
            else:
                for k in range(n):
                    rows.append(eq_row(i1 + k, j1 + k))
        elif tag == "replace":
            block: list[Row] = []
            span = max(i2 - i1, j2 - j1)
            for k in range(span):
                in_a, in_b = i1 + k < i2, j1 + k < j2
                block.append(
                    (
                        "rep",
                        start_a + i1 + k if in_a else "",
                        a_lines[i1 + k] if in_a else "",
                        start_b + j1 + k if in_b else "",
                        b_lines[j1 + k] if in_b else "",
                    )
                )
            rows.extend(_fold_noneq(block))
        elif tag == "delete":
            rows.extend(
                _fold_noneq(
                    [("del", start_a + k, a_lines[k], "", "") for k in range(i1, i2)]
                )
            )
        elif tag == "insert":
            rows.extend(
                _fold_noneq(
                    [("ins", "", "", start_b + k, b_lines[k]) for k in range(j1, j2)]
                )
            )
    return rows


def _fold_noneq(block: list[Row]) -> list[Row]:
    """Fold the MIDDLE of long replace/delete/insert runs: equal runs
    were already folded, but a mostly-different pair of large units
    (capped-bucket or substring-rescue matches) would otherwise emit an
    unbounded number of changed rows — megabytes of HTML per finding."""
    if len(block) <= _SBS_NONEQ_FOLD_OVER:
        return block
    hidden = len(block) - 2 * _SBS_CONTEXT
    marker = f"<{hidden} changed lines not shown>"
    return (
        block[:_SBS_CONTEXT]
        + [("fold", "", marker, "", marker)]
        + block[-_SBS_CONTEXT:]
    )


def _diff_cell_html(rec: dict, unit_code: dict[str, str]) -> str | None:
    code_a = unit_code.get(rec["unit_a"])
    code_b = unit_code.get(rec["unit_b"])
    if code_a is None or code_b is None:
        return None
    body = []
    rows = _side_by_side_rows(
        code_a,
        code_b,
        _unit_start_line(rec["unit_a"]),
        _unit_start_line(rec["unit_b"]),
    )
    for cls, a_no, left, b_no, right in rows:
        body.append(
            f"<tr class='{cls}'>"
            f"<td class='ln'>{a_no}</td>"
            f"<td><pre>{html_mod.escape(left)}</pre></td>"
            f"<td class='ln'>{b_no}</td>"
            f"<td><pre>{html_mod.escape(right)}</pre></td></tr>"
        )
    return (
        "<table class='sbs'><thead><tr>"
        f"<th class='ln'></th><th>{html_mod.escape(str(rec['qual_a']))}</th>"
        f"<th class='ln'></th><th>{html_mod.escape(str(rec['qual_b']))}</th>"
        f"</tr></thead><tbody>{''.join(body)}</tbody></table>"
    )


def write_html_report(
    findings: Any,
    out_path: str,
    title: str = "CloneHunter-Ray report",
    unit_code: dict[str, str] | None = None,
) -> None:
    recs = _sorted_records(findings)
    rows = []
    for r in recs:
        diff_html = _diff_cell_html(r, unit_code) if unit_code else None
        marker = " class='f has-diff' title='click to toggle diff'" if diff_html \
            else " class='f'"
        rows.append(
            f"<tr{marker}>"
            f"<td>{html_mod.escape(str(r['path_a']))}</td>"
            f"<td>{html_mod.escape(str(r['qual_a']))}</td>"
            f"<td>{html_mod.escape(str(r['path_b']))}</td>"
            f"<td>{html_mod.escape(str(r['qual_b']))}</td>"
            f"<td data-v='{float(r['score']):.6f}'>{float(r['score']):.3f}</td>"
            f"<td data-v='{int(r['duplicated_lines'])}'>{int(r['duplicated_lines'])}</td>"
            f"<td>{html_mod.escape(', '.join(r['reasons']))}</td>"
            f"<td>{html_mod.escape(str(r.get('cluster_id', '')))}</td>"
            "</tr>"
        )
        if diff_html:
            rows.append(
                f"<tr class='diff' style='display:none'>"
                f"<td colspan='8'>{diff_html}</td></tr>"
            )
    doc = f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{html_mod.escape(title)}</title>
<style>
body {{ font-family: sans-serif; margin: 2em; }}
table {{ border-collapse: collapse; width: 100%; }}
th, td {{ border: 1px solid #ccc; padding: 4px 8px; font-size: 13px; }}
th {{ cursor: pointer; background: #f0f0f0; position: sticky; top: 0; }}
tr.f:nth-child(even) {{ background: #fafafa; }}
tr.has-diff {{ cursor: pointer; }}
table.sbs td {{ vertical-align: top; }}
table.sbs td.ln, table.sbs th.ln {{ width: 3.5em; color: #999;
  text-align: right; user-select: none; }}
table.sbs pre {{ margin: 0; white-space: pre-wrap; font-size: 12px; }}
table.sbs tr.rep td {{ background: #fff7d6; }}
table.sbs tr.del td:nth-child(2) {{ background: #ffe3e3; }}
table.sbs tr.ins td:nth-child(4) {{ background: #e2f5e2; }}
table.sbs tr.fold td {{ background: #f4f4f4; color: #888;
  font-style: italic; text-align: center; }}
</style></head>
<body>
<h1>{html_mod.escape(title)}</h1>
<p>{len(recs)} findings. Click a column header to sort{
    '; click a row to toggle its side-by-side diff' if unit_code else ''}.</p>
<table id="t"><thead><tr>
<th>path A</th><th>function A</th><th>path B</th><th>function B</th>
<th>score</th><th>dup lines</th><th>reasons</th><th>cluster</th>
</tr></thead><tbody>
{''.join(rows)}
</tbody></table>
<script>
// sort moves each finding row together with its (optional) diff row
document.querySelectorAll('#t th').forEach((th, i) => th.onclick = () => {{
  const tb = document.querySelector('#t tbody');
  const groups = [];
  Array.from(tb.rows).forEach(r => {{
    if (r.classList.contains('diff')) groups[groups.length - 1].push(r);
    else groups.push([r]);
  }});
  const val = g => g[0].cells[i].dataset.v !== undefined
    ? parseFloat(g[0].cells[i].dataset.v) : g[0].cells[i].textContent;
  const dir = th.dataset.dir === 'a' ? -1 : 1;
  th.dataset.dir = th.dataset.dir === 'a' ? 'd' : 'a';
  groups.sort((a, b) => (val(a) > val(b) ? 1 : val(a) < val(b) ? -1 : 0) * dir);
  groups.forEach(g => g.forEach(r => tb.appendChild(r)));
}});
document.querySelectorAll('#t tr.has-diff').forEach(r => r.onclick = () => {{
  const d = r.nextElementSibling;
  if (d && d.classList.contains('diff'))
    d.style.display = d.style.display === 'none' ? '' : 'none';
}});
</script></body></html>"""
    with open(out_path, "w") as fh:
        fh.write(doc)


def write_report(findings: Any, out_path: str, fmt: str, **kwargs) -> None:
    if fmt == "json":
        write_json_report(findings, out_path, **kwargs)
    elif fmt == "sarif":
        write_sarif_report(findings, out_path)
    elif fmt == "html":
        write_html_report(findings, out_path, **kwargs)
    elif fmt == "parquet":
        if hasattr(findings, "write_parquet"):
            findings.write_parquet(out_path)
        else:
            import pandas as pd
            import pyarrow as pa
            import pyarrow.parquet as pq

            if isinstance(findings, pa.Table):
                table = findings
            elif isinstance(findings, pd.DataFrame):
                table = pa.Table.from_pandas(findings, preserve_index=False)
            elif hasattr(findings, "to_pandas"):  # pa.RecordBatch etc.
                table = pa.Table.from_pandas(
                    findings.to_pandas(), preserve_index=False
                )
            else:
                table = pa.Table.from_pylist(list(findings))
            pq.write_table(table, out_path)
    else:
        raise ValueError(f"unknown report format: {fmt}")
