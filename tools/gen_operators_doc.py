#!/usr/bin/env python3
"""Generate docs/OPERATORS.md — the consolidated operator-API index —
from SURVEY.md §2 (the grading contract) plus the live query registry
(oracle_sql.json from the latest Verify run, when present, to
cross-check that every gate named in SURVEY actually exists).

Usage: python3 tools/gen_operators_doc.py [verify_out_dir]
"""
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse_survey_rows(text):
    """Yield (section, row_id, operator_cell, queries_cell, check_cell)."""
    sec = None
    in_s2 = False
    for line in text.splitlines():
        if line.startswith("## §2"):
            in_s2 = True
            continue
        if line.startswith("## §3"):
            break
        if not in_s2:
            continue
        m = re.match(r"### (§2\.\d+ .*)", line)
        if m:
            sec = m.group(1)
            continue
        if not line.startswith("| ") or line.startswith("| #") or \
                line.startswith("|--"):
            continue
        cells = [c.strip() for c in line.strip().strip("|").split(" | ")]
        if len(cells) < 4 or not re.match(r"\d+[a-z]?$", cells[0]):
            continue
        if len(cells) == 6:   # §2.1 has Reference + Repo columns
            rid, op, _ref, repo, qk, check = cells
            yield sec, rid, op, repo, qk, check
        elif len(cells) == 4:
            rid, op, qk, check = cells
            yield sec, rid, op, None, qk, check
        elif len(cells) == 5:
            rid, op, repo, qk, check = cells
            yield sec, rid, op, repo, qk, check


def first_clause(op):
    """Operator title: text before the first parenthetical."""
    i = op.find("(")
    return (op[:i] if i > 0 else op).strip().rstrip(":").strip()


def entry_points(op, repo):
    """Backticked code tokens that look like entry points."""
    hay = (repo or "") + " " + op
    toks = re.findall(r"`([^`]+)`", hay)
    keep = []
    for t in toks:
        if t.startswith("q") and re.match(r"q\d+_", t):
            continue
        if re.search(r"[./]", t) or re.match(r"[A-Z]\w+\.\w+", t):
            keep.append(t)
    seen, out = set(), []
    for t in keep:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out[:3]


def gates(qk):
    return re.findall(r"`(q\d+[a-z_0-9]*)`", qk)


def check_kind(check):
    has_oracle = "oracle" in check.lower()
    has_test = "scalatest" in check.lower()
    if has_oracle and has_test:
        return "oracle + ScalaTest"
    if has_oracle:
        return "oracle"
    if has_test:
        return "ScalaTest"
    return check[:40]


def main():
    survey = open(os.path.join(ROOT, "SURVEY.md"), encoding="utf-8").read()
    rows = list(parse_survey_rows(survey))
    assert rows, "no §2 rows parsed"

    registry = {}
    vdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    osql = os.path.join(vdir, "oracle_sql.json")
    if os.path.exists(osql):
        registry = json.load(open(osql, encoding="utf-8"))

    out = []
    out.append("# Operator index")
    out.append("")
    out.append("One row per SURVEY §2 operator: what it is, where the "
               "implementation lives, which `SparkEntry.queries` gate "
               "proves it, and how it is checked. GENERATED — do not "
               "edit by hand; regenerate with "
               "`python3 tools/gen_operators_doc.py` after changing "
               "SURVEY §2. Scale laws and measured 10x/100x sweeps "
               "live in SURVEY §4/§6; per-operator design notes in the "
               "Scaladoc of each entry point.")
    out.append("")
    cur = None
    missing = []
    for sec, rid, op, repo, qk, check in rows:
        if sec != cur:
            cur = sec
            out.append(f"## {sec}")
            out.append("")
            out.append("| # | Operator | Entry point | Gate | Check |")
            out.append("|---|---|---|---|---|")
        title = first_clause(op)
        eps = entry_points(op, repo)
        gs = gates(qk)
        for g in gs:
            if registry and g not in registry:
                missing.append((rid, g))
        ep = ", ".join(f"`{e}`" for e in eps) if eps else "—"
        gate = ", ".join(f"`{g}`" for g in gs) if gs else "— (ScalaTest)"
        out.append(f"| {rid} | {title} | {ep} | {gate} | "
                   f"{check_kind(check)} |")
    out.append("")
    n_gated = sum(1 for _, _, _, _, qk, _ in rows if gates(qk))
    out.append(f"Rows: {len(rows)} total, {n_gated} with a DuckDB-checked "
               f"`queries` gate, {len(rows) - n_gated} ScalaTest-only "
               "(path/config/CLI semantics or streaming internals gated "
               "by a parity query elsewhere).")
    if registry:
        survey_gates = {g for _, _, _, _, qk, _ in rows for g in gates(qk)}
        extra = sorted(set(registry) - survey_gates)
        out.append("")
        out.append(f"Registry cross-check: {len(registry)} queries in "
                   f"the live registry; {len(survey_gates)} distinct "
                   "gates named in SURVEY §2"
                   + (f"; registry-only (helper/variant gates): "
                      f"{', '.join('`%s`' % g for g in extra)}"
                      if extra else "") + ".")
    if missing:
        print("WARNING: gates named in SURVEY but missing from registry:",
              missing, file=sys.stderr)
        sys.exit(1)
    os.makedirs(os.path.join(ROOT, "docs"), exist_ok=True)
    path = os.path.join(ROOT, "docs", "OPERATORS.md")
    open(path, "w", encoding="utf-8").write("\n".join(out) + "\n")
    print(f"wrote {path}: {len(rows)} rows")


if __name__ == "__main__":
    main()
