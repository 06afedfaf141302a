#!/usr/bin/env python3
"""Regenerate PLANS.md from PlanAudit + LayoutCheck logs.

Usage:
    SPARK_GRAFT_SF_DIR=target/graft-layout/sf0.01 \
        sbt "runMain graft.PlanAudit --full" > /tmp/planfull.log 2>&1
    sbt "runMain graft.LayoutCheck /root/testdata/sf0.01 target/graft-layout/sf0.01" \
        > /tmp/layoutcheck.log 2>&1
    python3 tools/regen_plans.py /tmp/planfull.log /tmp/layoutcheck.log

Every sentence of PLANS.md now comes from a tool run, not from hand
editing (the r10/r11 hand-edited-header drift class):
  - the HEADER is emitted by PlanAudit itself between
    `=== PLANS.md HEADER ===` sentinels, with the real global-window
    whitelist, audited-plan count, pruning columns and twin list
    interpolated from the run's enforced assertions;
  - the one fact PlanAudit cannot know — LayoutCheck's equivalence
    count and skip list — fills the `{LAYOUT_EQUIVALENCE}` placeholder
    from the LayoutCheck log;
  - the FOOTER is the whitelist assertion line copied verbatim;
  - one `### <query>` section per audited target (streaming
    `st*_twin_*` rows are plan-assert-only and excluded).
"""
import os
import re
import sys
import tempfile


def noise(ln: str) -> bool:
    return bool(re.match(r"^\d{2}/\d{2}/\d{2} ", ln)) or ln.startswith(
        ("[info]", "[success]", "[warn]", "WARNING "))


def main(plan_log: str, layout_log: str) -> None:
    cur = None
    plans = {}
    order = []
    whitelist_line = ""
    header_lines = None
    header = None
    for ln in open(plan_log).read().splitlines():
        if ln.startswith("=== PLANS.md HEADER ==="):
            header_lines = []
            cur = None
            continue
        if ln.startswith("=== END PLANS.md HEADER ==="):
            header = "\n".join(header_lines)
            header_lines = None
            continue
        if header_lines is not None:
            if not noise(ln):
                header_lines.append(ln)
            continue
        if ln.startswith("== ") and " :: " in ln:
            name, flags = ln[3:].split(" :: ", 1)
            if "_twin" in name:
                cur = None
                continue
            cur = name
            order.append(name)
            plans[name] = [flags, []]
        elif ln.startswith("global-window whitelist OK"):
            whitelist_line = ln
            cur = None
        elif ln.strip() == "PLAN AUDIT OK":
            cur = None
        elif cur is not None and not noise(ln):
            plans[cur][1].append(ln)

    if not (whitelist_line and order and header):
        sys.exit(f"{plan_log}: incomplete audit log (need the emitted header "
                 "block, the whitelist line and '== <query> :: <flags>' "
                 "sections) — run sbt \"runMain graft.PlanAudit --full\" to "
                 "completion first")
    if not re.search(r"across (\d+) audited plans", whitelist_line):
        sys.exit(f"{plan_log}: whitelist line wording drifted "
                 f"({whitelist_line!r}) — update PlanAudit's println or this "
                 "check together")

    skips, equiv = [], ""
    for ln in open(layout_log).read().splitlines():
        m = re.match(r"\[layoutcheck\] skip (\S+):", ln)
        if m:
            skips.append(m.group(1))
        m = re.match(r"\[layoutcheck\] (\d+/\d+) queries layout-identical", ln)
        if m:
            equiv = m.group(1)
    if not equiv:
        sys.exit(f"{layout_log}: no '[layoutcheck] N/M queries "
                 "layout-identical' line — run sbt \"runMain graft.LayoutCheck "
                 "<canonical> <layout>\" to completion first")
    layout_sentence = (
        f"{equiv} registry queries bit-identical between the canonical and "
        f"partitioned corpora (skips: {', '.join(sorted(skips))} — each "
        "documented in its registry doc as physically layout-dependent, with "
        "deterministic oracle-exact twins)")
    if "{LAYOUT_EQUIVALENCE}" not in header:
        sys.exit(f"{plan_log}: emitted header lost its {{LAYOUT_EQUIVALENCE}} "
                 "placeholder — update PlanAudit and this script together")
    header = header.replace("{LAYOUT_EQUIVALENCE}", layout_sentence)

    parts = [header, ""]
    for name in order:
        flags, lines = plans[name]
        body = "\n".join(lines).rstrip()
        parts.append(f"### {name}\n\n`{flags}`\n\n```\n{body}\n```\n")
    parts.append(f"Full-registry sweep: {whitelist_line}.")
    # atomic replace: a crash mid-write must not truncate PLANS.md
    fd, tmp = tempfile.mkstemp(dir=".", prefix=".PLANS.md.")
    with os.fdopen(fd, "w") as f:
        f.write("\n".join(parts) + "\n")
    os.replace(tmp, "PLANS.md")
    print(f"PLANS.md: {len(order)} sections; footer: {whitelist_line}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit("usage: regen_plans.py <planfull.log> <layoutcheck.log>")
    main(sys.argv[1], sys.argv[2])
