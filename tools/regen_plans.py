#!/usr/bin/env python3
"""Regenerate PLANS.md from a `sbt "runMain graft.PlanAudit --full"` log.

Usage:
    sbt "runMain graft.PlanAudit --full" > /tmp/planfull.log 2>&1
    python3 tools/regen_plans.py /tmp/planfull.log

Keeps PLANS.md's existing header (everything before the first `### `),
rewrites one section per audited target query (streaming `st*_twin_*`
rows are plan-assert-only and excluded from the document), and refreshes
the audited-plan count in the footer.
"""
import os
import re
import sys
import tempfile


def main(log_path: str) -> None:
    cur = None
    plans = {}
    order = []
    whitelist_line = ""
    for ln in open(log_path).read().splitlines():
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
        elif cur is not None:
            # drop sbt/log4j noise interleaved with the plan text
            if (re.match(r"^\d{2}/\d{2}/\d{2} ", ln) or ln.startswith("[info]")
                    or ln.startswith("[success]") or ln.startswith("WARNING ")):
                continue
            plans[cur][1].append(ln)

    if not whitelist_line or not order:
        sys.exit(f"{log_path}: incomplete audit log (no whitelist line / no "
                 "'== <query> :: <flags>' sections) — run "
                 "sbt \"runMain graft.PlanAudit --full\" to completion first")

    m = re.search(r"across (\d+) audited plans", whitelist_line)
    if m is None:
        sys.exit(f"{log_path}: whitelist line found but its wording drifted "
                 f"(no 'across N audited plans' in: {whitelist_line!r}) — "
                 "update PlanAudit's println or this regex together")
    n = m.group(1)
    header = open("PLANS.md").read().split("### ")[0].rstrip()
    parts = [header, ""]
    for name in order:
        flags, lines = plans[name]
        body = "\n".join(lines).rstrip()
        parts.append(f"### {name}\n\n`{flags}`\n\n```\n{body}\n```\n")
    parts.append("Full-registry sweep: global-window whitelist OK (only q33 "
                 f"across {n}\naudited plans).")
    # atomic replace: a crash mid-write must not truncate PLANS.md
    fd, tmp = tempfile.mkstemp(dir=".", prefix=".PLANS.md.")
    with os.fdopen(fd, "w") as f:
        f.write("\n".join(parts) + "\n")
    os.replace(tmp, "PLANS.md")
    print(f"PLANS.md: {len(order)} sections, {n} audited plans")


if __name__ == "__main__":
    main(sys.argv[1])
