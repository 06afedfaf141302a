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
import re
import sys


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

    header = open("PLANS.md").read().split("### ")[0].rstrip()
    parts = [header, ""]
    for name in order:
        flags, lines = plans[name]
        body = "\n".join(lines).rstrip()
        parts.append(f"### {name}\n\n`{flags}`\n\n```\n{body}\n```\n")
    n = re.search(r"across (\d+) audited plans", whitelist_line).group(1)
    parts.append("Full-registry sweep: global-window whitelist OK (only q33 "
                 f"across {n}\naudited plans).")
    open("PLANS.md", "w").write("\n".join(parts) + "\n")
    print(f"PLANS.md: {len(order)} sections, {n} audited plans")


if __name__ == "__main__":
    main(sys.argv[1])
