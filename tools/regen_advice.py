#!/usr/bin/env python3
"""Regenerate ADVICE.md with closure status derived from the round's commits.

The r13 verdict flagged ADVICE.md as the last hand-tracked status doc
(the recurring tracked-doc drift class: r10/r11 README, mechanized for
PLANS.md in r12). This applies the same discipline: the advisor's items
stay verbatim, and a tool-emitted status line is appended to each —
CLOSED with the closing commit(s), or OPEN — so the doc can never claim
an item is open after a commit demonstrably touched it.

Mechanics: the baseline is the driver's round-artifact commit — pass it
explicitly with --baseline (the round-close checklist stamps it; r14
advice: an auto-detected baseline mis-anchors once the tool's own output
commits interleave with round commits), else the newest "round N:"
commit touching ADVICE.md is used. An item is marked CLOSED only when a
post-baseline commit modified the file the item names AND the commit
MESSAGE references the item (one of its entry ids, or the named file's
basename) — a busy file alone must not flip an unaddressed advisory to
CLOSED (r14 advice #1). Post-baseline commits that touch the file
without referencing the item are reported honestly as "file touched",
which is evidence for the judge, not a closure claim. Items whose file
saw no post-baseline commit stay OPEN.

    python3 tools/regen_advice.py [--dry-run] [--baseline <commit>]
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
    ap.add_argument("--baseline", default="",
                    help="the round-artifact commit to anchor closures to "
                         "(round-close checklist stamps this; overrides "
                         "auto-detection)")
    args = ap.parse_args()
    os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

    # Baseline = the DRIVER's round-artifact commit (subject "round N: ..."),
    # not merely the last commit touching ADVICE.md — this tool's own output
    # commits touch the file too and must not move the closure horizon.
    # --baseline pins it explicitly (preferred; auto-detection exists for
    # ad-hoc runs).
    base = ""
    if args.baseline:
        base = git("rev-parse", "--verify", args.baseline + "^{commit}").strip()
    else:
        hist = git("log", "--format=%H %s", "--", "ADVICE.md").splitlines()
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
        touchers = [l for l in git("log", "--format=%h %s", f"{base}..HEAD",
                                   "--", path).splitlines() if l]
        # CLOSED requires the commit message to reference the ITEM, not
        # merely touch its file (r14 advice #1: a busy file silently
        # flipped unaddressed advisories to CLOSED). Anchors: the item's
        # registry entry ids and the named file's basename.
        anchors = set(re.findall(
            r"\b(?:q|a|d|s|t|m|p|g|u|st|tr)\d{2,3}\b", line))
        anchors.add(re.sub(r"\.\w+$", "", os.path.basename(path)).lower())
        closers = [l for l in touchers
                   if any(a in l.lower() for a in anchors)]
        if closers:
            n_closed += 1
            refs = "; ".join(closers)
            out.append(f"  _status: CLOSED this round — item-referencing "
                       f"commit(s): {refs}_")
        elif touchers:
            n_open += 1
            refs = "; ".join(touchers)
            out.append(f"  _status: OPEN (file touched since baseline, but "
                       f"no commit message references the item) — {refs}_")
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
