#!/usr/bin/env python3
"""Commit the per-round artifacts so the judge's snapshot sees a clean tree.

Five consecutive rounds left BENCH_r0N.json / CORRECTNESS_r0N.json /
BENCH_DETAIL.json / LEAKCHECK.json untracked or modified at snapshot time
(r6 verdict, "Next round" #5) — a checklist line demonstrably does not
stick, so this script makes the commit mechanical. Run it as the LAST step
of a round (and any time after refreshing bench/verify artifacts):

    python3 tools/snapshot.py [--round N] [-m "message"]

It stages every round artifact that exists (latest round number is
auto-detected from BENCH_r*/CORRECTNESS_r* when --round is omitted), plus
the always-refreshed measurement files, and commits IFF any of them
changed. Exits 0 with "nothing to commit" when the tree is already clean —
safe to run repeatedly.
"""
import argparse
import glob
import os
import re
import subprocess
import sys

ALWAYS = [
    "BENCH_DETAIL.json", "BENCH_PARTITIONED.json", "LEAKCHECK.json", "COPYCHECK.json", "PLANS.md",
    "ADVICE.md", "VERDICT.md", "README.md", "PROGRESS.jsonl", "SNIPPETS.md",
    "BASELINE.md", "BASELINE.json", "FIXTURES.md",
]


def latest_round() -> int:
    rounds = [int(m.group(1)) for f in glob.glob("BENCH_r*.json") + glob.glob("CORRECTNESS_r*.json")
              if (m := re.search(r"_r(\d+)\.json$", f))]
    return max(rounds, default=0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None,
                    help="round number (default: max seen in BENCH_r*/CORRECTNESS_r*)")
    ap.add_argument("-m", "--message", default=None, help="commit message override")
    args = ap.parse_args()

    os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    n = args.round if args.round is not None else latest_round()
    per_round = [f"BENCH_r{n:02d}.json", f"CORRECTNESS_r{n:02d}.json"] if n else []

    to_add = [f for f in per_round + ALWAYS if os.path.exists(f)]
    subprocess.run(["git", "add", "--"] + to_add, check=True)

    staged = subprocess.run(["git", "diff", "--cached", "--quiet"]).returncode != 0
    if not staged:
        print("snapshot: nothing to commit (round artifacts already clean)")
        return 0

    msg = args.message or f"round {n}: commit round artifacts (bench/correctness/plans/docs)"
    subprocess.run(["git", "commit", "-m", msg], check=True)
    print(f"snapshot: committed round-{n} artifacts: {', '.join(to_add)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
