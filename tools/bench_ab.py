#!/usr/bin/env python3
"""Same-host A/B bench: HEAD (current tree) vs a baseline commit.

Usage: python3 tools/bench_ab.py <baseline-commit> <q1,q2,...> [sfdir]

Builds a disposable git worktree of the baseline commit, runs the Bench
subset in BOTH trees INTERLEAVED (base, head, base, head — each Bench
run is itself min-of-three passes), and prints the PLANS.md-style
attribution table. Interleaving on one host is the point: round 17
proved a raw per-round bench delta on this box is host noise unless
the two commits run minutes apart on the same machine (the IO-heavy
fixtures swing 3x between passes) — this tool makes that A/B one
command instead of a by-hand checkout dance.

A subset run OVERWRITES the repo's BENCH_*_latest.json mirrors; the
tool restores them with `git checkout --` afterward. Keep the host
quiet while it runs (two sbt builds + four bench runs, ~10-20 min for
a 4-query subset at sf0.1).
"""
import json
import os
import subprocess
import sys
import tempfile


def run_bench(tree, queries, sfdir, passes_path, tag):
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sfdir,
        SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        SPARK_GRAFT_BENCH_ONLY=queries,
        SPARK_GRAFT_BENCH_PASSES=passes_path,
    )
    print(f"[bench-ab] {tag}: running Bench in {tree} ...",
          file=sys.stderr, flush=True)
    subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"], cwd=tree, env=env,
        check=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(passes_path) as f:
        return {q: min(ts) for q, ts in json.load(f)["passes"].items()}


def main():
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    base, queries = sys.argv[1], sys.argv[2]
    sfdir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wt = tempfile.mkdtemp(prefix="bench-ab-")
    os.rmdir(wt)
    subprocess.run(["git", "worktree", "add", "--detach", wt, base],
                   cwd=repo, check=True)
    try:
        rounds = []
        for i in range(2):  # interleave so host drift hits both sides
            rounds.append(("base", run_bench(
                wt, queries, sfdir, f"/tmp/ab_base_{i}.json",
                f"base#{i}")))
            rounds.append(("head", run_bench(
                repo, queries, sfdir, f"/tmp/ab_head_{i}.json",
                f"head#{i}")))
        agg = {}
        for lbl, m in rounds:
            for q, t in m.items():
                agg.setdefault(q, {}).setdefault(lbl, []).append(t)
        print(f"\n| query | {base[:9]} min (s) | HEAD min (s) | "
              "HEAD/base |")
        print("|---|---|---|---|")
        for q in sorted(agg):
            b = min(agg[q].get("base", [float("nan")]))
            h = min(agg[q].get("head", [float("nan")]))
            ratio = h / b if b == b and b > 0 else float("nan")
            print(f"| {q} | {b:.2f} | {h:.2f} | {ratio:.2f} |")
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=repo)
        subprocess.run(
            ["git", "checkout", "--", "BENCH_FULL_latest.json",
             "BENCH_OPS_latest.json"], cwd=repo)


if __name__ == "__main__":
    main()
