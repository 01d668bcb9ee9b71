#!/usr/bin/env python3
"""Isolated-run adjudicator for ONE query across two checkouts.

benchdiff settles full-run distributions; it cannot settle a single
query's cross-round move, because a driver-window artifact carries one
median per query and the window itself drifts (the s26 story: flagged
by eyeball three rounds running, each time adjudicated by a bespoke
interleaved experiment). This tool IS that experiment, standing:

  for rep in 1..N:  run query at refA;  run query at refB   (interleaved)

Interleaving makes machine-state drift hit both sides alike, so the
medians compare within one window. Each run is a fresh JVM via
`sbt -batch "runMain graft.RunOne <query> <sf> warm"` in a detached
git worktree of the ref ("." = the current working tree, uncommitted
changes included); RunOne's `warm` absorbs JVM/codegen warm-up, and
persisted stages in /tmp are fingerprint-keyed so both sides share
warm fixtures.

Usage:
  python3 tools/benchone.py <query> <refA> <refB>
         [--reps 5] [--sf /root/testdata/sf0.1] [--cpus 32] [--json out]
  python3 tools/benchone.py --self-test

Verdict rule (constants stated here, not tuned per episode): sides are
DISTINGUISHABLE only if their [min,max] sample ranges are disjoint AND
the median gap exceeds both 5% of the slower median and 50 ms —
otherwise INDISTINGUISHABLE (the honest answer for overlapping
single-query samples). Exit 0 always unless a run fails (exit 2);
the verdict is the output, not the exit code.
"""

import argparse
import hashlib
import json
import re
import subprocess
import sys
from pathlib import Path

GUARD_FRAC = 0.05
GUARD_ABS = 0.05
REPO = Path(__file__).resolve().parent.parent

_TOOK = re.compile(r"\[runone\] \S+ rows=(\d+) took ([0-9.]+) s")


def parse_time(out):
    """(rows, seconds) from a RunOne stdout, or None if absent."""
    m = _TOOK.search(out)
    return (int(m.group(1)), float(m.group(2))) if m else None


def verdict(a_times, b_times):
    """Adjudicate two interleaved sample lists (seconds)."""
    am = sorted(a_times)[len(a_times) // 2]
    bm = sorted(b_times)[len(b_times) // 2]
    disjoint = max(a_times) < min(b_times) or max(b_times) < min(a_times)
    gap = abs(am - bm)
    guard = max(GUARD_FRAC * max(am, bm), GUARD_ABS)
    if disjoint and gap > guard:
        return "A_FASTER" if am < bm else "B_FASTER"
    return "INDISTINGUISHABLE"


def ensure_checkout(ref):
    """Path to run in: the repo itself for '.', else a detached worktree."""
    if ref == ".":
        return REPO
    # include a short hash of the RAW ref so distinct refs that
    # sanitize identically (feat/x vs feat_x) get distinct worktrees
    safe = re.sub(r"[^A-Za-z0-9_.-]", "_", ref)
    digest = hashlib.md5(ref.encode()).hexdigest()[:8]
    wt = Path(f"/tmp/benchone_wt_{safe}_{digest}")
    if wt.exists():
        # reuse the worktree (keeps its compiled target/) but re-pin the ref
        subprocess.run(["git", "-C", str(wt), "checkout", "--detach", ref],
                       check=True, capture_output=True)
    else:
        subprocess.run(["git", "-C", str(REPO), "worktree", "add", "--detach",
                        str(wt), ref], check=True, capture_output=True)
    return wt


def run_once(cwd, query, sf, cpus):
    env = dict(__import__("os").environ, SPARK_GRAFT_CPUS=str(cpus))
    p = subprocess.run(
        ["sbt", "-batch", f"runMain graft.RunOne {query} {sf} warm"],
        cwd=str(cwd), env=env, capture_output=True, text=True)
    got = parse_time(p.stdout)
    if p.returncode != 0 or got is None:
        print(p.stdout[-2000:], file=sys.stderr)
        print(p.stderr[-2000:], file=sys.stderr)
        print(f"error: run failed in {cwd} (rc={p.returncode})", file=sys.stderr)
        sys.exit(2)
    return got


def self_test():
    ok = True
    def check(name, cond):
        nonlocal ok
        print(("PASS " if cond else "FAIL ") + name)
        ok = ok and cond
    got = parse_time("[info] [runone] s26_stream_stack_serving rows=100 took 12.55 s\n")
    check("parses RunOne output", got == (100, 12.55))
    check("missing marker -> None", parse_time("[success] done") is None)
    check("disjoint + big gap flags", verdict([10.0, 10.2, 10.1], [12.0, 12.5, 12.2]) == "A_FASTER")
    check("disjoint + big gap, other side", verdict([12.0, 12.5], [10.0, 10.2]) == "B_FASTER")
    check("overlapping ranges never flag",
          verdict([10.0, 12.0, 11.0], [11.5, 13.0, 12.0]) == "INDISTINGUISHABLE")
    check("disjoint but within 5% guard never flags",
          verdict([10.00, 10.01], [10.10, 10.12]) == "INDISTINGUISHABLE")
    check("sub-50ms gap never flags",
          verdict([0.300, 0.301], [0.340, 0.342]) == "INDISTINGUISHABLE")
    return 0 if ok else 1


def main():
    if "--self-test" in sys.argv:
        sys.exit(self_test())
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("refA")
    ap.add_argument("refB")
    # 5 reps/side: 3 can only ever say INDISTINGUISHABLE under the
    # conservative disjoint-ranges rule; 5 lets it actually call a move
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    wa, wb = ensure_checkout(args.refA), ensure_checkout(args.refB)
    # one untimed run per side: compiles the checkout, builds/warms the
    # fingerprint-keyed /tmp stages, absorbs first-touch FS cache costs
    print(f"warming A={args.refA} ({wa}) ...")
    run_once(wa, args.query, args.sf, args.cpus)
    print(f"warming B={args.refB} ({wb}) ...")
    run_once(wb, args.query, args.sf, args.cpus)
    a_times, b_times = [], []
    for i in range(args.reps):
        ra = run_once(wa, args.query, args.sf, args.cpus)
        rb = run_once(wb, args.query, args.sf, args.cpus)
        a_times.append(ra[1])
        b_times.append(rb[1])
        print(f"rep {i + 1}/{args.reps}: A {ra[1]:.2f}s (rows={ra[0]})  "
              f"B {rb[1]:.2f}s (rows={rb[0]})")
        if ra[0] != rb[0]:
            print(f"note: row counts differ (A={ra[0]}, B={rb[0]}) — "
                  "the refs compute different results; timing comparison "
                  "is apples-to-oranges")
    v = verdict(a_times, b_times)
    am = sorted(a_times)[len(a_times) // 2]
    bm = sorted(b_times)[len(b_times) // 2]
    print(f"A={args.refA}: median {am:.2f}s, samples {sorted(a_times)}")
    print(f"B={args.refB}: median {bm:.2f}s, samples {sorted(b_times)}")
    print(f"verdict: {v}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"query": args.query, "refA": args.refA,
                       "refB": args.refB, "a_samples": a_times,
                       "b_samples": b_times, "a_median": am, "b_median": bm,
                       "verdict": v}, f, indent=1)
    sys.exit(0)


if __name__ == "__main__":
    main()
