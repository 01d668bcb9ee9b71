#!/usr/bin/env python3
"""Mechanical bench adjudication — applies PERF.md's spread rule to two
full Bench artifacts.

The rule (PERF.md "What the spread field shows"): a per-query median
outside its OWN run's [min,max] rep spread is meaningless across runs,
because between-run machine-state drift is family-uniform and larger
than rep noise. The regression signal is an ISOLATED out-of-spread move
on a query whose code changed, against a background of BALANCED drift
(moves in both directions). This tool computes exactly that, so round
closes cite its output instead of narrative.

Usage:
  python3 tools/benchdiff.py A.json B.json [--changed q1,q2,...]
                             [--json out.json] [--top N]

A is the reference run (usually the prior close), B the new run. Both
must be full Bench artifacts: {"value": total_sec, "spread": {q:
[min,median,max]}, "queries": {q: median_sec}, ...}. --changed lists
queries whose implementing code changed between the two runs (comma
separated, or @file with one key per line); only those are eligible to
be flagged as regressions. Exit code: 0 = no flagged regression,
1 = at least one flagged regression, 2 = usage/artifact error.

Definitions (all constants stated here, not tuned per episode):
  out-of-spread(q): B.median(q) < A.min(q) or > A.max(q), with a 5%
      guard band (|delta| must also exceed 5% of A.median and 50 ms)
      so micro-queries and boundary grazes don't count as moves.
  balanced drift:   both directions occur and the smaller directional
      count is >= 1/3 of the larger. Family-uniform machine drift
      produces balanced moves; a real regression is one-sided.
  flagged regression: q in --changed, out-of-spread in the slow
      direction, while background drift (the NON-changed queries) is
      balanced. If background drift is itself one-sided the episode is
      reported as WINDOW-CONFOUNDED: totals moved as a block and no
      per-query flag is trustworthy — rerun, don't ship a conclusion.
"""

import argparse
import json
import math
import re
import sys

GUARD_FRAC = 0.05   # move must exceed 5% of the reference median...
GUARD_ABS = 0.05    # ...and 50 ms, to count as out-of-spread
BALANCE_RATIO = 1.0 / 3.0  # smaller direction >= 1/3 of larger => balanced

# "key":number pairs inside the queries map. The driver's truncated
# tail starts mid-pair (e.g. `rames":0.825,`); requiring the opening
# quote makes the regex skip that partial fragment automatically.
_PAIR = re.compile(r'"([A-Za-z_][A-Za-z0-9_]*)"\s*:\s*([0-9]+(?:\.[0-9]+)?)')


def parse_tail(tail):
    """Recover the per-query median map from a driver-truncated artifact.

    The driver's BENCH_r*.json history ships only the LAST ~2KB of the
    bench stdout (`tail`) with `parsed: null`. The tail cuts the front
    of the JSON line, so the `value` total and the early query keys are
    gone, but every fully-visible `"key":median` pair inside the
    queries map is intact up to `},"failures"`. Parse those; totals are
    reported as None and spreads as degenerate (median==min==max), so
    the 5%/50ms guard band is the only out-of-spread test — exactly the
    sensitivity the full-artifact path falls back to when a spread is
    missing.
    """
    # Only the region before the queries map's closing brace is query
    # pairs; after it come trailer keys like "reps":3 that would
    # otherwise parse as queries.
    cut = tail.find('},"failures"')
    region = tail[:cut] if cut >= 0 else tail
    qmark = region.find('"queries":{')
    if qmark >= 0:
        region = region[qmark + len('"queries":{'):]
    queries = {k: float(v) for k, v in _PAIR.findall(region)}
    # Guard against trailer keys when `},"failures"` itself was cut off.
    # "sf" and "elapsed" are numeric trailer keys too — a tail truncated
    # before `},"failures"` that still shows `"sf":0.1` would otherwise
    # count sf as a query median and skew the shared-query comparison.
    for meta in ("value", "reps", "cpus", "n", "rc", "sf", "elapsed"):
        queries.pop(meta, None)
    return {"value": None, "spread": {}, "queries": queries,
            "partial_tail": True}


def load(path):
    try:
        with open(path) as f:
            d = json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        print(f"error: cannot read {path}: {e}", file=sys.stderr)
        sys.exit(2)
    # Driver-truncated round artifact: no parsed body, raw stdout tail.
    if (not isinstance(d.get("queries"), dict)) and isinstance(d.get("tail"), str):
        parsed = d.get("parsed")
        if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
            return parsed
        t = parse_tail(d["tail"])
        if t["queries"]:
            return t
    if "queries" not in d or not isinstance(d["queries"], dict):
        print(f"error: {path} is not a full Bench artifact (no queries map)",
              file=sys.stderr)
        sys.exit(2)
    return d


def spread_of(art, q):
    s = art.get("spread") or {}
    v = s.get(q)
    if isinstance(v, list) and len(v) == 3:
        return float(v[0]), float(v[2])
    m = float(art["queries"][q])
    return m, m  # no rep spread recorded: degenerate interval


def classify(a, b, changed):
    aq, bq = a["queries"], b["queries"]
    shared = sorted(set(aq) & set(bq))
    # A truncated side cannot witness absence: a key missing from a
    # partial tail may simply be cut off, so only the full side's
    # exclusive keys are reported as genuinely new/removed.
    only_b = [] if a.get("partial_tail") else sorted(set(bq) - set(aq))
    only_a = [] if b.get("partial_tail") else sorted(set(aq) - set(bq))
    moves = []  # (q, a_med, b_med, direction) for out-of-spread shared queries
    ratios = []
    for q in shared:
        am, bm = float(aq[q]), float(bq[q])
        if am > 0:
            ratios.append(bm / am)
        lo, hi = spread_of(a, q)
        guard = max(GUARD_FRAC * am, GUARD_ABS)
        if bm > hi and bm - am > guard:
            moves.append((q, am, bm, "up"))
        elif bm < lo and am - bm > guard:
            moves.append((q, am, bm, "down"))
    up = [m for m in moves if m[3] == "up"]
    down = [m for m in moves if m[3] == "down"]
    bg_up = [m for m in up if m[0] not in changed]
    bg_down = [m for m in down if m[0] not in changed]
    n_bg = len(bg_up) + len(bg_down)
    if n_bg <= 2:
        # little-to-no background drift: nothing suggests a window
        # block-move, so a changed-query excursion stands on its own
        balanced = True
    else:
        lo_ct, hi_ct = sorted((len(bg_up), len(bg_down)))
        balanced = lo_ct >= BALANCE_RATIO * hi_ct and lo_ct > 0
    flagged = [m for m in up if m[0] in changed] if balanced else []
    confounded = [m for m in up if m[0] in changed] if not balanced else []
    med_ratio = sorted(ratios)[len(ratios) // 2] if ratios else float("nan")
    return {
        "a_partial": bool(a.get("partial_tail")),
        "b_partial": bool(b.get("partial_tail")),
        "total_a": a.get("value"),
        "total_b": b.get("value"),
        "total_ratio": (b.get("value") / a.get("value"))
        if a.get("value") and b.get("value") else None,
        "shared": len(shared),
        "median_query_ratio": med_ratio,
        "out_of_spread_up": [m[0] for m in up],
        "out_of_spread_down": [m[0] for m in down],
        "background_up": len(bg_up),
        "background_down": len(bg_down),
        "background_balanced": balanced,
        "flagged_regressions": [
            {"query": q, "a_median": am, "b_median": bm,
             "a_spread": list(spread_of(a, q))}
            for (q, am, bm, _) in flagged],
        "window_confounded": [
            {"query": q, "a_median": am, "b_median": bm}
            for (q, am, bm, _) in confounded],
        "improved_changed": [
            {"query": q, "a_median": am, "b_median": bm}
            for (q, am, bm, d) in moves if d == "down" and q in changed],
        "new_queries": {q: b["queries"][q] for q in only_b},
        "removed_queries": only_a,
        "_moves": moves,
    }


def human(r, changed, top):
    out = []
    for side in ("a", "b"):
        if r[f"{side}_partial"]:
            out.append(f"note: {side.upper()} is a driver-truncated tail — "
                       "only its visible query suffix compares; no totals, "
                       "no rep spreads (guard band is the only move test)")
    tr = r["total_ratio"]
    out.append(f"totals: A {r['total_a']}s -> B {r['total_b']}s"
               + (f" ({tr:.3f}x)" if tr else ""))
    out.append(f"shared queries: {r['shared']}; median per-query ratio "
               f"{r['median_query_ratio']:.3f}")
    nup, ndn = len(r["out_of_spread_up"]), len(r["out_of_spread_down"])
    out.append(f"out-of-spread moves: {nup} up / {ndn} down "
               f"(background {r['background_up']} up / {r['background_down']} down: "
               + ("BALANCED drift — window/machine-state, not regression"
                  if r["background_balanced"] else
                  "ONE-SIDED — totals moved as a block; per-query flags unreliable")
               + ")")
    moves = sorted(r["_moves"], key=lambda m: -abs(m[2] - m[1]))[:top]
    if moves:
        out.append(f"largest moves (top {len(moves)}):")
        for q, am, bm, d in moves:
            tag = " [CHANGED]" if q in changed else ""
            out.append(f"  {q:<34} {am:7.3f} -> {bm:7.3f}  {d}{tag}")
    if r["new_queries"]:
        tot = sum(r["new_queries"].values())
        out.append(f"new in B: {len(r['new_queries'])} queries, {tot:.1f}s total: "
                   + ", ".join(f"{q} {v:.2f}s" for q, v in
                               sorted(r["new_queries"].items())))
    if r["removed_queries"]:
        out.append("removed in B: " + ", ".join(r["removed_queries"]))
    if r["flagged_regressions"]:
        out.append("FLAGGED REGRESSIONS (changed code, out-of-spread slow, "
                   "balanced background):")
        for f in r["flagged_regressions"]:
            out.append(f"  {f['query']}: {f['a_median']} -> {f['b_median']} "
                       f"(A spread {f['a_spread']})")
    elif r["window_confounded"]:
        out.append("window-confounded changed-query slowdowns (NOT flagged — "
                   "background drift one-sided; rerun to adjudicate): "
                   + ", ".join(f["query"] for f in r["window_confounded"]))
    else:
        out.append("verdict: NO flagged regression")
    return "\n".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("--changed", default="",
                    help="comma-separated changed query keys, or @file")
    ap.add_argument("--json", default=None, help="write machine report here")
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()
    if args.changed.startswith("@"):
        with open(args.changed[1:]) as f:
            changed = {l.strip() for l in f if l.strip()}
    else:
        changed = {c.strip() for c in args.changed.split(",") if c.strip()}
    a, b = load(args.a), load(args.b)
    r = classify(a, b, changed)
    print(human(r, changed, args.top))
    if args.json:
        clean = {k: v for k, v in r.items() if not k.startswith("_")}
        with open(args.json, "w") as f:
            json.dump(clean, f, indent=1)
    sys.exit(1 if r["flagged_regressions"] else 0)


if __name__ == "__main__":
    main()
