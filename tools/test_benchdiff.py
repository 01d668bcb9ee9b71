#!/usr/bin/env python3
"""Self-test for tools/benchdiff.py — stdlib only, no framework.

Run: python3 tools/test_benchdiff.py   (exit 0 = all cases pass)

Covers the exit-code contract and the three adjudication verdicts the
round-close workflow depends on: balanced background + changed-query
regression => flagged (exit 1); one-sided background => window-
confounded, nothing flagged (exit 0); malformed artifact => exit 2.
"""

import json
import subprocess
import sys
import tempfile
from pathlib import Path

TOOL = Path(__file__).resolve().parent / "benchdiff.py"


def art(queries, spread=None, total=None):
    return {"value": total if total is not None else sum(queries.values()),
            "spread": spread or {}, "queries": queries}


def run(a, b, changed=""):
    with tempfile.TemporaryDirectory() as d:
        pa, pb = Path(d, "a.json"), Path(d, "b.json")
        pa.write_text(json.dumps(a) if isinstance(a, dict) else a)
        pb.write_text(json.dumps(b) if isinstance(b, dict) else b)
        cmd = [sys.executable, str(TOOL), str(pa), str(pb)]
        if changed:
            cmd += ["--changed", changed]
        r = subprocess.run(cmd, capture_output=True, text=True)
        return r.returncode, r.stdout + r.stderr


fails = 0


def check(name, cond, detail=""):
    global fails
    print(("PASS " if cond else "FAIL ") + name + (f"  [{detail}]" if detail and not cond else ""))
    if not cond:
        fails += 1


# 1. balanced background + changed query out-of-spread slow => FLAGGED, exit 1
a = art({"q1": 1.0, "q2": 2.0, "q3": 3.0, "q4": 4.0},
        spread={k: [v, v, v * 1.02] for k, v in
                {"q1": 1.0, "q2": 2.0, "q3": 3.0, "q4": 4.0}.items()})
b = art({"q1": 0.8, "q2": 2.4, "q3": 3.3, "q4": 5.0})
rc, out = run(a, b, changed="q4")
check("flags changed regression on balanced background", rc == 1 and "q4" in out, out)

# 2. same move, query NOT in changed set => no flag, exit 0
rc, out = run(a, b)
check("unchanged queries never flag", rc == 0 and "NO flagged regression" in out, out)

# 3. one-sided background => window-confounded, exit 0 even for changed query
b1 = art({k: v * 1.3 for k, v in
          {"q1": 1.0, "q2": 2.0, "q3": 3.0, "q4": 4.0}.items()})
rc, out = run(a, b1, changed="q4")
check("one-sided block move is window-confounded, not flagged",
      rc == 0 and "confounded" in out, out)

# 4. grazing moves inside the 5%/50ms guard band do not count
b2 = art({"q1": 1.03, "q2": 2.0, "q3": 3.0, "q4": 4.1})
rc, out = run(a, b2, changed="q4")
check("guard band suppresses grazes", rc == 0 and "0 up / 0 down" in out, out)

# 5. malformed artifact => exit 2 (NOT 1, which means 'regression')
rc, out = run("{not json", b)
check("malformed artifact exits 2", rc == 2, f"rc={rc}")
rc, out = run({"no_queries": True}, b)
check("non-bench artifact exits 2", rc == 2, f"rc={rc}")

# 6. new/removed queries are reported, never flagged
b3 = art({"q1": 1.0, "q2": 2.0, "q3": 3.0, "q4": 4.0, "q9": 9.0})
rc, out = run(a, b3, changed="q9")
check("new queries reported not flagged", rc == 0 and "q9" in out, out)

# 7. driver-truncated tail artifacts: exact shape of the committed
# BENCH_r*.json history — {"parsed": null, "tail": "<last 2KB of
# stdout>"} where the tail starts MID-PAIR and ends past "failures"
# with sbt trailer noise. The loader must drop the partial leading
# fragment, stop at the queries map's close (so "reps":3 is not a
# query), and compare the visible suffix against a full artifact.
tail_b = ('ed":0.825,"q2":2.4,"q3":3.3,"q4":5.0},"failures":{},'
          '"sf":"/root/testdata/sf0.1","reps":3}\n'
          '[success] Total time: 674 s (11:14), completed Aug 15, 2026')
trunc = {"n": 11, "rc": 0, "cpus": 32, "sf": 0.1, "parsed": None,
         "tail": tail_b}
rc, out = run(a, trunc, changed="q4")
check("tail artifact: changed regression flagged on visible suffix",
      rc == 1 and "q4" in out and "driver-truncated tail" in out, out)
# a has q1..q4; the tail's visible suffix is q2..q4 plus the partial
# fragment `ed":0.825` and trailer `"reps":3`. shared==3 proves the
# fragment and trailer were not parsed as queries, and "new in B"
# absent proves they were not reported as additions either.
check("tail artifact: partial fragment + trailer keys excluded",
      "shared queries: 3" in out and "new in B" not in out, out)
rc, out = run(trunc, a, changed="")
check("tail as reference: q1 not reported removed (absence unwitnessed)",
      rc == 0 and "removed in B" not in out, out)

# 7b. tail truncated BEFORE `},"failures"` with a numeric "sf" trailer:
# without the sf/elapsed pops, `"sf":0.1` would count as a query median
# (shared==4 instead of 3) and skew the comparison.
tail_presplit = ('ed":0.825,"q2":2.4,"q3":3.3,"q4":5.0,"sf":0.1,"elapsed":9.9')
rc, out = run(a, {"n": 11, "rc": 0, "parsed": None, "tail": tail_presplit},
              changed="q4")
check("tail cut before failures: numeric sf/elapsed trailers excluded",
      rc == 1 and "shared queries: 3" in out and "new in B" not in out, out)

# 8. tail-vs-tail: both sides truncated (historical adjudication of two
# committed driver artifacts).
tail_a = ('ed":0.825,"q2":2.0,"q3":3.0,"q4":4.0},"failures":{},'
          '"sf":"/root/testdata/sf0.1","reps":3}\n[success] Total time: 725 s')
trunc_a = {"n": 10, "rc": 0, "parsed": None, "tail": tail_a}
rc, out = run(trunc_a, trunc, changed="q4")
check("tail-vs-tail: adjudicates the shared visible suffix",
      rc == 1 and "q4" in out and "shared queries: 3" in out, out)

sys.exit(1 if fails else 0)
