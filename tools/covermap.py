#!/usr/bin/env python3
"""Regenerate COVERAGE.md's query -> file:line map from source.

The per-query tables in COVERAGE.md carry a location cell
(`File.scala:NNN`). Hand-maintained over a multi-thousand-line file it
drifts every round; this derives it mechanically: parse the registry
literals (`"key" -> funcName _`) out of src/main/scala/graft/queries/*,
resolve each funcName to its `def` site, and rewrite only the location
cell of rows whose first cell is a registered query key — descriptions
stay hand-written.

Usage:
  python3 tools/covermap.py            # rewrite COVERAGE.md in place
  python3 tools/covermap.py --check    # exit 1 if any location is stale

Also fails (exit 1) if a registered key has no COVERAGE.md row, so a new
query can't land undocumented.
"""

import argparse
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
QUERIES_DIR = ROOT / "src/main/scala/graft/queries"
COVERAGE = ROOT / "COVERAGE.md"

REG_RE = re.compile(r'"([a-z][a-z0-9_]+)"\s*->\s*(\w+) _')


def registry():
    """{query_key: scala_func_name} from the queries-val literals."""
    out = {}
    for f in sorted(QUERIES_DIR.glob("*.scala")):
        for m in REG_RE.finditer(f.read_text()):
            out[m.group(1)] = m.group(2)
    return out


def def_sites():
    """{func_name: 'File.scala:line'} for every top-level-ish def."""
    sites = {}
    for f in sorted(QUERIES_DIR.glob("*.scala")):
        for i, line in enumerate(f.read_text().splitlines(), 1):
            m = re.match(r"\s*(?:private(?:\[\w+\])?\s+)?def (\w+)\b", line)
            if m and m.group(1) not in sites:
                sites[m.group(1)] = f"{f.name}:{i}"
    return sites


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    reg = registry()
    sites = def_sites()
    missing_defs = {k: fn for k, fn in reg.items() if fn not in sites}
    if missing_defs:
        sys.exit(f"error: registry functions without a def site: {missing_defs}")
    loc = {k: sites[fn] for k, fn in reg.items()}

    lines = COVERAGE.read_text().splitlines()
    row_re = re.compile(r"^(\|\s*([a-z][a-z0-9_]+)\s*\|.*\|)\s*([\w.]+\.scala:\d+(?:-\d+)?)\s*\|\s*$")
    stale, seen = [], set()
    for i, line in enumerate(lines):
        m = row_re.match(line)
        if not m or m.group(2) not in loc:
            continue
        key = m.group(2)
        seen.add(key)
        want = loc[key]
        if m.group(3) != want:
            stale.append((key, m.group(3), want))
            lines[i] = f"{m.group(1)} {want} |"
    # q01-q41 / x01-x10 / p01-p05 are documented as prose blocks in the
    # closed §2 / §2.8 sections (keyed by operator id, not query key);
    # everything else — the extended analytics families, where new
    # queries actually land — must carry a per-key location row.
    prose = re.compile(r"^(q\d\d_|x\d\d_|p0[1-5]_)")
    undocumented = sorted(k for k in set(loc) - seen if not prose.match(k))
    if undocumented:
        print(f"registered keys with no COVERAGE.md location row: {undocumented}",
              file=sys.stderr)
    if args.check:
        for key, old, new in stale:
            print(f"stale: {key}: {old} -> {new}")
        sys.exit(1 if (stale or undocumented) else 0)
    COVERAGE.write_text("\n".join(lines) + "\n")
    print(f"{len(seen)} rows checked, {len(stale)} locations updated"
          + (f", {len(undocumented)} keys undocumented" if undocumented else ""))
    sys.exit(1 if undocumented else 0)


if __name__ == "__main__":
    main()
