#!/usr/bin/env python3
"""Guard for the family-trait split's one real serialization hazard.

The AnalyticsQueries facade is assembled from family traits. A task
closure (flatMapGroups / mapGroups / mapPartitions / *WithState) that
references a trait-level val or def compiles fine but captures `this`
— the ENTIRE facade — into the task, and Spark's closure serializer
throws Task-not-serializable at runtime (found live once, r11:
mmrGreedyTail referencing MmrSelect; fixed by hoisting to a local).
This lint makes the NEXT such capture a CI failure instead of a
runtime surprise:

  for every file declaring a family trait with the AnalyticsQueries
  self-type, collect its trait-level member names, find each task-
  closure argument span by brace/paren matching, and flag any member
  name referenced inside a span. The sanctioned pattern is hoisting
  before the closure (`val mmrSelect = MmrSelect`) — the hoist sits
  OUTSIDE the span, so it never flags.

Usage: python3 tools/closurelint.py [--self-test]   (exit 0 = clean)
"""

import re
import sys
from pathlib import Path

QUERIES_DIR = Path(__file__).resolve().parent.parent / \
    "src" / "main" / "scala" / "graft" / "queries"

# any family trait with a facade self-type (AnalyticsQueries.type,
# StreamingQueries.type, ...) — the capture hazard is the same
TRAIT_RE = re.compile(r"trait\s+\w+\s*\{\s*this:\s*\w+\.type\s*=>")
# trait-level members: exactly two-space indent (trait body level).
# The modifier group must cover BARE private/protected and final too —
# `private val X` referenced inside a task closure captures the facade
# exactly like `private[queries] val X` does.
MEMBER_RE = re.compile(
    r"^  (?:(?:private|protected)(?:\[\w+\])?\s+)?(?:final\s+)?"
    r"(?:lazy\s+)?(?:val|def)\s+(\w+)", re.M)
CLOSURE_OPS = ("flatMapGroups", "mapGroups", "mapPartitions",
               "flatMapGroupsWithState", "mapGroupsWithState")
OP_RE = re.compile(r"\.(" + "|".join(CLOSURE_OPS) + r")\b")


def closure_spans(src):
    """Yield (op, start, end) for each task-closure argument span:
    from the first {/( after the operator to its balanced close."""
    for m in OP_RE.finditer(src):
        i = m.end()
        while i < len(src) and src[i] in " \t\n([":
            if src[i] in "([":
                break
            i += 1
        # advance to the first opening brace/paren of the argument
        while i < len(src) and src[i] not in "{(":
            i += 1
        if i >= len(src):
            continue
        opener, closer = (src[i], "}" if src[i] == "{" else ")")
        depth, j = 1, i + 1
        while j < len(src) and depth:
            c = src[j]
            if c == opener:
                depth += 1
            elif c == closer:
                depth -= 1
            j += 1
        yield m.group(1), i, j


def strip_comments(src):
    src = re.sub(r"/\*.*?\*/", lambda m: re.sub(r"\S", " ", m.group(0)),
                 src, flags=re.S)
    return re.sub(r"//[^\n]*", lambda m: " " * len(m.group(0)), src)


# trait-level object: EVERY reference compiles to `this.Obj()` and
# captures the facade wherever the reference serializes — including
# thunks built inside driver-side foreachBatch bodies, which is how
# the hazard escaped the closure-op scan once (s05's
# `() => S05.producer(key)` during the r12 streaming split). JVM-shared
# state belongs at file top level (static MODULE$ access, no capture).
TRAIT_OBJ_RE = re.compile(r"^  (?:private(?:\[\w+\])?\s+)?object\s+(\w+)", re.M)


def lint_source(src, name="<src>"):
    findings = []
    m = TRAIT_RE.search(src)
    if not m:
        return findings
    # scan only the trait body — file-top-level helpers (e.g. a shared
    # state object hoisted OUT of the trait) are static and safe
    code = strip_comments(src)[m.start():]
    base_line = src[:m.start()].count("\n")
    members = set(MEMBER_RE.findall(code))
    for om in TRAIT_OBJ_RE.finditer(code):
        line = base_line + code.count("\n", 0, om.start()) + 1
        findings.append(
            f"{name}:{line}: trait-level object `{om.group(1)}` — every "
            f"reference captures the facade when it serializes (even via "
            f"foreachBatch-built thunks); move it to file top level")
    for op, start, end in closure_spans(code):
        span = code[start:end]
        for mem in sorted(members):
            if re.search(r"\b" + re.escape(mem) + r"\b", span):
                line = base_line + code.count("\n", 0, start) + 1
                findings.append(
                    f"{name}:{line}: {op} closure references trait member "
                    f"`{mem}` — captures the facade; hoist to a local "
                    f"before the closure")
    return findings


def self_test():
    bad = """
trait FooFamily { this: AnalyticsQueries.type =>
  private[graft] lazy val MmrSelect = 4
  def q(ds: Dataset[Long]) =
    ds.groupByKey(identity).flatMapGroups { (k, it) =>
      it.take(MmrSelect)
    }
}
"""
    good = bad.replace("it.take(MmrSelect)", "it.take(sel)").replace(
        "ds.groupByKey", "val sel = MmrSelect\n    ds.groupByKey")
    not_a_family = bad.replace(
        "trait FooFamily { this: AnalyticsQueries.type =>",
        "object Foo {")
    trait_obj = """
trait FooFamily { this: AnalyticsQueries.type =>
  private object Shared { val x = 1 }
  def q(): Int = Shared.x
}
"""
    hoisted_obj = """
private object Shared { val x = 1 }
trait FooFamily { this: AnalyticsQueries.type =>
  def q(): Int = Shared.x
}
"""
    bare_private = """
trait FooFamily { this: AnalyticsQueries.type =>
  private val Budget = 4
  def q(ds: Dataset[Long]) =
    ds.groupByKey(identity).flatMapGroups { (k, it) =>
      it.take(Budget)
    }
}
"""
    ok = True
    f = lint_source(bare_private, "bare")
    if not (len(f) == 1 and "Budget" in f[0]):
        print(f"FAIL self-test: bare-private member capture not flagged: {f}")
        ok = False
    f = lint_source(trait_obj, "tobj")
    if not (len(f) == 1 and "Shared" in f[0] and "trait-level object" in f[0]):
        print(f"FAIL self-test: trait-level object not flagged: {f}")
        ok = False
    if lint_source(hoisted_obj, "hobj"):
        print("FAIL self-test: file-top-level object flagged")
        ok = False
    f = lint_source(bad, "bad")
    if not (len(f) == 1 and "MmrSelect" in f[0]):
        print(f"FAIL self-test: capture not flagged: {f}")
        ok = False
    if lint_source(good, "good"):
        print("FAIL self-test: hoist pattern flagged")
        ok = False
    if lint_source(not_a_family, "obj"):
        print("FAIL self-test: non-family object flagged "
              "(objects are statically referenced, no capture)")
        ok = False
    print("self-test " + ("PASS" if ok else "FAIL"))
    return 0 if ok else 1


def main():
    if "--self-test" in sys.argv:
        return self_test()
    findings = []
    for p in sorted(QUERIES_DIR.glob("*.scala")):
        findings += lint_source(p.read_text(), p.name)
    for f in findings:
        print(f)
    print(f"closurelint: {len(findings)} finding(s) over family traits")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
