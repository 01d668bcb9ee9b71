#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB on the oracle SQL dumped by graft.Verify and compares each
query's Spark parquet output: sort columns by name, sort rows, compare
values. Usage:  python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True,
                        key=lambda s: s.map(lambda v: (v is None or (isinstance(v, float) and math.isnan(v)), str(v))))
    return df

def cmp_cell(a, b):
    a_null = a is None or (isinstance(a, float) and math.isnan(a))
    b_null = b is None or (isinstance(b, float) and math.isnan(b))
    if a_null or b_null:
        return a_null and b_null
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if fa == fb:
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = canon(con.sql(sql).df())
            got = canon(duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        # Mirror the driver's hash sensitivity: pandas dtype KIND
        # mismatches (e.g. DuckDB HUGEINT -> float64 'f' vs Spark int64
        # 'i') hash-fail even when every value compares equal. Width
        # differences within a kind (int32 vs int64) hash-matched in r1,
        # so only flag cross-kind.
        dt_bad = [(c, str(want[c].dtype), str(got[c].dtype)) for c in want.columns
                  if want[c].dtype.kind != got[c].dtype.kind]
        if dt_bad:
            print(f"FAIL {name}: dtype mismatch {dt_bad}")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(want)):
            for c in want.columns:
                if not cmp_cell(want[c].iloc[i], got[c].iloc[i]):
                    bad = (i, c, want[c].iloc[i], got[c].iloc[i])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]} want={bad[2]!r} got={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(want)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__.strip().splitlines()[-1].strip(), file=sys.stderr)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
