#!/usr/bin/env python3
"""Dev-only pre-flight differ (SURVEY §5.1): compare the parquet that
graft.Verify wrote against each oracleSql run in DuckDB 1.0.0 on the
same testdata. Run BEFORE every driver handoff — Verify swallows
per-query failures to stderr, and a silent mismatch costs a round.

Usage: python3 dev/differ.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    results = {}
    names = sorted(d for d in os.listdir(out)
                   if os.path.isdir(os.path.join(out, d)))
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out, name, "*.parquet"))
        if not files:
            results[name] = "NO-SPARK-OUTPUT"
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            results[name] = f"no-oracle rows={len(spark_df)}"
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR: {e}"
            continue
        results[name] = compare(spark_df, duck_df)
    width = max(len(n) for n in results) if results else 0
    fails = 0
    for name in sorted(results):
        r = results[name]
        ok = r == "OK" or r.startswith("no-oracle")
        fails += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL':4} {name:{width}} {r}")
    print(f"\n{len(results) - fails}/{len(results)} pass")
    sys.exit(1 if fails else 0)

def compare(s, d):
    """Schema-strict compare, mirroring the driver (round-1 post-mortem:
    the old version stripped timestamp tz and tuple-ized arrays, hiding
    13 tz-schema failures + 1 differ crash for a whole round)."""
    if sorted(s.columns) != sorted(d.columns):
        return f"SCHEMA: spark={sorted(s.columns)} duck={sorted(d.columns)}"
    if len(s) != len(d):
        return f"ROWS: spark={len(s)} duck={len(d)}"
    s = s[sorted(s.columns)].reset_index(drop=True)
    d = d[sorted(d.columns)].reset_index(drop=True)
    for c in s.columns:
        sv, dv = s[c], d[c]
        # dtype must match EXACTLY, tz annotation included: a Spark
        # timestamp[us, UTC] vs DuckDB naive timestamp is a driver
        # schema_match=false even when every instant is equal
        if str(sv.dtype) != str(dv.dtype):
            return f"DTYPE {c}: spark={sv.dtype} duck={dv.dtype}"
        if str(sv.dtype).startswith("datetime64"):
            if not sv.equals(dv):
                # NaT != NaT is True — mask equal-null rows or the
                # reported "first diff" can be a pair of equal NaTs
                neq = (sv != dv) & ~(sv.isna() & dv.isna())
                i = int(np.argmax(neq.to_numpy()))
                return f"COL {c} row {i}: spark={sv[i]!r} duck={dv[i]!r}"
            continue
        if sv.dtype == object:
            # the driver sorts+hashes every column — an ndarray/list
            # value is unhashable there and crashes the whole compare
            for side, col in (("spark", sv), ("duck", dv)):
                bad = col.map(lambda v: isinstance(v, (np.ndarray, list,
                                                       tuple, dict, set)))
                if bad.any():
                    i = int(np.argmax(bad.to_numpy()))
                    return (f"UNHASHABLE {c} ({side}) row {i}: "
                            f"{type(col[i]).__name__} — driver differ "
                            f"crashes on this; serialize to string")
            if not sv.equals(dv):
                # .equals() can be False while eq() passes every row
                # (e.g. None vs NaN in an object column) — that is an
                # equal-null representation difference, not a diff
                i = next((i for i in range(len(sv)) if not eq(sv[i], dv[i])),
                         None)
                if i is not None:
                    return f"COL {c} row {i}: spark={sv[i]!r} duck={dv[i]!r}"
        elif np.issubdtype(sv.dtype, np.floating):
            a, b = sv.to_numpy(), dv.to_numpy()
            neq = ~((a == b) | (np.isnan(a) & np.isnan(b)))
            if neq.any():
                i = int(np.argmax(neq))
                return (f"COL {c} row {i}: spark={a[i]!r} duck={b[i]!r} "
                        f"maxabsdiff={np.nanmax(np.abs(a - b))}")
        else:
            if not sv.equals(dv):
                i = next((i for i in range(len(sv))
                          if not eq(sv[i], dv[i])), None)
                if i is not None:
                    return f"COL {c} row {i}: spark={sv[i]!r} duck={dv[i]!r}"
    return "OK"

def eq(a, b):
    try:
        return a == b or (pd.isna(a) and pd.isna(b))
    except Exception:
        return False

if __name__ == "__main__":
    main()
