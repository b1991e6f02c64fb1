#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>

Expects graft.Verify to have already written <verifyOutDir>/<name>/ parquet
dirs plus oracle_sql.json. Registers each test table as a DuckDB view, runs
every oracle SQL, and value-compares against the Spark parquet with columns
sorted by name (mirroring the driver's hash compare).
"""
import math
import sys

from oracle_common import connect_with_views, load_oracles


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9) if not math.isnan(v) else "NaN"
            rr.append(v)
        out.append(tuple(rr))
    return out


def main(sf_dir, out_dir):
    con = connect_with_views(sf_dir)
    oracle = load_oracles(out_dir)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            o = con.sql(sql)
            o_cols, o_rows = o.columns, o.fetchall()
            s = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols, s_rows = s.columns, s.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(o_cols) != sorted(s_cols):
            print(f"FAIL {name}: columns oracle={sorted(o_cols)} spark={sorted(s_cols)}")
            n_fail += 1
            continue
        co, cs = canon(o_rows, o_cols), canon(s_rows, s_cols)
        if len(co) != len(cs):
            print(f"FAIL {name}: rowcount oracle={len(co)} spark={len(cs)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(co, cs)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(co)} rows differ; first at {i}:\n  oracle={a}\n  spark ={b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(co)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
