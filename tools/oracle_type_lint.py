#!/usr/bin/env python3
"""Oracle-side output-type lint (driver-side tooling only).

GateSchemaSpec lints the SPARK side of every gated query to the
proven-portable type set; this is the DuckDB-side twin. DuckDB widens
silently — SUM(BIGINT) and windowed SUM(BIGINT) are HUGEINT (INT128) —
and a wide-integer oracle column is exactly the r10 failure shape the
driver's hash gate rejects while local value-compare stays green
(python ints compare equal regardless of the storage type). Round 11
shipped one: q122's un-CAST window sums.

Usage: python3 tools/oracle_type_lint.py <sfDir> <verifyOutDir>
(expects <verifyOutDir>/oracle_sql.json from graft.Verify; exits 1 on
any non-portable oracle output column.)
"""
import sys

from oracle_common import connect_with_views, load_oracles

# the DuckDB renderings of GateSchemaSpec's portable set
PORTABLE = {"BIGINT", "INTEGER", "VARCHAR", "DOUBLE", "BOOLEAN"}


def main(sf_dir, out_dir):
    con = connect_with_views(sf_dir)
    oracle = load_oracles(out_dir)
    bad = []
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
            for c, ty in zip(rel.columns, [str(x) for x in rel.types]):
                if ty not in PORTABLE:
                    bad.append(f"{name}.{c}: {ty}")
        except Exception as e:  # an unrunnable oracle is its own failure
            bad.append(f"{name}: <error> {e}")
    if bad:
        print("NON-PORTABLE oracle output columns (driver hash-gate risk):")
        for b in bad:
            print("  " + b)
        sys.exit(1)
    print(f"== {len(oracle)} oracles, all output columns portable ==")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
