#!/usr/bin/env python3
"""Local pre-validation of the driver's DuckDB correctness gate.

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 scripts/compare_oracles.py /tmp/verify_out /root/testdata/sf0.01

Dev tool only (duckdb/pyarrow are driver-side packages, never a dependency
of the Scala engine). Mirrors the driver's compare: columns sorted by name,
rows sorted by value, exact equality including floats.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import numpy as np


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        con.execute(f"create view {name} as select * from '{f}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    ok, bad = 0, []
    for q, sql in sorted(oracle.items()):
        try:
            files = glob.glob(os.path.join(out_dir, q, "*.parquet"))
            s_tbl = pq.read_table(files[0])
            d_tbl = con.execute(sql).arrow()
            s = s_tbl.to_pandas()
            d = d_tbl.to_pandas()
            s = s[sorted(s.columns)].sort_values(by=sorted(s.columns)).reset_index(drop=True)
            d = d[sorted(d.columns)].sort_values(by=sorted(d.columns)).reset_index(drop=True)
            # TYPE-family-strict like the driver's hash: the driver converts
            # DuckDB results to pandas, where DECIMAL/HUGEINT become float64
            # — so Spark int64 vs DuckDB sum(BIGINT)=HUGEINT hash-MISMATCHES
            # ("1" vs "1.0") even with equal values (round 1's q10/q14 bug),
            # while int32-vs-int64 and double-vs-DECIMAL are tolerated
            # (q04/q31 passed). Flag exactly the int-vs-float family diffs.
            def family(t):
                t = str(t)
                if t.startswith(("int", "uint")):
                    return "int"
                if t.startswith(("float", "double", "decimal", "halffloat")):
                    return "float"
                return t
            s_types = {f.name: family(f.type) for f in s_tbl.schema}
            d_types = {f.name: family(f.type) for f in d_tbl.schema}
            status = "OK"
            if list(s.columns) != list(d.columns):
                status = f"SCHEMA {list(s.columns)} vs {list(d.columns)}"
            elif s_types != d_types:
                diffs = {c: (s_types.get(c), d_types.get(c))
                         for c in s_types if s_types.get(c) != d_types.get(c)}
                status = f"TYPES {diffs}"
            elif len(s) != len(d):
                status = f"ROWS {len(s)} vs {len(d)}"
            else:
                for c in s.columns:
                    sv, dv = s[c], d[c]
                    if sv.dtype.kind in "fc" or dv.dtype.kind in "fc":
                        if not np.array_equal(sv.astype(float).values, dv.astype(float).values):
                            status = f"VALUES {c}"
                            break
                    elif not (sv.astype(str).values == dv.astype(str).values).all():
                        status = f"VALUES {c}"
                        break
            if status == "OK":
                ok += 1
            else:
                bad.append((q, status))
            print(q, status)
        except Exception as e:  # noqa: BLE001 - report and continue
            bad.append((q, f"ERROR {e}"))
            print(q, "ERROR", e)
    print(f"\n{ok}/{len(oracle)} oracle-matched")
    return 0 if not bad else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
