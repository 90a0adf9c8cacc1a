#!/usr/bin/env python3
"""Local pre-verification harness (SURVEY.md §7): replicate the driver's
correctness gate. Run graft.Verify first (writes per-query parquet +
oracle_sql.json), then this script compares each result against DuckDB
executing the oracle SQL over the same source tables.

Usage: python3 tools/check_oracle.py [sf_dir] [verify_out_dir]
"""
import json
import sys
import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    with open(f"{out}/oracle_sql.json") as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:300]}")
            n_fail += 1
            continue
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no Spark result parquet")
            n_fail += 1
            continue
        sdf = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)

        ok, msg = compare(odf, sdf)
        if ok:
            print(f"PASS {name}: {len(sdf)} rows{msg}")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


def compare(odf, sdf):
    oc, sc = sorted(odf.columns), sorted(sdf.columns)
    if oc != sc:
        return False, f"column mismatch oracle={oc} spark={sc}"
    odf, sdf = odf[oc], sdf[oc]
    if len(odf) != len(sdf):
        return False, f"row count oracle={len(odf)} spark={len(sdf)}"
    notes = []
    for c in oc:
        ov, sv = odf[c], sdf[c]
        if str(ov.dtype) != str(sv.dtype):
            notes.append(f" [dtype {c}: oracle={ov.dtype} spark={sv.dtype}]")
        try:
            if ov.dtype.kind == "f" or sv.dtype.kind == "f":
                import numpy as np
                a = ov.astype(float).to_numpy()
                b = sv.astype(float).to_numpy()
                if not np.array_equal(a, b, equal_nan=True):
                    bad = np.where(~((a == b) | (pd.isna(a) & pd.isna(b))))[0]
                    i = bad[0]
                    if np.allclose(a, b, atol=1e-9, rtol=0, equal_nan=True):
                        return False, (f"col {c} CLOSE-but-not-exact at row {i}: "
                                       f"oracle={a[i]!r} spark={b[i]!r}")
                    return False, (f"col {c} differs at row {i}: "
                                   f"oracle={a[i]!r} spark={b[i]!r}")
            else:
                ar = ov.astype(object).to_numpy()
                br = sv.astype(object).to_numpy()
                neq = [i for i, (x, y) in enumerate(zip(ar, br)) if x != y]
                if neq:
                    i = neq[0]
                    return False, (f"col {c} differs at row {i}: "
                                   f"oracle={ar[i]!r} spark={br[i]!r} "
                                   f"({len(neq)} diffs)")
        except Exception as e:
            return False, f"col {c} compare error: {e}"
    return True, "".join(notes)


if __name__ == "__main__":
    main()
