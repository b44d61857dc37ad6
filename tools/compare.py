#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, compare against the Spark parquet dump
(columns sorted by name, rows sorted, exact value equality; floats reported
with max abs diff when mismatched)."""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"MISSING SPARK OUT: {name}"); n_bad += 1; continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"ORACLE FAIL {name}: {e}"); n_bad += 1; continue
        files = glob.glob(f"{spark_path}/*.parquet")
        sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        o, s = norm(odf), norm(sdf)
        if list(o.columns) != list(s.columns):
            print(f"FAIL {name}: columns oracle={list(o.columns)} spark={list(s.columns)}")
            n_bad += 1; continue
        if len(o) != len(s):
            print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
            n_bad += 1; continue
        bad_cols = []
        for c in o.columns:
            ov, sv = o[c], s[c]
            try:
                if ov.dtype.kind == 'f' or sv.dtype.kind == 'f':
                    import numpy as np
                    ovn = ov.astype(float); svn = sv.astype(float)
                    eq = (ovn.values == svn.values) | (ovn.isna().values & svn.isna().values)
                    if not eq.all():
                        d = np.nanmax(np.abs(ovn.values - svn.values))
                        bad_cols.append(f"{c}(maxdiff={d:.3e},n={int((~eq).sum())})")
                else:
                    eq = (ov.astype(str).values == sv.astype(str).values)
                    if not eq.all():
                        i = int((~eq).argmax())
                        bad_cols.append(f"{c}(first: oracle={ov.iloc[i]!r} spark={sv.iloc[i]!r})")
            except Exception as e:
                bad_cols.append(f"{c}(cmp error: {e})")
        if bad_cols:
            print(f"FAIL {name}: {'; '.join(bad_cols)}"); n_bad += 1
        else:
            print(f"OK   {name} ({len(o)} rows)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
