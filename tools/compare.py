#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir>

Reads <verify_out_dir>/<name>/ parquet (written by graft.Verify) and
<verify_out_dir>/oracle_sql.json, runs each oracle SQL in DuckDB with the
sf tables registered as views, and compares: row count, column names,
and a hash over values with columns sorted by name and rows sorted by all
columns (the driver's documented compare sorts columns by name).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def norm_cell(v):
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if np.isnan(f):
            return "NaN"
        # round to 9 significant-ish decimals to absorb last-ulp engine noise
        return f"{f:.9g}"
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)

def table_hash(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.sha256()
    for _, row in df.iterrows():
        h.update("|".join(norm_cell(v) for v in row).encode())
        h.update(b"\n")
    return h.hexdigest()

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracles:
            results[name] = {"rows": len(got), "oracle": False, "ok": len(got) > 0}
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = {"ok": False, "error": f"oracle sql failed: {e}"}
            continue
        g, e = canon(got), canon(exp)
        cols_match = list(g.columns) == list(e.columns)
        rows_match = len(g) == len(e)
        hash_match = cols_match and rows_match and table_hash(g) == table_hash(e)
        results[name] = {"rows": len(g), "exp_rows": len(e),
                         "cols_match": cols_match, "rows_match": rows_match,
                         "hash_match": hash_match, "ok": hash_match}
        if not hash_match and cols_match and rows_match:
            # show first few diffs
            diffs = []
            for i in range(min(len(g), len(e))):
                rg = [norm_cell(v) for v in g.iloc[i]]
                re_ = [norm_cell(v) for v in e.iloc[i]]
                if rg != re_:
                    diffs.append((i, rg, re_))
                    if len(diffs) >= 3:
                        break
            results[name]["diffs"] = diffs
        elif not cols_match:
            results[name]["got_cols"] = list(g.columns)
            results[name]["exp_cols"] = list(e.columns)
    ok = sum(1 for r in results.values() if r.get("ok"))
    for name, r in results.items():
        status = "OK " if r.get("ok") else "FAIL"
        print(f"{status} {name}: {json.dumps(r, default=str)[:400]}")
    print(f"\n{ok}/{len(results)} ok")
    return 0 if ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
