#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet result dumped by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same sf tables,
sorts columns by name + rows by all columns on both sides, and compares
values exactly. Mirrors the driver gate so oracle drift is caught locally.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result written"); n_fail += 1; continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet({files!r})").df())
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        # Float columns compare with a tiny absolute tolerance: Spark's
        # BigDecimal HALF_UP round and DuckDB's double rounding can
        # legitimately disagree by one ulp of the rounding quantum on
        # boundary values (the residual flake class for round(avg, 4)
        # outputs not yet DECIMAL-cast). Everything else compares exactly.
        neq = pd.DataFrame(index=got.index, columns=got.columns, dtype=bool)
        for c in got.columns:
            if got[c].dtype.kind == "f" and exp[c].dtype.kind == "f":
                # Exact equality short-circuits first so equal infinities
                # pass (inf - inf is NaN, which would fail the tolerance).
                neq[c] = ~((got[c] == exp[c]) |
                           ((got[c] - exp[c]).abs() <= 1e-9)) & \
                         ~(got[c].isna() & exp[c].isna())
            else:
                neq[c] = (got[c] != exp[c]) & ~(got[c].isna() & exp[c].isna())
        if neq.any().any():
            bad = neq.any(axis=1)
            idx = bad[bad].index[:3]
            print(f"FAIL {name}: {int(bad.sum())} mismatching rows; first:")
            for i in idx:
                print("  spark:", got.loc[i].to_dict())
                print("  duck :", exp.loc[i].to_dict())
            n_fail += 1; continue
        print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    extra = [q for q in glob.glob(os.path.join(outdir, "*")) if os.path.isdir(q)
             and os.path.basename(q) not in oracle]
    for q in extra:
        print(f"INFO rows-only query (no oracle): {os.path.basename(q)}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
