#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 scripts/check.py [--strict] <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet result dumped by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same sf tables,
sorts columns by name + rows by all columns on both sides, and compares.

Default mode compares values (float columns with a 1e-9 absolute tolerance).
--strict mirrors the driver's representation-sensitive canonicalization,
which round 2 proved the tolerant compare cannot predict (10 value-exact
queries failed the driver's hash on rendering alone):
  1. TYPE parity: DESCRIBE of the Spark parquet vs DESCRIBE of the oracle
     SQL must produce identical DuckDB type names per column — this flags
     HUGEINT-vs-BIGINT sums, DECIMAL-vs-DOUBLE outputs, INT-vs-BIGINT
     widths before any value is read.
  2. RENDERING parity: every cell of both results is CAST(... AS VARCHAR)
     inside DuckDB and compared exactly — "25.0000" (DECIMAL) vs "25.0"
     (DOUBLE) fails here exactly like it fails the driver's hash.
Strict red/green should match CORRECTNESS_r{N}.json row for row; run it at
sf0.001 AND sf0.01 (the driver's gate scale — some reds need the bigger
data to produce a trailing-zero value).
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

def describe_types(con, sql):
    """column -> DuckDB type name, via DESCRIBE (no execution of the query)."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}

def render_all_varchar(con, sql, cols):
    """Run sql with every output column cast to VARCHAR inside DuckDB —
    the canonical string rendering (DECIMAL keeps trailing zeros, DOUBLE
    does not), sorted columns-by-name then rows-by-all-columns."""
    ordered = sorted(cols)
    # COALESCE to a sentinel INSIDE DuckDB so a genuine NULL stays
    # distinguishable from the literal string 'None' (astype(str) would
    # render both identically and mask a NULL-vs-'None' divergence the
    # driver's hash treats as a mismatch). The sentinel is the literal
    # 12-char text \x00NULL\x00 (DuckDB standard strings do not process
    # backslash escapes) — collision requires a real cell holding exactly
    # that text, which no gated query produces.
    sel = ", ".join(
        f'COALESCE(CAST("{c}" AS VARCHAR), \'\\x00NULL\\x00\') AS "{c}"'
        for c in ordered)
    df = con.execute(f"SELECT {sel} FROM ({sql}) __t").df()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(by=ordered, kind="mergesort").reset_index(drop=True)

def main():
    args = [a for a in sys.argv[1:] if a != "--strict"]
    strict = "--strict" in sys.argv[1:]
    sfdir, outdir = args[0], args[1]
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
        spark_sql = f"SELECT * FROM read_parquet({files!r})"
        try:
            if strict:
                st, ot = describe_types(con, spark_sql), describe_types(con, f"({sql})")
                if set(st) != set(ot):
                    print(f"FAIL {name}: columns {sorted(st)} != {sorted(ot)}")
                    n_fail += 1; continue
                tdiff = {c: (st[c], ot[c]) for c in st if st[c] != ot[c]}
                if tdiff:
                    print(f"FAIL {name}: type mismatch (spark, oracle): {tdiff}")
                    n_fail += 1; continue
                got = render_all_varchar(con, spark_sql, st.keys())
                exp = render_all_varchar(con, sql, ot.keys())
                if len(got) != len(exp):
                    print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
                neq = (got != exp)
                if neq.any().any():
                    bad = neq.any(axis=1)
                    idx = bad[bad].index[:3]
                    print(f"FAIL {name}: {int(bad.sum())} rows differ in rendering; first:")
                    for i in idx:
                        print("  spark:", got.loc[i].to_dict())
                        print("  duck :", exp.loc[i].to_dict())
                    n_fail += 1; continue
                print(f"PASS {name} ({len(got)} rows, strict)"); n_pass += 1
                continue
            got = canon(con.execute(spark_sql).df())
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
        # boundary values. Everything else compares exactly. NOTE: this mode
        # is for debugging VALUES; only --strict predicts the driver's hash.
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
