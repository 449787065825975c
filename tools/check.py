#!/usr/bin/env python3
"""Dev-side oracle checker mirroring the driver's t2 gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against views over <sfDir>'s
parquet tables, sorts columns by name and rows by all columns, and compares
with float tolerance. Exit 0 iff all match.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                              str(type(v)).endswith("ndarray'>") else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def compare(name, spark_df, duck_df):
    if list(spark_df.columns) != list(duck_df.columns):
        return f"schema mismatch: spark={list(spark_df.columns)} duck={list(duck_df.columns)}"
    if len(spark_df) != len(duck_df):
        return f"rowcount mismatch: spark={len(spark_df)} duck={len(duck_df)}"
    # STRICT dtype gate (mirrors the driver): any dtype difference — including
    # datetime tz-ness (datetime64[us, UTC] vs naive datetime64[us]) — is a
    # FAIL, not a note. Round 2 shipped 12 schema failures because this check
    # used to mask datetime drift.
    bad_dtypes = [(c, str(spark_df[c].dtype), str(duck_df[c].dtype))
                  for c in spark_df.columns
                  if str(spark_df[c].dtype) != str(duck_df[c].dtype)]
    if bad_dtypes:
        return f"dtype mismatch (spark vs duck): {bad_dtypes}"
    for c in spark_df.columns:
        a, b = spark_df[c], duck_df[c]
        try:
            # EXACT compare — the driver hashes exact values, so any float
            # tolerance here is a gate-parity hole. Round 3 shipped q11_share
            # green locally (rtol=1e-6 passed a 1-cent diff on a 363k value)
            # while the driver's hash failed it. Queries are responsible for
            # emitting cross-engine-deterministic values (decimal-exact sums,
            # decimal rounding, floor idiom on quotients); the gate's job is
            # to prove they did.
            pd.testing.assert_series_equal(a, b, check_dtype=False, check_exact=True,
                                           check_names=False)
        except AssertionError as e:
            bad = None
            try:
                neq = (a.astype(str) != b.astype(str))
                if neq.any():
                    i = neq.idxmax()
                    bad = f" first diff row {i}: spark={a[i]!r} duck={b[i]!r}"
            except Exception:
                pass
            return f"column '{c}' differs{bad or ''}: {str(e).splitlines()[-1]}"
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    fails = 0
    names = [n for n in sorted(oracles) if not only or n in only]
    for name in names:
        pdir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output at {pdir}"); fails += 1; continue
        try:
            spark_df = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            duck_df = norm(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); fails += 1; continue
        err = compare(name, spark_df, duck_df)
        if err: print(f"FAIL {name}: {err}"); fails += 1
        else: print(f"OK   {name} ({len(spark_df)} rows)")
    missing = [n for n in names if n not in oracles]
    print(f"{len(names)-fails}/{len(names)} queries match")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
