#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate (testing only;
the shipped library is pure Scala). Usage:
  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
Registers each parquet table as a DuckDB view, runs every oracle in
oracle_sql.json, and compares against the Spark parquet dump: columns
sorted by name, rows sorted, exact value equality (NaN-safe).
"""
import sys, json, glob
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = p.split("/")[-1].removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_bad = 0
    # queries that crashed inside Verify never produce a dump dir; count
    # them as failures up front so they can't look like absent rows
    try:
        errs = json.load(open(f"{outdir}/_errors.json"))
    except FileNotFoundError:
        errs = {}
    for name, msg in sorted(errs.items()):
        print(f"ERR  {name}: {msg}")
        n_bad += 1
    for name, sql in sorted(oracle.items()):
        try:
            exp = canon(con.execute(sql).fetchdf())
            got = canon(duckdb.query(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").to_df())
            if list(exp.columns) != list(got.columns):
                print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
                n_bad += 1
            elif len(exp) != len(got):
                print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
                n_bad += 1
            else:
                # The driver's hash is representation-sensitive: an oracle
                # column that DuckDB promotes (e.g. sum(INTEGER) -> HUGEINT
                # = pandas object/float) hash-mismatches a BIGINT Spark dump
                # even when every value is equal. astype-aligning here masked
                # exactly that class (round-8 q12_shipmode/corpus_profile),
                # so any dtype divergence is now a loud failure: fix the
                # oracle SQL with an explicit CAST instead.
                dt_bad = [(c, str(exp[c].dtype), str(got[c].dtype))
                          for c in exp.columns
                          if str(exp[c].dtype) != str(got[c].dtype)]
                if dt_bad:
                    print(f"FAIL {name}: dtype divergence (oracle vs dump): {dt_bad}")
                    n_bad += 1
                    continue
                eq = exp.compare(got)
                if len(eq) == 0:
                    print(f"OK   {name}: {len(exp)} rows")
                else:
                    print(f"FAIL {name}: {len(eq)} differing rows; first:\n{eq.head(3)}")
                    n_bad += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_bad += 1
    return n_bad

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
