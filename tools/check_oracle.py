#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load each Verify output
parquet, run the matching oracle SQL in DuckDB over the same sf tables,
sort columns by name + rows by value, and compare exactly.

Usage: python3 tools/check_oracle.py <verify_outdir> <sf_dir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    # run-completion marker (ADVICE r10 #2): Verify deletes _VERIFY_DONE at
    # start and writes it last, so "no parquet for a mapped entry" is a real
    # FAIL only when the run that owns this outdir has finished; while the
    # marker is absent a live Verify may simply not have reached the entry.
    run_done = os.path.exists(os.path.join(outdir, "_VERIFY_DONE"))
    n_pass = n_fail = n_rows_only = n_inflight = 0
    for name in sorted(oracle):
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            if not run_done:
                print(f"IN-FLIGHT {name}  (no completed parquet; live Verify run?)")
                n_inflight += 1
            else:
                print(f"FAIL {name}: no spark output");  n_fail += 1
            continue
        try:
            got = norm(con.sql(f"SELECT * FROM read_parquet({files!r})").df())
            want = norm(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}");  n_fail += 1;  continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1;  continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1;  continue
        # exact compare (NaN==NaN); report first differing cells
        diff_cols = [c for c in got.columns if not got[c].equals(want[c])]
        if diff_cols:
            print(f"FAIL {name}: value diff in {diff_cols}")
            for c in diff_cols[:2]:
                neq = got[c] != want[c]
                idx = neq[neq].index[:3]
                for i in idx:
                    print(f"   [{i}] {c}: spark={got[c][i]!r} oracle={want[c][i]!r}")
            n_fail += 1;  continue
        tag = "" if len(got) else "  (0 rows!)"
        print(f"PASS {name}  ({len(got)} rows){tag}")
        n_pass += 1
    missing = [d for d in os.listdir(outdir)
               if os.path.isdir(os.path.join(outdir, d)) and d not in oracle]
    for d in sorted(missing):
        # racing a LIVE Verify run (VERDICT r9 minor #4): a dir absent from
        # the oracle map with no completed parquet part yet is an in-flight
        # entry of a newer run, not a rows-only result — say so instead of
        # miscounting it
        parts = glob.glob(os.path.join(outdir, d, "*.parquet"))
        if not parts:
            print(f"IN-FLIGHT {d}  (no completed parquet; live Verify run?)")
            n_inflight += 1
            continue
        n = con.sql(f"SELECT count(*) FROM '{outdir}/{d}/*.parquet'").fetchone()[0]
        print(f"ROWS-ONLY {d}  ({n} rows)")
        n_rows_only += 1
    flight = f", {n_inflight} in-flight" if n_inflight else ""
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only{flight}")
    # rc=2 on in-flight (r11 review): a CRASHED Verify run (marker deleted,
    # never rewritten) is indistinguishable from a live one, so a run with
    # in-flight entries must not exit 0 — a gate consumer keying on the
    # exit code would otherwise pass a run that verified nothing. rc=0
    # means strictly: every mapped entry present and green.
    return 1 if n_fail else (2 if n_inflight else 0)

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
