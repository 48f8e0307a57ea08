#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read each
outDir/<name> parquet (Spark result), run outDir/oracle_sql.json in DuckDB
against the sfDir tables, compare values with columns sorted by name.

Usage: check_oracle.py <sfDir> <outDir>
"""
import hashlib, json, sys, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def result_md5(df: pd.DataFrame) -> str:
    """Stable content hash of a canonical result frame. Printed on OK
    lines so the committed snapshot carries machine-checkable re-run
    evidence: a flake adjudication (check_correctness_artifact.py)
    must quote the rows+md5 of a local re-run, and the guard verifies
    them against these values."""
    return hashlib.md5(
        df.astype(str).to_csv(index=False).encode()).hexdigest()[:12]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # bound DuckDB's appetite: with default settings (one thread per
    # core, memory limit ~80% of a 128G box) the sandbox occasionally
    # fails thread creation (EAGAIN) or tiny mallocs while a Spark JVM
    # is still releasing memory -- observed as one random FAIL per ~5
    # full runs; 8 threads / 16G is far more than any oracle needs
    con.execute("SET threads=8")
    con.execute("SET memory_limit='16GB'")
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet"); continue
        got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        try:
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); continue
        bad = []
        for c in got.columns:
            a, b = got[c], exp[c]
            try:
                eq = (a.astype(str).values == b.astype(str).values)
            except Exception:
                eq = a.values == b.values
            if not eq.all():
                i = (~eq).nonzero()[0][0]
                bad.append((c, i, a.iloc[i], b.iloc[i]))
        if bad:
            c, i, av, bv = bad[0]
            print(f"FAIL {name}: col {c} row {i}: spark={av!r} oracle={bv!r} (+{len(bad)-1} more cols)")
        else:
            n_ok += 1
            print(f"OK   {name} ({len(got)} rows, md5 {result_md5(got)})")
    print(f"{n_ok}/{len(oracles)} queries match")
    return 0 if n_ok == len(oracles) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
