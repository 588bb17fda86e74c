#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_correctness.py <verify_out_dir> <sf_dir>

Loads each <name>/ parquet result written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same parquet tables, sorts
columns by name on both sides, and compares schema + exact values (which is
strictly stronger than any hash the driver may use).
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark_result(qdir: Path) -> pd.DataFrame:
    files = sorted(qdir.glob("*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet in {qdir}")
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main() -> int:
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = out_dir / name
        try:
            got = norm(load_spark_result(qdir))
            want = norm(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue

        problems = []
        if list(got.columns) != list(want.columns):
            problems.append(f"columns spark={list(got.columns)} duck={list(want.columns)}")
        elif len(got) != len(want):
            problems.append(f"rows spark={len(got)} duck={len(want)}")
        else:
            for c in got.columns:
                g, w = got[c], want[c]
                if str(g.dtype) != str(w.dtype):
                    problems.append(f"dtype[{c}] spark={g.dtype} duck={w.dtype}")
                eq = (g.isna() & w.isna()) | (g == w)
                try:
                    bad = int((~eq).sum())
                except Exception:
                    bad = -1
                if bad:
                    idx = (~eq).idxmax()
                    problems.append(
                        f"values[{c}]: {bad} mismatches, first at row {idx}: "
                        f"spark={g.iloc[idx]!r} duck={w.iloc[idx]!r}")
        if problems:
            n_fail += 1
            print(f"FAIL {name}")
            for p in problems:
                print(f"     {p}")
        else:
            n_pass += 1
            print(f"ok   {name} ({len(got)} rows)")

    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
