#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the
matching oracle_sql.json entry in DuckDB against the same parquet
tables, and compares: row count, schema (column names), and exact
values (columns sorted by name, rows sorted by all columns).
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(
                df[c].iloc[0], __import__("datetime").date):
            df[c] = pd.to_datetime(df[c])
        elif str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"FAIL {name}: no Spark output")
            n_fail += 1
            continue
        got = pd.read_parquet(qdir)
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"columns {sorted(got.columns)} != {sorted(exp.columns)}")
        elif len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        else:
            g, e = canon(got), canon(exp)
            for c in g.columns:
                gv, ev = g[c], e[c]
                try:
                    same = gv.equals(ev.astype(gv.dtype))
                except Exception:
                    same = list(gv) == list(ev)
                if not same:
                    neq = (gv.astype(str) != ev.astype(str))
                    idx = neq[neq].index[:3].tolist()
                    detail = [(i, gv[i], ev[i]) for i in idx]
                    problems.append(f"col {c}: dtypes {gv.dtype}/{ev.dtype} first diffs {detail}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
