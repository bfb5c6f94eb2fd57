#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the
matching oracle_sql.json entry in DuckDB against the same parquet
tables, and compares: row count, schema (column names), and exact
values (columns sorted by name, rows sorted by all columns).

Strictness (r6): the driver hashes raw values, so this mimic must be
at least as strict as the driver.
- Oracle result TYPES are audited: any DuckDB column typed HUGEINT /
  UHUGEINT / DECIMAL / FLOAT / TINYINT / ... fails the query outright
  — pandas fetchdf renders HUGEINT as float64 and the driver's value
  hash then sees 0.0 vs 0 (the r3-r5 sequence_packing red). Cast in
  the oracle SQL instead.
- Values are compared with NO dtype coercion; a pandas dtype mismatch
  between the Spark parquet and the oracle frame is itself a FAIL.
"""
import json
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

def type_audit(types, columns) -> list:
    """Flag oracle columns whose DuckDB type loses fidelity through pandas:
    HUGEINT/UHUGEINT materialize as float64 and DECIMAL as float64/object,
    so the driver's value hash diverges from an integral Spark column even
    when the numbers are equal (the r3-r5 sequence_packing red). Cast them
    in the oracle SQL."""
    out = []
    for c, t in zip(columns, types):
        t = str(t).upper()
        if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL"):
            out.append(f"oracle col {c} has non-hash-safe DuckDB type {t} (cast it in the oracle SQL)")
    return out


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(
                df[c].iloc[0], __import__("datetime").date):
            df[c] = pd.to_datetime(df[c])
        if str(df[c].dtype).startswith("datetime64"):
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
    times = {}  # per-oracle DuckDB wall seconds (r13 verdict item 4)
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"FAIL {name}: no Spark output")
            n_fail += 1
            continue
        got = pd.read_parquet(qdir)
        try:
            t0 = time.monotonic()
            rel = con.sql(oracle[name])
            problems = type_audit(rel.types, rel.columns)
            exp = rel.fetchdf()
            times[name] = time.monotonic() - t0
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"columns {sorted(got.columns)} != {sorted(exp.columns)}")
        elif len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        else:
            g, e = canon(got), canon(exp)
            for c in g.columns:
                gv, ev = g[c], e[c]
                # No cross-kind coercion: the driver's value hash renders
                # 0.0 != 0, so float-vs-int dtype divergence (the HUGEINT
                # path) is a real failure even when the numbers look equal.
                # Same-kind width differences (int32 vs int64) hash alike
                # on the driver (customer_deciles is driver-green), so
                # integers compare widened.
                gk, ek = gv.dtype.kind, ev.dtype.kind
                if gk in "iu" and ek in "iu":
                    gv, ev = gv.astype("int64"), ev.astype("int64")
                elif str(gv.dtype) != str(ev.dtype):
                    problems.append(f"col {c}: dtype mismatch spark={gv.dtype} oracle={ev.dtype}")
                    continue
                try:
                    same = gv.equals(ev)
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
    # Oracle runtime budget (r13 verdict item 4): surface the top-10
    # DuckDB wall times so a creeping oracle (the pre-MATERIALIZED
    # triangle chain ran >10 min) is caught at review time, and fail
    # the gate outright past the hard budget.
    BUDGET_S = 60.0
    if times:
        top = sorted(times.items(), key=lambda kv: -kv[1])[:10]
        print("== top-10 oracle times (s): "
              + ", ".join(f"{n}={t:.1f}" for n, t in top)
              + f"; total {sum(times.values()):.1f}s ==")
        over = [(n, t) for n, t in times.items() if t > BUDGET_S]
        for n, t in over:
            print(f"FAIL {n}: oracle runtime {t:.1f}s exceeds {BUDGET_S:.0f}s budget "
                  "(add MATERIALIZED to reused CTEs or restructure)")
        n_fail += len(over)
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
