#!/usr/bin/env python3
"""check.py with a skip list — for sf0.1 sweeps, kept as the mechanism
for any oracle whose DuckDB twin is infeasible at the bench scale
factor. As of round 10 the list is EMPTY: d13's recursive-closure twin
(the round-5..9 skip) was rewritten as a bounded-depth iterative
min-label unroll with a convergence sentinel, and finishes in seconds.

Usage: python3 tools/check_subset.py <sfDir> <verifyOutDir>
"""
import json
import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Round-10 measurement: every oracle, d13 included, finishes at sf0.1
# (the embedding-family twins in <=16s each).
SKIP = set()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Normalize dtypes BEFORE comparing: the parquet read and the DuckDB
    result may differ in dtype only (int64 vs float64 rendering 1 as '1'
    vs '1.0', Decimal objects, NaN vs None) — those must not report as
    row mismatches. Numeric-ish columns → float64 (NULL → NaN); the rest
    → str with an explicit NULL sentinel."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_numeric_dtype(s) or pd.api.types.is_bool_dtype(s):
            df[c] = pd.to_numeric(s, errors="coerce").astype("float64")
        elif s.dtype == object:
            num = pd.to_numeric(s, errors="coerce")
            if num.notna().sum() == s.notna().sum():  # Decimal / numeric-str
                df[c] = num.astype("float64")
            else:
                df[c] = s.astype(str).where(s.notna(), "<NULL>")
        else:  # datetimes etc: str form is dtype-width-insensitive
            df[c] = s.astype(str).where(s.notna(), "<NULL>")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def frames_equal(got: pd.DataFrame, want: pd.DataFrame) -> bool:
    if list(got.columns) != list(want.columns) or len(got) != len(want):
        return False
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" and w.dtype.kind == "f":
            if not np.allclose(g, w, rtol=1e-9, atol=1e-12, equal_nan=True):
                return False
        elif not g.astype(str).equals(w.astype(str)):
            return False
    return True


def main(sf_dir: str, out_dir: str, only=None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if name in SKIP or (only is not None and name not in only):
            n_skip += 1
            continue
        t0 = time.time()
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            want = canon(con.execute(sql).df())
            ok = frames_equal(got, want)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:150]}",
                  flush=True)
            n_fail += 1
            continue
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows, {time.time() - t0:.0f}s)",
                  flush=True)
        else:
            n_fail += 1
            print(f"FAIL {name}: mismatch rows {len(got)} vs {len(want)}",
                  flush=True)
    print(f"== {n_pass} pass / {n_fail} fail / {n_skip} skipped ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    # Optional 3rd arg: comma-separated query names — check only those
    # (pairs with graft.Verify's own only-these-queries filter).
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
