#!/usr/bin/env python3
"""check.py with a skip list — for sf0.1 sweeps, where the DuckDB twins
of the embedding-family oracles (full integer-dot chains in SQL) grind
for hours while the Spark side finishes in seconds. Those queries stay
hash-verified at sf0.01/sf0.001 by the full gate; this runs everything
else at the bench scale factor.

Usage: python3 tools/check_subset.py <sfDir> <verifyOutDir>
"""
import json
import sys
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SKIP = {"d13_semantic_canonical", "s01_ann_cosine_topk", "s02_ann_lsh_buckets",
        "s03_ann_ivf", "s04_lang_centroids", "s05_semdedup_cells",
        "s06_ann_truncated", "s07_ann_ivf_prefix", "s08_ann_ivf_indexed",
        "s09_semdedup_indexed", "s10_centroid_outliers", "s11_ann_filtered",
        "s12_ann_filtered_indexed", "d05_dedup_embedding"}


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True,
                          key=lambda s: s.astype(str))


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if name in SKIP:
            n_skip += 1
            continue
        t0 = time.time()
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            want = canon(con.execute(sql).df())
            ok = (list(got.columns) == list(want.columns)
                  and len(got) == len(want)
                  and got.astype(str).equals(want.astype(str)))
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
    print(f"== {n_pass} pass / {n_fail} fail / {n_skip} skipped "
          f"(embedding-oracle family, hash-verified at sf0.01) ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
