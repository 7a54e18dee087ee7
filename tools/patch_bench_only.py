#!/usr/bin/env python3
"""Graft the SPARK_GRAFT_ONLY query filter onto a PRIOR build's Bench.scala
(ab_bench.sh's worktree). Harness-only: the measured query code in the
worktree stays the prior commit's, byte-for-byte. Idempotent."""
import re
import sys

ANCHOR = "val results = SparkEntry.specs.map { spec =>"
FILTERED = (
    "val __only = sys.env.get(\"SPARK_GRAFT_ONLY\")"
    ".map(_.split(\",\").map(_.trim).filter(_.nonEmpty).toSet)\n"
    "    val results = SparkEntry.specs.filter(sp =>"
    " __only.forall(o => o(sp.name) || o(shortName(sp.name))))"
    ".map { spec =>"
)


def main() -> None:
    path = sys.argv[1]
    with open(path, encoding="utf-8") as f:
        src = f.read()
    if "__only" in src or "SPARK_GRAFT_ONLY" in src:
        print(f"[patch] {path} already supports SPARK_GRAFT_ONLY")
        return
    if ANCHOR not in src:
        sys.exit(f"[patch] anchor not found in {path}; prior Bench layout "
                 "changed — update patch_bench_only.py")
    src = src.replace(ANCHOR, FILTERED, 1)
    # Neutralize a prior compare pass if one exists (round >= 14 priors):
    # a filtered run must not run confirm iterations against artifacts.
    src = re.sub(r'val priorMin = priorMinTimes\(sf = sfDir\)',
                 'val priorMin = if (__only.isDefined) '
                 'Map.empty[String, Double] else priorMinTimes(sf = sfDir)',
                 src)
    with open(path, "w", encoding="utf-8") as f:
        f.write(src)
    print(f"[patch] {path} patched with SPARK_GRAFT_ONLY filter")


if __name__ == "__main__":
    main()
