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
    orig = src
    # Each graft is independently idempotent: a prior may natively have
    # ONLY support but predate the mem-sentinel toggle (df1f4cd..3fee1a4
    # — exactly the window whose leg asymmetry convicted q16/t33 falsely
    # in round 16), so no graft's presence may short-circuit another.
    if "__only" in src or "SPARK_GRAFT_ONLY" in src:
        print(f"[patch] {path} already supports SPARK_GRAFT_ONLY")
    else:
        if ANCHOR not in src:
            sys.exit(f"[patch] anchor not found in {path}; prior Bench "
                     "layout changed — update patch_bench_only.py")
        src = src.replace(ANCHOR, FILTERED, 1)
        # Neutralize a prior compare pass if one exists (round >= 14
        # priors): a filtered run must not run confirm iterations
        # against artifacts.
        src = re.sub(r'val priorMin = priorMinTimes\(sf = sfDir\)',
                     'val priorMin = if (__only.isDefined) '
                     'Map.empty[String, Double] else priorMinTimes(sf = sfDir)',
                     src)
        print(f"[patch] {path} patched with SPARK_GRAFT_ONLY filter")
    src = graft_mem_toggle(src, path)
    if src != orig:
        with open(path, "w", encoding="utf-8") as f:
            f.write(src)


def graft_mem_toggle(src: str, path: str) -> str:
    """Graft the SPARK_GRAFT_MEM_SENTINEL=0 toggle onto a prior build
    that has the memory-bound sentinel but predates the toggle
    (df1f4cd..3fee1a4 window). Without it the A/B legs do NON-identical
    pre-suite work — the prior leg runs 6 heavy 4M-key hash-aggs the
    current leg skips, reshaping its heap before the measured queries —
    the exact asymmetry that convicted s11/s20 (and, mirrored, q16/t33)
    falsely in rounds 15/16. Harness-only: query code stays the prior
    commit's bytes. No-op when the prior has no mem sentinel (pre-r16)
    or already honors the toggle."""
    if "memSentinelOnce" not in src or "SPARK_GRAFT_MEM_SENTINEL" in src:
        return src
    pre_anchor = "val memSentinelPre = (1 to 3).map(_ => memSentinelOnce())"
    if pre_anchor not in src:
        sys.exit(f"[patch] mem-sentinel pre anchor not found in {path}; "
                 "prior Bench layout changed — update patch_bench_only.py")
    src = src.replace(
        pre_anchor,
        'val __memOn = '
        'sys.env.getOrElse("SPARK_GRAFT_MEM_SENTINEL", "1") != "0"\n'
        "    val memSentinelPre = if (__memOn) "
        "(1 to 3).map(_ => memSentinelOnce()) else Seq.empty[Double]", 1)
    src, n = re.subn(
        r"val memSentinelRaw =\s*\n\s*"
        r"med\(memSentinelPre \+\+ \(1 to 3\)\.map\(_ => "
        r"memSentinelOnce\(\)\)\)",
        "val memSentinelRaw =\n      if (__memOn) "
        "med(memSentinelPre ++ (1 to 3).map(_ => memSentinelOnce())) "
        "else 0.0",
        src, count=1)
    if n != 1:
        sys.exit(f"[patch] mem-sentinel raw anchor not found in {path}; "
                 "prior Bench layout changed — update patch_bench_only.py")
    print(f"[patch] {path} grafted SPARK_GRAFT_MEM_SENTINEL toggle")
    return src


if __name__ == "__main__":
    main()
