#!/usr/bin/env python3
"""Aggregate ab_bench.sh's per-leg artifacts into BENCH_AB.json + a table.

Grain: each build's MIN over all its interleaved runs per query (the compare
pass's own grain — a min only moves with plan or host changes, and the host
is the same machine sampled alternately for both builds). Verdict: real if
cur_min > 1.15 x prior_min and the absolute delta >= 0.1 s; faster if the
same holds in reverse; flat otherwise."""
import json
import os
import sys


def mins_of(path: str) -> dict:
    try:
        with open(path, encoding="utf-8") as f:
            return json.load(f).get("mins") or {}
    except Exception:
        return {}


def main() -> None:
    scratch, rounds, ref, out = (
        sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4])
    agg = {"prior": {}, "current": {}}
    runs = {"prior": 0, "current": 0}
    for leg in ("prior", "current"):
        for r in range(1, rounds + 1):
            d = os.path.join(scratch, f"{leg}-r{r}")
            # A leg build may default its restricted-run artifact to
            # BENCH_ONLY.json (round 16+) or honor the explicit
            # SPARK_GRAFT_OUT=BENCH_LOCAL.json — read whichever exists.
            m = (mins_of(os.path.join(d, "BENCH_LOCAL.json"))
                 or mins_of(os.path.join(d, "BENCH_ONLY.json")))
            if m:
                runs[leg] += 1
            for q, v in m.items():
                if v is None:
                    continue
                cur = agg[leg].get(q)
                agg[leg][q] = v if cur is None else min(cur, v)
    queries = {}
    print(f"{'query':<28} {'prior_min':>9} {'cur_min':>9} {'ratio':>6}  verdict")
    for q in sorted(set(agg["prior"]) | set(agg["current"])):
        p, c = agg["prior"].get(q), agg["current"].get(q)
        if p is None or c is None or p <= 0:
            verdict, ratio = "incomplete", None
        else:
            ratio = c / p
            if ratio > 1.15 and c - p >= 0.1:
                verdict = "real"
            elif ratio < 1 / 1.15 and p - c >= 0.1:
                verdict = "faster"
            else:
                verdict = "flat"
        queries[q] = {"prior_min": p, "cur_min": c,
                      "ratio": None if ratio is None else round(ratio, 3),
                      "verdict": verdict}
        print(f"{q:<28} {p if p is not None else '-':>9} "
              f"{c if c is not None else '-':>9} "
              f"{ratio and round(ratio, 2) or '-':>6}  {verdict}")
    # Ratios within ±0.1 of the 1.15 conviction line are one co-tenant
    # wobble from flipping — the caller should widen the sample (Bench's
    # auto-adjudicator re-runs these at 5 rounds) rather than trust a
    # thin first pass (round 16: q16 convicted at 1.163 from 3x2).
    near = sorted(q for q, v in queries.items()
                  if v["ratio"] is not None and 1.05 <= v["ratio"] <= 1.25)
    if near:
        print(f"[ab] WARNING near-threshold ratios (widen the sample "
              f"before trusting a verdict): {','.join(near)}")
    result = {"mode": "same-host cross-commit A/B", "prior_ref": ref,
              "rounds": rounds, "runs_ok": runs,
              "near_threshold": near, "queries": queries}
    with open(out, "w", encoding="utf-8") as f:
        json.dump(result, f, indent=1)
    print(f"[ab] wrote {out}")


if __name__ == "__main__":
    main()
