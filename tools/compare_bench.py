#!/usr/bin/env python3
"""Drift-normalized cross-round bench comparison.

Usage: python3 tools/compare_bench.py OLD.json NEW.json [sf1]

Compares per-query medians between two BENCH_DETAIL-style records.
Host speed moves between marathons (measured 29% same-code drift in
r11), so raw ratios conflate host drift with code changes. This tool:

  1. computes the HOST-DRIFT FACTOR — the calibration-block ratio when
     both records carry `drift` (median of the steady points, i.e. all
     but the warmup-taxed first), else the MEDIAN per-query ratio over
     common queries (same-code queries dominate any round's registry,
     so the median ratio IS the host factor; a real regression in a few
     queries cannot move it);
  2. reports each query's drift-NORMALIZED ratio (raw / factor);
  3. flags only queries whose normalized ratio exceeds the threshold
     AND (when the old record carries `queries_spread`) whose new
     median falls outside the old [min, max] band scaled by the factor
     — dispersion-aware, so noisy sub-second queries don't false-alarm.
"""
import json
import math
import sys


def medians(rec, sf1):
    return rec.get("sf1_medians" if sf1 else "queries", {}) or {}


def drift_factor(old, new, common_ratios):
    def steady(rec):
        c = (rec.get("drift") or {}).get("calib_sec")
        if not c or len(c) < 2:
            return None
        s = sorted(c[1:])
        return s[len(s) // 2]
    a, b = steady(old), steady(new)
    if a and b:
        return b / a, "calibration (steady points)"
    rs = sorted(common_ratios)
    return (rs[len(rs) // 2] if rs else 1.0), "median per-query ratio"


def main():
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    sf1 = len(sys.argv) > 3 and sys.argv[3] == "sf1"
    thresh = float(sys.argv[4]) if len(sys.argv) > 4 else 1.5
    mo, mn = medians(old, sf1), medians(new, sf1)
    common = sorted(set(mo) & set(mn))
    ratios = {q: mn[q] / mo[q] for q in common if mo[q] > 0}
    if not ratios:
        sys.exit("no common queries")
    factor, src = drift_factor(old, new, list(ratios.values()))
    spread = old.get("queries_spread", {}) if not sf1 else {}
    gm = math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
    print(f"common queries: {len(common)}  scale: {'sf1' if sf1 else 'base'}")
    print(f"host-drift factor: {factor:.3f} ({src})")
    print(f"raw geomean ratio: {gm:.3f}  drift-normalized: {gm / factor:.3f}")
    flagged = []
    for q, r in ratios.items():
        norm = r / factor
        if norm <= thresh:
            continue
        band = spread.get(q)
        if band and mn[q] <= band[2] * factor:
            continue  # inside the old dispersion band, host-scaled
        flagged.append((norm, q, mo[q], mn[q]))
    if flagged:
        print(f"flagged (normalized ratio > {thresh}, outside old spread band):")
        for norm, q, a, b in sorted(flagged, reverse=True):
            print(f"  {q}: {a:.2f}s -> {b:.2f}s (raw {b / a:.2f}x, normalized {norm:.2f}x)")
    else:
        print(f"no query exceeds {thresh}x drift-normalized outside its spread band")
    top = sorted(ratios.items(), key=lambda kv: kv[1])
    print("best movers:", ", ".join(f"{q} {r:.2f}x" for q, r in top[:3]))
    print("worst movers:", ", ".join(f"{q} {r:.2f}x" for q, r in top[-3:]))


if __name__ == "__main__":
    main()
