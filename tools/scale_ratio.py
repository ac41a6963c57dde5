#!/usr/bin/env python3
"""Per-query scale-ratio table between two Bench detail artifacts
(the r7 discipline): ratios sorted descending, flagged past a
threshold, with the calibration fields so host drift between the two
runs is visible in the same read.

Usage: scale_ratio.py <m1.json> <m10.json> [threshold=4.0]
"""
import json
import sys


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 4.0
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    rows = []
    for q in common:
        if qa[q] <= 0 or qb[q] <= 0:
            print(f"SKIP {q}: non-positive median ({qa[q]}, {qb[q]})")
            continue
        rows.append((qb[q] / qa[q], q, qa[q], qb[q]))
    rows.sort(reverse=True)
    ta = sum(r[2] for r in rows)
    tb = sum(r[3] for r in rows)
    print(f"n={len(rows)}  total {ta:.2f}s -> {tb:.2f}s = {tb/ta:.2f}x")
    ratios = sorted(r[0] for r in rows)
    med = ratios[len(ratios) // 2]
    print(f"median ratio {med:.2f}x; {sum(1 for r in ratios if r < 3)} queries < 3x")
    print(f"calib m1 {a['calib_sha_mbps']}  m10 {b['calib_sha_mbps']}")
    print(f"\n>= {thr}x:")
    for r, q, x, y in rows:
        if r >= thr:
            print(f"| {q} | {x:.2f} | {y:.2f} | {r:.1f}x |")


if __name__ == "__main__":
    main()
