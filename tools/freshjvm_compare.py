#!/usr/bin/env python3
"""Decompose same-JVM catalog bench totals into JIT-decay vs everything
else, using the r13 fresh-JVM-per-query reference.

Inputs (all per-query maps of median seconds):
  A = tools/bench_freshjvm_r13.json   (fresh JVM per query, this box)
  B = a same-JVM full-catalog reading on the SAME code + box
      (tools/bench_local_r13.json, produced right after A)
  C = optionally an older lineage file for host-generation context
      (tools/bench_local_r12b.json)

Same-JVM minus fresh-JVM on the common set IS the session effect
(JIT-profile decay + block-manager/GC residue): same code, same box,
same day, same warmup protocol — the only variable is how many queries
ran before this one in the same JVM.

Usage: python3 tools/freshjvm_compare.py [A] [B] [C]
"""
import json, sys

def load(p):
    with open(p) as f:
        d = json.load(f)
    return d.get("queries", {})

def main():
    a_path = sys.argv[1] if len(sys.argv) > 1 else "tools/bench_freshjvm_r13.json"
    b_path = sys.argv[2] if len(sys.argv) > 2 else "tools/bench_local_r13.json"
    c_path = sys.argv[3] if len(sys.argv) > 3 else "tools/bench_local_r12b.json"
    A, B = load(a_path), load(b_path)
    common = sorted(set(A) & set(B))
    fa = sum(A[q] for q in common if A[q] >= 0)
    fb = sum(B[q] for q in common if B[q] >= 0)
    print(f"common set: {len(common)} queries")
    print(f"fresh-JVM total   : {fa:8.2f} s   ({a_path})")
    print(f"same-JVM total    : {fb:8.2f} s   ({b_path})")
    print(f"session effect    : {fb - fa:+8.2f} s  ({(fb - fa) / fa * 100:+.1f}% of fresh)")
    movers = sorted(((B[q] - A[q], q) for q in common
                     if A[q] > 0.05 and B[q] >= 0), reverse=True)
    print("\ntop same-JVM inflation (sec, ratio):")
    for d, q in movers[:15]:
        print(f"  {q:36s} fresh {A[q]:6.3f}  samejvm {B[q]:6.3f}  "
              f"+{d:6.3f}  x{B[q]/A[q]:.2f}")
    print("\ntop same-JVM *deflation* (cached/JIT-warm wins):")
    for d, q in movers[-5:]:
        print(f"  {q:36s} fresh {A[q]:6.3f}  samejvm {B[q]:6.3f}  "
              f"{d:+6.3f}  x{B[q]/A[q]:.2f}")
    try:
        C = load(c_path)
        cc = sorted(set(A) & set(C))
        fa2 = sum(A[q] for q in cc if A[q] >= 0)
        fc = sum(C[q] for q in cc if C[q] >= 0)
        print(f"\nvs older lineage ({c_path}): common {len(cc)}")
        print(f"fresh-JVM {fa2:.2f} s vs r12 quiet same-JVM {fc:.2f} s "
              f"({(fc - fa2) / fa2 * 100:+.1f}%)")
    except OSError:
        pass

if __name__ == "__main__":
    main()
