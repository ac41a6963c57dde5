#!/usr/bin/env python3
"""Compare two bench JSON outputs (BENCH_r{N}.json or a raw Bench line).

Usage: python3 tools/bench_compare.py <old.json> <new.json> [threshold%]

Accepts either the driver's wrapper ({"tail": "...{json}..."}) or the
bare one-line JSON graft.Bench prints. Reports per-query deltas beyond
the threshold (default 30%, i.e. shared-box noise) and total movement.
"""
import json, re, sys


def load(path):
    raw = open(path).read()
    try:
        d = json.loads(raw)
        if "queries" in d:
            return d
        if "tail" in d:  # driver wrapper: bench line embedded in sbt tail
            m = re.search(r'\{"metric".*?\}(?=\n|\\n|$)', d["tail"])
            if m:
                return json.loads(m.group(0))
        raise SystemExit(f"{path}: no bench payload found")
    except json.JSONDecodeError:
        m = re.search(r'\{"metric".*\}', raw)
        if not m:
            raise SystemExit(f"{path}: no bench JSON line found")
        return json.loads(m.group(0))


def load_warn(d, label):
    """Flag runs made under external load: loadavg is recorded at bench
    finish (tools/bench_detail.json); a 1-min average well above the
    bench's own footprint means shared-box noise — BENCH_r03's phantom
    5-20x 'regressions' were exactly this. Returns the 1-min loadavg
    (None if unrecorded) so per-query rows can be annotated too —
    BENCH_r04's q_ip_lookup 'regression' (1.77->5.42s under loadavg
    3.11, quiet-box 1.11s) showed totals-only guarding isn't enough."""
    la = d.get("loadavg", "")
    if la:
        try:
            one_min = float(la.split()[0])
            if one_min > 4.0:
                print(f"WARNING: {label} ran under load (loadavg {la}) — "
                      f"treat per-query deltas as noise-suspect")
            return one_min
        except ValueError:
            pass
    return None


def calib_ratio(old, new):
    """r16: both runs may carry `calib_sha_mbps` ([start, end] of a
    fixed single-thread CPU unit). When present on both sides, the
    host-speed ratio new/old scales every wall comparison — a run on a
    20% slower host is NOT a 20% regression (same-day spread of 96-119s
    on identical code measured in NOTES_r16_bench.md). Uses each run's
    mean of start/end."""
    co, cn = old.get("calib_sha_mbps"), new.get("calib_sha_mbps")
    if not co or not cn:
        return None
    mo, mn = sum(co) / len(co), sum(cn) / len(cn)
    if mo <= 0 or mn <= 0:
        return None
    return mn / mo


def main(old_path, new_path, threshold=30.0):
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    old_la = load_warn(old, "old run")
    new_la = load_warn(new, "new run")
    cr = calib_ratio(old, new)
    if cr is not None:
        norm = new["value"] * cr
        print(f"host calibration: old {old['calib_sha_mbps']} -> "
              f"new {new['calib_sha_mbps']} MB/s (ratio {cr:.3f}); "
              f"new total host-normalized: {norm:.1f}s")
        if abs(cr - 1.0) > 0.10:
            print(f"WARNING: host speed differs {abs(cr-1)*100:.0f}% between "
                  f"runs — compare NORMALIZED totals, raw deltas are host-biased")
    # per-query noise annotation: any delta measured under load names
    # the loaded side so a phantom never reads as a real regression
    noisy_sides = [s for s, la in (("old", old_la), ("new", new_la))
                   if la is not None and la > 2.0]
    noise_tag = ""
    if noisy_sides:
        las = {"old": old_la, "new": new_la}
        noise_tag = "  [noise-suspect: " + ", ".join(
            f"{s} loadavg {las[s]:.2f}" for s in noisy_sides) + "]"
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({(new['value'] - old['value']) / old['value'] * 100:+.0f}%)  "
          f"queries: {len(oq)} -> {len(nq)}")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print("added:  ", ", ".join(f"{q} ({nq[q]:.2f}s)" for q in added))
    if removed:
        print("removed:", ", ".join(f"{q} ({oq[q]:.2f}s)" for q in removed))
    # r6+: "queries" values are per-query MEDIANS of `reps` runs in one
    # JVM; "query_ranges" carries [min,max] so a delta whose ranges
    # overlap reads as noise even before the loadavg annotation.
    o_rng, n_rng = old.get("query_ranges", {}), new.get("query_ranges", {})
    moved = []
    for q in sorted(set(oq) & set(nq)):
        a, b = oq[q], nq[q]
        if a <= 0:
            continue
        pct = (b - a) / a * 100
        if abs(pct) >= threshold and abs(b - a) >= 0.25:
            moved.append((pct, q, a, b))
    for pct, q, a, b in sorted(moved, reverse=True):
        rng = ""
        if q in o_rng or q in n_rng:
            def fr(r):
                return f"[{r[0]:.2f}..{r[1]:.2f}]" if r else "[-]"
            rng = f"  ranges {fr(o_rng.get(q))} -> {fr(n_rng.get(q))}"
            ov = (q in o_rng and q in n_rng
                  and o_rng[q][0] <= n_rng[q][1] and n_rng[q][0] <= o_rng[q][1])
            if ov:
                rng += " (overlap: noise-suspect)"
        print(f"  {q:28s} {a:6.2f}s -> {b:6.2f}s ({pct:+.0f}%){noise_tag}{rng}")
    if not moved:
        print(f"no per-query movement beyond {threshold:.0f}% (+0.25s floor)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 30.0)
