#!/usr/bin/env python3
"""Fresh-JVM-per-query catalog bench reference (r13, verdict task 2).

The r12 round isolated a same-JVM JIT-profile-decay mechanism
(tools/minhash_session_decay_r12.json: 7x CPU on the same query after a
full catalog run), which means the single-JVM BENCH_rN totals carry a
catalog-size-dependent bias. This runner launches ONE JVM PER QUERY
(graft.Bench already takes a query-name filter and does its own warmup
before timing), so every query is measured in a pristine JIT profile —
the reference the session-decay adjudication needs.

Usage:
  sbt -batch compile   # once
  python3 tools/bench_freshjvm.py [out.json] [--reps N] [--only a,b,c]

The per-query JVM flags mirror build.sbt's forked-run settings exactly
(add-opens, heap, code cache), so the only variable vs the driver bench
is JVM freshness.
"""
import json, os, subprocess, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CP = os.path.join(REPO, "target", "scala-2.13", "classes") + ":/opt/spark/jars/*"
ADD_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]
JVM = ["java"]
for p in ADD_OPENS:
    JVM += ["--add-opens", p + "=ALL-UNNAMED"]
JVM += [
    "-Xmx" + os.environ.get("SPARK_DRIVER_MEM", "8g"),
    "-XX:ReservedCodeCacheSize=" + os.environ.get("SPARK_CODE_CACHE", "512m"),
    # r16 build.sbt mirror: the recompilation give-up stays disabled here
    # too (irrelevant to a single-query JVM, kept for exact flag parity)
    "-XX:PerMethodRecompilationCutoff=-1",
    "-XX:PerBytecodeRecompilationCutoff=-1",
    "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
    "-cp", CP,
]

def run(args, env, timeout=1800):
    return subprocess.run(JVM + args, capture_output=True, text=True,
                          timeout=timeout, env=env, cwd=REPO)

def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else os.path.join(REPO, "tools", "bench_freshjvm_r13.json")
    reps = "3"
    only = None
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--reps":
            reps = argv[i + 1]
        if a == "--only":
            only = argv[i + 1].split(",")

    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    env["SPARK_GRAFT_BENCH_REPS"] = reps

    names = run(["graft.Bench", "--list"], env).stdout.split()
    if only:
        names = [n for n in names if n in set(only)]
    print(f"[freshjvm] {len(names)} queries, reps={reps}", flush=True)

    queries, ranges, errors = {}, {}, {}
    t_start = time.time()
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            r = run(["graft.Bench", name], env)
            line = [l for l in r.stdout.splitlines() if l.startswith('{"metric"')]
            if not line:
                raise RuntimeError("no metric line: " + r.stdout[-400:] + r.stderr[-400:])
            d = json.loads(line[-1])
            # the per-run detail file has this query's median and range
            with open(os.path.join(REPO, "tools", "bench_detail.json")) as f:
                det = json.load(f)
            queries[name] = det["queries"][name]
            ranges[name] = det["query_ranges"][name]
            if d.get("errors", 0):
                errors[name] = d["errors"]
        except Exception as e:
            errors[name] = str(e)[:200]
            queries[name] = -1.0
        print(f"[freshjvm] {i+1}/{len(names)} {name}: {queries[name]:.3f}s "
              f"(jvm {time.time()-t0:.1f}s)", flush=True)

    total = sum(v for v in queries.values() if v >= 0)
    try:
        loadavg = open("/proc/loadavg").read().split()[:3]
    except OSError:
        loadavg = []
    result = {
        "metric": "total_freshjvm", "value": round(total, 3), "unit": "sec",
        "n_queries": len(names), "reps": int(reps),
        "errors": errors, "sf": env["SPARK_GRAFT_SF_DIR"],
        "protocol": "one JVM per query; graft.Bench warmup+median inside each JVM",
        "wall_sec": round(time.time() - t_start, 1),
        "loadavg_end": " ".join(loadavg),
        "queries": queries, "query_ranges": ranges,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(f"[freshjvm] total={total:.2f}s over {len(names)} queries -> {out_path}",
          flush=True)

if __name__ == "__main__":
    main()
