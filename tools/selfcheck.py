#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Registers each test table as a DuckDB view over its parquet file, runs
every oracle in <verifyOutDir>/oracle_sql.json, loads the matching Spark
result parquet, sorts columns by name and rows by all values, and
compares cell-by-cell (floats to 1e-9 relative).
"""
import duckdb, glob, json, math, sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v

def key(row):
    return tuple((x is None, str(x)) for x in row)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); continue
        try:
            want = con.execute(sql).fetchall()
            wcols = [d[0] for d in con.description]
            # Driver-hash hazard: HUGEINT/DECIMAL oracle columns stringify
            # differently from Spark's int64/double on the driver side even
            # when values are equal. Force a FAIL so we add a CAST.
            types = con.execute(f"DESCRIBE {sql}").fetchall()
            hazard = [(c[0], c[1]) for c in types
                      if c[1] in ("HUGEINT", "UHUGEINT") or c[1].startswith("DECIMAL")]
            if hazard:
                print(f"FAIL {name}: oracle col type hazard {hazard} — CAST to BIGINT/DOUBLE")
                continue
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); continue
        got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
        gcols = [d[0] for d in con.description]
        if sorted(wcols) != sorted(gcols):
            print(f"FAIL {name}: cols spark={sorted(gcols)} oracle={sorted(wcols)}"); continue
        worder = sorted(range(len(wcols)), key=lambda i: wcols[i])
        gorder = sorted(range(len(gcols)), key=lambda i: gcols[i])
        wrows = sorted([tuple(norm(r[i]) for i in worder) for r in want], key=key)
        grows = sorted([tuple(norm(r[i]) for i in gorder) for r in got], key=key)
        if len(wrows) != len(grows):
            print(f"FAIL {name}: rows spark={len(grows)} oracle={len(wrows)}")
            for a, b in list(zip(wrows, grows))[:3]:
                if a != b: print(f"   oracle={a}\n   spark ={b}")
            continue
        bad = None
        for a, b in zip(wrows, grows):
            if a == b: continue
            ok = len(a) == len(b)
            if ok:
                for x, y in zip(a, b):
                    if x == y: continue
                    if isinstance(x, float) and isinstance(y, float):
                        if math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9): continue
                    ok = False; break
            if not ok:
                bad = (a, b); break
        if bad:
            print(f"FAIL {name}: first diff\n   oracle={bad[0]}\n   spark ={bad[1]}")
        else:
            print(f"ok   {name} ({len(grows)} rows)"); n_ok += 1
    print(f"== {n_ok}/{len(oracles)} pass")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
