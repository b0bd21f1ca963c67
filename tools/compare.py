#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify first, then
   compare each <outDir>/<name> parquet against the DuckDB oracle in
   <outDir>/oracle_sql.json over the same sf tables.

   Usage: python3 tools/compare.py <sfDir> <outDir> [query ...]
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t)), [cols[i] for i in order]

def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            gcols, grows = got.columns, got.fetchall()
            want = con.sql(sql)
            wcols, wrows = want.columns, want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(c.lower() for c in gcols) != sorted(c.lower() for c in wcols):
            print(f"FAIL {name}: schema {sorted(gcols)} vs {sorted(wcols)}")
            n_fail += 1
            continue
        g, _ = canon(grows, [c.lower() for c in gcols])
        w, _ = canon(wrows, [c.lower() for c in wcols])
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            n_fail += 1
            continue
        bad = None
        for i, (gr, wr) in enumerate(zip(g, w)):
            if not all(eq(a, b) for a, b in zip(gr, wr)):
                bad = (i, gr, wr)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}: got {bad[1]} want {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
