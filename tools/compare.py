#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify first, then
   compare each <outDir>/<name> parquet against the DuckDB oracle in
   <outDir>/oracle_sql.json over the same sf tables.

   DTYPE-STRICT (round-5): the driver reads the Spark parquet through
   pyarrow/pandas (DECIMAL -> object Decimal, int64 -> int64) but runs the
   oracle through DuckDB fetchdf (HUGEINT/DECIMAL -> float64).  Identical
   values with different dtypes can therefore never hash-match on the
   driver, and a value-only comparator (int 27 == float 27.0) cannot see
   it — that blind spot shipped q73 red in r02/r03 and q94 red in r04.
   This version loads each side the way the driver does and fails on any
   numeric-kind mismatch (int vs float vs Decimal-object) before values
   are even compared.

   Usage: python3 tools/compare.py <sfDir> <outDir> [query ...]
"""
import datetime as dt
import json, math, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# numpy dtype.kind -> comparison class. int vs float vs object are strictly
# distinct (the driver hash is computed over typed values); datetime64 units
# (ns vs us) collapse to one class.
KINDCLASS = {"i": "int", "u": "int", "f": "float", "b": "bool",
             "M": "time", "m": "time"}


def kindclass(dtype):
    return KINDCLASS.get(dtype.kind, "obj")


def obj_is_temporal(series):
    for v in series:
        if v is not None and not (isinstance(v, float) and math.isnan(v)):
            return isinstance(v, (dt.date, dt.datetime))
    return False


def dtype_mismatches(gdf, wdf):
    """Strict per-column dtype-class check, driver-style. Returns a list of
       (col, got_class, want_class) mismatches."""
    g = {c.lower(): gdf[c] for c in gdf.columns}
    w = {c.lower(): wdf[c] for c in wdf.columns}
    bad = []
    for c in sorted(set(g) & set(w)):
        gc, wc = kindclass(g[c].dtype), kindclass(w[c].dtype)
        if gc == wc:
            continue
        # pyarrow surfaces DATE32 as object(datetime.date) while DuckDB
        # fetchdf surfaces DATE as datetime64 — the driver treats these as
        # equal, so allow time<->obj only when the object side really holds
        # temporal values.
        pair = {gc, wc}
        if pair == {"time", "obj"}:
            objside = g[c] if gc == "obj" else w[c]
            if obj_is_temporal(objside):
                continue
        bad.append((c, gc, wc))
    return bad


def canon(df):
    cols = sorted(df.columns, key=lambda c: c.lower())
    df = df[cols]
    out = []
    for r in df.itertuples(index=False, name=None):
        out.append(tuple(None if (v is None or (isinstance(v, float) and math.isnan(v))
                                  or v is pd.NaT) else v for v in r))
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t)), [c.lower() for c in cols]


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, (dt.date, dt.datetime)) or isinstance(b, (dt.date, dt.datetime)):
        try:
            return pd.Timestamp(a) == pd.Timestamp(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
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
        # Verify writes <name>/_ERROR.json when the query itself threw —
        # surface that message (pyarrow would otherwise read the marker-only
        # dir as an EMPTY frame and report a misleading schema mismatch)
        import os
        if os.path.exists(f"{out_dir}/{name}/_ERROR.json"):
            marker = json.load(open(f"{out_dir}/{name}/_ERROR.json"))
            print(f"FAIL {name}: query error {marker.get('error', '')[:200]}")
            n_fail += 1
            continue
        try:
            # got: pyarrow/pandas (the driver's read of the Spark dump);
            # pyarrow datasets skip _SUCCESS and other _-prefixed files
            gdf = pd.read_parquet(f"{out_dir}/{name}")
            # want: DuckDB fetchdf (the driver's oracle path)
            wdf = con.sql(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: error {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(c.lower() for c in gdf.columns) != sorted(c.lower() for c in wdf.columns):
            print(f"FAIL {name}: schema {sorted(gdf.columns)} vs {sorted(wdf.columns)}")
            n_fail += 1
            continue
        dbad = dtype_mismatches(gdf, wdf)
        if dbad:
            print(f"FAIL {name}: dtype " + "; ".join(
                f"{c}: spark={gc} oracle={wc}" for c, gc, wc in dbad))
            n_fail += 1
            continue
        g, _ = canon(gdf)
        w, _ = canon(wdf)
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
