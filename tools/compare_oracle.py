#!/usr/bin/env python
"""Local replica of the driver's t2 gate: run each oracle SQL in DuckDB
over the sf tables, read the Spark result parquet, sort columns by name,
compare row-by-row. Usage: compare_oracle.py <sfDir> <verifyOutDir>.

Dev-only tooling (runs on the driver-side python env); the shipped
library is pure Scala/Spark.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    try:
        import numpy as np
        if isinstance(v, np.generic):
            return norm(v.item())
    except ImportError:
        pass
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return tuple(norm(x) for x in v.tolist())
    except ImportError:
        pass
    import decimal
    if isinstance(v, decimal.Decimal):
        return v  # compares equal across precisions by value
    return v


def fetch_sorted(con, sql):
    rel = con.sql(sql)
    cols = sorted(rel.columns)
    idx = [rel.columns.index(c) for c in cols]
    types = [str(rel.types[i]) for i in idx]
    rows = rel.fetchall()
    return cols, types, [tuple(norm(r[i]) for i in idx) for r in rows]


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            wcols, wtypes, want = fetch_sorted(con, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        files = sorted(glob.glob(f"{outdir}/{name}/part-*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            gcols, gtypes, got = fetch_sorted(
                con, f"SELECT * FROM read_parquet({files!r})")
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}")
            n_fail += 1
            continue
        if gcols != wcols:
            print(f"FAIL {name}: columns spark={gcols} oracle={wcols}")
            n_fail += 1
            continue
        mism = [(c, g, w) for c, g, w in zip(wcols, gtypes, wtypes) if g != w]
        if mism:
            print(f"TYPE {name}: {mism}")  # informational; values still compared
        # Round-1 lesson: the DRIVER hash-compares, and its comparator
        # (a) disagrees on DECIMAL representation between engines and
        # (b) crashes on array/map cells. Value-equality here is NOT
        # enough for those types — fail loudly so they can't ship.
        unhashable = [(c, t)
                      for c, t in list(zip(wcols, gtypes)) + list(zip(wcols, wtypes))
                      if "DECIMAL" in t or "[]" in t or t.startswith(("MAP", "STRUCT"))]
        if unhashable:
            print(f"FAIL {name}: driver-unhashable output types {sorted(set(unhashable))} "
                  f"(emit DOUBLE / ','-joined strings instead)")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
            n_fail += 1
            continue
        bad = [(i, g, w) for i, (g, w) in enumerate(zip(got, want)) if g != w]
        if bad:
            i, g, w = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(got)} rows differ; "
                  f"first at row {i} (cols {wcols}):\n  spark={g}\n  duck ={w}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
