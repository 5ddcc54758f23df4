#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB with views
registered for the sfDir tables, and compares schema + values.
"""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import os
    results = {}
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        got_rel = con.sql(f"SELECT * FROM '{path}/*.parquet'")
        got_cols = list(got_rel.columns)
        got = got_rel.fetchall()
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}"
            continue
        try:
            exp_rel = con.sql(oracle[name])
            exp_cols = list(exp_rel.columns)
            exp_types = [str(t) for t in exp_rel.types]
            exp = exp_rel.fetchall()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {str(e)[:160]}"
            continue
        got_types = [str(t) for t in got_rel.types]
        # Round-1 lesson: the driver's hash renders DECIMAL differently on
        # its two read paths even when values are identical — any decimal
        # column at the boundary is a latent hash mismatch.
        dec = [c for c, t in zip(got_cols, got_types) if "DECIMAL" in t] + \
              [c for c, t in zip(exp_cols, exp_types) if "DECIMAL" in t]
        if dec:
            results[name] = f"DECIMAL_AT_BOUNDARY cols={sorted(set(dec))}"
            continue
        if sorted(got_cols) != sorted(exp_cols):
            results[name] = f"COLS_MISMATCH got={got_cols} exp={exp_cols}"
            continue
        # driver sorts columns by name before hashing values
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = [tuple(norm(r[i]) for i in gidx) for r in got]
        e = [tuple(norm(r[i]) for i in eidx) for r in exp]
        tmap_g = {c: got_types[got_cols.index(c)] for c in got_cols}
        tmap_e = {c: exp_types[exp_cols.index(c)] for c in exp_cols}
        type_note = "" if tmap_g == tmap_e else f" TYPES g={tmap_g} e={tmap_e}"
        if len(g) != len(e):
            results[name] = f"ROWCOUNT got={len(g)} exp={len(e)}{type_note}"
            continue
        bad = None
        for i, (a, b) in enumerate(zip(g, e)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            results[name] = f"VALUE_DIFF row={bad[0]} got={bad[1]} exp={bad[2]}{type_note}"
        else:
            results[name] = f"OK rows={len(g)}{type_note}"
    # a query that crashed in Verify writes no output dir — surface it
    # instead of silently shrinking the total
    for name in oracle:
        if name not in results:
            results[name] = "MISSING_OUTPUT (query failed in Verify?)"
    npass = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in results.items():
        flag = "PASS" if v.startswith("OK") else ("INFO" if v.startswith("ROWS_ONLY") else "FAIL")
        print(f"[{flag}] {k}: {v}")
    nro = sum(1 for v in results.values() if v.startswith("ROWS_ONLY"))
    print(f"== {npass} OK / {nro} rows-only / {len(results) - npass - nro} failing / {len(results)} total")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
