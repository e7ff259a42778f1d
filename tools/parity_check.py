#!/usr/bin/env python3
"""Local replica of the driver's DuckDB compare (SURVEY.md §5.2).

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/parity_check.py /root/testdata/sf0.01 /tmp/verify_out [keys...]

For each query in <outDir>/oracle_sql.json: run the SQL in DuckDB against the
sf parquet tables, read the Spark parquet result, sort columns by name, and
compare values row by row (both sides already carry their total ORDER BY).
"""
import duckdb, json, os, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)

def norm(tbl):
    cols = sorted(tbl.column_names)
    t = tbl.select(cols)
    cols_py = [t.column(c).to_pylist() for c in cols]
    rows = [tuple(norm_cell(col[i]) for col in cols_py) for i in range(t.num_rows)]
    return cols, rows

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fail = ok = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            exp = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fail += 1
            continue
        pdir = f"{outdir}/{name}"
        if not os.path.isdir(pdir):
            print(f"FAIL {name}: no spark output at {pdir}")
            fail += 1
            continue
        got = con.execute(f"SELECT * FROM '{pdir}/*.parquet'").fetch_arrow_table()
        ec, er = norm(exp)
        gc, gr = norm(got)
        if ec != gc:
            print(f"FAIL {name}: columns spark={gc} oracle={ec}")
            fail += 1
            continue
        if er != gr:
            print(f"FAIL {name}: rows spark={len(gr)} oracle={len(er)}")
            shown = 0
            for i in range(min(len(gr), len(er))):
                if gr[i] != er[i]:
                    print(f"  row {i} {dict(zip(gc, gr[i]))}")
                    print(f"   vs   {dict(zip(ec, er[i]))}")
                    shown += 1
                    if shown >= 3:
                        break
            fail += 1
            continue
        ok += 1
        print(f"OK   {name} ({len(gr)} rows)")
    print(f"{'PARITY FAIL' if fail else 'PARITY OK'} ok={ok} fail={fail}")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
