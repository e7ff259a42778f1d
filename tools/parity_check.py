#!/usr/bin/env python3
"""Local replica of the driver's DuckDB compare (SURVEY.md §5.2).

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/parity_check.py /root/testdata/sf0.01 /tmp/verify_out [keys...]

Driver-faithful rules (calibrated on CORRECTNESS_r01, which this replica's
looser str()-compare failed to predict — 31 false greens):
  1. Arrow type KINDS must match after sorting columns by name: int64 vs
     decimal128(38,0) is a FAIL even when every value is equal (the driver
     canonicalizes decimals through float — '42.0' vs '42'), while int32 vs
     int64 is benign (r01: win_row_number/str_basic passed with it).
  2. Cells are compared in float-canonical form: the driver canonicalizes
     numerics through the shortest float repr, so Decimal('38.10') hashes as
     '38.1'. Any Decimal/float cell whose str() differs from its
     repr(float()) is reported as REPR-RISK — a query emitting such a cell
     failed the driver hash in r01 with zero exceptions. The clean encoding
     is: never emit DECIMAL at all (scaled BIGINT / string instead).
"""
import duckdb, json, os, sys
from decimal import Decimal

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell_forms(v):
    """(hash_form, repr_risk): hash_form mimics the driver's float
    canonicalization; repr_risk is True when str and float-canonical forms
    diverge (the r01 failure class)."""
    if v is None:
        return "NULL", False
    if isinstance(v, float):
        return repr(v), False
    if isinstance(v, Decimal):
        f = repr(float(v))
        return f, str(v) != f
    if isinstance(v, list):
        forms = [cell_forms(x) for x in v]
        return "[" + ",".join(f for f, _ in forms) + "]", any(r for _, r in forms)
    return str(v), False


def kind(arrow_type):
    s = str(arrow_type)
    for k in ("int", "uint"):
        if s.startswith(k):
            return "int"
    for k in ("float", "double", "halffloat"):
        if s.startswith(k):
            return "float"
    if s.startswith("decimal"):
        return "decimal"
    if s.startswith("large_string"):
        return "string"
    return s


def norm(tbl):
    cols = sorted(tbl.column_names)
    t = tbl.select(cols)
    types = [kind(t.schema.field(c).type) for c in cols]
    cols_py = [t.column(c).to_pylist() for c in cols]
    risky_cols = set()
    rows = []
    for i in range(t.num_rows):
        row = []
        for j, col in enumerate(cols_py):
            form, risk = cell_forms(col[i])
            if risk:
                risky_cols.add(cols[j])
            row.append(form)
        rows.append(tuple(row))
    return cols, types, rows, risky_cols


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fail = ok = risky = 0
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
        ec, et, er, erisk = norm(exp)
        gc, gt, gr, grisk = norm(got)
        if ec != gc:
            print(f"FAIL {name}: columns spark={gc} oracle={ec}")
            fail += 1
            continue
        if et != gt:
            diffs = [f"{c}: spark={a} oracle={b}" for c, a, b in zip(gc, gt, et) if a != b]
            print(f"FAIL {name}: TYPE mismatch {diffs}")
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
        allrisk = erisk | grisk
        if allrisk:
            # values equal, but a decimal cell's str differs from its float
            # repr — exactly the class the driver hash-fails. Treat as FAIL.
            print(f"FAIL {name}: REPR-RISK decimal cols {sorted(allrisk)} "
                  f"(str != shortest-float-repr; driver hash would mismatch)")
            risky += 1
            fail += 1
            continue
        ok += 1
        print(f"OK   {name} ({len(gr)} rows)")
    print(f"{'PARITY FAIL' if fail else 'PARITY OK'} ok={ok} fail={fail} (repr-risk={risky})")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
