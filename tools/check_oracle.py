#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir> [query ...]

For each query dir in <verify_outdir>: load the Spark parquet result,
run the oracle SQL from oracle_sql.json in DuckDB against views over
<sfdir>/*.parquet, sort columns by name + rows, and diff.

Stricter than round 2: also compares arrow dtype FAMILIES per column
(int vs float vs bool vs string vs date) — the driver's hash is
dtype-sensitive, so 44473.0 (double) vs 44473 (bigint) is a FAIL here
even though the python values compare equal.
"""
import sys, json, glob, math
import duckdb
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def family(t: pa.DataType) -> str:
    if pa.types.is_integer(t): return "int"
    if pa.types.is_floating(t): return "float"
    if pa.types.is_decimal(t): return "float"
    if pa.types.is_boolean(t): return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t): return "str"
    if pa.types.is_date(t): return "date"
    if pa.types.is_timestamp(t): return "ts"
    if pa.types.is_list(t) or pa.types.is_large_list(t): return "list"
    return str(t)

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = round(v, 9)
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in idx], out

def main(sfdir, outdir, only):
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver testdata tables are single files; ScaleUp fixtures are
        # Spark-written directories of part files — accept both
        p = f"{sfdir}/{t}.parquet"
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got_t = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        got_cols = got_t.column_names
        got = [tuple(r[c] for c in got_cols) for r in got_t.to_pylist()]
        try:
            exp_t = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        exp_cols = exp_t.column_names
        exp = [tuple(r[c] for c in exp_cols) for r in exp_t.to_pylist()]
        # dtype-family compare (driver hash is dtype-sensitive)
        gfam = {c: family(got_t.schema.field(c).type) for c in got_cols}
        efam = {c: family(exp_t.schema.field(c).type) for c in exp_cols}
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} vs {sorted(exp_cols)}")
            n_fail += 1; continue
        badf = [(c, gfam[c], efam[c]) for c in got_cols if gfam[c] != efam[c]]
        if badf:
            print(f"FAIL {name}: dtype mismatch {badf}"); n_fail += 1; continue
        gc, gr = canon(got, got_cols)
        ec, er = canon(exp, exp_cols)
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} vs {len(er)}"); n_fail += 1; continue
        if gr != er:
            bad = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            print(f"FAIL {name}: value diff, e.g. {bad}"); n_fail += 1; continue
        print(f"PASS {name} ({len(gr)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
