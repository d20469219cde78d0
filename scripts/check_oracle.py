#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the same
parquet tables, and compares: row count, sorted-by-name column set,
and cell values (rows sorted canonically, columns sorted by name).
This mirrors the driver's CORRECTNESS_r{N}.json check as closely as we
can infer it; exact floats are required (our queries are built to be
bit-equal).
"""
import json, math, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def type_class(t):
    """Collapse an arrow type string to the equivalence class the
    driver's pandas-based hasher uses."""
    # "interval" must match before the "int" prefix swallows it.
    for prefix, cls in [("interval", "interval"),
                        ("int", "int"), ("uint", "int"), ("bool", "bool"),
                        ("float", "float"), ("double", "float"),
                        ("halffloat", "float"), ("decimal", "decimal"),
                        ("string", "str"), ("large_string", "str"),
                        ("timestamp", "ts"), ("date", "date"),
                        ("binary", "bin"), ("large_binary", "bin")]:
        if t.startswith(prefix):
            return cls
    return t  # lists/structs/unknown: exact match required


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            rr.append(str(v))
        out.append(tuple(rr))
    out.sort()
    return out

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:  # local iteration on a subset (mirror of Verify's 3rd arg)
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got_tbl = con.execute(f"SELECT * FROM read_parquet({files!r})").arrow()
        got = [tuple(r.values()) for r in got_tbl.to_pylist()]
        got_cols = got_tbl.column_names
        got_types = {f.name: str(f.type) for f in got_tbl.schema}
        try:
            exp_tbl = con.execute(oracle[name]).arrow()
            exp = [tuple(r.values()) for r in exp_tbl.to_pylist()]
            exp_cols = exp_tbl.column_names
            exp_types = {f.name: str(f.type) for f in exp_tbl.schema}
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        # Type-strict the way the driver is: its hasher goes through a
        # pandas-style conversion where every integer width collapses
        # to int (int32 SUM vs BIGINT count both hash the same), but
        # DuckDB HUGEINT (arrow decimal128) coerces to float64 and
        # FAILS against a Spark BIGINT despite equal values (seen in
        # r02: q_simhash/q_fingerprint/q_multimodal_meta). So compare
        # type CLASSES: all ints one class, decimals their own class.
        type_diffs = {c: (got_types[c], exp_types[c]) for c in got_cols
                      if type_class(got_types[c]) != type_class(exp_types[c])}
        if type_diffs:
            print(f"FAIL {name}: column type classes differ (spark, oracle): {type_diffs}")
            n_fail += 1
            continue
        g, e = canon(got, got_cols), canon(exp, exp_cols)
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
        elif g != e:
            diffs = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: values differ, e.g. {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    missing = set(k for k in oracle) - set(
        os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d))
    if missing:
        print(f"== missing spark output dirs: {sorted(missing)}")
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None)
