#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB against the same
parquet tables, and compares row count, column names, and values
(column-name-sorted, like the driver).
"""
import json, math, sys, os
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return s
    return repr(v)

def table_rows(tbl, cols):
    pydict = {c: tbl.column(c).to_pylist() for c in cols}
    n = tbl.num_rows
    return [tuple(canon(pydict[c][i]) for c in cols) for i in range(n)]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        stbl = ds.dataset(spark_path, format="parquet").to_table()
        try:
            dtbl = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        scols, dcols = sorted(stbl.column_names), sorted(dtbl.column_names)
        if scols != dcols:
            print(f"FAIL {name}: cols spark={scols} duck={dcols}")
            n_fail += 1
            continue
        if stbl.num_rows != dtbl.num_rows:
            print(f"FAIL {name}: rows spark={stbl.num_rows} duck={dtbl.num_rows}")
            n_fail += 1
            continue
        srows = table_rows(stbl, scols)
        drows = table_rows(dtbl, scols)
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first at {i}:")
            print(f"  spark: {a}\n  duck:  {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({stbl.num_rows} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
