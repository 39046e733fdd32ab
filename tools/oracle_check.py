#!/usr/bin/env python3
"""Dev-only mirror of the driver's DuckDB-oracle correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the sfDir tables, and
compares schema-sorted columns + row-ordered values.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
            want = con.execute(sql).fetch_arrow_table()
            g_cols, w_cols = sorted(got.column_names), sorted(want.column_names)
            if g_cols != w_cols:
                raise AssertionError(f"columns {g_cols} != {w_cols}")
            g = got.select(g_cols).to_pylist()
            w = want.select(w_cols).to_pylist()
            if len(g) != len(w):
                raise AssertionError(f"rows {len(g)} != {len(w)}")
            for i, (gr, wr) in enumerate(zip(g, w)):
                gr = {k: normalize(v) for k, v in gr.items()}
                wr = {k: normalize(v) for k, v in wr.items()}
                if gr != wr:
                    raise AssertionError(f"row {i}: spark={gr} oracle={wr}")
            # schema check (arrow types)
            gs = {f.name: str(f.type) for f in got.schema}
            ws = {f.name: str(f.type) for f in want.schema}
            if gs != ws:
                print(f"[schema-warn] {name}: spark={gs} oracle={ws}")
            print(f"[PASS] {name} ({len(g)} rows)")
            n_pass += 1
        except Exception as e:
            msg = str(e)
            print(f"[FAIL] {name}: {msg[:500]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
