#!/usr/bin/env python3
"""Dev-only mirror of the driver's DuckDB-oracle correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir> [query-name-regex]

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the sfDir tables, and
compares schema-sorted columns + row-ordered CANONICAL STRING RENDERINGS.

Hardened after the r13 q_kmeans_step regression (VERDICT r13 #2): the old
tool value-compared python objects (Decimal('1') == 1 passes) and only
WARNED on arrow-type mismatches, which is strictly weaker than the driver's
render-then-hash discipline — a representation divergence (decimal
precision, trailing scale, -0.0) passed locally and failed the driver.
Now:
  1. every value is rendered to a canonical string (md5-hashed per query)
     so rendering divergences fail, not just value divergences;
  2. an arrow-type mismatch between the Spark output and the oracle is a
     hard FAIL;
  3. decimal output columns with precision > 18 are a hard FAIL on EITHER
     side — int128-backed decimals proved driver-hash-unsafe as output
     columns even when both engines agree on values (q_kmeans_step, r13).
"""
import hashlib
import json
import math
import re
import sys
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Decimals above this precision are int128-backed and the driver's hasher
# diverges on them even when values match (r13 q_kmeans_step).
MAX_SAFE_DECIMAL_PRECISION = 18

DECIMAL_RE = re.compile(r"decimal\d*\((\d+),\s*-?\d+\)")


def render(v):
    """Canonical string rendering — the local stand-in for the driver's
    render-then-hash. Distinguishes -0.0 from 0.0, preserves decimal
    scale (str(Decimal('1.20')) == '1.20'), renders NaN stably."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr distinguishes -0.0 and is shortest-round-trip
        return repr(v)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, list):
        return "[" + ",".join(render(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}:{render(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def unsafe_decimal_cols(schema):
    bad = []
    for f in schema:
        for m in DECIMAL_RE.finditer(str(f.type)):
            if int(m.group(1)) > MAX_SAFE_DECIMAL_PRECISION:
                bad.append(f"{f.name}:{f.type}")
    return bad


def table_hash(tbl, cols):
    h = hashlib.md5()
    for row in tbl.select(cols).to_pylist():
        h.update("\x1f".join(render(row[c]) for c in cols).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main(sf_dir, out_dir, name_re=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if name_re and not re.search(name_re, name):
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
            want = con.execute(sql).fetch_arrow_table()
            g_cols, w_cols = sorted(got.column_names), sorted(want.column_names)
            if g_cols != w_cols:
                raise AssertionError(f"columns {g_cols} != {w_cols}")
            # driver-hash-unsafe output types fail on EITHER side
            bad = unsafe_decimal_cols(got.schema) + unsafe_decimal_cols(
                want.schema)
            if bad:
                raise AssertionError(
                    f"driver-hash-unsafe decimal precision > "
                    f"{MAX_SAFE_DECIMAL_PRECISION} in output: {bad}")
            # arrow-type mismatch is a hard FAIL (was a warn pre-r14)
            gs = {f.name: str(f.type) for f in got.schema}
            ws = {f.name: str(f.type) for f in want.schema}
            if gs != ws:
                diff = {k: (gs[k], ws[k]) for k in gs if gs[k] != ws.get(k)}
                raise AssertionError(f"schema mismatch (spark, oracle): {diff}")
            if got.num_rows != want.num_rows:
                raise AssertionError(f"rows {got.num_rows} != {want.num_rows}")
            gh, wh = table_hash(got, g_cols), table_hash(want, w_cols)
            if gh != wh:
                # locate the first diverging row for the error message
                g = got.select(g_cols).to_pylist()
                w = want.select(w_cols).to_pylist()
                for i, (gr, wr) in enumerate(zip(g, w)):
                    grs = {k: render(v) for k, v in gr.items()}
                    wrs = {k: render(v) for k, v in wr.items()}
                    if grs != wrs:
                        raise AssertionError(
                            f"row {i}: spark={grs} oracle={wrs}")
                raise AssertionError(f"hash {gh} != {wh} (no row diff?!)")
            print(f"[PASS] {name} ({got.num_rows} rows)")
            n_pass += 1
        except Exception as e:
            msg = str(e)
            print(f"[FAIL] {name}: {msg[:500]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
