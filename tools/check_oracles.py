#!/usr/bin/env python3
"""Driver-style oracle checker (dev-side only — the library itself has no
Python dependency). Mirrors what the round driver does with Verify output:

  1. register each sf parquet table as a DuckDB view,
  2. run every oracle_sql.json query,
  3. compare against the Spark parquet in <outDir>/<name>:
     row count, sorted column names, and a value hash over rows sorted by
     all columns (columns ordered by name).

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>
"""
import hashlib
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "surrogatepass"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        spath = f"{out_dir}/{name}"
        if not os.path.isdir(spath) or name.startswith("_"):
            continue
        if name not in oracles:
            n_skip += 1
            print(f"  SKIP {name} (no oracle)")
            continue
        try:
            sp = con.execute(
                f"SELECT * FROM read_parquet('{spath}/*.parquet')")
            sp_cols = [d[0] for d in sp.description]
            sp_types = [str(d[1]) for d in sp.description]
            sp_rows = sp.fetchall()
            du = con.execute(oracles[name])
            du_cols = [d[0] for d in du.description]
            du_types = [str(d[1]) for d in du.description]
            du_rows = du.fetchall()
        except Exception as e:
            n_fail += 1
            print(f"  ERR  {name}: {e}")
            continue
        ok_rows = len(sp_rows) == len(du_rows)
        ok_schema = sorted(sp_cols) == sorted(du_cols)
        # dtype parity (sorted by column name) — a stricter driver may
        # compare these too
        sp_sig = sorted(zip(sp_cols, sp_types))
        du_sig = sorted(zip(du_cols, du_types))
        if ok_schema and sp_sig != du_sig:
            diff = [(a, b) for a, b in zip(sp_sig, du_sig) if a != b]
            print(f"  WARN {name} dtype drift: {diff}")
        ok_hash = ok_schema and table_hash(sp_rows, sp_cols) == table_hash(du_rows, du_cols)
        if ok_rows and ok_schema and ok_hash:
            n_pass += 1
            print(f"  PASS {name} ({len(sp_rows)} rows)")
        else:
            n_fail += 1
            print(f"  FAIL {name}: rows {len(sp_rows)}/{len(du_rows)} "
                  f"schema_ok={ok_schema} hash_ok={ok_hash}")
            if not ok_schema:
                print(f"       spark cols: {sorted(sp_cols)}")
                print(f"       duck  cols: {sorted(du_cols)}")
    print(f"pass={n_pass} fail={n_fail} no_oracle={n_skip}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
