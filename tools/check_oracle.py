#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (driver-side tooling,
not part of the Spark library). Usage:

  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out

Compares each <name>.parquet dumped by graft.Verify against the DuckDB
result of oracle_sql.json[name]: schema (sorted column names), row count,
and value hash.
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    import numpy as np
    from decimal import Decimal
    for row in df.itertuples(index=False):
        for v in row:
            if isinstance(v, (np.integer,)):
                v = int(v)
            elif isinstance(v, Decimal):
                v = round(float(v), 6)
            elif isinstance(v, (float, np.floating)):
                v = round(float(v), 6)
            h.update(repr(v).encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    json_out = sys.argv[3] if len(sys.argv) > 3 else None  # driver-format artifact
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    records = {}
    for name in sorted(oracle):
        rec = {"rows_match": False, "schema_match": False, "hash_match": False,
               "spark_rows": None, "oracle_rows": None, "err": None}
        records[name] = rec
        try:
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            if not files:
                print(f"FAIL {name}: no spark output"); rec["err"] = "no spark output"; n_fail += 1; continue
            got = norm(duckdb.sql(f"SELECT * FROM read_parquet({files!r})").df())
            exp = norm(con.sql(oracle[name]).df())
            rec["spark_rows"], rec["oracle_rows"] = len(got), len(exp)
            rec["schema_match"] = list(got.columns) == list(exp.columns)
            rec["rows_match"] = len(got) == len(exp)
            if not rec["schema_match"]:
                print(f"FAIL {name}: cols {list(got.columns)} != {list(exp.columns)}"); n_fail += 1; continue
            if not rec["rows_match"]:
                print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
            hg, he = value_hash(got), value_hash(exp)
            rec["hash_match"] = hg == he
            if hg != he:
                print(f"FAIL {name}: hash {hg} != {he}")
                merged = got.compare(exp) if got.shape == exp.shape else None
                if merged is not None and not merged.empty:
                    print(merged.head(5))
                n_fail += 1
                continue
            print(f"ok   {name} ({len(got)} rows)")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            rec["err"] = f"{type(e).__name__}: {e}"
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(records, f, indent=2)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
