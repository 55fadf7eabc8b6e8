#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness compare.

Usage: python3 scripts/local_correctness.py /tmp/verify_out /root/testdata/sf0.01

Compares each <out>/<query> parquet against oracle_sql.json run in DuckDB.
This replica reproduces the DRIVER's compare path (the round-4 lesson:
a friendlier local path masked four driver-red rows):
  * both sides go through pandas DataFrames;
  * rows are sorted with df.sort_values over ALL columns (so a bare
    array-typed output column raises the driver's exact
    "unhashable type: 'numpy.ndarray'" error);
  * values are rendered with plain str() — NO float rounding — so a
    DuckDB HUGEINT that pandas renders as float64 ("531.0") mismatches a
    Spark BIGINT ("531") here exactly as it does in the driver;
  * per-query exceptions are caught into an "err" field, like the driver.
"""
import sys, os, json, hashlib, traceback
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def df_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    df = df[cols].sort_values(by=cols).reset_index(drop=True)
    h = hashlib.sha256()
    for row in df.itertuples(index=False, name=None):
        h.update("\x1f".join(str(v) for v in row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        res = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            spark_df = pq.read_table(f"{out_dir}/{name}").to_pandas()
            res["spark_rows"] = len(spark_df)
            if name not in oracles:
                res["err"] = "no_oracle"
                results[name] = res
                continue
            oracle_df = con.execute(oracles[name]).df()
            res["oracle_rows"] = len(oracle_df)
            res["rows_match"] = len(spark_df) == len(oracle_df)
            res["schema_match"] = sorted(spark_df.columns) == sorted(oracle_df.columns)
            res["hash_match"] = df_hash(spark_df) == df_hash(oracle_df)
        except Exception:
            res["err"] = traceback.format_exc()[-2000:]
        results[name] = res
    bad = {k: v for k, v in results.items()
           if v.get("err") or not (v["rows_match"] and v["schema_match"] and v["hash_match"])}
    print(json.dumps(results, indent=1))
    print(f"\n{len(results) - len(bad)}/{len(results)} green")
    if bad:
        print("RED:", json.dumps(bad, indent=1))
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
