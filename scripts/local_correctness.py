#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness compare.

Usage: python3 scripts/local_correctness.py /tmp/verify_out /root/testdata/sf0.01
Compares each <out>/<query> parquet against oracle_sql.json run in DuckDB:
row count, sorted column names, and a hash of the value matrix (columns
sorted by name, rows sorted lexicographically, floats rounded to 9 sig figs).
"""
import sys, os, json, hashlib, math
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for row in mat:
        h.update("\x1f".join(row).encode())
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
        spark_t = pq.read_table(f"{out_dir}/{name}")
        s_cols = list(spark_t.schema.names)
        s_rows = [tuple(r[c] for c in s_cols) for r in spark_t.to_pylist()]
        if name not in oracles:
            results[name] = {"err": "no_oracle", "spark_rows": len(s_rows)}
            continue
        try:
            cur = con.execute(oracles[name])
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as e:
            results[name] = {"err": f"oracle_sql_error: {e}", "spark_rows": len(s_rows)}
            continue
        res = {
            "rows_match": len(s_rows) == len(o_rows),
            "schema_match": sorted(s_cols) == sorted(o_cols),
            "hash_match": table_hash(s_cols, s_rows) == table_hash(o_cols, o_rows),
            "spark_rows": len(s_rows),
            "oracle_rows": len(o_rows),
        }
        results[name] = res
    bad = {k: v for k, v in results.items() if v.get("err") or not (v["rows_match"] and v["schema_match"] and v["hash_match"])}
    print(json.dumps(results, indent=1))
    print(f"\n{len(results) - len(bad)}/{len(results)} green")
    if bad:
        print("RED:", json.dumps(bad, indent=1))
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
