#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
given SF dir, then run each oracle SQL in DuckDB over the same parquet
tables and compare row counts, sorted-column-name schemas, and value
hashes. Usage: check_oracle.py [sfDir] [outDir] [--skip-verify]
"""
import sys, os, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for f in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    h = hashlib.sha256()
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\x1e")
    return h.hexdigest()

results = {}
for name in sorted(oracle):
    pdir = os.path.join(out, name)
    status = {}
    try:
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        if not files:
            raise RuntimeError("no spark output")
        t = pa.concat_tables([pq.read_table(f) for f in files])
        spark_cols = t.column_names
        spark_rows = [tuple(col[i].as_py() for col in t.columns)
                      for i in range(t.num_rows)]
        d = con.execute(oracle[name])
        duck_cols = [c[0] for c in d.description]
        duck_rows = d.fetchall()
        status["spark_rows"] = len(spark_rows)
        status["duck_rows"] = len(duck_rows)
        status["schema_match"] = sorted(spark_cols) == sorted(duck_cols)
        if not status["schema_match"]:
            status["spark_cols"] = sorted(spark_cols)
            status["duck_cols"] = sorted(duck_cols)
        sh = table_hash(spark_rows, spark_cols)
        dh = table_hash(duck_rows, duck_cols)
        status["hash_match"] = sh == dh
        status["ok"] = (status["schema_match"] and status["hash_match"]
                        and len(spark_rows) == len(duck_rows))
        if not status["hash_match"] and len(spark_rows) == len(duck_rows):
            # show first differing row for debugging
            order_s = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
            order_d = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
            ss = sorted("\x1f".join(canon(r[i]) for i in order_s) for r in spark_rows)
            ds = sorted("\x1f".join(canon(r[i]) for i in order_d) for r in duck_rows)
            for a, b in zip(ss, ds):
                if a != b:
                    status["first_diff"] = {"spark": a[:400], "duck": b[:400]}
                    break
    except Exception as e:
        status["ok"] = False
        status["error"] = str(e)[:400]
    results[name] = status

n_ok = sum(1 for s in results.values() if s.get("ok"))
print(json.dumps(results, indent=1))
print(f"\n{n_ok}/{len(results)} queries match")
sys.exit(0 if n_ok == len(results) else 1)
