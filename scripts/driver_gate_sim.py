"""Driver-gate simulation: plain SparkSession, __spark_entry__ contract,
hash-compare every queries() entry vs its oracle_sql() in DuckDB at sf0.01.

Usage (MUST run from the repo root — executor Python workers inherit cwd
to import the package):

    python scripts/driver_gate_sim.py                 # all queries
    python scripts/driver_gate_sim.py name1 name2 ... # just those

Env: SPARK_GRAFT_GATE_SF_DIR overrides the fixture dir (default sf0.01).
Exit 0 iff every checked query passes.
"""
import hashlib
import json
import sys
import time

import os

sys.path.insert(0, os.getcwd())

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def df_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    strs = sorted(
        "|".join(str(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for s in strs:
        h.update(s.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("driver-gate-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import duckdb

    import __spark_entry__ as entrymod

    e = entrymod.entry(spark)
    n = e.count()
    print(f"entry: {n} rows, schema ok", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    wanted = sys.argv[1:]
    if wanted:
        unknown = sorted(set(wanted) - set(queries))
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
        queries = {n: queries[n] for n in wanted}
    results = {}
    fails = []
    for name, fn in queries.items():
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            rec = {"spark_rows": len(s_rows)}
            if name in oracles:
                rel = con.execute(oracles[name])
                d_cols = [d[0] for d in rel.description]
                d_rows = rel.fetchall()
                rec["oracle_rows"] = len(d_rows)
                rec["rows_match"] = len(s_rows) == len(d_rows)
                rec["schema_match"] = sorted(s_cols) == sorted(d_cols)
                rec["hash_match"] = df_hash(s_rows, s_cols) == df_hash(d_rows, d_cols)
                ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
            else:
                rec["rows_only"] = True
                ok = len(s_rows) >= 0
            rec["sec"] = round(time.time() - t0, 2)
            rec["err"] = None
        except Exception as ex:
            rec = {"err": f"{type(ex).__name__}: {ex}"[:300]}
            ok = False
        results[name] = rec
        if not ok:
            fails.append(name)
        print(f"{'PASS' if ok else 'FAIL'} {name} {rec}", flush=True)

    print(json.dumps({"total": len(queries), "fails": fails}))
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
