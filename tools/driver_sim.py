"""Simulates the spark-graft driver: vanilla SparkSession (no engine tuning),
import __spark_entry__ by path, smoke entry(), then run every queries() entry
at sf0.01 against its oracle_sql() via DuckDB: row count + sorted-column
schema + order-insensitive value comparison."""
import importlib.util
import sys
import time

from pyspark.sql import SparkSession

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

# deliberately vanilla: the driver controls this session, not the engine
spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

t0 = time.time()
df = mod.entry(spark)
rows = df.collect()
print(f"SMOKE entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}, {time.time()-t0:.1f}s")
assert len(rows) > 0

import duckdb

con = duckdb.connect()
SF = "/root/testdata/sf0.01"
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

queries = mod.queries()
oracles = mod.oracle_sql()
fails = []
for name in sorted(queries):
    t0 = time.time()
    try:
        sdf = queries[name](spark, SF)
        srows = [tuple(r) for r in sdf.collect()]
        scols = [c.lower() for c in sdf.columns]
    except Exception as e:
        fails.append((name, f"spark error: {e}"))
        print(f"FAIL {name}: spark error {e}")
        continue
    if name not in oracles:
        print(f"rows-only {name}: {len(srows)} rows {time.time()-t0:.1f}s")
        continue
    res = con.execute(oracles[name])
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()
    status = []
    if sorted(scols) != sorted(dcols):
        status.append(f"SCHEMA {scols} vs {dcols}")
    if len(srows) != len(drows):
        status.append(f"ROWCOUNT {len(srows)} vs {len(drows)}")
    if not status:
        idx_s = sorted(range(len(scols)), key=lambda i: scols[i])
        idx_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
        canon = lambda v: v + 0.0 if isinstance(v, float) else v
        sset = sorted(tuple(canon(r[i]) for i in idx_s) for r in srows)
        dset = sorted(tuple(canon(r[i]) for i in idx_d) for r in drows)
        if sset != dset:
            diff = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
            status.append(f"VALUES {diff}")
    if status:
        fails.append((name, "; ".join(status)))
        print(f"FAIL {name}: {'; '.join(status)}")
    else:
        print(f"ok {name}: {len(srows)} rows {time.time()-t0:.1f}s")

print(f"\n{'='*60}\n{len(fails)} failures / {len(queries)} queries")
for n, s in fails:
    print(" -", n, s)
sys.exit(1 if fails else 0)
