"""Simulates the spark-graft driver: vanilla SparkSession (no engine tuning),
import __spark_entry__ by path, smoke entry(), then run every queries() entry
at sf0.01 against its oracle_sql() via DuckDB: row count + sorted-column
schema + order-insensitive value comparison.

Canonicalization deliberately mirrors the REAL driver's pandas path
(`pd.DataFrame` -> columns sorted by name -> `sort_values` over all
columns): r02 proved the old Python-tuple sort was more lenient than the
driver — it happily ordered list-valued cells and year-9999 datetimes that
the driver's pandas canon rejects (`TypeError: unhashable type: 'list'`,
`OutOfBoundsDatetime`).  Any query whose output shape the driver cannot
canonicalize must FAIL here too.

Usage: python tools/driver_sim.py [query_name ...]
    With names given, runs only those queries (targeted re-check);
    without, runs the full catalog.
"""
import importlib.util
import os
import sys
import time

from pyspark.sql import SparkSession


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


mod = _load("__spark_entry__", "/root/repo/__spark_entry__.py")
_canon_mod = _load(
    "driver_canon", os.path.join(os.path.dirname(os.path.abspath(__file__)), "driver_canon.py")
)
canon, records = _canon_mod.canon, _canon_mod.records

# deliberately vanilla: the driver controls this session, not the engine
spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

only = set(sys.argv[1:])

if not only:
    t0 = time.time()
    df = mod.entry(spark)
    rows = df.collect()
    print(f"SMOKE entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}, {time.time()-t0:.1f}s")
    assert len(rows) > 0

import duckdb

con = duckdb.connect()
#: SPARK_GRAFT_SIM_SF overrides the parity scale — the real driver runs
#: sf0.01; SCALE.md's order-of-magnitude-up spot-check runs the heavy
#: keys at sf0.1 through the SAME oracle comparison (VERDICT r5 #6)
SF = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

queries = mod.queries()
oracles = mod.oracle_sql()
if only:
    unknown = only - set(queries)
    if unknown:
        sys.exit(f"unknown query names: {sorted(unknown)}")
    queries = {k: v for k, v in queries.items() if k in only}

fails = []
for name in sorted(queries):
    t0 = time.time()
    try:
        sdf = queries[name](spark, SF)
        srows = [tuple(r) for r in sdf.collect()]
        scols = [c.lower() for c in sdf.columns]
        s_canon = canon(srows, scols)
    except Exception as e:
        fails.append((name, f"spark/canon error: {e}"))
        print(f"FAIL {name}: spark/canon error {e}")
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
        try:
            d_canon = canon(drows, dcols)
        except Exception as e:
            fails.append((name, f"oracle canon error: {e}"))
            print(f"FAIL {name}: oracle canon error {e}")
            continue
        sset, dset = records(s_canon), records(d_canon)
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
