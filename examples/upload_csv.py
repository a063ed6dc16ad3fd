"""Port of the reference's `examples/upload-csv.py` (bulk-load a CSV
file into a table with commit batching), Spark-first.

The reference parses the CSV driver-side and inserts row-by-row with a
commit every N rows (`/root/reference/examples/upload-csv.py`).  Here
the CSV is a distributed source with schema projection against the
target and the load is one append — commit batching is a transaction
artifact Spark's atomic write replaces (WritePolicy.PLAN still gives
the dry-run counts).

Run: python examples/upload_csv.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, ".")

from lwetl_spark.api import SparkEtl  # noqa: E402
from lwetl_spark.sinks.uploader import Uploader, WritePolicy  # noqa: E402
from lwetl_spark.sources.csv import csv_source  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="upload_csv_")
    os.makedirs(out_dir, exist_ok=True)

    etl = SparkEtl(sf_dir)
    # stage a CSV export of region to load back (stand-in for the user's file)
    csv_path = os.path.join(out_dir, "region.csv")
    etl.tables["region"].toPandas().to_csv(csv_path, index=False)

    target = os.path.join(out_dir, "region_table")
    etl.tables["region"].limit(0).write.parquet(target)

    df = csv_source(etl.spark, csv_path, delimiter=",")
    up = Uploader(etl.spark, target, policy=WritePolicy.COMMIT)
    up.insert_df(df)
    n = up.target().count()
    print(f"loaded {n} rows from {csv_path} into {target}")


if __name__ == "__main__":
    main()
