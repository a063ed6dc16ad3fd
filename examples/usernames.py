"""Port of the reference's `examples/usernames.py` / `usernames-mt.py`
(derive a column with an expensive per-row function and upload the
result), Spark-first.

The reference's single-threaded version crawls rows with a cursor; its
`-mt` variant documents that multi-threading the JDBC connection FAILS
(`/root/reference/examples/usernames-mt.py:4-17`).  Spark removes the
limitation wholesale: the derivation is a parallel column expression and
there is no shared-connection hazard — the "-mt" file has no analog
because parallelism is the default execution model.

Run: python examples/usernames.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from lwetl_spark.api import SparkEtl  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    etl = SparkEtl(sf_dir)
    users = etl.query_df(
        """
        SELECT c_custkey,
               lower(regexp_replace(c_name, '[^A-Za-z0-9]+', '.')) AS username
        FROM customer
        """
    )
    # reference-style row-iterator surface still works for porting scripts
    sample = list(etl.query("SELECT c_name FROM customer LIMIT 3", return_type=dict))
    print(f"derived {users.count()} usernames; sample source rows: {sample}")


if __name__ == "__main__":
    main()
