"""Engine addition (no reference analog): approximate-nearest-neighbor
search over the embeddings table — build a persisted IVF index once,
then probe it with a query batch.

Run: python examples/ann_search.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from lwetl_spark.catalog import load_table  # noqa: E402
from lwetl_spark.operators.similarity import (  # noqa: E402
    build_ivf_index,
    query_ivf_index,
)
from lwetl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="ann_example")
    emb = load_table(spark, sf_dir, "embeddings")

    path = tempfile.mkdtemp(prefix="ivf_example_") + "/index"
    build_ivf_index(emb, path)

    queries = emb.orderBy(F.xxhash64("vec_id")).limit(5)
    hits = query_ivf_index(spark, path, queries, k=3)
    for r in hits.orderBy("id", "rank").collect():
        print(f"query {r['id']:>6}  neighbor {r['neighbor_id']:>6}  cos {r['cos']:.6f}")


if __name__ == "__main__":
    main()
