"""Port of the reference's `examples/extract-images.py` (dump a binary
column to files), Spark-first.

The reference fetches LOBs through the cursor and writes one file per
row driver-side.  Here binary payloads stay distributed: each partition
writes its own files (foreachPartition), so extraction scales with the
cluster instead of the driver's disk bandwidth.  The demo payloads are
text-as-binary (this environment has no media libs — the multimodal
stub convention).

Run: python examples/extract_binaries.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from lwetl_spark.api import SparkEtl  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="extract_")
    os.makedirs(out_dir, exist_ok=True)

    etl = SparkEtl(sf_dir)
    blobs = etl.query_df(
        "SELECT doc_id, CAST(text AS BINARY) AS payload FROM documents LIMIT 20"
    )

    def dump(rows) -> None:
        for r in rows:
            with open(os.path.join(out_dir, f"doc_{r['doc_id']}.bin"), "wb") as fh:
                fh.write(bytes(r["payload"]))

    n = blobs.count()  # cluster-correct census (executors write locally)
    blobs.foreachPartition(dump)
    # on a real cluster each executor writes to ITS OWN filesystem —
    # point out_dir at a shared mount (NFS/FUSE) there; this local-mode
    # listing is a verification, not the count
    local = len([f for f in os.listdir(out_dir) if f.endswith(".bin")])
    print(f"extracted {n} payloads -> {out_dir} ({local} visible locally)")


if __name__ == "__main__":
    main()
