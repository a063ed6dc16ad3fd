"""Reference-mirroring robustness tests (SURVEY §5.1):
- complex-UTF8 round trip (reference tests/test.py:203-245, "I can eat
  glass" corpus): emoji / RTL / CJK / 4-byte supplementary-plane strings
  must survive upload + re-read byte-exactly;
- binary blob round trip (tests/test.py:249-276): byte-exact;
- typed error paths (tests/test.py:70-91): unknown tables/sources raise
  typed exceptions, not silent empties.
"""

from __future__ import annotations

import pytest

UTF8_CORPUS = [
    "I can eat glass and it doesn't hurt me.",
    "Je peux manger du verre, ça ne me fait pas mal.",
    "Mogę jeść szkło i mi nie szkodzi.",
    "Я могу есть стекло, оно мне не вредит.",
    "أنا قادر على أكل الزجاج و هذا لا يؤلمني.",  # RTL
    "אני יכול לאכול זכוכית וזה לא מזיק לי.",  # RTL
    "我能吞下玻璃而不伤身体。",  # CJK
    "私はガラスを食べられます。それは私を傷つけません。",
    "𐌼𐌰𐌲 𐌲𐌻𐌴𐍃 𐌹̈𐍄𐌰𐌽",  # Gothic — 4-byte supplementary plane
    "🜀🜁🜂🜃 emoji soup 🍜🥢 ‍ zero-width joiner",
]


def test_utf8_roundtrip_uploader(spark, tmp_path):
    from lwetl_spark.sinks.uploader import Uploader, WritePolicy

    p = str(tmp_path / "glass.parquet")
    spark.createDataFrame([(0, "seed")], "id long, txt string").write.parquet(p)
    up = Uploader(spark, p, policy=WritePolicy.COMMIT)
    for i, s in enumerate(UTF8_CORPUS, start=1):
        up.insert({"id": i, "txt": s})
    up.commit()
    got = {r["id"]: r["txt"] for r in up.target().filter("id > 0").collect()}
    assert got == {i: s for i, s in enumerate(UTF8_CORPUS, start=1)}


def test_utf8_roundtrip_csv(spark, tmp_path):
    from lwetl_spark.sinks.formatter import write_csv
    from lwetl_spark.sources.csv import csv_source

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(UTF8_CORPUS)], "id long, txt string"
    )
    out = str(tmp_path / "glass_csv")
    write_csv(df, out, sep=";", header=True)
    back = csv_source(spark, out, delimiter=";", header=True)
    got = {int(r["ID"]): r["TXT"] for r in back.collect()}
    assert got == {i: s for i, s in enumerate(UTF8_CORPUS)}


def test_binary_blob_roundtrip(spark, tmp_path):
    """Byte-exact BLOB round trip incl. NUL bytes and high bytes
    (reference uploads a JPEG, tests/test.py:249-276)."""
    blob = bytes(range(256)) * 17 + b"\x00\xff\x00"
    from lwetl_spark.sinks.uploader import Uploader, WritePolicy

    p = str(tmp_path / "blobs.parquet")
    spark.createDataFrame([(0, b"seed")], "id long, payload binary").write.parquet(p)
    up = Uploader(spark, p, policy=WritePolicy.COMMIT)
    up.insert({"id": 1, "payload": blob})
    up.commit()
    got = up.target().filter("id = 1").collect()[0]["payload"]
    assert bytes(got) == blob


def test_unknown_table_raises(spark):
    from pyspark.errors import AnalysisException

    from lwetl_spark.api import SparkEtl

    etl = SparkEtl("/root/testdata/sf0.001", spark=spark)
    with pytest.raises(AnalysisException):
        etl.query_df("SELECT * FROM no_such_table").collect()
    with pytest.raises(KeyError):
        etl.get_columns("no_such_table")


def test_unknown_source_raises():
    from lwetl_spark.config import UnknownSourceError, resolve_source

    with pytest.raises(UnknownSourceError):
        resolve_source({"sources": {}, "alias": {}}, "nope")


def test_hll_sketch_store_merge_matches_partition_union(spark, tmp_path):
    """Sketches persisted per slice then union-merged must estimate the
    GLOBAL distinct count — including keys shared across slices (the
    property a plain sum of per-slice counts lacks)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i % 3, f"k{i % 500}") for i in range(5000)], "grp int, key string"
    )
    per = df.groupBy("grp").agg(F.hll_sketch_agg("key", 14).alias("sk"))
    path = str(tmp_path / "sketches")
    per.write.parquet(path)
    est = (
        spark.read.parquet(path)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    # 500 distinct keys global; per-slice sum would be ~1500
    assert abs(est - 500) <= 25
