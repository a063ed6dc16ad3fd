"""Round-trip tests for file-format sources (SURVEY §5: the reference's
import→table→re-read idiom, tests/test.py:164-199, incl. UTF-8 parity)."""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_CORRECT


@pytest.fixture()
def tmp(tmp_path):
    return str(tmp_path)


def test_csv_roundtrip(spark, tmp):
    from lwetl_spark.sinks.formatter import write_csv
    from lwetl_spark.sources.csv import csv_source
    from lwetl_spark.catalog import load_table

    docs = load_table(spark, SF_CORRECT, "documents").select("doc_id", "lang", "source")
    out = os.path.join(tmp, "docs_csv")
    write_csv(docs, out, sep=";")
    back = csv_source(spark, out, delimiter=";")
    assert back.columns == ["DOC_ID", "LANG", "SOURCE"]
    assert back.count() == docs.count()
    orig = {(r[0], r[1], r[2]) for r in docs.collect()}
    rt = {(r[0], r[1], r[2]) for r in back.collect()}
    assert orig == rt


def test_csv_utf8_roundtrip(spark, tmp):
    """UTF-8 torture parity (reference tests/test.py:203-245): emoji,
    4-byte chars, RTL, CJK survive a CSV round-trip exactly."""
    from lwetl_spark.sinks.formatter import write_csv
    from lwetl_spark.sources.csv import csv_source

    corpus = [
        (1, "I can eat glass"),
        (2, "Я могу есть стекло"),
        (3, "私はガラスを食べられます"),
        (4, "أنا قادر على أكل الزجاج"),
        (5, "\U0001f60e\U0001f4a5 emoji 4-byte"),
        (6, "⠊⠀⠉⠁⠝⠀⠑⠁⠞⠀⠛⠇⠁⠎⠎ braille"),
    ]
    df = spark.createDataFrame(corpus, "ID long, VAL string")
    out = os.path.join(tmp, "utf8_csv")
    write_csv(df, out, sep=";")
    back = csv_source(spark, out, delimiter=";", infer_schema=False)
    got = dict((int(r["ID"]), r["VAL"]) for r in back.collect())
    assert got == dict(corpus)


def test_csv_no_header_cn_names(spark, tmp):
    from lwetl_spark.sources.csv import csv_source

    p = os.path.join(tmp, "raw.tsv")
    with open(p, "w") as fh:
        fh.write("a\t1\nb\t2\n")
    df = csv_source(spark, p, header=False)
    assert df.columns == ["C0", "C1"]
    assert df.count() == 2


def test_xlsx_roundtrip(spark, tmp):
    # no importorskip: sinks/xlsx_minimal.py makes K4/S5 work without openpyxl
    from lwetl_spark.sinks.formatter import write_xlsx
    from lwetl_spark.sources.xlsx import xlsx_source
    from lwetl_spark.catalog import load_table

    sup = load_table(spark, SF_CORRECT, "supplier").select("s_suppkey", "s_name")
    out = os.path.join(tmp, "sup.xlsx")
    write_xlsx(sup, out)
    back = xlsx_source(spark, out)
    assert back.count() == sup.count()
    assert back.columns == ["S_SUPPKEY", "S_NAME"]


LDIF_SAMPLE = """dn: cn=Fido,ou=pets,dc=example,dc=org
cn: Fido
cn: Rex
objectclass: pet
sn: Dog
name: BIKE
price: 99.95
photo:: aGVsbG8gd29ybGQ=

dn: cn=Tom,ou=pets,dc=example,dc=org
cn: Tom
objectclass: pet
sn: Cat
name: CAR
price: 10000.00
description: a very long line that is fol
 ded across two physical lines
"""


def test_ldif_parse_and_source(spark, tmp):
    """LDIF semantics (reference tests/resources/ldif.txt shape):
    multi-valued attrs joined, base64 values decoded, folded lines."""
    from lwetl_spark.sources.ldif import ldif_source, parse_ldif_text

    recs = parse_ldif_text(LDIF_SAMPLE, separator="|")
    assert len(recs) == 2
    assert recs[0]["cn"] == "Fido|Rex"
    assert recs[0]["photo"] == "hello world"
    assert recs[1]["description"] == "a very long line that is folded across two physical lines"

    p = os.path.join(tmp, "pets.ldif")
    with open(p, "w") as fh:
        fh.write(LDIF_SAMPLE)
    df = ldif_source(spark, p, separator="|")
    assert df.count() == 2
    row = {r["NAME"]: r for r in df.collect()}
    assert row["BIKE"]["CN"] == "Fido|Rex"
    assert row["CAR"]["SN"] == "Cat"


def test_sql_script_splitter(spark):
    from lwetl_spark.sources.sqlscript import run_script, split_statements

    script = """
    -- comment with ; inside
    SELECT 1 AS a;
    SELECT 'x;y' AS s;
    SELECT 2 AS b
    """
    stmts = list(split_statements(script))
    assert len(stmts) == 3
    assert stmts[1] == "SELECT 'x;y' AS s"
    results = run_script(spark, script)
    assert [r.collect()[0][0] for r in results] == [1, "x;y", 2]


# ---------------------------------------------------------------- jdbc


def test_jdbc_options_single_connection_defaults():
    from lwetl_spark.sources.jdbc import jdbc_options

    o = jdbc_options("jdbc:postgresql://h/db", table="t")
    # reference parity: fetchsize is lwetl's array_size read batch (1000)
    assert o == {"url": "jdbc:postgresql://h/db", "dbtable": "t", "fetchsize": "1000"}


def test_jdbc_options_partitioned_read():
    from lwetl_spark.sources.jdbc import jdbc_options

    o = jdbc_options(
        "jdbc:postgresql://h/db",
        table="orders",
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=6000000,
        num_partitions=32,
        options={"pushDownPredicate": True},
    )
    assert o["partitionColumn"] == "o_orderkey"
    assert o["numPartitions"] == "32"
    assert o["pushDownPredicate"] == "True"


def test_jdbc_options_validation():
    import pytest

    from lwetl_spark.sources.jdbc import jdbc_options

    with pytest.raises(ValueError):
        jdbc_options("u")  # neither table nor query
    with pytest.raises(ValueError):
        jdbc_options("u", table="t", query="select 1")  # both
    with pytest.raises(ValueError):
        jdbc_options("u", table="t", partition_column="c")  # incomplete spec
    with pytest.raises(ValueError):
        jdbc_options("u", query="select 1", partition_column="c",
                     lower_bound=0, upper_bound=1, num_partitions=2)


def test_jdbc_named_source_resolves_and_fails_without_driver(spark):
    from lwetl_spark.config import open_source

    cfg = {
        "sources": {
            "warehouse": {
                "path": "jdbc:postgresql://example.invalid/db",
                "format": "jdbc",
                "options": {"dbtable": "t", "user": "scott"},
            }
        },
        "alias": {"wh": "warehouse"},
    }
    # registry plumbing resolves the alias and reaches the JDBC load,
    # which must fail on the absent driver jar (none ship here), not on
    # config resolution
    import pytest

    with pytest.raises(Exception, match="[Dd]river"):
        open_source(spark, cfg, "wh")


def test_jsonl_roundtrip_utf8_and_nulls(spark, tmp):
    """JSONL escape chain (newlines, quotes, backslash, 4-byte UTF-8) and
    explicit-null round trip under a fixed schema."""
    from lwetl_spark.sources.json import jsonl_source, write_jsonl

    rows = [
        (1, 'line1\nline2\t"quoted" \\ slash', "en"),
        (2, "emoji \U0001f600 and CJK 漢字 and RTL שלום", "xx"),
        (3, None, None),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    out = os.path.join(tmp, "docs_jsonl")
    write_jsonl(df, out)
    back = jsonl_source(spark, out, schema="doc_id LONG, text STRING, lang STRING")
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)


def test_jsonl_explicit_schema_skips_inference(spark, tmp):
    """With an explicit schema the reader must not re-type values (a
    numeric-looking string stays a string) and extra fields are pruned."""
    from lwetl_spark.sources.json import jsonl_source

    p = os.path.join(tmp, "x.jsonl")
    with open(p, "w") as fh:
        fh.write('{"a": "007", "b": 1, "extra": true}\n{"a": "8", "b": 2}\n')
    back = jsonl_source(spark, p, schema="a STRING, b LONG")
    got = sorted(tuple(r) for r in back.collect())
    assert got == [("007", 1), ("8", 2)]
    assert back.columns == ["a", "b"]


def test_orc_roundtrip_with_pushdown(spark, tmp):
    """ORC sink/source round trip; the filter must reach the ORC scan as
    a pushed predicate (stripe-stat pruning at scale)."""
    from lwetl_spark.catalog import load_table

    orders = load_table(spark, SF_CORRECT, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    trg = os.path.join(tmp, "orders_orc")
    orders.write.orc(trg)
    back = spark.read.orc(trg).filter("o_totalprice > 100000")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "orc" in plan.lower()
    exp = orders.filter("o_totalprice > 100000").count()
    assert back.count() == exp


def test_corrupt_events_parquet_surfaces_real_error(spark, tmp):
    """VERDICT r7 nit #1: load_table's events fallback is ONLY for the
    TIMESTAMP(NANOS) schema-conversion rejection.  A genuinely corrupt
    events file must surface its own read error, not a confusing
    secondary failure from the pyarrow explicit-schema path."""
    from lwetl_spark.catalog import load_table

    bad_dir = os.path.join(tmp, "sf_bad")
    os.makedirs(bad_dir)
    with open(os.path.join(bad_dir, "events.parquet"), "wb") as f:
        f.write(b"PAR1 this is not a parquet footer")
    with pytest.raises(Exception) as exc:
        load_table(spark, bad_dir, "events").collect()
    assert "NANOS" not in str(exc.value)


def test_nanos_events_fallback_still_engages(spark, tmp):
    """The read-scoped nanos fallback (catalog.load_table) keeps working
    after the exception narrowing: a TIMESTAMP(NANOS) events file on a
    vanilla session reads via the explicit long-typed schema and
    rebuilds microsecond timestamps."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lwetl_spark.catalog import load_table

    nano_dir = os.path.join(tmp, "sf_nanos")
    os.makedirs(nano_dir)
    t = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([1_700_000_000_000_000_001, 2], pa.timestamp("ns")),
        "user_id": pa.array([10, 20], pa.int64()),
        "event_type": pa.array(["a", "b"], pa.string()),
        "value": pa.array([1.0, 2.0], pa.float64()),
    })
    pq.write_table(t, os.path.join(nano_dir, "events.parquet"))
    got = load_table(spark, nano_dir, "events")
    assert got.count() == 2
    assert dict(got.dtypes)["ts"] == "timestamp"
