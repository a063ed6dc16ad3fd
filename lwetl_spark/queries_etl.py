"""ETL-surface queries: SURVEY §2 ☆ operators whose natural form is a
source / sink / DML program rather than a SELECT — exposed to the driver
as round-trip queries so every claimed operator has BOTH a ``queries()``
entry and a DuckDB ``oracle_sql()`` check.

Each query materializes through the real operator (CSV/LDIF/SQL-script
source, CSV/SQL-script sink, Uploader insert/update/delete/PK-gen,
db-copy) into a throwaway temp directory, reads the result back, and
returns a DataFrame whose values a plain SQL oracle can reproduce.
Temp writes are bounded (sf0.01-sized inputs) and never touch the repo
or the shared testdata.

Reference parity citations sit on each builder (lwetl file:line).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from lwetl_spark.queries import _t, register


def _tmpdir(tag: str) -> str:
    return tempfile.mkdtemp(prefix=f"lwetl_spark_{tag}_")


# ----------------------------------------------------------------------------
# O3: ORDER BY ASC/DESC on PK (db-copy scan order, db_copy/main.py:271-276)
# ----------------------------------------------------------------------------


@register(
    "o3_order_pk_desc",
    "SELECT s_suppkey, s_name FROM supplier ORDER BY s_suppkey DESC LIMIT 10",
)
def o3_order_pk_desc(spark, sf_dir):
    """Reverse-PK scan (O3): the reference's 'fast update' heuristic reads
    `SELECT * FROM t ORDER BY pk DESC` (db_copy/main.py:271-276)."""
    return (
        _t(spark, sf_dir, "supplier")
        .orderBy(F.col("s_suppkey").desc())
        .select("s_suppkey", "s_name")
        .limit(10)
    )


# ----------------------------------------------------------------------------
# S4 + K2: CSV sink → CSV source round trip (table_import.py:120-219,
# formatter.py:257-290)
# ----------------------------------------------------------------------------


@register(
    "s4_csv_roundtrip",
    """
    SELECT c_custkey AS C_CUSTKEY, c_name AS C_NAME,
           c_mktsegment AS C_MKTSEGMENT, ROUND(c_acctbal, 2) AS C_ACCTBAL
    FROM customer
    """,
)
def s4_csv_roundtrip(spark, sf_dir):
    """K2 CSV sink (`;` separator, header row — lwetl/formatter.py:257-290)
    then S4 CSV import with the reference's name-normalization pass
    (upper-cased columns, lwetl/table_import.py:27-49, jdbc.py:105-107)."""
    from lwetl_spark.sinks.formatter import write_csv
    from lwetl_spark.sources.csv import csv_source

    out = os.path.join(_tmpdir("s4"), "customer_csv")
    src = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    write_csv(src, out, sep=";", header=True)
    back = csv_source(spark, out, delimiter=";", header=True)
    return back.select(
        F.col("C_CUSTKEY").cast("long").alias("C_CUSTKEY"),
        "C_NAME",
        "C_MKTSEGMENT",
        F.round(F.col("C_ACCTBAL").cast("double"), 2).alias("C_ACCTBAL"),
    )


# ----------------------------------------------------------------------------
# S6: LDIF import (lwetl/table_import.py:222-375) — continuation/base64/
# multi-value semantics checked against a string-built oracle
# ----------------------------------------------------------------------------


@register(
    "s6_ldif_roundtrip",
    """
    SELECT 'cn=' || n_name AS DN,
           n_name AS CN,
           CAST(n_regionkey AS VARCHAR) AS REGIONKEY,
           'm' || n_nationkey || '|x' || n_regionkey AS MEMBER,
           'nation ' || n_name AS NOTE
    FROM nation
    """,
)
def s6_ldif_roundtrip(spark, sf_dir):
    """S6 LDIF parse: multi-valued attrs join on the separator
    (table_import.py:334-344), `::` values are base64-decoded to text
    (table_import.py:309-327) — the oracle expects the decoded value."""
    import base64

    from lwetl_spark.sources.ldif import ldif_source

    rows = (
        _t(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
        .collect()
    )
    blocks = []
    for r in rows:
        b64 = base64.b64encode(f"nation {r.n_name}".encode()).decode("ascii")
        blocks.append(
            f"dn: cn={r.n_name}\n"
            f"cn: {r.n_name}\n"
            f"regionkey: {r.n_regionkey}\n"
            f"member: m{r.n_nationkey}\n"
            f"member: x{r.n_regionkey}\n"
            f"note:: {b64}\n"
        )
    path = os.path.join(_tmpdir("s6"), "nation.ldif")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(blocks))
    df = ldif_source(spark, path, separator="|")
    return df.select("DN", "CN", "REGIONKEY", "MEMBER", "NOTE")


# ----------------------------------------------------------------------------
# K5/U2/F6: SQL-script sink — dialect literal rendering incl. quote
# doubling (lwetl/formatter.py:529-594, uploader.py:337)
# ----------------------------------------------------------------------------


@register(
    "k5_sql_script_sink",
    """
    SELECT 'INSERT INTO region_labels (r_regionkey, label) VALUES ('
           || r_regionkey || ', '''
           || replace(r_name || '''s', '''', '''''') || ''');' AS stmt
    FROM region
    """,
)
def k5_sql_script_sink(spark, sf_dir):
    """K5: every row rendered as an INSERT statement with SQL-literal
    quoting — the reference's quote-doubling `value.replace("'", "''")`
    (lwetl/uploader.py:337) verified against DuckDB's own string build."""
    from lwetl_spark.sinks.formatter import to_sql_inserts

    src = _t(spark, sf_dir, "region").select(
        "r_regionkey", F.concat(F.col("r_name"), F.lit("'s")).alias("label")
    )
    stmts = list(to_sql_inserts(src, "region_labels"))
    return spark.createDataFrame([(s,) for s in stmts], "stmt string")


# ----------------------------------------------------------------------------
# S7 + C1: SQL-script source → spark.sql loop (lwetl/input.py:11-112,
# programs/sql_query/main.py)
# ----------------------------------------------------------------------------


@register(
    "c1_script_exec",
    """
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_big,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders WHERE o_totalprice > 200000
    GROUP BY o_custkey
    """,
)
def c1_script_exec(spark, sf_dir):
    """C1 `sql-query` core: statement splitter (comments + quoted `;`
    honored, lwetl/input.py:81-112) feeding `spark.sql` per statement;
    the last SELECT's DataFrame is the program output."""
    from lwetl_spark.sources.sqlscript import run_script

    _t(spark, sf_dir, "orders").createOrReplaceTempView("c1_orders")
    script = """
    -- big orders per customer; ';' inside quotes must not split: 'a;b'
    CREATE OR REPLACE TEMPORARY VIEW c1_big AS
      SELECT o_custkey, o_totalprice FROM c1_orders WHERE o_totalprice > 200000;
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_big,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM c1_big GROUP BY o_custkey;
    """
    return run_script(spark, script)[-1]


# ----------------------------------------------------------------------------
# U1/U3: dict-row insert buffering + commit (lwetl/uploader.py:550-570,
# 644-698) — empty values dropped (:309-344)
# ----------------------------------------------------------------------------


@register(
    "u1_insert_commit",
    """
    SELECT r_regionkey, COALESCE(r_name, '(null)') AS r_name FROM region
    UNION ALL
    SELECT * FROM (VALUES (100, 'NEW REGION 0'),
                          (101, 'NEW REGION 1'),
                          (102, 'NEW REGION 2'),
                          (103, '(null)')) v(r_regionkey, r_name)
    """,
)
def u1_insert_commit(spark, sf_dir):
    """U1 dict insert + U3 batched commit: rows buffer driver-side and
    flush as one append on `commit()` (MultiParameterUploader,
    lwetl/uploader.py:644-698).  The whitespace-only name on row 103 is
    dropped by the `_filter_data` rule (:309-344) → NULL in the table."""
    from lwetl_spark.sinks.uploader import Uploader, WritePolicy

    trg = os.path.join(_tmpdir("u1"), "region.parquet")
    _t(spark, sf_dir, "region").write.parquet(trg)
    up = Uploader(spark, trg, policy=WritePolicy.COMMIT)
    for i in range(3):
        up.insert({"r_regionkey": 100 + i, "r_name": f"NEW REGION {i}"})
    up.insert({"r_regionkey": 103, "r_name": "   "})  # empty → dropped key
    up.commit()
    return spark.read.parquet(trg).select(
        "r_regionkey", F.coalesce("r_name", F.lit("(null)")).alias("r_name")
    )


# ----------------------------------------------------------------------------
# U4: UPDATE ... SET ... WHERE (lwetl/uploader.py:572-608)
# ----------------------------------------------------------------------------


@register(
    "u4_update_where",
    """
    SELECT n_nationkey,
           CASE WHEN n_regionkey = 0 THEN 'REDACTED' ELSE n_name END AS n_name,
           n_regionkey
    FROM nation
    """,
)
def u4_update_where(spark, sf_dir):
    """U4 update-by-predicate as a conditional column rewrite + atomic
    overwrite (the join-free Spark form of `UPDATE t SET c=? WHERE k=?`,
    lwetl/uploader.py:572-608)."""
    from lwetl_spark.sinks.uploader import Uploader, WritePolicy

    trg = os.path.join(_tmpdir("u4"), "nation.parquet")
    _t(spark, sf_dir, "nation").write.parquet(trg)
    up = Uploader(spark, trg, policy=WritePolicy.COMMIT)
    up.update({"n_name": "REDACTED"}, {"n_regionkey": 0})
    return spark.read.parquet(trg).select("n_nationkey", "n_name", "n_regionkey")


# ----------------------------------------------------------------------------
# U5: DELETE by key set — the reference's 500-PK IN-batch delete
# (db_copy/main.py:365-391) as an anti-join
# ----------------------------------------------------------------------------


@register(
    "u5_delete_keys",
    """
    SELECT s_suppkey, s_name, s_nationkey FROM supplier
    WHERE s_nationkey NOT IN
          (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
    """,
)
def u5_delete_keys(spark, sf_dir):
    """U5 batched key delete: `DELETE FROM t WHERE pk IN (?,...)` ×500
    (db_copy/main.py:365-391) becomes one left_anti join — no batching,
    no IN-list size limits."""
    from lwetl_spark.sinks.uploader import Uploader, WritePolicy

    trg = os.path.join(_tmpdir("u5"), "supplier.parquet")
    _t(spark, sf_dir, "supplier").write.parquet(trg)
    keys = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 0)
        .select(F.col("n_nationkey").alias("s_nationkey"))
    )
    up = Uploader(spark, trg, policy=WritePolicy.COMMIT)
    up.delete(keys_df=keys, key="s_nationkey")
    return spark.read.parquet(trg).select("s_suppkey", "s_name", "s_nationkey")


# ----------------------------------------------------------------------------
# U7: PK generation — MAX(pk) seed + monotone counter
# (lwetl/uploader.py:31-61)
# ----------------------------------------------------------------------------


@register(
    "u7_pk_generation",
    """
    SELECT (SELECT MAX(c_custkey) FROM customer)
           + ROW_NUMBER() OVER (ORDER BY c_mktsegment) AS pk,
           c_mktsegment
    FROM (SELECT DISTINCT c_mktsegment FROM customer) d
    """,
)
def u7_pk_generation(spark, sf_dir):
    """U7 deterministic id generation: `SELECT MAX(pk)` seed
    (lwetl/uploader.py:58-59) + row_number over an explicit ordering —
    unlike monotonically_increasing_id, stable under retries."""
    from lwetl_spark.sinks.uploader import add_pk_column

    cust = _t(spark, sf_dir, "customer")
    mx = cust.agg(F.max("c_custkey")).first()[0]
    segs = cust.select("c_mktsegment").distinct()
    return add_pk_column(segs, "pk", existing_max=mx, order_by=["c_mktsegment"]).select(
        "pk", "c_mktsegment"
    )


# ----------------------------------------------------------------------------
# C2: db-copy 'new' mode — anti-join insert into a partial target
# (lwetl/programs/db_copy/main.py:260-315)
# ----------------------------------------------------------------------------


@register(
    "c2_db_copy_new",
    """
    SELECT n_nationkey,
           CASE WHEN n_nationkey % 2 = 0 THEN 'OLD' ELSE n_name END AS n_name,
           n_regionkey
    FROM nation
    """,
)
def c2_db_copy_new(spark, sf_dir):
    """C2 db-copy, mode='new': catalog diff + per-table left_anti insert
    (db_copy/main.py:180-233, 260-315).  The target starts with the even
    PKs renamed 'OLD'; copy must insert exactly the odd PKs and leave
    existing rows untouched."""
    from lwetl_spark.plans.db_copy import db_copy

    base = _tmpdir("c2")
    src_dir = os.path.join(base, "src")
    trg_dir = os.path.join(base, "trg")
    os.makedirs(src_dir)
    os.makedirs(trg_dir)
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    nation.write.parquet(os.path.join(src_dir, "nation.parquet"))
    region.write.parquet(os.path.join(src_dir, "region.parquet"))
    nation.filter(F.col("n_nationkey") % 2 == 0).withColumn(
        "n_name", F.lit("OLD")
    ).write.parquet(os.path.join(trg_dir, "nation.parquet"))
    region.write.parquet(os.path.join(trg_dir, "region.parquet"))
    db_copy(
        spark,
        src_dir,
        trg_dir,
        pks={"nation": "n_nationkey", "region": "r_regionkey"},
        mode="new",
        fks={"nation": {"region"}},
        activate=True,
    )
    return spark.read.parquet(os.path.join(trg_dir, "nation.parquet")).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


# ----------------------------------------------------------------------------
# F10: binary round trip (examples/extract-images.py:31-38,
# uploader.py:518-528, tests/test.py:249-276)
# ----------------------------------------------------------------------------


@register(
    "f10_binary_roundtrip",
    "SELECT doc_id, md5(text) AS payload_md5 FROM documents",
)
def f10_binary_roundtrip(spark, sf_dir):
    """F10 BLOB handling: text packed to a BinaryType payload, persisted
    to parquet, read back, digested — byte-exact like the reference's
    JPEG round trip (tests/test.py:249-276)."""
    trg = os.path.join(_tmpdir("f10"), "blobs.parquet")
    _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).write.parquet(trg)
    return spark.read.parquet(trg).select("doc_id", F.md5("payload").alias("payload_md5"))


# ----------------------------------------------------------------------------
# U8: SQL-expression values (the reference's NativeExpression,
# lwetl/uploader.py:64-70, 330-331) — raw SQL as an update value, evaluated
# against the row being written
# ----------------------------------------------------------------------------


@register(
    "u8_sql_expression",
    """
    SELECT p_partkey, p_brand,
           CASE WHEN p_brand = 'Brand#11' THEN p_size + 100 ELSE p_size END
               AS p_size
    FROM part
    """,
)
def u8_sql_expression(spark, sf_dir):
    """U8: `SqlExpression` update value — `SET p_size = p_size + 100`
    referencing the target row's own column, evaluated by Catalyst
    (`F.expr`) during the conditional rewrite (vs the reference passing
    the raw string through to the RDBMS)."""
    from lwetl_spark.sinks.uploader import SqlExpression, Uploader, WritePolicy

    trg = os.path.join(_tmpdir("u8"), "part.parquet")
    _t(spark, sf_dir, "part").write.parquet(trg)
    up = Uploader(spark, trg, policy=WritePolicy.COMMIT)
    up.update(
        {"p_size": SqlExpression("p_size + 100")}, where={"p_brand": "Brand#11"}
    )
    return spark.read.parquet(trg).select("p_partkey", "p_brand", "p_size")


# ----------------------------------------------------------------------------
# S10 (NEW): JSONL source/sink round trip — the training-data interchange
# format; no reference analog (its import surface stops at CSV/XLSX/LDIF,
# lwetl/table_import.py)
# ----------------------------------------------------------------------------


@register(
    "s10_jsonl_roundtrip",
    """
    SELECT doc_id, lang, n_chars, md5(text) AS text_md5
    FROM documents
    """,
)
def s10_jsonl_roundtrip(spark, sf_dir):
    """JSONL sink then source with an EXPLICIT schema (no inference pass —
    at 100 TB inference is a second full scan).  The text column rides
    through JSON string escaping (newlines, quotes, non-ASCII), so the
    md5 on the far side proves the escape/unescape chain is lossless;
    doc_id/lang/n_chars prove typed round-tripping."""
    from lwetl_spark.sources.json import jsonl_source, write_jsonl

    out = os.path.join(_tmpdir("s10"), "documents_jsonl")
    write_jsonl(
        _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars", "text"),
        out,
    )
    back = jsonl_source(
        spark, out, schema="doc_id LONG, lang STRING, n_chars LONG, text STRING"
    )
    return back.select("doc_id", "lang", "n_chars", F.md5("text").alias("text_md5"))


# ----------------------------------------------------------------------------
# K8 (NEW): ORC sink/source round trip — second columnar format beside
# parquet; Spark-native ORC writer/reader (no reference analog)
# ----------------------------------------------------------------------------


@register(
    "k8_orc_roundtrip",
    """
    SELECT o_orderstatus, COUNT(*) AS n,
           ROUND(CAST(CAST(SUM(o_totalprice) AS DECIMAL(18,2)) AS DOUBLE), 2) AS total
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01'
    GROUP BY o_orderstatus
    """,
)
def k8_orc_roundtrip(spark, sf_dir):
    """ORC round trip: write orders as ORC, read back, aggregate.  The
    date filter sits ON the ORC scan so predicate pushdown reaches the
    ORC reader (min/max stripe stats prune at scale exactly as parquet
    row groups do); SUM over DECIMAL proves type fidelity through the
    format.  The driver-facing total is ROUND(double, 2): DECIMAL stays
    internal because DecimalType is off the portable driver-hash dtype
    whitelist (tools/driver_canon.py)."""
    trg = os.path.join(_tmpdir("k8"), "orders_orc")
    _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
    ).write.mode("overwrite").orc(trg)
    return (
        spark.read.orc(trg)
        .filter(F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum("o_totalprice").cast("decimal(18,2)").cast("double"), 2
            ).alias("total"),
        )
    )


# ----------------------------------------------------------------------------
# K9 (NEW): small-file compaction — maintenance pass for fragmented tables
# ----------------------------------------------------------------------------


@register(
    "k9_compaction",
    """
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents
    GROUP BY lang
    """,
)
def k9_compaction(spark, sf_dir):
    """Fragment documents into 64 tiny files, compact to byte-sized
    targets (shuffle-free coalesce + atomic swap), and prove the rewrite
    is lossless by aggregating the compacted table.  The compaction
    itself is asserted in test_plans (file counts, plan shape); the
    driver-checked surface is data fidelity through the rewrite."""
    from lwetl_spark.sinks.partitioned import compact_files

    trg = os.path.join(_tmpdir("k9"), "docs_frag")
    _t(spark, sf_dir, "documents").repartition(64).write.parquet(trg)
    stats = compact_files(spark, trg, target_file_bytes=64 * 1024 * 1024)
    assert stats["files_after"] <= stats["files_before"]
    return (
        spark.read.parquet(trg)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars"),
        )
    )


# ----------------------------------------------------------------------------
# S11 (NEW): schema evolution — batches with drifting schemas unified at read
# ----------------------------------------------------------------------------


@register(
    "s11_schema_evolution",
    """
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(n_chars) AS BIGINT) AS n_with_chars,
           CAST(SUM(COALESCE(n_chars, 0)) AS BIGINT) AS chars
    FROM (
      SELECT lang, NULL AS n_chars FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT lang, n_chars FROM documents WHERE doc_id % 2 = 1
    ) GROUP BY lang
    """,
)
def s11_schema_evolution(spark, sf_dir):
    """Schema drift across batches (columns added over time — the normal
    life of a long-lived corpus): batch 1 lacks `n_chars`, batch 2 has
    it; `mergeSchema` unifies at read with NULL fill for the missing
    column.  At scale, pass the merged schema EXPLICITLY once known —
    mergeSchema reads every file's footer up front (a planning-time
    full-file-listing pass, the schema-inference tax again)."""
    d = _t(spark, sf_dir, "documents")
    trg = os.path.join(_tmpdir("s11"), "evolving")
    d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.parquet(trg)
    d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "lang", "n_chars").write.mode(
        "append"
    ).parquet(trg)
    back = spark.read.option("mergeSchema", "true").parquet(trg)
    return back.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.count("n_chars").alias("n_with_chars"),
        F.sum(F.coalesce(F.col("n_chars"), F.lit(0))).cast("bigint").alias("chars"),
    )


@register(
    "x_lsh_index_roundtrip",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS index_matches_inline
    FROM embeddings
    """,
)
def x_lsh_index_roundtrip(spark, sf_dir):
    """Persisted-LSH-index round-trip (operators/similarity.build_lsh_index
    / query_lsh_index): build the index once, probe it with the full
    corpus, and assert the result EQUALS the inline lsh_ann_topk — same
    fixed-seed hyperplane family, same collect-free join scorer, zero
    corpus re-bucketization at query time.  The contract row carries the
    per-query count and the equality verdict (the bucketing itself is
    not SQL-portable; the equality property is engine-checkable)."""
    from lwetl_spark.operators.similarity import (
        build_lsh_index,
        lsh_ann_topk,
        query_lsh_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    path = os.path.join(_tmpdir("lshidx"), "index")
    build_lsh_index(emb, path)
    idx = query_lsh_index(spark, path, emb, k=5)
    inline = lsh_ann_topk(emb, k=5)
    # multiset equality via per-row counts (exceptAll trips a Spark 4.1
    # attribute-binding bug on these shared-lineage pandas plans)
    cols = ["id", "neighbor_id", "cos", "rank"]
    a = idx.groupBy(*cols).agg(F.count("*").alias("_ca"))
    b = inline.groupBy(*cols).agg(F.count("*").alias("_cb"))
    mismatches = (
        a.join(b, cols, "full_outer")
        .filter("_ca IS NULL OR _cb IS NULL OR _ca <> _cb")
        .count()
    )
    n_queries = emb.count()
    return spark.createDataFrame(
        [(n_queries, mismatches == 0)], "n_queries long, index_matches_inline boolean"
    )


@register(
    "x_pq_index_roundtrip",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS index_matches_inline
    FROM embeddings
    """,
)
def x_pq_index_roundtrip(spark, sf_dir):
    """Persisted-PQ-index round-trip (operators/similarity.build_pq_index
    / query_pq_index): codebooks + packed int64 codes + vector map on
    disk; probing with the full corpus must EQUAL the inline pq_topk —
    same fixed-seed codebooks, same ADC shortlist, same exact re-rank.
    Same equality contract as the LSH/IVF index round-trips."""
    from lwetl_spark.operators.similarity import (
        build_pq_index,
        pq_topk,
        query_pq_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    path = os.path.join(_tmpdir("pqidx"), "index")
    build_pq_index(emb, path)
    idx = query_pq_index(spark, path, emb, k=5)
    inline = pq_topk(emb, k=5)
    cols = ["id", "neighbor_id", "cos", "rank"]
    a = idx.groupBy(*cols).agg(F.count("*").alias("_ca"))
    b = inline.groupBy(*cols).agg(F.count("*").alias("_cb"))
    mismatches = (
        a.join(b, cols, "full_outer")
        .filter("_ca IS NULL OR _cb IS NULL OR _ca <> _cb")
        .count()
    )
    n_queries = emb.count()
    return spark.createDataFrame(
        [(n_queries, mismatches == 0)], "n_queries long, index_matches_inline boolean"
    )


@register(
    "x_ivf_index_roundtrip",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS index_matches_inline
    FROM embeddings
    """,
)
def x_ivf_index_roundtrip(spark, sf_dir):
    """Persisted-IVF-index round-trip (operators/similarity.build_ivf_index
    / query_ivf_index, VERDICT r2 #6): build the index once — k-means
    centroids + cell-partitioned member vectors on disk — probe it with
    the full corpus, and assert the result EQUALS the inline
    ivf_topk(score='cell'): same deterministic quantizer, same cell-local
    matmul scorer (_make_cell_topk), zero corpus re-clustering at query
    time.  Same equality contract as x_lsh_index_roundtrip (the
    clustering is not SQL-portable; the equality property is
    engine-checkable)."""
    from lwetl_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        query_ivf_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    path = os.path.join(_tmpdir("ivfidx"), "index")
    build_ivf_index(emb, path)
    idx = query_ivf_index(spark, path, emb, k=5)
    inline = ivf_topk(emb, k=5)
    # multiset equality via per-row counts (exceptAll trips a Spark 4.1
    # attribute-binding bug on these shared-lineage pandas plans)
    cols = ["id", "neighbor_id", "cos", "rank"]
    a = idx.groupBy(*cols).agg(F.count("*").alias("_ca"))
    b = inline.groupBy(*cols).agg(F.count("*").alias("_cb"))
    mismatches = (
        a.join(b, cols, "full_outer")
        .filter("_ca IS NULL OR _cb IS NULL OR _ca <> _cb")
        .count()
    )
    n_queries = emb.count()
    return spark.createDataFrame(
        [(n_queries, mismatches == 0)], "n_queries long, index_matches_inline boolean"
    )


@register(
    "x_ivf_incremental",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS index_matches_rebuild
    FROM embeddings
    """,
)
def x_ivf_incremental(spark, sf_dir):
    """Incremental vector-index lifecycle end-to-end — the embedding
    side of the daily-crawl campaign (operators/similarity.
    update_ivf_index / remove_from_ivf_index): build the persisted IVF
    index on the even-id half, `update_ivf_index` with the odd half
    (frozen quantizer, delta-only Arrow assignment, cell-partition
    appends), then purge every vec_id % 10 == 3 (bounded locate
    collect, affected-cell-only rewrites).  Probing with the full
    corpus must EQUAL probing a from-scratch build over (union minus
    removed) with ``train_df=`` the even half — appends never move the
    centroids, so the equality is exact, not approximate.  Same
    engine-checkable contract as the LSH/IVF/PQ round-trips (the
    clustering is not SQL-portable)."""
    import shutil as _shutil

    from lwetl_spark.operators.similarity import (
        build_ivf_index,
        query_ivf_index,
        remove_from_ivf_index,
        update_ivf_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    removed = emb.filter(F.col("vec_id") % 10 == 3).select("vec_id")

    work = _tmpdir("ivfinc")
    inc_path = os.path.join(work, "inc")
    ref_path = os.path.join(work, "ref")
    build_ivf_index(even, inc_path)
    update_ivf_index(spark, inc_path, odd)
    remove_from_ivf_index(spark, inc_path, removed)
    build_ivf_index(
        emb.join(removed, "vec_id", "left_anti"), ref_path, train_df=even
    )

    inc = query_ivf_index(spark, inc_path, emb, k=5)
    ref = query_ivf_index(spark, ref_path, emb, k=5)
    cols = ["id", "neighbor_id", "cos", "rank"]
    a = inc.groupBy(*cols).agg(F.count("*").alias("_ca"))
    b = ref.groupBy(*cols).agg(F.count("*").alias("_cb"))
    mismatches = (
        a.join(b, cols, "full_outer")
        .filter("_ca IS NULL OR _cb IS NULL OR _ca <> _cb")
        .count()
    )
    n_queries = emb.count()
    _shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [(n_queries, mismatches == 0)],
        "n_queries long, index_matches_rebuild boolean",
    )


@register(
    "x_ann_filtered",
    """
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
        FROM e
    ),
    p AS (
        SELECT a.vec_id AS id, b.vec_id AS neighbor_id,
               ROUND(list_sum(list_transform(range(1, 65),
                                             i -> a.v[i] * b.v[i]))
                     / (a.nrm * b.nrm), 6) AS cos
        FROM n a JOIN n b ON a.vec_id <> b.vec_id
        WHERE b.vec_id % 2 = 0 AND a.nrm > 0 AND b.nrm > 0
    )
    SELECT id, neighbor_id, cos, rank FROM (
        SELECT id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY id
                                  ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM p
    ) WHERE rank <= 5
    """,
)
def x_ann_filtered(spark, sf_dir):
    """Metadata-filtered ANN probe (r9, VERDICT r8 #3): real retrieval
    filters by source/lang/date at query time, and filtering AFTER the
    probe breaks top-k (k survivors pre-filter ≠ top-k of the filtered
    set).  `query_ivf_index(filter_ids=...)` semi-joins the allowed-id
    set against cell members BEFORE the cell-local top-k
    (similarity._ann_filter_semi — the same pushdown all four persisted
    families and hybrid_topk now take), so k is guaranteed from the
    filtered pool.  Probing with nprobe = num_centroids makes the IVF
    leg EXACT, so the oracle is the full brute-force filtered cosine
    top-5 (every id, cos, rank value-checked cross-engine — not a
    band)."""
    import shutil as _shutil

    from lwetl_spark.operators.similarity import (
        build_ivf_index,
        query_ivf_index,
    )

    from lwetl_spark.operators._parallel import spread as _spread

    emb = _t(spark, sf_dir, "embeddings")
    work = _tmpdir("annflt")
    path = os.path.join(work, "ivf")
    build_ivf_index(emb, path, num_centroids=16)
    flt = emb.filter(F.col("vec_id") % 2 == 0).select("vec_id")
    # r12: the probe batch here is the WHOLE corpus (exactness harness),
    # so the caller spreads it — query_ivf_index itself no longer
    # spreads (real probe batches are small at every scale, VERDICT r11
    # #1); a corpus-sized self-probe is the one caller that should.
    # Round-robin is partitioning-invariant for the per-row assign.
    out = query_ivf_index(
        spark, path, _spread(emb), k=5, nprobe=16, filter_ids=flt
    ).localCheckpoint(eager=True)  # materialize before the path vanishes
    _shutil.rmtree(work, ignore_errors=True)
    return out


@register(
    "x_pq_incremental",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS index_matches_rebuild
    FROM embeddings
    """,
)
def x_pq_incremental(spark, sf_dir):
    """Incremental PQ-index lifecycle end-to-end — the packed-code
    counterpart of x_ivf_incremental (operators/similarity.
    update_pq_index / remove_from_pq_index): build the persisted PQ
    index on the even-id half, `update_pq_index` with the odd half
    (frozen codebooks, delta-only Arrow encode, bucket-partition
    appends), then purge every vec_id % 10 == 3 (bounded locate,
    affected-bucket-only rewrites via per-write dynamic overwrite).
    Probing with the full corpus must EQUAL probing a from-scratch
    build over (union minus removed) with ``train_df=`` the even half —
    appends never move the codebooks, so the equality is exact.  Same
    engine-checkable contract as the LSH/IVF/PQ round-trips (the
    quantization is not SQL-portable)."""
    import shutil as _shutil

    from lwetl_spark.operators.similarity import (
        build_pq_index,
        query_pq_index,
        remove_from_pq_index,
        update_pq_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    removed = emb.filter(F.col("vec_id") % 10 == 3).select("vec_id")

    work = _tmpdir("pqinc")
    inc_path = os.path.join(work, "inc")
    ref_path = os.path.join(work, "ref")
    build_pq_index(even, inc_path)
    update_pq_index(spark, inc_path, odd)
    remove_from_pq_index(spark, inc_path, removed)
    build_pq_index(
        emb.join(removed, "vec_id", "left_anti"), ref_path, train_df=even
    )

    inc = query_pq_index(spark, inc_path, emb, k=5)
    ref = query_pq_index(spark, ref_path, emb, k=5)
    cols = ["id", "neighbor_id", "cos", "rank"]
    a = inc.groupBy(*cols).agg(F.count("*").alias("_ca"))
    b = ref.groupBy(*cols).agg(F.count("*").alias("_cb"))
    mismatches = (
        a.join(b, cols, "full_outer")
        .filter("_ca IS NULL OR _cb IS NULL OR _ca <> _cb")
        .count()
    )
    n_queries = emb.count()
    _shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [(n_queries, mismatches == 0)],
        "n_queries long, index_matches_rebuild boolean",
    )


@register(
    "x_ivfpq_index_roundtrip",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS index_matches_inline
    FROM embeddings
    """,
)
def x_ivfpq_index_roundtrip(spark, sf_dir):
    """Persisted-IVFADC-index round-trip (operators/ivfpq.
    build_ivfpq_index / query_ivfpq_index, VERDICT r6 #1): coarse
    centroids + residual codebooks + CELL-PARTITIONED packed codes +
    hash-bucketed vectors on disk; probing with the full corpus must
    EQUAL the inline ivfpq_topk — same fixed-seed quantizer pair
    (shared matrix-level trainers), same cell-local ADC scorer, same
    exact re-rank.  Same equality contract as the LSH/IVF/PQ index
    round-trips (the quantization is not SQL-portable; the equality
    property is engine-checkable)."""
    from lwetl_spark.operators.ivfpq import (
        build_ivfpq_index,
        ivfpq_topk,
        query_ivfpq_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    path = os.path.join(_tmpdir("ivfpqidx"), "index")
    build_ivfpq_index(emb, path)
    idx = query_ivfpq_index(spark, path, emb, k=5)
    inline = ivfpq_topk(emb, k=5)
    cols = ["id", "neighbor_id", "cos", "rank"]
    a = idx.groupBy(*cols).agg(F.count("*").alias("_ca"))
    b = inline.groupBy(*cols).agg(F.count("*").alias("_cb"))
    mismatches = (
        a.join(b, cols, "full_outer")
        .filter("_ca IS NULL OR _cb IS NULL OR _ca <> _cb")
        .count()
    )
    n_queries = emb.count()
    return spark.createDataFrame(
        [(n_queries, mismatches == 0)], "n_queries long, index_matches_inline boolean"
    )


@register(
    "x_ivfpq_incremental",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS index_matches_rebuild
    FROM embeddings
    """,
)
def x_ivfpq_incremental(spark, sf_dir):
    """Incremental IVFADC lifecycle end-to-end — the composed-index
    counterpart of x_ivf_incremental/x_pq_incremental (operators/ivfpq.
    update_ivfpq_index / remove_from_ivfpq_index): build the persisted
    index on the even-id half, update with the odd half (BOTH
    quantizers frozen, delta-only Arrow assign+encode, cell-partition
    appends), then purge every vec_id % 10 == 3 (cell-pruned codes
    rewrite + bucket-pruned vectors rewrite).  Probing with the full
    corpus must EQUAL probing a from-scratch build over (union minus
    removed) with ``train_df=`` the even half — appends never move
    either quantizer, so the equality is exact."""
    import shutil as _shutil

    from lwetl_spark.operators.ivfpq import (
        build_ivfpq_index,
        query_ivfpq_index,
        remove_from_ivfpq_index,
        update_ivfpq_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    removed = emb.filter(F.col("vec_id") % 10 == 3).select("vec_id")

    work = _tmpdir("ivfpqinc")
    inc_path = os.path.join(work, "inc")
    ref_path = os.path.join(work, "ref")
    build_ivfpq_index(even, inc_path)
    update_ivfpq_index(spark, inc_path, odd)
    remove_from_ivfpq_index(spark, inc_path, removed)
    build_ivfpq_index(
        emb.join(removed, "vec_id", "left_anti"), ref_path, train_df=even
    )

    inc = query_ivfpq_index(spark, inc_path, emb, k=5)
    ref = query_ivfpq_index(spark, ref_path, emb, k=5)
    cols = ["id", "neighbor_id", "cos", "rank"]
    a = inc.groupBy(*cols).agg(F.count("*").alias("_ca"))
    b = ref.groupBy(*cols).agg(F.count("*").alias("_cb"))
    mismatches = (
        a.join(b, cols, "full_outer")
        .filter("_ca IS NULL OR _cb IS NULL OR _ca <> _cb")
        .count()
    )
    n_queries = emb.count()
    _shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [(n_queries, mismatches == 0)],
        "n_queries long, index_matches_rebuild boolean",
    )


@register(
    "x_text_index_stats",
    r"""
    WITH tok AS (
        SELECT doc_id, unnest(list_filter(
            string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS tok
        FROM documents
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
    tf AS (SELECT doc_id, tok FROM tok GROUP BY doc_id, tok),
    dfq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM dl) AS n_docs,
           (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS n_tokens,
           (SELECT CAST(1000 * SUM(dl) // COUNT(*) AS BIGINT) FROM dl) AS adl_m,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM dfq) AS n_terms,
           (SELECT CAST(MAX(df) AS BIGINT) FROM dfq) AS max_df,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM tf) AS n_postings
    """,
)
def x_text_index_stats(spark, sf_dir):
    """Persisted-text-index census (operators/retrieval.
    text_index_stats) — the health/maintenance-trigger counterpart of
    ivf/pq_index_stats: docs, total tokens, stored per-mille average
    document length (the BM25 normalizer), vocabulary size, heaviest
    term's df (stop-word saturation signal), postings volume.  The
    oracle recomputes every number from the raw corpus — so this key
    value-checks that the index's PERSISTED statistics stay faithful to
    the corpus through the build path (the numbers BM25 scoring
    actually reads)."""
    import shutil as _shutil

    from lwetl_spark.operators.retrieval import (
        build_text_index,
        text_index_stats,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    work = _tmpdir("txstats")
    path = os.path.join(work, "index")
    build_text_index(docs, path)
    out = text_index_stats(spark, path).localCheckpoint(eager=True)
    _shutil.rmtree(work, ignore_errors=True)
    return out


@register(
    "x_lsh_incremental",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS index_matches_rebuild
    FROM embeddings
    """,
)
def x_lsh_incremental(spark, sf_dir):
    """Incremental LSH-index lifecycle — completing the maintenance
    symmetry across all persisted ANN indexes (x_ivf_incremental,
    x_pq_incremental, this): build on the even-id half,
    `update_lsh_index` with the odd half (fixed-seed plane family from
    `{path}/params`, so appends are EXACTLY a rebuild — no train_df
    anchor needed), purge every vec_id % 10 == 3 (metadata-sized
    buckets rewrite + hash-bucket-pruned vector rewrite).  Probing with
    the full corpus must EQUAL probing a from-scratch build over
    (union minus removed)."""
    import shutil as _shutil

    from lwetl_spark.operators.similarity import (
        build_lsh_index,
        query_lsh_index,
        remove_from_lsh_index,
        update_lsh_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    removed = emb.filter(F.col("vec_id") % 10 == 3).select("vec_id")

    work = _tmpdir("lshinc")
    inc_path = os.path.join(work, "inc")
    ref_path = os.path.join(work, "ref")
    build_lsh_index(even, inc_path)
    update_lsh_index(spark, inc_path, odd)
    remove_from_lsh_index(spark, inc_path, removed)
    build_lsh_index(emb.join(removed, "vec_id", "left_anti"), ref_path)

    inc = query_lsh_index(spark, inc_path, emb, k=5)
    ref = query_lsh_index(spark, ref_path, emb, k=5)
    cols = ["id", "neighbor_id", "cos", "rank"]
    a = inc.groupBy(*cols).agg(F.count("*").alias("_ca"))
    b = ref.groupBy(*cols).agg(F.count("*").alias("_cb"))
    mismatches = (
        a.join(b, cols, "full_outer")
        .filter("_ca IS NULL OR _cb IS NULL OR _ca <> _cb")
        .count()
    )
    n_queries = emb.count()
    _shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [(n_queries, mismatches == 0)],
        "n_queries long, index_matches_rebuild boolean",
    )


@register(
    "x_campaign_vectors",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS index_matches_rebuild
    FROM embeddings
    """,
)
def x_campaign_vectors(spark, sf_dir):
    """Dual-index daily-crawl campaign (VERDICT r5 #2): ONE manifest
    diff maintains BOTH the text index and the IVF vector index
    (operators/incremental.ingest_increment with ``embeddings=`` +
    ``vector_index_path=``).  Day 0 bootstraps on the even-id half
    (quantizer trains and freezes on its admitted vectors); day 1
    ingests the full corpus plus 25 duplicate-content ids (rejected by
    the admitted-state dedup, so they enter NEITHER index); day 2's
    full snapshot drops every doc_id % 10 == 3 with
    ``retire_removed=True`` (purged from BOTH indexes).  The final ANN
    probe must EQUAL probing a from-scratch `build_ivf_index` over the
    surviving admitted docs' embeddings with ``train_df=`` the
    bootstrap batch — appends never move the frozen quantizer and
    remove/re-add assigns by the same centroids, so the equality is
    exact (the x_ivf_incremental == rebuild idiom, now reached through
    the composed campaign)."""
    import shutil as _shutil

    from lwetl_spark.operators.incremental import ingest_increment
    from lwetl_spark.operators.similarity import (
        build_ivf_index,
        query_ivf_index,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    work = _tmpdir("campvec")
    man, st, idx, vidx, ref = (
        os.path.join(work, p) for p in ("m", "s", "x", "v", "ref")
    )

    even_docs = docs.filter(F.col("doc_id") % 2 == 0)
    ingest_increment(
        spark, even_docs, man, st, idx,
        embeddings=emb, vector_index_path=vidx,
    )
    # the quantizer froze on the day-0 ADMITTED vectors (content-deduped
    # winners, not the whole even half — at sf0.1 the corpus has real
    # duplicate texts; the r6 parity run caught the even_emb assumption)
    boot_ids = spark.read.parquet(st).select("doc_id").localCheckpoint(
        eager=True
    )
    dupes = (
        even_docs.orderBy("doc_id")
        .limit(25)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    )
    ingest_increment(
        spark, docs.unionByName(dupes), man, st, idx,
        embeddings=emb, vector_index_path=vidx,
    )
    keep = docs.filter(F.col("doc_id") % 10 != 3)
    ingest_increment(
        spark, keep, man, st, idx,
        embeddings=emb, vector_index_path=vidx, retire_removed=True,
    )

    # == rebuild over exactly the currently ADMITTED docs' embeddings,
    # quantizer trained on the bootstrap admissions — the equivalence
    # contract as stated, self-consistent at any scale
    admitted_ids = spark.read.parquet(st).select("doc_id").localCheckpoint(
        eager=True
    )
    boot_emb = emb.join(boot_ids, "doc_id", "left_semi")
    kept_emb = emb.join(admitted_ids, "doc_id", "left_semi")
    build_ivf_index(
        kept_emb, ref, vec_col="embedding", id_col="doc_id",
        train_df=boot_emb,
    )

    inc = query_ivf_index(
        spark, vidx, emb, k=5, vec_col="embedding", id_col="doc_id"
    )
    refq = query_ivf_index(
        spark, ref, emb, k=5, vec_col="embedding", id_col="doc_id"
    )
    cols = ["id", "neighbor_id", "cos", "rank"]
    a = inc.groupBy(*cols).agg(F.count("*").alias("_ca"))
    b = refq.groupBy(*cols).agg(F.count("*").alias("_cb"))
    mismatches = (
        a.join(b, cols, "full_outer")
        .filter("_ca IS NULL OR _cb IS NULL OR _ca <> _cb")
        .count()
    )
    n_queries = emb.count()
    _shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [(n_queries, mismatches == 0)],
        "n_queries long, index_matches_rebuild boolean",
    )


@register(
    "x_auto_maintain",
    """
    SELECT 'ivfpq' AS kind, 'retrain' AS action, 'growth_pm' AS metric,
           CAST(1000 * COUNT(*)
                // SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS metric_pm,
           CAST(1500 AS BIGINT) AS threshold_pm,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           TRUE AS retrain_ok, TRUE AS index_matches_rebuild
    FROM embeddings
    """,
)
def x_auto_maintain(spark, sf_dir):
    """Auto-maintenance policy end-to-end (VERDICT r6 #5;
    operators/maintain.auto_maintain): an IVFADC index built on the
    even-id half and appended with the odd half has outgrown its
    frozen quantizers — growth_pm = 1000·n/n_at_train, EXACT integer
    math the oracle recomputes from vec_id parity counts.  With the
    growth threshold at 1500 the policy must fire 'retrain', refresh
    n_at_train to the full corpus (retrain_ok), and leave the index
    probe-identical to a from-scratch build over the same members
    (index_matches_rebuild) — deterministic fixed-seed trainers make
    the equality exact, not approximate."""
    import shutil as _shutil

    from lwetl_spark.operators.ivfpq import (
        build_ivfpq_index,
        query_ivfpq_index,
        update_ivfpq_index,
    )
    from lwetl_spark.operators.maintain import auto_maintain

    emb = _t(spark, sf_dir, "embeddings")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    work = _tmpdir("automaint")
    path = os.path.join(work, "inc")
    ref = os.path.join(work, "ref")

    build_ivfpq_index(even, path)
    update_ivfpq_index(spark, path, odd)
    decision = auto_maintain(
        spark, path, growth_threshold_pm=1500
    ).collect()[0]

    n_total = emb.count()
    retrain_ok = (
        spark.read.parquet(f"{path}/params").collect()[0]["n_at_train"]
        == n_total
    )
    build_ivfpq_index(emb, ref)  # fresh quantizers over the full corpus,
    # exactly what retrain trained on (same sample rule, same seeds)
    inc = query_ivfpq_index(spark, path, emb, k=5)
    refq = query_ivfpq_index(spark, ref, emb, k=5)
    cols = ["id", "neighbor_id", "cos", "rank"]
    a = inc.groupBy(*cols).agg(F.count("*").alias("_ca"))
    b = refq.groupBy(*cols).agg(F.count("*").alias("_cb"))
    mismatches = (
        a.join(b, cols, "full_outer")
        .filter("_ca IS NULL OR _cb IS NULL OR _ca <> _cb")
        .count()
    )
    _shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [(
            decision["kind"], decision["action"], decision["metric"],
            decision["metric_pm"], decision["threshold_pm"],
            n_total, retrain_ok, mismatches == 0,
        )],
        "kind string, action string, metric string, metric_pm long,"
        " threshold_pm long, n_vectors long, retrain_ok boolean,"
        " index_matches_rebuild boolean",
    )


@register(
    "x_campaign_pq",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS index_matches_rebuild
    FROM embeddings
    """,
)
def x_campaign_pq(spark, sf_dir):
    """Dual-index campaign with the PQ vector family (VERDICT r6 #2:
    `ingest_increment(vector_index_kind='pq')` — the same manifest diff
    that drives x_campaign_vectors' IVF leg now rides the packed-code
    lifecycle: bootstrap builds the PQ index and freezes its codebooks
    on the admitted vectors, day-1 admissions append delta-encoded
    codes, day-2 retirements purge via bucket-pruned rewrites).  The
    final probe must EQUAL probing a from-scratch `build_pq_index` over
    the surviving admitted docs' embeddings with ``train_df=`` the
    bootstrap batch — the x_pq_incremental == rebuild idiom reached
    through the composed campaign."""
    import shutil as _shutil

    from lwetl_spark.operators.incremental import ingest_increment
    from lwetl_spark.operators.similarity import (
        build_pq_index,
        query_pq_index,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    work = _tmpdir("camppq")
    man, st, idx, vidx, ref = (
        os.path.join(work, p) for p in ("m", "s", "x", "v", "ref")
    )

    even_docs = docs.filter(F.col("doc_id") % 2 == 0)
    ingest_increment(
        spark, even_docs, man, st, idx,
        embeddings=emb, vector_index_path=vidx, vector_index_kind="pq",
    )
    # codebooks froze on the day-0 ADMITTED vectors (content-deduped
    # winners — the x_campaign_vectors lesson: the corpus has real
    # duplicate texts at sf0.1)
    boot_ids = spark.read.parquet(st).select("doc_id").localCheckpoint(
        eager=True
    )
    ingest_increment(
        spark, docs, man, st, idx,
        embeddings=emb, vector_index_path=vidx, vector_index_kind="pq",
    )
    keep = docs.filter(F.col("doc_id") % 10 != 3)
    ingest_increment(
        spark, keep, man, st, idx,
        embeddings=emb, vector_index_path=vidx, vector_index_kind="pq",
        retire_removed=True,
    )

    admitted_ids = spark.read.parquet(st).select("doc_id").localCheckpoint(
        eager=True
    )
    boot_emb = emb.join(boot_ids, "doc_id", "left_semi")
    kept_emb = emb.join(admitted_ids, "doc_id", "left_semi")
    build_pq_index(
        kept_emb, ref, vec_col="embedding", id_col="doc_id",
        train_df=boot_emb,
    )

    inc = query_pq_index(
        spark, vidx, emb, k=5, vec_col="embedding", id_col="doc_id"
    )
    refq = query_pq_index(
        spark, ref, emb, k=5, vec_col="embedding", id_col="doc_id"
    )
    cols = ["id", "neighbor_id", "cos", "rank"]
    a = inc.groupBy(*cols).agg(F.count("*").alias("_ca"))
    b = refq.groupBy(*cols).agg(F.count("*").alias("_cb"))
    mismatches = (
        a.join(b, cols, "full_outer")
        .filter("_ca IS NULL OR _cb IS NULL OR _ca <> _cb")
        .count()
    )
    n_queries = emb.count()
    _shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [(n_queries, mismatches == 0)],
        "n_queries long, index_matches_rebuild boolean",
    )


@register(
    "x_bm25_index_roundtrip",
    """
    SELECT CAST(3 AS BIGINT) AS n_queries, TRUE AS index_matches_inline
    """,
)
def x_bm25_index_roundtrip(spark, sf_dir):
    """Persisted-inverted-index round-trip (operators/retrieval.
    build_text_index / query_text_index): postings + doc lengths +
    document frequencies + corpus stats written bucket-partitioned to
    disk, probed with the x_bm25 query set, and asserted EQUAL to the
    inline bm25_topk — build once, probe many, with the probe pruning
    to the buckets its terms hash into.  Same equality contract as the
    LSH/IVF/PQ index round-trips (the bucketed layout is not
    SQL-portable; the equality property is engine-checkable)."""
    from lwetl_spark.operators.retrieval import (
        bm25_topk,
        build_text_index,
        query_text_index,
    )

    docs = _t(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        [(1, "scan"), (1, "table"), (2, "merge"), (2, "sort"), (2, "window"),
         (3, "hash"), (3, "part")],
        "query_id int, term string",
    )
    path = os.path.join(_tmpdir("bm25idx"), "index")
    build_text_index(docs, path)
    idx = query_text_index(spark, path, queries, k=10)
    inline = bm25_topk(docs, queries, k=10)
    cols = ["query_id", "doc_id", "score_ppm", "n_terms", "rnk"]
    a = idx.groupBy(*cols).agg(F.count("*").alias("_ca"))
    b = inline.groupBy(*cols).agg(F.count("*").alias("_cb"))
    mismatches = (
        a.join(b, cols, "full_outer")
        .filter("_ca IS NULL OR _cb IS NULL OR _ca <> _cb")
        .count()
    )
    n_queries = queries.select("query_id").distinct().count()
    return spark.createDataFrame(
        [(n_queries, mismatches == 0)], "n_queries long, index_matches_inline boolean"
    )


@register(
    "x_phrase_search",
    r"""
    WITH toks AS (
        SELECT doc_id, list_filter(
            string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS t
        FROM documents
    ),
    tok AS (
        SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos
        FROM toks
    ),
    ph2(query_id, p1, p2) AS (
        VALUES (1, 'table', 'hash'), (2, 'merge', 'group'), (3, 'big', 'big')
    ),
    m2 AS (
        SELECT ph.query_id, a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
        FROM ph2 ph
        JOIN tok a ON a.tok = ph.p1
        JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
                  AND b.tok = ph.p2
        GROUP BY 1, 2
    ),
    m3 AS (
        SELECT 4 AS query_id, a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
        FROM tok a
        JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
                  AND b.tok = 'order'
        JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
                  AND c.tok = 'group'
        WHERE a.tok = 'fast'
        GROUP BY 1, 2
    ),
    m AS (SELECT * FROM m2 UNION ALL SELECT * FROM m3),
    r AS (
        SELECT query_id, doc_id, n_matches,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY n_matches DESC, doc_id
               ) AS rnk
        FROM m
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, n_matches,
           CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 10
    """,
)
def x_phrase_search(spark, sf_dir):
    """Exact-phrase search over a POSITIONAL text index (VERDICT r6 #3;
    operators/retrieval.build_text_index(positions=True) + phrase_topk):
    postings store each term's sorted token-offset array; a phrase
    matches where ALL its terms sit at consecutive offsets (strict
    adjacency, overlaps counted, repeated terms handled — query 3 is
    'big big').  Top-10 docs per phrase by occurrence count.  FULL
    value oracle: DuckDB rebuilds the token-position table and counts
    the same adjacencies with self-joins — every (query, doc,
    n_matches, rnk) row must match bit-for-bit."""
    import shutil as _shutil

    from lwetl_spark.operators.retrieval import build_text_index, phrase_topk

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    phrases = spark.createDataFrame(
        [(1, "table hash"), (2, "merge group"), (3, "big big"),
         (4, "fast order group")],
        "query_id long, phrase string",
    )
    work = _tmpdir("phrase")
    path = os.path.join(work, "index")
    build_text_index(docs, path, positions=True)
    out = phrase_topk(spark, path, phrases, k=10).localCheckpoint(eager=True)
    _shutil.rmtree(work, ignore_errors=True)
    return out


@register(
    "x_media_sniff",
    """
    SELECT fmt, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT CASE doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                               WHEN 2 THEN 'wav' WHEN 3 THEN 'mp4'
                               ELSE 'unknown' END AS fmt
        FROM documents
    ) GROUP BY 1
    """,
)
def x_media_sniff(spark, sf_dir):
    """Magic-byte format sniffing over REAL container bytes
    (operators/media.sniff_format — one JVM CASE over hex prefixes,
    whole-stage codegen, zero Python): deterministic PNG/JPEG/WAV/junk
    payloads synthesize per doc_id (valid signatures, real structure —
    operators/media generators), the sniffer routes each, and the
    per-format census must equal the id-arithmetic the generator used.
    The routing filter every multimodal ingest runs before any
    per-format decode."""
    from lwetl_spark.operators.media import sniff_format, synth_media_demo

    docs = _t(spark, sf_dir, "documents")
    media = synth_media_demo(docs)
    return (
        media.select(sniff_format("payload").alias("fmt"))
        .groupBy("fmt")
        .agg(F.count("*").cast("long").alias("n"))
    )


@register(
    "x_png_dims",
    """
    SELECT doc_id,
           CAST(1 + doc_id % 64 AS BIGINT) AS width,
           CAST(1 + doc_id % 32 AS BIGINT) AS height,
           CAST(1000000 * (1 + doc_id % 64) // (1 + doc_id % 32) AS BIGINT)
               AS aspect_ppm
    FROM documents WHERE doc_id % 5 = 0
    """,
)
def x_png_dims(spark, sf_dir):
    """PNG dimensions parsed with PURE JVM expressions
    (operators/media.png_dims): IHDR is always the first chunk, so the
    big-endian width/height sit at fixed byte offsets and
    `conv(hex(substring(payload, 17, 4)), 16, 10)` reads them without
    leaving whole-stage codegen — the Spark-first proof that
    fixed-offset container fields never need a UDF.  Payloads are real
    decodable PNGs (valid zlib IDAT, correct CRCs) built from doc_id
    arithmetic; every parsed value must equal that arithmetic."""
    from lwetl_spark.operators.media import png_dims, synth_media_demo

    docs = _t(spark, sf_dir, "documents")
    media = synth_media_demo(docs).filter(F.col("doc_id") % 5 == 0)
    w, h = png_dims("payload")
    return media.select(
        "doc_id",
        w.alias("width"),
        h.alias("height"),
        F.expr("1000000 * width div height").alias("aspect_ppm"),
    ).select("doc_id", "width", "height", "aspect_ppm")


@register(
    "x_media_meta",
    """
    SELECT doc_id,
           CASE doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                           WHEN 2 THEN 'wav' WHEN 3 THEN 'mp4'
                           ELSE 'unknown' END AS fmt,
           CAST(CASE doc_id % 5 WHEN 0 THEN 1 + doc_id % 64
                                WHEN 1 THEN 16 + doc_id % 32
                                WHEN 3 THEN 160 + 16 * (doc_id % 28)
                                ELSE -1 END AS BIGINT) AS width,
           CAST(CASE doc_id % 5 WHEN 0 THEN 1 + doc_id % 32
                                WHEN 1 THEN 16 + doc_id % 16
                                WHEN 3 THEN 90 + 9 * (doc_id % 20)
                                ELSE -1 END AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 5 = 2
                     OR (doc_id % 5 = 3 AND doc_id % 7 <> 0)
                     THEN 1 + doc_id % 2
                     ELSE -1 END AS BIGINT) AS channels,
           CAST(CASE WHEN doc_id % 5 = 2
                     OR (doc_id % 5 = 3 AND doc_id % 7 <> 0)
                     THEN 8000 + 1000 * (doc_id % 8)
                     ELSE -1 END AS BIGINT) AS sample_rate,
           CAST(CASE WHEN doc_id % 5 = 2 THEN 64 + doc_id % 50
                     WHEN doc_id % 5 = 3 AND doc_id % 7 <> 0
                     THEN 400 + doc_id % 600
                     ELSE -1 END AS BIGINT) AS n_samples,
           CAST(CASE WHEN doc_id % 5 = 2
                     THEN 1000 * (64 + doc_id % 50)
                          // (8000 + 1000 * (doc_id % 8))
                     WHEN doc_id % 5 = 3 THEN 500 + doc_id % 4000
                     ELSE -1 END AS BIGINT) AS duration_ms,
           doc_id % 5 <> 4 AS valid
    FROM documents
    """,
)
def x_media_meta(spark, sf_dir):
    """Full container-metadata extraction (operators/media.media_meta —
    the one Arrow pass of the media family): PNG IHDR, JPEG SOF marker-
    segment scan (variable structure — the part that genuinely needs a
    byte walk), WAV RIFF chunk walk with exact-integer duration, and
    structural validation; corrupt/unknown payloads yield
    (fmt='unknown', valid=false, NULL fields) instead of failing the
    batch.  Every field value-checks against the generator's doc_id
    arithmetic — REAL bytes parsed, exact oracle.  Not-applicable
    fields COALESCE to -1 on both sides (the NULL-sentinel parity-
    harness rule; the operator itself keeps honest NULLs)."""
    from lwetl_spark.operators.media import media_meta, synth_media_demo

    docs = _t(spark, sf_dir, "documents")
    out = media_meta(synth_media_demo(docs))
    num_cols = ["width", "height", "channels", "sample_rate",
                "n_samples", "duration_ms"]
    return out.select(
        "doc_id", "fmt",
        *[F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)
          for c in num_cols],
        "valid",
    )


@register(
    "x_mp4_meta",
    """
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'isom' WHEN 1 THEN 'mp42'
                           ELSE 'iso5' END AS brand,
           CAST(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 2 END AS BIGINT)
               AS n_tracks,
           CASE WHEN doc_id % 2 = 0 THEN 'avc1' ELSE 'hev1' END AS v_codec,
           CASE WHEN doc_id % 7 <> 0 THEN 'mp4a' ELSE 'none' END AS a_codec,
           CAST(160 + 16 * (doc_id % 28) AS BIGINT) AS width,
           CAST(90 + 9 * (doc_id % 20) AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 7 <> 0 THEN 1 + doc_id % 2
                     ELSE -1 END AS BIGINT) AS channels,
           CAST(CASE WHEN doc_id % 7 <> 0 THEN 8000 + 1000 * (doc_id % 8)
                     ELSE -1 END AS BIGINT) AS sample_rate,
           CAST(CASE WHEN doc_id % 7 <> 0 THEN 400 + doc_id % 600
                     ELSE -1 END AS BIGINT) AS n_samples,
           CAST(500 + doc_id % 4000 AS BIGINT) AS duration_ms,
           TRUE AS valid
    FROM documents WHERE doc_id % 5 = 3
    """,
)
def x_mp4_meta(spark, sf_dir):
    """MP4 (ISO-BMFF) container census (VERDICT r7 #1 — the last
    container family gets its walk; operators/media.mp4_meta): ftyp
    brand sniff, moov/trak/mdhd/stsd box-tree walk → movie duration_ms
    (1000·duration div mvhd timescale, exact integer), track count,
    video codec fourcc + dimensions from the stsd sample entry, audio
    codec/channels/sample-rate (16.16 fixed) and sample count (the
    sound trak's mdhd duration in its own timescale).  Payloads are
    REAL minimal MP4s built from doc_id arithmetic (the wav_bytes
    idiom — spec-shaped boxes, no coded samples); id%7=0 files are
    video-only, the mixed-track case every crawl contains.  Every
    parsed field value-checks against the same arithmetic in DuckDB;
    not-applicable audio fields COALESCE to -1 / 'none' on both sides
    (the NULL-sentinel parity rule; the operator keeps honest NULLs)."""
    from lwetl_spark.operators.media import mp4_meta, synth_media_demo

    docs = _t(spark, sf_dir, "documents")
    media = synth_media_demo(docs).filter(F.col("doc_id") % 5 == 3)
    out = mp4_meta(media)
    return out.select(
        "doc_id", "brand", "n_tracks", "v_codec",
        F.coalesce(F.col("a_codec"), F.lit("none")).alias("a_codec"),
        "width", "height",
        *[F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)
          for c in ("channels", "sample_rate", "n_samples")],
        "duration_ms", "valid",
    )


@register(
    "x_mkv_meta",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'webm' ELSE 'matroska'
                END AS doctype,
           CAST(500 * (1 + doc_id % 40) AS BIGINT) AS duration_ms,
           CAST(1 + doc_id % 2 AS BIGINT) AS n_tracks,
           CASE doc_id % 3 WHEN 0 THEN 'V_VP9' WHEN 1 THEN 'V_VP8'
                           ELSE 'V_AV1' END AS v_codec,
           CASE WHEN doc_id % 2 = 1 THEN
                CASE WHEN doc_id % 5 < 3 THEN 'A_OPUS' ELSE 'A_VORBIS' END
                ELSE 'none' END AS a_codec,
           CAST(64 + 16 * (doc_id % 8) AS BIGINT) AS width,
           CAST(48 + 16 * (doc_id % 4) AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 2 = 1 THEN 1 + (doc_id % 4) // 2
                     ELSE -1 END AS BIGINT) AS channels,
           CAST(CASE WHEN doc_id % 2 = 1 THEN 16000 * (1 + doc_id % 3)
                     ELSE -1 END AS BIGINT) AS sample_rate,
           doc_id % 19 <> 0 AS valid
    FROM documents WHERE doc_id % 4 = 1
    """,
)
def x_mkv_meta(spark, sf_dir):
    """Matroska/WebM container census (r9, VERDICT r8 #2 — the other
    half of crawl video; operators/media.mkv_meta): EBML varint walk —
    DocType from the EBML header, duration_ms from Segment>Info
    (float Duration × TimestampScale, exact for integer-ms fixtures),
    per-TrackEntry type/CodecID (V_VP9/V_VP8/V_AV1, A_OPUS/A_VORBIS)
    and Video/Audio geometry.  Payloads are REAL minimal Matroska
    built from doc_id arithmetic (the mp4_bytes idiom); every 19th
    file carries a Void element whose size varint lies past its
    Segment — the walker must return the PARTIAL census with
    valid=false (one corrupt file never kills a task).  NULL audio
    fields COALESCE to -1 / 'none' on both sides (the x_mp4_meta
    sentinel rule)."""
    from lwetl_spark.operators.media import mkv_meta, synth_mkv_demo

    docs = _t(spark, sf_dir, "documents")
    media = synth_mkv_demo(docs.filter(F.col("doc_id") % 4 == 1))
    out = mkv_meta(media)
    return out.select(
        "doc_id", "doctype", "duration_ms", "n_tracks", "v_codec",
        F.coalesce(F.col("a_codec"), F.lit("none")).alias("a_codec"),
        "width", "height",
        *[F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)
          for c in ("channels", "sample_rate")],
        "valid",
    )


@register(
    "x_mp4_frames",
    """
    WITH g AS (
        SELECT doc_id, 500 + doc_id % 4000 AS dur, 8 + doc_id % 9 AS nf
        FROM documents WHERE doc_id % 5 = 3
    ),
    fr AS (
        SELECT doc_id, dur // nf AS delta,
               unnest(range(0, nf)) AS j
        FROM g
    ),
    sz AS (
        SELECT doc_id, delta, j,
               50 + (doc_id + 13 * j) % 40 AS size
        FROM fr
    ),
    offs AS (
        SELECT doc_id, delta, j, size,
               COALESCE(SUM(size) OVER (
                   PARTITION BY doc_id ORDER BY j
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS rel_offset
        FROM sz
    ),
    bexp AS (
        SELECT doc_id, j, unnest(range(0, size)) AS k
        FROM sz
    ),
    bsum AS (
        SELECT doc_id, j,
               CAST(SUM((doc_id + 31 * j + 7 * k) % 256) AS BIGINT)
                   AS byte_sum
        FROM bexp GROUP BY doc_id, j
    )
    SELECT o.doc_id, CAST(o.j AS BIGINT) AS frame_idx,
           CAST(o.j * o.delta AS BIGINT) AS pts_ms,
           CAST(o.size AS BIGINT) AS size,
           CAST(o.rel_offset AS BIGINT) AS rel_offset,
           o.j % 4 = 0 AS is_key,
           b.byte_sum
    FROM offs o JOIN bsum b ON o.doc_id = b.doc_id AND o.j = b.j
    """,
)
def x_mp4_frames(spark, sf_dir):
    """REAL MP4 frame extraction (r8; operators/media.mp4_frame_index):
    the fixture MP4s carry a genuine sample table (stts/stss/stsc/stsz/
    stco) and real mdat frame payloads; the walker expands it to
    per-frame presentation times, keyframe flags, and EXACT byte
    ranges, slices each frame out of the payload, and proves the range
    with the sliced bytes' integer sum — which DuckDB recomputes from
    the generator arithmetic (one byte off in offset math and the sum
    moves).  rel_offset (offset minus first-frame offset) is the
    layout-independent form, a pure prefix sum of sizes on both sides.
    This is the walk an ffmpeg-style keyframe sampler performs before
    any codec work; keyframe-only sampling composes as a filter."""
    from lwetl_spark.operators.media import mp4_frame_index, synth_media_demo

    docs = _t(spark, sf_dir, "documents")
    media = synth_media_demo(docs).filter(F.col("doc_id") % 5 == 3)
    return mp4_frame_index(media)


@register(
    "x_mkv_frames",
    """
    WITH g AS (
        SELECT doc_id, 500 + doc_id % 4000 AS dur, 8 + doc_id % 9 AS nf
        FROM documents WHERE doc_id % 6 = 1
    ),
    fr AS (
        SELECT doc_id, dur // nf AS delta,
               unnest(range(0, nf)) AS j
        FROM g
    ),
    sz AS (
        SELECT doc_id, delta, j,
               50 + (doc_id + 13 * j) % 40 AS size
        FROM fr
    ),
    offs AS (
        SELECT doc_id, delta, j, size,
               COALESCE(SUM(size + 6) OVER (
                   PARTITION BY doc_id ORDER BY j
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS rel_offset
        FROM sz
    ),
    bexp AS (
        SELECT doc_id, j, unnest(range(0, size)) AS k
        FROM sz
    ),
    bsum AS (
        SELECT doc_id, j,
               CAST(SUM((doc_id + 31 * j + 7 * k) % 256) AS BIGINT)
                   AS byte_sum
        FROM bexp GROUP BY doc_id, j
    )
    SELECT o.doc_id, CAST(o.j AS BIGINT) AS frame_idx,
           CAST(o.j * o.delta AS BIGINT) AS pts_ms,
           CAST(o.size AS BIGINT) AS size,
           CAST(o.rel_offset AS BIGINT) AS rel_offset,
           o.j % 4 = 0 AS is_key,
           b.byte_sum
    FROM offs o JOIN bsum b ON o.doc_id = b.doc_id AND o.j = b.j
    """,
)
def x_mkv_frames(spark, sf_dir):
    """REAL Matroska/WebM frame extraction (r9; operators/media.
    mkv_frame_index — the EBML counterpart of x_mp4_frames, same
    arithmetic model so the two container walks cross-check one
    oracle): the fixture WebMs carry a genuine Cluster of SimpleBlocks
    with real frame payloads; the walker parses each block's
    track-number varint, int16 relative timestamp (scaled by
    TimestampScale to exact ms), and keyframe flag, recovers the EXACT
    frame byte range, slices it, and proves the range with the sliced
    bytes' integer sum.  rel_offset on this layout is a prefix sum of
    (size + 6) — the 6 covers each following block's 2-byte EBML
    id+size header and 4 block-header bytes, so one header byte of
    drift in the walk moves every later offset and fails the oracle."""
    from lwetl_spark.operators.media import (
        mkv_frame_index,
        synth_mkv_frames_demo,
    )

    docs = _t(spark, sf_dir, "documents")
    media = synth_mkv_frames_demo(docs.filter(F.col("doc_id") % 6 == 1))
    return mkv_frame_index(media)


@register(
    "x_webp_meta",
    """
    SELECT doc_id, 'webp' AS fmt,
           CASE doc_id % 3 WHEN 0 THEN 'vp8' WHEN 1 THEN 'vp8l'
                           ELSE 'vp8x' END AS variant,
           CAST(4 + doc_id % 200 AS BIGINT) AS width,
           CAST(4 + doc_id % 100 AS BIGINT) AS height,
           doc_id % 11 <> 0 AS valid
    FROM documents
    """,
)
def x_webp_meta(spark, sf_dir):
    """WebP container parsing (r8; operators/media — the other big
    image format of a real crawl): RIFF/WEBP chunk walk in the shared
    Arrow pass, dims from whichever bitstream variant leads — 'VP8 '
    lossy keyframe header (0x9D012A start code, 14-bit LE dims),
    'VP8L' lossless (0x2F + packed 14+14-bit dims-1), 'VP8X' extended
    (24-bit canvas dims-1) — and the variant fourcc read as a PURE JVM
    expression (substring at the fixed chunk offset; the
    png_dims-style proof that fixed-offset fields never need Python).
    The corrupt leg (lying RIFF size) must keep its parsed dims and
    flip valid=false.  Every field value-checks against the generator
    arithmetic."""
    from lwetl_spark.operators.media import media_meta, synth_webp_demo

    docs = _t(spark, sf_dir, "documents")
    media = synth_webp_demo(docs).localCheckpoint(eager=True)
    variant = media.select(
        "doc_id",
        F.lower(F.trim(F.decode(F.substring("payload", 13, 4), "UTF-8")))
        .alias("variant"),
    )
    meta = media_meta(media).select("doc_id", "fmt", "width", "height", "valid")
    return meta.join(variant.hint("shuffle_hash"), "doc_id").select(
        "doc_id", "fmt", "variant", "width", "height", "valid"
    )


@register(
    "x_video_dedup",
    """
    WITH g AS (
        SELECT doc_id, doc_id % 32 AS s FROM documents
    ),
    fr AS (
        SELECT doc_id, s, unnest(range(0, 6 + s % 5)) AS j FROM g
    ),
    sz AS (
        SELECT doc_id, s, j, 40 + (s + 13 * j) % 32 AS size FROM fr
    ),
    bexp AS (SELECT doc_id, s, j, size, unnest(range(0, size)) AS k FROM sz),
    bsum AS (
        SELECT doc_id, s, j, CAST(MAX(size) AS BIGINT) AS size,
               CAST(SUM((s + 31 * j + 7 * k) % 256) AS BIGINT) AS byte_sum
        FROM bexp GROUP BY doc_id, s, j
    ),
    fp AS (
        SELECT doc_id, s,
               md5(string_agg(printf('%06d:%d:%d', j, size, byte_sum),
                              ',' ORDER BY j)) AS fingerprint
        FROM bsum GROUP BY doc_id, s
    )
    SELECT fingerprint, CAST(MIN(doc_id) AS BIGINT) AS rep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_dups
    FROM fp GROUP BY fingerprint
    """,
)
def x_video_dedup(spark, sf_dir):
    """Container-aware video dedup (r8; operators/media.
    video_fingerprint): re-muxed duplicates share coded FRAMES, not
    container headers — the fixture gives ids congruent mod 32
    identical frame content under different dims/brand/duration, so a
    container-level hash finds nothing while the frame-level digest
    (md5 over ordered (frame_idx, size, byte_sum) triples from the
    sample-table walk) groups them exactly.  The oracle recomputes THE
    SAME md5 from the generator arithmetic (DuckDB string_agg ORDER BY
    j + printf), so the digest string itself is value-checked, not
    just the group census.  Frame bytes never shuffle; the only
    exchange carries (doc_id, triple-string) rows."""
    from lwetl_spark.operators.media import (
        synth_video_dup_demo,
        video_fingerprint,
    )

    docs = _t(spark, sf_dir, "documents")
    fp = video_fingerprint(synth_video_dup_demo(docs))
    return fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("rep_doc_id"),
        F.count("*").alias("n_dups"),
    )


@register(
    "x_paragraph_dedup",
    r"""
    WITH toks AS (
        SELECT doc_id, list_filter(
            string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
        FROM documents
    ),
    paras AS (
        SELECT doc_id, CAST(gi AS BIGINT) AS pos,
               array_to_string(t[gi * 8 + 1 : gi * 8 + 8], ' ') AS para
        FROM toks, unnest(range(0, (len(t) + 7) // 8)) AS u(gi)
    ),
    win AS (
        SELECT para, MIN(doc_id * 1048576 + pos) AS wk
        FROM paras GROUP BY para
    ),
    kept AS (
        SELECT p.doc_id, p.pos, p.para
        FROM paras p JOIN win ON p.para = win.para
        WHERE p.doc_id * 1048576 + p.pos = win.wk
    ),
    agg AS (
        SELECT doc_id, string_agg(para, chr(10) ORDER BY pos) AS text,
               CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM kept GROUP BY doc_id
    ),
    tot AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras
        FROM paras GROUP BY doc_id
    )
    SELECT t.doc_id, COALESCE(a.text, '') AS text, t.n_paras,
           CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept
    FROM tot t LEFT JOIN agg a ON t.doc_id = a.doc_id
    """,
)
def x_paragraph_dedup(spark, sf_dir):
    """Paragraph-level dedup with document reassembly (r9 —
    CCNet/Dolma's sub-document dedup; operators/dedup.paragraph_dedup):
    documents are chunked into 8-token paragraphs (pure expressions on
    both engines — the template-heavy corpus repeats chunks across
    docs by construction), each paragraph keeps only its FIRST corpus
    occurrence (min (doc_id, pos), computed as ONE partial-combining
    min-struct agg — skew-safe where a per-fingerprint window is not),
    and every document is rewritten from its surviving paragraphs.
    The oracle rebuilds the chunking, the winner rule (doc_id·2^20+pos
    ≡ the struct ordering since pos < 2^20), and the REASSEMBLED TEXT
    itself — the full cleaned document strings hash-check
    cross-engine."""
    from lwetl_spark.operators.dedup import paragraph_dedup

    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(toks)
    paras = F.when(n > 0, F.transform(
        F.sequence(F.lit(0), F.ceil(n / F.lit(8)) - 1),
        lambda i: F.array_join(F.slice(toks, i * 8 + 1, 8), " "),
    )).otherwise(F.array().cast("array<string>"))
    structured = docs.select(
        "doc_id", F.array_join(paras, "\n").alias("text")
    )
    return paragraph_dedup(structured)


@register(
    "x_image_dhash",
    """
    WITH g AS (
        SELECT doc_id, doc_id % 32 AS s,
               8 + 4 * ((doc_id % 32) % 5) AS w,
               8 + 4 * ((doc_id % 32) % 3) AS h
        FROM documents
    ),
    rr AS (SELECT *, unnest(range(0, 8)) AS r FROM g),
    cc AS (SELECT *, unnest(range(0, 9)) AS c FROM rr),
    v AS (
        SELECT doc_id, w, h, r, c,
               (s + 7 * ((r * h) // 8) + 13 * ((c * w) // 9)) % 256 AS v
        FROM cc
    ),
    bits AS (
        SELECT doc_id, w, h, r, c, r * 8 + c AS idx,
               CASE WHEN v > LEAD(v) OVER (PARTITION BY doc_id, r
                                           ORDER BY c)
                    THEN 1 ELSE 0 END AS bit
        FROM v
    ),
    hs AS (
        SELECT doc_id, MAX(w) AS w, MAX(h) AS h,
               CAST(SUM(CASE WHEN c < 8 AND idx >= 32 AND bit = 1
                             THEN (1::BIGINT << (idx - 32))
                             ELSE 0 END) AS BIGINT) AS hi,
               CAST(SUM(CASE WHEN c < 8 AND idx < 32 AND bit = 1
                             THEN (1::BIGINT << idx)
                             ELSE 0 END) AS BIGINT) AS lo
        FROM bits GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 23 <> 0 THEN w ELSE -1 END
                AS BIGINT) AS width,
           CAST(CASE WHEN doc_id % 23 <> 0 THEN h ELSE -1 END
                AS BIGINT) AS height,
           CASE WHEN doc_id % 23 <> 0
                THEN printf('%08x%08x', hi, lo) ELSE 'none' END AS dhash,
           doc_id % 23 <> 0 AS ok
    FROM hs
    """,
)
def x_image_dhash(spark, sf_dir):
    """Perceptual image difference-hash (r9; operators/media.
    image_dhash) — the image-side dedup fingerprint: decode the REAL
    PNGs (five-filter reconstruction), nearest-neighbor resample to
    the canonical 8×9 grid (exact integer index math), pack the 64
    horizontal-gradient bits, emit 16-hex strings.  The fixture makes
    ids congruent mod 32 image-duplicates (same dims + pixel pattern),
    so equal hashes group them; the oracle recomputes EVERY HASH
    BIT from the generator arithmetic (LEAD over the sampled grid),
    split hi/lo to stay inside BIGINT for printf.  Corrupt PNGs
    (every 23rd id, broken IDAT zlib stream) must yield ok=false,
    never a task failure; NULL fields COALESCE to -1 / 'none' on both
    sides (the x_mp4_meta sentinel rule — the operator keeps honest
    NULLs)."""
    from lwetl_spark.operators.media import (
        image_dhash,
        synth_image_dup_demo,
    )

    docs = _t(spark, sf_dir, "documents")
    out = image_dhash(synth_image_dup_demo(docs))
    return out.select(
        "doc_id",
        F.coalesce(F.col("width"), F.lit(-1)).cast("long").alias("width"),
        F.coalesce(F.col("height"), F.lit(-1)).cast("long").alias("height"),
        F.coalesce(F.col("dhash"), F.lit("none")).alias("dhash"),
        "ok",
    )


@register(
    "x_video_dedup_xc",
    """
    WITH g AS (
        SELECT doc_id, doc_id % 32 AS s FROM documents
    ),
    fr AS (
        SELECT doc_id, s, unnest(range(0, 6 + s % 5)) AS j FROM g
    ),
    sz AS (
        SELECT doc_id, s, j, 40 + (s + 13 * j) % 32 AS size FROM fr
    ),
    bexp AS (SELECT doc_id, s, j, size, unnest(range(0, size)) AS k FROM sz),
    bsum AS (
        SELECT doc_id, s, j, CAST(MAX(size) AS BIGINT) AS size,
               CAST(SUM((s + 31 * j + 7 * k) % 256) AS BIGINT) AS byte_sum
        FROM bexp GROUP BY doc_id, s, j
    ),
    fp AS (
        SELECT doc_id, s,
               md5(string_agg(printf('%06d:%d:%d', j, size, byte_sum),
                              ',' ORDER BY j)) AS fingerprint
        FROM bsum GROUP BY doc_id, s
    )
    SELECT fingerprint, CAST(MIN(doc_id) AS BIGINT) AS rep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_dups,
           COUNT(*) FILTER (WHERE doc_id % 2 = 0) > 0
               AND COUNT(*) FILTER (WHERE doc_id % 2 = 1) > 0
               AS spans_containers
    FROM fp GROUP BY fingerprint
    """,
)
def x_video_dedup_xc(spark, sf_dir):
    """CROSS-CONTAINER video dedup (r9; operators/media.
    video_fingerprint, now container-agnostic): the fixture muxes the
    SAME coded frames into MP4 for even ids and WebM SimpleBlocks for
    odd ids — a re-wrap no container-level hash can see through.  The
    sniff-routed frame walks (mp4_frame_index / mkv_frame_index)
    produce identical (frame_idx, size, byte_sum) triples for both
    wrappers, so ids congruent mod 32 share one digest across
    families; `spans_containers` pins that every group really holds
    BOTH parities (a silently dropped format would shrink the group
    and fail both the count and the flag).  The oracle recomputes the
    md5 digests themselves from the generator arithmetic."""
    from lwetl_spark.operators.media import (
        synth_video_dup_xc_demo,
        video_fingerprint,
    )

    docs = _t(spark, sf_dir, "documents")
    fp = video_fingerprint(synth_video_dup_xc_demo(docs))
    return fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("rep_doc_id"),
        F.count("*").alias("n_dups"),
        (
            (F.count(F.when(F.col("doc_id") % 2 == 0, 1)) > 0)
            & (F.count(F.when(F.col("doc_id") % 2 == 1, 1)) > 0)
        ).alias("spans_containers"),
    )


@register(
    "x_gzip_ingest",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 13 <> 0 THEN md5(text)
                ELSE 'none' END AS text_md5,
           CAST(CASE WHEN doc_id % 13 <> 0 THEN length(text)
                     ELSE -1 END AS BIGINT) AS n_chars,
           doc_id % 13 <> 0 AS ok
    FROM documents
    """,
)
def x_gzip_ingest(spark, sf_dir):
    """Gzip ingestion gate (r8; operators/media.gunzip_text): documents
    round-trip through REAL gzip members (stdlib zlib, deterministic
    wbits=31 wrapper) and the gate inflates them back — the
    decompression step in front of any WARC-style crawl archive.  The
    oracle checks the round trip against the ORIGINAL table (md5 +
    char count must survive compress→inflate exactly); the corrupt leg
    (every 13th member truncated, trailer CRC gone) must come back
    ok=false with NULL text — zlib's own integrity check is the
    detector, never a task failure."""
    from lwetl_spark.operators.media import gunzip_text, synth_gzip_demo

    docs = _t(spark, sf_dir, "documents")
    out = gunzip_text(synth_gzip_demo(docs))
    return out.select(
        "doc_id",
        F.coalesce(F.md5(F.col("text").cast("binary")), F.lit("none"))
        .alias("text_md5"),
        F.coalesce(F.col("n_chars"), F.lit(-1)).cast("long").alias("n_chars"),
        "ok",
    )


@register(
    "x_png_pixels",
    """
    WITH g AS (
        SELECT doc_id, 2 + doc_id % 16 AS w, 1 + doc_id % 8 AS h,
               doc_id % 256 AS seed
        FROM documents WHERE doc_id % 2 = 0
    ),
    rr AS (SELECT doc_id, w, h, seed, unnest(range(0, h)) AS r FROM g),
    px AS (
        SELECT doc_id, w, h,
               (seed + 7 * r + 13 * unnest(range(0, w))) % 256 AS v
        FROM rr
    )
    SELECT doc_id, CAST(MAX(w) AS BIGINT) AS width,
           CAST(MAX(h) AS BIGINT) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_px,
           CAST(SUM(v) AS BIGINT) AS sum_px,
           CAST(MIN(v) AS BIGINT) AS min_px,
           CAST(MAX(v) AS BIGINT) AS max_px
    FROM px GROUP BY doc_id
    """,
)
def x_png_pixels(spark, sf_dir):
    """REAL PNG pixel decode, no image library (operators/media.
    png_pixel_stats): zlib-inflate the IDAT and run the spec's
    scanline reconstruction (all five filters; the fixture mixes
    None and Sub rows so un-filtering must actually happen), then
    exact integer pixel stats.  Every decoded pixel value-checks
    against the generator arithmetic the oracle recomputes — this key
    retires the 'pixel decode is stubbed' caveat for PNG."""
    from lwetl_spark.operators.media import (
        png_pixel_stats,
        synth_pixel_media_demo,
    )

    docs = _t(spark, sf_dir, "documents")
    media = synth_pixel_media_demo(docs).filter(F.col("doc_id") % 2 == 0)
    return png_pixel_stats(media)


@register(
    "x_jpeg_pixels",
    """
    WITH g AS (
        SELECT doc_id, 16 + doc_id % 32 AS w, 16 + doc_id % 16 AS h,
               (16 + doc_id % 32 + 7) // 8 AS bxn,
               (16 + doc_id % 16 + 7) // 8 AS byn
        FROM documents WHERE doc_id % 5 = 1
    ),
    blk AS (
        SELECT doc_id, w, h, bxn,
               unnest(range(0, bxn * byn)) AS b
        FROM g
    ),
    blk2 AS (
        SELECT doc_id, w, h, b % bxn AS bx, b // bxn AS by,
               (doc_id + 17 * b) % 112 - 56 AS d,
               (doc_id + 5 * b) % 13 AS a
        FROM blk
    ),
    rr AS (SELECT *, unnest(range(0, 8)) AS yy FROM blk2),
    px AS (
        SELECT doc_id, w, h,
               128 + d + CASE WHEN yy IN (0, 3, 4, 7) THEN a ELSE -a END AS v,
               LEAST(8, w - 8 * bx) AS ncols
        FROM rr WHERE 8 * by + yy < h
    )
    SELECT doc_id, CAST(MAX(w) AS BIGINT) AS width,
           CAST(MAX(h) AS BIGINT) AS height,
           CAST(MAX(w) * MAX(h) AS BIGINT) AS n_px,
           CAST(SUM(v * ncols) AS BIGINT) AS sum_px,
           CAST(MIN(v) AS BIGINT) AS min_px,
           CAST(MAX(v) AS BIGINT) AS max_px
    FROM px GROUP BY doc_id
    """,
)
def x_jpeg_pixels(spark, sf_dir):
    """REAL baseline-JPEG pixel decode, no image library (VERDICT r7
    #2 — closes the decode honesty ledger; operators/media.
    jpeg_pixel_stats): the mixed fixture's JPEG leg is now fully
    entropy-coded (in-file canonical Huffman tables, bit-stuffed data),
    and the decoder runs the whole T.81 baseline pipeline — Huffman
    decode, zigzag dequantization, IDCT, level shift, crop to SOF dims
    — then exact integer pixel stats.  The coefficient model (DC +
    one AC at zigzag 10 with Q=8) makes the IDCT exact integer math:
    pixel(y, x) = 128 + dc(block) ± ac(block), which DuckDB recomputes
    for EVERY pixel including the cropped right/bottom block edges.
    The oracle and the decoder agree only if Huffman tables, DC
    prediction chain, run-lengths, dequant, IDCT, and cropping are all
    bit-faithful."""
    from lwetl_spark.operators.media import jpeg_pixel_stats, synth_media_demo

    docs = _t(spark, sf_dir, "documents")
    media = synth_media_demo(docs).filter(F.col("doc_id") % 5 == 1)
    return jpeg_pixel_stats(media)


@register(
    "x_exif_meta",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
           CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
           printf('%04d:%02d:%02d %02d:%02d:%02d',
                  2015 + doc_id % 10, 1 + doc_id % 12, 1 + doc_id % 28,
                  doc_id % 24, doc_id % 60, doc_id % 60) AS taken_at,
           CAST(16 + doc_id % 32 AS BIGINT) AS width,
           CAST(16 + doc_id % 16 AS BIGINT) AS height,
           CAST(CASE WHEN 1 + doc_id % 8 >= 5 THEN 16 + doc_id % 16
                     ELSE 16 + doc_id % 32 END AS BIGINT) AS norm_width,
           CAST(CASE WHEN 1 + doc_id % 8 >= 5 THEN 16 + doc_id % 32
                     ELSE 16 + doc_id % 16 END AS BIGINT) AS norm_height,
           TRUE AS valid
    FROM documents WHERE doc_id % 5 = 1
    """,
)
def x_exif_meta(spark, sf_dir):
    """EXIF orientation/timestamp parse (VERDICT r7 #5; operators/
    media.exif_meta): the fixture JPEGs carry a REAL APP1 — "Exif\\0\\0"
    + TIFF header + IFD0 with Orientation (tag 274, SHORT) and DateTime
    (tag 306, ASCII via offset), byte order alternating II/MM by id
    parity so BOTH endiannesses are exercised.  The operator walks the
    marker segments, parses the TIFF structure, and emits the
    orientation-NORMALIZED geometry (orientations 5-8 transpose the
    raster — the dims a resolution gate must actually use).  Every
    field value-checks against the id arithmetic, including the
    printf-rebuilt timestamp string."""
    from lwetl_spark.operators.media import exif_meta, synth_media_demo

    docs = _t(spark, sf_dir, "documents")
    media = synth_media_demo(docs).filter(F.col("doc_id") % 5 == 1)
    return exif_meta(media)


@register(
    "x_png_resize",
    """
    WITH g AS (
        SELECT doc_id, 2 + doc_id % 16 AS ws, 1 + doc_id % 8 AS hs,
               doc_id % 256 AS seed
        FROM documents WHERE doc_id % 2 = 0
    ),
    t AS (SELECT doc_id, ws, hs, seed, unnest(range(0, 4)) AS r FROM g),
    px AS (
        SELECT doc_id,
               (seed + 7 * ((r * hs) // 4)
                + 13 * ((unnest(range(0, 4)) * ws) // 4)) % 256 AS v
        FROM t
    )
    SELECT doc_id, CAST(16 AS BIGINT) AS n_px,
           CAST(SUM(v) AS BIGINT) AS sum_px,
           CAST(MIN(v) AS BIGINT) AS min_px,
           CAST(MAX(v) AS BIGINT) AS max_px,
           TRUE AS roundtrip_ok
    FROM px GROUP BY doc_id
    """,
)
def x_png_resize(spark, sf_dir):
    """REAL PNG thumbnailing end-to-end (r8; operators/media.
    png_thumbnails): decode the patterned fixture PNGs (five-filter
    reconstruction), nearest-neighbor resample to 4×4 (src index =
    floor(dst·src/4) — exact integer arithmetic), re-encode as REAL
    PNGs, then DECODE THE THUMBNAILS AGAIN (png_pixel_stats) and emit
    their pixel stats — a decode→resample→encode→decode chain whose
    every pixel the oracle recomputes from the generator arithmetic.
    The md5-level proof that the re-encoded thumbnails are genuine
    PNGs: the second decode only works if the first encode wrote valid
    zlib IDAT + CRCs."""
    from lwetl_spark.operators.media import (
        png_pixel_stats,
        png_thumbnails,
        synth_pixel_media_demo,
    )

    docs = _t(spark, sf_dir, "documents")
    media = synth_pixel_media_demo(docs).filter(F.col("doc_id") % 2 == 0)
    thumbs = png_thumbnails(media, width=4, height=4).select(
        "doc_id", F.col("thumb").alias("payload")
    )
    stats = png_pixel_stats(thumbs)
    return stats.select(
        "doc_id", "n_px", "sum_px", "min_px", "max_px",
        (F.col("n_px") == 16).alias("roundtrip_ok"),
    )


@register(
    "x_jpeg_color",
    """
    WITH g AS (
        SELECT doc_id, 8 * (1 + doc_id % 3) AS w, 8 * (1 + doc_id % 2) AS h,
               (1 + doc_id % 3) AS bxn
        FROM documents
    ),
    blk AS (
        SELECT doc_id, w, h, bxn,
               unnest(range(0, bxn * (h // 8))) AS b
        FROM g
    ),
    blk2 AS (
        SELECT doc_id, w, h,
               (doc_id + 17 * b) % 112 - 56 AS d,
               (doc_id + 5 * b) % 13 AS a
        FROM blk
    ),
    rr AS (SELECT *, unnest(range(0, 8)) AS yy FROM blk2),
    px AS (
        SELECT doc_id, w, h,
               128 + d + CASE WHEN yy IN (0, 3, 4, 7) THEN a ELSE -a END AS v
        FROM rr
    )
    SELECT doc_id, CAST(MAX(w) AS BIGINT) AS width,
           CAST(MAX(h) AS BIGINT) AS height,
           CAST(3 * MAX(w) * MAX(h) AS BIGINT) AS n_px,
           CAST(3 * 8 * SUM(v) AS BIGINT) AS sum_px,
           CAST(MIN(v) AS BIGINT) AS min_px,
           CAST(MAX(v) AS BIGINT) AS max_px
    FROM px GROUP BY doc_id
    """,
)
def x_jpeg_color(spark, sf_dir):
    """REAL color-JPEG decode (r8 scope extension; operators/media.
    decode_jpeg): 3-component YCbCr 4:4:4 baseline — two quant tables,
    four in-file Huffman tables, three interleaved blocks per MCU with
    independent DC predictors, BT.601 color conversion.  The fixture's
    neutral chroma makes R = G = B = Y EXACTLY, so DuckDB recomputes
    every decoded RGB value from the Y-plane arithmetic (n_px and sums
    count all three channels; each per-row value v covers 8 columns ×
    3 channels).  Subsampled streams decode via the r9 generic MCU
    loop (x_jpeg_420); progressive via the r9 multi-scan path
    (x_jpeg_progressive)."""
    from lwetl_spark.operators.media import (
        jpeg_pixel_stats,
        synth_color_jpeg_demo,
    )

    docs = _t(spark, sf_dir, "documents")
    return jpeg_pixel_stats(synth_color_jpeg_demo(docs))


@register(
    "x_bmp_meta",
    """
    SELECT doc_id,
           CAST(16 + doc_id % 100 AS BIGINT) AS width,
           CAST(16 + doc_id % 60 AS BIGINT) AS height,
           CAST(24 AS BIGINT) AS bpp,
           doc_id % 4 = 0 AS top_down
    FROM documents WHERE doc_id % 2 = 0
    """,
)
def x_bmp_meta(spark, sf_dir):
    """BMP geometry as PURE JVM expressions (r9; operators/media.
    bmp_dims — the png_dims idiom for the other fixed-offset format
    crawls actually contain): little-endian 32-bit fields parsed by
    reversing the hex of per-byte substrings inside whole-stage
    codegen, INCLUDING the sign extension real BMPs need (negative
    height = top-down row order — every 4th fixture).  No UDF, no
    Arrow pass; the oracle recomputes dims/orientation from id
    arithmetic."""
    from lwetl_spark.operators.media import bmp_dims, synth_bmp_demo

    docs = _t(spark, sf_dir, "documents")
    media = synth_bmp_demo(docs.filter(F.col("doc_id") % 2 == 0))
    w, h, bpp = bmp_dims("payload")
    return media.select(
        "doc_id",
        F.abs(w).alias("width"),
        F.abs(h).alias("height"),
        bpp.alias("bpp"),
        (h < 0).alias("top_down"),
    )


@register(
    "x_warc_ingest",
    r"""
    WITH sub AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 4 = 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_shards,
           CAST(COUNT(*) AS BIGINT) AS n_responses,
           CAST(COUNT(DISTINCT lower(trim(regexp_replace(
                'page ' || CASE doc_id % 3 WHEN 1 THEN '€ '
                           WHEN 2 THEN '页 ' ELSE '' END || text,
                '\s+', ' ', 'g')))) AS BIGINT)
               AS n_admitted,
           TRUE AS index_matches_fresh,
           TRUE AS no_readmission
    FROM sub
    """,
)
def x_warc_ingest(spark, sf_dir):
    """The FULL web-crawl ingest loop composed end-to-end (r9 — the
    WARC-side mirror of x_webdataset_campaign): WARC shards →
    `warc_payloads` (header walk, exact Content-Length body slices) →
    response bodies → `sniff_decode_html` charset resolution (r11:
    BOM → Content-Type → <meta> → UTF-8 probe → latin-1; the fixture
    rotates utf-8 / windows-1252 / gbk pages whose € / 页 prefixes
    value-check char-exact through the distinct-count) → `html_text`
    boilerplate strip (script/title/
    tags/comment dropped, whitespace collapsed — pure JVM regex
    chain) → `ingest_increment` (manifest diff + content dedup +
    index maintenance).  Contracts, all oracle-checked: (a)
    n_admitted = the distinct count of cleaned texts (the oracle
    replays the 'page ' + collapse normalization — duplicate document
    texts dedup to one admission); (b) the campaign-maintained index
    equals a fresh build over the admitted set; (c) re-crawling the
    same shards admits nothing."""
    import os as _os
    import shutil as _shutil

    from lwetl_spark.functions.text import html_text
    from lwetl_spark.operators.incremental import ingest_increment
    from lwetl_spark.operators.media import (
        http_response_parts,
        sniff_decode_html,
        synth_warc_html_demo,
        warc_payloads,
    )
    from lwetl_spark.operators.retrieval import (
        build_text_index,
        query_text_index,
    )

    docs = _t(spark, sf_dir, "documents")
    sub = docs.filter(F.col("doc_id") % 4 == 3)
    shards = synth_warc_html_demo(sub)
    members = warc_payloads(shards).localCheckpoint(eager=True)
    # HTTP-message split + charset-sniffed decode (r11): half the
    # fixture responses are FULL HTTP messages (and id%6==4 declares
    # the charset only in the Content-Type header); pages rotate
    # utf-8 / windows-1252 (http-equiv) / gbk (<meta charset>) — a
    # hard-UTF-8 decode would mojibake the € / 页 body prefixes
    parts = http_response_parts(
        members.filter(F.col("rec_type") == "response")
        .select("doc_id", "rec_idx", "payload"))
    cleaned = (
        sniff_decode_html(
            parts.filter(F.col("status").isNull()
                         | (F.col("status") == 200))
            .select("doc_id", "body", "content_type"),
            payload_col="body", content_type_col="content_type")
        .select("doc_id", html_text(F.col("html")).alias("text"))
        .localCheckpoint(eager=True)
    )
    work = _tmpdir("warcingest")
    man, state, idx = (
        _os.path.join(work, p) for p in ("manifest", "state", "index")
    )
    r1 = ingest_increment(spark, cleaned, man, state, idx)
    admitted = spark.read.parquet(state).select("doc_id")
    fresh_path = _os.path.join(work, "fresh")
    build_text_index(
        cleaned.join(admitted, "doc_id", "left_semi"), fresh_path
    )
    probes = spark.createDataFrame(
        [(1, "page"), (2, "table"), (3, "scan"), (4, "merge")],
        "query_id int, term string",
    )
    cols = ["query_id", "doc_id", "score_ppm", "n_terms", "rnk"]
    a = query_text_index(spark, idx, probes, k=10).groupBy(*cols).agg(
        F.count("*").alias("_ca")
    )
    b = query_text_index(spark, fresh_path, probes, k=10).groupBy(
        *cols
    ).agg(F.count("*").alias("_cb"))
    mismatches = (
        a.join(b, cols, "full_outer")
        .filter("_ca IS NULL OR _cb IS NULL OR _ca <> _cb")
        .count()
    )
    r2 = ingest_increment(spark, cleaned, man, state, idx)
    n_shards = sub.count()
    n_responses = members.filter(F.col("rec_type") == "response").count()
    _shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [(
            int(n_shards), int(n_responses), int(r1["n_admitted"]),
            mismatches == 0, int(r2["n_admitted"]) == 0,
        )],
        "n_shards long, n_responses long, n_admitted long,"
        " index_matches_fresh boolean, no_readmission boolean",
    )


@register(
    "x_heif_meta",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'heic' ELSE 'avif' END
               AS brand,
           CAST(CASE WHEN doc_id % 17 = 0 THEN doc_id % 3
                     ELSE 1 + doc_id % 3 END AS BIGINT) AS n_ispe,
           CAST(CASE WHEN doc_id % 17 = 0 AND doc_id % 3 = 0 THEN -1
                     ELSE 256 + doc_id % 512 END AS BIGINT) AS width,
           CAST(CASE WHEN doc_id % 17 = 0 AND doc_id % 3 = 0 THEN -1
                     ELSE 192 + doc_id % 384 END AS BIGINT) AS height,
           doc_id % 17 <> 0 AS valid
    FROM documents
    """,
)
def x_heif_meta(spark, sf_dir):
    """HEIF/AVIF census (r10; operators/media.heif_meta) — the image
    formats phones (heic) and AV1-era sites (avif) actually serve:
    ftyp brand + the meta→iprp→ipco walk to every ispe image extent,
    with 'meta' handled as the FULLBOX it is (the classic parser
    trap).  The primary extent is the first ispe; fixtures carry
    id%3 extra thumbnail extents.  Every 17th id's LAST ispe lies its
    size past ipco: earlier extents survive, valid=false — when the
    LYING one was the only extent (id%3==0) the censys is honest
    NULLs.  sniff_format routes the heif brand family separately
    from mp4 (an image gate that loses phone photos to the video
    walker is wrong)."""
    from lwetl_spark.operators.media import heif_meta, synth_heif_demo

    docs = _t(spark, sf_dir, "documents")
    out = heif_meta(synth_heif_demo(docs))
    return out.select(
        "doc_id",
        F.coalesce(F.col("brand"), F.lit("none")).alias("brand"),
        *[F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)
          for c in ("n_ispe", "width", "height")],
        "valid",
    )


@register(
    "x_svg_meta",
    """
    WITH g AS (
        SELECT doc_id AS i, doc_id % 19 = 0 AS corrupt,
               64 + doc_id % 100 AS w, 48 + doc_id % 60 AS h
        FROM documents
    )
    SELECT i AS doc_id,
           CAST(CASE WHEN corrupt THEN -1
                     WHEN i % 3 = 1 THEN -1 ELSE w END AS BIGINT)
               AS width,
           CAST(CASE WHEN corrupt THEN -1
                     WHEN i % 3 = 1 THEN -1 ELSE h END AS BIGINT)
               AS height,
           CAST(CASE WHEN corrupt THEN -1 ELSE w END AS BIGINT) AS vb_w,
           CAST(CASE WHEN corrupt THEN -1 ELSE h END AS BIGINT) AS vb_h,
           CAST(CASE WHEN corrupt THEN -1 ELSE 1 + i % 4 END AS BIGINT)
               AS n_paths,
           CAST(CASE WHEN corrupt THEN -1
                     WHEN i % 3 = 0 THEN 0 ELSE i % 3 END AS BIGINT)
               AS n_images,
           CAST(CASE WHEN corrupt THEN -1 ELSE i % 2 END AS BIGINT)
               AS n_texts,
           CASE WHEN corrupt THEN 'none'
                ELSE printf('Icon %d', i % 40) END AS title,
           NOT corrupt AS valid
    FROM g
    """,
)
def x_svg_meta(spark, sf_dir):
    """SVG census (r10; operators/media.svg_meta) — crawls are full
    of SVG, and it is TEXT, so the parse is PURE Catalyst expressions
    (regexp_extract/_all + split over the root attributes; the
    srt_cues/bmp_dims rule — no UDF, whole-stage codegen): root
    width/height with unit-suffix strip (and the viewBox-only sizing
    form real hand-authored SVGs use — every id%3==1 fixture omits
    the attributes), the viewBox geometry, path/image/text element
    censuses, and the <title> string.  Every 19th id loses its
    closing tag: valid=false, NULL fields → sentinels."""
    from lwetl_spark.operators.media import svg_meta, synth_svg_demo

    docs = _t(spark, sf_dir, "documents")
    out = svg_meta(synth_svg_demo(docs))
    return out.select(
        "doc_id",
        *[F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)
          for c in ("width", "height", "vb_w", "vb_h", "n_paths",
                    "n_images", "n_texts")],
        F.coalesce(F.col("title"), F.lit("none")).alias("title"),
        "valid",
    )


@register(
    "x_img_captions",
    """
    WITH g AS (SELECT doc_id AS i FROM documents)
    SELECT i AS doc_id, CAST(0 AS BIGINT) AS item_idx,
           'jpeg_com' AS source, 'comment' AS key,
           printf('Jpeg comment %d', i) AS text
    FROM g WHERE i % 2 = 1
    UNION ALL
    SELECT i, CAST(0 AS BIGINT), 'png_text', 'Title',
           printf('Img title %d', i)
    FROM g WHERE i % 2 = 0
    UNION ALL
    SELECT i, CAST(1 AS BIGINT), 'png_ztxt', 'Description',
           printf('Compressed desc %d', i)
    FROM g WHERE i % 2 = 0 AND i % 23 <> 0
    UNION ALL
    SELECT i, CAST(CASE WHEN i % 23 = 0 THEN 1 ELSE 2 END AS BIGINT),
           'png_itxt', 'Comment',
           printf('Unicode caption %d é', i)
    FROM g WHERE i % 2 = 0
    """,
)
def x_img_captions(spark, sf_dir):
    """Embedded image-caption extraction (r10; operators/media.
    image_captions) — the caption text that lives INSIDE image files,
    the third alt-text source after HTML attributes and sidecar JSON:
    PNG tEXt (latin-1), zTXt (REAL zlib inflate), iTXt (UTF-8,
    optionally compressed — fixtures alternate both legal forms), and
    JPEG COM segments from the marker walk.  Every 23rd PNG's zTXt
    stream is corrupted: that chunk alone is skipped (later items'
    indices shift accordingly) while the file's other captions
    survive — the per-chunk failure contract.  Every string
    value-checks through the encoding round-trips, including the
    non-ASCII UTF-8 iTXt."""
    from lwetl_spark.operators.media import (
        image_captions,
        synth_image_caption_demo,
    )

    docs = _t(spark, sf_dir, "documents")
    return image_captions(synth_image_caption_demo(docs))


@register(
    "x_id3_tags",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN '2.4' ELSE '2.3' END
               AS version,
           CAST(CASE WHEN doc_id % 19 = 0 THEN 4 ELSE 5 END
                AS BIGINT) AS n_frames,
           printf('Track %d', doc_id) AS title,
           printf('Artist %d', doc_id % 25) AS artist,
           printf('Album %d', doc_id % 12) AS album,
           CAST(CASE WHEN doc_id % 19 = 0 THEN -1
                     ELSE 1990 + doc_id % 35 END AS BIGINT) AS year,
           doc_id % 19 <> 0 AS valid
    FROM documents
    """,
)
def x_id3_tags(spark, sf_dir):
    """ID3v2 text-frame parse (r10; operators/media.id3_tags) — the
    audio-side caption surface: real ID3v2.3 AND v2.4 tags (plain vs
    SYNCSAFE frame sizes — the classic version trap), TIT2/TPE1/TALB
    text frames across latin-1 / utf-16-BOM / utf-8 / utf-16be
    encodings, TDRC-vs-TYER year, a PRIV frame the text walk counts
    but skips.  Every 19th id's last frame lies its size past the
    tag end: the earlier frames survive (title/artist/album intact,
    n_frames 4), valid=false.  Every string value-checks against the
    printf arithmetic through the encoding round-trip."""
    from lwetl_spark.operators.media import id3_tags, synth_id3_demo

    docs = _t(spark, sf_dir, "documents")
    out = id3_tags(synth_id3_demo(docs))
    return out.select(
        "doc_id",
        F.coalesce(F.col("version"), F.lit("none")).alias("version"),
        F.coalesce(F.col("n_frames"), F.lit(-1)).cast("long")
        .alias("n_frames"),
        *[F.coalesce(F.col(c), F.lit("none")).alias(c)
          for c in ("title", "artist", "album")],
        F.coalesce(F.col("year"), F.lit(-1)).cast("long").alias("year"),
        "valid",
    )


@register(
    "x_dhash_neardup",
    """
    WITH g AS (
        SELECT doc_id, doc_id % 10 AS k, (doc_id % 40) // 10 AS t
        FROM documents WHERE doc_id % 5 = 0
    ),
    pos AS (SELECT doc_id, k, t, unnest(range(0, 64)) AS idx FROM g),
    fl AS (
        SELECT doc_id, idx,
               CASE WHEN ((11 * k + 3 * (idx // 8) + 5 * (idx % 8))
                          % 7) < 3 THEN 1 ELSE 0 END AS base,
               CASE WHEN t >= 1 AND (7 * k + 13 * t) % 64 = idx
                    THEN 1 ELSE 0 END
               + CASE WHEN t >= 2 AND (7 * k + 13 * t + 17) % 64 = idx
                      THEN 1 ELSE 0 END
               + CASE WHEN t >= 3 AND (7 * k + 13 * t + 34) % 64 = idx
                      THEN 1 ELSE 0 END AS nf
        FROM pos
    ),
    bits AS (SELECT doc_id, idx, (base + nf) % 2 AS bit FROM fl),
    hl AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN idx >= 32 AND bit = 1
                             THEN 1::BIGINT << (idx - 32)
                             ELSE 0 END) AS BIGINT) AS hi,
               CAST(SUM(CASE WHEN idx < 32 AND bit = 1
                             THEN 1::BIGINT << idx
                             ELSE 0 END) AS BIGINT) AS lo
        FROM bits GROUP BY doc_id
    )
    SELECT a.doc_id AS id_l, b.doc_id AS id_r,
           CAST(bit_count(xor(a.hi, b.hi))
                + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
    FROM hl a JOIN hl b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.hi, b.hi))
          + bit_count(xor(a.lo, b.lo)) <= 3
    """,
)
def x_dhash_neardup(spark, sf_dir):
    """Perceptual NEAR-dup image pairs (r10; operators/media.
    dhash_near_dup): real PNGs decode through image_dhash, then
    4-band LSH over the 64-bit hash — pairs sharing an exact 16-bit
    band verify true hamming ≤ 3 via conv-halves + bitwiseXOR +
    bit_count, all JVM-side.  The pigeonhole makes 4-band recall
    EXACT at radius 3, so the operator's band-join output must equal
    the oracle's brute-force all-pairs hamming filter — the fixture
    encodes every hash bit arithmetically (grid-walk PNGs) with
    variants at hamming 0/1/2/3 AND 4/5 beyond the radius, so missed
    bands, broken banding, or wrong bit packing all change the pair
    set.  No all-pairs stage in the plan; shuffles carry (id, band,
    two longs) rows only."""
    from lwetl_spark.operators.media import (
        dhash_near_dup,
        image_dhash,
        synth_dhash_neardup_demo,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    hashes = image_dhash(synth_dhash_neardup_demo(docs)).filter("ok")
    return dhash_near_dup(hashes.select("doc_id", "dhash"))


@register(
    "x_imgtext_pairs",
    """
    WITH shards AS (
        SELECT doc_id AS i FROM documents WHERE doc_id % 4 = 1
    ),
    refs AS (
        SELECT i, unnest(range(0, 1 + i % 3)) AS j FROM shards
    ),
    cls AS (
        SELECT i, j, (i + 17 * j) % 40 AS k,
               i % 13 = 0 AND j = 0 AS broken
        FROM refs
    ),
    base AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS nrefs_base,
               CAST(COUNT(*) FILTER (WHERE NOT broken) AS BIGINT)
                   AS ncop_base
        FROM cls GROUP BY k
    ),
    geo AS (
        SELECT k, nrefs_base, ncop_base,
               10 + k % 30 AS w, 10 + (3 * k) % 25 AS h
        FROM base
    ),
    adm AS (
        SELECT * FROM geo
        WHERE w >= 16 AND h >= 16 AND ncop_base > 0
    )
    SELECT CASE WHEN k % 5 = 3
                THEN printf('http://cdn.example/mim%d.png', k)
                ELSE printf('http://images.example/im%d.png', k)
           END AS img_url,
           printf('Img caption %d €tok%d', k, k % 7) AS caption,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CASE WHEN k % 5 = 3 THEN ncop_base + nrefs_base
                ELSE ncop_base END AS n_copies,
           CASE WHEN k % 5 = 3 THEN 2 * nrefs_base
                ELSE nrefs_base END AS n_refs,
           TRUE AS no_readmission
    FROM adm
    """,
)
def x_imgtext_pairs(spark, sf_dir):
    """LAION-style image-text pair mining from WARC, composed
    end-to-end (r10 flagship — VERDICT r9 task 1): WARC shards →
    `warc_payloads` (exact Content-Length body slices) → the HTML
    records yield (img_url, alt-caption) references via a pure-JVM
    regex chain while the image records run the admission pipeline —
    `media_meta` header-only census gate (valid AND both dims ≥ 16:
    the cheap cull BEFORE any decode, the order a 100 TB crawl
    requires) → `image_dhash` REAL pixel decode on survivors →
    near-dup collapse by dhash, which must merge the byte-identical
    re-hosts at cdn.example with their images.example originals —
    then pairs = refs ⋈ surviving groups, and the captions feed
    `ingest_increment` (re-ingest admits zero).  Broken copies (IDAT
    bit flip / truncated EOI) never count toward n_copies but their
    class still admits through intact copies.  All counts, dims,
    canonical urls, and caption strings recompute from shard-id
    arithmetic; payload bytes never leave their input partition."""
    import os as _os
    import shutil as _shutil

    from lwetl_spark.operators.incremental import ingest_increment
    from lwetl_spark.operators.media import (
        image_dhash,
        media_meta,
        sniff_decode_html,
        synth_warc_imgtext_demo,
        warc_payloads,
    )

    docs = _t(spark, sf_dir, "documents")
    sub = docs.filter(F.col("doc_id") % 4 == 1).select("doc_id")
    recs = warc_payloads(synth_warc_imgtext_demo(sub)).localCheckpoint(
        eager=True
    )
    tag_re = r'<img src="([^"]*)" alt="([^"]*)"/>'
    refs = (
        sniff_decode_html(
            recs.filter(F.col("target_uri").startswith("http://site"))
            .select("doc_id", "payload"))
        .select("html")
        .select(F.explode(
            F.regexp_extract_all("html", F.lit(tag_re), 0)).alias("tag"))
        .select(
            F.regexp_extract("tag", tag_re, 1).alias("img_url"),
            F.regexp_extract("tag", tag_re, 2).alias("caption"),
        )
        .groupBy("img_url", "caption")
        .agg(F.count("*").alias("n_refs"))
    )
    imgs = recs.filter(
        ~F.col("target_uri").startswith("http://site")
        & (F.col("rec_type") == "response")
    ).select(
        (F.col("doc_id") * 1000 + F.col("rec_idx")).alias("doc_id"),
        "target_uri", "payload",
    ).localCheckpoint(eager=True)
    # header-only census gate FIRST (no decode), then dhash survivors
    gate = media_meta(imgs.select("doc_id", "payload")).filter(
        F.col("valid") & (F.col("width") >= 16) & (F.col("height") >= 16)
    ).select("doc_id")
    survivors = imgs.join(gate, "doc_id", "left_semi")
    hx = image_dhash(survivors.select("doc_id", "payload")).filter(
        "ok"
    ).join(survivors.select("doc_id", "target_uri"), "doc_id")
    groups = hx.groupBy("dhash").agg(
        F.min("target_uri").alias("img_url"),
        F.count("*").alias("n_copies"),
        F.max("width").alias("width"),
        F.max("height").alias("height"),
    )
    url2hash = hx.select(
        F.col("target_uri").alias("img_url"), "dhash").distinct()
    grefs = refs.join(url2hash, "img_url").groupBy("dhash").agg(
        F.min("caption").alias("caption"),
        F.sum("n_refs").alias("n_refs"),
    )
    pairs = groups.join(grefs, "dhash").localCheckpoint(eager=True)
    work = _tmpdir("imgtext")
    man, state, idx = (
        _os.path.join(work, p) for p in ("manifest", "state", "index")
    )
    cap_docs = pairs.select(
        F.regexp_extract("img_url", r"im(\d+)\.png", 1).cast("long")
        .alias("doc_id"),
        F.col("caption").alias("text"),
    )
    ingest_increment(spark, cap_docs, man, state, idx)
    r2 = ingest_increment(spark, cap_docs, man, state, idx)
    _shutil.rmtree(work, ignore_errors=True)
    return pairs.select(
        "img_url", "caption",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_copies").cast("long").alias("n_copies"),
        F.col("n_refs").cast("long").alias("n_refs"),
        F.lit(int(r2["n_admitted"]) == 0).alias("no_readmission"),
    )


@register(
    "x_warc_records",
    """
    WITH g AS (
        SELECT doc_id, 2 + doc_id % 4 AS nr, doc_id % 23 = 0 AS corrupt
        FROM documents WHERE doc_id % 3 = 1
    ),
    r AS (
        SELECT doc_id, corrupt,
               unnest(range(0, CASE WHEN corrupt THEN 1 ELSE nr END)) AS j
        FROM g
    ),
    t AS (
        SELECT doc_id, corrupt, j,
               CASE (doc_id + j) % 3 WHEN 0 THEN 'warcinfo'
                    WHEN 1 THEN 'request' ELSE 'response' END AS rec_type,
               20 + (doc_id + 7 * j) % 40 AS clen
        FROM r
    ),
    bexp AS (SELECT doc_id, j, clen, unnest(range(0, clen)) AS k FROM t),
    bsum AS (
        SELECT doc_id, j,
               CAST(SUM((doc_id + 11 * j + 3 * k) % 256) AS BIGINT)
                   AS byte_sum
        FROM bexp GROUP BY doc_id, j
    )
    SELECT t.doc_id, CAST(t.j AS BIGINT) AS rec_idx, t.rec_type,
           CASE WHEN t.rec_type = 'warcinfo' THEN 'none'
                ELSE printf('http://site%d.example/page%d',
                            (t.doc_id + t.j) % 50, t.j) END AS target_uri,
           CAST(t.clen AS BIGINT) AS content_length,
           b.byte_sum, NOT t.corrupt AS valid
    FROM t JOIN bsum b ON t.doc_id = b.doc_id AND t.j = b.j
    """,
)
def x_warc_records(spark, sf_dir):
    """WARC record walk (r9; operators/media.warc_records) — the
    container web crawls actually ship as: per record, the version
    line + header parse up to CRLF-CRLF, an EXACT Content-Length body
    skip proved by the payload bytes' integer sum, and the record
    terminator check.  Every 23rd fixture corrupts record 1's version
    line: the walker keeps record 0 (partial census, valid=false on
    the shard's rows).  Fixture framing rotates by id: plain WARC,
    .warc.gz (per-record gzip members, r10), and .warc.zst
    (per-record zstd frames behind a skippable dictionary-slot frame,
    r11 — the newer Common Crawl layout; Arrow's bundled libzstd) —
    all lossless, so ONE oracle covers the three framings.  The
    oracle recomputes every type, URI,
    length, and byte sum from id arithmetic; warcinfo records carry
    no Target-URI ('none' sentinel on both sides)."""
    from lwetl_spark.operators.media import synth_warc_demo, warc_records

    docs = _t(spark, sf_dir, "documents")
    out = warc_records(synth_warc_demo(
        docs.filter(F.col("doc_id") % 3 == 1)))
    return out.select(
        "doc_id", "rec_idx", "rec_type",
        F.coalesce(F.col("target_uri"), F.lit("none")).alias("target_uri"),
        "content_length", "byte_sum", "valid",
    )


@register(
    "x_gif_meta",
    """
    WITH g AS (
        SELECT doc_id, 1 + doc_id % 6 AS nf,
               CASE WHEN 1 + doc_id % 6 > 1 THEN 4 + doc_id % 25
                    ELSE 0 END AS delay,
               doc_id % 31 = 0 AS corrupt
        FROM documents
    )
    SELECT doc_id, '89a' AS version,
           CAST(10 + doc_id % 50 AS BIGINT) AS width,
           CAST(10 + doc_id % 30 AS BIGINT) AS height,
           CAST(CASE WHEN corrupt THEN nf - 1 ELSE nf END AS BIGINT)
               AS n_frames,
           CAST(10 * delay * (CASE WHEN corrupt THEN nf - 1 ELSE nf END)
                AS BIGINT) AS duration_ms,
           (CASE WHEN corrupt THEN nf - 1 ELSE nf END) > 1 AS animated,
           NOT corrupt AS valid
    FROM g
    """,
)
def x_gif_meta(spark, sf_dir):
    """GIF census (r9; operators/media.gif_meta): header/logical-
    screen parse + block walk — frame count via image descriptors,
    animation duration from Graphic Control Extension delays,
    color-table and LZW sub-block skipping by declared lengths
    (crawls are full of animated GIFs; the census is the admission
    gate's need).  Every 31st fixture truncates mid-sub-block: the
    walker keeps the frames counted BEFORE the cut and flags
    valid=false — the partial-census contract, value-checked (the
    oracle recomputes the exact truncated frame count and the
    delay-sum duration).  LZW pixel decode stays honestly out of
    scope."""
    from lwetl_spark.operators.media import gif_meta, synth_gif_demo

    docs = _t(spark, sf_dir, "documents")
    return gif_meta(synth_gif_demo(docs))


@register(
    "x_pdf_ingest",
    """
    WITH sub AS (
        SELECT doc_id, doc_id % 50 AS cls
        FROM documents WHERE doc_id % 4 = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE doc_id % 21 <> 0) AS BIGINT)
               AS n_extracted,
           CAST(COUNT(DISTINCT cls) FILTER (WHERE doc_id % 21 <> 0)
                AS BIGINT) AS n_admitted,
           TRUE AS index_matches_fresh,
           TRUE AS no_readmission
    FROM sub
    """,
)
def x_pdf_ingest(spark, sf_dir):
    """The PDF crawl loop composed end-to-end (r9 — the document-side
    sibling of x_warc_ingest): PDFs → `pdf_text` (census gate +
    FlateDecode/raw stream text extraction) → valid-only admission →
    `ingest_increment` (manifest diff + content dedup + index
    maintenance).  Contracts, all oracle-checked: (a) n_extracted
    counts only census-valid PDFs (truncated fixtures drop at the
    gate); (b) n_admitted = distinct duplicate-classes among them
    (ids congruent mod 50 carry identical extracted text and dedup to
    ONE admission); (c) the campaign-maintained index equals a fresh
    build over the admitted set; (d) re-crawling the same PDFs admits
    nothing."""
    import os as _os
    import shutil as _shutil

    from lwetl_spark.operators.incremental import ingest_increment
    from lwetl_spark.operators.media import (
        pdf_text,
        synth_pdf_campaign_demo,
    )
    from lwetl_spark.operators.retrieval import (
        build_text_index,
        query_text_index,
    )

    docs = _t(spark, sf_dir, "documents")
    sub = docs.filter(F.col("doc_id") % 4 == 1)
    extracted = pdf_text(synth_pdf_campaign_demo(sub))
    cleaned = (
        extracted.filter(F.col("valid"))
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    work = _tmpdir("pdfingest")
    man, state, idx = (
        _os.path.join(work, p) for p in ("manifest", "state", "index")
    )
    r1 = ingest_increment(spark, cleaned, man, state, idx)
    admitted = spark.read.parquet(state).select("doc_id")
    fresh_path = _os.path.join(work, "fresh")
    build_text_index(
        cleaned.join(admitted, "doc_id", "left_semi"), fresh_path
    )
    probes = spark.createDataFrame(
        [(1, "class"), (2, "line"), (3, "0"), (4, "7")],
        "query_id int, term string",
    )
    cols = ["query_id", "doc_id", "score_ppm", "n_terms", "rnk"]
    a = query_text_index(spark, idx, probes, k=10).groupBy(*cols).agg(
        F.count("*").alias("_ca")
    )
    b = query_text_index(spark, fresh_path, probes, k=10).groupBy(
        *cols
    ).agg(F.count("*").alias("_cb"))
    mismatches = (
        a.join(b, cols, "full_outer")
        .filter("_ca IS NULL OR _cb IS NULL OR _ca <> _cb")
        .count()
    )
    r2 = ingest_increment(spark, cleaned, man, state, idx)
    n_docs = sub.count()
    n_extracted = cleaned.count()
    _shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [(
            int(n_docs), int(n_extracted), int(r1["n_admitted"]),
            mismatches == 0, int(r2["n_admitted"]) == 0,
        )],
        "n_docs long, n_extracted long, n_admitted long,"
        " index_matches_fresh boolean, no_readmission boolean",
    )


@register(
    "x_tiff_pixels",
    """
    WITH g AS (
        SELECT doc_id, 1 + doc_id % 3 AS np, doc_id % 256 AS s,
               doc_id % 25 = 0 AS corrupt
        FROM documents
    ),
    pg AS (SELECT doc_id, np, s, corrupt,
                  unnest(range(0, np)) AS p FROM g),
    dims AS (
        SELECT doc_id, np, s, corrupt, p,
               8 + (doc_id + 9 * p) % 40 AS w,
               8 + (doc_id + 5 * p) % 30 AS h
        FROM pg
    ),
    rr AS (SELECT *, unnest(range(0, h)) AS r FROM dims),
    cc AS (SELECT *, unnest(range(0, w)) AS c FROM rr),
    v AS (
        SELECT doc_id, corrupt, p,
               CASE WHEN (doc_id + p) % 4 = 3 THEN
                    CASE WHEN (s + 3 * r + c + 19 * p) % 23 < 11
                         THEN 1 ELSE 0 END
               ELSE (s + 7 * r + 13 * c + 19 * p) % 256 END AS v
        FROM cc
    ),
    st AS (
        SELECT doc_id, CAST(SUM(v) AS BIGINT) AS sum_px,
               CAST(COUNT(*) AS BIGINT) AS n_px,
               CAST(MIN(v) AS BIGINT) AS min_px,
               CAST(MAX(v) AS BIGINT) AS max_px
        FROM v GROUP BY doc_id
    )
    SELECT g.doc_id,
           CAST(CASE WHEN corrupt THEN -1
                ELSE 8 + g.doc_id % 40 END AS BIGINT) AS width,
           CAST(CASE WHEN corrupt THEN -1
                ELSE 8 + g.doc_id % 30 END AS BIGINT) AS height,
           CAST(CASE WHEN corrupt THEN -1 ELSE g.np END AS BIGINT)
               AS n_pages,
           CAST(CASE WHEN corrupt THEN -1 ELSE st.n_px END AS BIGINT)
               AS n_px,
           CAST(CASE WHEN corrupt THEN -1 ELSE st.sum_px END AS BIGINT)
               AS sum_px,
           CAST(CASE WHEN corrupt THEN -1 ELSE st.min_px END AS BIGINT)
               AS min_px,
           CAST(CASE WHEN corrupt THEN -1 ELSE st.max_px END AS BIGINT)
               AS max_px
    FROM g JOIN st ON g.doc_id = st.doc_id
    """,
)
def x_tiff_pixels(spark, sf_dir):
    """TIFF PIXEL decode (r9 — upgrades x_tiff_meta's census to a
    real decode for uncompressed-baseline TIFFs; operators/media.
    tiff_pixel_stats): per page the gray 8-bit strip addressed by
    StripOffsets/StripByteCounts reads out and every pixel
    value-checks against id arithmetic across ALL pages and BOTH byte
    orders.  Pages with (id+p)%4==3 (r11, VERDICT r10 task 2) are
    1-bit CCITT Group 4 — every strip/tile an independent T.6 MMR
    stream decoded by the from-scratch engine (Pass/Horizontal/
    Vertical modes, T.4 run tables), every BIT value-checking against
    [(s+3r+c+19p)%23<11].  Unsupported-form strips yield NULL stats
    (stated honestly); every 25th id breaks the IFD chain → -1
    sentinels."""
    from lwetl_spark.operators.media import (
        synth_tiff_px_demo,
        tiff_pixel_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    out = tiff_pixel_stats(synth_tiff_px_demo(docs))
    return out.select(
        "doc_id",
        *[F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)
          for c in ("width", "height", "n_pages", "n_px", "sum_px",
                    "min_px", "max_px")],
    )


@register(
    "x_srt_cues",
    """
    WITH g AS (
        SELECT doc_id, unnest(range(0, 1 + doc_id % 5)) AS k
        FROM documents
    ),
    c AS (
        SELECT doc_id, k,
               (doc_id % 3) * 60000 + k * 1000 + (doc_id % 1000)
                   AS start_ms,
               doc_id % 17 = 0 AND k = 0 AS corrupt
        FROM g
    )
    SELECT doc_id, CAST(k AS BIGINT) AS cue_idx,
           CAST(CASE WHEN corrupt THEN -1 ELSE start_ms END AS BIGINT)
               AS start_ms,
           CAST(CASE WHEN corrupt THEN -1
                ELSE start_ms + 500 + (doc_id % 500) END AS BIGINT)
               AS end_ms,
           printf('Cue %d of doc %d', k, doc_id)
               || CASE WHEN k % 2 = 1
                       THEN chr(10) || printf('line two %d', doc_id + k)
                       ELSE '' END AS text,
           NOT corrupt AS valid
    FROM c
    """,
)
def x_srt_cues(spark, sf_dir):
    """SubRip (SRT) subtitle parse (r9; operators/media.srt_cues) —
    the caption format video training sets pair with their frames —
    as PURE JVM expressions: blank-line split + posexplode, timestamp
    regex → exact milliseconds, multi-line cue text rejoined.  No
    UDF, no Arrow pass: whole-stage codegen end to end (the bmp_dims
    precedent, and the fixture generator is itself a zero-shuffle
    transform-over-sequence).  Every 17th id breaks cue 0's arrow:
    that cue alone goes valid=false with NULL times while its text
    still extracts — the per-cue (not per-file) failure contract."""
    from lwetl_spark.operators.media import srt_cues, synth_srt_demo

    docs = _t(spark, sf_dir, "documents")
    out = srt_cues(synth_srt_demo(docs))
    return out.select(
        "doc_id", "cue_idx",
        F.coalesce(F.col("start_ms"), F.lit(-1)).cast("long")
        .alias("start_ms"),
        F.coalesce(F.col("end_ms"), F.lit(-1)).cast("long")
        .alias("end_ms"),
        "text", "valid",
    )


@register(
    "x_epub_text",
    """
    WITH g AS (
        SELECT doc_id, 2 + doc_id % 3 AS nch, doc_id % 23 = 0 AS corrupt
        FROM documents
    ),
    ch AS (
        SELECT doc_id, corrupt,
               unnest(range(0, CASE WHEN corrupt THEN nch - 1
                                    ELSE nch END)) AS k
        FROM g
    )
    SELECT doc_id, CAST(k AS BIGINT) AS chapter_idx,
           printf('Book %d Chapter %d Paragraph 0 of chapter %d book'
                  || ' %d Paragraph 1 of chapter %d book %d Fish &'
                  || ' chips %d',
                  doc_id, k, k, doc_id, k, doc_id, doc_id + k) AS text,
           TRUE AS ok, NOT corrupt AS valid
    FROM ch
    """,
)
def x_epub_text(spark, sf_dir):
    """EPUB → training text (r9; operators/media.epub_chapters +
    functions/text.html_text): books are core LLM training data and
    EPUB is a ZIP in disguise — the walk verifies the spec's
    mimetype contract (first member, STORED, exact content), inflates
    each chapter's XHTML in the Arrow pass, and the JVM html_text
    chain strips markup/style and decodes entities to the text a
    pipeline ingests.  The oracle replays every chapter's stripped
    text char-exact (title + heading + paragraphs + the &amp;
    decode).  Every 23rd id loses its LAST chapter to a corrupted
    central entry: remaining chapters survive with valid=false (the
    partial-census contract)."""
    from lwetl_spark.functions.text import html_text
    from lwetl_spark.operators.media import epub_chapters, synth_epub_demo

    docs = _t(spark, sf_dir, "documents")
    out = epub_chapters(synth_epub_demo(docs))
    return out.select(
        "doc_id", "chapter_idx",
        html_text(F.coalesce(F.col("xhtml"), F.lit(""))).alias("text"),
        "ok", "valid",
    )


@register(
    "x_vtt_cues",
    """
    WITH g AS (
        SELECT doc_id, unnest(range(0, 1 + doc_id % 4)) AS k
        FROM documents
    ),
    c AS (
        SELECT doc_id, k,
               (doc_id % 3) * 60000 + k * 1000 + (doc_id % 1000)
                   AS start_ms,
               doc_id % 19 = 0 AND k = 0 AS corrupt
        FROM g
    )
    SELECT doc_id, CAST(k AS BIGINT) AS cue_idx,
           CAST(CASE WHEN corrupt THEN -1 ELSE start_ms END AS BIGINT)
               AS start_ms,
           CAST(CASE WHEN corrupt THEN -1
                ELSE start_ms + 500 + (doc_id % 500) END AS BIGINT)
               AS end_ms,
           printf('Vtt cue %d doc %d', k, doc_id) AS text,
           NOT corrupt AS valid
    FROM c
    """,
)
def x_vtt_cues(spark, sf_dir):
    """WebVTT cue parse (r9; operators/media.vtt_cues) — SRT's web
    sibling, PURE JVM again, and the dialect differences are the
    oracle's probes: '.' milliseconds, the OPTIONAL hours field (odd
    cues carry hours, even cues are bare mm:ss.mmm — both must land
    on the same exact ms), and the OPTIONAL cue-identifier line
    (every third cue has one, shifting where the text starts).  Every
    19th id breaks cue 0's arrow: per-cue valid=false, text still
    extracted."""
    from lwetl_spark.operators.media import synth_vtt_demo, vtt_cues

    docs = _t(spark, sf_dir, "documents")
    out = vtt_cues(synth_vtt_demo(docs))
    return out.select(
        "doc_id", "cue_idx",
        F.coalesce(F.col("start_ms"), F.lit(-1)).cast("long")
        .alias("start_ms"),
        F.coalesce(F.col("end_ms"), F.lit(-1)).cast("long")
        .alias("end_ms"),
        "text", "valid",
    )


@register(
    "x_ico_meta",
    """
    WITH g AS (
        SELECT doc_id, unnest(range(0, 1 + doc_id % 4)) AS j,
               doc_id % 24 = 0 AS corrupt
        FROM documents
    )
    SELECT doc_id, CAST(j AS BIGINT) AS icon_idx,
           CAST(CASE (doc_id + j) % 4 WHEN 0 THEN 16 WHEN 1 THEN 32
                WHEN 2 THEN 48 ELSE 256 END AS BIGINT) AS width,
           CAST(CASE (doc_id + j) % 4 WHEN 0 THEN 16 WHEN 1 THEN 32
                WHEN 2 THEN 48 ELSE 256 END AS BIGINT) AS height,
           CASE WHEN corrupt AND j = doc_id % 4 THEN 'unknown'
                WHEN (doc_id + j) % 2 = 0 THEN 'png'
                ELSE 'dib' END AS inner,
           NOT corrupt AS valid
    FROM g
    """,
)
def x_ico_meta(spark, sf_dir):
    """ICO census (r9; operators/media.ico_meta): favicons are
    everywhere in a crawl — directory-entry walk with the 0→256 dim
    rule, payload-range validation, and the inner-format sniff (PNG
    magic vs DIB header at each entry's offset; modern favicons embed
    whole PNGs).  Every 24th id lies about its LAST entry's offset:
    the catalog survives, that icon sniffs 'unknown', valid=false."""
    from lwetl_spark.operators.media import ico_meta, synth_ico_demo

    docs = _t(spark, sf_dir, "documents")
    out = ico_meta(synth_ico_demo(docs))
    return out.select(
        "doc_id", "icon_idx",
        *[F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)
          for c in ("width", "height")],
        F.coalesce(F.col("inner"), F.lit("none")).alias("inner"),
        "valid",
    )


@register(
    "x_avi_meta",
    """
    WITH g AS (
        SELECT doc_id, 160 + 8 * (doc_id % 30) AS w,
               120 + 6 * (doc_id % 20) AS h, 10 + doc_id % 90 AS nf,
               33333 + 100 * (doc_id % 5) AS uspf,
               doc_id % 7 <> 0 AS audio, doc_id % 26 = 0 AS corrupt
        FROM documents
    )
    SELECT doc_id,
           CAST(CASE WHEN corrupt THEN -1 ELSE w END AS BIGINT)
               AS width,
           CAST(CASE WHEN corrupt THEN -1 ELSE h END AS BIGINT)
               AS height,
           CAST(CASE WHEN corrupt THEN -1 ELSE nf END AS BIGINT)
               AS n_frames,
           CAST(CASE WHEN corrupt THEN -1
                WHEN audio THEN 2 ELSE 1 END AS BIGINT) AS n_streams,
           (NOT corrupt) AND audio AS has_audio,
           CAST(CASE WHEN corrupt THEN -1
                ELSE uspf * nf // 1000 END AS BIGINT) AS duration_ms,
           NOT corrupt AS valid
    FROM g
    """,
)
def x_avi_meta(spark, sf_dir):
    """AVI census (r9; operators/media.avi_meta): the third crawl
    video container after MP4 (r8) and Matroska (r9) — RIFF LIST walk
    into hdrl, the 56-byte avih unpack (µs-per-frame × total frames →
    exact duration_ms), per-strl fccType scan for the audio flag
    (video-only AVIs exist in every crawl: id%7=0 legs).  Every 26th
    id truncates mid-avih → NULL census with -1 sentinels."""
    from lwetl_spark.operators.media import avi_meta, synth_avi_demo

    docs = _t(spark, sf_dir, "documents")
    out = avi_meta(synth_avi_demo(docs))
    return out.select(
        "doc_id",
        *[F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)
          for c in ("width", "height", "n_frames", "n_streams")],
        F.coalesce(F.col("has_audio"), F.lit(False)).alias("has_audio"),
        F.coalesce(F.col("duration_ms"), F.lit(-1)).cast("long")
        .alias("duration_ms"),
        "valid",
    )


@register(
    "x_pdf_text",
    """
    WITH g AS (
        SELECT doc_id, 1 + doc_id % 4 AS np, doc_id % 21 = 0 AS corrupt
        FROM documents
    ),
    pg AS (SELECT doc_id, np, corrupt, unnest(range(0, np)) AS p FROM g),
    tx AS (
        SELECT doc_id,
               string_agg(
                   printf('Doc %d page %d lorem %d', doc_id, p,
                          (7 * doc_id + p) % 100),
                   chr(10) ORDER BY p) AS text
        FROM pg GROUP BY doc_id
    )
    SELECT g.doc_id,
           CASE WHEN g.doc_id % 5 = 2 THEN '1.5' ELSE '1.7' END
               AS version,
           CAST(g.np AS BIGINT) AS n_pages,
           CAST(2 + 2 * g.np
                + CASE WHEN g.doc_id % 5 = 2 THEN 2 ELSE 0 END
                AS BIGINT) AS n_objects,
           FALSE AS encrypted, t.text, NOT g.corrupt AS valid
    FROM g JOIN tx t ON g.doc_id = t.doc_id
    """,
)
def x_pdf_text(spark, sf_dir):
    """PDF census + REAL text extraction (r9; operators/media.
    pdf_text): the most common document format in any crawl.  Census
    walks header version, object/page counts, /Encrypt, startxref →
    xref consistency, %%EOF; extraction parses every content stream —
    FlateDecode streams genuinely zlib-inflated, LZWDecode streams
    (id%4==3, r10) through the real early-change LZW engine
    decode-until-EOI, raw streams read direct — and pulls (…) Tj text
    operators with PDF string unescaping.  id%5==2 (r11, VERDICT r10
    task 1) ships the MODERN ≥1.5 form — /Type /XRef cross-reference
    STREAM (PNG-Up-predicted for id%10==2) + dict objects packed in a
    FlateDecode /ObjStm — so the census must inflate and walk both to
    see its 2·np+4 objects and np pages (classic counts 2·np+2); the
    startxref gate follows the offset into the XRef stream and
    value-checks its W-typed row grid.  The oracle replays the
    per-page text and the newline-joined concatenation exactly (a
    parser that drops a page, misorders streams, or fails the inflate
    hash-mismatches).  Every 21st id truncates before the trailer /
    startxref: counts survive, valid=false."""
    from lwetl_spark.operators.media import pdf_text, synth_pdf_demo

    docs = _t(spark, sf_dir, "documents")
    out = pdf_text(synth_pdf_demo(docs))
    return out.select(
        "doc_id",
        F.coalesce(F.col("version"), F.lit("none")).alias("version"),
        *[F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)
          for c in ("n_pages", "n_objects")],
        "encrypted",
        F.coalesce(F.col("text"), F.lit("none")).alias("text"),
        "valid",
    )


@register(
    "x_pdf_images",
    """
    WITH g AS (
        SELECT doc_id, 1 + doc_id % 3 AS ni, doc_id % 19 = 0 AS corrupt
        FROM documents
    ),
    img AS (
        SELECT doc_id, unnest(range(0, ni)) AS k
        FROM g WHERE NOT corrupt
    ),
    cls AS (
        SELECT doc_id, k, (doc_id + k) % 4 AS leg,
               (doc_id + k) % 8 AS leg8,
               8 * (1 + (doc_id + k) % 3) AS w,
               8 * (1 + (doc_id + k) % 2) AS h,
               6 + (doc_id + k) % 20 AS fw,
               6 + (doc_id + k) % 10 AS fh,
               5 + (doc_id + k) % 25 AS gw,
               5 + (doc_id + k) % 12 AS gh
        FROM img
    ),
    blk AS (
        SELECT doc_id, k, w, h,
               unnest(range(0, (w // 8) * (h // 8))) AS b
        FROM cls WHERE leg IN (1, 3)
    ),
    bc AS (
        SELECT doc_id, k, w, h,
               (doc_id + 17 * b + 7 * k) % 112 - 56 AS d,
               (doc_id + 5 * b + 3 * k) % 13 AS a
        FROM blk
    ),
    st AS (
        SELECT doc_id, k, MAX(w) AS w, MAX(h) AS h,
               CAST(SUM(64 * (128 + d)) AS BIGINT) AS sum_px,
               CAST(MIN(128 + d - a) AS BIGINT) AS min_px,
               CAST(MAX(128 + d + a) AS BIGINT) AS max_px
        FROM bc GROUP BY doc_id, k
    ),
    frow AS (
        SELECT doc_id, k, fw, fh, unnest(range(0, fh)) AS r
        FROM cls WHERE leg = 2
    ),
    fcol AS (
        SELECT doc_id, k, fw, fh, r, unnest(range(0, fw)) AS c
        FROM frow
    ),
    fpx AS (
        SELECT doc_id, k, fw, fh,
               (doc_id + 9 * r + 23 * c) % 256 AS v
        FROM fcol
    ),
    fst AS (
        SELECT doc_id, k, MAX(fw) AS w, MAX(fh) AS h,
               CAST(SUM(v) AS BIGINT) AS sum_px,
               CAST(MIN(v) AS BIGINT) AS min_px,
               CAST(MAX(v) AS BIGINT) AS max_px
        FROM fpx GROUP BY doc_id, k
    ),
    grow AS (
        SELECT doc_id, k, gw, gh, unnest(range(0, gh)) AS r
        FROM cls WHERE leg8 = 4
    ),
    gcol AS (
        SELECT doc_id, k, gw, gh, r, unnest(range(0, gw)) AS c
        FROM grow
    ),
    gpx AS (
        SELECT doc_id, k, gw, gh,
               CASE WHEN (doc_id + 3 * r + c + 5 * k) % 23 < 11
                    THEN 1 ELSE 0 END AS v
        FROM gcol
    ),
    gst AS (
        SELECT doc_id, k, MAX(gw) AS w, MAX(gh) AS h,
               CAST(SUM(v) AS BIGINT) AS sum_px,
               CAST(MIN(v) AS BIGINT) AS min_px,
               CAST(MAX(v) AS BIGINT) AS max_px
        FROM gpx GROUP BY doc_id, k
    )
    SELECT doc_id, CAST(k AS BIGINT) AS img_idx,
           'DCTDecode' AS filter, CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height, CAST(w * h AS BIGINT) AS n_px,
           sum_px, min_px, max_px, TRUE AS decoded
    FROM st
    UNION ALL
    SELECT doc_id, CAST(k AS BIGINT) AS img_idx,
           'FlateDecode' AS filter, CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height, CAST(w * h AS BIGINT) AS n_px,
           sum_px, min_px, max_px, TRUE AS decoded
    FROM fst
    UNION ALL
    SELECT doc_id, CAST(k AS BIGINT), 'JPXDecode',
           CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           FALSE
    FROM cls WHERE leg8 = 0
    UNION ALL
    SELECT doc_id, CAST(k AS BIGINT) AS img_idx,
           'CCITTFaxDecode' AS filter, CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height, CAST(w * h AS BIGINT) AS n_px,
           sum_px, min_px, max_px, TRUE AS decoded
    FROM gst
    UNION ALL
    SELECT doc_id, CAST(-1 AS BIGINT), 'none',
           CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           FALSE
    FROM g WHERE corrupt
    """,
)
def x_pdf_images(spark, sf_dir):
    """PDF embedded-image extraction (r10, VERDICT r9 task 4;
    operators/media.pdf_image_stats) — the reference's
    examples/extract-images.py blob workflow on PDFs and the entry
    point for PDF-figure training data: /Subtype /Image XObject
    streams are walked with the innermost-dict scan, /DCTDecode blobs
    (complete JPEG files per the PDF spec) run the FULL baseline
    entropy decode with every decoded pixel value-checked against the
    exact-IDCT coefficient model (pixel = 128 + dc ± ac), and
    /FlateDecode /DeviceGray 8-bit bitmaps inflate to per-pixel-
    checked rasters (r10), and /CCITTFaxDecode /K -1 streams (r11,
    VERDICT r10 task 2 — the scanned-PDF population) decode through
    the from-scratch T.6 G4 engine with every BIT value-checked
    ([(id+3r+c+5k)%23<11], /BlackIs1 honored).  JPXDecode stubs are
    reported with their filter name and decoded=false — never
    mis-decoded; every 19th id is not a PDF (sentinel row)."""
    from lwetl_spark.operators.media import (
        pdf_image_stats,
        synth_pdf_img_demo,
    )

    docs = _t(spark, sf_dir, "documents")
    out = pdf_image_stats(synth_pdf_img_demo(docs))
    return out.select(
        "doc_id", "img_idx",
        F.coalesce(F.col("filter"), F.lit("none")).alias("filter"),
        *[F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)
          for c in ("width", "height", "n_px", "sum_px", "min_px",
                    "max_px")],
        "decoded",
    )


@register(
    "x_tiff_meta",
    """
    WITH g AS (
        SELECT doc_id, 1 + doc_id % 3 AS np, doc_id % 25 = 0 AS corrupt
        FROM documents
    ),
    pg AS (SELECT doc_id, np, corrupt, unnest(range(0, np)) AS p FROM g)
    SELECT doc_id, CAST(p AS BIGINT) AS page_idx,
           CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END
               AS byte_order,
           CAST(16 + (doc_id + 9 * p) % 120 AS BIGINT) AS width,
           CAST(16 + (doc_id + 5 * p) % 80 AS BIGINT) AS height,
           CAST(8 * (1 + (doc_id + p) % 2) AS BIGINT) AS bits,
           CAST(1 + 4 * ((doc_id + p) % 2) AS BIGINT) AS compression,
           NOT corrupt AS valid
    FROM pg
    """,
)
def x_tiff_meta(spark, sf_dir):
    """TIFF census (r9; operators/media.tiff_pages): byte-order mark
    (II and MM fixtures both), magic 42, then the IFD chain — one row
    per page with dims/bits/compression read from SHORT (inline,
    byte-order-honoring) and LONG entry cells.  Scanner/document
    crawls ship multi-page TIFFs; a parser that assumes
    single-page-little-endian fails half the rows.  Every 25th id
    points the last next-IFD pointer past the file: the walk keeps
    every real page, valid=false (partial-census contract; a cycle
    in the chain is also caught — pytest)."""
    from lwetl_spark.operators.media import synth_tiff_demo, tiff_pages

    docs = _t(spark, sf_dir, "documents")
    out = tiff_pages(synth_tiff_demo(docs))
    return out.select(
        "doc_id", "page_idx",
        F.coalesce(F.col("byte_order"), F.lit("none"))
        .alias("byte_order"),
        *[F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)
          for c in ("width", "height", "bits", "compression")],
        "valid",
    )


@register(
    "x_flac_meta",
    """
    WITH g AS (
        SELECT doc_id, 8000 + 250 * (doc_id % 32) AS rate,
               1 + doc_id % 8 AS ch, 8 + 4 * (doc_id % 3) AS bps,
               1000 + (37 * doc_id) % 100000 AS total,
               2 + doc_id % 3 AS nb, doc_id % 27 = 0 AS corrupt
        FROM documents
    )
    SELECT doc_id,
           CAST(CASE WHEN corrupt THEN -1 ELSE rate END AS BIGINT)
               AS sample_rate,
           CAST(CASE WHEN corrupt THEN -1 ELSE ch END AS BIGINT)
               AS channels,
           CAST(CASE WHEN corrupt THEN -1 ELSE bps END AS BIGINT)
               AS bps,
           CAST(CASE WHEN corrupt THEN -1 ELSE total END AS BIGINT)
               AS total_samples,
           CAST(CASE WHEN corrupt THEN -1
                ELSE total * 1000 // rate END AS BIGINT) AS duration_ms,
           CAST(CASE WHEN corrupt THEN -1 ELSE nb END AS BIGINT)
               AS n_blocks,
           NOT corrupt AS valid
    FROM g
    """,
)
def x_flac_meta(spark, sf_dir):
    """FLAC census (r9; operators/media.flac_meta): metadata-block
    walk to the last-flag + STREAMINFO bit unpack — the 20/3/5/36-bit
    packed rate/channels/bps/total word a decoder must shift apart
    exactly (any off-by-one in the field widths corrupts every
    column).  duration_ms = total·1000 div rate, exact integer.
    Every 27th id truncates mid-STREAMINFO → NULL census with -1
    sentinels (the x_mp4_meta rule)."""
    from lwetl_spark.operators.media import flac_meta, synth_flac_demo

    docs = _t(spark, sf_dir, "documents")
    out = flac_meta(synth_flac_demo(docs))
    return out.select(
        "doc_id",
        *[F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)
          for c in ("sample_rate", "channels", "bps", "total_samples",
                    "duration_ms", "n_blocks")],
        "valid",
    )


@register(
    "x_ogg_meta",
    """
    WITH g AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'opus' ELSE 'vorbis' END
                   AS codec,
               1 + doc_id % 2 AS ch, 8000 + 1000 * (doc_id % 8) AS rate,
               1000 + (23 * doc_id) % 50000 AS tg,
               3 + doc_id % 4 AS np, doc_id % 27 = 0 AS corrupt
        FROM documents
    ),
    d AS (
        SELECT *,
               CASE WHEN corrupt THEN tg * (np - 2) // (np - 1)
                    ELSE tg END AS granule,
               CASE WHEN codec = 'opus' THEN 48000 ELSE rate END AS tick
        FROM g
    )
    SELECT doc_id, codec,
           CAST(ch AS BIGINT) AS channels,
           CAST(rate AS BIGINT) AS sample_rate,
           CAST(CASE WHEN corrupt THEN np - 1 ELSE np END AS BIGINT)
               AS n_pages,
           CAST(granule * 1000 // tick AS BIGINT) AS duration_ms,
           NOT corrupt AS valid
    FROM d
    """,
)
def x_ogg_meta(spark, sf_dir):
    """Ogg census (r9; operators/media.ogg_meta): page walk with REAL
    per-page CRC verification — the 0x04C11DB7 UNREFLECTED CRC-32 the
    Ogg spec mandates (zlib's reflected crc32 fails every page, so
    passing this key proves a from-scratch implementation) — plus
    Opus/Vorbis identification-header parse and duration from the
    highest valid granule (Opus granules are 48 kHz per RFC 7845;
    Vorbis granules tick at the stream's own rate — the oracle
    encodes BOTH rules).  Every 27th id flips the last page's payload
    byte: its CRC fails, the census keeps the pages before it, and
    duration falls back to the last intact granule — all
    arithmetic-replayed."""
    from lwetl_spark.operators.media import ogg_meta, synth_ogg_demo

    docs = _t(spark, sf_dir, "documents")
    out = ogg_meta(synth_ogg_demo(docs))
    return out.select(
        "doc_id",
        F.coalesce(F.col("codec"), F.lit("none")).alias("codec"),
        *[F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)
          for c in ("channels", "sample_rate", "n_pages",
                    "duration_ms")],
        "valid",
    )


@register(
    "x_zip_extract",
    """
    WITH g AS (
        SELECT doc_id, 1 + doc_id % 5 AS nm, doc_id % 23 = 0 AS corrupt
        FROM documents
    ),
    n AS (
        SELECT doc_id, corrupt,
               CASE WHEN corrupt THEN nm - 1 ELSE nm END AS keep
        FROM g
    ),
    mem AS (
        SELECT doc_id, corrupt, unnest(range(0, keep)) AS j
        FROM n WHERE keep > 0
    ),
    bexp AS (
        SELECT doc_id, j, 20 + (doc_id + 7 * j) % 40 AS usz,
               unnest(range(0, 20 + (doc_id + 7 * j) % 40)) AS k
        FROM mem
    ),
    bsum AS (
        SELECT doc_id, j, MAX(usz) AS usz,
               CAST(SUM((doc_id + 11 * j + 3 * k) % 256) AS BIGINT)
                   AS byte_sum
        FROM bexp GROUP BY doc_id, j
    )
    SELECT m.doc_id, CAST(m.j AS BIGINT) AS member_idx,
           printf('m%d.bin', m.j) AS name,
           CASE (m.doc_id + m.j) % 4 WHEN 0 THEN 'stored'
                WHEN 1 THEN 'deflate' WHEN 2 THEN 'bzip2'
                ELSE 'zstd' END AS method,
           CAST(b.usz AS BIGINT) AS uncomp_size,
           b.byte_sum, TRUE AS ok, NOT m.corrupt AS valid
    FROM mem m JOIN bsum b ON m.doc_id = b.doc_id AND m.j = b.j
    UNION ALL
    SELECT doc_id, CAST(-1 AS BIGINT), 'none', 'none',
           CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), FALSE, FALSE
    FROM n WHERE keep = 0
    """,
)
def x_zip_extract(spark, sf_dir):
    """ZIP walk + REAL member extraction (r9; operators/media.
    zip_member_contents): EOCD backward scan, central-directory
    catalog with local-header validation, then stored-copy or
    raw-deflate (zlib wbits=-15) inflate with CRC-32 verification —
    datasets ship as zip at least as often as tar, and the extraction
    is proved by each member's decompressed byte SUM, not just the
    catalog.  Fixtures rotate stored / deflate / bzip2 / zstd members
    (real compression, real CRCs; zstd — APPNOTE method 93, the
    WebDataset-era framing — decodes since r11 via Arrow's bundled
    libzstd with the frame-boundary walk; generator cross-checked
    against the stdlib zipfile reader in pytest) and — r10 — every 3rd id is a
    FORCED-zip64 archive (EOCD64 + locator + 0x0001 extra fields, the
    >4 GiB bundle layout; stdlib force_zip64 cross-checked both
    directions).  Every 23rd id corrupts the
    last central entry: the walker keeps the members before the lie,
    valid=false on the shard (a fully-emptied catalog yields the
    sentinel row)."""
    from lwetl_spark.operators.media import (
        synth_zip_demo,
        zip_member_contents,
    )

    docs = _t(spark, sf_dir, "documents")
    out = zip_member_contents(synth_zip_demo(docs))
    return out.select(
        "doc_id", "member_idx",
        F.coalesce(F.col("name"), F.lit("none")).alias("name"),
        F.coalesce(F.col("method"), F.lit("none")).alias("method"),
        F.coalesce(F.col("uncomp_size"), F.lit(-1)).cast("long")
        .alias("uncomp_size"),
        F.coalesce(F.col("byte_sum"), F.lit(-1)).cast("long")
        .alias("byte_sum"),
        "ok", "valid",
    )


@register(
    "x_png_subbyte",
    """
    WITH g AS (
        SELECT doc_id, 5 + doc_id % 12 AS w, 4 + doc_id % 7 AS h,
               doc_id % 256 AS s,
               CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2
                    ELSE 4 END AS d,
               doc_id % 2 = 1 AND doc_id % 3 = 2 AS pal,
               doc_id % 29 = 0 AS corrupt
        FROM documents
    ),
    gv AS (
        SELECT *, CASE WHEN pal THEN 5 + doc_id % 11
                       ELSE 1 << d END AS n_vals
        FROM g
    ),
    rr AS (SELECT *, unnest(range(0, h)) AS r FROM gv),
    cc AS (SELECT *, unnest(range(0, w)) AS c FROM rr),
    kk AS (SELECT *, unnest(range(0, 3)) AS k FROM cc),
    v AS (
        SELECT doc_id, w, h, pal,
               CASE WHEN NOT pal THEN (s + 7 * r + 13 * c) % n_vals
                    WHEN k = 0
                    THEN (3 * ((s + 7 * r + 13 * c) % n_vals) + 11) % 256
                    WHEN k = 1
                    THEN (5 * ((s + 7 * r + 13 * c) % n_vals) + 29) % 256
                    ELSE (7 * ((s + 7 * r + 13 * c) % n_vals) + 47) % 256
               END AS v
        FROM kk WHERE k < CASE WHEN pal THEN 3 ELSE 1 END
    ),
    st AS (
        SELECT doc_id, MAX(w) AS w, MAX(h) AS h, BOOL_OR(pal) AS pal,
               CAST(COUNT(*) AS BIGINT) AS n_px,
               CAST(SUM(v) AS BIGINT) AS sum_px,
               CAST(MIN(v) AS BIGINT) AS min_px,
               CAST(MAX(v) AS BIGINT) AS max_px
        FROM v GROUP BY doc_id
    )
    SELECT s2.doc_id,
           CAST(CASE WHEN g2.corrupt THEN -1 ELSE s2.w END AS BIGINT)
               AS width,
           CAST(CASE WHEN g2.corrupt THEN -1 ELSE s2.h END AS BIGINT)
               AS height,
           CAST(CASE WHEN g2.corrupt THEN -1 ELSE s2.n_px END AS BIGINT)
               AS n_px,
           CAST(CASE WHEN g2.corrupt THEN -1 ELSE s2.sum_px END
                AS BIGINT) AS sum_px,
           CAST(CASE WHEN g2.corrupt THEN -1 ELSE s2.min_px END
                AS BIGINT) AS min_px,
           CAST(CASE WHEN g2.corrupt THEN -1 ELSE s2.max_px END
                AS BIGINT) AS max_px
    FROM st s2 JOIN g g2 ON s2.doc_id = g2.doc_id
    """,
)
def x_png_subbyte(spark, sf_dir):
    """SUB-BYTE PNG decode (r9 — with this, EVERY legal PNG form
    decodes: depths 1/2/4/8/16 × all color types × both interlace
    modes; operators/media._make_png_codec): depth-1/2/4 scanlines
    filter at the spec's 1-BYTE offset, then samples unpack MSB-first
    with pad bits discarded (fixture widths sit off byte
    boundaries deliberately).  Gray fixtures value-check raw
    2^d-range samples; 4-bit palette fixtures map through PLTE — the
    icon form.  Corrupt-IDAT legs get -1 sentinels."""
    from lwetl_spark.operators.media import (
        png_pixel_stats,
        synth_png_sub_demo,
    )

    docs = _t(spark, sf_dir, "documents")
    out = png_pixel_stats(synth_png_sub_demo(docs))
    return out.select(
        "doc_id",
        *[F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)
          for c in ("width", "height", "n_px", "sum_px", "min_px",
                    "max_px")],
    )


@register(
    "x_gif_pixels",
    """
    WITH g AS (
        SELECT doc_id, 4 + doc_id % 9 AS w, 4 + doc_id % 7 AS h,
               1 + doc_id % 4 AS nf, 5 + doc_id % 12 AS np,
               doc_id % 256 AS s
        FROM documents
    ),
    ff AS (SELECT *, unnest(range(0, 4)) AS f FROM g),
    rr AS (SELECT *, unnest(range(0, h)) AS r FROM ff WHERE f < nf),
    cc AS (SELECT *, unnest(range(0, w)) AS c FROM rr),
    px AS (
        SELECT doc_id, w, h, nf,
               (s + 7 * r + 13 * c + 17 * f) % np AS p
        FROM cc
    ),
    v AS (
        SELECT doc_id, w, h, nf, (3 * p + 11) % 256 AS r0,
               (5 * p + 29) % 256 AS g0, (7 * p + 47) % 256 AS b0
        FROM px
    ),
    st AS (
        SELECT doc_id, MAX(w) AS w, MAX(h) AS h, MAX(nf) AS nf,
               CAST(SUM(r0 + g0 + b0) AS BIGINT) AS sum_px,
               CAST(LEAST(MIN(r0), MIN(g0), MIN(b0)) AS BIGINT) AS min_px,
               CAST(GREATEST(MAX(r0), MAX(g0), MAX(b0)) AS BIGINT)
                   AS max_px
        FROM v GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 31 <> 0 THEN w ELSE -1 END
                AS BIGINT) AS width,
           CAST(CASE WHEN doc_id % 31 <> 0 THEN h ELSE -1 END
                AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 31 <> 0 THEN nf ELSE -1 END
                AS BIGINT) AS n_frames,
           CAST(CASE WHEN doc_id % 31 <> 0 THEN 3 * w * h * nf
                ELSE -1 END AS BIGINT) AS n_px,
           CAST(CASE WHEN doc_id % 31 <> 0 THEN sum_px ELSE -1 END
                AS BIGINT) AS sum_px,
           CAST(CASE WHEN doc_id % 31 <> 0 THEN min_px ELSE -1 END
                AS BIGINT) AS min_px,
           CAST(CASE WHEN doc_id % 31 <> 0 THEN max_px ELSE -1 END
                AS BIGINT) AS max_px
    FROM st
    """,
)
def x_gif_pixels(spark, sf_dir):
    """GIF-LZW PIXEL decode (r9 — retires the census's 'LZW out of
    scope' caveat; operators/media.gif_pixel_stats): per-frame LZW
    decompression (LSB-first variable-width codes, CLEAR/END, KwKwK,
    the decoder-side width bump at 2^width — one BEFORE the encoder's,
    the lag real codecs must honor), palette mapping through the
    arithmetic color table, and 8/8/4/2 de-interlacing on every 5th
    fixture.  Stats cover ALL frames of animated fixtures, so a
    decoder that stops at frame 0 or mis-resets the dictionary between
    frames fails the value hash.  Every 31st id truncates the last
    frame's code stream → NULL stats with -1 sentinels (the
    x_mp4_meta rule), never a task failure."""
    from lwetl_spark.operators.media import (
        gif_pixel_stats,
        synth_gif_px_demo,
    )

    docs = _t(spark, sf_dir, "documents")
    out = gif_pixel_stats(synth_gif_px_demo(docs))
    return out.select(
        "doc_id",
        *[F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)
          for c in ("width", "height", "n_frames", "n_px", "sum_px",
                    "min_px", "max_px")],
    )


@register(
    "x_png_palette",
    """
    WITH g AS (
        SELECT doc_id, 4 + doc_id % 10 AS w, 4 + doc_id % 8 AS h,
               doc_id % 256 AS s, 16 + doc_id % 17 AS np
        FROM documents
    ),
    rr AS (SELECT *, unnest(range(0, h)) AS r FROM g),
    cc AS (SELECT *, unnest(range(0, w)) AS c FROM rr),
    px AS (
        SELECT doc_id, w, h, (s + 7 * r + 13 * c) % np AS p
        FROM cc
    ),
    v AS (
        SELECT doc_id, w, h, (3 * p + 11) % 256 AS r0,
               (5 * p + 29) % 256 AS g0, (7 * p + 47) % 256 AS b0
        FROM px
    ),
    st AS (
        SELECT doc_id, MAX(w) AS w, MAX(h) AS h,
               CAST(SUM(r0 + g0 + b0) AS BIGINT) AS sum_px,
               CAST(LEAST(MIN(r0), MIN(g0), MIN(b0)) AS BIGINT) AS min_px,
               CAST(GREATEST(MAX(r0), MAX(g0), MAX(b0)) AS BIGINT)
                   AS max_px
        FROM v GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN w ELSE -1 END
                AS BIGINT) AS width,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN h ELSE -1 END
                AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN 3 * w * h ELSE -1 END
                AS BIGINT) AS n_px,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN sum_px ELSE -1 END
                AS BIGINT) AS sum_px,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN min_px ELSE -1 END
                AS BIGINT) AS min_px,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN max_px ELSE -1 END
                AS BIGINT) AS max_px
    FROM st
    """,
)
def x_png_palette(spark, sf_dir):
    """INDEXED (palette) PNG decode (r9; operators/media.
    _make_png_codec type-3 path): the index plane reconstructs through
    the five-filter logic at bpp=1, then maps through the in-file PLTE
    to RGB — icons/logos in real crawls are type-3.  The oracle
    recomputes every channel from the arithmetic palette AND index
    models (a decoder that confuses index-space with sample-space
    fails immediately); out-of-range indices are a structural lie
    (pytest); corrupt-IDAT legs get -1 sentinels.  16-bit remains the
    only out-of-scope PNG form."""
    from lwetl_spark.operators.media import (
        png_pixel_stats,
        synth_png_palette_demo,
    )

    docs = _t(spark, sf_dir, "documents")
    out = png_pixel_stats(synth_png_palette_demo(docs))
    return out.select(
        "doc_id",
        *[F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)
          for c in ("width", "height", "n_px", "sum_px", "min_px",
                    "max_px")],
    )


@register(
    "x_png_adam7",
    """
    WITH g AS (
        SELECT doc_id, 4 + doc_id % 13 AS w, 4 + doc_id % 7 AS h,
               doc_id % 256 AS s
        FROM documents
    ),
    rr AS (SELECT *, unnest(range(0, h)) AS r FROM g),
    cc AS (SELECT *, unnest(range(0, w)) AS c FROM rr),
    kk AS (SELECT *, unnest(range(0, 3)) AS k FROM cc),
    v AS (
        SELECT doc_id, w, h,
               (s + 7 * r + 13 * c + 89 * k) % 256 AS v
        FROM kk
    ),
    st AS (
        SELECT doc_id, MAX(w) AS w, MAX(h) AS h,
               CAST(SUM(v) AS BIGINT) AS sum_px,
               CAST(MIN(v) AS BIGINT) AS min_px,
               CAST(MAX(v) AS BIGINT) AS max_px
        FROM v GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN w ELSE -1 END
                AS BIGINT) AS width,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN h ELSE -1 END
                AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN 3 * w * h ELSE -1 END
                AS BIGINT) AS n_px,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN sum_px ELSE -1 END
                AS BIGINT) AS sum_px,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN min_px ELSE -1 END
                AS BIGINT) AS min_px,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN max_px ELSE -1 END
                AS BIGINT) AS max_px
    FROM st
    """,
)
def x_png_adam7(spark, sf_dir):
    """ADAM7-INTERLACED PNG decode (r9 — retires the interlace
    rejection added earlier this round; operators/media.
    _make_png_codec): seven independently-filtered passes, each
    reconstructed with the full five-filter logic and scattered onto
    its (y0::ys, x0::xs) grid; odd fixture sizes leave some passes
    empty (pw·ph = 0), the geometry real interlaced files make
    decoders get right.  Pixels are the png_color_bytes model in
    FINAL coordinates, so the oracle recomputes every channel value
    while the decoder must run the whole pass machinery; corrupt-IDAT
    legs get -1 sentinels."""
    from lwetl_spark.operators.media import (
        png_pixel_stats,
        synth_png_adam7_demo,
    )

    docs = _t(spark, sf_dir, "documents")
    out = png_pixel_stats(synth_png_adam7_demo(docs))
    return out.select(
        "doc_id",
        *[F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)
          for c in ("width", "height", "n_px", "sum_px", "min_px",
                    "max_px")],
    )


@register(
    "x_png_color",
    """
    WITH g AS (
        SELECT doc_id, 4 + doc_id % 12 AS w, 4 + doc_id % 6 AS h,
               doc_id % 256 AS s
        FROM documents
    ),
    rr AS (SELECT *, unnest(range(0, h)) AS r FROM g),
    cc AS (SELECT *, unnest(range(0, w)) AS c FROM rr),
    kk AS (SELECT *, unnest(range(0, 3)) AS k FROM cc),
    v AS (
        SELECT doc_id, w, h,
               (s + 7 * r + 13 * c + 89 * k) % 256 AS v
        FROM kk
    ),
    st AS (
        SELECT doc_id, MAX(w) AS w, MAX(h) AS h,
               CAST(SUM(v) AS BIGINT) AS sum_px,
               CAST(MIN(v) AS BIGINT) AS min_px,
               CAST(MAX(v) AS BIGINT) AS max_px
        FROM v GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN w ELSE -1 END
                AS BIGINT) AS width,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN h ELSE -1 END
                AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN 3 * w * h ELSE -1 END
                AS BIGINT) AS n_px,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN sum_px ELSE -1 END
                AS BIGINT) AS sum_px,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN min_px ELSE -1 END
                AS BIGINT) AS min_px,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN max_px ELSE -1 END
                AS BIGINT) AS max_px
    FROM st
    """,
)
def x_png_color(spark, sf_dir):
    """TRUECOLOR PNG pixel decode (r9 — the r8 codec was
    grayscale-only, but real-crawl PNGs are mostly color type 2/6;
    operators/media._make_png_codec): full five-filter reconstruction
    at the 3-byte pixel offset (Sub/Average/Paeth 'left' is one PIXEL
    back — the byte-offset bug class this oracle would catch), RGB
    pixel stats over every channel.  The fixture rotates ALL FIVE
    filters by row and the oracle recomputes every channel value from
    id arithmetic; every 29th id has a broken IDAT zlib stream → NULL
    stats with -1 sentinels (the x_mp4_meta rule), never a task
    failure.  Adam7 (x_png_adam7), palette (x_png_palette), and
    16-bit (x_png_16bit) decode too."""
    from lwetl_spark.operators.media import (
        png_pixel_stats,
        synth_png_color_demo,
    )

    docs = _t(spark, sf_dir, "documents")
    out = png_pixel_stats(synth_png_color_demo(docs))
    return out.select(
        "doc_id",
        *[F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)
          for c in ("width", "height", "n_px", "sum_px", "min_px",
                    "max_px")],
    )


@register(
    "x_png_16bit",
    """
    WITH g AS (
        SELECT doc_id, 4 + doc_id % 11 AS w, 4 + doc_id % 6 AS h,
               doc_id % 256 AS s,
               CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 3 END AS nch
        FROM documents
    ),
    rr AS (SELECT *, unnest(range(0, h)) AS r FROM g),
    cc AS (SELECT *, unnest(range(0, w)) AS c FROM rr),
    kk AS (SELECT *, unnest(range(0, 3)) AS k FROM cc),
    v AS (
        SELECT doc_id, w, h, nch,
               (s * 257 + 131 * r + 241 * c + 7919 * k) % 65536 AS v
        FROM kk WHERE k < nch
    ),
    st AS (
        SELECT doc_id, MAX(w) AS w, MAX(h) AS h, MAX(nch) AS nch,
               CAST(SUM(v) AS BIGINT) AS sum_px,
               CAST(MIN(v) AS BIGINT) AS min_px,
               CAST(MAX(v) AS BIGINT) AS max_px
        FROM v GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN w ELSE -1 END
                AS BIGINT) AS width,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN h ELSE -1 END
                AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN nch * w * h ELSE -1 END
                AS BIGINT) AS n_px,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN sum_px ELSE -1 END
                AS BIGINT) AS sum_px,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN min_px ELSE -1 END
                AS BIGINT) AS min_px,
           CAST(CASE WHEN doc_id % 29 <> 0 THEN max_px ELSE -1 END
                AS BIGINT) AS max_px
    FROM st
    """,
)
def x_png_16bit(spark, sf_dir):
    """16-BIT PNG pixel decode (r9 — closes the PNG ledger: every
    spec color type and byte-aligned depth now decodes; operators/
    media._make_png_codec): scanline filters run on BYTES with the
    left neighbor ch·2 bytes back, THEN big-endian pairs combine into
    uint16 samples — the order a 16-bit decoder must get right (a
    sample-space filter or a little-endian combine fails every
    non-trivial pixel).  Gray and RGB fixtures rotate all five spec
    filters; the oracle recomputes every 16-bit sample from id
    arithmetic; corrupt-IDAT legs get -1 sentinels (the x_mp4_meta
    rule).  Sub-byte depths decode too (x_png_subbyte) — every
    legal PNG form now decodes."""
    from lwetl_spark.operators.media import (
        png_pixel_stats,
        synth_png16_demo,
    )

    docs = _t(spark, sf_dir, "documents")
    out = png_pixel_stats(synth_png16_demo(docs))
    return out.select(
        "doc_id",
        *[F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)
          for c in ("width", "height", "n_px", "sum_px", "min_px",
                    "max_px")],
    )


@register(
    "x_jpeg_progressive",
    """
    WITH g AS (
        SELECT doc_id, 16 + doc_id % 32 AS w, 16 + doc_id % 16 AS h,
               (16 + doc_id % 32 + 7) // 8 AS bxn,
               (16 + doc_id % 16 + 7) // 8 AS byn
        FROM documents WHERE doc_id % 9 = 5
    ),
    blk AS (
        SELECT doc_id, w, h, bxn,
               unnest(range(0, bxn * byn)) AS b
        FROM g
    ),
    blk2 AS (
        SELECT doc_id, w, h, b % bxn AS bx, b // bxn AS by,
               (doc_id + 17 * b) % 112 - 56 AS d,
               (doc_id + 5 * b) % 13 AS a
        FROM blk
    ),
    rr AS (SELECT *, unnest(range(0, 8)) AS yy FROM blk2),
    px AS (
        SELECT doc_id, w, h,
               128 + d + CASE WHEN yy IN (0, 3, 4, 7) THEN a ELSE -a END AS v,
               LEAST(8, w - 8 * bx) AS ncols
        FROM rr WHERE 8 * by + yy < h
    )
    SELECT doc_id, CAST(MAX(w) AS BIGINT) AS width,
           CAST(MAX(h) AS BIGINT) AS height,
           CAST(MAX(w) * MAX(h) AS BIGINT) AS n_px,
           CAST(SUM(v * ncols) AS BIGINT) AS sum_px,
           CAST(MIN(v) AS BIGINT) AS min_px,
           CAST(MAX(v) AS BIGINT) AS max_px
    FROM px GROUP BY doc_id
    """,
)
def x_jpeg_progressive(spark, sf_dir):
    """PROGRESSIVE JPEG decode (r9 — retires the last in-environment
    decode stub; operators/media.decode_jpeg SOF2 multi-scan path):
    the fixture re-encodes the x_jpeg_pixels coefficient model with
    the libjpeg-style progressive script — spectral selection AND
    successive approximation across four scans (DC first at Al=1 with
    diff coding, DC raw-bit refinement, AC band first with EOB runs,
    AC refinement with newly-significant insertions and correction
    bits, T.81 §G).  The decoder accumulates quantized coefficients
    across scans and runs the shared dequant+IDCT finish; decoded
    pixels must equal the sequential arithmetic EXACTLY — a predictor
    not reset, a correction bit mis-ordered, or an EOB run off by one
    moves every later coefficient and fails the oracle.  Only
    arithmetic-coded/hierarchical JPEG remains out of scope."""
    from lwetl_spark.operators.media import (
        jpeg_pixel_stats,
        synth_jpeg_prog_demo,
    )

    docs = _t(spark, sf_dir, "documents")
    media = synth_jpeg_prog_demo(docs.filter(F.col("doc_id") % 9 == 5))
    return jpeg_pixel_stats(media)


@register(
    "x_jpeg_rst",
    """
    WITH g AS (
        SELECT doc_id, 16 + doc_id % 32 AS w, 16 + doc_id % 16 AS h,
               (16 + doc_id % 32 + 7) // 8 AS bxn,
               (16 + doc_id % 16 + 7) // 8 AS byn
        FROM documents WHERE doc_id % 7 = 4
    ),
    blk AS (
        SELECT doc_id, w, h, bxn,
               unnest(range(0, bxn * byn)) AS b
        FROM g
    ),
    blk2 AS (
        SELECT doc_id, w, h, b % bxn AS bx, b // bxn AS by,
               (doc_id + 17 * b) % 112 - 56 AS d,
               (doc_id + 5 * b) % 13 AS a
        FROM blk
    ),
    rr AS (SELECT *, unnest(range(0, 8)) AS yy FROM blk2),
    px AS (
        SELECT doc_id, w, h,
               128 + d + CASE WHEN yy IN (0, 3, 4, 7) THEN a ELSE -a END AS v,
               LEAST(8, w - 8 * bx) AS ncols
        FROM rr WHERE 8 * by + yy < h
    )
    SELECT doc_id, CAST(MAX(w) AS BIGINT) AS width,
           CAST(MAX(h) AS BIGINT) AS height,
           CAST(MAX(w) * MAX(h) AS BIGINT) AS n_px,
           CAST(SUM(v * ncols) AS BIGINT) AS sum_px,
           CAST(MIN(v) AS BIGINT) AS min_px,
           CAST(MAX(v) AS BIGINT) AS max_px
    FROM px GROUP BY doc_id
    """,
)
def x_jpeg_rst(spark, sf_dir):
    """Restart-marker JPEG decode (r9; operators/media.decode_jpeg DRI
    path): the fixture re-encodes the x_jpeg_pixels coefficient model
    with a DRI segment and real RSTn markers every 1+(id%4) MCUs —
    byte-aligned padding, marker-sequence consumption, per-restart DC
    predictor resets (T.81 §E.2.4; most real-crawl JPEGs carry
    restarts, which the r8 decoder honestly rejected).  Decoded pixels
    must equal the unrestarted arithmetic EXACTLY — any drift in the
    restart machinery (a predictor not reset, a padding bit consumed
    as data) moves every downstream pixel and fails the oracle."""
    from lwetl_spark.operators.media import (
        jpeg_pixel_stats,
        synth_jpeg_rst_demo,
    )

    docs = _t(spark, sf_dir, "documents")
    media = synth_jpeg_rst_demo(docs.filter(F.col("doc_id") % 7 == 4))
    return jpeg_pixel_stats(media)


@register(
    "x_jpeg_420",
    """
    WITH g AS (
        SELECT doc_id, 16 + 8 * (doc_id % 3) AS w, 16 + 8 * (doc_id % 2) AS h,
               (16 + 8 * (doc_id % 3) + 15) // 16 AS mxn
        FROM documents WHERE doc_id % 3 = 0
    ),
    ry AS (SELECT *, unnest(range(0, h)) AS y FROM g),
    px AS (SELECT *, unnest(range(0, w)) AS x FROM ry),
    c AS (
        SELECT doc_id, w, h,
               (y // 8) * 2 * mxn + (x // 8) AS b,
               (y // 16) * mxn + (x // 16) AS m,
               CASE WHEN (y % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END AS sy,
               CASE WHEN ((y % 16) // 2) IN (0, 3, 4, 7)
                    THEN 1 ELSE -1 END AS sc
        FROM px
    ),
    v AS (
        SELECT doc_id, w, h,
               128 + (doc_id + 17 * b) % 80 - 40
                   + sy * ((doc_id + 5 * b) % 13) AS yv,
               5 * ((doc_id + 3 * m) % 11 - 5)
                   + sc * 5 * ((doc_id + m) % 3) AS cb,
               5 * ((doc_id + 7 * m) % 11 - 5)
                   + sc * 5 * ((doc_id + 2 * m) % 3) AS cr
        FROM c
    ),
    rgb AS (
        SELECT doc_id, w, h,
               CAST(ROUND(yv + 1.402 * cr) AS BIGINT) AS r,
               CAST(ROUND(yv - 0.344136 * cb - 0.714136 * cr)
                    AS BIGINT) AS g2,
               CAST(ROUND(yv + 1.772 * cb) AS BIGINT) AS b2
        FROM v
    )
    SELECT doc_id, CAST(MAX(w) AS BIGINT) AS width,
           CAST(MAX(h) AS BIGINT) AS height,
           CAST(3 * MAX(w) * MAX(h) AS BIGINT) AS n_px,
           CAST(SUM(r + g2 + b2) AS BIGINT) AS sum_px,
           CAST(MIN(LEAST(r, g2, b2)) AS BIGINT) AS min_px,
           CAST(MAX(GREATEST(r, g2, b2)) AS BIGINT) AS max_px
    FROM rgb GROUP BY doc_id
    """,
)
def x_jpeg_420(spark, sf_dir):
    """REAL chroma-subsampled (4:2:0) JPEG decode — the layout of
    nearly every real-crawl JPEG (VERDICT r8 #1; operators/media.
    decode_jpeg r9 generic-MCU path): each 16×16 MCU interleaves four
    Y blocks + one Cb + one Cr, per-component sampling factors parsed
    from SOF, chroma decoded at quarter resolution and 2×2
    nearest-neighbor upsampled before the BT.601 transform.  The
    fixture's chroma is NON-neutral (per-MCU DC + a row-varying AC),
    so the oracle recomputes every decoded RGB pixel — Y model, chroma
    model, upsample geometry, rounding — from pure id arithmetic.
    w=24/h=24 legs force MCU-edge cropping (padded 32-grid, visible
    24), so the padded-raster block indexing is verified too.
    Progressive JPEG decodes too (x_jpeg_progressive, r9)."""
    from lwetl_spark.operators.media import (
        jpeg_pixel_stats,
        synth_jpeg420_demo,
    )

    docs = _t(spark, sf_dir, "documents")
    media = synth_jpeg420_demo(docs.filter(F.col("doc_id") % 3 == 0))
    return jpeg_pixel_stats(media)


@register(
    "x_wav_pcm",
    """
    WITH g AS (
        SELECT doc_id, doc_id % 4 AS dl, 40 + doc_id % 20 AS n,
               doc_id % 29 = 0 AND doc_id % 4 <> 0 AS corrupt
        FROM documents
    ),
    s AS (SELECT doc_id, dl, corrupt, n, unnest(range(0, n)) AS j
          FROM g),
    v AS (
        SELECT doc_id, dl, corrupt,
               (doc_id * 31 + j * 17) % 65536 - 32768 AS v16
        FROM s
    ),
    nat AS (
        SELECT doc_id, corrupt,
               CASE dl WHEN 0 THEN ABS(((v16 + 65536) // 256) - 256)
                       WHEN 1 THEN ABS(v16)
                       WHEN 2 THEN ABS(v16 * 256)
                       ELSE ABS(v16 * 65536) END AS a,
               CASE dl WHEN 0 THEN 127 WHEN 1 THEN 32767
                       WHEN 2 THEN 32767 * 256
                       ELSE CAST(32767 AS BIGINT) * 65536 END AS thr
        FROM v
    ),
    st AS (
        SELECT doc_id, BOOL_OR(corrupt) AS corrupt,
               CAST(COUNT(*) AS BIGINT) AS n_samples,
               CAST(MAX(a) AS BIGINT) AS peak,
               CAST(SUM(a) AS BIGINT) AS sum_abs,
               CAST(COUNT(*) FILTER (WHERE a >= thr) AS BIGINT)
                   AS n_clipped
        FROM nat GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(CASE WHEN corrupt THEN -1 ELSE n_samples END
                AS BIGINT) AS n_samples,
           CAST(CASE WHEN corrupt THEN -1 ELSE peak END
                AS BIGINT) AS peak,
           CAST(CASE WHEN corrupt THEN -1 ELSE sum_abs END
                AS BIGINT) AS sum_abs,
           CAST(CASE WHEN corrupt THEN -1 ELSE n_clipped END
                AS BIGINT) AS n_clipped
    FROM st
    """,
)
def x_wav_pcm(spark, sf_dir):
    """REAL PCM sample decode (r10 — widened to ALL four PCM depths;
    operators/media.wav_pcm_stats): RIFF chunk walk → decode the data
    chunk at its declared depth — 8-bit unsigned offset-128, 16/32-bit
    signed LE, 24-bit packed 3-byte two's complement — then exact
    integer signal stats (peak |amplitude|, total |amplitude| — the
    hash-stable RMS stand-in — and the clipped-sample census with the
    gate value scaled to the stream's depth).  Every decoded sample
    value-checks against the generator arithmetic at its native
    scale; non-whole-sample data chunks (every 29th non-8-bit id)
    are honest NULL sentinels."""
    from lwetl_spark.operators.media import (
        synth_wav_depth_demo,
        wav_pcm_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    out = wav_pcm_stats(synth_wav_depth_demo(docs))
    return out.select(
        "doc_id",
        *[F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)
          for c in ("n_samples", "peak", "sum_abs", "n_clipped")],
    )


@register(
    "x_wav_resample",
    """
    WITH g AS (
        SELECT doc_id, 40 + doc_id % 20 AS n
        FROM documents WHERE doc_id % 2 = 1
    ),
    s AS (SELECT doc_id, n, unnest(range(0, n)) AS j FROM g),
    f AS (
        SELECT doc_id, n,
               ((    ((doc_id * 31 + GREATEST(j - 2, 0) * 17) % 65536
                      - 32768)
                + 4 * ((doc_id * 31 + GREATEST(j - 1, 0) * 17) % 65536
                       - 32768)
                + 6 * ((doc_id * 31 + j * 17) % 65536 - 32768)
                + 4 * ((doc_id * 31 + LEAST(j + 1, n - 1) * 17) % 65536
                       - 32768)
                +     ((doc_id * 31 + LEAST(j + 2, n - 1) * 17) % 65536
                       - 32768)
                + 524288) // 16) - 32768 AS y
        FROM s WHERE j % 4 = 0
    ),
    kept AS (SELECT doc_id, n, ABS(y) AS a FROM f)
    SELECT doc_id, CAST(2000 AS BIGINT) AS sample_rate,
           CAST((MAX(n) + 3) // 4 AS BIGINT) AS n_samples,
           CAST(MAX(a) AS BIGINT) AS peak,
           CAST(SUM(a) AS BIGINT) AS sum_abs,
           TRUE AS roundtrip_ok
    FROM kept GROUP BY doc_id
    """,
)
def x_wav_resample(spark, sf_dir):
    """REAL audio downsampling end-to-end (r8, FIR anti-aliasing r9 —
    VERDICT r8 #6; operators/media.wav_downsample): decode the fixture
    PCM (mono 8 kHz, sample(j) = ((id·31+j·17)%65536)−32768), low-pass
    with the integer binomial FIR [1,4,6,4,1]/16 (edge-replicated,
    floor division via a +2^19 offset so numpy and SQL agree on
    negatives), keep every 4th frame, re-encode a complete 2 kHz WAV,
    then DECODE THE RESAMPLED FILE AGAIN (wav_pcm_stats) and emit its
    signal stats — the oracle recomputes every FILTERED amplitude at
    the j≡0 (mod 4) taps from pure id arithmetic.  The
    decode→filter→decimate→encode→decode chain agrees only if the
    re-encoded file is a genuine spec-valid WAV carrying exactly the
    filtered decimated frames."""
    from lwetl_spark.operators.media import (
        synth_pixel_media_demo,
        wav_downsample,
        wav_pcm_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    media = synth_pixel_media_demo(docs).filter(F.col("doc_id") % 2 == 1)
    rs = wav_downsample(media, factor=4).select(
        "doc_id", "sample_rate", F.col("resampled").alias("payload")
    )
    stats = wav_pcm_stats(rs.select("doc_id", "payload"))
    return rs.select("doc_id", "sample_rate").join(
        stats.hint("shuffle_hash"), "doc_id"
    ).select(
        "doc_id", "sample_rate", "n_samples", "peak", "sum_abs",
        F.col("n_samples").isNotNull().alias("roundtrip_ok"),
    )


@register(
    "x_mp3_meta",
    """
    WITH g AS (
        SELECT doc_id, doc_id % 3 AS si, 5 + doc_id % 20 AS nf,
               doc_id % 17 = 0 AS trunc, doc_id % 5 AS leg,
               CASE WHEN doc_id % 29 = 0 THEN 5 ELSE 0 END AS lie
        FROM documents
    ),
    v AS (
        SELECT doc_id, si, nf, trunc, leg, lie,
               CASE WHEN trunc THEN nf - 1 ELSE nf END AS wf,
               CASE si WHEN 0 THEN 44100 WHEN 1 THEN 48000
                       ELSE 32000 END AS sr
        FROM g
    ),
    fr AS (SELECT doc_id, leg, unnest(range(0, wf)) AS f FROM v),
    fb AS (
        SELECT doc_id,
               CASE WHEN leg = 2 THEN 1 + (doc_id + 3 * f) % 14
                    ELSE 1 + doc_id % 14 END AS bi
        FROM fr
    ),
    kb AS (
        SELECT doc_id,
               CAST(SUM(CASE bi
                   WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48
                   WHEN 4 THEN 56 WHEN 5 THEN 64 WHEN 6 THEN 80
                   WHEN 7 THEN 96 WHEN 8 THEN 112 WHEN 9 THEN 128
                   WHEN 10 THEN 160 WHEN 11 THEN 192 WHEN 12 THEN 224
                   WHEN 13 THEN 256 ELSE 320 END) AS BIGINT) AS brsum,
               COUNT(*) AS n
        FROM fb GROUP BY doc_id
    )
    SELECT v.doc_id,
           CAST(kb.brsum // kb.n AS BIGINT) AS bitrate_kbps,
           CAST(v.sr AS BIGINT) AS sample_rate,
           CAST(v.wf AS BIGINT) AS n_frames,
           CAST(1000 * 1152 * v.wf // v.sr AS BIGINT) AS duration_ms,
           v.doc_id % 2 = 0 AS has_id3,
           v.leg = 2 AS vbr,
           CAST(CASE WHEN v.leg IN (2, 4) THEN v.nf + v.lie
                     ELSE -1 END AS BIGINT) AS tag_frames,
           NOT v.trunc AS valid
    FROM v JOIN kb ON v.doc_id = kb.doc_id
    """,
)
def x_mp3_meta(spark, sf_dir):
    """MP3 frame census (r8; VBR r10 — operators/media.mp3_meta):
    skip the ID3v2 tag, walk MPEG-1 Layer III frames with each
    frame's OWN bitrate index (most real MP3s are VBR; a
    constant-length walk reads garbage), parse Xing / Info / VBRI
    first-frame tags, and census average bitrate / sample rate /
    frame count / exact integer duration.  Fixture legs by id%5:
    VBR+Xing (VBRI every id%10==7), CBR+'Info', plain CBR; every
    29th id's tag LIES by +5 frames — duration comes from the walk
    so the lie surfaces only as tag_frames ≠ n_frames; every 17th id
    truncates the last frame (census keeps the parsed frames,
    valid=false).  Every field value-checks against the generator
    arithmetic, including the per-frame 14-entry bitrate table
    average."""
    from lwetl_spark.operators.media import mp3_meta, synth_mp3_demo

    docs = _t(spark, sf_dir, "documents")
    out = mp3_meta(synth_mp3_demo(docs))
    return out.withColumn(
        "tag_frames",
        F.coalesce(F.col("tag_frames"), F.lit(-1)).cast("long"),
    )


@register(
    "x_tar_index",
    """
    WITH g AS (SELECT doc_id, 2 + doc_id % 3 AS ns FROM documents),
    clean AS (SELECT doc_id, ns FROM g WHERE doc_id % 19 <> 0),
    k AS (SELECT doc_id, unnest(range(0, ns)) AS k FROM clean),
    txt AS (
        SELECT doc_id, k, 30 + (doc_id + 13 * k) % 50 AS size FROM k
    ),
    txtb AS (SELECT doc_id, k, size, unnest(range(0, size)) AS j FROM txt),
    txtsum AS (
        SELECT doc_id, k, MAX(size) AS size,
               CAST(SUM((doc_id + 11 * k + 3 * j) % 256) AS BIGINT)
                   AS byte_sum
        FROM txtb GROUP BY doc_id, k
    ),
    rows_ AS (
        SELECT doc_id, CAST(2 * k AS BIGINT) AS member_idx,
               printf('%04d.txt', k) AS name, CAST(size AS BIGINT) AS size,
               CAST(1024 * 2 * k + 512 AS BIGINT) AS offset,
               byte_sum, TRUE AS valid
        FROM txtsum
        UNION ALL
        SELECT doc_id, CAST(2 * k + 1 AS BIGINT),
               printf('%04d.cls', k), CAST(1 AS BIGINT),
               CAST(1024 * (2 * k + 1) + 512 AS BIGINT),
               CAST((doc_id + k) % 10 + 48 AS BIGINT), TRUE
        FROM k
        UNION ALL
        SELECT doc_id, CAST(-1 AS BIGINT), 'none', CAST(-1 AS BIGINT),
               CAST(0 AS BIGINT), CAST(-1 AS BIGINT), FALSE
        FROM g WHERE doc_id % 19 = 0
    )
    SELECT * FROM rows_
    """,
)
def x_tar_index(spark, sf_dir):
    """ustar member index (r8; operators/media.tar_member_index) — the
    walk a WebDataset shard reader performs: 512-byte header scan with
    REAL checksum verification (the corrupt leg flips one name byte,
    and only the checksum can catch it — sizes still parse), octal
    size decode, exact content byte ranges proved by the content
    bytes' integer sum.  Fixture shards hold interleaved .txt/.cls
    sample pairs (every member < 512 B, so offsets are the closed-form
    1024·m + 512 the oracle recomputes); Python's own tarfile reads
    the generated archives (independent pytest).  NULL-sentinel parity
    rule on the corrupt rows."""
    from lwetl_spark.operators.media import synth_tar_demo, tar_member_index

    docs = _t(spark, sf_dir, "documents")
    idx = tar_member_index(synth_tar_demo(docs))
    return idx.select(
        "doc_id", "member_idx",
        F.coalesce("name", F.lit("none")).alias("name"),
        F.coalesce("size", F.lit(-1)).cast("long").alias("size"),
        F.col("offset").cast("long"),
        F.coalesce("byte_sum", F.lit(-1)).cast("long").alias("byte_sum"),
        "valid",
    )


@register(
    "x_webdataset",
    """
    WITH g AS (SELECT doc_id, 2 + doc_id % 3 AS ns FROM documents
               WHERE doc_id % 19 <> 0),
    k AS (SELECT doc_id, unnest(range(0, ns)) AS k FROM g)
    SELECT doc_id, printf('%04d', k) AS stem,
           CAST(2 AS BIGINT) AS n_fields, 'cls,txt' AS exts,
           CAST(31 + (doc_id + 13 * k) % 50 AS BIGINT) AS total_bytes
    FROM k
    """,
)
def x_webdataset(spark, sf_dir):
    """WebDataset sample grouping (r8; operators/media.
    webdataset_samples): tar members named '{stem}.{ext}' group into
    the SAMPLES a multimodal trainer consumes — each fixture sample is
    a .txt/.cls pair, so every stem must report exactly 2 fields with
    sorted extensions 'cls,txt' and total_bytes = txt size + 1.
    Corrupt shards (checksum-failed) contribute no samples.  Pure
    DataFrame composition over the member index; metadata-only
    exchange."""
    from lwetl_spark.operators.media import (
        synth_tar_demo,
        tar_member_index,
        webdataset_samples,
    )

    docs = _t(spark, sf_dir, "documents")
    out = webdataset_samples(tar_member_index(synth_tar_demo(docs)))
    return out.select(
        "doc_id", "stem", F.col("n_fields").cast("long"),
        F.concat_ws(",", "exts").alias("exts"),
        F.col("total_bytes").cast("long"),
    )


@register(
    "x_webdataset_campaign",
    """
    WITH g AS (
        SELECT doc_id AS i, 2 + doc_id % 3 AS ns FROM documents
        WHERE doc_id % 5 = 2 AND doc_id % 19 <> 0
    ),
    s AS (SELECT i, unnest(range(0, ns)) AS k FROM g),
    elig AS (
        SELECT i, k, (i + 7 * k) % 50 AS v FROM s WHERE (i + k) % 8 >= 2
    )
    SELECT CAST(COUNT(DISTINCT v) AS BIGINT) AS n_admitted,
           TRUE AS index_matches_fresh,
           TRUE AS no_readmission
    FROM elig
    """,
)
def x_webdataset_campaign(spark, sf_dir):
    """WebDataset → campaign composition (r9, VERDICT r8 #4 — the
    multimodal ingest loop closed end-to-end): walk tar shards
    (checksum-verified; corrupt shards contribute nothing), extract
    member payloads (media.tar_member_payloads), gate the image leg
    through `media_meta` (valid PNG AND width ≥ 6 — the min-resolution
    admission rule), feed the surviving samples' captions into
    `ingest_increment` (manifest diff + content dedup + index
    maintenance), and verify THREE contracts the oracle recomputes
    from pure id arithmetic: (a) n_admitted = the distinct caption
    count among gate-passing samples of non-corrupt shards (captions
    collide across shards by construction — content dedup must fire);
    (b) probing the campaign-maintained index equals a fresh
    `build_text_index` over the admitted samples; (c) re-ingesting the
    SAME shard content admits nothing (the manifest diff sees no
    new/changed digests)."""
    import os as _os
    import shutil as _shutil

    from lwetl_spark.operators.incremental import ingest_increment
    from lwetl_spark.operators.media import (
        media_meta,
        synth_wds_shards,
        tar_member_payloads,
    )
    from lwetl_spark.operators.retrieval import (
        build_text_index,
        query_text_index,
    )

    docs = _t(spark, sf_dir, "documents")
    shards = synth_wds_shards(docs.filter(F.col("doc_id") % 5 == 2))
    # one shard walk feeds both legs
    members = tar_member_payloads(shards).localCheckpoint(eager=True)
    parts = members.select(
        (
            F.col("doc_id") * 16
            + F.regexp_extract("name", r"^(\d+)\.", 1).cast("long")
        ).alias("sample_id"),
        F.regexp_extract("name", r"\.([^.]+)$", 1).alias("ext"),
        "payload",
    )
    gate = (
        media_meta(
            parts.filter(F.col("ext") == "png")
            .select(F.col("sample_id").alias("doc_id"), "payload")
        )
        .filter(F.col("valid") & (F.col("width") >= 6))
        .select(F.col("doc_id").alias("sample_id"))
    )
    samples = (
        parts.filter(F.col("ext") == "txt")
        .select(
            F.col("sample_id").alias("doc_id"),
            F.decode("payload", "UTF-8").alias("text"),
        )
        .join(gate.withColumnRenamed("sample_id", "doc_id"),
              "doc_id", "left_semi")
        .localCheckpoint(eager=True)
    )
    work = _tmpdir("wdscamp")
    man, state, idx = (
        _os.path.join(work, p) for p in ("manifest", "state", "index")
    )
    r1 = ingest_increment(spark, samples, man, state, idx)
    # fresh rebuild over exactly the admitted samples
    admitted = spark.read.parquet(state).select("doc_id")
    fresh_path = _os.path.join(work, "fresh")
    build_text_index(
        samples.join(admitted, "doc_id", "left_semi"), fresh_path
    )
    probes = spark.createDataFrame(
        [(1, "topic"), (2, "7"), (3, "13"), (4, "shard")],
        "query_id int, term string",
    )
    cols = ["query_id", "doc_id", "score_ppm", "n_terms", "rnk"]
    a = query_text_index(spark, idx, probes, k=10).groupBy(*cols).agg(
        F.count("*").alias("_ca")
    )
    b = query_text_index(spark, fresh_path, probes, k=10).groupBy(
        *cols
    ).agg(F.count("*").alias("_cb"))
    mismatches = (
        a.join(b, cols, "full_outer")
        .filter("_ca IS NULL OR _cb IS NULL OR _ca <> _cb")
        .count()
    )
    # re-shard the same content: the manifest diff must admit nothing
    r2 = ingest_increment(spark, samples, man, state, idx)
    _shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [(
            int(r1["n_admitted"]),
            mismatches == 0,
            int(r2["n_admitted"]) == 0,
        )],
        "n_admitted long, index_matches_fresh boolean,"
        " no_readmission boolean",
    )


@register(
    "x_media_curate",
    """
    WITH meta AS (
        SELECT doc_id,
               CASE doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                               WHEN 2 THEN 'wav' WHEN 3 THEN 'mp4'
                               ELSE 'unknown' END AS fmt,
               -- jpeg dims are EXIF-NORMALIZED (r8): orientation
               -- 1+id%8 >= 5 transposes the stored raster
               CASE doc_id % 5 WHEN 0 THEN 1 + doc_id % 64
                               WHEN 1 THEN CASE WHEN 1 + doc_id % 8 >= 5
                                                THEN 16 + doc_id % 16
                                                ELSE 16 + doc_id % 32 END
                               WHEN 3 THEN 160 + 16 * (doc_id % 28) END AS w,
               CASE doc_id % 5 WHEN 0 THEN 1 + doc_id % 32
                               WHEN 1 THEN CASE WHEN 1 + doc_id % 8 >= 5
                                                THEN 16 + doc_id % 32
                                                ELSE 16 + doc_id % 16 END
                               WHEN 3 THEN 90 + 9 * (doc_id % 20) END AS h,
               CASE WHEN doc_id % 5 = 3
                    THEN 500 + doc_id % 4000 END AS dur_ms,
               doc_id % 5 <> 4 AS valid
        FROM documents
    ),
    kept AS (
        SELECT fmt,
               CASE WHEN w >= h THEN 'landscape' ELSE 'portrait' END AS orient,
               w * h AS px
        FROM meta
        WHERE valid AND (
            (fmt IN ('png', 'jpeg') AND w >= 4 AND h >= 4)
            OR (fmt = 'mp4' AND w >= 4 AND h >= 4 AND dur_ms >= 1000)
        )
    )
    SELECT fmt, orient, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(px) AS BIGINT) AS sum_px,
           CAST(MIN(px) AS BIGINT) AS min_px,
           CAST(MAX(px) AS BIGINT) AS max_px
    FROM kept GROUP BY 1, 2
    """,
)
def x_media_curate(spark, sf_dir):
    """Composed media-curation gate — the image-side analog of the text
    curate chain: synthesize real containers, parse them
    (operators/media.media_meta), normalize JPEG geometry through the
    EXIF orientation tag (r8 — rotated shots census correctly), DROP
    corrupt + tiny payloads (the min-resolution rule every vision-data
    pipeline applies) and, for video, sub-second clips (the
    min-duration rule — r8: the gate ROUTES VIDEO, parsing the MP4 box
    tree for dims + duration), and census the survivors by (format,
    orientation) with exact pixel-count stats.  All decisions run on PARSED BYTES; the oracle
    recomputes them from the generator arithmetic — the two agree only
    if every stage (generation, parsing, filtering, bucketing) is
    byte-faithful."""
    from lwetl_spark.operators.media import (
        exif_meta,
        media_meta,
        synth_media_demo,
    )

    docs = _t(spark, sf_dir, "documents")
    media = synth_media_demo(docs).localCheckpoint(eager=True)
    meta = media_meta(media)
    # r8 (VERDICT r7 #5): real crawls rotate via EXIF tag 274, so the
    # image gate must use the orientation-NORMALIZED geometry — stored
    # dims alone mislabel every rotated portrait shot.  The EXIF walk
    # runs on the same payloads; non-JPEGs keep their container dims.
    exif = exif_meta(media).select(
        "doc_id",
        F.col("norm_width").alias("_nw"),
        F.col("norm_height").alias("_nh"),
        F.col("valid").alias("_exif_ok"),
    )
    normed = meta.join(exif.hint("shuffle_hash"), "doc_id").select(
        "fmt", "valid", "duration_ms",
        F.when((F.col("fmt") == "jpeg") & F.col("_exif_ok"), F.col("_nw"))
        .otherwise(F.col("width")).alias("width"),
        F.when((F.col("fmt") == "jpeg") & F.col("_exif_ok"), F.col("_nh"))
        .otherwise(F.col("height")).alias("height"),
    )
    kept = normed.filter(
        F.col("valid")
        & (F.col("width") >= 4)
        & (F.col("height") >= 4)
        & (
            F.col("fmt").isin("png", "jpeg")
            | ((F.col("fmt") == "mp4") & (F.col("duration_ms") >= 1000))
        )
    ).select(
        "fmt",
        F.when(F.col("width") >= F.col("height"), "landscape")
        .otherwise("portrait")
        .alias("orient"),
        (F.col("width") * F.col("height")).alias("px"),
    )
    return kept.groupBy("fmt", "orient").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("px").cast("long").alias("sum_px"),
        F.min("px").cast("long").alias("min_px"),
        F.max("px").cast("long").alias("max_px"),
    )


@register(
    "x_hybrid_filtered",
    r"""
    WITH tok AS (
        SELECT doc_id, unnest(list_filter(
            string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS tok
        FROM documents
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
    st AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(1000 * SUM(dl) // COUNT(*) AS BIGINT) AS adl_m
        FROM dl
    ),
    tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY 1, 2),
    q AS (SELECT * FROM (VALUES (9000001, 'scan'), (9000001, 'table'),
                                (9000002, 'merge'), (9000002, 'sort'),
                                (9000002, 'window'),
                                (9000003, 'hash'), (9000003, 'part'))
          t(query_id, term)),
    dfq AS (
        SELECT tf.tok, CAST(COUNT(*) AS BIGINT) AS df
        FROM tf JOIN (SELECT DISTINCT term FROM q) qt ON tf.tok = qt.term
        GROUP BY 1
    ),
    sc AS (
        SELECT CAST(q.query_id AS BIGINT) AS query_id, tf.doc_id,
               CAST((1000000 * 22 * tf.tf * st.adl_m
                     // (10 * tf.tf * st.adl_m + 3 * st.adl_m + 9000 * dl.dl))
                    * (1000 * (2 * st.n - 2 * dfq.df + 1) // (2 * dfq.df + 1))
                    // 1000 AS BIGINT) AS term_score
        FROM q JOIN tf ON q.term = tf.tok AND tf.doc_id % 3 <> 0
        JOIN dfq ON tf.tok = dfq.tok
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN st
    ),
    s AS (
        SELECT query_id, doc_id, CAST(SUM(term_score) AS BIGINT) AS score_ppm
        FROM sc GROUP BY 1, 2
    ),
    lexr AS (
        SELECT query_id, doc_id, rnk FROM (
            SELECT query_id, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY score_ppm DESC, doc_id) AS rnk
            FROM s
        ) WHERE rnk <= 10
    ),
    e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    nv AS (
        SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
        FROM e
    ),
    qv AS (
        SELECT 9000000 + vec_id AS query_id, v, nrm FROM nv
        WHERE vec_id IN (1, 2, 3)
    ),
    dn AS (
        SELECT qv.query_id, nv.vec_id AS doc_id,
               ROUND(list_sum(list_transform(range(1, 65),
                                             i -> qv.v[i] * nv.v[i]))
                     / (qv.nrm * nv.nrm), 6) AS cos
        FROM qv, nv
        WHERE qv.nrm > 0 AND nv.nrm > 0
          AND qv.query_id <> nv.vec_id AND nv.vec_id % 3 <> 0
    ),
    denser AS (
        SELECT query_id, doc_id, rnk FROM (
            SELECT query_id, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, doc_id) AS rnk
            FROM dn
        ) WHERE rnk <= 10
    ),
    u AS (SELECT * FROM lexr UNION ALL SELECT * FROM denser),
    fused AS (
        SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS n_lists,
               CAST(SUM(1000000 // (60 + rnk)) AS BIGINT) AS rrf_ppm
        FROM u GROUP BY 1, 2
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, n_lists, rrf_ppm,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY rrf_ppm DESC, doc_id) AS rnk
        FROM fused
    ) WHERE rnk <= 10
    """,
)
def x_hybrid_filtered(spark, sf_dir):
    """Metadata-FILTERED hybrid retrieval (r9, VERDICT r8 #3 — the
    composed form of x_ann_filtered): `hybrid_topk(filter_ids=...)`
    pushes the allowed-id set into BOTH legs before their top-k
    windows (BM25 postings semi-join; IVF cell-member semi-join), so
    the fused top-k is the true top-k of the FILTERED corpus.  The
    filter keeps ids with id % 3 != 0; IDF/length norms stay
    corpus-level (Lucene filtered-search semantics), which is exactly
    what the oracle recomputes — restricting only the candidate rows
    of each leg while df/dl/stats read the full corpus.  nprobe =
    num_centroids makes the dense leg exact, so every
    (query, doc, n_lists, rrf_ppm, rnk) row is value-checked."""
    import shutil as _shutil

    from lwetl_spark.operators.retrieval import build_text_index, hybrid_topk
    from lwetl_spark.operators.similarity import build_ivf_index

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    emb = _t(spark, sf_dir, "embeddings")
    work = _tmpdir("hybridflt")
    tpath = os.path.join(work, "text")
    vpath = os.path.join(work, "vec")
    build_text_index(docs, tpath)
    build_ivf_index(emb, vpath, num_centroids=16)

    term_queries = spark.createDataFrame(
        [(9000001, "scan"), (9000001, "table"),
         (9000002, "merge"), (9000002, "sort"), (9000002, "window"),
         (9000003, "hash"), (9000003, "part")],
        "query_id long, term string",
    )
    vec_queries = emb.filter(F.col("vec_id").isin(1, 2, 3)).select(
        (F.col("vec_id") + 9_000_000).alias("query_id"), "embedding"
    )
    allowed = (
        docs.select(F.col("doc_id").alias("id"))
        .unionByName(emb.select(F.col("vec_id").alias("id")))
        .filter(F.col("id") % 3 != 0)
        .distinct()
    )
    out = hybrid_topk(
        spark, tpath, vpath, term_queries, vec_queries,
        k=10, nprobe=16, filter_ids=allowed,
    ).localCheckpoint(eager=True)
    _shutil.rmtree(work, ignore_errors=True)
    return out


@register(
    "x_hybrid_search",
    r"""
    WITH tok AS (
        SELECT doc_id, unnest(list_filter(
            string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS tok
        FROM documents
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
    st AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(1000 * SUM(dl) // COUNT(*) AS BIGINT) AS adl_m
        FROM dl
    ),
    tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY 1, 2),
    q AS (SELECT * FROM (VALUES (9000001, 'scan'), (9000001, 'table'),
                                (9000002, 'merge'), (9000002, 'sort'),
                                (9000002, 'window'),
                                (9000003, 'hash'), (9000003, 'part'))
          t(query_id, term)),
    dfq AS (
        SELECT tf.tok, CAST(COUNT(*) AS BIGINT) AS df
        FROM tf JOIN (SELECT DISTINCT term FROM q) qt ON tf.tok = qt.term
        GROUP BY 1
    ),
    sc AS (
        SELECT CAST(q.query_id AS BIGINT) AS query_id, tf.doc_id,
               CAST((1000000 * 22 * tf.tf * st.adl_m
                     // (10 * tf.tf * st.adl_m + 3 * st.adl_m + 9000 * dl.dl))
                    * (1000 * (2 * st.n - 2 * dfq.df + 1) // (2 * dfq.df + 1))
                    // 1000 AS BIGINT) AS term_score
        FROM q JOIN tf ON q.term = tf.tok
        JOIN dfq ON tf.tok = dfq.tok
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN st
    ),
    s AS (
        SELECT query_id, doc_id, CAST(SUM(term_score) AS BIGINT) AS score_ppm
        FROM sc GROUP BY 1, 2
    ),
    lexr AS (
        SELECT query_id, doc_id, rnk FROM (
            SELECT query_id, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY score_ppm DESC, doc_id) AS rnk
            FROM s
        ) WHERE rnk <= 10
    ),
    e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    nv AS (
        SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
        FROM e
    ),
    qv AS (
        SELECT 9000000 + vec_id AS query_id, v, nrm FROM nv
        WHERE vec_id IN (1, 2, 3)
    ),
    dn AS (
        SELECT qv.query_id, nv.vec_id AS doc_id,
               ROUND(list_sum(list_transform(range(1, 65),
                                             i -> qv.v[i] * nv.v[i]))
                     / (qv.nrm * nv.nrm), 6) AS cos
        FROM qv, nv
        WHERE qv.nrm > 0 AND nv.nrm > 0
          AND qv.query_id <> nv.vec_id
    ),
    denser AS (
        SELECT query_id, doc_id, rnk FROM (
            SELECT query_id, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, doc_id) AS rnk
            FROM dn
        ) WHERE rnk <= 10
    ),
    u AS (SELECT * FROM lexr UNION ALL SELECT * FROM denser),
    fused AS (
        SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS n_lists,
               CAST(SUM(1000000 // (60 + rnk)) AS BIGINT) AS rrf_ppm
        FROM u GROUP BY 1, 2
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, n_lists, rrf_ppm,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY rrf_ppm DESC, doc_id) AS rnk
        FROM fused
    ) WHERE rnk <= 10
    """,
)
def x_hybrid_search(spark, sf_dir):
    """Hybrid retrieval over PERSISTED indexes as one operator
    (operators/retrieval.hybrid_topk): BM25 probe of the on-disk text
    index + vector probe of the on-disk IVF index (family
    auto-detected), RRF-fused.  The IVF leg probes EVERY cell
    (nprobe = num_centroids), making the dense ranking exact cosine —
    so the WHOLE fused output is value-checkable: the oracle rebuilds
    the integer-rational BM25 leg, the cosine leg, and the RRF combine
    in SQL and every (query, doc, n_lists, rrf_ppm, rnk) row must
    match bit-for-bit.  Query ids live at 9000001+ — disjoint from the
    corpus id space, the hybrid_topk contract (ANN probes drop
    id == neighbor_id)."""
    import shutil as _shutil

    from lwetl_spark.operators.retrieval import hybrid_topk
    from lwetl_spark.operators.retrieval import build_text_index
    from lwetl_spark.operators.similarity import build_ivf_index

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    emb = _t(spark, sf_dir, "embeddings")
    work = _tmpdir("hybrid")
    tpath = os.path.join(work, "text")
    vpath = os.path.join(work, "vec")
    build_text_index(docs, tpath)
    build_ivf_index(emb, vpath, num_centroids=16)

    term_queries = spark.createDataFrame(
        [(9000001, "scan"), (9000001, "table"),
         (9000002, "merge"), (9000002, "sort"), (9000002, "window"),
         (9000003, "hash"), (9000003, "part")],
        "query_id long, term string",
    )
    vec_queries = emb.filter(F.col("vec_id").isin(1, 2, 3)).select(
        (F.col("vec_id") + 9_000_000).alias("query_id"), "embedding"
    )
    out = hybrid_topk(
        spark, tpath, vpath, term_queries, vec_queries,
        k=10, nprobe=16,  # every cell probed -> exact dense leg
    ).localCheckpoint(eager=True)
    _shutil.rmtree(work, ignore_errors=True)
    return out


@register(
    "x_phrase_snippets",
    r"""
    WITH toks AS (
        SELECT doc_id, list_filter(
            string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS t
        FROM documents
    ),
    tok AS (
        SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos
        FROM toks
    ),
    ph(query_id, p1, p2) AS (VALUES (1, 'table', 'hash'), (2, 'big', 'big')),
    m AS (
        SELECT ph.query_id, a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
               CAST(MIN(a.pos) - 1 AS BIGINT) AS first_pos
        FROM ph
        JOIN tok a ON a.tok = ph.p1
        JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
                  AND b.tok = ph.p2
        GROUP BY 1, 2
    ),
    r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY n_matches DESC, doc_id) AS rnk
        FROM m
    ),
    top AS (SELECT * FROM r WHERE rnk <= 10)
    SELECT CAST(t.query_id AS BIGINT) AS query_id, t.doc_id, t.n_matches,
           CAST(t.rnk AS BIGINT) AS rnk, t.first_pos,
           array_to_string(list_slice(k.t,
               CAST(GREATEST(t.first_pos - 2, 0) + 1 AS INT),
               CAST(t.first_pos + 4 AS INT)), ' ') AS snippet
    FROM top t JOIN toks k USING (doc_id)
    """,
)
def x_phrase_snippets(spark, sf_dir):
    """Snippet extraction over phrase hits (operators/retrieval.
    phrase_snippets): the ±2-token context window around each top-10
    hit's first match, sliced JVM-side from the tokenized text after
    ONE id-keyed join with the hit set broadcast (the corpus never
    shuffles for a snippet pass).  FULL value oracle: DuckDB recomputes
    first positions with adjacency joins and the snippets with
    list_slice — every (query, doc, n_matches, rnk, first_pos,
    snippet) row must match character-for-character."""
    import shutil as _shutil

    from lwetl_spark.operators.retrieval import (
        build_text_index,
        phrase_snippets,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    phrases = spark.createDataFrame(
        [(1, "table hash"), (2, "big big")], "query_id long, phrase string"
    )
    work = _tmpdir("snip")
    path = os.path.join(work, "index")
    build_text_index(docs, path, positions=True)
    out = phrase_snippets(
        spark, path, docs, phrases, radius=2, k=10
    ).localCheckpoint(eager=True)
    _shutil.rmtree(work, ignore_errors=True)
    return out


@register(
    "x_proximity_search",
    r"""
    WITH toks AS (
        SELECT doc_id, list_filter(
            string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS t
        FROM documents
    ),
    tok AS (
        SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos
        FROM toks
    ),
    m1 AS (  -- q1: hash NEAR table, window 8
        SELECT 1 AS query_id, a.doc_id,
               CAST(MIN(GREATEST(a.pos, b.pos) - LEAST(a.pos, b.pos) + 1)
                    AS BIGINT) AS min_span
        FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.tok = 'table'
        WHERE a.tok = 'hash'
        GROUP BY 2 HAVING min_span <= 8
    ),
    m2 AS (  -- q2: merge NEAR sort NEAR window, window 12
        SELECT 2 AS query_id, a.doc_id,
               CAST(MIN(GREATEST(a.pos, b.pos, c.pos)
                        - LEAST(a.pos, b.pos, c.pos) + 1) AS BIGINT)
                   AS min_span
        FROM tok a
        JOIN tok b ON b.doc_id = a.doc_id AND b.tok = 'sort'
        JOIN tok c ON c.doc_id = a.doc_id AND c.tok = 'window'
        WHERE a.tok = 'merge'
        GROUP BY 2 HAVING min_span <= 12
    ),
    m3 AS (  -- q3: 'scan scan' collapses to the single term 'scan'
        SELECT 3 AS query_id, doc_id, CAST(1 AS BIGINT) AS min_span
        FROM tok WHERE tok = 'scan' GROUP BY 2
    ),
    m AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2
          UNION ALL SELECT * FROM m3),
    r AS (
        SELECT query_id, doc_id, min_span,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY min_span, doc_id
               ) AS rnk
        FROM m
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, min_span,
           CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 10
    """,
)
def x_proximity_search(spark, sf_dir):
    """Proximity (NEAR) search over the positional index
    (operators/retrieval.proximity_topk): top-10 docs per query by the
    MINIMAL token span containing all query terms (k-pointer sweep per
    candidate — O(Σ positions), not the O(Π tf) cross product), span ≤
    window.  Query 3 carries a duplicated term ('scan scan') pinning
    the set-semantics collapse.  FULL value oracle: DuckDB recomputes
    every min_span with position joins — (query, doc, min_span, rnk)
    must match bit-for-bit."""
    import shutil as _shutil

    from lwetl_spark.operators.retrieval import (
        build_text_index,
        proximity_topk,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    queries = spark.createDataFrame(
        [(1, "hash table"), (2, "merge sort window"), (3, "scan scan")],
        "query_id long, terms string",
    )
    work = _tmpdir("prox")
    path = os.path.join(work, "index")
    build_text_index(docs, path, positions=True)
    # q2 runs at window=12: split the probe so each query gets its
    # window (two bucket-pruned probes over the same index)
    out = proximity_topk(
        spark, path, queries.filter(F.col("query_id") != 2), window=8, k=10
    ).unionByName(
        proximity_topk(
            spark, path, queries.filter(F.col("query_id") == 2),
            window=12, k=10,
        )
    ).localCheckpoint(eager=True)
    _shutil.rmtree(work, ignore_errors=True)
    return out


@register(
    "x_hll_sketch_store",
    """
    WITH s AS (
        SELECT source, CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_src
        FROM documents GROUP BY source
    ),
    g AS (SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_global
          FROM documents)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
           CAST(SUM(exact_src) AS BIGINT) AS sum_per_source,
           MAX(exact_global) AS exact_global,
           TRUE AS union_within_5pct,
           TRUE AS all_sources_within_5pct
    FROM s CROSS JOIN g
    """,
)
def x_hll_sketch_store(spark, sf_dir):
    """Persisted mergeable-sketch store — the warehouse pattern behind
    incremental distinct counts at 100 TB: per-source Datasketches HLL
    sketches (one binary blob per source) are WRITTEN to parquet, read
    back, and union-merged into a global estimate WITHOUT rescanning the
    corpus.  New partitions only sketch their own rows; history is a
    sketch-merge, never a re-count — the property a5's in-plan HLL++
    cannot give (its sketch dies with the query).

    Driver contract (the a5 accuracy-band pattern: estimates are
    engine-specific, bands are checkable): exact per-source and global
    distinct counts pinned by the oracle, plus booleans asserting every
    persisted-sketch estimate and the merged-union estimate land within
    ±5% of exact.  lgConfigK=14 (~0.8% rse) leaves wide margin."""
    d = _t(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.hll_sketch_agg("text", 14).alias("sketch"),
        F.count_distinct("text").alias("exact_src"),
    )
    path = os.path.join(_tmpdir("hllstore"), "sketches")
    per_src.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    per_ok = back.select(
        F.count("*").alias("n_sources"),
        F.sum("exact_src").alias("sum_per_source"),
        F.min(
            F.abs(F.hll_sketch_estimate("sketch") - F.col("exact_src"))
            <= 0.05 * F.col("exact_src")
        ).alias("all_sources_within_5pct"),
    )
    merged = back.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("_est")
    )
    exact_g = d.agg(F.count_distinct("text").alias("exact_global"))
    return (
        per_ok.crossJoin(merged)
        .crossJoin(exact_g)
        .select(
            F.col("n_sources").cast("long"),
            F.col("sum_per_source").cast("long"),
            F.col("exact_global").cast("long"),
            (
                F.abs(F.col("_est") - F.col("exact_global"))
                <= 0.05 * F.col("exact_global")
            ).alias("union_within_5pct"),
            "all_sources_within_5pct",
        )
    )


@register(
    "x_charset_sniff",
    """
    SELECT doc_id,
           CASE doc_id % 5
                WHEN 0 THEN 'utf-8' WHEN 1 THEN 'cp1252'
                WHEN 2 THEN 'gbk' WHEN 3 THEN 'utf-8'
                ELSE 'latin-1' END AS charset,
           printf('t%d ', doc_id % 9) ||
           CASE doc_id % 5
                WHEN 0 THEN printf('café %d naïve', doc_id % 100)
                WHEN 1 THEN printf('€ price %d ÿes', doc_id % 100)
                WHEN 2 THEN printf('数据 %d 页', doc_id % 100)
                WHEN 3 THEN printf('omega Ω %d', doc_id % 100)
                ELSE printf('café %d', doc_id % 100) END AS text
    FROM documents
    """,
)
def x_charset_sniff(spark, sf_dir):
    """Charset-sniffing HTML decode (r11, VERDICT r10 task 3;
    operators/media.sniff_decode_html + functions/text.html_text):
    real crawls are full of windows-1252/gbk/latin-1 pages a hard
    UTF-8 decode mojibakes.  Resolution order value-checked leg by
    leg — BOM strip, <meta charset>, the legacy http-equiv form,
    strict-UTF-8 probe on undeclared pages, latin-1 last resort —
    with every extracted text char-exact against the oracle's
    unicode literals (a reader that ignores the declaration, decodes
    before stripping the BOM, or falls back differently
    hash-mismatches).  The same sniffer fronts the x_warc_ingest and
    x_imgtext_pairs crawl loops."""
    from lwetl_spark.functions.text import html_text
    from lwetl_spark.operators.media import (
        sniff_decode_html,
        synth_charset_demo,
    )

    docs = _t(spark, sf_dir, "documents")
    out = sniff_decode_html(synth_charset_demo(docs))
    return out.select(
        "doc_id", "charset", html_text(F.col("html")).alias("text"))


@register(
    "x_dhash_neardup_r6",
    """
    WITH g AS (
        SELECT doc_id, doc_id % 10 AS k, (doc_id % 80) // 10 AS t
        FROM documents WHERE doc_id % 5 = 0
    ),
    pos AS (SELECT doc_id, k, t, unnest(range(0, 64)) AS idx FROM g),
    fj AS (SELECT doc_id, k, t, idx, unnest(range(0, 7)) AS j
           FROM pos),
    nfc AS (
        SELECT doc_id, idx,
               SUM(CASE WHEN j < t AND (7 * k + 13 * t + 17 * j) % 64
                             = idx THEN 1 ELSE 0 END) AS nf
        FROM fj GROUP BY doc_id, idx
    ),
    bits AS (
        SELECT p.doc_id, p.idx,
               (CASE WHEN ((11 * p.k + 3 * (p.idx // 8)
                            + 5 * (p.idx % 8)) % 7) < 3
                     THEN 1 ELSE 0 END + n.nf) % 2 AS bit
        FROM pos p JOIN nfc n
          ON p.doc_id = n.doc_id AND p.idx = n.idx
    ),
    hl AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN idx >= 32 AND bit = 1
                             THEN 1::BIGINT << (idx - 32)
                             ELSE 0 END) AS BIGINT) AS hi,
               CAST(SUM(CASE WHEN idx < 32 AND bit = 1
                             THEN 1::BIGINT << idx
                             ELSE 0 END) AS BIGINT) AS lo
        FROM bits GROUP BY doc_id
    )
    SELECT a.doc_id AS id_l, b.doc_id AS id_r,
           CAST(bit_count(xor(a.hi, b.hi))
                + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
    FROM hl a JOIN hl b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.hi, b.hi))
          + bit_count(xor(a.lo, b.lo)) <= 6
    """,
)
def x_dhash_neardup_r6(spark, sf_dir):
    """Wide-radius perceptual near-dup pairs (r11, VERDICT r10 task
    6; operators/media.dhash_near_dup n_bands=8): aggressive
    re-encodes (resize + re-JPEG) commonly land at hamming 4-8,
    past the 4-band guarantee — 8-band LSH (8-bit bands) makes
    recall EXACT to radius 7 by the same pigeonhole, checked here at
    radius 6 against the oracle's brute-force all-pairs hamming
    filter.  The fixture widens the variant ladder to t ≤ 7 flipped
    bits, so pair distances populate 1-6 AND overshoot the radius —
    a banding bug in either direction changes the pair set.  Still
    no broadcast and no all-pairs stage: candidates come only from
    the (band, value) equi-join, shuffle_hash-hinted both ways."""
    from lwetl_spark.operators.media import (
        dhash_near_dup,
        image_dhash,
        synth_dhash_neardup_demo,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    hashes = image_dhash(
        synth_dhash_neardup_demo(docs, t_mod=80)).filter("ok")
    return dhash_near_dup(hashes.select("doc_id", "dhash"),
                          max_hamming=6, n_bands=8)


@register(
    "x_aac_meta",
    """
    WITH g AS (
        SELECT doc_id,
               doc_id % 3 AS profile,
               doc_id % 13 AS sr_idx,
               1 + doc_id % 3 AS ch,
               5 + doc_id % 40 AS nf,
               doc_id % 4 = 0 AS crc,
               doc_id % 5 = 3 AS mpeg2,
               doc_id % 23 = 0 AS trunc,
               doc_id % 31 = 0 AS nonaac
        FROM documents
    ),
    r AS (
        SELECT *,
               CASE sr_idx WHEN 0 THEN 96000 WHEN 1 THEN 88200
                    WHEN 2 THEN 64000 WHEN 3 THEN 48000
                    WHEN 4 THEN 44100 WHEN 5 THEN 32000
                    WHEN 6 THEN 24000 WHEN 7 THEN 22050
                    WHEN 8 THEN 16000 WHEN 9 THEN 12000
                    WHEN 10 THEN 11025 WHEN 11 THEN 8000
                    ELSE 7350 END AS sr,
               nf - CASE WHEN trunc THEN 1 ELSE 0 END AS n_seen
        FROM g
    )
    SELECT doc_id,
           CAST(CASE WHEN nonaac THEN -1 ELSE profile END AS BIGINT)
               AS profile,
           CAST(CASE WHEN nonaac THEN -1 ELSE sr END AS BIGINT)
               AS sample_rate,
           CAST(CASE WHEN nonaac THEN -1 ELSE ch END AS BIGINT)
               AS channels,
           CAST(CASE WHEN nonaac THEN -1 ELSE n_seen END AS BIGINT)
               AS n_frames,
           CAST(CASE WHEN nonaac THEN -1
                ELSE 1000 * 1024 * n_seen // sr END AS BIGINT)
               AS duration_ms,
           NOT nonaac AND crc AS crc,
           NOT nonaac AND mpeg2 AS mpeg2,
           NOT (nonaac OR trunc) AS valid
    FROM r
    """,
)
def x_aac_meta(spark, sf_dir):
    """Raw-AAC (ADTS) frame-header census (r11, VERDICT r10 task 7;
    operators/media.aac_meta): the last common crawl-audio shape —
    syncword/layer check, profile + ISO sampling-frequency table +
    channel config, the 13-bit frame-length walk (header included,
    CRC legs two bytes longer), exact integer duration from the
    1024-samples-per-frame model.  All thirteen ISO rates, both CRC
    framings, MPEG-2/4 id bits; every 23rd id truncates the last
    frame (partial census, valid=false), every 31st is not ADTS
    (NULL sentinels).  All fields recompute from id arithmetic."""
    from lwetl_spark.operators.media import aac_meta, synth_aac_demo

    docs = _t(spark, sf_dir, "documents")
    out = aac_meta(synth_aac_demo(docs))
    return out.select(
        "doc_id",
        *[F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)
          for c in ("profile", "sample_rate", "channels", "n_frames",
                    "duration_ms")],
        F.coalesce(F.col("crc"), F.lit(False)).alias("crc"),
        F.coalesce(F.col("mpeg2"), F.lit(False)).alias("mpeg2"),
        "valid",
    )


@register(
    "x_http_parts",
    """
    SELECT doc_id,
           CAST(doc_id % 7 AS BIGINT) AS rec_idx,
           CAST(CASE doc_id % 4 WHEN 0 THEN 200 WHEN 1 THEN 404
                WHEN 2 THEN 200 ELSE -1 END AS BIGINT) AS status,
           CASE doc_id % 4
                WHEN 0 THEN 'text/html; charset=windows-1252'
                WHEN 1 THEN 'text/plain'
                WHEN 2 THEN 'text/html; charset=gbk'
                ELSE 'none' END AS content_type,
           CASE doc_id % 4 WHEN 0 THEN 'cp1252' WHEN 2 THEN 'gbk'
                ELSE 'utf-8' END AS charset,
           CASE doc_id % 8 WHEN 4 THEN 'chunked' WHEN 5 THEN 'br'
                WHEN 6 THEN 'gzip' ELSE 'identity' END AS encoding,
           TRUE AS body_ok,
           CASE doc_id % 4
                WHEN 0 THEN printf('€ hdr %d', doc_id % 100)
                WHEN 1 THEN printf('missing %d', doc_id % 100)
                WHEN 2 THEN printf('页 %d', doc_id % 100)
                ELSE printf('plain %d', doc_id % 100) END AS text
    FROM documents
    """,
)
def x_http_parts(spark, sf_dir):
    """HTTP-response splitting + header-driven charset resolution
    (r11; operators/media.http_response_parts + sniff_decode_html):
    real WARC response records store the FULL HTTP message, so the
    ingest must split status line + headers + body and feed the
    Content-Type charset parameter to the decoder — value-checked
    leg by leg: CRLF and bare-LF header framings, a 404 text/plain,
    charset declared ONLY in the header (no meta tag: a body-only
    sniffer mojibakes the € page), and a non-HTTP passthrough with
    NULL status.  Late-r11 wire-decoding legs: a chunked
    Transfer-Encoding body (chunk extension included), a gzipped
    Content-Encoding body under bare-LF headers, and a
    brotli-encoded body (Arrow's bundled codec) — each must decode
    to the SAME text as its identity twin (the oracle literal never
    changes), with `encoding` reporting what was applied.  Text
    char-exact against unicode oracle literals."""
    from lwetl_spark.functions.text import html_text
    from lwetl_spark.operators.media import (
        http_response_parts,
        sniff_decode_html,
        synth_http_demo,
    )

    docs = _t(spark, sf_dir, "documents")
    parts = http_response_parts(synth_http_demo(docs))
    dec = sniff_decode_html(
        parts.select("doc_id", "body", "content_type"),
        payload_col="body", content_type_col="content_type")
    return (
        parts.select("doc_id", "rec_idx", "status", "content_type",
                     "encoding", "body_ok")
        .join(dec, "doc_id")
        .select(
            "doc_id", "rec_idx",
            F.coalesce(F.col("status"), F.lit(-1)).alias("status"),
            F.coalesce(F.col("content_type"), F.lit("none"))
            .alias("content_type"),
            "charset", "encoding", "body_ok",
            html_text(F.col("html")).alias("text"),
        )
    )


# ----------------------------------------------------------------------------
# Crawl-index layer (late r11): SURT urlkeys, CDX-J parse, robots rules+gate
# — the selection layer in front of the WARC ingest loops (no reference
# analog: lwetl has no crawl surface; extends SURVEY §2.10)
# ----------------------------------------------------------------------------


@register(
    "x_surt_key",
    """
    WITH g AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END
                   AS scheme,
               CASE doc_id % 3 WHEN 0 THEN '' WHEN 1 THEN 'WWW.'
                    ELSE 'www2.' END AS www,
               CASE doc_id % 4 WHEN 0 THEN '' WHEN 1 THEN ':80'
                    WHEN 2 THEN ':443' ELSE ':8080' END AS port,
               CASE WHEN doc_id % 3 = 0 THEN ''
                    ELSE printf('?z=%d&a=%d', doc_id % 13, doc_id % 7)
               END AS q,
               CASE WHEN doc_id % 5 = 0 THEN '#Sec2' ELSE '' END AS frag
        FROM documents
    )
    SELECT doc_id,
           scheme || '://' || www
               || printf('S%d.Ex%d.COM', doc_id % 7, doc_id % 5)
               || port || printf('/A%d/B', doc_id % 11) || q || frag
               AS url,
           printf('com,ex%d,s%d%s)/a%d/b%s', doc_id % 5, doc_id % 7,
                  CASE WHEN doc_id % 4 = 3 THEN ':8080' ELSE '' END,
                  doc_id % 11,
                  CASE WHEN doc_id % 3 = 0 THEN ''
                       ELSE printf('?a=%d&z=%d', doc_id % 7,
                                   doc_id % 13) END) AS urlkey
    FROM g
    """,
)
def x_surt_key(spark, sf_dir):
    """SURT urlkey canonicalization (late r11; functions/text.
    surt_key): the Common Crawl CDX key transform — lowercase, scheme/
    fragment/userinfo dropped, leading www\\d* dropped, host labels
    reversed comma-joined, default ports dropped (others kept), query
    params sorted.  Fixtures rotate scheme, WWW/www2 prefixes, ports
    (none/80/443/8080), uppercase paths, unordered queries, and
    fragments; the oracle recomputes the EXPECTED key from id
    arithmetic, proving every variant collapses to the same canonical
    form.  Pure Catalyst (zero Python) — the 100 TB index-keying pass
    is map-only."""
    from lwetl_spark.functions.text import surt_key

    i = F.col("doc_id")
    scheme = F.when(i % 2 == 0, F.lit("http")).otherwise(F.lit("https"))
    www = F.when(i % 3 == 0, F.lit("")) \
        .when(i % 3 == 1, F.lit("WWW.")).otherwise(F.lit("www2."))
    port = F.when(i % 4 == 0, F.lit("")) \
        .when(i % 4 == 1, F.lit(":80")) \
        .when(i % 4 == 2, F.lit(":443")).otherwise(F.lit(":8080"))
    q = F.when(i % 3 == 0, F.lit("")).otherwise(
        F.format_string("?z=%d&a=%d", i % 13, i % 7))
    frag = F.when(i % 5 == 0, F.lit("#Sec2")).otherwise(F.lit(""))
    url = F.concat(
        scheme, F.lit("://"), www,
        F.format_string("S%d.Ex%d.COM", i % 7, i % 5), port,
        F.format_string("/A%d/B", i % 11), q, frag)
    return (_t(spark, sf_dir, "documents").select("doc_id")
            .select("doc_id", url.alias("url"),
                    surt_key(url).alias("urlkey")))


@register(
    "x_cdx_parse",
    """
    WITH g AS (
        SELECT doc_id,
               doc_id % 13 = 0 AS bad_json,
               doc_id % 13 <> 0 AND doc_id % 17 = 0 AS bad_ts
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN bad_json OR bad_ts THEN 'none'
                ELSE printf('com,ex,s%d)/p%d', doc_id % 9, doc_id % 31)
           END AS urlkey,
           CASE WHEN bad_json OR bad_ts THEN 'none'
                ELSE printf('2024%02d%02d120000', 1 + doc_id % 12,
                            1 + doc_id % 28) END AS ts,
           CASE WHEN bad_json THEN 'none'
                ELSE printf('http://s%d.ex.com/p%d', doc_id % 9,
                            doc_id % 31) END AS url,
           CASE WHEN bad_json THEN 'none'
                ELSE CASE doc_id % 4 WHEN 0 THEN 'text/html'
                     WHEN 1 THEN 'application/pdf'
                     WHEN 2 THEN 'image/jpeg' ELSE 'text/plain' END
           END AS mime,
           CAST(CASE WHEN bad_json THEN -1
                ELSE CASE doc_id % 5 WHEN 0 THEN 200 WHEN 1 THEN 200
                     WHEN 2 THEN 301 WHEN 3 THEN 404 ELSE 503 END
           END AS BIGINT) AS status,
           CAST(CASE WHEN bad_json THEN -1
                ELSE 100 + doc_id % 9000 END AS BIGINT) AS length,
           CAST(CASE WHEN bad_json THEN -1
                ELSE (doc_id * 7) % 100000 END AS BIGINT) AS offset,
           CASE WHEN bad_json THEN 'none'
                ELSE printf('crawl-%05d.warc.gz', doc_id % 300)
           END AS filename,
           NOT (bad_json OR bad_ts) AS valid
    FROM g
    """,
)
def x_cdx_parse(spark, sf_dir):
    """CDX-J index parse (late r11; operators/crawl.cdx_records): the
    Common Crawl `cdx-*.gz` record shape — `<urlkey> <14-digit ts>
    <JSON>` with the (filename, offset, length) triple that addresses
    the WARC byte range.  A 100 TB ingest reads THIS first and
    fetches ranges instead of scanning shards.  Fixtures rotate
    mime/status/geometry; every 13th line carries broken JSON and
    every 17th a short timestamp — both must flag valid=false without
    killing the parse (broken JSON nulls the payload fields, a bad
    timestamp keeps them — the partial-parse contract).  Pure
    Catalyst (regexp + from_json), map-only."""
    from lwetl_spark.operators.crawl import cdx_records

    i = F.col("doc_id")
    mime = F.when(i % 4 == 0, F.lit("text/html")) \
        .when(i % 4 == 1, F.lit("application/pdf")) \
        .when(i % 4 == 2, F.lit("image/jpeg")) \
        .otherwise(F.lit("text/plain"))
    status = F.when(i % 5 == 0, 200).when(i % 5 == 1, 200) \
        .when(i % 5 == 2, 301).when(i % 5 == 3, 404).otherwise(503)
    js = F.format_string(
        '{"url": "http://s%d.ex.com/p%d", "mime": "%s",'
        ' "status": "%d", "digest": "sha1:D%d", "length": "%d",'
        ' "offset": "%d", "filename": "crawl-%05d.warc.gz"}',
        i % 9, i % 31, mime, status, i % 1000,
        (100 + i % 9000).cast("long"), ((i * 7) % 100000).cast("long"),
        i % 300)
    urlkey = F.format_string("com,ex,s%d)/p%d", i % 9, i % 31)
    ts = F.format_string("2024%02d%02d120000", 1 + i % 12, 1 + i % 28)
    line = F.when(i % 13 == 0,
                  F.concat(urlkey, F.lit(" "), ts, F.lit(" {broken"))) \
        .when(i % 17 == 0, F.concat(urlkey, F.lit(" 2024 "), js)) \
        .otherwise(F.concat_ws(" ", urlkey, ts, js))
    out = cdx_records(
        _t(spark, sf_dir, "documents").select("doc_id")
        .select("doc_id", line.alias("line")))
    return out.select(
        "doc_id",
        F.coalesce(F.col("urlkey"), F.lit("none")).alias("urlkey"),
        F.coalesce(F.col("ts"), F.lit("none")).alias("ts"),
        F.coalesce(F.col("url"), F.lit("none")).alias("url"),
        F.coalesce(F.col("mime"), F.lit("none")).alias("mime"),
        F.coalesce(F.col("status").cast("long"), F.lit(-1))
        .alias("status"),
        F.coalesce(F.col("length"), F.lit(-1)).alias("length"),
        F.coalesce(F.col("offset"), F.lit(-1)).alias("offset"),
        F.coalesce(F.col("filename"), F.lit("none")).alias("filename"),
        "valid",
    )


def _robots_fixture(spark, sf_dir):
    """Shared robots.txt fixture: one document per host h = doc_id%20
    — hosts with h%2==0 carry a DataBot group (Disallow /d{h}/ +
    Allow /d{h}/ok* + Crawl-delay 2+h%4), every host a `*` group
    (Disallow /tmp$, plus Crawl-delay 1+h%3 when h%5!=0 — the
    default-delay fallback leg), every 3rd host a Sitemap line."""
    from lwetl_spark.operators.crawl import robots_rules

    hosts = (_t(spark, sf_dir, "documents")
             .select((F.col("doc_id") % 20).alias("h")).distinct())
    hh = F.col("h")
    databot = F.when(hh % 2 == 0, F.format_string(
        "User-agent: DataBot\nDisallow: /d%d/\nAllow: /d%d/ok*\n"
        "Crawl-delay: %d\n\n", hh, hh, 2 + hh % 4)).otherwise(F.lit(""))
    star_cd = F.when(hh % 5 != 0, F.format_string(
        "Crawl-delay: %d\n", 1 + hh % 3)).otherwise(F.lit(""))
    text = F.concat(
        F.lit("# robots\n"), databot,
        F.lit("User-agent: *\nDisallow: /tmp$\n"), star_cd,
        F.when(hh % 3 == 0,
               F.format_string("Sitemap: https://h%d/map.xml\n", hh))
        .otherwise(F.lit("")))
    return hosts, robots_rules(
        hosts.select(hh.alias("doc_id"), text.alias("robots")))


@register(
    "x_robots_rules",
    """
    WITH hosts AS (
        SELECT DISTINCT doc_id % 20 AS h FROM documents
    )
    SELECT h AS doc_id, 'databot' AS agent, 'disallow' AS directive,
           printf('/d%d/', h) AS pattern, CAST(2 AS BIGINT) AS rule_idx
    FROM hosts WHERE h % 2 = 0
    UNION ALL
    SELECT h, 'databot', 'allow', printf('/d%d/ok*', h), 3
    FROM hosts WHERE h % 2 = 0
    UNION ALL
    SELECT h, 'databot', 'crawl-delay', printf('%d', 2 + h % 4), 4
    FROM hosts WHERE h % 2 = 0
    UNION ALL
    SELECT h, '*', 'disallow', '/tmp$',
           CASE WHEN h % 2 = 0 THEN 7 ELSE 2 END
    FROM hosts
    UNION ALL
    SELECT h, '*', 'crawl-delay', printf('%d', 1 + h % 3),
           CASE WHEN h % 2 = 0 THEN 8 ELSE 3 END
    FROM hosts WHERE h % 5 <> 0
    UNION ALL
    SELECT h, 'none', 'sitemap', printf('https://h%d/map.xml', h),
           CASE WHEN h % 2 = 0 THEN 8 ELSE 3 END
           + CASE WHEN h % 5 <> 0 THEN 1 ELSE 0 END
    FROM hosts WHERE h % 3 = 0
    """,
)
def x_robots_rules(spark, sf_dir):
    """robots.txt parse (late r11; operators/crawl.robots_rules):
    RFC 9309 group formation — consecutive User-agent lines share a
    group, Allow/Disallow lines bind to it, Sitemap lines are
    group-independent, comments stripped.  The oracle recomputes
    every (agent, directive, pattern, LINE NUMBER) from host
    arithmetic — rule_idx proves the group walk hit the exact lines.
    Pure Catalyst: split + posexplode + per-document windows; only
    (id, line) rows ever shuffle."""
    _, rules = _robots_fixture(spark, sf_dir)
    return rules.select(
        "doc_id",
        F.coalesce(F.col("agent"), F.lit("none")).alias("agent"),
        "directive", "pattern", "rule_idx",
    )


@register(
    "x_robots_gate",
    """
    WITH hosts AS (
        SELECT DISTINCT doc_id % 20 AS h FROM documents
    ),
    u AS (
        SELECT h, printf('h%d', h) AS host,
               CASE h % 5
                    WHEN 0 THEN printf('/d%d/x', h)
                    WHEN 1 THEN printf('/d%d/ok1', h)
                    WHEN 2 THEN '/tmp' WHEN 3 THEN '/tmpz'
                    ELSE '/free' END AS url,
               h % 2 = 0 AS db
        FROM hosts
    )
    SELECT host, url,
           CASE WHEN h % 5 = 0 AND db THEN FALSE
                WHEN h % 5 = 2 AND NOT db THEN FALSE
                ELSE TRUE END AS allowed,
           CASE WHEN h % 5 = 0 AND db THEN printf('/d%d/', h)
                WHEN h % 5 = 1 AND db THEN printf('/d%d/ok*', h)
                WHEN h % 5 = 2 AND NOT db THEN '/tmp$'
                ELSE 'none' END AS matched_pattern,
           CASE WHEN h % 5 = 0 AND db THEN 'disallow'
                WHEN h % 5 = 1 AND db THEN 'allow'
                WHEN h % 5 = 2 AND NOT db THEN 'disallow'
                ELSE 'none' END AS matched_directive
    FROM u
    """,
)
def x_robots_gate(spark, sf_dir):
    """robots URL gating (late r11; operators/crawl.robots_gate):
    RFC 9309 §2.2.2 — the group naming the agent beats `*` (and
    SHADOWS it: a /tmp$ star rule must NOT block a host whose DataBot
    group says nothing about /tmp), longest pattern wins, allow wins
    ties, wildcard `*` and terminal `$` honored, rule-free hosts
    allowed.  The oracle enumerates every (host-shape, path-leg)
    outcome from arithmetic.  Scale shape: rules reduce per
    (host, agent) first, then ONE hash equi-join on host (both sides
    corpus-growing — never broadcast) and a per-url window over
    matched candidates only."""
    from lwetl_spark.operators.crawl import robots_gate

    hosts, rules = _robots_fixture(spark, sf_dir)
    hh = F.col("h")
    urls = hosts.select(
        F.format_string("h%d", hh).alias("host"),
        F.when(hh % 5 == 0, F.format_string("/d%d/x", hh))
        .when(hh % 5 == 1, F.format_string("/d%d/ok1", hh))
        .when(hh % 5 == 2, F.lit("/tmp"))
        .when(hh % 5 == 3, F.lit("/tmpz"))
        .otherwise(F.lit("/free")).alias("url"))
    out = robots_gate(
        urls,
        rules.withColumn("host", F.format_string("h%d", F.col("doc_id"))),
        agent="DataBot")
    return out.select(
        "host", "url", "allowed",
        F.coalesce(F.col("matched_pattern"), F.lit("none"))
        .alias("matched_pattern"),
        F.coalesce(F.col("matched_directive"), F.lit("none"))
        .alias("matched_directive"),
    )


@register(
    "x_sitemap_parse",
    """
    WITH g AS (
        SELECT doc_id,
               doc_id % 19 = 0 AS corrupt,
               doc_id % 7 = 3 AS is_index,
               1 + doc_id % 4 AS n
        FROM documents
    ),
    ent AS (
        SELECT doc_id, is_index, n, unnest(range(0, n)) AS j
        FROM g WHERE NOT corrupt
    )
    SELECT doc_id,
           CASE WHEN is_index THEN 'index' ELSE 'urlset' END AS kind,
           CAST(j AS BIGINT) AS entry_idx,
           CASE WHEN is_index
                THEN printf('https://s%d.ex/map%d.xml', doc_id % 9, j)
                ELSE printf('https://s%d.ex/p%d', doc_id % 9, j)
           END AS loc,
           CASE WHEN is_index OR (doc_id + j) % 3 <> 0
                THEN printf('2024-%02d-%02d', 1 + (doc_id + j) % 12,
                            1 + (doc_id + j) % 28)
                ELSE '' END AS lastmod,
           CASE WHEN NOT is_index AND (doc_id + j) % 2 = 0
                THEN CASE (doc_id + j) % 3 WHEN 0 THEN 'daily'
                     WHEN 1 THEN 'weekly' ELSE 'monthly' END
                ELSE '' END AS changefreq,
           CASE WHEN NOT is_index AND doc_id % 2 = 1
                THEN printf('0.%d', doc_id % 10) ELSE '' END
               AS priority,
           TRUE AS valid
    FROM ent
    UNION ALL
    SELECT doc_id, 'invalid', CAST(-1 AS BIGINT), 'none', 'none',
           'none', 'none', FALSE
    FROM g WHERE corrupt
    """,
)
def x_sitemap_parse(spark, sf_dir):
    """Sitemap XML parse (late r11; operators/crawl.sitemap_entries):
    the discovery layer robots `Sitemap:` lines point at — `<urlset>`
    entries (loc/lastmod/changefreq/priority) and `<sitemapindex>`
    children (kind='index' for recursion), parsed as pure Catalyst
    regexp over complete blocks (truncation keeps the entries closed
    before the cut).  Fixtures rotate entry counts, optional fields,
    and both document kinds; every 19th payload is not XML (sentinel
    row).  Completes the crawl-discovery trio: robots → sitemap →
    CDX → WARC ranges."""
    from lwetl_spark.operators.crawl import sitemap_entries

    i = F.col("doc_id")

    def urlset_entry(jj):
        lastmod = F.when(
            (i + jj) % 3 != 0,
            F.format_string("<lastmod>2024-%02d-%02d</lastmod>",
                            1 + (i + jj) % 12, 1 + (i + jj) % 28)
        ).otherwise(F.lit(""))
        cf = F.when(
            (i + jj) % 2 == 0,
            F.concat(F.lit("<changefreq>"),
                     F.element_at(
                         F.array(F.lit("daily"), F.lit("weekly"),
                                 F.lit("monthly")),
                         ((i + jj) % 3 + 1).cast("int")),
                     F.lit("</changefreq>"))).otherwise(F.lit(""))
        pr = F.when(i % 2 == 1, F.format_string(
            "<priority>0.%d</priority>", i % 10)).otherwise(F.lit(""))
        return F.format_string(
            "<url><loc>https://s%d.ex/p%d</loc>%s%s%s</url>",
            i % 9, jj, lastmod, cf, pr)

    def index_entry(jj):
        return F.format_string(
            "<sitemap><loc>https://s%d.ex/map%d.xml</loc>"
            "<lastmod>2024-%02d-%02d</lastmod></sitemap>",
            i % 9, jj, 1 + (i + jj) % 12, 1 + (i + jj) % 28)

    seq = F.sequence(F.lit(0).cast("long"), (i % 4).cast("long"))
    xml = F.when(i % 19 == 0, F.lit("GIF89a not xml")).when(
        i % 7 == 3,
        F.concat(F.lit("<sitemapindex>"),
                 F.concat_ws("", F.transform(seq, index_entry)),
                 F.lit("</sitemapindex>"))
    ).otherwise(
        F.concat(
            F.lit('<urlset xmlns="http://www.sitemaps.org/'
                  'schemas/sitemap/0.9">'),
            F.concat_ws("", F.transform(seq, urlset_entry)),
            F.lit("</urlset>")))
    out = sitemap_entries(
        _t(spark, sf_dir, "documents").select("doc_id")
        .select("doc_id", xml.alias("xml")))
    return out.select(
        "doc_id", "kind",
        F.coalesce(F.col("entry_idx"), F.lit(-1)).alias("entry_idx"),
        F.coalesce(F.col("loc"), F.lit("none")).alias("loc"),
        F.coalesce(F.col("lastmod"), F.lit("none")).alias("lastmod"),
        F.coalesce(F.col("changefreq"), F.lit("none"))
        .alias("changefreq"),
        F.coalesce(F.col("priority"), F.lit("none")).alias("priority"),
        "valid",
    )


def _link_fixture(spark, sf_dir, spread: bool = False):
    """Shared link fixture: per document a page at
    https://WWW.h{id%6}.Example/dir{id%4}/sub/page.html carrying
    1+id%5 anchors rotating all six reference forms and both quote
    styles; returns (doc_id, link_idx, ref, resolved, urlkey) rows
    through the real html_links → resolve_url → surt_key chain.

    ``spread=True`` (r11 optimization, guide §2.5) round-robins the
    id input across cores so the heavy regex chain parallelizes on a
    single-split scan — used by x_crawl_frontier, whose window pays a
    hash exchange anyway; x_link_extract stays map-only as pinned."""
    from lwetl_spark.functions.text import (
        html_links,
        resolve_url,
        surt_key,
    )

    i = F.col("doc_id")
    base = F.format_string(
        "https://WWW.h%d.Example/dir%d/sub/page.html", i % 6, i % 4)

    def link(jj):
        ref = F.when((i + jj) % 6 == 0, F.format_string(
            "http://other%d.ex/abs%d", jj, i % 9)) \
            .when((i + jj) % 6 == 1, F.format_string("/r/%d/x", jj)) \
            .when((i + jj) % 6 == 2, F.format_string("rel%d/y", jj)) \
            .when((i + jj) % 6 == 3, F.format_string("../up%d", jj)) \
            .when((i + jj) % 6 == 4,
                  F.format_string("//cdn%d.ex/z", jj)) \
            .otherwise(F.format_string("#sec%d", jj))
        quoted = F.when(
            jj % 2 == 0, F.format_string('"%s"', ref)) \
            .otherwise(F.format_string("'%s'", ref))
        return F.format_string(
            '<a class="c%d" href=%s>t%d</a>', jj, quoted, jj)

    html = F.concat(
        F.lit("<html><body>"),
        F.concat_ws("", F.transform(
            F.sequence(F.lit(0).cast("long"), i % 5), link)),
        F.lit("</body></html>"))
    ids = _t(spark, sf_dir, "documents").select("doc_id")
    if spread:
        from lwetl_spark.operators._parallel import spread as _spread

        ids = _spread(ids)
    pages = ids.select("doc_id", base.alias("base"),
                       html_links(html).alias("refs"))
    links = pages.select(
        "doc_id", "base",
        F.posexplode("refs").alias("link_idx", "ref"))
    resolved = resolve_url(F.col("base"), F.col("ref"))
    return links.select(
        "doc_id", F.col("link_idx").cast("long").alias("link_idx"),
        "ref", resolved.alias("resolved"),
        surt_key(resolved).alias("urlkey"))


@register(
    "x_link_extract",
    """
    WITH g AS (
        SELECT doc_id, unnest(range(0, 1 + doc_id % 5)) AS j
        FROM documents
    )
    SELECT doc_id, CAST(j AS BIGINT) AS link_idx,
           CASE (doc_id + j) % 6
                WHEN 0 THEN printf('http://other%d.ex/abs%d', j,
                                   doc_id % 9)
                WHEN 1 THEN printf('/r/%d/x', j)
                WHEN 2 THEN printf('rel%d/y', j)
                WHEN 3 THEN printf('../up%d', j)
                WHEN 4 THEN printf('//cdn%d.ex/z', j)
                ELSE printf('#sec%d', j) END AS ref,
           CASE (doc_id + j) % 6
                WHEN 0 THEN printf('http://other%d.ex/abs%d', j,
                                   doc_id % 9)
                WHEN 1 THEN printf('https://WWW.h%d.Example/r/%d/x',
                                   doc_id % 6, j)
                WHEN 2 THEN printf(
                    'https://WWW.h%d.Example/dir%d/sub/rel%d/y',
                    doc_id % 6, doc_id % 4, j)
                WHEN 3 THEN printf(
                    'https://WWW.h%d.Example/dir%d/up%d',
                    doc_id % 6, doc_id % 4, j)
                WHEN 4 THEN printf('https://cdn%d.ex/z', j)
                ELSE printf(
                    'https://WWW.h%d.Example/dir%d/sub/page.html',
                    doc_id % 6, doc_id % 4) END AS resolved,
           CASE (doc_id + j) % 6
                WHEN 0 THEN printf('ex,other%d)/abs%d', j, doc_id % 9)
                WHEN 1 THEN printf('example,h%d)/r/%d/x',
                                   doc_id % 6, j)
                WHEN 2 THEN printf('example,h%d)/dir%d/sub/rel%d/y',
                                   doc_id % 6, doc_id % 4, j)
                WHEN 3 THEN printf('example,h%d)/dir%d/up%d',
                                   doc_id % 6, doc_id % 4, j)
                WHEN 4 THEN printf('ex,cdn%d)/z', j)
                ELSE printf('example,h%d)/dir%d/sub/page.html',
                            doc_id % 6, doc_id % 4) END AS urlkey
    FROM g
    """,
)
def x_link_extract(spark, sf_dir):
    """Link extraction + RFC 3986 resolution + SURT keying (late r11;
    functions/text.html_links, resolve_url, surt_key) — the frontier
    step of a crawl: harvest hrefs, resolve every reference form
    against the page URL (absolute / root-relative / relative /
    parent `../` / scheme-relative `//` / fragment-only, both quote
    styles), and canonicalize to the CDX urlkey.  The oracle
    recomputes ref, RESOLVED URL, and urlkey per link from id
    arithmetic — proving the whole chain character-exact.  Pure
    Catalyst end to end: extraction, resolution, and keying are one
    map-only codegen pass."""
    return _link_fixture(spark, sf_dir)


@register(
    "x_fetch_schedule",
    """
    WITH hosts AS (
        SELECT DISTINCT doc_id % 20 AS h FROM documents
    ),
    u AS (
        SELECT h, printf('h%d', h) AS host,
               unnest(range(0, 1 + h % 3)) AS k,
               CASE WHEN h % 2 = 0 THEN 2 + h % 4
                    WHEN h % 5 <> 0 THEN 1 + h % 3
                    ELSE 1 END AS delay_s
        FROM hosts
    )
    SELECT printf('/q%d', k) AS url, host,
           CAST(delay_s AS BIGINT) AS delay_s,
           CAST(k AS BIGINT) AS slot,
           CAST(k * delay_s * 1000 AS BIGINT) AS fetch_at_ms
    FROM u
    """,
)
def x_fetch_schedule(spark, sf_dir):
    """Per-host politeness scheduling (late r11; operators/crawl.
    fetch_schedule): each host's Crawl-delay resolves with the same
    agent precedence as the gate (DataBot group beats `*`, default
    when absent), and the host's URLs take consecutive fetch slots —
    slot k fetches at k·delay·1000 ms.  The oracle recomputes every
    (delay, slot, timestamp) from host arithmetic across all three
    delay sources (agent group / star group / default).  Scale shape:
    delays reduce to ONE row per host before a hinted shuffle-hash
    join; slot sequencing is the inherent per-host total order, and
    only (host, url) rows shuffle."""
    from lwetl_spark.operators.crawl import fetch_schedule

    hosts, rules = _robots_fixture(spark, sf_dir)
    hh = F.col("h")
    urls = hosts.select(
        F.format_string("h%d", hh).alias("host"),
        F.posexplode(F.sequence(F.lit(0).cast("long"), hh % 3))
        .alias("_k", "_")).select(
        F.format_string("/q%d", F.col("_k")).alias("url"), "host")
    out = fetch_schedule(
        urls,
        rules.withColumn("host",
                         F.format_string("h%d", F.col("doc_id"))),
        agent="DataBot", default_delay_s=1)
    return out.select("url", "host", "delay_s", "slot", "fetch_at_ms")


@register(
    "x_crawl_frontier",
    """
    WITH g AS (
        SELECT doc_id, unnest(range(0, 1 + doc_id % 5)) AS j
        FROM documents
    ),
    lk AS (
        SELECT doc_id, j,
               CASE (doc_id + j) % 6
                    WHEN 0 THEN printf('http://other%d.ex/abs%d', j,
                                       doc_id % 9)
                    WHEN 1 THEN printf(
                        'https://WWW.h%d.Example/r/%d/x', doc_id % 6, j)
                    WHEN 2 THEN printf(
                        'https://WWW.h%d.Example/dir%d/sub/rel%d/y',
                        doc_id % 6, doc_id % 4, j)
                    WHEN 3 THEN printf(
                        'https://WWW.h%d.Example/dir%d/up%d',
                        doc_id % 6, doc_id % 4, j)
                    WHEN 4 THEN printf('https://cdn%d.ex/z', j)
                    ELSE printf(
                        'https://WWW.h%d.Example/dir%d/sub/page.html',
                        doc_id % 6, doc_id % 4) END AS url,
               CASE (doc_id + j) % 6
                    WHEN 0 THEN printf('ex,other%d)/abs%d', j,
                                       doc_id % 9)
                    WHEN 1 THEN printf('example,h%d)/r/%d/x',
                                       doc_id % 6, j)
                    WHEN 2 THEN printf(
                        'example,h%d)/dir%d/sub/rel%d/y',
                        doc_id % 6, doc_id % 4, j)
                    WHEN 3 THEN printf('example,h%d)/dir%d/up%d',
                                       doc_id % 6, doc_id % 4, j)
                    WHEN 4 THEN printf('ex,cdn%d)/z', j)
                    ELSE printf('example,h%d)/dir%d/sub/page.html',
                                doc_id % 6, doc_id % 4) END AS urlkey
        FROM g
    ),
    w AS (
        SELECT urlkey, url, doc_id, j,
               ROW_NUMBER() OVER (PARTITION BY urlkey
                                  ORDER BY doc_id, j) AS rn
        FROM lk
    )
    SELECT urlkey, url, doc_id, CAST(j AS BIGINT) AS link_idx
    FROM w WHERE rn = 1
    """,
)
def x_crawl_frontier(spark, sf_dir):
    """Batch crawl frontier (late r11) — the one-shot form the
    streaming twin (`stream_crawl_frontier`) is pinned against: every
    harvested link resolves and canonicalizes, then each distinct
    urlkey keeps its FIRST witness (smallest doc_id, then link
    order).  The oracle replays the same first-witness window in SQL.
    Scale shape: the only shuffle is the per-urlkey window — the
    inherent dedup exchange — carrying (urlkey, url, doc_id,
    link_idx) rows only."""
    from pyspark.sql import Window

    links = _link_fixture(spark, sf_dir, spread=True)
    wk = Window.partitionBy("urlkey").orderBy("doc_id", "link_idx")
    return (links.withColumn("_rn", F.row_number().over(wk))
            .filter(F.col("_rn") == 1)
            .select("urlkey", F.col("resolved").alias("url"),
                    "doc_id", "link_idx"))


@register(
    "x_crawl_select",
    """
    WITH hosts AS (
        SELECT DISTINCT doc_id % 20 AS h FROM documents
    ),
    rec AS (
        SELECT h, printf('h%d', h) AS host,
               unnest(range(0, 3 + h % 3)) AS k,
               h % 2 = 0 AS db
        FROM hosts
    ),
    cdx AS (
        SELECT h, host, k, db,
               CASE k % 5
                    WHEN 0 THEN printf('/d%d/x%d', h, k)
                    WHEN 1 THEN printf('/d%d/ok%d', h, k)
                    WHEN 2 THEN '/tmp'
                    WHEN 3 THEN printf('/tmpz%d', k)
                    ELSE printf('/free%d', k) END AS path,
               CASE WHEN (h + k) % 7 = 0 THEN 404 ELSE 200 END
                   AS status,
               CASE WHEN (h + k) % 11 = 0 THEN 'image/jpeg'
                    ELSE 'text/html' END AS mime,
               CAST(1000 * h + 13 * k AS BIGINT) AS "offset",
               CAST(100 + (h * 7 + k) % 900 AS BIGINT) AS length
        FROM rec
    ),
    elig AS (
        SELECT * FROM cdx
        WHERE status = 200 AND mime = 'text/html'
    ),
    gated AS (
        SELECT *,
               NOT ((k % 5 = 0 AND db) OR (k % 5 = 2 AND NOT db))
                   AS allowed
        FROM elig
    ),
    sched AS (
        SELECT *,
               CASE WHEN db THEN 2 + h % 4
                    WHEN h % 5 <> 0 THEN 1 + h % 3
                    ELSE 1 END AS delay_s,
               ROW_NUMBER() OVER (PARTITION BY host ORDER BY path) - 1
                   AS slot
        FROM gated WHERE allowed
    )
    SELECT host, path AS url, CAST(delay_s AS BIGINT) AS delay_s,
           CAST(slot AS BIGINT) AS slot,
           CAST(slot * delay_s * 1000 AS BIGINT) AS fetch_at_ms,
           "offset", length
    FROM sched
    """,
)
def x_crawl_select(spark, sf_dir):
    """The composed crawl-index selection pipeline (late r11 — the
    index-side flagship): CDX-J lines parse (`cdx_records`), records
    filter to fetchable (status 200, text/html), robots rules gate
    each path for the DataBot agent (`robots_gate`: group precedence,
    longest-match, wildcards), and the survivors take per-host
    politeness slots (`fetch_schedule`) carrying their WARC
    (offset, length) ranges — everything a 100 TB crawl decides
    BEFORE touching a payload byte, in one plan.  The oracle replays
    the entire chain (eligibility, gate outcome, delay source, slot
    window) from host arithmetic.  Scale shape: parse is map-only;
    gate + schedule shuffle only (host, path) rows through hinted
    hash joins and the two inherent per-host windows."""
    from lwetl_spark.functions.text import url_host
    from lwetl_spark.operators.crawl import (
        cdx_records,
        fetch_schedule,
        robots_gate,
    )

    hosts, rules = _robots_fixture(spark, sf_dir)
    hh = F.col("h")
    rec = hosts.select(
        "h", F.posexplode(F.sequence(F.lit(0).cast("long"),
                                     2 + hh % 3)).alias("_p", "k"))
    k = F.col("k")
    path = F.when(k % 5 == 0, F.format_string("/d%d/x%d", hh, k)) \
        .when(k % 5 == 1, F.format_string("/d%d/ok%d", hh, k)) \
        .when(k % 5 == 2, F.lit("/tmp")) \
        .when(k % 5 == 3, F.format_string("/tmpz%d", k)) \
        .otherwise(F.format_string("/free%d", k))
    status = F.when((hh + k) % 7 == 0, 404).otherwise(200)
    mime = F.when((hh + k) % 11 == 0, F.lit("image/jpeg")) \
        .otherwise(F.lit("text/html"))
    line = F.format_string(
        'surt)/ignored 20240101120000 {"url": "https://h%d%s",'
        ' "mime": "%s", "status": "%d", "length": "%d",'
        ' "offset": "%d", "filename": "crawl-%05d.warc.gz"}',
        hh, path, mime, status,
        (100 + (hh * 7 + k) % 900).cast("long"),
        (1000 * hh + 13 * k).cast("long"), hh)
    parsed = cdx_records(
        rec.select((hh * 100 + k).alias("doc_id"), line.alias("line")))
    elig = (parsed.filter(
        F.col("valid") & (F.col("status") == 200)
        & (F.col("mime") == "text/html"))
        .select(
            url_host(F.col("url")).alias("host"),
            F.regexp_replace(F.col("url"), r"^https?://[^/]+", "")
            .alias("url"),
            "offset", "length"))
    gate = robots_gate(
        elig.select("url", "host"),
        rules.withColumn("host",
                         F.format_string("h%d", F.col("doc_id"))),
        agent="DataBot")
    allowed = gate.filter("allowed").select("url", "host")
    sched = fetch_schedule(
        allowed,
        rules.withColumn("host",
                         F.format_string("h%d", F.col("doc_id"))),
        agent="DataBot", default_delay_s=1)
    return (sched.join(elig, ["url", "host"])
            .select("host", "url", "delay_s", "slot", "fetch_at_ms",
                    "offset", "length"))


@register(
    "x_redirect_chain",
    """
    WITH g AS (
        SELECT doc_id, doc_id % 8 AS p,
               (doc_id - doc_id % 8) AS base,
               ((doc_id - doc_id % 8) / 8) % 3 AS gm
        FROM documents
    )
    SELECT printf('k%d', doc_id) AS urlkey,
           CASE WHEN p = 0 THEN printf('k%d', doc_id)
                WHEN p <= 5 THEN printf('k%d', base)
                WHEN p = 6 AND gm = 0 THEN printf('k%d', doc_id)
                WHEN p = 7 AND gm = 0 THEN printf('k%d', doc_id)
                WHEN p = 7 AND gm = 1 THEN printf('kMISSING%d', doc_id)
                ELSE printf('k%d', doc_id - 5) END AS final_key,
           CAST(CASE WHEN p = 0 THEN 200
                WHEN p <= 5 THEN 200
                WHEN p = 7 AND gm = 1 THEN -1
                ELSE 301 END AS BIGINT) AS final_status,
           CAST(CASE WHEN p = 0 THEN 0
                WHEN p <= 5 THEN p
                WHEN gm = 0 THEN 2
                WHEN p = 7 AND gm = 1 THEN 1
                ELSE 5 END AS BIGINT) AS hops,
           CASE WHEN p = 0 OR p <= 5 THEN 'ok'
                WHEN gm = 0 THEN 'loop'
                WHEN p = 7 AND gm = 1 THEN 'dangling'
                ELSE 'cap' END AS outcome
    FROM g
    """,
)
def x_redirect_chain(spark, sf_dir):
    """CDX redirect-chain resolution (late r11; operators/crawl.
    resolve_redirects): follow each record's 3xx Location target up
    to max_hops joins, detecting landings ('ok'), snapshot holes
    ('dangling'), cycles ('loop' via the carried visited-key array),
    and over-long chains ('cap').  Fixture groups of 8 keys form
    descending chains of length 0-7 (so hops 6-7 hit the cap at
    max_hops=5), every 3rd group swaps keys 6↔7 into a 2-cycle, and
    every 3rd+1 group's key 7 points at a key outside the snapshot;
    the oracle enumerates every (position, group-kind) outcome.
    Scale shape: max_hops bounded equi-joins on urlkey against the
    hinted record side; only still-redirecting rows re-join, so each
    hop's frontier is the shrinking 3xx tail."""
    from lwetl_spark.operators.crawl import resolve_redirects

    i = F.col("doc_id")
    p = i % 8
    gm = ((i - p) / 8).cast("long") % 3
    status = F.when(p == 0, 200).otherwise(301)
    redirect = F.when(p == 0, F.lit(None).cast("string")) \
        .when((p == 6) & (gm == 0), F.format_string("k%d", i + 1)) \
        .when((p == 7) & (gm == 1),
              F.format_string("kMISSING%d", i)) \
        .otherwise(F.format_string("k%d", i - 1))
    records = _t(spark, sf_dir, "documents").select(
        F.format_string("k%d", i).alias("urlkey"),
        status.alias("status"), redirect.alias("redirect_key"))
    out = resolve_redirects(records, max_hops=5)
    return out.select(
        "urlkey", "final_key",
        F.coalesce(F.col("final_status"), F.lit(-1))
        .alias("final_status"),
        "hops", "outcome")


@register(
    "x_html_tables",
    """
    WITH g AS (
        SELECT doc_id, unnest(range(0, 1 + doc_id % 2)) AS t
        FROM documents
    ),
    dims AS (
        SELECT doc_id, t, 2 + (doc_id + t) % 3 AS ncols,
               1 + (doc_id + t) % 3 AS ndata
        FROM g
    ),
    rr AS (
        SELECT doc_id, t, ncols,
               unnest(range(0, 1 + ndata)) AS r
        FROM dims
    ),
    cc AS (
        SELECT doc_id, t, r, unnest(range(0, ncols)) AS c
        FROM rr
    )
    SELECT doc_id, CAST(t AS BIGINT) AS table_idx,
           CAST(r AS BIGINT) AS row_idx,
           CAST(c AS BIGINT) AS col_idx,
           r = 0 AS is_header,
           CASE WHEN r = 0 THEN printf('h%d', c)
                ELSE printf('v%d t%dr%dc%d', doc_id % 50, t, r, c)
           END AS cell
    FROM cc
    """,
)
def x_html_tables(spark, sf_dir):
    """HTML table mining (late r11; operators/webmine.html_tables):
    lift `<table>` blocks into relational (table, row, col, cell)
    rows — the structure `html_text` deliberately flattens, mined
    separately by every table-corpus pipeline.  Fixtures rotate
    table counts and geometries with `<th>` header rows, mixed tag
    case, bold-wrapped first cells (the strip chain must clean
    them), and surrounding non-table markup; the oracle enumerates
    every cell from id arithmetic.  Three posexplode stages, zero
    joins, zero Python — map-only."""
    from lwetl_spark.operators.webmine import html_tables

    i = F.col("doc_id")

    def cell(t, r, c):
        inner = F.when(r == 0, F.format_string("h%d", c)).otherwise(
            F.format_string("v%d t%dr%dc%d", i % 50, t, r, c))
        wrapped = F.when(
            (c == 0) & (r > 0),
            F.format_string("<b>%s</b>", inner)).otherwise(inner)
        tag = F.when(r == 0, F.lit("th")).otherwise(F.lit("td"))
        return F.format_string("<%s>%s</%s>", tag, wrapped, tag)

    def row(t, r):
        ncols = 2 + (i + t) % 3
        return F.format_string("<tr>%s</tr>", F.concat_ws("", F.transform(
            F.sequence(F.lit(0).cast("long"), ncols - 1),
            lambda c: cell(t, r, c))))

    def table(t):
        ndata = 1 + (i + t) % 3
        return F.format_string(
            '<TABLE class="x%d">%s</TABLE>', t,
            F.concat_ws("", F.transform(
                F.sequence(F.lit(0).cast("long"), ndata),
                lambda r: row(t, r))))

    html = F.concat(
        F.lit("<html><p>not a table</p>"),
        F.concat_ws("", F.transform(
            F.sequence(F.lit(0).cast("long"), i % 2), table)),
        F.lit("<div>tail</div></html>"))
    return html_tables(
        _t(spark, sf_dir, "documents").select("doc_id")
        .select("doc_id", html.alias("html")))


@register(
    "x_feed_parse",
    """
    WITH g AS (
        SELECT doc_id,
               doc_id % 17 = 0 AS corrupt,
               doc_id % 5 = 2 AS is_atom,
               1 + doc_id % 3 AS n
        FROM documents
    ),
    ent AS (
        SELECT doc_id, is_atom, unnest(range(0, n)) AS j
        FROM g WHERE NOT corrupt
    )
    SELECT doc_id,
           CASE WHEN is_atom THEN 'atom' ELSE 'rss' END AS kind,
           CAST(j AS BIGINT) AS entry_idx,
           CASE WHEN is_atom THEN printf('A%d-%d', doc_id % 50, j)
                WHEN (doc_id + j) % 4 = 0
                THEN printf('Post & %d-%d', doc_id % 50, j)
                ELSE printf('Post %d-%d', doc_id % 50, j)
           END AS title,
           CASE WHEN is_atom AND (doc_id + j) % 2 = 0
                THEN printf('https://a%d.ex/alt%d', doc_id % 9, j)
                WHEN is_atom
                THEN printf('https://a%d.ex/e%d', doc_id % 9, j)
                ELSE printf('https://s%d.ex/p%d', doc_id % 9, j)
           END AS link,
           CASE WHEN is_atom
                THEN printf('2024-%02d-%02dT00:00:00Z',
                            1 + (doc_id + j) % 12,
                            1 + (doc_id + j) % 28)
                WHEN (doc_id + j) % 3 <> 0
                THEN printf('Day %d Jan 2024', 1 + (doc_id + j) % 28)
                ELSE '' END AS updated,
           CASE WHEN is_atom THEN printf('tag:%d,%d', doc_id, j)
                WHEN (doc_id + j) % 2 = 0
                THEN printf('g%d-%d', doc_id, j)
                ELSE '' END AS guid,
           TRUE AS valid
    FROM ent
    UNION ALL
    SELECT doc_id, 'invalid', CAST(-1 AS BIGINT), 'none', 'none',
           'none', 'none', FALSE
    FROM g WHERE corrupt
    """,
)
def x_feed_parse(spark, sf_dir):
    """Syndication-feed parse (late r11; operators/webmine.
    feed_entries): RSS 2.0 `<item>` and Atom `<entry>` blocks — the
    update-driven recrawl discovery channel next to sitemaps.  RSS
    element-text links / pubDate / guid; Atom href-attribute links
    with rel="alternate" preferred over rel="self", `<updated>`,
    `<id>`; titles entity-decoded through the page chain.  Fixtures
    rotate kinds, entry counts, optional fields, and alternate-link
    presence; every 17th payload is not a feed (sentinel row)."""
    from lwetl_spark.operators.webmine import feed_entries

    i = F.col("doc_id")

    def rss_item(j):
        amp = (i + j) % 4 == 0
        title = F.when(amp, F.format_string(
            "Post &amp; %d-%d", i % 50, j)).otherwise(
            F.format_string("Post %d-%d", i % 50, j))
        pub = F.when((i + j) % 3 != 0, F.format_string(
            "<pubDate>Day %d Jan 2024</pubDate>",
            1 + (i + j) % 28)).otherwise(F.lit(""))
        guid = F.when((i + j) % 2 == 0, F.format_string(
            '<guid isPermaLink="false">g%d-%d</guid>', i, j)) \
            .otherwise(F.lit(""))
        return F.format_string(
            "<item><title>%s</title><link>https://s%d.ex/p%d</link>"
            "%s%s</item>", title, i % 9, j, pub, guid)

    def atom_entry(j):
        links = F.when(
            (i + j) % 2 == 0,
            F.format_string(
                '<link rel="self" href="https://a%d.ex/self%d"/>'
                '<link rel="alternate" href="https://a%d.ex/alt%d"/>',
                i % 9, j, i % 9, j)).otherwise(
            F.format_string('<link href="https://a%d.ex/e%d"/>',
                            i % 9, j))
        return F.format_string(
            '<entry><title type="text">A%d-%d</title>%s'
            "<updated>2024-%02d-%02dT00:00:00Z</updated>"
            "<id>tag:%d,%d</id></entry>",
            i % 50, j, links, 1 + (i + j) % 12, 1 + (i + j) % 28,
            i, j)

    seq = F.sequence(F.lit(0).cast("long"), i % 3)
    xml = F.when(i % 17 == 0, F.lit("GIF89a not a feed")).when(
        i % 5 == 2,
        F.concat(F.lit('<feed xmlns="http://www.w3.org/2005/Atom">'
                       "<title>F</title>"),
                 F.concat_ws("", F.transform(seq, atom_entry)),
                 F.lit("</feed>"))
    ).otherwise(
        F.concat(F.lit('<rss version="2.0"><channel><title>B</title>'),
                 F.concat_ws("", F.transform(seq, rss_item)),
                 F.lit("</channel></rss>")))
    out = feed_entries(
        _t(spark, sf_dir, "documents").select("doc_id")
        .select("doc_id", xml.alias("xml")))
    return out.select(
        "doc_id", "kind",
        F.coalesce(F.col("entry_idx"), F.lit(-1)).alias("entry_idx"),
        F.coalesce(F.col("title"), F.lit("none")).alias("title"),
        F.coalesce(F.col("link"), F.lit("none")).alias("link"),
        F.coalesce(F.col("updated"), F.lit("none")).alias("updated"),
        F.coalesce(F.col("guid"), F.lit("none")).alias("guid"),
        "valid",
    )


@register(
    "x_page_meta",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 4 = 0
                THEN printf('T & %d', doc_id % 50)
                ELSE printf('T %d', doc_id % 50) END AS title,
           CASE WHEN doc_id % 3 <> 0
                THEN printf('D%d', doc_id % 50) ELSE '' END
               AS description,
           CASE doc_id % 5 WHEN 1 THEN 'noindex'
                WHEN 2 THEN 'noindex, nofollow'
                WHEN 4 THEN 'all' ELSE '' END AS robots,
           CASE WHEN doc_id % 2 = 0
                THEN printf('OG%d', doc_id % 50) ELSE '' END
               AS og_title,
           CASE WHEN doc_id % 6 = 0
                THEN printf('https://img%d.ex/o.jpg', doc_id % 9)
                ELSE '' END AS og_image,
           CASE WHEN doc_id % 3 = 0
                THEN printf('https://c%d.ex/p%d', doc_id % 9,
                            doc_id % 20)
                ELSE '' END AS canonical
    FROM documents
    """,
)
def x_page_meta(spark, sf_dir):
    """Page-metadata census (late r11; operators/webmine.page_meta):
    title, meta description, the robots directive (lowercased — a
    noindex is an admission gate with legal weight), OpenGraph
    title/image, and the canonical link — the head fields curation
    filters on before reading body text.  Fixtures flip attribute
    ORDER per field (name-first vs content-first, the wild's mix),
    rotate presence/absence, and uppercase some robots values; the
    oracle enumerates every field from id arithmetic."""
    from lwetl_spark.operators.webmine import page_meta

    i = F.col("doc_id")
    title = F.when(i % 4 == 0, F.format_string(
        "T &amp; %d", i % 50)).otherwise(F.format_string("T %d", i % 50))
    desc = F.when(
        (i % 3 != 0) & (i % 2 == 0),
        F.format_string('<meta name="description" content="D%d">',
                        i % 50)) \
        .when(i % 3 != 0, F.format_string(
            "<meta content='D%d' name='description'>", i % 50)) \
        .otherwise(F.lit(""))
    robots = F.when(i % 5 == 1, F.lit(
        '<meta name="robots" content="NOINDEX">')) \
        .when(i % 5 == 2, F.lit(
            '<meta content="noindex, nofollow" name="robots">')) \
        .when(i % 5 == 4, F.lit('<meta name="robots" content="all">')) \
        .otherwise(F.lit(""))
    og = F.when(i % 2 == 0, F.format_string(
        '<meta property="og:title" content="OG%d"/>', i % 50)) \
        .otherwise(F.lit(""))
    ogi = F.when(i % 6 == 0, F.format_string(
        '<meta content="https://img%d.ex/o.jpg" property="og:image"/>',
        i % 9)).otherwise(F.lit(""))
    canon = F.when(
        (i % 3 == 0) & (i % 2 == 1),
        F.format_string('<link rel="canonical" href="https://c%d.ex'
                        '/p%d"/>', i % 9, i % 20)) \
        .when(i % 3 == 0, F.format_string(
            '<link href="https://c%d.ex/p%d" rel="canonical"/>',
            i % 9, i % 20)) \
        .otherwise(F.lit(""))
    html = F.format_string(
        "<html><head><TITLE>%s</TITLE>%s%s%s%s%s</head>"
        "<body>b</body></html>", title, desc, robots, og, ogi, canon)
    return page_meta(
        _t(spark, sf_dir, "documents").select("doc_id")
        .select("doc_id", html.alias("html")))


@register(
    "x_jsonld",
    """
    WITH g AS (
        SELECT doc_id, unnest(range(0, doc_id % 3)) AS j
        FROM documents WHERE doc_id % 3 <> 0
    )
    SELECT doc_id, CAST(j AS BIGINT) AS block_idx,
           CASE WHEN (doc_id + j) % 7 = 0 THEN 'none'
                ELSE CASE (doc_id + j) % 3 WHEN 0 THEN 'Article'
                     WHEN 1 THEN 'Product' ELSE 'Event' END
           END AS ld_type,
           CASE WHEN (doc_id + j) % 7 = 0 THEN 'none'
                ELSE printf('N%d-%d', doc_id % 50, j) END AS name,
           CASE WHEN (doc_id + j) % 7 = 0 THEN 'none'
                ELSE printf('https://l%d.ex/%d', doc_id % 9, j)
           END AS url,
           (doc_id + j) % 7 <> 0 AS parsed
    FROM g
    """,
)
def x_jsonld(spark, sf_dir):
    """schema.org JSON-LD extraction (late r11; operators/webmine.
    jsonld_blocks): `<script type="application/ld+json">` blocks —
    the structured-data channel product/article miners read — with
    top-level @type/name/url parsed and malformed JSON flagged
    (parsed=false, fields null) rather than fatal.  Fixtures rotate
    block counts (incl. zero-block documents emitting no rows),
    types, and a broken-JSON leg every 7th (doc+block)."""
    from lwetl_spark.operators.webmine import jsonld_blocks

    i = F.col("doc_id")

    def block(j):
        good = F.format_string(
            '{"@type": "%s", "name": "N%d-%d",'
            ' "url": "https://l%d.ex/%d"}',
            F.when((i + j) % 3 == 0, F.lit("Article"))
            .when((i + j) % 3 == 1, F.lit("Product"))
            .otherwise(F.lit("Event")),
            i % 50, j, i % 9, j)
        body = F.when((i + j) % 7 == 0, F.lit("{broken")).otherwise(good)
        return F.format_string(
            '<script type="application/ld+json">%s</script>', body)

    html = F.when(i % 3 == 0, F.lit("<html><p>none</p></html>")) \
        .otherwise(F.concat(
            F.lit("<html><head>"),
            F.concat_ws("", F.transform(
                F.sequence(F.lit(0).cast("long"), i % 3 - 1), block)),
            F.lit("</head></html>")))
    out = jsonld_blocks(
        _t(spark, sf_dir, "documents").select("doc_id")
        .select("doc_id", html.alias("html")))
    return out.select(
        "doc_id", "block_idx",
        F.coalesce(F.col("ld_type"), F.lit("none")).alias("ld_type"),
        F.coalesce(F.col("name"), F.lit("none")).alias("name"),
        F.coalesce(F.col("url"), F.lit("none")).alias("url"),
        "parsed",
    )
