"""DML sinks / uploaders (SURVEY §2.8, U1-U8).

Reference: lwetl/uploader.py — NativeUploader (literal SQL),
ParameterUploader (bind params), MultiParameterUploader (executemany),
with per-N-row commits and 4 commit modes, plus process-global PK counters.

Spark re-design: writes are atomic jobs over parquet table directories.
The dict-in/DataFrame-under surface survives; commit modes become the
`WritePolicy` enum:

| reference mode (uploader.py:22-25) | WritePolicy | behavior |
|---|---|---|
| dryrun   | PLAN    | no write; returns planned row count |
| rollback | STAGE   | write to a staging dir next to the target (default, like the reference's rollback-by-default) |
| commit   | COMMIT  | real write |
| pipe     | SCRIPT  | emit INSERT statements (K5) |

Update/delete/merge on parquet are implemented as join+coalesce /
anti-join rewrites (SURVEY U4/U5): read target, transform, overwrite —
the classic pre-Delta pattern.  On a real deployment the same calls map
1:1 onto Delta MERGE/DELETE; the import is gated so the engine runs
without the Delta jars.
"""

from __future__ import annotations

import enum
import os
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class SqlExpression:
    """U8: the reference's `NativeExpression` passes raw SQL as an insert/
    update value (lwetl/uploader.py:64-70, 330-331).  Here the expression
    is evaluated by Catalyst (`F.expr`) against the row being written, so
    it may reference other columns of the target row."""

    def __init__(self, sql: str):
        self.sql = sql

    def __repr__(self) -> str:  # pragma: no cover
        return f"SqlExpression({self.sql!r})"


class WritePolicy(enum.Enum):
    PLAN = "plan"  # reference 'dryrun' (lwetl/uploader.py:22)
    STAGE = "stage"  # reference 'rollback' — the DEFAULT, writes discarded
    COMMIT = "commit"
    SCRIPT = "script"  # reference 'pipe'


def add_pk_column(
    df: DataFrame,
    pk_col: str,
    existing_max: int = 0,
    order_by: list[str] | None = None,
) -> DataFrame:
    """Deterministic id generation (U7): the reference seeds a counter
    from `SELECT MAX(pk)` and increments per row
    (lwetl/uploader.py:31-61).  Spark equivalent: max + row_number over
    an explicit ordering — deterministic, unlike
    monotonically_increasing_id, and safe under retries.

    Scale note: a single un-partitioned window is a one-reducer sort; for
    bulk backfills prefer zipWithIndex-style (per-partition offsets).
    This veneer is for the reference's insert-with-generated-PK use case
    (bounded batches).
    """
    order_by = order_by or df.columns
    w = Window.orderBy(*order_by)
    return df.withColumn(pk_col, (F.lit(existing_max) + F.row_number().over(w)).cast("long"))


class Uploader:
    """Row/DataFrame sink bound to a parquet table directory.

    Mirrors the reference Uploader surface (insert/update/delete/commit,
    lwetl/uploader.py:78-698) with DataFrames underneath.  Dict rows are
    accepted for API parity and buffered driver-side until `commit()`
    (the reference's MultiParameterUploader batching, :644-698); empty
    values are dropped like the reference's `_filter_data`
    (:309-344).
    """

    def __init__(
        self,
        spark: SparkSession,
        table_path: str,
        policy: WritePolicy = WritePolicy.STAGE,
        table_name: str | None = None,
    ):
        self.spark = spark
        self.table_path = table_path
        self.policy = policy
        self.table_name = table_name or os.path.basename(table_path.rstrip("/")).split(".")[0]
        self._buffer: list[dict] = []
        self._scripts: list[str] = []
        self.rowcount = 0

    # -- reading ----------------------------------------------------------
    def target(self) -> DataFrame:
        return self.spark.read.parquet(self.table_path)

    def _target_schema(self):
        return self.target().schema

    # -- U1/U3: insert ----------------------------------------------------
    def insert(self, row: dict) -> None:
        """Buffer one dict row (U1; lwetl/uploader.py:550-570).  Keys not
        in the target schema are dropped; empty values are dropped
        (reference `_filter_data`, :309-344)."""
        cols = {f.name for f in self._target_schema().fields}
        clean = {
            k: v
            for k, v in row.items()
            if k in cols and v is not None and not (isinstance(v, str) and not v.strip())
        }
        if clean:
            self._buffer.append(clean)
            self.rowcount += 1

    def insert_df(self, df: DataFrame) -> int:
        """Bulk insert (U3's natural Spark form): append a DataFrame."""
        return self._write(df, mode="append")

    # -- U4: update -------------------------------------------------------
    def update(self, set_values: dict, where: dict) -> int:
        """UPDATE t SET ... WHERE k=v[ AND ...] (U4;
        lwetl/uploader.py:572-608) as a join-free conditional rewrite:
        matched rows get the new values (None → NULL like the reference's
        explicit-None semantics, :594-595)."""
        trg = self.target()
        cond = None
        for k, v in where.items():
            c = F.col(k).isNull() if v is None else (F.col(k) == F.lit(v))
            cond = c if cond is None else (cond & c)
        n = trg.filter(cond).count()
        cols = []
        for f in trg.schema.fields:
            if f.name in set_values:
                v = set_values[f.name]
                if isinstance(v, SqlExpression):  # U8: SET c = <raw SQL>
                    new = F.expr(v.sql).cast(f.dataType)
                elif v is None:
                    new = F.lit(None).cast(f.dataType)
                else:
                    new = F.lit(v).cast(f.dataType)
                cols.append(F.when(cond, new).otherwise(F.col(f.name)).alias(f.name))
            else:
                cols.append(F.col(f.name))
        self._write(trg.select(*cols), mode="overwrite")
        return n

    # -- U5: delete -------------------------------------------------------
    def delete(self, where: dict | None = None, keys_df: DataFrame | None = None, key: str | None = None) -> int:
        """DELETE FROM t WHERE ... (U5; lwetl/uploader.py:610-636).  Either
        a where-dict, or (keys_df, key) replicating db-copy's batched
        `IN (?,...)` delete (db_copy/main.py:365-391) as an anti-join."""
        trg = self.target()
        if keys_df is not None and key is not None:
            remaining = trg.join(keys_df.select(key).distinct(), on=key, how="left_anti")
        elif where:
            cond = None
            for k, v in where.items():
                c = F.col(k).isNull() if v is None else (F.col(k) == F.lit(v))
                cond = c if cond is None else (cond & c)
            remaining = trg.filter(~cond | cond.isNull())
        else:
            raise ValueError("delete needs a where-dict or keys_df+key")
        before = trg.count()
        after_df = remaining
        n_after = after_df.count()
        self._write(after_df, mode="overwrite")
        return before - n_after

    # -- merge (db-copy update mode) --------------------------------------
    def merge(self, src: DataFrame, key: str) -> dict[str, int]:
        """Upsert (U4+U1 composite, db-copy 'update' mode
        db_copy/main.py:296-315): target rows matched on `key` are
        replaced by source rows, unmatched source rows appended.
        Join+union rewrite — maps 1:1 to Delta MERGE when available."""
        trg = self.target()
        src = src.select(*[c for c in trg.columns if c in src.columns])
        kept = trg.join(src.select(key).distinct(), on=key, how="left_anti")
        merged = kept.unionByName(src, allowMissingColumns=True)
        inserted = src.join(trg.select(key).distinct(), on=key, how="left_anti").count()
        updated = src.count() - inserted
        self._write(merged, mode="overwrite")
        return {"inserted": inserted, "updated": updated}

    # -- commit machinery --------------------------------------------------
    def commit(self) -> int:
        """Flush buffered dict rows (U3 executemany analog,
        lwetl/uploader.py:644-698)."""
        if not self._buffer:
            return 0
        schema = self._target_schema()
        plain = [
            r for r in self._buffer if not any(isinstance(v, SqlExpression) for v in r.values())
        ]
        exprish = [
            r for r in self._buffer if any(isinstance(v, SqlExpression) for v in r.values())
        ]
        n = len(self._buffer)
        self._buffer = []
        dfs = []
        if plain:
            rows = [tuple(r.get(f.name) for f in schema.fields) for r in plain]
            dfs.append(self.spark.createDataFrame(rows, schema))
        for r in exprish:  # U8 rows: literals first, then expressions so an
            # expression may reference the row's other columns
            base = self.spark.range(1).select(
                *[
                    F.lit(None if isinstance(r.get(f.name), SqlExpression) else r.get(f.name))
                    .cast(f.dataType)
                    .alias(f.name)
                    for f in schema.fields
                ]
            )
            for f in schema.fields:
                v = r.get(f.name)
                if isinstance(v, SqlExpression):
                    base = base.withColumn(f.name, F.expr(v.sql).cast(f.dataType))
            dfs.append(base)
        df = dfs[0]
        for d in dfs[1:]:
            df = df.unionByName(d)
        self._write(df, mode="append")
        return n

    def rollback(self) -> int:
        """Discard buffered rows (the reference's default commit mode!)."""
        n = len(self._buffer)
        self._buffer = []
        return n

    @property
    def staging_path(self) -> str:
        return self.table_path.rstrip("/") + ".staging"

    def _write(self, df: DataFrame, mode: str) -> int:
        if self.policy is WritePolicy.PLAN:
            return df.count()
        if self.policy is WritePolicy.SCRIPT:
            from lwetl_spark.sinks.formatter import to_sql_inserts

            self._scripts.extend(to_sql_inserts(df, self.table_name))
            return len(self._scripts)
        if self.policy is WritePolicy.STAGE:
            df.write.mode("overwrite").parquet(self.staging_path)
            return self.spark.read.parquet(self.staging_path).count()
        # COMMIT: overwrite needs a read-break (can't overwrite a path
        # currently being read) → stage then atomic-ish swap
        if mode == "overwrite":
            tmp = self.table_path.rstrip("/") + ".tmp_overwrite"
            df.write.mode("overwrite").parquet(tmp)
            out = self.spark.read.parquet(tmp)
            out.write.mode("overwrite").parquet(self.table_path)
            n = self.spark.read.parquet(self.table_path).count()
            _rm_tree(tmp)
            return n
        df.write.mode(mode).parquet(self.table_path)
        return 0

    def sql_script(self) -> Iterable[str]:
        """Accumulated INSERT statements under SCRIPT policy (U2/K5)."""
        return list(self._scripts)


def _rm_tree(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)
