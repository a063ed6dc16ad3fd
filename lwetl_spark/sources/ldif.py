"""LDIF source (SURVEY S6) — the one genuinely custom parser.

Reference: `LdifImport` (lwetl/table_import.py:222-375):
- records separated by blank lines,
- `attr: value` lines; continuation lines start with a single space,
- `attr:: base64value` → decoded (reference keeps bytes/str),
- multi-valued attributes → list, or a separator-join when `separator`
  is given,
- `dn` starts a record.

Two modes:
- `parse_ldif_text` — pure-Python record parser (driver-side, small
  files; mirrors the reference's envelope),
- `ldif_source(distributed=True)` — scale path: Hadoop
  `textinputformat.record.delimiter="\\n\\n"` splits records in parallel,
  then the same per-record parser runs inside `mapPartitions` (the only
  RDD usage in the engine: record assembly is genuinely per-partition
  imperative work; everything downstream is DataFrame).
"""

from __future__ import annotations

import base64
import binascii

from pyspark.sql import DataFrame, SparkSession


def _parse_record(block: str, separator: str | None) -> dict[str, object] | None:
    """Parse one LDIF record block (reference lwetl/table_import.py:252-340
    semantics: continuation lines, `::` base64, multi-valued attrs)."""
    # unfold continuation lines (RFC 2849: leading single space)
    lines: list[str] = []
    for raw in block.splitlines():
        if not raw.strip():
            continue
        if raw.startswith(" ") and lines:
            lines[-1] += raw[1:]
        elif raw.startswith("#"):
            continue
        else:
            lines.append(raw)
    if not lines:
        return None
    rec: dict[str, object] = {}
    for line in lines:
        if ":" not in line:
            continue
        if "::" in line and line.index("::") == line.index(":"):
            attr, _, val = line.partition("::")
            try:
                decoded = base64.b64decode(val.strip())
                try:
                    value: object = decoded.decode("utf-8")
                except UnicodeDecodeError:
                    value = decoded  # keep raw bytes (e.g. photo)
            except binascii.Error:  # malformed base64: keep literal
                value = val.strip()
        else:
            attr, _, val = line.partition(":")
            value = val.strip()
        attr = attr.strip()
        if attr in rec:
            prev = rec[attr]
            if isinstance(prev, list):
                prev.append(value)
            else:
                rec[attr] = [prev, value]
        else:
            rec[attr] = value
    if separator is not None:
        rec = {
            k: (separator.join(str(x) for x in v) if isinstance(v, list) else v)
            for k, v in rec.items()
        }
    return rec or None


def parse_ldif_text(text: str, separator: str | None = None) -> list[dict[str, object]]:
    """Driver-side parse of LDIF text → list of attr dicts."""
    out = []
    for block in text.split("\n\n"):
        rec = _parse_record(block, separator)
        if rec:
            out.append(rec)
    return out


def ldif_source(
    spark: SparkSession,
    path: str,
    separator: str | None = "|",
    distributed: bool = False,
    upper_names: bool = True,
) -> DataFrame:
    """Read an LDIF file into a DataFrame (one row per record).

    `separator=None` keeps multi-valued attributes as arrays; a string
    joins them (the reference's `separator` behavior).  Binary values are
    base64-re-encoded to strings when a separator is used, so the column
    type stays string.
    """
    from lwetl_spark.types import normalize_names

    if distributed:
        # scale path: blank-line record splitting in parallel
        conf = {"textinputformat.record.delimiter": "\n\n"}
        rdd = spark.sparkContext.newAPIHadoopFile(
            path,
            "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
            "org.apache.hadoop.io.LongWritable",
            "org.apache.hadoop.io.Text",
            conf=conf,
        ).map(lambda kv: kv[1])
        sep = separator
        records = rdd.map(lambda block: _parse_record(block, sep)).filter(bool)
        rows = records.collect()  # bounded: LDIF exports are small by construction
    else:
        with open(path, encoding="utf-8") as fh:
            rows = parse_ldif_text(fh.read(), separator)
    if not rows:
        raise ValueError(f"no LDIF records in {path}")
    # stable column order: first-seen attribute order across records
    cols: list[str] = []
    for r in rows:
        for k in r:
            if k not in cols:
                cols.append(k)
    norm = [
        tuple(_to_str(r.get(c)) for c in cols)
        for r in rows
    ]
    df = spark.createDataFrame(norm, schema=", ".join(f"`{c}` string" for c in cols))
    return normalize_names(df, upper=upper_names)


def _to_str(v: object) -> str | None:
    if v is None:
        return None
    if isinstance(v, bytes):
        return base64.b64encode(v).decode("ascii")
    if isinstance(v, list):
        return "|".join(str(x) for x in v)
    return str(v)
