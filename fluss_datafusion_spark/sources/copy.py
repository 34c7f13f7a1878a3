"""COPY TO / COPY FROM: file export and ingest (CSV / JSON / PARQUET).

The reference links DataFusion's csv/json/parquet datasources but never
exposes them in the CLI (SURVEY.md §2: Cargo.lock:802-805, "not exposed
in CLI"); we expose them as the DuckDB/Snowflake-flavored COPY command
over Spark's native readers/writers:

    COPY <table | (query)> TO '<path>'
        [(FORMAT CSV|JSON|PARQUET|ORC [, HEADER true|false]
          [, DELIMITER '<c>'] [, COMPRESSION <codec>]
          [, PARTITION_BY (c1, c2)])]
    COPY <table> FROM '<path>' [(FORMAT ... [, HEADER ...] [, DELIMITER ...])]

Format defaults to the path's extension.  COPY FROM appends through the
normal insert path, so PK tables get upsert semantics, CHECK
constraints run, and the write is logged/sequenced like any INSERT —
an external file drop is just another batch.  With HEADER (csv) or
JSON, columns align by NAME (missing -> error, extra -> error); a
headerless CSV aligns by position.

Scale shape: both directions are single Spark jobs — the write
parallelizes per partition, the read parallelizes per file split;
nothing is collected.  PARTITION_BY writes a Hive-partitioned layout
so the export re-imports (or registers) with partition pruning intact.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Tuple

_COPY_RE = re.compile(
    r"^\s*COPY\s+(?P<src>\((?:[^()]|\([^()]*\))*\)|(?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)"
    r"\s+(?P<dir>TO|FROM)\s+'(?P<path>[^']+)'"
    r"\s*(?:\(\s*(?P<opts>.*?)\s*\))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_OPT_RE = re.compile(
    r"(?P<key>\w+)\s+(?:\(\s*(?P<list>[^)]*)\s*\)|'(?P<str>[^']*)'|(?P<bare>[\w.]+))",
    re.IGNORECASE,
)

_FORMATS = {"csv", "json", "parquet", "orc"}


def parse_copy(sql: str) -> Optional[Tuple[str, str, str, dict]]:
    """Parse a COPY statement into (source, direction, path, options);
    None if the statement is not a COPY."""
    match = _COPY_RE.match(sql.strip().rstrip(";"))
    if match is None:
        return None
    opts: dict = {}
    for om in _OPT_RE.finditer(match.group("opts") or ""):
        key = om.group("key").lower()
        if om.group("list") is not None:
            opts[key] = [c.strip().strip("`\"") for c in om.group("list").split(",")]
        else:
            opts[key] = om.group("str") if om.group("str") is not None else om.group("bare")
    return (
        match.group("src"),
        match.group("dir").upper(),
        match.group("path"),
        opts,
    )


def _format_of(path: str, opts: dict) -> str:
    fmt = str(opts.get("format", "")).lower()
    if not fmt:
        fmt = os.path.splitext(path)[1].lstrip(".").lower()
    if fmt not in _FORMATS:
        raise ValueError(
            f"COPY: unknown or missing format {fmt!r} "
            "(use FORMAT CSV|JSON|PARQUET|ORC)"
        )
    return fmt


def _truthy(v) -> bool:
    return str(v).strip().lower() in ("true", "1", "yes", "on")


def copy_to(session, source: str, path: str, opts: dict) -> int:
    """Execute COPY ... TO: returns rows written, observed on the
    writing plan itself (``df.observe``) — NOT recomputed by a second
    scan of the source, which would double the work and, for
    non-deterministic queries or tables modified between write and
    count, report a number different from what actually landed
    (ADVICE r5)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    fmt = _format_of(path, opts)
    if source.startswith("("):
        df = session.sql(source[1:-1])
    elif session.catalog.has_table(source):
        df = session.catalog.read(source)
    else:
        session.catalog.refresh_views()  # resolving temp views
        df = session.spark.table(source)
    obs = Observation()
    df = df.observe(obs, F.count(F.lit(1)).alias("rows_written"))
    # JSON/CSV writers reject no-op but complex types handle via to_json
    writer = df.write.mode("overwrite")
    if "partition_by" in opts:
        writer = writer.partitionBy(*opts["partition_by"])
    if fmt == "csv":
        writer = writer.option("header", _truthy(opts.get("header", "true")))
        if "delimiter" in opts:
            writer = writer.option("sep", opts["delimiter"])
    if "compression" in opts:
        writer = writer.option("compression", str(opts["compression"]).lower())
    getattr(writer, fmt)(path)
    return int(obs.get["rows_written"])


def copy_from(session, target: str, path: str, opts: dict) -> int:
    """Execute COPY <table> FROM: reads the files and appends through
    the normal insert path (PK upsert, CHECK constraints, seq stamps).
    Name-aligned for header'd csv / json / parquet; position-aligned
    for headerless csv."""
    from pyspark.sql import functions as F

    fmt = _format_of(path, opts)
    spec = session.catalog.get_table(target)
    schema = spec.spark_schema()
    spark = session.spark
    if fmt == "csv":
        header = _truthy(opts.get("header", "true"))
        reader = spark.read.option("header", header)
        if "delimiter" in opts:
            reader = reader.option("sep", opts["delimiter"])
        if header:
            df = reader.csv(path)
        else:
            # position-aligned: read with the target schema directly
            df = reader.schema(schema).csv(path)
            return session.catalog.insert(target, df)
    else:
        df = getattr(spark.read, fmt)(path)  # json / parquet / orc
    have = set(df.columns)
    want = [f.name for f in schema.fields]
    missing = [c for c in want if c not in have]
    extra = [c for c in df.columns if c not in set(want)]
    if missing or extra:
        raise ValueError(
            f"COPY FROM column mismatch for {target}: missing {missing}, "
            f"unexpected {extra}"
        )
    aligned = df.select(
        *[F.col(f.name).cast(f.dataType) for f in schema.fields]
    )
    return session.catalog.insert(target, aligned)
