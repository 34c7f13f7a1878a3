"""Table metadata model.

Mirrors the information the reference keeps per table: columns with
type/nullability/comment, PRIMARY KEY constraint, partition keys,
bucket keys + bucket count, table properties and comment — everything the
DDL generator at src/catalog/schema.rs:703-782 renders.  Spark has no
native PK / DISTRIBUTED BY, so this lives in our own catalog and drives
the upsert + lookup paths.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from pyspark.sql import types as T

# DDL type name -> Spark type. Coverage mirrors the reference's
# arrow->fluss mapping (src/catalog/schema.rs:151-187). TIME has no Spark
# equivalent; stored as bigint microseconds (documented divergence,
# SURVEY.md §1.3).
_DDL_TYPES = {
    "BOOLEAN": T.BooleanType(),
    "TINYINT": T.ByteType(),
    "SMALLINT": T.ShortType(),
    "INT": T.IntegerType(),
    "INTEGER": T.IntegerType(),
    "BIGINT": T.LongType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "STRING": T.StringType(),
    "CHAR": T.StringType(),
    "VARCHAR": T.StringType(),
    "BYTES": T.BinaryType(),
    "BINARY": T.BinaryType(),
    "DATE": T.DateType(),
    "TIME": T.LongType(),
    "TIMESTAMP": T.TimestampType(),
}


def ddl_type_to_spark(type_name: str) -> T.DataType:
    """Resolve a DDL type string (possibly DECIMAL(p,s)) to a Spark type."""
    upper = type_name.strip().upper()
    if upper.startswith("DECIMAL"):
        inner = upper[len("DECIMAL"):].strip()
        if inner.startswith("(") and inner.endswith(")"):
            precision, scale = (int(x) for x in inner[1:-1].split(","))
            if scale < 0:
                raise ValueError(f"negative DECIMAL scale not supported: {type_name}")
            return T.DecimalType(precision, scale)
        return T.DecimalType(10, 0)
    base = upper.split("(")[0].strip()
    if base in ("CHAR", "VARCHAR"):
        return T.StringType()
    if base not in _DDL_TYPES:
        raise ValueError(f"unsupported CREATE TABLE type: {type_name}")
    return _DDL_TYPES[base]


def spark_type_to_ddl(dtype: T.DataType) -> str:
    """Render a Spark type as the Fluss-style DDL name (for SHOW CREATE
    TABLE / DESCRIBE parity — reference renders via ``format_create_table_sql``)."""
    mapping = {
        T.BooleanType: "BOOLEAN",
        T.ByteType: "TINYINT",
        T.ShortType: "SMALLINT",
        T.IntegerType: "INT",
        T.LongType: "BIGINT",
        T.FloatType: "FLOAT",
        T.DoubleType: "DOUBLE",
        T.StringType: "STRING",
        T.BinaryType: "BYTES",
        T.DateType: "DATE",
        T.TimestampType: "TIMESTAMP",
    }
    if isinstance(dtype, T.DecimalType):
        return f"DECIMAL({dtype.precision}, {dtype.scale})"
    for klass, name in mapping.items():
        if isinstance(dtype, klass):
            return name
    # Nested types are first-class in Spark (the reference can only display
    # them, never store — src/cli_display.rs); render Spark's name.
    return dtype.simpleString().upper()


@dataclass
class ColumnSpec:
    name: str
    type_name: str  # DDL-facing type string, e.g. "BIGINT", "DECIMAL(10, 2)"
    nullable: bool = True
    comment: Optional[str] = None
    # column mapping (Delta-style): the name under which the column lives
    # in the parquet files.  None = same as ``name``; RENAME COLUMN sets
    # it so no data file is ever rewritten.
    physical_name: Optional[str] = None
    # GENERATED ALWAYS AS (expr): the column's value is COMPUTED from
    # the row's other columns at every live write (the Delta generated-
    # column pattern; classic use: a DATE partition column derived from
    # an event timestamp).  Explicit writes to it are refused.  None =
    # a normal stored column.
    generated: Optional[str] = None

    @property
    def stored_name(self) -> str:
        return self.physical_name or self.name

    @property
    def spark_type(self) -> T.DataType:
        return ddl_type_to_spark(self.type_name)


@dataclass
class TableSpec:
    database: str
    name: str
    columns: List[ColumnSpec]
    primary_key: List[str] = field(default_factory=list)
    partition_keys: List[str] = field(default_factory=list)
    bucket_keys: List[str] = field(default_factory=list)
    num_buckets: Optional[int] = None
    properties: Dict[str, str] = field(default_factory=dict)
    comment: Optional[str] = None
    # CHECK constraints: {name: boolean SQL expr}; violation = expr is
    # FALSE (NULL passes, the SQL-standard CHECK semantics)
    check_constraints: Dict[str, str] = field(default_factory=dict)
    # named version refs (Iceberg tags): {tag: {"seq": N, "created_at":
    # iso}} — resolve to time-travel anchors; stored in the spec so they
    # survive OPTIMIZE/COMPACT/RESTORE like every other table fact (a
    # tag below the compaction floor refuses at read, same as $v)
    tags: Dict[str, dict] = field(default_factory=dict)
    # writable version refs (Iceberg branches): {branch: {"fork_seq": N,
    # "created_at": iso}} — a branch diverges from the main log at its
    # fork seq and accumulates its own statement history in a sibling
    # directory with a branch-local seq space starting at fork_seq + 1
    # (catalog.py "branches" section); stored in the spec like tags so
    # they survive OPTIMIZE and session restarts
    branches: Dict[str, dict] = field(default_factory=dict)

    @property
    def has_primary_key(self) -> bool:
        return bool(self.primary_key)

    @property
    def qualified_name(self) -> str:
        return f"{self.database}.{self.name}"

    def spark_schema(self, physical: bool = False) -> T.StructType:
        """Logical schema by default; ``physical=True`` names fields as
        stored in the parquet files (column mapping)."""
        fields = []
        for col in self.columns:
            metadata = {"comment": col.comment} if col.comment else {}
            fields.append(T.StructField(
                col.stored_name if physical else col.name,
                col.spark_type, col.nullable, metadata,
            ))
        return T.StructType(fields)

    def column(self, name: str) -> ColumnSpec:
        for col in self.columns:
            if col.name == name:
                return col
        raise KeyError(name)

    def to_dict(self) -> dict:
        """JSON-safe spec for warehouse persistence (_spec.json)."""
        from dataclasses import asdict

        return asdict(self)

    @classmethod
    def from_dict(cls, data: dict) -> "TableSpec":
        cols = [ColumnSpec(**c) for c in data.pop("columns")]
        return cls(columns=cols, **data)
