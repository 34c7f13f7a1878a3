"""CREATE TABLE DDL parser.

Spark SQL rejects ``PRIMARY KEY``, ``DISTRIBUTED BY ... INTO n BUCKETS``
and Fluss's ``WITH ('k'='v')`` clauses, so — exactly like the reference,
which intercepts SQL strings before DataFusion sees them
(src/sql/rewriter.rs:19-77) — we parse CREATE TABLE ourselves and register
the result in our catalog.  Grammar mirrored from the reference's DDL
generator ``format_create_table_sql`` (src/catalog/schema.rs:703-782):

    CREATE TABLE [IF NOT EXISTS] [db.]name (
        col TYPE [NOT NULL] [COMMENT '...'],
        ...
        [, PRIMARY KEY (a, b)]
    )
    [COMMENT '...']
    [PARTITIONED BY (a, b)]
    [DISTRIBUTED BY (a, b) INTO n BUCKETS]
    [WITH ('key' = 'value', ...)]
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from fluss_datafusion_spark.catalog.metadata import (
    ColumnSpec,
    TableSpec,
    ddl_type_to_spark,
)
from fluss_datafusion_spark.sql.dialect import parse_qualified_name, strip_quotes

_CREATE_RE = re.compile(r"^\s*CREATE\s+TABLE\s+", re.IGNORECASE)
_CHECK_RE = re.compile(
    r"^\s*(?:CONSTRAINT\s+(`?[\w]+`?)\s+)?CHECK\s*\((.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+(?:INTO|OVERWRITE(?:\s+TABLE)?)\s+"
    r"((?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)",
    re.IGNORECASE,
)


def is_engine_create_table(sql: str) -> bool:
    return bool(_CREATE_RE.match(sql))


def parse_insert_target(sql: str) -> Optional[str]:
    """Return the (unquoted, possibly qualified) INSERT INTO target, or None."""
    match = _INSERT_RE.match(sql)
    if not match:
        return None
    parts = parse_qualified_name(match.group(1))
    return ".".join(parts)


def _split_top_level(text: str, sep: str = ",") -> List[str]:
    """Split on `sep` at paren depth 0, respecting '...' and `...` quoting."""
    parts: List[str] = []
    depth = 0
    current: List[str] = []
    i = 0
    while i < len(text):
        ch = text[i]
        if ch in ("'", "`", '"'):
            quote = ch
            current.append(ch)
            i += 1
            while i < len(text):
                current.append(text[i])
                if text[i] == quote:
                    # '' style escape inside string literals
                    if quote == "'" and i + 1 < len(text) and text[i + 1] == "'":
                        current.append(text[i + 1])
                        i += 2
                        continue
                    i += 1
                    break
                i += 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(current))
            current = []
        else:
            current.append(ch)
        i += 1
    if current:
        parts.append("".join(current))
    return [p.strip() for p in parts if p.strip()]


_STRING_LIT_RE = re.compile(r"'(?:[^']|'')*'")
_LIT_TOKEN_RE = re.compile(r"\x01(\d+)\x01")


def _mask_literals(text: str) -> Tuple[str, List[str]]:
    """Replace every single-quoted string literal with a ``\\x01<i>\\x01``
    placeholder so clause-splitting regexes (WHEN/THEN/WHERE/AND) and
    alias canonicalization can never match or rewrite INSIDE a literal
    (``'src.jpg'`` must not become ``'s.jpg'`` when the source alias is
    ``src``).  Restore with :func:`_unmask_literals` on every extracted
    expression fragment."""
    literals: List[str] = []

    def _stash(m: "re.Match[str]") -> str:
        literals.append(m.group(0))
        return f"\x01{len(literals) - 1}\x01"

    return _STRING_LIT_RE.sub(_stash, text), literals


def _unmask_literals(text: Optional[str], literals: List[str]) -> Optional[str]:
    if text is None or not literals:
        return text
    return _LIT_TOKEN_RE.sub(lambda m: literals[int(m.group(1))], text)


def _find_column_block(sql: str) -> Tuple[str, str, str]:
    """Return (head, column_block, tail) where column_block is the text inside
    the table's top-level parentheses."""
    start = sql.index("(")
    depth = 0
    for i in range(start, len(sql)):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return sql[:start], sql[start + 1 : i], sql[i + 1 :]
    raise ValueError("unbalanced parentheses in CREATE TABLE")


_NOT_NULL_RE = re.compile(r"\bNOT\s+NULL\b", re.IGNORECASE)
_NULL_RE = re.compile(r"\bNULL\b", re.IGNORECASE)
_COMMENT_RE = re.compile(r"\bCOMMENT\s+'((?:[^']|'')*)'", re.IGNORECASE)
_PK_RE = re.compile(r"^\s*PRIMARY\s+KEY\s*\((.*)\)\s*$", re.IGNORECASE | re.DOTALL)
_IDENT = r"(?:`[^`]*`|\"[^\"]*\"|[\w@$]+)"
_TYPE_RE = re.compile(
    r"^\s*(" + _IDENT + r")\s+([A-Za-z]+\s*(?:\(\s*-?\d+\s*(?:,\s*-?\d+\s*)?\))?)",
    re.DOTALL,
)


_GENERATED_RE = re.compile(
    r"\bGENERATED\s+ALWAYS\s+AS\s*\(", re.IGNORECASE
)


def _extract_generated(rest: str):
    """(generation expr | None, rest-with-the-clause-removed).  The
    expression is taken by balanced-paren scan so nested calls and
    commas survive; it is removed from ``rest`` BEFORE the NOT NULL /
    COMMENT scans (an expr mentioning NULL must not flip nullability)."""
    m = _GENERATED_RE.search(rest)
    if not m:
        return None, rest
    depth, i = 1, m.end()
    while i < len(rest) and depth:
        if rest[i] == "(":
            depth += 1
        elif rest[i] == ")":
            depth -= 1
        i += 1
    if depth:
        raise ValueError(
            f"unbalanced parentheses in GENERATED ALWAYS AS: {rest!r}"
        )
    expr = rest[m.end(): i - 1].strip()
    if not expr:
        raise ValueError("empty GENERATED ALWAYS AS expression")
    return expr, rest[: m.start()] + rest[i:]


def _parse_column(text: str) -> ColumnSpec:
    match = _TYPE_RE.match(text)
    if not match:
        raise ValueError(f"cannot parse column definition: {text!r}")
    name = strip_quotes(match.group(1))
    type_name = re.sub(r"\s+", " ", match.group(2).strip())
    rest = text[match.end():]
    generated, rest = _extract_generated(rest)
    nullable = not _NOT_NULL_RE.search(rest)
    comment_match = _COMMENT_RE.search(rest)
    comment = comment_match.group(1).replace("''", "'") if comment_match else None
    return ColumnSpec(
        name=name, type_name=type_name, nullable=nullable, comment=comment,
        generated=generated,
    )


def _parse_name_list(text: str) -> List[str]:
    return [strip_quotes(part) for part in _split_top_level(text)]


_TAIL_COMMENT_RE = re.compile(r"\bCOMMENT\s+'((?:[^']|'')*)'", re.IGNORECASE)
_PARTITIONED_RE = re.compile(r"\bPARTITIONED\s+BY\s*\(([^)]*)\)", re.IGNORECASE)
_DISTRIBUTED_RE = re.compile(
    r"\bDISTRIBUTED\s+BY\s*\(([^)]*)\)(?:\s+INTO\s+(\d+)\s+BUCKETS)?", re.IGNORECASE
)
_WITH_RE = re.compile(r"\bWITH\s*\(", re.IGNORECASE)
_IF_NOT_EXISTS_RE = re.compile(r"\bIF\s+NOT\s+EXISTS\s+", re.IGNORECASE)


def parse_create_table(sql: str, default_database: str = "fluss") -> TableSpec:
    statement = sql.strip().rstrip(";").strip()
    if not is_engine_create_table(statement):
        raise ValueError("not a CREATE TABLE statement")

    head, block, tail = _find_column_block(statement)
    head = _CREATE_RE.sub("", head)
    head = _IF_NOT_EXISTS_RE.sub("", head)
    name_parts = parse_qualified_name(head.strip())
    if len(name_parts) == 2:
        database, table = name_parts
    else:
        database, table = default_database, name_parts[0]

    columns: List[ColumnSpec] = []
    primary_key: List[str] = []
    check_constraints = {}
    for item in _split_top_level(block):
        pk_match = _PK_RE.match(item)
        check_match = _CHECK_RE.match(item)
        if pk_match:
            primary_key = _parse_name_list(pk_match.group(1))
        elif check_match:
            cname = strip_quotes(
                check_match.group(1) or f"check_{len(check_constraints)}"
            )
            check_constraints[cname] = check_match.group(2).strip()
        else:
            columns.append(_parse_column(item))

    # PK columns are implicitly NOT NULL (reference enforces via constraint).
    for col in columns:
        if col.name in primary_key:
            col.nullable = False

    partition_keys: List[str] = []
    bucket_keys: List[str] = []
    num_buckets: Optional[int] = None
    properties = {}
    comment = None

    part_match = _PARTITIONED_RE.search(tail)
    if part_match:
        partition_keys = _parse_name_list(part_match.group(1))
    dist_match = _DISTRIBUTED_RE.search(tail)
    if dist_match:
        bucket_keys = _parse_name_list(dist_match.group(1))
        num_buckets = int(dist_match.group(2)) if dist_match.group(2) else None
    with_match = _WITH_RE.search(tail)
    if with_match:
        depth = 1
        i = with_match.end()
        start = i
        while i < len(tail) and depth:
            if tail[i] == "(":
                depth += 1
            elif tail[i] == ")":
                depth -= 1
            i += 1
        for pair in _split_top_level(tail[start : i - 1]):
            if "=" in pair:
                key, _, value = pair.partition("=")
                properties[strip_quotes(key.strip(), quote="'")] = strip_quotes(
                    value.strip(), quote="'"
                )
    # Table comment: the first COMMENT in the tail that is not inside WITH.
    tail_before_with = tail[: with_match.start()] if with_match else tail
    comment_match = _TAIL_COMMENT_RE.search(tail_before_with)
    if comment_match:
        comment = comment_match.group(1).replace("''", "'")

    spec = TableSpec(
        database=database,
        name=table,
        columns=columns,
        primary_key=primary_key,
        partition_keys=partition_keys,
        bucket_keys=bucket_keys,
        num_buckets=num_buckets,
        properties=properties,
        comment=comment,
        check_constraints=check_constraints,
    )
    _validate(spec)
    return spec


def _validate(spec: TableSpec) -> None:
    names = [c.name for c in spec.columns]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate column names in {spec.qualified_name}")
    for key in spec.primary_key + spec.partition_keys + spec.bucket_keys:
        if key not in names:
            raise ValueError(f"key column {key!r} not in column list of {spec.qualified_name}")
    for col in spec.columns:
        col.spark_type  # raises on unsupported type


_CREATE_DB_RE = re.compile(
    # trailing COMMENT / WITH (...) clauses are tolerated (and ignored) so
    # the statement still routes to the engine catalog instead of silently
    # creating a database in Spark's own catalog
    r"^\s*CREATE\s+(?:DATABASE|SCHEMA)\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"((?:`[^`]*`|\"[^\"]*\"|[\w@$])+)\s*(?:COMMENT\s+'[^']*'\s*)?(?:WITH\s*\(.*\)\s*)?$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_TABLE_RE = re.compile(
    r"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?((?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)\s*$",
    re.IGNORECASE,
)


def parse_create_database(sql: str) -> Optional[str]:
    """Return the database name of a CREATE DATABASE/SCHEMA statement."""
    match = _CREATE_DB_RE.match(sql)
    if not match:
        return None
    return parse_qualified_name(match.group(1))[-1]


def parse_drop_table(sql: str) -> Optional[str]:
    """Return the (possibly qualified) target of a DROP TABLE statement."""
    match = _DROP_TABLE_RE.match(sql)
    if not match:
        return None
    return ".".join(parse_qualified_name(match.group(1)))


_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+((?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)\s+WHERE\s+(.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_PRED_RE = re.compile(
    r"^((?:`[^`]*`|\"[^\"]*\"|[\w@$])+)\s*=\s*('(?:[^']|'')*'|-?\d+(?:\.\d+)?)$"
)


def parse_delete(sql: str):
    """Parse a DELETE statement into (target, key_or_None, pred_or_None),
    or None if not a DELETE.

    ``DELETE FROM t WHERE pk1 = lit [AND pk2 = lit ...]`` parses to the
    point form ``(target, {column: python_literal}, None)`` — the
    single-tombstone path a Fluss upsert writer offers (append even for
    an absent key).  Any other predicate parses to the predicate form
    ``(target, None, predicate_text)`` — resolved against the current
    merged state by ``FlussCatalog.delete_where`` (the reference CLI
    exposes no DELETE at all; both forms exceed it).
    """
    from fluss_datafusion_spark.sql.dialect import strip_quotes

    masked, lits = _mask_literals(sql)
    match = _DELETE_RE.match(masked)
    if not match:
        return None
    target = ".".join(parse_qualified_name(match.group(1)))
    predicate = _unmask_literals(match.group(2).strip(), lits)
    key = {}
    # Split the conjunction on literal-masked text (an ' AND ' inside a
    # string literal must not split), then restore each clause.
    for clause in re.split(r"\s+AND\s+", match.group(2), flags=re.IGNORECASE):
        clause = _unmask_literals(clause, lits)
        pred = _DELETE_PRED_RE.match(clause.strip())
        if not pred:
            return target, None, predicate
        col = strip_quotes(pred.group(1))
        raw = pred.group(2)
        if raw.startswith("'"):
            value = raw[1:-1].replace("''", "'")
        elif "." in raw:
            value = float(raw)
        else:
            value = int(raw)
        if col in key and key[col] != value:
            # A column repeated with a different value (`id = 3 AND
            # id = 4`) is an unsatisfiable conjunction; overwriting
            # key[col] would silently point-delete the LAST value.
            # Fall back to the predicate form so the real WHERE clause
            # is evaluated (matching zero rows) instead.
            return target, None, predicate
        key[col] = value
    # key form AND the raw predicate: the caller point-deletes when the
    # equalities cover exactly the primary key, else predicate-deletes.
    return target, key, predicate


_ALTER_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+((?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)\s+(.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_ADD_RE = re.compile(
    r"^ADD\s+COLUMN\s+((?:`[^`]*`|\"[^\"]*\"|[\w@$])+)\s+(.+?)"
    r"(?:\s+COMMENT\s+'((?:[^']|'')*)')?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_DROP_RE = re.compile(
    r"^DROP\s+COLUMN\s+((?:`[^`]*`|\"[^\"]*\"|[\w@$])+)\s*$", re.IGNORECASE
)
_ALTER_RENAME_RE = re.compile(
    r"^RENAME\s+TO\s+((?:`[^`]*`|\"[^\"]*\"|[\w@$])+)\s*$", re.IGNORECASE
)


def parse_alter_table(sql: str):
    """Parse the supported ALTER TABLE forms into (target, action):

    - ``ALTER TABLE [db.]t ADD COLUMN name TYPE [COMMENT '...']``
      → (target, ("add", ColumnSpec)).  The new column must be nullable
      (rows written before the ALTER read it back as NULL via the
      explicit-schema parquet read — a NOT NULL addition would be
      unsatisfiable for them), so ``NOT NULL`` raises.
    - ``ALTER TABLE [db.]t DROP COLUMN name`` → (target, ("drop", name)).
    - ``ALTER TABLE [db.]t RENAME COLUMN a TO b`` →
      (target, ("rename_column", (a, b))) — column mapping, no rewrite.
    - ``ALTER TABLE [db.]t RENAME TO u`` → (target, ("rename", "u"))
      (same-database rename).
    - ``ALTER TABLE [db.]t ALTER COLUMN c [SET DATA] TYPE t`` →
      (target, ("alter_type", (c, t))) — widening only, no rewrite.

    Returns None when the statement is not an ALTER TABLE (other ALTER
    forms raise, so unsupported DDL fails loudly instead of silently
    reaching Spark SQL, which has no engine tables).  The reference CLI
    has no ALTER at all — this exceeds it the same way DELETE does.
    """
    match = _ALTER_RE.match(sql.strip().rstrip(";"))
    if not match:
        return None
    target = ".".join(parse_qualified_name(match.group(1)))
    body = match.group(2).strip()
    # tags: named version refs (Iceberg's ALTER TABLE ... CREATE TAG)
    ctag = re.match(
        r"^CREATE\s+TAG\s+(`?[\w.-]+`?)"
        r"(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*$",
        body, re.IGNORECASE,
    )
    if ctag:
        seq = int(ctag.group(2)) if ctag.group(2) else None
        return target, ("create_tag", (strip_quotes(ctag.group(1)), seq))
    dtag = re.match(
        r"^DROP\s+TAG\s+(`?[\w.-]+`?)\s*$", body, re.IGNORECASE
    )
    if dtag:
        return target, ("drop_tag", strip_quotes(dtag.group(1)))
    # branches: writable version refs (Iceberg's CREATE BRANCH /
    # fast_forward procedure as ALTER forms)
    cbr = re.match(
        r"^CREATE\s+BRANCH\s+(`?[\w.-]+`?)"
        r"(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*$",
        body, re.IGNORECASE,
    )
    if cbr:
        seq = int(cbr.group(2)) if cbr.group(2) else None
        return target, ("create_branch", (strip_quotes(cbr.group(1)), seq))
    dbr = re.match(
        r"^DROP\s+BRANCH\s+(`?[\w.-]+`?)\s*$", body, re.IGNORECASE
    )
    if dbr:
        return target, ("drop_branch", strip_quotes(dbr.group(1)))
    ffwd = re.match(
        r"^FAST\s+FORWARD\s+(?:TO\s+)?BRANCH\s+(`?[\w.-]+`?)\s*$",
        body, re.IGNORECASE,
    )
    if ffwd:
        return target, ("fast_forward", strip_quotes(ffwd.group(1)))
    cpick = re.match(
        r"^CHERRY\s*[- ]?\s*PICK\s+BRANCH\s+(`?[\w.-]+`?)\s*$",
        body, re.IGNORECASE,
    )
    if cpick:
        return target, ("cherry_pick", strip_quotes(cpick.group(1)))
    exp = re.match(r"^EXPIRE\s+REFS\s*(.*)$", body, re.IGNORECASE | re.DOTALL)
    if exp:
        # optional retention clauses in either order:
        #   [RETAIN LAST n] [OLDER THAN [INTERVAL] 'n' UNIT]
        rest = exp.group(1).strip()
        retain = None
        older = None
        _UNIT_S = {
            "SECOND": 1.0, "MINUTE": 60.0, "HOUR": 3600.0, "DAY": 86400.0,
        }
        while rest:
            m = re.match(r"^RETAIN\s+LAST\s+(\d+)\s*", rest, re.IGNORECASE)
            if m and retain is None:
                retain = int(m.group(1))
                rest = rest[m.end():].strip()
                continue
            # quotes around the count must PAIR: a lone quote (OLDER
            # THAN '5 DAY) is malformed SQL, not a parseable interval
            m = re.match(
                r"^OLDER\s+THAN\s+(?:INTERVAL\s+)?(?:'(\d+)'|(\d+))\s+"
                r"(SECOND|MINUTE|HOUR|DAY)S?\s*",
                rest, re.IGNORECASE,
            )
            if m and older is None:
                count = int(m.group(1) or m.group(2))
                older = count * _UNIT_S[m.group(3).upper()]
                rest = rest[m.end():].strip()
                continue
            raise ValueError(
                "EXPIRE REFS supports '[RETAIN LAST n] [OLDER THAN "
                f"[INTERVAL] n SECOND|MINUTE|HOUR|DAY[S]]': got {body!r}"
            )
        return target, ("expire_refs", (retain, older))
    addc = re.match(
        r"^ADD\s+CONSTRAINT\s+(`?[\w]+`?)\s+CHECK\s*\((.*)\)\s*$",
        body, re.IGNORECASE | re.DOTALL,
    )
    if addc:
        return target, (
            "add_constraint",
            (strip_quotes(addc.group(1)), addc.group(2).strip()),
        )
    dropc = re.match(
        r"^DROP\s+CONSTRAINT\s+(`?[\w]+`?)\s*$", body, re.IGNORECASE
    )
    if dropc:
        return target, ("drop_constraint", strip_quotes(dropc.group(1)))
    add = _ALTER_ADD_RE.match(body)
    if add:
        name = strip_quotes(add.group(1))
        type_text = add.group(2).strip()
        if re.search(r"\bNOT\s+NULL\s*$", type_text, re.IGNORECASE):
            raise ValueError(
                "ADD COLUMN must be nullable: rows written before the ALTER "
                "have no value for it"
            )
        ddl_type_to_spark(type_text)  # validate the type string eagerly
        return target, ("add", ColumnSpec(name=name, type_name=type_text,
                                          nullable=True,
                                          comment=add.group(3)))
    drop = _ALTER_DROP_RE.match(body)
    if drop:
        return target, ("drop", strip_quotes(drop.group(1)))
    rencol = re.match(
        r"^RENAME\s+COLUMN\s+(`?[\w ]+`?|\"[^\"]*\")\s+TO\s+"
        r"(`?[\w ]+`?|\"[^\"]*\")\s*$",
        body, re.IGNORECASE,
    )
    if rencol:
        return target, (
            "rename_column",
            (strip_quotes(rencol.group(1)), strip_quotes(rencol.group(2))),
        )
    altype = re.match(
        r"^ALTER\s+COLUMN\s+(`?[\w]+`?)\s+(?:SET\s+DATA\s+)?TYPE\s+(.+?)\s*$",
        body, re.IGNORECASE,
    )
    if altype:
        type_text = altype.group(2).strip()
        ddl_type_to_spark(type_text)  # validate eagerly
        return target, (
            "alter_type",
            (strip_quotes(altype.group(1)), type_text),
        )
    rename = _ALTER_RENAME_RE.match(body)
    if rename:
        return target, ("rename", strip_quotes(rename.group(1)))
    setp = re.match(
        r"^SET\s+TBLPROPERTIES\s*\(\s*(.+?)\s*\)\s*$",
        body, re.IGNORECASE | re.DOTALL,
    )
    if setp:
        props = {}
        for part in _split_top_level(setp.group(1)):
            kv = re.match(
                r"^\s*'((?:[^']|'')*)'\s*=\s*'((?:[^']|'')*)'\s*$", part
            )
            if not kv:
                raise ValueError(
                    f"SET TBLPROPERTIES expects 'key' = 'value' pairs, "
                    f"got {part.strip()!r}"
                )
            props[kv.group(1).replace("''", "'")] = kv.group(2).replace(
                "''", "'"
            )
        if not props:
            raise ValueError("SET TBLPROPERTIES needs at least one pair")
        return target, ("set_properties", props)
    unsetp = re.match(
        r"^UNSET\s+TBLPROPERTIES\s*(?:\(\s*(.*?)\s*\))?\s*$",
        body, re.IGNORECASE | re.DOTALL,
    )
    if unsetp:
        keys = [
            strip_quotes(k.strip(), quote="'")
            for k in _split_top_level(unsetp.group(1) or "")
            if k.strip()
        ]
        if not keys:
            raise ValueError("UNSET TBLPROPERTIES needs at least one key")
        return target, ("unset_properties", keys)
    raise ValueError(f"unsupported ALTER TABLE form: {body!r}")


_CTAS_HEAD_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>(?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)\s+(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_CTAS_PK_RE = re.compile(r"\bPRIMARY\s+KEY\s*\(([^)]*)\)", re.IGNORECASE)


def parse_ctas(sql: str, default_database: str = "fluss"):
    """Parse ``CREATE TABLE [IF NOT EXISTS] name [PRIMARY KEY (cols)]
    [PARTITIONED BY (...)] [DISTRIBUTED BY (...) INTO n BUCKETS]
    [WITH (...)] AS SELECT ...`` into
    (qualified_name, layout_dict, select_sql, if_not_exists), or None
    when the statement is not a CTAS (a column list means a plain
    CREATE TABLE; CLONE has no AS).  The column schema comes from the
    SELECT; PRIMARY KEY makes the result a PK (upsert) table."""
    masked, lits = _mask_literals(sql.strip().rstrip(";"))
    m = _CTAS_HEAD_RE.match(masked)
    if not m:
        return None
    rest = m.group("rest")
    split = re.search(r"\bAS\s+(?=SELECT\b|WITH\b|\()", rest, re.IGNORECASE)
    if not split:
        return None
    clauses = rest[: split.start()].strip()
    if clauses.startswith("("):
        return None  # explicit column list: plain CREATE TABLE
    layout = {
        "primary_key": [],
        "partition_keys": [],
        "bucket_keys": [],
        "num_buckets": None,
        "properties": {},
    }
    pk = _CTAS_PK_RE.search(clauses)
    if pk:
        layout["primary_key"] = _parse_name_list(pk.group(1))
    part = _PARTITIONED_RE.search(clauses)
    if part:
        layout["partition_keys"] = _parse_name_list(part.group(1))
    dist = _DISTRIBUTED_RE.search(clauses)
    if dist:
        layout["bucket_keys"] = _parse_name_list(dist.group(1))
        layout["num_buckets"] = int(dist.group(2)) if dist.group(2) else None
    withm = _WITH_RE.search(clauses)
    if withm:
        depth, i = 1, withm.end()
        start = i
        while i < len(clauses) and depth:
            if clauses[i] == "(":
                depth += 1
            elif clauses[i] == ")":
                depth -= 1
            i += 1
        for pair in _split_top_level(clauses[start : i - 1]):
            if "=" in pair:
                key, _, value = pair.partition("=")
                layout["properties"][
                    strip_quotes(_unmask_literals(key.strip(), lits), quote="'")
                ] = strip_quotes(
                    _unmask_literals(value.strip(), lits), quote="'"
                )
    name_parts = parse_qualified_name(m.group("name"))
    qualified = (
        ".".join(name_parts)
        if len(name_parts) == 2
        else f"{default_database}.{name_parts[0]}"
    )
    return (
        qualified,
        layout,
        _unmask_literals(rest[split.end() :].strip(), lits),
        bool(m.group("ine")),
    )


_CREATE_VIEW_RE = re.compile(
    r"^\s*CREATE\s+(?P<repl>OR\s+REPLACE\s+)?VIEW\s+"
    r"(?P<name>(?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)\s+AS\s+(?P<select>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_VIEW_RE = re.compile(
    r"^\s*DROP\s+VIEW\s+(?P<ife>IF\s+EXISTS\s+)?"
    r"(?P<name>(?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)\s*$",
    re.IGNORECASE,
)


def parse_create_view(sql: str):
    """``CREATE [OR REPLACE] VIEW name AS SELECT ...`` →
    (name, select_sql, or_replace), or None.  (MATERIALIZED views are
    parsed separately and never reach this.)"""
    match = _CREATE_VIEW_RE.match(sql.strip().rstrip(";"))
    if not match:
        return None
    return (
        ".".join(parse_qualified_name(match.group("name"))),
        match.group("select").strip(),
        bool(match.group("repl")),
    )


def parse_drop_view(sql: str):
    """``DROP VIEW [IF EXISTS] name`` → (name, if_exists), or None."""
    match = _DROP_VIEW_RE.match(sql.strip().rstrip(";"))
    if not match:
        return None
    return (
        ".".join(parse_qualified_name(match.group("name"))),
        bool(match.group("ife")),
    )


_TRUNCATE_RE = re.compile(
    r"^\s*TRUNCATE\s+TABLE\s+((?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)\s*$",
    re.IGNORECASE,
)


def parse_truncate_table(sql: str) -> Optional[str]:
    """Return the target of a TRUNCATE TABLE statement, or None."""
    match = _TRUNCATE_RE.match(sql.strip().rstrip(";"))
    if not match:
        return None
    return ".".join(parse_qualified_name(match.group(1)))


_OPTIMIZE_RE = re.compile(
    r"^\s*OPTIMIZE\s+(?:TABLE\s+)?((?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"(?:\s+(?P<curve>ZORDER|HILBERT)\s+BY\s*\((?P<z>[^)]*)\))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_COMPACT_RE = re.compile(
    r"^\s*COMPACT\s+TABLE\s+((?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)\s*$",
    re.IGNORECASE,
)


def parse_maintenance(sql: str):
    """Parse the lake-maintenance statements into (action, target,
    cluster_cols_or_None, where_or_None, curve):
    ``OPTIMIZE [TABLE] t [WHERE <partition predicate>]
    [ZORDER BY (c1, c2) | HILBERT BY (c1, c2)]`` (small-file
    consolidation + optional space-filling-curve clustering — Morton or
    Hilbert; WHERE scopes the rewrite to matching partition directories
    — the Delta spelling) and ``COMPACT TABLE t`` (collapse history to
    latest images).  Returns None for anything else."""
    from fluss_datafusion_spark.sql.dialect import strip_quotes

    s = sql.strip().rstrip(";")
    match = _OPTIMIZE_RE.match(s)
    if match:
        target = ".".join(parse_qualified_name(match.group(1)))
        cols = None
        if match.group("z"):
            cols = [
                strip_quotes(c.strip()) for c in match.group("z").split(",")
            ]
        where = match.group("where")
        curve = (match.group("curve") or "zorder").lower()
        return (
            "optimize",
            target,
            cols,
            where.strip() if where else None,
            curve,
        )
    match = _COMPACT_RE.match(s)
    if match:
        return ("compact", ".".join(parse_qualified_name(match.group(1))))
    return None


# -- MERGE INTO --------------------------------------------------------------

_MERGE_HEAD_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<target>(?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)"
    r"(?:\s+(?:AS\s+)?(?P<talias>(?!USING\b)[\w@$]+))?"
    r"\s+USING\s+(?P<source>\((?:[^()]|\([^()]*\))*\)|(?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)"
    r"(?:\s+(?:AS\s+)?(?P<salias>(?!ON\b)[\w@$]+))?"
    r"\s+ON\s+(?P<tail>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_WHEN_RE = re.compile(r"\bWHEN\s+(?:NOT\s+)?MATCHED\b", re.IGNORECASE)
_MATCHED_CLAUSE_RE = re.compile(
    r"^WHEN\s+MATCHED\s*(?:AND\s+(?P<cond>.+?))?\s*THEN\s+"
    r"(?:(?P<delete>DELETE)|UPDATE\s+SET\s+(?P<set>.+))\s*$",
    re.IGNORECASE | re.DOTALL,
)
_NOT_MATCHED_CLAUSE_RE = re.compile(
    r"^WHEN\s+NOT\s+MATCHED\s+(?:BY\s+TARGET\s+)?"
    r"(?:AND\s+(?P<cond>.+?)\s+)?THEN\s+INSERT\s+"
    r"(?:(?P<star>\*)|(?:\((?P<cols>[^)]*)\)\s*)?VALUES\s*\((?P<vals>.+)\))\s*$",
    re.IGNORECASE | re.DOTALL,
)
_NOT_MATCHED_SOURCE_CLAUSE_RE = re.compile(
    r"^WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s*"
    r"(?:AND\s+(?P<cond>.+?))?\s*THEN\s+"
    r"(?:(?P<delete>DELETE)|UPDATE\s+SET\s+(?P<set>.+))\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ON_EQ_RE = re.compile(
    r"^([\w@$]+)\.([\w@$]+)\s*=\s*([\w@$]+)\.([\w@$]+)$"
)


def _canon_aliases(text: str, talias: str, salias: str) -> str:
    """Rewrite ``<target_alias>.`` / ``<source_alias>.`` prefixes to the
    canonical ``t.`` / ``s.`` the engine's merge join uses (placeholder
    round-trip so swapped aliases like target AS s cannot collide)."""
    text = re.sub(rf"\b{re.escape(talias)}\.", "\x00T\x00.", text)
    text = re.sub(rf"\b{re.escape(salias)}\.", "\x00S\x00.", text)
    return text.replace("\x00T\x00.", "t.").replace("\x00S\x00.", "s.")


def parse_merge(sql: str):
    """Parse ``MERGE INTO t USING src|(<subquery>) ON t.pk = s.pk WHEN
    MATCHED [AND c] THEN UPDATE SET a=e,...|DELETE ... WHEN NOT MATCHED
    [AND c] THEN INSERT *|[(cols)] VALUES (exprs)`` into a dict:

    ``{"target", "source" (table name or (subquery) text), "on" (key
    column list), "matched" (ordered clause list for
    FlussCatalog.merge_into), "not_matched"}``.

    Conditions and assignment expressions are returned with alias
    prefixes canonicalized to ``t.`` (target) / ``s.`` (source).  The ON
    condition must be a conjunction of ``t.k = s.k`` equalities (the
    primary-key merge a log-structured upsert store supports); anything
    else raises so unsupported merges fail loudly.  Returns None when
    the statement is not a MERGE.
    """
    from fluss_datafusion_spark.sql.dialect import strip_quotes

    s = sql.strip().rstrip(";")
    if not re.match(r"^\s*MERGE\s+INTO\b", s, re.IGNORECASE):
        return None
    # Mask string literals FIRST: every regex below (head split, WHEN
    # split, alias canonicalization) runs on the masked text and cannot
    # mis-split on a WHEN/THEN/AND or alias prefix inside a literal.
    s, _lits = _mask_literals(s)
    match = _MERGE_HEAD_RE.match(s)
    if not match:
        raise ValueError(f"cannot parse MERGE statement: {sql!r}")
    target = ".".join(parse_qualified_name(match.group("target")))
    source = match.group("source").strip()
    talias = match.group("talias") or target.split(".")[-1]
    salias = match.group("salias") or (
        source.split(".")[-1] if not source.startswith("(") else "s"
    )

    tail = match.group("tail")
    first_when = _WHEN_RE.search(tail)
    if not first_when:
        raise ValueError("MERGE needs at least one WHEN clause")
    on_text = tail[: first_when.start()].strip()
    on_cols = []
    for clause in re.split(r"\s+AND\s+", on_text, flags=re.IGNORECASE):
        eq = _ON_EQ_RE.match(clause.strip())
        if not eq:
            raise ValueError(
                f"MERGE ON must be 't.key = s.key' equalities; "
                f"cannot parse {clause.strip()!r}"
            )
        a1, c1, a2, c2 = eq.groups()
        sides = {a1: c1, a2: c2}
        if talias not in sides or salias not in sides or c1 != c2:
            raise ValueError(
                f"MERGE ON clause {clause.strip()!r} must equate the same "
                f"key column across target alias {talias!r} and source "
                f"alias {salias!r}"
            )
        on_cols.append(sides[talias])

    # Split the WHEN clauses at top level.
    starts = [m.start() for m in _WHEN_RE.finditer(tail)]
    pieces = [
        tail[b:e].strip()
        for b, e in zip(starts, starts[1:] + [len(tail)])
    ]
    def _expr(text):
        """Canonicalize aliases then restore masked literals — the order
        matters: canonicalization must never see literal contents."""
        if text is None:
            return None
        return _unmask_literals(_canon_aliases(text, talias, salias), _lits)

    matched_clauses = []
    not_matched = []
    not_matched_by_source = []
    for piece in pieces:
        m = _MATCHED_CLAUSE_RE.match(piece)
        if m:
            cond = _expr(m.group("cond"))
            if m.group("delete"):
                matched_clauses.append(("delete", cond, None))
            else:
                set_text = m.group("set").strip()
                if set_text == "*":
                    matched_clauses.append(("update", cond, None))
                else:
                    assigns = {}
                    for item in _split_top_level(set_text):
                        col, _, expr = item.partition("=")
                        if not expr:
                            raise ValueError(
                                f"cannot parse MERGE SET item {item!r}"
                            )
                        col = strip_quotes(col.strip())
                        col = col.split(".")[-1]  # allow t.col = ...
                        assigns[col] = _expr(expr.strip())
                    matched_clauses.append(("update", cond, assigns))
            continue
        m = _NOT_MATCHED_SOURCE_CLAUSE_RE.match(piece)
        if m:
            cond = _expr(m.group("cond"))
            if m.group("delete"):
                not_matched_by_source.append(("delete", cond, None))
            else:
                assigns = {}
                for item in _split_top_level(m.group("set").strip()):
                    col, _, expr = item.partition("=")
                    if not expr:
                        raise ValueError(
                            f"cannot parse MERGE SET item {item!r}"
                        )
                    col = strip_quotes(col.strip())
                    col = col.split(".")[-1]
                    assigns[col] = _expr(expr.strip())
                not_matched_by_source.append(("update", cond, assigns))
            continue
        m = _NOT_MATCHED_CLAUSE_RE.match(piece)
        if m:
            cond = _expr(m.group("cond"))
            if m.group("star"):
                not_matched.append((cond, None))
            else:
                vals = _split_top_level(m.group("vals"))
                cols_text = m.group("cols")
                if not cols_text:
                    raise ValueError(
                        "MERGE INSERT without a column list must be INSERT *"
                    )
                cols = [
                    strip_quotes(c.strip()) for c in cols_text.split(",")
                ]
                if len(cols) != len(vals):
                    raise ValueError(
                        f"MERGE INSERT: {len(cols)} columns but "
                        f"{len(vals)} values"
                    )
                assigns = {c: _expr(v) for c, v in zip(cols, vals)}
                not_matched.append((cond, assigns))
            continue
        raise ValueError(f"cannot parse MERGE WHEN clause: {piece!r}")
    return {
        "target": target,
        "source": _unmask_literals(source, _lits),
        "on": on_cols,
        "matched": matched_clauses,
        "not_matched": not_matched,
        "not_matched_by_source": not_matched_by_source,
    }


_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+((?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)\s+SET\s+(.+?)"
    r"(?:\s+WHERE\s+(.+?))?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def parse_update(sql: str):
    """Parse ``UPDATE t SET a = expr [, b = expr ...] [WHERE pred]`` into
    (target, {col: sql_expr}, pred_or_None).  Expressions/predicates are
    arbitrary SQL over the table's columns (planned by Catalyst on the
    current merged state).  Returns None for non-UPDATE statements.

    Like DELETE/MERGE this is DML the reference's upsert writer implies
    but its CLI never exposes (src/provider.rs:411-441)."""
    from fluss_datafusion_spark.sql.dialect import strip_quotes

    masked, lits = _mask_literals(sql.strip().rstrip(";"))
    match = _UPDATE_RE.match(masked)
    if not match:
        return None
    target = ".".join(parse_qualified_name(match.group(1)))
    assigns = {}
    # The SET/WHERE split ran on literal-masked text, so a ' WHERE '
    # inside a SET string literal cannot truncate the assignment list.
    for item in _split_top_level(match.group(2)):
        col, _, expr = item.partition("=")
        if not expr:
            raise ValueError(f"cannot parse UPDATE SET item {item!r}")
        assigns[strip_quotes(col.strip())] = _unmask_literals(expr.strip(), lits)
    return target, assigns, _unmask_literals(match.group(3), lits)


_RESTORE_RE = re.compile(
    r"^\s*RESTORE\s+TABLE\s+((?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)\s+TO\s+"
    r"VERSION\s+(?:AS\s+OF\s+)?(\d+)\s*$",
    re.IGNORECASE,
)
_RESTORE_TS_RE = re.compile(
    r"^\s*RESTORE\s+TABLE\s+((?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)\s+TO\s+"
    r"TIMESTAMP\s+(?:AS\s+OF\s+)?'([^']*)'\s*$",
    re.IGNORECASE,
)


def parse_restore(sql: str):
    """Parse ``RESTORE TABLE t TO VERSION [AS OF] n`` into (target, n)
    and ``RESTORE TABLE t TO TIMESTAMP [AS OF] '<ts>'`` into
    (target, ("ts", <string>)), or None for non-RESTORE statements
    (both Delta-RESTORE spellings; pair with the t$v<N> / t$at('ts')
    read-side time travel)."""
    text = sql.strip().rstrip(";")
    match = _RESTORE_RE.match(text)
    if match:
        return ".".join(parse_qualified_name(match.group(1))), int(match.group(2))
    match = _RESTORE_TS_RE.match(text)
    if match:
        return (
            ".".join(parse_qualified_name(match.group(1))),
            ("ts", match.group(2)),
        )
    return None


_CLONE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"((?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)\s+"
    r"(?:(SHALLOW|DEEP)\s+)?CLONE\s+"
    r"((?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)\s*$",
    re.IGNORECASE,
)
_VACUUM_RE = re.compile(
    r"^\s*VACUUM\s+(?:TABLE\s+)?((?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)\s*$",
    re.IGNORECASE,
)


def parse_clone(sql: str):
    """Parse ``CREATE TABLE t2 [SHALLOW|DEEP] CLONE t1`` (Delta-CLONE
    spelling) into (new_table, source_table, deep, if_not_exists), or
    None.  Default is SHALLOW (zero-copy), matching Delta."""
    s = sql.strip().rstrip(";")
    match = _CLONE_RE.match(s)
    if not match:
        return None
    new_name = ".".join(parse_qualified_name(match.group(1)))
    source = ".".join(parse_qualified_name(match.group(3)))
    deep = (match.group(2) or "SHALLOW").upper() == "DEEP"
    if_not_exists = bool(
        re.match(r"^\s*CREATE\s+TABLE\s+IF\s+NOT\s+EXISTS\b", s, re.IGNORECASE)
    )
    return new_name, source, deep, if_not_exists


def parse_vacuum(sql: str) -> Optional[str]:
    """Return the target of ``VACUUM [TABLE] t``, or None."""
    match = _VACUUM_RE.match(sql.strip().rstrip(";"))
    if not match:
        return None
    return ".".join(parse_qualified_name(match.group(1)))


_CREATE_MV_RE = re.compile(
    r"^\s*CREATE\s+MATERIALIZED\s+VIEW\s+"
    r"((?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)\s+AS\s+(.*)$",
    re.IGNORECASE | re.DOTALL,
)
_REFRESH_MV_RE = re.compile(
    r"^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+"
    r"((?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)\s*$",
    re.IGNORECASE,
)


def parse_create_matview(sql: str):
    """Parse ``CREATE MATERIALIZED VIEW name AS SELECT ...`` into
    (name, select_sql), or None."""
    match = _CREATE_MV_RE.match(sql.strip().rstrip(";"))
    if not match:
        return None
    return ".".join(parse_qualified_name(match.group(1))), match.group(2).strip()


def parse_refresh_matview(sql: str) -> Optional[str]:
    """Return the target of ``REFRESH MATERIALIZED VIEW name``, or None."""
    match = _REFRESH_MV_RE.match(sql.strip().rstrip(";"))
    if not match:
        return None
    return ".".join(parse_qualified_name(match.group(1)))


# -- ANALYZE TABLE -----------------------------------------------------------

_ANALYZE_RE = re.compile(
    r"^\s*ANALYZE\s+TABLE\s+(?P<name>(?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)"
    r"\s+COMPUTE\s+STATISTICS"
    r"(?:\s+FOR\s+(?:(?P<all>ALL\s+COLUMNS)|COLUMNS\s+(?P<cols>.+)))?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def parse_analyze(sql: str):
    """Parse ``ANALYZE TABLE t COMPUTE STATISTICS [FOR ALL COLUMNS |
    FOR COLUMNS c1, c2]`` (the Spark/Delta spelling) into
    (target, columns) where columns is None for every column (ALL or
    unqualified) and a list for the explicit form.  Returns None for
    anything else."""
    from fluss_datafusion_spark.sql.dialect import strip_quotes

    match = _ANALYZE_RE.match(sql.strip().rstrip(";"))
    if match is None:
        return None
    target = ".".join(parse_qualified_name(match.group("name")))
    if match.group("cols"):
        cols = [strip_quotes(c.strip()) for c in match.group("cols").split(",")]
        return (target, cols)
    return (target, None)


# -- CREATE TABLE LIKE -------------------------------------------------------

_LIKE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>(?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)\s+LIKE\s+"
    r"(?P<src>(?:`[^`]*`|\"[^\"]*\"|[\w@$.])+)\s*$",
    re.IGNORECASE,
)


def parse_create_like(sql: str):
    """Parse ``CREATE TABLE [IF NOT EXISTS] t LIKE s`` into
    (new_table, source_table, if_not_exists) — copy the full definition
    (columns, PK, layout, properties, constraints), no data.  Returns
    None for anything else."""
    s = sql.strip().rstrip(";")
    match = _LIKE_RE.match(s)
    if not match:
        return None
    return (
        ".".join(parse_qualified_name(match.group("name"))),
        ".".join(parse_qualified_name(match.group("src"))),
        bool(re.match(r"^\s*CREATE\s+TABLE\s+IF\s+NOT\s+EXISTS\b", s, re.IGNORECASE)),
    )
