"""QUALIFY clause rewrite (string-level).

Spark SQL has no QUALIFY clause (Snowflake / DuckDB / BigQuery do; the
reference's DataFusion dialect also lacks it — every unrewritten
statement goes straight to the engine, src/cli.rs:116-122).  We add it
with the same mechanism the reference uses for SHOW commands
(src/sql/rewriter.rs:19-77): rewrite the statement as a string, never
touching engine plan IR.

    SELECT [DISTINCT] <list> FROM ... [WHERE ...] [GROUP BY ...]
        [HAVING ...] QUALIFY <pred> [ORDER BY ...] [LIMIT ...]

becomes

    SELECT [DISTINCT] * EXCEPT (__fluss_qualify__) FROM (
        SELECT <list>, (<pred>) AS __fluss_qualify__ FROM ...
    ) WHERE __fluss_qualify__ [ORDER BY ...] [LIMIT ...]

Design notes:

- The predicate is injected INTO the inner select list, so it may use
  window functions over any input column (selected or not) and may
  reference select-list aliases — Spark resolves the latter via lateral
  column aliases (SPARK-27561), including aliases of window expressions.
- Evaluation order matches Snowflake's documented clause order
  (… → window → QUALIFY → DISTINCT → ORDER BY → LIMIT): when the head
  is SELECT DISTINCT, the DISTINCT moves to the OUTER select so the
  filter runs on pre-distinct rows.
- QUALIFY inside subqueries / CTE bodies is handled by recursing into
  the innermost parenthesized block that contains one.
- A QUALIFY in a branch of a top-level set operation (UNION/INTERSECT/
  EXCEPT/MINUS between unparenthesized SELECTs) is ambiguous at string
  level and raises; parenthesize the branch instead.
- All scanning is literal-aware: a positional mask blanks quoted
  strings/identifiers first, so ``'no QUALIFY here'`` never triggers.
"""

from __future__ import annotations

import re

QUALIFY_FLAG = "__fluss_qualify__"

_QUALIFY_RE = re.compile(r"\bQUALIFY\b", re.IGNORECASE)
_SELECT_RE = re.compile(r"\bSELECT\b", re.IGNORECASE)
_DISTINCT_RE = re.compile(r"^\s*(DISTINCT|ALL)\b", re.IGNORECASE)
_FROM_RE = re.compile(r"\bFROM\b", re.IGNORECASE)
_TAIL_RE = re.compile(r"\b(?:ORDER\s+BY|LIMIT|OFFSET)\b", re.IGNORECASE)
# A set-op keyword is only a set op when a SELECT (or parenthesized
# query) follows — `SELECT * EXCEPT (c)` is Spark's column-exclusion
# syntax, not the set operation.
_SET_OP_RE = re.compile(
    r"\b(?:UNION|INTERSECT|EXCEPT|MINUS)\b(?:\s+(?:ALL|DISTINCT))?\s*(?=SELECT\b|\()",
    re.IGNORECASE,
)


def _mask_positional(sql: str) -> str:
    """Return a same-length copy with the contents of '...' / `...` /
    "..." literals blanked to spaces (delimiters kept), so regex scans
    and paren-depth tracking never react to quoted text while every
    match position maps 1:1 onto the original string."""
    out = list(sql)
    i = 0
    n = len(sql)
    while i < n:
        ch = sql[i]
        if ch in ("'", "`", '"'):
            quote = ch
            i += 1
            while i < n:
                if sql[i] == quote:
                    # '' / `` style escaped quote inside the literal
                    if i + 1 < n and sql[i + 1] == quote:
                        out[i] = " "
                        out[i + 1] = " "
                        i += 2
                        continue
                    break
                out[i] = " "
                i += 1
        i += 1
    return "".join(out)


def _depths(masked: str) -> list:
    """Paren depth at each character position (depth of the char itself:
    an opening paren is at its OUTER depth, its contents one deeper)."""
    depths = []
    depth = 0
    for ch in masked:
        if ch == "(":
            depths.append(depth)
            depth += 1
        elif ch == ")":
            depth -= 1
            depths.append(depth)
        else:
            depths.append(depth)
    return depths


def has_qualify(sql: str) -> bool:
    return _QUALIFY_RE.search(_mask_positional(sql)) is not None


def _first_at_depth0(regex, masked: str, depths: list, start: int = 0):
    for m in regex.finditer(masked, start):
        if depths[m.start()] == 0:
            return m
    return None


def rewrite_qualify(sql: str) -> str:
    """Rewrite every QUALIFY clause in ``sql`` (outer query and nested
    subqueries); statements without one are returned unchanged."""
    # Innermost-first: repeatedly rewrite one parenthesized block that
    # contains a QUALIFY, until only a possible depth-0 one remains.
    for _ in range(64):  # bound: #subqueries per statement
        masked = _mask_positional(sql)
        depths = _depths(masked)
        m = _QUALIFY_RE.search(masked)
        if m is None:
            return sql
        if depths[m.start()] == 0:
            return _rewrite_depth0(sql, masked, depths)
        # Find the innermost paren pair enclosing this QUALIFY and
        # recurse on its contents.
        target_depth = depths[m.start()] - 1
        open_pos = masked.rfind("(", 0, m.start())
        while open_pos >= 0 and depths[open_pos] != target_depth:
            open_pos = masked.rfind("(", 0, open_pos)
        close_pos = open_pos + 1
        while close_pos < len(masked) and not (
            masked[close_pos] == ")" and depths[close_pos] == target_depth
        ):
            close_pos += 1
        inner = rewrite_qualify(sql[open_pos + 1 : close_pos])
        sql = sql[: open_pos + 1] + inner + sql[close_pos:]
    raise ValueError("QUALIFY rewrite did not converge (too many nested subqueries)")


def _rewrite_depth0(sql: str, masked: str, depths: list) -> str:
    qm = _first_at_depth0(_QUALIFY_RE, masked, depths)
    sel = _first_at_depth0(_SELECT_RE, masked, depths)
    if sel is None or sel.start() > qm.start():
        raise ValueError("QUALIFY without a preceding SELECT")
    set_op = _first_at_depth0(_SET_OP_RE, masked, depths)
    # `SELECT * EXCEPT (c)` / `t.* EXCEPT (c)` is Spark's column-exclusion
    # syntax: an EXCEPT whose previous non-space char is `*` is not a set op.
    while set_op is not None and masked[: set_op.start()].rstrip().endswith("*"):
        set_op = _first_at_depth0(_SET_OP_RE, masked, depths, set_op.end())
    if set_op is not None:
        raise ValueError(
            "QUALIFY in a branch of a top-level set operation is not "
            "supported; parenthesize the branch"
        )

    prefix = sql[: sel.start()]  # e.g. a WITH ... CTE list
    list_start = sel.end()
    distinct = ""
    dm = _DISTINCT_RE.match(masked[list_start:])
    if dm and dm.group(1).upper() == "DISTINCT":
        distinct = "DISTINCT "
        list_start += dm.end()
    elif dm:  # ALL — the default; drop it
        list_start += dm.end()

    fm = _first_at_depth0(_FROM_RE, masked, depths, list_start)
    if fm is not None and fm.start() < qm.start():
        select_list = sql[list_start : fm.start()].strip()
        middle = sql[fm.start() : qm.start()].rstrip()
    else:
        select_list = sql[list_start : qm.start()].strip()
        middle = ""

    tm = _first_at_depth0(_TAIL_RE, masked, depths, qm.end())
    pred_end = tm.start() if tm is not None else len(sql)
    pred = sql[qm.end() : pred_end].strip()
    tail = sql[pred_end:].rstrip()
    if not pred:
        raise ValueError("QUALIFY requires a predicate")

    inner = f"SELECT {select_list}, ({pred}) AS {QUALIFY_FLAG} {middle}"
    out = (
        f"{prefix}SELECT {distinct}* EXCEPT ({QUALIFY_FLAG}) "
        f"FROM ({inner}) WHERE {QUALIFY_FLAG}"
    )
    if tail:
        out += " " + tail
    return out
