"""Interactive SQL CLI (REPL) + non-interactive ``-e`` mode.

Reference parity (src/cli.rs:32-187, src/main.rs:42-113):
- multi-line buffering until ``;``
- meta-commands ``\\dt`` (list tables), ``\\q`` (quit), ``\\?`` (help)
- persistent history at ``~/.fluss-datafusion-spark/repl_history``
- ``-e "SQL"`` executes one statement and exits
- ``--database`` selects the default database
- empty results print ``OK`` (src/cli.rs:125-127)
- nested (array/struct/map) result columns rendered as JSON text
  (src/cli_display.rs:106-116)

Run: ``python -m fluss_datafusion_spark.cli [-e SQL] [--database db]``
"""

from __future__ import annotations

import argparse
import os
import sys

PROMPT = "fluss> "
CONT_PROMPT = "    -> "
HISTORY_DIR = os.path.expanduser("~/.fluss-datafusion-spark")
HISTORY_FILE = os.path.join(HISTORY_DIR, "repl_history")

HELP_TEXT = """Available commands:
  \\dt        List tables in the current database
  \\d [name]  Describe a table (no name: list tables)
  \\timing    Toggle per-statement wall-clock display
  \\q         Quit
  \\?         Show this help
  SQL statements end with ';' and may span multiple lines.
  Tab completes SQL keywords, meta-commands, and table names.

Supported SQL:
  CREATE TABLE ... (PRIMARY KEY, PARTITIONED BY, DISTRIBUTED BY, WITH)
  INSERT INTO ... VALUES/SELECT (PK tables upsert)
  SELECT ... (full Spark SQL surface)
  SHOW TABLES/DATABASES/CREATE TABLE/PARTITIONS/BUCKETS/OPTIONS, DESCRIBE
  Text metrics as SQL functions: token_count, bpe_token_count,
  quality_score, doc_fingerprint, prefix_fingerprint
"""


def render(df) -> str:
    """Pretty-print a result; nested columns become JSON strings first
    (the reference's terminal display transform)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for field in df.schema.fields:
        if isinstance(field.dataType, (T.ArrayType, T.StructType, T.MapType)):
            df = df.withColumn(field.name, F.to_json(field.name))
    rows = df.limit(1001).collect()
    if not rows:
        return "OK"
    shown = rows[:1000]
    headers = df.columns
    cells = [[_fmt(v) for v in row] for row in shown]
    widths = [
        max(len(h), *(len(r[i]) for r in cells)) if cells else len(h)
        for i, h in enumerate(headers)
    ]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep, "|" + "|".join(f" {h:<{w}} " for h, w in zip(headers, widths)) + "|", sep]
    for row in cells:
        out.append("|" + "|".join(f" {v:<{w}} " for v, w in zip(row, widths)) + "|")
    out.append(sep)
    out.append(f"{len(shown)} row(s)" + (" (truncated at 1000)" if len(rows) > 1000 else ""))
    return "\n".join(out)


def _fmt(value) -> str:
    if value is None:
        return "NULL"
    return str(value)


class CliSession:
    def __init__(self, engine=None, database: str = None, warehouse: str = None):
        if engine is None:
            from fluss_datafusion_spark import EngineSession

            engine = EngineSession(warehouse=warehouse)
        self.engine = engine
        self.timing = False
        if database:
            self.engine.catalog.create_database(database)
            self.engine.catalog.set_default_database(database)

    def execute(self, sql: str) -> str:
        import time

        sql = sql.strip().rstrip(";").strip()
        if not sql:
            return ""
        t0 = time.monotonic()
        try:
            out = render(self.engine.sql(sql))
        except Exception as exc:
            return f"Error: {exc}"
        if self.timing:
            out += f"\nTime: {time.monotonic() - t0:.3f} s"
        return out

    def meta(self, line: str):
        cmd = line.strip()
        if cmd == "\\q":
            return None
        if cmd == "\\?":
            return HELP_TEXT
        if cmd == "\\dt":
            return self.execute("SHOW TABLES")
        if cmd == "\\timing":
            self.timing = not self.timing
            return f"Timing is {'on' if self.timing else 'off'}."
        if cmd == "\\d" or cmd.startswith("\\d "):
            target = cmd[2:].strip()
            if not target:
                return self.execute("SHOW TABLES")
            return self.execute(f"DESCRIBE {target}")
        return f"Unknown command: {cmd}  (try \\?)"

    # keywords offered by tab completion (statement heads + common clause
    # words; table names come from the live catalog)
    _KEYWORDS = (
        "SELECT", "FROM", "WHERE", "GROUP BY", "ORDER BY", "HAVING",
        "LIMIT", "JOIN", "LEFT", "RIGHT", "FULL", "INNER", "CROSS", "ON",
        "UNION", "INTERSECT", "EXCEPT", "WITH", "AS", "AND", "OR", "NOT",
        "IN", "EXISTS", "BETWEEN", "LIKE", "CASE", "WHEN", "THEN", "ELSE",
        "END", "CREATE", "TABLE", "DATABASE", "PRIMARY", "KEY",
        "PARTITIONED", "DISTRIBUTED", "BUCKETS", "INSERT", "INTO",
        "VALUES", "DELETE", "DROP", "DESCRIBE", "SHOW", "TABLES",
        "DATABASES", "PARTITIONS", "OPTIONS", "USE", "SET",
        "ALTER", "ADD", "COLUMN", "RENAME", "TRUNCATE",
    )
    _META = ("\\dt", "\\d", "\\timing", "\\q", "\\?")

    def completions(self, prefix: str) -> list:
        """Candidates for ``prefix``: meta-commands, SQL keywords, and
        table names in the current database (prefix-insensitive case for
        keywords; tables match case-sensitively then case-insensitively)."""
        if prefix.startswith("\\"):
            return [m for m in self._META if m.startswith(prefix)]
        cands = []
        up = prefix.upper()
        cands += [k for k in self._KEYWORDS if k.startswith(up)]
        try:
            tables = self.engine.catalog.list_tables()
        except Exception:
            tables = []
        low = prefix.lower()
        cands += [t for t in tables if t.lower().startswith(low)]
        return cands

    def run(self) -> None:
        try:
            import readline

            os.makedirs(HISTORY_DIR, exist_ok=True)
            try:
                readline.read_history_file(HISTORY_FILE)
            except OSError:
                pass
        except ImportError:
            readline = None

        if readline is not None:
            def _complete(text, state):
                matches = self.completions(text)
                return matches[state] if state < len(matches) else None

            readline.set_completer(_complete)
            # keep backslash inside the completed word so \d… completes
            readline.set_completer_delims(" \t\n;,()")
            readline.parse_and_bind("tab: complete")

        print("fluss-datafusion-spark SQL CLI.  \\? for help, \\q to quit.")
        buffer = []
        while True:
            try:
                line = input(CONT_PROMPT if buffer else PROMPT)
            except (EOFError, KeyboardInterrupt):
                print()
                break
            if not buffer and line.strip().startswith("\\"):
                out = self.meta(line)
                if out is None:
                    break
                print(out)
                continue
            buffer.append(line)
            statement = "\n".join(buffer)
            if statement.rstrip().endswith(";"):
                buffer = []
                print(self.execute(statement))

        if readline is not None:
            try:
                readline.write_history_file(HISTORY_FILE)
            except OSError:
                pass


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="fluss-datafusion-spark SQL CLI")
    parser.add_argument("-e", "--execute", help="execute one SQL statement and exit")
    parser.add_argument("--database", help="default database", default=None)
    parser.add_argument(
        "--testdata", help="register testdata parquet dir as views", default=None
    )
    parser.add_argument(
        "--warehouse",
        help="warehouse directory — tables persist here and are"
        " re-attached on the next run (default: a fresh temp dir)",
        default=None,
    )
    args = parser.parse_args(argv)

    session = CliSession(database=args.database, warehouse=args.warehouse)
    if args.testdata:
        session.engine.load_testdata(args.testdata)
    if args.execute:
        print(session.execute(args.execute))
        return 0
    session.run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
