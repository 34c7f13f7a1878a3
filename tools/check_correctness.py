"""Local mirror of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its DuckDB oracle side-by-side,
compare row count + column names + values (order-insensitive).

Usage: python tools/check_correctness.py [--json OUT] [sf_dir] [query ...]

With ``--json OUT`` the per-query results are also written as a JSON
object mirroring the driver's CORRECTNESS_r{N}.json shape, so the full
corpus (core + extended) has a committed hard-signal artifact even
though the driver only checks the first 50 registered entries.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402


def canon(rows, columns):
    """Name-sorted columns, then sorted rows, values normalized."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm(value):
        if value is None:
            return None
        if isinstance(value, float):
            if math.isnan(value):
                return "NaN"
            # collapse -0.0 / 0.0 and fold float32 noise
            return round(value, 9) + 0.0
        if hasattr(value, "isoformat"):
            return value.isoformat()
        if isinstance(value, (list, tuple)):
            return tuple(norm(v) for v in value)
        return value

    def sort_key(row):
        return tuple((v is None, str(type(v)), str(v)) for v in row)

    data = sorted(
        (tuple(norm(row[i]) for i in order) for row in rows), key=sort_key
    )
    return [columns[i] for i in order], data


def _git_state(repo=None):
    """(HEAD commit hash, dirty flag for the package dir) — None/True
    when git is unavailable, so a stamp is never silently wrong."""
    import subprocess

    repo = repo or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=repo, capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
        status = subprocess.run(
            ["git", "status", "--porcelain", "--", "fluss_datafusion_spark"],
            cwd=repo, capture_output=True, text=True, timeout=10,
        )
        dirty = bool(status.stdout.strip()) or status.returncode != 0
    except Exception:
        return None, True
    return head, dirty


def main():
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entry_mod
    from fluss_datafusion_spark.session import build_spark

    spark = build_spark(app_name="check-correctness")

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")

    # Core (driver-visible) + extended (pytest-only) registries: the
    # local gate checks the full corpus, not just the driver's window.
    from fluss_datafusion_spark import corpus

    core_names = set(entry_mod.queries())
    queries = {**entry_mod.queries(), **corpus.EXTRA_QUERIES}
    oracles = {**entry_mod.oracle_sql(), **corpus.EXTRA_ORACLES}
    failures = []
    results = {}
    for name in sorted(queries):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            # Mirror the driver's limitation exactly: its pandas-based
            # canonicalizer cannot sort/hash list-valued cells, so any
            # core-window result with an array/map/struct column is an
            # ERR row in CORRECTNESS_r{N}.json (r3: ns_sim_ann_* —
            # TypeError: unhashable type: 'list').  Fail it HERE first.
            if name in core_names:
                bad = [
                    f.name
                    for f in sdf.schema.fields
                    if f.dataType.typeName() in ("array", "map", "struct")
                ]
                if bad:
                    raise TypeError(
                        f"core-window entry emits non-scalar column(s) {bad}; "
                        "the driver's canonicalizer cannot hash these — "
                        "serialize to string (concat_ws/to_json) on both sides"
                    )
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append(name)
            results[name] = {"err": f"spark: {exc}"}
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            results[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(spark_rows), "oracle_rows": None,
                "err": None, "note": "rows-only (no SQL oracle by design)",
            }
            print(f"ROWS  {name}: {len(spark_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = list(rel.columns)
            duck_rows = rel.fetchall()
        except Exception as exc:
            failures.append(name)
            results[name] = {"err": f"duckdb: {exc}"}
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue

        sc, sv = canon(spark_rows, spark_cols)
        dc, dv = canon(duck_rows, duck_cols)
        status = []
        if sc != dc:
            status.append(f"columns differ: spark={sc} duck={dc}")
        if len(sv) != len(dv):
            status.append(f"row count differs: spark={len(sv)} duck={len(dv)}")
        elif sc == dc and sv != dv:
            n_bad = sum(1 for a, b in zip(sv, dv) if a != b)
            example = next(((a, b) for a, b in zip(sv, dv) if a != b), None)
            status.append(f"{n_bad}/{len(sv)} rows differ; first: spark={example[0]} duck={example[1]}")
        results[name] = {
            "rows_match": len(sv) == len(dv),
            "schema_match": sc == dc,
            "hash_match": sv == dv and sc == dc,
            "spark_rows": len(sv),
            "oracle_rows": len(dv),
            "err": "; ".join(status) or None,
        }
        if status:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(status)}")
        else:
            print(f"OK    {name}: {len(sv)} rows [{time.time()-t0:.1f}s]")

    if json_out:
        # stamp the git state this run corresponds to: the artifact-
        # freshness gate (tests/test_artifact_freshness.py) fails when
        # a committed SELF predates the last code commit touching the
        # package — the r7/r8/r9 artifact-lag pattern, automated away
        commit, dirty = _git_state()
        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "generated_at_commit": commit,
                    "generated_dirty": dirty,
                    "results": results,
                },
                fh,
                indent=1,
            )
        print(f"wrote {json_out} ({len(results)} queries)")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {sorted(set(failures))}")
        sys.exit(1)
    print("all queries match")
    spark.stop()


if __name__ == "__main__":
    main()
