"""Property test: the full DML state machine vs a dict-model oracle.

Hypothesis drives random sequences of INSERT / point DELETE / predicate
DELETE / UPDATE / RESTORE / compact against one engine PK table and a
plain-dict model applying the documented semantics (upsert last-wins,
tombstones, restore-as-new-statement, compaction floor).  After every
sequence the merged table state must equal the model, a time-travel
read at a random recorded anchor must equal that anchor's snapshot,
and restoring below the compaction floor must refuse.  This pins the
interaction space (e.g. restore-past-a-restore, delete-then-reinsert,
update-after-restore) that example-based tests can't enumerate —
VERDICT r4 item 8.
"""

import os
import tempfile

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from fluss_datafusion_spark import EngineSession

_STATE = {}


def _engine(spark):
    if "e" not in _STATE:
        wh = os.path.join(tempfile.mkdtemp(prefix="dml_prop_"), "wh")
        e = EngineSession(spark=spark, warehouse=wh)
        e.sql(
            "CREATE TABLE dmlp (k BIGINT NOT NULL, v BIGINT,"
            " PRIMARY KEY (k))"
        )
        _STATE["e"] = e
    return _STATE["e"]


_keys = st.integers(min_value=0, max_value=6)
_vals = st.integers(min_value=-50, max_value=50)

_op = st.one_of(
    st.tuples(
        st.just("ins"),
        st.lists(st.tuples(_keys, _vals), min_size=1, max_size=4),
    ),
    st.tuples(st.just("del"), _keys),
    st.tuples(st.just("delw"), _vals),  # DELETE ... WHERE v < x
    st.tuples(st.just("upd"), st.tuples(_keys, _vals)),  # v = v + d WHERE k >= t
    st.tuples(st.just("restore"), st.integers(min_value=0, max_value=10**6)),
    st.tuples(st.just("compact"), st.just(None)),
)


@settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=7), data=st.data())
def test_dml_state_machine_matches_dict_model(spark, ops, data):
    e = _engine(spark)
    e.catalog.truncate_table("dmlp")  # resets __seq__ and the floor

    model = {}
    floor = 0
    # (seq, snapshot) after every statement; seq 0 = empty table
    history = [(0, {})]

    def record():
        history.append((e.catalog.current_seq("dmlp"), dict(model)))

    for op, arg in ops:
        if op == "ins":
            values = ", ".join(f"({k}, {v})" for k, v in arg)
            e.sql(f"INSERT INTO dmlp VALUES {values}")
            for k, v in arg:  # within-batch last write wins
                model[k] = v
            record()
        elif op == "del":
            e.sql(f"DELETE FROM dmlp WHERE k = {arg}")
            model.pop(arg, None)
            record()
        elif op == "delw":
            e.sql(f"DELETE FROM dmlp WHERE v < {arg}")
            model = {k: v for k, v in model.items() if not (v < arg)}
            record()
        elif op == "upd":
            thr, delta = arg
            e.sql(f"UPDATE dmlp SET v = v + {delta} WHERE k >= {thr}")
            model = {
                k: (v + delta if k >= thr else v) for k, v in model.items()
            }
            record()
        elif op == "restore":
            seq, snap = history[arg % len(history)]
            if seq < floor:
                with pytest.raises(ValueError):
                    e.catalog.restore_table("dmlp", seq)
                # refused: no statement happened, model unchanged
            else:
                e.catalog.restore_table("dmlp", seq)
                model = dict(snap)
                record()
        elif op == "compact":
            e.catalog.compact("dmlp")
            floor = e.catalog.current_seq("dmlp")

    got = {r.k: r.v for r in e.catalog.read("dmlp").collect()}
    assert got == model, (ops, got, model)

    # time travel to a random recorded anchor at or above the floor
    valid = [(s, snap) for s, snap in history if s >= floor]
    seq, snap = valid[data.draw(st.integers(0, len(valid) - 1), label="anchor")]
    past = {r.k: r.v for r in e.catalog.read("dmlp", as_of_seq=seq).collect()}
    assert past == snap, (ops, seq, past, snap)


def _engine_pair(spark):
    """Two EngineSessions (independent catalogs + seq counters) over ONE
    warehouse — the optimistic-commit concurrency surface."""
    if "pair" not in _STATE:
        wh = os.path.join(tempfile.mkdtemp(prefix="dml_prop_cc_"), "wh")
        e1 = EngineSession(spark=spark, warehouse=wh)
        e1.sql(
            "CREATE TABLE dmlc (k BIGINT NOT NULL, v BIGINT,"
            " PRIMARY KEY (k))"
        )
        e2 = EngineSession(spark=spark, warehouse=wh)
        _STATE["pair"] = (e1, e2)
    return _STATE["pair"]


_cc_op = st.one_of(
    st.tuples(
        st.just("ins"),
        st.lists(st.tuples(_keys, _vals), min_size=1, max_size=3),
    ),
    st.tuples(st.just("del"), _keys),
    st.tuples(st.just("upd"), st.tuples(_keys, _vals)),
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=st.lists(st.tuples(st.booleans(), _cc_op), min_size=1, max_size=6)
)
def test_dml_interleaved_sessions_match_dict_model(spark, ops):
    """VERDICT r5 #2 done-criteria: two sessions interleave
    INSERT/UPDATE/DELETE on one table.  The commit protocol serializes
    them — no lost rows, strictly monotone duplicate-free seq history,
    and the final state equals the dict model applied in issue order."""
    e1, e2 = _engine_pair(spark)
    e1.catalog.truncate_table("dmlc")
    # TRUNCATE is a maintenance op (exclusive access by contract) — both
    # sessions observe it; within the example the counters then drift
    # apart naturally as statements interleave, exercising the CAS retry
    e2.catalog._seq.pop("fluss.dmlc", None)
    model = {}
    writing = 0  # statements that stamp >= 1 row into the log
    for use_second, (op, arg) in ops:
        e = e2 if use_second else e1
        if op == "ins":
            values = ", ".join(f"({k}, {v})" for k, v in arg)
            e.sql(f"INSERT INTO dmlc VALUES {values}")
            for k, v in arg:
                model[k] = v
            writing += 1
        elif op == "del":
            e.sql(f"DELETE FROM dmlc WHERE k = {arg}")
            model.pop(arg, None)
            writing += 1  # point delete appends a tombstone regardless
        elif op == "upd":
            thr, delta = arg
            e.sql(f"UPDATE dmlc SET v = v + {delta} WHERE k >= {thr}")
            if any(k >= thr for k in model):
                writing += 1  # zero-match UPDATE reserves a seq, writes 0
            model = {
                k: (v + delta if k >= thr else v) for k, v in model.items()
            }
    for e in (e1, e2):
        got = {r.k: r.v for r in e.catalog.read("dmlc").collect()}
        assert got == model, (ops, got, model)
    seqs = [
        r["__seq__"]
        for r in e1.sql(
            "SELECT DISTINCT __seq__ FROM dmlc$history ORDER BY __seq__"
        ).collect()
    ]
    assert seqs == sorted(set(seqs)), (ops, seqs)
    assert len(seqs) == writing, (
        "one distinct seq per row-writing statement",
        ops,
        seqs,
    )
    assert max(seqs, default=0) <= len(ops), "seqs bounded by statements"


def _engine_branch(spark):
    if "br" not in _STATE:
        wh = os.path.join(tempfile.mkdtemp(prefix="dml_prop_br_"), "wh")
        e = EngineSession(spark=spark, warehouse=wh)
        e.sql(
            "CREATE TABLE dmlb (k BIGINT NOT NULL, v BIGINT,"
            " PRIMARY KEY (k))"
        )
        _STATE["br"] = e
    return _STATE["br"]


_br_op = st.one_of(
    st.tuples(
        st.just("main_ins"),
        st.lists(st.tuples(_keys, _vals), min_size=1, max_size=3),
    ),
    st.tuples(st.just("main_del"), _keys),
    st.tuples(
        st.just("br_ins"),
        st.lists(st.tuples(_keys, _vals), min_size=1, max_size=3),
    ),
    st.tuples(st.just("br_del"), _keys),
    st.tuples(st.just("br_delw"), _vals),  # DELETE ... WHERE v < x
    st.tuples(st.just("br_upd"), st.tuples(_keys, _vals)),
    st.tuples(st.just("ff"), st.just(None)),
    st.tuples(st.just("cp"), st.just(None)),
    st.tuples(st.just("rebranch"), st.just(None)),
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_br_op, min_size=1, max_size=6))
# VERDICT r10 item 1 counterexample, pinned so the machine can't green
# by luck: a branch point-DELETE of an ABSENT key must still record its
# tombstone (blind append), so a later main INSERT of that key makes
# cherry-pick refuse (present-vs-absent divergence).  Before the fix the
# session routed branch point-DELETEs through delete_where, which
# tombstones only MATCHING keys — the statement was silently lost and
# the cherry-pick published.
@example(ops=[("br_del", 0), ("main_ins", [(0, 0)]), ("cp", None)])
# The fast-forward face of the same seam: the lost tombstone also made
# the branch look write-free, so FF would re-anchor instead of refuse.
@example(ops=[("br_del", 0), ("main_ins", [(0, 0)]), ("ff", None)])
# r11 empty-delta cherry-pick: a zero-match predicate delete advances
# the branch head without touching a key; cp on diverged main must
# publish (no contested keys) with an EMPTY restamp, and the branch
# must continue cleanly from the new anchor.
@example(ops=[
    ("br_delw", -50), ("main_ins", [(1, 1)]), ("cp", None),
    ("br_ins", [(2, 2)]), ("ff", None),
])
def test_branch_state_machine_matches_dict_models(spark, ops):
    """Branch semantics as a two-model state machine: main ops mutate
    only the main model, branch ops only the branch model (two-way
    isolation at every step), FAST FORWARD publishes iff main has not
    diverged from the fork (else ConcurrentWriteConflict and BOTH
    states are unchanged), and drop+recreate re-forks the branch at the
    current main head.  Pins the interaction space — publish after
    delete-then-reinsert, diverge-then-rebranch-then-publish, repeated
    publications — that the example tests can't enumerate."""
    from fluss_datafusion_spark.catalog.catalog import (
        ConcurrentWriteConflict,
    )

    e = _engine_branch(spark)
    e.catalog.truncate_table("dmlb")  # also drops any existing branch
    e.sql("ALTER TABLE dmlb CREATE BRANCH b")

    main = {}
    branch = {}
    branch_writes = 0   # branch statements since the current fork
    main_diverged = 0   # main statements since the current fork
    main_touched = set()    # keys main actually WROTE since the fork
    branch_touched = set()  # keys the branch actually WROTE since it

    for op, arg in ops:
        if op == "main_ins":
            values = ", ".join(f"({k}, {v})" for k, v in arg)
            e.sql(f"INSERT INTO dmlb VALUES {values}")
            for k, v in arg:
                main[k] = v
                main_touched.add(k)
            main_diverged += 1
        elif op == "main_del":
            e.sql(f"DELETE FROM dmlb WHERE k = {arg}")
            # a PK-equality DELETE records its tombstone even for an
            # absent key ("recorded, not validated" — catalog.delete),
            # so the key counts as WRITTEN for conflict detection
            main_touched.add(arg)
            main.pop(arg, None)
            main_diverged += 1
        elif op == "br_ins":
            values = ", ".join(f"({k}, {v})" for k, v in arg)
            e.sql(f"INSERT INTO dmlb$branch('b') VALUES {values}")
            for k, v in arg:
                branch[k] = v
                branch_touched.add(k)
            branch_writes += 1
        elif op == "br_del":
            e.sql(f"DELETE FROM dmlb$branch('b') WHERE k = {arg}")
            branch_touched.add(arg)  # tombstone recorded even if absent
            branch.pop(arg, None)
            branch_writes += 1
        elif op == "br_delw":
            # predicate form: tombstones only MATCHING keys (evaluated
            # against the branch overlay).  A zero-match delete still
            # RECORDS a commit — the branch head advances, so FF/CP
            # treat the branch as written-to — but touches no key, and
            # its cherry-pick restamp is an EMPTY delta (r11: published
            # with files_published accounting, no empty part file).
            e.sql(f"DELETE FROM dmlb$branch('b') WHERE v < {arg}")
            matching = {k for k, v in branch.items() if v < arg}
            branch_touched |= matching
            for k in matching:
                del branch[k]
            branch_writes += 1
        elif op == "br_upd":
            thr, delta = arg
            e.sql(
                f"UPDATE dmlb$branch('b') SET v = v + {delta}"
                f" WHERE k >= {thr}"
            )
            branch_touched |= {k for k in branch if k >= thr}
            branch = {
                k: (v + delta if k >= thr else v)
                for k, v in branch.items()
            }
            branch_writes += 1
        elif op == "ff":
            if branch_writes and main_diverged:
                with pytest.raises(ConcurrentWriteConflict):
                    e.sql("ALTER TABLE dmlb FAST FORWARD BRANCH b")
                # refused: both states unchanged
            else:
                e.sql("ALTER TABLE dmlb FAST FORWARD BRANCH b")
                if branch_writes:
                    main = dict(branch)
                else:
                    # r9 (ADVICE r8): publishing an EMPTY branch
                    # re-anchors its fork at the current main head —
                    # the overlay follows today's base, divergence ends
                    branch = dict(main)
                main_diverged = 0
                branch_writes = 0
                main_touched = set()
                branch_touched = set()
        elif op == "cp":
            # r10: CHERRY PICK refuses only on contested keys whose
            # VALUES genuinely diverge (absence-aware); value-equal
            # contested keys — retracted writes, deleted-on-both —
            # publish.  On publish, branch statements re-stamp onto
            # main's head: branch-written keys take the branch-final
            # state, everything else keeps main's current state.
            contested = main_touched & branch_touched
            diverged_keys = {
                k for k in contested
                if (k in main) != (k in branch)
                or (k in main and main[k] != branch[k])
            }
            if branch_writes and diverged_keys:
                with pytest.raises(ConcurrentWriteConflict):
                    e.sql("ALTER TABLE dmlb CHERRY PICK BRANCH b")
                # refused: both states unchanged
            else:
                e.sql("ALTER TABLE dmlb CHERRY PICK BRANCH b")
                if branch_writes:
                    for k in branch_touched:
                        if k in branch:
                            main[k] = branch[k]
                        else:
                            main.pop(k, None)
                branch = dict(main)
                main_diverged = 0
                branch_writes = 0
                main_touched = set()
                branch_touched = set()
        elif op == "rebranch":
            e.sql("ALTER TABLE dmlb DROP BRANCH b")
            e.sql("ALTER TABLE dmlb CREATE BRANCH b")
            branch = dict(main)
            branch_writes = 0
            main_diverged = 0
            main_touched = set()
            branch_touched = set()

    got_main = {r.k: r.v for r in e.catalog.read("dmlb").collect()}
    assert got_main == main, (ops, got_main, main)
    got_branch = {
        r.k: r.v for r in e.catalog.read_branch("dmlb", "b").collect()
    }
    assert got_branch == branch, (ops, got_branch, branch)


def _engine_meta(spark):
    if "meta" not in _STATE:
        wh = os.path.join(tempfile.mkdtemp(prefix="dml_prop_meta_"), "wh")
        _STATE["meta"] = EngineSession(spark=spark, warehouse=wh)
    return _STATE["meta"]


_mkeys = st.integers(min_value=0, max_value=5)
_mvals = st.one_of(st.none(), st.integers(min_value=-9, max_value=9))

_meta_op = st.one_of(
    st.tuples(
        st.just("ins"),
        st.lists(st.tuples(_mkeys, _mvals), min_size=1, max_size=3),
    ),
    st.tuples(st.just("del"), _mkeys),
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.lists(st.tuples(_mkeys, _mvals), min_size=0, max_size=5),
    ops=st.lists(_meta_op, min_size=0, max_size=5),
)
# the r11 non-retraction rules' corner cases, pinned:
@example(seed=[(0, 5)], ops=[("ins", [(0, -5)])])        # min retract+re-establish
@example(seed=[(0, 5)], ops=[("ins", [(0, 9)])])         # max re-establish above
@example(seed=[(0, 5), (1, 7)], ops=[("del", 1)])        # delete the max holder
@example(seed=[(0, 5)], ops=[("del", 0)])                 # delete the only row
@example(seed=[(0, None), (1, 3)], ops=[("ins", [(1, None)])])  # NULLs
@example(seed=[], ops=[("ins", [(2, 4)])])                # empty fork base
# r12 sum/avg ledger corners: upsert-to-NULL retracts a value from the
# sum AND a unit from the nonnull count; tombstone of a NULL-valued key
# must adjust neither
@example(seed=[(0, 5), (1, 7)], ops=[("ins", [(0, None)])])
@example(seed=[(0, None), (1, 2)], ops=[("del", 0)])
def test_branch_metadata_fastpath_matches_scan(spark, seed, ops):
    """r11 (VERDICT r10 item 4 guard; r12 adds sum/avg): whatever mix
    of branch inserts / upserts / tombstones lands on a compacted fork,
    the count/min/max/sum/avg a statement returns — fast path OR
    fallback — must equal the real merge-on-read branch scan.
    Randomized keys/values drive extremum retraction, re-establishment,
    NULL columns, fork-absent deletes, and empty fork bases through the
    manifest-bounds arithmetic, and the same churn through the
    harvested-sums ledger (sum retraction via the probe's old
    values)."""
    e = _engine_meta(spark)
    if e.catalog.has_table("mprop"):
        e.sql("DROP TABLE mprop")
    e.sql(
        "CREATE TABLE mprop (k BIGINT NOT NULL, x BIGINT, PRIMARY KEY (k))"
    )
    model = {}
    if seed:
        vals = ", ".join(
            f"({k}, {'NULL' if v is None else v})" for k, v in seed
        )
        e.sql(f"INSERT INTO mprop VALUES {vals}")
        for k, v in seed:
            model[k] = v
    e.catalog.compact("mprop")  # floor = fork: fast path eligible
    e.sql("ALTER TABLE mprop CREATE BRANCH b")
    for op, arg in ops:
        if op == "ins":
            vals = ", ".join(
                f"({k}, {'NULL' if v is None else v})" for k, v in arg
            )
            e.sql(f"INSERT INTO mprop$branch('b') VALUES {vals}")
            for k, v in arg:
                model[k] = v
        else:
            e.sql(f"DELETE FROM mprop$branch('b') WHERE k = {arg}")
            model.pop(arg, None)
    got = e.sql(
        "SELECT count(*) AS n, min(x) AS mn, max(x) AS mx,"
        " sum(x) AS sx, avg(x) AS ax"
        " FROM mprop$branch('b')"
    ).collect()[0]
    xs = [v for v in model.values() if v is not None]
    assert got.n == len(model), (seed, ops, got)
    assert got.mn == (min(xs) if xs else None), (seed, ops, got)
    assert got.mx == (max(xs) if xs else None), (seed, ops, got)
    assert got.sx == (sum(xs) if xs else None), (seed, ops, got)
    if xs:
        assert got.ax == pytest.approx(sum(xs) / len(xs), rel=1e-12), (
            seed, ops, got,
        )
    else:
        assert got.ax is None, (seed, ops, got)


def _engine_branch_pair(spark):
    if "brpair" not in _STATE:
        wh = os.path.join(tempfile.mkdtemp(prefix="dml_prop_brx_"), "wh")
        e1 = EngineSession(spark=spark, warehouse=wh)
        e1.sql(
            "CREATE TABLE dmlx (k BIGINT NOT NULL, v BIGINT,"
            " PRIMARY KEY (k))"
        )
        e2 = EngineSession(spark=spark, warehouse=wh)
        _STATE["brpair"] = (e1, e2)
    return _STATE["brpair"]


_brx_op = st.one_of(
    st.tuples(
        st.just("main_ins"),
        st.lists(st.tuples(_keys, _vals), min_size=1, max_size=2),
    ),
    st.tuples(
        st.just("br_ins"),
        st.lists(st.tuples(_keys, _vals), min_size=1, max_size=2),
    ),
    st.tuples(st.just("br_del"), _keys),
    st.tuples(st.just("ff"), st.just(None)),
    st.tuples(st.just("cp"), st.just(None)),
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=st.lists(
        st.tuples(st.booleans(), _brx_op), min_size=1, max_size=5
    )
)
def test_branch_dml_interleaved_sessions_match_dict_models(spark, ops):
    """r11 (ROADMAP candidate): TWO sessions over one warehouse
    interleave branch DML and publication.  The r10 spec-CAS machine
    covers ref DDL; this one drives the branch DATA paths cross-session
    — branch writes from either session land in one branch seq space,
    isolation holds both ways, and FF/CP outcomes follow the same
    dict models as the single-session machine regardless of which
    session issues each statement."""
    from fluss_datafusion_spark.catalog.catalog import (
        ConcurrentWriteConflict,
    )

    e1, e2 = _engine_branch_pair(spark)
    e1.catalog.truncate_table("dmlx")
    e2.catalog._seq.pop("fluss.dmlx", None)
    e1.sql("ALTER TABLE dmlx CREATE BRANCH b")

    main = {}
    branch = {}
    branch_writes = 0
    main_diverged = 0
    main_touched = set()
    branch_touched = set()

    for use_second, (op, arg) in ops:
        e = e2 if use_second else e1
        if op == "main_ins":
            values = ", ".join(f"({k}, {v})" for k, v in arg)
            e.sql(f"INSERT INTO dmlx VALUES {values}")
            for k, v in arg:
                main[k] = v
                main_touched.add(k)
            main_diverged += 1
        elif op == "br_ins":
            values = ", ".join(f"({k}, {v})" for k, v in arg)
            e.sql(f"INSERT INTO dmlx$branch('b') VALUES {values}")
            for k, v in arg:
                branch[k] = v
                branch_touched.add(k)
            branch_writes += 1
        elif op == "br_del":
            e.sql(f"DELETE FROM dmlx$branch('b') WHERE k = {arg}")
            branch_touched.add(arg)  # blind tombstone, either session
            branch.pop(arg, None)
            branch_writes += 1
        elif op == "ff":
            if branch_writes and main_diverged:
                with pytest.raises(ConcurrentWriteConflict):
                    e.sql("ALTER TABLE dmlx FAST FORWARD BRANCH b")
            else:
                e.sql("ALTER TABLE dmlx FAST FORWARD BRANCH b")
                if branch_writes:
                    main = dict(branch)
                else:
                    branch = dict(main)
                main_diverged = branch_writes = 0
                main_touched = set()
                branch_touched = set()
        elif op == "cp":
            contested = main_touched & branch_touched
            diverged_keys = {
                k for k in contested
                if (k in main) != (k in branch)
                or (k in main and main[k] != branch[k])
            }
            if branch_writes and diverged_keys:
                with pytest.raises(ConcurrentWriteConflict):
                    e.sql("ALTER TABLE dmlx CHERRY PICK BRANCH b")
            else:
                e.sql("ALTER TABLE dmlx CHERRY PICK BRANCH b")
                if branch_writes:
                    for k in branch_touched:
                        if k in branch:
                            main[k] = branch[k]
                        else:
                            main.pop(k, None)
                branch = dict(main)
                main_diverged = branch_writes = 0
                main_touched = set()
                branch_touched = set()

    for e in (e1, e2):
        got_main = {r.k: r.v for r in e.catalog.read("dmlx").collect()}
        assert got_main == main, (ops, got_main, main)
        got_branch = {
            r.k: r.v
            for r in e.catalog.read_branch("dmlx", "b").collect()
        }
        assert got_branch == branch, (ops, got_branch, branch)
