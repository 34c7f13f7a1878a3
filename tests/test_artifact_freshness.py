"""Artifact-freshness gate (VERDICT r9 item 4): the committed
CORRECTNESS_SELF.json and PLANS.md must postdate the last code commit
touching ``fluss_datafusion_spark/``.  Three consecutive rounds saw a
product commit land after the artifact regeneration; this automates the
rule instead of relying on discipline.

"Fresh" means the artifact records the commit it was generated at
(``generated_at_commit``) and the last package-touching commit is an
ancestor of (or equal to) that commit.  A dirty working tree at
generation time also fails — the artifact then corresponds to no
commit at all.

Escape hatch for mid-development full-suite runs:
``SPARK_GRAFT_SKIP_FRESHNESS=1`` (never set in driver runs).
"""

import json
import os
import re
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git(*args):
    out = subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, timeout=15
    )
    return out.returncode, out.stdout.strip()


def _last_code_commit():
    rc, head = _git("rev-parse", "HEAD")
    if rc != 0:
        pytest.skip("not a git repository")
    rc, commit = _git(
        "log", "-1", "--format=%H", "--", "fluss_datafusion_spark"
    )
    if rc != 0 or not commit:
        pytest.skip("no package-touching commit found")
    return commit


def _assert_fresh(artifact_commit, label):
    last_code = _last_code_commit()
    if artifact_commit == last_code:
        return
    rc, _ = _git("merge-base", "--is-ancestor", last_code, artifact_commit)
    assert rc == 0, (
        f"{label} was generated at {artifact_commit[:12]} but the last "
        f"code commit touching fluss_datafusion_spark/ is "
        f"{last_code[:12]}, which is NOT an ancestor of it — regenerate "
        f"the artifact (tools/check_correctness.py --json "
        f"CORRECTNESS_SELF.json / tools/explain_audit.py) after the "
        f"final code commit"
    )


def _skip_if_opted_out():
    if os.environ.get("SPARK_GRAFT_SKIP_FRESHNESS"):
        pytest.skip("freshness gate disabled via SPARK_GRAFT_SKIP_FRESHNESS")


def test_correctness_self_postdates_last_code_commit():
    _skip_if_opted_out()
    path = os.path.join(REPO, "CORRECTNESS_SELF.json")
    if not os.path.isfile(path):
        pytest.skip("no CORRECTNESS_SELF.json committed yet")
    with open(path) as fh:
        data = json.load(fh)
    commit = data.get("generated_at_commit")
    assert commit, (
        "CORRECTNESS_SELF.json carries no generated_at_commit — "
        "regenerate it with tools/check_correctness.py"
    )
    assert not data.get("generated_dirty"), (
        "CORRECTNESS_SELF.json was generated from a DIRTY working tree; "
        "commit the package changes first, then regenerate"
    )
    _assert_fresh(commit, "CORRECTNESS_SELF.json")


def test_plans_postdates_last_code_commit():
    _skip_if_opted_out()
    path = os.path.join(REPO, "PLANS.md")
    if not os.path.isfile(path):
        pytest.skip("no PLANS.md committed yet")
    with open(path) as fh:
        head = fh.read(4096)
    m = re.search(r"generated_at_commit:\s*([0-9a-f]{40})(\s*\(dirty\))?", head)
    assert m, (
        "PLANS.md carries no generated_at_commit stamp — regenerate it "
        "with tools/explain_audit.py"
    )
    assert not m.group(2), (
        "PLANS.md was generated from a DIRTY working tree; commit the "
        "package changes first, then regenerate"
    )
    _assert_fresh(m.group(1), "PLANS.md")
