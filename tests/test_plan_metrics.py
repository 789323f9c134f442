"""Registry-wide plan-shape regression gate (r12 verdict item 4).

PLANS.md is regenerated every round, but until now nothing FAILED if a
query's plan silently gained an Exchange, lost a broadcast, or sprouted
an ArrowPython stage — test_plans.py pins only a handful of queries.
This test recomputes the static {Exchange, BroadcastHashJoin,
SortMergeJoin, Window, ArrowPython, red-flag} counts for every
registered query (via tools/explain_audit.py in a subprocess, so the
session config matches the per-round artifact exactly) and asserts
equality with the committed PLAN_METRICS.json snapshot.

Intended plan changes are declared by re-running
``python tools/explain_audit.py`` and committing the PLAN_METRICS.json
diff alongside the code change — the diff IS the allowlist, reviewable
in history. An undeclared drift fails here with a per-query delta.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPSHOT = os.path.join(REPO, "PLAN_METRICS.json")
SF = "/root/testdata/sf0.001"


def test_registry_plan_metrics_match_snapshot(tmp_path):
    assert os.path.exists(SNAPSHOT), (
        "PLAN_METRICS.json missing — run `python tools/explain_audit.py` "
        "and commit the snapshot"
    )
    with open(SNAPSHOT) as f:
        baseline = json.load(f)

    out_plans = str(tmp_path / "plans_scratch.md")
    out_metrics = str(tmp_path / "metrics.json")
    env = dict(
        os.environ,
        EXPLAIN_PLANS_OUT=out_plans,
        EXPLAIN_METRICS_OUT=out_metrics,
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "explain_audit.py"), SF],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=REPO,
        env=env,
    )
    assert proc.returncode == 0, (proc.stdout + proc.stderr)[-4000:]
    with open(out_metrics) as f:
        current = json.load(f)

    added = sorted(set(current) - set(baseline))
    removed = sorted(set(baseline) - set(current))
    changed = {
        q: {"baseline": baseline[q], "current": current[q]}
        for q in set(baseline) & set(current)
        if baseline[q] != current[q]
    }
    assert not (added or removed or changed), (
        "plan-shape drift vs PLAN_METRICS.json — if INTENDED, re-run "
        "`python tools/explain_audit.py` and commit the new snapshot.\n"
        f"added queries: {added}\nremoved queries: {removed}\n"
        f"changed: {json.dumps(changed, indent=1, sort_keys=True)[:3000]}"
    )
