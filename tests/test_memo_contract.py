"""Memo-warmer contract (r14 verdict item 7, made executable).

The declared rule for ``io.register_memo_warmer`` is that a memo may only
be built in the untimed warm-up stage when SEVERAL registered queries
consume it — a single-consumer memo is that query's own work and warming
it would just relabel query cost as warm-up (bench accounting gaming).
Until now the rule lived in docstrings; this test enforces it
mechanically: every ``_cached_*`` accessor that a ``_warm_*`` function
warms must have >= 2 call sites outside (a) its own definition, (b) any
warmer body, and (c) test/tool code. Calls from another ``_cached_*``
accessor count as one site (that accessor has consumers of its own,
which this same test checks).
"""

from __future__ import annotations

import ast
import os
from collections import defaultdict

OPERATOR_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "demo_etl_spark",
)


def _module_sources() -> dict[str, str]:
    out = {}
    for root, _dirs, files in os.walk(OPERATOR_ROOT):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                with open(p) as fh:
                    out[p] = fh.read()
    return out


def _called_names(node: ast.AST) -> set[str]:
    names = set()
    for sub in ast.walk(node):
        if isinstance(sub, ast.Call):
            fn = sub.func
            if isinstance(fn, ast.Name):
                names.add(fn.id)
            elif isinstance(fn, ast.Attribute):
                names.add(fn.attr)
    return names


def test_every_warmed_memo_has_at_least_two_consumers():
    warmed: set[str] = set()  # _cached_* names invoked from a warmer
    consumers: dict[str, set[str]] = defaultdict(set)  # name -> call sites
    # name -> call sites of ANY function with that name (for one level of
    # wrapper propagation: a registered builder like build_simhash is both
    # a consumer seat and the accessor other seats go through)
    callers_of: dict[str, set[str]] = defaultdict(set)
    direct_caller_names: dict[str, set[str]] = defaultdict(set)

    for path, src in _module_sources().items():
        tree = ast.parse(src)
        # top-level function defs only (operator modules are flat)
        for node in tree.body:
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            called = _called_names(node)
            cached_called = {n for n in called if n.startswith("_cached_")}
            if node.name.startswith("_warm_"):
                warmed |= cached_called
                continue  # warmer bodies are not consumers
            site = f"{os.path.basename(path)}:{node.name}"
            for n in called:
                callers_of[n].add(site)
            for n in cached_called:
                if n == node.name:
                    continue  # the accessor's own recursion/def
                consumers[n].add(site)
                direct_caller_names[n].add(node.name)

    assert warmed, "no warmed memos found — warmer scan is broken"
    offenders = {}
    for n in sorted(warmed):
        sites = set(consumers.get(n, set()))
        # one level of propagation: seats consuming through a wrapper
        # (e.g. method_agreement -> build_simhash -> _cached_simhash_pairs)
        for wrapper in direct_caller_names.get(n, set()):
            sites |= callers_of.get(wrapper, set())
        if len(sites) < 2:
            offenders[n] = sorted(sites)
    assert not offenders, (
        "memo(s) warmed in the untimed stage with < 2 registered consumers "
        f"(single-consumer memos must build in-query): {offenders}"
    )
