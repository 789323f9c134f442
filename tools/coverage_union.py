"""Driver-gate union coverage: which registered queries have EVER held a
seat in a CORRECTNESS_r*.json window, and which are still never-gated.

The driver's correctness gate covers only the first 50 ``queries()``
entries per round, so driver confidence accumulates by ROTATION; this
tool is the bookkeeping for it (the r8 verdict's coverage audit, as a
command):

    python tools/coverage_union.py           # summary + never-gated list
    python tools/coverage_union.py --family  # group never-gated by module
    python tools/coverage_union.py --suggest # mechanical next-window draft
                                             # (rules 1+4 of the standing
                                             # rotation policy: never-gated
                                             # first, then stalest; the
                                             # builder adds rule-2 flagship
                                             # cadence and this round's
                                             # touched-query re-gates)
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import __spark_entry__ as entry

    qs = entry.queries()
    names = list(qs)
    union: set[str] = set()
    per_round: dict[str, set[str]] = {}
    for f in sorted(glob.glob(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CORRECTNESS_r*.json"))):
        seats = set(json.load(open(f)))
        per_round[os.path.basename(f)] = seats
        union |= seats

    gated = [n for n in names if n in union]
    never = [n for n in names if n not in union]
    window = names[:50]
    first_time = [n for n in window if n not in union]

    print(f"registered queries:        {len(names)}")
    print(f"ever driver-gated (union): {len(gated)}")
    print(f"never gated:               {len(never)}")
    print(f"current window first-time seats: {len(first_time)}")
    for fname, seats in per_round.items():
        print(f"  {fname}: {len(seats)} seats")

    if "--suggest" in sys.argv:
        import re

        last: dict[str, int] = {}
        for fname, seats in per_round.items():
            r = int(re.search(r"r(\d+)", fname).group(1))
            for q in seats:
                last[q] = max(last.get(q, 0), r)
        approx = {"customer_analytics_approx", "source_profile_approx"}
        stale = sorted(
            (n for n in names if n in last and n not in approx),
            key=lambda n: (last[n], n),
        )
        draft = never + [n for n in stale if n not in never]
        print("\nsuggested next window (never-gated first, then stalest;")
        print("splice in flagship-cadence and touched-query re-gates):")
        for n in draft[:50]:
            print(f"  {n}  (last gated r{last.get(n, 0) or '-'})")
        return 0

    if "--family" in sys.argv:
        fams: dict[str, list[str]] = {}
        for n in never:
            fn = qs[n]
            mod = getattr(fn, "__module__", "?").rsplit(".", 1)[-1]
            fams.setdefault(mod, []).append(n)
        print("\nnever-gated by module (rotation shopping list):")
        for mod in sorted(fams):
            print(f"  {mod:14s} {', '.join(fams[mod])}")
    else:
        print("\nnever-gated:")
        for n in never:
            mark = " <- IN CURRENT WINDOW" if n in window else ""
            print(f"  {n}{mark}")
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # `| head` closing stdout is fine
        raise SystemExit(0)
