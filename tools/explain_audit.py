"""Dump the formatted physical plan of every registered query.

Writes PLANS.md — one section per ``__spark_entry__.queries()`` entry —
so plan-level facts (pushdown, pruning, broadcast vs sort-merge, partial
aggregation, codegen spans) are reviewable without re-running anything:

    python tools/explain_audit.py [sf_dir] [query ...]

Plans are captured at the default sf0.001 (plan SHAPE is SF-independent
for everything except AQE runtime re-plans, which this pre-execution
explain doesn't include anyway). A summary table up front counts the
red-flag operators (CartesianProduct, BroadcastNestedLoopJoin,
row-at-a-time Python eval) per query — all should be zero outside the
documented mapInPandas operators.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

RED_FLAGS = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")
# ArrowEvalPython / mapInPandas are deliberate (multimodal, block near-dup)

# Plans where a BroadcastNestedLoopJoin is the DESIGN, not a bug: the
# similarity family scores every candidate against a tiny broadcast side
# (query set / centroid set) — an O(n×K) cross with K ≪ n is exactly the
# brute-force-baseline / IVF-coarse-quantization plan. Anything else
# showing a red flag is a regression.
INTENDED = {
    "similarity_topk_cosine": "query side (50 vectors) broadcast × candidates",
    "similarity_ivf_topk": "centroid set (n/stride vectors) broadcast × candidates",
    "similarity_ann_recall": "inherits similarity_topk_cosine's baseline cross",
    "similarity_ivf_recall": "inherits similarity_topk_cosine's baseline cross (exact side) + the IVF centroid broadcast",
    "brand_affinity": "1-row scalar total broadcast × pairs (optimal scalar attach)",
    "brand_rules": "1-row scalar total broadcast × rules (optimal scalar attach)",
    "shard_manifest": "1-row token-grand-total broadcast × 8 shard rows (optimal scalar attach)",
    "pmi_collocations": "1-row (Nt, Nb) totals broadcast × bigram candidates (optimal scalar attach)",
    "events_gapfill": "1-row time-bounds scalar × 5-type list: the in-engine grid constructor (rows = types × hours)",
    "events_gapfill_interp": "same 1-row time-bounds × type-list grid constructor as events_gapfill",
    "corpus_mixture_plan": "1-row budget/used/unsat totals broadcast × the sources table (dozens of rows) per water-filling round",
    "corpus_budget_take": "same water-filling scalar attaches as corpus_mixture_plan (shared _water_fill), feeding the broadcast allocation join",
    "events_lateness_audit": "1-row event-count total broadcast × the 6-bucket histogram, plus the 1-row arrival-id bounds attach feeding the deterministic bucket split (optimal scalar attach)",
    "doc_length_outliers": "1-row Tukey-fence frame (exact distributed q1/q3) broadcast × every doc (optimal scalar attach)",
    "customer_rfm": "1-row min/max/count bounds attach per exact_global_rank call — the deterministic bucket split's input (optimal scalar attach)",
    "key_skew_profile": "1-row global-totals (count/nonnull/distinct) broadcast × the top-10 heavy-hitter rows (optimal scalar attach)",
    "corpus_temperature_sample": "1-row (Σw, Σdocs) totals broadcast × the sources table (dozens of rows) (optimal scalar attach)",
    "orders_benford_audit": "1-row excluded-count scalar broadcast × the 9-digit grid (optimal scalar attach)",
    "part_revenue_abc": "1-row min/max/total bounds attach for exact_global_prefix_sum — the same class as customer_rfm's exact_global_rank bounds (optimal scalar attach)",
    "sequence_shuffle": "1-row (lo, hi, n) bounds attach for exact_global_rank over the shuffle-key prefix — the part_revenue_abc class (optimal scalar attach)",
    "similarity_pq_recall": "exact side is l2_topk's brute-force baseline: held-out query set (50 vectors) broadcast × candidates (same class as similarity_topk_cosine)",
}


def plan_metrics(plan: str) -> dict[str, int]:
    """Static operator counts for one formatted plan — the per-query
    row of the PLANS.md metrics table, and the unit the snapshot gate
    (tests/test_plan_metrics.py) pins registry-wide."""
    return {
        "exchange": plan.count("Exchange"),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "window": plan.count("Window"),
        "arrow": (
            plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
        ),
        "red_flags": sorted(f for f in RED_FLAGS if f in plan),
    }


def main() -> int:
    import os

    from demo_etl_spark.session import get_spark
    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")

    # Plans are captured LAZILY in registry order, with NO up-front
    # warm-up — the same conditions every prior snapshot used. Caveat
    # (r15, observed): an eager session memo executing at DataFrame-
    # construction time materializes the shared scan cache, and a
    # MATERIALIZED InMemoryRelation prints its final AQE subplan
    # (Initial + Final = two extra counted "Exchange" strings) where a
    # lazy one prints one. So when a code change moves the FIRST eager
    # memo earlier in registry order, queries after it drift +2 per
    # cached relation with no real plan change — check the PLANS.md diff
    # before treating such a delta as a regression. (Warming everything
    # up front was tried and is worse: every memoized consumer then
    # prints its memo's full build lineage twice.)
    sections: list[tuple[str, str]] = []
    flags: dict[str, list[str]] = {}
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001 — keep auditing
            plan = f"ERROR: {exc}"
        sections.append((name, plan))
        hits = [f for f in RED_FLAGS if f in plan]
        if hits:
            flags[name] = hits
        print(f"audited {name}" + (f"  !! {flags[name]}" if name in flags else ""))

    # a FILTERED audit must not clobber the full PLANS.md (it did once —
    # a one-query spot check overwrote the 164-section artifact); partial
    # runs go to a scratch file, only the no-filter run owns PLANS.md
    out_path = (
        "/root/repo/PLANS.md" if not only else "/tmp/PLANS_partial.md"
    )
    out_path = os.environ.get("EXPLAIN_PLANS_OUT", out_path)
    if not only:
        # machine-readable metrics snapshot — the committed copy is the
        # baseline tests/test_plan_metrics.py regresses against; an
        # INTENDED plan change re-runs this tool and commits the diff
        import json

        metrics_path = os.environ.get(
            "EXPLAIN_METRICS_OUT", "/root/repo/PLAN_METRICS.json"
        )
        with open(metrics_path, "w") as mf:
            json.dump(
                {name: plan_metrics(plan) for name, plan in sections},
                mf,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {metrics_path}")
    with open(out_path, "w") as f:
        f.write(
            "# Physical plans of every registered query\n\n"
            f"Generated by tools/explain_audit.py at {sf_dir} "
            "(pre-execution `formatted` explain; AQE runtime re-plans not shown).\n\n"
        )
        f.write(f"Red-flag operators {RED_FLAGS}: ")
        unexpected = {k: v for k, v in flags.items() if k not in INTENDED}
        if unexpected:
            f.write(
                "\n" + "".join(f"- **{k}**: {v}\n" for k, v in unexpected.items())
            )
        else:
            f.write("**none found outside the intended set.**\n")
        if any(k in flags for k in INTENDED):
            f.write(
                "\nIntended broadcast-cross plans (small side broadcast "
                "by design):\n" + "".join(
                    f"- {k}: {why}\n"
                    for k, why in INTENDED.items() if k in flags
                )
            )
        # At-a-glance shuffle/join/Python audit per query. Exchange counts
        # are an upper bound on the runtime shuffles (AQE reuses/elides;
        # checkpointed sub-plans hide their internal stages), so read the
        # column as "static plan complexity", compared release-to-release.
        f.write(
            "\n## Plan metrics (static counts per query)\n\n"
            "| query | Exchange | BHJ | SMJ | window | ArrowPython |\n"
            "|---|---|---|---|---|---|\n"
        )
        for name, plan in sections:
            f.write(
                f"| {name} | {plan.count('Exchange')} "
                f"| {plan.count('BroadcastHashJoin')} "
                f"| {plan.count('SortMergeJoin')} "
                f"| {plan.count('Window')} "
                f"| {plan.count('ArrowEvalPython') + plan.count('MapInPandas') + plan.count('FlatMapGroupsInPandas')} |\n"
            )
        for name, plan in sections:
            f.write(f"\n## {name}\n\n```\n{plan}\n```\n")
    print(f"wrote {out_path} ({len(sections)} queries, {len(flags)} flagged)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
