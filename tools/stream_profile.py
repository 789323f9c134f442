"""Per-drain breakdown of the streaming seats' fixed cost (r14 verdict
item 5).

Usage:
    python tools/stream_profile.py SF_DIR [--cpus N] [--reps N]
        [--parts 8,4,2] [--queries a,b,...]

For each streaming seat and each candidate drain partition count, times
the full build (source staging + schema probe + availableNow drain +
sink read), and separately reports the StreamingQuery's own progress
metrics from its recentProgress (batch count, addBatch/getBatch/
walCommit/stateOperators durations) so the floor can be attributed to
file-source listing vs state store vs query machinery.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STREAM_QUERIES = [
    "streaming_daily_rollup",
    "streaming_session",
    "streaming_user_totals",
    "streaming_dedup",
    "streaming_purchase_clicks",
    "streaming_enriched_rollup",
    "streaming_quality_gate",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--parts", default="8")
    ap.add_argument("--queries", default=",".join(STREAM_QUERIES))
    args = ap.parse_args()

    from demo_etl_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("stream_profile", cpus=args.cpus,
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = [n for n in args.queries.split(",") if n]

    # warm the Python worker pool + scan cache once so rep 1 is honest
    spark.range(1).count()
    (
        spark.range(args.cpus).repartition(args.cpus)
        .mapInPandas(lambda it: it, "id long")
        .write.mode("overwrite").format("noop").save()
    )

    results: dict = {}
    for parts in [p for p in args.parts.split(",") if p]:
        os.environ["DEMO_ETL_STREAM_SHUFFLE"] = parts
        for name in names:
            best = None
            for _ in range(args.reps):
                # count active streams before/after to find our query
                t0 = time.perf_counter()
                df = qs[name](spark, args.sf_dir)
                t_build = time.perf_counter() - t0
                t0 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                t_act = time.perf_counter() - t0
                tot = t_build + t_act
                if best is None or tot < best[0]:
                    best = (tot, t_build, t_act)
            results[f"{name}@{parts}"] = {
                "total_s": round(best[0], 3),
                "drain_s": round(best[1], 3),
                "sink_read_s": round(best[2], 3),
            }
            print(f"parts={parts} {name}: total={best[0]:.3f}s "
                  f"(drain {best[1]:.3f} + sink read {best[2]:.3f})",
                  flush=True)
    os.environ.pop("DEMO_ETL_STREAM_SHUFFLE", None)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
