"""Isolated per-query timing + plan capture (optimization-round harness).

Usage:
    python tools/qtime.py SF_DIR QUERY [QUERY...] [--reps N] [--explain DIR]
        [--no-warm] [--cpus N]

Mirrors bench.py's methodology for a SUBSET of queries: same session
config, same scan-cache + memo warm-up (reported separately), same noop
sink, queries timed with cleared operator memos between reps so every
sample is a full computation. ``--explain DIR`` writes each query's
``.explain("formatted")`` text to DIR/<query>.txt (captured on the warm
session, before the timed reps).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", default=None)
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from demo_etl_spark.session import get_spark
    from demo_etl_spark.io import (
        clear_operator_memos,
        load_star,
        warm_operator_memos,
    )
    import __spark_entry__ as entrymod

    spark = get_spark("qtime", cpus=args.cpus, shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    missing = [q for q in args.queries if q not in qs]
    if missing:
        sys.exit(f"unknown queries: {missing}")

    spark.range(1).count()
    t0 = time.perf_counter()
    for df in load_star(spark, args.sf_dir).values():
        df.count()
    (
        spark.range(args.cpus).repartition(args.cpus)
        .mapInPandas(lambda it: it, "id long")
        .write.mode("overwrite").format("noop").save()
    )
    if not args.no_warm:
        warm_operator_memos(spark, args.sf_dir)
    print(f"warm-up {time.perf_counter() - t0:.2f}s", flush=True)

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        for name in args.queries:
            df = qs[name](spark, args.sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(txt)
            print(f"explain -> {args.explain}/{name}.txt", flush=True)

    for rep in range(args.reps):
        if rep > 0:
            clear_operator_memos()
            t0 = time.perf_counter()
            if not args.no_warm:
                warm_operator_memos(spark, args.sf_dir)
            print(f"re-warm {time.perf_counter() - t0:.2f}s", flush=True)
        for name in args.queries:
            spark.sparkContext.setJobDescription(f"qtime: {name}")
            t0 = time.perf_counter()
            qs[name](spark, args.sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            t = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            print(f"[{rep + 1}] {name} {t:.3f}s", flush=True)


if __name__ == "__main__":
    main()
