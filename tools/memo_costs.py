"""Per-warmer cost table for the untimed memo stage (r14 verdict item 7).

Usage:
    python tools/memo_costs.py SF_DIR [--cpus N]

Times each registered memo warmer individually (in registration order,
memos cleared first), twice: the first pass from cold, the second after
clear_operator_memos() — the second pass is what every bench pass after
the first pays. Warmers share upstream builds (e.g. dedup's pair sets
read the shingle index), so attribution is order-dependent within a
module; the table reports the marginal cost in the declared order, which
is exactly how bench.py pays it.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if "--cpus" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])

    from demo_etl_spark.session import get_spark
    from demo_etl_spark import io as dio
    import __spark_entry__  # noqa: F401 — registers every warmer

    spark = get_spark("memo_costs", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    for df in dio.load_star(spark, sf_dir).values():
        df.count()
    (
        spark.range(cpus).repartition(cpus)
        .mapInPandas(lambda it: it, "id long")
        .write.mode("overwrite").format("noop").save()
    )

    rows = []
    for pass_no in (1, 2):
        dio.clear_operator_memos()
        for fn in dio._MEMO_WARMERS:
            mod = fn.__module__.rsplit(".", 1)[-1]
            t0 = time.perf_counter()
            fn(spark, sf_dir)
            t = time.perf_counter() - t0
            rows.append((pass_no, mod, round(t, 3)))
            print(f"[pass {pass_no}] {mod}: {t:.3f}s", flush=True)
    print("\n| # | module warmer | pass 1 (cold) s | pass 2 (re-warm) s |")
    print("|---|---|---|---|")
    p1 = [(m, t) for p, m, t in rows if p == 1]
    p2 = [t for p, _m, t in rows if p == 2]
    for i, (m, t1) in enumerate(p1):
        t2 = p2[i] if i < len(p2) else "-"
        print(f"| {i + 1} | {m} | {t1} | {t2} |")
    print(f"| | TOTAL | {round(sum(t for _, t in p1), 3)} "
          f"| {round(sum(p2), 3)} |")


if __name__ == "__main__":
    main()
