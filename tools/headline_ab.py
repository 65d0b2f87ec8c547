"""Cold-JVM timing of the 14 headline anchors for interleaved A/Bs
(VERDICT r10 item 1: the 8g-vs-24g driver-memory A/B, and any other
whole-process config A/B). One invocation = one fresh JVM = one pass
over the headline set in bench order (warm-up + N timed runs each,
bench.py's .count() action); prints ONE JSON line. Interleave
invocations with different env (SPARK_DRIVER_MEMORY / SPARK_GRAFT_CPUS)
to cancel ambient drift.

    SPARK_DRIVER_MEMORY=8g python tools/headline_ab.py [--runs 2]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    runs = 2
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as se
    from bench import HEADLINE_SUMMARY
    from multi_search_retrival_big_data_spark.session import get_spark

    spark = get_spark("headline-ab")
    qs = se.queries()
    out: dict[str, dict] = {}
    for name in HEADLINE_SUMMARY:
        fn = qs[name]
        fn(spark, sf_dir).count()  # warm-up (builds index tables)
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(round(time.perf_counter() - t0, 4))
        out[name] = {
            "med": round(statistics.median(samples), 4),
            "min": min(samples),
            "max": max(samples),
        }
    print(
        json.dumps(
            {
                "driver_memory": os.environ.get("SPARK_DRIVER_MEMORY", "(default)"),
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
                "runs": runs,
                "total_med": round(sum(v["med"] for v in out.values()), 3),
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
