"""Isolated query timing + plan capture for optimization work.

    python tools/time_query.py [--sf DIR] [--runs N] [--plan-dir DIR] \
        [--suffix TAG] name ...

Per guide §1.4 the timed action is the NOOP SINK (computes every
column of every row, no sink cost, full plan in the SQL tab) — unlike
bench.py's contract .count() action, so numbers here are comparable
only to other time_query.py runs. Warm-up runs once (builds index
tables so the timed region is the query, not ingest), then `--runs`
timed runs; prints min/med/max. With --plan-dir the post-warmup
`.explain("formatted")` is written to <plan-dir>/<name>_<suffix>.txt.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from multi_search_retrival_big_data_spark.queries import load_registry
    from multi_search_retrival_big_data_spark.session import get_spark

    spark = get_spark("time-query")
    reg = load_registry()
    for name in args.names:
        fn = reg[name].fn
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        df = fn(spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = os.path.join(args.plan_dir, f"{name}_{args.suffix}.txt")
            with open(out, "w") as fh:
                fh.write(plan)
        times = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"timed[{i}]: {name}")
            t0 = time.monotonic()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            times.append(time.monotonic() - t0)
        times.sort()
        print(
            f"{name}: med={statistics.median(times):.3f}s "
            f"min={times[0]:.3f} max={times[-1]:.3f} runs={args.runs}",
            flush=True,
        )


if __name__ == "__main__":
    main()
