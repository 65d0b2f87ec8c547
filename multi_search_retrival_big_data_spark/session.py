"""SparkSession factory.

Defaults target the driver harness (local[$SPARK_GRAFT_CPUS], 32 shuffle
partitions) but every knob here is chosen to survive a 1000-executor /
100 TB deployment unchanged:

- AQE on: runtime join-strategy switching, skew-join splitting, and
  partition coalescing replace hand-tuned shuffle counts at scale.
- Arrow on: every pandas-UDF boundary (multimodal decode, model encode)
  moves columnar batches, not pickled rows.
- UTC session timezone: timestamp semantics identical to the DuckDB
  oracle and to any multi-region cluster.
- ANSI off: we want permissive SQL-2003 null/cast semantics matching
  the DuckDB oracle (Spark 4 flips the default to on).
- FAIR scheduler: the reference is a threaded Flask server
  (reference app.py:571 `threaded=True`) multiplexing many small
  queries; FAIR keeps one long scan from starving concurrent serving
  queries. Single-query plans are unaffected (one job at a time is
  one job either way); bench.py's `concurrency` anchor measures the
  multiplexed throughput through per-thread scheduler pools.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def scratch_dir() -> str:
    """Workspace-local scratch root for Spark's shuffle/blockmgr spill
    (spark.local.dir) and for bench-built throwaway corpora.

    Why not /tmp: a long bench run's blockmgr dir vanished mid-run
    under external /tmp cleanup (BENCH_r08: executor
    FileNotFoundException on /tmp/blockmgr-* temp-shuffle files at
    stage 9142, killing the run). The workspace is the one directory
    nothing else reaps; override with SPARK_GRAFT_LOCAL_DIR."""
    root = os.environ.get("SPARK_GRAFT_LOCAL_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".spark_local",
    )
    os.makedirs(root, exist_ok=True)
    return root


def _default_driver_memory() -> str:
    """Default local-mode heap: min(24g, half of system RAM), floored
    at 2g. 24g is the measured sweet spot for long 32-core local[N]
    sessions (see the config comment below), but a blanket -Xmx24g on
    a smaller host/CI container *starts* fine and then gets the
    process OOM-killed under load (r10 advice) — so the default is
    derived from MemTotal and only reaches 24g where the RAM exists.
    SPARK_DRIVER_MEMORY still overrides unconditionally."""
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemTotal:"):
                    total_gib = int(line.split()[1]) / (1024 * 1024)
                    break
            else:
                return "24g"
    except OSError:
        return "24g"
    return f"{max(2, min(24, int(total_gib / 2)))}g"


def get_spark(app_name: str = "msrbd-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.local.dir", scratch_dir())
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.scheduler.mode", "FAIR")
        # local[N] runs driver + all executor tasks in ONE JVM: the old
        # 8g default gave 32 concurrent tasks ~250 MB each plus every
        # accumulated broadcast/codegen/cache block, and long sessions
        # (bench grid, oracle gate) degraded measurably as the heap
        # filled — interleaved A/B at r10: the 10th query of a session
        # ran 1.3s with headroom vs 3.8s at 8g, a composed facade 4.3s
        # vs 21.7s (guide §5: size memory to cores × per-task state).
        # 24g ≈ 0.75 GB/core at the driver's 32 cores — the same
        # per-core sizing a production executor would get; override
        # with SPARK_DRIVER_MEMORY (the driver harness's knob) as
        # before.
        # ...capped by available system RAM (r10 advice): a 24g -Xmx on
        # a 16 GiB CI container starts, then dies to the OOM killer.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", _default_driver_memory()),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
