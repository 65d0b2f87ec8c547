"""Materialize the bench's 10x uniform / skewed stress corpus into a
GIVEN directory for isolated optimization A/Bs (tools/time_query.py
--sf <dir>). Same deterministic generators bench.py uses — this is a
measurement convenience, never a cache: every bench/oracle run still
builds its own throwaway corpora.

    python tools/make_stress_dir.py /root/testdata/sf0.1 /tmp/x10u [--skew]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    src, out = sys.argv[1], sys.argv[2]
    skew = "--skew" in sys.argv[3:]
    import bench
    from multi_search_retrival_big_data_spark.session import get_spark

    spark = get_spark("make-stress-dir")
    build = bench._build_skew_dir if skew else bench._build_stress_dir
    tmp = build(spark, src, bench.STRESS_REPLICATION)
    os.makedirs(out, exist_ok=True)
    for name in os.listdir(tmp):
        s, d = os.path.join(tmp, name), os.path.join(out, name)
        if os.path.islink(s):
            os.path.exists(d) or os.symlink(os.readlink(s), d)
        elif not os.path.exists(d):
            os.rename(s, d)
    print(out)


if __name__ == "__main__":
    main()
