#!/usr/bin/env python
"""Bench an explicit list of registry queries (the non-headline flagships)
at one SF; prints ONE JSON line like bench.py.

Usage: python tools/flagship_bench.py <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    # External-noise sentinel: 1-min load at PROCESS START, before the
    # SparkSession or warmup generate any load of their own — this is
    # the number that says whether the box was otherwise busy.
    load_start = os.getloadavg()[0]
    from cyclebane_spark.functions import bench_session
    from cyclebane_spark.queries import queries

    names = sys.argv[1:]
    sf_dir = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
    # session config (incl. the pinned default broadcast threshold and its
    # rationale) lives in ONE place: cyclebane_spark.functions.bench_session
    spark = bench_session('cyclebane-spark-flagship-bench')
    spark.sparkContext.setLogLevel('ERROR')

    qs = {n: fn for n, fn in queries().items() if n in names}
    missing = [n for n in names if n not in qs]
    if missing:
        raise SystemExit(f'unknown queries: {missing}')

    # the same consumption action bench.py times (single shared helper so
    # the two benches can never measure different things)
    from cyclebane_spark.functions import checksum_consume as consume

    for _ in range(2):  # steady-state warmup (see bench.py)
        for fn in qs.values():
            consume(fn(spark, sf_dir))

    load_before = os.getloadavg()[0]
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    total = 0.0
    for name in names:
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            consume(qs[name](spark, sf_dir))
            times.append(round(time.perf_counter() - t0, 4))
        timings[name] = min(times)
        runs[name] = times
        total += min(times)

    print(
        json.dumps(
            {
                'metric': 'flagship_query_wall_time',
                'action': 'checksum_all_columns',
                'value': round(total, 4),
                'unit': 'sec',
                'queries': timings,
                'runs': runs,
                'loadavg_1m_start': round(load_start, 2),
                'loadavg_1m_before': round(load_before, 2),
                'loadavg_1m_after': round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == '__main__':
    main()
