#!/usr/bin/env python
"""Dump ``explain('formatted')`` for registry queries to files.

Usage: python tools/dump_plan.py <out_dir> <suffix> <query> [<query> ...]
Writes ``<out_dir>/<query>_<suffix>.txt`` (suffix: before/after). Env:
SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) — the relations the plan
binds to; SPARK_GRAFT_CPUS as usual.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)
    from cyclebane_spark.functions import bench_session
    from cyclebane_spark.queries import queries

    sf_dir = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
    spark = bench_session('cyclebane-spark-dump-plan')
    spark.sparkContext.setLogLevel('ERROR')
    qs = queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain('formatted')
        path = os.path.join(out_dir, f'{name}_{suffix}.txt')
        with open(path, 'w') as f:
            f.write(buf.getvalue())
        print(f'wrote {path}')
    spark.stop()


if __name__ == '__main__':
    main()
