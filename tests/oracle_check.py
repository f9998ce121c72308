#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` side-by-side on the
same parquet tables (default sf0.001; pass a dir or set SPARK_GRAFT_SF_DIR)
and compares row count, sorted column names, and cell values
(order-insensitive, floats to 1e-9 relative tolerance with exactness
reported). Exit code 0 iff every query with an oracle matches.

Usage: python tests/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    'region nation customer supplier part orders lineitem events documents embeddings'
).split()


def _canon_cell(v):
    import datetime

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, (np.bool_,)):
        v = bool(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon_cell(x) for x in v)
    return v


def _kind(dtype) -> str:
    k = dtype.kind
    if k in 'iu':
        return f'int{dtype.itemsize * 8}'
    if k == 'f':
        return 'float'
    if k == 'b':
        return 'bool'
    if k == 'M':
        return 'ts'
    return 'obj'


def canon(pdf):
    """sorted-columns, sorted-rows canonical form: (cols, kinds, rows)."""
    cols = sorted(pdf.columns)
    kinds = [f'{c}:{_kind(pdf[c].dtype)}' for c in cols]
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)]
    return cols, kinds, sorted(rows, key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))


def cells_equal(a, b):
    if a is None and b is None:
        return True, True
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True, True
        tol = 1e-9 * max(abs(a), abs(b), 1.0)
        return abs(a - b) <= tol, False
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        oks = [cells_equal(x, y) for x, y in zip(a, b)]
        return all(o[0] for o in oks), all(o[1] for o in oks)
    return a == b, a == b


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    args = sys.argv[1:]
    sf_dir = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.001')
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    only = set(args)

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config('spark.sql.shuffle.partitions', '32')
        .config('spark.sql.session.timeZone', 'UTC')
        .config('spark.driver.memory', '8g')
        .appName('oracle-check')
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel('ERROR')
    con = duckdb.connect()
    for t in TABLES:
        p = f'{sf_dir}/{t}.parquet'
        if os.path.isdir(p):  # Spark-written multi-file table (e.g. sf1)
            p = f'{p}/*.parquet'
        if p.endswith('*.parquet') or os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures, exact_misses, no_oracle = [], [], []
    n_checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_checked += 1
        sql = oracles.get(name)
        try:
            df = fn(spark, sf_dir)
            # Driver-harness compatibility gate: the external compare
            # canonicalizes through pandas sort_values, which cannot
            # factorize list/dict cells — an array/map-typed output column
            # passes a lenient local compare but hard-errors there. Reject
            # it here so the local gate predicts the driver gate.
            from pyspark.sql.types import ArrayType, MapType

            nested = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType))
            ]
            if nested:
                raise TypeError(
                    f'array/map-typed output columns {nested} — the driver '
                    'harness cannot canonicalize these; emit a joined '
                    'string or exploded rows instead'
                )
            ours = df.toPandas()
            # Same class of hazard, probed the way the driver hits it:
            # sort every column pandas-side and surface any TypeError.
            ours.sort_values(by=sorted(ours.columns), kind='mergesort')
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f'spark error: {exc}'))
            print(f'FAIL {name}: spark error: {exc}')
            continue
        if sql is None:
            no_oracle.append(name)
            print(f'---- {name}: no oracle ({len(ours)} rows)')
            continue
        try:
            theirs = con.execute(sql).df()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f'oracle error: {exc}'))
            print(f'FAIL {name}: oracle error: {exc}')
            continue
        ocols, okinds, orows = canon(ours)
        tcols, tkinds, trows = canon(theirs)
        if ocols != tcols:
            failures.append((name, f'schema {ocols} != {tcols}'))
            print(f'FAIL {name}: schema {ocols} != {tcols}')
            continue
        if okinds != tkinds:
            failures.append((name, f'dtype kinds {okinds} != {tkinds}'))
            print(f'FAIL {name}: dtype kinds\n  ours  ={okinds}\n  oracle={tkinds}')
            continue
        if len(orows) != len(trows):
            failures.append((name, f'rowcount {len(orows)} != {len(trows)}'))
            print(f'FAIL {name}: rowcount {len(orows)} != {len(trows)}')
            continue
        bad = exact = None
        all_exact = True
        for i, (ra, rb) in enumerate(zip(orows, trows)):
            ok, ex = cells_equal(ra, rb)
            all_exact = all_exact and ex
            if not ok:
                bad = (i, ra, rb)
                break
        if bad:
            failures.append((name, f'row {bad[0]}: {bad[1]!r} != {bad[2]!r}'))
            print(f'FAIL {name}: row {bad[0]}:\n  ours  ={bad[1]!r}\n  oracle={bad[2]!r}')
        elif not all_exact:
            exact_misses.append(name)
            print(f'ok~  {name} ({len(orows)} rows; float-tolerance only — driver hash may differ!)')
        else:
            print(f'ok   {name} ({len(orows)} rows, exact)')

    print(
        f'\n{n_checked - len(failures) - len(no_oracle)} matched '
        f'({len(exact_misses)} tolerance-only), {len(failures)} failed, '
        f'{len(no_oracle)} rows-only'
    )
    if exact_misses:
        print('tolerance-only (fix for driver hash):', ', '.join(exact_misses))
    return 1 if failures else 0


if __name__ == '__main__':
    raise SystemExit(main())
