#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` side-by-side on the
same parquet tables (default sf0.001; pass a dir or set SPARK_GRAFT_SF_DIR)
and compares row count, sorted column names, and cell values
(order-insensitive, floats to 1e-9 relative tolerance with exactness
reported). Exit code 0 iff every query with an oracle matches.

Usage: python tests/oracle_check.py [--checksum] [sf_dir] [query_name ...]

``--checksum`` replaces the Python-side value canon with an
order-independent checksum computed INSIDE each engine over the same
canonical row string: ``count(*)``, the exact ``sum``, and ``bit_xor``
of a 60-bit slice of ``md5`` over the sorted-column ``concat_ws``
rendering (the sum makes the fold multiplicity-sensitive — xor alone
cancels even-multiplicity differences; see the fold comment below).
Nothing but one (n, s, x) row per engine crosses the driver, so outputs
of any size get VALUE evidence — this is how the 24M/48.9M-row sf1 rows are verified
(docs/SF1_ORACLE.md). Exactness requires every output column to render
identically via ``cast(col as string)`` in Spark and DuckDB — true for
int/bigint/string/date/decimal. Double columns are QUANTIZED through
decimal(38,9) first (1e-9 absolute, matching the full canon's float
tolerance; sound only for |v| < ~4e6 — see canon_string_sql) and the
result is reported ``ok~`` rather than ``ok``. Array/map-typed output
columns are rejected loudly, as in the full-canon path.
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


def canon_string_sql(cols, double_cols=()) -> str:
    """Engine-portable canonical row string over the sorted columns.

    Every fragment here parses and evaluates identically in Spark SQL and
    DuckDB: ``cast(x as string)`` (STRING aliases VARCHAR in DuckDB),
    ``coalesce``, ``chr``, ``concat_ws``. chr(1) marks NULL cells, chr(2)
    separates cells. Soundness caveat: the encoding is unambiguous only
    while the data itself contains neither control character — true for
    every registry output (printable corpus text, numerics, dates); a
    dataset that embedded \\x01/\\x02 in string cells could alias two
    different row multisets. The full Python canon has no such caveat, so
    checksum mode stays an explicit opt-in for oversized outputs.

    Doubles render differently across engines (Java Double.toString uses
    scientific notation from 1e7; DuckDB much later), so double columns
    are canonicalized through ``decimal(38,9)`` first — a 1e-9 absolute
    quantization, the same strength as the full canon's 1e-9 float
    tolerance. Soundness bound: this agrees across engines only while the
    double's ulp spacing is below 5e-10, i.e. |v| < ~4e6 — Spark's
    double→decimal goes through the shortest decimal repr
    (BigDecimal.valueOf) while DuckDB expands the exact binary value, and
    past that magnitude the 9th decimal digit exposes the difference
    (measured: q1's 2.8e8-scale sums render ...557027000 vs ...557026976).
    Larger doubles false-FAIL (the safe direction); use the full canon's
    relative tolerance for those. Residual caveat even INSIDE the |v| <
    ~4e6 bound: Spark rounds the shortest decimal repr (BigDecimal
    .valueOf) while DuckDB rounds the exact binary expansion, so a value
    lying within half an ulp of a 9th-decimal halfway point can have the
    two HALF_UP roundings straddle it — a rare flaky false FAIL. If one
    ever appears, fall back to the full canon's relative tolerance for
    that query rather than chasing the bound.
    """
    double_cols = set(double_cols)
    parts = ', '.join(
        'coalesce(cast('
        + (f'cast({c} as decimal(38,9))' if c in double_cols else c)
        + " as string), chr(1))"
        for c in sorted(cols)
    )
    return f'concat_ws(chr(2), {parts})'


# 60-bit md5 slice: fits a signed bigint in both engines. The fold is
# (count, exact SUM, bit_xor) of the slice — all order-independent. xor
# alone is NOT a sound multiset proxy: any row-set difference with even
# per-row multiplicity cancels ({r1,r1,r2} and {r2,r3,r3} share
# (count, xor), verified). The SUM closes that: it is multiplicity-
# sensitive, and with 60-bit terms it stays exact in both engines
# (Spark decimal(38,0) holds sums to ~1e38 ≈ 2^126; DuckDB sum(bigint)
# promotes to hugeint), so no wraparound modulus is even needed below
# ~2^66 rows. Residual risk is md5 collision / algebraic coincidence on
# BOTH sum and xor simultaneously — a heuristic proxy, strictly weaker
# than the full Python canon, which is why checksum mode stays an
# explicit opt-in for oversized outputs.
SPARK_XOR = (
    'bit_xor(cast(conv(substring(md5({c}),1,15),16,10) as bigint))'
)
DUCK_XOR = "bit_xor(('0x' || substr(md5({c}),1,15))::bigint)"
SPARK_SUM = (
    'sum(cast(conv(substring(md5({c}),1,15),16,10) as decimal(38,0)))'
)
DUCK_SUM = "sum(('0x' || substr(md5({c}),1,15))::bigint)"


def double_columns(df):
    return [
        f.name
        for f in df.schema.fields
        if f.dataType.simpleString() in ('double', 'float')
    ]


def spark_checksum(df):
    """(count, sum, xor) computed inside Spark — see canon_string_sql."""
    c = canon_string_sql(df.columns, double_columns(df))
    row = df.selectExpr(
        'count(1) as n',
        SPARK_SUM.format(c=c) + ' as s',
        SPARK_XOR.format(c=c) + ' as x',
    ).collect()[0]
    return (
        int(row.n),
        None if row.s is None else int(row.s),
        None if row.x is None else int(row.x),
    )


def duckdb_checksum(con, sql: str, cols, double_cols=()):
    c = canon_string_sql(cols, double_cols)
    q = (
        f'SELECT count(*) AS n, '
        f"{DUCK_SUM.format(c='_row_canon')} AS s, "
        f"{DUCK_XOR.format(c='_row_canon')} AS x "
        f'FROM (SELECT {c} AS _row_canon FROM ({sql}) _q) _t'
    )
    n, s, x = con.execute(q).fetchone()
    return (
        int(n),
        None if s is None else int(s),
        None if x is None else int(x),
    )


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    args = sys.argv[1:]
    use_checksum = '--checksum' in args
    args = [a for a in args if a != '--checksum']
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
        if use_checksum:
            if sql is None:
                no_oracle.append(name)
                print(f'---- {name}: no oracle (skipped in checksum mode)')
                continue
            try:
                df = fn(spark, sf_dir)
                # same driver-harness compatibility gate as the full-canon
                # path: nested output columns hard-error in the external
                # compare, so a checksum pass here must not mask that
                from pyspark.sql.types import ArrayType, MapType

                nested = [
                    f.name
                    for f in df.schema.fields
                    if isinstance(f.dataType, (ArrayType, MapType))
                ]
                if nested:
                    raise TypeError(
                        f'array/map-typed output columns {nested} — the '
                        'driver harness cannot canonicalize these; emit a '
                        'joined string or exploded rows instead'
                    )
                ocols = sorted(df.columns)
                tcols = sorted(
                    d[0] for d in con.execute(f'SELECT * FROM ({sql}) LIMIT 0').description
                )
                if ocols != tcols:
                    raise ValueError(f'schema {ocols} != {tcols}')
                dbl = double_columns(df)
                on, os_, ox = spark_checksum(df)
                tn, ts, tx = duckdb_checksum(con, sql, ocols, dbl)
            except Exception as exc:  # noqa: BLE001
                failures.append((name, f'checksum error: {exc}'))
                print(f'FAIL {name}: checksum error: {exc}')
                continue
            if (on, os_, ox) != (tn, ts, tx):
                failures.append(
                    (name, f'checksum ({on},{os_},{ox}) != ({tn},{ts},{tx})')
                )
                print(
                    f'FAIL {name}: checksum ({on},{os_},{ox}) != ({tn},{ts},{tx})'
                )
            elif dbl:
                exact_misses.append(name)
                print(
                    f'ok~  {name} ({on} rows, checksum-exact x={ox}; '
                    f'doubles {dbl} quantized at 1e-9)'
                )
            else:
                print(f'ok   {name} ({on} rows, checksum-exact x={ox})')
            continue
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
