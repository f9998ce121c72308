"""Cross-engine checksum mode (tests/oracle_check.py --checksum).

The checksum replaces Python-side value canon with (count, bit_xor of a
60-bit md5 slice) computed INSIDE each engine over an identical canonical
row string — the value-evidence path for outputs too large to canonicalize
driver-side (24M/48.9M rows at sf1, docs/SF1_ORACLE.md). These tests pin:

- the md5-slice arithmetic agrees bit-for-bit between Spark and DuckDB;
- the two sf1-upgraded queries are checksum-exact at the gate SF;
- a one-cell difference, a NULL-vs-string difference, and a row-count
  difference each flip the checksum (the sentinel/separator scheme is not
  ambiguous);
- double columns go through the decimal(38,9) quantization path.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from oracle_check import (
    DUCK_XOR,
    SPARK_XOR,
    canon_string_sql,
    duckdb_checksum,
    spark_checksum,
)

TABLES = (
    'region nation customer supplier part orders lineitem events documents embeddings'
).split()


@pytest.fixture(scope='module')
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f'{sf_dir}/{t}.parquet'
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def test_md5_slice_xor_agrees_across_engines(spark, duck):
    df = spark.createDataFrame([(s,) for s in ('a', 'b', 'xyz', '')], ['s'])
    ours = df.selectExpr(SPARK_XOR.format(c='s') + ' as x').collect()[0].x
    theirs = duck.execute(
        f"SELECT {DUCK_XOR.format(c='s')} AS x FROM "
        "(VALUES ('a'),('b'),('xyz'),('')) t(s)"
    ).fetchone()[0]
    assert ours == theirs


@pytest.mark.parametrize(
    'name', ['unpivot_lineitem_measures', 'join_interval_bucketed']
)
def test_sf1_upgraded_queries_checksum_exact(spark, duck, sf_dir, name):
    from cyclebane_spark.queries import registry

    q = registry()[name]
    df = q.fn(spark, sf_dir)
    from oracle_check import double_columns

    dbl = double_columns(df)
    assert spark_checksum(df) == duckdb_checksum(
        duck, q.oracle, df.columns, dbl
    )


def test_checksum_distinguishes_value_null_and_count(duck):
    base = "SELECT * FROM (VALUES (1, 'a'), (2, 'b')) t(k, v)"
    n0, x0 = duckdb_checksum(duck, base, ['k', 'v'])
    assert n0 == 2
    # one changed cell
    _, x1 = duckdb_checksum(
        duck, "SELECT * FROM (VALUES (1, 'a'), (2, 'c')) t(k, v)", ['k', 'v']
    )
    assert x1 != x0
    # NULL is not the string chr(1), nor the empty string
    _, x2 = duckdb_checksum(
        duck, "SELECT * FROM (VALUES (1, 'a'), (2, NULL)) t(k, v)", ['k', 'v']
    )
    _, x3 = duckdb_checksum(
        duck, "SELECT * FROM (VALUES (1, 'a'), (2, '')) t(k, v)", ['k', 'v']
    )
    assert len({x0, x2, x3}) == 3
    # dropping a row changes count (xor alone would also change here, but
    # count is the load-bearing guard for xor-cancelling duplicate pairs)
    n4, _ = duckdb_checksum(duck, base + ' WHERE k = 1', ['k', 'v'])
    assert n4 == 1


def test_double_quantization_is_engine_portable(spark, duck):
    # values chosen near the 9th decimal: both engines must land on the
    # same decimal(38,9) rendering for ulp-neighbour inputs below the
    # documented |v| < 4e6 soundness bound
    vals = [0.1, 1.0 / 3.0, 2.5e-10, 123456.789123456, -7.000000001]
    df = spark.createDataFrame([(v,) for v in vals], 'v double')
    c = canon_string_sql(['v'], ['v'])
    ours = sorted(r[0] for r in df.selectExpr(f'{c} as c').collect())
    sql_vals = ', '.join(f'({v!r}::double)' for v in vals)
    theirs = sorted(
        r[0]
        for r in duck.execute(
            f'SELECT {c} AS c FROM (VALUES {sql_vals}) t(v)'
        ).fetchall()
    )
    assert ours == theirs
