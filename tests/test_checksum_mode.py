"""Cross-engine checksum mode (tests/oracle_check.py --checksum).

The checksum replaces Python-side value canon with (count, exact sum,
bit_xor) of a 60-bit md5 slice computed INSIDE each engine over an
identical canonical row string — the value-evidence path for outputs too
large to canonicalize driver-side (24M/48.9M rows at sf1,
docs/SF1_ORACLE.md). These tests pin:

- the md5-slice arithmetic (xor AND sum folds) agrees bit-for-bit
  between Spark and DuckDB;
- the two sf1-upgraded queries are checksum-exact at the gate SF;
- a one-cell difference, a NULL-vs-string difference, and a row-count
  difference each flip the checksum (the sentinel/separator scheme is not
  ambiguous);
- the known xor weakness — equal-count multisets whose differences have
  even per-row multiplicity cancel under xor — is CAUGHT by the sum fold
  (the reason the fold is a triple, ADVICE r8);
- double columns go through the decimal(38,9) quantization path.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from oracle_check import (
    DUCK_SUM,
    DUCK_XOR,
    SPARK_SUM,
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


def test_md5_slice_folds_agree_across_engines(spark, duck):
    df = spark.createDataFrame([(s,) for s in ('a', 'b', 'xyz', '')], ['s'])
    ours = df.selectExpr(
        SPARK_SUM.format(c='s') + ' as s', SPARK_XOR.format(c='s') + ' as x'
    ).collect()[0]
    theirs = duck.execute(
        f"SELECT {DUCK_SUM.format(c='s')} AS s, {DUCK_XOR.format(c='s')} AS x "
        "FROM (VALUES ('a'),('b'),('xyz'),('')) t(s)"
    ).fetchone()
    assert (int(ours.s), int(ours.x)) == (int(theirs[0]), int(theirs[1]))


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
    n0, s0, x0 = duckdb_checksum(duck, base, ['k', 'v'])
    assert n0 == 2
    # one changed cell
    _, s1, x1 = duckdb_checksum(
        duck, "SELECT * FROM (VALUES (1, 'a'), (2, 'c')) t(k, v)", ['k', 'v']
    )
    assert (s1, x1) != (s0, x0)
    # NULL is not the string chr(1), nor the empty string
    _, s2, x2 = duckdb_checksum(
        duck, "SELECT * FROM (VALUES (1, 'a'), (2, NULL)) t(k, v)", ['k', 'v']
    )
    _, s3, x3 = duckdb_checksum(
        duck, "SELECT * FROM (VALUES (1, 'a'), (2, '')) t(k, v)", ['k', 'v']
    )
    assert len({(s0, x0), (s2, x2), (s3, x3)}) == 3
    # dropping a row changes count
    n4, _, _ = duckdb_checksum(duck, base + ' WHERE k = 1', ['k', 'v'])
    assert n4 == 1


def test_sum_fold_catches_xor_cancelling_multisets(duck):
    # {r1, r1, r2} vs {r2, r3, r3}: same count, and every per-row
    # multiplicity difference is even (r1: +2, r3: -2), so the xor fold
    # cancels — the two multisets are xor-indistinguishable. This is the
    # ADVICE-r8 soundness hole; the exact-sum fold must separate them.
    a = "SELECT * FROM (VALUES (1,'a'), (1,'a'), (2,'b')) t(k, v)"
    b = "SELECT * FROM (VALUES (2,'b'), (3,'c'), (3,'c')) t(k, v)"
    na, sa, xa = duckdb_checksum(duck, a, ['k', 'v'])
    nb, sb, xb = duckdb_checksum(duck, b, ['k', 'v'])
    assert (na, xa) == (nb, xb), 'premise: the xor-cancelling pair really cancels'
    assert sa != sb, 'sum fold must be multiplicity-sensitive'


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
