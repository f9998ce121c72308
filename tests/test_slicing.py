"""Slice-convention contracts across array backends.

Array-level ``lslice`` keeps each backend's native convention (pandas .loc
is stop-INCLUSIVE — reference ValueArray parity); the graph-level
``graph.loc(dim)[lo:hi]`` routes through ``lslice_excl`` so every backend
agrees on ONE half-open [lo, hi) row set.  Positional slicing on Spark
columns rejects negative bounds loudly instead of mis-translating them to
filters on a nonnegative row_number.
"""

import pandas as pd
import pytest

from cyclebane_spark.plan.graph import LabelIndexer
from cyclebane_spark.sources.arrays import SeriesArray, SparkColumn


@pytest.fixture(scope='module')
def kv_df(spark):
    return spark.createDataFrame(
        [(k, k * 10.0) for k in range(10)], 'k long, v double'
    )


def series_array():
    return SeriesArray(
        pd.Series([k * 10.0 for k in range(10)], index=pd.RangeIndex(10)),
        axis_zero=0,
    )


def test_graph_loc_routes_through_the_exclusive_convention():
    assert LabelIndexer._method == 'lslice_excl'


def test_pandas_lslice_keeps_native_inclusive_convention():
    out = series_array().lslice({'dim_0': slice(2, 5)})
    assert list(out._series.index) == [2, 3, 4, 5]  # pandas .loc includes 5


def test_pandas_lslice_excl_is_half_open():
    out = series_array().lslice_excl({'dim_0': slice(2, 5)})
    assert list(out._series.index) == [2, 3, 4]


def test_pandas_lslice_excl_open_bounds():
    assert list(
        series_array().lslice_excl({'dim_0': slice(None, 3)})._series.index
    ) == [0, 1, 2]
    assert list(
        series_array().lslice_excl({'dim_0': slice(7, None)})._series.index
    ) == [7, 8, 9]


def test_spark_and_pandas_agree_under_lslice_excl(spark, kv_df):
    col = SparkColumn(kv_df, index=['k'], values='v')
    spark_keys = sorted(
        r[0] for r in col.lslice_excl({'k': slice(2, 5)}).df.select('k').collect()
    )
    pandas_keys = list(
        series_array().lslice_excl({'dim_0': slice(2, 5)})._series.index
    )
    assert spark_keys == pandas_keys == [2, 3, 4]


@pytest.mark.parametrize('sl', [slice(-5, None), slice(None, -2), slice(-5, -2)])
def test_spark_islice_rejects_negative_bounds(spark, kv_df, sl):
    col = SparkColumn(kv_df, index=['k'], values='v')
    with pytest.raises(ValueError, match='negative'):
        col.islice({'k': sl})


def test_spark_islice_positive_bounds_still_work(spark, kv_df):
    col = SparkColumn(kv_df, index=['k'], values='v')
    out = col.islice({'k': slice(2, 5)})
    assert sorted(r[0] for r in out.df.select('k').collect()) == [2, 3, 4]


# -- bucketed two-level positional rank ≡ global row_number ------------------


def _positions(spark, rows, schema, index_cols):
    """(key-tuple -> __pos) under the bucketed _with_position path."""
    col = SparkColumn(
        spark.createDataFrame(rows, schema), index=index_cols, values='v'
    )
    out = col._with_position(col.df).select(*index_cols, '__pos').collect()
    return {tuple(r[c] for c in index_cols): r['__pos'] for r in out}


def _expected(rows, key_idx):
    ordered = sorted(rows, key=lambda r: tuple(r[i] for i in key_idx))
    return {tuple(r[i] for i in key_idx): p for p, r in enumerate(ordered)}


@pytest.mark.parametrize(
    'keys',
    [
        list(range(10)),                        # dense ids
        [0, 1, 4095, 4096, 4097, 8191, 8192],   # bucket boundaries
        [-9000, -4096, -1, 0, 1, 50000],        # negative + sparse
        [7, 70, 700, 7000, 70000, 700000],      # decades apart
    ],
)
def test_bucketed_position_matches_global_order_long_keys(spark, keys):
    rows = [(k, float(k)) for k in keys]
    got = _positions(spark, rows, 'k long, v double', ['k'])
    assert got == _expected(rows, [0])


def test_bucketed_position_matches_for_float_keys(spark):
    keys = [-2.5, -0.5, 0.0, 0.25, 1e4, 123456.75]
    rows = [(k, k) for k in keys]
    got = _positions(spark, rows, 'k double, v double', ['k'])
    assert got == _expected(rows, [0])


def test_bucketed_position_orders_by_all_index_cols(spark):
    # ties on the bucketed leading column break on the second index column
    rows = [(d, i, float(d * 10 + i)) for d in (0, 1, 4096) for i in (2, 0, 1)]
    got = _positions(spark, rows, 'a long, b long, v double', ['a', 'b'])
    assert got == _expected(rows, [0, 1])


def test_string_keys_match_global_order(spark):
    rows = [(s, 1.0) for s in ('b', 'a', 'd', 'c')]
    got = _positions(spark, rows, 'k string, v double', ['k'])
    assert got == _expected(rows, [0])


def test_string_keys_sharing_long_prefix_still_order_exactly(spark):
    # all keys share a 7-byte prefix -> identical range-bucket proxy ->
    # one bucket; the within-bucket window on the FULL column must still
    # produce exact global positions (proxy ties only affect balance)
    keys = [f'prefix_{s}' for s in ('zz', 'aa', 'mm', 'ab', 'a')]
    rows = [(k, 1.0) for k in keys]
    got = _positions(spark, rows, 'k string, v double', ['k'])
    assert got == _expected(rows, [0])


def test_string_keys_null_first_and_empty_string(spark):
    rows = [('b', 1.0), (None, 2.0), ('', 3.0), ('a', 4.0)]
    got = _positions(spark, rows, 'k string, v double', ['k'])
    assert got == {(None,): 0, ('',): 1, ('a',): 2, ('b',): 3}


def test_string_keys_many_rows_match_global_order(spark):
    # enough distinct keys that percentile split points actually split
    keys = [f'k{i:04d}' for i in range(300)]
    import random

    rng = random.Random(11)
    rng.shuffle(keys)
    rows = [(k, float(i)) for i, k in enumerate(keys)]
    got = _positions(spark, rows, 'k string, v double', ['k'])
    assert got == _expected(rows, [0])


def test_date_keys_match_global_order(spark):
    import datetime

    days = [datetime.date(2020, 1, 1) + datetime.timedelta(days=d)
            for d in (5, 0, 400, 37, 2)]
    rows = [(d, 1.0) for d in days]
    got = _positions(spark, rows, 'k date, v double', ['k'])
    assert got == _expected(rows, [0])


def test_unsupported_index_type_raises_loudly(spark):
    df = spark.createDataFrame([([1, 2], 1.0)], 'k array<long>, v double')
    col = SparkColumn(df, index=['k'], values='v')
    with pytest.raises(TypeError, match='label slicing'):
        col._with_position(col.df)


def test_bucketed_position_keeps_null_keys_first(spark):
    # NULL keys sort first under Spark's default ascending order; the
    # sentinel bucket keeps them (an inner join on a NULL bucket would
    # silently drop them while their count shifted every offset)
    rows = [(None, 0.0), (10, 1.0), (20, 2.0)]
    got = _positions(spark, rows, 'k long, v double', ['k'])
    assert got == {(None,): 0, (10,): 1, (20,): 2}


def test_bucketed_position_sorts_nan_last(spark):
    rows = [(float('nan'), 0.0), (1.5, 1.0), (None, 2.0), (-3.0, 3.0)]
    got = _positions(spark, rows, 'k double, v double', ['k'])
    nan_keys = [k for (k,), p in got.items() if k == k and k is not None]
    assert got[(None,)] == 0
    assert got[(-3.0,)] == 1
    assert got[(1.5,)] == 2
    # the NaN row survives and takes the last position
    assert sorted(got.values()) == [0, 1, 2, 3]
