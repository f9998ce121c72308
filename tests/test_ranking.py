"""Property tests for the shared bucketed two-level global rank
(cyclebane_spark/functions/ranking.py) — the helper behind positional
slicing, sorted-neighborhood dedup, and curriculum binning."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest


def _positions(spark, rows, bucket, order_cols):
    from cyclebane_spark.functions.ranking import with_global_position

    df = spark.createDataFrame(rows, 'k long, tag string')
    out = with_global_position(df, bucket, order_cols).collect()
    return {(r.k, r.tag): r['__pos'] for r in out}


@pytest.mark.parametrize('seed', [0, 1, 2])
@pytest.mark.parametrize('width', [1, 4, 64])
def test_positions_match_argsort_for_any_monotone_bucket(spark, seed, width):
    """Any monotone bucket assignment must yield EXACT global positions —
    bucket balance affects tasks, never answers. Random keys with heavy
    duplication; ties broken by the secondary order column."""
    rng = random.Random(seed)
    rows = [
        (rng.randrange(-50, 50), f't{i:03d}') for i in range(300)
    ]
    got = _positions(
        spark,
        rows,
        F.floor(F.col('k') / F.lit(width)),
        [F.col('k'), F.col('tag')],
    )
    want = {
        (k, tag): pos
        for pos, (k, tag) in enumerate(sorted(rows))
    }
    assert got == want


def test_positions_with_string_prefix_bucket(spark):
    """A short-prefix bucket (the SNM shape) is monotone in the string key
    and must produce the same positions as a full sort."""
    rows = [(i, w) for i, w in enumerate(
        ['apple', 'apricot', 'banana', 'blueberry', 'cherry', 'aa', 'ab',
         'ba', 'bb', 'a', 'b', 'c', 'ccc', 'cab', 'abc'] * 3
    )]
    from cyclebane_spark.functions.ranking import with_global_position

    df = spark.createDataFrame(rows, 'k long, tag string')
    out = with_global_position(
        df, F.substring('tag', 1, 1), [F.col('tag'), F.col('k')]
    ).collect()
    got = {(r.k, r.tag): r['__pos'] for r in out}
    want = {
        (k, tag): pos
        for pos, (tag, k) in enumerate(sorted((t, k) for k, t in rows))
    }
    assert got == want


def test_helper_plan_partitions_every_rank_window_by_bucket(spark):
    """The helper's row_number windows must partition by the bucket column
    — the whole point is never funneling the table through one reducer —
    and the offsets side must broadcast."""
    from cyclebane_spark.functions.ranking import with_global_position

    df = spark.range(1000).select(
        F.col('id').alias('k'), F.lit('x').alias('tag')
    )
    out = with_global_position(
        df, F.floor(F.col('k') / F.lit(16)), [F.col('k')]
    )
    raw = out._jdf.queryExecution().executedPlan().toString()
    rn = [
        l for l in raw.splitlines() if 'row_number() windowspecdefinition' in l
    ]
    assert rn
    for line in rn:
        assert '], [__grb' in line, line
    assert 'BroadcastExchange' in raw
