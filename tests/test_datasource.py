"""Custom Python DataSource connector: partitioned parallel reads,
connector-side partition pruning via filter pushdown, determinism."""

import pyspark.sql.functions as F
import pytest

from cyclebane_spark.sources.synthetic import SyntheticEventsSource


@pytest.fixture()
def source_df(spark):
    # function-scoped on purpose: a DataFrame's reader instance carries
    # pushed-filter state between re-plans, so tests must not share one
    spark.conf.set('spark.sql.python.filterPushdown.enabled', 'true')
    spark.dataSource.register(SyntheticEventsSource)
    return (
        spark.read.format('synthetic_events')
        .option('rows', 1000)
        .option('partitions', 8)
        .load()
    )


def test_partitioned_parallel_read(source_df):
    assert source_df.count() == 1000
    assert source_df.rdd.getNumPartitions() == 8


def test_filter_pushdown_prunes_partitions(spark, source_df):
    pruned = source_df.filter(F.col('part_id') == 3)
    # partitions() returned ONLY the matching split — the other 7 ranges
    # were never planned, let alone read
    assert pruned.rdd.getNumPartitions() == 1
    assert pruned.count() == 125
    assert pruned.agg(F.min('event_id'), F.max('event_id')).collect()[0] == (
        375,
        499,
    )


def test_rows_are_deterministic(spark, source_df):
    again = (
        spark.read.format('synthetic_events')
        .option('rows', 1000)
        .option('partitions', 8)
        .load()
    )
    a = sorted(map(tuple, source_df.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b
    # spot-check a known md5-derived row
    row = dict(zip(source_df.columns, a[0]))
    assert row['event_id'] == 0 and row['event_type'] in (
        'click', 'view', 'purchase', 'signup', 'error'
    )


def test_stream_reader_batches_and_matches_batch_rows(spark, source_df, tmp_path):
    """The same source streamed in micro-batches: offsets advance by
    batch_rows, and the union of all batches equals the batch read."""
    stream = (
        spark.readStream.format('synthetic_events')
        .option('rows', 300)
        .option('batch_rows', 100)
        .load()
    )
    assert stream.isStreaming
    # the simple stream reader prefetches one micro-batch per availableNow
    # run; restarting from the same checkpoint resumes at the committed
    # offset — 3 runs drain all 300 rows (and prove offset recovery)
    out = str(tmp_path / 'out')
    for _ in range(3):
        q = (
            stream.writeStream.format('parquet')
            .option('path', out)
            .option('checkpointLocation', str(tmp_path / 'ckpt'))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = spark.read.parquet(out)
    batch = (
        spark.read.format('synthetic_events').option('rows', 300).load()
        # the stream reader generates every row in split 0
        .withColumn('part_id', F.lit(0))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_observe_metrics_without_extra_pass(spark, source_df):
    """df.observe(): pipeline health counters collected as a side effect of
    the one action — the 100 TB answer to 'count the rejects' without a
    second scan."""
    from pyspark.sql import Observation

    obs = Observation('health')
    observed = source_df.observe(
        obs,
        F.count(F.lit(1)).alias('n_rows'),
        F.sum((F.col('value') > 0.5).cast('long')).alias('n_high'),
    )
    kept = observed.filter(F.col('event_type') != 'error').count()
    assert obs.get['n_rows'] == 1000
    assert 0 < obs.get['n_high'] < 1000
    assert kept < 1000


def test_residual_filters_still_apply(source_df):
    """Predicates the connector does not accept must be evaluated by Spark
    above the scan (pushFilters yields them back)."""
    got = source_df.filter(
        (F.col('part_id') == 3) & (F.col('event_type') == 'click')
    )
    rows = got.collect()
    assert all(r.event_type == 'click' and r.part_id == 3 for r in rows)
    assert 0 < len(rows) < 125
