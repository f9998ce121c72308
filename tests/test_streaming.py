"""Structured-streaming tests: stream/batch parity, watermark append mode,
custom stateful operator."""

import pyspark.sql.functions as F
import pytest

from cyclebane_spark.streaming.windows import (
    events_stream,
    run_to_memory,
    running_user_totals,
    session_windows,
    tumbling_hourly,
    tumbling_hourly_watermarked,
)

SF_DIR = '/root/testdata/sf0.001'


@pytest.fixture(scope='module')
def stream(spark):
    return events_stream(spark, SF_DIR)


def _batch_events(spark):
    from cyclebane_spark.tables import events_table

    return events_table(spark, SF_DIR)


def test_tumbling_hourly_matches_batch(spark, stream):
    got = run_to_memory(tumbling_hourly(stream), output_mode='complete')
    expected = (
        _batch_events(spark)
        .groupBy(F.date_trunc('hour', 'ts').alias('hour_start'), 'event_type')
        .agg(F.count(F.lit(1)).alias('n_events'))
    )
    g = {(r.hour_start, r.event_type): r.n_events for r in got.collect()}
    e = {(r.hour_start, r.event_type): r.n_events for r in expected.collect()}
    assert g == e


def test_watermark_append_emits_closed_windows_only(spark, stream):
    got = run_to_memory(
        tumbling_hourly_watermarked(stream, '2 hours'), output_mode='append'
    )
    complete = run_to_memory(tumbling_hourly(stream), output_mode='complete')
    appended = {
        (r.hour_start, r.event_type): r.n_events for r in got.collect()
    }
    full = {
        (r.hour_start, r.event_type): r.n_events for r in complete.collect()
    }
    # Append mode emits only windows the watermark has passed: a subset of
    # the complete result, identical counts where emitted, and nothing
    # within the watermark delay of the max event time.
    assert appended
    assert set(appended) <= set(full)
    for k, v in appended.items():
        assert full[k] == v
    max_ts = _batch_events(spark).agg(F.max('ts')).collect()[0][0]
    import datetime

    horizon = max_ts - datetime.timedelta(hours=2)
    for (hour_start, _), _ in appended.items():
        assert hour_start + datetime.timedelta(hours=1) <= horizon


def test_session_windows_match_batch_sessionization(spark, stream):
    got = run_to_memory(session_windows(stream), output_mode='complete')
    # batch: gap-based sessions via lag + cumsum
    from pyspark.sql import Window

    ev = _batch_events(spark)
    w = Window.partitionBy('user_id').orderBy('ts', 'event_id')
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag('ts').over(w)
    batch = (
        ev.withColumn(
            'new_s',
            F.when(
                prev.isNull()
                | (F.col('ts') > prev + F.expr("INTERVAL '30' MINUTE")),
                1,
            ).otherwise(0),
        )
        .withColumn('sid', F.sum('new_s').over(cum))
        .groupBy('user_id', 'sid')
        .agg(F.min('ts').alias('session_start'), F.count(F.lit(1)).alias('n'))
    )
    g = {(r.user_id, r.session_start): r.n_events for r in got.collect()}
    e = {(r.user_id, r.session_start): r.n for r in batch.collect()}
    assert g == e


def test_dedup_stream_matches_batch_distinct(spark, stream):
    from cyclebane_spark.streaming.windows import dedup_stream

    got = run_to_memory(dedup_stream(stream), output_mode='append')
    expected = (
        _batch_events(spark)
        .dropDuplicates(['user_id', 'event_type', 'value'])
        .count()
    )
    assert got.count() == expected


def test_running_user_totals_final_state(spark, stream):
    got = run_to_memory(running_user_totals(stream), output_mode='update')
    # the last emission per user carries the final running totals
    final = {}
    for r in got.collect():
        prev = final.get(r.user_id)
        if prev is None or r.n_events > prev[0]:
            final[r.user_id] = (r.n_events, r.total_value)
    expected = {
        r.user_id: (r.n, r.total)
        for r in _batch_events(spark)
        .groupBy('user_id')
        .agg(
            F.count(F.lit(1)).alias('n'),
            F.sum('value').alias('total'),
        )
        .collect()
    }
    assert set(final) == set(expected)
    for uid, (n, total) in final.items():
        en, etotal = expected[uid]
        assert n == en
        assert total == pytest.approx(etotal, rel=1e-9)


def test_transform_with_state_plan_constructs(spark, stream):
    """transformWithStateInPandas analyzes without protobuf: the processor
    wiring, output schema and streaming-ness of the plan are checkable in
    ANY environment — only state (de)serialization at execution time needs
    google.protobuf (covered by
    ``test_transform_with_state_execution_parity`` below, which importorskips
    protobuf and so runs wherever the tWS state protocol can actually
    execute)."""
    from cyclebane_spark.streaming.windows import running_user_totals_tws

    df = running_user_totals_tws(stream)
    assert df.isStreaming
    assert df.schema.simpleString() == (
        'struct<user_id:bigint,n_events:bigint,total_value:double>'
    )


def test_transform_with_state_execution_parity(spark, stream):
    """Env-gated tWS EXECUTION parity: in environments with google.protobuf
    (the tWS state-protocol wire format), run the transformWithState twin to
    completion and check its final per-user totals equal the batch GROUP BY —
    the same contract the applyInPandasWithState twin
    (``stream_stateful_counters``) carries in protobuf-less containers."""
    pytest.importorskip('google.protobuf')
    from cyclebane_spark.streaming.windows import running_user_totals_tws

    got = run_to_memory(running_user_totals_tws(stream), output_mode='update')
    final = {}
    for r in got.collect():
        prev = final.get(r.user_id)
        if prev is None or r.n_events > prev[0]:
            final[r.user_id] = (r.n_events, r.total_value)
    expected = {
        r.user_id: (r.n, r.total)
        for r in _batch_events(spark)
        .groupBy('user_id')
        .agg(F.count(F.lit(1)).alias('n'), F.sum('value').alias('total'))
        .collect()
    }
    assert set(final) == set(expected)
    for uid, (n, total) in final.items():
        en, etotal = expected[uid]
        assert n == en
        assert total == pytest.approx(etotal, rel=1e-9)


def test_running_user_counters_match_batch_exactly(spark, stream):
    """The integer-state twin (the driver-gated ``stream_stateful_counters``
    exercise): final counters EQUAL the batch GROUP BY — no float tolerance
    needed, integer accumulation is exact in any arrival order."""
    from cyclebane_spark.streaming.windows import running_user_counters

    got = run_to_memory(running_user_counters(stream), output_mode='update')
    final = (
        got.groupBy('user_id')
        .agg(F.max('n_events').alias('n'), F.max('n_clicks').alias('c'))
        .collect()
    )
    expected = {
        r.user_id: (r.n, r.c)
        for r in _batch_events(spark)
        .groupBy('user_id')
        .agg(
            F.count(F.lit(1)).alias('n'),
            F.sum((F.col('event_type') == 'click').cast('long')).alias('c'),
        )
        .collect()
    }
    assert {r.user_id: (r.n, r.c) for r in final} == expected


def test_view_click_join_matches_batch_interval_join(spark, stream):
    from cyclebane_spark.streaming.windows import view_click_join

    got = run_to_memory(view_click_join(stream), output_mode='append')

    ev = _batch_events(spark)
    views = ev.filter(F.col('event_type') == 'view').select(
        'user_id', F.col('ts').alias('view_ts'), F.col('event_id').alias('view_id')
    )
    clicks = ev.filter(F.col('event_type') == 'click').select(
        F.col('user_id').alias('c_user'),
        F.col('ts').alias('click_ts'),
        F.col('event_id').alias('click_id'),
    )
    expected = views.join(
        clicks,
        on=[
            views.user_id == clicks.c_user,
            clicks.click_ts >= views.view_ts,
            clicks.click_ts <= views.view_ts + F.expr('INTERVAL 1 hour'),
        ],
    ).select('view_id', 'click_id')

    got_pairs = {(r.view_id, r.click_id) for r in got.collect()}
    exp_pairs = {(r.view_id, r.click_id) for r in expected.collect()}
    assert got_pairs == exp_pairs
    assert len(got_pairs) > 0


def test_stream_foreachbatch_parquet_sink(spark, stream, tmp_path):
    """Streaming -> files via foreachBatch with a checkpoint: the durable
    sink pattern (idempotent rewrite per batch id; checkpoint makes restarts
    resume, not replay)."""
    from cyclebane_spark.streaming.windows import tumbling_hourly

    out = str(tmp_path / 'sink')
    ckpt = str(tmp_path / 'ckpt')

    def write_batch(df, batch_id):
        df.write.mode('overwrite').parquet(out)

    q = (
        tumbling_hourly(stream)
        .writeStream.foreachBatch(write_batch)
        .outputMode('complete')
        .option('checkpointLocation', ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    from cyclebane_spark.queries.events import events_hourly_agg

    got = spark.read.parquet(out)
    assert got.count() == events_hourly_agg(spark, SF_DIR).count()


# -- watermark state EVICTION (not just configuration) -----------------------
#
# Three hand-built micro-batches with controlled file mtimes (the file
# source processes oldest-first, one file per trigger): batch 1 seeds
# early-hour state, batch 2 jumps 10 hours ahead so the watermark advances
# past batch 1's windows, batch 3 replays LATE rows from the early hour.
# The StreamingQueryProgress state metrics must show (a) late input dropped
# by the watermark and (b) state rows actually removed — eviction observed,
# not assumed.

_EV_SCHEMA = (
    'user_id long, event_id long, event_type string, ts timestamp, '
    'value double'
)


def _write_stream_file(spark, rows, src_dir, name, mtime):
    import glob
    import os
    import shutil

    tmp = f'{src_dir}_{name}_tmp'
    spark.createDataFrame(rows, _EV_SCHEMA).coalesce(1).write.mode(
        'overwrite'
    ).parquet(tmp)
    part = glob.glob(f'{tmp}/part-*.parquet')[0]
    os.makedirs(src_dir, exist_ok=True)
    dst = f'{src_dir}/{name}.parquet'
    shutil.copy(part, dst)
    os.utime(dst, (mtime, mtime))
    shutil.rmtree(tmp)


def _run_collecting_progress(result, output_mode):
    import json

    from cyclebane_spark.streaming.windows import _SINK_IDS

    name = f'cb_evict_sink_{next(_SINK_IDS)}'
    q = (
        result.writeStream.format('memory')
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = [json.loads(p.json) for p in q.recentProgress]
    return result.sparkSession.table(name), progress


def _state_metric(progress, key):
    return sum(
        op.get(key, 0) for p in progress for op in p.get('stateOperators', [])
    )


def test_watermark_drops_late_rows_and_evicts_window_state(spark, tmp_path):
    import datetime

    from cyclebane_spark.streaming.windows import tumbling_hourly_watermarked

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, minutes, typ='view'):
        return (i, i, typ, t0 + datetime.timedelta(minutes=minutes), 1.0)

    src = str(tmp_path / 'src')
    _write_stream_file(
        spark, [ev(1, 0), ev(2, 10), ev(3, 20)], src, 'b1', 1_000
    )
    # jump 10h ahead so the NEXT batch runs with watermark ~8h
    _write_stream_file(spark, [ev(4, 600), ev(5, 610)], src, 'b2', 2_000)
    # filler batch: state eviction happens at the END of the batch that
    # first runs with the advanced watermark — this batch triggers it, so
    # the early-hour window is finalized+evicted before the late replay
    _write_stream_file(spark, [ev(8, 615)], src, 'b3', 3_000)
    # LATE: same early hour as batch 1, long past the watermark
    _write_stream_file(spark, [ev(6, 5), ev(7, 15)], src, 'b4', 4_000)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option('maxFilesPerTrigger', 1)
        .parquet(src)
    )
    out, progress = _run_collecting_progress(
        tumbling_hourly_watermarked(stream, '2 hours'), 'append'
    )
    assert len(progress) >= 4
    # (a) the late replay was dropped AT the state operator (the two late
    # rows partial-aggregate map-side into one window row, which the
    # watermark then drops — hence >= 1, not >= 2)
    assert _state_metric(progress, 'numRowsDroppedByWatermark') >= 1
    # (b) finalized windows left the state store
    assert _state_metric(progress, 'numRowsRemoved') >= 1
    # (c) the emitted early-hour window counts ONLY batch-1 rows — the late
    # replay contributed nothing and did not re-emit the window
    assert [
        (r.hour_start, r.n_events) for r in out.collect()
    ] == [(t0, 3)]
    # (d) end state is smaller than peak, and the late replay did NOT
    # resurrect the evicted early window as new state: only the live
    # far-future window remains
    totals = [
        op['numRowsTotal']
        for p in progress
        for op in p.get('stateOperators', [])
        if 'numRowsTotal' in op
    ]
    assert totals and totals[-1] < max(totals)
    assert totals[-1] == 1


def test_watermark_evicts_session_window_state(spark, tmp_path):
    """Session-window state eviction, proven the same way as the tumbling
    and join operators: after the watermark passes a finalized session,
    its state rows leave the store (numRowsRemoved > 0) and a late-replayed
    fragment of that session is dropped at the operator — it must neither
    reopen the finalized session nor re-emit it."""
    import datetime

    from cyclebane_spark.streaming.windows import session_windows

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, minutes):
        return (42, i, 'view', t0 + datetime.timedelta(minutes=minutes), 1.0)

    src = str(tmp_path / 'src')
    # one early session: events 0 and 10 min (30-min gap -> one session)
    _write_stream_file(spark, [ev(1, 0), ev(2, 10)], src, 'b1', 1_000)
    # jump 2 days ahead: the NEXT batch runs with watermark ~1 day, far
    # past the early session's close (the session watermark is '1 day')
    _write_stream_file(spark, [ev(3, 2880), ev(4, 2890)], src, 'b2', 2_000)
    # filler batch: eviction happens at the END of the batch that first
    # runs with the advanced watermark — the early session is finalized,
    # emitted, and its state evicted here
    _write_stream_file(spark, [ev(5, 2900)], src, 'b3', 3_000)
    # LATE fragment inside the early session's gap horizon (minute 15 —
    # within 30 min of the last early event): with live state it would
    # EXTEND that session; the watermark must drop it instead
    _write_stream_file(spark, [ev(6, 15)], src, 'b4', 4_000)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option('maxFilesPerTrigger', 1)
        .parquet(src)
    )
    out, progress = _run_collecting_progress(session_windows(stream), 'append')
    assert len(progress) >= 4
    # the late fragment was dropped at the state operator
    assert _state_metric(progress, 'numRowsDroppedByWatermark') >= 1
    # finalized session state actually left the store
    assert _state_metric(progress, 'numRowsRemoved') >= 1
    # the early session emitted ONCE with only its on-time events, and the
    # late fragment neither reopened it (no second early-session row) nor
    # shifted its boundaries
    early = [
        r for r in out.collect() if r.session_start < t0 + datetime.timedelta(days=1)
    ]
    assert [(r.session_start, r.n_events) for r in early] == [(t0, 2)]
    # end state below peak: the live far-future session is all that remains
    totals = [
        op['numRowsTotal']
        for p in progress
        for op in p.get('stateOperators', [])
        if 'numRowsTotal' in op
    ]
    assert totals and totals[-1] < max(totals)


def test_watermark_evicts_stream_stream_join_state(spark, tmp_path):
    import datetime

    from cyclebane_spark.streaming.windows import view_click_join

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, minutes, typ):
        # one shared user so views and clicks can actually join
        return (42, i, typ, t0 + datetime.timedelta(minutes=minutes), 1.0)

    src = str(tmp_path / 'src')
    _write_stream_file(
        spark, [ev(1, 0, 'view'), ev(2, 20, 'click')], src, 'b1', 1_000
    )
    # jump 10h ahead: the NEXT batch runs with watermark ~8h
    _write_stream_file(
        spark, [ev(3, 600, 'view'), ev(4, 605, 'click')], src, 'b2', 2_000
    )
    # filler batch: state eviction happens at the END of the batch that
    # first runs with the advanced watermark — this batch triggers it, so
    # batch-1 state is GONE before the late click arrives
    _write_stream_file(spark, [ev(6, 620, 'click')], src, 'b3', 3_000)
    # LATE click 30 min after the batch-1 view: inside the 1h join horizon,
    # but its matching view state was evicted — must never join
    _write_stream_file(spark, [ev(5, 30, 'click')], src, 'b4', 4_000)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option('maxFilesPerTrigger', 1)
        .parquet(src)
    )
    out, progress = _run_collecting_progress(
        view_click_join(stream), 'append'
    )
    pairs = {(r.view_id, r.click_id) for r in out.collect()}
    assert (1, 2) in pairs  # on-time match from batch 1
    assert (3, 4) in pairs  # on-time match from batch 2
    assert (3, 6) in pairs  # filler click matched the live view
    assert (1, 5) not in pairs  # the late click found only evicted state
    # state rows were actually removed, and the store ends below its peak
    assert _state_metric(progress, 'numRowsRemoved') >= 2
    totals = [
        op['numRowsTotal']
        for p in progress
        for op in p.get('stateOperators', [])
        if 'numRowsTotal' in op
    ]
    assert totals and totals[-1] < max(totals)


def test_cdc_upsert_multibatch_merge_equals_batch_compaction(spark, tmp_path):
    """Split the event log into 4 files and stream them one file per
    micro-batch: the foreachBatch upsert MERGES across 4 real batches, and
    the final snapshot must equal the batch compaction of the whole log —
    the associativity claim the gate query's docstring makes, actually
    exercised across batch boundaries."""
    from cyclebane_spark.streaming.windows import (
        cdc_upsert_parquet,
        latest_per_key,
    )
    from cyclebane_spark.tables import events_table

    ev = events_table(spark, SF_DIR).withColumn(
        'ts', F.col('ts').cast('timestamp')
    )
    src = str(tmp_path / 'src')
    ev.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option('maxFilesPerTrigger', 1)
        .parquet(src)
    )
    snapshot = cdc_upsert_parquet(stream, str(tmp_path / 'target'))

    got = {
        (r.user_id, r.event_type): (r.event_id, r.ts, r.value)
        for r in spark.read.parquet(snapshot).collect()
    }
    expected = {
        (r.user_id, r.event_type): (r.event_id, r.ts, r.value)
        for r in latest_per_key(ev).collect()
    }
    assert got == expected
    # more than one version dir proves the merge path ran multiple times
    import os

    versions = [d for d in os.listdir(tmp_path / 'target') if d.startswith('v')]
    assert len(versions) >= 2, versions


def test_cdc_upsert_batch_replay_is_idempotent(spark, tmp_path):
    """Replaying the same micro-batch into the snapshot (the at-least-once
    failure mode foreachBatch must tolerate) changes nothing: max_by merge
    is idempotent."""
    from cyclebane_spark.streaming.windows import latest_per_key
    from cyclebane_spark.tables import events_table

    ev = events_table(spark, SF_DIR).withColumn(
        'ts', F.col('ts').cast('timestamp')
    )
    once = latest_per_key(ev)
    replayed = latest_per_key(once.unionByName(latest_per_key(ev)))
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, replayed.collect())
    )


def test_cdc_merge_is_associative_under_random_splits(spark):
    """Property behind the upsert sink: for ANY partition of the log into
    ordered batches, folding latest_per_key batch-by-batch equals one-shot
    compaction. Checked over randomized 1-5-way splits (seeded, no RNG
    state in the plan) via a driver-side fold of the same DataFrame op."""
    import random

    from cyclebane_spark.streaming.windows import latest_per_key
    from cyclebane_spark.tables import events_table

    ev = (
        events_table(spark, SF_DIR)
        .withColumn('ts', F.col('ts').cast('timestamp'))
        .limit(300)
        .cache()
    )
    expected = sorted(map(tuple, latest_per_key(ev).collect()))
    rng = random.Random(7)
    for _ in range(3):
        n = rng.randint(2, 5)
        parts = ev.withColumn(
            'part', (F.pmod(F.xxhash64('event_id'), F.lit(n))).cast('int')
        )
        snapshot = None
        order = list(range(n))
        rng.shuffle(order)
        for p in order:
            batch = parts.filter(F.col('part') == p).select(
                'user_id', 'event_type', 'event_id', 'ts', 'value'
            )
            snapshot = latest_per_key(
                batch if snapshot is None else snapshot.unionByName(batch)
            )
        assert sorted(map(tuple, snapshot.collect())) == expected


def test_tombstone_survives_batches_and_blocks_resurrection(spark, tmp_path):
    """The delete-retention property: a key deleted in an EARLY batch must
    stay deleted when a LATER batch replays an OLDER upsert for it — the
    snapshot's retained tombstone (newer ts) wins the argmax. Exercised
    across two real micro-batches in a controlled order."""
    import os

    from pyspark.sql import Row

    from cyclebane_spark.streaming.windows import (
        cdc_upsert_parquet_tombstones,
    )

    def ts(s):
        import datetime

        return datetime.datetime.fromisoformat(s)

    b1 = spark.createDataFrame(
        [
            Row(user_id=1, event_type='click', event_id=10,
                ts=ts('2024-01-01T10:00:00'), value=1.0, op='U'),
            Row(user_id=1, event_type='click', event_id=30,
                ts=ts('2024-01-01T12:00:00'), value=3.0, op='D'),
            Row(user_id=2, event_type='view', event_id=11,
                ts=ts('2024-01-01T10:30:00'), value=2.0, op='U'),
        ]
    )
    # the late batch replays an OLDER upsert for the deleted key
    b2 = spark.createDataFrame(
        [
            Row(user_id=1, event_type='click', event_id=20,
                ts=ts('2024-01-01T11:00:00'), value=2.0, op='U'),
        ]
    )
    src = str(tmp_path / 'src')
    os.makedirs(src)
    # one file per batch, maxFilesPerTrigger=1; file order = write order
    b1.coalesce(1).write.parquet(f'{src}/b1')
    b2.coalesce(1).write.parquet(f'{src}/b2')
    schema = spark.read.parquet(f'{src}/b1').schema
    stream = (
        spark.readStream.schema(schema)
        .option('maxFilesPerTrigger', 1)
        .parquet(f'{src}/b*')
    )
    snapshot = cdc_upsert_parquet_tombstones(stream, str(tmp_path / 'target'))
    rows = spark.read.parquet(snapshot).collect()
    by_key = {(r.user_id, r.event_type): r for r in rows}
    # tombstone retained in the snapshot...
    assert by_key[(1, 'click')].op == 'D'
    assert by_key[(1, 'click')].event_id == 30  # the delete, not the replay
    # ...and the live view hides the deleted key but keeps the other
    live = [r for r in rows if r.op == 'U']
    assert {(r.user_id, r.event_type) for r in live} == {(2, 'view')}


def test_near_dup_filter_rejects_cross_batch_duplicates(spark, tmp_path):
    """First-seen-wins across real micro-batches: an exact duplicate of an
    ALREADY-ADMITTED doc arriving in a later batch must be rejected, a
    within-batch duplicate resolves to the smaller doc_id, chains of
    duplicates never resurrect, and novel docs always pass."""
    import glob
    import os
    import shutil

    from cyclebane_spark.streaming.windows import near_dup_filter_parquet

    a = 'alpha beta gamma delta epsilon zeta eta theta'
    b = 'one two three four five six seven eight nine'
    c = 'lorem ipsum dolor sit amet consectetur adipiscing elit'
    batches = [
        [(1, a), (2, b)],            # both novel -> admitted
        [(3, a), (4, c), (5, c)],    # 3 dups batch-1; 4 admitted; 5 in-batch dup of 4
        [(6, c), (7, 'completely fresh words appear here now')],  # 6 dups 4
    ]
    src = str(tmp_path / 'docs')
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        tmp = f'{src}_b{i}_tmp'
        spark.createDataFrame(rows, 'doc_id long, text string').coalesce(
            1
        ).write.mode('overwrite').parquet(tmp)
        part = glob.glob(f'{tmp}/part-*.parquet')[0]
        dst = f'{src}/b{i}.parquet'
        shutil.copy(part, dst)
        os.utime(dst, (1_000 * (i + 1), 1_000 * (i + 1)))
        shutil.rmtree(tmp)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option('maxFilesPerTrigger', 1)
        .parquet(src)
    )
    out = near_dup_filter_parquet(stream, str(tmp_path / 'state'))
    admitted = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert admitted == [1, 2, 4, 7]
