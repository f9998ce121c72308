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


def _docs_as_parts(spark, tmp_path, batches, name='docs'):
    """Write each batch as ONE parquet part file with increasing mtimes so
    maxFilesPerTrigger=1 replays them as ordered micro-batches."""
    import glob
    import os
    import shutil

    src = str(tmp_path / name)
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
    return src


def _file_stream(spark, src):
    schema = spark.read.parquet(src).schema
    return (
        spark.readStream.schema(schema)
        .option('maxFilesPerTrigger', 1)
        .parquet(src)
    )


def test_near_dup_kill_resume_preserves_state(spark, tmp_path):
    """Checkpoint restart must resume with the on-disk band state: the
    killed run admits doc 1; after resume, doc 3 (a dup of 1, arriving in
    the post-kill batch) must be REJECTED. The pre-fix in-memory seen_state
    flag reset on restart and admitted every such duplicate. The kill fires
    AFTER the batch's writes, so the resume also replays that batch's
    writes over themselves — exercising overwrite idempotency through the
    real checkpoint path."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from cyclebane_spark.streaming.windows import (
        _near_dup_step,
        near_dup_filter_parquet,
    )

    a = 'alpha beta gamma delta epsilon zeta eta theta'
    b = 'one two three four five six seven eight nine'
    src = _docs_as_parts(
        spark,
        tmp_path,
        [
            [(1, a)],          # admitted
            [(2, b)],          # admitted; killed AFTER this batch's writes
            [(3, a), (4, b)],  # both dup pre-kill docs -> rejected
        ],
    )
    base = str(tmp_path / 'state')
    state_dir, out_dir = f'{base}/bands', f'{base}/admitted'

    def dying_step(batch_df, batch_id):
        _near_dup_step(batch_df, batch_id, state_dir, out_dir)
        if batch_id == 1:
            raise RuntimeError('injected kill after batch-1 writes')

    q = (
        _file_stream(spark, src)
        .writeStream.foreachBatch(dying_step)
        .trigger(availableNow=True)
        .option('checkpointLocation', f'{base}/_ckpt')
        .start()
    )
    with pytest.raises(StreamingQueryException, match='injected kill'):
        q.awaitTermination()

    # resume: fresh near_dup_filter_parquet call, SAME checkpoint + state
    out = near_dup_filter_parquet(_file_stream(spark, src), base)
    admitted = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert admitted == [1, 2]


def test_near_dup_step_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-invoking a batch with the same
    batch_id (the replay after a partial failure) must leave the admitted
    output and the band state byte-equal — no double-appended rows, and
    the replayed probe must not see the batch's own first-attempt bands
    (which would self-reject every doc)."""
    from cyclebane_spark.streaming.windows import _near_dup_step

    base = str(tmp_path / 's')
    state_dir, out_dir = f'{base}/bands', f'{base}/admitted'
    b0 = spark.createDataFrame(
        [(1, 'alpha beta gamma delta epsilon zeta')],
        'doc_id long, text string',
    )
    b1 = spark.createDataFrame(
        [
            (2, 'alpha beta gamma delta epsilon zeta'),  # dup of 1
            (3, 'one two three four five six seven'),    # novel
        ],
        'doc_id long, text string',
    )
    _near_dup_step(b0, 0, state_dir, out_dir)
    _near_dup_step(b1, 1, state_dir, out_dir)

    def snap():
        adm = sorted(r.doc_id for r in spark.read.parquet(out_dir).collect())
        st = sorted(
            map(tuple, spark.read.parquet(f'{state_dir}/delta').collect())
        )
        return adm, st

    first = snap()
    assert first[0] == [1, 3]
    _near_dup_step(b1, 1, state_dir, out_dir)  # replay
    assert snap() == first


def test_near_dup_out_of_order_arrival_never_false_rejects(spark, tmp_path):
    """The inequality probe's one-sided guarantee: a doc is only ever
    rejected by a SMALLER already-seen partner, so out-of-id-order batch
    arrival can never reject a doc the batch oracle admits. Doc 1 arrives
    AFTER its larger duplicate 10 — the old equi-join probe rejected it;
    it must be admitted (10 stays admitted: an admission filter cannot
    retract, the documented one-sidedness)."""
    from cyclebane_spark.streaming.windows import near_dup_filter_parquet

    a = 'alpha beta gamma delta epsilon zeta eta theta'
    b = 'one two three four five six seven eight nine'
    src = _docs_as_parts(
        spark,
        tmp_path,
        [
            [(10, a), (11, b)],
            [(1, a)],   # smaller dup of 10, arriving later
            [(12, a)],  # larger dup: still rejected (collides with 1 & 10)
        ],
    )
    out = near_dup_filter_parquet(
        _file_stream(spark, src), str(tmp_path / 'st'), compact_files=4
    )
    admitted = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    # oracle (smaller-id rule) admits {1, 10? no: 10 collides with 1 -> reject}
    # -> oracle set {1, 11}; the stream admits a SUPERSET (10 already out).
    assert admitted == [1, 10, 11]
    assert {1, 11}.issubset(set(admitted))
    # the returned output is the post-stream compaction, not the
    # one-file-per-micro-batch ledger: bounded file count
    import os

    files = [f for f in os.listdir(out) if f.endswith('.parquet')]
    assert 0 < len(files) <= 4, files


def test_near_dup_compaction_bounds_probe_and_prunes_files(spark, tmp_path):
    """50 single-doc micro-batches with compact_every=8: the state a later
    batch probes stays bounded (one compacted run + <8 deltas, never the
    50-dir append history), the compacted run's files carry NARROW disjoint
    bh footer ranges so a small batch's In() pushdown prunes most of them,
    and the probe plan shows the pushed filter."""
    import os

    from cyclebane_spark.queries.dedup import _minhash_bands
    from cyclebane_spark.streaming.windows import (
        _near_dup_probe,
        _near_dup_state_paths,
        _near_dup_step,
    )

    base = str(tmp_path / 's')
    state_dir, out_dir = f'{base}/bands', f'{base}/admitted'
    for i in range(50):
        batch = spark.createDataFrame(
            [(i, f'word{i} token{i} alpha{i} beta{i} gamma{i} delta{i}')],
            'doc_id long, text string',
        )
        _near_dup_step(
            batch, i, state_dir, out_dir,
            compact_every=8, compact_files=8, major_every=2,
        )

    # two-tier LSM: minors at 7,15,...,47; majors (2 minors each) at
    # 15, 31, 47 — batch 50 probes newest major + newer minors/deltas
    paths = _near_dup_state_paths(state_dir, 50)
    assert len(paths) == 3, paths
    assert paths[0].endswith('upto=47')
    # GC on both tiers: only the two newest majors survive (15 dropped),
    # minors folded into the second-newest major are gone, and every
    # delta already covered twice over is gone — retained state is
    # O(2x current), not a copy per fold
    majors = sorted(
        int(n.split('=')[1]) for n in os.listdir(f'{state_dir}/compacted')
    )
    assert majors == [31, 47], majors
    minors = sorted(
        int(n.split('=')[1]) for n in os.listdir(f'{state_dir}/minor')
    )
    assert minors == [39, 47], minors
    deltas = sorted(
        int(n.split('=')[1]) for n in os.listdir(f'{state_dir}/delta')
    )
    assert deltas == list(range(40, 50)), deltas
    comp_files = [
        f'{paths[0]}/{f}'
        for f in os.listdir(paths[0])
        if f.endswith('.parquet')
    ]
    assert len(comp_files) == 8

    # footer-level candidate files for ONE new doc's band hashes
    import pyarrow.parquet as pq

    probe_doc = spark.createDataFrame(
        [(99, 'word3 token3 alpha3 beta3 gamma3 delta3')],  # dup of doc 3
        'doc_id long, text string',
    )
    bands = _minhash_bands(probe_doc)
    bhs = sorted(r.bh for r in bands.select('bh').distinct().collect())
    candidates = []
    for f in comp_files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index('bh')
        st = [md.row_group(g).column(idx).statistics for g in range(md.num_row_groups)]
        lo, hi = min(s.min for s in st), max(s.max for s in st)
        if any(lo <= h <= hi for h in bhs):
            candidates.append(f)
    assert len(candidates) < len(comp_files), (len(candidates), len(comp_files))

    # the pushdown probe's scan carries the In() filter on bh
    import contextlib
    import io

    state = spark.read.parquet(*paths).filter(F.col('bh').isin(bhs))
    dup = _near_dup_probe(bands, state)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        dup.explain('formatted')
    plan = buf.getvalue()
    assert 'PushedFilters' in plan and 'In(bh' in plan, plan
    # and the collision is actually found through the compacted state
    assert [r.doc_id for r in dup.collect()] == [99]


def test_near_dup_admitted_set_is_batch_boundary_invariant(spark, tmp_path):
    """The operator's core claim, as a property: for ANY partition of an
    id-ordered corpus into micro-batches (random seeded cut points,
    including the 1-batch and every-doc-alone extremes on a small prefix),
    the streamed admitted set equals the single-shot batch rule "no LSH
    candidate pair with a smaller doc_id" — because the state keeps every
    seen doc's bands and the probe is the smaller-id inequality."""
    import random

    from cyclebane_spark.queries.dedup import (
        _minhash_bands,
        _pairs_from_bands,
    )
    from cyclebane_spark.streaming.windows import _near_dup_step
    from cyclebane_spark.tables import table

    docs = (
        table(spark, SF_DIR, 'documents')
        .select('doc_id', 'text')
        .orderBy('doc_id')
        .limit(120)
        .cache()
    )
    ids = [r.doc_id for r in docs.select('doc_id').collect()]
    expected = sorted(
        set(ids)
        - {
            r.doc_b
            for r in _pairs_from_bands(_minhash_bands(docs))
            .select('doc_b')
            .collect()
        }
    )

    rng = random.Random(13)
    for trial in range(3):
        n_cuts = rng.randint(1, 5)
        cuts = sorted(rng.sample(range(1, len(ids)), n_cuts))
        bounds = [0, *cuts, len(ids)]
        base = str(tmp_path / f't{trial}')
        state_dir, out_dir = f'{base}/bands', f'{base}/admitted'
        for b, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
            chunk = ids[lo:hi]
            batch = docs.filter(
                (F.col('doc_id') >= chunk[0]) & (F.col('doc_id') <= chunk[-1])
            )
            _near_dup_step(batch, b, state_dir, out_dir, compact_every=3)
        admitted = sorted(
            r.doc_id for r in spark.read.parquet(out_dir).collect()
        )
        assert admitted == expected, (trial, cuts)


def test_sync_link_dir_prunes_stale_and_tolerates_reruns(tmp_path):
    """The landing-dir sync behind both file-stream sources: regenerating
    a dataset (renamed/removed part files) must prune the now-broken
    links — a survivor would silently feed old parts into the stream —
    while re-running against an unchanged dataset is a no-op. Pure
    filesystem test, no Spark."""
    import os

    from cyclebane_spark.streaming.windows import _sync_link_dir

    ds = tmp_path / 'tbl.parquet'
    ds.mkdir()
    (ds / 'part-0.parquet').write_bytes(b'a')
    (ds / 'part-1.parquet').write_bytes(b'b')

    link_dir = _sync_link_dir('cb_test_sync', str(ds))
    try:
        assert sorted(os.listdir(link_dir)) == [
            'part-0.parquet', 'part-1.parquet'
        ]
        # rerun: idempotent
        assert _sync_link_dir('cb_test_sync', str(ds)) == link_dir
        assert len(os.listdir(link_dir)) == 2

        # regenerate: part-1 renamed to part-2
        (ds / 'part-1.parquet').unlink()
        (ds / 'part-2.parquet').write_bytes(b'c')
        _sync_link_dir('cb_test_sync', str(ds))
        names = sorted(os.listdir(link_dir))
        assert names == ['part-0.parquet', 'part-2.parquet'], names
        assert all(os.path.exists(f'{link_dir}/{n}') for n in names)
    finally:
        import shutil

        shutil.rmtree(link_dir, ignore_errors=True)


def test_near_dup_out_of_order_divergence_is_exactly_the_late_partner_set(
    spark, tmp_path
):
    """QUANTIFIED one-sidedness (COVERAGE.md determinism rule 7): on a
    shuffled multi-batch corpus, admitted(stream) must equal
    admitted(oracle) ∪ LATE where LATE is exactly the set of docs whose
    every smaller colliding partner arrives in a strictly later batch —
    no other divergence direction or magnitude is allowed. The collision
    graph is computed from the SAME band generator the filter uses, so
    the bound is measured, not assumed."""
    from cyclebane_spark.queries.dedup import (
        _adaptive_pairs_from_bands,
        _minhash_bands,
    )
    from cyclebane_spark.streaming.windows import near_dup_filter_parquet

    texts = {
        'A': 'alpha beta gamma delta epsilon zeta eta theta iota',
        'B': 'one two three four five six seven eight nine ten',
        'C': 'red orange yellow green blue indigo violet umber',
        'D': 'north south east west up down left right center',
        'E': 'spark flink trino duck presto hive impala drill',
    }
    batches = [
        [(20, texts['A']), (21, texts['B']), (3, texts['C'])],
        [(10, texts['A']), (5, texts['B']), (22, texts['C'])],
        [(2, texts['A']), (30, texts['B']), (23, texts['D']),
         (31, texts['E']), (32, texts['E'])],   # same-batch dup pair
        [(1, texts['A']), (40, texts['D']), (24, texts['B'])],
    ]
    batch_of = {d: i for i, rows in enumerate(batches) for d, _ in rows}
    all_rows = [r for rows in batches for r in rows]

    # the collision graph, from the filter's own band generator
    corpus = spark.createDataFrame(all_rows, 'doc_id long, text string')
    pairs = {
        (r.doc_a, r.doc_b)
        for r in _adaptive_pairs_from_bands(_minhash_bands(corpus)).collect()
    }
    partners = {}  # doc -> smaller colliding partners
    for a, b in pairs:
        partners.setdefault(b, set()).add(a)
    oracle_admitted = {d for d, _ in all_rows if d not in partners}
    late = {
        d
        for d, ps in partners.items()
        if all(batch_of[p] > batch_of[d] for p in ps)
    }

    src = _docs_as_parts(spark, tmp_path, batches)
    out = near_dup_filter_parquet(
        _file_stream(spark, src), str(tmp_path / 'st'), compact_files=4
    )
    admitted = {r.doc_id for r in spark.read.parquet(out).collect()}

    assert oracle_admitted <= admitted          # never a false reject
    assert admitted == oracle_admitted | late   # the exact divergence
    # the scenario actually exercises the claim: dups in earlier, later
    # and the SAME batch all occur, and the late set is non-trivial
    assert late == {2, 10, 20, 21}
    assert oracle_admitted == {1, 3, 5, 23, 31}


# -- late-data ACCOUNTING (the registered observability query) ---------------


def test_late_data_audit_counts_are_internally_consistent(spark):
    """The audit's three counters must reconcile with the batch table and
    with each other: input == table row count (observe() saw every row),
    admitted + dropped == input, and dropped == the first-hour straggler
    count the replay construction guarantees (the same number the DuckDB
    oracle computes — pinned here without an oracle engine so a Spark
    watermark-propagation change is caught by pytest alone)."""
    import pyspark.sql.functions as F

    from cyclebane_spark.streaming.windows import late_data_audit
    from cyclebane_spark.tables import table

    row = late_data_audit(spark, SF_DIR).collect()[0]
    ev = table(spark, SF_DIR, 'events')
    total = ev.count()
    t0 = ev.agg(F.min('ts')).collect()[0][0]
    late = ev.filter(
        F.col('ts') < F.lit(t0) + F.expr("INTERVAL '1' HOUR")
    ).count()
    assert row.input_rows == total
    assert row.admitted_rows + row.dropped_late_rows == row.input_rows
    assert row.dropped_late_rows == late
    assert 0 < late < total  # the replay actually exercises both paths


def test_backfill_replay_finalizes_stale_first_hour_windows(spark):
    """The backfill merge must exercise the HARD case: at least one
    first-hour window FINALIZES in the ledger with stale (undercounted)
    contents — so the reconciliation genuinely overwrites an emitted
    partition rather than only filling never-emitted holes. Reconstruct
    the ledger exactly as stream_late_backfill_merge does and compare its
    first-hour rows against the batch truth."""
    import pyspark.sql.functions as F

    from cyclebane_spark.streaming.windows import (
        late_replay_dir,
        run_to_memory,
    )
    from cyclebane_spark.tables import table

    src = late_replay_dir(
        spark,
        SF_DIR,
        straggler_extra=F.col('event_id') % 2 == 0,
        variant='#backfill-test',
    )
    schema = spark.read.parquet(src).schema
    spark.conf.set('spark.sql.session.timeZone', 'UTC')
    stream = (
        spark.readStream.schema(schema)
        .option('maxFilesPerTrigger', 1)
        .parquet(src)
        .withColumn('ts', F.col('ts').cast('timestamp'))
    )
    ledger = run_to_memory(
        stream.withWatermark('ts', '30 minutes')
        .groupBy(F.window('ts', '1 hour'), 'event_type')
        .agg(F.count(F.lit(1)).alias('n_events'))
        .select(
            F.col('window.start').cast('timestamp_ntz').alias('hour_start'),
            'event_type',
            'n_events',
        ),
        output_mode='append',
    )
    ev = table(spark, SF_DIR, 'events')
    tt = ev.schema['ts'].dataType
    t0 = ev.agg(F.min('ts')).collect()[0][0]
    first_hours = {
        r.hour_start
        for r in ev.filter(
            F.col('ts') < F.lit(t0) + F.expr("INTERVAL '1' HOUR")
        )
        .select(F.date_trunc('hour', 'ts').cast(tt).alias('hour_start'))
        .distinct()
        .collect()
    }
    batch = {
        r.hour_start: r.n_events
        for r in ev.withColumn(
            'hour_start', F.date_trunc('hour', 'ts').cast(tt)
        )
        .groupBy('hour_start')
        .agg(F.count(F.lit(1)).alias('n_events'))
        .collect()
    }
    per_window: dict = {}
    for r in ledger.collect():
        if r.hour_start in first_hours:
            per_window[r.hour_start] = (
                per_window.get(r.hour_start, 0) + r.n_events
            )
    # the first-hour windows DID finalize (the odd half arrived on time)...
    assert per_window
    # ...and at least one window is stale: its even rows were dropped as
    # late after it was emitted (at tiny SFs a dropped row may be a whole
    # (hour, type) CELL, so staleness is asserted per WINDOW)
    assert any(n < batch[h] for h, n in per_window.items())


def test_backfill_merge_is_holdback_agnostic(spark):
    """The reconciliation contract: merged == batch truth for ANY
    straggler choice, not just the registered even-half split. Rebuild
    the merge with a different holdback (every third first-hour row) and
    assert the merged rollup still equals the batch rollup exactly —
    the property that makes the oracle fair."""
    import pyspark.sql.functions as F

    from cyclebane_spark.streaming.windows import (
        late_replay_dir,
        run_to_memory,
    )
    from cyclebane_spark.tables import table

    src = late_replay_dir(
        spark,
        SF_DIR,
        straggler_extra=F.col('event_id') % 3 == 0,
        variant='#backfill-prop',
    )
    schema = spark.read.parquet(src).schema
    spark.conf.set('spark.sql.session.timeZone', 'UTC')
    stream = (
        spark.readStream.schema(schema)
        .option('maxFilesPerTrigger', 1)
        .parquet(src)
        .withColumn('ts', F.col('ts').cast('timestamp'))
    )
    ledger = run_to_memory(
        stream.withWatermark('ts', '30 minutes')
        .groupBy(F.window('ts', '1 hour'), 'event_type')
        .agg(F.count(F.lit(1)).alias('n_events'))
        .select(
            F.col('window.start').cast('timestamp_ntz').alias('hour_start'),
            'event_type',
            'n_events',
        ),
        output_mode='append',
    )
    ev = table(spark, SF_DIR, 'events')
    tt = ev.schema['ts'].dataType
    hour = F.date_trunc('hour', 'ts').cast(tt)
    bounds = ev.agg(F.min('ts').alias('t0'))
    held_back = (
        F.col('ts') < F.col('t0') + F.expr("INTERVAL '1' HOUR")
    ) & (F.col('event_id') % 3 == 0)
    late_hours = (
        ev.crossJoin(F.broadcast(bounds))
        .filter(held_back)
        .select(hour.alias('hour_start'))
        .distinct()
    )
    missing_hours = (
        ev.select(hour.alias('hour_start'))
        .distinct()
        .join(ledger.select('hour_start').distinct(), 'hour_start', 'left_anti')
    )
    touched = late_hours.unionByName(missing_hours).distinct()
    recomputed = (
        ev.withColumn('hour_start', hour)
        .join(F.broadcast(touched), 'hour_start')
        .groupBy('hour_start', 'event_type')
        .agg(F.count(F.lit(1)).alias('n_events'))
    )
    kept = ledger.join(F.broadcast(touched), 'hour_start', 'left_anti')
    merged = sorted(
        map(tuple, kept.unionByName(recomputed).collect())
    )
    batch = sorted(
        map(
            tuple,
            ev.withColumn('hour_start', hour)
            .groupBy('hour_start', 'event_type')
            .agg(F.count(F.lit(1)).alias('n_events'))
            .collect(),
        )
    )
    assert merged == batch


def test_ivf_ingest_replay_is_idempotent_and_ledger_deterministic(spark):
    """stream_ivf_ingest: re-processing the SAME landing files from a
    fresh checkpoint (the recovered-job scenario) must leave the on-disk
    index byte-equal in content — per-batch dynamic partition overwrite
    replaces exactly each replayed batch's own (cl, ingest_batch)
    subpartitions — and must reproduce the identical drift ledger. Also
    pins the ledger shape: one integer-TVD verdict per micro-batch."""
    from cyclebane_spark.queries.similarity import (
        IVF_INGEST_FILES,
        ivf_ingest_run,
        ivf_persisted_serve,
    )

    def index_rows(d):
        return sorted(
            (r.neighbor_id, r.pos, r.qc, int(r.cl), int(r.ingest_batch))
            for r in spark.read.parquet(d).collect()
        )

    def ledger_rows(d):
        return sorted(
            (
                int(r.ingest_batch),
                int(r.corpus_total),
                int(r.batch_total),
                r.drift_num,
                int(r.retrain),
            )
            for r in spark.read.parquet(f'{d}/b*').collect()
        )

    idx1, led1, _state = ivf_ingest_run(spark, SF_DIR)
    rows1, ledger1 = index_rows(idx1), ledger_rows(led1)
    serve1 = sorted(map(tuple, ivf_persisted_serve(spark, SF_DIR, idx1).collect()))

    # every micro-batch produced a drift verdict, and batches partition
    # the incoming vector set (no vector lost or double-ingested)
    assert [b for b, *_ in ledger1] == list(range(IVF_INGEST_FILES))
    ingested = [r for r in rows1 if r[4] >= 0]
    assert len({(r[0], r[1]) for r in ingested}) == len(ingested)

    idx2, led2, _state2 = ivf_ingest_run(spark, SF_DIR, replay=True)
    assert idx2 == idx1 and led2 == led1  # same standing paths
    assert index_rows(idx2) == rows1
    assert ledger_rows(led2) == ledger1
    serve2 = sorted(map(tuple, ivf_persisted_serve(spark, SF_DIR, idx2).collect()))
    assert serve2 == serve1
