"""Streaming queries for the correctness gate: each runs a Structured
Streaming job over the events file stream to completion (availableNow) and
returns the final result table — so streaming operators get real DuckDB
oracles instead of rows-only checks.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..streaming.windows import (
    dedup_stream,
    events_stream,
    run_to_memory,
    running_user_counters,
    session_windows,
    sliding_windows,
    tumbling_hourly,
)
from . import register
from ._helpers import sql_dsum


@register(
    'stream_tumbling_hourly',
    oracle=f"""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def stream_tumbling_hourly(spark, sf_dir):
    """Streaming tumbling-window rollup == the batch hourly rollup."""
    return run_to_memory(
        tumbling_hourly(events_stream(spark, sf_dir)), output_mode='complete'
    )


@register(
    'stream_session_windows',
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts > lag(ts) OVER w + INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT *, CAST(SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def stream_session_windows(spark, sf_dir):
    """Streaming session_window == batch gap-based sessionization."""
    return run_to_memory(
        session_windows(events_stream(spark, sf_dir)), output_mode='complete'
    )


@register(
    'stream_sliding_windows',
    oracle="""
    WITH w AS (
        SELECT event_type,
               TIMESTAMP '1970-01-01 00:00:00' + to_seconds(
                   ((CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800) - k.k * 1800
               ) AS window_start
        FROM events CROSS JOIN (VALUES (0), (1)) k(k)
    )
    SELECT window_start, event_type, COUNT(*) AS n_events
    FROM w GROUP BY window_start, event_type
    """,
)
def stream_sliding_windows(spark, sf_dir):
    """Streaming sliding-window rollup == the batch sliding-window rollup
    (same oracle as ``events_sliding_windows``)."""
    return run_to_memory(
        sliding_windows(events_stream(spark, sf_dir)), output_mode='complete'
    )


@register(
    'stream_dedup_exact',
    oracle="""
    SELECT DISTINCT user_id, event_type, value FROM events
    """,
)
def stream_dedup_exact(spark, sf_dir):
    """Streaming exact dedup (watermarked dropDuplicates) == batch DISTINCT.

    Only the dedup KEY columns are projected: which physical row survives
    depends on arrival order, but the surviving key set is exactly the
    distinct set — giving the streaming dedup operator a value-exact oracle
    instead of a rows-only check. State is one entry per key within the
    watermark horizon (bounded at any input volume).
    """
    out = run_to_memory(
        dedup_stream(events_stream(spark, sf_dir)), output_mode='append'
    )
    return out.select('user_id', 'event_type', 'value')


@register(
    'stream_stateful_counters',
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clicks
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_counters(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState) == batch
    GROUP BY counts.

    The counters are integers, so the running state is exact whatever the
    arrival/batch order; the final emission per key equals the batch
    aggregate. The max() post-aggregation collapses the one-row-per-batch
    update stream to the final value per user — counters are monotone, so
    this is exact even if the file source ever splits the backlog into
    multiple micro-batches.
    """
    import pyspark.sql.functions as F

    out = run_to_memory(
        running_user_counters(events_stream(spark, sf_dir)),
        output_mode='update',
    )
    return out.groupBy('user_id').agg(
        F.max('n_events').alias('n_events'),
        F.max('n_clicks').alias('n_clicks'),
    )


@register(
    'stream_view_click_join',
    oracle="""
    WITH views AS (
        SELECT user_id, ts AS view_ts, event_id AS view_id
        FROM events WHERE event_type = 'view'
    ),
    clicks AS (
        SELECT user_id, ts AS click_ts, event_id AS click_id
        FROM events WHERE event_type = 'click'
    )
    SELECT v.user_id, v.view_id, c.click_id, v.view_ts, c.click_ts
    FROM views v JOIN clicks c
      ON v.user_id = c.user_id
     AND c.click_ts >= v.view_ts
     AND c.click_ts <= v.view_ts + INTERVAL '1 hour'
    """,
)
def stream_view_click_join(spark, sf_dir):
    """Watermarked stream-stream interval join == the batch interval join.

    Both sides are the same watermarked event stream; state for each side is
    dropped once the other side's watermark clears the interval bound, so
    store size is O(horizon x arrival rate) at any input volume.
    """
    from ..streaming.windows import view_click_join

    out = run_to_memory(
        view_click_join(events_stream(spark, sf_dir)), output_mode='append'
    )
    # instants -> naive UTC timestamps, matching the batch loader's NTZ
    import pyspark.sql.functions as F

    return out.select(
        'user_id',
        'view_id',
        'click_id',
        F.to_timestamp_ntz('view_ts').alias('view_ts'),
        F.to_timestamp_ntz('click_ts').alias('click_ts'),
    )


@register(
    'stream_cdc_upsert',
    oracle="""
    SELECT user_id, event_type, event_id, ts, value
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC
    ) = 1
    """,
)
def stream_cdc_upsert(spark, sf_dir):
    """Streaming foreachBatch upsert == batch CDC compaction.

    The stream is merged batch-by-batch into a last-write-wins parquet
    snapshot (:func:`cyclebane_spark.streaming.windows.cdc_upsert_parquet`);
    the final snapshot equals the batch compaction of the whole log
    (same oracle as ``events_cdc_compaction``) because max_by merges are
    associative — whatever the batch boundaries, the per-key argmax of the
    union is the argmax of per-batch argmaxes.
    """
    import pyspark.sql.functions as F

    from ..scratch import scratch_dir
    from ..streaming.windows import cdc_upsert_parquet

    # Deterministic scratch dir per sf_dir (mirrors the events_stream
    # landing-dir idiom): wipe any prior run's snapshots + checkpoint so
    # repeated gate/bench runs reuse ONE path instead of leaking a fresh
    # mkdtemp per invocation; lives under the ownership-verified per-uid
    # parent (cyclebane_spark.scratch) so a pre-created decoy can't swap
    # the snapshot between write and read-back.
    base = scratch_dir('cb_upsert', sf_dir, wipe=True)
    snapshot = cdc_upsert_parquet(events_stream(spark, sf_dir), base)
    return spark.read.parquet(snapshot).select(
        'user_id',
        'event_type',
        'event_id',
        F.to_timestamp_ntz('ts').alias('ts'),
        'value',
    )


@register(
    'stream_cdc_tombstones',
    oracle="""
    WITH log AS (
        SELECT user_id, event_type, event_id, ts, value,
               CASE WHEN substring(md5(CAST(event_id AS VARCHAR)), 1, 1)
                         IN ('e', 'f') THEN 'D' ELSE 'U' END AS op
        FROM events
    )
    SELECT user_id, event_type, event_id, ts, value
    FROM log
    QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC
    ) = 1 AND op = 'U'
    """,
)
def stream_cdc_tombstones(spark, sf_dir):
    """Streaming tombstone-aware MERGE == batch compaction with deletes.

    Each micro-batch merges into a snapshot that RETAINS tombstone rows
    (so a late older upsert cannot resurrect a deleted key — see
    :func:`cyclebane_spark.streaming.windows.cdc_upsert_parquet_tombstones`);
    the reader filters op = 'U'. Same oracle as ``events_cdc_tombstones``:
    associativity of the per-key argmax makes the final snapshot equal
    batch compaction whatever the batch boundaries.
    """
    import pyspark.sql.functions as F

    from ..scratch import scratch_dir
    from ..streaming.windows import cdc_upsert_parquet_tombstones

    op = F.when(
        F.substring(F.md5(F.col('event_id').cast('string')), 1, 1).isin('e', 'f'),
        'D',
    ).otherwise('U')
    stream = events_stream(spark, sf_dir).withColumn('op', op)
    base = scratch_dir('cb_tomb', f'tomb|{sf_dir}', wipe=True)
    snapshot = cdc_upsert_parquet_tombstones(stream, base)
    return (
        spark.read.parquet(snapshot)
        .filter(F.col('op') == 'U')
        .select(
            'user_id',
            'event_type',
            'event_id',
            F.to_timestamp_ntz('ts').alias('ts'),
            'value',
        )
    )


@register(
    'stream_static_enrich',
    oracle=f"""
    SELECT n_name, COUNT(*) AS n_events, {sql_dsum('value')} AS total_value
    FROM events
    JOIN customer ON user_id = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def stream_static_enrich(spark, sf_dir):
    """Stream-static broadcast star-join == the batch join + rollup.

    Stateless per-batch join against broadcast dims, stateful only in the
    25-row nation aggregate — see
    :func:`cyclebane_spark.streaming.windows.static_enrich`.
    """
    from ..tables import table

    from ..streaming.windows import static_enrich

    return run_to_memory(
        static_enrich(
            events_stream(spark, sf_dir),
            table(spark, sf_dir, 'customer'),
            table(spark, sf_dir, 'nation'),
        ),
        output_mode='complete',
    )


@register(
    'stream_late_data_audit',
    oracle="""
    WITH bounds AS (SELECT MIN(ts) AS t0 FROM events),
    tagged AS (
        SELECT CASE WHEN e.ts < b.t0 + INTERVAL '1 hour' THEN 1 ELSE 0 END
            AS is_late
        FROM events e, bounds b
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS input_rows,
           CAST(SUM(is_late) AS BIGINT) AS dropped_late_rows,
           CAST(COUNT(*) - SUM(is_late) AS BIGINT) AS admitted_rows
    FROM tagged
    """,
)
def stream_late_data_audit(spark, sf_dir):
    """Late-data accounting at the watermark boundary: replay the events
    table out of order (first-hour stragglers arrive two micro-batches
    after the bulk has advanced the watermark to month-end), run a
    watermarked admission aggregate, and surface the counts a production
    pipeline alarms on — input rows via ``observe()``, watermark-dropped
    rows via the StreamingQueryProgress state-operator metrics.

    The oracle restates the watermark decision in SQL: every first-hour
    row (and ONLY those) is months past the filter watermark when its
    batch runs, so dropped_late_rows must equal the first-hour row count
    exactly — the observability metrics are oracle-checked values, not
    just monotonic telemetry. See
    :func:`cyclebane_spark.streaming.windows.late_data_audit` for the
    replay construction and the measured two-batch watermark propagation
    this relies on.
    """
    from ..streaming.windows import late_data_audit

    return late_data_audit(spark, sf_dir)


@register(
    'stream_late_backfill_merge',
    oracle=f"""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def stream_late_backfill_merge(spark, sf_dir):
    """Lambda reconciliation: the batch-backfill REPAIR for the late data
    the watermark dropped — stream_late_data_audit counts the loss, this
    closes it. The replay holds back only the EVEN-event_id half of the
    first hour, so the first-hour windows FINALIZE WITH STALE COUNTS (the
    hard case: a correction must overwrite emitted partitions, not just
    fill holes).

    Recipe (the production dynamic-partition-overwrite pattern, stated as
    an anti-join + union so it stays one lazy plan):

    1. ledger — the streaming watermarked hourly aggregate in append mode
       over the out-of-order replay (stale first-hour rows, missing
       unfinalized-tail windows);
    2. touched — every hour window containing a held-back row, plus every
       window absent from the ledger (both window-count-sized, broadcast);
    3. merged — ledger rows for untouched windows + a batch recompute of
       the touched windows from the raw table.

    The oracle is the plain batch hourly rollup: the merge must equal the
    batch truth EXACTLY, for any drop/finalization boundary behavior —
    every window a late row touches is recomputed, so the reconciliation
    never depends on which side of the watermark boundary Spark dropped a
    row (the audit query pins that separately). Untouched ledger windows
    saw all their rows on time, and the decimal window sums make them
    bit-equal to the batch recompute.
    """
    from ..streaming.windows import late_replay_dir, run_to_memory
    from ..tables import table
    from ._helpers import dsum

    src = late_replay_dir(
        spark,
        sf_dir,
        straggler_extra=F.col('event_id') % 2 == 0,
        variant='#backfill',
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
        .agg(
            F.count(F.lit(1)).alias('n_events'),
            F.sum(F.col('value').cast('decimal(28,6)'))
            .cast('double')
            .alias('total_value'),
        )
        .select(
            F.col('window.start').cast('timestamp_ntz').alias('hour_start'),
            'event_type',
            'n_events',
            'total_value',
        ),
        output_mode='append',
    )

    ev = table(spark, sf_dir, 'events')
    tt = ev.schema['ts'].dataType
    hour = F.date_trunc('hour', 'ts').cast(tt)
    bounds = ev.agg(F.min('ts').alias('t0'))
    held_back = (
        F.col('ts') < F.col('t0') + F.expr("INTERVAL '1' HOUR")
    ) & (F.col('event_id') % 2 == 0)
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
        .agg(
            F.count(F.lit(1)).alias('n_events'),
            dsum('value').alias('total_value'),
        )
    )
    kept = ledger.join(F.broadcast(touched), 'hour_start', 'left_anti')
    return kept.unionByName(recomputed).select(
        'hour_start', 'event_type', 'n_events', 'total_value'
    )


def _near_dup_stream_oracle() -> str:
    from .dedup import _minhash_ctes

    return (
        _minhash_ctes()
        + """
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
    """
    )


@register('stream_near_dup_filter', oracle=_near_dup_stream_oracle())
def stream_near_dup_filter(spark, sf_dir):
    """Streaming first-seen-wins near-dup admission == the batch rule
    "admit docs with no LSH candidate pair to a smaller doc_id".

    Each micro-batch probes the accumulated band-table state (the streaming
    statement of ``dedup_incremental_minhash``'s corpus probe) for SMALLER
    colliding doc_ids and resolves within-batch candidates by doc_id; the
    admitted set is batch-boundary-invariant for id-ordered arrival because
    the state keeps EVERY seen doc's bands, and the inequality probe keeps
    it one-sided (no false rejects) for any arrival order — see
    :func:`cyclebane_spark.streaming.windows.near_dup_filter_parquet`.
    Multi-batch semantics, kill/resume recovery, replay idempotency and
    the compacted state's footer-pruned probe are exercised in
    ``tests/test_streaming.py``.
    """
    from ..scratch import scratch_dir
    from ..streaming.windows import documents_stream, near_dup_filter_parquet

    base = scratch_dir('cb_neardup', sf_dir, wipe=True)
    out = near_dup_filter_parquet(documents_stream(spark, sf_dir), base)
    return spark.read.parquet(out).select('doc_id')
