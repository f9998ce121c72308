"""Event / time-series operators over the ``events`` table: tumbling-window
aggregation, sessionization, as-of join, pivot, JSON extraction.

These are the batch-mode statements of the streaming semantics in
``cyclebane_spark.streaming`` (same windows computed by Structured Streaming
with watermarks); stating them in batch gives them DuckDB oracles.

All time arithmetic is timezone-independent (date_trunc / interval
comparisons on naive timestamps) so results don't depend on the session TZ.

Scale: every query here shuffles at most once on (user_id) or the window
bucket; sessionization and as-of use a single sort-within-partition window —
the standard large-scale formulation (no self-join fan-out).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ..tables import spread_small, table
from . import register
from ._helpers import dsum, sql_dsum

EVENT_TYPES = ('click', 'view', 'purchase', 'signup', 'error')


@register(
    'events_hourly_agg',
    oracle=f"""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def events_hourly_agg(spark, sf_dir):
    """Tumbling 1h window x event_type: the canonical streaming rollup."""
    ev = table(spark, sf_dir, 'events')
    tt = ev.schema['ts'].dataType
    return (
        ev.groupBy(
            F.date_trunc('hour', 'ts').cast(tt).alias('hour_start'),
            'event_type',
        )
        .agg(
            F.count(F.lit(1)).alias('n_events'),
            dsum('value').alias('total_value'),
        )
    )


@register(
    'events_sessionization',
    headline=True,
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
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           {sql_dsum('value')} AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def events_sessionization(spark, sf_dir):
    """Gap-based sessions (30 min): flag starts with lag(), cumsum to ids.

    The batch statement of ``session_window`` semantics: one shuffle on
    user_id, then two sorted window passes within each partition.
    """
    ev = table(spark, sf_dir, 'events')
    w = Window.partitionBy('user_id').orderBy('ts', 'event_id')
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag('ts').over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.col('ts') > prev_ts + F.expr("INTERVAL '30' MINUTE")),
        1,
    ).otherwise(0)
    # r11 optimization: the window's own ENSURE_REQUIREMENTS exchange is
    # AQE-coalesced by the parallelism-first policy (target max(bytes/32,
    # 1MB)) to 2-3 partitions on the few-MB local shuffle, so both window
    # passes and the session aggregation ran on 2-3 of 32 cores.
    # spread_small pins the same user_id exchange to defaultParallelism
    # (hashpartitioning(user_id, N) satisfies the window's required
    # distribution AND the downstream (user_id, session_id) aggregation's,
    # so the plan keeps exactly ONE exchange); on multi-split production
    # layouts it is a no-op and the implicit AQE-sized exchange returns.
    return (
        spread_small(
            ev.select('user_id', 'event_id', 'ts', 'value'), 'user_id'
        )
        .withColumn('new_session', new_session)
        .withColumn('session_id', F.sum('new_session').over(cum))
        .groupBy('user_id', 'session_id')
        .agg(
            F.count(F.lit(1)).alias('n_events'),
            F.min('ts').alias('session_start'),
            F.max('ts').alias('session_end'),
            dsum('value').alias('session_value'),
        )
    )


@register(
    'events_sliding_windows',
    oracle="""
    WITH w AS (
        SELECT event_type,
               TIMESTAMP '1970-01-01 00:00:00' + to_seconds(
                   -- floor(): CAST(DOUBLE AS BIGINT) rounds in DuckDB,
                   -- which would mis-bucket the last microsecond of a second
                   ((CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800) - k.k * 1800
               ) AS window_start
        FROM events CROSS JOIN (VALUES (0), (1)) k(k)
    )
    SELECT window_start, event_type, COUNT(*) AS n_events
    FROM w GROUP BY window_start, event_type
    """,
)
def events_sliding_windows(spark, sf_dir):
    """Sliding 1h windows every 30 min: each event lands in two windows.

    The oracle states the window-membership arithmetic explicitly (epoch
    floor minus slide offsets) on naive timestamps — timezone-free on both
    engines. At scale the window assignment is a projection (x2 row fan-out)
    followed by one aggregation shuffle.
    """
    ev = table(spark, sf_dir, 'events')
    return (
        ev.groupBy(
            F.window('ts', '60 minutes', '30 minutes'), 'event_type'
        )
        .agg(F.count(F.lit(1)).alias('n_events'))
        .select(
            F.col('window.start').alias('window_start'),
            'event_type',
            'n_events',
        )
    )


@register(
    'events_asof_join',
    oracle="""
    WITH tagged AS (
        SELECT event_id, user_id, ts, event_type,
               last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_click_ts
        FROM events
    )
    SELECT event_id, user_id, ts, last_click_ts
    FROM tagged WHERE event_type = 'purchase'
    """,
)
def events_asof_join(spark, sf_dir):
    """As-of join: each purchase matched to the user's latest prior click.

    The scalable formulation — union the two streams (here: one table, two
    roles), one shuffle on user_id, one sorted pass carrying the last
    non-null click timestamp forward. No range-join fan-out; at 100 TB this
    beats the naive t1 JOIN t2 ON t2.ts <= t1.ts by orders of magnitude.
    """
    ev = table(spark, sf_dir, 'events')
    w = (
        Window.partitionBy('user_id')
        .orderBy('ts', 'event_id')
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col('event_type') == 'click', F.col('ts'))
    return (
        ev.select('event_id', 'user_id', 'ts', 'event_type')
        .withColumn('last_click_ts', F.last(click_ts, ignorenulls=True).over(w))
        .filter(F.col('event_type') == 'purchase')
        .select('event_id', 'user_id', 'ts', 'last_click_ts')
    )


@register(
    'events_pivot_type_counts',
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (event_type = 'click') AS click,
           COUNT(*) FILTER (event_type = 'view') AS view,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup') AS signup,
           COUNT(*) FILTER (event_type = 'error') AS error
    FROM events GROUP BY user_id
    """,
)
def events_pivot_type_counts(spark, sf_dir):
    """Pivot on a fixed value list (explicit list keeps the plan one-pass)."""
    ev = table(spark, sf_dir, 'events')
    out = (
        ev.groupBy('user_id')
        .pivot('event_type', list(EVENT_TYPES))
        .count()
    )
    # pivot-count yields nulls for absent combos; the oracle counts 0.
    return out.select(
        'user_id',
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES],
    )


@register(
    'events_consecutive_errors',
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
        FROM events
    ), runs AS (
        SELECT user_id, event_id, ts, is_err,
               SUM(is_err) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ) AS err_window
        FROM flagged
    )
    SELECT user_id, event_id AS third_error_id, ts AS third_error_ts
    FROM runs WHERE is_err = 1 AND err_window = 3
    """,
)
def events_consecutive_errors(spark, sf_dir):
    """Pattern detection (MATCH_RECOGNIZE-style CEP): flag every event that
    completes a run of 3 consecutive errors for a user.

    A 3-row sliding count over the user's ordered stream — one shuffle, one
    sorted pass, O(1) state per row; the same predicate chain runs under
    Structured Streaming. No self-joins (the naive 3-way join formulation
    fans out quadratically on error bursts).
    """
    ev = table(spark, sf_dir, 'events')
    w = (
        Window.partitionBy('user_id')
        .orderBy('ts', 'event_id')
        .rowsBetween(-2, Window.currentRow)
    )
    is_err = F.when(F.col('event_type') == 'error', 1).otherwise(0)
    return (
        ev.select('user_id', 'event_id', 'ts', is_err.alias('is_err'))
        .withColumn('err_window', F.sum('is_err').over(w))
        .filter((F.col('is_err') == 1) & (F.col('err_window') == 3))
        .select(
            'user_id',
            F.col('event_id').alias('third_error_id'),
            F.col('ts').alias('third_error_ts'),
        )
    )


@register(
    'events_retention_cohorts',
    oracle="""
    WITH fd AS (
        SELECT user_id, date_trunc('day', ts) AS activity_day,
               min(date_trunc('day', ts)) OVER (PARTITION BY user_id)
                   AS cohort_day
        FROM events
    )
    SELECT cohort_day,
           CAST(DATE_DIFF('day', cohort_day, activity_day) AS INT) AS day_offset,
           COUNT(DISTINCT user_id) AS active_users
    FROM fd GROUP BY cohort_day, day_offset
    """,
)
def events_retention_cohorts(spark, sf_dir):
    """Cohort retention: users grouped by first-seen day, counted on each
    subsequent activity day — the standard retention triangle.

    Single pass: a whole-partition window min assigns each event its user's
    cohort day (one shuffle on user_id), then one distinct-count aggregate.
    No self-join of events against first-activity — the formulation that
    survives 100 TB of events.
    """
    ev = table(spark, sf_dir, 'events')
    tt = ev.schema['ts'].dataType
    day = F.date_trunc('day', 'ts').cast(tt)
    w = Window.partitionBy('user_id')
    fd = ev.select('user_id', day.alias('activity_day')).withColumn(
        'cohort_day', F.min('activity_day').over(w)
    )
    return (
        fd.groupBy(
            'cohort_day',
            F.datediff(
                F.col('activity_day').cast('date'),
                F.col('cohort_day').cast('date'),
            ).alias('day_offset'),
        )
        .agg(F.count_distinct('user_id').alias('active_users'))
    )


@register(
    'events_funnel_3step',
    oracle="""
    WITH w1 AS (
        SELECT user_id, event_id, ts, event_type,
               min(CASE WHEN event_type = 'view' THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS fv
        FROM events
    ), w2 AS (
        SELECT *, min(CASE WHEN event_type = 'click' AND fv IS NOT NULL
                           THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS fc
        FROM w1
    )
    SELECT user_id,
           min(fv) AS first_view,
           min(fc) AS first_click_after_view,
           min(CASE WHEN event_type = 'purchase' AND fc IS NOT NULL
                    THEN ts END) AS first_full_funnel,
           min(CASE WHEN event_type = 'purchase' AND fc IS NOT NULL
                    THEN ts END) IS NOT NULL AS completed
    FROM w2 GROUP BY user_id
    """,
)
def events_funnel_3step(spark, sf_dir):
    """Ordered funnel detection (view -> click -> purchase): per user, the
    first view, the first click at-or-after it, and the first purchase
    at-or-after that.

    The scalable formulation: ONE shuffle on user_id, then two running-min
    window passes (each row sees only its prefix, so stage k's timestamp is
    provably after stage k-1's) and a final per-user aggregate — no
    self-joins, no fan-out, state O(1) per row. The same chain runs under
    Structured Streaming with applyInPandasWithState at unbounded scale.
    """
    ev = table(spark, sf_dir, 'events')
    w = (
        Window.partitionBy('user_id')
        .orderBy('ts', 'event_id')
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fv = F.min(F.when(F.col('event_type') == 'view', F.col('ts'))).over(w)
    w1 = ev.select('user_id', 'event_id', 'ts', 'event_type').withColumn('fv', fv)
    fc = F.min(
        F.when(
            (F.col('event_type') == 'click') & F.col('fv').isNotNull(),
            F.col('ts'),
        )
    ).over(w)
    w2 = w1.withColumn('fc', fc)
    fp = F.min(
        F.when(
            (F.col('event_type') == 'purchase') & F.col('fc').isNotNull(),
            F.col('ts'),
        )
    )
    return w2.groupBy('user_id').agg(
        F.min('fv').alias('first_view'),
        F.min('fc').alias('first_click_after_view'),
        fp.alias('first_full_funnel'),
        fp.isNotNull().alias('completed'),
    )


@register(
    'events_gap_fill',
    oracle=f"""
    WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS h,
               COUNT(*) AS n, {sql_dsum('value')} AS total
        FROM events GROUP BY user_id, date_trunc('hour', ts)
    ), bounds AS (
        SELECT user_id, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY user_id
    ), grid AS (
        SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        FROM bounds
    )
    SELECT g.user_id, g.h,
           COALESCE(n, 0) AS n_events,
           last_value(total IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS carried_total
    FROM grid g LEFT JOIN hourly USING (user_id, h)
    """,
)
def events_gap_fill(spark, sf_dir):
    """Time-series resampling: a dense hourly grid per user with missing
    buckets gap-filled by carrying the last observed value forward.

    Scale: the grid is generated distributed (``sequence`` + ``explode`` per
    user — no driver loop, no cross join against a global calendar); the fill
    is one sorted window pass per user partition. Grid size is bounded by
    horizon x users, independent of event volume.
    """
    ev = table(spark, sf_dir, 'events')
    tt = ev.schema['ts'].dataType
    hourly = (
        ev.groupBy('user_id', F.date_trunc('hour', 'ts').cast(tt).alias('h'))
        .agg(F.count(F.lit(1)).alias('n'), dsum('value').alias('total'))
    )
    # Linear plan, ONE scan: instead of a bounds-derived grid LEFT JOINed
    # back onto hourly (a plan diamond — hourly would be computed twice),
    # each observed bucket emits itself plus the gap buckets since its
    # predecessor: sequence(lag(h)+1h .. h). The union of those ranges is
    # exactly [min(h), max(h)] per user.
    wlag = Window.partitionBy('user_id').orderBy('h')
    prev = F.lag('h').over(wlag)
    with_start = hourly.select(
        'user_id',
        'n',
        'total',
        F.col('h').alias('obs_h'),
        F.coalesce(prev + F.expr("INTERVAL '1' HOUR"), F.col('h')).alias('start'),
    )
    filled = with_start.select(
        'user_id',
        'n',
        'total',
        'obs_h',
        F.explode(
            F.sequence('start', 'obs_h', F.expr("INTERVAL '1' HOUR"))
        ).alias('h'),
    )
    wfill = (
        Window.partitionBy('user_id')
        .orderBy('h')
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_obs = F.col('h') == F.col('obs_h')
    return filled.select(
        'user_id',
        'h',
        F.when(is_obs, F.col('n')).otherwise(0).alias('n_events'),
        F.last(F.when(is_obs, F.col('total')), ignorenulls=True)
        .over(wfill)
        .alias('carried_total'),
    )


@register(
    'events_multi_grain_rollup',
    oracle=f"""
    SELECT d, h, COUNT(*) AS n_events, {sql_dsum('value')} AS total_value
    FROM (
        SELECT date_trunc('day', ts) AS d, date_trunc('hour', ts) AS h, value
        FROM events
    )
    GROUP BY GROUPING SETS ((d), (d, h), ())
    """,
)
def events_multi_grain_rollup(spark, sf_dir):
    """Hypertable-style continuous-aggregate rollup: hour + day + grand total
    in ONE pass via GROUPING SETS on the truncated timestamps (each input row
    feeds every grain's partial aggregate map-side; one shuffle total, vs one
    scan per grain if the rollups were separate queries)."""
    ev = table(spark, sf_dir, 'events')
    tt = ev.schema['ts'].dataType
    return (
        ev.select(
            F.date_trunc('day', 'ts').cast(tt).alias('d'),
            F.date_trunc('hour', 'ts').cast(tt).alias('h'),
            'value',
        )
        .groupingSets([['d'], ['d', 'h'], []], 'd', 'h')
        .agg(F.count(F.lit(1)).alias('n_events'), dsum('value').alias('total_value'))
    )


@register(
    'events_json_extract',
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    """,
)
def events_json_extract(spark, sf_dir):
    """JSON scalar extraction from the props column (semi-structured path)."""
    ev = table(spark, sf_dir, 'events')
    return ev.select(
        'event_id',
        F.get_json_object('props', '$.k').cast('long').alias('prop_k'),
    )


@register(
    'events_variant_extract',
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS n_distinct_k
    FROM events GROUP BY event_type
    """,
)
def events_variant_extract(spark, sf_dir):
    """Semi-structured analytics through Spark 4's VARIANT type: props
    parses ONCE into the binary variant encoding and typed fields shred out
    via variant_get — the modern replacement for per-path get_json_object
    string re-parsing (at 100 TB, variant shredding reads each JSON byte
    once however many paths are extracted; the string path re-parses per
    path). Aggregation is an ordinary hash agg on the shredded column.
    """
    ev = table(spark, sf_dir, 'events')
    k = F.try_variant_get(F.parse_json('props'), '$.k', 'bigint')
    return (
        ev.select('event_type', k.alias('k'))
        .groupBy('event_type')
        .agg(
            F.count(F.lit(1)).alias('n'),
            F.sum('k').alias('sum_k'),
            F.countDistinct('k').alias('n_distinct_k'),
        )
    )


@register(
    'events_anomaly_robust_z',
    oracle="""
    WITH med AS (
        SELECT user_id, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY user_id
    ),
    mad AS (
        SELECT e.user_id, quantile_cont(abs(e.value - m.med), 0.5) AS mad
        FROM events e JOIN med m ON e.user_id = m.user_id
        GROUP BY e.user_id
    )
    SELECT e.event_id, e.user_id, e.value, m.med, d.mad
    FROM events e
    JOIN med m ON e.user_id = m.user_id
    JOIN mad d ON e.user_id = d.user_id
    WHERE d.mad > 0 AND abs(e.value - m.med) > 4.4478 * d.mad
    """,
)
def events_anomaly_robust_z(spark, sf_dir):
    """Robust per-user anomaly detection: flag events deviating more than
    3 sigma-equivalents from the user's median, with spread measured by the
    MAD (median absolute deviation; 4.4478 = 3 x 1.4826, the normal-
    consistency constant) — outlier detection that outliers themselves
    cannot poison, unlike mean/stddev z-scores.

    Exactness: Spark's percentile and DuckDB's quantile_cont share the
    interpolation arithmetic bit-for-bit (see percentile_exact), and the
    threshold is one multiply of identical operands. Scale: two grouped
    exact medians (the 100 TB variant swaps in the mergeable KLL sketch,
    see approx_percentile_bounds) plus two joins co-partitioned on the
    same user_id key — AQE reuses the exchange.
    """
    ev = table(spark, sf_dir, 'events')
    med = ev.groupBy('user_id').agg(
        F.expr('percentile(value, 0.5)').alias('med')
    )
    mad = (
        ev.join(med, 'user_id')
        .groupBy('user_id')
        .agg(F.expr('percentile(abs(value - med), 0.5)').alias('mad'))
    )
    return (
        ev.join(med, 'user_id')
        .join(mad, 'user_id')
        .filter(
            (F.col('mad') > 0)
            & (F.abs(F.col('value') - F.col('med')) > F.lit(4.4478) * F.col('mad'))
        )
        .select('event_id', 'user_id', 'value', 'med', 'mad')
    )


# ---------------------------------------------------------------------------
# CDC / changelog compaction: latest version per key. The ingest pattern for
# mutable upstream tables (user profiles, document revisions): the event log
# is append-only, the queryable view is "last write wins" per key.
# Scale: ONE shuffle on the key with map-side partial max_by — no window
# sort, no row_number materialization of the full log. At 100 TB the log is
# date-partitioned and compaction runs per partition; the same groupBy
# shape applies unchanged.
# ---------------------------------------------------------------------------


@register(
    'events_cdc_compaction',
    oracle="""
    SELECT user_id, event_type, event_id, ts, value
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC
    ) = 1
    """,
)
def events_cdc_compaction(spark, sf_dir):
    """Last-write-wins compaction of the event log per (user_id, event_type).

    ``max_by`` over a (ts, event_id) struct gives lexicographic argmax with
    a unique tiebreaker (event_id), so the surviving row is deterministic —
    value columns ride along in the payload struct, never aggregated, so
    the result is exact in any engine. The oracle states the same operator
    as a window rank; the Spark plan is the cheaper partial-aggregate form.
    """
    ev = table(spark, sf_dir, 'events')
    return (
        ev.groupBy('user_id', 'event_type')
        .agg(
            F.max_by(
                F.struct('event_id', 'ts', 'value'),
                F.struct('ts', 'event_id'),
            ).alias('last')
        )
        .select(
            'user_id',
            'event_type',
            F.col('last.event_id').alias('event_id'),
            F.col('last.ts').alias('ts'),
            F.col('last.value').alias('value'),
        )
    )


# ---------------------------------------------------------------------------
# Bitmap-based EXACT distinct count: the mergeable alternative to
# count_distinct for dense integer keys. Each (group, bucket) partial is a
# fixed 4KB bitmap (bitmap_construct_agg) that combines by OR — map-side
# combinable and re-aggregatable across days/partitions, unlike
# count_distinct whose partial state is the full value set. The pattern
# warehouse engines use for exact distinct at scale; the HLL twin
# (approx_count_distinct_hll / sketch_merge_hll) trades exactness for a
# constant-size sketch when keys are not dense integers.
# ---------------------------------------------------------------------------


@register(
    'events_bitmap_distinct_users',
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def events_bitmap_distinct_users(spark, sf_dir):
    """Exact distinct users per event type via two-level bitmap aggregation
    (bucket -> bitmap_construct_agg -> sum of bitmap_count). See the module
    note for why this out-scales count_distinct."""
    ev = table(spark, sf_dir, 'events')
    return (
        ev.select(
            'event_type',
            F.expr('bitmap_bucket_number(user_id)').alias('bk'),
            F.expr('bitmap_bit_position(user_id)').alias('bp'),
        )
        .groupBy('event_type', 'bk')
        .agg(F.expr('bitmap_construct_agg(bp)').alias('bm'))
        .groupBy('event_type')
        .agg(
            F.sum(F.expr('bitmap_count(bm)')).cast('bigint').alias('n_users')
        )
    )


# ---------------------------------------------------------------------------
# Cogrouped-pandas as-of join: the groupBy().cogroup().applyInPandas API
# surface — two keyed streams land in ONE Python worker per key as aligned
# pandas frames. The window-carry formulation (events_asof_join above) is
# the scale path for this corpus; the cogroup twin is the escape hatch for
# per-key logic SQL can't state (pd.merge_asof with tolerance/nearest,
# per-key model scoring, custom alignment), and doubles as its parity
# check. Scale: one shuffle per side on user_id, Arrow-batched per-key
# frames; a hot key serializes one user's rows into one worker — the
# documented trade of every cogroup op.
# ---------------------------------------------------------------------------


@register(
    'events_cogroup_asof_pandas',
    oracle="""
    WITH clicks AS (
        SELECT user_id, event_id AS click_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    ),
    views AS (
        SELECT user_id, event_id AS view_id, ts AS view_ts
        FROM events WHERE event_type = 'view'
    ),
    ranked AS (
        SELECT c.user_id, c.click_id, c.click_ts, v.view_id, v.view_ts,
               row_number() OVER (
                   PARTITION BY c.click_id
                   ORDER BY v.view_ts DESC, v.view_id DESC
               ) AS rk
        FROM clicks c
        LEFT JOIN views v
          ON v.user_id = c.user_id AND v.view_ts <= c.click_ts
    )
    SELECT user_id, click_id, click_ts, view_id, view_ts
    FROM ranked WHERE rk = 1
    """,
)
def events_cogroup_asof_pandas(spark, sf_dir):
    """Each click matched to the user's latest view at-or-before it, via
    cogrouped applyInPandas + pd.merge_asof (backward, inclusive).

    Determinism: views sort by (view_ts, view_id), so at equal timestamps
    merge_asof's last-row-wins picks the max view_id — exactly the
    oracle's ORDER BY view_ts DESC, view_id DESC rank. Clicks with no
    prior view survive with NULLs (left as-of).

    r11 optimization (guide §4): cogrouping on user_id called the pandas
    function ONCE PER USER — tens of thousands of Python round-trips of
    ~10-row frames, ~10s of pure per-group overhead at sf0.1. The cogroup
    now keys on a scale-adaptive hash bucket (4x defaultParallelism
    groups, deterministic pmod(xxhash64(user_id)) — retry-safe per guide
    §2.5) and the per-user as-of runs inside ONE vectorized
    ``pd.merge_asof(by='user_id')`` per bucket. Same results (merge_asof
    with ``by`` applies the identical backward/inclusive scan per user);
    measured 10.9s -> 0.8s best-of-5 at sf0.1; the operator category
    (cogrouped applyInPandas) is unchanged.
    """
    import pandas as pd

    ev = table(spark, sf_dir, 'events')
    n_buckets = max(1, spark.sparkContext.defaultParallelism) * 4
    bucket = F.pmod(F.xxhash64('user_id'), F.lit(n_buckets))
    clicks = ev.filter(F.col('event_type') == 'click').select(
        'user_id', F.col('event_id').alias('click_id'), F.col('ts').alias('click_ts')
    ).withColumn('b', bucket)
    views = ev.filter(F.col('event_type') == 'view').select(
        'user_id', F.col('event_id').alias('view_id'), F.col('ts').alias('view_ts')
    ).withColumn('b', bucket)

    cols = ['user_id', 'click_id', 'click_ts', 'view_id', 'view_ts']

    def asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=cols)
        # NULL-ts rows: merge_asof rejects NaT keys outright, but the SQL
        # semantics are graceful — a NULL view_ts matches nothing, a NULL
        # click_ts keeps its row with NULL view columns (the <= predicate
        # is NULL). Mirror that instead of crashing.
        right = right.dropna(subset=['view_ts']).sort_values(
            ['view_ts', 'view_id']
        )
        nat = left['click_ts'].isna()
        out = pd.merge_asof(
            left[~nat].sort_values(['click_ts', 'click_id']),
            right.drop(columns=['b']),
            by='user_id',
            left_on='click_ts',
            right_on='view_ts',
            direction='backward',
            allow_exact_matches=True,
        )
        if nat.any():
            stranded = left[nat].copy()
            stranded['view_id'] = pd.NA
            stranded['view_ts'] = pd.NaT
            out = pd.concat([out, stranded[cols]], ignore_index=True)
        out['view_id'] = out['view_id'].astype('Int64')
        return out[cols]

    return (
        clicks.groupBy('b')
        .cogroup(views.groupBy('b'))
        .applyInPandas(
            asof,
            'user_id long, click_id long, click_ts timestamp_ntz, '
            'view_id long, view_ts timestamp_ntz',
        )
    )


@register(
    'events_transition_matrix',
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type,
           COUNT(*) AS n_transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def events_transition_matrix(spark, sf_dir):
    """First-order Markov transition counts over per-user event sequences —
    the sequence-feature extraction behind next-event models and
    behavioral-anomaly scoring.

    One shuffle on user_id orders each user's history (lag window), then
    the transition counts partial-aggregate on the (prev, next) pair —
    a TYPES^2-row result whatever the event volume. The deterministic
    (ts, event_id) tiebreak makes the lag, and therefore every count,
    exact across engines.
    """
    ev = table(spark, sf_dir, 'events')
    w = Window.partitionBy('user_id').orderBy('ts', 'event_id')
    seq = ev.select(
        'event_type', F.lag('event_type').over(w).alias('prev_type')
    )
    return (
        seq.filter(F.col('prev_type').isNotNull())
        .groupBy('prev_type', F.col('event_type').alias('next_type'))
        .agg(F.count(F.lit(1)).alias('n_transitions'))
    )


# ---------------------------------------------------------------------------
# Inter-arrival time features — the burstiness profile of each user's event
# stream (bot detection, rate anomaly features). Gaps are exact integer
# microseconds from one lag window; the aggregates stay integral except two
# IEEE divides on identical operands (mean, burstiness = max/mean).
# Scale: one shuffle on user_id shared by the window and the aggregate
# (same partitioning, AQE reuses the exchange); no self-join.
# ---------------------------------------------------------------------------


@register(
    'events_interarrival_stats',
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
    )
    SELECT user_id,
           COUNT(gap_us) AS n_gaps,
           CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) AS mean_gap_us,
           CAST(MAX(gap_us) AS DOUBLE)
               / (CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us)) AS burstiness
    FROM gaps
    WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def events_interarrival_stats(spark, sf_dir):
    """Per-user inter-arrival gap statistics in exact integer microseconds
    plus two deterministic IEEE divides (module note)."""
    ev = table(spark, sf_dir, 'events')
    w = Window.partitionBy('user_id').orderBy('ts', 'event_id')
    # ts is TIMESTAMP_NTZ; unix_micros needs an instant (UTC sessions, and
    # the lag DIFFERENCE cancels any fixed offset anyway)
    us = F.unix_micros(F.col('ts').cast('timestamp'))
    gaps = ev.select(
        'user_id', (us - F.lag(us).over(w)).alias('gap_us')
    ).filter(F.col('gap_us').isNotNull())
    mean = F.sum('gap_us').cast('double') / F.count('gap_us')
    return gaps.groupBy('user_id').agg(
        F.count('gap_us').alias('n_gaps'),
        F.sum('gap_us').cast('bigint').alias('sum_gap_us'),
        F.min('gap_us').cast('bigint').alias('min_gap_us'),
        F.max('gap_us').cast('bigint').alias('max_gap_us'),
        mean.alias('mean_gap_us'),
        (F.max('gap_us').cast('double') / mean).alias('burstiness'),
    )


# ---------------------------------------------------------------------------
# Numeric profiling: fixed 20-bin histogram of the value column with
# data-derived edges — the distribution summary every profiler emits.
# Scale: pass 1 is a 1-row min/max aggregate (broadcast); pass 2 bins with
# a pure expression and aggregates to 20 rows map-side. Both engines
# compute bin = floor((v - min) * 20 / (max - min)) with the same IEEE op
# sequence (and clamp the v = max edge into the last bin), so the integer
# bins are identical.
# ---------------------------------------------------------------------------


@register(
    'events_value_histogram',
    oracle="""
    WITH mm AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events)
    SELECT LEAST(CAST(floor((value - lo) * 20 / (hi - lo)) AS BIGINT), 19)
               AS bin,
           COUNT(*) AS n
    FROM events, mm
    GROUP BY 1
    """,
)
def events_value_histogram(spark, sf_dir):
    """Fixed 20-bin histogram with broadcast min/max edges (module note)."""
    ev = table(spark, sf_dir, 'events')
    mm = ev.agg(F.min('value').alias('lo'), F.max('value').alias('hi'))
    bin_ = F.least(
        F.floor((F.col('value') - F.col('lo')) * 20 / (F.col('hi') - F.col('lo')))
        .cast('bigint'),
        F.lit(19).cast('bigint'),
    )
    return (
        ev.crossJoin(F.broadcast(mm))
        .groupBy(bin_.alias('bin'))
        .agg(F.count(F.lit(1)).alias('n'))
    )


# ---------------------------------------------------------------------------
# A/B experiment readout — deterministic arm assignment (hash of user_id,
# the idempotent bucketing every experimentation platform uses) and the
# per-arm conversion readout with relative lift. All counts integral; the
# three rate/lift divides are IEEE ops on identical operands.
# Scale: one shuffle on user_id for the per-user flags, then a 2-row
# aggregate; the readout joins nothing.
# ---------------------------------------------------------------------------


@register(
    'events_ab_test_lift',
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         IN ('0','1','2','3','4','5','6','7')
                    THEN 'A' ELSE 'B' END AS arm,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    )
    SELECT arm,
           COUNT(*) AS n_users,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST(SUM(converted) AS DOUBLE) / COUNT(*) AS conv_rate
    FROM per_user GROUP BY arm
    """,
)
def events_ab_test_lift(spark, sf_dir):
    """Per-arm conversion readout under deterministic hash bucketing."""
    ev = table(spark, sf_dir, 'events')
    arm = F.when(
        F.substring(F.md5(F.col('user_id').cast('string')), 1, 1).isin(*'01234567'),
        'A',
    ).otherwise('B')
    per_user = ev.groupBy('user_id').agg(
        F.max(
            F.when(F.col('event_type') == 'purchase', 1).otherwise(0)
        ).alias('converted')
    ).select(arm.alias('arm'), 'converted')
    return per_user.groupBy('arm').agg(
        F.count(F.lit(1)).alias('n_users'),
        F.sum('converted').cast('bigint').alias('n_converted'),
        (F.sum('converted').cast('double') / F.count(F.lit(1))).alias('conv_rate'),
    )


# ---------------------------------------------------------------------------
# Engagement stickiness — DAU joined to its week's WAU (DAU/WAU ratio per
# day). Exact distincts at gate scale; the 100 TB swap-in is the bitmap
# pattern (events_bitmap_distinct_users) or HLL sketches per day, unioned
# per week — same output contract.
# Scale: two combinable distinct aggregates (day grain, week grain) and a
# broadcast join of the 7x-smaller week table back onto days.
# ---------------------------------------------------------------------------


@register(
    'events_dau_wau_stickiness',
    oracle="""
    WITH dau AS (
        SELECT date_trunc('day', ts) AS day,
               COUNT(DISTINCT user_id) AS dau
        FROM events GROUP BY 1
    ),
    wau AS (
        SELECT date_trunc('week', ts) AS week,
               COUNT(DISTINCT user_id) AS wau
        FROM events GROUP BY 1
    )
    SELECT day, dau, wau,
           CAST(dau AS DOUBLE) / wau AS stickiness
    FROM dau JOIN wau ON date_trunc('week', day) = week
    """,
)
def events_dau_wau_stickiness(spark, sf_dir):
    """Per-day DAU/WAU ratio with a broadcast week-level aggregate."""
    ev = table(spark, sf_dir, 'events')
    tt = ev.schema['ts'].dataType
    dau = ev.groupBy(
        F.date_trunc('day', 'ts').cast(tt).alias('day')
    ).agg(F.countDistinct('user_id').alias('dau'))
    wau = ev.groupBy(
        F.date_trunc('week', 'ts').cast(tt).alias('week')
    ).agg(F.countDistinct('user_id').alias('wau'))
    return (
        dau.join(
            F.broadcast(wau),
            F.date_trunc('week', 'day').cast(tt) == F.col('week'),
        )
        .select(
            'day', 'dau', 'wau',
            (F.col('dau').cast('double') / F.col('wau')).alias('stickiness'),
        )
    )


# ---------------------------------------------------------------------------
# CDC compaction WITH TOMBSTONES — the delete semantics
# events_cdc_compaction omits: a changelog carries upserts AND deletes,
# and compaction must (1) pick the LAST operation per key (ts, unique-id
# tiebreak), then (2) drop keys whose last operation is a delete. The op
# column is synthesized deterministically from the event id (md5 first
# hex in {e, f} -> ~1/8 deletes) since the fixture log has no op column;
# swapping in a real op column changes one expression.
# Scale: identical shape to the upsert-only path — ONE max_by partial
# aggregate (the op rides in the payload struct), then a pure filter; no
# window sort of the log, no second pass. This is the MERGE INTO ...
# WHEN MATCHED AND op = 'D' THEN DELETE statement in combinable form.
# ---------------------------------------------------------------------------


@register(
    'events_cdc_tombstones',
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
def events_cdc_tombstones(spark, sf_dir):
    """Last-write-wins compaction honoring delete tombstones — see the
    module note; the delete filter applies AFTER the argmax (a delete
    followed by nothing must erase the key, not resurrect an older row)."""
    ev = table(spark, sf_dir, 'events')
    op = F.when(
        F.substring(F.md5(F.col('event_id').cast('string')), 1, 1).isin('e', 'f'),
        'D',
    ).otherwise('U')
    return (
        ev.select('user_id', 'event_type', 'event_id', 'ts', 'value', op.alias('op'))
        .groupBy('user_id', 'event_type')
        .agg(
            F.max_by(
                F.struct('event_id', 'ts', 'value', 'op'),
                F.struct('ts', 'event_id'),
            ).alias('last')
        )
        .filter(F.col('last.op') == 'U')
        .select(
            'user_id',
            'event_type',
            F.col('last.event_id').alias('event_id'),
            F.col('last.ts').alias('ts'),
            F.col('last.value').alias('value'),
        )
    )


# ---------------------------------------------------------------------------
# UDTF with a TABLE argument (Spark 4 polymorphic table function): the
# operator shape for per-partition sequential logic that windows cannot
# state cleanly — here, the longest consecutive same-type run per user.
# PARTITION BY user_id ORDER BY (ts, event_id) hands each UDTF instance
# ONE user's ordered stream; state is O(|event types|) per instance and
# results emit at partition end (terminate). The oracle states the same
# semantics relationally (gaps-and-islands double row_number).
# Scale: one shuffle on user_id — identical to the window formulation —
# but the Python instance sees rows AS AN ORDERED STREAM, which is what
# CEP-style logic (resets, thresholds, grammars) needs and frame-based
# windows can't express without N self-joins.
# ---------------------------------------------------------------------------


@register(
    'events_udtf_longest_run',
    oracle="""
    WITH s AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)
             - ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id)
                   AS grp
        FROM events
    ),
    runs AS (
        SELECT user_id, event_type, COUNT(*) AS run_len
        FROM s GROUP BY user_id, event_type, grp
    )
    SELECT user_id, event_type, CAST(MAX(run_len) AS BIGINT) AS max_run
    FROM runs GROUP BY user_id, event_type
    """,
)
def events_udtf_longest_run(spark, sf_dir):
    """Longest same-type streak per user via a TABLE-argument UDTF — see
    the module note for when this beats a window statement."""
    from pyspark.sql.functions import udtf

    @udtf(returnType='user_id: bigint, event_type: string, max_run: bigint')
    class LongestRuns:
        def __init__(self):
            self._user = None
            self._prev = None
            self._cur = 0
            self._best: dict[str, int] = {}

        def eval(self, row):
            self._user = row['user_id']
            t = row['event_type']
            self._cur = self._cur + 1 if t == self._prev else 1
            self._prev = t
            if self._cur > self._best.get(t, 0):
                self._best[t] = self._cur

        def terminate(self):
            for t, n in self._best.items():
                yield self._user, t, n

    spark.udtf.register('longest_runs', LongestRuns)
    table(spark, sf_dir, 'events').createOrReplaceTempView('__events_for_udtf')
    return spark.sql(
        """
        SELECT * FROM longest_runs(
            TABLE(__events_for_udtf)
            PARTITION BY user_id ORDER BY (ts, event_id)
        )
        """
    )


# ---------------------------------------------------------------------------
# Point-in-time (AS OF) snapshot over the changelog — time travel without a
# table format: restrict the log to ts <= T, then the same last-write-wins
# compaction. What Delta/Iceberg VERSION AS OF does from its metadata log,
# stated directly on the event log.
# Scale: the AS OF predicate pushes to the parquet scan (with time-
# partitioned logs it prunes whole partitions), then ONE combinable
# max_by aggregate — reconstruction cost scales with the log BEFORE T,
# not total history.
# ---------------------------------------------------------------------------


@register(
    'events_cdc_asof_snapshot',
    oracle="""
    SELECT user_id, event_type, event_id, ts, value
    FROM events
    WHERE ts <= TIMESTAMP '2024-01-08 00:00:00'
    QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC
    ) = 1
    """,
)
def events_cdc_asof_snapshot(spark, sf_dir):
    """Table state AS OF 2024-01-08: pushdown time filter + LWW argmax."""
    ev = table(spark, sf_dir, 'events')
    cutoff = F.lit('2024-01-08 00:00:00').cast(ev.schema['ts'].dataType)
    return (
        ev.filter(F.col('ts') <= cutoff)
        .groupBy('user_id', 'event_type')
        .agg(
            F.max_by(
                F.struct('event_id', 'ts', 'value'),
                F.struct('ts', 'event_id'),
            ).alias('last')
        )
        .select(
            'user_id',
            'event_type',
            F.col('last.event_id').alias('event_id'),
            F.col('last.ts').alias('ts'),
            F.col('last.value').alias('value'),
        )
    )


# ---------------------------------------------------------------------------
# Concurrent-interval counting (sweep line) — how many sessions are open
# at once, per user stream: derive sessions (the sessionization intervals),
# emit +1/-1 boundary events, cumulative-sum in time order. The interval-
# overlap question answered WITHOUT an interval self-join — the self-join
# statement is O(n^2) in overlapping intervals; the sweep is one sort.
# Tie rule stated identically on both engines: at an identical instant,
# starts count before ends (delta DESC), i.e. touching intervals overlap.
# Scale: boundaries are 2 rows per session; the cumsum window is global
# ordered — for a per-key sweep (typical: concurrency per server/tenant)
# it partitions by that key; the global form shown here is the
# whole-system concurrency curve whose input is already session-sized
# (2 rows per session), thousands of times smaller than the event log.
# ---------------------------------------------------------------------------


@register(
    'events_concurrent_sessions',
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts > lag(ts) OVER w + INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id,
               ts
        FROM flagged
    ),
    intervals AS (
        SELECT user_id, session_id, MIN(ts) AS s, MAX(ts) AS e
        FROM sessions GROUP BY user_id, session_id
    ),
    boundaries AS (
        SELECT s AS t, 1 AS delta, user_id, session_id FROM intervals
        UNION ALL
        SELECT e AS t, -1 AS delta, user_id, session_id FROM intervals
    )
    SELECT t, delta, user_id, session_id,
           CAST(SUM(delta) OVER (
               ORDER BY t, delta DESC, user_id, session_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_open
    FROM boundaries
    """,
)
def events_concurrent_sessions(spark, sf_dir):
    """Sweep-line concurrency over session intervals (module note)."""
    ev = table(spark, sf_dir, 'events')
    w = Window.partitionBy('user_id').orderBy('ts', 'event_id')
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag('ts').over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.col('ts') > prev_ts + F.expr("INTERVAL '30' MINUTE")),
        1,
    ).otherwise(0)
    intervals = (
        ev.select('user_id', 'event_id', 'ts')
        .withColumn('new_session', new_session)
        .withColumn('session_id', F.sum('new_session').over(cum).cast('bigint'))
        .groupBy('user_id', 'session_id')
        .agg(F.min('ts').alias('s'), F.max('ts').alias('e'))
    )
    starts = intervals.select(
        F.col('s').alias('t'), F.lit(1).alias('delta'), 'user_id', 'session_id'
    )
    ends = intervals.select(
        F.col('e').alias('t'), F.lit(-1).alias('delta'), 'user_id', 'session_id'
    )
    sweep = Window.orderBy(
        't', F.col('delta').desc(), 'user_id', 'session_id'
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return starts.unionByName(ends).select(
        't', 'delta', 'user_id', 'session_id',
        F.sum('delta').over(sweep).cast('bigint').alias('n_open'),
    )


# ---------------------------------------------------------------------------
# Slowly-changing dimension, type 2: compress a changelog into validity
# intervals. The event stream is the changelog of each user's tracked
# attribute (event_type here); SCD2 keeps ONE row per distinct run of the
# attribute with [valid_from, valid_to) and an is_current flag — the shape
# every warehouse dimension load emits.
# Scale: one shuffle on user_id serves both windows (change detection and
# interval stitching run over the same partitioning+ordering, so Catalyst
# plans a single Exchange + sort); no self-join, no per-row state. At 100 TB
# the changelog is time-partitioned and the load is incremental — the same
# two-window statement over (previous dim current rows UNION new changelog
# slice), which this batch form is the oracle for.
# ---------------------------------------------------------------------------


@register(
    'events_scd2_dimension',
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev
        FROM events
    ),
    chg AS (
        SELECT user_id, event_type, ts, event_id FROM c
        WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type AS attr, ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           CAST(row_number() OVER w AS BIGINT) AS version,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM chg
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def events_scd2_dimension(spark, sf_dir):
    """Type-2 SCD build from a changelog (module note above)."""
    ev = table(spark, sf_dir, 'events')
    w = Window.partitionBy('user_id').orderBy('ts', 'event_id')
    chg = (
        ev.select('user_id', 'event_type', 'ts', 'event_id')
        .withColumn('prev', F.lag('event_type').over(w))
        .filter(
            F.col('prev').isNull() | (F.col('prev') != F.col('event_type'))
        )
    )
    return chg.select(
        'user_id',
        F.col('event_type').alias('attr'),
        F.col('ts').alias('valid_from'),
        F.lead('ts').over(w).alias('valid_to'),
        F.row_number().over(w).cast('bigint').alias('version'),
        F.lead('ts').over(w).isNull().alias('is_current'),
    )


# ---------------------------------------------------------------------------
# Snapshot reconciliation: diff the per-user last-write-wins state of two
# extract windows and classify each key as added / removed / changed —
# the anti-entropy check run between a source system and its replica (or
# two pipeline runs) before promoting a dataset.
# Scale: each side is ONE combinable max_by aggregate (the
# events_cdc_asof_snapshot shape), then a single full-outer equi-join on
# the key. No windows, no collect; unchanged keys are dropped before any
# driver sees them. With bucketed state tables both sides co-locate and
# the join is exchange-free.
# ---------------------------------------------------------------------------


@register(
    'events_snapshot_diff',
    oracle="""
    WITH w1 AS (
        SELECT user_id, event_type, value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
          AND ts <  TIMESTAMP '2024-01-10 00:00:00'
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        ) = 1
    ),
    w2 AS (
        SELECT user_id, event_type, value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
          AND ts <  TIMESTAMP '2024-01-20 00:00:00'
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        ) = 1
    )
    SELECT COALESCE(w1.user_id, w2.user_id) AS user_id,
           CASE WHEN w1.user_id IS NULL THEN 'added'
                WHEN w2.user_id IS NULL THEN 'removed'
                ELSE 'changed' END AS status,
           w1.event_type AS old_type, w2.event_type AS new_type,
           w1.value AS old_value, w2.value AS new_value
    FROM w1 FULL OUTER JOIN w2 ON w1.user_id = w2.user_id
    WHERE w1.user_id IS NULL OR w2.user_id IS NULL
       OR w1.event_type <> w2.event_type OR w1.value <> w2.value
    """,
)
def events_snapshot_diff(spark, sf_dir):
    """Anti-entropy diff of two LWW snapshots (module note above)."""
    ev = table(spark, sf_dir, 'events')
    ts_t = ev.schema['ts'].dataType

    def state(lo: str, hi: str):
        return (
            ev.filter(
                (F.col('ts') >= F.lit(lo).cast(ts_t))
                & (F.col('ts') < F.lit(hi).cast(ts_t))
            )
            .groupBy('user_id')
            .agg(
                F.max_by(
                    F.struct('event_type', 'value'), F.struct('ts', 'event_id')
                ).alias('last')
            )
            .select(
                'user_id',
                F.col('last.event_type').alias('event_type'),
                F.col('last.value').alias('value'),
            )
        )

    w1 = state('2024-01-01 00:00:00', '2024-01-10 00:00:00').alias('w1')
    w2 = state('2024-01-10 00:00:00', '2024-01-20 00:00:00').alias('w2')
    joined = w1.join(w2, F.col('w1.user_id') == F.col('w2.user_id'), 'full')
    status = (
        F.when(F.col('w1.user_id').isNull(), 'added')
        .when(F.col('w2.user_id').isNull(), 'removed')
        .otherwise('changed')
    )
    return joined.filter(
        F.col('w1.user_id').isNull()
        | F.col('w2.user_id').isNull()
        | (F.col('w1.event_type') != F.col('w2.event_type'))
        | (F.col('w1.value') != F.col('w2.value'))
    ).select(
        F.coalesce(F.col('w1.user_id'), F.col('w2.user_id')).alias('user_id'),
        status.alias('status'),
        F.col('w1.event_type').alias('old_type'),
        F.col('w2.event_type').alias('new_type'),
        F.col('w1.value').alias('old_value'),
        F.col('w2.value').alias('new_value'),
    )


# ---------------------------------------------------------------------------
# ML feature engineering on a time series: per-user daily rollup with lag
# and rolling-window features — the standard offline feature-store shape
# (one row per (entity, day) with trailing aggregates the model trains on).
# Daily sums accumulate in DECIMAL (order-independent, so shuffle order
# can't flip a bit); the rolling sum stays decimal inside the frame and
# casts to double only at the end; lag copies the exact value. Frames are
# ROWS-based ("previous 2 OBSERVED days"), stated identically both sides.
# Scale: ONE shuffle on user_id serves the daily aggregate, the lag and
# the rolling frame (the window reuses the aggregate's partitioning);
# frames are O(1) per row. This is the per-key sequential-feature pass
# every training pipeline runs over an event log.
# ---------------------------------------------------------------------------


@register(
    'events_feature_lags',
    oracle="""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               SUM(CAST(value AS DECIMAL(28,6))) AS dv,
               COUNT(*) AS n_events
        FROM events GROUP BY user_id, date_trunc('day', ts)
    )
    SELECT user_id, day,
           CAST(dv AS DOUBLE) AS day_value,
           n_events,
           CAST(lag(dv) OVER (
               PARTITION BY user_id ORDER BY day
           ) AS DOUBLE) AS prev_value,
           CAST(SUM(dv) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS DOUBLE)
           / COUNT(*) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS rolling3
    FROM daily
    """,
)
def events_feature_lags(spark, sf_dir):
    """Per-user daily lag/rolling feature table (module note above)."""
    ev = table(spark, sf_dir, 'events')
    tt = ev.schema['ts'].dataType
    daily = (
        ev.groupBy('user_id', F.date_trunc('day', 'ts').cast(tt).alias('day'))
        .agg(
            F.sum(F.col('value').cast('decimal(28,6)')).alias('dv'),
            F.count(F.lit(1)).alias('n_events'),
        )
    )
    w = Window.partitionBy('user_id').orderBy('day')
    frame = w.rowsBetween(-2, 0)
    return daily.select(
        'user_id',
        'day',
        F.col('dv').cast('double').alias('day_value'),
        'n_events',
        F.lag('dv').over(w).cast('double').alias('prev_value'),
        (
            F.sum('dv').over(frame).cast('double')
            / F.count(F.lit(1)).over(frame)
        ).alias('rolling3'),
    )


# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance: the "don't reprocess 100 TB for
# today's increment" pattern. A per-(user, type) aggregate snapshot is
# materialized from the historical log (here: everything before Jan 24),
# persisted to parquet as MERGEABLE PARTIALS — count as BIGINT and the value
# sum kept in the exact DECIMAL(28,6) accumulator, NOT yet cast to double —
# then the day's delta batch is aggregated alone and MERGED into the
# snapshot (union + re-aggregate: counts add, decimal sums add). Because
# decimal addition is exact and associative, merged-state == full-recompute
# bit-for-bit, which is precisely what the oracle asserts by recomputing
# over the whole log. (A double-valued snapshot would NOT be
# self-maintainable: (a+b)+c != a+(b+c) in floats.)
#
# Scale: the snapshot is keys-sized, not log-sized; each maintenance run
# scans ONLY the delta, shuffles it once on the view key, and rewrites the
# touched snapshot partitions (here: whole-snapshot rewrite; a real lake
# layout partitions the snapshot by key range and uses dynamic partition
# overwrite, already pinned in tests/test_sinks.py). AVG/stddev-style views
# derive from the same (count, sum, sum-of-squares) partials; MIN/MAX are
# likewise mergeable; exact DISTINCT views need the bitmap partials shipped
# as `events_bitmap_distinct_users`.
# ---------------------------------------------------------------------------

_MV_CUTOFF = '2024-01-24 00:00:00'


@register(
    'pipeline_mv_incremental',
    oracle=f"""
    SELECT user_id, event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY user_id, event_type
    """,
)
def pipeline_mv_incremental(spark, sf_dir):
    """Merge a delta batch into a materialized aggregate snapshot; the
    result equals full recompute (module note above)."""
    from ..scratch import scratch_dir
    from ._helpers import DEC

    ev = table(spark, sf_dir, 'events')
    cutoff = F.lit(_MV_CUTOFF).cast('timestamp')

    def partials(df):
        return df.groupBy('user_id', 'event_type').agg(
            F.count(F.lit(1)).alias('n_events'),
            F.sum(F.col('value').cast(DEC)).alias('value_dec'),
        )

    # Materialize the historical snapshot (deterministic scratch path under
    # the ownership-verified per-uid parent, same idiom as the CDC sinks:
    # wipe + rewrite so reruns reuse one dir; create=False because the
    # parquet writer insists on creating its own target).
    base = scratch_dir('cb_mv', f'mv|{sf_dir}', wipe=True, create=False)
    partials(ev.filter(F.col('ts') < cutoff)).write.parquet(base)
    snapshot = spark.read.parquet(base)

    delta = partials(ev.filter(F.col('ts') >= cutoff))
    return (
        snapshot.unionByName(delta)
        .groupBy('user_id', 'event_type')
        .agg(
            F.sum('n_events').cast('bigint').alias('n_events'),
            F.sum('value_dec').cast('double').alias('total_value'),
        )
    )


# ---------------------------------------------------------------------------
# Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): the missing-key
# segment is a REAL segment — a plain equi-join silently drops every row
# whose join key is NULL (unattributed traffic, unparsed props), which at
# 100 TB is a silently-wrong rollup, not an error. The null-safe operator
# keeps the NULL bucket joinable to its dim row ('unattributed') while
# still planning as a broadcast HASH join (null-safe equality hashes the
# key's null flag; it does NOT degrade to a nested-loop join — pinned in
# tests/test_plans.py).
# ---------------------------------------------------------------------------


@register(
    'join_null_safe_eq',
    oracle=f"""
    WITH ev AS (
        SELECT NULLIF(CAST(json_extract(props, '$.k') AS BIGINT) % 10, 7)
                   AS seg,
               value
        FROM events
    ),
    dim(seg, tier) AS (
        SELECT * FROM (VALUES
            (0, 'low'), (1, 'low'), (2, 'low'), (3, 'low'), (4, 'low'),
            (5, 'high'), (6, 'high'), (8, 'high'), (9, 'high'),
            (CAST(NULL AS BIGINT), 'unattributed'))
    )
    SELECT d.tier,
           COUNT(*) AS n_events,
           {sql_dsum('ev.value')} AS total_value
    FROM ev JOIN dim d ON ev.seg IS NOT DISTINCT FROM d.seg
    GROUP BY d.tier
    """,
)
def join_null_safe_eq(spark, sf_dir):
    """Null-safe dim decode: the NULL segment joins its 'unattributed' dim
    row instead of being dropped (module note above)."""
    ev = table(spark, sf_dir, 'events').select(
        F.nullif(
            F.get_json_object('props', '$.k').cast('bigint') % 10, F.lit(7)
        ).alias('seg'),
        'value',
    )
    rows = [(s, 'low') for s in range(5)] + [
        (s, 'high') for s in (5, 6, 8, 9)
    ] + [(None, 'unattributed')]
    dim = spark.createDataFrame(rows, 'seg bigint, tier string')
    return (
        ev.join(F.broadcast(dim), ev['seg'].eqNullSafe(dim['seg']))
        .groupBy('tier')
        .agg(
            F.count(F.lit(1)).alias('n_events'),
            dsum('value').alias('total_value'),
        )
    )


# ---------------------------------------------------------------------------
# Key-skew profiler: the per-key distribution statistics that decide
# between the plain and the salted shuffle path (the adaptive LSH gate and
# skew_salted_agg are the consumers of exactly this shape). Two-level
# aggregation: per (event_type, user_id) counts — map-side combinable —
# then per event_type: row mass, key count, hottest key's row count and
# its share of the type's rows. skew_ratio = max/avg is the number a
# planner compares against a salt threshold; at 100 TB this query costs
# one narrow shuffle on the composite key and replaces guessing about
# skew with measurement.
# ---------------------------------------------------------------------------


@register(
    'events_skew_profile',
    oracle="""
    WITH per_key AS (
        SELECT event_type, user_id, COUNT(*) AS c
        FROM events GROUP BY event_type, user_id
    )
    SELECT event_type,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           COUNT(*) AS n_keys,
           MAX(c) AS max_key_rows,
           CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS max_key_share,
           CAST(MAX(c) AS DOUBLE) * COUNT(*) / CAST(SUM(c) AS DOUBLE)
               AS skew_ratio
    FROM per_key GROUP BY event_type
    """,
)
def events_skew_profile(spark, sf_dir):
    """Heavy-hitter skew statistics per event type (see module note)."""
    per_key = (
        table(spark, sf_dir, 'events')
        .groupBy('event_type', 'user_id')
        .agg(F.count(F.lit(1)).alias('c'))
    )
    n_rows = F.sum('c').cast('bigint')
    return per_key.groupBy('event_type').agg(
        n_rows.alias('n_rows'),
        F.count(F.lit(1)).alias('n_keys'),
        F.max('c').alias('max_key_rows'),
        (F.max('c').cast('double') / n_rows.cast('double')).alias(
            'max_key_share'
        ),
        (
            F.max('c').cast('double')
            * F.count(F.lit(1))
            / n_rows.cast('double')
        ).alias('skew_ratio'),
    )


# ---------------------------------------------------------------------------
# Interval-overlap join via bucket blocking: sessions x incident windows.
# Spark has no native interval join, and the naive statement (a theta join
# on s_start <= i_end AND i_start <= s_end) degenerates to a broadcast
# nested loop — O(S x I) comparisons. The scale path decomposes each
# interval into the fixed-width time buckets it covers (sequence+explode:
# an interval of length L yields L/bucket + 1 rows), equi-joins on the
# bucket, re-checks the EXACT overlap predicate, and dedups pairs that
# co-occur in several buckets. Recall is exact by construction: two
# intervals overlapping at instant t both cover t's bucket. Bucket width
# trades fan-out against join selectivity — hour buckets fit the 10-60 min
# intervals here; a production deploy picks width ~ median interval length.
# Overlap duration is exact integer microseconds (epoch-micros arithmetic,
# identical in both engines).
# ---------------------------------------------------------------------------


_SQL_SESSION_IVALS = """
    flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts > lag(ts) OVER w + INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id,
               ts
        FROM flagged
    ), sess AS (
        SELECT user_id, session_id,
               MIN(ts) AS s_start, MAX(ts) AS s_end
        FROM sessions GROUP BY user_id, session_id
    ), incidents AS (
        SELECT event_id AS incident_id, ts AS i_start,
               ts + INTERVAL '10 minutes' AS i_end
        FROM events WHERE event_type = 'error'
    )"""


@register(
    'join_interval_bucketed',
    oracle=f"""
    WITH {_SQL_SESSION_IVALS}
    SELECT user_id, session_id, incident_id,
           (epoch_us(CASE WHEN s_end < i_end THEN s_end ELSE i_end END)
            - epoch_us(CASE WHEN s_start > i_start THEN s_start ELSE i_start END))
               AS overlap_us
    FROM sess JOIN incidents
      ON s_start <= i_end AND i_start <= s_end
    """,
)
def join_interval_bucketed(spark, sf_dir):
    """Session-x-incident interval overlap join, bucket-blocked (see the
    module note). The oracle states the same pair set as a plain theta
    join."""
    ev = table(spark, sf_dir, 'events')
    w = Window.partitionBy('user_id').orderBy('ts', 'event_id')
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag('ts').over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.col('ts') > prev_ts + F.expr("INTERVAL '30' MINUTE")),
        1,
    ).otherwise(0)
    sess = (
        ev.select('user_id', 'event_id', 'ts')
        .withColumn('new_session', new_session)
        .withColumn('session_id', F.sum('new_session').over(cum))
        .groupBy('user_id', 'session_id')
        .agg(F.min('ts').alias('s_start'), F.max('ts').alias('s_end'))
    )
    inc = ev.filter(F.col('event_type') == 'error').select(
        F.col('event_id').alias('incident_id'),
        F.col('ts').alias('i_start'),
        (F.col('ts') + F.expr("INTERVAL '10' MINUTE")).alias('i_end'),
    )

    def buckets(start, end):
        return F.explode(
            F.sequence(
                F.date_trunc('hour', start).cast('timestamp_ntz'),
                F.date_trunc('hour', end).cast('timestamp_ntz'),
                F.expr("INTERVAL '1' HOUR"),
            )
        )

    sb = sess.withColumn('bucket', buckets(F.col('s_start'), F.col('s_end')))
    ib = inc.withColumn('bucket', buckets(F.col('i_start'), F.col('i_end')))
    overlap = (F.col('s_start') <= F.col('i_end')) & (
        F.col('i_start') <= F.col('s_end')
    )
    # timestampdiff on the NTZ values directly — no instant cast, so the
    # result cannot depend on the session timezone (an offset would cancel
    # between the two endpoints anyway, but a DST jump between them would
    # not).
    overlap_us = F.expr(
        'timestampdiff(MICROSECOND, greatest(s_start, i_start), '
        'least(s_end, i_end))'
    )
    return (
        sb.join(ib, 'bucket')
        .filter(overlap)
        .select('user_id', 'session_id', 'incident_id')
        .distinct()
        .join(sess, ['user_id', 'session_id'])
        .join(inc, 'incident_id')
        .select(
            'user_id', 'session_id', 'incident_id',
            overlap_us.alias('overlap_us'),
        )
    )


# ---------------------------------------------------------------------------
# Per-user EWMA via an ordered array fold: s_1 = v_1, s_i = s_{i-1}/2 +
# v_i/2 over each user's events in (ts, event_id) order. Sequential
# recurrences have no shuffle-order-free aggregate form, so the canonical
# distributed shape is: ONE shuffle groups each key's rows, array_sort
# imposes the event order inside the executor, and a fold over the sorted
# array runs the recurrence — no window over a global sort, no iterative
# jobs. At 100 TB the per-user list is bounded by a session/window horizon
# (the same collect_list bound every stateful op here uses).
#
# Determinism: alpha = 1/2 makes every step an exact IEEE halving-and-add
# evaluated in the SAME order in both engines (Spark `aggregate` and DuckDB
# `list_reduce` both fold left over the first-element seed), so the result
# is bit-exact, not tolerance-matched.
# ---------------------------------------------------------------------------


@register(
    'events_ewma_fold',
    oracle=r"""
    WITH ordered AS (
        SELECT user_id,
               list_transform(
                   list_sort(list({'ts': ts, 'eid': event_id, 'v': value})),
                   s -> s.v) AS vals
        FROM events
        GROUP BY user_id
    )
    SELECT user_id,
           len(vals) AS n_events,
           CAST(list_reduce(vals,
                (s, x) -> s * 0.5::DOUBLE + x * 0.5::DOUBLE) AS DOUBLE)
               AS ewma
    FROM ordered
    """,
)
def events_ewma_fold(spark, sf_dir):
    """Per-user EWMA (alpha = 1/2) by ordered array fold (module note)."""
    ev = table(spark, sf_dir, 'events')
    ordered = ev.groupBy('user_id').agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct('ts', 'event_id', 'value'))
            ),
            lambda s: s.value,
        ).alias('vals')
    )
    return ordered.select(
        'user_id',
        F.size('vals').cast('bigint').alias('n_events'),
        F.expr(
            'aggregate(slice(vals, 2, size(vals) - 1), '
            'CAST(element_at(vals, 1) AS DOUBLE), '
            '(s, x) -> s * 0.5D + x * 0.5D)'
        ).alias('ewma'),
    )


# ---------------------------------------------------------------------------
# Sessionization parameter sweep: the same gap-based session logic as
# events_sessionization, swept over the idle-timeout parameter in ONE plan
# — the relational statement of the graph algebra's param-sweep pattern
# (graph_param_sweep_broadcast): a 3-row timeout dim broadcasts into the
# events scan, every window partitions by (user_id, timeout) so the three
# sweeps sessionize in the SAME two sorted passes, and the output is the
# one-row-per-timeout elbow curve an operator actually tunes on.
# Determinism: gaps compare as integer microsecond differences (no
# interval arithmetic); durations sum as exact BIGINT microseconds; the
# average is one IEEE divide of identical operands.
# ---------------------------------------------------------------------------


@register(
    'events_sessionization_sweep',
    oracle="""
    WITH swept AS (
        SELECT e.user_id, e.event_id, e.ts, p.timeout_min
        FROM events e CROSS JOIN (VALUES (10), (30), (90)) p(timeout_min)
    ),
    flagged AS (
        SELECT *,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR datediff('microsecond', lag(ts) OVER w, ts)
                            > timeout_min * 60000000::BIGINT
                    THEN 1 ELSE 0 END AS new_session
        FROM swept
        WINDOW w AS (PARTITION BY timeout_min, user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT *, SUM(new_session) OVER (
            PARTITION BY timeout_min, user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_id
        FROM flagged
    ),
    per_session AS (
        SELECT timeout_min, user_id, session_id,
               COUNT(*) AS n_events,
               datediff('microsecond', MIN(ts), MAX(ts)) AS dur_us
        FROM sessions GROUP BY timeout_min, user_id, session_id
    )
    SELECT timeout_min,
           COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_singletons,
           CAST(SUM(dur_us) AS DOUBLE) / COUNT(*) AS avg_session_us
    FROM per_session
    GROUP BY timeout_min
    """,
)
def events_sessionization_sweep(spark, sf_dir):
    """Idle-timeout elbow curve: gap sessions swept over 3 timeouts in one
    plan (see module note)."""
    ev = table(spark, sf_dir, 'events')
    params = spark.createDataFrame(
        [(10,), (30,), (90,)], 'timeout_min int'
    )
    # r11 optimization: the 3x parameter fan-out used to run inside the
    # single-task local scan and the window's own exchange then moved 3x
    # the rows. spread_small establishes the user_id clustering BEFORE the
    # fan-out (hashpartitioning(user_id, N) satisfies the window's
    # (timeout_min, user_id) ClusteredDistribution, so the window adds no
    # exchange): the shuffle carries 1x rows and the fan-out + both window
    # passes run core-wide. No-op at production layouts.
    swept = spread_small(
        ev.select('user_id', 'event_id', 'ts'), 'user_id'
    ).crossJoin(F.broadcast(params))
    w = Window.partitionBy('timeout_min', 'user_id').orderBy(
        'ts', 'event_id'
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag('ts').over(w)
    gap_us = F.expr('timestampdiff(MICROSECOND, _prev_ts, ts)')
    new_session = F.when(
        F.col('_prev_ts').isNull()
        | (gap_us > F.col('timeout_min').cast('bigint') * 60000000),
        1,
    ).otherwise(0)
    per_session = (
        swept.withColumn('_prev_ts', prev_ts)
        .withColumn('new_session', new_session)
        .withColumn('session_id', F.sum('new_session').over(cum))
        .groupBy('timeout_min', 'user_id', 'session_id')
        .agg(
            F.count(F.lit(1)).alias('n_events'),
            F.expr(
                'timestampdiff(MICROSECOND, MIN(ts), MAX(ts))'
            ).alias('dur_us'),
        )
    )
    return per_session.groupBy('timeout_min').agg(
        F.count(F.lit(1)).alias('n_sessions'),
        F.sum((F.col('n_events') == 1).cast('int'))
        .cast('bigint')
        .alias('n_singletons'),
        (F.sum('dur_us').cast('double') / F.count(F.lit(1))).alias(
            'avg_session_us'
        ),
    )


# ---------------------------------------------------------------------------
# CUSUM change-point detection over the hourly event-count series, per
# event type. The textbook recurrence s_i = max(0, s_{i-1} + (x_i - k))
# looks sequential, but has the closed form
#     s_i = P_i - min(0, min_{j<=i} P_j),   P_i = cumsum(x_i - k),
# so it is TWO window passes over the same (type, hour-ordered) partition
# — no fold, no iteration, and every value is an exact BIGINT (drift k is
# the ceil-divided per-type mean, threshold h = 5k), identical in both
# engines. One shuffle on event_type total; the per-type mean broadcasts
# back as a K-row join. Alarm hours are where the statistic crosses h —
# the sustained-shift detector that complements the pointwise robust-z
# anomaly query.
# ---------------------------------------------------------------------------


@register(
    'events_cusum_alarm',
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_start,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    drift AS (
        SELECT event_type,
               CAST((SUM(cnt) + COUNT(*) - 1) // COUNT(*) AS BIGINT) AS k
        FROM hourly GROUP BY event_type
    ),
    pref AS (
        SELECT h.event_type, h.hour_start, h.cnt, d.k,
               SUM(h.cnt - d.k) OVER (
                   PARTITION BY h.event_type ORDER BY h.hour_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS p
        FROM hourly h JOIN drift d USING (event_type)
    )
    SELECT event_type, hour_start, cnt,
           CAST(p - least(0, MIN(p) OVER (
               PARTITION BY event_type ORDER BY hour_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )) AS BIGINT) AS cusum,
           CAST(p - least(0, MIN(p) OVER (
               PARTITION BY event_type ORDER BY hour_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )) >= 5 * k AS BOOLEAN) AS alarm
    FROM pref
    """,
)
def events_cusum_alarm(spark, sf_dir):
    """Per-type CUSUM statistic + alarm flag by hour (see module note)."""
    ev = table(spark, sf_dir, 'events')
    # r11 optimization note (examined, deliberately left alone): spreading
    # the scan before the hourly partial aggregate was measured SLOWER at
    # sf0.1 (interleaved A/B min 0.78s -> 1.30s): the hourly subtree is
    # referenced by BOTH the drift aggregate and the prefix window, so the
    # added exchange + the doubled downstream stages cost more than the
    # single-task partial aggregate saves. On multi-split production
    # layouts the scan parallelizes by itself.
    hourly = ev.groupBy(
        'event_type', F.date_trunc('hour', 'ts').alias('hour_start')
    ).agg(F.count(F.lit(1)).alias('cnt'))
    # integral `div`, not floor(double/...): exact past 2^53 at any scale
    drift = hourly.groupBy('event_type').agg(
        F.expr('(sum(cnt) + count(*) - 1) div count(*)')
        .cast('bigint')
        .alias('k')
    )
    w = (
        Window.partitionBy('event_type')
        .orderBy('hour_start')
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pref = hourly.join(F.broadcast(drift), 'event_type').withColumn(
        'p', F.sum(F.col('cnt') - F.col('k')).over(w)
    )
    cusum = F.col('p') - F.least(F.lit(0), F.min('p').over(w))
    return pref.select(
        'event_type',
        'hour_start',
        'cnt',
        cusum.cast('bigint').alias('cusum'),
        (cusum >= 5 * F.col('k')).alias('alarm'),
    )
