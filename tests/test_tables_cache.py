"""Relation-cache behavior: same-session reuse, cross-session eviction, and
conf re-assertion on the cached events path (the r2-ADVICE fixes)."""

from cyclebane_spark.tables import _RELATION_CACHE, table

SF_DIR = '/root/testdata/sf0.001'


def test_same_session_returns_same_plan_object(spark):
    a = table(spark, SF_DIR, 'nation')
    b = table(spark, SF_DIR, 'nation')
    assert a is b


def test_stale_session_entries_evicted(spark):
    table(spark, SF_DIR, 'nation')
    app_id = spark.sparkContext.applicationId
    # simulate a leftover entry from a stopped session
    ghost_key = ('app-dead-beef', SF_DIR, 'nation')
    _RELATION_CACHE[ghost_key] = _RELATION_CACHE[(app_id, SF_DIR, 'nation')]
    table(spark, SF_DIR, 'region')
    assert ghost_key not in _RELATION_CACHE
    assert (app_id, SF_DIR, 'nation') in _RELATION_CACHE


def test_cached_events_reasserts_session_confs(spark):
    table(spark, SF_DIR, 'events')  # populate cache (sets the confs)
    # intervening code un-pins the confs the events plan depends on
    spark.conf.set('spark.sql.session.timeZone', 'America/New_York')
    spark.conf.set('spark.sql.legacy.parquet.nanosAsLong', 'false')
    table(spark, SF_DIR, 'events')  # cache hit must re-assert
    assert spark.conf.get('spark.sql.session.timeZone') == 'UTC'
    assert spark.conf.get('spark.sql.legacy.parquet.nanosAsLong') == 'true'
