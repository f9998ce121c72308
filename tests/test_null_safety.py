"""NULL-text parity: the testdata corpus has no NULL text, so queries can
agree with their oracles by accident.  This synthesizes a corpus WITH NULLs
and re-runs the Spark query against its DuckDB oracle to prove the
null-handling itself matches (explode_outer emits a null row; unnest(NULL)
emits zero — both sides must coalesce first)."""

import duckdb
import pyspark.sql.functions as F
import pytest

from cyclebane_spark.queries import registry


@pytest.fixture(scope='module')
def null_text_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp('nulltext'))
    rows = [
        (0, 'several sufficiently lengthy tokens appearing here', 48),
        (1, None, 0),  # NULL text: the case the testdata never exercises
        (2, 'short toks only', 15),
        (3, '', 0),
        (4, 'punctuation-heavy!! extraordinarily elongated vocabulary', 56),
    ]
    spark.createDataFrame(
        rows, 'doc_id long, text string, n_chars int'
    ).coalesce(1).write.mode('overwrite').parquet(f'{out}/documents.parquet')
    return out


def test_explode_outer_long_tokens_matches_oracle_on_null_text(
    spark, null_text_dir
):
    q = registry()['explode_outer_long_tokens']
    got = sorted(
        (r['doc_id'], r['tok']) for r in q.fn(spark, null_text_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"parquet_scan('{null_text_dir}/documents.parquet/*.parquet')"
    )
    want = sorted(map(tuple, con.execute(q.oracle).fetchall()))
    assert got == want
    # and the NULL-text doc did survive as a null row on both sides
    assert (1, None) in got


@pytest.fixture(scope='module')
def lone_clicker_dir(spark, tmp_path_factory):
    """An events table where user 1 clicks but never views, user 2 views
    but never clicks, and user 3 has a view-click tie at the same ts."""
    out = str(tmp_path_factory.mktemp('lone_clicker'))
    rows = [
        (1, '2024-01-01 10:00:00', 1, 'click', 1.0, '{}'),
        (2, '2024-01-01 09:00:00', 2, 'view', 1.0, '{}'),
        (3, '2024-01-01 08:00:00', 3, 'view', 1.0, '{}'),
        (4, '2024-01-01 08:00:00', 3, 'view', 1.0, '{}'),
        (5, '2024-01-01 08:00:00', 3, 'click', 1.0, '{}'),
    ]
    df = spark.createDataFrame(
        rows, 'event_id long, ts string, user_id long, event_type string, '
        'value double, props string'
    ).withColumn('ts', F.col('ts').cast('timestamp_ntz'))
    df.coalesce(1).write.mode('overwrite').parquet(f'{out}/events.parquet')
    return out


def test_cogroup_asof_handles_one_sided_users_and_ties(spark, lone_clicker_dir):
    """Left as-of semantics on degenerate keys: a click with NO prior view
    survives with NULLs, a view-only user emits nothing, and an exact
    ts tie picks the max view_id (the documented determinism rule) — same
    answer from the pandas cogroup and the SQL oracle."""
    q = registry()['events_cogroup_asof_pandas']
    got = sorted(map(tuple, q.fn(spark, lone_clicker_dir).collect()))
    con = duckdb.connect()
    con.execute(
        'CREATE VIEW events AS SELECT * FROM '
        f"parquet_scan('{lone_clicker_dir}/events.parquet/*.parquet')"
    )
    want = sorted(map(tuple, con.execute(q.oracle).fetchall()))
    assert got == want
    by_click = {r[1]: r for r in got}
    assert by_click[1][3] is None  # lone clicker: NULL view
    assert 2 not in {r[0] for r in got}  # view-only user absent
    assert by_click[5][3] == 4  # tie at 08:00 -> max view_id wins
