"""NULL-text parity: the testdata corpus has no NULL text, so queries can
agree with their oracles by accident.  This synthesizes a corpus WITH NULLs
and re-runs the Spark query against its DuckDB oracle to prove the
null-handling itself matches (explode_outer emits a null row; unnest(NULL)
emits zero — both sides must coalesce first)."""

import duckdb
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
