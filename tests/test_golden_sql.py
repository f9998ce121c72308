"""Checked-in golden snapshots of the SHARED oracle-SQL helpers.

``_sql_kmeans_ctes`` backs the oracles of the whole ANN/IVF family (6+
registered queries) and ``_minhash_ctes`` backs 10+ dedup/streaming
oracles. Both grew append-only parametrizations (``extra`` /
``recursive``) whose no-op defaults MUST keep rendering byte-identical
SQL: a silent drift would shift the oracles — and therefore the recorded
correctness rows — of every unrotated consumer at once, without any test
noticing. These snapshots turn that invariant from a commit-message claim
into a failing test: any byte change to the default render requires a
deliberate snapshot update (and a re-green of the consumer family).

No Spark session needed — pure string comparison.
"""

import pathlib

GOLDEN = pathlib.Path(__file__).parent / 'golden'


def _assert_matches(rendered: str, name: str) -> None:
    want = (GOLDEN / name).read_text()
    assert rendered == want, (
        f'{name} drifted from its golden snapshot; if the change is '
        f'deliberate, regenerate tests/golden/{name} AND re-verify every '
        f'consumer query (oracle_check) before committing.'
    )


def test_kmeans_ctes_default_matches_golden():
    from cyclebane_spark.queries.similarity import _sql_kmeans_ctes

    _assert_matches(_sql_kmeans_ctes(), 'kmeans_ctes.sql')


def test_kmeans_ctes_extra_is_append_only():
    """The parametrization contract: a non-empty ``extra`` predicate may
    only ADD text, never reshape the default SQL around it."""
    from cyclebane_spark.queries.similarity import _sql_kmeans_ctes

    marker = ' AND (vec_id % 97) <> 9'
    default = _sql_kmeans_ctes()
    parametrized = _sql_kmeans_ctes(extra=marker)
    assert marker in parametrized
    # splicing the predicate out must recover the default byte-for-byte:
    # extra is interpolated verbatim, never reshapes the surrounding SQL
    assert parametrized.replace(marker, '') == default


def test_minhash_ctes_default_matches_golden():
    from cyclebane_spark.queries.dedup import _minhash_ctes

    _assert_matches(_minhash_ctes(), 'minhash_ctes.sql')


def test_minhash_ctes_recursive_matches_golden():
    from cyclebane_spark.queries.dedup import _minhash_ctes

    _assert_matches(_minhash_ctes(recursive=True), 'minhash_ctes_recursive.sql')
