"""Boilerplate-skew exercise for MinHash-LSH candidate generation.

A corpus where most documents share identical boilerplate text puts most of
the corpus into ONE LSH bucket per band; the unsalted pair generator then
does the whole K^2 fan-out in a single task.  These tests prove the salted
triangle-decomposed self-join produces the bit-identical pair set while
keying the shuffle on (bucket, salt-pair) — the shape that spreads a hot
bucket over n_salt*(n_salt+1)/2 tasks at 100 TB.
"""

import pytest

from cyclebane_spark.queries.dedup import (
    _minhash_bands,
    _pairs_from_bands,
    _salted_pairs_from_bands,
)

N_BOILER = 120  # docs sharing the identical boilerplate text
N_UNIQUE = 60


@pytest.fixture(scope='module')
def skewed_docs(spark):
    boiler = (
        'terms of service apply to all content on this page '
        'all rights reserved contact us for licensing details'
    )
    rows = [(i, boiler) for i in range(N_BOILER)]
    rows += [
        (
            N_BOILER + i,
            f'unique document {i} about topic {i % 7} with extra words '
            f'number {i * 31} and trailing payload {i * 17}',
        )
        for i in range(N_UNIQUE)
    ]
    return spark.createDataFrame(rows, 'doc_id long, text string')


def _collected(df):
    return sorted(df.collect())


def test_salted_pairs_bit_exact_on_hot_bucket(spark, skewed_docs):
    bands = _minhash_bands(skewed_docs)
    plain = _collected(_pairs_from_bands(bands))
    salted = _collected(_salted_pairs_from_bands(bands, n_salt=8))
    # the hot bucket alone contributes C(120,2) pairs
    assert len(plain) >= N_BOILER * (N_BOILER - 1) // 2
    assert salted == plain


@pytest.mark.parametrize('n_salt', [1, 3])
def test_salted_pairs_exact_for_any_salt_count(spark, skewed_docs, n_salt):
    bands = _minhash_bands(skewed_docs)
    assert _collected(_salted_pairs_from_bands(bands, n_salt=n_salt)) == (
        _collected(_pairs_from_bands(bands))
    )


def test_salt_is_in_the_shuffle_key(spark, skewed_docs):
    # the point of salting: the candidate join's exchange must hash on the
    # salt-pair columns, not just (band_id, bh)
    df = _salted_pairs_from_bands(_minhash_bands(skewed_docs), n_salt=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert 'ga' in plan and 'gb' in plan
