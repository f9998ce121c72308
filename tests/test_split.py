"""Leakage-safe split invariants: no near-duplicate candidate pair may
straddle the train/holdout boundary, and the split must be deterministic
content hashing (stable under re-partitioning)."""

import pyspark.sql.functions as F

SF_DIR = '/root/testdata/sf0.001'


def test_no_candidate_pair_crosses_the_split(spark):
    from cyclebane_spark.queries.dedup import (
        _minhash_pairs,
        pipeline_leakage_safe_split,
    )

    split = pipeline_leakage_safe_split(spark, SF_DIR).cache()
    pairs = _minhash_pairs(spark, SF_DIR)
    a = split.select(
        F.col('doc_id').alias('doc_a'), F.col('split').alias('split_a')
    )
    b = split.select(
        F.col('doc_id').alias('doc_b'), F.col('split').alias('split_b')
    )
    crossing = (
        pairs.join(a, 'doc_a')
        .join(b, 'doc_b')
        .filter(F.col('split_a') != F.col('split_b'))
    )
    assert crossing.count() == 0
    # both sides are non-empty (the ratio knob actually splits)
    sides = {r.split for r in split.select('split').distinct().collect()}
    assert sides == {'train', 'holdout'}


def test_split_is_stable_under_repartitioning(spark):
    from cyclebane_spark.queries.dedup import pipeline_leakage_safe_split

    one = {
        (r.doc_id, r.split)
        for r in pipeline_leakage_safe_split(spark, SF_DIR).collect()
    }
    two = {
        (r.doc_id, r.split)
        for r in pipeline_leakage_safe_split(spark, SF_DIR)
        .repartition(7)
        .collect()
    }
    assert one == two
