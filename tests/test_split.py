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


def test_cluster_balanced_sample_caps_and_matches_single_window(spark):
    """The salted two-phase top-K must (a) keep exactly min(K, size) docs
    per cluster, and (b) equal the plain single-window top-K per cluster —
    the pigeonhole equivalence the oracle relies on."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from cyclebane_spark.queries import queries
    from cyclebane_spark.queries.dedup import (
        _CBS_K,
        _connected_components,
        _minhash_pairs,
    )
    from cyclebane_spark.tables import table

    sf = '/root/testdata/sf0.001'
    got = queries()['pipeline_cluster_balanced_sample'](spark, sf).collect()
    per_cluster: dict[int, list] = {}
    for r in got:
        per_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, rows in per_cluster.items():
        n_cluster = rows[0].n_cluster
        assert len(rows) == min(_CBS_K, n_cluster), (cid, len(rows), n_cluster)
        assert sorted(r.sample_rank for r in rows) == list(
            range(1, len(rows) + 1)
        )

    pairs = _minhash_pairs(spark, sf)
    nodes = table(spark, sf, 'documents').select('doc_id')
    labels = _connected_components(pairs, nodes, 'doc_a', 'doc_b', 'doc_id')
    w = Window.partitionBy('cluster_id').orderBy(
        F.md5(F.col('doc_id').cast('string')), 'doc_id'
    )
    plain = (
        labels.withColumn('rk', F.row_number().over(w))
        .filter(F.col('rk') <= _CBS_K)
        .collect()
    )
    assert {(r.doc_id, r.cluster_id, r.rk) for r in plain} == {
        (r.doc_id, r.cluster_id, r.sample_rank) for r in got
    }
