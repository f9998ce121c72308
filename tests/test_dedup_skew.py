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
    _adaptive_pairs_from_bands,
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
    assert 'ga#' in plan and 'gb#' in plan


# -- stats-gated adaptive salting -------------------------------------------


@pytest.fixture(scope='module')
def organic_docs(spark):
    rows = [
        (
            i,
            f'organic document {i} about topic {i % 7} with extra words '
            f'number {i * 31} and trailing payload {i * 17}',
        )
        for i in range(80)
    ]
    return spark.createDataFrame(rows, 'doc_id long, text string')


def test_adaptive_picks_salted_branch_on_hot_bucket(spark, skewed_docs):
    # hot bucket of 120 >> threshold -> the salted join (salt-pair columns
    # in the plan), pair set bit-equal to the unsalted generator
    bands = _minhash_bands(skewed_docs)
    df = _adaptive_pairs_from_bands(bands)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert 'ga#' in plan and 'gb#' in plan
    assert _collected(df) == _collected(_pairs_from_bands(bands))


def test_adaptive_picks_unsalted_branch_on_organic_corpus(spark, organic_docs):
    # every bucket is tiny -> the replication-free unsalted join
    bands = _minhash_bands(organic_docs)
    df = _adaptive_pairs_from_bands(bands)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert 'ga#' not in plan and 'gb#' not in plan
    assert _collected(df) == _collected(_pairs_from_bands(bands))


# -- triangle wedge join: the AQE skew-split claim, pinned -------------------


def test_triangle_wedge_join_aqe_skew_split_activates(spark):
    """The dedup module note claims a high-degree node skewing the wedge
    join is handled by AQE's skew-join split. Pin it: a 4000-edge star
    through one hub makes the wedge key b=hub a hot partition; with
    skew-split thresholds scaled to the synthetic data size, the executed
    plan must show SortMergeJoin(skew=true) on the wedge join — and the
    enumerated triangles must still be exact."""
    from cyclebane_spark.queries.dedup import _triangles_from_pairs

    edges = [(i, 5000) for i in range(2000)]
    edges += [(5000, 5001 + j) for j in range(2000)]
    edges += [(1, 2), (2, 3), (1, 3)]
    pairs = spark.createDataFrame(edges, 'doc_a long, doc_b long')

    confs = {
        'spark.sql.autoBroadcastJoinThreshold': '-1',
        'spark.sql.adaptive.enabled': 'true',
        'spark.sql.adaptive.skewJoin.enabled': 'true',
        'spark.sql.adaptive.skewJoin.skewedPartitionFactor': '1.0',
        'spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes': '4KB',
        'spark.sql.adaptive.advisoryPartitionSizeInBytes': '2KB',
        'spark.sql.adaptive.coalescePartitions.minPartitionSize': '1KB',
    }
    old = {}
    for k in confs:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        tri = _triangles_from_pairs(pairs)
        rows = sorted(map(tuple, tri.collect()))
        # (1,2,3) plus each clique edge closing through the hub
        assert rows == [(1, 2, 3), (1, 2, 5000), (1, 3, 5000), (2, 3, 5000)]
        plan = tri._jdf.queryExecution().executedPlan().toString()
        assert 'skew=true' in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_adaptive_threshold_boundary_is_strict(spark, organic_docs):
    # a bucket of exactly hot_threshold members stays unsalted (> not >=)
    bands = _minhash_bands(organic_docs)
    df = _adaptive_pairs_from_bands(bands, hot_threshold=0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # any multi-member bucket (there is at least one pair on this corpus or
    # none) — with threshold 0, ANY bucket of >=1 member trips the gate
    assert 'ga#' in plan and 'gb#' in plan


# -- prefix-filtered exact similarity join -----------------------------------


def _brute_force_jaccard(rows, n, t):
    """Reference all-pairs distinct-n-gram Jaccard in plain Python."""
    import itertools

    sets = {}
    for doc_id, text in rows:
        toks = text.strip().split()
        sets[doc_id] = {
            ' '.join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        union = len(sa | sb)
        if union == 0:
            continue
        j = len(sa & sb) / union
        if j >= t:
            out[a, b] = j
    return out


@pytest.mark.parametrize('t', [0.3, 0.5, 0.8])
def test_prefix_filter_matches_brute_force(spark, t):
    """Candidate completeness: prefix filtering must lose NO qualifying pair.

    Adversarial corpus: exact duplicates, boilerplate near-dups sharing a
    hot shingle (the posting list the prefix index must be allowed to
    drop), short docs, disjoint docs, and size-mismatched pairs straddling
    the length filter.
    """
    from cyclebane_spark.queries.dedup import _prefix_filter_pairs

    boiler = 'terms of service apply to all content on this page'
    rows = [
        (1, 'alpha beta gamma delta epsilon zeta'),
        (2, 'alpha beta gamma delta epsilon zeta'),  # exact dup of 1
        (3, 'alpha beta gamma delta epsilon eta'),  # near dup of 1
        (4, boiler),
        (5, boiler + ' all rights reserved'),
        (6, boiler + ' contact us for licensing'),
        (7, 'one two three'),  # single shingle
        (8, 'one two three'),  # its dup
        (9, 'totally different words everywhere here now'),
        (10, 'alpha beta gamma'),  # subset of 1: size-mismatched pair
        (11, boiler + ' ' + boiler),  # doubled boilerplate (same set)
    ]
    docs = spark.createDataFrame(rows, 'doc_id long, text string')
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in _prefix_filter_pairs(docs, t=t).collect()
    }
    want = _brute_force_jaccard(rows, 3, t)
    assert got == want


def test_recursive_hops_depth_cap_and_min_hop(spark):
    """On a 6-node oriented chain the bounded recursion reaches exactly the
    pairs within 4 hops, labels each with its MINIMUM hop count, and the
    depth bound excludes the 5-hop pair — same contract as the registered
    query, checked on a graph where hops are known by construction."""
    import pyspark.sql.functions as F

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 7)] + [(1, 3)],
        'doc_a long, doc_b long',
    )
    edges.createOrReplaceTempView('cb_neardup_edges')
    rows = {
        (r.doc_a, r.doc_b): r.hops
        for r in spark.sql(
            """
            WITH RECURSIVE reach(src, dst, depth) AS (
                SELECT doc_a, doc_b, 1 FROM cb_neardup_edges
                UNION ALL
                SELECT r.src, e.doc_b, r.depth + 1
                FROM reach r JOIN cb_neardup_edges e ON e.doc_a = r.dst
                WHERE r.depth < 4
            )
            SELECT src AS doc_a, dst AS doc_b,
                   CAST(MIN(depth) AS BIGINT) AS hops
            FROM reach GROUP BY src, dst
            """
        ).collect()
    }
    # shortcut (1,3) wins over the 2-hop path and shortens 1->6 to 4 hops;
    # the depth cap drops (1,7), whose best path (via the shortcut) is 5
    assert rows[(1, 3)] == 1
    assert rows[(1, 4)] == 2
    assert rows[(1, 5)] == 3
    assert rows[(1, 6)] == 4
    assert rows[(2, 6)] == 4
    assert (1, 7) not in rows


def test_band_diagnostics_bounds_pair_join(spark):
    """sum over bands of C(c,2) upper-bounds the DISTINCT candidate pairs
    the LSH join emits (a pair colliding in several bands is counted once
    by the join, once per band here)."""
    from cyclebane_spark.queries import queries

    sf = '/root/testdata/sf0.001'
    diag = queries()['dedup_lsh_band_diagnostics'](spark, sf).collect()
    n_pairs = queries()['dedup_minhash_lsh'](spark, sf).count()
    assert sum(r.cand_pairs for r in diag) >= n_pairs
    for r in diag:
        assert r.n_colliding <= r.n_buckets
        assert r.max_bucket >= 1


def test_containment_catches_inclusion_jaccard_misses(spark, tmp_path):
    """A short doc fully quoted inside a much longer one: containment
    (sub -> super) is 1.0, while Jaccard is diluted below the symmetric
    threshold — the exact asymmetry dedup_containment_pairs exists for."""
    import pyspark.sql.functions as F

    from cyclebane_spark.queries import queries

    quote = 'alpha beta gamma delta epsilon zeta'
    filler = ' '.join(f'w{i} x{i} y{i}' for i in range(30))
    docs = spark.createDataFrame(
        [
            (1, quote, 'en', 'a', len(quote)),
            (2, filler + ' ' + quote + ' ' + filler, 'en', 'a', 1),
            (3, 'unrelated words entirely different content here', 'en',
             'a', 1),
        ],
        'doc_id long, text string, lang string, source string, n_chars long',
    )
    sf = str(tmp_path)
    docs.write.parquet(f'{sf}/documents.parquet')

    cont = {
        (r.doc_sub, r.doc_super)
        for r in queries()['dedup_containment_pairs'](spark, sf).collect()
    }
    assert (1, 2) in cont            # the quoted doc is found inside 2
    assert (2, 1) not in cont        # inclusion is directed
    assert not any(3 in p for p in cont)

    jac = queries()['dedup_ngram_jaccard'](spark, sf).collect()
    assert not any(
        {r.doc_a, r.doc_b} == {1, 2} for r in jac
    )  # symmetric Jaccard never sees the pair


def _brute_force_containment(rows, n, t):
    """Reference all-ordered-pairs distinct-n-gram containment."""
    sets = {}
    for doc_id, text in rows:
        toks = text.strip().split()
        sets[doc_id] = {
            ' '.join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }
    out = {}
    for a in sets:
        for b in sets:
            if a == b or not sets[a]:
                continue
            c = len(sets[a] & sets[b]) / len(sets[a])
            if c >= t:
                out[a, b] = c
    return out


@pytest.mark.parametrize('t', [0.4, 0.6, 0.9])
def test_containment_matches_brute_force(spark, t):
    """Candidate completeness for the DIRECTED join: the probe prefix +
    |B| >= t*|A| length filter must lose no qualifying ordered pair.

    Corpus stresses the asymmetric edges: a doc fully inside a longer one
    (both directions checked), exact duplicates (mutual containment),
    boilerplate sharing a hot shingle, a short doc, and disjoint docs.
    """
    from cyclebane_spark.queries.dedup import _containment_pairs

    boiler = 'terms of service apply to all content on this page'
    quote = 'alpha beta gamma delta epsilon zeta'
    rows = [
        (1, quote),
        (2, 'prefix words here ' + quote + ' and a long suffix tail '
            + 'with many extra tokens beyond the quoted span'),
        (3, quote),                                   # exact dup of 1
        (4, boiler),
        (5, boiler + ' plus unique trailing content of its own'),
        (6, 'wholly different text about something else entirely'),
        (7, 'tiny doc'),                              # < 3 tokens -> no grams
        (8, 'alpha beta gamma delta'),                # 2-gram... 2 shingles
    ]
    docs = spark.createDataFrame(rows, 'doc_id long, text string')
    got = {
        (r.doc_sub, r.doc_super): r.containment
        for r in _containment_pairs(docs, t=t).collect()
    }
    want = _brute_force_containment(rows, 3, t)
    assert set(got) == set(want), (set(got) ^ set(want))
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_containment_shuffle_hash_branch_same_answer(spark):
    """The conf-gated 100 TB fallback (shuffle-hash verify when the array
    table outgrows broadcast) must return exactly the broadcast branch's
    pairs and values — the gate flips WHICH plan runs, never the answer."""
    from cyclebane_spark.queries.dedup import _containment_pairs

    sf = '/root/testdata/sf0.001'
    from cyclebane_spark.queries import queries

    base = {
        (r.doc_sub, r.doc_super): r.containment
        for r in queries()['dedup_containment_pairs'](spark, sf).collect()
    }
    old = spark.conf.get('spark.sql.autoBroadcastJoinThreshold')
    spark.conf.set('spark.sql.autoBroadcastJoinThreshold', '-1')
    try:
        alt = {
            (r.doc_sub, r.doc_super): r.containment
            for r in queries()['dedup_containment_pairs'](spark, sf).collect()
        }
    finally:
        spark.conf.set('spark.sql.autoBroadcastJoinThreshold', old)
    assert base == alt


def test_incremental_cc_merges_across_batches(spark):
    """Incremental maintenance must be invisible in the result: old-edge
    labels + contracted-graph CC over the late batch == full CC. The
    synthetic graph forces a real merge: components {1,2} and {3,4} exist
    before the late edge (2,3) bridges them, and an untouched component
    {10,11} must keep its label without re-iteration."""
    import pyspark.sql.functions as F

    from cyclebane_spark.queries.dedup import _connected_components

    all_edges = spark.createDataFrame(
        [(1, 2), (3, 4), (2, 3), (10, 11)], 'doc_a long, doc_b long'
    )
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 10, 11, 20)], 'doc_id long'
    )
    late = (F.col('doc_a') == 2) & (F.col('doc_b') == 3)
    base = _connected_components(
        all_edges.filter(~late), nodes, 'doc_a', 'doc_b', 'doc_id'
    )
    la = base.select(F.col('doc_id').alias('doc_a'), F.col('cluster_id').alias('ca'))
    lb = base.select(F.col('doc_id').alias('doc_b'), F.col('cluster_id').alias('cb'))
    contracted = (
        all_edges.filter(late)
        .join(la, 'doc_a').join(lb, 'doc_b')
        .filter(F.col('ca') != F.col('cb'))
        .select('ca', 'cb').distinct()
    )
    cl_nodes = base.select(F.col('cluster_id').alias('cid')).distinct()
    merged = _connected_components(contracted, cl_nodes, 'ca', 'cb', 'cid')
    relabel = merged.select(
        F.col('cid').alias('old_label'), F.col('cluster_id').alias('new_label')
    )
    got = {
        r.doc_id: r.new_label
        for r in base.join(relabel, base['cluster_id'] == relabel['old_label'])
        .select('doc_id', 'new_label').collect()
    }
    full = {
        r.doc_id: r.cluster_id
        for r in _connected_components(
            all_edges, nodes, 'doc_a', 'doc_b', 'doc_id'
        ).collect()
    }
    assert got == full
    assert got[4] == 1      # bridged through the late edge
    assert got[11] == 10    # untouched component keeps its label
    assert got[20] == 20    # singleton
