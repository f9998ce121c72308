#!/usr/bin/env python
"""sf1 VALUE evidence for the two oracle-excluded registry queries
(VERDICT r9 "Next round #3") — closes docs/SF1_ORACLE.md's last gap.

Both queries are excluded from the standard sf1 oracle pass for ORACLE-
ENGINE resource reasons, not semantics gaps. This tool produces value
evidence by the routes the r9 verdict prescribed:

1. ``dedup_semantic_kmeans`` — the Spark side completes at sf1 (~4 min);
   DuckDB's within-cell pair join materializes past RAM+disk. Evidence:
   run the REGISTERED Spark query at sf1 and verify every kept/dropped
   flag with the numpy twin from
   tests/test_pipeline_ops.py::test_semantic_dedup_matches_numpy_brute_force,
   vectorized (per-cell ||a-b||^2 via the gemm identity on the integer-
   quantized components — exact in float64, max dist2 64*(2^15)^2 << 2^53).

2. ``dedup_tf_cosine_pairs`` — exact AllPairs cosine costs Theta(sum df^2)
   = 3.42e10 pair-partials at sf1 on this closed-vocabulary corpus;
   measured 112 s at sf0.1 (3.4e8 partials) => ~3 h single-node at sf1 in
   EITHER engine, so the registered Spark statement stays small-SF-only.
   Evidence for the VALUES at sf1: (a) a dense-gemm numpy twin (the
   closed ~310-term vocabulary makes the doc-term matrix 50k x 310 —
   1.5e12 exact-integer FLOPs, seconds in BLAS) and (b) the oracle
   RESTATED BLOCKED — per doc_a-range top-25 then a global merge (the
   per-block ORDER is the global ORDER, so the global top-25 is a subset
   of the union of block top-25s) — which DuckDB survives because each
   block materializes ~1/B of the pair partials. Twin and blocked oracle
   must agree row-for-row; the twin is additionally checked against the
   FULL oracle and the registered Spark query at sf0.1 (where all three
   are feasible), closing the chain
   Spark ==(sf0.1)== full oracle == twin ==(sf1)== blocked oracle.

Usage: python tools/sf1_twin_evidence.py [sf1_dir]  (default /tmp/cb_sf1)
Prints one verdict line per check and a final JSON summary; exit 0 iff
every check is green.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

COS_BLOCKS = 25  # doc_a-range blocks for the blocked oracle
GEMM_BLOCK = 4096  # twin gemm row-block


def _rows_checksum(rows) -> str:
    h = hashlib.md5()
    for r in rows:
        h.update(repr(tuple(r)).encode())
    return h.hexdigest()[:16]


# -- 1. dedup_semantic_kmeans: Spark at sf1 vs vectorized numpy twin -----

def _round_half_up(x: np.ndarray) -> np.ndarray:
    """Spark F.round / DuckDB round semantics: ties AWAY from zero —
    np.round is half-to-even and disagrees on exact .5 products (any
    embedding component that is an odd multiple of 2^-15 lands there
    under KM_SCALE = 2^14)."""
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


def _kmeans_twin(ids: np.ndarray, Q: np.ndarray):
    """Independent numpy replication of _kmeans_train's full Lloyd run —
    seed = first KM_K corpus vec_ids (cl by ascending id), KM_ITERS
    assign/update rounds, centroid update floor(sum q / count), argmin
    ties to the LOWEST cl (np.argmin first-minimum == ORDER BY dist2,
    cl) — so the evidence covers the CLUSTERING half of the query, not
    just the within-cell flags (the review's circularity gap). All
    arithmetic is integer-exact in f64 (dist2 <= 64*(2^15)^2 << 2^53:
    components in [-1, 1] quantize to |q| <= KM_SCALE = 2^14, so a
    per-dimension difference is <= 2^15).
    Returns vec_id -> cl for the corpus."""
    from cyclebane_spark.queries.similarity import KM_ITERS, KM_K, N_QUERIES

    mask = ids >= N_QUERIES
    cids, CQ = ids[mask], Q[mask]
    order = np.argsort(cids)
    cids, CQ = cids[order], CQ[order]
    C = CQ[:KM_K].copy()  # seed: first K corpus ids, cl = rank

    def assign_all(C):
        n2 = (CQ * CQ).sum(axis=1)[:, None]
        c2 = (C * C).sum(axis=1)[None, :]
        D = n2 + c2 - 2.0 * (CQ @ C.T)
        return np.argmin(D, axis=1)  # first min == lowest cl on ties

    for _ in range(KM_ITERS):
        a = assign_all(C)
        counts = np.bincount(a, minlength=len(C))
        assert (counts > 0).all(), 'empty cluster — twin cannot mirror'
        sums = np.zeros_like(C)
        np.add.at(sums, a, CQ)
        C = np.floor(sums / counts[:, None])
    a = assign_all(C)
    return dict(zip(cids.tolist(), a.tolist()))


def check_semantic_kmeans(spark, sf1_dir: str) -> dict:
    import pandas as pd

    from cyclebane_spark.queries import queries
    from cyclebane_spark.queries.similarity import KM_SCALE, SEM_T

    t0 = time.perf_counter()
    out = queries()['dedup_semantic_kmeans'](spark, sf1_dir).collect()
    spark_s = time.perf_counter() - t0

    emb = pd.read_parquet(f'{sf1_dir}/embeddings.parquet')
    ids = emb.vec_id.to_numpy(np.int64)
    Q = _round_half_up(
        np.stack([np.asarray(v, float) for v in emb.embedding]) * KM_SCALE
    )
    q = dict(zip(ids.tolist(), Q))

    # independent clustering check: the output's cl column must equal the
    # twin k-means assignment for EVERY corpus vector
    twin_cl = _kmeans_twin(ids, Q)
    cl_mismatches = [
        (r.vec_id, r.cl, twin_cl.get(r.vec_id))
        for r in out
        if twin_cl.get(r.vec_id) != r.cl
    ]

    by_cl: dict[int, list] = {}
    for r in out:
        by_cl.setdefault(r.cl, []).append(r)

    mismatches = []
    for cl, members in by_cl.items():
        members.sort(key=lambda r: r.vec_id)
        QM = np.stack([q[r.vec_id] for r in members])  # m x d, exact ints
        n2 = (QM * QM).sum(axis=1)
        # ||a-b||^2 = n2a + n2b - 2 a.b — every term integer-exact in f64
        D = n2[:, None] + n2[None, :] - 2.0 * (QM @ QM.T)
        near = D <= SEM_T
        for i, r in enumerate(members):
            want_kept = not near[i, :i].any()
            if bool(r.kept) != want_kept:
                mismatches.append((cl, r.vec_id, bool(r.kept), want_kept))
    kept_n = sum(1 for r in out if r.kept)
    ok = not mismatches and not cl_mismatches and len(out) > 0
    print(
        f'{"ok  " if ok else "FAIL"} dedup_semantic_kmeans sf1: '
        f'{len(out)} rows ({kept_n} kept), {len(cl_mismatches)} cluster + '
        f'{len(mismatches)} flag mismatches vs numpy twin, '
        f'spark {spark_s:.1f}s, '
        f'checksum {_rows_checksum(sorted((r.vec_id, r.cl, r.kept) for r in out))}'
    )
    if cl_mismatches:
        print('  first cluster mismatches:', cl_mismatches[:5])
    if mismatches:
        print('  first mismatches:', mismatches[:5])
    return {'ok': ok, 'rows': len(out), 'kept': kept_n,
            'cl_mismatches': len(cl_mismatches),
            'mismatches': len(mismatches), 'spark_sec': round(spark_s, 1)}


# -- 2. dedup_tf_cosine_pairs: numpy gemm twin + blocked DuckDB oracle ---

def _tf_matrix(sf_glob: str):
    """Dense doc-term tf matrix from the parquet corpus, via DuckDB
    (same tokenizer as the oracle: trim + split on \\s+)."""
    import duckdb

    con = duckdb.connect()
    tf = con.sql(
        rf"""
        WITH t AS (SELECT doc_id,
                          string_split_regex(trim(text), '\s+') AS toks
                   FROM read_parquet('{sf_glob}')),
        tok AS (SELECT doc_id, unnest(toks) AS tok FROM t)
        SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2
        """
    ).fetchnumpy()
    doc_ids = np.unique(tf['doc_id'])
    toks, tok_idx = np.unique(tf['tok'], return_inverse=True)
    doc_idx = np.searchsorted(doc_ids, tf['doc_id'])
    A = np.zeros((len(doc_ids), len(toks)))
    A[doc_idx, tok_idx] = tf['tf'].astype(np.float64)
    return doc_ids.astype(np.int64), A


def tf_cosine_twin(sf_glob: str, k: int) -> list[tuple]:
    """Global top-k (doc_a, doc_b, dot, cos2) by (cos2 DESC, doc_a, doc_b)
    via blocked dense gemm. All dots / norms are exact integers in f64
    (max dot < 2^53 by corpus construction); cos2 is the same single IEEE
    divide both engines perform."""
    doc_ids, A = _tf_matrix(sf_glob)
    n = len(doc_ids)
    n2 = (A * A).sum(axis=1)
    cand: list[tuple] = []
    for s in range(0, n, GEMM_BLOCK):
        e = min(s + GEMM_BLOCK, n)
        S = A[s:e] @ A.T  # exact integer dots
        cos2 = (S * S) / np.outer(n2[s:e], n2)
        # strict upper triangle in GLOBAL index space: a < b
        mask = np.arange(s, e)[:, None] < np.arange(n)[None, :]
        vals = cos2[mask]
        # keep the block's k-th-largest THRESHOLD and every pair >= it:
        # full tie groups survive, so the global (cos2 DESC, a, b) top-k
        # is provably a subset of the union of block candidate sets (a
        # pair cut here has >= k block-mates strictly above it, which
        # beat it globally too)
        thresh = np.partition(vals, -k)[-k] if vals.size > k else -1.0
        ii, jj = np.nonzero(mask & (cos2 >= thresh))
        for i, j in zip(ii, jj):
            cand.append(
                (
                    float(cos2[i, j]),
                    int(doc_ids[i + s]),
                    int(doc_ids[j]),
                    int(S[i, j]),
                )
            )
    cand.sort(key=lambda t: (-t[0], t[1], t[2]))
    return [(a, b, dot, c2) for c2, a, b, dot in cand[:k]]


def tf_cosine_blocked_oracle(sf_glob: str, k: int, n_blocks: int) -> list[tuple]:
    """The oracle RESTATED BLOCKED: per doc_a-range dp + top-k, then a
    global merge. Identical SQL per block to the registered oracle with
    one added range predicate on a.doc_id — each block materializes only
    ~1/n_blocks of the pair partials, which DuckDB survives at sf1.

    Overflow bound (ADVICE r10): ``CAST(dot * dot AS DOUBLE)`` multiplies
    in BIGINT BEFORE the cast — kept deliberately, because the registered
    oracle uses the same expression and this restatement must stay
    bit-identical to it. The binding bound is therefore dot < 2^31.5
    (~3.04e9, BIGINT overflow on dot^2 — checked, so it fails LOUDLY),
    tighter than the 2^53 exactness bound on the cast; the sf1 corpus
    max dot is ~1e5, five orders inside it."""
    import duckdb

    con = duckdb.connect()
    # tokenize/aggregate ONCE (identical SQL to the registered oracle's tf
    # and n2 CTEs) — re-deriving them inside every block query re-scanned
    # the whole corpus n_blocks times for nothing
    con.execute(
        rf"""
        CREATE TEMP TABLE tf AS
        WITH t AS (SELECT doc_id,
                          string_split_regex(trim(text), '\s+') AS toks
                   FROM read_parquet('{sf_glob}')),
        tok AS (SELECT doc_id, unnest(toks) AS tok FROM t)
        SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2
        """
    )
    con.execute(
        'CREATE TEMP TABLE n2 AS SELECT doc_id,'
        ' CAST(SUM(tf * tf) AS BIGINT) AS n2 FROM tf GROUP BY 1'
    )
    # block by doc-COUNT quantiles of the sorted id list, not by id-value
    # ranges: sf1 doc_ids are replica-offset (r * 100M apart), so equal
    # value spans would put whole replicas in single blocks and recreate
    # the materialization blowup the blocking exists to avoid
    ids = [
        r[0]
        for r in con.sql('SELECT DISTINCT doc_id FROM tf ORDER BY doc_id').fetchall()
    ]
    per = (len(ids) + n_blocks - 1) // n_blocks
    merged: list[tuple] = []
    for b in range(n_blocks):
        chunk = ids[b * per: (b + 1) * per]
        if not chunk:
            break
        b_lo, b_hi = chunk[0], chunk[-1] + 1
        rows = con.sql(
            f"""
            WITH dp AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
                FROM tf a JOIN tf b
                  ON a.tok = b.tok AND a.doc_id < b.doc_id
                WHERE a.doc_id >= {b_lo} AND a.doc_id < {b_hi}
                GROUP BY 1, 2
            )
            SELECT doc_a, doc_b, dot,
                   CAST(dot * dot AS DOUBLE)
                       / CAST(na.n2 * nb.n2 AS DOUBLE) AS cos2
            FROM dp
            JOIN n2 na ON doc_a = na.doc_id
            JOIN n2 nb ON doc_b = nb.doc_id
            ORDER BY cos2 DESC, doc_a, doc_b LIMIT {k}
            """
        ).fetchall()
        merged.extend(rows)
        print(f'  blocked oracle: block {b + 1}/{n_blocks} done '
              f'({len(rows)} rows)', flush=True)
    merged.sort(key=lambda t: (-t[3], t[0], t[1]))
    return [tuple(r) for r in merged[:k]]


def check_tf_cosine(spark, sf1_dir: str) -> dict:
    from cyclebane_spark.queries import queries
    from cyclebane_spark.queries.dedup import _COS_PAIR_K as K

    glob01 = '/root/testdata/sf0.1/documents.parquet'
    glob01 = (f'{glob01}/*.parquet' if os.path.isdir(glob01) else glob01)
    sf1_glob = f'{sf1_dir}/documents.parquet/*.parquet'

    # chain link 1 (sf0.1): registered Spark == twin
    twin01 = tf_cosine_twin(glob01, K)
    spark01 = [
        (r.doc_a, r.doc_b, r.dot, r.cos2)
        for r in queries()['dedup_tf_cosine_pairs'](
            spark, '/root/testdata/sf0.1'
        ).collect()
    ]
    link1 = twin01 == spark01
    print(f'{"ok  " if link1 else "FAIL"} tf_cosine sf0.1: twin == '
          f'registered Spark ({len(twin01)} rows, '
          f'checksum {_rows_checksum(twin01)})')

    # chain link 2 (sf0.1): blocked oracle == twin (validates the blocking)
    blocked01 = tf_cosine_blocked_oracle(glob01, K, 5)
    link2 = blocked01 == twin01
    print(f'{"ok  " if link2 else "FAIL"} tf_cosine sf0.1: blocked oracle '
          f'== twin')

    # chain link 3 (sf1): twin == blocked oracle — the sf1 value evidence
    t0 = time.perf_counter()
    twin1 = tf_cosine_twin(sf1_glob, K)
    twin_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    blocked1 = tf_cosine_blocked_oracle(sf1_glob, K, COS_BLOCKS)
    oracle_s = time.perf_counter() - t0
    link3 = twin1 == blocked1
    print(f'{"ok  " if link3 else "FAIL"} tf_cosine sf1: twin '
          f'({twin_s:.1f}s) == blocked oracle ({oracle_s:.1f}s), '
          f'{len(twin1)} rows, checksum {_rows_checksum(twin1)}')
    if not link3:
        for a, b in zip(twin1, blocked1):
            if a != b:
                print('  twin  :', a, '\n  oracle:', b)
                break
    return {'ok': link1 and link2 and link3,
            'sf01_spark_eq_twin': link1, 'sf01_blocked_eq_twin': link2,
            'sf1_twin_eq_blocked': link3,
            'twin_sec': round(twin_s, 1), 'oracle_sec': round(oracle_s, 1)}


def main() -> int:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/cb_sf1'
    if not os.path.isdir(sf1_dir):
        print(f'sf1 dataset missing at {sf1_dir} — run: python tools/gen_sf1.py')
        return 2
    from cyclebane_spark.functions import bench_session

    spark = bench_session('cyclebane-sf1-twin-evidence')
    spark.sparkContext.setLogLevel('ERROR')
    res = {
        'dedup_semantic_kmeans': check_semantic_kmeans(spark, sf1_dir),
        'dedup_tf_cosine_pairs': check_tf_cosine(spark, sf1_dir),
    }
    ok = all(v['ok'] for v in res.values())
    print(json.dumps({'sf1_twin_evidence': res, 'ok': ok}))
    spark.stop()
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
