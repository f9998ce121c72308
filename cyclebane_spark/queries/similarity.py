"""Similarity search over the ``embeddings`` table (north-star):
brute-force cosine top-k as the correctness baseline, and a blocked
(IVF-style) variant as the scale path.

Scale design (100 TB of vectors):
- Brute force is O(Q x N) — correct but only viable for small query sets;
  it is the oracle for everything else.
- The IVF variant restricts candidates to the query's coarse cell (here the
  ``label`` column stands in for a k-means cell id; in production the cell
  id is computed once at ingest). The candidate join becomes an equi-join on
  the cell id — shuffle-partitionable, broadcast-able for small query sets.
- Ranking uses a rounded cosine plus the vector id as tiebreaker so top-k
  sets are deterministic across engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ..tables import table
from . import register
from .dedup import SQL_DOT, _spark_dot

N_QUERIES = 5  # vec_id < 5 are the query vectors
TOP_K = 10


def _ranked(joined, partition_col):
    """rank by rounded cosine desc, vec_id asc — deterministic top-k."""
    cos = F.round(
        _spark_dot(F.col('q.embedding'), F.col('c.embedding'))
        / (F.col('q.nrm') * F.col('c.nrm')),
        9,
    )
    w = Window.partitionBy(partition_col).orderBy(
        F.desc('cosine'), F.asc('neighbor_id')
    )
    return (
        joined.select(
            F.col('q.vec_id').alias('query_id'),
            F.col('c.vec_id').alias('neighbor_id'),
            cos.alias('cosine'),
        )
        .withColumn('rk', F.row_number().over(w).cast('long'))
        .filter(F.col('rk') <= TOP_K)
    )


_SQL_COS = (
    f"round({SQL_DOT.format(a='q.embedding', b='c.embedding')}"
    ' / (q.nrm * c.nrm), 9)'
)

_SQL_NORMED = f"""
    WITH n AS (
        SELECT vec_id, label, embedding,
               sqrt({SQL_DOT.format(a='embedding', b='embedding')}) AS nrm
        FROM embeddings
    )"""


@register(
    'ann_bruteforce_topk',
    headline=True,
    oracle=f"""{_SQL_NORMED}
    SELECT query_id, neighbor_id, cosine, rk FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_SQL_COS} AS cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {_SQL_COS} DESC, c.vec_id
               ) AS rk
        FROM n q JOIN n c ON q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
    ) WHERE rk <= {TOP_K}
    """,
)
def ann_bruteforce_topk(spark, sf_dir):
    """Exact cosine top-k: Q query vectors against the full corpus."""
    emb = table(spark, sf_dir, 'embeddings')
    n = emb.select(
        'vec_id',
        'label',
        'embedding',
        F.sqrt(_spark_dot(F.col('embedding'), F.col('embedding'))).alias('nrm'),
    )
    q = n.filter(F.col('vec_id') < N_QUERIES).alias('q')
    c = n.filter(F.col('vec_id') >= N_QUERIES).alias('c')
    # Broadcast the (small) query side: the corpus never shuffles.
    return _ranked(F.broadcast(q).crossJoin(c), 'query_id')


@register(
    'explode_embedding_components',
    oracle="""
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
           CAST(UNNEST(embedding) AS DOUBLE) AS component
    FROM embeddings
    WHERE vec_id < 100
    """,
)
def explode_embedding_components(spark, sf_dir):
    """posexplode: array column -> (position, value) rows — the lateral-view
    path that turns nested data relational. Scale: pure projection fan-out
    (64x rows), no shuffle; position becomes a first-class joinable column
    (this is exactly the long-form melt the plan layer ingests N-D arrays
    with — SURVEY.md §1.3)."""
    emb = table(spark, sf_dir, 'embeddings').filter(F.col('vec_id') < 100)
    return emb.select(
        'vec_id', F.posexplode('embedding').alias('pos', 'component')
    ).select('vec_id', 'pos', F.col('component').cast('double').alias('component'))


@register(
    'ann_ivf_blocked_topk',
    oracle=f"""{_SQL_NORMED}
    SELECT query_id, neighbor_id, cosine, rk FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_SQL_COS} AS cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {_SQL_COS} DESC, c.vec_id
               ) AS rk
        FROM n q JOIN n c
          ON q.label = c.label AND q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
    ) WHERE rk <= {TOP_K}
    """,
)
def ann_ivf_blocked_topk(spark, sf_dir):
    """IVF-style ANN: candidates restricted to the query's coarse cell.

    The cross join collapses to an equi-join on the cell id — at scale this
    is the difference between O(Q x N) and O(Q x N / n_cells). Recall is
    bounded by the quantizer (probe more cells to trade cost for recall).
    """
    emb = table(spark, sf_dir, 'embeddings')
    n = emb.select(
        'vec_id',
        'label',
        'embedding',
        F.sqrt(_spark_dot(F.col('embedding'), F.col('embedding'))).alias('nrm'),
    )
    q = n.filter(F.col('vec_id') < N_QUERIES).alias('q')
    c = n.filter(F.col('vec_id') >= N_QUERIES).alias('c')
    joined = q.join(c, F.col('q.label') == F.col('c.label'))
    return _ranked(joined, 'query_id')
