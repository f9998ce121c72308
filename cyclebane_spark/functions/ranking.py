"""Bucketed two-level global rank — exact total order without a
single-reducer sort.

The shape (shared by the positional-slice index, sorted-neighborhood
dedup, and equal-frequency curriculum binning):

1. assign each row a bucket via an expression that is MONOTONE
   (non-decreasing) in the sort key, so bucket-major order IS the global
   order — ``floor(key / W)`` for dense numerics, a sampled-split-point
   CASE tree for strings/dates, a short key prefix, or the key itself
   when its cardinality is small;
2. ONE narrow aggregation counts rows per bucket; a window over those
   ~n_rows/W rows (metadata-sized at any scale) cumulates the counts
   into bucket start offsets;
3. the offsets broadcast-join back and
   ``position = offset + row_number() within the bucket`` — the
   within-bucket window partitions by bucket, so every partition sorts
   in parallel.

Rank EXACTNESS never depends on bucket balance, only task balance does:
any monotone bucket assignment gives exact global positions because the
within-bucket window orders by the full sort key. A skewed bucket is a
slow task, not a wrong answer; the equi-depth sampled-split bucketing
(``sources/arrays.py _range_bucket_expr``) is the escape hatch.

This replaces ``row_number() OVER (ORDER BY ...)`` — which Spark plans
as a single-partition window, the classic 100 TB single-reducer trap.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_global_position(
    df: DataFrame,
    bucket: Column,
    order_cols: Sequence[Column | str],
    pos_col: str = '__pos',
) -> DataFrame:
    """Attach an exact 0-based global position in ``order_cols`` order.

    ``bucket`` must be monotone in the ``order_cols`` sort order (see the
    module note) and NULL-free — callers map NULL/NaN keys to sentinel
    buckets that sort where the key sorts (an inner equi-join on a NULL
    bucket would silently drop rows while their counts still shifted every
    offset).

    Call sites: positional slicing (``sources/arrays.py _with_position``),
    sorted-neighborhood dedup (``queries/dedup.py``), length-curriculum
    binning (``queries/text.py``).
    """
    from pyspark.sql import Window

    bucketed = df.withColumn('__grb', bucket)
    # Narrow scan: Catalyst prunes the count aggregate's input to the
    # bucket expression's columns only.
    counts = (
        df.select(bucket.alias('__grb'))
        .groupBy('__grb')
        .agg(F.count(F.lit(1)).alias('__grn'))
    )
    off_w = Window.orderBy('__grb').rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        '__grb',
        F.coalesce(F.sum('__grn').over(off_w), F.lit(0)).alias('__groff'),
    )
    in_bucket = Window.partitionBy('__grb').orderBy(*order_cols)
    return (
        bucketed.join(F.broadcast(offsets), '__grb')
        .withColumn(
            pos_col, F.col('__groff') + F.row_number().over(in_bucket) - 1
        )
        .drop('__grb', '__groff')
    )
