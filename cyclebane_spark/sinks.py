"""Write-side data layout: multi-dimensional (Z-order) clustering.

The reference library has no storage layer (SURVEY.md §2.2 — sinks ABSENT);
this module is part of the engine's additive Spark surface, alongside the
sink patterns exercised in tests/test_sinks.py (partitioned, bucketed,
dynamic-overwrite, AQE-rebalanced, streaming-upsert writes).

Single-column range clustering (repartitionByRange + sortWithinPartitions)
gives narrow parquet min/max footers on ONE column. A table queried by a
conjunction over several columns (time x tenant, user x event) needs file
stats narrow in ALL of them; sorting by a Morton/Z-order interleave of the
quantized columns achieves that — the same layout step Delta's
``OPTIMIZE ... ZORDER BY`` and Iceberg's ``rewrite_data_files(sort_order =>
zorder(...))`` run, stated here with plain DataFrame ops on plain parquet.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .functions import zorder_interleave

ZBITS = 16


def with_zorder_key(df: DataFrame, cols: Sequence[str], bits: int = ZBITS):
    """Attach the Z-order key column ``__zkey`` over ``cols``.

    Each column is equi-width quantized onto [0, 2^bits) from its global
    min/max (ONE narrow agg action over just those columns — the same
    stats pass Delta's OPTIMIZE runs before clustering); the quantized
    coordinates are bit-interleaved JVM-side. NULLs quantize to 0, so they
    cluster together at the low corner instead of killing the row.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f'__lo_{c}'), F.max(c).alias(f'__hi_{c}')]
    stats = df.agg(*aggs).first()
    scale = (1 << bits) - 1
    qcols = []
    for c in cols:
        lo, hi = stats[f'__lo_{c}'], stats[f'__hi_{c}']
        span = (hi - lo) if (hi is not None and lo is not None) else 0
        if not span:
            qcols.append(F.lit(0))
            continue
        qcols.append(
            F.coalesce(
                (
                    (F.col(c).cast('double') - float(lo))
                    * (scale / float(span))
                ).cast('bigint'),
                F.lit(0),
            )
        )
    return df.withColumn('__zkey', zorder_interleave(*qcols, bits=bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 8,
    bits: int = ZBITS,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve over ``cols``.

    repartitionByRange on the interleaved key splits the curve into
    ``n_files`` contiguous segments (range exchange: sampled split points,
    no single reducer); sortWithinPartitions orders each file along the
    curve so row-group footers stay narrow too. The key itself is dropped
    before writing — it is a layout device, not data. Readers need no
    cooperation: plain parquet scans prune via ordinary min/max stats on
    the ORIGINAL columns, which the curve locality keeps tight in every
    interleaved dimension (asserted on real footers in tests/test_sinks.py).
    """
    (
        with_zorder_key(df, cols, bits)
        .repartitionByRange(n_files, '__zkey')
        .sortWithinPartitions('__zkey')
        .drop('__zkey')
        .write.mode('overwrite')
        .parquet(path)
    )


def compact_sorted(
    df: DataFrame, path: str, col: str, n_files: int = 16
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files range-clustered on
    ``col`` — the compaction step a streaming sink needs to keep its
    accumulated per-micro-batch appends readable.

    repartitionByRange gives each output file a NARROW, disjoint
    ``col`` range (sampled split points, no single reducer), and
    sortWithinPartitions keeps row-group footers tight inside each file,
    so a point/IN predicate on ``col`` prunes at BOTH the file and the
    row-group level (asserted on real footers in tests/test_sinks.py and
    tests/test_streaming.py). This is the plain-parquet statement of
    Delta ``OPTIMIZE``/Iceberg ``rewrite_data_files`` with a sort order:
    at 100 TB the same call runs per state shard on a schedule, bounding
    both the file count a reader lists and the bytes a keyed probe scans.
    """
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode('overwrite')
        .parquet(path)
    )
