"""Parquet table catalog for the TESTDATA star schema.

The same loaders serve every scale factor; at 100 TB the only change is the
directory. All readers go through ``spark.read.parquet`` so Catalyst gets
predicate pushdown / column pruning on the scan (check ``PushedFilters`` in
``df.explain``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    'region',
    'nation',
    'customer',
    'supplier',
    'part',
    'orders',
    'lineitem',
    'events',
    'documents',
    'embeddings',
)

# Tables small enough to broadcast in joins against the fact tables even at
# large scale factors (region/nation are fixed-size; supplier/customer/part
# grow with SF but stay orders of magnitude below lineitem — at 100 TB these
# would be bucketed instead, so the join helpers take an explicit hint).
SMALL_DIMS = frozenset({'region', 'nation'})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f'{sf_dir}/{name}.parquet')


def tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}
