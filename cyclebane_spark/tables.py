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


# Resolved-relation cache, the local analog of a metastore's table cache:
# ``spark.read.parquet`` lists files and reads footers on every call, a
# driver-side round-trip that would otherwise be paid per query construction.
# DataFrames are immutable plans, so handing the same object out is safe; the
# cache is keyed by applicationId so entries die with their session.
_RELATION_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    app_id = spark.sparkContext.applicationId
    # Entries for stopped sessions can never be handed out again (their
    # applicationId no longer matches) — drop them so plans don't accumulate
    # for the process lifetime across session restarts.
    for k in [k for k in _RELATION_CACHE if k[0] != app_id]:
        del _RELATION_CACHE[k]
    key = (app_id, sf_dir, name)
    df = _RELATION_CACHE.get(key)
    if df is None:
        if name == 'events':
            df = events_table(spark, sf_dir)
        else:
            df = spark.read.parquet(f'{sf_dir}/{name}.parquet')
        _RELATION_CACHE[key] = df
    elif name == 'events':
        # The two session confs the events plan depends on are asserted in
        # events_table on cache miss; intervening code could have un-pinned
        # them since. Re-assert on the cached path — cheap idempotent sets.
        spark.conf.set('spark.sql.legacy.parquet.nanosAsLong', 'true')
        spark.conf.set('spark.sql.session.timeZone', 'UTC')
    return df


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as TIMESTAMP_NTZ.

    The testdata generator has shipped ``ts`` two ways across rounds:
    nanosecond timestamps (which Spark's vectorized reader rejects — read as
    raw longs via the legacy conf and truncate to microseconds, matching
    DuckDB's ns->us truncation) or plain microsecond timestamps.  Detect
    which from the loaded type so either generation works; both paths end at
    a naive (NTZ) timestamp so no result depends on the session timezone.
    """
    import pyspark.sql.functions as F
    from pyspark.sql.types import LongType

    spark.conf.set('spark.sql.legacy.parquet.nanosAsLong', 'true')
    # Pin the session to UTC: any instant->NTZ cast below renders in the
    # session TZ at *execution* time, so this must hold for the DataFrame's
    # lifetime (not just during construction).
    spark.conf.set('spark.sql.session.timeZone', 'UTC')
    ev = spark.read.parquet(f'{sf_dir}/events.parquet')
    if isinstance(ev.schema['ts'].dataType, LongType):
        # Nanos-as-long: `div` (integer division) because epoch-nanos exceed
        # double's exact range, so `/ 1000` through double would round the
        # microsecond.
        ev = ev.withColumn('ts', F.expr('ts div 1000')).withColumn(
            'ts', F.timestamp_micros('ts').cast('timestamp_ntz')
        )
    else:
        ev = ev.withColumn('ts', F.col('ts').cast('timestamp_ntz'))
    return ev


def tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}
