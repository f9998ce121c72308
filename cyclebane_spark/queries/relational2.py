"""Second batch of relational coverage: subquery shapes (scalar, correlated,
EXISTS/IN), conditional aggregation, hash-based sampling, distinct counting
(exact + sketch), and array functions.

Scale notes inline; everything stays in whole-stage codegen (no Python).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ..tables import spread_small, table
from . import register
from ._helpers import dsum, sql_dsum


@register(
    'subquery_scalar_avg',
    oracle=f"""
    SELECT p_brand,
           COUNT(*) AS n_small,
           {sql_dsum('p_retailprice')} AS small_value
    FROM part
    WHERE p_size < (SELECT AVG(p_size) FROM part)
    GROUP BY p_brand
    """,
)
def subquery_scalar_avg(spark, sf_dir):
    """Scalar subquery: compare against a global aggregate.

    One lazy plan: the 1-row global aggregate is broadcast-cross-joined
    into the scan and folded into the filter.  No driver round-trip — at
    100 TB a ``collect()`` here would serialize a full scan barrier before
    the real query starts; the broadcast version lets both sides schedule
    under one job (and the aggregate arm prunes to the single p_size
    column).
    """
    part = table(spark, sf_dir, 'part')
    avg_size = part.agg(F.avg('p_size').alias('_avg_size'))
    return (
        part.crossJoin(F.broadcast(avg_size))
        .filter(F.col('p_size') < F.col('_avg_size'))
        .groupBy('p_brand')
        .agg(
            F.count(F.lit(1)).alias('n_small'),
            dsum('p_retailprice').alias('small_value'),
        )
    )


@register(
    'subquery_correlated_avg',
    oracle="""
    WITH per_part AS (
        SELECT l_partkey,
               (CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
                / COUNT(l_quantity)) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l.l_partkey, COUNT(*) AS n_above
    FROM lineitem l JOIN per_part p ON l.l_partkey = p.l_partkey
    WHERE l.l_quantity > p.avg_qty
    GROUP BY l.l_partkey
    """,
)
def subquery_correlated_avg(spark, sf_dir):
    """Correlated subquery (TPC-H Q17 shape) decorrelated to a join.

    The classic optimizer rewrite stated directly: aggregate once per key,
    join back, filter. One shuffle for the aggregate, one for the join
    (co-partitioned on the same key, so AQE can reuse the exchange).
    """
    li = table(spark, sf_dir, 'lineitem')
    per_part = li.groupBy('l_partkey').agg(
        (
            F.sum(F.col('l_quantity').cast('decimal(28,6)')).cast('double')
            / F.count('l_quantity')
        ).alias('avg_qty')
    )
    return (
        li.join(per_part, 'l_partkey')
        .filter(F.col('l_quantity') > F.col('avg_qty'))
        .groupBy('l_partkey')
        .agg(F.count(F.lit(1)).alias('n_above'))
    )


@register(
    'subquery_exists_priority',
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def subquery_exists_priority(spark, sf_dir):
    """EXISTS (TPC-H Q4 shape) as a left-semi join."""
    orders = table(spark, sf_dir, 'orders')
    li = table(spark, sf_dir, 'lineitem')
    ots = orders.schema['o_orderdate'].dataType
    filtered = orders.filter(
        (F.col('o_orderdate') >= F.lit('1996-07-01 00:00:00').cast(ots))
        & (F.col('o_orderdate') < F.lit('1996-10-01 00:00:00').cast(ots))
    )
    return (
        filtered.join(
            li,
            (li.l_orderkey == filtered.o_orderkey)
            & (li.l_shipdate > filtered.o_orderdate),
            'left_semi',
        )
        .groupBy('o_orderpriority')
        .agg(F.count(F.lit(1)).alias('order_count'))
    )


@register(
    'conditional_agg_shipmodes',
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) FILTER (l_quantity >= 25) AS n_bulk,
           COUNT(*) FILTER (l_quantity < 25) AS n_small,
           {sql_dsum('CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END')}
               AS discounted_value
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def conditional_agg_shipmodes(spark, sf_dir):
    """Conditional aggregation (TPC-H Q12 shape): CASE inside aggregates."""
    li = table(spark, sf_dir, 'lineitem')
    return li.groupBy('l_returnflag').agg(
        F.count(F.when(F.col('l_quantity') >= 25, 1)).alias('n_bulk'),
        F.count(F.when(F.col('l_quantity') < 25, 1)).alias('n_small'),
        dsum(
            F.when(F.col('l_discount') > 0.05, F.col('l_extendedprice')).otherwise(
                0
            )
        ).alias('discounted_value'),
    )


@register(
    'promo_revenue_ratio',
    oracle=f"""
    SELECT
        100.0 * {sql_dsum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
            / {sql_dsum('l_extendedprice * (1 - l_discount)')} AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def promo_revenue_ratio(spark, sf_dir):
    """Ratio of conditional aggregates (TPC-H Q14 shape); part side joins
    after the selective shipdate filter prunes lineitem."""
    li = table(spark, sf_dir, 'lineitem')
    part = table(spark, sf_dir, 'part')
    lts = li.schema['l_shipdate'].dataType
    disc = F.col('l_extendedprice') * (1 - F.col('l_discount'))
    promo = F.when(F.col('p_type').like('PROMO%'), disc).otherwise(0)
    return (
        li.filter(
            (F.col('l_shipdate') >= F.lit('1996-09-01 00:00:00').cast(lts))
            & (F.col('l_shipdate') < F.lit('1996-10-01 00:00:00').cast(lts))
        )
        .join(part, li.l_partkey == part.p_partkey)
        .agg(
            (F.lit(100.0) * dsum(promo) / dsum(disc)).alias('promo_revenue_pct')
        )
    )


@register(
    'sample_hash_based',
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
)
def sample_hash_based(spark, sf_dir):
    """Deterministic ~12.5% sample via content hashing.

    The scale-honest sampling pattern: reproducible across engines, runs,
    and partitionings (unlike rng-based TABLESAMPLE), trivially pushed into
    any engine, and stable under data re-layout — what you want for
    train/holdout splits over 100 TB.
    """
    docs = table(spark, sf_dir, 'documents')
    return docs.filter(
        F.substring(F.md5(F.col('doc_id').cast('string')), 1, 1).isin('0', '1')
    ).select('doc_id', 'lang')


@register(
    'sample_stratified',
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE CASE WHEN lang = 'en'
               THEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                    IN ('0','1','2','3','4','5','6','7')
               ELSE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1')
          END
    """,
)
def sample_stratified(spark, sf_dir):
    """Stratified deterministic sampling: 50% of 'en' documents, 12.5% of
    every other language — per-stratum rates from the same content hash.

    The standard corpus-rebalancing op (upweight scarce languages / downweight
    dominant ones). Same scale story as `sample_hash_based`: a pure filter,
    no shuffle, reproducible under any re-partitioning.
    """
    docs = table(spark, sf_dir, 'documents')
    nib = F.substring(F.md5(F.col('doc_id').cast('string')), 1, 1)
    keep = F.when(
        F.col('lang') == 'en', nib.isin(*'01234567')
    ).otherwise(nib.isin('0', '1'))
    return docs.filter(keep).select('doc_id', 'lang')


@register(
    'count_distinct_exact',
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def count_distinct_exact(spark, sf_dir):
    """Exact multi-column distinct counting (expand + two-phase agg)."""
    li = table(spark, sf_dir, 'lineitem')
    return li.groupBy('l_returnflag').agg(
        F.count_distinct('l_partkey').alias('n_parts'),
        F.count_distinct('l_suppkey').alias('n_supps'),
    )


@register(
    'approx_count_distinct_hll',
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts_exact,
           TRUE AS within_bound
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def approx_count_distinct_hll(spark, sf_dir):
    """HyperLogLog distinct sketch — the 100 TB path (no expand, tiny state).

    The raw HLL estimate is engine-specific (Spark's and DuckDB's sketches
    never hash-match), so the checkable contract is: the exact count plus a
    deterministic flag asserting the sketch landed within 3 sigma (3 * rsd)
    of it.  Spark's HLL is deterministic for a given input, so the flag is
    stable; the oracle recomputes the exact counts and expects TRUE.

    Both aggregates run in ONE grouped aggregation (one shuffle); at 100 TB
    you would drop the exact arm and ship the sketch alone — this query's
    job is to prove the sketch path against ground truth.
    """
    li = table(spark, sf_dir, 'lineitem')
    return (
        li.groupBy('l_returnflag')
        .agg(
            F.count_distinct('l_partkey').alias('n_parts_exact'),
            F.approx_count_distinct('l_partkey', rsd=0.02).alias('_approx'),
        )
        .select(
            'l_returnflag',
            'n_parts_exact',
            (
                F.abs(F.col('_approx') - F.col('n_parts_exact'))
                <= 3 * 0.02 * F.col('n_parts_exact')
            ).alias('within_bound'),
        )
    )


_Q10_SQL = """
    SELECT /*+ BROADCAST(nation) */
           c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
                AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


@register(
    'sql_interface_q10',
    oracle=_Q10_SQL.replace('/*+ BROADCAST(nation) */', ''),
)
def sql_interface_q10(spark, sf_dir):
    """The spark.sql entry point: register temp views, run ANSI SQL with a
    broadcast hint (TPC-H Q10 shape). Same text minus the hint is the
    oracle — the SQL surface is first-class, not just the DataFrame API.
    """
    for name in ('customer', 'orders', 'lineitem', 'nation'):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_Q10_SQL)


_PORTABLE_SQL = """
    WITH ranked AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS seq
        FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(seq AS BIGINT) AS seq
    FROM ranked WHERE seq <= 2
"""


@register('sql_interface_portable', oracle=_PORTABLE_SQL)
def sql_interface_portable(spark, sf_dir):
    """Byte-identical ANSI SQL on both engines: the string passed to
    spark.sql IS the oracle string — CTE + window + filter with zero
    dialect edits. The strongest statement that the SQL entry point is
    standard, not a dialect."""
    table(spark, sf_dir, 'orders').createOrReplaceTempView('orders')
    return spark.sql(_PORTABLE_SQL)


@register(
    'skew_salted_agg',
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n_items,
           {sql_dsum('l_extendedprice')} AS total_value
    FROM lineitem GROUP BY l_returnflag
    """,
)
def skew_salted_agg(spark, sf_dir):
    """Two-level salted aggregation for skewed keys, same result as direct.

    l_returnflag has ~3 distinct values — at 100 TB a direct groupBy would
    put a third of the table through single reducers. Salting splits each
    hot key across 16 shuffle partitions (level 1), then merges the 48
    partials (level 2, trivial). Decimal accumulators make the two-level
    sum bit-identical to the direct plan. AQE's skewedJoin/skewedPartition
    handling automates this for joins; for aggregations the salt is the
    standard manual pattern.
    """
    li = table(spark, sf_dir, 'lineitem')
    salted = li.withColumn('__salt', F.pmod(F.col('l_orderkey'), F.lit(16)))
    partial = salted.groupBy('l_returnflag', '__salt').agg(
        F.count(F.lit(1)).alias('pn'),
        F.sum(F.col('l_extendedprice').cast('decimal(28,6)')).alias('pv'),
    )
    return partial.groupBy('l_returnflag').agg(
        F.sum('pn').alias('n_items'),
        F.sum('pv').cast('double').alias('total_value'),
    )


@register(
    'array_functions',
    oracle=r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_unique,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3_sorted,
           list_contains(toks, 'spark') AS has_spark
    FROM t
    """,
)
def array_functions(spark, sf_dir):
    """Array function coverage: size, distinct, sort, slice, join, contains."""
    docs = table(spark, sf_dir, 'documents')
    toks = F.split(F.trim(F.col('text')), r'\s+')
    uniq = F.array_distinct(toks)
    return docs.select(
        'doc_id',
        F.size(toks).cast('long').alias('n_tokens'),
        F.size(uniq).cast('long').alias('n_unique'),
        F.array_join(F.slice(F.array_sort(uniq), 1, 3), ',').alias(
            'first3_sorted'
        ),
        F.array_contains(toks, 'spark').alias('has_spark'),
    )


@register(
    'map_functions',
    oracle="""
    WITH c AS (
        SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    m AS (
        SELECT map_from_entries(
                   list_sort(list(struct_pack(k := lang, v := n)))
               ) AS m
        FROM c
    )
    SELECT CAST(cardinality(m) AS BIGINT) AS n_langs,
           CAST(map_extract(m, 'en')[1] AS BIGINT) AS n_en,
           list_max(map_keys(m)) AS last_lang,
           CAST(list_max(map_values(m)) AS BIGINT) AS max_count
    FROM m
    """,
)
def map_functions(spark, sf_dir):
    """MapType scalar-function coverage: map_from_entries / size /
    element_at / map_keys / map_values, all JVM-side.

    Entries are sorted before map construction so both engines build the
    same entry order (map iteration order is construction order in each).
    """
    docs = table(spark, sf_dir, 'documents')
    counts = docs.groupBy('lang').agg(F.count(F.lit(1)).alias('n'))
    m = counts.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct('lang', 'n')))
        ).alias('m')
    )
    return m.select(
        F.size('m').cast('long').alias('n_langs'),
        F.element_at('m', F.lit('en')).alias('n_en'),
        F.array_max(F.map_keys('m')).alias('last_lang'),
        F.array_max(F.map_values('m')).alias('max_count'),
    )


@register(
    'percentile_exact',
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS qty_p50,
           quantile_cont(l_quantity, 0.9) AS qty_p90,
           quantile_cont(l_extendedprice, 0.9) AS price_p90
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentile_exact(spark, sf_dir):
    """Exact percentiles (linear interpolation) per group.

    Spark's ``percentile`` and DuckDB's ``quantile_cont`` share the same
    interpolation arithmetic, so the doubles match bit-for-bit. Exact
    percentile buffers each group's values — at 100 TB switch to
    ``approx_percentile`` (KLL-style sketch, mergeable, bounded memory);
    see ``approx_count_distinct_hll`` for the sketch-query pattern.
    """
    # r11 optimization: percentile's partial aggregate buffers every value —
    # on the one-row-group driver file that buffering ran in the single scan
    # task. spread_small moves the map-side buffers core-wide (no-op on
    # multi-split layouts); the 3-group merge is unchanged.
    li = spread_small(table(spark, sf_dir, 'lineitem'), 'l_orderkey')
    return li.groupBy('l_returnflag').agg(
        F.expr('percentile(l_quantity, 0.5)').alias('qty_p50'),
        F.expr('percentile(l_quantity, 0.9)').alias('qty_p90'),
        F.expr('percentile(l_extendedprice, 0.9)').alias('price_p90'),
    )


@register(
    'approx_percentile_bounds',
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS p50_exact,
           quantile_cont(l_quantity, 0.9) AS p90_exact,
           TRUE AS p50_rank_ok,
           TRUE AS p90_rank_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def approx_percentile_bounds(spark, sf_dir):
    """Mergeable percentile sketch (the 100 TB path), verified in RANK space.

    ``approx_percentile``'s GK summary guarantees rank error <= eps = 
    1/accuracy REGARDLESS of partition/merge order, so the checkable
    contract (cf. ``approx_count_distinct_hll``) is: the exact interpolated
    percentiles plus flags asserting the sketch value's exact rank lands in
    [q - eps, q + eps]. A value-space bound would be fragile (an element
    value can sit below the interpolated percentile at q - eps on a value
    jump); counting rows <= / < the sketch value is exact and robust. The
    rank count needs a second pass over the group — verification-only cost;
    production ships the sketch alone.
    """
    li = table(spark, sf_dir, 'lineitem')
    eps = 1.0 / 1000
    ap = li.groupBy('l_returnflag').agg(
        F.percentile_approx('l_quantity', 0.5, 1000).alias('a50'),
        F.percentile_approx('l_quantity', 0.9, 1000).alias('a90'),
        F.expr('percentile(l_quantity, 0.5)').alias('p50_exact'),
        F.expr('percentile(l_quantity, 0.9)').alias('p90_exact'),
    )
    j = li.select('l_returnflag', 'l_quantity').join(
        F.broadcast(ap), 'l_returnflag'
    )
    agg = j.groupBy('l_returnflag').agg(
        F.first('p50_exact').alias('p50_exact'),
        F.first('p90_exact').alias('p90_exact'),
        F.count(F.lit(1)).alias('n'),
        F.sum(F.when(F.col('l_quantity') <= F.col('a50'), 1).otherwise(0)).alias('le50'),
        F.sum(F.when(F.col('l_quantity') < F.col('a50'), 1).otherwise(0)).alias('lt50'),
        F.sum(F.when(F.col('l_quantity') <= F.col('a90'), 1).otherwise(0)).alias('le90'),
        F.sum(F.when(F.col('l_quantity') < F.col('a90'), 1).otherwise(0)).alias('lt90'),
    )

    def rank_ok(le, lt, q):
        lo = F.floor((F.lit(q) - F.lit(eps)) * F.col('n'))
        hi = F.ceil((F.lit(q) + F.lit(eps)) * F.col('n'))
        return (F.col(le) >= lo) & (F.col(lt) <= hi)

    return agg.select(
        'l_returnflag',
        'p50_exact',
        'p90_exact',
        rank_ok('le50', 'lt50', 0.5).alias('p50_rank_ok'),
        rank_ok('le90', 'lt90', 0.9).alias('p90_rank_ok'),
    )


@register(
    'sample_fixed_k',
    oracle="""
    SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
    FROM documents
    ORDER BY h, doc_id LIMIT 100
    """,
)
def sample_fixed_k(spark, sf_dir):
    """Exact-k deterministic sample: the reservoir-sampling answer stated
    as a hash-order top-k — every engine/run/partitioning picks the SAME
    100 documents (md5 order is uniform and content-derived), unlike
    rand()-seeded reservoirs whose output depends on partition layout.

    Scale: TakeOrderedAndProject — each task keeps its local top-100, the
    driver merges 100 x n_tasks rows; no global sort, no shuffle of the
    corpus. The k-sample every profiler/debugger wants from a 100 TB
    table for the cost of one scan.
    """
    docs = table(spark, sf_dir, 'documents')
    h = F.md5(F.col('doc_id').cast('string'))
    return (
        docs.select('doc_id', h.alias('h'))
        .orderBy('h', 'doc_id')
        .limit(100)
    )


@register(
    'sample_stratified_exact_k',
    oracle="""
    SELECT doc_id, lang, h, rk FROM (
        SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h,
               CAST(row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS BIGINT) AS rk
        FROM documents
    ) WHERE rk <= 40
    """,
)
def sample_stratified_exact_k(spark, sf_dir):
    """Exactly-k-per-stratum deterministic sample: 40 documents per
    language, chosen by content-derived md5 order — the per-group
    reservoir answer (eval/val splits want EXACT per-language counts,
    which rate-based sampling can't promise on skewed strata).

    Scale: one shuffle keyed on the stratum; each window partition ranks
    only its own language's rows — no global sort, no driver. Skewed
    strata cost their own partition only; with a two-level rank (the
    positional-slice shape) even a single giant stratum splits. Unlike
    ``sample_fixed_k`` (global TakeOrderedAndProject), the per-stratum
    guarantee needs the groupwise rank.
    """
    docs = table(spark, sf_dir, 'documents')
    h = F.md5(F.col('doc_id').cast('string'))
    w = Window.partitionBy('lang').orderBy('h', 'doc_id')
    return (
        docs.select('doc_id', 'lang', h.alias('h'))
        .withColumn('rk', F.row_number().over(w).cast('long'))
        .filter(F.col('rk') <= 40)
    )
