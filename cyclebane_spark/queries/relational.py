"""Relational operator coverage: scans, filters, joins (equi / broadcast /
semi / anti / range), aggregation (global / grouped / rollup / cube),
windows, sorts/top-k, set ops, distinct, scalar functions.

These correspond to SURVEY.md §2.2's category map. The reference models only
map/reduce/groupby symbolically (`/root/reference/src/cyclebane/graph.py`);
the full relational surface is what our Spark engine adds so the same plan
layer drives 100 TB analytics. Scale notes per query in docstrings.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ..tables import spread_small, table
from . import register
from ._helpers import davg, dsum, sql_davg, sql_dsum

# ---------------------------------------------------------------------------
# Pricing summary (TPC-H Q1 shape): full-scan grouped aggregate.
# Scale: partial aggregation (map-side combine) collapses 100 TB to 4 groups
# before the shuffle; only the filter column + 7 value columns are read.
# ---------------------------------------------------------------------------


@register(
    'q1_pricing_summary',
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q1_pricing_summary(spark, sf_dir):
    li = table(spark, sf_dir, 'lineitem')
    disc_price = F.col('l_extendedprice') * (1 - F.col('l_discount'))
    charge = disc_price * (1 + F.col('l_tax'))
    filtered = li.filter(
        F.col('l_shipdate')
        <= F.lit('1998-09-02 00:00:00').cast(li.schema['l_shipdate'].dataType)
    )
    # r11 optimization: the 8 decimal partial aggregates are the dominant
    # cost and run entirely inside the scan stage — on a few-file input
    # (one row group per driver table) that is ONE core. spread_small moves
    # them behind a parallelism-restoring exchange locally and is a no-op
    # on production multi-split layouts, where map-side combine before the
    # 4-group shuffle remains the right plan. Measured 1.36s -> 0.75s at
    # sf0.1 (OPTIMIZATION_r11.md).
    return (
        spread_small(filtered, 'l_orderkey')
        .groupBy('l_returnflag', 'l_linestatus')
        .agg(
            dsum('l_quantity').alias('sum_qty'),
            dsum('l_extendedprice').alias('sum_base_price'),
            dsum(disc_price).alias('sum_disc_price'),
            dsum(charge).alias('sum_charge'),
            davg('l_quantity').alias('avg_qty'),
            davg('l_extendedprice').alias('avg_price'),
            davg('l_discount').alias('avg_disc'),
            F.count(F.lit(1)).alias('count_order'),
        )
    )


# ---------------------------------------------------------------------------
# Selective filter + global aggregate (TPC-H Q6 shape).
# Scale: all three predicates push to the parquet scan (PushedFilters);
# the aggregate is a single partial+final reduction, no groupBy shuffle.
# ---------------------------------------------------------------------------


@register(
    'q6_forecast_revenue',
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    headline=True,
)
def q6_forecast_revenue(spark, sf_dir):
    li = table(spark, sf_dir, 'lineitem')
    ts = li.schema['l_shipdate'].dataType
    return (
        li.filter(
            (F.col('l_shipdate') >= F.lit('1996-01-01 00:00:00').cast(ts))
            & (F.col('l_shipdate') < F.lit('1997-01-01 00:00:00').cast(ts))
            & (F.col('l_discount') >= 0.05)
            & (F.col('l_discount') <= 0.07)
            & (F.col('l_quantity') < 24)
        )
        .agg(
            dsum(F.col('l_extendedprice') * F.col('l_discount')).alias('revenue'),
            F.count(F.lit(1)).alias('n_items'),
        )
    )


# ---------------------------------------------------------------------------
# 3-way join + grouped agg + top-k (TPC-H Q3 shape).
# Scale: customer filtered before the join; orders/lineitem join on their
# natural keys (AQE picks shuffle strategy); top-10 via global sort of an
# already-aggregated (small) result.
# ---------------------------------------------------------------------------


@register(
    'q3_shipping_priority',
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1997-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    headline=True,
)
def q3_shipping_priority(spark, sf_dir):
    cust = table(spark, sf_dir, 'customer').filter(F.col('c_mktsegment') == 'BUILDING')
    orders = table(spark, sf_dir, 'orders')
    li = table(spark, sf_dir, 'lineitem')
    ots = orders.schema['o_orderdate'].dataType
    lts = li.schema['l_shipdate'].dataType
    # r11 optimization: at driver SFs the (column-pruned) estimates put
    # BOTH dimensionful sides under the broadcast threshold, so the whole
    # probe pipeline — orders scan, two hash-join probes, the partial
    # aggregate — fused into the single-task orders scan. spread_small
    # moves it core-wide locally (the date filter still pushes to the
    # scan below the repartition); no-op on production layouts, where the
    # fact-fact join shuffles on orderkey anyway (SCALE.md round-8 note).
    orders = spread_small(
        orders.filter(
            F.col('o_orderdate') < F.lit('1998-03-15 00:00:00').cast(ots)
        ),
        'o_orderkey',
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col('l_orderkey') == F.col('o_orderkey'))
        .filter(F.col('l_shipdate') > F.lit('1997-03-15 00:00:00').cast(lts))
        .groupBy('l_orderkey', 'o_orderdate')
        .agg(dsum(F.col('l_extendedprice') * (1 - F.col('l_discount'))).alias('revenue'))
        .select('l_orderkey', 'revenue', 'o_orderdate')
        .orderBy(F.desc('revenue'), F.asc('l_orderkey'))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# 6-way star join (TPC-H Q5 shape): broadcast the small dims.
# Scale: region+nation are tiny at every SF → explicit F.broadcast; the
# supplier/customer joins shuffle on their keys; nation-match predicate is a
# join condition, not a post-filter.
# ---------------------------------------------------------------------------


@register(
    'q5_local_supplier_volume',
    oracle=f"""
    SELECT n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    headline=True,
)
def q5_local_supplier_volume(spark, sf_dir):
    cust = table(spark, sf_dir, 'customer')
    orders = table(spark, sf_dir, 'orders')
    li = table(spark, sf_dir, 'lineitem')
    supp = table(spark, sf_dir, 'supplier')
    nation = table(spark, sf_dir, 'nation')
    region = table(spark, sf_dir, 'region').filter(F.col('r_name') == 'ASIA')
    ots = orders.schema['o_orderdate'].dataType
    # r11 optimization: same single-task probe-pipeline shape as q3 (all
    # five non-orders sides broadcast at driver SFs) — spread the filtered
    # probe side; no-op on production layouts.
    return (
        cust.join(
            spread_small(
                orders.filter(
                    (F.col('o_orderdate') >= F.lit('1996-01-01 00:00:00').cast(ots))
                    & (F.col('o_orderdate') < F.lit('1997-01-01 00:00:00').cast(ots))
                ),
                'o_orderkey',
            ),
            cust.c_custkey == orders.o_custkey,
        )
        .join(li, F.col('l_orderkey') == F.col('o_orderkey'))
        .join(
            supp,
            (F.col('l_suppkey') == F.col('s_suppkey'))
            & (F.col('c_nationkey') == F.col('s_nationkey')),
        )
        .join(F.broadcast(nation), F.col('s_nationkey') == F.col('n_nationkey'))
        .join(F.broadcast(region), F.col('n_regionkey') == F.col('r_regionkey'))
        .groupBy('n_name')
        .agg(dsum(F.col('l_extendedprice') * (1 - F.col('l_discount'))).alias('revenue'))
    )


# ---------------------------------------------------------------------------
# Semi / anti joins.
# Scale: semi/anti avoid materializing the probe side's payload; Catalyst
# rewrites to existence joins (no fan-out on duplicate keys).
# ---------------------------------------------------------------------------


@register(
    'join_semi',
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem WHERE l_quantity > 45
    )
    """,
)
def join_semi(spark, sf_dir):
    orders = table(spark, sf_dir, 'orders')
    li = table(spark, sf_dir, 'lineitem').filter(F.col('l_quantity') > 45)
    return orders.join(
        li, orders.o_orderkey == li.l_orderkey, 'left_semi'
    ).select('o_orderkey', 'o_totalprice')


@register(
    'join_anti',
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def join_anti(spark, sf_dir):
    cust = table(spark, sf_dir, 'customer')
    orders = table(spark, sf_dir, 'orders')
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, 'left_anti'
    ).select('c_custkey', 'c_name')


# ---------------------------------------------------------------------------
# Range (non-equi) join: price-band lookup.
# Scale: band table is tiny → broadcast nested-loop stays cheap; without the
# broadcast this would be a cartesian — the hint is the plan.
# ---------------------------------------------------------------------------


@register(
    'join_range_band',
    oracle="""
    WITH bands(band, lo, hi) AS (
        VALUES ('low', 0.0, 920.0), ('mid', 920.0, 1080.0), ('high', 1080.0, 1e9)
    )
    SELECT band, COUNT(*) AS n_parts, CAST(MIN(p_retailprice) AS DOUBLE) AS min_price,
           CAST(MAX(p_retailprice) AS DOUBLE) AS max_price
    FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band
    """,
)
def join_range_band(spark, sf_dir):
    part = table(spark, sf_dir, 'part')
    bands = spark.createDataFrame(
        [('low', 0.0, 920.0), ('mid', 920.0, 1080.0), ('high', 1080.0, 1e9)],
        ['band', 'lo', 'hi'],
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy('band')
        .agg(
            F.count(F.lit(1)).alias('n_parts'),
            F.min('p_retailprice').alias('min_price'),
            F.max('p_retailprice').alias('max_price'),
        )
    )


# ---------------------------------------------------------------------------
# Window functions: ranking (top-k per group) and running frames.
# Scale: partitioned windows shuffle once on the partition key; the rank
# filter happens before any further join, bounding output size.
# ---------------------------------------------------------------------------


@register(
    'window_topk_per_group',
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rk
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey
               ) AS rk
        FROM customer
    )
    WHERE rk <= 3
    """,
)
def window_topk_per_group(spark, sf_dir):
    cust = table(spark, sf_dir, 'customer')
    w = Window.partitionBy('c_mktsegment').orderBy(
        F.desc('c_acctbal'), F.asc('c_custkey')
    )
    return (
        cust.select(
            'c_mktsegment',
            'c_custkey',
            'c_acctbal',
            F.row_number().over(w).cast('long').alias('rk'),
        )
        .filter(F.col('rk') <= 3)
    )


@register(
    'window_running_total',
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def window_running_total(spark, sf_dir):
    orders = table(spark, sf_dir, 'orders')
    w = (
        Window.partitionBy('o_custkey')
        .orderBy('o_orderdate', 'o_orderkey')
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        'o_custkey',
        'o_orderkey',
        F.sum(F.col('o_totalprice').cast('decimal(28,6)')).over(w).cast('double').alias('running_spend'),
    )


@register(
    'window_lag_delta',
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_totalprice - LAG(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS delta_prev
    FROM orders
    """,
)
def window_lag_delta(spark, sf_dir):
    orders = table(spark, sf_dir, 'orders')
    w = Window.partitionBy('o_custkey').orderBy('o_orderdate', 'o_orderkey')
    return orders.select(
        'o_custkey',
        'o_orderkey',
        (F.col('o_totalprice') - F.lag('o_totalprice').over(w)).alias('delta_prev'),
    )


# ---------------------------------------------------------------------------
# Sort / top-k, distinct, set ops, grouping sets.
# ---------------------------------------------------------------------------


@register(
    'topk_orders',
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def topk_orders(spark, sf_dir):
    """Global top-k: Spark's TakeOrderedAndProject — no full sort at scale."""
    orders = table(spark, sf_dir, 'orders')
    return (
        orders.select('o_orderkey', 'o_totalprice')
        .orderBy(F.desc('o_totalprice'), F.asc('o_orderkey'))
        .limit(25)
    )


@register(
    'distinct_pairs',
    oracle='SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem',
)
def distinct_pairs(spark, sf_dir):
    li = table(spark, sf_dir, 'lineitem')
    return li.select('l_returnflag', 'l_linestatus').distinct()


@register(
    'rollup_order_priority',
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_priority(spark, sf_dir):
    orders = table(spark, sf_dir, 'orders')
    return orders.rollup('o_orderstatus', 'o_orderpriority').agg(
        F.count(F.lit(1)).alias('n_orders')
    )


@register(
    'cube_flag_status',
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_flag_status(spark, sf_dir):
    li = table(spark, sf_dir, 'lineitem')
    return li.cube('l_returnflag', 'l_linestatus').agg(
        F.count(F.lit(1)).alias('n_items')
    )


@register(
    'groupingsets_flag_status',
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def groupingsets_flag_status(spark, sf_dir):
    """Explicit GROUPING SETS (the general form rollup/cube specialize) —
    two one-column marginals plus the grand total, NOT the full cube.

    One scan, one shuffle: Spark expands the sets map-side, so each input
    row contributes to every set's partial aggregate without re-reading.
    """
    li = table(spark, sf_dir, 'lineitem')
    return li.groupingSets(
        [['l_returnflag'], ['l_linestatus'], []],
        'l_returnflag',
        'l_linestatus',
    ).agg(F.count(F.lit(1)).alias('n_items'))


@register(
    'setop_union_intersect',
    oracle="""
    WITH big_buyers AS (
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    ), building AS (
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    SELECT custkey, 'union' AS src FROM (SELECT DISTINCT custkey FROM (SELECT * FROM big_buyers UNION SELECT * FROM building))
    UNION ALL
    SELECT custkey, 'intersect' AS src FROM (SELECT custkey FROM big_buyers INTERSECT SELECT custkey FROM building)
    UNION ALL
    SELECT custkey, 'except' AS src FROM (SELECT custkey FROM building EXCEPT SELECT custkey FROM big_buyers)
    """,
)
def setop_union_intersect(spark, sf_dir):
    orders = table(spark, sf_dir, 'orders')
    cust = table(spark, sf_dir, 'customer')
    big = orders.filter(F.col('o_totalprice') > 300000).select(
        F.col('o_custkey').alias('custkey')
    )
    building = cust.filter(F.col('c_mktsegment') == 'BUILDING').select(
        F.col('c_custkey').alias('custkey')
    )
    u = big.union(building).distinct().withColumn('src', F.lit('union'))
    i = big.intersect(building).withColumn('src', F.lit('intersect'))
    e = building.exceptAll(big.distinct()).distinct().withColumn('src', F.lit('except'))
    return u.unionByName(i).unionByName(e)


# ---------------------------------------------------------------------------
# Scalar function coverage: string/date/math/conditional expressions, all
# JVM-side (whole-stage codegen; no Python UDFs).
# ---------------------------------------------------------------------------


@register(
    'scalar_functions',
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           LENGTH(p_name) AS name_len,
           SUBSTR(p_type, 1, 5) AS type_prefix,
           CONCAT(p_brand, ':', CAST(p_size AS VARCHAR)) AS brand_size,
           ROUND(p_retailprice * 1.1, 2) AS marked_up,
           CAST(FLOOR(p_retailprice / 100) AS BIGINT) AS price_bucket,
           ABS(p_size - 25) AS size_dev,
           CASE WHEN p_size > 25 THEN 'large' ELSE 'small' END AS size_class,
           p_name LIKE '%green%' AS is_green
    FROM part
    """,
)
def scalar_functions(spark, sf_dir):
    part = table(spark, sf_dir, 'part')
    return part.select(
        'p_partkey',
        F.upper('p_brand').alias('brand_upper'),
        F.length('p_name').cast('long').alias('name_len'),
        F.substring('p_type', 1, 5).alias('type_prefix'),
        F.concat(F.col('p_brand'), F.lit(':'), F.col('p_size').cast('string')).alias('brand_size'),
        F.round(F.col('p_retailprice') * 1.1, 2).alias('marked_up'),
        F.floor(F.col('p_retailprice') / 100).cast('long').alias('price_bucket'),
        F.abs(F.col('p_size') - 25).alias('size_dev'),
        F.when(F.col('p_size') > 25, 'large').otherwise('small').alias('size_class'),
        F.col('p_name').like('%green%').alias('is_green'),
    )


@register(
    'date_functions',
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(DATE_DIFF('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT) AS days_to_2002
    FROM orders
    """,
)
def date_functions(spark, sf_dir):
    orders = table(spark, sf_dir, 'orders')
    ots = orders.schema['o_orderdate'].dataType
    return orders.select(
        'o_orderkey',
        F.year('o_orderdate').alias('order_year'),
        F.month('o_orderdate').alias('order_month'),
        F.date_trunc('month', 'o_orderdate').cast(ots).alias('month_start'),
        F.datediff(
            F.lit('2002-01-01').cast('date'), F.col('o_orderdate').cast('date')
        ).alias('days_to_2002'),
    )
