"""Third relational batch: the TPC-H join/aggregation shapes not yet covered
(nation-pair joins, market-share ratios, outer-join histograms, HAVING-subquery
joins, disjunctive predicate pushdown, multi-EXISTS rewrites, argmax), plus
analytic window functions (ntile/percent_rank/cume_dist/dense_rank,
first/last/nth value frames), UNPIVOT, and exact-moment statistics.

The reference models none of these (its algebra is map/reduce/groupby over a
task DAG — `/root/reference/src/cyclebane/graph.py`); they complete the
relational surface a 100 TB engine needs. Scale notes per query.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ..tables import spread_small, table
from . import register
from ._helpers import DEC, davg, dsum, sql_davg, sql_dsum

# ---------------------------------------------------------------------------
# TPC-H Q7 shape: volume shipping between a nation pair.
# Scale: both nation dims broadcast; the pair predicate lives in the join
# conditions so Catalyst prunes non-matching suppliers/customers before the
# big lineitem-orders shuffle.
# ---------------------------------------------------------------------------


@register(
    'q7_volume_shipping',
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {sql_dsum('volume')} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(YEAR(l_shipdate) AS INT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
               OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    li = table(spark, sf_dir, 'lineitem')
    orders = table(spark, sf_dir, 'orders')
    cust = table(spark, sf_dir, 'customer')
    supp = table(spark, sf_dir, 'supplier')
    nation = table(spark, sf_dir, 'nation')
    lts = li.schema['l_shipdate'].dataType
    n1 = nation.select(
        F.col('n_nationkey').alias('n1_key'), F.col('n_name').alias('supp_nation')
    ).filter(F.col('supp_nation').isin('NATION_18', 'NATION_19'))
    n2 = nation.select(
        F.col('n_nationkey').alias('n2_key'), F.col('n_name').alias('cust_nation')
    ).filter(F.col('cust_nation').isin('NATION_18', 'NATION_19'))
    return (
        supp.join(F.broadcast(n1), F.col('s_nationkey') == F.col('n1_key'))
        .join(
            li.filter(
                (F.col('l_shipdate') >= F.lit('1996-01-01 00:00:00').cast(lts))
                & (F.col('l_shipdate') < F.lit('1998-01-01 00:00:00').cast(lts))
            ),
            F.col('s_suppkey') == F.col('l_suppkey'),
        )
        .join(orders, F.col('o_orderkey') == F.col('l_orderkey'))
        .join(cust, F.col('c_custkey') == F.col('o_custkey'))
        .join(F.broadcast(n2), F.col('c_nationkey') == F.col('n2_key'))
        .filter(F.col('supp_nation') != F.col('cust_nation'))
        .groupBy(
            'supp_nation',
            'cust_nation',
            F.year('l_shipdate').alias('l_year'),
        )
        .agg(
            dsum(F.col('l_extendedprice') * (1 - F.col('l_discount'))).alias('revenue')
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: market share of one supplier-nation within a region.
# Scale: ratio of two decimal-exact conditional sums per year; region/nation
# broadcast; one aggregation shuffle on the year.
# ---------------------------------------------------------------------------


@register(
    'q8_market_share',
    oracle=f"""
    SELECT o_year,
           {sql_dsum("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END")}
               / {sql_dsum('volume')} AS mkt_share
    FROM (
        SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    part = table(spark, sf_dir, 'part').filter(F.col('p_type') == 'ECONOMY')
    li = table(spark, sf_dir, 'lineitem')
    orders = table(spark, sf_dir, 'orders')
    cust = table(spark, sf_dir, 'customer')
    supp = table(spark, sf_dir, 'supplier')
    nation = table(spark, sf_dir, 'nation')
    region = table(spark, sf_dir, 'region').filter(F.col('r_name') == 'AMERICA')
    n1 = nation.select(
        F.col('n_nationkey').alias('n1_key'), F.col('n_regionkey').alias('n1_region')
    )
    n2 = nation.select(
        F.col('n_nationkey').alias('n2_key'), F.col('n_name').alias('nation')
    )
    volume = F.col('l_extendedprice') * (1 - F.col('l_discount'))
    return (
        li.join(part, F.col('p_partkey') == F.col('l_partkey'))
        .join(orders, F.col('l_orderkey') == F.col('o_orderkey'))
        .join(cust, F.col('o_custkey') == F.col('c_custkey'))
        .join(F.broadcast(n1), F.col('c_nationkey') == F.col('n1_key'))
        .join(F.broadcast(region), F.col('n1_region') == F.col('r_regionkey'))
        .join(supp, F.col('l_suppkey') == F.col('s_suppkey'))
        .join(F.broadcast(n2), F.col('s_nationkey') == F.col('n2_key'))
        .groupBy(F.year('o_orderdate').alias('o_year'))
        .agg(
            (
                dsum(F.when(F.col('nation') == 'NATION_3', volume).otherwise(0.0))
                / dsum(volume)
            ).alias('mkt_share')
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: customer order-count distribution via LEFT OUTER join.
# Scale: the outer join shuffles once on custkey; both aggregations are
# hash aggs with map-side partials; the histogram output is tiny.
# ---------------------------------------------------------------------------


@register(
    'q13_customer_distribution',
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf_dir):
    cust = table(spark, sf_dir, 'customer')
    orders = table(spark, sf_dir, 'orders').filter(
        F.col('o_orderpriority') != '1-URGENT'
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, 'left_outer')
        .groupBy('c_custkey')
        .agg(F.count('o_orderkey').alias('c_count'))
        .groupBy('c_count')
        .agg(F.count(F.lit(1)).alias('custdist'))
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue.
# Scale: revenue is aggregated first (one shuffle); the scalar max is a
# one-row broadcast joined back — no global sort, ties kept (exact decimal
# revenue makes the equality safe).
# ---------------------------------------------------------------------------


@register(
    'q15_top_supplier',
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """The revenue aggregate appears in two plan subtrees (join side + max
    side) and DataFrames don't share subplans — at 100 TB you persist() the
    aggregate (sized #suppliers, trivially cacheable) so lineitem is scanned
    once; a global-window max would instead funnel #suppliers rows through
    one partition."""
    li = table(spark, sf_dir, 'lineitem')
    supp = table(spark, sf_dir, 'supplier')
    lts = li.schema['l_shipdate'].dataType
    revenue = (
        li.filter(
            (F.col('l_shipdate') >= F.lit('1996-01-01 00:00:00').cast(lts))
            & (F.col('l_shipdate') < F.lit('1996-04-01 00:00:00').cast(lts))
        )
        .groupBy(F.col('l_suppkey').alias('supplier_no'))
        .agg(
            dsum(F.col('l_extendedprice') * (1 - F.col('l_discount'))).alias(
                'total_revenue'
            )
        )
    )
    max_rev = revenue.agg(F.max('total_revenue').alias('max_revenue'))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col('total_revenue') == F.col('max_revenue'))
        .join(supp, F.col('s_suppkey') == F.col('supplier_no'))
        .select('s_suppkey', 's_name', 'total_revenue')
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders via HAVING subquery join.
# Scale: the HAVING aggregate runs first and is highly selective, so the
# orders/customer joins see only qualifying keys (semi-join pushdown shape).
# ---------------------------------------------------------------------------


@register(
    'q18_large_volume_customer',
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM (
        SELECT l_orderkey, {sql_dsum('l_quantity')} AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) > 200
    ) big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q18_large_volume_customer(spark, sf_dir):
    # r11 optimization: spread on the aggregate key — the spread exchange
    # doubles as the groupBy l_orderkey exchange locally (see q20), no-op
    # on multi-split layouts.
    li = spread_small(table(spark, sf_dir, 'lineitem'), 'l_orderkey')
    orders = table(spark, sf_dir, 'orders')
    cust = table(spark, sf_dir, 'customer')
    big = (
        li.groupBy('l_orderkey')
        .agg(dsum('l_quantity').alias('sum_qty'))
        .filter(F.col('sum_qty') > 200)
    )
    return (
        big.join(orders, F.col('o_orderkey') == F.col('l_orderkey'))
        .join(cust, F.col('c_custkey') == F.col('o_custkey'))
        .select(
            'c_custkey', 'c_name', 'o_orderkey', 'o_orderdate', 'o_totalprice', 'sum_qty'
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive multi-attribute predicates (OR of conjunctions).
# Scale: the part-side brand/size disjunction prunes before the join; the
# residual quantity conditions evaluate post-join in codegen. Catalyst pushes
# the common `p_size >= 1` / brand-set conjuncts into the parquet scan.
# ---------------------------------------------------------------------------


@register(
    'q19_disjunctive_predicates',
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_predicates(spark, sf_dir):
    li = table(spark, sf_dir, 'lineitem')
    part = table(spark, sf_dir, 'part')
    qty = F.col('l_quantity')
    cond = (
        (
            (F.col('p_brand') == 'Brand#12')
            & F.col('p_size').between(1, 5)
            & (qty >= 1)
            & (qty <= 11)
        )
        | (
            (F.col('p_brand') == 'Brand#23')
            & F.col('p_size').between(1, 10)
            & (qty >= 10)
            & (qty <= 20)
        )
        | (
            (F.col('p_brand') == 'Brand#14')
            & F.col('p_size').between(1, 15)
            & (qty >= 20)
            & (qty <= 30)
        )
    )
    return (
        li.join(part, F.col('p_partkey') == F.col('l_partkey'))
        .filter(cond)
        .agg(
            dsum(F.col('l_extendedprice') * (1 - F.col('l_discount'))).alias('revenue'),
            F.count(F.lit(1)).alias('n_items'),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape (adapted to this schema): per order with >1 distinct
# supplier, find suppliers that are the ONLY one with returned items.
# Scale: the classic double-correlated EXISTS/NOT EXISTS is rewritten as one
# per-order aggregate + one join — two shuffles total instead of two
# self-join fan-outs over the fact table.
# ---------------------------------------------------------------------------


@register(
    'q21_sole_returning_supplier',
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_ret
        FROM lineitem GROUP BY l_orderkey
    ), sole AS (
        SELECT DISTINCT l.l_suppkey, l.l_orderkey
        FROM lineitem l JOIN per_order p ON l.l_orderkey = p.l_orderkey
        WHERE l.l_returnflag = 'R' AND p.n_supp > 1 AND p.n_ret = 1
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM sole JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    """,
)
def q21_sole_returning_supplier(spark, sf_dir):
    """per_order could come from a window over the returned-items side, but
    n_supp must count ALL suppliers (not just returners), so the aggregate
    genuinely needs the unfiltered fact table: two scans is the honest
    minimum without persist(). Still two shuffles vs the reference SQL's two
    correlated-EXISTS self-joins.

    r11 optimization: both branches (the per-order distinct-count aggregate
    and the returned-items probe) key on l_orderkey, so one spread_small on
    that key clusters BOTH for free — the groupBy and the join run with no
    further exchange on those branches (the plan carries the two spread
    exchanges as canonical duplicates; exchange reuse dedups them at
    runtime). Core-wide on the few-file driver layout, no-op on
    multi-split production inputs. Measured 2.13s->1.96s / 1.48s->1.21s
    across two interleaved A/B rounds at sf0.1."""
    li = spread_small(table(spark, sf_dir, 'lineitem'), 'l_orderkey')
    supp = table(spark, sf_dir, 'supplier')
    per_order = li.groupBy('l_orderkey').agg(
        F.count_distinct('l_suppkey').alias('n_supp'),
        F.count_distinct(
            F.when(F.col('l_returnflag') == 'R', F.col('l_suppkey'))
        ).alias('n_ret'),
    )
    sole = (
        li.filter(F.col('l_returnflag') == 'R')
        .select('l_suppkey', 'l_orderkey')
        .join(
            per_order.filter((F.col('n_supp') > 1) & (F.col('n_ret') == 1)),
            'l_orderkey',
        )
        .select('l_suppkey', 'l_orderkey')
        .distinct()
    )
    return (
        sole.join(supp, F.col('s_suppkey') == F.col('l_suppkey'))
        .groupBy('s_name')
        .agg(F.count(F.lit(1)).alias('numwait'))
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape (adapted): rich-but-idle customers — above-average balance,
# never ordered. Scalar subquery broadcast + anti join.
# ---------------------------------------------------------------------------


@register(
    'q22_idle_rich_customers',
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_cust,
           {sql_dsum('c_acctbal')} AS total_bal
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) / COUNT(c_acctbal)
        FROM customer WHERE c_acctbal > 0
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01'
    )
    GROUP BY c_mktsegment
    """,
)
def q22_idle_rich_customers(spark, sf_dir):
    cust = table(spark, sf_dir, 'customer')
    orders = table(spark, sf_dir, 'orders')
    ots = orders.schema['o_orderdate'].dataType
    orders = orders.filter(
        F.col('o_orderdate') >= F.lit('1999-01-01 00:00:00').cast(ots)
    )
    cutoff = cust.filter(F.col('c_acctbal') > 0).agg(
        (
            F.sum(F.col('c_acctbal').cast('decimal(28,6)')).cast('double')
            / F.count('c_acctbal')
        ).alias('cut')
    )
    return (
        cust.join(F.broadcast(cutoff))
        .filter(F.col('c_acctbal') > F.col('cut'))
        .join(orders, cust.c_custkey == orders.o_custkey, 'left_anti')
        .groupBy('c_mktsegment')
        .agg(
            F.count(F.lit(1)).alias('n_cust'),
            dsum('c_acctbal').alias('total_bal'),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q9 shape (adapted: retailprice stands in for supplycost): profit by
# supplier nation x order year over a part-name pattern.
# Scale: the LIKE filter prunes part before the join; nation broadcasts;
# one aggregation shuffle on (nation, year).
# ---------------------------------------------------------------------------


@register(
    'q9_product_type_profit',
    oracle=f"""
    SELECT nation, o_year, {sql_dsum('amount')} AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(YEAR(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount)
                   - p_retailprice * l_quantity * 0.01 AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON o_orderkey = l_orderkey
        WHERE p_name LIKE '%blue%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_type_profit(spark, sf_dir):
    part = table(spark, sf_dir, 'part').filter(F.col('p_name').like('%blue%'))
    li = table(spark, sf_dir, 'lineitem')
    supp = table(spark, sf_dir, 'supplier')
    nation = table(spark, sf_dir, 'nation')
    orders = table(spark, sf_dir, 'orders')
    amount = F.col('l_extendedprice') * (1 - F.col('l_discount')) - F.col(
        'p_retailprice'
    ) * F.col('l_quantity') * 0.01
    return (
        li.join(part, F.col('p_partkey') == F.col('l_partkey'))
        .join(supp, F.col('s_suppkey') == F.col('l_suppkey'))
        .join(F.broadcast(nation), F.col('s_nationkey') == F.col('n_nationkey'))
        .join(orders, F.col('o_orderkey') == F.col('l_orderkey'))
        .groupBy(
            F.col('n_name').alias('nation'), F.year('o_orderdate').alias('o_year')
        )
        .agg(dsum(amount).alias('sum_profit'))
    )


# ---------------------------------------------------------------------------
# TPC-H Q20 shape (adapted): suppliers carrying the a dominant share (>12.5%) of a
# part's shipped volume. Correlated share-of-total as two aggregates + join;
# the 0.125 multiplier is a power of two, so the threshold compare is exact.
# ---------------------------------------------------------------------------


@register(
    'q20_dominant_part_suppliers',
    oracle=f"""
    WITH ps AS (
        SELECT l_partkey, l_suppkey, {sql_dsum('l_quantity')} AS qty
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ), pt AS (
        SELECT l_partkey, {sql_dsum('l_quantity')} AS total
        FROM lineitem GROUP BY l_partkey
    )
    SELECT s_name, COUNT(*) AS n_dominant_parts
    FROM ps
    JOIN pt USING (l_partkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE qty > 0.125 * total
    GROUP BY s_name
    """,
)
def q20_dominant_part_suppliers(spark, sf_dir):
    # r11 optimization: spread on the aggregate's own keys, so on the
    # few-file driver layout the spread exchange IS the groupBy exchange
    # (hash partitioning by (l_partkey, l_suppkey) satisfies the aggregate's
    # required clustering) and the decimal partials run core-wide; no-op on
    # multi-split layouts, where partial aggregation before the exchange is
    # the cheaper shape.
    li = spread_small(
        table(spark, sf_dir, 'lineitem'), 'l_partkey', 'l_suppkey'
    )
    supp = table(spark, sf_dir, 'supplier')
    # ONE lineitem scan (the oracle's two-CTE formulation would scan twice):
    # aggregate per (part, supplier) keeping the DECIMAL accumulator, then a
    # window sum over the part gives the part total — decimal addition is
    # associative, so sum-of-group-sums == the oracle's direct sum exactly,
    # and both sides compare in double with identical operands.
    ps = li.groupBy('l_partkey', 'l_suppkey').agg(
        F.sum(F.col('l_quantity').cast('decimal(28,6)')).alias('qty_dec')
    )
    w = Window.partitionBy('l_partkey')
    return (
        ps.withColumn('total_dec', F.sum('qty_dec').over(w))
        .filter(
            F.col('qty_dec').cast('double')
            > 0.125 * F.col('total_dec').cast('double')
        )
        .join(supp, F.col('s_suppkey') == F.col('l_suppkey'))
        .groupBy('s_name')
        .agg(F.count(F.lit(1)).alias('n_dominant_parts'))
    )


# ---------------------------------------------------------------------------
# Explicit NULL ordering in window sorts. Spark defaults to NULLS FIRST for
# ASC / NULLS LAST for DESC; other engines differ — the explicit modifier is
# the only portable spelling, and this query pins the parity.
# ---------------------------------------------------------------------------


@register(
    'window_nulls_ordering',
    oracle="""
    SELECT o_orderkey, o_custkey, delta_prev,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY delta_prev DESC NULLS LAST, o_orderkey
           ) AS BIGINT) AS rk_nulls_last,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY delta_prev ASC NULLS FIRST, o_orderkey
           ) AS BIGINT) AS rk_nulls_first
    FROM (
        SELECT o_orderkey, o_custkey,
               o_totalprice - LAG(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS delta_prev
        FROM orders
    ) d
    """,
)
def window_nulls_ordering(spark, sf_dir):
    orders = table(spark, sf_dir, 'orders')
    wl = Window.partitionBy('o_custkey').orderBy('o_orderdate', 'o_orderkey')
    d = orders.select(
        'o_orderkey',
        'o_custkey',
        (F.col('o_totalprice') - F.lag('o_totalprice').over(wl)).alias('delta_prev'),
    )
    w_last = Window.partitionBy('o_custkey').orderBy(
        F.col('delta_prev').desc_nulls_last(), F.col('o_orderkey').asc()
    )
    w_first = Window.partitionBy('o_custkey').orderBy(
        F.col('delta_prev').asc_nulls_first(), F.col('o_orderkey').asc()
    )
    return d.select(
        'o_orderkey',
        'o_custkey',
        'delta_prev',
        F.row_number().over(w_last).cast('long').alias('rk_nulls_last'),
        F.row_number().over(w_first).cast('long').alias('rk_nulls_first'),
    )


# ---------------------------------------------------------------------------
# Analytic window functions: ntile / percent_rank / cume_dist / dense_rank.
# Scale: one shuffle on the partition key; all four functions share a single
# sort (identical window spec), so Spark evaluates them in one pass.
# ---------------------------------------------------------------------------


@register(
    'window_analytics_suite',
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cum_dist,
           CAST(dense_rank() OVER w AS BIGINT) AS dense_rk
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_analytics_suite(spark, sf_dir):
    orders = table(spark, sf_dir, 'orders')
    w = Window.partitionBy('o_orderstatus').orderBy('o_totalprice', 'o_orderkey')
    return orders.select(
        'o_orderkey',
        'o_orderstatus',
        F.ntile(4).over(w).cast('long').alias('quartile'),
        F.percent_rank().over(w).alias('pct_rank'),
        F.cume_dist().over(w).alias('cum_dist'),
        F.dense_rank().over(w).cast('long').alias('dense_rk'),
    )


@register(
    'window_first_last_nth',
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_price,
           nth_value(o_totalprice, 2) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last_nth(spark, sf_dir):
    """first/last/nth value with explicit frames.

    last_value/nth_value need the full-partition frame (the default frame
    stops at CURRENT ROW — identical trap in Spark and every SQL engine).
    """
    orders = table(spark, sf_dir, 'orders')
    w = Window.partitionBy('o_custkey').orderBy('o_orderdate', 'o_orderkey')
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        'o_orderkey',
        'o_custkey',
        F.first('o_totalprice').over(w).alias('first_price'),
        F.last('o_totalprice').over(wfull).alias('last_price'),
        F.nth_value('o_totalprice', 2).over(wfull).alias('second_price'),
    )


# ---------------------------------------------------------------------------
# UNPIVOT (wide -> long melt). Scale: pure projection with 4x row fan-out —
# no shuffle at all; the long form is the ingest shape for the plan layer's
# dimension-indexed values.
# ---------------------------------------------------------------------------


@register(
    'unpivot_lineitem_measures',
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
)
def unpivot_lineitem_measures(spark, sf_dir):
    li = table(spark, sf_dir, 'lineitem')
    return li.unpivot(
        ['l_orderkey', 'l_linenumber'],
        ['l_quantity', 'l_extendedprice', 'l_discount', 'l_tax'],
        'measure',
        'val',
    )


# ---------------------------------------------------------------------------
# Argmax per group without a window: max over a (key, tiebreak) struct.
# Scale: an ordinary hash aggregate — one shuffle, map-side partials — vs the
# window formulation's full sort. The struct comparison is lexicographic in
# both engines, and the custkey tiebreaker makes ties deterministic.
# ---------------------------------------------------------------------------


@register(
    'argmax_per_group',
    oracle="""
    SELECT c_mktsegment,
           (max({'b': c_acctbal, 'k': c_custkey})).b AS top_acctbal,
           (max({'b': c_acctbal, 'k': c_custkey})).k AS top_custkey,
           (min({'b': c_acctbal, 'k': c_custkey})).k AS bottom_custkey
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def argmax_per_group(spark, sf_dir):
    cust = table(spark, sf_dir, 'customer')
    pair = F.struct(F.col('c_acctbal').alias('b'), F.col('c_custkey').alias('k'))
    return cust.groupBy('c_mktsegment').agg(
        F.max(pair).getField('b').alias('top_acctbal'),
        F.max(pair).getField('k').alias('top_custkey'),
        F.min(pair).getField('k').alias('bottom_custkey'),
    )


# ---------------------------------------------------------------------------
# Full-row argmin per group (TPC-H Q2 shape on this schema): the cheapest
# observed (price, supplier) per part, as ONE hash aggregate over a struct —
# no window sort, no aggregate-join-back diamond. The struct's field order
# (price, then unique tiebreakers) IS the comparison order.
# ---------------------------------------------------------------------------


@register(
    'argmin_cheapest_supplier',
    oracle="""
    SELECT l_partkey,
           (m).p AS best_price,
           (m).s AS best_suppkey,
           (m).o AS best_orderkey
    FROM (
        SELECT l_partkey,
               min({'p': l_extendedprice / l_quantity,
                    's': l_suppkey, 'o': l_orderkey}) AS m
        FROM lineitem
        GROUP BY l_partkey
    ) best
    """,
)
def argmin_cheapest_supplier(spark, sf_dir):
    li = table(spark, sf_dir, 'lineitem')
    unit_price = F.col('l_extendedprice') / F.col('l_quantity')
    m = F.min(
        F.struct(
            unit_price.alias('p'),
            F.col('l_suppkey').alias('s'),
            F.col('l_orderkey').alias('o'),
        )
    )
    return li.groupBy('l_partkey').agg(
        m.getField('p').alias('best_price'),
        m.getField('s').alias('best_suppkey'),
        m.getField('o').alias('best_orderkey'),
    )


# ---------------------------------------------------------------------------
# RANGE window frame: trailing 7-day spend per customer. ROWS frames count
# rows; RANGE frames bound by the ORDER-BY VALUE — peers at the same instant
# aggregate together and gaps matter. Spark's rangeBetween needs a numeric
# sort key, so the frame runs over epoch seconds (integer, timezone-free).
# ---------------------------------------------------------------------------


@register(
    'window_range_frame_trailing',
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
               RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_7d_spend
    FROM orders
    """,
)
def window_range_frame_trailing(spark, sf_dir):
    orders = table(spark, sf_dir, 'orders')
    epoch = F.unix_timestamp(
        F.col('o_orderdate').cast('timestamp')
    ).alias('epoch_s')
    w = (
        Window.partitionBy('o_custkey')
        .orderBy('epoch_s')
        .rangeBetween(-7 * 86400, 0)
    )
    return (
        orders.select('o_custkey', 'o_orderkey', 'o_totalprice', epoch)
        .select(
            'o_custkey',
            'o_orderkey',
            F.sum(F.col('o_totalprice').cast('decimal(28,6)'))
            .over(w)
            .cast('double')
            .alias('trailing_7d_spend'),
        )
    )


# ---------------------------------------------------------------------------
# Statistical aggregates from exact moments: stddev and correlation derived
# from decimal-exact sums with an identical IEEE op sequence on both engines
# (native STDDEV/CORR differ across engines in summation order — the exact-
# moment formulation is both deterministic AND the one-pass 100 TB shape).
# ---------------------------------------------------------------------------


@register(
    'stats_exact_moments',
    oracle="""
    SELECT l_returnflag,
           n,
           sx / n AS mean_qty,
           sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
           (sxy - sx * sy / n)
               / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) AS corr_qty_price
    FROM (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(qi) AS DOUBLE) AS sx,
               CAST(SUM(CAST(qi * qi AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(pc AS DECIMAL(38,0))) AS DOUBLE) / 100.0 AS sy,
               CAST(SUM(CAST(pc * pc AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS syy,
               CAST(SUM(CAST(qi * pc AS DECIMAL(38,0))) AS DOUBLE) / 100.0 AS sxy
        FROM (
            SELECT l_returnflag,
                   CAST(round(l_quantity, 0) AS BIGINT) AS qi,
                   CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS pc
            FROM lineitem
        )
        GROUP BY l_returnflag
    ) m
    """,
)
def stats_exact_moments(spark, sf_dir):
    # r11 optimization: the decimal(38,0) moment partials ran inside the
    # single scan task (same shape as q1); spread_small restores core-wide
    # partials, no-op on multi-split layouts.
    li = spread_small(table(spark, sf_dir, 'lineitem'), 'l_orderkey')

    # Cross-engine exactness: quantities are whole numbers and prices have
    # exactly 2 decimals, so scale both to BIGINT first (round-to-integer is
    # unambiguous — the double is within ~2e-9 of the true integer). Every
    # moment is then an exact integer sum; the only floating-point steps are
    # the final casts/divides, identical operand-for-operand in both engines.
    # A double->DECIMAL cast would NOT be safe here: Spark quantizes via the
    # shortest decimal string (BigDecimal.valueOf) while DuckDB uses the
    # exact binary value, and products of ~1e10 magnitude land close enough
    # to scale-4 ties that the two disagree by an ulp.
    qi = F.round(F.col('l_quantity'), 0).cast('long')
    pc = F.round(F.col('l_extendedprice') * 100, 0).cast('long')

    def isum(c):
        c = F.col(c) if isinstance(c, str) else c
        return F.sum(c.cast('decimal(38,0)')).cast('double')

    m = li.select('l_returnflag', qi.alias('qi'), pc.alias('pc')).groupBy(
        'l_returnflag'
    ).agg(
        F.count(F.lit(1)).cast('double').alias('n'),
        F.sum('qi').cast('double').alias('sx'),
        isum(F.col('qi') * F.col('qi')).alias('sxx'),
        (isum('pc') / 100.0).alias('sy'),
        (isum(F.col('pc') * F.col('pc')) / 10000.0).alias('syy'),
        (isum(F.col('qi') * F.col('pc')) / 100.0).alias('sxy'),
    )
    n, sx, sxx, sy, syy, sxy = (
        F.col('n'), F.col('sx'), F.col('sxx'), F.col('sy'), F.col('syy'), F.col('sxy')
    )
    return m.select(
        'l_returnflag',
        'n',
        (sx / n).alias('mean_qty'),
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias('stddev_qty'),
        (
            (sxy - sx * sy / n)
            / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n))
        ).alias('corr_qty_price'),
    )


# ---------------------------------------------------------------------------
# TPC-H Q2 shape: minimum-cost supplier. The testdata star schema has no
# partsupp table, so the (part, supplier) unit cost is derived from lineitem
# (min observed l_extendedprice / l_quantity per pair) — the correlated-MIN
# subquery shape is identical. Scale: the region/nation dims broadcast into
# the supplier filter, the per-pair and per-part MINs are partial-aggregable
# hash aggs on the join keys, and the equality join back to the per-part MIN
# reuses the same key partitioning (no extra shuffle under AQE exchange
# reuse). The unit cost is a single IEEE divide of identical operands in
# both engines, so MIN and the equality compare are exact cross-engine.
# ---------------------------------------------------------------------------


@register(
    'q2_min_cost_supplier',
    oracle="""
    WITH eu_supp AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    cand AS (
        SELECT p_partkey, p_type FROM part
        WHERE p_size <= 15 AND p_type = 'LARGE'
    ),
    cost AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem
        JOIN eu_supp ON l_suppkey = s_suppkey
        JOIN cand ON l_partkey = p_partkey
        GROUP BY l_partkey, l_suppkey
    ),
    best AS (
        SELECT l_partkey, MIN(unit_cost) AS min_cost
        FROM cost GROUP BY l_partkey
    )
    SELECT s.s_acctbal, s.s_name, s.n_name,
           c.l_partkey AS p_partkey, cand.p_type, c.unit_cost
    FROM cost c
    JOIN best b ON c.l_partkey = b.l_partkey AND c.unit_cost = b.min_cost
    JOIN eu_supp s ON c.l_suppkey = s.s_suppkey
    JOIN cand ON c.l_partkey = cand.p_partkey
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: for each qualifying part, the EUROPE suppliers
    offering the minimum unit cost (correlated MIN decorrelated to an
    aggregate + equality join-back)."""
    li = table(spark, sf_dir, 'lineitem')
    supp = table(spark, sf_dir, 'supplier')
    nation = table(spark, sf_dir, 'nation')
    region = table(spark, sf_dir, 'region')
    part = table(spark, sf_dir, 'part')

    eu_supp = (
        supp.join(
            F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
        )
        .join(
            F.broadcast(region.filter(F.col('r_name') == 'EUROPE')),
            F.col('n_regionkey') == F.col('r_regionkey'),
        )
        .select('s_suppkey', 's_name', 's_acctbal', 'n_name')
    )
    cand = part.filter(
        (F.col('p_size') <= 15) & (F.col('p_type') == 'LARGE')
    ).select('p_partkey', 'p_type')
    cost = (
        li.join(F.broadcast(eu_supp.select('s_suppkey')), li.l_suppkey == F.col('s_suppkey'))
        .join(F.broadcast(cand.select('p_partkey')), li.l_partkey == F.col('p_partkey'))
        .groupBy('l_partkey', 'l_suppkey')
        .agg(F.min(F.col('l_extendedprice') / F.col('l_quantity')).alias('unit_cost'))
        .alias('cost')
    )
    best = (
        cost.groupBy('l_partkey')
        .agg(F.min('unit_cost').alias('min_cost'))
        .select(F.col('l_partkey').alias('b_partkey'), 'min_cost')
    )
    return (
        cost.join(
            best,
            (F.col('cost.l_partkey') == F.col('b_partkey'))
            & (F.col('cost.unit_cost') == F.col('min_cost')),
        )
        .join(F.broadcast(eu_supp), F.col('cost.l_suppkey') == F.col('s_suppkey'))
        .join(F.broadcast(cand), F.col('cost.l_partkey') == F.col('p_partkey'))
        .select(
            's_acctbal',
            's_name',
            'n_name',
            F.col('cost.l_partkey').alias('p_partkey'),
            'p_type',
            'unit_cost',
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q11 shape: parts whose value concentration inside one nation exceeds
# a fraction of the nation's total (GROUP BY ... HAVING > scalar subquery).
# No partsupp table -> value is the nation's lineitem revenue per part.
# Exactness: revenue has exactly 4 decimals (2-decimal price x 2-decimal
# discount), so everything is summed as integer ten-thousandths in
# DECIMAL(38,0) — the group values, the grand total, and the threshold
# compare are all exact; the only doubles are final identical-operand
# divides. Scale: one shuffle for the per-part agg; the grand total reuses
# the SAME aggregated rows (not a second corpus scan) and broadcasts back.
# ---------------------------------------------------------------------------


@register(
    'q11_important_parts',
    oracle="""
    WITH nat_li AS (
        SELECT l_partkey,
               CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                    AS BIGINT) AS v4
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
    ),
    per_part AS (
        SELECT l_partkey AS p_partkey,
               CAST(SUM(CAST(v4 AS DECIMAL(38,0))) AS BIGINT) AS v4_sum
        FROM nat_li GROUP BY l_partkey
    ),
    tot AS (
        SELECT CAST(SUM(CAST(v4_sum AS DECIMAL(38,0))) AS BIGINT) AS v4_tot,
               COUNT(*) AS n_parts
        FROM per_part
    )
    SELECT p_partkey, CAST(v4_sum AS DOUBLE) / 10000.0 AS value
    FROM per_part, tot
    WHERE CAST(v4_sum AS DOUBLE)
          > 2.0 * (CAST(v4_tot AS DOUBLE) / CAST(n_parts AS DOUBLE))
    """,
)
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: per-part value within one nation, kept where it
    exceeds 2x the mean part value (HAVING vs broadcast scalar). The
    threshold is relative to the mean rather than Q11's fixed fraction so
    the selectivity is scale-invariant (the classic query scales its
    fraction by 1/SF by hand)."""
    li = table(spark, sf_dir, 'lineitem')
    supp = table(spark, sf_dir, 'supplier')
    nation = table(spark, sf_dir, 'nation')

    nat_supp = supp.join(
        F.broadcast(nation.filter(F.col('n_name') == 'NATION_3')),
        supp.s_nationkey == F.col('n_nationkey'),
    ).select('s_suppkey')
    v4 = F.round(
        F.col('l_extendedprice') * (1 - F.col('l_discount')) * 10000, 0
    ).cast('bigint')
    per_part = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == F.col('s_suppkey'))
        .select(F.col('l_partkey').alias('p_partkey'), v4.alias('v4'))
        .groupBy('p_partkey')
        .agg(F.sum(F.col('v4').cast('decimal(38,0)')).cast('bigint').alias('v4_sum'))
    )
    tot = per_part.agg(
        F.sum(F.col('v4_sum').cast('decimal(38,0)')).cast('bigint').alias('v4_tot'),
        F.count(F.lit(1)).alias('n_parts'),
    )
    return (
        per_part.crossJoin(F.broadcast(tot))
        .filter(
            F.col('v4_sum').cast('double')
            > 2.0 * (F.col('v4_tot').cast('double') / F.col('n_parts').cast('double'))
        )
        .select(
            'p_partkey', (F.col('v4_sum').cast('double') / 10000.0).alias('value')
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q16 shape: distinct-supplier counts per part attribute group with a
# NOT IN supplier exclusion. No partsupp -> the (part, supplier) relation is
# the distinct pairs observed in lineitem. Scale: the excluded-supplier list
# is a broadcast anti-join (NOT IN with non-nullable keys == left_anti); the
# distinct count shuffles once on the group keys after a map-side distinct
# of (brand, size, suppkey).
# ---------------------------------------------------------------------------


@register(
    'q16_supplier_part_counts',
    oracle="""
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#19' AND p_type <> 'PROMO'
      AND p_size IN (1, 14, 23, 45)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
      )
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape: how many distinct (non-excluded) suppliers serve
    each (brand, size) bucket of qualifying parts."""
    li = table(spark, sf_dir, 'lineitem')
    part = table(spark, sf_dir, 'part')
    supp = table(spark, sf_dir, 'supplier')

    cand = part.filter(
        (F.col('p_brand') != 'Brand#19')
        & (F.col('p_type') != 'PROMO')
        & F.col('p_size').isin(1, 14, 23, 45)
    ).select('p_partkey', 'p_brand', 'p_size')
    excluded = supp.filter(F.col('s_acctbal') < 1000).select('s_suppkey')
    return (
        li.join(F.broadcast(cand), li.l_partkey == F.col('p_partkey'))
        .join(
            F.broadcast(excluded), li.l_suppkey == F.col('s_suppkey'), 'left_anti'
        )
        .groupBy('p_brand', 'p_size')
        .agg(F.countDistinct('l_suppkey').alias('supplier_cnt'))
    )


# ---------------------------------------------------------------------------
# Approximate heavy hitters: approx_top_k (DataSketches frequent-items).
# Gate contract mirrors the HLL query: on this corpus the 31-term vocabulary
# is far below the sketch's tracked-item capacity, so every estimate is
# provably exact and the oracle is plain GROUP BY counts — a deterministic
# full-equality check of the sketch path. With a real (open) vocabulary the
# counts degrade to bounded error and the contract would weaken to in-bounds
# flags, exactly like the HLL row. Scale: the sketch is mergeable — partial
# sketches combine map-side, one 1-row shuffle, no full term aggregation.
# ---------------------------------------------------------------------------


@register(
    'approx_top_k_terms',
    oracle=r"""
    SELECT term, cnt, rk FROM (
        SELECT term, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, term) AS rk
        FROM (
            SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
            FROM documents
        ) GROUP BY term
    ) WHERE rk <= 40
    """,
)
def approx_top_k_terms(spark, sf_dir):
    """Top-40 corpus terms via the approx_top_k frequent-items sketch,
    re-ranked deterministically by (count desc, term).

    The sketch is OVER-FETCHED (256 items, not 40) and the final top-40
    cut happens after the deterministic re-rank: the sketch's own ordering
    among EQUAL counts is engine-internal, so asking it for exactly k
    items picks an arbitrary member of any tie group straddling rank k —
    found by the sf1 oracle pass, where the salted replica corpus puts a
    9-way count tie across rank 40. Correct as long as the fetch depth
    clears the rank-40 tie group (here it clears all but the tail of the
    ~310-term vocabulary, whose counts are exact: vocab is far below the
    sketch's tracked-item capacity)."""
    docs = table(spark, sf_dir, 'documents')
    toks = docs.select(
        F.explode(F.split(F.trim(F.col('text')), r'\s+')).alias('term')
    )
    sk = toks.agg(F.expr('approx_top_k(term, 256)').alias('tk'))
    out = sk.select(F.explode('tk').alias('e')).select(
        F.col('e.item').alias('term'), F.col('e.count').alias('cnt')
    )
    w = Window.orderBy(F.desc('cnt'), F.asc('term'))
    return (
        out.withColumn('rk', F.row_number().over(w).cast('long'))
        .filter(F.col('rk') <= 40)
    )


# ---------------------------------------------------------------------------
# Correlated LATERAL subquery: top-2 nations by customer count per region.
# The SQL-interface statement of the per-group top-k pattern — Catalyst
# decorrelates the lateral into a join + windowed rank, so the plan is the
# same shuffle shape as window_topk_per_group (no per-row re-execution of
# the subquery, which is how a naive correlated evaluation would behave).
# ---------------------------------------------------------------------------


@register(
    'sql_lateral_topk_nations',
    oracle="""
    SELECT r_name, n_name, n_cust
    FROM region,
    LATERAL (
        SELECT n_name, COUNT(*) AS n_cust
        FROM nation JOIN customer ON c_nationkey = n_nationkey
        WHERE n_regionkey = r_regionkey
        GROUP BY n_name
        ORDER BY COUNT(*) DESC, n_name
        LIMIT 2
    ) t
    """,
)
def sql_lateral_topk_nations(spark, sf_dir):
    """Byte-identical ANSI LATERAL text on both engines (the same string is
    the oracle); registered views over the shared parquet tables."""
    for t in ('region', 'nation', 'customer'):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT r_name, n_name, n_cust
        FROM region,
        LATERAL (
            SELECT n_name, COUNT(*) AS n_cust
            FROM nation JOIN customer ON c_nationkey = n_nationkey
            WHERE n_regionkey = r_regionkey
            GROUP BY n_name
            ORDER BY COUNT(*) DESC, n_name
            LIMIT 2
        ) t
        """
    )


# ---------------------------------------------------------------------------
# Sketch MERGEABILITY — the property that makes sketches the 100 TB answer:
# per-partition (here per-user) HLL sketches union into one global sketch
# without touching raw data again. Union promotion can land on a slightly
# different register state than the direct global sketch (both estimates
# are deterministic for fixed data — HLL insertion is order-independent —
# but not equal), so the gate contract is the HLL pattern: exact distinct
# count compared exactly, both estimate paths flagged within 5% (>3 sigma
# at the default lgConfigK=12, rel err ~1.6%).
# ---------------------------------------------------------------------------


@register(
    'sketch_merge_hll',
    oracle="""
    SELECT CAST(COUNT(DISTINCT value) AS BIGINT) AS n_exact,
           TRUE AS direct_in_bounds,
           TRUE AS merged_in_bounds
    FROM events
    """,
)
def sketch_merge_hll(spark, sf_dir):
    """Distributed-sketch path: per-user HLL sketches of event values are
    union-merged and the global estimate checked against both the direct
    global sketch and the exact distinct count. See the module note."""
    ev = table(spark, sf_dir, 'events').select(
        'user_id', F.col('value').cast('string').alias('v')
    )
    per = ev.groupBy('user_id').agg(F.hll_sketch_agg('v').alias('sk'))
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg('sk')).alias('merged_est')
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg('v')).alias('direct_est'),
        F.countDistinct('v').alias('n_exact'),
    )
    lo, hi = 0.95, 1.05
    return (
        direct.crossJoin(F.broadcast(merged))
        .select(
            'n_exact',
            F.col('direct_est')
            .between(F.col('n_exact') * lo, F.col('n_exact') * hi)
            .alias('direct_in_bounds'),
            F.col('merged_est')
            .between(F.col('n_exact') * lo, F.col('n_exact') * hi)
            .alias('merged_in_bounds'),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape (adapted: this schema has no l_commitdate/l_receiptdate, so
# "late" = a lineitem shipped more than 60 days after the order date):
# order-priority histogram of orders with at least one late line — the
# classic EXISTS → left-semi-join rewrite.
# Scale: the semi join shuffles only (orderkey, orderdate) against
# (l_orderkey, l_shipdate); the lineitem side prunes to two columns and the
# aggregate collapses to 5 groups map-side before the final exchange.
# ---------------------------------------------------------------------------


@register(
    'q4_order_priority',
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """Correlated EXISTS stated as a left-semi join (the decorrelated plan
    Catalyst itself would produce): the correlation predicate — shipdate
    more than 60 days past the order date — rides in the join condition."""
    orders = table(spark, sf_dir, 'orders').filter(
        (F.col('o_orderdate') >= F.lit('1996-01-01').cast('timestamp'))
        & (F.col('o_orderdate') < F.lit('1997-01-01').cast('timestamp'))
    )
    li = table(spark, sf_dir, 'lineitem').select('l_orderkey', 'l_shipdate')
    cond = (F.col('l_orderkey') == F.col('o_orderkey')) & (
        F.col('l_shipdate')
        > F.col('o_orderdate') + F.expr('INTERVAL 60 DAYS')
    )
    return (
        orders.join(li, cond, 'left_semi')
        .groupBy('o_orderpriority')
        .agg(F.count(F.lit(1)).alias('order_count'))
    )


# ---------------------------------------------------------------------------
# TPC-H Q10: returned-item reporting — top 20 customers by lost revenue from
# returns in one quarter.
# Scale: orders prunes on the quarter BEFORE the lineitem join (predicate
# pushdown to the parquet scan); nation broadcasts; the top-20 runs as
# TakeOrderedAndProject (no global sort materialization). Ties broken by
# c_custkey so the limit is deterministic at any SF.
# ---------------------------------------------------------------------------


@register(
    'q10_returned_items',
    oracle=f"""
    SELECT c_custkey, c_name, c_acctbal, n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    cust = table(spark, sf_dir, 'customer')
    nation = table(spark, sf_dir, 'nation')
    orders = table(spark, sf_dir, 'orders').filter(
        (F.col('o_orderdate') >= F.lit('1996-01-01').cast('timestamp'))
        & (F.col('o_orderdate') < F.lit('1996-04-01').cast('timestamp'))
    )
    li = table(spark, sf_dir, 'lineitem').filter(F.col('l_returnflag') == 'R')
    rev = F.col('l_extendedprice') * (1 - F.col('l_discount'))
    return (
        cust.join(F.broadcast(nation), F.col('n_nationkey') == F.col('c_nationkey'))
        .join(orders, F.col('o_custkey') == F.col('c_custkey'))
        .join(li, F.col('l_orderkey') == F.col('o_orderkey'))
        .groupBy('c_custkey', 'c_name', 'c_acctbal', 'n_name')
        .agg(dsum(rev).alias('revenue'))
        .orderBy(F.col('revenue').desc(), 'c_custkey')
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q12 shape (adapted: no l_shipmode column, so the return flag serves
# as the shipment category): conditional aggregation — per category, how many
# lines belong to high- vs low-priority orders, counting only lines shipped
# within 90 days of the order date during one year.
# Scale: one fact-fact equi-join on orderkey; the CASE arms fold into the
# partial aggregate (2 output groups), so the post-join exchange carries 2
# rows per task. The year predicate pushes to the lineitem scan.
# ---------------------------------------------------------------------------


@register(
    'q12_priority_by_category',
    oracle="""
    SELECT l_returnflag AS ship_category,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag IN ('R', 'A')
      AND l_shipdate >= o_orderdate
      AND l_shipdate < o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def q12_priority_by_category(spark, sf_dir):
    orders = table(spark, sf_dir, 'orders').select(
        'o_orderkey', 'o_orderdate', 'o_orderpriority'
    )
    li = table(spark, sf_dir, 'lineitem').filter(
        F.col('l_returnflag').isin('R', 'A')
        & (F.col('l_shipdate') >= F.lit('1996-01-01').cast('timestamp'))
        & (F.col('l_shipdate') < F.lit('1997-01-01').cast('timestamp'))
    )
    high = F.col('o_orderpriority').isin('1-URGENT', '2-HIGH')
    return (
        orders.join(li, F.col('o_orderkey') == F.col('l_orderkey'))
        .filter(
            (F.col('l_shipdate') >= F.col('o_orderdate'))
            & (
                F.col('l_shipdate')
                < F.col('o_orderdate') + F.expr('INTERVAL 90 DAYS')
            )
        )
        .groupBy(F.col('l_returnflag').alias('ship_category'))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast('bigint').alias('high_line_count'),
            F.sum(F.when(~high, 1).otherwise(0)).cast('bigint').alias('low_line_count'),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q17: small-quantity-order revenue — the exact query (the general
# decorrelation shape is `subquery_correlated_avg`; this is the
# brand-filtered, 0.2x-threshold, /7.0 original).
# Scale: the per-part average aggregates lineitem once (map-side partials),
# then joins back on the SAME key — AQE reuses the exchange, so the
# decorrelated plan costs one shuffle, not the naive per-row subquery. The
# brand filter broadcasts the tiny part dim into both sides.
# ---------------------------------------------------------------------------


@register(
    'q17_small_quantity_revenue',
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT 0.2 * {sql_davg('l2.l_quantity')}
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """Decorrelated Q17: per-part decimal-exact avg, joined back, threshold
    applied as a plain predicate. Both engines compute the identical
    (exact-decimal-sum / count) average, so the 0.2x double threshold and
    the comparison are bit-identical."""
    li = table(spark, sf_dir, 'lineitem')
    part = table(spark, sf_dir, 'part').filter(F.col('p_brand') == 'Brand#23')
    # the correlation is on p_partkey, so the per-part average only ever
    # matters for the brand's parts — semi-join restrict BEFORE the
    # aggregate (the optimizer cannot push the brand filter across the
    # aggregate boundary itself), cutting the agg input by ~|brands|x
    brand_keys = part.select(F.col('p_partkey').alias('bk'))
    per_part = (
        li.join(F.broadcast(brand_keys), F.col('l_partkey') == F.col('bk'), 'left_semi')
        .groupBy(F.col('l_partkey').alias('pk'))
        .agg(davg('l_quantity').alias('avg_qty'))
    )
    return (
        li.join(F.broadcast(part), F.col('p_partkey') == F.col('l_partkey'))
        .join(per_part, F.col('pk') == F.col('l_partkey'))
        .filter(F.col('l_quantity') < 0.2 * F.col('avg_qty'))
        .agg((dsum('l_extendedprice') / 7.0).alias('avg_yearly'))
    )


# ---------------------------------------------------------------------------
# RFM segmentation — the classic warehouse customer-scoring pattern:
# per-customer Recency (days since last order, anchored to the corpus max
# order date so the query is deterministic), Frequency (order count), and
# Monetary (exact-decimal revenue), bucketed by fixed thresholds into a
# 3x3x3 segment code, then rolled up to a segment histogram.
# Scale: one shuffle on custkey for the per-customer aggregate (map-side
# combinable); the anchor date is a 1-row broadcast; the segment rollup
# collapses to <=27 groups map-side. Fixed thresholds (not quantiles) keep
# the plan free of global windows — the quantile variant is
# text_length_curriculum's bucketed-rank shape applied here unchanged.
# ---------------------------------------------------------------------------


@register(
    'rfm_customer_segments',
    oracle=f"""
    WITH anchor AS (SELECT MAX(o_orderdate) AS max_d FROM orders),
    per_cust AS (
        SELECT o_custkey,
               date_diff('day', MAX(o_orderdate), (SELECT max_d FROM anchor))
                   AS rec_days,
               COUNT(*) AS freq,
               {sql_dsum('o_totalprice')} AS monetary
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT CAST(CASE WHEN rec_days <= 90 THEN 3
                         WHEN rec_days <= 365 THEN 2 ELSE 1 END AS BIGINT)
                   AS r_score,
               CAST(CASE WHEN freq >= 20 THEN 3
                         WHEN freq >= 10 THEN 2 ELSE 1 END AS BIGINT)
                   AS f_score,
               CAST(CASE WHEN monetary >= 2000000 THEN 3
                         WHEN monetary >= 1000000 THEN 2 ELSE 1 END AS BIGINT)
                   AS m_score,
               monetary
        FROM per_cust
    )
    SELECT r_score, f_score, m_score,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(monetary AS DECIMAL(28,6))) AS DOUBLE) AS segment_value
    FROM scored GROUP BY r_score, f_score, m_score
    """,
)
def rfm_customer_segments(spark, sf_dir):
    """RFM score histogram with a broadcast anchor date and fixed
    thresholds — see the module note for the no-global-window rationale."""
    orders = table(spark, sf_dir, 'orders')
    anchor = orders.agg(F.max('o_orderdate').alias('max_d'))
    per_cust = (
        orders.groupBy('o_custkey')
        .agg(
            F.max('o_orderdate').alias('last_d'),
            F.count(F.lit(1)).alias('freq'),
            dsum('o_totalprice').alias('monetary'),
        )
        .crossJoin(F.broadcast(anchor))
        .withColumn('rec_days', F.datediff('max_d', 'last_d'))
    )
    r_score = (
        F.when(F.col('rec_days') <= 90, 3)
        .when(F.col('rec_days') <= 365, 2)
        .otherwise(1)
        .cast('bigint')
    )
    f_score = (
        F.when(F.col('freq') >= 20, 3)
        .when(F.col('freq') >= 10, 2)
        .otherwise(1)
        .cast('bigint')
    )
    m_score = (
        F.when(F.col('monetary') >= 2000000, 3)
        .when(F.col('monetary') >= 1000000, 2)
        .otherwise(1)
        .cast('bigint')
    )
    return (
        per_cust.select(
            r_score.alias('r_score'),
            f_score.alias('f_score'),
            m_score.alias('m_score'),
            'monetary',
        )
        .groupBy('r_score', 'f_score', 'm_score')
        .agg(
            F.count(F.lit(1)).alias('n_customers'),
            dsum('monetary').alias('segment_value'),
        )
    )


# ---------------------------------------------------------------------------
# Column profiling — the (column, null-rate, distinct-count) summary a data
# catalog computes on every ingest. Stated as ONE aggregate over the fact
# table unpivoted to rows (no per-column scans).
# Scale: Spark plans multi-distinct aggregates with an Expand (one scan,
# one row per (row, column) pair pre-aggregated map-side); at 100 TB the
# exact distincts can swap for approx_count_distinct or the bitmap pattern
# (events_bitmap_distinct_users) without changing the output contract.
# ---------------------------------------------------------------------------


@register(
    'profile_lineitem_columns',
    oracle="""
    SELECT 'l_orderkey' AS column_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(l_orderkey) AS n_nulls,
           COUNT(DISTINCT l_orderkey) AS n_distinct
    FROM lineitem
    UNION ALL
    SELECT 'l_partkey', COUNT(*), COUNT(*) - COUNT(l_partkey),
           COUNT(DISTINCT l_partkey) FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
           COUNT(DISTINCT l_returnflag) FROM lineitem
    UNION ALL
    SELECT 'l_shipdate', COUNT(*), COUNT(*) - COUNT(l_shipdate),
           COUNT(DISTINCT l_shipdate) FROM lineitem
    """,
)
def profile_lineitem_columns(spark, sf_dir):
    """Catalog-style column profile (nulls + exact distincts) in one
    aggregate pass over an unpivoted projection — see the module note."""
    # r11 optimization: the 4-way unpivot explode + distinct-counting
    # partial aggregate ran inside the single scan task (guide §1.2 step 1;
    # no-op on multi-split layouts).
    li = spread_small(table(spark, sf_dir, 'lineitem'), 'l_orderkey')
    cols = ['l_orderkey', 'l_partkey', 'l_returnflag', 'l_shipdate']
    long = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias('column_name'),
                        F.col(c).cast('string').alias('v'),
                    )
                    for c in cols
                ]
            )
        ).alias('cv')
    ).select('cv.column_name', 'cv.v')
    return long.groupBy('column_name').agg(
        F.count(F.lit(1)).alias('n_rows'),
        (F.count(F.lit(1)) - F.count('v')).alias('n_nulls'),
        F.countDistinct('v').alias('n_distinct'),
    )


# ---------------------------------------------------------------------------
# Data-quality constraint report (the Deequ/Great-Expectations pattern run
# IN-ENGINE): completeness, uniqueness, domain and range checks computed in
# ONE aggregate pass over the fact table, plus one anti-join for
# referential integrity — each constraint emits (name, violation metric,
# passed). At 100 TB the column checks stay a single scan (all metrics in
# one agg, unpivoted after), and the RI check is a broadcast/shuffle
# anti-join on the key — the report costs barely more than reading the
# table once.
# ---------------------------------------------------------------------------


@register(
    'quality_constraint_report',
    oracle="""
    WITH col_checks AS (
        SELECT CAST(COUNT(*) - COUNT(l_orderkey) AS BIGINT) AS null_orderkey,
               CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                             THEN 1 ELSE 0 END) AS BIGINT) AS qty_out_of_range,
               CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                             THEN 1 ELSE 0 END) AS BIGINT) AS bad_returnflag
        FROM lineitem
    ),
    uniq AS (
        SELECT CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
                   AS dup_orderkeys
        FROM orders
    ),
    orphans AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS orphan_lineitems
        FROM lineitem l
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey
        )
    )
    SELECT 'orderkey_complete' AS constraint_name,
           null_orderkey AS violations, null_orderkey = 0 AS passed
    FROM col_checks
    UNION ALL
    SELECT 'quantity_in_1_50', qty_out_of_range, qty_out_of_range = 0
    FROM col_checks
    UNION ALL
    SELECT 'returnflag_domain', bad_returnflag, bad_returnflag = 0
    FROM col_checks
    UNION ALL
    SELECT 'orderkey_unique', dup_orderkeys, dup_orderkeys = 0 FROM uniq
    UNION ALL
    SELECT 'lineitem_ri_orders', orphan_lineitems, orphan_lineitems = 0
    FROM orphans
    """,
)
def quality_constraint_report(spark, sf_dir):
    """Five-constraint validation report: one aggregate pass for the
    column checks, one anti-join for referential integrity (module note)."""
    li = table(spark, sf_dir, 'lineitem')
    orders = table(spark, sf_dir, 'orders')
    col_checks = li.agg(
        (F.count(F.lit(1)) - F.count('l_orderkey')).alias('null_orderkey'),
        F.sum(
            F.when((F.col('l_quantity') < 1) | (F.col('l_quantity') > 50), 1)
            .otherwise(0)
        ).cast('bigint').alias('qty_out_of_range'),
        F.sum(
            F.when(~F.col('l_returnflag').isin('A', 'N', 'R'), 1).otherwise(0)
        ).cast('bigint').alias('bad_returnflag'),
    )
    uniq = orders.agg(
        (F.count(F.lit(1)) - F.countDistinct('o_orderkey')).alias('dup_orderkeys')
    )
    orphans = (
        li.join(orders, F.col('o_orderkey') == F.col('l_orderkey'), 'left_anti')
        .agg(F.count(F.lit(1)).alias('orphan_lineitems'))
    )

    # the three column checks fan out of ONE 1-row aggregate via explode —
    # referencing col_checks three times would re-plan (and re-scan) the
    # lineitem aggregate per reference
    col_rows = col_checks.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit('orderkey_complete').alias('constraint_name'),
                    F.col('null_orderkey').alias('violations'),
                ),
                F.struct(
                    F.lit('quantity_in_1_50').alias('constraint_name'),
                    F.col('qty_out_of_range').alias('violations'),
                ),
                F.struct(
                    F.lit('returnflag_domain').alias('constraint_name'),
                    F.col('bad_returnflag').alias('violations'),
                ),
            )
        ).alias('c')
    ).select('c.constraint_name', 'c.violations')

    def row(src, name, col):
        return src.select(
            F.lit(name).alias('constraint_name'),
            F.col(col).alias('violations'),
        )

    return (
        col_rows.unionByName(row(uniq, 'orderkey_unique', 'dup_orderkeys'))
        .unionByName(row(orphans, 'lineitem_ri_orders', 'orphan_lineitems'))
        .select(
            'constraint_name',
            'violations',
            (F.col('violations') == 0).alias('passed'),
        )
    )


# ---------------------------------------------------------------------------
# Market-basket association rules (A-Priori pass 1+2) over the order
# baskets: which part brands are co-purchased more often than chance.
# Baskets = distinct (order, brand); pair support from a self-join on the
# order key — fan-out is bounded by the basket size (a TPC-H order has at
# most 7 lineitems, so at most 7 brands), which is what keeps pair-gen
# linear in the fact table, not quadratic. Confidence and lift derive
# from integer counts with a fixed IEEE op sequence, so both engines
# produce bit-identical doubles.
# Scale: one shuffle to distinct the baskets (combinable), one bounded
# self-join keyed on the order, combinable pair counts; the 25-row brand
# singles and the 1-row basket total broadcast back into the rule join.
# ---------------------------------------------------------------------------

BASKET_MIN_SUPPORT = 50


@register(
    'basket_brand_rules',
    oracle=f"""
    WITH baskets AS (
        SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    tot AS (SELECT COUNT(DISTINCT ok) AS n FROM baskets),
    singles AS (SELECT b, COUNT(*) AS s FROM baskets GROUP BY b),
    pairs AS (
        SELECT a.b AS ba, c.b AS bb, COUNT(*) AS c
        FROM baskets a JOIN baskets c ON a.ok = c.ok AND a.b < c.b
        GROUP BY a.b, c.b
        HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
    ),
    directed AS (
        SELECT ba AS antecedent, bb AS consequent, c FROM pairs
        UNION ALL
        SELECT bb AS antecedent, ba AS consequent, c FROM pairs
    )
    SELECT d.antecedent, d.consequent, d.c AS support_cnt,
           CAST(d.c AS DOUBLE) / sa.s AS confidence,
           (CAST(d.c AS DOUBLE) * tot.n)
               / (CAST(sa.s AS DOUBLE) * sb.s) AS lift
    FROM directed d
    JOIN singles sa ON sa.b = d.antecedent
    JOIN singles sb ON sb.b = d.consequent
    CROSS JOIN tot
    """,
)
def basket_brand_rules(spark, sf_dir):
    """Brand co-purchase association rules (module note above)."""
    # r11 optimization: the part join + (ok, brand) partial distinct ran
    # inside the single scan task; spread_small restores core-wide
    # execution, no-op on multi-split layouts.
    li = spread_small(table(spark, sf_dir, 'lineitem'), 'l_orderkey')
    part = table(spark, sf_dir, 'part')
    baskets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col('l_orderkey').alias('ok'), F.col('p_brand').alias('b'))
        .distinct()
    )
    tot = baskets.agg(F.countDistinct('ok').alias('n'))
    singles = baskets.groupBy('b').agg(F.count(F.lit(1)).alias('s'))
    a, c = baskets.alias('a'), baskets.alias('c')
    pairs = (
        a.join(
            c, (F.col('a.ok') == F.col('c.ok')) & (F.col('a.b') < F.col('c.b'))
        )
        .groupBy(F.col('a.b').alias('ba'), F.col('c.b').alias('bb'))
        .agg(F.count(F.lit(1)).alias('c'))
        .filter(F.col('c') >= BASKET_MIN_SUPPORT)
    )
    directed = pairs.select(
        F.col('ba').alias('antecedent'), F.col('bb').alias('consequent'), 'c'
    ).unionByName(
        pairs.select(
            F.col('bb').alias('antecedent'),
            F.col('ba').alias('consequent'),
            'c',
        )
    )
    sa = singles.select(F.col('b').alias('antecedent'), F.col('s').alias('sa'))
    sb = singles.select(F.col('b').alias('consequent'), F.col('s').alias('sb'))
    return (
        directed.join(F.broadcast(sa), 'antecedent')
        .join(F.broadcast(sb), 'consequent')
        .crossJoin(F.broadcast(tot))
        .select(
            'antecedent',
            'consequent',
            F.col('c').alias('support_cnt'),
            (F.col('c').cast('double') / F.col('sa')).alias('confidence'),
            (
                (F.col('c').cast('double') * F.col('n'))
                / (F.col('sa').cast('double') * F.col('sb'))
            ).alias('lift'),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q14: promotion effect — share of one month's revenue that came from
# promotional parts. Completes the full 22-query TPC-H shape sweep (adapted:
# this generator's p_type is a single word, so the promo class is equality,
# not LIKE 'PROMO%' — same plan shape, the predicate still evaluates on the
# broadcast dim side).
# Scale: the month predicate pushes to the lineitem scan (partition/file
# pruning on a date-clustered layout); part is a broadcast dim; both CASE
# arms fold into ONE partial aggregate, so the post-join exchange carries a
# single row per task and the result is one row. The percent is one IEEE
# divide of two decimal-exact sums — cross-engine bit-equal.
# ---------------------------------------------------------------------------


@register(
    'q14_promo_revenue',
    oracle=f"""
    SELECT 100.0 * {sql_dsum("CASE WHEN p_type = 'PROMO' "
                             'THEN l_extendedprice * (1 - l_discount) '
                             'ELSE 0 END')}
           / {sql_dsum('l_extendedprice * (1 - l_discount)')} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: conditional revenue share over a month window."""
    li = table(spark, sf_dir, 'lineitem').filter(
        (F.col('l_shipdate') >= F.lit('1996-03-01').cast('timestamp'))
        & (F.col('l_shipdate') < F.lit('1996-04-01').cast('timestamp'))
    )
    part = table(spark, sf_dir, 'part').select('p_partkey', 'p_type')
    rev = F.col('l_extendedprice') * (1 - F.col('l_discount'))
    promo = F.when(F.col('p_type') == 'PROMO', rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), F.col('l_partkey') == F.col('p_partkey'))
        .agg(
            (100.0 * dsum(promo) / dsum(rev)).alias('promo_revenue'),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pruning (runtime-filter pattern, built by hand from
# JVM expressions). The selective dim key set is folded into a fixed
# 512 Kbit Bloom filter stored as 8192 (word_idx, word) longs — built with
# one tiny shuffle (bit_or partial-aggregates are map-side combinable) —
# and the fact side probes it with k=3 xxhash64 bits via THREE broadcast
# joins on word index before the exact semi-join kills false positives.
# The final semi-join keeps the result EXACT (the oracle is the plain
# IN-subquery), so the Bloom stage is pure pruning.
# Scale: at this SF the dim itself is broadcastable and the Bloom layer is
# redundant — the pattern pays off when the dim key set is 10^7-10^9 rows
# (too big for a broadcast hash relation) but its Bloom image is a few MB:
# the fact stream is then pruned BEFORE its shuffle, which is exactly what
# Spark's own runtime bloom filter (spark.sql.optimizer.runtime.bloomFilter)
# does for shuffle joins. Building it manually keeps the mechanism visible
# and plan-testable.
# ---------------------------------------------------------------------------

_BLOOM_BITS = 1 << 19  # 512 Kbit -> 8192 longs
_BLOOM_K = 3


@register(
    'join_bloom_prefilter',
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS revenue
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    GROUP BY o_orderpriority
    """,
)
def join_bloom_prefilter(spark, sf_dir):
    """Order stats for one customer segment via a hand-built Bloom-filter
    runtime prefilter + exact semi-join (see the module note)."""
    keys = (
        table(spark, sf_dir, 'customer')
        .filter(F.col('c_mktsegment') == 'BUILDING')
        .select(F.col('c_custkey').alias('k'))
    )

    def positions(col: str):
        return [
            F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(_BLOOM_BITS))
            for i in range(_BLOOM_K)
        ]

    words = (
        keys.select(F.explode(F.array(*positions('k'))).alias('pos'))
        .select(
            F.shiftright('pos', 6).alias('w'),
            F.expr('shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))').alias(
                'mask'
            ),
        )
        .groupBy('w')
        .agg(F.bit_or('mask').alias('word'))
        # materialize the (<= 8192-row) filter once: the probe references it
        # k times, and without this each reference re-runs the dim-sized
        # build (three identical shuffles instead of one).
        .localCheckpoint()
    )

    probed = table(spark, sf_dir, 'orders')
    hit = F.lit(True)
    for i, pos in enumerate(positions('o_custkey')):
        wi = words.select(
            F.col('w').alias(f'w{i}'), F.col('word').alias(f'word{i}')
        )
        probed = probed.withColumn(f'pos{i}', pos).join(
            F.broadcast(wi),
            F.shiftright(f'pos{i}', 6) == F.col(f'w{i}'),
            'left',
        )
        bit = F.expr(
            f'shiftleft(CAST(1 AS BIGINT), CAST(pos{i} % 64 AS INT))'
        )
        hit = hit & F.col(f'word{i}').isNotNull() & (
            F.col(f'word{i}').bitwiseAND(bit) != 0
        )

    candidates = probed.filter(hit)
    exact = candidates.join(
        F.broadcast(keys), candidates['o_custkey'] == keys['k'], 'left_semi'
    )
    return exact.groupBy('o_orderpriority').agg(
        F.count(F.lit(1)).alias('n_orders'),
        dsum('o_totalprice').alias('revenue'),
    )


# ---------------------------------------------------------------------------
# Count-min sketch: the mergeable FREQUENCY sketch (HLL counts distinct,
# CMS counts occurrences). d=4 hash rows x w=256 buckets of integer
# counters; est(term) = min over rows of counter[row][bucket_row(term)] —
# always >= the true count, over only by colliding terms' mass. The
# counter matrix is FIXED SIZE and map-side combinable (a groupBy over
# (row, bucket)), which is the whole point at 100 TB: the term stream
# aggregates into d*w cells regardless of vocabulary size, and partition-
# local matrices merge by cell-wise addition. The probe pass joins the
# vocabulary (here: all distinct terms, with their exact counts riding
# along for the error audit) against the broadcast counter matrix.
# Buckets derive from md5 — identical hex on both engines — and counters
# are integers, so estimates match the oracle exactly, including the
# deterministic collision overestimates.
# ---------------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 256


def _sql_cms_bucket(row: str, term: str) -> str:
    return (
        f"CAST(('0x' || substring(md5({row} || ':' || {term}), 1, 8)) "
        f'AS BIGINT) % {_CMS_W}'
    )


@register(
    'sketch_cms_frequency',
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents
    ),
    fanout AS (
        SELECT term, r, {_sql_cms_bucket('CAST(r AS VARCHAR)', 'term')} AS bucket
        FROM toks, (SELECT unnest(range({_CMS_D})) AS r)
    ),
    counters AS (
        SELECT r, bucket, COUNT(*) AS cnt FROM fanout GROUP BY r, bucket
    ),
    exact AS (SELECT term, COUNT(*) AS exact_cnt FROM toks GROUP BY term),
    probes AS (
        SELECT e.term, e.exact_cnt, r,
               {_sql_cms_bucket('CAST(r AS VARCHAR)', 'e.term')} AS bucket
        FROM exact e, (SELECT unnest(range({_CMS_D})) AS r)
    )
    SELECT p.term,
           MIN(c.cnt) AS cms_estimate,
           MIN(p.exact_cnt) AS exact_cnt,
           CAST(MIN(c.cnt) - MIN(p.exact_cnt) AS BIGINT) AS overestimate
    FROM probes p JOIN counters c ON p.r = c.r AND p.bucket = c.bucket
    GROUP BY p.term
    """,
)
def sketch_cms_frequency(spark, sf_dir):
    """Count-min sketch over the corpus term stream, audited per term
    against the exact count (see the module note)."""
    docs = table(spark, sf_dir, 'documents')
    # r11 optimization: the term explode feeds a 16x (r x bucket) fan-out
    # whose md5 bucketing is the query's real compute — all fused into the
    # single-task scan on the few-file driver layout (sf0.1 ran 1.88s vs
    # sf1's 1.60s). spread_small runs it core-wide locally and both
    # branches (sketch counters and the exact audit) reuse ONE exchange
    # (ReusedExchange); no-op on multi-split production layouts.
    toks = spread_small(docs.select('doc_id', 'text'), 'doc_id').select(
        F.explode(F.split(F.trim(F.col('text')), r'\s+')).alias('term')
    )

    def bucket(term):
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col('r').cast('string'), F.lit(':'), term)),
                    1,
                    8,
                ),
                16,
                10,
            ).cast('bigint'),
            F.lit(_CMS_W),
        )

    rows = F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias('r')
    fanout = toks.select('term', rows).withColumn('bucket', bucket(F.col('term')))
    counters = fanout.groupBy('r', 'bucket').agg(F.count(F.lit(1)).alias('cnt'))

    exact = toks.groupBy('term').agg(F.count(F.lit(1)).alias('exact_cnt'))
    probes = exact.select('term', 'exact_cnt', rows).withColumn(
        'bucket', bucket(F.col('term'))
    )
    return (
        probes.join(F.broadcast(counters), ['r', 'bucket'])
        .groupBy('term')
        .agg(
            F.min('cnt').alias('cms_estimate'),
            F.min('exact_cnt').alias('exact_cnt'),
            (F.min('cnt') - F.min('exact_cnt')).cast('bigint').alias('overestimate'),
        )
    )


# ---------------------------------------------------------------------------
# Leave-one-out target encoding: the standard high-cardinality categorical
# feature for gradient-boosted / linear models — encode each row's category
# by the mean target of the OTHER rows in that category, so the feature
# never leaks the row's own label. enc(row) = (sum(target|cat) - target) /
# (n(cat) - 1); singleton categories encode NULL (no leak-free estimate
# exists). Scale: one partial-agg shuffle builds the per-category (sum, n)
# table — categories-sized, broadcast back into a stateless projection.
# Exactness: the sum is an order-independent DECIMAL accumulator; the
# subtraction stays in decimal, and the single divide runs on identical
# IEEE operands in both engines (the _helpers.py discipline).
# ---------------------------------------------------------------------------


@register(
    'pipeline_target_encoding',
    oracle="""
    WITH seg AS (
        SELECT c_mktsegment,
               SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS s,
               COUNT(*) AS n
        FROM customer GROUP BY c_mktsegment
    )
    SELECT c_custkey, c.c_mktsegment,
           CAST(s - CAST(c_acctbal AS DECIMAL(28,6)) AS DOUBLE)
               / NULLIF(n - 1, 0) AS loo_enc
    FROM customer c JOIN seg ON c.c_mktsegment = seg.c_mktsegment
    """,
)
def pipeline_target_encoding(spark, sf_dir):
    """Leak-free LOO target encoding of c_mktsegment against c_acctbal
    (see the module note)."""
    cust = table(spark, sf_dir, 'customer')
    dec = F.col('c_acctbal').cast(DEC)
    seg = F.broadcast(
        cust.groupBy('c_mktsegment').agg(
            F.sum(dec).alias('s'), F.count(F.lit(1)).alias('n')
        )
    )
    return cust.join(seg, 'c_mktsegment').select(
        'c_custkey',
        'c_mktsegment',
        (
            (F.col('s') - dec).cast('double')
            / F.nullif(F.col('n') - 1, F.lit(0))
        ).alias('loo_enc'),
    )


# ---------------------------------------------------------------------------
# Equi-depth feature binning: bucket a continuous column by its own exact
# quartile boundaries — the standard monotone-robust discretization for
# tree/linear models (each bin gets ~25% of the mass regardless of the
# value distribution). Scale: the boundary row is ONE row (a global
# percentile aggregate — at 100 TB swap in the mergeable approx_percentile
# sketch, same plan shape) broadcast into a stateless projection; the fact
# table never shuffles. Exactness: Spark `percentile` and DuckDB
# `quantile_cont` share interpolation arithmetic (the percentile_exact
# pattern), and the bin comparisons then run on identical doubles.
# ---------------------------------------------------------------------------


@register(
    'pipeline_quantile_bins',
    oracle="""
    WITH b AS (
        SELECT quantile_cont(o_totalprice, 0.25) AS q1,
               quantile_cont(o_totalprice, 0.50) AS q2,
               quantile_cont(o_totalprice, 0.75) AS q3
        FROM orders
    )
    SELECT o_orderkey,
           CAST(1 + CAST(o_totalprice > q1 AS INT)
                  + CAST(o_totalprice > q2 AS INT)
                  + CAST(o_totalprice > q3 AS INT) AS BIGINT) AS price_bin
    FROM orders, b
    """,
)
def pipeline_quantile_bins(spark, sf_dir):
    """Quartile binning of o_totalprice against broadcast exact boundaries
    (see the module note)."""
    orders = table(spark, sf_dir, 'orders')
    b = orders.agg(
        F.expr('percentile(o_totalprice, 0.25)').alias('q1'),
        F.expr('percentile(o_totalprice, 0.50)').alias('q2'),
        F.expr('percentile(o_totalprice, 0.75)').alias('q3'),
    )
    bin_ = (
        F.lit(1)
        + (F.col('o_totalprice') > F.col('q1')).cast('int')
        + (F.col('o_totalprice') > F.col('q2')).cast('int')
        + (F.col('o_totalprice') > F.col('q3')).cast('int')
    ).cast('bigint')
    return orders.crossJoin(F.broadcast(b)).select(
        'o_orderkey', bin_.alias('price_bin')
    )


# ---------------------------------------------------------------------------
# k-anonymity generalization audit — the privacy gate a corpus/feature
# release runs before publishing quasi-identifiers. Each customer's
# (nation, segment) cell is generalized up a fixed hierarchy until the
# RELEASED cell holds >= K members: nation -> region -> suppressed ('*').
# The subtlety the naive statement misses (and this one doesn't): a
# region-level cell may only be PUBLISHED for the customers whose nation
# cell failed, so its anonymity count must be taken over exactly those
# customers — counting the whole region lets an attacker who knows the
# recoding rule exclude the big-nation members and shrink the anonymity
# set below K (the minimality attack on local recoding). Level-2 is the
# suppression bucket, not a release. Output: the released cell table —
# every level-0/1 cell size >= K by construction. Scale: two grouped
# counts over the fact table (both partial-agg combinable) whose results
# are cells-sized and broadcast back; the fact table shuffles once for
# the final cell count. All arithmetic is integer counts.
# ---------------------------------------------------------------------------

_KANON_K = 5


@register(
    'quality_kanonymity_audit',
    oracle=f"""
    WITH cust AS (
        SELECT c_custkey, c_mktsegment, n_name, r_name
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
    ),
    c0 AS (
        SELECT n_name, c_mktsegment, COUNT(*) AS n0 FROM cust
        GROUP BY n_name, c_mktsegment
    ),
    c1 AS (
        SELECT cust.r_name, cust.c_mktsegment, COUNT(*) AS n1 FROM cust
        JOIN c0 ON cust.n_name = c0.n_name
               AND cust.c_mktsegment = c0.c_mktsegment
        WHERE c0.n0 < 5
        GROUP BY cust.r_name, cust.c_mktsegment
    ),
    assigned AS (
        SELECT c_custkey,
               CASE WHEN n0 >= {_KANON_K} THEN 0
                    WHEN COALESCE(n1, 0) >= {_KANON_K} THEN 1
                    ELSE 2 END AS level,
               CASE WHEN n0 >= {_KANON_K} THEN cust.n_name
                    WHEN COALESCE(n1, 0) >= {_KANON_K} THEN cust.r_name
                    ELSE '*' END AS area,
               cust.c_mktsegment
        FROM cust
        JOIN c0 ON cust.n_name = c0.n_name
               AND cust.c_mktsegment = c0.c_mktsegment
        LEFT JOIN c1 ON cust.r_name = c1.r_name
                    AND cust.c_mktsegment = c1.c_mktsegment
    )
    SELECT level, area, c_mktsegment, COUNT(*) AS n_customers
    FROM assigned GROUP BY level, area, c_mktsegment
    """,
)
def quality_kanonymity_audit(spark, sf_dir):
    """Released k-anonymous cells (K=5) under the nation->region
    generalization ladder with '*' suppression (see the module note —
    level-1 anonymity counts cover only the level-0 failures, closing
    the minimality attack)."""
    cust = (
        table(spark, sf_dir, 'customer')
        .join(
            F.broadcast(table(spark, sf_dir, 'nation')),
            F.col('c_nationkey') == F.col('n_nationkey'),
        )
        .join(
            F.broadcast(table(spark, sf_dir, 'region')),
            F.col('n_regionkey') == F.col('r_regionkey'),
        )
        .select('c_custkey', 'c_mktsegment', 'n_name', 'r_name')
    )
    c0 = F.broadcast(
        cust.groupBy('n_name', 'c_mktsegment').agg(
            F.count(F.lit(1)).alias('n0')
        )
    )
    # n1 counts ONLY the level-0 failures in the region cell — the set
    # that would actually be published at level 1 (see the module note).
    c1 = F.broadcast(
        cust.join(c0, ['n_name', 'c_mktsegment'])
        .filter(F.col('n0') < _KANON_K)
        .groupBy('r_name', 'c_mktsegment')
        .agg(F.count(F.lit(1)).alias('n1'))
    )
    k = F.lit(_KANON_K)
    assigned = (
        cust.join(c0, ['n_name', 'c_mktsegment'])
        .join(c1, ['r_name', 'c_mktsegment'], 'left')
        .select(
            'c_custkey',
            'c_mktsegment',
            F.when(F.col('n0') >= k, F.lit(0))
            .when(F.coalesce('n1', F.lit(0)) >= k, F.lit(1))
            .otherwise(F.lit(2))
            .alias('level'),
            F.when(F.col('n0') >= k, F.col('n_name'))
            .when(F.coalesce('n1', F.lit(0)) >= k, F.col('r_name'))
            .otherwise(F.lit('*'))
            .alias('area'),
        )
    )
    return assigned.groupBy('level', 'area', 'c_mktsegment').agg(
        F.count(F.lit(1)).alias('n_customers')
    )
