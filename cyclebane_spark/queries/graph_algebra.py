"""Plan-layer operator queries: the cyclebane algebra executed by Spark.

Each query builds a compact task graph (map / reduce / groupby / slicing /
branch projection — reference semantics per SURVEY.md §2.1), binds sources to
parquet-backed :class:`SparkColumn` arrays, compiles with
``cyclebane_spark.operators.compile``, and returns the result DataFrame. The
oracles state the same dataflow in SQL — proving the compact plan → DataFrame
compilation produces the relationally-correct answer.

Scale notes: a mapped node family with dims (d1..dk) is ONE DataFrame keyed
by those columns — the instance explosion the reference performs in driver
memory (graph.py:595-611) never materializes. Param-sweep dims are tiny
DataFrames cross-joined in (Spark broadcasts the small side); reduce compiles
to partial+final hash aggregation.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..plan.graph import Graph
from ..sources.arrays import SparkColumn
from ..tables import spread_small, table
from . import register
from ._helpers import sql_dsum


def _dsum_agg(c):
    """Reduce impl: exact decimal sum of a double column, as double."""
    return F.sum(c.cast('decimal(28,6)')).cast('double')


def _lineitem_with_id(spark, sf_dir):
    """lineitem with a unique 1-D row key (l_linenumber <= 7 in TPC-H).

    r11 optimization: the graph queries over this table reduce through
    decimal accumulators (and the param sweep triples the rows first) —
    per-row compute that otherwise runs inside the single scan task a
    one-row-group driver file yields. ``spread_small`` restores core-wide
    parallelism locally (param sweep measured 2.03s -> 1.13s at sf0.1) and
    is a no-op on multi-split production layouts; slice predicates still
    push through the repartition to the scan (pinned in tests/test_plans).
    """
    li = spread_small(table(spark, sf_dir, 'lineitem'), 'l_orderkey')
    return li.withColumn(
        'li_id', F.col('l_orderkey') * 100 + F.col('l_linenumber')
    ).withColumn(
        'disc_price', F.col('l_extendedprice') * (1 - F.col('l_discount'))
    )


_SQL_DISC = 'l_extendedprice * (1 - l_discount)'


@register(
    'graph_map_reduce_all',
    oracle=f"""
    SELECT {sql_dsum(_SQL_DISC)} AS total_revenue FROM lineitem
    """,
)
def graph_map_reduce_all(spark, sf_dir):
    """map (joint, 2 columns sharing one index) -> compute -> reduce-all.

    Reference semantics: Graph.map + Graph.reduce with no index/axis
    (graph.py:239-273,321-327); here the mapped arrays are lineitem columns
    and the reduce-all compiles to a single global aggregate.
    """
    li = _lineitem_with_id(spark, sf_dir)
    g = Graph([('price', 'revenue'), ('disc', 'revenue')])
    g = g.map(
        {
            'price': SparkColumn(li, index=['li_id'], values='l_extendedprice'),
            'disc': SparkColumn(li, index=['li_id'], values='l_discount'),
        }
    )
    g = g.reduce('revenue', name='total')
    plan = g.compile(
        spark,
        impls={
            'revenue': lambda price, disc: price * (1 - disc),
            'total': _dsum_agg,
        },
    )
    return plan.frame('total').select(F.col('value').alias('total_revenue'))


@register(
    'graph_map_reduce_partial',
    oracle=f"""
    SELECT l_orderkey, {sql_dsum(_SQL_DISC)} AS value
    FROM lineitem GROUP BY l_orderkey
    """,
)
def graph_map_reduce_partial(spark, sf_dir):
    """2-D mapped family, reduce over ONE dim: keeps the other as a column.

    Reference: reduce(index=...) keeps remaining dims (graph.py:337); the
    compiled form is groupBy(l_orderkey) — partial+final hash agg, one
    shuffle of pre-combined partials.
    """
    li = _lineitem_with_id(spark, sf_dir)
    g = Graph([('item_rev', 'order_rev')])
    g = g.map(
        {
            'item_rev': SparkColumn(
                li, index=['l_orderkey', 'l_linenumber'], values='disc_price'
            )
        }
    )
    g = g.reduce('order_rev', index='l_linenumber', name='order_total')
    plan = g.compile(spark, impls={'order_total': _dsum_agg})
    return plan.frame('order_total')


@register(
    'graph_param_sweep_broadcast',
    headline=True,
    oracle=f"""
    WITH params(dim_2, extra_disc) AS (
        -- DOUBLE (not DuckDB's default DECIMAL literal), and sweep values
        -- whose complement is a dyadic rational: (1 - x) is then EXACT in
        -- double and the product keeps a bounded decimal scale, so the
        -- decimal(28,6) quantization can never land on a tie where Spark
        -- (shortest-string) and DuckDB (exact-binary) round apart
        VALUES (0, CAST(0.00 AS DOUBLE)),
               (1, CAST(0.25 AS DOUBLE)),
               (2, CAST(0.50 AS DOUBLE))
    )
    SELECT CAST(dim_2 AS BIGINT) AS dim_2,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 - extra_disc)')} AS value
    FROM lineitem CROSS JOIN params
    GROUP BY dim_2
    """,
)
def graph_param_sweep_broadcast(spark, sf_dir):
    """Chained map = orthogonal dims: cyclebane's signature param sweep.

    A second map over an in-memory list gives descendants the cartesian of
    (lineitem rows x params) — compiled as a crossJoin where Spark broadcasts
    the 3-row param side, then two chained partial reduces. The fresh dim is
    auto-named dim_2 (axis_zero past the 2 existing dims — graph.py:255-257
    convention).
    """
    li = _lineitem_with_id(spark, sf_dir)
    g = Graph([('price', 'swept'), ('extra_disc', 'swept')])
    g = g.map(
        {
            'price': SparkColumn(
                li, index=['l_orderkey', 'l_linenumber'], values='disc_price'
            )
        }
    )
    g = g.map({'extra_disc': [0.00, 0.25, 0.50]})
    g = g.reduce('swept', index='l_orderkey', name='per_order')
    g = g.reduce('per_order', index='l_linenumber', name='per_param')
    # The DECIMAL accumulator flows through BOTH reduce stages and only the
    # final stage casts to double: decimal addition is associative, so the
    # chained partial reduces equal the oracle's one-shot sum bit-exactly at
    # every SF. (Casting back to double between stages rounds each order
    # subtotal — exact at sf0.01 by luck, off by an ulp at sf0.1.)
    plan = g.compile(
        spark,
        impls={
            'swept': lambda price, extra: price * (1 - extra),
            'per_order': lambda c: F.sum(c.cast('decimal(28,6)')),
            'per_param': lambda c: F.sum(c).cast('double'),
        },
    )
    return plan.frame('per_param')


@register(
    'graph_groupby_reduce',
    oracle="""
    SELECT lang AS lab, CAST(SUM(n_chars) AS BIGINT) AS value
    FROM documents GROUP BY lang
    """,
)
def graph_groupby_reduce(spark, sf_dir):
    """groupby(label).reduce: per-distinct-label fan-in.

    Reference: GroupbyGraph.reduce swaps the inner dim for the group dim
    (graph.py:559-592). The label column is Spark-backed (our engine lifts
    the reference's pandas-only restriction, value_array.py:95-97); group
    membership never touches the driver — it compiles to
    join(labels).groupBy(label). doc_id is the table's key, so the label
    join is 1:1.
    """
    docs = table(spark, sf_dir, 'documents')
    g = Graph([('size', 'w')])
    g = g.map(
        {
            'size': SparkColumn(docs, index=['doc_id'], values='n_chars'),
            'lab': SparkColumn(docs, index=['doc_id'], values='lang'),
        }
    )
    g = g.groupby('lab').reduce('w', name='chars_by_lang')
    plan = g.compile(spark, impls={'chars_by_lang': 'sum'})
    return plan.frame('chars_by_lang')


@register(
    'graph_slice_loc',
    oracle=f"""
    SELECT {sql_dsum(_SQL_DISC)} AS sliced_revenue
    FROM lineitem WHERE l_orderkey >= 100 AND l_orderkey < 600
    """,
)
def graph_slice_loc(spark, sf_dir):
    """Label-slice one dim of every mapped array, then reduce-all.

    Reference: ValueArray.loc / by_position (graph.py:154-178,
    value_array.py:60-67). On a SparkColumn the slice compiles to a range
    predicate on the index column — pushed down to the parquet scan.
    """
    li = _lineitem_with_id(spark, sf_dir)
    g = Graph([('item_rev', 'total')])
    g = g.map(
        {
            'item_rev': SparkColumn(
                li, index=['l_orderkey', 'l_linenumber'], values='disc_price'
            )
        }
    )
    g = g.loc('l_orderkey')[100:600]
    g = g.reduce('item_rev', name='total')
    plan = g.compile(spark, impls={'total': _dsum_agg})
    return plan.frame('total').select(F.col('value').alias('sliced_revenue'))


@register(
    'graph_slice_positional',
    oracle="""
    SELECT CAST(SUM(n_chars) AS BIGINT) AS sliced_chars, COUNT(*) AS n_docs
    FROM (
        SELECT n_chars,
               ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS pos
        FROM documents
    )
    WHERE pos >= 10 AND pos < 60
    """,
)
def graph_slice_positional(spark, sf_dir):
    """True positional slicing of a Spark-backed dim (by_position parity).

    Compiles to the bucketed two-level rank (SparkColumn._with_position):
    bucket-partitioned row_number windows sort in parallel and the
    bucket-start offsets broadcast — no single-reducer sort of the table,
    so the positional path now scales alongside label slicing (graph.loc,
    the pushdown path).
    """
    docs = table(spark, sf_dir, 'documents')
    g = Graph([('size', 'total')])
    g = g.map({'size': SparkColumn(docs, index=['doc_id'], values='n_chars')})
    g = g.by_position('doc_id')[10:60]
    g = g.reduce('size', name='total')
    # ONE compile with a struct-valued reduce impl: sum and count come out
    # of the same aggregation, so the sliced scan runs exactly once (plan
    # shape pinned by tests/test_plans.py).
    plan = g.compile(
        spark,
        impls={
            'total': lambda c: F.struct(
                F.sum(c).alias('s'), F.count(c).alias('n')
            )
        },
    )
    return plan.frame('total').select(
        F.col('value.s').alias('sliced_chars'),
        F.col('value.n').alias('n_docs'),
    )


@register(
    'graph_pandas_udaf_median',
    oracle="""
    SELECT o_orderstatus AS lab, median(o_totalprice) AS value
    FROM orders GROUP BY o_orderstatus
    """,
)
def graph_pandas_udaf_median(spark, sf_dir):
    """Arbitrary-Python reduce fn through the plan layer (UDAF path).

    cyclebane's downstream consumers attach callables to reduce nodes; the
    compiler's ('pandas_agg', fn) impl runs them per group via
    applyInPandas. Median is builtin-inexpressible exactly; pandas and
    DuckDB interpolate even-count medians identically (mean of the two
    middle doubles). o_orderkey is unique, so the label join is 1:1.
    """
    orders = table(spark, sf_dir, 'orders')
    g = Graph([('price', 'w')])
    g = g.map(
        {
            'price': SparkColumn(
                orders, index=['o_orderkey'], values='o_totalprice'
            ),
            'lab': SparkColumn(
                orders, index=['o_orderkey'], values='o_orderstatus'
            ),
        }
    )
    g = g.groupby('lab').reduce('w', name='median_price')
    plan = g.compile(
        spark,
        impls={'median_price': ('pandas_agg', lambda s: float(s.median()))},
    )
    return plan.frame('median_price')


@register(
    'graph_branch_replacement',
    oracle="""
    SELECT CAST(SUM(CAST(o_totalprice * 1.1 AS DECIMAL(28,6))) AS DOUBLE)
        AS total_after_graft
    FROM orders
    """,
)
def graph_branch_replacement(spark, sf_dir):
    """__setitem__: graft a replacement branch, then execute the new plan.

    Reference semantics graph.py:480-537 — the original branch's exclusive
    ancestors are dropped, the replacement's sink is renamed onto the
    branch node, and downstream consumers see the new data. The original
    branch's source is never scanned in the compiled plan.
    """
    orders = table(spark, sf_dir, 'orders')
    g = Graph([('price', 'adjusted'), ('adjusted', 'total')])
    g = g.map(
        {'price': SparkColumn(orders, index=['o_orderkey'], values='o_totalprice')}
    )

    # replacement branch: same sink name family, marked-up prices
    marked = orders.withColumn(
        'marked_up', F.col('o_totalprice') * 1.1
    )
    repl = Graph([('price2', 'adjusted')])
    repl = repl.map(
        {'price2': SparkColumn(marked, index=['o_orderkey'], values='marked_up')}
    )
    g['adjusted'] = repl
    g = g.reduce('total', name='grand_total')
    plan = g.compile(spark, impls={'grand_total': _dsum_agg})
    return plan.frame('grand_total').select(
        F.col('value').alias('total_after_graft')
    )


@register(
    'graph_branch_graft_sweep',
    oracle="""
    WITH params(dim_2, rate) AS (
        VALUES (0, CAST(0.00 AS DOUBLE)),
               (1, CAST(0.25 AS DOUBLE)),
               (2, CAST(0.50 AS DOUBLE))
    )
    SELECT CAST(dim_2 AS BIGINT) AS dim_2,
           -- quantize the 6-dp-exact taxed price to decimal BEFORE the
           -- sweep multiply, then sweep in DECIMAL arithmetic: taxed_price
           -- is a 6-dp rational (2dp x 2dp x 2dp factors), so its
           -- double->decimal(28,6) cast is exact in both engines, and the
           -- decimal x decimal(3,2) product + sum never leave decimal.
           -- The output stays a DIGIT STRING (the drift_num precedent):
           -- the sweep totals carry 17+ significant digits at sf0.1 —
           -- past double's 15.95 — so a double output would round to
           -- adjacent ulps across engines (COVERAGE.md rule 8)
           CAST(CAST(SUM(
               CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                    AS DECIMAL(28,6))
               * CAST(1 - rate AS DECIMAL(3,2))
           ) AS DECIMAL(38,8)) AS VARCHAR) AS value
    FROM lineitem CROSS JOIN params
    GROUP BY dim_2
    """,
)
def graph_branch_graft_sweep(spark, sf_dir):
    """Branch surgery at pipeline scale: __setitem__ graft on a MAPPED
    multi-dim family, composed with a param-sweep map and chained reduces.

    The existing branch-surgery gates (graph_branch_replacement/_pruning/
    _projection) exercise reference semantics (graph.py:480-537) on 1-D
    dims; this query proves the same surgery composes with the 100 TB
    path: the grafted branch is itself a 2-D lineitem-backed mapped family
    (6M rows/dim-instance at sf1), the sweep dim is mapped AFTER the graft
    (broadcast 3-row side), and the result flows through the two-stage
    chained decimal reduce. Compiled shape: one pruned parquet scan of the
    REPLACEMENT source (the original branch's source is never scanned —
    asserted by tests/test_plans.py), one broadcast cross join, one
    partial+final aggregation pair per reduce stage.
    """
    li = _lineitem_with_id(spark, sf_dir)
    g = Graph([('item', 'adjusted'), ('adjusted', 'swept'), ('rate', 'swept')])
    g = g.map(
        {
            'item': SparkColumn(
                li, index=['l_orderkey', 'l_linenumber'], values='disc_price'
            )
        }
    )

    # graft: replace the branch feeding 'adjusted' with a tax-adjusted
    # mapped family over the same 2-D index — the original 'item' source
    # drops out of the compiled plan entirely
    taxed = li.withColumn(
        'taxed_price', F.col('disc_price') * (1 + F.col('l_tax'))
    )
    repl = Graph([('item2', 'adjusted')])
    repl = repl.map(
        {
            'item2': SparkColumn(
                taxed, index=['l_orderkey', 'l_linenumber'], values='taxed_price'
            )
        }
    )
    g['adjusted'] = repl

    # sweep mapped AFTER the graft: surgery must not disturb dim bookkeeping
    g = g.map({'rate': [0.00, 0.25, 0.50]})
    g = g.reduce('swept', index='l_orderkey', name='per_order')
    g = g.reduce('per_order', index='l_linenumber', name='per_rate')
    plan = g.compile(
        spark,
        impls={
            # quantize BEFORE the sweep multiply and sweep in decimal —
            # taxed_price is a 6-dp rational so the decimal(28,6) cast is
            # exact cross-engine; multiplying the DOUBLE by (1-rate) first
            # would push items to 8 dp, where Spark (shortest-repr) and
            # DuckDB (exact-binary) round the 6-dp quantization apart
            'swept': lambda adjusted, rate: adjusted.cast('decimal(28,6)')
            * (1 - rate).cast('decimal(3,2)'),
            'per_order': lambda c: F.sum(c),
            # exact-decimal digit string out (drift_num precedent): the
            # totals exceed double's 15.95 digits at sf0.1
            'per_rate': lambda c: F.sum(c)
            .cast('decimal(38,8)')
            .cast('string'),
        },
    )
    return plan.frame('per_rate')


@register(
    'graph_branch_pruning',
    oracle="""
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS kept_total
    FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def graph_branch_pruning(spark, sf_dir):
    """__delitem__ removes a branch's exclusive ancestors, keeps the node as
    an unbound placeholder, and the surviving branch still executes.

    Reference: delete clears the subtree feeding only the key and the key's
    data, but the node itself remains (graph.py:463-478); here the pruned
    placeholder gets a fresh impl and the kept mapped branch compiles
    unchanged — its parquet source is scanned, the deleted branch's never.
    """
    cust = table(spark, sf_dir, 'customer')
    building = cust.filter(F.col('c_mktsegment') == 'BUILDING')
    g = Graph(
        [
            ('aux_src', 'aux'),
            ('bal', 'kept'),
            ('kept', 'report'),
            ('aux', 'report'),
        ]
    )
    g = g.map(
        {'bal': SparkColumn(building, index=['c_custkey'], values='c_acctbal')}
    )
    # delete the unmapped aux branch: 'aux_src' (its exclusive ancestor) is
    # removed, 'aux' survives as an unbound placeholder (reference refuses
    # deleting MAPPED nodes — that error is covered by the differential
    # suite)
    del g['aux']
    g = g.reduce('report', name='kept_total')
    plan = g.compile(
        spark,
        impls={
            'aux': 0.0,  # fresh impl for the placeholder source
            'report': lambda kept, aux: kept + aux,
            'kept_total': _dsum_agg,
        },
    )
    return plan.frame('kept_total').select(F.col('value').alias('kept_total'))


@register(
    'graph_branch_projection',
    oracle="""
    SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS branch_total
    FROM orders WHERE o_orderstatus = 'O'
    """,
)
def graph_branch_projection(spark, sf_dir):
    """__getitem__ selects a branch; the other branch is never compiled.

    Reference: branch projection keeps the key + ancestors and drops node
    values outside the branch (graph.py:443-461) — plan-level pruning; the
    pruned branch's tables are never scanned.
    """
    orders = table(spark, sf_dir, 'orders')
    open_orders = orders.filter(F.col('o_orderstatus') == 'O')
    g = Graph(
        [
            ('price_a', 'total_a'),
            ('price_b', 'total_b'),
            ('total_a', 'report'),
            ('total_b', 'report'),
        ]
    )
    g = g.map(
        {
            'price_a': SparkColumn(
                open_orders, index=['o_orderkey'], values='o_totalprice'
            ),
            'price_b': SparkColumn(
                orders, index=['o_orderkey'], values='o_totalprice'
            ),
        }
    )
    branch = g['total_a']  # ancestors of total_a only; price_b dropped
    branch = branch.reduce('price_a', name='total_a_value')
    plan = branch.compile(spark, impls={'total_a_value': _dsum_agg})
    return plan.frame('total_a_value').select(
        F.col('value').alias('branch_total')
    )
