"""Spark compiler tests: plan-layer graphs executed as DataFrames.

Each test checks the compiled result against the independently computed
expected values (hand math or pandas), i.e. the same semantics the
expanded graph would produce — without ever expanding.
"""

import networkx as nx
import pandas as pd
import pytest

import cyclebane_spark as cb
import cyclebane_spark.operators.compile  # noqa: F401  (attaches Graph.compile)

import pyspark.sql.functions as F


def rows(df, *cols):
    out = df.select(*cols).collect()
    return sorted(tuple(r) for r in out)


def test_map_reduce_all(spark):
    graph = cb.Graph(nx.DiGraph([('a', 'b')])).map({'a': [1, 2, 3]})
    graph = graph.reduce('b', name='total')
    plan = graph.compile(
        spark, impls={'b': lambda a: a * 10, 'total': 'sum'}
    )
    assert plan['total'].collect()[0][0] == 60


def test_map_partial_reduce_keeps_dim(spark):
    g = nx.DiGraph([('a', 'c'), ('x', 'c')])
    graph = cb.Graph(g).map({'a': [1, 2, 3]}).map({'x': [10, 20]})
    graph = graph.reduce('c', name='r', index='dim_0')
    plan = graph.compile(spark, impls={'c': lambda a, x: a + x, 'r': 'sum'})
    # r(dim_1=j) = sum_i (a_i + x_j) = 6 + 3*x_j
    assert rows(plan['r'], plan.dim_column('dim_1'), 'value') == [
        (0, 36),
        (1, 66),
    ]


def test_joint_map_aligns_on_shared_dim(spark):
    g = nx.DiGraph([('a', 'c'), ('b', 'c')])
    graph = cb.Graph(g).map(pd.DataFrame({'a': [1, 2], 'b': [10, 20]}))
    graph = graph.reduce('c', name='out', index='dim_0')
    plan = graph.compile(spark, impls={'c': lambda a, b: a * b, 'out': 'sum'})
    # joint map: 1*10 + 2*20 = 50 (not a cross product)
    assert plan['out'].collect()[0][0] == 50


def test_groupby_reduce(spark):
    df = pd.DataFrame({'a': [1.0, 2.0, 3.0, 4.0], 'band': ['lo', 'lo', 'hi', 'hi']})
    graph = cb.Graph(nx.DiGraph([('a', 'b')])).map(df)
    graph = graph.groupby('band').reduce('b', name='per_band')
    plan = graph.compile(
        spark, impls={'b': lambda a: a + 1, 'per_band': 'sum'}
    )
    assert rows(plan['per_band'], plan.dim_column('band'), 'value') == [
        ('hi', 9.0),
        ('lo', 5.0),
    ]


def test_2d_numpy_reduce_axis(spark):
    import numpy as np

    graph = cb.Graph(nx.DiGraph([('a', 'b')])).map(
        {'a': np.array([[1, 2, 3], [4, 5, 6]])}
    )
    graph = graph.reduce('b', name='row_sum', index='dim_1')
    plan = graph.compile(spark, impls={'row_sum': 'sum'})
    assert rows(plan['row_sum'], plan.dim_column('dim_0'), 'value') == [
        (0, 6),
        (1, 15),
    ]


def test_persist_shared_caches_fanout_node(spark):
    """A node feeding two children is planned once per consumer (Spark has
    no subplan sharing); persist_shared=True materializes it instead."""
    g = nx.DiGraph([('a', 'b'), ('b', 'c'), ('b', 'd')])
    graph = cb.Graph(g).map({'a': [1, 2, 3]})
    impls = {
        'b': lambda a: a * 10,
        'c': lambda b: b + 1,
        'd': lambda b: b + 2,
    }
    plan = graph.compile(spark, impls=impls, persist_shared=True)
    c_rows = rows(plan['c'], 'value')
    d_rows = rows(plan['d'], 'value')
    assert c_rows == [(11,), (21,), (31,)]
    assert d_rows == [(12,), (22,), (32,)]
    # the shared frame really is storage-backed
    assert plan.frame('b').storageLevel.useMemory
    plan.frame('b').unpersist()
    # default stays unpersisted
    plan2 = graph.compile(spark, impls=impls)
    assert not plan2.frame('b').storageLevel.useMemory


def test_spark_column_source_scales_without_expansion(spark, sf_dir):
    """A node family backed by a parquet table: reduce = groupBy, no expansion."""
    li = spark.read.parquet(f'{sf_dir}/lineitem.parquet')
    qty = cb.SparkColumn(
        li, index=['l_orderkey', 'l_linenumber'], values='l_quantity'
    )
    graph = cb.Graph(nx.DiGraph([('qty', 'scaled')])).map({'qty': qty})
    graph = graph.reduce('scaled', name='total', index='l_linenumber')
    plan = graph.compile(
        spark, impls={'scaled': lambda q: q * 2, 'total': 'sum'}
    )
    got = plan['total']
    expected = (
        li.groupBy('l_orderkey')
        .agg((F.sum('l_quantity') * 2).alias('v'))
    )
    key = plan.dim_column('l_orderkey')
    diff = (
        got.join(expected, got[key] == expected.l_orderkey)
        .where(F.abs(got['value'] - expected['v']) > 1e-9)
        .count()
    )
    assert diff == 0
    assert got.count() == li.select('l_orderkey').distinct().count()


def test_spark_groups_label_join(spark, sf_dir):
    """groupby over a Spark-backed label column compiles to join+groupBy."""
    cust = spark.read.parquet(f'{sf_dir}/customer.parquet')
    bal = cb.SparkColumn(cust, index=['c_custkey'], values='c_acctbal')
    seg = cb.SparkColumn(cust, index=['c_custkey'], values='c_mktsegment')
    graph = cb.Graph(nx.DiGraph([('bal', 'score')])).map({'bal': bal, 'seg': seg})
    graph = graph.groupby('seg').reduce('score', name='by_segment')
    plan = graph.compile(spark, impls={'score': lambda b: b, 'by_segment': 'sum'})
    got = {r[0]: r[1] for r in plan['by_segment'].collect()}
    expected = {
        r[0]: r[1]
        for r in cust.groupBy('c_mktsegment').agg(F.sum('c_acctbal')).collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        assert abs(got[k] - expected[k]) < 1e-6


def test_compiled_plan_prunes_and_pushes_down(spark, sf_dir):
    """Label-sliced SparkColumn reaches the parquet scan as a pushed filter."""
    li = spark.read.parquet(f'{sf_dir}/lineitem.parquet')
    qty = cb.SparkColumn(li, index=['l_orderkey'], values='l_quantity')
    sliced = qty.islice({'l_orderkey': slice(0, 100)})
    graph = cb.Graph(nx.DiGraph([('qty', 'out')])).map({'qty': sliced})
    graph = graph.reduce('out', name='total')
    plan = graph.compile(spark, impls={'total': 'sum'})
    explained = plan['total']._jdf.queryExecution().executedPlan().toString()
    assert 'PushedFilters' in explained
    assert 'l_orderkey' in explained
