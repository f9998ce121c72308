"""Physical-plan assertions: the plans we want at 100 TB, guarded against
regression. A query that silently loses predicate pushdown or a broadcast
still passes correctness tests — these tests fail instead."""

import re

import pytest

from cyclebane_spark.queries import queries

SF_DIR = '/root/testdata/sf0.001'


def plan_of(spark, name: str) -> str:
    import contextlib
    import io

    df = queries()[name](spark, SF_DIR)
    # formatted explain prints the full PushedFilters list (toString truncates)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain('formatted')
    return buf.getvalue()


def raw_plan_of(spark, name: str) -> str:
    """Tree-only plan string — operators appear exactly once (for counts)."""
    df = queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filter_pushdown_and_no_shuffle_groupby(spark):
    plan = plan_of(spark, 'q6_forecast_revenue')
    # all three predicates reach the parquet scan
    assert 'PushedFilters:' in plan
    assert 'GreaterThanOrEqual(l_shipdate' in plan
    assert 'GreaterThanOrEqual(l_discount' in plan
    assert 'LessThan(l_quantity' in plan
    # global agg: partial+final, single exchange
    assert raw_plan_of(spark, 'q6_forecast_revenue').count('Exchange') == 1


def test_q6_reads_only_needed_columns(spark):
    plan = plan_of(spark, 'q6_forecast_revenue')
    m = re.search(r'ReadSchema: ([^\n]+)', plan)
    assert m, plan
    read = m.group(1)
    assert 'l_extendedprice' in read and 'l_discount' in read
    # pruned: the untouched wide columns never leave the scan
    for col in ('l_returnflag', 'l_linestatus', 'l_orderkey', 'l_partkey'):
        assert col not in read


def test_q3_broadcasts_dimensions(spark):
    plan = plan_of(spark, 'q3_shipping_priority')
    assert 'BroadcastHashJoin' in plan
    # top-k is TakeOrderedAndProject, not a global sort
    assert 'TakeOrderedAndProject' in plan
    assert 'Sort [revenue' not in plan


def test_q5_broadcasts_region_nation(spark):
    plan = plan_of(spark, 'q5_local_supplier_volume')
    assert plan.count('BroadcastHashJoin') >= 2


def test_q1_partial_aggregation(spark):
    plan = plan_of(spark, 'q1_pricing_summary')
    assert 'partial_sum' in plan  # map-side combine before the shuffle
    assert raw_plan_of(spark, 'q1_pricing_summary').count('Exchange') == 1


def test_semi_join_stays_semi(spark):
    plan = plan_of(spark, 'join_semi')
    assert 'LeftSemi' in plan


def test_graph_slice_loc_pushes_range_predicate(spark):
    plan = plan_of(spark, 'graph_slice_loc')
    assert 'GreaterThanOrEqual(l_orderkey,100)' in plan
    assert 'LessThan(l_orderkey,600)' in plan


def test_graph_param_sweep_broadcasts_param_dim(spark):
    plan = plan_of(spark, 'graph_param_sweep_broadcast')
    # the 3-row param dim is broadcast, never shuffled
    assert 'BroadcastNestedLoopJoin' in plan or 'BroadcastExchange' in plan


def test_ann_bruteforce_broadcasts_queries(spark):
    plan = plan_of(spark, 'ann_bruteforce_topk')
    assert 'BroadcastNestedLoopJoin' in plan


def test_pivot_single_pass(spark):
    plan = raw_plan_of(spark, 'events_pivot_type_counts')
    # explicit value list -> one aggregation pass, no values-discovery job
    assert plan.count('Exchange') <= 2


def test_minhash_heavy_compute_stays_above_the_exchange(spark):
    """Regression for the filter-pushdown trap: no shingle/md5 expression may
    appear in the scan's DataFilters, and the signature projection must sit
    ABOVE the repartition exchange — otherwise the whole per-doc compute
    collapses into the single pre-shuffle scan task."""
    plan = plan_of(spark, 'dedup_minhash_lsh')
    scan = plan.split('Scan parquet', 1)[1].split('(2)', 1)[0]
    assert 'transform' not in scan and 'md5' not in scan, scan
    # exactly one row-group scan feeding a repartition, projections above it
    assert 'REPARTITION_BY_NUM' in plan


def test_connected_components_converges_and_broadcasts_labels(spark):
    # CC is iterative; just assert the result frame exists and is resolvable
    df = queries()['dedup_connected_components'](spark, SF_DIR)
    rows = df.count()
    docs = spark.read.parquet(f'{SF_DIR}/documents.parquet').count()
    assert rows == docs  # every document labeled exactly once
