"""Named query registry — the engine's operator coverage surface.

Every operator from SURVEY.md §2 (and the north-star extensions) registers a
named query here: a ``(spark, sf_dir) -> DataFrame`` callable plus, when the
semantics are SQL-expressible, an equivalent ANSI-SQL oracle that DuckDB runs
on the same parquet tables. ``__spark_entry__.py`` re-exports this registry to
the driver's correctness gate.

Determinism rules for oracle parity (driver hash-compares values):

- alias every computed column identically in Spark and SQL;
- aggregate doubles through ``decimal`` (exact, order-independent) and cast
  the result back to double — see :func:`dsum` — so shuffle/summation order
  can never flip a low bit;
- any top-k / window rank orders by a unique tiebreaker key.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, 'Query'] = {}


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None  # ANSI SQL for the DuckDB oracle; None = rows-only check
    headline: bool = False  # include in bench.py


def register(
    name: str, oracle: str | None = None, headline: bool = False
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f'duplicate query name {name!r}')
        _REGISTRY[name] = Query(name, fn, oracle, headline)
        return fn

    return deco


_MODULES = (
    'relational',
    'relational2',
    'relational3',
    'graph_algebra',
    'text',
    'dedup',
    'similarity',
    'events',
    'streaming_live',
    'multimodal_q',
)

# Explicit registry ordering. External correctness gates sample the registry
# in iteration order (each round checks the first 50 entries), so the window
# is rotated per round to retire the stalest driver signal. Round-6 rotation
# (per VERDICT r5 "Next round #2"): no driver-red and no never-seen rows
# remain, so the window is (a) the three queries whose CODE PATH changed
# this round — the reworked fault-tolerant streaming admission filter, the
# new IVF drift gate, and the containment query whose broadcast-decision
# helper was hardened — then (b) the 44 queries whose newest driver-green
# row still dates from ROUND 1 (unchanged since, re-proved oracle-exact
# locally at three scale factors every session), then (c) the first of the
# 37 round-2-green rows; the 34 remaining r2 rows head next round's
# backfill. Everything below position 50 is driver-green in r3-r5 and
# unchanged since.
_PRIORITY = (
    # 1-3: changed in round 6
    'stream_near_dup_filter',
    'ann_ivf_drift_gate',
    'dedup_containment_pairs',
    # 4-47: oldest driver signal (newest green = round 1)
    'argmax_per_group',
    'argmin_cheapest_supplier',
    'array_functions',
    'conditional_agg_shipmodes',
    'count_distinct_exact',
    'cube_flag_status',
    'date_functions',
    'distinct_pairs',
    'groupingsets_flag_status',
    'join_anti',
    'join_range_band',
    'join_semi',
    'map_functions',
    'percentile_exact',
    'promo_revenue_ratio',
    'q13_customer_distribution',
    'q18_large_volume_customer',
    'q19_disjunctive_predicates',
    'q22_idle_rich_customers',
    'q3_shipping_priority',
    'q5_local_supplier_volume',
    'q6_forecast_revenue',
    'q7_volume_shipping',
    'q8_market_share',
    'q9_product_type_profit',
    'rollup_order_priority',
    'sample_hash_based',
    'sample_stratified',
    'scalar_functions',
    'setop_union_intersect',
    'skew_salted_agg',
    'sql_interface_portable',
    'sql_interface_q10',
    'subquery_correlated_avg',
    'subquery_exists_priority',
    'subquery_scalar_avg',
    'topk_orders',
    'unpivot_lineitem_measures',
    'window_analytics_suite',
    'window_first_last_nth',
    'window_lag_delta',
    'window_nulls_ordering',
    'window_range_frame_trailing',
    'window_running_total',
    # 48-50: round-2-green backfill (alphabetical; rest next round)
    'ann_bruteforce_topk',
    'ann_ivf_blocked_topk',
    'ann_rp_lsh_topk',
)


def _load() -> None:
    for mod in _MODULES:
        importlib.import_module(f'{__name__}.{mod}')


def registry() -> dict[str, Query]:
    _load()
    missing = [n for n in _PRIORITY if n not in _REGISTRY]
    if missing:
        raise RuntimeError(f'_PRIORITY names not registered: {missing}')
    ordered = {n: _REGISTRY[n] for n in _PRIORITY}
    ordered.update((n, q) for n, q in _REGISTRY.items() if n not in ordered)
    return ordered


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in registry().values()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in registry().values() if q.oracle is not None}


def headline_queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in registry().values() if q.headline}
