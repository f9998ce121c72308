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

# The driver round this _PRIORITY window was rotated FOR. The rotation
# contract test evaluates the window against CORRECTNESS files for rounds
# < _WINDOW_ROUND only, so the driver committing round N's results can
# never redden a window that was (correctly) built before they existed.
# Bump this together with every rotation.
_WINDOW_ROUND = 11

# Queries whose CODE PATH changed this round (including via shared-helper
# edits). The rotation contract (tests/test_priority_window.py) requires
# every one of these to hold a window slot, after any driver-red rows.
# Round 11 (VERDICT r10 #2): dedup_exact_substr gained the Lee et al.
# hot-gram anchor cap (df > EXSUB_DF_CAP grams never anchor; gram-count
# agg checkpointed once, broadcast anti join per side) — output
# unchanged at gate SFs (no gram is hot there; asserted in the twin
# test), semantics now carry the stated recall contract.
# text_unigram_segment / text_unigram_train_step: shared-helper edits
# for the soft trainer (VERDICT r10 #4) — _unigram_vocab gained a scale
# param (default = old constant), the prune+requant tail and the SQL
# seed builder were factored out; consumers' plans and oracle text are
# value-identical (re-verified), flagged per the bright-line rule.
_CHANGED_THIS_ROUND: tuple[str, ...] = (
    'dedup_exact_substr',
    'text_unigram_segment',
    'text_unigram_train_step',
)

# Explicit registry ordering. External correctness gates sample the registry
# in iteration order (each round checks the first 50 entries), so the window
# is rotated per round to retire the stalest driver signal. Rotation rule
# (r4 VERDICT, enforced by tests/test_priority_window.py): driver-red first,
# then changed-since-green, then never-seen, then oldest-green backfill.
# The contract is on window MEMBERSHIP, not position: tiers 1-3 must hold a
# slot somewhere in the first 50; tier-4 backfill must be stalest-first.
# Round-11 rotation: no driver-red rows (r10 was 50/50 green). The
# stalest signal is the ENTIRE 48-query round-6-green tail (slots 1-48,
# alphabetical), then the alphabetically-first round-7-green backfill.
# New round-11 registrations and _CHANGED_THIS_ROUND entries displace
# backfill slots from the FRESHEST (round, name) end as they land.
# Everything below position 50 is driver-green in r7-r10 and unchanged
# since.
#
# Window-rotation ENDGAME (standing policy, stated per the r9 verdict):
# every remaining staleness tail (r7 48, r8 47, r9 48, r10 50) exceeds
# what one 50-slot window can absorb alongside required slots. The policy
# stays exactly what the rotation test already enforces — stalest-first
# ACROSS rounds, alphabetical WITHIN a round, required (red/changed/
# never-seen) slots displacing backfill from the freshest end — so each
# round retires a whole alphabetical prefix of the oldest tail and the
# remainder of that tail stays strictly next in line. No per-round
# judgment calls: the (round, name) total order makes the window
# deterministic given the correctness history.
_PRIORITY = (
    # 1-43: the round-6-green staleness tail (alphabetical; its last 5
    # members — window_first_last_nth, window_lag_delta,
    # window_nulls_ordering, window_range_frame_trailing,
    # window_running_total — were displaced freshest-first by this
    # round's 7 required slots and head the round-12 rotation queue)
    'ann_bruteforce_topk',
    'ann_ivf_blocked_topk',
    'ann_rp_lsh_topk',
    'argmax_per_group',
    'argmin_cheapest_supplier',
    'array_functions',
    'conditional_agg_shipmodes',
    'count_distinct_exact',
    'cube_flag_status',
    'date_functions',
    'dedup_containment_pairs',
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
    # 44-47: never-seen (new in round 11: df-capped TF-cosine r10 #3,
    # ExactSubstr span cutter r10 #5, soft-EM unigram trainer r10 #4,
    # incremental ExactSubstr admission)
    'dedup_tf_cosine_capped',
    'dedup_exact_substr_incremental',
    'pipeline_exact_substr_cut',
    'text_unigram_train_soft',
    # 48-50: changed this round (hot-gram anchor cap r10 #2; unigram
    # shared-helper factoring for the soft trainer)
    'dedup_exact_substr',
    'text_unigram_segment',
    'text_unigram_train_step',
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
