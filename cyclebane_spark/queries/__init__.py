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
# Round 11 build phase (VERDICT r10 #2/#4): dedup_exact_substr gained the
# Lee et al. hot-gram anchor cap; text_unigram_segment /
# text_unigram_train_step took shared-helper edits for the soft trainer —
# all value-identical, flagged per the bright-line rule.
# Round 11 OPTIMIZATION phase: spread()/spread_small became
# scale-ADAPTIVE (tables.spread_small — repartitions only small few-file
# inputs, untouched plan otherwise) and q1 + the graph lineitem loader
# gained the parallelism-restoring spread; every query whose plan flows
# through those helpers is flagged below (results re-verified
# oracle-exact; see OPTIMIZATION_r11.md).
_CHANGED_THIS_ROUND: tuple[str, ...] = (
    # build-phase changes (r10 verdict items)
    'dedup_exact_substr',
    'text_unigram_segment',
    'text_unigram_train_step',
    # optimization: direct spread_small call
    'q1_pricing_summary',
    # optimization: via graph_algebra._lineitem_with_id
    'graph_map_reduce_all',
    'graph_map_reduce_partial',
    'graph_param_sweep_broadcast',
    'graph_slice_loc',
    'graph_branch_graft_sweep',
    # optimization: via dedup.spread (now adaptive) — direct users and
    # everything through _minhash_docs/_minhash_pairs
    'dedup_minhash_lsh',
    'dedup_minhash_lsh_salted',
    'dedup_minhash_lsh_adaptive',
    'dedup_minhash_estimator',
    'dedup_incremental_minhash',
    'dedup_lsh_band_diagnostics',
    'dedup_simhash',
    'dedup_ngram_jaccard',
    'dedup_jaccard_prefix_filter',
    'dedup_containment_pairs',
    'dedup_connected_components',
    'dedup_cluster_representatives',
    'dedup_cc_largestar',
    'dedup_cc_incremental',
    'dedup_recursive_hops',
    'dedup_eval_confusion',
    'dedup_bcubed_eval',
    'graph_pagerank_neardup',
    'graph_triangles_neardup',
    'graph_kcore_peel',
    'graph_label_propagation',
    'pipeline_leakage_safe_split',
    'pipeline_entity_resolution',
    'pipeline_cluster_balanced_sample',
    # optimization batch 2: direct spread_small / spread_cluster adoption
    # (OPTIMIZATION_r11.md batch 2; the three _exsub/_cos_capped consumers
    # and pipeline_entity_resolution already hold slots above/below)
    'q3_shipping_priority',
    'q5_local_supplier_volume',
    'events_sessionization',
    'events_sessionization_sweep',
    'ann_bruteforce_topk',
    'dedup_tf_cosine_capped',
    'dedup_exact_substr_incremental',
    'pipeline_exact_substr_cut',
    'sketch_cms_frequency',
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
    # 1-8: round-6-green staleness backfill (alphabetical prefix of the
    # remaining tail; the rest of the tail was displaced freshest-first
    # by the optimization round's changed-query slots — batch 2 displaced
    # date_functions/distinct_pairs/groupingsets_flag_status/join_anti —
    # and heads the round-12 rotation queue together with the 5 window_*
    # members displaced by the build phase). ann_bruteforce_topk moved
    # from backfill to the changed tier (optimization batch 2) but keeps
    # its slot.
    'ann_bruteforce_topk',
    'ann_ivf_blocked_topk',
    'ann_rp_lsh_topk',
    'argmax_per_group',
    'argmin_cheapest_supplier',
    'array_functions',
    'conditional_agg_shipmodes',
    'count_distinct_exact',
    # 9-13: changed this round (optimization batch 2 — spread_small on
    # the probe side / pre-fan-out clustering; see OPTIMIZATION_r11.md;
    # sketch_cms_frequency displaced cube_flag_status from backfill)
    'sketch_cms_frequency',
    'q3_shipping_priority',
    'q5_local_supplier_volume',
    'events_sessionization',
    'events_sessionization_sweep',
    # 14-17: never-seen (new in round 11's build phase; the first three
    # are also optimization-batch-2 changed)
    'dedup_tf_cosine_capped',
    'dedup_exact_substr_incremental',
    'pipeline_exact_substr_cut',
    'text_unigram_train_soft',
    # 18-50: changed this round (build-phase items first, then the
    # optimization phase's spread_small adoption — see
    # _CHANGED_THIS_ROUND above and OPTIMIZATION_r11.md)
    'dedup_exact_substr',
    'text_unigram_segment',
    'text_unigram_train_step',
    'q1_pricing_summary',
    'graph_map_reduce_all',
    'graph_map_reduce_partial',
    'graph_param_sweep_broadcast',
    'graph_slice_loc',
    'graph_branch_graft_sweep',
    'dedup_minhash_lsh',
    'dedup_minhash_lsh_salted',
    'dedup_minhash_lsh_adaptive',
    'dedup_minhash_estimator',
    'dedup_incremental_minhash',
    'dedup_lsh_band_diagnostics',
    'dedup_simhash',
    'dedup_ngram_jaccard',
    'dedup_jaccard_prefix_filter',
    'dedup_containment_pairs',
    'dedup_connected_components',
    'dedup_cluster_representatives',
    'dedup_cc_largestar',
    'dedup_cc_incremental',
    'dedup_recursive_hops',
    'dedup_eval_confusion',
    'dedup_bcubed_eval',
    'graph_pagerank_neardup',
    'graph_triangles_neardup',
    'graph_kcore_peel',
    'graph_label_propagation',
    'pipeline_leakage_safe_split',
    'pipeline_entity_resolution',
    'pipeline_cluster_balanced_sample',
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
