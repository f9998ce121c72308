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
_WINDOW_ROUND = 8

# Queries whose CODE PATH changed this round (including via shared-helper
# edits). The rotation contract (tests/test_priority_window.py) requires
# every one of these to hold a window slot, after any driver-red rows.
# Round 8: ann_ivf_merge's body moved into merge_from_summaries so the
# marginal-cost bench (tools/marginal_bench.py) can time the merge alone;
# stream_late_data_audit's replay helper (late_replay_dir) gained the
# straggler_extra/variant parameters for the backfill query (default
# behavior identical, but a shared-helper edit counts);
# text_bpe_train_iterative's merge loop moved into the shared
# _bpe_merge_rounds helper (now also the apply codec's implementation).
# The new round-8 registrations are tier-3 never-seen rather than
# changed.
# (The bench-config broadcast-threshold change is harness-only — query
# code paths and oracle semantics untouched; driver correctness sessions
# are the driver's own.)
_CHANGED_THIS_ROUND = (
    'ann_ivf_merge',
    'stream_late_data_audit',
    'text_bpe_train_iterative',
)

# Explicit registry ordering. External correctness gates sample the registry
# in iteration order (each round checks the first 50 entries), so the window
# is rotated per round to retire the stalest driver signal. Rotation rule
# (r4 VERDICT, enforced by tests/test_priority_window.py): driver-red first,
# then changed-since-green, then never-seen, then oldest-green backfill.
# The contract is on window MEMBERSHIP, not position: tiers 1-3 must hold a
# slot somewhere in the first 50; tier-4 backfill must be stalest-first.
# Round-8 rotation: no driver-red rows (r7 was 50/50 green); slots 1-2
# hold the changed ann_ivf_merge and text_bpe_train_iterative, slots 3-7
# the five never-seen round-8 registrations (one of which,
# stream_late_data_audit, is also changed);
# the rest is the ENTIRE 41-query round-3-green staleness tail (the
# oldest signal left after r7 retired the r2 tail) plus the 2
# alphabetically-first round-4-green rows. Everything below position 50
# is driver-green in r4-r7 and unchanged since.
_PRIORITY = (
    # 1-2: changed in round 8 (not also never-seen)
    'ann_ivf_merge',
    'text_bpe_train_iterative',
    # 3-7: never-seen (new in round 8; stream_late_data_audit is also in
    # the changed tier via its replay-helper edit)
    'graph_branch_graft_sweep',
    'stream_late_data_audit',
    'stream_late_backfill_merge',
    'text_bpe_apply',
    'ann_ivf_persisted_topk',
    # 8-48: the full round-3-green staleness tail (alphabetical)
    'approx_percentile_bounds',
    'dedup_connected_components',
    'dedup_minhash_lsh',
    'dedup_minhash_lsh_salted',
    'events_anomaly_robust_z',
    'events_cdc_compaction',
    'events_variant_extract',
    'graph_branch_projection',
    'graph_branch_pruning',
    'graph_branch_replacement',
    'graph_groupby_reduce',
    'graph_map_reduce_all',
    'graph_map_reduce_partial',
    'graph_pagerank_neardup',
    'graph_pandas_udaf_median',
    'graph_param_sweep_broadcast',
    'graph_slice_loc',
    'graph_triangles_neardup',
    'multimodal_audio_features',
    'multimodal_frame_sample',
    'multimodal_resize_pixels',
    'pipeline_clean_corpus',
    'pipeline_embedding_clusters',
    'pipeline_rag_retrieval',
    'q11_important_parts',
    'q15_top_supplier',
    'q16_supplier_part_counts',
    'q20_dominant_part_suppliers',
    'q21_sole_returning_supplier',
    'q2_min_cost_supplier',
    'sketch_merge_hll',
    'sql_lateral_topk_nations',
    'stats_exact_moments',
    'text_decontamination',
    'text_gopher_repetition',
    'text_importance_sampling',
    'text_packing_two_level',
    'text_pii_redaction',
    'text_span_dedup',
    'text_tfidf_top_terms',
    'text_typo_candidates',
    # 49-50: oldest round-4-green backfill (alphabetical; rest next round)
    'ann_filtered_topk',
    'ann_ivfpq_topk',
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
