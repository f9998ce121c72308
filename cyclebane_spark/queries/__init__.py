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
_WINDOW_ROUND = 9

# Queries whose CODE PATH changed this round (including via shared-helper
# edits). The rotation contract (tests/test_priority_window.py) requires
# every one of these to hold a window slot, after any driver-red rows.
# Round 9: late_data_audit (streaming/windows.py) gained the
# replay-ordering diagnostic guard (ADVICE r8) — stream_late_data_audit's
# code path changed (the guard raises only when engine batching behavior
# shifts; green-path semantics identical). ann_ivf_persisted_topk's body
# split into ivf_standing_index + ivf_serve so tools/marginal_bench.py
# can time the serve alone (the merge_from_summaries pattern; semantics
# identical). The code-review pass then extracted late_replay_dir's
# single-file landing writer into the shared write_mtime_ordered_file
# (also used by the IVF ingest landing) — a shared-helper edit that makes
# stream_late_backfill_merge changed too (output byte-identical).
_CHANGED_THIS_ROUND = (
    'stream_late_data_audit',
    'stream_late_backfill_merge',
    'ann_ivf_persisted_topk',
)

# Explicit registry ordering. External correctness gates sample the registry
# in iteration order (each round checks the first 50 entries), so the window
# is rotated per round to retire the stalest driver signal. Rotation rule
# (r4 VERDICT, enforced by tests/test_priority_window.py): driver-red first,
# then changed-since-green, then never-seen, then oldest-green backfill.
# The contract is on window MEMBERSHIP, not position: tiers 1-3 must hold a
# slot somewhere in the first 50; tier-4 backfill must be stalest-first.
# Round-9 rotation: no driver-red rows (r8 was 50/50 green) and no
# changed rows at rotation time; slots 1-44 are the ENTIRE 44-query
# round-4-green staleness tail (the oldest signal left after r8 retired
# the r3 tail), slots 45-50 the alphabetically-first round-5-green
# backfill. New round-9 registrations displace backfill slots (freshest
# last) as they land. Everything below position 50 is driver-green in
# r5-r8 and unchanged since.
_PRIORITY = (
    # 1-43: the round-4-green staleness tail (alphabetical; the 44th,
    # text_vocab_coverage — alphabetically last, i.e. the freshest by the
    # (round, name) backfill order — is displaced by this round's 7
    # required changed/never-seen slots and rotates first in round 10)
    'ann_rp_lsh_multiprobe',
    'basket_brand_rules',
    'dedup_cluster_representatives',
    'dedup_incremental_exact',
    'dedup_incremental_minhash',
    'dedup_jaccard_prefix_filter',
    'dedup_minhash_estimator',
    'dedup_minhash_lsh_adaptive',
    'dedup_semantic_kmeans',
    'embeddings_quantized_norm_arrow',
    'events_ab_test_lift',
    'events_bitmap_distinct_users',
    'events_cdc_asof_snapshot',
    'events_cdc_tombstones',
    'events_cogroup_asof_pandas',
    'events_concurrent_sessions',
    'events_dau_wau_stickiness',
    'events_feature_lags',
    'events_interarrival_stats',
    'events_scd2_dimension',
    'events_snapshot_diff',
    'events_transition_matrix',
    'events_udtf_longest_run',
    'events_value_histogram',
    'multimodal_clip_filter',
    'pipeline_leakage_safe_split',
    'pipeline_rag_rerank',
    'pipeline_seeded_shuffle',
    'pipeline_weighted_upsampling',
    'profile_lineitem_columns',
    'q10_returned_items',
    'q12_priority_by_category',
    'q17_small_quantity_revenue',
    'q4_order_priority',
    'quality_constraint_report',
    'rfm_customer_segments',
    'sample_fixed_k',
    'text_bpe_merge_candidates',
    'text_hashed_features',
    'text_langid_confusion',
    'text_lexical_gini',
    'text_pmi_cooccurrence',
    'text_quality_classifier',
    # 44: changed this round (late_data_audit replay-ordering guard)
    'stream_late_data_audit',
    # 45: changed this round (shared landing-writer extraction)
    'stream_late_backfill_merge',
    # 46-49: never-seen (new in round 9)
    'stream_ivf_ingest',
    'text_html_extract',
    'text_wordpiece_apply',
    'text_unigram_segment',
    # 50: changed this round (standing-index/serve split for the bench)
    'ann_ivf_persisted_topk',
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
