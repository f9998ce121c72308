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
    # optimization batch 3 (resumed session; OPTIMIZATION_r11.md batch 3):
    # the text_decontamination restructure (one gram pass instead of
    # three), the embedding-cosine probe spread (pipeline_embedding_
    # clusters composes it), and the measured-kept spread_small adoptions
    'text_decontamination',
    'dedup_embedding_cosine',
    'pipeline_embedding_clusters',
    'ann_pq_adc_topk',
    'percentile_exact',
    'profile_lineitem_columns',
    'q18_large_volume_customer',
    'q20_dominant_part_suppliers',
    'q21_sole_returning_supplier',
    'stats_exact_moments',
    'basket_brand_rules',
    'text_pmi_cooccurrence',
    'text_gopher_repetition',
    'text_tfidf_top_terms',
    'quality_source_overlap',
    'quality_source_overlap_hll',
)

# Explicit registry ordering. External correctness gates sample the registry
# in iteration order (each round checks the first 50 entries), so the window
# is rotated per round to retire the stalest driver signal. Rotation rule
# (r4 VERDICT, enforced by tests/test_priority_window.py): driver-red first,
# then changed-since-green, then never-seen, then oldest-green backfill.
# The contract is on window MEMBERSHIP, not position: tiers 1-3 must hold a
# slot somewhere in the first 50; tier-4 backfill must be stalest-first.
# Round-11 rotation (final, after the optimization round's batch 3): no
# driver-red rows (r10 was 50/50 green). The optimization round changed
# more query paths than one window can hold: required tiers 2-3 total 59
# (55 changed + 4 never-seen) against 50 slots. Standing policy extension
# (same (round, name) total order, enforced by the amended contract test):
# when required entries alone exceed the window, the window holds ONLY
# required entries — no backfill may squat while a required row waits —
# and the required entries with the STALEST newest-green driver signal
# (never-seen rank 0, then (round, name) ascending) take the slots; the
# overflow (here the nine r10-green changed rows: graph_label_propagation,
# pipeline_cluster_balanced_sample, pipeline_entity_resolution,
# q1_pricing_summary, quality_source_overlap, quality_source_overlap_hll,
# sketch_cms_frequency, text_unigram_segment, text_unigram_train_step)
# stays tier-2 "changed-since-green" and MUST head the round-12 window.
# Every overflow row was verified oracle-exact locally this round
# (OPTIMIZATION_r11.md), and the driver's full-registry regression check
# covers all 245 regardless of the window. The displaced r6 backfill tail
# (ann_ivf_blocked_topk .. count_distinct_exact) rejoins the staleness
# queue behind the overflow.
_PRIORITY = (
    # never-seen (round-11 build registrations; rank 0)
    'dedup_exact_substr_incremental',
    'dedup_tf_cosine_capped',
    'pipeline_exact_substr_cut',
    'text_unigram_train_soft',
    # changed this round, newest driver green r6
    'ann_bruteforce_topk',
    'dedup_containment_pairs',
    'percentile_exact',
    'q18_large_volume_customer',
    'q3_shipping_priority',
    'q5_local_supplier_volume',
    # r7
    'ann_pq_adc_topk',
    'dedup_embedding_cosine',
    'dedup_ngram_jaccard',
    'dedup_simhash',
    'events_sessionization',
    # r8
    'dedup_connected_components',
    'dedup_minhash_lsh',
    'dedup_minhash_lsh_salted',
    'graph_branch_graft_sweep',
    'graph_map_reduce_all',
    'graph_map_reduce_partial',
    'graph_pagerank_neardup',
    'graph_param_sweep_broadcast',
    'graph_slice_loc',
    'graph_triangles_neardup',
    'pipeline_embedding_clusters',
    'q20_dominant_part_suppliers',
    'q21_sole_returning_supplier',
    'stats_exact_moments',
    'text_decontamination',
    'text_gopher_repetition',
    'text_tfidf_top_terms',
    # r9
    'basket_brand_rules',
    'dedup_cluster_representatives',
    'dedup_incremental_minhash',
    'dedup_jaccard_prefix_filter',
    'dedup_minhash_estimator',
    'dedup_minhash_lsh_adaptive',
    'pipeline_leakage_safe_split',
    'profile_lineitem_columns',
    'text_pmi_cooccurrence',
    # r10 (alphabetical prefix; the rest is the documented overflow)
    'dedup_bcubed_eval',
    'dedup_cc_incremental',
    'dedup_cc_largestar',
    'dedup_eval_confusion',
    'dedup_exact_substr',
    'dedup_lsh_band_diagnostics',
    'dedup_recursive_hops',
    'events_sessionization_sweep',
    'graph_kcore_peel',
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
