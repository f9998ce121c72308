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

# Queries whose CODE PATH changed this round (including via shared-helper
# edits). The rotation contract (tests/test_priority_window.py) requires
# every one of these to hold a window slot, after any driver-red rows.
# Round 7: the drift gate gained the localCheckpoint'ed histogram and a
# 128-bit-safe string drift_num; every streaming query flows through the
# reworked ownership-verified per-uid scratch dirs (cyclebane_spark.scratch),
# as does the materialized-view snapshot query.
_CHANGED_THIS_ROUND = (
    'ann_ivf_drift_gate',
    'approx_top_k_terms',  # sf1 oracle fix: over-fetch + re-rank (slot 50)
    'multimodal_phash_dedup',  # sf1 oracle fix: 8x8-bit bands, radius 6
    'pipeline_mv_incremental',
    'stream_near_dup_filter',
    'stream_tumbling_hourly',
    'stream_session_windows',
    'stream_sliding_windows',
    'stream_dedup_exact',
    'stream_stateful_counters',
    'stream_view_click_join',
    'stream_cdc_upsert',
    'stream_cdc_tombstones',
    'stream_static_enrich',
)

# Explicit registry ordering. External correctness gates sample the registry
# in iteration order (each round checks the first 50 entries), so the window
# is rotated per round to retire the stalest driver signal. Rotation rule
# (r4 VERDICT, enforced by tests/test_priority_window.py): driver-red first,
# then changed-since-green, then never-seen, then oldest-green backfill.
# Round-7 rotation: no driver-red rows; (a) the 11 changed queries above;
# (b) never-seen new registrations; (c) ALL remaining round-2-green rows —
# the staleness tail VERDICT r6 "Next round #1" retires — then the oldest
# round-3-green rows (alphabetical within a round). Everything below
# position 50 is driver-green in r3-r6 and unchanged since.
_PRIORITY = (
    # 1-12: changed in round 7
    'ann_ivf_drift_gate',
    'pipeline_mv_incremental',
    'stream_near_dup_filter',
    'stream_tumbling_hourly',
    'stream_session_windows',
    'stream_sliding_windows',
    'stream_dedup_exact',
    'stream_stateful_counters',
    'stream_view_click_join',
    'stream_cdc_upsert',
    'stream_cdc_tombstones',
    'stream_static_enrich',
    # 13-14: never-seen (new this round)
    'pipeline_corpus_build',
    'ann_ivf_merge',
    # 15-45: the full remaining round-2-green staleness tail
    'approx_count_distinct_hll',
    'dedup_embedding_cosine',
    'dedup_exact',
    'dedup_ngram_jaccard',
    'dedup_simhash',
    'events_asof_join',
    'events_consecutive_errors',
    'events_funnel_3step',
    'events_gap_fill',
    'events_hourly_agg',
    'events_json_extract',
    'events_multi_grain_rollup',
    'events_pivot_type_counts',
    'events_retention_cohorts',
    'events_sessionization',
    'events_sliding_windows',
    'explode_embedding_components',
    'explode_outer_long_tokens',
    'multimodal_decode_stats',
    'multimodal_image_metadata',
    'pipeline_training_data',
    'text_bpe_token_count',
    'text_chunking',
    'text_fingerprint',
    'text_greedy_packing',
    'text_language_id',
    'text_quality_score',
    'text_sentences_udtf',
    'text_token_count_pandas_udf',
    'text_token_stats',
    'text_zscore_by_lang',
    # 46: changed this round (sf1 tie fix)
    'multimodal_phash_dedup',
    # 47-50: oldest round-3-green backfill (alphabetical; rest next round)
    'ann_ivf_kmeans_nprobe2',
    'ann_ivf_kmeans_topk',
    'ann_pq_adc_topk',
    'approx_top_k_terms',
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
