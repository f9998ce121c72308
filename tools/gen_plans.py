#!/usr/bin/env python
"""Regenerate PLANS.md: the physical plans of the headline queries, compacted.

Run from the repo root: ``python tools/gen_plans.py``. The output is a
reviewed artifact — the plans we WANT at 100 TB (see README "Scale design");
tests/test_plans.py pins the load-bearing properties so they can't regress
silently.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = '/root/testdata/sf0.001'

NOTES = {
    'q1_pricing_summary': [
        'one Exchange total: partial (map-side) + final hash aggregate',
        'scan reads only the 7 referenced columns (ReadSchema)',
    ],
    'q6_forecast_revenue': [
        'all three predicates pushed to the parquet scan (PushedFilters)',
        'global agg: partial per split, single-row final',
    ],
    'q3_shipping_priority': [
        'shuffle joins on the join keys (customer is NOT broadcastable at',
        '100 TB; AQE upgrades to broadcast at runtime when the filtered side',
        'turns out small — shown here with auto-broadcast off)',
        'TakeOrderedAndProject for the top-k, never a full sort',
    ],
    'q5_local_supplier_volume': [
        'region/nation broadcast chain collapses the snowflake lookups',
        'single shuffle keyed on the final groupBy',
    ],
    'graph_param_sweep_broadcast': [
        'the 3-row param dim is BroadcastNestedLoopJoin — the compact',
        'MappedNode family never materializes a cartesian on disk',
    ],
    'dedup_minhash_lsh': [
        'signatures are one narrow projection ABOVE the repartition',
        '(no shingle explode, no signature shuffle, no scan-level compute)',
        'only shuffles: bucket groupBy + pair distinct, both ~#docs sized',
    ],
    'ann_bruteforce_topk': [
        'query vectors broadcast; corpus scanned once, never shuffled',
        'per-query top-k via window rank on the scored stream',
    ],
    'events_sessionization': [
        'one shuffle on user_id; session assembly is a window cumsum,',
        'the batch statement of the streaming session_window operator',
    ],
    'q19_disjunctive_predicates': [
        'brand/size conjuncts extracted from the OR land in PushedFilters;',
        'the residual cross-table disjunction evaluates post-join in codegen',
    ],
    'q15_top_supplier': [
        'scalar max is a one-row BroadcastExchange joined back — no global',
        'sort, no TakeOrdered; ties kept exactly',
    ],
    'events_gap_fill': [
        'dense grid generated executor-side (sequence+explode per user);',
        'forward fill is one sorted window pass per user partition',
    ],
    'events_multi_grain_rollup': [
        'GROUPING SETS expands map-side (Expand) — one scan, one exchange',
        'for hour+day+total simultaneously',
    ],
    'text_tfidf_top_terms': [
        'ONE corpus tokenization: df rides on tf via a term-partition window',
        '(no tf-join-df diamond); rank window partitions by doc only',
    ],
    'events_funnel_3step': [
        'ordered funnel in one shuffle: chained running-min windows prove',
        'stage order row-locally, no self-joins',
    ],
    'window_analytics_suite': [
        'all four analytic functions share one window spec: a single',
        'Exchange and a single Sort evaluate ntile/percent_rank/cume_dist/',
        'dense_rank in one pass',
    ],
    'subquery_scalar_avg': [
        'the 1-row global average is a BroadcastExchange cross-joined in —',
        'one lazy plan, no driver collect barrier; aggregate arm prunes to',
        'p_size only',
    ],
    'graph_slice_positional': [
        'bucketed two-level rank: row_number windows PARTITION by bucket',
        '(parallel sorts), bucket-start offsets broadcast — no single-',
        'reducer sort; sum+count still one struct-valued aggregate',
    ],
    'dedup_minhash_lsh_salted': [
        'salt-pair (ga, gb) is part of the join key: a hot boilerplate',
        'bucket spreads over n_salt*(n_salt+1)/2 shuffle partitions instead',
        'of one quadratic task',
    ],
    'ann_ivf_kmeans_topk': [
        'both Lloyd iterations in ONE lazy plan (no per-iteration driver',
        'action); K x DIM centroid sides BroadcastExchange into every',
        'assignment join; integer distances keep the whole loop in codegen',
    ],
    'text_gopher_repetition': [
        'both gram aggregations carry doc_id in the shuffle key and combine',
        'map-side; final join co-partitions on doc_id',
    ],
    'text_decontamination': [
        'benchmark gram side broadcast — the corpus side never shuffles for',
        'the overlap join; per-doc counts partial-aggregate on doc_id',
    ],
    'ann_pq_adc_topk': [
        'all 16 subspace codebooks train in one grouped plan (sub is a',
        'column); the Q x M x K query distance table broadcasts into the',
        'codes scan — raw vectors never re-read after encoding',
    ],
    'graph_pagerank_neardup': [
        'each iteration: one shuffle keyed on the destination node with',
        'map-side partial sums; the node-count scalar is a 1-row broadcast;',
        'integer arithmetic keeps every step in codegen',
    ],
    'text_packing_two_level': [
        'level-1 cumsum window partitions BY SHARD (parallel, no global',
        'sort); level-2 orders only the per-shard remainder bins —',
        'constant-size at any corpus scale',
    ],
    'q2_min_cost_supplier': [
        'region/nation/candidate dims broadcast into the lineitem scan;',
        'per-pair and per-part MINs are partial-aggregable hash aggs on the',
        'same keys (exchange reuse under AQE)',
    ],
    'text_span_dedup': [
        'first-occurrence winner per span is an argmin HASH AGG on the span',
        'hash (partial-aggregable, no window); reassembly sorts spans',
        'in-executor per doc — three span-sized shuffles end to end',
    ],
    'ann_ivfpq_topk': [
        'coarse cells + PQ-on-residuals compose: candidates come from an',
        'equi-join on the probed cell id, distances from the broadcast',
        'Q x M x K residual table — raw vectors never re-read at search',
    ],
    'dedup_minhash_lsh_adaptive': [
        'bands persist once; the bucket-histogram stats job picks the',
        'branch at runtime — on the organic gate corpus the plan below IS',
        'the unsalted join (no ga/gb salt columns, no replication)',
    ],
    'text_hashed_features': [
        'one explode, ONE exchange: signed counts partial-aggregate',
        'map-side on (doc_id, feature) — the vocabulary-free vectorizer',
    ],
    'pipeline_leakage_safe_split': [
        'CC labels arrive from checkpointed per-round plans (lineage',
        'truncated); the split itself is a pure projection on the label —',
        'no extra shuffle beyond the dedup pipeline that already ran',
    ],
    'text_pmi_cooccurrence': [
        'the df-floor table broadcasts into the (doc, term) stream BEFORE',
        'the pair join, so the quadratic stage only ever sees frequent',
        'terms; the pair join is doc-blocked (equi-join on doc_id)',
    ],
    'text_quality_classifier': [
        'the linear model is an expression, not a join: explode + ONE',
        'map-side-combinable hash agg per doc — single-pass scoring',
    ],
    'pipeline_seeded_shuffle': [
        'no global sort: shard is a stateless hash expression and the',
        'in-shard position window PARTITIONS by shard (64 parallel sorts)',
    ],
    'q10_returned_items': [
        'quarter + return-flag predicates reach both parquet scans;',
        'nation broadcasts; top-20 is TakeOrderedAndProject',
    ],
    'quality_constraint_report': [
        'three column checks fan out of ONE 1-row aggregate (no re-scan',
        'per constraint); referential integrity is a single anti-join',
    ],
    'dedup_incremental_exact': [
        'hash-keyed probe join: uniform by construction, no skew; the',
        'corpus side distincts once (bucketed fingerprint table at scale)',
    ],
    'ann_filtered_topk': [
        'label predicate lands in PushedFilters (partition pruning at',
        'scale); query side broadcasts, corpus never shuffles',
    ],
    'rfm_customer_segments': [
        'one custkey shuffle; anchor date is a 1-row broadcast; the',
        'segment rollup collapses to <=27 groups map-side',
    ],
    'pipeline_tokenize_to_ids': [
        'encode pass is broadcast-map + projection — no per-token join,',
        'no corpus explode; vocab = TakeOrderedAndProject to V rows',
    ],
    'dedup_jaccard_prefix_filter': [
        'only the rarest-first PREFIX of each doc is indexed — the hot',
        'stop-shingle posting lists (the skew) never enter the pair join;',
        'verification joins fixed-width per-doc arrays on candidates only',
    ],
    'events_scd2_dimension': [
        'change-detect lag and interval-stitch lead/row_number share ONE',
        'user_id Exchange + Sort (Catalyst reuses the window partitioning)',
    ],
    'dedup_semantic_kmeans': [
        'pair-gen is an equi-join on the cell id — quadratic bounded by',
        'cell size (K scales with N); component join only on in-cell pairs',
    ],
    'basket_brand_rules': [
        'self-join keyed on the order: fan-out capped by basket size;',
        'pair counts partial-agg; singles + total broadcast into the rules',
    ],
    'events_feature_lags': [
        'daily aggregate, lag and rolling frame all ride ONE user_id',
        'Exchange; frames are ROWS-bounded O(1) per row',
    ],
}

# Non-headline queries whose plan shape is load-bearing enough to publish.
NOTES['q14_promo_revenue'] = [
    'month predicates pushed to the lineitem scan; part dim broadcast',
    'both CASE arms fold into ONE partial aggregate — single-row result,',
    'zero sorts',
]
NOTES['text_bigram_lm_score'] = [
    'model (gram -> inv-probability) and 1-row vocab size BROADCAST into',
    'the scoring pass — the corpus bigram stream is never sort-merge-joined',
    'per-doc partial aggregation collapses each doc map-side; the only',
    'corpus-sized exchange keys on doc_id',
]
NOTES['dedup_tf_cosine_pairs'] = [
    'inverted-index pair partials combine map-side (partial+final',
    'HashAggregate on (doc_a, doc_b))',
    'top-25 via TakeOrderedAndProject — never a global sort of all pairs',
]

NOTES['dedup_recursive_hops'] = [
    'Spark-executed WITH RECURSIVE: UnionLoop/UnionLoopRef nodes, frontier',
    'join stays a hash join; corpus-sized work (signatures, banding) runs',
    'once, before the recursion',
]

NOTES['join_bloom_prefilter'] = [
    'hand-built Bloom runtime filter: 3 broadcast word-table probes + the',
    'exact semi-join = 4 BroadcastHashJoins; the fact stream shuffles only',
    'for the final aggregation',
    'filter materialized once via localCheckpoint (appears as an RDD scan)',
]

NOTES['events_skew_profile'] = [
    'two-level aggregation, both with map-side partials; no joins',
]

NOTES['dedup_lsh_band_diagnostics'] = [
    'aggregation-only pipeline — strictly cheaper than the pair join it',
    'instruments',
]

NOTES['ann_ivf_drift_gate'] = [
    'DECISION plan only: the k-means training/assignment subtree ran ONCE',
    'at the eager localCheckpoint of the K-row occupancy histogram (r6',
    'showed it three times, once per consuming job) — both the 1-row',
    'totals and the final aggregate read the checkpointed ExistingRDD',
    'the only NLJ is the 1-row totals broadcast (IdentityBroadcastMode);',
    'retrain arithmetic stays decimal(38,0) so 1e12-row count products',
    'cannot overflow; drift_num surfaces as its decimal digit string',
    'upstream (pinned separately in test_plans.py): partial_count',
    'histograms, % 10 holdout filter reaching the cached component scan,',
    'WindowGroupLimit top-1 per vector, no CartesianProduct',
]

NOTES['ann_ivf_merge'] = [
    'decision plan touches ONLY checkpointed K x DIM index summaries',
    '(ExistingRDD scans) — each shard Lloyd loop ran exactly once at its',
    'eager localCheckpoint; corpus parquet never appears here',
    'cell pairing broadcasts shard-A centroids (K x DIM rows); the',
    'occupancy-weighted fold is one union + one (cl, pos) hash aggregate',
    'in decimal(38,0) — O(K^2 x DIM) total, corpus-size-independent',
]

NOTES['graph_branch_graft_sweep'] = [
    'branch surgery compiled away: ONE parquet scan — the grafted',
    'replacement family only (l_tax/l_extendedprice/l_discount/',
    'l_linenumber; the original branch source AND the reduced-away',
    'l_orderkey are gone) — the 3-row sweep dim rides a broadcast NLJ,',
    'then two chained partial+final aggregate pairs (two exchanges);',
    'the sweep multiply runs in decimal so the digit-string output is',
    'bit-exact at every SF',
]

NOTES['text_bpe_apply'] = [
    'train->apply in one plan: merge rounds touch |V|-row vocab subtrees',
    '(3-row argmax sides broadcast); the (token -> n_symbols) codec',
    'BROADCASTS against the corpus token stream — corpus never shuffles',
    'until the final per-doc aggregate (partial+final, keyed on doc_id)',
]

NOTES['ann_ivf_persisted_topk'] = [
    'the serving scan reads the CELL-PARTITIONED standing index with a',
    'dynamic partition-pruning subquery on cl (the broadcast probed-cell',
    'set): nprobe/K of the index bytes by layout, never a post-scan',
    'filter; probe + query-component joins broadcast — no SMJ in the',
    'serving subtree (training subtree above is the oracle-parity cost,',
    'as with the other lifecycle queries)',
]

NOTES['stream_ivf_ingest'] = [
    'streaming foreachBatch ingest into the persisted cell-partitioned',
    'index: each micro-batch assigns against BROADCAST standing centroids',
    '(batch-proportional) and dynamic-partition-OVERWRITES only its own',
    '(cl, ingest_batch) subpartitions — replay-idempotent by layout; the',
    'pinned plan is the post-ingest serve: DPP on cl, broadcast probe and',
    'query joins, no SMJ (identical shape to ann_ivf_persisted_topk)',
]

NOTES['text_html_extract'] = [
    'map-mostly boilerplate extraction: unrolled per-doc HTML generation',
    '(no shuffle), narrow block explode, JVM-codegen regex/string ops,',
    'integer link-density decision; the ONE exchange is the doc_id-keyed',
    'final aggregate — scan pruned to (doc_id, text)',
]

NOTES['text_wordpiece_apply'] = [
    'dictionary-trick tokenization: the matcher runs on DISTINCT words',
    '(bounded) in unrolled rounds of per-length broadcast LEFT joins',
    '(COALESCE longest-first = leftmost-longest argmax, no window); the',
    '(word -> n_tokens) dictionary then BROADCASTS onto the corpus token',
    'stream — one equi-join + one doc_id-keyed partial-agg shuffle, the',
    'text_bpe_apply scale shape',
]

NOTES['text_unigram_segment'] = [
    'relational Viterbi: per-position DP frames over the distinct-word',
    'dictionary, candidates from broadcast piece lookups, argmax by the',
    'exact length-normalized integer product of quantized probabilities;',
    'each dp round localCheckpoints (dictionary-sized) so the plan stays',
    'linear in rounds instead of re-expanding every prefix per consumer',
]

NOTES['dedup_exact_substr'] = [
    'ExactSubstr (Lee et al. 2022) as anchor join + diagonal run-merge:',
    'tokenize-once doc_id repartition (stops projection collapse from',
    're-splitting each doc 8x per gram position — measured 30.5s -> 1.5s',
    'at sf0.1 — and decouples parallelism from input file count), gram',
    'self-join keys on the GRAM (broadcast at tiny SF, shuffled at',
    'scale; doc_a < doc_b is a residual), and the islands window + run',
    'aggregate REUSE the doc_id partitioning (da subset of clustering) —',
    'zero additional run-merge shuffle. The paper hot-gram anchor cap',
    '(df > 1000 grams never anchor — worst pair fan-out df^2 -> cap^2)',
    'is a map-side-combinable gram count checkpointed ONCE into a',
    'corpus/cap-bounded hot set, broadcast-anti-joined on each side:',
    'shuffle-free, partitioning-preserving, the capped plan keeps the',
    'uncapped plan shape (+1 corpus gram pass; ~2.0s vs 1.5s at sf0.1)',
]

NOTES['dedup_tf_cosine_capped'] = [
    'sf1-feasible production variant of the exact AllPairs cosine gate:',
    '3-gram shingle TF vectors with the classic max-df drop (df > 1000',
    'terms leave the index BEFORE the pair join; norms recomputed on the',
    'cold remainder -> EXACT cosine of the cold-term projections). Cost',
    'sum(df^2) <= cap * |postings| — linear in the corpus for fixed cap,',
    'vs the uncapped gate\'s ~2.5e10 partials at sf1. Hot set is a',
    'map-side-combinable count checkpointed once + broadcast anti join;',
    'capped postings checkpoint once (suffix-array analog) so n2 + both',
    'pair-join sides reuse one pass; top-K is TakeOrderedAndProject',
]

NOTES['pipeline_exact_substr_cut'] = [
    'the Lee et al. END PRODUCT (the match reporter is their analysis',
    'artifact): every reported run is cut from the LATER doc of its',
    'oriented pair (keep-first, as text_span_dedup), intervals union',
    'per doc. Runs checkpoint once (pair-bounded); cut positions',
    'aggregate into ONE array per affected doc; removal is a positional',
    'higher-order FILTER over the tokenized array — no token explode,',
    'no (doc_id,p) anti join (requireAllClusterKeysForCoPartition would',
    're-shuffle the exploded corpus on the composite key), no',
    'reassembly groupBy: the corpus crosses the wire once',
]

NOTES['text_unigram_train_step'] = [
    'one Viterbi-EM prune round (the unigram TRAIN side): hard-EM piece',
    'counts from the checkpointed dp frames (broadcast wf join onto the',
    'explode), ec broadcast back onto the vocab (no SMJ anywhere), the',
    'bottom-20% prune rank + d2 normalizer on SINGLE-partition bounded',
    'frames (pinned at 3), final q via exact decimal(38,0) integral div',
]

NOTES['dedup_exact_substr_incremental'] = [
    'per-batch ExactSubstr admission: cold-gram runs between each',
    'incoming src1 doc and the standing corpus only (within-batch is',
    'the self-join reporter\'s job). Role predicates PUSH DOWN to the',
    'parquet scans — the incoming gram build reads only the batch; the',
    'standing side is the persisted inverted gram index in production',
    '(rebuilt inline for oracle reproducibility). Anchor-cap +',
    'run-merge shape inherited verbatim from the full reporter (zero',
    'da exchange); pair fan-out is batch-grams x df<=cap —',
    'delta-proportional, never corpus^2',
]

NOTES['text_unigram_train_soft'] = [
    'the published SentencePiece EM round (soft forward-backward E-step;',
    'the hard step is its Viterbi approximation): the SAME unrolled DP',
    'frames with groupBy-SUM where the hard path ranks — integer lattice',
    'sums ahat/bhat at the dedicated soft scale 1e4 (all bounds inside',
    'decimal(38,0)/HUGEINT), per-word posterior quantization',
    '(N * 1e6) div Z, frequency-weighted expected counts, then the tail',
    'shared verbatim with the hard step. Broadcast joins only (0 SMJ),',
    '1 nested loop (d2 normalizer), 3 single-partition exchanges (the',
    'bounded prune rank) — the hard step plan discipline, pinned',
]

NOTES['pipeline_corpus_build'] = [
    'four pipeline stages, ONE plan: a single column-pruned documents',
    'scan (doc_id, text only) feeds dedup window -> quality filter ->',
    'split projection -> packing window -> final aggregate',
    'two exchanges total: the fingerprint window shuffle and the',
    '(split, shard) packing shuffle (the bin aggregate reuses it);',
    'packing is shard-local — no global sort anywhere',
]

EXTRA = (
    'events_funnel_3step',
    'q19_disjunctive_predicates',
    'q15_top_supplier',
    'window_analytics_suite',
    'events_gap_fill',
    'events_multi_grain_rollup',
    'text_tfidf_top_terms',
    'subquery_scalar_avg',
    'graph_slice_positional',
    'dedup_minhash_lsh_salted',
    'ann_ivf_kmeans_topk',
    'text_gopher_repetition',
    'text_decontamination',
    'ann_pq_adc_topk',
    'graph_pagerank_neardup',
    'text_packing_two_level',
    'q2_min_cost_supplier',
    'text_span_dedup',
    'ann_ivfpq_topk',
    'dedup_minhash_lsh_adaptive',
    'text_hashed_features',
    'pipeline_leakage_safe_split',
    'text_pmi_cooccurrence',
    'text_quality_classifier',
    'pipeline_seeded_shuffle',
    'q10_returned_items',
    'quality_constraint_report',
    'dedup_incremental_exact',
    'ann_filtered_topk',
    'rfm_customer_segments',
    'pipeline_tokenize_to_ids',
    'dedup_jaccard_prefix_filter',
    'events_scd2_dimension',
    'dedup_semantic_kmeans',
    'basket_brand_rules',
    'events_feature_lags',
    'q14_promo_revenue',
    'text_bigram_lm_score',
    'dedup_tf_cosine_pairs',
    'dedup_recursive_hops',
    'join_bloom_prefilter',
    'events_skew_profile',
    'dedup_lsh_band_diagnostics',
    'multimodal_phash_dedup',
    'dedup_containment_pairs',
    'pipeline_dataset_card',
    'pipeline_mix_weights',
    'dedup_cc_incremental',
    'ann_hard_negatives',
    'sketch_cms_frequency',
    'pipeline_target_encoding',
    'graph_kcore_peel',
    'multimodal_scene_cuts',
    'join_interval_bucketed',
    'pipeline_quantile_bins',
    'quality_kanonymity_audit',
    'multimodal_voice_activity',
    'dedup_eval_confusion',
    'quality_source_overlap',
    'dedup_sorted_neighborhood',
    'text_keyword_tagging',
    'events_ewma_fold',
    'dedup_bcubed_eval',
    'graph_label_propagation',
    'pipeline_entity_resolution',
    'events_sessionization_sweep',
    'events_cusum_alarm',
    'text_extractive_summary',
    'quality_source_overlap_hll',
    'ann_matryoshka_rerank',
    # round-5 additions
    'ann_ivf_matryoshka_topk',
    'ann_ivf_incremental_assign',
    'pipeline_cluster_balanced_sample',
    # round-6 additions
    'ann_ivf_drift_gate',
    # round-7 additions
    'pipeline_corpus_build',
    'ann_ivf_merge',
    # round-8 additions
    'graph_branch_graft_sweep',
    'text_bpe_apply',
    'ann_ivf_persisted_topk',
    # round-9 additions
    'stream_ivf_ingest',
    'text_html_extract',
    'text_wordpiece_apply',
    'text_unigram_segment',
    # round-10 additions
    'dedup_exact_substr',
    'text_unigram_train_step',
    # round-11 additions
    'dedup_tf_cosine_capped',
    'pipeline_exact_substr_cut',
    'text_unigram_train_soft',
    'dedup_exact_substr_incremental',
)


def compact(plan: str) -> str:
    plan = re.sub(r'#\d+L?', '', plan)  # strip expr ids
    out = []
    for line in plan.splitlines():
        line = line.rstrip()
        if not line.strip():
            continue
        # drop the verbose per-node Input/Arguments sections, keep structure
        if re.match(r'^\s*(Input|Arguments|Functions|Aggregate Attributes|Results|Keys|Join condition|Condition|Output)\s*(\[\d+\])?\s*:', line):
            continue
        line = re.sub(r'(transform|lambdafunction|array_distinct|sequence)\([^\n]{60,}', r'\1(…)', line)
        out.append(line)
    # Iterative queries (unrolled k-means / PageRank) repeat the same
    # subtree per iteration — publish the top of the plan (ranking +
    # final iteration), elide the repetition.
    if len(out) > 90:
        kept = out[:70]
        kept.append(
            f'   … ({len(out) - 70} more lines: unrolled iterations '
            'repeat the subtree shape above)'
        )
        out = kept
    return '\n'.join(out)


def main() -> None:
    from pyspark.sql import SparkSession

    from cyclebane_spark.queries import registry

    spark = (
        SparkSession.builder.master('local[8]')
        .config('spark.sql.shuffle.partitions', '8')
        .config('spark.sql.adaptive.enabled', 'true')
        .config('spark.sql.session.timeZone', 'UTC')
        # auto-broadcast OFF: at sf0.001 every table fits the threshold and
        # the plans degenerate; with -1 only the EXPLICIT F.broadcast() hints
        # survive, which is exactly the 100 TB plan shape.
        .config('spark.sql.autoBroadcastJoinThreshold', '-1')
        .appName('gen-plans')
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel('ERROR')

    lines = [
        '# PLANS — headline-query physical plans (generated)',
        '',
        'Regenerate with `python tools/gen_plans.py`. Expression ids and',
        'per-node detail are stripped; `tests/test_plans.py` asserts the',
        'properties called out under each plan. Plans are the AQE initial',
        'plans at sf0.001 (structure, not sizes, is what matters here).',
        '',
    ]
    for name, q in registry().items():
        if not q.headline and name not in EXTRA:
            continue
        df = q.fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines.append(f'## {name}')
        lines.append('')
        for note in NOTES.get(name, []):
            lines.append(f'- {note}')
        lines.append('')
        lines.append('```')
        lines.append(compact(plan))
        lines.append('```')
        lines.append('')
    with open('PLANS.md', 'w') as fh:
        fh.write('\n'.join(lines))
    print(f'wrote PLANS.md ({len(lines)} lines)')


if __name__ == '__main__':
    main()
