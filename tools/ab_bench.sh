#!/bin/bash
# Interleaved fresh-JVM A/B on the FIXED 30-query control list (the
# only valid cross-round performance comparator — see
# BENCH_DRIFT_NOTE.md). Usage:
#   tools/ab_bench.sh <dirA> <dirB> [pairs] [out.jsonl]
# Each side runs `python bench.py <control>` from its own checkout in
# a fresh JVM; order is B A B A ... so host drift hits both equally.
set -eu
A_DIR=$1; B_DIR=$2; PAIRS=${3:-4}; OUT=${4:-/tmp/ab_bench.jsonl}
CONTROL="pricing_summary shipping_priority local_supplier_volume
top_orders_per_priority order_priority_check returned_items_report
customer_order_distribution nation_market_share two_nation_volume
large_quantity_orders promo_revenue_pct disjunctive_predicate_revenue
rollup_revenue pivot_event_values sessionize_events
asof_last_view_before_purchase hourly_event_rollup route_outcomes
worst_substate_agg search_text_window dedup_exact_keep_first
minhash_near_dup_pairs ngram_jaccard_pairs simhash_sketch
embedding_cosine_topk lsh_ann_topk text_language_id text_quality_score
token_counts doc_fingerprint"
: > "$OUT"
for i in $(seq 1 "$PAIRS"); do
  for side in B A; do
    dir=$B_DIR
    if [ "$side" = A ]; then dir=$A_DIR; fi
    total=$(cd "$dir" && python bench.py $CONTROL 2>/dev/null | tail -1 \
      | python -c "import json,sys; print(json.load(sys.stdin)['value'])")
    echo "{\"run\": \"$side$i\", \"dir\": \"$dir\", \"total_s\": $total}" \
      | tee -a "$OUT"
  done
done
