#!/usr/bin/env python
"""Benchmark the headline queries.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}``.

Each query is forced with the ``noop`` sink — full computation, zero
driver-side collection — so timings measure the engine, not pandas
conversion.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pypeman_spark.plans.scale_queries  # noqa: E402,F401 — registers entries
from pypeman_spark.plans.queries import REGISTRY  # noqa: E402
from pypeman_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "top_orders_per_priority",
    "order_priority_check",
    "returned_items_report",
    "customer_order_distribution",
    "nation_market_share",
    "two_nation_volume",
    "large_quantity_orders",
    "promo_revenue_pct",
    "top_supplier_revenue",
    "supplier_parts_suite",
    "salted_user_event_join",
    "disjunctive_predicate_revenue",
    "important_part_stock",
    "priority_by_return_flag",
    "rollup_revenue",
    "pivot_event_values",
    "sessionize_events",
    "asof_last_view_before_purchase",
    "hourly_event_rollup",
    "route_outcomes",
    "worst_substate_agg",
    "search_text_window",
    "dedup_exact_keep_first",
    "minhash_near_dup_pairs",
    "incremental_minhash_probe",
    "ngram_jaccard_pairs",
    "simhash_sketch",
    "embedding_cosine_topk",
    "lsh_ann_topk",
    "lsh_ann_multi_topk",
    "ivf_index_probe",
    "pq_ann_topk",
    "ivfpq_index_probe",
    "text_language_id",
    "text_quality_score",
    "token_counts",
    "doc_fingerprint",
    "gopher_signals_suite",
    "duplicate_passages",
    "pack_and_chunk_documents",
    "cumulative_customer_revenue",
    "product_profit_by_nation_year",
    "sole_returning_supplier",
    "text_analysis_suite",
    "bm25_doc_search",
    "hybrid_rrf_search",
    "hash_stratified_sample",
    "decontam_report",
    "corpus_sampling_pipeline",
    "dedup_corpus_pipelines",
    "corpus_stats_and_bigrams",
    "data_quality_report",
    "sketch_rollup",
    "resample_forward_fill",
    "scd2_customer_segments",
    "funnel_signup_view_purchase",
    "image_grid_features",
    "quality_classifier_scores",
    "bpe_token_budget",
]

# entries whose fn() EAGERLY builds+writes a persisted index and lazily
# returns the probe plan — bench splits their time at the fn()/save()
# boundary into build_s / probe_s
INDEX_ENTRIES = {"ivf_index_probe", "ivfpq_index_probe"}

# composite entries that union several independent arms tagged by a
# literal discriminator column: each arm is re-timed alone by filtering
# on the literal — Catalyst folds the non-matching branches to empty
# relations, so the filtered run genuinely costs only that arm (arm
# sums exceed the slot total where arms share stages, e.g. the fuzzy
# clusters feeding the splits arm; the per-arm numbers are regression
# trackers, not a partition of the total)
ARM_ENTRIES: dict[str, tuple[str, tuple[str, ...]]] = {
    "dedup_corpus_pipelines": ("mode", ("fuzzy", "semantic", "splits")),
}


def _load1() -> float | None:
    """1-minute host load average — cheap contention telemetry."""
    try:
        with open("/proc/loadavg") as fh:
            return float(fh.read().split()[0])
    except (OSError, ValueError, IndexError):
        return None


def _gc_ms(spark) -> int | None:
    """Cumulative JVM GC time (ms) across all collectors — per-query
    deltas expose GC ramps that masquerade as query slowdowns."""
    try:
        beans = (
            spark._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        return int(
            sum(beans.get(i).getCollectionTime() for i in range(beans.size()))
        )
    except Exception:  # noqa: BLE001 — telemetry must never fail the run
        return None


def _run_noop(spec, spark, sf_dir) -> float:
    t0 = time.time()
    spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # optional argv subset (drift bisection: run an older round's query
    # set in a fresh JVM for an apples-to-apples total). Unknown names
    # are an ERROR — silently dropping a typo would run the full list
    # and present it as a valid subset total.
    unknown = [a for a in sys.argv[1:] if a not in REGISTRY]
    if unknown:
        print(f"bench: unknown query name(s): {', '.join(unknown)}",
              file=sys.stderr)
        raise SystemExit(2)
    only = [a for a in sys.argv[1:]]
    headline = only or HEADLINE
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench", cpus=cpus)
    # warmup: JIT/codegen/session init out of the first timed query
    from pypeman_spark.sources.tables import load_table

    load_table(spark, sf_dir, "lineitem").count()
    # sacrificial full-query warm-up: the table count above does not
    # absorb shuffle/broadcast/codegen machinery init, which otherwise
    # lands in the FIRST timed slot (r4 drift note: pricing_summary
    # 1.00s in-slot-1 vs 0.55s fresh-JVM). Run one full agg+join query
    # untimed before any timed slot; never counted.
    try:
        REGISTRY[headline[0]].fn(spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()
    except Exception:  # noqa: BLE001 — the timed loop reports it
        pass
    timings: dict[str, float | None] = {}
    phases: dict[str, dict[str, float]] = {}
    errors: dict[str, str] = {}
    # Self-certification (VERDICT r7 task #1): the r7 official artifact
    # was contaminated by a within-run host/GC ramp the harness could
    # not see. Every timed slot now records its wall-clock offset, the
    # host 1-min load and the JVM GC-time delta, and a fixed CANARY
    # query is re-timed at mid-list and end-of-list — if the host
    # degrades mid-run, the canary ratios flag it inside the artifact.
    telemetry: dict[str, dict] = {}
    run_start = time.time()
    canary_name = headline[0]
    canary: dict[str, object] = {"query": canary_name}
    gc_prev = _gc_ms(spark)

    def _slot_telemetry(name: str, key: str | None = None) -> None:
        nonlocal gc_prev
        gc_now = _gc_ms(spark)
        telemetry[key or name] = {
            "t_offset_s": round(time.time() - run_start, 1),
            "load1": _load1(),
            "gc_ms_delta": (
                None if gc_now is None or gc_prev is None else gc_now - gc_prev
            ),
        }
        gc_prev = gc_now

    mid_idx = len(headline) // 2
    for pos, name in enumerate(headline):
        if pos == mid_idx and pos > 0 and canary_name in REGISTRY:
            canary["mid_s"] = _run_noop(REGISTRY[canary_name], spark, sf_dir)
            _slot_telemetry(canary_name, key="__canary_mid__")
        # fault-isolated: one broken query records null and moves on —
        # it must never zero out the whole run's perf signal
        try:
            spec = REGISTRY[name]
            # one untimed run amortizes plan compilation/codegen (at
            # target scale that cost is noise; steady-state is what
            # matters), then the timed run measures execution
            spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            t0 = time.time()
            df = spec.fn(spark, sf_dir)
            t1 = time.time()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.time()
            timings[name] = round(t2 - t0, 3)
            _slot_telemetry(name)
            if name == canary_name:
                canary["baseline_s"] = timings[name]
            if name in INDEX_ENTRIES:
                # VERDICT r6 #4: the persisted-index entries time
                # build+write+probe as one number; the production-
                # relevant figure is probe-only latency against a
                # pre-built index. fn() runs the build/write jobs
                # EAGERLY and returns the probe plan lazily, so the
                # fn()/save() boundary IS the build/probe boundary.
                phases[name] = {
                    "build_s": round(t1 - t0, 3),
                    "probe_s": round(t2 - t1, 3),
                }
            if name in ARM_ENTRIES:
                from pyspark.sql import functions as F

                col, arms = ARM_ENTRIES[name]
                ph: dict[str, float] = {}
                for arm in arms:
                    ta = time.time()
                    spec.fn(spark, sf_dir).filter(
                        F.col(col) == arm
                    ).write.mode("overwrite").format("noop").save()
                    ph[f"{arm}_s"] = round(time.time() - ta, 3)
                phases[name] = ph
        except Exception as exc:  # noqa: BLE001
            timings[name] = None
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
    if canary_name in REGISTRY and "baseline_s" in canary:
        try:
            canary["end_s"] = _run_noop(REGISTRY[canary_name], spark, sf_dir)
            _slot_telemetry(canary_name, key="__canary_end__")
            base = canary["baseline_s"]
            if base and base > 0:
                for k in ("mid", "end"):
                    if f"{k}_s" in canary:
                        canary[f"{k}_ratio"] = round(canary[f"{k}_s"] / base, 2)
            ratios = [canary.get(f"{k}_ratio") for k in ("mid", "end")]
            # >1.5x on a fixed repeated query = the HOST degraded
            # mid-run; the artifact flags itself as contaminated
            canary["drift_flag"] = any(r is not None and r > 1.5 for r in ratios)
        except Exception as exc:  # noqa: BLE001
            canary["error"] = f"{type(exc).__name__}: {exc}"[:200]
    total = round(sum(v for v in timings.values() if v is not None), 3)
    out = {
        "metric": "headline_queries_total",
        # a partial sum is NOT comparable to a clean run's total — if any
        # query errored, report null so consumers can't mistake a smaller
        # partial total for a speedup; per-query timings carry the signal
        "value": None if errors else total,
        "unit": "sec",
        "queries": timings,
        # build_s/probe_s split for persisted-index entries (VERDICT r6
        # #4); their `queries` number stays build+probe so totals remain
        # comparable across rounds
        "phases": phases,
        # flattened copies of the ivfpq split: the one-time KMeans
        # build dominates the slot total and masks probe-path
        # regressions — ivfpq_probe_s is the regression-watched number
        **{
            f"ivfpq_{k.removesuffix('_s')}_s": v
            for k, v in phases.get("ivfpq_index_probe", {}).items()
        },
        "completed": sum(v is not None for v in timings.values()),
        "attempted": len(timings),
        "sf": sf,
        # within-run drift self-certification: a fixed query re-timed at
        # mid-list and end-of-list; ratios ~1.0 certify a stable host,
        # drift_flag=true marks the artifact as contaminated (r7 task #1)
        "canary": canary,
        # per-slot wall offset / host load1 / JVM GC-time delta — enough
        # to post-hoc attribute any per-query anomaly to host or GC ramp
        "telemetry": telemetry,
        "run_started_unix": round(run_start, 1),
    }
    if errors:
        out["errors"] = errors
        out["partial_total"] = total
    print(json.dumps(out))


if __name__ == "__main__":
    main()
