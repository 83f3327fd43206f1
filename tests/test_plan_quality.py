"""Physical-plan regression tests: the scale properties the engine
relies on (pushdown, pruning, broadcast-vs-SMJ, top-k, bucketing) —
asserted on .explain output so a refactor can't silently lose them."""

import re

import pytest
from pyspark.sql import functions as F

from pypeman_spark.plans.queries import REGISTRY
from pypeman_spark.sources.tables import load_table, write_bucketed

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_column_pruning(spark):
    plan = plan_of(REGISTRY["pricing_summary"].fn(spark, SF))
    # shipdate predicate reaches the parquet scan
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # projection pruned: join keys unused by Q1 are not read
    read = plan.split("ReadSchema")[1][:400]
    assert "l_partkey" not in read and "l_suppkey" not in read


def test_topk_is_take_ordered_not_global_sort(spark):
    plan = plan_of(REGISTRY["shipping_priority"].fn(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_exists_compiles_to_semi_join(spark):
    plan = plan_of(REGISTRY["order_priority_check"].fn(spark, SF))
    assert "LeftSemi" in plan


def test_six_way_join_has_no_cartesian(spark):
    plan = plan_of(REGISTRY["local_supplier_volume"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_case_fanout_scans_source_once(spark):
    # pipeline.py:_share — a 3-arm case persists the tagged frame, so the
    # union of arm branches reads the cache (InMemoryTableScan), not the
    # parquet source once per arm
    from pypeman_spark import Pipeline, ensure_message_columns
    from pypeman_spark.operators import FuncNode

    ev = load_table(spark, SF, "events")
    msgs = ensure_message_columns(
        ev.select(F.col("props").alias("payload"),
                  F.col("event_type").alias("et")),
        channel="t",
    )
    p = Pipeline("t")
    p.case(
        (F.col("et") == "click", [FuncNode(lambda d: d, name="a")]),
        (F.col("et") == "view", [FuncNode(lambda d: d, name="b")]),
        (F.col("et") == "purchase", [FuncNode(lambda d: d, name="c")]),
    )
    try:
        res = p.run(msgs)
        # the tagged frame was persisted exactly once for the fan-out...
        assert len(p._persisted) == 1
        assert p._persisted[0].storageLevel.useMemory
        # ...and every arm + the fall-through branch reads the cache
        # (the FileScan text under each InMemoryRelation is the cached
        # relation's recipe, deduped by the CacheManager at execution)
        plan = plan_of(res.all)
        assert plan.count("InMemoryTableScan") >= 4, plan
        # sanity: every row still routed exactly once
        assert res.all.count() == msgs.count()
    finally:
        p.release()



def _fn(name):
    """Resolve a query callable: registry entry, or a fold's arm
    function (r8 consolidations keep each arm as a plain function so
    plan shapes stay testable per-shape)."""
    from pypeman_spark.plans import queries as Q, scale_queries as SQ

    if name in REGISTRY:
        return REGISTRY[name].fn
    return getattr(SQ, name, None) or getattr(Q, name)

def test_round2_queries_avoid_nested_loops(spark):
    # asof/tfidf/Q9/Q21 must compile to equi-joins + windows — a
    # refactor that reintroduces a theta join would NLJ at 100 TB
    import pypeman_spark.plans.scale_queries  # noqa: F401

    for name in (
        "asof_range_join_purchases",
        "product_profit_by_nation_year",
        "sole_returning_supplier",
    ):
        plan = plan_of(_fn(name)(spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # tfidf's one BNLJ is the deliberate 1-row corpus-size scalar
    # broadcast (like Q22's avg-balance subquery) — bounded by design
    # (tfidf now runs as text_analysis_suite's tfidf arm)
    plan = plan_of(REGISTRY["text_analysis_suite"].fn(spark, SF))
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan


def test_q9_broadcasts_dims_and_pushes_filter(spark):
    import pypeman_spark.plans.scale_queries  # noqa: F401

    plan = plan_of(REGISTRY["product_profit_by_nation_year"].fn(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3  # part, supplier, nation
    assert "PushedFilters: [" in plan


def test_when_null_condition_keeps_rows(spark):
    # ADVICE r01 (high): a condition evaluating to SQL NULL must route the
    # row to the continue-branch, not vanish from both
    from pypeman_spark import Pipeline, messages_from_payloads
    from pypeman_spark.operators import FuncNode

    msgs = messages_from_payloads(
        spark, [{"k": 1}, {"other": 9}, {"k": 3}]  # get_json_object → NULL on row 2
    )
    p = Pipeline("t")
    p.when(
        F.get_json_object(F.col("payload"), "$.k") > 1,
        FuncNode(lambda d: d, name="branch"),
    )
    try:
        res = p.run(msgs)
        assert res.all.count() == 3
        assert res.df.count() == 3  # both branches end processed
    finally:
        p.release()


def test_bucketed_join_runs_without_exchange(spark, tmp_path):
    # co-located big-big join: bucket both sides on the join key →
    # SortMergeJoin with zero Exchange in the plan
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", str(tmp_path / "bo"), buckets=8)
    write_bucketed(li, "b_lineitem", "o_orderkey", str(tmp_path / "bl"), buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        n = joined.count()
        assert n == load_table(spark, SF, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_grouped_percentiles_exact_vs_approx(spark):
    # VERDICT r01 item 7: the scale path (percentile_approx, bounded
    # memory per group) must exist as a flag and agree with the exact
    # sort-based form within sketch tolerance
    from pypeman_spark.functions.stats import grouped_percentiles

    ev = load_table(spark, SF, "events")
    exact = {
        r["event_type"]: (r["p50"], r["p90"])
        for r in grouped_percentiles(
            ev, ["event_type"], "value", (0.5, 0.9), exact=True
        ).collect()
    }
    approx = {
        r["event_type"]: (r["p50"], r["p90"])
        for r in grouped_percentiles(
            ev, ["event_type"], "value", (0.5, 0.9), exact=False, accuracy=10000
        ).collect()
    }
    assert exact.keys() == approx.keys()
    for k in exact:
        for e, a in zip(exact[k], approx[k]):
            # values range ~0-330; sketch picks a real sample near the rank
            assert abs(e - a) < 5.0, (k, exact[k], approx[k])
    # both are single-shuffle single-pass aggs
    plan = plan_of(
        grouped_percentiles(ev, ["event_type"], "value", (0.5, 0.9), exact=False)
    )
    assert plan.count("Exchange") <= 1


def test_connected_components_label_propagation(spark):
    # dedup clustering: min-label propagation over candidate pairs;
    # chains converge across rounds, singletons keep their own id
    from pypeman_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        [(5, 6), (1, 2), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame(
        [(n,) for n in (1, 2, 3, 4, 5, 6, 42)], "node long"
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(pairs, nodes=nodes).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 42: 42}


def test_connected_components_first_round_direct_min(spark):
    # r15: round 1 computes neighbour minima straight from the edge
    # set (labels are identity then), skipping the edges-by-dst join
    # shuffle. Star graphs converge inside that single round — this
    # pins the fast path's labels, including hubs whose smallest
    # member arrives via a reversed (high, low) pair.
    from pypeman_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        [(10, 7), (10, 9), (10, 8), (20, 21), (22, 20)],
        "id_a long, id_b long",
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {7: 7, 8: 7, 9: 7, 10: 7, 20: 20, 21: 20, 22: 20}


def test_connected_components_assume_canonical_matches_default(spark):
    # r15: assume_canonical skips the edge-set distinct (the in-repo
    # pair producers emit distinct id_a<id_b pairs, so the dedup is
    # provably empty). Labels must match the guarded default exactly —
    # and stay correct even under min-idempotent duplicate edges.
    from pypeman_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame(
        [(n,) for n in (1, 2, 3, 4, 5, 6, 42)], "node long"
    )
    base = {
        r["node"]: r["cluster_id"]
        for r in connected_components(pairs, nodes=nodes).collect()
    }
    fast = {
        r["node"]: r["cluster_id"]
        for r in connected_components(
            pairs, nodes=nodes, assume_canonical=True
        ).collect()
    }
    assert fast == base == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 42: 42}


def test_corpus_hygiene_queries_scale_clean(spark):
    # round-2b corpus ops: no cartesian/NLJ anywhere (semantic dedup's
    # exact verifier slice excepted — its crossJoin is the documented
    # bounded-verifier mode, checked separately below)
    import pypeman_spark.plans.scale_queries  # noqa: F401

    for name in (
        "decontam_report",
        "dedup_corpus_pipelines",
    ):
        plan = plan_of(REGISTRY[name].fn(spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name

    # composed mixture→cap→budget: every BNLJ is the 1-row `cap` scalar
    # broadcast (same bounded shape as tfidf's corpus-size subquery).
    # It appears twice because cap_per_domain's prefilter count pass
    # re-evaluates the mixture subtree — the standard counts-pass +
    # main-pass two-job shape, each side bounded to one row; per-domain
    # rates reach the big side via broadcast
    plan = plan_of(REGISTRY["corpus_sampling_pipeline"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert "BroadcastHashJoin" in plan

    # decontamination: the bench-shingle probe and the anti join are
    # broadcasts — the corpus side is never shuffled for a join
    plan = plan_of(REGISTRY["decontam_report"].fn(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2

    # chunking: pure projection+explode — zero shuffles. Isolate the
    # chunk arm of the consolidated entry with a literal mode filter so
    # Catalyst prunes the pack arm (PropagateEmptyRelation)
    plan = plan_of(
        REGISTRY["pack_and_chunk_documents"].fn(spark, SF)
        .filter("mode = 'chunk'")
    )
    assert "Exchange" not in plan.replace("BroadcastExchange", "")


def test_bigram_census_is_group_limited(spark):
    # per-lang top-k must push a partial top-k below the shuffle
    # (WindowGroupLimit — the grouped analogue of TakeOrdered), never
    # rank the full bigram census on one reducer chain
    import pypeman_spark.plans.scale_queries  # noqa: F401

    plan = plan_of(REGISTRY["corpus_stats_and_bigrams"].fn(spark, SF))
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan.split("WindowGroupLimit")[1][:200] or \
        plan.count("WindowGroupLimit") >= 2


def test_line_clean_and_stats_stay_narrow(spark):
    import pypeman_spark.plans.scale_queries  # noqa: F401

    # composed clean→scrub→repetition: pure projection, zero shuffles.
    # The literal mode filter lets Catalyst prune the tfidf arm of the
    # consolidated union (PropagateEmptyRelation), leaving exactly the
    # clean arm's plan — which must still contain no Exchange
    plan = plan_of(
        REGISTRY["text_analysis_suite"].fn(spark, SF).filter("mode = 'clean'")
    )
    assert "Exchange" not in plan
    # corpus stats+bigrams: reads only the columns it aggregates
    plan = plan_of(REGISTRY["corpus_stats_and_bigrams"].fn(spark, SF))
    assert "text" in plan and "doc_id" not in plan.split("ReadSchema")[-1]


def test_embedding_near_dup_default_has_no_cartesian(spark):
    # VERDICT r3 #2: the default path must be the bucketed equi-join;
    # the O(N^2) cartesian is only reachable via explicit exact=True.
    from pypeman_spark.functions import dedup as D

    emb = load_table(spark, SF, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    plan = plan_of(D.embedding_near_dup_pairs(emb, threshold=0.4))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    with pytest.raises(ValueError):
        D.embedding_near_dup_pairs(emb, num_planes=0)
    exact = plan_of(D.embedding_near_dup_pairs(emb, threshold=0.4, exact=True))
    assert "CartesianProduct" in exact or "BroadcastNestedLoopJoin" in exact


def test_ivf_assignment_is_sort_free_narrow_map(spark):
    # VERDICT r3 #3: cell assignment must be an inlined-centroid argmax
    # (narrow map), not a row_number window over the N x C crossJoin.
    # The only Exchange+Sort allowed in the whole IVF plan is the final
    # per-query top-k window.
    from pypeman_spark.functions import similarity as S

    emb = load_table(spark, SF, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cent = emb.orderBy("vec_id").limit(4).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    aplan = plan_of(S.ivf_assign(emb, cent))
    assert "Exchange" not in aplan and "Sort" not in aplan
    assert "Window" not in aplan and "Join" not in aplan

    full = plan_of(S.ivf_ann_topk(emb, q, k=5, n_centroids=8, nprobe=2))
    # one hash Exchange (the top-k window) + broadcast exchanges only
    assert full.replace("BroadcastExchange", "").count("Exchange") <= 1


def test_multi_table_lsh_stays_broadcast_and_dedups_once(spark):
    # OR-amplification must not introduce a cartesian or shuffle the
    # corpus: T broadcast bucket joins + ONE dedup groupBy + the top-k
    # window = exactly 2 hash exchanges.
    from pypeman_spark.functions import similarity as S

    emb = load_table(spark, SF, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = plan_of(S.lsh_ann_topk_multi(emb, q, num_planes=4, dim=64,
                                        num_tables=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.replace("BroadcastExchange", "").count("Exchange") == 2


def test_ivf_probe_prunes_partitions(spark, tmp_path):
    # the persisted index is partitioned by cell; a probe must prune
    # unprobed cells at file-listing time (PartitionFilters), so scan
    # cost is ~nprobe/C of the index regardless of corpus size
    from pypeman_spark.functions import similarity as S

    emb = load_table(spark, SF, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "idx")
    S.ivf_index_write(emb, path, n_centroids=8)
    probe = S.ivf_probe(spark, path, q, k=5, nprobe=2)
    plan = plan_of(probe)
    pf = plan.split("PartitionFilters")[1][:120]
    assert "cid" in pf and " IN " in pf
    # results sane: k rows per query, self-match ranked first
    rows = probe.collect()
    assert {r["query_id"] for r in rows} == {0, 1}
    top = {r["query_id"]: r["vec_id"] for r in rows if r["rank"] == 1}
    assert top == {0: 0, 1: 1}


def test_q6_is_pure_scan_aggregate(spark):
    # TPC-H Q6: every predicate must reach the parquet scan and the
    # plan must contain no join and only the 1-row final-agg exchange
    plan = plan_of(_fn("forecast_revenue_change")(spark, SF))
    pushed = plan.split("PushedFilters")[1][:300]
    assert "l_shipdate" in pushed and "l_discount" in pushed \
        and "l_quantity" in pushed
    assert "Join" not in plan
    assert plan.replace("BroadcastExchange", "").count("Exchange") == 1


def test_q15_scans_lineitem_once(spark):
    # the max-revenue subquery must read the materialized per-supplier
    # frame, not re-scan lineitem (AQE does not reuse the exchange
    # across the agg — verified r4); max comes back as a broadcast
    plan = plan_of(_fn("_top_supplier_revenue_arm")(spark, SF))
    assert plan.count("lineitem.parquet") <= 1
    assert "BroadcastHashJoin" in plan


def test_dim_broadcasts_survive_threshold_off(spark):
    # VERDICT r4 #6: at 100 TB the size estimator won't pick broadcast
    # joins for you — autoBroadcastJoinThreshold=-1 simulates that.
    # Bounded dims (nation/region/1-row aggregates) must STILL compile
    # to BroadcastHashJoin through the explicit F.broadcast hints, and
    # nothing may degrade to a cartesian.
    import pypeman_spark.plans.scale_queries  # noqa: F401

    expected = {
        "local_supplier_volume": 2,          # nation + region
        "returned_items_report": 1,          # nation
        "nation_market_share": 1,            # nation
        "two_nation_volume": 2,              # nation x2
        "_top_supplier_revenue_arm": 1,      # 1-row max frame
        "product_profit_by_nation_year": 3,  # part + supplier + nation
        "sole_returning_supplier": 1,        # supplier
    }
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name, n in expected.items():
            plan = plan_of(_fn(name)(spark, SF))
            got = plan.count("BroadcastHashJoin")
            assert got >= n, f"{name}: {got} broadcast joins, need >= {n}"
            assert "CartesianProduct" not in plan, name
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_tpch_completion_shapes_are_scale_clean(spark):
    # Q2/Q12/Q16/Q20 shapes: equi-joins + windows only; Q11's single
    # BNLJ is the 1-row total-value scalar broadcast (bounded by design)
    import pypeman_spark.plans.scale_queries  # noqa: F401

    for name in (
        "min_cost_supplier",
        "priority_by_return_flag",
        "supplier_count_by_part",
        "excess_stock_suppliers",
    ):
        plan = plan_of(_fn(name)(spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    plan = plan_of(REGISTRY["important_part_stock"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1

    # Q2: dims broadcast; the per-part argmin must not re-shuffle the
    # ps aggregate more than once (groupBy + window share the part key)
    plan = plan_of(_fn("min_cost_supplier")(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    # Q16: the blacklist is a broadcast ANTI join, never a shuffle
    plan = plan_of(_fn("supplier_count_by_part")(spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # Q20: part-name prefilter reaches lineitem as a broadcast semi join
    plan = plan_of(_fn("excess_stock_suppliers")(spark, SF))
    assert "LeftSemi" in plan


def test_gopher_signals_zero_shuffle(spark):
    # the consolidated suite (repetition + quality signals in one
    # select): the per-doc top-ngram must be the sorted-run-length
    # expression, never explode + groupBy, and every quality signal a
    # per-row Column — zero Exchange, no Generate in the whole plan
    import pypeman_spark.plans.scale_queries  # noqa: F401

    plan = plan_of(REGISTRY["gopher_signals_suite"].fn(spark, SF))
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode either


def test_pq_adc_scan_carries_codes_not_vectors(spark):
    # PQ's whole point at 100 TB: the scored corpus row carries m ints,
    # not the 64-dim vector. The ADC plan must (a) never shuffle the
    # corpus — broadcast query side + one hash Exchange for the top-k
    # window — and (b) contain no join wider than the broadcast.
    from pypeman_spark.functions import similarity as S

    emb = load_table(spark, SF, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    books = S.pq_codebooks(emb, m=4, n_codes=8, dim=64)
    plan = plan_of(S.pq_ann_topk(emb, q, books, k=5))
    assert "CartesianProduct" not in plan
    # exactly one non-broadcast Exchange: the per-query top-k window
    assert plan.replace("BroadcastExchange", "").count("Exchange") == 1
    # the encode itself is a pure narrow map
    enc_plan = plan_of(S.pq_encode(emb, books).select("vec_id", "pq_code"))
    assert "Exchange" not in enc_plan and "Join" not in enc_plan


def test_ivfpq_probe_prunes_partitions_and_vector_column(spark, tmp_path):
    # the composed stack must show BOTH scale properties at once:
    # (a) unprobed cells pruned at file-listing time (PartitionFilters),
    # (b) the ADC stage's index scan reads (vec_id, pq_code) only — the
    #     fat vector column stays unread until the re-rank
    from pypeman_spark.functions import similarity as S

    emb = load_table(spark, SF, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") < 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "ivfpq")
    S.ivfpq_index_write(emb, path, n_centroids=8, m=4, n_codes=8, dim=64)
    adc = S.ivfpq_probe(spark, path, q, k=5, nprobe=1, rerank=False)
    plan = plan_of(adc)
    pf = plan.split("PartitionFilters")[1][:120]
    # one probed cell for one query at nprobe=1: Catalyst folds the
    # single-element isin into an equality partition filter
    import re
    assert "cid" in pf
    assert re.search(r"cid#\d+ = \d+\)", pf) or " IN " in pf
    # the ADC scan projects codes, not vectors
    adc_scan = [
        seg[:120] for seg in plan.split("ReadSchema:")[1:]
        if "pq_code" in seg[:120]
    ]
    assert adc_scan and all("embedding" not in s for s in adc_scan)


def test_new_analytics_ops_exchange_budgets(spark):
    # lock the shuffle shapes of the round-5 analytics operators:
    # funnel and SCD2 are one key shuffle each (fold / windows reuse the
    # same partitioning), resample is two (the (key, bucket) aggregate +
    # the per-key fill window), and the image feature entry (PPM + PNG
    # arms) is a pure narrow map end-to-end — the union adds no shuffle
    import pypeman_spark.plans.scale_queries  # noqa: F401

    # r6: funnel/resample entries grew arms — isolate each arm with a
    # literal mode filter (Catalyst prunes the other union branch) or
    # check the combined plan where the arms share one partitioning
    budgets = {
        # funnel arm alone: cap window + groupBy share one key shuffle
        ("funnel_signup_view_purchase", "mode = 'funnel'"): 1,
        # cohort arm: first-seen agg + per-(user,week) distinct + join
        # alignment + tiny (cohort, offset) rollup
        ("funnel_signup_view_purchase", "mode = 'cohort'"): 4,
        ("scd2_customer_segments", None): 1,
        # fill window + (key, bucket) agg; the r6 rolling_zscore window
        # REUSES the key partitioning, so the budget must not grow
        ("resample_forward_fill", None): 2,
        ("image_grid_features", None): 0,
    }
    for (name, arm), budget in budgets.items():
        df = REGISTRY[name].fn(spark, SF)
        if arm:
            df = df.filter(arm)
        plan = plan_of(df)
        assert "CartesianProduct" not in plan, name
        n = plan.replace("BroadcastExchange", "").count("Exchange")
        assert n <= budget, f"{name}[{arm}]: {n} exchanges > budget {budget}"


def test_quality_fk_join_sizes_sanely_with_hint_off(spark):
    # VERDICT r5 #2: the FK-integrity join must not rely on an
    # unconditional broadcast of the FK target. With the hint off and
    # the size estimator neutralized (threshold=-1) the join must
    # compile to a shuffled equi-join — never a cartesian — and with
    # the hint on (small-dim default) the broadcast must survive.
    from pypeman_spark.functions.quality import flag_violations

    li = load_table(spark, SF, "lineitem").select("l_orderkey")
    orders = load_table(spark, SF, "orders")
    fks = {"orders_fk": (["l_orderkey"], orders, ["o_orderkey"])}
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(
            flag_violations(li, {}, foreign_keys=fks, broadcast_dims=False)
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        plan_hint = plan_of(
            flag_violations(li, {}, foreign_keys=fks, broadcast_dims=True)
        )
        assert "BroadcastHashJoin" in plan_hint
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_sketch_rollup_ships_partials_not_values(spark):
    # every shuffle in the sketch entry must carry bounded aggregate
    # partials (HLL binaries / top-k structs / distinct partials) —
    # at 100 TB the raw value stream must never be the shuffle payload.
    # Three aggregation branches + two tiny-frame joins: budget the
    # non-broadcast exchanges and forbid degenerate join shapes.
    import pypeman_spark.plans.scale_queries  # noqa: F401

    plan = plan_of(REGISTRY["sketch_rollup"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    n = plan.replace("BroadcastExchange", "").count("Exchange")
    # exact count_distinct expands to 2 exchanges; HLL and top-k are
    # 1-2 each incl. the 5-row join alignment — lock the ceiling
    assert n <= 8, f"{n} exchanges"
    assert "hll_union_agg" in plan or "hll_sketch_agg" in plan


def test_dv_filter_is_broadcast_anti_join_no_shuffle(spark, tmp_path):
    """Deletion-vector reads must stay a BroadcastHashJoin LeftAnti on
    the metadata-sized vector side — a shuffle of the DATA side here
    would turn every dv'd snapshot read into a table-wide exchange at
    100 TB."""
    from pypeman_spark.store.txtable import TxTable

    t = TxTable(spark, str(tmp_path / "dvtbl"), key_cols=["id"],
                n_buckets=2)
    t.append(spark.range(0, 200).select(
        "id", (F.col("id") % 5).alias("v")))
    t.delete_where(("id", "<", 10), mode="dv")
    plan = plan_of(t.snapshot())
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the one exchange allowed is the broadcast itself
    assert "ShuffleExchange" not in plan.replace(
        "BroadcastExchange", "")
    assert t.snapshot().count() == 190


def test_bm25_and_rrf_shapes_are_scale_clean(spark):
    """Round-11 retrieval entries: BM25 must never globally sort the
    corpus (top-k is TakeOrdered), the query-side df/scalar joins stay
    broadcast, and the RRF fusion plans no CartesianProduct and no
    corpus-wide exchange beyond the bounded rank lists' own."""
    import pypeman_spark.plans.scale_queries  # noqa: F401

    bm = plan_of(REGISTRY["bm25_doc_search"].fn(spark, SF))
    assert "TakeOrderedAndProject" in bm
    # a global sort would plan Exchange rangepartitioning; the only
    # sorts allowed are post-limit (<= k rows) for the rank window
    assert "rangepartitioning" not in bm
    assert "CartesianProduct" not in bm
    # single-pass narrow form: per-term tf is an array expression, so
    # the plan has NO token explode and no (doc, term) shuffle at all
    assert "Generate" not in bm
    # the only broadcast is the 1-row (N, avgdl, df_i) stats frame
    assert bm.count("BroadcastExchange") >= 1
    # broadcast_candidates stays accepted (vestigial: no driver-side
    # candidate set exists in the narrow form) and ranks identically
    from pypeman_spark.functions.text import bm25_topk
    from pypeman_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    q = ["the", "data"]
    hinted = bm25_topk(docs, q, k=5).collect()
    unhinted = bm25_topk(
        docs, q, k=5, broadcast_candidates=False
    ).collect()
    assert sorted(map(tuple, hinted)) == sorted(map(tuple, unhinted))
    rrf = plan_of(REGISTRY["hybrid_rrf_search"].fn(spark, SF))
    assert "CartesianProduct" not in rrf
    assert "TakeOrderedAndProject" in rrf


def test_incremental_minhash_probe_is_bucket_joined(spark):
    """Round-12 incremental dedup: candidates must come from the
    (band, band_hash) equi-join against the persisted index — no
    all-pairs comparison, no global sort; the agreement count is a
    zip_with over the carried signatures, so the history text never
    appears in the plan."""
    plan = plan_of(REGISTRY["incremental_minhash_probe"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    # exactly one scan family feeds both sides (documents); the probe
    # side's text is read, the history side contributes index rows
    assert "zip_with" in plan or "transform" in plan or "aggregate" in plan


def test_clone_snapshot_single_reader_per_root(spark, tmp_path):
    """A shallow clone's snapshot reads borrowed files under the
    SOURCE's basePath and own files under its own — grouped per root,
    ONE scan each, unioned; a non-clone table keeps exactly one scan
    (the multi-base grouping must not split plans that don't need
    it)."""
    from pypeman_spark.store.txtable import TxTable

    src = TxTable(spark, str(tmp_path / "s"), key_cols=["k"],
                  n_buckets=1)
    src.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    single = plan_of(src.snapshot())
    assert single.count("Scan parquet") == 1
    c = src.clone(str(tmp_path / "c"))
    c.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    mixed = plan_of(c.snapshot())
    assert mixed.count("Scan parquet") == 2  # one per data root
    assert "Union" in mixed


def test_q18_single_pass_matches_two_pass_reference(spark):
    """r14 continuation-2: large_quantity_orders computes the filter sum
    AND the output total_qty in ONE per-orderkey aggregate (lineitem
    scanned once, never re-joined). Must match the former two-pass
    formulation (semi join on qualifying keys, then re-join lineitem
    and re-aggregate) row for row, and keep the single lineitem scan."""
    got = REGISTRY["large_quantity_orders"].fn(spark, SF)
    plan = plan_of(got)
    assert plan.count("lineitem.parquet") == 1

    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 150)
        .select("l_orderkey")
    )
    want = (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_q17_join_below_window_matches_reference(spark):
    """r14 continuation-2: small_quantity_revenue runs the brand join
    BELOW the per-partkey avg window (p_partkey unique, so the join
    keeps exactly the brand parts' lineitems — the correlated avg is
    unchanged) and the window's exchange sees only the brand slice.
    Must match the former window-over-all-of-lineitem formulation."""
    got = REGISTRY["small_quantity_revenue"].fn(spark, SF)
    plan = plan_of(got)
    # the window (and its sort/exchange) sit ABOVE the join in the
    # tree; assert the join node's presence first so a planner
    # strategy change fails readably instead of raising ValueError
    m = re.search(r"(Broadcast|Shuffled)HashJoin|SortMergeJoin", plan)
    assert "Window" in plan and m, plan[:2000]
    assert plan.index("Window") < m.start()

    from pyspark.sql import Window as W

    from pypeman_spark.plans.queries import _cents

    li = load_table(spark, SF, "lineitem")
    part = load_table(spark, SF, "part").filter(F.col("p_brand") == "Brand#4")
    flagged = li.withColumn(
        "__avg_qty", F.avg("l_quantity").over(W.partitionBy("l_partkey"))
    )
    want = (
        flagged.join(part, flagged.l_partkey == part.p_partkey)
        .filter(F.col("l_quantity") < 0.2 * F.col("__avg_qty"))
        .agg(
            F.round(F.sum(_cents(F.col("l_extendedprice"))) / 7.0)
            .cast("long")
            .alias("avg_yearly_cents")
        )
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_supplier_parts_suite_shared_pair_agg_matches_arms(spark):
    """r15: the suite stages ONE (l_partkey, l_suppkey) lineitem
    aggregate shared by the Q2/Q16/Q20 arms (the per-arm dim filters
    are key-level equi-joins, so filtering pairs above the aggregate
    keeps every arm's rows identical). Must match the standalone arm
    functions' original prefiltered formulations exactly, and the
    executed plan must actually reuse the pair exchange (one fact
    scan, not three)."""
    from pypeman_spark.plans.queries import (
        excess_stock_suppliers,
        min_cost_supplier,
        supplier_count_by_part,
    )

    got = REGISTRY["supplier_parts_suite"].fn(spark, SF)
    rows = sorted(
        (tuple("" if v is None else v for v in r) for r in got.collect())
    )

    def arm(df, mode, cols):
        out = []
        for r in df.collect():
            d = r.asDict()
            out.append(tuple(
                [mode] + ["" if d.get(c) is None else d.get(c) for c in cols]
            ))
        return out

    cols = ["p_partkey", "p_name", "s_name", "n_name", "cost_cents",
            "p_brand", "p_type", "p_size", "supplier_cnt", "n_parts"]
    want = sorted(
        arm(min_cost_supplier(spark, SF), "mincost", cols)
        + arm(supplier_count_by_part(spark, SF), "suppcnt", cols)
        + arm(excess_stock_suppliers(spark, SF), "excess", cols)
    )
    assert rows == want

    # the runtime (final adaptive) plan computes the pair aggregate
    # ONCE: the reused copies appear as ReusedExchange nodes or as bare
    # references to the materialized ShuffleQueryStage (AQE may render
    # either), so the robust invariant is that exactly ONE lineitem
    # scan survives in the final plan — not three
    final = got._jdf.queryExecution().executedPlan().toString()
    final_section = final.split("== Initial Plan ==")[0]
    assert "isFinalPlan=true" in final_section
    assert final_section.count("lineitem.parquet") == 1, final_section
