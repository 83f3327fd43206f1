"""Property-based tests (hypothesis) for the priority/aggregation logic
SURVEY §7.4 flags as subtle: worst-substate resolution must match the
reference's STATES_PRIORITY ordering (`message.py:36-43`,
`msgstore.py:687-705`) for every combination of substates."""

import json

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F, types as T

from pypeman_spark.message import STATES_PRIORITY, worst_state_expr


def reference_worst(states):
    # the reference's logic, verbatim shape (msgstore.py:687-705)
    return max(states, key=lambda s: STATES_PRIORITY.index(s))


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.sampled_from(STATES_PRIORITY), min_size=1, max_size=8)
)
def test_worst_state_matches_reference(spark, states):
    df = spark.createDataFrame(
        [(states,)], T.StructType([T.StructField("s", T.ArrayType(T.StringType()))])
    )
    got = df.select(worst_state_expr(F.col("s")).alias("w")).collect()[0]["w"]
    assert got == reference_worst(states)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.sampled_from(["processed", "dropped", "rejected", "error"]),
        min_size=1,
        max_size=6,
    )
)
def test_substate_agg_parent_state(spark, sub_outcomes):
    # channels.py:794-832: parent = worst substate, with Dropped counting
    # as success in the substate history (channels.py:800-806)
    from pypeman_spark import messages_from_payloads
    from pypeman_spark.operators import aggregate_substates

    msgs = messages_from_payloads(spark, [json.dumps(sub_outcomes)])
    exploded = (
        msgs.select(
            "*", F.explode(F.from_json("payload", "array<string>")).alias("__o")
        )
        .withColumn("state", F.col("__o"))
        .drop("__o")
    )
    agg = aggregate_substates(exploded).collect()[0]
    effective = ["processed" if s == "dropped" else s for s in sub_outcomes]
    assert agg["state"] == reference_worst(effective)
    assert len(agg["submessage_states"]) == len(sub_outcomes)


_word = st.text(alphabet="abcdefg", min_size=1, max_size=5)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(_word, min_size=1, max_size=40),
    st.integers(min_value=2, max_value=8),
)
def test_chunking_reassembles_exactly(spark, words, max_tokens):
    # overlap=0 chunking is a partition of the token stream: joining the
    # chunks back in order reproduces the original text exactly, and
    # token counts add up
    from pypeman_spark.functions.packing import chunk_documents

    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, max_tokens=max_tokens, overlap=0).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert " ".join(r.chunk_text for r in rows) == text
    assert sum(r.n_tokens for r in rows) == len(words)
    assert all(r.n_tokens <= max_tokens for r in rows)
    assert [r.chunk_idx for r in rows] == list(range(len(rows)))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=30, max_size=120),
    st.integers(min_value=1, max_value=10),
)
def test_cap_per_domain_never_exceeds_cap_and_is_stable(spark, domains, cap):
    # cap bound holds for every domain; adding MORE rows to other
    # domains never changes a domain's kept set (growth stability)
    from pypeman_spark.functions.sampling import cap_per_domain

    rows = [(i, d) for i, d in enumerate(domains)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    kept = cap_per_domain(df, "domain", "doc_id", cap, salt="p")
    per = {
        r.domain: r.n
        for r in kept.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    assert all(n <= cap for n in per.values())
    a_before = sorted(r.doc_id for r in kept.filter(F.col("domain") == "a").collect())
    grown = df.union(
        spark.createDataFrame(
            [(10_000 + i, "b") for i in range(50)], "doc_id long, domain string"
        )
    )
    kept2 = cap_per_domain(grown, "domain", "doc_id", cap, salt="p")
    a_after = sorted(r.doc_id for r in kept2.filter(F.col("domain") == "a").collect())
    assert a_before == a_after


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=2, max_value=32),
    st.text(alphabet="abcxyz:0123456789", max_size=8),
)
def test_hyperplanes_deterministic_and_signed(num_planes, dim, seed):
    # plane coefficients must be exactly ±1 and identical across calls
    # (the oracle SQL inlines the same literals — any drift breaks every
    # ANN oracle); different seeds must give independent tables
    from pypeman_spark.functions.similarity import hyperplanes

    a = hyperplanes(num_planes, dim, seed=seed)
    b = hyperplanes(num_planes, dim, seed=seed)
    assert a == b
    assert len(a) == num_planes and all(len(p) == dim for p in a)
    assert all(v in (1.0, -1.0) for p in a for v in p)
    other = hyperplanes(num_planes, dim, seed=seed + "X")
    if num_planes * dim >= 16:  # tiny tables can collide by chance
        assert other != a


def test_lsh_bucket_range_and_self_consistency(spark):
    # bucket ids must lie in [0, 2^planes) and equal vectors must always
    # land in the same bucket (the property every candidate join relies on)
    from pypeman_spark.functions.similarity import hyperplanes, lsh_bucket
    from pypeman_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    planes = hyperplanes(6, 64)
    b = emb.select(
        "vec_id", lsh_bucket(F.col("embedding"), planes).alias("bucket")
    )
    mn, mx = b.agg(F.min("bucket"), F.max("bucket")).first()
    assert 0 <= mn and mx < 2 ** 6
    # same vector twice -> same bucket
    dup = emb.limit(5).unionByName(emb.limit(5))
    db = dup.select(
        "vec_id", lsh_bucket(F.col("embedding"), planes).alias("bucket")
    )
    assert db.groupBy("vec_id").agg(
        F.count_distinct("bucket").alias("n")
    ).filter(F.col("n") > 1).count() == 0


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=1, max_value=40),
        ),
        min_size=10,
        max_size=60,
    ),
    st.integers(min_value=20, max_value=120),
)
def test_token_budget_is_maximal_greedy_prefix(spark, rows, budget):
    # kept set must equal the reference greedy: take docs in
    # (hash_bucket, id) order per domain while cumsum(tokens) <= budget
    from pypeman_spark.functions.sampling import (
        hash_bucket, token_budget_sample,
    )

    df = spark.createDataFrame(
        [(i, d, t) for i, (d, t) in enumerate(rows)],
        "doc_id long, domain string, toks long",
    )
    got = sorted(
        r.doc_id
        for r in token_budget_sample(
            df, "domain", "doc_id", F.col("toks"), budget, salt="p"
        ).collect()
    )
    buckets = {
        r.doc_id: r.b
        for r in df.select(
            "doc_id", hash_bucket(F.col("doc_id"), "p").alias("b")
        ).collect()
    }
    want = []
    by_domain: dict = {}
    for i, (d, t) in enumerate(rows):
        by_domain.setdefault(d, []).append((buckets[i], i, t))
    for d, docs in by_domain.items():
        cum = 0
        for _, i, t in sorted(docs):
            cum += t
            if cum > budget:
                break
            want.append(i)
    assert got == sorted(want)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),
        min_size=1, max_size=25,
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),
        min_size=1, max_size=25,
    ),
)
def test_asof_join_tolerance_matches_bruteforce(spark, lrows, rrows):
    # the union-timeline rewrite == the per-row brute force: latest
    # strictly-earlier right ts within the tolerance window, ties by
    # highest value id
    from pypeman_spark.functions.joins import asof_join

    TOL = 100  # seconds
    left = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(lrows)],
        "lid long, k long, ts_s long",
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    right = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(rrows)],
        "vid long, k long, ts_s long",
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    got = {
        r.lid: r.asof_vid
        for r in asof_join(
            left.select("lid", "k", "ts"),
            right.select("k", "ts", "vid"),
            by="k", left_ts="ts", right_ts="ts",
            value_cols=["vid"], strict=True, tolerance="100 seconds",
        ).collect()
    }
    for i, (k, ts) in enumerate(lrows):
        cands = [
            (rts, j)
            for j, (rk, rts) in enumerate(rrows)
            if rk == k and rts < ts and rts >= ts - TOL
        ]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, ts, cands)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=20, max_size=80),
    st.integers(min_value=1, max_value=6),
)
def test_cap_prefilter_equals_bare_window(spark, domains, cap):
    # the margin-4 prefilter must be a pure optimization: identical kept
    # set to the unfiltered window on every input
    from pypeman_spark.functions.sampling import cap_per_domain

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(domains)], "doc_id long, domain string"
    )
    fast = sorted(
        (r.domain, r.doc_id)
        for r in cap_per_domain(
            df, "domain", "doc_id", cap, salt="p", prefilter_margin=4
        ).collect()
    )
    bare = sorted(
        (r.domain, r.doc_id)
        for r in cap_per_domain(
            df, "domain", "doc_id", cap, salt="p", prefilter_margin=None
        ).collect()
    )
    assert fast == bare


def test_mixture_binding_domain_keeps_everything(spark):
    # the domain with min(n_d / w_d) pins the feasible total; its keep
    # rate is exactly 1.0 so every one of its docs must survive
    from pypeman_spark.functions.sampling import mixture_sample

    rows = (
        [(i, "web") for i in range(60)]
        + [(1000 + i, "books") for i in range(10)]
        + [(2000 + i, "code") for i in range(30)]
    )
    df = spark.createDataFrame(rows, "doc_id long, src string")
    kept = mixture_sample(
        df, "src", "doc_id", {"web": 0.5, "books": 0.3, "code": 0.2}, salt="m"
    )
    per = {
        r.src: r.n for r in kept.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    # books is binding (10/0.3 = 33.3 < 60/0.5 = 120, 30/0.2 = 150)
    assert per.get("books") == 10
    # and no domain exceeds its feasible share: n_kept <= T * w_d + 1
    T = 10 / 0.3
    assert per.get("web", 0) <= int(T * 0.5) + 1
    assert per.get("code", 0) <= int(T * 0.2) + 1


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=30),
    st.integers(min_value=1, max_value=3),
)
def test_top_ngram_stats_matches_bruteforce(spark, words, n):
    # the sorted-run-length expression == Python Counter brute force,
    # including the smallest-ngram tie-break
    from collections import Counter

    from pypeman_spark.functions.text import top_ngram_stats

    text = " ".join(words)
    df = spark.createDataFrame([(text,)], "t string")
    row = df.select(top_ngram_stats(F.col("t"), n).alias("s")).collect()[0]["s"]
    grams = [
        " ".join(words[i:i + n]) for i in range(len(words) - n + 1)
    ]
    if not grams:
        assert row["cnt"] == 0 and row["ngram"] == ""
    else:
        c = Counter(grams)
        best = max(c.values())
        want = min(g for g, k in c.items() if k == best)
        assert (row["ngram"], row["cnt"]) == (want, best)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-2.0, max_value=2.0,
                      allow_nan=False, allow_infinity=False),
            min_size=8, max_size=8,
        ),
        min_size=4, max_size=12, unique_by=tuple,
    )
)
def test_pq_encode_picks_true_argmin(spark, vecs):
    # the Column-expression argmin must agree with a plain-Python
    # reference on arbitrary vectors: per sub-space, the chosen code
    # minimizes squared L2 (ties -> lowest code id)
    from pypeman_spark.functions import similarity as S

    m, ds, n_codes = 2, 4, min(3, len(vecs))
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    books = S.pq_codebooks(df, m=m, n_codes=n_codes, dim=8)
    got = {
        r["vec_id"]: list(r["pq_code"])
        for r in S.pq_encode(df, books).select("vec_id", "pq_code").collect()
    }

    def py_l2sq(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    for i, v in enumerate(vecs):
        for j in range(m):
            sub = v[j * ds:(j + 1) * ds]
            dists = [py_l2sq(sub, c) for c in books[j]]
            best = min(range(n_codes), key=lambda c: (dists[c], c))
            assert got[i][j] == best, (i, j, dists, got[i])


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-2.0, max_value=2.0,
                      allow_nan=False, allow_infinity=False),
            min_size=8, max_size=8,
        ),
        min_size=5, max_size=10, unique_by=tuple,
    )
)
def test_pq_adc_equals_python_reference(spark, vecs):
    # ADC score = sum over sub-spaces of d(query sub-vector, the code
    # the corpus row was assigned) — cross-check the whole pipeline
    # (encode + LUT + sum + top-k ordering) against plain Python
    from pypeman_spark.functions import similarity as S

    m, ds, n_codes = 2, 4, 4
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    books = S.pq_codebooks(df, m=m, n_codes=min(n_codes, len(vecs)), dim=8)
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        r["vec_id"]: r["score"]
        for r in S.pq_ann_topk(df, q, books, k=len(vecs)).collect()
    }

    def py_l2sq(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def py_code(v, j):
        sub = v[j * ds:(j + 1) * ds]
        dists = [py_l2sq(sub, c) for c in books[j]]
        return min(range(len(books[j])), key=lambda c: (dists[c], c))

    qv = vecs[0]
    for i, v in enumerate(vecs):
        want = sum(
            py_l2sq(qv[j * ds:(j + 1) * ds], books[j][py_code(v, j)])
            for j in range(m)
        )
        assert abs(got[i] - round(want, 6)) < 1e-6, (i, got[i], want)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),       # key
            st.integers(min_value=0, max_value=20),      # day offset
            st.sampled_from(["A", "B", "C"]),            # attr
        ),
        min_size=1, max_size=12,
    )
)
def test_scd2_apply_is_idempotent(spark, updates):
    # re-applying the SAME batch must be a no-op: every duplicate is
    # either an exact version already in force (lag suppression) or a
    # zero-information re-statement
    import datetime as dtm

    from pypeman_spark.functions.scd import scd2_apply

    dim = spark.createDataFrame(
        [(k, "Z", dtm.date(2019, 1, 1), None, True) for k in (1, 2, 3)],
        "k long, attr string, valid_from date, valid_to date, is_current boolean",
    )
    upd = spark.createDataFrame(
        [
            (k, a, dtm.date(2020, 1, 1) + dtm.timedelta(days=d))
            for k, d, a in updates
        ],
        "k long, attr string, valid_from date",
    )
    once = scd2_apply(dim, upd, ["k"], ["attr"])
    twice = scd2_apply(once, upd, ["k"], ["attr"])
    assert {tuple(r) for r in once.collect()} == {
        tuple(r) for r in twice.collect()
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2),     # key
            st.integers(min_value=0, max_value=600),   # minutes offset
            st.integers(min_value=-50, max_value=50),  # value
        ),
        min_size=1, max_size=15,
    )
)
def test_resample_conserves_sums_and_counts(spark, rows):
    # with fill=None and agg=sum, nothing is invented: total value and
    # total event count over the grid equal the inputs exactly
    import datetime as dtm

    from pyspark.sql import functions as FF

    from pypeman_spark.functions.timeseries import resample

    base = dtm.datetime(2026, 2, 1)
    df = spark.createDataFrame(
        [
            (k, base + dtm.timedelta(minutes=m), float(v))
            for k, m, v in rows
        ],
        "k long, ts timestamp, v double",
    )
    out = resample(df, "k", "ts", "v", step_seconds=3600, agg="sum",
                   fill=None)
    got = out.agg(
        FF.sum("value").alias("sv"), FF.sum("n_events").alias("se")
    ).collect()[0]
    assert got["se"] == len(rows)
    assert abs(got["sv"] - sum(v for _, _, v in rows)) < 1e-9


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),       # minute
            st.sampled_from(["s1", "s2", "s3", "other"]),
        ),
        min_size=1, max_size=14,
    )
)
def test_funnel_prefix_consistency(spark, events):
    # the greedy chain's first k' stages do not depend on later stages:
    # the 2-stage funnel must agree exactly with the first two stages
    # of the 3-stage funnel (same key, same events)
    import datetime as dtm

    from pypeman_spark.functions.stats import funnel

    base = dtm.datetime(2026, 3, 1)
    df = spark.createDataFrame(
        [(1, base + dtm.timedelta(minutes=m), s) for m, s in events],
        "k long, ts timestamp, e string",
    )
    two = funnel(df, "k", "ts", "e", ["s1", "s2"]).collect()
    three = funnel(df, "k", "ts", "e", ["s1", "s2", "s3"]).collect()
    t2 = {(r["stage1_ts"], r["stage2_ts"]) for r in two}
    t3 = {(r["stage1_ts"], r["stage2_ts"]) for r in three}
    assert t2 == t3
    if three:
        assert three[0]["n_completed"] >= (two[0]["n_completed"] if two else 0)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),        # key
            st.integers(min_value=0, max_value=30),       # minute
            st.sampled_from(["s1", "s2", "s3", "other"]),
        ),
        min_size=1, max_size=14,
    )
)
def test_funnel_cap_is_identity_for_under_cap_keys(spark, events):
    # VERDICT r5 #8: a cap >= every key's stage-event count must never
    # change the result (greedy matching only consumes earliest events)
    import datetime as dtm

    from pypeman_spark.functions.stats import funnel

    base = dtm.datetime(2026, 4, 1)
    df = spark.createDataFrame(
        [(k, base + dtm.timedelta(minutes=m), s) for k, m, s in events],
        "k long, ts timestamp, e string",
    )
    stages = ["s1", "s2", "s3"]
    plain = {
        (r["k"], r["n_completed"], r["stage1_ts"], r["stage2_ts"], r["stage3_ts"])
        for r in funnel(df, "k", "ts", "e", stages).collect()
    }
    capped = {
        (r["k"], r["n_completed"], r["stage1_ts"], r["stage2_ts"], r["stage3_ts"])
        for r in funnel(df, "k", "ts", "e", stages,
                        max_events_per_key=len(events)).collect()
    }
    assert plain == capped


@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    subsample=st.booleans(),
    ri=st.integers(min_value=0, max_value=4),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_roundtrip_property(h, w, seed, subsample, ri):
    # any dims (incl. partial blocks/MCUs), any content, with/without
    # 4:2:0 and restart markers: decode succeeds, dims survive, and
    # LUMA error stays within baseline-JPEG quantization bounds
    import numpy as np

    from pypeman_spark.functions.multimodal import (
        _encode_jpeg,
        _parse_jpeg,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8).astype(np.uint8)
    blob = _encode_jpeg(
        px, quality=95, subsample=subsample, restart_interval=ri
    )
    ww, hh, out = _parse_jpeg(blob)
    assert (ww, hh) == (w, h)
    assert out.shape == px.shape and out.dtype == np.uint8

    def luma(a):
        return 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]

    lerr = np.abs(luma(out.astype(float)) - luma(px.astype(float)))
    assert float(lerr.mean()) < 6.0
    if not subsample:
        assert int(
            np.max(np.abs(out.astype(int) - px.astype(int)))
        ) <= 40


@given(
    ks=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=14),   # bitrate idx
            st.integers(min_value=0, max_value=1),    # padding bit
        ),
        min_size=1,
        max_size=40,
    ),
    id3=st.booleans(),
    tag=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_mp3_walk_tiles_exactly_property(ks, id3, tag):
    # any VBR mix of bitrates/padding, with/without ID3v2 head and
    # ID3v1 trailer: the walk finds every frame, frames tile with no
    # gaps, and timestamps are the exact integer sample arithmetic
    from pypeman_spark.functions.multimodal import (
        _mp3_frame_at,
        _parse_mp3,
    )

    def frame(br, pad):
        hdr = bytes(
            [0xFF, 0xE0 | (3 << 3) | (1 << 1) | 1,
             (br << 4) | (0 << 2) | (pad << 1), 0xC0]
        )
        flen, _, _, _ = _mp3_frame_at(hdr, 0)
        return hdr + bytes(flen - 4)

    head = (
        b"ID3\x03\x00\x00" + bytes([0, 0, 0, 9]) + bytes(9) if id3 else b""
    )
    body = b"".join(frame(br, pad) for br, pad in ks)
    trailer = b"TAG" + bytes(125) if tag else b""
    sr, frames = _parse_mp3(head + body + trailer)
    assert sr == 44100 and len(frames) == len(ks)
    assert frames[0][0] == len(head)
    for (o1, s1, _), (o2, _, _) in zip(frames, frames[1:]):
        assert o1 + s1 == o2
    for k, (_, _, start) in enumerate(frames):
        assert start == k * 1152 * 1000 // 44100
