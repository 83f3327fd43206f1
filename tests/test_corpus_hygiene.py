"""Decontamination, mixture sampling, and the composed fuzzy-dedup
corpus (functions/decontam.py, functions/sampling.py:mixture_sample)."""

from pyspark.sql import functions as F

from pypeman_spark.functions.decontam import (
    benchmark_overlap,
    contaminated_ids,
    decontaminate,
)
from pypeman_spark.functions.sampling import mixture_sample


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_benchmark_overlap_containment_not_jaccard(spark):
    # Doc 1 embeds the whole benchmark item inside a much longer page:
    # containment must flag it even though symmetric Jaccard is low.
    bench = _docs(spark, [(100, "the quick brown fox jumps high")])
    corpus = _docs(
        spark,
        [
            (1, "padding words here " + "the quick brown fox jumps high" + " more filler tail text beyond"),
            (2, "totally unrelated content about spark plans"),
        ],
    )
    out = benchmark_overlap(
        corpus, bench, n=3, min_ratio=0.9, bench_id="bench_id"
    ).collect()
    assert [(r.doc_id, r.bench_id, r.ratio) for r in out] == [(1, 100, 1.0)]


def test_decontaminate_drops_only_contaminated(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    corpus = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta copied verbatim"),
            (2, "clean document with original words only"),
            (3, "alpha beta unrelated gamma"),  # partial overlap, below 0.5
        ],
    )
    kept = decontaminate(corpus, bench, n=3, min_ratio=0.5, bench_id="bench_id")
    assert sorted(r.doc_id for r in kept.collect()) == [2, 3]
    bad = contaminated_ids(corpus, bench, n=3, min_ratio=0.5, bench_id="bench_id")
    assert [r.doc_id for r in bad.collect()] == [1]


def test_mixture_sample_hits_target_proportions(spark):
    # 3 domains, deliberately unbalanced counts; 'b' (w=0.5, n=500) is
    # the binding domain -> cap = 1000, expected keeps a:300, b:500(all), c:200.
    rows = (
        [(i, "a") for i in range(2000)]
        + [(10_000 + i, "b") for i in range(500)]
        + [(20_000 + i, "c") for i in range(3000)]
        + [(30_000 + i, "drop_me") for i in range(100)]
    )
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    out = mixture_sample(df, "domain", "doc_id", {"a": 0.3, "b": 0.5, "c": 0.2})
    counts = {r.domain: r.n for r in out.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert "drop_me" not in counts
    assert counts["b"] == 500  # binding domain keeps everything
    # hash sampling hits rates in expectation; ±20% at these sizes
    assert abs(counts["a"] - 300) < 60
    assert abs(counts["c"] - 200) < 40


def test_mixture_sample_deterministic(spark):
    rows = [(i, "x" if i % 3 else "y") for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    a = sorted(r.doc_id for r in mixture_sample(df, "domain", "doc_id", {"x": 0.5, "y": 0.5}).collect())
    b = sorted(r.doc_id for r in mixture_sample(df, "domain", "doc_id", {"x": 0.5, "y": 0.5}).collect())
    assert a == b and len(a) > 0


def test_decontaminate_plan_broadcasts_bench_side(spark):
    bench = _docs(spark, [(100, "one two three four five six")])
    corpus = _docs(spark, [(1, "one two three four five six seven")])
    plan = decontaminate(
        corpus, bench, n=3, min_ratio=0.5, bench_id="bench_id"
    )._jdf.queryExecution().executedPlan().toString()
    # the contaminated-id anti join and the shingle probe are broadcasts
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


def test_cap_per_domain_prefilter_matches_exact(spark):
    from pypeman_spark.functions.sampling import cap_per_domain

    rows = [(i, "big" if i < 800 else "small") for i in range(850)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    fast = cap_per_domain(df, "domain", "doc_id", 20, salt="s")
    exact = cap_per_domain(df, "domain", "doc_id", 20, salt="s", prefilter_margin=None)
    fk = sorted((r.domain, r.doc_id) for r in fast.collect())
    ek = sorted((r.domain, r.doc_id) for r in exact.collect())
    assert fk == ek
    per = {}
    for d, _ in fk:
        per[d] = per.get(d, 0) + 1
    assert per["big"] == 20 and per["small"] == 20


def test_token_budget_sample_greedy_prefix(spark):
    from pypeman_spark.functions.sampling import token_budget_sample, hash_bucket

    rows = [(i, "d", 10) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, toks long")
    out = token_budget_sample(df, "domain", "doc_id", F.col("toks"), 95)
    kept = [r.doc_id for r in out.collect()]
    assert len(kept) == 9  # 9 * 10 = 90 <= 95 < 100
    # kept set must be the prefix of the hash ordering
    order = [
        r.doc_id
        for r in df.select("doc_id", hash_bucket(F.col("doc_id")).alias("b"))
        .orderBy("b", "doc_id")
        .collect()
    ]
    assert sorted(kept) == sorted(order[:9])


def test_upsample_mixture_fractional_factors(spark):
    from pypeman_spark.functions.sampling import upsample_mixture

    rows = [(i, "a" if i < 1000 else ("b" if i < 2000 else "c")) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    out = upsample_mixture(df, "domain", "doc_id", {"a": 2.5, "b": 0.3})
    counts = {r.domain: r.n for r in out.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["a"] - 2500) < 150  # 2x everyone + 0.5 hash subset
    assert abs(counts["b"] - 300) < 90  # pure fractional downsample
    assert counts["c"] == 1000  # default 1.0: exactly one copy each
    # copy_idx distinguishes repeats of the same doc
    m = out.filter(F.col("domain") == "a").groupBy("doc_id").agg(F.max("copy_idx").alias("m"))
    assert {r.m for r in m.collect()} <= {2, 3}


def test_upsample_mixture_deterministic_and_zero_drop(spark):
    from pypeman_spark.functions.sampling import upsample_mixture

    df = spark.createDataFrame([(i, "x") for i in range(200)], "doc_id long, domain string")
    a = sorted((r.doc_id, r.copy_idx) for r in upsample_mixture(df, "domain", "doc_id", {"x": 0.4}).collect())
    b = sorted((r.doc_id, r.copy_idx) for r in upsample_mixture(df, "domain", "doc_id", {"x": 0.4}).collect())
    assert a == b
    assert 0 < len(a) < 200  # fractional keep, zero-repeat rows dropped
    assert all(c == 1 for _, c in a)


def test_chunk_documents_windows_and_overlap(spark):
    from pypeman_spark.functions.packing import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, words), (2, "short text")], "doc_id long, text string")
    out = {
        (r.doc_id, r.chunk_idx): (r.chunk_text, r.n_tokens)
        for r in chunk_documents(df, max_tokens=4, overlap=1).collect()
    }
    # doc 1: stride 3 -> starts 0,3,6 cover tokens 0-3,3-6,6-9
    assert out[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert out[(1, 1)] == ("w3 w4 w5 w6", 4)
    assert out[(1, 2)][0] == "w6 w7 w8 w9"
    # overlap: each chunk repeats the previous chunk's last token
    assert out[(1, 1)][0].split()[0] == out[(1, 0)][0].split()[-1]
    # short doc: single chunk, actual token count
    assert out[(2, 0)] == ("short text", 2)
    assert (2, 1) not in out


def test_chunk_documents_rejects_bad_overlap(spark):
    from pypeman_spark.functions.packing import chunk_documents
    import pytest

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=4, overlap=4)


def test_write_training_shards_deterministic_and_balanced(spark, tmp_path):
    from pypeman_spark.functions.layout import write_training_shards

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(2000)], "doc_id long, text string"
    )
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_training_shards(df, p1, 8, "doc_id", salt="v1")
    # re-run from a different input partitioning: same shard membership
    write_training_shards(df.repartition(17), p2, 8, "doc_id", salt="v1")
    a = spark.read.parquet(p1)
    b = spark.read.parquet(p2)
    ka = sorted((r.shard, r.doc_id) for r in a.select("shard", "doc_id").collect())
    kb = sorted((r.shard, r.doc_id) for r in b.select("shard", "doc_id").collect())
    assert ka == kb and len(ka) == 2000
    sizes = [n for _, n in
             ((r.shard, r.n) for r in a.groupBy("shard").agg(F.count("*").alias("n")).collect())]
    assert len(sizes) == 8
    assert max(sizes) < 2 * min(sizes)  # equal in expectation
    # hash order de-correlates from doc_id order: shard 0's ids aren't a prefix
    s0 = sorted(r.doc_id for r in a.filter(F.col("shard") == 0).select("doc_id").collect())
    assert s0 != list(range(len(s0)))


def test_clean_lines_keeps_order_and_filters(spark):
    from pypeman_spark.functions.text import clean_lines

    text = "the quick brown fox jumps\nshort one\nnothing matching here today\nthe tail stays here fine"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = df.select(
        clean_lines(F.col("text"), min_words=4, required_words=["the"]).alias("c")
    ).first()["c"]
    # "short one" dropped (too few words); "nothing matching..." dropped
    # (no required word); order of survivors preserved
    assert out == "the quick brown fox jumps\nthe tail stays here fine"
    # all dropped -> empty string, not null
    df2 = spark.createDataFrame([(1, "tiny")], "doc_id long, text string")
    assert df2.select(clean_lines(F.col("text"), 4, ["the"]).alias("c")).first()["c"] == ""


def test_weighted_sample_is_weighted_and_deterministic(spark):
    from pypeman_spark.functions.sampling import weighted_sample_per_group

    # two strata of equal size; 'heavy' rows get 10x the weight -> they
    # should dominate the sample
    rows = [(i, "g", 10.0 if i % 2 == 0 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, wt double")
    out = weighted_sample_per_group(df, "grp", "doc_id", F.col("wt"), 200, salt="w")
    got = [r.doc_id for r in out.collect()]
    assert len(got) == 200
    heavy = sum(1 for i in got if i % 2 == 0)
    assert heavy > 150  # E[heavy] ≈ 183 under A-ES with 10:1 weights
    again = [r.doc_id for r in
             weighted_sample_per_group(df, "grp", "doc_id", F.col("wt"), 200, salt="w").collect()]
    assert sorted(got) == sorted(again)
    # zero/negative weights never sampled
    rows2 = rows + [(10_000 + i, "g", 0.0) for i in range(50)]
    df2 = spark.createDataFrame(rows2, "doc_id long, grp string, wt double")
    out2 = weighted_sample_per_group(df2, "grp", "doc_id", F.col("wt"), 3000, salt="w")
    assert all(r.doc_id < 10_000 for r in out2.collect())


def test_gopher_quality_signals_thresholds(spark):
    # hand-built docs hitting each rule: a good doc passes; each bad
    # doc violates exactly the rule it is built to violate
    from pypeman_spark.functions.text import gopher_quality_signals

    good = " ".join(
        ["the quick brown fox jumps over that lazy dog with style and"] * 6
    )  # 66 words, stopwords: the/that/with/and/over...
    too_short = "the cat sat with that"  # 5 words
    symbol_heavy = " ".join(["word #tag"] * 40)  # 80 words, 40 hashes
    bullets = "\n".join(["- item one here"] * 10)  # 100% bullet lines
    no_alpha = " ".join(["123 456 789 000"] * 20)  # 0% alpha words
    no_stop = " ".join(["alpha beta gamma delta epsilon"] * 12)  # 60 words

    df = spark.createDataFrame(
        [
            (1, good), (2, too_short), (3, symbol_heavy),
            (4, bullets), (5, no_alpha), (6, no_stop),
        ],
        "id int, text string",
    )
    sig = gopher_quality_signals(F.col("text"))
    rows = {
        r["id"]: r
        for r in df.select(
            "id", *[c.alias(n) for n, c in sig.items()]
        ).collect()
    }
    assert rows[1]["passes"] is True
    assert rows[2]["passes"] is False and rows[2]["n_words"] < 50
    assert rows[3]["passes"] is False and rows[3]["symbol_word_ratio"] >= 0.1
    assert rows[4]["passes"] is False and rows[4]["bullet_line_frac"] > 0.9
    assert rows[5]["passes"] is False and rows[5]["alpha_word_frac"] < 0.8
    assert rows[6]["passes"] is False and rows[6]["n_required_words"] < 2


def test_deterministic_shuffle_is_exact_global_rank(spark):
    """The bucketed realization must equal a plain global sort rank:
    positions are a permutation of 0..N-1, stable under repartitioning,
    epoch seeds give different permutations, shards interleave."""
    import hashlib

    from pypeman_spark.functions.sampling import deterministic_shuffle

    ids = list(range(100))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = {
        r["doc_id"]: r
        for r in deterministic_shuffle(df, seed="epoch0", n_shards=4).collect()
    }
    # exact parity with a driver-side global sort of the same keys
    expect = sorted(
        ids, key=lambda i: (hashlib.md5(f"epoch0:{i}".encode()).hexdigest(), i)
    )
    for pos, i in enumerate(expect):
        assert out[i]["global_pos"] == pos
        assert out[i]["shard"] == pos % 4
    # repartitioning must not change a single position
    out7 = {
        r["doc_id"]: r["global_pos"]
        for r in deterministic_shuffle(
            df.repartition(7), seed="epoch0"
        ).collect()
    }
    assert out7 == {i: r["global_pos"] for i, r in out.items()}
    # a different epoch is a genuinely different permutation
    out_e1 = {
        r["doc_id"]: r["global_pos"]
        for r in deterministic_shuffle(df, seed="epoch1").collect()
    }
    assert out_e1 != {i: r["global_pos"] for i, r in out.items()}
    assert sorted(out_e1.values()) == list(range(100))


def test_deterministic_shuffle_duplicate_ids_total_order(spark):
    """Duplicate ids under the same seed tie on the hash key; the id
    tiebreak must still assign distinct consecutive positions (rank
    stays a permutation, never a gap or repeat)."""
    from pypeman_spark.functions.sampling import deterministic_shuffle

    df = spark.createDataFrame(
        [(5,), (5,), (5,), (9,)], "doc_id long"
    )
    pos = sorted(
        r["global_pos"]
        for r in deterministic_shuffle(df, seed="s").collect()
    )
    assert pos == [0, 1, 2, 3]
