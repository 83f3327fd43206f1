"""Deterministic, engine-portable sampling for corpus construction.

``df.sample``/``sampleBy`` are seeded-RNG based: the kept set depends on
partitioning and Spark's sampler internals, so it is not reproducible
across engines, re-runs with different file splits, or cluster sizes.
Corpus pipelines need *content-addressed* sampling instead: a document
is kept iff a hash of its id clears a threshold. Properties that matter
at 100 TB:

* **reproducible** anywhere — same ids kept on any engine (md5-based,
  so the DuckDB oracle computes the identical keep-set);
* **stable under data growth** — a doc's keep/drop never changes as
  neighbours arrive (critical for incremental corpus refreshes);
* **consistent splits** — disjoint salts give independent samples; the
  same salt with nested fractions gives nested samples (a 1% sample is
  a subset of the 10% sample), which is how train/val/test splits stay
  leak-free.

All pure column expressions; the filter pushes into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "hash_bucket",
    "hash_sample",
    "stratified_hash_sample",
    "mixture_sample",
    "cap_per_domain",
    "token_budget_sample",
    "upsample_mixture",
    "weighted_sample_per_group",
    "leakage_safe_splits",
    "deterministic_shuffle",
]

#: hash space resolution: fractions quantize to 1/1e6
_BUCKETS = 1_000_000


def hash_bucket(id_col: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 1e6) from md5 of (salt ':' id) — the first
    8 hex chars as an integer. Engine-portable: DuckDB computes the same
    value with ``CAST('0x' || substring(md5(...), 1, 8) AS BIGINT)``."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _BUCKETS


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep rows whose hash bucket < fraction·1e6. Nested: a 0.01 sample
    with the same salt is a strict subset of the 0.1 sample."""
    return df.filter(hash_bucket(F.col(id_col), salt) < int(fraction * _BUCKETS))


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum keep rates (e.g. language rebalancing: keep 10% of
    'en', all of 'fr'). Strata not in ``fractions`` default to
    ``default``. One scan, no shuffle — the rate lookup compiles to a
    CASE expression next to the hash filter."""
    rate = F.lit(int(default * _BUCKETS))
    for k, v in fractions.items():
        rate = F.when(F.col(strata_col) == k, F.lit(int(v * _BUCKETS))).otherwise(rate)
    return df.filter(hash_bucket(F.col(id_col), salt) < rate)


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    weights: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Largest deterministic subsample hitting a target domain mixture.

    Training-corpus construction fixes the *mixture* (e.g. 50% web, 30%
    books, 20% code) rather than per-domain rates; the per-domain keep
    fraction must then be derived from the actual domain counts. With
    target weight ``w_d`` and observed count ``n_d``, the largest total
    ``T`` satisfying ``T*w_d <= n_d`` for every domain is ``T = min_d
    (n_d / w_d)``; each domain keeps fraction ``T*w_d / n_d`` (the
    binding domain keeps everything). Domains outside ``weights`` are
    dropped. Keep rates are hit in expectation via the same
    content-addressed hash filter as `hash_sample`, so the sample is
    reproducible and stable under reruns.

    Two jobs at scale: a map-side-combined count per domain (tiny
    result), then one scan with the per-domain rates broadcast-joined
    in — the 100 TB side is never shuffled.

    A weighted domain absent from the data is ignored (dropped from the
    feasibility minimum): the output then holds the target *ratios
    among the present domains* rather than failing the whole build.

    Shape (r15, guide §2.4): the weighted domains are KNOWN literals,
    so the per-domain counts come from ONE conditional aggregate (no
    groupBy shuffle, no local weights table, no count→cap→rates join
    chain — that chain serialized ~5 tiny AQE stages per call,
    measured 0.89 s of pure stage latency at sf0.1) and the cap/rate
    arithmetic rides in the same 1-row frame, broadcast onto the scan
    as a scalar crossJoin with a CASE lookup. Identical arithmetic on
    identical doubles (count → n/wt → min → floor(cap*wt/n*BUCKETS)),
    identical null/absent-domain semantics (`least` skips the NULL a
    zero count produces; unweighted domains fall to a NULL rate and
    the `<` filter drops them): parity exceptAll=0, oracle-verified.
    Measured 0.89 s → 0.16 s; still two map-side passes over the data
    at 100 TB with nothing per-row added."""
    w_rows = [(k, float(v)) for k, v in sorted(weights.items())]
    counts = [
        F.count(F.when(F.col(domain_col) == k, 1)).alias(f"__n_{i}")
        for i, (k, _) in enumerate(w_rows)
    ]
    cap = F.least(*[
        F.when(F.col(f"__n_{i}") > 0, F.col(f"__n_{i}") / F.lit(v))
        for i, (_, v) in enumerate(w_rows)
    ]).alias("__cap")
    rates = df.agg(*counts).select(
        cap, *[F.col(f"__n_{i}") for i in range(len(w_rows))]
    )
    rate = F.lit(None).cast("long")
    for i, (k, v) in enumerate(w_rows):
        rate = F.when(
            F.col(domain_col) == k,
            F.floor(
                F.col("__cap") * F.lit(v) / F.col(f"__n_{i}") * _BUCKETS
            ).cast("long"),
        ).otherwise(rate)
    cols = [domain_col] + [c for c in df.columns if c != domain_col]
    return (
        df.crossJoin(F.broadcast(rates))
        .filter(hash_bucket(F.col(id_col), salt) < rate)
        .select(*cols)
    )


def cap_per_domain(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    cap: int,
    salt: str = "",
    prefilter_margin: int | None = 4,
) -> DataFrame:
    """Keep at most ``cap`` documents per domain (anti-spam / source
    balancing: no single site dominates the corpus).

    Selection is content-addressed — the ``cap`` lowest hash buckets per
    domain, ties broken by id — so the kept set is deterministic and a
    document's fate never flips when *other* domains grow.

    Scale path: a bare ``row_number`` per domain sorts every row of the
    biggest domain on one reducer chain. With ``prefilter_margin`` set
    (default 4), a first map-side pass keeps only rows whose bucket is
    below ``margin*cap/n_d`` (per-domain counts are a tiny broadcast),
    so the window runs over ~margin*cap rows per domain instead of n_d
    — the 100 TB domain becomes a few thousand rows before the sort.
    The prefiltered result is identical to the full window whenever at
    least ``cap`` rows survive the prefilter (guaranteed in practice:
    the shortfall probability is Chernoff-small, e.g. <1e-40 for
    cap=1000, margin=4, and it is a data-determined property, not a
    per-run coin flip — verified identical by `tests/` and the oracle).
    ``prefilter_margin=None`` disables the optimization.
    """
    from pyspark.sql import Window

    bucket = hash_bucket(F.col(id_col), salt)
    work = df.withColumn("__bucket", bucket)
    if prefilter_margin is not None:
        counts = work.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
        rate = F.least(
            F.lit(_BUCKETS),
            F.ceil(F.lit(float(prefilter_margin * cap * _BUCKETS)) / F.col("__n")),
        ).alias("__rate")
        rates = counts.select(domain_col, rate)
        work = work.join(F.broadcast(rates), domain_col).filter(
            F.col("__bucket") < F.col("__rate")
        ).drop("__rate")
    w = Window.partitionBy(domain_col).orderBy("__bucket", id_col)
    return (
        work.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn", "__bucket")
    )


def token_budget_sample(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    token_col,
    budget: int,
    salt: str = "",
) -> DataFrame:
    """Trim each domain to a token budget: documents are taken in
    content-addressed hash order and kept while the running token total
    stays within ``budget`` (the greedy prefix — how corpus builds pin
    per-source token counts rather than document counts).

    ``token_col`` is a Column of per-document token counts (e.g.
    ``text.whitespace_token_count``). Same ordering determinism as
    `cap_per_domain`; the running sum is one window over the domain
    partition. For domains far exceeding the budget, prefilter with
    `hash_sample` at a rate ~ budget/total_tokens before calling this
    (the exact window then runs over a bounded slice).
    """
    from pyspark.sql import Window

    bucket = hash_bucket(F.col(id_col), salt)
    w = (
        Window.partitionBy(domain_col)
        .orderBy("__bucket", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("__bucket", bucket)
        .withColumn("__toks", token_col)
        .withColumn("__cum", F.sum("__toks").over(w))
        .filter(F.col("__cum") <= budget)
        .drop("__bucket", "__toks", "__cum")
    )


def upsample_mixture(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    factors: dict[str, float],
    default: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Repeat each domain by a fractional factor (epoch weighting: e.g.
    books 2.5x, web 1x, low-quality 0.5x in a fixed token-budget mix).

    Every document gets ``floor(f)`` copies; the fractional remainder
    comes from one extra copy for the deterministic ``hash_bucket <
    frac(f)`` subset — so factors below 1 downsample and above 1
    oversample through the same code path, reproducibly. Output gains a
    ``copy_idx`` column (1..n) so downstream shuffling/packing can keep
    copies apart.

    Pure expressions: the factor lookup compiles to CASE literals
    beside the scan (no counts pass, no shuffle); the repeat is a JVM
    ``explode(sequence(...))`` whose fan-out is the output size itself.
    """
    base = F.lit(int(default))
    extra = F.lit(int((default % 1) * _BUCKETS))
    for k, v in factors.items():
        base = F.when(F.col(domain_col) == k, F.lit(int(v))).otherwise(base)
        extra = F.when(
            F.col(domain_col) == k, F.lit(int((v % 1) * _BUCKETS))
        ).otherwise(extra)
    repeats = base + (hash_bucket(F.col(id_col), salt) < extra).cast("int")
    # sequence(1, 0) would DESCEND ([1, 0]); zero-repeat rows must
    # instead explode an empty array so they drop out entirely.
    copies = F.when(repeats >= 1, F.sequence(F.lit(1), repeats)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn("copy_idx", F.explode(copies))


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Weighted sampling without replacement, k per group — the
    Efraimidis–Spirakis A-ES scheme (each row ranks by ``u^(1/w)`` for
    uniform ``u``; the top-k are a correctly-weighted sample) with the
    uniform drawn content-addressed from `hash_bucket`, so the sample
    is deterministic and engine-reproducible.

    Ranks by the equivalent ``ln(u)/w`` (monotone in u^(1/w), no
    overflow for tiny u). Rows with weight <= 0 are excluded. Same
    window shape as `cap_per_domain`; for very large groups apply its
    prefilter idea first (keep rows with the largest u — hash bucket
    above a count-derived threshold — before the exact window).
    """
    from pyspark.sql import Window

    u = (hash_bucket(F.col(id_col), salt) + F.lit(0.5)) / F.lit(float(_BUCKETS))
    key = F.log(u) / weight_col
    work = df.filter(weight_col > 0).withColumn("__key", key)
    w = Window.partitionBy(group_col).orderBy(F.desc("__key"), id_col)
    return (
        work.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__key")
    )


def leakage_safe_splits(
    df: DataFrame,
    cluster_col: str,
    weights: "dict[str, float] | None" = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign train/val/test splits by hashing the DUPLICATE-CLUSTER id
    instead of the row id, so every member of a near-dup cluster lands
    in the SAME split — the leakage guard a training-data build needs:
    hashing per-document would scatter near-identical texts across
    train and eval, silently contaminating the benchmark.

    ``weights`` maps split name to fraction (default 80/10/10); names
    assign in insertion order over cumulative hash-bucket boundaries,
    so splits are deterministic, engine-reproducible (md5, same as
    :func:`hash_bucket`) and nested under weight changes the way hash
    sampling is. Pure Column expression — no shuffle beyond whatever
    produced ``cluster_col`` (typically
    ``dedup.connected_components``)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    if not (0.999 <= total <= 1.001):
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(F.col(cluster_col), salt)
    expr = None
    # Accumulate boundaries in INTEGER bucket space: each weight is
    # quantized once (round(w * _BUCKETS), same discipline as
    # hash_sample) and the cumulative boundary is an exact integer
    # sum — a float cumsum (0.7 + 0.2 == 0.8999999...) would assign a
    # whole hash bucket to the wrong split via int() truncation.
    boundary = 0
    names = list(weights)
    for name in names[:-1]:
        boundary += int(round(weights[name] * _BUCKETS))
        cond = bucket < boundary
        expr = (
            F.when(cond, F.lit(name)) if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "epoch0",
    n_shards: int | None = None,
    pos_col: str = "global_pos",
) -> DataFrame:
    """Epoch-reproducible global training order: every row gets a
    stable 0-based ``global_pos`` equal to its rank under
    ``md5(seed ':' id)`` — the order a training job reads the corpus
    in. Changing ``seed`` ('epoch1', …) yields an independent
    permutation, so per-epoch reshuffles are a column change, not a
    data movement; re-runs on any engine/cluster-size reproduce the
    identical order (the DuckDB oracle computes the same ranks with a
    plain ``row_number() OVER (ORDER BY md5(...))``).

    Scale path: a global ``ORDER BY`` of 100 TB is a single-partition
    sort at the limit. Instead the hash order is realized as
    (bucket, within-bucket rank) + exact bucket offsets:

    * bucket = first two hex digits of the key (a PREFIX of the sort
      key, so concatenating buckets 0..255 in order IS the key order);
    * per-bucket counts are a 256-row aggregate with map-side combine
      (bounded control-plane read, this module's standard);
    * within-bucket rank is a window over the bucket partition — each
      sort is ~N/256 rows, spread across the cluster;
    * ``global_pos = offset[bucket] + rank - 1`` via a 256-entry map
      literal compiled into the plan (no join).

    ``n_shards`` optionally adds a round-robin ``shard`` column
    (``global_pos % n_shards``) so each training worker reads an
    interleaved, equally-sized slice of the shuffled order.
    Ties (duplicate ids under the same seed) are broken by the id
    itself, keeping the rank total and engine-portable."""
    return deterministic_shuffle_epochs(
        df, [(seed, pos_col, n_shards)], id_col=id_col
    )


def _shuffle_key(seed: str, id_col: str):
    return F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))


def deterministic_shuffle_epochs(
    df: DataFrame,
    specs: "list[tuple[str, str, int | None]]",
    id_col: str = "doc_id",
) -> DataFrame:
    """Several epochs' permutations on ONE frame: ``specs`` is a list
    of ``(seed, pos_col, n_shards_or_None)``. Single-epoch semantics
    are exactly :func:`deterministic_shuffle`; computing the epochs
    together shares one frame, so a multi-epoch consumer needs no
    self-join to line the permutations up (the former two-epoch shape
    paid a full equi-join of two windowed copies of the corpus).

    The bucket offsets are LAZY: per-bucket counts (≤256 rows per
    seed) flow through a cumulative window and broadcast-join back on
    the bucket id — no driver-side ``collect`` in the query path, the
    whole permutation is one plan (the former shape ran an eager
    control-plane counts job per call).

    r15: ALL epochs' offsets come from ONE counts aggregate with the
    seed as a dimension (one narrow id-column scan exploding one
    (seed, bucket) struct per epoch, one ≤256·k-row groupBy, one
    cumulative window partitioned by seed) instead of one scan + agg
    + window chain per epoch. Each epoch broadcast-joins on a derived
    ``seed ':' bucket`` key — deliberately a two-sided join predicate,
    so the optimizer cannot push a per-seed literal filter into the
    broadcast subtree (that would de-canonicalize the copies); the k
    joins then share one identical offsets subtree and runtime
    exchange reuse builds the broadcast ONCE."""
    from pyspark.sql import Window

    def bucket_of(seed: str):
        return F.conv(
            F.substring(_shuffle_key(seed, id_col), 1, 2), 16, 10
        ).cast("int")

    cum = (
        Window.partitionBy("__seed").orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        df.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(seed).alias("__seed"),
                        bucket_of(seed).alias("__b"),
                    )
                    for seed, _, _ in specs
                ])
            ).alias("__sb")
        )
        .select(F.col("__sb.__seed").alias("__seed"),
                F.col("__sb.__b").alias("__b"))
        .groupBy("__seed", "__b")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(
            F.concat(
                F.col("__seed"), F.lit(":"), F.col("__b").cast("string")
            ).alias("__sb_key"),
            F.coalesce(F.sum("__cnt").over(cum), F.lit(0)).alias("__off"),
        )
    )

    out = df
    for seed, pos_col, n_shards in specs:
        kcol, bcol = f"__key_{seed}", f"__bucket_{seed}"
        w = Window.partitionBy(bcol).orderBy(kcol, F.col(id_col))
        out = (
            out.withColumn(kcol, _shuffle_key(seed, id_col))
            .withColumn(bcol, bucket_of(seed))
            .join(
                F.broadcast(offsets),
                F.concat(
                    F.lit(f"{seed}:"), F.col(bcol).cast("string")
                ) == F.col("__sb_key"),
            )
            .withColumn(
                pos_col,
                (
                    F.col("__off") + F.row_number().over(w) - F.lit(1)
                ).cast("bigint"),
            )
            .drop(kcol, bcol, "__sb_key", "__off")
        )
        if n_shards:
            out = out.withColumn(
                "shard", (F.col(pos_col) % F.lit(n_shards)).cast("int")
            )
    return out
