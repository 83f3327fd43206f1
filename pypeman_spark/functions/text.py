"""Text-analysis operators for training-data pipelines.

All pure built-in column expressions (JVM-side, whole-stage-codegen) —
no UDFs anywhere, so these run at full scan speed over 100 TB of
documents. Each has an exact ANSI-SQL equivalent (see plans/queries.py)
used as the DuckDB oracle.

Ops: language-ID (stopword-hit heuristic), quality scoring
(length/punct/stopword ratios), token counting (whitespace + BPE-ish
regex), document fingerprinting (bottom-k shingle sketch — the
order-free formulation of a rolling-hash winnow).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "whitespace_token_count",
    "regex_token_count",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "detect_language",
    "fingerprint",
    "scrub_pii",
    "word_repetition_ratio",
    "word_ngrams",
    "joined_windows",
    "top_ngram_stats",
    "top_ngram_char_fraction",
    "duplicate_line_stats",
    "gopher_quality_signals",
    "hashed_linear_score",
    "GOPHER_REQUIRED_WORDS",
    "tfidf_top_terms",
    "bm25_topk",
    "STOPWORDS",
    "clean_lines",
    "TOKEN_REGEX",
    "EMAIL_REGEX",
    "URL_REGEX",
]

# Tiny per-language stopword marker sets (public common words).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "fr": ["le", "la", "les", "de", "et", "est", "dans", "que"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "es": ["el", "la", "los", "de", "y", "es", "en", "que"],
}

#: BPE-ish pre-tokenizer: word | number | single non-space symbol.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def whitespace_token_count(col: Column) -> Column:
    """Count whitespace-separated tokens."""
    return F.size(F.split(F.trim(col), "\\s+"))


def regex_token_count(col: Column) -> Column:
    """BPE-ish token count via TOKEN_REGEX (``regexp_count`` is codegen'd)."""
    return F.regexp_count(col, F.lit(TOKEN_REGEX))


def _word_hits(col: Column, words: list[str]) -> Column:
    """How many occurrences of any marker word (word-boundary match)."""
    pattern = "(?i)\\b(" + "|".join(words) + ")\\b"
    return F.regexp_count(col, F.lit(pattern))


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    punct = F.length(F.regexp_replace(col, "[A-Za-z0-9\\s]", ""))
    return F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    toks = whitespace_token_count(col)
    hits = _word_hits(col, STOPWORDS[lang])
    return F.when(toks > 0, hits.cast("double") / toks).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, not punct-heavy,
    natural stopword density. Deterministic arithmetic only."""
    n = F.length(col)
    len_score = F.least(n.cast("double") / F.lit(500.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 4)
    stop = stopword_ratio(col, "en")
    stop_score = F.least(stop * 5, F.lit(1.0))
    return F.round((len_score + punct_pen + stop_score) / 3, 6)


def detect_language(col: Column) -> Column:
    """Argmax of per-language stopword hit counts; 'und' (undetermined)
    when nothing matches. First-listed language wins ties (deterministic:
    en > fr > de > es)."""
    hits = {lang: _word_hits(col, ws) for lang, ws in STOPWORDS.items()}
    best = F.greatest(*hits.values())
    out = F.lit("und")
    # build reversed so earlier langs take precedence on ties
    for lang in reversed(list(STOPWORDS)):
        out = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(out)
    return out


#: RE2-compatible (works in Spark's Java regex AND DuckDB's RE2, so the
#: oracle can reproduce the scrub exactly).
EMAIL_REGEX = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
URL_REGEX = "https?://[^\\s]+"


def scrub_pii(
    col: Column, email_token: str = "<EMAIL>", url_token: str = "<URL>"
) -> Column:
    """Replace URLs and email addresses with sentinel tokens — the
    standard pre-training scrub pass. URLs first: an email-shaped
    substring inside a URL must not survive as a partial match. Pure
    ``regexp_replace`` (codegen'd, replace-all), so the scrub runs at
    scan speed over the full corpus."""
    out = F.regexp_replace(col, URL_REGEX, url_token)
    return F.regexp_replace(out, EMAIL_REGEX, email_token)


def word_repetition_ratio(col: Column) -> Column:
    """Fraction of word occurrences that are repeats of an earlier word:
    ``1 - |distinct words| / |words|``. The cheap Gopher-style repetition
    signal — boilerplate and degenerate generations score high. Array
    built-ins only; no explode, stays one row per document."""
    w = F.split(F.trim(col), "\\s+")
    return F.round(
        F.lit(1.0) - F.size(F.array_distinct(w)).cast("double") / F.size(w), 6
    )




def word_ngrams(col: Column, n: int) -> Column:
    """Word n-grams of a document as ``array<string>`` (space-joined),
    built by ``zip_with``-ing the word array against its own shifted
    slices — no explode, one row per document.

    The zip formulation matters for cost: ``zip_with`` evaluates its
    ARRAY arguments once per row and then pairs elements, whereas
    ``transform(idx, i -> element_at(w, i))`` re-evaluates the
    ``split`` inside the (interpreted) lambda for every element —
    quadratic in document length. Shorter shifted slices pad with
    null, which marks the trailing positions for one ``filter``."""
    return joined_windows(F.split(F.trim(col), "\\s+"), n)


def joined_windows_sql(w: str, size: int) -> str:
    """SQL-text twin of :func:`joined_windows` for construction-hot
    callers (the MinHash family builds thousands of expression nodes
    per plan): emits ONE ``F.expr`` string instead of one py4j
    round-trip per lambda/slice node. The text parses into the
    identical Catalyst tree — same zip_with chain, same no-else CASE
    WHEN, same trailing null filter."""
    grams = w
    for j in range(1, size):
        shifted = f"slice({w}, {j + 1}, greatest(size({w}) - {j}, 0))"
        grams = (
            f"zip_with({grams}, {shifted}, (a, b) -> "
            f"CASE WHEN (a IS NOT NULL) AND (b IS NOT NULL) "
            f"THEN concat(a, ' ', b) END)"
        )
    if size == 1:
        return grams
    return f"filter({grams}, x -> x IS NOT NULL)"


def joined_windows(w: Column, size: int) -> Column:
    """All full ``size``-word windows of word-array ``w`` as
    space-joined strings (length ``len(w) - size + 1``; empty when the
    doc is shorter than the window). The linear building block behind
    :func:`word_ngrams`, :func:`~..dedup.shingles` and
    :func:`~..dedup.duplicate_passages`."""
    grams = w
    for j in range(1, size):
        shifted = F.slice(
            w, j + 1, F.greatest(F.size(w) - j, F.lit(0))
        )
        grams = F.zip_with(
            grams,
            shifted,
            lambda a, b: F.when(
                a.isNotNull() & b.isNotNull(),
                F.concat(a, F.lit(" "), b),
            ),
        )
    if size == 1:
        return grams
    return F.filter(grams, lambda x: x.isNotNull())


def top_ngram_stats(col: Column, n: int) -> Column:
    """``struct(ngram, cnt)`` of the document's most frequent word
    n-gram, ties broken toward the lexicographically smallest.

    Zero shuffle: instead of explode + groupBy (which would shuffle
    every n-gram of a 100 TB corpus), the n-gram array is sorted
    per-row and the longest run extracted with one ``aggregate`` pass —
    fully codegen'd, cost O(G log G) per document in-memory. The
    explode formulation is kept as the independent DuckDB oracle."""
    s = F.array_sort(word_ngrams(col, n))
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit("").alias("best_ng"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        better = run > acc["best"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["best"]).alias("best"),
            F.when(better, x).otherwise(acc["best_ng"]).alias("best_ng"),
        )

    res = F.aggregate(s, init, step)
    return F.struct(
        res["best_ng"].alias("ngram"), res["best"].alias("cnt")
    )


def top_ngram_stats_sql(c: str, n: int) -> str:
    """SQL text of the run-length fold behind the top-ngram signal:
    the ``named_struct(prev, run, best, best_ng)`` aggregate over the
    sorted n-gram array of column NAME ``c``. Callers stage the fold
    into its OWN projection and compute the char fraction from
    ``.best`` / ``.best_ng`` as cheap attribute lookups — inlining the
    struct into a fraction expression makes each field access re-run
    the whole sort + fold per row (lambda-bearing expressions are
    excluded from subexpression elimination), doubling the dominant
    per-row cost. ``gopher_signals_suite`` is the staged consumer."""
    w = f"split(trim(`{c}`), '\\\\s+')"
    grams = f"array_sort({joined_windows_sql(w, n)})"
    run = "CASE WHEN x = acc.prev THEN acc.run + 1 ELSE CAST(1 AS BIGINT) END"
    better = f"({run}) > acc.best"
    return (
        f"aggregate({grams}, "
        f"named_struct('prev', '', 'run', CAST(0 AS BIGINT), "
        f"'best', CAST(0 AS BIGINT), 'best_ng', ''), "
        f"(acc, x) -> named_struct("
        f"'prev', x, "
        f"'run', {run}, "
        f"'best', CASE WHEN {better} THEN {run} ELSE acc.best END, "
        f"'best_ng', CASE WHEN {better} THEN x ELSE acc.best_ng END))"
    )


def top_ngram_char_fraction(col: Column, n: int) -> Column:
    """Gopher repetition signal: fraction of the document's characters
    contained in occurrences of its most frequent word n-gram
    (``cnt * len(ngram) / len(doc)``). High values flag boilerplate and
    degenerate generations; the Gopher cut-offs are 0.20 for 2-grams
    and 0.18 for 3-grams."""
    st = top_ngram_stats(col, n)
    total = F.length(F.trim(col))
    return F.when(
        total > 0,
        F.round(
            st["cnt"] * F.length(st["ngram"]) / total.cast("double"), 6
        ),
    ).otherwise(F.lit(0.0))


def duplicate_line_stats(col: Column) -> Column:
    """``struct(dup_line_frac, dup_line_char_frac)`` over a
    newline-separated document: the fraction of lines that repeat an
    earlier line, and the fraction of characters inside those repeats —
    the other half of the Gopher repetition suite (cut-offs 0.30 /
    0.20). Pure array expressions, one row per document."""
    lines = F.split(col, "\n")
    dis = F.array_distinct(lines)
    zero = F.lit(0).cast("long")
    total_chars = F.aggregate(lines, zero, lambda a, x: a + F.length(x))
    dis_chars = F.aggregate(dis, zero, lambda a, x: a + F.length(x))
    frac = F.round(
        F.lit(1.0) - F.size(dis).cast("double") / F.size(lines), 6
    )
    char_frac = F.when(
        total_chars > 0,
        F.round(
            F.lit(1.0) - dis_chars.cast("double") / total_chars, 6
        ),
    ).otherwise(F.lit(0.0))
    return F.struct(
        frac.alias("dup_line_frac"), char_frac.alias("dup_line_char_frac")
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Top-``k`` characteristic terms per document by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)``): ``(id, term, score, rank)``.

    Shuffle budget at corpus scale: one explode + groupBy(id, term) for
    term frequencies, one groupBy(term) for document frequencies (both
    map-side-combining on 16 B-ish keys), a broadcast of the bounded
    corpus-size scalar, and one window shuffle on ``id`` for the top-k.
    Ties rank deterministically (score desc, term asc).

    Shape note (r14): a COUNT window over the tf rows partitioned by
    term was tried to remove the df pass entirely, and REJECTED: a
    Zipfian stop word puts ~every document's tf row into ONE window
    partition, an unsplittable single-task straggler (AQE skew
    handling applies to joins, not windows), which is a worse scale
    hazard than the extra linear, well-distributed pass. The groupBy
    side keeps map-side partial aggregation, so no hot-key problem
    exists on this shape.

    Shape note (r15): the df branch previously re-planned the
    tokenize + (id, term) aggregation subtree (column pruning dropped
    the unused ``tf`` count from that copy, de-canonicalizing its
    exchange, so runtime exchange reuse could not fire). The staged
    ``tf`` frame now carries an always-true ``tf >= 1`` guard (a group
    exists ⇒ its count ≥ 1) that pins the count column into BOTH
    consumers — the subtrees canonicalize identically and AQE reuses
    one exchange: the corpus is tokenized and aggregated ONCE at
    runtime, and document frequencies are a cheap second-level
    aggregate over the reused pair shuffle.
    """
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), "\\s+")).alias("term"),
    )
    tf = (
        words.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .filter(F.col("tf") >= 1)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("__n") + 1) / (F.col("df") + 1))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "score", "rank")
    )


def bm25_topk(
    df: DataFrame, query: "list[str]", text_col: str = "text",
    id_col: str = "doc_id", k: int = 10,
    k1: float = 1.2, b: float = 0.75,
    broadcast_candidates: bool = True,
) -> DataFrame:
    """Top-``k`` documents for a term query by Okapi BM25
    (Robertson/Lucene idf ``ln(1 + (N - df + .5)/(df + .5))``):
    ``(id, score_micro, rank)``.

    Scores are integer MICRO-units (each term's contribution rounded
    to 1e-6 then summed as BIGINT) — floating-point summation order
    can differ between engines and partitionings, so the exact-compare
    contract holds by construction instead of by luck.

    Shuffle budget at corpus scale: one narrow scan computes per-doc
    length and per-term frequencies as array expressions, one 1-row
    aggregate (N, avgdl, per-term document frequencies) broadcasts
    back, and the top-k is TakeOrdered — no token explode, no
    (doc, term) shuffle, no global sort, no window over the corpus.
    Ties rank deterministically (score desc, id asc).

    Single-pass narrow form: because the scoring terms are a known
    list, per-(doc, term) frequencies need no explode + groupBy at
    all — ``tf_i = size(filter(words, x -> x = term_i))`` is a narrow
    map, so the WHOLE pipeline is one corpus scan feeding (a) a 1-row
    aggregate (N, avgdl, per-term document frequencies) that
    broadcasts back and (b) the per-doc score expression, finished by
    TakeOrdered. Zero corpus-cardinality shuffles: the former
    formulation shuffled (doc, term) token rows into a tf aggregation
    whose subtree was recomputed THREE times (df, candidate ids,
    contributions — column pruning makes the exchanges differ, so
    runtime exchange reuse never fires), then semi-joined per-doc
    lengths back. It also needed a driver-side candidate-id broadcast
    whose OOM hazard ``broadcast_candidates=False`` existed to
    escape; the narrow form broadcasts only the 1-row stats frame, so
    the flag is vestigial and kept for API compatibility (both values
    plan identically; the rank-identity lock in
    ``tests/test_plan_quality.py`` still runs both).
    """
    del broadcast_candidates  # no driver-side candidate set exists
    terms = list(dict.fromkeys(query))
    q = len(terms)
    words = f"split(trim(`{text_col}`), '\\\\s+')"

    def lit_s(t: str) -> str:
        return "'" + t.replace("'", "''") + "'"

    # ONE aggregate pass over the token array builds dl and every
    # per-term count together (__cnt[0] = dl, __cnt[i+1] = tf_i), so
    # the text is tokenized once per row — per-term size(filter(...))
    # columns would each re-evaluate the split, because lambda-bearing
    # expressions are excluded from subexpression elimination.
    # Counting elements agrees exactly with the former explode + count
    # (empty text -> [''] -> 1 both ways).
    cases = " ".join(
        "WHEN x = {t} THEN array({inc})".format(
            t=lit_s(t),
            inc=", ".join(
                f"acc[{j}] + {1 if j in (0, i + 1) else 0}"
                for j in range(q + 1)
            ),
        )
        for i, t in enumerate(terms)
    )
    keep = ", ".join(f"acc[{j}]" for j in range(1, q + 1))
    cnt = (
        f"aggregate({words}, array_repeat(0, {q + 1}), (acc, x) -> "
        f"CASE {cases} ELSE array(acc[0] + 1, {keep}) END)"
    )
    base = df.select(F.col(id_col), F.expr(cnt).alias("__cnt"))
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.expr("avg(__cnt[0])").alias("__avgdl"),
        *[
            F.expr(f"sum(CAST(__cnt[{i + 1}] > 0 AS BIGINT))")
            .alias(f"df{i}")
            for i in range(q)
        ],
    )
    # per-term micro contribution, operation order EXACTLY as the
    # oracle SQL (ln(1 + (N - df + .5)/(df + .5)) * tf * (k1+1) /
    # (tf + k1*((1-b) + b*dl/avgdl)) * 1e6, round, BIGINT). Float
    # literals carry the D suffix: a bare SQL `0.5` is a DECIMAL
    # literal and `bigint + decimal` would run in decimal arithmetic
    # (different rounding than the Column API's pure-double chain);
    # `0.5D` is a double, and repr(float) round-trips exactly.
    contribs = [
        (
            f"CASE WHEN __cnt[{i + 1}] > 0 THEN CAST(round("
            f"ln(1.0D + (__n - df{i} + 0.5D) / (df{i} + 0.5D))"
            f" * __cnt[{i + 1}] * {k1 + 1.0!r}D"
            f" / (__cnt[{i + 1}] + {k1!r}D * ({1.0 - b!r}D"
            f" + {b!r}D * __cnt[0] / __avgdl))"
            f" * 1000000.0D, 0) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )
        for i in range(q)
    ]
    # the matched predicate must NOT push below the crossJoin: predicate
    # pushdown substitutes the __cnt alias, re-evaluating the whole
    # token aggregate per row inside the pushed Filter (and again in
    # the Project). The always-false `__n < 0` DISJUNCT references the
    # stats side, and a disjunction spanning both join sides cannot be
    # split or pushed (an AND conjunct would be split and each side
    # pushed separately), so the Filter stays above the join where
    # __cnt is an already-computed attribute.
    matched = " OR ".join(f"__cnt[{i + 1}] > 0" for i in range(q))
    scored = (
        base.crossJoin(F.broadcast(stats))
        .filter(F.expr(f"__n < 0 OR ({matched})"))
        .select(
            F.col(id_col),
            F.expr(" + ".join(contribs)).alias("score_micro"),
        )
    )
    top = scored.orderBy(
        F.desc("score_micro"), F.asc(id_col)
    ).limit(k)
    w = Window.orderBy(F.desc("score_micro"), F.asc(id_col))
    return top.withColumn(
        "rank", F.row_number().over(w)
    ).select(id_col, "score_micro", "rank")


def fingerprint(col: Column, shingle_len: int = 8, k: int = 4) -> Column:
    """Bottom-k sketch fingerprint: md5 each character shingle, keep the
    k smallest hashes, concatenate. Two documents share a fingerprint iff
    their shingle sets' k minima coincide — the set-based equivalent of a
    rolling-hash winnow, but expressible as pure SQL in any engine.

    Implementation: generate shingle start offsets with ``sequence``,
    ``transform`` to md5 hashes, ``array_sort`` + ``slice`` + ``concat``.
    No explode — stays one row per document.
    """
    n_shingles = F.greatest(F.length(col) - F.lit(shingle_len - 1), F.lit(1))
    offsets = F.sequence(F.lit(1), n_shingles)
    hashes = F.transform(offsets, lambda i: F.md5(col.substr(i, F.lit(shingle_len))))
    return F.array_join(F.slice(F.array_sort(hashes), 1, k), "")


def clean_lines(
    col: Column, min_words: int = 4, required_words: list[str] | None = None
) -> Column:
    """C4-style line-level structural cleaning: keep only lines with at
    least ``min_words`` words and (if given) containing one of
    ``required_words`` (C4 keeps lines ending in terminal punctuation;
    for punctuation-free corpora a must-contain stopword list is the
    standard stand-in). Returns the document rebuilt from surviving
    lines, '\\n'-joined in original order.

    Pure array expressions — split, ``filter`` with a per-line word
    count, re-join — fully codegen'd, zero shuffle, order preserved
    without any sort.
    """
    req = [w.lower() for w in (required_words or [])]

    def keep(line: Column) -> Column:
        words = F.split(F.trim(line), "\\s+")
        ok = F.size(words) >= min_words
        if req:
            hit = F.arrays_overlap(
                F.transform(words, F.lower), F.array(*[F.lit(w) for w in req])
            )
            ok = ok & hit
        return ok

    return F.array_join(F.filter(F.split(col, "\n"), keep), "\n")


#: The Gopher rule-set's required common English words (public paper:
#: Rae et al. 2021, "Scaling Language Models", Appendix A quality
#: heuristics) — a document must contain at least 2 distinct ones.
GOPHER_REQUIRED_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_signals(col: Column) -> dict[str, Column]:
    """The Gopher rule-based quality-filter signals, each as a pure
    Column expression over one document (no UDF, no explode — one row
    in, one row out, fully codegen'd, so the filter runs at scan speed
    over a 100 TB corpus):

    * ``n_words`` — whitespace word count (bounds 50..100000);
    * ``mean_word_len`` — mean word length (bounds 3..10);
    * ``symbol_word_ratio`` — (# of ``#`` + non-overlapping ``...``)
      per word (bound < 0.1);
    * ``bullet_line_frac`` — fraction of lines starting with a bullet
      (bound ≤ 0.9);
    * ``ellipsis_line_frac`` — fraction of lines ending in ``...``
      (bound ≤ 0.3);
    * ``alpha_word_frac`` — fraction of words containing at least one
      alphabetic character (bound ≥ 0.8);
    * ``n_required_words`` — distinct hits among
      :data:`GOPHER_REQUIRED_WORDS` (bound ≥ 2);
    * ``passes`` — all bounds hold.

    Returns the signals as a name→Column dict so callers can select
    any subset (``df.select("doc_id", *signals.values())`` after
    ``.alias(name)``); thresholds are the public Gopher paper values."""
    w = F.split(F.trim(col), "\\s+")
    n_words = F.size(w)
    mean_wl = F.round(
        F.aggregate(
            w, F.lit(0.0), lambda acc, x: acc + F.length(x)
        )
        / n_words,
        6,
    )
    symbols = F.regexp_count(col, F.lit("#")) + F.regexp_count(
        col, F.lit("\\.\\.\\.")
    )
    symbol_ratio = F.round(symbols.cast("double") / n_words, 6)
    lines = F.split(col, "\n")
    n_lines = F.size(lines)
    bullet_frac = F.round(
        F.size(F.filter(lines, lambda l: l.rlike("^\\s*[-*•]")))
        .cast("double")
        / n_lines,
        6,
    )
    ellipsis_frac = F.round(
        F.size(F.filter(lines, lambda l: l.rlike("\\.\\.\\.\\s*$")))
        .cast("double")
        / n_lines,
        6,
    )
    alpha_frac = F.round(
        F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))).cast("double")
        / n_words,
        6,
    )
    n_req = None
    for word in GOPHER_REQUIRED_WORDS:
        hit = F.when(col.rlike(f"(?i)\\b{word}\\b"), 1).otherwise(0)
        n_req = hit if n_req is None else n_req + hit
    passes = (
        (n_words >= 50)
        & (n_words <= 100000)
        & (mean_wl >= 3.0)
        & (mean_wl <= 10.0)
        & (symbol_ratio < 0.1)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
        & (alpha_frac >= 0.8)
        & (n_req >= 2)
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "symbol_word_ratio": symbol_ratio,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "alpha_word_frac": alpha_frac,
        "n_required_words": n_req,
        "passes": passes,
    }


def hashed_linear_score(
    col: Column,
    weights: list[float],
    bias: float = 0.0,
    round_to: int = 6,
    hash_fn: str = "xxhash64",
) -> Column:
    """Linear text-classifier inference as a pure Column expression —
    the fastText-style hashing trick, with NO UDF: each whitespace word
    hashes into one of ``len(weights)`` buckets (``xxhash64`` pmod D)
    and the document score is ``bias + mean over words of
    weights[bucket]``, squashed through a sigmoid.

    This is the shape model inference takes at 100 TB when the model is
    small enough to inline: weights live in the PLAN as an array
    literal, scoring runs inside whole-stage codegen at scan speed, and
    the classifier gate becomes an ordinary pushable filter — no Python
    workers, no Arrow transfer, no model files on executors. Train the
    weights offline (sklearn on a sample, fastText, anything) and paste
    them in; quality/toxicity/language gates at corpus scale are
    exactly this shape.

    ``hash_fn``: ``"xxhash64"`` (fastest, Spark-specific) or ``"md5"``
    (first 8 hex digits as the bucket int — engine-portable, so an
    external SQL oracle reproduces scores bit-for-bit)."""
    d = len(weights)
    if d == 0:
        raise ValueError("weights must be non-empty")
    # one F.expr call, not d py4j round-trips (similarity.lit_double_array)
    from .similarity import lit_double_array

    warr = lit_double_array(weights)
    words = F.split(F.trim(col), "\\s+")
    if hash_fn == "xxhash64":
        bucket = lambda w: F.pmod(F.xxhash64(w), F.lit(d))  # noqa: E731
    elif hash_fn == "md5":
        bucket = lambda w: (  # noqa: E731
            F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long") % d
        )
    else:
        raise ValueError(f"unsupported hash_fn {hash_fn!r}")
    total = F.aggregate(
        words,
        F.lit(0.0),
        lambda acc, w: acc
        + F.element_at(warr, (bucket(w) + 1).cast("int")),
    )
    n = F.size(words)
    z = F.lit(float(bias)) + F.when(n > 0, total / n).otherwise(F.lit(0.0))
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), round_to)
