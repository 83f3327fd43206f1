"""Byte-pair-encoding tokenizer — distributed training, Arrow encode.

The text suite's token counting (``text.py``) is whitespace + a
BPE-ish regex; a real training-data pipeline budgets and packs by the
TOKENIZER's counts. This module implements actual BPE:

* :func:`train_bpe` — the textbook DISTRIBUTED formulation: training
  never touches the corpus again after one word-frequency aggregation.
  The iterative part runs on the word-frequency table (vocabulary-
  sized — ~10^5-10^6 rows at 100 TB, NOT corpus-sized), one tiny
  Spark job pair per merge: (1) explode adjacent symbol pairs weighted
  by word count and take the argmax, (2) apply the winning merge to
  the symbol strings with one ``regexp_replace``. The table is cached
  and re-checkpointed periodically so the lineage never grows past a
  bound.
* :func:`bpe_encode` / :func:`bpe_token_count` — apply the learned
  merges in rank order. Per-word merge application is inherently
  sequential, so this is an Arrow-batched ``mapInPandas`` with a
  per-batch word cache (real corpora repeat words heavily; the cache
  turns encode into a dict lookup for the bulk of tokens).

Alphabets: ``alphabet="chars"`` (default) uses char-level symbols
with an end-of-word marker; ``alphabet="bytes"`` is the GPT-2-style
byte-level alphabet — the word's UTF-8 bytes, each mapped through the
published printable-unicode bijection (Radford et al. 2019, GPT-2
``encoder.py`` recipe: 256 bytes -> 256 printable code points, no
whitespace/control chars), so the space-delimited symbol machinery
and every trainer work unchanged and ANY UTF-8 text round-trips
losslessly (no unknown symbols, ever — the reason real tokenizers are
byte-level). Training is deterministic (count desc, then
lexicographic pair) so two runs on the same corpus produce identical
vocabularies. The training loop is driver-COORDINATED (k merges = k
tiny jobs) but never driver-EXECUTED — pair counting and merge
application stay distributed.
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = [
    "train_bpe",
    "train_bpe_local",
    "bpe_encode",
    "bpe_token_count",
    "bpe_token_counts_multi",
    "apply_merges",
    "bpe_decode_token",
]

_EOW = "</w>"  # end-of-word marker symbol (spaces impossible)

_B2U: "dict[int, str] | None" = None


def _bytes_to_unicode() -> "dict[int, str]":
    """The GPT-2 byte -> printable-unicode bijection: printable ASCII
    and Latin-1 ranges map to themselves, the remaining 68 bytes to
    U+0100.. — every byte gets a visible, non-space symbol char."""
    global _B2U
    if _B2U is None:
        bs = (
            list(range(ord("!"), ord("~") + 1))
            + list(range(ord("\xa1"), ord("\xac") + 1))
            + list(range(ord("\xae"), ord("\xff") + 1))
        )
        cs = bs[:]
        n = 0
        for b in range(256):
            if b not in bs:
                bs.append(b)
                cs.append(256 + n)
                n += 1
        _B2U = dict(zip(bs, (chr(c) for c in cs)))
    return _B2U


def _unicode_to_bytes() -> "dict[str, int]":
    return {c: b for b, c in _bytes_to_unicode().items()}


def _check_alphabet(alphabet: str) -> None:
    if alphabet not in ("chars", "bytes"):
        raise ValueError(
            f"alphabet must be 'chars' or 'bytes', got {alphabet!r}"
        )


def _word_symbols_py(word: str, alphabet: str) -> list[str]:
    """Base symbol decomposition of one word (no EOW), Python side."""
    if alphabet == "bytes":
        tbl = _bytes_to_unicode()
        return [tbl[b] for b in word.encode("utf-8")]
    return list(word)


def _word_symbols_col(alphabet: str):
    """Base symbol decomposition as a COLUMN over ``word`` — pure
    built-ins for both alphabets. Bytes path: hex-encode the UTF-8
    bytes, slide a 2-char window, look each byte up in a 256-element
    array literal (the bijection folded into the plan)."""
    if alphabet == "bytes":
        tbl = _bytes_to_unicode()
        # 256-element string-array literal in ONE expr call (py4j
        # round-trip per F.lit otherwise; see similarity.lit_double_array)
        lut = F.expr(
            "array("
            + ",".join(
                "'" + tbl[b].replace("\\", "\\\\").replace("'", "\\'") + "'"
                for b in range(256)
            )
            + ")"
        )
        pairs = F.regexp_extract_all(
            F.hex(F.encode(F.col("word"), "UTF-8")), F.lit("(..)"), 1
        )
        return F.transform(
            pairs,
            lambda h: F.element_at(
                lut, F.conv(h, 16, 10).cast("int") + 1
            ),
        )
    return F.split(F.col("word"), "")


def bpe_decode_token(token: str, alphabet: str = "chars") -> str:
    """Invert one token back to text (strip nothing — the caller
    handles EOW): identity for chars, byte-table inversion + UTF-8
    decode for bytes."""
    _check_alphabet(alphabet)
    if alphabet == "bytes":
        inv = _unicode_to_bytes()
        return bytes(inv[c] for c in token).decode("utf-8")
    return token


def _word_freq(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) over the corpus — the ONE corpus-sized job."""
    return (
        df.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    batch: int = 1,
    alphabet: str = "chars",
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ranked merge list ``[(left, right), ...]``.

    Shuffle budget: ONE corpus aggregation (word frequencies), then
    per merge one pair-count aggregation over the cached vocab table
    (symbols exploded from a space-delimited string — ~word-length
    rows per word) and one narrow ``regexp_replace``. Ties break
    deterministically (count desc, pair asc).

    ``batch > 1`` is the standard large-vocab trick: each iteration
    takes the top-``batch`` pairs whose symbols are pairwise disjoint
    (and whose outputs don't feed another selected pair), so their
    counts are provably independent and one chained-replace pass
    applies them all — a 50k vocab costs ~50k/batch job pairs instead
    of 50k. Merges may deviate slightly from canonical rank order
    (documented approximation); ``batch=1`` is exactly canonical, and
    :func:`train_bpe_local` gives canonical merges at production vocab
    sizes by running the loop driver-local. ``alphabet="bytes"`` trains
    over the GPT-2 byte-level symbols (see module docstring) — same
    algorithm, different base decomposition."""
    _check_alphabet(alphabet)
    words = _word_freq(df, text_col).select(
        # "h e l l o <eow>" — symbols space-delimited so a merge is a
        # string replace and pair extraction is a split+slide
        F.concat_ws(
            " ",
            F.concat(
                _word_symbols_col(alphabet),
                F.array(F.lit(_EOW)),
            ),
        ).alias("sym"),
        "n",
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges:
        k = min(max(1, batch), num_merges - len(merges))
        syms = F.split(F.col("sym"), " ")
        pairs = words.select(
            F.explode(
                F.zip_with(
                    F.slice(syms, 1, F.size(syms) - 1),
                    F.slice(syms, 2, F.size(syms) - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("pair"),
            "n",
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(max(1, 4 * k))  # over-fetch: conflicts drop some
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break  # nothing left worth merging
        # greedy disjoint selection (batch=1 degenerates to the argmax):
        # a pair is admitted only if neither operand nor its OUTPUT
        # token collides with any symbol already touched this round, so
        # every admitted pair's count is still exact when its replace
        # runs, and no replace consumes a token another one just made
        selected: list[tuple[str, str, str]] = []
        used: set[str] = set()
        for row in top:
            if row["cnt"] < 2 or len(selected) >= k:
                break
            left, right = row["pair"].split(" ", 1)
            merged = left + right
            if left in used or right in used or merged in used:
                continue
            selected.append((left, right, merged))
            used.update((left, right, merged))
        merges.extend((l, r) for l, r, _m in selected)
        # apply the merges: " left right " -> " leftright " on the
        # delimited string (padded so matches are whole symbols);
        # lookarounds keep the delimiting spaces unconsumed, so the
        # engine's left-to-right scan replaces exactly the canonical
        # non-overlapping occurrence set in ONE pass per pair
        padded = F.concat(F.lit(" "), F.col("sym"), F.lit(" "))
        replaced = padded
        for left, right, merged in selected:
            pat = re.escape(f"{left} {right}")
            # Java Matcher replacement semantics: '$' is a group
            # reference and '\' an escape — quote both
            # (Matcher.quoteReplacement), else a corpus word containing
            # '$' or '\' whose symbols win a merge kills the whole job
            # with INVALID_REGEXP_REPLACE
            repl = merged.replace("\\", "\\\\").replace("$", "\\$")
            replaced = F.regexp_replace(replaced, f"(?<= ){pat}(?= )", repl)
        # localCheckpoint (not cache): materializes AND truncates the
        # logical plan, so step k's plan is one replace over blocks —
        # a cache chain keeps the k-deep lineage alive and OOMs the
        # driver past ~20 merges
        words = words.select(
            F.trim(replaced).alias("sym"), "n"
        ).localCheckpoint(eager=True)
    return merges


def train_bpe_local(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    alphabet: str = "chars",
) -> list[tuple[str, str]]:
    """Same merges as ``train_bpe(batch=1)``, different execution: ONE
    distributed word-frequency aggregation, then the merge loop runs
    driver-local over the collected vocabulary table. The vocabulary is
    ~10^5-10^6 rows even at 100 TB corpus scale — collecting it is a
    bounded control-plane read by this repo's own standard — and with
    incremental pair-count maintenance plus a lazy max-heap each merge
    costs O(affected words), not a Spark job pair. This is the
    production-vocab path (32k-100k merges, ~10^3-10^4 merges/s vs ~1
    merge/s for the distributed loop); keep :func:`train_bpe` for the
    rare corpus whose vocabulary itself cannot sit on the driver.
    Determinism matches exactly: count desc, then pair-string asc
    (UTF-8 byte order == code-point order)."""
    import heapq
    from collections import Counter

    _check_alphabet(alphabet)
    rows = _word_freq(df, text_col).collect()
    words: list[list[str]] = [
        _word_symbols_py(r["word"], alphabet) + [_EOW] for r in rows
    ]
    freq: list[int] = [r["n"] for r in rows]

    pair_counts: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = {}
    for i, s in enumerate(words):
        for p, c in Counter(zip(s, s[1:])).items():
            pair_counts[p] += c * freq[i]
            where.setdefault(p, set()).add(i)

    # lazy-invalidation heap: stale entries are skipped when their
    # recorded count no longer matches the live counter
    heap = [(-c, f"{p[0]} {p[1]}", p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    def _push(p: tuple[str, str]) -> None:
        heapq.heappush(heap, (-pair_counts[p], f"{p[0]} {p[1]}", p))

    def _merge_word(s: list[str], p: tuple[str, str], m: str) -> list[str]:
        out: list[str] = []
        i = 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == p[0] and s[i + 1] == p[1]:
                out.append(m)
                i += 2
            else:
                out.append(s[i])
                i += 1
        return out

    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges and heap:
        negc, _key, pair = heapq.heappop(heap)
        cnt = pair_counts.get(pair, 0)
        if -negc != cnt:
            continue  # stale entry
        if cnt < 2:
            break  # true maximum below threshold: nothing worth merging
        merges.append(pair)
        merged = pair[0] + pair[1]
        for i in sorted(where.get(pair, ())):
            s = words[i]
            old = Counter(zip(s, s[1:]))
            s2 = _merge_word(s, pair, merged)
            new = Counter(zip(s2, s2[1:]))
            for p in set(old) | set(new):
                d = (new[p] - old[p]) * freq[i]
                if d:
                    pair_counts[p] += d
                    if pair_counts[p] <= 0:
                        del pair_counts[p]
                    else:
                        _push(p)
                if new[p] > 0:
                    where.setdefault(p, set()).add(i)
                else:
                    w = where.get(p)
                    if w is not None:
                        w.discard(i)
            words[i] = s2
        where.pop(pair, None)
    return merges


def apply_merges(
    word: str, ranks: dict, alphabet: str = "chars"
) -> list[str]:
    """Encode one word with the learned merge ranks (lowest rank
    first — the canonical BPE application order)."""
    syms = _word_symbols_py(word, alphabet) + [_EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "tokens",
    keep_cols: tuple[str, ...] = (),
    alphabet: str = "chars",
) -> DataFrame:
    """Attach ``out_col``: the BPE token sequence of each document.
    Arrow-batched; a per-batch word→tokens cache collapses repeated
    words to a dict lookup. ``keep_cols`` pass through the Arrow batch
    untouched — downstream consumers (budget/packing) get their keys
    without a corpus-sized self-join back onto the input."""
    import pandas as pd

    _check_alphabet(alphabet)
    ranks = {pair: i for i, pair in enumerate(merges)}
    keep_fields = [df.schema[c] for c in keep_cols]
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            *keep_fields,
            T.StructField(out_col, T.ArrayType(T.StringType())),
        ]
    )

    def _encode(batches: "Iterator[pd.DataFrame]"):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                doc: list[str] = []
                for w in re.split(r"\s+", str(text).lower()):
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = apply_merges(w, ranks, alphabet)
                        cache[w] = got
                    doc.extend(got)
                toks.append(doc)
            out = {id_col: pdf[id_col]}
            for c in keep_cols:
                out[c] = pdf[c]
            out[out_col] = toks
            yield pd.DataFrame(out)

    return df.select(id_col, *keep_cols, text_col).mapInPandas(
        _encode, out_schema
    )


def bpe_token_count(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "n_bpe_tokens",
    keep_cols: tuple[str, ...] = (),
    alphabet: str = "chars",
) -> DataFrame:
    """Per-document token count under the learned tokenizer — the
    number a budget/packing stage should use instead of whitespace
    counts."""
    enc = bpe_encode(
        df, merges, text_col=text_col, id_col=id_col,
        keep_cols=keep_cols, alphabet=alphabet,
    )
    return enc.select(
        id_col, *keep_cols, F.size("tokens").cast("long").alias(out_col)
    )


def bpe_token_counts_multi(
    df: DataFrame,
    specs: "list[tuple[str, list[tuple[str, str]], str, str]]",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Several tokenizers' per-document counts in ONE Arrow pass.

    ``specs``: list of ``(text_col, merges, alphabet, out_col)`` — each
    entry counts ``text_col`` under its own merge table/alphabet with
    the same per-batch word cache as :func:`bpe_encode`, producing
    ``out_col``. Equivalent to joining N :func:`bpe_token_count` calls
    on ``id_col``, but the corpus crosses the JVM→Python boundary once
    instead of N times and the doc_id join disappears (guide §4.1: you
    cannot remove the boundary, but you control how often you cross
    it). Word-level counting is identical code (same ``apply_merges``,
    same ``re.split``/lower discipline), so counts match the
    single-pass form exactly."""
    import pandas as pd

    for _tc, _m, alphabet, _oc in specs:
        _check_alphabet(alphabet)
    ranks = [
        ({pair: i for i, pair in enumerate(merges)}, alphabet)
        for _tc, merges, alphabet, _oc in specs
    ]
    keep_fields = [df.schema[c] for c in keep_cols]
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            *keep_fields,
            *[T.StructField(oc, T.LongType()) for _tc, _m, _a, oc in specs],
        ]
    )
    # two specs may count the SAME text column under different merge
    # tables; select each source column once (a duplicated name would
    # make pdf[col] a 2-column frame, not a Series)
    text_cols = list(dict.fromkeys(tc for tc, _m, _a, _oc in specs))

    def _count(batches: "Iterator[pd.DataFrame]"):
        caches: list[dict[str, int]] = [{} for _ in specs]
        for pdf in batches:
            out = {id_col: pdf[id_col]}
            for c in keep_cols:
                out[c] = pdf[c]
            for si, (tc, _m, _a, oc) in enumerate(specs):
                rk, alphabet = ranks[si]
                cache = caches[si]
                counts = []
                for text in pdf[tc]:
                    n = 0
                    for w in re.split(r"\s+", str(text).lower()):
                        if not w:
                            continue
                        got = cache.get(w)
                        if got is None:
                            got = len(apply_merges(w, rk, alphabet))
                            cache[w] = got
                        n += got
                    counts.append(n)
                out[oc] = counts
            yield pd.DataFrame(out)

    return df.select(id_col, *keep_cols, *text_cols).mapInPandas(
        _count, out_schema
    )
