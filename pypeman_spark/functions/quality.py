"""Data-quality constraint checking (Deequ-style, expression-first).

A corpus/warehouse build needs its invariants CHECKED, not assumed:
null-free keys, value ranges, regex shapes, uniqueness, referential
integrity. The design constraint at 100 TB is pass-count:

* all row-level rules evaluate in ONE aggregation over ONE scan —
  each rule is a boolean Column and the report is a single ``agg`` of
  conditional sums (map-side partials, no shuffle of data rows);
* uniqueness folds into the same pass as ``count - count(distinct)``;
* referential integrity is the one rule class that genuinely needs a
  join — a left-anti count against the dimension side, one extra job
  per foreign key. ``broadcast_dims=True`` (the default) hints the
  dimension for the common small-dim case; pass ``False`` when the FK
  target is fact-sized (an unconditional broadcast of an unbounded
  input is an OOM at scale) and AQE picks broadcast-vs-shuffle from
  the measured size instead.

``check`` returns the machine-readable report; ``flag_violations``
attaches a per-row ``violations`` array for quarantine-style routing
(send bad rows to a DLQ path, clean rows onward) — the same
split-by-state shape the Pipeline uses for Drop/Reject. It covers all
three rule classes: row-local rules stay pure expressions in one
scan; ``unique`` marks every row of a duplicated key via a window
count; ``foreign_keys`` marks orphans via a left-anti-derived flag
join — so quarantine routing sees the same rule names ``check``
reports.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["check", "flag_violations", "assert_valid"]


def _tuple_key(cols: Sequence[str]) -> Column:
    """Null-safe AND injective composite key for uniqueness checks: a
    ``struct`` groups/compares field-wise with SQL null-equality
    semantics (GROUP BY / DISTINCT / window partitioning treat
    NULL = NULL per field), so ``(NULL, 'x')`` and ``('x', NULL)``
    never collide and — unlike any string-encoded join — no value
    containing a delimiter sequence can alias a different tuple. The
    struct itself is never NULL, so ``count(key)`` counts every row
    and ``count_distinct(key)`` counts every distinct tuple."""
    return F.struct(*[F.col(c) for c in cols])


def _report_rows(spark, rows):
    return spark.createDataFrame(
        rows, schema="rule string, n_violations bigint, n_rows bigint"
    )


def _sql_str(s: str) -> str:
    """A SQL string literal."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def check(
    df: DataFrame,
    rules: Mapping[str, Column],
    unique: Sequence[Sequence[str]] | None = None,
    foreign_keys: Mapping[str, tuple[Sequence[str], DataFrame, Sequence[str]]]
    | None = None,
    broadcast_dims: bool = True,
) -> DataFrame:
    """Evaluate constraints; return ``(rule, n_violations, n_rows)``.

    ``rules`` maps a rule name to a boolean Column that is True for
    VALID rows (nulls count as violations — an unknown is not a pass).
    ``unique`` lists column tuples that must be duplicate-free.
    ``foreign_keys`` maps a rule name to ``(cols, dim_df, dim_cols)``:
    every non-null ``cols`` tuple must exist in ``dim_df[dim_cols]``.
    ``broadcast_dims=False`` drops the broadcast hint on FK targets so
    AQE sizes the join — required when a target is fact-sized.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, cond in rules.items():
        aggs.append(
            F.sum(
                F.when(cond, F.lit(0)).otherwise(F.lit(1))
            ).alias(f"__v_{name}")
        )
    for cols in unique or []:
        key = _tuple_key(cols)
        aggs.append(
            (F.count(key) - F.count_distinct(key)).alias(
                "__u_" + "_".join(cols)
            )
        )
    # LAZY report: the single-pass aggregation row is unpivoted into
    # (rule, n_violations, n_rows) with explode, and each FK orphan
    # count joins the scalar row back in via a broadcast of two 1-row
    # sides. The former eager shape (agg.collect + per-FK .count +
    # createDataFrame of local rows) ran 2+|fk| separate Spark jobs —
    # and, composed into a two-arm entry, re-scanned the corpus per
    # job; one lazy plan lets ReuseExchange share the fanned-out scan
    # across every arm and drops the local-rows Python conversion.
    agg_row = df.agg(*aggs)
    entries = []
    for name in rules:
        entries.append(
            f"named_struct('rule', {_sql_str(name)}, "
            f"'n_violations', coalesce(`__v_{name}`, 0L))"
        )
    for cols in unique or []:
        rule = "unique(" + ",".join(cols) + ")"
        entries.append(
            f"named_struct('rule', {_sql_str(rule)}, "
            f"'n_violations', coalesce(`__u_{'_'.join(cols)}`, 0L))"
        )
    report = None
    if entries:
        report = agg_row.select(
            F.explode(F.expr("array(" + ",".join(entries) + ")")).alias("__e"),
            F.col("__n").alias("n_rows"),
        ).select(
            F.col("__e.rule").alias("rule"),
            F.col("__e.n_violations").cast("long").alias("n_violations"),
            F.col("n_rows").cast("long").alias("n_rows"),
        )
    n_row = agg_row.select(F.col("__n").cast("long").alias("n_rows"))
    for name, (cols, dim, dim_cols) in (foreign_keys or {}).items():
        probe = df.select(*cols).na.drop()
        target = dim.select(*dim_cols)
        if broadcast_dims:
            target = F.broadcast(target)
        cond = [
            probe[c] == target[d] for c, d in zip(cols, dim_cols)
        ]
        orphans = (
            probe.join(target, cond, "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            .select(F.lit(name).alias("rule"), "n_violations")
        )
        part = orphans.crossJoin(F.broadcast(n_row))
        report = part if report is None else report.unionByName(part)
    if report is None:
        return _report_rows(df.sparkSession, [])
    return report


def flag_violations(
    df: DataFrame,
    rules: Mapping[str, Column],
    out_col: str = "violations",
    unique: Sequence[Sequence[str]] | None = None,
    foreign_keys: Mapping[str, tuple[Sequence[str], DataFrame, Sequence[str]]]
    | None = None,
    broadcast_dims: bool = True,
) -> DataFrame:
    """Attach ``out_col``: array of the names of every rule the row
    violates (empty array = clean). Filter ``size(violations) == 0``
    for the clean stream, route the rest to quarantine.

    Row-local ``rules`` are pure per-row expressions — both branches
    stay in one scan. ``unique`` tuples mark EVERY row of a duplicated
    key (window ``count > 1`` per key — one shuffle on the key, same
    semantics as ``check``'s ``count - count_distinct``). Null key
    parts compare like values (null-safe tuple encoding): two rows
    with the same NULL-bearing tuple are duplicates of each other,
    and tuples with nulls in DIFFERENT positions never alias.
    ``foreign_keys`` mark rows whose
    non-null FK tuple is absent from the dimension, via a left join on
    a deduplicated key set carrying a presence flag (the left-anti
    semantics of ``check``, expressed so matched rows keep flowing);
    ``broadcast_dims`` as in :func:`check`."""
    from pyspark.sql import Window

    flags = [
        F.when(
            cond, F.lit(None).cast("string")
        ).otherwise(F.lit(name))
        for name, cond in rules.items()
    ]
    flag_cols: list[Column] = []
    out = df
    for cols in unique or []:
        name = "unique(" + ",".join(cols) + ")"
        key = _tuple_key(cols)
        w = Window.partitionBy(key)
        fcol = f"__uflag_{'_'.join(cols)}"
        out = out.withColumn(
            fcol,
            F.when(F.count(F.lit(1)).over(w) > 1, F.lit(name)),
        )
        flag_cols.append(F.col(fcol))
    for name, (cols, dim, dim_cols) in (foreign_keys or {}).items():
        keyset = (
            dim.select(
                *[F.col(d).alias(f"__fk_{c}") for c, d in zip(cols, dim_cols)]
            )
            .dropDuplicates()
            .withColumn("__fk_present", F.lit(True))
        )
        if broadcast_dims:
            keyset = F.broadcast(keyset)
        cond = None
        for c in cols:
            term = out[c] == keyset[f"__fk_{c}"]
            cond = term if cond is None else (cond & term)
        fcol = f"__fkflag_{name}"
        joined = out.join(keyset, cond, "left")
        any_null = None
        for c in cols:
            term = F.col(c).isNull()
            any_null = term if any_null is None else (any_null | term)
        out = joined.withColumn(
            fcol,
            # null FK parts are "not applicable", matching check()'s
            # na.drop() on the probe side
            F.when(
                ~any_null & F.col("__fk_present").isNull(), F.lit(name)
            ),
        ).drop("__fk_present", *[f"__fk_{c}" for c in cols])
        flag_cols.append(F.col(fcol))
    result = out.withColumn(
        out_col,
        F.filter(F.array(*flags, *flag_cols), lambda x: x.isNotNull()),
    )
    return result.drop(
        *[c for c in result.columns if c.startswith(("__uflag_", "__fkflag_"))]
    )


def assert_valid(
    df: DataFrame,
    rules: Mapping[str, Column],
    unique: Sequence[Sequence[str]] | None = None,
    foreign_keys=None,
    max_violations: int = 0,
) -> None:
    """Raise ``ValueError`` when any rule exceeds ``max_violations`` —
    the CI/pipeline gate form of :func:`check`."""
    bad = [
        (r["rule"], r["n_violations"])
        for r in check(df, rules, unique, foreign_keys).collect()
        if r["n_violations"] > max_violations
    ]
    if bad:
        detail = ", ".join(f"{name}: {n}" for name, n in bad)
        raise ValueError(f"data-quality violations: {detail}")
