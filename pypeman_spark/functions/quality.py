"""Data-quality constraint checking (Deequ-style, expression-first).

A corpus/warehouse build needs its invariants CHECKED, not assumed:
null-free keys, value ranges, regex shapes, uniqueness, referential
integrity. The design constraint at 100 TB is pass-count:

* all row-level rules evaluate in ONE aggregation over ONE scan —
  each rule is a boolean Column and the report is a single ``agg`` of
  conditional sums (map-side partials, no shuffle of data rows);
* uniqueness folds into the same pass as ``count - count(distinct)``;
* referential integrity is the one rule class that genuinely needs a
  join — a broadcast left-anti count against the (small) dimension
  side, one extra job per foreign key.

``check`` returns the machine-readable report; ``flag_violations``
attaches a per-row ``violations`` array for quarantine-style routing
(send bad rows to a DLQ path, clean rows onward) — the same
split-by-state shape the Pipeline uses for Drop/Reject.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["check", "flag_violations", "assert_valid"]


def _report_rows(spark, rows):
    return spark.createDataFrame(
        rows, schema="rule string, n_violations bigint, n_rows bigint"
    )


def check(
    df: DataFrame,
    rules: Mapping[str, Column],
    unique: Sequence[Sequence[str]] | None = None,
    foreign_keys: Mapping[str, tuple[Sequence[str], DataFrame, Sequence[str]]]
    | None = None,
) -> DataFrame:
    """Evaluate constraints; return ``(rule, n_violations, n_rows)``.

    ``rules`` maps a rule name to a boolean Column that is True for
    VALID rows (nulls count as violations — an unknown is not a pass).
    ``unique`` lists column tuples that must be duplicate-free.
    ``foreign_keys`` maps a rule name to ``(cols, dim_df, dim_cols)``:
    every non-null ``cols`` tuple must exist in ``dim_df[dim_cols]``.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, cond in rules.items():
        aggs.append(
            F.sum(
                F.when(cond, F.lit(0)).otherwise(F.lit(1))
            ).alias(f"__v_{name}")
        )
    for cols in unique or []:
        key = F.concat_ws("\x00", *[F.col(c).cast("string") for c in cols])
        aggs.append(
            (F.count(key) - F.count_distinct(key)).alias(
                "__u_" + "_".join(cols)
            )
        )
    row = df.agg(*aggs).collect()[0]
    n = row["__n"]
    out = [(name, int(row[f"__v_{name}"] or 0), n) for name in rules]
    for cols in unique or []:
        out.append(
            ("unique(" + ",".join(cols) + ")",
             int(row["__u_" + "_".join(cols)] or 0), n)
        )
    for name, (cols, dim, dim_cols) in (foreign_keys or {}).items():
        probe = df.select(*cols).na.drop()
        cond = [
            probe[c] == dim[d] for c, d in zip(cols, dim_cols)
        ]
        orphans = probe.join(
            F.broadcast(dim.select(*dim_cols)), cond, "left_anti"
        ).count()
        out.append((name, int(orphans), n))
    return _report_rows(df.sparkSession, out)


def flag_violations(
    df: DataFrame, rules: Mapping[str, Column], out_col: str = "violations"
) -> DataFrame:
    """Attach ``out_col``: array of the names of every rule the row
    violates (empty array = clean). Pure per-row expression — filter
    ``size(violations) == 0`` for the clean stream, route the rest to
    quarantine; both branches stay in one scan."""
    flags = [
        F.when(
            cond, F.lit(None).cast("string")
        ).otherwise(F.lit(name))
        for name, cond in rules.items()
    ]
    return df.withColumn(
        out_col,
        F.filter(F.array(*flags), lambda x: x.isNotNull()),
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
