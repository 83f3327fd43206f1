"""End-to-end warehouse build over the event stream — the analytics
family composed the way a nightly batch would run it:

1. **Quality gate** — constraint report + per-row violation flags;
   violating rows quarantine, clean rows flow on
   (`functions.quality.check` / `flag_violations`).
2. **Resample** — regular hourly grid per event type with forward
   fill, gap cells marked (`functions.timeseries.resample`).
3. **Dimension versioning** — SCD2 apply of segment changes derived
   from the stream (`functions.scd.scd2_apply`).
4. **Funnel** — ordered signup → view → purchase completion depths
   (`functions.stats.funnel`).
5. **Distinct reach** — mergeable HLL sketches per event type
   (`functions.stats.grouped_distinct_estimate`).

Each stage is a DataFrame → DataFrame transform; the quality gate is
the only action before the final writes (its report is one 1-row agg).

Run: ``python examples/warehouse_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from pypeman_spark import get_spark
from pypeman_spark.functions.quality import check, flag_violations
from pypeman_spark.functions.scd import scd2_apply
from pypeman_spark.functions.stats import funnel, grouped_distinct_estimate
from pypeman_spark.functions.timeseries import resample
from pypeman_spark.sources.tables import load_table

def rules():
    # built lazily: Column construction needs an active SparkSession
    return {
        "value_in_range": (F.col("value") >= 0) & (F.col("value") <= 1000),
        "user_present": F.col("user_id").isNotNull(),
        "type_known": F.col("event_type").isin(
            "click", "view", "purchase", "signup", "error"
        ),
    }


def build(spark, sf_dir: str) -> dict[str, DataFrame]:
    events = load_table(spark, sf_dir, "events")

    qrules = rules()
    quality_report = check(events, qrules)
    flagged = flag_violations(events, qrules)
    clean = flagged.filter(F.size("violations") == 0).drop("violations")
    quarantine = flagged.filter(F.size("violations") > 0)

    hourly = resample(
        clean.withColumn(
            "value", F.round(F.col("value") * 100).cast("long")
        ),
        "event_type", "ts", "value", step_seconds=3600,
        agg="sum", fill="ffill",
    ).withColumn("value", F.col("value") / 100.0)

    dim = clean.groupBy("user_id").agg(
        F.min("ts").alias("valid_from")
    ).select(
        "user_id",
        F.lit("new").alias("segment"),
        "valid_from",
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    seg_changes = clean.filter(F.col("event_type") == "purchase").select(
        "user_id", F.lit("buyer").alias("segment"),
        F.col("ts").alias("valid_from"),
    ).groupBy("user_id", "segment").agg(
        F.min("valid_from").alias("valid_from")
    )
    dim_history = scd2_apply(
        dim, seg_changes, key_cols=["user_id"], attr_cols=["segment"],
        ts_col="valid_from",
    )

    funnel_report = funnel(
        clean, "user_id", "ts", "event_type",
        ["signup", "view", "purchase"],
    )
    reach = grouped_distinct_estimate(clean, ["event_type"], "user_id")

    return {
        "quality_report": quality_report,
        "quarantine": quarantine,
        "hourly": hourly,
        "dim_history": dim_history,
        "funnel": funnel_report,
        "reach": reach,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("warehouse_example", cpus=8)
    out = build(spark, sf_dir)
    for name, df in out.items():
        n = df.count()
        print(f"{name}: {n} rows")
    report = {
        r["rule"]: r["n_violations"] for r in out["quality_report"].collect()
    }
    print("violations:", report)
    return 0


if __name__ == "__main__":
    sys.exit(main())
