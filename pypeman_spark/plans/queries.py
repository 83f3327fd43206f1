"""Query registry: every SURVEY §2 operator concept + the LLM-pipeline
ops, expressed over the test corpus, each paired with an exact ANSI-SQL
DuckDB oracle.

Conventions (the driver hash-compares after sorting columns by name):

* every computed column is aliased identically on both sides;
* money sums aggregate exact integer cents (``_cents`` /
  ``_sql_cents_sum``): per-row ``CAST(round(x*100) AS BIGINT)`` then an
  integer sum, so results are bit-identical under any partial-agg order
  — double sums are not, once partitioning varies at 100x scale.
  Ratios/averages derive from the exact integer sums; remaining float
  aggregates (non-money doubles) are ``round``-ed on both sides;
* pagination/limit queries order by a unique key so LIMIT is
  deterministic in both engines;
* hashing primitives are md5-hex (byte-identical across engines).

Each entry documents which reference operator(s) it exercises
(file:line into /root/reference).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions import dedup as D
from ..functions import similarity as S
from ..functions import text as TX
from ..sources.tables import load_table


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => rows-only check (non-SQL-expressible)


REGISTRY: dict[str, QuerySpec] = {}


def q(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn, oracle)
        return fn

    return deco


def t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def tp(spark, sf_dir, name):
    """Parallelized load for compute-bound consumers (shingling /
    hashing / vector math): fans a few-row-group file out across cores;
    a no-op on splittable many-row-group layouts (see load_table)."""
    return load_table(spark, sf_dir, name, parallelize=True)


def _cents(col):
    """Per-row exact integer cents. Money inputs are exact 2-dp values;
    ``round(x*100)`` recovers the integer deterministically, and integer
    sums are order-insensitive — unlike double sums, whose partial-agg
    order varies with partitioning at 100x scale. Both engines round
    doubles half-away-from-zero, so the per-row value is identical."""
    return F.round(col * 100).cast("long")


def _sql_cents_sum(expr: str) -> str:
    """DuckDB side of :func:`_cents`: per-row integer cents, summed, with
    the sum cast back to BIGINT (DuckDB sum(BIGINT) is HUGEINT, which
    exports via Arrow as decimal128 and would hash-mismatch)."""
    return f"CAST(sum(CAST(round(({expr}) * 100) AS BIGINT)) AS BIGINT)"


def _sql_int_sum(expr: str) -> str:
    """Integer-valued double column summed exactly (BIGINT out)."""
    return f"CAST(sum(CAST(round({expr}) AS BIGINT)) AS BIGINT)"


# =====================================================================
# A. Relational core (SURVEY §2 note: joins/aggs/windows are pure
# built-in Spark; these are the bench headliners)
# =====================================================================

@q(
    "pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_sql_int_sum('l_quantity')}                                AS sum_qty,
           {_sql_cents_sum('l_extendedprice')}                         AS sum_base_price_cents,
           {_sql_cents_sum('l_extendedprice * (1 - l_discount)')}      AS sum_disc_price_cents,
           {_sql_cents_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge_cents,
           round({_sql_int_sum('l_quantity')} / count(*), 4)           AS avg_qty,
           round({_sql_cents_sum('l_extendedprice')} / 100.0 / count(*), 4) AS avg_price,
           round({_sql_cents_sum('l_discount')} / 100.0 / count(*), 4) AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape. Scale: single scan + partial agg; no join; AQE
    coalesces the 6-group output. Money sums aggregate exact integer
    cents (see _cents) so the result is bit-identical under any
    partial-agg order; averages derive from the exact sums."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("long")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_price_cents"),
            F.sum(_cents(disc_price)).alias("sum_disc_price_cents"),
            F.sum(_cents(disc_price * (1 + F.col("l_tax")))).alias("sum_charge_cents"),
            F.sum(_cents(F.col("l_discount"))).alias("__disc_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price_cents",
            "sum_disc_price_cents",
            "sum_charge_cents",
            F.round(F.col("sum_qty") / F.col("count_order"), 4).alias("avg_qty"),
            F.round(
                F.col("sum_base_price_cents") / 100.0 / F.col("count_order"), 4
            ).alias("avg_price"),
            F.round(
                F.col("__disc_cents") / 100.0 / F.col("count_order"), 4
            ).alias("avg_disc"),
            "count_order",
        )
    )


@q(
    "shipping_priority",
    f"""
    SELECT l_orderkey,
           {_sql_cents_sum('l_extendedprice * (1 - l_discount)')} AS revenue_cents,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue_cents DESC, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape. No broadcast hint on customer — it scales with SF
    (15B rows at 100 TB); AQE broadcasts it at small SF from runtime
    stats, sort-merge at scale. lineitem⋈orders shuffles on orderkey
    only after filters prune."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents")
        )
        .select("l_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue_cents").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@q(
    "local_supplier_volume",
    f"""
    SELECT n_name, {_sql_cents_sum('l_extendedprice * (1 - l_discount)')} AS revenue_cents
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join. Broadcast hints only on the bounded
    dims (nation=25, region=5 rows at every SF); customer/supplier scale
    with SF so AQE picks their strategy — broadcast at bench scale,
    sort-merge on a cluster."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents")
        )
    )


@q(
    "top_orders_per_priority",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def top_orders_per_priority(spark, sf_dir):
    """Top-K per group — Window.partitionBy + row_number (guide pattern)."""
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


@q(
    "rollup_revenue",
    f"""
    SELECT o_orderpriority, o_orderstatus,
           {_sql_cents_sum('o_totalprice')} AS total_cents, count(*) AS n
    FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    """,
)
def rollup_revenue(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.sum(_cents(F.col("o_totalprice"))).alias("total_cents"),
        F.count(F.lit(1)).alias("n"),
    )


@q(
    "pivot_event_values",
    f"""
    SELECT user_id,
           CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
                         FILTER (event_type = 'click'), 0) AS BIGINT)    AS click_sum_cents,
           CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
                         FILTER (event_type = 'view'), 0) AS BIGINT)     AS view_sum_cents,
           CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
                         FILTER (event_type = 'purchase'), 0) AS BIGINT) AS purchase_sum_cents
    FROM events GROUP BY user_id
    """,
)
def pivot_event_values(spark, sf_dir):
    """Pivot as conditional aggregation (one pass, no pivot shuffle)."""
    ev = t(spark, sf_dir, "events")

    def cs(kind):
        return F.coalesce(
            F.sum(F.when(F.col("event_type") == kind, _cents(F.col("value")))),
            F.lit(0).cast("long"),
        ).alias(f"{kind}_sum_cents")

    return ev.groupBy("user_id").agg(cs("click"), cs("view"), cs("purchase"))


@q(
    "sessionize_events",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions
    FROM gaps GROUP BY user_id
    """,
)
def sessionize_events(spark, sf_dir):
    """Sessionization: lag + gap>threshold (guide 'Common OLAP patterns').
    One shuffle on user_id serves both the window and the final agg.

    The oracle casts ``sum(new_session)`` to BIGINT because DuckDB's
    ``sum(INTEGER)`` is HUGEINT, which round-trips through Arrow as
    ``decimal128(38,0)`` — same values, different hashed representation
    (the rounds-1..3 driver hash mismatch). The gap test itself is a
    native interval comparison on the timestamp column — no epoch
    arithmetic, so no long/timestamp flavor sensitivity."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.col("ts")).over(w)
    gap_new = (
        F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")
    ) | prev.isNull()
    return (
        ev.withColumn("new_session", F.when(gap_new, 1).otherwise(0))
        .groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"))
    )


@q(
    "asof_last_view_before_purchase",
    """
    WITH marked AS (
      SELECT user_id, event_id, ts, event_type,
             max(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_ts
      FROM events
    )
    SELECT event_id, user_id, last_view_ts
    FROM marked WHERE event_type = 'purchase'
    """,
)
def asof_last_view_before_purchase(spark, sf_dir):
    """As-of join expressed as a running max over a union'd timeline —
    the Spark-native formulation (no native ASOF operator needed; one
    shuffle on user_id, no range explosion)."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = ev.withColumn(
        "last_view_ts",
        F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    return marked.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "last_view_ts"
    )


@q(
    "hourly_event_rollup",
    f"""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           count(*) AS n, {_sql_cents_sum('value')} AS total_value_cents
    FROM events GROUP BY 1, 2
    """,
)
def hourly_event_rollup(spark, sf_dir):
    """Tumbling-window agg (batch form of the streaming windowed agg —
    streaming/channel.py runs the same expression on readStream)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents(F.col("value"))).alias("total_value_cents"),
        )
    )


@q(
    "distinct_active_users",
    """
    SELECT count(DISTINCT user_id) AS n_users,
           count(DISTINCT event_type) AS n_types
    FROM events
    """,
)
def distinct_active_users(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
    )


@q(
    "semi_anti_join_shapes",
    """
    SELECT 'anti_customers_without_orders' AS mode,
           CAST(count(*) AS BIGINT) AS n
    FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'semi_suppliers_with_shipments' AS mode,
           CAST(count(*) AS BIGINT) AS n
    FROM supplier WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem)
    """,
)
def semi_anti_join_shapes(spark, sf_dir):
    """Composed semi/anti join shapes (r5 consolidation of
    customers_without_orders + suppliers_with_shipments — both arms
    keep their machinery): NOT EXISTS as left_anti, EXISTS as
    left_semi, each counted under a mode tag."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    s_ = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem")
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("anti_customers_without_orders").alias("mode"), "n"
        )
    )
    semi = (
        s_.join(li, s_.s_suppkey == li.l_suppkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("semi_suppliers_with_shipments").alias("mode"), "n"
        )
    )
    return anti.unionByName(semi)


@q(
    "users_set_ops",
    """
    SELECT 'both_purchase_error' AS mode, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'error')
    UNION ALL
    SELECT 'view_no_purchase' AS mode, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'view'
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'purchase')
    """,
)
def users_set_ops(spark, sf_dir):
    """Composed set-operator shapes (r5 consolidation of
    users_purchase_and_error + users_view_no_purchase — both arms keep
    their machinery): INTERSECT via DataFrame.intersect, EXCEPT via
    subtract (set semantics, not exceptAll), unioned under a mode tag."""
    ev = t(spark, sf_dir, "events")
    purchase = ev.filter(F.col("event_type") == "purchase").select("user_id")
    error = ev.filter(F.col("event_type") == "error").select("user_id")
    view = ev.filter(F.col("event_type") == "view").select("user_id")
    both = purchase.intersect(error).select(
        F.lit("both_purchase_error").alias("mode"), "user_id"
    )
    no_buy = view.subtract(purchase).select(
        F.lit("view_no_purchase").alias("mode"), "user_id"
    )
    return both.unionByName(no_buy)


@q(
    "percentiles_and_grouping_sets",
    f"""
    SELECT 'pctl' AS mode, event_type AS k1, CAST(NULL AS VARCHAR) AS k2,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           CAST(NULL AS BIGINT) AS total_cents
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'gset' AS mode, o_orderstatus AS k1, o_orderpriority AS k2,
           CAST(NULL AS DOUBLE) AS p50, CAST(NULL AS DOUBLE) AS p90,
           {_sql_cents_sum('o_totalprice')} AS total_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def percentiles_and_grouping_sets(spark, sf_dir):
    """Composed aggregate shapes (r5 consolidation of
    value_percentiles + grouping_sets_revenue — both machineries kept):
    arm ``pctl`` is the exact interpolated grouped percentiles
    (functions/stats.py:grouped_percentiles; ``exact=False`` is the
    100 TB sketch path), arm ``gset`` is GROUPING SETS through the SQL
    API with exact-cents sums."""
    from ..functions.stats import grouped_percentiles

    ev = t(spark, sf_dir, "events")
    pctl = grouped_percentiles(
        ev, ["event_type"], "value", (0.5, 0.9), exact=True
    ).select(
        F.lit("pctl").alias("mode"),
        F.col("event_type").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        "p50",
        "p90",
        F.lit(None).cast("long").alias("total_cents"),
    )
    t(spark, sf_dir, "orders").createOrReplaceTempView("__orders_gs")
    gset = spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    ).select(
        F.lit("gset").alias("mode"),
        F.col("o_orderstatus").alias("k1"),
        F.col("o_orderpriority").alias("k2"),
        F.lit(None).cast("double").alias("p50"),
        F.lit(None).cast("double").alias("p90"),
        "total_cents",
    )
    return pctl.unionByName(gset)


# =====================================================================
# B. Pypeman operator parity (SURVEY §2.A–§2.G row refs inline)
# =====================================================================

@q(
    "source_scan",
    "SELECT event_id, event_type, props FROM events",
)
def source_scan(spark, sf_dir):
    """Row 1 FileWatcherChannel as batch scan (channels.py:1306)."""
    return t(spark, sf_dir, "events").select("event_id", "event_type", "props")


@q(
    "merge_union",
    """
    SELECT event_id, 'purchase' AS src FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT event_id, 'signup' AS src FROM events WHERE event_type = 'signup'
    """,
)
def merge_union(spark, sf_dir):
    """Row 6 MergeChannel = unionByName (channels.py:1252)."""
    ev = t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.lit("purchase").alias("src")
    )
    b = ev.filter(F.col("event_type") == "signup").select(
        "event_id", F.lit("signup").alias("src")
    )
    return a.unionByName(b)


@q(
    "payload_codecs",
    """
    SELECT 'json_parse' AS src, CAST(event_id AS BIGINT) AS key,
           CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS VARCHAR)
             AS out_a, CAST(NULL AS VARCHAR) AS out_b
    FROM events
    UNION ALL
    SELECT 'json_ser', CAST(event_id AS BIGINT),
           '{"event_id":' || event_id || ',"event_type":"' || event_type
             || '"}', NULL
    FROM events
    UNION ALL
    SELECT 'csv', CAST(c_custkey AS BIGINT),
           concat_ws(',', c_custkey, c_name, c_mktsegment), NULL
    FROM customer
    UNION ALL
    SELECT 'b64', CAST(doc_id AS BIGINT), to_base64(encode(source)),
           decode(from_base64(to_base64(encode(source))))
    FROM documents
    """,
)
def payload_codecs(spark, sf_dir):
    """Rows 11/12/15/20/21 composed in one labeled union (consolidated
    from the former parse_json_payload / serialize_json_payload /
    csv_serialize / b64_roundtrip entries so one driver sample checks
    all four codec surfaces):

    * ``json_parse`` — JsonToPython = get_json_object (nodes.py:468)
    * ``json_ser``  — PythonToJson = to_json(struct) (nodes.py:482)
    * ``csv``       — Python2CSVstr = concat_ws (contrib/csv.py:74)
    * ``b64``       — Encode/B64Encode/B64Decode (nodes.py:495-540)
    """
    ev = t(spark, sf_dir, "events")
    c = t(spark, sf_dir, "customer")
    d = t(spark, sf_dir, "documents")
    nul = F.lit(None).cast("string")
    # both events-derived probes come out of ONE scan: explode an array
    # of per-probe structs instead of unioning two scans of the table
    # (at corpus scale a union of same-table branches is a double read)
    key = F.col("event_id").cast("bigint")
    jp_js = ev.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("json_parse").alias("src"),
                    key.alias("key"),
                    F.get_json_object("props", "$.k").cast("bigint")
                    .cast("string").alias("out_a"),
                    nul.alias("out_b"),
                ),
                F.struct(
                    F.lit("json_ser").alias("src"),
                    key.alias("key"),
                    F.to_json(F.struct("event_id", "event_type"))
                    .alias("out_a"),
                    nul.alias("out_b"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    cs = c.select(
        F.lit("csv").alias("src"),
        F.col("c_custkey").cast("bigint").alias("key"),
        F.concat_ws(",", "c_custkey", "c_name", "c_mktsegment").alias("out_a"),
        nul.alias("out_b"),
    )
    b64 = F.base64(F.encode(F.col("source"), "utf-8"))
    bb = d.select(
        F.lit("b64").alias("src"),
        F.col("doc_id").cast("bigint").alias("key"),
        b64.alias("out_a"),
        F.decode(F.unbase64(b64), "utf-8").alias("out_b"),
    )
    return jp_js.unionByName(cs).unionByName(bb)


@q(
    "map_rename_project",
    """
    SELECT c_custkey AS customer_id, c_name AS full_name,
           coalesce(c_mktsegment, 'UNKNOWN') AS segment,
           round(c_acctbal, 2) AS balance
    FROM customer
    """,
)
def map_rename_project(spark, sf_dir):
    """Row 22 Map/MapItem: rename + default (nodes.py:752, map_item.py:6)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("full_name"),
        F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("segment"),
        F.round(F.col("c_acctbal"), 2).alias("balance"),
    )


@q(
    "join_map_item",
    """
    SELECT s_suppkey, concat_ws(' / ', s_name, n_name) AS supplier_label
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
)
def join_map_item(spark, sf_dir):
    """Row 22 JoinMapItem = concat_ws of several fields (map_item.py:34)."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey",
        F.concat_ws(" / ", "s_name", "n_name").alias("supplier_label"),
    )


@q(
    "ordered_projection",
    """
    SELECT p_partkey AS id, p_name AS name, p_brand AS brand,
           coalesce(p_type, 'n/a') AS type, p_size AS size
    FROM part
    """,
)
def ordered_projection(spark, sf_dir):
    """Row 23 ToOrderedDict = fixed ordered SELECT (nodes.py:805)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("id"),
        F.col("p_name").alias("name"),
        F.col("p_brand").alias("brand"),
        F.coalesce(F.col("p_type"), F.lit("n/a")).alias("type"),
        F.col("p_size").alias("size"),
    )


@q(
    "ctx_before_after",
    """
    SELECT doc_id, text AS ctx_original, upper(text) AS payload
    FROM documents WHERE n_chars < 120
    """,
)
def ctx_before_after(spark, sf_dir):
    """Rows 26-30: columns ARE the context — keep the pre-transform value
    alongside the transformed payload (contrib/ctx.py:10, nodes.py:396)."""
    d = t(spark, sf_dir, "documents")
    return d.filter(F.col("n_chars") < 120).select(
        "doc_id",
        F.col("text").alias("ctx_original"),
        F.upper(F.col("text")).alias("payload"),
    )


@q(
    "filter_drop",
    "SELECT event_id, event_type FROM events WHERE event_type <> 'click'",
)
def filter_drop(spark, sf_dir):
    """Row 33 Drop = filter (nodes.py:358, channels.py:465)."""
    ev = t(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") != "click").select(
        "event_id", "event_type"
    )


@q(
    "route_outcomes",
    """
    SELECT event_id,
           CASE WHEN event_type = 'error' THEN 'error'
                WHEN event_type = 'click' THEN 'dropped'
                WHEN value > 300 THEN 'rejected'
                ELSE 'processed' END AS state
    FROM events
    """,
)
def route_outcomes(spark, sf_dir):
    """Rows 34-36: Reject/when/case as first-match-wins CASE
    (channels.py:354-397)."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", "error")
        .when(F.col("event_type") == "click", "dropped")
        .when(F.col("value") > 300, "rejected")
        .otherwise("processed")
        .alias("state"),
    )


@q(
    "explode_words",
    """
    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
    FROM documents WHERE doc_id < 50
    """,
)
def explode_words(spark, sf_dir):
    """Rows 40-41 YielderNode/generator fan-out = explode (nodes.py:914,
    channels.py:750)."""
    d = t(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") < 50).select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), "\\s+")).alias("word"),
    )


@q(
    "worst_substate_agg",
    """
    WITH states AS (
      SELECT user_id,
             CASE WHEN event_type = 'error' THEN 6
                  WHEN event_type = 'purchase' THEN 4
                  WHEN event_type = 'signup' THEN 3
                  ELSE 2 END AS prio
      FROM events
    )
    SELECT user_id,
           CASE max(prio) WHEN 6 THEN 'error' WHEN 4 THEN 'processed'
                          WHEN 3 THEN 'processing' ELSE 'pending' END AS worst_state,
           count(*) AS n_subs
    FROM states GROUP BY user_id
    """,
)
def worst_substate_agg(spark, sf_dir):
    """Row 42/57: worst-of-substates by STATES_PRIORITY index
    (msgstore.py:687-705) — array_position max, decoded back."""
    ev = t(spark, sf_dir, "events")
    prio = (
        F.when(F.col("event_type") == "error", 6)
        .when(F.col("event_type") == "purchase", 4)
        .when(F.col("event_type") == "signup", 3)
        .otherwise(2)
    )
    decode = (
        F.when(F.col("max_prio") == 6, "error")
        .when(F.col("max_prio") == 4, "processed")
        .when(F.col("max_prio") == 3, "processing")
        .otherwise("pending")
    )
    return (
        ev.withColumn("prio", prio)
        .groupBy("user_id")
        .agg(F.max("prio").alias("max_prio"), F.count(F.lit(1)).alias("n_subs"))
        .select("user_id", decode.alias("worst_state"), "n_subs")
    )


# --- §2.G search surface (msgstore.py:777-867) -----------------------

@q(
    "search_text_window",
    """
    SELECT event_id, ts, props FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-12'
      AND props LIKE '%"k": 9%'
    ORDER BY event_id LIMIT 50
    """,
)
def search_text_window(spark, sf_dir):
    """Row 53: datetime-range + substring search with LIMIT pushdown."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-12").cast("timestamp"))
            & F.col("props").contains('"k": 9')
        )
        .select("event_id", "ts", "props")
        .orderBy("event_id")
        .limit(50)
    )


@q(
    "store_search_suite",
    """
    SELECT 'regex' AS mode, event_id, props AS detail,
           CAST(NULL AS DOUBLE) AS num
    FROM events WHERE regexp_matches(props, '^\\{"k": 9[0-9]')
    UNION ALL
    SELECT 'meta_range' AS mode, event_id, event_type AS detail,
           floor(value * 100 + 0.5) / 100 AS num
    FROM events WHERE value >= 100.0 AND value <= 200.0
    UNION ALL
    SELECT 'keyset' AS mode, event_id, CAST(NULL AS VARCHAR) AS detail,
           CAST(NULL AS DOUBLE) AS num
    FROM (SELECT event_id FROM events WHERE event_id > 5000
          ORDER BY event_id LIMIT 20)
    UNION ALL
    SELECT 'point' AS mode, event_id, substring(props, 1, 10) AS detail,
           CAST(NULL AS DOUBLE) AS num
    FROM events WHERE event_id = 42
    UNION ALL
    SELECT 'total' AS mode, CAST(NULL AS BIGINT) AS event_id,
           CAST(NULL AS VARCHAR) AS detail,
           CAST(count(*) AS DOUBLE) AS num
    FROM events
    """,
)
def store_search_suite(spark, sf_dir):
    """Composed msgstore search surface (r5 consolidation of
    search_regex_anchored + search_meta_range + keyset_pagination +
    point_lookup_preview + total_count — every arm keeps its exact
    machinery, reference msgstore.py:243-251,710-735,766,817-821,292):

    * ``regex`` — anchored rtext regex (reference uses re.match);
    * ``meta_range`` — start_/end_ numeric meta range;
    * ``keyset`` — start_id keyset pagination (filter > last id,
      ORDER BY unique key, LIMIT page — deterministic in both engines);
    * ``point`` — get/get_preview_str point lookup;
    * ``total`` — total().

    One scan feeds the first two arms and the keyset arm after
    pushdown; the arms union under a mode tag with a shared nullable
    schema."""
    ev = t(spark, sf_dir, "events")
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    regex = ev.filter(F.col("props").rlike('^\\{"k": 9[0-9]')).select(
        F.lit("regex").alias("mode"),
        "event_id",
        F.col("props").alias("detail"),
        null_d.alias("num"),
    )
    meta = ev.filter(
        (F.col("value") >= 100.0) & (F.col("value") <= 200.0)
    ).select(
        F.lit("meta_range").alias("mode"),
        "event_id",
        F.col("event_type").alias("detail"),
        # explicit floor(x*100+0.5)/100, NOT round(x, 2): both engines
        # then run the IDENTICAL IEEE ops on the same parquet double.
        # Engine round() implementations disagree on .xx5-adjacent
        # binary values (Spark BigDecimal HALF_UP vs DuckDB float
        # scaling) — caught by the seed-shifted gate
        # (CORRECTNESS_seedshift_r07), invisible on the 2-decimal
        # fixture where round was the identity.
        (F.floor(F.col("value") * 100 + 0.5) / 100).alias("num"),
    )
    keyset = (
        ev.filter(F.col("event_id") > 5000)
        .select("event_id")
        .orderBy("event_id")
        .limit(20)
        .select(
            F.lit("keyset").alias("mode"),
            "event_id",
            null_s.alias("detail"),
            null_d.alias("num"),
        )
    )
    point = ev.filter(F.col("event_id") == 42).select(
        F.lit("point").alias("mode"),
        "event_id",
        F.substring("props", 1, 10).alias("detail"),
        null_d.alias("num"),
    )
    total = ev.agg(F.count(F.lit(1)).alias("__n")).select(
        F.lit("total").alias("mode"),
        F.lit(None).cast("long").alias("event_id"),
        null_s.alias("detail"),
        F.col("__n").cast("double").alias("num"),
    )
    return (
        regex.unionByName(meta)
        .unionByName(keyset)
        .unionByName(point)
        .unionByName(total)
    )


# =====================================================================
# C. Training-data pipeline ops (dedup / similarity / text / multimodal)
# =====================================================================

_DOC_DUP_SQL_BASE = """
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
"""


def _docs_with_dups(spark, sf_dir):
    """Corpus + re-keyed copies of every 5th doc — gives exact-dup
    queries real duplicates to find (the corpus itself is all-distinct)."""
    # exact dedup is shuffle-bound (md5 is map-side cheap; the groupBy
    # parallelizes it) — a pre-repartition would just move the text twice
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    dups = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return d.unionByName(dups)


@q(
    "dedup_exact_keep_first",
    f"""
    WITH corpus AS ({_DOC_DUP_SQL_BASE}),
    keep AS (SELECT min(doc_id) AS doc_id FROM corpus GROUP BY md5(text))
    SELECT c.doc_id FROM corpus c JOIN keep k ON c.doc_id = k.doc_id
    """,
)
def dedup_exact_keep_first(spark, sf_dir):
    """Exact dedup keeping the lowest-id representative."""
    return D.dedupe_exact(_docs_with_dups(spark, sf_dir)).select("doc_id")


_MINHASH_SQL = """
    WITH words AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
      FROM documents WHERE doc_id < 200
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               generate_series(0, greatest(len(w) - 3, 0)),
               i -> array_to_string(w[i+1:i+3], ' '))) AS shingle
      FROM words
    ),
    hashed AS (
      SELECT doc_id, i, min(md5(i || ':' || shingle)) AS minh
      FROM sh, (SELECT unnest(generate_series(0, 15)) AS i)
      GROUP BY doc_id, i
    ),
    bands AS (
      SELECT doc_id, CAST(i // 4 AS INT) AS band,
             md5(string_agg(minh, ',' ORDER BY i)) AS band_hash
      FROM hashed GROUP BY doc_id, CAST(i // 4 AS INT)
    )
"""


@q(
    "dedup_groups_and_bands",
    _MINHASH_SQL
    + f"""
    , corpus AS ({_DOC_DUP_SQL_BASE}),
    groups AS (
      SELECT md5(text) AS content_hash, count(*) AS n_docs,
             array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
      FROM corpus GROUP BY md5(text) HAVING count(*) > 1
    )
    SELECT 'exact_group' AS mode, content_hash AS key,
           CAST(n_docs AS BIGINT) AS n, doc_ids AS detail
    FROM groups
    UNION ALL
    SELECT 'band' AS mode, CAST(doc_id AS VARCHAR) AS key,
           CAST(band AS BIGINT) AS n, band_hash AS detail
    FROM bands
    """,
)
def dedup_groups_and_bands(spark, sf_dir):
    """Composed exact-dup groups + MinHash banding (r5 consolidation of
    dedup_exact_groups + minhash_bands — both machineries fully
    exercised and value-verified): arm ``exact_group`` is the
    hash-groupBy duplicate groups over the corpus-with-duplicates
    (doc_ids serialized to CSV because the hash-compare canonicalizes
    through pandas, which cannot sort list columns); arm ``band`` is
    every (doc, band, band_hash) LSH signature row (16 hash functions,
    4 bands x 4 rows)."""
    groups = D.exact_dup_groups(_docs_with_dups(spark, sf_dir)).select(
        F.lit("exact_group").alias("mode"),
        F.col("content_hash").alias("key"),
        F.col("n_docs").cast("long").alias("n"),
        F.array_join(F.col("doc_ids"), ",").alias("detail"),
    )
    d = tp(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    bands = D.minhash_bands(
        d, num_hashes=16, bands=4, shingle_n=3
    ).select(
        F.lit("band").alias("mode"),
        F.col("doc_id").cast("string").alias("key"),
        F.col("band").cast("long").alias("n"),
        F.col("band_hash").alias("detail"),
    )
    return groups.unionByName(bands)


@q(
    "minhash_near_dup_pairs",
    _MINHASH_SQL
    + """
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    """,
)
def minhash_near_dup_pairs(spark, sf_dir):
    """LSH candidate pairs: docs sharing any band bucket."""
    d = tp(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return D.minhash_candidate_pairs(d, num_hashes=16, bands=4, shingle_n=3)


_INCR_MINHASH_SQL = """
    WITH hist AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 400
    ), newb AS (
      SELECT doc_id + 1000000 AS doc_id, text FROM documents
      WHERE doc_id < 400 AND doc_id % 5 = 0
      UNION ALL
      SELECT doc_id, text FROM documents
      WHERE doc_id >= 400 AND doc_id < 500
    ), hw AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM hist
    ), hsh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               generate_series(0, greatest(len(w) - 3, 0)),
               i -> array_to_string(w[i+1:i+3], ' '))) AS shingle
      FROM hw
    ), hhash AS (
      SELECT doc_id, i, min(md5(i || ':' || shingle)) AS minh
      FROM hsh, (SELECT unnest(generate_series(0, 15)) AS i)
      GROUP BY doc_id, i
    ), hband AS (
      SELECT doc_id, CAST(i // 4 AS INT) AS band,
             md5(string_agg(minh, ',' ORDER BY i)) AS band_hash
      FROM hhash GROUP BY doc_id, CAST(i // 4 AS INT)
    ), nw AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM newb
    ), nsh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               generate_series(0, greatest(len(w) - 3, 0)),
               i -> array_to_string(w[i+1:i+3], ' '))) AS shingle
      FROM nw
    ), nhash AS (
      SELECT doc_id, i, min(md5(i || ':' || shingle)) AS minh
      FROM nsh, (SELECT unnest(generate_series(0, 15)) AS i)
      GROUP BY doc_id, i
    ), nband AS (
      SELECT doc_id, CAST(i // 4 AS INT) AS band,
             md5(string_agg(minh, ',' ORDER BY i)) AS band_hash
      FROM nhash GROUP BY doc_id, CAST(i // 4 AS INT)
    ), cand AS (
      SELECT DISTINCT n.doc_id AS new_id, h.doc_id AS hist_id
      FROM nband n JOIN hband h USING (band, band_hash)
    ), agree AS (
      SELECT c.new_id, c.hist_id, count(*) AS n_agree
      FROM cand c
      JOIN nhash nh ON nh.doc_id = c.new_id
      JOIN hhash hh ON hh.doc_id = c.hist_id
                   AND hh.i = nh.i AND hh.minh = nh.minh
      GROUP BY c.new_id, c.hist_id
    )
    SELECT new_id, hist_id, CAST(n_agree AS BIGINT) AS n_agree
    FROM agree WHERE n_agree >= 8
"""


@q("incremental_minhash_probe", _INCR_MINHASH_SQL)
def incremental_minhash_probe(spark, sf_dir):
    """Incremental near-dup detection against a PERSISTED MinHash
    index (`functions/dedup.py:minhash_index/minhash_probe`): the
    history corpus (doc_id < 400) is indexed ONCE as (id, band,
    band_hash, signature) rows — the shape a pipeline appends to a
    table batch after batch — and a new batch (re-keyed copies of
    every 5th history doc + genuinely new docs 400-499) probes it.
    Candidates come from the (band, band_hash) equi-join; similarity
    is the integer count of agreeing signature components (>= 8 of 16
    = estimated Jaccard >= 0.5), so the history TEXT never
    participates — at 100 TB the probe moves only the new batch's
    index rows plus the collided buckets. Beyond the reference
    engine (pypeman has no dedup surface); recipe per Broder's
    MinHash + banded LSH, incremental per the dedup discipline of
    Lee et al. 2021."""
    d = tp(spark, sf_dir, "documents")
    hist = d.filter(F.col("doc_id") < 400)
    new = (
        hist.filter(F.col("doc_id") % 5 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
        .unionByName(
            d.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 500))
            .select("doc_id", "text")
        )
    )
    idx = D.minhash_index(hist.select("doc_id", "text"))
    return D.minhash_probe(new, idx).select(
        "new_id", "hist_id", "n_agree"
    )


@q(
    "dedup_clusters",
    _MINHASH_SQL.replace("WITH words", "WITH RECURSIVE words", 1)
    + """
    , edges AS (
      SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_hash = b.band_hash
       AND a.doc_id <> b.doc_id
    ),
    reach(node, lab) AS (
      SELECT doc_id, doc_id FROM documents WHERE doc_id < 200
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON r.node = e.dst
    )
    SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node
    """,
)
def dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTER assignment: LSH candidate pairs → distributed
    connected components (functions/dedup.py:connected_components, min-
    label propagation — one equi-join+groupBy per round, O(diameter)
    rounds). The canonical keep-one policy is then ``doc_id ==
    cluster_id``; singletons map to themselves."""
    d = tp(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = D.minhash_candidate_pairs(d, num_hashes=16, bands=4, shingle_n=3)
    clusters = D.connected_components(
        pairs, nodes=d.select(F.col("doc_id").alias("node")),
        assume_canonical=True,
    )
    return clusters.select(
        F.col("node").alias("doc_id"), "cluster_id"
    )


@q(
    "ngram_jaccard_pairs",
    """
    WITH words AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
      FROM documents WHERE doc_id < 100
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               generate_series(0, greatest(len(w) - 3, 0)),
               i -> array_to_string(w[i+1:i+3], ' '))) AS shingle
      FROM words
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           round(i / (sa.sz + sb.sz - i), 6) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = id_a
               JOIN sizes sb ON sb.doc_id = id_b
    WHERE i / (sa.sz + sb.sz - i) >= 0.2
    """,
)
def ngram_jaccard_pairs_q(spark, sf_dir):
    """Exact n-gram Jaccard verifier (threshold 0.2 exposes the corpus's
    synthetic near-dups)."""
    d = tp(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return D.ngram_jaccard_pairs(d, threshold=0.2)


@q(
    "simhash_sketch",
    """
    WITH toks AS (
      SELECT DISTINCT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents WHERE doc_id < 100
    ),
    bits AS (
      SELECT doc_id, b.bit,
             CASE WHEN strpos('02468ace', substring(md5(tok), b.bit + 1, 1)) > 0
                  THEN 1 ELSE -1 END AS v
      FROM toks, (SELECT unnest(generate_series(0, 15)) AS bit) b
    ),
    sums AS (SELECT doc_id, bit, sum(v) AS s FROM bits GROUP BY doc_id, bit)
    SELECT doc_id,
           -- DuckDB's ** yields DOUBLE; Spark emits BIGINT — cast so the
           -- harness's dtype-sensitive hash agrees (values identical)
           CAST(sum(CASE WHEN s > 0 THEN 2 ** bit ELSE 0 END) AS BIGINT) AS simhash
    FROM sums GROUP BY doc_id
    """,
)
def simhash_sketch(spark, sf_dir):
    """16-bit SimHash; bit b = sign of Σ ±1 over tokens, where ±1 is the
    parity of hex digit b of the token's md5 (portable, no int casts)."""
    d = tp(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return D.simhash(d, bits=16)


@q(
    "embedding_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
      SELECT q.query_id, c.vec_id,
             round(list_dot_product(c.v, q.qv) /
                   (sqrt(list_dot_product(c.v, c.v)) *
                    sqrt(list_dot_product(q.qv, q.qv))), 6) AS score
      FROM c, q
    ),
    ranked AS (
      SELECT query_id, vec_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= 5
    """,
)
def embedding_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 (functions/similarity.py:cosine_topk):
    broadcast queries, JVM zip_with dot product."""
    emb = tp(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.cosine_topk(emb, queries, k=5)


@q("lsh_ann_topk", None)  # oracle added programmatically below (plane literals)
def lsh_ann_topk_q(spark, sf_dir):
    """LSH-bucketed ANN (functions/similarity.py:lsh_ann_topk): 4
    deterministic hyperplanes over 64 dims, bucket join, exact re-rank."""
    emb = tp(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.lsh_ann_topk(emb, queries, k=5, num_planes=4, dim=64)


def _bucket_expr(planes: list[list[float]], var: str) -> str:
    lits = [
        "[" + ",".join(f"{v:.1f}" for v in p) + "]::DOUBLE[]" for p in planes
    ]
    return " + ".join(
        f"(CASE WHEN list_dot_product({var}, {lit}) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, lit in enumerate(lits)
    )


def _lsh_oracle() -> str:
    planes = S.hyperplanes(4, 64)
    bucket = _bucket_expr(planes, "v")
    qbucket = _bucket_expr(planes, "qv")
    return f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cb AS (SELECT vec_id, v, {bucket} AS bucket FROM c),
    q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
          FROM embeddings WHERE vec_id < 5),
    qb AS (SELECT query_id, qv, {qbucket} AS bucket FROM q),
    scored AS (
      SELECT qb.query_id, cb.vec_id,
             round(list_dot_product(cb.v, qb.qv) /
                   (sqrt(list_dot_product(cb.v, cb.v)) *
                    sqrt(list_dot_product(qb.qv, qb.qv))), 6) AS score
      FROM cb JOIN qb ON cb.bucket = qb.bucket
    ),
    ranked AS (
      SELECT query_id, vec_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= 5
    """


REGISTRY["lsh_ann_topk"].oracle = _lsh_oracle()


def _lsh_multi_oracle(num_tables: int = 2) -> str:
    per_table = []
    for tt in range(num_tables):
        planes = S.hyperplanes(4, 64, seed=f"t{tt}:")
        bucket = _bucket_expr(planes, "c.v")
        qbucket = _bucket_expr(planes, "q.qv")
        per_table.append(f"""
      SELECT q.query_id, c.vec_id,
             round(list_dot_product(c.v, q.qv) /
                   (sqrt(list_dot_product(c.v, c.v)) *
                    sqrt(list_dot_product(q.qv, q.qv))), 6) AS score
      FROM c JOIN q ON ({bucket}) = ({qbucket})""")
    unioned = "\n      UNION ALL\n".join(per_table)
    return f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
          FROM embeddings WHERE vec_id < 5),
    cand AS (
      SELECT query_id, vec_id, max(score) AS score FROM ({unioned})
      GROUP BY query_id, vec_id
    ),
    ranked AS (
      SELECT query_id, vec_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id) AS rank
      FROM cand
    )
    SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= 5
    """


@q("lsh_ann_multi_topk", None)  # oracle attached below (plane literals)
def lsh_ann_multi_topk_q(spark, sf_dir):
    """Multi-table LSH ANN (functions/similarity.py:lsh_ann_topk_multi):
    2 independent 4-plane tables, OR-amplified candidates, one dedup
    groupBy, exact re-rank — the recall-tunable scale path."""
    emb = tp(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.lsh_ann_topk_multi(
        emb, queries, k=5, num_planes=4, dim=64, num_tables=2
    )


REGISTRY["lsh_ann_multi_topk"].oracle = _lsh_multi_oracle(2)


@q("ivf_index_probe", None)  # oracle: same semantics as ivf_ann_topk
def ivf_index_probe_q(spark, sf_dir):
    """Persisted IVF index: write the corpus partitionBy(cid) + centroid
    table (functions/similarity.py:ivf_index_write), then probe it with
    partition pruning (ivf_probe — PartitionFilters on cid at file-
    listing time). Same deterministic centroids/probes as ivf_ann_topk,
    so the same oracle verifies the round-trip through storage."""
    import hashlib
    import os
    import tempfile

    from ..functions import similarity as S2

    emb = tp(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # deterministic per-(sf_dir, process) location: same-process reruns
    # (bench warmup + timed pass) overwrite in place instead of
    # accumulating mkdtemp garbage, while the pid suffix keeps two
    # concurrent runs against one sf_dir (bench + correctness gate)
    # from overwriting each other's partitions mid-probe
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12] + f"_{os.getpid()}"
    path = os.path.join(
        tempfile.gettempdir(), f"pypeman_ivf_idx_{tag}", "index"
    )
    S2.ivf_index_write(emb, path, n_centroids=8)
    return S2.ivf_probe(spark, path, queries, k=5, nprobe=2)


_STOP_SQL = {
    lang: "|".join(ws) for lang, ws in TX.STOPWORDS.items()
}


@q(
    "text_language_id",
    f"""
    WITH hits AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(text, '(?i)\\b({_STOP_SQL["en"]})\\b')) AS h_en,
             len(regexp_extract_all(text, '(?i)\\b({_STOP_SQL["fr"]})\\b')) AS h_fr,
             len(regexp_extract_all(text, '(?i)\\b({_STOP_SQL["de"]})\\b')) AS h_de,
             len(regexp_extract_all(text, '(?i)\\b({_STOP_SQL["es"]})\\b')) AS h_es
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN h_en > 0 AND h_en >= greatest(h_en, h_fr, h_de, h_es) THEN 'en'
                WHEN h_fr > 0 AND h_fr >= greatest(h_en, h_fr, h_de, h_es) THEN 'fr'
                WHEN h_de > 0 AND h_de >= greatest(h_en, h_fr, h_de, h_es) THEN 'de'
                WHEN h_es > 0 AND h_es >= greatest(h_en, h_fr, h_de, h_es) THEN 'es'
                ELSE 'und' END AS detected
    FROM hits
    """,
)
def text_language_id(spark, sf_dir):
    """Stopword-hit language ID (functions/text.py:detect_language)."""
    d = tp(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", TX.detect_language(F.col("text")).alias("detected"))


@q(
    "text_quality_score",
    f"""
    WITH m AS (
      SELECT doc_id,
             length(text) AS n,
             length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS punct,
             len(string_split_regex(trim(text), '\\s+')) AS toks,
             len(regexp_extract_all(text, '(?i)\\b({_STOP_SQL["en"]})\\b')) AS stops
      FROM documents
    )
    SELECT doc_id,
           round((least(n / 500.0, 1.0)
                + greatest(0.0, 1.0 - (CASE WHEN n > 0 THEN punct::DOUBLE / n ELSE 0 END) * 4)
                + least((CASE WHEN toks > 0 THEN stops::DOUBLE / toks ELSE 0 END) * 5, 1.0)
                 ) / 3, 6) AS quality
    FROM m
    """,
)
def text_quality_score(spark, sf_dir):
    """Composite quality heuristic (functions/text.py:quality_score)."""
    d = tp(spark, sf_dir, "documents")
    return d.select("doc_id", TX.quality_score(F.col("text")).alias("quality"))


@q(
    "token_counts",
    """
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens
    FROM documents
    """,
)
def token_counts(spark, sf_dir):
    """Whitespace + BPE-ish token counting (functions/text.py)."""
    d = tp(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.whitespace_token_count(F.col("text")).alias("ws_tokens"),
        TX.regex_token_count(F.col("text")).alias("bpe_tokens"),
    )


@q(
    "doc_fingerprint",
    """
    SELECT doc_id,
           array_to_string(
             list_sort(list_transform(
               generate_series(1, greatest(length(text) - 7, 1)),
               i -> md5(text[i:i+7])))[1:4], '') AS fp
    FROM documents WHERE doc_id < 100
    """,
)
def doc_fingerprint(spark, sf_dir):
    """Bottom-k shingle-hash fingerprint (functions/text.py:fingerprint)."""
    d = tp(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id", TX.fingerprint(F.col("text"), shingle_len=8, k=4).alias("fp")
    )


@q(
    "multimodal_pipeline",
    r"""
    WITH h AS (
      SELECT doc_id, text, md5(hex(encode(text))) AS hh
      FROM documents WHERE doc_id < 100
    ),
    frames AS (
      SELECT doc_id, count(*) AS n_frames, max(offset_ms) AS max_offset_ms
      FROM (SELECT doc_id FROM documents WHERE doc_id < 20),
           (SELECT unnest(generate_series(0, 4)) * 1000 AS offset_ms)
      GROUP BY doc_id
    ),
    m4 AS (
      SELECT doc_id, CAST(3 AS BIGINT) AS n_mp4_frames,
             '0,1000,2000' AS mp4_ts_csv,
             md5(upper(md5(text || '#0'))) || ',' ||
             md5(upper(md5(text || '#2'))) || ',' ||
             md5(upper(md5(text || '#4'))) AS mp4_fp_csv
      FROM documents WHERE doc_id < 20
    ),
    m3 AS (
      SELECT doc_id,
             CAST(10 + doc_id % 5 AS INTEGER) AS n_mp3_frames,
             CAST(44100 AS INTEGER) AS mp3_sample_rate,
             CAST((10 + doc_id % 5) * 1152 * 1000 // 44100 AS BIGINT)
               AS mp3_duration_ms
      FROM documents WHERE doc_id < 30
    ),
    jr AS (
      SELECT doc_id,
             ('0x' || substr(md5(text), 1, 2))::INT
             || ',' || ('0x' || substr(md5(text), 3, 2))::INT
             || ',' || ('0x' || substr(md5(text), 5, 2))::INT
             || ',' || ('0x' || substr(md5(text), 7, 2))::INT
             || ',' || ('0x' || substr(md5(text), 9, 2))::INT
             || ',' || ('0x' || substr(md5(text), 11, 2))::INT
             || ',' || ('0x' || substr(md5(text), 13, 2))::INT
             || ',' || ('0x' || substr(md5(text), 15, 2))::INT
             || ',' || ('0x' || substr(md5(text), 17, 2))::INT
             || ',' || ('0x' || substr(md5(text), 19, 2))::INT
             || ',' || ('0x' || substr(md5(text), 21, 2))::INT
             || ',' || ('0x' || substr(md5(text), 23, 2))::INT
               AS resized_jpeg_csv
      FROM documents WHERE doc_id < 20
    ),
    pr AS (
      SELECT doc_id,
             ('0x' || substr(md5(text), 9, 2))::INT
             || ',' || ('0x' || substr(md5(text), 11, 2))::INT
             || ',' || ('0x' || substr(md5(text), 13, 2))::INT
             || ',' || ('0x' || substr(md5(text), 15, 2))::INT
             || ',' || ('0x' || substr(md5(text), 17, 2))::INT
             || ',' || ('0x' || substr(md5(text), 19, 2))::INT
             || ',' || ('0x' || substr(md5(text), 21, 2))::INT
             || ',' || ('0x' || substr(md5(text), 23, 2))::INT
             || ',' || ('0x' || substr(md5(text), 25, 2))::INT
             || ',' || ('0x' || substr(md5(text), 27, 2))::INT
             || ',' || ('0x' || substr(md5(text), 29, 2))::INT
             || ',' || ('0x' || substr(md5(text), 31, 2))::INT
               AS resized_png_csv
      FROM documents WHERE doc_id < 20
    )
    SELECT h.doc_id,
           round(CAST('0x' || substring(hh, 1, 4) AS INTEGER) / 65536.0, 6) AS f0,
           round(CAST('0x' || substring(hh, 13, 4) AS INTEGER) / 65536.0, 6) AS f3,
           round(CAST('0x' || substring(hh, 29, 4) AS INTEGER) / 65536.0, 6) AS f7,
           md5(substring(text, 1, 16)) AS resized_md5,
           CAST(16 AS BIGINT) AS size_bytes,
           md5(regexp_replace(text, '(.).', '\1', 'g')) AS resampled_md5,
           CAST(22050 AS INTEGER) AS sample_rate,
           f.n_frames, f.max_offset_ms,
           m.n_mp4_frames, m.mp4_ts_csv, m.mp4_fp_csv,
           a.n_mp3_frames, a.mp3_sample_rate, a.mp3_duration_ms,
           j.resized_jpeg_csv,
           p.resized_png_csv
    FROM h LEFT JOIN frames f USING (doc_id)
         LEFT JOIN m4 m USING (doc_id)
         LEFT JOIN m3 a USING (doc_id)
         LEFT JOIN jr j USING (doc_id)
         LEFT JOIN pr p USING (doc_id)
    """,
)
def multimodal_pipeline(spark, sf_dir):
    """The whole multimodal surface in one per-doc frame (consolidated
    from the former multimodal_decode_features / multimodal_resize /
    multimodal_audio_resample / video_frame_sampling entries so one
    driver sample checks all four):

    * image decode → 8-dim features (``decode_image_features``)
    * image resize 64×64 (``resize_media`` — the TEXT payloads here
      sniff as unknown format, exercising the retained stub arm:
      16-byte cycle)
    * REAL PNG resize (r8): md5-quadrant 8×8 (md5 chars 9-32) → real
      PNG encode → ``resize_media`` 4×4 (sniffs the PNG signature →
      real inflate + filter reconstruction → box-resample → re-encode)
      → real decode; EXACT gate (lossless codec + solid quadrants)
    * REAL JPEG resize (r8): md5-quadrant 8×8 → real q97 encode →
      ``resize_media`` 4×4 (sniffs JPEG → real decode → box-resample →
      re-encode) → real decode; tolerance-boolean gate (≤8/255,
      measured worst 4.75) emits the oracle's expected quadrant CSV or
      CODEC_ERR, and the ``media_meta.format`` tag must prove the real
      path ran
    * audio resample 44100→22050 (``audio_resample``, stub: decimate 2×)
    * video frame sampling (``sample_video_frames``) aggregated to
      per-doc ``n_frames``/``max_offset_ms`` (docs ≥ 20 stay NULL via
      the left join — proving the fan-out is keyed, not cartesian)
    * REAL MP4 container round-trip (r7): six md5-derived frames per
      doc packed into a valid ISO-BMFF file (``frames_to_mp4`` — real
      ftyp/mdat/moov/stbl tables) then frame-sampled at 1 s ticks by
      ``sample_mp4_frames``, which reconstructs per-sample
      (offset, size, timestamp) from the REAL stts/stsz/stsc/stco
      tables and slices actual mdat bytes — the oracle re-derives the
      sampled frames' fingerprints and timestamps arithmetically, so
      any bug in box layout, sample-table math or byte slicing breaks
      the hash. The frame PAYLOAD codec stays honestly external.
    * REAL MP3 frame-sync walk (r7): k=10+doc_id%5 valid-shaped CBR
      frames per doc built Column-side; ``mp3_audio_meta`` walks the
      headers and the oracle re-derives n_frames / sample_rate / the
      exact integer duration — a frame-length, sync or duration-math
      bug breaks the match. PCM decode stays honestly external.

    The first four run the real Arrow ``mapInPandas`` plumbing with
    deterministic stub codecs the oracle reproduces (schema, batching
    and partitioning are the production shape; only the codec bytes are
    fake — see functions/multimodal.py)."""
    from ..functions import multimodal as MM

    d = (
        tp(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", F.encode(F.col("text"), "utf-8").alias("content"))
    )
    feats = MM.decode_image_features(d, binary_col="content", dim=8)

    # k/65536 is exact in float32, so the cast to DOUBLE is lossless and
    # the rounded value (and dtype) match the DOUBLE-typed oracle.
    def f(i: int):
        return F.round(F.element_at("features", i + 1).cast("double"), 6)

    img = feats.select(
        "doc_id", f(0).alias("f0"), f(3).alias("f3"), f(7).alias("f7")
    )
    rez = MM.resize_media(d, width=64, height=64).select(
        "doc_id",
        F.md5(F.col("content")).alias("resized_md5"),
        F.col("media_meta.size_bytes").alias("size_bytes"),
    )
    aud = MM.audio_resample(d, target_hz=22050).select(
        "doc_id",
        F.md5(F.col("content")).alias("resampled_md5"),
        "sample_rate",
    )
    frm = (
        MM.sample_video_frames(
            d.filter(F.col("doc_id") < 20), every_ms=1000,
            fake_duration_ms=5000,
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.max("offset_ms").cast("bigint").alias("max_offset_ms"),
        )
    )
    # mp4 arm: 6 frames per doc at fps=2 (500 ms apart); 1 s sampling
    # picks frames 0/2/4 at ts 0/1000/2000 — all re-derived by the oracle
    d20 = tp(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    frames_df = d20.select(
        "doc_id",
        F.array(
            *[
                F.unhex(F.md5(F.concat(F.col("text"), F.lit(f"#{i}"))))
                for i in range(6)
            ]
        ).alias("frames"),
    )
    sampled = MM.sample_mp4_frames(
        MM.frames_to_mp4(frames_df, fps=2), every_ms=1000
    ).withColumn("fp", F.md5(F.hex(F.col("frame"))))
    mp4 = sampled.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_mp4_frames"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("frame_idx", "ts_ms"))),
                lambda s: s["ts_ms"].cast("string"),
            ),
            ",",
        ).alias("mp4_ts_csv"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("frame_idx", "fp"))),
                lambda s: s["fp"],
            ),
            ",",
        ).alias("mp4_fp_csv"),
    )
    # mp3 arm (r7): k = 10 + doc_id % 5 valid-shaped 128 kbps @ 44100
    # CBR frames built COLUMN-SIDE (header literal + md5-derived
    # filler, exact 417-byte frame length), walked by the REAL
    # frame-sync parser; n_frames / sample_rate / exact integer
    # duration re-derived arithmetically by the oracle
    d30 = tp(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    kcol = (F.lit(10) + F.col("doc_id") % 5).cast("int")
    hdr = F.lit(bytes([0xFF, 0xFB, 0x90, 0xC0]))
    filler = F.encode(
        F.substring(F.repeat(F.md5(F.col("text")), 13), 1, 413), "utf-8"
    )
    one_frame = F.concat(hdr, filler)
    mp3_content = F.concat(
        *[
            F.when(F.lit(i) < kcol, one_frame).otherwise(
                F.lit(b"")
            )
            for i in range(14)
        ]
    )
    mp3 = MM.mp3_audio_meta(
        d30.select("doc_id", mp3_content.alias("content"))
    ).select(
        "doc_id",
        F.col("n_frames").alias("n_mp3_frames"),
        F.col("sample_rate").alias("mp3_sample_rate"),
        F.col("duration_ms").alias("mp3_duration_ms"),
    )
    # jpeg-resize arm (r8 — VERDICT r7 task #5): md5-quadrant 8x8
    # pixels -> REAL jpeg encode (q97) -> resize_media 4x4, which for
    # a sniffed-JPEG payload is the REAL decode -> box-resample ->
    # re-encode chain -> REAL decode to 2x2 grid means. Box-averaging
    # solid quadrants is exact, so the means must land within the
    # measured codec tolerance (worst 4.75/255 over 400 colorings at
    # q97+q97; gate 8.0) of the md5 colors — in-tolerance rows emit the
    # oracle's expected CSV, any resize/codec bug emits CODEC_ERR; the
    # media_meta.format tag must say 'jpeg' (proving the REAL path, not
    # the stub, handled the payload)
    mq = F.upper(F.md5(F.col("text")))
    quad = [F.unhex(F.substring(mq, 1 + 6 * i, 6)) for i in range(4)]
    jrow = [
        F.concat(*([quad[0]] * 4 + [quad[1]] * 4)),
        F.concat(*([quad[2]] * 4 + [quad[3]] * 4)),
    ]
    jpixels = F.concat(*([jrow[0]] * 4 + [jrow[1]] * 4))
    raw8 = d20.select("doc_id", jpixels.alias("content"))
    jrez_df = MM.resize_media(
        MM.raw_rgb_to_jpeg(raw8, 8, 8, quality=97),
        width=4, height=4, quality=97,
    )
    # the format tag rides THROUGH the decode stage (keep_cols) — a
    # separate jfmt branch re-executed the whole encode+resize Python
    # chain a second time and joined it back on doc_id
    jfeat = MM.decode_jpeg_features(
        jrez_df.select(
            "doc_id", "content", F.col("media_meta.format").alias("__fmt")
        ),
        grid=2,
        keep_cols=("__fmt",),
    )
    jexp = d20.select(
        "doc_id",
        F.array(
            *[
                F.conv(F.substring(mq, 2 * i + 1, 2), 16, 10).cast("int")
                for i in range(12)
            ]
        ).alias("__exp"),
    )
    jerr = F.array_max(
        F.zip_with(
            F.col("features"),
            F.transform(F.col("__exp"), lambda x: x.cast("double")),
            lambda a, b: F.abs(a * 255 - b),
        )
    )
    jwithin = (
        (F.col("width") == 4)
        & (F.col("height") == 4)
        & (jerr <= 8.0)
        & (F.col("__fmt") == "jpeg")
    )
    jrez_out = (
        jfeat.join(jexp, "doc_id")
        .select(
            "doc_id",
            F.when(
                jwithin,
                F.concat_ws(
                    ",",
                    F.transform(F.col("__exp"), lambda x: x.cast("string")),
                ),
            )
            .otherwise(F.lit("CODEC_ERR"))
            .alias("resized_jpeg_csv"),
        )
    )
    # png-resize arm (r8): md5-quadrant 8x8 pixels (chars 9-32 of the
    # md5, distinct from the jpeg arm's 1-24) -> REAL PNG encode ->
    # resize_media 4x4 (sniffs the PNG signature -> real inflate +
    # filter reconstruction -> box-resample -> re-encode) -> REAL PNG
    # decode to 2x2 grid means. PNG is lossless and box-averaging
    # solid quadrants is exact, so the gate is EXACT (0.01 tolerance
    # covers only float32 v/255*255 roundoff): in-tolerance rows emit
    # the oracle's expected CSV, any codec/resize bug emits CODEC_ERR;
    # media_meta.format must say 'png' (real path, not the stub).
    pquad = [F.unhex(F.substring(mq, 9 + 6 * i, 6)) for i in range(4)]
    prow = [
        F.concat(*([pquad[0]] * 4 + [pquad[1]] * 4)),
        F.concat(*([pquad[2]] * 4 + [pquad[3]] * 4)),
    ]
    ppixels = F.concat(*([prow[0]] * 4 + [prow[1]] * 4))
    praw8 = d20.select("doc_id", ppixels.alias("content"))
    prez_df = MM.resize_media(
        MM.raw_rgb_to_png(praw8, 8, 8), width=4, height=4
    )
    pfeat = MM.decode_png_features(
        prez_df.select(
            "doc_id", "content", F.col("media_meta.format").alias("__pfmt")
        ),
        grid=2,
        keep_cols=("__pfmt",),
    )
    pexp = d20.select(
        "doc_id",
        F.array(
            *[
                F.conv(F.substring(mq, 2 * i + 9, 2), 16, 10).cast("int")
                for i in range(12)
            ]
        ).alias("__pexp"),
    )
    perr = F.array_max(
        F.zip_with(
            F.col("features"),
            F.transform(F.col("__pexp"), lambda x: x.cast("double")),
            lambda a, b: F.abs(a * 255 - b),
        )
    )
    pwithin = (
        (F.col("width") == 4)
        & (F.col("height") == 4)
        & (perr <= 0.01)
        & (F.col("__pfmt") == "png")
    )
    prez_out = (
        pfeat.join(pexp, "doc_id")
        .select(
            "doc_id",
            F.when(
                pwithin,
                F.concat_ws(
                    ",",
                    F.transform(F.col("__pexp"), lambda x: x.cast("string")),
                ),
            )
            .otherwise(F.lit("CODEC_ERR"))
            .alias("resized_png_csv"),
        )
    )
    return (
        img.join(rez, "doc_id")
        .join(aud, "doc_id")
        .join(frm, "doc_id", "left")
        .join(mp4, "doc_id", "left")
        .join(mp3, "doc_id", "left")
        .join(jrez_out, "doc_id", "left")
        .join(prez_out, "doc_id", "left")
    )


# =====================================================================
# F. Wider relational coverage: semi/anti/correlated/conditional-agg
# shapes + the salted-skew-join pattern (all pure built-in Spark; the
# engine's pipeline API composes with these, SURVEY §2 closing note)
# =====================================================================

@q(
    "order_priority_check",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def order_priority_check(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS = left-semi join. The date filter prunes
    orders before the shuffle; the semi join never materializes lineitem
    columns (ReadSchema stays 3-column at any SF)."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@q(
    "returned_items_report",
    f"""
    SELECT c_custkey, c_name, n_name,
           {_sql_cents_sum('l_extendedprice * (1 - l_discount)')} AS revenue_cents
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue_cents DESC, c_custkey
    LIMIT 20
    """,
)
def returned_items_report(spark, sf_dir):
    """TPC-H Q10 shape. nation broadcast (bounded); customer/orders/
    lineitem strategies left to AQE. TopK = sort+limit (Spark plans
    TakeOrderedAndProject — no full sort at scale)."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents")
        )
        .orderBy(F.col("revenue_cents").desc(), F.col("c_custkey"))
        .limit(20)
    )


@q(
    "small_quantity_revenue",
    f"""
    SELECT CAST(round({_sql_cents_sum('l_extendedprice')} / 7.0) AS BIGINT) AS avg_yearly_cents
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#4'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery = per-key avg window.
    The brand join runs BELOW the window (p_partkey is unique, so the
    inner join keeps exactly the brand parts' lineitems and cannot fan
    out; the correlated avg only reads rows of the same l_partkey, all
    of which survive the join) — the window's shuffle and sort see only
    the brand's ~1/brand-cardinality slice of lineitem instead of all of
    it (r14 continuation-2; result-identical, oracle-gated)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    w = Window.partitionBy("l_partkey")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    flagged = joined.withColumn("__avg_qty", F.avg("l_quantity").over(w))
    return (
        flagged.filter(F.col("l_quantity") < 0.2 * F.col("__avg_qty"))
        .agg(
            F.round(F.sum(_cents(F.col("l_extendedprice"))) / 7.0)
            .cast("long")
            .alias("avg_yearly_cents")
        )
    )


@q(
    "nation_market_share",
    f"""
    SELECT year(o_orderdate) AS o_year,
           round(CAST(sum(CASE WHEN n_name = 'NATION_3'
                          THEN CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)
                          ELSE 0 END) AS BIGINT)
                 / {_sql_cents_sum('l_extendedprice * (1 - l_discount)')}, 6) AS mkt_share
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY year(o_orderdate)
    ORDER BY o_year
    """,
)
def nation_market_share(spark, sf_dir):
    """TPC-H Q8 shape: conditional aggregation (sum(CASE WHEN)) — one
    pass computes both numerator and denominator; no second join."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    rev_cents = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("n_name") == "NATION_3", rev_cents)
                    .otherwise(F.lit(0).cast("long"))
                )
                / F.sum(rev_cents),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@q(
    "customer_order_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def customer_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: left outer join + double aggregation (histogram
    of per-customer order counts). count(o_orderkey) ignores the nulls
    the outer join produces, exactly like SQL."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_SALTED_ORACLE = """
    SELECT e.user_id, u.n_events AS user_total, count(*) AS n_purchases
    FROM events e
      JOIN (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id) u
        ON e.user_id = u.user_id
    WHERE e.event_type = 'purchase'
    GROUP BY e.user_id, u.n_events
"""


def salted_user_event_join_arm(spark, sf_dir):
    """Skew-mitigation pattern: the fact side is salted
    (``pmod(event_id, N)``) and the dim side exploded N× so one hot
    user_id spreads over N tasks instead of one straggler. Result is
    identical to the unsalted join — the oracle proves it. (AQE skew-join
    does this adaptively; explicit salting is the belt-and-braces form
    for extreme keys.)"""
    from ..functions.joins import salted_join

    ev = t(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    fact = ev.filter(F.col("event_type") == "purchase")
    joined = salted_join(
        fact, dim, "user_id", n_salt=8,
        fact_salt=F.pmod(F.col("event_id"), F.lit(8)),
    )
    return joined.groupBy(
        "user_id", F.col("n_events").alias("user_total")
    ).agg(F.count(F.lit(1)).alias("n_purchases"))


_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)

_IVF_ORACLE = f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
             FROM embeddings WHERE vec_id < 8),
    asg AS (
      SELECT vec_id, v, cid FROM (
        SELECT c.vec_id, c.v, cent.cid,
               row_number() OVER (PARTITION BY c.vec_id ORDER BY
                 {_COS.format(a='c.v', b='cent.cv')} DESC, cent.cid) AS rn
        FROM c, cent) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
          FROM embeddings WHERE vec_id < 5),
    probe AS (
      SELECT query_id, qv, cid FROM (
        SELECT q.query_id, q.qv, cent.cid,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 {_COS.format(a='q.qv', b='cent.cv')} DESC, cent.cid) AS rn
        FROM q, cent) WHERE rn <= 2
    ),
    scored AS (
      SELECT probe.query_id, asg.vec_id,
             round({_COS.format(a='asg.v', b='probe.qv')}, 6) AS score
      FROM asg JOIN probe ON asg.cid = probe.cid
    ),
    ranked AS (
      SELECT query_id, vec_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= 5
"""


@q("ivf_ann_topk", _IVF_ORACLE)
def ivf_ann_topk_q(spark, sf_dir):
    """IVF-cell ANN (functions/similarity.py:ivf_ann_topk): 8 cells,
    probe 2, exact cosine re-rank — the partition-pruned scale path next
    to the LSH variant."""
    emb = tp(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.ivf_ann_topk(emb, queries, k=5, n_centroids=8, nprobe=2)


# the persisted-index probe round-trips the same deterministic
# centroids/probes through partitioned parquet, so the in-memory
# variant's oracle verifies it too
REGISTRY["ivf_index_probe"].oracle = _IVF_ORACLE


@q("embedding_near_dup_pairs", None)  # oracle added below (plane literals)
def embedding_near_dup_pairs_q(spark, sf_dir):
    """Embedding-cosine near-dup (functions/dedup.py:
    embedding_near_dup_pairs) in its default LSH-bucketed form: pairs
    are generated only within deterministic hyperplane buckets (equi-
    join, no cartesian — the 100 TB shape). ``exact=True`` is the
    opt-in O(N²) verifier for bounded subsets."""
    emb = tp(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return D.embedding_near_dup_pairs(emb, threshold=0.4, num_planes=4, dim=64)


def _near_dup_oracle() -> str:
    planes = S.hyperplanes(4, 64)
    lits = [
        "[" + ",".join(f"{v:.1f}" for v in p) + "]::DOUBLE[]" for p in planes
    ]
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(v, {lit}) > 0 THEN {1 << i} ELSE 0 END)"
        for i, lit in enumerate(lits)
    )
    return f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cb AS (SELECT vec_id, v, {bucket} AS bucket FROM c)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_COS.format(a='a.v', b='b.v')}, 6) AS cosine
    FROM cb a JOIN cb b ON a.bucket = b.bucket
    WHERE a.vec_id < b.vec_id
      AND {_COS.format(a='a.v', b='b.v')} >= 0.4
    """


REGISTRY["embedding_near_dup_pairs"].oracle = _near_dup_oracle()


@q(
    "two_nation_volume",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume_cents) AS BIGINT) AS revenue_cents
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(o_orderdate) AS l_year,
             CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS volume_cents
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def two_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: bidirectional nation pair filter — the disjunctive
    join predicate sits on two broadcast nation copies, so the big sides
    still join on pure equi-keys."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    supp = t(spark, sf_dir, "supplier")
    cust = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("o_orderdate").alias("l_year"))
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_FORECAST_ORACLE = f"""
    SELECT {_sql_cents_sum('l_extendedprice * l_discount')} AS revenue_delta_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


def forecast_revenue_change(spark, sf_dir):
    """TPC-H Q6 shape: pure scan-and-aggregate — every predicate pushes
    to the parquet scan and the whole query is one map-side partial agg
    + a 1-row final agg; the canonical 'no shuffle of data, only of one
    accumulator' plan."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(
            _cents(F.col("l_extendedprice") * F.col("l_discount"))
        ).alias("revenue_delta_cents")
    )


_Q15_ORACLE = f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             {_sql_cents_sum('l_extendedprice * (1 - l_discount)')} AS total_revenue_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue_cents
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue_cents = (SELECT max(total_revenue_cents) FROM rev)
    ORDER BY s_suppkey
"""


def _top_supplier_revenue_arm(spark, sf_dir):
    """TPC-H Q15 shape (view + correlated max, without the view): one
    shuffle computes per-supplier quarterly revenue; the max is a 1-row
    aggregate broadcast back over the tiny revenue frame (never over
    lineitem), then the supplier dim joins in. The 'keep all ties at
    the max' semantic is preserved exactly."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("total_revenue_cents")
    )
    # materialize the tiny per-supplier frame once: without this, the
    # max-subquery branch would re-scan lineitem (AQE does not reuse the
    # exchange across the agg) — a full second pass at 100 TB
    rev = rev.localCheckpoint()
    mx = rev.agg(F.max("total_revenue_cents").alias("__mx"))
    sup = t(spark, sf_dir, "supplier")
    # ties-at-the-max equality is now on exact BIGINT cents, not doubles
    return (
        rev.join(F.broadcast(mx), rev.total_revenue_cents == F.col("__mx"))
        .join(sup, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_cents")
        .orderBy("s_suppkey")
    )


@q(
    "top_supplier_revenue",
    f"""
    SELECT 'q15' AS mode, s_suppkey, s_name, total_revenue_cents,
           CAST(NULL AS BIGINT) AS revenue_delta_cents
    FROM ({_Q15_ORACLE}) o15
    UNION ALL
    SELECT 'q6', NULL, NULL, NULL, revenue_delta_cents
    FROM ({_FORECAST_ORACLE}) o6
    """,
)
def top_supplier_revenue(spark, sf_dir):
    """Composed revenue pair (r8 consolidation of the former
    top_supplier_revenue / forecast_revenue_change entries — both
    lineitem interval-revenue scans, so one driver check covers both;
    each arm's machinery and oracle run verbatim, see
    REGISTRY_CHANGES.md):

    Arm ``q15``: per-supplier quarterly revenue, ties-at-the-max via a
    1-row broadcast scalar (``_top_supplier_revenue_arm``). Arm ``q6``:
    the pure scan-and-aggregate forecast delta
    (``forecast_revenue_change``) — every predicate pushed to the scan,
    one accumulator row (plan-locked in tests/test_plan_quality.py on
    the arm function directly)."""
    rev = _top_supplier_revenue_arm(spark, sf_dir).select(
        F.lit("q15").alias("mode"),
        "s_suppkey",
        "s_name",
        "total_revenue_cents",
        F.lit(None).cast("long").alias("revenue_delta_cents"),
    )
    fc = forecast_revenue_change(spark, sf_dir).select(
        F.lit("q6").alias("mode"),
        F.lit(None).cast("long").alias("s_suppkey"),
        F.lit(None).cast("string").alias("s_name"),
        F.lit(None).cast("long").alias("total_revenue_cents"),
        "revenue_delta_cents",
    )
    return rev.unionByName(fc)


@q(
    "promo_revenue_pct",
    f"""
    SELECT round(100.0 * CAST(sum(CASE WHEN p_type LIKE 'TYPE_1%'
                                  THEN CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)
                                  ELSE 0 END) AS BIGINT)
                 / {_sql_cents_sum('l_extendedprice * (1 - l_discount)')}, 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-02-01'
    """,
)
def promo_revenue_pct(spark, sf_dir):
    """TPC-H Q14 shape: LIKE-classified conditional agg over one join;
    the month filter pushes to the lineitem scan."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    rev_cents = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return li.join(part, li.l_partkey == part.p_partkey).agg(
        F.round(
            100.0
            * F.sum(
                F.when(F.col("p_type").like("TYPE_1%"), rev_cents)
                .otherwise(F.lit(0).cast("long"))
            )
            / F.sum(rev_cents),
            4,
        ).alias("promo_pct")
    )


@q(
    "large_quantity_orders",
    f"""
    SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
           {_sql_int_sum('l_quantity')} AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150
    )
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def large_quantity_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING-filtered IN = groupBy + join. One
    per-orderkey aggregate computes BOTH the qualifying filter sum and
    the output total_qty (sum of rounded quantities), so lineitem is
    scanned once and never re-joined: the former second lineitem join +
    re-aggregation recomputed exactly what the qualifying-keys pass had
    already folded. o_orderkey is unique in orders and c_custkey unique
    in customer, so the joins cannot fan out and the final groupBy is
    unnecessary (r14 continuation-2; result-identical, oracle-gated)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    per_order = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum("l_quantity").alias("__q"),
            F.sum(F.round(F.col("l_quantity")).cast("long")).alias("total_qty"),
        )
        .filter(F.col("__q") > 150)
        .select("l_orderkey", "total_qty")
    )
    return (
        orders.join(per_order, orders.o_orderkey == per_order.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty"
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@q(
    "disjunctive_predicate_revenue",
    f"""
    SELECT {_sql_cents_sum('l_extendedprice * (1 - l_discount)')} AS revenue_cents
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 40)
    """,
)
def disjunctive_predicate_revenue(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs across both join sides — Catalyst
    still extracts the common p_partkey equi-key; the residual
    disjunction evaluates post-join in the same codegen stage."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    c1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    c2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    )
    return joined.filter(c1 | c2).agg(
        F.sum(
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("revenue_cents")
    )


@q(
    "rich_inactive_customers",
    f"""
    SELECT c_nationkey, count(*) AS numcust,
           {_sql_cents_sum('c_acctbal')} AS totacctbal_cents
    FROM customer
    WHERE c_acctbal > (SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                              / 100.0 / count(*)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-06-01')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def rich_inactive_customers(spark, sf_dir):
    """TPC-H Q22 shape: scalar subquery (global avg — one tiny agg,
    broadcast as a literal-like 1-row side) + NOT EXISTS anti join on a
    date-filtered orders side ("no RECENT orders" keeps the result
    non-empty on the corpus)."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp")
    )
    # the avg threshold derives from the exact cents sum so the boundary
    # comparison is deterministic across partial-agg orders
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(_cents(F.col("c_acctbal"))) / 100.0 / F.count(F.lit(1))
        ).alias("__avg")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_cents(F.col("c_acctbal"))).alias("totacctbal_cents"),
        )
        .orderBy("c_nationkey")
    )


# =====================================================================
# TPC-H completion: Q2 / Q11 / Q12 / Q16 / Q20 shapes (the corpus has
# no partsupp table, so supplier-part supply facts are derived from
# lineitem — the join/agg/argmin shapes are the point, and money runs
# in exact integer cents throughout)
# =====================================================================

_Q2_ORACLE = """
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_cents
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eur AS (
      SELECT s.s_suppkey, s.s_name, n.n_name
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    j AS (
      SELECT p.p_partkey, p.p_name, e.s_name, e.n_name, ps.cost_cents
      FROM ps
      JOIN eur e ON e.s_suppkey = ps.l_suppkey
      JOIN part p ON p.p_partkey = ps.l_partkey
      WHERE p.p_type = 'SMALL' AND p.p_size <= 15
    )
    SELECT p_partkey, p_name, s_name, n_name, cost_cents FROM j
    WHERE cost_cents = (SELECT min(cost_cents) FROM j j2
                        WHERE j2.p_partkey = j.p_partkey)
"""


def min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (reference has nothing comparable — §2.I analytic
    surface): for each small part, the EUROPE supplier(s) with the
    minimum observed supply cost. Supply cost is derived from lineitem
    (min line total in cents per (part, supplier) — no partsupp table),
    so the plan is: one map-side-combined groupBy over lineitem, the
    supplier→nation→region chain and the filtered part table broadcast,
    then the per-part argmin as a window min over the part key — the
    oracle keeps Q2's correlated-subquery formulation, proving the
    window rewrite exact. Ties keep every minimal supplier, as in Q2."""
    l = t(spark, sf_dir, "lineitem")
    eur = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(
            F.broadcast(
                t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    parts = t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "SMALL") & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_name")
    # broadcast SEMI prefilters below the groupBy (guide §3.2): only
    # small-part / EUROPE-supplier lines reach the (part, supplier)
    # aggregation shuffle — grouping first shuffled every lineitem row
    # and threw most groups away at the joins. Identical result: the
    # per-(part, supplier) min is over the same rows either side of
    # the equi-joins.
    ps = (
        l.join(
            F.broadcast(parts.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(
            F.broadcast(eur.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(_cents(F.col("l_extendedprice"))).alias("cost_cents"))
    )
    j = (
        ps.join(F.broadcast(eur), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(parts), F.col("p_partkey") == F.col("l_partkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        j.withColumn("__min", F.min("cost_cents").over(w))
        .filter(F.col("cost_cents") == F.col("__min"))
        .select("p_partkey", "p_name", "s_name", "n_name", "cost_cents")
    )


@q(
    "important_part_stock",
    """
    WITH val AS (
      SELECT l.l_partkey,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS value_cents
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey
    ),
    tot AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents FROM val)
    SELECT v.l_partkey, v.value_cents
    FROM val v CROSS JOIN tot
    WHERE v.value_cents > 0.001 * tot.total_cents
    """,
)
def important_part_stock(spark, sf_dir):
    """TPC-H Q11 shape: parts whose supplied value through NATION_3's
    suppliers exceeds 0.1% of that nation's total. One groupBy over the
    supplier-filtered lineitem (the nation filter reaches the scan via
    a broadcast semi join), then the global threshold as a 1-row
    broadcast scalar — the same bounded crossJoin shape as Q22's
    avg-balance subquery. Value sums are exact integer cents, so the
    HAVING boundary cannot flip with partial-agg order at 100 TB."""
    sup = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_3"
                )
            ),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select("s_suppkey")
    )
    val = (
        t(spark, sf_dir, "lineitem")
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("value_cents"))
    )
    tot = val.agg(F.sum("value_cents").alias("total_cents"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") > 0.001 * F.col("total_cents"))
        .select("l_partkey", "value_cents")
    )


@q(
    "priority_by_return_flag",
    """
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_returnflag
    """,
)
def priority_by_return_flag(spark, sf_dir):
    """TPC-H Q12 shape (the corpus lacks l_shipmode/commit/receipt
    dates, so the return flag stands in for the ship mode and the
    shipdate year for the receipt window): conditional priority
    counting across a fact-fact join. The shipdate predicate is pushed
    to the lineitem scan; orders joins shuffle-to-shuffle (both sides
    are facts — the honest big-big plan, SMJ/shuffled-hash under AQE at
    100 TB, never a broadcast)."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias(
                "low_line_count"
            ),
        )
    )


_Q16_ORACLE = """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#11' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
"""


def supplier_count_by_part(spark, sf_dir):
    """TPC-H Q16 shape: how many distinct suppliers can provide each
    (brand, type, size) bucket, excluding blacklisted suppliers
    (negative account balance stands in for the complaints-comment
    filter — the corpus has no s_comment). Supplier-part pairs derive
    from lineitem; the part filter and the tiny exclusion list are
    broadcast (hash + anti join), so lineitem shuffles once for the
    distinct-pairs dedup and the count-distinct rides the same keys."""
    parts = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    excl = t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    # broadcast semi/anti prefilters BELOW the distinct (guide §3.2):
    # the dedup shuffle carries only pairs that survive the part
    # filter and the blacklist — distinct-then-join and
    # filter-then-distinct keep the identical surviving pair set.
    pairs = (
        t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(parts.select("p_partkey")),
            F.col("p_partkey") == F.col("l_partkey"),
            "left_semi",
        )
        .join(
            F.broadcast(excl),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_anti",
        )
        .distinct()
    )
    return (
        pairs.join(F.broadcast(parts), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


_Q20_ORACLE = """
    WITH pq AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
               AS total_qty,
             CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                            AND l_shipdate < TIMESTAMP '1997-01-01'
                           THEN CAST(round(l_quantity) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS qty96
      FROM lineitem
      WHERE l_partkey IN (
        SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
      )
      GROUP BY l_partkey, l_suppkey
    ),
    excess AS (
      SELECT l_suppkey, count(*) AS n_parts FROM pq
      WHERE qty96 > 0 AND total_qty > 2 * qty96
      GROUP BY l_suppkey
    )
    SELECT s.s_name, e.n_parts
    FROM excess e
    JOIN supplier s ON s.s_suppkey = e.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_1'
"""


def excess_stock_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: NATION_1 suppliers who supplied a 'small%' part
    in volumes more than twice what they shipped of it in 1996 (excess
    stock — availqty is derived from total lineitem quantity, no
    partsupp). The part-name filter is a broadcast semi join pushed
    below the one groupBy; the surviving supplier set is tiny, so the
    supplier/nation qualification is a broadcast chain on top.
    Quantities are integral doubles summed as exact BIGINTs."""
    parts = t(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    qty = F.round(F.col("l_quantity")).cast("long")
    in96 = (
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    pq = (
        t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(parts),
            F.col("p_partkey") == F.col("l_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(qty).alias("total_qty"),
            F.sum(F.when(in96, qty).otherwise(F.lit(0))).alias("qty96"),
        )
    )
    excess = (
        pq.filter(
            (F.col("qty96") > 0)
            & (F.col("total_qty") > 2 * F.col("qty96"))
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    nat = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_1"
                )
            ),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return excess.join(
        F.broadcast(nat), F.col("s_suppkey") == F.col("l_suppkey")
    ).select("s_name", "n_parts")


@q(
    "supplier_parts_suite",
    f"""
    SELECT 'mincost' AS mode, p_partkey, p_name, s_name, n_name, cost_cents,
           CAST(NULL AS VARCHAR) AS p_brand, CAST(NULL AS VARCHAR) AS p_type,
           CAST(NULL AS INT) AS p_size, CAST(NULL AS BIGINT) AS supplier_cnt,
           CAST(NULL AS BIGINT) AS n_parts
    FROM ({_Q2_ORACLE}) o2
    UNION ALL
    SELECT 'suppcnt', NULL, NULL, NULL, NULL, NULL,
           p_brand, p_type, p_size, supplier_cnt, NULL
    FROM ({_Q16_ORACLE}) o16
    UNION ALL
    SELECT 'excess', NULL, NULL, s_name, NULL, NULL,
           NULL, NULL, NULL, NULL, n_parts
    FROM ({_Q20_ORACLE}) o20
    """,
)
def supplier_parts_suite(spark, sf_dir):
    """Composed supplier/part suite (r8 consolidation of the former
    min_cost_supplier / supplier_count_by_part / excess_stock_suppliers
    entries — the Q2/Q16/Q20 shapes, so one driver check covers all
    three; each arm's machinery and oracle run verbatim, see
    REGISTRY_CHANGES.md; per-arm plan shapes stay locked in
    tests/test_plan_quality.py on the arm functions directly):

    Arm ``mincost`` (Q2): per-part argmin-cost EUROPE supplier, window
    min over broadcast dim chain. Arm ``suppcnt`` (Q16): distinct
    supplier count per (brand, type, size), broadcast anti join
    blacklist. Arm ``excess`` (Q20): suppliers shipping 'small%' parts
    at >2x their 1996 volume, broadcast semi-join prefilter.

    Round 15 (guide §2.4/§6): the three arms each aggregated lineitem
    by the SAME key pair (l_partkey, l_suppkey) — three full fact
    scans and three fact shuffles for one suite. The suite now stages
    ONE pair-level aggregate computing all three arms' measures
    (min cents for Q2, total/1996 quantities for Q20, group existence
    = the distinct pair for Q16) and derives every arm from that
    shared frame, its per-arm key-level dim filters applied ABOVE the
    aggregate (provably the same rows: all prefilters are equi-key
    semi joins, never line-level predicates, so per-pair min/sum are
    unchanged). The shared guard filter references every aggregate
    column so per-arm column pruning cannot diverge the subtrees —
    keeping them canonically identical is what lets AQE's exchange
    reuse compute the fact scan + pair shuffle ONCE at runtime (1
    lineitem pass instead of 3; the guard is a no-op on TPC-H data
    whose price/quantity columns are non-null, proven by the oracle
    at every SF). The standalone arm functions keep their original
    prefiltered single-arm plans (locked in tests/test_plan_quality),
    which remain the right shape when an arm runs ALONE."""
    qty = F.round(F.col("l_quantity")).cast("long")
    in96 = (
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    pairs = (
        t(spark, sf_dir, "lineitem")
        # pin the key not-null predicates explicitly: the arms' joins
        # infer DIFFERENT IsNotNull sets (the Q16 anti join infers none
        # for l_suppkey), which would de-canonicalize the three copies
        # of this subtree and defeat the runtime exchange reuse. TPC-H
        # fact keys are non-null, so this is a no-op on the data
        # (oracle-proven at every SF).
        .filter(
            F.col("l_partkey").isNotNull() & F.col("l_suppkey").isNotNull()
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(_cents(F.col("l_extendedprice"))).alias("cost_cents"),
            F.sum(qty).alias("total_qty"),
            F.sum(F.when(in96, qty).otherwise(F.lit(0))).alias("qty96"),
        )
        .filter(
            F.col("cost_cents").isNotNull()
            & F.col("total_qty").isNotNull()
            & F.col("qty96").isNotNull()
        )
    )

    # Q2 arm over the shared pairs
    eur = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(
            F.broadcast(
                t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    q2_parts = t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "SMALL") & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_name")
    w = Window.partitionBy("p_partkey")
    mc_arm = (
        pairs.join(F.broadcast(eur), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(q2_parts), F.col("p_partkey") == F.col("l_partkey"))
        .withColumn("__min", F.min("cost_cents").over(w))
        .filter(F.col("cost_cents") == F.col("__min"))
        .select("p_partkey", "p_name", "s_name", "n_name", "cost_cents")
    )

    # Q16 arm over the shared pairs (a pair-agg row exists iff the
    # distinct (partkey, suppkey) pair exists)
    q16_parts = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    excl = t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    sc_arm = (
        pairs.join(
            F.broadcast(q16_parts), F.col("p_partkey") == F.col("l_partkey")
        )
        .join(
            F.broadcast(excl),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )

    # Q20 arm over the shared pairs
    q20_parts = t(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    nat = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_1"
                )
            ),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    ex_arm = (
        pairs.join(
            F.broadcast(q20_parts),
            F.col("p_partkey") == F.col("l_partkey"),
            "left_semi",
        )
        .filter(
            (F.col("qty96") > 0) & (F.col("total_qty") > 2 * F.col("qty96"))
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .join(F.broadcast(nat), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_name", "n_parts")
    )

    mc = mc_arm.select(
        F.lit("mincost").alias("mode"),
        "p_partkey", "p_name", "s_name", "n_name", "cost_cents",
        F.lit(None).cast("string").alias("p_brand"),
        F.lit(None).cast("string").alias("p_type"),
        F.lit(None).cast("int").alias("p_size"),
        F.lit(None).cast("long").alias("supplier_cnt"),
        F.lit(None).cast("long").alias("n_parts"),
    )
    sc = sc_arm.select(
        F.lit("suppcnt").alias("mode"),
        F.lit(None).cast("long").alias("p_partkey"),
        F.lit(None).cast("string").alias("p_name"),
        F.lit(None).cast("string").alias("s_name"),
        F.lit(None).cast("string").alias("n_name"),
        F.lit(None).cast("long").alias("cost_cents"),
        "p_brand", "p_type", "p_size", "supplier_cnt",
        F.lit(None).cast("long").alias("n_parts"),
    )
    ex = ex_arm.select(
        F.lit("excess").alias("mode"),
        F.lit(None).cast("long").alias("p_partkey"),
        F.lit(None).cast("string").alias("p_name"),
        "s_name",
        F.lit(None).cast("string").alias("n_name"),
        F.lit(None).cast("long").alias("cost_cents"),
        F.lit(None).cast("string").alias("p_brand"),
        F.lit(None).cast("string").alias("p_type"),
        F.lit(None).cast("int").alias("p_size"),
        F.lit(None).cast("long").alias("supplier_cnt"),
        "n_parts",
    )
    return mc.unionByName(sc).unionByName(ex)


# squared L2 between two DuckDB lists via an explicit element fold —
# the same per-element (x-y)^2 accumulation shape as the Spark side's
# zip_with/aggregate, so encode argmins and ADC sums round identically
_L2SQ = (
    "list_sum(list_transform(generate_series(1, {n}), "
    "__i -> ({a}[__i] - {b}[__i]) * ({a}[__i] - {b}[__i])))"
)


def _pq_oracle(m: int = 4, ds: int = 16, n_codes: int = 8, k: int = 5) -> str:
    """Relational ADC: re-derive codebooks (lowest-id sub-vectors),
    encode by argmin, LUT join, Σ_j — fully independent of the Spark
    array formulation."""
    subs = ",".join(f"({j})" for j in range(m))
    d_enc = _L2SQ.format(
        n=ds,
        a="list_slice(c.v, codes.j*{ds}+1, codes.j*{ds}+{ds})".format(ds=ds),
        b="codes.cv",
    )
    d_lut = _L2SQ.format(
        n=ds,
        a="list_slice(q.qv, codes.j*{ds}+1, codes.j*{ds}+{ds})".format(ds=ds),
        b="codes.cv",
    )
    return f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    subs AS (SELECT * FROM (VALUES {subs}) AS s(j)),
    codes AS (
      SELECT subs.j, c.vec_id AS code,
             list_slice(c.v, subs.j*{ds}+1, subs.j*{ds}+{ds}) AS cv
      FROM c, subs WHERE c.vec_id < {n_codes}
    ),
    enc AS (
      SELECT vec_id, j, code FROM (
        SELECT c.vec_id, codes.j, codes.code,
               row_number() OVER (PARTITION BY c.vec_id, codes.j
                                  ORDER BY {d_enc} ASC, codes.code) AS rn
        FROM c, codes) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
          FROM embeddings WHERE vec_id < 5),
    qlut AS (
      SELECT q.query_id, codes.j, codes.code, {d_lut} AS d
      FROM q, codes
    ),
    scored AS (
      SELECT qlut.query_id, enc.vec_id, round(sum(qlut.d), 6) AS score
      FROM enc JOIN qlut ON enc.j = qlut.j AND enc.code = qlut.code
      GROUP BY qlut.query_id, enc.vec_id
    ),
    ranked AS (
      SELECT query_id, vec_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score ASC, vec_id) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {k}
    """


@q("pq_ann_topk", _pq_oracle())
def pq_ann_topk_q(spark, sf_dir):
    """Product-quantization ANN (functions/similarity.py:pq_ann_topk):
    4 sub-spaces x 8 deterministic codes (lowest-id sub-vectors, the
    oracle-reproducible convention), ADC scoring — the scored corpus
    row carries 4 ints instead of a 64-dim vector, the memory story
    that complements IVF's partition pruning at 100 TB. Reference
    parity: the similarity-search surface of SURVEY §2.I (the reference
    has no ANN; this is the scale-path family next to LSH/IVF)."""
    emb = tp(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    books = S.pq_codebooks(emb, m=4, n_codes=8, dim=64)
    return S.pq_ann_topk(emb, queries, books, k=5)


def _ivfpq_oracle(
    m: int = 4, ds: int = 16, n_cent: int = 8, n_codes: int = 8,
    nprobe: int = 2, k: int = 5, n_cand: int = 20,
) -> str:
    """Relational IVFADC: centroid assignment, residual codebooks from
    the lowest-id vectors' residuals, argmin encode, per-(query, probed
    cell) residual LUTs, ADC shortlist, exact-cosine re-rank — every
    stage re-derived in SQL against the same deterministic seeds."""
    subs = ",".join(f"({j})" for j in range(m))

    def res_l2sq(vec: str, cent: str, code: str) -> str:
        # Σ_i ((vec[j*ds+i] - cent[j*ds+i]) - code[i])², the same
        # element-order fold as the Spark side's zip_with/aggregate
        term = (
            f"(({vec}[__j*{ds} + __i] - {cent}[__j*{ds} + __i])"
            f" - {code}[__i])"
        )
        return (
            f"list_sum(list_transform(generate_series(1, {ds}), "
            f"__i -> {term} * {term}))"
        )

    return f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
             FROM embeddings WHERE vec_id < {n_cent}),
    asg AS (
      SELECT vec_id, v, cid FROM (
        SELECT c.vec_id, c.v, cent.cid,
               row_number() OVER (PARTITION BY c.vec_id ORDER BY
                 {_COS.format(a='c.v', b='cent.cv')} DESC, cent.cid) AS rn
        FROM c, cent) WHERE rn = 1
    ),
    subs AS (SELECT * FROM (VALUES {subs}) AS s(__j)),
    codes AS (
      SELECT subs.__j, s.vec_id AS code,
             list_transform(generate_series(1, {ds}),
               __i -> s.v[subs.__j*{ds} + __i] - sc.cv[subs.__j*{ds} + __i])
               AS rcv
      FROM (SELECT * FROM asg WHERE vec_id < {n_codes}) s
      JOIN cent sc ON s.cid = sc.cid, subs
    ),
    enc AS (
      SELECT vec_id, __j, code FROM (
        SELECT a.vec_id, codes.__j, codes.code,
               row_number() OVER (PARTITION BY a.vec_id, codes.__j
                 ORDER BY {res_l2sq('a.v', 'ac.cv', 'codes.rcv')} ASC,
                          codes.code) AS rn
        FROM asg a JOIN cent ac ON a.cid = ac.cid, codes) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
          FROM embeddings WHERE vec_id < 5),
    probe AS (
      SELECT query_id, qv, cid FROM (
        SELECT q.query_id, q.qv, cent.cid,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 {_COS.format(a='q.qv', b='cent.cv')} DESC, cent.cid) AS rn
        FROM q, cent) WHERE rn <= {nprobe}
    ),
    qlut AS (
      SELECT probe.query_id, probe.cid, codes.__j, codes.code,
             {res_l2sq('probe.qv', 'pc.cv', 'codes.rcv')} AS d
      FROM probe JOIN cent pc ON probe.cid = pc.cid, codes
    ),
    scored AS (
      SELECT qlut.query_id, asg.vec_id, round(sum(qlut.d), 6) AS adc
      FROM asg
      JOIN qlut ON asg.cid = qlut.cid
      JOIN enc ON enc.vec_id = asg.vec_id AND enc.__j = qlut.__j
              AND enc.code = qlut.code
      GROUP BY qlut.query_id, asg.vec_id
    ),
    short AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc ASC, vec_id) AS rn
        FROM scored) WHERE rn <= {n_cand}
    ),
    rer AS (
      SELECT short.query_id, short.vec_id,
             round({_COS.format(a='cv2.v', b='q2.qv')}, 6) AS score
      FROM short
      JOIN c cv2 ON cv2.vec_id = short.vec_id
      JOIN q q2 ON q2.query_id = short.query_id
    ),
    ranked AS (
      SELECT query_id, vec_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id) AS rank
      FROM rer
    )
    SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {k}
    """


@q("ivfpq_index_probe", _ivfpq_oracle())
def ivfpq_index_probe_q(spark, sf_dir):
    """The composed production ANN stack (functions/similarity.py:
    ivfpq_index_write / ivfpq_probe — Faiss's IVFADC shape): the corpus
    is partitioned by centroid cell AND carries residual PQ codes; a
    probe prunes unprobed cells at file-listing time, ADC-scores the
    probed cells reading only (id, codes) — the vector column stays
    unread until the re-rank — then exact-cosine re-ranks the 4k-wide
    shortlist. Deterministic lowest-id centroids and residual codebooks
    so the oracle re-derives every stage relationally."""
    import hashlib
    import os
    import tempfile

    from ..functions import similarity as S2

    emb = tp(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12] + f"_{os.getpid()}"
    path = os.path.join(
        tempfile.gettempdir(), f"pypeman_ivfpq_idx_{tag}", "index"
    )
    S2.ivfpq_index_write(emb, path, n_centroids=8, m=4, n_codes=8, dim=64)
    return S2.ivfpq_probe(spark, path, queries, k=5, nprobe=2, rerank=True)
