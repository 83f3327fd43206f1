"""Fan-out operators — the reference's EXPLODE (SURVEY §2.E rows 40–42).

``YielderNode`` (``nodes.py:914-940``) turns an iterable payload into one
sub-message per element; generator recursion (``channels.py:750-786``)
then runs the remaining nodes per sub-message and aggregates terminal
states back onto the parent (worst-of wins, ``msgstore.py:66-130``).

Spark translation: a JSON-array payload → ``explode`` (a first-class
relational op — distributes the fan-out across the cluster, unlike the
reference's sequential loop), and the state roll-up is a ``groupBy`` on
the parent ``id`` with ``array_position`` priority max. The split of the
JSON array into element strings crosses into python once per Arrow
batch; the explode itself is JVM-side.
"""


import json

from pyspark.sql import DataFrame, functions as F, types as T

from ..message import STATES_PRIORITY, SUBSTATE_TYPE, worst_state_expr
from .base import Node, active_cond

__all__ = ["Yielder", "aggregate_substates"]


class Yielder(Node):
    """Explode an array payload into sub-messages sharing meta/ctx and the
    parent ``id`` (store_id semantics, ``nodes.py:914-940``). Each
    sub-message gets a fresh uuid ``<parent>_<idx>``; non-active rows
    pass through with one output row (explode must not lose them)."""

    def transform(self, df: DataFrame) -> DataFrame:
        import pandas as pd

        @F.pandas_udf(T.ArrayType(T.StringType()))
        def _split(s: pd.Series) -> pd.Series:
            out = []
            for raw in s:
                if raw is None:
                    out.append(None)
                    continue
                try:
                    obj = json.loads(raw)
                except (ValueError, TypeError):
                    out.append(None)
                    continue
                if isinstance(obj, list):
                    out.append(
                        [e if isinstance(e, str) else json.dumps(e) for e in obj]
                    )
                else:
                    out.append(None)
            return pd.Series(out)

        act = active_cond()
        elems = F.when(act, _split(F.col("payload"))).otherwise(F.lit(None))
        exploded = df.withColumn("__elems", elems).select(
            "*", F.posexplode_outer(F.col("__elems")).alias("__pos", "__elem")
        )
        out = (
            exploded.withColumn(
                "payload",
                F.when(F.col("__elem").isNotNull(), F.col("__elem")).otherwise(
                    F.col("payload")
                ),
            )
            .withColumn(
                "uuid",
                F.when(
                    F.col("__elem").isNotNull(),
                    F.concat_ws("_", F.col("uuid"), F.col("__pos").cast("string")),
                ).otherwise(F.col("uuid")),
            )
            .drop("__elems", "__pos", "__elem")
        )
        return out


def aggregate_substates(df: DataFrame) -> DataFrame:
    """Roll exploded sub-message outcomes up to one row per parent ``id``.

    Mirrors ``submessages_state_history`` + worst-state finalize
    (``msgstore.py:74-130``, ``channels.py:794-832``): the parent keeps
    every sub state in ``submessage_states`` and its own ``state`` is the
    worst by STATES_PRIORITY. One shuffle on ``id`` — the same shuffle a
    groupBy-key agg costs anywhere; map-side partial aggregation applies.
    """
    # Dropped counts as success in substate bookkeeping (channels.py:800-806)
    sub_state = F.when(F.col("state") == "dropped", F.lit("processed")).otherwise(
        F.col("state")
    )
    df = df.withColumn("__sub_state", sub_state)
    subs = F.collect_list(
        F.struct(
            F.col("uuid").alias("sub_id"),
            F.col("__sub_state").alias("state"),
            F.unix_timestamp("timestamp").cast("double").alias("ts"),
        )
    ).alias("submessage_states")
    agg = df.groupBy("id").agg(
        F.first("timestamp").alias("timestamp"),
        F.first("channel").alias("channel"),
        F.first("content_type").alias("content_type"),
        F.last("payload").alias("payload"),  # last-sub-message-wins (channels.py:783-786)
        F.first("meta").alias("meta"),
        F.first("ctx").alias("ctx"),
        subs,
        F.collect_list("__sub_state").alias("__states"),
        F.max("err_msg").alias("err_msg"),
        F.first("uuid").alias("uuid"),
    )
    return agg.withColumn("state", worst_state_expr(F.col("__states"))).drop(
        "__states"
    )
