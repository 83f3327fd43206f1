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
