"""Message serialization round-trips, mirroring the reference's
`tests/test_message.py:13-99` (to_dict/from_dict/json) — JSON payloads
instead of pickle (SURVEY §1.1)."""

import json

from pyspark.sql import functions as F

from pypeman_spark.message import (
    add_context,
    message_to_dict,
    messages_from_dicts,
    messages_from_payloads,
    renew,
)


def test_dict_roundtrip_preserves_everything(spark):
    msgs = add_context(
        messages_from_payloads(
            spark, [{"question": "unknown"}], meta={"q": "a"}
        ),
        "snap",
    )
    dicts = [message_to_dict(r) for r in msgs.collect()]
    assert json.loads(json.dumps(dicts))  # fully JSON-able
    back = messages_from_dicts(spark, dicts)
    assert [message_to_dict(r) for r in back.collect()] == dicts
    assert dicts[0]["ctx"]["snap"]["payload"] == '{"question": "unknown"}'
    assert dicts[0]["meta"] == {"q": "a"}


def test_renew_changes_identity_keeps_content(spark):
    # message.py:80-90: replay renews uuid/timestamp, payload untouched
    msgs = messages_from_payloads(spark, [{"n": 1}])
    renewed = renew(msgs)
    old = msgs.collect()[0]
    new = renewed.collect()[0]
    assert new["payload"] == old["payload"]
    assert new["uuid"] != old["uuid"]
    assert new["id"] != old["id"]


def test_message_identity_stable_across_actions(spark):
    # regression: store(df) then run(df) must see the SAME ids — uuid is
    # plan-seeded and the default timestamp is a plan-baked literal, so
    # two actions on one DataFrame agree on identity
    msgs = messages_from_payloads(spark, [{"n": i} for i in range(5)])
    first = sorted(r["id"] for r in msgs.select("id").collect())
    second = sorted(r["id"] for r in msgs.select("id").collect())
    assert first == second


def test_store_then_update_states_on_same_df(spark, tmp_path):
    # the end-to-end consequence: state updates land on the stored rows
    from pypeman_spark import Pipeline
    from pypeman_spark.operators import FuncNode
    from pypeman_spark.store import FileMessageStore

    store = FileMessageStore(spark, str(tmp_path / "a"), channel="t")
    msgs = messages_from_payloads(spark, [{"n": 1}, {"n": 2}])
    store.store(msgs)
    res = Pipeline("t").add(FuncNode(lambda d: d, name="x")).run(msgs)
    store.change_message_states(res.all)
    states = [r["state"] for r in store.current().collect()]
    assert states == ["processed", "processed"]
