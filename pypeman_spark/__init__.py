"""pypeman_spark — a PySpark-native analytics/dataflow engine with the
query and data-processing capabilities of mhcomm/pypeman (reference at
/root/reference), re-expressed Spark-first.

Layers:

* ``message``  — the Message data model as a DataFrame schema.
* ``pipeline`` — named-stage pipelines with outcome routing,
  when/case/fork branches, inject/replay at any stage.
* ``operators`` — the node inventory (SURVEY §2): parsers, mapping, ctx,
  routing, explode, sinks.
* ``store``    — audit message store (search/replay), retry DLQ, kv.
* ``sources``  — file watcher / cron / merge channel equivalents.
* ``streaming``— Structured Streaming channel orchestration.
* ``functions``— scale ops: dedup, similarity search, text analysis,
  multimodal columns.
"""

from .message import (  # noqa: F401
    MESSAGE_SCHEMA,
    STATES_PRIORITY,
    add_context,
    ensure_message_columns,
    message_to_dict,
    messages_from_dicts,
    messages_from_payloads,
)
from .pipeline import Pipeline, PipelineResult  # noqa: F401
from .session import get_spark  # noqa: F401

__version__ = "0.1.0"
