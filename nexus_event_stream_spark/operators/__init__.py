"""Operator library: reference-semantics operators + scale extensions."""

from nexus_event_stream_spark.operators.lww import (  # noqa: F401
    latest_state,
    latest_live_state,
    lww_merge_batch,
)
from nexus_event_stream_spark.operators.topk import (  # noqa: F401
    newest_first,
    paginate,
)
