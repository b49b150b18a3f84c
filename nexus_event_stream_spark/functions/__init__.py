"""Scalar/column function library (all Catalyst-visible built-ins)."""

from nexus_event_stream_spark.functions.domain import (  # noqa: F401
    priority_display_to_score,
    priority_score_to_display,
    rfc3339_to_unix,
    truncate_ellipsis,
)
from nexus_event_stream_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    int_dot,
    quantize,
)
from nexus_event_stream_spark.functions.text import (  # noqa: F401
    char_ngrams,
    doc_fingerprint,
    punct_count,
    token_count,
    tokens,
    word_ngrams,
)
