"""Structured Streaming layer: sources, windows, stateful dedupe, sink."""

from .windows import (  # noqa: F401
    keep_first_of_window,
    salted_host_window_agg,
    session_host_agg,
    sliding_host_agg,
    tumbling_host_agg,
    with_host,
)
from .dedupe import (  # noqa: F401
    dedupe_exact,
    dedupe_ttl_reference,
    dedupe_ttl_stateful,
    dedupe_within_watermark,
)
from .sink import IdempotentSink, run_to_sink  # noqa: F401
from .source import pages_file_stream, write_pages_input  # noqa: F401
