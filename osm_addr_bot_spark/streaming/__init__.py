from osm_addr_bot_spark.streaming.incremental import (
    stream_documents,
    streaming_check_counts,
    streaming_issues,
)

__all__ = ["stream_documents", "streaming_issues", "streaming_check_counts"]
