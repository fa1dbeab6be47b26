from slowfast_feature_extractor_spark.streaming.sessionize_stream import (
    streaming_sessionize,
)

__all__ = ["streaming_sessionize"]
