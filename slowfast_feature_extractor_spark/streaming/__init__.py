from slowfast_feature_extractor_spark.streaming.dual_rate_stream import (
    streaming_dual_rate,
)
from slowfast_feature_extractor_spark.streaming.sessionize_stream import (
    streaming_sessionize,
)

__all__ = ["streaming_sessionize", "streaming_dual_rate"]
