from slowfast_feature_extractor_spark.operators.asof_join import asof_join
from slowfast_feature_extractor_spark.operators.sessionize import sessionize, session_features
from slowfast_feature_extractor_spark.operators.windows import (
    backfill,
    dual_rate_features,
    lag_lead,
)

__all__ = [
    "asof_join",
    "sessionize",
    "session_features",
    "backfill",
    "dual_rate_features",
    "lag_lead",
]
