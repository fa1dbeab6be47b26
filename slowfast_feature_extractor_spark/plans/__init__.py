from slowfast_feature_extractor_spark.plans.featurize import (
    featurize_pages,
    pit_dual_rate_events,
    salted_buckets,
)

__all__ = ["featurize_pages", "pit_dual_rate_events", "salted_buckets"]
