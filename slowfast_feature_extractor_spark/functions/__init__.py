from slowfast_feature_extractor_spark.functions.extraction import (
    extract_text,
    extract_text_udf,
)
from slowfast_feature_extractor_spark.functions.keys import (
    construct_key,
    label_remap,
    parse_key,
    rater_agreement,
)
from slowfast_feature_extractor_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
    resample_to_k_np,
    resample_udf,
)

__all__ = [
    "extract_text",
    "extract_text_udf",
    "construct_key",
    "label_remap",
    "parse_key",
    "rater_agreement",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "resample_to_k_np",
    "resample_udf",
]
