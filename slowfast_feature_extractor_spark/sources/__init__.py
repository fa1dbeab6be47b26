from slowfast_feature_extractor_spark.sources.pages import (
    gen_host_meta,
    gen_page_regions,
    gen_pages,
    pages_spark_schema,
)
from slowfast_feature_extractor_spark.sources.tables import load_tables

__all__ = [
    "gen_pages",
    "gen_host_meta",
    "gen_page_regions",
    "pages_spark_schema",
    "load_tables",
]
