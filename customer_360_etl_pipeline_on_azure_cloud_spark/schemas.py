"""Explicit schemas for every source the engine reads.

The reference infers every schema at read time (reference
ETL_pipeline.py:32,302,316) — one schema-inference job per daily file. At
100 TB that is both slow (extra full/partial scans) and fragile (schema
drift across days silently widens types). This engine declares schemas.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference-native datasets (SURVEY.md §1.2, FIXTURES.md §A) ---------

#: log_content: IPTV viewing events, one JSON-lines file per day, each row
#: wrapped in a `_source` struct (reference ETL_pipeline.py:255).
LOG_CONTENT_SCHEMA = T.StructType(
    [
        T.StructField(
            "_source",
            T.StructType(
                [
                    T.StructField("Contract", T.StringType()),
                    T.StructField("Mac", T.StringType()),
                    T.StructField("AppName", T.StringType()),
                    T.StructField("TotalDuration", T.LongType()),
                ]
            ),
        )
    ]
)

#: log_search: search events, one parquet folder per day
#: (reference ETL_pipeline.py:305-306,316-321).
LOG_SEARCH_SCHEMA = T.StructType(
    [
        T.StructField("datetime", T.StringType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("keyword", T.StringType()),
    ]
)

#: mapping.csv: keyword -> category dimension (reference ETL_pipeline.py:302).
MAPPING_SCHEMA = T.StructType(
    [
        T.StructField("search", T.StringType()),
        T.StructField("category", T.StringType()),
    ]
)

# --- driver testdata tables (TESTDATA.md / FIXTURES.md §B) ---------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
