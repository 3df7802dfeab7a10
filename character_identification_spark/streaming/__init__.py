from character_identification_spark.streaming.incremental import (  # noqa: F401
    PAGES_DDL,
    run_incremental_ingest,
    stream_pages,
    streaming_dedup,
)
