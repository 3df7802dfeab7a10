from character_identification_spark.sources.catalog import StageStore  # noqa: F401
