from character_identification_spark.plans.pipeline import (  # noqa: F401
    PipelineConfig,
    run_pipeline,
)
