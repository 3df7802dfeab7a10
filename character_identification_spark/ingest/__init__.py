from character_identification_spark.ingest.extract import wrap_html, extract_text  # noqa: F401
from character_identification_spark.ingest.mentions import extract_mentions  # noqa: F401
