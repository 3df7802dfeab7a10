"""character_identification_spark — a PySpark-native record-linkage engine.

A from-scratch blocking + pairwise-scoring + transitive-clustering pipeline
generalizing the dataflow of emorynlp/character-identification (reference at
/root/reference) to web-scale entity resolution over Common-Crawl-style page
tables, expressed entirely in the Spark DataFrame API with Arrow-vectorized
pandas UDFs on the slow path.

Layout:
  session        SparkSession builder tuned for local[N] testing / cluster scale
  functions/     deterministic hashing, string similarity, vector math
  ingest/        html→text extraction (byte-identical), mention extraction
  operators/     blocking, pair generation, scoring, connected components,
                 dedup, ANN similarity, text stats, as-of join
  plans/         checkpointed stage pipeline with lineage + metrics + resume
  streaming/     Structured Streaming operators
  fixtures/      deterministic synthetic corpora + reference-JSON adapter
  evaluation/    pairwise (Blanc-style) F1, B3
"""

__version__ = "0.1.0"
