from character_identification_spark.evaluation.pairf1 import (  # noqa: F401
    gold_pairs_from_mentions,
    pairwise_f1,
    b_cubed,
)
