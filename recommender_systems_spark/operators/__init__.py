from recommender_systems_spark.operators.densify import densify_ids
from recommender_systems_spark.operators.relational import (
    anti_join_below_threshold,
    cumulative_sum,
    equalize_groups,
    global_top_k,
    group_top_k,
    relative_frequency,
    seeded_shuffle,
    weighted_sample,
)

__all__ = [
    "anti_join_below_threshold",
    "cumulative_sum",
    "densify_ids",
    "equalize_groups",
    "global_top_k",
    "group_top_k",
    "relative_frequency",
    "seeded_shuffle",
    "weighted_sample",
]
