from ccm_spark.operators.embedding import embed_bidirectional, embed_direction
from ccm_spark.operators.sampling import lib_sizes_df, fan_out_with_rank
from ccm_spark.operators.knn import knn_candidates, top_k_neighbors
from ccm_spark.operators.simplex import simplex_weights, weighted_prediction
from ccm_spark.operators.stats import pearson_by_sample, skill_by_lib_size, convergence

__all__ = [
    "embed_bidirectional",
    "embed_direction",
    "lib_sizes_df",
    "fan_out_with_rank",
    "knn_candidates",
    "top_k_neighbors",
    "simplex_weights",
    "weighted_prediction",
    "pearson_by_sample",
    "skill_by_lib_size",
    "convergence",
]
