from temporal_vector_database_spark.functions.vector import (
    cosine,
    dot,
    l2_dist,
    l2_norm,
    normalize,
    sub,
)

__all__ = ["cosine", "dot", "l2_dist", "l2_norm", "normalize", "sub"]
