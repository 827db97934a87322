from vector_store_spark.functions.distance import (  # noqa: F401
    cosine_distance,
    distance_expr,
    dot_product,
    dot_product_distance,
    hamming_distance,
    l2sq_distance,
    similarity_expr,
    vector_lit,
    vector_norm,
)
