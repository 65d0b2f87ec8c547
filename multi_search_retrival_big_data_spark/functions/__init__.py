from multi_search_retrival_big_data_spark.functions.vector import (  # noqa: F401
    cosine_sim,
    dot,
    l2_dist,
    l2_norm,
    l2_normalize,
    lit_vec,
)
from multi_search_retrival_big_data_spark.functions.text import (  # noqa: F401
    char_ngrams,
    tokenize,
    word_ngrams,
)
