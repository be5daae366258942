from parallel_dataflow_spark.functions.tokens import (  # noqa: F401
    tokenize_text,
    top_token_udf,
    token_histogram_agg,
    minhash_signature_udf,
    simhash64_udf,
)
from parallel_dataflow_spark.functions.text import (  # noqa: F401
    norm_text,
    fingerprint_md5,
    word_count_expr,
    punct_ratio_expr,
    stopword_hits_expr,
    quality_score_expr,
)
from parallel_dataflow_spark.functions.vectors import (  # noqa: F401
    cosine_expr,
    dot_expr,
    norm_expr,
    cosine_topk_pandas,
)
