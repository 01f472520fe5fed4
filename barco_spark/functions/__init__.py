from barco_spark.functions.tokens import (  # noqa: F401
    murmur3_token_udf,
    murmur3_token_py,
    token_to_bucket_py,
    bucket_for_key_udf,
    fast_bucket_expr,
)
