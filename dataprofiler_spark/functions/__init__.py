from dataprofiler_spark.functions.expressions import (  # noqa: F401
    definition_hash,
    epoch_days,
    normalized_expr,
    partition_month,
    portable_shingle_hash,
    stringified,
    token_range_ok,
)
