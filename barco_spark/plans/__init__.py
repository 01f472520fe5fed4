from barco_spark.plans.inspect import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    has_pushed_filters,
    read_schema_columns,
    shuffle_count,
    wholestage_codegen_spans,
)
