from currency_etl_pipeline_spark.functions.scalars import (  # noqa: F401
    dec,
    ts_str,
    pair_split_substring,
    pair_split_regex,
    coerce_double,
    parse_timestamp,
    pct_change_expr,
    direction_expr,
)
