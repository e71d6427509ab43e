from currency_etl_pipeline_spark.operators.upsert import (  # noqa: F401
    latest_per_key,
    upsert_newest_wins,
)
from currency_etl_pipeline_spark.operators.topk import (  # noqa: F401
    top_n,
    top_k_per_group,
)
from currency_etl_pipeline_spark.operators.delta import (  # noqa: F401
    window_delta,
    pct_change_over_key,
)
