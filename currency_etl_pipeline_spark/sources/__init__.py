from currency_etl_pipeline_spark.sources.rates_pipeline import (  # noqa: F401
    RATES_SCHEMA,
    quotes_payload_to_rates,
    transform_rates,
    prepare_for_load,
)
from currency_etl_pipeline_spark.sources.lake import (  # noqa: F401
    write_zone_csv,
    read_zone_csv,
    latest_file,
)
from currency_etl_pipeline_spark.sources.warehouse import Warehouse  # noqa: F401
