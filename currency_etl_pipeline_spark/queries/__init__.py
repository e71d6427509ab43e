"""Query catalog: every operator from SURVEY.md §2 as a named query
with (where SQL-expressible) a DuckDB oracle twin.

Import side effects register queries; ``all_queries()`` returns the
registry.
"""

from currency_etl_pipeline_spark.queries.registry import all_queries, all_oracles, QuerySpec  # noqa: F401

# Registration side effects:
from currency_etl_pipeline_spark.queries import core  # noqa: F401, E402
from currency_etl_pipeline_spark.queries import relational  # noqa: F401, E402
from currency_etl_pipeline_spark.queries import text  # noqa: F401, E402
from currency_etl_pipeline_spark.queries import vectors  # noqa: F401, E402
from currency_etl_pipeline_spark.queries import streaming_queries  # noqa: F401, E402
from currency_etl_pipeline_spark.queries import multimodal_queries  # noqa: F401, E402
from currency_etl_pipeline_spark.queries import advanced  # noqa: F401, E402
from currency_etl_pipeline_spark.queries import stats  # noqa: F401, E402
from currency_etl_pipeline_spark.queries import tpch_extra  # noqa: F401, E402
from currency_etl_pipeline_spark.queries import tpch_partsupp  # noqa: F401, E402
from currency_etl_pipeline_spark.queries import grouped_map  # noqa: F401, E402
from currency_etl_pipeline_spark.queries import llm_prep  # noqa: F401, E402
from currency_etl_pipeline_spark.queries import incremental_queries  # noqa: F401, E402
