"""currency_etl_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the query & data-processing capabilities of the reference
ETL system (ABDULLAH-ibrahimm/currency-etl-pipeline: pandas tasks +
BigQuery SQL + a Streamlit dashboard) as one Spark engine:

- data model: append-only event log + derived latest-value snapshot
  (reference: historical_rates / current_rates, load_to_bigquery.py:32-36)
- operators: filters/projections, scalar functions, newest-wins MERGE
  upsert, top-k, window deltas, joins (broadcast/semi/anti/as-of),
  aggregations (groupBy/rollup/cube), set ops, streaming analogs
- LLM-pipeline extensions: dedup (exact/MinHash/SimHash/Jaccard),
  similarity search, text analysis, multimodal column plumbing

Everything is DataFrame/Spark-SQL first (Catalyst optimizes), designed
for 100 TB scale: no driver-side collects in operators, broadcast for
small dims, single-shuffle window rewrites, salting hooks for skew.
"""

__version__ = "0.1.0"

from currency_etl_pipeline_spark.session import get_spark  # noqa: F401
from currency_etl_pipeline_spark.tables import load_table, TABLES  # noqa: F401
