"""Zero-cost pipeline metrics via Spark's Observation API.

``operators/validate.py`` answers "is this table publishable?" with a
dedicated report query; this module answers "what flowed through the
job I already ran?" — named aggregate metrics (`df.observe`) evaluated
PIGGYBACKED on the action the caller was going to execute anyway. No
second scan, no extra shuffle: the observed aggregates ride the
existing plan as accumulator-style partial aggregates, so the cost at
100 TB is a handful of counters per task, not a re-read of the input
(the reference's only telemetry was print statements around pandas
steps, fetch.py:58-61 / load.py:20-29).

Use it to meter a corpus-ingest or shard-prep run: rows in, rows
gated, PII hits redacted, token totals — the numbers an operator
dashboards after every batch — while the batch itself lands data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observe_metrics(
    df: DataFrame, metrics: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to a DataFrame.

    Returns (df', observation); run ANY action on df' (write, count,
    foreachBatch...) and ``observation.get`` yields the metric values
    for exactly the rows that action consumed. Metric expressions must
    be aggregates (Spark enforces this at analysis time).
    """
    if not metrics:
        raise ValueError("observe_metrics needs at least one named metric")
    obs = Observation()
    names = sorted(metrics)
    return df.observe(obs, *(metrics[n].alias(n) for n in names)), obs


def ingest_gate_metrics(corpus: DataFrame) -> dict[str, Column]:
    """The standard counters for a documents-shaped ingest batch:
    volume in, short-doc share, and total token mass — cheap conditional
    aggregates any gate composition can observe without re-scanning."""
    from currency_etl_pipeline_spark.queries.text import tokens

    n_toks = F.size(tokens())
    return {
        "n_rows": F.count(F.lit(1)),
        "n_short_docs": F.sum((n_toks < 10).cast("long")),
        "total_tokens": F.sum(n_toks.cast("long")),
    }
