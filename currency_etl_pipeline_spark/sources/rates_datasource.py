"""`spark.read.format("currency_rates")` — the REST-payload ingest as
a first-class Spark data source (Python Data Source API, Spark 4).

The reference fetches ONE payload driver-side per DAG run
(fetch.py:13-85) and `rates_pipeline.quotes_payload_to_rates` mirrors
that single-dict path. A backfill or multi-source deployment instead
has a DIRECTORY of landed payload files (one JSON per poll — the raw
zone); this source turns that directory into a parallel scan:

    spark.dataSource.register(CurrencyRatesDataSource)
    df = (spark.read.format("currency_rates")
          .option("path", raw_zone_dir).load())

Each payload file is one InputPartition, so a 10k-file backfill reads
on 10k-way parallelism with no driver loop, and the executors — not
the driver — parse JSON and explode quotes to (pair, rate) rows.
The raw zone must be an executor-reachable POSIX path (shared mount):
IO goes through os.listdir/open, NOT the Hadoop filesystem layer, so
object-store URIs are rejected up front and a missing/empty path
raises in partitions() rather than producing an empty "successful"
scan.
Malformed or failed payloads (success=false) yield an error row
(err column) instead of killing the scan — a quarantine-friendly
contract matching sources/lake's JSONL quarantine channel.

Rows leave this source STRING-typed exactly like the single-payload
path (numeric coercion is transform's job, transform.py:39-46);
`transform_rates` + `prepare_for_load` compose unchanged downstream.
A DataSourceStreamReader twin (offset = sorted file list position)
would make the raw zone tail-able; the batch reader is the tested
surface here.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SCHEMA = (
    "base_currency string, pair string, rate string, "
    "target_currency string, fetched_at string, payload_file string, err string"
)


class _PayloadPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class CurrencyRatesReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("currency_rates source requires .option('path', <dir or file>)")
        self.path = path

    def partitions(self):
        # LOCAL-FILESYSTEM-ONLY: discovery and IO use os.listdir/open,
        # so the path must be a POSIX path reachable from every
        # executor (shared mount). Object-store URIs (gs://, s3a://)
        # are NOT dereferenced here — they'd be treated as a single
        # unreadable "file" — so reject anything scheme-prefixed and
        # fail loudly on a missing/empty path instead of returning a
        # successful-looking scan that read nothing.
        if "://" in self.path:
            raise ValueError(
                "currency_rates source reads executor-local POSIX paths only; "
                f"object-store URI {self.path!r} is not supported — land the "
                "raw zone on a shared filesystem or ingest via spark.read.json"
            )
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(".json")
            )
            if not files:
                raise FileNotFoundError(
                    f"currency_rates source: no *.json payload files under {self.path!r}"
                )
        elif os.path.isfile(self.path):
            files = [self.path]
        else:
            raise FileNotFoundError(
                f"currency_rates source: path {self.path!r} does not exist"
            )
        # One partition per payload file: a backfill directory scans
        # with file-count parallelism; Spark schedules them like any
        # other splits.
        return [_PayloadPartition(p) for p in files]

    def read(self, partition: _PayloadPartition):
        fname = os.path.basename(partition.path)
        try:
            with open(partition.path) as fh:
                payload = json.load(fh)
        except (OSError, ValueError) as e:
            yield (None, None, None, None, None, fname, f"unreadable payload: {e}")
            return
        if not isinstance(payload, dict) or not isinstance(payload.get("quotes", {}), dict):
            # Valid JSON that is not an object (or quotes not a map) must
            # quarantine too — .get()/.items() on it would kill the scan.
            yield (None, None, None, None, None, fname, "malformed payload: not an object")
            return
        if not payload.get("success", False):
            err = str(payload.get("error", "success=false"))
            yield (None, None, None, None, None, fname, f"API error: {err}")
            return
        if not payload.get("source"):
            yield (None, None, None, None, None, fname, "malformed payload: no source")
            return
        base = str(payload["source"])
        fetched_at = payload.get("fetched_at")
        fetched_at = None if fetched_at is None else str(fetched_at)
        quotes = payload.get("quotes") or {}
        if not quotes:
            # A success=true payload with no quotes is as degenerate as
            # a failed one — quarantine it rather than vanishing the
            # poll silently (zero rows would look like a clean scan).
            yield (None, None, None, None, None, fname, "malformed payload: no quotes")
            return
        for pair, rate in sorted(quotes.items()):
            pair = str(pair)
            target = pair[len(base):] if pair.startswith(base) else None
            yield (
                base,
                pair,
                None if rate is None else str(rate),
                target,
                fetched_at,
                fname,
                None,
            )


class CurrencyRatesDataSource(DataSource):
    """Register once per session: ``spark.dataSource.register(CurrencyRatesDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "currency_rates"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> CurrencyRatesReader:
        return CurrencyRatesReader(self.options)


# --- tail-able raw zone: the streaming twin -------------------------------
#
# The batch reader above scans a LANDED raw zone; a live deployment
# tails it — the reference's 60 s Streamlit poll loop (app.py:23-25)
# over the timestamp-named landed files (fetch.py:64-74) IS a tailed
# directory. Spark 4's DataSourceStreamReader would make the Python
# data source itself streamable, but that API needs google.protobuf
# (absent here — SURVEY §8 S14); the native FILE STREAM source below
# is the implemented equivalent and the better scale path anyway: it
# rides Hadoop FS (object stores work, unlike the POSIX-only batch
# reader), tracks processed files in the checkpoint, and parses JSON
# with codegen instead of Python workers.

_PAYLOAD_JSON_SCHEMA = (
    "success boolean, source string, error string, fetched_at string, "
    "quotes map<string,string>, _corrupt string"
)


def stream_rates_raw_zone(spark, raw_zone: str):
    """``readStream`` over a raw-zone directory of one-JSON-per-file
    payloads, emitting the SAME seven-column contract as the batch
    ``currency_rates`` source (good quote rows + quarantined err rows;
    batch-equivalence pytest-pinned in tests/test_streaming.py).

    Each payload file arrives as ONE row (`wholetext`), so a file is
    parsed exactly once no matter how many quotes it carries; the
    quarantine taxonomy mirrors the batch reader:

    - unparseable JSON            → ``unreadable payload: ...``
    - success != true             → ``API error: <raw error JSON>``
    - missing/empty ``source``    → ``malformed payload: no source``
    - missing/empty ``quotes``    → ``malformed payload: no quotes``

    (For API errors the detail is the raw JSON fragment; the batch
    reader renders the same object through Python ``str`` — the
    category prefix is the stable contract, pinned by the tests.)

    Everything is stateless map-side codegen — from_json, one CASE,
    one conditional explode — so the stream needs no watermark and no
    state store; at scale the only cost is the file-source's listing
    of new files per micro-batch (use ``maxFilesPerTrigger`` to bound
    batch size on a deep backlog).
    """
    from pyspark.sql import functions as F

    raw = (
        spark.readStream.option("wholetext", "true")
        .option("pathGlobFilter", "*.json")
        .text(raw_zone)
    )
    parsed = raw.select(
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("payload_file"),
        F.from_json(
            "value",
            _PAYLOAD_JSON_SCHEMA,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("p"),
    )
    p = F.col("p")
    err = (
        F.when(
            p.isNull() | p.getField("_corrupt").isNotNull(),
            F.lit("unreadable payload: malformed JSON"),
        )
        .when(
            ~F.coalesce(p.getField("success"), F.lit(False)),
            F.concat(
                F.lit("API error: "),
                F.coalesce(p.getField("error"), F.lit("success=false")),
            ),
        )
        .when(
            p.getField("source").isNull() | (p.getField("source") == ""),
            F.lit("malformed payload: no source"),
        )
        .when(
            p.getField("quotes").isNull() | (F.size(p.getField("quotes")) == 0),
            F.lit("malformed payload: no quotes"),
        )
    )
    null_kv = F.array(
        F.struct(
            F.lit(None).cast("string").alias("key"),
            F.lit(None).cast("string").alias("value"),
        )
    )
    staged = parsed.select(
        "payload_file",
        err.alias("err"),
        F.when(err.isNull(), p.getField("source")).alias("base_currency"),
        F.when(err.isNull(), p.getField("fetched_at")).alias("fetched_at"),
        F.explode(
            F.when(err.isNull(), F.map_entries(p.getField("quotes"))).otherwise(null_kv)
        ).alias("kv"),
    )
    return staged.select(
        "base_currency",
        F.col("kv.key").alias("pair"),
        F.col("kv.value").alias("rate"),
        F.when(
            F.col("kv.key").startswith(F.col("base_currency")),
            F.expr("substring(kv.key, char_length(base_currency) + 1)"),
        ).alias("target_currency"),
        "fetched_at",
        "payload_file",
        "err",
    )
