"""Sidecar IO for stores that pair Spark relations with tiny metadata
files — POSIX fast path, JVM Hadoop FileSystem dispatch for URI paths.

Several stores pair distributed parquet relations (Spark IO — happy on
any Hadoop filesystem) with small sidecars: SnapshotStore's ``_LATEST``
pointer and ``_TAG`` markers, the MinHash index's ``_params.json`` and
tombstone probes, the streaming ``_last_epoch`` replay markers. Through
round 7 those sidecars were raw ``open``/``os.replace`` calls guarded
by :func:`require_local_path`; the 100 TB deployment the module docs
name lives on an object store, so r8 flips the guard into a dispatch
(VERDICT r7 task 3):

- **Scheme-less path** → :class:`_PosixSidecarFS`: ``open`` /
  ``os.replace`` / ``os.listdir``, exactly the previous behavior.
  ``os.replace`` is atomic on POSIX, so pointer flips are torn-free.
- **URI path** (``file://``, ``hdfs://``, ``gs://``, ``s3a://`` …) →
  :class:`_HadoopSidecarFS`: the JVM ``org.apache.hadoop.fs``
  layer reached over py4j — ``FileSystem.create``/``open`` for bytes,
  ``FileContext.rename(..., Options.Rename.OVERWRITE)`` for the
  pointer flip (atomic on HDFS and local; the ``file://`` scheme is
  how tests exercise this branch without a real bucket).

Atomicity caveat, documented once here: on GCS/S3 a "rename" is
copy+delete, so the pointer flip degrades to a small torn window and
last-writer-wins under concurrent writers. The stores' single-writer
maintenance model (one committer per store, readers resolve the pointer
at plan time) is safe there; true multi-writer needs a conditional-put
pointer (GCS ``ifGenerationMatch`` / S3 ``If-None-Match``) or a table
format whose transaction log replaces the pointer entirely (the
``merge_into_available`` Delta upgrade path).

The heavyweight partition-REWRITE machinery (warehouse partition
swaps, MinHash tombstone compaction, IVF cell swaps/recluster) moves
whole parquet directories with count-verified staging; those stay
POSIX-only behind :func:`require_local_path` — on an object store the
same jobs should run through a transactional table format instead of
directory renames.
"""

from __future__ import annotations

import os
import shutil


def require_local_path(path: str, store: str) -> str:
    """Raise ValueError for scheme-prefixed (object-store) paths.

    The guard for the PARTITION-REWRITE stores (directory-swap
    machinery): handed an object-store URI the ``shutil`` calls would
    either crash confusingly deep in a rewrite or — worse — write to a
    literal ``./gs:/bucket/...`` directory and "succeed". Sidecar
    pointer/marker IO no longer funnels through here — use
    :func:`sidecar_fs`, which dispatches URI paths to the JVM Hadoop
    filesystem instead of refusing them.

    ``store`` names the caller for the error message. Returns ``path``
    unchanged so call sites can wrap assignments.
    """
    if "://" in str(path):
        raise ValueError(
            f"{store}: path {path!r} has a URI scheme — this store rewrites "
            "whole parquet directories with POSIX renames that cannot run "
            "on an object store; use a local or shared POSIX mount, or a "
            "transactional table format (see sources/localfs.py)"
        )
    return str(path)


class _PosixSidecarFS:
    """Sidecar IO on a plain mounted filesystem (the fast path)."""

    def read_text(self, path: str) -> str | None:
        try:
            with open(path) as fh:
                return fh.read()
        except OSError:
            return None

    def write_text(self, path: str, text: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(text)
        os.replace(tmp, path)  # atomic on POSIX

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def is_file(self, path: str) -> bool:
        return os.path.isfile(path)

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def list_names(self, path: str) -> list[str]:
        try:
            return sorted(os.listdir(path))
        except OSError:
            return []

    def delete(self, path: str) -> None:
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)


class _HadoopSidecarFS:
    """Sidecar IO through the JVM Hadoop FileSystem (py4j).

    One instance per (session, URI authority): ``FileSystem.get``
    returns the scheme's cached client, so constructing this per store
    is cheap. All methods take FULL paths (scheme included) — the same
    strings the POSIX twin takes, so stores are impl-agnostic.
    """

    def __init__(self, spark, path: str):
        self._jvm = spark._jvm
        self._conf = spark.sparkContext._jsc.hadoopConfiguration()
        uri = self._jvm.java.net.URI(str(path))
        self._fs = self._jvm.org.apache.hadoop.fs.FileSystem.get(uri, self._conf)
        self._fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            uri, self._conf
        )
        # Options.Rename is a varargs enum parameter: py4j needs an
        # explicit java array. Built once; OVERWRITE gives the atomic
        # pointer-flip semantics os.replace gives on POSIX.
        rename = getattr(self._jvm.org.apache.hadoop.fs, "Options$Rename")
        self._overwrite = spark.sparkContext._gateway.new_array(rename, 1)
        self._overwrite[0] = rename.OVERWRITE

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(str(path))

    def read_text(self, path: str) -> str | None:
        p = self._p(path)
        if not self._fs.exists(p):
            return None
        inp = self._fs.open(p)
        try:
            baos = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
                inp, baos, self._conf, False
            )
            return bytes(baos.toByteArray()).decode("utf-8")
        finally:
            inp.close()

    def write_text(self, path: str, text: str) -> None:
        tmp = self._p(path + ".tmp")
        out = self._fs.create(tmp, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        self._fc.rename(tmp, self._p(path), self._overwrite)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def is_file(self, path: str) -> bool:
        p = self._p(path)
        return bool(self._fs.exists(p)) and bool(self._fs.getFileStatus(p).isFile())

    def is_dir(self, path: str) -> bool:
        p = self._p(path)
        return bool(self._fs.exists(p)) and bool(
            self._fs.getFileStatus(p).isDirectory()
        )

    def list_names(self, path: str) -> list[str]:
        p = self._p(path)
        if not self._fs.exists(p):
            return []
        return sorted(
            st.getPath().getName() for st in self._fs.listStatus(p)
        )

    def delete(self, path: str) -> None:
        self._fs.delete(self._p(path), True)  # recursive; False if absent


def sidecar_fs(path: str, spark=None):
    """The sidecar IO impl for ``path``: POSIX for scheme-less paths,
    the JVM Hadoop FileSystem for URIs. ``spark`` may be omitted for
    the POSIX branch; the Hadoop branch resolves the active session if
    none is passed (sidecars are only ever touched while a session is
    driving the store) and fails loudly without one.
    """
    if "://" not in str(path):
        return _PosixSidecarFS()
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                f"sidecar path {path!r} has a URI scheme, which needs the JVM "
                "Hadoop filesystem — no active SparkSession to reach it"
            )
    return _HadoopSidecarFS(spark, path)
