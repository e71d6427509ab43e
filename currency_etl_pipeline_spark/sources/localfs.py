"""Sidecar IO for stores that pair Spark relations with tiny metadata
files — POSIX fast path, JVM Hadoop FileSystem dispatch for URI paths.

Every store that pairs distributed parquet relations (Spark IO — happy
on any Hadoop filesystem) with driver-side filesystem operations
funnels them through :func:`sidecar_fs`: SnapshotStore's ``_LATEST``
pointer and ``_TAG`` markers, the MinHash index's ``_params.json`` and
tombstone probes, the streaming ``_last_epoch`` replay markers, AND
(r8, second pass) the directory-swap maintenance machinery — warehouse
partition compaction/RTBF rewrites, MinHash tombstone compaction, IVF
cell swaps and reclusters. Through round 7 all of this was raw
``open``/``os.replace``/``shutil`` guarded by a fail-loud URI check;
the 100 TB deployment the module docs name lives on HDFS-like or
object storage, so r8 flips the guard into a dispatch (VERDICT r7
task 3):

- **Scheme-less path** → :class:`_PosixSidecarFS`: ``open`` /
  ``os.replace`` / ``os.listdir`` / ``shutil``, exactly the previous
  behavior. ``os.replace`` is atomic on POSIX, so pointer flips are
  torn-free; ``os.rename`` backs the directory swaps.
- **URI path** (``file://``, ``hdfs://``, ``gs://``, ``s3a://`` …) →
  :class:`_HadoopSidecarFS`: the JVM ``org.apache.hadoop.fs``
  layer reached over py4j — ``FileSystem.create``/``open`` for bytes,
  ``FileContext.rename(..., Options.Rename.OVERWRITE)`` for the
  pointer flip, ``FileSystem.rename``/``delete`` for directory swaps
  (all atomic metadata ops on HDFS and local; the ``file://`` scheme
  is how tests exercise this branch without a real bucket).

Atomicity caveats, documented once here:

- On GCS/S3 a "rename" is copy+delete, so the POINTER flip degrades to
  a small torn window and last-writer-wins under concurrent writers.
  The stores' single-writer model (one committer per store, readers
  resolve the pointer at plan time) is safe there; true multi-writer
  needs a conditional-put pointer (GCS ``ifGenerationMatch`` / S3
  ``If-None-Match``) or a table format whose transaction log replaces
  the pointer entirely (the ``merge_into_available`` upgrade path).
- DIRECTORY swaps (delete live dir → rename staging into place) are a
  brief non-atomic window even on POSIX (documented per store with the
  recovery step); on object stores the rename is additionally O(data).
  The operational contract is unchanged from the POSIX days: run
  compaction/RTBF/recluster on COLD partitions with a single
  maintainer — the count-verified staging plus the re-list guard make
  a crashed swap recoverable, never silently lossy.
"""

from __future__ import annotations

import os
import shutil


class _PosixSidecarFS:
    """Sidecar IO on a plain mounted filesystem (the fast path)."""

    def read_text(self, path: str) -> str | None:
        # Only ABSENCE maps to None — a real IO error (EACCES, EIO)
        # must propagate, or a permission problem on _LATEST makes
        # SnapshotStore.exists() report a populated store as empty
        # (r9 ADVICE).
        try:
            with open(path) as fh:
                return fh.read()
        except (FileNotFoundError, NotADirectoryError, IsADirectoryError):
            return None

    def write_text(self, path: str, text: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(text)
        os.replace(tmp, path)  # atomic on POSIX

    def create_exclusive(self, path: str, text: str = "") -> bool:
        """Atomic create-if-absent (O_EXCL): True if THIS call created
        the file, False if it already existed — the conditional-create
        commit point for exactly-once protocols. POSIX open('x') is
        atomic; the Hadoop twin maps to FileSystem.create(overwrite=
        False), which GCS implements as an ifGenerationMatch=0
        conditional insert (truly atomic) and HDFS/local as an atomic
        namespace op. S3A cannot make this atomic without S3
        conditional writes (If-None-Match, supported by recent
        connectors) — there the single-writer contract carries it."""
        try:
            with open(path, "x") as fh:
                fh.write(text)
            return True
        except FileExistsError:
            return False

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

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)  # atomic on POSIX; dst must not exist

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def copy_file(self, src: str, dst: str) -> None:
        shutil.copy(src, dst)


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

    def create_exclusive(self, path: str, text: str = "") -> bool:
        """Atomic create-if-absent: ``FileSystem.create(overwrite=
        False)`` — FileAlreadyExistsException → False. HDFS/local make
        this an atomic namespace op; the GCS connector maps it to an
        ifGenerationMatch=0 conditional insert (the truly-atomic
        object-store commit point the module docstring names); S3A
        needs S3 conditional writes (recent connectors) or the
        single-writer contract."""
        try:
            out = self._fs.create(self._p(path), False)
        except Exception as e:  # py4j wraps FileAlreadyExistsException
            if "AlreadyExists" in str(e) or "already exists" in str(e):
                return False
            raise
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        return True

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

    def rename(self, src: str, dst: str) -> None:
        """No-overwrite rename (dst must not exist) — the directory-swap
        primitive. Atomic metadata op on HDFS and local; on object
        stores the connector emulates it as copy+delete (correct, not
        atomic, O(data) — run swaps cold there, or use a table format)."""
        if not self._fs.rename(self._p(src), self._p(dst)):
            raise OSError(f"Hadoop rename failed: {src!r} -> {dst!r}")

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def copy_file(self, src: str, dst: str) -> None:
        # Small sidecar files only (markers, params) — streamed through
        # the driver, not a distcp.
        text = self.read_text(src)
        if text is None:
            raise FileNotFoundError(src)
        self.write_text(dst, text)


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
