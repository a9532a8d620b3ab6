"""Catalog seam: the table-metadata operations the index store needs,
factored behind an interface so the commit.json filesystem backend (this
sandbox has no Iceberg jar) and a real Iceberg catalog (REST / Hive /
Glue, where the Iceberg Spark runtime exists) are drop-in interchangeable.

The contract mirrors what Iceberg's TableOperations gives a writer
(≙ SegmentInfos' role for the reference, core/index/SegmentInfos.java:55-106):

* ``read_pointer`` / ``swap_pointer`` — the table-metadata pointer
  (commit.json here, metadata.json in Iceberg, segments_N in the
  reference).  ``swap_pointer`` MUST be atomic: publish-by-rename.
* ``write_manifest`` / ``read_manifest`` / ``drop_manifest`` — immutable
  per-snapshot manifests (commit-N.json here, snap-N.avro in Iceberg).
* ``write_lock`` — single-writer mutual exclusion for table-metadata
  mutations (write.lock here; Iceberg uses optimistic CAS on the pointer,
  which also satisfies this contract).
* ``data_location`` — where a snapshot's data files live.

`lucene_spark.index.store` routes every metadata read/write through a
Catalog (default: FileCatalog).  Swapping in an Iceberg-backed
implementation changes no store code — the store's data files are already
plain parquet, which is exactly Iceberg's data layer.
"""

from __future__ import annotations

import json
import os
from contextlib import contextmanager


class LockObtainFailedError(RuntimeError):
    """≙ org.apache.lucene.store.LockObtainFailedException."""


class Catalog:
    """Abstract table-metadata backend (see module docstring)."""

    # -- pointer ----------------------------------------------------------
    def read_pointer(self, table: str) -> dict:
        """Return the table-metadata pointer contents.  Raises
        FileNotFoundError if the table has never been committed."""
        raise NotImplementedError

    def swap_pointer(self, table: str, meta: dict) -> None:
        """ATOMICALLY publish ``meta`` as the new pointer — a crash
        mid-publish must leave the previous pointer intact."""
        raise NotImplementedError

    def table_meta(self, table: str) -> dict:
        """The v2 (snapshot-mode) pointer, or {} for absent/v1 tables."""
        try:
            meta = self.read_pointer(table)
        except FileNotFoundError:
            return {}
        return meta if meta.get("format_version", 1) >= 2 else {}

    # -- snapshot manifests ------------------------------------------------
    def read_manifest(self, table: str, snapshot_id: int) -> dict:
        raise NotImplementedError

    def write_manifest(self, table: str, snapshot_id: int, payload: dict) -> None:
        raise NotImplementedError

    def drop_manifest(self, table: str, snapshot_id: int) -> None:
        """Delete one snapshot's manifest AND its data files (used by
        expire_snapshots, after the pointer no longer names it)."""
        raise NotImplementedError

    # -- writer exclusion ---------------------------------------------------
    @contextmanager
    def write_lock(self, table: str):
        """Single-writer guard held across every table-metadata
        read-modify-write.  Must raise LockObtainFailedError when another
        writer holds the table."""
        raise NotImplementedError
        yield  # pragma: no cover

    # -- data layout ---------------------------------------------------------
    def data_location(self, table: str, name: str) -> str:
        """Resolve where the data files for ``name`` (e.g. 'gen-3', or ''
        for a v1 single-commit table) live."""
        raise NotImplementedError


class FileCatalog(Catalog):
    """The commit.json backend: plain filesystem, zero dependencies.

    Pointer swaps are tmp + fsync + os.replace (the segments_N / Iceberg
    metadata.json durability contract); writer exclusion is an O_EXCL
    write.lock (core/store/NativeFSLockFactory.java:46)."""

    def read_pointer(self, table: str) -> dict:
        with open(os.path.join(table, "commit.json")) as f:
            return json.load(f)

    def swap_pointer(self, table: str, meta: dict) -> None:
        target = os.path.join(table, "commit.json")
        tmp = target + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, target)

    def read_manifest(self, table: str, snapshot_id: int) -> dict:
        with open(os.path.join(table, f"commit-{snapshot_id}.json")) as f:
            return json.load(f)

    def write_manifest(self, table: str, snapshot_id: int, payload: dict) -> None:
        with open(os.path.join(table, f"commit-{snapshot_id}.json"), "w") as f:
            json.dump(payload, f, indent=2)

    def drop_manifest(self, table: str, snapshot_id: int) -> None:
        import shutil

        manifest = self.read_manifest(table, snapshot_id)
        shutil.rmtree(
            self.data_location(table, manifest["data"]), ignore_errors=True
        )
        os.remove(os.path.join(table, f"commit-{snapshot_id}.json"))

    @contextmanager
    def write_lock(self, table: str):
        lock = os.path.join(table, "write.lock")
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            raise LockObtainFailedError(
                f"write.lock held on {table} — another writer is committing"
            ) from None
        try:
            yield
        finally:
            os.remove(lock)

    def data_location(self, table: str, name: str) -> str:
        return os.path.join(table, name) if name else table


DEFAULT_CATALOG = FileCatalog()
