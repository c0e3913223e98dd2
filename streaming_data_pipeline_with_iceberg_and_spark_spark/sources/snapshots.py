"""Snapshot-versioned parquet tables: Iceberg's table semantics re-expressed.

The reference's defining storage choice is Iceberg
(/root/reference/spark-data-pipeline/spark_job.py:47-64,126-145: catalog
config, snapshot commit on every write, CoW table properties). This container
ships no Iceberg runtime jar (probe in COVERAGE.md), so ``Warehouse`` falls
back to plain parquet — losing snapshot isolation, time travel, rollback and
compaction. This module restores those semantics on the parquet fallback the
same way Iceberg itself does: **immutable data files + a metadata log that
names which files each version sees**.

Layout (one table)::

    <root>/data/s<id>/part-*.parquet   immutable file set added by commit <id>
    <root>/metadata/snapshots.json     ordered commit log (the "metadata log")

A snapshot is ``{"id", "op", "dirs", "ts"}`` where ``dirs`` is the list of
data directories visible at that version. Append commits parent dirs + one
new dir; overwrite and compaction commit exactly one new dir. Reads resolve a
version to its dirs and hand Spark a multi-path parquet scan — partition
pruning, pushdown and column pruning all still apply, and executors never
touch the metadata log (it is a driver-side pointer swap, exactly Iceberg's
commit model).

Like the ``Warehouse`` parquet fallback, the commit log is single-writer
(no optimistic-concurrency CAS) — a documented limitation of the fallback,
not the design; with the Iceberg jar present ``Warehouse`` already routes to
real Iceberg tables and this module is unnecessary.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class SnapshotError(Exception):
    pass


class SnapshotTable:
    """One snapshot-versioned table rooted at ``root``."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._meta_path = os.path.join(root, "metadata", "snapshots.json")

    # -- metadata log ------------------------------------------------------
    def _log(self) -> list[dict]:
        if not os.path.exists(self._meta_path):
            return []
        with open(self._meta_path) as f:
            return json.load(f)

    def _commit(self, entry: dict) -> dict:
        """Append one snapshot to the log (write-new + atomic rename, so a
        crashed commit leaves the previous log intact — a torn write can
        never corrupt published versions)."""
        log = self._log()
        entry["id"] = (log[-1]["id"] + 1) if log else 1
        entry["ts"] = time.time()
        os.makedirs(os.path.dirname(self._meta_path), exist_ok=True)
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(log + [entry], f, indent=1)
        os.replace(tmp, self._meta_path)
        return entry

    def _snapshot(self, version: int | None) -> dict:
        log = self._log()
        if not log:
            raise SnapshotError(f"no snapshots at {self.root}")
        if version is None:
            return log[-1]
        for s in log:
            if s["id"] == version:
                if s.get("expired"):
                    raise SnapshotError(f"snapshot {version} has been expired")
                return s
        raise SnapshotError(f"no snapshot {version} at {self.root}")

    def current_version(self) -> int | None:
        log = self._log()
        return log[-1]["id"] if log else None

    # -- writes (each one commit = one new snapshot) -----------------------
    def _write_data_dir(self, df: DataFrame, snap_id: int) -> str:
        d = os.path.join(self.root, "data", f"s{snap_id}")
        df.write.option("compression", "snappy").mode("errorifexists").parquet(d)
        return d

    def append(self, df: DataFrame) -> int:
        """Append commit: new version sees parent's dirs + this batch's dir."""
        log = self._log()
        nxt = (log[-1]["id"] + 1) if log else 1
        d = self._write_data_dir(df, nxt)
        parent_dirs = log[-1]["dirs"] if log else []
        return self._commit({"op": "append", "dirs": parent_dirs + [d]})["id"]

    def append_batch(self, df: DataFrame, batch_id: int) -> int | None:
        """Idempotent streaming append: one snapshot per micro-batch, keyed
        by ``batch_id``. Replayed batches (foreachBatch is at-least-once on
        restart) are detected in the commit log and skipped, so the table is
        exactly-once end-to-end — the gap the reference leaves open between
        its table write and its SQS commit (spark_job.py:61 vs :185) closes
        because here the commit IS the atomic metadata swap.

        A crash after the data write but before the commit leaves an orphan
        data dir; the replay detects it (present on disk, referenced by no
        snapshot) and rewrites it. Returns the committed version, or None if
        the batch was a replay."""
        log = self._log()
        if any(s.get("batch_id") == batch_id for s in log):
            return None
        nxt = (log[-1]["id"] + 1) if log else 1
        d = os.path.join(self.root, "data", f"s{nxt}")
        referenced = {p for s in log for p in s["dirs"]}
        if os.path.isdir(d) and d not in referenced:  # orphan of a crashed commit
            shutil.rmtree(d)
        self._write_data_dir(df, nxt)
        parent_dirs = log[-1]["dirs"] if log else []
        return self._commit(
            {"op": "append", "dirs": parent_dirs + [d], "batch_id": batch_id}
        )["id"]

    def overwrite(self, df: DataFrame) -> int:
        """Overwrite commit: new version sees only this batch's dir. Old
        versions keep their files — time travel to them still works."""
        log = self._log()
        nxt = (log[-1]["id"] + 1) if log else 1
        d = self._write_data_dir(df, nxt)
        return self._commit({"op": "overwrite", "dirs": [d]})["id"]

    # -- reads -------------------------------------------------------------
    def read(self, version: int | None = None) -> DataFrame:
        """Current version, or time travel via ``version`` (Iceberg's
        ``VERSION AS OF``). Multi-path parquet scan — pushdown/pruning
        intact; no driver-side data movement."""
        snap = self._snapshot(version)
        if not snap["dirs"]:
            raise SnapshotError(f"snapshot {snap['id']} is empty")
        return self.spark.read.parquet(*snap["dirs"])

    def read_as_of(self, ts: float) -> DataFrame:
        """Time travel by wall-clock time (``TIMESTAMP AS OF``): the latest
        snapshot committed at or before ``ts``."""
        eligible = [s for s in self._log() if s["ts"] <= ts and not s.get("expired")]
        if not eligible:
            raise SnapshotError(f"no snapshot at or before {ts}")
        return self.read(eligible[-1]["id"])

    def history(self) -> DataFrame:
        """The commit log as a DataFrame (Iceberg's ``<table>.history``
        metadata table): one row per snapshot with op, file count, liveness."""
        rows = [
            (s["id"], s["op"], len(s["dirs"]), float(s["ts"]), bool(s.get("expired")))
            for s in self._log()
        ]
        return self.spark.createDataFrame(
            rows, "version long, op string, n_dirs int, committed_at double, expired boolean"
        )

    # -- table maintenance -------------------------------------------------
    def rollback(self, version: int) -> int:
        """Roll back by COMMITTING a new snapshot that sees ``version``'s
        files (Iceberg's rollback model: history is append-only, so the bad
        version stays inspectable and the rollback itself is auditable)."""
        snap = self._snapshot(version)
        return self._commit({"op": f"rollback({version})", "dirs": list(snap["dirs"])})["id"]

    def compact(self, target_file_bytes: int = 128 * 1024 * 1024) -> int:
        """Small-file compaction (Iceberg's ``rewrite_data_files``): rewrite
        the current version's data as ~``target_file_bytes`` files and commit
        the rewrite as a new snapshot. Streaming ingest's defining pathology
        is one small file per trigger per partition; at 100 TB an uncompacted
        table turns every scan into millions of file opens. Data is byte-for-
        byte equivalent — only the file layout changes, so old versions stay
        readable and the compaction is itself roll-back-able.

        File count is sized from the current version's on-disk bytes (driver
        walks file sizes in metadata only — no data read)."""
        snap = self._snapshot(None)
        total = 0
        for d in snap["dirs"]:
            for base, _, files in os.walk(d):
                total += sum(
                    os.path.getsize(os.path.join(base, f))
                    for f in files
                    if f.endswith(".parquet")
                )
        n_files = max(1, -(-total // target_file_bytes))  # ceil
        df = self.read().repartition(n_files)
        nxt = snap["id"] + 1
        d = self._write_data_dir(df, nxt)
        return self._commit({"op": "compact", "dirs": [d]})["id"]

    def expire_snapshots(self, keep_last: int = 2) -> list[int]:
        """Expire all but the last ``keep_last`` snapshots and DELETE data
        dirs no live snapshot references (Iceberg's ``expire_snapshots`` —
        the storage-reclaim half of the snapshot model). Returns expired ids.
        Expired versions refuse time travel with a clear error."""
        log = self._log()
        if len(log) <= keep_last:
            return []
        live, dead = log[-keep_last:], log[:-keep_last]
        keep_dirs = {d for s in live for d in s["dirs"]}
        expired_ids = []
        for s in dead:
            if not s.get("expired"):
                s["expired"] = True
                expired_ids.append(s["id"])
            for d in s["dirs"]:
                if d not in keep_dirs and os.path.isdir(d):
                    shutil.rmtree(d)
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(dead + live, f, indent=1)
        os.replace(tmp, self._meta_path)
        return expired_ids
