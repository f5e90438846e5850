"""Snapshot table format: versioned, atomically-committed parquet tables.

BASELINE.json's north rule names Iceberg-style table maintenance (MERGE
upserts, snapshot-pinned resume).  The container ships no Iceberg runtime
jar, so ``tableio.TableIO`` degrades to bare parquet directories — correct
contents, but no history: ``replace`` has a (tiny) non-atomic rename window,
a reader can never pin the version it started from, and a failed writer can
leave a half-written directory the next reader trips on.

This module closes that gap with the same *design* Iceberg uses (public
knowledge — the Iceberg spec's metadata/data split), implemented on plain
parquet + POSIX rename so it runs anywhere Spark's local/HDFS-like
filesystems do:

* **Immutable data files.**  Every commit writes its rows to a fresh
  ``data/<token>/`` parquet directory; nothing ever rewrites or deletes a
  directory a live snapshot references.  Appends are metadata-only commits:
  the new manifest lists the parent's directories plus the new one.
* **Manifests.**  ``metadata/v<N>.json`` records the snapshot id, parent,
  wall-clock timestamp, operation, the data directories that make up the
  snapshot, the schema (as Spark schema JSON), and a row-count summary.
* **Atomic pointer commit.**  ``metadata/HEAD`` names the current manifest.
  Commits write the manifest first, then swap HEAD via write-temp +
  ``os.rename`` (atomic on POSIX).  A kill at ANY point leaves HEAD on the
  previous complete snapshot; the orphaned data directory is garbage, not
  corruption, and ``expire_snapshots`` collects it.
* **Optimistic concurrency.**  A commit carries the version it was computed
  against; a short ``O_CREAT|O_EXCL`` lock file makes check-and-swap atomic
  between local writers.  If HEAD moved underneath, ``CommitConflict`` is
  raised and ``merge`` recomputes against the new head and retries —
  Iceberg's catalog compare-and-swap, scoped to filesystems with atomic
  create/rename (local, HDFS, NFSv4).  On S3-style object stores this lock
  is where a real catalog service plugs in; the manifest/data layout is
  unchanged.
* **Time travel + rollback.**  ``read(version=)`` / ``read(as_of_ts=)``
  resolve any retained manifest; ``rollback_to`` commits a NEW version that
  re-exposes an old snapshot's files (history is append-only, as in
  Iceberg — rollback never erases the rolled-back snapshots).
* **Snapshot-pinned resume.**  ``current_version`` is cheap; a multi-stage
  job records it once and passes ``version=`` to every subsequent read, so
  concurrent MERGE traffic can never shear the job's inputs mid-run.

Scale note: manifests hold directory names, not per-row state — a commit is
O(files touched), reads are ``spark.read.parquet(dir1, dir2, …)`` so
Catalyst still gets pushdown/pruning over the union of snapshot files.  The
append path never rewrites history, so a 100 TB table's daily merge costs
the merge, not the table.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession

from relationextractionpipeline_spark.sources.tableio import TableIO, upsert_by_key


class CommitConflict(Exception):
    """HEAD advanced past the snapshot this commit was computed from."""


class NoSuchSnapshot(Exception):
    """Requested version/timestamp resolves to no retained manifest."""


@dataclass(frozen=True)
class Snapshot:
    version: int
    snapshot_id: str
    parent_id: Optional[str]
    ts: float
    operation: str
    data_dirs: List[str]
    schema_json: str
    row_count: int
    # True once any retained data dir was written under an older (narrower)
    # schema — tells the reader to pay parquet footer-merging at planning.
    # Non-evolved tables keep the cheap single-schema scan.
    evolved: bool = False


def _manifest_name(version: int) -> str:
    return f"v{version}.json"


class SnapshotTableIO(TableIO):
    """TableIO whose parquet fallback is the snapshot format above.

    Drop-in for ``TableIO`` everywhere the engine takes an ``io`` object
    (``streaming/upsert.py``, ``streaming/ctxlink.py``, the CLI): ``read``
    resolves HEAD, ``write``/``replace`` commit new snapshots, ``upsert``
    becomes a conflict-retrying MERGE.  When a real Iceberg runtime is on
    the classpath the base class routes to it and none of this engages —
    the format here is the fallback's upgrade, not a competing catalog.
    """

    MERGE_RETRIES = 5
    # commit locks guard two tiny file ops; one this old is a crash artifact
    STALE_LOCK_SEC = 30.0
    # orphan data dirs younger than this may be an in-flight write whose
    # commit hasn't landed yet — expire_snapshots must not delete them
    ORPHAN_GRACE_SEC = 3600.0

    def __init__(self, spark: SparkSession, warehouse: str, catalog: str = "local"):
        super().__init__(spark, warehouse, catalog)

    # ---- metadata plumbing -------------------------------------------------

    def _meta_dir(self, name: str) -> str:
        return os.path.join(self._path(name), "metadata")

    def _data_root(self, name: str) -> str:
        return os.path.join(self._path(name), "data")

    def _head_path(self, name: str) -> str:
        return os.path.join(self._meta_dir(name), "HEAD")

    def table_exists(self, name: str) -> bool:
        return os.path.exists(self._head_path(name))

    def current_version(self, name: str) -> int:
        """The version a job pins for snapshot-consistent multi-stage reads."""
        with open(self._head_path(name)) as f:
            head = f.read().strip()
        return int(head[1 : -len(".json")])

    def _load_manifest(self, name: str, version: int) -> Snapshot:
        path = os.path.join(self._meta_dir(name), _manifest_name(version))
        if not os.path.exists(path):
            raise NoSuchSnapshot(f"{name} has no retained manifest v{version}")
        with open(path) as f:
            m = json.load(f)
        return Snapshot(
            version=m["version"],
            snapshot_id=m["snapshot_id"],
            parent_id=m.get("parent_id"),
            ts=m["ts"],
            operation=m["operation"],
            data_dirs=m["data_dirs"],
            schema_json=m["schema_json"],
            row_count=m["row_count"],
            evolved=m.get("evolved", False),
        )

    def snapshot(
        self,
        name: str,
        version: Optional[int] = None,
        as_of_ts: Optional[float] = None,
    ) -> Snapshot:
        """Resolve a snapshot: HEAD by default, else an explicit version,
        else the newest manifest with ``ts <= as_of_ts`` (time travel)."""
        if version is not None:
            return self._load_manifest(name, version)
        if as_of_ts is not None:
            best = None
            for s in self.history(name):
                if s.ts <= as_of_ts and (best is None or s.version > best.version):
                    best = s
            if best is None:
                raise NoSuchSnapshot(f"{name} has no snapshot at or before {as_of_ts}")
            return best
        return self._load_manifest(name, self.current_version(name))

    def history(self, name: str) -> List[Snapshot]:
        """All retained snapshots, oldest first."""
        out = []
        for fn in os.listdir(self._meta_dir(name)):
            if fn.startswith("v") and fn.endswith(".json"):
                out.append(self._load_manifest(name, int(fn[1:-5])))
        return sorted(out, key=lambda s: s.version)

    # ---- commit protocol ---------------------------------------------------

    def _commit(
        self,
        name: str,
        data_dirs: List[str],
        operation: str,
        schema_json: str,
        row_count: int,
        expected_version: Optional[int],
        evolved: bool = False,
    ) -> Snapshot:
        """Write manifest v(head+1), then atomically swap HEAD.

        ``expected_version`` is the optimistic-concurrency token: None means
        "create" (conflict if the table already exists); otherwise HEAD must
        still be at that version under the commit lock or CommitConflict is
        raised and the caller recomputes.  Crash discipline: the manifest is
        fully written before HEAD moves, and HEAD moves via rename — every
        observable state is either the old snapshot or the new one.
        """
        meta = self._meta_dir(name)
        os.makedirs(meta, exist_ok=True)
        lock = os.path.join(meta, "COMMIT.lock")
        fd = None
        my_ino = None
        for _ in range(200):  # lock holders only do two tiny file ops
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                my_ino = os.fstat(fd).st_ino
                break
            except FileExistsError:
                # a writer killed while holding the lock would otherwise
                # wedge the table forever (every commit spins then raises,
                # and the retrying callers loop unbounded).  Lock holders
                # only do tiny metadata ops, so a lock older than
                # STALE_LOCK_SEC is a crash artifact: break it.  The break
                # re-stats immediately before the remove and only proceeds
                # if the path still holds the SAME (stale) inode — so a
                # lock freshly re-created by a racing breaker+acquirer is
                # not stolen through a stale first stat, and the
                # inode-verified release below keeps a theft from
                # cascading to a third writer.  Two windows remain: the
                # microsecond stat→remove gap (POSIX has no
                # unlink-if-inode), and the inherent lease-without-fencing
                # limit — a holder STALLED past STALE_LOCK_SEC races its
                # breaker and can lose the breaker's committed update.
                # Production concurrent writers belong on a real catalog's
                # CAS (Iceberg documents the same limitation for its
                # Hadoop catalog); locally, 30s against sub-millisecond
                # critical sections makes a stalled LIVE holder a
                # non-event.
                try:
                    st = os.stat(lock)
                    if time.time() - st.st_mtime > self.STALE_LOCK_SEC:
                        st2 = os.stat(lock)
                        if (
                            st2.st_ino == st.st_ino
                            and time.time() - st2.st_mtime
                            > self.STALE_LOCK_SEC
                        ):
                            os.remove(lock)
                        continue
                except OSError:
                    continue  # holder released between stat attempts
                time.sleep(0.01)
        if fd is None:
            raise CommitConflict(f"could not acquire commit lock for {name}")
        try:
            head_exists = os.path.exists(self._head_path(name))
            current = self.current_version(name) if head_exists else None
            if current != expected_version:
                raise CommitConflict(
                    f"{name}: HEAD at {current}, commit computed against "
                    f"{expected_version}"
                )
            version = (current or 0) + 1
            snap = Snapshot(
                version=version,
                snapshot_id=uuid.uuid4().hex,
                parent_id=(
                    self._load_manifest(name, current).snapshot_id
                    if current
                    else None
                ),
                ts=time.time(),
                operation=operation,
                data_dirs=data_dirs,
                schema_json=schema_json,
                row_count=row_count,
                evolved=evolved,
            )
            manifest = os.path.join(meta, _manifest_name(version))
            tmp = manifest + ".tmp"
            with open(tmp, "w") as f:
                json.dump(snap.__dict__, f)
            os.rename(tmp, manifest)
            head_tmp = self._head_path(name) + ".tmp"
            with open(head_tmp, "w") as f:
                f.write(_manifest_name(version))
            os.rename(head_tmp, self._head_path(name))  # THE commit point
            return snap
        finally:
            os.close(fd)
            # inode-verified release: if a breaker stole this lock while we
            # held it (we ran past STALE_LOCK_SEC), the path now holds the
            # breaker's lock — removing it by bare path would cascade the
            # theft to a third writer.  Only remove what is still OURS.
            try:
                if os.stat(lock).st_ino == my_ino:
                    os.remove(lock)
            except OSError:
                pass  # already broken/removed — nothing of ours to release

    def _write_data_dir(self, df: DataFrame, name: str) -> tuple[str, int]:
        """Materialize df into a fresh immutable data directory.  Counted
        via a post-write parquet scan (metadata-only) so the commit summary
        never forces a second computation of df."""
        token = uuid.uuid4().hex
        path = os.path.join(self._data_root(name), token)
        df.write.mode("error").parquet(path)
        n = self.spark.read.parquet(path).count()
        return path, n

    # ---- TableIO surface, snapshot-backed -----------------------------------

    def read(
        self,
        name: str,
        version: Optional[int] = None,
        as_of_ts: Optional[float] = None,
    ) -> DataFrame:
        if self.use_iceberg:
            if version is not None or as_of_ts is not None:
                # silently returning HEAD would shear a job that pinned a
                # snapshot for multi-stage consistency — fail loudly until
                # Iceberg time-travel routing is implemented
                raise NotImplementedError(
                    "snapshot-pinned reads are not routed to the Iceberg "
                    "runtime (VERSION AS OF); drop the pin or use the "
                    "manifest-backed format"
                )
            return super().read(name)
        snap = self.snapshot(name, version=version, as_of_ts=as_of_ts)
        reader = self.spark.read
        if snap.evolved:
            # heterogeneous file schemas in this snapshot (schema evolution):
            # merge parquet footers so pre-evolution rows surface the added
            # columns as null.  Non-evolved tables skip the footer pass.
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*snap.data_dirs)

    def write(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        bucket_by: Optional[str] = None,
        n_buckets: int = 64,
    ) -> None:
        if self.use_iceberg:
            super().write(df, name, mode=mode, bucket_by=bucket_by, n_buckets=n_buckets)
            return
        if bucket_by is not None:
            from pyspark.sql import functions as F

            df = df.withColumn(
                "_bucket", F.pmod(F.xxhash64(bucket_by), F.lit(n_buckets))
            ).repartition(n_buckets, "_bucket")
        # honor Spark save-mode semantics — treating everything but append
        # as replace silently destroyed tables under mode='error'/'ignore'
        if mode in ("error", "errorifexists") and self.table_exists(name):
            raise ValueError(f"table {name} already exists (mode={mode})")
        if mode == "ignore" and self.table_exists(name):
            return
        if mode == "append" and self.table_exists(name):
            self.append(df, name)
        else:
            self.replace(df, name)

    def replace(self, df: DataFrame, name: str) -> None:
        """Full-snapshot replace (Iceberg ``createOrReplace``): one new data
        dir, manifest references only it.  Old snapshots stay readable until
        expired — unlike the base class's rename swap, a concurrent reader
        pinned to the prior version is never invalidated."""
        if self.use_iceberg:
            super().replace(df, name)
            return
        # the data dir is token-independent: write it ONCE and retry only
        # the metadata commit — re-materializing df per conflict round
        # wrote an orphan dir per iteration
        path, n = self._write_data_dir(df, name)
        while True:
            expected = (
                self.current_version(name) if self.table_exists(name) else None
            )
            try:
                self._commit(name, [path], "replace", df.schema.json(), n, expected)
                return
            except CommitConflict:
                continue  # replace is last-wins; recompute token and retry

    def append(
        self, df: DataFrame, name: str, allow_evolution: bool = False
    ) -> None:
        """Metadata-only append: parent's data dirs + one new dir.  History
        never rewrites, so appending a micro-batch to a 100 TB table costs
        the micro-batch.  Column NAMES must match the table schema (order
        free — parquet is name-resolved at read) — unless
        ``allow_evolution=True``, which is ADD-COLUMN schema evolution: the
        batch must carry every existing column plus the new ones; the table
        schema widens, prior rows read the new columns as null (no rewrite
        of history — the Iceberg evolution model), and the snapshot is
        marked so readers merge footers.  Dropping/renaming columns is
        refused either way: those rewrite meaning, not just shape."""
        # the data dir is token-independent (batch rows only): written ONCE,
        # after the first round's validation, then conflict retries are
        # metadata-only — re-materializing df per round wrote an orphan dir
        # per iteration
        path = None
        while True:
            expected = self.current_version(name)
            parent = self._load_manifest(name, expected)
            schema_json = parent.schema_json
            evolved = parent.evolved
            if allow_evolution:
                old_names = {
                    f["name"] for f in json.loads(parent.schema_json)["fields"]
                }
                missing = old_names - set(df.columns)
                if missing:
                    raise ValueError(
                        f"schema evolution is add-column only; batch lacks "
                        f"existing columns {sorted(missing)}"
                    )
                if set(df.columns) - old_names:
                    schema_json = df.schema.json()
                    evolved = True
            else:
                _check_schema_names(parent.schema_json, df)
            if path is None:
                path, n = self._write_data_dir(df, name)
            try:
                self._commit(
                    name,
                    parent.data_dirs + [path],
                    "append",
                    schema_json,
                    parent.row_count + n,
                    expected,
                    evolved=evolved,
                )
                return
            except CommitConflict:
                continue  # appends commute; re-parent and retry

    def upsert(
        self, updates: DataFrame, name: str, keys: List[str], version_col: str
    ) -> None:
        """MERGE INTO with snapshot isolation: the merge is computed against
        a PINNED snapshot and committed with that version as the expected
        token — if another writer lands in between, the merge result would
        silently drop their rows, so the commit conflicts and the merge
        recomputes against the new head (bounded retries).  This is the
        semantics Iceberg gives MERGE INTO; the base class's read-merge-swap
        has a lost-update window instead."""
        if self.use_iceberg:
            super().upsert(updates, name, keys, version_col)
            return
        for _ in range(self.MERGE_RETRIES):
            expected = self.current_version(name)
            merged = upsert_by_key(
                self.read(name, version=expected), updates, keys, version_col
            )
            path, n = self._write_data_dir(merged, name)
            try:
                self._commit(name, [path], "merge", merged.schema.json(), n, expected)
                return
            except CommitConflict:
                continue
        raise CommitConflict(
            f"{name}: merge lost the commit race {self.MERGE_RETRIES} times"
        )

    def compact(self, name: str, target_files: int = 32) -> int:
        """Rewrite the current snapshot into one coalesced data dir (content
        unchanged) — counters append-path file growth.  Returns the data-dir
        count before compaction.  Conflicts like any other commit."""
        if self.use_iceberg:
            return super().compact(name, target_files)
        expected = self.current_version(name)
        before = len(self.snapshot(name, version=expected).data_dirs)
        df = self.read(name, version=expected).coalesce(target_files)
        path, n = self._write_data_dir(df, name)
        self._commit(name, [path], "compact", df.schema.json(), n, expected)
        return before

    def read_incremental(
        self, name: str, from_version: int, to_version: Optional[int] = None
    ) -> DataFrame:
        """Rows added by append commits in ``(from_version, to_version]`` —
        Iceberg's incremental append scan.  This is how a downstream
        consumer (an incremental canonicalization merge, an index append)
        processes ONLY the delta between the snapshot it last saw and now,
        instead of re-reading a 100 TB table: appends are metadata-only, so
        the delta is exactly the data dirs the manifests added.

        Raises if the range contains a non-append commit (replace/merge
        rewrites rows — there is no append-only delta to hand out; a
        changelog/CDC view would need row-level diffing, which the format
        deliberately does not pay for).  ``from_version == to_version``
        returns an empty frame with the table schema."""
        if to_version is None:
            to_version = self.current_version(name)
        new_dirs: List[str] = []
        for v in range(from_version + 1, to_version + 1):
            snap = self._load_manifest(name, v)
            if snap.operation != "append":
                raise ValueError(
                    f"{name} v{v} is '{snap.operation}', not append — "
                    "incremental scan is append-only; re-read the snapshot"
                )
            parent = self._load_manifest(name, v - 1)
            new_dirs.extend(d for d in snap.data_dirs if d not in set(parent.data_dirs))
        if not new_dirs:
            from pyspark.sql.types import StructType

            schema = self.snapshot(name, version=to_version).schema_json
            return self.spark.createDataFrame(
                [], StructType.fromJson(json.loads(schema))
            )
        reader = self.spark.read
        if self.snapshot(name, version=to_version).evolved:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*new_dirs)

    # ---- history management --------------------------------------------------

    def rollback_to(self, name: str, version: int) -> Snapshot:
        """Re-expose an old snapshot's files as a NEW head version (append-
        only history, as Iceberg does) — the bad commits remain inspectable
        until expired."""
        target = self._load_manifest(name, version)
        expected = self.current_version(name)
        return self._commit(
            name,
            target.data_dirs,
            f"rollback(v{version})",
            target.schema_json,
            target.row_count,
            expected,
            evolved=target.evolved,
        )

    def expire_snapshots(
        self, name: str, keep_last: int = 2, orphan_grace_sec: float = None
    ) -> int:
        """Drop manifests older than the newest ``keep_last`` and delete
        data directories no retained snapshot references — including orphans
        from crashed commits (data written, HEAD never moved).  Returns the
        number of data directories deleted.  Time travel reaches only
        retained snapshots afterwards.

        Dirs referenced by a DROPPED manifest were committed and are dead
        the moment their last manifest goes — deleted immediately.  A dir
        in NO manifest is indistinguishable from a CONCURRENT writer's
        in-flight data (written, commit not yet landed), so those are
        deleted only when older than ``orphan_grace_sec`` (default
        ``ORPHAN_GRACE_SEC``) — the Iceberg remove-orphan-files
        discipline; deleting them immediately would let the writer commit
        a manifest pointing at a path this call just removed."""
        import shutil

        if orphan_grace_sec is None:
            orphan_grace_sec = self.ORPHAN_GRACE_SEC
        snaps = self.history(name)
        keep = snaps[-keep_last:] if keep_last > 0 else []
        keep_versions = {s.version for s in keep}
        live = {d for s in keep for d in s.data_dirs}
        # committed-then-expired: safe to drop with their manifests
        dead = {
            d
            for s in snaps
            if s.version not in keep_versions
            for d in s.data_dirs
        } - live
        for s in snaps:
            if s.version not in keep_versions:
                os.remove(os.path.join(self._meta_dir(name), _manifest_name(s.version)))
        removed = 0
        now = time.time()
        root = self._data_root(name)
        if os.path.isdir(root):
            for token in os.listdir(root):
                path = os.path.join(root, token)
                if path in live:
                    continue
                if path not in dead:  # true orphan: maybe in flight
                    try:
                        age = now - os.stat(path).st_mtime
                    except OSError:
                        continue  # another expirer removed it first
                    if age < orphan_grace_sec:
                        continue  # leave for a later pass
                shutil.rmtree(path)
                removed += 1
        return removed


def _check_schema_names(schema_json: str, df: DataFrame) -> None:
    expected = {f["name"] for f in json.loads(schema_json)["fields"]}
    got = set(df.columns)
    if got != expected:
        raise ValueError(
            f"append schema mismatch: table has {sorted(expected)}, "
            f"batch has {sorted(got)}"
        )
