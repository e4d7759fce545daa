"""Hash-partitioned, versioned, incrementally-merged state store.

The scale problem this solves: a streaming pipeline that full-outer-joins
each micro-batch's delta against its *entire* accumulated state and
rewrites the whole snapshot degrades linearly with lifetime state size —
at 10^12 turns the label/verdict state is billions of entities and a
per-batch O(|state|) rewrite is a scale-killer.

Here state is hash-partitioned into ``num_partitions`` buckets by key
(``pmod(xxhash64(keys), P)`` — the same bucketing a real cluster would
use for co-located state). A batch merge:

1. computes the delta's dirty bucket ids (≤ P, tiny driver list),
2. reads ONLY those buckets' current files,
3. merges (caller-supplied ``merge_fn``) and rewrites ONLY those buckets,
4. publishes a new manifest (bucket id → data dir) + pointer atomically.

Cost per batch is O(|delta| + |state in dirty buckets|) — flat as total
state grows, matching the reference's per-entity label service semantics
(reference worker/lib/storage/labels.py:28-95 mutates single rows).

This is the plain-parquet stand-in for an Iceberg/Delta MERGE target:
the manifest is Iceberg's snapshot manifest, the pointer file is the
catalog's atomic swap, ``before_batch`` reads are time-travel. On a real
cluster the same class works over an object store path; with Iceberg
jars present the merge body becomes a single MERGE INTO.

Exactly-once: the pointer records the last applied ``batch_id``; a
replayed merge of the same batch is a no-op, and ``read(before_batch=b)``
returns the pre-``b`` snapshot so a replayed batch re-evaluates against
exactly the state it originally saw (reads-before-writes ordering).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PART = "__state_part"


class HashPartitionedStateStore:
    def __init__(
        self,
        path: str,
        key_cols: list[str],
        schema: str,
        num_partitions: int = 64,
        max_generations: int = 16,
    ):
        self.path = path
        self.key_cols = key_cols
        self.schema = schema  # DDL string of the full state row
        self.num_partitions = num_partitions
        self.max_generations = max_generations
        self.last_merge_stats: dict = {}
        os.makedirs(path, exist_ok=True)

    # -- pointer / manifest ---------------------------------------------------

    def _pointer_file(self) -> str:
        return os.path.join(self.path, "_POINTER.json")

    def _manifest_file(self, version: int) -> str:
        return os.path.join(self.path, f"manifest_v{version}.json")

    def pointer(self) -> dict:
        try:
            with open(self._pointer_file()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"version": -1, "batch_id": None}

    def current_version(self) -> int:
        return int(self.pointer()["version"])

    def last_batch_id(self) -> Optional[int]:
        return self.pointer()["batch_id"]

    def _manifest(self, version: int) -> dict[str, str]:
        if version < 0:
            return {}
        with open(self._manifest_file(version)) as f:
            return json.load(f)

    def _publish(self, manifest: dict[str, str], batch_id: Optional[int]) -> int:
        v = self.current_version() + 1
        with open(self._manifest_file(v), "w") as f:
            json.dump(manifest, f)
        tmp = self._pointer_file() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": v, "batch_id": batch_id}, f)
        os.rename(tmp, self._pointer_file())  # atomic snapshot swap
        return v

    # -- reads ----------------------------------------------------------------

    def _empty(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame([], self.schema)

    def read(
        self, spark: SparkSession, before_batch: Optional[int] = None
    ) -> DataFrame:
        """Current snapshot; with ``before_batch=b``, the snapshot as of
        before batch ``b`` was applied (replay-consistent reads)."""
        ptr = self.pointer()
        v = int(ptr["version"])
        if before_batch is not None and ptr["batch_id"] == before_batch:
            v -= 1  # this batch already applied (crash between state and sink)
        if v < 0:
            return self._empty(spark)
        manifest = self._manifest(v)
        if not manifest:
            return self._empty(spark)
        paths = [os.path.join(self.path, rel) for rel in manifest.values()]
        return spark.read.schema(self.schema).parquet(*paths)

    def _read_buckets(self, spark: SparkSession, manifest: dict, buckets: list[int]) -> DataFrame:
        paths = [
            os.path.join(self.path, manifest[str(b)])
            for b in buckets
            if str(b) in manifest
        ]
        if not paths:
            return self._empty(spark)
        return spark.read.schema(self.schema).parquet(*paths)

    def approx_size_bytes(self) -> int:
        """Total bytes of the current snapshot's data files (manifest
        walk — no Spark job). Used for broadcast-vs-shuffle decisions."""
        total = 0
        for rel in self._manifest(self.current_version()).values():
            for fp in glob.glob(os.path.join(self.path, rel, "*.parquet")):
                total += os.path.getsize(fp)
        return total

    # -- merge ----------------------------------------------------------------

    def merge(
        self,
        delta: DataFrame,
        merge_fn: Callable[[DataFrame, DataFrame], DataFrame],
        batch_id: Optional[int] = None,
    ) -> int:
        """Merge ``delta`` into state via ``merge_fn(current_dirty, delta)``.

        ``merge_fn`` receives ONLY the dirty buckets' current rows plus the
        delta, and must return the replacement rows for those buckets'
        keys. Untouched buckets keep their existing files. Idempotent per
        ``batch_id`` (replay of an applied batch is a no-op)."""
        if batch_id is not None and self.last_batch_id() == batch_id:
            return self.current_version()  # replay → already applied
        spark = delta.sparkSession

        part_of = lambda *cols: F.pmod(  # noqa: E731
            F.xxhash64(*cols), F.lit(self.num_partitions)
        ).cast("int")

        dirty_rows = (
            delta.select(part_of(*self.key_cols).alias(_PART)).distinct().collect()
        )
        old_manifest = self._manifest(self.current_version())
        if not dirty_rows:
            # empty delta: no state change → nothing to version (replaying
            # an empty merge is naturally idempotent)
            self.last_merge_stats = {"partitions_rewritten": 0, "rows_rewritten": 0}
            return self.current_version()
        dirty = sorted(int(r[_PART]) for r in dirty_rows)

        # compaction: too many live generations → fold everything this merge
        generations = {rel.split("/", 1)[0] for rel in old_manifest.values()}
        compact = len(generations) >= self.max_generations
        if compact:
            dirty = sorted(set(dirty) | {int(b) for b in old_manifest})

        current_dirty = self._read_buckets(spark, old_manifest, dirty)
        merged = merge_fn(current_dirty, delta)

        v = self.current_version() + 1
        gen_dir = f"d{v}"
        (
            merged.withColumn(_PART, part_of(*self.key_cols))
            .repartition(min(len(dirty), 32), F.col(_PART))
            .write.partitionBy(_PART)
            .mode("overwrite")
            .parquet(os.path.join(self.path, gen_dir))
        )

        manifest = dict(old_manifest)
        rows_rewritten = 0
        written = set()
        for d in glob.glob(os.path.join(self.path, gen_dir, f"{_PART}=*")):
            b = int(d.rsplit("=", 1)[1])
            written.add(b)
            manifest[str(b)] = f"{gen_dir}/{_PART}={b}"
            rows_rewritten += _parquet_rows(d)
        for b in dirty:
            if b not in written:  # bucket emptied by the merge
                manifest.pop(str(b), None)
        self.last_merge_stats = {
            "partitions_rewritten": len(dirty),
            "rows_rewritten": rows_rewritten,
        }
        return self._publish(manifest, batch_id)


    # -- snapshot expiry --------------------------------------------------------

    def expire_snapshots(self, keep_versions: int = 4) -> int:
        """Delete data generations and manifests unreachable from the
        newest ``keep_versions`` manifests — the Iceberg
        ``expire_snapshots`` analog. Returns the number of generation
        directories removed.

        CONTRACT: ``keep_versions`` must cover the pipeline's replay
        window — a replayed batch reads ``before_batch`` snapshots, and
        expiring a version a pending replay still needs breaks resume.
        The pipeline retries at most the last un-marked batch, so any
        value ≥ 2 is safe there; callers doing deeper time-travel size it
        themselves."""
        import shutil

        current = self.current_version()
        if current < 0:
            # nothing published yet (e.g. a crash between the first
            # manifest write and its pointer publish left a stale
            # manifest_v0.json) — nothing is safely expirable
            return 0
        keep = range(max(0, current - keep_versions + 1), current + 1)
        live_gens: set[str] = set()
        for v in keep:
            try:
                for rel in self._manifest(v).values():
                    live_gens.add(rel.split("/", 1)[0])
            except FileNotFoundError:
                continue
        removed = 0
        for entry in os.listdir(self.path):
            full = os.path.join(self.path, entry)
            if entry.startswith("d") and entry[1:].isdigit() and os.path.isdir(full):
                if entry not in live_gens:
                    shutil.rmtree(full, ignore_errors=True)
                    removed += 1
            elif entry.startswith("manifest_v") and entry.endswith(".json"):
                v = int(entry[len("manifest_v") : -len(".json")])
                if v < min(keep):
                    os.remove(full)
        return removed


def _parquet_rows(directory: str) -> int:
    """Row count from parquet footers — driver-side metadata read, no job
    (the Iceberg-manifest-statistics analog)."""
    import pyarrow.parquet as pq

    total = 0
    for fp in glob.glob(os.path.join(directory, "*.parquet")):
        total += pq.ParquetFile(fp).metadata.num_rows
    return total
