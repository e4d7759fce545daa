"""Entity label state — the reference's labels service re-expressed as a
hash-partitioned incremental MERGE table.

Conflict rules (worker/lib/osprey_shared/labels.py:28-95,
worker/lib/storage/labels.py):

- statuses: REMOVED=0, ADDED=1, MANUALLY_REMOVED=2, MANUALLY_ADDED=3
- within one update, the higher status value wins
  (MutationDropReason.CONFLICTING_MUTATION)
- an existing *manual* status cannot be overridden by an automatic
  mutation (CANNOT_OVERRIDE_MANUAL)
- expiry: a label whose ``expires_ts`` has passed is absent
- empty label names / entity ids are invalid mutations
- ``delay_action_by`` (stdlib/udfs/labels.py:46-47) is recorded as
  ``apply_at = event_ts + delay`` — the reference carries it on the
  effect for external consumers (legacy webhook delay); the engine
  itself applies the state change immediately, as the reference's
  LabelOutputSink does.

Storage: ``HashPartitionedStateStore`` in merge-on-read mode — a batch
APPENDS only its per-key mutation winners as delta files (O(|delta|)
writes, no read of current state), and readers resolve base+deltas with
:func:`label_resolver`. The round-2/3 copy-on-write path rewrote every
dirty bucket's full resident set; with a dense delta (every bucket
dirty) that is an O(|state|) rewrite per batch — the round-3 full-stack
run measured the flagged-set rewrite growing 15.5k→47.9k rows/batch.
MOR keeps the per-batch write at the delta size with lazy per-bucket
compaction bounding read amplification. Readers see state *as of the
previous batch* — within one micro-batch, HasLabel joins never observe
same-batch writes, matching the reference's ordering (effects apply
after execution, output_sink.py:186-211).

Cross-batch resolution (:func:`label_resolver`) reproduces the
sequential fold of the reference's conflict rules exactly: an automatic
mutation cannot override a standing manual status, so after the LAST
manual mutation every later automatic mutation is dropped and state
stays manual. Hence the fold's fixpoint is *the latest manual mutation
if any exists, else the latest mutation* — an associative ``max_by``
over (is_manual, write-generation), safe for any compaction prefix.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osprey_spark.streaming.state_store import GEN_COL, HashPartitionedStateStore

STATE_SCHEMA = (
    "entity_type string, entity_id string, label_name string, "
    "status int, created_at timestamp, expires_ts timestamp, apply_at timestamp"
)

MUTATION_COLS = ["entity_type", "entity_id", "label_name", "status", "event_ts", "expires_ts"]

KEY = ["entity_type", "entity_id", "label_name"]

# under this snapshot size the HasLabel join side is force-broadcast;
# above it the hint is omitted and AQE picks broadcast vs shuffle from
# runtime sizes (a hot label over millions of entities must not be
# forced through the driver)
BROADCAST_BYTES = 32 * 1024 * 1024


def label_resolver(df: DataFrame) -> DataFrame:
    """Collapse MOR delta rows per (entity_type, entity_id, label_name) to
    the sequential-merge fixpoint: latest MANUAL mutation if one exists,
    else latest mutation. Proof sketch (worker/lib/osprey_shared/labels.py
    conflict rules): manual mutations always apply; once state is manual,
    automatic mutations are dropped (CANNOT_OVERRIDE_MANUAL) and state
    stays manual — so the fold result is exactly
    ``max_by(row, (is_manual, write_generation))``. Associative, so lazy
    compaction of any file prefix resolves identically against later
    deltas. One hash aggregation with map-side partial combine."""
    payload = F.struct(
        F.col("status"), F.col("created_at"), F.col("expires_ts"), F.col("apply_at")
    )
    order = F.struct(
        F.col("status").isin(2, 3).cast("int").alias("is_manual"),
        F.col(GEN_COL).alias("gen"),
    )
    return (
        df.groupBy(*KEY)
        .agg(F.max_by(payload, order).alias("_r"))
        .select(*KEY, "_r.*")
    )


class LabelStateStore:
    def __init__(
        self,
        path: str,
        num_partitions: int = 64,
        max_delta_files: int = 8,
        snapshot_cache: bool = False,
    ):
        self.store = HashPartitionedStateStore(
            path,
            key_cols=KEY,
            schema=STATE_SCHEMA,
            num_partitions=num_partitions,
            max_delta_files=max_delta_files,
            resolve_fn=label_resolver,
            snapshot_cache=snapshot_cache,
        )
        self.path = path

    def current_version(self) -> int:
        return self.store.current_version()

    @property
    def last_merge_stats(self) -> dict:
        return self.store.last_merge_stats

    def approx_size_bytes(self) -> int:
        return self.store.approx_size_bytes()

    def broadcastable(self) -> bool:
        return self.approx_size_bytes() < BROADCAST_BYTES

    def read(self, spark: SparkSession, before_batch: Optional[int] = None) -> DataFrame:
        return self.store.read(spark, before_batch=before_batch)

    def apply_mutations(self, mutations: DataFrame, batch_id: Optional[int] = None) -> int:
        """MERGE a batch of mutation rows into the state table.

        Exactly-once per ``batch_id``: a replayed batch whose state delta
        already landed (crash between state apply and sink commit) is a
        no-op, and pipeline reads use ``before_batch`` to see pre-batch
        state on replay."""
        if "apply_at" not in mutations.columns:
            mutations = mutations.withColumn("apply_at", F.col("event_ts"))
        valid = mutations.filter((F.col("entity_id") != "") & (F.col("label_name") != ""))
        # in-batch conflict resolution: higher status wins, then later
        # event (reference MutationDropReason.CONFLICTING_MUTATION) —
        # max_by over a lexicographic struct key: a hash aggregation with
        # map-side partial combine, where a row_number window would sort
        # every mutation inside each shuffle partition
        win = F.max_by(
            F.struct(
                F.col("status").cast("int").alias("status"),
                F.col("event_ts").alias("created_at"),
                F.col("expires_ts").alias("expires_ts"),
                F.col("apply_at").alias("apply_at"),
            ),
            F.struct(F.col("status"), F.col("event_ts")),
        ).alias("_w")
        winners = valid.groupBy(*KEY).agg(win).select(*KEY, "_w.*")
        # merge-on-read append: O(|delta|) writes; cross-batch conflict
        # resolution (manual-cannot-be-overridden) lives in label_resolver
        return self.store.merge_append(winners, batch_id=batch_id)

    def active_labels(self, spark: SparkSession, as_of=None) -> DataFrame:
        """Labels currently in effect: effective status is ADDED-ish and
        not expired (labels.py: all reasons expired ⇒ absent)."""
        state = self.read(spark)
        as_of_col = F.lit(as_of).cast("timestamp") if as_of is not None else F.current_timestamp()
        return state.filter(
            F.col("status").isin(1, 3)
            & (F.col("expires_ts").isNull() | (F.col("expires_ts") > as_of_col))
        )

    def has_label_join(
        self,
        df: DataFrame,
        entity_type: str,
        entity_id_col: str,
        label: str,
        out_col: str = "has_label",
        as_of=None,
    ) -> DataFrame:
        """HasLabel (stdlib/udfs/labels.py:159-311) as a join against the
        (per-label) active-label set. Broadcast is forced only while the
        snapshot is verifiably small; past that the hint is dropped and
        AQE decides (a hot label over millions of entities would blow the
        driver's broadcast limit)."""
        active = (
            self.active_labels(df.sparkSession, as_of=as_of)
            .filter((F.col("entity_type") == entity_type) & (F.col("label_name") == label))
            .select(F.col("entity_id").alias("_lbl_eid"), F.lit(True).alias(out_col))
        )
        if self.broadcastable():
            active = F.broadcast(active)
        joined = df.join(
            active,
            on=[F.col(entity_id_col).cast("string") == F.col("_lbl_eid")],
            how="left",
        )
        return joined.drop("_lbl_eid").withColumn(out_col, F.coalesce(F.col(out_col), F.lit(False)))
