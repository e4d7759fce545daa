"""Entity label state — the reference's labels service re-expressed as a
versioned state table with MERGE semantics.

Conflict rules (worker/lib/osprey_shared/labels.py:28-95,
worker/lib/storage/labels.py):

- statuses: REMOVED=0, ADDED=1, MANUALLY_REMOVED=2, MANUALLY_ADDED=3
- within one update, the higher status value wins
  (MutationDropReason.CONFLICTING_MUTATION)
- an existing *manual* status cannot be overridden by an automatic
  mutation (CANNOT_OVERRIDE_MANUAL)
- expiry: a label whose ``expires_ts`` has passed is absent
- empty label names / entity ids are invalid mutations

Storage: versioned parquet snapshots + an atomically-renamed pointer
file (the plain-parquet stand-in for an Iceberg MERGE target). Readers
``read()`` the pinned version — within one micro-batch, HasLabel joins
see state *as of the previous batch*, matching the reference's ordering
(effects apply after execution, output_sink.py:186-211).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

STATE_SCHEMA = (
    "entity_type string, entity_id string, label_name string, "
    "status int, created_at timestamp, expires_ts timestamp"
)

MUTATION_COLS = ["entity_type", "entity_id", "label_name", "status", "event_ts", "expires_ts"]


class LabelStateStore:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _version_file(self) -> str:
        return os.path.join(self.path, "_VERSION")

    def current_version(self) -> int:
        try:
            with open(self._version_file()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -1

    def read(self, spark: SparkSession) -> DataFrame:
        v = self.current_version()
        if v < 0:
            return spark.createDataFrame([], STATE_SCHEMA)
        return spark.read.parquet(os.path.join(self.path, f"v{v}"))

    def apply_mutations(self, mutations: DataFrame, batch_id: Optional[int] = None) -> int:
        """MERGE a batch of mutation rows into the state table.

        Idempotent per version: re-applying after a crash overwrites the
        same next-version directory before the pointer moves."""
        spark = mutations.sparkSession
        current = self.read(spark)

        valid = mutations.filter(
            (F.col("entity_id") != "") & (F.col("label_name") != "")
        )
        # in-batch conflict resolution: higher status wins, then later event
        w = Window.partitionBy("entity_type", "entity_id", "label_name").orderBy(
            F.desc("status"), F.desc("event_ts")
        )
        winners = (
            valid.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "entity_type",
                "entity_id",
                "label_name",
                F.col("status").cast("int").alias("new_status"),
                F.col("event_ts").alias("new_created_at"),
                F.col("expires_ts").alias("new_expires_ts"),
            )
        )
        key = ["entity_type", "entity_id", "label_name"]
        merged = current.join(winners, on=key, how="full_outer")
        manual_block = F.col("status").isin(2, 3) & (F.col("new_status") < 2)
        take_new = F.col("new_status").isNotNull() & ~F.coalesce(manual_block, F.lit(False))
        next_state = merged.select(
            *key,
            F.when(take_new, F.col("new_status")).otherwise(F.col("status")).alias("status"),
            F.when(take_new, F.col("new_created_at")).otherwise(F.col("created_at")).alias("created_at"),
            F.when(take_new, F.col("new_expires_ts")).otherwise(F.col("expires_ts")).alias("expires_ts"),
        )

        v = self.current_version() + 1
        target = os.path.join(self.path, f"v{v}")
        next_state.write.mode("overwrite").parquet(target)
        tmp = self._version_file() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.rename(tmp, self._version_file())
        return v

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
        """HasLabel (stdlib/udfs/labels.py:159-311) as a broadcast join
        against the (small, per-label) active-label set."""
        active = (
            self.active_labels(df.sparkSession, as_of=as_of)
            .filter((F.col("entity_type") == entity_type) & (F.col("label_name") == label))
            .select(F.col("entity_id").alias("_lbl_eid"), F.lit(True).alias(out_col))
        )
        joined = df.join(
            F.broadcast(active),
            on=[F.col(entity_id_col).cast("string") == F.col("_lbl_eid")],
            how="left",
        )
        return joined.drop("_lbl_eid").withColumn(out_col, F.coalesce(F.col(out_col), F.lit(False)))
