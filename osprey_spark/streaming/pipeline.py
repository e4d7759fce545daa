"""Structured-Streaming rule pipeline.

The streaming analogue of the reference's worker loop
(worker/sinks/sink/rules_sink.py → executor → MultiOutputSink): a
micro-batch stream of transcript turns is evaluated against the compiled
rule plan; results land in the exactly-once sink; label mutations MERGE
into the label state store; per-batch metrics are recorded.

Within a batch, HasLabel-style joins read label state **as of the
previous batch** — the reference applies label effects after execution
(output_sink.py:186-211), so reads never see same-event writes.

Resume: Spark's ``checkpointLocation`` tracks the source offsets; batch
replay after a crash hits the sink's committed-batch guard → no
duplicates (exactly-once end to end).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osprey_spark.sml.compiler import CompiledRuleset, RulesetCompiler
from osprey_spark.streaming.label_state import LabelStateStore
from osprey_spark.streaming.sink import IdempotentParquetSink

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


class RuleStreamPipeline:
    def __init__(
        self,
        spark: SparkSession,
        sources: dict[str, str],
        workdir: str,
        action_name_col: str = "role",
        timestamp_col: str = "ts",
        input_schema: Optional[str] = None,
        watermark: str = "10 minutes",
        passthrough: Optional[list[str]] = None,
        post_plan: Optional[Callable[[DataFrame, DataFrame], DataFrame]] = None,
    ):
        self.spark = spark
        self.workdir = workdir
        self.watermark = watermark
        self.passthrough = passthrough or ["conv_id", "turn_idx"]
        self.post_plan = post_plan
        self.sink = IdempotentParquetSink(os.path.join(workdir, "results"))
        self.labels = LabelStateStore(os.path.join(workdir, "labels"))
        self.checkpoint = os.path.join(workdir, "checkpoint")
        schema_str = input_schema or TRANSCRIPT_SCHEMA
        from pyspark.sql.types import _parse_datatype_string

        self.schema = _parse_datatype_string(schema_str)
        self.plan: CompiledRuleset = RulesetCompiler(
            sources,
            input_schema=self.schema,
            action_name_col=action_name_col,
            timestamp_col=timestamp_col,
        ).compile()
        self.timestamp_col = timestamp_col

    # -- batch body ----------------------------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.sink.is_committed(batch_id):
            return  # replayed batch → exactly-once skip
        out = self.plan.apply(batch_df, passthrough=self.passthrough)
        if self.post_plan is not None:
            out = self.post_plan(batch_df, out)
        self.sink.write_batch(out, batch_id)
        mutations = self.plan.label_mutation_rows(batch_df)
        if mutations.limit(1).count() > 0:
            self.labels.apply_mutations(mutations, batch_id=batch_id)

    # -- stream wiring -------------------------------------------------------

    def start_from_parquet_dir(self, input_dir: str, trigger_once: bool = True):
        stream = (
            self.spark.readStream.schema(self.schema)
            .option("maxFilesPerTrigger", "4")
            .parquet(input_dir)
            .withWatermark(self.timestamp_col, self.watermark)
        )
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint)
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_until_idle(self, input_dir: str) -> None:
        q = self.start_from_parquet_dir(input_dir)
        q.awaitTermination()

    def results(self) -> Optional[DataFrame]:
        return self.sink.read(self.spark)


def windowed_velocity_stream(
    spark: SparkSession,
    input_dir: str,
    schema: str = TRANSCRIPT_SCHEMA,
    key: str = "conv_id",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
):
    """Streaming tumbling counts with watermark-driven eviction — the
    counter-service replacement in streaming form. Returns the streaming
    DataFrame (caller attaches the sink)."""
    from pyspark.sql.types import _parse_datatype_string

    stream = (
        spark.readStream.schema(_parse_datatype_string(schema))
        .parquet(input_dir)
        .withWatermark(ts_col, watermark)
    )
    return (
        stream.groupBy(F.window(ts_col, window).alias("w"), key)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            key,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
        )
    )
