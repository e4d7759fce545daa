"""Action-stream adapters: the reference's Kafka wire format → typed rows.

Wire format (docs/integration/data-flow.md:37-47, example_data/template.json):
``{"send_time": <ts>, "data": "{\"action_id\":…, \"action_name\":…, \"data\": {…}}"}``
— the inner ``data`` is a JSON *string* holding the action envelope whose
own ``data`` field is the arbitrary payload rules extract from.

``parse_action_stream`` decodes that envelope with native ``from_json``
(payload kept as a raw JSON string column → ``JsonData`` extraction via
``get_json_object``, Catalyst-side). Works identically on a batch
DataFrame, a file stream, or ``readStream.format("kafka")``'s ``value``
column when the kafka package is on the classpath (not in this image —
the format is what matters; the transport is a one-line swap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("send_time", T.StringType()),
        T.StructField("data", T.StringType()),  # inner JSON string
    ]
)

ACTION_SCHEMA = T.StructType(
    [
        T.StructField("action_id", T.LongType()),
        T.StructField("action_name", T.StringType()),
        T.StructField("data", T.StringType()),  # payload stays raw JSON
    ]
)


def parse_action_stream(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """raw[value_col]: the wire JSON string (kafka ``value`` / file line) →
    columns (action_id long, action_name string, ts timestamp, data string).

    Missing action_id falls back to a monotonic id (the worker generates a
    snowflake when absent, rules_sink.py:153-154 — the id only needs
    uniqueness)."""
    env = F.from_json(F.col(value_col).cast("string"), ENVELOPE_SCHEMA)
    # inner `data` is itself a JSON string containing the action; the
    # action's own `data` payload is kept as a raw JSON string column
    action = F.from_json(env["data"], ACTION_SCHEMA)
    return raw.select(
        F.coalesce(action["action_id"], F.monotonically_increasing_id()).alias("action_id"),
        action["action_name"].alias("action_name"),
        F.to_timestamp(env["send_time"]).alias("ts"),
        action["data"].alias("data"),
    )


def read_action_jsonl(spark, path: str) -> DataFrame:
    """Batch read of wire-format JSON lines (the file stand-in for the
    Kafka topic)."""
    raw = spark.read.text(path)
    return parse_action_stream(raw, value_col="value")


def stream_action_jsonl(spark, path: str) -> DataFrame:
    raw = spark.readStream.format("text").load(path)
    return parse_action_stream(raw, value_col="value")


def kafka_action_stream(spark, bootstrap_servers: str, topic: str = "osprey.actions_input"):
    """The production transport (KafkaInputStream analog). Requires the
    spark-sql-kafka package on the classpath; raises a clear error here."""
    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .load()
        )
    except Exception as e:  # pragma: no cover — no kafka jar in this image
        raise RuntimeError(
            "kafka source requires the spark-sql-kafka package on the classpath"
        ) from e
    return parse_action_stream(raw, value_col="value")
