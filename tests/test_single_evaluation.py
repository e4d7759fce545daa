"""Deterministic proof that the streaming batch body evaluates the
compiled plan exactly once per row (round 1 evaluated it 2-3x: a lineage
groupBy, the sink write, a mutations probe, and a late-metrics agg each
re-ran the whole plan). A Spark accumulator inside a pandas UDF in the
plan counts per-row evaluations — wall-clock noise cannot fake this."""

import datetime

import pandas as pd
from pyspark.sql import functions as F

RULES = {
    "main.sml": """
ConvId: Entity[str] = EntityJson(type='Conversation', path='$.conv_id')
Text: str = JsonData(path='$.text')
Hello = Rule(when_all=[TextContains(text=Text, phrase='hello')], description='d')
WhenRules(rules_any=[Hello], then=[
  DeclareVerdict(verdict='flag'), LabelAdd(entity=ConvId, label='flagged')])
"""
}


def test_plan_evaluates_once_per_row(spark, tmp_path):
    from osprey_spark.streaming.pipeline import RuleStreamPipeline

    acc = spark.sparkContext.accumulator(0)

    @F.pandas_udf("string")
    def counting_identity(s: pd.Series) -> pd.Series:
        acc.add(len(s))
        return s

    # inject the counter via post_plan: it wraps a column of the final
    # frame, so every evaluation pass over the output counts every row
    def post_plan(batch_df, out):
        return out.withColumn("counted", counting_identity(F.col("Text")))

    t0 = datetime.datetime(2024, 1, 1)
    rows = [(f"c{i}", 0, "user", "hello there" if i % 3 == 0 else "x", "", t0)
            for i in range(500)]
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    input_dir = str(tmp_path / "in")
    spark.createDataFrame(rows, schema).write.parquet(input_dir)

    pipe = RuleStreamPipeline(spark, RULES, str(tmp_path / "p"), post_plan=post_plan)
    pipe.run_until_idle(input_dir)
    assert pipe.results().count() == 500
    # labels were mutated and metrics recorded — yet each row was
    # evaluated exactly once (cache materialization pass)
    assert pipe.labels.read(spark).count() > 0
    assert acc.value == 500
