"""Round-7 (optimization round) pins:

- the fused single-pass normalization regex is character-for-character
  identical to the historical two-pass form on adversarial inputs;
- exact_dedup's window-min rewrite keeps one row per fingerprint group
  (smallest id) and scans the input once;
- minhash_lsh_pairs still evaluates the shingle UDF exactly once over
  the corpus plus candidate-sized verify passes (the localCheckpoint
  restructure makes this deterministic rather than AQE-reuse-dependent);
- the codegen-friendly concat-of-conditional-arrays verdict/mutation
  columns drop fired-but-null custom effect values exactly like the old
  filter() shape;
- match_sequence's relevant-event prefilter changes nothing about the
  fold result, including under within_seconds expiry;
- Spark still stamps `spark.watermarkDelayMs` metadata on withWatermark
  output (_ensure_watermark keys on it — fail loud on API drift,
  VERDICT r6 item 6).
"""

import datetime

import pytest
from pyspark.sql import functions as F

T0 = datetime.datetime(2024, 1, 1)


# -- normalization fusion -----------------------------------------------------


def test_fused_normalize_matches_two_pass_form(spark):
    from osprey_spark.operators.textstats import normalize_for_fingerprint

    def two_pass(c):
        t = F.lower(c)
        t = F.regexp_replace(t, r"[^a-z0-9\s]", " ")
        t = F.regexp_replace(t, r"\s+", " ")
        return F.btrim(t)

    nasty = [
        "", "   ", "a.b", "a .\t. b", "CAFÉ—ok", "x\x0by", "tab\tand\nnl",
        "123!!!", "ünïcode spaces", "a'b\"c", None, "-- %% --", "a" * 500,
        ".\t\n .", "ALL CAPS 42", "mixed nbsp",
    ]
    df = spark.createDataFrame([(s,) for s in nasty], "text string")
    bad = (
        df.select(
            two_pass(F.col("text")).alias("o"),
            normalize_for_fingerprint(F.col("text")).alias("n"),
        )
        .filter(~F.col("o").eqNullSafe(F.col("n")))
        .collect()
    )
    assert bad == []


# -- exact_dedup window rewrite ----------------------------------------------


def test_exact_dedup_single_scan_and_min_keeper(spark):
    from osprey_spark.operators.dedup import exact_dedup

    rows = [
        (1, "Hello, World!"),
        (2, "hello world"),      # same fingerprint as 1 -> dropped
        (3, "something else"),
        (7, "HELLO  world!!"),   # same fingerprint as 1 -> dropped
        (4, "something ELSE."),  # same fingerprint as 3 -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = exact_dedup(df)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]
    assert out.columns == ["doc_id", "text"]  # original columns survive
    # single scan: the physical plan references the input relation once
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") <= 1

    kept_max = exact_dedup(df, keep="max")
    assert sorted(r["doc_id"] for r in kept_max.collect()) == [4, 7]


# -- custom effect null-drop parity ------------------------------------------


def test_custom_effect_null_value_dropped(spark):
    """A fired effect whose value expression is null must be dropped from
    the __<effect> array (the old filter(isNotNull) semantics), not kept
    as a null element by the concat rewrite. BanUser's concat_ws value is
    never null, so drive the internal-columns path directly with a
    synthetic CustomEffectEntry."""
    from osprey_spark.sml.compiler import CompiledRuleset, CustomEffectEntry

    plan = CompiledRuleset(
        features=[], verdicts=[], labels=[],
        custom_effects=[
            CustomEffectEntry(
                cond=F.col("fired"), feature_name="eff", value_col=F.col("val")
            )
        ],
        error_indicators=[], rules={}, action_id_col=None, timestamp_col="ts",
        label_lookups=[], feature_entity_types={},
    )
    eff_col = next(
        c for c in plan.internal_columns()
        if "__eff" in c._jc.toString()
    )
    df = spark.createDataFrame(
        [(1, True, None), (2, True, "u2"), (3, False, "u3"), (4, None, "u4")],
        "event_id long, fired boolean, val string",
    ).withColumn("ts", F.lit(T0))
    out = df.select("event_id", eff_col).orderBy("event_id").collect()
    vals = [r["__eff"] for r in out]
    assert vals == [[], ["u2"], [], []]


# -- match_sequence relevant-event prefilter ---------------------------------


def test_match_sequence_prefilter_ignores_irrelevant_rows(spark):
    from osprey_spark.operators.sessions import match_sequence

    def ts(s):
        return T0 + datetime.timedelta(seconds=s)

    rows = [
        # u1: a ... b with junk between -> matched
        ("u1", 1, "a", ts(0)), ("u1", 2, "x", ts(10)), ("u1", 3, "b", ts(20)),
        # u2: only junk -> present in output, unmatched
        ("u2", 1, "x", ts(0)), ("u2", 2, "y", ts(5)),
        # u3: b before a -> unmatched
        ("u3", 1, "b", ts(0)), ("u3", 2, "a", ts(5)),
    ]
    df = spark.createDataFrame(rows, "u string, i int, e string, ts timestamp")
    steps = [F.col("e") == "a", F.col("e") == "b"]
    out = {
        r["u"]: r["matched"]
        for r in match_sequence(df, steps, key="u", order_col="i").collect()
    }
    assert out == {"u1": True, "u2": False, "u3": False}

    # within_seconds: junk rows between a and b must not affect expiry
    rows2 = [
        ("w1", 1, "a", ts(0)), ("w1", 2, "x", ts(500)), ("w1", 3, "b", ts(30)),
        # w2: a then b 100s later with junk at 40s; bound 50 -> expired
        ("w2", 1, "a", ts(0)), ("w2", 2, "x", ts(40)), ("w2", 3, "b", ts(100)),
    ]
    df2 = spark.createDataFrame(rows2, "u string, i int, e string, ts timestamp")
    out2 = {
        r["u"]: r["matched"]
        for r in match_sequence(
            df2, steps, key="u", order_col="i", ts_col="ts", within_seconds=50
        ).collect()
    }
    assert out2 == {"w1": True, "w2": False}


# -- watermark metadata probe (VERDICT r6 item 6) ----------------------------


def test_spark_stamps_watermark_delay_metadata(spark):
    """_ensure_watermark keys on the `spark.watermarkDelayMs` metadata
    entry that withWatermark stamps on its event-time column. If a Spark
    upgrade stops stamping it, the guard would silently re-apply (or
    double-apply) watermarks — fail loudly here instead."""
    df = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .withWatermark("timestamp", "10 minutes")
    )
    md = df.schema["timestamp"].metadata or {}
    assert "spark.watermarkDelayMs" in md, (
        f"withWatermark no longer stamps spark.watermarkDelayMs (got {md}) — "
        "update osprey_spark.streaming.stream_join._ensure_watermark"
    )
    assert md["spark.watermarkDelayMs"] == 600_000


def test_interval_seconds_rejects_compound_specs():
    from osprey_spark.streaming.stream_join import _interval_seconds

    assert _interval_seconds("5 minutes") == 300
    assert _interval_seconds("1 hour") == 3600
    for bad in ("1 hour 30 minutes", "5min", "five minutes", ""):
        with pytest.raises(ValueError, match="bucket spec"):
            _interval_seconds(bad)
