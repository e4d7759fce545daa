"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
(rule evaluation, analytics query surface, velocity windows,
sessionization, CEP, dedup, text analytics, similarity search); the
matching ``oracle_sql()`` reproduces the exact semantics in DuckDB SQL.
Entries without an oracle are non-SQL-expressible (hash-based LSH,
approximate HLL) and get the driver's rows-only check.
"""

from __future__ import annotations

import datetime
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

START = datetime.datetime(2024, 1, 1)
END = datetime.datetime(2024, 3, 1)


def _spread(df: DataFrame) -> DataFrame:
    """The sf0.x test tables are single small parquet files → one input
    partition, so narrow plans would run on one core. At real scale the
    128 MB maxPartitionBytes split does this automatically; here we
    repartition reads up to the session's parallelism to match."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark.read.parquet(f"{sf_dir}/events.parquet"))


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


# --------------------------------------------------------------------------
# flagship: SML ruleset compiled to a vectorized plan over the events table
# --------------------------------------------------------------------------

RULESET = {
    "main.sml": """
UserId: Entity[str] = EntityJson(type='User', path='$.user_id')
EventType: str = JsonData(path='$.event_type')
Value: float = JsonData(path='$.value')
PropK: int = JsonData(path='$.k')

BigPurchase = Rule(
  when_all=[EventType == 'purchase', Value > 100.0],
  description='high-value purchase',
)
HighK = Rule(
  when_all=[PropK >= 90],
  description='k at or above 90',
)
ErrorEvent = Rule(
  when_all=[EventType == 'error'],
  description='error event',
)

WhenRules(
  rules_any=[BigPurchase, HighK],
  then=[DeclareVerdict(verdict='review'), LabelAdd(entity=UserId, label='flagged')],
)
WhenRules(
  rules_any=[ErrorEvent],
  then=[LabelAdd(entity=UserId, label='errored', apply_if=HighK)],
)
""",
}


def _rule_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osprey_spark.sml import RulesetCompiler

    df = _events(spark, sf_dir)
    plan = RulesetCompiler(
        RULESET,
        input_schema=df.schema,
        action_name_col="event_type",
        action_id_col="event_id",
        timestamp_col="ts",
        data_json_col="props",
    ).compile()
    out = plan.apply(df, passthrough=["event_id"])
    return out.select(
        "event_id",
        "UserId",
        "EventType",
        "Value",
        "PropK",
        "BigPurchase",
        "HighK",
        "ErrorEvent",
        F.get("__verdicts", 0).alias("verdict"),
        F.size("__entity_label_mutations").alias("n_mutations"),
        F.col("__error_count").alias("error_count"),
    )


_RULE_EVAL_ORACLE = """
SELECT
  event_id,
  CAST(user_id AS VARCHAR) AS UserId,
  event_type AS EventType,
  value AS Value,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS PropK,
  (event_type = 'purchase' AND value > 100.0) AS BigPurchase,
  (CAST(json_extract_string(props, '$.k') AS BIGINT) >= 90) AS HighK,
  (event_type = 'error') AS ErrorEvent,
  CASE WHEN (event_type = 'purchase' AND value > 100.0)
         OR CAST(json_extract_string(props, '$.k') AS BIGINT) >= 90
       THEN 'review' END AS verdict,
  (CASE WHEN (event_type = 'purchase' AND value > 100.0)
          OR CAST(json_extract_string(props, '$.k') AS BIGINT) >= 90
        THEN 1 ELSE 0 END
   + CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_mutations,
  0 AS error_count
FROM events
"""


# --------------------------------------------------------------------------
# analytics query surface (timeseries / topN / distinct / scan / filter)
# --------------------------------------------------------------------------

def _timeseries(spark, sf_dir):
    from osprey_spark.plans import timeseries

    return timeseries(_events(spark, sf_dir), START, END, "1 hour", ts_col="ts")


_TIMESERIES_ORACLE = """
SELECT date_trunc('hour', ts) AS bucket_start, count(*) AS n
FROM events
WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-03-01'
GROUP BY 1 ORDER BY 1
"""


def _timeseries_by_type(spark, sf_dir):
    from osprey_spark.plans import timeseries

    return timeseries(
        _events(spark, sf_dir), START, END, "1 day", ts_col="ts", dimension="event_type"
    )


_TIMESERIES_BY_TYPE_ORACLE = """
SELECT date_trunc('day', ts) AS bucket_start, event_type, count(*) AS n
FROM events
WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-03-01'
GROUP BY 1, 2 ORDER BY 1, 2
"""


def _escalation(spark, sf_dir):
    from osprey_spark.operators.sessions import escalation_sessions

    out = escalation_sessions(
        _events(spark, sf_dir),
        trigger=F.col("event_type") == "error",
        key="user_id",
        gap_seconds=1800,
        ts_col="ts",
        min_triggers=2,
    )
    return out.select("user_id", "session_id", "n_turns", "n_triggers", "session_start")


_ESCALATION_ORACLE = """
WITH g AS (
  SELECT user_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts, event_type,
         CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id, count(*) AS n_turns,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_triggers,
       min(ts) AS session_start
FROM s GROUP BY 1, 2
HAVING sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) >= 2
"""


def _session_window_agg(spark, sf_dir):
    from osprey_spark.operators.sessions import session_agg

    out = session_agg(_events(spark, sf_dir), key="user_id", gap="30 minutes", ts_col="ts")
    return out.select("user_id", "session_start", "session_end", "n_turns")


_SESSION_WINDOW_ORACLE = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts,
         CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_turns
FROM s GROUP BY user_id, session_id
"""


def _topn(spark, sf_dir):
    from osprey_spark.plans import topn

    return topn(_events(spark, sf_dir), "event_type", START, END, limit=10, ts_col="ts")


_TOPN_ORACLE = """
SELECT event_type, count(*) AS count
FROM events
WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-03-01'
GROUP BY 1 ORDER BY count DESC, event_type ASC LIMIT 10
"""


def _topn_pop(spark, sf_dir):
    from osprey_spark.plans import topn

    mid = datetime.datetime(2024, 1, 16)
    return topn(
        _events(spark, sf_dir), "event_type", mid, END, limit=10, ts_col="ts",
        previous_period=True,
    ).select("event_type", "count", "prev_count")


_TOPN_POP_ORACLE = """
WITH cur AS (
  SELECT event_type, count(*) AS count FROM events
  WHERE ts >= TIMESTAMP '2024-01-16' AND ts < TIMESTAMP '2024-03-01'
  GROUP BY 1
), prev AS (
  SELECT event_type, count(*) AS prev_count FROM events
  WHERE ts >= TIMESTAMP '2023-12-02' AND ts < TIMESTAMP '2024-01-16'
  GROUP BY 1
)
SELECT cur.event_type, cur.count, COALESCE(prev.prev_count, 0) AS prev_count
FROM cur LEFT JOIN prev USING (event_type)
ORDER BY count DESC, event_type ASC LIMIT 10
"""


def _distinct_users(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


_DISTINCT_USERS_ORACLE = """
SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY 1
"""


def _approx_distinct(spark, sf_dir):
    from osprey_spark.plans import approx_distinct

    return approx_distinct(_events(spark, sf_dir), "user_id", START, END, ts_col="ts")


def _scan_page(spark, sf_dir):
    from osprey_spark.plans import scan

    return scan(
        _events(spark, sf_dir), START, END, limit=100,
        ts_col="ts", id_col="event_id",
    )


_SCAN_ORACLE = """
SELECT event_id, ts FROM events
WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-03-01'
ORDER BY ts DESC, event_id LIMIT 100
"""


def _query_filter(spark, sf_dir):
    from osprey_spark.plans import compile_query_filter

    df = _events(spark, sf_dir).select(
        "event_id",
        F.col("event_type").alias("EventType"),
        F.col("value").alias("Value"),
    )
    pred = compile_query_filter('EventType == "purchase" and Value > 100.0', df)
    return df.filter(pred).select("event_id")


_QUERY_FILTER_ORACLE = """
SELECT event_id FROM events
WHERE event_type = 'purchase' AND value IS NOT NULL AND value > 100.0
"""


# --------------------------------------------------------------------------
# velocity / sessions / CEP
# --------------------------------------------------------------------------

def _tumbling(spark, sf_dir):
    from osprey_spark.operators.velocity import tumbling_counts

    return tumbling_counts(_events(spark, sf_dir), "user_id", "1 hour", "ts").select(
        "user_id", "window_start", "n"
    )


_TUMBLING_ORACLE = """
SELECT user_id, date_trunc('hour', ts) AS window_start, count(*) AS n
FROM events GROUP BY 1, 2
"""


def _sliding(spark, sf_dir):
    from osprey_spark.operators.velocity import sliding_counts

    return sliding_counts(_events(spark, sf_dir), "user_id", "1 hour", "15 minutes", "ts").select(
        "user_id", "window_start", "n"
    )


_SLIDING_ORACLE = """
WITH slid AS (
  SELECT user_id,
         make_timestamp(CAST((floor(epoch(ts) / 900) * 900 - 900 * k) * 1000000 AS BIGINT))
           AS window_start
  FROM events, unnest([0, 1, 2, 3]) AS t(k)
)
SELECT user_id, window_start, count(*) AS n
FROM slid GROUP BY 1, 2
"""


def _trailing(spark, sf_dir):
    from osprey_spark.operators.velocity import attach_trailing_count

    return attach_trailing_count(
        _events(spark, sf_dir), "user_id", 3600, "ts", "trailing_count"
    ).select("event_id", "user_id", "trailing_count")


_TRAILING_ORACLE = """
SELECT event_id, user_id,
       count(*) OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
       AS trailing_count
FROM events
"""


def _sessions(spark, sf_dir):
    from osprey_spark.operators.sessions import sessionize

    s = sessionize(_events(spark, sf_dir), key="user_id", gap_seconds=1800, ts_col="ts")
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


_SESSIONS_ORACLE = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts,
         CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM s GROUP BY 1, 2
"""


def _cep(spark, sf_dir):
    from osprey_spark.operators.sessions import match_sequence

    steps = [
        F.col("event_type") == "signup",
        F.col("event_type") == "purchase",
        F.col("event_type") == "error",
    ]
    return match_sequence(
        _events(spark, sf_dir), steps, key="user_id", order_col="event_id"
    ).select("user_id", "matched")


_CEP_ORACLE = """
WITH s1 AS (
  SELECT user_id, min(event_id) AS e1 FROM events
  WHERE event_type = 'signup' GROUP BY 1
), s2 AS (
  SELECT e.user_id, min(e.event_id) AS e2 FROM events e
  JOIN s1 ON e.user_id = s1.user_id AND e.event_id > s1.e1
  WHERE e.event_type = 'purchase' GROUP BY 1
), s3 AS (
  SELECT e.user_id, min(e.event_id) AS e3 FROM events e
  JOIN s2 ON e.user_id = s2.user_id AND e.event_id > s2.e2
  WHERE e.event_type = 'error' GROUP BY 1
)
SELECT u.user_id, (s3.e3 IS NOT NULL) AS matched
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN s3 ON u.user_id = s3.user_id
"""


# --------------------------------------------------------------------------
# documents: dedup + text analytics
# --------------------------------------------------------------------------

_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), "
    "'\\s+', ' ', 'g'))"
)


def _exact_dedup(spark, sf_dir):
    from osprey_spark.operators.dedup import exact_dedup

    return exact_dedup(_documents(spark, sf_dir)).select("doc_id")


_EXACT_DEDUP_ORACLE = f"""
SELECT min(doc_id) AS doc_id FROM documents GROUP BY {_NORM_SQL}
"""


def _ngram_pairs(spark, sf_dir):
    from osprey_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _documents(spark, sf_dir), shingle_k=3, threshold=0.4
    ).select("id_a", "id_b")


_NGRAM_PAIRS_ORACLE = f"""
WITH norm AS (
  SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_distinct(list_transform(range(1, len(w) - 1),
                                                i -> array_to_string(w[i:i+2], ' ')))
              ELSE [array_to_string(w, ' ')] END AS s
  FROM norm
), posting AS (
  SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh
), shared AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b, l.n AS na, r.n AS nb,
         count(*) AS inter
  FROM posting l JOIN posting r ON l.g = r.g AND l.doc_id < r.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b FROM shared
WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.4
"""


def _token_counts(spark, sf_dir):
    from osprey_spark.operators.textstats import bpe_ish_token_count, token_count

    d = _documents(spark, sf_dir)
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


_TOKEN_COUNTS_ORACLE = r"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z0-9_'']+|[^\sA-Za-z0-9_]')) AS n_bpe_tokens
FROM documents
"""


def _lang_id(spark, sf_dir):
    from osprey_spark.operators.textstats import language_id

    return _documents(spark, sf_dir).select(
        "doc_id", language_id(F.col("text")).alias("lang_id")
    )


def _make_lang_oracle() -> str:
    from osprey_spark.operators.textstats import _STOPWORDS

    selects = []
    for lang, words in _STOPWORDS.items():
        arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        selects.append(
            f"SELECT doc_id, '{lang}' AS l, "
            f"len(list_filter(toks, t -> list_contains({arr}, t))) AS h FROM toks"
        )
    union = " UNION ALL ".join(selects)
    return f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []
              ELSE string_split_regex(trim(lower(text)), '\\s+') END AS toks
  FROM documents
), scores AS ({union}),
ranked AS (
  SELECT doc_id, l, h,
         row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, l DESC) AS rn
  FROM scores
)
SELECT doc_id, CASE WHEN h > 0 THEN l ELSE 'und' END AS lang_id
FROM ranked WHERE rn = 1
"""


def _minhash_pairs(spark, sf_dir):
    from osprey_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _documents(spark, sf_dir), num_hashes=64, bands=16, jaccard_threshold=0.5
    ).select("id_a", "id_b")


def _simhash_pairs(spark, sf_dir):
    from osprey_spark.operators.dedup import simhash_pairs

    return simhash_pairs(_documents(spark, sf_dir), max_hamming=6, bands=4)


# --------------------------------------------------------------------------
# embeddings: similarity search
# --------------------------------------------------------------------------

def _query_vec(spark, sf_dir):
    row = (
        _embeddings(spark, sf_dir).filter(F.col("vec_id") == 0).select("embedding").first()
    )
    return [float(x) for x in row[0]]


def _cosine_topk(spark, sf_dir):
    from osprey_spark.operators.similarity import cosine_topk, dot, l2_norm

    df = _embeddings(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    q = _query_vec(spark, sf_dir)
    out = cosine_topk(df, q, k=20)
    return out.select("vec_id", F.round(F.col("cosine"), 4).alias("cosine"))


_COSINE_TOPK_ORACLE = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(CAST(list_cosine_similarity(embedding, qe) AS DOUBLE), 4) AS cosine
FROM embeddings, q
ORDER BY list_cosine_similarity(embedding, qe) DESC, vec_id ASC
LIMIT 20
"""


def _knn(spark, sf_dir):
    from osprey_spark.operators.similarity import knn_join

    emb = _embeddings(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"), "label"
    )
    queries = emb.filter(F.col("vec_id") < 10)
    out = knn_join(emb, queries, k=3)
    return out.select("query_id", "neighbor_id", "rank")


_KNN_ORACLE = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(CAST(list_cosine_similarity(e.embedding, q.qe) AS DOUBLE), 6) AS cosine
  FROM embeddings e, q
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 3
"""


def _ivf_topk(spark, sf_dir):
    from osprey_spark.operators.similarity import ivf_topk

    emb = _embeddings(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    q = _query_vec(spark, sf_dir)
    return ivf_topk(emb, q, k=20, n_clusters=8, n_probe=3).select(
        "vec_id", F.round(F.col("cosine"), 4).alias("cosine")
    )


def _near_dup_vectors(spark, sf_dir):
    from osprey_spark.operators.dedup import embedding_near_dup_pairs

    return embedding_near_dup_pairs(
        _embeddings(spark, sf_dir).select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
        ),
        cosine_threshold=0.3,
        num_hyperplanes=2,
    ).select("id_a", "id_b")


# --------------------------------------------------------------------------
# contract functions
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the compiled SML rule plan over sf0.001 events."""
    return _rule_eval(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rule_eval": _rule_eval,
        "timeseries_hourly": _timeseries,
        "timeseries_by_type": _timeseries_by_type,
        "topn_event_types": _topn,
        "topn_pop": _topn_pop,
        "distinct_users_by_type": _distinct_users,
        "approx_distinct_users": _approx_distinct,
        "scan_page": _scan_page,
        "query_filter": _query_filter,
        "velocity_tumbling": _tumbling,
        "velocity_sliding": _sliding,
        "velocity_trailing": _trailing,
        "sessionization": _sessions,
        "session_window_agg": _session_window_agg,
        "escalation_sessions": _escalation,
        "cep_ordered_pattern": _cep,
        "dedup_exact": _exact_dedup,
        "dedup_ngram_jaccard": _ngram_pairs,
        "dedup_minhash_lsh": _minhash_pairs,
        "dedup_simhash": _simhash_pairs,
        "text_token_counts": _token_counts,
        "text_lang_id": _lang_id,
        "sim_cosine_topk": _cosine_topk,
        "sim_knn_join": _knn,
        "sim_ivf_topk": _ivf_topk,
        "sim_near_dup_lsh": _near_dup_vectors,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "rule_eval": _RULE_EVAL_ORACLE,
        "timeseries_hourly": _TIMESERIES_ORACLE,
        "timeseries_by_type": _TIMESERIES_BY_TYPE_ORACLE,
        "topn_event_types": _TOPN_ORACLE,
        "topn_pop": _TOPN_POP_ORACLE,
        "distinct_users_by_type": _DISTINCT_USERS_ORACLE,
        # approx_distinct_users: HLL++ sketch — not SQL-reproducible; rows-only
        "scan_page": _SCAN_ORACLE,
        "query_filter": _QUERY_FILTER_ORACLE,
        "velocity_tumbling": _TUMBLING_ORACLE,
        "velocity_sliding": _SLIDING_ORACLE,
        "velocity_trailing": _TRAILING_ORACLE,
        "sessionization": _SESSIONS_ORACLE,
        "session_window_agg": _SESSION_WINDOW_ORACLE,
        "escalation_sessions": _ESCALATION_ORACLE,
        "cep_ordered_pattern": _CEP_ORACLE,
        "dedup_exact": _EXACT_DEDUP_ORACLE,
        "dedup_ngram_jaccard": _NGRAM_PAIRS_ORACLE,
        # dedup_minhash_lsh / dedup_simhash: xxhash64-based — rows-only
        "text_token_counts": _TOKEN_COUNTS_ORACLE,
        "text_lang_id": _make_lang_oracle(),
        "sim_cosine_topk": _COSINE_TOPK_ORACLE,
        "sim_knn_join": _KNN_ORACLE,
        # sim_near_dup_lsh: hyperplane-LSH candidates — rows-only
    }
