"""Streaming-semantics catalog entries over the ``events`` table
(SURVEY.md §2.11 — the reference has no streaming; these are the
extension operators the driver testdata's events table exists for).

Each windowed aggregation is defined once over the batch DataFrame API
(`F.window` / `F.session_window`) — the *same expression* runs under
Structured Streaming `readStream` (see streaming/jobs.py); the batch
form is what the oracle can check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog import register
from aws_etl_pipeline_financial_streamlit_dashboard_spark.sources.readers import read_table
from aws_etl_pipeline_financial_streamlit_dashboard_spark.functions.scalars import (
    dec_sum,
    event_time,
    ntz_of_instant,
    sql_dec_sum,
    sql_stable_avg,
    stable_avg,
    ts_micros,
)

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@register(
    "s01_tumbling_window",
    """
    SELECT STRFTIME(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {sv} AS sum_value,
           {av} AS avg_value
    FROM events
    GROUP BY time_bucket(INTERVAL '1 hour', ts), event_type
    """.format(sv=sql_dec_sum('value', 2), av=sql_stable_avg('value', 6)),
    doc="""Tumbling 1-hour window aggregation by event type — the
    foundational streaming agg (identical expression runs under
    readStream with a watermark; batch form checked by time_bucket
    oracle). Partial agg map-side; shuffle carries only (window, type)
    groups.""",
)
def s01_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            dec_sum("value", 2).alias("sum_value"),
            stable_avg("value", 6).alias("avg_value"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


@register(
    "s02_sliding_window",
    """
    WITH expanded AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS w_start, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS w_start, value
        FROM events
    )
    SELECT STRFTIME(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           {sv} AS sum_value
    FROM expanded
    GROUP BY w_start
    """.format(sv=sql_dec_sum('value', 2)),
    doc="""Sliding window: 1-hour windows every 30 minutes. Each event
    lands in exactly 2 windows; the oracle expands event→window
    membership explicitly (start = 30-min bucket, and that minus 30
    min), which is precisely Spark's internal window expansion.""",
)
def s02_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            dec_sum("value", 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "s03_session_window",
    """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                         OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                            >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc="""Session windows with a 30-minute inactivity gap per user —
    Spark's session_window vs the classic gaps-and-islands SQL in the
    oracle. Output is (user, session_start, event count); Spark's
    session *end* includes the gap padding by definition, so start+count
    is the engine-portable projection.""",
)
def s03_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), _TS_FMT).alias("session_start"),
            "n_events",
        )
    )


@register(
    "s04_event_type_rollup",
    """
    SELECT event_type,
           STRFTIME(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS day,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {sv} AS sum_value
    FROM events
    GROUP BY event_type, time_bucket(INTERVAL '1 day', ts)
    """.format(sv=sql_dec_sum('value', 2)),
    doc="""Daily rollup with distinct-user counts — the hypertable-style
    continuous aggregate shape (day × type grain). COUNT(DISTINCT)
    expands then collapses in Catalyst's two-phase distinct agg.""",
)
def s04_event_type_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.date_format(F.window("ts", "1 day")["start"], "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            dec_sum("value", 2).alias("sum_value"),
        )
    )


@register(
    "s06_streaming_dedup",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    """,
    doc="""Streaming exact deduplication (dropDuplicatesWithinWatermark)
    under a REAL at-least-once delivery simulation: the events batch is
    delivered twice into a file-source stream (what a retrying upstream
    does), deduped on event_id within a 2-hour watermark, and drained
    through a memory sink with Trigger.AvailableNow. The result must
    equal one clean copy — the batch oracle. Scale contract: state is
    one entry per key within the watermark horizon and is evicted past
    it (O(keys/horizon), not O(stream length)) — the property a batch
    dropDuplicates cannot give an unbounded stream
    (streaming/jobs.dedup_events_stream).""",
)
def s06_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.streaming.jobs import (
        run_dedup_available_now,
    )

    # batch read via read_table sets the nanosAsLong conf the raw
    # spark.read inside the runner needs for the events table
    read_table(spark, sf_dir, "events")
    return run_dedup_available_now(
        spark, os.path.join(sf_dir, "events.parquet"), n_copies=2
    )


@register(
    "s07_stream_static_join",
    """
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_events,
           {sv} AS sum_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """.format(sv=sql_dec_sum('e.value', 2)),
    doc="""Stream-static join: the streaming events file-source enriched
    against the static customer dimension (broadcast — the dim is
    re-resolvable per micro-batch, the canonical streaming enrichment
    shape), then aggregated per market segment. Runs as a REAL
    streaming query (memory sink, complete mode, Trigger.AvailableNow);
    the single-batch drain makes the final table equal the batch
    join+agg, which is what the oracle checks. At scale the static side
    broadcasts once per batch and the streamed side never shuffles for
    the join — only the |segments|-row aggregation exchanges.""",
)
def s07_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    # batch read sets the nanosAsLong conf; also the static dim source
    read_table(spark, sf_dir, "events")
    customer = F.broadcast(
        read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    )

    leaf = "events.parquet"
    glob = os.path.join(sf_dir, f"[{leaf[0]}]{leaf[1:]}")
    stream = (
        spark.readStream.schema("event_id bigint, user_id bigint, value double")
        .format("parquet")
        .load(glob)
        .select("user_id", "value")
    )
    joined = stream.join(customer, stream.user_id == customer.c_custkey)
    agg = joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_events"),
        dec_sum("value", 2).alias("sum_value"),
    )

    return _drain_to_memory(agg, "complete", "stream_static")


@register(
    "s08_foreach_batch_sink",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           {sv} AS sum_value
    FROM events
    GROUP BY event_type
    """.format(sv=sql_dec_sum('value', 2)),
    doc="""Exactly-once custom sink via foreachBatch: the events stream
    lands in batch-id-keyed parquet directories where every micro-batch
    OVERWRITES its own path — and the run deliberately re-executes the
    first batch's write (the retry an at-least-once driver performs
    after a sink failure) to prove idempotence. The read-back,
    aggregated per event type, must equal the batch aggregate over one
    clean copy of the source — which is what the oracle checks. This is
    the sink pattern for any store without native streaming support
    (JDBC serving tables included — the reference's load stage,
    TableTransform.py:26-29, is exactly this shape)
    (streaming/jobs.run_foreach_batch_ingest).""",
)
def s08_foreach_batch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.streaming.jobs import (
        run_foreach_batch_ingest,
    )

    read_table(spark, sf_dir, "events")  # sets nanosAsLong for raw reads
    landed = run_foreach_batch_ingest(
        spark, os.path.join(sf_dir, "events.parquet"), replay_batch=True
    )
    return landed.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        dec_sum("value", 2).alias("sum_value"),
    )


@register(
    "s09_stream_stream_join",
    """
    SELECT p.event_id AS purchase_id,
           v.event_id AS view_id,
           p.user_id,
           epoch_us(p.ts) AS p_ts_us,
           epoch_us(v.ts) AS v_ts_us
    FROM events p JOIN events v
      ON p.user_id = v.user_id
     AND p.event_type = 'purchase' AND v.event_type = 'view'
     AND v.ts > p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
    """,
    doc="""Watermarked stream-stream inner join: purchases joined to the
    same user's views from the preceding hour, both sides REAL streams
    (file source → memory sink, Trigger.AvailableNow). The join
    condition bounds each side's event time relative to the other, so
    Spark's state store evicts buffered rows once the 2-hour watermark
    passes them — bounded state on unbounded streams, the property a
    batch join can't give. The single-file source drains in one
    micro-batch (watermark starts at -inf), so the streamed result
    equals the batch join — which is what the oracle checks. ts arrives
    TIMESTAMP_NTZ from naive parquet and is cast for the tz-strict
    watermark.""",
)
def s09_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    read_table(spark, sf_dir, "events")  # sets raw-read confs if needed
    leaf = "events.parquet"
    glob = os.path.join(sf_dir, f"[{leaf[0]}]{leaf[1:]}")
    schema = (
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string"
    )

    def side(tag: str, etype: str):
        return (
            spark.readStream.schema(schema)
            .format("parquet")
            .load(glob)
            .filter(F.col("event_type") == etype)
            .select(
                F.col("event_id").alias(f"{tag}_event_id"),
                F.col("user_id").alias(f"{tag}_user_id"),
                event_time("ts").alias(f"{tag}_ts"),
            )
            .withWatermark(f"{tag}_ts", "2 hours")
        )

    p, v = side("p", "purchase"), side("v", "view")
    joined = p.join(
        v,
        F.expr(
            "p_user_id = v_user_id "
            "AND v_ts > p_ts - INTERVAL 1 HOUR AND v_ts <= p_ts"
        ),
    ).select(
        F.col("p_event_id").alias("purchase_id"),
        F.col("v_event_id").alias("view_id"),
        F.col("p_user_id").alias("user_id"),
        F.unix_micros("p_ts").alias("p_ts_us"),
        F.unix_micros("v_ts").alias("v_ts_us"),
    )

    return _drain_to_memory(joined, "append", "stream_stream")


@register(
    "s10_stream_stream_left_join",
    """
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         v AS (SELECT * FROM events WHERE event_type = 'view'),
         wm AS (SELECT LEAST((SELECT MAX(ts) FROM p),
                             (SELECT MAX(ts) FROM v))
                       - INTERVAL 2 HOUR AS w)
    SELECT p.event_id AS purchase_id,
           v.event_id AS view_id,
           p.user_id,
           epoch_us(p.ts) AS p_ts_us,
           epoch_us(v.ts) AS v_ts_us
    FROM p JOIN v
      ON p.user_id = v.user_id
     AND v.ts > p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
    UNION ALL
    SELECT p.event_id, NULL, p.user_id, epoch_us(p.ts), NULL
    FROM p, wm
    WHERE p.ts < wm.w
      AND NOT EXISTS (SELECT 1 FROM v
                      WHERE v.user_id = p.user_id
                        AND v.ts > p.ts - INTERVAL 1 HOUR
                        AND v.ts <= p.ts)
    """,
    doc="""LEFT-OUTER stream-stream join — s09 plus the hard part:
    null-extended results for unmatched purchases can only emit once
    the state store PROVES no matching view will arrive, i.e. when the
    global watermark (Spark's multi-watermark policy: min over both
    sides' max event time, minus the 2-hour delay) passes the purchase.
    Purchases inside the final watermark horizon stay unmatched-pending
    forever in a drained stream — a batch LEFT JOIN is provably NOT the
    streaming answer. The oracle encodes exactly that semantics:
    inner matches plus NOT-EXISTS rows older than
    LEAST(max_p_ts, max_v_ts) - 2h (verified boundary-exact against
    the real run). State stays bounded by the same eviction.""",
)
def s10_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    read_table(spark, sf_dir, "events")
    leaf = "events.parquet"
    glob = os.path.join(sf_dir, f"[{leaf[0]}]{leaf[1:]}")
    schema = (
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string"
    )

    def side(tag: str, etype: str):
        return (
            spark.readStream.schema(schema)
            .format("parquet")
            .load(glob)
            .filter(F.col("event_type") == etype)
            .select(
                F.col("event_id").alias(f"{tag}_event_id"),
                F.col("user_id").alias(f"{tag}_user_id"),
                event_time("ts").alias(f"{tag}_ts"),
            )
            .withWatermark(f"{tag}_ts", "2 hours")
        )

    p, v = side("p", "purchase"), side("v", "view")
    joined = p.join(
        v,
        F.expr(
            "p_user_id = v_user_id "
            "AND v_ts > p_ts - INTERVAL 1 HOUR AND v_ts <= p_ts"
        ),
        "left_outer",
    ).select(
        F.col("p_event_id").alias("purchase_id"),
        F.col("v_event_id").alias("view_id"),
        F.col("p_user_id").alias("user_id"),
        F.unix_micros("p_ts").alias("p_ts_us"),
        F.unix_micros("v_ts").alias("v_ts_us"),
    )

    return _drain_to_memory(joined, "append", "stream_left")


@register(
    "s11_stream_incremental_dedup",
    """
    SELECT doc_id, source
    FROM documents
    WHERE md5(text) NOT IN (SELECT md5(text) FROM documents
                            WHERE doc_id % 5 = 0)
    """,
    doc="""Streaming incremental dedup — the continuous-ingestion form
    of x40's batch operator: a stream of newly crawled documents is
    checked against the STANDING corpus (every 5th doc stands in for
    the history) by exact content hash, and only never-seen documents
    pass through. Runs as a REAL streaming query: documents file
    source → md5 projection → stream-static LEFT OUTER join against
    the static corpus-hash frame (broadcast; re-resolved per
    micro-batch) → null-filter → append-mode memory sink,
    Trigger.AvailableNow. Append mode needs no state at all — the
    static side carries the membership — so at scale the stream never
    shuffles; the corpus hash set is the only distributed artifact
    (bucketed standing table in production, x40's design note). The
    oracle is the equivalent batch anti-membership (md5 is non-null
    here, so NOT IN is safe — contrast q50).""",
)
def s11_stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    docs = read_table(spark, sf_dir, "documents")  # sets read-time confs
    corpus_hashes = F.broadcast(
        docs.filter(F.col("doc_id") % 5 == 0)
        .select(F.md5("text").alias("__h"))
        .distinct()
        .withColumn("__seen", F.lit(True))
    )

    leaf = "documents.parquet"
    glob = os.path.join(sf_dir, f"[{leaf[0]}]{leaf[1:]}")
    stream = (
        spark.readStream.schema("doc_id bigint, text string, source string")
        .format("parquet")
        .load(glob)
        .select("doc_id", "source", F.md5("text").alias("__h"))
    )
    fresh = (
        stream.join(corpus_hashes, "__h", "left")
        .filter(F.col("__seen").isNull())
        .select("doc_id", "source")
    )

    return _drain_to_memory(fresh, "append", "stream_incr_dedup")


def _drain_to_memory(df, output_mode: str, prefix: str):
    """Shared sink tail for the real-streaming entries: memory sink +
    fresh checkpoint + Trigger.AvailableNow, returning the drained
    table. One definition of the uuid/checkpoint/start/await sequence
    instead of a copy per entry.

    State-partition pin (VERDICT r8 item 5): a streaming query binds
    its state partitioning to ``spark.sql.shuffle.partitions`` AT
    START, and every state partition costs real per-micro-batch work
    (task launch + a state-store instance with its commit files — a
    stream-stream join runs FOUR store instances per partition). Under
    the plain verify session's default 200 partitions, s09/s10 spent
    22-28 s each on ~220 KB of events — pure store/scheduling
    overhead, 51 s of the 294 s full sweep. The fixtures drain one
    tiny file, so we pin a toy-scale count (default 8, env
    ``SPARK_GRAFT_STREAM_STATE_PARTITIONS``) for the query's lifetime
    and restore the session value after. Results are partitioning-
    independent; a production deploy sizes the same knob to its key
    cardinality when the checkpoint is first created (state partition
    count is fixed for the checkpoint's life — docs/SCALE.md)."""
    import os
    import shutil
    import tempfile
    import uuid

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.streaming.stateconf import (
        pinned_state_partitions,
    )

    spark = df.sparkSession
    name = f"{prefix}_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    try:
        with pinned_state_partitions(spark):
            (
                df.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .option("checkpointLocation", os.path.join(ckpt, "state"))
                .trigger(availableNow=True)
                .start()
                .awaitTermination()
            )
    finally:
        # the drained memory table is independent of the checkpoint;
        # remove it eagerly so repeated verify/bench runs don't
        # accumulate orphaned state dirs (ADVICE r3)
        shutil.rmtree(ckpt, ignore_errors=True)
    return df.sparkSession.table(name)



@register(
    "s12_streaming_ohlc",
    """
    WITH e AS (
        SELECT event_type,
               STRFTIME(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d %H:%M:%S')
                   AS window_start,
               epoch_us(ts) AS us, event_id, value,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS vol
        FROM events
    ),
    r AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY event_type, window_start
                                  ORDER BY us, event_id) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY event_type, window_start
                                  ORDER BY us DESC, event_id DESC) AS rn_d
        FROM e
    )
    SELECT event_type, window_start,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(SUM(vol) AS BIGINT) AS volume,
           COUNT(*) AS n_trades
    FROM r
    GROUP BY event_type, window_start
    """,
    doc="""Live candlestick builder: q55's daily OHLC bars computed by a
    REAL streaming query (file source → watermark → tumbling 1-day
    window → memory sink, Trigger.AvailableNow) — the streaming twin a
    trading dashboard runs intraday while q55 serves history. Open and
    close are min/max over (ts_us, event_id, value) structs — struct
    extremes are MERGEABLE aggregate state, so partial bars combine
    across micro-batches and partitions without buffering ticks (a
    row_number plan, the oracle's shape, could not stream). The
    single-file source drains in one micro-batch, so the streamed bars
    equal q55's batch bars per (symbol, day) — which is what the
    oracle checks. NOTE the mode/state trade: complete mode (used
    here so the one-batch AvailableNow run emits every bar) retains
    ALL window state for the life of the query; the unbounded-feed
    production shape is append mode, where the watermark closes and
    EVICTS each day's bar one day after its window ends — same
    aggregation expression, different sink mode.""",
)
def s12_streaming_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    read_table(spark, sf_dir, "events")  # sets raw-read confs if needed
    leaf = "events.parquet"
    glob = os.path.join(sf_dir, f"[{leaf[0]}]{leaf[1:]}")
    schema = (
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(glob)
        .select(
            "event_type",
            # session-TZ-invariant instant + micros (scalars.event_time:
            # a plain NTZ->LTZ cast would move bucket boundaries and
            # emitted values under a shifted driver timezone)
            event_time("ts").alias("ts"),
            ts_micros("ts").alias("us"),
            "event_id",
            "value",
            F.get_json_object("props", "$.k").cast("bigint").alias("vol"),
        )
        .withWatermark("ts", "1 day")
    )
    first_tick = F.min(F.struct("us", "event_id", "value"))
    last_tick = F.max(F.struct("us", "event_id", "value"))
    bars = (
        stream.groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(
            first_tick.getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            last_tick.getField("value").alias("close"),
            F.sum("vol").alias("volume"),
            F.count("*").alias("n_trades"),
        )
        .select(
            "event_type",
            # render via the NTZ wall clock (date_format on LTZ would
            # re-route through the session zone)
            F.date_format(ntz_of_instant(F.col("w.start")), _TS_FMT).alias(
                "window_start"
            ),
            "open",
            "high",
            "low",
            "close",
            "volume",
            "n_trades",
        )
    )
    return _drain_to_memory(bars, "complete", "stream_ohlc")


@register(
    "s13_streaming_ohlc_append",
    """
    WITH e AS (
        SELECT event_type,
               STRFTIME(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d %H:%M:%S')
                   AS window_start,
               time_bucket(INTERVAL '1 day', ts) AS w0,
               epoch_us(ts) AS us, event_id, value,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS vol
        FROM events
    ),
    m AS (SELECT MAX(ts) AS mx FROM events),
    r AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY event_type, window_start
                                  ORDER BY us, event_id) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY event_type, window_start
                                  ORDER BY us DESC, event_id DESC) AS rn_d
        FROM e
    )
    SELECT event_type, window_start,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(SUM(vol) AS BIGINT) AS volume,
           COUNT(*) AS n_trades
    FROM r, m
    WHERE w0 + INTERVAL 2 DAY <= mx
    GROUP BY event_type, window_start
    """,
    doc="""s12's candlestick builder in its PRODUCTION output mode:
    append — a bar is emitted exactly once, when the watermark passes
    its window end, and its state is then EVICTED (bounded state on an
    unbounded feed; s12's complete mode re-emits everything and
    retains all state). The AvailableNow run drains the batch, then
    the final no-data micro-batch advances the watermark to
    max(ts) − 1 day, emitting every bar whose day ended at least one
    delay before the last tick — which is what the oracle encodes
    (window_start + 2 days ≤ max ts: 1 day window + 1 day delay); the
    in-flight final day's bar is correctly ABSENT, the semantic
    difference a complete-mode oracle could never check. Same
    mergeable struct-extreme aggregates as q55/s12.""",
)
def s13_streaming_ohlc_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    read_table(spark, sf_dir, "events")  # sets raw-read confs if needed
    leaf = "events.parquet"
    glob = os.path.join(sf_dir, f"[{leaf[0]}]{leaf[1:]}")
    schema = (
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(glob)
        .select(
            "event_type",
            # session-TZ-invariant instant + micros (scalars.event_time:
            # a plain NTZ->LTZ cast would move bucket boundaries and
            # emitted values under a shifted driver timezone)
            event_time("ts").alias("ts"),
            ts_micros("ts").alias("us"),
            "event_id",
            "value",
            F.get_json_object("props", "$.k").cast("bigint").alias("vol"),
        )
        .withWatermark("ts", "1 day")
    )
    bars = (
        stream.groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(
            F.min(F.struct("us", "event_id", "value")).getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.struct("us", "event_id", "value")).getField("value").alias("close"),
            F.sum("vol").alias("volume"),
            F.count("*").alias("n_trades"),
        )
        .select(
            "event_type",
            # render via the NTZ wall clock (date_format on LTZ would
            # re-route through the session zone)
            F.date_format(ntz_of_instant(F.col("w.start")), _TS_FMT).alias(
                "window_start"
            ),
            "open",
            "high",
            "low",
            "close",
            "volume",
            "n_trades",
        )
    )
    return _drain_to_memory(bars, "append", "stream_ohlc_ap")


@register(
    "s14_update_mode_counts",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           {sv} AS sum_value
    FROM events
    GROUP BY event_type
    """.format(sv=sql_dec_sum('value', 2)),
    doc="""Update output mode — the third leg of the sink-mode
    coverage (complete: s07/s12, append: s09/s13): an unwindowed
    running aggregate where each micro-batch emits ONLY the groups
    whose values changed, the natural fit for a serving-table upsert
    sink (foreachBatch MERGE). Bounded state: |groups| rows forever,
    no watermark needed because the aggregate is keyed, not windowed.
    The AvailableNow run drains one batch, in which every group
    changes, so the update stream equals the batch aggregate — which
    is what the oracle checks; on a live feed each batch would emit
    the delta rows only.""",
)
def s14_update_mode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    read_table(spark, sf_dir, "events")  # sets raw-read confs if needed
    leaf = "events.parquet"
    glob = os.path.join(sf_dir, f"[{leaf[0]}]{leaf[1:]}")
    stream = (
        spark.readStream.schema(
            "event_id bigint, event_type string, value double"
        )
        .format("parquet")
        .load(glob)
    )
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        dec_sum("value", 2).alias("sum_value"),
    )
    out = _drain_to_memory(agg, "update", "stream_update")
    # Update mode appends each batch's changed rows to the memory sink;
    # a multi-batch drain therefore leaves intermediate running values
    # per key alongside the final ones. Instead of failing hard on any
    # future multi-file testdata layout (ADVICE r3), degrade to the
    # correct final state: per key, the LAST emitted row is the one
    # with the maximal running count (n_events is strictly increasing
    # across a key's updates), so a max-count dedup recovers exactly
    # the batch-equivalent answer. Single-batch drains (the current
    # layout) take the fast path untouched; the multi-batch case warns
    # so the layout change is still visible.
    n_rows = out.count()
    n_keys = out.select("event_type").distinct().count()
    if n_rows != n_keys:
        import warnings

        warnings.warn(
            f"s14 drained in >1 micro-batch ({n_rows} update rows for "
            f"{n_keys} keys); deduplicating to each key's final update",
            stacklevel=2,
        )
        w = "(PARTITION BY event_type ORDER BY n_events DESC)"
        out = (
            out.withColumn("__rn", F.expr(f"ROW_NUMBER() OVER {w}"))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    return out


@register(
    "s15_streaming_session_window",
    """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                         OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                            >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ),
    m AS (SELECT MAX(ts) AS mx FROM events),
    closed AS (
        SELECT user_id, session_id,
               MIN(ts) AS session_start_ts,
               MAX(ts) AS last_ts,
               COUNT(*) AS n_events
        FROM sessions
        GROUP BY user_id, session_id
    )
    SELECT user_id,
           STRFTIME(session_start_ts, '%Y-%m-%d %H:%M:%S') AS session_start,
           n_events
    FROM closed, m
    WHERE last_ts + INTERVAL '30 minutes' + INTERVAL '1 hour' <= mx
    """,
    doc="""s03's session windows as a REAL streaming query in APPEND
    mode — the production shape: merged per-user sessions (30-minute
    inactivity gap) are emitted exactly once, when the watermark
    passes the session's end (last event + gap), and their state is
    EVICTED. The oracle encodes the eviction boundary the same way
    s13 does: a session appears iff last_ts + gap + delay ≤ max ts
    (30 min gap + 1 h watermark delay), so the still-open tail
    sessions are correctly ABSENT — checked, not assumed. Session
    state at scale is one (user, open-session accumulator) entry
    within the watermark horizon; event time goes through
    scalars.event_time, so buckets are session-timezone-invariant
    like the rest of the streaming family.""",
)
def s15_streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    read_table(spark, sf_dir, "events")  # sets raw-read confs if needed
    leaf = "events.parquet"
    glob = os.path.join(sf_dir, f"[{leaf[0]}]{leaf[1:]}")
    schema = (
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(glob)
        .select("user_id", event_time("ts").alias("ts"))
        .withWatermark("ts", "1 hour")
    )
    sess = (
        stream.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(ntz_of_instant(F.col("w.start")), _TS_FMT).alias(
                "session_start"
            ),
            "n_events",
        )
    )
    return _drain_to_memory(sess, "append", "stream_session")


# ===========================================================================
# s16 — streaming keyed upsert (SCD1 MERGE via foreachBatch)
# ===========================================================================


@register(
    "s16_streaming_upsert",
    """
    WITH r AS (
        SELECT user_id, event_type, value, epoch_us(ts) AS us, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts) DESC, event_id DESC)
                   AS rn
        FROM events
    )
    SELECT user_id, us AS last_us, event_id AS last_event_id,
           event_type AS last_event_type, value AS last_value
    FROM r WHERE rn = 1
    """,
    doc="""Streaming SCD1 keyed upsert: a serving table of each user's
    LATEST event, seeded from history (event_id % 3 = 0) and then
    maintained by a REAL foreachBatch streaming merge over the
    remaining events (streaming/jobs.run_foreach_batch_upsert) —
    the change-data-capture consumer q41/q46 (batch SCD2) imply but
    streaming previously lacked. Each micro-batch merges into a
    versioned parquet snapshot chain by one argmax-struct hash
    aggregate (last-write-wins on the (us, event_id) exchange
    sequence); the chain never overwrites the snapshot it reads and
    redelivered batches rewrite their own version idempotently — the
    Delta-MERGE semantics on plain parquet.

    The oracle is the batch argmax over ALL events: seed ∪ stream
    covers every event exactly once and argmax is associative, so the
    maintained table must equal it row-for-row (raw values — bit-exact,
    full value-hash check). At 100 TB: per-batch cost is |batch| +
    |target| through one partial-aggregating shuffle; the versioned
    snapshots give per-batch isolation and a trivial rollback point.""",
)
def s16_streaming_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.streaming.jobs import (
        run_foreach_batch_upsert,
    )

    rows = read_table(spark, sf_dir, "events").select(
        "user_id",
        ts_micros("ts").alias("us"),
        "event_id",
        "event_type",
        "value",
    )
    seed = rows.filter(F.col("event_id") % 3 == 0)
    streamed = rows.filter(F.col("event_id") % 3 != 0)
    final = run_foreach_batch_upsert(spark, seed, streamed, prefix="s16")
    return final.select(
        "user_id",
        F.col("us").alias("last_us"),
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


# ===========================================================================
# s17 — exactly-once streaming append into a JDBC serving store
# ===========================================================================


@register(
    "s17_streaming_jdbc_upsert",
    """
    SELECT user_id, epoch_us(ts) AS us, event_id, event_type, value
    FROM events
    """,
    doc="""Exactly-once streaming delivery into a JDBC database
    (streaming/jobs.run_foreach_batch_jdbc_append): the reference's
    serving store is an RDBMS (TableTransform.py:26-29 writes Postgres
    via to_sql); this is that sink streaming-fed with a transactional
    batch-id LEDGER — per micro-batch, executors overwrite a staging
    table (idempotent restage on redelivery), then one driver
    transaction publishes stage→target IFF the batch_id is absent from
    the ledger, so a replayed batch inserts ZERO duplicate rows
    (deliberate-replay proof in tests/test_streaming_jdbc.py). Runs
    against embedded Derby — a real JDBC engine with real transactions
    (the Postgres dialect swap is a URL change).

    The oracle is the full events projection: exactly-once delivery
    means the JDBC read-back equals the source rows exactly — any
    dropped batch, duplicate publish, or JDBC type-mapping drift
    (DOUBLE/BIGINT round-trip) breaks the value hash. Multi-batch by
    construction (3 files × maxFilesPerTrigger=1), so the ledger
    sequences real transactions. At 100 TB the stage write is the
    parallel executor path; the publish transaction moves rows
    database-side in O(1) statements.""",
)
def s17_streaming_jdbc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.streaming.jobs import (
        run_foreach_batch_jdbc_append,
    )

    rows = read_table(spark, sf_dir, "events").select(
        "user_id",
        ts_micros("ts").alias("us"),
        "event_id",
        "event_type",
        "value",
    )
    # ONE embedded Derby database per process, cleaned at exit; each
    # invocation gets its own table prefix — repeated bench/sweep
    # passes must not boot (and leak) a fresh database each time, and
    # the returned JDBC read is lazy, so the database has to outlive
    # this call.
    url, prefix = _s17_db(spark)
    return run_foreach_batch_jdbc_append(
        spark,
        rows,
        url,
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        prefix=prefix,
    )


import threading as _threading  # noqa: E402

_S17_DB: dict = {"db": None, "n": 0}
_S17_LOCK = _threading.Lock()


def _s17_db(spark: SparkSession) -> tuple[str, str]:
    import atexit
    import os
    import shutil
    import tempfile

    # lock around the check-then-act AND the counter bump: concurrent
    # invocations (a threaded sweep) must neither double-create the
    # database nor share a table prefix — a shared prefix would let one
    # stream publish the other's staged rows under its own batch_id,
    # breaking the zero-duplicates contract this entry demonstrates
    with _S17_LOCK:
        if _S17_DB["db"] is None:
            root = tempfile.mkdtemp(prefix="s17db_")
            db = os.path.join(root, "serving")
            _S17_DB["db"] = db

            def _cleanup(root: str = root, db: str = db) -> None:
                try:  # Derby shutdown SIGNALS success via SQLException 08006
                    spark._jvm.java.sql.DriverManager.getConnection(
                        f"jdbc:derby:{db};shutdown=true"
                    )
                except Exception:
                    pass
                shutil.rmtree(root, ignore_errors=True)

            atexit.register(_cleanup)
        _S17_DB["n"] += 1
        return f"jdbc:derby:{_S17_DB['db']};create=true", f"s17_{_S17_DB['n']}"


# ===========================================================================
# s18 — streaming quality gate (x95's learned classifier in-stream)
# ===========================================================================

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_llm import (  # noqa: E402
    _X95_ORACLE,
    _X95_SCORE_SPARK,
)


@register(
    "s18_streaming_quality_gate",
    _X95_ORACLE,
    doc="""x95's learned linear quality classifier run as a REAL
    streaming query — the shape of a continuous-ingestion corpus
    filter: newly crawled documents stream in (file source), the
    hashed-feature dot-product scores each row as the same narrow
    per-row fold (stateless — no watermark, no join, the score needs
    only the row), and a per-source running (n_docs, n_keep) aggregate
    maintains the keep-rate audit in complete mode. Shares x95's
    oracle verbatim: at Trigger.AvailableNow over the full file the
    running aggregate equals the batch answer — which is exactly the
    invariant that makes a streaming gate trustworthy.

    Scale: per-row scoring is embarrassingly parallel with zero state;
    the only stateful piece is the |sources|-row aggregate. On a live
    feed the same query runs unmodified with a processing-time
    trigger; the keep decision per document (score >= 0) would feed a
    foreachBatch router in production.""",
)
def s18_streaming_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    read_table(spark, sf_dir, "documents")  # sets raw-read confs if needed
    leaf = "documents.parquet"
    glob = os.path.join(sf_dir, f"[{leaf[0]}]{leaf[1:]}")
    stream = (
        spark.readStream.schema("source string, text string")
        .format("parquet")
        .load(glob)
    )
    agg = (
        stream.select("source", F.expr(_X95_SCORE_SPARK).alias("score"))
        .groupBy("source")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
            F.expr(
                "CAST(SUM(CASE WHEN score >= 0 THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_keep"),
        )
    )
    out = _drain_to_memory(agg, "complete", "stream_quality")
    return out.select(
        "source",
        "n_docs",
        "n_keep",
        F.expr("CAST((1000000 * n_keep) div n_docs AS BIGINT)").alias(
            "keep_rate_ppm"
        ),
    )


# ===========================================================================
# s19 — streaming corpus pipeline (dedup → quality gate → rollup in-stream)
# ===========================================================================

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.text import (  # noqa: E402
    sql_token_count_duck as _s19_toks_duck,
    token_count as _s19_token_count,
)
from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_pipeline import (  # noqa: E402
    _SCORE_DUCK as _S19_SCORE_DUCK,  # x95's scoring fold, DuckDB rendering
)

_S19_ORACLE = f"""
    WITH base AS (SELECT doc_id, source, text FROM documents),
    ing AS (
        SELECT doc_id, source, text FROM base
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, source, text
        FROM base WHERE doc_id % 13 = 0
    ),
    ded AS (
        SELECT source, text
        FROM (SELECT source, text, ROW_NUMBER() OVER (
                  PARTITION BY source, md5(text) ORDER BY doc_id) AS __r
              FROM ing)
        WHERE __r = 1
    ),
    kept AS (SELECT source, text FROM ded WHERE {_S19_SCORE_DUCK} >= 0)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
           CAST(SUM({_s19_toks_duck('text')}) AS BIGINT) AS tokens_kept
    FROM kept
    GROUP BY source
"""


@register(
    "s19_streaming_corpus_pipeline",
    _S19_ORACLE,
    doc="""The corpus pipeline's STREAMING leg — x104 proves the batch
    stages compose as one lazy DAG; this entry proves the stateful
    core of the same chain composes as ONE streaming query: a document
    stream (file source, self-unioned with the re-crawl overlap so the
    dedup state does real work) flows through streaming exact dedup
    (dropDuplicates on (source, md5 fingerprint) — ~16 bytes of state
    per distinct text per source, never the text) → x95's stateless
    quality-gate filter (same weight literal and fold) → a per-source
    running (kept docs, kept tokens) rollup in complete mode. Two
    chained stateful operators in one query. The output is
    deterministic even though streaming dedup keeps an ARBITRARY
    arrival per key: the dedup key CONTAINS every column the rollup
    groups by, so the aggregates are winner-independent BY
    CONSTRUCTION, for any data — the design rule for composing dedup
    into a streaming pipeline (downstream may only depend on the
    deduped content plus the dedup key, never on surviving row
    identity; sf0.1 really does hold cross-source exact duplicates, so
    a fingerprint-only key would be arrival-order-dependent — ADVICE
    r8, pinned by tests/test_s19_determinism.py).

    Scale: dedup state is fingerprint-sized; on a live feed the same
    query bounds it with dropDuplicatesWithinWatermark (s06's
    horizon); the rollup state is |sources| rows; the gate is
    stateless per-row codegen.""",
)
def s19_streaming_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    read_table(spark, sf_dir, "documents")  # sets raw-read confs if needed
    leaf = "documents.parquet"
    glob = os.path.join(sf_dir, f"[{leaf[0]}]{leaf[1:]}")

    def _src():
        return (
            spark.readStream.schema("doc_id bigint, source string, text string")
            .format("parquet")
            .load(glob)
        )

    base = _src()
    recrawl = _src().filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "source", "text"
    )
    ded = (
        base.unionByName(recrawl)
        .withColumn("fingerprint", F.md5("text"))
        # the dedup key INCLUDES the downstream rollup key: streaming
        # dropDuplicates keeps an arbitrary winner, so every column an
        # aggregate later groups by must be part of the key or the
        # output is nondeterministic. sf0.1 documents really does
        # contain cross-source exact duplicates (8 groups — ADVICE r8,
        # pinned by tests/test_s19_determinism.py), so fingerprint-only
        # dedup would make the per-source counts arrival-order-
        # dependent there. State cost is unchanged: (source,
        # fingerprint) is ~16 bytes + a short source tag per distinct
        # text per source.
        .dropDuplicates(["source", "fingerprint"])
    )
    kept = ded.filter(F.expr(f"({_X95_SCORE_SPARK}) >= 0"))
    agg = kept.groupBy("source").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs_kept"),
        F.sum(_s19_token_count(F.col("text"))).cast("long").alias("tokens_kept"),
    )
    return _drain_to_memory(agg, "complete", "stream_pipeline")


# ===========================================================================
# s20 — streaming RAG chunk ingestion (x106's chunker in-stream)
# ===========================================================================

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_rag import (  # noqa: E402
    _CHUNK_S as _S20_S,
    _CHUNK_W as _S20_W,
    _TOKS_DUCK as _S20_TOKS,
)

_S20_ORACLE = f"""
    WITH d AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w,
               {_S20_TOKS} AS n
        FROM documents
    ),
    e AS (
        SELECT doc_id, w, n,
               CASE WHEN n <= {_S20_W} THEN 0
                    ELSE (n - {_S20_W} + {_S20_S} - 1) // {_S20_S}
               END AS n_extra
        FROM d
    ),
    c AS (
        SELECT doc_id, w, n,
               unnest([i FOR i IN range(0, n_extra + 1)]) AS chunk_ix
        FROM e
    )
    SELECT doc_id,
           CAST(chunk_ix AS BIGINT) AS chunk_ix,
           CAST(1 + chunk_ix * {_S20_S} AS BIGINT) AS start_tok,
           CAST(GREATEST(LEAST({_S20_W},
                               n - (1 + chunk_ix * {_S20_S}) + 1), 0)
                AS BIGINT) AS n_toks_in_chunk,
           COALESCE(array_to_string(
               w[(1 + chunk_ix * {_S20_S}):
                 (chunk_ix * {_S20_S}
                  + GREATEST(LEAST({_S20_W},
                                   n - (1 + chunk_ix * {_S20_S}) + 1), 0))],
               ' '), '') AS chunk_text
    FROM c
"""


@register(
    "s20_streaming_rag_chunking",
    _S20_ORACLE,
    doc="""x106's RAG chunker run as a REAL append-mode streaming
    query — the ingestion leg of a live retrieval index: newly crawled
    documents stream in (file source) and each emits its 64/48
    sliding-window chunks downstream, including chunk TEXT. The
    transform is a stateless narrow map (tokenize → integer chunk
    arithmetic → explode → slice), so it is trigger-agnostic: the
    AvailableNow drain equals x106's batch output minus the batch
    entry's seeded empty document (a file stream replays files, not
    synthetic unions), which is exactly what the oracle checks.

    Scale: zero streaming state — chunk emission parallelizes with
    the source's file partitioning; on a live feed the same query
    feeds the embedding stage via foreachBatch (the s08 sink shape)
    with no watermark needed (nothing aggregates).""",
)
def s20_streaming_rag_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    read_table(spark, sf_dir, "documents")  # sets raw-read confs if needed
    leaf = "documents.parquet"
    glob = os.path.join(sf_dir, f"[{leaf[0]}]{leaf[1:]}")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .format("parquet")
        .load(glob)
    )
    d = stream.select(
        "doc_id",
        F.expr(r"split(trim(text), '\\s+')").alias("w"),
        F.expr(
            "CASE WHEN trim(text) = '' THEN 0"
            r" ELSE size(split(trim(text), '\\s+')) END"
        ).cast("bigint").alias("n"),
    ).withColumn(
        "n_extra",
        F.expr(
            f"CASE WHEN n <= {_S20_W} THEN CAST(0 AS BIGINT)"
            f" ELSE (n - {_S20_W} + {_S20_S} - 1) div {_S20_S} END"
        ),
    )
    c = d.select(
        "doc_id",
        "w",
        "n",
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("n_extra"))).alias(
            "chunk_ix"
        ),
    )
    start = f"(1 + chunk_ix * {_S20_S})"
    ln = f"GREATEST(LEAST({_S20_W}, n - {start} + 1), CAST(0 AS BIGINT))"
    chunks = c.selectExpr(
        "doc_id",
        "CAST(chunk_ix AS BIGINT) AS chunk_ix",
        f"CAST({start} AS BIGINT) AS start_tok",
        f"CAST({ln} AS BIGINT) AS n_toks_in_chunk",
        f"array_join(slice(w, CAST({start} AS INT), CAST({ln} AS INT)), ' ')"
        " AS chunk_text",
    )
    return _drain_to_memory(chunks, "append", "stream_chunks")


# ===========================================================================
# s21 — streaming HLL registers (x113's sketch as streaming state)
# ===========================================================================

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_sketch import (  # noqa: E402
    _HLL_2_41 as _S21_2_41,
    _HLL_ALPHA_DUCK as _S21_ALPHA_DUCK,
    _HLL_ALPHA_SPARK as _S21_ALPHA_SPARK,
)

_S21_ORACLE = f"""
    WITH h AS (
        SELECT event_type, user_id,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                   ::UBIGINT::BIGINT AS h
        FROM events
    ),
    reg AS (
        SELECT event_type, h % 256 AS bucket,
               MAX(CASE WHEN h // 256 = 0 THEN 25
                        ELSE 25 - length(bin(h // 256)) END) AS m
        FROM h GROUP BY event_type, h % 256
    ),
    agg AS (
        SELECT event_type,
               CAST(SUM(1::BIGINT << (25 - m)) AS BIGINT) AS t_present,
               CAST(COUNT(*) AS BIGINT) AS n_buckets
        FROM reg GROUP BY event_type
    ),
    ex AS (
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
        FROM events GROUP BY event_type
    )
    SELECT a.event_type,
           e.n_exact,
           CAST(256 - a.n_buckets AS BIGINT) AS v_empty,
           CAST(a.t_present + (256 - a.n_buckets) * 33554432 AS BIGINT)
               AS t_scaled,
           {_S21_ALPHA_DUCK} * {_S21_2_41}
               / (a.t_present + (256 - a.n_buckets) * 33554432)
               AS hll_raw_estimate,
           (256 - a.n_buckets) > 0
               AND 2.0 * ({_S21_ALPHA_DUCK} * {_S21_2_41}
                   / (a.t_present + (256 - a.n_buckets) * 33554432)) < 1280.0
               AS small_range_regime
    FROM agg a JOIN ex e ON a.event_type = e.event_type
"""


@register(
    "s21_streaming_hll_registers",
    _S21_ORACLE,
    doc="""x113's deterministic HLL sketch run as STREAMING STATE —
    the live distinct-users-per-event-type counter: the event stream
    folds into the (event_type, bucket) → max(rho) register table as
    ONE complete-mode streaming aggregate, and the estimate finish
    (indicator sum, empty-register count, raw estimate, regime flag)
    is batch arithmetic over the drained register table. This is the
    production split: the REGISTERS are the only state the stream
    maintains (≤ 256 rows per group key — max-merge makes every
    micro-batch an associative register merge, the same algebra
    tests/test_sketch_merge.py pins for shards), and the estimate is
    computed at READ time, so one register table serves any
    dashboard cadence without touching the stream. n_exact joins in
    from the batch side so the sketch's error stays visible (the
    150-user toy corpus sits in the flagged small-range regime —
    exactly what the flag is for).

    Scale: state is |event_types|·256 longs FOREVER, regardless of
    event volume — the constant-memory distinct counter that an exact
    streaming dropDuplicates (s06, per-key state) cannot give at
    100 TB/day; no watermark needed (registers never evict, they
    saturate). Spark's own approx_count_distinct cannot run as
    incremental streaming state at all (no mergeable-state surface) —
    re-implementing the registers makes the sketch composable AND
    oracle-checkable.""",
)
def s21_streaming_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    read_table(spark, sf_dir, "events")  # sets nanosAsLong conf if needed
    leaf = "events.parquet"
    glob = os.path.join(sf_dir, f"[{leaf[0]}]{leaf[1:]}")
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp_ntz, user_id bigint, "
            "event_type string, value double, props string"
        )
        .format("parquet")
        .load(glob)
        .select(
            "event_type",
            F.expr(
                "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8),"
                " 16, 10) AS BIGINT)"
            ).alias("h"),
        )
    )
    reg = stream.groupBy(
        "event_type", (F.col("h") % 256).alias("bucket")
    ).agg(
        F.max(
            F.expr(
                "CASE WHEN h div 256 = 0 THEN 25"
                "     ELSE 25 - length(bin(h div 256)) END"
            )
        ).alias("m")
    )
    regs = _drain_to_memory(reg, "complete", "stream_hll")

    agg = regs.groupBy("event_type").agg(
        F.expr("CAST(SUM(shiftleft(1L, 25 - m)) AS BIGINT)").alias("t_present"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_buckets"),
    )
    ex = (
        read_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.expr("CAST(COUNT(DISTINCT user_id) AS BIGINT)").alias("n_exact")
        )
    )
    t_total = "(t_present + (256 - n_buckets) * 33554432)"
    return agg.join(ex, "event_type").select(
        "event_type",
        "n_exact",
        F.expr("CAST(256 - n_buckets AS BIGINT)").alias("v_empty"),
        F.expr(t_total).alias("t_scaled"),
        F.expr(f"{_S21_ALPHA_SPARK} * {_S21_2_41} / {t_total}").alias(
            "hll_raw_estimate"
        ),
        F.expr(
            f"(256 - n_buckets) > 0 AND "
            f"CAST(2.0 AS DOUBLE) * ({_S21_ALPHA_SPARK} * {_S21_2_41}"
            f" / {t_total}) < CAST(1280.0 AS DOUBLE)"
        ).alias("small_range_regime"),
    )


# ===========================================================================
# s22 — streaming latency-histogram quantiles (x114's sketch as state)
# ===========================================================================
# s21 shows the MAX-merge sketch (HLL registers) as streaming state;
# this is the SUM-merge one: per-(event_type, value-bucket) counts as
# ONE complete-mode aggregate (state ≤ |event_types|·1024 rows
# forever), with the p50/p95/p99 finish — integer rank targets and
# within-bucket interpolation in micros, x114's exact arithmetic —
# computed at READ time over the drained register table. The
# production shape of every latency dashboard: the stream maintains
# bucket counts; percentiles are display-side arithmetic at any
# cadence.

_S22_PCTS = (50, 95, 99)
_S22_BUCKET_DUCK = "LEAST(CAST(FLOOR(value) AS BIGINT), 1023)"

_S22_ORACLE = f"""
    WITH b AS (
        SELECT event_type, {_S22_BUCKET_DUCK} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    c AS (
        SELECT event_type, bucket, cnt,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket)
                   AS cum,
               SUM(cnt) OVER (PARTITION BY event_type) AS n
        FROM b
    ),
    p AS (SELECT unnest([{", ".join(str(p) for p in _S22_PCTS)}]) AS pct),
    hit AS (
        SELECT c.event_type, p.pct, c.bucket, c.cnt, c.cum, c.n,
               ROW_NUMBER() OVER (
                   PARTITION BY c.event_type, p.pct ORDER BY c.bucket
               ) AS rn
        FROM c JOIN p ON 100 * c.cum >= p.pct * c.n
    ),
    q AS (
        SELECT event_type, pct, n,
               CAST(bucket * 1000000
                 + (((((pct * n + 99) // 100) - (cum - cnt)) * 1000000)
                    // cnt) AS BIGINT) AS am
        FROM hit WHERE rn = 1
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_rows,
           MAX(CASE WHEN pct = 50 THEN am END) AS p50_micros,
           MAX(CASE WHEN pct = 95 THEN am END) AS p95_micros,
           MAX(CASE WHEN pct = 99 THEN am END) AS p99_micros
    FROM q GROUP BY event_type
"""


@register(
    "s22_streaming_histogram_quantiles",
    _S22_ORACLE,
    doc="""x114's histogram quantile sketch as STREAMING STATE — the
    live latency dashboard: the event stream folds into per-
    (event_type, unit-width value bucket) counts as ONE complete-mode
    aggregate, and p50/p95/p99 are computed at READ time over the
    drained bucket table with x114's exact integer rank/interpolation
    arithmetic. s21 is the MAX-merge sketch (HLL registers); this is
    the SUM-merge one — together they pin that both mergeable-sketch
    algebras run as incremental streaming state with a batch-oracle-
    checkable finish.

    Scale: state is ≤ |event_types|·1024 longs FOREVER regardless of
    event volume (no watermark needed — buckets saturate, never
    evict); every micro-batch is a bucket-wise count merge, the same
    associativity tests/test_sketch_merge.py pins for shards. The
    finish never touches the stream: one register table serves any
    dashboard cadence. Accuracy contract: ±1 value unit (bucket
    width), vs approx_percentile's opaque engine-internal t-digest
    that cannot run as incremental streaming state at all.""",
)
def s22_streaming_histogram_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os

    read_table(spark, sf_dir, "events")  # sets nanosAsLong conf if needed
    leaf = "events.parquet"
    glob = os.path.join(sf_dir, f"[{leaf[0]}]{leaf[1:]}")
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp_ntz, user_id bigint, "
            "event_type string, value double, props string"
        )
        .format("parquet")
        .load(glob)
        .select(
            "event_type",
            F.expr("LEAST(CAST(FLOOR(value) AS BIGINT), 1023L)").alias(
                "bucket"
            ),
        )
    )
    reg = stream.groupBy("event_type", "bucket").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("cnt")
    )
    regs = _drain_to_memory(reg, "complete", "stream_hist")

    from pyspark.sql import Window as W

    w_cum = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy("event_type")
    c = regs.select(
        "event_type", "bucket", "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    pcts = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in _S22_PCTS])).alias("pct")
    )
    hit = c.join(pcts, F.expr("100 * cum >= pct * n"))
    w_first = W.partitionBy("event_type", "pct").orderBy("bucket")
    q = (
        hit.withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") == 1)
        .select(
            "event_type", "pct", "n",
            F.expr(
                "CAST(bucket * 1000000"
                " + ((((pct * n + 99) div 100) - (cum - cnt)) * 1000000)"
                " div cnt AS BIGINT)"
            ).alias("am"),
        )
    )
    return q.groupBy("event_type").agg(
        F.expr("CAST(MAX(n) AS BIGINT)").alias("n_rows"),
        F.max(F.when(F.col("pct") == 50, F.col("am"))).alias("p50_micros"),
        F.max(F.when(F.col("pct") == 95, F.col("am"))).alias("p95_micros"),
        F.max(F.when(F.col("pct") == 99, F.col("am"))).alias("p99_micros"),
    )


# ===========================================================================
# s23 — streaming PII scrub + audit (x116's compliance pass in-stream)
# ===========================================================================

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_feats import (  # noqa: E402
    _X116_ORACLE,
    _X116_PAT,
)


@register(
    "s23_streaming_pii_scrub",
    _X116_ORACLE,
    doc="""x116's PII redaction + completeness audit as a REAL
    streaming query — the compliance shape of a continuous-ingestion
    pipeline: documents stream in (file source), each row is
    deterministically salted with synthetic emails (x91's
    generator-as-contract — the synthetic corpus holds no real PII),
    scrubbed with the same char-class-only email regex (Java and RE2
    agree by construction), and a per-source complete-mode aggregate
    maintains the audit: redaction count, RESIDUAL matches after the
    scrub (zero, proven in-data), and changed-document count. Shares
    x116's oracle verbatim: at Trigger.AvailableNow the running audit
    equals the batch answer — the invariant that lets one audit query
    serve both the backfill and the live feed.

    Scale: synth+scrub+count is a stateless narrow projection (two
    regex evaluations per row, zero state); the only stateful piece is
    the |sources|-row aggregate. On a live feed the same query runs
    unmodified with a processing-time trigger, with scrubbed text
    routed to the corpus sink via foreachBatch in production.""",
)
def s23_streaming_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    read_table(spark, sf_dir, "documents")  # sets raw-read confs if needed
    leaf = "documents.parquet"
    glob = os.path.join(sf_dir, f"[{leaf[0]}]{leaf[1:]}")
    stream = (
        spark.readStream.schema("doc_id bigint, source string, text string")
        .format("parquet")
        .load(glob)
    )
    synth = stream.select(
        "source",
        F.expr(
            "CONCAT(text, ' contact user', doc_id, '@example.com',"
            " CASE WHEN doc_id % 3 = 0"
            " THEN CONCAT(' and admin', doc_id, '@mail.example.org')"
            " ELSE '' END, ' now')"
        ).alias("synth_text"),
    )
    scrubbed = synth.withColumn(
        "clean_text",
        F.expr(f"regexp_replace(synth_text, '{_X116_PAT}', '<EMAIL>')"),
    )
    agg = scrubbed.groupBy("source").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
        F.expr(
            f"CAST(SUM(regexp_count(synth_text, '{_X116_PAT}')) AS BIGINT)"
        ).alias("n_redactions"),
        F.expr(
            f"CAST(SUM(regexp_count(clean_text, '{_X116_PAT}')) AS BIGINT)"
        ).alias("n_residual"),
        F.expr(
            "CAST(SUM(CASE WHEN clean_text <> synth_text THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("n_docs_changed"),
    )
    return _drain_to_memory(agg, "complete", "stream_pii")


# ===========================================================================
# s24 — streaming k-anonymity monitor (x119's audit over streaming state)
# ===========================================================================

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_r10 import (  # noqa: E402
    _X119_ORACLE,
    k_anonymity_report,
)


@register(
    "s24_streaming_k_anonymity",
    _X119_ORACLE,
    doc="""x119's k-anonymity audit as a CONTINUOUS compliance monitor:
    customer records stream in (file source), the equivalence-class
    sizes over the quasi-identifier tuple (nation, segment, balance
    band) are maintained as complete-mode streaming state, and the
    risk read-out (per-k small-class/rows-at-risk counts, achieved
    anonymity level) is x119's IMPORTED finish applied at read time —
    the s21/s22 pattern: the streaming state is the mergeable core
    (class counts sum across micro-batches), the report is a bounded
    batch finish on the drained state. Shares x119's oracle verbatim:
    at Trigger.AvailableNow the monitored audit equals the batch
    answer, which is what lets one risk dashboard serve backfill and
    live ingestion.

    Scale: state is |classes| rows (QI-domain-bounded, NOT corpus-
    bounded) — the aggregation state every ingestion monitor of this
    shape keeps; the finish never touches the fact stream.""",
)
def s24_streaming_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    read_table(spark, sf_dir, "customer")  # sets raw-read confs if needed
    leaf = "customer.parquet"
    glob = os.path.join(sf_dir, f"[{leaf[0]}]{leaf[1:]}")
    stream = (
        spark.readStream.schema(
            "c_nationkey int, c_mktsegment string, c_acctbal double"
        )
        .format("parquet")
        .load(glob)
    )
    cls = stream.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.expr("CAST(FLOOR(c_acctbal / 1000) AS BIGINT)").alias("band"),
    ).agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("sz"))
    state = _drain_to_memory(cls, "complete", "stream_kanon")
    return k_anonymity_report(state)


# ===========================================================================
# s25 — streaming negative-sampling table (x123's counts as state)
# ===========================================================================

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_r10 import (  # noqa: E402
    _X123_ORACLE,
)


@register(
    "s25_streaming_negative_sampling",
    _X123_ORACLE,
    doc="""x123's negative-sampling distribution maintained over a
    document stream: per-token counts are the complete-mode streaming
    state (the mergeable core — counts sum across micro-batches), and
    the ^0.75 smoothing + totals + top-50 finish is applied to the
    drained state at read time (the s21/s22/s24 pattern). Shares
    x123's oracle verbatim: at Trigger.AvailableNow the continuously-
    maintained table equals the batch answer — so the sampling table a
    trainer reads can be kept fresh by ingestion instead of rebuilt
    per epoch.

    Scale: state is |vocab| rows (sublinear in the corpus by Heaps'
    law); the smoothing finish never touches the token stream.""",
)
def s25_streaming_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    read_table(spark, sf_dir, "documents")  # sets raw-read confs if needed
    leaf = "documents.parquet"
    glob = os.path.join(sf_dir, f"[{leaf[0]}]{leaf[1:]}")
    stream = (
        spark.readStream.schema("text string")
        .format("parquet")
        .load(glob)
    )
    tok = stream.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    ).filter("token <> ''")
    freq = tok.groupBy("token").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("f")
    )
    state = _drain_to_memory(freq, "complete", "stream_negsamp")
    w = state.select(
        "token",
        "f",
        F.expr("CAST(FLOOR(SQRT(f * FLOOR(SQRT(f)))) AS BIGINT)").alias("w"),
    )
    tot = w.groupBy().agg(
        F.expr("CAST(SUM(w) AS BIGINT)").alias("tw"),
        F.expr("CAST(SUM(f) AS BIGINT)").alias("tf"),
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "token",
            F.col("f").alias("n_occurrences"),
            F.col("w").alias("smoothed_weight"),
            F.expr("CAST((1000000 * f) div tf AS BIGINT)").alias("unigram_ppm"),
            F.expr("CAST((1000000 * w) div tw AS BIGINT)").alias("sample_ppm"),
        )
        .orderBy(F.col("smoothed_weight").desc(), F.col("token").asc())
        .limit(50)
    )


# ===========================================================================
# s26 — streaming distinctive-terms extraction (x129's counts as state)
# ===========================================================================

from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_r10 import (  # noqa: E402
    _X129_ORACLE,
)


@register(
    "s26_streaming_distinctive_terms",
    _X129_ORACLE,
    doc="""x129's per-source distinctive-terms table maintained over a
    document stream: the (source, token) counts are the complete-mode
    streaming state (mergeable — counts sum across micro-batches), and
    the margin joins, widened share-lift division, and per-source
    top-3 run as x129's finish on the drained state at read time.
    Shares x129's oracle verbatim: at Trigger.AvailableNow the
    continuously-maintained data card equals the batch answer, so
    "what is each source about" stays fresh under ingestion without a
    nightly rebuild.

    Scale: state is |sources|×|vocab| rows (vocab sublinear by Heaps'
    law); the finish never touches the token stream — same posture as
    s21/s22/s24/s25's mergeable-state + bounded-finish pattern.""",
)
def s26_streaming_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.skew import (
        grouped_topk,
    )

    read_table(spark, sf_dir, "documents")  # sets raw-read confs if needed
    leaf = "documents.parquet"
    glob = os.path.join(sf_dir, f"[{leaf[0]}]{leaf[1:]}")
    stream = (
        spark.readStream.schema("source string, text string")
        .format("parquet")
        .load(glob)
    )
    tok = stream.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    ).filter("token <> ''")
    counts = tok.groupBy("source", "token").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("c")
    )
    # checkpoint the drained state: four finish consumers (margins,
    # total, filter side) would otherwise self-join the memory-sink
    # VIEW, which trips conflicting-reference resolution — and the
    # q54 materialize-once rationale applies anyway (|src|×|vocab| rows)
    st = _drain_to_memory(
        counts, "complete", "stream_distinct_terms"
    ).localCheckpoint(eager=True)
    stot = st.groupBy("source").agg(F.expr("CAST(SUM(c) AS BIGINT)").alias("ns"))
    ct = st.groupBy("token").agg(F.expr("CAST(SUM(c) AS BIGINT)").alias("ca"))
    tot = st.groupBy().agg(F.expr("CAST(SUM(c) AS BIGINT)").alias("na"))
    r = (
        st.filter("c >= 5")
        .join(F.broadcast(stot), "source")
        .join(ct, "token")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "token",
            F.col("c").alias("n_in_source"),
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * c * na)"
                " div (CAST(ns AS DECIMAL(38,0)) * ca) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )
    return grouped_topk(
        r,
        ["source"],
        [F.col("lift_ppm").desc(), F.col("token").asc()],
        3,
        rank_col="rk",
    ).select(
        "source",
        F.col("rk").cast("long").alias("rank"),
        "token",
        "n_in_source",
        "lift_ppm",
    )


# ===========================================================================
# s27 — streaming count-min sketch (x130's twin; round 11)
# ===========================================================================


from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_sketch import (  # noqa: E402
    _X130_ORACLE as _S27_ORACLE,  # shared VERBATIM — one count-min convention
)


@register(
    "s27_streaming_countmin",
    _S27_ORACLE,
    doc="""x130's count-min sketch run as STREAMING STATE — the live
    n-gram frequency estimator: the bigram stream folds into the
    (r, c) → Σcount cell table as ONE complete-mode streaming
    aggregate (the raw gram stream hashes directly; summing raw
    occurrences ≡ summing the batch side's pre-aggregated
    frequencies), and the heavy-hitter estimate finish joins the
    drained 1,024-cell table against the batch exact counts — x130's
    oracle verbatim, so the streaming path can never drift from the
    batch convention.

    This is the sketch's whole point made executable: state is
    D·W = 1,024 longs FOREVER regardless of stream volume (sum-merge
    makes every micro-batch an associative cell merge — the same
    mergeability tests/test_sketch_merge.py pins for x113's
    registers), where an exact streaming vocabulary count would hold
    per-gram state unbounded at crawl scale. No watermark: cells never
    evict, they accumulate.""",
)
def s27_streaming_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.dedup import (
        word_ngrams_all,
    )
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_sketch import (
        _CM_D,
        _CM_W,
    )

    read_table(spark, sf_dir, "documents")  # sets raw-read confs if needed
    leaf = "documents.parquet"
    glob = os.path.join(sf_dir, f"[{leaf[0]}]{leaf[1:]}")
    stream = (
        spark.readStream.schema("text string")
        .format("parquet")
        .load(glob)
    )
    grams = stream.select(
        F.explode(word_ngrams_all(F.col("text"), 2)).alias("gram")
    )
    hashes = F.array(
        *[
            F.expr(
                f"CAST(conv(substring(md5(concat(gram, '#', '{r}')), 1, 8),"
                f" 16, 10) AS BIGINT) % {_CM_W}"
            )
            for r in range(_CM_D)
        ]
    )
    cells = (
        grams.select(F.posexplode(hashes).alias("r", "c"))
        .groupBy("r", "c")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("cell"))
    )
    sketch = _drain_to_memory(cells, "complete", "stream_cm")

    # batch finish over the drained bounded cell table — x130's shape
    docs = read_table(spark, sf_dir, "documents").select("text")
    bg = docs.select(
        F.explode(word_ngrams_all(F.col("text"), 2)).alias("gram")
    )
    freq = bg.groupBy("gram").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("f")
    )
    hashed = freq.select("gram", "f", F.posexplode(hashes).alias("r", "c"))
    est = (
        hashed.join(F.broadcast(sketch), ["r", "c"])
        .groupBy("gram", "f")
        .agg(F.min("cell").alias("cm_est"))
    )
    return (
        est.select(
            "gram",
            F.col("f").alias("exact_count"),
            "cm_est",
            F.expr(
                "CAST((1000000 * (cm_est - f)) div f AS BIGINT)"
            ).alias("overestimate_ppm"),
        )
        .orderBy(F.col("exact_count").desc(), "gram")
        .limit(30)
    )


# ===========================================================================
# s28 — streaming Bloom filter (x131's twin; round 12)
# ===========================================================================


from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_sketch import (  # noqa: E402
    _X131_ORACLE as _S28_ORACLE,  # shared VERBATIM — one Bloom convention
)


@register(
    "s28_streaming_bloom",
    _S28_ORACLE,
    doc="""x131's Bloom filter built as STREAMING STATE — the live
    corpus-membership tripwire: the standing-corpus document stream
    (doc_id % 10 <> 0) hashes its text fingerprints straight into the
    packed word table as ONE complete-mode bit_or aggregate — state is
    ≤ 33 bigint words FOREVER regardless of stream volume (bit_or
    makes every micro-batch an associative word merge, the same
    algebra test_sketch_merge.py pins batch-side; inserting raw
    per-document fingerprints ≡ inserting the batch side's DISTINCT
    set, because bit_or is idempotent — duplicates set the same bits).
    The probe finish then runs x131's new-batch membership check
    against the drained filter — x131's oracle verbatim, so the
    streaming path can never drift from the batch convention.

    No watermark: bits never evict, they accumulate — exactly how a
    production ingest keeps "what has the corpus already seen" current
    without holding per-key state (the unbounded-vocabulary problem
    the sketch exists to avoid).""",
)
def s28_streaming_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.bloom import (
        WORD_BITS,
        _pos_sql,
        with_bloom_hit,
    )
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_sketch import (
        _BLOOM_K,
        _BLOOM_M,
    )

    read_table(spark, sf_dir, "documents")  # sets raw-read confs if needed
    leaf = "documents.parquet"
    glob = os.path.join(sf_dir, f"[{leaf[0]}]{leaf[1:]}")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .format("parquet")
        .load(glob)
    )
    corp_fp = stream.filter(F.col("doc_id") % 10 != 0).select(
        F.md5(F.col("text")).alias("fp")
    )
    pos = corp_fp.select(
        F.explode(
            F.array(
                *[F.expr(_pos_sql("fp", r, _BLOOM_M)) for r in range(_BLOOM_K)]
            )
        ).alias("pos")
    )
    words_stream = pos.groupBy(
        F.expr(f"pos div {WORD_BITS}").alias("w")
    ).agg(
        F.expr(
            f"bit_or(shiftleft(CAST(1 AS BIGINT),"
            f" CAST(pos % {WORD_BITS} AS INT)))"
        ).alias("bits")
    )
    words = _drain_to_memory(words_stream, "complete", "stream_bloom")

    # batch probe finish over the drained ≤33-word filter — x131's shape
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    fp = F.md5(F.col("text")).alias("fp")
    newd = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id", fp)
    corp = docs.filter(F.col("doc_id") % 10 != 0).select(fp).distinct()
    probed = with_bloom_hit(newd, "fp", words, _BLOOM_M, _BLOOM_K)
    exact = corp.withColumnRenamed("fp", "__cfp")
    return (
        probed.join(exact, probed["fp"] == exact["__cfp"], "left")
        .select(
            "doc_id",
            F.col("bloom_hit").cast("long").alias("bloom_hit"),
            F.when(F.col("__cfp").isNotNull(), 1)
            .otherwise(0)
            .cast("long")
            .alias("in_corpus"),
        )
        .orderBy("doc_id")
    )


# ===========================================================================
# s29 — streaming NEAR-dup audit against the standing corpus (round 13)
# ===========================================================================


def _s29_oracle() -> str:
    # x40's oracle VERBATIM (house rule for streaming twins: the oracle
    # is shared with the batch form, so a MATCH proves the streamed
    # multi-batch execution equals the one-shot batch semantics)
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.plans.catalog_llm import (
        _INCR_DEDUP_ORACLE,
    )

    return _INCR_DEDUP_ORACLE


@register(
    "s29_streaming_neardup_dedup",
    _s29_oracle(),
    doc="""Streaming NEAR-duplicate audit — the streaming twin of
    batch x40's near tier and the dedup ladder's last streaming
    asymmetry (VERDICT r12 item 5): s11 streams the EXACT tier and
    s28 streams the Bloom words, but until now a new-docs stream was
    never checked for near-duplicates (Jaccard ≥ 0.2 shingle overlap)
    against the standing corpus. Runs as a REAL multi-batch streaming
    query: the increment (doc_id % 10 = 0) is written as 3 files and
    drained through maxFilesPerTrigger=1, each micro-batch running
    the batch operator (distinct-text collapse + md5 exact tier +
    shingle inverted-index near tier) against the STATIC corpus frame
    via foreachBatch, flags landing in a batch-id-keyed parquet sink
    (redelivery overwrites its own directory — idempotent). Summary
    re-aggregates the sink batch-side into x40's exact columns.

    NO streaming state: flags are per-TEXT properties against a
    standing index, so the result is independent of micro-batching —
    the oracle is x40's VERBATIM relational text, making the gate
    MATCH a proof that 3-batch streamed execution ≡ one-shot batch.
    At 100 TB the corpus shingle index is the standing distinct-text
    table (bucketed on shingle in production); per-batch cost scales
    with the increment's true overlap, nothing accumulates in any
    state store, and the corpus never self-joins
    (streaming/jobs.run_foreach_batch_neardup).""",
)
def s29_streaming_neardup_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_etl_pipeline_financial_streamlit_dashboard_spark.streaming.jobs import (
        run_foreach_batch_neardup,
    )

    docs = read_table(spark, sf_dir, "documents")
    new_batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    flags = run_foreach_batch_neardup(
        spark, new_batch, corpus, prefix="s29", n=3, threshold=0.2
    )
    return flags.groupBy("source").agg(
        F.count("*").alias("n_new"),
        F.sum(F.col("dup_exact").cast("int")).cast("long").alias("n_exact_dup"),
        F.sum(F.col("dup_near").cast("int")).cast("long").alias("n_near_dup"),
        F.sum(
            (~F.col("dup_exact") & ~F.col("dup_near")).cast("int")
        ).cast("long").alias("n_kept"),
    )
