package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming micro-surface (SURVEY §2.5 "streaming"): the
  * reference has no true streaming — its async flow is poll-based batch
  * (O2) and its incrementality is the `_since` cursor (M4). This module
  * is the streaming twin: NDJSON file source → event-time watermark →
  * tumbling-window aggregate. Unit-tested (StreamingSpec); excluded
  * from the DuckDB oracle by design (SURVEY §5.1).
  *
  * Scale notes: the file source at 100 TB becomes Kafka/object-store
  * notifications, but the query shape is identical; watermark bounds
  * state size, and the shuffle keys on (window, event_type) — bounded
  * cardinality per trigger.
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** NDJSON directory → per-type 1-minute tumbling counts/sums, late
    * data tolerated up to 2 minutes. */
  def windowedCounts(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .json(inputDir)
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("w_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact dedup — the streaming twin of q_dedup: drop
    * replayed events by id, keeping state only inside the watermark
    * horizon (`dropDuplicatesWithinWatermark`), so the dedup map is
    * bounded by event-rate × delay instead of growing forever — the
    * difference between a pipeline that survives months of uptime and
    * one that OOMs. At-least-once sources (Kafka, retried file
    * listings) make this the first stage of every streaming ingest.
    */
  def dedupStream(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .json(inputDir)
      .withWatermark("ts", "2 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming exact DAU — the streaming twin of q_stickiness's daily
    * active count: collapse to the FIRST event per (user, day), then a
    * 1-day tumbling count. Exactly one row per user-day reaches the
    * counter, so the windowed count IS the exact distinct-actives
    * figure — no distinct-aggregation state and no sketch error; the
    * trailing WAU/MAU ratios stay a batch rollup over these per-day
    * outputs (the mergeability property the batch side proves for its
    * sketches applies trivially to exact DAU).
    *
    * The dedup horizon is sized to the KEY'S NATURAL DWELL, not to the
    * lateness tolerance: `dropDuplicatesWithinWatermark` evicts a
    * (user, day) entry once the watermark passes its timestamp plus
    * the delay, so a 2-minute delay would forget a morning-active user
    * by afternoon and re-count them (exactness would hold only for
    * per-user event gaps ≤ the delay). Two same-day events are at most
    * 24h apart in event time, so a 25-hour delay keeps every user-day
    * key alive until the day can no longer recur — the day itself plus
    * an hour of lateness. State is therefore bounded by TWO days of
    * distinct actives (yesterday's keys draining while today's fill),
    * independent of stream length; the cost is that a day's count
    * finalizes ~25h of event time after it closes, which is inherent
    * to exact end-of-day figures (preliminary intraday counts come
    * from update-mode sinks, not from loosening the horizon).
    */
  def dailyActives(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .json(inputDir)
      .withColumn("day", to_date(col("ts")))
      .withWatermark("ts", "25 hours")
      .dropDuplicatesWithinWatermark("user_id", "day")
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("dau"))
      .select(col("window.start").cast("date").as("day"), col("dau"))

  /** Native session windows — the built-in twin of
    * [[StatefulSessionizer]]: group each user's events into sessions
    * separated by a `gap` of inactivity using `session_window`, which
    * MERGES windows as events arrive (two events 3 minutes apart under
    * a 5-minute gap become one session spanning both) — the dynamic
    * window shape tumbling windows can't express. Sessions finalize
    * when the watermark passes the session end + gap, i.e. when no
    * event can still extend them.
    *
    * Bounded state: open-session state is keyed (user_id, window) and
    * evicted at watermark, so it is bounded by concurrently-active
    * users × (gap + allowed lateness) of event time — never by stream
    * length. Prefer this over the custom
    * `flatMapGroupsWithState` sessionizer wherever plain
    * gap-sessionization is the requirement; the custom operator earns
    * its state management only for semantics `session_window` lacks
    * (per-event session ids mid-session, custom timeout actions).
    */
  def sessionWindows(spark: SparkSession, inputDir: String,
      gap: String = "5 minutes", lateness: String = "10 minutes"): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .json(inputDir)
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("n_events"), col("sum_value"))

  /** Stream-static enrich — the dimension-lookup stage of every
    * streaming ingest (the streaming twin of
    * [[graft.transform.RefCoreQueries.lookupEnrich]]): join each
    * micro-batch against a bounded static dimension, broadcast so the
    * stream never shuffles and no streaming state is kept (unlike
    * stream-stream joins, a static join needs no watermark buffering).
    * Spark re-plans the static side per micro-batch, so a refreshed
    * dim table is picked up without restarting the query. Misses are
    * kept with a default weight (left join) — the drop-on-miss policy
    * is the batch pipeline's P14; a stream drops nothing silently.
    */
  def enrichStream(spark: SparkSession, inputDir: String, dim: DataFrame): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .json(inputDir)
      .join(broadcast(dim), Seq("event_type"), "left")
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        col("value"),
        coalesce(col("weight"), lit(0.0)).as("weight"),
        (col("value") * coalesce(col("weight"), lit(0.0))).as("weighted"))

  /** Stream-STREAM interval join — the correlation stage two live
    * feeds need (impression ⋈ conversion, request ⋈ response): match
    * each click to ALL of the same user's views in the preceding
    * 10 minutes (a click preceded by two in-window views emits two
    * rows — downstream pairs carry lag_sec, so a "most recent only"
    * consumer takes min(lag_sec) per click in its own aggregation;
    * folding that top-1 into the join itself would re-introduce
    * per-key ordering state the interval join exists to avoid).
    * Both sides are watermarked and the join condition carries an
    * EVENT-TIME RANGE, which is what lets Spark evict buffered rows:
    * state per side is bounded by rate × (watermark + interval), not
    * by stream length. An equi-join on user_id alone (no time bound)
    * would be rejected for exactly that reason in append mode.
    *
    * Scale shape: state keys on user_id — the same bounded-key
    * argument as the batch as-of join (q_asof_join); the interval
    * filter runs inside the join, so nothing buffers past the horizon.
    */
  /** One side of the interval joins below: schema'd NDJSON stream,
    * per-side column renames, the shared 2-minute watermark. Both
    * joins are documented as twins over the same feeds — one source
    * builder keeps their watermark/schema in lockstep. */
  private def intervalSource(spark: SparkSession, d: String, side: String): DataFrame =
    spark.readStream.schema(eventSchema).json(d)
      .select(
        col("event_id").as(s"${side}_id"),
        col("user_id").as(s"${side}_user"),
        col("ts").as(s"${side}_ts"),
        col("value").as(s"${side}_value"))
      .withWatermark(s"${side}_ts", "2 minutes")

  def clickAfterView(spark: SparkSession, viewDir: String, clickDir: String): DataFrame = {
    def src(d: String, side: String): DataFrame = intervalSource(spark, d, side)
    src(viewDir, "v").join(
      src(clickDir, "c"),
      expr("""v_user = c_user AND
              c_ts >= v_ts AND
              c_ts <= v_ts + interval 10 minutes"""))
      .select(col("c_id"), col("v_id"), col("c_user").as("user_id"),
        col("v_ts"), col("c_ts"),
        (col("c_ts").cast("double") - col("v_ts").cast("double"))
          .as("lag_sec"))
  }

  /** Stream-stream LEFT OUTER interval join — the conversion-funnel
    * completion of [[clickAfterView]]: a view with in-window clicks
    * emits one row PER MATCHING CLICK as each click arrives (the same
    * fan-out contract as the inner join — a per-view top-1 would
    * re-introduce the ordering state the interval join avoids; an
    * exactly-one-row-per-view consumer aggregates max(converted) by
    * v_id downstream). A view with NO in-window click emits exactly
    * one null-click row, and only once the watermark proves no click
    * can still come. That deferred-null emission is the semantic that
    * separates outer stream joins from inner ones: correctness
    * depends on event time having PASSED, so rows for quiet users
    * appear exactly one watermark-delay after their window closes —
    * the standard abandonment/no-conversion feed. State stays bounded
    * by the same rate × (watermark + interval) argument as the inner
    * join.
    */
  def viewOutcomes(spark: SparkSession, viewDir: String, clickDir: String): DataFrame = {
    def src(d: String, side: String): DataFrame = intervalSource(spark, d, side)
    src(viewDir, "v").join(
      src(clickDir, "c"),
      expr("""v_user = c_user AND
              c_ts >= v_ts AND
              c_ts <= v_ts + interval 10 minutes"""),
      "leftOuter")
      .select(
        col("v_id"), col("v_user").as("user_id"), col("v_ts"),
        col("c_id"),
        when(col("c_id").isNotNull, 1L).otherwise(0L).as("converted"))
  }
}
