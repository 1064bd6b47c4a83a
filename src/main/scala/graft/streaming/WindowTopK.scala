package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming top-k ("trending event types per minute") with BOUNDED
  * state and append-mode output — the rank-inside-a-window query
  * Structured Streaming cannot express declaratively (window functions
  * are unsupported on streams, and complete-mode `orderBy.limit`
  * retains every window ever seen). Instead the window is the
  * `flatMapGroupsWithState` KEY: counts accumulate per (window, type)
  * in a small map, and when the event-time watermark passes the window
  * end, the state ranks its own map, emits the top k rows, and frees
  * itself — the [[StatefulSessionizer]] idiom pointed at aggregation
  * rather than sessionization.
  *
  * Scale notes: state is O(open windows × distinct types per window) —
  * watermark-bounded on the window axis, domain-bounded on the type
  * axis (a high-cardinality dimension would swap the map for a
  * space-saving/Count-Min summary inside the SAME state seam, emitting
  * approximate top-k; the dataflow and timeout plumbing don't change).
  * The shuffle keys on the window start only; ranking touches k + m
  * entries per closed window, never a corpus.
  */
object WindowTopK {

  final case class TypeCounts(counts: Map[String, Long])
  final case class Trend(w_start: Timestamp, event_type: String, n: Long, rk: Int)

  val WindowMs: Long = 60 * 1000L

  private def update(k: Int)(
      wStart: Timestamp,
      rows: Iterator[(Timestamp, String, Timestamp)],
      state: GroupState[TypeCounts]): Iterator[Trend] = {
    if (state.hasTimedOut) {
      // watermark passed the window end: rank, emit, free
      val top = state.get.counts.toSeq
        .sortBy { case (t, n) => (-n, t) } // count desc, type asc — total order
        .take(k)
        .zipWithIndex
        .map { case ((t, n), i) => Trend(wStart, t, n, i + 1) }
      state.remove()
      top.iterator
    } else {
      val cur = state.getOption.map(_.counts).getOrElse(Map.empty[String, Long])
      val upd = rows.foldLeft(cur) { case (m, (_, t, _)) =>
        m.updated(t, m.getOrElse(t, 0L) + 1L)
      }
      state.update(TypeCounts(upd))
      // fires once the WATERMARK (not wall clock) passes window end
      state.setTimeoutTimestamp(wStart.getTime + WindowMs)
      Iterator.empty
    }
  }

  /** NDJSON event stream → top-k event types per closed 1-minute
    * window (append mode; rows emit when the watermark closes the
    * window, ranked by count desc then type). */
  def trending(spark: SparkSession, inputDir: String, k: Int = 3): Dataset[Trend] = {
    import spark.implicits._
    spark.readStream
      .schema(EventStream.eventSchema)
      .json(inputDir)
      .withWatermark("ts", "2 minutes")
      // the watermarked ts column must survive the projection — the
      // event-time-timeout checker requires it in the FMGWS input
      .select(
        window(col("ts"), "1 minute").getField("start").as("w_start"),
        col("event_type"), col("ts"))
      .as[(Timestamp, String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update(k))
  }
}
