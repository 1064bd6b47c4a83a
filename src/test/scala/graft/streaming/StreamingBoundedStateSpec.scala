package graft.streaming

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the eviction mechanics docs/STREAMING_SCALE.md §1–2 size state
  * by: `dropDuplicatesWithinWatermark` keeps dedup state bounded by the
  * watermark horizon (rate × delay), NOT by total keys ever seen — the
  * difference between a stream that survives months of uptime and one
  * whose state grows without bound.
  */
class StreamingBoundedStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("dedup state is evicted once the watermark passes a cohort (bounded by horizon)") {
    val dir = Files.createTempDirectory("dedup_state").toString
    def lines(specs: (Long, String)*): Array[Byte] = specs.map { case (id, ts) =>
      s"""{"event_id":$id,"ts":"$ts","user_id":$id,"event_type":"click","value":1.0}"""
    }.mkString("\n").getBytes

    // cohort A: 3 keys at T0
    Files.write(Paths.get(dir, "b1.json"), lines(
      (1L, "2024-01-01T00:00:00.000Z"),
      (2L, "2024-01-01T00:00:05.000Z"),
      (3L, "2024-01-01T00:00:10.000Z")))
    val q = EventStream.dedupStream(spark, dir)
      .writeStream.format("memory").queryName("dedup_state_q")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      def stateRows: Long = {
        val ops = q.recentProgress.reverse.flatMap(_.stateOperators.headOption)
        ops.headOption.fold(0L)(_.numRowsTotal)
      }
      assert(stateRows === 3L, "all of cohort A held while inside the horizon")

      // cohort B: 2 keys an hour later — advances the watermark far past
      // cohort A + the 2-minute delay
      Files.write(Paths.get(dir, "b2.json"), lines(
        (11L, "2024-01-01T01:00:00.000Z"),
        (12L, "2024-01-01T01:00:05.000Z")))
      q.processAllAvailable()
      // a third batch lets the store apply the eviction the batch-2
      // watermark authorized (cleanup lags one micro-batch)
      Files.write(Paths.get(dir, "b3.json"), lines(
        (13L, "2024-01-01T01:00:10.000Z")))
      q.processAllAvailable()

      val finalState = stateRows
      // 6 distinct keys were seen; only cohort B (+the b3 event) may
      // remain — cohort A MUST have been evicted
      assert(finalState <= 3L,
        s"state holds $finalState rows — cohort A was not evicted " +
          "(state would grow forever at constant rate)")
      // and dedup itself still worked across the whole run
      val n = spark.sql("SELECT count(*) FROM dedup_state_q").collect()(0).getLong(0)
      assert(n === 6L)
    } finally q.stop()
  }
}
