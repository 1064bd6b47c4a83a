package graft.streaming

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("native session windows merge events within the gap and finalize at the watermark") {
    val dir = Files.createTempDirectory("sessw_in").toString
    Files.write(Paths.get(dir, "b1.json"), Seq(
      """{"event_id":1,"ts":"2024-01-01T10:00:00.000Z","user_id":1,"event_type":"click","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T10:03:00.000Z","user_id":1,"event_type":"click","value":2.0}""",
      """{"event_id":3,"ts":"2024-01-01T12:00:00.000Z","user_id":1,"event_type":"click","value":4.0}""",
      """{"event_id":4,"ts":"2024-01-01T10:01:00.000Z","user_id":2,"event_type":"view","value":8.0}"""
    ).mkString("\n").getBytes)
    val q = EventStream.sessionWindows(spark, dir)
      .writeStream.format("memory").queryName("sessw").outputMode("append").start()
    try {
      q.processAllAvailable()
      // APPEND mode emits only watermark-finalized sessions: the max
      // event time is 12:00, watermark 11:50, so both 10:0x sessions
      // are closed (no event can extend them) while user 1's 12:00
      // session is still open — bounded state means exactly this
      // eviction is observable at the sink.
      val rows = spark.sql(
        "SELECT user_id, cast(s_start AS STRING) s, cast(s_end AS STRING) e, n_events, sum_value " +
          "FROM sessw ORDER BY user_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      assert(rows.length === 2, "only the two watermark-closed sessions emit in append mode")
      // user 1: events 1+2 merge (3-min gap < 5-min); the session spans
      // 10:00 → last event + gap = 10:08
      assert(rows(0)._1 === 1L && rows(0)._2.startsWith("2024-01-01 10:00:00")
        && rows(0)._3.startsWith("2024-01-01 10:08:00")
        && rows(0)._4 === 2L && rows(0)._5 === 3.0)
      assert(rows(1)._1 === 2L && rows(1)._4 === 1L && rows(1)._5 === 8.0)
    } finally q.stop()
  }

  test("streaming dedup drops replayed event ids within the watermark horizon") {
    val dir = Files.createTempDirectory("dedup_in").toString
    // batch 1: events 1,2 — event 1 appears twice (at-least-once replay)
    Files.write(Paths.get(dir, "b1.json"), Seq(
      """{"event_id":1,"ts":"2024-01-01T00:00:10.000Z","user_id":1,"event_type":"click","value":1.0}""",
      """{"event_id":1,"ts":"2024-01-01T00:00:10.000Z","user_id":1,"event_type":"click","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T00:00:20.000Z","user_id":2,"event_type":"view","value":2.0}"""
    ).mkString("\n").getBytes)
    val q = EventStream.dedupStream(spark, dir)
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2: event 1 replayed again in a later micro-batch, plus new event 3
      Files.write(Paths.get(dir, "b2.json"), Seq(
        """{"event_id":1,"ts":"2024-01-01T00:00:10.000Z","user_id":1,"event_type":"click","value":1.0}""",
        """{"event_id":3,"ts":"2024-01-01T00:00:50.000Z","user_id":3,"event_type":"click","value":3.0}"""
      ).mkString("\n").getBytes)
      q.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dedup_stream ORDER BY event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids === Seq(1L, 2L, 3L), "each event id must survive exactly once")
    } finally q.stop()
  }

  test("file-source stream with watermark aggregates tumbling windows") {
    val dir = Files.createTempDirectory("stream_in").toString
    Files.write(Paths.get(dir, "batch1.json"), Seq(
      """{"event_id":1,"ts":"2024-01-01T00:00:10.000Z","user_id":1,"event_type":"click","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T00:00:40.000Z","user_id":2,"event_type":"click","value":2.0}""",
      """{"event_id":3,"ts":"2024-01-01T00:01:10.000Z","user_id":1,"event_type":"view","value":3.0}"""
    ).mkString("\n").getBytes)

    val q = EventStream.windowedCounts(spark, dir)
      .writeStream
      .format("memory")
      .queryName("windowed")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT cast(w_start AS STRING) w, event_type, n, sum_value FROM windowed ORDER BY w, event_type")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows === Array(
        ("2024-01-01 00:00:00", "click", 2L, 3.0),
        ("2024-01-01 00:01:00", "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("streaming exact DAU: replays and repeat events collapse to one per user-day") {
    val dir = Files.createTempDirectory("dau_in").toString
    Files.write(Paths.get(dir, "batch1.json"), Seq(
      // user 1 three times on day 1 (incl. an exact event_id replay),
      // user 2 once on day 1, user 1 again on day 2
      """{"event_id":1,"ts":"2024-01-01T08:00:00.000Z","user_id":1,"event_type":"click","value":1.0}""",
      """{"event_id":1,"ts":"2024-01-01T08:00:00.000Z","user_id":1,"event_type":"click","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T09:00:00.000Z","user_id":1,"event_type":"view","value":1.0}""",
      """{"event_id":3,"ts":"2024-01-01T09:30:00.000Z","user_id":2,"event_type":"click","value":1.0}""",
      """{"event_id":4,"ts":"2024-01-02T07:00:00.000Z","user_id":1,"event_type":"click","value":1.0}"""
    ).mkString("\n").getBytes)
    val q = EventStream.dailyActives(spark, dir)
      .writeStream.format("memory").queryName("dau")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT cast(day AS STRING) d, dau FROM dau ORDER BY d")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(rows === Array(("2024-01-01", 2L), ("2024-01-02", 1L)),
        "two actives on day 1 (user 1 deduped), one on day 2")
    } finally q.stop()
  }

  test("streaming DAU stays exact across micro-batches that advance the watermark") {
    // The eviction-boundary case the single-batch test can't exercise:
    // user 1 is active at 08:00, the stream's event time advances to
    // 12:00 in the SAME day via another user, then user 1 re-appears at
    // 15:00 in a LATER micro-batch. Under a lateness-sized dedup
    // horizon (the old 2-minute watermark) user 1's (user, day) state
    // would have been evicted by 12:00 and the 15:00 event re-counted
    // (dau=3); the day-dwell-sized 25h horizon keeps the key alive so
    // the count stays exact (dau=2).
    val dir = Files.createTempDirectory("dau_evict").toString
    Files.write(Paths.get(dir, "b1.json"), Seq(
      """{"event_id":1,"ts":"2024-01-01T08:00:00.000Z","user_id":1,"event_type":"click","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T12:00:00.000Z","user_id":2,"event_type":"view","value":1.0}"""
    ).mkString("\n").getBytes)
    val q = EventStream.dailyActives(spark, dir)
      .writeStream.format("memory").queryName("dau_evict")
      .outputMode("complete").start()
    try {
      q.processAllAvailable() // batch 1 sets the watermark from 12:00
      Files.write(Paths.get(dir, "b2.json"), Seq(
        """{"event_id":3,"ts":"2024-01-01T15:00:00.000Z","user_id":1,"event_type":"click","value":1.0}"""
      ).mkString("\n").getBytes)
      q.processAllAvailable() // batch 2: user 1 again, after state cleanup ran
      val rows = spark.sql("SELECT cast(day AS STRING) d, dau FROM dau_evict ORDER BY d")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(rows.toSeq === Seq(("2024-01-01", 2L)),
        "user 1's afternoon return must NOT re-count once their morning state crossed a batch boundary")
    } finally q.stop()
  }

  test("streaming top-k ranks a window's types when the watermark closes it; state frees") {
    // Window 00:00–00:01 gets click x3, view x2, idle x1. Batch 2
    // advances the watermark past the window end (+2 min lateness), so
    // the window's state ranks itself, emits top-2, and is removed;
    // the late batch-2 window stays open and emits nothing.
    val dir = Files.createTempDirectory("topk_stream").toString
    Files.write(Paths.get(dir, "b1.json"), Seq(
      """{"event_id":1,"ts":"2024-01-01T00:00:05.000Z","user_id":1,"event_type":"click","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T00:00:10.000Z","user_id":2,"event_type":"click","value":1.0}""",
      """{"event_id":3,"ts":"2024-01-01T00:00:15.000Z","user_id":3,"event_type":"click","value":1.0}""",
      """{"event_id":4,"ts":"2024-01-01T00:00:20.000Z","user_id":1,"event_type":"view","value":1.0}""",
      """{"event_id":5,"ts":"2024-01-01T00:00:25.000Z","user_id":2,"event_type":"view","value":1.0}""",
      """{"event_id":6,"ts":"2024-01-01T00:00:30.000Z","user_id":3,"event_type":"idle","value":1.0}"""
    ).mkString("\n").getBytes)
    val q = WindowTopK.trending(spark, dir, k = 2)
      .writeStream.format("memory").queryName("trending").outputMode("append").start()
    try {
      q.processAllAvailable() // watermark still below the window end: nothing emits
      assert(spark.sql("SELECT * FROM trending").count() === 0L,
        "a window must not emit before the watermark closes it")
      Files.write(Paths.get(dir, "b2.json"), Seq(
        """{"event_id":7,"ts":"2024-01-01T00:05:00.000Z","user_id":9,"event_type":"view","value":1.0}"""
      ).mkString("\n").getBytes)
      q.processAllAvailable() // watermark 00:03 > 00:01 window end -> emit
      val rows = spark.sql(
        "SELECT cast(w_start AS STRING) w, event_type, n, rk FROM trending ORDER BY rk")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      assert(rows.toSeq === Seq(
        ("2024-01-01 00:00:00", "click", 3L, 1),
        ("2024-01-01 00:00:00", "view", 2L, 2)),
        "top-2 of the closed window must rank click(3) over view(2) and drop idle(1)")
    } finally q.stop()
  }

  test("stream-static broadcast enrich joins each micro-batch, keeps misses with default") {
    import spark.implicits._
    val dir = Files.createTempDirectory("enrich_in").toString
    Files.write(Paths.get(dir, "b1.json"), Seq(
      """{"event_id":1,"ts":"2024-01-01T00:00:10.000Z","user_id":1,"event_type":"click","value":2.0}""",
      """{"event_id":2,"ts":"2024-01-01T00:00:20.000Z","user_id":2,"event_type":"view","value":4.0}""",
      """{"event_id":3,"ts":"2024-01-01T00:00:30.000Z","user_id":3,"event_type":"mystery","value":8.0}"""
    ).mkString("\n").getBytes)
    val dim = Seq(("click", 1.5), ("view", 0.5)).toDF("event_type", "weight")
    val q = EventStream.enrichStream(spark, dir, dim)
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT event_id, weight, weighted FROM enriched ORDER BY event_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      assert(rows === Array((1L, 1.5, 3.0), (2L, 0.5, 2.0), (3L, 0.0, 0.0)),
        "dim hits weighted, the unknown type kept with default 0 — not dropped")
    } finally q.stop()
  }

  test("stream-stream interval join matches clicks to views within 10 minutes only") {
    val vdir = Files.createTempDirectory("ssj_views").toString
    val cdir = Files.createTempDirectory("ssj_clicks").toString
    Files.write(Paths.get(vdir, "b1.json"), Seq(
      """{"event_id":10,"ts":"2024-01-01T10:00:00.000Z","user_id":1,"event_type":"view","value":1.0}""",
      """{"event_id":11,"ts":"2024-01-01T10:20:00.000Z","user_id":1,"event_type":"view","value":1.0}""",
      """{"event_id":12,"ts":"2024-01-01T10:00:00.000Z","user_id":2,"event_type":"view","value":1.0}"""
    ).mkString("\n").getBytes)
    Files.write(Paths.get(cdir, "b1.json"), Seq(
      """{"event_id":20,"ts":"2024-01-01T10:05:00.000Z","user_id":1,"event_type":"click","value":1.0}""",
      """{"event_id":21,"ts":"2024-01-01T10:25:00.000Z","user_id":1,"event_type":"click","value":1.0}""",
      """{"event_id":22,"ts":"2024-01-01T11:30:00.000Z","user_id":2,"event_type":"click","value":1.0}"""
    ).mkString("\n").getBytes)
    val q = EventStream.clickAfterView(spark, vdir, cdir)
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT c_id, v_id, lag_sec FROM ssj ORDER BY c_id, v_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // click 20 matches view 10 (5 min ≤ 10); click 21 matches only
      // view 11 (5 min — view 10 is 25 min back, outside the
      // interval); user 2's click at +90 min matches nothing.
      assert(rows === Array((20L, 10L, 300.0), (21L, 11L, 300.0)))
    } finally q.stop()
  }

  test("left-outer interval join: unmatched views emit with nulls AFTER the watermark passes") {
    val vdir = Files.createTempDirectory("ssjo_views").toString
    val cdir = Files.createTempDirectory("ssjo_clicks").toString
    // view 50 converts TWICE (clicks 60 + 62 in-window — the per-click
    // fan-out the contract documents); view 51 never converts
    Files.write(Paths.get(vdir, "b1.json"), Seq(
      """{"event_id":50,"ts":"2024-01-01T10:00:00.000Z","user_id":1,"event_type":"view","value":1.0}""",
      """{"event_id":51,"ts":"2024-01-01T10:01:00.000Z","user_id":2,"event_type":"view","value":1.0}"""
    ).mkString("\n").getBytes)
    Files.write(Paths.get(cdir, "b1.json"), Seq(
      """{"event_id":60,"ts":"2024-01-01T10:05:00.000Z","user_id":1,"event_type":"click","value":1.0}""",
      """{"event_id":62,"ts":"2024-01-01T10:07:00.000Z","user_id":1,"event_type":"click","value":1.0}"""
    ).mkString("\n").getBytes)
    val q = EventStream.viewOutcomes(spark, vdir, cdir)
      .writeStream.format("memory").queryName("ssjo").outputMode("append").start()
    try {
      q.processAllAvailable()
      val early = spark.sql("SELECT v_id FROM ssjo WHERE c_id IS NULL").count()
      assert(early === 0L,
        "an unmatched view must NOT emit before the watermark proves no click can come")
      // advance event time far past view 51's window + watermark on
      // BOTH sides (the join watermark is the min across inputs)
      Files.write(Paths.get(vdir, "b2.json"), Seq(
        """{"event_id":52,"ts":"2024-01-01T11:00:00.000Z","user_id":3,"event_type":"view","value":1.0}"""
      ).mkString("\n").getBytes)
      Files.write(Paths.get(cdir, "b2.json"), Seq(
        """{"event_id":61,"ts":"2024-01-01T11:00:00.000Z","user_id":9,"event_type":"click","value":1.0}"""
      ).mkString("\n").getBytes)
      q.processAllAvailable()
      q.processAllAvailable() // extra no-data batch flushes expired state
      val rows = spark.sql(
        "SELECT v_id, c_id, converted FROM ssjo WHERE v_id IN (50, 51) ORDER BY v_id, c_id")
        .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2)))
      assert(rows.toSeq === Seq(
        (50L, Some(60L), 1L),
        (50L, Some(62L), 1L),
        (51L, None, 0L)),
        "view 50 fans out per matching click; view 51 emits null-click " +
          "exactly once after expiry")
    } finally q.stop()
  }

  test("stream-stream interval join: a click preceded by TWO in-window views emits both rows") {
    val vdir = Files.createTempDirectory("ssj2_views").toString
    val cdir = Files.createTempDirectory("ssj2_clicks").toString
    Files.write(Paths.get(vdir, "b1.json"), Seq(
      """{"event_id":30,"ts":"2024-01-01T10:00:00.000Z","user_id":1,"event_type":"view","value":1.0}""",
      """{"event_id":31,"ts":"2024-01-01T10:04:00.000Z","user_id":1,"event_type":"view","value":1.0}"""
    ).mkString("\n").getBytes)
    Files.write(Paths.get(cdir, "b1.json"), Seq(
      """{"event_id":40,"ts":"2024-01-01T10:06:00.000Z","user_id":1,"event_type":"click","value":1.0}"""
    ).mkString("\n").getBytes)
    val q = EventStream.clickAfterView(spark, vdir, cdir)
      .writeStream.format("memory").queryName("ssj2").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT c_id, v_id, lag_sec FROM ssj2 ORDER BY v_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // ALL in-window views match (documented contract — the join is
      // not top-1); a most-recent-only consumer takes min(lag_sec).
      assert(rows === Array((40L, 30L, 360.0), (40L, 31L, 120.0)))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog and terminates on its own") {
    // The batch-backfill contract: an AvailableNow run must process
    // every file already landed, commit, and STOP without an explicit
    // stop() — that self-termination is what makes a scheduled
    // catch-up job (cron-style reprocessing) safe to run unattended.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("avnow_in").toString
    Files.write(Paths.get(dir, "b1.json"), Seq(
      """{"event_id":1,"ts":"2024-01-01T10:00:00.000Z","user_id":1,"event_type":"click","value":2.0}""",
      """{"event_id":2,"ts":"2024-01-01T10:01:00.000Z","user_id":2,"event_type":"view","value":3.0}"""
    ).mkString("\n").getBytes)
    Files.write(Paths.get(dir, "b2.json"), Seq(
      """{"event_id":3,"ts":"2024-01-01T10:02:00.000Z","user_id":1,"event_type":"click","value":5.0}"""
    ).mkString("\n").getBytes)
    val q = spark.readStream.schema(EventStream.eventSchema).json(dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("avnow")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(60000),
        "AvailableNow must terminate by itself once the backlog drains")
      val rows = spark.sql("SELECT user_id, n FROM avnow ORDER BY user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq === Seq((1L, 2L), (2L, 1L)),
        "both pre-landed files must be processed before terminating")
    } finally q.stop()
  }
}
