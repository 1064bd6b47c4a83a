package graft.streaming

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class StatefulSessionizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev(id: Long, ts: String, user: Long): String =
    s"""{"event_id":$id,"ts":"$ts","user_id":$user,"event_type":"click","value":1.0}"""

  test("sessions close when the watermark passes the inactivity gap") {
    val dir = Files.createTempDirectory("sess_in").toString
    val q = StatefulSessionizer.sessions(spark, dir)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // batch 1: user 7 has two events 5 minutes apart
      Files.write(Paths.get(dir, "b1.json"), Seq(
        ev(1, "2024-01-01T10:00:00.000Z", 7),
        ev(2, "2024-01-01T10:05:00.000Z", 7)).mkString("\n").getBytes)
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 0) // session still open

      // batch 2: an event 3 hours later pushes the watermark past the gap
      Files.write(Paths.get(dir, "b2.json"),
        ev(3, "2024-01-01T13:00:00.000Z", 7).getBytes)
      q.processAllAvailable()
      // one more tick so the event-time timeout fires after watermark update
      Files.write(Paths.get(dir, "b3.json"),
        ev(4, "2024-01-01T13:01:00.000Z", 8).getBytes)
      q.processAllAvailable()

      val closed = spark.table("sessions")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3)))
      assert(closed.exists { case (u, start, end, n) =>
        u == 7L && n == 2L &&
          start.startsWith("2024-01-01 10:00:00") && end.startsWith("2024-01-01 10:05:00")
      }, s"expected closed 2-event session for user 7, got ${closed.mkString(", ")}")
    } finally q.stop()
  }

  test("a gap inside one batch splits into two sessions") {
    val dir = Files.createTempDirectory("sess_in2").toString
    val q = StatefulSessionizer.sessions(spark, dir)
      .writeStream.format("memory").queryName("sessions2").outputMode("append").start()
    try {
      Files.write(Paths.get(dir, "b1.json"), Seq(
        ev(1, "2024-01-01T10:00:00.000Z", 5),
        ev(2, "2024-01-01T12:00:00.000Z", 5)).mkString("\n").getBytes)
      q.processAllAvailable()
      val closed = spark.table("sessions2")
        .collect().map(r => (r.getLong(0), r.getLong(3)))
      // first session (1 event) closed inside the batch; second still open
      assert(closed === Array((5L, 1L)))
    } finally q.stop()
  }
}
