package graft.pipeline

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("poller completes when the job finishes and backs off exponentially") {
    var sleeps = List.empty[Long]
    var calls = 0
    val result = BulkPipeline.pollUntilComplete[String](
      probe = () => { calls += 1; if (calls >= 4) Right("done") else Left(()) },
      baseDelayMs = 100,
      sleep = ms => sleeps ::= ms)
    assert(result === Some("done"))
    assert(sleeps.reverse === List(100L, 200L, 400L)) // 2^n, not the ref's 2*n
  }

  test("poller is HARD-bounded on a never-completing job (ref or-bug fixed)") {
    var calls = 0
    val result = BulkPipeline.pollUntilComplete[String](
      probe = () => { calls += 1; Left(()) },
      maxTries = 7,
      sleep = _ => ())
    assert(result === None)
    assert(calls === 7) // the reference loops forever here (__init__.py:291)
  }

  test("poller caps the delay at maxDelayMs") {
    var sleeps = List.empty[Long]
    var calls = 0
    BulkPipeline.pollUntilComplete[String](
      probe = () => { calls += 1; if (calls >= 12) Right("ok") else Left(()) },
      baseDelayMs = 1000, maxDelayMs = 8000,
      sleep = ms => sleeps ::= ms)
    assert(sleeps.max === 8000L)
  }

  test("writeAndPromote replaces the target atomically via rename") {
    val root = Files.createTempDirectory("promote").toString
    val target = s"$root/table"
    BulkPipeline.writeAndPromote(Seq(1, 2, 3).toDF("x"), target)
    assert(spark.read.parquet(target).count() === 3)
    BulkPipeline.writeAndPromote(Seq(9).toDF("x"), target) // second promote overwrites
    assert(spark.read.parquet(target).as[Int].collect() === Array(9))
    assert(!new java.io.File(s"$root/.table.__staging__").exists())
    // the crash-safety aside copy must be cleaned up after a successful swap
    assert(!new java.io.File(s"$root/.table.__old__").exists())
  }

  test("promotion recovers a leftover hidden aside from a crashed prior swap") {
    val root = Files.createTempDirectory("promote2").toString
    val target = s"$root/table"
    BulkPipeline.writeAndPromote(Seq(1).toDF("x"), target)
    // simulate a crash that died between aside-rename and cleanup
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/.table.__old__"))
    BulkPipeline.writeAndPromote(Seq(7, 8).toDF("x"), target)
    assert(spark.read.parquet(target).count() === 2)
    assert(!new java.io.File(s"$root/.table.__old__").exists())
  }

  test("promotion restores the hidden aside when a prior crash left NO target (data not lost)") {
    val root = Files.createTempDirectory("promote3").toString
    val target = s"$root/table"
    BulkPipeline.writeAndPromote(Seq(1, 2, 3).toDF("x"), target)
    // simulate a crash between aside-rename and the swap: target gone,
    // previous data lives only in the aside copy
    java.nio.file.Files.move(
      java.nio.file.Paths.get(target), java.nio.file.Paths.get(s"$root/.table.__old__"))
    // the next promotion must NOT delete the only copy; it restores,
    // then swaps in the new data
    BulkPipeline.writeAndPromote(Seq(9).toDF("x"), target)
    assert(spark.read.parquet(target).as[Int].collect() === Array(9))
    assert(!new java.io.File(s"$root/.table.__old__").exists())
  }

  test("_since cursor round-trips and starts absent") {
    val root = Files.createTempDirectory("cursor").toString
    assert(BulkPipeline.readCursor(spark, root) === None)
    BulkPipeline.writeCursor(spark, root, "2024-01-05T00:00:00Z")
    assert(BulkPipeline.readCursor(spark, root) === Some("2024-01-05T00:00:00Z"))
  }
}
