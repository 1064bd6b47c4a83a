package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's orchestration shape (O1–O3, SURVEY §2.4) as local
  * control flow around Spark jobs: staged directories with atomic-ish
  * promotion, a bounded-retry poller, and a `_since` cursor.
  *
  * The HTTP/auth stack (O4–O10) is out of engine scope in this offline
  * environment (SURVEY §7.5); the poller takes an abstract probe so the
  * control flow is testable without a network.
  */
object BulkPipeline {

  /** Stage layout mirroring the reference's blob containers
    * (export landing → processed → promoted; ref `__init__.py:338-349,
    * 663-680`). */
  final case class Stages(root: String) {
    val landing   = s"$root/landing"
    val processed = s"$root/processed"
    val promoted  = s"$root/promoted"
  }

  /** Poll an async job with REAL exponential backoff and a hard
    * iteration bound. The reference's loop is `while status != 200 or
    * cnt < 100` (`__init__.py:291`) — the `or` makes the cap dead and
    * the loop unbounded on perpetual 202; and its "exp_backoff" sleeps
    * `2*n` (linear, `:301`). Both bugs fixed here, per SURVEY §2
    * hazard 1.
    *
    * @param probe   returns Left(retryAfter hint ignored) while pending,
    *                Right(result) when complete
    * @param maxTries hard bound on probe calls
    * @param sleep   injected for tests (default Thread.sleep)
    * @return Some(result) if completed within the bound, None otherwise
    */
  def pollUntilComplete[A](
      probe: () => Either[Unit, A],
      maxTries: Int = 100,
      baseDelayMs: Long = 1000,
      maxDelayMs: Long = 60000,
      sleep: Long => Unit = Thread.sleep): Option[A] = {
    var tries = 0
    while (tries < maxTries) {
      probe() match {
        case Right(a) => return Some(a)
        case Left(_) =>
          tries += 1
          if (tries < maxTries)
            sleep(math.min(baseDelayMs << math.min(tries - 1, 20), maxDelayMs))
      }
    }
    None
  }

  /** Promote a completed stage: write to a temp dir next to the target,
    * then a single FS rename — the job-commit idiom that replaces the
    * reference's per-blob copy+delete loop (`copy_blobs`,
    * `__init__.py:338-349`). On HDFS/ABFS the rename is atomic at the
    * directory level; on S3 a committer handles it.
    */
  def writeAndPromote(df: DataFrame, target: String): Unit = {
    val spark = df.sparkSession
    val tmp = target + ".__staging__"
    df.write.mode("overwrite").parquet(tmp)
    val fs = new Path(target).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new Path(target)
    if (fs.exists(dst)) fs.delete(dst, true)
    require(fs.rename(new Path(tmp), dst), s"promotion rename failed: $tmp -> $target")
  }

  /** `_since` cursor persistence (ref `__init__.py:609-613`): the next
    * incremental extract reads only rows with ts > cursor. Stored as a
    * one-line file beside the stage root.
    */
  def readCursor(spark: SparkSession, root: String): Option[String] = {
    val p = new Path(s"$root/_since")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim).filter(_.nonEmpty)
      finally in.close()
    }
  }

  def writeCursor(spark: SparkSession, root: String, since: String): Unit = {
    val p = new Path(s"$root/_since")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(since.getBytes("UTF-8"))
    finally out.close()
  }
}
