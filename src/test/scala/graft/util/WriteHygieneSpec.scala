package graft.util

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Write-side scale hygiene: the two defaults that silently wreck a
  * 100 TB table — the small-files explosion (every task writes into
  * every output partition) and never-coalesced shuffle partitions.
  */
class WriteHygieneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def parquetFiles(dir: String): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).count(_.getName.endsWith(".parquet"))
  }

  test("repartition by the partition column bounds files to one per partition") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("d", to_date(col("ts")))
    val naive = Files.createTempDirectory("files_naive").toString
    val sized = Files.createTempDirectory("files_sized").toString
    // naive: whatever task layout the upstream had → every task can
    // open a writer in every date directory
    ev.repartition(16).write.partitionBy("d").mode("overwrite").parquet(naive)
    // hygiene: co-locate each output partition's rows first → exactly
    // one writer (and one file) per date
    ev.repartition(col("d")).write.partitionBy("d").mode("overwrite").parquet(sized)
    val days = ev.select(col("d")).distinct().count().toInt
    val n = parquetFiles(naive)
    val s = parquetFiles(sized)
    assert(s == days, s"expected one file per day ($days), got $s")
    assert(n >= 4 * s,
      s"naive layout should explode the file count (naive=$n sized=$s)")
  }

  test("AQE coalesces the 32 configured shuffle partitions for tiny aggregates") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
      s"AQE did not coalesce the post-shuffle partitions:\n$plan")
  }
}
