package graft.ingest

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** S4/S5 (SURVEY §2.1): the reference's per-type blob naming
  * (`{ResourceType}-{client}-{uuid}.json`, `__init__.py:653`) and blob
  * listing (`list_blobs`, `:199-203`) become `partitionBy` writes and
  * FS/glob listings — partition identity lives in the directory layout,
  * recoverable without touching row data.
  */
class PartitionedSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("partitionBy write lays out per-type dirs; reads prune and recover the type") {
    val out = Files.createTempDirectory("psink").toString + "/resources"
    Seq(
      ("p1", "Patient"), ("p2", "Patient"), ("c1", "Condition"))
      .toDF("id", "resourceType")
      .write.partitionBy("resourceType").mode("overwrite").parquet(out)

    // S5: listing shows the partition convention
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new Path(out)).map(_.getPath.getName)
      .filter(_.startsWith("resourceType=")).sorted
    assert(dirs === Array("resourceType=Condition", "resourceType=Patient"))

    // partition-pruned read: only the Patient directory is scanned
    val patients = spark.read.parquet(out).filter(col("resourceType") === "Patient")
    assert(patients.count() === 2)
    val scanned = patients.queryExecution.executedPlan.toString()
    assert(scanned.contains("resourceType=Patient") || !scanned.contains("Condition"))

    // the partition column is recovered from the path, not stored in rows
    val row = spark.read.parquet(s"$out/resourceType=Condition")
    assert(row.columns.toSeq === Seq("id"))
  }
}
