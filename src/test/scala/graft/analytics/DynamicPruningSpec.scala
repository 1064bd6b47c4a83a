package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Dynamic partition pruning — the runtime scan-elimination that makes
  * star joins survive 100 TB facts: when the fact table is partitioned
  * on the join key and the dim side carries a selective filter, Spark
  * injects a dynamic pruning subquery into the fact scan so only the
  * partitions matching the FILTERED dim keys are read. The driver
  * corpora are unpartitioned single files, so this is pinned on a
  * partitioned copy written here: the plan must carry the
  * dynamicpruning expression on the fact scan, and results must equal
  * the unpartitioned join.
  */
class DynamicPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("fact scan gets a dynamic pruning subquery from the filtered dim side") {
    val out = java.nio.file.Files.createTempDirectory("dpp").toString
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_partkey"), col("l_quantity"), col("l_returnflag"))
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(s"$out/li")
    val fact = spark.read.parquet(s"$out/li")
    // DPP wants a SELECTIVE FILTER over a scannable dim (a bare local
    // relation is not eligible) — write one and filter it
    import spark.implicits._
    Seq(("A", 1), ("N", 2), ("R", 3)).toDF("flag", "x")
      .write.mode("overwrite").parquet(s"$out/dim")
    val dim = spark.read.parquet(s"$out/dim").filter(col("x") === 3)

    val joined = fact.join(dim, col("l_returnflag") === col("flag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"expected a dynamic pruning subquery on the partitioned fact scan:\n$plan")

    // and the pruned result equals the straightforward filter
    val expect = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_returnflag") === "R")
      .agg(count(lit(1)), sum(col("l_quantity")))
      .collect().head
    val got = joined.collect().head
    assert(got.getLong(0) === expect.getLong(0))
    assert(got.getDouble(1) === expect.getDouble(1))
  }
}
