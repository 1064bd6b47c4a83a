package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The opt-in optimizer rule: fires only under the conf, only on the
  * narrow row_number-filter shape, and never changes results. */
class TopKRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def topkDf = graft.SparkEntry.queries("q_topk")(spark, dir)

  private def withRewrite[A](f: => A): A = {
    spark.conf.set("spark.graft.topkRewrite", "true")
    try f finally spark.conf.unset("spark.graft.topkRewrite")
  }

  test("off by default: q_topk plans Spark's WindowGroupLimit, no TopKPerKey") {
    val plan = topkDf.queryExecution.executedPlan.toString
    assert(!plan.contains("TopKPerKey"), plan)
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("opt-in: the window idiom routes through the heap operator, results identical") {
    val base = topkDf.collect().toSeq
    withRewrite {
      val df = topkDf
      val plan = df.queryExecution.executedPlan.toString
      assert("TopKPerKey \\[".r.findAllIn(plan).size === 2,
        s"expected the partial/final heap pair under the window:\n$plan")
      assert(df.collect().toSeq === base,
        "rewrite changed the query result")
    }
  }

  test("narrowness: rank() windows and composite predicates are left alone") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    withRewrite {
      val ranked = cust
        .withColumn("rk", rank().over(w)).filter(col("rk") <= 5)
      assert(!ranked.queryExecution.executedPlan.toString.contains("TopKPerKey"),
        "rank() must not be rewritten (tie semantics differ from a row cap)")
      val composite = cust
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5 && col("c_acctbal") > 0)
      assert(!composite.queryExecution.executedPlan.toString.contains("TopKPerKey"),
        "composite predicates are outside the narrow shape")
    }
  }
}
