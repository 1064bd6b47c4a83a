package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DotProductSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graft_dot matches the HOF composition bit-for-bit (codegen path)") {
    val df = Seq(
      (Seq(1.5, -2.0, 3.25), Seq(0.5, 4.0, -1.0)),
      (Seq(0.1, 0.2), Seq(0.3, 0.4))).toDF("a", "b")
    val rows = df.select(
      expr("graft_dot(a, b)").as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .as[(Double, Double)].collect()
    rows.foreach { case (native, hof) => assert(native === hof) }
  }

  test("graft_dot is null-safe and type-checked") {
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(df.select(expr("graft_dot(a, b)")).collect().head.isNullAt(0))
    val err = intercept[Exception] {
      Seq((1, "x")).toDF("a", "b").select(expr("graft_dot(a, b)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("graft_dot") ||
      err.getMessage.toLowerCase.contains("data type"))
  }
}
