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

  test("graft_dot yields NULL on unequal-length arrays, matching zip_with+aggregate") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val row = df.select(
      expr("graft_dot(a, b)").as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof")).collect().head
    assert(row.isNullAt(0), "native must not silently sum over the shorter prefix")
    assert(row.isNullAt(1), "HOF reference semantics: null-padded product -> null sum")
  }

  test("graft_roll matches a JVM byte fold, handles empty and null") {
    val df = Seq(Some("hello"), Some(""), None).toDF("t")
    val got = df.select(expr("graft_roll(encode(t, 'UTF-8'))")).collect()
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)
    assert(got(0).getLong(0) === ref("hello"))
    assert(got(1).getLong(0) === 0L)
    assert(got(2).isNullAt(0))
  }

  test("VectorMean skips null and empty vectors without inflating the count") {
    val z = VectorMean.zero
    val afterEmpty = VectorMean.reduce(z, Seq.empty[Float])
    assert(afterEmpty._2 === 0L, "empty vector must not count toward the mean")
    val afterReal = VectorMean.reduce(afterEmpty, Seq(2.0f, 4.0f))
    assert(VectorMean.finish(afterReal) === Seq(2.0, 4.0))
    val ragged = intercept[IllegalArgumentException] {
      VectorMean.reduce(afterReal, Seq(1.0f))
    }
    assert(ragged.getMessage.contains("dimension mismatch"))
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
