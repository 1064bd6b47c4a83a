package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.TestSpark

/** Property test for the custom top-k operator: on ARBITRARY data —
  * skewed key distributions, duplicate sort values broken by a
  * tiebreak id, k from degenerate 1 to larger-than-any-group — the
  * partial/final heap path must return exactly the rows the
  * row_number window idiom returns. Fixed-seed scalacheck generators
  * (same determinism convention as ExpressionPropertiesSpec).
  */
class TopKPerKeyPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val rowGen: Gen[(String, Long, Double)] = for {
    key <- Gen.frequency( // skewed: one hot key, a few warm, a long tail
      (5, Gen.const("hot")),
      (3, Gen.oneOf("warm1", "warm2")),
      (2, Gen.chooseNum(0, 30).map(i => s"tail$i")))
    // coarse score domain forces plenty of exact ties -> the id
    // tiebreak must decide identically on both paths
    score <- Gen.chooseNum(0, 5).map(_.toDouble)
  } yield (key, 0L, score)

  test("TopKPerKey == row_number window on arbitrary skewed data, k in {1,3,7,10000}") {
    for (trial <- 0 until 3) {
      val rows = samples(rowGen, 400, seed = 100L * trial).zipWithIndex
        .map { case ((k, _, s), i) => (k, i.toLong, s) }
      val df = rows.toDF("key", "id", "score").repartition(5)
      for (k <- Seq(1, 3, 7, 10000)) {
        val native = TopKPerKey(df, Seq("key"),
            Seq(col("score").desc, col("id").asc), k)
          .select("key", "id").as[(String, Long)].collect().toSet
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("key")).orderBy(col("score").desc, col("id"))
        val windowed = df.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k)
          .select("key", "id").as[(String, Long)].collect().toSet
        assert(native === windowed, s"trial=$trial k=$k diverged")
      }
    }
  }
}
