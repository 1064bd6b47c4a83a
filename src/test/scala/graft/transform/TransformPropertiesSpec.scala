package graft.transform

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.TestSpark

/** Property tests (SURVEY §5.3): anti-join partition law and
  * nested-set no-collateral-damage. Plain scalacheck generators driven
  * from fixed seeds (the offline cache has no scalatest-plus bridge);
  * 10 cases per property, deterministic across runs.
  */
class TransformPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val idsGen = for {
    all <- Gen.listOfN(30, Gen.chooseNum(0L, 50L)).map(_.distinct)
    removed <- Gen.someOf(all ++ Seq(999L)) // 999 never in `all`
  } yield (all, removed.toList)

  test("anti-join partitions: kept ∩ removed = ∅ and kept ∪ (all ∩ removed) = all") {
    samples(idsGen, 10).foreach { case (all, removed) =>
      val kept = all.toDF("id")
        .join(removed.toDF("rid"), col("id") === col("rid"), "left_anti")
        .as[Long].collect().toSet
      val allSet = all.toSet
      val removedSet = removed.toSet
      assert(kept.intersect(removedSet).isEmpty)
      assert(kept.union(allSet.intersect(removedSet)) === allSet)
    }
  }

  private val recsGen = Gen.listOfN(5, for {
    a <- Gen.alphaNumStr.map(_.take(8))
    b <- Gen.chooseNum(-1000, 1000)
    c <- Gen.chooseNum(-1000.0, 1000.0)
  } yield (a, b, c)).suchThat(_.nonEmpty)

  test("withField on a nested leaf leaves sibling fields bit-identical") {
    samples(recsGen, 10).foreach { recs =>
      val df = recs.toDF("a", "b", "c")
        .select(struct(col("a"), struct(col("b"), col("c")).as("inner")).as("s"))
      val out = df.withColumn("s", col("s").withField("inner.b", lit(42)))
      assert(out.select("s.inner.b").as[Int].collect().forall(_ == 42))
      assert(out.select("s.a").as[String].collect() ===
        df.select("s.a").as[String].collect())
      assert(out.select("s.inner.c").as[Double].collect() ===
        df.select("s.inner.c").as[Double].collect())
    }
  }
}
