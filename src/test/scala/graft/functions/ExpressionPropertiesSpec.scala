package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.TestSpark

/** Property tests for the native codegen expressions: each must agree
  * with an independent JVM reference implementation on arbitrary input
  * (including Unicode, empties, and negatives), through the FULL
  * codegen path — a doGenCode bug that nullSafeEval doesn't share
  * would only surface here. Fixed-seed scalacheck generators (offline
  * cache has no scalatest-plus bridge); deterministic across runs.
  */
class ExpressionPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // Mixed-script strings: ASCII, accents (composed + combining marks), CJK.
  private val charGen: Gen[Char] = Gen.frequency(
    (6, Gen.alphaNumChar),
    (2, Gen.oneOf(" .,!?\t".toSeq)),
    (2, Gen.oneOf("éüñåçèêàöß".toSeq)),
    (1, Gen.oneOf("日本語中文한국".toSeq)),
    (1, Gen.const('́'))) // combining acute: exercises NFC composition
  private val strGen: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))

  test("graft_roll == JVM UTF-8 byte fold on arbitrary mixed-script strings") {
    val texts = samples(strGen, 60)
    def ref(t: String): Long =
      t.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)
    val got = texts.toDF("t")
      .select(expr("graft_roll(encode(t, 'UTF-8'))")).as[Long].collect()
    texts.zip(got).foreach { case (t, g) => assert(g === ref(t), s"input <$t>") }
  }

  test("graft_nfc == JDK Normalizer NFC, and is idempotent") {
    val texts = samples(strGen, 60)
    val got = texts.toDF("t")
      .select(expr("graft_nfc(t)"), expr("graft_nfc(graft_nfc(t))"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    texts.zip(got).foreach { case (t, (once, twice)) =>
      val ref = java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
      assert(once === ref, s"input <$t>")
      assert(twice === once, "NFC must be idempotent")
    }
  }

  private val vecPairGen: Gen[(Seq[Double], Seq[Double])] = for {
    n <- Gen.chooseNum(0, 16)
    a <- Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6))
    b <- Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6))
  } yield (a, b)

  test("graft_dot == ascending-index JVM fold on arbitrary equal-length vectors") {
    val pairs = samples(vecPairGen, 60)
    def ref(a: Seq[Double], b: Seq[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val got = pairs.toDF("a", "b")
      .select(expr("graft_dot(a, b)")).as[Double].collect()
    pairs.zip(got).foreach { case ((a, b), g) =>
      // bit-exact: same accumulation order as the reference fold
      assert(g === ref(a, b), s"vectors $a x $b")
    }
  }
}
