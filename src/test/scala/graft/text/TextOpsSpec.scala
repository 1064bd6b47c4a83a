package graft.text

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Unicode behavior of the text operators — the oracle corpus is
  * ASCII, so multi-byte/multi-script correctness is pinned here:
  * the BPE pretokenizer must class accented and non-Latin letters as
  * letters, and the rolling hash must fold over UTF-8 BYTES (not
  * codepoints), matching what a byte-stream Rabin-Karp chunker sees.
  */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDir(texts: Seq[String]): String = {
    val dir = Files.createTempDirectory("unidocs").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "xx", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_text_bpe classes Unicode letters/digits correctly (\\p{L}/\\p{N})") {
    val dir = docsDir(Seq(
      "Héllo wörld 42 naïve!",   // [Héllo][ wörld][ 42][ naïve][!] = 5
      "años 日本語 123",          // [años][ 日本語][ 123] = 3
      "abc"))                     // [abc] = 1
    val got = TextQueries.textBpe.run(spark, dir)
      .select("doc_id", "n_bpe").as[(Long, Long)].collect().toMap
    assert(got(0L) === 5L)
    assert(got(1L) === 3L)
    assert(got(2L) === 1L)
  }

  test("q_text_normalize converges composed and decomposed Unicode to one hash") {
    val composed = "café latte"            // é as one codepoint
    val decomposed = "café   latte"       // e + combining acute, extra spaces
    val dir = docsDir(Seq(composed, decomposed, "CAFE latte"))
    val got = TextQueries.textNormalize.run(spark, dir)
      .select("doc_id", "norm_hash").as[(Long, String)].collect().toMap
    assert(got(0L) === got(1L),
      "NFC + whitespace collapse must make composed/decomposed forms identical")
    assert(got(0L) !== got(2L), "case differs only after the fold -> 'cafe' != 'café'")
  }

  test("q_sample_stratified is deterministic and respects per-stratum rates") {
    val dir = docsDir((0 until 400).map(i => s"doc number $i"))
    val a = TextQueries.sampleStratified.run(spark, dir).collect().map(_.getLong(0)).toSet
    val b = TextQueries.sampleStratified.run(spark, dir).collect().map(_.getLong(0)).toSet
    assert(a === b, "same input must always select the same sample")
    // fixture lang is 'xx' -> 30% stratum; md5 buckets are uniform-ish
    assert(a.size > 400 * 30 / 100 - 40 && a.size < 400 * 30 / 100 + 40,
      s"sample size ${a.size} far from the 30% rate")
  }

  test("q_rolling_hash folds over UTF-8 bytes, not codepoints") {
    val texts = Seq("aé", "日本", "plain ascii", "")
    val dir = docsDir(texts)
    def expected(t: String): Long =
      t.getBytes("UTF-8").foldLeft(0L)((acc, b) =>
        (acc * 31 + (b & 0xff)) % 1000000007L)
    val got = TextQueries.rollingHash.run(spark, dir)
      .select("doc_id", "fp_roll").as[(Long, Long)].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === expected(t), s"mismatch for <$t>")
    }
  }
}
