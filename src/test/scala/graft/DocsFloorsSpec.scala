package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The docs-tier accuracy floors (r16 verdict #3): the docs1000 bench
  * gate must fail — exit non-zero via Bench's floorErrs path — on a
  * planted-recall or dedup-completeness DROP, not only on a time
  * regression. This spec pins the detector both ways on a mult=1
  * corpus: a healthy generator output passes all three floors; a
  * corpus whose planted structure is surgically broken (twins
  * destroyed, exact copies perturbed, mutated copies randomized — the
  * observable effect of a width/candidate-generation regression)
  * trips each floor's message.
  */
class DocsFloorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("healthy docs corpus passes all floors; broken planted structure trips each one") {
    val dir = Files.createTempDirectory("docsfloors").toString + "/ok"
    ScaleSmoke.buildDocsCorpus(spark, 1, Some(dir))
    assert(ScaleSmoke.docsFloors(spark, dir) === Seq.empty)

    // corrupt: break all three planted signals at once
    val bad = Files.createTempDirectory("docsfloors2").toString + "/bad"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.withColumn("text",
        when(col("doc_id") % 97 === 0,
          concat(col("text"), lit(" corruptexactcopy")))         // md5 breaks
          .when(col("doc_id") % 89 === 0,
            concat(lit("corrupt tokens only "),                   // J ≈ 0
              (col("doc_id") * 31).cast("string"), lit(" "),
              (col("doc_id") * 57).cast("string"), lit(" "),
              (col("doc_id") * 73).cast("string")))
          .otherwise(col("text")))
      .write.mode("overwrite").parquet(s"$bad/documents.parquet")
    val n = docs.count()
    spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("embedding",
        when(col("vec_id") >= n / 2 && col("vec_id") < n / 2 + 5,
          transform(sequence(lit(0), lit(63)),
            d => (pmod(hash(col("vec_id") * 977 + d.cast("long")), lit(2001))
              / lit(1000.0) - lit(1.0)).cast("float")))           // twins gone
          .otherwise(col("embedding")))
      .write.mode("overwrite").parquet(s"$bad/embeddings.parquet")

    val errs = ScaleSmoke.docsFloors(spark, bad)
    assert(errs.exists(_.contains("knn recall floor")),
      s"destroyed twins must trip the knn floor: $errs")
    assert(errs.exists(_.contains("exact-dedup completeness floor")),
      s"perturbed exact copies must trip the dedup floor: $errs")
    assert(errs.exists(_.contains("near-dup pair completeness floor")),
      s"randomized mutated copies must trip the near-dup floor: $errs")
  }
}
