package graft.similarity

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The persisted-signature-index lifecycle around q_dedup_incremental:
  * the streaming projection path must produce the SAME signatures as
  * the batch aggregation path, the bucketed index must be maintainable
  * by APPEND (tomorrow's batch signs itself once and lands next to the
  * corpus — no recompute), and the streaming twin must flag duplicates
  * against the index with zero streaming state.
  */
class IncrementalIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("bandProjection (pure HOF projection) == batch explode/groupBy signatures") {
    // Two deliberately different dataflows — per-row array mins vs
    // explode + 8-column min aggregation — must produce the identical
    // (doc_id, band, sig) set, or the streaming path would dedup
    // against signatures the index never contains. DF cap disabled on
    // the batch side: the projection path declares no-cap semantics.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val batch = SimilarityQueries.bandsOf(
      SimilarityQueries.minhashFrameFrom(
        SimilarityQueries.shinglesOf(docs, Int.MaxValue)))
      .as[(Long, Int, String)].collect().toSet
    val proj = SimilarityQueries.bandProjection(docs)
      .as[(Long, Int, String)].collect().toSet
    assert(proj === batch, "projection and aggregation signatures diverged")
  }

  test("index maintenance is APPEND-ONLY: corpus table + batch append == full re-sign") {
    val cutoff = 400L
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def sigs(d: org.apache.spark.sql.DataFrame) =
      SimilarityQueries.bandProjection(d)
    val tbl = s"graft_idx_append_test_${java.lang.Long.toHexString(System.nanoTime())}"
    val path = s"${sys.props("java.io.tmpdir")}/graft_sig_idx/$tbl"
    def writeBucketed(d: org.apache.spark.sql.DataFrame, mode: String): Unit =
      d.repartition(8, col("band"), col("sig"))
        .write.mode(mode)
        .option("path", path)
        .bucketBy(8, "band", "sig").sortBy("band", "sig")
        .saveAsTable(tbl)
    try {
      writeBucketed(sigs(docs.filter(col("doc_id") < cutoff)), "overwrite")
      // tomorrow's batch: sign once, APPEND — the corpus is never touched
      writeBucketed(sigs(docs.filter(col("doc_id") >= cutoff)), "append")
      val appended = spark.table(tbl)
        .as[(Long, Int, String)].collect().toSet
      val full = sigs(docs).as[(Long, Int, String)].collect().toSet
      assert(appended === full, "appended index diverged from a full re-sign")
      // the appended table still reads through its buckets
      val plan = spark.table(tbl).groupBy(col("band"), col("sig")).count()
        .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
      assert(plan.contains("SelectedBucketsCount"),
        s"append lost the bucketed layout\n$plan")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("q_dedup_funnel: a viral exact-dup cluster collapses BEFORE candidate generation") {
    // 200 byte-identical copies of one text would make C(200,2)=19,900
    // REAL candidate pairs in any banded near-dup pass — no cap may
    // drop them, so the funnel must collapse them to ONE representative
    // first. Planted: 200 copies + 2 near-dup (not exact) texts.
    val viral = (0L until 200L).map(i =>
      (i, "the same viral boilerplate text repeated verbatim everywhere"))
    val near = Seq(
      (500L, "a quite distinct document about entirely other things one two three"),
      (501L, "a quite distinct document about entirely other things one two four"))
    val dir = Files.createTempDirectory("funnel").toString
    (viral ++ near).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SimilarityQueries.dedupFunnel.run(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // the viral cluster contributes ZERO pairs (one representative),
    // and the near-dup pair survives with multiplicities 1/1
    assert(rows.forall { case (id1, id2, _, _, _) => id1 >= 500L && id2 >= 500L },
      s"viral representatives must not pair with themselves: $rows")
    assert(rows.exists { case (id1, id2, _, m1, m2) =>
      id1 == 500L && id2 == 501L && m1 == 1L && m2 == 1L },
      s"the near-dup pair must survive the funnel: $rows")
    // and the representative census is visible: mult of doc 0 == 200
    val reps = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy(md5(col("text"))).agg(min("doc_id"), count(lit(1)))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(reps(0L) === 200L)
  }

  test("streaming dedup against the index: duplicates flagged, novel docs pass, zero state") {
    // Tiny corpus -> index; stream one exact duplicate and one novel
    // doc; the dup must collide with its corpus twin in all 4 bands,
    // the novel doc in none.
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    val idx = SimilarityQueries.bandProjection(corpus).localCheckpoint(true)
    val inDir = Files.createTempDirectory("idx_dedup_in").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(inDir, "b1.json"),
      Seq(
        """{"doc_id":100,"text":"alpha beta gamma delta epsilon zeta"}""",
        """{"doc_id":101,"text":"completely different words entirely here now"}"""
      ).mkString("\n").getBytes)
    val q = graft.streaming.IndexDedupStream.matches(spark, inDir, idx)
      .writeStream.format("memory").queryName("idx_dedup")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, corpus_id, band FROM idx_dedup")
        .as[(Long, Long, Int)].collect().sorted.toSeq
      assert(rows === (0 until 4).map(b => (100L, 1L, b)),
        "the exact duplicate must collide with doc 1 in all 4 bands and " +
          "the novel doc in none")
      // stateless by construction: no aggregation, no watermark
      assert(q.lastProgress == null ||
        Option(q.lastProgress.stateOperators).forall(_.isEmpty),
        "index dedup stream must keep no streaming state")
    } finally q.stop()
  }
}
