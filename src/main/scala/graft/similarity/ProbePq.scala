package graft.similarity

import org.apache.spark.sql.functions._

/** Stage probe for the two superlinear docs2000 ratios (r19): which
  * stage of q_pq_adc grows >2× at 2× corpus, and how fast the
  * q_simhash_pairs candidate set actually grows (quadratic-output
  * hypothesis at the fixed 32-bit width). Scratch harness, probe
  * protocol as in ProbeClusterInc. */
object ProbePq {
  private def timed[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }
  private def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val s = graft.util.GraftSession.build("graft-probe-pq")
    s.sparkContext.setLogLevel("WARN")
    import SimilarityQueries._
    Seq(graft.ScaleSmoke.docsCorpusDir(1000), graft.ScaleSmoke.docsCorpusDir(2000))
      .foreach { dir =>
        System.err.println(s"[probe] ==== $dir")
        // warm everything once (codebook training, page cache)
        timed("pq full (warm-up incl. training)") { force(pqAdc.run(s, dir)) }
        val cb = trainPqCodebooks(s, dir) // cached? train is cached per session via pqCache inside run
        val pqK = cb(0).length
        System.err.println(s"[probe] pqK=$pqK")
        val vi = fixedVi(s, dir)
        timed("pq stage: fixedVi scan only") { force(vi) }
        def subLit(m: Int, c: Int) = array(cb(m)(c).map(lit(_)): _*)
        val coded = vi.withColumn("codes",
          array((0 until PqM).map { m =>
            call_function("graft_cell_argmin",
              slice(col("vi"), lit(m * PqSub + 1), lit(PqSub)),
              array((0 until pqK).map(c => subLit(m, c)): _*),
              array((0 until pqK).map(c => lit(c.toLong)): _*))
              .cast(org.apache.spark.sql.types.IntegerType)
          }: _*))
          .select(col("vec_id"), col("codes"))
        timed("pq stage: encode (argmin per subspace)") { force(coded) }
        timed("pq full (warm)") { force(pqAdc.run(s, dir)) }
        // simhash candidate growth
        timed("simhash full (warm-up)") { force(simhashPairs.run(s, dir)) }
        val sh = simhashDigest(s, dir).localCheckpoint(true)
        timed("simhash stage: digest only") { force(sh) }
        val bands = sh.select(col("doc_id"), col("simhash"),
          explode(array((0 to 3).map(b => struct(
            lit(b).as("band"),
            shiftright(col("simhash"), b * 8).bitwiseAND(lit(255L)).as("bv"))): _*))
            .as("bd"))
          .select(col("doc_id"), col("simhash"),
            col("bd.band").as("band"), col("bd.bv").as("bv"))
        val cand = bands.as("x").join(bands.as("y"), Seq("band", "bv"))
          .filter(col("x.doc_id") < col("y.doc_id"))
        val nCand = timed("simhash stage: candidate join count") { cand.count() }
        System.err.println(s"[probe] simhash raw candidates: $nCand")
      }
    s.stop()
  }
}
