package graft.similarity

import org.apache.spark.sql.functions._

/** THE stage-probe entry point (r19 verdict #7: the per-round scratch
  * mains ProbePq/ProbeClusterInc kept accumulating — the probe
  * protocol is now used every round, so it is a tool, not debris).
  *
  * `runMain graft.similarity.Probe <probe> [corpusDir...]` decomposes
  * one query's WARM cost into its pipeline stages (noop-sink forced,
  * artifact builds paid in a cold pre-pass) so optimization targets
  * the measured dominant stage instead of a guess — the protocol that
  * found the r17 embed-projection, r18 batch-signing and r19 ADC-fold
  * dominants. Numbers land in SCALE.md; nothing here is wired into
  * the query registry.
  *
  * Probes: `embed_dedup` (r20 — the docs-tier ceiling),
  * `pq` (r19), `clusterinc` (r19). Default corpus: the docs1000 tier
  * dir (must already exist — run the bench tier first; the probe
  * never builds corpora so its timings are never polluted by
  * generation I/O).
  */
object Probe {
  private def timed[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  private def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: Probe <embed_dedup|pq|clusterinc> [corpusDir...]")
    val probe = args.head
    val dirs =
      if (args.length > 1) args.tail.toSeq
      else Seq(graft.ScaleSmoke.docsCorpusDir(1000))
    dirs.foreach { d =>
      require(new java.io.File(s"$d/documents.parquet/_SUCCESS").exists(),
        s"probe corpus $d missing or incomplete — run the bench tier first")
    }
    val s = graft.util.GraftSession.build(s"graft-probe-$probe")
    s.sparkContext.setLogLevel("WARN")
    probe match {
      case "embed_dedup" => dirs.foreach(embedDedupStages(s, _))
      case "pq" => dirs.foreach(pqStages(s, _))
      case "clusterinc" => dirs.foreach(clusterIncStages(s, _))
      case other => sys.error(
        s"unknown probe '$other' (known: embed_dedup, pq, clusterinc)")
    }
    s.stop()
  }

  /** q_embed_dedup (r20 — 9.07s at 500k / 14.53s at 1M, both doc
    * tiers' ceiling after the r19 fixes): is the residual the bucketed
    * artifact scan, the in-bucket integer pair loop
    * (graft_bucket_pairs over collected primitive arrays), or the
    * tail (projection + the r17 sort barrier + global orderBy)? */
  private def embedDedupStages(
      s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import SimilarityQueries._
    System.err.println(s"[probe] ==== embed_dedup @ $dir")
    timed("cold full q_embed_dedup (pair-artifact build included)") {
      force(embedDedup.run(s, dir))
    }
    timed("warm full q_embed_dedup (artifact read, r20)") {
      force(embedDedup.run(s, dir))
    }
    val planes = embAutoWidth(s, dir)
    System.err.println(s"[probe] planes=$planes")
    val b = embBucketsAt(s, dir, planes)
    timed("stage: bucketed artifact scan only") { force(b) }
    timed("stage: live pair loop (the pre-r20 warm path, embPairsPlan)") {
      force(embPairsPlan(s, dir))
    }
    timed("warm full again") { force(embedDedup.run(s, dir)) }
  }

  /** q_pq_adc stage split + simhash candidate growth (r19 — kept as a
    * regression probe; the ADC fold and corpus-derived band width both
    * came out of these numbers, SCALE.md §r19). */
  private def pqStages(
      s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import SimilarityQueries._
    System.err.println(s"[probe] ==== pq @ $dir")
    timed("pq full (warm-up incl. training)") { force(pqAdc.run(s, dir)) }
    val cb = trainPqCodebooks(s, dir)
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
    timed("simhash full (warm-up)") { force(simhashPairs.run(s, dir)) }
    val sh = simhashDigest(s, dir).localCheckpoint(true)
    timed("simhash stage: digest only") { force(sh) }
    val bands = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 to 3).map(bd => struct(
        lit(bd).as("band"),
        shiftright(col("simhash"), bd * 8).bitwiseAND(lit(255L)).as("bv"))): _*))
        .as("bd"))
      .select(col("doc_id"), col("simhash"),
        col("bd.band").as("band"), col("bd.bv").as("bv"))
    val cand = bands.as("x").join(bands.as("y"), Seq("band", "bv"))
      .filter(col("x.doc_id") < col("y.doc_id"))
    val nCand = timed("simhash stage: candidate join count") { cand.count() }
    System.err.println(s"[probe] simhash raw candidates (8-bit bands): $nCand")
  }

  /** q_cluster_incremental stage split (r18 verdict #1; found the 72%
    * per-invocation batch-signing cost the batchSignatures artifact
    * now carries — SCALE.md §r19). */
  private def clusterIncStages(
      s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import SimilarityQueries._
    System.err.println(s"[probe] ==== clusterinc @ $dir")
    timed("cold full q_cluster_incremental (artifact builds included)") {
      force(clusterIncremental.run(s, dir))
    }
    timed("warm full q_cluster_incremental") {
      force(clusterIncremental.run(s, dir))
    }
    timed("warm labelTable read") { force(labelTable(s, dir)) }
    timed("warm newBatchSignatures (sign batch, no checkpoint)") {
      force(newBatchSignatures(s, dir))
    }
    timed("warm incrementalPairs (sign + ckpt + idx join + self join)") {
      force(incrementalPairs(s, dir))
    }
    val prior = labelTable(s, dir)
    val newNodes = s.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") >= IncrementalCutoff).select(col("doc_id"))
    timed("warm incrementalLabels (no orderBy)") {
      force(incrementalLabels(prior, newNodes,
        incrementalPairs(s, dir).select(col("id1"), col("id2"))))
    }
    timed("warm incrementalLabels + orderBy (the full query)") {
      force(incrementalLabels(prior, newNodes,
          incrementalPairs(s, dir).select(col("id1"), col("id2")))
        .select(col("n").as("doc_id"), col("lbl").as("component"))
        .orderBy(col("doc_id")))
    }
    timed("warm remap-only (prior union newNodes, no relabel join)") {
      force(prior.toDF("n", "lbl")
        .union(newNodes.toDF("n").select(col("n"), col("n").as("lbl"))))
    }
  }
}
