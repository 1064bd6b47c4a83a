package graft.similarity

import org.apache.spark.sql.functions._

/** Stage probe for q_cluster_incremental (r18 verdict #1): decompose
  * the warm 13.6s at the docs1000 tier into (a) batch signing +
  * candidate joins ([[SimilarityQueries.incrementalPairs]]), (b) the
  * contracted-graph convergence ([[SimilarityQueries.incrementalLabels]]
  * minus the final remap), (c) the corpus-scale remap union, and
  * (d) the terminal orderBy. Scratch harness — same protocol as the
  * r17 q_embed_dedup probe (SCALE.md §r17); numbers land in SCALE.md
  * §r19 and the probe is deleted or kept as-is, never wired into the
  * query registry.
  */
object ProbeClusterInc {
  private def timed[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  private def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(graft.ScaleSmoke.docsCorpusDir(1000))
    val s = graft.util.GraftSession.build("graft-probe-clusterinc")
    s.sparkContext.setLogLevel("WARN")
    import SimilarityQueries._

    // ---- one warm pass builds the session artifacts (labelTable,
    // signatureIndex, shingle artifact) exactly like Bench's warm-up
    timed("cold full q_cluster_incremental (artifact builds included)") {
      force(clusterIncremental.run(s, dir))
    }
    timed("warm full q_cluster_incremental") {
      force(clusterIncremental.run(s, dir))
    }

    // ---- stage (a): the shared pair source
    timed("warm labelTable read") { force(labelTable(s, dir)) }
    timed("warm newBatchSignatures (sign batch, no checkpoint)") {
      force(newBatchSignatures(s, dir))
    }
    timed("warm incrementalPairs (sign + ckpt + idx join + self join)") {
      force(incrementalPairs(s, dir))
    }

    // ---- stage (b)+(c): incrementalLabels minus / plus the remap
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

    // ---- micro: the remap alone over a precomputed relabel-free path
    // (how much is the union+broadcast scan of corpus-scale labels?)
    timed("warm remap-only (prior union newNodes, no relabel join)") {
      force(prior.toDF("n", "lbl")
        .union(newNodes.toDF("n").select(col("n"), col("n").as("lbl"))))
    }
    s.stop()
  }
}
