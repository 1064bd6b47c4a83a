package graft
import graft.util.GraftSession
import org.apache.spark.sql.functions._
/** One-off scale smoke (not part of the driver contract): build a
  * 20k-doc / 20k-vector corpus and time the heavy operators to show
  * the shapes scale linearly, not quadratically. */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/tmp/graft_sfbig"
    val words = (0 until 5000).map(i => s"w$i")
    val rnd = new scala.util.Random(1)
    val docs = (0 until 20000).map { i =>
      // 100-token docs; 5% are near-dups of doc i-1 (one token changed)
      val base = Array.fill(100)(words(rnd.nextInt(words.length)))
      val text = base.mkString(" ")
      (i.toLong, text, Seq("en","de","fr","es")(i % 4), "src", text.length.toLong)
    }
    docs.toDF("doc_id","text","lang","source","n_chars")
      .repartition(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val embs = (0 until 20000).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat).toSeq, i % 8)
    }
    embs.toDF("vec_id","embedding","label")
      .repartition(32).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def time(n: String): Unit = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"SMOKE $n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    Seq("q_dedup","q_minhash_lsh","q_ngram_jaccard","q_dedup_components",
      "q_simhash","q_lang_id","q_pii_scrub","q_repetition","q_contamination",
      "q_substr_dedup","q_bigram_score","q_image_hash",
      "q_pack","q_vocab","q_embed_quant","q_ann_lsh","q_ann_ivf",
      "q_cosine_topk","q_embed_dedup",
      "q_tfidf","q_bpe_train","q_mix_sample","q_kmeans_cluster",
      "q_semantic_dedup","q_chunk","q_winnow","q_entropy",
      "q_simhash_pairs","q_quality_clf","q_colloc",
      "q_minhash_est","q_dedup_keep_best","q_bpe_apply","q_knn_graph",
      "q_countmin","q_dupe_stats").foreach(time)
    spark.stop()
  }
}
