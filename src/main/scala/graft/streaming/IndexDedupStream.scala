package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming dedup against the PERSISTED signature index — the
  * continuous twin of `q_dedup_incremental`: documents arrive as an
  * NDJSON stream, each micro-batch computes its band signatures as a
  * PURE PROJECTION (SimilarityQueries.bandProjection — array HOFs, no
  * aggregation, hence no streaming state and no watermark needed) and
  * equi-joins the static bucketed index on (band, sig).
  *
  * Scale shape: the stream side shuffles only its own (tiny)
  * micro-batch on the band key; the index side is the same bucketed
  * scan the batch path pins (no exchange); state is ZERO — the only
  * long-lived artifact is the index table itself, which the batch
  * pipeline appends to (IncrementalIndexSpec pins append-only
  * maintenance). This is how a 100 TB corpus deduplicates a live feed
  * without ever re-reading itself.
  */
object IndexDedupStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** NDJSON doc stream → band-collision matches against the index.
    * Output: (doc_id, corpus_id, band) — one row per colliding band;
    * a downstream consumer treats any match as "candidate duplicate
    * of corpus_id" (the exact-verify stage is the batch pipeline's
    * q_edit_dist shape).
    */
  def matches(spark: SparkSession, inputDir: String, index: DataFrame): DataFrame =
    graft.similarity.SimilarityQueries.bandProjection(
        spark.readStream.schema(docSchema).json(inputDir))
      .join(
        index.select(
          col("doc_id").as("corpus_id"), col("band"), col("sig")),
        Seq("band", "sig"))
      .select(col("doc_id"), col("corpus_id"), col("band"))
}
