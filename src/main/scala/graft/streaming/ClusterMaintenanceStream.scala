package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.pipeline.BulkPipeline
import graft.similarity.SimilarityQueries

/** Streaming CLUSTER-LABEL maintenance — the missing write-side of
  * [[IndexDedupStream]] (r10 verdict #6): that stream FLAGS arriving
  * duplicates against the persisted signature index but never updates
  * the persisted label table, so "which cluster does this doc belong
  * to" goes stale the moment a batch lands. This job closes the loop:
  * every micro-batch
  *
  *   1. signs itself once (`bandProjection` — the pure-HOF projection
  *      the index contract requires),
  *   2. derives its candidate pairs: corpus-vs-batch against the
  *      persisted index (bucket join, index never re-read wholesale)
  *      plus batch-vs-batch (the micro-batch self-join — tiny),
  *   3. re-converges labels on the CONTRACTED graph
  *      ([[SimilarityQueries.incrementalLabels]] — O(new pairs) work,
  *      the q_cluster_incremental dataflow: prior components lift to
  *      their labels, only the relabel map is broadcast back),
  *   4. PROMOTES the updated label table (crash-safe aside-swap,
  *      [[BulkPipeline.writeAndPromote]] — a reader never sees a
  *      half-written table) and APPENDS the batch signatures to the
  *      index (the append-only maintenance IncrementalIndexSpec pins).
  *
  * `foreachBatch` batches are sequential by Structured Streaming's
  * contract, so label state never races; the batch id is ignored
  * because the promote is idempotent per content (a replayed batch
  * re-derives the same labels — doc ids are required to be NEW ids,
  * the append-only-corpus contract the incremental family already
  * declares).
  *
  * Scale shape: per micro-batch, only batch-sized frames shuffle; the
  * corpus-sized artifacts (index, label table) are read through
  * bucket/broadcast-semi paths and written append/promote — the same
  * economics as the batch incremental queries, just driven by a
  * stream clock. ClusterMaintenanceSpec proves the invariant that
  * makes this safe to run forever: after N micro-batches the label
  * table equals a ONE-SHOT batch relabel of the union corpus,
  * including batches that MERGE previously-separate components.
  */
object ClusterMaintenanceStream {

  /** One micro-batch of maintenance — factored out of the stream so
    * the spec can also drive it directly. `batch` must carry
    * (doc_id, text) with doc_ids not present in the prior corpus. */
  private[streaming] def maintainBatch(
      spark: SparkSession,
      batch: DataFrame,
      indexPath: String,
      labelPath: String): Unit = {
    val sigs = SimilarityQueries
      .bandProjection(batch.select(col("doc_id"), col("text")))
      .localCheckpoint(true) // feeds index join + self-join + append
    val idx = spark.read.parquet(indexPath)
    val corpusVsBatch = SimilarityQueries.incrementalCandidates(idx, sigs)
      .select(col("id1"), col("id2"))
    val inBatch = sigs.as("a")
      .join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    val prior = spark.read.parquet(labelPath)
    val newNodes = batch.select(col("doc_id")).distinct()
    val updated = SimilarityQueries.incrementalLabels(
      prior, newNodes, corpusVsBatch.union(inBatch))
    // promote BEFORE appending signatures: a crash between the two
    // leaves the index missing this batch's signatures (the batch
    // replays and re-appends) rather than an index that references
    // docs the label table has never seen
    BulkPipeline.writeAndPromote(updated, labelPath)
    sigs.select(col("doc_id"), col("band"), col("sig"))
      .write.mode("append").parquet(indexPath)
  }

  /** Start the maintenance stream over an NDJSON doc directory.
    * `indexPath` and `labelPath` must be seeded with the prior
    * corpus's signatures and converged labels (empty frames with the
    * right schema for a from-scratch corpus). */
  def start(
      spark: SparkSession,
      inputDir: String,
      indexPath: String,
      labelPath: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 1): StreamingQuery =
    spark.readStream
      .schema(IndexDedupStream.docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          maintainBatch(spark, batch, indexPath, labelPath)
      }
      .start()
}
