package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.similarity.SimilarityQueries

/** Streaming BEAM-INDEX maintenance — the ANN twin of
  * [[ClusterMaintenanceStream]], completing the index-maintenance
  * matrix (r11 verdict #3's last cell): the dedup side has
  * build/append/compact in batch plus streaming label maintenance;
  * the ANN side gained batch append in r12
  * ([[SimilarityQueries.beamIndexAppend]]) and this job drives it
  * from a stream clock. Vectors arrive as an NDJSON stream; each
  * micro-batch
  *
  *   1. APPENDS its vectors to the persisted corpus vector table —
  *      idempotent per batch id (batch-scoped file names via a hidden
  *      staging dir + rename, the [[ClusterMaintenanceStream]]
  *      machinery), because foreachBatch replays after a crash
  *      between the append and the checkpoint commit;
  *   2. appends them to the beam index: bucket assignment at the
  *      index's FROZEN LSH width, in-bucket kNN recomputed for ONLY
  *      the affected bucket leaves (dynamic partition overwrite),
  *      nodes re-ranked, fingers regenerated — work proportional to
  *      the touched buckets plus rank arithmetic, never a corpus
  *      re-sign. beamIndexAppend's new-vector anti-join doubles as
  *      the replay guard: a replayed batch finds its ids already in
  *      `nodes` and no-ops.
  *
  * AnnIndexStreamSpec proves the invariant that makes this safe to
  * run forever: after N micro-batches, beam search over the
  * maintained index EQUALS search over a one-shot index built from
  * the union corpus (the append ≡ rebuild contract, now under a
  * stream clock), including replayed batches.
  *
  * Scale shape: per micro-batch only batch-sized frames shuffle for
  * bucket assignment; the corpus-sized artifacts (vector table, kn
  * leaves) are read through pruned scans and written append/
  * partial-overwrite. The per-append re-rank is one sort of the node
  * table — the price of rank-space navigation, paid per batch, never
  * per search.
  */
object AnnIndexStream {

  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(DoubleType))))

  /** normEmb-shaped frame (vec_id, v, nrm) off a raw vector frame. */
  private def neOf(df: DataFrame): DataFrame =
    df.select(col("vec_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))

  /** One micro-batch of maintenance — factored out so the spec can
    * drive it directly. `batchId` < 0 skips replay bookkeeping. */
  private[streaming] def maintainBatch(
      spark: SparkSession,
      batch: DataFrame,
      corpusPath: String,
      indexRoot: String,
      batchId: Long = -1L): Unit = {
    if (batchId >= 0 &&
        ClusterMaintenanceStream.lastAppliedBatch(spark, corpusPath).exists(_ >= batchId))
      return
    // 1. corpus vector table append (idempotent per batch id)
    ClusterMaintenanceStream.appendBatchScoped(
      spark, batch.select(col("vec_id"), col("embedding")), corpusPath, batchId)
    // 2. index append: the anti-join inside finds exactly the new ids
    SimilarityQueries.beamIndexAppend(
      spark, neOf(spark.read.parquet(corpusPath)), indexRoot)
    if (batchId >= 0)
      ClusterMaintenanceStream.writeLastBatch(spark, corpusPath, batchId)
  }

  /** Beam search over the maintained index + corpus (queries =
    * vec_id < 5, the family's fixed probe set) — what a serving layer
    * reads between appends. */
  def search(spark: SparkSession, corpusPath: String, indexRoot: String): DataFrame =
    SimilarityQueries.beamSearchPlan(
      spark, indexRoot, neOf(spark.read.parquet(corpusPath)).localCheckpoint(true))

  /** Start the maintenance stream over an NDJSON vector directory.
    * `corpusPath` and `indexRoot` must be seeded with the prior
    * corpus's vectors and its beam index
    * ([[SimilarityQueries.beamIndexCreate]]). */
  def start(
      spark: SparkSession,
      inputDir: String,
      corpusPath: String,
      indexRoot: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 1): StreamingQuery =
    spark.readStream
      .schema(vecSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          maintainBatch(spark, batch, corpusPath, indexRoot, batchId)
      }
      .start()
}
