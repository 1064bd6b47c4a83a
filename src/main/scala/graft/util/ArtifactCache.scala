package graft.util

import org.apache.spark.sql.SparkSession

/** THE per-dataset derived-artifact cache (r12 verdict #7): trained
  * centroids, persisted index table names, checkpointed edge frames
  * and warm search plans all share one lifecycle — "pure function of
  * (dataset file, semantic version), rebuilt when either changes,
  * re-validated on every hit, swept when the owning session dies" —
  * but each call site used to hand-roll it with slightly different
  * keys (raw `String` concat vs md5, mtime-only vs mtime+length,
  * swept vs leaking). One implementation makes the invariants
  * uniform:
  *
  *  - KEY MATERIAL is a 128-bit hex digest ([[stamp]]) of a
  *    descriptor that must include [[datasetStamp]] (path + mtime +
  *    LENGTH — a same-second rewrite still changes the digest; a
  *    32-bit hashCode collision once served the wrong persisted
  *    index, ADVICE r08) plus every semantic knob baked into the
  *    artifact (cutoffs, hash-family versions, algorithm tags).
  *  - SESSION-OWNED values (DataFrames, catalog table names) append
  *    [[sessionKey]] and validate with a session-aware predicate on
  *    every hit — a recycled identityHashCode after GC must rebuild,
  *    never serve RDDs of a dead context.
  *  - [[ArtifactCache.getOrBuild]] re-validates hits and
  *    [[ArtifactCache.sweep]] drops entries whose owner died, so
  *    long-lived JVMs (bench loops, notebooks) never pin dead
  *    sessions' blocks.
  */
final class ArtifactCache[V](val name: String) {
  private val m = scala.collection.concurrent.TrieMap.empty[String, V]
  // Per-key build lock: builds are NOT all side-effect-free (the
  // signature-index and label-table builds deleteRecursively + DROP
  // TABLE + saveAsTable), so a check-then-act race between two callers
  // on one session can interleave destructive filesystem/catalog work
  // (ADVICE r13). One builder per key at a time; the lock object is
  // interned per key and never removed (bounded by distinct key count,
  // which is bounded by distinct artifacts).
  private val locks = scala.collection.concurrent.TrieMap.empty[String, AnyRef]

  /** Cached value for `key` if still `valid`, else `build` and
    * remember. At most one builder runs for a given key at a time;
    * losers of the race re-check the cache under the lock and get the
    * winner's value. Distinct keys build concurrently. */
  def getOrBuild(key: String, valid: V => Boolean)(build: => V): V =
    m.get(key).filter(valid).getOrElse {
      val lock = locks.getOrElseUpdate(key, new AnyRef)
      lock.synchronized {
        // Re-check under the lock: a concurrent builder may have
        // finished while this caller was waiting.
        m.get(key).filter(valid).getOrElse {
          val v = build
          m.put(key, v)
          v
        }
      }
    }

  /** Drop entries whose value went dead (stopped session, deleted
    * artifact) — call before building a replacement so stale entries
    * can't pin resources for the JVM's lifetime. */
  def sweep(dead: V => Boolean): Unit =
    m.filterInPlace((_, v) => !dead(v))

  private[graft] def size: Int = m.size
}

object ArtifactCache {

  /** Plan a checkpointed artifact frame with AQE disabled so the
    * LogicalRDD keeps the child's outputPartitioning/outputOrdering.
    * Under AQE, `Dataset.localCheckpoint` records UnknownPartitioning
    * (runtime coalescing may change the layout before the plan is
    * final), which silently re-adds an Exchange under every keyed
    * consumer of the artifact — measured empirically on Spark 4.1
    * (GraphQueriesSpec pins the preserved case). Only the artifact's
    * own build plan runs non-adaptively; the flag is restored in a
    * finally, and consumers plan normally. */
  def planWithStablePartitioning[A](s: SparkSession)(f: => A): A = {
    val prev = s.conf.getOption("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try f
    finally prev match {
      case Some(v) => s.conf.set("spark.sql.adaptive.enabled", v)
      case None    => s.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  /** 128-bit hex digest of an artifact descriptor. */
  def stamp(descriptor: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(descriptor.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Dataset-file component of a descriptor: path, mtime AND length
    * (mtime alone misses a same-second rewrite). A missing file
    * stamps as mtime 0 / length 0 — callers that require existence
    * should `require` it loudly first, or the failure caches. */
  def datasetStamp(path: String): String = {
    val f = new java.io.File(path)
    s"$path@${f.lastModified()}@${f.length()}"
  }

  /** Session identity component for session-owned values. */
  def sessionKey(s: SparkSession): String =
    java.lang.Long.toHexString(System.identityHashCode(s).toLong & 0xffffffffL)

  /** The standard liveness predicate for session-owned DataFrames. */
  def sessionDead(s: SparkSession): Boolean = s.sparkContext.isStopped

  /** All persisted per-dataset artifact dirs and catalog-table paths
    * live under ONE tmp root, deterministic per (JVM pid) so rebuilds
    * overwrite in place instead of accumulating copies, and the whole
    * root is swept on JVM exit — artifacts are CACHES of pure
    * functions of a dataset, never durable state this sandbox must
    * keep. PER-JVM (r13): a shared root's exit sweep once deleted a
    * sibling JVM's live index files mid-query; each JVM owns
    * `graft_sig_idx_<pid>` and sweeps only that. Roots left by DEAD
    * pids (a crashed JVM never runs its hook) are reaped
    * opportunistically at first use. Moved here from SimilarityQueries
    * (r17) so every module's artifact writers — the shingle/embedding
    * tables, the signature/label indexes, the text module's gram
    * inventory — share one lifecycle. */
  lazy val artifactRoot: java.io.File = {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    val pid = ProcessHandle.current().pid()
    Option(tmp.listFiles()).foreach(_.foreach { f =>
      val n = f.getName
      if (f.isDirectory && n.startsWith("graft_sig_idx_")) {
        val owner = n.stripPrefix("graft_sig_idx_").toLongOption
        if (owner.exists(p => p != pid && !ProcessHandle.of(p).isPresent))
          deleteRecursively(f)
      }
    })
    val root = new java.io.File(tmp, s"graft_sig_idx_$pid")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      deleteRecursively(root)))
    root
  }

  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
