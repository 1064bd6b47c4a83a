package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}

/** Cross-process single-writer enforcement for the persisted index
  * artifacts (r13 verdict #1). The beam index's versioned-manifest
  * protocol and the signature index's batch-scoped appends both
  * DOCUMENTED single-writer as a contract but never enforced it: two
  * concurrent beam appenders each compute gen = parent + 1 and the
  * second manifest rename silently clobbers the first's commit — its
  * generation dirs become unreferenced garbage and its rows are lost
  * with no error. This fence makes the loser fail LOUDLY instead.
  *
  * Mechanics — a create-exclusive lease file (`_writer.lock`, the `_`
  * prefix keeps parquet readers blind to it) under the artifact root:
  *
  *  - ACQUIRE: `fs.create(path, overwrite = false)` is the atomic
  *    claim; the file body is a random token naming this writer. A
  *    live lease (younger than `staleMs`) fails the acquirer with
  *    [[ConcurrentWriterException]] — that is the whole point.
  *  - CRASH RECOVERY: a writer that died mid-transaction leaves its
  *    lease behind; a lease older than `staleMs` is presumed dead and
  *    stolen (delete + one re-claim attempt). Transactions longer
  *    than `staleMs` therefore risk losing the lease while alive —
  *    which is why commit points must re-[[check]] ownership: the
  *    fence converts that race into a loud abort BEFORE the
  *    destructive rename, never a silent clobber.
  *  - RELEASE: delete only if the body still holds OUR token — a
  *    stolen-and-reacquired lease belongs to the thief.
  *
  * This is the same lease-then-fence shape as HDFS lease recovery and
  * Delta/Iceberg's optimistic-commit-with-check: cheap on every
  * transaction (two tiny file ops), loud on every conflict.
  *
  * FILESYSTEM ASSUMPTIONS (r14 advice — the fence is only as strong
  * as the primitives under it):
  *
  *  - The atomic claim relies on `create(path, overwrite = false)`
  *    failing when the file exists. HDFS and `file://` with the
  *    default `LocalFileSystem`/`RawLocalFileSystem` honor this at
  *    the syscall level (`O_CREAT|O_EXCL`); object stores (S3A, ABFS
  *    without a metastore lock) implement it as check-then-create, so
  *    two writers racing inside the store's consistency window can
  *    BOTH claim. On such stores the fence degrades to best-effort —
  *    the commit-point [[Lease.check]] still narrows the clobber
  *    window to the read-check-rename gap but cannot close it; use
  *    the store's native conditional-put / a coordination service for
  *    hard exclusion there.
  *  - The staleness steal compares the lease file's mtime to THIS
  *    process's wall clock. Two machines with skewed clocks can steal
  *    a live lease early (or late); `check()` converts an early steal
  *    into a loud abort at the victim's commit point, so skew costs
  *    availability, never silent corruption. Keep `staleMs` well
  *    above both the longest in-lease transaction AND the plausible
  *    cross-machine skew.
  */
object WriterFence {

  /** Default crashed-writer recovery window. Batch jobs — where a
    * 15-minute worst-case recovery after a hard kill is acceptable —
    * use this; latency-sensitive streaming maintainers pass a smaller
    * window sized to their fenced transaction (see
    * [[graft.streaming.ClusterMaintenanceStream.StreamStaleMs]]). */
  val DefaultStaleMs: Long = 15 * 60 * 1000L

  /** A writer lost the race for an artifact's single-writer lease. */
  final class ConcurrentWriterException(msg: String)
    extends IllegalStateException(msg)

  /** An acquired lease: the root it guards and the token proving
    * ownership. [[check]] re-validates at commit points. */
  final case class Lease(fs: FileSystem, lockPath: Path, token: String) {

    /** Commit-point fence: require the lease file still carries OUR
      * token. A missing or foreign token means the lease was presumed
      * stale and stolen while this writer was alive (GC pause, long
      * transaction) — abort before touching the committed state. */
    def check(): Unit = {
      val current = readToken(fs, lockPath)
      if (!current.contains(token))
        throw new ConcurrentWriterException(
          s"writer lease at $lockPath was ${current.fold("removed")(t =>
            s"taken over by writer $t")} — this transaction exceeded the " +
            "staleness window and another writer claimed the artifact; " +
            "aborting before commit to avoid clobbering its state")
    }
  }

  private def readToken(fs: FileSystem, p: Path): Option[String] =
    if (!fs.exists(p)) None
    else scala.util.Try {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
    }.toOption.filter(_.nonEmpty)

  private def tryClaim(fs: FileSystem, p: Path, token: String): Boolean = {
    var created = false
    try {
      fs.mkdirs(p.getParent)
      val out = fs.create(p, false) // overwrite=false: the atomic claim
      created = true
      try out.write(token.getBytes("UTF-8")) finally out.close()
      true
    } catch {
      // Only a create-exclusive collision MEANS "another writer holds
      // the lease". A generic IOException is disambiguated (r14
      // advice — the old `if fs.exists(p)` guard misfiled transient
      // disk faults as writer conflicts, stalling the caller for the
      // whole staleness window):
      //  - our create SUCCEEDED (r15 advice): whatever the file now
      //    holds — empty, a partial prefix of our token, the full
      //    token — is OUR garbage from the faulted write/close. A
      //    body read would misfile a partial flush as "foreign
      //    writer" and strand a half-written lock that blocks all
      //    writers for the staleness window; the create outcome, not
      //    the body, is the ground truth. Delete and surface the
      //    fault.
      //  - create itself faulted: read the body — a foreign token
      //    means we genuinely lost the race; absent/unreadable means
      //    a transient fault (or a racer mid-claim between its create
      //    and write — never delete that): rethrow.
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case e: java.io.IOException =>
        if (created) {
          scala.util.Try(fs.delete(p, false))
          throw e
        }
        readToken(fs, p) match {
          case Some(t) if t != token => false
          case Some(_) => fs.delete(p, false); throw e
          case None => throw e
        }
    }
  }

  /** Run `body` holding the single-writer lease for `root`. Throws
    * [[ConcurrentWriterException]] if another live writer holds it.
    * `staleMs` is the crashed-writer recovery window — see the class
    * doc for why commit points must also call [[Lease.check]]. */
  def withLease[T](fs: FileSystem, root: String, what: String,
      staleMs: Long = DefaultStaleMs)(body: Lease => T): T = {
    val lockPath = new Path(root, "_writer.lock")
    val token = java.util.UUID.randomUUID().toString
    def claimOrFail(retryStale: Boolean): Unit =
      if (!tryClaim(fs, lockPath, token)) {
        val ageMs = scala.util.Try(
          System.currentTimeMillis() - fs.getFileStatus(lockPath).getModificationTime
        ).getOrElse(0L)
        if (retryStale && ageMs > staleMs) {
          // presumed-dead holder: steal once; the dead writer's replay
          // is cut off upstream by the idempotence guards, and a
          // NOT-dead holder fails its own commit-point check()
          fs.delete(lockPath, false)
          claimOrFail(retryStale = false)
        } else
          throw new ConcurrentWriterException(
            s"$what at $root is being written by another writer " +
              s"(lease ${readToken(fs, lockPath).getOrElse("?")}, " +
              s"age ${ageMs / 1000}s < stale window ${staleMs / 1000}s) — " +
              "single-writer is enforced; retry after it finishes")
      }
    claimOrFail(retryStale = true)
    val lease = Lease(fs, lockPath, token)
    try body(lease)
    finally // release only what is still ours — a thief owns it now
      if (readToken(fs, lockPath).contains(token)) fs.delete(lockPath, false)
  }
}
