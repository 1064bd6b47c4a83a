package graft.util

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the unified derived-artifact cache (r12 verdict #7):
  * stamp sensitivity, hit re-validation, and dead-entry sweeping —
  * the invariants the six hand-rolled predecessors implemented
  * inconsistently. */
class ArtifactCacheSpec extends AnyFunSuite {

  test("datasetStamp changes with content length even at identical mtime") {
    val f = Files.createTempFile("acache", ".parquet")
    Files.write(f, "aaaa".getBytes("UTF-8"))
    val mtime = 1700000000000L
    f.toFile.setLastModified(mtime)
    val s1 = ArtifactCache.datasetStamp(f.toString)
    // same-second rewrite with different content: mtime pinned equal
    Files.write(f, "aaaaaaaa".getBytes("UTF-8"))
    f.toFile.setLastModified(mtime)
    val s2 = ArtifactCache.datasetStamp(f.toString)
    assert(s1 !== s2, "length must join mtime in the stamp")
    assert(ArtifactCache.stamp(s1) !== ArtifactCache.stamp(s2))
    assert(ArtifactCache.stamp(s1).length === 32, "128-bit hex stamp")
  }

  test("getOrBuild: caches, re-validates hits, rebuilds invalid entries") {
    val c = new ArtifactCache[String]("spec")
    var builds = 0
    def build(): String = { builds += 1; s"v$builds" }
    assert(c.getOrBuild("k", _ => true)(build()) === "v1")
    assert(c.getOrBuild("k", _ => true)(build()) === "v1", "hit rebuilt")
    assert(builds === 1)
    // an invalidated hit rebuilds in place
    assert(c.getOrBuild("k", _ != "v1")(build()) === "v2")
    assert(c.getOrBuild("k", _ != "v1")(build()) === "v2")
    assert(builds === 2)
  }

  test("getOrBuild: at most one builder per key under concurrency (ADVICE r13)") {
    // Builds with filesystem/catalog side effects (deleteRecursively +
    // DROP TABLE + saveAsTable) must never interleave: two racing
    // callers on one key get ONE build, the loser blocking until the
    // winner's value lands. Distinct keys must still build in parallel
    // (the lock is per-key, not cache-global).
    val c = new ArtifactCache[String]("conc")
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val perKeyActive = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.atomic.AtomicInteger]()
    val overlapped = new java.util.concurrent.atomic.AtomicBoolean(false)
    def build(key: String): String = {
      val active = perKeyActive.computeIfAbsent(key,
        _ => new java.util.concurrent.atomic.AtomicInteger(0))
      if (active.incrementAndGet() > 1) overlapped.set(true)
      Thread.sleep(50)
      val n = builds.incrementAndGet()
      active.decrementAndGet()
      s"$key-v$n"
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 8).map { i =>
        val key = if (i % 2 == 0) "kA" else "kB"
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = c.getOrBuild(key, _ => true)(build(key))
        })
      }
      val results = futures.map(_.get(30, java.util.concurrent.TimeUnit.SECONDS))
      assert(!overlapped.get(), "two builders ran concurrently for one key")
      assert(builds.get() === 2, s"expected exactly one build per key, got ${builds.get()}")
      assert(results.toSet.size === 2, "losers did not observe the winner's value")
      assert(results.forall(r => r.startsWith("kA-") || r.startsWith("kB-")))
    } finally pool.shutdownNow()
  }

  test("sweep drops dead entries and leaves live ones") {
    val c = new ArtifactCache[Int]("spec2")
    c.getOrBuild("a", _ => true)(1)
    c.getOrBuild("b", _ => true)(2)
    c.sweep(_ == 1)
    assert(c.size === 1)
    assert(c.getOrBuild("b", _ => true)(99) === 2)
    assert(c.getOrBuild("a", _ => true)(3) === 3, "swept entry must rebuild")
  }
}
