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
