package graft.util

import java.nio.file.Files
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.scalatest.funsuite.AnyFunSuite

/** The lease-claim edge cases of [[WriterFence]] (r15 advice): a
  * create that SUCCEEDS but whose token write faults mid-stream leaves
  * a half-written lock carrying a prefix of our token. Classifying
  * that by body ("token != ours → foreign writer") stranded the
  * garbage lock, blocking every writer for the full staleness
  * window — the create outcome, not the body, is the ground truth for
  * "whose file is this". */
class WriterFenceSpec extends AnyFunSuite {

  private def localFs: RawLocalFileSystem = {
    val fs = new RawLocalFileSystem
    fs.initialize(java.net.URI.create("file:///"), new Configuration())
    fs
  }

  /** A RawLocalFileSystem whose create() flushes an 8-byte PREFIX of
    * whatever is written, then faults — the partial-own-token shape. */
  private class MidWriteFaultFs extends RawLocalFileSystem {
    override def create(f: Path, overwrite: Boolean): FSDataOutputStream = {
      val inner = super.create(f, overwrite)
      new FSDataOutputStream(new java.io.OutputStream {
        override def write(b: Int): Unit =
          throw new java.io.IOException("injected single-byte fault")
        override def write(b: Array[Byte], off: Int, len: Int): Unit = {
          inner.write(b, off, math.min(len, 8))
          inner.close()
          throw new java.io.IOException("injected mid-write fault")
        }
        override def close(): Unit = ()
      }, null)
    }
  }

  test("a mid-write fault on our OWN successful create surfaces the fault and never strands a half-written lock") {
    val dir = Files.createTempDirectory("fence").toString
    val faulty = new MidWriteFaultFs
    faulty.initialize(java.net.URI.create("file:///"), new Configuration())
    val e = intercept[java.io.IOException] {
      WriterFence.withLease(faulty, dir, "spec artifact") { _ =>
        fail("lease body must not run after a failed claim")
      }
    }
    assert(e.getMessage.contains("injected"),
      s"the injected fault must surface, not a writer-conflict misfile: $e")
    // the half-written lock was REMOVED: a fresh writer claims
    // immediately instead of stalling for the staleness window
    var ran = false
    WriterFence.withLease(localFs, dir, "spec artifact") { _ => ran = true }
    assert(ran, "a later writer was blocked by a stranded partial claim")
  }

  test("a live foreign lease still rejects a second writer loudly") {
    val dir = Files.createTempDirectory("fence2").toString
    val fs = localFs
    WriterFence.withLease(fs, dir, "spec artifact") { _ =>
      intercept[WriterFence.ConcurrentWriterException] {
        WriterFence.withLease(fs, dir, "spec artifact") { _ =>
          fail("second writer must not enter")
        }
      }
    }
  }
}
