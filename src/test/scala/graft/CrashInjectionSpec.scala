package graft

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FilterFileSystem, Path, RawLocalFileSystem}

import graft.sources.Io

/** Exhaustive crash-window proof for the aside-swap protocol: a
  * fault-injecting FileSystem kills the writer after EVERY possible
  * number of mutating operations, and after each simulated crash a
  * reader must still resolve a complete previous or new value — never
  * nothing, never a torn write — and the next writer must heal and
  * succeed. This is the subclassed-FileSystem injection the protocol's
  * guarantees are stated against (stronger than hand-built crash
  * layouts: every window is hit, including ones we didn't think of). */
class CrashInjectionSpec extends SparkSpec {

  /** Delegating FS that throws once `budget` mutating calls (create /
    * rename / delete) have happened. Reads are free. */
  private class CrashFs(budget: Int) extends FilterFileSystem({
    val raw = new RawLocalFileSystem()
    raw.initialize(new URI("file:///"), new Configuration())
    raw
  }) {
    private var remaining = budget
    private def spend(): Unit = {
      if (remaining <= 0) throw new java.io.IOException("injected crash")
      remaining -= 1
    }
    override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                        replication: Short, blockSize: Long,
                        progress: org.apache.hadoop.util.Progressable)
        : org.apache.hadoop.fs.FSDataOutputStream = {
      spend()
      super.create(f, overwrite, bufferSize, replication, blockSize, progress)
    }
    override def rename(src: Path, dst: Path): Boolean = { spend(); super.rename(src, dst) }
    override def delete(f: Path, recursive: Boolean): Boolean = { spend(); super.delete(f, recursive) }
  }

  private def freshFs(budget: Int) = new CrashFs(budget)
  private def unlimited = new CrashFs(Int.MaxValue)

  test("state swap survives a crash after EVERY mutating operation") {
    // upper bound on ops per writeStateAtomic: recover(≤2) + create +
    // stale-delete + rename-aside + rename-in + delete-aside = 7
    val maxOps = 8
    for (budget <- 0 until maxOps) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_crash_$budget")
      val stateP = new Path(dir.resolve("s").toString)
      Io.writeStateAtomic(unlimited, stateP, "v1") // healthy baseline
      val crashed =
        try { Io.writeStateAtomic(freshFs(budget), stateP, "v2"); false }
        catch { case e: Exception if e.getMessage != null &&
          (e.getMessage.contains("injected crash") ||
           e.getMessage.contains("swap")) => true }
      // whatever the crash point: a reader sees a COMPLETE v1 or v2
      val seen = Io.readStateString(unlimited, stateP)
      assert(seen.contains("v1") || seen.contains("v2"),
        s"budget=$budget crashed=$crashed left unreadable state: $seen")
      // and the next healthy writer heals whatever the crash left
      Io.writeStateAtomic(unlimited, stateP, "v3")
      assert(Io.readStateString(unlimited, stateP).contains("v3"),
        s"budget=$budget: post-crash writer failed to heal")
      assert(!unlimited.exists(new Path(stateP.toString + ".old")),
        s"budget=$budget: aside not collected after heal")
    }
  }

  test("a torn tmp write never becomes visible state") {
    // crash exactly after create (tmp open, content possibly partial):
    // recover(0 checks) + create = budget 1 on a fresh path
    val dir = java.nio.file.Files.createTempDirectory("graft_crash_torn")
    val stateP = new Path(dir.resolve("s").toString)
    Io.writeStateAtomic(unlimited, stateP, "good")
    intercept[Exception] {
      Io.writeStateAtomic(freshFs(1), stateP, "torn-never-visible")
    }
    assert(Io.readStateString(unlimited, stateP).contains("good"))
  }
}
