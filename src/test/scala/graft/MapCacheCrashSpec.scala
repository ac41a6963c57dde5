package graft

import org.apache.hadoop.fs.Path
import graft.operators.MapCache

/** MapCache compact crash windows (r6): the swap is rename-aside →
  * rename-in → delete-aside, so readers must see old-or-new at every
  * intermediate state — never an empty cache. Each window is simulated
  * by constructing the exact on-disk layout a crash there leaves. */
class MapCacheCrashSpec extends SparkSpec {
  import spark.implicits._

  private def freshCache(): String = {
    val path = java.nio.file.Files.createTempDirectory("graft-mc-crash").toString + "/cache"
    MapCache.put(Seq(("a", "1"), ("b", "2")).toDF("k", "v"), path, "k", "v")
    MapCache.put(Seq(("a", "9")).toDF("k", "v"), path, "k", "v")
    path
  }

  private def liveMap(path: String): Map[String, String] =
    MapCache.entries(spark, path).as[(String, String)].collect().toMap

  private def fs(path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("crash between rename-aside and rename-in: readers see the OLD cache, not empty") {
    val path = freshCache()
    val expected = liveMap(path)
    // simulate: replacement fully written, live renamed aside, crash
    val f = fs(path)
    MapCache.entries(spark, path).write.parquet(path + ".compact.tmp/gen=0")
    assert(f.rename(new Path(path), new Path(path + ".old")))
    assert(liveMap(path) === expected,
      "mid-swap readers must fall back to the aside — an empty read would route " +
      "every detectDuplicate key as non-duplicate")
    // fetch (the detectDuplicate probe path) also bridges the window
    val fetched = MapCache.fetch(Seq("a").toDF("k"), path, "k")
      .select("cached").as[Option[String]].head()
    assert(fetched.contains("9"))
  }

  test("the next writer heals a crashed swap and the log keeps working") {
    val path = freshCache()
    val f = fs(path)
    assert(f.rename(new Path(path), new Path(path + ".old")))
    // put() recovers the aside, then appends its generation on top
    MapCache.put(Seq(("c", "3")).toDF("k", "v"), path, "k", "v")
    assert(liveMap(path) === Map("a" -> "9", "b" -> "2", "c" -> "3"))
    assert(!f.exists(new Path(path + ".old")), "aside restored, not duplicated")
  }

  test("compact after a crash completes cleanly; stale aside is collected") {
    val path = freshCache()
    val f = fs(path)
    val expected = liveMap(path)
    assert(f.rename(new Path(path), new Path(path + ".old")))
    MapCache.compact(spark, path)
    assert(liveMap(path) === expected)
    assert(!f.exists(new Path(path + ".old")) && !f.exists(new Path(path + ".compact.tmp")))
    // crash window AFTER rename-in (stale aside left behind): live wins
    f.mkdirs(new Path(path + ".old/gen=0"))
    assert(liveMap(path) === expected)
    MapCache.compact(spark, path)
    assert(!f.exists(new Path(path + ".old")))
  }

  test("duplicate keys within one put resolve deterministically by max(value)") {
    val path = java.nio.file.Files.createTempDirectory("graft-mc-dup").toString + "/cache"
    MapCache.put(Seq(("a", "1"), ("a", "9"), ("a", "5")).toDF("k", "v"), path, "k", "v")
    (1 to 3).foreach { _ =>
      assert(liveMap(path) === Map("a" -> "9"), "ties must break by value, not row order")
    }
  }
}
