package graft

import org.apache.spark.sql.DataFrame
import graft.operators.{Bm25IndexOps, LshIndexOps, PersistentIndexOps, PqIndexOps}

/** The shared persistent-index lifecycle matrix (r15 stretch task):
  * ONE grid — build · serve · append · delete (+idempotence) · upsert
  * · compact — driven through the common [[PersistentIndexOps]]
  * surface against all three indexes (IVF-PQ, MinHash-LSH, BM25).
  * Every index answers the same questions:
  *
  *   1. build: each doc's matching query serves it;
  *   2. append: appended docs serve; pre-existing answers unchanged;
  *   3. delete: victims vanish from EVERY query's answer; repeated
  *      delete is a no-op (returns 0);
  *   4. upsert: the id serves under its NEW content, not its old;
  *   5. compact: the full answer set is row-identical across the
  *      physical rewrite, with tombstones actually purged.
  *
  * Fixtures are content-disjoint per identity (separate vocabularies /
  * independent Gaussian vectors, deterministic seeds), so "matching
  * query" is unambiguous for every index. A future fourth index joins
  * the family by implementing the trait and adding one Fixture row. */
class IndexFamilySpec extends SparkSpec {
  import spark.implicits._

  /** Per-index fixture: docs/queries builders over (id, contentId) —
    * contentId picks WHAT the document says, id names it. */
  private case class Fixture(
      ops: PersistentIndexOps,
      mkDocs: Seq[(Long, Long)] => DataFrame,
      mkQueries: Seq[(Long, Long)] => DataFrame)

  private def vectorOf(c: Long): Array[Float] = {
    val rnd = new scala.util.Random(c)
    Array.fill(64)(rnd.nextGaussian().toFloat)
  }
  /** Random-letter words seeded by c: different contents share almost
    * no character shingles (expected 3-gram overlap « 1), identical
    * contents share all — the LSH fixture needs shingle-space
    * disjointness, not merely distinct word spellings (w3x0 vs w1003x0
    * share most of their 3-grams). */
  private def lshTextOf(c: Long): String = {
    val rnd = new scala.util.Random(c)
    (0 until 12).map(_ =>
      (0 until 8).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString).mkString(" ")
  }
  private def bm25TextOf(c: Long): String =
    s"unique$c " + "shared filler words common to every document here"

  private val fixtures = Seq(
    Fixture(PqIndexOps,
      ids => ids.map { case (id, c) => (id, vectorOf(c)) }.toDF("vec_id", "embedding"),
      qs => qs.map { case (q, c) => (q, vectorOf(c)) }.toDF("vec_id", "embedding")),
    Fixture(LshIndexOps,
      ids => ids.map { case (id, c) => (id, lshTextOf(c)) }.toDF("doc_id", "text"),
      qs => qs.map { case (q, c) => (q, lshTextOf(c)) }.toDF("doc_id", "text")),
    Fixture(Bm25IndexOps,
      ids => ids.map { case (id, c) => (id, bm25TextOf(c)) }.toDF("doc_id", "text"),
      qs => qs.map { case (q, c) => (q, s"unique$c") }.toDF("query_id", "qtext")))

  private val Q = 10000L // query ids live in their own range (LSH drops self-pairs)

  for (f <- fixtures) test(s"${f.ops.name}: build/serve/append/delete/upsert/compact grid") {
    val ops = f.ops
    val path = java.nio.file.Files.createTempDirectory(s"graft_fam_${ops.name}").toString
    def serveSet(qs: Seq[(Long, Long)]): Set[(Long, Long)] =
      ops.serve(spark, path, f.mkQueries(qs))
        .as[(Long, Long)].collect().toSet

    val baseIds = (1L to 30L).map(i => (i, i))
    ops.build(spark, path, f.mkDocs(baseIds))

    // 1. build: every doc's matching query serves it
    val sample = Seq(1L, 7L, 15L, 30L)
    val base = serveSet(sample.map(i => (Q + i, i)))
    sample.foreach(i => assert(base.contains((Q + i, i)),
      s"${ops.name}: doc $i must serve its matching query after build"))

    // 2. append: new docs serve, old answers unchanged
    val extraIds = (31L to 36L).map(i => (i, i))
    ops.append(spark, path, f.mkDocs(extraIds))
    val afterAppend = serveSet((sample ++ Seq(33L)).map(i => (Q + i, i)))
    assert(afterAppend.contains((Q + 33L, 33L)),
      s"${ops.name}: appended doc must serve")
    sample.foreach(i => assert(afterAppend.contains((Q + i, i)),
      s"${ops.name}: append must not change existing answers"))

    // 3. delete: victims vanish everywhere; idempotent
    val victims = Seq(7L, 15L, 33L)
    assert(ops.delete(spark, path, victims.toDF(ops.docIdCol)) == victims.size,
      s"${ops.name}: delete must count the victims")
    assert(ops.delete(spark, path, victims.toDF(ops.docIdCol)) == 0L,
      s"${ops.name}: repeated delete must be a no-op")
    val allQs = ((1L to 36L).map(i => (Q + i, i)))
    val afterDelete = serveSet(allQs)
    assert(afterDelete.nonEmpty)
    victims.foreach(v => assert(!afterDelete.exists(_._2 == v),
      s"${ops.name}: tombstoned doc $v must vanish from every answer"))
    assert(afterDelete.contains((Q + 1L, 1L)),
      s"${ops.name}: non-victims must keep serving")

    // 4. upsert: id 3 now says what content 1003 says
    ops.upsert(spark, path, f.mkDocs(Seq((3L, 1003L))))
    val afterUpsert = serveSet(Seq((Q + 3L, 1003L), (Q + 4L, 3L)))
    assert(afterUpsert.contains((Q + 3L, 3L)),
      s"${ops.name}: upserted doc must serve under its NEW content")
    assert(!afterUpsert.exists { case (q, m) => q == Q + 4L && m == 3L },
      s"${ops.name}: upserted doc must no longer serve its OLD content")

    // 5. compact: the full answer set is identical across the rewrite
    val before = serveSet(allQs ++ Seq((Q + 1003L, 1003L)))
    ops.compact(spark, path)
    val after = serveSet(allQs ++ Seq((Q + 1003L, 1003L)))
    assert(after == before,
      s"${ops.name}: compaction must not change any answer")
    victims.foreach(v => assert(!after.exists(_._2 == v),
      s"${ops.name}: purged victims stay gone after compaction"))
    // tombstone layouts are really purged where the index uses them
    assert(!new java.io.File(s"$path/deletes").exists() ||
           new java.io.File(s"$path/deletes").listFiles().isEmpty ||
           ops.name == "ivf-pq", // PQ deletes physically, no tombstones
      s"${ops.name}: compaction must purge the tombstone layout")
  }
}
