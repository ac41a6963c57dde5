package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

import graft.plans.{HashedShingles, MinHashSignature, SortedIntersectCount}

/** Property tests for the native text-hash expressions against
  * straightforward Scala reference implementations. */
object TextHashProps extends Properties("TextHash") {

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).map(_.take(8))
  private val text: Gen[String] = Gen.nonEmptyListOf(word).map(_.mkString(" ")).map(_.take(400))

  private def shingleSet(s: String, n: Int): Set[String] = {
    val bytes = s.getBytes("UTF-8")
    val windows = math.max(bytes.length - n + 1, 1)
    (0 until windows).map(i => new String(bytes, i, math.min(n, bytes.length - i), "UTF-8")).toSet
  }

  private def evalShingles(s: String, n: Int): Array[Long] =
    HashedShingles(Literal(UTF8String.fromString(s)), n).eval(null)
      .asInstanceOf[ArrayData].toLongArray()

  private def evalMinhash(s: String, n: Int, k: Int): Array[Long] =
    MinHashSignature(Literal(UTF8String.fromString(s)), n, k).eval(null)
      .asInstanceOf[ArrayData].toLongArray()

  property("hashedShingles: sorted, distinct, count matches reference") =
    Prop.forAll(text) { s =>
      val hs = evalShingles(s, 3)
      val sortedDistinct = hs.sorted.sameElements(hs) && hs.distinct.length == hs.length
      sortedDistinct && hs.length == shingleSet(s, 3).size
    }

  property("sortedIntersectCount equals set-intersection size") =
    Prop.forAll(text, text) { (a, b) =>
      val ia = evalShingles(a, 3)
      val ib = evalShingles(b, 3)
      val got = SortedIntersectCount(
        Literal.create(ia, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
        Literal.create(ib, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
      ).eval(null).asInstanceOf[Int]
      got == ia.toSet.intersect(ib.toSet).size
    }

  property("sortedIntersectAtLeast: exact count iff reachable, else -1") =
    Prop.forAll(text, text, Gen.choose(0, 50)) { (a, b, required) =>
      val ia = evalShingles(a, 3)
      val ib = evalShingles(b, 3)
      val arrTpe = org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)
      val truth = ia.toSet.intersect(ib.toSet).size
      val got = graft.plans.SortedIntersectAtLeast(
        Literal.create(ia, arrTpe), Literal.create(ib, arrTpe),
        Literal(required)
      ).eval(null).asInstanceOf[Int]
      if (truth >= required) got == truth else got == -1
    }

  property("minhash signature is deterministic and length-k") =
    Prop.forAll(text) { s =>
      val a = evalMinhash(s, 5, 64)
      val b = evalMinhash(s, 5, 64)
      a.length == 64 && a.sameElements(b)
    }

  property("minhash estimate tracks true jaccard within 4 sigma") =
    Prop.forAll(text, text) { (a, b) =>
      val sa = shingleSet(a, 5)
      val sb = shingleSet(b, 5)
      val trueJ = sa.intersect(sb).size.toDouble / sa.union(sb).size
      val ma = evalMinhash(a, 5, 64)
      val mb = evalMinhash(b, 5, 64)
      val est = ma.zip(mb).count { case (x, y) => x == y } / 64.0
      math.abs(est - trueJ) <= 0.25
    }

  property("identical strings agree on every minhash coordinate") =
    Prop.forAll(text) { s =>
      evalMinhash(s, 5, 32).sameElements(evalMinhash(s + "", 5, 32))
    }
}
