package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Probe side of the SHARDED Bloom anti-join
  * ([[graft.operators.Sketches.bloomAntiJoin]]): `child` is the
  * already-computed `xxhash64(key)` (seed 42 — the same hash the build
  * inserted with `putLong`), and this expression reuses that ONE hash
  * for both the shard dispatch (`floorMod(h, S)` → array index) and
  * the membership probe (`mightContainLong(h)`).
  *
  * This replaces r11's S-branch `when`-chain, which re-evaluated
  * `pmod(xxhash64(key), S)` inside every branch condition unless
  * codegen subexpression elimination happened to common them — up to
  * S hash evaluations per probed row in the interpreted path. Here
  * the structure itself guarantees one hash, one array load, one
  * filter probe per row, in both eval and codegen paths.
  *
  * Shards absent from `blobs` (hash ranges with no history keys) are
  * definite misses. The filter blobs ride the expression as plan
  * references — ONE copy per task closure, not S per-branch literals;
  * the total-filter-bytes plan/driver ceiling this implies at very
  * large history is documented at `bloomAntiJoin`.
  */
case class ShardedBloomMightContain(blobs: Map[Int, Array[Byte]], shards: Int,
                                    child: Expression)
    extends UnaryExpression {
  require(shards > 0, s"ShardedBloomMightContain: shards must be > 0, got $shards")
  require(blobs.keys.forall(s => s >= 0 && s < shards),
    s"ShardedBloomMightContain: blob shard ids must be in [0, $shards)")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_sharded_bloom_might_contain"

  // deserialized once per task (the lazy val re-runs after closure
  // deserialization on the executor); index = shard id, null = absent
  @transient private lazy val filters: Array[BloomFilter] = {
    val arr = new Array[BloomFilter](shards)
    blobs.foreach { case (s, b) => arr(s) = BloomFilter.readFrom(new ByteArrayInputStream(b)) }
    arr
  }

  override protected def nullSafeEval(h: Any): Any = {
    val hash = h.asInstanceOf[Long]
    val f = filters(java.lang.Math.floorMod(hash, shards.toLong).toInt)
    f != null && f.mightContainLong(hash)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fRef = ctx.addReferenceObj("shardFilters", filters,
      "org.apache.spark.util.sketch.BloomFilter[]")
    nullSafeCodeGen(ctx, ev, h => {
      val f = ctx.freshName("bf")
      s"""
         |org.apache.spark.util.sketch.BloomFilter $f =
         |  $fRef[(int) java.lang.Math.floorMod($h, ${shards}L)];
         |${ev.value} = $f != null && $f.mightContainLong($h);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
