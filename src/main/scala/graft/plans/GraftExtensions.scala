package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `SparkSessionExtensions` hook registering graft's native expressions
  * as SQL functions, so `spark.sql("SELECT graft_cosine(a, b) ...")`
  * works cluster-wide. Enable with:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(children(0), children(1))))
    // graft_hmac(payload, key [, algorithm]) — key/algorithm must be
    // literals (flow config, not data; mirrors Records.macContent)
    ext.injectFunction((
      new FunctionIdentifier("graft_hmac"),
      new ExpressionInfo(classOf[HmacExpr].getName, "graft_hmac"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2 || children.size == 3,
          "graft_hmac(payload, key [, algorithm])")
        def lit(i: Int, what: String): String = {
          require(children(i).foldable, s"graft_hmac $what must be a literal")
          children(i).eval().toString
        }
        val algo = if (children.size == 3) lit(2, "algorithm") else "HmacSHA256"
        HmacExpr(org.apache.spark.sql.catalyst.expressions.Cast(
            children(0), org.apache.spark.sql.types.BinaryType),
          algo, lit(1, "key").getBytes("UTF-8"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_fuzzy_hash"),
      new ExpressionInfo(classOf[FuzzyHashExpr].getName, "graft_fuzzy_hash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // arity-check + binary cast like graft_hmac above: without the
        // cast a struct argument would hash its InternalRow debug
        // string, which varies with the physical representation
        require(children.size == 1, "graft_fuzzy_hash(content)")
        FuzzyHashExpr(org.apache.spark.sql.catalyst.expressions.Cast(
          children.head, org.apache.spark.sql.types.BinaryType))
      }))
  }
}
