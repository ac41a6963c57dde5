package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** NiFi RouteOnAttribute / RouteOnContent, Spark-first.
  * (Capability reference: the NiFi 2.7 deployment in
  * /root/reference/dev.nifi.yaml:1 and /root/reference/README.md:1 —
  * flows configured there route FlowFiles by attribute/content.)
  *
  * NiFi routes each FlowFile to the first (or every) matching
  * relationship. Here each route is a lazily-planned `filter` over the
  * same scan: Catalyst pushes the predicate into the parquet source, so
  * consuming one route reads only what that route needs — no
  * materialization, no duplication of the input.
  *
  * Scale posture: routing is a narrow map-side op (zero shuffles). For a
  * single-pass "write all routes" flow, use [[tagged]] +
  * `write.partitionBy(routeCol)`.
  */
object Route {

  /** Multi-way predicate routing: route name -> filtered DataFrame.
    * Rows matching no predicate land in the `unmatched` route. A row
    * can match several routes (NiFi "Route to all matching"). */
  def onAttribute(df: DataFrame, routes: Seq[(String, Column)]): Map[String, DataFrame] = {
    require(routes.nonEmpty, "at least one route required")
    val matchedAny = routes.map(_._2).reduce(_ || _)
    routes.map { case (n, c) => n -> df.filter(c) }.toMap +
      ("unmatched" -> df.filter(!coalesce(matchedAny, lit(false))))
  }

  /** Single-pass tagged routing: ONE scan, adds `routeCol` holding the
    * FIRST matching route name in priority order (NiFi "Route to
    * 'matched' if any matches" with relationship priority). */
  def tagged(df: DataFrame, routes: Seq[(String, Column)], routeCol: String = "route"): DataFrame = {
    val tag = routes.foldRight(lit("unmatched")) { case ((n, c), acc) =>
      when(coalesce(c, lit(false)), lit(n)).otherwise(acc)
    }
    df.withColumn(routeCol, tag)
  }

  /** RouteOnContent: regex match against a content column.
    * `matchWhole = true` is NiFi's "content must match exactly" Match
    * Requirement (the regex must cover the WHOLE content); false is
    * "content must contain match" (find anywhere, the default). */
  def onContent(df: DataFrame, contentCol: String, routes: Seq[(String, String)],
                matchWhole: Boolean = false): Map[String, DataFrame] =
    onAttribute(df, routes.map { case (n, re) =>
      n -> contentPredicate(col(contentCol), re, matchWhole) })

  /** RouteOnContent, single-pass tagged form. */
  def taggedOnContent(df: DataFrame, contentCol: String, routes: Seq[(String, String)],
                      routeCol: String = "route",
                      matchWhole: Boolean = false): DataFrame =
    tagged(df, routes.map { case (n, re) =>
      n -> contentPredicate(col(contentCol), re, matchWhole) }, routeCol)

  private def contentPredicate(c: Column, re: String, whole: Boolean): Column =
    // \A..\z, not ^..$: Java's $ matches BEFORE a trailing newline, so
    // ^$ would accept "123\n" as exactly-digits (NiFi's matches() won't)
    if (whole) c.rlike(s"(?s)\\A(?:$re)\\z") else c.rlike(re)

  /** RouteOnAttribute straight from flow-definition-style configuration:
    * route name → NiFi Expression Language predicate string (exactly
    * what a NiFi flow definition stores as RouteOnAttribute dynamic
    * properties). Each EL predicate compiles to a Catalyst boolean via
    * [[graft.functions.El.compileExpr]] — so a flow's routing config
    * ports verbatim and still runs codegen'd. */
  def fromElConfig(df: DataFrame, routes: Seq[(String, String)]): Map[String, DataFrame] =
    onAttribute(df, routes.map { case (n, el) =>
      n -> graft.functions.El.compileExpr(el, df.columns.toSeq).cast("boolean") })

  /** Tagged single-pass form of [[fromElConfig]]. The input's column
    * set is supplied to the EL compiler, so matching-attribute
    * predicates (`${anyMatchingAttribute('err.*'):...}`) work in
    * routing config. */
  def taggedFromElConfig(df: DataFrame, routes: Seq[(String, String)],
                         routeCol: String = "route"): DataFrame =
    tagged(df, routes.map { case (n, el) =>
      n -> graft.functions.El.compileExpr(el, df.columns.toSeq).cast("boolean") }, routeCol)
}
