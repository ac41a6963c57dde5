package graft.plans

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** NiFi EL JSON-mutation family (jsonPathDelete / jsonPathSet /
  * jsonPathAdd / jsonPathPut — the write half of the EL's jsonPath
  * support; the read half is Spark's codegen'd `get_json_object`).
  *
  * One eval-only expression per row: parse with Jackson (the JSON
  * library Spark itself ships), navigate a JsonPath SUBSET — `$`,
  * `.field`, `[index]` — apply the mutation, re-serialize compactly
  * with Jackson's insertion-order-preserving writer, so output bytes
  * are deterministic. A path that does not resolve leaves the document
  * UNCHANGED (NiFi's behavior for delete; the conservative choice for
  * the others — a flow must not fabricate structure from a typo'd
  * path). Invalid JSON input yields null.
  *
  * The mutation value argument is typed by JSON-literal parse: a value
  * that reads as a JSON number/boolean/null mutates as that scalar,
  * anything else as a string — matching how NiFi coerces the EL's
  * string arguments into JSON scalars.
  *
  * CodegenFallback: these appear in EL-driven attribute updates, not
  * 100 TB scan hot paths; the read-side jsonPath stays codegen'd.
  */
case class JsonPathMutate(child: Expression, path: String, op: String,
                          args: Seq[String]) extends UnaryExpression with CodegenFallback {
  require(Set("delete", "set", "add", "put").contains(op), s"unknown json op $op")
  override def dataType: DataType = StringType
  // invalid JSON yields null regardless of the child's nullability
  override def nullable: Boolean = true
  override def prettyName: String = s"graft_json_path_$op"

  @transient private lazy val mapper = new ObjectMapper()

  /** $.a.b[2].c → Seq("a", "b", "2", "c") with indices marked. */
  @transient private lazy val segments: Seq[Either[String, Int]] = {
    require(path.startsWith("$"), s"json path must start with $$: $path")
    val out = scala.collection.mutable.ArrayBuffer.empty[Either[String, Int]]
    var i = 1
    while (i < path.length) {
      path.charAt(i) match {
        case '.' =>
          val j0 = i + 1
          var j = j0
          while (j < path.length && path.charAt(j) != '.' && path.charAt(j) != '[') j += 1
          require(j > j0, s"empty field segment in $path")
          out += Left(path.substring(j0, j))
          i = j
        case '[' =>
          val j = path.indexOf(']', i)
          require(j > i + 1, s"bad index segment in $path")
          out += Right(path.substring(i + 1, j).trim.toInt)
          i = j + 1
        case other => throw new IllegalArgumentException(s"bad json path char '$other' in $path")
      }
    }
    out.toSeq
  }

  private def navigate(root: JsonNode, segs: Seq[Either[String, Int]]): JsonNode =
    segs.foldLeft(root) {
      case (null, _) => null
      case (n, Left(f)) => if (n.isObject && n.has(f)) n.get(f) else null
      case (n, Right(ix)) => if (n.isArray && ix >= 0 && ix < n.size) n.get(ix) else null
    }

  /** Coerce a mutation argument: JSON scalar literal if it parses as
    * one, string node otherwise. */
  private def valueNode(s: String): JsonNode =
    try {
      val n = mapper.readTree(s)
      if (n.isNumber || n.isBoolean || n.isNull) n
      else mapper.getNodeFactory.textNode(s)
    } catch { case _: Exception => mapper.getNodeFactory.textNode(s) }

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.toString
    val root = try mapper.readTree(text) catch { case _: Exception => return null }
    if (root == null) return null
    val changed: Boolean = op match {
      case "delete" =>
        if (segments.isEmpty) false
        else navigate(root, segments.init) match {
          case o: ObjectNode => segments.last match {
            case Left(f) if o.has(f) => o.remove(f); true
            case _ => false
          }
          case a: ArrayNode => segments.last match {
            case Right(ix) if ix >= 0 && ix < a.size => a.remove(ix); true
            case _ => false
          }
          case _ => false
        }
      case "set" =>
        if (segments.isEmpty) false
        else navigate(root, segments.init) match {
          case o: ObjectNode => segments.last match {
            case Left(f) if o.has(f) => o.set[JsonNode](f, valueNode(args.head)); true
            case _ => false
          }
          case a: ArrayNode => segments.last match {
            case Right(ix) if ix >= 0 && ix < a.size => a.set(ix, valueNode(args.head)); true
            case _ => false
          }
          case _ => false
        }
      case "add" =>
        navigate(root, segments) match {
          case a: ArrayNode => a.add(valueNode(args.head)); true
          case _ => false
        }
      case "put" =>
        navigate(root, segments) match {
          case o: ObjectNode => o.set[JsonNode](args.head, valueNode(args(1))); true
          case _ => false
        }
    }
    UTF8String.fromString(if (changed) mapper.writeValueAsString(root) else text)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsonPathMutate {
  def apply(c: Column, path: String, op: String, args: Seq[String] = Nil): Column =
    ColumnBridge.column(JsonPathMutate(ColumnBridge.expression(c), path, op, args))
}

/** Full chained Jolt transform ([[graft.operators.Jolt]] interpreter):
  * JSON string → JSON string per the chained spec. The spec parses and
  * validates ONCE per expression instance (then per executor after
  * serialization — `@transient lazy`), so per-row cost is one Jackson
  * parse + the tree walk; unparseable input yields null (the failure
  * relationship). CodegenFallback by the [[JsonPathMutate]] rationale:
  * this is a record-restructuring stage, not a 100 TB scan predicate. */
case class JoltTransform(child: Expression, specJson: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jolt"

  // JVM-wide cache: one compiled chain per spec string per executor,
  // not per task attempt (r19 — also removes the per-task share of the
  // first-evaluation warmup the m100 receipt flagged)
  @transient private lazy val transform =
    graft.operators.Jolt.transformStringCached(specJson)

  override protected def nullSafeEval(input: Any): Any = {
    val out = transform(input.asInstanceOf[UTF8String].toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JoltTransform {
  def apply(c: Column, specJson: String): Column =
    ColumnBridge.column(JoltTransform(ColumnBridge.expression(c), specJson))
}
