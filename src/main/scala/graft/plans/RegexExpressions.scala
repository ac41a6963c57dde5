package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-match regex group capture (r19 optimization round).
  *
  * The multi-field regex parsers (ParseCEF, ExtractEmailHeaders) were
  * built from per-field `when(l.rlike(pat), regexp_extract(l, pat, i))`
  * pairs: every FIELD re-ran the full pattern match — ParseCEF executed
  * its 8-alternation header regex ~9× per row (1 rlike + 8 extracts),
  * plus 2 more runs per extension key. This expression runs the matcher
  * ONCE and returns all capture groups as an array:
  *
  *   - no match (find() fails)  → NULL array — the exact value the
  *     `when(rlike, …)` guard produced per field;
  *   - match                    → groups 1..n, with a non-participating
  *     group mapped to "" exactly like `regexp_extract`.
  *
  * Callers materialize the array as its own projection column;
  * `CollapseProject` never inlines a non-cheap expression referenced
  * more than once, so the match is guaranteed to run once per row no
  * matter how many fields read from it. Same `Pattern.compile`
  * semantics and the same `find()` entry point as RLike/RegExpExtract,
  * so the matched spans are identical by construction. */
case class RegexGroups(child: Expression, pattern: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_regex_groups"

  @transient private lazy val compiled = java.util.regex.Pattern.compile(pattern)

  override protected def nullSafeEval(input: Any): Any = {
    val m = compiled.matcher(input.asInstanceOf[UTF8String].toString)
    if (!m.find()) null
    else {
      val n = m.groupCount()
      val arr = new Array[AnyRef](n)
      var i = 1
      while (i <= n) {
        val g = m.group(i)
        arr(i - 1) = UTF8String.fromString(if (g == null) "" else g)
        i += 1
      }
      new GenericArrayData(arr)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegexExpressions {
  def regexGroups(c: Column, pattern: String): Column =
    ColumnBridge.column(RegexGroups(ColumnBridge.expression(c), pattern))
}
