package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** NiFi RecordPath subset → Catalyst `Column` (the path language
  * UpdateRecord/EvaluateRecordPath/PartitionRecord configs use, the way
  * [[El]] compiles the Expression Language). Supported:
  *
  *  - `/a/b/c`        nested struct fields (`getField` chain)
  *  - `/arr[0]/x`     array index (RecordPath is 0-based; negative
  *                    counts from the end, `[-1]` = last)
  *  - `/arr[*]/x`     wildcard: the remaining path maps over every
  *                    element (result is an array column)
  *  - `/map['key']`   quoted key → map lookup (`element_at`)
  *
  * Everything compiles to codegen'd struct/array/map primitives — no
  * UDFs, no per-row interpretation. Bare names bind as struct fields
  * (schema-checked at PLAN time — a typo'd path fails analysis instead
  * of silently yielding nulls, stricter than NiFi); quoted keys bind
  * as map lookups and an absent key is null; out-of-range indexes are
  * null (element_at semantics). */
object RecordPath {

  private final case class Seg(name: String, suffix: Option[String])

  /** Parse `/a/b[0]/c['k']` → segments; brackets bind to the segment
    * they follow. */
  private def parse(path: String): List[Seg] = {
    require(path.startsWith("/"), s"RecordPath must start with '/': $path")
    path.drop(1).split("/").toList.filter(_.nonEmpty).map { raw =>
      val open = raw.indexOf('[')
      if (open < 0) Seg(raw, None)
      else {
        require(raw.endsWith("]"), s"unterminated index in segment '$raw'")
        Seg(raw.substring(0, open), Some(raw.substring(open + 1, raw.length - 1).trim))
      }
    }
  }

  private def applySuffix(c: Column, suffix: String, rest: List[Seg]): Column =
    suffix match {
      case "*" => // map the remaining path over every element
        if (rest.isEmpty) c
        else transform(c, e => descend(e, rest))
      case q if q.startsWith("'") && q.endsWith("'") && q.length >= 2 =>
        // try_element_at: an absent key is null even under ANSI mode
        descend(try_element_at(c, lit(q.substring(1, q.length - 1))), rest)
      case idx =>
        val i = idx.toInt // fail fast on junk
        // RecordPath 0-based from the front; try_element_at is 1-based,
        // counts negatives from the end, and nulls out-of-range
        // accesses instead of raising under ANSI mode
        descend(try_element_at(c, lit(if (i >= 0) i + 1 else i)), rest)
    }

  private def descend(c: Column, segs: List[Seg]): Column = segs match {
    case Nil => c
    case Seg(name, suffix) :: tail =>
      val base = if (name.isEmpty) c else c.getField(name)
      suffix match {
        case None => descend(base, tail)
        case Some(s) => applySuffix(base, s, tail)
      }
  }

  /** Compile against the top-level row: the first segment is a column. */
  def compile(path: String): Column = parse(path) match {
    case Nil => throw new IllegalArgumentException(s"empty RecordPath: $path")
    case Seg(name, suffix) :: tail =>
      require(name.nonEmpty, s"RecordPath root needs a field name: $path")
      suffix match {
        case None => descend(col(name), tail)
        case Some(s) => applySuffix(col(name), s, tail)
      }
  }

  /** Compile relative to an explicit root column (e.g. inside a
    * `transform` lambda or against a parsed payload struct). */
  def compile(path: String, root: Column): Column = descend(root, parse(path))

  // ------------------------------------------------------------ WRITE

  /** Rewrite `parent` so the path `segs` under it holds `value`;
    * everything else is structurally unchanged. Struct legs use
    * `withField` (which also CREATES an absent leaf — NiFi UpdateRecord
    * semantics); `[*]` maps the write over every element; `[i]`
    * rewrites one element (the others pass through `otherwise`, so an
    * indexed write can only SET an existing field — creating one would
    * give the branches different struct types); `['key']` upserts a map
    * entry (filter-then-concat, safe under Spark's default
    * EXCEPTION dedup policy). All codegen'd primitives, no UDFs. */
  private def setSegs(parent: Column, segs: List[Seg], value: Column): Column =
    segs match {
      case Nil => value
      case Seg(name, None) :: Nil =>
        parent.withField(name, value)
      case Seg(name, None) :: tail =>
        parent.withField(name, setSegs(parent.getField(name), tail, value))
      case Seg(name, Some(sfx)) :: tail =>
        val target = if (name.isEmpty) parent else parent.getField(name)
        val rewritten = rewriteSuffix(target, sfx, tail, value)
        if (name.isEmpty) rewritten else parent.withField(name, rewritten)
    }

  private def rewriteSuffix(target: Column, sfx: String, tail: List[Seg],
                            value: Column): Column = sfx match {
    case "*" =>
      transform(target, e =>
        if (tail.isEmpty) value else setSegs(e, tail, value))
    case q if q.startsWith("'") && q.endsWith("'") && q.length >= 2 =>
      require(tail.isEmpty,
        s"RecordPath write through a map key must end at the key (got trailing path after [$q])")
      val key = q.substring(1, q.length - 1)
      map_concat(map_filter(target, (k, _) => k =!= lit(key)),
        map(lit(key), value))
    case idx =>
      val i = idx.toInt
      val pos = if (i >= 0) lit(i) else size(target) + i
      transform(target, (e, j) =>
        when(j === pos, if (tail.isEmpty) value else setSegs(e, tail, value))
          .otherwise(e))
  }

  /** UpdateRecord's write half: SET `path` to `value` across the frame
    * — `/a/b/c` nested struct (creates the leaf if absent), `/arr[*]/x`
    * every element, `/arr[2]/x` one element (negative counts from the
    * end), `/map['k']` map upsert. The value column is evaluated
    * against the TOP-LEVEL row (outer references are fine inside the
    * array lambdas). */
  def update(df: org.apache.spark.sql.DataFrame, path: String,
             value: Column): org.apache.spark.sql.DataFrame = parse(path) match {
    case Nil => throw new IllegalArgumentException(s"empty RecordPath: $path")
    case Seg(name, None) :: Nil => df.withColumn(name, value)
    case Seg(name, None) :: tail =>
      df.withColumn(name, setSegs(col(name), tail, value))
    case Seg(name, Some(sfx)) :: tail =>
      df.withColumn(name, rewriteSuffix(col(name), sfx, tail, value))
  }
}
