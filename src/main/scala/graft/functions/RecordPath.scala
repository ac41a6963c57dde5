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

  // -------------------------------------------------------- FUNCTIONS

  /** NiFi RecordPath standalone FUNCTIONS (r18) — the guide's common
    * string subset compiled onto builtin (codegen'd) Column ops. An
    * expression is a path (`/a/b`), a `'quoted'` literal, an integer,
    * or `fn(arg, ...)` with nested expressions as arguments:
    *
    *  - `toUpperCase(x)` / `toLowerCase(x)` / `trim(x)`
    *  - `concat(a, b, ...)` (string concat, non-strings cast)
    *  - `coalesce(a, b, ...)` (first non-null)
    *  - `substring(x, start, end)` — 0-based, start inclusive / end
    *    exclusive; a NEGATIVE index counts from the end (`length + i`,
    *    so -1 is the last index); out-of-range clamps to empty
    *  - `substringAfter(x, 'd')` / `substringBefore(x, 'd')` — text
    *    after/before the FIRST occurrence of d; the whole string when
    *    d is absent (the guide's not-found rule)
    *  - `replace(x, 'a', 'b')` literal / `replaceRegex(x, 're', 'b')`
    *  - `padLeft(x, n[, 'p'])` / `padRight(x, n[, 'p'])` — pad to
    *    length n (default pad `_`), never truncating
    *
    * Unknown functions and malformed argument lists throw HERE — the
    * processor-config moment, never per row. */
  def compileExpr(s: String): Column = {
    val t = s.trim
    if (t.startsWith("/")) compile(t)
    else if (t.startsWith("'") && t.endsWith("'") && t.length >= 2)
      lit(t.substring(1, t.length - 1))
    else if (t.matches("-?\\d+")) lit(t.toInt)
    else {
      val call = "([A-Za-z][A-Za-z0-9_]*)\\((.*)\\)".r
      t match {
        case call(fn, inner) => fnCall(fn, splitArgs(inner))
        case _ => throw new IllegalArgumentException(
          s"RecordPath expression: cannot parse '$t' (path, 'literal', int or fn(...))")
      }
    }
  }

  /** Split a function's argument list on TOP-LEVEL commas (quote- and
    * paren/bracket-aware: `concat(/a, substring(/b, 0, 2), /m['x,y'])`). */
  private def splitArgs(s: String): Seq[String] = {
    if (s.trim.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inQuote = false
    s.foreach { c =>
      c match {
        case '\'' => inQuote = !inQuote; cur += c
        case _ if inQuote => cur += c
        case '(' | '[' => depth += 1; cur += c
        case ')' | ']' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
        case _ => cur += c
      }
    }
    require(depth == 0 && !inQuote, s"RecordPath: unbalanced argument list '$s'")
    out += cur.toString.trim
    out.toSeq
  }

  /** One function call → Column. Literal-argument positions (indices,
    * delimiters, patterns) require literals — validated here. */
  private def fnCall(fn: String, args: Seq[String]): Column = {
    def n(k: Int): Unit = require(args.length == k,
      s"RecordPath $fn() takes $k arguments, got ${args.length}")
    def a(i: Int): Column = compileExpr(args(i))
    def str(i: Int): Column = a(i).cast("string")
    def litStr(i: Int): String = {
      val t = args(i).trim
      require(t.startsWith("'") && t.endsWith("'") && t.length >= 2,
        s"RecordPath $fn(): argument ${i + 1} must be a 'quoted literal', got '$t'")
      t.substring(1, t.length - 1)
    }
    def litInt(i: Int): Int = {
      val t = args(i).trim
      require(t.matches("-?\\d+"), s"RecordPath $fn(): argument ${i + 1} must be an integer")
      t.toInt
    }
    fn match {
      case "toUpperCase" => n(1); upper(str(0))
      case "toLowerCase" => n(1); lower(str(0))
      case "trim"        => n(1); trim(str(0))
      case "concat" =>
        require(args.length >= 2, "RecordPath concat() needs >= 2 arguments")
        concat(args.indices.map(str): _*)
      case "coalesce" =>
        require(args.length >= 2, "RecordPath coalesce() needs >= 2 arguments")
        coalesce(args.indices.map(a): _*)
      case "substring" =>
        n(3)
        val c = str(0)
        def idx(i: Int): Column =
          if (i >= 0) lit(i) else greatest(length(c) + i, lit(0))
        val from = idx(litInt(1))
        val until = idx(litInt(2))
        // builtin substring is 1-based (start, LENGTH); clamp to empty
        c.substr(from + 1, greatest(until - from, lit(0)))
      case "substringAfter" =>
        n(2)
        val c = str(0); val d = litStr(1)
        val at = instr(c, d)
        when(at > 0, c.substr(at + d.length, length(c))).otherwise(c)
      case "substringBefore" =>
        n(2)
        // substring_index returns the WHOLE string when the delimiter
        // is absent — exactly the guide's not-found rule
        substring_index(str(0), litStr(1), 1)
      case "replace" =>
        n(3); replace(str(0), lit(litStr(1)), lit(litStr(2)))
      case "replaceRegex" =>
        n(3)
        val re = litStr(1)
        java.util.regex.Pattern.compile(re) // reject a bad pattern at config time
        regexp_replace(str(0), re, litStr(2))
      case "padLeft" | "padRight" =>
        require(args.length == 2 || args.length == 3,
          s"RecordPath $fn() takes 2 or 3 arguments")
        val c = str(0); val len = litInt(1)
        val pad = if (args.length == 3) litStr(2) else "_"
        require(pad.nonEmpty, s"RecordPath $fn(): empty pad string")
        val padded = if (fn == "padLeft") lpad(c, len, pad) else rpad(c, len, pad)
        when(length(c) >= len, c).otherwise(padded) // pad, never truncate
      case other => throw new IllegalArgumentException(
        s"RecordPath: unknown function '$other' (toUpperCase|toLowerCase|trim|concat|" +
        "coalesce|substring|substringAfter|substringBefore|replace|replaceRegex|" +
        "padLeft|padRight)")
    }
  }

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
