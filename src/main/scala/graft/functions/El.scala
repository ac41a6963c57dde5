package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiler for a subset of the NiFi Expression Language (the `${...}`
  * templating NiFi exposes on every processor property — the reference
  * deployment's flows configure processors with these) down to Catalyst
  * `Column` expressions, so EL-driven transforms run codegen'd and
  * distributed instead of per-record interpreted.
  *
  * Template syntax: free text with embedded `${subject:fn(args):fn2()}`
  * expressions (concatenated); `$$` escapes a literal `$`.
  * Subject: attribute (column) name, `'quoted name'`, or the standalone
  * `literal('x')`. Arguments: `'strings'`, numbers, booleans, or nested
  * `${...}` expressions.
  *
  * Example: `El.compile("${lang:toUpper():append('-'):append(${source})}")`.
  */
object El {

  /** Parsed argument: the Column plus, for literals, the raw value (so
    * functions needing Scala-level values — pad widths, format strings —
    * don't have to reach into Catalyst internals). */
  private sealed trait Arg { def col: Column }
  private case class LitArg(value: Any, col: Column) extends Arg
  private case class ExprArg(col: Column) extends Arg

  /** Schema context for `anyMatchingAttribute`/`allMatchingAttributes`
    * (the only EL forms that need to KNOW the column set: they select
    * attributes by NAME REGEX). Compile-time, driver-side only. */
  private val availableCols = new scala.util.DynamicVariable[Seq[String]](Nil)

  /** State context for NiFi's state functions (`getStateValue`): the
    * processor-state map a stateful UpdateAttribute reads. State is
    * resolved at COMPILE time to a literal (NiFi evaluates state per
    * onTrigger, i.e. per batch — not per record), so the compiled plan
    * stays codegen'd. Load the map from wherever the state lives
    * (e.g. `MapCache.entries(...).collect` for a dimension-sized map). */
  private val stateValues = new scala.util.DynamicVariable[Map[String, String]](Map.empty)

  /** Compile with a processor-state map, enabling `getStateValue('key')`
    * (plus a column set for the matching-attribute forms). */
  def compileWithState(template: String, state: Map[String, String],
                       available: Seq[String] = Nil): Column =
    stateValues.withValue(state)(availableCols.withValue(available)(compile(template)))

  /** [[compileExpr]] with a processor-state map (native result type). */
  def compileExprWithState(expression: String, state: Map[String, String],
                           available: Seq[String] = Nil): Column =
    stateValues.withValue(state)(availableCols.withValue(available)(compileExpr(expression)))

  /** Compile with a known column set, enabling the matching-attribute
    * forms: `${allMatchingAttributes('err.*'):isEmpty():not()}` etc. */
  def compile(template: String, available: Seq[String]): Column =
    availableCols.withValue(available)(compile(template))

  /** [[compileExpr]] with a known column set (native result type). */
  def compileExpr(expression: String, available: Seq[String]): Column =
    availableCols.withValue(available)(compileExpr(expression))

  /** Compile a full template (text + embedded expressions) to a Column. */
  def compile(template: String): Column = {
    val segs = scala.collection.mutable.ArrayBuffer.empty[Column]
    val sb = new StringBuilder
    var i = 0
    while (i < template.length) {
      if (template.startsWith("$$", i)) { sb.append('$'); i += 2 }
      else if (template.startsWith("${", i)) {
        if (sb.nonEmpty) { segs += lit(sb.toString); sb.clear() }
        val (c, next) = parseExpression(template, i)
        segs += c.cast("string")
        i = next
      } else { sb.append(template.charAt(i)); i += 1 }
    }
    if (sb.nonEmpty) segs += lit(sb.toString)
    segs.toList match {
      case Nil      => lit("")
      case c :: Nil => c
      case cs       => concat(cs: _*)
    }
  }

  /** Compile a single `${...}` expression (no surrounding text), keeping
    * its native type (boolean/number/...) instead of casting to string. */
  def compileExpr(expression: String): Column = {
    val t = expression.trim
    require(t.startsWith("${") && t.endsWith("}"), s"not an EL expression: $expression")
    val (c, next) = parseExpression(t, 0)
    require(next == t.length, s"trailing characters in EL expression: $expression")
    c
  }

  // ------------------------------------------------------------- parser
  /** Multi-attribute subject state: `anyAttribute`/`allAttributes` carry
    * a column per named attribute; chained functions apply element-wise
    * until a reducing function (`join`, `count`) collapses them, or the
    * closing `}` reduces a boolean chain with OR (any) / AND (all) —
    * NiFi's semantics for multi-attribute expressions. */
  /** Chain functions whose result is boolean — drives count()'s
    * NiFi-faithful true-counting vs non-null-counting split. */
  private val booleanFns = Set("isEmpty", "contains", "startsWith", "endsWith",
    "equals", "equalsIgnoreCase", "matches", "find", "gt", "ge", "lt", "le",
    "and", "or", "not", "isNull", "notNull", "in")

  private def parseExpression(s: String, start: Int): (Column, Int) = {
    var i = start + 2 // skip "${"
    i = skipWs(s, i)
    var subjects: Seq[Column] = Nil
    var combineAny = false // true → reduce with OR, false → AND
    var multi = false
    // delineated forms carry ONE array column (per-row variable length,
    // unlike `multi`'s static column list): chained functions apply
    // element-wise via transform(), the close reduces with
    // exists()/forall() — NiFi's any/allDelineatedValue semantics
    var delineated = false
    // whether the LAST chained function returns boolean: count() over
    // multi/delineated values follows NiFi's CountEvaluator — a boolean
    // chain counts trues, any other chain (or no chain) counts non-null
    // evaluations, so ${allDelineatedValues('1,2,3',','):count()} is 3
    var chainBool = false
    if (at(s, i) == '\'') {
      val (name, n) = parseQuoted(s, i); subjects = Seq(col(name)); i = n
    } else {
      val (word, n) = parseWord(s, i)
      i = skipWs(s, n)
      if (i < s.length && s.charAt(i) == '(') { // standalone function
        val (args, n2) = parseArgs(s, i)
        i = n2
        word match {
          case "literal" => subjects = Seq(args.head.col)
          case "anyAttribute" =>
            subjects = args.map(a => col(argStr(a))); multi = true; combineAny = true
          case "allAttributes" =>
            subjects = args.map(a => col(argStr(a))); multi = true; combineAny = false
          case "anyDelineatedValue" | "allDelineatedValues" =>
            require(args.size == 2, s"$word(value, delimiter) takes two arguments")
            // NiFi evaluates EL embedded in the QUOTED first argument
            // ('${csvattr}' is the documented calling convention)
            val src = args.head match {
              case LitArg(v: String, _) if v.contains("${") => compile(v)
              case a => a.col
            }
            subjects = Seq(split(src.cast("string"),
              java.util.regex.Pattern.quote(argStr(args(1)))))
            delineated = true
            combineAny = word == "anyDelineatedValue"
          case "anyMatchingAttribute" | "allMatchingAttributes" =>
            val regex = argStr(args.head)
            require(availableCols.value.nonEmpty,
              s"$word needs the column set: compile with El.compile(template, df.columns)")
            val matched = availableCols.value.filter(_.matches(regex))
            require(matched.nonEmpty,
              s"$word('$regex') matched no columns (available: ${availableCols.value.mkString(", ")})")
            subjects = matched.map(col); multi = true
            combineAny = word == "anyMatchingAttribute"
          // NiFi's nondeterministic standalones — documented as such
          // (excluded from every oracle query for exactly that reason)
          case "now" => subjects = Seq(current_timestamp())
          case "UUID" | "uuid" => subjects = Seq(expr("uuid()"))
          case "random" => // NiFi: uniform long in [0, Long.MaxValue).
            // Seeded deviation: random(seed) is reproducible under task
            // retry GIVEN a stable partitioning (Spark's rand(seed)
            // contract — seed + partition + row offset), the property a
            // retried NiFi flow cannot offer at all. Per-ROW determinism
            // independent of partitioning needs a subject: see the
            // chained randomSeeded('salt').
            subjects =
              if (args.isEmpty) Seq((rand() * Long.MaxValue).cast("long"))
              else Seq((rand(argStr(args.head).toLong) * Long.MaxValue).cast("long"))
          case "nextInt" => // NiFi: one int per evaluation; like random(),
            // the seeded form nextInt(seed) is the retry-reproducible
            // deviation (uniform non-negative int)
            subjects =
              if (args.isEmpty) Seq((rand() * Int.MaxValue).cast("int"))
              else Seq((rand(argStr(args.head).toLong) * Int.MaxValue).cast("int"))
          case "getStateValue" => // NiFi state functions: batch-time lookup
            val key = argStr(args.head)
            subjects = Seq(lit(stateValues.value.get(key).orNull))
          case "hostname" => // deterministic per driver; fine for tagging
            subjects = Seq(lit(java.net.InetAddress.getLocalHost.getHostName))
          case "ip" =>
            subjects = Seq(lit(java.net.InetAddress.getLocalHost.getHostAddress))
          case "thread" =>
            // NiFi: the name of the thread evaluating the expression.
            // Spark-first deviation (documented like hostname/ip): the
            // COMPILING thread's name folds in as a literal — a
            // distributed plan has no stable per-row thread identity,
            // and NiFi flows use this for provenance tagging, which the
            // compile-time name serves deterministically.
            subjects = Seq(lit(Thread.currentThread().getName))
          case "getUri" =>
            // NiFi 2.x: getUri(scheme, userInfo, host, port, path,
            // query, fragment) or getUri(scheme, host, port, path) —
            // structural join per java.net.URI's multi-arg constructor:
            // empty/null userInfo/query/fragment drop their delimiter,
            // port < 0 drops the colon. Deviation: components are not
            // percent-encoded (chain :urlEncode() on pieces that need
            // it); the constructor's quoting pass is not reproducible
            // in a SQL oracle.
            val cs = args.map(_.col.cast("string"))
            val nullStr = lit(null).cast("string")
            val (scheme, userInfo, host, port, pathC, query, frag) = args.size match {
              case 7 => (cs(0), cs(1), cs(2), cs(3), cs(4), cs(5), cs(6))
              case 4 => (cs(0), nullStr, cs(1), cs(2), cs(3), nullStr, nullStr)
              case n => throw new IllegalArgumentException(
                s"getUri takes 4 or 7 arguments, got $n")
            }
            def opt(prefix: String, v: Column, suffix: String = "") =
              when(v.isNull || v === "", lit("")).otherwise(concat(lit(prefix), v, lit(suffix)))
            subjects = Seq(concat(
              scheme, lit("://"),
              opt("", userInfo, "@"),
              host,
              when(port.isNull || port.cast("long") < 0, lit(""))
                .otherwise(concat(lit(":"), port.cast("long").cast("string"))),
              coalesce(pathC, lit("")),
              opt("?", query),
              opt("#", frag)))
          case other => throw new IllegalArgumentException(s"unknown standalone EL function: $other")
        }
        require(subjects.nonEmpty, s"$word needs at least one attribute name or be a 0-arg standalone")
      } else subjects = Seq(col(word))
    }
    i = skipWs(s, i)
    while (i < s.length && s.charAt(i) == ':') {
      val (fname, n) = parseWord(s, i + 1)
      i = skipWs(s, n)
      val (args, n2) = if (i < s.length && s.charAt(i) == '(') parseArgs(s, i) else (Nil: List[Arg], i)
      i = skipWs(s, n2)
      fname match {
        case "join" if multi =>
          subjects = Seq(concat_ws(argStr(args.head), subjects.map(_.cast("string")): _*))
          multi = false
        case "count" if multi =>
          subjects = Seq(subjects.map(c =>
              (if (chainBool) when(c, 1).otherwise(0)
               else when(c.isNotNull, 1).otherwise(0)))
            .reduce(_ + _).cast("long"))
          multi = false
        case "join" if delineated =>
          subjects = Seq(array_join(subjects.head, argStr(args.head)))
          delineated = false
        case "count" if delineated => // boolean chain: count of TRUE
          // evaluations; otherwise: count of non-null values
          subjects = Seq(size(filter(subjects.head,
            x => if (chainBool) x.cast("boolean") else x.isNotNull)).cast("long"))
          delineated = false
        case _ if delineated =>
          subjects = Seq(transform(subjects.head, x => apply(fname, x, args)))
          chainBool = booleanFns.contains(fname)
        case _ =>
          subjects = subjects.map(c => apply(fname, c, args))
          chainBool = booleanFns.contains(fname)
      }
    }
    require(i < s.length && s.charAt(i) == '}', s"expected '}' at $i in: $s")
    val c =
      if (delineated) {
        if (combineAny) exists(subjects.head, x => x.cast("boolean"))
        else forall(subjects.head, x => x.cast("boolean"))
      }
      else if (!multi) subjects.head
      else if (combineAny) subjects.map(_.cast("boolean")).reduce(_ || _)
      else subjects.map(_.cast("boolean")).reduce(_ && _)
    (c, i + 1)
  }

  private def parseArgs(s: String, start: Int): (List[Arg], Int) = {
    var i = start + 1 // skip '('
    val args = scala.collection.mutable.ListBuffer.empty[Arg]
    i = skipWs(s, i)
    while (at(s, i) != ')') {
      val (a, n) = parseArg(s, i)
      args += a
      i = skipWs(s, n)
      if (at(s, i) == ',') i = skipWs(s, i + 1)
    }
    (args.toList, i + 1)
  }

  /** Bounds-checked charAt: malformed templates get a parse error, not
    * a StringIndexOutOfBoundsException. */
  private def at(s: String, i: Int): Char = {
    require(i < s.length, s"unterminated EL expression: $s")
    s.charAt(i)
  }

  private def parseArg(s: String, start: Int): (Arg, Int) = {
    val ch = s.charAt(start)
    if (ch == '\'') { val (v, n) = parseQuoted(s, start); (LitArg(v, lit(v)), n) }
    else if (s.startsWith("${", start)) {
      val (c, n) = parseExpression(s, start); (ExprArg(c), n)
    } else if (ch.isDigit || ch == '-' || ch == '+') {
      var i = start + 1
      while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
      val tok = s.substring(start, i)
      val v: Any = if (tok.contains('.')) tok.toDouble else tok.toLong
      (LitArg(v, lit(v)), i)
    } else {
      val (word, n) = parseWord(s, start)
      word match {
        case "true"  => (LitArg(true, lit(true)), n)
        case "false" => (LitArg(false, lit(false)), n)
        case other   => throw new IllegalArgumentException(s"bad EL argument: $other")
      }
    }
  }

  private def parseQuoted(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = start + 1
    while (at(s, i) != '\'') {
      if (s.charAt(i) == '\\' && i + 1 < s.length) { sb.append(s.charAt(i + 1)); i += 2 }
      else { sb.append(s.charAt(i)); i += 1 }
    }
    (sb.toString, i + 1)
  }

  private def parseWord(s: String, start: Int): (String, Int) = {
    var i = skipWs(s, start)
    val b = i
    while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' || s.charAt(i) == '.')) i += 1
    require(i > b, s"expected identifier at $b in: $s")
    (s.substring(b, i), i)
  }

  private def skipWs(s: String, i0: Int): Int = {
    var i = i0
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    i
  }

  // ----------------------------------------------------- function table
  /** NiFi EL semantics, each mapped to a codegen'd Spark expression. */
  private def apply(fn: String, c: Column, args: List[Arg]): Column = {
    def a0 = args.head.col
    def a1 = args(1).col
    fn match {
    case "toUpper"          => upper(c)
    case "toLower"          => lower(c)
    case "trim"             => trim(c)
    case "length"           => length(c).cast("long")
    case "isEmpty"          => trim(c.cast("string")) === "" || c.isNull
    // NiFi substring(start, end): 0-based, end-exclusive
    case "substring" =>
      args.map(_.col) match {
        case a :: b :: Nil  => c.substr(a.cast("int") + 1, (b - a).cast("int"))
        case a :: Nil      => c.substr(a.cast("int") + 1, length(c))
        case _             => badArity(fn)
      }
    case "substringBefore"  => substring_index(c, argStr(args.head), 1)
    case "substringAfter" =>
      val pos = instr(c, argStr(args.head))
      when(pos > 0, c.substr(pos + length(a0), length(c))).otherwise(c)
    case "substringBeforeLast" =>
      // everything before the LAST occurrence; whole string when absent
      val after = substring_index(c, argStr(args.head), -1)
      when(c.contains(a0), c.substr(lit(1), length(c) - length(after) - length(a0)))
        .otherwise(c)
    case "substringAfterLast" =>
      when(c.contains(a0), substring_index(c, argStr(args.head), -1)).otherwise(c)
    case "replace"          => replace(c, a0, a1)
    case "replaceAll"       => regexp_replace(c, a0, a1)
    case "replaceFirst" =>
      // first regex match replaced with a LITERAL replacement (no $n
      // backreference expansion, unlike NiFi's Java-regex semantics)
      val pat = argStr(args.head)
      val pre = regexp_extract(c, s"(?s)^(.*?)(?:$pat)", 1)
      val matched = regexp_extract(c, s"(?s)^.*?($pat)", 1)
      when(regexp_like(c, lit(pat)),
        concat(pre, a1, c.substr(length(pre) + length(matched) + 1, length(c))))
        .otherwise(c)
    case "replaceNull"      => when(c.isNull, a0).otherwise(c)
    case "replaceEmpty"     => when(trim(c.cast("string")) === "" || c.isNull, a0).otherwise(c)
    case "append"           => concat(c, a0.cast("string"))
    case "prepend"          => concat(a0.cast("string"), c)
    // NiFi's documented default pad character is '_', not a space
    case "padLeft"          => lpad(c, litInt(args.head), if (args.size > 1) argStr(args(1)) else "_")
    case "padRight"         => rpad(c, litInt(args.head), if (args.size > 1) argStr(args(1)) else "_")
    case "contains"         => c.contains(a0)
    case "startsWith"       => c.startsWith(a0)
    case "endsWith"         => c.endsWith(a0)
    case "equals"           => c === a0
    case "equalsIgnoreCase" => lower(c) === lower(a0)
    case "matches"          => regexp_like(c, concat(lit("^(?:"), a0, lit(")$")))
    case "find"             => regexp_like(c, a0)
    case "plus"             => c + a0
    case "minus"            => c - a0
    case "multiply"         => c * a0
    case "divide"           => c / a0
    case "mod"              => c % a0
    case "gt"               => c > a0
    case "ge"               => c >= a0
    case "lt"               => c < a0
    case "le"               => c <= a0
    case "and"              => c && a0
    case "or"               => c || a0
    case "not"              => !c
    case "ifElse"           => when(c, a0).otherwise(a1)
    case "toNumber"         => c.cast("long")
    case "toDecimal"        => c.cast("double")
    case "toString"         => c.cast("string")
    // toDate(fmt, tz): the string names a wall time IN tz → shift to
    // the session zone; format(fmt, tz): render the instant AS tz wall
    // time (NiFi's optional timezone arguments on both)
    case "toDate" =>
      if (args.isEmpty) to_timestamp(c)
      else if (args.size == 1) to_timestamp(c, argStr(args.head))
      else to_utc_timestamp(to_timestamp(c, argStr(args.head)), argStr(args(1)))
    case "format" =>
      if (args.size <= 1) date_format(c, argStr(args.head))
      else date_format(from_utc_timestamp(c, argStr(args(1))), argStr(args.head))
    // NiFi 2.x instant forms: toInstant parses a wall time in the given
    // zone, formatInstant renders the instant as that zone's wall time
    // (same semantics as the toDate/format pair)
    case "toInstant" =>
      if (args.isEmpty) to_timestamp(c)
      else if (args.size == 1) to_timestamp(c, argStr(args.head))
      else to_utc_timestamp(to_timestamp(c, argStr(args.head)), argStr(args(1)))
    case "formatInstant" =>
      if (args.size <= 1) date_format(c, argStr(args.head))
      else date_format(from_utc_timestamp(c, argStr(args(1))), argStr(args.head))
    // instant arithmetic (java.time-style): the argument count is a
    // compile-time literal, so the interval folds into the plan
    case "plusDays"     => c + expr(s"INTERVAL ${litInt(args.head)} DAY")
    case "minusDays"    => c - expr(s"INTERVAL ${litInt(args.head)} DAY")
    case "plusHours"    => c + expr(s"INTERVAL ${litInt(args.head)} HOUR")
    case "minusHours"   => c - expr(s"INTERVAL ${litInt(args.head)} HOUR")
    case "plusMinutes"  => c + expr(s"INTERVAL ${litInt(args.head)} MINUTE")
    case "minusMinutes" => c - expr(s"INTERVAL ${litInt(args.head)} MINUTE")
    case "plusSeconds"  => c + expr(s"INTERVAL ${litInt(args.head)} SECOND")
    case "minusSeconds" => c - expr(s"INTERVAL ${litInt(args.head)} SECOND")
    case "jsonPath"         => get_json_object(c, argStr(args.head))
    // the jsonPath WRITE family (r11): Jackson-backed native
    // expression over the `$`/`.field`/`[index]` path subset — an
    // unresolvable path leaves the document unchanged, invalid JSON
    // yields null (graft.plans.JsonExpressions)
    case "jsonPathDelete" =>
      graft.plans.JsonPathMutate(c, argStr(args.head), "delete")
    case "jsonPathSet" =>
      graft.plans.JsonPathMutate(c, argStr(args.head), "set", Seq(argStr(args(1))))
    case "jsonPathAdd" =>
      graft.plans.JsonPathMutate(c, argStr(args.head), "add", Seq(argStr(args(1))))
    case "jsonPathPut" =>
      graft.plans.JsonPathMutate(c, argStr(args.head), "put",
        Seq(argStr(args(1)), argStr(args(2))))
    case "isJson" =>
      // valid-JSON probe via Spark's variant parser (any JSON value,
      // Jackson-grammar — same acceptance as NiFi's reader)
      try_parse_json(c.cast("string")).isNotNull
    case "evaluateELString" =>
      // the subject must be a compile-time constant (literal(...),
      // getStateValue, a parameter-context value): EL stored in DATA
      // would need per-row compilation, which no static plan can
      // express — and config-carried EL is the NiFi use case.
      val template = literalString(c).getOrElse(throw new IllegalArgumentException(
        "evaluateELString needs a compile-time-constant subject " +
        "(literal/state/parameter value), not a per-row column"))
      compile(template, availableCols.value)
    case "base64Encode"     => base64(c.cast("binary"))
    case "base64Decode"     => unbase64(c).cast("string")
    case "urlEncode"        => url_encode(c)
    case "urlDecode"        => url_decode(c)
    case "indexOf"          => (instr(c, argStr(args.head)) - 1).cast("long")
    case "lastIndexOf" =>
      when(c.contains(a0),
        (length(c) - (instr(reverse(c), reverse(a0)) + length(a0)) + 1).cast("long"))
        .otherwise(lit(-1L))
    case "getDelimitedField" =>
      // NiFi: getDelimitedField(index[, delim[, quoteChar[, stripChars]]])
      // — 1-based index; with a quote char, delimiters INSIDE balanced
      // quotes don't split (lookahead for an even number of quotes
      // ahead); stripChars=true removes the surrounding quotes from the
      // extracted field. (NiFi's escapeChar argument is unsupported.)
      val delim = if (args.size > 1) argStr(args(1)) else ","
      val d = java.util.regex.Pattern.quote(delim)
      if (args.size <= 2) element_at(split(c, d), litInt(args.head))
      else {
        val q = java.util.regex.Pattern.quote(argStr(args(2)))
        val field = element_at(
          split(c, s"$d(?=(?:[^$q]*$q[^$q]*$q)*[^$q]*$$)"), litInt(args.head))
        val strip = args.size > 3 && argStr(args(3)).toBoolean
        if (!strip) field
        else {
          val qc = argStr(args(2))
          when(field.startsWith(qc) && field.endsWith(qc) && length(field) >= 2,
            field.substr(lit(2), length(field) - 2)).otherwise(field)
        }
      }
    // ---- seeded deterministic variants of the nondeterministic family
    // (graft extensions: NiFi's random()/UUID() are per-evaluation and
    // unreproducible under retry — at 100 TB a retried task MUST
    // regenerate identical values, so these derive from the subject)
    case "randomSeeded" =>
      // uniform long in [0, Long.MaxValue), a pure function of
      // (salt, subject): stable across retries, partitionings, engines
      (xxhash64(concat(a0.cast("string"), lit(":"), c.cast("string")))
        .bitwiseAND(lit(Long.MaxValue))).cast("long")
    case "UUID3" => nameUuid(c, args, md5(_), "3")
    case "UUID5" => nameUuid(c, args, x => sha1(x), "5")
    case "in"               => args.map(a => c === a.col).reduce(_ || _)
    case "abs"              => abs(c)
    case "isNull"           => c.isNull
    case "notNull"          => c.isNotNull
    case "repeat"           => repeat(c, litInt(args.head))
    case "toRadix" =>
      // Long.toString(v, radix) semantics: lowercase digits; optional
      // zero-pad width as second arg
      val encoded = lower(conv(c.cast("string"), 10, litInt(args.head)))
      if (args.size > 1) lpad(encoded, litInt(args(1)), "0") else encoded
    case "fromRadix"        => conv(c, litInt(args.head), 10).cast("long")
    case "math" =>
      argStr(args.head) match {
        case "sqrt"  => sqrt(c)
        case "ceil"  => ceil(c).cast("long")
        case "floor" => floor(c).cast("long")
        case "log"   => log(c)
        case "log10" => log10(c)
        case "exp"   => exp(c)
        case "abs"   => abs(c)
        // two-operand Math methods take the operand as the second arg
        case "pow"   => pow(c, a1)
        case "max"   => greatest(c, a1)
        case "min"   => least(c, a1)
        case a       => throw new IllegalArgumentException(s"math: unknown function $a")
      }
    case "escapeJson" =>
      Seq("\\" -> "\\\\", "\"" -> "\\\"", "\n" -> "\\n", "\r" -> "\\r", "\t" -> "\\t")
        .foldLeft(c) { case (x, (from, to)) => replace(x, lit(from), lit(to)) }
    case "unescapeJson" =>
      // \\ must unescape atomically (else \\n reads as \ + \n): park it
      // in a sentinel first, restore last
      Seq("\\\\" -> "\u0000", "\\t" -> "\t", "\\r" -> "\r", "\\n" -> "\n",
          "\\\"" -> "\"", "\u0000" -> "\\")
        .foldLeft(c) { case (x, (from, to)) => replace(x, lit(from), lit(to)) }
    // the portable HTML entity subset (& < > "): identical for the
    // html3/html4 variants; extended named entities are out of scope
    case "escapeHtml3" | "escapeHtml4" =>
      Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;", "\"" -> "&quot;")
        .foldLeft(c) { case (x, (from, to)) => replace(x, lit(from), lit(to)) }
    case "unescapeHtml3" | "unescapeHtml4" =>
      Seq("&quot;" -> "\"", "&gt;" -> ">", "&lt;" -> "<", "&amp;" -> "&")
        .foldLeft(c) { case (x, (from, to)) => replace(x, lit(from), lit(to)) }
    case "escapeXml" =>
      Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;",
          "\"" -> "&quot;", "'" -> "&apos;")
        .foldLeft(c) { case (x, (from, to)) => replace(x, lit(from), lit(to)) }
    case "unescapeXml" =>
      Seq("&apos;" -> "'", "&quot;" -> "\"", "&gt;" -> ">",
          "&lt;" -> "<", "&amp;" -> "&")
        .foldLeft(c) { case (x, (from, to)) => replace(x, lit(from), lit(to)) }
    case "escapeCsv" =>
      // RFC-4180: quote when the value holds a delimiter/quote/newline,
      // doubling embedded quotes
      when(c.rlike("[,\"\r\n]"),
        concat(lit("\""), replace(c, lit("\""), lit("\"\"")), lit("\"")))
        .otherwise(c)
    case "unescapeCsv" =>
      // (?s): a quoted cell may contain the very newlines escapeCsv
      // quotes it for — without DOTALL the wrapper regex can't match
      // across them and the cell stays escaped. \A..\z, not ^..$: $
      // matches BEFORE a trailing newline, so `"a"\n` would fire the
      // branch and get mangled by the fixed-offset unwrap.
      when(c.rlike("(?s)\\A\".*\"\\z"),
        replace(c.substr(lit(2), length(c) - 2), lit("\"\""), lit("\"")))
        .otherwise(c)
    case "hash" =>
      argStr(args.head) match {
        case "md5"    => md5(c.cast("binary"))
        case "sha1"   => sha1(c.cast("binary"))
        case "sha256" => sha2(c.cast("binary"), 256)
        case "sha512" => sha2(c.cast("binary"), 512)
        case a        => throw new IllegalArgumentException(s"hash: unknown algo $a")
      }
    case other => throw new IllegalArgumentException(s"unknown EL function: $other")
    }
  }

  private def badArity(fn: String) =
    throw new IllegalArgumentException(s"wrong number of arguments for EL function $fn")

  /** RFC-4122 name-based UUID (v3 = md5, v5 = sha1) of namespace+subject:
    * hash hex gets the version nibble forced at position 13 and the
    * variant nibble at 17 folded into [89ab] (the translate trick: each
    * hex digit maps to (digit & 3) | 8), then 8-4-4-4-12 dashes. Fully
    * deterministic and expressible in any SQL oracle. Deviation from
    * RFC 4122: the namespace argument contributes its UTF-8 BYTES (any
    * string allowed), not a parsed 128-bit namespace UUID. */
  private def nameUuid(c: Column, args: List[Arg],
                       hash: Column => Column, version: String): Column = {
    val hx = hash(concat(args.head.col.cast("string"), c.cast("string")).cast("binary"))
    concat(
      substring(hx, 1, 8), lit("-"), substring(hx, 9, 4), lit("-" + version),
      substring(hx, 14, 3), lit("-"),
      translate(substring(hx, 17, 1), "0123456789abcdef", "89ab89ab89ab89ab"),
      substring(hx, 18, 3), lit("-"), substring(hx, 21, 12))
  }

  /** The compile-time string value of a Column, when it folds to a
    * Literal (evaluateELString's subject contract). */
  private def literalString(c: Column): Option[String] =
    // lit()/typedLit() build an internal Literal node directly;
    // expression-built constants (ColumnBridge.column) fold in the
    // orElse branch; unresolved per-row references land in the
    // catch → None
    org.apache.spark.sql.graftbridge.ColumnBridge.literalValue(c)
      .map(_.toString)
      .orElse {
        try {
          val e = org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)
          if (e.foldable) Option(e.eval(null)).map(_.toString) else None
        } catch { case _: Exception => None }
      }

  /** Extract a literal string arg (for APIs that need Scala values). */
  private def argStr(a: Arg): String = a match {
    case LitArg(v, _) if v != null => v.toString
    case other => throw new IllegalArgumentException(s"expected literal argument, got $other")
  }

  private def litInt(a: Arg): Int = a match {
    case LitArg(v, _) => v.toString.toDouble.toInt
    case other => throw new IllegalArgumentException(s"expected literal argument, got $other")
  }
}
