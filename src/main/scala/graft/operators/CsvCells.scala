package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The super-csv cell-processor DSL NiFi's ValidateCsv exposes as its
  * Schema property — parsed ONCE at flow-compile/processor-config time
  * into Column predicates ([[Records.validateCsv]] evaluates them
  * per cell, codegen'd). One processor chain per cell, comma-separated
  * in schema order; string arguments double-quoted, numbers bare.
  * Unknown processors and malformed arguments throw at parse time —
  * NiFi rejects an invalid schema at configuration, never per record. */
object CsvCells {

  sealed trait Proc {
    /** Predicate over the (string) cell value; must handle null. */
    def pred(c: Column): Column
    def isUnique: Boolean = false
  }

  private case object PNotNull extends Proc {
    def pred(c: Column): Column = c.isNotNull
  }
  private case object PNull extends Proc {
    def pred(c: Column): Column = c.isNull
  }
  private case class POptional(inner: Proc) extends Proc {
    def pred(c: Column): Column = c.isNull || inner.pred(c)
    override def isUnique: Boolean = inner.isUnique
  }
  private case object PLong extends Proc {
    def pred(c: Column): Column = c.isNotNull && c.rlike("^-?[0-9]+$")
  }
  private case object PDouble extends Proc {
    // try_cast, not cast: ANSI mode (Spark 4 default) THROWS on an
    // invalid cast — an unparseable cell must route invalid, not fail
    // the job
    def pred(c: Column): Column = c.try_cast("double").isNotNull
  }
  private case object PBool extends Proc {
    def pred(c: Column): Column =
      lower(c).isin("true", "false", "t", "f", "y", "n", "1", "0")
  }
  private case class PStrMinMax(min: Long, max: Long) extends Proc {
    def pred(c: Column): Column =
      c.isNotNull && length(c).between(min, max)
  }
  private case class PStrlen(ns: Seq[Long]) extends Proc {
    def pred(c: Column): Column =
      c.isNotNull && length(c).isin(ns: _*)
  }
  private case class PRegex(re: String) extends Proc {
    def pred(c: Column): Column = c.isNotNull && c.rlike("^(?:" + re + ")$")
  }
  private case class PIncludedIn(vals: Seq[String]) extends Proc {
    def pred(c: Column): Column = c.isin(vals: _*)
  }
  private case object PUnique extends Proc {
    // the stateful one: Records.validateCsv wires the count window;
    // the per-cell predicate only requires presence
    def pred(c: Column): Column = c.isNotNull
    override def isUnique: Boolean = true
  }

  /** Parse the comma-separated processor list. */
  def parseSchema(s: String): Seq[Proc] = {
    require(s != null && s.trim.nonEmpty, "ValidateCsv: empty Schema")
    splitTop(s, ',').map(t => parseProc(t.trim))
  }

  private def parseProc(t: String): Proc = {
    val open = t.indexOf('(')
    val (name, args) =
      if (open < 0) (t, Nil)
      else {
        require(t.endsWith(")"), s"ValidateCsv: malformed processor '$t'")
        val body = t.substring(open + 1, t.length - 1).trim
        (t.substring(0, open).trim,
          if (body.isEmpty) Nil else splitTop(body, ',').map(_.trim))
      }
    def num(a: String): Long = {
      require(a.matches("-?[0-9]+"), s"ValidateCsv: numeric argument expected, got '$a'")
      a.toLong
    }
    def str(a: String): String = {
      require(a.length >= 2 && a.startsWith("\"") && a.endsWith("\""),
        s"ValidateCsv: double-quoted string argument expected, got '$a'")
      a.substring(1, a.length - 1)
    }
    name match {
      case "NotNull" => require(args.isEmpty, "NotNull takes no arguments"); PNotNull
      case "Null" => require(args.isEmpty, "Null takes no arguments"); PNull
      case "Optional" =>
        require(args.nonEmpty, "Optional(inner) needs an inner processor")
        POptional(parseProc(args.mkString(","))) // inner may itself have args
      case "ParseLong" | "ParseInt" =>
        require(args.isEmpty, s"$name takes no arguments"); PLong
      case "ParseDouble" | "ParseBigDecimal" =>
        require(args.isEmpty, s"$name takes no arguments"); PDouble
      case "ParseBool" => require(args.isEmpty, "ParseBool takes no arguments"); PBool
      case "StrMinMax" =>
        require(args.length == 2, "StrMinMax(min, max)")
        PStrMinMax(num(args(0)), num(args(1)))
      case "Strlen" =>
        require(args.nonEmpty, "Strlen(n, ...)")
        PStrlen(args.map(num))
      case "StrRegEx" =>
        require(args.length == 1, "StrRegEx(\"regex\")")
        PRegex(str(args(0)))
      case "IsIncludedIn" =>
        require(args.nonEmpty, "IsIncludedIn(\"a\", ...)")
        PIncludedIn(args.map(str))
      case "Unique" | "UniqueHashCode" =>
        require(args.isEmpty, s"$name takes no arguments"); PUnique
      case other => throw new IllegalArgumentException(
        s"ValidateCsv: unsupported cell processor '$other' (NotNull|Null|" +
        "Optional|ParseLong|ParseInt|ParseDouble|ParseBigDecimal|ParseBool|" +
        "StrMinMax|Strlen|StrRegEx|IsIncludedIn|Unique)")
    }
  }

  /** Split on a delimiter at paren depth 0 and outside double quotes. */
  private def splitTop(s: String, delim: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inQ = false; var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => inQ = !inQ
        case '(' if !inQ => depth += 1
        case ')' if !inQ => depth -= 1
        case c if c == delim && !inQ && depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    require(!inQ && depth == 0, s"ValidateCsv: unbalanced quotes/parens in '$s'")
    out += s.substring(start)
    out.toSeq
  }
}
