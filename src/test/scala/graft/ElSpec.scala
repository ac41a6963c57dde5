package graft

import org.apache.spark.sql.functions.col
import graft.functions.El

class ElSpec extends SparkSpec {
  import spark.implicits._

  private def eval(template: String): Any = {
    val df = Seq(("hello world", "en", 42L)).toDF("text", "lang", "n")
    df.select(El.compile(template).as("v")).collect()(0).get(0)
  }
  private def evalExpr(e: String): Any = {
    val df = Seq(("hello world", "en", 42L)).toDF("text", "lang", "n")
    df.select(El.compileExpr(e).as("v")).collect()(0).get(0)
  }

  test("plain text and escapes") {
    assert(eval("just text") == "just text")
    assert(eval("cost: $$5") == "cost: $5")
  }

  test("attribute reference and chaining") {
    assert(eval("${lang}") == "en")
    assert(eval("${lang:toUpper()}") == "EN")
    assert(eval("${text:toUpper():substring(0, 5)}") == "HELLO")
    assert(eval("pre-${lang}-post") == "pre-en-post")
  }

  test("string functions") {
    assert(eval("${text:substringBefore(' ')}") == "hello")
    assert(eval("${text:substringAfter(' ')}") == "world")
    assert(eval("${text:replace('world', 'there')}") == "hello there")
    assert(eval("${text:replaceAll('[aeiou]', '_')}") == "h_ll_ w_rld")
    assert(eval("${text:append('!')}") == "hello world!")
    assert(eval("${text:prepend('>> ')}") == ">> hello world")
    assert(eval("${lang:padLeft(4, '*')}") == "**en")
    assert(eval("${lang:padLeft(4)}") == "__en") // NiFi default pad is '_'
    assert(eval("${lang:padRight(4)}") == "en__")
    assert(evalExpr("${text:length()}") == 11L)
  }

  test("instant family: toInstant/formatInstant/plus-minus arithmetic") {
    assert(evalExpr("${literal('2024-03-05 10:20:30')" +
      ":toInstant('yyyy-MM-dd HH:mm:ss', 'UTC')" +
      ":plusDays(3):formatInstant('yyyy-MM-dd HH:mm:ss', 'UTC')}")
      == "2024-03-08 10:20:30")
    assert(evalExpr("${literal('2024-03-05 10:20:30')" +
      ":toInstant('yyyy-MM-dd HH:mm:ss', 'UTC')" +
      ":minusHours(11):plusMinutes(10):minusSeconds(30)" +
      ":formatInstant('yyyy-MM-dd HH:mm:ss', 'UTC')}")
      == "2024-03-04 23:30:00")
    // zone-aware round trip: 09:00 in New York is 14:00 UTC (March 5 is EST)
    assert(evalExpr("${literal('2024-03-05 09:00:00')" +
      ":toInstant('yyyy-MM-dd HH:mm:ss', 'America/New_York')" +
      ":formatInstant('HH:mm', 'UTC')}") == "14:00")
  }

  test("state functions: getStateValue resolves from the batch state map") {
    val df = Seq(("hello", "en")).toDF("text", "lang")
    val state = Map("last_run" -> "2024-03-05", "watermark" -> "42")
    val out = df.select(
      El.compileWithState("run:${getStateValue('last_run')}", state).as("a"),
      El.compileExprWithState("${getStateValue('watermark'):toNumber():plus(8)}", state).as("b"),
      El.compileExprWithState("${getStateValue('missing'):isNull()}", state).as("c"))
      .collect()(0)
    assert(out.getString(0) == "run:2024-03-05")
    assert(out.getLong(1) == 50L)
    assert(out.getBoolean(2))
  }

  test("escape families are exact inverses on generated adversarial strings") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab,\"'\n\r\t<>&\\$ {}%+".toCharArray
    val strs = (1 to 300).map { _ =>
      (0 to rnd.nextInt(24)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val df = strs.toDF("s")
    val pairs = Seq(
      "escapeCsv" -> "unescapeCsv",
      "escapeJson" -> "unescapeJson",
      "escapeXml" -> "unescapeXml",
      "escapeHtml4" -> "unescapeHtml4",
      "base64Encode" -> "base64Decode",
      "urlEncode" -> "urlDecode")
    pairs.foreach { case (esc, unesc) =>
      val mismatches = df.select(col("s"),
          El.compileExpr(s"$${s:$esc():$unesc()}").as("rt"))
        .filter(col("s") =!= col("rt")).count()
      assert(mismatches === 0L, s"$esc -> $unesc is not an inverse")
    }
  }

  test("url and json functions") {
    assert(evalExpr("${text:urlEncode()}") == "hello+world")
    assert(evalExpr("${text:urlEncode():urlDecode()}") == "hello world")
    assert(evalExpr("${literal('{\"k\": 7}'):jsonPath('$.k')}") == "7")
  }

  test("boolean and comparison functions") {
    assert(evalExpr("${lang:equals('en')}") == true)
    assert(evalExpr("${text:contains('wor')}") == true)
    assert(evalExpr("${text:startsWith('hello')}") == true)
    assert(evalExpr("${text:matches('hello.*')}") == true)
    assert(evalExpr("${text:matches('hello')}") == false) // full match
    assert(evalExpr("${text:find('wor')}") == true)
    assert(evalExpr("${n:gt(40)}") == true)
    assert(evalExpr("${n:le(42)}") == true)
  }

  test("arithmetic and conditionals") {
    assert(evalExpr("${n:plus(8)}") == 50L)
    assert(evalExpr("${n:minus(2):multiply(2)}") == 80L)
    assert(evalExpr("${n:mod(5)}") == 2L)
    assert(evalExpr("${lang:equals('en'):ifElse('yes', 'no')}") == "yes")
    assert(evalExpr("${lang:isEmpty():not()}") == true)
  }

  test("nested expressions as arguments") {
    assert(eval("${lang:append(${text:substringBefore(' ')})}") == "enhello")
  }

  test("standalone literal subject") {
    assert(eval("${literal('x'):toUpper()}") == "X")
  }

  test("encoding and search functions") {
    assert(eval("${lang:base64Encode()}") == "ZW4=")
    assert(eval("${literal('ZW4='):base64Decode()}") == "en")
    assert(eval("${text:urlEncode()}") == "hello+world" ||
           eval("${text:urlEncode()}") == "hello%20world")
    assert(evalExpr("${text:indexOf('world')}") == 6L)
    assert(evalExpr("${text:indexOf('zzz')}") == -1L)
    assert(evalExpr("${literal('abcabc'):lastIndexOf('bc')}") == 4L)
    assert(evalExpr("${literal('abcabc'):lastIndexOf('zz')}") == -1L)
    assert(eval("${literal('a|b|c'):getDelimitedField(2, '|')}") == "b")
    assert(evalExpr("${lang:in('en', 'fr')}") == true)
    assert(evalExpr("${lang:in('de', 'fr')}") == false)
  }

  test("last-occurrence substrings and replaceFirst/replaceNull") {
    assert(eval("${literal('a.b.c'):substringBeforeLast('.')}") == "a.b")
    assert(eval("${literal('a.b.c'):substringAfterLast('.')}") == "c")
    assert(eval("${literal('nodots'):substringBeforeLast('.')}") == "nodots")
    assert(eval("${literal('nodots'):substringAfterLast('.')}") == "nodots")
    assert(eval("${literal('a1b2'):replaceFirst('[0-9]', 'X')}") == "aXb2")
    assert(eval("${literal('abc'):replaceFirst('[0-9]', 'X')}") == "abc")
    val withNull = Seq((Option.empty[String], 1L)).toDF("text", "n")
    assert(withNull.select(El.compile("${text:replaceNull('fallback')}"))
      .collect()(0).getString(0) == "fallback")
    assert(evalExpr("${text:isNull()}") == false)
    assert(evalExpr("${text:notNull()}") == true)
  }

  test("radix, repeat, math") {
    assert(eval("${n:toRadix(16)}") == "2a")
    assert(eval("${n:toRadix(2, 8)}") == "00101010")
    assert(evalExpr("${literal('ff'):fromRadix(16)}") == 255L)
    assert(eval("${lang:repeat(3)}") == "enenen")
    assert(evalExpr("${n:math('sqrt')}").asInstanceOf[Double] > 6.48)
    assert(evalExpr("${literal('2.5'):toDecimal():math('ceil')}") == 3L)
  }

  test("escape families round-trip") {
    val json = """say "hi"\now"""
    val df = Seq((json, 1L)).toDF("text", "n")
    val rt = df.select(El.compile("${text:escapeJson():unescapeJson()}")).collect()(0).getString(0)
    assert(rt == json)
    assert(eval("${literal('a<b&c'):escapeXml()}") == "a&lt;b&amp;c")
    assert(eval("${literal('a&lt;b'):unescapeXml()}") == "a<b")
    assert(eval("${literal('v,w'):escapeCsv()}") == "\"v,w\"")
    assert(eval("${literal('say \"hi\"'):escapeCsv():unescapeCsv()}") == "say \"hi\"")
    assert(eval("${literal('plain'):escapeCsv()}") == "plain")
    assert(eval("${lang:hash('sha1')}") ==
      org.apache.commons.codec.digest.DigestUtils.sha1Hex("en"))
  }

  test("multi-attribute subjects: any/all, join, count") {
    val df = Seq(("alpha", "beta", 7L)).toDF("a", "b", "n")
    def e(t: String): Any = df.select(El.compileExpr(t)).collect()(0).get(0)
    assert(e("${anyAttribute('a','b'):startsWith('al')}") == true)
    assert(e("${allAttributes('a','b'):startsWith('al')}") == false)
    assert(e("${allAttributes('a','b'):length():ge(4)}") == true)
    assert(e("${allAttributes('a','b'):join('-')}") == "alpha-beta")
    assert(e("${allAttributes('a','b'):contains('a'):count()}") == 2L)
    assert(e("${anyAttribute('a','b'):contains('et'):count()}") == 1L)
    // NiFi CountEvaluator: a NON-boolean chain (or no chain) counts
    // non-null evaluations, not boolean-castable ones
    assert(e("${allAttributes('a','b'):count()}") == 2L)
    assert(e("${allAttributes('a','b'):toUpper():count()}") == 2L)
  }

  test("nondeterministic standalones: now/UUID/random/hostname") {
    import org.apache.spark.sql.functions.col
    val df = Seq(1, 2).toDF("x")
    val year = java.time.Year.now.getValue.toString
    val rows = df.select(
      El.compile("${now():format('yyyy')}").as("y"),
      El.compile("${UUID()}").as("u"),
      El.compileExpr("${random()}").as("r"),
      El.compile("${hostname()}").as("h")).collect()
    assert(rows.forall(_.getString(0) == year))
    val uuids = rows.map(_.getString(1))
    assert(uuids.forall(_.matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}")))
    assert(uuids.distinct.length == 2, "uuid must differ per row")
    assert(rows.forall(r => r.getLong(2) >= 0L))
    assert(rows.forall(_.getString(3).nonEmpty))
  }

  test("delineated-value forms: any/all over a split string, element-wise chaining") {
    val df = Seq(("a,bb,ccc", 1L)).toDF("tags", "n")
    def ev(e: String): Any = df.select(El.compileExpr(e).as("v")).collect()(0).get(0)
    // any: true when SOME value matches after element-wise chaining
    assert(ev("${anyDelineatedValue('${tags}', ','):equals('bb')}") === true)
    assert(ev("${anyDelineatedValue('${tags}', ','):equals('zz')}") === false)
    // all: every value must pass
    assert(ev("${allDelineatedValues('${tags}', ','):length():ge(1)}") === true)
    assert(ev("${allDelineatedValues('${tags}', ','):length():ge(2)}") === false)
    // element-wise transform then reducing join / count
    assert(ev("${anyDelineatedValue('${tags}', ','):toUpper():join('|')}") === "A|BB|CCC")
    assert(ev("${anyDelineatedValue('${tags}', ','):length():ge(2):count()}") === 2L)
    // count over a non-boolean chain counts the VALUES (NiFi: the
    // number of delineated values), not boolean-castable elements
    assert(ev("${allDelineatedValues('1,2,3', ','):count()}") === 3L)
    assert(ev("${allDelineatedValues('${tags}', ','):toUpper():count()}") === 3L)
    // a literal first argument works too
    assert(ev("${allDelineatedValues('x;y;z', ';'):matches('[a-z]')}") === true)
    // nextInt: non-negative, seeded form reproducible per partitioning
    val r = ev("${nextInt()}")
    assert(r.asInstanceOf[Int] >= 0)
    assert(ev("${nextInt(7)}") === ev("${nextInt(7)}"))
  }

  test("seeded deterministic variants: randomSeeded, UUID3/UUID5, random(seed)") {
    // UUID3 must agree with the JDK's own md5 name-based UUID (RFC 4122
    // version 3) for the concatenated namespace+name bytes
    val expected3 = java.util.UUID.nameUUIDFromBytes("graft:en".getBytes("UTF-8")).toString
    assert(evalExpr("${lang:UUID3('graft:')}") === expected3)
    // UUID5: sha1-based, same bit surgery — verify shape + version/variant
    val u5 = evalExpr("${lang:UUID5('graft:')}").asInstanceOf[String]
    assert(u5.matches("[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}"))
    // and the full sha1 derivation, recomputed driver-side
    val sha = java.security.MessageDigest.getInstance("SHA-1")
      .digest("graft:en".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val v17 = "89ab89ab89ab89ab".charAt(Integer.parseInt(sha.substring(16, 17), 16))
    assert(u5 === s"${sha.substring(0, 8)}-${sha.substring(8, 12)}-5${sha.substring(13, 16)}-" +
      s"$v17${sha.substring(17, 20)}-${sha.substring(20, 32)}")
    // deterministic: same inputs, same outputs; different salt differs
    assert(evalExpr("${lang:randomSeeded('s1')}") === evalExpr("${lang:randomSeeded('s1')}"))
    assert(evalExpr("${lang:randomSeeded('s1')}") !== evalExpr("${lang:randomSeeded('s2')}"))
    assert(evalExpr("${lang:randomSeeded('s1')}").asInstanceOf[Long] >= 0L)
    // random(seed): reproducible across identical evaluations (Spark's
    // rand(seed) contract — stable given the same partitioning)
    val df = spark.range(0, 100, 1, 4).toDF("x")
    val a = df.select(El.compileExpr("${random(42)}").as("r")).as[Long].collect()
    val b = df.select(El.compileExpr("${random(42)}").as("r")).as[Long].collect()
    assert(a.toSeq === b.toSeq)
    assert(a.forall(_ >= 0L) && a.distinct.length > 90)
  }

  test("getDelimitedField quote-aware modes") {
    // delimiters inside balanced quotes don't split
    assert(eval("""${text:replace('hello world', '"a,b",c,"d"'):getDelimitedField(1, ',', '"')}""")
      === "\"a,b\"")
    assert(eval("""${text:replace('hello world', '"a,b",c,"d"'):getDelimitedField(2, ',', '"')}""")
      === "c")
    // stripChars removes the surrounding quotes only
    assert(eval("""${text:replace('hello world', '"a,b",c,"d"'):getDelimitedField(1, ',', '"', true)}""")
      === "a,b")
    assert(eval("""${text:replace('hello world', '"a,b",c,"d"'):getDelimitedField(3, ',', '"', true)}""")
      === "d")
    // unquoted fields pass through stripChars untouched
    assert(eval("""${text:replace('hello world', '"a,b",c,"d"'):getDelimitedField(2, ',', '"', true)}""")
      === "c")
  }

  test("html escapes, two-operand math, ip standalone") {
    assert(eval("${text:replace('world', '<b>&\"x\"</b>'):escapeHtml4()}")
      == "hello &lt;b&gt;&amp;&quot;x&quot;&lt;/b&gt;")
    assert(eval("${text:replace('world', '<x>'):escapeHtml4():unescapeHtml4()}")
      == "hello <x>")
    assert(eval("${lang:escapeHtml3()}") == "en") // no-op on clean text
    assert(evalExpr("${n:math('pow', 2)}") == 1764.0)
    assert(evalExpr("${n:math('max', 100)}") == 100L)
    assert(evalExpr("${n:math('min', 100)}") == 42L)
    assert(eval("${ip()}").asInstanceOf[String].nonEmpty)
  }

  test("format/toDate with timezone arguments") {
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    // 2024-06-01 12:00 UTC = 08:00 in New York (EDT)
    val df = Seq("2024-06-01 12:00:00").toDF("s")
      .select(to_timestamp(col("s")).as("ts"), lit("x").as("pad"))
    val shown = df.select(
      El.compileExpr("${ts:format('yyyy-MM-dd HH:mm', 'America/New_York')}"))
      .collect()(0).getString(0)
    assert(shown == "2024-06-01 08:00")
    // parsing the New York wall time back yields the original instant
    val back = df.select(El.compileExpr(
      "${ts:format('yyyy-MM-dd HH:mm:ss', 'America/New_York'):toDate('yyyy-MM-dd HH:mm:ss', 'America/New_York'):format('yyyy-MM-dd HH:mm:ss')}"))
      .collect()(0).getString(0)
    assert(back == "2024-06-01 12:00:00")
  }

  test("matching-attribute forms resolve column names by regex against the schema") {
    import org.apache.spark.sql.functions.col
    val df = Seq(("", "boom", "fine")).toDF("err_a", "err_b", "note")
    def e(t: String): Any =
      df.select(El.compileExpr(t, df.columns.toSeq)).collect()(0).get(0)
    assert(e("${anyMatchingAttribute('err_.*'):isEmpty()}") == true)
    assert(e("${allMatchingAttributes('err_.*'):isEmpty()}") == false)
    assert(e("${allMatchingAttributes('err_.*'):join('|')}") == "|boom")
    // no schema context → clear error, not a silent empty match
    val noCtx = intercept[IllegalArgumentException] {
      El.compileExpr("${anyMatchingAttribute('x.*'):isEmpty()}")
    }
    assert(noCtx.getMessage.contains("column set"))
    val noMatch = intercept[IllegalArgumentException] {
      El.compileExpr("${anyMatchingAttribute('zzz.*'):isEmpty()}", df.columns.toSeq)
    }
    assert(noMatch.getMessage.contains("matched no columns"))
  }

  test("unknown function rejected") {
    intercept[IllegalArgumentException] { El.compile("${lang:nope()}") }
  }

  test("r11 tail: getUri composes both arities with NiFi's drop rules") {
    assert(evalExpr("${getUri('https', 'u:p', ${lang}, 8443, '/x', 'a=1', 'top')}")
      == "https://u:p@en:8443/x?a=1#top")
    // empty userInfo/query/fragment drop their delimiters; port -1 drops
    assert(evalExpr("${getUri('https', '', ${lang}, -1, '/x', '', '')}")
      == "https://en/x")
    assert(evalExpr("${getUri('ftp', ${lang}, 21, '/d')}") == "ftp://en:21/d")
    intercept[IllegalArgumentException] { El.compileExpr("${getUri('a', 'b')}") }
  }

  test("r11 tail: thread is a compile-time literal tag") {
    assert(evalExpr("${thread()}") == Thread.currentThread().getName)
  }

  test("r11 tail: evaluateELString compiles constant subjects, rejects columns") {
    assert(evalExpr("${literal('${lang:toUpper()}'):evaluateELString()}") == "EN")
    assert(evalExpr("${literal('n=${n:plus(8)}'):evaluateELString()}") == "n=50")
    // state-carried EL — the actual NiFi use case for this function
    assert {
      val df = Seq(("x", 1L)).toDF("lang", "n")
      df.select(El.compileExprWithState(
        "${getStateValue('rule'):evaluateELString()}",
        Map("rule" -> "${n:multiply(3)}")).as("v")).collect()(0).get(0) == "3"
    } // template compile is string-typed, NiFi's evaluateELString contract
    val e = intercept[IllegalArgumentException] {
      evalExpr("${lang:evaluateELString()}")
    }
    assert(e.getMessage.contains("compile-time-constant"))
  }

  test("r11 tail: isJson accepts any JSON value, rejects prose and null") {
    assert(evalExpr("${literal('{\"a\":[1,2]}'):isJson()}") == true)
    assert(evalExpr("${literal('[1,2,3]'):isJson()}") == true)
    assert(evalExpr("${text:isJson()}") == false)
    assert(evalExpr("${literal('{\"a\":'):isJson()}") == false)
  }

  test("r11 tail: jsonPath write family — exact bytes, unresolved paths no-op") {
    def j(e: String): Any = evalExpr(e)
    assert(j("${literal('{\"a\":1,\"b\":2}'):jsonPathDelete('$.b')}") == """{"a":1}""")
    assert(j("${literal('{\"xs\":[10,20,30]}'):jsonPathDelete('$.xs[1]')}")
      == """{"xs":[10,30]}""")
    assert(j("${literal('{\"a\":1}'):jsonPathSet('$.a', 'true')}") == """{"a":true}""")
    assert(j("${literal('{\"a\":1}'):jsonPathSet('$.a', 'str')}") == """{"a":"str"}""")
    assert(j("${literal('{\"xs\":[1]}'):jsonPathAdd('$.xs', '2.5')}") == """{"xs":[1,2.5]}""")
    assert(j("${literal('{\"m\":{}}'):jsonPathPut('$.m', 'k', 'v')}")
      == """{"m":{"k":"v"}}""")
    // nested navigation
    assert(j("${literal('{\"a\":{\"b\":[{\"c\":1}]}}'):jsonPathSet('$.a.b[0].c', '9')}")
      == """{"a":{"b":[{"c":9}]}}""")
    // unresolvable paths leave the document unchanged (typo'd path must
    // not fabricate structure), invalid JSON yields null
    assert(j("${literal('{\"a\":1}'):jsonPathDelete('$.zzz')}") == """{"a":1}""")
    assert(j("${literal('{\"a\":1}'):jsonPathSet('$.zzz', '2')}") == """{"a":1}""")
    assert(j("${literal('{\"a\":1}'):jsonPathAdd('$.a', '2')}") == """{"a":1}""")
    assert(j("${literal('not json'):jsonPathDelete('$.a')}") == null)
  }

  test("malformed templates fail with a parse error, not an index crash") {
    for (bad <- Seq("${lang", "${lang:toUpper(", "${lang:equals('x}", "${'unclosed}", "${}"))
      intercept[IllegalArgumentException] { El.compile(bad) }
  }
}
