package graft

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
    assert(evalExpr("${text:length()}") == 11L)
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

  test("unknown function rejected") {
    intercept[IllegalArgumentException] { El.compile("${lang:nope()}") }
  }

  test("malformed templates fail with a parse error, not an index crash") {
    for (bad <- Seq("${lang", "${lang:toUpper(", "${lang:equals('x}", "${'unclosed}", "${}"))
      intercept[IllegalArgumentException] { El.compile(bad) }
  }
}
