package graft

import org.apache.spark.sql.functions._
import graft.operators.{Jolt, Records}

/** Full-DSL Jolt gates (r17): the interpreter is checked against the
  * worked examples in the public Jolt documentation (shift wildcards +
  * `&` references, default, remove, cardinality,
  * modify-overwrite-beta, chaining), then through the Spark expression
  * and the JoltTransformJSON flow processor. */
class JoltSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def run(spec: String, input: String): String =
    Jolt.transformString(spec)(input)
  private def assertJson(got: String, want: String): Unit =
    assert(mapper.readTree(got) == mapper.readTree(want),
      s"\n got: $got\nwant: $want")

  test("shift: the canonical wildcard + & example from the Jolt docs") {
    val input =
      """{"rating": {"primary": {"value": 3},
        |            "quality": {"value": 3, "label": "Good"}}}""".stripMargin
    val spec =
      """{"rating": {"primary": {"value": "Rating"},
        |            "*": {"value": "SecondaryRatings.&1.Value",
        |                  "label": "SecondaryRatings.&1.Label"}}}""".stripMargin
    assertJson(run(spec, input),
      """{"Rating": 3,
        |"SecondaryRatings": {"quality": {"Value": 3, "Label": "Good"}}}""".stripMargin)
  }

  test("shift: & depth references, alternation, array input, [] append, multi-write") {
    // &0 is the matched key itself
    assertJson(run("""{"*": "out.&0"}""", """{"a": 1, "b": 2}"""),
      """{"out": {"a": 1, "b": 2}}""")
    // a|b alternation matches either key
    assertJson(run("""{"a|b": "hit"}""", """{"b": 5}"""), """{"hit": 5}""")
    // array elements match by index key
    assertJson(run("""{"xs": {"0": "first", "2": "third"}}""",
      """{"xs": [10, 20, 30]}"""), """{"first": 10, "third": 30}""")
    // [] appends in encounter order
    assertJson(run("""{"*": "all[]"}""", """{"a": 1, "b": 2, "c": 3}"""),
      """{"all": [1, 2, 3]}""")
    // two writes to one slot accumulate into a list (Jolt collision rule)
    assertJson(run("""{"a": "x", "b": "x"}""", """{"a": 1, "b": 2}"""),
      """{"x": [1, 2]}""")
    // RHS array = multi-write of one value
    assertJson(run("""{"a": ["p", "q.r"]}""", """{"a": 7}"""),
      """{"p": 7, "q": {"r": 7}}""")
    // unmatched input drops
    assertJson(run("""{"a": "a"}""", """{"a": 1, "junk": 2}"""), """{"a": 1}""")
  }

  test("default: fills absent/null slots only; * fans over existing keys; containers created") {
    val spec = """{"meta": {"source": "events"}, "k": 0,
                  "*": {"seen": true}}"""
    assertJson(run(s"""[{"operation": "default", "spec": $spec}]""",
      """{"k": 5, "a": {"x": 1}}"""),
      // k keeps 5; meta created with source; * adds seen under a
      // (and under the created meta? no — * fans over keys EXISTING
      // when the spec entry is applied; Jackson preserves insertion
      // order so meta exists by then — both orders are defensible, we
      // pin: * applies to every object-valued key present after
      // literal defaults, in input order)
      """{"k": 5, "a": {"x": 1, "seen": true}, "meta": {"source": "events", "seen": true}}""")
    // null counts as absent
    assertJson(run("""[{"operation": "default", "spec": {"k": 1}}]""",
      """{"k": null}"""), """{"k": 1}""")
  }

  test("remove: literal, wildcard and nested removes") {
    assertJson(run("""[{"operation": "remove", "spec": {"debug": ""}}]""",
      """{"a": 1, "debug": {"x": 9}}"""), """{"a": 1}""")
    assertJson(run("""[{"operation": "remove", "spec": {"*": {"secret": ""}}}]""",
      """{"u1": {"name": "n", "secret": "s"}, "u2": {"secret": "t"}}"""),
      """{"u1": {"name": "n"}, "u2": {}}""")
  }

  test("cardinality: ONE unwraps, MANY wraps, idempotent where already right") {
    val spec = """[{"operation": "cardinality",
                    "spec": {"tags": "ONE", "ids": "MANY"}}]"""
    assertJson(run(spec, """{"tags": ["a", "b"], "ids": 7}"""),
      """{"tags": "a", "ids": [7]}""")
    assertJson(run(spec, """{"tags": "a", "ids": [7]}"""),
      """{"tags": "a", "ids": [7]}""")
    // ONE on an empty list removes the slot
    assertJson(run(spec, """{"tags": []}"""), """{}""")
  }

  test("modify-overwrite-beta: functions and literal overwrite") {
    val spec = """[{"operation": "modify-overwrite-beta",
                    "spec": {"name": "=toUpper", "code": "=toLower",
                             "pad": "=trim", "n": "=size",
                             "src": "fixed"}}]"""
    assertJson(run(spec,
      """{"name": "ab", "code": "XY", "pad": " z ", "n": "hello", "src": "was"}"""),
      """{"name": "AB", "code": "xy", "pad": "z", "n": 5, "src": "fixed"}""")
    // =size over arrays/objects; functions leave absent slots absent
    assertJson(run("""[{"operation": "modify-overwrite-beta",
                        "spec": {"xs": "=size", "missing": "=toUpper"}}]""",
      """{"xs": [1, 2, 3]}"""), """{"xs": 3}""")
  }

  test("shift $ key-refs and # literals (r17): collect keys, tag reached levels") {
    // the docs' "collect the keys" shape: $ writes the MATCHED KEY
    assertJson(run("""{"*": {"$": "keys[]"}}""",
      """{"alpha": 1, "beta": 2}"""),
      """{"keys": ["alpha", "beta"]}""")
    // $1 reaches one match level up; & in the destination still works
    assertJson(run("""{"*": {"id": {"$1": "byId.&1"}}}""",
      """{"u7": {"id": 7}, "u9": {"id": 9}}"""),
      """{"byId": {"u7": "u7", "u9": "u9"}}""")
    // #literal writes its text when the level is reached (per match)
    assertJson(run("""{"*": {"#seen": "flags[]"}}""",
      """{"a": {}, "b": {}}"""),
      """{"flags": ["seen", "seen"]}""")
    // an input key literally named "$" does not trigger the key-ref
    assertJson(run("""{"x": {"$": "gotKey"}}""", """{"x": {"$": 5}}"""),
      """{"gotKey": "x"}""")
    // $ past the match depth throws (root level has no matched key)
    intercept[IllegalArgumentException] {
      run("""{"$": "k"}""", """{"a": 1}""")
    }
  }

  test("modify functions with args (r17): concat/join/split, @(1,field) refs, conversions") {
    // =concat from sibling refs + literal (creates the slot)
    assertJson(run("""[{"operation": "modify-overwrite-beta",
        "spec": {"full": "=concat(@(1,first), ' ', @(1,last))"}}]""",
      """{"first": "Ada", "last": "Lovelace"}"""),
      """{"first": "Ada", "last": "Lovelace", "full": "Ada Lovelace"}""")
    // a missing reference skips the assignment
    assertJson(run("""[{"operation": "modify-overwrite-beta",
        "spec": {"full": "=concat(@(1,first), @(1,nope))"}}]""",
      """{"first": "Ada"}"""), """{"first": "Ada"}""")
    // =join over an array sibling; =split the inverse
    assertJson(run("""[{"operation": "modify-overwrite-beta",
        "spec": {"csv": "=join(',', @(1,xs))", "parts": "=split('-', @(1,code))"}}]""",
      """{"xs": ["a", "b", "c"], "code": "x-y-z"}"""),
      """{"xs": ["a", "b", "c"], "code": "x-y-z",
         "csv": "a,b,c", "parts": ["x", "y", "z"]}""")
    // numeric conversions on existing values; non-parse leaves as-is
    assertJson(run("""[{"operation": "modify-overwrite-beta",
        "spec": {"n": "=toInteger", "d": "=toDouble", "s": "=toString", "bad": "=toInteger"}}]""",
      """{"n": "42", "d": "2.5", "s": 7, "bad": "xyz"}"""),
      """{"n": 42, "d": 2.5, "s": "7", "bad": "xyz"}""")
    // malformed function leaves throw at PARSE time (validation moment)
    // (@(2,x) became a FEATURE in r18 — the invalid form is level 0)
    intercept[IllegalArgumentException] {
      Jolt.chain("""[{"operation": "modify-overwrite-beta",
        "spec": {"a": "=concat(@(0,x))"}}]""")
    }
    intercept[IllegalArgumentException] {
      Jolt.chain("""[{"operation": "modify-overwrite-beta",
        "spec": {"a": "=frobnicate('x')"}}]""")
    }
  }

  test("chained spec: shift then default then modify then remove (one pipeline)") {
    val chain =
      """[
        |{"operation": "shift", "spec": {"user": {"*": "account.&"},
        |                                "k": "meta.key", "tags": "tags",
        |                                "gone": "trash.x"}},
        |{"operation": "remove", "spec": {"trash": ""}},
        |{"operation": "cardinality", "spec": {"tags": "ONE"}},
        |{"operation": "default", "spec": {"meta": {"source": "events"}}},
        |{"operation": "modify-overwrite-beta",
        | "spec": {"account": {"type": "=toUpper"}}}
        |]""".stripMargin
    val input =
      """{"user": {"id": 7, "type": "click"}, "k": 69,
        |"tags": ["x", "y"], "gone": 1}""".stripMargin
    assertJson(run(chain, input),
      """{"account": {"id": 7, "type": "CLICK"},
        |"meta": {"key": 69, "source": "events"}, "tags": "x"}""".stripMargin)
  }

  test("validation: unknown operation / bad cardinality leaf / bad modify fn throw at parse") {
    intercept[IllegalArgumentException] { Jolt.chain("""[{"operation": "nope", "spec": {}}]""") }
    intercept[IllegalArgumentException] {
      run("""[{"operation": "cardinality", "spec": {"a": "SOME"}}]""", """{"a": 1}""")
    }
    intercept[IllegalArgumentException] {
      run("""[{"operation": "modify-overwrite-beta", "spec": {"a": "=nope"}}]""",
        """{"a": 1}""")
    }
  }

  test("modify math + list functions (r18): the docs' Modifier vocabulary") {
    def mod(spec: String, in: String): String =
      run(s"""[{"operation": "modify-overwrite-beta", "spec": $spec}]""", in)
    // typed sums flatten list args; numeric TEXT converts
    assertJson(mod("""{"total": "=intSum(@(1,vals), 5)"}""",
      """{"vals": [1, 2, "3"]}"""),
      """{"vals": [1, 2, "3"], "total": 11}""")
    assertJson(mod("""{"d": "=doubleSum(@(1,a), @(1,b))"}""",
      """{"a": 1.5, "b": 2}"""),
      """{"a": 1.5, "b": 2, "d": 3.5}""")
    // min/max keep integral type when every operand is integral
    assertJson(mod("""{"m": "=max(@(1,a), @(1,b), 7)"}""", """{"a": 3, "b": 12}"""),
      """{"a": 3, "b": 12, "m": 12}""")
    assertJson(mod("""{"m": "=min(@(1,a), 2.5)"}""", """{"a": 3}"""),
      """{"a": 3, "m": 2.5}""")
    assertJson(mod("""{"x": "=abs(@(1,a))"}""", """{"a": -4}"""),
      """{"a": -4, "x": 4}""")
    assertJson(mod("""{"x": "=avg(@(1,vals))"}""", """{"vals": [1, 2, 3, 4]}"""),
      """{"vals": [1, 2, 3, 4], "x": 2.5}""")
    assertJson(mod("""{"x": "=longSubtract(@(1,a), 1)"}""", """{"a": 10}"""),
      """{"a": 10, "x": 9}""")
    assertJson(mod("""{"x": "=divide(@(1,a), 4)"}""", """{"a": 10}"""),
      """{"a": 10, "x": 2.5}""")
    assertJson(mod("""{"x": "=divideAndRound(2, @(1,a), 3)"}""", """{"a": 10}"""),
      """{"a": 10, "x": 3.33}""")
    // divide by zero / non-numeric operands SKIP the slot, never fail
    assertJson(mod("""{"x": "=divide(@(1,a), 0)"}""", """{"a": 10}"""),
      """{"a": 10}""")
    assertJson(mod("""{"x": "=intSum(@(1,a))"}""", """{"a": {"not": "num"}}"""),
      """{"a": {"not": "num"}}""")
    // list accessors
    assertJson(mod("""{"f": "=firstElement(@(1,vals))", "l": "=lastElement(@(1,vals))",
                       "e": "=elementAt(@(1,vals), 1)"}""",
      """{"vals": [7, 8, 9]}"""),
      """{"vals": [7, 8, 9], "f": 7, "l": 9, "e": 8}""")
    // out-of-range index skips; unknown function still rejects at parse
    assertJson(mod("""{"e": "=elementAt(@(1,vals), 9)"}""", """{"vals": [1]}"""),
      """{"vals": [1]}""")
    intercept[IllegalArgumentException] {
      Jolt.chain("""[{"operation": "modify-overwrite-beta", "spec": {"x": "=frob(1)"}}]""")
    }
    // @(2,field) reaches one OBJECT level further up (r18 depth close)
    assertJson(mod("""{"inner": {"tagged": "=concat(@(2,prefix), '-', @(1,name))"}}""",
      """{"prefix": "px", "inner": {"name": "a"}}"""),
      """{"prefix": "px", "inner": {"name": "a", "tagged": "px-a"}}""")
    // a level past the root skips (empty-Optional), never throws
    assertJson(mod("""{"inner": {"x": "=concat(@(9,gone), 'y')"}}""",
      """{"inner": {"k": 1}}"""),
      """{"inner": {"k": 1}}""")
    // levels count OBJECT nesting: arrays are transparent
    assertJson(mod("""{"rows": {"total": "=intSum(@(1,v), @(2,base))"}}""",
      """{"base": 100, "rows": [{"v": 1}, {"v": 2}]}"""),
      """{"base": 100, "rows": [{"v": 1, "total": 101}, {"v": 2, "total": 102}]}""")
    // r19 (ADVICE): typed integer forms sum/subtract in the LONG
    // domain when all operands are integral — longs past 2^53 keep
    // exact precision (a Double pass would round 9007199254740993 to
    // ...992), matching upstream Jolt's Math.longSum/longSubtract
    assertJson(mod("""{"x": "=longSum(@(1,a), 1)"}""",
      """{"a": 9007199254740992}"""),
      """{"a": 9007199254740992, "x": 9007199254740993}""")
    assertJson(mod("""{"x": "=longSubtract(@(1,a), 1)"}""",
      """{"a": 9007199254740993}"""),
      """{"a": 9007199254740993, "x": 9007199254740992}""")
    // integral digit TEXT joins the long-exact path too
    assertJson(mod("""{"x": "=longSum(@(1,a), '3')"}""",
      """{"a": 9007199254740990}"""),
      """{"a": 9007199254740990, "x": 9007199254740993}""")
    // a double operand anywhere falls the whole sum back to Double
    // (then truncates for the typed result, as before)
    assertJson(mod("""{"x": "=longSum(@(1,a), 0.5)"}""", """{"a": 4}"""),
      """{"a": 4, "x": 4}""")
  }

  test("shift @-lookups (r18): copy the matched VALUE; destinations keyed by data") {
    // "@": copy the WHOLE node at this level (where $ copies the key)
    assertJson(run("""{"*": {"@": "all[]"}}""",
      """{"a": 1, "b": 2}"""),
      """{"all": [1, 2]}""")
    // "@(n,path)": read a field n levels up the INPUT tree
    assertJson(run("""{"*": {"id": {"@(1,name)": "names.&1"}}}""",
      """{"u7": {"id": 7, "name": "ada"}, "u9": {"id": 9, "name": "bo"}}"""),
      """{"names": {"u7": "ada", "u9": "bo"}}""")
    // "@(path)" sugar for level 0
    assertJson(run("""{"x": {"@(inner)": "got"}}""",
      """{"x": {"inner": 5, "other": 6}}"""),
      """{"got": 5}""")
    // RHS destination keyed by a looked-up VALUE — the docs' canonical
    // "photos.@(1,type).id" shape: group each record under its type
    assertJson(run("""{"photos": {"*": {"id": "byType.@(1,type).ids[]"}}}""",
      """{"photos": {"p1": {"id": 11, "type": "cat"},
                     "p2": {"id": 22, "type": "dog"},
                     "p3": {"id": 33, "type": "cat"}}}"""),
      """{"byType": {"cat": {"ids": [11, 33]}, "dog": {"ids": [22]}}}""")
    // a MISSING lookup skips that write (data-dependent, not an error)
    assertJson(run("""{"*": {"@(0,nope)": "x[]"}}""", """{"a": {"k": 1}}"""),
      """{}""")
    // out-of-depth @ is a SPEC error: rejected at parse time
    intercept[IllegalArgumentException] { Jolt.chain("""{"a": {"@3": "x"}}""") }
    intercept[IllegalArgumentException] { Jolt.chain("""{"a": "dst.@(5,k)"}""") }
  }

  test("data-dependent write conflict routes the ROW to failure (null), not the job (r18)") {
    // 'a' shifts to x (scalar), then 'b' tries to descend INTO x — a
    // per-document collision NiFi routes to the failure relationship
    val spec = """[{"operation": "shift", "spec": {"a": "x", "b": "x.y"}}]"""
    val t = Jolt.transformString(spec)
    assert(t("""{"a": 1, "b": 2}""") == null, "colliding doc -> failure (null)")
    assertJson(t("""{"b": 2}"""), """{"x": {"y": 2}}""")
    // spec validation stays STRICT at compile time — a bad spec still
    // throws before any row is seen
    intercept[IllegalArgumentException] { Jolt.chain("""[{"operation": "nope"}]""") }
  }

  test("Spark expression + flow processor: per-row transform, null on bad JSON") {
    val df = Seq("""{"a": {"b": 1}}""", "not json").toDF("content")
    val out = Records.joltTransformChain(df, "content",
      """{"a": {"*": "top.&"}}""", "jolted")
      .select("jolted").as[String].collect()
    assertJson(out(0), """{"top": {"b": 1}}""")
    assert(out(1) == null, "unparseable input routes to failure (null)")

    val flow = """{"flowContents": {"name": "jolt",
      "inputPorts": [{"identifier": "in", "name": "recs"}],
      "outputPorts": [{"identifier": "out", "name": "jolted"}],
      "processors": [
        {"identifier": "p-j", "name": "Restructure",
         "type": "org.apache.nifi.processors.standard.JoltTransformJSON",
         "properties": {
           "Jolt Transformation DSL": "jolt-transform-shift",
           "Jolt Specification": "{\"a\": {\"*\": \"top.&\"}}"}}],
      "connections": [
        {"source": {"id": "in"}, "destination": {"id": "p-j"}},
        {"source": {"id": "p-j"}, "destination": {"id": "out"}}]}}"""
    val got = FlowCompiler.compile(spark, flow,
      Map("recs" -> Seq("""{"a": {"b": 2}}""").toDF("content")))("jolted")
      .select("jolted").as[String].collect()(0)
    assertJson(got, """{"top": {"b": 2}}""")
    // a bad spec fails at FLOW-COMPILE time (processor validation)
    val badFlow = flow.replace("jolt-transform-shift", "jolt-transform-bogus")
    intercept[IllegalArgumentException] {
      FlowCompiler.compile(spark, badFlow,
        Map("recs" -> Seq("""{}""").toDF("content")))("jolted")
    }
  }
}
