package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Html

/** Gates for the hand-rolled HTML engine (r16; SURVEY §2.4 stage-0):
  * tokenizer tolerance on soup, entity decoding, jusText
  * classification semantics (published defaults + the no-stoplist
  * mode), the context pass, and the CSS-lite selector. */
class HtmlSpec extends AnyFunSuite {

  test("tokenizer: tags, comments, CDATA, doctype, entities, raw text") {
    val html =
      """<!DOCTYPE html><html><head><title>T</title>
        |<style>p { color: red; } /* <p>not a block</p> */</style>
        |<script>if (1 < 2) { var s = "</div> fake"; }</script></head>
        |<body><!-- a comment <p>ignored</p> -->
        |<p>alpha &amp; beta &lt;kept&gt; &#65;&#x42;</p>
        |<![CDATA[ raw noise ]]>
        |<div>gamma   with
        |   collapsed   whitespace</div>
        |</body></html>""".stripMargin
    val bs = Html.blocks(html)
    assert(bs.map(_.text) == Vector("alpha & beta <kept> AB",
      "gamma with collapsed whitespace"))
  }

  test("tokenizer: head content drops, stray '<' literal, unclosed tags survive") {
    assert(Html.stripTags("<p>a < b</p><div>tail") == "a < b\ntail")
    assert(Html.stripTags("<head><title>gone</title></head><p>kept</p>") == "kept")
    assert(Html.stripTags("") == "")
    assert(Html.stripTags("no tags at all") == "no tags at all")
  }

  test("link chars: counted inside <a> only, non-whitespace") {
    val bs = Html.blocks("""<p>read <a href="x">the docs</a> now</p>""")
    assert(bs == Vector(Html.Block("read the docs now", 7))) // "thedocs"
  }

  test("jusText: nav bad by link density, copyright bad, context pass resolves short/near-good") {
    val para2 = "x" * 210
    val html =
      """<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/b">More</a></nav>""" +
      "<h1>Heading</h1>" +
      s"<p>${"word " * 20}</p>" + // ~100 chars → near-good (no-stoplist)
      s"<p>$para2</p>" +          // > 200 → good
      "<p>fin</p>" +
      """<div>© site <a href="/t">terms</a></div>"""
    val out = Html.extractMainText(html, stopLow = 0, stopHigh = 0)
    val lines = out.split("\n").toSeq
    // heading: short with bad prev (nav) → dropped; para1 near-good
    // next to good para2 → kept; fin short between good and bad → dropped
    assert(lines == Seq(("word " * 20).trim, para2))
  }

  test("jusText: stoplist mode needs stopword density; no-stoplist mode does not") {
    val dense = ("the data of a system " * 12).trim   // stop-dense, >70 chars
    val sparse = ("colum value scan shuffle " * 12).trim // ~0 stop density
    val html = s"<p>$dense</p><p>$sparse</p>"
    val withStops = Html.extractMainText(html)
    assert(withStops.contains(dense) && !withStops.contains(sparse),
      "stoplist mode must keep only the stopword-dense block")
    val noStops = Html.extractMainText(html, stopLow = 0, stopHigh = 0)
    assert(noStops.contains(dense) && noStops.contains(sparse))
  }

  test("fixture invariant: the q_html_extract second paragraph exceeds lengthHigh for every doc_id") {
    // mirrors htmlPara2 in QueriesLlm — shortest doc_id is 1 digit
    val p2 = "the remaining prose of document 0 continues with additional " +
      "context sentences that keep this block comfortably beyond the two " +
      "hundred character boundary required by the published classifier " +
      "for a direct good verdict in the absence of a stoplist across " +
      "every row of the corpus"
    assert(p2.length > 200, s"fixture para2 is ${p2.length} chars")
  }

  test("selector: tag, #id, .class, compound, [attr], document order, nesting") {
    val html =
      """<div id="main" class="wrap outer"><p class="lead big">first</p>
        |<p>second</p><span data-k="v">third</span></div>
        |<p class="lead">fourth</p><img src="x">""".stripMargin
    assert(Html.selectText(html, "p") == Vector("first", "second", "fourth"))
    assert(Html.selectText(html, ".lead") == Vector("first", "fourth"))
    assert(Html.selectText(html, "p.lead.big") == Vector("first"))
    assert(Html.selectText(html, "#main") ==
      Vector("first second third"))
    assert(Html.selectText(html, "[data-k=v]") == Vector("third"))
    assert(Html.selectText(html, "span[data-k]") == Vector("third"))
    assert(Html.selectText(html, "h9") == Vector.empty)
    intercept[IllegalArgumentException](Html.selectText(html, "p > em"))
  }

  test("selector: nested matches capture once at the outermost match") {
    val html = """<div class="a">out <div class="a">in</div> side</div>"""
    assert(Html.selectText(html, ".a") == Vector("out in side"))
  }

  test("void elements: bare <embed>/<img>/<meta> never swallow content or capture to EOF (r16)") {
    // <embed> is a DropTag AND a void element: without void handling a
    // bare open would drop the rest of the document
    assert(Html.stripTags("<p>before</p><embed src=x><p>after</p>") == "before\nafter")
    // a selector matching a void element returns empty text, not the tail
    assert(Html.selectText("<img src=x><p>hello world</p>", "img") == Vector(""))
    assert(Html.selectText("<meta name=a content=b><p>kept</p>", "p") == Vector("kept"))
    // DropTags content stays out of selected text (the dropDepth guard)
    assert(Html.selectText(
      "<div>shown <noscript>Enable JS</noscript> also</div>", "div") ==
      Vector("shown also"))
  }

  test("fuzz: random soup never throws and always terminates") {
    // crawl HTML is adversarial by default — 2000 random documents over
    // a hostile alphabet (tag punctuation, quotes, entities, high
    // bytes) through every public surface; deterministic seed
    val rnd = new scala.util.Random(4242)
    val alphabet = "<>/=\"'&;#! \n\r\tabcp-é�{}[]"
    val fragments = Seq("<script>", "</script", "<!--", "<![CDATA[", "&#x",
      "<p", "</p>", "<a href=\"", "<div class='", "<!DOCTYPE", "<?xml",
      "&amp", "{12}", "<br/>", "</", "<>", "<--")
    (0 until 2000).foreach { i =>
      val sb = new StringBuilder
      (0 until 1 + rnd.nextInt(60)).foreach { _ =>
        if (rnd.nextBoolean()) sb.append(fragments(rnd.nextInt(fragments.size)))
        else (0 until rnd.nextInt(8)).foreach(_ =>
          sb.append(alphabet.charAt(rnd.nextInt(alphabet.length))))
      }
      val doc = sb.toString
      // none of these may throw, loop forever, or return null
      assert(Html.blocks(doc) != null, s"blocks threw/nulled on seed doc $i")
      assert(Html.stripTags(doc) != null)
      assert(Html.extractMainText(doc, stopLow = 0, stopHigh = 0) != null)
      assert(Html.selectText(doc, "p") != null)
      assert(Html.selectText(doc, ".a") != null)
    }
  }
}
