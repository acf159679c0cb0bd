package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._

/** Golden fixtures for the HTML extractor — the adversarial inputs a
  * crawl actually contains, each pinned to an exact expected output (the
  * gate query covers the well-formed template end to end; this suite
  * owns the tag soup).
  */
class HtmlTextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private case class Ex(title: Option[String], text: String, nKept: Int,
                        nDropped: Int, nLinks: Int, links: Seq[String])

  private def run(html: String): Ex = {
    import spark.implicits._
    val r = Seq(html).toDF("h")
      .select(HtmlText.html_text($"h").as("x"))
      .select($"x.title", $"x.text", $"x.n_kept", $"x.n_dropped",
        $"x.n_links", $"x.links")
      .collect()(0)
    Ex(Option(r.getString(0)), r.getString(1), r.getInt(2), r.getInt(3),
      r.getInt(4), r.getSeq[String](5))
  }

  private val prose =
    "This paragraph easily clears the twenty-five character floor."

  test("basic page: title captured, prose kept, nav and footer dropped") {
    val got = run(
      s"""<html><head><title>A &amp; B</title></head><body>
         |<nav><a href="/">Home</a> <a href="/x">More</a></nav>
         |<p>$prose</p>
         |<footer><a href="/t">Terms</a></footer></body></html>"""
        .stripMargin)
    assert(got.title === Some("A & B"))
    assert(got.text === prose)
    assert(got.nKept === 1 && got.nDropped === 2)
    assert(got.nLinks === 3 && got.links === Seq("/", "/x", "/t"))
  }

  test("script/style/noscript raw content is skipped even with '<' and " +
      "fake close tags inside strings; case-insensitive close scan") {
    val got = run(
      s"""<STYLE>p { content: "</p>not text"; }</STYLE>
         |<script>if (a < b) { s = "</scr" + "ipt>"; }</script>
         |<p>$prose</p><NOSCRIPT><p>hidden</p></NOSCRIPT>""".stripMargin)
    assert(got.text === prose)
    assert(got.nKept === 1)
  }

  test("entities: named, decimal, hex, nbsp collapses as whitespace-like " +
      "space, unknown and unterminated pass through literally") {
    val got = run(
      "<p>x &lt;tag&gt; &quot;q&quot; &#65;&#x42; &bogus; &amp broken " +
        "and padding padding padding</p>")
    assert(got.text ===
      "x <tag> \"q\" AB &bogus; &amp broken and padding padding padding")
  }

  test("comments and CDATA are skipped; a comment hiding a block tag " +
      "does not flush") {
    val got = run(
      s"""<p>first half <!-- <p>ghost</p> --><![CDATA[<p>x</p>]]>second
         |half of the same long block</p>""".stripMargin)
    assert(got.nKept === 1)
    assert(got.text === "first half second half of the same long block")
  }

  test("link-density rule: a block that is exactly one-third anchor " +
      "chars is kept; one char more anchor is dropped") {
    // 10 anchor chars, 30 total -> 3*10 <= 30 keep
    val kept = run("<p><a>0123456789</a>01234567890123456789</p>")
    assert(kept.nKept === 1 && kept.nDropped === 0)
    // 11 anchor chars, 30 total -> 33 > 30 drop
    val dropped = run("<p><a>01234567890</a>0123456789012345678</p>")
    assert(dropped.nKept === 0 && dropped.nDropped === 1)
  }

  test("length rule: exactly 25 chars kept, 24 dropped; empty blocks " +
      "count as nothing") {
    assert(run("<p>" + "x" * 25 + "</p><div></div><p> </p>").nKept === 1)
    val d = run("<p>" + "x" * 24 + "</p>")
    assert(d.nKept === 0 && d.nDropped === 1)
  }

  test("whitespace collapses to single spaces and blocks trim; <br> and " +
      "table cells are block boundaries") {
    val got = run(
      "<td>  padded   cell with  enough   characters to keep  </td>" +
        s"<p>top line of the block$$</p><p>a<br>b</p>")
    assert(got.text.startsWith("padded cell with enough characters to keep"))
    // br split "a" / "b" into two sub-25 blocks
    assert(got.nDropped === 3)
  }

  test("nested and unbalanced anchors never underflow; links without " +
      "href are counted but contribute no href; bare href parses") {
    val got = run(
      s"""</a></a><p><a href=/bare>in</a> and <a>no-href</a> $prose</p>"""
        .stripMargin)
    assert(got.nLinks === 2 && got.links === Seq("/bare"))
    assert(got.text.endsWith(prose))
  }

  test("truncated tag at EOF drops the tail instead of leaking markup") {
    val got = run(s"<p>$prose</p><p>trailing junk <a href=")
    assert(got.text === prose)
    assert(got.nKept === 1 && got.nDropped === 1)
  }

  test("unknown tags are inline (no flush); uppercase block tags flush") {
    val one = run(s"<p>alpha <CUSTOM-WIDGET foo=1>beta</CUSTOM-WIDGET> $prose</p>")
    assert(one.nKept === 1 && one.text === s"alpha beta $prose")
    val two = run(s"<p>$prose<DIV>$prose</DIV></p>")
    assert(two.nKept === 2)
  }

  test("title entities decode; missing title is NULL; title is never a " +
      "content block") {
    assert(run("<title>T &#x26; U</title>").title === Some("T & U"))
    val got = run(s"<p>$prose</p>")
    assert(got.title === None && got.nKept === 1)
  }
}
