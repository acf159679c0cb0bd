package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._

/** RFC 9309 rule boundaries for the robots.txt decision — golden
  * fixtures through the real expression (codegen path), one per rule.
  */
class RobotsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def allowed(robots: String, path: String,
                      agent: String = "graftbot/1.0"): Boolean = {
    import spark.implicits._
    Seq((robots, path, agent)).toDF("r", "p", "a")
      .select(Robots.robots_allowed($"r", $"p", $"a")).collect()(0)
      .getBoolean(0)
  }

  private val simple =
    """User-agent: *
      |Disallow: /private/
      |Allow: /private/ok
      |""".stripMargin

  test("prefix disallow blocks the subtree; the longer Allow carves an " +
      "exception; unrelated paths pass") {
    assert(!allowed(simple, "/private/x"))
    assert(allowed(simple, "/private/ok/page"))
    assert(allowed(simple, "/public/x"))
  }

  test("empty robots, whitespace robots, and a no-matching-group agent " +
      "all allow (the REP default)") {
    assert(allowed("", "/anything"))
    assert(allowed("   \n  ", "/anything"))
    assert(allowed("User-agent: otherbot\nDisallow: /", "/x"))
  }

  test("group selection: the longest named token contained in the agent " +
      "beats shorter ones and beats '*'") {
    val r =
      """User-agent: *
        |Disallow: /a
        |
        |User-agent: graft
        |Disallow: /b
        |
        |User-agent: graftbot
        |Disallow: /c
        |""".stripMargin
    assert(allowed(r, "/a")) // named group won: '*' rules don't apply
    assert(allowed(r, "/b")) // 'graftbot' is longer than 'graft'
    assert(!allowed(r, "/c"))
    assert(!allowed(r, "/a", agent = "somebot")) // falls back to '*'
  }

  test("consecutive User-agent lines share one rule set; unknown fields " +
      "do not close a group; '#' comments strip") {
    val r =
      """User-agent: abot  # covers abot
        |User-agent: bbot
        |Crawl-delay: 10
        |Disallow: /x # and a trailing comment
        |""".stripMargin
    assert(!allowed(r, "/x/page", agent = "abot"))
    assert(!allowed(r, "/x/page", agent = "bbot"))
    assert(allowed(r, "/y", agent = "abot"))
  }

  test("wildcards: '*' spans segments, '$' anchors the end, longest " +
      "pattern wins, Allow wins an equal-length tie") {
    val r =
      """User-agent: *
        |Disallow: /*.pdf$
        |Allow: /docs/
        |Disallow: /docs/
        |""".stripMargin
    assert(!allowed(r, "/files/a.pdf"))
    assert(allowed(r, "/files/a.pdf.html")) // $ anchor: not an end match
    assert(allowed(r, "/docs/a"), "equal-length Allow/Disallow tie -> allow")
    val r2 = "User-agent: *\nDisallow: /a*c\n"
    assert(!allowed(r2, "/abc/d"))
    assert(!allowed(r2, "/axxc"))
    assert(allowed(r2, "/ab"))
    // a pattern '*' aligned with a LITERAL '*' in the path must still
    // open a wildcard match, not be consumed as a literal (r14 ADVICE:
    // the literal-equality branch used to win the tie)
    val r3 = "User-agent: *\nDisallow: /p*q\n"
    assert(!allowed(r3, "/p*xq"))
    assert(!allowed(r3, "/p*q"))
    assert(!allowed(r3, "/pxq"))
  }

  test("an empty Disallow value matches nothing (allow-all idiom); a " +
      "bare Disallow: / blocks everything") {
    assert(allowed("User-agent: *\nDisallow:\n", "/x"))
    assert(!allowed("User-agent: *\nDisallow: /\n", "/x"))
  }
}
