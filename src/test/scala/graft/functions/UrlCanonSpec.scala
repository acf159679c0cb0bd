package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._

/** Golden fixtures for the URL canonicalizer — each rule pinned to an
  * exact expected string (the gate query covers the composed behavior
  * over the corpus; this suite owns the rule boundaries).
  */
class UrlCanonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def canon(url: String): String = {
    import spark.implicits._
    Seq(url).toDF("u").select(UrlCanon.url_canon($"u")).collect()(0)
      .getString(0)
  }

  test("case, default port, dot segments, fragment and tracking params " +
      "all normalize away") {
    assert(canon("HTTP://Example.COM:80/a/b/../c?utm_source=x&b=2&a=1#frag")
      === "http://example.com/a/c?a=1&b=2")
  }

  test("https default 443 drops, non-default port stays") {
    assert(canon("https://h.io:443/x") === "https://h.io/x")
    assert(canon("https://h.io:8443/x") === "https://h.io:8443/x")
  }

  test("path: slash runs collapse, '.' drops, '..' never climbs above " +
      "root, trailing slash is PRESERVED, empty path becomes /") {
    assert(canon("http://h//a///b/./c/../d") === "http://h/a/b/d")
    assert(canon("http://h/../../x") === "http://h/x")
    assert(canon("http://h/a/") === "http://h/a/")
    assert(canon("http://h") === "http://h/")
    assert(canon("http://h?a=1") === "http://h/?a=1")
  }

  test("escapes: unreserved octets decode, others uppercase, malformed " +
      "pass through verbatim") {
    assert(canon("http://h/%41%2d%7e") === "http://h/A-~")
    assert(canon("http://h/a%3ab") === "http://h/a%3Ab")
    assert(canon("http://h/a%G1b%a") === "http://h/a%G1b%a")
  }

  test("query: empties drop, tracker families drop, byte-wise stable " +
      "sort keeps duplicate arrival order, all-tracker query loses " +
      "the '?'") {
    assert(canon("http://h/p?&&z=1&&a=2&") === "http://h/p?a=2&z=1")
    assert(canon("http://h/p?gclid=g&utm_medium=m&FBCLID=f&keep=1")
      === "http://h/p?keep=1")
    assert(canon("http://h/p?a=2&a=1&a=3") === "http://h/p?a=2&a=1&a=3")
    assert(canon("http://h/p?utm_x=1") === "http://h/p")
  }

  test("host trailing dot drops; userinfo survives verbatim; scheme " +
      "lowercases; non-URL input passes through trimmed") {
    assert(canon("HtTpS://User:Pw@Host.Example.:443/")
      === "https://User:Pw@host.example/")
    assert(canon("  not a url  ") === "not a url")
    assert(canon("mailto:a@b") === "mailto:a@b")
  }

  test("fragment-only and query-only URLs keep a canonical root path") {
    assert(canon("http://h#frag") === "http://h/")
    assert(canon("ftp://H:21/f") === "ftp://h/f")
  }
}
