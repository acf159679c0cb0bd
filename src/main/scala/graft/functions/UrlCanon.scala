package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization — the crawl-pipeline step between [[HtmlText]]'s
  * href extraction and URL-level dedup/frontier bookkeeping: two URLs
  * that differ only in case, default port, dot-segments, escape case,
  * tracking parameters, parameter order or fragment are the SAME page,
  * and a 100 TB crawl that misses that re-fetches and re-stores
  * everything twice. One deterministic pass, no library parser (the
  * LangIdExpr static-entry codegen pattern).
  *
  * Rules (each spec-pinned):
  *  - no "://" → the input, whitespace-trimmed, unchanged (not a URL the
  *    canonicalizer understands — never guess);
  *  - scheme and host lowercase; a trailing dot on the host drops;
  *    userinfo is preserved verbatim;
  *  - default ports drop (http:80, https:443, ftp:21); others stay;
  *  - path: "." segments drop, ".." pops (never above root), runs of
  *    "/" collapse, empty path → "/", trailing slash PRESERVED (it can
  *    be a different resource);
  *  - percent-escapes: decode when the octet is unreserved
  *    (ALPHA / DIGIT / - . _ ~), uppercase the hex otherwise; a
  *    malformed escape ("%G1", truncated "%a") passes through verbatim;
  *  - query: params split on '&', empties drop, tracking params drop
  *    (utm_* prefix + fbclid/gclid/msclkid/mc_eid/igshid), the rest
  *    sort byte-wise STABLY (duplicates keep arrival order); no
  *    surviving params → no '?';
  *  - fragment drops.
  */
object UrlCanon {

  private val trackers = java.util.Set.of(
    "fbclid", "gclid", "msclkid", "mc_eid", "igshid")

  private def unreserved(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Percent-escape normalization over one component: decode unreserved
    * octets, uppercase the hex of everything else, pass malformed
    * escapes through verbatim.
    */
  private def normEscapes(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        val h1 = if (i + 1 < s.length) hexVal(s.charAt(i + 1)) else -1
        val h2 = if (i + 2 < s.length) hexVal(s.charAt(i + 2)) else -1
        if (h1 >= 0 && h2 >= 0) {
          val v = (h1 << 4) | h2
          val ch = v.toChar
          if (unreserved(ch)) out.append(ch)
          else out.append('%')
            .append(Character.toUpperCase(s.charAt(i + 1)))
            .append(Character.toUpperCase(s.charAt(i + 2)))
          i += 3
        } else { out.append(c); i += 1 } // malformed: verbatim
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def canonPath(p: String): String = {
    if (p.isEmpty) return "/"
    val trailingSlash = p.endsWith("/")
    val segs = new java.util.ArrayList[String]()
    for (seg <- p.split("/", -1)) seg match {
      case "" | "." => () // run-of-slash collapse + same-dir drop
      case ".." => if (!segs.isEmpty) segs.remove(segs.size() - 1)
      case s => segs.add(normEscapes(s))
    }
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < segs.size()) { sb.append('/').append(segs.get(i)); i += 1 }
    if (sb.length() == 0) "/"
    else if (trailingSlash) sb.append('/').toString
    else sb.toString
  }

  private def canonQuery(q: String): String = {
    if (q.isEmpty) return ""
    val keep = new java.util.ArrayList[String]()
    for (param <- q.split("&", -1)) {
      if (param.nonEmpty) {
        val eq = param.indexOf('=')
        val key = (if (eq < 0) param else param.substring(0, eq))
          .toLowerCase(java.util.Locale.ROOT)
        if (!key.startsWith("utm_") && !trackers.contains(key))
          keep.add(normEscapes(param))
      }
    }
    if (keep.isEmpty) return ""
    // byte-wise STABLE sort ON THE KEY: a repeated key keeps its
    // arrival order (value order can be load-bearing server-side)
    val arr = new Array[String](keep.size())
    keep.toArray(arr)
    java.util.Arrays.sort(arr, (a: String, b: String) => {
      val ka = { val e = a.indexOf('='); if (e < 0) a else a.substring(0, e) }
      val kb = { val e = b.indexOf('='); if (e < 0) b else b.substring(0, e) }
      ka.compareTo(kb)
    })
    "?" + String.join("&", arr: _*)
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def canonicalize(url: UTF8String): UTF8String = {
    val raw = url.toString.trim
    val sep = raw.indexOf("://")
    if (sep <= 0) return UTF8String.fromString(raw)
    val scheme = raw.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    var rest = raw.substring(sep + 3)
    // strip fragment first — it never survives
    val hash = rest.indexOf('#')
    if (hash >= 0) rest = rest.substring(0, hash)
    val slash = rest.indexOf('/')
    val qmark = rest.indexOf('?')
    val authEnd =
      if (slash < 0 && qmark < 0) rest.length
      else if (slash < 0) qmark
      else if (qmark < 0) slash
      else math.min(slash, qmark)
    var auth = rest.substring(0, authEnd)
    val tail = rest.substring(authEnd)
    val (path, query) = {
      val tq = tail.indexOf('?')
      if (tq < 0) (tail, "")
      else (tail.substring(0, tq), tail.substring(tq + 1))
    }
    // authority: [userinfo@]host[:port]
    val at = auth.lastIndexOf('@')
    val userinfo = if (at >= 0) auth.substring(0, at + 1) else ""
    var hostPort = if (at >= 0) auth.substring(at + 1) else auth
    val colon = hostPort.lastIndexOf(':')
    var port = ""
    if (colon >= 0 && hostPort.substring(colon + 1).forall(_.isDigit)) {
      port = hostPort.substring(colon + 1)
      hostPort = hostPort.substring(0, colon)
    }
    var host = hostPort.toLowerCase(java.util.Locale.ROOT)
    if (host.endsWith(".")) host = host.substring(0, host.length - 1)
    val defaultPort = scheme match {
      case "http" => "80"
      case "https" => "443"
      case "ftp" => "21"
      case _ => ""
    }
    val portOut =
      if (port.isEmpty || port == defaultPort) "" else ":" + port
    UTF8String.fromString(
      scheme + "://" + userinfo + host + portOut + canonPath(path) +
        canonQuery(query))
  }

  def url_canon(url: Column): Column =
    ColumnBridge.column(UrlCanonExpr(ColumnBridge.expression(url)))
}

case class UrlCanonExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UrlCanon.canonicalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlCanon.canonicalize($c)")

  override protected def withNewChildInternal(newChild: Expression): UrlCanonExpr =
    copy(child = newChild)
}
