package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt fetch-permission decision (RFC 9309, the Google REP
  * subset every crawler implements) — the politeness gate at the head of
  * the crawl stack this engine already covers tail-first (HtmlText
  * extraction → UrlCanon dedup). One static decision function, no state:
  * `robots_allowed(robots_txt, path, agent)`.
  *
  * Semantics (each rule spec-pinned):
  *  - lines split on \n; a `#` starts a comment; field names are
  *    case-insensitive, values are case-sensitive paths;
  *  - consecutive `User-agent:` lines open ONE group; a group's rules
  *    are the `Allow:`/`Disallow:` lines until the next group; unknown
  *    fields (Crawl-delay, Sitemap, …) are ignored but do NOT close the
  *    group;
  *  - group selection: the group whose user-agent token (lowercased) is
  *    the LONGEST substring of the caller's agent (lowercased) wins;
  *    `*` matches any agent but only when no named group matched;
  *  - rule matching: patterns support `*` (any run) and a trailing `$`
  *    (end anchor); the longest-pattern match wins, an Allow/Disallow
  *    tie at equal length resolves to ALLOW (the REP rule); an empty
  *    `Disallow:` value matches nothing; no matching rule → allowed;
  *  - no matching group, or empty/NULL robots → allowed (REP default).
  */
object Robots {

  /** '*'/'$' pattern match against a path — iterative greedy with
    * backtracking on the last star (the classic two-pointer wildcard
    * walk; patterns are short, paths bounded).
    */
  private def patMatch(pat0: String, path: String): Boolean = {
    var pat = pat0
    var anchored = false
    if (pat.endsWith("$")) { anchored = true; pat = pat.dropRight(1) }
    var pi = 0
    var si = 0
    var starPi = -1
    var starSi = -1
    while (si < path.length) {
      // prefix semantics: a fully-consumed unanchored pattern matches
      // any suffix — succeed BEFORE considering a star backtrack
      if (pi == pat.length && !anchored) return true
      // '*' opens a star match even when the path char is a literal '*'
      // (the wildcard branch must win the tie, else `/p*q` misses `/p*xq`)
      if (pi < pat.length && pat.charAt(pi) == '*') {
        starPi = pi; pi += 1; starSi = si
      } else if (pi < pat.length &&
        (pat.charAt(pi) == path.charAt(si))) { pi += 1; si += 1 }
      else if (starPi >= 0) {
        starSi += 1; si = starSi; pi = starPi + 1
      } else return false
    }
    while (pi < pat.length && pat.charAt(pi) == '*') pi += 1
    pi == pat.length
  }

  /** Effective match length for precedence — literal chars count, the
    * REP's "longest path" read on the raw pattern length.
    */
  private def patLen(p: String): Int = p.length

  /** Static entry point shared by interpreted eval and generated code. */
  def allowed(robots: UTF8String, path: UTF8String,
              agent: UTF8String): Boolean = {
    if (robots == null) return true
    val txt = robots.toString
    if (txt.trim.isEmpty) return true
    val want = String.valueOf(path).toString
    val ag = String.valueOf(agent).toLowerCase(java.util.Locale.ROOT)

    // parse into groups: (agent tokens, rules (isAllow, pattern))
    val groups = new java.util.ArrayList[
      (java.util.ArrayList[String], java.util.ArrayList[(Boolean, String)])]()
    var curAgents: java.util.ArrayList[String] = null
    var curRules: java.util.ArrayList[(Boolean, String)] = null
    var lastWasUa = false
    for (raw <- txt.split("\n", -1)) {
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!lastWasUa || curAgents == null) {
              curAgents = new java.util.ArrayList[String]()
              curRules = new java.util.ArrayList[(Boolean, String)]()
              groups.add((curAgents, curRules))
            }
            curAgents.add(value.toLowerCase(java.util.Locale.ROOT))
            lastWasUa = true
          case "allow" | "disallow" =>
            if (curRules != null)
              curRules.add((field == "allow", value))
            lastWasUa = false
          case _ => lastWasUa = false // Sitemap/Crawl-delay etc: ignored
        }
      }
    }

    // group selection: longest named token contained in the agent;
    // '*' only when nothing named matched
    var best: java.util.ArrayList[(Boolean, String)] = null
    var bestLen = -1
    var star: java.util.ArrayList[(Boolean, String)] = null
    var g = 0
    while (g < groups.size()) {
      val (agents, rules) = groups.get(g)
      var a = 0
      while (a < agents.size()) {
        val tok = agents.get(a)
        if (tok == "*") { if (star == null) star = rules }
        else if (tok.nonEmpty && ag.contains(tok) && tok.length > bestLen) {
          bestLen = tok.length; best = rules
        }
        a += 1
      }
      g += 1
    }
    val rules = if (best != null) best else star
    if (rules == null) return true

    // longest-match precedence; Allow wins ties; empty Disallow inert
    var verdict = true
    var vLen = -1
    var r = 0
    while (r < rules.size()) {
      val (isAllow, pat) = rules.get(r)
      if (pat.nonEmpty && patMatch(pat, want)) {
        val l = patLen(pat)
        if (l > vLen || (l == vLen && isAllow)) { vLen = l; verdict = isAllow }
      }
      r += 1
    }
    verdict
  }

  def robots_allowed(robots: Column, path: Column, agent: Column): Column =
    ColumnBridge.column(RobotsAllowedExpr(ColumnBridge.expression(robots),
      ColumnBridge.expression(path), ColumnBridge.expression(agent)))
}

case class RobotsAllowedExpr(first: Expression, second: Expression,
                             third: Expression) extends TernaryExpression {

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(r: Any, p: Any, a: Any): Any =
    Robots.allowed(r.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String],
      a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, p, a) =>
      s"graft.functions.Robots.allowed($r, $p, $a)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): RobotsAllowedExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}
