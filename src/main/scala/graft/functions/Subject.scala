package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** NATS-style subject matching (reference: `config/nats/stream.json:4`,
  * `config/debezium/application.properties:23`, `docs/design.md:497-510`).
  *
  * Subjects are dot-separated token lists. Patterns:
  *   - `*` matches exactly one token
  *   - `>` matches one or more trailing tokens (only valid as the last token)
  *   - anything else matches its token literally
  *
  * e.g. `HCM.>` matches `HCM.CDC.HR.hrdb.employees`;
  *      `HCM.CDC.HR.*.*` matches subjects with exactly five tokens.
  *
  * Physical strategy (this is the hot consumer-side filter, so it must stay
  * inside whole-stage codegen AND prune the subject-partitioned store):
  *   - literal pattern, no wildcards      → `=== pattern` (partition pruning)
  *   - literal `prefix.>`                 → `startsWith("prefix.")` — pushes
  *     down as `StringStartsWith`, so a wildcard consumer reads only its
  *     subject partitions instead of scanning every directory
  *   - literal pattern with `*`           → anchored `rlike` (codegen'd)
  *   - non-literal pattern column         → native codegen `Expression`
  *     calling the scalar matcher (never a Scala UDF — no boxing, no
  *     codegen fence)
  */
object Subject {

  /** Pure-Scala matcher, usable from driver code and generated code.
    * Tokenization keeps empty tokens (`split(_, -1)`) so `"A."` is the
    * two-token list `["A",""]`, never silently collapsed to `["A"]` — this
    * makes token-joined forms round-trip exactly, which is what keeps the
    * compiled-predicate path (string equality / startsWith / rlike) in
    * lock-step with this matcher on degenerate trailing-dot inputs.
    */
  def matches(subject: String, pattern: String): Boolean = {
    if (subject == null || pattern == null) return false
    val s = subject.split("\\.", -1)
    val p = pattern.split("\\.", -1)
    var i = 0
    while (i < p.length) {
      p(i) match {
        case ">" =>
          // '>' must be last and requires at least one remaining subject token.
          return i == p.length - 1 && s.length > i
        case "*" =>
          if (i >= s.length) return false
        case tok =>
          if (i >= s.length || s(i) != tok) return false
      }
      i += 1
    }
    s.length == p.length
  }

  /** Entry point for generated code (UTF8String-native, no row boxing). */
  def matchesUtf8(subject: UTF8String, pattern: UTF8String): Boolean =
    matches(subject.toString, pattern.toString)

  /** Compile a literal pattern to the cheapest native predicate. NULL
    * subjects yield NULL (dropped by filters), where the scalar matcher
    * returns false — identical under filter semantics.
    */
  def compilePattern(subject: Column, pattern: String): Column = {
    val toks = pattern.split("\\.", -1) // keep empty tokens — must mirror `matches`
    val gtIdx = toks.indexOf(">")
    if (gtIdx >= 0 && gtIdx != toks.length - 1) lit(false) // '>' mid-pattern never matches
    else if (!toks.exists(t => t == "*" || t == ">")) subject === lit(pattern)
    else if (toks.length == 1 && toks.head == ">") subject.isNotNull // ">" matches any subject
    else if (toks.last == ">" && !toks.init.contains("*"))
      subject.startsWith(toks.init.mkString("", ".", "."))
    else {
      // `[^.]*`, not `[^.]+`: with split(_, -1) tokenization an empty token
      // is a token, and `*` consumes it — same for the `>` tail below.
      val body = toks.map {
        case "*" => "[^.]*"
        case ">" => ">" // placeholder; handled below (always last here)
        case t   => java.util.regex.Pattern.quote(t)
      }
      val re =
        if (toks.last == ">") body.init.mkString("\\.") + "\\..*"
        else body.mkString("\\.")
      subject.rlike("^" + re + "$")
    }
  }

  /** Column form: `subject_matches(subjectCol, patternCol)`. */
  def subject_matches(subject: Column, pattern: Column): Column =
    ColumnBridge.literalString(pattern) match {
      case Some(p)                                 => compilePattern(subject, p)
      case None if ColumnBridge.isNullLiteral(pattern) => lit(false)
      case None =>
        ColumnBridge.column(
          SubjectMatchesExpr(
            ColumnBridge.expression(subject), ColumnBridge.expression(pattern)))
    }
}

/** Codegen-native fallback for non-literal patterns: stays inside
  * whole-stage codegen via a static call, unlike a Scala UDF which forces
  * row materialization and blocks every downstream optimization.
  */
case class SubjectMatchesExpr(left: Expression, right: Expression)
    extends BinaryExpression with Predicate {

  override protected def nullSafeEval(s: Any, p: Any): Any =
    Subject.matchesUtf8(s.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, p) => s"graft.functions.Subject.matchesUtf8($s, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubjectMatchesExpr =
    copy(left = newLeft, right = newRight)
}
