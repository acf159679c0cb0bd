package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

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
  */
object Subject {

  /** Pure-Scala matcher, usable from both driver code and UDFs. */
  def matches(subject: String, pattern: String): Boolean = {
    if (subject == null || pattern == null) return false
    val s = subject.split('.')
    val p = pattern.split('.')
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

  /** Column form: `subject_matches(subjectCol, lit(pattern))`. */
  val subjectMatchesUdf =
    udf((subject: String, pattern: String) => matches(subject, pattern))

  def subject_matches(subject: Column, pattern: Column): Column =
    subjectMatchesUdf(subject, pattern)
}
