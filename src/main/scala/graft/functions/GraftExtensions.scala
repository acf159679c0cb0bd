package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers graft's native functions into the
  * SQL function registry, so `spark.sql("… WHERE subject_matches(s, p)")`
  * works for SQL-surface users exactly like the Column API.
  *
  * Enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * (stackable with other extension classes, comma-separated).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("subject_matches"),
      new ExpressionInfo(classOf[SubjectMatchesExpr].getName, "subject_matches"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "subject_matches(subject, pattern) takes exactly 2 arguments")
        SubjectMatchesExpr(children.head, children(1))
      }))
  }
}
