package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII masking (O-17; reference `docs/design.md:884`,
  * `docs/system-design.md:423-425`): column-level policy applied as a
  * projection — codegen'd, no UDF.
  */
object Mask {

  sealed trait Policy
  case object Redact extends Policy            // constant '***'
  case object Hash extends Policy              // sha2-256
  case object PartialEmail extends Policy      // keep first char + domain

  def maskCol(c: Column, p: Policy): Column = p match {
    case Redact => lit("***")
    case Hash => sha2(c.cast("string"), 256)
    case PartialEmail =>
      concat(substring(c, 1, 1), lit("***"),
        regexp_extract(c, "(@.*)$", 1))
  }

  /** Default policy for the HR schema: salary restricted, email partially
    * masked, bank/ssn-like fields redacted if present.
    */
  val defaultPolicy: Map[String, Policy] = Map(
    "salary" -> Hash,
    "email" -> PartialEmail,
    "ssn" -> Redact,
    "bank_account" -> Redact)

  def apply(df: DataFrame, policy: Map[String, Policy] = defaultPolicy): DataFrame =
    policy.foldLeft(df) { case (acc, (name, p)) =>
      if (acc.columns.contains(name))
        acc.withColumn(name, maskCol(col(name), p).cast("string"))
      else acc
    }
}
