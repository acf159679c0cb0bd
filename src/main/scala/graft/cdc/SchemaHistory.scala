package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-history tracking (O-5): the analog of Debezium's schema-history
  * topic (`application.properties:15-16`) — decode change events captured at
  * any ledger position with the schema that was active at that time.
  *
  * Model: per-table ordered versions, each effective from an event
  * timestamp, with ADDITIVE evolution enforced at registration (a later
  * version must contain every earlier field with the same type — the only
  * evolution JSON + parquet can replay safely without a rewrite). Decoding
  * parses once with the latest (superset) schema — earlier-version rows
  * yield nulls for later columns — and tags each row with the version
  * active at its event time, so consumers can tell "null because absent in
  * v1" from "null value in v3".
  */
object SchemaHistory {

  final case class Version(version: Int, fromTsMs: Long, schema: StructType)

  final case class History(table: String, versions: Seq[Version]) {
    require(versions.nonEmpty, s"$table: empty schema history")
    require(versions.sortBy(_.fromTsMs) == versions,
      s"$table: versions must be ordered by fromTsMs")
    versions.sliding(2).foreach {
      case Seq(a, b) =>
        val earlier = a.schema.fields.map(f => f.name -> f.dataType).toMap
        b.schema.fields.foreach { f =>
          earlier.get(f.name).foreach(t => require(t == f.dataType,
            s"$table v${b.version}: field ${f.name} changed type $t -> ${f.dataType}"))
        }
        require(a.schema.fieldNames.toSet.subsetOf(b.schema.fieldNames.toSet),
          s"$table v${b.version}: drops fields of v${a.version} (evolution must be additive)")
      case _ =>
    }

    def latest: StructType = versions.last.schema

    /** Version number active at an event-time column (ms). */
    def versionAt(tsMs: Column): Column =
      versions.tail.foldLeft(lit(versions.head.version)) { (acc, v) =>
        when(tsMs >= v.fromTsMs, v.version).otherwise(acc)
      }
  }

  /** Decode wire rows with the version-correct schema view: typed envelope
    * via the latest superset schema + `schema_version` tag per row.
    */
  def deserialize(wire: DataFrame, history: History): DataFrame =
    ChangeStream.deserialize(wire, history.latest)
      .withColumn("schema_version", history.versionAt(col("ts_ms")))
}
