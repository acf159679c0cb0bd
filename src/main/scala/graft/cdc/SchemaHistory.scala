package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-history tracking (O-5): the analog of Debezium's schema-history
  * topic (`application.properties:15-16`) — decode change events captured at
  * any ledger position with the schema that was active at that time.
  *
  * Model: per-table ordered versions, each effective from an event
  * timestamp. Evolution v2 (round 4) supports, per adjacent version pair:
  *  - ADDITIVE columns (new fields decode as null for older rows),
  *  - RENAME (declared as `renames: old -> new`; older rows' values surface
  *    under the canonical latest name),
  *  - TYPE WIDENING along the numeric lattice (byte < short < int < long,
  *    float < double, int < double — the casts JSON replay can always
  *    perform losslessly). Narrowing, drops, or unrelated type changes
  *    still fail registration: they cannot be replayed without a rewrite.
  *
  * Decoding (`deserializeEvolved`) stays ONE parse per row at any version
  * count: the version branch is selected by event time (a cheap `ts_ms`
  * probe of the raw JSON), and only the selected branch's `from_json` —
  * with that version's schema — evaluates (codegen CASE short-circuits).
  * Each branch then canonicalizes to the LATEST view: renamed fields are
  * read under their version-local name, widened fields cast up, absent
  * fields null. Consumers always see one schema plus a `schema_version`
  * tag telling "null because absent in v1" from "null value in v3".
  */
object SchemaHistory {

  final case class Version(version: Int, fromTsMs: Long, schema: StructType,
                           renames: Map[String, String] = Map.empty)

  /** May a replayed value of `from` surface as `to` without loss? */
  private[cdc] def widenable(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (a, b) if a == b => true
      case (ByteType, ShortType | IntegerType | LongType | DoubleType) => true
      case (ShortType, IntegerType | LongType | DoubleType) => true
      case (IntegerType, LongType | DoubleType) => true
      case (LongType, DoubleType) => true
      case (FloatType, DoubleType) => true
      case _ => false
    }

  final case class History(table: String, versions: Seq[Version]) {
    require(versions.nonEmpty, s"$table: empty schema history")
    require(versions.sortBy(_.fromTsMs) == versions,
      s"$table: versions must be ordered by fromTsMs")
    versions.sliding(2).foreach {
      case Seq(a, b) =>
        b.renames.foreach { case (from, to) =>
          require(a.schema.fieldNames.contains(from),
            s"$table v${b.version}: renames unknown field $from")
          require(b.schema.fieldNames.contains(to),
            s"$table v${b.version}: rename target $to missing from schema")
        }
        a.schema.fields.foreach { f =>
          val newName = b.renames.getOrElse(f.name, f.name)
          val kept = b.schema.fields.find(_.name == newName)
          require(kept.isDefined,
            s"$table v${b.version}: drops field ${f.name} of v${a.version} " +
              "(evolution must be additive/rename/widen)")
          require(widenable(f.dataType, kept.get.dataType),
            s"$table v${b.version}: field ${f.name} -> $newName changes type " +
              s"${f.dataType} -> ${kept.get.dataType} (not a widening)")
        }
      case _ =>
    }

    def latest: StructType = versions.last.schema

    /** Version number active at an event-time column (ms). */
    def versionAt(tsMs: Column): Column =
      versions.tail.foldLeft(lit(versions.head.version)) { (acc, v) =>
        when(tsMs >= v.fromTsMs, v.version).otherwise(acc)
      }

    /** For version index i: canonical (latest) field name -> the name it
      * carried in that version, absent if the field did not exist yet.
      * Walks the rename chains backward from the latest version.
      */
    private[cdc] def nameIn(i: Int): Map[String, Option[String]] =
      latest.fieldNames.toSeq.map { canon =>
        var name = canon
        var alive = true
        var k = versions.length - 1
        while (k > i && alive) { // versions(k).renames: name-in-(k-1) -> name-in-k
          val r = versions(k).renames
          r.collectFirst { case (from, to) if to == name => from } match {
            case Some(from) => name = from
            case None =>
              // no rename produced `name` at version k. If version k ALSO
              // consumed `name` via a rename (name -> other), then the
              // pre-k field called `name` is a DIFFERENT field — ours was
              // born at k (re-added under a recycled name) and must decode
              // as null below it, not steal the old field's values.
              if (r.contains(name)) alive = false
          }
          k -= 1
        }
        canon -> Some(name)
          .filter(_ => alive)
          .filter(versions(i).schema.fieldNames.contains)
      }.toMap
  }

  /** Decode wire rows whose history is additive-only (v1 path, kept): one
    * parse with the latest superset schema + `schema_version` tag.
    */
  def deserialize(wire: DataFrame, history: History): DataFrame =
    ChangeStream.deserialize(wire, history.latest)
      .withColumn("schema_version", history.versionAt(col("ts_ms")))

  /** Decode wire rows across renames and widenings: each row parses ONCE
    * with its own version's schema (branch chosen by event time), then maps
    * to the canonical latest view.
    *
    * Two projections on purpose: the first evaluates each version's
    * guarded `from_json` into its OWN column (null unless that version is
    * active for the row), the second builds the canonical view from those
    * materialized structs. Folding both into one expression re-evaluates
    * the parse per field reference — Spark's subexpression elimination
    * does not extract subtrees that sit inside conditional branches, so a
    * single-projection form paid ~9 full JSON parses per row (measured
    * 5.8 s → 1.5 s on the cdc_schema_evolution benchmark query). The two
    * projections cannot re-collapse: CollapseProject keeps aliases that
    * are referenced more than once and not cheap.
    */
  def deserializeEvolved(wire: DataFrame, history: History): DataFrame = {
    val vs = history.versions
    val tsProbe = get_json_object(col("value"), "$.ts_ms").cast("long")
    val guards = vs.zipWithIndex.map { case (v, i) =>
      val upper =
        if (i + 1 < vs.length) tsProbe < vs(i + 1).fromTsMs else lit(true)
      if (i == 0) upper else tsProbe >= v.fromTsMs && upper
    }
    val parsed = wire.select(
      guards.zip(vs).zipWithIndex.map { case ((g, v), i) =>
        when(g, from_json(col("value"), Schemas.envelope(v.schema))).as(s"_p$i")
      }: _*)
    val branches = vs.indices.map { i =>
      val p = col(s"_p$i")
      val names = history.nameIn(i)
      def canon(side: String): Column = {
        val fields = history.latest.fields.map { f =>
          names(f.name) match {
            case Some(local) =>
              p.getField(side).getField(local).cast(f.dataType).as(f.name)
            case None => lit(null).cast(f.dataType).as(f.name)
          }
        }
        when(p.getField(side).isNotNull, struct(fields.toIndexedSeq: _*))
          .as(side)
      }
      when(p.isNotNull, struct(canon("before"), canon("after"),
        p.getField("source").as("source"),
        p.getField("op").as("op"),
        p.getField("ts_ms").as("ts_ms")))
    }
    parsed.select(coalesce(branches: _*).as("e"))
      .select(col("e.*"))
      .withColumn("schema_version", history.versionAt(col("ts_ms")))
  }
}
