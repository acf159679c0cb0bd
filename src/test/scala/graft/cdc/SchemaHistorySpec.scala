package graft.cdc

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SchemaHistorySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val v1 = Schemas.employees
  private val v2 = StructType(v1.fields :+ StructField("work_location", StringType))
  private val cutover = Fixtures.T0 + 100000L
  private val history = SchemaHistory.History("employees", Seq(
    SchemaHistory.Version(1, 0L, v1),
    SchemaHistory.Version(2, cutover, v2)))

  test("rows decode with the version active at their event time") {
    import spark.implicits._
    val v2emp = Fixtures.emp().stripSuffix("}") + ""","work_location":"berlin"}"""
    val wire = Seq(
      ("hrdb", "employees",
        Fixtures.env("employees", "c", "null", Fixtures.emp(), Fixtures.T0)),
      ("hrdb", "employees",
        Fixtures.env("employees", "c", "null", v2emp, cutover + 1000)))
      .toDF("db", "table", "value")
    val decoded = SchemaHistory.deserialize(wire, history)
      .select($"ts_ms", $"schema_version", $"after.work_location")
      .collect().map(r => r.getInt(1) -> Option(r.getString(2))).toSeq.sortBy(_._1)
    assert(decoded == Seq(1 -> None, 2 -> Some("berlin")))
  }

  test("unreplayable evolution is rejected at registration") {
    val changesType = StructType(v1.fields.map {
      case f if f.name == "salary" => f.copy(dataType = DoubleType)
      case f => f
    })
    intercept[IllegalArgumentException] {
      SchemaHistory.History("employees", Seq(
        SchemaHistory.Version(1, 0L, v1),
        SchemaHistory.Version(2, cutover, changesType)))
    }
    // two fields renamed onto one name is ambiguous
    intercept[IllegalArgumentException] {
      SchemaHistory.History("t", Seq(
        SchemaHistory.Version(1, 0L, StructType(Seq(
          StructField("x", IntegerType), StructField("y", IntegerType)))),
        SchemaHistory.Version(2, 1L, StructType(Seq(
          StructField("y", IntegerType))), renames = Map("x" -> "y"))))
    }
  }

  test("dropped column stays in the canonical view, null after the drop") {
    import spark.implicits._
    // v1 {id, note}; v2 DROPS note and adds score
    val s1 = StructType(Seq(
      StructField("id", IntegerType), StructField("note", StringType)))
    val s2 = StructType(Seq(
      StructField("id", IntegerType), StructField("score", IntegerType)))
    val h = SchemaHistory.History("t", Seq(
      SchemaHistory.Version(1, 0L, s1),
      SchemaHistory.Version(2, 100L, s2)))
    assert(h.canonical.fieldNames.toSeq == Seq("id", "score", "note"))
    val wire = Seq(
      Fixtures.env("t", "c", "null", """{"id":1,"note":"old"}""", 50L),
      Fixtures.env("t", "c", "null", """{"id":2,"score":9}""", 150L))
      .toDF("value")
    val got = SchemaHistory.deserializeEvolved(wire, h)
      .select($"schema_version", $"after.id".as("id"),
        $"after.note".as("note"),
        $"after.score".as("score"))
      .collect().map(r => (r.getInt(0), r.getInt(1), Option(r.getString(2)),
        if (r.isNullAt(3)) None else Some(r.getInt(3)))).toSeq.sortBy(_._2)
    assert(got == Seq(
      (1, 1, Some("old"), None), // pre-drop row: note decodes, score unborn
      (2, 2, None, Some(9))))    // post-drop row: note null, score live
  }

  test("same name dropped twice (drop, recycle, drop again) keeps all identities distinct") {
    import spark.implicits._
    // v1 {a int}; v2 drops a; v3 re-adds a (long); v4 drops it again
    val h = SchemaHistory.History("t", Seq(
      SchemaHistory.Version(1, 0L,
        StructType(Seq(StructField("a", IntegerType), StructField("k", IntegerType)))),
      SchemaHistory.Version(2, 100L,
        StructType(Seq(StructField("k", IntegerType)))),
      SchemaHistory.Version(3, 200L, StructType(Seq(
        StructField("k", IntegerType), StructField("a", LongType)))),
      SchemaHistory.Version(4, 300L,
        StructType(Seq(StructField("k", IntegerType))))))
    // both dead incarnations carry the bare name "a" — they must surface
    // under distinct drop-version suffixes, never as duplicate fields
    assert(h.canonical.fieldNames.toSeq == Seq("k", "a_dropped_v2", "a_dropped_v4"))
    val wire = Seq(
      Fixtures.env("t", "c", "null", """{"a":7,"k":0}""", 50L),
      Fixtures.env("t", "c", "null", """{"k":1,"a":8}""", 250L),
      Fixtures.env("t", "c", "null", """{"k":2}""", 350L)).toDF("value")
    val got = SchemaHistory.deserializeEvolved(wire, h)
      .select($"schema_version", $"after.a_dropped_v2".as("a1"),
        $"after.a_dropped_v4".as("a2"))
      .collect().map(r => (r.getInt(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq.sortBy(_._1)
    assert(got == Seq((1, Some(7), None), (3, None, Some(8L)), (4, None, None)),
      got.toString)
  }

  test("a dropped name recycled by a later field surfaces both identities") {
    import spark.implicits._
    // v1 {a int}; v2 drops a; v3 adds a NEW (long) field also called "a"
    val h = SchemaHistory.History("t", Seq(
      SchemaHistory.Version(1, 0L,
        StructType(Seq(StructField("a", IntegerType)))),
      SchemaHistory.Version(2, 100L,
        StructType(Seq(StructField("k", IntegerType)))),
      SchemaHistory.Version(3, 200L, StructType(Seq(
        StructField("k", IntegerType), StructField("a", LongType))))))
    assert(h.canonical.fieldNames.toSeq == Seq("k", "a", "a_dropped_v2"))
    val wire = Seq(
      Fixtures.env("t", "c", "null", """{"a":7}""", 50L),
      Fixtures.env("t", "c", "null", """{"k":1,"a":8}""", 250L)).toDF("value")
    val got = SchemaHistory.deserializeEvolved(wire, h)
      .select($"schema_version", $"after.a".as("a"),
        $"after.a_dropped_v2".as("a_old"))
      .collect().map(r => (r.getInt(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSeq.sortBy(_._1)
    // v1's 7 surfaces ONLY under the dropped identity; the new long "a"
    // holds only v3 values
    assert(got == Seq((1, None, Some(7)), (3, Some(8L), None)), got.toString)
  }

  test("evolved decode: rename + widening under the canonical latest view") {
    import spark.implicits._
    val mv1 = StructType(Seq(
      StructField("id", IntegerType), StructField("val", IntegerType)))
    val mv2 = StructType(Seq(
      StructField("id", LongType), StructField("amount", LongType),
      StructField("note", StringType)))
    val cut = 1000000L
    val h = SchemaHistory.History("metrics", Seq(
      SchemaHistory.Version(1, 0L, mv1),
      SchemaHistory.Version(2, cut, mv2, renames = Map("val" -> "amount"))))
    val wire = Seq(
      Fixtures.env("metrics", "c", "null", """{"id":1,"val":250}""", 10L),
      Fixtures.env("metrics", "u",
        """{"id":2,"val":7}""", """{"id":2,"val":8}""", cut - 1),
      // v2 row: id beyond Int range, amount beyond Int range, note present
      Fixtures.env("metrics", "c", "null",
        """{"id":2147483650,"amount":9000000001,"note":"big"}""", cut + 5))
      .toDF("value")
    val got = SchemaHistory.deserializeEvolved(wire, h)
      .select($"schema_version", $"after.id".as("id"),
        $"after.amount".as("amount"), $"after.note".as("note"),
        $"before.amount".as("b_amount"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        Option(r.getString(3)), if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .toSeq.sortBy(_._2)
    assert(got == Seq(
      (1, 1L, 250L, None, None),          // v1: val surfaces as amount (long)
      (1, 2L, 8L, None, Some(7L)),        // v1 before-image renamed too
      (2, 2147483650L, 9000000001L, Some("big"), None)))
  }

  test("evolved decode: rename chain across three versions resolves transitively") {
    import spark.implicits._
    val s1 = StructType(Seq(StructField("a", IntegerType)))
    val s2 = StructType(Seq(StructField("b", IntegerType)))
    val s3 = StructType(Seq(StructField("c", LongType)))
    val h = SchemaHistory.History("t", Seq(
      SchemaHistory.Version(1, 0L, s1),
      SchemaHistory.Version(2, 100L, s2, renames = Map("a" -> "b")),
      SchemaHistory.Version(3, 200L, s3, renames = Map("b" -> "c"))))
    val wire = Seq(
      Fixtures.env("t", "c", "null", """{"a":1}""", 50L),
      Fixtures.env("t", "c", "null", """{"b":2}""", 150L),
      Fixtures.env("t", "c", "null", """{"c":3}""", 250L)).toDF("value")
    val got = SchemaHistory.deserializeEvolved(wire, h)
      .select($"schema_version", $"after.c".as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toSeq.sorted
    assert(got == Seq(1 -> 1L, 2 -> 2L, 3 -> 3L))
  }

  test("narrowing and unrelated type changes still rejected") {
    val s1 = StructType(Seq(StructField("x", LongType)))
    val s2 = StructType(Seq(StructField("x", IntegerType)))
    intercept[IllegalArgumentException] {
      SchemaHistory.History("t", Seq(
        SchemaHistory.Version(1, 0L, s1), SchemaHistory.Version(2, 1L, s2)))
    }
    // rename to a target absent from the new schema
    intercept[IllegalArgumentException] {
      SchemaHistory.History("t", Seq(
        SchemaHistory.Version(1, 0L, s1),
        SchemaHistory.Version(2, 1L, StructType(Seq(StructField("y", LongType))),
          renames = Map("x" -> "z"))))
    }
  }

  test("mid-stream schema change replays through the real ledger source") {
    import spark.implicits._
    val mv1 = StructType(Seq(
      StructField("id", IntegerType), StructField("val", IntegerType)))
    val mv2 = StructType(Seq(
      StructField("id", LongType), StructField("amount", LongType),
      StructField("note", StringType)))
    val cut = 5000L
    val h = SchemaHistory.History("metrics", Seq(
      SchemaHistory.Version(1, 0L, mv1),
      SchemaHistory.Version(2, cut, mv2, renames = Map("val" -> "amount"))))
    val ledger = java.nio.file.Files.createTempDirectory("ledger").toString
    graft.sources.Ledger.writeSegment(ledger, "hrdb", "metrics", "000001.jsonl",
      (1 to 50).map(i => Fixtures.env("metrics", "c", "null",
        s"""{"id":$i,"val":${i * 10}}""", i.toLong)))
    graft.sources.Ledger.writeSegment(ledger, "hrdb", "metrics", "000002.jsonl",
      (51 to 100).map(i => Fixtures.env("metrics", "c", "null",
        s"""{"id":$i,"amount":${i * 10},"note":"n$i"}""", cut + i)))
    val wire = spark.read.format("graft-changelog").option("path", ledger).load()
    val got = SchemaHistory.deserializeEvolved(wire, h)
      .select($"after.id".as("id"), $"after.amount".as("amount"),
        $"after.note".as("note"), $"schema_version")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)),
        r.getInt(3))).sortBy(_._1)
    assert(got.length == 100)
    assert(got.take(50).forall { case (id, amt, note, v) =>
      amt == id * 10 && note.isEmpty && v == 1 })
    assert(got.drop(50).forall { case (id, amt, note, v) =>
      amt == id * 10 && note == Some(s"n$id") && v == 2 })
  }

  test("a name recycled after a rename does not steal the old field's values") {
    import spark.implicits._
    // v1 {a}, v2 renames a->b, v3 ADDS a new unrelated field also called "a"
    val s1 = StructType(Seq(StructField("a", IntegerType)))
    val s2 = StructType(Seq(StructField("b", IntegerType)))
    val s3 = StructType(Seq(StructField("b", IntegerType), StructField("a", IntegerType)))
    val h = SchemaHistory.History("t", Seq(
      SchemaHistory.Version(1, 0L, s1),
      SchemaHistory.Version(2, 100L, s2, renames = Map("a" -> "b")),
      SchemaHistory.Version(3, 200L, s3)))
    val wire = Seq(
      Fixtures.env("t", "c", "null", """{"a":7}""", 50L),
      Fixtures.env("t", "c", "null", """{"b":8,"a":9}""", 250L)).toDF("value")
    val got = SchemaHistory.deserializeEvolved(wire, h)
      .select($"schema_version", $"after.b".as("b"), $"after.a".as("a"))
      .collect().map(r => (r.getInt(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSeq.sortBy(_._1)
    // v1's 7 surfaces ONLY under b (its rename chain); the recycled "a"
    // must be null for v1 rows — it was born in v3
    assert(got == Seq((1, Some(7), None), (3, Some(8), Some(9))), got.toString)
  }
}
