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

  test("non-additive evolution is rejected at registration") {
    val dropsColumn = StructType(v1.fields.drop(1))
    intercept[IllegalArgumentException] {
      SchemaHistory.History("employees", Seq(
        SchemaHistory.Version(1, 0L, v1),
        SchemaHistory.Version(2, cutover, dropsColumn)))
    }
    val changesType = StructType(v1.fields.map {
      case f if f.name == "salary" => f.copy(dataType = DoubleType)
      case f => f
    })
    intercept[IllegalArgumentException] {
      SchemaHistory.History("employees", Seq(
        SchemaHistory.Version(1, 0L, v1),
        SchemaHistory.Version(2, cutover, changesType)))
    }
  }
}
