package graft.functions

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.Subject.{matches, subject_matches}

class SubjectCompiledSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val subjects = Seq(
    "HCM.CDC.HR.hrdb.employees", "HCM.CDC.HR.hrdb.positions",
    "HCM.CDC.HR.hrdb", "HCM.CDC.HR.hrdb.employees.extra",
    "HCM", "HCM.x", "OTHER.CDC", "events.hr.employee.hired",
    "events.hr.employee.promoted", "events.hr.org.department.created")

  private val patterns = Seq(
    "HCM.CDC.HR.hrdb.employees", "HCM.CDC.HR.*.*", "HCM.>", "HCM.*.>",
    "*.CDC.HR.hrdb.*", ">", "events.hr.employee.*", "events.>",
    "HCM.>.CDC", "nomatch.*")

  test("compiled literal patterns agree with the scalar matcher") {
    import spark.implicits._
    val df = subjects.toDF("subject")
    patterns.foreach { p =>
      val got = df.filter(subject_matches($"subject", lit(p)))
        .as[String].collect().toSet
      val want = subjects.filter(matches(_, p)).toSet
      assert(got == want, s"pattern $p")
    }
  }

  test("dynamic pattern column (codegen Expression path) agrees too") {
    import spark.implicits._
    val df = (for (s <- subjects; p <- patterns) yield (s, p)).toDF("subject", "pattern")
    val got = df.filter(subject_matches($"subject", $"pattern"))
      .as[(String, String)].collect().toSet
    val want = (for (s <- subjects; p <- patterns if matches(s, p)) yield (s, p)).toSet
    assert(got == want)
  }

  test("no Scala UDF in the plan; prefix pattern compiles to StartsWith") {
    import spark.implicits._
    val df = subjects.toDF("subject")
    // analyzed plan: ConvertToLocalRelation folds the native predicate away
    // in the executed plan (itself proof there is no UDF fence)
    val plan = df.filter(subject_matches($"subject", lit("HCM.>")))
      .queryExecution.analyzed.toString
    assert(!plan.contains("UDF"), plan)
    assert(plan.contains("StartsWith"), plan)
  }

  test("wildcard consumer prunes partitions of the subject-routed store") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("subjstore").toString
    subjects.toDF("subject").withColumn("v", lit(1))
      .write.mode("overwrite").partitionBy("subject").parquet(out)
    val store = spark.read.parquet(out)
    val pruned = store.filter(subject_matches($"subject", lit("events.>")))
    val scans = pruned.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    // partition pruning: only the 3 events.* partition directories are listed
    val filesRead = scans.map(s => s.relation.location
      .listFiles(s.partitionFilters, s.dataFilters).map(_.files.size).sum).sum
    assert(pruned.count() == 3)
    assert(filesRead < store.inputFiles.length,
      s"expected partition pruning: $filesRead vs ${store.inputFiles.length}")
  }
}
