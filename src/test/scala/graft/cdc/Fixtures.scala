package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic change-log fixtures (FIXTURES.md): the reference's seed
  * data (`sql/init-db.sql:96-113`), the test-cdc.sh CRUD scenario (F-2), and
  * per-rule trigger/counterexample envelopes (F-3). All timestamps are
  * pre-stamped literals — never wall-clock.
  */
object Fixtures {

  val T0 = 1718000000000L // 2024-06-10T06:13:20Z, scenario base time

  /** Envelope JSON for one change event. */
  def env(table: String, op: String, before: String, after: String,
          tsMs: Long): String =
    s"""{"before":$before,"after":$after,
       |"source":{"version":"1.0","connector":"graft","name":"HCM.CDC.HR",
       |"ts_ms":$tsMs,"db":"hrdb","table":"$table"},
       |"op":"$op","ts_ms":$tsMs}""".stripMargin.replaceAll("\n", "")

  def parse(spark: SparkSession, table: String, rows: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.schema(Schemas.envelope(Schemas.tables(table)))
      .json(spark.createDataset(rows))
  }

  /** Employee row JSON with scenario defaults (EMP999 of test-cdc.sh). */
  def emp(id: Int = 999, num: String = "EMP999", first: String = "Test",
          last: String = "User", email: String = "test.user@company.com",
          posId: String = "IC2", deptId: Int = 1, managerId: String = "null",
          salary: String = "90000.00", hireDate: String = "2024-06-10",
          status: String = "active"): String =
    s"""{"id":$id,"employee_number":"$num","first_name":"$first",
       |"last_name":"$last","email":"$email","position_id":"$posId",
       |"department_id":$deptId,"manager_id":$managerId,"salary":$salary,
       |"hire_date":"$hireDate","status":"$status",
       |"created_at":"2024-06-10T05:33:20Z","updated_at":"2024-06-10T05:33:20Z"}"""
      .stripMargin.replaceAll("\n", "")

  def dept(id: Int, name: String, parent: String = "null",
           managerId: String = "null"): String =
    s"""{"id":$id,"name":"$name","parent_department_id":$parent,
       |"manager_id":$managerId,"created_at":"2024-06-10T05:33:20Z",
       |"updated_at":"2024-06-10T05:33:20Z"}""".stripMargin.replaceAll("\n", "")

  def pos(id: String, title: String, min: String, max: String): String =
    s"""{"id":"$id","title":"$title","level":"IC","salary_min":$min,
       |"salary_max":$max,"created_at":"2024-06-10T05:33:20Z",
       |"updated_at":"2024-06-10T05:33:20Z"}""".stripMargin.replaceAll("\n", "")

  /** The reference's seed dimensions as state DataFrames (init-db.sql). */
  def seedPositions(spark: SparkSession): DataFrame =
    parse(spark, "positions", Seq(
      pos("IC1", "Junior Engineer", "60000", "80000"),
      pos("IC2", "Engineer", "80000", "110000"),
      pos("IC3", "Senior Engineer", "110000", "150000"),
      pos("IC4", "Staff Engineer", "150000", "200000"),
      pos("IC5", "Principal Engineer", "200000", "280000"))
      .map(p => env("positions", "r", "null", p, T0)))
      .selectExpr("after.*")

  def seedDepartments(spark: SparkSession): DataFrame =
    parse(spark, "departments", Seq(
      dept(1, "Engineering"), dept(2, "Human Resources"), dept(3, "Sales"))
      .map(d => env("departments", "r", "null", d, T0)))
      .selectExpr("after.*")

  def seedEmployees(spark: SparkSession): DataFrame =
    parse(spark, "employees", Seq(
      emp(1, "EMP001", "John", "Doe", "john.doe@company.com", "IC3", 1, "null", "120000.00", "2023-01-15"),
      emp(2, "EMP002", "Jane", "Smith", "jane.smith@company.com", "IC2", 1, "null", "95000.00", "2023-03-20"),
      emp(3, "EMP003", "Bob", "Johnson", "bob.johnson@company.com", "IC4", 1, "null", "165000.00", "2022-06-01"))
      .map(e => env("employees", "r", "null", e, T0)))
      .selectExpr("after.*")

  /** F-2: the exact test-cdc.sh event sequence (scripts/test-cdc.sh:43-114),
    * grouped per table. Ledger: employees 1c/1u/1d; salary_changes 1c/1d;
    * leave_requests 1c/1d.
    */
  def crudScenario(spark: SparkSession): Map[String, DataFrame] = {
    val sc =
      s"""{"id":1,"employee_id":999,"old_salary":90000.00,"new_salary":95000.00,
         |"reason":"Performance review","effective_date":"2024-06-10",
         |"approved_by":null,"created_at":"2024-06-10T05:35:20Z"}"""
        .stripMargin.replaceAll("\n", "")
    val lr =
      s"""{"id":1,"employee_id":999,"leave_type":"vacation",
         |"start_date":"2024-06-17","end_date":"2024-06-24","status":"pending",
         |"approved_by":null,"reason":"Summer vacation",
         |"created_at":"2024-06-10T05:36:20Z","updated_at":"2024-06-10T05:36:20Z"}"""
        .stripMargin.replaceAll("\n", "")
    Map(
      "employees" -> parse(spark, "employees", Seq(
        env("employees", "c", "null", emp(), T0 + 60000),
        env("employees", "u", emp(), emp(salary = "95000.00"), T0 + 120000),
        env("employees", "d", emp(salary = "95000.00"), "null", T0 + 420000))),
      "salary_changes" -> parse(spark, "salary_changes", Seq(
        env("salary_changes", "c", "null", sc, T0 + 180000),
        env("salary_changes", "d", sc, "null", T0 + 360000))),
      "leave_requests" -> parse(spark, "leave_requests", Seq(
        env("leave_requests", "c", "null", lr, T0 + 240000),
        env("leave_requests", "d", lr, "null", T0 + 300000))))
  }

  /** F-3: firing + non-firing envelope per employees-update rule. */
  def promotionFiring: String = env("employees", "u",
    emp(id = 1, num = "EMP001", posId = "IC3", salary = "120000.00"),
    emp(id = 1, num = "EMP001", posId = "IC4", salary = "180000.00"), T0 + 1000)
  def promotionNotFiring: String = env("employees", "u", // salary decreased
    emp(id = 1, num = "EMP001", posId = "IC3", salary = "120000.00"),
    emp(id = 1, num = "EMP001", posId = "IC4", salary = "110000.00"), T0 + 2000)
  def terminationFiring: String = env("employees", "u",
    emp(id = 2, num = "EMP002", status = "active"),
    emp(id = 2, num = "EMP002", status = "terminated"), T0 + 3000)
  def terminationNotFiring: String = env("employees", "u",
    emp(id = 2, num = "EMP002", status = "active"),
    emp(id = 2, num = "EMP002", status = "on_leave"), T0 + 4000)
  def transferFiring: String = env("employees", "u",
    emp(id = 3, num = "EMP003", deptId = 1),
    emp(id = 3, num = "EMP003", deptId = 3), T0 + 5000)
  def transferNotFiring: String = env("employees", "u", // dept AND position
    emp(id = 3, num = "EMP003", deptId = 1, posId = "IC2", salary = "100.00"),
    emp(id = 3, num = "EMP003", deptId = 3, posId = "IC3", salary = "90.00"), T0 + 6000)
}
