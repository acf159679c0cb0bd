package graft.cdc

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** SURVEY §5 property: replaying a change stream through unwrap
  * reconstructs EXACTLY the state a row-by-row model interpreter reaches —
  * for random CRUD sequences, including re-insert after delete and
  * interleaved keys. Fixed seeds → deterministic regression test.
  *
  * The reconstruction operator is itself the scale-sound form: one window
  * over (key ORDER BY ts_ms, event rank) taking the last image per key —
  * no driver-side loop over collected envelopes.
  */
class ReplayPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Scale path: last envelope per key by ts_ms (unique per event here),
    * kept unless it is a delete — one window, no driver-side replay loop.
    */
  private def replayToState(envJson: Seq[String]) = {
    import spark.implicits._
    val wire = envJson.toDF("value").withColumn("table", lit("employees"))
    ChangeStream.deserialize(wire, Schemas.employees)
      .withColumn("_rn", row_number().over(
        Window.partitionBy(coalesce($"after.id", $"before.id"))
          .orderBy($"ts_ms".desc)))
      .filter($"_rn" === 1 && $"op" =!= "d")
      .select($"after.id", $"after.salary".cast("string").as("salary"),
        $"after.status")
  }

  private case class ModelRow(salary: String, status: String)

  test("random CRUD sequences: stream replay == model interpreter (5 seeds)") {
    val ids = 1 to 8
    // per step: (id, op-kind, salary-variant, status-variant)
    val stepGen = for {
      id <- Gen.oneOf(ids)
      kind <- Gen.frequency((4, "c"), (4, "u"), (2, "d"))
      sal <- Gen.oneOf("90000.00", "95000.00", "99000.00")
      st <- Gen.oneOf("active", "terminated")
    } yield (id, kind, sal, st)

    (1 to 5).foreach { round =>
      val steps = Gen.listOfN(60, stepGen)
        .pureApply(Gen.Parameters.default, Seed(round * 7919L))
      // model interpreter: apply ops in order against a mutable map.
      // c on existing key and u/d on absent key are normalized the way the
      // binlog would: an insert of an existing key becomes an update; an
      // update/delete of an absent key is dropped (no binlog event exists).
      val model = scala.collection.mutable.Map[Int, ModelRow]()
      val envs = scala.collection.mutable.ArrayBuffer[String]()
      var ts = Fixtures.T0
      steps.foreach { case (id, kind, sal, st) =>
        ts += 1000
        val prev = model.get(id)
        kind match {
          case "c" | "u" if prev.isEmpty =>
            model(id) = ModelRow(sal, st)
            envs += Fixtures.env("employees", "c", "null",
              Fixtures.emp(id = id, num = s"EMP$id", salary = sal, status = st), ts)
          case "c" | "u" =>
            model(id) = ModelRow(sal, st)
            envs += Fixtures.env("employees", "u",
              Fixtures.emp(id = id, num = s"EMP$id", salary = prev.get.salary,
                status = prev.get.status),
              Fixtures.emp(id = id, num = s"EMP$id", salary = sal, status = st), ts)
          case "d" if prev.nonEmpty =>
            model.remove(id)
            envs += Fixtures.env("employees", "d",
              Fixtures.emp(id = id, num = s"EMP$id", salary = prev.get.salary,
                status = prev.get.status), "null", ts)
          case _ => // delete of absent key: no binlog event
        }
      }
      val got = replayToState(envs.toSeq).collect()
        .map(r => r.getInt(0) -> ModelRow(r.getString(1), r.getString(2))).toMap
      val want = model.toMap
      assert(got == want,
        s"round=$round missing=${want.keySet -- got.keySet} " +
          s"spurious=${got.keySet -- want.keySet} " +
          s"diff=${want.keySet.intersect(got.keySet).filter(k => want(k) != got(k))}")
    }
  }
}
