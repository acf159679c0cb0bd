package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SimilarityJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"
  private lazy val emb = graft.Tables(spark, sf, "embeddings")

  /** Brute-force id_a < id_b pairs (the old declared plan) on the same
    * expressions — the tiled join must reproduce it bit-for-bit.
    */
  private def brute(threshold: Double) = {
    import spark.implicits._
    import graft.functions.VecDot.vec_dot
    val e = emb.select($"vec_id", $"embedding",
      sqrt(vec_dot($"embedding", $"embedding")).as("norm"))
    val a = e.select($"vec_id".as("id_a"), $"embedding".as("va"), $"norm".as("na"))
    val b = e.select($"vec_id".as("id_b"), $"embedding".as("vb"), $"norm".as("nb"))
    a.join(b, $"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        (vec_dot($"va", $"vb") / ($"na" * $"nb")).as("sim"))
      .filter($"sim" >= threshold)
      .select($"id_a", $"id_b", round($"sim", 6).as("sim"))
  }

  test("tiled all-pairs == brute-force nested loop, bit-identical sims") {
    import spark.implicits._
    val tiled = SimilarityJoin.allPairsCosine(emb, "vec_id", "embedding")
      .filter($"sim" >= 0.40)
      .select($"id_a", $"id_b", round($"sim", 6).as("sim"))
    val ref = brute(0.40)
    assert(tiled.exceptAll(ref).isEmpty && ref.exceptAll(tiled).isEmpty,
      "tiled join must emit exactly the brute-force pair set")
    // recall is structural (every unordered pair in exactly one tile):
    // check total pair count too, unfiltered
    val n = emb.count()
    assert(SimilarityJoin.allPairsCosine(emb, "vec_id", "embedding").count()
      == n * (n - 1) / 2)
  }

  test("each unordered pair occurs exactly once (no tile double-count)") {
    import spark.implicits._
    val dups = SimilarityJoin.allPairsCosine(emb, "vec_id", "embedding", blocks = 5)
      .groupBy($"id_a", $"id_b").count().filter($"count" > 1)
    assert(dups.isEmpty)
    // and ids come out ordered
    assert(SimilarityJoin.allPairsCosine(emb, "vec_id", "embedding", blocks = 3)
      .filter($"id_a" >= $"id_b").isEmpty)
  }

  test("degenerate block counts still cover every pair exactly once") {
    import spark.implicits._
    val n = emb.count()
    for (blocks <- Seq(1, 3, 97)) { // single tile; tiny; blocks >> sqrt(n)
      val pairs = SimilarityJoin.allPairsCosine(emb, "vec_id", "embedding", blocks)
      assert(pairs.count() == n * (n - 1) / 2, s"blocks=$blocks")
      assert(pairs.filter($"id_a" >= $"id_b").isEmpty, s"blocks=$blocks ordering")
    }
    intercept[IllegalArgumentException] {
      SimilarityJoin.allPairsCosine(emb, "vec_id", "embedding", 0)
    }
  }

  test("plan is an equality join: no BroadcastNestedLoopJoin, no CartesianProduct") {
    for (q <- Seq("emb_top_pairs", "emb_dedup_cos")) {
      val plan = graft.SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q plans a nested-loop join:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$q plans a cartesian product:\n$plan")
    }
  }
}
