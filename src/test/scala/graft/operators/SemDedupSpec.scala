package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** SemDeDup is exact WITHIN its declared contract (cluster-restricted
  * pairs), so these are equality tests against a brute-force model, not
  * statistical ones: the k-means is deterministic (strided init, label
  * tiebreaks) and the verification cosine is the same expression the exact
  * operators use.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"
  private lazy val emb = graft.Tables(spark, sf, "embeddings")

  private lazy val pairs =
    SemDedup.clusterPairs(emb, "vec_id", "embedding", k = 8, iters = 1,
      threshold = 0.45).collect()

  private lazy val bruteSet =
    SimilarityJoin.allPairsCosine(emb, "vec_id", "embedding")
      .filter(col("sim") >= 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("every reported pair is a true above-threshold pair (precision 1)") {
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val key = (r.getLong(1), r.getLong(2))
      val sim = r.getDouble(3)
      assert(bruteSet.contains(key), s"$key not in the exact answer")
      assert(math.abs(bruteSet(key) - sim) < 1e-12)
    }
  }

  test("result equals the exact answer restricted to co-clustered pairs") {
    // recompute the final assignment exactly as the operator does, then
    // check the operator found EVERY exact pair whose ends share a label
    val cents = AnnIndex.kmeansCentroids(emb, "vec_id", "embedding", 8, 1)
    val label = AnnIndex.kmeansAssign(emb, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val expected = bruteSet.keySet.filter { case (a, b) => label(a) == label(b) }
    val got = pairs.map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    // and the attached label is the shared cluster label
    pairs.foreach(r => assert(r.getInt(0) == label(r.getLong(1))))
  }

  test("the pair search is a label-equality join, never a product") {
    val plan = SemDedup.clusterPairs(emb, "vec_id", "embedding", 8, 1, 0.45)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("discards = rows with a lower-id in-cluster neighbor at threshold") {
    val d = SemDedup.discards(emb, "vec_id", "embedding", 8, 1, 0.45)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val byB = pairs.groupBy(_.getLong(2))
    assert(d.keySet == byB.keySet)
    byB.foreach { case (b, rows) =>
      assert(math.abs(d(b) - rows.map(_.getDouble(3)).max) < 1e-12)
    }
  }

  test("diversitySample: every cluster covered, quotas honored, near-budget total") {
    val budget = 50
    val sel = SemDedup.diversitySample(emb, "vec_id", "embedding",
      k = 8, iters = 1, budget = budget, salt = "t1:").collect()
    // coverage: the sample's label set == the full set of non-empty clusters
    val allLabels = graft.operators.AnnIndex.kmeansAssign(emb, "vec_id",
        "embedding", graft.operators.AnnIndex.kmeansCentroids(emb, "vec_id",
          "embedding", 8, 1))
      .select(col("label")).distinct().collect().map(_.getInt(0)).toSet
    assert(sel.map(_.getAs[Int]("label")).toSet == allLabels)
    // per-cluster: rnk <= quota, quota = max(1, floor(budget*n_c/n)), and
    // exactly min(quota, cluster_n) rows come back
    val n = sel.map(r => r.getAs[Int]("label") -> r.getAs[Long]("cluster_n")).toMap.values.sum
    sel.groupBy(_.getAs[Int]("label")).foreach { case (_, rows) =>
      val q = rows.head.getAs[Long]("quota")
      val cn = rows.head.getAs[Long]("cluster_n")
      assert(q == math.max(1L, budget.toLong * cn / n))
      assert(rows.length == math.min(q, cn))
      assert(rows.map(_.getAs[Long]("rnk")).toSet == (1L to rows.length).toSet)
    }
    // near-budget: within k of the target from the max(1,·) floor and
    // floor rounding
    assert(sel.length >= budget - 8 && sel.length <= budget + 8)
  }

  test("diversitySample is layout-invariant and salt-sensitive") {
    val a = SemDedup.diversitySample(emb.repartition(3), "vec_id",
      "embedding", k = 8, iters = 1, budget = 30, salt = "s1:")
      .collect().map(r => (r.getAs[Int]("label"), r.getAs[Long]("id"),
        r.getAs[Long]("rnk"))).sortBy(identity).toSeq
    val b = SemDedup.diversitySample(emb.repartition(17,
        col("vec_id")), "vec_id", "embedding", k = 8, iters = 1,
      budget = 30, salt = "s1:")
      .collect().map(r => (r.getAs[Int]("label"), r.getAs[Long]("id"),
        r.getAs[Long]("rnk"))).sortBy(identity).toSeq
    assert(a == b)
    val c = SemDedup.diversitySample(emb, "vec_id", "embedding",
      k = 8, iters = 1, budget = 30, salt = "s2:")
      .collect().map(r => (r.getAs[Int]("label"), r.getAs[Long]("id"),
        r.getAs[Long]("rnk"))).sortBy(identity).toSeq
    assert(a != c, "different salts must draw different exemplars")
  }
}
