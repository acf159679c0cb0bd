package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dim = 16

  /** Deterministic synthetic corpus: two tight clusters + noise, so ADC
    * recall has signal to find.
    */
  private def corpus(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { id =>
      var x = id.toLong * 0x9e3779b97f4a7c15L + 0x243f6a8885a308d3L
      def next(): Double = {
        x += 0x9e3779b97f4a7c15L
        var z = x
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53).toDouble - 0.5
      }
      val base = Array.fill(dim)(next() * 0.2f)
      // ids ≡ 0 mod 7 drift toward the query's corner
      val v =
        if (id % 7 == 0) base.map(d => (d + 0.9).toFloat)
        else base.map(_.toFloat)
      (id.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("codes stay within [0, k) and cover every (vector, subspace)") {
    val emb = corpus(64)
    val sub = Pq.subvectors(emb, "vec_id", "embedding", m = 4, dim = dim)
    val books = Pq.trainCodebooks(sub, k = 4, iters = 2)
    val codes = Pq.encode(sub, books)
    assert(codes.count() == 64 * 4)
    val bad = codes.filter(col("code") < 0 || col("code") >= 4).count()
    assert(bad == 0)
  }

  test("ADC score equals dot(query, reconstruction-from-codebook)") {
    val emb = corpus(48)
    val m = 4
    val sub = Pq.subvectors(emb, "vec_id", "embedding", m, dim)
    val books = Pq.trainCodebooks(sub, k = 4, iters = 1)
    val got = Pq.adcTopK(emb, "vec_id", "embedding", queryId = 0L,
      k = 47, m = m, kCent = 4, iters = 1, dim = dim)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // test-side replay from collected codebooks + codes
    val book = books.collect().map { r =>
      (r.getAs[Int]("m"), r.getAs[Int]("label")) -> r.getSeq[Double](2).toArray
    }.toMap
    val codes = Pq.encode(sub.filter(col("vec_id") =!= 0L), books)
      .select("vec_id", "m", "code").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    val qsub = sub.filter(col("vec_id") === 0L).collect()
      .map(r => r.getAs[Int]("m") -> r.getSeq[Double](2).toArray).toMap
    got.foreach { case (id, adc) =>
      val expect = (0 until m).map { mm =>
        val c = book((mm, codes((id, mm))))
        qsub(mm).zip(c).map { case (a, b) => a * b }.sum
      }.sum
      assert(math.abs(adc - expect) < 1e-6, s"vec $id: $adc vs $expect")
    }
  }

  test("degenerate PQ (m=1, k=n, iters=0) reproduces exact dot-product ranking") {
    import graft.functions.VecDot.vec_dot
    val n = 32
    val emb = corpus(n)
    val got = Pq.adcTopK(emb, "vec_id", "embedding", queryId = 0L,
      k = 10, m = 1, kCent = n, iters = 0, dim = dim)
      .collect().map(_.getLong(0)).toSeq
    val exact = emb.filter(col("vec_id") =!= 0L)
      .join(broadcast(emb.filter(col("vec_id") === 0L)
        .select(col("embedding").as("qv"))))
      .select(col("vec_id"),
        round(vec_dot(col("embedding").cast("array<double>"),
          col("qv").cast("array<double>")), 6).as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSeq
    assert(got == exact)
  }

  test("ADC candidate recall against exact search clears the floor") {
    import graft.functions.VecDot.vec_dot
    // PQ is a CANDIDATE generator: production search takes the ADC top-C
    // shortlist (C >> k) and reranks exactly. Gate the shortlist: the ADC
    // top-50 of 511 must contain nearly all of the exact top-10.
    val emb = corpus(512)
    val got = Pq.adcTopK(emb, "vec_id", "embedding", queryId = 0L,
      k = 50, m = 4, kCent = 8, iters = 2, dim = dim)
      .collect().map(_.getLong(0)).toSet
    val exact = emb.filter(col("vec_id") =!= 0L)
      .join(broadcast(emb.filter(col("vec_id") === 0L)
        .select(col("embedding").as("qv"))))
      .select(col("vec_id"),
        vec_dot(col("embedding").cast("array<double>"),
          col("qv").cast("array<double>")).as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val recall = (got intersect exact).size
    assert(recall >= 8,
      s"ADC top-50 candidate recall $recall/10 below floor; got=$got exact=$exact")
  }

  test("IVF-PQ with every partition probed equals plain ADC exactly") {
    import spark.implicits._
    val emb = corpus(96)
      .withColumn("label", (col("vec_id") % 4).cast("int"))
    val full = Pq.ivfPqTopK(emb, "vec_id", "embedding", "label",
      queryId = 0L, k = 10, nprobe = 4, m = 4, kCent = 4, iters = 1, dim = dim)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val adc = Pq.adcTopK(emb.drop("label"), "vec_id", "embedding",
      queryId = 0L, k = 10, m = 4, kCent = 4, iters = 1, dim = dim)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == adc)
  }

  test("IVF-PQ results come only from probed partitions") {
    import spark.implicits._
    val emb = corpus(96)
      .withColumn("label", (col("vec_id") % 4).cast("int"))
    val got = Pq.ivfPqTopK(emb, "vec_id", "embedding", "label",
      queryId = 0L, k = 50, nprobe = 1, m = 4, kCent = 4, iters = 1, dim = dim)
    val labels = got.join(emb.select(col("vec_id"), col("label")), "vec_id")
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    assert(labels.size == 1, s"nprobe=1 must search one partition, got $labels")
  }

  test("codebook training is deterministic across runs") {
    val emb = corpus(64)
    def fingerprint(): Seq[(Int, Int, Seq[Double])] = {
      val sub = Pq.subvectors(emb, "vec_id", "embedding", m = 4, dim = dim)
      Pq.trainCodebooks(sub, k = 4, iters = 2).collect()
        .map(r => (r.getAs[Int]("m"), r.getAs[Int]("label"), r.getSeq[Double](2)))
        .sortBy(t => (t._1, t._2)).toSeq
    }
    assert(fingerprint() == fingerprint())
  }
}
