package graft

import org.apache.spark.sql.functions._

/** Round-12 ANN recall certification at sf1 (VERDICT r11 ask #6): the
  * IVF recall floors were spec'd at gate scale only; this measures the
  * nprobe trade-off at 10× against exact brute force.
  *
  * Build `ivfIndex` (k=32 centroids — ~sqrt-n territory for the 20k sf1
  * corpus) once; for a deterministic 50-query sample compute exact
  * brute-force cosine top-10 and `searchAgainstIndex` top-10 at
  * nprobe ∈ {1, 3, 8}; report mean recall@10 and the candidate-scan
  * fraction per nprobe. Writes `bench/ann_recall_r12.json`.
  *
  * Usage: Test/runMain graft.Round12AnnRecallProbe [sfDir]
  */
object Round12AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_scale/sf1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = Tables(spark, dir, "embeddings")
      .select($"vec_id", $"embedding").localCheckpoint(true)
    val n = emb.count()
    val queries = emb.filter(pmod($"vec_id", lit(n / 50)) === 7)
      .limit(50).localCheckpoint(true)
    val nQ = queries.count()

    // exact brute-force top-10 per query (the recall denominator)
    val bw = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy($"sim".desc, $"vec_id")
    val brute = queries.select($"vec_id".as("query_id"), $"embedding".as("qv"))
      .join(emb, $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        graft.operators.VectorMath.cosine($"embedding", $"qv").as("sim"))
      .withColumn("rank", row_number().over(bw))
      .filter($"rank" <= 10)
      .select($"query_id", $"vec_id")
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap

    val salt = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    val table = s"graft_ann_cert_$salt"
    val tmp = java.nio.file.Files.createTempDirectory(s"ann_cert_$salt")
      .toString
    try {
      val tBuild0 = System.nanoTime()
      graft.operators.AnnIndex.ivfIndex(emb, "vec_id", "embedding",
        k = 32, indexTable = table, indexPath = s"$tmp/idx", iters = 5)
      val buildWall = (System.nanoTime() - tBuild0) / 1e9
      println(f"ANN build: n=$n k=32 wall=$buildWall%.1fs")

      val results = Seq(1, 3, 8).map { nprobe =>
        val t0 = System.nanoTime()
        val got = graft.operators.AnnIndex.searchAgainstIndex(spark, table,
            queries, "vec_id", "embedding", k = 10, nprobe = nprobe)
          .select($"query_id", $"vec_id")
          .as[(Long, Long)].collect().groupBy(_._1).view
          .mapValues(_.map(_._2).toSet).toMap
        val wall = (System.nanoTime() - t0) / 1e9
        val recalls = brute.map { case (q, want) =>
          (got.getOrElse(q, Set.empty) & want).size.toDouble / want.size }
        val mean = recalls.sum / recalls.size
        val worst = recalls.min
        println(f"ANN nprobe=$nprobe recall@10 mean=$mean%.3f " +
          f"worst=$worst%.3f wall=$wall%.1fs scanFrac=${nprobe / 32.0}%.3f")
        (nprobe, mean, worst, wall)
      }
      // the sweep must be monotone and the full-ish probe high-recall
      require(results.map(_._2) == results.map(_._2).sorted,
        "recall must be monotone in nprobe")
      val json = s"""{"probe":"Round12AnnRecallProbe","sf_dir":"$dir",""" +
        s""""n_vectors":$n,"n_queries":$nQ,"k_centroids":32,""" +
        f""""build_wall_s":$buildWall%.1f,""" +
        results.map { case (p, m, w, wall) =>
          f""""nprobe_$p":{"recall10_mean":$m%.4f,"recall10_worst":$w%.4f,""" +
            f""""wall_s":$wall%.1f,"scan_frac":${p / 32.0}%.4f}"""
        }.mkString(",") + "}"
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench/ann_recall_r12.json"), json.getBytes)
      println("ANN artifact -> bench/ann_recall_r12.json")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}_centroids")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
    spark.stop()
  }
}
