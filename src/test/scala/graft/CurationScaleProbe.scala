package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-8 curation operators (lineDedup,
  * decontaminateBloom, containmentPairs): times each on an arbitrary
  * documents dir (driver sf dirs or ScaleDataGen output) using the same
  * fixture shapes as the declared queries, printing seconds + result
  * cardinalities — the evidence that the claimed ~linear shapes hold at
  * 10×/100×, mirroring DfCapProbe/SimHashProbe for the round-7 knobs.
  *
  * Usage: CurationScaleProbe <docsDir> [op ...]   (ops default to all)
  */
object CurationScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val ops: Set[String] =
      if (args.length > 1) args.drop(1).toSet
      else Set("line", "bloom", "containment", "sketch", "image")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Tables(spark, dir, "documents")
    val n = docs.count()
    println(s"[probe] corpus $dir: $n docs")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    if (ops("line")) {
      val d = docs.select($"doc_id", $"source", split($"text", " ", -1).as("w"))
      val paras = transform(
        sequence(lit(0), ((size($"w") + lit(11)) / lit(12)).cast("int") - 1),
        i => array_join(slice($"w", i * 12 + 1, lit(12)), " "))
      val hdr = array(concat(lit("== "), $"source", lit(" ==")))
      val lined = d.select($"doc_id",
        array_join(flatten(array(hdr, paras, hdr)), "\n").as("txt"))
      val res = timed("lineDedup (minDf=3)") {
        graft.operators.Curation.lineDedup(lined, "doc_id", "txt", minDf = 3)
          .agg(count(lit(1)), sum($"n_removed")).head()
      }
      println(s"[probe]   docs=${res.getLong(0)} lines_removed=${res.getLong(1)}")
    }

    if (ops("bloom")) {
      val bench = docs.filter($"doc_id" % 50 === 1)
      val train = docs.filter($"doc_id" % 50 =!= 1)
      val pairs = timed("decontaminateBloom (n=8, fpp=0.01)") {
        graft.operators.Curation
          .decontaminateBloom(train, bench, "doc_id", "text", n = 8)
          .count()
      }
      println(s"[probe]   contaminated_pairs=$pairs")
      val exact = timed("decontaminate broadcast form (reference)") {
        graft.operators.Curation
          .decontaminate(train, bench, "doc_id", "text", n = 8)
          .count()
      }
      println(s"[probe]   broadcast_pairs=$exact match=${pairs == exact}")
    }

    if (ops("containment")) {
      val base = docs.select($"doc_id", $"text")
      val snip = docs.filter($"doc_id" % 10 === 0)
        .select(($"doc_id" + lit(1000000000L)).as("doc_id"),
          array_join(slice(split($"text", " ", -1), 1, 30), " ").as("text"))
      val res = timed("containmentPairs (t=0.8, n=4)") {
        graft.operators.TextDedup
          .containmentPairs(base.unionByName(snip), "doc_id", "text",
            threshold = 0.8, n = 4)
          .agg(count(lit(1)),
            sum(when($"id_sub" >= 1000000000L, 1).otherwise(0))).head()
      }
      println(s"[probe]   pairs=${res.getLong(0)} excerpt_pairs=${res.getLong(1)}")
    }

    if (ops("sketch")) {
      val ev = Tables(spark, dir, "events")
      val hll = timed("Hll.estimate by event_type (p=12)") {
        graft.operators.Hll.estimate(ev, Seq("event_type"), "user_id")
          .agg(sum($"estimate")).head.getDouble(0)
      }
      println(f"[probe]   hll_sum=$hll%.1f")
      val cms = timed("CountMin sketch+top20 estimates (d=4,w=1024)") {
        val exact = ev.groupBy($"user_id").agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"user_id").limit(20)
        graft.operators.CountMin.pointEstimates(
          graft.operators.CountMin.sketch(ev, "user_id"), exact, "user_id")
          .agg(sum($"cms_est")).head.getLong(0)
      }
      println(s"[probe]   cms_top20_sum=$cms")
      val qtl = timed("Quantiles p50/p95/p99 by event_type (m=5)") {
        val v = ev.filter($"value".isNotNull)
          .withColumn("v", floor($"value" * 100).cast("long"))
          .filter($"v" >= 1)
        graft.operators.Quantiles.quantiles(v, Seq("event_type"), "v",
          Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99))
          .agg(sum($"p99")).head.getLong(0)
      }
      println(s"[probe]   qtl_p99_sum=$qtl")
      val docsC = Tables(spark, dir, "documents")
      val cj = timed("CorpusSketch pairwise Jaccard by source (256 slots)") {
        graft.operators.CorpusSketch.estimateJaccard(docsC, "source", "text")
          .agg(sum($"slots_equal"), count(lit(1))).head
      }
      println(s"[probe]   corpus_pairs=${cj.getLong(1)} slots_equal_sum=${cj.getLong(0)}")
    }

    if (ops("topk")) {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables(spark, dir, "events")
      val agg = timed("topk_doubles aggregate (k=5 per event_type)") {
        ev.groupBy($"event_type")
          .agg(graft.functions.TopK.topk_doubles($"value", 5).as("top"))
          .agg(sum(size($"top"))).head.getLong(0)
      }
      val win = timed("window row_number form (reference)") {
        ev.filter($"value".isNotNull)
          .withColumn("rk", row_number().over(
            Window.partitionBy($"event_type").orderBy($"value".desc)))
          .filter($"rk" <= 5).count()
      }
      println(s"[probe]   agg_rows=$agg window_rows=$win")
    }

    if (ops("image")) {
      import graft.operators.Multimodal
      val ids = docs.select($"doc_id").as[Long]
      val base = ids.map { id =>
        (id, Multimodal.encodeBmp24Gray(64, 64, p =>
          (Multimodal.splitmix64(id * 4096L + p + 1L) & 255L).toInt))
      }
      val copies = ids.filter(_ % 10 == 0).map { id =>
        (id + 1000000000L, Multimodal.encodeBmp24Gray(64, 64, { p =>
          val v = (Multimodal.splitmix64(id * 4096L + p + 1L) & 255L).toInt
          val cell = (p / 64 / 8) * 8 + (p % 64) / 8
          if (cell == 0 || cell == 9 || cell == 18) (v + 64) % 256 else v
        }))
      }
      val pairs = timed("imageDedup (encode+decode+hash+join, d<=8)") {
        Multimodal.imageDedup(base.union(copies).toDF("asset_id", "content"),
          "asset_id", "content", maxDistance = 8, pieces = 9).count()
      }
      println(s"[probe]   image_pairs=$pairs")
    }

    spark.stop()
  }
}
