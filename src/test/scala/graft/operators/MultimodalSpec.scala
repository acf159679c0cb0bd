package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("format sniffing from magic bytes is native and correct") {
    import spark.implicits._
    val assets = Multimodal.syntheticAssets(spark, 30)
    val byKind = assets
      .select($"kind", Multimodal.sniffFormat($"content").as("format"))
      .distinct().collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byKind == Map("image" -> "jpeg", "audio" -> "wav", "video" -> "mp4"))
    val plan = assets.select(Multimodal.sniffFormat($"content"))
      .queryExecution.analyzed.toString
    assert(!plan.contains("UDF"))
  }

  test("feature extraction: histogram normalizes to 1 over full payload") {
    val feats = Multimodal.extractFeatures(
      Multimodal.syntheticAssets(spark, 30), batchSize = 7).collect()
    assert(feats.length == 30)
    feats.foreach { f =>
      assert(f.n_bytes == 4096)
      assert(math.abs(f.histogram.sum - 1.0) < 1e-9)
      assert(f.histogram.length == 16)
    }
    // deterministic across runs
    val again = Multimodal.extractFeatures(
      Multimodal.syntheticAssets(spark, 30)).collect()
    assert(feats.sortBy(_.asset_id).map(_.histogram.toSeq).toSeq
      == again.sortBy(_.asset_id).map(_.histogram.toSeq).toSeq)
  }

  test("frame sampling: evenly spaced slices of video payloads only") {
    import spark.implicits._
    val frames = Multimodal.sampleFrames(
      Multimodal.syntheticAssets(spark, 30), nFrames = 4, frameBytes = 256)
    val perAsset = frames.groupBy($"asset_id").count().collect()
    assert(perAsset.length == 10) // 30 assets, 1/3 video
    assert(perAsset.forall(_.getLong(1) == 4))
    val one = frames.filter($"asset_id" === 2 && $"frame_idx" === 3).collect().head
    assert(one.offset == 4096 - 256)
    assert(one.frame_bytes.length == 256)
  }

  test("metadata catalog prunes the payload column at the parquet scan") {
    val out = java.nio.file.Files.createTempDirectory("assets").toString
    Multimodal.syntheticAssets(spark, 30).write.mode("overwrite").parquet(out)
    import spark.implicits._
    val stored = spark.read.parquet(out).as[Multimodal.Asset]
    val scan = Multimodal.catalog(stored).queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    val readCols = scan.requiredSchema.fieldNames.toSet
    assert(!readCols.contains("content"),
      s"payload must be pruned from the scan, read: $readCols")
  }

  test("resize: images get target dims and pixel budget, other kinds untouched") {
    import spark.implicits._
    val resized = Multimodal.resize(Multimodal.syntheticAssets(spark, 9), 8, 8)
    val byKind = resized.collect().groupBy(_.kind)
    byKind("image").foreach { a =>
      assert(a.width == 8 && a.height == 8)
      assert(a.content.length == 8 * 8 * a.channels)
    }
    byKind("audio").foreach(a => assert(a.content.length == 4096))
    // deterministic
    val again = Multimodal.resize(Multimodal.syntheticAssets(spark, 9), 8, 8)
      .collect().sortBy(_.asset_id)
    assert(resized.collect().sortBy(_.asset_id).map(_.content.toSeq).toSeq
      == again.map(_.content.toSeq).toSeq)
  }

  test("decode stub is deterministic and clearly a stand-in") {
    val a = Multimodal.decodeStub(Array[Byte](1, 2, 3))
    val b = Multimodal.decodeStub(Array[Byte](1, 2, 3))
    assert(a.toSeq == b.toSeq)
    assert(a.length == 16)
  }
}
