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

  private def plantedPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 8) << 16) | ((y * 8) << 8) | ((x + y) & 0xFF))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImage: a planted PNG decodes to real dimensions and pixels") {
    val png = plantedPng(32, 16)
    assert(Multimodal.sniffFormat(org.apache.spark.sql.functions.lit(png)) != null)
    val dec = Multimodal.decodeImage(png).get
    assert(dec.width == 32 && dec.height == 16 && dec.channels == 3)
    assert(dec.pixels.length == 32 * 16 * 3)
    // pixel (4, 2) = rgb(32, 16, 6) per the planted gradient
    val off = (2 * 32 + 4) * 3
    assert((dec.pixels(off) & 0xFF) == 32)
    assert((dec.pixels(off + 1) & 0xFF) == 16)
    assert((dec.pixels(off + 2) & 0xFF) == 6)
    // payloads with no JVM decoder refuse instead of guessing
    assert(Multimodal.decodeImage("RIFF1234".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("decodeAudio: synthetic WAV decodes to real PCM with real format") {
    val wav = Multimodal.encodeWavPcm16(nSamples = 2026, sampleRate = 16000,
      seed = 1L)
    assert(wav.length == 4096)
    val dec = Multimodal.decodeAudio(wav).get
    assert(dec.sampleRate == 16000 && dec.channels == 1
      && dec.bitsPerSample == 16)
    assert(dec.nFrames == 2026)
    assert(dec.pcm.length == 2026 * 2)
    // the payload really is the sine we wrote: sample 0 is silence, the
    // quarter-period sample of a 330 Hz tone (seed 1) is near half scale
    val s0 = ((dec.pcm(1) << 8) | (dec.pcm(0) & 0xFF)).toShort
    assert(s0 == 0)
    // non-audio payloads refuse instead of guessing
    assert(Multimodal.decodeAudio(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeAudio(
      Multimodal.encodeMinimalMp4(2000L, 1, 4096, 0L)).isEmpty)
  }

  test("audioFeatures: real RMS and peak of the planted sine") {
    val feats = Multimodal.audioFeatures(
      Multimodal.syntheticAssets(spark, 30)).collect()
    assert(feats.length == 10) // 30 assets, 1/3 audio
    feats.foreach { f =>
      assert(f.sample_rate == 16000 && f.channels == 1)
      assert(f.n_samples == 2026)
      // a 0.5-amplitude sine has RMS ~ 0.5/sqrt(2) ≈ 0.3536 and peak ≤ 0.5
      assert(math.abs(f.rms - 0.3536) < 0.01, s"rms ${f.rms}")
      assert(f.peak > 0.45 && f.peak <= 0.51, s"peak ${f.peak}")
    }
  }

  test("parseMp4: real box walk recovers brand, duration and track count") {
    val mp4 = Multimodal.encodeMinimalMp4(durationMs = 2000L, nTracks = 1,
      totalBytes = 4096, seed = 3L)
    assert(mp4.length == 4096)
    val meta = Multimodal.parseMp4(mp4).get
    assert(meta.major_brand == "isom")
    assert(meta.timescale == 1000L && meta.duration_ms == 2000L)
    assert(meta.n_tracks == 1)
    // garbage and truncation refuse instead of guessing
    assert(Multimodal.parseMp4(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.parseMp4(mp4.take(100)).isEmpty)
    assert(Multimodal.parseMp4(
      Multimodal.encodeWavPcm16(100, 16000, 0L)).isEmpty)
  }

  test("videoMeta: every synthetic video parses to the planted metadata") {
    val metas = Multimodal.videoMeta(
      Multimodal.syntheticAssets(spark, 30)).collect()
    assert(metas.length == 10)
    metas.foreach { m =>
      assert(m.major_brand == "isom" && m.duration_ms == 2000L
        && m.n_tracks == 1)
    }
  }

  test("resize really resamples decodable images and re-encodes to PNG") {
    import spark.implicits._
    val png = plantedPng(32, 32)
    val asset = Multimodal.Asset(99L, "image", png, 32, 32, 3, 0, 0)
    val out = Multimodal.resize(Seq(asset).toDS(), 8, 8).collect().head
    assert(out.width == 8 && out.height == 8)
    // the resized payload is itself a real PNG with the target raster
    val dec = Multimodal.decodeImage(out.content).get
    assert(dec.width == 8 && dec.height == 8)
    // bilinear mean of a gradient stays a gradient: corner pixel must match
    // the source region's tones, not stub noise - red channel grows with x
    def red(d: Multimodal.DecodedImage, x: Int, y: Int) =
      d.pixels((y * d.width + x) * 3) & 0xFF
    assert(red(dec, 7, 0) > red(dec, 0, 0))
  }

  test("encodeBmp24Gray round-trips bit-exactly through javax.imageio") {
    val gray = (p: Int) => (Multimodal.splitmix64(p + 1L) & 255L).toInt
    val bmp = Multimodal.encodeBmp24Gray(64, 64, gray)
    val img = Multimodal.decodeImage(bmp).get
    assert(img.width == 64 && img.height == 64 && img.channels == 3)
    var p = 0
    while (p < 64 * 64) {
      val o = p * 3
      val v = gray(p)
      assert((img.pixels(o) & 0xFF) == v && (img.pixels(o + 1) & 0xFF) == v &&
        (img.pixels(o + 2) & 0xFF) == v, s"pixel $p")
      p += 1
    }
    // non-multiple-of-4 row width exercises the padding path
    val bmp2 = Multimodal.encodeBmp24Gray(10, 9, gray)
    val img2 = Multimodal.decodeImage(bmp2).get
    assert(img2.width == 10 && img2.height == 9)
    assert((img2.pixels(0) & 0xFF) == gray(0) &&
      (img2.pixels((8 * 10 + 9) * 3) & 0xFF) == gray(89))
  }

  test("averageHash64: flat image hashes to 0, one bright cell sets exactly its bit") {
    val flat = Multimodal.decodeImage(
      Multimodal.encodeBmp24Gray(64, 64, _ => 100)).get
    assert(Multimodal.averageHash64(flat) == 0L) // strict >: no cell beats the mean
    // brighten cell 27 (cellY=3, cellX=3): only that bit can exceed the mean
    val oneBright = Multimodal.decodeImage(
      Multimodal.encodeBmp24Gray(64, 64, { p =>
        val cell = (p / 64 / 8) * 8 + (p % 64) / 8
        if (cell == 27) 200 else 100
      })).get
    assert(Multimodal.averageHash64(oneBright) == (1L << 27))
  }

  test("imageDedup finds the perturbed re-encode, not unrelated images") {
    import spark.implicits._
    def mk(id: Long, pert: Boolean): (Long, Array[Byte]) = {
      val srcId = if (pert) id - 1000L else id
      (id, Multimodal.encodeBmp24Gray(64, 64, { p =>
        val v = (Multimodal.splitmix64(srcId * 4096L + p + 1L) & 255L).toInt
        val cell = (p / 64 / 8) * 8 + (p % 64) / 8
        if (pert && (cell == 0 || cell == 9)) (v + 64) % 256 else v
      }))
    }
    val images = (Seq.tabulate(8)(i => mk(i.toLong, pert = false)) :+
      mk(1003L, pert = true)) // perturbed copy of image 3
      .toDF("asset_id", "content")
    val got = Multimodal.imageDedup(images, "asset_id", "content",
        maxDistance = 8, pieces = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toList
    assert(got.map(t => (t._1, t._2)) == List((3L, 1003L)))
    // the two perturbed cells' bits plus any borderline cell the global
    // mean shift tips over (measured 3 on this fixture) — far below the
    // ~32 of unrelated images
    assert(got.head._3 <= 4)
  }

  test("imageDedup drops undecodable payloads instead of failing") {
    import spark.implicits._
    val good = Multimodal.encodeBmp24Gray(64, 64, p => p % 251)
    val images = Seq(
      (1L, good), (2L, Array[Byte](1, 2, 3)), (3L, Array.empty[Byte]))
      .toDF("asset_id", "content")
    assert(Multimodal.imageHashes(images, "asset_id", "content").count() == 1L)
    assert(Multimodal.imageDedup(images, "asset_id", "content").count() == 0L)
  }

  test("imageHashes drops decodable-but-tiny rasters (tracking pixels) to dead-letter") {
    import spark.implicits._
    val good = Multimodal.encodeBmp24Gray(64, 64, p => p % 251)
    val tiny = Multimodal.encodeBmp24Gray(1, 1, _ => 255) // 1x1 tracking pixel
    val narrow = Multimodal.encodeBmp24Gray(4, 32, p => p % 7) // one dim < 8
    val images = Seq((1L, good), (2L, tiny), (3L, narrow))
      .toDF("asset_id", "content")
    // decodable (positive control for the filter, not the decoder)
    assert(Multimodal.decodeImage(tiny).isDefined)
    assert(Multimodal.decodeImage(narrow).isDefined)
    val hashed = Multimodal.imageHashes(images, "asset_id", "content")
      .collect().map(_.getLong(0)).toSet
    assert(hashed == Set(1L), "sub-8x8 images must drop, not throw")
  }

  test("encodeWavPcm16Samples round-trips PCM bit-exactly through javax.sound") {
    val samples = Array.tabulate(300)(i =>
      (Multimodal.splitmix64(i + 1L) & 0xFFFFL).toShort)
    val wav = Multimodal.encodeWavPcm16Samples(samples, 16000)
    val dec = Multimodal.decodeAudio(wav).get
    assert(dec.sampleRate == 16000 && dec.channels == 1 &&
      dec.bitsPerSample == 16)
    val got = Array.tabulate(300)(i =>
      (((dec.pcm(2 * i + 1) << 8) | (dec.pcm(2 * i) & 0xFF)).toShort))
    assert(got.sameElements(samples))
  }

  test("audioFingerprint64: flat energy hashes to 0, one loud frame sets its bit") {
    def wav(loudFrame: Int): Array[Byte] =
      Multimodal.encodeWavPcm16Samples(Array.tabulate(64 * 16) { i =>
        if (i / 16 == loudFrame) 2000.toShort else 100.toShort
      }, 16000)
    val flat = Multimodal.decodeAudio(wav(-1)).get
    assert(Multimodal.audioFingerprint64(flat.pcm) == 0L)
    val loud27 = Multimodal.decodeAudio(wav(27)).get
    assert(Multimodal.audioFingerprint64(loud27.pcm) == (1L << 27))
  }

  test("perceptual hashes persist to a bucketed segment index; delta joins exchange-free") {
    import spark.implicits._
    def img(id: Long, srcId: Long, pert: Boolean): (Long, Array[Byte]) =
      (id, Multimodal.encodeBmp24Gray(64, 64, { p =>
        val v = (Multimodal.splitmix64(srcId * 4096L + p + 1L) & 255L).toInt
        val cell = (p / 64 / 8) * 8 + (p % 64) / 8
        if (pert && cell == 0) (v + 64) % 256 else v
      }))
    val corpus = Seq.tabulate(10)(i => img(i.toLong, i.toLong, pert = false))
      .toDF("asset_id", "content")
    val delta = Seq(img(1005L, 5L, pert = true),
      img(2000L, 2000L, pert = false)).toDF("asset_id", "content")
    val tmp = java.nio.file.Files.createTempDirectory("graft_img_idx").toString
    spark.sql("DROP TABLE IF EXISTS graft_image_hash_index")
    val thresholdBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      val corpusHashes = Multimodal.imageHashes(corpus, "asset_id", "content")
      graft.operators.SimHash.segmentIndex(corpusHashes, "asset_id", "ahash", 9)
        .write.option("path", tmp)
        .bucketBy(4, "piece", "seg").sortBy("seg")
        .saveAsTable("graft_image_hash_index")
      // force the shuffle shape being asserted (a tiny test delta would
      // broadcast and make the exchange count vacuous)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val deltaHashes = Multimodal.imageHashes(delta, "asset_id", "content")
        .localCheckpoint(true)
      val got = graft.operators.SimHash.hammingAgainstIndex(
        spark.table("graft_image_hash_index"), deltaHashes,
        "asset_id", "ahash", maxDistance = 8, pieces = 9)
      assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).toList
        == List((1005L, 5L)))
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange hashpartitioning\\(piece".r
          .findAllIn(df.queryExecution.executedPlan.toString).size
      val rebuilt = graft.operators.SimHash.hammingAgainstIndex(
        graft.operators.SimHash.segmentIndex(corpusHashes, "asset_id", "ahash", 9),
        deltaHashes, "asset_id", "ahash", maxDistance = 8, pieces = 9)
      assert(exchanges(got) < exchanges(rebuilt),
        s"bucketed=${exchanges(got)} rebuilt=${exchanges(rebuilt)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresholdBefore)
      spark.sql("DROP TABLE IF EXISTS graft_image_hash_index")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("audioDedup pairs the half-volume re-encode, drops undecodables") {
    import spark.implicits._
    def clip(id: Long, srcId: Long, half: Boolean): (Long, Array[Byte]) =
      (id, Multimodal.encodeWavPcm16Samples(Array.tabulate(2048) { i =>
        val amp = (Multimodal.splitmix64(srcId * 64L + i / 32 + 911L)
          & 32767L).toInt
        val v = java.lang.Long.remainderUnsigned(
          Multimodal.splitmix64(srcId * 2048L + i + 1L), amp + 1L).toInt
        (if (half) v / 2 else v).toShort
      }, 16000))
    val clips = (Seq.tabulate(6)(i => clip(i.toLong, i.toLong, half = false)) ++
      Seq(clip(1004L, 4L, half = true),
        (7L, Array[Byte](9, 9, 9)))) // undecodable
      .toDF("asset_id", "content")
    val got = Multimodal.audioDedup(clips, "asset_id", "content",
        maxDistance = 8, pieces = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toList
    assert(got.map(t => (t._1, t._2)) == List((4L, 1004L)))
    // amplitude-scale robustness: only exact-boundary bits may move
    assert(got.head._3 <= 4)
  }

  test("autoHammingParams: gate scales keep (9,8), larger corpora tighten") {
    // every gate scale reproduces the historical pinned banding
    assert(Multimodal.autoHammingParams(9) == (9, 8))       // unit fixtures
    assert(Multimodal.autoHammingParams(6600) == (9, 8))    // sf0.01 corpus
    assert(Multimodal.autoHammingParams(33000) == (9, 8))
    // 10x the sf0.01 corpus crosses the first ladder step
    assert(Multimodal.autoHammingParams(66600) == (8, 7))
    // the sf1 corpus (660k assets) lands at (5,4) — the n'-shaped default
    // this schedule replaces ran (9,8) there
    assert(Multimodal.autoHammingParams(660000) == (5, 4))
    // the floor: tens of millions stay (4,3), never looser
    assert(Multimodal.autoHammingParams(50000000L) == (4, 3))
    // the schedule is monotone: pieces never widen as n grows
    val ns = Seq(1L, 1000L, 10000L, 50000L, 100000L, 500000L, 1000000L,
      5000000L, 20000000L, 100000000L)
    val ps = ns.map(Multimodal.autoHammingParams(_)._1)
    assert(ps == ps.sorted.reverse, s"non-monotone schedule: $ps")
    // half-pinning is a typed error, not a silent fill
    import spark.implicits._
    val one = Seq((1L, Array[Byte](1))).toDF("asset_id", "content")
    intercept[IllegalArgumentException] {
      Multimodal.imageDedup(one, "asset_id", "content", maxDistance = 8)
    }
  }

  test("auto-scaled banding keeps full recall on a 10x-gate-scale corpus") {
    import spark.implicits._
    // 66,600 fingerprints — 10x the sf0.01 gate corpus — with a planted
    // near-dup at Hamming distance EXACTLY equal to the auto maxDistance
    // for every 100th id (7 distinct bit flips: stride-9 positions are
    // distinct for j < 8). The pigeonhole join is exact for the hash, so
    // full recall at the auto banding is an equality, not a probability.
    val nBase = 66000L
    val n = nBase + nBase / 100
    val (p, d) = Multimodal.autoHammingParams(n)
    assert((p, d) == (8, 7), "10x corpus must tighten to (8,7)")
    val base = spark.range(nBase).as[Long]
      .map(id => (id, Multimodal.splitmix64(id + 1L))).toDF("doc_id", "fp")
    val copies = spark.range(0, nBase, 100).as[Long].map { id =>
      var h = Multimodal.splitmix64(id + 1L)
      val off = (id / 100 % 64).toInt
      (0 until d).foreach(j => h ^= 1L << ((off + j * 9) % 64))
      (id + 10000000L, h)
    }.toDF("doc_id", "fp")
    val planted = graft.operators.SimHash
      .hammingPairs(base.union(copies), "doc_id", "fp", d, p)
      .filter($"id_b" >= 10000000L && $"id_a" === $"id_b" - 10000000L)
    assert(planted.count() == nBase / 100,
      "every planted pair at distance == auto maxDistance must be found")
  }

  test("default (auto) imageDedup equals the pinned path at gate scale") {
    import spark.implicits._
    def mk(id: Long, pert: Boolean): (Long, Array[Byte]) = {
      val srcId = if (pert) id - 1000L else id
      (id, Multimodal.encodeBmp24Gray(64, 64, { p =>
        val v = (Multimodal.splitmix64(srcId * 4096L + p + 1L) & 255L).toInt
        val cell = (p / 64 / 8) * 8 + (p % 64) / 8
        if (pert && (cell == 0 || cell == 9)) (v + 64) % 256 else v
      }))
    }
    val images = (Seq.tabulate(8)(i => mk(i.toLong, pert = false)) :+
      mk(1003L, pert = true)).toDF("asset_id", "content")
    // n=9 -> auto (9,8): the default invocation reproduces the pinned gate
    val auto = Multimodal.imageDedup(images, "asset_id", "content")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(auto == List((3L, 1003L)))
  }
}
