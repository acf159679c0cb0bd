package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for training-data pipelines
  * (builder brief): media travels as opaque `binary` columns next to typed
  * metadata; per-item decode/feature work runs as imperative per-partition
  * logic over the binary payloads — the Scala analog of `mapInPandas`
  * batches.
  *
  * FORMAT-SUPPORT MATRIX (the codec boundary, stated once):
  *
  * | format | decode | via |
  * |---|---|---|
  * | PNG / JPEG / GIF / BMP | REAL pixels, dims, bilinear resize | `javax.imageio` |
  * | WAV (PCM) | REAL samples, RMS/peak | `javax.sound.sampled` |
  * | MP4 container | REAL box parse: brand, timescale, duration, tracks | `parseMp4` (byte-level ISO-BMFF) |
  * | MP4 frame pixels | OUT OF SCOPE — permanent boundary | deterministic `decodeStub` slices |
  * | unknown formats | deterministic `decodeStub` | — |
  *
  * The mp4-frame boundary is a FORMAT boundary, not a TODO: H.264/H.265
  * bitstream decoding has no JDK or pure-JVM implementation — every real
  * system shells out to native codecs (ffmpeg/JNI), which this library
  * deliberately does not link. What IS real either side of the boundary:
  * the container metadata (so partition/filter/plan decisions never touch
  * a stub), and the Spark-side plumbing of `sampleFrames` (offsets,
  * per-partition batching, payload-column pruning) under deterministic
  * stand-in bytes — swap `decodeStub` for a JNI codec and nothing else
  * changes.
  */
object Multimodal {

  // ImageIO defaults to a temp-FILE cache per decode and may probe a
  // display; executors want neither
  System.setProperty("java.awt.headless", "true")
  javax.imageio.ImageIO.setUseCache(false)

  /** One media asset: payload + typed sidecar metadata. At 100 TB the
    * payloads dominate — keep them in their own column so column pruning
    * lets metadata-only queries never touch the bytes.
    */
  final case class Asset(
      asset_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      width: Int, height: Int, channels: Int,
      sample_rate: Int, duration_ms: Int)

  final case class Features(
      asset_id: Long,
      kind: String,
      format: String,
      n_bytes: Long,
      histogram: Array[Double]) // normalized 16-bucket byte histogram

  final case class Frame(
      asset_id: Long,
      frame_idx: Int,
      offset: Long,
      frame_bytes: Array[Byte])

  final case class AssetWithFormat(
      asset_id: Long, kind: String, content: Array[Byte],
      width: Int, height: Int, channels: Int,
      sample_rate: Int, duration_ms: Int, format: String)

  /** Magic-byte container sniffing — NATIVE expressions over the binary
    * column (hex of the leading bytes), so it runs inside codegen and
    * column pruning reads only the parquet pages it needs.
    */
  def sniffFormat(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val head = hex(substring(content, 1, 8))
    when(head.startsWith("FFD8FF"), "jpeg")
      .when(head.startsWith("89504E47"), "png")
      .when(head.startsWith("52494646"), "wav") // RIFF
      .when(substring(head, 9, 8) === "66747970", "mp4") // ....ftyp
      .otherwise("unknown")
  }

  /** A REAL RIFF/WAVE payload: canonical 44-byte PCM header + 16-bit LE
    * mono samples of a deterministic sine keyed by `seed`. Decodable by
    * any WAV reader, including `decodeAudio` below.
    */
  def encodeWavPcm16(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    val freq = 220.0 + (seed % 7) * 110.0
    encodeWavPcm16Samples(Array.tabulate(nSamples) { i =>
      (math.sin(2.0 * math.Pi * freq * i / sampleRate) * 0.5 *
        Short.MaxValue).toShort
    }, sampleRate)
  }

  /** A REAL mono 16-bit PCM WAV container around caller-provided samples
    * (the sine generator above and the PRNG-noise dedup fixtures both
    * route through here). Decodes with `javax.sound.sampled`.
    */
  def encodeWavPcm16Samples(samples: Array[Short],
                            sampleRate: Int): Array[Byte] = {
    val dataBytes = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < samples.length) {
      out.putShort(samples(i))
      i += 1
    }
    out.array()
  }

  /** A REAL (minimal) ISO-BMFF/MP4 container: `ftyp` + `moov` holding a
    * version-0 `mvhd` (timescale + duration) and `nTracks` empty `trak`
    * boxes, padded to `totalBytes` with a `free` box of deterministic
    * splitmix bytes. Parses with `parseMp4` or any box walker.
    */
  def encodeMinimalMp4(durationMs: Long, nTracks: Int, totalBytes: Int,
                       seed: Long): Array[Byte] = {
    val mvhdLen = 8 + 100
    val moovLen = 8 + mvhdLen + 8 * nTracks
    val ftypLen = 24
    val freeLen = totalBytes - ftypLen - moovLen
    require(freeLen >= 8, s"totalBytes=$totalBytes too small for the boxes")
    val out = java.nio.ByteBuffer.allocate(totalBytes) // big-endian (BMFF)
    out.putInt(ftypLen).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0x200)
      .put("isom".getBytes("US-ASCII")).put("mp42".getBytes("US-ASCII"))
    out.putInt(moovLen).put("moov".getBytes("US-ASCII"))
    out.putInt(mvhdLen).put("mvhd".getBytes("US-ASCII"))
      .putInt(0) // version 0 + flags
      .putInt(0).putInt(0) // creation/modification time
      .putInt(1000) // timescale: ms
      .putInt(durationMs.toInt)
      .putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume, reserved
      .putLong(0) // reserved
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
      .foreach(out.putInt) // identity matrix
    (1 to 6).foreach(_ => out.putInt(0)) // pre_defined
    out.putInt(nTracks + 1) // next_track_ID
    (1 to nTracks).foreach { _ =>
      out.putInt(8).put("trak".getBytes("US-ASCII"))
    }
    out.putInt(freeLen).put("free".getBytes("US-ASCII"))
    var x = seed * 0x9e3779b97f4a7c15L + 0x243f6a8885a308d3L
    (1 to freeLen - 8).foreach { _ =>
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      out.put((z >>> 56).toByte)
    }
    out.array()
  }

  /** Deterministic synthetic assets for tests/benchmarks. Audio and video
    * payloads are REAL containers (decodable WAV PCM; walkable MP4 boxes);
    * image payloads carry a JPEG magic over splitmix bytes — an
    * UNDECODABLE body, kept deliberately so the stub fallback path stays
    * exercised next to the real-decode paths (planted PNGs in the specs
    * cover real image decode).
    */
  def syntheticAssets(spark: SparkSession, n: Int, bytesPerAsset: Int = 4096): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      (id % 3) match {
        case 0 =>
          val magic = Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte)
          var x = id * 0x9e3779b97f4a7c15L + 0x243f6a8885a308d3L
          val body = Array.fill(bytesPerAsset - magic.length) {
            x += 0x9e3779b97f4a7c15L
            var z = x
            z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
            (z >>> 56).toByte
          }
          Asset(id, "image", magic ++ body,
            width = 64, height = 64, channels = 3,
            sample_rate = 0, duration_ms = 0)
        case 1 =>
          val sampleRate = 16000
          val nSamples = (bytesPerAsset - 44) / 2
          Asset(id, "audio", encodeWavPcm16(nSamples, sampleRate, id),
            width = 0, height = 0, channels = 1,
            sample_rate = sampleRate,
            duration_ms = (nSamples * 1000L / sampleRate).toInt)
        case _ =>
          Asset(id, "video",
            encodeMinimalMp4(durationMs = 2000L, nTracks = 1,
              totalBytes = bytesPerAsset, seed = id),
            width = 64, height = 64, channels = 3,
            sample_rate = 0, duration_ms = 2000)
      }
    }
  }

  /** A decoded raster: interleaved row-major RGB (channels=3) or RGBA
    * (channels=4) bytes.
    */
  final case class DecodedImage(width: Int, height: Int, channels: Int,
                                pixels: Array[Byte])

  /** REAL image decode through `javax.imageio` — PNG, JPEG, GIF and BMP
    * readers ship in the JDK. Returns None when no reader claims the
    * payload (audio/video containers, truncated bytes), in which case
    * callers keep the stub path.
    */
  def decodeImage(content: Array[Byte]): Option[DecodedImage] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val channels = if (img.getColorModel.hasAlpha) 4 else 3
      val out = new Array[Byte](w * h * channels)
      var y = 0
      var o = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val argb = img.getRGB(x, y)
          out(o) = ((argb >> 16) & 0xFF).toByte
          out(o + 1) = ((argb >> 8) & 0xFF).toByte
          out(o + 2) = (argb & 0xFF).toByte
          if (channels == 4) out(o + 3) = ((argb >>> 24) & 0xFF).toByte
          o += channels
          x += 1
        }
        y += 1
      }
      Some(DecodedImage(w, h, channels, out))
    }
  }

  /** splitmix64 of a step index — the deterministic pixel/byte generator
    * shared by the synthetic fixtures AND replayed verbatim by the DuckDB
    * oracles (state is a pure function of the index, so the stream
    * replicates in SQL via range() + the 32-bit-halves wrapping multiply).
    */
  def splitmix64(k: Long): Long = graft.functions.SplitMix64.hash(k)

  /** A REAL minimal BMP encoder (BITMAPINFOHEADER, 24 bpp, BI_RGB,
    * bottom-up rows, 4-byte row padding) over a grayscale function of the
    * row-major pixel index — `javax.imageio`'s BMP reader decodes it back
    * bit-exactly (asserted in `MultimodalSpec`), which is what lets the
    * perceptual-hash oracle replay pixels without an image library.
    */
  def encodeBmp24Gray(width: Int, height: Int, gray: Int => Int): Array[Byte] = {
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * height
    val fileSize = 54 + dataSize
    val buf = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(fileSize).putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24)
    buf.putInt(0).putInt(dataSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var y = height - 1 // BMP stores rows bottom-up
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val v = (gray(y * width + x) & 0xFF).toByte
        buf.put(v).put(v).put(v) // B G R equal: grayscale
        x += 1
      }
      var p = 0
      while (p < pad) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Perceptual average-hash (aHash) of a decoded raster: 8×8 grid over
    * the image, bit i set iff cell i's mean grayscale exceeds the global
    * mean. All comparisons are EXACT integer cross-multiplies
    * (cellSum·totalN > totalSum·cellN — no floating point anywhere), so
    * the hash replays bit-identically in SQL; grayscale is the integer
    * (299r + 587g + 114b) / 1000 (identity on gray pixels). Safe to
    * ~100 MP (the cross-multiply stays inside Long). Cell of pixel
    * (x, y) = (y·8/h)·8 + x·8/w — exact 8×8 blocks when 8 | w, h.
    */
  def averageHash64(img: DecodedImage): Long = {
    require(img.width >= 8 && img.height >= 8,
      s"image ${img.width}x${img.height} smaller than the 8x8 hash grid")
    val ch = img.channels
    val cellSum = new Array[Long](64)
    val cellN = new Array[Long](64)
    var y = 0
    while (y < img.height) {
      val cy = y * 8 / img.height
      var x = 0
      while (x < img.width) {
        val cx = x * 8 / img.width
        val o = (y * img.width + x) * ch
        val gray = (299 * (img.pixels(o) & 0xFF) +
          587 * (img.pixels(o + 1) & 0xFF) +
          114 * (img.pixels(o + 2) & 0xFF)) / 1000
        val c = cy * 8 + cx
        cellSum(c) += gray
        cellN(c) += 1
        x += 1
      }
      y += 1
    }
    val totalSum = cellSum.sum
    val totalN = img.width.toLong * img.height
    var h = 0L
    var i = 0
    while (i < 64) {
      if (cellSum(i) * totalN > totalSum * cellN(i)) h |= 1L << i
      i += 1
    }
    h
  }

  /** (asset_id, ahash) for every DECODABLE image in the frame — real
    * `javax.imageio` decode + `averageHash64`, undecodable payloads
    * dropped (a real pipeline routes them to a dead-letter table, as
    * `audioFeatures` documents). Runs as a deserialized map — decode is a
    * JVM library call, not expressible as a Catalyst expression — but the
    * hash output re-enters columnar land immediately, so everything
    * downstream (the dedup join) is back in codegen.
    */
  def imageHashes(images: DataFrame, idCol: String,
                  contentCol: String): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images
      .select(org.apache.spark.sql.functions.col(idCol).cast("long"),
        org.apache.spark.sql.functions.col(contentCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        // decodable-but-tiny rasters (1x1 tracking pixels are common in
        // web corpora) can't fill the 8x8 hash grid — drop them to the
        // dead-letter path instead of throwing, mirroring audioHashes'
        // minimum-length guard
        decodeImage(bytes).filter(img => img.width >= 8 && img.height >= 8)
          .map(img => (id, averageHash64(img)))
      }
      .toDF("asset_id", "ahash")
  }

  /** The corpus-size-driven (pieces, maxDistance) schedule for the
    * perceptual-hash dedups — `SimHash.autoParams` capped at the
    * historical mm banding (9, 8): the pigeonhole candidate volume within
    * a (piece, segment) bucket is quadratic in bucket occupancy
    * (≈ p·n²/2^(64/p+1)), so a FIXED pieces=9 is n²-shaped at scale
    * (measured: mm_audio_dedup sf0.1→sf1 was ~10.5× for 10× data). The
    * schedule holds (9, 8) to ~34k assets — every gate scale — then
    * widens segments exponentially: (8, 7) to ~70k, (7, 6) to ~178k,
    * (6, 5) to ~597k, floor (4, 3) good to tens of millions. Tightening
    * maxDistance trades recall on far-apart near-dups for the linear
    * plan — the same explicit LSH contract as the text path
    * (`SimHash.autoParams`); callers needing a FIXED threshold at bulk
    * scale should run `SimHash.segmentIndex` + `hammingAgainstIndex`
    * delta batches instead of one giant self-join.
    */
  def autoHammingParams(n: Long): (Int, Int) =
    graft.operators.SimHash.autoParams(n, maxPieces = 9)

  /** (pieces, maxDistance) from the caller's explicit pin or the
    * auto-schedule. Explicit means BOTH given (> 0) — the pair is one
    * contract (pigeonhole needs pieces > maxDistance); half-pinning is a
    * typed error, not a silent fill.
    */
  private def resolveHammingParams(maxDistance: Int, pieces: Int,
                                   n: => Long): (Int, Int) = {
    if (maxDistance > 0 && pieces > 0) (pieces, maxDistance)
    else {
      require(maxDistance <= 0 && pieces <= 0,
        s"pin BOTH maxDistance and pieces or NEITHER (auto-scaled), got " +
          s"maxDistance=$maxDistance pieces=$pieces")
      autoHammingParams(n)
    }
  }

  /** Perceptual image near-dedup: aHash per image, then the pigeonhole
    * Hamming join shared with the SimHash text path
    * (`SimHash.hammingPairs`) — pairs at Hamming ≤ `maxDistance` over the
    * 64-bit perceptual hash, found exactly for the hash (`pieces` >
    * maxDistance), candidates bounded by segment buckets, never an
    * all-pairs product. The training-data use: collapse re-encoded /
    * lightly-edited duplicate images before captioning or embedding.
    *
    * By DEFAULT the (pieces, maxDistance) banding is size-adaptive
    * (`autoHammingParams` — one metadata-cheap count of `images` picks
    * it, `nHint` skips even that); pass both explicitly to pin a fixed
    * threshold (the gate fixtures pin (8, 9), which the auto schedule
    * reproduces at every gate scale).
    */
  def imageDedup(images: DataFrame, idCol: String, contentCol: String,
                 maxDistance: Int = -1, pieces: Int = -1,
                 nHint: Long = -1L): DataFrame = {
    val (p, d) = resolveHammingParams(maxDistance, pieces,
      if (nHint > 0) nHint else images.count())
    graft.operators.SimHash.hammingPairs(
      imageHashes(images, idCol, contentCol), "asset_id", "ahash", d, p)
  }

  /** Energy-profile audio fingerprint (an echoprint-style sign
    * fingerprint, simplified to one band): the first 64·F samples
    * (F = nSamples/64) split into 64 equal frames, bit f set iff frame
    * f's absolute-amplitude sum exceeds the global mean — the same
    * integer cross-multiply rule as `averageHash64` (64·energy_f >
    * totalEnergy, no floats), so it replays exactly in SQL. Amplitude-
    * scale-robust by construction: a uniformly re-leveled copy scales
    * every energy together, moving no bit except exact-boundary ties.
    * Expects mono 16-bit little-endian PCM (what `decodeAudio` yields for
    * the WAV fixtures); requires ≥ 64 samples.
    */
  def audioFingerprint64(pcm: Array[Byte]): Long = {
    val n = pcm.length / 2
    require(n >= 64, s"need >= 64 samples for the 64-frame fingerprint, got $n")
    val f = n / 64
    val energy = new Array[Long](64)
    var frame = 0
    while (frame < 64) {
      var i = frame * f
      val end = i + f
      var sum = 0L
      while (i < end) {
        val s = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xFF)).toShort.toInt
        sum += math.abs(s)
        i += 1
      }
      energy(frame) = sum
      frame += 1
    }
    val total = energy.sum
    var h = 0L
    var b = 0
    while (b < 64) {
      if (64L * energy(b) > total) h |= 1L << b
      b += 1
    }
    h
  }

  /** (asset_id, ahash) for every DECODABLE audio payload — real
    * `javax.sound.sampled` decode + `audioFingerprint64`; undecodable or
    * too-short payloads drop to the dead-letter path.
    */
  def audioHashes(clips: DataFrame, idCol: String,
                  contentCol: String): DataFrame = {
    val spark = clips.sparkSession
    import spark.implicits._
    clips
      .select(org.apache.spark.sql.functions.col(idCol).cast("long"),
        org.apache.spark.sql.functions.col(contentCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        decodeAudio(bytes).filter(_.pcm.length >= 128)
          .map(a => (id, audioFingerprint64(a.pcm)))
      }
      .toDF("asset_id", "ahash")
  }

  /** Perceptual audio near-dedup: energy fingerprint per clip, then the
    * shared pigeonhole Hamming join — collapse re-encoded / re-leveled
    * duplicate audio before transcription or embedding, the audio leg of
    * the text/image/audio dedup family. Banding is size-adaptive by
    * default, pinnable — see [[imageDedup]].
    */
  def audioDedup(clips: DataFrame, idCol: String, contentCol: String,
                 maxDistance: Int = -1, pieces: Int = -1,
                 nHint: Long = -1L): DataFrame = {
    val (p, d) = resolveHammingParams(maxDistance, pieces,
      if (nHint > 0) nHint else clips.count())
    graft.operators.SimHash.hammingPairs(
      audioHashes(clips, idCol, contentCol), "asset_id", "ahash", d, p)
  }

  /** A decoded audio clip: PCM bytes + the format sidecar. */
  final case class DecodedAudio(sampleRate: Int, channels: Int,
                                bitsPerSample: Int, nFrames: Long,
                                pcm: Array[Byte])

  /** REAL audio decode through `javax.sound.sampled` — the WAV/AIFF/AU
    * readers ship in the JDK. Returns None when no reader claims the
    * payload (mp4, truncated bytes), in which case callers keep the stub
    * path.
    */
  def decodeAudio(content: Array[Byte]): Option[DecodedAudio] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      val f = ais.getFormat
      val pcm = ais.readAllBytes()
      ais.close()
      Some(DecodedAudio(f.getSampleRate.toInt, f.getChannels,
        f.getSampleSizeInBits, ais.getFrameLength, pcm))
    } catch { case _: Exception => None }

  final case class AudioFeatures(
      asset_id: Long, sample_rate: Int, channels: Int, n_samples: Long,
      rms: Double, peak: Double)

  /** Per-partition REAL audio feature extraction: decode WAV PCM, compute
    * RMS level and absolute peak over normalized 16-bit samples. Assets
    * whose payloads no JVM reader claims are skipped (a real pipeline
    * routes them to a dead-letter table).
    */
  def audioFeatures(assets: Dataset[Asset]): Dataset[AudioFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(col("kind") === "audio").flatMap { a =>
      decodeAudio(a.content).collect {
        case d if d.bitsPerSample == 16 =>
          val n = d.pcm.length / 2
          var i = 0
          var sum2 = 0.0
          var peak = 0.0
          while (i < n) {
            val s = (((d.pcm(2 * i + 1) << 8) | (d.pcm(2 * i) & 0xFF)).toShort
              / 32768.0)
            sum2 += s * s
            val a0 = math.abs(s)
            if (a0 > peak) peak = a0
            i += 1
          }
          AudioFeatures(a.asset_id, d.sampleRate, d.channels,
            n.toLong / math.max(d.channels, 1),
            math.sqrt(sum2 / math.max(n, 1)), peak)
      }
    }
  }

  /** Container metadata from an ISO-BMFF/MP4 payload. */
  final case class Mp4Meta(major_brand: String, timescale: Long,
                           duration_ms: Long, n_tracks: Int)

  /** REAL MP4 container parsing — a pure byte-level ISO-BMFF box walk
    * (`ftyp` brand; `moov`→`mvhd` timescale/duration, v0 and v1; `trak`
    * count). No codec involved: this is the demux-metadata stage a real
    * pipeline runs before deciding what to decode. Returns None when the
    * payload isn't a well-formed box sequence with a `moov`/`mvhd`.
    */
  def parseMp4(content: Array[Byte]): Option[Mp4Meta] =
    try {
      val buf = java.nio.ByteBuffer.wrap(content) // BMFF is big-endian
      def u32(at: Int): Long = buf.getInt(at) & 0xFFFFFFFFL
      def fourcc(at: Int): String =
        new String(content, at, 4, "US-ASCII")
      var off = 0
      var brand: Option[String] = None
      var meta: Option[(Long, Long)] = None // (timescale, duration ticks)
      var tracks = 0
      var sawMoov = false
      while (off + 8 <= content.length) {
        val size = u32(off)
        val typ = fourcc(off + 4)
        if (size < 8 || off + size > content.length)
          return None // size==1 (64-bit largesize) unsupported; malformed otherwise
        typ match {
          case "ftyp" if size >= 16 => brand = Some(fourcc(off + 8))
          case "moov" =>
            sawMoov = true
            var c = off + 8
            val end = off + size.toInt
            while (c + 8 <= end) {
              val csize = u32(c)
              if (csize < 8 || c + csize > end) return None
              fourcc(c + 4) match {
                case "mvhd" =>
                  val version = content(c + 8) & 0xFF
                  meta = Some(
                    if (version == 1) (u32(c + 28), buf.getLong(c + 32))
                    else (u32(c + 20), u32(c + 24)))
                case "trak" => tracks += 1
                case _ => ()
              }
              c += csize.toInt
            }
          case _ => ()
        }
        off += size.toInt
      }
      if (!sawMoov) None
      else meta.map { case (ts, dur) =>
        Mp4Meta(brand.getOrElse("????"), ts,
          if (ts == 0) 0L else dur * 1000L / ts, tracks)
      }
    } catch { case _: Exception => None }

  final case class VideoMeta(asset_id: Long, major_brand: String,
                             timescale: Long, duration_ms: Long, n_tracks: Int)

  /** Per-partition MP4 metadata extraction over video payloads. */
  def videoMeta(assets: Dataset[Asset]): Dataset[VideoMeta] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(col("kind") === "video").flatMap { a =>
      parseMp4(a.content).map(m =>
        VideoMeta(a.asset_id, m.major_brand, m.timescale, m.duration_ms,
          m.n_tracks))
    }
  }

  /** STUB — stands in ONLY for payloads with no JVM decoder left: mp4
    * FRAME PIXELS (the container metadata is genuinely parsed by
    * `parseMp4`; images decode via `decodeImage`, WAV audio via
    * `decodeAudio`) and unknown formats. Deterministic: "pixels" are a
    * splitmix of the content hash. The signature and batch shape are what
    * a real codec plugs into; swap the body, keep the plumbing.
    */
  def decodeStub(content: Array[Byte]): Array[Byte] = {
    var x = java.util.Arrays.hashCode(content).toLong
    Array.fill(16) {
      x += 0x9e3779b97f4a7c15L
      (x >>> 48).toByte
    }
  }

  /** Per-partition feature extraction over the binary payloads, processing
    * rows in bounded batches (the mapInPandas batch shape): REAL byte
    * histogram + native format sniff carried through. One pass, O(batch)
    * memory, no driver involvement.
    */
  def extractFeatures(assets: Dataset[Asset], batchSize: Int = 64): Dataset[Features] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .withColumn("format", sniffFormat(col("content")))
      .as[AssetWithFormat]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { a =>
            val hist = new Array[Double](16)
            var i = 0
            while (i < a.content.length) {
              hist((a.content(i) & 0xFF) >>> 4) += 1.0
              i += 1
            }
            val n = math.max(a.content.length, 1).toDouble
            Features(a.asset_id, a.kind, a.format, a.content.length.toLong,
              hist.map(_ / n))
          }
        }
      }
  }

  /** Resize images. Decodable payloads (PNG/JPEG/GIF/BMP) get a REAL
    * bilinear resample through java.awt + re-encode to PNG; payloads with
    * no JVM decoder keep the deterministic stub resample sized to the
    * target pixel budget, so the pipeline shape is identical either way.
    */
  def resize(assets: Dataset[Asset], targetW: Int, targetH: Int): Dataset[Asset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.map { a =>
      if (a.kind != "image") a
      else {
        val real =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(a.content)))
          catch { case _: Exception => None }
        real match {
          case Some(src) =>
            val dst = new java.awt.image.BufferedImage(
              targetW, targetH, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
            val g = dst.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, targetW, targetH, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            a.copy(content = bos.toByteArray, width = targetW, height = targetH,
              channels = 3)
          case None =>
            // STUB resample: deterministic bytes sized to the target pixel
            // budget (w*h*channels), derived from the source content hash
            val budget = targetW * targetH * a.channels
            val seedBytes = decodeStub(a.content)
            val resampled = Array.tabulate(budget)(i => seedBytes(i % seedBytes.length))
            a.copy(content = resampled, width = targetW, height = targetH)
        }
      }
    }
  }

  /** Frame sampling for video payloads: `nFrames` evenly-spaced byte slices.
    * The slicing stands in for the codec PERMANENTLY (see the format matrix
    * in the object scaladoc: no pure-JVM H.264 decoder exists); a real
    * demuxer would seek keyframes. The offsets, batching shape and payload
    * pruning — the parts Spark owns — are the real contract here.
    */
  def sampleFrames(assets: Dataset[Asset], nFrames: Int = 4,
                   frameBytes: Int = 256): Dataset[Frame] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(col("kind") === "video").flatMap { a =>
      val stride = math.max((a.content.length - frameBytes) / math.max(nFrames - 1, 1), 1)
      (0 until nFrames).iterator.map { f =>
        val off = math.min(f.toLong * stride, math.max(a.content.length - frameBytes, 0).toLong)
        Frame(a.asset_id, f, off,
          a.content.slice(off.toInt, math.min(off.toInt + frameBytes, a.content.length)))
      }
    }
  }

  /** Metadata-only projection — must prune the payload column entirely
    * (asserted in the spec): the 100 TB "list my corpus" query reads
    * kilobytes, not the blobs.
    */
  def catalog(assets: Dataset[Asset]): DataFrame =
    assets.select(col("asset_id"), col("kind"), col("width"), col("height"),
      col("sample_rate"), col("duration_ms"))
}
