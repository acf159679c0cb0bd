package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for training-data pipelines
  * (builder brief): media travels as opaque `binary` columns next to typed
  * metadata; per-item decode/feature work runs as imperative per-partition
  * logic over the binary payloads — the Scala analog of `mapInPandas`
  * batches.
  *
  * Decode support: IMAGE formats with a JDK reader (PNG, JPEG, GIF, BMP)
  * decode for REAL via `javax.imageio` (`decodeImage`) — actual pixels,
  * actual dimensions, actual bilinear resampling in `resize`. Only
  * payloads no JVM decoder exists for (wav/mp4/unknown) fall back to the
  * clearly-marked `decodeStub`, keeping every pipeline shape exercisable.
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

  /** Deterministic synthetic assets for tests/benchmarks: payload bytes from
    * splitmix64 on the asset id, prefixed with a real container magic so
    * sniffing has something to find.
    */
  def syntheticAssets(spark: SparkSession, n: Int, bytesPerAsset: Int = 4096): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val magic: Array[Byte] = kind match {
        case "image" => Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte)
        case "audio" => "RIFF".getBytes("US-ASCII")
        case _       => Array[Byte](0, 0, 0, 24) ++ "ftyp".getBytes("US-ASCII")
      }
      var x = id * 0x9e3779b97f4a7c15L + 0x243f6a8885a308d3L
      val body = Array.fill(bytesPerAsset - magic.length) {
        x += 0x9e3779b97f4a7c15L
        var z = x
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        (z >>> 56).toByte
      }
      Asset(id, kind, magic ++ body,
        width = 64, height = 64, channels = 3,
        sample_rate = 16000, duration_ms = 2000)
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

  /** STUB — stands in ONLY for payloads `decodeImage` cannot handle (no
    * wav/mp4 decoder ships in the JVM). Deterministic: "pixels" are a
    * splitmix of the content hash. The signature and batch shape are what
    * a real decoder plugs into; swap the body, keep the plumbing.
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

  /** Frame sampling for video payloads: `nFrames` evenly-spaced byte slices
    * (a real demuxer would seek keyframes; offsets/batching are the real
    * plumbing, the slicing stands in for the codec).
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
