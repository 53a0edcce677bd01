package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata; decode / feature
  * extraction runs batch-wise in `mapPartitions` (the Scala analog of
  * a vectorized pandas UDF — one JVM call per partition, not per row).
  *
  * Image decode is REAL: [[ImageDecoder]] decodes PNG/JPEG/GIF/BMP
  * payload bytes with the JDK's `javax.imageio` (no external
  * dependencies) into deterministic integer pixel statistics. Audio and
  * video payloads remain opaque binaries ([[FakeDecoder]] documents the
  * stand-in contract for codecs absent from this environment). The
  * Spark-side contract — schema, partition sizing, batch iteration,
  * null handling — is identical for all decoders; swap [[Decoder]]
  * implementations to plug another codec.
  */
object Multimodal {

  /** One media record entering the decode stage. */
  case class MediaRow(id: Long, payload: Array[Byte], mimeType: String)

  /** Decoded features leaving the decode stage. */
  case class MediaFeatures(id: Long, n_bytes: Int, features: Array[Float])

  /** Decode contract: payload bytes → fixed-size feature vector. */
  trait Decoder extends Serializable {
    def featureSize: Int
    def decode(payload: Array[Byte], mimeType: String): Array[Float]
  }

  /** Real image decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP — no
    * external libraries). Features are exact integer pixel statistics
    * (all < 2^24, so lossless as Float):
    * [width, height, sumR, sumG, sumB, minChan, maxChan, nPixels].
    * Non-image or undecodable payloads yield the zero vector (decode
    * failure is data, not an exception — a 100 TB corpus always carries
    * corrupt blobs). */
  class ImageDecoder extends Decoder {
    val featureSize: Int = 8
    def decode(payload: Array[Byte], mimeType: String): Array[Float] = {
      val out = new Array[Float](featureSize)
      if (payload == null || payload.isEmpty) return out
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: Exception => null }
      if (img == null) return out
      val w = img.getWidth; val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var minC = 255; var maxC = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          sr += r; sg += g; sb += b
          val lo = math.min(r, math.min(g, b)); val hi = math.max(r, math.max(g, b))
          if (lo < minC) minC = lo
          if (hi > maxC) maxC = hi
          x += 1
        }
        y += 1
      }
      out(0) = w.toFloat; out(1) = h.toFloat
      out(2) = sr.toFloat; out(3) = sg.toFloat; out(4) = sb.toFloat
      out(5) = minC.toFloat; out(6) = maxC.toFloat; out(7) = (w.toLong * h).toFloat
      out
    }
  }

  /** Deterministic stub for codecs absent from this environment
    * (audio/video): byte-histogram-derived features. */
  class FakeDecoder(val featureSize: Int = 8) extends Decoder {
    def decode(payload: Array[Byte], mimeType: String): Array[Float] = {
      val out = new Array[Float](featureSize)
      if (payload != null) {
        var i = 0
        while (i < payload.length) {
          out(i % featureSize) += (payload(i) & 0xff) / 255.0f
          i += 1
        }
      }
      out
    }
  }

  /** Attach a binary payload + metadata to a text table (stand-in for
    * reading real media files; demonstrates the binary-column schema). */
  def withPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("application/octet-stream").as("mime_type"))

  /** Pixel-value formula for [[withPngPayload]] — kept closed-form so an
    * external oracle can recompute the decoded statistics from the id
    * alone: channel c(x, y) = (id·k₁ + x·k₂ + y·k₃) mod 256. */
  def pngDims(id: Long): (Int, Int) = ((4 + id % 5).toInt, (4 + id % 3).toInt)
  def pngChannel(id: Long, x: Int, y: Int, chan: Int): Int = chan match {
    case 0 => Math.floorMod(id * 31 + x * 7 + y * 13, 256L).toInt
    case 1 => Math.floorMod(id * 17 + x * 3 + y * 5, 256L).toInt
    case _ => Math.floorMod(id * 7 + x * 11 + y * 3, 256L).toInt
  }

  /** Synthesize one real PNG per row (ImageIO-encoded in-executor) from
    * a deterministic per-id pixel formula: the media bytes are genuine
    * PNG files (decodable by any codec) while the decoded statistics
    * stay recomputable in closed form for oracle checks. Runs
    * partition-wise; payload size is bounded (≤ 8×6 px), so partition
    * sizing follows the input table. */
  def withPngPayload(docs: DataFrame, idCol: String)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val (w, h) = pngDims(id)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y,
                (pngChannel(id, x, y, 0) << 16) |
                (pngChannel(id, x, y, 1) << 8) |
                pngChannel(id, x, y, 2))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }.toDF("id", "payload")
      .withColumn("mime_type", lit("image/png"))
  }

  /** Batch feature extraction: partition-wise decode keeping Tungsten
    * rows until the JVM boundary; output re-enters codegen as a typed
    * Dataset. Partition count governs decode parallelism — repartition
    * upstream so each partition's payload set fits executor memory. */
  def extractFeatures(media: DataFrame, decoder: Decoder)
      (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("id"), col("payload"),
        col("mime_type").as("mimeType"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = if (r.payload == null) Array.empty[Byte] else r.payload
          MediaFeatures(r.id, bytes.length, decoder.decode(bytes, r.mimeType))
        }
      }
  }
}
