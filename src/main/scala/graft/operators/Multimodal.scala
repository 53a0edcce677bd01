package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata; decode / feature
  * extraction runs batch-wise in `mapPartitions` (the Scala analog of
  * a vectorized pandas UDF — one JVM call per partition, not per row).
  *
  * Image decode is REAL ([[ImageDecoder]], JDK `javax.imageio` —
  * PNG/JPEG/GIF/BMP), audio decode is REAL ([[AudioDecoder]], JDK
  * `javax.sound.sampled` — WAV/AIFF/AU PCM), and video decode is REAL
  * for the one container with a JDK codec ([[VideoDecoder]],
  * multi-frame animated GIF via ImageIO read-sequence) — all producing
  * deterministic integer statistics with no external dependencies.
  * Containers with no JDK SPI (mp4/h264/webm) keep the documented
  * stand-in ([[FakeDecoder]]). The Spark-side contract — schema,
  * partition sizing, batch iteration, null handling — is identical for
  * all decoders; swap [[Decoder]] implementations to plug another
  * codec.
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

  /** Real audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * PCM — no external libraries). Features are exact integer sample
    * statistics (magnitudes kept < 2^24 by the synth corpus, so
    * lossless as Float):
    * [channels, sampleRateHz, nFrames, minSample, maxSample, sum,
    *  sumAbs, nLoud(|s| > 30000)].
    * Non-audio or undecodable payloads yield the zero vector (decode
    * failure is data, not an exception). Compressed codecs (mp3/ogg)
    * have no JDK SPI — they would decode through the same contract
    * with a codec library on the executor classpath. */
  class AudioDecoder extends Decoder {
    val featureSize: Int = 8
    def decode(payload: Array[Byte], mimeType: String): Array[Float] = {
      val out = new Array[Float](featureSize)
      if (payload == null || payload.isEmpty) return out
      val ais =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        catch { case _: Exception => null }
      if (ais == null) return out
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) return out
        val bytes = ais.readAllBytes()
        val be = fmt.isBigEndian
        var i = 0
        var mn = Int.MaxValue; var mx = Int.MinValue
        var sum = 0L; var sumAbs = 0L; var loud = 0L; var n = 0L
        while (i + 1 < bytes.length) {
          val s =
            if (be) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort.toInt
            else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort.toInt
          if (s < mn) mn = s
          if (s > mx) mx = s
          sum += s; sumAbs += math.abs(s)
          if (math.abs(s) > 30000) loud += 1
          n += 1; i += 2
        }
        if (n == 0) return out
        out(0) = fmt.getChannels.toFloat
        out(1) = fmt.getSampleRate
        out(2) = (n / fmt.getChannels).toFloat
        out(3) = mn.toFloat; out(4) = mx.toFloat
        out(5) = sum.toFloat; out(6) = sumAbs.toFloat; out(7) = loud.toFloat
        out
      } catch { case _: Exception => new Array[Float](featureSize) }
      finally ais.close()
    }
  }

  /** Real video decode via the JDK's multi-frame ImageIO readers
    * (animated GIF — the one video-ish container with a built-in JDK
    * codec; no external libraries). Features are exact integer
    * frame/pixel statistics (all < 2^24, lossless as Float):
    * [nFrames, width, height, sumLuma(all frames), minLuma, maxLuma,
    *  sumLuma(frame 0), nFrames·width·height]
    * with luma = (r + g + b) / 3 (integer division — exact on the gray
    * frames [[withGifPayload]] emits). Frames are read standalone
    * (full-frame disposal, as written by the synthesizer); compositing
    * partial-frame GIFs and real containers (mp4/webm) would plug in
    * through the same [[Decoder]] contract with a codec library on the
    * executor classpath. Non-video or undecodable payloads yield the
    * zero vector (decode failure is data, not an exception). */
  class VideoDecoder extends Decoder {
    val featureSize: Int = 8
    def decode(payload: Array[Byte], mimeType: String): Array[Float] = {
      val out = new Array[Float](featureSize)
      if (payload == null || payload.isEmpty) return out
      val iis =
        try javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        catch { case _: Exception => null }
      if (iis == null) return out
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return out
        val reader = readers.next()
        try {
          reader.setInput(iis, false)
          val n = reader.getNumImages(true)
          if (n <= 0) return out
          var w = 0; var h = 0
          var sumL = 0L; var sumF0 = 0L
          var minL = 255; var maxL = 0
          var f = 0
          while (f < n) {
            val img = reader.read(f)
            if (f == 0) { w = img.getWidth; h = img.getHeight }
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                val luma = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                  (rgb & 0xff)) / 3
                sumL += luma
                if (f == 0) sumF0 += luma
                if (luma < minL) minL = luma
                if (luma > maxL) maxL = luma
                x += 1
              }
              y += 1
            }
            f += 1
          }
          out(0) = n.toFloat; out(1) = w.toFloat; out(2) = h.toFloat
          out(3) = sumL.toFloat; out(4) = minL.toFloat; out(5) = maxL.toFloat
          out(6) = sumF0.toFloat
          out(7) = (n.toLong * w * h).toFloat
          out
        } finally reader.dispose()
      } catch { case _: Exception => new Array[Float](featureSize) }
      finally iis.close()
    }
  }

  /** Frame formulas for [[withGifPayload]] — closed-form so an external
    * oracle can recompute the decoded statistics from the id alone:
    * luma(f, x, y) = (id·31 + f·97 + x·7 + y·13) mod 256 on a
    * (4 + id mod 4) × (3 + id mod 3) canvas over (2 + id mod 3)
    * frames. */
  def gifFrames(id: Long): Int = (2 + id % 3).toInt
  def gifDims(id: Long): (Int, Int) = ((4 + id % 4).toInt, (3 + id % 3).toInt)
  def gifLuma(id: Long, f: Int, x: Int, y: Int): Int =
    Math.floorMod(id * 31 + f * 97 + x * 7 + y * 13, 256L).toInt

  /** Synthesize one genuine multi-frame animated GIF89a per row from
    * the deterministic luma formula. The container is assembled
    * directly (header, logical screen descriptor, an EXACT 256-gray
    * global color table, per-frame image descriptor + LZW data,
    * trailer) because the JDK's GIF *writer* re-quantizes palettes —
    * whereas any GIF *reader*, including ImageIO's, decodes this
    * byte-exactly: pixel index == palette gray == the formula value.
    * The LZW stream is the all-literals encoding (9-bit codes, a CLEAR
    * every 200 symbols so the code width never grows) — valid LZW any
    * decoder accepts. Payloads are ≤ a few hundred bytes (≤ 7×5 px ×
    * 4 frames), so partition sizing follows the input table. */
  def withGifPayload(docs: DataFrame, idCol: String)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions(_.map(id => (id, gifBytes(id))))
      .toDF("id", "payload")
      .withColumn("mime_type", lit("image/gif"))
  }

  /** The GIF89a bytes for one id — see [[withGifPayload]]. */
  def gifBytes(id: Long): Array[Byte] = {
    val (w, h) = gifDims(id)
    encodeGrayGif(w, h, gifFrames(id), (f, x, y) => gifLuma(id, f, x, y))
  }

  /** Assemble a GIF89a container over the exact 256-gray palette from
    * a per-frame luma function — see [[withGifPayload]] for why the
    * JDK's GIF writer cannot be used here. */
  private[operators] def encodeGrayGif(w: Int, h: Int, n: Int,
      luma: (Int, Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(w); u16(h)
    out.write(0xF7) // global color table, 8-bit, 256 entries
    out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    var f = 0
    while (f < n) {
      out.write(0x2C) // image descriptor
      u16(0); u16(0); u16(w); u16(h)
      out.write(0x00) // no local color table
      out.write(8)    // LZW min code size
      // 9-bit LZW, LSB-first bit packing, CLEAR every 200 literals
      val data = new java.io.ByteArrayOutputStream()
      var cur = 0; var nbits = 0
      def emit(code: Int): Unit = {
        cur |= code << nbits; nbits += 9
        while (nbits >= 8) { data.write(cur & 0xff); cur >>= 8; nbits -= 8 }
      }
      emit(256) // initial CLEAR
      var k = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          if (k == 200) { emit(256); k = 0 }
          emit(luma(f, x, y) & 0xff); k += 1
          x += 1
        }
        y += 1
      }
      emit(257) // END
      if (nbits > 0) data.write(cur & 0xff)
      // sub-block the LZW stream (<= 255 bytes per block)
      val lzw = data.toByteArray
      var p = 0
      while (p < lzw.length) {
        val len = math.min(255, lzw.length - p)
        out.write(len); out.write(lzw, p, len); p += len
      }
      out.write(0) // block terminator
      f += 1
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Deterministic stub for codecs with no JDK SPI (mp4/h264/webm):
    * byte-histogram-derived features. */
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

  /** Sample formula for [[withWavPayload]] — closed-form so an external
    * oracle can recompute the decoded statistics from the id alone:
    * sample(i) = ((id·131 + i·17) mod 65536) − 32768, mono 16-bit PCM
    * at 8 kHz, nSamples = 40 + id mod 17. */
  def wavSamples(id: Long): Int = (40 + id % 17).toInt
  def wavSample(id: Long, i: Int): Int =
    Math.floorMod(id * 131 + i * 17, 65536L).toInt - 32768
  val WavRateHz = 8000

  /** Synthesize one genuine RIFF/WAVE file per row (44-byte canonical
    * header + PCM16LE frames) from the deterministic sample formula:
    * the media bytes are real WAV files (decodable by any audio stack,
    * including `javax.sound.sampled`) while the decoded statistics stay
    * recomputable in closed form for oracle checks. Payloads are ≤ 156
    * bytes, so partition sizing follows the input table. */
  def withWavPayload(docs: DataFrame, idCol: String)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = wavSamples(id)
          val dataLen = n * 2
          val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1)            // PCM
            .putShort(1)            // mono
            .putInt(WavRateHz)
            .putInt(WavRateHz * 2)  // byte rate
            .putShort(2)            // block align
            .putShort(16)           // bits per sample
            .put("data".getBytes("US-ASCII")).putInt(dataLen)
          var i = 0
          while (i < n) { bb.putShort(wavSample(id, i).toShort); i += 1 }
          (id, bb.array())
        }
      }.toDF("id", "payload")
      .withColumn("mime_type", lit("audio/wav"))
  }

  /** Nearest-neighbor image resize, partition-wise: decode with
    * ImageIO, sample src pixel (x·srcW/dstW, y·srcH/dstH) (integer
    * floor — the closed-form rule an external oracle can replay), and
    * re-encode as PNG (lossless, so downstream decode sees exactly the
    * sampled pixels). Undecodable payloads pass through as empty
    * payloads with width/height 0 — data, not exceptions. Output
    * schema: id, payload (PNG), mime_type, width, height. */
  def resizeImages(media: DataFrame, dstW: Int, dstH: Int)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(dstW > 0 && dstH > 0, "target dims must be positive")
    media.select(col("id"), col("payload"),
        col("mime_type").as("mimeType")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val src =
            if (r.payload == null || r.payload.isEmpty) null
            else
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(r.payload))
              catch { case _: Exception => null }
          if (src == null) (r.id, Array.empty[Byte], "image/png", 0, 0)
          else {
            val sw = src.getWidth; val sh = src.getHeight
            val dst = new java.awt.image.BufferedImage(
              dstW, dstH, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < dstH) {
              var x = 0
              while (x < dstW) {
                dst.setRGB(x, y,
                  src.getRGB(x * sw / dstW, y * sh / dstH) & 0xffffff)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            (r.id, bos.toByteArray, "image/png", dstW, dstH)
          }
        }
      }.toDF("id", "payload", "mime_type", "width", "height")
  }

  /** Temporal frame sampling for multi-frame payloads: keep frames
    * 0, k, 2k, … of an animated GIF and re-encode (the luma of each
    * kept frame re-indexes the exact gray palette, so the sampled
    * container round-trips losslessly for gray-frame corpora; color
    * frames are carried via their luma — the standard luminance proxy
    * for sampling features). Undecodable payloads yield an empty
    * payload with n_frames 0. Output: id, payload (GIF), mime_type,
    * n_frames. */
  def sampleFrames(media: DataFrame, k: Int)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(k > 0, "sampling stride must be positive")
    media.select(col("id"), col("payload"),
        col("mime_type").as("mimeType")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val frames = readFrames(r.payload)
          if (frames.isEmpty) (r.id, Array.empty[Byte], "image/gif", 0)
          else {
            val kept = frames.indices.collect {
              case i if i % k == 0 => frames(i)
            }
            val w = kept.head.getWidth; val h = kept.head.getHeight
            val luma = (img: java.awt.image.BufferedImage,
                x: Int, y: Int) => {
              val rgb = img.getRGB(x, y)
              (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
            }
            val bytes = encodeGrayGif(w, h, kept.length,
              (f, x, y) => luma(kept(f), x, y))
            (r.id, bytes, "image/gif", kept.length)
          }
        }
      }.toDF("id", "payload", "mime_type", "n_frames")
  }

  /** All frames of a multi-frame payload via ImageIO; empty on any
    * decode failure. */
  private def readFrames(payload: Array[Byte])
      : IndexedSeq[java.awt.image.BufferedImage] = {
    if (payload == null || payload.isEmpty) return IndexedSeq.empty
    val iis =
      try javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (iis == null) return IndexedSeq.empty
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return IndexedSeq.empty
      val reader = readers.next()
      try {
        reader.setInput(iis, false)
        (0 until reader.getNumImages(true)).map(reader.read)
      } finally reader.dispose()
    } catch { case _: Exception => IndexedSeq.empty }
    finally iis.close()
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
