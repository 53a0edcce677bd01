package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Real image decode: [[Multimodal.ImageDecoder]] must recover the exact
  * pixel statistics of the PNGs synthesized by
  * [[Multimodal.withPngPayload]] (PNG is lossless, so the ImageIO
  * round-trip is bit-exact), and degrade to the zero vector on
  * undecodable payloads instead of throwing. */
class MultimodalSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def expectedStats(id: Long): (Int, Int, Long, Long, Long, Int, Int) = {
    val (w, h) = Multimodal.pngDims(id)
    var sr = 0L; var sg = 0L; var sb = 0L; var mn = 255; var mx = 0
    for (y <- 0 until h; x <- 0 until w) {
      val r = Multimodal.pngChannel(id, x, y, 0)
      val g = Multimodal.pngChannel(id, x, y, 1)
      val b = Multimodal.pngChannel(id, x, y, 2)
      sr += r; sg += g; sb += b
      mn = math.min(mn, math.min(r, math.min(g, b)))
      mx = math.max(mx, math.max(r, math.max(g, b)))
    }
    (w, h, sr, sg, sb, mn, mx)
  }

  test("ImageIO round-trip recovers exact pixel statistics") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 7L, 123L, 499L)
    val docs = ids.toDF("doc_id")
    val media = Multimodal.withPngPayload(docs, "doc_id")(spark)
    // payloads are genuine PNGs (magic bytes)
    val magic = media.select(col("id"), substring(col("payload"), 2, 3))
      .collect().map(r => r.getLong(0) -> new String(r.getAs[Array[Byte]](1)))
    magic.foreach { case (id, m) => assert(m == "PNG", s"payload $id not a PNG") }

    val feats = Multimodal.extractFeatures(media, new Multimodal.ImageDecoder)(spark)
      .collect().map(f => f.id -> f.features).toMap
    for (id <- ids) {
      val (w, h, sr, sg, sb, mn, mx) = expectedStats(id)
      val f = feats(id)
      assert(f.toSeq == Seq[Float](w, h, sr, sg, sb, mn, mx, w.toLong * h),
        s"decoded stats for id $id")
    }
  }

  test("undecodable payloads yield the zero vector, not an exception") {
    val dec = new Multimodal.ImageDecoder
    assert(dec.decode(null, "image/png").toSeq == Seq.fill(8)(0f))
    assert(dec.decode(Array.emptyByteArray, "image/png").toSeq == Seq.fill(8)(0f))
    assert(dec.decode("not an image".getBytes, "image/png").toSeq ==
      Seq.fill(8)(0f))
  }
}
