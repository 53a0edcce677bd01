package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata; decode / feature
  * extraction runs batch-wise in `mapPartitions` (the Scala analog of
  * a vectorized pandas UDF — one JVM call per partition, not per row).
  *
  * The actual media decode is STUBBED (no image/audio libraries in
  * this environment): [[FakeDecoder]] is a deterministic stand-in that
  * derives a fixed-size feature vector from payload bytes. The
  * Spark-side contract — schema, partition sizing, batch iteration,
  * null handling — is real and tested; swap [[Decoder]]
  * implementations to plug a real codec.
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

  /** Deterministic stub: byte-histogram-derived features. A real
    * implementation would decode pixels/samples here. */
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
