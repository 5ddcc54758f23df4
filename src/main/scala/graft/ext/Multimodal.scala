package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata. The Spark-side contract — schema, partition-friendly
  * batch iteration, deterministic output shape — is real; the actual
  * codec call is STUBBED (image/audio libraries are not available in this
  * environment) behind [[StubCodec]], a deterministic fake that derives
  * "features" from payload bytes.
  */
object Multimodal {

  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      digest: String, features: Array[Float])

  /** STUB decode: a real deployment would decode image/audio here (e.g.
    * via a JNI codec or `mapInArrow` into a Python worker). The fake is
    * deterministic in the payload bytes so tests are stable. */
  object StubCodec {
    def decodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        out(i % dim) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      out
    }
  }

  /** Batch feature extraction with per-partition iteration — the shape a
    * vectorized decode would take (one codec init per partition, streamed
    * batches, no driver collect). */
  def extractFeatures(ds: Dataset[MediaRecord], dim: Int)
      (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      // one codec/context init per partition would go here
      it.map { r =>
        val digest = java.security.MessageDigest.getInstance("SHA-256")
          .digest(r.payload).map("%02x".format(_)).mkString
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, digest,
          StubCodec.decodeFeatures(r.payload, dim))
      }
    }
  }

  /** Declarative metadata over a binary payload column — runs fully in
    * codegen, no stub needed. */
  def withPayloadMeta(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(payloadCol)).cast("long"))
      .withColumn("digest", sha2(col(payloadCol), 256))
}
