package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata.
  *
  * Two tiers, honestly separated:
  *   - **Container metadata is REAL**: [[MediaCodec]] parses PNG IHDR,
  *     JPEG SOFn (segment scan), GIF logical-screen, and WAV `fmt `
  *     headers from the raw bytes — pure JVM, no media libraries,
  *     per-partition ([[decodeMeta]]). Malformed/truncated headers
  *     degrade to null fields, never throw: at 100 TB a corrupt blob is
  *     a quarantine row, not a job failure.
  *   - **Pixel/sample decode stays STUBBED** ([[StubCodec]]): the actual
  *     signal decode needs codec libraries this environment lacks; the
  *     per-partition batch shape a real decoder would take (one codec
  *     init per partition, streamed rows, no driver collect) is real
  *     and tested.
  */
object Multimodal {

  /** Parsed container header: `format` ∈ {png, jpeg, gif, wav, unknown};
    * images carry (width, height), audio (sample_rate, channels);
    * fields a format/payload does not determine stay None. */
  case class MediaMeta(format: String, width: Option[Int],
      height: Option[Int], sampleRate: Option[Int], channels: Option[Int])

  /** Pure-JVM magic-byte header parser. Byte-order per spec: PNG/JPEG
    * are big-endian, GIF/WAV little-endian. Never throws on arbitrary
    * bytes — anything unrecognized or truncated is ("unknown"/nulls) or
    * (matched format, null dims). */
  object MediaCodec {

    def parseHeader(b: Array[Byte]): MediaMeta = {
      def u8(i: Int) = b(i) & 0xFF
      def u16be(i: Int) = (u8(i) << 8) | u8(i + 1)
      def u32be(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) |
        (u8(i + 2) << 8) | u8(i + 3)
      def u16le(i: Int) = u8(i) | (u8(i + 1) << 8)
      def u32le(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
        (u8(i + 3) << 24)
      def ascii(i: Int, n: Int) = new String(b, i, n, "US-ASCII")
      val n = b.length

      def none(fmt: String) = MediaMeta(fmt, None, None, None, None)

      // PNG: 8-byte signature, then the IHDR chunk (length, "IHDR",
      // width u32be, height u32be, ...)
      val pngSig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      if (n >= 8 && (0 until 8).forall(i => u8(i) == pngSig(i))) {
        if (n >= 24 && ascii(12, 4) == "IHDR")
          MediaMeta("png", Some(u32be(16)), Some(u32be(20)), None, None)
        else none("png")
      }
      // JPEG: SOI, then a segment scan to the first SOFn frame header
      // (FF Cn, length, precision u8, height u16be, width u16be)
      else if (n >= 2 && u8(0) == 0xFF && u8(1) == 0xD8) {
        val sof = Set(0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
          0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
        var p = 2
        var out: MediaMeta = none("jpeg")
        var done = false
        while (!done && p + 1 < n) {
          if (u8(p) != 0xFF) done = true // desynced: stop, keep nulls
          else {
            var q = p + 1
            while (q < n && u8(q) == 0xFF) q += 1 // fill bytes
            if (q >= n) done = true
            else {
              val marker = u8(q)
              if (sof.contains(marker)) {
                // dimensions end at byte q+7, so q+8 == n is still valid
                if (q + 8 <= n)
                  out = MediaMeta("jpeg", Some(u16be(q + 6)),
                    Some(u16be(q + 4)), None, None)
                done = true
              } else if (marker == 0xD9 || marker == 0xDA) done = true
              else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7))
                p = q + 1 // standalone marker, no length field
              else if (q + 2 < n) {
                val len = u16be(q + 1)
                if (len < 2) done = true else p = q + 1 + len
              } else done = true
            }
          }
        }
        out
      }
      // GIF: "GIF87a"/"GIF89a", then logical screen width/height u16le
      else if (n >= 6 && ascii(0, 3) == "GIF" &&
          (ascii(3, 3) == "87a" || ascii(3, 3) == "89a")) {
        if (n >= 10) MediaMeta("gif", Some(u16le(6)), Some(u16le(8)),
          None, None)
        else none("gif")
      }
      // WAV: RIFF/WAVE container, then a chunk scan to "fmt " (channels
      // u16le at data+2, sample rate u32le at data+4); chunks are
      // word-aligned
      else if (n >= 12 && ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE") {
        var p = 12
        var out: MediaMeta = none("wav")
        var done = false
        while (!done && p + 8 <= n) {
          val id = ascii(p, 4)
          val sz = u32le(p + 4)
          if (id == "fmt " && p + 16 <= n) {
            out = MediaMeta("wav", None, None, Some(u32le(p + 12)),
              Some(u16le(p + 10)))
            done = true
          } else if (sz < 0) done = true // >2 GiB chunk claim: malformed
          else p += 8 + sz + (sz & 1)
        }
        out
      }
      else none("unknown")
    }
  }

  /** One parsed-header row per input row — the x56 query/oracle shape. */
  case class MediaMetaRow(media_id: Long, format: String,
      width: Option[Int], height: Option[Int], sample_rate: Option[Int],
      channels: Option[Int])

  /** Distributed header parse of a binary column: per-partition
    * iteration (the same shape as [[extractFeatures]] — byte-level
    * parsing cannot stay in codegen, so it exits whole-stage once and
    * does all four formats in that single pass). Null payloads parse as
    * "unknown". */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val m = MediaCodec.parseHeader(
            if (payload == null) Array.emptyByteArray else payload)
          MediaMetaRow(id, m.format, m.width, m.height, m.sampleRate,
            m.channels)
        }
      }
      .toDF()
  }

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

  /** Deterministic uniform FRAME-SAMPLING plan — the Spark-side half
    * of video ingestion: given each clip's frame count (from
    * [[decodeMeta]]-style header metadata), emit WHICH frames the
    * decode stage should touch, k spread uniformly: frame_idx(j) =
    * ⌊j·n/k⌋ for j = 0..k−1 (strictly increasing when n > k, so
    * always k distinct frames), or every frame when n ≤ k. The plan
    * is pure integer arithmetic over metadata — no payload is read,
    * so a 100 TB video corpus plans its decode from a few GB of
    * header rows, and the expensive stage touches exactly the planned
    * (id, frame_idx) set. Clips with n ≤ 0 emit no rows.
    * Output: (id, sample_ord, frame_idx), fully codegen. */
  def frameSamplePlan(df: DataFrame, idCol: String, nFrames: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"frameSamplePlan: k=$k must be >= 1")
    df.select(col(idCol).as("id"), nFrames.cast("long").as("__n"))
      .where(col("__n") > 0)
      .select(col("id"), col("__n"),
        explode(sequence(lit(0L), least(col("__n"), lit(k.toLong)) - 1))
          .as("sample_ord"))
      .select(col("id"), col("sample_ord"),
        when(col("__n") <= k, col("sample_ord"))
          .otherwise(expr(s"(sample_ord * __n) DIV $k"))
          .as("frame_idx"))
  }
}
