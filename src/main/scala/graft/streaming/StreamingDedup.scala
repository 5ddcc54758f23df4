package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ext.Dedup

/** Streaming near-duplicate detection: incremental MinHash+LSH.
  *
  * Each arriving document is banded with the SAME deterministic band keys
  * as the batch [[Dedup.minhashLsh]] ([[Dedup.bandKeys]] is stateless, so
  * it applies to a stream unchanged). A keyed state per (band, bucket)
  * remembers the first document that ever claimed the bucket; every later
  * document sharing it is emitted as a near-dup candidate against that
  * representative. Candidates are exactly the batch LSH candidate pairs,
  * discovered incrementally — verification (exact Jaccard against the
  * representative) stays a cheap downstream join because candidates are
  * rare.
  *
  * At scale: state is one long per occupied bucket (not per document),
  * sharded by the state-store partitioning on the bucket key; skewed
  * buckets cost emission volume, not state size.
  */
object StreamingDedup {

  case class BandKey(bucket: Long, docId: Long)
  case class Novelty(docId: Long, bucket: Long, firstId: Long, isFirst: Boolean)

  /** Per-bucket first-seen tracker. Within a batch, documents are folded
    * in ascending id order (deterministic under shuffle). With a TTL,
    * idle buckets age out of the state store — dedup becomes windowed
    * (a doc is only compared against buckets seen within the TTL), the
    * standard bounded-state trade for an unbounded stream. */
  private def trackBucket(stateTtl: Option[String])(bucket: Long,
      rows: Iterator[BandKey], state: GroupState[Long]): Iterator[Novelty] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    var first: Option[Long] = state.getOption
    val out = rows.toSeq.sortBy(_.docId).map { r =>
      first match {
        case None =>
          first = Some(r.docId)
          Novelty(r.docId, bucket, r.docId, isFirst = true)
        case Some(f) =>
          Novelty(r.docId, bucket, f, isFirst = f == r.docId)
      }
    }
    first.foreach(state.update)
    stateTtl.foreach(state.setTimeoutDuration)
    out.iterator
  }

  /** Stream of (bucket, docId) → per-(doc, bucket) novelty rows. */
  def bucketNovelty(banded: Dataset[BandKey],
      stateTtl: Option[String] = None): Dataset[Novelty] = {
    implicit val outEnc = Encoders.product[Novelty]
    implicit val stateEnc = Encoders.scalaLong
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded.groupByKey(_.bucket)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(trackBucket(stateTtl))
  }

  /** Wire a streaming (id, shingles) DataFrame through banding + the
    * stateful tracker. A document is a near-dup CANDIDATE iff any of its
    * rows has isFirst = false; group the sink output by docId to decide. */
  def nearDupNovelty(docs: DataFrame, idCol: String, shinglesCol: String,
      numHashes: Int = 32, bands: Int = 8,
      stateTtl: Option[String] = None): Dataset[Novelty] = {
    import docs.sparkSession.implicits._
    val banded = Dedup.bandKeys(docs, idCol, shinglesCol, numHashes, bands)
      // fold the band index into the state key, mirroring the batch join
      // on (band, bucket)
      .selectExpr("xxhash64(band, bucket) AS bucket", "id AS docId")
      .as[BandKey]
    bucketNovelty(banded, stateTtl)
  }
}
