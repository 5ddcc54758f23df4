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
  * representative. The state key IS the (band, bucket) pair — not a
  * re-hash of it — so the candidate set is identical to the batch join
  * on (band, bucket) by construction, not just almost surely.
  * Verification (exact Jaccard against the representative) stays a cheap
  * downstream join because candidates are rare.
  *
  * At scale: state is one long per occupied bucket (not per document),
  * sharded by the state-store partitioning on the bucket key; skewed
  * buckets cost emission volume, not state size. Within a batch the
  * tracker buffers only the group's doc ids (8 bytes each, no sort) to
  * resolve the deterministic min-id owner before emitting.
  */
object StreamingDedup {

  case class BandKey(band: Int, bucket: Long, docId: Long)
  case class BucketKey(band: Int, bucket: Long)
  case class Novelty(docId: Long, band: Int, bucket: Long, firstId: Long,
    isFirst: Boolean)

  /** Per-bucket first-seen tracker. Within a batch the owner is the
    * smallest id in the group (deterministic under shuffle), found in one
    * bounded pass over the ids — the full rows are never materialized or
    * sorted. With a TTL, idle buckets age out of the state store — dedup
    * becomes windowed (a doc is only compared against buckets seen within
    * the TTL), the standard bounded-state trade for an unbounded stream. */
  private def trackBucket(stateTtl: Option[String])(key: BucketKey,
      rows: Iterator[BandKey], state: GroupState[Long]): Iterator[Novelty] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    var minId = Long.MaxValue
    rows.foreach { r =>
      ids += r.docId
      if (r.docId < minId) minId = r.docId
    }
    val owner = state.getOption.getOrElse(minId)
    if (ids.nonEmpty) {
      state.update(owner)
      stateTtl.foreach(state.setTimeoutDuration)
    }
    ids.iterator.map(id =>
      Novelty(id, key.band, key.bucket, owner, isFirst = id == owner))
  }

  /** Stream of (band, bucket, docId) → per-(doc, bucket) novelty rows. */
  def bucketNovelty(banded: Dataset[BandKey],
      stateTtl: Option[String] = None): Dataset[Novelty] = {
    implicit val outEnc = Encoders.product[Novelty]
    implicit val stateEnc = Encoders.scalaLong
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded.groupByKey(r => BucketKey(r.band, r.bucket))(
        Encoders.product[BucketKey])
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
      .selectExpr("CAST(band AS INT) AS band", "bucket", "id AS docId")
      .as[BandKey]
    bucketNovelty(banded, stateTtl)
  }
}
