package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental stratified sampling — the streaming admission form of
  * [[graft.ext.Sampling.stratifiedSample]]: maintain, per stratum, the
  * k smallest-(hash, id) documents as the corpus streams in. Because
  * the sample is a pure ORDER STATISTIC of the deterministic hash (not
  * a probabilistic reservoir), the maintained sample after any prefix
  * of the stream equals the batch operator run on that prefix — the
  * spec asserts exactly that after every micro-batch.
  *
  * State per stratum is a sorted buffer of at most k (hash, id) pairs —
  * bounded regardless of stream length, the only admissible state shape
  * for an unbounded corpus. Each emission carries `version` (batches
  * seen for that stratum) so readers of an append-mode sink can select
  * the latest snapshot per stratum.
  */
object StreamingSample {

  case class Doc(stratum: String, id: Long)
  case class SampleState(version: Long, entries: Seq[(Long, Long)])
  case class SampleRow(stratum: String, version: Long, id: Long,
      sample_rank: Long)

  private def h(id: Long): Long = {
    val p = graft.ext.Sampling.HashPrime
    val hv = ((id % p) * graft.ext.Sampling.HashMult) % p
    if (hv < 0) hv + p else hv
  }

  def update(k: Int)(stratum: String, docs: Iterator[Doc],
      state: GroupState[SampleState]): Iterator[SampleRow] = {
    val prev = state.getOption.getOrElse(SampleState(0L, Nil))
    val merged = (prev.entries ++ docs.map(d => (h(d.id), d.id)))
      .distinct.sorted.take(k)
    val next = SampleState(prev.version + 1, merged)
    state.update(next)
    merged.iterator.zipWithIndex.map { case ((_, id), i) =>
      SampleRow(stratum, next.version, id, i + 1L)
    }
  }

  /** Wire the bounded-state sampler onto a stream of [[Doc]]s. */
  def run(docs: Dataset[Doc], k: Int): Dataset[SampleRow] = {
    implicit val outEnc = Encoders.product[SampleRow]
    implicit val stateEnc = Encoders.product[SampleState]
    docs.groupByKey(_.stratum)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update(k))
  }
}
