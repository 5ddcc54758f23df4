package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state via flatMapGroupsWithState — for incremental
  * semantics the built-in windows can't express. The example operator is
  * a per-key running aggregate with change emission: it keeps
  * (count, sum, last event time) per key and emits an updated snapshot
  * whenever the key receives a batch of events. In production, pass
  * `stateTtl` so idle keys age out of the state store (bounded state at
  * scale); tests run without a timeout so `processAllAvailable` settles.
  */
object CustomState {

  case class KeyedEvent(key: Long, ts: java.sql.Timestamp, value: Double)
  case class KeyState(count: Long, sum: Double, lastTs: Long)
  case class KeySnapshot(key: Long, count: Long, sum: Double, mean: Double)

  def updateKey(stateTtl: Option[String])(key: Long,
      events: Iterator[KeyedEvent], state: GroupState[KeyState])
      : Iterator[KeySnapshot] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val prev = state.getOption.getOrElse(KeyState(0L, 0.0, Long.MinValue))
      // deterministic fold order within the batch
      val batch = events.toSeq.sortBy(e => (e.ts.getTime, e.value))
      val next = batch.foldLeft(prev) { (s, e) =>
        KeyState(s.count + 1, s.sum + e.value, math.max(s.lastTs, e.ts.getTime))
      }
      state.update(next)
      stateTtl.foreach(state.setTimeoutDuration)
      Iterator.single(
        KeySnapshot(key, next.count, next.sum, next.sum / next.count))
    }
  }

  /** Wire the stateful operator onto a stream of [[KeyedEvent]]. */
  def runningAggregates(events: Dataset[KeyedEvent],
      stateTtl: Option[String] = None): Dataset[KeySnapshot] = {
    implicit val stateEnc = Encoders.product[KeyState]
    implicit val outEnc = Encoders.product[KeySnapshot]
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(updateKey(stateTtl))
  }

  // ---- streaming funnel ----------------------------------------------

  case class FunnelEvent(key: Long, ts: java.sql.Timestamp, etype: String)
  /** Completed stage timestamps in MICROSECONDS (java.sql.Timestamp
    * getTime is millis — the nanos field carries the rest). */
  case class FunnelState(times: Seq[Long])
  case class FunnelSnapshot(key: Long, stage: Long, times: Seq[Long])

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** Streaming form of [[graft.ext.EventWindows.funnel]]: per-key stage
    * progression held as flatMapGroupsWithState state (one Long per
    * completed stage — bounded at |stages| forever), each batch folded
    * in event-time order, one updated snapshot emitted per touched
    * key. Stage n advances on the first stage-n event STRICTLY after
    * the stage-(n−1) time — the batch operator's semantics, and the
    * two agree exactly when events arrive in event-time order across
    * batches (the in-order ingestion contract; a late cross-batch
    * event cannot rewind an already-advanced stage, which is the
    * standard streaming-funnel tradeoff — StreamingSpec pins both the
    * agreement and the documented divergence). */
  def funnelStages(events: Dataset[FunnelEvent], stages: Seq[String],
      stateTtl: Option[String] = None): Dataset[FunnelSnapshot] = {
    require(stages.nonEmpty && stages.distinct == stages,
      s"stages must be non-empty and distinct, got $stages")
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[FunnelSnapshot]
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    def update(key: Long, evs: Iterator[FunnelEvent],
        state: GroupState[FunnelState]): Iterator[FunnelSnapshot] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        var times = state.getOption.map(_.times.toList).getOrElse(Nil)
        val batch = evs.toSeq.sortBy(e => (micros(e.ts), e.etype))
        for (e <- batch if times.length < stages.length) {
          val i = times.length
          if (e.etype == stages(i) &&
              (i == 0 || micros(e.ts) > times(i - 1)))
            times = times :+ micros(e.ts)
        }
        state.update(FunnelState(times))
        stateTtl.foreach(state.setTimeoutDuration)
        Iterator.single(FunnelSnapshot(key, times.length.toLong, times))
      }
    }
    events.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(update)
  }
}
