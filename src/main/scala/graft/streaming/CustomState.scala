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
}
