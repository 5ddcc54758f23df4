package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Space-saving heavy hitters (Metwally et al.'s stream-summary, in its
  * mergeable form): at most `capacity` counters per partial buffer, so
  * the shuffle carries one bounded summary per (partition, group)
  * regardless of how many distinct tokens a 100 TB corpus holds — the
  * scale path next to the exact explode→groupBy top-k (x29), whose
  * shuffle is every distinct token.
  *
  * Guarantees (asserted in ExtSpec):
  *  - every estimate OVER-counts: true ≤ est ≤ true + err, err ≤ N/m;
  *  - any token with true count > N/m is present in the summary;
  *  - when distinct tokens < capacity the summary IS the exact counts.
  *
  * Merge follows the mergeable-summaries construction: a key missing
  * from one side is charged that side's minimum counter (its maximum
  * possible undercount there), then the union is re-truncated to the
  * top `capacity` by (count desc, token asc) — deterministic, so results
  * are stable across partitionings of the same multiset.
  */
class SpaceSavingAggregator(capacity: Int)
    extends Aggregator[String, Map[String, (Long, Long)],
      Seq[(String, Long, Long)]] {
  require(capacity > 0, "capacity must be positive")

  override def zero: Map[String, (Long, Long)] = Map.empty

  override def reduce(buf: Map[String, (Long, Long)], tok: String)
      : Map[String, (Long, Long)] =
    buf.get(tok) match {
      case Some((c, e)) => buf.updated(tok, (c + 1, e))
      case None if buf.size < capacity => buf.updated(tok, (1L, 0L))
      case None =>
        // evict the (count, token)-minimal entry; the newcomer inherits
        // its count as upper bound and as error
        val (victim, (minC, _)) = buf.minBy { case (t, (c, _)) => (c, t) }
        (buf - victim).updated(tok, (minC + 1, minC))
    }

  override def merge(a: Map[String, (Long, Long)], b: Map[String, (Long, Long)])
      : Map[String, (Long, Long)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val minA = if (a.size >= capacity) a.valuesIterator.map(_._1).min else 0L
    val minB = if (b.size >= capacity) b.valuesIterator.map(_._1).min else 0L
    val merged = (a.keySet ++ b.keySet).iterator.map { k =>
      val (ca, ea) = a.getOrElse(k, (minA, minA))
      val (cb, eb) = b.getOrElse(k, (minB, minB))
      k -> (ca + cb, ea + eb)
    }.toSeq
    merged.sortBy { case (t, (c, _)) => (-c, t) }.take(capacity).toMap
  }

  override def finish(buf: Map[String, (Long, Long)]): Seq[(String, Long, Long)] =
    buf.toSeq.map { case (t, (c, e)) => (t, c, e) }
      .sortBy { case (t, c, _) => (-c, t) }

  override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
    Encoders.kryo[Map[String, (Long, Long)]]

  override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    Encoders.kryo[Seq[(String, Long, Long)]]
}
