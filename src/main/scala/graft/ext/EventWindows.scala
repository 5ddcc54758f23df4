package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream windowing in batch form (the streaming forms live in
  * graft.streaming). Gap comparisons are done in integer MICROSECONDS
  * (`unix_micros`) — bit-exact, no floating-point epoch math.
  */
object EventWindows {

  /** Tumbling window aggregation; `width` e.g. "1 hour". */
  def tumbling(df: DataFrame, ts: Column, width: String, keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    df.groupBy((window(ts, width).getField("start").as("ws") +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding window aggregation; window() explodes each event into
    * width/slide windows. */
  def sliding(df: DataFrame, ts: Column, width: String, slide: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy((window(ts, width, slide).getField("start").as("ws") +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Batch sessionization: a session breaks when the gap to the previous
    * event of the same key exceeds `gap`. One shuffle on the key; the
    * lag/cumsum pair is two passes over the same partitioning (no extra
    * shuffle — same window spec). */
  def sessionize(df: DataFrame, ts: Column, keyCol: Column,
      gapMicros: Long, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(ts.asc, tieBreak.asc)
    val micros = unix_micros(ts)
    val newSession = when(
      lag(micros, 1).over(w).isNull ||
        micros - lag(micros, 1).over(w) > gapMicros, 1L).otherwise(0L)
    df.withColumn("__new", newSession)
      .withColumn("sid", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }
}
