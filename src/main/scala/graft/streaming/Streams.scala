package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-Streaming forms of the engine's incremental semantics
  * (SURVEY §2.8). These are plan transforms — they apply to a streaming
  * DataFrame (`spark.readStream…`) and are driven by `writeStream`; the
  * batch operators in graft.operators stay the source of truth for
  * semantics, and the specs assert the two agree.
  */
object Streams {

  /** Idempotent replay: PK dedup with state bounded by a watermark — the
    * streaming form of ON CONFLICT DO NOTHING (keep-first; reference:
    * transform-load.2025-08-19.rkt:209). Late duplicates beyond the
    * watermark age out of state; within it, re-delivery inserts nothing. */
  def dedupKeepFirst(stream: DataFrame, pk: Seq[String], tsCol: String,
      watermark: String): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicates(pk :+ tsCol)

  /** Tumbling event-time aggregation with watermark — the streaming form
    * of EventWindows.tumbling. */
  def tumblingCounts(stream: DataFrame, tsCol: String, width: String,
      watermark: String, keys: Seq[Column]): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .groupBy((window(col(tsCol), width).getField("start").as("ws") +: keys): _*)
      .agg(count(lit(1)).as("n"))

  /** Session windows with an inactivity gap — the streaming form of
    * EventWindows.sessionize, using the built-in session_window (state
    * managed by Spark, no custom flatMapGroupsWithState needed). */
  def sessionCounts(stream: DataFrame, tsCol: String, gap: String,
      watermark: String, keys: Seq[Column]): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .groupBy((session_window(col(tsCol), gap).as("w") +: keys): _*)
      .agg(count(lit(1)).as("n"))
      .select((col("w.start").as("session_start") +:
        col("w.end").as("session_end") +: keys) :+ col("n"): _*)
}
