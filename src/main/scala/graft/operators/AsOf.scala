package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the reference's correlated scalar subquery
  * "close at max(date) ≤ folder_date per symbol"
  * (reference: transform-load.2025-08-19.rkt:104-113).
  *
  * Spark-first design: instead of a correlated subquery (which Catalyst
  * decorrelates into join+agg+join), resolve the argmax with one window
  * pass. One shuffle on the key; ties broken deterministically — the
  * reference's fold keeps the first-encountered element on ties
  * (transform-load.2025-08-19.rkt:51-66), which we model with explicit
  * secondary sort keys.
  */
object AsOf {

  /** Latest row per key with `timeCol <= cutoff`. `tieBreak` columns are
    * sorted DESC after the time column, making the pick deterministic. */
  def latestPerKeyUpTo(df: DataFrame, keys: Seq[String], timeCol: Column,
      cutoff: Column, tieBreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((timeCol.desc +: tieBreak.map(_.desc)): _*)
    df.where(timeCol <= cutoff)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Generic as-of join: for every left row, attach the latest right row
    * with `rightTime <= leftTime` on equal `keys`. Right columns are
    * prefixed to avoid collisions. Implementation: equi-join on key +
    * range filter + windowed argmax per left row id.
    *
    * For a 100 TB left side with a small right side, pre-reduce the right
    * side per (key, leftTime) via [[latestPerKeyUpTo]] and broadcast
    * instead; this generic form shuffles both sides by `keys` once.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: Column, rightTime: Column, rightPrefix: String = "asof_")
      : DataFrame = {
    val rightRenamed = right.columns.foldLeft(right) { (acc, c) =>
      if (keys.contains(c)) acc else acc.withColumnRenamed(c, rightPrefix + c)
    }
    val withId = left.withColumn("__lid", monotonically_increasing_id())
    val joined = withId.join(rightRenamed, keys, "left")
      .where(rightTime.isNull || rightTime <= leftTime)
    val w = Window.partitionBy(col("__lid")).orderBy(rightTime.desc_nulls_last)
    joined.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn", "__lid")
  }
}
