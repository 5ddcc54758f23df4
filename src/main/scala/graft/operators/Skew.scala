package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys. First line of defense is AQE's skew-join
  * splitting (on in the driver sessions); for aggregations over keys with
  * pathological skew (a handful of symbols carrying most of a day's
  * options, one stopword-shingle posting list, …) this two-stage salted
  * aggregate bounds any single reducer's input to ~1/salt of the hot key.
  *
  * Usable for any algebraic aggregate (sum/count/min/max): partials are
  * computed per (key, salt) then merged per key — two small shuffles
  * instead of one skewed one.
  */
object Skew {

  /** Two-stage salted sum/count aggregation.
    *
    * @param aggs (inputColumn, partialAgg, mergeAgg, outName) — e.g.
    *             (col("v"), sum _, sum _, "sum_v").
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salt: Int,
      aggs: Seq[(Column, Column => Column, Column => Column, String)])
      : DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salt)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggs.head._2(aggs.head._1).as(s"__p0"),
        aggs.tail.zipWithIndex.map { case ((c, p, _, _), i) =>
          p(c).as(s"__p${i + 1}")
        }: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(aggs.head._3(col("__p0")).as(aggs.head._4),
        aggs.tail.zipWithIndex.map { case ((_, _, m, n), i) =>
          m(col(s"__p${i + 1}")).as(n)
        }: _*)
  }
}
