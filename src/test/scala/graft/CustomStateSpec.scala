package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.CustomState
import graft.streaming.CustomState.KeyedEvent

/** flatMapGroupsWithState custom state and the typed top-k Aggregator. */
class CustomStateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("flatMapGroupsWithState keeps running per-key aggregates across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KeyedEvent]
    val out = CustomState.runningAggregates(mem.toDS())
    val q = out.writeStream.format("memory").queryName("state_out")
      .outputMode("append").start()
    mem.addData(
      KeyedEvent(1L, ts("2024-01-01 00:00:00"), 10.0),
      KeyedEvent(1L, ts("2024-01-01 00:01:00"), 20.0),
      KeyedEvent(2L, ts("2024-01-01 00:00:30"), 5.0))
    q.processAllAvailable()
    mem.addData(KeyedEvent(1L, ts("2024-01-01 00:05:00"), 30.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
      "select key, count, sum, mean from state_out order by key, count")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // batch 1: key1 snapshot (2, 30); key2 (1, 5); batch 2: key1 (3, 60)
    assert(rows == Seq((1L, 2L, 30.0), (1L, 3L, 60.0), (2L, 1L, 5.0)))
  }

  test("typed top-k aggregator agrees with the window form") {
    val rnd = new scala.util.Random(7)
    val data = (1 to 2000).map(i =>
      (rnd.nextInt(10), rnd.nextDouble(), i.toLong))
    val df = data.toDF("grp", "score", "id")
    // window form
    val w = org.apache.spark.sql.expressions.Window.partitionBy("grp")
      .orderBy(col("score").desc, col("id").asc)
    val windowed = df.withColumn("rn", row_number().over(w))
      .where($"rn" <= 5)
      .select("grp", "score", "id")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
      .sortBy(t => (t._1, -t._2, t._3)).toSeq
    // aggregator form
    val agg = new graft.ext.TopKAggregator(5).toColumn
    val aggregated = df.as[(Int, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg.name("topk"))
      .collect()
      .flatMap { case (g, items) => items.map(t => (g, t._1, t._2)) }
      .sortBy(t => (t._1, -t._2, t._3)).toSeq
    assert(aggregated == windowed && windowed.nonEmpty)
  }
}
