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

  test("streaming funnel: in-order batches agree with the batch " +
      "operator; late cross-batch events cannot rewind (documented)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.CustomState.FunnelEvent
    val stages = Seq("view", "click", "purchase")
    val b1 = Seq(
      FunnelEvent(1L, ts("2024-01-01 00:00:00"), "view"),
      FunnelEvent(1L, ts("2024-01-01 00:01:00"), "click"),
      FunnelEvent(2L, ts("2024-01-01 00:00:00"), "view"))
    val b2 = Seq(
      FunnelEvent(1L, ts("2024-01-01 00:02:00"), "purchase"),
      FunnelEvent(2L, ts("2024-01-01 00:03:00"), "click"))
    val mem = MemoryStream[FunnelEvent]
    val q = CustomState.funnelStages(mem.toDS(), stages)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    // LAST snapshot per key is the converged state
    val streamed = spark.sql(
      """select key, stage from (
        |  select key, stage, row_number() over (
        |    partition by key order by stage desc) rn from funnel_out)
        |where rn = 1 order by key""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // batch operator over the union
    val all = (b1 ++ b2).map(e => (e.key, e.ts, e.etype))
      .toDF("user_id", "ts", "event_type")
    val batch = graft.ext.EventWindows.funnel(all, col("ts"),
      col("user_id"), col("event_type"), stages)
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("stage"))).toSeq
    assert(streamed == batch && batch == Seq((1L, 3L), (2L, 2L)))
    // the documented divergence: a click arriving in a LATER batch but
    // with an EARLIER ts than an already-consumed purchase cannot
    // advance retroactively the way a batch recomputation would
    val mem2 = MemoryStream[FunnelEvent]
    val q2 = CustomState.funnelStages(mem2.toDS(), stages)
      .writeStream.format("memory").queryName("funnel_out2")
      .outputMode("append").start()
    mem2.addData(FunnelEvent(9L, ts("2024-01-01 00:00:00"), "view"))
    q2.processAllAvailable()
    // click LATE (ts before nothing — fine) then purchase in ts order
    mem2.addData(FunnelEvent(9L, ts("2024-01-01 00:05:00"), "purchase"))
    q2.processAllAvailable()
    mem2.addData(FunnelEvent(9L, ts("2024-01-01 00:02:00"), "click"))
    q2.processAllAvailable()
    q2.stop()
    val lastStage = spark.sql(
      "select max(stage) from funnel_out2").collect().head.getLong(0)
    // stream saw purchase before the out-of-order click: the click
    // lands t_2 = 00:02 but the purchase is NOT retried — stage 2
    assert(lastStage == 2L)
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
