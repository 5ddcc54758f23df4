package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams

case class Ev(pk: Long, ts: java.sql.Timestamp, v: String)
case class DiffRow(pk: Long, change: String, old_v: String, new_v: String)
case class QV(vec_id: Long, embedding: Array[Float])
case class TDoc(doc_id: Long, text: String)
case class TSrc(id: Long, src: String, w: Long)
case class GV(g: String, v: String)
case class CohV(cohort: Long, v: Double)
case class REv(user_id: Long, ts: java.sql.Timestamp, value: Double)
case class DocT(doc_id: Long, n_tokens: Long, text: String)
case class SCU(stratum: String, cohort: Long, ok: Boolean)
case class VY(v: Long, y: Boolean)
case class GVY(g: String, v: Long, y: Boolean)
case class RatersAB(a: Boolean, b: Boolean)

/** Streaming forms agree with the batch operators: replayed duplicates
  * insert nothing (A5 in streaming terms), windowed counts match the
  * batch tumbling aggregation, session windows match sessionize. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
  }

  test("streaming dedup: re-delivered PKs add no rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, ts("2024-01-01 00:00:00"), "a"),
      Ev(1, ts("2024-01-01 00:00:00"), "a-dup"),
      Ev(2, ts("2024-01-01 00:01:00"), "b"))
    val out = Streams.dedupKeepFirst(mem.toDF(), Seq("pk"), "ts", "10 minutes")
    runToMemory(out, "dedup_out", "append")
    // replay the same keys in a later batch
    mem.addData(Ev(1, ts("2024-01-01 00:00:00"), "a-replay"))
    val q2 = out.writeStream.format("memory").queryName("dedup_out2")
      .outputMode("append").start()
    q2.processAllAvailable(); q2.stop()
    val n = spark.sql("select distinct pk from dedup_out").count()
    assert(n == 2)
  }

  test("keepFirstSink: stream-loaded table equals batch keepFirst") {
    implicit val sqlCtx = spark.sqlContext
    val evs1 = Seq(
      Ev(1, ts("2024-01-01 00:00:00"), "a"),
      Ev(1, ts("2024-01-01 00:00:01"), "a-later"),
      Ev(2, ts("2024-01-01 00:01:00"), "b"))
    val evs2 = Seq(
      Ev(1, ts("2024-01-01 00:00:02"), "a-replay"), // conflict → DO NOTHING
      Ev(3, ts("2024-01-01 00:02:00"), "c"))
    val dir = java.nio.file.Files.createTempDirectory("graft_sink")
    val table = dir.resolve("table").toString
    val ckpt = dir.resolve("ckpt").toString
    val mem = MemoryStream[Ev]
    mem.addData(evs1: _*)
    val q = Streams.keepFirstSink(mem.toDF(), Seq("pk"), Seq(col("ts")),
      table, ckpt)
    q.processAllAvailable()
    mem.addData(evs2: _*) // second micro-batch, cross-batch conflicts
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(table)
      .collect().map(r => (r.getAs[Long]("pk"), r.getAs[String]("v"))).toSet
    val batch = graft.operators.Upsert
      .keepFirst((evs1 ++ evs2).toDF(), Seq("pk"), Seq(col("ts")))
      .collect().map(r => (r.getAs[Long]("pk"), r.getAs[String]("v"))).toSet
    assert(got == batch)
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("dedupWithinWatermark drops re-stamped duplicates dedupKeepFirst keeps") {
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      Ev(1, ts("2024-01-01 00:00:00"), "a"),
      Ev(1, ts("2024-01-01 00:00:03"), "a-restamped"), // retry, new ts
      Ev(2, ts("2024-01-01 00:01:00"), "b"))
    val mem = MemoryStream[Ev]
    mem.addData(evs: _*)
    runToMemory(Streams.dedupWithinWatermark(mem.toDF(), Seq("pk"), "ts",
      "10 minutes"), "wwm_out", "append")
    val got = spark.sql("select pk, v from wwm_out")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b"))) // first arrival wins per PK
    // the pk+ts-keyed form sees the re-stamped retry as a distinct row
    val mem2 = MemoryStream[Ev]
    mem2.addData(evs: _*)
    runToMemory(Streams.dedupKeepFirst(mem2.toDF(), Seq("pk"), "ts",
      "10 minutes"), "wwm_out2", "append")
    assert(spark.sql("select * from wwm_out2").count() == 3)
  }

  test("lastWinsSink: log view equals batch lastWins, compaction is lossless") {
    implicit val sqlCtx = spark.sqlContext
    val evs1 = Seq(
      Ev(1, ts("2024-01-01 00:00:00"), "a-v1"),
      Ev(1, ts("2024-01-01 00:00:05"), "a-v2"), // within-batch update
      Ev(2, ts("2024-01-01 00:01:00"), "b-v1"))
    val evs2 = Seq(
      Ev(1, ts("2024-01-01 00:00:01"), "a-v3"), // later batch wins despite older ts
      Ev(3, ts("2024-01-01 00:02:00"), "c-v1"))
    val evs3 = Seq(Ev(2, ts("2024-01-01 00:03:00"), "b-v2"))
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc")
    val table = dir.resolve("log").toString
    val ckpt = dir.resolve("ckpt").toString
    val mem = MemoryStream[Ev]
    mem.addData(evs1: _*)
    val q = Streams.lastWinsSink(mem.toDF(), table, ckpt)
    q.processAllAvailable()
    mem.addData(evs2: _*)
    q.processAllAvailable()
    def state(): Set[(Long, String)] =
      Streams.latestView(spark, table, Seq("pk"), Seq(col("ts")))
        .collect().map(r => (r.getAs[Long]("pk"), r.getAs[String]("v"))).toSet
    assert(state() == Set((1L, "a-v3"), (2L, "b-v1"), (3L, "c-v1")))
    // time travel: the state as of batch 0 ignores batch 1's rows
    val asOf0 = Streams.viewAsOf(spark, table, Seq("pk"), Seq(col("ts")), 0L)
      .collect().map(r => (r.getAs[Long]("pk"), r.getAs[String]("v"))).toSet
    assert(asOf0 == Set((1L, "a-v2"), (2L, "b-v1")))
    // and as-of the latest batch it IS the latest view
    val asOf1 = Streams.viewAsOf(spark, table, Seq("pk"), Seq(col("ts")), 1L)
      .collect().map(r => (r.getAs[Long]("pk"), r.getAs[String]("v"))).toSet
    assert(asOf1 == state())
    // log holds every version; the view is one row per key
    assert(spark.read.parquet(table).count() == 5)
    Streams.compactLog(spark, table, Seq("pk"), Seq(col("ts")))
    assert(spark.read.parquet(table).count() == 3) // folded to latest
    assert(state() == Set((1L, "a-v3"), (2L, "b-v1"), (3L, "c-v1")))
    // appends after compaction still order after compacted rows
    mem.addData(evs3: _*)
    q.processAllAvailable()
    q.stop()
    assert(state() == Set((1L, "a-v3"), (2L, "b-v2"), (3L, "c-v1")))
  }

  test("additiveSink: folded view equals batch aggregate through compaction") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(Ev(10, ts("2024-01-01 00:00:00"), "a"),
      Ev(5, ts("2024-01-01 00:00:01"), "a"),
      Ev(7, ts("2024-01-01 00:01:00"), "b"))
    val b2 = Seq(Ev(3, ts("2024-01-01 00:02:00"), "a"),
      Ev(2, ts("2024-01-01 00:03:00"), "c"))
    val b3 = Seq(Ev(1, ts("2024-01-01 00:04:00"), "b"))
    val dir = java.nio.file.Files.createTempDirectory("graft_mv")
    val table = dir.resolve("log").toString
    val ckpt = dir.resolve("ckpt").toString
    val mem = MemoryStream[Ev]
    mem.addData(b1: _*)
    val q = Streams.additiveSink(mem.toDF(), Seq("v"), col("pk"), table, ckpt)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    def state(): Map[String, (Double, Long)] =
      Streams.sumView(spark, table, Seq("v")).collect()
        .map(r => r.getAs[String]("v") ->
          (r.getAs[Double]("total"), r.getAs[Long]("n"))).toMap
    val expected = Map("a" -> (18.0, 3L), "b" -> (7.0, 1L), "c" -> (2.0, 1L))
    assert(state() == expected)
    assert(spark.read.parquet(table).count() == 4) // partials: a,b + a,c
    Streams.compactAdditive(spark, table, Seq("v"))
    assert(spark.read.parquet(table).count() == 3)
    assert(state() == expected)
    mem.addData(b3: _*) // appends after compaction still fold correctly
    q.processAllAvailable()
    q.stop()
    assert(state() == expected.updated("b", (8.0, 2L)))
  }

  test("hllSink: streamed register view equals the batch sketch; " +
      "replayed values are free under the MAX monoid") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = (1 to 400).map(i => GV("s", s"tok$i"))
    val b2 = (300 to 700).map(i => GV("s", s"tok$i")) // 300-400 replayed
    val dir = java.nio.file.Files.createTempDirectory("graft_hll")
    val table = dir.resolve("log").toString
    val mem = MemoryStream[GV]
    mem.addData(b1: _*)
    val q = Streams.hllSink(mem.toDF(), "g", col("v"), table,
      dir.resolve("ckpt").toString)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val everything = (b1 ++ b2).toDF("g", "v")
    // the streamed view's registers fold to EXACTLY the batch sketch
    val streamed = Streams.hllView(spark, table).collect().head
    val batch = graft.ext.DistinctSketch.hllEstimate(
      graft.ext.DistinctSketch.hllRegisters(everything, "g", col("v")), 8)
      .collect().head
    assert(streamed == batch)
    // and the estimate is the one the batch sketch gives for 700 truth
    assert(streamed.getAs[Double]("hll_est") ==
      batch.getAs[Double]("hll_est"))
  }

  test("kmvSink: view over per-batch k-minima equals the batch sketch " +
      "over everything ingested") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = (1 to 400).map(i => GV("s", s"kv$i"))
    val b2 = (300 to 900).map(i => GV("s", s"kv$i"))
    val dir = java.nio.file.Files.createTempDirectory("graft_kmv")
    val table = dir.resolve("log").toString
    val mem = MemoryStream[GV]
    mem.addData(b1: _*)
    val q = Streams.kmvSink(mem.toDF(), "g", col("v"), table,
      dir.resolve("ckpt").toString, k = 32)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = Streams.kmvView(spark, table, k = 32).collect().head
    val batchDh = graft.ext.DistinctSketch.kmvPartial(
      (b1 ++ b2).toDF("g", "v"), "g", col("v"), k = Int.MaxValue - 1)
    val batch = graft.ext.DistinctSketch.kmvEstimate(batchDh, 32)
      .collect().head
    assert(streamed.getAs[Long]("kth_hash") == batch.getAs[Long]("kth_hash"))
    assert(streamed.getAs[Double]("kmv_est") == batch.getAs[Double]("kmv_est"))
    // ledger stays bounded: at most k rows per (group, batch)
    assert(spark.read.parquet(table).count() <= 2 * 32)
  }

  test("centroidDriftSink: folded shard-sum ledger is bit-equal to the " +
      "batch centroid drift") {
    implicit val sqlCtx = spark.sqlContext
    def vec(id: Long) = QV(id, Array(id * 0.25f, 1.0f - id * 0.125f, 0.5f))
    val b1 = (0L until 40L).map(vec)
    val b2 = (40L until 100L).map(vec)
    val dir = java.nio.file.Files.createTempDirectory("graft_cds")
    val table = dir.resolve("log").toString
    val mem = MemoryStream[QV]
    mem.addData(b1: _*)
    val q = Streams.centroidDriftSink(mem.toDF(), "vec_id", "embedding",
      shards = 4, table, dir.resolve("ckpt").toString)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = Streams.centroidDriftView(spark, table)
      .orderBy("shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val batch = graft.ext.Similarity.centroidShardDrift(
        (b1 ++ b2).toDF(), "vec_id", "embedding", shards = 4)
      .orderBy("shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed == batch) // exact decimal partials: BIT-equal drift
    // ledger is per-(batch, shard, dim) partials — bounded, mergeable
    assert(spark.read.parquet(table).count() == 2 * 4 * 3)
  }

  test("shardedExportSink: per-batch prefix-sum shards, disk-derived " +
      "manifest matches the batch packing") {
    implicit val sqlCtx = spark.sqlContext
    def doc(i: Long, nt: Long) = DocT(i, nt, s"doc $i")
    val b1 = Seq(doc(1, 500), doc(2, 400), doc(3, 300), doc(4, 900))
    val b2 = Seq(doc(5, 1200), doc(6, 100))
    val dir = java.nio.file.Files.createTempDirectory("graft_sexp")
    val out = dir.resolve("shards").toString
    val mem = MemoryStream[DocT]
    mem.addData(b1: _*)
    val q = Streams.shardedExportSink(mem.toDF(), "doc_id", "n_tokens",
      "text", shardTokens = 1000L, out, dir.resolve("ckpt").toString)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val man = rows(Streams.shardedExportManifest(spark, out, "doc_id",
      "n_tokens"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // batch 0: cum_prev 0,500,900 -> shard 0 (docs 1-3, 1200 tok);
    //          cum_prev 1200 -> shard 1 (doc 4)
    // batch 1: cum_prev 0 -> shard 0 (doc 5); cum_prev 1200 -> shard 1
    assert(man == Seq(
      (0L, 0L, 3L, 1200L, 1L, 3L),
      (0L, 1L, 1L, 900L, 4L, 4L),
      (1L, 0L, 1L, 1200L, 5L, 5L),
      (1L, 1L, 1L, 100L, 6L, 6L)))
    // every row round-trips with its text intact
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    // partition columns ride along on read — project them away
    val back = spark.read.schema(schema).json(out)
      .select($"doc_id", $"text")
    assert(rows(back.orderBy("doc_id")).map(_.toString) ==
      (b1 ++ b2).sortBy(_.doc_id)
        .map(d => s"[${d.doc_id},doc ${d.doc_id}]"))
  }

  test("ksDriftView: additive (g, v) ledger + KS tail equals the " +
      "batch ksDrift") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(1L, 1L, 2L, 3L).map(v => GV("a", v.toString)) ++
      Seq(3L, 3L).map(v => GV("b", v.toString))
    val b2 = Seq(4L, 4L).map(v => GV("b", v.toString))
    val dir = java.nio.file.Files.createTempDirectory("graft_ksd")
    val table = dir.resolve("log").toString
    val mem = MemoryStream[GV]
    mem.addData(b1: _*)
    val q = Streams.additiveSink(mem.toDF(), Seq("g", "v"), lit(1L),
      table, dir.resolve("ckpt").toString)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = rows(Streams.ksDriftView(spark, table)
      .orderBy("group")).map(_.toString)
    val batch = rows(graft.ext.Stats.ksDrift(
        (b1 ++ b2).toDF("g", "v"), $"g", $"v").orderBy("group"))
      .map(_.toString)
    assert(streamed == batch && streamed.size == 2)
    // quantile normalization rides the SAME (g, v) ledger (the sixth
    // view on the distribution ledger)
    assert(rows(Streams.quantileNormalizeView(spark, table)
        .orderBy("group", "v")).map(_.toString) ==
      rows(graft.ext.Quantiles.quantileNormalize(
        (b1 ++ b2).toDF("g", "v"), $"g", $"v").orderBy("group", "v"))
        .map(_.toString))
  }

  test("ksMatrixView: the same additive (g, v) ledger folds to the " +
      "batch ksMatrix") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(1L, 1L, 2L, 3L).map(v => GV("a", v.toString)) ++
      Seq(3L, 3L).map(v => GV("b", v.toString))
    val b2 = Seq(4L, 4L).map(v => GV("b", v.toString)) ++
      Seq(1L, 4L).map(v => GV("c", v.toString))
    val dir = java.nio.file.Files.createTempDirectory("graft_ksm")
    val table = dir.resolve("log").toString
    val mem = MemoryStream[GV]
    mem.addData(b1: _*)
    val q = Streams.additiveSink(mem.toDF(), Seq("g", "v"), lit(1L),
      table, dir.resolve("ckpt").toString)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = rows(Streams.ksMatrixView(spark, table)
      .orderBy("src_a", "src_b")).map(_.toString)
    val batch = rows(graft.ext.Stats.ksMatrix(
        (b1 ++ b2).toDF("g", "v"), $"g", $"v").orderBy("src_a", "src_b"))
      .map(_.toString)
    assert(streamed == batch && streamed.size == 3)
  }

  test("psiView: the same additive (g, v) ledger folds to the batch " +
      "psi, incl. a bin one group never hits") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(1L, 1L, 2L, 3L).map(v => GV("a", v.toString)) ++
      Seq(3L, 3L).map(v => GV("b", v.toString))
    val b2 = Seq(1L, 3L).map(v => GV("b", v.toString))
    val dir = java.nio.file.Files.createTempDirectory("graft_psiv")
    val table = dir.resolve("log").toString
    val mem = MemoryStream[GV]
    mem.addData(b1: _*)
    val q = Streams.additiveSink(mem.toDF(), Seq("g", "v"), lit(1L),
      table, dir.resolve("ckpt").toString)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = rows(Streams.psiView(spark, table)
      .orderBy("group")).map(_.toString)
    val batch = rows(graft.ext.Stats.psi(
        (b1 ++ b2).toDF("g", "v"), $"g", $"v").orderBy("group"))
      .map(_.toString)
    assert(streamed == batch && streamed.size == 2)
  }

  test("cusumView: the additive (g, v=period) ledger folds to the " +
      "batch cusum across batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = (Seq.fill(5)("1") ++ Seq.fill(5)("2") ++ Seq.fill(2)("3"))
      .map(p => GV("g", p))
    val b2 = (Seq.fill(3)("3") ++ Seq.fill(9)("4")).map(p => GV("g", p))
    val dir = java.nio.file.Files.createTempDirectory("graft_cusum")
    val table = dir.resolve("log").toString
    val mem = MemoryStream[GV]
    mem.addData(b1: _*)
    val q = Streams.additiveSink(mem.toDF(), Seq("g", "v"), lit(1L),
      table, dir.resolve("ckpt").toString)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = rows(Streams.cusumView(spark, table, 0L, 2000000L)
      .orderBy("period")).map(_.toString)
    val batch = rows(graft.ext.Stats.cusumFromCounts(
        (b1 ++ b2).groupBy(identity).map { case (gv, xs) =>
          (gv.g, gv.v, xs.size.toLong) }.toSeq.toDF("g", "p", "c"),
        0L, 2000000L).orderBy("period")).map(_.toString)
    assert(streamed == batch && streamed.size == 4)
    // period 3 spans both batches (2 + 3 events) — the fold must see 5
    assert(rows(Streams.cusumView(spark, table, 0L, 2000000L)
      .where($"period" === "3")).head.getAs[Long]("c") == 5L)
  }

  test("jsdMatrixView: the additive (g, v=token) ledger folds to the " +
      "batch jsdMatrix, incl. a disjoint-vocab pair") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(GV("a", "cat"), GV("a", "dog"), GV("b", "cat"),
      GV("c", "eel"))
    val b2 = Seq(GV("a", "cat"), GV("b", "dog"), GV("c", "fish"))
    val dir = java.nio.file.Files.createTempDirectory("graft_jsdv")
    val table = dir.resolve("log").toString
    val mem = MemoryStream[GV]
    mem.addData(b1: _*)
    val q = Streams.additiveSink(mem.toDF(), Seq("g", "v"), lit(1L),
      table, dir.resolve("ckpt").toString)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = rows(Streams.jsdMatrixView(spark, table)
      .orderBy("src_a", "src_b")).map(_.toString)
    val batch = rows(graft.ext.TextAnalysis.jsdMatrixFromCounts(
        (b1 ++ b2).groupBy(identity).map { case (gv, xs) =>
          (gv.g, gv.v, xs.size.toLong) }.toSeq.toDF("g", "tok", "c"))
      .orderBy("src_a", "src_b")).map(_.toString)
    assert(streamed == batch && streamed.size == 3)
    // c shares nothing with a or b → exactly ln 2 (quantized)
    val ac = rows(Streams.jsdMatrixView(spark, table)
      .where($"src_a" === "a" && $"src_b" === "c")).head
    assert(math.abs(ac.getAs[Double]("jsd") - math.log(2.0)) < 1e-9)
  }

  test("pcaMomentsSink + topComponentView: folded covariance partials " +
      "equal the batch topComponent across batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(QV(1L, Array(3.0f, 4.0f)), QV(2L, Array(6.0f, 8.0f)))
    val b2 = Seq(QV(3L, Array(-3.0f, -4.0f)), QV(4L, Array(0.5f, 1.0f)))
    val dir = java.nio.file.Files.createTempDirectory("graft_pcam")
    val table = dir.resolve("log").toString
    val mem = MemoryStream[QV]
    mem.addData(b1: _*)
    val q = Streams.pcaMomentsSink(mem.toDF(), "vec_id", "embedding",
      table, dir.resolve("ckpt").toString)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = rows(Streams.topComponentView(spark, table)
      .orderBy("dim")).map(_.toString)
    val batch = rows(graft.ext.Pca.topComponent(
        (b1 ++ b2).toDF("vec_id", "embedding"), "vec_id", "embedding")
      .orderBy("dim")).map(_.toString)
    assert(streamed == batch && streamed.size == 2)
  }

  test("abMomentsSink + welchView: folded moment partials equal the " +
      "batch welchT across batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(CohV(0L, 1.25), CohV(0L, 3.5), CohV(1L, 2.0),
      CohV(1L, 6.75))
    val b2 = Seq(CohV(0L, 2.25), CohV(1L, 10.0), CohV(1L, 4.5))
    val dir = java.nio.file.Files.createTempDirectory("graft_welch")
    val table = dir.resolve("log").toString
    val mem = MemoryStream[CohV]
    mem.addData(b1: _*)
    val q = Streams.abMomentsSink(mem.toDF(), $"cohort", $"v",
      table, dir.resolve("ckpt").toString)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = rows(Streams.welchView(spark, table)).map(_.toString)
    val batch = rows(graft.ext.Stats.welchT(
        (b1 ++ b2).toDF("cohort", "v"), $"cohort", $"v"))
      .map(_.toString)
    assert(streamed == batch && streamed.size == 1)
  }

  test("centroidMatrixSink/View: additive (src, dim) decimal partials " +
      "fold to the exact batch pair-cosine matrix") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val joined = docs.select($"doc_id", $"source")
      .join(emb.select($"vec_id".as("doc_id"), $"embedding"), Seq("doc_id"))
    case class SV(source: String, embedding: Array[Float])
    val all = joined.select($"source", $"embedding").collect()
      .map(r => (r.getString(0), r.getSeq[Float](1).toArray))
    val (b1, b2) = all.splitAt(all.length / 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_scm")
    val table = dir.resolve("log").toString
    val mem = MemoryStream[(String, Array[Float])]
    mem.addData(b1.toSeq: _*)
    val q = Streams.centroidMatrixSink(
      mem.toDF().toDF("source", "embedding"), $"source", $"embedding",
      table, dir.resolve("ckpt").toString)
    q.processAllAvailable()
    mem.addData(b2.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = rows(Streams.centroidMatrixView(spark, table)
      .orderBy("src_a", "src_b")).map(_.toString)
    val batch = rows(graft.ext.Similarity.sourceCentroidMatrix(
        docs, $"doc_id", $"source", emb, $"vec_id", $"embedding")
      .orderBy("src_a", "src_b")).map(_.toString)
    assert(streamed == batch && streamed.size == 190)
  }

  test("lshAdmitSink: per-batch admission equals batch " +
      "dedupAgainstIndex; frozen-index contract lets stream-internal " +
      "dups pass") {
    import graft.ext.{Dedup, TextAnalysis}
    implicit val sqlCtx = spark.sqlContext
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_lshadm")
    try {
      val shingled = d.select(col("doc_id"),
        array_distinct(TextAnalysis.shingles(col("text"), 3)).as("sh"))
      Dedup.saveLshIndex(shingled.where(col("doc_id") % 2 === 0),
        "doc_id", "sh", dir.resolve("idx").toString)
      val incoming = d.where(col("doc_id") % 2 === 1)
        .select($"doc_id", $"text").as[TDoc].collect().sortBy(_.doc_id)
      val (b1, b2) = incoming.splitAt(incoming.length / 2)
      val mem = MemoryStream[TDoc]
      val out = dir.resolve("out").toString
      mem.addData(b1.toSeq: _*)
      val q = Streams.lshAdmitSink(
        mem.toDF().select(col("doc_id"),
          array_distinct(TextAnalysis.shingles(col("text"), 3)).as("sh")),
        dir.resolve("idx").toString, "doc_id", "sh", out,
        dir.resolve("ckpt").toString)
      q.processAllAvailable()
      mem.addData(b2.toSeq: _*)
      q.processAllAvailable()
      q.stop()
      def batchAdmit(docs: Seq[TDoc]): Seq[Long] =
        rows(Dedup.dedupAgainstIndex(spark, dir.resolve("idx").toString,
            docs.toDF().select(col("doc_id"), array_distinct(
              TextAnalysis.shingles(col("text"), 3)).as("sh")),
            "doc_id", "sh")
          .select("doc_id").orderBy("doc_id")).map(_.getLong(0))
      val got = spark.read.parquet(out)
        .select($"doc_id", $"_batch".cast("long"))
        .collect().map(r => (r.getLong(1), r.getLong(0))).toSeq.sorted
      val exp = (batchAdmit(b1.toSeq).map((0L, _)) ++
        batchAdmit(b2.toSeq).map((1L, _))).sorted
      assert(got == exp && got.nonEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("classifier-eval views: ONE (v, y) ledger folds to the exact " +
      "batch rocAuc, thresholdSweep and calibration; an (a, b) ledger " +
      "to cohenKappa") {
    import graft.ext.Stats
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(VY(50000L, false), VY(150000L, true), VY(150000L, true))
    val b2 = Seq(VY(999999L, false), VY(1000000L, true), VY(50000L, true))
    val dir = java.nio.file.Files.createTempDirectory("graft_evalvw")
    val table = dir.resolve("log").toString
    val mem = MemoryStream[VY]
    mem.addData(b1: _*)
    val q = Streams.additiveSink(mem.toDF(), Seq("v", "y"), lit(1L),
      table, dir.resolve("ckpt").toString)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val all = (b1 ++ b2).toDF("v", "y")
    assert(rows(Streams.rocAucView(spark, table)).map(_.toString) ==
      rows(Stats.rocAuc(all, $"v", $"y")).map(_.toString))
    assert(rows(Streams.thresholdSweepView(spark, table)
        .orderBy("threshold")).map(_.toString) ==
      rows(Stats.thresholdSweep(all, $"v", $"y").orderBy("threshold"))
        .map(_.toString))
    assert(rows(Streams.calibrationView(spark, table).orderBy("bin"))
        .map(_.toString) ==
      rows(Stats.calibrationBins(all, $"v", $"y").orderBy("bin"))
        .map(_.toString))
    // the SAME ledger also folds to exact AP, the decision curve and
    // the MCC sweep
    assert(rows(Streams.prAucView(spark, table)).map(_.toString) ==
      rows(Stats.averagePrecision(all, $"v", $"y")).map(_.toString))
    assert(rows(Streams.decisionCurveView(spark, table, 5L, 1L, 2L)
        .orderBy("threshold")).map(_.toString) ==
      rows(Stats.decisionCurve(all, $"v", $"y", 5L, 1L, 2L)
        .orderBy("threshold")).map(_.toString))
    assert(rows(Streams.mccSweepView(spark, table).orderBy("threshold"))
        .map(_.toString) ==
      rows(Stats.mccSweep(all, $"v", $"y").orderBy("threshold"))
        .map(_.toString))
    assert(rows(Streams.gainsCurveView(spark, table)
        .orderBy("threshold")).map(_.toString) ==
      rows(Stats.gainsCurve(all, $"v", $"y").orderBy("threshold"))
        .map(_.toString))
    // the kappa ledger is keyed by the RATER PAIR
    val k1 = Seq(RatersAB(true, true), RatersAB(true, false))
    val k2 = Seq(RatersAB(false, true), RatersAB(false, false),
      RatersAB(true, true))
    val kdir = java.nio.file.Files.createTempDirectory("graft_kappavw")
    val ktable = kdir.resolve("log").toString
    val kmem = MemoryStream[RatersAB]
    kmem.addData(k1: _*)
    val kq = Streams.additiveSink(kmem.toDF(), Seq("a", "b"), lit(1L),
      ktable, kdir.resolve("ckpt").toString)
    kq.processAllAvailable()
    kmem.addData(k2: _*)
    kq.processAllAvailable()
    kq.stop()
    assert(rows(Streams.cohenKappaView(spark, ktable)).map(_.toString) ==
      rows(Stats.cohenKappa((k1 ++ k2).toDF("a", "b"), $"a", $"b"))
        .map(_.toString))
    // the SAME rater-pair ledger folds to the weighted form too
    // (boolean raters cast to 0/1 ordinals)
    val kAll = (k1 ++ k2).toDF("a", "b")
      .select($"a".cast("long").as("a"), $"b".cast("long").as("b"))
    assert(rows(Streams.weightedKappaView(spark, ktable))
        .map(_.toString) ==
      rows(Stats.weightedKappa(kAll, $"a", $"b")).map(_.toString))
  }

  test("per-group classifier-eval views: ONE (g, v, y) ledger folds " +
      "to the exact batch rocAucByGroup and calibrationBinsByGroup") {
    import graft.ext.Stats
    implicit val sqlCtx = spark.sqlContext
    // group A ranks perfectly, group B reversed — the Simpson shape
    // the per-group views exist to surface
    val b1 = Seq(GVY("A", 100000L, false), GVY("A", 900000L, true),
      GVY("B", 100000L, true))
    val b2 = Seq(GVY("B", 900000L, false), GVY("A", 500000L, true),
      GVY("B", 500000L, false))
    val dir = java.nio.file.Files.createTempDirectory("graft_gevalvw")
    val table = dir.resolve("log").toString
    val mem = MemoryStream[GVY]
    mem.addData(b1: _*)
    val q = Streams.additiveSink(mem.toDF(), Seq("g", "v", "y"), lit(1L),
      table, dir.resolve("ckpt").toString)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val all = (b1 ++ b2).toDF("g", "v", "y")
    assert(rows(Streams.rocAucByGroupView(spark, table).orderBy("group"))
        .map(_.toString) ==
      rows(Stats.rocAucByGroup(all, $"g", $"v", $"y").orderBy("group"))
        .map(_.toString))
    assert(rows(Streams.calibrationByGroupView(spark, table)
        .orderBy("group", "bin")).map(_.toString) ==
      rows(Stats.calibrationBinsByGroup(all, $"g", $"v", $"y")
        .orderBy("group", "bin")).map(_.toString))
    assert(rows(Streams.apByGroupView(spark, table).orderBy("group"))
        .map(_.toString) ==
      rows(Stats.averagePrecisionByGroup(all, $"g", $"v", $"y")
        .orderBy("group")).map(_.toString))
    assert(rows(Streams.thresholdSweepByGroupView(spark, table)
        .orderBy("group", "threshold")).map(_.toString) ==
      rows(Stats.thresholdSweepByGroup(all, $"g", $"v", $"y")
        .orderBy("group", "threshold")).map(_.toString))
    // the grouped ledger's g-marginal serves the POOLED views too —
    // one ledger, both audits
    val pooled = Streams.sumView(spark, table, Seq("g", "v", "y"))
      .groupBy("v", "y")
      .agg(org.apache.spark.sql.functions.sum($"n").as("c"))
    assert(rows(Stats.rocAucFromCounts(pooled)).map(_.toString) ==
      rows(Stats.rocAuc(all, $"v", $"y")).map(_.toString))
  }

  test("linkageAdmitSink: per-batch admission equals batch " +
      "linkAgainstIndex no-match; short and stream-internal variants " +
      "pass (frozen-index contract)") {
    import graft.ext.Dedup
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_linkadm")
    try {
      val indexed = Seq(TDoc(1L, "spark"), TDoc(2L, "quantile"),
        TDoc(3L, "calendar")).toDF()
      val idx = dir.resolve("idx").toString
      Dedup.saveVariantIndex(indexed, "doc_id", "text", idx)
      // b1: exact dup (10), 1-edit variant (11), too-short (12, passes
      // unjudged), novel (13); b2: exact dup (14), 1-edit (15), novel
      // (16), and 17 = a variant of 13 FROM B1 — stream-internal, must
      // pass (the index is the only authority)
      val b1 = Seq(TDoc(10L, "spark"), TDoc(11L, "spork"),
        TDoc(12L, "zzz"), TDoc(13L, "banana"))
      val b2 = Seq(TDoc(14L, "quantile"), TDoc(15L, "calender"),
        TDoc(16L, "totally"), TDoc(17L, "bananna"))
      val mem = MemoryStream[TDoc]
      val out = dir.resolve("out").toString
      mem.addData(b1: _*)
      val q = Streams.linkageAdmitSink(mem.toDF(), idx, "doc_id", "text",
        out, dir.resolve("ckpt").toString)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      q.stop()
      val got = spark.read.parquet(out)
        .select($"_batch".cast("long"), $"doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got == Seq((0L, 12L), (0L, 13L), (1L, 16L), (1L, 17L)))
      // ≡ batch: per batch, admitted = rows linkAgainstIndex matches
      // nothing for
      def batchAdmit(docs: Seq[TDoc], batch: Long): Seq[(Long, Long)] = {
        val m = Dedup.linkAgainstIndex(spark, idx, docs.toDF(),
          "doc_id", "text").select($"id".as("doc_id")).distinct()
        rows(docs.toDF().join(m, Seq("doc_id"), "left_anti")
          .select("doc_id").orderBy("doc_id"))
          .map(r => (batch, r.getLong(0)))
      }
      assert(got == (batchAdmit(b1, 0L) ++ batchAdmit(b2, 1L)).sorted)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("sifNeighborSink: per-batch frozen-weight neighbors equal " +
      "batch sifEmbedFrozen + bruteTopK against the persisted cells") {
    import graft.ext.{Similarity, TextAnalysis}
    implicit val sqlCtx = spark.sqlContext
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_sifnn")
    try {
      val corpus = d.where(col("doc_id") % 2 === 0)
      val wPath = dir.resolve("w").toString
      val cPath = dir.resolve("cells").toString
      TextAnalysis.saveSifWeights(
        TextAnalysis.sifWeights(corpus, "text"), wPath)
      TextAnalysis.saveSifCells(
        TextAnalysis.sifEmbed(corpus, "doc_id", "text", dim = 8), cPath)
      val incoming = d.where(col("doc_id") % 2 === 1)
        .where(col("doc_id") < 40)
        .select($"doc_id", $"text").as[TDoc].collect().sortBy(_.doc_id)
      val (b1, b2) = incoming.splitAt(incoming.length / 2)
      val mem = MemoryStream[TDoc]
      val out = dir.resolve("out").toString
      mem.addData(b1.toSeq: _*)
      val q = Streams.sifNeighborSink(mem.toDF(), wPath, cPath,
        "doc_id", "text", dim = 8, k = 3, out,
        dir.resolve("ckpt").toString)
      q.processAllAvailable()
      mem.addData(b2.toSeq: _*)
      q.processAllAvailable()
      q.stop()
      def vecs(df: org.apache.spark.sql.DataFrame) = df
        .groupBy("id")
        .agg(transform(array_sort(collect_list(struct(col("dim"),
          col("v")))), x => x.getField("v")).as("embedding"))
      def batchRank(docs: Seq[TDoc]): Seq[String] =
        rows(Similarity.bruteTopK(
            vecs(TextAnalysis.sifEmbedFrozen(docs.toDF(), "doc_id",
              "text", TextAnalysis.loadSifWeights(spark, wPath), 8)),
            vecs(TextAnalysis.loadSifCells(spark, cPath)),
            "id", "embedding", k = 3)
          .orderBy("query_id", "rank")).map(_.toString)
      // per-batch rows (with the batch id prepended) must equal the
      // batch composition run on exactly that batch's documents
      val gotRows = spark.read.parquet(out)
        .select($"_batch".cast("long"), $"query_id", $"rank",
          $"neighbor_id", $"cosine")
        .collect().map(_.toString).sorted.toSeq
      val expRows = (batchRank(b1.toSeq).map(s =>
          "[0," + s.stripPrefix("[")) ++
        batchRank(b2.toSeq).map(s => "[1," + s.stripPrefix("[")))
        .sorted
      assert(gotRows.nonEmpty && gotRows == expRows)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("rfmSink/rfmView: mergeable (max, count, sum) partials fold to " +
      "the exact batch RFM table") {
    implicit val sqlCtx = spark.sqlContext
    def ev(u: Long, t: String, v: Double) =
      REv(u, java.sql.Timestamp.valueOf(t), v)
    val b1 = Seq(ev(1, "2024-01-01 00:00:00", 10.5),
      ev(1, "2024-01-03 12:00:00", 2.25), ev(2, "2024-01-02 00:00:00", 5.0),
      ev(3, "2024-01-01 06:00:00", 1.0))
    val b2 = Seq(ev(2, "2024-01-05 00:00:00", 7.75),
      ev(3, "2024-01-01 07:00:00", 0.5), ev(4, "2024-01-04 00:00:00", 9.0))
    val dir = java.nio.file.Files.createTempDirectory("graft_rfm")
    val table = dir.resolve("log").toString
    val mem = MemoryStream[REv]
    mem.addData(b1: _*)
    val q = Streams.rfmSink(mem.toDF(), $"user_id", $"ts", $"value",
      table, dir.resolve("ckpt").toString)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = rows(Streams.rfmView(spark, table).orderBy("user_id"))
      .map(_.toString)
    val batch = rows(graft.ext.EventWindows.rfm((b1 ++ b2).toDF(),
        $"user_id", $"ts", $"value").orderBy("user_id"))
      .map(_.toString)
    assert(streamed == batch && streamed.size == 4)
  }

  test("modelAssignSink: stream-served assignments under persisted " +
      "flat and two-level models equal batch assignModel; " +
      "checkpoint restart serves on without re-assigning") {
    import graft.ext.Ivf
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_mas")
    try {
      val flatPath = dir.resolve("flat").toString
      Ivf.saveModel(Ivf.train(emb, "vec_id", "embedding", nlist = 4),
        flatPath, spark)
      val twoDir = dir.resolve("two").toString
      Ivf.saveModelTwoLevel(Ivf.trainTwoLevelAsData(emb, "vec_id",
        "embedding", nCoarse = 2, nFine = 2), twoDir, spark)
      val vecs = emb.select($"vec_id", $"embedding").as[QV]
        .collect().sortBy(_.vec_id)
      val (v1, v2) = vecs.splitAt(vecs.length / 2)
      // flat model: two batches through a file source, with a restart
      // BETWEEN them — the saved model is the only state
      val src = dir.resolve("src").toString
      val out = dir.resolve("out").toString
      val ckpt = dir.resolve("ckpt").toString
      val schema = Seq.empty[QV].toDF().schema
      def startSink() = Streams.modelAssignSink(
        spark.readStream.schema(schema).parquet(src), flatPath,
        "vec_id", "embedding", out, ckpt)
      v1.toSeq.toDF().write.mode("append").parquet(src)
      val q1 = startSink(); q1.processAllAvailable(); q1.stop()
      v2.toSeq.toDF().write.mode("append").parquet(src)
      val q2 = startSink(); q2.processAllAvailable(); q2.stop()
      val batchFlat = rows(Ivf.assignModel(emb, "vec_id", "embedding",
          Ivf.FlatModel(Ivf.loadModel(spark, flatPath)))
        .select($"neighbor_id", $"cid").orderBy("neighbor_id"))
        .map(_.toString)
      def served(path: String) = rows(spark.read.parquet(path)
        .select($"neighbor_id", $"cid").orderBy("neighbor_id"))
        .map(_.toString)
      assert(served(out) == batchFlat)
      // each vector assigned exactly once across the restart
      assert(spark.read.parquet(out).count() == vecs.length.toLong)
      // two-level fine-as-data model: same contract
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[QV]
      mem.addData(vecs.toSeq: _*)
      val out2 = dir.resolve("out2").toString
      val qq = Streams.modelAssignSink(mem.toDF(), twoDir, "vec_id",
        "embedding", out2, dir.resolve("ckpt2").toString, twoLevel = true)
      qq.processAllAvailable(); qq.stop()
      val batchTwo = rows(Ivf.assignWithData(emb, "vec_id", "embedding",
          Ivf.loadModelTwoLevel(spark, twoDir))
        .select($"neighbor_id", $"cid").orderBy("neighbor_id"))
        .map(_.toString)
      assert(served(out2) == batchTwo)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("rateAnomalyView: additive count ledger + z tail equals the " +
      "batch rate anomaly") {
    implicit val sqlCtx = spark.sqlContext
    // 10 alternating-baseline hours then a spike, split across batches
    def ev(h: Int, i: Int) =
      Ev(h.toLong * 100 + i, ts(f"2024-01-01 $h%02d:0${i % 10}:00"), "a")
    val b1 = (0 until 6).flatMap(h =>
      (0 until (if (h % 2 == 0) 4 else 6)).map(i => ev(h, i)))
    val b2 = (6 until 10).flatMap(h =>
      (0 until (if (h % 2 == 0) 4 else 6)).map(i => ev(h, i))) ++
      (0 until 15).map(i => ev(10, i))
    val dir = java.nio.file.Files.createTempDirectory("graft_ra")
    val table = dir.resolve("log").toString
    val mem = MemoryStream[Ev]
    mem.addData(b1: _*)
    val q = Streams.additiveSink(
      mem.toDF().select(date_trunc("hour", col("ts")).as("ws"),
        col("v").as("key")),
      Seq("key", "ws"), lit(1L), table, dir.resolve("ckpt").toString)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val view = Streams.rateAnomalyView(spark, table, 24, 8)
      .orderBy("ws").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("ws").toString,
        r.getAs[Long]("c"), r.getAs[Long]("n_prior"),
        Option(r.getAs[java.lang.Double]("z")).map(_.doubleValue)))
    val batch = graft.ext.EventWindows.rateAnomaly(
      (b1 ++ b2).toDF().withColumnRenamed("v", "event_type"),
      col("ts"), "1 hour", col("event_type"), 24, 8)
      .orderBy("ws").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("ws").toString,
        r.getAs[Long]("c"), r.getAs[Long]("n_prior"),
        Option(r.getAs[java.lang.Double]("z")).map(_.doubleValue)))
    assert(view.toSeq == batch.toSeq)
    // the spike is visible through the ledger: z = 10 exactly
    assert(view.last._4.contains(10.0))
  }

  test("calendarRateAnomalyView + seasonalAnomalyView: one count " +
      "ledger serves both calendar alarms, each equal to its batch " +
      "operator") {
    implicit val sqlCtx = spark.sqlContext
    // key a runs 4 full days (counts alternate 2/3 by (hour+day)
    // parity, so same-hour references have variance), then day 5 is
    // DARK; key b pins the span. The day-5 gap cells exist only
    // through densification, so the views prove the ledger
    // reconstructs the calendar frame (not just observed rows).
    def ev(d: Int, h: Int, i: Int, k: String) =
      Ev((d.toLong * 24 + h) * 100 + i + (if (k == "a") 0 else 50),
        ts(f"2024-01-0${d + 1} $h%02d:0${i % 10}:00"), k)
    def day(d: Int) = (0 until 24).flatMap(h =>
      (0 until (if ((h + d) % 2 == 0) 2 else 3)).map(i => ev(d, h, i, "a")))
    val b1 = day(0) ++ day(1) ++ Seq(ev(0, 0, 0, "b"))
    val b2 = day(2) ++ day(3) ++ Seq(ev(4, 23, 0, "b"))
    val dir = java.nio.file.Files.createTempDirectory("graft_cal")
    val table = dir.resolve("log").toString
    val mem = MemoryStream[Ev]
    mem.addData(b1: _*)
    val q = Streams.additiveSink(
      mem.toDF().select(date_trunc("hour", col("ts")).as("ws"),
        col("v").as("key")),
      Seq("key", "ws"), lit(1L), table, dir.resolve("ckpt").toString)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val evs = (b1 ++ b2).toDF().withColumnRenamed("v", "event_type")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("ws", "key").collect().map(_.toString).toSeq
    assert(norm(Streams.calendarRateAnomalyView(spark, table, "1 hour",
        6, 4)) ==
      norm(graft.ext.EventWindows.calendarRateAnomaly(evs, col("ts"),
        "1 hour", col("event_type"), 6, 4)))
    assert(norm(Streams.seasonalAnomalyView(spark, table, "1 hour",
        minRef = 3)) ==
      norm(graft.ext.EventWindows.seasonalAnomaly(evs, col("ts"),
        "1 hour", col("event_type"), minRef = 3)))
    // the Theil–Sen slope rides the SAME ledger (eighth read)
    assert(Streams.theilSenView(spark, table, "1 hour")
        .orderBy("key").collect().map(_.toString).toSeq ==
      graft.ext.EventWindows.theilSen(evs, col("ts"), "1 hour",
        col("event_type")).orderBy("key").collect()
        .map(_.toString).toSeq)
    // availability/outage rides the SAME ledger (seventh read)
    assert(Streams.availabilityView(spark, table, "1 hour")
        .orderBy("key").collect().map(_.toString).toSeq ==
      graft.ext.EventWindows.availability(evs, col("ts"), "1 hour",
        col("event_type")).orderBy("key").collect()
        .map(_.toString).toSeq)
    // the Mann–Kendall trend rides the SAME ledger (sixth alarm)
    assert(Streams.mannKendallView(spark, table, "1 hour")
        .orderBy("key").collect().map(_.toString).toSeq ==
      graft.ext.EventWindows.mannKendall(evs, col("ts"), "1 hour",
        col("event_type")).orderBy("key").collect()
        .map(_.toString).toSeq)
    // the dispersion read rides the SAME ledger (fifth alarm)
    assert(Streams.dispersionView(spark, table, "1 hour")
        .orderBy("key").collect().map(_.toString).toSeq ==
      graft.ext.EventWindows.dispersion(evs, col("ts"), "1 hour",
        col("event_type")).orderBy("key").collect()
        .map(_.toString).toSeq)
    // the level-shift locator rides the SAME ledger (fourth alarm)
    assert(Streams.levelShiftView(spark, table, "1 hour")
        .orderBy("key").collect().map(_.toString).toSeq ==
      graft.ext.EventWindows.levelShift(evs, col("ts"), "1 hour",
        col("event_type")).orderBy("key").collect()
        .map(_.toString).toSeq)
    // a's dark day-5 hours score against the other days' same hour
    // (refs 2,3,2,3 → n'=4, S'=10, Q'=26): z = (0·4−10)/√4 = −5
    val s = Streams.seasonalAnomalyView(spark, table, "1 hour",
        minRef = 3)
      .where(col("key") === "a" &&
        col("ws") === java.sql.Timestamp.valueOf("2024-01-05 07:00:00"))
      .collect()
    assert(s.length == 1 && s.head.getAs[Double]("z") == -5.0)
  }

  test("simpsonAuditView: the (stratum, cohort) count ledger folds to " +
      "the exact batch paradox audit; the reversal emerges only after " +
      "the second batch") {
    implicit val sqlCtx = spark.sqlContext
    def mk(st: String, c: Long, k: Int, n: Int) =
      (0 until n).map(i => SCU(st, c, i < k))
    // batch 1: the easy stratum only — no paradox visible yet;
    // batch 2 adds the hard stratum and flips the pooled sign
    val b1 = mk("easy", 0L, 9, 10) ++ mk("easy", 1L, 72, 90)
    val b2 = mk("hard", 0L, 27, 90) ++ mk("hard", 1L, 2, 10)
    val dir = java.nio.file.Files.createTempDirectory("graft_simp")
    val table = dir.resolve("log").toString
    val mem = MemoryStream[SCU]
    mem.addData(b1: _*)
    val q = Streams.additiveSink(mem.toDF(),
      Seq("stratum", "cohort"), when(col("ok"), 1L).otherwise(0L),
      table, dir.resolve("ckpt").toString)
    q.processAllAvailable()
    val mid = Streams.simpsonAuditView(spark, table).collect().head
    assert(!mid.getAs[Boolean]("paradox") &&
      mid.getAs[Long]("n_strata") == 1L)
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val got = Streams.simpsonAuditView(spark, table).collect()
      .map(_.toString).toSeq
    val batch = graft.ext.Stats.simpsonAudit((b1 ++ b2).toDF(),
      col("stratum"), col("cohort"), col("ok")).collect()
      .map(_.toString).toSeq
    assert(got == batch)
    val r = Streams.simpsonAuditView(spark, table).collect().head
    assert(r.getAs[Boolean]("paradox") &&
      r.getAs[Double]("adjusted_diff") == 0.1)
  }

  test("driftMonitorSink: per-batch TV rows equal the batch-mode " +
      "computation; a corpus-identical batch scores exactly 0") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(TDoc(1L, "a a b c"), TDoc(2L, "b c d")).toDF()
    val counts = graft.ext.TextAnalysis.tokenDistribution(corpus, "text")
      .localCheckpoint()
    val total = counts.agg(sum("big_c")).first().getLong(0)
    assert(total == 7L)
    val b1 = Seq(TDoc(10L, "a a b c"), TDoc(11L, "b c d"))   // = corpus
    val b2 = Seq(TDoc(12L, "z z z"))                          // disjoint
    val dir = java.nio.file.Files.createTempDirectory("graft_drift")
    val table = dir.resolve("log").toString
    val mem = MemoryStream[TDoc]
    mem.addData(b1: _*)
    val q = Streams.driftMonitorSink(mem.toDF(), "text", counts, total,
      table, dir.resolve("ckpt").toString)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(table).orderBy("_batch").collect()
    assert(got.length == 2)
    // corpus-identical batch: exact 0 (integer numerators cancel)
    assert(got(0).getAs[Double]("tv_distance") == 0.0)
    // disjoint batch: matches the batch-mode computation bit for bit
    val expect = graft.ext.TextAnalysis.tvAgainstCorpus(
      b2.toDF(), "text", counts, total).collect().head
    assert(got(1).getAs[Double]("tv_distance") ==
      expect.getAs[Double]("tv_distance"))
    assert(got(1).getAs[Long]("n_tokens") == 3L)
  }

  test("keepFirstSink survives a table dir with no part files") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_empty")
    val table = dir.resolve("table").toString
    // simulate a first batch whose rows were all filtered: dir exists,
    // no parquet part files — the PK read must treat it as "no keys yet"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(table))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(table, "_SUCCESS"), "")
    val mem = MemoryStream[Ev]
    mem.addData(Ev(1, ts("2024-01-01 00:00:00"), "a"))
    val q = Streams.keepFirstSink(mem.toDF(), Seq("pk"), Seq(col("ts")),
      table, dir.resolve("ckpt").toString)
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(table).count() == 1)
  }

  test("additiveSink view is idempotent under batch replay") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_replay")
    val table = dir.resolve("log").toString
    val mem = MemoryStream[Ev]
    mem.addData(Ev(4, ts("2024-01-01 00:00:00"), "a"),
      Ev(6, ts("2024-01-01 00:00:01"), "b"))
    val q = Streams.additiveSink(mem.toDF(), Seq("v"), col("pk"), table,
      dir.resolve("ckpt").toString)
    q.processAllAvailable()
    q.stop()
    def state(): Map[String, (Double, Long)] =
      Streams.sumView(spark, table, Seq("v")).collect()
        .map(r => r.getAs[String]("v") ->
          (r.getAs[Double]("total"), r.getAs[Long]("n"))).toMap
    val before = state()
    assert(before == Map("a" -> (4.0, 1L), "b" -> (6.0, 1L)))
    // simulate at-least-once replay: the crashed-and-rerun batch appends
    // a byte-identical partial under the same batch id (materialize
    // first — appending from a live self-read is undefined)
    val logRows = spark.read.parquet(table).collect().toSeq
    val logSchema = spark.read.parquet(table).schema
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(logRows).asJava, logSchema)
      .write.mode("append").parquet(table)
    assert(state() == before) // fold dedupes on (keys, _batch)
    Streams.compactAdditive(spark, table, Seq("v"))
    assert(state() == before)
  }

  test("streaming tumbling counts equal batch window counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val evs = Seq(
      Ev(1, ts("2024-01-01 00:05:00"), "x"), Ev(2, ts("2024-01-01 00:55:00"), "x"),
      Ev(3, ts("2024-01-01 01:05:00"), "y"), Ev(4, ts("2024-01-01 01:10:00"), "y"))
    mem.addData(evs: _*)
    val out = Streams.tumblingCounts(mem.toDF(), "ts", "1 hour",
      "10 minutes", Seq(col("v")))
    runToMemory(out, "tumb_out", "complete")
    val got = spark.sql("select ws, v, n from tumb_out order by ws, v")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSeq
    val batch = evs.toDF()
      .groupBy(window($"ts", "1 hour").getField("start").as("ws"), $"v")
      .agg(count(lit(1)).as("n")).orderBy("ws", "v")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSeq
    assert(got == batch)
  }

  test("streaming windowed quantiles equal the batch sketch quantiles") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val evs = (1 to 40).map(i => Ev(i.toLong,
      ts(f"2024-01-01 0${i % 2}%d:10:00"), if (i % 3 == 0) "a" else "b"))
    mem.addData(evs: _*)
    val out = Streams.windowQuantiles(mem.toDF(), "ts", "1 hour",
      "10 minutes", Seq(col("v")), col("pk").cast("double"),
      Seq((1, 2, "p50"), (9, 10, "p90")))
    runToMemory(out, "wq_out", "complete")
    val got = spark.sql("select ws, v, p50, p90, n from wq_out order by ws, v")
      .collect().map(_.toString).toSeq
    val batch = graft.ext.Quantiles.approx(
        evs.toDF().withColumn("ws", date_trunc("hour", $"ts")),
        Seq("ws", "v"), $"pk".cast("double"),
        Seq((1, 2, "p50"), (9, 10, "p90")))
      .select($"ws", $"v", $"p50", $"p90", $"n").orderBy("ws", "v")
      .collect().map(_.toString).toSeq
    assert(got == batch && got.size == 4)
    // the sketch at this accuracy is exact on 40 values: spot-check p50
    // of the hour-0 'b' group against the true median rank value
    val hour0b = evs.filter(e => e.pk % 2 == 0 && e.v == "b").map(_.pk).sorted
    val expectedP50 = hour0b((hour0b.size + 1) / 2 - 1).toDouble
    val gotP50 = spark.sql(
      "select p50 from wq_out where v = 'b' and ws = timestamp '2024-01-01 00:00:00'")
      .collect().head.getDouble(0)
    assert(gotP50 == expectedP50)
  }

  test("stream-stream interval join equals the batch range join") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val imps = MemoryStream[Ev]
    val clickRows = Seq(
      Ev(1, ts("2024-01-01 00:10:00"), "c1"),
      Ev(1, ts("2024-01-01 00:40:00"), "c2"),
      Ev(2, ts("2024-01-01 00:05:00"), "c3"))
    val impRows = Seq(
      Ev(1, ts("2024-01-01 00:00:00"), "i1"), // 10 min before c1 → pairs
      Ev(1, ts("2024-01-01 00:25:00"), "i2"), // 15 min before c2 → pairs
      Ev(1, ts("2024-01-01 00:41:00"), "i3"), // after every click → never
      Ev(2, ts("2024-01-01 00:05:00"), "i4")) // equal ts → inclusive pair
    clicks.addData(clickRows: _*)
    imps.addData(impRows: _*)
    val joined = Streams.intervalJoin(
      clicks.toDF().select($"pk", $"ts".as("cts"), $"v".as("click")),
      imps.toDF().select($"pk".as("ipk"), $"ts".as("its"), $"v".as("imp")),
      "pk", "ipk", "cts", "its", "30 minutes", "10 minutes")
    runToMemory(joined, "ssj_out", "append")
    val got = spark.sql("select click, imp from ssj_out order by click, imp")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // batch equivalent on the same rows
    val batch = clickRows.toDF().select($"pk", $"ts".as("cts"), $"v".as("click"))
      .join(impRows.toDF().select($"pk".as("ipk"), $"ts".as("its"), $"v".as("imp")),
        expr("pk = ipk AND its BETWEEN cts - INTERVAL 30 minutes AND cts"))
      .select($"click", $"imp").orderBy("click", "imp")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == batch)
    assert(got == Seq(("c1", "i1"), ("c2", "i2"), ("c3", "i4")))
  }

  test("streaming count-min: additive cell partials fold to the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.CountMin
    val mem = MemoryStream[Ev]
    val evs = (1 to 60).map(i => Ev((i % 9).toLong, ts("2024-01-01 00:00:00"), "v"))
    val dir = java.nio.file.Files.createTempDirectory("graft_cm_stream")
    val table = dir.resolve("table").toString
    val ckpt = dir.resolve("ckpt").toString
    try {
      val q = Streams.additiveSink(
        CountMin.cells(mem.toDF(), $"pk", width = 13, depth = 3),
        Seq("j", "bucket"), lit(1L), table, ckpt)
      mem.addData(evs.take(25): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(25): _*)
      q.processAllAvailable()
      q.stop()
      val streamed = rows(Streams.sumView(spark, table, Seq("j", "bucket"))
          .select($"j", $"bucket", $"n"))
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = rows(CountMin.sketch(evs.toDF(), $"pk", width = 13, depth = 3))
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == batch)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("applyDiffSink: stream-applied diffs reach each snapshot; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Diff
    val v0 = Seq((1L, "a"), (2L, "b")).toDF("pk", "v")
    val v1 = Seq((1L, "a2"), (2L, "b"), (3L, "c")).toDF("pk", "v")
    val v2 = Seq((1L, "a2"), (3L, "c2"), (4L, "d")).toDF("pk", "v")
    def diffRows(o: org.apache.spark.sql.DataFrame,
        n: org.apache.spark.sql.DataFrame): Seq[DiffRow] =
      Diff.snapshotDiff(o, n, Seq("pk")).collect().toSeq.map(r =>
        DiffRow(r.getAs[Long]("pk"), r.getAs[String]("change"),
          r.getAs[String]("old_v"), r.getAs[String]("new_v")))
    val d0 = diffRows(v0.where(lit(false)), v0) // bootstrap: all added
    val d1 = diffRows(v0, v1)
    val d2 = diffRows(v1, v2)
    val dir = java.nio.file.Files.createTempDirectory("graft_diffsink")
    val table = dir.resolve("table").toString
    try {
      val mem = MemoryStream[DiffRow]
      val q = Streams.applyDiffSink(mem.toDF(), Seq("pk"), table,
        dir.resolve("ckpt").toString)
      def state(): Set[(Long, String)] = spark.read.parquet(table)
        .collect().map(r => (r.getAs[Long]("pk"), r.getAs[String]("v"))).toSet
      mem.addData(d0: _*); q.processAllAvailable()
      assert(state() == Set((1L, "a"), (2L, "b")))
      mem.addData(d1: _*); q.processAllAvailable()
      assert(state() == Set((1L, "a2"), (2L, "b"), (3L, "c")))
      mem.addData(d2: _*); q.processAllAvailable()
      q.stop()
      val expectBatch = graft.operators.Diff
        .applyDiff(graft.operators.Diff.applyDiff(v0,
          Diff.snapshotDiff(v0, v1, Seq("pk")), Seq("pk")),
          Diff.snapshotDiff(v1, v2, Seq("pk")), Seq("pk"))
        .collect().map(r => (r.getAs[Long]("pk"), r.getAs[String]("v"))).toSet
      assert(state() == expectBatch)
      assert(state() == Set((1L, "a2"), (3L, "c2"), (4L, "d")))
      // at-least-once replay of the last diff (fresh stream + checkpoint,
      // same table): added keys must not duplicate — apply ∘ apply = apply
      val mem2 = MemoryStream[DiffRow]
      val q2 = Streams.applyDiffSink(mem2.toDF(), Seq("pk"), table,
        dir.resolve("ckpt2").toString)
      mem2.addData(d2: _*); q2.processAllAvailable()
      q2.stop()
      assert(state() == expectBatch)
      assert(spark.read.parquet(table).count() == 3)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("adcScoreSink: streamed per-batch top-k equals batch ADC search") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.Pq
    def vec(i: Long): Array[Float] = Array((i % 5).toFloat,
      ((i * 3) % 7).toFloat, ((i * 5) % 11).toFloat, ((i * 7) % 13).toFloat)
    val corpus = (1L to 32L).map(i => QV(i, vec(i))).toDF()
    val b1 = Seq(QV(101L, vec(41)), QV(102L, vec(42)))
    val b2 = Seq(QV(103L, vec(43)), QV(104L, vec(44)))
    val dir = java.nio.file.Files.createTempDirectory("graft_adcsink")
    val out = dir.resolve("scores").toString
    try {
      val mem = MemoryStream[QV]
      mem.addData(b1: _*)
      val q = Streams.adcScoreSink(mem.toDF(), corpus, "vec_id", "embedding",
        k = 3, out, dir.resolve("ckpt").toString, m = 2, kCodes = 4)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      q.stop()
      def keyed(df: org.apache.spark.sql.DataFrame): Set[String] =
        df.select($"query_id", $"rank", $"neighbor_id",
          $"dist".cast("string")).collect().map(_.toString).toSet
      val got1 = keyed(spark.read.parquet(out).where($"_batch" === 0))
      val got2 = keyed(spark.read.parquet(out).where($"_batch" === 1))
      val exp1 = keyed(Pq.adcTopK(b1.toDF(), corpus, "vec_id", "embedding",
        k = 3, m = 2, kCodes = 4))
      val exp2 = keyed(Pq.adcTopK(b2.toDF(), corpus, "vec_id", "embedding",
        k = 3, m = 2, kCodes = 4))
      assert(got1 == exp1 && got2 == exp2)
      assert(got1.nonEmpty && got2.nonEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("opqAdcScoreSink: streamed rotated top-k equals batch OPQ search per batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.Opq
    def vec(i: Long): Array[Float] = Array((i % 5).toFloat,
      ((i * 3) % 7).toFloat, ((i * 5) % 11).toFloat, ((i * 7) % 13).toFloat)
    val corpus = (1L to 32L).map(i => QV(i, vec(i))).toDF()
    // train once, serve both the stream and the batch reference — the
    // production shape (model passed in, not re-learned per consumer)
    val model = Opq.learn(corpus, "vec_id", "embedding", m = 2, k = 4,
      iters = 1)
    val b1 = Seq(QV(101L, vec(41)), QV(102L, vec(42)))
    val b2 = Seq(QV(103L, vec(43)), QV(104L, vec(44)))
    val dir = java.nio.file.Files.createTempDirectory("graft_opqsink")
    val out = dir.resolve("scores").toString
    try {
      val mem = MemoryStream[QV]
      mem.addData(b1: _*)
      val q = Streams.opqAdcScoreSink(mem.toDF(), corpus, "vec_id",
        "embedding", k = 3, out, dir.resolve("ckpt").toString,
        m = 2, kCodes = 4, model = Some(model))
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      q.stop()
      def keyed(df: org.apache.spark.sql.DataFrame): Set[String] =
        df.select($"query_id", $"rank", $"neighbor_id",
          $"dist".cast("string")).collect().map(_.toString).toSet
      val got1 = keyed(spark.read.parquet(out).where($"_batch" === 0))
      val got2 = keyed(spark.read.parquet(out).where($"_batch" === 1))
      val exp1 = keyed(Opq.adcTopK(b1.toDF(), corpus, "vec_id", "embedding",
        k = 3, m = 2, kCodes = 4, model = Some(model)))
      val exp2 = keyed(Opq.adcTopK(b2.toDF(), corpus, "vec_id", "embedding",
        k = 3, m = 2, kCodes = 4, model = Some(model)))
      assert(got1 == exp1 && got2 == exp2)
      assert(got1.nonEmpty && got2.nonEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("semanticAdmitSink: streamed per-batch admission equals batch semanticAdmit") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.Similarity
    def vec(i: Long): Array[Float] = Array((i % 5).toFloat,
      ((i * 3) % 7).toFloat, ((i * 5) % 11).toFloat, ((i * 7) % 13).toFloat)
    val existing = (1L to 32L).map(i => QV(i, vec(i))).toDF()
    // b1 is half EXACT copies of existing vectors (must drop: cosine 1,
    // same cell trivially) and half novel patterns; b2 is all novel —
    // per-batch independence means b2 is judged against EXISTING only,
    // never against b1's survivors
    val b1 = (101L to 105L).map(i => QV(i, vec(i - 100))) ++
      (106L to 110L).map(i => QV(i, vec(i * 17 + 1)))
    val b2 = (201L to 210L).map(i => QV(i, vec(i * 29 + 7)))
    val dir = java.nio.file.Files.createTempDirectory("graft_semadmit")
    val out = dir.resolve("admitted").toString
    try {
      val mem = MemoryStream[QV]
      mem.addData(b1: _*)
      val q = Streams.semanticAdmitSink(mem.toDF(), existing, "vec_id",
        "embedding", threshold = 0.999,
        out, dir.resolve("ckpt").toString, nCells = Some(4))
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      q.stop()
      def got(batch: Long): Set[Long] =
        spark.read.parquet(out).where($"_batch" === batch)
          .select($"vec_id").collect().map(_.getLong(0)).toSet
      def exp(rows: Seq[QV]): Set[Long] =
        Similarity.semanticAdmit(existing, rows.toDF(), "vec_id",
            "embedding", threshold = 0.999, nCells = Some(4))
          .select($"vec_id").collect().map(_.getLong(0)).toSet
      assert(got(0) == exp(b1))
      assert(got(1) == exp(b2))
      // the exact copies in b1 must actually drop — the admission is
      // doing work, not vacuously passing everything through
      assert((got(0) & (101L to 105L).toSet).isEmpty,
        s"exact copies survived: ${got(0)}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("semanticAdmitSink crossBatch: the second copy across micro-batches is refused") {
    implicit val sqlCtx = spark.sqlContext
    def vec(i: Long): Array[Float] = Array((i % 5).toFloat,
      ((i * 3) % 7).toFloat, ((i * 5) % 11).toFloat, ((i * 7) % 13).toFloat)
    val existing = (1L to 32L).map(i => QV(i, vec(i))).toDF()
    // b1 brings a NOVEL pattern; b2 brings an exact copy of it (plus a
    // genuinely novel row). Per-batch independence admits both copies;
    // the cross-batch ledger must refuse the second.
    val novel = Array(9f, 8f, 7f, 6f)
    val b1 = Seq(QV(101L, novel))
    val b2 = Seq(QV(201L, novel.clone()), QV(202L, Array(6f, 7f, 8f, 9f)))
    def run(crossBatch: Boolean): (Set[Long], Set[Long]) = {
      val dir = java.nio.file.Files.createTempDirectory("graft_xbatch")
      val out = dir.resolve("admitted").toString
      try {
        val mem = MemoryStream[QV]
        mem.addData(b1: _*)
        val q = Streams.semanticAdmitSink(mem.toDF(), existing, "vec_id",
          "embedding", threshold = 0.999,
          out, dir.resolve("ckpt").toString, nCells = Some(4),
          crossBatch = crossBatch)
        q.processAllAvailable()
        mem.addData(b2: _*)
        q.processAllAvailable()
        q.stop()
        def got(batch: Long): Set[Long] =
          spark.read.parquet(out).where($"_batch" === batch)
            .select($"vec_id").collect().map(_.getLong(0)).toSet
        (got(0), got(1))
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
      }
    }
    val (on1, on2) = run(crossBatch = true)
    assert(on1 == Set(101L)) // novel vs existing → admitted
    assert(on2 == Set(202L), // the cross-batch copy 201 is refused
      s"ledger failed to refuse the cross-batch duplicate: $on2")
    val (off1, off2) = run(crossBatch = false)
    assert(off1 == Set(101L))
    assert(off2 == Set(201L, 202L)) // old behavior: batches independent
  }

  test("semanticAdmitSink dedupWithinBatch: same-batch duplicates collapse to the smallest id") {
    implicit val sqlCtx = spark.sqlContext
    def vec(i: Long): Array[Float] = Array((i % 5).toFloat,
      ((i * 3) % 7).toFloat, ((i * 5) % 11).toFloat, ((i * 7) % 13).toFloat)
    val existing = (1L to 32L).map(i => QV(i, vec(i))).toDF()
    // one batch: two exact copies of a novel pattern + one distinct row
    val novel = Array(9f, 8f, 7f, 6f)
    val b = Seq(QV(101L, novel), QV(102L, novel.clone()),
      QV(103L, Array(6f, 7f, 8f, 9f)))
    def run(dedup: Boolean): Set[Long] = {
      val dir = java.nio.file.Files.createTempDirectory("graft_wbatch")
      val out = dir.resolve("admitted").toString
      try {
        val mem = MemoryStream[QV]
        mem.addData(b: _*)
        val q = Streams.semanticAdmitSink(mem.toDF(), existing, "vec_id",
          "embedding", threshold = 0.999,
          out, dir.resolve("ckpt").toString, nCells = Some(4),
          dedupWithinBatch = dedup)
        q.processAllAvailable()
        q.stop()
        spark.read.parquet(out).select($"vec_id")
          .collect().map(_.getLong(0)).toSet
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
      }
    }
    // off: both copies pass (within-batch dups are documented as the
    // caller's problem); on: only the smallest id of the pair survives
    assert(run(dedup = false) == Set(101L, 102L, 103L))
    assert(run(dedup = true) == Set(101L, 103L))
  }

  test("semanticAdmitSink crossBatch: the ledger survives a checkpoint restart") {
    import graft.ext.Similarity
    def vec(i: Long): Array[Float] = Array((i % 5).toFloat,
      ((i * 3) % 7).toFloat, ((i * 5) % 11).toFloat, ((i * 7) % 13).toFloat)
    val existing = (1L to 32L).map(i => QV(i, vec(i))).toDF()
    val novel = Array(9f, 8f, 7f, 6f)
    val dir = java.nio.file.Files.createTempDirectory("graft_restart")
    val src = dir.resolve("src").toString
    val out = dir.resolve("admitted").toString
    val ckpt = dir.resolve("ckpt").toString
    val schema = Seq.empty[QV].toDF().schema
    def startSink() = Streams.semanticAdmitSink(
      spark.readStream.schema(schema).parquet(src), existing,
      "vec_id", "embedding", threshold = 0.999, out, ckpt,
      nCells = Some(4), crossBatch = true)
    try {
      // batch 0: one novel row — admitted; then the query STOPS (a
      // restart, not a rescale: same checkpoint, same outPath)
      Seq(QV(101L, novel)).toDF()
        .write.mode("append").parquet(src)
      val q1 = startSink(); q1.processAllAvailable(); q1.stop()
      // batch 1 arrives after the restart: an exact copy of the row
      // admitted BEFORE the restart plus a genuinely novel row. The
      // pre-restart in-memory ledger is gone — only a ledger rebuilt
      // from the admitted parquet can refuse the copy.
      Seq(QV(201L, novel.clone()), QV(202L, Array(6f, 7f, 8f, 9f))).toDF()
        .write.mode("append").parquet(src)
      val q2 = startSink(); q2.processAllAvailable(); q2.stop()
      def got(batch: Long): Set[Long] =
        spark.read.parquet(out).where($"_batch".cast("long") === batch)
          .select($"vec_id").collect().map(_.getLong(0)).toSet
      assert(got(0) == Set(101L))
      assert(got(1) == Set(202L),
        s"restart lost the ledger — the cross-restart copy landed: ${got(1)}")
      // total across all partitions: no double-append anywhere
      val all = spark.read.parquet(out).select($"vec_id")
        .collect().map(_.getLong(0)).toSeq
      assert(all.sorted == Seq(101L, 202L), s"unexpected rows: $all")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("semanticAdmitSink sizing: auto default and explicit two-level models match batch semanticAdmit") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.{Ivf, Similarity}
    def vec(i: Long): Array[Float] = Array((i % 5).toFloat,
      ((i * 3) % 7).toFloat, ((i * 5) % 11).toFloat, ((i * 7) % 13).toFloat)
    val existing = (1L to 48L).map(i => QV(i, vec(i))).toDF()
    val b1 = (101L to 105L).map(i => QV(i, vec(i - 100))) ++
      (106L to 110L).map(i => QV(i, vec(i * 17 + 1)))
    // the three sizing shapes VERDICT r7 asked for: the auto default
    // (no nCells anywhere), a plan-constant two-level model, and the
    // fine-as-data model — streamed per-batch output must equal the
    // batch operator under the SAME sizing in every case
    val twoLevel = Ivf.trainTwoLevel(existing, "vec_id", "embedding", 3, 3)
    val asData = Ivf.trainTwoLevelAsData(existing, "vec_id", "embedding", 3, 3)
    val cases: Seq[(String, Option[Ivf.Model],
        org.apache.spark.sql.DataFrame => Set[Long])] = Seq(
      ("auto", None, b => Similarity.semanticAdmit(existing, b, "vec_id",
        "embedding", threshold = 0.999, targetCellSize = 8)
        .select($"vec_id").collect().map(_.getLong(0)).toSet),
      ("twoLevel", Some(twoLevel), b => Similarity.semanticAdmit(existing,
        b, "vec_id", "embedding", threshold = 0.999, model = Some(twoLevel))
        .select($"vec_id").collect().map(_.getLong(0)).toSet),
      ("asData", Some(asData), b => Similarity.semanticAdmit(existing,
        b, "vec_id", "embedding", threshold = 0.999, model = Some(asData))
        .select($"vec_id").collect().map(_.getLong(0)).toSet))
    cases.foreach { case (label, model, batchForm) =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft_size_$label")
      val out = dir.resolve("admitted").toString
      try {
        val mem = MemoryStream[QV]
        mem.addData(b1: _*)
        val q = Streams.semanticAdmitSink(mem.toDF(), existing, "vec_id",
          "embedding", threshold = 0.999, out,
          dir.resolve("ckpt").toString, model = model, targetCellSize = 8)
        q.processAllAvailable()
        q.stop()
        val got = spark.read.parquet(out).select($"vec_id")
          .collect().map(_.getLong(0)).toSet
        assert(got == batchForm(b1.toDF()), s"$label: stream != batch")
        // the exact copies must drop — admission is doing work
        assert((got & (101L to 105L).toSet).isEmpty, s"$label: copies survived")
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
      }
    }
  }

  test("bigramScoreSink: per-batch scores equal the batch model scorer; unseen bigrams score 0") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.TextAnalysis
    val corpus = Seq(TDoc(1L, "the cat sat"), TDoc(2L, "the cat ran"),
      TDoc(3L, "a dog ran")).toDF()
    // b1: in-domain text; b2: one doc of entirely unseen bigrams (must
    // score exactly 0.0, not null) and one short doc (null score)
    val b1 = Seq(TDoc(101L, "the cat sat"), TDoc(102L, "a dog sat"))
    val b2 = Seq(TDoc(201L, "zz qq zz"), TDoc(202L, "solo"))
    val dir = java.nio.file.Files.createTempDirectory("graft_bgs")
    val out = dir.resolve("scored").toString
    try {
      val mem = MemoryStream[TDoc]
      mem.addData(b1: _*)
      val q = Streams.bigramScoreSink(mem.toDF(), corpus, "doc_id", "text",
        out, dir.resolve("ckpt").toString)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      q.stop()
      val (c1, c2) = TextAnalysis.bigramModel(corpus, "doc_id", "text")
      def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Option[Double])] =
        df.select($"id", $"n_bigrams", $"bigram_score").collect()
          .map(r => (r.getLong(0), r.getLong(1),
            Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
      def got(batch: Long) = canon(
        spark.read.parquet(out).where($"_batch" === batch))
      assert(got(0) == canon(TextAnalysis.bigramScoreWith(
        b1.toDF(), "doc_id", "text", c1, c2)))
      assert(got(1) == canon(TextAnalysis.bigramScoreWith(
        b2.toDF(), "doc_id", "text", c1, c2)))
      // the all-unseen doc scored EXACTLY zero; the short doc is null
      assert(got(1).contains((201L, 2L, Some(0.0))))
      assert(got(1).contains((202L, 0L, None)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("bm25ScoreSink: per-batch scores equal the train-once batch scorer; no-term docs score zero") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(TDoc(1L, "spark join window"), TDoc(2L, "the quick fox"),
      TDoc(3L, "spark spark shuffle")).toDF()
    val b1 = Seq(TDoc(101L, "spark scan"), TDoc(102L, "no match here"))
    val b2 = Seq(TDoc(201L, "join join spark"))
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25s")
    val out = dir.resolve("scored").toString
    try {
      val mem = MemoryStream[TDoc]
      mem.addData(b1: _*)
      val q = Streams.bm25ScoreSink(mem.toDF(), corpus, "doc_id", "text",
        Seq("spark", "join"), out, dir.resolve("ckpt").toString)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      q.stop()
      val scorer = graft.ext.Retrieval.bm25Scorer(corpus, "doc_id", "text",
        Seq("spark", "join"))
      def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
        df.select($"id", $"n_tokens", $"bm25").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      def got(b: Long) = canon(
        spark.read.parquet(out).where($"_batch" === b))
      assert(got(0) == canon(scorer(b1.toDF())))
      assert(got(1) == canon(scorer(b2.toDF())))
      // a doc with none of the profile terms scores exactly 0 against
      // the fixed corpus stats
      assert(got(0).exists(t => t._1 == 102L && t._3 == 0.0))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("retrievalHealthSink: per-batch nDCG grid equals batch " +
      "ndcgEvalQrels on that batch; restart with the same checkpoint " +
      "continues without rescoring or duplicating") {
    implicit val sqlCtx = spark.sqlContext
    val qrels = Seq((1L, "spark"), (1L, "join"), (2L, "fox"),
      (1L, "spark") /* dup judged pair — deduped at pin time */)
      .toDF("query_id", "term")
    val b1 = Seq(TDoc(101L, "spark join spark"), TDoc(102L, "the quick fox"),
      TDoc(103L, "no relevant words"))
    val b2 = Seq(TDoc(201L, "fox fox join"), TDoc(202L, "spark scan"))
    val b3 = Seq(TDoc(301L, "join fox spark"))
    val dir = java.nio.file.Files.createTempDirectory("graft_rhealth")
    val src = dir.resolve("src").toString
    val out = dir.resolve("grid").toString
    val ckpt = dir.resolve("ckpt").toString
    val schema = Seq.empty[TDoc].toDF().schema
    def startSink() = Streams.retrievalHealthSink(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src),
      qrels, "doc_id", "text", k = 2, out, ckpt)
    def canon(df: org.apache.spark.sql.DataFrame)
        : Set[(Long, Double, Double, Double)] =
      df.select($"query_id", $"dcg", $"idcg", $"ndcg").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3))).toSet
    def expected(docs: Seq[TDoc]) = canon(graft.ext.Retrieval
      .ndcgEvalQrels(docs.toDF(), "doc_id", "text", qrels, k = 2))
    def got(b: Long) = canon(
      spark.read.parquet(out).where($"_batch".cast("long") === b))
    try {
      b1.toDF().coalesce(1).write.mode("append").parquet(src)
      val q = startSink(); q.processAllAvailable()
      b2.toDF().coalesce(1).write.mode("append").parquet(src)
      q.processAllAvailable(); q.stop()
      assert(got(0) == expected(b1))
      assert(got(1) == expected(b2))
      // RESTART on the same checkpoint: resumes at batch 2; earlier
      // partitions untouched (no rescore, no duplicate); the frozen
      // qrels re-pin judges the new batch identically to batch form
      b3.toDF().coalesce(1).write.mode("append").parquet(src)
      val q2 = startSink(); q2.processAllAvailable(); q2.stop()
      val batches = spark.read.parquet(out).select($"_batch".cast("long"))
        .distinct().collect().map(_.getLong(0)).sorted
      assert(batches.toSeq == Seq(0L, 1L, 2L))
      assert(got(0) == expected(b1) && got(1) == expected(b2))
      assert(got(2) == expected(b3))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("bm25Scorer refresh contract: frozen stats drift as the corpus grows; a refreshed closure over the union equals batch bm25Score") {
    val corpus = Seq(TDoc(1L, "spark join window"), TDoc(2L, "the quick fox"),
      TDoc(3L, "spark spark shuffle")).toDF()
    val admitted = Seq(TDoc(10L, "join scan plan"), TDoc(11L, "fox den")).toDF()
    val grown = corpus.unionByName(admitted)
    val terms = Seq("spark", "join")
    def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.select($"id", $"n_tokens", $"bm25").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val frozen = graft.ext.Retrieval.bm25Scorer(corpus, "doc_id", "text", terms)
    val refreshed = graft.ext.Retrieval.bm25Scorer(grown, "doc_id", "text", terms)
    val batch = graft.ext.Retrieval.bm25Score(grown, "doc_id", "text", terms)
    // the refresh path: a NEW closure over the grown corpus IS the
    // fresh batch fit — bit-equal, not approximately
    assert(canon(refreshed(grown)) == canon(batch))
    // and the frozen closure demonstrably drifts once the corpus grows
    // (N, Σdl, df all moved) — the documented contract, made visible
    assert(canon(frozen(grown)) != canon(batch))
  }

  test("passageAdmitSink: cross-batch + within-batch passage admission equals batch dedupPassages") {
    implicit val sqlCtx = spark.sqlContext
    // within b1, doc 2 repeats doc 1's "a b" chunk; b2's doc 3 repeats
    // "c d" from b1 and brings a fresh "e f"
    val b1 = Seq(TDoc(1L, "a b c d"), TDoc(2L, "a b"))
    val b2 = Seq(TDoc(3L, "c d e f"))
    val dir = java.nio.file.Files.createTempDirectory("graft_pas")
    val out = dir.resolve("admitted").toString
    try {
      val mem = MemoryStream[TDoc]
      mem.addData(b1: _*)
      val q = Streams.passageAdmitSink(mem.toDF(), "doc_id", "text",
        chunkSize = 2, out, dir.resolve("ckpt").toString)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      q.stop()
      val got = spark.read.parquet(out)
        .select($"id", $"chunk_id", $"chunk_text", $"_batch").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      // streamed admission ≡ the batch operator over the union (ids
      // increase with batch order, so first-occurrence agrees)
      val batchKept = graft.ext.Dedup.dedupPassages(
          (b1 ++ b2).toDF(), "doc_id", "text", chunkSize = 2)
        .where($"kept")
        .select($"id", $"chunk_id", $"chunk_text").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(got == batchKept)
      assert(got == Set((1L, 0, "a b"), (1L, 1, "c d"), (3L, 1, "e f")))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("qualityAdmitSink: quality gate + fingerprint ledger equals the batch x96 stage-1/2 gate") {
    implicit val sqlCtx = spark.sqlContext
    def words(stem: String, n: Int) =
      "the a " + (1 to n).map(i => f"$stem$i%02d").mkString(" ")
    val goodA = words("aw", 50)
    val goodC = words("cw", 51)
    val goodE = words("ew", 52)
    // b1: good A, dup pair 3/4 (same text), quality reject 2
    val b1 = Seq(TDoc(1L, goodA), TDoc(2L, "too short"),
      TDoc(3L, goodC), TDoc(4L, goodC))
    // b2: re-delivery of A's text under a new id (ledger refusal) + fresh E
    val b2 = Seq(TDoc(5L, goodA), TDoc(6L, goodE))
    val dir = java.nio.file.Files.createTempDirectory("graft_qas")
    val out = dir.resolve("admitted").toString
    try {
      val mem = MemoryStream[TDoc]
      mem.addData(b1: _*)
      val q = Streams.qualityAdmitSink(mem.toDF(), "doc_id", "text",
        out, dir.resolve("ckpt").toString)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      q.stop()
      val got = spark.read.parquet(out).select($"id").collect()
        .map(_.getLong(0)).toSet
      assert(got == Set(1L, 3L, 6L))
      // ≡ the batch gate over the union (ids rise with batch order, so
      // smallest-id-wins agrees with first-batch-wins)
      val union = (b1 ++ b2).toDF()
      val quality = graft.ext.TextAnalysis
        .gopherQuality(union, "doc_id", "text")
        .where($"gopher_pass").select($"id")
      val batchKept = union.select($"doc_id".as("id"), $"text")
        .join(quality, Seq("id"))
        .withColumn("fp", graft.ext.TextAnalysis.fingerprint($"text"))
        .groupBy($"fp").agg(min($"id").as("id"))
        .select($"id").collect().map(_.getLong(0)).toSet
      assert(got == batchKept)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("unimaxPlanSink: each batch's plan equals the batch allocator over all arrivals so far") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(TSrc(1L, "small", 60L), TSrc(2L, "big", 200L))
    val b2 = Seq(TSrc(3L, "small", 40L), TSrc(4L, "mid", 150L))
    val dir = java.nio.file.Files.createTempDirectory("graft_ump")
    val out = dir.resolve("plan").toString
    val seen = dir.resolve("seen").toString
    try {
      val mem = MemoryStream[TSrc]
      mem.addData(b1: _*)
      val q = Streams.unimaxPlanSink(mem.toDF(), "src", $"w",
        budget = 300L, maxEpochs = 1L, out, seen,
        dir.resolve("ckpt").toString)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      q.stop()
      def planAt(batch: Long) = spark.read.parquet(out)
        .where($"_batch".cast("long") === batch)
        .select($"source", $"alloc_tokens").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // batch 0: caps small 60, big 200; fair 300/2=150 -> small 60,
      // big min(200, 240) = 200
      assert(planAt(0L) == Map("small" -> 60L, "big" -> 200L))
      // batch 1 re-plans over the union: caps small 100, mid 150,
      // big 200; fair 100 -> small 100, mid min(150,100)=100, big 100
      assert(planAt(1L) == Map("small" -> 100L, "mid" -> 100L,
        "big" -> 100L))
      // ≡ the batch allocator over all arrivals
      val union = (b1 ++ b2).toDF()
      val batchPlan = graft.ext.Sampling.unimaxAllocation(union,
        $"src", $"w", budget = 300L, maxEpochs = 1L)
        .select($"source", $"alloc_tokens").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(planAt(1L) == batchPlan)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("bigramScoreSink: JM and add-k modes serve per-batch equal to their batch scorers") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.TextAnalysis
    val corpus = Seq(TDoc(1L, "the cat sat"), TDoc(2L, "the cat ran"),
      TDoc(3L, "a dog ran")).toDF()
    // unseen-pair-of-known-words is where JM and add-k diverge
    val b1 = Seq(TDoc(101L, "the dog sat"), TDoc(102L, "zz qq"))
    val dir = java.nio.file.Files.createTempDirectory("graft_bgsjm")
    try {
      val (c1, c2) = TextAnalysis.bigramModel(corpus, "doc_id", "text")
      val uni = TextAnalysis.unigramModel(c2)
      val total = TextAnalysis.bigramTotal(c2)
      val v = TextAnalysis.bigramVocab(c2)
      def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Option[Double])] =
        df.select($"id", $"n_bigrams", $"bigram_score").collect()
          .map(r => (r.getLong(0), r.getLong(1),
            Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
      for ((mode, expect) <- Seq[(String, org.apache.spark.sql.DataFrame)](
        "jm" -> TextAnalysis.bigramScoreJmWith(b1.toDF(), "doc_id",
          "text", c1, c2, uni, total, lambda = 0.75),
        "addk" -> TextAnalysis.bigramScoreWith(b1.toDF(), "doc_id",
          "text", c1, c2, smoothK = 0.5, vocab = v))) {
        val out = dir.resolve(s"scored_$mode").toString
        val mem = MemoryStream[TDoc]
        mem.addData(b1: _*)
        val q =
          if (mode == "jm")
            Streams.bigramScoreSink(mem.toDF(), corpus, "doc_id",
              "text", out, dir.resolve(s"ckpt_$mode").toString,
              jmLambda = Some(0.75))
          else
            Streams.bigramScoreSink(mem.toDF(), corpus, "doc_id",
              "text", out, dir.resolve(s"ckpt_$mode").toString,
              smoothK = 0.5)
        q.processAllAvailable()
        q.stop()
        assert(canon(spark.read.parquet(out)) == canon(expect),
          s"mode $mode diverged from its batch scorer")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("importanceScoreSink: per-batch DSIR scores equal the batch scorer under fixed models") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.TextAnalysis
    val background = Seq(TDoc(1L, "the cat sat"), TDoc(2L, "the cat ran"),
      TDoc(3L, "le chat noir"), TDoc(4L, "le chien brun")).toDF()
    val target = background.where($"doc_id" <= 2L)
    // 102 is fully background-covered but target-unseen (the clean
    // off-domain case; a both-unseen bigram would instead score a
    // ratio of smoothing floors, which favors the larger background
    // vocabulary's smaller denominator)
    val b1 = Seq(TDoc(101L, "the cat sat"), TDoc(102L, "le chat noir"))
    val b2 = Seq(TDoc(201L, "zz qq"), TDoc(202L, "solo"))
    val dir = java.nio.file.Files.createTempDirectory("graft_imps")
    val out = dir.resolve("scored").toString
    try {
      val mem = MemoryStream[TDoc]
      mem.addData(b1: _*)
      val q = Streams.importanceScoreSink(mem.toDF(), background, target,
        "doc_id", "text", out, dir.resolve("ckpt").toString)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      q.stop()
      val scorer = TextAnalysis.importanceScorer(background, target,
        "doc_id", "text")
      def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Option[Double])] =
        df.select($"id", $"n_bigrams", $"importance").collect()
          .map(r => (r.getLong(0), r.getLong(1),
            Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
      def got(batch: Long) = canon(
        spark.read.parquet(out).where($"_batch" === batch))
      assert(got(0) == canon(scorer(b1.toDF())))
      assert(got(1) == canon(scorer(b2.toDF())))
      // target-like arrival outscores the off-domain one; the scores
      // are a pure function of the FIXED models, so every batch agrees
      val s = got(0).map(t => t._1 -> t._3).toMap
      assert(s(101L).get > s(102L).get,
        s"en doc ${s(101L)} should outscore fr doc ${s(102L)}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("adcScoreSink refuses an oversized replay batch (LUT guard stays on)") {
    implicit val sqlCtx = spark.sqlContext
    // "micro-batches are bounded" is a rate-limit property, not a
    // streaming one: a backlog replayed after downtime arrives as ONE
    // batch. 65,600 queries x m*k=128 = 8.4M LUT rows > MaxLutRows —
    // the sink must refuse loudly, not broadcast it.
    def vec16(i: Long): Array[Float] =
      Array.tabulate(16)(j => ((i * 3 + j) % 7).toFloat)
    val corpus = (1L to 32L).map(i => QV(i, vec16(i))).toDF()
    val big = (100000L until 165600L).map(i => QV(i, vec16(i)))
    val dir = java.nio.file.Files.createTempDirectory("graft_adcsink_guard")
    try {
      val mem = MemoryStream[QV]
      mem.addData(big: _*)
      val q = Streams.adcScoreSink(mem.toDF(), corpus, "vec_id", "embedding",
        k = 3, dir.resolve("scores").toString, dir.resolve("ckpt").toString,
        m = 8, kCodes = 16)
      val e = intercept[Exception] { q.processAllAvailable() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("ADC lookup-table")),
        s"expected the LUT guard refusal, got: ${messages(e).mkString(" | ")}")
      q.stop()
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("streaming stratified sample tracks the batch sample after every batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingSample
    import graft.streaming.StreamingSample.Doc
    val all = (1L to 120L).map(i => Doc(s"lang${i % 3}", i * 7 + 1))
    val (b1, b2) = all.splitAt(70)
    val mem = MemoryStream[Doc]
    val q = StreamingSample.run(mem.toDS(), k = 5).writeStream
      .format("memory").queryName("strat_out").outputMode("append").start()
    def latestSample(): Map[String, Seq[Long]] =
      spark.sql("""SELECT stratum, id, sample_rank FROM strat_out s
          WHERE version = (SELECT max(version) FROM strat_out
                           WHERE stratum = s.stratum)""")
        .collect().groupBy(_.getString(0))
        .view.mapValues(_.sortBy(_.getAs[Long]("sample_rank"))
          .map(_.getAs[Long]("id")).toSeq).toMap
    def batchSample(docs: Seq[Doc]): Map[String, Seq[Long]] =
      graft.ext.Sampling.stratifiedSample(
          docs.toDF("stratum", "id"), Seq(col("stratum")), col("id"), 5)
        .collect().groupBy(_.getAs[String]("stratum"))
        .view.mapValues(_.sortBy(_.getAs[Long]("sample_rank"))
          .map(_.getAs[Long]("id")).toSeq).toMap
    mem.addData(b1: _*); q.processAllAvailable()
    assert(latestSample() == batchSample(b1)) // prefix-equivalence mid-stream
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    assert(latestSample() == batchSample(all))
  }

  test("streaming admission: single batch equals batch tokenBudget; ledger bounds hold") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingAdmission
    import graft.streaming.StreamingAdmission.DocTok
    val docs = (1L to 60L).map(i =>
      DocTok(s"src${i % 3}", i, 10 + (i % 7)))
    val budget = (s: String) => if (s == "src0") 10000L else 100L
    // single-batch stream ≡ the batch operator (same order, same rule)
    val mem1 = MemoryStream[DocTok]
    mem1.addData(docs: _*)
    val q1 = StreamingAdmission.run(mem1.toDS(), budget).writeStream
      .format("memory").queryName("adm1").outputMode("append").start()
    q1.processAllAvailable(); q1.stop()
    val streamed = spark.sql("select source, id from adm1")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val batchKept = graft.ext.Sampling.tokenBudget(
        docs.toDF("source", "id", "n_tokens"), col("source"), col("id"),
        col("n_tokens"),
        when(col("source") === "src0", 10000L).otherwise(100L))
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("id"))).toSet
    assert(streamed == batchKept)
    // multi-batch: admitted sets only grow, and per-source admitted
    // tokens exceed the budget by at most the crossing document
    val mem2 = MemoryStream[DocTok]
    val (b1, b2) = docs.splitAt(30)
    val q2 = StreamingAdmission.run(mem2.toDS(), budget).writeStream
      .format("memory").queryName("adm2").outputMode("append").start()
    mem2.addData(b1: _*); q2.processAllAvailable()
    val after1 = spark.sql("select id from adm2").collect().map(_.getLong(0)).toSet
    mem2.addData(b2: _*); q2.processAllAvailable()
    q2.stop()
    val after2Rows = spark.sql("select source, id, n_tokens from adm2")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(after1.subsetOf(after2Rows.map(_._2).toSet))
    after2Rows.groupBy(_._1).foreach { case (src, rs) =>
      val toks = rs.map(_._3)
      val total = toks.sum
      assert(total - toks.max < budget(src), s"$src over-admitted")
    }
  }

  test("streaming session windows split on the gap like batch sessionize") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, ts("2024-01-01 00:00:00"), "s"),
      Ev(1, ts("2024-01-01 00:20:00"), "s"),
      Ev(1, ts("2024-01-01 01:30:00"), "s"), // > 30 min gap → new session
      Ev(2, ts("2024-01-01 00:00:00"), "s"))
    val out = Streams.sessionCounts(mem.toDF(), "ts", "30 minutes",
      "10 minutes", Seq(col("pk")))
    runToMemory(out, "sess_out", "complete")
    val got = spark.sql("select pk, n from sess_out order by pk, session_start")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (1L, 1L), (2L, 1L)))
  }
}
