package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main — times sub-stages of the hot extension queries. */
object Probe {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("asof")) { asofBench(spark); spark.stop(); return }
    if (args.contains("x96ab")) { x96Ab(spark, dir); spark.stop(); return }
    if (args.contains("x106ab")) { x106Ab(spark, dir); spark.stop(); return }
    import graft.sources.Tables
    import graft.ext.{Dedup, TextAnalysis}

    val docs = Tables.documents(spark, dir)
    time("docs count")(docs.count())
    val sh = docs.select(col("doc_id"),
      TextAnalysis.shingles(col("text"), 3).as("sh"))
    time("shingles")(sh.count())
    time("shingle stats")(println(sh.select(
      sum(size(col("sh"))), max(size(col("sh")))).collect().mkString))
    val hs = sh.select(col("doc_id"), Dedup.hashedShingles(col("sh")).as("hs"))
    time("hashed shingles")(hs.count())
    val sig = hs.select(col("doc_id"),
      graft.functions.expressions.VectorExpressions
        .minhashSignature(col("hs"), 32).as("sig"))
    time("signatures")(sig.count())
    time("x03 full")(Queries.all("x03_minhash_lsh")(spark, dir).count())
    // x02 stages
    val tok = sh.select(col("doc_id"), explode(col("sh")).as("s")).distinct()
    time("tok explode distinct")(tok.count())
    val tokH = sh.select(col("doc_id"),
      explode(Dedup.hashedShingles(col("sh"))).as("h"))
    time("tokH explode")(tokH.count())
    val inter = tokH.as("a").join(tokH.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id"), col("b.doc_id")).count()
    time("posting join pairs")(println(inter.agg(count(lit(1)),
      sum(col("count"))).collect().mkString))
    time("x02 full")(Queries.all("x02_ngram_jaccard")(spark, dir).count())
    time("x02 full 2nd")(Queries.all("x02_ngram_jaccard")(spark, dir).count())
    // hypothesis: the shingle projection is recomputed 4x (df count,
    // anti-join input, self-join, verify) — time the same pipeline over
    // an eagerly materialized base
    val baseCp = time("base localCheckpoint") {
      docs.select(col("doc_id").as("id"),
        Dedup.hashedShingles(TextAnalysis.shingles(col("text"), 3)).as("hs"))
        .localCheckpoint()
    }
    time("x02 on checkpointed base") {
      val tokc = baseCp.select(col("id"), explode(col("hs")).as("h"))
      val hot = tokc.groupBy("h").agg(count(lit(1)).as("df"))
        .where(col("df") > 64).select("h")
      val capped = tokc.join(hot, Seq("h"), "left_anti")
      val cands = capped.as("a").join(capped.as("b"),
          col("a.h") === col("b.h") && col("a.id") < col("b.id"))
        .select(col("a.id").as("d1"), col("b.id").as("d2"))
        .dropDuplicates("d1", "d2")
      val sa = baseCp.select(col("id").as("d1"), col("hs").as("hs_a"))
      val sb = baseCp.select(col("id").as("d2"), col("hs").as("hs_b"))
      cands.join(sa, "d1").join(sb, "d2")
        .withColumn("jaccard",
          size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
            size(array_union(col("hs_a"), col("hs_b"))))
        .where(col("jaccard") >= 0.6)
        .select(col("d1"), col("d2"), col("jaccard"))
        .orderBy("d1", "d2").count()
    }
    spark.stop()
  }

  /** Paired same-JVM A/B: the x106 KMV sketch as-is (dv derived twice —
    * the NOTES "three corpus scans" lead) vs a localCheckpointed dv
    * shared by the stats agg and the hash ranking. */
  def x106Ab(spark: SparkSession, dir: String): Unit = {
    import graft.ext.{DistinctSketch, TextAnalysis}
    import graft.sources.Tables
    def toks = Tables.documents(spark, dir)
      .select(col("source"),
        explode(TextAnalysis.shingles(col("text"), 2)).as("tok"))
    def current(): Long =
      DistinctSketch.kmv(toks, "source", col("tok"), k = 64).count()
    def checkpointed(): Long = {
      val vals = toks.select(col("source").as("g"), col("tok").as("v"))
        .where(col("v").isNotNull)
      val dv = vals.distinct().localCheckpoint(true)
      val dh = dv.select(col("g"),
        DistinctSketch.compositeHash(col("v")).as("h")).distinct()
      val stats = dv.groupBy("g").agg(count(lit(1)).as("exact_distinct"))
      stats.join(DistinctSketch.kmvEstimate(dh, 64), Seq("g")).count()
    }
    (1 to 2).foreach { i =>
      time(s"x106 current      run $i")(current())
      time(s"x106 checkpointed run $i")(checkpointed())
    }
  }

  /** Paired same-JVM A/B: corpusPrep with plain label propagation vs
    * pointer doubling in the winnowing near-dedup stage — the x96
    * latency is sequential propagation rounds, so the round count is
    * the contest. Interleaved 2×2 (the separate-process drift lesson). */
  def x96Ab(spark: SparkSession, dir: String): Unit = {
    import graft.sources.Tables
    import graft.ext.Pipeline
    val d = Tables.documents(spark, dir)
    def run(doubling: Boolean): Long =
      Pipeline.corpusPrep(d.where(col("doc_id") >= 20),
        d.where(col("doc_id") < 20), "doc_id", "text", "lang",
        doubling = doubling).count()
    (1 to 2).foreach { i =>
      time(s"x96 plain    run $i")(run(doubling = false))
      time(s"x96 doubling run $i")(run(doubling = true))
    }
  }

  /** Micro-bench for the AsOfJoinExec merge loop: synthetic 8M×2M join
    * over 200k keys, inputs pre-materialized so the timed region is
    * dominated by exchange+sort+merge, and the merge-loop delta shows up
    * across runs of the same build. */
  def asofBench(spark: SparkSession): Unit = {
    val left = spark.range(8000000L).selectExpr(
      "id % 200000 AS k", "CAST(id / 200000 AS LONG) * 10 + 5 AS t", "id AS payload")
      .localCheckpoint()
    val right = spark.range(2000000L).selectExpr(
      "id % 200000 AS k", "CAST(id / 200000 AS LONG) * 37 AS t", "id AS rv")
      .localCheckpoint()
    (1 to 3).foreach { i =>
      time(s"asof 8M x 2M run $i")(
        graft.plans.AsOfJoin(left, right, Seq("k"), "t", "t").count())
    }
  }
}
