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
    if (args.contains("r15")) { r15Stages(spark, dir); spark.stop(); return }
    if (args.contains("r15b")) { r15StagesB(spark, dir); spark.stop(); return }
    if (args.contains("r15c")) { r15StagesC(spark, dir); spark.stop(); return }
    if (args.contains("r16")) { r16Stages(spark, dir, args.drop(1)); spark.stop(); return }
    if (args.contains("r16post")) {
      // FINAL (post-execution, AQE-resolved) plan for the given queries —
      // runtime exchange/stage reuse is invisible in the pre-execution
      // explain, so plan-reuse claims are checked here
      args.drop(1).filter(Queries.all.contains).foreach { q =>
        val df = Queries.all(q)(spark, dir)
        df.collect() // executes df's OWN QueryExecution (count() plans a new one)
        println(s"\n========== $q (final) ==========")
        df.explain("formatted")
      }
      spark.stop(); return
    }
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

  /** Round-15 stage timings for the bench top offenders — which stage
    * of each expensive query actually holds the wall-clock. */
  def r15Stages(spark: SparkSession, dir: String): Unit = {
    import graft.sources.Tables
    import graft.ext.{Dedup, TextAnalysis, DistinctSketch, Similarity}

    // ---- x131: plain all-pairs jaccard vs prefix/positional at t=0.3
    def shDocs = Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.shingles(col("text"), 3).as("sh"))
    (1 to 2).foreach { i =>
      time(s"x131 plain      run $i")(
        Dedup.jaccardPairs(shDocs, "doc_id", "sh", 0.3).count())
      time(s"x131 prefix+pos run $i")(
        Dedup.jaccardPairsPrefix(shDocs, "doc_id", "sh", 0.3).count())
      time(s"x131 prefix-pos run $i")(
        Dedup.jaccardPairsPrefix(shDocs, "doc_id", "sh", 0.3,
          positional = false).count())
    }
    val pl = Dedup.jaccardPairs(shDocs, "doc_id", "sh", 0.3)
    val pr = Dedup.jaccardPairsPrefix(shDocs, "doc_id", "sh", 0.3)
    println("[probe] x131 plain\\prefix=" + pl.except(pr).count() +
      " prefix\\plain=" + pr.except(pl).count())

    // ---- x117: containment — NEW prefix-filtered vs OLD plain join
    val base131 = shDocs.select(col("doc_id").as("id"),
      Dedup.hashedShingles(col("sh")).as("hs"))
    def oldContainment = {
      val tok = base131.select(col("id"), explode(col("hs")).as("h"))
      val candidates = tok.as("a").join(tok.as("b"),
          col("a.h") === col("b.h") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .dropDuplicates("id_a", "id_b")
      val sa = base131.select(col("id").as("id_a"), col("hs").as("hs_a"))
      val sb = base131.select(col("id").as("id_b"), col("hs").as("hs_b"))
      candidates.join(sa, Seq("id_a")).join(sb, Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("hs_a"), col("hs_b"))).cast("long")
            .as("shared"),
          size(col("hs_a")).cast("long").as("n_a"),
          size(col("hs_b")).cast("long").as("n_b"))
        .withColumn("c_a_in_b",
          col("shared").cast("double") / col("n_a").cast("double"))
        .withColumn("c_b_in_a",
          col("shared").cast("double") / col("n_b").cast("double"))
        .where(greatest(col("c_a_in_b"), col("c_b_in_a")) >= 0.9)
    }
    (1 to 2).foreach { i =>
      time(s"x117 old run $i")(oldContainment.count())
      time(s"x117 new run $i")(
        Dedup.containmentPairs(shDocs, "doc_id", "sh", 0.9).count())
    }
    val cNew = Dedup.containmentPairs(shDocs, "doc_id", "sh", 0.9)
    println("[probe] x117 old\\new=" + oldContainment.except(cNew).count() +
      " new\\old=" + cNew.except(oldContainment).count())

    // ---- clusters() rounds on the winnow pair graph
    val wp = Dedup.winnowPairs(Tables.documents(spark, dir), "doc_id",
      "text", k = 3, w = 4, minShared = 2L, maxDf = 50L)
      .localCheckpoint(true)
    println("[probe] winnow pairs n=" + wp.count())
    (1 to 2).foreach { i =>
      time(s"clusters(winnow)   run $i")(Dedup.clusters(wp).count())
      time(s"clustersDbl(winnow) run $i")(Dedup.clustersDoubling(wp).count())
    }

    // ---- x170: simhash pair build vs labeling
    val sp = time("x170 simhash pairs build")(
      Dedup.weightedSimhashPairs(Tables.documents(spark, dir), "doc_id",
        "text", bits = 32, bands = 4, maxHamming = 3).localCheckpoint(true))
    println("[probe] simhash pairs n=" + sp.count())
    time("x170 labelsFromPairs")(
      Dedup.labelsFromPairs(Tables.documents(spark, dir), "doc_id", sp)
        .count())

    // ---- x101: vector build vs all-pairs stage
    val vecs = time("x101 featureHashVector")(
      TextAnalysis.featureHashVector(Tables.documents(spark, dir),
        "doc_id", "text", dim = 64).localCheckpoint(true))
    println("[probe] vecs n=" + vecs.count())
    time("x101 pairs on cp vecs")(
      Similarity.nearDupPairs(vecs, "id", "vec", 0.95).count())

    // ---- x147/x167: sketch build vs pair fan-out
    def toks2 = Tables.documents(spark, dir)
      .select(col("source"),
        explode(TextAnalysis.shingles(col("text"), 2)).as("tok"))
    time("x147 kmvPartial only")(
      DistinctSketch.kmvPartial(toks2, "source", col("tok"), 128).count())
    time("x147 full")(
      DistinctSketch.kmvPairJaccard(toks2, "source", col("tok"), 128)
        .count())
    time("x167 hllRegisters only")(
      DistinctSketch.hllRegisters(toks2, "source", col("tok"), 8).count())
    time("x167 full")(
      DistinctSketch.hllPairUnion(toks2, "source", col("tok"), 8).count())

    // ---- x112: scan vs join vs agg
    val epoch = to_date(lit("1970-01-01"))
    val points = Tables.lineitem(spark, dir).select(
      datediff(col("l_shipdate"), epoch).cast("long").as("ship_day"),
      col("l_quantity"))
    time("x112 points scan")(points.count())
    val iv = Tables.orders(spark, dir).where(col("o_totalprice") > 400000)
      .select(col("o_orderkey"),
        datediff(col("o_orderdate"), epoch).cast("long").as("win_start"))
      .withColumn("win_end", col("win_start") + lit(3L))
    time("x112 iv scan")(iv.count())
    time("x112 join only")(graft.operators.RangeJoin.pointInInterval(
      points, col("ship_day"), iv, col("win_start"), col("win_end"), 4L)
      .count())
    time("x112 full")(Queries.all("x112_range_join")(spark, dir).count())
  }

  /** Second r15 batch: x85 / x73 / sketch-family deep dives. */
  def r15StagesB(spark: SparkSession, dir: String): Unit = {
    import graft.sources.Tables
    import graft.ext.{Dedup, TextAnalysis}

    // ---- x85 stages
    val docs = Tables.documents(spark, dir)
    val chunks = TextAnalysis.chunkTokens(docs, "doc_id", "text", 32, 32)
      .withColumn("ckey",
        col("id").cast("long") * lit(1000000L) + col("chunk_id"))
    time("x85 chunks")(chunks.count())
    val sh85 = chunks.select(col("ckey"),
      TextAnalysis.shingles(col("chunk_text"), 3).as("sh"))
    val p85 = time("x85 pairs (prefix)")(
      Dedup.jaccardPairsPrefix(sh85, "ckey", "sh", 0.6)
        .localCheckpoint(true))
    println("[probe] x85 pairs n=" + p85.count())
    time("x85 clusters")(
      Dedup.clusters(p85, idA = "d1", idB = "d2").count())
    time("x85 full")(
      Queries.all("x85_chunk_near_dedup")(spark, dir).count())

    // ---- x73 stages
    val imp = time("x73 importance build")(
      TextAnalysis.importanceRatioScore(docs, "doc_id", "text",
        target = docs.where(col("lang") === "en"), smoothK = 0.5)
        .localCheckpoint(true))
    println("[probe] x73 imp n=" + imp.count())
    time("x73 tail after cp")({
      val withSrc = imp
        .join(docs.select(col("doc_id").as("id"), col("source")), Seq("id"))
        .where(col("importance").isNotNull)
        .select(col("id"), col("source"), col("importance"))
      TextAnalysis.calibrate(withSrc, col("source"), col("importance"),
        col("id"))
        .where(col("pct") >= 0.5).count()
    })
    time("x73 full")(Queries.all("x73_dsir_select")(spark, dir).count())
    time("x73 full 2nd")(Queries.all("x73_dsir_select")(spark, dir).count())

    // ---- x238 stages
    time("x238 full")(
      Queries.all("x238_linkage_roundtrip")(spark, dir).count())
    // ---- x55 / x176 / x223 / x159 / x212 full-only (min-of-2)
    Seq("x55_opq_encode", "x176_stationary_mix", "x223_cluster_density",
      "x159_split_leakage", "x212_rbo_agreement", "x205_prf_expand",
      "x121_source_overlap", "x169_ndcg_grid", "x179_lsh_index_roundtrip",
      "x84_bm25_maxp", "x86_bm25_topk", "x103_dedup_histogram")
      .foreach { q =>
        (1 to 2).foreach { i =>
          time(s"$q run $i")(Queries.all(q)(spark, dir).count())
        }
      }
  }

  /** Third r15 batch: weightedSimhash stage split — which of polyHash,
    * the 32-decimal-sum signature agg, and the band join holds x99/x170's
    * pair-build wall. */
  def r15StagesC(spark: SparkSession, dir: String): Unit = {
    import graft.sources.Tables
    import graft.ext.{Dedup, TextAnalysis, DistinctSketch}
    import org.apache.spark.sql.types.DecimalType
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id").as("id"),
      explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    time("tf agg")(tf.count())
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("long").as("n"))
    val idf = dfc.crossJoin(broadcast(n))
      .select(col("term"),
        log(col("n").cast("double") / col("df"))
          .cast(DecimalType(28, 12)).as("idf"))
    val wgtPoly = tf.join(idf, Seq("term"))
      .select(col("id"),
        (Dedup.polyHash(col("term")) * lit(1073741824L) +
          Dedup.polyHash(reverse(col("term")))).as("__h"),
        (col("tf").cast(DecimalType(9, 0)) * col("idf")).as("__w"))
    val wgtXx = tf.join(idf, Seq("term"))
      .select(col("id"), xxhash64(col("term")).as("__h"),
        (col("tf").cast(DecimalType(9, 0)) * col("idf")).as("__w"))
    time("wgt with polyHash")(wgtPoly.count())
    time("wgt with xxhash64")(wgtXx.count())
    def sigOf(wgt: org.apache.spark.sql.DataFrame) = {
      val sums = (0 until 32).map(j =>
        sum(when(shiftright(col("__h"), j).bitwiseAND(lit(1L)) === 1,
          col("__w")).otherwise(-col("__w"))).as(s"__s$j"))
      wgt.groupBy(col("id")).agg(sums.head, sums.tail: _*)
        .select(col("id"),
          (0 until 32).map(j =>
            when(col(s"__s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
            .reduce(_ + _).as("simhash"))
    }
    time("sig 32-decimal-sum agg (poly)")(sigOf(wgtPoly).count())
    time("sig 32-decimal-sum agg (xx)")(sigOf(wgtXx).count())
    val sig = sigOf(wgtPoly).localCheckpoint(true)
    time("band join + verify") {
      val width = 8; val mask = (1L << width) - 1L
      val bandRows = sig.select(col("id"), posexplode(
          array((0 until 4).map(b =>
            shiftright(col("simhash"), b * width).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "v")))
      val cand = bandRows.select(col("id").as("id_a"), col("band"), col("v"))
        .join(bandRows.select(col("id").as("id_b"), col("band"), col("v")),
          Seq("band", "v"))
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      cand
        .join(sig.select(col("id").as("id_a"), col("simhash").as("__sa")),
          Seq("id_a"))
        .join(sig.select(col("id").as("id_b"), col("simhash").as("__sb")),
          Seq("id_b"))
        .withColumn("hamming", bit_count(col("__sa").bitwiseXOR(col("__sb"))))
        .where(col("hamming") <= 3)
        .count()
    }
    // new-vs-old sketch pair stages (values must be identical)
    def toks2 = docs.select(col("source"),
      explode(TextAnalysis.shingles(col("text"), 2)).as("tok"))
    (1 to 2).foreach { i =>
      time(s"x147 full run $i")(
        DistinctSketch.kmvPairJaccard(toks2, "source", col("tok"), 128)
          .count())
      time(s"x167 full run $i")(
        DistinctSketch.hllPairUnion(toks2, "source", col("tok"), 8)
          .count())
    }
    println("[probe] x167 sample=" + DistinctSketch.hllPairUnion(
      toks2, "source", col("tok"), 8).orderBy("src_a", "src_b")
      .limit(2).collect().mkString("; "))
    println("[probe] x147 sample=" + DistinctSketch.kmvPairJaccard(
      toks2, "source", col("tok"), 128).orderBy("src_a", "src_b")
      .limit(2).collect().mkString("; "))
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

  /** r16 batch: full-query min-of-2 probes for the round's target set —
    * pass query names after `r16` (defaults to the r16 headline set). */
  def r16Stages(spark: SparkSession, dir: String, names: Seq[String]): Unit = {
    val qs = if (names.nonEmpty) names
      else Seq("x176_stationary_mix", "x99_weighted_simhash",
        "x170_simhash_clusters", "x73_dsir_select", "x92_winnow_pairs",
        "x97_feature_hash", "x147_kmv_pair_jaccard", "x175_chi_square")
    qs.filter(Queries.all.contains).foreach { q =>
      (1 to 2).foreach { i =>
        time(s"$q run $i")(Queries.all(q)(spark, dir).count())
      }
    }
  }
}
