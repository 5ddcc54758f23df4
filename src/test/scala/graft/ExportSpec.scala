package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Export

/** Export sinks + bulk restore: CSV round trip with header/nullValue,
  * trunc-scaled dolt projection, PERMISSIVE bad-row quarantine (S8, Q5,
  * S11). */
class ExportSpec extends SparkSpec {
  import spark.implicits._

  test("daily csv export round-trips with NULL-as-empty-string") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val df = Seq(
      ("2024-01-15", "AAA", "10.5", Some("1.25")),
      ("2024-01-15", "BBB", "20.0", None),
      ("2024-01-16", "AAA", "11.0", Some("1.50")))
      .toDF("ds", "act_symbol", "strike", "bid")
      .select(to_date($"ds").as("date"), $"act_symbol",
        $"strike".cast(DecimalType(18, 2)).as("strike"),
        $"bid".cast(DecimalType(18, 2)).as("bid"))
    Export.writeDailyCsv(df, s"$tmp/out")
    // partition pruning applies on read; NULL round-trips via nullValue=""
    val back = spark.read.option("header", "true").option("nullValue", "")
      .csv(s"$tmp/out")
    assert(back.count() == 3)
    assert(back.where($"date" === "2024-01-15").count() == 2)
    assert(back.where($"bid".isNull).count() == 1)
  }

  test("restore: PERMISSIVE read quarantines bad rows, keeps good ones") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_restore").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$tmp/in.csv"),
      """act_symbol,strike,bid
        |AAA,95.0,6.10
        |BBB,not-a-number,1.0
        |CCC,7.5,
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("act_symbol", StringType),
      StructField("strike", DoubleType),
      StructField("bid", DoubleType)))
    val (good, bad) = Export.readCsvRestore(spark, s"$tmp/in.csv", schema)
    assert(good.count() == 2) // AAA and CCC (empty bid → NULL is fine)
    assert(bad.count() == 1)  // BBB quarantined, not job-fatal
    assert(rows(good.where($"act_symbol" === "CCC")).head.isNullAt(2))
  }

  test("dolt projection truncates bid/ask to 2 and greeks to 4") {
    val df = Seq(("2024-01-15", "AAA", "2024-01-26", "95.0", "Call",
      "6.119", "6.391", "6.25", "0.25559", "0.72999", "0.031", "-0.045",
      "0.112", "0.05"))
      .toDF("ds", "act_symbol", "es", "strike_s", "call_put", "bid_s",
        "ask_s", "mv", "vol_s", "delta_s", "gamma_s", "theta_s", "vega_s",
        "rho_s")
      .select(to_date($"ds").as("date"), $"act_symbol",
        to_date($"es").as("expiration"),
        $"strike_s".cast(DecimalType(38, 4)).as("strike"), $"call_put",
        $"bid_s".cast(DecimalType(38, 4)).as("bid"),
        $"ask_s".cast(DecimalType(38, 4)).as("ask"),
        $"mv".cast(DecimalType(38, 4)).as("model_value"),
        $"vol_s".cast(DecimalType(38, 5)).as("vol"),
        $"delta_s".cast(DecimalType(38, 5)).as("delta"),
        $"gamma_s".cast(DecimalType(38, 4)).as("gamma"),
        $"theta_s".cast(DecimalType(38, 4)).as("theta"),
        $"vega_s".cast(DecimalType(38, 4)).as("vega"),
        $"rho_s".cast(DecimalType(38, 4)).as("rho"))
    val r = rows(Export.doltChainProjection(df)).head
    assertDecEq(r.getAs[java.math.BigDecimal]("bid"), "6.11")
    assertDecEq(r.getAs[java.math.BigDecimal]("ask"), "6.39")
    assertDecEq(r.getAs[java.math.BigDecimal]("vol"), "0.2555")
    assertDecEq(r.getAs[java.math.BigDecimal]("delta"), "0.7299")
  }

  test("range-sorted export: disjoint sorted runs, file order is global order") {
    val src = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val path = java.nio.file.Files
      .createTempDirectory("graft_range_sorted").toString
    try {
      Export.writeRangeSorted(src, path, 4, Seq("o_orderkey"))
      val parts = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      assert(parts.length > 1, "expected multiple sorted runs")
      // each file internally sorted; ranges strictly disjoint in file order
      var prevMax = Long.MinValue
      parts.foreach { f =>
        val keys = rows(spark.read.parquet(f.toString).select($"o_orderkey"))
          .map(_.getLong(0))
        assert(keys == keys.sorted, s"${f.getName} is not a sorted run")
        if (keys.nonEmpty) {
          assert(keys.head > prevMax,
            s"${f.getName} overlaps the previous run ($prevMax)")
          prevMax = keys.last
        }
      }
      // lossless: the concatenation is exactly the source
      val back = rows(spark.read.parquet(path).orderBy("o_orderkey"))
        .map(_.toString)
      val orig = rows(src.orderBy("o_orderkey")).map(_.toString)
      assert(back == orig)
      // the manifest sees the same structure as the file loop above:
      // every row accounted for, ranges disjoint in min_key order
      val mf = rows(Export.manifest(spark.read.parquet(path), "o_orderkey")
        .orderBy("min_key"))
        .map(r => (r.getAs[Long]("rows"), r.getAs[Long]("min_key"),
          r.getAs[Long]("max_key")))
      assert(mf.map(_._1).sum == src.count())
      mf.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 < b._2, "manifest ranges overlap")
        case _ =>
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }

  test("jsonl export: sorted disjoint shards, escaping-safe, bad lines quarantined") {
    import org.apache.spark.sql.types._
    val src = Seq(
      (1L, "plain text"),
      (2L, "quotes \" and \\ backslash"),
      (3L, "newline\nand\ttab"),
      (4L, "unicode 中文 ü"),
      (5L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    try {
      Export.writeJsonl(src, path, 2, Seq("id"))
      // shard files are sorted runs in file order (same contract as
      // writeRangeSorted, in the interchange format)
      val parts = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".json")).sortBy(_.getName)
      assert(parts.length > 1)
      var prevMax = Long.MinValue
      val schema = StructType(Seq(StructField("id", LongType),
        StructField("text", StringType)))
      parts.foreach { f =>
        val keys = rows(spark.read.schema(schema).json(f.toString)
          .select($"id")).map(_.getLong(0))
        assert(keys == keys.sorted && (keys.isEmpty || keys.head > prevMax))
        if (keys.nonEmpty) prevMax = keys.last
      }
      // inject a malformed line; restore must quarantine it and round-trip
      // every document — including escapes, unicode, and null — exactly
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(path, "zz_bad.json"), "{broken\n")
      val (good, bad) = Export.readJsonlRestore(spark, path, schema)
      assert(bad.count() == 1)
      val back = rows(good.orderBy("id")).map(_.toString)
      assert(back == rows(src.orderBy("id")).map(_.toString))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }

  test("manifest-driven export: corpusPrep kept set round-trips through JSONL shards") {
    import graft.ext.Pipeline
    def words(stem: String, n: Int) =
      "the a " + (1 to n).map(i => f"$stem$i%02d").mkString(" ")
    val train = Seq(
      (20L, words("aw", 50), "en"), (21L, "junk", "en"),
      (22L, words("cw", 51), "en"), (23L, words("cw", 51), "en"),
      (24L, words("hw", 52), "en"), (25L, words("iw", 53), "en"))
      .toDF("doc_id", "text", "lang")
    val bench = Seq((1L, words("zw", 60), "en")).toDF("doc_id", "text", "lang")
    val manifest = Pipeline.corpusPrep(train, bench, "doc_id", "text", "lang")
    val kept = train.join(
      manifest.where($"kept").select($"id".as("doc_id")), Seq("doc_id"))
    val dir = java.nio.file.Files.createTempDirectory("graft_mex")
    try {
      val path = dir.resolve("shards").toString
      graft.operators.Export.writeJsonl(kept, path, n = 2, keys = Seq("doc_id"))
      val (good, bad) = graft.operators.Export.readJsonlRestore(spark,
        path, kept.schema)
      assert(bad.count() == 0)
      // the restored training shards ARE the kept set, row for row
      assert(rows(good.orderBy("doc_id")).map(_.toString) ==
        rows(kept.orderBy("doc_id")).map(_.toString))
      assert(good.count() == 4) // 21 fails quality, 23 is the exact dup
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("writeJsonlSharded: deterministic token-budgeted shards, disk-derived manifest") {
    val src = Seq(
      (1L, 500L), (2L, 400L), (3L, 300L), // cum_prev 0, 500, 900
      (4L, 900L),                         // cum_prev 1200 → shard 1
      (5L, 100L), (6L, 2500L),            // cum_prev 2100, 2200 → shard 2
      (7L, 10L))                          // cum_prev 4700 → shard 4
      .toDF("doc_id", "n_tokens")
      .withColumn("text", concat(lit("doc "), $"doc_id"))
    val dir = java.nio.file.Files.createTempDirectory("graft_shex")
    try {
      val path = dir.resolve("shards").toString
      val man = graft.operators.Export.writeJsonlSharded(src, path,
        "doc_id", "n_tokens", shardTokens = 1000L)
      val got = rows(man).map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
      // greedy packing: a doc starts a new shard when the running total
      // crosses the boundary; shard ids skip when one doc spans budgets
      assert(got == Seq(
        (0L, 3L, 1200L, 1L, 3L),
        (1L, 1L, 900L, 4L, 4L),
        (2L, 2L, 2600L, 5L, 6L),
        (4L, 1L, 10L, 7L, 7L)))
      // the layout is directory-partitioned by shard id
      val shardDirs = new java.io.File(path).listFiles()
        .filter(_.isDirectory).map(_.getName).sorted
      assert(shardDirs.toSeq ==
        Seq("shard_id=0", "shard_id=1", "shard_id=2", "shard_id=4"))
      // every source row survives the round trip exactly
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("doc_id", LongType),
        StructField("n_tokens", LongType), StructField("text", StringType),
        StructField("shard_id", LongType)))
      val back = spark.read.schema(schema).json(path)
      assert(rows(back.select($"doc_id", $"n_tokens", $"text")
          .orderBy("doc_id")).map(_.toString) ==
        rows(src.select($"doc_id", $"n_tokens", $"text")
          .orderBy("doc_id")).map(_.toString))
      // prefix-sum ids, not sampled ranges: a second export of the same
      // snapshot produces the identical manifest
      val man2 = graft.operators.Export.writeJsonlSharded(src,
        dir.resolve("shards2").toString, "doc_id", "n_tokens", 1000L)
      assert(rows(man2).map(_.toString) == rows(man).map(_.toString))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }
}
