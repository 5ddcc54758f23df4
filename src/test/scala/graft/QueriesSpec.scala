package graft

/** Smoke over the whole registered corpus at sf0.001: every query plans,
  * executes, and returns a schema; oracle-backed queries return rows.
  * (Value-level correctness is the driver's DuckDB gate — tools/check.py.) */
class QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** BroadcastExchange subtrees whose build side derives from a
    * GROUPED aggregate with no bounding construct in sight — the x205
    * lesson generalized: a `groupBy(term/token/...)` aggregate is
    * data-cardinality-sized (vocabulary-sized at corpus scale), so
    * broadcasting one is only safe when the subtree also contains a
    * restriction (a Join against a bounded set), a Limit /
    * TakeOrderedAndProject cut, or a literal LocalTableScan input.
    * The sweep runs under `autoBroadcastJoinThreshold = -1`, so every
    * BroadcastExchange left in a plan is FORCED by an explicit
    * `broadcast()` hint in our code — a claim of boundedness this
    * test audits. (Cost-based broadcasts are exempt by construction:
    * the planner re-decides them from statistics at real scale, which
    * is exactly the self-correction a hint bypasses.) Parsed from the
    * plan treeString (indentation = tree depth), which sees through
    * the AQE wrapper. */
  private def unboundedBroadcastAggs(planStr: String): Seq[String] = {
    val lines = planStr.linesIterator.toVector
    def ind(l: String): Int = {
      val i = l.indexWhere(c => !" :+-".contains(c))
      if (i < 0) Int.MaxValue else i
    }
    lines.indices.flatMap { i =>
      if (!lines(i).contains("BroadcastExchange")) None
      else {
        val d = ind(lines(i))
        val subLines = lines.drop(i + 1).takeWhile(ind(_) > d)
        val sub = subLines.mkString("\n")
        // the SHALLOWEST aggregate determines the broadcast's output
        // cardinality: keys=[] → one row (bounded) even when a deeper
        // grouped partial exists (e.g. the distinct-count expansion);
        // non-empty keys → data-cardinality-sized unless restricted.
        val topAgg = subLines.find(_.contains("Aggregate(keys=["))
        val groupedTop = topAgg.exists(!_.contains("Aggregate(keys=[]"))
        val bounded = sub.contains("Join") || sub.contains("Limit") ||
          sub.contains("TakeOrderedAndProject") ||
          sub.contains("LocalTableScan")
        if (groupedTop && !bounded)
          Some(lines(i).trim + "\n" + sub.take(400))
        else None
      }
    }
  }

  /** Hinted grouped-aggregate broadcasts that are JUSTIFIED — each
    * broadcast side's cardinality is bounded by something the plan
    * cannot show (a fixed-size slice of the data, not the corpus).
    * Every entry needs a reason; an unlisted hit fails the sweep. */
  private val boundedByDesign: Map[String, String] = Map(
    "x33_decontaminate" ->
      ("eval-slice distinct shingles: benchmarks are fixed-size by " +
        "nature; Dedup.decontaminate exposes broadcastBench=false " +
        "for the counter-case"),
    "x53_contamination_pairs" ->
      "same eval-slice shingle broadcast as x33",
    "x89_contamination" ->
      "bench-slice shingle sets (fixed benchmark, not corpus-sized)",
    "x35_scalar_quant" ->
      ("per-dimension min/max: cardinality = embedding dim d, a model " +
        "constant, never data-sized"),
    "x151_sq8_error" ->
      "same per-dimension stats broadcast as x35",
    "x37_count_min" ->
      ("sketch grid (depth×width literals): cardinality fixed by the " +
        "sketch parameters regardless of data"),
    "x41_heavy_change" ->
      "two count-min grids, same literal-bounded shape as x37",
    "x42_bloom_decontaminate" ->
      "bloom bit positions: cardinality ≤ m bits, a filter-size literal",
    "x211_token_label_mi" ->
      ("per-label doc totals: cardinality = |labels| (languages), a " +
        "category constant like x35's per-dim stats — the vocab-sized " +
        "side (n11/ni) is never broadcast"),
    "x213_simpson_audit" ->
      ("pooled-rate frame: the cohort agg is 2 rows (binary cohorts) " +
        "and the a<b pair 1 row; strata/cohort grids are " +
        "category-bounded, never unit-sized"),
    "x225_curriculum_interleave" ->
      ("stratum index table: one row per stratum (source/language " +
        "tier) — category-bounded like x213's cohort frame; the " +
        "per-document side is never broadcast"))

  test("every registered query executes at sf0.001") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (counts, flagged) =
      try {
        val perQuery = Queries.all.map { case (name, q) =>
          val frame = q(spark, dir)
          val bad = unboundedBroadcastAggs(
            frame.queryExecution.executedPlan.toString)
          (name -> frame.count(), name -> bad)
        }
        (perQuery.map(_._1),
          perQuery.map(_._2).filter(_._2.nonEmpty).toMap)
      }
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        prevThreshold)
    val unexplained = flagged -- boundedByDesign.keySet
    assert(unexplained.isEmpty,
      "queries broadcast-HINT an unrestricted grouped aggregate " +
        "(vocabulary-sized at corpus scale) with no boundedByDesign " +
        "justification:\n" +
        unexplained.map { case (n, b) =>
          s"$n:\n${b.mkString("\n---\n")}" }.mkString("\n====\n"))
    val empties = counts.filter(_._2 == 0).keySet
    // hash/LSH candidate queries may legitimately be empty at tiny scale;
    // everything else must produce rows
    val allowedEmpty = Set("q16_anti_fk", "q24_set_ops", "x02_ngram_jaccard",
      "x03_minhash_lsh", "x04_simhash", "x05_embed_neardup", "x07_lsh_ann")
    assert((empties -- allowedEmpty).isEmpty,
      s"unexpectedly empty: ${empties -- allowedEmpty}")
  }

  test("queries and oracles stay in sync") {
    assert(Oracles.all.keySet.subsetOf(Queries.all.keySet))
    val noOracle = Queries.all.keySet -- Oracles.all.keySet
    assert(noOracle.isEmpty,
      s"queries silently missing an oracle: $noOracle")
  }

  test("entry returns rows (t1 smoke shape)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
