package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped quantiles for corpus statistics (doc-length percentiles per
  * language, token budgets per split, …).
  *
  * Two paths, same signature:
  *  - [[discrete]] — EXACT discrete quantiles (the value at rank
  *    ceil(p·n), lower quantile-disc semantics). Rank arithmetic is pure
  *    integer math (`ceil(num·n / den)` as `(num·n + den − 1) div den`),
  *    so the result is engine-reproducible bit-for-bit — no IEEE ceil
  *    edge cases — and oracle-checkable (x28). One shuffle on the group
  *    key + a per-group sort; the per-group sort is the scale cost,
  *    which is exactly why the approximate path exists.
  *  - [[approx]] — `percentile_approx` (Greenwald–Khanna style sketch):
  *    bounded-size partial buffers merge map-side, so the shuffle
  *    carries one sketch per (partition, group) regardless of group
  *    size. The 100 TB path; ScalaTest bounds its error against
  *    [[discrete]].
  *
  * `ps` are (numerator, denominator, label) rationals — p50 = (1, 2,
  * "p50") — kept rational precisely so the exact path never multiplies
  * doubles.
  */
object Quantiles {

  /** Exact discrete quantiles: one output row per group with a `<label>`
    * column per requested quantile plus `n`. Equal values make the rank
    * choice order-insensitive (any tie permutation yields the same value
    * at a given rank), so `orderBy(value)` alone is deterministic. */
  def discrete(df: DataFrame, groupCols: Seq[String], value: Column,
      ps: Seq[(Int, Int, String)]): DataFrame = {
    val part = Window.partitionBy(groupCols.map(col): _*)
    val ranked = df
      .withColumn("_v", value)
      .withColumn("_rn", row_number().over(part.orderBy(col("_v"))))
      .withColumn("_n", count(lit(1)).over(part))
    val aggs = ps.map { case (num, den, label) =>
      // ceil(num*n/den) = (t - t%den)/den with t = num*n + den - 1: the
      // subtraction makes the dividend an exact multiple of den, so the
      // double division is exact (no IEEE ceil/floor edge) and the rank
      // matches the oracle's integer `//` bit-for-bit
      val t = lit(num.toLong) * col("_n") + lit(den.toLong - 1L)
      val rank = greatest(lit(1L),
        ((t - pmod(t, lit(den.toLong))) / lit(den.toLong)).cast("long"))
      max(when(col("_rn") === rank, col("_v"))).as(label)
    } :+ max(col("_n")).as("n")
    ranked.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Sketch-based quantiles, same output shape as [[discrete]]. */
  def approx(df: DataFrame, groupCols: Seq[String], value: Column,
      ps: Seq[(Int, Int, String)], accuracy: Int = 10000): DataFrame = {
    val aggs = ps.map { case (num, den, label) =>
      percentile_approx(value, lit(num.toDouble / den), lit(accuracy))
        .as(label)
    } :+ count(lit(1)).as("n")
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** 2× the interpolated median of an INTEGRAL column, per group, as an
    * exact integer: the sum of the lower and upper middle order
    * statistics (equal when n is odd). Keeping the doubling explicit is
    * what lets [[robustZ]] run median-of-integers arithmetic with no
    * floating point until the final division. */
  private def median2(df: DataFrame, groupCols: Seq[String],
      value: Column, out: String): DataFrame = {
    val part = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("_v", value)
      .withColumn("_rn", row_number().over(part.orderBy(col("_v"))))
      .withColumn("_n", count(lit(1)).over(part))
      .groupBy(groupCols.map(col): _*)
      .agg((max(when(col("_rn") * 2 === col("_n") + pmod(col("_n"), lit(2)),
          col("_v"))) +
        max(when(col("_rn") * 2 === col("_n") + 2 - pmod(col("_n"), lit(2)),
          col("_v")))).as(out))
  }

  /** Robust per-group z-score (median/MAD, the Iglewicz–Hoaglin outlier
    * rule): z = (v − median) / (c · MAD) with c = 1.4826 (the normal
    * consistency constant), outlier iff |z| > `cut`. The robust
    * estimators resist exactly the heavy-tailed length/score
    * distributions web corpora have, where mean/stddev clipping chases
    * its own outliers.
    *
    * Exactness discipline: `value` must be integral; 2·median and
    * 4·MAD are computed as exact integers (sums of middle order
    * statistics — [[median2]]), so the ONLY floating-point step is the
    * final `2·(2v − med2) / (c · mad4)` — one double multiply and one
    * divide, bit-identical in any engine. MAD = 0 (over half the group
    * identical) yields NULL z and `outlier = false`, never ±Inf.
    * Output: every input row + (z, outlier).
    * Scale: two window sorts + two group aggs keyed by the group
    * columns — the exact-median cost ([[discrete]]'s caveat); at
    * 100 TB per-group, swap the medians for [[approx]] sketches, same
    * downstream arithmetic. */
  def robustZ(df: DataFrame, groupCols: Seq[String], value: Column,
      c: Double = 1.4826, cut: Double = 3.5): DataFrame = {
    val med = median2(df, groupCols, value, "_med2")
    val withMed = df.withColumn("_v", value.cast("long"))
      .join(med, groupCols)
    val mad = median2(withMed, groupCols,
      abs(col("_v") * 2 - col("_med2")), "_mad4")
    val z = when(col("_mad4") > 0,
      (col("_v") * 2 - col("_med2")).cast("double") * 2 /
        (lit(c) * col("_mad4")))
    withMed.join(mad, groupCols)
      .withColumn("z", z)
      .withColumn("outlier", coalesce(abs(col("z")) > cut, lit(false)))
      .drop("_v", "_med2", "_mad4")
  }

  /** QUANTILE NORMALIZATION across groups (the microarray batch-
    * correction recipe — Bolstad et al. 2003 — generalized to unequal
    * group sizes): each group's value distribution is mapped onto the
    * POOLED distribution's quantiles, so per-source score scales
    * become comparable before a global threshold is applied ("source
    * A's perplexities run hot" stops mattering). A value with
    * in-group ECDF rank r of n maps to the pooled value at rank
    * ⌈r·N/n⌉ — pure integer arithmetic (the [[discrete]] rank
    * discipline), so the mapping is engine-exact with no
    * interpolation to disagree on.
    *
    * Scale shape: everything runs on COUNT GRIDS — per-(group, value)
    * counts with grid-bounded cumulative windows, the pooled grid's
    * cumulative, and the target-rank lookup as the x214 bucket-cut
    * range join (each target hits exactly one pooled bucket). Output
    * grain is (group, value) — distinct pairs, not rows; joining back
    * to rows is the caller's one equi-join.
    * Output: (group, v, n_gv, rank_in_group, norm_v). */
  def quantileNormalize(df: DataFrame, group: Column, value: Column)
      : DataFrame =
    quantileNormalizeFromCounts(df.select(group.as("group"), value.as("v"))
      .groupBy("group", "v").agg(count(lit(1)).as("n_gv")))

  /** [[quantileNormalize]] over PRE-AGGREGATED (group, v, n_gv) counts
    * — the form a streaming additive ledger folds to (the
    * ksDriftFromCounts discipline), so batch-effect correction has a
    * streaming view bit-equal to the batch operator over everything
    * ingested.
    *
    * CONTRACT — the value column must be DISCRETE (quantized): every
    * stage runs on the (group, value) COUNT GRID, so grid cardinality
    * = distinct values × groups. Integer token counts, bucketed
    * scores, ppm-quantized ratios are fine; a raw double score makes
    * the grid row-cardinality-sized and the whole point of the
    * count-grid formulation collapses — quantize first (the
    * [[discrete]] caveat), enforced by `maxGridValues` (a loud
    * runtime guard on the measured pooled-grid size, default 10M).
    *
    * Scale shape of the rank lookup: the pooled cumulative's
    * (⟨cumb, cum⟩] intervals PARTITION [1, N], so each target rank
    * hits exactly one interval — matched via the
    * [[graft.operators.RangeJoin]] bin-bucket EQUI-join (bin width =
    * the mean interval length N/|grid|, so interval replication is
    * ≈ 2·|grid| rows), never a nested-loop theta join: Spark plans a
    * bare `cumb < t ≤ cum` predicate as BroadcastNestedLoopJoin with
    * the grid as the broadcast side — grid-sized, i.e. data-sized
    * exactly when the discrete contract is violated. The bin width
    * comes from one model-sized collect (1 row: N and |grid|) off the
    * already-checkpointed grid. */
  def quantileNormalizeFromCounts(counts: DataFrame,
      maxGridValues: Long = 10000000L): DataFrame = {
    val gv = counts.select(col("group"), col("v"), col("n_gv"))
      .localCheckpoint(true) // feeds group grids AND the pooled grid
    val wg = Window.partitionBy("group").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val ranked = gv
      .withColumn("__r", sum(col("n_gv")).over(wg)) // ECDF rank of v
    val ng = gv.groupBy("group").agg(sum(col("n_gv")).as("__n"))
    val pooled = gv.groupBy("v").agg(sum(col("n_gv")).as("__c"))
    val wp = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val pooledCum = pooled
      .withColumn("__cum", sum(col("__c")).over(wp))
      .withColumn("__cumb", col("__cum") - col("__c"))
      .select(col("v").as("__pv"), col("__cum"), col("__cumb"))
    // one model-sized collect (a single row off the checkpointed
    // grid): total mass N and pooled-grid cardinality, for the target
    // ranks and the bin width
    val stats = pooled
      .agg(sum(col("__c")).cast("long").as("__nt"),
        count(lit(1)).as("__ng"))
      .first()
    val nTotal = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val nGrid = stats.getLong(1)
    require(nGrid <= maxGridValues,
      s"quantileNormalize: $nGrid distinct values exceeds " +
        s"maxGridValues=$maxGridValues — the value column must be " +
        "discrete (quantize scores first; see the count-grid contract)")
    val targets = ranked.join(ng, Seq("group"))
      .withColumn("__t", // exact integer ceil-division, never a double
        expr(s"(__r * ${nTotal}L + __n - 1) DIV __n"))
    val bin = math.max(1L, nTotal / math.max(1L, nGrid))
    graft.operators.RangeJoin.pointInInterval(targets, col("__t"),
        pooledCum, col("__cumb") + lit(1L), col("__cum"), bin)
      .select(col("group"), col("v"), col("n_gv"),
        col("__r").as("rank_in_group"), col("__pv").as("norm_v"))
  }
}
