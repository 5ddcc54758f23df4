package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Schemas
import graft.operators.{AsOf, NearestSelect, Upsert}
import graft.sources.ChainJson

/** The flagship E2 path — the reference's daily chain transform+load
  * (reference: transform-load.2025-08-19.rkt:102-152, orchestrated at
  * :158-225) re-expressed as ONE distributed dataflow:
  *
  *   read day folder → as-of mark price → target grid → closest
  *   expiration → closest strike (keep both sides) → PK dedup
  *
  * Shuffle budget: everything partitions by `act_symbol` (the window
  * passes and the final PK dedup); the target grids are broadcast. At
  * 100 TB the day folder is a partition-pruned scan, prices-per-day are
  * small (one row per symbol → broadcast), and AQE handles symbol skew.
  *
  * Selection semantics (:147-152): for each of 4 target expirations pick
  * the nearest REAL expiration; within it, for each of 27 target strikes
  * pick the nearest REAL strike and keep ALL rows (both sides) at it.
  * Duplicates across targets collapse in the PK dedup, exactly like the
  * reference's ON CONFLICT DO NOTHING (:209). Ties: the reference's fold
  * keeps the first-seen element; we break ties deterministically toward
  * the SMALLER expiration/strike and document that choice.
  */
object ChainPipeline {

  /** As-of mark price per symbol: close at the latest date ≤ folderDate
    * (reference: :104-113, the correlated subquery — here one window
    * pass, no correlated join). */
  def markPrices(prices: DataFrame, folderDate: java.sql.Date): DataFrame =
    AsOf.latestPerKeyUpTo(prices, Seq("act_symbol"), col("date"),
        lit(folderDate), Seq.empty)
      .select(col("act_symbol"), col("close").cast(Schemas.Dec).as("mark"))

  /** Target-grid selection over a loaded option_chain DataFrame. */
  def selectNearTheMoney(chain: DataFrame, marks: DataFrame,
      folderDate: java.sql.Date): DataFrame = {
    // 4 target expirations: folderDate + {2,4,6,8} weeks (:123-126)
    val targetExps = Seq(2, 4, 6, 8)
      .map(w => date_add(lit(folderDate), 7 * w).as("t_exp"))
    val teDf = chain.sparkSession.range(1).select(
      explode(array(targetExps: _*)).as("t_exp"))

    // closest real expiration per (symbol, target) (:51-58)
    val exps = chain.select("act_symbol", "expiration").distinct()
    val wExp = Window.partitionBy("act_symbol", "t_exp")
      .orderBy(abs(datediff(col("expiration"), col("t_exp"))).asc,
        col("expiration").asc)
    val bestExp = exps.crossJoin(broadcast(teDf))
      .withColumn("__rn", row_number().over(wExp)).where(col("__rn") === 1)
      .select(col("act_symbol"), col("t_exp"),
        col("expiration").as("sel_exp"))

    // 27 target strikes = mark × multipliers (:114-122), per symbol
    val ts = marks.select(col("act_symbol"), explode(array(
        NearestSelect.strikeMultipliers.map(m =>
          (col("mark") * lit(m)).as("t")): _*)).as("t_strike"))

    // closest real strike per (symbol, selected expiration, target strike)
    // over the strikes actually listed at that expiration (:60-66, :147-152)
    val strikes = chain.join(bestExp, Seq("act_symbol"))
      .where(col("expiration") === col("sel_exp"))
      .select("act_symbol", "t_exp", "sel_exp", "strike").distinct()
    val wStrike = Window.partitionBy("act_symbol", "t_exp", "t_strike")
      .orderBy(abs(col("strike") - col("t_strike")).asc, col("strike").asc)
    val bestStrike = strikes.join(ts, Seq("act_symbol"))
      .withColumn("__rn", row_number().over(wStrike)).where(col("__rn") === 1)
      .select(col("act_symbol"), col("t_exp"), col("sel_exp"),
        col("strike").as("sel_strike")).distinct()

    // keep ALL chain rows (both sides) at each selected (expiration, strike)
    val sel = bestStrike
      .select(col("act_symbol").as("s_sym"), col("sel_exp"), col("sel_strike"))
      .distinct()
    chain.join(broadcast(sel),
        chain("act_symbol") === sel("s_sym") &&
          chain("expiration") === sel("sel_exp") &&
          chain("strike") === sel("sel_strike"))
      .select(chain.columns.toIndexedSeq.map(chain(_)): _*)
  }

  /** Full day pipeline: JSON folder → selected, PK-deduped option_chain
    * rows, ordered like the export (Q3 sort, dump-dat.rkt:66-76). */
  def loadDay(spark: SparkSession, dayDir: String, prices: DataFrame,
      folderDate: java.sql.Date, allOptions: Boolean = false): DataFrame = {
    val chain = ChainJson.toOptionChain(
      ChainJson.readDay(spark, dayDir), folderDate)
    val selected =
      if (allOptions) chain
      else selectNearTheMoney(chain, markPrices(prices, folderDate), folderDate)
    // bid ASC NULLS LAST, spelled as plain columns (isNull sorts false
    // first) — keepFirst applies .asc itself, and a pre-wrapped SortOrder
    // would nest and kick the sort out of codegen.
    Upsert.keepFirst(selected, Schemas.optionChainPk,
        Seq(col("bid").isNull, col("bid")))
      .orderBy("act_symbol", "expiration", "strike", "call_put")
  }
}
