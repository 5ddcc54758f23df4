package graft.model

import org.apache.spark.sql.types._

/** Canonical table schemas of the engine, mirroring the reference's
  * PostgreSQL DDL (reference: schema.sql:7-27, 29-51, 53-60).
  *
  * Measures are DecimalType — the reference is exact-decimal end-to-end
  * (reference: transform-load.2025-08-19.rkt:49 sets
  * `read-decimal-as-inexact #f`; SQL `trunc(x, 4)` fixes scale at load,
  * transform-load.2025-08-19.rkt:204-208).
  */
object Schemas {

  val Dec: DecimalType = DecimalType(38, 4)

  /** oic.option_chain — PK (date, act_symbol, expiration, strike, call_put)
    * (reference: schema.sql:7-27). */
  val optionChain: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("act_symbol", StringType, nullable = false),
    StructField("expiration", DateType, nullable = false),
    StructField("strike", Dec, nullable = false),
    StructField("call_put", StringType, nullable = false), // {'Call','Put'}
    StructField("bid", Dec),
    StructField("ask", Dec),
    StructField("model_value", Dec),
    StructField("vol", Dec),
    StructField("delta", Dec),
    StructField("gamma", Dec),
    StructField("theta", Dec),
    StructField("vega", Dec),
    StructField("rho", Dec)))

  val optionChainPk: Seq[String] =
    Seq("date", "act_symbol", "expiration", "strike", "call_put")

  /** oic.volatility_history — PK (act_symbol, date)
    * (reference: schema.sql:29-51). */
  val volatilityHistory: StructType = StructType(Seq(
    StructField("act_symbol", StringType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("hv_current", Dec),
    StructField("hv_week_ago", Dec),
    StructField("hv_month_ago", Dec),
    StructField("hv_year_high", Dec),
    StructField("hv_year_high_date", DateType),
    StructField("hv_year_low", Dec),
    StructField("hv_year_low_date", DateType),
    StructField("iv_current", Dec),
    StructField("iv_week_ago", Dec),
    StructField("iv_month_ago", Dec),
    StructField("iv_year_high", Dec),
    StructField("iv_year_high_date", DateType),
    StructField("iv_year_low", Dec),
    StructField("iv_year_low_date", DateType)))

  val volatilityHistoryPk: Seq[String] = Seq("act_symbol", "date")

  /** oic.weekly — PK act_symbol; last-seen roster semantics
    * (reference: schema.sql:53-60, weeklies-transform-load.rkt:52-64). */
  val weekly: StructType = StructType(Seq(
    StructField("act_symbol", StringType, nullable = false),
    StructField("effective_date", DateType),
    StructField("last_seen", DateType)))

  /** Raw straddle row of the chain JSON input — one row carries both the
    * call_* and put_* column families (reference:
    * transform-load.2025-08-19.rkt:128-142; requested columns enumerated in
    * the fetch URL, extract.2023-11-16.rkt:184-185). */
  val chainStraddleRow: StructType = {
    def side(p: String) = Seq(
      StructField(s"${p}_optionsymbol", StringType),
      StructField(s"${p}_bid", Dec),
      StructField(s"${p}_ask", Dec),
      StructField(s"${p}_theoprice", Dec),
      StructField(s"${p}_ivint", Dec),
      StructField(s"${p}_delta", Dec),
      StructField(s"${p}_gamma", Dec),
      StructField(s"${p}_theta", Dec),
      StructField(s"${p}_vega", Dec),
      StructField(s"${p}_rho", Dec))
    StructType(
      StructField("expirationdate", StringType) +:
      StructField("strike", Dec) +:
      (side("call") ++ side("put")))
  }
}
