package graft.model

import java.sql.Date

/** Typed row models for the parse layer (SURVEY §1.3: `Dataset[T]` where
  * per-record logic is dense; plain DataFrame elsewhere). Field names
  * match [[Schemas]] so `.as[T]` is a zero-cost view.
  */
case class OptionQuote(
    date: Date, act_symbol: String, expiration: Date,
    strike: BigDecimal, call_put: String,
    bid: BigDecimal, ask: BigDecimal, model_value: BigDecimal,
    vol: BigDecimal, delta: BigDecimal, gamma: BigDecimal,
    theta: BigDecimal, vega: BigDecimal, rho: BigDecimal)

case class VolatilityHistoryRow(
    act_symbol: String, date: Date,
    hv_current: BigDecimal, hv_week_ago: BigDecimal,
    hv_month_ago: BigDecimal,
    hv_year_high: BigDecimal, hv_year_high_date: Date,
    hv_year_low: BigDecimal, hv_year_low_date: Date,
    iv_current: BigDecimal, iv_week_ago: BigDecimal,
    iv_month_ago: BigDecimal,
    iv_year_high: BigDecimal, iv_year_high_date: Date,
    iv_year_low: BigDecimal, iv_year_low_date: Date)

case class WeeklyRow(act_symbol: String, effective_date: Date,
    last_seen: Date)
