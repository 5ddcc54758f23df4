package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Year attachment for the year-high/low "dd-MMM" dates that the
  * volatility page reports without a year (reference:
  * transform-load.2025-08-19.rkt:228-240 `append-prior-year`).
  *
  * Semantics: bind the year of `target` if the resulting date falls in
  * (target − 1 year, target], else the prior year. 29-Feb inputs are
  * coerced to 28-Feb when the bound year is not a leap year (reference:
  * transform-load.2025-08-19.rkt:229-231).
  *
  * Composed from built-ins (`make_date`, `when`) — no UDF, stays inside
  * whole-stage codegen.
  */
object YearAttach {

  private val months = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

  /** Month number from a 3-letter English month abbreviation. */
  def monthNum(m: Column): Column =
    months.zipWithIndex.foldLeft(lit(null).cast("int")) { case (acc, (name, i)) =>
      when(m === name, lit(i + 1)).otherwise(acc)
    }

  /** `dayMonth` is e.g. "05-Mar"; `target` is the observation date.
    * Returns a DateType column. */
  def attachYear(dayMonth: Column, target: Column): Column = {
    val rawDay = split(dayMonth, "-").getItem(0).cast("int")
    val mon = monthNum(split(dayMonth, "-").getItem(1))
    // 29-Feb is coerced to 28-Feb UNCONDITIONALLY, before year binding —
    // the reference's "leap year hack" rewrites the string itself
    // (transform-load.2025-08-19.rkt:229-231), even when the bound year
    // turns out to be a leap year.
    val day = when(mon === 2 && rawDay === 29, lit(28)).otherwise(rawDay)
    val ty = year(target)
    def mk(y: Column): Column = make_date(y, mon, day)
    val thisYear = mk(ty)
    // in (target − 1y, target] → this year, else prior year
    // (reference: transform-load.2025-08-19.rkt:237-239).
    when(thisYear <= target, thisYear).otherwise(mk(ty - 1))
  }
}
