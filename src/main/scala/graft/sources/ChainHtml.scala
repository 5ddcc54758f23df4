package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.model.Schemas
import graft.functions.Occ

/** First-generation (HTML-era) chain-page source — the P1 chain side.
  * One page per symbol-day; option rows live in nested expiration tables
  * and are projected POSITIONALLY (reference: transform-load.rkt:47-64):
  * the OCC symbol sits in an `onmouseover` attribute at td (3+offset),
  * bid/ask at td (5/6+offset), vol at td (10+offset), delta/gamma/theta
  * at td (11/12/13+offset), vega/rho at td (15/16+offset) — with CALL
  * rows at offset 0 and PUT rows at offset −1 (put rows have one fewer
  * leading cell, transform-load.rkt:121).
  *
  * Spark-first, like [[VolatilityHtml]]: `wholetext` read, the
  * reference's normalization (:95-99 — note `&nbsp;` is DELETED here,
  * not blanked to a space as on volatility pages), then codegen'd
  * regexp/split/element_at column expressions — no HTML parser library,
  * no UDF. Option rows self-select: a `<tr>` is a call (put) row iff its
  * td 3 (td 2) carries an OCC `onmouseover`, which is exactly the
  * reference's "keep extractions with a non-empty underlying" filter
  * (:124) resolved structurally — header/navigation rows carry no OCC
  * attribute and drop out, so the absolute `(table 9)` position need not
  * be counted. Per-row work only: parsing a day is one scan at any scale.
  */
object ChainHtml {

  /** Read every `*.html` under `dir` as (act_symbol, page) — same
    * filename→key convention as the volatility pages (S1/P6). */
  def readDay(spark: SparkSession, dir: String): DataFrame =
    VolatilityHtml.readDay(spark, dir)

  /** The reference's whitespace/entity normalization for CHAIN pages
    * (transform-load.rkt:95-99): CRLF and tabs removed, `&nbsp;` removed
    * (not replaced by a space), `<nobr>` wrappers dropped. */
  def normalize(page: Column): Column = {
    val s0 = regexp_replace(page, "\r\n|\n|\t", "")
    val s1 = regexp_replace(s0, "&nbsp;", "")
    regexp_replace(s1, "(?i)</?nobr>", "")
  }

  private val D = Schemas.Dec

  /** 1-based `<td>` cell inside a row; NULL when absent (per-row
    * quarantine, not job failure). */
  private def cellRaw(cells: Column, n: Int): Column =
    try_element_at(cells, lit(n + 1))

  /** Cell text with tags stripped + trimmed. */
  private def cellText(cells: Column, n: Int): Column =
    trim(regexp_replace(cellRaw(cells, n), "<[^>]*>", ""))

  /** The OCC code inside a cell's `onmouseover` attribute, '' if none —
    * the reference runs its symbol pattern over that attribute's text
    * (transform-load.rkt:49-56). */
  private def occIn(cells: Column, n: Int): Column =
    regexp_extract(
      regexp_extract(cellRaw(cells, n), "(?i)onmouseover=\"([^\"]*)\"", 1),
      Occ.pattern, 0)

  /** `string->number`-or-false (transform-load.rkt:69-79): non-numeric
    * text → NULL, never an error. */
  private def num(c: Column): Column =
    when(c.rlike("^-?[0-9]+(\\.[0-9]+)?$"), c).cast(D)

  /** Percent cell → fraction: '%' stripped, /100 exact
    * (transform-load.rkt:75 — no truncation in the HTML era). */
  private def pct(c: Column): Column = {
    val stripped = regexp_replace(c, "%", "")
    (when(stripped.rlike("^-?[0-9]+(\\.[0-9]+)?$"), stripped)
      .cast(DecimalType(38, 8)) / lit(BigDecimal(100))).cast(D)
  }

  /** Pages → option rows (date, act_symbol, expiration, strike,
    * call_put, bid, ask, vol, delta, gamma, theta, vega, rho). The HTML
    * era has no model value. `act_symbol` comes from the OCC code's
    * underlying, like the reference's flatten step
    * (transform-load.rkt:67-79). */
  def toOptions(pages: DataFrame, date: java.sql.Date): DataFrame = {
    val rows = pages.select(
      explode(split(normalize(col("page")), "(?i)<tr[^>]*>")).as("r"))
    val cells = split(col("r"), "(?i)<td[^>]*>")
    // call rows carry the OCC attribute at td 3, put rows at td 2
    val withSide = rows
      .select(cells.as("c"),
        (length(occIn(cells, 3)) > 0).as("is_call"),
        (length(occIn(cells, 2)) > 0).as("is_put"))
      .where(col("is_call") || col("is_put"))
      .select(col("c"),
        when(col("is_call"), lit(0)).otherwise(lit(-1)).as("off"))

    def at(base: Int): Column =
      when(col("off") === 0, cellText(col("c"), base))
        .otherwise(cellText(col("c"), base - 1))
    val occ = when(col("off") === 0, occIn(col("c"), 3))
      .otherwise(occIn(col("c"), 2))

    withSide.select(
      lit(date).as("date"),
      Occ.underlying(occ).as("act_symbol"),
      Occ.expiration(occ).as("expiration"),
      Occ.strike(occ).cast(D).as("strike"),
      Occ.side(occ).as("call_put"),
      num(at(5)).as("bid"),
      num(at(6)).as("ask"),
      pct(at(10)).as("vol"),
      num(at(11)).as("delta"),
      num(at(12)).as("gamma"),
      num(at(13)).as("theta"),
      num(at(15)).as("vega"),
      num(at(16)).as("rho"))
  }
}
