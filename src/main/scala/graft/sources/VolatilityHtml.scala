package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.model.Schemas
import graft.functions.{Cleansing, YearAttach}

/** Volatility HTML source — one page per symbol-day; the history numbers
  * live in a nested table at fixed positions (reference:
  * transform-load.2025-08-19.rkt:242-260 — sxpath
  * `(html body (table 2) tr (td 1) table (tr 5|9) (td 2..5))`).
  *
  * Spark-first: read each page with `wholetext`, normalize exactly like
  * the reference (:243-250), then extract cells with codegen'd
  * regexp/split/element_at column expressions — no HTML parser library,
  * no UDF. The positional contract (innermost table, rows 5 and 9,
  * cells 2–5) matches the reference's sxpath positions.
  */
object VolatilityHtml {

  /** Read every `*.html` under `dir` as (act_symbol, page). */
  def readDay(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(s"$dir/*.html")
      .withColumn("act_symbol",
        regexp_extract(input_file_name(), "([^/]+)\\.html$", 1))
      .withColumnRenamed("value", "page")

  /** The reference's whitespace/entity normalization (:243-250). */
  def normalize(page: Column): Column = {
    val s0 = regexp_replace(page, "\r\n|\n|\t", "")
    val s1 = regexp_replace(s0, "&nbsp;", " ")
    val s2 = regexp_replace(s1, " +", " ")
    regexp_replace(s2, "</?nobr>", "")
  }

  /** Sentinel pages yield no rows and are counted as failures
    * (reference: :290-293). */
  def partitionSentinels(pages: DataFrame): (DataFrame, DataFrame) = {
    val bad = Cleansing.isSentinelPage(col("page"))
    (pages.where(!bad), pages.where(bad))
  }

  /** A7 run counters: attempted / succeeded / failed, like the
    * reference's end-of-run summary
    * (transform-load.2025-08-19.rkt:425-427). One pass over the pages. */
  case class LoadReport(attempted: Long, succeeded: Long, failed: Long)

  def loadWithReport(spark: SparkSession, dir: String,
      date: java.sql.Date): (DataFrame, LoadReport) = {
    val pages = readDay(spark, dir)
    val counts = pages.agg(
      count(lit(1)).as("n"),
      count(when(Cleansing.isSentinelPage(col("page")), 1)).as("bad"))
      .collect()(0)
    val (good, _) = partitionSentinels(pages)
    (toHistory(good, date),
      LoadReport(counts.getLong(0), counts.getLong(0) - counts.getLong(1),
        counts.getLong(1)))
  }

  /** The history table: the innermost `<table>` block (no nested table)
    * with at least 9 rows — the sxpath target `(table 2) tr (td 1) table`
    * resolved structurally rather than by absolute position, so header
    * tables don't shift it. */
  private def innerTable(norm: Column): Column =
    try_element_at(
      filter(
        regexp_extract_all(norm,
          lit("(?i)<table[^>]*>((?:(?!<table|</table>).)*)</table>"), lit(1)),
        t => size(split(t, "(?i)<tr[^>]*>")) >= 10),
      lit(1))

  /** 1-based `<tr>` row inside the inner table; NULL (not error) when the
    * page is malformed — per-file quarantine, not job failure
    * (reference rolls back just the failing symbol,
    * transform-load.2025-08-19.rkt:295-301). */
  private def row(tbl: Column, n: Int): Column =
    try_element_at(split(tbl, "(?i)<tr[^>]*>"), lit(n + 1))

  /** 1-based `<td>` cell text inside a row, tags stripped + trimmed. */
  private def cell(r: Column, n: Int): Column =
    trim(regexp_replace(try_element_at(split(r, "(?i)<td[^>]*>"), lit(n + 1)),
      "<[^>]*>", ""))

  private val D = Schemas.Dec

  /** '%'/',' stripped, 'N/A'/'0.00' → NULL, /100, trunc 4 — the Q9 CASE
    * + scaling (reference: :327-394, :398-417). */
  private def pct(c: Column): Column =
    Cleansing.truncTo(
      Cleansing.nullSentinels(c, Seq("N/A", "0.00", "0.00%", "N/A%"))
        .cast(DecimalType(38, 8)) / lit(BigDecimal(100)), 4).cast(D)

  /** Year-high/low cells look like `"12.34% - 05-Mar"`; value before
    * " - ", day-month after; the date is NULL when the value is
    * 'N/A'/'0.00%' (reference: :264-282). */
  private def hiLoValue(c: Column): Column = pct(split(c, " - ").getItem(0))

  private def hiLoDate(c: Column, obsDate: Column): Column =
    when(c.startsWith("0.00%") || c.startsWith("N/A"), lit(null).cast("date"))
      .otherwise(YearAttach.attachYear(split(c, " - ").getItem(1), obsDate))

  /** Pages → volatility_history rows. `date` is the folder date. */
  def toHistory(pages: DataFrame, date: java.sql.Date): DataFrame = {
    val tbl = innerTable(normalize(col("page")))
    val hv = row(tbl, 5)
    val iv = row(tbl, 9)
    def sideCols(r: Column, p: String) = Seq(
      pct(cell(r, 2)).as(s"${p}_current"),
      pct(cell(r, 3)).as(s"${p}_week_ago"),
      lit(null).cast(D).as(s"${p}_month_ago"),
      hiLoValue(cell(r, 4)).as(s"${p}_year_high"),
      hiLoDate(cell(r, 4), lit(date)).as(s"${p}_year_high_date"),
      hiLoValue(cell(r, 5)).as(s"${p}_year_low"),
      hiLoDate(cell(r, 5), lit(date)).as(s"${p}_year_low_date"))
    pages
      .select((col("act_symbol") +: lit(date).as("date") +:
        (sideCols(hv, "hv") ++ sideCols(iv, "iv"))): _*)
      .select(Schemas.volatilityHistory.fieldNames.map(col): _*)
  }
}
