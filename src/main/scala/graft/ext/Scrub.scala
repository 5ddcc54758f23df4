package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus scrubbing for a training-data pipeline: PII masking and
  * cross-document boilerplate removal (the C4/RefinedWeb-style cleanup
  * stage that runs between quality filtering and dedup).
  *
  * Scale notes: [[scrubPii]] is per-row regexp (scan speed, no shuffle).
  * [[stripBoilerplate]] shuffles (line, doc) pairs twice — once to count
  * document frequency per distinct line, once to rebuild documents — both
  * keyed on high-cardinality keys that partition evenly; the frequent-line
  * set is a small join side that AQE broadcasts.
  */
object Scrub {

  /** (pattern → replacement), applied in order. RE2-compatible (no
    * lookaround/backreferences) so the exact same patterns run under
    * Spark's Java regex and RE2-based engines (the DuckDB oracle). URL
    * first so emails inside URLs mask as part of the URL. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "https?://[^\\s]+" -> "<URL>",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\+?[0-9][0-9() -]{7,}[0-9]" -> "<PHONE>")

  /** Mask emails / URLs / IPv4s / phone-like digit runs. */
  def scrubPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** PII DENSITY audit — the compliance dashboard beside [[scrubPii]]:
    * per group, the match count of each pattern family and how many
    * rows carry ANY match. Counts follow scrubPii's SEQUENTIAL
    * masking order exactly (each pattern counted on the text with the
    * earlier patterns already masked — URL first), so the audit and
    * the scrub can never disagree about what was masked. One scan +
    * one combiner agg; output is group-bounded.
    * Output: (group, n_rows, n_url, n_email, n_ip, n_phone,
    * n_rows_with_pii). */
  def piiAudit(df: DataFrame, group: Column, text: Column): DataFrame = {
    var cur: Column = text
    val counts = piiPatterns.map { case (p, r) =>
      val c = size(regexp_extract_all(cur, lit(p), lit(0))).cast("long")
      cur = regexp_replace(cur, p, r)
      c
    }
    val names = Seq("n_url", "n_email", "n_ip", "n_phone")
    val perRow = df.select((group.as("group") +:
      counts.zip(names).map { case (c, n) => c.as(n) }): _*)
    perRow.groupBy("group").agg(
      count(lit(1)).as("n_rows"),
      sum(col("n_url")).as("n_url"),
      sum(col("n_email")).as("n_email"),
      sum(col("n_ip")).as("n_ip"),
      sum(col("n_phone")).as("n_phone"),
      sum(when(col("n_url") + col("n_email") + col("n_ip") +
        col("n_phone") > 0, 1L).otherwise(0L)).as("n_rows_with_pii"))
  }

  /** Remove every line whose trimmed form appears in ≥ `minDocFreq`
    * distinct documents (navigation chrome, copyright footers, cookie
    * banners). Line order inside each document is preserved; documents
    * whose lines are all boilerplate come back with empty text. */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
      minDocFreq: Long): DataFrame = {
    val lines = df.select(col(idCol).as("__id"),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val frequent = lines
      .select(col("__id"), trim(col("__line")).as("__t")).distinct()
      .groupBy("__t").agg(count(lit(1)).as("__df"))
      .where(col("__df") >= minDocFreq)
      .select("__t")
    val kept = lines.join(frequent,
      trim(lines("__line")) === frequent("__t"), "left_anti")
    val rebuilt = kept.groupBy("__id")
      .agg(array_sort(collect_list(struct(col("__pos"), col("__line"))))
        .as("__ls"))
      .select(col("__id"),
        concat_ws("\n", transform(col("__ls"), s => s.getField("__line")))
          .as("__text"))
    df.drop(textCol)
      .join(rebuilt, col(idCol) === rebuilt("__id"), "left")
      .withColumn(textCol, coalesce(col("__text"), lit("")))
      .drop("__id", "__text")
  }

  /** K-ANONYMITY audit (Sweeney 2002, the re-identification metric
    * next to [[scrubPii]]'s masking): group the table by its
    * quasi-identifier columns and report how much of it sits in
    * groups smaller than k — rows in a small group are
    * re-identifiable by anyone who knows those attributes. The
    * release gate a privacy review reads before data leaves the
    * pipeline.
    *
    * One combiner group-size aggregate + one bounded summary — no
    * per-row state, scan-shaped at any scale. Output: one row
    * (n_rows, n_groups, min_size, n_small_groups, rows_at_risk). */
  def kAnonymity(df: DataFrame, quasiIds: Seq[Column], k: Long)
      : DataFrame = {
    require(k >= 2, s"k $k must be >= 2")
    df.groupBy(quasiIds: _*).agg(count(lit(1)).as("__sz"))
      .agg(
        sum(col("__sz")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        min(col("__sz")).as("min_size"),
        sum(when(col("__sz") < k, 1L).otherwise(0L)).as("n_small_groups"),
        sum(when(col("__sz") < k, col("__sz")).otherwise(0L))
          .as("rows_at_risk"))
  }

  /** l-DIVERSITY audit (Machanavajjhala et al. ICDE 2006) — the gate
    * k-anonymity misses: a quasi-identifier group can be large yet
    * still leak if every row shares the same SENSITIVE value
    * (homogeneity attack). Counts distinct sensitive values per
    * quasi-identifier group; groups below `l` are the release risk.
    * Same one-aggregate summary-row shape as [[kAnonymity]] (two
    * chained combiner aggs — distinct-per-group rides the same
    * shuffle as the size count).
    * Output: (n_rows, n_groups, min_diversity, n_low_groups,
    * rows_at_risk). */
  def lDiversity(df: DataFrame, quasiIds: Seq[Column], sensitive: Column,
      l: Long): DataFrame = {
    require(l >= 2, s"l $l must be >= 2")
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("__sz"), countDistinct(sensitive).as("__div"))
      .agg(
        sum(col("__sz")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        min(col("__div")).as("min_diversity"),
        sum(when(col("__div") < l, 1L).otherwise(0L)).as("n_low_groups"),
        sum(when(col("__div") < l, col("__sz")).otherwise(0L))
          .as("rows_at_risk"))
  }
}
