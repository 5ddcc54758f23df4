package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Retrieval scoring over the document corpus — the targeted-curation
  * primitive: score every document against a fixed query-term profile
  * and keep/weight the best matches (the "find me documents like this
  * topic" step that sits next to DSIR's distribution matching in a
  * training-data pipeline).
  *
  * Okapi BM25 (Robertson et al., TREC-3; public formula):
  *   score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·dl/avgdl))
  *   idf(t)   = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5))
  *
  * Scale shape: the query-term set is a tiny LITERAL, so tf counts are
  * per-row codegen'd HOF filters over the token array — no explode, no
  * shuffle. One map-side-combined agg produces N, Σdl and every df in
  * a single one-row frame that broadcasts back; the score itself is a
  * pure projection. At 100 TB: two linear scans (stats, then scores)
  * and one 1-row broadcast.
  *
  * Numeric determinism (the oracle-hash discipline): the ONLY
  * transcendental, ln, feeds each per-term idf — quantized once to
  * DECIMAL(28,12) (per TERM, a handful of values, so a cross-engine
  * ulp tie is checkable, and none exists on this corpus). Everything
  * else is IEEE +,·,/ on exact-integer-valued doubles with a FIXED
  * left-to-right evaluation order that the SQL oracle mirrors — both
  * engines round those identically, so the final double is bit-equal
  * with no quantization of derived ratios (the x70 tie lesson). The
  * avgdl division never happens: dl/avgdl is expanded to dl·N/Σdl so
  * the denominator stays a product-sum of exact values.
  */
object Retrieval {

  /** Per-document BM25 of a literal query-term set.
    * Output: (id, n_tokens, bm25); a document containing none of the
    * terms scores exactly 0. */
  def bm25Score(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms,
      "terms must be a non-empty distinct list")
    val base = docs.select(col(idCol).as("id"),
        TextAnalysis.tokens(lower(col(textCol))).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val tf = terms.zipWithIndex.foldLeft(base) { case (d, (t, i)) =>
      d.withColumn(s"tf_$i",
        size(filter(col("toks"), w => w === lit(t))).cast("long"))
    }.drop("toks")
    val stats = tf.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("dl")).cast("long").as("s") +:
        terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i")): _*)
    val scored = tf.crossJoin(broadcast(stats))
    def idf(i: Int) =
      log(lit(1.0d) + (col("n").cast("double") - col(s"df_$i") + lit(0.5d))
          / (col(s"df_$i") + lit(0.5d)))
        .cast(DecimalType(28, 12)).cast("double")
    def part(i: Int) =
      (lit(k1 + 1) * col(s"tf_$i") * col("s")) /
        (col("s") * (col(s"tf_$i") + lit(k1 * (1 - b))) +
          lit(k1 * b) * col("dl") * col("n"))
    val score = terms.indices.map(i => idf(i) * part(i)).reduceLeft(_ + _)
    scored.select(col("id"), col("dl").as("n_tokens"), score.as("bm25"))
  }
}
