package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers:
  *  - [[bruteTopK]] / [[nearDupPairs]] — exact cosine, O(|Q|·n) / O(n²)
  *    pairwise; the correctness baseline. Norms are precomputed once per
  *    side so the join computes one fused dot product per pair.
  *  - [[lshTopK]] — random-hyperplane LSH bucketing: candidates share a
  *    signature band, so cost is Σ bucket², not n². The hyperplanes are
  *    derived deterministically from xxhash64 (no RNG, reproducible across
  *    runs/executors) — at 100 TB this is the path: signatures at scan
  *    speed, one shuffle on small band keys.
  */
object Similarity {

  private def withNorm(df: DataFrame, id: String, vec: String): DataFrame =
    df.select(col(id), VectorOps.toDouble(col(vec)).as(vec),
      VectorOps.norm2(col(vec)).as("__n2"))

  /** Exact top-k cosine neighbors for each query row. */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = withNorm(queries, idCol, vecCol)
      .withColumnRenamed(idCol, "query_id").withColumnRenamed(vecCol, "qv")
      .withColumnRenamed("__n2", "qn")
    val c = withNorm(corpus, idCol, vecCol)
      .withColumnRenamed(idCol, "neighbor_id").withColumnRenamed(vecCol, "cv")
      .withColumnRenamed("__n2", "cn")
    val pairs = q.crossJoin(c).where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorOps.cosineWithNorms(
        VectorOps.dot(col("qv"), col("cv")), col("qn"), col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Exact cosine near-duplicate pairs (id_a < id_b, cosine ≥ threshold). */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = withNorm(df, idCol, vecCol)
      .select(col(idCol).as("id_a"), col(vecCol).as("va"), col("__n2").as("na"))
    val b = withNorm(df, idCol, vecCol)
      .select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("__n2").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", VectorOps.cosineWithNorms(
        VectorOps.dot(col("va"), col("vb")), col("na"), col("nb")))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 → uniform in [-1, 1). */
  private def planeComponent(plane: Int, dim: Column): Column =
    (xxhash64(lit(plane), dim).cast("double") / lit(Long.MaxValue.toDouble))

  /** Sign bit of v · plane_p for one hyperplane. */
  private def signBit(vec: Column, plane: Int): Column = {
    val proj = aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, i) => x * planeComponent(plane, i)),
      lit(0.0), (acc, x) => acc + x)
    when(proj >= 0, lit(1L)).otherwise(lit(0L))
  }

  /** LSH-bucketed approximate neighbor pairs: `bands` signatures of
    * `bitsPerBand` hyperplane sign bits each; pairs sharing any band
    * bucket are scored exactly, others are never compared. */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bands: Int = 4, bitsPerBand: Int = 8): DataFrame = {
    val vd = withNorm(df, idCol, vecCol)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("__n2").as("n2"))
    val withSig = vd.withColumn("bkeys", array((0 until bands).map { b =>
      (0 until bitsPerBand).map(i =>
        signBit(col("v"), b * bitsPerBand + i) * lit(1L << i))
        .reduce(_ + _) + lit(b.toLong << 32)
    }: _*))
    val banded = withSig.select(col("id"), col("v"), col("n2"),
      explode(col("bkeys")).as("bkey"))
    banded.as("a").join(banded.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.v").as("va"), col("b.v").as("vb"),
        col("a.n2").as("na"), col("b.n2").as("nb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", VectorOps.cosineWithNorms(
        VectorOps.dot(col("va"), col("vb")), col("na"), col("nb")))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
