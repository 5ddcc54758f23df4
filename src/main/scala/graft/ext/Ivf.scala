package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** IVF (inverted-file) approximate nearest neighbor: partition the corpus
  * into `nlist` coarse cells, search only the `nprobe` cells nearest each
  * query. The third ANN tier next to [[Similarity.bruteTopK]] (exact) and
  * [[Similarity.lshNearDupPairs]] (signature pruning).
  *
  * The coarse quantizer is deterministic — the centroid set is the
  * embeddings of the `nlist` smallest ids — so results are reproducible
  * across runs/engines and the operator is oracle-checkable; swap in
  * k-means centroids for recall without touching the probe mechanics.
  *
  * At 100 TB: centroids are a broadcast constant; the cell assignment is
  * a scan-speed map; the one shuffle co-partitions corpus and probes on
  * `cell_id`, so each cell's exact search is local and the per-task cost
  * is |cell| × queries-probing-it, not n × |Q|.
  */
object Ivf {

  /** The deterministic seed centroids: embeddings of the `nlist`
    * smallest ids, with vector + norm precomputed for the broadcast. */
  private def seedCentroids(corpus: DataFrame, idCol: String,
      vecCol: String, nlist: Int): DataFrame =
    corpus.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).as("cid"), VectorOps.toDouble(col(vecCol)).as("cv"),
        VectorOps.norm2(col(vecCol)).as("cn"))

  /** Nearest centroid by cosine per corpus row (ties to the smallest
    * cid) — the broadcast-side cell assignment shared by search and
    * refinement. Output: (neighbor_id, v, n2, cid). */
  private def assignCells(corpus: DataFrame, idCol: String, vecCol: String,
      cent: DataFrame): DataFrame = {
    val cvec = corpus.select(col(idCol).as("neighbor_id"),
      VectorOps.toDouble(col(vecCol)).as("v"), VectorOps.norm2(col(vecCol)).as("n2"))
    val wAssign = Window.partitionBy(col("neighbor_id"))
      .orderBy(col("__cos").desc, col("cid").asc)
    cvec.crossJoin(broadcast(cent))
      .withColumn("__cos", VectorOps.cosineWithNorms(
        VectorOps.dot(col("v"), col("cv")), col("n2"), col("cn")))
      .withColumn("__rn", row_number().over(wAssign)).where(col("__rn") === 1)
      .select(col("neighbor_id"), col("v"), col("n2"), col("cid"))
  }

  /** One Lloyd iteration of the coarse quantizer: the refined centroid of
    * each cell is the elementwise mean of its members, computed through
    * exact decimal sums (order-independent under any partitioning — the
    * same engine-stable mean as the label-centroid operator) and cast to
    * double at the boundary. Output: (cid, pos, centroid, n), one row per
    * (cell, dimension). */
  def lloydStep(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cent = seedCentroids(corpus, idCol, vecCol, nlist)
    assignCells(corpus, idCol, vecCol, cent)
      .select(col("cid"), posexplode(col("v")))
      // quantize at scale 8 (tie-free for float-sourced values) so the
      // sum is exact and identical across engines
      .select(col("cid"), (col("pos") + 1).as("pos"),
        col("col").cast(DecimalType(28, 8)).as("e"))
      .groupBy("cid", "pos")
      .agg((sum(col("e")).cast("double") / count(lit(1))).as("centroid"),
        count(lit(1)).as("n"))
  }

  /** Top-k cosine neighbors per query, searching only the `nprobe`
    * nearest of `nlist` coarse cells. `queries` and `corpus` share the
    * id/vector column names; self-matches are excluded. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 2): DataFrame = {
    val cent = seedCentroids(corpus, idCol, vecCol, nlist)
    val assigned = assignCells(corpus, idCol, vecCol, cent)

    // probe list: the nprobe nearest centroids per query
    val qvec = queries.select(col(idCol).as("query_id"),
      VectorOps.toDouble(col(vecCol)).as("qv"), VectorOps.norm2(col(vecCol)).as("qn"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__cos").desc, col("cid").asc)
    val probes = qvec.crossJoin(broadcast(cent))
      .withColumn("__cos", VectorOps.cosineWithNorms(
        VectorOps.dot(col("qv"), col("cv")), col("qn"), col("cn")))
      .withColumn("__rn", row_number().over(wProbe)).where(col("__rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("cid"))

    // exact search inside probed cells only
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    probes.join(assigned, "cid")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorOps.cosineWithNorms(
        VectorOps.dot(col("qv"), col("v")), col("qn"), col("n2")))
      .withColumn("rank", row_number().over(wTop)).where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
