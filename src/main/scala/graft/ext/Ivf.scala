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

  /** Top-k cosine neighbors per query, searching only the `nprobe`
    * nearest of `nlist` coarse cells. `queries` and `corpus` share the
    * id/vector column names; self-matches are excluded. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 2): DataFrame = {
    val cent = corpus.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).as("cid"), VectorOps.toDouble(col(vecCol)).as("cv"),
        VectorOps.norm2(col(vecCol)).as("cn"))

    // cell assignment: nearest centroid by cosine, ties to the smallest cid
    val cvec = corpus.select(col(idCol).as("neighbor_id"),
      VectorOps.toDouble(col(vecCol)).as("v"), VectorOps.norm2(col(vecCol)).as("n2"))
    val wAssign = Window.partitionBy(col("neighbor_id"))
      .orderBy(col("__cos").desc, col("cid").asc)
    val assigned = cvec.crossJoin(broadcast(cent))
      .withColumn("__cos", VectorOps.cosineWithNorms(
        VectorOps.dot(col("v"), col("cv")), col("n2"), col("cn")))
      .withColumn("__rn", row_number().over(wAssign)).where(col("__rn") === 1)
      .select(col("neighbor_id"), col("v"), col("n2"), col("cid"))

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
