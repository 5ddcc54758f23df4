package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.functions.expressions.VectorExpressions

/** IVF (inverted-file) approximate nearest neighbor: partition the corpus
  * into `nlist` coarse cells, search only the `nprobe` cells nearest each
  * query. The third ANN tier next to [[Similarity.bruteTopK]] (exact) and
  * [[Similarity.lshNearDupPairs]] (signature pruning).
  *
  * The coarse quantizer is deterministic — the seed centroid set is the
  * embeddings of the `nlist` smallest ids — so results are reproducible
  * across runs/engines and the operator is oracle-checkable;
  * `refineIters` Lloyd steps sharpen the seeds for recall without
  * touching the probe mechanics (still deterministic: exact-decimal
  * means are order-independent under any partitioning).
  *
  * At 100 TB: centroids are nlist×dim doubles resident on the driver and
  * embedded in the plan like a broadcast; cell assignment is a pure
  * per-row codegen argmax ([[VectorExpressions.nearestCell]]) — a
  * scan-speed map with NO exchange (asserted in ScalaTest). The single
  * corpus shuffle is the `cell_id` equi-join that co-partitions corpus
  * and probes, so each cell's exact search is local and the per-task
  * cost is |cell| × queries-probing-it, not n × |Q|. Each Lloyd
  * iteration adds one scan + a map-side-combined (cid, dim) mean agg —
  * only nlist×dim×partitions rows move.
  */
object Ivf {

  /** Centroid constants: (cid, vector, squared L2 norm), cid-ascending.
    * Public so the semantic-dedup family ([[Similarity.semanticDedup]] /
    * [[Similarity.semanticAdmit]]) can train a quantizer ONCE
    * ([[train]]) and re-apply it across calls — the incremental
    * admission and streaming shapes require the cell boundaries to be a
    * value, not a recomputation. */
  type Centroids = Array[(Long, Array[Double], Double)]

  /** The deterministic seed centroids: embeddings of the `nlist`
    * smallest ids. nlist rows — a driver-side constant, like collecting
    * a broadcast side. */
  private def seedCentroids(corpus: DataFrame, idCol: String,
      vecCol: String, nlist: Int): Centroids =
    corpus.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).cast("long").as("cid"),
        VectorOps.toDouble(col(vecCol)).as("cv"),
        VectorOps.norm2(col(vecCol)).as("cn"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)

  /** Nearest centroid by cosine per corpus row (ties to the smallest
    * cid) — a zero-exchange scan-speed map over the constant centroid
    * set. Output: (neighbor_id, v, n2, cid). */
  private def assignCells(corpus: DataFrame, idCol: String, vecCol: String,
      cent: Centroids): DataFrame =
    corpus.select(col(idCol).as("neighbor_id"),
        VectorOps.toDouble(col(vecCol)).as("v"),
        VectorOps.norm2(col(vecCol)).as("n2"))
      .withColumn("cid", VectorExpressions.nearestCell(col("v"), col("n2"),
        cent.map(_._2), cent.map(_._3), cent.map(_._1)))

  /** Train a coarse quantizer as a VALUE: the deterministic seed cells
    * (`refineIters = 0`) or `refineIters` Lloyd refinements of them —
    * the x24 k-means under the same exact-decimal arithmetic. The
    * result is nlist×dim driver-side doubles, embedded in downstream
    * plans like a broadcast; training it once and passing it around is
    * what lets incremental admission judge every batch against FIXED
    * cell boundaries, and what gives [[Similarity.semanticDedup]]
    * balanced cells without re-scanning. */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, refineIters: Int = 0): Centroids =
    if (refineIters <= 0) seedCentroids(corpus, idCol, vecCol, nlist)
    else refinedCentroids(corpus, idCol, vecCol, nlist, refineIters)

  /** Nearest-cell assignment of `df` under an already-trained quantizer
    * — the zero-exchange codegen argmax scan ([[VectorExpressions
    * .nearestCell]]); output (neighbor_id, v, n2, cid). */
  def assignWith(df: DataFrame, idCol: String, vecCol: String,
      cent: Centroids): DataFrame =
    assignCells(df, idCol, vecCol, cent)

  /** A two-level coarse→fine quantizer as a value: `coarse*` arrays are
    * the OCCUPIED coarse seed cells (ascending id), `fine(j)` the fine
    * centroids of coarse index j. For K total cells sized
    * nCoarse = nFine = √K, per-row assignment is O(2·√K) centroid dots
    * instead of the flat quantizer's O(K), and the plan constant is
    * (nCoarse + K)·dim doubles — the path past [[Similarity
    * .MaxAutoCells]], where the flat argmax and the embedded centroid
    * constant both stop scaling. */
  case class TwoLevel(coarseVecs: Array[Array[Double]],
      coarseNorms: Array[Double], coarseIds: Array[Long],
      fine: Array[Centroids])

  /** Train the two-level quantizer: coarse seed cells (the `nCoarse`
    * smallest ids), then per OCCUPIED coarse cell the `nFine`
    * smallest-id members as its fine seeds. Coarse cells that attract
    * no member drop out (their seed lost even itself to a duplicate
    * vector with a smaller id — the x25 GROUP BY discipline), so every
    * retained cell has ≥ 1 fine centroid and assignment is total.
    * Deterministic end to end; one assignment scan + one bounded
    * (≤ nCoarse·nFine rows) collect.
    *
    * `refineIters` Lloyd steps sharpen the FINE level (the x24/x25
    * exact-decimal member means, so the refined model is bit-identical
    * in any engine): each iteration runs one two-level assignment scan
    * + one map-side-combined (cid, dim) mean agg; fine cells that lose
    * every member drop (GROUP BY semantics), cell ids stay the seed
    * ids. Coarse boundaries never move — refinement balances the cells
    * a row searches, not which coarse cell it reaches. */
  def trainTwoLevel(corpus: DataFrame, idCol: String, vecCol: String,
      nCoarse: Int, nFine: Int, refineIters: Int = 0): TwoLevel = {
    val coarse = seedCentroids(corpus, idCol, vecCol, nCoarse)
    val w = Window.partitionBy(col("cid")).orderBy(col("neighbor_id"))
    val fineRows = assignCells(corpus, idCol, vecCol, coarse)
      .withColumn("rn", row_number().over(w)).where(col("rn") <= nFine)
      .select(col("cid"), col("neighbor_id").cast("long").as("fid"),
        col("v"), col("n2"))
      .collect()
    val byCid = fineRows.groupBy(_.getLong(0))
    val occupied = coarse.filter { case (cid, _, _) => byCid.contains(cid) }
    var model = TwoLevel(
      occupied.map(_._2), occupied.map(_._3), occupied.map(_._1),
      occupied.map { case (cid, _, _) =>
        byCid(cid).map(r => (r.getLong(1), r.getSeq[Double](2).toArray,
          r.getDouble(3))).sortBy(_._1)
      })
    var it = 0
    while (it < refineIters) {
      // which coarse slot owns each fine id (fine ids are vec_ids of
      // members, so they are unique across coarse cells)
      val slotOf = model.fine.zipWithIndex
        .flatMap { case (cents, j) => cents.map(c => c._1 -> j) }.toMap
      val means = cellMeans(assignTwoLevel(corpus, idCol, vecCol, model))
        .select(col("cid"), col("pos"), col("centroid"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (fid, rows) =>
          val cv = rows.sortBy(_.getInt(1)).map(_.getDouble(2))
          var cn = 0.0
          var i = 0
          while (i < cv.length) { cn += cv(i) * cv(i); i += 1 }
          fid -> ((fid, cv, cn))
        }
      model = model.copy(fine = model.fine.indices.map { j =>
        means.collect { case (fid, c) if slotOf(fid) == j => c }
          .toArray.sortBy(_._1)
      }.toArray)
      it += 1
    }
    model
  }

  /** Zero-exchange two-level assignment: one codegen argmax per row
    * ([[VectorExpressions.nearestCellTwoLevel]]); `cid` is the winning
    * FINE seed's id. Same output shape as [[assignWith]]. */
  def assignTwoLevel(df: DataFrame, idCol: String, vecCol: String,
      model: TwoLevel): DataFrame =
    df.select(col(idCol).as("neighbor_id"),
        VectorOps.toDouble(col(vecCol)).as("v"),
        VectorOps.norm2(col(vecCol)).as("n2"))
      .withColumn("cid", VectorExpressions.nearestCellTwoLevel(
        col("v"), col("n2"), model.coarseVecs, model.coarseNorms,
        model.fine.map(_.map(_._2)), model.fine.map(_.map(_._3)),
        model.fine.map(_.map(_._1))))

  /** The two-level FINE set as a DataFrame (ccid, fid, fv, fn) — the
    * model-as-DATA form for cell counts too large to embed in the
    * plan. */
  def fineTable(spark: org.apache.spark.sql.SparkSession,
      model: TwoLevel): DataFrame = {
    import spark.implicits._
    model.coarseIds.indices.flatMap { j =>
      model.fine(j).map { case (fid, fv, fn) =>
        (model.coarseIds(j), fid, fv.toSeq, fn)
      }
    }.toDF("ccid", "fid", "fv", "fn")
  }

  /** Two-level assignment with the fine centroids as DATA instead of a
    * plan constant — the shape for K past what a plan can embed
    * (all K×dim fine centroids otherwise ride along with EVERY task):
    * the coarse level stays a zero-exchange codegen argmax (√K-sized
    * constant), then rows join the (ccid → fine centroids) TABLE on
    * their coarse cell and take the per-row cosine argmax. Costs one
    * shuffle of the rows by ccid plus nFine candidate rows per input
    * row — the price of unbounded K; below that, prefer
    * [[assignTwoLevel]]'s scan-speed map. Same output and identical
    * tie-breaking (`row_number OVER (ORDER BY cos DESC, fid)` ⇔ the
    * expression's first-wins Double.compare), spec-asserted equal. */
  def assignTwoLevelAsData(df: DataFrame, idCol: String, vecCol: String,
      model: TwoLevel, fine: DataFrame): DataFrame = {
    val coarseOnly = df.select(col(idCol).as("neighbor_id"),
        VectorOps.toDouble(col(vecCol)).as("v"),
        VectorOps.norm2(col(vecCol)).as("n2"))
      .withColumn("ccid", VectorExpressions.nearestCell(col("v"),
        col("n2"), model.coarseVecs, model.coarseNorms, model.coarseIds))
    val w = Window.partitionBy(col("neighbor_id"))
      .orderBy(col("__cos").desc, col("fid").asc)
    coarseOnly.join(fine, Seq("ccid"))
      .withColumn("__cos", VectorOps.cosineWithNorms(
        VectorOps.dot(col("v"), col("fv")), col("n2"), col("fn")))
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col("neighbor_id"), col("v"), col("n2"),
        col("fid").as("cid"))
  }

  /** Exposed for plan assertions in ScalaTest: the assignment subtree
    * must stay exchange-free. */
  private[graft] def assignedForPlanCheck(corpus: DataFrame, idCol: String,
      vecCol: String, nlist: Int): DataFrame =
    assignCells(corpus, idCol, vecCol,
      seedCentroids(corpus, idCol, vecCol, nlist))

  /** Per-cell elementwise means of the assigned vectors, computed through
    * exact decimal sums (order-independent under any partitioning — the
    * same engine-stable mean as the label-centroid operator) and cast to
    * double at the boundary. Output: (cid, pos, centroid, n), one row per
    * (cell, dimension), pos 1-based. */
  private def cellMeans(assigned: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    assigned
      .select(col("cid"), posexplode(col("v")))
      // quantize at scale 8 (tie-free for float-sourced values) so the
      // sum is exact and identical across engines
      .select(col("cid"), (col("pos") + 1).as("pos"),
        col("col").cast(DecimalType(28, 8)).as("e"))
      .groupBy("cid", "pos")
      .agg((sum(col("e")).cast("double") / count(lit(1))).as("centroid"),
        count(lit(1)).as("n"))
  }

  /** One Lloyd iteration of the coarse quantizer over the seed centroids,
    * as a queryable DataFrame (the x24 oracle shape). */
  def lloydStep(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int): DataFrame =
    cellMeans(assignCells(corpus, idCol, vecCol,
      seedCentroids(corpus, idCol, vecCol, nlist)))

  /** `iters` Lloyd refinements of the seed quantizer. Each iteration runs
    * one zero-exchange assignment scan plus one map-side-combined
    * (cid, dim) mean agg; only nlist×dim rows return to the driver. Cells
    * that lose all members drop out (their cid disappears), matching the
    * GROUP BY semantics of the SQL oracle. The refreshed norm is a
    * left-to-right fold in element order — the same accumulation as
    * [[VectorOps.norm2]] and DuckDB's `list_dot_product`. */
  private def refinedCentroids(corpus: DataFrame, idCol: String,
      vecCol: String, nlist: Int, iters: Int): Centroids = {
    var cent = seedCentroids(corpus, idCol, vecCol, nlist)
    var it = 0
    while (it < iters) {
      cent = cellMeans(assignCells(corpus, idCol, vecCol, cent))
        .select(col("cid"), col("pos"), col("centroid"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          val cv = rows.sortBy(_.getInt(1)).map(_.getDouble(2))
          var cn = 0.0
          var i = 0
          while (i < cv.length) { cn += cv(i) * cv(i); i += 1 }
          (cid, cv, cn)
        }
        .toArray
        .sortBy(_._1)
      it += 1
    }
    cent
  }

  /** IVF-PQ: the full 100 TB index shape — coarse cells prune the
    * search space (only `nprobe` of `nlist` cells per query are read)
    * and PQ codes replace the vectors inside them (ADC distances from
    * the query's broadcast m×k lookup table). ONE corpus scan computes
    * BOTH the cell id and the codes (two expression constants side by
    * side, no join, no exchange); at query time the engine needs the
    * codes, the codebook and the centroids — never the raw vectors.
    * Distance ranking is exact-decimal like [[Pq.adcTopK]]; ties break
    * on neighbor_id; self-matches are excluded. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 2,
      m: Int = 8, kCodes: Int = 16,
      maxLutRows: Long = Pq.MaxLutRows): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import corpus.sparkSession.implicits._
    val cent = seedCentroids(corpus, idCol, vecCol, nlist)
    val cb = Pq.seedCodebooks(corpus, idCol, vecCol, m, kCodes)
    val subDim = cb(0)(0).length

    // one scan: (neighbor_id, cid, sub, code)
    val assignedCodes = corpus.select(col(idCol).as("neighbor_id"),
        graft.functions.VectorOps.toDouble(col(vecCol)).as("v"),
        graft.functions.VectorOps.norm2(col(vecCol)).as("n2"))
      .withColumn("cid", VectorExpressions.nearestCell(col("v"), col("n2"),
        cent.map(_._2), cent.map(_._3), cent.map(_._1)))
      .withColumn("codes", VectorExpressions.pqEncode(col("v"), cb))
      .select(col("neighbor_id"), col("cid"),
        posexplode(col("codes")).as(Seq("sub", "code")))
      .select(col("neighbor_id"), col("cid"),
        col("sub").cast("long").as("sub"), col("code"))

    val centDf = cent.toSeq.map { case (cid, cv, cn) => (cid, cv.toSeq, cn) }
      .toDF("cid", "cv", "cn")
    val qvec = queries.select(col(idCol).as("query_id"),
      graft.functions.VectorOps.toDouble(col(vecCol)).as("qv"),
      graft.functions.VectorOps.norm2(col(vecCol)).as("qn"))
    // enforce the "queries side is small" assumption the per-query LUT
    // broadcast below rests on (see Pq.MaxLutRows); ids-only count so
    // the probe job never evaluates the vector conversion
    if (maxLutRows != Long.MaxValue)
      Pq.requireLutFits(queries.select(col(idCol)).count(), m, kCodes,
        maxLutRows)
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__cos").desc, col("cid").asc)
    val probes = qvec.crossJoin(broadcast(centDf))
      .withColumn("__cos", graft.functions.VectorOps.cosineWithNorms(
        graft.functions.VectorOps.dot(col("qv"), col("cv")),
        col("qn"), col("cn")))
      .withColumn("__rn", row_number().over(wProbe))
      .where(col("__rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cid"))

    val cbDf = Pq.codebookDfFrom(corpus.sparkSession, cb)
    val lut = qvec.crossJoin(broadcast(cbDf))
      .withColumn("qsub",
        slice(col("qv"), col("sub").cast("int") * subDim + 1, lit(subDim)))
      .withColumn("d",
        (graft.functions.VectorOps.dot(col("qsub"), col("qsub"))
          - lit(2.0) * graft.functions.VectorOps.dot(col("qsub"), col("cw"))
          + graft.functions.VectorOps.dot(col("cw"), col("cw")))
          .cast(DecimalType(28, 12)))
      .select(col("query_id"), col("sub"), col("code"), col("d"))

    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("dd").asc, col("neighbor_id").asc)
    assignedCodes
      .join(broadcast(probes.select(col("query_id"), col("cid")).distinct()),
        Seq("cid"))
      .join(broadcast(lut), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("d")).as("dd"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("rank", row_number().over(wTop)).where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("dd").as("dist"))
  }

  /** Top-k cosine neighbors per query, searching only the `nprobe`
    * nearest of `nlist` coarse cells. `queries` and `corpus` share the
    * id/vector column names; self-matches are excluded. `refineIters`
    * Lloyd steps (default 0 = raw seeds) improve cell balance and recall
    * at the cost of one corpus scan + tiny agg per step. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 2,
      refineIters: Int = 0): DataFrame = {
    val cent =
      if (refineIters <= 0) seedCentroids(corpus, idCol, vecCol, nlist)
      else refinedCentroids(corpus, idCol, vecCol, nlist, refineIters)
    val assigned = assignCells(corpus, idCol, vecCol, cent)

    // probe list: the nprobe nearest centroids per query. The window runs
    // on the SMALL query side only (|Q| × nlist rows), never the corpus.
    import corpus.sparkSession.implicits._
    val centDf = cent.toSeq
      .map { case (cid, cv, cn) => (cid, cv.toSeq, cn) }
      .toDF("cid", "cv", "cn")
    val qvec = queries.select(col(idCol).as("query_id"),
      VectorOps.toDouble(col(vecCol)).as("qv"), VectorOps.norm2(col(vecCol)).as("qn"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__cos").desc, col("cid").asc)
    val probes = qvec.crossJoin(broadcast(centDf))
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
