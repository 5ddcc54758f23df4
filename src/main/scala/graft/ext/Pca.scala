package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Top PRINCIPAL COMPONENT of an embedding column by power iteration
  * on the exact integer covariance numerator — the "all-but-the-top"
  * embedding-hygiene primitive (Mu & Viswanath ICLR'18: frequent-word
  * embeddings share a dominant direction; removing it improves nearly
  * every similarity benchmark) and the dominant-drift axis the
  * centroid alarms (x143/x174) cannot name.
  *
  * DETERMINISM — the whole pipeline is integer-exact until one final
  * normalization:
  *  - coordinates quantize once to 1e-6 micro-units (floor — no
  *    rounding ties), so second moments S_ij = Σ x_i·x_j and totals
  *    T_i are EXACT DECIMAL(38,0) sums (order-free under any
  *    partitioning);
  *  - the covariance NUMERATOR M_ij = N·S_ij − T_i·T_j (the 1/N² and
  *    quantization scales cancel in the eigenvector) is exact, then
  *    rescaled by one integer division M DIV max(1, maxAbs DIV 1e15)
  *    (both engines truncate toward zero — parity-checked) so each
  *    mat-vec product stays far inside 38 digits;
  *  - each power-iteration round is an exact integer mat-vec plus an
  *    integer renormalization v' = y DIV max(1, maxAbs(y) DIV 1e6)
  *    (the x176 floor-quantized recipe with the IEEE ops removed
  *    entirely);
  *  - the single double chain at the boundary divides by one sqrt of
  *    an exact integer norm.
  * Starting vector is (1e6 + i) per dim i — deterministic, and never
  * exactly orthogonal to the top eigenvector the way all-ones is for
  * antisymmetric loadings (the measured hand-case collapse). The sign
  * of the returned component is the deterministic one this start
  * converges to (eigenvector sign is inherently a convention).
  *
  * Scale shape: one posexplode pass, one per-vector dim² pair
  * fan-out feeding a map-side-combinable 4096-row moment agg (the
  * textbook O(n·d²) covariance — the shuffle carries only the d²
  * partials), then `iters` rounds of d²-row × d-row joins — model-
  * sized, executor-resident, nothing per-vector after the first agg.
  *
  * Output: (dim, loading), `dim` rows, ‖loading‖₂ = 1.
  *
  * Reference for the quantized-iteration shape:
  * /root/reference/schema.sql has no linear-algebra surface — this is
  * an extension-tier operator for the LLM-pipeline family. */
object Pca {

  private val N0 = DecimalType(38, 0)

  /** Micro-unit quantized coordinates (__id, __i, __xq) — public as a
    * memoization building block: x195/x196 share one materialization
    * through the session Memo instead of re-running the explode. */
  def quantized(vecs: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    vecs.select(col(idCol).as("__id"),
        posexplode(col(vecCol)).as(Seq("__i", "__x")))
      .select(col("__id"), col("__i"),
        floor(col("__x").cast("double") * lit(1e6)).cast("long")
          .as("__xq"))
      .localCheckpoint(true) // feeds totals AND the pair moments

  def topComponent(vecs: DataFrame, idCol: String, vecCol: String,
      iters: Int = 4): DataFrame =
    normalizeComponent(powerVector(quantized(vecs, idCol, vecCol), iters))

  /** The (dim, loading) normalization tail over an un-normalized
    * integer component. */
  def normalizeComponent(v: DataFrame): DataFrame = {
    val norm = v.agg(sum(col("__v").cast(N0) * col("__v").cast(N0))
      .as("__n2"))
    // a zero-covariance corpus (constant embeddings) collapses v to 0
    // — NULL loadings, never an ANSI divide-by-zero crash
    v.crossJoin(broadcast(norm))
      .select(col("__i").cast("long").as("dim"),
        when(col("__n2") > 0,
          col("__v").cast("double") /
            sqrt(col("__n2").cast("double"))).as("loading"))
  }

  /** The UN-normalized integer component (__i, __v): the exact-
    * arithmetic core [[topComponent]] normalizes and [[anisotropy]]
    * projects against — public for session memoization. */
  def powerVector(pe: DataFrame, iters: Int): DataFrame =
    powerVectorFromMoments(
      pe.groupBy("__i").agg(count(lit(1)).as("__n"),
        sum(col("__xq").cast(N0)).as("__t")),
      pe.as("a").join(pe.as("b"), Seq("__id"))
        .groupBy(col("a.__i").as("__ia"), col("b.__i").as("__ib"))
        .agg(sum(col("a.__xq").cast(N0) * col("b.__xq").cast(N0))
          .as("__s")),
      iters)

  /** [[powerVector]] from PRE-AGGREGATED moment frames — per-dim
    * (__i, __n, __t) and per-dim-pair (__ia, __ib, __s). Counts and
    * exact decimal sums are commutative monoids, so per-batch partials
    * folded by any grouping reproduce the exact covariance numerator —
    * which is what gives the top component a streaming view bit-equal
    * to its batch operator (the additive-ledger discipline reaching
    * linear algebra). */
  def powerVectorFromMoments(nRow0: DataFrame, s: DataFrame,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 10, s"powerVector: iters=$iters")
    val nRow = nRow0.localCheckpoint(true) // d rows
    val m0 = s
      .join(nRow.select(col("__i").as("__ia"), col("__n"),
        col("__t").as("__ta")), Seq("__ia"))
      .join(nRow.select(col("__i").as("__ib"), col("__t").as("__tb")),
        Seq("__ib"))
      .select(col("__ia"), col("__ib"),
        (col("__n").cast(N0) * col("__s") - col("__ta") * col("__tb"))
          .as("__m"))
    // DIV (integral divide, truncation toward zero in BOTH engines —
    // a decimal→decimal CAST would round half-up and diverge) rescales
    // the matrix once and each round's vector; quotients fit LONG by
    // construction (≤1e15 and ≤1e6 respectively)
    val maxAbs = m0.agg(max(abs(col("__m"))).as("__ma"))
    val mm = m0.crossJoin(broadcast(maxAbs))
      .withColumn("__sc",
        greatest(lit(1L), expr("__ma DIV 1000000000000000")))
      .select(col("__ia"), col("__ib"),
        expr("__m DIV __sc").as("__m"))
      .localCheckpoint(true) // d² rows, feeds every round
    // init 1e6 + i: the all-ones start is EXACTLY orthogonal to the
    // top eigenvector of any antisymmetric-loading matrix (measured:
    // the (1,−1) hand case collapses y to the zero vector in round 1);
    // the per-dim offset breaks that symmetry deterministically
    val dims = nRow.select(col("__i"))
    var v = dims.withColumn("__v", lit(1000000L) + col("__i"))
    for (_ <- 1 to iters) {
      val y = mm.join(v.select(col("__i").as("__ib"), col("__v")),
          Seq("__ib"))
        .groupBy(col("__ia").as("__i"))
        .agg(sum(col("__m").cast(N0) * col("__v").cast(N0)).as("__y"))
      val sc = y.agg(max(abs(col("__y"))).as("__yma"))
      v = y.crossJoin(broadcast(sc))
        .withColumn("__sc", greatest(lit(1L), expr("__yma DIV 1000000")))
        .select(col("__i"), expr("__y DIV __sc").as("__v"))
    }
    v
  }

  /** ALL-BUT-THE-TOP corrected source-centroid cosine matrix — the
    * x174 mirror audit AFTER centering and removing the dominant axis
    * (Mu & Viswanath's correction actually applied, mean first): with
    * the common mean and common-mode direction gone, a still-high
    * pair cosine is real shared content, not the corpus-wide
    * anisotropy x196 measures. Everything stays EXACT integers:
    * scaled-centered sums X = ts·N − ns·T per (source, dim), residual
    * C = X·‖v‖² − (X·v)·v (projection is linear — the per-source
    * residual sum IS the residual of the per-source sum, so the whole
    * correction runs on the model-sized (source, dim) table, never
    * per vector), two global truncating DIV rescales keep products in
    * 38 digits and the boundary below 2^53, and the one IEEE region
    * is [[Similarity.sourceCentroidMatrixFromSums]]' dim-ordered fold.
    * Scale shape: two (…, dim) combiner aggs + model-sized joins —
    * the pair tail is |sources|²-bounded.
    * Output: (src_a, src_b, cosine), src_a < src_b. */
  def correctedSourceMatrix(pe: DataFrame, v0: DataFrame,
      docs: DataFrame, idCol: String, srcCol: String): DataFrame = {
    val v = v0.localCheckpoint(true) // d rows
    val nv = broadcast(v.agg(
      sum(col("__v").cast(N0) * col("__v").cast(N0)).as("__nv")))
    // CENTERING FIRST is load-bearing: projecting UNCENTERED vectors
    // lets the global mean's (huge) axis component pollute every
    // residual — the hand case read corrected cosine 1.0 where the
    // true orthogonal signal is −1. Scaled-centered integers
    // X_i = xq_i·N − T_i keep everything exact; projection is LINEAR,
    // so the per-source residual SUM equals the residual of the
    // per-source sum — computed entirely on the model-sized
    // (source, dim) table, never per vector.
    val glob = pe.groupBy("__i").agg(count(lit(1)).as("__N"),
      sum(col("__xq").cast(N0)).as("__T"))
    val perSrc = pe
      .join(docs.select(col(idCol).as("__id"), col(srcCol).as("src")),
        Seq("__id"))
      .groupBy(col("src"), col("__i"))
      .agg(count(lit(1)).as("__ns"), sum(col("__xq").cast(N0)).as("__ts"))
    val ssx = perSrc.join(glob, Seq("__i"))
      .select(col("src"), col("__i"),
        (col("__ts") * col("__N").cast(N0) -
          col("__ns").cast(N0) * col("__T")).as("__x"))
    // two truncating rescales by GLOBAL positive factors (cancel in
    // every cosine; DIV ≡ // in both engines): the first bounds the
    // ·nv products inside 38 digits, the second puts the boundary
    // integers below 2^53 — a >2^53 decimal→double cast is where
    // Spark and DuckDB round a last ulp apart (measured)
    val xMax = ssx.agg(max(abs(col("__x"))).as("__xm"))
    val ssr = ssx.crossJoin(broadcast(xMax))
      .withColumn("__sc", greatest(lit(1L), expr("__xm DIV 1000000000000")))
      .select(col("src"), col("__i"), expr("__x DIV __sc").as("__x"))
      .localCheckpoint(true) // |sources|·d rows, feeds P and C
    val p = ssr.join(v, Seq("__i"))
      .groupBy("src")
      .agg(sum(col("__x").cast(N0) * col("__v").cast(N0)).as("__p"))
    val c = ssr.join(v, Seq("__i")).join(p, Seq("src")).crossJoin(nv)
      .select(col("src"), col("__i").as("dim"),
        (col("__x").cast(N0) * col("__nv") -
          col("__p") * col("__v").cast(N0)).as("s"))
    val sMax = c.agg(max(abs(col("s"))).as("__sm"))
    val scaled = c.crossJoin(broadcast(sMax))
      .withColumn("__sc", greatest(lit(1L), expr("__sm DIV 1000000000000")))
      .select(col("src"), col("dim"), expr("s DIV __sc").as("s"))
    Similarity.sourceCentroidMatrixFromSums(scaled)
  }

  /** Persist an un-normalized integer component ([[powerVector]]'s
    * output) — the quantizer-model discipline (x162/x163) applied to
    * the PCA family: the exact integers round-trip through parquet
    * bit-for-bit, so serving against a loaded component is
    * bit-identical to serving against the freshly iterated one (the
    * shared oracle IS that claim). d rows → one file. */
  def saveComponent(v: DataFrame, path: String): Unit =
    v.select(col("__i"), col("__v").cast("long").as("__v"))
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a [[saveComponent]] component. */
  def loadComponent(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(path).select(col("__i"), col("__v"))

  /** Embedding-space ANISOTROPY audit per label: the mean |cos| of
    * each vector against the corpus's TOP COMPONENT — Ethayarajh
    * EMNLP'19's observation made a per-class dashboard row: a healthy
    * embedding space is near-isotropic (mean |cos| small); a class
    * whose vectors all lean on the dominant axis is carrying rogue
    * frequency/length signal, and "all-but-the-top" removal is the
    * fix this number motivates (and re-measures after).
    *
    * Determinism: projections p = Σ xq·v and norms are EXACT decimal
    * sums of integer products; each vector's cos is ONE double chain;
    * |cos| floor-quantizes to 1e-6 micro-units so the per-label MEAN
    * is an exact integer sum with one boundary division (the x139
    * order-free discipline — a naive avg() of doubles would be
    * partitioning-dependent). Zero vectors yield NULL cos and are
    * excluded from the mean with their count reported. Scale shape:
    * the one d²-moment pass of [[topComponent]] + one per-vector
    * combiner agg + one label agg.
    * Output: (label, n, n_zero, mean_abs_cos), per label. */
  def anisotropy(vecs: DataFrame, idCol: String, vecCol: String,
      labelCol: String, iters: Int = 4): DataFrame = {
    val pe = quantized(vecs, idCol, vecCol)
    anisotropyWith(pe, powerVector(pe, iters), vecs, idCol, labelCol)
  }

  /** [[anisotropy]] over PRE-BUILT quantized coordinates and component
    * — the memo-shared form (x195 and x196 ask for the same exact
    * artifacts of the same snapshot). */
  def anisotropyWith(pe: DataFrame, v0: DataFrame, vecs: DataFrame,
      idCol: String, labelCol: String): DataFrame = {
    val v = v0.localCheckpoint(true) // d rows
    val nv = broadcast(v.agg(
      sum(col("__v").cast(N0) * col("__v").cast(N0)).as("__nv")))
    val per = pe.join(v, Seq("__i"))
      .groupBy("__id").agg(
        sum(col("__xq").cast(N0) * col("__v").cast(N0)).as("__p"),
        sum(col("__xq").cast(N0) * col("__xq").cast(N0)).as("__nx"))
    val cosv = per.crossJoin(nv)
      .select(col("__id"),
        when(col("__nx") > 0 && col("__nv") > 0,
          col("__p").cast("double") /
            (sqrt(col("__nx").cast("double")) *
              sqrt(col("__nv").cast("double")))).as("__c"))
    cosv.join(vecs.select(col(idCol).as("__id"),
        col(labelCol).as("label")), Seq("__id"))
      .groupBy("label").agg(
        count(lit(1)).as("n"),
        sum(when(col("__c").isNull, 1L).otherwise(0L)).as("n_zero"),
        sum(floor(abs(col("__c")) * lit(1e6)).cast("long")).as("__s"),
        count(col("__c")).as("__nc"))
      .select(col("label"), col("n"), col("n_zero"),
        when(col("__nc") > 0,
          col("__s").cast("double") /
            (col("__nc").cast("double") * lit(1e6))).as("mean_abs_cos"))
  }
}
