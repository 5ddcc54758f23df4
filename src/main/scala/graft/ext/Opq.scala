package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** OPQ — optimized (rotated) product quantization (Ge et al., CVPR'13):
  * learn an orthogonal rotation R so that PQ's per-subspace independence
  * assumption fits the data better, minimizing
  * Σ ‖x − R·decode(encode(Rᵀx))‖². Non-parametric alternating scheme,
  * each step an exact minimization of that shared objective given the
  * others fixed — so the error sequence is provably non-increasing
  * (OpqSpec asserts it, the same invariant style as the PQ Lloyd spec;
  * on these SYNTHETIC isotropic vectors the achievable GAIN over plain
  * PQ is ~zero by construction — random data has no subspace
  * correlation to unskew — so the spec asserts the monotone/orthogonal
  * invariants, not an improvement bar the data cannot honor):
  *
  *  1. assignment: encode the rotated corpus with the current
  *     codebooks — [[graft.functions.expressions.VectorExpressions.pqEncode]]
  *     on the rotated column, one exchange-free scan;
  *  2. codebook update: per-(subspace, code) elementwise means of the
  *     rotated vectors — one map-side-combined aggregation of
  *     m·k·subDim rows (codewords that lose every member keep their
  *     previous value, same rule as [[Pq.refineCodebooks]]);
  *  3. rotation update (Procrustes): R = polar(M) for M = Σ x·ŷᵀ —
  *     M is a d×d sum of outer products (map-side combined to d² rows
  *     per task), the polar factor computed driver-side from a Jacobi
  *     eigensolve of MᵀM (d×d, deterministic cyclic sweeps).
  *
  * The reconstruction error needs no extra pass: Σ‖x‖² − 2·tr(RᵀM) +
  * Σ‖ŷ‖², all three terms available from the M aggregation round.
  *
  * At 100 TB: every distributed step is a scan + bounded-size partial
  * aggregation (m·k·subDim or d² rows per task); only d×d matrices and
  * the codebooks live on the driver. The rotation apply is an O(d²)
  * per-row map (columnar HOF here; a codegen MatVec expression is the
  * upgrade path if it ever profiles hot).
  */
object Opq {

  type Mat = Array[Array[Double]]

  /** z = Rᵀ·x as a column expression (R orthogonal ⇒ Rᵀ = R⁻¹) — the
    * codegen [[graft.functions.expressions.VectorExpressions.matVecT]]
    * (one fused primitive loop, matrix embedded as a plan constant), so
    * the corpus-wide rotation runs at scan speed. [[rotateTHof]] is the
    * built-in-HOF reference form; OpqSpec asserts the two are
    * bit-identical. */
  def rotateT(vec: Column, r: Mat): Column =
    graft.functions.expressions.VectorExpressions.matVecT(vec, r)

  /** Reference implementation of [[rotateT]] from built-in HOFs only —
    * the accumulation-order spec the codegen expression must match
    * bit-for-bit (left-to-right over i, per output j). */
  def rotateTHof(vec: Column, r: Mat): Column = {
    val d = r.length
    val rLit = array(r.toIndexedSeq.map(row =>
      array(row.toIndexedSeq.map(lit): _*)): _*)
    transform(sequence(lit(0), lit(d - 1)), j =>
      aggregate(sequence(lit(0), lit(d - 1)), lit(0.0), (acc, i) =>
        acc + element_at(element_at(rLit, i + 1), j + 1) *
          element_at(vec, i + 1)))
  }

  /** x = R·z — the inverse map, for round-trip checks. */
  def rotate(vec: Column, r: Mat): Column = rotateT(vec, transpose(r))

  private[graft] def transpose(m: Mat): Mat =
    Array.tabulate(m(0).length, m.length)((i, j) => m(j)(i))

  private def matMul(a: Mat, b: Mat): Mat = {
    val n = a.length; val p = b(0).length; val q = b.length
    Array.tabulate(n, p) { (i, j) =>
      var s = 0.0; var k = 0
      while (k < q) { s += a(i)(k) * b(k)(j); k += 1 }
      s
    }
  }

  /** Deterministic cyclic Jacobi eigensolver for a symmetric matrix:
    * returns (eigenvalues, eigenvector columns V) with A = V·diag(λ)·Vᵀ.
    * Fixed sweep order and count — bit-reproducible across runs. */
  private[graft] def jacobiEigen(aIn: Mat, sweeps: Int = 30)
      : (Array[Double], Mat) = {
    val n = aIn.length
    val a = aIn.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < sweeps) {
      var off = 0.0
      for (p <- 0 until n; q <- p + 1 until n) off += a(p)(q) * a(p)(q)
      if (off < 1e-22) sweep = sweeps
      else {
        for (p <- 0 until n; q <- p + 1 until n if math.abs(a(p)(q)) > 1e-15) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t = math.signum(theta) /
            (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case x => x
            }
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          var k = 0
          while (k < n) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
            k += 1
          }
          k = 0
          while (k < n) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
            k += 1
          }
          k = 0
          while (k < n) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
            k += 1
          }
        }
        sweep += 1
      }
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Polar factor of M (the orthogonal R = U·Vᵀ from M's SVD), via
    * R = M·V·diag(1/σ)·Vᵀ with (σ², V) = eigen(MᵀM). Singular directions
    * (σ ≈ 0) keep the identity's column — deterministic and orthogonal
    * for any input that spans the space. */
  private[graft] def polar(m: Mat): Mat = {
    val n = m.length
    val (lam, v) = jacobiEigen(matMul(transpose(m), m))
    val sigMax = math.sqrt(lam.map(math.abs).max.max(1e-300))
    val invS = lam.map { l =>
      val s = math.sqrt(math.max(l, 0.0))
      if (s > 1e-12 * sigMax) 1.0 / s else 0.0
    }
    // a zero σ means the decoded corpus does not span the space and the
    // rotation is underdetermined — refuse rather than return a
    // non-orthogonal matrix
    require(invS.forall(_ > 0.0),
      "rotation underdetermined: decoded corpus does not span the space")
    val mv = matMul(m, v)
    val scaled = Array.tabulate(n, n)((i, j) => mv(i)(j) * invS(j))
    matMul(scaled, transpose(v))
  }

  /** One learned state: rotation, codebooks, and the reconstruction
    * error Σ‖x − R·ŷ‖² the state achieves. */
  case class OpqModel(rotation: Mat, codebooks: Array[Array[Array[Double]]],
      errors: Seq[Double])

  /** ADC top-k search in the OPQ-rotated space: learn (or reuse) a
    * model, rotate queries and corpus with R, encode the rotated corpus
    * under the learned codebooks, and search with the shared ADC
    * machinery ([[Pq.adcTopKEncoded]] — broadcast LUTs, exact-decimal
    * ranking, LUT-size guard). Because R is orthogonal, distances in
    * the rotated space ARE the original distances; only the
    * quantization grid moved. With `iters = 0` the model is R = I with
    * seed codebooks, so the result is EXACTLY [[Pq.adcTopK]]
    * (spec-asserted identity — the OPQ layer only re-fits, never
    * re-ranks). */
  def adcTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 8, kCodes: Int = 16,
      iters: Int = 2, model: Option[OpqModel] = None,
      maxDim: Int = MaxLearnDim): DataFrame = {
    val mod = model.getOrElse(
      learn(corpus, idCol, vecCol, m, kCodes, iters, maxDim))
    def rotated(df: DataFrame): DataFrame = df.select(col(idCol),
      rotateT(VectorOps.toDouble(col(vecCol)), mod.rotation).as("__z"))
    Pq.adcTopKEncoded(rotated(queries),
      Pq.encodeLongWith(rotated(corpus), idCol, "__z", mod.codebooks),
      mod.codebooks, idCol, "__z", k)
  }

  /** Rotated long-form encode (id, sub, code) under a learned model —
    * the x55 query/oracle shape: z = Rᵀ·x at scan speed (codegen
    * [[rotateT]]), then the x38 encode discipline on z. Everything the
    * oracle needs (R, codebooks) is a plan constant, so a SQL engine
    * given the same literals recomputes the encode bit-for-bit. */
  def encodeLong(corpus: DataFrame, idCol: String, vecCol: String,
      model: OpqModel): DataFrame =
    Pq.encodeLongWith(
      corpus.select(col(idCol),
        rotateT(VectorOps.toDouble(col(vecCol)), model.rotation).as("__z")),
      idCol, "__z", model.codebooks)

  /** Alternating OPQ training. `iters` full (assign, codebooks,
    * rotation) rounds from R = I and id-seeded codebooks; the returned
    * `errors` (one per round, measured after the rotation update) are
    * non-increasing up to fp noise — spec-asserted. */
  /** Default bound on the embedding dimension [[learn]] accepts: the
    * rotation update runs a driver-side O(d³) Jacobi eigensolve per
    * iteration (fine to ~1k dims, minutes-to-hours beyond), and the d²
    * outer-product aggregation rows grow quadratically. Refuse loudly —
    * the same enforce-don't-hope style as [[Pq.MaxLutRows]] — rather
    * than silently burning the driver on a d=8192 column. Callers that
    * accept the cost opt in per call via `maxDim` (the
    * [[Pq.adcTopKEncoded]] `maxLutRows` pattern) — e.g. d=1536 works,
    * slowly, and is a deliberate choice, not a hard wall. */
  val MaxLearnDim: Int = 1024

  def learn(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 16, iters: Int = 3,
      maxDim: Int = MaxLearnDim): OpqModel = {
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.expressions.VectorExpressions
    val d = corpus.select(size(col(vecCol))).first().getInt(0)
    require(d <= maxDim,
      s"Opq.learn: dim $d > $maxDim — the rotation update is a " +
        "driver-side O(d^3) Jacobi eigensolve per iteration; reduce the " +
        "dimension first (e.g. a fixed projection) or pass a larger " +
        "maxDim knowing the cost")
    val base = corpus.select(col(idCol).as("id"),
      VectorOps.toDouble(col(vecCol)).as("x")).localCheckpoint()
    val sumX2 = base.select(
      sum(VectorOps.dot(col("x"), col("x")))).first().getDouble(0)
    var r: Mat = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var cb = Pq.seedCodebooks(base, "id", "x", m, k)
    val subDim = d / m
    val errors = scala.collection.mutable.ArrayBuffer[Double]()
    var it = 0
    while (it < iters) {
      // 1+2: rotate, assign, re-estimate codebooks as member means
      val rotated = base.select(col("id"), rotateT(col("x"), r).as("z"))
        .localCheckpoint()
      val enc = rotated.select(col("id"),
        posexplode(VectorExpressions.pqEncode(col("z"), cb))
          .as(Seq("sub", "code")))
        .select(col("id"), col("sub").cast("long").as("sub"), col("code"))
      val elems = rotated.select(col("id"),
          posexplode(col("z")).as(Seq("p", "zv")))
        .select(col("id"), (col("p") / lit(subDim)).cast("long").as("sub"),
          pmod(col("p"), lit(subDim)).cast("long").as("ii"), col("zv"))
      val means = elems.join(enc, Seq("id", "sub"))
        .groupBy("sub", "code", "ii")
        .agg((sum(col("zv").cast(DecimalType(28, 8))).cast("double")
          / count(lit(1))).as("mv"))
        .collect()
      val nextCb = cb.map(_.map(_.clone()))
      means.foreach { row =>
        nextCb(row.getLong(0).toInt)(row.getLong(1).toInt)(
          row.getLong(2).toInt) = row.getDouble(3)
      }
      cb = nextCb
      // 3: ŷ from the (fresh cb) codes, M = Σ x·ŷᵀ, R = polar(M)
      val enc2 = rotated.select(col("id"),
        VectorExpressions.pqEncode(col("z"), cb).as("codes"))
      val yhat = Pq.decode(enc2, Pq.codebookDfFrom(corpus.sparkSession, cb),
        "id").withColumnRenamed("vec", "y")
      val joined = base.join(yhat, "id").localCheckpoint()
      val sumY2 = joined.select(
        sum(VectorOps.dot(col("y"), col("y")))).first().getDouble(0)
      // exact-decimal sum: a plain double sum is accumulation-order
      // dependent across partitions, which would make R — and everything
      // downstream (the encode, the x55 oracle golden) — wobble run to
      // run. DecimalType(38,18) holds xi·yj products (|x| bounded by the
      // embedding scale) exactly enough that the merged sum is
      // order-independent; the boundary cast to double happens once.
      val mRows = joined.select(
          posexplode(col("x")).as(Seq("i", "xi")), col("y"))
        .select(col("i"), posexplode(col("y")).as(Seq("j", "yj")),
          col("xi"))
        .groupBy("i", "j")
        .agg(sum((col("xi") * col("yj")).cast(DecimalType(38, 18)))
          .cast("double").as("mij"))
        .collect()
      val mMat: Mat = Array.ofDim[Double](d, d)
      mRows.foreach(row =>
        mMat(row.getInt(0))(row.getInt(1)) = row.getDouble(2))
      r = polar(mMat)
      val trace = (0 until d).map(i =>
        (0 until d).map(j => r(j)(i) * mMat(j)(i)).sum).sum
      errors += sumX2 - 2.0 * trace + sumY2
      it += 1
    }
    OpqModel(r, cb, errors.toSeq)
  }
}
