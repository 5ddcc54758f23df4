package graft

import org.apache.spark.sql.functions._
import graft.ext.Opq

/** OPQ invariants. On the synthetic isotropic embeddings the achievable
  * gain over plain PQ is ~zero by construction (no subspace correlation
  * to unskew), so — like the PQ/IVF specs — these assert the exact
  * mathematical invariants of the alternation, not an improvement bar
  * the data cannot honor. */
class OpqSpec extends SparkSpec {
  import spark.implicits._

  private def maxAbs(m: Opq.Mat): Double =
    m.map(_.map(math.abs).max).max

  test("OPQ: monotone error, orthonormal rotation, lossless rotate round-trip") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val model = Opq.learn(emb, "vec_id", "embedding", m = 8, k = 16, iters = 3)
    // alternating exact minimizations of one objective: non-increasing
    assert(model.errors.size == 3)
    model.errors.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a * (1.0 + 1e-9), s"error increased: $a -> $b")
    }
    assert(model.errors.forall(e => e > 0.0 && !e.isNaN))
    // R orthonormal: RᵀR = I within fp tolerance
    val d = model.rotation.length
    val rtr = {
      val rt = Opq.transpose(model.rotation)
      Array.tabulate(d, d)((i, j) =>
        (0 until d).map(k => rt(i)(k) * model.rotation(k)(j)).sum -
          (if (i == j) 1.0 else 0.0))
    }
    assert(maxAbs(rtr) < 1e-8, s"RtR deviates from I by ${maxAbs(rtr)}")
    // rotateT preserves norms and rotate inverts it, row-for-row
    val probe = emb.limit(20).select($"vec_id",
      graft.functions.VectorOps.toDouble($"embedding").as("x"))
    val roundTrip = probe
      .withColumn("z", Opq.rotateT($"x", model.rotation))
      .withColumn("back", Opq.rotate($"z", model.rotation))
      .select(
        abs(graft.functions.VectorOps.dot($"x", $"x") -
          graft.functions.VectorOps.dot($"z", $"z")).as("normDrift"),
        aggregate(zip_with($"x", $"back", (a, b) => abs(a - b)),
          lit(0.0), (acc, v) => greatest(acc, v)).as("elemDrift"))
      .agg(max($"normDrift"), max($"elemDrift")).first()
    assert(roundTrip.getDouble(0) < 1e-6, "rotation does not preserve norms")
    assert(roundTrip.getDouble(1) < 1e-8, "rotate does not invert rotateT")
    // the codegen MatVecT matches the built-in-HOF reference fold
    // bit-for-bit (same left-to-right accumulation order)
    val parity = probe
      .select(Opq.rotateT($"x", model.rotation).as("fast"),
        Opq.rotateTHof($"x", model.rotation).as("ref"))
      .where(not($"fast" <=> $"ref"))
    assert(parity.count() == 0, "MatVecT diverges from the HOF reference")
  }

  test("Opq.learn refuses dimensions beyond MaxLearnDim (driver O(d^3) guard)") {
    val wide = Seq((1L, Array.fill(Opq.MaxLearnDim + 8)(0.5)),
      (2L, Array.fill(Opq.MaxLearnDim + 8)(0.25)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Opq.learn(wide, "vec_id", "embedding", m = 8, k = 2, iters = 1)
    }
    assert(e.getMessage.contains("O(d^3)"))
  }

  test("MatVecT fails loudly on a dimension-mismatched vector") {
    val r: Opq.Mat = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val bad = Seq((1L, Array(1.0, 2.0, 3.0))).toDF("id", "x")
    val e = intercept[Exception] {
      bad.select(Opq.rotateT($"x", r)).collect()
    }
    // surfaces either directly or wrapped by the task failure
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("mat_vec_t")), chain(e).mkString(" | "))
  }

  test("OPQ ADC search: identity model is exactly plain ADC; trained model well-formed") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.where($"vec_id" < 5)
    // iters = 0 → R = I, seed codebooks: the rotation layer must be
    // invisible — same decimal distances, same ties, same rows
    val identity = rows(Opq.adcTopK(q, emb, "vec_id", "embedding", k = 5,
      iters = 0)).map(_.toString).sorted
    val plain = rows(graft.ext.Pq.adcTopK(q, emb, "vec_id", "embedding",
      k = 5)).map(_.toString).sorted
    assert(identity == plain, "identity-rotation OPQ differs from plain ADC")
    // trained model still returns a full, well-ranked result set
    val trained = rows(Opq.adcTopK(q, emb, "vec_id", "embedding", k = 5,
      iters = 2))
    assert(trained.groupBy(_.getAs[Long]("query_id")).size == 5)
    trained.groupBy(_.getAs[Long]("query_id")).values.foreach { rs =>
      assert(rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("rank")) ==
        (1L to 5L))
    }
  }

  test("encodeLong: identity model is the plain PQ encode; maxDim override works") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // iters = 0 → R = I, seed codebooks: rotated encode ≡ Pq.encodeLong
    val idModel = Opq.learn(emb, "vec_id", "embedding", m = 8, k = 16,
      iters = 0)
    val rotated = rows(Opq.encodeLong(emb, "vec_id", "embedding", idModel)
      .orderBy("vec_id", "sub")).map(_.toString)
    val plain = rows(graft.ext.Pq.encodeLong(emb, "vec_id", "embedding")
      .orderBy("vec_id", "sub")).map(_.toString)
    assert(rotated == plain && rotated.nonEmpty)
    // a trained model changes codes (the grid moved) but keeps the shape
    val trained = Opq.learn(emb, "vec_id", "embedding", m = 8, k = 16,
      iters = 1)
    val enc = Opq.encodeLong(emb, "vec_id", "embedding", trained)
    assert(enc.count() == emb.count() * 8)
    // the maxDim escape hatch admits a dimension the default refuses
    val wide = Seq((1L, Array.fill(Opq.MaxLearnDim + 8)(0.5)),
      (2L, Array.fill(Opq.MaxLearnDim + 8)(0.25)),
      (3L, Array.fill(Opq.MaxLearnDim + 8)(0.125)))
      .toDF("vec_id", "embedding")
    val m = Opq.learn(wide, "vec_id", "embedding", m = 8, k = 2, iters = 0,
      maxDim = Opq.MaxLearnDim + 8)
    assert(m.rotation.length == Opq.MaxLearnDim + 8)
  }

  test("OPQ jacobi/polar: recovers a known rotation exactly") {
    // polar(R) = R for an orthogonal matrix: build a block-diagonal
    // Givens rotation and check the solver returns it
    val d = 6
    val theta = 0.7
    val g: Opq.Mat = Array.tabulate(d, d) { (i, j) =>
      if (i == j && i >= 2) 1.0
      else if (i == 0 && j == 0) math.cos(theta)
      else if (i == 0 && j == 1) -math.sin(theta)
      else if (i == 1 && j == 0) math.sin(theta)
      else if (i == 1 && j == 1) math.cos(theta)
      else 0.0
    }
    // scale by a positive-definite stretch: polar(G·S) must return G
    val s: Opq.Mat = Array.tabulate(d, d)((i, j) =>
      if (i == j) 1.0 + 0.5 * i else 0.0)
    val gs = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => g(i)(k) * s(k)(j)).sum)
    val rec = graft.ext.Opq.polar(gs)
    val drift = Array.tabulate(d, d)((i, j) =>
      math.abs(rec(i)(j) - g(i)(j))).map(_.max).max
    assert(drift < 1e-10, s"polar factor off by $drift")
  }
}
