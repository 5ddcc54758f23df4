package graft

import org.apache.spark.sql.functions._
import graft.ext.Ivf
import graft.functions.VectorOps
import graft.functions.expressions.VectorExpressions

/** Independent evidence for the collect-once Lloyd trainers: the
  * DataFrame-resident training chains ([[Ivf.train]] with refinements,
  * [[Ivf.trainTwoLevel]] → [[Ivf.trainTwoLevelAsData]]) are asserted
  * bitwise-equal to a PLAIN-SCALA reference of the whole pipeline —
  * seed selection, first-wins cosine argmax assignment, exact-decimal
  * scale-8 member means, left-to-right norm folds. Since round 9 the
  * plan-constant trainers delegate to the DataFrame chain, so the old
  * "plan form ≡ data form" spec no longer witnesses the arithmetic;
  * this reference does (the x70/x78 lesson: bit-equality against a
  * scalar reference catches decimal/rounding drift before the oracle). */
class IvfTrainSpec extends SparkSpec {
  import spark.implicits._

  private type C = (Long, Array[Double], Double)

  private lazy val corpus: Seq[C] =
    rows(graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding"))
      .map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        (r.getLong(0), v, dotRef(v, v))
      }
      .sortBy(_._1)

  /** Left-to-right min-length accumulation — the DotProduct contract. */
  private def dotRef(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** First-wins Double.compare argmax over cents in the given order —
    * the NearestCell tie rule. Returns the winning index. */
  private def argmaxIdx(v: Array[Double], n2: Double,
      cents: IndexedSeq[C]): Int = {
    val sq = math.sqrt(n2)
    var best = 0.0
    var bestJ = 0
    var j = 0
    while (j < cents.length) {
      val cos = dotRef(v, cents(j)._2) / (sq * math.sqrt(cents(j)._3))
      if (j == 0 || java.lang.Double.compare(cos, best) > 0) {
        best = cos; bestJ = j
      }
      j += 1
    }
    bestJ
  }

  /** Exact-decimal member means, the cellMeans arithmetic: each element
    * quantized to scale 8 HALF_UP (Spark's double→decimal cast), summed
    * exactly, cast to double, divided by the member count. The refreshed
    * norm is the left-to-right acc + x·x fold. */
  private def meansRef(assigned: Seq[(Long, Array[Double])]): Seq[C] =
    assigned.groupBy(_._1).toSeq.map { case (cid, members) =>
      val dim = members.head._2.length
      val cv = Array.tabulate(dim) { i =>
        var sum = java.math.BigDecimal.ZERO
        members.foreach { case (_, v) =>
          sum = sum.add(java.math.BigDecimal.valueOf(v(i))
            .setScale(8, java.math.RoundingMode.HALF_UP))
        }
        sum.doubleValue / members.size.toDouble
      }
      var cn = 0.0
      var i = 0
      while (i < dim) { cn += cv(i) * cv(i); i += 1 }
      (cid, cv, cn)
    }.sortBy(_._1)

  private def lloydRef(nlist: Int, iters: Int): Seq[C] = {
    var cents: IndexedSeq[C] = corpus.take(nlist).toIndexedSeq
    var it = 0
    while (it < iters) {
      cents = meansRef(corpus.map { case (id, v, n2) =>
        (cents(argmaxIdx(v, n2, cents))._1, v)
      }).toIndexedSeq
      it += 1
    }
    cents
  }

  private def canon(c: Seq[C]): Seq[(Long, List[Double], Double)] =
    c.map { case (cid, cv, cn) => (cid, cv.toList, cn) }

  test("flat train(refineIters): the DataFrame Lloyd chain bitwise equals the plain-Scala reference at 0/1/2 iters") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    for (iters <- Seq(0, 1, 2)) {
      val got = Ivf.train(emb, "vec_id", "embedding", nlist = 5,
        refineIters = iters)
      assert(canon(got.toSeq) == canon(lloydRef(5, iters)),
        s"iters=$iters flat centroids diverged from the scalar reference")
    }
  }

  test("trainTwoLevel: the delegated DataFrame chain bitwise equals the plain-Scala two-level reference at 0/1/2 iters") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (nCoarse, nFine) = (3, 3)
    // reference: coarse seeds, occupied cells, per-cell nFine
    // smallest-id fine seeds, then fine-level Lloyd with the coarse
    // boundaries frozen
    val coarseAll = corpus.take(nCoarse).toIndexedSeq
    val coarseAssign = corpus.map { case (id, v, n2) =>
      (coarseAll(argmaxIdx(v, n2, coarseAll))._1, id, v, n2)
    }
    val occ = coarseAll.filter(c => coarseAssign.exists(_._1 == c._1))
    var fineRef: IndexedSeq[IndexedSeq[C]] = occ.map { c =>
      coarseAssign.filter(_._1 == c._1).sortBy(_._2).take(nFine)
        .map(m => (m._2, m._3, m._4)).toIndexedSeq
    }
    for (iters <- Seq(0, 1, 2)) {
      if (iters > 0) {
        // one refinement step from the previous fine set
        val slotOf = fineRef.zipWithIndex
          .flatMap { case (cs, j) => cs.map(_._1 -> j) }.toMap
        val assigned = corpus.map { case (id, v, n2) =>
          val j = argmaxIdx(v, n2, occ)
          (fineRef(j)(argmaxIdx(v, n2, fineRef(j)))._1, v)
        }
        val means = meansRef(assigned)
        fineRef = occ.indices.map { j =>
          means.filter(c => slotOf(c._1) == j).toIndexedSeq
        }
      }
      val got = Ivf.trainTwoLevel(emb, "vec_id", "embedding",
        nCoarse, nFine, refineIters = iters)
      assert(got.coarseIds.toSeq == occ.map(_._1))
      got.coarseVecs.zip(occ.map(_._2)).foreach { case (a, b) =>
        assert(a.sameElements(b)) }
      assert(got.coarseNorms.toSeq == occ.map(_._3))
      assert(got.fine.map(f => canon(f.toSeq)).toSeq ==
        fineRef.map(f => canon(f)),
        s"iters=$iters fine level diverged from the scalar reference")
    }
  }

  test("nearestCellData (centroids as a broadcast column) bitwise equals nearestCell (centroids as a plan constant)") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Ivf.train(emb, "vec_id", "embedding", nlist = 8)
    val centDf = cents.toSeq
      .map { case (cid, cv, cn) => (cid, cv.toSeq, cn) }
      .toDF("cid", "cv", "cn")
    val centArr = centDf.select(struct($"cid", $"cv", $"cn").as("c"))
      .agg(array_sort(collect_list($"c")).as("cents"))
    val viaData = rows(emb.select($"vec_id",
        VectorOps.toDouble($"embedding").as("v"),
        VectorOps.norm2($"embedding").as("n2"))
      .crossJoin(broadcast(centArr))
      .select($"vec_id", VectorExpressions.nearestCellData($"v", $"n2",
        $"cents").as("cid"))
      .orderBy("vec_id"))
      .map(r => (r.getLong(0), r.getLong(1)))
    val viaConst = rows(Ivf.assignWith(emb, "vec_id", "embedding", cents)
      .select($"neighbor_id", $"cid").orderBy("neighbor_id"))
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(viaData == viaConst)
  }

  test("saveModel/loadModel: round-trip is exact; assignment is bit-identical") {
    val emb = graft.sources.Tables.embeddings(spark,
      "/root/testdata/sf0.001")
    val cents = Ivf.train(emb, "vec_id", "embedding", nlist = 8,
      refineIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfm")
    try {
      val path = dir.resolve("model").toString
      Ivf.saveModel(cents, path, spark)
      val loaded = Ivf.loadModel(spark, path)
      assert(loaded.length == cents.length)
      for (((c1, v1, n1), (c2, v2, n2)) <- cents.zip(loaded)) {
        assert(c1 == c2 && n1 == n2)
        assert(java.util.Arrays.equals(v1, v2))
      }
      val a = rows(Ivf.assignWith(emb, "vec_id", "embedding", cents)
        .select($"neighbor_id", $"cid").orderBy("neighbor_id"))
        .map(r => (r.getLong(0), r.getLong(1)))
      val b = rows(Ivf.assignWith(emb, "vec_id", "embedding", loaded)
        .select($"neighbor_id", $"cid").orderBy("neighbor_id"))
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(a == b)

      // two-level fine-as-DATA round-trip: fine level never collected
      val m = Ivf.trainTwoLevelAsData(emb, "vec_id", "embedding",
        nCoarse = 4, nFine = 4, refineIters = 1)
      val p2 = dir.resolve("model2").toString
      Ivf.saveModelTwoLevel(m, p2, spark)
      val m2 = Ivf.loadModelTwoLevel(spark, p2)
      assert(m2.coarseIds.toSeq == m.coarseIds.toSeq)
      val a2 = rows(Ivf.assignWithData(emb, "vec_id", "embedding", m)
        .select($"neighbor_id", $"cid").orderBy("neighbor_id"))
        .map(r => (r.getLong(0), r.getLong(1)))
      val b2 = rows(Ivf.assignWithData(emb, "vec_id", "embedding", m2)
        .select($"neighbor_id", $"cid").orderBy("neighbor_id"))
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(a2 == b2)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }
}
