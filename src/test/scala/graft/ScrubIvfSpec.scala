package graft

import org.apache.spark.sql.functions._
import graft.ext.{Ivf, Scrub, Similarity}

/** Corpus scrubbing (PII, boilerplate) and IVF ANN. */
class ScrubIvfSpec extends SparkSpec {
  import spark.implicits._

  test("scrubPii masks email, url, ip and phone; clean text unchanged") {
    val df = Seq(
      (1L, "mail me at a.b+c@ex-ample.org thanks"),
      (2L, "see https://a.io/x?q=1 and http://b.c/y"),
      (3L, "host is 192.168.001.1, port 8080"),
      (4L, "call +1 (415) 555-0101 now"),
      (5L, "nothing sensitive here at all")
    ).toDF("id", "t").select($"id", Scrub.scrubPii($"t").as("t"))
    val m = rows(df).map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == "mail me at <EMAIL> thanks")
    assert(m(2L) == "see <URL> and <URL>")
    assert(m(3L) == "host is <IP>, port 8080")
    assert(m(4L) == "call <PHONE> now")
    assert(m(5L) == "nothing sensitive here at all")
  }

  test("stripBoilerplate drops shared lines, preserves order, empties all-boilerplate docs") {
    val df = Seq(
      (1L, "HEADER\nalpha\nbeta\nFOOTER"),
      (2L, "HEADER\ngamma\nFOOTER"),
      (3L, "HEADER\nFOOTER")
    ).toDF("doc_id", "text")
    val out = rows(Scrub.stripBoilerplate(df, "doc_id", "text", 3))
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out(1L) == "alpha\nbeta")
    assert(out(2L) == "gamma")
    assert(out(3L) == "")
  }

  test("stripBoilerplate below threshold keeps everything") {
    val df = Seq((1L, "a\nb"), (2L, "a\nc")).toDF("doc_id", "text")
    val out = rows(Scrub.stripBoilerplate(df, "doc_id", "text", 3))
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out(1L) == "a\nb" && out(2L) == "a\nc")
  }

  test("linear-counting occupancy estimates distinct counts within 5%") {
    val df = Queries.x22ApproxDistinct(spark, "/root/testdata/sf0.01")
    val out = rows(df)
    assert(out.nonEmpty)
    out.foreach { r =>
      val occupied = r.getAs[Long]("occupied").toDouble
      val exact = r.getAs[Long]("exact").toDouble
      val est = -65536.0 * math.log(1 - occupied / 65536.0)
      assert(math.abs(est - exact) / exact < 0.05,
        s"estimate $est vs exact $exact")
    }
  }

  test("ivfTopK plan: centroids broadcast, probe join is not a cross join") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val plan = Ivf.ivfTopK(emb.where($"vec_id" < 5), emb, "vec_id",
      "embedding", 5).queryExecution.executedPlan.toString
    // the centroid side of assignment/probing must be a broadcast (the
    // nlist rows are a constant), and the probed-cell search must join on
    // cid, not cross-join corpus × queries
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(400))
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"),
      "cell-id equi-join missing:\n" + plan.take(400))
  }

  test("IVF cell assignment is exchange-free (pure scan-speed map)") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val plan = Ivf.assignedForPlanCheck(emb, "vec_id", "embedding", 8)
      .queryExecution.executedPlan.toString
    // the 100 TB contract: assignment costs exactly one corpus scan — no
    // crossJoin row expansion, no shuffle of vectors through a window
    assert(!plan.contains("Exchange"), "assignment shuffles:\n" + plan.take(600))
    assert(!plan.contains("Window"), "assignment uses a window:\n" + plan.take(600))
  }

  test("two-level assignment: exchange-free, total, coarse-consistent, dedup-pluggable") {
    import graft.ext.Similarity
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val model = Ivf.trainTwoLevel(emb, "vec_id", "embedding",
      nCoarse = 3, nFine = 3)
    val assigned = Ivf.assignTwoLevel(emb, "vec_id", "embedding", model)
    // same 100 TB contract as the flat quantizer: one scan, no exchange
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "two-level assignment shuffles:\n" +
      plan.take(600))
    // total: every row lands in some fine cell, and every cid is a
    // trained fine seed id
    val fineIds = model.fine.flatMap(_.map(_._1)).toSet
    val got = rows(assigned.select($"neighbor_id", $"cid"))
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.size == emb.count())
    assert(got.forall { case (_, cid) => fineIds.contains(cid) })
    // coarse-consistent: a row's fine cell belongs to the fine set of
    // its coarse winner (the hierarchy actually constrains the argmax)
    val coarseOf = model.coarseIds.zipWithIndex.toMap
    val flatCoarse = rows(Ivf.assignWith(emb, "vec_id", "embedding",
        model.coarseIds.indices.map(j => (model.coarseIds(j),
          model.coarseVecs(j), model.coarseNorms(j))).toArray)
      .select($"neighbor_id", $"cid"))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (id, cid) =>
      val fineSet = model.fine(coarseOf(flatCoarse(id))).map(_._1).toSet
      assert(fineSet.contains(cid), s"row $id: fine $cid outside its coarse cell")
    }
    // a fine seed assigns to itself (cosine 1 in its own cell)
    model.fine.flatMap(_.map(_._1)).foreach { fid =>
      assert(got.toMap.get(fid).contains(fid), s"seed $fid not self-assigned")
    }
    // plugs into semanticDedup: an explicit flat assignment reproduces
    // the centroids path exactly
    val cent = Ivf.train(emb, "vec_id", "embedding", 8)
    val viaCent = rows(Similarity.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.45, centroids = Some(cent)))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaAssign = rows(Similarity.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.45, assignment = Some(
          Ivf.assignWith(emb, "vec_id", "embedding", cent)
            .select($"neighbor_id".as("id"), $"cid"))))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaAssign == viaCent)
  }

  test("two-level refinement: fine means move, ids survive, assignment stays total") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val seed = Ivf.trainTwoLevel(emb, "vec_id", "embedding", 3, 3)
    val refined = Ivf.trainTwoLevel(emb, "vec_id", "embedding", 3, 3,
      refineIters = 1)
    // coarse level is untouched by fine refinement
    assert(refined.coarseIds.sameElements(seed.coarseIds))
    refined.coarseVecs.zip(seed.coarseVecs).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
    // fine ids can only shrink (empty cells drop), never appear
    val seedIds = seed.fine.flatMap(_.map(_._1)).toSet
    val refinedIds = refined.fine.flatMap(_.map(_._1)).toSet
    assert(refinedIds.subsetOf(seedIds) && refinedIds.nonEmpty)
    // at least one fine centroid actually moved to its members' mean
    val moved = refined.fine.flatten.zip(
      seed.fine.flatten.filter(c => refinedIds.contains(c._1)))
      .exists { case (r, s) => !r._2.sameElements(s._2) }
    assert(moved, "refinement changed nothing")
    // refined assignment is still total and lands in refined cells only
    val got = rows(Ivf.assignTwoLevel(emb, "vec_id", "embedding", refined)
      .select($"neighbor_id", $"cid"))
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.size == emb.count())
    assert(got.forall { case (_, cid) => refinedIds.contains(cid) })
  }

  test("two-level fine-as-data assignment equals the plan-constant form") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    for (iters <- Seq(0, 1)) {
      val model = Ivf.trainTwoLevel(emb, "vec_id", "embedding", 3, 3,
        refineIters = iters)
      val fine = Ivf.fineTable(spark, model)
      def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
        rows(df.select($"neighbor_id", $"cid").orderBy("neighbor_id"))
          .map(r => (r.getLong(0), r.getLong(1)))
      val asData = canon(
        Ivf.assignTwoLevelAsData(emb, "vec_id", "embedding", model, fine))
      val asConst = canon(
        Ivf.assignTwoLevel(emb, "vec_id", "embedding", model))
      assert(asData == asConst, s"iters=$iters mismatch")
    }
  }

  test("trainTwoLevelAsData: bitwise-equal to trainTwoLevel + fineTable, seed and refined") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    for (iters <- Seq(0, 1, 2)) {
      val planForm = Ivf.trainTwoLevel(emb, "vec_id", "embedding", 3, 3,
        refineIters = iters)
      val dataForm = Ivf.trainTwoLevelAsData(emb, "vec_id", "embedding",
        3, 3, refineIters = iters)
      // coarse level: identical arrays (the only driver-resident part
      // of the data form)
      assert(dataForm.coarseIds.sameElements(planForm.coarseIds))
      dataForm.coarseVecs.zip(planForm.coarseVecs).foreach { case (a, b) =>
        assert(a.sameElements(b))
      }
      assert(dataForm.coarseNorms.sameElements(planForm.coarseNorms))
      // fine level: the distributed table holds bit-identical rows to
      // the collected model's fineTable (exact-decimal means + the same
      // left-to-right norm fold ⇒ equality is ==, not ≈)
      def canonFine(df: org.apache.spark.sql.DataFrame) =
        rows(df.select($"ccid", $"fid", $"fv", $"fn").orderBy("fid"))
          .map(r => (r.getLong(0), r.getLong(1),
            r.getSeq[Double](2).toList, r.getDouble(3)))
      assert(canonFine(dataForm.fine) ==
        canonFine(Ivf.fineTable(spark, planForm)), s"iters=$iters fine")
      // and the assignments they induce are bitwise equal
      def canon(df: org.apache.spark.sql.DataFrame) =
        rows(df.select($"neighbor_id", $"cid").orderBy("neighbor_id"))
          .map(r => (r.getLong(0), r.getLong(1)))
      assert(canon(Ivf.assignWithData(emb, "vec_id", "embedding", dataForm))
        == canon(Ivf.assignTwoLevel(emb, "vec_id", "embedding", planForm)),
        s"iters=$iters assignment")
    }
  }

  test("ivfTopK with Lloyd refinement: recall >= seed-centroid recall") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val q = emb.where($"vec_id" < 10)
    val exact = rows(Similarity.bruteTopK(q, emb, "vec_id", "embedding", 5))
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    def recall(refine: Int): Double = {
      val got = rows(Ivf.ivfTopK(q, emb, "vec_id", "embedding", 5,
        nlist = 8, nprobe = 2, refineIters = refine))
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val seed = recall(0)
    val refined = recall(1)
    assert(refined >= seed, s"refined recall $refined < seed recall $seed")
  }

  test("SQ8 search: top-k over dequantized corpus recovers exact neighbors") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val toDouble = transform(col("embedding"), _.cast("double"))
    val q = emb.where($"vec_id" < 10).select($"vec_id", toDouble.as("embedding"))
    val corpusExact = emb.select($"vec_id", toDouble.as("embedding"))
    val exact = rows(Similarity.bruteTopK(q, corpusExact, "vec_id", "embedding", 5))
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // ADC shape: exact queries against the SQ8-dequantized corpus
    val codes = graft.ext.Quantize.scalarQuantize(emb, "vec_id", "embedding")
    val stats = graft.ext.Quantize.dimStats(emb, col("embedding"))
    val rebuilt = codes.join(broadcast(stats), Seq("pos"))
      .withColumn("dv",
        graft.ext.Quantize.dequantize(col("code"), col("mn"), col("mx")))
      .groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("dv")))),
        s => s.getField("dv")).as("embedding"))
    val got = rows(Similarity.bruteTopK(q, rebuilt, "vec_id", "embedding", 5))
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"SQ8 recall $recall") // 255 levels ≈ lossless here
  }

  test("ivfTopK: results are a subset of brute-force scores with high recall") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.where($"vec_id" < 5)
    val exact = rows(Similarity.bruteTopK(q, emb, "vec_id", "embedding", 5))
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = rows(Ivf.ivfTopK(q, emb, "vec_id", "embedding", 5,
      nlist = 8, nprobe = 4))
    val ivfSet = ivf.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // every query answered with k results, ranks contiguous
    assert(ivf.groupBy(_.getAs[Long]("query_id")).forall(_._2.size == 5))
    // probing 4 of 8 cells must recover most of the exact top-k
    val recall = ivfSet.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
    // cosine values agree with the exact computation for common pairs
    val exactCos = rows(Similarity.bruteTopK(q, emb, "vec_id", "embedding", 5))
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cosine")).toMap
    ivf.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      exactCos.get(key).foreach(c => assert(c == r.getAs[Double]("cosine")))
    }
  }

  test("PQ encode: exchange-free scan, bounded codes, lossless on seeds") {
    import graft.ext.Pq
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val enc = Pq.encode(emb, "vec_id", "embedding")
    // one-scan contract: codebooks are plan constants, not a join side
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "PQ encode shuffles:\n" + plan.take(600))
    assert(!plan.contains("Join"), "PQ encode joins:\n" + plan.take(600))
    val codes = rows(Pq.encodeLong(emb, "vec_id", "embedding"))
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(codes.values.forall(c => c >= 0 && c <= 15))
    assert(codes.keys.map(_._2).toSet == (0L to 7L).toSet)
    // seed vectors reconstruct exactly (their own sub-vectors are
    // codewords, so the nearest distance is 0 in every subspace)
    val cb = Pq.codebookDf(emb, "vec_id", "embedding")
    val decoded = Pq.decode(enc.where($"vec_id" < 16), cb, "vec_id")
    val orig = rows(emb.where($"vec_id" < 16).select($"vec_id",
        transform($"embedding", x => x.cast("double")).as("v")))
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    rows(decoded).foreach { r =>
      assert(r.getSeq[Double](1) == orig(r.getLong(0)),
        s"seed ${r.getLong(0)} not reconstructed exactly")
    }
  }

  test("ADC top-k: distances equal L2 to the decoded corpus (the ADC identity)") {
    import graft.ext.Pq
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.where($"vec_id" < 5)
    val got = rows(Pq.adcTopK(q, emb, "vec_id", "embedding", k = 5))
    assert(got.groupBy(_.getAs[Long]("query_id")).size == 5)
    got.groupBy(_.getAs[Long]("query_id")).values.foreach { rs =>
      val byRank = rs.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")) == (1L to 5L))
      val dists = byRank.map(_.getAs[java.math.BigDecimal]("dist").doubleValue)
      assert(dists == dists.sorted, "distances not ascending with rank")
    }
    // ADC(q, x) = ||q − decode(x)||²: check against explicit reconstruction
    val cb = Pq.codebookDf(emb, "vec_id", "embedding")
    val dec = Pq.decode(Pq.encode(emb, "vec_id", "embedding"), cb, "vec_id")
    val decoded = rows(dec).map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val qvecs = rows(q.select($"vec_id",
        transform($"embedding", x => x.cast("double")).as("v")))
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    got.foreach { r =>
      val qv = qvecs(r.getAs[Long]("query_id"))
      val nv = decoded(r.getAs[Long]("neighbor_id"))
      val l2 = qv.zip(nv).map { case (a, b) => (a - b) * (a - b) }.sum
      val adc = r.getAs[java.math.BigDecimal]("dist").doubleValue
      assert(math.abs(adc - l2) < 1e-6, s"ADC $adc vs decoded L2 $l2")
    }
  }

  test("IVF-PQ: cell id and codes fuse into one scan; results well-formed") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val q = emb.where($"vec_id" < 10)
    val res = Ivf.ivfPqTopK(q, emb, "vec_id", "embedding", k = 5,
      nlist = 8, nprobe = 4)
    // the corpus scan computes BOTH constants in the same projection —
    // no second pass, no join to attach codes to cells
    val plan = res.queryExecution.executedPlan.toString
    val fused = plan.linesIterator.exists(l =>
      l.contains("nearest_cell") && l.contains("pq_encode"))
    assert(fused, "cell assignment and PQ encode not fused into one scan:\n" +
      plan.take(800))
    val got = rows(res)
    assert(got.groupBy(_.getAs[Long]("query_id")).size == 10)
    got.groupBy(_.getAs[Long]("query_id")).values.foreach { rs =>
      assert(rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("rank")) ==
        (1L to 5L))
    }
    // probing EVERY cell removes the IVF layer entirely: the result must
    // be EXACTLY the pure-ADC ranking (same decimal distances, same
    // ties) — the cell layer only ever prunes, never re-ranks. (On this
    // synthetic corpus recall vs exact L2 is dominated by PQ16
    // quantization error itself — random embeddings are PQ's worst case
    // — so the meaningful invariant is this identity, not a recall bar.)
    val full = rows(Ivf.ivfPqTopK(q, emb, "vec_id", "embedding", k = 5,
        nlist = 8, nprobe = 8)).map(_.toString).sorted
    val adc = rows(graft.ext.Pq.adcTopK(q, emb, "vec_id", "embedding", k = 5))
      .map(_.toString).sorted
    assert(full == adc, "nprobe=nlist IVF-PQ differs from pure ADC")
  }

  test("ADC LUT broadcast guard: oversized query sets are refused, not hoped") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.where($"vec_id" < 10) // 10 queries x 8 x 16 = 1280 LUT rows
    val e1 = intercept[IllegalArgumentException] {
      Ivf.ivfPqTopK(q, emb, "vec_id", "embedding", k = 5, maxLutRows = 1000)
    }
    assert(e1.getMessage.contains("lookup-table broadcast"))
    val e2 = intercept[IllegalArgumentException] {
      graft.ext.Pq.adcTopKEncoded(q,
        graft.ext.Pq.encodeLong(emb, "vec_id", "embedding"),
        graft.ext.Pq.seedCodebooks(emb, "vec_id", "embedding", 8, 16),
        "vec_id", "embedding", k = 5, maxLutRows = 1000)
    }
    assert(e2.getMessage.contains("lookup-table broadcast"))
    // at the default bound the same call plans and runs
    assert(rows(Ivf.ivfPqTopK(q, emb, "vec_id", "embedding", k = 3,
      nlist = 4, nprobe = 4)).nonEmpty)
  }

  test("PQ Lloyd step: refined codebook does not increase reconstruction error") {
    import graft.ext.Pq
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val orig = emb.select($"vec_id",
      transform($"embedding", x => x.cast("double")).as("v"))
    def totalErr(cb: Array[Array[Array[Double]]]): Double = {
      val enc = orig.select($"vec_id",
        graft.functions.expressions.VectorExpressions.pqEncode($"v", cb)
          .as("codes"))
      val dec = Pq.decode(enc, Pq.codebookDfFrom(spark, cb), "vec_id")
      rows(dec.join(orig, "vec_id").select(
        aggregate(zip_with($"vec", $"v", (a, b) => (a - b) * (a - b)),
          lit(0.0), _ + _).as("e"))).map(_.getDouble(0)).sum
    }
    val seed = Pq.seedCodebooks(emb, "vec_id", "embedding", 8, 16)
    val refined = Pq.refineCodebooks(emb, "vec_id", "embedding", 8, 16, 1)
    val eSeed = totalErr(seed)
    val eRef = totalErr(refined)
    // Lloyd monotonicity (means minimize within-cell squared error; the
    // re-encode argmin only improves further) up to decimal mean rounding
    assert(eRef <= eSeed + 1e-6, s"refined error $eRef > seed error $eSeed")
    assert(eRef < eSeed, s"refinement changed nothing: $eRef vs $eSeed")
  }

  test("PQ reconstruction error shrinks as the codebook grows (nested seeds)") {
    import graft.ext.Pq
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def meanErr(k: Int): Double = {
      val enc = Pq.encode(emb, "vec_id", "embedding", m = 8, k = k)
      val cb = Pq.codebookDf(emb, "vec_id", "embedding", m = 8, k = k)
      val dec = Pq.decode(enc, cb, "vec_id")
      val joined = dec.join(emb.select($"vec_id",
        transform($"embedding", x => x.cast("double")).as("v")), "vec_id")
      rows(joined.select(
        aggregate(zip_with($"vec", $"v", (a, b) => (a - b) * (a - b)),
          lit(0.0), _ + _).as("e"))).map(_.getDouble(0)).sum
    }
    // k=64 seed set ⊇ k=16 seed set, so the per-subspace min distance is
    // pointwise ≤ — total reconstruction error must not increase
    val e16 = meanErr(16)
    val e64 = meanErr(64)
    assert(e64 <= e16, s"error grew with a larger codebook: $e64 > $e16")
    assert(e16 > 0.0) // non-seed vectors are genuinely approximated
  }
}
