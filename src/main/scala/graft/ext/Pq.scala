package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.functions.expressions.VectorExpressions

/** Product quantization (Jégou et al.): slice each vector into `m`
  * contiguous subspaces and store, per subspace, the index of the
  * L2-nearest codeword — m bytes replacing dim floats. The compression
  * tier above SQ8 ([[Quantize]]): SQ8 keeps one code per DIMENSION
  * (dim bytes), PQ keeps one per SUBSPACE (m bytes, 8 here vs 64), which
  * is what makes a 100 TB embedding corpus index RAM-resident.
  *
  * Codebooks are deterministic — codeword j of every subspace is the
  * sub-vector of the j-th-smallest id (the same seed rule as
  * [[Ivf]]'s coarse quantizer) — so encoding is reproducible across
  * engines and x38 is oracle-checkable with zero tolerance.
  *
  * At scale: the codebooks are m×k×(dim/m) doubles resident on the
  * driver, embedded in the plan as expression constants; encoding is a
  * single [[VectorExpressions.pqEncode]] codegen map — one corpus scan,
  * no join, no exchange (plan-asserted in ScrubIvfSpec). Asymmetric
  * distance (query × decoded codeword) needs only the codebook and the
  * m-byte codes, never the original vectors.
  */
object Pq {

  /** Deterministic seed codebooks: `codebooks(s)(j)` = subspace-s slice
    * of the vector with the j-th-smallest id. */
  def seedCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int): Array[Array[Array[Double]]] = {
    val seeds = corpus.orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("long").as("id"),
        VectorOps.toDouble(col(vecCol)).as("v"))
      .collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)
    require(seeds.nonEmpty, "corpus has no rows to seed codebooks from")
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    Array.tabulate(m)(s => seeds.map(_.slice(s * subDim, (s + 1) * subDim)))
  }

  /** (id, codes array<long>) — the encoded corpus, one scan. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 16): DataFrame = {
    val cb = seedCodebooks(df, idCol, vecCol, m, k)
    df.select(col(idCol),
      VectorExpressions.pqEncode(VectorOps.toDouble(col(vecCol)), cb)
        .as("codes"))
  }

  /** Long form (id, sub, code) — the x38 query/oracle shape. */
  def encodeLong(df: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 16): DataFrame =
    encodeLongWith(df, idCol, vecCol, seedCodebooks(df, idCol, vecCol, m, k))

  private[ext] def encodeLongWith(df: DataFrame, idCol: String, vecCol: String,
      cb: Array[Array[Array[Double]]]): DataFrame =
    df.select(col(idCol),
        VectorExpressions.pqEncode(VectorOps.toDouble(col(vecCol)), cb)
          .as("codes"))
      // materialize (id, codes) before the explode: Catalyst's
      // InferFiltersFromGenerate otherwise plants `size(codes) > 0`
      // under the Generate, and alias substitution pushes the full
      // encode — including any upstream O(d²) OPQ rotation — into the
      // scan FILTER while keeping it in the projection, evaluating it
      // twice per row. Cutting lineage here makes the inferred filter
      // consume the already-computed codes column. Codes are m bytes
      // per row (≪ the vectors), so the checkpoint is cheap at any
      // scale and the encode provably runs once.
      .localCheckpoint()
      .select(col(idCol), posexplode(col("codes")).as(Seq("sub", "code")))
      .select(col(idCol), col("sub").cast("long").as("sub"), col("code"))

  /** `iters` Lloyd steps of the per-subspace k-means: re-estimate each
    * codeword as the elementwise mean of its members (exact-decimal
    * sums, so the refined codebook is identical under any partitioning
    * and in the SQL oracle); codewords that lose every member keep
    * their previous value, so code indices stay stable. Each iteration
    * costs one encode scan plus one (sub, code, dim)-keyed
    * map-side-combined aggregation — m·k·subDim rows back to the
    * driver, never the vectors. */
  def refineCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 16, iters: Int = 1)
      : Array[Array[Array[Double]]] = {
    import org.apache.spark.sql.types.DecimalType
    var cb = seedCodebooks(corpus, idCol, vecCol, m, k)
    val subDim = cb(0)(0).length
    var it = 0
    while (it < iters) {
      val enc = encodeLongWith(corpus, idCol, vecCol, cb)
      val elems = corpus.select(col(idCol),
          posexplode(VectorOps.toDouble(col(vecCol))).as(Seq("p", "v")))
        .select(col(idCol),
          (col("p") / lit(subDim)).cast("long").as("sub"),
          pmod(col("p"), lit(subDim)).cast("long").as("ii"), col("v"))
      val means = elems.join(enc, Seq(idCol, "sub"))
        .groupBy("sub", "code", "ii")
        .agg((sum(col("v").cast(DecimalType(28, 8))).cast("double")
          / count(lit(1))).as("mv"))
        .collect()
      val next = cb.map(_.map(_.clone()))
      means.foreach { r =>
        next(r.getLong(0).toInt)(r.getLong(1).toInt)(r.getLong(2).toInt) =
          r.getDouble(3)
      }
      cb = next
      it += 1
    }
    cb
  }

  /** x43's shape: the encoded corpus under Lloyd-refined codebooks. */
  def encodeRefinedLong(df: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 16, iters: Int = 1): DataFrame =
    encodeLongWith(df, idCol, vecCol,
      refineCodebooks(df, idCol, vecCol, m, k, iters))

  /** The codebook as a DataFrame (sub, code, cw) — the decode side of
    * asymmetric distance computation; m×k rows, always broadcastable. */
  def codebookDf(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 16): DataFrame =
    codebookDfFrom(corpus.sparkSession,
      seedCodebooks(corpus, idCol, vecCol, m, k))

  /** Any codebook constant (seed or refined) as (sub, code, cw) rows. */
  def codebookDfFrom(spark: org.apache.spark.sql.SparkSession,
      cb: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    cb.zipWithIndex.flatMap { case (sub, s) =>
      sub.zipWithIndex.map { case (cw, j) =>
        (s.toLong, j.toLong, cw.toSeq)
      }
    }.toSeq.toDF("sub", "code", "cw")
  }

  /** ADC (asymmetric distance) top-k: exact query vectors against the
    * PQ-COMPRESSED corpus — after encoding, the original corpus vectors
    * are never read again. Per query the m×k lookup table of subspace
    * distances (|Q|·m·k rows, always broadcastable) is joined to the
    * (id, sub, code) long form, so per-(query, row) distance is a SUM of
    * m table lookups — the classic PQ search shape: the corpus-side work
    * is one broadcast probe + a (query, id)-keyed partial aggregation,
    * never a vector×vector loop.
    *
    * Determinism: subspace distances use the 3-dot expansion
    * (q·q − 2·q·c + c·c, each dot left-to-right) and are cast to exact
    * DECIMAL before the sum, so ranking is order-independent under any
    * partitioning and identical in the SQL oracle (x40); `dist` leaves
    * as the decimal→double boundary cast. */
  def adcTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 8, kCodes: Int = 16): DataFrame = {
    val cb = seedCodebooks(corpus, idCol, vecCol, m, kCodes)
    adcTopKEncoded(queries, encodeLong(corpus, idCol, vecCol, m, kCodes),
      cb, idCol, vecCol, k)
  }

  /** Guard for the |Q|·m·k LUT broadcast every ADC search ships: the
    * "queries side is small" assumption enforced, not hoped. The default
    * bound (8M rows ≈ a few hundred MB broadcast at ~40 B/row) admits
    * ~65k queries at m·k = 128; beyond it, shard the query set into
    * chunks (each micro-batch of [[graft.streaming.Streams.adcScoreSink]]
    * is exactly such a chunk) rather than raising the bound past what a
    * driver/executor can hold. */
  val MaxLutRows: Long = 8L * 1024 * 1024
  private[ext] def requireLutFits(nQueries: Long, m: Int, kCodes: Int,
      maxRows: Long): Unit = {
    val rows = nQueries * m * kCodes
    require(rows <= maxRows,
      s"ADC lookup-table broadcast would be $rows rows " +
        s"($nQueries queries x $m subspaces x $kCodes codes) > $maxRows; " +
        "shard the query set into smaller chunks (e.g. score it as a " +
        "stream via Streams.adcScoreSink) instead of broadcasting it")
  }

  /** ADC top-k against an ALREADY-ENCODED corpus — the streaming/serving
    * shape: encode (and checkpoint) the corpus once, score any number of
    * query sets against the codes. `encLong` is the (id, sub, code) long
    * form; `cb` the codebook constant the codes were produced with. */
  def adcTopKEncoded(queries: DataFrame, encLong: DataFrame,
      cb: Array[Array[Array[Double]]], idCol: String, vecCol: String,
      k: Int, maxLutRows: Long = MaxLutRows): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.VectorOps
    val m = cb.length
    val kCodes = cb(0).length
    val subDim = cb(0)(0).length
    val qs = queries.select(col(idCol).as("query_id"),
      VectorOps.toDouble(col(vecCol)).as("qv"))
    // guard probe counts an ids-only projection (column pruning keeps
    // any upstream rotation/conversion out of the count job); a caller
    // that has ALREADY materialized and counted its query set may pass
    // Long.MaxValue to skip the extra job — but nothing that merely
    // assumes boundedness should (a replayed stream backlog is one
    // unbounded "micro"-batch; adcScoreSink keeps the guard on)
    if (maxLutRows != Long.MaxValue)
      requireLutFits(queries.select(col(idCol)).count(), m, kCodes, maxLutRows)
    val cbDf = codebookDfFrom(queries.sparkSession, cb)
    val lut = qs.crossJoin(broadcast(cbDf))
      .withColumn("qsub",
        slice(col("qv"), col("sub").cast("int") * subDim + 1, lit(subDim)))
      .withColumn("d",
        (VectorOps.dot(col("qsub"), col("qsub"))
          - lit(2.0) * VectorOps.dot(col("qsub"), col("cw"))
          + VectorOps.dot(col("cw"), col("cw"))).cast(DecimalType(28, 12)))
      .select(col("query_id"), col("sub"), col("code"), col("d"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dd").asc, col("neighbor_id").asc)
    encLong.join(broadcast(lut), Seq("sub", "code"))
      .groupBy(col("query_id"), col(idCol).as("neighbor_id"))
      .agg(sum(col("d")).as("dd"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("dd").as("dist"))
  }

  /** PQ-decoded corpus (id, vec): each vector rebuilt as the
    * concatenation of its subspace codewords — the reconstruction used
    * by ADC search and the recall test. */
  def decode(encoded: DataFrame, codebook: DataFrame, idCol: String)
      : DataFrame =
    encoded.select(col(idCol), posexplode(col("codes")).as(Seq("sub", "code")))
      .select(col(idCol), col("sub").cast("long").as("sub"), col("code"))
      .join(broadcast(codebook), Seq("sub", "code"))
      .groupBy(idCol)
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("sub"), col("cw")))),
        s => s.getField("cw"))).as("vec"))
}
