package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distinct-count sketches — the cardinality members of the bounded-
  * summary family (CountMin = point frequency, SpaceSaving = heavy
  * hitters, Bloom = membership; this file = HOW MANY distinct):
  *
  *  - [[kmv]] (k-minimum-values, Bar-Yossef et al. RANDOM 2002): keep
  *    the k smallest hash values; the k-th smallest estimates density.
  *    Exact-k accuracy knob, tiny state (k longs per group).
  *  - [[hll]] (HyperLogLog, Flajolet et al. AofA 2007): 2^p max-of-
  *    leading-zero registers; constant 2^p bytes per group, cell-wise
  *    MAX-mergeable — the 100 TB shape (per-day sketches fold into
  *    per-month without touching raw data, like CountMin's SUM-merge).
  *
  * Both run on the engine-portable polynomial hash ([[Dedup.polyHash]]),
  * so estimates — not just shapes — are oracle-recomputable, unlike
  * Spark's built-in approx_count_distinct (whose xxhash64/HLL++ bias
  * table no external oracle reproduces).
  *
  * Determinism discipline: estimates are ONE double expression over
  * exact integers (counts, shifted powers of two, the k-th hash), with
  * the operand order written identically in the oracle SQL — no
  * transcendentals anywhere (the HLL small-range linear-counting branch
  * needs ln(), whose libm differs across engines, so the raw estimate
  * is emitted alongside the zero-register count and the CALLER picks
  * the correction policy).
  *
  * Scale shape: tokenize+hash at scan speed; KMV's per-group k-th min
  * rides the rank-limit pushdown (WindowGroupLimit — every partition
  * keeps k rows before the shuffle); HLL is one partial-aggregable
  * (group, bucket) MAX then a bounded ≤2^p-rows-per-group fold. Neither
  * ever shuffles raw values — hashes only.
  */
object DistinctSketch {

  /** Multiplicative-modular mix of a polynomial hash: (h·a + b) mod P.
    * [[Dedup.polyHash]] is equality-grade but NOT value-uniform — short
    * strings never wrap the modulus, so raw values cluster near 0,
    * which is fatal for sketches whose ESTIMATE reads the hash value
    * (k-th min, leading zeros), not just hash equality. One Knuth-
    * constant multiply mod P scatters the clustered range across
    * [0, P); overflow-free (h < 2^30, a < 2^32 → product < 2^62) and
    * expressible identically in any SQL engine. */
  private def mix(h: Column, a: Long, b: Long): Column =
    pmod(h * lit(a) + lit(b), lit(1000000007L))

  /** Mixed forward / reverse hashes — the two independent-ish 30-bit
    * components every sketch here draws from. */
  def mixedFwd(s: Column): Column = mix(Dedup.polyHash(s), 2654435761L, 17L)
  def mixedRev(s: Column): Column =
    mix(Dedup.polyHashReversed(s), 2246822519L, 31L)

  /** 60-bit composite: mixedFwd·2^30 + mixedRev — the x92/x99 shape
    * with the value-uniform components. Range [0, P·2^30 + P). */
  def compositeHash(s: Column): Column =
    mixedFwd(s) * lit(1073741824L) + mixedRev(s)

  /** Upper bound of [[compositeHash]]'s range, the KMV universe size:
    * P·(2^30 + 1) — exact as a Long, cast once to double in the
    * estimate. */
  val HashUniverse: Long = 1000000007L * 1073741824L + 1000000007L

  /** K-minimum-values distinct estimate per group: if the k-th smallest
    * of n uniform hashes in [0, U) sits at h_k, then n ≈ (k-1)·U/h_k.
    *
    * Output per group: (group, exact_distinct, n_hashes, kth_hash,
    * kmv_est). Groups with fewer than k distinct hashes estimate
    * exactly (est = n_hashes, kth_hash null). `exact_distinct` counts
    * distinct VALUES (the sketch's ground truth, one extra partial agg
    * on the same shuffle); `n_hashes` counts distinct hashes (≤ exact —
    * collisions collapse, which is part of the sketch's error and why
    * both are emitted).
    *
    * The k-th min is a row_number over (group, hash) filtered to rank
    * k — Spark's rank-limit pushdown (InferWindowGroupLimit) turns that
    * into per-partition top-k before the shuffle, so the sort never
    * sees more than k·partitions rows per group. */
  def kmv(df: DataFrame, groupCol: String, value: Column, k: Int = 64)
      : DataFrame = {
    require(k >= 2, s"kmv: k=$k must be >= 2 (k=1 estimates 0)")
    val vals = df.select(col(groupCol).as("g"), value.as("v"))
      .where(col("v").isNotNull)
    // materialize the deduped (g, v) table ONCE — it feeds both the
    // exact-count agg and the hash ranking, and uncheckpointed each
    // consumer re-runs the full upstream scan+distinct (paired
    // same-JVM A/B at sf0.1: 2.36 s → 0.84 s min-of-2). The blocks
    // are bounded by the distinct-value set the operator shuffles
    // anyway; callers with corpora whose DISTINCT set itself cannot
    // land on executors should sketch per-partition partials
    // ([[kmvPartial]]) and fold instead.
    val dv = vals.distinct().localCheckpoint(true)
    val dh = dv.select(col("g"), compositeHash(col("v")).as("h")).distinct()
    val stats = dv.groupBy("g").agg(count(lit(1)).as("exact_distinct"))
    stats.join(kmvEstimate(dh, k), Seq("g"))
      .withColumnRenamed("g", groupCol)
  }

  /** The estimate tail over a distinct (g, h) hash table — shared by
    * the batch sketch and the streaming view (whose ledger holds the
    * union of per-batch k-minima: the k smallest of that union IS the
    * global k-th minimum, the KMV merge property). */
  def kmvEstimate(dh: DataFrame, k: Int): DataFrame = {
    val kth = dh
      .withColumn("rn",
        row_number().over(Window.partitionBy("g").orderBy("h")))
      .where(col("rn") === k)
      .select(col("g"), col("h").as("kth_hash"))
    dh.groupBy("g").agg(count(lit(1)).as("n_hashes"))
      .join(kth, Seq("g"), "left")
      .select(col("g"), col("n_hashes"), col("kth_hash"),
        when(col("kth_hash").isNotNull,
            lit((k - 1).toDouble) * lit(HashUniverse.toDouble) /
              col("kth_hash").cast("double"))
          .otherwise(col("n_hashes").cast("double")).as("kmv_est"))
  }

  /** Per-group k smallest distinct hashes of a batch — the bounded
    * per-batch partial the streaming sink appends (rank-limit
    * pushdown keeps every partition at ≤ k rows per group before the
    * shuffle). */
  def kmvPartial(df: DataFrame, groupCol: String, value: Column, k: Int)
      : DataFrame =
    df.select(col(groupCol).as("g"), value.as("v"))
      .where(col("v").isNotNull)
      .select(col("g"), compositeHash(col("v")).as("h")).distinct()
      .withColumn("rn",
        row_number().over(Window.partitionBy("g").orderBy("h")))
      .where(col("rn") <= k)
      .select(col("g"), col("h"))

  /** HyperLogLog registers per group at precision p: bucket = reverse-
    * hash mod 2^p, register = max over the bucket's values of
    * rho(forward-hash) where rho = leading-zero count of the 30-bit
    * forward hash + 1 (31 - bit-length; 31 for hash 0). Exposed because
    * registers are the MERGEABLE form — cell-wise MAX across batches —
    * and the streaming sink keys state on exactly these rows. Values
    * need no distinct pass first: MAX is idempotent, duplicates are
    * free. Output: (group, bucket, reg), occupied buckets only. */
  def hllRegisters(df: DataFrame, groupCol: String, value: Column,
      p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"hll: p=$p must be in [4, 16]")
    val m = 1L << p
    val vals = df.select(col(groupCol).as("g"), value.as("v"))
      .where(col("v").isNotNull)
    vals.select(col("g"),
        pmod(mixedRev(col("v")), lit(m)).as("bucket"),
        mixedFwd(col("v")).as("w"))
      .withColumn("rho",
        when(col("w") === 0L, lit(31L))
          .otherwise(lit(31L) - length(bin(col("w")))))
      .groupBy("g", "bucket").agg(max(col("rho")).as("reg"))
  }

  /** HyperLogLog distinct estimate per group from [[hllRegisters]].
    *
    * The harmonic mean is computed over INTEGERS: s2 = Σ_j 2^(31-M_j)
    * (empty registers contribute 2^31), a sum of exact powers of two
    * ≤ 2^p·2^31 — overflow-free in a Long, engine-portable as `1 <<
    * (31 - reg)`. Raw estimate = α_m·m²·2^31 / s2, one double chain in
    * fixed operand order. The small-range correction (linear counting,
    * m·ln(m/V)) is NOT applied — ln() is libm-dependent — so n_zero
    * and exact_distinct ride along and the caller applies policy.
    *
    * Output: (group, n_zero, r_max, s2, hll_est, exact_distinct). */
  def hll(df: DataFrame, groupCol: String, value: Column, p: Int = 8)
      : DataFrame = {
    val exact = df.select(col(groupCol).as("g"), value.as("v"))
      .where(col("v").isNotNull).distinct()
      .groupBy("g").agg(count(lit(1)).as("exact_distinct"))
    hllEstimate(hllRegisters(df, groupCol, value, p), p)
      .withColumnRenamed("g", groupCol)
      .join(exact.withColumnRenamed("g", groupCol), groupCol)
  }

  /** Fold a register table (g, bucket, reg) — from [[hllRegisters]] or
    * a MAX-merge of many of them — to the per-group estimate row. The
    * shared tail of the batch path and the streaming view. */
  def hllEstimate(regs: DataFrame, p: Int): DataFrame = {
    val m = 1L << p
    val alpha = 0.7213 / (1.0 + 1.079 / m.toDouble)
    regs.groupBy("g").agg(
        count(lit(1)).as("n_occupied"),
        max(col("reg")).as("r_max"),
        sum(expr("shiftleft(1L, cast(31 - reg as int))")).as("s2_occ"))
      .select(col("g"),
        (lit(m) - col("n_occupied")).as("n_zero"),
        col("r_max"),
        (col("s2_occ") + (lit(m) - col("n_occupied")) * lit(1L << 31))
          .as("s2"))
      .withColumn("hll_est",
        lit(alpha * m.toDouble * m.toDouble) * lit((1L << 31).toDouble) /
          col("s2").cast("double"))
  }

  /** Pairwise JACCARD between groups from their KMV sketches (the
    * k-minimum-values set-operation estimator, Beyer et al. SIGMOD
    * 2007): for groups A, B with k-minima sketches S_A, S_B, take the
    * k smallest of S_A ∪ S_B and estimate
    * J(A,B) ≈ |U ∩ S_A ∩ S_B| / |U|. The whole |groups|² similarity
    * matrix costs only sketch-sized data — the 100 TB shape: per-group
    * k-minima are tiny, mergeable partials; raw values never meet.
    * Against [[Dedup.sourceSpanOverlap]] (exact, reads every span
    * twice) this is the sketch tier of the same audit.
    *
    * Determinism: the sketch is [[kmvPartial]]'s rank window over the
    * portable composite hash — integer ranks and counts end to end,
    * one double division at the boundary. Groups with fewer than k
    * hashes contribute their full hash set (the estimator stays exact
    * on that side). Output: (src_a, src_b, n_union, n_both, j_est),
    * ordered pairs src_a < src_b. */
  def kmvPairJaccard(df: DataFrame, groupCol: String, value: Column,
      k: Int = 256): DataFrame = {
    require(k >= 2, s"kmvPairJaccard: k=$k must be >= 2")
    // r15: sketches travel as ONE SORTED ARRAY PER GROUP (≤ k longs)
    // and the whole pair stage is a |groups|² self-join with per-pair
    // array expressions — the former per-(pair, hash) fan-out paid a
    // union + groupBy + rank-window SHUFFLE over |pairs|·k rows to
    // compute what "k smallest of the union" already says per row.
    // Exact same integers: merged-distinct-sorted prefix of length k
    // IS the union's k minima; membership via array_intersect.
    // Checkpointed: the arrays are consumed by BOTH sides of the
    // self-join — uncheckpointed, the full distinct+rank sketch build
    // runs twice.
    val arrs = kmvPartial(df, groupCol, value, k)
      .groupBy("g").agg(array_sort(collect_list(col("h"))).as("hs"))
      .localCheckpoint(true)
    val pairs = arrs.select(col("g").as("src_a"), col("hs").as("__ha"))
      .join(arrs.select(col("g").as("src_b"), col("hs").as("__hb")),
        col("src_a") < col("src_b"))
    pairs
      .withColumn("__ku",
        slice(array_sort(array_distinct(concat(col("__ha"), col("__hb")))),
          1, k))
      .select(col("src_a"), col("src_b"),
        size(col("__ku")).cast("long").as("n_union"),
        size(array_intersect(array_intersect(col("__ku"), col("__ha")),
          col("__hb"))).cast("long").as("n_both"))
      .withColumn("j_est",
        col("n_both").cast("double") / col("n_union").cast("double"))
  }
  /** Pairwise HLL SET-OPERATION estimates between groups: union
    * cardinality by cell-wise MAX-merging the two groups' registers
    * (the defining HLL merge property) and intersection by
    * inclusion-exclusion (est_a + est_b − union) — the sketch-tier
    * overlap audit beside [[kmvPairJaccard]], at constant 2^p state
    * per group no matter the corpus. Registers are computed once,
    * checkpointed (three consumers), and every estimate is the same
    * fixed-order double chain as [[hllEstimate]]. Inclusion-exclusion
    * inherits both sketches' error — small true intersections can
    * estimate negative; emitted as-is (the caller's floor to apply),
    * with both per-group estimates alongside for exactly that
    * judgment. Output: (src_a, src_b, est_a, est_b, union_est,
    * inter_est), pairs src_a < src_b. */
  def hllPairUnion(df: DataFrame, groupCol: String, value: Column,
      p: Int = 8): DataFrame = {
    val m = 1L << p
    val alpha = 0.7213 / (1.0 + 1.079 / m.toDouble)
    // r15: registers travel as ONE DENSE LENGTH-m ARRAY PER GROUP
    // (empty buckets hold rho 0 and contribute 2^31 to s2 exactly as
    // [[hllEstimate]]'s (m − occupied)·2^31 term) and the pair stage
    // becomes a |groups|² self-join with a zip_with(greatest) per pair
    // — the former per-(pair, bucket) fan-out paid a union + groupBy
    // shuffle over |pairs|·2^p rows plus three joins to reassemble the
    // output. Same exact integer s2 per side/union, same fixed-order
    // double chain for every estimate. Checkpointed: the dense arrays
    // are consumed by both sides of the self-join.
    def s2Of(regs: Column): Column =
      aggregate(regs, lit(0L),
        (acc, r) => acc + call_function("shiftleft", lit(1L),
          (lit(31) - r).cast("int")))
    def estOf(s2: Column): Column =
      lit(alpha * m.toDouble * m.toDouble) * lit((1L << 31).toDouble) /
        s2.cast("double")
    val dense = hllRegisters(df, groupCol, value, p)
      .groupBy("g").agg(
        map_from_arrays(collect_list(col("bucket")),
          collect_list(col("reg"))).as("__mr"))
      .select(col("g"),
        transform(sequence(lit(0L), lit(m - 1)),
          b => coalesce(element_at(col("__mr"), b), lit(0L))).as("regs"))
      .localCheckpoint(true)
    dense.select(col("g").as("src_a"), col("regs").as("__ra"))
      .join(dense.select(col("g").as("src_b"), col("regs").as("__rb")),
        col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        estOf(s2Of(col("__ra"))).as("est_a"),
        estOf(s2Of(col("__rb"))).as("est_b"),
        estOf(s2Of(zip_with(col("__ra"), col("__rb"),
          (x, y) => greatest(x, y)))).as("union_est"))
      .withColumn("inter_est",
        col("est_a") + col("est_b") - col("union_est"))
  }
}
