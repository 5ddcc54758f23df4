package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling and packing for training-data pipelines: deterministic
  * train/valid/test splitting and concat-then-chunk sequence packing.
  *
  * Both are engine-reproducible by construction (no RNG — assignment is
  * a pure function of the row key), so a split/packing computed today on
  * one engine is identical tomorrow on another: the property that makes
  * dataset versioning and leakage audits possible at 100 TB.
  */
object Sampling {

  /** Large prime for the two-step residue reduction: P² < 2⁶³, so
    * (id mod P)·(A mod P) can never overflow a Long (or DuckDB BIGINT),
    * and the hash period is P ≈ 1e9 rather than the bucket count. */
  val HashPrime: Long = 1000000007L
  /** Knuth's multiplicative constant, pre-reduced mod [[HashPrime]]. */
  val HashMult: Long = 2654435761L % HashPrime // = 654435747

  /** Multiplicative-hash bucket in [0, buckets): deterministic, uniform
    * for sequential ids, and expressible in any SQL engine. Computed as
    * a TWO-STEP residue reduction — h = ((id mod P)·(A mod P)) mod P
    * with P = 1e9+7 prime, then h mod buckets. The first reduction keeps
    * every operand below P² < 2⁶³ (the naive id·A form silently wraps in
    * Spark and hard-errors in DuckDB once id exceeds
    * Long.MaxValue/A ≈ 3.4e9 — real ids at 100 TB); reducing by the
    * PRIME first, not by the bucket count, makes the hash period P ≈ 1e9
    * instead of `buckets` — a single-step ((id mod m)·A) mod m depends
    * only on id mod m, so with m=1000 ids carrying mod structure
    * (striped blocks, round-robin shards) would bias splits
    * systematically. The same formula as the linear-counting sketch
    * (Queries.x22). */
  def hashBucket(id: Column, buckets: Int): Column = {
    pmod(pmod(pmod(id, lit(HashPrime)) * lit(HashMult), lit(HashPrime)),
      lit(buckets.toLong))
  }

  /** Deterministic K-FOLD split at UNIT grain — the split CONSTRUCTOR
    * whose output x159's leakage audit would certify clean by
    * construction: fold(unit) is a pure function of the unit id
    * through [[hashBucket]], so every row of a unit (all of a user's
    * sessions, all of a document's chunks) lands in ONE fold — group
    * integrity IS the no-leakage guarantee — and re-runs, re-shards,
    * and other engines reproduce the split bit-for-bit with no RNG
    * state to store. Scale shape: one projection, no shuffle — the
    * fold column composes into whatever scan follows.
    * Output: the input rows + `fold` ∈ [0, k). */
  def foldAssign(df: DataFrame, unit: Column, k: Int): DataFrame = {
    require(k >= 2 && k <= 10000, s"foldAssign: k=$k")
    df.withColumn("fold", hashBucket(unit, k))
  }

  /** Raw hash value in [0, P) — the pre-bucket multiplicative hash: a
    * deterministic, engine-reproducible "uniform random" ORDER over ids.
    * Sampling operators sort by this (ties by id) so "the first n
    * documents" / "the first B tokens" is a uniform sample that any
    * engine re-derives bit-identically. */
  def hashValue(id: Column): Column =
    pmod(pmod(id, lit(HashPrime)) * lit(HashMult), lit(HashPrime))

  /** Deterministic stratified sample: the `k` smallest-hash rows per
    * stratum (ties by id) with their in-stratum `sample_rank`. The
    * rank-filter shape is deliberate: Spark's WindowGroupLimit rewrite
    * turns `row_number() <= k` into a per-map-task partial top-k BEFORE
    * the stratum shuffle, so each task ships at most k rows per stratum
    * — at 100 TB the exchange carries |strata|·k rows per task, not the
    * corpus. Rerunning or re-sharding cannot change the sample. */
  def stratifiedSample(df: DataFrame, strata: Seq[Column], id: Column,
      k: Int): DataFrame = {
    val w = Window.partitionBy(strata: _*).orderBy(hashValue(id), id)
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= k)
  }

  /** Per-group token-budget admission — the "sample 50 B tokens of web,
    * 10 B of code" mixture step: documents are taken in hash order
    * (ties by id) until the group's budget is exhausted; a document is
    * kept iff the tokens of strictly-earlier documents in its group sum
    * below `budget` (so the document that crosses the boundary is the
    * last one in — the budget is a floor, not a ceiling). One
    * cumulative-sum window per group: correct at any scale but serial
    * per group — see [[tokenBudgetBucketed]] for the form that windows
    * only the boundary slice. */
  def tokenBudget(df: DataFrame, group: Column, id: Column,
      nTokens: Column, budget: Column): DataFrame = {
    requireFresh(df, "__cum_prev")
    val w = Window.partitionBy(group).orderBy(hashValue(id), id)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cum_prev", coalesce(sum(nTokens).over(w), lit(0L)))
      .where(col("__cum_prev") < budget)
      .drop("__cum_prev")
  }

  /** [[tokenBudget]] in the 100 TB shape: a HIERARCHICAL prefix sum.
    * The plain form runs one ordered cumulative sum per group — a
    * single reducer walks the whole group no matter how many executors
    * exist. Here the hash range [0, P) splits into `nBuckets`
    * contiguous slices (so bucket order IS hash-order prefix), and the
    * global prefix decomposes exactly:
    *
    *   tokens-before-row = tokens-before-its-BUCKET (from a tiny
    *   map-side-combined (group, bucket) totals aggregate, broadcast
    *   back — |groups|·nBuckets rows) + tokens-before-it WITHIN its
    *   bucket (a window partitioned by (group, bucket), so the sort
    *   runs on 1/nBuckets-sized slices with nBuckets-way parallelism
    *   per group instead of one serial reducer).
    *
    * Same keep rule, row-identical to [[tokenBudget]] (ExtSpec asserts
    * it across budgets and bucket counts); the extra cost is one
    * column-pruned pre-scan for the totals. */
  def tokenBudgetBucketed(df: DataFrame, group: Column, id: Column,
      nTokens: Column, budget: Column, nBuckets: Int = 1024): DataFrame = {
    requireFresh(df, "__h", "__b", "__n", "__g", "__tb", "__before",
      "__cum_prev")
    val width = (HashPrime + nBuckets - 1) / nBuckets
    val withB = df.withColumn("__h", hashValue(id))
      .withColumn("__b", (col("__h") / lit(width)).cast("long"))
      .withColumn("__n", nTokens)
    // materialized once: reused by the size probe and the join below
    // (without it the totals aggregate — a full pre-scan — would run
    // twice), and the count makes the broadcast decision measured, not
    // hoped: |groups|·nBuckets rows fit a broadcast for any sane group
    // count, but a corpus with millions of groups must fall back to a
    // shuffle join rather than OOM the driver
    val totals = withB.groupBy(group.as("__g"), col("__b").as("__tb"))
      .agg(sum(col("__n")).as("__t"))
      .withColumn("__before", coalesce(sum(col("__t")).over(
        Window.partitionBy(col("__g")).orderBy(col("__tb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__t")
      .localCheckpoint()
    // byte-aware broadcast bound (the Pq.requireLutFits discipline): a
    // row-count threshold alone admits 4M rows of WIDE group keys —
    // hundreds of MB. MEASURED widths, not schema defaults:
    // StringType.defaultSize is 20 bytes, so a default-size estimate
    // admits ~2M rows of 500-byte URL group keys (~1 GB actual
    // broadcast). Variable-width columns (string/binary) contribute
    // their actual per-row length; fixed-width columns their type size;
    // +32 B/row object overhead. One aggregate job over the already
    // checkpointed totals — same cost as the count() it replaces. Past
    // the 64 MB budget, the plain shuffle join below is the fallback.
    import org.apache.spark.sql.types.{BinaryType, StringType}
    val rowBytes = totals.schema.fields.map { f =>
      f.dataType match {
        case StringType | BinaryType =>
          coalesce(octet_length(col(f.name)).cast("long"), lit(0L))
        case dt => lit(dt.defaultSize.toLong)
      }
    }.reduce(_ + _) + lit(32L)
    val estBytes = totals.select(coalesce(sum(rowBytes), lit(0L)))
      .first().getLong(0)
    val totalsSide =
      if (estBytes <= 64L * 1024 * 1024) broadcast(totals)
      else totals
    val wIn = Window.partitionBy(group, col("__b"))
      .orderBy(col("__h"), id)
      .rowsBetween(Window.unboundedPreceding, -1)
    // null-safe on the group key: the totals aggregate keeps NULL as a
    // group, so a plain === here would silently drop every null-group
    // row while the single-window tokenBudget keeps them — breaking the
    // documented row-identity between the two forms
    withB.join(totalsSide,
        (group <=> col("__g")) && col("__b") === col("__tb"))
      .withColumn("__cum_prev", col("__before") +
        coalesce(sum(col("__n")).over(wIn), lit(0L)))
      .where(col("__cum_prev") < budget)
      .drop("__h", "__b", "__n", "__g", "__tb", "__before", "__cum_prev")
  }

  /** Output-column guard for the batching operators: an output written
    * over an existing user column would silently destroy caller data —
    * refuse loudly instead. The guard covers the INTERNAL `__`-prefixed
    * temporaries too: the prefix is a convention, not a namespace, and a
    * caller column named `__n` would be silently overwritten and then
    * dropped — data loss twice over. Enforced, not documented. */
  private def requireFresh(df: DataFrame, names: String*): Unit =
    names.foreach(n => require(!df.columns.contains(n),
      s"input already has a column named '$n' — rename it first: " +
        "batching operators only ADD output columns (and reserve their " +
        "__-prefixed temporaries), never overwrite"))

  /** Length-bucketed micro-batch assignment (padding-efficient
    * batching): within each of `shards` deterministic streams (id mod
    * shards) documents sort by (token count, id) and every `batchSize`
    * consecutive documents form one batch — sequences in a batch have
    * near-equal length, which is what keeps padding waste low when the
    * batch is tensorized. Shard-local like [[packChunks]]: parallelism
    * = shards, no global sort. Adds `shard` and `batch_id`; every input
    * column (including any caller-owned `n_tokens`) passes through
    * untouched — the token count enters only as the sort expression. */
  def lengthBatches(df: DataFrame, id: Column, nTokens: Column,
      batchSize: Int, shards: Int): DataFrame = {
    requireFresh(df, "shard", "batch_id", "__shard", "__n")
    val w = Window.partitionBy(col("__shard")).orderBy(col("__n"), id)
    df.withColumn("__shard", pmod(id, lit(shards.toLong)))
      .withColumn("__n", nTokens)
      .withColumn("batch_id",
        floor((row_number().over(w) - lit(1)) / lit(batchSize)).cast("long"))
      .withColumn("shard", col("__shard"))
      .drop("__shard", "__n")
  }

  /** Deterministic train/valid/test assignment by per-mille weight:
    * bucket < `train` ‰ → "train", < train+valid ‰ → "valid", else
    * "test". A pure per-row map — no shuffle, no RNG state; rerunning or
    * re-sharding the corpus cannot move a document across splits. */
  def hashSplit(df: DataFrame, id: Column, trainPerMille: Int,
      validPerMille: Int): DataFrame = {
    require(trainPerMille + validPerMille <= 1000,
      "train + valid per-mille must leave room for test")
    val b = hashBucket(id, 1000)
    df.withColumn("bucket", b)
      .withColumn("split",
        when(b < trainPerMille, "train")
          .when(b < trainPerMille + validPerMille, "valid")
          .otherwise("test"))
  }

  /** Deterministic weighted corpus mixture: keep each row iff its hash
    * bucket falls under a per-row per-mille rate (a Column, so rates can
    * come from a CASE over source/language/quality tier). This is the
    * up/down-sampling step of a training-data mixture ("4 epochs of
    * wiki, 0.3 of common crawl") expressed as a pure per-row predicate:
    * no RNG, no shuffle, no state — at 100 TB it composes into the scan
    * and survives re-sharding unchanged. `salt` decorrelates the keep
    * decision from other hash assignments over the same id (e.g.
    * [[hashSplit]]'s buckets), so sampling cannot systematically favor
    * one split. */
  def weightedSample(df: DataFrame, id: Column, ratePerMille: Column,
      salt: Long = 0x9e3779b9L): DataFrame = {
    // the salt enters as an independent MULTIPLIER, not an added
    // constant: the hash is affine, so hashBucket(id + s) =
    // hashBucket(id) shifted by a constant — the keep set would be a
    // CONTIGUOUS range of hashSplit buckets (fully correlated with the
    // split; for some salts one split absorbs the whole sample). Two
    // multiplicative hashes with distinct multipliers mod a prime are
    // pairwise-scrambled, which is the decorrelation actually needed
    val mult = salt % HashPrime
    require(mult != 0, "salt must be nonzero mod HashPrime")
    val b = pmod(pmod(pmod(id, lit(HashPrime)) * lit(mult),
      lit(HashPrime)), lit(1000L))
    df.where(b < ratePerMille)
  }

  /** Temperature-rebalanced mixture (the multilingual p^α flattening
    * of Conneau et al. 2020 / mT5; public recipe): with α < 1 the
    * group distribution flattens toward uniform. Downsample-only
    * framing — the SMALLEST group binds: its keep rate is
    * pow(n_min/n_min, α−1) = pow(1, ·) = 1.0 EXACTLY (no floating
    * boundary), and every larger group keeps (n_g/n_min)^(α−1) of its
    * rows through the same salted multiplicative-hash predicate as
    * [[weightedSample]], at per-million resolution.
    *
    * Determinism: the single transcendental pow is quantized once to
    * DECIMAL(28,12) (the x76 ln discipline — one quantization per
    * GROUP, a handful of values); the per-million threshold is then
    * the exact decimal product ×10⁶ floored, and the row predicate is
    * pure integer arithmetic.
    *
    * Scale shape: one map-side-combined group count (+1-row min),
    * broadcast back as a tiny rate table; the keep decision composes
    * into the scan. No RNG, no wide shuffle; re-sharding cannot move
    * a row in or out of the mixture.
    *
    * A NULL group is a group like any other: the rate table counts it
    * and the probe joins null-safely (`<=>`), so null-group rows are
    * rebalanced — never silently dropped — and may themselves be the
    * binding smallest group. */
  def temperatureMixture(df: DataFrame, id: Column, group: Column,
      alpha: Double, salt: Long = 0x51ed2701L): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    import org.apache.spark.sql.types.DecimalType
    val mult = salt % HashPrime
    require(mult != 0, "salt must be nonzero mod HashPrime")
    val counts = df.groupBy(group.as("__g")).agg(count(lit(1)).as("__n"))
    val nMin = counts.agg(min(col("__n")).as("__nmin"))
    val rates = counts.crossJoin(broadcast(nMin))
      .select(col("__g"),
        floor(pow(col("__n").cast("double") / col("__nmin"),
            lit(alpha - 1)).cast(DecimalType(28, 12)) * lit(1000000L))
          .as("__keep_ppm"))
    val b = pmod(pmod(pmod(id, lit(HashPrime)) * lit(mult),
      lit(HashPrime)), lit(1000000L))
    // null-safe join: the rate table counts a NULL group as a group of
    // its own (groupBy does), so the probe must match it too — a plain
    // equi-join would silently drop every null-group row, and if that
    // group were the smallest it would skew every OTHER group's rate
    df.join(broadcast(rates), group <=> col("__g"))
      .where(b < col("__keep_ppm"))
      .drop("__g", "__keep_ppm")
  }

  /** Exactly-k weighted sampling WITHOUT replacement — systematic
    * (Madow 1949) probability-proportional-to-size selection, the
    * "sample k documents with probability ∝ token count" step of a
    * mixture builder, with zero RNG and zero transcendentals:
    * rows are laid end to end in hash order (ties by id) as weight
    * intervals [cum_prev, cum), and a row is selected iff its interval
    * contains a multiple of total/k — i.e. iff
    * floor(cum·k/total) > floor(cum_prev·k/total), ALL in 64-bit
    * integer arithmetic (`div`), so any engine re-derives the same
    * sample bit-identically (pow/ln-based Efraimidis–Spirakis keys
    * were REJECTED for the oracle-hashed path: exponentiated doubles
    * rank-swap across engines at ulp distance; the x70 tie lesson).
    *
    * Inclusion probability is exactly w·k/total for every row with
    * w ≤ total/k (the systematic-sampling guarantee under the
    * hash-scrambled order); a HEAVY row (w > total/k) is selected with
    * certainty, and each such row absorbs every multiple in its
    * interval, so the output has exactly k rows when no weight exceeds
    * total/k and correspondingly fewer when heavy rows absorb several
    * pick points each (documented, not hidden: `pick_idx` jumps show
    * exactly where).
    *
    * Scale shape: the same HIERARCHICAL prefix sum as
    * [[tokenBudgetBucketed]], minus the group key — per-bucket totals
    * (≤ nBuckets rows, always broadcast-safe) carry the cross-bucket
    * prefix, within-bucket windows run nBuckets-wide in parallel, so
    * no single reducer ever walks the corpus. Overflow is guarded
    * loudly: cum·k stays < 2⁶³ iff total ≤ Long.MaxValue/k, checked
    * against the MEASURED total, and negative weights are refused
    * (they would silently corrupt every downstream interval).
    *
    * Adds `pick_idx` (1-based index of the pick point hit, strictly
    * increasing in hash order); every input column passes through. */
  def systematicWeightedSample(df: DataFrame, id: Column, weight: Column,
      k: Int, nBuckets: Int = 1024): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    requireFresh(df, "pick_idx", "__h", "__b", "__w", "__tb", "__before",
      "__cum_prev", "__cum")
    val width = (HashPrime + nBuckets - 1) / nBuckets
    val withB = df.withColumn("__h", hashValue(id))
      .withColumn("__b", (col("__h") / lit(width)).cast("long"))
      .withColumn("__w", weight.cast("long"))
    val totals = withB.groupBy(col("__b").as("__tb"))
      .agg(sum(col("__w")).as("__t"), min(col("__w")).as("__minw"))
      .localCheckpoint()
    val Array(total, minW) = totals
      .select(coalesce(sum(col("__t")), lit(0L)),
        coalesce(min(col("__minw")), lit(0L)))
      .first().toSeq.map(_.asInstanceOf[Long]).toArray
    require(minW >= 0, s"negative weight $minW: weights must be >= 0")
    require(total > 0, "total weight must be positive")
    require(total <= Long.MaxValue / k,
      s"cum*k overflows 64 bits: total weight $total exceeds " +
        s"Long.MaxValue/$k — reduce k or rescale the weight unit")
    val before = totals
      .withColumn("__before", coalesce(sum(col("__t")).over(
        Window.orderBy(col("__tb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__tb"), col("__before"))
    val wIn = Window.partitionBy(col("__b")).orderBy(col("__h"), id)
      .rowsBetween(Window.unboundedPreceding, -1)
    withB.join(broadcast(before), col("__b") === col("__tb"))
      .withColumn("__cum_prev", col("__before") +
        coalesce(sum(col("__w")).over(wIn), lit(0L)))
      .withColumn("__cum", col("__cum_prev") + col("__w"))
      .where(expr(s"__cum * ${k}L div ${total}L") >
        expr(s"__cum_prev * ${k}L div ${total}L"))
      .withColumn("pick_idx", expr(s"__cum * ${k}L div ${total}L"))
      .drop("__h", "__b", "__w", "__tb", "__before", "__cum_prev", "__cum")
  }

  /** Concat-then-chunk sequence packing (the GPT-style pretraining
    * layout): documents are laid end to end in (shard, id) order and the
    * token stream is cut every `chunkTokens`; each document reports the
    * first/last chunk it lands in and its offset in the stream.
    *
    * Packing is SHARD-LOCAL: the corpus is split into `shards`
    * deterministic streams (id mod shards) packed independently — the
    * window's partition key. That is both how distributed packing runs in
    * practice (independent writers) and what keeps this scale-safe: the
    * only shuffle is the shard/window exchange, parallelism = shards, and
    * no shard ever needs a global prefix sum.
    *
    * Adds `shard`, `start_tok`, `chunk_first`, `chunk_last`; every input
    * column passes through untouched (the token count enters only as an
    * expression). */
  def packChunks(df: DataFrame, id: Column, nTokens: Column,
      chunkTokens: Int, shards: Int): DataFrame = {
    requireFresh(df, "shard", "start_tok", "chunk_first", "chunk_last",
      "__shard", "__n")
    val w = Window.partitionBy(col("__shard")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__shard", pmod(id, lit(shards.toLong)))
      .withColumn("__n", nTokens)
      .withColumn("start_tok",
        coalesce(sum(col("__n")).over(w), lit(0L)))
      .withColumn("chunk_first",
        floor(col("start_tok") / chunkTokens).cast("long"))
      .withColumn("chunk_last",
        floor((col("start_tok") + col("__n") - 1) / chunkTokens)
          .cast("long"))
      .withColumn("shard", col("__shard"))
      .drop("__shard", "__n")
  }

  /** EXECUTE a [[unimaxAllocation]] plan: keep each source's rows at
    * its allocated rate through the same salted multiplicative-hash
    * ppm predicate as [[temperatureMixture]] — no RNG, re-sharding
    * cannot move a row in or out, and a fully-allocated source
    * (rate_ppm = 1e6) is kept verbatim. The plan broadcasts (one row
    * per source); the keep decision composes into the scan. */
  def unimaxSample(df: DataFrame, id: Column, source: Column,
      weight: Column, budget: Long, maxEpochs: Long = 1L,
      salt: Long = 0x51ed2701L): DataFrame = {
    val plan = unimaxAllocation(df, source, weight, budget, maxEpochs)
    val mult = salt % HashPrime
    require(mult != 0, "salt must be nonzero mod HashPrime")
    val b = pmod(pmod(pmod(id, lit(HashPrime)) * lit(mult),
      lit(HashPrime)), lit(1000000L))
    df.join(broadcast(plan.select(col("source").as("__src"),
        col("rate_ppm"))),
        source.cast("string") <=> col("__src"))
      .where(b < col("rate_ppm"))
      .drop("__src", "rate_ppm")
  }

  /** UniMax mixture allocation (Chung et al. ICLR 2023; public recipe):
    * spread a token `budget` as uniformly as possible across sources,
    * but never take more than `maxEpochs` passes over any source —
    * ascending-capacity waterfilling. Sources are processed smallest
    * cap first; step i of n gets min(cap, remaining div (n − i)), so
    * small sources are never oversampled and the budget left by capped
    * sources flows to the big ones (the last source absorbs the
    * integer remainder).
    *
    * All arithmetic is 64-bit integer (floor division) — any engine
    * re-derives the identical allocation. The per-source reduction is
    * distributed (map-side-combined sum); only the ALLOCATION LOOP runs
    * on the driver, over one row per source — source cardinality is
    * bounded (it is a mixture-design axis, like languages), the same
    * legitimacy as a centroid table. The `rate_ppm` column is the
    * downsample rate a [[temperatureMixture]]-style ppm hash predicate
    * applies (1e6 = keep everything).
    *
    * Output: (source, n_docs, n_tokens, cap_tokens, alloc_tokens,
    * rate_ppm), one row per source. */
  def unimaxAllocation(df: DataFrame, source: Column, weight: Column,
      budget: Long, maxEpochs: Long = 1L): DataFrame = {
    require(budget >= 0 && maxEpochs >= 1,
      s"unimaxAllocation: budget=$budget, maxEpochs=$maxEpochs")
    val spark = df.sparkSession
    val per = df.groupBy(source.as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(weight).as("n_tokens"))
      .select(col("source").cast("string"), col("n_docs"),
        col("n_tokens").cast("long"),
        (col("n_tokens").cast("long") * maxEpochs).as("cap_tokens"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy { case (s, _, _, cap) => (cap, s) }
    var remaining = budget
    val n = per.length
    val rows = per.zipWithIndex.map { case ((s, docs, toks, cap), i) =>
      val fair = remaining / (n - i) // n - i > 0; integer floor division
      val alloc = math.min(cap, fair)
      remaining -= alloc
      val ratePpm = // BigInt: alloc·1e6 overflows a Long past ~9.2e12 tokens
        if (toks <= 0L) 0L
        else math.min(1000000L, (BigInt(alloc) * 1000000L / toks).toLong)
      (s, docs, toks, cap, alloc, ratePpm)
    }
    import spark.implicits._
    rows.toSeq.toDF("source", "n_docs", "n_tokens", "cap_tokens",
      "alloc_tokens", "rate_ppm")
  }

  /** Exclusive id-ordered PREFIX SUM in the 100 TB shape — the shared
    * engine under [[shardPlan]] and
    * [[TextAnalysis.vocabularyGrowth]]'s document offsets: the naive
    * form is one `Window.orderBy(id)` over every per-document row —
    * a single task walks the whole corpus. Here the id RANGE
    * [min, max] splits into `nBuckets` contiguous equal-width slices
    * (contiguity means bucket order IS id order), and the global
    * prefix decomposes exactly, the [[tokenBudgetBucketed]] recipe
    * with id-range buckets:
    *
    *   sum-before-row = sum-before-its-BUCKET (per-bucket totals —
    *   ≤ nBuckets rows, prefix-folded in a bounded DRIVER loop and
    *   broadcast back, so NO single-partition WindowExec exists
    *   anywhere in the plan) + sum-before-it WITHIN its bucket (a
    *   window partitioned by bucket: nBuckets-way parallel sorts of
    *   1/nBuckets slices).
    *
    * Deterministic: the decomposition reproduces the single-window
    * prefix sums exactly (ExtSpec asserts row identity across bucket
    * counts). Costs one column-pruned min/max pre-scan; the
    * per-bucket totals collect is bounded by `nBuckets` (the
    * [[unimaxAllocation]] driver-loop contract). Ids must be an
    * INTEGRAL column (byte/short/int/long — cast internally to long;
    * enforced loudly, because the range-bucket decomposition needs id
    * arithmetic) whose span max−min fits in 63 bits (a corpus spanning
    * the entire id domain is not a real corpus — also enforced).
    * Output: (id, n, cum_prev) with cum_prev = Σ n over ids' strict
    * predecessors; `id` keeps the caller's type. */
  def idOrderedPrefix(df: DataFrame, id: Column, n: Column,
      nBuckets: Int = 1024): DataFrame = {
    require(nBuckets >= 1, s"idOrderedPrefix: nBuckets=$nBuckets")
    requireFresh(df, "__ipn", "__ipb", "__ipo", "__ipc", "__ipl")
    val spark = df.sparkSession
    val rows0 = df.select(id.as("id"), n.as("__ipn"))
    val idT = rows0.schema("id").dataType
    // match on the DataType, not simpleString: ByteType prints as
    // "tinyint" and ShortType as "smallint", so a string list of
    // "byte"/"short" silently rejected the types it claimed to accept
    require(integralTypes.contains(idT),
      s"idOrderedPrefix: id column must be an integral type " +
        s"(byte/short/int/long), got ${idT.simpleString} — the " +
        "id-range bucket decomposition needs numeric id arithmetic")
    val rows = rows0.withColumn("__ipl", col("id").cast("long"))
    val mm = rows.agg(min(col("__ipl")), max(col("__ipl"))).first()
    if (mm.isNullAt(0))
      return rows.select(col("id"), col("__ipn").as("n"),
        lit(0L).as("cum_prev"))
    val lo = mm.getLong(0)
    val span = BigInt(mm.getLong(1)) - BigInt(lo)
    require(span <= Long.MaxValue,
      s"idOrderedPrefix: id span $span exceeds 63 bits")
    val width = (span / nBuckets + 1).toLong
    val withB = rows.withColumn("__ipb",
      ((col("__ipl") - lit(lo)) / lit(width)).cast("long"))
    // bucket totals: ≤ nBuckets rows — a bounded collect, folded to
    // exclusive bucket offsets on the driver (no global window at all)
    val totals = withB.groupBy("__ipb")
      .agg(sum(col("__ipn")).as("__t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offs = totals.map { case (b, t) => val o = acc; acc += t; (b, o) }
    import spark.implicits._
    val offDf = broadcast(offs.toSeq.toDF("__ipb", "__ipo"))
    val wIn = Window.partitionBy(col("__ipb")).orderBy(col("__ipl"))
      .rowsBetween(Window.unboundedPreceding, -1)
    withB.join(offDf, Seq("__ipb"))
      .withColumn("__ipc",
        col("__ipo") + coalesce(sum(col("__ipn")).over(wIn), lit(0L)))
      .select(col("id"), col("__ipn").as("n"), col("__ipc").as("cum_prev"))
  }

  /** The integral DataTypes the id/weight guards accept — matched on
    * the TYPE, not simpleString (ByteType prints "tinyint" and
    * ShortType "smallint"; a string list of "byte"/"short" silently
    * rejected the types it claimed to accept). */
  private val integralTypes: Set[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    Set(ByteType, ShortType, IntegerType, LongType)
  }

  /** The ES06 samplers' integer-weight contract, enforced on the
    * RESOLVED type of the weight expression: a fractional weight
    * would be silently floored to 0 by the long cast and the row
    * dropped — a skewed sample with no error. Pre-scale fractional
    * weights to integer micro-units (ppm) instead. */
  private def requireIntegralWeight(df: DataFrame, weight: Column,
      op: String): Unit = {
    val wT = df.select(weight.as("__w")).schema("__w").dataType
    require(integralTypes.contains(wT),
      s"$op: weight must be an integral COUNT column " +
        s"(byte/short/int/long), got ${wT.simpleString} — fractional " +
        "weights would be silently floored by the long cast; " +
        "pre-scale to integer micro-units (ppm) first")
  }

  /** WEIGHTED sampling without replacement, derandomized
    * (Efraimidis & Spirakis 2006, the exponential-key reservoir): the
    * `n` rows maximizing key = ln(u)/w with u the id's deterministic
    * uniform draw — inclusion probability ∝ weight ("sample 10k docs
    * proportional to token count"), re-derivable by any engine
    * because u = (hashValue+1)/(P+1) ∈ (0, 1] replaces the RNG (the
    * x90/x83 ppm-predicate discipline applied to the ES06 scheme).
    * u = 1 (hash = P−1) gives key 0, the maximum — still a valid
    * draw. Rows with w ≤ 0 are excluded (never sampled), loudly
    * documented rather than NaN-ranked.
    *
    * WEIGHTS ARE INTEGER COUNTS (token counts, byte sizes, ppm-scaled
    * ratios) — enforced loudly: a fractional weight column would be
    * silently floored by the long cast (a 0.7 weight becomes 0 and
    * the row silently dropped, skewing inclusion probabilities), so
    * non-integral weight types are rejected; pre-scale fractional
    * weights to integer micro-units (the engine-wide ppm discipline)
    * before sampling.
    *
    * Determinism: the key is ONE double chain from exact integers
    * (ln((h+1)/(P+1)) / w) QUANTIZED once to DECIMAL(28,12) — the
    * transcendental-at-the-boundary rule, because the ln is both an
    * output and the ranking criterion; ties (equal quantized keys)
    * break by id. The rank cut rides WindowGroupLimit.
    * Output: the sampled rows as (id, w, key, sample_rank). */
  def weightedTopSample(df: DataFrame, id: Column, weight: Column,
      n: Int): DataFrame = {
    require(n >= 1, s"weightedTopSample: n=$n must be >= 1")
    requireIntegralWeight(df, weight, "weightedTopSample")
    // filter w > 0 BEFORE the key projection — under ANSI the ln/w
    // chain on a zero-weight row is a divide-by-zero crash, not a NaN
    val base = df.select(id.as("id"), weight.cast("long").as("w"))
      .where(col("w") > 0)
    val u = (hashValue(col("id")) + lit(1L)).cast("double") /
      lit((HashPrime + 1L).toDouble)
    val key = (log(u) / col("w").cast("double"))
      .cast(org.apache.spark.sql.types.DecimalType(28, 12))
      .cast("double")
    base.withColumn("key", key)
      .withColumn("sample_rank", row_number().over(
        Window.orderBy(col("key").desc, col("id").asc)).cast("long"))
      .where(col("sample_rank") <= n)
      .select(col("id"), col("w"), col("key"), col("sample_rank"))
  }

  /** [[weightedTopSample]] PER STRATUM — "k docs per source,
    * probability ∝ weight within each": the same ES06 exponential
    * keys ranked inside each stratum, so every stratum draws its own
    * weighted sample in one pass (the stratifiedSample shape with the
    * uniform hash order replaced by the weighted key). The rank cut
    * rides WindowGroupLimit per stratum — each map task ships ≤ k
    * rows per stratum, never the corpus.
    * Output: (stratum, id, w, key, sample_rank). */
  def weightedStratifiedSample(df: DataFrame, stratum: Column,
      id: Column, weight: Column, k: Int): DataFrame = {
    require(k >= 1, s"weightedStratifiedSample: k=$k must be >= 1")
    requireIntegralWeight(df, weight, "weightedStratifiedSample")
    val base = df.select(stratum.as("stratum"), id.as("id"),
        weight.cast("long").as("w"))
      .where(col("w") > 0)
    val u = (hashValue(col("id")) + lit(1L)).cast("double") /
      lit((HashPrime + 1L).toDouble)
    val key = (log(u) / col("w").cast("double"))
      .cast(org.apache.spark.sql.types.DecimalType(28, 12))
      .cast("double")
    base.withColumn("key", key)
      .withColumn("sample_rank", row_number().over(
        Window.partitionBy("stratum")
          .orderBy(col("key").desc, col("id").asc)).cast("long"))
      .where(col("sample_rank") <= k)
      .select(col("stratum"), col("id"), col("w"), col("key"),
        col("sample_rank"))
  }

  /** Stratified ROUND-ROBIN curriculum order: a deterministic global
    * training ORDER in which strata (sources, languages, quality
    * tiers) interleave instead of clumping — the anti-correlation a
    * training run wants so no epoch segment is one source's long run
    * (curriculum/mixing literature's "shuffle within, interleave
    * across"). Within each stratum, documents order by the
    * engine-portable multiplicative [[hashValue]] (a deterministic
    * uniform shuffle any engine re-derives); globally, position =
    * in-stratum-rank · |strata| + stratum-index, so a sort by `pos`
    * visits strata round-robin while both have documents left
    * (uneven strata leave gaps — `pos` is an ORDER, not a dense
    * index).
    *
    * Scale shape: the in-stratum rank uses the [[idOrderedPrefix]]
    * bucket decomposition on the HASH axis — per-(stratum,
    * hash-bucket) local windows (partition-parallel even when one
    * stratum dominates the corpus) plus exclusive offsets folded over
    * the bounded |strata|×nBuckets grid; no single-partition window
    * over per-document rows anywhere. The stratum index table is
    * category-bounded and broadcast.
    * Output: (id, stratum, pos). */
  def curriculumInterleave(df: DataFrame, id: Column, stratum: Column,
      nBuckets: Int = 256): DataFrame = {
    require(nBuckets >= 1, s"curriculumInterleave: nBuckets=$nBuckets")
    val base0 = df.select(id.as("id"), stratum.as("stratum"))
    val idT = base0.schema("id").dataType
    require(integralTypes.contains(idT),
      s"curriculumInterleave: id must be integral " +
        s"(byte/short/int/long), got ${idT.simpleString} — hashValue " +
        "needs numeric id arithmetic")
    val width = HashPrime / nBuckets + 1
    val base = base0
      .withColumn("__h", hashValue(col("id")))
      .withColumn("__b", (col("__h") / lit(width)).cast("long"))
    val grid = base.groupBy("stratum", "__b")
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint(true) // feeds offsets AND the stratum index
    val wOff = Window.partitionBy("stratum").orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = broadcast(grid
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col("stratum"), col("__b"), col("__off")))
    // stratum index over the bounded category grid (total order)
    val sIdx = broadcast(grid.select("stratum").distinct()
      .withColumn("__bi",
        row_number().over(Window.orderBy("stratum")).cast("long") - 1))
    val nS = broadcast(sIdx.agg(count(lit(1)).as("__ns")))
    val wIn = Window.partitionBy("stratum", "__b")
      .orderBy(col("__h"), col("id"))
    base.join(offs, Seq("stratum", "__b"))
      .join(sIdx, Seq("stratum"))
      .crossJoin(nS)
      .withColumn("__r",
        col("__off") + row_number().over(wIn).cast("long") - 1)
      .select(col("id"), col("stratum"),
        (col("__r") * col("__ns") + col("__bi")).as("pos"))
  }

  /** Token-budgeted SHARD PLAN — the export-layout step between
    * curation and [[graft.operators.Export.writeJsonl]]: documents in
    * id order are packed greedily into shards of ≈ `shardTokens`
    * tokens (a document starts a new shard when the running total
    * crosses the boundary — shards never split a document, so they
    * overshoot by at most one document). Returns the per-document
    * assignment; aggregate for the manifest view.
    *
    * shard_id = floor(tokens-before-this-doc / shardTokens) — pure
    * integer arithmetic on the id-ordered prefix sum, computed via
    * the [[idOrderedPrefix]] hierarchical decomposition: per-id-range
    * bucket sums, a driver-folded bucket-offset broadcast, and
    * bucket-partitioned windows — no single-partition window over
    * per-document rows at any scale. Layout is identical to the
    * single-window form (same ids, same prefix sums, same shards).
    * Output: (id, n_tokens, shard_id). */
  def shardPlan(df: DataFrame, id: Column, nTokens: Column,
      shardTokens: Long): DataFrame = {
    require(shardTokens >= 1, s"shardTokens $shardTokens must be >= 1")
    requireFresh(df, "__n", "__cum_prev")
    idOrderedPrefix(df.select(id.as("id"), nTokens.as("__n")),
        col("id"), col("__n"))
      .select(col("id"), col("n").as("n_tokens"),
        ((col("cum_prev") - pmod(col("cum_prev"), lit(shardTokens))) /
          lit(shardTokens)).cast("long").as("shard_id"))
  }

  /** FRESHNESS-DECAY sampling: keep probability halves every
    * `halflifeDays` of age — the recency bias a continually-refreshed
    * training corpus applies to stale crawls (RefinedWeb-class
    * pipelines re-crawl and downweight old snapshots). Deliberately
    * STEPPED (floor(age/halflife) halvings, a right-shift on the ppm
    * budget) so the whole operator is integer arithmetic end to end:
    * no pow(), no RNG — the same [[temperatureMixture]] hash
    * predicate decides each row, so re-running or re-sharding keeps
    * the identical sample. Rows newer than `asOf` clamp to age 0
    * (kept at full rate); shifts cap at 20 (ppm 0 past ~20
    * half-lives). One scan, no joins, no shuffle.
    * Output: the kept rows + (age_days, keep_ppm) audit columns. */
  def freshnessDecaySample(df: DataFrame, id: Column, ts: Column,
      asOf: Column, halflifeDays: Long, salt: Long = 0x51ed2701L)
      : DataFrame = {
    require(halflifeDays >= 1,
      s"freshnessDecaySample: halflifeDays=$halflifeDays must be >= 1")
    val mult = salt % HashPrime
    require(mult != 0, "salt must be nonzero mod HashPrime")
    val dayUs = 86400000000L
    val rawAge = unix_micros(asOf) - unix_micros(ts)
    val age = greatest(
      ((rawAge - pmod(rawAge, lit(dayUs))) / lit(dayUs)).cast("long"),
      lit(0L))
    val steps = least(
      ((age - pmod(age, lit(halflifeDays))) / lit(halflifeDays))
        .cast("long"),
      lit(20L))
    val b = pmod(pmod(pmod(id, lit(HashPrime)) * lit(mult),
      lit(HashPrime)), lit(1000000L))
    df.withColumn("age_days", age)
      .withColumn("__steps", steps.cast("int"))
      // functions.shiftright only takes a literal bit count — the SQL
      // form accepts the column
      .withColumn("keep_ppm",
        expr("CAST(shiftright(1000000, __steps) AS BIGINT)"))
      .where(b < col("keep_ppm"))
      .drop("__steps")
  }

  /** LARGEST-REMAINDER apportionment of a token budget across sources
    * (Hamilton's method — the house-seats classic): each source gets
    * floor(total·w_s/W) outright, and the leftover
    * total − Σfloor (< #sources) goes one unit each to the largest
    * fractional remainders (ties broken by source name — a TOTAL
    * order, nothing left to the engine). Unlike per-source rate
    * rounding, the quotas sum to EXACTLY `total` — the property a
    * budgeted mixture plan actually needs.
    *
    * Exactness at 100 TB: total·w_s is a DECIMAL(18,0)×DECIMAL(18,0)
    * product — (37,0), inside the 38 cap (the x78 rule) and exact far
    * past the ~9.2e18 Long ceiling; floor and remainder are decimal
    * pmod arithmetic, never a double. The rank window runs over the
    * SOURCE set only (bounded cardinality, like [[unimaxAllocation]]'s
    * driver loop — document sets never enter a window).
    * Output: (source, w, base_quota, extra, quota). */
  def largestRemainderQuota(df: DataFrame, source: Column, weight: Column,
      total: Long): DataFrame = {
    require(total >= 0, s"largestRemainderQuota: total=$total")
    val D = org.apache.spark.sql.types.DecimalType(18, 0)
    val per = df.groupBy(source.as("source"))
      .agg(sum(weight).cast(D).as("w"))
    val tot = per.agg(sum(col("w")).cast(D).as("__W"))
    val t = lit(total).cast(D)
    val scaled = per.crossJoin(broadcast(tot))
      .withColumn("__tw", t * col("w"))
      .withColumn("__rem", pmod(col("__tw"), col("__W")))
      .withColumn("base_quota",
        ((col("__tw") - col("__rem")) / col("__W")).cast("long"))
    val short = scaled
      .agg((lit(total) - sum(col("base_quota"))).as("__short"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col("source").asc)
    scaled.crossJoin(broadcast(short))
      .withColumn("extra",
        (row_number().over(w) <= col("__short")).cast("long"))
      .select(col("source"), col("w").cast("long").as("w"),
        col("base_quota"), col("extra"),
        (col("base_quota") + col("extra")).as("quota"))
  }
  /** Label-BALANCED evaluation carve-out: `total` rows split as evenly
    * as the label set allows (equal-weight [[largestRemainderQuota]] —
    * quotas sum to exactly `total` when every label has enough rows),
    * each label's share taken in portable-hash order ([[hashValue]],
    * ties by id — re-running or re-sharding cannot change the pick).
    * The benchmark-construction step after curation: a held-out set
    * where no label dominates. A label with fewer rows than its quota
    * contributes what it has (no redistribution — compose
    * [[unimaxAllocation]] upstream when caps must rebalance).
    * Scale shape: one bounded label agg + a per-label rank window
    * that DOES ride WindowGroupLimit — the rank is first cut at the
    * LITERAL bound `total` (which dominates every per-label quota, so
    * the cut is free), because Spark only pushes a group limit for a
    * rank-vs-literal filter: comparing straight against the
    * join-derived quota column would force a full per-label sort. The
    * exact per-label quota filter then applies on the ≤ total
    * survivors after one broadcast quota join.
    * Output: the selected rows + (pick_rank, quota). */
  def labelBalancedCarveout(df: DataFrame, id: Column, label: Column,
      total: Long): DataFrame = {
    require(total >= 0, s"labelBalancedCarveout: total=$total")
    val labels = df.groupBy(label.as("__l")).agg(count(lit(1)).as("__n"))
    val quotas = largestRemainderQuota(labels, col("__l"), lit(1L), total)
      .select(col("source").as("__l"), col("quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(label).orderBy(hashValue(id).asc, id.asc)
    df.withColumn("pick_rank", row_number().over(w).cast("long"))
      .where(col("pick_rank") <= lit(total))
      .join(broadcast(quotas), label === col("__l"))
      .where(col("pick_rank") <= col("quota"))
      .drop("__l")
  }
  /** LONGEST-PROCESSING-TIME assignment of export shards to parallel
    * readers (Graham 1969's 4/3-approximation): shards sorted by
    * (token mass DESC, id ASC — a total order) each go to the
    * currently least-loaded reader (ties to the lowest reader index)
    * — the read-schedule step after [[shardPlan]], bounding any
    * reader's load at ≤ 4/3 of optimal. The greedy is inherently
    * sequential, so it runs as a driver loop over the COLLECTED shard
    * manifest — bounded by construction (shards ≈ corpus tokens /
    * shardTokens; the [[unimaxAllocation]] driver-loop contract), and
    * at 100 TB the manifest is still thousands of rows, not billions.
    * Output: (shard_id, n_tokens, reader). */
  def lptAssign(shards: DataFrame, shardIdCol: String,
      nTokensCol: String, readers: Int): DataFrame = {
    require(readers >= 1, s"lptAssign: readers=$readers must be >= 1")
    val spark = shards.sparkSession
    val rows = shards.select(col(shardIdCol).cast("long"),
        col(nTokensCol).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (sid, nt) => (-nt, sid) }
    val loads = Array.fill(readers)(0L)
    val out = rows.map { case (sid, nt) =>
      val reader = loads.indices.minBy(i => (loads(i), i))
      loads(reader) += nt
      (sid, nt, reader.toLong)
    }
    import spark.implicits._
    out.toSeq.toDF("shard_id", "n_tokens", "reader")
  }
}
