package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over integer keys (Cormode & Muthukrishnan): a
  * `depth × width` grid of counters answering point frequency queries
  * with one-sided error (estimates only ever OVER-count). The third
  * member of the corpus-frequency family:
  *
  *  - x29 exact top-k      — shuffles every distinct key;
  *  - SpaceSavingAggregator — bounded summary, heavy hitters only;
  *  - CountMin              — bounded grid, answers ANY key, additive.
  *
  * Additivity is the 100 TB property: sketches of two batches merge by
  * cell-wise SUM (they are just counts grouped by (j, bucket)), so
  * per-day sketches fold into per-month ones without touching the raw
  * data, and the shuffle to build one is bounded at depth·width cells
  * per map partition regardless of key cardinality.
  *
  * Determinism: the row hashes are multiplicative hashes in RESIDUE form
  * — ((k mod w)·(A_j mod w) + B_j) mod w — overflow-free for any long
  * key and expressible identically in any SQL engine, which is what
  * makes x37 oracle-checkable with zero tolerance. `width` should be
  * prime (the default 509 is) so the multiplicative hash mixes well.
  *
  * Guarantees (asserted in ExtSpec):
  *  - est(k) ≥ true(k) for every key — one-sided error;
  *  - each depth row sums to N — no mass lost;
  *  - sketch(A ⊎ B) = cellwise-sum(sketch(A), sketch(B)).
  */
object CountMin {

  /** Per-depth-row multiplier/offset pairs (xxhash/murmur-grade odd
    * constants; residues taken at use site). Bounds the depth at 4 —
    * width, not depth, is the knob worth scaling. */
  private val A = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)
  private val B = Seq(17L, 31L, 47L, 61L)
  val maxDepth: Int = A.length

  /** Bucket of `key` in depth-row `j`: residue-form multiplicative hash,
    * overflow-free for any long key (see Sampling.hashBucket). */
  def bucket(key: Column, j: Int, width: Int): Column = {
    val w = width.toLong
    pmod(pmod(key, lit(w)) * lit(A(j) % w) + lit(B(j) % w), lit(w))
  }

  /** The `depth` (j, bucket) cell coordinates of every input row — the
    * pre-aggregation form, usable on a STREAMING DataFrame (feed it to
    * Streams.additiveSink keyed on (j, bucket) to maintain the sketch
    * incrementally; cell counts are additive, so per-batch partials fold
    * to exactly the batch sketch — asserted in StreamingSpec). */
  def cells(df: DataFrame, key: Column, width: Int = 509, depth: Int = 4)
      : DataFrame = {
    require(depth >= 1 && depth <= maxDepth, s"depth must be in [1, $maxDepth]")
    require(width >= 2, "width must be at least 2")
    val cs = (0 until depth).map(j =>
      struct(lit(j).as("j"), bucket(key, j, width).as("bucket")))
    df.select(explode(array(cs: _*)).as("cell"))
      .select(col("cell.j").as("j"), col("cell.bucket").as("bucket"))
  }

  /** Build the sketch: one (j, bucket, c) row per OCCUPIED cell (absent
    * cells are zero). Each input row lands in exactly `depth` cells; the
    * groupBy carries partial map-side sums, so the shuffle is bounded at
    * depth·width rows per map partition. */
  def sketch(df: DataFrame, key: Column, width: Int = 509, depth: Int = 4)
      : DataFrame =
    cells(df, key, width, depth)
      .groupBy("j", "bucket").agg(count(lit(1)).as("c"))

  /** Cell-wise merge of sketches built with the same (width, depth). */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("j", "bucket").agg(sum(col("c")).as("c"))

  /** Point estimates for every row of `keys`: min over depth rows of the
    * counter at that key's bucket. The sketch is at most depth·width
    * rows, so each depth row joins as a BROADCAST hash probe — the
    * estimate is a per-row map over `keys`, no shuffle, no explode.
    * Adds column `est`. */
  def estimate(sk: DataFrame, keys: DataFrame, key: Column,
      width: Int = 509, depth: Int = 4): DataFrame = {
    require(depth >= 1 && depth <= maxDepth, s"depth must be in [1, $maxDepth]")
    val probed = (0 until depth).foldLeft(keys) { (acc, j) =>
      val row = sk.where(col("j") === j)
        .select(col("bucket").as(s"__b$j"), col("c").as(s"__c$j"))
      acc.join(broadcast(row), bucket(key, j, width) === col(s"__b$j"), "left")
    }
    val perRow = (0 until depth).map(j => coalesce(col(s"__c$j"), lit(0L)))
    probed.withColumn("est", least(perRow: _*))
      .drop((0 until depth).flatMap(j => Seq(s"__b$j", s"__c$j")): _*)
  }
}
