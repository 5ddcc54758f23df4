package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard. Designed shuffle-minimal: every variant
  * reduces to (a) per-row signature computation at scan speed, then
  * (b) ONE groupBy/join on a signature key that is orders of magnitude
  * smaller than the corpus.
  */
object Dedup {

  /** Exact dedup on a content hash; keeps the smallest `keyCol` per group.
    * One PK-shuffle, map-side partial agg. */
  def exact(df: DataFrame, text: Column, keyCol: Column): DataFrame =
    df.groupBy(md5(text.cast("binary")).as("content_hash"))
      .agg(min(keyCol).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Deterministic 64-bit hash of a string with a seed — xxhash64 is
    * codegen'd and stable across executors/runs. */
  private def h64(c: Column, seed: Int): Column =
    xxhash64(lit(seed), c)

  /** MinHash signatures: for each of `numHashes` seeded hash functions,
    * the min hash over the doc's shingle set. Returns array<long>. */
  def minhashSignature(shingleSet: Column, numHashes: Int): Column =
    array((0 until numHashes).map { s =>
      array_min(transform(shingleSet, sh => h64(sh, s)))
    }: _*)

  /** MinHash + LSH banding: docs sharing any band bucket become candidate
    * pairs; candidates are verified with exact shingle-set Jaccard.
    *
    * Scale path: signatures are computed per-row; the only shuffles are
    * the explode→groupBy on (band, bucket-hash) — tiny keys — and the
    * verification join over candidates (≪ n²).
    *
    * @param docs (id, shingles) — shingles must be a deduplicated array.
    */
  def minhashLsh(docs: DataFrame, idCol: String, shinglesCol: String,
      numHashes: Int = 32, bands: Int = 8, threshold: Double = 0.6)
      : DataFrame = {
    val rows = bands // numHashes / rowsPerBand bands of rowsPerBand rows
    val rowsPerBand = numHashes / bands
    val sig = docs.select(col(idCol).as("id"), col(shinglesCol).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    // band key = hash of the band's slice of the signature
    val banded = sig.select(col("id"), col("sh"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over a token/shingle array: per-bit weighted vote of
    * per-token hashes. Pure per-row expression work. */
  def simhash(tokensCol: Column): Column = {
    // For each bit i: sign(sum over tokens of (bit i set ? +1 : -1))
    val hashes = transform(tokensCol, t => xxhash64(t))
    val bits = (0 until 64).map { i =>
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1) === 1, 1)
          .otherwise(-1))
      when(votes > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Near-dup pairs by SimHash: exact match on 4 16-bit bands (any band
    * equal → candidate; hamming ≤ maxHamming verified). */
  def simhashPairs(docs: DataFrame, idCol: String, tokensCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"),
      simhash(col(tokensCol)).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sig"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
    cand.withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard similarity pairs via a token-posting-list join —
    * the oracle-checkable exact counterpart of [[minhashLsh]]. Shuffles:
    * explode→join on shingle, then one groupBy on the pair key. */
  def jaccardPairs(docs: DataFrame, idCol: String, shinglesCol: String,
      threshold: Double): DataFrame = {
    val tok = docs
      .select(col(idCol).as("id"), explode(col(shinglesCol)).as("s"))
      .distinct()
    val sizes = tok.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = tok.as("a").join(tok.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("d1"), col("b.id").as("d2"))
      .agg(count(lit(1)).as("i"))
    val j = inter
      .join(sizes.as("sa"), col("d1") === col("sa.id"))
      .join(sizes.as("sb"), col("d2") === col("sb.id"))
      .select(col("d1"), col("d2"),
        (col("i").cast("double") /
          (col("sa.n") + col("sb.n") - col("i"))).as("jaccard"))
    j.where(col("jaccard") >= threshold)
  }
}
