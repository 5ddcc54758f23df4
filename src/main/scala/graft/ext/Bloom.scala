package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Two-tier set membership for 100 TB semi-joins: a Bloom filter of the
  * small side's 64-bit key hashes gates the big side AT SCAN SPEED
  * (megabytes of bits embedded in the plan), and only the surviving
  * sliver reaches the exact verification join. No false negatives, so
  * gate + exact-verify ≡ exact — the result is byte-identical to the
  * ungated join (the x42 oracle is exactly x33's), only the work
  * changes: when the exact small side is too big to broadcast, its
  * bloom still is, and the post-gate shuffle carries ~fpp of the corpus
  * instead of all of it.
  *
  * Uses Spark's own sketch (`df.stat.bloomFilter` to build,
  * [[BloomFilterMightContain]] to probe — the expression pair behind
  * AQE runtime filters) over `xxhash64` of the key, so the probe is a
  * codegen'd bit test.
  */
object Bloom {

  /** Serialized Bloom filter over `xxhash64(key)` of `df`. */
  def buildHashed(df: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val bf = df.select(xxhash64(key).as("__h")).stat
      .bloomFilter("__h", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Scan-speed membership probe against a [[buildHashed]] filter: true
    * for every present key, true with probability ≈fpp for absent ones
    * — ALWAYS follow with an exact verify when exactness matters. */
  def mightContain(bloom: Array[Byte], key: Column): Column = {
    val b = org.apache.spark.sql.graft.Bridge
    b.column(BloomFilterMightContain(Literal(bloom, BinaryType),
      b.expression(xxhash64(key))))
  }
}
