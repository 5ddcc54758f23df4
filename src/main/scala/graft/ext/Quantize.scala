package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding compression: int8 scalar quantization (the SQ8 stage of an
  * IVF-SQ index). Each dimension gets a linear [min, max] → [0, 255]
  * code-book from corpus statistics; vectors then quantize at scan
  * speed against the broadcast 64-row stats table — 4 bytes/dim becomes
  * 1 byte/dim, the difference between an index that fits executor
  * memory and one that doesn't at 100 TB.
  *
  * Determinism: the stats are exact float min/max (no arithmetic), and
  * the code is a single subtract + divide + floor in IEEE doubles —
  * bit-identical across engines, which is what makes x35
  * oracle-checkable with zero tolerance.
  */
object Quantize {

  /** Per-dimension (pos, mn, mx) corpus statistics; 1-based pos. */
  def dimStats(df: DataFrame, vecCol: Column): DataFrame =
    df.select(posexplode(vecCol).as(Seq("p", "v")))
      .groupBy((col("p") + 1).cast("long").as("pos"))
      .agg(min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"))

  /** (id, pos, code) int8 codes — one row per dimension. The quantizer
    * is `floor((v - mn) / ((mx - mn) / 255))` clamped to [0, 255]
    * (constant dimensions code to 0). The per-dim stats join is a
    * broadcast; quantization itself is a per-row map. */
  def scalarQuantize(df: DataFrame, idCol: String, vecCol: String)
      : DataFrame = {
    val stats = dimStats(df, col(vecCol))
    val expanded = df.select(col(idCol),
      posexplode(col(vecCol)).as(Seq("p", "v")))
      .select(col(idCol), (col("p") + 1).cast("long").as("pos"),
        col("v").cast("double").as("v"))
    expanded.join(broadcast(stats), Seq("pos"))
      .withColumn("code",
        when(col("mx") === col("mn"), lit(0L)).otherwise(
          greatest(lit(0L), least(lit(255L),
            floor((col("v") - col("mn")) / ((col("mx") - col("mn")) / 255.0))
              .cast("long")))))
      .select(col(idCol), col("pos"), col("code"))
  }

  /** Dequantized value for a code: the cell midpoint. */
  def dequantize(code: Column, mn: Column, mx: Column): Column =
    mn + (code.cast("double") + 0.5) * ((mx - mn) / 255.0)

  /** Per-slice SQ8 RECONSTRUCTION-ERROR audit: encode → decode every
    * vector and report each slice's squared-error profile — the
    * quantizer-health gate run before an IVF-SQ index serves a slice
    * (a source whose embeddings concentrate in a narrow band of a
    * dimension's [min, max] range reconstructs poorly, and nothing
    * else surfaces that).
    *
    * Determinism: encode/decode are the x35 IEEE chains (bit-identical
    * across engines); each vector's squared error folds LEFT-TO-RIGHT
    * over dimension order (both engines reduce lists head-to-tail),
    * is quantized ONCE to DECIMAL(28,12), and the per-slice mean is
    * an exact decimal sum with one boundary division (the x70
    * discipline). max_sse is a plain double max — order-free.
    *
    * Scale shape: one broadcast stats join + per-row map, one per-id
    * bounded fold (dims rows), one slice combiner agg.
    * Output: (slice, n_vecs, mean_sse, max_sse). */
  def reconstructionError(emb: DataFrame, idCol: String, vecCol: String,
      slices: DataFrame, sliceIdCol: String, sliceCol: String)
      : DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val stats = dimStats(emb, col(vecCol))
    val expanded = emb.select(col(idCol).as("__id"),
        posexplode(col(vecCol)).as(Seq("p", "v")))
      .select(col("__id"), (col("p") + 1).cast("long").as("pos"),
        col("v").cast("double").as("v"))
    val errs = expanded.join(broadcast(stats), Seq("pos"))
      .withColumn("code",
        when(col("mx") === col("mn"), lit(0L)).otherwise(
          greatest(lit(0L), least(lit(255L),
            floor((col("v") - col("mn")) / ((col("mx") - col("mn")) / 255.0))
              .cast("long")))))
      .withColumn("e",
        (col("v") - dequantize(col("code"), col("mn"), col("mx"))) *
          (col("v") - dequantize(col("code"), col("mn"), col("mx"))))
    val perVec = errs.groupBy("__id")
      .agg(sort_array(collect_list(struct(col("pos"), col("e")))).as("arr"))
      .select(col("__id"),
        aggregate(transform(col("arr"), x => x("e")), lit(0.0),
          (acc, x) => acc + x).cast(DecimalType(28, 12)).as("sse"))
    slices.select(col(sliceIdCol).as("__id"), col(sliceCol).as("slice"))
      .join(perVec, Seq("__id"))
      .groupBy("slice")
      .agg(count(lit(1)).as("n_vecs"),
        (sum(col("sse")).cast("double") /
          count(lit(1)).cast("double")).as("mean_sse"),
        max(col("sse").cast("double")).as("max_sse"))
  }
}
