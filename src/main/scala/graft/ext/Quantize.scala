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
}
