package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` / `array<double>` columns,
  * built on codegen'd higher-order functions. Accumulation is a
  * left-to-right fold in element order, which keeps results bit-stable
  * across engines and across re-partitioning (array-local, no shuffle
  * order dependence).
  */
object VectorOps {

  /** Element-exact widening; float→double is value-preserving. */
  def toDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = {
    val ad = toDouble(a)
    aggregate(zip_with(ad, ad, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  }

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Cosine when the two L2 norms are precomputed columns (avoids
    * recomputing norms inside an O(n²) pairwise join). */
  def cosineWithNorms(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (sqrt(normA) * sqrt(normB))
}
