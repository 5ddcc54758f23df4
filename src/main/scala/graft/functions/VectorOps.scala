package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` / `array<double>` columns.
  * The dot product is a custom codegen'd Catalyst expression
  * ([[graft.functions.expressions.DotProduct]]) — a tight primitive loop
  * with NO per-row array allocation, unlike a zip_with/aggregate HOF
  * chain. Accumulation is a left-to-right fold in element order, which
  * keeps results bit-stable across engines (matches DuckDB's
  * list_dot_product) and across re-partitioning.
  */
object VectorOps {

  import graft.functions.expressions.VectorExpressions

  /** Element-exact widening; float→double is value-preserving. */
  def toDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    VectorExpressions.dotProduct(toDouble(a), toDouble(b))

  def norm2(a: Column): Column = {
    val ad = toDouble(a)
    VectorExpressions.dotProduct(ad, ad)
  }

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Cosine when the two L2 norms are precomputed columns (avoids
    * recomputing norms inside an O(n²) pairwise join). */
  def cosineWithNorms(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (sqrt(normA) * sqrt(normB))
}
