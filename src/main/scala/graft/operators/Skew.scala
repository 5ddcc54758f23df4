package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys. First line of defense is AQE's skew-join
  * splitting (on in the driver sessions); for aggregations over keys with
  * pathological skew (a handful of symbols carrying most of a day's
  * options, one stopword-shingle posting list, …) this two-stage salted
  * aggregate bounds any single reducer's input to ~1/salt of the hot key.
  *
  * Usable for any algebraic aggregate (sum/count/min/max): partials are
  * computed per (key, salt) then merged per key — two small shuffles
  * instead of one skewed one.
  */
object Skew {

  /** Salted equi-join for skewed LARGE×MEDIUM joins — the technique for
    * when the hot side is too big for one reducer AND the other side is
    * too big to broadcast: the skewed side scatters each row to one of
    * `salt` sub-keys, the other side REPLICATES each row to all `salt`
    * sub-keys, and the join runs on (keys, salt) — every hot key's work
    * spreads over `salt` reducers at the cost of replicating the right
    * side salt×. Inner and left_outer preserve exact join semantics
    * (each left row carries exactly one salt value, each right row
    * meets it exactly once).
    *
    * The salt is derived from the FULL row content, never from
    * monotonically_increasing_id or rand: a join key must be
    * deterministic under recomputation. With a nondeterministic salt, a
    * shuffle-fetch-failure retry can recompute a map task and assign a
    * row a different salt than the copy a finished reducer already
    * consumed — duplicating or losing rows. Content-hashing makes the
    * retry reproduce identical salts (rows identical in every column
    * share a salt, which affects distribution only, never
    * correctness). Columns of MapType are excluded from the hash (Spark
    * forbids hashing maps); a row set whose only non-key columns are
    * maps falls back to hashing the keys alone — correct, but then a
    * single hot key occupies one salt bucket, so pass distinguishing
    * columns in that case.
    *
    * AQE's skew-join split is the first line of defense; this is the
    * explicit form for when the skew is known and stable (a stopword
    * posting list, one index-dominating symbol) or AQE's post-shuffle
    * view cannot see it.
    *
    * `saltOn` (optional): columns to derive the salt from, defaulting to
    * all hashable columns. LOW-ENTROPY ROW CONTENT ⇒ LOW-ENTROPY SALT:
    * rows identical in every hashed column share a salt, so a
    * duplicate-heavy hot key — counting `(key, 1)` event rows is exactly
    * the salted-agg use case — lands on ONE reducer and silently defeats
    * the mitigation. Callers with a stable unique id should pass it
    * (`saltOn = Seq(col("event_id"))`); the salt stays deterministic
    * under recomputation because the id is row content, not
    * `monotonically_increasing_id`/`rand` state. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      salt: Int, joinType: String = "inner",
      saltOn: Seq[Column] = Nil): DataFrame = {
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salted join preserves semantics for inner/left joins, not $joinType")
    val l = skewed.withColumn("__salt", saltFor(skewed, salt, saltOn))
    val r = other.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Deterministic per-row salt in [0, salt): hash of `saltOn` if given,
    * else of every hashable (non-map) column — either way a pure
    * function of row content, so recomputation of a lost partition
    * reproduces the same salt assignment bit-for-bit. */
  private[graft] def saltFor(df: DataFrame, salt: Int,
      saltOn: Seq[Column]): Column = {
    if (saltOn.nonEmpty) pmod(hash(saltOn: _*), lit(salt))
    else {
      val hashable = df.schema.fields
        .filterNot(f => containsMap(f.dataType)).map(f => col(f.name))
      require(hashable.nonEmpty, "no hashable (non-map) columns to salt on")
      pmod(hash(hashable: _*), lit(salt))
    }
  }

  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case a: org.apache.spark.sql.types.ArrayType => containsMap(a.elementType)
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.exists(f => containsMap(f.dataType))
      case _ => false
    }

  /** Two-stage salted sum/count aggregation.
    *
    * @param aggs (inputColumn, partialAgg, mergeAgg, outName) — e.g.
    *             (col("v"), sum _, sum _, "sum_v").
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salt: Int,
      aggs: Seq[(Column, Column => Column, Column => Column, String)],
      saltOn: Seq[Column] = Nil): DataFrame = {
    val salted = df.withColumn("__salt", saltFor(df, salt, saltOn))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggs.head._2(aggs.head._1).as(s"__p0"),
        aggs.tail.zipWithIndex.map { case ((c, p, _, _), i) =>
          p(c).as(s"__p${i + 1}")
        }: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(aggs.head._3(col("__p0")).as(aggs.head._4),
        aggs.tail.zipWithIndex.map { case ((_, _, m, n), i) =>
          m(col(s"__p${i + 1}")).as(n)
        }: _*)
  }
}
