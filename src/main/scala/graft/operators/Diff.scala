package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the relational core of a versioned table history
  * (reference: dump-dolt.rkt's Dolt exports version each day's table;
  * SURVEY scopes the subprocess choreography out of engine, but WHAT
  * changed between two versions is a query, and it lives here).
  *
  * One FULL OUTER join on the PK — co-locatable via bucketing at 100 TB
  * like every other PK join in the engine — then a single null-safe
  * struct comparison over the value columns classifies each key as
  * added / removed / changed; unchanged keys drop out. Emitting both
  * value tuples makes the diff REVERSIBLE: apply(old, diff) = new and
  * apply(new, reverse(diff)) = old, which is what an incremental
  * version store needs (OperatorsSpec asserts round-trip losslessness).
  */
object Diff {

  /** One row per PK whose value tuple differs between the snapshots:
    * (pk…, change ∈ added|removed|changed, old_<c>…, new_<c>…). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, pk: Seq[String])
      : DataFrame = {
    val vals = oldDf.columns.filterNot(pk.contains).toSeq
    require(newDf.columns.filterNot(pk.contains).toSeq == vals,
      "snapshots must share one schema")
    val o = vals.foldLeft(oldDf.withColumn("__in_old", lit(1))) { (d, c) =>
      d.withColumnRenamed(c, "old_" + c)
    }
    val n = vals.foldLeft(newDf.withColumn("__in_new", lit(1))) { (d, c) =>
      d.withColumnRenamed(c, "new_" + c)
    }
    val oldT = struct(vals.map(c => col("old_" + c)): _*)
    val newT = struct(vals.map(c => col("new_" + c)): _*)
    o.join(n, pk, "full_outer")
      .withColumn("change",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .otherwise("changed"))
      .where(col("__in_old").isNull || col("__in_new").isNull ||
        !(oldT <=> newT))
      .select((pk.map(col) :+ col("change")) ++
        vals.map(c => col("old_" + c)) ++ vals.map(c => col("new_" + c)): _*)
  }

  /** Snapshot diff SUMMARY — [[snapshotDiff]] folded to the release-
    * review dashboard row: row-level added/removed/changed/unchanged
    * counts plus a per-column change count (how many surviving keys
    * changed THAT column — the "one upstream job rewrote every price"
    * signal a row-level count buries). Null-safe comparisons
    * throughout (null→value and value→null both count as changes).
    * Scale shape: the same one bucketable PK full-outer join + one
    * combiner agg; output is 1 + |columns| rows.
    * Output: (metric, n) — rows_added / rows_removed / rows_changed /
    * rows_unchanged, then col_changed:<name> per value column in
    * schema order. */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame, pk: Seq[String])
      : DataFrame = {
    val vals = oldDf.columns.filterNot(pk.contains).toSeq
    require(newDf.columns.filterNot(pk.contains).toSeq == vals,
      "snapshots must share one schema")
    val o = vals.foldLeft(oldDf.withColumn("__in_old", lit(1))) { (d, c) =>
      d.withColumnRenamed(c, "old_" + c)
    }
    val n = vals.foldLeft(newDf.withColumn("__in_new", lit(1))) { (d, c) =>
      d.withColumnRenamed(c, "new_" + c)
    }
    val both = col("__in_old").isNotNull && col("__in_new").isNotNull
    val oldT = struct(vals.map(c => col("old_" + c)): _*)
    val newT = struct(vals.map(c => col("new_" + c)): _*)
    val aggs =
      sum(when(col("__in_old").isNull, 1L).otherwise(0L)).as("__a") +:
      sum(when(col("__in_new").isNull, 1L).otherwise(0L)).as("__r") +:
      sum(when(both && !(oldT <=> newT), 1L).otherwise(0L)).as("__c") +:
      sum(when(both && (oldT <=> newT), 1L).otherwise(0L)).as("__u") +:
      vals.map(c => sum(when(both &&
        !(col("old_" + c) <=> col("new_" + c)), 1L).otherwise(0L))
        .as("__col_" + c))
    val wide = o.join(n, pk, "full_outer").agg(aggs.head, aggs.tail: _*)
    val pairs =
      Seq("rows_added" -> "__a", "rows_removed" -> "__r",
        "rows_changed" -> "__c", "rows_unchanged" -> "__u") ++
      vals.map(c => s"col_changed:$c" -> s"__col_$c")
    wide.select(explode(array(pairs.map { case (m, c0) =>
        struct(lit(m).as("metric"), col(c0).as("n")) }: _*)).as("kv"))
      .select(col("kv.metric").as("metric"), col("kv.n").as("n"))
  }

  /** Replay a [[snapshotDiff]] onto the old snapshot: drop removed and
    * changed keys, append the new tuples of added and changed keys.
    * apply(old, diff(old, new)) ≡ new — the forward half of the
    * version-store contract. */
  def applyDiff(oldDf: DataFrame, diff: DataFrame, pk: Seq[String])
      : DataFrame = {
    val vals = oldDf.columns.filterNot(pk.contains).toSeq
    val gone = diff.where(col("change").isin("removed", "changed"))
      .select(pk.map(col): _*)
    val incoming = diff.where(col("change").isin("added", "changed"))
      .select(pk.map(col) ++ vals.map(c => col("new_" + c).as(c)): _*)
    oldDf.join(gone, pk, "left_anti").unionByName(incoming)
  }
}
