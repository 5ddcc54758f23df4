package graft.ext

import org.apache.spark.sql.DataFrame

/** Session-scoped memo for DETERMINISTIC corpus-level artifacts that
  * more than one query legitimately shares — the
  * [[Pipeline.corpusPrepCached]] discipline as a reusable utility.
  *
  * Contract: the memoized computation must be a pure function of the
  * (cacheKey, args) pair — every operator here is deterministic (hash
  * orders, exact decimals, no RNG), so two queries asking for the same
  * artifact of the same snapshot get ONE materialization instead of
  * two full computations. `cacheKey` must identify the INPUT data
  * (e.g. the table directory + operator + parameters): the cache
  * cannot see through a DataFrame to its source, so a wrong key is a
  * wrong answer — key conservatively.
  *
  * The stored frame is localCheckpoint(eager)-ed: reuse costs a block
  * read, never a recompute, and the blocks die with the session.
  * Keyed by applicationId so sessions never see each other's blocks.
  * Bounded: one entry per distinct (corpus, operator, args) a session
  * touches — artifacts here are ids+small-columns tables (pair lists,
  * manifests), not corpora. */
object Memo {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()

  /** Materialize `compute` once per (session, cacheKey); later calls
    * return the checkpointed frame verbatim. */
  def cached(spark: org.apache.spark.sql.SparkSession, cacheKey: String)(
      compute: => DataFrame): DataFrame =
    cache.computeIfAbsent((spark.sparkContext.applicationId, cacheKey),
      _ => compute.localCheckpoint(true))
}
