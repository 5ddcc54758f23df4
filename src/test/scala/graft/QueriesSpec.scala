package graft

/** Smoke over the whole registered corpus at sf0.001: every query plans,
  * executes, and returns a schema; oracle-backed queries return rows.
  * (Value-level correctness is the driver's DuckDB gate — tools/check.py.) */
class QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every registered query executes at sf0.001") {
    val counts = Queries.all.map { case (name, q) =>
      name -> q(spark, dir).count()
    }
    val empties = counts.filter(_._2 == 0).keySet
    // hash/LSH candidate queries may legitimately be empty at tiny scale;
    // everything else must produce rows
    val allowedEmpty = Set("q16_anti_fk", "q24_set_ops", "x02_ngram_jaccard",
      "x03_minhash_lsh", "x04_simhash", "x05_embed_neardup", "x07_lsh_ann")
    assert((empties -- allowedEmpty).isEmpty,
      s"unexpectedly empty: ${empties -- allowedEmpty}")
  }

  test("queries and oracles stay in sync") {
    assert(Oracles.all.keySet.subsetOf(Queries.all.keySet))
    val noOracle = Queries.all.keySet -- Oracles.all.keySet
    assert(noOracle.isEmpty,
      s"queries silently missing an oracle: $noOracle")
  }

  test("entry returns rows (t1 smoke shape)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
