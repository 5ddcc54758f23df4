package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextAnalysis}
import graft.streaming.StreamingDedup

case class Doc(doc_id: Long, text: String)

/** Streaming near-dup novelty agrees with the batch LSH candidate set:
  * a doc is flagged iff it shares a band bucket with an earlier doc. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    Doc(1L, "the quick brown fox jumps over the lazy dog again and again"),
    Doc(2L, "completely different content about spark query engines at scale"),
    Doc(3L, "the quick brown fox jumps over the lazy dog again and again"),
    Doc(4L, "unrelated words entirely for this one document here now"),
    Doc(5L, "the quick brown fox jumps over the lazy dog again and again today"))

  test("streaming novelty flags exactly the batch LSH candidates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    mem.addData(docs.take(2): _*) // batch 1: docs 1,2
    val shingled = StreamingDedup.nearDupNovelty(
      mem.toDF().select($"doc_id",
        array_distinct(TextAnalysis.shingles($"text", 3)).as("sh")),
      "doc_id", "sh")
    val q = shingled.writeStream.format("memory").queryName("novelty")
      .outputMode("append").start()
    q.processAllAvailable()
    mem.addData(docs.drop(2): _*) // batch 2: docs 3,4,5 arrive later
    q.processAllAvailable()
    q.stop()

    val flagged = spark.sql(
      "SELECT docId FROM novelty GROUP BY docId HAVING max(CASE WHEN isFirst THEN 0 ELSE 1 END) = 1")
      .as[Long].collect().toSet

    // batch reference: candidate pairs on the same band keys; the later
    // (larger-id, matching arrival order) doc of each pair is flagged
    val banded = Dedup.bandKeys(docs.toDF().select($"doc_id",
        array_distinct(TextAnalysis.shingles($"text", 3)).as("sh")),
      "doc_id", "sh", 32, 8)
    val batchFlagged = banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.bucket" === $"b.bucket" &&
          $"a.id" < $"b.id")
      .select($"b.id").as[Long].collect().toSet

    assert(flagged == batchFlagged)
    assert(flagged.contains(3L)) // identical to doc 1 → must be flagged
    assert(!flagged.contains(2L) && !flagged.contains(4L))
  }

  test("replaying a batch flags the replayed docs as duplicates of state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    mem.addData(Doc(10L, docs.head.text))
    val out = StreamingDedup.nearDupNovelty(
      mem.toDF().select($"doc_id",
        array_distinct(TextAnalysis.shingles($"text", 3)).as("sh")),
      "doc_id", "sh")
    val q = out.writeStream.format("memory").queryName("novelty2")
      .outputMode("append").start()
    q.processAllAvailable()
    mem.addData(Doc(11L, docs.head.text)) // same content, new id
    q.processAllAvailable()
    q.stop()
    val rep = spark.sql(
      "SELECT DISTINCT firstId FROM novelty2 WHERE docId = 11 AND NOT isFirst")
      .as[Long].collect().toSet
    assert(rep == Set(10L)) // every bucket points at the retained doc 10
  }
}
