package graft

import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Incremental (streaming) MinHash near-dup dedup: each batch deduped
  * against itself AND the persistent signature index of every previously
  * kept doc — survivors only, keep-first-by-id. */
class IncrementalDedupSpec extends GraftSpec {
  import spark.implicits._

  // 20 distinct words; near-dups append one word (3-gram Jaccard 18/19)
  private def doc(tag: String): String =
    (0 until 20).map(i => s"${tag}w$i").mkString(" ")
  private def nearDup(tag: String): String = doc(tag) + s" ${tag}extra"

  private def dedupStep(batch: Seq[(Long, String)], indexDir: String) =
    Dedup.incrementalNearDup(
      batch.toDF("doc_id", "text"), indexDir, "text", "doc_id",
      numHashes = 16, bands = 4, seed = 42L, shingleN = 3, threshold = 0.8)

  test("batch 2 drops near-dups of batch-1 survivors via the index") {
    val indexDir = Files.createTempDirectory("nd_idx").toString + "/idx"
    // batch 1: A, near-dup-of-A (dropped, keep-first), distinct C
    val s1 = dedupStep(Seq(
      (1L, doc("a")), (2L, nearDup("a")), (3L, doc("c"))), indexDir)
    assert(s1.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    s1.unpersist()
    // batch 2: near-dup of A (index hit), new E, near-dup of E (in-batch)
    val s2 = dedupStep(Seq(
      (4L, nearDup("a")), (5L, doc("e")), (6L, nearDup("e"))), indexDir)
    assert(s2.select("doc_id").as[Long].collect().sorted.toSeq == Seq(5L))
    s2.unpersist()
    // batch 3: near-dup of E (index hit from batch 2), exact re-send of C
    val s3 = dedupStep(Seq((7L, nearDup("e")), (8L, doc("c"))), indexDir)
    assert(s3.select("doc_id").as[Long].collect().isEmpty)
    s3.unpersist()
  }

  test("poisoned in-batch cluster: ALL members drop when one matches the index") {
    val indexDir = Files.createTempDirectory("nd_poison").toString + "/idx"
    dedupStep(Seq((1L, doc("p"))), indexDir).unpersist()
    // 10 and 11 are near-dups of each other AND of indexed doc 1: the
    // min-id member matching the index must not rescue the other
    val s = dedupStep(Seq((10L, nearDup("p")), (11L, nearDup("p"))), indexDir)
    assert(s.select("doc_id").as[Long].collect().isEmpty)
    s.unpersist()
  }

  test("nearDupStream end-to-end over two microbatches") {
    val base = Files.createTempDirectory("nd_stream").toString
    val (indexDir, survivorDir, ckpt) =
      (s"$base/idx", s"$base/out", s"$base/ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val query = Dedup.nearDupStream(
      mem.toDF().toDF("doc_id", "text"), indexDir, survivorDir, ckpt,
      "text", "doc_id", numHashes = 16, bands = 4, seed = 42L,
      shingleN = 3, threshold = 0.8)
    try {
      mem.addData(Seq((1L, doc("a")), (2L, nearDup("a")), (3L, doc("c"))))
      query.processAllAvailable()
      mem.addData(Seq((4L, nearDup("a")), (5L, doc("e"))))
      query.processAllAvailable()
      val kept = spark.read.parquet(survivorDir)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(kept == Seq(1L, 3L, 5L))
    } finally query.stop()
  }
}
