package graft
// Reproducible generator of the plans/r13 physical-plan excerpts: the
// round-13 fused incremental verify and the count-min per-task pre-agg
// (batch twins of the streaming plans, sf0.001).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PlanProbe13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull).select(col("doc_id"), col("text"))
    println("===== countMinCells (round-13 pre-agg shape, batch twin of the stream plan) =====")
    println(graft.operators.TextAnalysis.countMinCells(docs, "text", 4, 1024)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    println("===== hllRegisters (unchanged Column shape, kept after revert) =====")
    val toks = docs.select(col("doc_id"),
      explode(split(lower(col("text")), "\\s+")).as("term"))
      .withColumn("source", lit("s"))
    println(graft.operators.TextAnalysis.hllRegisters(toks, col("source"), col("term"), 1024)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    println("===== fused incremental verify batch 2 (q_index_stream inner shape) =====")
    val idxDir = java.nio.file.Files.createTempDirectory("planprobe_idx").toString + "/idx"
    val b0 = docs.filter(pmod(col("doc_id"), lit(3L)) === 0L)
    val s0 = graft.operators.Dedup.incrementalNearDup(b0, idxDir, "text", "doc_id",
      16, 4, 42L, 1, 0.8)
    println(s0.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    s0.unpersist()
    println("===== fusedBucketVerify physical plan (banded ∪ pruned index → one exchange) =====")
    val banded1 = graft.operators.Dedup.bandedShingleRowsPublic(
      docs.filter(pmod(col("doc_id"), lit(3L)) === 1L), "text", "doc_id", 16, 4, 42L, 1)
    val idx1 = graft.sources.GraftTable.read(spark, idxDir)
      .select(col("__bucket"), col("__id"), col("__sh"))
    println(graft.operators.Dedup.fusedBucketVerifyPublic(banded1, Some(idx1), 0.8, 4096)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    val b1 = docs.filter(pmod(col("doc_id"), lit(3L)) === 1L)
    val s1 = graft.operators.Dedup.incrementalNearDup(b1, idxDir, "text", "doc_id",
      16, 4, 42L, 1, 0.8)
    println("===== survivors plan of batch 2 (anti-join against driver drop list) =====")
    println(s1.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
