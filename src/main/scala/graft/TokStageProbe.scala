package graft
// Round-13 A/B probe for the doremi/moore_lewis shared-token-stage
// question (r12 "not yet optimized" #3): is staging the exploded token
// table once cheaper than re-exploding the corpus text per LM pass?
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TokStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/scale100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[tok] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    t("warm-scan")(docs.count())
    def toks = docs.select(col("doc_id"),
      explode(split(lower(col("text")), "\\s+")).as("term"))
    // A: one explode pass, consumed fully (noop sink, guide §1.4)
    (1 to 2).foreach { i =>
      t(s"explode-noop-$i")(toks.write.format("noop").mode("overwrite").save())
    }
    // B: stage write (one explode + parquet write)
    val staged = t("stage-write")(graft.core.Stage.materialize(toks, "tokprobe"))
    // C: staged read, consumed fully
    (1 to 2).foreach { i =>
      t(s"staged-read-noop-$i")(staged.write.format("noop").mode("overwrite").save())
    }
    // model-shaped consumers of both forms (what the LM passes DO):
    t("explode-groupBy-term")(toks.groupBy("term").count()
      .write.format("noop").mode("overwrite").save())
    t("staged-groupBy-term")(staged.groupBy("term").count()
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
