package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-up data generator for scaling measurements: replicates the driver's
 * sf0.1 tables N× with disjoint key ranges so joins keep constant fan-out
 * and dedup/ANN workloads scale linearly instead of quadratically:
 *
 *  - every key/id column is offset by copy × (max+1);
 *  - document text gets a per-copy token suffix (copies are NOT near-dups
 *    of each other, but the near-dup structure WITHIN a copy is preserved
 *    exactly — token-level edits rewrite every shingle);
 *  - embeddings get a per-copy Rademacher sign flip (preserves all
 *    pairwise cosines within a copy, decorrelates across copies);
 *  - region/nation stay fixed (dimension tables don't grow with fact data).
 *
 * Usage: runMain graft.ScaleData <srcDir> <outDir> <factor>
 */
object ScaleData {

  val keyCols: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "region" -> Nil,
    "nation" -> Nil)

  /** N disjoint-key copies of one table (see object doc for the per-table
    * content transforms). factor is ignored for key-less dimension tables.
    * Copies come from ONE exploded projection (row × sequence(0, N-1)),
    * not an N-way union: a 1000-branch union is a Catalyst plan Spark
    * chokes on, while the explode is a single scan at any factor. */
  /** Text decorrelation modes for the `documents` copies:
    *  - `suffix` (default): per-copy token suffix — rewrites every token,
    *    so the corpus VOCABULARY grows linearly with the factor. That is
    *    the worst case for every operator whose cost tracks distinct-term
    *    cardinality (novelty, LM/ppl, span hot sets, count-min
    *    candidates) — real corpora grow vocabulary sublinearly.
    *  - `permute`: per-copy VOCABULARY permutation — each copy maps token
    *    w to the token at (rank(w) + copy) mod V of the source vocab. A
    *    bijection on tokens, so every within-copy shingle/near-dup
    *    relation is preserved EXACTLY (same reason the suffix mode works)
    *    while copies of the same doc share ~no shingles — and the
    *    vocabulary is the source's, fixed at any factor: the realistic
    *    text-op scaling regime. Caveat: the bijection is on raw
    *    space-split tokens; ops that case-fold see an induced map that is
    *    only a bijection when the source vocab is case-normalized (true
    *    for the synthetic corpus). */
  def replicate(df: DataFrame, table: String, keys: Seq[String],
                factor: Int, textMode: String = "suffix"): DataFrame = {
    require(textMode == "suffix" || textMode == "permute",
      s"unknown text mode '$textMode'")
    val copies = if (keys.isEmpty) 1 else factor
    if (copies == 1) return df
    val steps: Map[String, Long] = keys.map { k =>
      k -> (df.agg(max(col(k).cast("long"))).head().getLong(0) + 1L)
    }.toMap
    var c = df.withColumn("__copy",
      explode(sequence(lit(0), lit(copies - 1))))
    keys.foreach { k =>
      c = c.withColumn(k,
        (col(k) + col("__copy").cast("long") * steps(k)).cast(df.schema(k).dataType))
    }
    if (table == "documents" && textMode == "suffix")
      c = c.withColumn("text", when(col("__copy") === 0, col("text"))
        .otherwise(array_join(transform(split(col("text"), " "),
          w => concat(w, lit("_"), col("__copy").cast("string"))), " ")))
    if (table == "documents" && textMode == "permute") {
      val spark = df.sparkSession
      // source vocabulary in deterministic order — driver-collected with a
      // guard (the generator runs on sf-scale sources; the scaled corpora
      // it writes never re-enter here)
      val vocab = df.select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "").distinct().orderBy("w")
        .limit(2000001).collect().map(_.getString(0))
      require(vocab.length <= 2000000,
        "permute mode collects the source vocabulary to the driver; " +
          "source vocab exceeds 2M tokens — use suffix mode")
      val bc = spark.sparkContext.broadcast(
        (vocab, vocab.zipWithIndex.toMap))
      val permUdf = udf { (text: String, copy: Int) =>
        val (v, idx) = bc.value
        val vlen = v.length
        text.split(" ", -1).map { w =>
          idx.get(w) match {
            case Some(r) => v((r + copy % vlen) % vlen)
            case None => w // out-of-vocab (empty runs) pass through
          }
        }.mkString(" ")
      }
      c = c.withColumn("text", when(col("__copy") === 0, col("text"))
        .otherwise(permUdf(col("text"), col("__copy"))))
    }
    if (table == "embeddings")
      // per-copy Rademacher signs: dot(a∘s, b∘s) = dot(a, b), so all
      // within-copy cosines are preserved bit-for-bit while copies
      // decorrelate; valid for any factor (a rotation would need
      // factor < dim)
      c = c.withColumn("embedding", when(col("__copy") === 0, col("embedding"))
        .otherwise(expr(
          "transform(embedding, (x, j) -> CAST(x * (1 - 2 * pmod(hash(__copy, j), 2)) AS FLOAT))")))
    c.drop("__copy")
  }

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args.take(3)
    val factor = factorS.toInt
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optional 4th arg: comma-list restricting the tables (big-factor runs
    // only need the tables their target queries read); optional 5th arg:
    // documents text mode, suffix (default) | permute (vocab-fixed)
    val tables = args.lift(3).map(_.split(",").map(_.trim).toSet)
    val textMode = args.lift(4).getOrElse("suffix")
    keyCols.filter { case (t, _) => tables.forall(_.contains(t)) }
      .foreach { case (table, keys) =>
        val df = spark.read.parquet(s"$src/$table.parquet")
        // The exploded projection inherits the SOURCE's partitioning (one
        // small file -> ONE task -> one output file), which would leave
        // downstream scans of sub-128MB tables single-partition — a 7x
        // under-read of e.g. 100x documents. Repartition the SMALL source
        // BEFORE the explode (a 100k-row shuffle), so generation runs
        // `parts` writer tasks in parallel and the layout parallelizes
        // like the corpus it stands in for — repartitioning AFTER the
        // explode would shuffle the full generated volume through the
        // one source task (measured: a 42 GB single-threaded shuffle at
        // factor 1000 before this was moved).
        val parts = if (keys.isEmpty) 1 else math.min(256, math.max(32, factor))
        replicate(df.repartition(parts), table, keys, factor, textMode)
          .write.mode("overwrite").parquet(s"$out/$table.parquet")
        println(s"[scale] $table x${if (keys.isEmpty) 1 else factor} -> $out/$table.parquet ($parts files)")
      }
    spark.stop()
  }
}
