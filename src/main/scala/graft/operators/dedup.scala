package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deduplication suite for large-scale training-data pipelines. Not present
 * in the reference (whose largest corpus is 38.8k grocery rows); designed
 * for the 100 TB documents case: every stage is hash-partition parallel,
 * candidate generation is LSH-banded so no O(n^2) pair enumeration ever
 * materializes, and cluster resolution is iterative min-id propagation
 * (no driver-sized state).
 *
 * All hashes derive from md5 (not xxhash) so every step has an exact
 * DuckDB oracle: h(s) = first 15 hex digits of md5(s) as a 60-bit int,
 * then universal hashing (a*h + b) mod p over p = 2^31 - 1.
 */
object Dedup {

  val P: Long = 2147483647L // 2^31 - 1, keeps a*(h%p)+b inside a long

  /** 60-bit integer from md5 — identical in Spark and DuckDB. */
  def md5Long(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Deterministic universal-hash parameters for k hash functions. */
  def hashParams(k: Int, seed: Long): Array[(Long, Long)] = {
    val rng = new java.util.Random(seed)
    Array.fill(k)((math.abs(rng.nextLong()) % (P - 1) + 1, math.abs(rng.nextLong()) % P))
  }

  /** Distinct lowercase whitespace tokens of a text column. */
  def tokens(c: Column): Column = array_distinct(split(lower(c), "\\s+"))

  /** Word n-gram shingles (space-joined), distinct. */
  def shingles(c: Column, n: Int): Column = {
    if (n == 1) tokens(c)
    else {
      val words = split(lower(c), "\\s+")
      val count = greatest(size(words) - (n - 1), lit(0))
      array_distinct(transform(sequence(lit(0), count - 1), i =>
        concat_ws(" ", transform(sequence(i, i + (n - 1)), j => element_at(words, j + 1)))))
    }
  }

  // ---------------------------------------------------------------- exact

  /**
   * Exact dedup: group by a (possibly normalized) content key, keep the
   * row with the smallest id. One shuffle; at scale the groupBy is a
   * partial-aggregated hash agg on the key's hash.
   */
  def exact(df: DataFrame, keyCol: Column, idCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  // -------------------------------------------------------------- minhash

  /** k-function minhash signature over a distinct-token array column. */
  def minhashSignature(tok: Column, k: Int, seed: Long): Column = {
    val params = hashParams(k, seed)
    array(params.map { case (a, b) =>
      array_min(transform(tok, t =>
        (lit(a) * (md5Long(t) % P) + lit(b)) % P))
    }: _*)
  }

  /**
   * LSH candidate pairs: signatures cut into `bands` bands; docs sharing
   * any band signature become a candidate pair. The band groupBy is the
   * only shuffle; within-bucket pairing explodes only bucket-local ids
   * (buckets are small when bands*rows is sized to the corpus).
   */
  def minhashCandidatePairs(df: DataFrame, textCol: String, idCol: String,
                            numHashes: Int, bands: Int, seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val sig = minhashSignature(tokens(col(textCol)), numHashes, seed)
    val banded = df
      .select(col(idCol).as("__id"), sig.as("__sig"))
      .select(col("__id"), posexplode(
        array((0 until bands).map(b =>
          concat_ws("_", (0 until rows).map(r => element_at(col("__sig"), b * rows + r + 1)): _*)
        ): _*)).as(Seq("__band", "__bsig")))
    banded.as("l").join(banded.as("r"),
        col("l.__band") === col("r.__band") && col("l.__bsig") === col("r.__bsig") &&
          col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"))
      .distinct()
  }

  /**
   * Duplicate-cluster resolution: iterative min-id label propagation over
   * the candidate-pair edge list (distributed connected components —
   * each round is one join + one min-aggregate; converges in
   * O(log(diameter)) rounds). Returns (id, cluster_id = min id reachable).
   */
  def clusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a"), col("id_b"))
      .union(pairs.select(col("id_b"), col("id_a")))
      .toDF("src", "dst").cache()
    var labels = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
      .withColumn("cluster_id", col("id"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), col("cluster_id"))
        .union(labels.select(col("id"), col("cluster_id")))
        .groupBy("id").agg(min("cluster_id").as("cluster_id"))
      val changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.cluster_id") =!= col("o.cluster_id")).limit(1).count()
      labels = next.cache()
      converged = changed == 0
      iter += 1
    }
    labels
  }

  // -------------------------------------------------------------- simhash

  /**
   * SimHash document fingerprint: each token votes +1/-1 per bit of its
   * md5-derived hash; the sign of the per-bit sum forms the fingerprint.
   * Pure expressions (explode + groupBy + bit fold) — near-dup docs land
   * on fingerprints within small Hamming distance.
   */
  def simhash(df: DataFrame, textCol: String, idCol: String, bits: Int = 64): DataFrame = {
    require(bits <= 60, "md5Long carries 60 bits") // 64-bit variant would need 16 more hex digits
    val exploded = df.select(col(idCol), explode(tokens(col(textCol))).as("__t"))
      .withColumn("__h", md5Long(col("__t")))
    val bitSums = (0 until bits).map(j =>
      sum(shiftright(col("__h"), j) % 2 * 2 - 1).as(s"__b_$j"))
    val agged = exploded.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until bits).map(j =>
      when(col(s"__b_$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _)
    agged.select(col(idCol), fp.as("simhash"))
  }

  /** Hamming distance between two simhash fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ------------------------------------------------------- n-gram jaccard

  /**
   * N-gram Jaccard similarity for candidate pairs: |A ∩ B| / |A ∪ B| over
   * distinct word n-grams. Used as the exact verify pass after LSH
   * candidate generation (broadcastable expression form, no UDF).
   */
  def ngramJaccard(pairs: DataFrame, leftText: Column, rightText: Column,
                   n: Int): Column = {
    val a = shingles(leftText, n); val b = shingles(rightText, n)
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    val union = size(array_union(a, b)).cast(DoubleType)
    when(union > 0, inter / union).otherwise(lit(0.0))
  }
}
