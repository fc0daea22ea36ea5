package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Deterministic, engine-portable sampling for training-data pipelines.
 *
 * `sample()`/RNG-based sampling is irreproducible across engines, runs,
 * and repartitions; pipelines that must be re-runnable (and auditable —
 * "which rows were in the training set?") sample by a content hash
 * instead: a row is kept iff md5(id) mod 10000 falls under the threshold.
 * Same rows selected at any scale, any partitioning, any engine (the
 * DuckDB oracle replays the identical predicate). Skew-free as long as
 * ids are unique, codegen'd end-to-end, and pushes down past column
 * pruning like any other filter.
 */
object Sampling {

  /** Engine-portable hash bucket in [0, buckets): Spark
    * `conv(substring(md5(x),1,15),16,10)` ≡ DuckDB
    * `('0x' || substr(md5(x),1,15))::BIGINT` (60-bit, positive). */
  def bucket(idCol: Column, buckets: Int = 10000): Column =
    pmod(conv(substring(md5(idCol.cast("string")), 1, 15), 16, 10)
      .cast(LongType), lit(buckets.toLong))

  /** Keep ~`fraction` of rows, deterministically by id. */
  def hashSample(df: DataFrame, idCol: Column, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    df.filter(bucket(idCol) < lit((fraction * 10000).round))
  }

  /**
   * Temperature-based mixture sampling (the multilingual-pretraining
   * upsampler of Conneau & Lample 2019 / XLM-R): groups are allocated a
   * share of `targetN` rows proportional to count^(1/temperature) — T>1
   * flattens the natural distribution, boosting low-resource groups —
   * then each group keeps its share via the deterministic md5 gate of
   * [[hashSample]].
   *
   * Engine-exact by construction at the default T=2: group weights are
   * floor(sqrt(count)) — IEEE sqrt is correctly rounded, so the floor
   * replays identically in any engine — and per-group thresholds are
   * pure BIGINT arithmetic `min(10000, 10000·targetN·w / (W·count))`
   * (integer division). Other temperatures go through pow, whose
   * last-ulp is implementation-defined; they stay deterministic within
   * one engine but are not oracle-guaranteed.
   *
   * Scale shape: one bounded groupBy-count collect (`maxGroups`-guarded,
   * the takeStratified pattern — group cardinality is a mixture knob,
   * never data-sized), thresholds ride back as a broadcast join of a
   * #groups-row literal table, and the keep filter is a codegen'd
   * projection — the data itself never shuffles.
   */
  def temperatureSample(df: DataFrame, groupCol: Column, idCol: Column,
                        targetN: Long, temperature: Double = 2.0,
                        maxGroups: Int = 100000): DataFrame = {
    require(targetN > 0, "targetN must be positive")
    require(temperature > 0, "temperature must be positive")
    val spark = df.sparkSession
    val outCols = df.columns.map(col)
    val agg = df.groupBy(groupCol.as("__g")).agg(count(lit(1)).as("__c"))
    val rows = agg.limit(maxGroups + 1).collect()
    require(rows.length <= maxGroups,
      s"temperatureSample saw more than $maxGroups groups — the group " +
        "column is too fine-grained for per-group allocation")
    def weight(c: Long): Long =
      if (temperature == 2.0) math.floor(math.sqrt(c.toDouble)).toLong
      else math.floor(math.pow(c.toDouble, 1.0 / temperature)).toLong
    val wTot = rows.map(r => weight(r.getLong(1))).sum
    require(wTot > 0, "empty input")
    val thrRows = rows.map { r =>
      val c = r.getLong(1); val w = weight(c)
      org.apache.spark.sql.Row(r.get(0),
        math.min(10000L, 10000L * targetN * w / (wTot * c)))
    }
    val thrDf = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(thrRows: _*)),
      org.apache.spark.sql.types.StructType(Seq(
        agg.schema.fields(0).copy(name = "__tg"),
        org.apache.spark.sql.types.StructField("__thr", LongType, nullable = false))))
    df.join(broadcast(thrDf), groupCol === col("__tg"))
      .filter(bucket(idCol) < col("__thr"))
      .select(outCols: _*)
  }

  /** Deterministic train/val/test split label: the id's hash bucket in
    * [0,100) maps to train (< trainPct), val (< trainPct+valPct), test
    * (rest). The split is a pure projection — reproducible across
    * engines, runs, partitionings and scale, auditable row by row, and
    * disjoint by construction (one bucket, three ranges). Stratify by
    * prefixing the id with the stratum if per-stratum exactness matters
    * beyond hash uniformity. */
  def hashSplit(idCol: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split percentages: train=$trainPct val=$valPct")
    val b = bucket(idCol, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Stratified variant: per-stratum sampling fractions (data-mixture
    * weighting over a source/language column), `default` elsewhere. */
  def stratifiedHashSample(df: DataFrame, strataCol: Column, idCol: Column,
                           fractions: Map[String, Double],
                           default: Double = 0.0): DataFrame = {
    val threshold = fractions.foldLeft(lit((default * 10000).round)) {
      case (acc, (k, f)) => when(strataCol === k, lit((f * 10000).round)).otherwise(acc)
    }
    df.filter(bucket(idCol) < threshold)
  }

  /**
   * Weighted up/down-sampling (epoch weighting in a data mixture): each
   * row is emitted floor(w) times plus one more with probability frac(w),
   * decided by the row's hash bucket — deterministic at any scale or
   * partitioning, unlike RNG resampling. Appends `copy_id` (0-based) so
   * replicas stay distinct downstream. w < 1 down-samples, w > 1
   * up-samples; generator-shaped (explode), so output size follows the
   * weights with no driver involvement.
   */
  def weightedResample(df: DataFrame, idCol: Column, weight: Column): DataFrame = {
    val copies = floor(weight).cast(LongType) +
      when(bucket(idCol) < (weight - floor(weight)) * 10000, 1L).otherwise(0L)
    df.withColumn("copy_id",
      explode(when(copies > 0, sequence(lit(0L), copies - 1))
        .otherwise(array().cast("array<bigint>"))))
  }

  /**
   * Weighted sample WITHOUT replacement of exactly min(n, rows) rows,
   * inclusion probability ∝ `weight` — the Efraimidis–Spirakis (2006)
   * reservoir rule (key = u^(1/w), keep the n largest, here in log form
   * score = ln(u)/w) with the uniform u derived from the id's md5 hash
   * instead of an RNG: the SAME rows win at any scale, partitioning, or
   * engine, and the sample is re-derivable row by row. Rows with
   * non-positive or null weight are excluded (their inclusion
   * probability is zero). Ties (hash-exact score collisions) break by
   * id. Output: input columns + `sample_score` (rounded 6).
   *
   * Scale shape (100 TB): score is a pure projection; the take is a
   * TakeOrderedAndProject — per-partition n-row heaps, ≤ n·partitions
   * rows to the driver-side final merge, no global sort, no window.
   */
  def weightedTake(df: DataFrame, idCol: Column, weight: Column, n: Int): DataFrame = {
    require(n > 0, s"n must be positive (got $n)")
    // u in (0, 1]: (60-bit md5 mod P) + 1 over P — engine-exact doubles
    val u = (conv(substring(md5(idCol.cast("string")), 1, 15), 16, 10)
      .cast(LongType) % Dedup.P + 1L).cast("double") / lit(Dedup.P.toDouble)
    val score = log(u) / weight
    df.filter(weight.isNotNull && weight > 0)
      .withColumn("sample_score", score)
      .orderBy(col("sample_score").desc, idCol)
      .limit(n)
      .withColumn("sample_score", round(col("sample_score"), 6))
  }

  /**
   * Deterministic stratified take-n: EXACTLY min(n, |stratum|) rows per
   * stratum — the smallest-hash n by (bucket, id) — for fixed-size eval
   * or calibration sets. Same-rows-at-any-scale reproducibility as
   * [[hashSample]], but with an exact count instead of a fraction.
   *
   * Scale shape: a per-stratum window over ALL rows would sort each
   * stratum in one task (the few-groups failure mode measured in
   * quantiles). The hash is uniform, so instead each stratum is first
   * PRUNED to its ~margin*n smallest-hash rows by a per-stratum bucket
   * threshold (broadcast-joined, codegen'd filter — the scan does the
   * work), and only the tiny survivor set is ranked. If a stratum's
   * survivor count falls short (hash clumping — astronomically rare at
   * margin 4), the threshold widens geometrically and reruns; the
   * OUTPUT is threshold-independent (rank by (bucket, id) over a
   * superset of the true top-n), so retries never change results.
   * Stratum counts are collected once at build time (#strata rows,
   * `maxStrata`-guarded) — query construction is eager like
   * [[shardAssignment]].
   */
  def takeStratified(df: DataFrame, strataCol: Column, idCol: Column,
                     n: Int, maxStrata: Int = 100000): DataFrame = {
    require(n > 0, "n must be positive")
    val reserved = Seq("__s", "__b", "__thr", "__rn")
    require(reserved.forall(!df.columns.contains(_)),
      s"columns ${reserved.mkString(", ")} are reserved by takeStratified; rename them first")
    val spark = df.sparkSession
    import org.apache.spark.sql.functions.broadcast
    val fine = 1000000 // finer buckets than the 10k default: thresholds for small n
    val counts = df.groupBy(strataCol.as("__s"))
      .agg(count(lit(1)).as("__cnt")).limit(maxStrata + 1).collect()
    require(counts.length <= maxStrata,
      s"more than $maxStrata strata; raise maxStrata (driver holds one count per stratum)")
    val b = bucket(idCol, fine)
    var margin = 4L
    while (true) {
      val thr = counts.map { r =>
        val cnt = r.getLong(1)
        val t = math.min(fine.toLong, math.max(1L,
          math.ceil(fine.toLong * margin * n.toDouble / math.max(cnt, 1)).toLong))
        (r.get(0), t)
      }
      val thrDf = spark.createDataFrame(
        spark.sparkContext.parallelize(thr.toSeq.map { case (s, t) =>
          org.apache.spark.sql.Row(s, t) }, 1),
        org.apache.spark.sql.types.StructType(Seq(
          df.select(strataCol.as("__s")).schema.head,
          org.apache.spark.sql.types.StructField("__thr",
            org.apache.spark.sql.types.LongType))))
      val surv = df.withColumn("__b", b).withColumn("__s", strataCol)
        .join(broadcast(thrDf), Seq("__s"))
        .filter(col("__b") < col("__thr"))
      val short = surv.groupBy(col("__s")).agg(count(lit(1)).as("__sc"))
        .collect().map(r => r.get(0) -> r.getLong(1)).toMap
      val enough = counts.forall { r =>
        short.getOrElse(r.get(0), 0L) >= math.min(n.toLong, r.getLong(1)) }
      if (enough) {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__s")).orderBy(col("__b"), idCol)
        return surv
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= n)
          .drop("__s", "__b", "__thr", "__rn")
      }
      margin *= 4
      require(margin < fine.toLong * 16,
        "takeStratified failed to gather n survivors; id hashing degenerate?")
    }
    throw new IllegalStateException("unreachable")
  }

  /**
   * Token-budget selection: per group (source/language), keep rows in
   * ascending `idCol` order while the running token total (inclusive)
   * stays within `budget` — the "take the first N tokens of each source"
   * step of mixture construction, reproducible because the order is a
   * stable column, not arrival order.
   *
   * Scale shape — a two-phase prefix sum, NOT one window per group (that
   * put a whole source on one task: ~20 TB/task with 5 sources at
   * 100 TB). Per-group bounds (min/max id + row count) are computed ONCE
   * at build time (like [[shardAssignment]]'s counts, this makes query
   * construction eager; the collected table is #groups rows, guarded by
   * `maxGroups`). The counts then pick the per-group block count
   * adaptively: a group with <= `blockRows` rows is PROVEN small enough
   * for one bounded sort task, so when every group is small the whole
   * two-phase machinery collapses to a single per-group running-sum
   * window — one pass over the input instead of three, which is what a
   * composed pipeline (q_curate shape) feeding a few-thousand-row
   * survivor relation into tokenBudget pays for otherwise. Large groups
   * get ceil(cnt / blockRows) blocks (capped at `nBlocks`): equal-width
   * ordered id ranges (monotone in idCol; balance degrades only to
   * imbalance, never incorrectness, for clustered ids). Phase 1
   * aggregates one token subtotal per (group, block) and turns it into
   * per-block cumulative offsets — a window over the TINY subtotal
   * table only. Phase 2 broadcast-joins the offsets back and computes
   * the running sum inside each bounded (group, block) partition, so
   * parallelism is #groups * nBlocks and no task ever holds a full
   * group. Blocks whose offset already exceeds the budget are dropped
   * before the sort — at 100 TB with a fixed budget that prunes almost
   * everything (requires non-negative token counts, true by
   * construction). The output is invariant to the blocking, so the
   * adaptive choice never changes results.
   *
   * `idCol` must be numeric (the block cut is range arithmetic).
   */
  def tokenBudget(df: DataFrame, groupCol: Column, idCol: Column,
                  tokensCol: Column, budget: Long, nBlocks: Int = 64,
                  blockRows: Long = 1L << 22, maxGroups: Int = 1 << 20): DataFrame = {
    require(nBlocks > 0, "nBlocks must be positive")
    require(blockRows > 0, "blockRows must be positive")
    val outCols = df.columns.map(col)
    val spark = df.sparkSession
    val W = org.apache.spark.sql.expressions.Window
    // per-group id range + row count, collected once (guarded): the block
    // boundaries derive from a pure aggregate, so every phase agrees on
    // them under any partitioning
    val aggDf = df.groupBy(groupCol.as("__g"))
      .agg(min(idCol).as("__mn"), max(idCol).as("__mx"), count(lit(1)).as("__cnt"))
    val boundRows = aggDf.limit(maxGroups + 1).collect()
    if (boundRows.length > maxGroups)
      throw new IllegalStateException(
        s"tokenBudget saw more than $maxGroups distinct groups: the group " +
          s"column is too fine-grained for per-group budgeting (bounds are " +
          s"collected to the driver). Coarsen the group or raise maxGroups.")
    val maxCnt = if (boundRows.isEmpty) 0L else boundRows.map(_.getLong(3)).max
    if (nBlocks == 1 || maxCnt <= blockRows) {
      // every group proven small: one bounded running-sum window per
      // group, no joins, single pass over the input
      val w = W.partitionBy(groupCol).orderBy(idCol.asc)
      return df.withColumn("__cum", sum(tokensCol).over(w))
        .filter(col("__cum") <= budget)
        .select(outCols: _*)
    }
    // per-group adaptive block count, baked into a literal broadcast
    // bounds table (no re-scan of the input for the bounds join)
    import scala.jdk.CollectionConverters._
    val withNb = boundRows.map { r =>
      val nb = math.max(1L, math.min(nBlocks.toLong,
        (r.getLong(3) + blockRows - 1) / blockRows))
      org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2), nb)
    }
    val boundsSchema = org.apache.spark.sql.types.StructType(
      aggDf.schema.fields.take(3) :+
        org.apache.spark.sql.types.StructField("__nb", LongType, nullable = false))
    val bounds = spark.createDataFrame(withNb.toList.asJava, boundsSchema)
    // monotone in idCol (IEEE multiply/divide by positive constants are
    // order-preserving), so blocks are ordered id ranges within the group
    val blk = least(
      floor((idCol.cast("double") - col("__mn").cast("double")) * col("__nb") /
        (col("__mx").cast("double") - col("__mn").cast("double") + 1.0)).cast(LongType),
      col("__nb") - 1L)
    val blocked = df.join(broadcast(bounds), groupCol <=> col("__g"))
      .withColumn("__blk", blk)
    // phase 1: one row per (group, block); the cumulative window runs
    // over at most #groups * nBlocks rows
    val offsets = blocked.groupBy(col("__g").as("__g2"), col("__blk").as("__blk2"))
      .agg(sum(tokensCol).as("__sub"))
      .withColumn("__off", coalesce(
        sum(col("__sub")).over(W.partitionBy(col("__g2")).orderBy(col("__blk2").asc)
          .rowsBetween(W.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__g2"), col("__blk2"), col("__off"))
    // phase 2: bounded per-(group, block) running sum + block-level prune
    val wLoc = W.partitionBy(col("__g"), col("__blk")).orderBy(idCol.asc)
    blocked
      .join(broadcast(offsets), col("__g") <=> col("__g2") && col("__blk") === col("__blk2"))
      .filter(col("__off") <= budget)
      .withColumn("__cum", col("__off") + sum(tokensCol).over(wLoc))
      .filter(col("__cum") <= budget)
      .select(outCols: _*)
  }

  /**
   * Sample DOWN to a target mixture: given target proportions per
   * stratum (source/language weights for a training mix), keep the
   * largest corpus achievable without upsampling any stratum — the
   * binding stratum (smallest n_g / target_g) is kept whole and every
   * other stratum is hash-thresholded down so realized sizes follow the
   * targets. Strata absent from `targets` are dropped; a target naming
   * an absent stratum fails fast (the requested mixture is infeasible).
   * Proportions only need to be relative (they are never normalized —
   * scale = min_g n_g/t_g cancels any common factor).
   *
   * Deterministic and engine-portable like [[hashSample]]: per-stratum
   * keep-thresholds are derived from exact counts (one partial-agg pass,
   * collected under `maxStrata`) with fixed-order double arithmetic an
   * oracle replays bit-identically, then applied as a codegen'd
   * when-chain filter on the scan — no shuffle in the data path at all.
   */
  def sampleToMixture(df: DataFrame, strataCol: Column, idCol: Column,
                      targets: Map[String, Double],
                      maxStrata: Int = 100000): DataFrame = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.values.forall(_ > 0.0), "target proportions must be positive")
    val fine = 1000000
    val counts = df.groupBy(strataCol.as("__s"))
      .agg(count(lit(1)).as("__cnt")).limit(maxStrata + 1).collect()
      .map(r => (if (r.isNullAt(0)) null else r.get(0).toString) -> r.getLong(1))
      .toMap
    require(counts.size <= maxStrata,
      s"more than $maxStrata strata; raise maxStrata (driver holds one count per stratum)")
    val missing = targets.keySet.filterNot(counts.contains)
    require(missing.isEmpty,
      s"target strata absent from the data: ${missing.mkString(", ")} — the mixture is infeasible")
    // scale = the largest total size no stratum has to upsample for;
    // fixed arithmetic order (((scale * t) / n) * fine) so the oracle's
    // double math lands on the identical threshold
    val scale = targets.map { case (g, t) => counts(g) / t }.min
    val thr = targets.map { case (g, t) =>
      // the binding stratum gets the full range OUTRIGHT: the FP
      // round-trip floor(((n/t)*t/n)*fine) can land one bucket short of
      // `fine` and silently shed ~1e-6 of the stratum documented as
      // "kept whole"; n/t == scale is exact (the min IS one of these
      // values), so the test is engine-portable
      g -> (if (counts(g) / t == scale) fine.toLong
            else math.floor(scale * t / counts(g) * fine).toLong) }
    val thrCol = thr.foldLeft(lit(0L)) { case (acc, (g, t)) =>
      when(strataCol === g, lit(t)).otherwise(acc) }
    df.filter(bucket(idCol, fine) < thrCol)
  }

  /**
   * GPT-style sequence packing (concat-and-chunk): documents are laid
   * end-to-end in ascending `idCol` order and the concatenated token
   * stream is cut into fixed training sequences of `seqLen` tokens; a
   * document whose span crosses a cut contributes one slice to every
   * sequence it touches. Output appends, one row per (doc, sequence)
   * slice:
   *   `seq_id`     — training sequence index (0-based)
   *   `seq_offset` — slice start within the sequence
   *   `doc_offset` — slice start within the document
   *   `slice_len`  — tokens contributed
   * Zero-token docs contribute nothing. The layout is a pure function of
   * (ids, token counts, seqLen) — rerunnable at any partitioning, and an
   * oracle can replay it from a window prefix sum.
   *
   * Scale shape — the global token prefix sum is the same two-phase
   * pattern as [[tokenBudget]] (one ordered window over ALL rows would
   * serialize the corpus through one task): equal-width ordered id
   * blocks from the collected global bounds, one subtotal per block
   * (partial agg), cumulative offsets via a window over the tiny
   * subtotal table, then the running sum inside each bounded block. The
   * crossing explode emits ceil(tokens/seqLen)+1-ish rows per doc —
   * output-sized, inside the same codegen stage, no extra shuffle.
   */
  def packSequences(df: DataFrame, idCol: Column, tokensCol: Column,
                    seqLen: Long, nBlocks: Int = 1024,
                    blockRows: Long = 1L << 22): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(nBlocks > 0, "nBlocks must be positive")
    val reserved = Seq("__blk", "__cum", "__prev", "seq_id", "seq_offset",
      "doc_offset", "slice_len")
    require(reserved.forall(!df.columns.contains(_)),
      s"columns ${reserved.mkString(", ")} are reserved by packSequences")
    val W = org.apache.spark.sql.expressions.Window
    val outCols = df.columns.map(col)
    // global bounds, one aggregate collected once (query construction is
    // eager like tokenBudget/shardAssignment)
    // the same eager pass that fetches the block bounds also fail-fasts
    // the two data contracts a prefix sum silently corrupts on: null ids
    // (dropped by the blocked path's join but packed by the single
    // window) and negative token counts (excluded from output yet still
    // shifting every later document's offsets)
    val b = df.agg(min(idCol.cast("double")), max(idCol.cast("double")),
      count(lit(1)), count(when(idCol.isNull, 1)),
      min(tokensCol.cast(LongType))).head()
    if (b.getLong(2) == 0L)
      return df.withColumn("seq_id", lit(0L)).withColumn("seq_offset", lit(0L))
        .withColumn("doc_offset", lit(0L)).withColumn("slice_len", lit(0L))
        .limit(0)
    require(b.getLong(3) == 0L,
      s"packSequences saw ${b.getLong(3)} null ids: the packing order is the id — drop or fill null ids first")
    require(b.isNullAt(4) || b.getLong(4) >= 0L,
      s"packSequences saw a negative token count (${b.getLong(4)}): counts must be >= 0")
    val (mn, mx, cnt) = (b.getDouble(0), b.getDouble(1), b.getLong(2))
    val nb = math.max(1L, math.min(nBlocks.toLong,
      (cnt + blockRows - 1) / blockRows))
    val withCum = if (nb == 1L) {
      // proven small: one bounded running-sum window, single pass
      df.withColumn("__cum", sum(tokensCol).over(W.orderBy(idCol.asc)
        .rowsBetween(W.unboundedPreceding, W.currentRow)))
    } else {
      // monotone block cut over the id range (same arithmetic as
      // tokenBudget — order-preserving, clamped at the top edge)
      val blk = least(floor((idCol.cast("double") - mn) * nb /
        (mx - mn + 1.0)).cast(LongType), lit(nb - 1L))
      val blocked = df.withColumn("__blk", blk)
      val offsets = blocked.groupBy(col("__blk").as("__blk2"))
        .agg(sum(tokensCol).as("__sub"))
        .withColumn("__off", coalesce(
          sum(col("__sub")).over(W.orderBy(col("__blk2").asc)
            .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
        .select(col("__blk2"), col("__off"))
      blocked
        .join(broadcast(offsets), col("__blk") === col("__blk2"))
        // explicit ROWS frame: orderBy alone defaults to a RANGE frame
        // that folds idCol PEERS into one cumulative value — duplicate
        // ids would get identical __cum and emit overlapping slices,
        // diverging from the nb==1 path and the oracle
        .withColumn("__cum", col("__off") +
          sum(tokensCol).over(W.partitionBy(col("__blk")).orderBy(idCol.asc)
            .rowsBetween(W.unboundedPreceding, W.currentRow)))
    }
    val t = tokensCol.cast(LongType)
    withCum
      .withColumn("__prev", col("__cum") - t)
      .filter(t > 0L)
      .withColumn("seq_id", explode(sequence(
        floor(col("__prev") / seqLen).cast(LongType),
        floor((col("__cum") - 1L) / seqLen).cast(LongType))))
      .withColumn("seq_offset",
        greatest(col("__prev"), col("seq_id") * seqLen) - col("seq_id") * seqLen)
      .withColumn("doc_offset",
        greatest(col("__prev"), col("seq_id") * seqLen) - col("__prev"))
      .withColumn("slice_len",
        least(col("__cum"), (col("seq_id") + 1L) * seqLen) -
          greatest(col("__prev"), col("seq_id") * seqLen))
      .select(outCols :+ col("seq_id") :+ col("seq_offset") :+
        col("doc_offset") :+ col("slice_len"): _*)
  }

  /**
   * Deterministic shard assembly for training-data writes: shard = hash
   * bucket of the id, position = rank of a SECOND, independent hash
   * within the shard — a stable pseudo-shuffle (training wants documents
   * decorrelated from their natural order, and wants the same shard
   * layout on every rerun). Write with `partitionBy("shard")` sorted by
   * `shard_pos`; one shuffle on the shard key.
   *
   * Scale shape — same two-phase rank as [[tokenBudget]]: the order hash
   * is uniform in [0, 1e9+7) by construction, so each shard is cut into
   * `nBlocks` FIXED-width hash ranges (deterministic and balanced with
   * no data statistics at all); per-(shard, block) counts become
   * cumulative offsets via a window over the tiny count table, and
   * `row_number` runs only inside a (shard, block) — parallelism is
   * nShards * nBlocks instead of one task sorting a whole shard.
   */
  def shardAssignment(df: DataFrame, idCol: Column, nShards: Int,
                      nBlocks: Int = 64): DataFrame = {
    require(nBlocks > 0, "nBlocks must be positive")
    // cap the offset table at ~4M cells: with many shards, fewer blocks
    // per shard still gives ample parallelism (nShards * blocks tasks)
    val blocks = math.max(1, math.min(nBlocks, (1 << 22) / math.max(1, nShards)))
    val P = 1000000007L
    val order = pmod(conv(substring(md5(concat(lit("pos_"), idCol.cast("string"))), 1, 15), 16, 10)
      .cast(LongType), lit(P))
    // ord < 1e9+7, blocks <= ~4M: ord * blocks < 2^53, so the double
    // division is monotone and consistent across both phases; the clamp
    // absorbs any boundary rounding
    val blk = least(floor(order * blocks / P).cast(LongType), lit(blocks - 1L))
    val blocked = df.withColumn("shard", bucket(idCol, nShards))
      .withColumn("__ord", order)
      .withColumn("__blk", blk)
    // phase 1: per-(shard, block) counts — a tiny partial-aggregated
    // count (nShards * blocks cells), collected once at build time; both
    // phases derive shard/block from the same pure hash of the id, so
    // they agree under any partitioning.
    val counts = blocked.groupBy(col("shard"), col("__blk"))
      .agg(count(lit(1)).as("__cnt"))
      .collect().map(r => (r.getLong(0) * blocks + r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toMap
    val offArr = new Array[Long](nShards * blocks)
    var s = 0
    while (s < nShards) {
      var acc = 0L; var b = 0
      while (b < blocks) {
        offArr(s * blocks + b) = acc
        acc += counts.getOrElse(s.toLong * blocks + b, 0L)
        b += 1
      }
      s += 1
    }
    // Small offset tables become an O(1)-indexed array literal — no join,
    // no second exchange in the data path. Above ~64k cells the literal
    // stops being free (a 4M-cell array is ~32 MB of expression tree
    // serialized into EVERY task binary), so large tables ship once as a
    // broadcast-joined literal DataFrame instead.
    val wLoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"), col("__blk")).orderBy(col("__ord").asc, idCol.asc)
    val withOff =
      if (offArr.length <= (1 << 16))
        blocked.withColumn("__off", element_at(typedlit(offArr),
          (col("shard") * blocks + col("__blk") + 1).cast("int")))
      else {
        import scala.jdk.CollectionConverters._
        val spark = df.sparkSession
        // only non-empty cells need rows; empty cells never join a row
        val offRows = offArr.indices.iterator
          .filter(i => counts.contains(i.toLong))
          .map(i => org.apache.spark.sql.Row(
            i / blocks.toLong, i % blocks.toLong, offArr(i)))
          .toList
        val offSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__s2", LongType, nullable = false),
          org.apache.spark.sql.types.StructField("__b2", LongType, nullable = false),
          org.apache.spark.sql.types.StructField("__off", LongType, nullable = false)))
        blocked.join(broadcast(spark.createDataFrame(offRows.asJava, offSchema)),
          col("shard") === col("__s2") && col("__blk") === col("__b2"))
      }
    // phase 2: rank only inside a (shard, block) — bounded partitions
    withOff
      .withColumn("shard_pos", col("__off") + row_number().over(wLoc).cast(LongType) - 1)
      .select(df.columns.map(col) :+ col("shard") :+ col("shard_pos"): _*)
  }

  /**
   * Curriculum training order (easy→hard data ordering): documents
   * staged by a difficulty score against precomputed stage THRESHOLDS
   * (from [[Quantiles.exactQuantiles]] — O(#cuts) driver scalars, never
   * a global sort), sharded by an independent id hash, and ranked
   * inside each (shard, stage) by a second order hash — every shard
   * sees the same difficulty ramp: a trainer reads its shard's stages
   * in order, each stage internally pseudo-shuffled. The curriculum
   * position within a shard is the pair (stage, stage_pos); a
   * cross-stage global rank is never materialized.
   *
   * Scale shape — [[shardAssignment]]'s two-phase rank on the composite
   * (shard, stage) group: per-(group, block) counts collected once at
   * build (a nShards·nStages·blocks cell table, capped at 65,536 cells
   * so offsets always fit the array-literal fast path — with more
   * groups, fewer blocks per group still gives group·block-wide
   * parallelism), then row_number only inside a (group, block) hash
   * range. Stage assignment is a broadcast-threshold projection.
   * Deterministic: stages, shards and positions are pure functions of
   * (difficulty, id) — identical at any scale, partitioning or engine.
   */
  def curriculum(df: DataFrame, idCol: Column, difficulty: Column,
                 thresholds: Seq[Double], nShards: Int,
                 nBlocks: Int = 64): DataFrame = {
    require(thresholds.nonEmpty && thresholds == thresholds.sorted,
      s"thresholds must be non-empty ascending: ${thresholds.mkString(", ")}")
    require(nShards >= 1, "nShards must be >= 1")
    val nStages = thresholds.length + 1
    val nGroups = nShards * nStages
    // the 65,536-cell cap below only shrinks blocks PER GROUP; the group
    // count itself must stay under it or the offset table, the typedlit
    // array literal and the driver counts collect all grow unbounded
    // (mirrors shardAssignment's bound)
    require(nGroups <= (1 << 16),
      s"nShards*($nStages stages) = $nGroups groups exceeds 65536 — " +
        "the driver offset table is capped; use fewer shards or stages")
    val stage = thresholds.indices.foldRight(lit(thresholds.length.toLong): Column) {
      (i, rest) => when(difficulty <= thresholds(i), lit(i.toLong)).otherwise(rest)
    }
    val blocks = math.max(1, math.min(nBlocks, (1 << 16) / math.max(1, nGroups)))
    val P = 1000000007L
    val order = pmod(conv(substring(md5(concat(lit("pos_"), idCol.cast("string"))), 1, 15), 16, 10)
      .cast(LongType), lit(P))
    val blk = least(floor(order * blocks / P).cast(LongType), lit(blocks - 1L))
    val blocked = df
      .withColumn("shard", bucket(idCol, nShards))
      .withColumn("stage", stage)
      .withColumn("__g", col("shard") * nStages + col("stage"))
      .withColumn("__ord", order)
      .withColumn("__blk", blk)
    val counts = blocked.groupBy(col("__g"), col("__blk"))
      .agg(count(lit(1)).as("__cnt"))
      .collect().map(r => (r.getLong(0) * blocks + r.getLong(1), r.getLong(2))).toMap
    val offArr = new Array[Long](nGroups * blocks)
    var g = 0
    while (g < nGroups) {
      var acc = 0L; var b = 0
      while (b < blocks) {
        offArr(g * blocks + b) = acc
        acc += counts.getOrElse(g.toLong * blocks + b, 0L)
        b += 1
      }
      g += 1
    }
    val wLoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g"), col("__blk")).orderBy(col("__ord").asc, idCol.asc)
    blocked
      .withColumn("__off", element_at(typedlit(offArr),
        (col("__g") * blocks + col("__blk") + 1).cast("int")))
      .withColumn("stage_pos", col("__off") + row_number().over(wLoc).cast(LongType) - 1)
      .select(df.columns.map(col) :+ col("shard") :+ col("stage") :+ col("stage_pos"): _*)
  }

  /**
   * Head-domain flattening (the per-domain document cap of CCNet /
   * RefinedWeb-style web curation): cap every source at
   * `max(minKeep, ceil(sqrt(count)))` documents, keeping the cap
   * lowest-md5-rank docs — a sublinear cap that leaves small sources
   * intact while shrinking a 10M-doc domain to ~3.2k, so no head domain
   * can dominate the mixture. Deterministic: the kept set is a pure
   * function of ids, identical at any scale/partitioning/engine.
   *
   * Engine-exact: IEEE sqrt is correctly rounded so `ceil(sqrt(n))`
   * replays identically in DuckDB; selection is the [[bucket]] hash
   * order with id tiebreak.
   *
   * Scale shape — the [[takeStratified]] two-phase top-k, with caps
   * from the same counts pass: sources AT OR UNDER their cap pass
   * through on the broadcast-join path with no window at all (at
   * 100 TB, the long tail of domains — most of the distinct keys —
   * never touches a sort). Over-cap sources are pre-filtered to
   * ~margin*cap hash-rank candidates (uniformity-checked, widened on
   * shortfall) before the exact per-source rank, so a 10M-doc head
   * domain contributes a bounded candidate set to its window task, not
   * 10M rows. Driver state is one (count, cap) pair per source,
   * `maxSources`-guarded.
   */
  def sourceCap(df: DataFrame, sourceCol: Column, idCol: Column,
                minKeep: Int = 2, maxSources: Int = 100000): DataFrame = {
    require(minKeep >= 1, "minKeep must be >= 1")
    val reserved = Seq("__s", "__b", "__cap", "__thr", "__rn")
    require(reserved.forall(!df.columns.contains(_)),
      s"columns ${reserved.mkString(", ")} are reserved by sourceCap; rename them first")
    val spark = df.sparkSession
    val fine = 1000000
    val counts = df.groupBy(sourceCol.as("__s"))
      .agg(count(lit(1)).as("__cnt")).limit(maxSources + 1).collect()
    require(counts.length <= maxSources,
      s"more than $maxSources sources; raise maxSources (driver holds one count per source)")
    val caps = counts.map { r =>
      val n = r.getLong(1)
      (r.get(0), n, math.max(minKeep.toLong, math.ceil(math.sqrt(n.toDouble)).toLong))
    }
    val sSchema = df.select(sourceCol.as("__s")).schema.head
    def capDf(rows: Seq[org.apache.spark.sql.Row],
              extra: Seq[org.apache.spark.sql.types.StructField]) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        org.apache.spark.sql.types.StructType(sSchema +: extra))
    val capField = org.apache.spark.sql.types.StructField("__cap", LongType)
    // the long tail: cap >= count — every doc kept, no candidate filter,
    // no window; just a broadcast semi-ish join carrying the cap along
    val under = caps.filter { case (_, n, c) => c >= n }
      .map { case (s, _, c) => org.apache.spark.sql.Row(s, c) }
    val underDf = df.withColumn("__s", sourceCol)
      .join(broadcast(capDf(under.toSeq, Seq(capField))), Seq("__s"))
    // the head: exact top-cap by hash rank over a pre-filtered candidate
    // set (takeStratified's margin loop, per-source thresholds)
    val over = caps.filter { case (_, n, c) => c < n }
    if (over.isEmpty)
      return underDf.drop("__s").withColumnRenamed("__cap", "source_cap")
    val b = bucket(idCol, fine)
    var margin = 4L
    while (margin < fine.toLong * 16) {
      val thr = over.map { case (s, n, c) =>
        val t = math.min(fine.toLong, math.max(1L,
          math.ceil(fine.toLong * margin * c.toDouble / n).toLong))
        org.apache.spark.sql.Row(s, c, t)
      }
      val thrField = org.apache.spark.sql.types.StructField("__thr", LongType)
      val cand = df.withColumn("__s", sourceCol).withColumn("__b", b)
        .join(broadcast(capDf(thr.toSeq, Seq(capField, thrField))), Seq("__s"))
        .filter(col("__b") < col("__thr"))
      val got = cand.groupBy(col("__s")).agg(count(lit(1)).as("__gc"))
        .collect().map(r => r.get(0) -> r.getLong(1)).toMap
      if (over.forall { case (s, _, c) => got.getOrElse(s, 0L) >= c }) {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__s")).orderBy(col("__b"), idCol)
        val kept = cand.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= col("__cap"))
          .drop("__b", "__thr", "__rn")
        return underDf.drop("__s").unionByName(kept.drop("__s"))
          .withColumnRenamed("__cap", "source_cap")
      }
      margin *= 4
    }
    throw new IllegalStateException(
      "sourceCap failed to gather cap survivors; id hashing degenerate?")
  }

  /**
   * UniMax language-balanced token allocation (Chung et al. 2023,
   * "UniMax: Fairer and More Effective Language Sampling for
   * Large-Scale Multilingual Pretraining"): split a total token
   * `budget` across languages as uniformly as possible, subject to no
   * language being repeated more than `maxEpochs` times. Languages are
   * processed smallest-first; a language whose full `maxEpochs` epochs
   * fit inside its uniform share of the remaining budget is epoch-capped
   * (takes n*maxEpochs tokens), and the first language that cannot —
   * together with every larger one — splits the remaining budget
   * equally.
   *
   * The paper's sequential waterfill has a closed form once languages
   * are sorted ascending by token count: with prefix sums
   * S_l = sum_{j<=l} n_j*E, language l is epoch-capped iff
   * n_l*E*(L-l+1) <= B - S_{l-1}, and that predicate is monotone in l
   * (the difference f(l+1)-f(l) = (L-l)*E*(n_{l+1}-n_l) >= 0), so the
   * crossover is a single prefix boundary and the budget-limited share
   * is one integer division. All-integer arithmetic → the DuckDB oracle
   * replays the allocation bit-exactly with window functions.
   *
   * Scale shape: ONE language-keyed count aggregation over the corpus
   * (map-side partial sums; the key space is #languages, so no skew
   * pressure), then O(#languages) driver arithmetic, `maxLangs`-guarded
   * — the corpus itself is never re-shuffled and nothing downstream of
   * the agg depends on corpus size. Emits one row per language:
   * total tokens, allocated tokens, and milli-epochs (1000*alloc/n,
   * integer) — the sampling rates a mixture builder feeds to
   * [[hashSample]]/[[weightedResample]].
   */
  def unimaxAllocation(df: DataFrame, langCol: Column, tokensCol: Column,
                       budget: Long, maxEpochs: Int,
                       maxLangs: Int = 100000): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(maxEpochs >= 1, "maxEpochs must be >= 1")
    val spark = df.sparkSession
    val counts = df.groupBy(langCol.as("lang"))
      .agg(sum(tokensCol.cast(LongType)).as("n")).limit(maxLangs + 1).collect()
    require(counts.length <= maxLangs,
      s"more than $maxLangs languages; raise maxLangs (driver holds one count per language)")
    val langs = counts.map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (l, n) => (n, l) } // id tiebreak keeps ties engine-stable
    val L = langs.length
    val E = maxEpochs.toLong
    var prefix = 0L // S_{l-1}: epoch-capped tokens taken by smaller langs
    var k = 0 // number of epoch-capped languages
    while (k < L && langs(k)._2 * E * (L - k) <= budget - prefix) {
      prefix += langs(k)._2 * E; k += 1
    }
    val share = if (k < L) (budget - prefix) / (L - k) else 0L
    val out = langs.zipWithIndex.map { case ((l, n), i) =>
      val alloc = if (i < k) n * E else math.min(share, n * E)
      org.apache.spark.sql.Row(l, n, alloc,
        if (n > 0) 1000L * alloc / n else 0L)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_tokens", LongType),
        org.apache.spark.sql.types.StructField("alloc_tokens", LongType),
        org.apache.spark.sql.types.StructField("epochs_milli", LongType))))
  }

  /**
   * Shard manifests — the reproducibility artifact a training run ships
   * with its shards: per shard (the [[bucket]]-hash assignment, the
   * q_shards convention), doc/token counts, the id range, and an
   * ORDER-INDEPENDENT content checksum (bit_xor of a 60-bit md5 over
   * `id:text`) — XOR commutes, so the checksum is identical under any
   * partitioning, any write order, and any engine. XOR detects any
   * single-row difference but NOT multiset-parity changes (a row
   * duplicated an even number of times cancels out) — compare the
   * checksum TOGETHER with n_docs/n_tokens, which do count multiplicity;
   * the pair catches duplication that the XOR alone cannot. id_min/
   * id_max assume a numeric (castable-to-long) id column — a
   * non-numeric id nulls the range columns (the checksum hashes the id
   * as a string and is unaffected).
   *
   * Scale shape: one scan, map-side partial agg into nShards cells —
   * the exchange carries O(shards × partitions) rows. Null text counts
   * 0 tokens and hashes as `id:` (the [[Dedup.snapshotDiff]]
   * convention).
   */
  def shardManifest(df: DataFrame, idCol: Column, textCol: Column,
                    nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val h = graft.operators.Dedup.md5Long(
      concat(idCol.cast("string"), lit(":"), coalesce(textCol, lit(""))))
    df.select(pmod(graft.operators.Dedup.md5Long(idCol.cast("string")),
        lit(nShards.toLong)).as("shard"),
        idCol.cast(LongType).as("__id"),
        when(textCol.isNotNull,
          size(split(lower(textCol), "\\s+")).cast(LongType))
          .otherwise(0L).as("__nt"),
        h.as("__h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_tokens"),
        min(col("__id")).as("id_min"), max(col("__id")).as("id_max"),
        expr("bit_xor(__h)").as("checksum"))
  }
}
