package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase timing for the composed canopy->FCM fit (not wired into
  * any gate; kept for scale forensics). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet").select(
      array(col("l_quantity") / 50, col("l_discount") * 10, col("l_tax") * 10)
        .as("features"))
    t("warm-scan")(li.count())
    def grid(k: Int): Array[Array[Double]] =
      Array.tabulate(k)(i => Array(0.1 + 0.8 * i / k, 0.9 - 0.8 * i / k, 0.1 + 0.7 * i / k))
    val centers = t("selectCenters")(graft.operators.Canopy.selectCenters(
      li, "features", t1 = 0.6, t2 = 0.3, maxIter = 8, measure = "euclidean"))
    println(s"[probe] k = ${centers.length}")
    t("fit-canopy-init")(new graft.operators.FCM().setMaxIter(10)
      .setInitialCentroids(centers).fit(li))
    t("fit-fixed-k8")(new graft.operators.FCM().setMaxIter(10)
      .setInitialCentroids(grid(8)).fit(li))
    spark.stop()
  }
}

/** Ad-hoc phase timing for the composed curation pipeline (q_curate
  * forensics: which stage pays for the un-cached survivor relation). */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.operators._
    for (round <- 1 to 2) {
      println(s"[probe] --- round $round ---")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      t("warm")(docs.count())
      val scored = docs
        .select(col("doc_id"), col("source"), col("text"),
          TextAnalysis.qualityUdf(col("text"), col("n_chars")).as("q"))
        .filter(col("q") >= 0.8)
      val key = concat_ws(" ", slice(split(lower(col("text")), "\\s+"), 1, 3))
      val exact = Dedup.exact(scored.withColumn("__k", key), col("__k"), "doc_id")
        .select("doc_id", "source", "text")
      t("exact-dedup-count")(exact.count())
      val pairs = t("pairs-build+count") {
        val p = Dedup.minhashNearDupPairs(exact, "text", "doc_id",
          16, 4, 42L, 3, threshold = 0.8)
        p.count(); p
      }
      val dropIds = t("clusters") {
        val d = Dedup.clusters(pairs)
          .filter(col("id") =!= col("cluster_id"))
          .select(col("id").as("doc_id"))
        d.count(); d
      }
      val kept = exact.join(dropIds, Seq("doc_id"), "left_anti")
        .withColumn("n_tokens", size(split(lower(col("text")), "\\s+")).cast("long"))
      t("kept-count")(kept.count())
      val out = t("tokenBudget-build")(
        Sampling.tokenBudget(kept, col("source"), col("doc_id"), col("n_tokens"), 3000L))
      t("tokenBudget-count")(out.count())
    }
    spark.stop()
  }
}

/** Adversarial-skew measurement at scale (SCALE.md "what we'd watch
  * first"): (1) a corpus where 30% of docs are ONE hot near-dup cluster —
  * every band gets a monster bucket, exercising the maxBucketSize pivot
  * path end-to-end at 100x volume; (2) a join where 30% of lineitem rows
  * share one hot orderkey — exercising AQE's skew-join split. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // AQE's skew split declines when the join feeds an aggregation whose
      // required hash distribution the split would violate; force accepts
      // the extra shuffle in exchange for unblocked stragglers.
      .config("spark.sql.adaptive.forceOptimizeSkewedJoin",
        sys.env.getOrElse("SKEW_FORCE", "false"))
      // The absolute skew threshold (256 MB default) is sized for cluster
      // shuffles; a 100x local shuffle of pruned 16-byte rows stays under
      // it even with 30% of keys hot. Scale it with the data so the local
      // probe exercises the same code path a 100 TB shuffle would.
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        sys.env.getOrElse("SKEW_THRESHOLD", "256m"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SKEW_ADVISORY", "64m"))
      // Detection is in POST-COMPRESSION shuffle bytes: a hot key's
      // millions of identical rows compress ~100:1, so classic
      // duplicate-key skew can be invisible in bytes while extreme in
      // rows/CPU. Factor=1 isolates that effect.
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        sys.env.getOrElse("SKEW_FACTOR", "5.0"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[skew] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // --- 1: monster near-dup cluster (30% of docs share one text) ---
    val hot = "the same hot document text repeated across nearly a third " +
      "of the corpus making every band bucket collide on it"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("text",
        when(col("doc_id") % 10 < 3, concat(lit(hot), lit(" tail"), col("doc_id") % 7))
          .otherwise(col("text")))
    t("hot-corpus count")(docs.count())
    val pairs = t("minhash pairs (monster buckets)") {
      val p = graft.operators.Dedup.minhashNearDupPairs(
        docs, "text", "doc_id", 16, 4, 42L, 3, 0.8)
      println(s"[skew] pairs = ${p.count()}"); p
    }
    t("clusters") {
      println(s"[skew] clusters rows = ${graft.operators.Dedup.clusters(pairs).count()}")
    }
    // --- 2: hot join key (30% of lineitem on orderkey 1) ---
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("l_orderkey",
        when(col("l_linenumber") % 10 < 3, lit(1L)).otherwise(col("l_orderkey")))
    val o = spark.read.parquet(s"$dir/orders.parquet")
    t("skewed join (AQE)") {
      val j = li.join(o.hint("SHUFFLE_MERGE"), li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderdate")).count()
      // materialize j ITSELF (collect, not .count(), which builds a new
      // QueryExecution) so executedPlan is the FINAL adaptive plan — the
      // initial plan never carries skew=true markers.
      println(s"[skew] groups = ${j.collect().length}")
      val plan = j.queryExecution.executedPlan.toString
      plan.linesIterator.filter(l => l.contains("Join") || l.contains("skew")).take(6).foreach(l => println("[skew] plan: " + l.trim.take(150)))
      println(s"[skew] skew-split applied = ${plan.contains("skew=true")}")
    }
    spark.stop()
  }
}

/** Ad-hoc phase timing for noveltyScores on a scaled corpus (round-7
  * forensics: why the vocab-FIXED permute mode costs more than the
  * vocab-inflating suffix mode on this operator). */
object NoveltyProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    t("warm-scan")(docs.count())
    val sh = graft.operators.Dedup.docShingles(docs, "text", "doc_id")
    t("explode+count")(sh.count())
    val firstSeen = sh.groupBy(col("__sh")).agg(min(col("__doc")).as("__first"))
    println(s"[probe] distinct shingles: ${t("firstSeen")(firstSeen.count())}")
    t("join+final")(sh.join(firstSeen, "__sh").groupBy(col("__doc"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__first") === col("__doc"), 1L).otherwise(0L)).as("nn"))
      .count())
    t("full-operator")(
      graft.operators.Dedup.noveltyScores(docs, "text", "doc_id").count())
    spark.stop()
  }
}

/** Ad-hoc 1000x forensics for span dedup: the registered q_span_dedup
  * knobs (spanTokens=8, minDocs=2, 5M cap) fail-fast on the 1000x
  * synthetic corpora because the generator's ~31-word vocabulary makes
  * 8-gram spans collide by birthday pressure (SCALE.md round-7 table).
  * This probe runs the operator at the corpus-appropriate spanTokens to
  * show the guard's named remedy actually carries the op at that scale. */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spanTokens = sys.env.getOrElse("SPARK_GRAFT_SPAN_TOKENS", "16").toInt
    val minDocs = sys.env.getOrElse("SPARK_GRAFT_SPAN_MINDOCS", "2").toInt
    val cap = sys.env.getOrElse("SPARK_GRAFT_SPAN_CAP", "5000000").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    t("warm-scan")(docs.count())
    val out = graft.operators.Dedup.removeRepeatedSpans(
      docs, "text", "doc_id", spanTokens = spanTokens, minDocs = minDocs,
      maxHotSpans = cap)
    println(s"[probe] spanTokens=$spanTokens minDocs=$minDocs cap=$cap survivors: " +
      t("full-operator")(out.count()))
    spark.stop()
  }
}

/** Ad-hoc 1000x forensics for cluster resolution: runs the SAME verified
  * edge list through the driver union-find AND the distributed min-id
  * label propagation, times both, and asserts identical labels — the
  * evidence that the above-limit fallback is a working 100 TB path, not
  * a vestigial branch (it had never been exercised at scale before this).
  */
/** Per-delta streaming covariance measurement (the SCALE.md claim that
  * production pays per-DELTA explode only, made a number): splits the
  * embeddings table into N equal parquet files, drains covCellStream
  * with maxFilesPerTrigger=1 so every microbatch is one 1/N delta, and
  * prints each microbatch's rows + wall ms from the progress feed. Run
  * at several N (SPARK_GRAFT_COV_BATCHES, default "1,4,16") to see
  * per-batch cost track delta size while state stays the fixed grid. */
object CovStreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val batches = sys.env.getOrElse("SPARK_GRAFT_COV_BATCHES", "1,4,16")
      .split(",").map(_.trim.toInt)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val total = emb.count()
    // batch-parity reference for the drained grid
    val batchCells = graft.operators.Similarity.covCellsFinish(
      graft.operators.Similarity.covCellStream(emb, "embedding"))
      .collect().map(_.toSeq).sortBy(_.toString)
    batches.foreach { n =>
      val stage = java.nio.file.Files
        .createTempDirectory(s"graft_covprobe_${n}_").toString
      // one file per delta: repartition BEFORE write so each microbatch
      // is a 1/n slice of the corpus
      emb.repartition(n).write.mode("overwrite").parquet(s"$stage/in")
      val schema = emb.schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$stage/in")
      val qn = s"covprobe_$n"
      val q = graft.operators.Similarity.covCellStream(src, "embedding")
        .writeStream.format("memory").queryName(qn)
        .option("checkpointLocation", s"$stage/ckpt")
        .outputMode("complete").start()
      q.processAllAvailable()
      // executed microbatch physical plan (plan-shape evidence for the
      // cell pre-aggregation: ObjectHashAggregate over the kernel's
      // partial cells, never an explode of O(rows·d²) cells)
      if (n == batches.head) q.explain()
      val prog = q.recentProgress.filter(_.numInputRows > 0)
      prog.zipWithIndex.foreach { case (p, i) =>
        println(f"[probe] n=$n batch=$i rows=${p.numInputRows}%7d " +
          f"batchMs=${p.batchDuration}%6d " +
          f"stateRows=${Option(p.stateOperators).filter(_.nonEmpty).map(_.head.numRowsTotal).getOrElse(-1L)}")
      }
      if (prog.isEmpty)
        // a drain that yields no row-bearing batches must report, not
        // crash on an empty median index
        println(s"[probe] n=$n deltaRows~${total / n} batches=0 " +
          "(no row-bearing progress entries — nothing to summarize)")
      else {
        val perRow = prog.map(p => p.batchDuration.toDouble / p.numInputRows)
        println(f"[probe] n=$n deltaRows~${total / n} batches=${prog.length} " +
          f"medianBatchMs=${prog.map(_.batchDuration).sorted.apply(prog.length / 2)} " +
          f"msPerKRow=${perRow.sorted.apply(perRow.length / 2) * 1000}%.1f")
      }
      val streamed = graft.operators.Similarity.covCellsFinish(
        spark.table(qn)).collect().map(_.toSeq).sortBy(_.toString)
      require(streamed.toSeq == batchCells.toSeq,
        s"n=$n drained grid diverged from batch")
      q.stop()
      // best-effort cleanup
      try java.nio.file.Files.walk(java.nio.file.Paths.get(stage))
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      catch { case _: Exception => }
    }
    spark.stop()
  }
}

object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // SPARK_GRAFT_CHAINS=<nChains>,<len>: synthetic HIGH-DIAMETER graph
    // instead of the corpus near-dup edges (round 13, r12 verdict #7 —
    // the corpus graphs all have small diameter, so they never show the
    // rounds x per-round cost of the label-propagation loop; min-id
    // propagates one hop per round, so a chain of `len` edges needs
    // `len` rounds; keep len under clusters()' maxIter=20).
    val pairs = sys.env.get("SPARK_GRAFT_CHAINS") match {
      case Some(spec) =>
        val Array(nChains, len) = spec.split(",").map(_.trim.toLong)
        require(len >= 1 && len < 20, s"chain length must be in [1, 20): $len")
        import spark.implicits._
        spark.range(nChains * len)
          .select((col("id") / len).cast("long").as("c"),
            pmod(col("id"), lit(len)).as("p"))
          // node ids: chain c occupies [c*(len+1), (c+1)*(len+1)); the
          // MIN id sits at position 0 so every round matters
          .select((col("c") * (len + 1) + col("p")).as("id_a"),
            (col("c") * (len + 1) + col("p") + 1).as("id_b"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      case None =>
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        t("warm-scan")(docs.count())
        graft.operators.Dedup.minhashNearDupPairs(
            docs, "text", "doc_id", 16, 4, 42L, 3, 0.8)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    println(s"[probe] verified edges: ${t("pairs")(pairs.count())}")
    val uf = t("driver-union-find")(
      graft.operators.Dedup.clusters(pairs, driverEdgeLimit = 100000000L).collect())
    val lp = t("distributed-label-propagation")(
      graft.operators.Dedup.clustersDistributed(pairs).collect())
    val ufm = uf.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lpm = lp.map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(s"[probe] labeled nodes: uf=${ufm.size} lp=${lpm.size} " +
      s"equal=${ufm == lpm}")
    println(s"[probe] persistent RDDs after propagation: " +
      s"${spark.sparkContext.getPersistentRDDs.size}")
    require(ufm == lpm, "paths disagree")
    spark.stop()
  }
}

/** Ad-hoc forensics for the WARC source: splits q_warc_source's recorded
  * time into member build + driver concat (write) vs the ranged parallel
  * read, and reports the archive size — the read is the part that exists
  * at 100 TB (corpora arrive as .warc.gz; the single-file write is a
  * fixture device, like q_csv_split's coalesce(1)). */
object WarcProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("url", concat(lit("http://corpus.local/doc/"),
        col("doc_id").cast("string")))
    t("warm-scan")(docs.count())
    val out = java.nio.file.Files.createTempDirectory("graft_warcprobe_")
    val file = out.resolve("probe.warc.gz").toString
    t("write (distributed gzip + driver concat)")(
      graft.sources.Warc.writeSingleFile(docs, "url", "text", file))
    println(s"[probe] archive bytes: ${new java.io.File(file).length()}")
    val n = t("ranged read (32 MiB blocks)")(
      graft.sources.Warc.read(spark, file).count())
    println(s"[probe] records: $n")
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(file))
    // the PRODUCTION egress: one shard per partition, no driver hop
    val shardDir = out.resolve("shards").toString
    val manifest = t("writeShards (per-partition egress)")(
      graft.sources.Warc.writeShards(docs, "url", "text", shardDir).collect())
    println(s"[probe] shards: ${manifest.length}, bytes: " +
      manifest.map(_.getLong(2)).sum)
    val n2 = t("ranged read of shard dir")(
      graft.sources.Warc.read(spark, shardDir).count())
    println(s"[probe] shard records: $n2")
    spark.stop()
  }
}

/** Ad-hoc forensics for the blocklist tiers: the static query list is 5
  * phrases, where both kernels are trivially fast — this measures the
  * UT1-class regime (thousands of patterns) the Aho–Corasick tier
  * exists for, and cross-checks the two kernels' counts on every doc.
  * SPARK_GRAFT_PATTERNS sets the list size (default 2000). */
object BlocklistProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nPat = sys.env.getOrElse("SPARK_GRAFT_PATTERNS", "2000").toInt
    val skipIndexOf = sys.env.get("SPARK_GRAFT_SKIP_INDEXOF").isDefined
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("text").isNotNull).select("text")
    t("warm-scan")(texts.count())
    import spark.implicits._
    val ds = texts.as[String]
    // REAL corpus bigrams as the phrase list (deterministic slice): every
    // pattern occurs in the corpus and first characters are distributed
    // like natural text — synthetic rare-first-char phrases make the
    // indexOf walk look ~10x cheaper than a real blocklist does
    val patterns: Array[String] = ds
      .flatMap(s => s.toLowerCase.split("\\s+").toSeq
        .sliding(2).filter(_.length == 2).map(_.mkString(" ")))
      .distinct().orderBy("value").limit(nPat).collect()
    println(s"[probe] patterns: ${patterns.length}")
    val bcPats = spark.sparkContext.broadcast(patterns)
    def acSums = ds.mapPartitions { it =>
      val ac = new graft.functions.AhoCorasick(bcPats.value)
      it.map(s => ac.counts(s.toLowerCase).sum)
    }
    def idxSums = ds.mapPartitions { it =>
      val pats = bcPats.value
      it.map { s0 =>
        val s = s0.toLowerCase
        var total = 0L
        pats.foreach { p =>
          var i = s.indexOf(p)
          while (i >= 0) { total += 1; i = s.indexOf(p, i + p.length) }
        }
        total
      }
    }
    val acTotal = t(s"aho-corasick (${patterns.length} patterns)")(
      acSums.reduce(_ + _))
    println(s"[probe] ac total hits: $acTotal")
    if (!skipIndexOf) {
      val idxTotal = t(s"indexOf walk (${patterns.length} patterns)")(
        idxSums.reduce(_ + _))
      println(s"[probe] indexOf total hits: $idxTotal equal=${idxTotal == acTotal}")
      require(idxTotal == acTotal, "kernels disagree")
    }
    spark.stop()
  }
}

/** Corpus-sized robots scale point: a rule table PAST robotsGate's
  * maxDomains fail-fast (default 1M) through the join-shape variant —
  * the evidence that the above-limit leg is a working path, not a
  * vestigial branch. Synthetic rules: every even domain closes /tmp/,
  * every third domain gets a graftbot group closing /private*; URLs
  * spread over the domains with a path mix hitting both rules. Prints
  * wall seconds for (a) the broadcast gate REFUSING, (b) the joined
  * gate deciding the full corpus, plus a decision histogram. */
object RobotsProbe {
  def main(args: Array[String]): Unit = {
    val nDomains = sys.env.getOrElse("SPARK_GRAFT_ROBOTS_DOMAINS", "2000000").toInt
    val nUrls = sys.env.getOrElse("SPARK_GRAFT_ROBOTS_URLS", "5000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val robots = spark.range(0, nDomains).select(
      concat(lit("d"), col("id").cast("string"), lit(".com")).as("domain"),
      concat(
        when(pmod(col("id"), lit(3L)) === 0,
          lit("User-agent: graftbot\nDisallow: /private*\n\n")).otherwise(lit("")),
        lit("User-agent: *\n"),
        when(pmod(col("id"), lit(2L)) === 0, lit("Disallow: /tmp/\n"))
          .otherwise(lit("Disallow:\n"))).as("content"))
    val urls = spark.range(0, nUrls).select(
      col("id"),
      concat(lit("d"), pmod(col("id"), lit(nDomains.toLong)).cast("string"),
        lit(".com")).as("domain"),
      concat(lit("http://d"), pmod(col("id"), lit(nDomains.toLong)).cast("string"),
        lit(".com"),
        when(pmod(col("id"), lit(4L)) === 0, lit("/tmp/x"))
          .when(pmod(col("id"), lit(4L)) === 1, lit("/private/x"))
          .otherwise(lit("/pub/x"))).as("url"))
    // (a) the broadcast gate must REFUSE past maxDomains, fast
    t("broadcast gate fail-fast") {
      val e = try {
        graft.operators.Robots.robotsGate(urls, col("url"), col("domain"),
          robots, "domain", "content", "graftbot/1.0").count(); None
      } catch { case ex: IllegalArgumentException => Some(ex) }
      require(e.nonEmpty, "expected the maxDomains fail-fast")
      println(s"[probe] refused: ${e.get.getMessage.take(80)}...")
    }
    // (b) the joined gate decides the whole corpus
    val decided = graft.operators.Robots.robotsGateJoined(urls, col("url"),
      col("domain"), robots, "domain", "content", "graftbot/1.0")
    val hist = t(s"joined gate over $nUrls urls x $nDomains domains")(
      decided.groupBy(col("robots_allowed")).count().collect()
        .map(r => r.getBoolean(0) -> r.getLong(1)).toMap)
    println(s"[probe] decisions: $hist")
    // spot-check the rule arithmetic: id%4==1 (private) blocked iff
    // domain%3==0; id%4==0 (tmp) blocked iff domain%3!=0 && domain%2==0
    // (a graftbot group EXISTS on %3 domains, so '*' rules don't apply)
    val blocked = hist.getOrElse(false, 0L)
    println(s"[probe] blocked=$blocked of $nUrls")
    spark.stop()
  }
}

/** Read-only WARC probe: ranged read of an existing archive/dir, N
  * repetitions (SPARK_GRAFT_WARC_PATH, SPARK_GRAFT_WARC_REPS). */
object WarcReadProbe {
  def main(args: Array[String]): Unit = {
    val path = sys.env("SPARK_GRAFT_WARC_PATH")
    val reps = sys.env.getOrElse("SPARK_GRAFT_WARC_REPS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = graft.sources.Warc.read(spark, path).count()
      println(f"[probe] rep $r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n records)")
    }
    spark.stop()
  }
}

/** Ad-hoc phase timing for the pruned LM family (scale forensics:
  * which phase pays at permute-100x — training agg, stage writes,
  * model broadcast, or the scoring projection). */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    t("warm-scan")(docs.count())
    val w = split(lower(col("text")), "\\s+")
    val n = greatest(size(w) - 1, lit(0))
    val toks = docs.select(col("doc_id"),
        explode(zip_with(slice(w, lit(1), n), slice(w, lit(2), n),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
    t("token-explode-count")(println("  tokens=" + toks.count()))
    val bi = toks.groupBy("w1", "w2").agg(count(lit(1)).as("__cb"))
    t("bigram-train-agg")(println("  types=" + bi.count()))
    val kept = bi.filter(col("__cb") >= 2)
    t("kept-filter-agg")(println("  kept=" + kept.count()))
    val staged = t("stage-write-kept")(
      graft.core.Stage.materialize(kept, "probe_kept"))
    val toksScored = toks.join(broadcast(staged), Seq("w1", "w2"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), sum(coalesce(col("__cb"), lit(0L))).as("s"))
    t("broadcast-score")(println("  docs=" + toksScored.count()))
    t("full-q_lm2p")(println("  rows=" + graft.operators.TextAnalysis
      .bigramNllPruned(docs, "text", "doc_id", minCount = 2).count()))
    spark.stop()
  }
}

/** Per-microbatch forensics for the q_asof_stream drain (the one gate
  * with a 4.7x run-to-run swing): dumps every StreamingQueryProgress's
  * durationMs map + state-store commit time, several drains in one JVM,
  * so the variable fixed cost has a name. */
object AsofProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val drains = sys.env.getOrElse("SPARK_GRAFT_ASOF_DRAINS", "3").toInt
    (1 to drains).foreach { round =>
      val t0 = System.nanoTime()
      val progress = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          val so = p.stateOperators.map(s =>
            s"commitMs=${s.customMetrics.getOrDefault("rocksdbCommitLatency", -1L)}" +
            s" rows=${s.numRowsTotal}").mkString(";")
          progress.add(s"batch=${p.batchId} rows=${p.numInputRows} " +
            s"durationMs=${p.durationMs} state[$so]")
        }
        override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      }
      spark.streams.addListener(listener)
      val df = SparkEntry.queries("q_asof_stream")(spark, dir)
      val n = df.count()
      spark.streams.removeListener(listener)
      println(f"[asof] round=$round total=${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      progress.forEach(s => println(s"[asof]   $s"))
    }
    spark.stop()
  }
}

/** Scale forensics for the GraftTable-backed incremental near-dup index
  * (round 11): build a corpus-sized signature index, compact it, then
  * measure a small batch's dedup step and report how many index FILES
  * the manifest pruning actually opened vs the snapshot total. */
object IndexProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/scale100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    import graft.sources.GraftTable
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[index] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("text").isNotNull).select(col("doc_id"), col("text"))
    val n = docs.count()
    println(s"[index] corpus docs: $n")
    val idx = java.nio.file.Files.createTempDirectory("graft_index_probe_").toString + "/idx"
    // ingest the corpus signatures in 4 appends (the steady-stream shape)
    t("ingest-4-appends") {
      (0 until 4).foreach { k =>
        val part = docs.filter(pmod(col("doc_id"), lit(4)) === k)
        val sig = Dedup.bandedShingleRowsPublic(part, "text", "doc_id", 16, 4, 42L, 3)
          .withColumn("__bkey", xxhash64(col("__bucket")))
        GraftTable.append(sig, idx, "__bkey")
      }
    }
    val preCompact = GraftTable.snapshot(spark, idx).get.files.length
    // pruning proportions BEFORE compaction, against the accreted
    // 128-file snapshot: range pruning on a hash key wins when
    // keys < files — the 100 TB regime (a 100 TB index is ~10^5-10^6
    // files; a microbatch is 10^4 keys; hit fraction ~ keys/files)
    val tiny = docs.filter(col("doc_id") % 49999 === 1).limit(4)
      .withColumn("doc_id", col("doc_id") + 2000000000L).localCheckpoint(true)
    val tinyKeys = Dedup.bandedShingleRowsPublic(tiny, "text", "doc_id", 16, 4, 42L, 3)
      .select(xxhash64(col("__bucket")).as("k")).distinct()
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect()
    val touchedPre = GraftTable.readForBuckets(spark, idx, tinyKeys,
      residualFilter = false).inputFiles.length
    println(s"[index] pre-compaction: ${tinyKeys.length} keys touch " +
      s"$touchedPre of $preCompact files")
    t("compact")(Dedup.compactIndex(spark, idx, targetFileBytes = 32L << 20, minFiles = 2))
    val snap = GraftTable.snapshot(spark, idx).get
    println(s"[index] files: $preCompact pre-compaction -> ${snap.files.length} compacted; " +
      s"rows=${snap.files.map(_.rows).sum}")
    // the incremental step: a 1000-doc batch against the corpus index
    val batch = docs.filter(col("doc_id") % 997 === 0).limit(1000)
      .withColumn("doc_id", col("doc_id") + 1000000000L) // new ids
      .localCheckpoint(true)
    println(s"[index] batch docs: ${batch.count()}")
    // pruning evidence: how many files does the batch's key set touch?
    val keys = Dedup.bandedShingleRowsPublic(batch, "text", "doc_id", 16, 4, 42L, 3)
      .select(xxhash64(col("__bucket")).as("k")).distinct()
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect()
    val touched = GraftTable.readForBuckets(spark, idx, keys,
      residualFilter = false).inputFiles.length
    println(s"[index] pruned read touches $touched of ${snap.files.length} files " +
      s"for ${keys.length} batch bucket keys")
    val touchedPost = GraftTable.readForBuckets(spark, idx, tinyKeys,
      residualFilter = false).inputFiles.length
    println(s"[index] post-compaction: ${tinyKeys.length} keys touch " +
      s"$touchedPost of ${snap.files.length} files")
    val t4 = t("tiny-batch-dedup-step")(
      Dedup.incrementalNearDup(tiny, idx, "text", "doc_id", 16, 4, 42L, 3, 0.8).count())
    println(s"[index] tiny-batch survivors: $t4")
    val survivors = t("incremental-dedup-step")(
      Dedup.incrementalNearDup(batch, idx, "text", "doc_id", 16, 4, 42L, 3, 0.8).count())
    println(s"[index] batch survivors: $survivors")
    spark.stop()
  }
}

/**
 * Manifest mechanics at REALISTIC file counts (round-12, verdict #7):
 * IndexProbe's pruning claim extrapolated from 22 files; this probe
 * measures the driver-side manifest costs that actually bound the
 * design — parse time, prune time, manifest bytes — at 10^4 REAL files
 * (a built table, pruned reads included) and 10^5/10^6 SYNTHETIC
 * manifest entries (same JSON shape, fake paths — the parse/prune cost
 * is a pure function of the entry list, no data files needed).
 */
object ManifestProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    import graft.sources.GraftTable
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[manifest] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // ---- 10^4 REAL files: 16 appends x 640 range-clustered files ----
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("text").isNotNull).select(col("doc_id"), col("text"))
    println(s"[manifest] corpus docs: ${docs.count()}")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_manifest_probe_").toString + "/idx"
    val filesPerAppend = sys.env.getOrElse("SPARK_GRAFT_MANIFEST_FILES", "640").toInt
    val appends = sys.env.getOrElse("SPARK_GRAFT_MANIFEST_APPENDS", "16").toInt
    t(s"ingest-$appends-appends-x-$filesPerAppend-files") {
      (0 until appends).foreach { k =>
        val part = docs.filter(pmod(col("doc_id"), lit(appends)) === k)
        val sig = Dedup.bandedShingleRowsPublic(part, "text", "doc_id", 16, 4, 42L, 3)
          .withColumn("__bkey", xxhash64(col("__bucket")))
        GraftTable.append(sig, idx, "__bkey", numFiles = Some(filesPerAppend))
      }
    }
    val snap = GraftTable.snapshot(spark, idx).get
    val meta = GraftTable.snapshotMeta(spark, idx).get
    val listPath = java.nio.file.Paths.get(
      s"$idx/_manifests/snapshot-${"%09d".format(snap.id)}.json")
    val shardBytes = meta.refs.map(r =>
      java.nio.file.Files.size(java.nio.file.Paths.get(s"$idx/_manifests/${r.name}"))).sum
    println(s"[manifest] files=${snap.files.length} shards=${meta.refs.length} " +
      s"listBytes=${java.nio.file.Files.size(listPath)} shardBytes=$shardBytes")
    val parse1 = t("parse-10^4-manifest")(
      GraftTable.snapshot(spark, idx).get.files.length)
    require(parse1 == snap.files.length)
    // a 10^4-doc microbatch's bucket-key set against the 10^4-file table
    val batch = docs.limit(10000)
      .withColumn("doc_id", col("doc_id") + 1000000000L).localCheckpoint(true)
    val keys = Dedup.bandedShingleRowsPublic(batch, "text", "doc_id", 16, 4, 42L, 3)
      .select(xxhash64(col("__bucket")).as("k")).distinct()
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect()
    val touched = t("prune-10^4-files")(
      GraftTable.readForBuckets(spark, idx, keys, residualFilter = false)
        .inputFiles.length)
    println(s"[manifest] ${keys.length} keys touch $touched of " +
      s"${snap.files.length} files (hit fraction " +
      f"${touched.toDouble / snap.files.length}%.3f)")
    val stepT0 = System.nanoTime()
    val surv = Dedup.incrementalNearDup(batch, idx, "text", "doc_id",
      16, 4, 42L, 3, 0.8).count()
    println(f"[manifest] 10^4-doc dedup step vs 10^4-file table: " +
      f"${(System.nanoTime() - stepT0) / 1e9}%.2f s, $surv survivors")
    // ---- synthetic manifests: parse+prune cost at 10^5 / 10^6 entries
    // (two-level shapes written directly — same JSON GraftTable emits;
    // fake data paths, since parse/prune cost is a pure function of the
    // entry list) ----
    Seq(100000, 1000000).foreach { n =>
      val synth = java.nio.file.Files
        .createTempDirectory(s"graft_manifest_synth_${n}_").toString + "/t"
      val md = java.nio.file.Paths.get(s"$synth/_manifests")
      java.nio.file.Files.createDirectories(md)
      val perShard = 8192 // GraftTable.MaxShardEntries
      val span = Long.MaxValue / n * 2 // disjoint ranges across the hash line
      def entryLo(i: Int) = Long.MinValue + i.toLong * span
      val refs = new StringBuilder()
      var shard = 0
      var totalShardBytes = 0L
      var i = 0
      while (i < n) {
        val hiIdx = math.min(i + perShard, n)
        val sb = new StringBuilder()
        sb.append("""{"entries":[""")
        var j = i
        while (j < hiIdx) {
          if (j > i) sb.append(',')
          sb.append(s"""{"path":"/synthetic/part-$j.parquet","rows":100000,""" +
            s""""bytes":134217728,"minBucket":${entryLo(j)},"maxBucket":${entryLo(j) + span - 1}}""")
          j += 1
        }
        sb.append("]}")
        val name = f"manifest-synth$shard%05d-0.json"
        java.nio.file.Files.write(md.resolve(name),
          sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        totalShardBytes += sb.length
        if (shard > 0) refs.append(',')
        refs.append(s"""{"name":"$name","nFiles":${hiIdx - i},""" +
          s""""rows":${(hiIdx - i) * 100000L},"bytes":${(hiIdx - i) * 134217728L},""" +
          s""""minBucket":${entryLo(i)},"maxBucket":${entryLo(hiIdx - 1) + span - 1},""" +
          """"addedAt":1,"kind":"append"}""")
        shard += 1
        i = hiIdx
      }
      java.nio.file.Files.write(md.resolve("snapshot-000000001.json"),
        (s"""{"id":1,"bucketCol":"__bkey","manifests":[""" + refs + "]}")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[manifest] synthetic n=$n shards=$shard " +
        s"listBytes=${java.nio.file.Files.size(md.resolve("snapshot-000000001.json"))} " +
        s"shardBytes=$totalShardBytes")
      // measurement order is cache-aware (shards cache once parsed):
      // list parse cold, then the narrow-range prune COLD (parses only
      // its hit shards — the headline two-level win), then the key-set
      // prune (parses the rest cold), then full materialization (warm —
      // the steady-state snapshot() cost after any pruned read)
      val metaT = t(s"parse-list-$n")(GraftTable.snapshotMeta(spark, synth).get)
      require(metaT.refs.map(_.nFiles).sum == n)
      // the clustered-range case — ref-level pruning skips ~all shards
      val lo = entryLo(n / 2)
      val (_, rangeHit) = t(s"pruneRange-$n-cold")(
        GraftTable.pruneRange(spark, synth, lo, lo + span * 10))
      println(s"[manifest] pruneRange-$n: ${rangeHit.length} files, " +
        s"ref-level shard skip leaves ~1 shard of $shard")
      // the 10^4-key set (uniform hash keys: every shard is hit — the
      // worst case for ref-level pruning; entry-level pruning still
      // cuts 10^6 files to ~|keys|)
      val (_, hitSet) = t(s"pruneForBuckets-$n-mostly-cold")(
        GraftTable.pruneForBuckets(spark, synth, keys))
      println(s"[manifest] pruneForBuckets-$n: ${hitSet.length} of $n files hit " +
        s"for ${keys.distinct.length} keys")
      val parsed = t(s"materialize-$n-entries-warm")(GraftTable.snapshot(spark, synth).get)
      require(parsed.files.length == n)
    }
    spark.stop()
  }
}
