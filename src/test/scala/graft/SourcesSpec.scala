package graft

import org.apache.spark.sql.functions._

/** Source parity (SURVEY §2.2 Sources): the reference hand-rolls CSV
  * readers (BufferedReader+split, e.g. example/AHPExample.java:51-72) and
  * in-memory collections; here both are first-class Spark readers. */
class SourcesSpec extends GraftSpec {
  import spark.implicits._

  test("csv source with header + schema inference replaces hand-rolled readers") {
    val dir = java.nio.file.Files.createTempDirectory("csv-src")
    val f = dir.resolve("iris.csv")
    java.nio.file.Files.writeString(f,
      "sepal_length,sepal_width,species\n5.1,3.5,setosa\n6.2,2.9,versicolor\n")
    val df = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(f.toString)
    assert(df.columns.toSeq == Seq("sepal_length", "sepal_width", "species"))
    assert(df.schema("sepal_length").dataType.typeName == "double")
    assert(df.count() == 2)
    // and straight into an operator, like the reference examples chain
    val scored = graft.operators.Topsis.score(
      df.withColumn("features", array(col("sepal_length"), col("sepal_width"))),
      "features", Array(0.5, 0.5), Array(1, 1), 0.0, Array(0.0, 0.0), "score")
    assert(scored.select("score").as[Double].collect().forall(s => s >= 0 && s <= 1))
  }

  test("json and orc round-trips preserve values and nested arrays") {
    import spark.implicits._
    val df = Seq((1L, "a\"b\nc", Array(1.0, 2.5)), (2L, null, Array.empty[Double]))
      .toDF("id", "s", "xs")
    for (fmt <- Seq("json", "orc")) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_$fmt").toString
      df.write.mode("overwrite").format(fmt).save(dir)
      val back = spark.read.format(fmt)
        .schema(df.schema) // json would otherwise widen/reorder on inference
        .load(dir)
        .collect().map(r => (r.getLong(0), Option(r.getString(1)),
          Option(r.getSeq[Double](2)).map(_.toList))).toSet
      val want = Set((1L, Some("a\"b\nc"), Some(List(1.0, 2.5))),
        (2L, None, Some(Nil)))
      assert(back == want, s"$fmt round-trip: $back")
    }
  }

  test("orc scans push filters and prune columns like parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_push").toString
    (1L to 1000L).map(i => (i, s"name_$i", i * 2.0)).toDF("id", "name", "v")
      .write.mode("overwrite").orc(dir)
    val q = spark.read.orc(dir).filter(col("id") > 900L).select("id", "v")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,900)]"),
      s"ORC filter not pushed:\n$scan")
    assert(scan.contains("ReadSchema: struct<id:bigint,v:double>"),
      s"ORC scan not pruned to the projection:\n$scan")
    assert(q.count() == 100)
  }

  test("parquet round-trip preserves operator output schemas") {
    val out = java.nio.file.Files.createTempDirectory("pq").toString
    val df = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    graft.operators.Dedup.simhash(df, "text", "doc_id", bits = 16)
      .write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.columns.toSeq == Seq("doc_id", "simhash"))
    assert(back.count() == 2)
  }

  test("SplittableCsv: parallel ranges reproduce Spark's single-task multiLine read exactly") {
    import graft.sources.SplittableCsv
    import org.apache.spark.sql.types._
    val schema = new StructType().add("id", LongType).add("text", StringType)
      .add("score", DoubleType)
    // adversarial corpus: quoted newlines, doubled quotes, CRLF rows,
    // literal-\N-vs-null, record lengths chosen so tiny blockBytes cut
    // mid-field, mid-quote, and exactly on record boundaries
    val rows = (0 until 200).map { i =>
      val text = i % 7 match {
        case 0 => s"""plain words $i"""
        case 1 => "multi\nline\ntext " + ("x" * (i % 31))
        case 2 => s"""says ""hi"" and "bye" $i""" // doubled-quote soup
        case 3 => null
        case 4 => "comma, inside, " + ("y" * (i % 53))
        case 5 => "\\N" // literal null token
        case 6 => "ends with quote\""
      }
      (i.toLong, text, i / 8.0)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_splitcsv")
    val f = dir.resolve("big.csv")
    // uniform \n terminators: Spark's multiLine oracle auto-detects ONE
    // line separator per file (mixed endings break IT, not this reader);
    // CRLF handling is pinned separately below against literal values
    val sb = new StringBuilder("id,text,score\n")
    rows.foreach { case (id, t, s) =>
      val field = if (t == null) "\\N"
        else "\"" + t.replace("\"", "\"\"") + "\""
      sb.append(s"$id,$field,$s\n")
    }
    java.nio.file.Files.writeString(f, sb.toString)
    val want = spark.read.schema(schema)
      .option("header", "true").option("nullValue", "\\N")
      .option("escape", "\"").option("multiLine", "true")
      .csv(f.toString)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getDouble(2))).toSet
    assert(want.size == 200, s"oracle read only ${want.size}")
    // 1 KiB blocks carve this file into ~10 ranges; every boundary class
    // gets hit across 200 rows. Also the degenerate one-range case.
    for (block <- Seq(1024L, 64L * 1024 * 1024)) {
      val got = SplittableCsv.read(spark, f.toString, schema,
          header = true, blockBytes = block)
        .collect().map(r => (r.getLong(0), Option(r.getString(1)),
          r.getDouble(2))).toSet
      assert(got == want, s"blockBytes=$block diverged: " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
    // REGRESSION: a downstream coalesce(1) collapses all ranges into one
    // task — the header drop must key on the RANGE index, not the
    // TaskContext partition id (the first cut lost one record per range)
    val coalesced = SplittableCsv.read(spark, f.toString, schema,
        header = true, blockBytes = 1024L)
      .coalesce(1)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getDouble(2))).toSet
    assert(coalesced == want, s"coalesce(1) lost ${(want -- coalesced).size} records")
    // CRLF rows (uniformly) recover without the \r leaking into fields
    val crlf = dir.resolve("crlf.csv")
    java.nio.file.Files.writeString(crlf,
      "id,text,score\r\n1,\"a\r\nb\",1.5\r\n2,plain,2.5\r\n")
    val gotCrlf = SplittableCsv.read(spark, crlf.toString, schema,
        header = true, blockBytes = 1024L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(gotCrlf == Set((1L, "a\r\nb", 1.5), (2L, "plain", 2.5)), gotCrlf)
    // unbalanced quotes refuse rather than mis-split
    val bad = dir.resolve("bad.csv")
    java.nio.file.Files.writeString(bad, "id,text,score\n1,\"oops,2.0\n")
    intercept[IllegalArgumentException] {
      SplittableCsv.read(spark, bad.toString, schema, blockBytes = 1024L)
        .collect()
    }
    // balanced-but-wrong escaping (the silent-corruption hazard): a
    // runaway in-quote scan trips the max-record guard with a named
    // error instead of swallowing rows
    val runaway = dir.resolve("runaway.csv")
    java.nio.file.Files.writeString(runaway,
      "id,text,score\n1,\"open" + ("x" * 3000) + "\n2,\"closes,2.0\n")
    val e = intercept[Exception] {
      SplittableCsv.read(spark, runaway.toString, schema,
        blockBytes = 1024L, maxRecordBytes = 2048).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("maxRecordBytes") ||
      Option(e.getCause).exists(_.getMessage.contains("maxRecordBytes")),
      s"expected the named guard, got: $e")
  }

  test("Stage.materialize round-trips under a non-default scratch URI") {
    import spark.implicits._
    // cluster shape: spark.graft.stage.dir points at shared scratch space;
    // every materialize lands in a unique subdir there, not local /tmp
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_scratch_uri").toString
    spark.conf.set(graft.core.Stage.StageDirConf, s"file://$scratch")
    try {
      val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      val staged = graft.core.Stage.materialize(df, "urispec")
      assert(staged.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
        Set((1L, "a"), (2L, "b"), (3L, "c")))
      // the bytes really live under the configured URI
      val sub = new java.io.File(scratch).listFiles()
      assert(sub != null && sub.exists(_.getName.startsWith("graft_stage_urispec")),
        s"expected a graft_stage_urispec_* dir under $scratch, got " +
          Option(sub).map(_.map(_.getName).mkString(",")).getOrElse("null"))
    } finally spark.conf.unset(graft.core.Stage.StageDirConf)
  }
}
