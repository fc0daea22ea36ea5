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
}
