package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: key correctness + the file-skipping effect the key
  * exists to buy, measured on real parquet layouts. */
class LayoutSpec extends GraftSpec {
  import spark.implicits._

  test("zValue: interleave is exact on known points, monotone on boxes") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L), (3L, 5L),
      (1023L, 1023L))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 10).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def ref(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 10)
        z |= (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      z
    }
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == ref(x, y), s"z($x,$y) = ${got((x, y))}")
    }
    assert(got((0L, 0L)) == 0L && got((1L, 0L)) == 1L && got((0L, 1L)) == 2L
      && got((1L, 1L)) == 3L && got((1023L, 1023L)) == (1L << 20) - 1)
  }

  test("z-ordered parquet layout prunes files under a box predicate; random layout does not") {
    // a 256x256 grid of points, written as 16 files two ways: range-
    // partitioned on the z-value (each file = a compact z-range = a
    // small set of quadrants) vs round-robin random. The SAME box
    // predicate then touches few z-files and every random file — the
    // pruning a 100 TB table gets from min/max stats, measured via
    // which files the matching rows actually live in.
    val n = 256
    val pts = (0 until n * n).map(i => (i.toLong, (i % n).toLong, (i / n).toLong))
    val df = pts.toDF("id", "x", "y")
      .withColumn("z", Layout.zValue(col("x"), col("y"), 8))
    val root = java.nio.file.Files.createTempDirectory("graft_layout_")
    val dir = root.toString
    try {
      df.repartitionByRange(16, col("z")).sortWithinPartitions(col("z"))
        .write.parquet(s"$dir/zorder")
      df.repartition(16).write.parquet(s"$dir/random")
      def filesTouched(path: String): Long = {
        spark.read.parquet(path)
          .filter(col("x").between(10, 40) && col("y").between(200, 230))
          .select(input_file_name()).distinct().count()
      }
      val zf = filesTouched(s"$dir/zorder")
      val rf = filesTouched(s"$dir/random")
      // the box is ~1.5% of the grid: random scatters it over every file,
      // the z-layout confines it to the files owning those quadrants
      assert(rf >= 12, s"random layout should scatter the box over most files: $rf")
      assert(zf * 3 <= rf, s"z-layout should touch <= a third of random's files: $zf vs $rf")
    } finally {
      java.nio.file.Files.walk(root)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    }
  }
}
