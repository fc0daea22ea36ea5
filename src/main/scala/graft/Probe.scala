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
