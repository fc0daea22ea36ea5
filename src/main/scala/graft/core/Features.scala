package graft.core

import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.linalg.SQLDataTypes
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Feature-column plumbing: the reference accepts a flink-ml Vector column
 * and densifies on input (cn/swust/algorithms/fcm/FCM.java:68,
 * test FCMTest.java:287-306 feeds SparseVector + int vectors). We accept
 * spark.ml VectorUDT *or* array<numeric> and normalize to array<double>,
 * which keeps everything codegen-friendly (array functions are codegen'd;
 * VectorUDT round-trips are not).
 */
object Features {

  /** The given column as array<double>, whatever numeric carrier it has. */
  def asArray(df: DataFrame, colName: String): Column = {
    df.schema(colName).dataType match {
      case SQLDataTypes.VectorType => vector_to_array(col(colName))
      case ArrayType(DoubleType, _) => col(colName)
      case ArrayType(_: NumericType, _) => col(colName).cast(ArrayType(DoubleType))
      case other =>
        throw new IllegalArgumentException(
          s"column '$colName' must be VectorUDT or array<numeric>, got $other")
    }
  }

  /** Number of dimensions, probed from the first row. */
  def numDims(df: DataFrame, colName: String): Int = {
    val probe = df.select(size(asArray(df, colName)).as("n")).head()
    probe.getInt(0)
  }
}
