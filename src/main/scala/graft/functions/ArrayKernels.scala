package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Shared shape for binary double-array kernels (see [[CosineSimilarity]]
 * for the design rationale): null array → null, length mismatch → null,
 * null element → null; `doGenCode` emits one primitive loop over
 * `ArrayData` inside whole-stage codegen.
 */
abstract class BinaryArrayKernel extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Loop body contribution per element pair, reading vars x/y. */
  protected def seqJava(acc: String, x: String, y: String): String
  /** Final value from the accumulator. */
  protected def finishJava(acc: String): String
  protected def seqJvm(acc: Double, x: Double, y: Double): Double
  protected def finishJvm(acc: Double): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      acc = seqJvm(acc, xs.getDouble(i), ys.getDouble(i))
      i += 1
    }
    finishJvm(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  int $i = 0;
         |  while ($i < $n) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = $a.getDouble($i);
         |    final double $y = $b.getDouble($i);
         |    ${seqJava(acc, x, y)}
         |    $i += 1;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = ${finishJava(acc)};
         |  }
         |}
       """.stripMargin
    })
}

/** Σ xᵢ·yᵢ — e.g. re-scoring int8-quantized candidates. */
case class DotProduct(left: Expression, right: Expression) extends BinaryArrayKernel {
  override def prettyName: String = "dot_product"
  protected def seqJava(acc: String, x: String, y: String): String =
    s"$acc += $x * $y;"
  protected def finishJava(acc: String): String = acc
  protected def seqJvm(acc: Double, x: Double, y: Double): Double = acc + x * y
  protected def finishJvm(acc: Double): Double = acc
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** √Σ (xᵢ−yᵢ)² — euclidean distance. */
case class L2Distance(left: Expression, right: Expression) extends BinaryArrayKernel {
  override def prettyName: String = "l2_distance"
  protected def seqJava(acc: String, x: String, y: String): String =
    s"{ final double d = $x - $y; $acc += d * d; }"
  protected def finishJava(acc: String): String = s"java.lang.Math.sqrt($acc)"
  protected def seqJvm(acc: Double, x: Double, y: Double): Double = {
    val d = x - y; acc + d * d
  }
  protected def finishJvm(acc: Double): Double = math.sqrt(acc)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Distance =
    copy(left = l, right = r)
}

object ArrayKernels {
  private def cast(c: Column): Expression =
    GraftSqlBridge.expression(c.cast(ArrayType(DoubleType)))
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(cast(a), cast(b)))
  def l2(a: Column, b: Column): Column =
    GraftSqlBridge.column(L2Distance(cast(a), cast(b)))
}
