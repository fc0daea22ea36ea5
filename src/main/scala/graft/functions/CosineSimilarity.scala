package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Native Catalyst cosine-similarity expression over two double-array
 * columns — the codegen tier of the kernel preference order (built-in
 * functions > native Expression > JVM UDF): `doGenCode` emits a primitive
 * loop reading `ArrayData` in place, so scoring participates in
 * whole-stage codegen with no Catalyst→Scala conversion and no per-call
 * Seq boxing (the ScalaUDF form it replaces materialized both arrays as
 * boxed Seq[Double] per pair — per candidate pair in the ANN joins).
 *
 * Semantics are IDENTICAL to the UDF it replaces (bit-for-bit, same
 * left-to-right fold order, same dot/(√na·√nb) final expression — the
 * ANN oracles pin this): null in either array → null; length mismatch →
 * null; zero-length or all-zero inputs → NaN via 0/0, matching the UDF.
 * The one deliberate difference: a null ELEMENT now yields null instead
 * of an executor NPE (the UDF unboxed it); no corpus column produces
 * null elements, so no oracle can see the change.
 */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes is sql-package-private; the companion's Column entry
  // casts both sides to array<double>, which makes the contract structural
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  int $i = 0;
         |  while ($i < $n) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = $a.getDouble($i);
         |    final double $y = $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |    $i += 1;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry: casts both sides to array&lt;double&gt; like the UDF
    * form did, so float embeddings and double features both work. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineSimilarity(
      GraftSqlBridge.expression(a.cast(ArrayType(DoubleType))),
      GraftSqlBridge.expression(b.cast(ArrayType(DoubleType)))))
}
