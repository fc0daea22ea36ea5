package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Johnson–Lindenstrauss random projection as a native codegen'd
 * expression: y_j = scale * Σ_i s(j,i) · x_i with a plan-embedded ±1
 * sign matrix (Achlioptas 2003's database-friendly JL construction —
 * ±1 entries preserve pairwise distances within (1±ε) at
 * k = O(log n / ε²) output dims, no gaussians needed).
 *
 * The 100 TB lever: embedding-space candidate generation (ANN, near-dup,
 * SemDeDup cells) is dominated by per-pair O(d) arithmetic and by the
 * bytes each vector drags through every exchange. Projecting 64 → 16
 * dims cuts both 4× — and the projection itself is a zero-shuffle,
 * scan-bound map (one fused loop per row inside whole-stage codegen, the
 * k×d sign matrix riding the plan as a reference object, never joined).
 * Exact re-ranking on the full vectors restores precision for the
 * survivors, so only the cheap stage sees the lossy space.
 *
 * Engine-exact replay: signs derive from md5 ("rp_tag_j_i" parity), the
 * inner fold runs i ascending from 0.0, and the only float ops are IEEE
 * double adds in that fixed order plus one final multiply — DuckDB
 * replays it bit-identically with list(... ORDER BY i) + list_reduce.
 *
 * Null contract (same as the array kernels): null array → null, length
 * mismatch vs the matrix → null, null element → null.
 */
case class RandomProject(child: Expression, signs: Array[Byte], outDims: Int,
                         scale: Double, normalize: Boolean) extends UnaryExpression {

  require(outDims > 0 && signs.length % outDims == 0,
    s"signs length ${signs.length} must be a multiple of outDims $outDims")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "random_project"

  override def nullSafeEval(input: Any): Any =
    RandomProject.project(input.asInstanceOf[ArrayData], signs, outDims, scale,
      normalize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.addReferenceObj("signs", signs, "byte[]")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("proj")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.RandomProject.project($c, $s, $outDims, $scale, $normalize);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RandomProject =
    copy(child = newChild)
}

object RandomProject {

  /** The projection kernel (called from generated code). Fold order is
    * the contract: out(j) accumulates i = 0..d-1 ascending from 0.0 —
    * the DuckDB oracle replays the identical left fold. `normalize`
    * projects the UNIT vector: projection is linear, so x/‖x‖ projects
    * to y/‖x‖ — one output division per dim, never a per-element pass
    * (‖x‖ is its own i-ascending fold; a zero vector stays all-zero). */
  def project(xs: ArrayData, signs: Array[Byte], outDims: Int,
              scale: Double, normalize: Boolean): ArrayData = {
    val d = signs.length / outDims
    if (xs.numElements() != d) return null
    var i = 0
    while (i < d) { if (xs.isNullAt(i)) return null; i += 1 }
    var norm = 0.0
    if (normalize) {
      var n2 = 0.0
      i = 0
      while (i < d) { val x = xs.getDouble(i); n2 += x * x; i += 1 }
      norm = math.sqrt(n2)
    }
    val out = new Array[Double](outDims)
    var j = 0
    while (j < outDims) {
      var acc = 0.0
      val base = j * d
      i = 0
      while (i < d) {
        acc += signs(base + i) * xs.getDouble(i)
        i += 1
      }
      // a true DIVISION by the norm (not * precomputed reciprocal):
      // x/c and x*(1/c) differ in the last bit, and the oracle divides
      val y = acc * scale
      out(j) = if (!normalize) y else if (norm > 0.0) y / norm else 0.0
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry; the input is cast to array<double> so float
    * embeddings widen exactly before the fold. */
  def apply(vec: Column, signs: Array[Byte], outDims: Int, scale: Double,
            normalize: Boolean = false): Column =
    GraftSqlBridge.column(RandomProject(
      GraftSqlBridge.expression(vec.cast(ArrayType(DoubleType))), signs, outDims,
      scale, normalize))
}
