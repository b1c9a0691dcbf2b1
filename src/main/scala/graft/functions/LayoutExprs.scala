package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D point — the d = xy2d(n, x, y) loop of
  * the standard quadrant-rotation construction (Hilbert 1891; the
  * iterative form popularized by Warren's Hacker's Delight §16 and the
  * Wikipedia "Hilbert curve" article): per bit level, pick the quadrant,
  * add its sub-square offset, and rotate/reflect the frame so the curve
  * enters the next level in canonical orientation.
  *
  * The loop carries mutable (x, y, d) across `bits` levels — a shape
  * that would explode to a 4^bits-node expression tree if composed from
  * built-in Columns (each level references both carried coordinates
  * twice), which is exactly the "whole-operator semantics the built-ins
  * can't express" case for a native codegen'd Expression: one static
  * long-loop call per row, no boxing, stays inside the generated stage.
  *
  * Versus the Morton/Z code ([[graft.operators.Layout.zvalue]]): both
  * interleave to 2·bits index bits, but the Hilbert curve never jumps —
  * every consecutive pair of indexes is 4-adjacent in the plane
  * (asserted exhaustively in LayoutSpec), so range blocks of the index
  * cover tighter key boxes; Z's inter-quadrant seams are why liquid-
  * clustering layouts moved to Hilbert. The DuckDB oracle re-derives
  * the loop as `bits` chained CTE steps over the same arithmetic.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == LongType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hilbert_index expects two bigint arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.index(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HilbertIndex.index($bits, $a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object HilbertIndex {

  /** Shared by interpreted and generated code paths (named `index`, not
    * `eval` — companion methods named like class members get no static
    * forwarder, which breaks the generated Java).
    */
  def index(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x
        x = y
        y = t
      }
      s >>= 1
    }
    d
  }

  def apply(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(HilbertIndex(ColumnBridge.expression(x), ColumnBridge.expression(y), bits))
}
