package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Single-pass signature kernels for the dedup operators.
  *
  * Both replace an explode → wide-aggregate plan (40 bit-vote sums for
  * SimHash, K min-slots for MinHash) with ONE narrow map over the
  * per-document feature array: no explode, no shuffle, no K-wide
  * generated aggregate — per-document work happens where the document
  * already is. Semantics are EXACTLY the aggregate form they replace
  * (asserted by the unchanged unit tests and DuckDB oracles); only the
  * physical shape changes. At 100 TB this converts the signature stage
  * from a corpus-wide exchange into an embarrassingly parallel scan; it
  * also cuts the local cost — the 40-sum HashAggregate compiled ~9 s of
  * generated code per session.
  */
object SketchExprs

/** 40-bit SimHash from a document's feature-hash array: bit j is set iff
  * `Σ_h (2·((h≫j)&1) − 1) > 0`. Null elements vote 0 (matching the
  * explode_outer row the aggregate form produced for empty docs); an
  * empty array yields 0.
  */
case class SimHash40(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash40 expects array<bigint>, got ${t.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash40"

  override def nullSafeEval(v: Any): Any = SimHash40.hash(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash40.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash40 {

  val Bits: Int = Parity.SimBits

  /** Shared by interpreted and generated paths (named `hash`, not `eval`
    * — see [[PolyHash.hash]]'s static-forwarder note). */
  def hash(a: ArrayData): Long = {
    val votes = new Array[Int](Bits)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val h = a.getLong(i)
        var j = 0
        while (j < Bits) {
          votes(j) += ((((h >> j) & 1L) << 1) - 1L).toInt
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < Bits) {
      if (votes(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  def apply(c: Column): Column =
    ColumnBridge.column(SimHash40(ColumnBridge.expression(c)))
}

/** K-element MinHash signature from a document's token-code array:
  * `sig_i = min_c (a_i·c + b_i) mod BigP`, empty (or all-null) input →
  * BigP — exactly the K-min-aggregate form it replaces
  * ([[Parity.minhashSig]] / [[Parity.minhashSigSql]]).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<bigint>, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(v: Any): Any = MinHashSig.sig(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.sig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {

  /** Shared by interpreted and generated paths. Permutation constants
    * come from the same [[Parity.permA]]/[[Parity.permB]] the oracle
    * embeds; products stay ≤ 2⁵¹ (31-bit constant × 20-bit code). */
  def sig(a: ArrayData, k: Int): ArrayData = {
    val out = Array.fill(k)(Parity.BigP)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val c = a.getLong(i)
        var j = 0
        while (j < k) {
          val v = (Parity.permA(j) * c + Parity.permB(j)) % Parity.BigP
          if (v < out(j)) out(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), k))
}
